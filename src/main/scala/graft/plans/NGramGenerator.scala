package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst table function (SURVEY.md §2.D UDF-surface row:
  * "table functions via Generator"): `pos_ngrams(tokens, n)` emits one
  * output row per n-gram of a token array, as (pos, gram) — the explode
  * shape used by shingle pipelines, but with the position carried along
  * and the join/concat done inside the generator instead of
  * materializing an intermediate array-of-strings column per row.
  *
  * Each n-gram string is built once straight into the output row;
  * `transform(sequence(...), ...)` + `posexplode` expresses the same
  * thing but allocates the full gram array before exploding — for wide
  * documents the generator halves the transient allocation. Evaluation
  * is eval-based (CodegenFallback), like most built-in generators other
  * than explode itself.
  */
case class PosNGrams(tokens: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, n)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = tokens.dataType.isInstanceOf[ArrayType] &&
      tokens.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      (n.dataType == IntegerType || n.dataType == LongType ||
        n.dataType == ShortType || n.dataType == ByteType) && n.foldable
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "pos_ngrams(array<string>, n) requires a string array and a foldable integral n")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = true)))

  private lazy val gramSize: Int =
    n.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input)
    if (arr == null || gramSize < 1) return Nil
    val data = arr.asInstanceOf[ArrayData]
    val total = data.numElements() - gramSize + 1
    if (total <= 0) return Nil
    (0 until total).iterator.map { i =>
      val sb = new java.lang.StringBuilder()
      var j = 0
      var nullGram = false
      while (j < gramSize && !nullGram) {
        if (data.isNullAt(i + j)) nullGram = true
        else {
          if (j > 0) sb.append(' ')
          sb.append(data.getUTF8String(i + j).toString)
        }
        j += 1
      }
      InternalRow(i,
        if (nullGram) null else UTF8String.fromString(sb.toString))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(tokens = newChildren(0), n = newChildren(1))
}

object PosNGrams {
  /** smoke helper for direct unit testing without a session */
  def grams(tokens: Seq[String], n: Int): Seq[(Int, String)] = {
    val arr = new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any])
    PosNGrams(
      org.apache.spark.sql.catalyst.expressions.Literal(arr,
        ArrayType(StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal(n))
      .eval(InternalRow.empty).iterator.toSeq
      .map(r => (r.getInt(0),
        Option(r.getUTF8String(1)).map(_.toString).orNull))
  }
}
