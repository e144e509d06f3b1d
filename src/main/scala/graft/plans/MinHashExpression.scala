package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Shared kernel for the `minhash_lanes` expression: one pass over the
  * shingle array computing every MinHash lane at once.
  *
  * Lane `p`'s value is defined as `substring(md5(concat('p:', shingle)),
  * 1, 16)` minimized over shingles — byte-identical to the SQL
  * formulation the DuckDB oracle runs (see `TextFunctions.minhash`), but:
  *
  *   - the digest's first 8 bytes are compared as one unsigned long
  *     (hex encoding is order-preserving, so unsigned-numeric min ==
  *     lexicographic min of the 16-char prefix) — no per-candidate
  *     string materialization; hex encoding happens once per lane at
  *     the end, not once per (shingle, lane);
  *   - a thread-local `MessageDigest` is reused across rows (the SQL
  *     form allocates digest + full 32-char hex string + concat buffer
  *     per salted call — `lanes × shingles` allocations per document).
  *
  * Scale: turns signature computation from explode + 8-way MIN
  * aggregation (a shuffle of `docs × shingles` rows) into a map-only
  * projection — embarrassingly parallel at any document count.
  */
object MinHashKernel {
  val MaxLanes = 64

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hex = "0123456789abcdef".toArray.map(_.toByte)
  private val salts: Array[Array[Byte]] =
    Array.tabulate(MaxLanes)(p => s"$p:".getBytes("UTF-8"))

  /** null when the array is empty or holds only nulls (mirrors
    * `list_min([]) → NULL`); otherwise `lanes` 16-hex-char prefixes.
    */
  def compute(arr: ArrayData, lanes: Int): ArrayData = {
    require(lanes > 0 && lanes <= MaxLanes, s"minhash_lanes: lanes must be in [1, $MaxLanes]")
    val n = arr.numElements()
    val md = mdLocal.get()
    val mins = new Array[Long](lanes)
    java.util.Arrays.fill(mins, -1L) // unsigned max
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val sBytes = arr.getUTF8String(i).getBytes
        var p = 0
        while (p < lanes) {
          md.reset()
          md.update(salts(p))
          md.update(sBytes)
          val d = md.digest()
          var v = 0L
          var b = 0
          while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
          if (java.lang.Long.compareUnsigned(v, mins(p)) < 0) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    if (!seen) return null
    val out = new Array[Any](lanes)
    var p = 0
    while (p < lanes) {
      val chars = new Array[Byte](16)
      var b = 0
      while (b < 8) {
        val byteV = ((mins(p) >>> (56 - 8 * b)) & 0xffL).toInt
        chars(2 * b) = hex(byteV >>> 4)
        chars(2 * b + 1) = hex(byteV & 0xf)
        b += 1
      }
      out(p) = UTF8String.fromBytes(chars)
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** `minhash_lanes(shingles, k)` → array of k MinHash prefixes (16 hex
  * chars each), or NULL for shingle-less documents. Participates in
  * whole-stage codegen via a static kernel call (the standard pattern
  * for digest-backed expressions — the loop body is JIT-compiled Scala,
  * the dispatch is codegen'd, no per-row virtual `eval`).
  */
case class MinHashLanes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_lanes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    left.dataType match {
      case ArrayType(StringType, _) =>
        if (right.dataType == IntegerType && right.foldable) TypeCheckSuccess
        else TypeCheckFailure("minhash_lanes: lane count must be a foldable INT")
      case other =>
        TypeCheckFailure(s"minhash_lanes: expected array<string>, got ${other.sql}")
    }
  }

  override def nullSafeEval(arr: Any, k: Any): Any =
    MinHashKernel.compute(arr.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) => {
      s"""
        ${ev.value} = graft.plans.MinHashKernel.compute($a, $k);
        ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
