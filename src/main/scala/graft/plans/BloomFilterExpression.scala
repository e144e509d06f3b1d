package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built Bloom filter — the
  * broadcast-sketch prefilter a 100 TB decontamination pass needs: the
  * benchmark side compresses to a few bits per element (a 1e9-shingle
  * suite fits executor memory as a ~1-2 GB sketch where the exact hash
  * set would not), ships once inside the serialized plan, and each
  * corpus shingle pays a few hash probes instead of a lookup in a
  * many-GB broadcast map. Probabilistic one-way: `false` is PROVEN
  * absent, `true` is "maybe" — callers must confirm survivors with an
  * exact join (which then runs on the ~fpp tail instead of the full
  * corpus). Same family as Spark's own runtime-filtering
  * `BloomFilterMightContain`, but over string keys chosen at plan-build
  * time rather than injected by the optimizer.
  *
  * The probe uses the UTF-8 bytes of the value — bit-identical to
  * `BloomFilter.putString`/`mightContainString`, which hash the same
  * UTF-8 encoding, so filters built with `DataFrame.stat.bloomFilter`
  * on a string column probe correctly here without per-row `String`
  * materialization.
  */
case class BloomContainsString(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_contains"

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    bf.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // the deserialized filter rides the generated class as a reference
    // object — one instance per task, zero per-row deserialization
    val ref = ctx.addReferenceObj("graftBloom", bf,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFilterExpressions {
  /** Register `name(col)` bound to a concrete sketch, so query code can
    * use the probe as `expr("name(shingle)")`. The sketch bytes travel
    * in the function-builder closure (a Bloom filter is not expressible
    * as a SQL literal at any reasonable size).
    */
  def register(spark: SparkSession, name: String,
      bloom: BloomFilter): Unit = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    val bytes = out.toByteArray
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => BloomContainsString(exprs(0), bytes), "scala_udf")
  }
}
