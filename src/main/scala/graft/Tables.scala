package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md).
  * All reads go through `spark.read.parquet` so filter pushdown, column
  * pruning and partition-size splitting apply unchanged at any SF.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** Explicit read schema for events.parquet: ts is TIMESTAMP(NANOS),
    * which Spark's schema inference rejects — but an explicit LongType
    * request reads the raw nanos without touching any session conf (no
    * hidden `spark.sql.legacy.parquet.nanosAsLong` mutation, so unrelated
    * parquet reads stay order-independent).
    */
  val eventsRawSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType), // nanos-as-long
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }

  /** events.ts is TIMESTAMP(NANOS) parquet; read it as raw nanos via the
    * explicit schema and truncate to microseconds — the same ns→µs
    * truncation DuckDB applies, so oracle comparisons see identical
    * instants.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.schema(eventsRawSchema).parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
