package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RangeBucketJoin optimizer rule: a pure band join must produce the
  * same rows with the rule on (bucketized hash join) and off
  * (BroadcastNestedLoopJoin), across inner/left-outer, inverted
  * intervals, nulls, and bucket-boundary values.
  */
class RangeBucketJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def withRule[T](on: Boolean)(f: => T): T = {
    val key = "spark.graft.rangeJoin.enabled"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, on.toString)
    try f finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // points 0..999 (seconds as long); intervals of varying width incl.
  // one inverted (lo > hi), one null-bounded, boundary-aligned ones
  private def points = spark.range(0, 1000).toDF("p")
  private def intervals = Seq(
    (1L, Some(0L), Some(10L)),      // narrow, bucket-aligned start
    (2L, Some(5L), Some(5L)),       // single point
    (3L, Some(995L), Some(2000L)),  // runs past the data
    (4L, Some(500L), Some(100L)),   // INVERTED — must match nothing
    (5L, None, Some(50L)),          // null lo — must match nothing
    (6L, Some(118L), Some(130L)),   // spans a 120-bucket boundary (W=60)
    (7L, Some(0L), Some(999L))      // covers everything
  ).toDF("iid", "lo", "hi")

  private def bandJoin(joinType: String): DataFrame =
    points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi", joinType)

  test("inner band join: rule on == rule off, NLJ eliminated") {
    spark.conf.set("spark.graft.rangeJoin.bucketSeconds", "60")
    val off = withRule(on = false)(sortedRows(bandJoin("inner")))
    val (on, plan) = withRule(on = true) {
      val df = bandJoin("inner")
      (sortedRows(df), df.queryExecution.executedPlan.toString)
    }
    assert(on == off)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"rule did not fire:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
    assert(plan.contains("Generate"), "interval side not exploded")
  }

  test("left outer band join (point side preserved): identical results") {
    val off = withRule(on = false)(sortedRows(bandJoin("left")))
    val on = withRule(on = true)(sortedRows(bandJoin("left")))
    assert(on == off)
    // unmatched points surface exactly once with nulls
    assert(on.count(_.contains("null")) ==
      off.count(_.contains("null")))
  }

  test("rule leaves equi+band joins alone (Spark hash-joins those already)") {
    val pts = spark.range(0, 100).toDF("p").withColumn("k", $"p" % 3)
    val ivs = Seq((0L, 0L, 50L), (1L, 10L, 60L)).toDF("k2", "lo", "hi")
    val df = pts.join(ivs, $"k" === $"k2" && $"p" >= $"lo" && $"p" <= $"hi")
    val plan = withRule(on = true)(df.queryExecution.executedPlan.toString)
    assert(!plan.contains("Generate"), "rule fired despite equi conjunct")
    val onCount = withRule(on = true)(df.count())
    val offCount = withRule(on = false)(df.count())
    assert(onCount == offCount && onCount > 0)
  }

  test("timestamp band join matches and buckets correctly") {
    val evs = Tables.events(spark, TestSpark.sfDir)
    val wins = evs.agg(date_trunc("hour", min($"ts")).as("t0"))
      .select(explode(sequence(lit(0), lit(23))).as("k"), $"t0")
      .select(expr("timestampadd(HOUR, 2 * k, t0)").as("w_start"))
      .withColumn("w_end", $"w_start" + expr("INTERVAL '1' HOUR"))
    def j = evs.join(wins, $"ts" >= $"w_start" && $"ts" < $"w_end")
      .select($"event_id", $"w_start")
    val off = withRule(on = false)(sortedRows(j))
    val on = withRule(on = true)(sortedRows(j))
    assert(on == off && on.nonEmpty)
  }
}
