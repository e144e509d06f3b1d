package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located join technique for repeated fact⋈fact joins
  * at scale (SURVEY.md §2.D joins row; README design rules): both tables
  * pre-partitioned into the same bucket count on the join key at write
  * time, so the join needs NO exchange at read time.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // default warehouse dir (static conf) — tables are dropped in finally
    Tables.load(spark, sfDir, "lineitem")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.load(spark, sfDir, "orders")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    // disable auto-broadcast so the join would otherwise shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // co-located buckets: no exchange feeding the join
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      val beforeAgg = joinSection.take(joinSection.length)
      assert(!beforeAgg.contains("Exchange hashpartitioning(l_orderkey")
        && !beforeAgg.contains("Exchange hashpartitioning(o_orderkey"))
      // and the result is right
      val n = joined.agg(sum($"n")).head().getLong(0)
      assert(n == Tables.load(spark, sfDir, "lineitem").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
