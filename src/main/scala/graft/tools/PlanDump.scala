package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print expression-occurrence counts and the full executed
  * plan for the named queries — the duplicated-work detector used when a
  * new entry benches far off its structural twin (e.g. d38 vs d32).
  * Usage: sbt "runMain graft.tools.PlanDump <sfDir> <q1,q2,...>"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args(1).split(",")) {
      val p = graft.SparkEntry.queries(n)(spark, args(0))
        .queryExecution.executedPlan.toString
      println(s"===== $n =====")
      for (kernel <- Seq("minhash_lanes", "lambdafunction", "md5", "Scan parquet"))
        println(s"  $kernel: " + kernel.r.findAllIn(p).size)
      if (sys.env.contains("PLAN_FULL")) println(p)
    }
    spark.stop()
  }
}
