package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement tool (guide §1): runs ONE query (or a
  * comma list) under the Bench session config and prints every Spark job
  * it submits — start offset, duration, task count, description — so an
  * operator's driver-coordinated job waves are visible without the UI
  * (spark.ui.enabled is false in the bench). Dev tooling like PlanDump;
  * never run by the driver.
  *
  * Usage: SPARK_GRAFT_PROBE=d41_cdc_chunk_store sbt "runMain graft.Probe"
  */
object Probe {
  private case class Job(id: Int, desc: String, start: Long,
    var end: Long = -1L, var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE",
      args.headOption.getOrElse("")).split(',').map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "45s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, Job(js.jobId, desc, js.time,
          tasks = js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for (a <- si.submissionTime; b <- si.completionTime)
          yield (b - a) / 1e3).getOrElse(-1.0)
        stages.put(si.stageId,
          f"    stage ${si.stageId}%4d ${dur}%7.3fs tasks=${si.numTasks}%4d " +
            si.name.take(100))
      }
    })

    // warmup: same as Bench
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { run =>
        jobs.clear(); stages.clear()
        graft.operators.DedupQueries.clearLabelsCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val total = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let job-end events drain
        val js = jobs.values().toArray(Array.empty[Job]).sortBy(_.start)
        val base = js.headOption.map(_.start).getOrElse(0L)
        println(f"== $name run $run: $total%.2f s, ${js.length} jobs ==")
        js.foreach { j =>
          val dur = if (j.end < 0) -1.0 else (j.end - j.start) / 1e3
          println(f"  job ${j.id}%4d +${(j.start - base) / 1e3}%7.2fs " +
            f"${dur}%7.3fs tasks=${j.tasks}%4d ${j.desc.take(80)}")
        }
        if (run == 2 && sys.env.contains("SPARK_GRAFT_PROBE_STAGES"))
          stages.keySet().toArray(Array.empty[Integer]).sorted
            .foreach(k => println(stages.get(k)))
      }
    }
    spark.stop()
  }
}
