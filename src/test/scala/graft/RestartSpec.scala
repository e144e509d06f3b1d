package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once across restarts — the guarantee the reference lacks
  * (mb8600.py:308-311 drops batches on error; in-queue data dies on
  * shutdown). A checkpointed file-source → parquet-sink query is stopped
  * and restarted with more input; rows are neither lost nor duplicated.
  */
class RestartSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("checkpointed stream restart: no loss, no duplicates") {
    val base = Files.createTempDirectory("restart").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(in))
    val src = Paths.get(s"$sfDir/events.parquet")

    def runOnce(): Unit = {
      // schema/transform sniffed from the source testdata footer, so the
      // spec tracks whatever physical ts encoding the generator ships
      val (schema, fix) = graft.streaming.EventsStream.sniff(spark, sfDir)
      val stream = fix(spark.readStream.schema(schema).parquet(in))
      val q = stream.writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      q.stop()
    }

    val n = Tables.events(spark, sfDir).count()

    Files.copy(src, Paths.get(s"$in/batch1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    runOnce()
    assert(spark.read.parquet(out).count() == n)

    // restart with one more file: only the new file is processed
    Files.copy(src, Paths.get(s"$in/batch2.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    runOnce()
    assert(spark.read.parquet(out).count() == 2 * n) // not 3n (no replay), not n (no loss)
  }
}
