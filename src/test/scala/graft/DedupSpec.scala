package graft

import graft.operators.DedupQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cluster-resolution edge cases that the oracle queries can't reach:
  * the planted-duplicate corpus always HAS near-dups, so the empty
  * candidate graph (a corpus with nothing to dedup) only shows up here.
  */
class DedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** A documents dir whose derived corpus yields ZERO LSH candidate
    * pairs: doc_ids 2..9 dodge the corpus()'s planted-copy strata
    * (%10==0 exact, %10==1 near), and the texts share no 3-shingle, so
    * no MinHash band can collide.
    */
  private lazy val noDupDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("nodup").toString
    val docs = (2L to 9L).map { i =>
      (i, (0 until 6).map(j => s"w${i}_$j").mkString(" "), "en", "synth", 40L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("clusterLabels on an empty candidate graph converges without NPE") {
    assert(DedupQueries.lshCandidatePairs(spark, noDupDir).count() == 0)
    // pre-fix this threw NullPointerException (sum over zero rows = NULL)
    val labels = DedupQueries.clusterLabels(spark, noDupDir)
    assert(labels.count() == 0)
  }

  test("d08/d09 run green over a corpus with nothing to dedup") {
    val clusters = SparkEntry.queries("d08_dedup_clusters")(spark, noDupDir)
    assert(clusters.count() == 0)
    val survivors = SparkEntry.queries("d09_dedup_survivors")(spark, noDupDir)
      .collect()
    // every doc is an unclustered original and survives
    assert(survivors.length == 1)
    val r = survivors.head
    assert(r.getAs[String]("origin") == "original")
    assert(r.getAs[Long]("n_docs") == 8L)
    assert(r.getAs[Long]("n_kept") == 8L)
    assert(r.getAs[Long]("n_dropped") == 0L)
  }

  test("label propagation converges in few rounds and labels are canonical") {
    DedupQueries.clearLabelsCache()
    val labels = DedupQueries.clusterLabels(spark, TestSpark.sfDir)
    // every canon must itself be a member's minimum: canon(x) ≤ x, and
    // the canon id appears as a doc with canon == itself (root property)
    val bad = labels.filter($"canon" > $"doc_id").count()
    assert(bad == 0, "a label exceeds its doc_id — propagation not at fixpoint")
    val roots = labels.filter($"canon" === $"doc_id")
      .select($"doc_id".as("root"))
    val orphans = labels.join(roots, labels("canon") === roots("root"), "left_anti")
    assert(orphans.count() == 0, "a cluster label is not itself a root")
  }

  test("labelsCache keys on applicationId and clears on demand") {
    DedupQueries.clearLabelsCache()
    val l1 = DedupQueries.clusterLabels(spark, TestSpark.sfDir)
    val l2 = DedupQueries.clusterLabels(spark, TestSpark.sfDir)
    assert(l1 eq l2, "second call must return the memoized DataFrame")
    DedupQueries.clearLabelsCache()
    val l3 = DedupQueries.clusterLabels(spark, TestSpark.sfDir)
    assert(!(l1 eq l3), "clearLabelsCache must force a recompute")
  }
}
