package graft

import java.security.MessageDigest

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property check for the c18 incremental-funnel core: on random corpora
  * with forced hash collisions and arbitrary old/batch splits, the
  * engine's incremental report must equal a plain-Scala full-rerun
  * reference — the same "incremental ≡ rebuild" contract d13/d28/d30
  * carry, here covering BOTH eviction paths (dedup swap by a smaller-id
  * duplicate, cap displacement by a small-id entrant) on shapes the
  * fixed testdata cannot enumerate.
  */
object FunnelProps extends Properties("IncrementalFunnel") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(15)

  // a small pool of quality-passing texts (>= 10 tokens, no punctuation)
  // so duplicate hashes are common under random draws
  private val texts: Vector[String] = Vector.tabulate(6)(i =>
    s"alpha bravo charlie delta echo foxtrot golf hotel india text$i")

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Plain-Scala full-rerun reference of the funnel report. */
  private def reference(old: Seq[(Long, String, String)],
      batch: Seq[(Long, String, String)],
      cap: Int): Map[String, (Long, Long, Long)] = {
    val batchIds = batch.map(_._1).toSet
    def winners(docs: Seq[(Long, String, String)]) = docs
      .groupBy(d => md5Hex(d._2)).values.map(_.minBy(_._1)).toSeq
    def admitted(ws: Seq[(Long, String, String)]) = ws
      .groupBy(_._3).flatMap { case (_, g) => g.sortBy(_._1).take(cap) }.toSeq
    val full = admitted(winners(old ++ batch))
    val oldAdm = admitted(winners(old))
    val fullIds = full.map(_._1).toSet
    val evByS = oldAdm.filterNot(d => fullIds.contains(d._1))
      .groupBy(_._3).map { case (s, g) => s -> g.size.toLong }
    full.groupBy(_._3).map { case (s, g) =>
      s -> ((g.size.toLong, g.count(d => batchIds.contains(d._1)).toLong,
        evByS.getOrElse(s, 0L)))
    }
  }

  private val docGen: Gen[(Long, String, String)] = for {
    id <- Gen.choose(1L, 400L)
    t <- Gen.oneOf(texts)
    s <- Gen.oneOf("A", "B", "C")
  } yield (id, t, s)

  property("incremental report equals the plain-Scala full rerun") =
    forAll(Gen.listOfN(30, docGen), Gen.choose(1, 5)) { (raw, cap) =>
      // distinct ids (the funnel's documents contract), random split
      val docs = raw.groupBy(_._1).values.map(_.head).toSeq
      val (old, batch) = docs.partition(_._1 % 3 != 0)
      val got = operators.TextQueries.incrementalFunnel(
          old.toDF("doc_id", "text", "source"),
          batch.toDF("doc_id", "text", "source"), cap)
        .select($"source", $"final_count", $"new_admitted", $"evicted_old")
        .as[(String, Long, Long, Long)].collect()
        .map { case (s, a, b, c) => s -> ((a, b, c)) }.toMap
      val want = reference(old, batch, cap)
      if (got != want)
        println(s"cap=$cap old=${old.sortBy(_._1)} batch=${batch.sortBy(_._1)}\n got=$got\nwant=$want")
      got == want
    }
}
