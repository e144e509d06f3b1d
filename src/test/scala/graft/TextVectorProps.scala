package graft

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks for the text/vector primitives under the dedup,
  * similarity, and text-analysis queries: totality, structural laws, and
  * the exactness guarantees (decimal sums are order-independent, so
  * algebraic identities hold EXACTLY, not within epsilon).
  */
object TextVectorProps extends Properties("TextVector") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(20)

  // ------------------------------------------------------------ text laws

  property("shingle count is max(0, n_tokens - 2) on arbitrary text") =
    forAll(Gen.listOf(Gen.alphaNumStr.map(_.take(6)).suchThat(_.nonEmpty))) { ws =>
      val text = ws.mkString(" ")
      val (nToks, nSh) = Seq(text).toDF("text")
        .withColumn("toks", TextFunctions.tokens($"text"))
        .select(size($"toks"), size(TextFunctions.shingles("toks")))
        .as[(Int, Int)].head()
      nSh == math.max(0, nToks - 2)
    }

  property("fingerprint is invariant under whitespace layout") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(6)).suchThat(_.nonEmpty))) { ws =>
      val canonical = ws.mkString(" ")
      val messy = "  " + ws.mkString("   ") + " "
      val fps = Seq(canonical, messy).toDF("text")
        .select(TextFunctions.fingerprint($"text")).as[String].collect()
      fps(0) == fps(1)
    }

  property("simhash32 stays within unsigned 32-bit range") =
    forAll(Gen.listOf(Gen.alphaNumStr.map(_.take(6)))) { ws =>
      val sh = Seq(ws.mkString(" ")).toDF("text")
        .withColumn("toks", TextFunctions.tokens($"text"))
        .select(TextFunctions.simhash32("toks")).as[Long].head()
      sh >= 0L && sh < (1L << 32)
    }

  // ---------------------------------------------------------- vector laws

  private val vecGen: Gen[List[Float]] =
    Gen.listOfN(8, Gen.choose(-100.0, 100.0).map(_.toFloat))

  private def twoVec(a: List[Float], b: List[Float]) =
    Seq((a, b)).toDF("a", "b")

  property("dotExact is symmetric — exactly (decimal sums commute)") =
    forAll(vecGen, vecGen) { (a, b) =>
      val (ab, ba) = twoVec(a, b)
        .select(VectorFunctions.dotExact("a", "b"),
          VectorFunctions.dotExact("b", "a")).as[(Double, Double)].head()
      ab == ba
    }

  property("l2SqExact(v, v) is exactly zero") =
    forAll(vecGen) { v =>
      twoVec(v, v).select(VectorFunctions.l2SqExact("a", "b"))
        .as[Double].head() == 0.0
    }

  property("l2Sq law: |a-b|^2 = a.a + b.b - 2 a.b within product rounding") =
    forAll(vecGen, vecGen) { (a, b) =>
      // each per-element double product is exact in decimal, and
      // (x-y)^2 in double equals x^2+y^2-2xy only approximately — so
      // compare within the double-product rounding bound, not exactly
      val (l2, aa, bb, ab) = twoVec(a, b).select(
        VectorFunctions.l2SqExact("a", "b"), VectorFunctions.dotExact("a", "a"),
        VectorFunctions.dotExact("b", "b"), VectorFunctions.dotExact("a", "b"))
        .as[(Double, Double, Double, Double)].head()
      math.abs(l2 - (aa + bb - 2 * ab)) <= 1e-6 * math.max(1.0, math.abs(l2))
    }

  property("cosineExact of a vector with a positive scaling of itself is 1") =
    forAll(vecGen.suchThat(v => v.exists(_ != 0.0f)),
      Gen.choose(1, 4)) { (v, k) =>
      val scaled = v.map(x => x * (1 << k).toFloat) // power-of-two: exact in float
      val c = twoVec(v, scaled)
        .select(round(VectorFunctions.cosineExact("a", "b"), 9))
        .as[Double].head()
      c == 1.0
    }

  // --------------------------------------------- substring span reference

  /** Plain-Scala reference for DedupQueries.substringSpans: flag every
    * L-window occurring in ≥2 distinct docs whose doc is not the min-id
    * owner, merge starts into maximal intervals, summarize per doc.
    */
  private def refSpans(docs: Seq[(Long, Seq[String])], L: Int)
      : Map[Long, (Long, Long, Long)] = {
    val grams = docs.flatMap { case (id, toks) =>
      if (toks.size >= L)
        (0 to toks.size - L).map(p => (toks.slice(p, p + L).mkString(" "), id, p))
      else Nil
    }
    val owners = grams.groupBy(_._1).map { case (g, os) =>
      g -> (os.map(_._2).distinct.size, os.map(_._2).min) }
    val flagged = grams.filter { case (g, id, _) =>
      val (df, owner) = owners(g); df >= 2 && id != owner }
    flagged.groupBy(_._2).map { case (id, ws) =>
      var spans = List.empty[(Int, Int)]
      ws.map(_._3).sorted.foreach { p =>
        spans match {
          case (s, e) :: rest if p <= e => spans = (s, math.max(e, p + L)) :: rest
          case _ => spans = (p, p + L) :: spans
        }
      }
      val n = docs.find(_._1 == id).get._2.size.toLong
      id -> ((spans.size.toLong, spans.map { case (s, e) => e - s }.sum.toLong, n))
    }
  }

  private val spanDocsGen: Gen[Seq[(Long, Seq[String])]] = for {
    nDocs <- Gen.choose(2, 5)
    vocab <- Gen.choose(2, 3) // tiny vocab → organic window collisions
    docs <- Gen.listOfN(nDocs, Gen.choose(0, 14).flatMap(len =>
      Gen.listOfN(len, Gen.choose(0, vocab - 1).map(i => s"w$i"))))
    copyFrom <- Gen.choose(0, nDocs - 1) // plant one exact copy
  } yield (docs :+ docs(copyFrom)).zipWithIndex
    .map { case (t, i) => ((i + 1).toLong, t.toSeq) }

  property("substringSpans equals the plain-Scala reference (L=4)") =
    forAll(spanDocsGen) { docs =>
      val nonEmpty = docs.filter(_._2.nonEmpty)
      val got = graft.operators.DedupQueries.substringSpans(
        nonEmpty.map { case (id, ts) => (id, ts.mkString(" ")) }
          .toDF("doc_id", "text"), L = 4)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      got == refSpans(nonEmpty, 4)
    }

  // ------------------------------------------------- bpe encode reference

  /** Greedy left-to-right non-overlapping application of one merge. */
  private def refMergeOnce(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private val mergeChainGen: Gen[(String, Seq[(String, String)])] = for {
    word <- Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    nMerges <- Gen.choose(0, 6)
    picks <- Gen.listOfN(nMerges * 2, Gen.choose(0, 99))
  } yield {
    // chain merges over the growing symbol set so later merges can have
    // multi-char sides (the representation must treat symbols opaquely)
    val symbols = scala.collection.mutable.ArrayBuffer("a", "b", "c")
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    picks.grouped(2).foreach {
      case Seq(i, j) =>
        val m = (symbols(i % symbols.size), symbols(j % symbols.size))
        if (!merges.contains(m) && !symbols.contains(m._1 + m._2)) {
          merges += m; symbols += (m._1 + m._2)
        }
      case _ => ()
    }
    (word, merges.toSeq)
  }

  property("bpeEncodeSymExpr replace-fold equals the greedy merge reference") =
    forAll(mergeChainGen) { case (word, merges) =>
      val enc = Seq(Tuple1(word)).toDF("w")
        .select(expr(TextFunctions.bpeEncodeSymExpr(merges, "w")))
        .as[String].head()
      val gotSyms = enc.split('\u0001').filter(_.nonEmpty).toList
      val want = merges.foldLeft(word.map(_.toString).toList) {
        case (syms, (a, b)) => refMergeOnce(syms, a, b) }
      gotSyms == want
    }
}
