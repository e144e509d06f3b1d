package graft

import graft.functions.VectorFunctions.cosineExact
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-path behavior on a corpus ~10× the sf0.1 tables: the properties
  * that make the ANN operators survive a 100×/1000× scale-up are
  * CANDIDATE-SET REDUCTION (LSH bands, IVF buckets prune almost all of
  * the corpus before any exact distance runs) — asserted here on 50k
  * deterministic pseudo-random vectors, where timing would be flaky but
  * row counts are exact.
  */
class ScaleSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val n = 50000
  private val dims = 64

  /** Deterministic pseudo-random unit-ish vectors via hash(id, d). */
  private def vectors = spark.range(n).select($"id".as("vec_id"),
    expr(s"""transform(sequence(0, ${dims - 1}),
               d -> CAST(pmod(hash(id, d), 1000) / 500.0 - 1.0 AS FLOAT))""")
      .as("embedding"))

  test("hyperplane LSH prunes the candidate set to a small fraction of the corpus") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val planesLit = typedlit((0 until 16).map { p =>
      (0 until dims).map { d =>
        val hex = md.digest(s"$p:$d".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (hex.head < '8') -1.0 else 1.0
      }
    })
    val bands = vectors
      .select($"vec_id", $"embedding", planesLit.as("planes"))
      .select($"vec_id", $"embedding", expr(
        """transform(sequence(1, 16), p ->
             CASE WHEN aggregate(
               zip_with(embedding, element_at(planes, p),
                 (x, h) -> CAST(x AS DOUBLE) * h),
               0.0D, (acc, v) -> acc + v) >= 0 THEN 1 ELSE 0 END)""").as("bits"))
      .select($"vec_id", $"embedding", posexplode(expr(
        """transform(sequence(0, 3), b ->
             element_at(bits, 4*b+1)*8 + element_at(bits, 4*b+2)*4 +
             element_at(bits, 4*b+3)*2 + element_at(bits, 4*b+4))"""))
        .as(Seq("band", "bval")))
    val qBands = bands.filter($"vec_id" === 0)
      .select($"band".as("qband"), $"bval".as("qbval"))
    val nCands = bands.filter($"vec_id" =!= 0)
      .join(broadcast(qBands), $"band" === $"qband" && $"bval" === $"qbval")
      .select($"vec_id").distinct().count()
    info(s"LSH candidates (4×4-bit bands): $nCands of ${n - 1} " +
      f"(${100.0 * nCands / (n - 1)}%.1f%%)")
    assert(nCands > 0, "bands too selective — no candidates at all")
    // 4-bit bands: random-collision ≈ 1-(15/16)^4 ≈ 22% — the recall
    // setting the small oracle corpus needs
    assert(nCands < n / 4,
      s"banding failed to prune: $nCands candidates of $n vectors")

    // the scale knob: widening bands to 8 bits (2 bands × 8) drops the
    // random-collision rate to ≈ 2/256 < 1% at the cost of recall —
    // same signature, different banding, two orders fewer candidates
    val wide = vectors
      .select($"vec_id", planesLit.as("planes"), $"embedding")
      .select($"vec_id", expr(
        """transform(sequence(0, 1), b ->
             aggregate(sequence(1, 8), 0,
               (acc, i) -> acc * 2 + CASE WHEN aggregate(
                 zip_with(embedding, element_at(planes, b * 8 + i),
                   (x, h) -> CAST(x AS DOUBLE) * h),
                 0.0D, (acc2, v) -> acc2 + v) >= 0 THEN 1 ELSE 0 END))""")
        .as("bands8"))
      .select($"vec_id", posexplode($"bands8").as(Seq("band", "bval")))
    val q8 = wide.filter($"vec_id" === 0)
      .select($"band".as("qband"), $"bval".as("qbval"))
    val nCands8 = wide.filter($"vec_id" =!= 0)
      .join(broadcast(q8), $"band" === $"qband" && $"bval" === $"qbval")
      .select($"vec_id").distinct().count()
    info(s"LSH candidates (2×8-bit bands): $nCands8 of ${n - 1} " +
      f"(${100.0 * nCands8 / (n - 1)}%.2f%%)")
    assert(nCands8 < nCands / 5,
      s"8-bit bands should prune far harder: $nCands8 vs $nCands")
  }

  test("IVF probe restricts exact scoring to roughly one bucket of the corpus") {
    val cents = vectors.filter($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    // double-precision argmin is fine here — this asserts pruning, not
    // oracle-exact ranking
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"dist2".asc, $"cid".asc)
    val assigned = vectors.crossJoin(broadcast(cents))
      .select($"vec_id", $"cid", expr(
        """aggregate(zip_with(embedding, cv,
             (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                       * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
             0.0D, (acc, v) -> acc + v)""").as("dist2"))
      .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"vec_id", $"cid")
    val qBucket = assigned.filter($"vec_id" === 0).select($"cid".as("qcid"))
    val bucketSize = assigned.join(broadcast(qBucket), $"cid" === $"qcid")
      .filter($"vec_id" =!= 0).count()
    info(s"IVF probe bucket: $bucketSize of ${n - 1} vectors")
    assert(bucketSize > 0)
    assert(bucketSize < n / 2,
      s"IVF bucket holds $bucketSize of $n — coarse quantizer not partitioning")
  }

  /** Deterministic synthetic corpus: 30 hex tokens per doc, every doc
    * prefixed with the SAME 10-token boilerplate header (aligned to
    * d14's paragraph boundary) — the worst-case hot key.
    */
  private def syntheticDocs(count: Int) = spark.range(count)
    .select($"id".as("doc_id"), concat(
      lit((0 until 10).map(i => f"boiler$i%02d").mkString(" ")), lit(" "),
      expr("""array_join(transform(sequence(0, 29),
               i -> substr(md5(concat(id, ':', i)), 1, 6)), ' ')"""))
      .as("text"))

  test("paragraph dedup survives a boilerplate paragraph shared by all 50k docs") {
    // one paragraph hash carries the entire corpus: the min(struct) agg
    // combines it map-side (a row_number window would put all 50k
    // occurrences in ONE partition). Only doc 0 keeps the header.
    val out = graft.operators.DedupQueries.paragraphDedup(syntheticDocs(n))
    val agg = out.agg(
      sum(when($"doc_id" === 0, $"n_dropped")).as("drop0"),
      sum($"n_dropped").as("dropAll"),
      count(when($"n_dropped" =!= 1 && $"doc_id" =!= 0, 1)).as("offenders"))
      .head()
    assert(agg.getLong(0) == 0L, "doc 0 must keep the first boilerplate occurrence")
    assert(agg.getLong(1) == (n - 1).toLong, s"expected ${n - 1} dropped headers")
    assert(agg.getLong(2) == 0L, "a non-boilerplate paragraph collided")
  }

  test("incremental dedup at 50k: copies flagged against the index, fresh pass through") {
    val old = syntheticDocs(n)
    // batch: 200 exact copies of corpus docs + 200 fresh docs (different
    // hash salt → disjoint shingles beyond the boilerplate header)
    val copies = old.filter($"doc_id" % 250 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val fresh = spark.range(200)
      .select(($"id" + 2000000L).as("doc_id"), concat(
        lit((0 until 10).map(i => f"boiler$i%02d").mkString(" ")), lit(" "),
        expr("""array_join(transform(sequence(0, 29),
                 i -> substr(md5(concat('fresh', id, ':', i)), 1, 6)), ' ')"""))
        .as("text"))
    val out = graft.operators.DedupQueries
      .incrementalDedup(old, copies.unionByName(fresh))
    val byKind = out.groupBy(($"new_id" >= 2000000L).as("isFresh"))
      .agg(count(lit(1)).as("total"),
        count(when($"is_dup", 1)).as("dups"))
      .collect().map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byKind(false) == (200L, 200L), s"planted copies missed: ${byKind(false)}")
    // fresh docs share only the 10-token header (8 of ~36 shingles —
    // Jaccard far below 0.5); none may be flagged
    assert(byKind(true)._1 == 200L && byKind(true)._2 == 0L,
      s"fresh docs misflagged: ${byKind(true)}")
  }

  test("semantic-dedup clustering bounds the pair space; scaled copies co-cluster") {
    // SemDeDup at scale stands on two facts: (1) k-way spherical
    // clustering shrinks the quadratic pair space by ~k; (2) scaling a
    // vector by 2 is EXACT through float×2, double products, sequential
    // sums, and sqrt — so a ×2 copy's centroid cosines are bit-identical
    // to its original's and co-clustering is guaranteed, not lucky.
    graft.plans.VectorExpressions.register(spark)
    val copies = vectors.filter($"vec_id" % 1000 === 0)
      .select(($"vec_id" + 1000000L).as("vec_id"),
        expr("transform(embedding, x -> x * CAST(2.0 AS FLOAT))").as("embedding"))
    val corp = vectors.unionByName(copies)
    val cents = vectors.filter($"vec_id" < 64)
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"cos".desc, $"cid".asc)
    val assigned = corp.crossJoin(broadcast(cents))
      .select($"vec_id", $"cid",
        (expr("vec_dot(embedding, cv)") /
          (sqrt(expr("vec_dot(embedding, embedding)"))
            * sqrt(expr("vec_dot(cv, cv)")))).as("cos"))
      .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"vec_id", $"cid")
    assigned.cache()
    val total = n + n / 1000
    val sizes = assigned.groupBy($"cid").count().select($"count").as[Long].collect()
    assert(sizes.sum == total)
    val pairSpace = sizes.map(s => s * (s - 1) / 2).sum
    val allPairs = total.toLong * (total - 1) / 2
    info(f"within-cluster pair space: $pairSpace of $allPairs " +
      f"(${100.0 * pairSpace / allPairs}%.2f%%, ${sizes.length} clusters)")
    // balanced 64-way clustering would give 1/64 ≈ 1.6%; allow 3× skew
    assert(pairSpace < allPairs / 20,
      s"clustering failed to shrink the pair space: $pairSpace of $allPairs")
    // co-clustering: every ×2 copy is assigned its original's cell
    val mismatch = assigned.filter($"vec_id" >= 1000000L)
      .select(($"vec_id" - 1000000L).as("vec_id"), $"cid".as("copy_cid"))
      .join(assigned, "vec_id")
      .filter($"copy_cid" =!= $"cid").count()
    assert(mismatch == 0, s"$mismatch scaled copies changed cluster")
    assigned.unpersist()
  }

  test("brute-force and LSH agree on the exact top match when it is in-bucket") {
    // a vector nearly identical to the query must share all 4 bands and
    // win the exact re-rank — recall sanity for the LSH path
    val near = vectors.filter($"vec_id" === 0)
      .select(lit(n.toLong).as("vec_id"),
        expr(s"transform(embedding, x -> CAST(x * 1.0001D AS FLOAT))").as("embedding"))
    val corpus = vectors.unionByName(near)
    val q = corpus.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val top = corpus.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id", cosineExact("embedding", "qv").as("cos"))
      .orderBy($"cos".desc).limit(1)
      .head().getLong(0)
    assert(top == n.toLong, s"exact top-1 should be the planted near-copy, got $top")
  }

  test("hot-bucket guard skips a 10k-copy bucket before any pair expansion") {
    import graft.operators.DedupQueries
    // a crawl-shaped pathology: 10k rows land in ONE bucket (10k exact
    // copies of a page share every band value), plus two healthy buckets
    val rows = spark.range(10000)
      .select(lit("hot").as("bkey"), $"id".as("doc_id"))
      .unionByName(Seq(("a", 1L), ("a", 2L), ("a", 3L),
        ("b", 7L), ("b", 8L)).toDF("bkey", "doc_id"))
    val obs = new org.apache.spark.sql.util.QueryExecutionListener {
      @volatile var dropped = -1L
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        qe.observedMetrics.get("guard_hot_buckets")
          .foreach(r => dropped = r.getAs[Long]("dropped_hot_buckets"))
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(obs)
    try {
      val lists = DedupQueries.boundedPostingLists(rows, Seq("bkey"),
        $"doc_id", maxBucket = 1000, metric = "guard_hot_buckets")
      val got = lists.select($"bkey", $"docs").as[(String, Seq[Long])]
        .collect().sortBy(_._1)
      // the hot bucket is SKIPPED (never collected, never expanded) —
      // 10k copies belong to the exact-dedup pass, not O(k²) pairing;
      // healthy buckets are intact and sorted
      assert(got.map(_._1).toSeq == Seq("a", "b"), s"got ${got.toSeq}")
      assert(got(0)._2 == Seq(1L, 2L, 3L) && got(1)._2 == Seq(7L, 8L))
      // count-first shape: the guard is a semi-join feeding the collect,
      // so no task ever aggregates the 10k-row bucket into one array
      val plan = lists.queryExecution.executedPlan.toString
      assert(plan.contains("LeftSemi"),
        s"guard must pre-filter via semi-join, plan was:\n$plan")
      // listener delivery is async — poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (obs.dropped < 0 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(obs.dropped == 1L,
        s"dropped-bucket observe metric should report 1, got ${obs.dropped}")
    } finally spark.listenerManager.unregister(obs)
  }

  test("salted self-join pair path: same pairs on healthy buckets, keeps + distributes a hot one") {
    import graft.operators.DedupQueries
    val healthy = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 7L), ("b", 8L),
      ("c", 9L)).toDF("bkey", "doc_id")
    def capped(df: org.apache.spark.sql.DataFrame) =
      DedupQueries.pairsFromPostingLists(DedupQueries.boundedPostingLists(
        df, Seq("bkey"), $"doc_id", maxBucket = 1000, metric = "ab_guard"))
    def salted(df: org.apache.spark.sql.DataFrame) =
      DedupQueries.saltedBucketPairs(df, Seq("bkey"), "doc_id", salts = 8)

    // A/B equivalence where no bucket exceeds the cap
    val a = capped(healthy).as[(Long, Long)].collect().toSet
    val b = salted(healthy).as[(Long, Long)].collect().toSet
    assert(a == Set((1L, 2L), (1L, 3L), (2L, 3L), (7L, 8L)))
    assert(b == a, s"salted path diverged on healthy buckets: $b vs $a")

    // crawl-shaped hot bucket: 3k copies of one page in a single bucket.
    // The capped path DROPS it (pairs belong to the exact pass); the
    // salted path KEEPS all C(3000,2) pairs, and the expansion runs as a
    // (bkey, salt)-keyed shuffle join — 8 lanes instead of one in-row
    // k² task, and visible to AQE skew splitting.
    val hot = spark.range(3000)
      .select(lit("hot").as("bkey"), ($"id" + 100L).as("doc_id"))
      .unionByName(healthy)
    assert(capped(hot).count() == 4L)
    val saltedPairs = salted(hot)
    assert(saltedPairs.count() == 3000L * 2999 / 2 + 4)
    val plan = saltedPairs.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"),
      s"salt lane must be part of the join key, plan was:\n$plan")
    // each lane carries ~1/8 of the hot bucket's left side: the salt
    // actually spreads the key, so no join partition owns the whole k
    val leftLanes = hot.select(pmod(hash($"doc_id"), lit(8)).as("lane"))
      .groupBy($"lane").count().as[(Int, Long)].collect().toMap
    assert(leftLanes.size == 8 && leftLanes.values.max < 3006L / 4,
      s"salting failed to spread the hot bucket: $leftLanes")
  }

  test("adaptive pair routing: per-bucket lane choice from observed size, no code change") {
    import graft.operators.DedupQueries
    val healthy = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 7L), ("b", 8L),
      ("c", 9L)).toDF("bkey", "doc_id")
    val obs = new org.apache.spark.sql.util.QueryExecutionListener {
      @volatile var dropped = -1L
      @volatile var saltedN = -1L
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        qe.observedMetrics.get("adaptive_guard").foreach { r =>
          dropped = r.getAs[Long]("dropped_hot_buckets")
          saltedN = r.getAs[Long]("salted_hot_buckets")
        }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    def adaptive(df: org.apache.spark.sql.DataFrame, dropAbove: Int) =
      DedupQueries.adaptiveBucketPairs(df, Seq("bkey"), $"doc_id",
        "adaptive_guard", maxBucket = 1000, salts = 8, dropAbove = dropAbove)
        .select($"pa".as("doc_a"), $"pb".as("doc_b")).distinct()
    def await(): Unit = {
      val deadline = System.nanoTime() + 10_000_000_000L
      while (obs.dropped < 0 && System.nanoTime() < deadline) Thread.sleep(50)
    }
    spark.listenerManager.register(obs)
    try {
      // healthy corpus: identical pairs to the capped-only path, and the
      // salted lane sees zero buckets — the cheap plan is kept
      val a = adaptive(healthy, dropAbove = 20000)
        .as[(Long, Long)].collect().toSet
      assert(a == Set((1L, 2L), (1L, 3L), (2L, 3L), (7L, 8L)))
      await()
      assert(obs.dropped == 0L && obs.saltedN == 0L,
        s"healthy corpus routed wrong: dropped=${obs.dropped} salted=${obs.saltedN}")

      // planted 3k-copy hot bucket: routed to the salted lane
      // automatically — ALL C(3000,2) pairs survive, none dropped
      obs.dropped = -1L; obs.saltedN = -1L
      val hot = spark.range(3000)
        .select(lit("hot").as("bkey"), ($"id" + 100L).as("doc_id"))
        .unionByName(healthy)
      assert(adaptive(hot, dropAbove = 20000).count() == 3000L * 2999 / 2 + 4)
      await()
      assert(obs.dropped == 0L && obs.saltedN == 1L,
        s"hot bucket should take the salted lane: dropped=${obs.dropped} salted=${obs.saltedN}")

      // same bucket past the drop threshold: exact-clone pathology is
      // dropped (belongs to the exact pass), healthy pairs intact
      obs.dropped = -1L; obs.saltedN = -1L
      assert(adaptive(hot, dropAbove = 2000).count() == 4L)
      await()
      assert(obs.dropped == 1L && obs.saltedN == 0L,
        s"past-drop bucket should be dropped: dropped=${obs.dropped} salted=${obs.saltedN}")
    } finally spark.listenerManager.unregister(obs)
  }

  test("adaptive pair routing boundaries: off-by-one at both lane edges, no self-pairs") {
    import graft.operators.DedupQueries
    // Small maxBucket/dropAbove stand in for the production constants —
    // the router compares bucket COUNT against the thresholds, so the
    // off-by-one behavior at (maxBucket, maxBucket+1) and (dropAbove,
    // dropAbove+1) is identical at any magnitude, and a test at the real
    // dropLshBucket=20000 would have to materialize C(20k,2)≈2×10⁸ pairs.
    def bucket(k: String, ids: Seq[Long]) =
      ids.map(i => (k, i)).toDF("bkey", "doc_id")
    val df = bucket("m4", (1L to 4L).toSeq)    // == maxBucket   → capped lane
      .unionByName(bucket("m5", (11L to 15L).toSeq)) // maxBucket+1 → salted lane
      .unionByName(bucket("d6", (21L to 26L).toSeq)) // == dropAbove → salted, KEPT
      .unionByName(bucket("d7", (31L to 37L).toSeq)) // dropAbove+1  → dropped
      .unionByName(bucket("dup", Seq(42L, 42L)))     // duplicated payload
    val obs = new org.apache.spark.sql.util.QueryExecutionListener {
      @volatile var dropped = -1L
      @volatile var saltedN = -1L
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        qe.observedMetrics.get("adaptive_boundary").foreach { r =>
          dropped = r.getAs[Long]("dropped_hot_buckets")
          saltedN = r.getAs[Long]("salted_hot_buckets")
        }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(obs)
    try {
      val pairs = DedupQueries.adaptiveBucketPairs(df, Seq("bkey"), $"doc_id",
        "adaptive_boundary", maxBucket = 4, salts = 2, dropAbove = 6)
        .select($"bkey", $"pa", $"pb").distinct()
        .as[(String, Long, Long)].collect().toSet
      def all(k: String, ids: Seq[Long]) =
        (for { a <- ids; b <- ids if a < b } yield (k, a, b)).toSet
      // size==maxBucket pairs fully in the capped lane; size==dropAbove
      // pairs fully in the salted lane; size==dropAbove+1 contributes
      // NOTHING; a duplicated payload never self-pairs in either lane
      assert(pairs == all("m4", (1L to 4L).toSeq) ++
        all("m5", (11L to 15L).toSeq) ++ all("d6", (21L to 26L).toSeq),
        s"boundary pair set wrong: ${pairs.toSeq.sorted.take(40)}")
      val deadline = System.nanoTime() + 10_000_000_000L
      while (obs.dropped < 0 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(obs.dropped == 1L && obs.saltedN == 2L,
        s"boundary metrics wrong: dropped=${obs.dropped} salted=${obs.saltedN}")
    } finally spark.listenerManager.unregister(obs)
  }

  test("bloom prefilter (d23): zero false negatives, disjoint corpus pruned to ~fpp") {
    // the two properties that make the sketch path safe and worthwhile:
    // every true benchmark shingle survives (no false negative → the
    // exact confirm join sees every real hit), and a DISJOINT corpus is
    // pruned to roughly the configured false-positive rate — at 100 TB
    // that is the difference between joining ~1% of shingles and all of
    // them.
    val bench = spark.range(10000)
      .select(concat(lit("bench-"), $"id").as("shingle"))
    val bloom = bench.stat.bloomFilter("shingle", 10000, 0.01)
    graft.plans.BloomFilterExpressions.register(spark, "scale_bloom", bloom)
    assert(bench.filter(expr("scale_bloom(shingle)")).count() == 10000L,
      "a Bloom filter must have NO false negatives")
    val disjoint = spark.range(100000)
      .select(concat(lit("corpus-"), $"id").as("shingle"))
    val kept = disjoint.filter(expr("scale_bloom(shingle)")).count()
    assert(kept <= 3000L,
      s"1%-fpp sketch kept $kept of 100000 disjoint shingles")
  }

  test("binary quantization (s17): planted copy of the query is Hamming-0 and ranks first") {
    // sign-bit codes must be a function of the vector alone — an exact
    // copy of the query lands at Hamming 0 and wins every ranking, at
    // any corpus size; random vectors stay far (≈32/64 bits differ)
    val base = vectors // 50k deterministic vectors
    val copy = base.filter($"vec_id" === 0)
      .select(lit(999999L).as("vec_id"), $"embedding")
    val emb = base.unionByName(copy)
    val comps = emb.select($"vec_id",
      posexplode_outer($"embedding").as(Seq("dim", "x")))
    val thr = comps.groupBy($"dim")
      .agg((sum($"x".cast("double")) / count(lit(1))).as("mu"))
    val codes = comps.join(broadcast(thr), Seq("dim"))
      .groupBy($"vec_id")
      .agg(
        expr("""bit_or(CASE WHEN dim < 32 AND CAST(x AS DOUBLE) > mu
                  THEN shiftleft(CAST(1 AS BIGINT), dim) ELSE CAST(0 AS BIGINT) END)""")
          .as("w0"),
        expr("""bit_or(CASE WHEN dim >= 32 AND CAST(x AS DOUBLE) > mu
                  THEN shiftleft(CAST(1 AS BIGINT), dim - 32) ELSE CAST(0 AS BIGINT) END)""")
          .as("w1"))
    val q = codes.filter($"vec_id" === 0).select($"w0".as("q0"), $"w1".as("q1"))
    val ranked = codes.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id",
        expr("CAST(bit_count(w0 ^ q0) + bit_count(w1 ^ q1) AS BIGINT)").as("hamming"))
      .orderBy($"hamming".asc, $"vec_id".asc)
      .limit(5).as[(Long, Long)].collect()
    assert(ranked.head == (999999L, 0L),
      s"planted copy must win at Hamming 0, got ${ranked.toSeq}")
    val med = codes.filter($"vec_id" =!= 0 && $"vec_id" =!= 999999L)
      .crossJoin(broadcast(q))
      .select(expr("CAST(bit_count(w0 ^ q0) + bit_count(w1 ^ q1) AS DOUBLE)").as("h"))
      .agg(percentile($"h", lit(0.5))).as[Double].head()
    assert(med >= 16.0 && med <= 48.0,
      s"random vectors should sit near 32/64 differing bits, median $med")
  }
}
