package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline operators
  * (SURVEY.md §2.D north-star rows): tokenization, shingling, md5-based
  * MinHash, SimHash, language-ID scoring, quality ratios, fingerprints.
  *
  * Everything here is built from native Catalyst expressions (split,
  * higher-order functions, md5, regexp) — no UDFs — so whole-stage codegen
  * applies and the exact same logic is expressible in the DuckDB oracle.
  * Hashes are md5-prefix based rather than murmur3 precisely so the oracle
  * can reproduce them engine-independently.
  */
object TextFunctions {

  /** Whitespace tokens of lowercased trimmed text. */
  def tokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Word n-gram shingles (default 3) from a token array column named
    * inline; empty array when the document is shorter than n tokens.
    */
  def shingles(toksCol: String, n: Int = 3): Column = expr(
    s"""CASE WHEN size($toksCol) >= $n THEN
          transform(sequence(1, size($toksCol) - ${n - 1}),
            i -> concat_ws(' ', ${(0 until n).map(k => s"element_at($toksCol, i + $k)").mkString(", ")}))
        ELSE array() END""")

  /** SQL-text encode expression for applying an ordered BPE merge table
    * to the string variable `w` (a column name or HOF lambda variable):
    * the word becomes a chr(1)-delimited symbol string ("␁a␁␁b␁␁c␁") and
    * each merge (a,b) is ONE literal replace of "␁a␁␁b␁" with "␁ab␁".
    * The double delimiter means a replacement never consumes a
    * neighbouring symbol's boundary, so K sequential replaces equal the
    * greedy left-to-right non-overlapping merge fold (the property
    * TextVectorProps proves against a plain-Scala reference); merged
    * symbols are opaque — a pattern cannot match inside one because its
    * characters lose their delimiters. Multi-char symbols on either side
    * of a merge are supported. Used by t25 and shareable by any encode
    * surface; symbols are escaped for Spark's literal parser.
    */
  def bpeEncodeSymExpr(merges: Seq[(String, String)], w: String = "w"): String = {
    def esc(x: String) = x.replace("\\", "\\\\").replace("'", "\\'")
    val wrapped =
      s"""concat(chr(1), array_join(transform(sequence(1, length($w)),
           i -> substring($w, i, 1)), concat(chr(1), chr(1))), chr(1))"""
    merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      s"""replace($acc,
           concat(chr(1), '${esc(a)}', chr(1), chr(1), '${esc(b)}', chr(1)),
           concat(chr(1), '${esc(a)}${esc(b)}', chr(1)))"""
    }
  }

  /** [[bpeEncodeSymExpr]] over BYTE symbols: `hx` names an
    * already-bound HEX string (hex(encode(word,'UTF-8')) — bind it
    * once; inlining the hex() here would recompute it per byte), which
    * wraps into chr(1)-delimited 2-hex-char byte symbols; the same
    * double-delimiter replace chain then applies the merges. Merge
    * symbols are hex strings ([0-9A-F]+), so no literal escaping can
    * ever fire. Decode is structural: stripping every chr(1) from the
    * encoded string and unhex-ing recovers the original bytes exactly,
    * merges or not — the no-UNK byte-fallback property.
    */
  def byteBpeEncodeSymExpr(merges: Seq[(String, String)],
      hx: String = "hx"): String = {
    // zero-length guard (ADVICE r12): on an empty input the symbol
    // sequence would be Spark's DESCENDING sequence(1, 0) = [1, 0] —
    // two phantom empty symbols (the q100 trap) — so empty bytes encode
    // to the empty string explicitly; the merge replaces below are
    // no-ops on '' either way
    val wrapped =
      s"""CASE WHEN length($hx) >= 2 THEN
           concat(chr(1), array_join(transform(sequence(1, length($hx) div 2),
             i -> substring($hx, 2*i - 1, 2)), concat(chr(1), chr(1))), chr(1))
           ELSE '' END"""
    merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      s"""replace($acc,
           concat(chr(1), '$a', chr(1), chr(1), '$b', chr(1)),
           concat(chr(1), '$a$b', chr(1)))"""
    }
  }

  /** One MinHash component: min over shingles of a salted md5 prefix.
    * NULL for documents with no shingles (mirrors list_min([]) in DuckDB).
    */
  def minhash(shinglesCol: String, perm: Int): Column =
    expr(s"array_min(transform($shinglesCol, x -> substring(md5(concat('$perm:', x)), 1, 16)))")

  /** 32-bit SimHash: bit j is the majority vote over tokens of whether
    * hex digit j of md5(token) has its high bit set (md5 has exactly 32
    * hex digits — one per bit). Deterministic and reproducible in SQL
    * (no bit intrinsics needed).
    */
  def simhash32(toksCol: String): Column =
    (1 to 32).map { j =>
      expr(s"""CASE WHEN 2 * size(filter($toksCol, t -> substring(md5(t), $j, 1) >= '8'))
                        > size($toksCol)
               THEN ${1L << (j - 1)}L ELSE 0L END""")
    }.reduce(_ + _)

  /** Stopword lists for the n-gram language-ID heuristic. Tiny on purpose:
    * they must be identically embedded in the oracle SQL.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "is", "in", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "zh" -> Seq("de", "shi", "zai", "le", "wo", "you", "he", "ren"))

  /** Language order used for deterministic argmax tie-breaking. */
  val langOrder: Seq[String] = Seq("en", "es", "de", "fr", "zh")

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString(", ")

  /** Count of tokens present in `words`. */
  def stopwordHits(toksCol: String, words: Seq[String]): Column =
    expr(s"size(filter($toksCol, t -> t IN (${inList(words)})))")

  /** The same expression as DuckDB SQL text (for oracle construction). */
  def stopwordHitsSql(toksCol: String, words: Seq[String]): String =
    s"len(list_filter($toksCol, t -> t IN (${inList(words)})))"

  /** English-ish stopword ratio used by the quality score. */
  val qualityStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "is", "in", "for", "on", "with")

  /** Canonical fingerprint: md5 of whitespace-normalized lowercase text. */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** Harman's S-stemmer (1991) as a CASE expression over a word column:
    * three first-match-wins suffix rules (ies→y, es→e, s→∅, each with
    * its exception list). Built from substring/length/concat/IN only,
    * which behave identically in Spark SQL and DuckDB — the SAME text
    * is spliced into both the query and its oracle, so the stemmer
    * cannot drift between engines.
    */
  def sStemCaseSql(w: String): String = s"""
    CASE
      WHEN length($w) >= 4 AND substring($w, length($w)-2, 3) = 'ies'
           AND substring($w, length($w)-3, 4) NOT IN ('eies', 'aies')
        THEN concat(substring($w, 1, length($w)-3), 'y')
      WHEN length($w) >= 3 AND substring($w, length($w)-1, 2) = 'es'
           AND substring($w, length($w)-2, 3) NOT IN ('aes', 'ees', 'oes')
        THEN substring($w, 1, length($w)-1)
      WHEN length($w) >= 3 AND substring($w, length($w), 1) = 's'
           AND substring($w, length($w)-1, 2) NOT IN ('us', 'ss')
        THEN substring($w, 1, length($w)-1)
      ELSE $w
    END"""

  /** Eager localCheckpoint that RELEASES the previous round's
    * checkpointed blocks (ADVICE r11: the trainer loops chained one
    * localCheckpoint per merge round and never freed the superseded
    * ones — on a long training run that accumulates one corpus-sized
    * block set per round until the ContextCleaner's GC happens to
    * run). This round's block ids are read DIRECTLY off the returned
    * plan — `localCheckpoint` yields a Dataset backed by a
    * [[org.apache.spark.sql.execution.LogicalRDD]] wrapping exactly
    * the persisted RDD — so ownership is structural, not inferred:
    * the earlier before/after keyset diff could claim a CONCURRENT
    * query's cache/checkpoint landing in the same window and later
    * unpersist it (ADVICE r12/r13); plan extraction cannot, so no
    * cross-call lock is needed. Returns (checkpointed df, its block
    * ids — empty only if Spark ever stops planning checkpoints as
    * LogicalRDD, in which case blocks fall back to ContextCleaner GC).
    */
  private def checkpointSwap(df: DataFrame,
      prevIds: Set[Int]): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val out = df.localCheckpoint() // eager: materialized before release
    val mine = out.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.toSet
    prevIds.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    (out, mine)
  }

  /** BPE tokenizer TRAINING (Sennrich et al. 2016): learn `nMerges`
    * byte-pair merges from the corpus, with the two scale contracts a
    * 100 TB pipeline needs made EXPLICIT in the signature:
    *
    *  - `maxTokens` — the training-sample bound. BPE training is
    *    conventionally run on a bounded sample (the merge table
    *    converges long before corpus scale); when the corpus exceeds
    *    the bound, documents are kept by a deterministic hash-mod
    *    filter sized so the sampled token count lands near `maxTokens`.
    *    Document-level sampling preserves the pair-frequency
    *    distribution in expectation, and hash(text) sampling is
    *    reproducible — two runs train the identical table.
    *  - `batchSize` — merges learned per distributed round. The classic
    *    algorithm is strictly sequential (one top-1 pass per merge, so
    *    nMerges driver-coordinated jobs); this implementation accepts up
    *    to `batchSize` merges from ONE pair-count pass whenever doing so
    *    is provably equivalent to running them sequentially, cutting the
    *    round count ~batchSize× on corpora with many independent
    *    high-frequency pairs.
    *
    * Batch-equivalence rule (scan the EXACT global top-K prefix,
    * `(count desc, left asc, right asc)`-ordered, accepting a prefix
    * subset): two pairs INTERACT iff one's right symbol equals the
    * other's left — the only way their occurrences can overlap in a
    * symbol sequence, and therefore the only way applying one can change
    * the other's count or spawn a new pair whose count exceeds theirs
    * (a new pair (x, ab) arises only from an (x, a) occurrence, so its
    * count is bounded by the interacting pair (x, a)'s). Scanning in
    * global order: accept a non-interacting pair while its count
    * strictly exceeds every interacting pair's count seen so far AND
    * strictly exceeds the NEXT scanned row's count; stop at the first
    * candidate that fails either bound. The strict-decrease condition is
    * what makes ties safe: a merge-spawned pair (A||B, y) is bounded by
    * its source (B, y)'s count, and on an exact tie the new pair's
    * concatenated left symbol can sort lexicographically BEFORE a later
    * candidate while the source sorts AFTER it — the source would never
    * be seen as interacting before that candidate's acceptance. Requiring
    * each accepted count to strictly exceed the next row's means every
    * equal-count row precedes the acceptance point and has already been
    * scanned (accepted, interacting-marked, or batch-closing), so no
    * unseen or spawned pair can tie with an accepted candidate. The last
    * row of the top-K has no visible successor (pairs beyond the prefix
    * are bounded by its count, ties included), so it closes the batch
    * too — accepted alone only when it heads the round (a single-merge
    * round is always exact). Counts of already-applied-round survivors
    * only decrease, so the accepted prefix replayed sequentially picks
    * the same merges in the same order.
    *
    * One further hazard: a merge OUTPUT string can collide with a symbol
    * that already exists (learn ("ab","c") and ("a","b") when "ab" was
    * merged in an earlier round — on "a b c" a one-pass fold would chain
    * to "abc" where sequential passes stop at "ab","c", and applying
    * ("a","b") can INCREASE other pairs' "ab"-counts). The driver knows
    * the complete symbol space exactly — initial characters (collected
    * once) plus every merge output — so any candidate whose output is
    * already a known symbol CLOSES the batch: accepted alone if it heads
    * the round (a single-merge fold is always exact), deferred to the
    * next round otherwise. Within a batch all outputs are therefore
    * fresh symbols, no count can increase, and the fold is equivalent to
    * applying the accepted merges as separate sequential passes. The
    * head of each round is always accepted, so progress is guaranteed
    * and a maximally-interacting corpus degrades to the sequential
    * algorithm — never to a different answer.
    *
    * Each round is ONE distributed pass: adjacent-pair counts partially
    * aggregated on 2-symbol keys, the exact top-K pulled to the driver
    * (TakeOrderedAndProject — K rows, not the distribution), then a
    * map-only greedy left-to-right fold applies the whole accepted batch
    * (a merged symbol differs from its left part, so it cannot
    * chain-merge within the round — BPE's contract). Rounds are
    * `localCheckpoint`ed so lineage stays flat (reliable `checkpoint()`
    * on a real cluster, as in clusterLabels). Returns `(left, right,
    * count)` per learned merge in sequential-equivalent order.
    *
    * Learned symbols are spliced into SQL lambdas as string literals,
    * so both backslashes and single quotes are escaped first — Spark's
    * SQL parser processes backslash escapes inside literals, and an
    * unescaped `\` in a corpus token would swallow the closing quote
    * (corrupted merges or an AnalysisException).
    */
  def bpeTrain(docs: DataFrame, textCol: String, nMerges: Int,
      batchSize: Int = 16,
      maxTokens: Long = 4000000L): Seq[(String, String, Long)] =
    bpeTrainWithStats(docs, textCol, nMerges, batchSize, maxTokens)._1

  /** [[bpeTrain]] plus the number of distributed rounds actually used —
    * the quantity the batch acceptance rule exists to shrink (rounds ==
    * nMerges is the sequential worst case; independent-pair corpora get
    * rounds ≈ nMerges / batchSize).
    */
  def bpeTrainWithStats(docs: DataFrame, textCol: String, nMerges: Int,
      batchSize: Int = 16, maxTokens: Long = 4000000L)
      : (Seq[(String, String, Long)], Int) =
    bpeTrainCore(docs, textCol, nMerges, batchSize, maxTokens,
      prepExpr = "t",
      symsExpr = "transform(sequence(1, length(h)), i -> substring(h, i, 1))")

  /** [[bpeTrain]] over the BYTE alphabet (the GPT-2/LLaMA byte-level
    * form): base symbols are the token's UTF-8 BYTES, each represented
    * as its 2-hex-char string ("61" for 'a', "C3"+"A9" for 'é') rather
    * than GPT-2's remapped printable alphabet — hex pairs are
    * engine-portable (Spark hex(encode(t,'UTF-8')) == DuckDB
    * hex(encode(t)), both uppercase) and concatenation-safe (a merged
    * symbol is exactly its bytes' hex, so decode is unhex of the
    * symbol concat). No UNK exists by construction: every possible
    * byte is a base symbol, so any UTF-8 string encodes losslessly —
    * the round-trip property OperatorSpec proves on arbitrary-unicode
    * inputs. The merge loop (batching, collision discipline, sampling,
    * checkpoint release) is [[bpeTrainWithStats]]'s verbatim — only
    * the initializer differs.
    */
  def byteBpeTrainWithStats(docs: DataFrame, textCol: String, nMerges: Int,
      batchSize: Int = 16, maxTokens: Long = 4000000L)
      : (Seq[(String, String, Long)], Int) =
    bpeTrainCore(docs, textCol, nMerges, batchSize, maxTokens,
      prepExpr = "hex(encode(t, 'UTF-8'))",
      symsExpr =
        "transform(sequence(1, length(h) div 2), i -> substring(h, 2*i - 1, 2))")

  def byteBpeTrain(docs: DataFrame, textCol: String, nMerges: Int,
      batchSize: Int = 16,
      maxTokens: Long = 4000000L): Seq[(String, String, Long)] =
    byteBpeTrainWithStats(docs, textCol, nMerges, batchSize, maxTokens)._1

  /** The shared merge loop: `prepExpr` (over token column `t`) binds the
    * per-token string ONCE (identity for char-level, the hex encoding
    * for byte-level — inlining it in the lambda would recompute it per
    * symbol), `symsExpr` (over the bound column `h`) produces the base
    * symbol array.
    */
  private def bpeTrainCore(docs: DataFrame, textCol: String, nMerges: Int,
      batchSize: Int, maxTokens: Long, prepExpr: String, symsExpr: String)
      : (Seq[(String, String, Long)], Int) = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    val total = docs
      .agg(coalesce(sum(size(tokens(col(textCol)))), lit(0L))).head.getLong(0)
    val sampled =
      if (total <= maxTokens) docs
      else {
        val q = math.ceil(total.toDouble / maxTokens).toLong
        docs.filter(pmod(xxhash64(col(textCol)), lit(q)) === 0)
      }
    var (repr, reprIds) = checkpointSwap(sampled
      .select(explode(tokens(col(textCol))).as("t"))
      .filter(col("t").isNotNull && length(col("t")) >= 1)
      .select(expr(prepExpr).as("h"))
      .select(expr(symsExpr).as("syms")), Set.empty)
    // the exact symbol space: initial characters + every merge output.
    // One alphabet-sized job; keeps the output-collision test exact.
    val vocab = scala.collection.mutable.Set[String]()
    vocab ++= repr.select(explode(col("syms")).as("c")).distinct()
      .collect().map(_.getString(0))
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    var rounds = 0
    while (merges.size < nMerges) {
      val want = nMerges - merges.size
      val topK = math.max(4 * math.min(batchSize, want), 64)
      val top = repr.select(explode_outer(expr(
        """CASE WHEN size(syms) >= 2
             THEN transform(sequence(1, size(syms) - 1),
               i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))
             ELSE CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>) END"""))
        .as("p"))
        .filter(col("p").isNotNull)
        .groupBy(col("p.a"), col("p.b")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(topK).collect()
      if (top.isEmpty) return (merges.toSeq, rounds)
      rounds += 1
      val accepted = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
      var maxInteract = 0L
      var i = 0
      var done = false
      while (i < top.length && !done && accepted.size < math.min(batchSize, want)) {
        val row = top(i)
        val (a, b, n) = (row.getString(0), row.getString(1), row.getLong(2))
        // strict-decrease bound (see scaladoc): acceptance needs the next
        // scanned row's count strictly below this one's; the top-K's last
        // row has no visible successor, so it can never extend a batch
        // (unseen pairs beyond the prefix are bounded by — and can tie
        // with — its count)
        val strictlyAboveNext =
          i + 1 < top.length && n > top(i + 1).getLong(2)
        if (accepted.nonEmpty && n <= maxInteract) done = true
        else if (accepted.exists { case (c, d, _) => d == a || b == c })
          maxInteract = math.max(maxInteract, n)
        else if (vocab.contains(a + b) || !strictlyAboveNext) {
          // output collides with an existing symbol, or a count tie could
          // hide a merge-spawned pair sorting ahead of a later candidate:
          // exact only as a single-merge round — accept alone at the
          // head, else defer to the next round
          if (accepted.isEmpty) accepted += ((a, b, n))
          done = true
        } else {
          accepted += ((a, b, n))
          vocab += a + b
        }
        i += 1
      }
      merges ++= accepted
      // a head-accepted colliding output joins the vocabulary too
      vocab ++= accepted.map { case (a, b, _) => a + b }
      // one map-only pass applies the whole batch: the merged symbol is
      // always left||right, so the rewrite needs only membership in the
      // accepted pair set (k ≤ batchSize struct equalities per symbol)
      val pairArr = accepted
        .map { case (a, b, _) =>
          s"struct('${esc(a)}' AS l, '${esc(b)}' AS r)" }
        .mkString("array(", ", ", ")")
      val (r2, ids2) = checkpointSwap(repr.withColumn("syms", expr(
        s"""aggregate(syms, CAST(array() AS ARRAY<STRING>),
              (acc, x) -> CASE
                WHEN size(acc) > 0 AND exists($pairArr,
                    m -> m.l = element_at(acc, -1) AND m.r = x)
                  THEN concat(slice(acc, 1, size(acc) - 1),
                              array(concat(element_at(acc, -1), x)))
                ELSE concat(acc, array(x)) END)""")), reprIds)
      repr = r2; reprIds = ids2
    }
    (merges.toSeq, rounds)
  }

  /** WordPiece trainer (Schuster & Nakajima 2012 — the BERT vocabulary
    * builder; completes the third tokenizer family next to t31's greedy
    * encoder): the BPE merge loop with the LIKELIHOOD objective — each
    * round merges the adjacent symbol pair maximizing
    * count(ab) / (count(a)·count(b)), the pair whose fusion most
    * increases unigram-LM corpus likelihood, where BPE takes raw
    * count(ab) (the OperatorSpec fixture makes the two argmaxes
    * differ). Word-initial and continuation symbols live in disjoint
    * namespaces ('x' vs '##x' — the family signature t31 encodes
    * with), and a merge strips the right side's '##'. One merge per
    * round — likelihood scores interact, so batching is not exact.
    *
    * The argmax is DISTRIBUTED and still EXACT (ADVICE r11 replaced
    * the collect-both-tables driver scan): pair counts join the
    * symbol-count table (broadcast — alphabet-sized), every candidate
    * gets the integer key ⌊n_ab·10¹² / (n_a·n_b)⌋ via DECIMAL(38,0)
    * `div` (floor is monotone, so every true argmax shares the MAX
    * key), and only the max-key TIES are collected — typically one
    * row, never the distribution — for the exact BigInt
    * cross-multiplication verdict, ties to the lexicographically
    * smaller pair. 10¹² of quotient resolution makes key ties
    * essentially exact-score ties; a >10⁴-way tie aborts loudly
    * rather than risk a silent truncation. Pairs below `minCount` and
    * pairs whose merged name would collide with an existing symbol
    * are not candidates (the bpeTrain collision discipline; the vocab
    * is driver-held — alphabet + one entry per merge — and broadcast
    * as an anti-join side). Superseded per-round checkpoints are
    * released via [[checkpointSwap]]. Returns (left, right,
    * pairCount, mergedSymbol) in merge order.
    */
  def wordpieceTrain(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): Seq[(String, String, Long, String)] = {
    require(nMerges >= 0 && minCount >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    def stripHash(s: String) = if (s.startsWith("##")) s.substring(2) else s
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    var (repr, reprIds) = checkpointSwap(docs
      .select(explode(tokens(col(textCol))).as("t"))
      .filter(col("t").isNotNull && length(col("t")) >= 1)
      .select(expr(
        """transform(sequence(1, length(t)), i ->
             CASE WHEN i = 1 THEN substring(t, i, 1)
                  ELSE concat('##', substring(t, i, 1)) END)""").as("syms")),
      Set.empty)
    val vocab = scala.collection.mutable.Set[String]()
    vocab ++= repr.select(explode(col("syms")).as("c")).distinct()
      .collect().map(_.getString(0))
    val merges =
      scala.collection.mutable.ArrayBuffer[(String, String, Long, String)]()
    var round = 0
    while (round < nMerges) {
      round += 1
      val syms = repr.select(explode(col("syms")).as("s"))
        .groupBy(col("s")).agg(count(lit(1)).as("n"))
      val cand = repr.select(explode_outer(expr(
        """CASE WHEN size(syms) >= 2
             THEN transform(sequence(1, size(syms) - 1),
               i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))
             ELSE CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>) END"""))
        .as("p"))
        .filter(col("p").isNotNull)
        .groupBy(col("p.a"), col("p.b")).agg(count(lit(1)).as("nab"))
        .filter(col("nab") >= minCount)
        // collision exclusion: merged name already a known symbol
        .withColumn("merged", expr(
          """concat(a, CASE WHEN substring(b, 1, 2) = '##'
                            THEN substring(b, 3) ELSE b END)"""))
        .join(broadcast(vocab.toSeq.toDF("v")),
          col("merged") === col("v"), "left_anti")
        .join(broadcast(syms.select(col("s").as("a"), col("n").as("na"))), "a")
        .join(broadcast(syms.select(col("s").as("b"), col("n").as("nb"))), "b")
        // monotone integer prefilter key: floor(nab·10^12 / (na·nb));
        // DECIMAL(38,0) headroom needs nab·10^12 < 10^38 ⇒ fine to
        // 10^26 pair occurrences
        .withColumn("score_hi", expr(
          """CAST(CAST(nab AS DECIMAL(38,0)) * 1000000000000
               div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"""))
      val mx = cand.agg(max(col("score_hi"))).head()
      if (mx.isNullAt(0)) return merges.toSeq
      val ties = cand.filter(col("score_hi") === mx.getLong(0))
        .select(col("a"), col("b"), col("nab"), col("na"), col("nb"))
        .limit(10001)
        .as[(String, String, Long, Long, Long)].collect()
      require(ties.length <= 10000,
        s"wordpieceTrain: >10000 argmax-key ties in round $round")
      var best: (String, String, Long, Long, Long) = null
      ties.foreach { case t @ (a, b, nab, na, nb) =>
        if (best == null) best = t
        else {
          val (ba, bb, bn, bna, bnb) = best
          // nab/(na·nb) vs bn/(bna·bnb) by exact cross-multiplication
          val l = BigInt(nab) * bna * bnb
          val rr = BigInt(bn) * na * nb
          if (l > rr || (l == rr &&
              (a < ba || (a == ba && b < bb)))) best = t
        }
      }
      val (a, b, nab, _, _) = best
      val merged = a + stripHash(b)
      vocab += merged
      merges += ((a, b, nab, merged))
      val (r2, ids2) = checkpointSwap(repr.withColumn("syms", expr(
        s"""aggregate(syms, CAST(array() AS ARRAY<STRING>),
              (acc, x) -> CASE
                WHEN size(acc) > 0 AND element_at(acc, -1) = '${esc(a)}'
                     AND x = '${esc(b)}'
                  THEN concat(slice(acc, 1, size(acc) - 1),
                              array('${esc(merged)}'))
                ELSE concat(acc, array(x)) END)""")), reprIds)
      repr = r2; reprIds = ids2
    }
    merges.toSeq
  }

  /** The t33 linear-score template over integer micro-weights:
    * z = Σ_j w_j·f_j / 10⁶, written as ONE dialect-neutral SQL string
    * (the q88 welch discipline — not "the same algorithm", the same
    * expression tree, so both engines run the identical IEEE op
    * sequence). `wRefs` are spliced as integer literals on the Spark
    * side and as the epoch-CTE's column names in the DuckDB oracle —
    * numerically identical inputs through identical ops.
    */
  def zMicroSql(wRefs: Seq[String], fRefs: Seq[String]): String = {
    require(wRefs.length == fRefs.length && wRefs.nonEmpty)
    "(" + wRefs.zip(fRefs)
      .map { case (w, f) => s"CAST($w AS DOUBLE) * $f" }
      .mkString(" + ") + ") / 1000000.0"
  }

  /** Algebraic sigmoid σ̃(z) = 0.5 + z/(2·(1+|z|)) — the fast-sigmoid
    * family (Elliott 1993): same shape, range and monotonicity as the
    * logistic link but built from add/div/abs ONLY, all correctly
    * rounded under IEEE 754, where exp() is libm-dependent and would
    * diverge between the JVM and DuckDB's C runtime (the t16 "no
    * transcendentals" rule applied to training).
    */
  def fastSigmoidSql(z: String): String =
    s"(0.5 + ($z) / (2.0 * (1.0 + abs($z))))"

  /** One row's gradient contribution for feature `f`: ⌊(p−y)·f·10⁶⌋ as
    * BIGINT — floored to an exact integer so the epoch's gradient SUM
    * is order-independent (partial aggregation cannot move it) and
    * engine-exact.
    */
  def gradTermSql(p: String, f: String): String =
    s"CAST(floor((($p) - y) * $f * 1000000.0) AS BIGINT)"

  /** Full-batch logistic-regression TRAINING with the algebraic
    * sigmoid link, driver-coordinated like [[bpeTrain]]: `feats` has
    * DOUBLE feature columns f0..f{nFeats-1} and a DOUBLE label y in
    * {0,1}. Each epoch is ONE distributed aggregate — per-row gradient
    * terms floored to exact integers ([[gradTermSql]]) and summed
    * map-side — and the weight update runs on the driver in exact
    * integer arithmetic: w_j −= (lrNum·G_j) / n with TRUNCATING
    * division (Scala Long `/` ≡ DuckDB `//` ≡ Spark `div`, all
    * toward-zero), so an oracle can replay the epochs as unrolled
    * CTEs and land on the SAME weights bit for bit. The driver holds
    * only the weight vector between rounds; at 100 TB each epoch is
    * one partial-aggregated pass over the corpus — the sufficient
    * statistic is nFeats BIGINTs.
    */
  def logisticTrainMicro(feats: DataFrame, nFeats: Int, epochs: Int,
      lrNum: Long = 4L): Array[Long] = {
    require(nFeats >= 1 && epochs >= 0 && lrNum >= 1)
    val n = feats.count()
    require(n > 0, "empty training set")
    val w = Array.fill(nFeats)(0L)
    // Same single-job epoch shape as [[linearTrainMicroK]] (see the
    // rationale there): each epoch is one treeAggregate over a pinned
    // primitive matrix running the IDENTICAL IEEE-754 op sequence the
    // SQL epoch stated —
    //   z = (Σ_j CAST(w_j AS DOUBLE)·f_j) / 1e6        (left-assoc, j asc)
    //   p = 0.5 + z / (2.0 · (1.0 + abs(z)))           (fastSigmoidSql)
    //   G_j = Σ_rows floor(((p − y)·f_j)·1e6)          (toward-zero Long)
    // — bit-identical gradients and weights vs the oracle's epochSqlCtes
    // replay, without the per-epoch Catalyst plan/codegen/AQE job waves.
    val cols = (0 until nFeats).map(j => col(s"f$j").cast("double")) :+
      col("y").cast("double")
    val data = feats.select(cols: _*).rdd.map { r =>
      val a = new Array[Double](nFeats + 1)
      var i = 0
      while (i < a.length) { a(i) = r.getDouble(i); i += 1 }
      a
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 1 to epochs) {
        val wCur = w.clone()
        val g = data.treeAggregate(new Array[Long](nFeats))(
          seqOp = (acc, row) => {
            var z = 0.0
            var j = 0
            while (j < nFeats) { z += wCur(j).toDouble * row(j); j += 1 }
            z /= 1000000.0
            val p = 0.5 + z / (2.0 * (1.0 + math.abs(z)))
            val d = p - row(nFeats)
            j = 0
            while (j < nFeats) {
              acc(j) += math.floor(d * row(j) * 1000000.0).toLong
              j += 1
            }
            acc
          },
          combOp = (a, b) => {
            var i = 0
            while (i < a.length) { a(i) += b(i); i += 1 }
            a
          })
        for (j <- 0 until nFeats) w(j) -= (lrNum * g(j)) / n
      }
      w
    } finally data.unpersist(blocking = false)
  }

  /** Multi-output LINEAR projector training (m27) — the
    * [[logisticTrainMicro]] epoch pattern with an IDENTITY link and k
    * outputs: `feats` has DOUBLE features f0..f{nFeats-1} and DOUBLE
    * targets y0..y{nOut-1}; each epoch is ONE distributed aggregate of
    * nFeats·nOut floored integer gradient terms
    * G_kj = Σ floor((z_k − y_k)·f_j·10⁶) (z_k through [[zMicroSql]]'s
    * op sequence — add/mul/div only, no transcendentals, so both
    * engines run identical IEEE ops), then exact truncating-division
    * weight updates on the driver: w_kj −= (lrNum·G_kj)/(n·lrDen) —
    * the rational learning rate lrNum/lrDen lets the step sit under
    * the Gram spectral bound while staying exact-integer. The driver
    * holds nOut·nFeats BIGINTs between rounds; at 100 TB each epoch is
    * one partial-aggregated pass. Oracle replay: [[projEpochSqlCtes]].
    */
  def linearTrainMicroK(feats: DataFrame, nFeats: Int, nOut: Int,
      epochs: Int, lrNum: Long = 1L, lrDen: Long = 1L)
      : Array[Array[Long]] = {
    require(nFeats >= 1 && nOut >= 1 && epochs >= 0 && lrNum >= 1 &&
      lrDen >= 1)
    val n = feats.count()
    require(n > 0, "empty training set")
    val w = Array.fill(nOut, nFeats)(0L)
    // Each epoch is ONE job over a pinned primitive feature matrix.
    // A previous revision ran every epoch as a Catalyst aggregate of
    // nOut·nFeats sum() columns over (feats × broadcast weight row) —
    // correct, but the epoch's cost was pure coordination: per epoch,
    // AQE split the two-stage aggregate into 2-3 driver-sequenced jobs
    // and re-broadcast a multi-MB whole-stage-codegen task binary
    // (272 aggregate buffers), measured ~1.3 s/epoch at sf0.1 against
    // ~30 ms of actual arithmetic (guide §1.2/§5: fix the biggest term
    // — here the 12 sequential barriers' per-barrier overhead, not the
    // math). The gradient is a plain commutative Long sum, so a
    // treeAggregate over a once-projected Array[Double] matrix runs
    // the SAME IEEE-754 op sequence the SQL expressions state —
    //   z_k  = (Σ_j CAST(w_kj AS DOUBLE) · f_j) / 1e6   (left-assoc, j asc)
    //   G_kj = Σ_rows floor(((z_k − y_k) · f_j) · 1e6)  (toward-zero Long)
    // — so every gradient, and therefore every weight, is bit-identical
    // to the oracle's projEpochSqlCtes replay; only the scheduler work
    // is gone (one ~40 ms job per epoch, no per-epoch plan or codegen).
    val cols = (0 until nFeats).map(j => col(s"f$j").cast("double")) ++
      (0 until nOut).map(k => col(s"y$k").cast("double"))
    val data = feats.select(cols: _*).rdd.map { r =>
      val a = new Array[Double](nFeats + nOut)
      var i = 0
      while (i < a.length) { a(i) = r.getDouble(i); i += 1 }
      a
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 1 to epochs) {
        val wFlat = w.flatten // immutable snapshot shipped in the closure
        val g = data.treeAggregate(new Array[Long](nOut * nFeats))(
          seqOp = (acc, row) => {
            var k = 0
            while (k < nOut) {
              // z_k exactly as zMicroSql: ((w0·f0 + w1·f1) + …) / 1e6
              var z = 0.0
              var j = 0
              while (j < nFeats) {
                z += wFlat(k * nFeats + j).toDouble * row(j)
                j += 1
              }
              z /= 1000000.0
              val d = z - row(nFeats + k) // z_k − y_k
              j = 0
              while (j < nFeats) {
                // CAST(floor(((z−y) · f) · 1e6) AS BIGINT)
                acc(k * nFeats + j) +=
                  math.floor(d * row(j) * 1000000.0).toLong
                j += 1
              }
              k += 1
            }
            acc
          },
          combOp = (a, b) => {
            var i = 0
            while (i < a.length) { a(i) += b(i); i += 1 }
            a
          })
        var i = 0
        for (k <- 0 until nOut; j <- 0 until nFeats) {
          w(k)(j) -= (lrNum * g(i)) / (n * lrDen)
          i += 1
        }
      }
      w
    } finally data.unpersist(blocking = false)
  }

  /** The unrolled-epoch CTE chain replaying [[linearTrainMicroK]] in
    * DuckDB: `pe0` (zero weights, columns w{k}_{j}) through
    * `pe$epochs`; each epoch is a row-level projection CTE (`pp$e`,
    * feats × previous weights → z0..z{nOut-1}), one gradient CTE
    * (`pg$e`), and the truncating-division update against `cnt(n)`.
    * `feats` must expose DOUBLE f0..f{nFeats-1} and y0..y{nOut-1}.
    */
  def projEpochSqlCtes(nFeats: Int, nOut: Int, epochs: Int,
      lrNum: Long = 1L, lrDen: Long = 1L): String = {
    val fRefs = (0 until nFeats).map(j => s"f$j")
    val pairs = for (k <- 0 until nOut; j <- 0 until nFeats) yield (k, j)
    val chain = (1 to epochs).map { e =>
      val prev = s"pe${e - 1}"
      val zs = (0 until nOut).map(k =>
        s"(${zMicroSql((0 until nFeats).map(j => s"$prev.w${k}_$j"), fRefs)}) AS z$k")
        .mkString(",\n               ")
      val gs = pairs.map { case (k, j) =>
        s"CAST(SUM(CAST(floor((z$k - y$k) * f$j * 1000000.0) AS BIGINT)) AS BIGINT) AS g${k}_$j"
      }.mkString(",\n               ")
      val ws = pairs.map { case (k, j) =>
        s"CAST($prev.w${k}_$j - (($lrNum * pg$e.g${k}_$j) // (cnt.n * $lrDen)) AS BIGINT) AS w${k}_$j"
      }.mkString(", ")
      // every CTE MATERIALIZED (the s41/s19 inlining lesson): pe$e is
      // referenced nFeats·nOut times by the next epoch's projection —
      // plain-CTE inlining would grow the plan exponentially in epochs
      s"""pp$e AS MATERIALIZED (SELECT feats.*, $zs FROM feats CROSS JOIN $prev),
        pg$e AS MATERIALIZED (SELECT $gs FROM pp$e),
        pe$e AS MATERIALIZED (SELECT $ws FROM $prev CROSS JOIN pg$e CROSS JOIN cnt)"""
    }.mkString(",\n        ")
    s"""pe0 AS (SELECT ${pairs.map { case (k, j) =>
      s"CAST(0 AS BIGINT) AS w${k}_$j" }.mkString(", ")}),
        $chain"""
  }

  /** The unrolled-epoch CTE chain replaying [[logisticTrainMicro]] in
    * DuckDB: `e0` (zero weights) through `e$epochs`, each epoch one
    * gradient CTE over `feats` (must expose DOUBLE f0..f{nFeats-1} and
    * y) and one truncating-division weight update against `cnt(n)`.
    * Returns the CTE text WITHOUT a leading comma. Shared by the t33
    * and m25 oracles — any trained-in-engine model replays its epochs
    * through this one generator.
    */
  def epochSqlCtes(nFeats: Int, epochs: Int, lrNum: Long = 4L): String = {
    val fRefs = (0 until nFeats).map(j => s"f$j")
    def gradSelect(prev: String): String = {
      val p = fastSigmoidSql(
        zMicroSql(fRefs.indices.map(j => s"$prev.w$j"), fRefs))
      fRefs.indices.map(j =>
        s"CAST(SUM(${gradTermSql(p, s"f$j")}) AS BIGINT) AS g$j")
        .mkString(",\n               ")
    }
    val chain = (1 to epochs).map { k =>
      val prev = s"e${k - 1}"
      s"""g$k AS (SELECT ${gradSelect(prev)}
           FROM feats CROSS JOIN $prev),
        e$k AS (SELECT ${fRefs.indices.map(j =>
          s"CAST($prev.w$j - (($lrNum * g$k.g$j) // cnt.n) AS BIGINT) AS w$j")
          .mkString(", ")}
           FROM $prev CROSS JOIN g$k CROSS JOIN cnt)"""
    }.mkString(",\n        ")
    s"""e0 AS (SELECT ${fRefs.indices.map(j =>
        s"CAST(0 AS BIGINT) AS w$j").mkString(", ")}),
        $chain"""
  }

  /** Viterbi segmentation of one word under a unigram piece model:
    * the segmentation maximizing Π p(piece), pieces limited to
    * `maxPieceLen` characters, ties broken toward the SHORTER piece
    * ending at each position (a longer candidate must be strictly
    * better) — the same deterministic tie rule t30's in-row SQL fold
    * uses. Pieces absent from the model score 0 (never chosen while
    * any covered path exists); single characters should be in the
    * model for total coverage. Returns Nil when no segmentation covers
    * the word.
    */
  def viterbiSegment(word: String, p: Map[String, Double],
      maxPieceLen: Int = 4): Seq[String] = {
    val n = word.length
    if (n == 0) return Nil
    val best = Array.fill(n + 1)(-1.0)
    val back = new Array[Int](n + 1) // piece length chosen at position i
    best(0) = 1.0
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= math.min(maxPieceLen, i)) {
        if (best(i - j) > 0.0) {
          val piece = word.substring(i - j, i)
          val v = p.get(piece).map(best(i - j) * _).getOrElse(-1.0)
          if (v > best(i)) { best(i) = v; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    if (best(n) <= 0.0) return Nil
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var at = n
    while (at > 0) { out += word.substring(at - back(at), at); at -= back(at) }
    out.reverse.toSeq
  }

  /** SentencePiece-style unigram-LM tokenizer training (Kudo 2018),
    * driver-coordinated like [[bpeTrain]]: the corpus-sized work — the
    * word-frequency table, the substring seed counts, and every
    * E-step's Viterbi re-segmentation — runs DISTRIBUTED (the vocabulary
    * broadcasts to the segmenters, piece counts reduce map-side); the
    * driver holds only vocabulary-sized tables between rounds. The
    * word-frequency table is the standard sufficient statistic: at
    * 100 TB the corpus collapses to |distinct words| rows in one
    * partial-aggregated shuffle and EM never touches the raw text
    * again.
    *
    * This is hard-EM (Viterbi counts), the documented SentencePiece
    * variant: E-step segments each word under the current model and
    * counts chosen pieces weighted by word frequency; M-step
    * renormalizes counts into probabilities. After `nIters` rounds the
    * vocabulary is pruned to the `vocabSize` most probable pieces,
    * with every single character retained unconditionally so encode
    * coverage is total (SentencePiece's required-character rule).
    * Fully deterministic: all ties in seeding and pruning break on
    * (count desc, piece asc).
    */
  def unigramTrain(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 4, nIters: Int = 3, seedSize: Int = 200)
      : Seq[(String, Double)] = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && nIters >= 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .localCheckpoint()
    // seed: every substring up to maxPieceLen, weighted by word
    // frequency; top seedSize by (weight desc, piece asc) + all chars
    val subCounts = words.toDF("w", "cnt")
      .select(explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
              i -> transform(sequence(1, least($maxPieceLen, length(w) - i + 1)),
                j -> substring(w, i, j))))""")).as("piece"), col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("n"))
    val chars = subCounts.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect()
    val seed = subCounts
      .orderBy(col("n").desc, col("piece").asc).limit(seedSize)
      .as[(String, Long)].collect()
    var counts: Map[String, Long] = (seed ++ chars).toMap
    var it = 0
    while (it < nIters) {
      val total = counts.values.sum.toDouble
      val probs = counts.map { case (k, v) => k -> v / total }
      val bc = spark.sparkContext.broadcast(probs)
      counts = words.mapPartitions(_.flatMap { case (w, cnt) =>
          viterbiSegment(w, bc.value, maxPieceLen).map(piece => (piece, cnt))
        })
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .collect().map { case (k, v) => k -> v }.toMap
      // required characters survive even if no Viterbi path chose them
      counts = counts ++ chars.collect {
        case (c, _) if !counts.contains(c) => c -> 1L
      }
      it += 1
    }
    val kept = counts.toSeq
      .sortBy { case (p, n) => (-n, p) }
      .take(vocabSize)
    val withChars = (kept ++ counts.toSeq.filter(_._1.length == 1)).distinct
    val total = withChars.map(_._2).sum.toDouble
    withChars.map { case (p, n) => p -> n / total }
      .sortBy { case (p, prob) => (-prob, p) }
  }
}
