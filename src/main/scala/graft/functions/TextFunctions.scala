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

  /** BPE tokenizer TRAINING (Sennrich et al. 2016): learn `nMerges`
    * byte-pair merges from the corpus. The classic driver-coordinated
    * iterative shape (same family as the k-means and connected-components
    * loops): each round is ONE distributed pass — adjacent-pair counts
    * partially aggregated on 2-symbol keys, a top-1 argmax pulled to the
    * driver (ties broken (count desc, left asc, right asc) so training
    * is deterministic), then a map-only greedy left-to-right merge fold
    * over every token's symbol array. Rounds are `localCheckpoint`ed so
    * lineage stays flat across merges (reliable `checkpoint()` on a real
    * cluster, as in clusterLabels). Returns `(left, right, count)` per
    * learned merge, most-frequent first — the merge table a tokenizer
    * ships with.
    *
    * Learned symbols are spliced into SQL lambdas as string literals,
    * so both backslashes and single quotes are escaped first — Spark's
    * SQL parser processes backslash escapes inside literals, and an
    * unescaped `\` in a corpus token would swallow the closing quote
    * (corrupted merges or an AnalysisException).
    */
  def bpeTrain(docs: DataFrame, textCol: String,
      nMerges: Int): Seq[(String, String, Long)] = {
    var repr = docs
      .select(explode(tokens(col(textCol))).as("t"))
      .filter(col("t").isNotNull && length(col("t")) >= 1)
      .select(expr("transform(sequence(1, length(t)), i -> substring(t, i, 1))")
        .as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var round = 0
    while (round < nMerges) {
      val top = repr.select(explode_outer(expr(
        """CASE WHEN size(syms) >= 2
             THEN transform(sequence(1, size(syms) - 1),
               i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))
             ELSE CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>) END"""))
        .as("p"))
        .filter(col("p").isNotNull)
        .groupBy(col("p.a"), col("p.b")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) return merges.toSeq
      val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((a, b, n))
      def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
      val (ea, eb) = (esc(a), esc(b))
      // greedy non-overlapping left-to-right application: a freshly
      // merged symbol differs from `a`, so it cannot chain-merge with
      // the next character in the same round (BPE's contract)
      repr = repr.withColumn("syms", expr(
        s"""aggregate(syms, CAST(array() AS ARRAY<STRING>),
              (acc, x) -> CASE
                WHEN size(acc) > 0 AND element_at(acc, -1) = '$ea' AND x = '$eb'
                  THEN concat(slice(acc, 1, size(acc) - 1), array('$ea$eb'))
                ELSE concat(acc, array(x)) END)"""))
        .localCheckpoint()
      round += 1
    }
    merges.toSeq
  }
}
