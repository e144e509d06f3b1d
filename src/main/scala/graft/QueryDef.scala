package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable query in the engine's public inventory.
  *
  * @param name   stable identifier (key in `SparkEntry.queries`)
  * @param build  Spark-side implementation; `sfDir` points at the parquet
  *               test tables (see TESTDATA.md)
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               parquet tables; None → the driver only row-count-checks
  * @param doc    what reference capability this exercises (SURVEY.md §2)
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {
  /** Determinism contract shared by every QueryDef (see Verify/DuckDB gate):
    * float aggregation goes through exact decimal casts in BOTH engines,
    * every result carries a total-order ORDER BY, and column names/aliases
    * are identical on both sides.
    */
  val registry: Seq[QueryDef] =
    operators.CoreQueries.defs ++
      operators.ExtendedQueries.defs ++
      operators.SubqueryQueries.defs ++
      operators.TextQueries.defs ++
      operators.DedupQueries.defs ++
      operators.SimilarityQueries.defs ++
      operators.MultimodalQueries.defs ++
      sources.DocsisQueries.defs
}
