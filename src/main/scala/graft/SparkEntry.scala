package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The full query inventory lives in `QueryDef.registry`; this object is
  * just the stable façade the driver calls.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full star join (q05) — exercises scan, pushdown, broadcast joins,
    * aggregation and sort in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    QueryDef.registry.find(_.name == "q05_local_supplier_volume").get
      .build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    QueryDef.registry.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
