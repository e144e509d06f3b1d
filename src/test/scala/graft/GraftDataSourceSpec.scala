package graft

import graft.storage.{FactTable, GraftRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `format("graft")` V1 data source: load, SQL DDL integration,
  * automatic filter→file-skipping pushdown, and time travel options.
  */
class GraftDataSourceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def rows(n: Int, day: String, modem: String) =
    (1 to n).map(i => (modem,
      java.sql.Timestamp.valueOf(s"$day 00:0${i % 6}:0${i % 10}"), i.toLong))
      .toDF("modem_name", "timestamp", "uptime")
      .withColumn("date", to_date($"timestamp"))

  private def threeDayTable(): FactTable = {
    val t = new FactTable(
      java.nio.file.Files.createTempDirectory("graft_ds").toString, spark)
    t.append(rows(10, "2024-03-01", "m1").repartition(1), 0)
    t.append(rows(10, "2024-03-02", "m2").repartition(1), 1)
    t.append(rows(10, "2024-03-03", "m3").repartition(1), 2)
    t
  }

  test("load + count + schema through format(\"graft\")") {
    val t = threeDayTable()
    val df = spark.read.format("graft").load(t.root)
    assert(df.count() == 30)
    assert(df.columns.toSet == Set("modem_name", "timestamp", "uptime", "date"))
  }

  test("WHERE clause pushes into log-stats file skipping automatically") {
    val t = threeDayTable()
    val df = spark.read.format("graft").load(t.root)

    assert(df.filter($"modem_name" === "m2").count() == 10)
    assert(GraftRelation.lastPrune.exists { case (r, kept, total) =>
      r == t.root && kept == 1 && total == 3 }, GraftRelation.lastPrune)

    val cut = java.sql.Timestamp.valueOf("2024-03-03 00:00:00")
    assert(df.filter($"timestamp" >= cut).count() == 10)
    assert(GraftRelation.lastPrune.exists(_._2 == 1))

    // disjunction across two files keeps exactly those two
    assert(df.filter($"modem_name" === "m1" || $"modem_name" === "m3").count() == 20)
    assert(GraftRelation.lastPrune.exists(_._2 == 2))

    // contradiction prunes everything yet still answers
    assert(df.filter($"modem_name" === "m1" && $"uptime" > 100).count() == 0)
    assert(GraftRelation.lastPrune.exists(_._2 == 0))
  }

  test("evolved column resolves as NULL when pruning keeps only old files") {
    val t = new FactTable(
      java.nio.file.Files.createTempDirectory("graft_evo").toString, spark)
    t.append(rows(10, "2024-03-01", "m1").repartition(1), 0)
    t.append(rows(10, "2024-03-02", "m2")
      .withColumn("fw_version", lit("19.2")).repartition(1), 1)
    val df = spark.read.format("graft").load(t.root)
    assert(df.columns.contains("fw_version"))
    // m1 prunes to the pre-evolution file only; fw_version must still
    // resolve (all NULL) instead of failing analysis
    val old = df.filter($"modem_name" === "m1").select($"fw_version")
    assert(old.count() == 10 && old.filter($"fw_version".isNull).count() == 10)
    assert(GraftRelation.lastPrune.exists(_._2 == 1))
    val neu = df.filter($"modem_name" === "m2")
    assert(neu.filter($"fw_version" === "19.2").count() == 10)
  }

  test("CREATE TEMPORARY VIEW ... USING graft works from pure SQL") {
    val t = threeDayTable()
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_sql_view " +
      s"USING graft OPTIONS (path '${t.root}')")
    val got = spark.sql(
      """SELECT modem_name, COUNT(*) AS n, CAST(SUM(uptime) AS BIGINT) AS su
         FROM graft_sql_view WHERE modem_name <> 'm2'
         GROUP BY modem_name ORDER BY modem_name""")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("m1", 10L, 55L), ("m3", 10L, 55L)))
  }

  test("versionAsOf option time-travels the relation") {
    val t = threeDayTable()
    val v0 = spark.read.format("graft").option("versionAsOf", "0").load(t.root)
    assert(v0.count() == 10)
    assert(v0.select($"modem_name").distinct().as[String].collect().toSeq == Seq("m1"))
  }

  test("pruned V1 scan equals unpruned FactTable read on every row") {
    val t = threeDayTable()
    val viaDs = spark.read.format("graft").load(t.root)
      .filter($"modem_name" =!= "m1").orderBy($"modem_name", $"timestamp", $"uptime")
      .collect().toSeq
    val direct = t.read()
      .filter($"modem_name" =!= "m1").orderBy($"modem_name", $"timestamp", $"uptime")
      .collect().toSeq
    assert(viaDs == direct)
  }

  test("setIndexCols option rides the sidecars through the SQL surface") {
    // interleaved key sets per part: min/max stats keep every part for
    // the probes below, only the set sidecars can skip
    val t = new FactTable(
      java.nio.file.Files.createTempDirectory("graft_ds_set").toString,
      spark, setIndexCols = Seq("modem_name"))
    t.append(rows(3, "2024-03-01", "aa")
      .unionByName(rows(3, "2024-03-01", "zz")).coalesce(1), 0)
    t.append(rows(4, "2024-03-01", "ab")
      .unionByName(rows(4, "2024-03-01", "zy")).coalesce(1), 1)
    val df = spark.read.format("graft")
      .option("setIndexCols", "modem_name").load(t.root)
    // equality: one part proven dead by its exact value set
    assert(df.filter($"modem_name" === "zy").count() == 4)
    assert(GraftRelation.lastPrune.exists { case (r, kept, total) =>
      r == t.root && kept == 1 && total == 2 }, GraftRelation.lastPrune)
    // IN-list spanning both parts: nothing prunable, results exact
    assert(df.filter($"modem_name".isin("zy", "aa")).count() == 7)
    assert(GraftRelation.lastPrune.exists(_._2 == 2))
    // absent-everywhere probe: all parts skipped, zero rows, no error
    assert(df.filter($"modem_name" === "mm").count() == 0)
    assert(GraftRelation.lastPrune.exists(_._2 == 0))
    // without the option the same probe keeps both parts (stats-only)
    val plain = spark.read.format("graft").load(t.root)
    assert(plain.filter($"modem_name" === "zy").count() == 4)
    assert(GraftRelation.lastPrune.exists(_._2 == 2))
  }
}
