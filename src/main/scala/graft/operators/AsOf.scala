package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join, built from a union + one sorted window
  * pass — the scalable plan for temporal alignment: one shuffle on the
  * join key, one sort, no range cross-join blowup. This is the Spark
  * answer to the reference's counter-alignment-across-restarts need
  * (SURVEY.md §2.D "range/as-of for counter alignment").
  *
  * Semantics: for each left row, attach the greatest right timestamp
  * `<=` the left timestamp within the same key (inclusive, like
  * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`); left rows with no prior
  * right row get NULL.
  */
object AsOf {

  /** Generic as-of: left (key, ts, payload...) gets the latest right ts.
    * Right rows sort before left rows at equal timestamps so that an
    * exactly-simultaneous right row is visible (inclusive semantics).
    */
  def asOfTimestamp(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String,
      outCol: String): DataFrame = {
    val lCols = left.columns
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rts", lit(null).cast("timestamp"))
    val r = right
      .select(col(keyCol), col(rightTs).as("__ts"))
      .withColumn("__side", lit(0))
      .withColumn("__rts", col("__ts"))
    val unioned = l.select((col(keyCol) +: lCols.filterNot(_ == keyCol).map(col).toSeq)
        :+ col("__ts") :+ col("__side") :+ col("__rts"): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(outCol, last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(col).toSeq :+ col(outCol): _*)
  }

  /** q21 concrete instance: purchases ← most recent signup per user. */
  def purchaseToSignup(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"))
    asOfTimestamp(purchases, signups, "user_id", "ts", "ts", "signup_ts")
      .select(col("event_id"), col("user_id"), col("ts"), col("signup_ts"))
      .orderBy(col("event_id"))
  }
}
