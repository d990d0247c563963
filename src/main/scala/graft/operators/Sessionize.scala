package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the canonical
  * event-analytics operator a warehouse over the `events` table needs.
  * One window shuffle on the user key; the cumulative-sum-of-gaps
  * session id formulation keeps everything in two window passes (no
  * self-join), which is the shape that survives 100 TB.
  */
object Sessionize {

  /** Assign a session id per user: a new session starts when the gap
    * to the previous event exceeds `gapSeconds`.
    *
    * @param tieBreak extra ordering column for same-instant events
    *                 (determinism under duplicate timestamps)
    */
  def withSessionIds(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      gapSeconds: Double = 1800.0,
      tieBreak: Option[String] = None): DataFrame = {
    val order: Seq[Column] = col(tsCol) +: tieBreak.map(col).toSeq
    val w = Window.partitionBy(userCol).orderBy(order: _*)
    df.withColumn("_gap",
        when(lag(col(tsCol), 1).over(w).isNull, 1)
          .when(col(tsCol) - lag(col(tsCol), 1).over(w) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session", sum(col("_gap")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .drop("_gap")
  }

  /** Per-session rollup: start, event count, and an arbitrary set of
    * aggregates.
    */
  def sessions(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      gapSeconds: Double = 1800.0,
      tieBreak: Option[String] = None,
      aggs: Seq[Column] = Nil): DataFrame = {
    val base = Seq(
      min(col(tsCol)).as("session_start"),
      count(lit(1)).as("n_events"))
    withSessionIds(df, userCol, tsCol, gapSeconds, tieBreak)
      .groupBy(col(userCol), col("session"))
      .agg(base.head, (base.tail ++ aggs): _*)
  }
}
