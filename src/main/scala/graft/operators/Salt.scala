package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase ("salted") aggregation for skewed group keys.
  *
  * A plain `groupBy(k).agg(...)` sends every row of a hot key to one
  * reducer; at 100 TB a single skewed key stalls the stage. Salting
  * splits each key into `buckets` sub-groups for a parallel partial
  * aggregate, then merges partials in a second (tiny) aggregation.
  * AQE's skew handling covers joins; this is the aggregation-side
  * counterpart for algebraic aggregates.
  *
  * The salt is `pmod(hash(all columns), buckets)` — deterministic, no
  * wall-clock/random state, so plans stay replayable.
  */
object Salt {

  /** Salted sum/count-style aggregation.
    *
    * @param partials (outputName → (partialAggOf(valueCol), mergeOf(partialCol)))
    *                 e.g. `"n" -> (count(lit(1)), sum(col("n")))`
    */
  def aggregate(
      df: DataFrame,
      keys: Seq[String],
      partials: Seq[(String, (Column, Column))],
      buckets: Int = 16): DataFrame = {
    val salted = df.withColumn(
      "_salt", pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(buckets)))
    val stage1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(
        partials.head._2._1.as(partials.head._1),
        partials.tail.map { case (n, (p, _)) => p.as(n) }.toSeq: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(
        partials.head._2._2.as(partials.head._1),
        partials.tail.map { case (n, (_, m)) => m.as(n) }.toSeq: _*)
  }

  /** Salted count per key — the common hot-key case. */
  def countByKey(df: DataFrame, keys: Seq[String], buckets: Int = 16): DataFrame =
    aggregate(df, keys,
      Seq("n" -> (count(lit(1)), sum(col("n")).cast("long"))), buckets)
}
