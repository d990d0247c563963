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

  /** Salt-replicated equi-join — the join-side skew cure for when AQE
    * can't help: AQE's skew-join only splits post-shuffle partitions
    * of a SortMergeJoin it planned itself; a hot key inside one
    * partition of a pre-partitioned/bucketed pipeline, or a
    * right side too big to broadcast but small enough to replicate
    * `buckets` ways, still stalls one task at 100 TB. Classic shape:
    * the LEFT (big, skewed) side tags each row with a deterministic
    * salt in `[0, buckets)`; the RIGHT side is replicated once per
    * salt value (`explode(sequence)` — `buckets`× its size, which is
    * the knob: salt the join, not the galaxy); the join key becomes
    * `(key, salt)`, so a hot key's rows spread over `buckets`
    * reducers instead of one.
    *
    * Row-level semantics are EXACTLY those of
    * `left.join(right, keys, joinType)` — every left row meets every
    * matching right row exactly once (each right copy carries one
    * distinct salt; a left row holds one salt). `joinType` supports
    * `inner` and `left` (`left_outer`): an unmatched left row
    * surfaces once, nulls on the right. Right-outer/full variants
    * would need an anti-join pass over the replicated side — out of
    * scope, fail loud.
    *
    * The left salt hashes the key columns AND a per-row uniquifier
    * when provided (`leftSaltCols`, default all left columns), so a
    * hot key actually fans out — hashing the key alone would map all
    * its rows to ONE salt and change nothing.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      buckets: Int = 16,
      joinType: String = "inner",
      leftSaltCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "saltedJoin needs at least one key column")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val jt = joinType match {
      case "inner" => "inner"
      case "left" | "left_outer" => "left"
      case t => throw new IllegalArgumentException(
        s"saltedJoin supports inner|left, got $t")
    }
    val clash = (left.columns ++ right.columns).filter(_ == "_salt")
    require(clash.isEmpty, "input already has a _salt column")
    val saltSrc = if (leftSaltCols.nonEmpty) leftSaltCols else left.columns.toSeq
    // a salt derived from the join keys alone maps every row of a hot
    // key to ONE salt: zero skew relief while the right side still
    // pays buckets× replication — the silent no-op this guard stops
    require(!saltSrc.toSet.subsetOf(keys.toSet),
      "saltedJoin: salt source columns are a subset of the join keys — " +
        "every hot-key row would land on one salt. Project a " +
        "distinguishing column onto the left side (or pass leftSaltCols).")
    val l = left.withColumn(
      "_salt", pmod(hash(saltSrc.map(col): _*), lit(buckets)))
    val r = right.withColumn(
      "_salt", explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, keys :+ "_salt", jt).drop("_salt")
  }
}
