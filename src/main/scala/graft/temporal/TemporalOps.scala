package graft.temporal

import graft.model.Meta

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal analytics over a versioned-object DataFrame — the Spark
  * counterpart of the reference's pandas `Result` subclass
  * (reference: metrique/result.py:76-510). Import
  * `graft.temporal.TemporalOps._` and call these on any DataFrame
  * carrying `_oid`/`_start`/`_end` (epoch-second Doubles).
  *
  * All operators are window/groupBy formulations: one shuffle on
  * `_oid` (or none, when AQE reuses the partitioning), no driver-side
  * iteration — the pandas per-row masks become distributed plans.
  */
object TemporalOps {

  implicit class TemporalDataFrame(val df: DataFrame) extends AnyVal {

    private def oidWindow = Window.partitionBy(Meta.OID)

    /** Snapshot of versions alive at instant `d`:
      * `_start <= d < _end` (null `_end` = open interval).
      * NOTE `<=` on `_start` here vs the strictly-before server-side
      * `date_range` — the reference has BOTH semantics and we preserve
      * each (reference: result.py:164-180 vs parse.py:109-124).
      */
    def onDate(d: Double): DataFrame =
      df.filter(aliveAt(d))

    private def aliveAt(d: Double): Column =
      col(Meta.START) <= d && (col(Meta.END) > d || col(Meta.END).isNull)

    /** Alive-object count per date in `dates` → (date, n).
      *
      * Formulated as a range-join against the date grid. The grid is
      * tiny (~300 points, reference: result.py:277-298) so Spark
      * broadcasts it: each partition of `df` streams once past all grid
      * points — no shuffle of the fact table at all.
      */
    def history(dates: Seq[Double]): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val grid = broadcast(dates.toDF("date"))
      df.join(
          grid,
          col(Meta.START) <= col("date") &&
            (col(Meta.END) > col("date") || col(Meta.END).isNull))
        .groupBy(col("date"))
        .agg(count(lit(1)).as("n"))
        .orderBy("date")
    }

    /** Count of distinct oids ever seen up to each grid date
      * (reference: result.py:324-337 `persistent_oid_counts`).
      * `min(_start)` per oid, then a cumulative count over the grid.
      */
    def persistentOidCounts(dates: Seq[Double]): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val firstSeen = df.groupBy(Meta.OID).agg(min(Meta.START).as("first_start"))
      val grid = broadcast(dates.toDF("date"))
      firstSeen
        .join(grid, col("first_start") <= col("date"))
        .groupBy("date")
        .agg(countDistinct(Meta.OID).as("n"))
        .orderBy("date")
    }

    /** Change feed since `t` — the CDC emission an SCD2 store implies
      * without any extra bookkeeping: every version OPENED at or
      * after `t` is an `open` event at its `_start`, every version
      * CLOSED at or after `t` a `close` event at its `_end` (a
      * rotation therefore emits the close of the old version and the
      * open of its successor — the standard before/after change
      * pair). Downstream consumers get incremental reprocessing
      * without scanning history: two scan-side filters, no join, no
      * window; at 100 TB both predicates push down to the parquet
      * scan. Rows: original columns + `(change_op, change_at)`,
      * ordered by the caller.
      */
    def changeFeed(t: Double): DataFrame = {
      val opened = df.filter(col(Meta.START) >= t)
        .withColumn("change_op", lit("open"))
        .withColumn("change_at", col(Meta.START))
      val closed = df.filter(col(Meta.END).isNotNull && col(Meta.END) >= t)
        .withColumn("change_op", lit("close"))
        .withColumn("change_at", col(Meta.END))
      opened.unionByName(closed)
    }

    /** All versions of oids that have an open version
      * (reference: result.py:312-322 `unfinished_objects`).
      */
    def unfinishedObjects(rightBound: Option[Double] = None): DataFrame = {
      val openCond = rightBound match {
        case Some(rb) => col(Meta.END).isNull || col(Meta.END) > rb
        case None => col(Meta.END).isNull
      }
      df.withColumn("_has_open", max(when(openCond, 1).otherwise(0)).over(oidWindow))
        .filter(col("_has_open") === 1)
        .drop("_has_open")
    }

    /** Latest version per oid, plus `age = min(cutoff, _end) - first
      * _start of the oid` (reference: result.py:339-392).
      */
    def lastVersionsWithAge(cutoff: Double): DataFrame = {
      val w = oidWindow.orderBy(col(Meta.START).desc)
      df.withColumn("_rn", row_number().over(w))
        .withColumn("_first_start", min(Meta.START).over(oidWindow))
        .filter(col("_rn") === 1)
        .withColumn(
          "age",
          least(coalesce(col(Meta.END), lit(cutoff)), lit(cutoff)) - col("_first_start"))
        .drop("_rn", "_first_start")
    }

    /** i-th version per oid by `_start` order; negative i counts from
      * the end (reference: result.py:429-452 `one_version`).
      */
    def oneVersion(i: Int): DataFrame = {
      val w =
        if (i >= 0) oidWindow.orderBy(col(Meta.START).asc)
        else oidWindow.orderBy(col(Meta.START).desc)
      val target = if (i >= 0) i + 1 else -i
      df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === target)
        .drop("_rn")
    }

    def firstVersion: DataFrame = oneVersion(0)
    def lastVersion: DataFrame = oneVersion(-1)

    /** Keep only the last unbroken run of versions per oid — a "chain"
      * breaks where a version's `_end` is not the next version's
      * `_start` (reference: result.py:394-427 `last_chain`).
      *
      * Window formulation: order versions by `_start`, flag gaps with
      * `lag(_end) != _start`, cumulative-sum the flags into chain ids,
      * keep the max chain id per oid.
      */
    def lastChain(): DataFrame = {
      val w = oidWindow.orderBy(col(Meta.START).asc)
      val gap = when(
        lag(col(Meta.END), 1).over(w).isNull ||
          lag(col(Meta.END), 1).over(w) === col(Meta.START),
        0).otherwise(1)
      df.withColumn("_chain", sum(gap).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("_max_chain", max(col("_chain")).over(oidWindow))
        .filter(col("_chain") === col("_max_chain"))
        .drop("_chain", "_max_chain")
    }

    /** Oids whose first `_start` is after `d`
      * (reference: result.py:454-465 `started_after`).
      */
    def startedAfter(d: Double): DataFrame =
      df.withColumn("_first_start", min(Meta.START).over(oidWindow))
        .filter(col("_first_start") > d)
        .drop("_first_start")

    /** Keep listed oids (reference: result.py:302-310 `filter_oids`). */
    def filterOids(oids: Seq[Any]): DataFrame =
      df.filter(col(Meta.OID).isin(oids: _*))

    /** Epoch Double `_start`/`_end` → timestamp view
      * (reference: result.py:122-132 `to_datetime`).
      */
    def withTimestamps: DataFrame =
      df.withColumn("_start_ts", timestamp_seconds(col(Meta.START)))
        .withColumn("_end_ts", timestamp_seconds(col(Meta.END)))

    /** groupby `_oid` → apply a per-group transform → concat
      * (reference: result.py:475-483 `object_apply`). The function
      * receives each oid's versions as Rows; distributed via
      * `flatMapGroups` — one shuffle on `_oid`.
      */
    def objectApply(f: Seq[Row] => Seq[Row]): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      implicit val enc: Encoder[Row] = Encoders.row(df.schema)
      df.groupByKey(r => r.getAs[Any](Meta.OID).toString)
        .flatMapGroups((_, it) => f(it.toSeq).iterator)
    }
  }

  /** A query result with its temporal bounds remembered — asking for a
    * date outside the originally-queried range raises (reference:
    * result.py:134-162 `set_date_bounds`/`check_in_bounds`).
    */
  final case class BoundedResult(
      df: DataFrame,
      lbound: Option[Double],
      rbound: Option[Double]) {

    def checkInBounds(d: Double): Unit = {
      val ok = lbound.forall(d >= _) && rbound.forall(d <= _)
      if (!ok) throw new IllegalArgumentException(
        s"date $d outside queried bounds [${lbound.getOrElse("-inf")}, ${rbound.getOrElse("inf")}]")
    }

    def onDate(d: Double): DataFrame = { checkInBounds(d); df.onDate(d) }

    def history(dates: Seq[Double]): DataFrame = {
      dates.foreach(checkInBounds)
      df.history(dates)
    }
  }

  /** Sample-date grid generation (reference: result.py:227-298
    * `get_dates_range`): daily/weekly/monthly/quarterly/yearly grids, or
    * `auto` targeting ~`ideal` points. Driver-side pure function — the
    * grid is small by construction.
    */
  def datesRange(
      start: Double,
      end: Double,
      scale: String = "auto",
      ideal: Int = 300): Seq[Double] = {
    require(end >= start, s"end $end < start $start")
    val day = 86400.0
    val stepOf = Map(
      "daily" -> day, "weekly" -> 7 * day, "monthly" -> 30 * day,
      "quarterly" -> 91 * day, "yearly" -> 365 * day)
    val step = scale match {
      case "auto" =>
        val span = end - start
        // pick the smallest scale that keeps the grid near `ideal` points
        Seq("daily", "weekly", "monthly", "quarterly", "yearly")
          .map(stepOf)
          .find(s => span / s <= ideal)
          .getOrElse(stepOf("yearly"))
      case "maximum" => throw new IllegalArgumentException(
        "scale=maximum needs the version data: use datesRangeMaximum(df, start, end)")
      case s => stepOf.getOrElse(s, throw new IllegalArgumentException(s"bad scale $s"))
    }
    Iterator.iterate(start)(_ + step).takeWhile(_ <= end).toSeq :+ end
  }

  /** `scale="maximum"` (reference: result.py:243-262): the exact grid —
    * every DISTINCT version boundary (`_start` and non-null `_end`)
    * inside `[start, end]`, sorted. A history over this grid loses
    * nothing: counts can only change at version boundaries, so
    * sampling exactly there is the finest meaningful resolution.
    *
    * The contract is a DRIVER-SIDE grid (the reference's `maximum`
    * scale), so the collect is data-dependent — GUARDED: the boundary
    * count is aggregated FIRST (one distributed count, no rows moved)
    * and the collect refuses above `maxPoints` (default 1,000,000 ≈
    * 8 MB of doubles) with an error naming the fixed-scale fallback.
    * At 100 TB with per-second versioning a caller hits the guard, not
    * a driver OOM — narrow the window or use
    * `datesRange(start, end, "daily"/"weekly"/...)` instead.
    */
  def datesRangeMaximum(
      df: DataFrame,
      start: Double,
      end: Double,
      maxPoints: Long = 1000000L): Seq[Double] = {
    require(end >= start, s"end $end < start $start")
    require(maxPoints > 0, s"maxPoints must be positive, got $maxPoints")
    val bounds = df.select(col(Meta.START).as("b"))
      .unionByName(df.filter(col(Meta.END).isNotNull).select(col(Meta.END).as("b")))
      .filter(col("b") >= start && col("b") <= end)
      .distinct()
    val n = bounds.count()
    require(n <= maxPoints,
      s"datesRangeMaximum: $n distinct version boundaries in [$start, $end] " +
        s"exceed maxPoints=$maxPoints — the maximum-scale grid is a driver-side " +
        "collect by contract. Narrow the window, raise maxPoints deliberately, " +
        "or fall back to a fixed scale: datesRange(start, end, \"daily\"|\"weekly\"|...)")
    bounds
      .orderBy("b")
      .collect()
      .map(_.getDouble(0))
      .toSeq
  }

  /** Least-squares linear extrapolation of a (x, y) series, clamped at 0
    * (reference: result.py:197-223 `_linreg_future`). The fit runs on
    * the driver over the ~300-point series — never on the cluster.
    */
  def linregFuture(xs: Seq[Double], ys: Seq[Double], futureXs: Seq[Double]): Seq[Double] = {
    require(xs.length == ys.length && xs.nonEmpty)
    val n = xs.length.toDouble
    val mx = xs.sum / n
    val my = ys.sum / n
    val denom = xs.map(x => (x - mx) * (x - mx)).sum
    val slope = if (denom == 0) 0.0 else xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / denom
    val intercept = my - slope * mx
    futureXs.map(x => math.max(0.0, slope * x + intercept))
  }

  /** [[linregFuture]] in a CROSS-ENGINE-EXACT formulation for oracle-
    * gated queries: shift x by a constant `x0` so every sum term is an
    * exact small integer in double (day-grid offsets × integer counts
    * stay far below 2^53), then the closed form
    * `slope = (n·Σuy − Σu·Σy) / (n·Σu² − (Σu)²)` — the numerator and
    * denominator are EXACT, so slope/intercept/forecast come out
    * bit-identical in any IEEE-754 engine regardless of summation
    * order (which is what the centered [[linregFuture]] form cannot
    * guarantee: `x − mean` is already rounded).
    */
  def linregFutureExact(
      xs: Seq[Double], ys: Seq[Double], futureXs: Seq[Double], x0: Double): Seq[Double] = {
    require(xs.length == ys.length && xs.nonEmpty)
    val us = xs.map(_ - x0)
    val n = xs.length.toDouble
    val su = us.sum
    val sy = ys.sum
    val suu = us.map(u => u * u).sum
    val suy = us.zip(ys).map { case (u, y) => u * y }.sum
    val denom = n * suu - su * su
    val slope = if (denom == 0) 0.0 else (n * suy - su * sy) / denom
    val intercept = (sy - slope * su) / n
    futureXs.map(x => math.max(0.0, intercept + slope * (x - x0)))
  }

  /** Trailing event-time rolling aggregates: every row gets each
    * aggregate evaluated over its key's rows with
    * `tsCol ∈ [row.ts − trailing, row.ts]` (a value-based RANGE frame,
    * so simultaneous events are all in each other's frames — no
    * row-number arbitrariness). The moving-metrics primitive (rate
    * counters, trailing sums, rolling max) over an event table.
    *
    * `tsCol` must be numeric (epoch micros as BIGINT keeps frames and
    * sums integer-exact; see the q_rolling_window gate). One shuffle
    * on `keyCols`, then a single sorted pass per partition — linear at
    * any scale, state bounded by the widest frame.
    */
  def rollingAgg(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      trailing: Long,
      aggs: Map[String, Column]): DataFrame = {
    require(trailing >= 0, "trailing must be >= 0")
    // one select against the ORIGINAL frame: sequential withColumn
    // would let an output named like tsCol/keyCols/an input column
    // silently replace what later aggregates and the window order by
    val clash = aggs.keySet.intersect(df.columns.toSet)
    require(clash.isEmpty, s"agg output names collide with input columns: $clash")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol))
      .rangeBetween(-trailing, Window.currentRow)
    df.select(
      col("*") +: aggs.toSeq.sortBy(_._1).map { case (name, a) => a.over(w).as(name) }: _*)
  }
}
