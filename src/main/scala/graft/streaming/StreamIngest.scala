package graft.streaming

import graft.model.Meta
import graft.store.Container

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming ingestion: the streaming counterpart of the
  * batch flush→upsert path. The reference has no streaming (closest:
  * the delta/watermark resync, generic.py:201-269); this is the
  * capability a 100 TB deployment needs — `readStream` → normalize/
  * hash → `foreachBatch` SCD2 upsert, with the watermark playing the
  * `delta_ts` role.
  */
final case class SessionEvent(user_id: Long, t: Double, event_id: Long, value: Double)
final case class SessionState(startT: Double, lastT: Double, n: Long, sum: Double)
final case class SessionOut(
    user_id: Long, session_start: Double, session_end: Double,
    n_events: Long, sum_value: Double)

/** Unioned input row of [[StreamIngest.enrichAsOfDimStream]]: an
  * event (`is_dim = false`, `id` = event id) or a dimension VERSION
  * (`is_dim = true`, `payload` = the version's value). `t_us` is
  * epoch microseconds on both sides — exact, no float time.
  */
final case class AsOfDimRow(
    key: Long, t_us: Long, is_dim: Boolean, id: Long, payload: String)
final case class AsOfDimVersion(t_us: Long, payload: String)
final case class AsOfDimEvent(t_us: Long, id: Long)
final case class AsOfDimState(
    dims: List[AsOfDimVersion], events: List[AsOfDimEvent])

/** Enriched event: `dim_t_us = -1` / `dim_payload = null` when no
  * dimension version at or before the event time exists.
  */
final case class AsOfDimOut(
    key: Long, event_id: Long, t_us: Long, dim_t_us: Long, dim_payload: String)

object StreamIngest {

  /** Ingest a directory of files as a stream of current-version
    * snapshots, SCD2-upserted per micro-batch into `container`.
    *
    * Each batch: wrap with meta columns (`_start` from `tsCol`), keep
    * the latest version per oid (upsert dedupes further), then the
    * same 3-way join-split used by the batch path. `foreachBatch`
    * keeps the merge idempotent per the upsert contract — replaying a
    * batch with unchanged content adds no versions.
    */
  def upsertStream(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      container: Container,
      oidCol: String,
      tsCol: String,
      dataCols: Seq[String],
      checkpointDir: String,
      maxFilesPerTrigger: Int = 10,
      startExpr: Option[DataFrame => org.apache.spark.sql.Column] = None): StreamingQuery = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val selected = batch.select((oidCol +: tsCol +: dataCols).distinct.map(col): _*)
        val startCol = startExpr.map(_(selected)).getOrElse(col(tsCol).cast("double"))
        val wrapped = Meta.wrap(
          selected,
          oid = col(oidCol),
          asOf = 0.0,
          start = Some(startCol),
          dataCols = Some(dataCols))
        container.upsert(wrapped)
        ()
      }
      .start()
  }

  /** Screen a document stream against a STATIC near-dup signature
    * index — the rolling-ingest front door of a training-data
    * pipeline: every micro-batch runs the exact batch screen
    * ([[graft.functions.Dedup.dedupAgainstIndex]]) against the
    * persisted index, so each batch's output is definitionally the
    * batch operator's result for those rows, delivered incrementally
    * (`onBatch` receives `(screened, batchId)` — write accepted rows,
    * and append their signatures to the index store for the next
    * stream restart to pick up). The index is static for the stream's
    * lifetime, so this is a stream-static composition with NO
    * streaming state: no watermark to tune, and a crash-restart
    * replays only unprocessed files (checkpoint tracks the file log).
    * Screening cost per batch is O(batch) band rows against the
    * pre-pruned index bands, same as the batch path.
    */
  def screenStreamAgainstIndex(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      index: graft.functions.Dedup.SignatureIndex,
      threshold: Double,
      checkpointDir: String)(onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(
          graft.functions.Dedup.dedupAgainstIndex(
            batch, idCol, textCol, index, threshold),
          batchId)
        ()
      }
      .start()

  /** Streaming gap-sessionization with CUSTOM state:
    * `flatMapGroupsWithState` keeps one open session per user; an
    * event beyond the gap closes and emits the finished session, and an
    * EVENT-TIME TIMEOUT closes sessions of users who simply go quiet —
    * without it, inactive users' sessions never emit and their state is
    * never evicted, so state grows without bound. The stateful-streaming
    * counterpart of `operators.Sessionize` — per-key state is O(1),
    * bounded by the watermark, which is what lets it run forever at
    * 100 TB/day.
    *
    * Input columns: (user_id long, t double epoch-seconds, value
    * double). Emits (user_id, session_start, session_end, n_events,
    * sum_value) for CLOSED sessions.
    *
    * LATE-DATA BOUNDARY: the watermark makes this a lossy-but-bounded
    * operator. Spark's stateful late-row filter DROPS any event whose
    * event time is <= the current watermark — including, in the very
    * first micro-batch, events at epoch 0 (the initial watermark).
    * Events arriving more than `watermarkDelay` behind the max seen
    * event time are silently discarded rather than sessionized; that
    * is the price of O(watermark-window) state instead of O(forever).
    *
    * @param watermarkDelay how much event-time lateness to tolerate;
    *   defaults to the gap itself (rounded UP to whole seconds so a
    *   sub-second gap never produces a zero-tolerance watermark)
    */
  def streamingSessionize(
      events: org.apache.spark.sql.Dataset[SessionEvent],
      gapSeconds: Double = 1800.0,
      watermarkDelay: String = null): org.apache.spark.sql.Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val delay = Option(watermarkDelay)
      .getOrElse(s"${math.ceil(gapSeconds).toLong} seconds")
    events
      .withColumn("__event_ts", timestamp_seconds(col("t")))
      .withWatermark("__event_ts", delay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, evs: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // watermark passed lastT+gap with no new events: close, evict
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.startT, s.lastT, s.n, s.sum))
          } else {
            var s = state.getOption.orNull
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            for (e <- evs.toSeq.sortBy(ev => (ev.t, ev.event_id))) {
              if (s == null) s = SessionState(e.t, e.t, 1L, e.value)
              else if (e.t - s.lastT > gapSeconds) {
                closed += SessionOut(user, s.startT, s.lastT, s.n, s.sum)
                s = SessionState(e.t, e.t, 1L, e.value)
              } else s = SessionState(s.startT, e.t, s.n + 1, s.sum + e.value)
            }
            if (s != null) {
              state.update(s)
              // fire once the watermark passes the gap after the last
              // event; must stay strictly above the current watermark
              state.setTimeoutTimestamp(math.max(
                ((s.lastT + gapSeconds) * 1000).toLong,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
        })
  }

  /** Streaming exact dedup on a key (e.g. the content `_hash` or a
    * document fingerprint): keeps the FIRST arrival of each key, with
    * state bounded by the watermark —
    * `dropDuplicatesWithinWatermark` evicts seen-keys older than the
    * delay, so state stays O(keys-per-watermark-window) instead of
    * O(all keys ever), the property that lets a continuous
    * training-data ingest run indefinitely. Batch counterpart:
    * `functions.Dedup.exact`.
    */
  def streamingDedup(
      stream: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withColumn("__ts", col(tsCol).cast("timestamp"))
      .withWatermark("__ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)
      .drop("__ts")

  /** Windowed streaming aggregation over an event stream: event counts
    * and value sums per (window, event_type) with a watermark bounding
    * state (the guide's canonical shape).
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      windowLen: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("__ts", col(tsCol).cast("timestamp"))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Stream-static enrichment, the canonical streaming join shape: a
    * watermarked event stream LEFT-joined to a (small) static
    * dimension on `joinKey`, then windowed counts per dimension
    * attribute `attr`. Events with a NULL key or a key absent from the
    * dimension are NOT dropped — they count under `fallbackAttr`
    * ("unknown"), so a late-arriving dimension undercounts visibly
    * instead of silently. The static side is broadcast and re-resolved
    * per micro-batch, so a dimension refresh (overwrite of its backing
    * table) is picked up without restarting the query; streaming state
    * stays bounded by the watermark exactly as in [[windowedCounts]] —
    * the join itself is stateless.
    */
  def enrichedWindowedCounts(
      events: DataFrame,
      tsCol: String,
      dim: DataFrame,
      joinKey: String,
      attr: String,
      windowLen: String = "5 minutes",
      watermark: String = "10 minutes",
      fallbackAttr: String = "unknown"): DataFrame =
    events
      .withColumn("__ts", col(tsCol).cast("timestamp"))
      .withWatermark("__ts", watermark)
      .join(broadcast(dim.select(col(joinKey), col(attr))), Seq(joinKey), "left")
      .groupBy(
        window(col("__ts"), windowLen),
        coalesce(col(attr), lit(fallbackAttr)).as(attr))
      .agg(count(lit(1)).as("n"))

  /** Stream-static AS-OF enrichment against an SCD2 dimension — the
    * bridge between the temporal store and the streaming half: each
    * event picks the dimension VERSION valid at its event time
    * (`dimStart <= t < dimEnd`, open current version `dimEnd IS
    * NULL` — the store's exact `on_date` semantics). Stateless: the
    * static side broadcasts and re-resolves per micro-batch (a dim
    * refresh is picked up without restarting the query), no
    * watermark, no state store. SCD2 intervals are non-overlapping
    * per key, so at most one version matches — the join cannot fan
    * out. LEFT join: an event before its key's first version (or
    * with an unknown key) keeps flowing with null dim columns —
    * count them, don't silently drop them.
    *
    * `tsCol` and `dimStart`/`dimEnd` must be the same comparable
    * type (the store uses epoch-second doubles).
    *
    * Broadcast contract: the dim ships to every executor AND lives on
    * the driver, so an unbounded dimension means a driver OOM mid-run
    * — the guard counts the dim ONCE at query construction and fails
    * LOUD past `maxBroadcastRows` (default 10M rows ≈ ~1 GB at
    * typical SCD2 widths). For a genuinely huge dimension pass
    * `broadcastDim = false`: the hint (and the count) are skipped and
    * each micro-batch plans a regular shuffle join against the static
    * side — slower per batch, bounded memory. The count reflects the
    * dim at START; a dim that grows past the bound after start is the
    * caller's monitoring problem (documented, not re-counted per
    * batch — that would put a full dim scan on every micro-batch).
    *
    * Hot-path callers constructing the enrichment repeatedly (per
    * micro-batch, in a loop) should pre-validate the dimension ONCE
    * and pass `knownDimRows = Some(n)` — the guard then checks the
    * supplied bound without re-scanning the dim at every
    * construction. The count is the caller's assertion; a dim that
    * was swapped for a bigger one under the same plan is on them.
    */
  def enrichAsOfScd2(
      events: DataFrame,
      tsCol: String,
      dim: DataFrame,
      eventKey: String,
      dimKey: String,
      dimStart: String = "_start",
      dimEnd: String = "_end",
      broadcastDim: Boolean = true,
      maxBroadcastRows: Long = 10000000L,
      knownDimRows: Option[Long] = None): DataFrame = {
    // qualified references: an event stream that itself came through
    // the store wrap carries _start/_end too — unqualified col()
    // would be AMBIGUOUS_REFERENCE against the default dim columns
    val d = if (broadcastDim) {
      val n = knownDimRows.getOrElse(dim.count())
      require(n <= maxBroadcastRows,
        s"enrichAsOfScd2: dimension has $n rows > maxBroadcastRows=" +
          s"$maxBroadcastRows — broadcasting it would risk a driver OOM. " +
          "Pass broadcastDim = false (per-batch shuffle join) or raise " +
          "maxBroadcastRows if the driver is provisioned for it.")
      broadcast(dim)
    } else dim
    events.join(d,
      events(eventKey) === d(dimKey) &&
        events(tsCol) >= d(dimStart) &&
        (d(dimEnd).isNull || events(tsCol) < d(dimEnd)),
      "left")
  }

  /** STREAM-STREAM interval inner join — the stateful two-stream
    * primitive (funnel/attribution shape: "purchase within `maxGap`
    * after click"). Both sides get an event-time watermark and the
    * join condition carries the time-range bound
    * `left time <= right time <= left time + maxGap`, which is what
    * lets Spark expire join state: a left row can be dropped once the
    * RIGHT watermark passes `leftTime + maxGap`, a right row once the
    * LEFT watermark passes its time (the engine derives both bounds
    * from this exact conjunction — an equi-join without the range
    * would keep state forever and Spark rejects it in append mode
    * without a watermark). Inner join: matches emit as soon as both
    * rows have arrived; the watermark bounds STATE, not result
    * completeness, so with bounded late data the output equals the
    * batch join — which is the q_stream_join oracle's statement.
    *
    * Column contract: `left`/`right` must already be projected to
    * DISTINCT column names (Spark cannot disambiguate same-name
    * columns across two streams); `leftKey`/`rightKey` are the
    * equi-join keys, `leftTime`/`rightTime` the event-time columns the
    * watermarks ride on.
    */
  /** `joinType`: `"inner"` (default), `"left_outer"`, `"right_outer"`
    * or `"full_outer"`. The outer forms emit an unmatched row (other
    * side's columns null) only once the row is provably unmatchable:
    * an unmatched LEFT row flushes when both watermarks pass
    * `leftTime + maxGap` (no future right row in its window can still
    * arrive), an unmatched RIGHT row when the left watermark passes
    * `rightTime` (a matching left row would need
    * `leftTime >= rightTime - maxGap` AND `leftTime <= rightTime`,
    * and everything at or before `rightTime` is now late beyond the
    * watermark). `full_outer` is both contracts at once.
    * Completeness contract: the outer result is final only for rows
    * older than `watermark + maxGap` behind the max observed event
    * time ON THEIR OWN side; a finite stream's tail rows stay
    * buffered (they could still match on a longer stream), so a
    * batch-equality check must restrict to the flushed region —
    * q_stream_join_outer restricts the left side,
    * q_stream_join_right the right side, q_stream_join_full both.
    */
  def intervalJoinStreams(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      maxGap: String = "30 minutes",
      watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left_outer", "right_outer", "full_outer")
    require(allowed.contains(joinType),
      s"joinType must be one of ${allowed.mkString("|")}, got $joinType")
    val l = left.withColumn(leftTime, col(leftTime).cast("timestamp"))
      .withWatermark(leftTime, watermark)
    val r = right.withColumn(rightTime, col(rightTime).cast("timestamp"))
      .withWatermark(rightTime, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTime) >= col(leftTime) &&
        col(rightTime) <= col(leftTime) + expr(s"INTERVAL $maxGap"),
      joinType)
  }

  /** STREAM-STREAM as-of enrichment with a VERSIONED DIMENSION STREAM
    * — the stream-dim variant [[enrichAsOfScd2]] cannot cover (there
    * the dim is a static table re-resolved per micro-batch). Each
    * event picks the dimension version with the largest
    * `version time <= event time` (inclusive, the store's as-of
    * convention; ties on the version time break by largest payload
    * string — a total, cross-engine-replayable order). Public
    * precedent: Flink's event-time temporal table join keeps exactly
    * this latest-version-per-key state.
    *
    * Contract (the interval joins' flushed-region contract): an
    * enriched event emits once the WATERMARK passes its event time —
    * at that point every dimension version at or before it has either
    * arrived or is late beyond the watermark (Spark's stateful late
    * filter drops rows at or below the watermark), so the pick is
    * FINAL. A finite stream's tail events (inside the watermark of
    * the max observed time) stay buffered; a batch-equality check
    * must restrict to events older than `maxTime - watermarkDelay`,
    * which is what q_stream_asof_dim replays.
    *
    * State per key: buffered not-yet-flushable events (bounded by the
    * watermark window) + dimension versions pruned to the latest one
    * at or below the watermark plus any above it. The latest version
    * per key persists for the stream's lifetime — O(#keys) state, the
    * inherent floor of a versioned-dim join (a future event may
    * always need the current version); document capacity accordingly.
    *
    * Inputs are pre-projected DataFrames: `events` carries
    * `(eventKey long, eventTimeUs long, eventId long)`, `dims`
    * carries `(dimKey long, dimTimeUs long, payload string)` — times
    * in epoch MICROSECONDS (exact; no float time inside the state
    * machine).
    */
  def enrichAsOfDimStream(
      events: DataFrame,
      eventKey: String, eventTimeUs: String, eventId: String,
      dims: DataFrame,
      dimKey: String, dimTimeUs: String, dimPayload: String,
      watermarkDelay: String = "1 hour"): org.apache.spark.sql.Dataset[AsOfDimOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val evRows = events.select(
      col(eventKey).cast("long").as("key"),
      col(eventTimeUs).cast("long").as("t_us"),
      lit(false).as("is_dim"),
      col(eventId).cast("long").as("id"),
      lit(null).cast("string").as("payload"))
    val dimRows = dims.select(
      col(dimKey).cast("long").as("key"),
      col(dimTimeUs).cast("long").as("t_us"),
      lit(true).as("is_dim"),
      lit(-1L).as("id"),
      col(dimPayload).cast("string").as("payload"))
    evRows.unionByName(dimRows)
      .withColumn("__ts", timestamp_micros(col("t_us")))
      .withWatermark("__ts", watermarkDelay)
      .as[AsOfDimRow]
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, rows: Iterator[AsOfDimRow], state: GroupState[AsOfDimState]) => {
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var st = state.getOption.getOrElse(AsOfDimState(Nil, Nil))
          if (!state.hasTimedOut) {
            // fold the batch's rows into state (dims sorted on merge).
            // The tie-break on same-time versions is CODE-POINT payload
            // order (== UTF-8 byte order == DuckDB's VARCHAR binary
            // collation, the q_stream_asof_dim oracle's ORDER BY) —
            // Java String ordering disagrees for supplementary-plane
            // payloads. Null payloads are a contract violation, loud.
            val (newDims, newEvs) = rows.toSeq.partition(_.is_dim)
            if (newDims.nonEmpty) {
              newDims.find(_.payload == null).foreach { d =>
                throw new IllegalArgumentException(
                  s"enrichAsOfDimStream: null dim payload at key=$key " +
                    s"t_us=${d.t_us} — versions must carry a value")
              }
              // st.dims is ALWAYS sorted (this merge + the watermark
              // prune both preserve order), so fold a new batch in by
              // sorting ONLY the batch and linear-merging the two
              // sorted lists — O(new·log new + existing), not the
              // O(n log n) full re-sort that degraded a hot key
              // receiving versions across many micro-batches.
              // Function VALUES + an iterative merge, not local defs:
              // a local def lifts onto StreamIngest$ and the state
              // lambda then captures the (non-serializable) object.
              val lt = (x: AsOfDimVersion, y: AsOfDimVersion) =>
                if (x.t_us != y.t_us) x.t_us < y.t_us
                else graft.functions.Bpe.cpCompare(x.payload, y.payload) < 0
              val batch = newDims.map(d => AsOfDimVersion(d.t_us, d.payload))
                .sortWith(lt).toList
              val out = List.newBuilder[AsOfDimVersion]
              var a = st.dims
              var b = batch
              while (a.nonEmpty && b.nonEmpty) {
                if (lt(b.head, a.head)) { out += b.head; b = b.tail }
                else { out += a.head; a = a.tail }
              }
              out ++= a
              out ++= b
              st = st.copy(dims = out.result())
            }
            if (newEvs.nonEmpty)
              // PREPEND the batch (O(new), not List ++'s O(existing)):
              // event order inside state is irrelevant — the flush
              // sorts `ready` by (t_us, id) and `pending` is a set
              st = st.copy(events =
                newEvs.map(e => AsOfDimEvent(e.t_us, e.id)).toList ::: st.events)
          }
          // flush: events at or below the watermark have a FINAL pick
          val (ready, pending) = st.events.partition(_.t_us <= wmUs)
          val out = ready.sortBy(e => (e.t_us, e.id)).map { e =>
            // dims sorted by (t, payload): the last one <= e.t_us is
            // the as-of pick with the documented payload tie-break
            val pick = st.dims.takeWhile(_.t_us <= e.t_us).lastOption
            AsOfDimOut(key, e.id, e.t_us,
              pick.map(_.t_us).getOrElse(-1L), pick.map(_.payload).orNull)
          }
          // prune dims: keep the latest version at or below the
          // watermark (any future event still needs it) + all above
          val below = st.dims.filter(_.t_us <= wmUs)
          val keptDims =
            (if (below.nonEmpty) List(below.last) else Nil) :::
              st.dims.filter(_.t_us > wmUs)
          val next = AsOfDimState(keptDims, pending)
          if (next.dims.isEmpty && next.events.isEmpty) state.remove()
          else {
            state.update(next)
            // wake on watermark advance ONLY while events are pending
            // (dim-only state sits passively until the key's next row)
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                pending.map(_.t_us).min / 1000L + 1L,
                state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
        })
  }

}
