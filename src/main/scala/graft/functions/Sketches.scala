package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based aggregations — the scale path for distincts and
  * quantiles. Not in the reference (it has only exact count/distinct);
  * these are the natural extension points SURVEY §2.5 calls out: at
  * 100 TB an exact global distinct is a full shuffle of the key set,
  * while an HLL sketch is a few KB per partition, merged associatively
  * (one narrow reduction, no key shuffle).
  */
object Sketches {

  /** Approximate distinct per group (HyperLogLog++, relative error
    * `rsd`). Map-side partial sketches merge in the combiner — the
    * shuffle carries sketches, not keys.
    */
  def approxDistinctByKey(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Mergeable HLL sketch column (Apache DataSketches): build per
    * group, union later — the pattern for incremental / cross-day
    * distinct counts where re-scanning history is off the table.
    */
  def hllSketchByKey(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("hll"))

  /** Union previously-built sketches and read the estimate. */
  def hllMerge(sketches: DataFrame, keys: Seq[String], hllCol: String = "hll"): DataFrame =
    sketches.groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(hllCol))).as("distinct_estimate"))

  /** Approximate heavy hitters (frequent items): single-pass,
    * bounded-memory per partition, merged associatively — finds every
    * value with frequency > 1/k (may include false positives; filter
    * with an exact count over just the candidates, which is a
    * semi-join, not a full groupBy). The 100 TB shape for "which hosts/
    * tokens/keys dominate" questions.
    */
  def frequentItems(df: DataFrame, cols: Seq[String], support: Double = 0.01): DataFrame =
    df.stat.freqItems(cols, support)

  /** Exact interpolated quantiles per group (sort-based — fine per
    * group, the oracle-checkable baseline).
    */
  def quantilesByKey(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      qs: Seq[Double]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(percentile(col(valueCol), array(qs.map(lit): _*)).as("quantiles"))

  /** Count-min frequency sketch over `col`, queried for `items`:
    * returns (item, estimate) pairs. The sketch is built distributed
    * (mergeable per-partition sketches, one pass — Spark's
    * `stat.countMinSketch`); only the fixed-size sketch reaches the
    * driver, so this answers "how often does each of these K values
    * occur" over any corpus size with eps·N additive error — the
    * sketch-sized answer to frequency questions where an exact
    * groupBy would shuffle the full key set.
    */
  def countMinEstimates(
      df: DataFrame,
      column: String,
      items: Seq[String],
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): Seq[(String, Long)] = {
    val cms = df.stat.countMinSketch(column, eps, confidence, seed)
    items.map(i => i -> cms.estimateCount(i))
  }

  /** One-pass table profile — the ANALYZE / data-quality report: per
    * column, row count, null count, distinct count, and min/max
    * (cast to string so the result schema is uniform across column
    * types). `exact = false` (default) estimates distincts with HLL:
    * a single aggregate whose shuffle carries sketches — the 100 TB
    * shape. `exact = true` uses `count(DISTINCT …)`, which Spark plans
    * as one Expand duplicating the scan per profiled column — exact
    * and oracle-checkable, priced for diagnostics at test scale, not
    * full-corpus runs.
    *
    * Returns one row per profiled column:
    * `(column, n_rows, n_null, n_distinct, min_value, max_value)`.
    */
  def profileTable(
      df: DataFrame,
      cols: Seq[String] = Nil,
      exact: Boolean = false): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    require(cs.nonEmpty, "nothing to profile")
    val aggs = count(lit(1)).as("__n") +: cs.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (exact) count_distinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val rows = cs.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    agged.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** IQR outlier trim per group — the standard numeric data-cleaning
    * rule: keep rows whose value lies within
    * `[q1 − k·(q3 − q1), q3 + k·(q3 − q1)]` of their group's exact
    * interpolated quartiles (`k = 1.5` is Tukey's fence). Two passes:
    * one grouped quantile aggregation (small result — one row per
    * group), broadcast back onto the rows for a stateless filter.
    * NULL values never pass; NULL group KEYS form their own group
    * (null-safe key match) rather than being silently dropped.
    * Exact quartiles are oracle-checkable;
    * swap in [[approxQuantilesByKey]] upstream when groups are so
    * large the sort-based exact percentile dominates. The fence side
    * is one row per group — not force-broadcast, so a
    * millions-of-groups fence table still joins safely (AQE broadcasts
    * it whenever it fits).
    *
    * Returns the kept rows with `q1`/`q3` attached.
    */
  def trimOutliers(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      k: Double = 1.5): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    val clash = Seq("q1", "q3").filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has fence output columns: ${clash.mkString(", ")}")
    val fences = quantilesByKey(df, keys, valueCol, Seq(0.25, 0.75))
      .select(
        keys.map(c => col(c).as(s"__f_$c")) :+
          element_at(col("quantiles"), 1).as("q1") :+
          element_at(col("quantiles"), 2).as("q3"): _*)
    // null-SAFE key match: a NULL-key group gets fences too — an
    // equi-join would silently drop every null-key row, outlier or not
    val cond = keys.map(c => df(c) <=> fences(s"__f_$c")).reduce(_ && _)
    val iqr = col("q3") - col("q1")
    df.join(fences, cond)
      .filter(
        col(valueCol) >= col("q1") - lit(k) * iqr &&
        col(valueCol) <= col("q3") + lit(k) * iqr)
      .drop(keys.map(c => s"__f_$c"): _*)
  }

  /** Fixed-bin histogram of a numeric column over `[lo, hi)`: `bins`
    * equal-width buckets plus underflow (`bin = -1`) and overflow
    * (`bin = bins`) rows when such values exist (NULLs are skipped).
    * Bin index is `floor((v − lo) * bins / (hi − lo))` — one multiply,
    * one divide, one floor, IEEE-identical in any engine, which is how
    * the gate verifies it exactly. One map-side-combined aggregation;
    * the result is at most `bins + 2` rows. Under/overflow rows carry
    * NULL edges.
    */
  def histogram(
      df: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(hi > lo, "need hi > lo")
    val v = col(valueCol).cast("double")
    // the least() clamp guards the FP edge where (v-lo)*bins/(hi-lo)
    // rounds up to exactly `bins` for a v just under hi — without it
    // an in-range value would land in the overflow row
    val idx = when(v < lo, lit(-1L))
      .when(v >= hi, lit(bins.toLong))
      .otherwise(least(
        floor((v - lit(lo)) * lit(bins) / lit(hi - lo)), lit((bins - 1).toLong)))
    val inRange = col("bin") >= 0 && col("bin") < bins
    df.filter(v.isNotNull)
      .groupBy(idx.as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn(
        "lo_edge",
        when(inRange, round(lit(lo) + col("bin") * lit(hi - lo) / lit(bins), 6)))
      .withColumn(
        "hi_edge",
        when(inRange, round(lit(lo) + (col("bin") + 1) * lit(hi - lo) / lit(bins), 6)))
  }

  /** Key-skew report — the "which keys will blow up my shuffle"
    * diagnosis: the `k` heaviest key tuples with their row counts and
    * share of the table, alongside the table totals (rows, distinct
    * keys). The totals and the top-k are two independent consumers of
    * the keyed aggregation, so the input is scanned and aggregated
    * TWICE — persist the input (or the keyed counts) upstream if the
    * scan dominates at your scale. The top-k itself is a distributed
    * TakeOrdered (never a global single-task sort) and the totals are
    * a 1-row broadcast — nothing key-shaped reaches the driver.
    *
    * Returns `k` rows: `(keyCols…, n, frac, rk, n_total, n_keys)`,
    * ranked by count descending with key-ascending tiebreaks.
    */
  def skewReport(df: DataFrame, keyCols: Seq[String], k: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val reserved = Set("n", "frac", "rk", "n_total", "n_keys")
    val clash = keyCols.filter(reserved)
    require(clash.isEmpty,
      s"key columns collide with report output names: ${clash.mkString(", ")}")
    val keyed = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    val totals = keyed.agg(
      sum(col("n")).as("n_total"), count(lit(1)).as("n_keys"))
    val order = col("n").desc +: keyCols.map(col(_).asc)
    val top = keyed.orderBy(order: _*).limit(k)
    // rank over k already-top rows WITHOUT a window (an empty or
    // foldable partition spec trips the WindowExec single-partition
    // warning): sorted-array posexplode over the bounded row set —
    // struct(-n, keys...) asc = n desc, keys asc, the `order` above
    val ranked = top
      .agg(sort_array(collect_list(struct(
        ((-col("n")).as("_k") +: keyCols.map(col) :+ col("n")): _*))).as("_a"))
      .select(posexplode(col("_a")).as(Seq("_r", "_x")))
      .select(keyCols.map(kc => col("_x").getField(kc).as(kc)) ++ Seq(
        col("_x").getField("n").as("n"),
        (col("_r") + 1).cast("long").as("rk")): _*)
    ranked
      .crossJoin(broadcast(totals))
      .withColumn("frac", round(col("n").cast("double") / col("n_total"), 6))
      .select(
        keyCols.map(col) ++
          Seq(col("n"), col("frac"), col("rk"), col("n_total"), col("n_keys")): _*)
  }

  /** Approximate quantiles (deterministic Greenwald-Khanna summaries;
    * bounded memory per partition — the 100 TB path).
    */
  def approxQuantilesByKey(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      qs: Seq[Double],
      accuracy: Int = 10000): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(percentile_approx(
        col(valueCol), array(qs.map(lit): _*), lit(accuracy)).as("quantiles"))

  // ------------------------------------------------------------------
  // Bloom filter (Bloom 1970, CACM 13(7)) — the set-membership sketch
  // the family was missing: HLL answers "how many distinct", count-min
  // "how often", the Bloom filter "have we seen THIS one" with zero
  // false negatives and a tunable false-positive rate. Pipeline uses:
  // URL / document-hash seen-screens against a historical corpus,
  // cheap pre-joins (drop probe rows that cannot match before the real
  // join), eval-set decontamination at ingest.
  //
  // Determinism contract (what makes it gate-able): bit positions come
  // from the repo's standard SQL-replayable hash chain — base =
  // unsigned md5-lower-64 of the key mod P (2^31-1), position i =
  // (laneA(i)·base + laneB(i)) mod P mod mBits — so engine and oracle
  // agree on every position, hence on every false positive. All
  // arithmetic stays overflow-free in signed 64-bit on both engines.
  // ------------------------------------------------------------------

  /** The `numHashes` bit positions for one key — shared by build and
    * probe so the two sides can NEVER disagree. `mBits` must stay
    * below [[HashUtil.P]] (any real filter is far below 2^31 bits =
    * 256 MB; shard upstream past that).
    */
  private def bloomPositions(key: Column, numHashes: Int, mBits: Int): Column = {
    val base = {
      val h = DedupExpressions.md5Lower64(key)
      val p = lit(HashUtil.P)
      pmod(pmod(h, p) + when(h < 0, lit(4L)).otherwise(lit(0L)), p)
    }
    array((0 until numHashes).map { i =>
      (lit(HashUtil.laneA(i)) * base + lit(HashUtil.laneB(i))) % lit(HashUtil.P) % lit(mBits)
    }: _*)
  }

  /** Build a Bloom filter over `keyCol` as a TABLE of packed 64-bit
    * words `(widx, bits)` — only words with at least one set bit are
    * present, so an underfull filter costs rows proportional to its
    * set bits, not to `mBits`. Fully distributed: explode the k
    * positions per key, pack into (word index, bit), and OR-fold with
    * a map-side-combining `bit_or` aggregation — the shuffle carries
    * at most `mBits / 64` 16-byte rows regardless of corpus size.
    * The result is broadcast-sized by construction (`mBits = 2^26` →
    * ≤ 1M rows / 8 MB) and feeds [[bloomProbe]] or a parquet sink for
    * reuse across runs.
    */
  def bloomBuild(
      df: DataFrame,
      keyCol: String,
      mBits: Int = 1 << 20,
      numHashes: Int = 4): DataFrame = {
    require(mBits > 0 && mBits < HashUtil.P,
      s"mBits must be in (0, 2^31-1), got $mBits")
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes must be in [1, 16], got $numHashes")
    // a NULL key yields an array of null positions — drop them (a null
    // key is "no member", not a poisoned (null, null) word row)
    df.select(explode(bloomPositions(col(keyCol), numHashes, mBits)).as("_pos"))
      .filter(col("_pos").isNotNull)
      .select(shiftright(col("_pos"), 6).as("widx"),
        call_function("shiftleft", lit(1L), pmod(col("_pos"), lit(64L)).cast("int")).as("_bit"))
      .groupBy("widx").agg(bit_or(col("_bit")).as("bits"))
  }

  /** Screen `df` against a built filter: returns `(idCol, hit)` where
    * `hit` ⇔ every one of the key's `numHashes` bit positions is set
    * (a member always hits; a non-member hits only on the classic
    * false-positive collision — deterministically, per the hash
    * contract above, which is why the gate can pin exact values).
    * `mBits`/`numHashes` MUST match the build call.
    *
    * Shape: explode k positions per probe row → broadcast-hash LEFT
    * join against the word table (the filter never shuffles the probe
    * side) → per-id `min(bit set)` conjunction. One narrow shuffle on
    * the probe id for the conjunction; the filter itself rides the
    * broadcast.
    */
  def bloomProbe(
      probe: DataFrame,
      idCol: String,
      keyCol: String,
      bloom: DataFrame,
      mBits: Int = 1 << 20,
      numHashes: Int = 4): DataFrame =
    probe
      .select(col(idCol), explode(bloomPositions(col(keyCol), numHashes, mBits)).as("_pos"))
      .select(col(idCol), shiftright(col("_pos"), 6).as("widx"),
        call_function("shiftleft", lit(1L), pmod(col("_pos"), lit(64L)).cast("int")).as("_bit"))
      .join(broadcast(bloom), Seq("widx"), "left")
      // null probe key ⇒ null positions ⇒ null _set; coalesce to
      // false so the row reports hit=false instead of a null that a
      // filter would silently drop
      .select(col(idCol),
        coalesce(
          coalesce(col("bits"), lit(0L)).bitwiseAND(col("_bit")) =!= 0L,
          lit(false)).as("_set"))
      .groupBy(idCol).agg(min(col("_set")).as("hit"))

  /** Densify a built filter to its full word array — driver-side,
    * bounded by `mBits / 64` longs and loud above 2^26 bits (8 MB):
    * the form that ships in a task closure / plan literal for
    * join-free probing. Absent words are zero by Bloom semantics.
    */
  def bloomWords(bloom: DataFrame, mBits: Int): Array[Long] = {
    require(mBits > 0 && mBits <= (1 << 26),
      s"bloomWords: mBits must be in (0, 2^26] for a driver-held filter, got $mBits")
    val words = new Array[Long]((mBits + 63) / 64)
    bloom.collect().foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** Join-free, aggregation-free membership COLUMN over a densified
    * filter — the stateless form: safe inside a streaming projection
    * (no state, no watermark needed — the q_stream_blocklist shape)
    * and as a map-side pre-filter ahead of an expensive join. The
    * word array rides the plan as one literal, exactly like a
    * cluster broadcast of the filter.
    */
  def bloomHit(
      key: Column,
      words: Array[Long],
      mBits: Int,
      numHashes: Int = 4): Column = {
    val w = typedLit(words.toSeq)
    // null key ⇒ null forall ⇒ coalesce to false (matches bloomProbe)
    coalesce(
      forall(bloomPositions(key, numHashes, mBits), p =>
        element_at(w, shiftright(p, 6).cast("int") + 1)
          .bitwiseAND(call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int")))
          =!= 0L),
      lit(false))
  }
}
