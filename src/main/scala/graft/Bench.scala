package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall seconds.
  *
  * The artifact is SELF-ADJUDICATING (rounds 6 and 7 both burned
  * judge time re-litigating host contention by hand): alongside the
  * backward-compatible `queries` median map it emits, per query, the
  * raw per-run times, the 1-minute /proc/loadavg before and after the
  * query's runs, an explicit `err` for a run that threw (a failed run
  * contributes NO timing — round 7's version silently timed the
  * failure latency), and a `retried` flag. A query whose first run-set
  * spread (max/min) exceeds [[Bench.SpreadLimit]] is re-run once —
  * back-to-back medians do not defend against a continuously loaded
  * host, so the retry widens the window and the recorded spread +
  * loadavg let a reader adjudicate without rerunning anything.
  */
object Bench {
  /** Headline set: the scan/join/agg/window/temporal/dedup workloads a
    * 100 TB deployment actually runs hot — excludes the deliberately
    * quadratic small-subset correctness demos.
    */
  val Headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "q_window_topn", "q_sessionize", "q_salted_agg", "q_distinct_count",
    "q_find_mql", "q_date_asof", "q_last_version", "q_upsert_scd2",
    "q_activity_import", "q_stream_window",
    "q_token_counts", "q_quality_score", "q_dedup_exact",
    "q_minhash_pairs", "q_simhash", "q_embed_topk",
    "q_asof_join", "q_quantiles", "q_hll_distinct", "q_token_pack",
    // round-5/6 scan-side kernel operators: a kernel regression (a
    // shuffle or interpreted HOF creeping back) must move the driver's
    // round-over-round totals, not hide outside the headline set
    "q_quality_filter", "q_containment", "q_chunk_docs",
    "q_corpus_rarity", "q_dup_spans", "q_tfidf_terms", "q_surprisal",
    // round-6 selection/retrieval/clustering operators
    "q_bm25", "q_dsir_select", "q_kmeans", "q_hybrid_search",
    // round-6 (cont.): global line dedup + exact-substring removal
    "q_line_dedup", "q_remove_spans",
    // round-6 (cont.): domain curation + hashed quality classifier
    "q_domain_cap", "q_classifier_score", "q_mixture_temp",
    // round-6 (cont.): block-permutation simhash near-dup join
    "q_simhash_pairs",
    // round-6 (cont.): bigram stupid-backoff LM + n-gram diversity
    "q_bigram_lm", "q_ngram_diversity",
    // round-8: IVF-armed hybrid retrieval (the production vecArm path)
    "q_hybrid_ann",
    // round-8: BPE tokenizer — train (1 word-count scan + driver merge
    // loop) and encode (1 codegen'd count-only kernel scan)
    "q_bpe_train", "q_bpe_encode",
    // round-8: link-graph centrality (8 co-partitioned join rounds)
    "q_pagerank",
    // round-9: byte-level BPE encode (codegen kernel, hex-pair
    // symbols), the stream-stream interval join, and degree-oriented
    // triangle counting (join-heavy graph workload)
    "q_bpe_bytes_encode", "q_stream_join", "q_triangles",
    // round-9 (cont.): synchronous label propagation (5 vote rounds),
    // integer-micro HITS (4 double-half-step rounds), and the trigram
    // stupid-backoff LM (3 train passes + 5 left joins)
    "q_label_prop", "q_hits", "q_trigram_lm",
    // round-9 (cont.): seeded walk (frontier-filtered rounds) and
    // fixed-round k-core peel (degree agg + two-sided semi-join/round)
    "q_ppr", "q_kcore",
    // round-9 (cont.): Aho-Corasick blocklist scan kernel + two-phase
    // global rank (the no-single-partition-window row_number)
    "q_blocklist", "q_rank_normalize",
    // round-9 (cont.): char-entropy and CDC scan kernels; WordPiece
    // greedy encode (BPE train + trie segmentation of distinct words)
    "q_char_entropy", "q_cdc_chunks", "q_wordpiece", "q_shared_blocks",
    "q_weighted_sample",
    // round-10: optimal lattice decode (Viterbi DP over the BPE
    // vocab), the Bloom seen-screen (distributed bit_or build +
    // broadcast probe), the full-outer stream-stream join, and the
    // salt-replicated skew join
    "q_lattice_encode", "q_bloom_screen", "q_stream_join_full",
    "q_salted_join",
    // round-10 (cont.): scored unigram decode (substring-occurrence
    // cost table + one scored-Viterbi kernel scan), the SCD2 change
    // feed (two scan-side filters + union), and the stream-static
    // as-of enrichment (stateless broadcast interval join)
    "q_unigram_encode", "q_change_feed", "q_stream_asof",
    // round-10 (cont.): token-budget selection (two-phase exact
    // prefix sums, no single-partition window) and winnowing
    // fingerprints (one codegen'd window-argmin scan)
    "q_token_budget", "q_winnow",
    // round-11: the r10 gates that had no timing row (r10 verdict
    // item 6) — media header parsing, the RIFF chunk walk, the MOSS
    // pair report, leakage-safe splits, both WordPiece trainers, and
    // the right-outer stream-stream interval join
    "q_media_meta", "q_wav_chunks", "q_winnow_pairs", "q_leakage_split",
    "q_wordpiece_train", "q_wordpiece_train_dist", "q_stream_join_right",
    // round-11: unigram-LM (SentencePiece) hard-EM training, the
    // soft-EM forward-backward round, and the versioned-dim
    // stream-stream as-of enrichment
    "q_unigram_train", "q_unigram_em", "q_unigram_apply", "q_stream_asof_dim",
    // round-11: product-quantized ANN (fused sub-space Lloyd fits +
    // exact integer ADC) and the IVF-PQ residual composition
    "q_ann_pq", "q_ann_ivfpq",
    // round-12: the persisted-codes ANN serving twins — encode once,
    // store (IVF-PQ: partitioned by coarse cell), answer top-k by
    // READING codes with partition pruning + one broadcast ADC join
    "q_ann_pq_persisted", "q_ann_ivfpq_persisted",
    // round-12: approximate-batch BPE training (the production
    // 30k-merge mode, now oracle-gated end to end), and IVF-PQ with
    // the exact re-rank refine stage over stored codes
    "q_bpe_train_approx", "q_ann_ivfpq_refined", "q_stream_pq_screen",
    "q_ann_ivfpq_knn", "q_ann_ivfpq_incremental", "q_stream_ann_ingest",
    "q_ann_ivfpq_knn_refined", "q_ann_ivfpq_filtered",
    // round-13: the fit/serve split (r12 verdict #3) — the TRAINING
    // jobs are their own timed rows and every serving row reads the
    // memoized artifacts, so the driver's diff watches serving, not
    // ~1.5 s of re-fit noise per row
    "q_ann_pq_fit", "q_ann_ivfpq_fit",
    // round-13: layout maintenance (compaction + delete sync + the
    // per-cell health report) and the cosine-over-normalized recipe
    "q_ann_ivfpq_compacted", "q_ann_ivfpq_repaired", "q_ann_cosine",
    "q_ann_layout_cells",
    // round-13: the recall observability pair (exact ground truth +
    // the ANN-vs-exact report), the re-fit migration it triggers, and
    // the embedding-space contamination screen
    "q_ann_exact_knn", "q_ann_recall", "q_ann_ivfpq_refit",
    "q_semantic_contamination", "q_stream_semantic_screen",
    "q_ann_ivfpq_compact_cells",
    // round-14: incremental (per-cell) delete repair and the
    // maintenance orchestration tick
    "q_ann_ivfpq_repair_cells", "q_ann_ivfpq_maintain")

  /** Omitted from the COMPACT stdout line only (they stay in the
    * full-precision `detail` line and in the total): long-flat
    * sub-second scan-side kernels whose regression would move the
    * compact `value` total anyway. The 84-entry full map measured
    * 1915 chars in r11 and the driver's 2000-char stdout tail cut it
    * mid-entry (`parsed: null` three rounds running) — the stable-core
    * split keeps the parsed artifact's round-over-round diff on the
    * queries that actually move while guaranteeing the line fits.
    */
  val CompactOmit: Set[String] = Set(
    "q_quality_filter", "q_quality_score", "q_char_entropy",
    "q_cdc_chunks", "q_media_meta", "q_wav_chunks", "q_leakage_split",
    "q_weighted_sample", "q_blocklist", "q_ngram_diversity",
    "q_bigram_lm", "q_surprisal", "q_corpus_rarity", "q_dup_spans",
    "q_chunk_docs", "q_tfidf_terms", "q_line_dedup", "q_remove_spans",
    "q_domain_cap", "q_classifier_score", "q_mixture_temp",
    "q_simhash_pairs", "q_winnow_pairs", "q_lattice_encode",
    "q_unigram_encode", "q_token_counts", "q_simhash",
    "q_hll_distinct", "q_quantiles",
    // r13 (r12 verdict #8): the one-shot inline-encode ANN demos are
    // strict output-subsets of fit+persisted rows now in the compact
    // map — rotate them out; the maintenance/recipe gates are
    // composition of already-watched kernels
    "q_ann_pq", "q_ann_ivfpq", "q_ann_ivfpq_compacted",
    "q_ann_ivfpq_repaired", "q_ann_cosine", "q_ann_layout_cells",
    "q_ann_exact_knn", "q_ann_recall", "q_ann_ivfpq_refit",
    "q_semantic_contamination", "q_stream_semantic_screen",
    "q_ann_ivfpq_compact_cells",
    // r14: maintenance compositions of already-watched kernels (the
    // repair/compact/recall primitives each keep their own detail
    // rows; the serving read they end in is the watched persisted row)
    "q_ann_ivfpq_repair_cells", "q_ann_ivfpq_maintain")

  /** The fixed-iteration graph walks: each is 4-8 rounds of one
    * co-partitioned equi-join + one aggregation, so their bench time
    * is Spark's per-round scheduler/barrier floor, not data volume
    * (adjudicated in r9's verdict — the floor amortizes at cluster
    * scale). Split out as a subtotal so round-over-round totals don't
    * re-litigate the floor: `walks_sec` moves only when a walk's
    * round SHAPE regresses, `non_walks_sec` is the number to compare
    * against prior rounds' scan/join/agg workloads.
    */
  val Walks: Set[String] =
    Set("q_pagerank", "q_ppr", "q_kcore", "q_label_prop", "q_hits")

  /** First-run-set spread (max/min over successful runs) above which
    * the query is re-run once: a clean query's back-to-back runs land
    * within ~1.3x of each other, so a 2x spread means the window was
    * contended (or the query is genuinely bimodal — either way, more
    * runs + the recorded spread is the evidence a reader needs).
    */
  val SpreadLimit: Double = 2.0

  private def loadavg1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  private case class QResult(
      name: String,
      times: Seq[Double],          // successful run wall seconds, run order
      errs: Seq[String],           // messages of failed runs (if any)
      loadBefore: Double,
      loadAfter: Double,
      retried: Boolean,
      steady: Seq[Double]) {       // stream steady-state secs (stream gates)
    def median: Double =
      if (times.isEmpty) -1.0
      else times.sorted.apply(times.length / 2)
    def spread: Double =
      if (times.size < 2 || times.min <= 0) 1.0 else times.max / times.min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // per-query MEDIAN of `runs` back-to-back executions (default 3):
    // single-run numbers burned round 6 on host-contention noise.
    // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the set for targeted
    // adjudication runs; SPARK_GRAFT_BENCH_RETRIES caps spread retries.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val retries = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "1").toInt.max(0)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Whole-run load gate (r14: a 32-cpu driver sample that STARTED at
    // loadavg 6.75 — decay from a prior JVM — showed 4-6x phantom
    // regressions on untouched trivial gates, absent at 8 cpus). Wait,
    // bounded, for the 1-minute loadavg to decay below a threshold
    // before timing anything; if the budget runs out, the run is
    // flagged `load_suspect` in BOTH output lines so a contaminated
    // sample cannot masquerade as (or hide) a regression. The wait is
    // OUTSIDE every timed region and before the session/warm-up so our
    // own startup work never counts against the gate.
    val loadLimit = math.max(2.0, cpus.toInt / 8.0)
    val loadWaitBudget =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_LOADWAIT", "120").toInt.max(0)
    var loadWaited = 0
    while (loadavg1() > loadLimit && loadWaited < loadWaitBudget) {
      Thread.sleep(2000); loadWaited += 2
    }
    val loadSuspect = loadavg1() > loadLimit
    if (loadSuspect)
      System.err.println(f"[bench] host still loaded (${loadavg1()}%.2f > " +
        f"$loadLimit%.1f) after $loadWaited s — run flagged load_suspect")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries
    // fault-injection hook for verifying the artifact's error path:
    // SPARK_GRAFT_BENCH_FAULT=<name> makes that query throw, and the
    // output JSON must show err != null for it (never a timing)
    val fault = sys.env.get("SPARK_GRAFT_BENCH_FAULT")
    // warm the JVM/parquet footer cache once so per-query numbers
    // measure execution, not first-touch classloading; non-fatal — a
    // broken flagship query must surface as ITS err field, not kill
    // the artifact
    try queries("q1_pricing_summary")(spark, sfDir).count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up failed: ${e.getMessage}") }
    val set = only match {
      case Some(o) => Headline.filter(o.contains)
      case None => Headline
    }
    // pre-build the shared ANN artifacts (one fit+encode per sf dir):
    // serving rows time SERVING — the fit cost has its own rows
    // (q_ann_pq_fit / q_ann_ivfpq_fit) and must not contaminate the
    // first run of whichever serving gate touches the memo first.
    // Skipped when a BENCH_ONLY subset selects no artifact consumer
    // (r13 ADVICE): a run restricted to non-ANN rows should not pay
    // two fit+encode jobs in warm-up.
    val needsAnnWarm = set.exists(n =>
      n.startsWith("q_ann_") || n == "q_semantic_contamination" ||
        n == "q_stream_semantic_screen" || n == "q_stream_pq_screen" ||
        n == "q_stream_ann_ingest")
    if (needsAnnWarm)
      try SparkEntry.warmAnnArtifacts(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] ANN warm-up failed: ${e.getMessage}") }
    // a Headline name with no queries entry must be VISIBLE, not
    // silently skipped — a typo'd or renamed gate would otherwise
    // vanish from the artifact and read as "nothing regressed"
    val missing = set.filterNot(queries.contains)
    val wall0 = System.nanoTime()
    val loadStart = loadavg1()

    def runSet(name: String, n: Int): (Seq[Double], Seq[String], Seq[Double]) = {
      val fn = queries(name)
      val ts = Seq.newBuilder[Double]
      val es = Seq.newBuilder[String]
      val st = Seq.newBuilder[Double]
      var i = 0
      while (i < n) {
        val t0 = System.nanoTime()
        try {
          if (fault.contains(name))
            throw new IllegalStateException("injected fault (SPARK_GRAFT_BENCH_FAULT)")
          fn(spark, sfDir).count()
          ts += (System.nanoTime() - t0) / 1e9
          if (name == "q_stream_window" && SparkEntry.lastStreamBatchMs >= 0)
            st += SparkEntry.lastStreamBatchMs / 1e3
        } catch {
          // a failed run contributes an err, NEVER a timing: timing the
          // failure latency made a broken query look like a normal
          // number in round 7's artifact
          case e: Throwable =>
            val msg = (e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("")).take(300)
            es += msg
            System.err.println(s"[bench] $name run ${i + 1}/$n FAILED: $msg")
        }
        i += 1
      }
      (ts.result(), es.result(), st.result())
    }

    val results: Seq[QResult] = set.filter(queries.contains).map { name =>
      val l0 = loadavg1()
      var (ts, es, st) = runSet(name, runs)
      var attempt = 0
      var retried = false
      def spreadOf(xs: Seq[Double]): Double =
        if (xs.size < 2 || xs.min <= 0) 1.0 else xs.max / xs.min
      while (attempt < retries && es.isEmpty && spreadOf(ts) > SpreadLimit) {
        retried = true
        val (ts2, es2, st2) = runSet(name, runs)
        ts = ts ++ ts2; es = es ++ es2; st = st ++ st2
        attempt += 1
      }
      // session hygiene BETWEEN queries (outside every timed region):
      // pin-returning operators (walks, containment) register their
      // result's cached blocks for the caller to unpin, but a bench
      // gate's result dies with the count — 3+ runs per gate times a
      // hundred gates otherwise accumulate session-lifetime blocks
      // whose GC pressure taxes every LATER query. Bench runs gates
      // sequentially, so no registered result is awaiting
      // materialization here and the backstop is safe by its contract.
      graft.functions.Pins.releaseAll(spark)
      QResult(name, ts, es, l0, loadavg1(), retried, st)
    }

    val loadEnd = loadavg1()
    val wallSec = (System.nanoTime() - wall0) / 1e9

    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\r\\n\\t]", " ") + "\""
    // `queries` stays the backward-compatible name->median map the
    // driver's round-over-round comparison reads; everything a judge
    // needs to adjudicate contention lives in `detail`. One builder
    // for both renderings (full-precision detail line, 2-decimal
    // compact line) so the two maps can never silently disagree.
    def queriesMap(decimals: Int, compact: Boolean): String = {
      val rs = if (compact) results.filterNot(r => CompactOmit(r.name)) else results
      def key(n: String) = jstr(if (compact) n.stripPrefix("q_") else n)
      (rs.map { r =>
        key(r.name) + ":" + s"%.${decimals}f".format(r.median)
      } ++ rs.filter(_.steady.nonEmpty).map { r =>
        val m = r.steady.sorted.apply(r.steady.length / 2)
        key(r.name + "_steady") + ":" + s"%.${decimals}f".format(m)
      }).mkString("{", ",", "}")
    }
    val qs = queriesMap(3, compact = false)
    val detail = results.map { r =>
      val runsArr = r.times.map(t => f"$t%.3f").mkString("[", ",", "]")
      val errField =
        if (r.errs.isEmpty) "null" else r.errs.map(jstr).mkString("[", ",", "]")
      val steadyField =
        if (r.steady.isEmpty) ""
        else ",\"steady\":" + r.steady.map(t => f"$t%.3f").mkString("[", ",", "]")
      jstr(r.name) + ":{" +
        f""""median":${r.median}%.3f,"runs":$runsArr,"spread":${r.spread}%.2f,""" +
        f""""load_before":${r.loadBefore}%.2f,"load_after":${r.loadAfter}%.2f,""" +
        s""""retried":${r.retried},"err":$errField""" + steadyField + "}"
    }.mkString("{", ",", "}")
    val total = results.map(r => math.max(r.median, 0.0)).sum
    val walksSec = results.filter(r => Walks.contains(r.name))
      .map(r => math.max(r.median, 0.0)).sum
    val nonWalksSec = total - walksSec
    val nErr = results.count(_.errs.nonEmpty)
    val missingField =
      if (missing.isEmpty) "[]" else missing.map(jstr).mkString("[", ",", "]")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$runs,""" +
      f""""queries":$qs,"detail":$detail,"n_err":$nErr,""" +
      f""""walks_sec":$walksSec%.3f,"non_walks_sec":$nonWalksSec%.3f,""" +
      f""""missing":$missingField,""" +
      f""""loadavg_start":$loadStart%.2f,"loadavg_end":$loadEnd%.2f,""" +
      s""""load_suspect":$loadSuspect,"load_wait_sec":$loadWaited,""" +
      f""""wall_sec":$wallSec%.1f,"sf":"$sfDir"}""")
    // The driver's artifact keeps only the LAST ~2000 chars of stdout;
    // the self-adjudicating line above outgrew that in r8-r11 and the
    // driver recorded `parsed: null` every round (r11: the full
    // 84-entry 2-decimal map + sbt's "[info] " prefix grazed the
    // window and the map was cut mid-entry). This final COMPACT line
    // budgets ≤1700 chars: no `detail`, the stable-core queries map
    // ([[CompactOmit]] — the omitted kernels keep full-precision rows
    // in the detail line above), keys with the constant "q_" prefix
    // stripped, and 3-decimal medians (2 decimals hid sub-10 ms moves
    // from the driver's round-over-round diff, r11 ADVICE).
    val qsCompact = queriesMap(3, compact = true)
    // walks/non_walks/sf stay OUT of the compact line — they live in
    // the detail line above; `missing` is dropped when empty (every
    // byte here competes with the queries map for the window)
    val missingCompact =
      if (missing.isEmpty) "" else s""","missing":$missingField"""
    // load_suspect appears in the compact line only when TRUE (every
    // byte competes with the queries map for the 2000-char window)
    val suspectCompact = if (loadSuspect) ""","load_suspect":true""" else ""
    val compact =
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","n_err":$nErr""" +
      f"""$missingCompact$suspectCompact,"queries":$qsCompact}"""
    if (compact.length > 1700)
      System.err.println(s"[bench] compact line ${compact.length} chars — " +
        "over the 1700-char budget for the driver's 2000-char tail window " +
        "(sbt prefix + trailer eat the rest); move entries to CompactOmit")
    // stop BEFORE the final compact line: the driver parses the LAST
    // line of the captured output, and a shutdown-time log line landing
    // after it would break the parse (the r11-r14 artifacts all died on
    // exactly that class of trailer)
    try spark.stop()
    catch { case e: Throwable =>
      System.err.println(s"[bench] spark.stop failed: ${e.getMessage}") }
    println(compact)
  }
}
