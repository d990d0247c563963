package graft

/** Plan-quality assertions over EVERY gate query — the ScalaTest
  * promotion of the `Plans` inspection main, so a plan regression
  * (a cartesian sneaking in, a filter no longer reaching the scan, a
  * dim join falling back to sort-merge) turns the suite red instead of
  * only flagging in a manual run. Plans are built at sf0.001; building
  * a DataFrame never executes the distributed query (driver-side prep
  * in some gates does run, on the tiny SF).
  */
class PlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // streaming gates execute a full (if tiny) streaming job just to
  // BUILD the result frame; their plan properties are covered by the
  // dedicated streaming specs
  private val skip = Set(
    "q_stream_upsert", "q_stream_window", "q_stream_sessionize", "q_stream_enrich",
    "q_stream_quality")

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.filterNot { case (n, _) => skip(n) }.map { case (n, fn) =>
      n -> fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    }

  test("no gate query plans a CartesianProduct — embed/ANN queries included") {
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty, s"cartesian in: ${offenders.mkString(", ")}")
  }

  test("MQL/date filters are pushed down to the parquet scan") {
    for (n <- Seq("q_find_mql", "q_find_in_notin", "q_find_sort_limit")) {
      val p = plans(n)
      assert(p.contains("PushedFilters: ["), s"$n: no pushdown section")
      assert(!p.contains("PushedFilters: []"), s"$n: empty pushdown")
    }
  }

  test("projection prunes the parquet read schema") {
    // token counting must read only (doc_id, text) — not lang/source
    val p = plans("q_token_counts")
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(readSchemas.contains("doc_id"), p)
    assert(!readSchemas.contains("lang"), s"unpruned scan:\n$readSchemas")
  }

  test("dimension joins broadcast; fact-fact joins do not force broadcast") {
    assert(plans("q5_nation_revenue").contains("BroadcastHashJoin"))
    assert(!plans("q5_nation_revenue").contains("SortMergeJoin"))
    // q3 joins lineitem (fact) to orders (fact): the initial plan may
    // keep a shuffle join (AQE converts at runtime for small SF) but
    // the customer dim must broadcast
    assert(plans("q3_top_orders").contains("BroadcastHashJoin"))
  }

  test("scan-heavy aggregation stays inside whole-stage codegen") {
    // the pre-execution AQE plan hides codegen spans — run the (tiny)
    // query, then inspect the finalized physical plan
    for (n <- Seq("q1_pricing_summary", "q_token_counts", "q_distinct_count")) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // "*(N) Operator" is the WholeStageCodegen span marker in the
      // simple plan rendering
      assert(p.contains("*("), s"$n left codegen:\n$p")
    }
  }

  test("TextStatsExpr stays inside whole-stage codegen (no fallback barrier)") {
    // CollapseCodegenStages refuses WSCG for any plan containing a
    // CodegenFallback expression — so the operator carrying text_stats
    // must itself render with the *(N) span marker, not just SOME
    // operator in the plan
    for (n <- Seq("q_text_stats", "q_quality_score")) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      // AQE's rendering appends an "== Initial Plan ==" section whose
      // operators never carry span markers — assert on the final plan only
      val full = df.queryExecution.executedPlan.toString
      val p = full.split("== Initial Plan ==")(0)
      val statsLines = p.linesIterator.filter(_.contains("text_stats")).toSeq
      assert(statsLines.nonEmpty, s"$n: no text_stats in plan\n$p")
      statsLines.foreach { l =>
        assert(l.contains("*("), s"$n: text_stats outside a codegen span:\n$l\n\n$p")
      }
    }
  }

  test("BpeEncodeExpr stays inside whole-stage codegen") {
    val df = SparkEntry.queries("q_bpe_encode")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val lines = p.linesIterator.filter(_.contains("bpe_encode")).toSeq
    assert(lines.nonEmpty && lines.forall(_.contains("*(")), p)
  }

  test("MinHashSigExpr stays inside whole-stage codegen") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        functions.DedupExpressions.minhashSig(
          org.apache.spark.sql.functions.col("text"), 8).as("sig"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val lines = p.linesIterator.filter(_.contains("minhash_sig")).toSeq
    assert(lines.nonEmpty && lines.forall(_.contains("*(")), p)
  }

  test("LSH near-dup pair generation joins on band keys (equi-join, no theta join)") {
    val p = plans("q_embed_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), "pair gen degenerated to NL join")
    assert(p.contains("Join") || p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
  }

  test("qualityFilter is a pure projection: the only Exchange is the output sort") {
    // the r5 QualityStatsExpr fusion removed the explode + two shuffled
    // aggregations + join-back; a reappearing Exchange/Join/Generate is
    // a regression to the corpus-shuffling formulation
    val p = plans("q_quality_filter")
    // count tree nodes ("+- Exchange (N)"), not their detail lines
    val exchanges = p.linesIterator.count(l =>
      l.contains("- Exchange") && !l.contains("BroadcastExchange"))
    assert(exchanges == 1, s"expected only the ORDER BY exchange:\n$p")
    assert(!p.contains("Generate") && !p.contains("Join"),
      s"qualityFilter re-grew a corpus shuffle stage:\n$p")
  }

  test("shingle-pair operators shuffle md5 longs, never n-gram text") {
    // ShingleSetExpr keys: the explode output entering the exchanges is
    // array<long>-derived; a concat/slice of token strings in the plan
    // means the interpreted string formulation came back
    locally {
      val p = plans("q_ngram_jaccard")
      assert(p.contains("shingle_set"), s"jaccard no longer uses ShingleSetExpr:\n$p")
      assert(!p.contains("array_join(slice("),
        s"jaccard rebuilds shingle STRINGS in the plan:\n$p")
      // r8 single-pass shape: doc sizes ride the explode as struct
      // fields, so the kernel appears in exactly ONE scan-side project
      // — a second occurrence means the per-doc size join (two extra
      // corpus-keyed shuffles + a full re-tokenize) came back
      val kernelSites = "shingle_set\\(".r.findAllIn(p).size
      assert(kernelSites == 1,
        s"jaccard evaluates ShingleSetExpr $kernelSites times (want 1):\n$p")
    }
    locally {
      // r9 PPJoin shape: the kernel runs ONCE inside the eager
      // doc-shingle pin, so the visible plan must hold ZERO kernel
      // sites (a reappearing one means a consumer re-grew a lazy
      // kernel branch) and read the pinned table via scans
      val p = plans("q_containment")
      assert(!p.contains("shingle_set("),
        s"containment re-evaluates the kernel outside the pin:\n$p")
      assert(!p.contains("array_join(slice("),
        s"containment rebuilds shingle STRINGS in the plan:\n$p")
      assert(p.contains("array_intersect"),
        s"containment lost its exact verification stage:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"containment candidate join degenerated:\n$p")
    }
    val sp = plans("q_dup_spans")
    assert(sp.contains("shingle_pos_hashes"), s"dup_spans lost its kernel:\n$sp")
    assert(!sp.contains("lead("), s"dup_spans re-grew the lead() window:\n$sp")
  }

  test("LM scorers tokenize the corpus the minimum number of times (r8 pins)") {
    // unigramSurprisal: counts table pinned -> the visible plan holds
    // ONE kernel site (the join-back scan); a second means the pinned
    // counts re-grew a lazy branch (the 3-scans-of-the-corpus bug)
    val su = "shingle_pos_hashes\\(".r.findAllIn(plans("q_surprisal")).size
    assert(su == 1, s"q_surprisal re-tokenizes: $su kernel sites (want 1)")
    // bigramLmScore: c1/c2 pinned -> exactly the scored side's two
    // kernels (uni + bi arrays in one scan project); more means a
    // count-table consumer re-tokenized train, or the old size(_u)>0
    // prefilter duplicate came back
    val bi = "shingle_pos_hashes\\(".r.findAllIn(plans("q_bigram_lm")).size
    assert(bi == 2, s"q_bigram_lm re-tokenizes: $bi kernel sites (want 2)")
  }

  test("tfidfTopTerms ranks via the bounded bottom-k agg: no window, no term strings") {
    // r6 moved term text out of the rank order (70s/1M docs when the
    // windowspec shuffled strings); r8 removed the window entirely —
    // the per-doc top-k is the buffer-capped bottom_k_by aggregate on
    // (-score_nano, _h), so a degenerate doc can never sort a whole
    // partition on one reducer. Term text still joins on only the
    // surviving top-k rows.
    val p = plans("q_tfidf_terms")
    assert(p.contains("bottom_k_by"), s"tfidf lost its bounded top-k agg:\n$p")
    assert(!p.contains("Window"), s"tfidf re-grew the row_number window:\n$p")
    val aggArgs = p.linesIterator.filter(_.contains("bottom_k_by")).toSeq
    assert(aggArgs.forall(l => !l.contains("term")),
      s"tfidf ranks on term text again:\n${aggArgs.mkString("\n")}")
  }

  test("chunkDocuments is scan-side: the only Exchange is the output sort") {
    val p = plans("q_chunk_docs")
    val exchanges = p.linesIterator.count(l =>
      l.contains("- Exchange") && !l.contains("BroadcastExchange"))
    assert(exchanges == 1, s"chunking re-grew a corpus shuffle:\n$p")
    assert(p.contains("chunk_docs"), s"chunking lost its kernel:\n$p")
    assert(!p.contains("Window"), s"chunking re-grew the per-doc count window:\n$p")
  }

  // walks the pre-AQE physical plan and returns the column names each
  // shuffle exchange moves — string plans can't distinguish an
  // exchange's payload from scan-side projections, the tree can.
  // Broadcast joins are disabled while planning: at sf0.001 every join
  // side fits the threshold and the join exchanges this test exists to
  // inspect would not be planned at all (at scale they are SMJs).
  private def shuffleOutputs(build: => org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    shuffleOutputsTyped(build).map(_.map(_._1))

  private def shuffleOutputsTyped(
      build: => org.apache.spark.sql.DataFrame): Seq[Seq[(String, org.apache.spark.sql.types.DataType)]] = {
    // AQE off as well: exchanges are inserted by EnsureRequirements
    // (so sparkPlan has none), and under AQE they hide inside the
    // adaptive wrapper executedPlan.collect cannot descend into
    val prev = Seq("spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
      .map(k => k -> spark.conf.get(k))
    prev.foreach { case (k, _) => spark.conf.set(k, if (k.endsWith("enabled")) "false" else "-1") }
    try {
      build.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.child.output.map(a => a.name -> a.dataType)
      }
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("bm25TopDocs runs the tokenizer kernel ONCE; stats pass is count-only") {
    // r6 ran the full TokenTfExpr kernel over the corpus twice (the
    // second time just for N/sum(dl)). Now: exactly two scans — the
    // scoring scan carrying query_tf, and the corpus-stats scan
    // carrying only the count kernel (normalize+count, no hashing).
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = functions.TextFunctions.bm25TopDocs(
        docs, "doc_id", "text", Seq("join", "window", "stream"), k = 5)
        .queryExecution.executedPlan
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s.toString
      }
      assert(scans.size == 2, s"expected two documents scans, got ${scans.size}")
      val full = plan.toString
      assert("query_tf\\(".r.findAllIn(full).size == 1,
        "the query_tf tokenizer kernel must be evaluated at exactly one site " +
          "(a second site = an inferred filter re-running it per row)")
      assert(full.contains("norm_token_count("),
        "the corpus-stats pass must ride the count-only kernel")
      assert(!full.contains(" token_tf("),
        "the full TokenTfExpr kernel must not appear in the bm25 plan at all")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("bigramLmScore shuffles hash keys and counts only — no token text") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val shuffles = shuffleOutputsTyped(
      functions.TextFunctions.bigramLmScore(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0),
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1),
        "doc_id", "text"))
    assert(shuffles.nonEmpty)
    for (cols <- shuffles; (n, t) <- cols)
      assert(t != org.apache.spark.sql.types.StringType,
        s"bigramLmScore exchange carries a string column: $n")
  }

  test("trigramLmScore shuffles hash keys and counts only — no token text") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val shuffles = shuffleOutputsTyped(
      functions.TextFunctions.trigramLmScore(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0),
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1),
        "doc_id", "text"))
    assert(shuffles.nonEmpty)
    for (cols <- shuffles; (n, t) <- cols)
      assert(t != org.apache.spark.sql.types.StringType,
        s"trigramLmScore exchange carries a string column: $n")
  }

  test("ngramDiversity pre-aggregates (group, hash) — no gram text in any exchange") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val shuffles = shuffleOutputsTyped(
      functions.TextFunctions.ngramDiversity(docs, "lang", "text", n = 2))
    assert(shuffles.nonEmpty)
    // the only strings allowed through are the GROUP column values —
    // gram text must stay scan-side (hash-keyed kernel)
    for (cols <- shuffles; (n, t) <- cols
         if t == org.apache.spark.sql.types.StringType)
      assert(n == "lang", s"unexpected string column in exchange: $n")
  }

  test("simhashPairs table exchanges carry (tbl, key, id) only — never text or sims") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val shuffles = shuffleOutputsTyped(
      functions.Dedup.simhashPairs(docs, "doc_id", "text"))
    assert(shuffles.nonEmpty, "expected table-keyed exchanges in simhashPairs")
    val blockEx = shuffles.filter(_.exists(_._1 == "tbl"))
    assert(blockEx.nonEmpty, "expected a (tbl, key)-keyed exchange")
    // the candidate stage shuffles the two narrow keys plus the
    // bounded-collect PARTIAL buffer (map-side combine of ids) — the
    // 8-byte fingerprint attaches AFTER pair dedup, and document text
    // must never enter any exchange
    for (cols <- blockEx)
      assert(cols.map(_._1).toSet.subsetOf(Set("tbl", "key", "id", "buf")),
        s"table exchange payload grew: $cols")
    for (cols <- shuffles; (n, t) <- cols)
      assert(t != org.apache.spark.sql.types.StringType,
        s"an exchange carries a string column: $n")
  }

  test("minhashPairs band exchanges carry (band, id) only — no signature payload") {
    // the r6 reshape: sigs (~520 B/doc) attach AFTER candidate dedup;
    // a sig column inside any band-keyed exchange is the 6.5 GB/1M-doc
    // shuffle coming back (curation-rehearsal finding)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val banded = shuffleOutputs(
        functions.Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5))
      .filter(_.contains("band"))
    assert(banded.nonEmpty, "expected band-keyed exchanges in minhashPairs")
    for (cols <- banded)
      assert(!cols.exists(_.startsWith("sig")),
        s"band exchange carries a signature column: $cols")
  }

  test("removeBoilerplateLines shuffles line keys and positions, never line text") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val shuffles = shuffleOutputs(
      functions.Curation.removeBoilerplateLines(docs, "doc_id", "text"))
    assert(shuffles.nonEmpty, "expected key/position exchanges in removeBoilerplateLines")
    for (cols <- shuffles)
      assert(!cols.contains("_bp_line"),
        s"an exchange carries raw line text: $cols")
    val p = functions.Curation.removeBoilerplateLines(docs, "doc_id", "text")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("drop_lines"), s"rebuild lost the DropLinesExpr kernel:\n$p")
  }

  test("dedupLines shuffles line keys and positions, never line text") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = functions.Curation.dedupLines(docs, "doc_id", "text")
    val shuffles = shuffleOutputs(out)
    assert(shuffles.nonEmpty, "expected key/position exchanges in dedupLines")
    for (cols <- shuffles)
      assert(!cols.contains("_ld_line"),
        s"an exchange carries raw line text: $cols")
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("drop_lines"), s"rebuild lost the DropLinesExpr kernel:\n$p")
  }

  test("removeDuplicatedSpans shuffles gram hashes and positions, never gram text") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = functions.Dedup.removeDuplicatedSpans(docs, "doc_id", "text")
    val shuffles = shuffleOutputsTyped(out)
    assert(shuffles.nonEmpty, "expected hash/position exchanges in removeDuplicatedSpans")
    // the gram-keyed stages (df aggregation, covered-token semi-join)
    // must move ints/longs only — a StringType there is gram/token
    // text coming back; the final doc-granularity join legitimately
    // carries the normalized doc text once (same contract as
    // removeBoilerplateLines)
    val gramKeyed = shuffles.filter(_.exists(_._1 == "_rs_h"))
    assert(gramKeyed.nonEmpty, "expected gram-hash-keyed exchanges")
    for (cols <- gramKeyed; (c, t) <- cols)
      assert(!t.isInstanceOf[org.apache.spark.sql.types.StringType],
        s"gram-keyed exchange carries a string column $c: $cols")
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("drop_lines") && p.contains("shingle_pos_hashes"),
      s"rebuild lost a kernel:\n$p")
  }

  test("classifier train+score shuffles carry hashed buckets and sums, never text") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val w = functions.Curation.trainTokenClassifier(
      docs.filter(col("lang") === "en"), "text",
      docs.filter(col("lang") === "zh"), "text", buckets = 4096)
    val shuffles = shuffleOutputsTyped(
      functions.Curation.classifierScore(docs, "doc_id", "text", w, buckets = 4096))
    assert(shuffles.nonEmpty, "expected bucket/sum exchanges in classifierScore")
    for (cols <- shuffles; (c, t) <- cols)
      assert(!t.isInstanceOf[org.apache.spark.sql.types.StringType],
        s"classifier exchange carries a string column $c: $cols")
  }

  test("capPerDomain aggregates with the bounded bottom-k — no Window, no id window sort") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("domain", col("source"))
    val out = functions.Curation.capPerDomain(docs, "doc_id", "domain", cap = 5)
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("bottom_k_by"), s"cap lost its bounded aggregate:\n$p")
    assert(!p.contains("Window"), s"cap re-grew a per-domain window sort:\n$p")
  }

  test("r9 scan kernels stay inside whole-stage codegen: cdc_chunks, wordpiece, char_entropy") {
    // same contract BlocklistSpec pins for the AC kernel: the operator
    // CARRYING the kernel must render with a *(N) span — a
    // CodegenFallback expression would bar its whole stage from WSCG
    for ((gate, marker) <- Seq(
        ("q_cdc_chunks", "cdc_chunks"),
        ("q_char_entropy", "char_entropy"))) {
      val df = SparkEntry.queries(gate)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val lines = p.linesIterator.filter(_.contains(marker)).toSeq
      assert(lines.nonEmpty, s"$gate: no $marker operator in plan\n$p")
      lines.foreach(l =>
        assert(l.contains("*("), s"$gate: $marker outside a codegen span:\n$l\n\n$p"))
    }
    // the q_wordpiece gate folds the kernel into a HashAggregate's
    // (unprinted) result expressions — pin it on a direct projection,
    // the BlocklistSpec pattern (range-derived so nothing constant-folds)
    import org.apache.spark.sql.functions.{col, concat, lit}
    val wp = spark.range(10)
      .select(concat(lit("word"), col("id")).as("w"))
      .select(functions.WordpieceExpr(
        col("w"), Seq("word", "##0", "##1", "##2", "##3", "##4",
          "##5", "##6", "##7", "##8", "##9")).as("p"))
    wp.collect()
    val wpp = wp.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val wpl = wpp.linesIterator.filter(_.contains("wordpiece")).toSeq
    assert(wpl.nonEmpty, s"no wordpiece operator in plan\n$wpp")
    wpl.foreach(l =>
      assert(l.contains("*("), s"wordpiece outside a codegen span:\n$l\n\n$wpp"))
    // r10: the lattice decoder rides the same reference-obj contract
    val lt = spark.range(10)
      .select(concat(lit("word"), col("id")).as("w"))
      .select(functions.LatticeEncodeExpr(
        col("w"), Seq("word", "0", "1", "2", "3", "4",
          "5", "6", "7", "8", "9", "word0")).as("p"))
    lt.collect()
    val ltp = lt.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val ltl = ltp.linesIterator.filter(_.contains("lattice_encode")).toSeq
    assert(ltl.nonEmpty, s"no lattice_encode operator in plan\n$ltp")
    ltl.foreach(l =>
      assert(l.contains("*("), s"lattice_encode outside a codegen span:\n$l\n\n$ltp"))
    // r11: the soft-EM expectation kernel and the batch merge kernels
    // ride the same contract — a kernel falling out of whole-stage
    // codegen is the silent 10x the r6 HOF tax taught us to pin
    val le = spark.range(10)
      .select(concat(lit("word"), col("id")).as("w"))
      .select(functions.LatticeExpectExpr(
        col("w"), IndexedSeq("word", "0", "1", "2", "3", "4",
          "5", "6", "7", "8", "9"), Seq.fill(11)(math.log(1.0 / 11))).as("p"))
    le.collect()
    val lep = le.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val lel = lep.linesIterator.filter(_.contains("lattice_expect")).toSeq
    assert(lel.nonEmpty, s"no lattice_expect operator in plan\n$lep")
    lel.foreach(l =>
      assert(l.contains("*("), s"lattice_expect outside a codegen span:\n$l\n\n$lep"))
    val bt = spark.range(10)
      .select(org.apache.spark.sql.functions.split(
        concat(lit("a b a"), col("id")), " ").as("syms"))
      .select(functions.BpeEncodeExpr.batchStep(col("syms"),
        Seq(("a", "b", "ab"))).as("s1"),
        functions.BpeEncodeExpr.batchDelta(col("syms"),
          Seq(("a", "b", "ab")), withSymbols = true).as("d1"))
    bt.collect()
    val btp = bt.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    for (k <- Seq("bpe_batch_step", "bpe_batch_delta")) {
      val ls = btp.linesIterator.filter(_.contains(k)).toSeq
      assert(ls.nonEmpty, s"no $k operator in plan\n$btp")
      ls.foreach(l => assert(l.contains("*("), s"$k outside a codegen span:\n$l\n\n$btp"))
    }
  }

  test("pqAdcTopK is one scan-side projection into a TakeOrdered — no join, no wide shuffle") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (0 until 40).map(i =>
      (i.toLong, (0 until 8).map(_ => (rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    val scale = functions.Similarity.kmeansGlobalScale(df, "embedding")
    val pq = functions.Similarity.pqFitInt8(df, "vec_id", "embedding",
      m = 2, k = 2, iters = 1, scale = scale)
    val top = functions.Similarity.pqAdcTopK(df, "vec_id", "embedding",
      (0 until 8).map(_ => 0.1f), k = 5, scale = scale, codebooks = pq)
    top.collect()
    val p = top.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("TakeOrderedAndProject"),
      s"ADC top-k must be a distributed TakeOrdered:\n$p")
    assert(!p.contains("Join"), s"ADC scoring must not join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"ADC scoring must not shuffle beyond the TakeOrdered merge:\n$p")
  }

  test("unigramTrain rounds are one lattice-kernel scan each (no per-round re-seed)") {
    // the seed explodes substrings ONCE; every EM round afterwards is
    // one codegen lattice_encode scan + a key-sized fold — a second
    // substring explode means the seeding regressed into the loop
    val plansSeen = capturePlans { s2 =>
      import s2.implicits._
      val docs = (1 to 30).map(i => (i.toLong, "abab bab abba caba"))
        .toDF("doc_id", "text")
      functions.TextFunctions.unigramTrain(docs, "text",
        vocabSize = 8, maxTokenLen = 3, seedSize = 16, emRounds = 3).collect()
    }
    assert(plansSeen.nonEmpty, "listener captured no plans")
    val seedExplodes = plansSeen.count(_.contains("substring(word"))
    assert(seedExplodes <= 1,
      s"substring seed exploded $seedExplodes times — rounds must be lattice scans only")
    assert(plansSeen.count(_.contains("lattice_encode")) >= 3,
      "expected one lattice_encode scan per EM round")
    for (p <- plansSeen)
      assert(!p.contains("CartesianProduct"), s"cartesian in a train round:\n$p")
  }

  test("salted join: the salt rides the join keys — hot keys fan out over reducers") {
    val df = SparkEntry.queries("q_salted_join")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the equi-join must key on (okey, _salt): a plan where the salt
    // fell out of the join condition silently reverts to one reducer
    // per hot key — the exact regression the operator exists to stop
    val joinLines = p.linesIterator
      .filter(l => l.contains("Join") && l.contains("okey")).toSeq
    assert(joinLines.nonEmpty, s"no okey join in the salted-join plan:\n$p")
    assert(joinLines.exists(_.contains("_salt")),
      s"salt missing from the join keys:\n${joinLines.mkString("\n")}\n\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"salted join degenerated:\n$p")
  }

  test("bloom screen: filter rides a broadcast, probe never shuffles wide rows") {
    val df = SparkEntry.queries("q_bloom_screen")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"),
      s"bloom probe lost its broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"bloom probe degenerated to a heavy join:\n$p")
  }

  /** Run `work` on a FRESH child session (own listenerManager — other
    * suites' queries can't pollute the capture) and return every
    * executed plan its actions produced, after draining the async
    * listener bus to quiescence.
    */
  private def capturePlans(
      work: org.apache.spark.sql.SparkSession => Unit): Seq[String] = {
    val s2 = spark.newSession()
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        captured.add(qe.executedPlan.toString)
      override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    s2.listenerManager.register(listener)
    try {
      work(s2)
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 5 && waited < 100) {
        Thread.sleep(100)
        waited += 1
        if (captured.size == last) stable += 1
        else { stable = 0; last = captured.size }
      }
      scala.jdk.CollectionConverters.CollectionHasAsScala(captured).asScala.toSeq
    } finally s2.listenerManager.unregister(listener)
  }

  test("graph walks: every per-round job is equi-join-only, hash-keyed on node ids, off pinned RDDs") {
    val plansSeen = capturePlans { s2 =>
      import s2.implicits._
      val rnd = new scala.util.Random(11)
      val edges = (1 to 500).map(_ =>
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)).toDF("src", "dst")
      functions.Graphs.pageRank(edges, "src", "dst", iterations = 3, unit = "nano").collect()
      functions.Graphs.hits(edges, "src", "dst", iterations = 2).collect()
      functions.Graphs.labelPropagation(edges, "src", "dst", iterations = 2).collect()
    }
    assert(plansSeen.nonEmpty, "listener captured no plans")
    val joinPlans = plansSeen.filter(_.contains("Join"))
    assert(joinPlans.nonEmpty, "no per-round join plans captured")
    for (p <- plansSeen)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"non-equi join in a walk round:\n$p")
    // hash exchanges inside round joins key on a graph id column only
    // — a payload-carrying composite key would widen the shuffle
    for (p <- joinPlans; l <- p.linesIterator
         if l.contains("Exchange hashpartitioning")) {
      assert(l.contains("src") || l.contains("dst") || l.contains("node"),
        s"walk exchange keyed off a non-id column:\n$l")
    }
    // pinned-edge reuse: round joins scan the pinned RDD, not a
    // re-derived source subtree
    assert(joinPlans.exists(_.contains("ExistingRDD")),
      "walk rounds do not reuse pinned edge/rank RDDs")
  }

  test("packSequences executes no single-partition exchange in any phase") {
    // the result-plan variant of this pin went vacuous once the result
    // was pinned (a LogicalRDD scan shows nothing) — capture the
    // ACTUAL phase jobs instead; the only legal Window partitions by
    // pack_id, never a global order
    val plansSeen = capturePlans { s2 =>
      import org.apache.spark.sql.functions.{col, lit}
      val docs = s2.range(20000).toDF("doc_id").withColumn("n", lit(10L))
      functions.Curation.packSequences(
        docs, col("n"), 100L, Seq(col("doc_id")), numPartitions = 8).collect()
    }
    assert(plansSeen.nonEmpty, "listener captured no plans")
    for (p <- plansSeen)
      assert(!p.contains("Exchange SinglePartition"),
        s"packing funneled through one partition:\n$p")
  }

  test("bpeTrainDistributed explodes occurrence-level pairs exactly once (the seed)") {
    // incremental training's whole point: after the one seed explode,
    // every round touches only delta pairs (bpe_pair_delta) and the
    // distinct-pair table — a second arrays_zip occurrence explode
    // means the full-rescan shape regressed
    val plansSeen = capturePlans { s2 =>
      import s2.implicits._
      val docs = (1 to 40).map(i => (i.toLong, "abab bab abba caba")).toDF("doc_id", "text")
      functions.TextFunctions.bpeTrainDistributed(docs, "text", numMerges = 4).collect()
    }
    assert(plansSeen.nonEmpty, "listener captured no plans")
    val seedExplodes = plansSeen.count(p =>
      p.contains("zip_with") || p.contains("arrays_zip"))
    assert(seedExplodes <= 1,
      s"occurrence-level pair explode ran $seedExplodes times — rounds must be delta-only")
    assert(plansSeen.exists(_.contains("bpe_batch_delta")),
      "no batch-delta-kernel round plan captured")
    // r11: rounds carry WHOLE BATCHES through the batch kernels — a
    // single-merge kernel reappearing means the job-per-merge round
    // floor regressed
    assert(!plansSeen.exists(p => p.contains("bpe_pair_delta(") ||
      p.contains("bpe_merge_step(")),
      "single-merge round kernels regressed (batching bypassed)")
    for (p <- plansSeen)
      assert(!p.contains("CartesianProduct"), s"cartesian in a train round:\n$p")
  }

  test("wordpieceTrainDistributed: one seed explode; rounds are delta-kernel + key-sized joins") {
    val plansSeen = capturePlans { s2 =>
      import s2.implicits._
      val docs = (1 to 40).map(i => (i.toLong, "abab bab abba caba")).toDF("doc_id", "text")
      functions.TextFunctions.wordpieceTrainDistributed(docs, "text", numMerges = 4).collect()
    }
    assert(plansSeen.nonEmpty, "listener captured no plans")
    // one occurrence-level PAIR seed; the symbol seed is a plain
    // explode over the same pinned words (no zip) — a second zip
    // explode means the full-rescan shape regressed
    val seedExplodes = plansSeen.count(p =>
      p.contains("zip_with") || p.contains("arrays_zip"))
    assert(seedExplodes <= 1,
      s"occurrence-level pair explode ran $seedExplodes times — rounds must be delta-only")
    assert(plansSeen.exists(_.contains("bpe_batch_delta")),
      "no combined batch-delta round plan captured")
    // the batch kernel must appear in ONE scan per round, with the
    // pair/sym folds reading the pinned explode — a reappearing
    // separate pair_delta/sym_delta/both_delta (or single-merge step)
    // means the one-scan-per-ROUND shape regressed
    assert(!plansSeen.exists(p => p.contains("bpe_pair_delta(") ||
      p.contains("bpe_sym_delta(") || p.contains("bpe_both_delta(") ||
      p.contains("bpe_merge_step(")),
      "separate per-family/single-merge delta scans regressed")
    for (p <- plansSeen) {
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"degenerate join in a train round:\n$p")
    }
  }

  test("rankBy never plans a single-partition exchange or a Window") {
    val plansSeen = capturePlans { s2 =>
      import org.apache.spark.sql.functions.col
      val df = s2.range(20000).toDF("id")
        .withColumn("score", org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(col("id")), org.apache.spark.sql.functions.lit(97)))
      functions.Curation.rankBy(df, Seq(col("score"), col("id")), numPartitions = 8).collect()
    }
    assert(plansSeen.nonEmpty, "listener captured no plans")
    // the exact regression rankBy exists to prevent: row_number() over
    // a global order = Window + Exchange SinglePartition
    for (p <- plansSeen) {
      assert(!p.contains("Exchange SinglePartition"),
        s"rankBy funneled through one partition:\n$p")
      assert(!p.contains("Window"), s"rankBy re-grew a window:\n$p")
    }
  }

  test("persisted IVF-PQ serving: probe filter prunes PARTITIONS, tables broadcast-join, no re-encode") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 80).map(i =>
      (i.toLong, (0 until 8).map(_ => (rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    val scale = functions.Similarity.kmeansGlobalScale(df, "embedding")
    val (coarse, cbs) = functions.Similarity.ivfPqFit(df, "vec_id",
      "embedding", coarseK = 4, m = 2, k = 2, iters = 1, scale = scale)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-plan")
      .resolve("codes").toString
    functions.Similarity.saveIvfPqEncoded(df, "vec_id", "embedding",
      scale, coarse, cbs, dir)
    val top = functions.Similarity.ivfPqTopKFromCodes(
      spark.read.parquet(dir), "vec_id",
      (0 until 8).map(_ => 0.1f), kTop = 5, scale = scale,
      coarse = coarse, codebooks = cbs, nProbe = 2)
    top.collect()
    val p = top.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the nProbe cell filter must land as on-disk partition pruning —
    // the 100 TB difference between reading nProbe/coarseK of the
    // FILES and re-scanning the corpus per query
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      s"expected partition pruning on cell, got:\n$p")
    // per-cell ADC tables ride ONE tiny broadcast join (off the plan
    // tree), not a literal CASE chain that grows O(nProbe*m*k)
    assert(p.contains("BroadcastHashJoin"),
      s"expected the ADC tables as a broadcast join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must stay a distributed TakeOrdered:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"serving path must not shuffle:\n$p")
    // serving READS codes — any quantize/assign in the plan means the
    // path regressed into re-encoding the corpus per query
    assert(!p.contains("kmeans_assign") && !p.contains("transform("),
      s"stored-code serving must not re-encode:\n$p")
    // the ADC sum is the codegen'd kernel, not interpreted HOF lambdas
    // (r12 verdict: every candidate row paid m interpreted closures)
    assert(p.contains("pq_adc"), s"expected the pq_adc kernel:\n$p")
    assert(!p.contains("zip_with") && !p.contains("aggregate("),
      s"interpreted HOF scorer regressed into the serving path:\n$p")
  }

  test("compacted layout serves bit-equal with partition pruning intact") {
    // drive the actual gate: 8 append batches fragment the cell dirs,
    // compactIvfPqLayout rewrites them, and the serving plan over the
    // compacted layout must still prune partitions and stay shuffle-free
    val out = SparkEntry.queries("q_ann_ivfpq_compacted")(spark, sfDir)
    out.collect()
    val p = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      s"compacted layout must partition-prune on cell:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"compacted-layout serving must not shuffle:\n$p")
    assert(p.contains("pq_adc"), s"expected the pq_adc kernel:\n$p")
  }

  test("ivfPqKnnJoin: dynamic partition pruning on the code scan, bottom-k agg, no window") {
    // drive the actual gate (sf0.01 embeddings): DPP's benefit
    // heuristic rejects toy fixtures, and the pin exists to keep the
    // GATE's plan honest
    val joined = SparkEntry.queries("q_ann_ivfpq_knn")(spark, sfDir)
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the multi-query analog of the static probe filter: Spark's
    // dynamic partition pruning must skip unprobed cells' FILES at
    // runtime off the broadcast query side
    assert(p.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the code scan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$p")
    // per-query top-k rides the buffer-capped aggregate, never a
    // window sort of the whole candidate set on one reducer
    assert(p.contains("bottom_k_by"), s"expected bottom_k_by agg:\n$p")
    assert(!p.contains("Window"), s"knn join re-grew a window:\n$p")
  }

  test("refine + exact ground truth ride the int_l2 kernel; exact knn broadcasts the sample") {
    // the refine re-rank was the last interpreted HOF on a serving
    // path (aggregate(zip_with(...)) paid two boxed closures per
    // vector component); same integers, every gate bit-identical
    val refined = SparkEntry.queries("q_ann_ivfpq_refined")(spark, sfDir)
    refined.collect()
    val pr = refined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(pr.contains("int_l2"), s"expected the int_l2 kernel:\n$pr")
    assert(!pr.contains("zip_with") && !pr.contains("aggregate("),
      s"interpreted HOF re-rank regressed into the refine path:\n$pr")
    // the evaluation ground truth: query SAMPLE broadcast along ONE
    // corpus scan (no shuffle of the corpus), per-query top-k through
    // the buffer-capped aggregate — never a window sort
    val exact = SparkEntry.queries("q_ann_exact_knn")(spark, sfDir)
    exact.collect()
    val pe = exact.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(pe.contains("BroadcastNestedLoopJoin"),
      s"the query sample must broadcast along the corpus scan:\n$pe")
    assert(pe.contains("int_l2"), s"expected the int_l2 kernel:\n$pe")
    assert(pe.contains("bottom_k_by"), s"expected bottom_k_by agg:\n$pe")
    assert(!pe.contains("Window"), s"exact knn re-grew a window:\n$pe")
  }

  test("streamed ANN ingest writes the SAME prunable layout as the batch writer") {
    import org.apache.spark.sql.functions.col
    // drive the gate (it writes the layout via the streaming parquet
    // sink), then prove a static probe filter over the streamed
    // output prunes partitions exactly like the batch-written layout
    val emb = SparkEntry.queries("q_ann_ivfpq_persisted")(spark, sfDir)
    emb.collect() // ensure the batch layout path stays green too
    val streamed = SparkEntry.queries("q_stream_ann_ingest")(spark, sfDir)
    streamed.collect()
    val p = streamed.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      s"streamed layout must partition-prune on cell:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"streamed-layout serving must not shuffle:\n$p")
  }
}
