package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID heuristics, document
  * fingerprinting. All pure `Column` compositions of codegen'd
  * builtins — no UDFs in the hot path, so whole-stage codegen and
  * parquet column pruning survive (only `text` is read).
  */
object TextFunctions {

  /** Whitespace token count (non-empty tokens). Empty/blank/NULL
    * text ⇒ 0 — the raw `size(split(...))` would count the empty
    * tokens Java regex split keeps for leading/trailing non-space
    * whitespace, and return -1 for NULL.
    */
  def tokenCount(text: Column): Column =
    when(text.isNull || length(trim(text)) === 0, lit(0))
      .otherwise(size(filter(split(trim(text), "\\s+"), w => length(w) > 0)))

  /** BPE-ish subword token count: words contribute ceil(len/4) tokens
    * (the classic ~4-chars-per-token heuristic), punctuation runs one
    * each. Deterministic, cheap, and vectorizable — a stand-in for a
    * real tokenizer at 100 TB scan scale.
    */
  def bpeTokenCount(text: Column): Column = {
    val words = filter(split(trim(text), "\\s+"), w => length(w) > 0)
    val wordToks = aggregate(
      words, lit(0L), (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long"))
    val punct = length(regexp_replace(text, "[^.,;:!?]", ""))
    wordToks + punct.cast("long")
  }

  /** Alphanumeric-normalized form used by fingerprints/dedup:
    * lowercase, strip non [a-z0-9 ], collapse whitespace. Contract =
    * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]",
    * " "), "\\s+", " "))` — the form every oracle CTE replicates —
    * evaluated by the one-pass [[NormalizeTextExpr]] kernel
    * (value-identical; the regex chain alone measured 57 s/1M docs).
    */
  def normalizeText(text: Column): Column =
    DedupExpressions.normalizeText(text)

  /** Unicode normalization (NFC by default; NFD/NFKC/NFKD accepted) as
    * a one-pass codegen'd scalar — run BEFORE any byte-level dedup
    * key, fingerprint, or tokenizer on multilingual corpora, where
    * composed and decomposed encodings of identical visible text
    * otherwise split dedup groups. Already-normalized text (the
    * overwhelming case) is a zero-allocation linear check.
    */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    DedupExpressions.normalizeUnicode(text, form)

  /** 64-bit content fingerprint of the normalized text: md5-lower-64
    * (one pass over the normalized string), oracle-replicable as
    * `md5_number_lower(norm)`.
    */
  def fingerprint(text: Column): Column =
    DedupExpressions.md5Lower64(normalizeText(text))

  /** Winnowing-style robust fingerprint: min hash over the word
    * `n`-gram shingles of the normalized text — stable under small
    * edits, unlike [[fingerprint]] (Rabin-Karp-winnowing-style
    * document fingerprinting). Implemented as lane 0 of the minhash
    * family, so the oracle reproduces it with the same SQL formula.
    */
  def shingleFingerprint(text: Column, n: Int = 3): Column =
    element_at(DedupExpressions.minhashSig(text, 1, n), 1)

  /** Word `n`-gram shingles of the normalized text. Texts shorter than
    * `n` words yield a single shingle of the whole text.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val words = split(normalizeText(text), " ")
    when(size(words) <= n, array(array_join(words, " ")))
      .otherwise(
        transform(
          sequence(lit(1), size(words) - (n - 1)),
          i => array_join(slice(words, i, lit(n)), " ")))
  }

  /** Stopword ratio over whitespace tokens (English stopword list). */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "not", "of", "to", "in", "on", "for",
    "with", "is", "are", "was", "were", "be", "it", "this", "that", "as",
    "at", "by", "from")

  def stopwordRatio(text: Column): Column = {
    val toks = filter(split(normalizeText(text), " "), w => length(w) > 0)
    val stops = filter(toks, w => w.isin(EnglishStopwords: _*))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(stops).cast("double") / size(toks).cast("double"))
  }

  /** Punctuation ratio: punctuation chars / total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]-]", "")).cast("double") /
          length(text).cast("double"))

  /** Mean word length over whitespace tokens. */
  def meanWordLength(text: Column): Column = {
    val toks = filter(split(trim(text), "\\s+"), w => length(w) > 0)
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double") /
          size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards mid-length documents,
    * moderate stopword presence, low punctuation density — the
    * length/punct/stopword-ratio recipe of C4/Gopher-style filters.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    round((lenScore * 0.4 + stopScore * 0.3 + punctPenalty * 0.3), 6)
  }

  /** PII scrubbing for training text: redact URLs, emails, and IPv4s
    * with typed placeholder tokens, in that order (URLs first so an
    * address inside a URL doesn't leave a torn remainder). Patterns
    * are RE2-compatible (no backreferences/lookaround), so engines
    * with RE2 regexes (DuckDB) replicate the scrub byte-for-byte —
    * which is how the gate verifies redaction instead of trusting it.
    */
  val UrlRe = "https?://[^\\s]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      Ipv4Re, "<IP>")

  /** Counts of each PII class (pre-scrub) — the filter/report side. */
  def piiCounts(text: Column): Column =
    struct(
      regexp_count(text, lit(UrlRe)).cast("long").as("n_urls"),
      regexp_count(text, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(text, lit(Ipv4Re)).cast("long").as("n_ips"))

  /** Within-document repetition ratio (a Gopher-style quality signal):
    * 1 − |distinct word n-grams| / |word n-grams|. 0 = no repeated
    * n-grams; → 1 for degenerate boilerplate loops.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val sh = wordShingles(text, n)
    lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh).cast("double")
  }

  /** Language-ID by stopword-marker voting: counts hits of per-language
    * marker words among the tokens; highest count wins, ties broken by
    * language code order, zero hits ⇒ "und". An n-gram-free heuristic
    * that stays in codegen (each language is one array_intersect).
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es" -> Seq("el", "la", "los", "las", "es", "que", "para", "una"),
    "fr" -> Seq("le", "la", "les", "est", "que", "pour", "dans", "une"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4", "wo3", "you3", "he2"))

  def langId(text: Column): Column = {
    val toks = array_distinct(filter(split(normalizeText(text), " "), w => length(w) > 0))
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (code, markers) =>
      struct(
        size(array_intersect(toks, array(markers.map(lit): _*))).as("hits"),
        lit(code).as("code"))
    }
    // pick max hits; ties → lexicographically FIRST code. Negate hits and
    // take array_min so (hits desc, code asc) needs no struct-compare tricks.
    val best = array_max(array(scored: _*))
    when(best.getField("hits") === 0, lit("und")).otherwise(
      // re-scan for the first code achieving the max hit count
      scored.foldRight(lit("und")) { (s, acc) =>
        when(s.getField("hits") === best.getField("hits"), s.getField("code")).otherwise(acc)
      })
  }

  /** Corpus-frequency rarity profile per document: a TF-IDF-shaped
    * quality signal that needs no trained model — documents dominated
    * by tokens the corpus has barely seen are OCR noise / mojibake /
    * codes, while near-zero rarity flags boilerplate. Kept entirely in
    * integer space (plus one final positive `round`) so the DuckDB
    * oracle reproduces every value bit-for-bit; a float avg-log-prob
    * variant would hash-diverge across engines.
    *
    * Two shuffles, both standard at 100 TB: corpus term counts
    * (map-side combined groupBy on token) and the token→count
    * join-back (equi-join on the token key, heavy hitters handled by
    * AQE skew split). Per-doc re-agg keys on the doc id. Documents
    * with zero tokens produce no row.
    *
    * Returns `(idCol, n_tokens, n_rare, rare_frac)` where `n_rare`
    * counts token OCCURRENCES whose corpus-wide occurrence count is
    * ≤ `maxCount`.
    */
  /** @param maxFrequentCollect fast-path bound: the set of FREQUENT
    *   tokens (corpus count > maxCount) is pigeonhole-bounded by
    *   `total occurrences / (maxCount+1)`; when it fits under this cap
    *   it collects to a sorted driver array and rarity becomes ONE
    *   [[graft.functions.OovStatsExpr]]-style scan (`n_rare` =
    *   occurrences outside the frequent set — the exact OOV
    *   formulation), skipping the join-back that shuffled one row per
    *   token occurrence. Only the r8 join path's one count shuffle
    *   remains (12.8 s → ~5 s at 1M docs). A tiny `maxCount` on a huge
    *   corpus overflows the cap and falls back to the join — same
    *   values either way (same md5-64 token identity end to end).
    */
  def corpusRarity(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxCount: Long = 2L,
      maxFrequentCollect: Int = 4 << 20): DataFrame = {
    // token identity = signed-64 md5 (ShinglePosHashesExpr n=1): the
    // output is counts only, so the token STRING never needs to enter
    // the corpus-wide frequency shuffle — 8-byte keys end to end
    val exploded = df.select(col(idCol).as("id"),
      explode(DedupExpressions.shinglePosHashes(col(textCol), 1)).as("tok"))
    // lazy pin: the frequent-set collect below is the first action and
    // materializes it; the join fallback then reuses it without
    // re-running the count shuffle
    val (counts, countPins) = Pins.pin(
      exploded.groupBy("tok").agg(count(lit(1)).as("_tc")), eager = false)
    val frequent: Option[Array[Long]] = {
      val arr = counts.filter(col("_tc") > maxCount).select(col("tok"))
        .limit(maxFrequentCollect + 1).collect().map(_.getLong(0))
      if (arr.length <= maxFrequentCollect) Some(arr) else None
    }
    frequent match {
      case Some(freq) =>
        Pins.release(counts, countPins)
        val stats =
          if (freq.isEmpty)
            // no frequent tokens: every occurrence is rare
            df.select(col(idCol).as("id"),
              size(DedupExpressions.shinglePosHashes(col(textCol), 1))
                .cast("long").as("n_tokens"))
              .withColumn("n_rare", col("n_tokens"))
          else
            df.select(col(idCol).as("id"),
              DedupExpressions.oovStats(
                col(textCol), freq.sorted).as("_rs"))
              .select(col("id"), col("_rs.n_tokens").as("n_tokens"),
                col("_rs.n_oov").as("n_rare"))
        stats
          .filter(col("n_tokens") > 0) // zero-token docs produce no row
          .withColumn("rare_frac",
            round(col("n_rare").cast("double") / col("n_tokens"), 6))
          .withColumnRenamed("id", idCol)
      case None =>
        val out = exploded.join(counts, "tok")
          .groupBy("id")
          .agg(
            count(lit(1)).as("n_tokens"),
            sum(when(col("_tc") <= maxCount, 1L).otherwise(0L)).as("n_rare"))
          .withColumn(
            "rare_frac",
            round(col("n_rare").cast("double") / col("n_tokens"), 6))
          .withColumnRenamed("id", idCol)
        Pins.register(out, countPins)
        out
    }
  }

  /** CCNet-style unigram language-model surprisal — the standard
    * corpus-quality proxy between rule filters and a real LM: score
    * each document by the mean negative log-likelihood of its tokens
    * under the corpus's own unigram distribution. Low = templated /
    * repetitive common text, high = rare-token soup (OCR noise,
    * codes); real pipelines keep a middle band or feed the score to a
    * mixture sampler.
    *
    * Determinism recipe (same as tfidf's score_nano): per-token
    * surprisal is snapped to integer nano-nats —
    * `round(ln(total/count) * 1e9)` — BEFORE the per-doc sum, so the
    * document statistic is an integer any md5-capable engine
    * reproduces exactly; only the final display division is IEEE.
    *
    * Shapes (all 8-byte keys via the one-pass token-hash kernel):
    * token-hash explode → corpus counts (map-side combined, PINNED —
    * the call is eager and the corpus is tokenized exactly twice:
    * counts build + join back; release the vocab-sized blocks with
    * [[Curation.unpin]] on the result) → join back → per-doc sum. The
    * corpus-total scalar rides a broadcast cross join. Zero-token
    * documents are absent from the output (same contract as
    * [[corpusRarity]]).
    *
    * Returns `(idCol, n_tokens, nll_nano, avg_nll)` — `nll_nano` the
    * integer sum, `avg_nll` = nll_nano / n_tokens / 1e9 rounded to 6.
    */
  def unigramSurprisal(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val ex = df.select(col(idCol).as("_px_id"),
      explode(DedupExpressions.shinglePosHashes(col(textCol), 1)).as("_h"))
    // PINNED vocab-sized count table (r8): `counts` is lazily consumed
    // by BOTH the totals aggregate and the join back — unpinned, each
    // consumer re-ran the tokenize+explode subtree, so the corpus was
    // scanned THREE times (plan-verified). Pinning the ≤vocab-row
    // table cuts that to the two inherent passes (counts build +
    // join back); blocks are registered for Curation.unpin(result).
    val (counts, countPins) =
      Pins.pin(ex.groupBy("_h").agg(count(lit(1)).as("_tc")))
    // corpus total from the pinned vocab-sized counts, NOT a third
    // scan of the uncached tokenize+explode subtree
    val total = counts.agg(sum(col("_tc")).as("_tot"))
    val out = ex.join(counts, "_h")
      .crossJoin(broadcast(total))
      .withColumn("_nll",
        round(log(col("_tot").cast("double") / col("_tc").cast("double")) * 1e9)
          .cast("long"))
      .groupBy(col("_px_id").as(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("_nll")).as("nll_nano"))
      .withColumn("avg_nll",
        round(col("nll_nano").cast("double") / col("n_tokens").cast("double") / 1e9, 6))
    Pins.register(out, countPins)
    out
  }

  /** Bigram stupid-backoff language-model scoring — the CCNet-shaped
    * perplexity filter (Wenzek et al. 2020 score crawl text with a
    * KenLM trained on Wikipedia; Brants et al. 2007 define stupid
    * backoff: use the raw bigram frequency ratio, back off to
    * `alpha ·` the unigram score when the bigram is unseen). This is
    * the two-corpus formulation [[unigramSurprisal]] deliberately is
    * not: the LM trains on `train` (the trusted corpus) and scores
    * `score` (the candidate corpus), so unseen-bigram backoff — the
    * entire signal — actually fires.
    *
    * Per token at position i of a scored doc (nano-nats, integer):
    *  - i = 1: `ln(T / max(c1(w1), 1))` — unigram, unseen floor 1.
    *  - bigram seen: `ln(c1(w_{i-1}) / c2(w_{i-1}, w_i))`.
    *  - else: `ln(alphaDen·T / (alphaNum·max(c1(w_i), 1)))` — the
    *    backoff constant is a RATIONAL (default 2/5 = Brants's 0.4) so
    *    every ln argument stays a ratio of exact integers and the
    *    per-token value is engine-exact (same recipe as
    *    [[unigramSurprisal]]).
    *
    * Shapes: train-side unigram/bigram count tables reduce over
    * 8-byte md5 hashes with map-side combine (vocab-bounded) and are
    * PINNED — the call is eager, and the train corpus is tokenized
    * exactly twice (one unigram + one bigram pass) no matter how many
    * joins consume the tables; release the vocab-sized blocks with
    * [[Curation.unpin]] on the result. The scored side builds
    * `(prev, cur, bigram)` hash triples SCAN-SIDE by zipping the two
    * one-pass kernel arrays — no self-join on (doc, pos) — then three
    * left equi-joins on 8-byte keys (AQE broadcasts the count tables
    * when the train vocab is small) and one per-doc sum. No token
    * string enters any exchange.
    *
    * Returns `(idCol, n_tokens, n_backoff, nll_nano, avg_nll)`;
    * `n_backoff` counts backed-off positions (a useful OOD diagnostic
    * on its own). Zero-token documents are absent (contract of the
    * sibling scorers).
    */
  def bigramLmScore(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String,
      alphaNum: Int = 2,
      alphaDen: Int = 5): DataFrame = {
    require(alphaNum >= 1 && alphaDen > alphaNum,
      s"backoff alpha must be a rational in (0, 1): got $alphaNum/$alphaDen")
    val uni = train.select(
      explode(DedupExpressions.shinglePosHashes(col(textCol), 1)).as("_h"))
    // PINNED vocab-sized count tables (r8): c1 is lazily consumed by
    // THREE branches (totals, prev-token join, cur-token join) and c2
    // by one — unpinned, every consumer re-tokenized the train corpus
    // (plan-verified: 4 train scans + a filter duplicate = 7 kernel
    // sites). Pinned: exactly one uni pass + one bi pass over train.
    val (c1, c1Pins) =
      Pins.pin(uni.groupBy("_h").agg(count(lit(1)).as("_c1")))
    // corpus total from the pinned vocab-sized table, not a rescan
    val total = c1.agg(sum(col("_c1")).as("_t"))
    val (c2, c2Pins) = Pins.pin(train.select(
        explode(DedupExpressions.shinglePosHashes(col(textCol), 2)).as("_h2"))
      .groupBy("_h2").agg(count(lit(1)).as("_c2")))
    // NO size(_u)>0 prefilter: predicate pushdown would substitute the
    // alias and re-run the unigram kernel in a scan-side Filter (no
    // cross-operator CSE — plan-verified). A zero-token doc zips to
    // exactly one null-padded row (hp=[null] vs hc=[] — arrays_zip
    // pads to the longest), dropped by the cheap attribute filter on
    // _hc below: real token positions always carry a non-null hash.
    // The slice length clamps at 0 so the empty-array slice the old
    // prefilter guarded cannot throw.
    val staged = score.select(
        col(idCol).as("_lm_id"),
        DedupExpressions.shinglePosHashes(col(textCol), 1).as("_u"),
        DedupExpressions.shinglePosHashes(col(textCol), 2).as("_b"))
    // position-aligned triples: element i is (u[i-1] | null, u[i],
    // bigram[i-1] | null) — the null marks "no left context"
    val nullLong = array(lit(null).cast("long"))
    val rows = staged.select(
        col("_lm_id"),
        explode(arrays_zip(
          concat(nullLong,
            slice(col("_u"), lit(1), greatest(size(col("_u")) - 1, lit(0)))).as("hp"),
          col("_u").as("hc"),
          concat(nullLong, col("_b")).as("hb"))).as("_z"))
      .select(col("_lm_id"),
        col("_z.hp").as("_hp"), col("_z.hc").as("_hc"), col("_z.hb").as("_hb"))
      .filter(col("_hc").isNotNull)
    val joined = rows
      .join(c2, col("_hb") === col("_h2"), "left")
      .join(c1.toDF("_hpk", "_c1p"), col("_hp") === col("_hpk"), "left")
      .join(c1.toDF("_hck", "_c1c"), col("_hc") === col("_hck"), "left")
      .crossJoin(broadcast(total))
    val mc = greatest(coalesce(col("_c1c"), lit(1L)), lit(1L))
    // an empty (or all-empty-text) train corpus makes sum(_c1) NULL;
    // without this guard the null silently propagates into nll_nano
    // for EVERY scored doc — raise in-plan instead (no eager count on
    // the train corpus just to validate it)
    val t = when(col("_t").isNull,
        raise_error(lit(
          "bigramLmScore: train corpus has no tokens — cannot estimate an LM"))
          .cast("long"))
      .otherwise(col("_t"))
    val nll = when(col("_hp").isNull,
        round(log(t.cast("double") / mc.cast("double")) * 1e9))
      .when(col("_c2").isNotNull,
        round(log(col("_c1p").cast("double") / col("_c2").cast("double")) * 1e9))
      .otherwise(
        round(log((t * alphaDen).cast("double") /
          (mc * alphaNum).cast("double")) * 1e9))
      .cast("long")
    val backoff = when(col("_hp").isNotNull && col("_c2").isNull, 1L).otherwise(0L)
    val out = joined
      .select(col("_lm_id"), nll.as("_nll"), backoff.as("_bo"))
      .groupBy(col("_lm_id").as(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("_bo")).as("n_backoff"),
        sum(col("_nll")).as("nll_nano"))
      .withColumn("avg_nll",
        round(col("nll_nano").cast("double") / col("n_tokens").cast("double") / 1e9, 6))
    Pins.register(out, c1Pins ++ c2Pins)
    out
  }

  /** Trigram stupid-backoff LM scoring — [[bigramLmScore]] taken one
    * context word deeper, the depth the published CCNet/KenLM quality
    * filters actually run at (Brants et al. 2007 report stupid
    * backoff at n=3..5 matching Kneser-Ney on web-scale counts; the
    * backoff chain here is S(w|uv) = c3/c2(uv), else α·S(w|v) with
    * S(w|v) = c2/c1(v), else α·S(w), S(w) = c1/T).
    *
    * Per token at position i of a scored doc (nano-nats, integer —
    * every ln argument is a ratio of exact integers, the family
    * invariant that makes the gate oracle engine-exact):
    *  - i = 1: `ln(T / max(c1(w1), 1))` — unigram, unseen floor 1.
    *  - i ≥ 3, trigram seen: `ln(c2(w_{i-2} w_{i-1}) / c3)` — the
    *    prefix-bigram count is ≥ c3 > 0 whenever the trigram is seen.
    *  - i ≥ 3, trigram unseen, bigram seen: one backoff —
    *    `ln(αDen·c1(w_{i-1}) / (αNum·c2(w_{i-1} w_i)))`.
    *  - i ≥ 3, both unseen: two backoffs —
    *    `ln(αDen²·T / (αNum²·max(c1(w_i), 1)))`.
    *  - i = 2: the bigram rules with one less α (no trigram context
    *    exists to back off FROM): `ln(c1(w1)/c2)` seen,
    *    `ln(αDen·T/(αNum·mc))` unseen.
    *
    * Shapes are the bigram scorer's, one level wider: three PINNED
    * train-side count tables (uni/bi/tri — the train corpus is
    * tokenized exactly three times; release with [[Curation.unpin]]),
    * scored-side position quintuples built scan-side by zipping the
    * three one-pass kernel arrays (no self-joins), then five left
    * equi-joins on 8-byte hashes (AQE broadcasts small count tables)
    * and one per-doc sum. `n_backoff` counts scored POSITIONS where
    * at least one α fired (i ≥ 3 with trigram unseen, or i = 2 with
    * bigram unseen) — the OOD diagnostic, not the α-application
    * count.
    *
    * Returns `(idCol, n_tokens, n_backoff, nll_nano, avg_nll)`;
    * zero-token documents are absent (family contract).
    */
  def trigramLmScore(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String,
      alphaNum: Int = 2,
      alphaDen: Int = 5): DataFrame = {
    require(alphaNum >= 1 && alphaDen > alphaNum,
      s"backoff alpha must be a rational in (0, 1): got $alphaNum/$alphaDen")
    val uni = train.select(
      explode(DedupExpressions.shinglePosHashes(col(textCol), 1)).as("_h"))
    val (c1, c1Pins) =
      Pins.pin(uni.groupBy("_h").agg(count(lit(1)).as("_c1")))
    val total = c1.agg(sum(col("_c1")).as("_t"))
    val (c2, c2Pins) = Pins.pin(train.select(
        explode(DedupExpressions.shinglePosHashes(col(textCol), 2)).as("_h2"))
      .groupBy("_h2").agg(count(lit(1)).as("_c2")))
    val (c3, c3Pins) = Pins.pin(train.select(
        explode(DedupExpressions.shinglePosHashes(col(textCol), 3)).as("_h3"))
      .groupBy("_h3").agg(count(lit(1)).as("_c3")))
    // position-aligned quintuples for token i (1-based):
    //   _hp = u[i-1] | null          (left unigram context)
    //   _hc = u[i]                   (current token)
    //   _hq = b[i-2] | null          (PREFIX bigram w_{i-2} w_{i-1})
    //   _hb = b[i-1] | null          (current bigram w_{i-1} w_i)
    //   _ht = t[i-2] | null          (trigram w_{i-2} w_{i-1} w_i)
    // null-pad to align; arrays_zip pads ragged tails with null, and
    // any overhang row zips with _hc null — dropped by the attribute
    // filter below (same zero-token contract as the bigram scorer,
    // and a 1-token doc's 2-null trigram pad lands there too)
    val staged = score.select(
        col(idCol).as("_lm_id"),
        DedupExpressions.shinglePosHashes(col(textCol), 1).as("_u"),
        DedupExpressions.shinglePosHashes(col(textCol), 2).as("_b"),
        DedupExpressions.shinglePosHashes(col(textCol), 3).as("_t3"))
    val nullLong = array(lit(null).cast("long"))
    val pad2 = concat(nullLong, nullLong)
    val rows = staged.select(
        col("_lm_id"),
        explode(arrays_zip(
          concat(nullLong,
            slice(col("_u"), lit(1), greatest(size(col("_u")) - 1, lit(0)))).as("hp"),
          col("_u").as("hc"),
          concat(pad2,
            slice(col("_b"), lit(1), greatest(size(col("_b")) - 1, lit(0)))).as("hq"),
          concat(nullLong, col("_b")).as("hb"),
          concat(pad2, col("_t3")).as("ht"))).as("_z"))
      .select(col("_lm_id"),
        col("_z.hp").as("_hp"), col("_z.hc").as("_hc"), col("_z.hq").as("_hq"),
        col("_z.hb").as("_hb"), col("_z.ht").as("_ht"))
      .filter(col("_hc").isNotNull)
    val joined = rows
      .join(c3, col("_ht") === col("_h3"), "left")
      .join(c2.toDF("_hqk", "_c2q"), col("_hq") === col("_hqk"), "left")
      .join(c2.toDF("_hbk", "_c2b"), col("_hb") === col("_hbk"), "left")
      .join(c1.toDF("_hpk", "_c1p"), col("_hp") === col("_hpk"), "left")
      .join(c1.toDF("_hck", "_c1c"), col("_hc") === col("_hck"), "left")
      .crossJoin(broadcast(total))
    val mc = greatest(coalesce(col("_c1c"), lit(1L)), lit(1L))
    val t = when(col("_t").isNull,
        raise_error(lit(
          "trigramLmScore: train corpus has no tokens — cannot estimate an LM"))
          .cast("long"))
      .otherwise(col("_t"))
    val aN = alphaNum.toLong
    val aD = alphaDen.toLong
    val nll = when(col("_hp").isNull, // i = 1
        round(log(t.cast("double") / mc.cast("double")) * 1e9))
      .when(col("_c3").isNotNull, // i >= 3, trigram seen
        round(log(col("_c2q").cast("double") / col("_c3").cast("double")) * 1e9))
      .when(col("_ht").isNotNull && col("_c2b").isNotNull, // i >= 3, one backoff
        round(log((col("_c1p") * aD).cast("double") /
          (col("_c2b") * aN).cast("double")) * 1e9))
      .when(col("_ht").isNotNull, // i >= 3, two backoffs
        round(log((t * aD * aD).cast("double") /
          (mc * aN * aN).cast("double")) * 1e9))
      .when(col("_c2b").isNotNull, // i = 2, bigram seen
        round(log(col("_c1p").cast("double") / col("_c2b").cast("double")) * 1e9))
      .otherwise( // i = 2, bigram unseen
        round(log((t * aD).cast("double") / (mc * aN).cast("double")) * 1e9))
      .cast("long")
    val backoff = when(
        (col("_ht").isNotNull && col("_c3").isNull) ||
          (col("_hp").isNotNull && col("_ht").isNull && col("_c2b").isNull),
        1L)
      .otherwise(0L)
    val out = joined
      .select(col("_lm_id"), nll.as("_nll"), backoff.as("_bo"))
      .groupBy(col("_lm_id").as(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("_bo")).as("n_backoff"),
        sum(col("_nll")).as("nll_nano"))
      .withColumn("avg_nll",
        round(col("nll_nano").cast("double") / col("n_tokens").cast("double") / 1e9, 6))
    Pins.register(out, c1Pins ++ c2Pins ++ c3Pins)
    out
  }

  /** Order-0 character entropy per document — see [[CharEntropyExpr]]
    * (one codegen'd pass; integer nano-nats). The two-sided junk
    * screen: near-zero entropy = repeated template/padding, saturated
    * entropy = binary or encoding garbage.
    */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), CharEntropyExpr(col(textCol)).as("_e"))
      .select(col(idCol),
        col("_e.n_chars").as("n_chars"),
        col("_e.n_distinct").as("n_distinct"),
        col("_e.entropy_nano").as("entropy_nano"))

  /** Per-group n-gram diversity — the type/token ratio over word
    * n-grams, the standard corpus-health metric for mode collapse /
    * template saturation (a domain whose crawl is one boilerplate page
    * repeated has near-zero distinct-gram ratio long before any dedup
    * pass runs). Exact distinct via the 8-byte gram-hash kernel:
    * `(group, hash)` pre-aggregation then per-group counts, all
    * map-side combinable — no gram text in any exchange. For the
    * 100 TB sweep where exact per-group distincts are still too hot,
    * [[approxNgramDiversity]] is the HLL twin (this exact form is its
    * oracle).
    *
    * Returns `(groupCol, n_grams, n_distinct, distinct_ratio)`;
    * groups whose documents have no grams (all shorter than n) are
    * absent.
    */
  def ngramDiversity(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      n: Int = 2): DataFrame = {
    val ex = df.select(col(groupCol),
      explode(DedupExpressions.shinglePosHashes(col(textCol), n)).as("_h"))
    // two-level aggregate: (group, hash) partial counts collapse the
    // duplicate-heavy stream before the per-group reduction
    ex.groupBy(col(groupCol), col("_h"))
      .agg(count(lit(1)).as("_cnt"))
      .groupBy(col(groupCol))
      .agg(
        sum(col("_cnt")).as("n_grams"),
        count(lit(1)).as("n_distinct"))
      .withColumn("distinct_ratio",
        round(col("n_distinct").cast("double") / col("n_grams").cast("double"), 6))
  }

  /** HLL twin of [[ngramDiversity]] for the full-corpus sweep: one
    * pass, `approx_count_distinct` over the same gram hashes —
    * mergeable sketch state, no exact-distinct shuffle of the
    * (group, hash) universe. `n_distinct` is approximate (±~2.3% at
    * the default rsd) and NOT engine-replicable, so this variant is
    * probe/production surface only; the exact form is its gate.
    */
  def approxNgramDiversity(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      n: Int = 2,
      rsd: Double = 0.023): DataFrame = {
    val ex = df.select(col(groupCol),
      explode(DedupExpressions.shinglePosHashes(col(textCol), n)).as("_h"))
    ex.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_grams"),
        approx_count_distinct(col("_h"), rsd).as("n_distinct"))
      .withColumn("distinct_ratio",
        round(col("n_distinct").cast("double") / col("n_grams").cast("double"), 6))
  }

  /** URL canonicalization for web-corpus dedup: lowercase the scheme
    * and host, strip the fragment, the scheme's own default port
    * (http :80 / https :443 — never the other way around), tracking
    * parameters (`utm_*`, fbclid, gclid, ref), an empty leftover `?`,
    * and a bare trailing slash. Two URLs that differ only in these
    * details are the same document in practice — canonicalize BEFORE
    * hashing/grouping by URL. Pure regex/array builtins (RE2-safe
    * patterns), so any engine with the same primitives replicates the
    * canonical form byte-for-byte. The per-URL param filter is an
    * interpreted HOF over a handful of elements — bounded by URL
    * length, not corpus size.
    */
  def normalizeUrl(url: Column): Column = {
    // patterns avoid `$` anchors: Java `$` matches before a trailing
    // newline while RE2's does not, which would break cross-engine
    // replication on sloppily-extracted URLs. `.` excludes newlines
    // identically in both, so URLs are expected to be single-line
    // tokens (pre-trim upstream if they are not).
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://.*", 1))
    val host = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*", 1))
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)", 1)
    // only the scheme's own default port is redundant: http://h:443 is
    // a DIFFERENT resource than https://h and must not conflate
    val hostNoPort = when(scheme === "http", regexp_replace(host, ":80\\z", ""))
      .when(scheme === "https", regexp_replace(host, ":443\\z", ""))
      .otherwise(host)
    val path = regexp_replace(rest, "\\?.*", "")
    val query = when(rest.contains("?"), regexp_replace(rest, "^[^?]*\\?", ""))
      .otherwise(lit(""))
    val keptParams = filter(
      split(query, "&"),
      p => length(p) > 0 &&
        !p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="))
    val cleanQuery = array_join(keptParams, "&")
    val cleanPath = when(path === "/", lit("")).otherwise(path)
    when(scheme === "", url) // not a scheme://host URL: leave untouched
      .otherwise(concat(
        scheme, lit("://"), hostNoPort, cleanPath,
        when(cleanQuery === "", lit("")).otherwise(concat(lit("?"), cleanQuery))))
  }

  /** Lowercased host of a `scheme://[user[:pass]@]host[:port]/...`
    * URL — the grouping key for per-domain curation (caps,
    * blocklists, boilerplate scoping). Userinfo and the port are
    * stripped unconditionally (unlike [[normalizeUrl]], which keeps
    * non-default ports because they address DIFFERENT resources —
    * here the unit is the SITE). Non-URL input (no `scheme://`)
    * yields `''`. Pure regex builtins: one codegen'd projection,
    * byte-replicable in any RE2-capable engine.
    */
  def hostOf(url: Column): Column = {
    val auth = regexp_extract(
      regexp_replace(url, "#.*", ""),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*", 1)
    lower(regexp_replace(regexp_replace(auth, "^.*@", ""), ":[0-9]*\\z", ""))
  }

  /** Registrable domain of a host under a caller-supplied public-
    * suffix list: the last label before the LONGEST matching suffix,
    * e.g. `a.b.example.co.uk` → `example.co.uk`. This is the key
    * per-site curation actually wants — grouping by raw host splits
    * one site across `www.`/`m.`/language subdomains. The default
    * list covers the common generic + two-level country suffixes;
    * pass the full public-suffix list for production crawls (the
    * pattern is one alternation — RE2-linear, length bounded by the
    * list, evaluated once per row inside codegen). Hosts matching no
    * listed suffix (internal hostnames, IPs) pass through unchanged,
    * so grouping degrades to per-host, never to a merged bucket.
    *
    * Both engines' regexes are leftmost-first, so ordering the
    * alternation multi-label-first makes `co.uk` win over `uk`
    * identically everywhere — the DuckDB twin is the same
    * `regexp_extract` over the same pattern.
    */
  def registeredDomain(
      host: Column,
      suffixes: Seq[String] = defaultPublicSuffixes): Column = {
    val m = regexp_extract(
      host, s"([^.]+\\.(?:${publicSuffixAlternation(suffixes)}))\\z", 1)
    when(m =!= "", m).otherwise(host)
  }

  /** The regex alternation [[registeredDomain]] compiles (multi-label
    * suffixes first so leftmost-first engines pick the longest match)
    * — exposed so an external replication (the DuckDB oracle) can
    * interpolate the byte-identical pattern.
    */
  def publicSuffixAlternation(
      suffixes: Seq[String] = defaultPublicSuffixes): String = {
    require(suffixes.nonEmpty, "suffixes must not be empty")
    suffixes
      .sortBy(s => (-s.count(_ == '.'), -s.length, s))
      .map(_.replace(".", "\\."))
      .mkString("|")
  }

  /** Common generic TLDs + frequent two-level country suffixes — a
    * deliberately small default so the codegen'd pattern stays short;
    * production crawls should pass the real public-suffix list.
    */
  val defaultPublicSuffixes: Seq[String] = Seq(
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "ai",
    "dev", "app", "info", "biz", "xyz", "de", "fr", "jp", "uk", "us",
    "ca", "au", "in", "cn", "ru", "br", "nl", "se", "it", "es", "pl",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "co.in",
    "co.kr", "com.mx", "com.tr", "co.za")

  /** HTML → text for web-corpus ingestion: drop script/style blocks
    * wholesale (their content is not prose), strip remaining tags,
    * decode the handful of entities that dominate real pages, collapse
    * whitespace. Deliberately regex-based — not a parser — so it is
    * one codegen'd projection per row and byte-replicable in any
    * RE2-capable engine; malformed HTML degrades to leftover text, not
    * an error.
    */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(
      html, "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => regexp_replace(c, ent, ch) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Gopher-style rule-based document filter with machine-readable
    * reject reasons — the audit-friendly form of [[qualityScore]]:
    * instead of one opaque score, each document carries the sorted
    * list of rules it failed, so corpus reports can attribute removal
    * mass per rule and thresholds can be tuned from data.
    *
    * Rules (names are the `reasons` vocabulary, emitted in
    * alphabetical order):
    *   - `too_short` / `too_long`: token count outside
    *     `[minTokens, maxTokens]`
    *   - `word_length`: mean word length outside
    *     `[minMeanWordLen, maxMeanWordLen]` (OCR noise / char soup)
    *   - `low_stopword`: stopword occurrence ratio `< minStopRatio`
    *     (non-linguistic content)
    *   - `repetitive`: most frequent token's share `> maxTopTokenFrac`
    *     (degenerate loops)
    *
    * Every metric comes from ONE codegen'd pass per row
    * ([[QualityStatsExpr]]): all four aggregates — including the
    * top-token count, which naively needs a `(doc, token)` groupBy —
    * are per-DOCUMENT statistics, so a per-row hash map replaces the
    * two corpus-wide shuffles the explode/groupBy formulation paid.
    * The filter is a pure projection: it composes with scan pushdown
    * and adds zero exchanges to whatever pipeline it sits in (measured
    * 51.6s → ~3s at 1M docs; ScaleProbe has the exact number). Integer
    * sums + one IEEE division each, so any md5-capable engine
    * replicates the decisions bit-for-bit. Documents with zero tokens
    * keep a row (metrics 0) and fail `too_short`, `low_stopword`, and
    * `word_length`.
    *
    * Returns `(idCol, keepCols*, n_tokens, stop_ratio, mean_word_len,
    * top_token_frac, keep, reasons)`. `keepCols` rides along for free
    * (the filter is a projection, not a join), so downstream stages —
    * dedup, packing — compose without re-reading the corpus.
    */
  def qualityFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 50,
      maxTokens: Int = 100000,
      minStopRatio: Double = 0.02,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxTopTokenFrac: Double = 0.2,
      keepCols: Seq[String] = Nil): DataFrame = {
    val reserved = Set(idCol, "n_tokens", "stop_ratio", "mean_word_len",
      "top_token_frac", "keep", "reasons")
    val clash = keepCols.filter(reserved)
    require(clash.isEmpty,
      s"keepCols ${clash.mkString(", ")} collide with qualityFilter's fixed " +
        s"output columns (${reserved.mkString(", ")}) — rename before filtering")
    val joined = df.select(
      col(idCol) +: keepCols.map(col) :+
        QualityStatsExpr(coalesce(col(textCol), lit(""))).as("_qs"): _*)
    val n = col("_qs.n_tokens")
    val stopRatio = when(n === 0, lit(0.0))
      .otherwise(col("_qs.stop_count").cast("double") / n.cast("double"))
    val mwl = when(n === 0, lit(0.0))
      .otherwise(col("_qs.char_sum").cast("double") / n.cast("double"))
    val topFrac = when(n === 0, lit(0.0))
      .otherwise(col("_qs.top_count").cast("double") / n.cast("double"))
    def rule(cond: Column, name: String): Column =
      when(cond, array(lit(name))).otherwise(array().cast("array<string>"))
    // concat order IS alphabetical order, so `reasons` needs no sort
    val reasons = concat(
      rule(stopRatio < minStopRatio, "low_stopword"),
      rule(topFrac > maxTopTokenFrac, "repetitive"),
      rule(n > maxTokens, "too_long"),
      rule(n < minTokens, "too_short"),
      rule(mwl < minMeanWordLen || mwl > maxMeanWordLen, "word_length"))
    joined.select(
      col(idCol) +: keepCols.map(col) :+
        n.as("n_tokens") :+
        round(stopRatio, 6).as("stop_ratio") :+
        round(mwl, 6).as("mean_word_len") :+
        round(topFrac, 6).as("top_token_frac") :+
        (size(reasons) === 0).as("keep") :+
        reasons.as("reasons"): _*)
  }

  /** Top-`k` TF-IDF terms per document — corpus keyword extraction
    * (search-index boosting, topic tagging, mixture diagnostics).
    * `score_nano = tf * round(ln(nDocs/df) * 1e9)`: the idf is
    * snapped to integer nano-nats BEFORE the tf multiply, so ranking
    * and output are integer-exact across engines — two engines whose
    * `ln` differs in the last ulp still agree after the 1e-9 snap
    * (a raw double product could rank-diverge on near-ties).
    *
    * Shapes: per-document term frequencies come from the scan-side
    * one-pass [[TokenTfExpr]] kernel (`array<struct<h, tf>>` of signed
    * md5-64 token hashes — the explode emits PRE-COUNTED (doc, h, tf)
    * candidates, so the old per-occurrence explode→groupBy shuffle of
    * every token is gone). Document frequencies reduce over the 8-byte
    * hash with map-side combine (vocab-bounded exchange) and join back
    * (AQE broadcasts the df side when it is small). The RANKING WINDOW
    * runs on hashes too — the tie-break is `(score_nano desc, _h asc)`
    * on the signed md5-64 value, so no exchange before the rank
    * carries a term string. Term text is recovered AFTER the `rk <= k`
    * filter from a `min(term)`-reduced dictionary (map-side combine
    * caps the dict aggregation at ~vocab rows per partition; `min`,
    * not `first`, so the mapping is deterministic even under an md5-64
    * collision); that final join touches only k·docs candidate rows
    * instead of every (doc, term) pair. The doc-count scalar rides a
    * broadcast cross join, not a driver action. All linear.
    *
    * Returns `(idCol, term, tf, term_df, score_nano, rk)` with
    * `rk <= k`, ties broken by signed term-hash ascending (DuckDB
    * twin: `md5_number_lower` two's-complemented to BIGINT).
    */
  /** BM25 (Okapi) ranking of documents against a bag-of-terms query —
    * the retrieval scorer a curation pipeline uses to pull
    * topic-relevant slices out of a web corpus (and the lexical half
    * of hybrid lexical+embedding search next to
    * `Similarity.annTopK`). Robertson idf with the +1 floor (never
    * negative), `k1`/`b` saturation exactly as published.
    *
    * Scale shape: query terms normalize+hash DRIVER-side with the same
    * md5 the [[TokenTfExpr]] kernel emits, and the [[QueryTfExpr]]
    * kernel filters each document's term stats to that hash set AT THE
    * SCAN (binary search in the task closure — no explode of
    * non-matching terms ever exists), so the expensive tokenizer runs
    * exactly ONCE and everything that shuffles is O(matched terms).
    * Per-term document frequency is a window count over the matched
    * rows (the same `_h` exchange scoring rides), not a second kernel
    * branch — r6 ran the full tokenizer over the corpus twice; the
    * only remaining second pass is the corpus `N`/`avgdl` scalar
    * aggregate, which by construction cannot ride the scoring scan
    * (a global value consumed per-row) and is therefore stripped to
    * the count-only [[NormTokenCountExpr]] kernel (normalize+count,
    * no hashing, no term map — plan-asserted in PlanSpec). The top-k
    * is a `TakeOrderedAndProject`. Per-term scores snap to integer
    * nano-units before the per-doc sum (the repo's cross-engine float
    * recipe).
    *
    * Returns the top `k` rows `(idCol, n_hits, score_nano)` by
    * `score_nano` descending, ties on id.
    */
  def bm25TopDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must contain at least one term")
    require(k >= 1, s"k must be >= 1, got $k")
    val qHashes = HashUtil.tokens(query.mkString(" ")).distinct
      .map(HashUtil.md5Lower64).toSeq
    require(qHashes.nonEmpty, "query normalized to zero tokens")
    // Tokenizer pass (the expensive one, ONCE): per-doc (dl,
    // query-matched tfs) from the QueryTfExpr kernel — dl is the
    // NORMALIZED token count (sum of the kernel tfs), same tokenizer
    // as the term statistics, so length normalization agrees with
    // df/tf (and with the oracle's len(ws)) on punctuated text. Only
    // matching terms ever leave the scan, so everything downstream is
    // O(matches), not O(corpus terms).
    import org.apache.spark.sql.expressions.Window
    // explode_OUTER + post-generate null filter, NOT a plain explode:
    // the inner explode makes the optimizer infer `size(terms) > 0`
    // and evaluate the kernel AGAIN in a scan-side filter (filter and
    // projection are separate codegen operators — no cross-operator
    // CSE), doubling the tokenizer work this rewrite exists to remove.
    val tf = df.select(col(idCol).as("_id"),
        QueryTfExpr(col(textCol), qHashes.sorted.toArray).as("_k"))
      .select(col("_id"), col("_k").getField("dl").as("_dl"),
        explode_outer(col("_k").getField("terms")).as("_p"))
      .select(col("_id"), col("_dl"), col("_p.h").as("_h"), col("_p.tf").as("_tf"))
      .filter(col("_h").isNotNull)
    // per-term document frequency as a window count over the matched
    // rows — same exchange the scoring needs anyway, and one consumer
    // of the tokenizer scan instead of r6's separate groupBy branch
    // (a second full kernel pass; per-consumer nested-field pruning
    // makes ReuseExchange-style sharing non-robust — see NOTES r7)
    val withDf = tf.withColumn("_df",
      count(lit(1)).over(Window.partitionBy(col("_h"))))
    // Corpus stats pass: N and sum(dl) are corpus-GLOBAL scalars that
    // must exist before any per-row score, so a second pass over the
    // source is unavoidable without pinning a cache past this (lazy)
    // call. It is stripped to the count-only kernel: normalize+count,
    // no md5, no term map — the cheap fraction of the tokenizer.
    val stats = df.agg(count(lit(1)).as("_n"),
      sum(NormTokenCountExpr(col(textCol))).as("_sum_dl"))
    val nD = col("_n").cast("double")
    val idf = log((nD - col("_df").cast("double") + lit(0.5)) /
      (col("_df").cast("double") + lit(0.5)) + lit(1.0))
    val avgdl = col("_sum_dl").cast("double") / nD
    val denom = col("_tf").cast("double") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("_dl").cast("double") / avgdl)
    val termScore = idf * (col("_tf").cast("double") * (lit(k1) + lit(1.0)) / denom)
    withDf
      .crossJoin(broadcast(stats))
      .withColumn("_s_nano", round(termScore * lit(1e9)).cast("long"))
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_hits"), sum(col("_s_nano")).as("score_nano"))
      .select(col("_id").as(idCol), col("n_hits"), col("score_nano"))
      .orderBy(col("score_nano").desc, col(idCol))
      .limit(k)
  }

  /** Hybrid lexical+semantic retrieval via reciprocal-rank fusion
    * (Cormack/Clarke/Buettcher, SIGIR'09): `rrf(d) = Σ_arm 1/(kRrf +
    * rank_arm(d))` over the BM25 top-`poolN` and cosine top-`poolN`
    * lists. Rank fusion needs no cross-scorer calibration, and since
    * ranks are small integers the fused score is a fixed-order
    * two-term double sum — deterministic and oracle-replicable where
    * raw-score fusion wouldn't be. Scale shape: each arm is already a
    * top-`poolN` TakeOrdered result, so the fusion full-outer-joins
    * two poolN-row frames — trivial regardless of corpus size; the
    * corpus-scale work happens inside the arms.
    *
    * `vecArm` is the semantic-arm STRATEGY `(emb, idCol, vecCol,
    * queryVec, poolN) => (idCol, score)`: the default
    * [[Similarity.bruteForceTopK]] is exact and oracle-replicable but
    * a full corpus scan per query — at 100 TB the default for
    * PRODUCTION is an index-backed arm, e.g. `(e, i, v, q, n) =>
    * Similarity.annTopKIvf(e, i, v, q, n, centroids, nProbe)` over a
    * pre-fit IVF (partition-pruned scan of `nProbe` cells instead of
    * the whole table; recall-gated in q_hybrid_ann the same way
    * q_ann_ivf gates the raw ANN). Any arm must return one row per
    * candidate with `score` descending-rankable and ties meaningful
    * on the id. Null scores are DISCARDED before ranking: a null
    * embedding null-propagates through cosine (so an arm over a
    * corpus with null vectors yields null-score rows), and a null
    * rank key would otherwise sort FIRST in the ascending struct
    * sort, handing ranks 1..m to null-vector docs and shifting every
    * real candidate's rank — custom `vecArm` strategies may rely on
    * this filter rather than pre-filtering themselves.
    *
    * Returns top `k` rows `(docs' idCol, lex_rank, vec_rank,
    * rrf_nano)` — ranks are null for a doc present in only one arm.
    */
  def hybridTopDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      emb: DataFrame,
      embIdCol: String,
      vecCol: String,
      query: Seq[String],
      queryVec: Seq[Float],
      k: Int,
      poolN: Int = 100,
      kRrf: Int = 60,
      vecArm: (DataFrame, String, String, Seq[Float], Int) => DataFrame =
        Similarity.bruteForceTopK): DataFrame = {
    require(k >= 1 && poolN >= k, s"need poolN >= k >= 1, got k=$k poolN=$poolN")
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    // rank WITHOUT a window: each arm is already top-poolN-bounded
    // (TakeOrdered), so collapse it to one sorted array and posexplode
    // — same single tiny partition a rank window would use, but no
    // WindowExec, so the "No Partition Defined" warning stays reserved
    // for real unbounded hazards (a foldable partitionBy(lit) is
    // stripped by the optimizer and still warns). Sort key: struct
    // (-score, id) ascending = score desc, ties by id asc — exactly
    // the row_number order the oracle replays.
    val lex = bm25TopDocs(docs, idCol, textCol, query, poolN)
      .agg(sort_array(collect_list(
        struct((-col("score_nano")).as("_k"), col(idCol).as("_i")))).as("_a"))
      .select(posexplode(col("_a")).as(Seq("_r", "_x")))
      .select(col("_x").getField("_i").as("_id"), (col("_r") + 1).as("_rl"))
    val vec = vecArm(emb, embIdCol, vecCol, queryVec, poolN)
      .filter(col("score").isNotNull)
      .agg(sort_array(collect_list(
        struct((-col("score")).as("_k"), col(embIdCol).as("_i")))).as("_a"))
      .select(posexplode(col("_a")).as(Seq("_r", "_x")))
      .select(col("_x").getField("_i").as("_id"), (col("_r") + 1).as("_rv"))
    lex.join(vec, Seq("_id"), "full_outer")
      .select(col("_id").as(idCol),
        col("_rl").cast("long").as("lex_rank"),
        col("_rv").cast("long").as("vec_rank"),
        round((coalesce(lit(1.0) / (lit(kRrf) + col("_rl")), lit(0.0)) +
               coalesce(lit(1.0) / (lit(kRrf) + col("_rv")), lit(0.0))) * lit(1e9))
          .cast("long").as("rrf_nano"))
      .orderBy(col("rrf_nano").desc, col(idCol))
      .limit(k)
  }

  def tfidfTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5): DataFrame = {
    val tf = df.select(col(idCol).as("_tt_id"),
        explode(TokenTfExpr(col(textCol))).as("_p"))
      .select(col("_tt_id"), col("_p.h").as("_h"), col("_p.tf").as("tf"))
    val dfreq = tf.groupBy("_h").agg(count(lit(1)).as("term_df"))
    val nDocs = df.agg(count_distinct(col(idCol)).as("_n_docs"))
    val scored = tf.join(dfreq, "_h")
      .crossJoin(broadcast(nDocs))
      .withColumn(
        "score_nano",
        (col("tf") *
          round(log(col("_n_docs").cast("double") / col("term_df").cast("double")) * 1e9)
            .cast("long")).as("score_nano"))
    // per-doc top-k via the bounded bottom-k aggregate, NOT a
    // row_number window (r8): the rank order (score_nano desc, _h asc)
    // maps onto the (priority, tie) = (-score_nano, _h) ascending key,
    // and BottomKByExpr trims every aggregation buffer at 2k — the
    // window formulation re-sorted each ~50-term/doc partition's FULL
    // row set after the by-hash dfreq join scattered it, and a
    // degenerate doc (millions of distinct terms) would sort on one
    // reducer where the agg is capped by construction.
    val top = scored
      .select(col("_tt_id"),
        struct((-col("score_nano")).as("p"), col("_h").as("t"),
          col("tf"), col("term_df"), col("score_nano")).as("_e"))
      .groupBy(col("_tt_id"))
      .agg(DedupExpressions.bottomKBy(col("_e"), k).as("_ks"))
      .select(col("_tt_id"), posexplode(col("_ks")).as(Seq("_r", "_e")))
      .select(col("_tt_id"), col("_e.t").as("_h"), col("_e.tf").as("tf"),
        col("_e.term_df").as("term_df"), col("_e.score_nano").as("score_nano"),
        (col("_r") + 1).cast("int").as("rk"))
    val dict = df.select(explode(TokenDictExpr(col(textCol))).as("_d"))
      .select(col("_d.h").as("_h"), col("_d.term").as("term"))
      .groupBy("_h").agg(min(col("term")).as("term"))
    top.join(dict, "_h")
      .select(
        col("_tt_id").as(idCol), col("term"), col("tf"),
        col("term_df"), col("score_nano"), col("rk"))
  }

  /** Corpus vocabulary induction: the top-`size` normalized tokens by
    * total occurrence count — the word-level vocab (or BPE seed list)
    * a tokenizer-training step starts from, and the frequency table
    * mixture/rarity diagnostics read. Ties break on the signed
    * md5-64 token hash ascending (the repo-standard cross-engine
    * tie-break); term text is recovered from the `min(term)`
    * dictionary so an md5-64 collision (2^-64; colliding terms would
    * also merge counts) still resolves deterministically.
    *
    * Scale shape: per-doc `(hash, tf)` pairs from the one-pass
    * [[TokenTfExpr]] kernel; the count aggregation reduces over
    * 8-byte hashes with map-side combine (vocab-bounded exchange);
    * the top-`size` cut is a distributed `TakeOrderedAndProject`; the
    * rank window and dictionary join touch only `size` surviving
    * rows. No token string ever enters a corpus-wide exchange.
    *
    * Returns `(rank, term, n_docs, n_occurrences)`, rank 1-based in
    * `(n_occurrences desc, hash asc)` order.
    */
  def buildVocab(df: DataFrame, textCol: String, size: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(size >= 1, "size must be >= 1")
    val counts = df
      .select(explode(TokenTfExpr(col(textCol))).as("_p"))
      .select(col("_p.h").as("_h"), col("_p.tf").as("_tf"))
      .groupBy("_h")
      .agg(sum(col("_tf")).as("n_occurrences"), count(lit(1)).as("n_docs"))
    // rank over `size` already-top rows WITHOUT a window (a window
    // here would need an empty/foldable partition spec and trip the
    // WindowExec single-partition warning): sorted-array posexplode
    // over the bounded row set — struct(-n, h) asc = n desc, h asc
    val top = counts
      .orderBy(col("n_occurrences").desc, col("_h").asc)
      .limit(size)
      .agg(sort_array(collect_list(struct(
        (-col("n_occurrences")).as("_k"), col("_h"),
        col("n_occurrences"), col("n_docs")))).as("_a"))
      .select(posexplode(col("_a")).as(Seq("_r", "_x")))
      .select((col("_r") + 1).cast("long").as("rank"),
        col("_x").getField("_h").as("_h"),
        col("_x").getField("n_occurrences").as("n_occurrences"),
        col("_x").getField("n_docs").as("n_docs"))
    val dict = df.select(explode(TokenDictExpr(col(textCol))).as("_d"))
      .select(col("_d.h").as("_h"), col("_d.term").as("term"))
      .groupBy("_h").agg(min(col("term")).as("term"))
    top.join(dict, "_h")
      .select(col("rank"), col("term"), col("n_docs"), col("n_occurrences"))
  }

  /** Per-document out-of-vocabulary rate against a vocab table (e.g.
    * [[buildVocab]]'s output, or any table with a `term` string
    * column) — the coverage report that decides whether a tokenizer
    * vocab is big enough for a corpus slice. Matching is on the
    * md5-64 token hash (a collision can only UNDER-count OOV, at
    * 2^-64). The vocab side reduces to distinct 8-byte hashes and
    * broadcasts when small (the normal case — vocabs are bounded);
    * per-doc sums ride the TokenTfExpr scan, so nothing wider than
    * `(id, hash, tf)` ever shuffles.
    *
    * Returns `(idCol, n_tokens, n_oov, oov_ratio)` for every input
    * row; zero-token docs report ratio 0.0.
    */
  /** Join-free [[oovRate]] twin for a DRIVER-HELD vocabulary: the
    * sorted hash array ships with the task closure (like a broadcast)
    * and one [[OovStatsExpr]] scan pass emits the counts — a pure
    * projection, so it runs unchanged as a STATELESS streaming stage
    * (q_stream_oov). Use [[oovRate]] when the vocab itself is a
    * distributed table too large to collect.
    */
  def oovRateScan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocabTerms: Seq[String]): DataFrame = {
    require(vocabTerms.nonEmpty, "vocabTerms must not be empty")
    val hashes = vocabTerms.map(HashUtil.md5Lower64).distinct.sorted.toArray
    df.select(col(idCol),
        DedupExpressions.oovStats(coalesce(col(textCol), lit("")), hashes).as("_ov"))
      .select(col(idCol),
        col("_ov.n_tokens").as("n_tokens"),
        col("_ov.n_oov").as("n_oov"))
      .withColumn("oov_ratio",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6)))
  }

  def oovRate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame,
      termCol: String = "term"): DataFrame = {
    val vh = vocab.select(
      DedupExpressions.md5Lower64(col(termCol)).as("_ov_h")).distinct()
    val tf = df.select(col(idCol),
        explode(TokenTfExpr(col(textCol))).as("_p"))
      .select(col(idCol), col("_p.h").as("_ov_h"), col("_p.tf").as("_ov_tf"))
    val perDoc = tf
      .join(vh.withColumn("_ov_in", lit(1)), Seq("_ov_h"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("_ov_tf")).cast("long").as("n_tokens"),
        sum(when(col("_ov_in").isNull, col("_ov_tf")).otherwise(lit(0)))
          .cast("long").as("n_oov"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_ratio",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6)))
  }

  /** Train a BPE merge table over the corpus (Sennrich word-count
    * formulation — see [[Bpe]] for the exact semantics shared with the
    * encode kernel and the chained-`replace` SQL oracle). Words are
    * `tokenPattern` matches over `lower(textCol)`.
    *
    * The distributed part is ONE word-count scan; the merge loop runs
    * on the driver over the `(word, count)` vocabulary, which must fit
    * by contract: `minCount` is the scale lever (a floor of 2-5 drops
    * the hapax tail that dominates distinct-word counts at 100 TB) and
    * `maxWords` fails loud rather than silently truncating — a
    * truncated vocab would train DIFFERENT merges, not slower ones.
    *
    * Returns `(rank bigint, a, b, merged)` ordered by rank; fewer than
    * `numMerges` rows when the pair supply exhausts first.
    */
  /** The minCount-floored `(word, count)` vocabulary as a (lazy)
    * DataFrame — the ONE distributed corpus pass every BPE entry
    * point shares.
    */
  private def bpeWordCountDf(
      df: DataFrame, textCol: String, tokenPattern: String,
      minCount: Long): DataFrame =
    df.select(explode(regexp_extract_all(
        lower(col(textCol)), lit(tokenPattern), lit(0))).as("_w"))
      .groupBy("_w")
      .agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= minCount)

  /** Driver-collected word counts with the loud `maxWords` contract
    * (silent truncation would change the learned merges).
    */
  private def bpeWordCounts(
      df: DataFrame, textCol: String, tokenPattern: String,
      minCount: Long, maxWords: Int, caller: String): IndexedSeq[(String, Long)] = {
    val counts = bpeWordCountDf(df, textCol, tokenPattern, minCount).collect()
    require(counts.length <= maxWords,
      s"$caller: ${counts.length} distinct words exceed maxWords=$maxWords — " +
        "raise minCount (preferred) or maxWords, or use bpeTrainDistributed " +
        "(no driver vocab cap); silent truncation would change the merges")
    counts.toIndexedSeq.map(r => (r.getString(0), r.getLong(1)))
  }

  private def mergesToDf(
      spark: org.apache.spark.sql.SparkSession,
      merges: IndexedSeq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b, a + b) }
      .toDF("rank", "a", "b", "merged")
  }

  def bpeTrain(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      tokenPattern: String = "[a-z]+",
      minCount: Long = 1L,
      maxWords: Int = 4 << 20): DataFrame = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val wc = bpeWordCounts(df, textCol, tokenPattern, minCount, maxWords, "bpeTrain")
    mergesToDf(df.sparkSession, Bpe.train(wc, numMerges))
  }

  /** Byte-level BPE training (the GPT-2 shape): symbols start as
    * UTF-8 BYTES of each word, rendered as 2-char lowercase hex pairs
    * so the whole family — driver merge loop, codegen'd encode kernel
    * (`byteLevel = true`), and the chained-`replace` DuckDB oracle
    * over `lower(hex(encode(word)))` — reuses the char-level machinery
    * verbatim (see [[Bpe.byteHexSymbols]]). On pure-ASCII corpora the
    * learned merges are the char-level merges mapped through hex
    * (spec-gated); on multilingual text this is the variant that never
    * hits an out-of-alphabet symbol.
    *
    * Returns `(rank bigint, a, b, merged)` — `a`/`b`/`merged` are hex
    * strings (e.g. `74 || 68 -> 7468` for `t+h`).
    */
  def bpeTrainBytes(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      tokenPattern: String = "[a-z]+",
      minCount: Long = 1L,
      maxWords: Int = 4 << 20): DataFrame = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val wc = bpeWordCounts(df, textCol, tokenPattern, minCount, maxWords, "bpeTrainBytes")
    mergesToDf(df.sparkSession, Bpe.train(wc, numMerges, Bpe.byteHexSymbols))
  }

  /** Per-document token counts under a byte-level merge table — the
    * [[bpeTokenCounts]] twin with the kernel in `byteLevel` mode.
    */
  def bpeTokenCountsBytes(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)],
      tokenPattern: String = "[a-z]+"): DataFrame =
    df.select(col(idCol),
      BpeEncodeExpr.count(
        lower(coalesce(col(textCol), lit(""))), merges, tokenPattern,
        byteLevel = true)
        .as("n_bpe_tokens"))

  /** Fully distributed BPE training — the scale path past
    * [[bpeTrain]]'s driver vocabulary cap: the `(symbols, count)` word
    * table stays a DataFrame for the whole merge loop, and the driver
    * holds ONLY the merge list (16 bytes of pair strings per round).
    * A 100 TB multilingual corpus whose minCount-floored vocabulary
    * exceeds ~4M distinct words trains here without raising minCount.
    *
    * INCREMENTAL pair-count maintenance (the same standard-formulation
    * complexity the driver trainer uses, distributed): the adjacent
    * pair table is seeded by ONE full explode, then each round only
    * UPDATES it — merging `(a, b)` changes the pair counts of exactly
    * the words that contain the pair, so the per-round delta is a
    * codegen'd [[BpePairDeltaExpr]] scan whose explode emits nothing
    * for untouched words (the overwhelming majority), folded into the
    * pinned pair table by a pair-keyed aggregation over the (distinct
    * pairs)-sized table — orders of magnitude fewer rows than the
    * occurrence-level re-count a full per-round explode pays (the
    * pre-r10 shape: ~21 s/round at a 4.5M-word probe; this one ~1-2 s,
    * which is what makes 30k-50k-merge production vocabularies
    * feasible rather than merely survivable).
    *
    * Per merge ROUND: arg-max collect of the top `maxBatch + 1` rows
    * from the pinned pair table (count desc, then `(a, b)` asc;
    * Spark's UTF8String binary ordering == DuckDB binary collation ==
    * `Bpe.cpCompare`, the invariant the whole family rests on) →
    * BATCH selection on the driver ([[selectBpeBatch]] — the provably
    * sequential-identical prefix, K merges per round instead of 1) →
    * one [[BpeBatchDeltaExpr]] delta scan + fold (pinned) → one
    * [[BpeBatchStepExpr]] projection over the word table (pure
    * codegen; no-hit rows pass their array through untouched). The
    * batch attacks the job-per-merge round FLOOR: rounds ≈ merges /
    * mean-batch-size synchronous job sequences — and in the default
    * `exactBatch = true` mode the merges are still BIT-IDENTICAL to
    * [[bpeTrain]] (spec-gated equivalence on randomized corpora;
    * q_bpe_train_dist replays the same DuckDB chained-CTE oracle),
    * because the batch only ever contains merges sequential training
    * would have picked in exactly that order (see the soundness
    * argument on [[selectBpeBatch]]).
    *
    * Measured ceiling of EXACT batching (BatchProbe/BpeProbe r11):
    * ~3.2 merges/round over the first 1k merges of a Zipfian 200k-word
    * corpus (~2.1 in the 1k-4k tail, where small counts tie densely)
    * and ~1.0 on a near-uniform 4.5M-word table — exactness forbids
    * accepting past the first interacting candidate or a count tie,
    * and real merge sequences chain through freshly-created symbols.
    * `exactBatch = false` OPTS INTO the classic approximate batching
    * (skip interacting candidates, keep the top-K disjoint pairs —
    * the standard formulation of batched BPE): rounds collapse by
    * ~maxBatch× even on adversarial corpora, the learned merge LIST
    * may reorder relative to sequential training (encode semantics
    * are unchanged — merges still apply in learned order), and the
    * mode is never applied silently: the default trains exactly.
    *
    * Word lineage pins every `pinEvery` ROUNDS through [[Pins]]
    * (eager local/reliable checkpoint), releasing the prior pin; the
    * pair table re-pins every round (it is the next round's arg-max
    * source) — bounded memory across thousands of rounds.
    */
  def bpeTrainDistributed(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      tokenPattern: String = "[a-z]+",
      minCount: Long = 1L,
      pinEvery: Int = 8,
      maxBatch: Int = 64,
      exactBatch: Boolean = true): DataFrame = {
    require(numMerges >= 1, "numMerges must be >= 1")
    require(pinEvery >= 1, "pinEvery must be >= 1")
    require(maxBatch >= 1, "maxBatch must be >= 1")
    val spark = df.sparkSession
    var (words, wordPins) = Pins.pin(
      bpeWordCountDf(df, textCol, tokenPattern, minCount)
        .select(BpeEncodeExpr.symbols(col("_w")).as("syms"), col("_c").as("cnt")))
    // seed: the ONE occurrence-level pair explode of the whole run
    var (pairs, pairPins) = Pins.pin(
      words.filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .groupBy(col("p.0").as("a"), col("p.1").as("b"))
        .agg(sum(col("cnt")).as("c")))
    // symbol-string universe for the batch-selection collision check:
    // seed symbols are single code points (alphabet-sized — ONE cheap
    // key-table job), merged strings join as they are learned. Stale
    // entries (symbols merged away) only make the check conservative.
    val universe = scala.collection.mutable.Set.empty[String]
    universe ++= pairs
      .select(explode(array(col("a"), col("b"))).as("s"))
      .distinct().collect().map(_.getString(0))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // merge triples applied since the last word pin — composed into
    // ONE batchStep kernel call per consumer instead of a stacked
    // projection per round (see the fold note in the loop)
    var pending = IndexedSeq.empty[(String, String, String)]
    var rounds = 0
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val top = pairs
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(maxBatch + 1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val rows = top.map(r =>
          (r.getString(0), r.getString(1), r.getLong(2))).toIndexedSeq
        val batch = selectBpeBatch(rows, maxBatch, universe, exactBatch)
          .take(numMerges - merges.length)
        val triples = batch.map { case (a, b, _) => (a, b, a + b) }
        merges ++= triples.map(t => (t._1, t._2))
        universe ++= triples.map(_._3)
        rounds += 1
        if (merges.length == numMerges) {
          // last merge recorded: the folded pair table and the merged
          // word table would never be read — skip their eager jobs
        } else {
        // delta: only words containing a batch pair emit anything.
        // Un-pinned rounds FOLD into the kernel, not the plan (r15):
        // the batch kernels are order-faithful, so k rounds since the
        // last pin compose as ONE batchStep over the pinned words with
        // the concatenated `pending` batch — same merge sequence,
        // bit-identical rewrites — instead of k stacked projections.
        // That keeps every round's generated source IDENTICAL (the
        // merge list rides addReferenceObj, not source text), so
        // Janino compiles each trainer plan shape ONCE per JVM instead
        // of once per chain depth (measured cold-start cure, verdict
        // #5), and one decode→applyAll→encode pass replaces k.
        val preSyms =
          if (pending.isEmpty) col("syms")
          else BpeEncodeExpr.batchStep(col("syms"), pending)
        val delta = words
          .select(col("cnt"),
            explode(BpeEncodeExpr.batchDelta(preSyms, triples,
              withSymbols = false)).as("p"))
          .groupBy(col("p.pa").as("a"), col("p.pb").as("b"))
          .agg(sum(col("p.d") * col("cnt")).as("c"))
        val (nextPairs, nextPairPins) = Pins.pin(
          pairs.unionByName(delta)
            .groupBy(col("a"), col("b"))
            .agg(sum(col("c")).as("c"))
            .filter(col("c") > 0))
        Pins.release(pairs, pairPins)
        pairs = nextPairs
        pairPins = nextPairPins
        pending = pending ++ triples
        if (rounds % pinEvery == 0) {
          val (pinned, nextPins) = Pins.pin(words.select(
            BpeEncodeExpr.batchStep(col("syms"), pending).as("syms"),
            col("cnt")))
          Pins.release(words, wordPins)
          words = pinned
          wordPins = nextPins
          pending = IndexedSeq.empty
        }
        }
      }
    }
    Pins.release(pairs, pairPins)
    Pins.release(words, wordPins)
    lastBpeTrainRounds = rounds
    mergesToDf(spark, merges.toIndexedSeq)
  }

  /** Scheduler-round count of the most recent [[bpeTrainDistributed]]
    * run in this JVM — probe/diagnostic surface only (racy under
    * concurrent trainers, like `SparkEntry.lastStreamBatchMs`).
    */
  @volatile var lastBpeTrainRounds: Int = -1

  /** Same diagnostic for [[wordpieceTrainDistributed]]. */
  @volatile var lastWpTrainRounds: Int = -1

  /** The provably sequential-identical merge batch: the maximal
    * PREFIX of the pair table's total order (count desc, `(a, b)`
    * asc) that sequential BPE training would pick in exactly that
    * order, selected from the collected top `maxBatch + 1` rows.
    *
    * Soundness (why the batch is bit-identical to sequential):
    * applying an accepted merge `(a_j, b_j) → m_j` changes only
    *  (1) pairs sharing the symbol `a_j` or `b_j` — their counts can
    *      only DECREASE;
    *  (2) pairs containing the merged STRING `m_j` — pure creations
    *      of count ≤ the count of some type-(1) pair, PROVIDED `m_j`
    *      did not already exist as a symbol (the `universe` check —
    *      two different merge paths can produce the same string, and
    *      an existing-`m_j` pair could then GAIN on top of an
    *      existing count).
    * The walk stops at the first candidate touching any accepted
    * symbol or merged string (prefix property: everything order-better
    * than every type-(1)/(2) pair is accepted), so every changed
    * pair's post-batch count is ≤ `cStop` = the count at the stop
    * point (or at the first UNCOLLECTED row — rows beyond the collect
    * horizon are order-worse by construction). Trimming the prefix to
    * counts STRICTLY above `cStop` (the head row — the global arg-max
    * — is always safe) then guarantees no changed pair can beat any
    * batch member at its sequential step, even on ties: tie-break
    * can't rescue a strictly smaller count. Symbol-disjoint merges
    * commute and cannot create or destroy each other's occurrences,
    * so applying the batch in one pass equals applying it
    * sequentially. ∎
    */
  private[functions] def selectBpeBatch(
      rows: IndexedSeq[(String, String, Long)],
      maxBatch: Int,
      universe: scala.collection.Set[String],
      exact: Boolean = true): IndexedSeq[(String, String, Long)] = {
    val seen = scala.collection.mutable.Set.empty[String]
    val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    if (!exact) {
      // APPROXIMATE selection (opt-in, never silent — see the
      // `exactBatch` contract on bpeTrainDistributed): SKIP
      // interacting candidates instead of stopping, no dominance
      // trim. Accepted merges are still pairwise symbol-disjoint, so
      // the batch kernels' order-application is well-defined and the
      // folds stay exact; only the merge ORDER vs sequential training
      // is approximate.
      var i = 0
      while (i < math.min(maxBatch, rows.length)) {
        val (a, b, _) = rows(i)
        val m = a + b
        if (i == 0 || !(seen(a) || seen(b) || seen(m))) {
          accepted += rows(i)
          seen += a; seen += b; seen += m
        }
        i += 1
      }
      return accepted.toIndexedSeq
    }
    // rows beyond the collect horizon (or beyond maxBatch) bound the
    // changed-pair counts exactly like an explicit stop row does
    var cStop = if (rows.length > maxBatch) rows(maxBatch)._3 else 0L
    var stopped = false
    var i = 0
    while (!stopped && i < math.min(maxBatch, rows.length)) {
      val (a, b, c) = rows(i)
      val m = a + b
      if (i > 0 && (seen(a) || seen(b) || seen(m) || universe.contains(m))) {
        cStop = c
        stopped = true
      } else {
        accepted += rows(i)
        seen += a; seen += b; seen += m
        // head row with a universe-colliding merged string: existing
        // `m`-pairs can gain on top of an existing count, which the
        // `> cStop` trim does not dominate — fall back to K=1 (the
        // head alone is always sequential's first pick)
        if (i == 0 && universe.contains(m)) stopped = true
      }
      i += 1
    }
    // counts are non-increasing, so the strict-dominance trim keeps a
    // prefix; the head (global arg-max) survives unconditionally
    (accepted.head +: accepted.drop(1).takeWhile(_._3 > cStop)).toIndexedSeq
  }

  /* Why there is NO WordPiece analog of [[selectBpeBatch]] — i.e.,
   * why `wordpieceTrainDistributed` keeps one merge per round: under
   * the likelihood score `s = c(ab)/(c(a)·c(b))`, merging the arg-max
   * pair creates pairs involving the merged symbol `m`, and a created
   * pair's score can reach ~`1/c'(m)` (a singleton neighbor symbol
   * adjacent to one merge site scores `1/(1·c'(m))`). Any batch
   * extension would need a score strictly above that ceiling to be
   * sequential-identical, but EVERY pair's score obeys
   * `s ≤ c/(c·c) = 1/c ≤ 1/c_1` (symbol counts dominate their pair
   * counts), while the ceiling is `≥ 1/c_1` — so no extension can
   * ever be certified. This is structural, not conservatism:
   * sequential WordPiece genuinely interleaves freshly-created
   * rare-symbol pairs into the merge order (it is WHY the score
   * builds long words fast), so bit-identical batching is impossible
   * from the (pair, symbol) tables, and an r10-style measurement pass
   * is moot. The round-floor cure for WordPiece at 30k-merge scale
   * would have to change the CONTRACT (approximate batching), which
   * this engine does not do silently.
   */

  /** Train a WordPiece merge table — [[bpeTrain]]'s corpus contract
    * (ONE distributed word-count scan; driver merge loop over the
    * bounded vocab; `maxWords` fails loud) with the likelihood score
    * `count(ab) / (count(a) · count(b))` instead of the raw pair
    * count (see [[Wordpiece.train]] for the exact-integer arg-max and
    * the `##` continuation algebra). Completes the tokenizer-training
    * family: the engine now TRAINS BERT-style WordPiece vocabularies,
    * not just segments with them ([[WordpieceExpr]]).
    *
    * Returns `(rank bigint, a, b, merged)` in learned order; fewer
    * rows when the pair supply exhausts first. Feed
    * [[wordpieceVocab]] to the encode kernel.
    */
  def wordpieceTrain(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      tokenPattern: String = "[a-z]+",
      minCount: Long = 1L,
      maxWords: Int = 4 << 20,
      continuationPrefix: String = "##"): DataFrame = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val wc = bpeWordCounts(df, textCol, tokenPattern, minCount, maxWords, "wordpieceTrain")
    val spark = df.sparkSession
    import spark.implicits._
    Wordpiece.train(wc, numMerges, continuationPrefix).zipWithIndex
      .map { case ((a, b, m), i) => (i.toLong, a, b, m) }
      .toDF("rank", "a", "b", "merged")
  }

  /** Fully distributed WordPiece training — [[wordpieceTrain]] past
    * the driver vocabulary cap, the way [[bpeTrainDistributed]] lifts
    * [[bpeTrain]]: the `(symbols, count)` word table stays a
    * DataFrame for the whole run; the driver holds only the merge
    * list. The likelihood score `count(ab) / (count(a) · count(b))`
    * needs live SYMBOL counts, so next to the incrementally-folded
    * pair table this trainer keeps a `(symbol, count)` table current
    * through the codegen'd [[BpeBatchDeltaExpr]] in `withSymbols`
    * mode (empty output for untouched words — a merge round shuffles
    * work only where it lands, exactly like the pair delta).
    *
    * Per round: score = two broadcast-shaped equi-joins of the pinned
    * pair table against the pinned symbol table (both tables are
    * distinct-key-sized, NOT corpus-sized) → double arg-max → the
    * exact decision on the driver over the ≤`maxCandidates` pairs
    * within a 1e-9 relative margin of the double max (BigInt
    * cross-multiplication, `(a, b)` code-point tie-break — the
    * [[Wordpiece.train]] comparator verbatim; the margin is ~1e7×
    * wider than IEEE's ~4e-16 relative error, so the exact winner is
    * always inside the candidate set) → pair-delta fold + sym-delta
    * fold + one [[BpeBatchStepExpr]] projection, with the merged
    * symbol OVERRIDDEN to the continuation-stripped concatenation
    * (`a + ##b → ab`). ONE merge per round in the default exact mode
    * — unlike [[bpeTrainDistributed]] there is no sound merge batch
    * under the likelihood score (see the proof note above this
    * method). `approxMaxBatch > 1` OPTS INTO approximate batching
    * (the only scale path a 30k-merge WordPiece vocabulary has): up
    * to that many pairwise-symbol-disjoint merges from the scored
    * top of the table apply per round; the learned merge LIST may
    * reorder relative to sequential training — encode semantics are
    * unchanged — and the mode is never applied silently. Pins: pair
    * and symbol tables re-pin per round, word lineage every
    * `pinEvery` rounds.
    *
    * Merges are bit-identical to [[Wordpiece.train]] (spec-gated on
    * randomized tie-heavy corpora; q_wordpiece_train_dist replays the
    * same cross-multiplied DuckDB oracle as q_wordpiece_train).
    */
  def wordpieceTrainDistributed(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      tokenPattern: String = "[a-z]+",
      minCount: Long = 1L,
      pinEvery: Int = 8,
      continuationPrefix: String = "##",
      maxCandidates: Int = 100000,
      approxMaxBatch: Int = 1): DataFrame = {
    require(numMerges >= 1, "numMerges must be >= 1")
    require(pinEvery >= 1, "pinEvery must be >= 1")
    require(approxMaxBatch >= 1, "approxMaxBatch must be >= 1")
    val spark = df.sparkSession
    val pref = continuationPrefix
    var (words, wordPins) = Pins.pin(
      bpeWordCountDf(df, textCol, tokenPattern, minCount)
        .select(transform(BpeEncodeExpr.symbols(col("_w")),
          (s, i) => when(i === 0, s).otherwise(concat(lit(pref), s))).as("syms"),
          col("_c").as("cnt")))
    // Pair rows (`b` non-null) and symbol rows (`b` NULL) live in ONE
    // pinned `(a, b, c)` table: the per-round state fold is then ONE
    // union+aggregate pin instead of three jobs (delta pin + pair fold
    // + symbol fold) — the distributed trainer's round cost is
    // job-floor-bound at any corpus size (the tables are
    // distinct-key-sized), so halving the jobs/round halves the round
    // floor. The integer sums are unchanged (same rows, same keys up
    // to the disjoint b-NULL namespace), so merges stay bit-identical.
    var (tab, tabPins) = Pins.pin(
      words.filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .groupBy(col("p.0").as("a"), col("p.1").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .unionByName(
          words.select(col("cnt"), explode(col("syms")).as("s"))
            .groupBy(col("s")).agg(sum(col("cnt")).as("sc"))
            .select(col("s").as("a"), lit(null).cast("string").as("b"),
              col("sc").as("c"))))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    // merge triples applied since the last word pin — composed into
    // ONE batchStep kernel call per consumer instead of a stacked
    // projection per round (see the fold note in the loop)
    var pending = IndexedSeq.empty[(String, String, String)]
    var rounds = 0
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val pairsT = tab.filter(col("b").isNotNull)
      val symsT = tab.filter(col("b").isNull)
        .select(col("a").as("s"), col("c").as("sc"))
      val scored = pairsT
        .join(symsT.select(col("s").as("a"), col("sc").as("ca")), Seq("a"))
        .join(symsT.select(col("s").as("b"), col("sc").as("cb")), Seq("b"))
        .select(col("a"), col("b"), col("c"), col("ca"), col("cb"),
          (col("c").cast("double") /
            (col("ca").cast("double") * col("cb").cast("double"))).as("_sc"))
      // ONE TakeOrdered job: the top-K by double score contains every
      // pair within the 1e-9 margin of the max unless K overflows —
      // which the tail check below makes loud (the max+filter shape
      // evaluated the score join twice per round)
      val top = scored
        .orderBy(col("_sc").desc, col("a").asc, col("b").asc)
        .limit(maxCandidates + 1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val mxSc = top.head.getDouble(5)
        val cands = top.takeWhile(_.getDouble(5) >= mxSc * (1.0 - 1e-9))
        // the +1 row distinguishes a genuinely-overflowing margin from
        // a complete set of exactly maxCandidates ties
        require(cands.length <= maxCandidates,
          s"wordpieceTrainDistributed: over $maxCandidates score-tied " +
            "candidate pairs in one round — a degenerate corpus; raise " +
            "maxCandidates or minCount")
        // exact arg-max (the Wordpiece.train comparator): cross-multiply
        // in BigInt, tie by smallest (a, b) in code-point order
        var bi = 0
        var i = 1
        while (i < cands.length) {
          val x = cands(i); val w = cands(bi)
          val xs = BigInt(x.getLong(2)) * BigInt(w.getLong(3)) * BigInt(w.getLong(4))
          val ws = BigInt(w.getLong(2)) * BigInt(x.getLong(3)) * BigInt(x.getLong(4))
          val better =
            if (xs != ws) xs > ws
            else {
              val ac = Bpe.cpCompare(x.getString(0), w.getString(0))
              if (ac != 0) ac < 0
              else Bpe.cpCompare(x.getString(1), w.getString(1)) < 0
            }
          if (better) bi = i
          i += 1
        }
        val (a, b) = (cands(bi).getString(0), cands(bi).getString(1))
        def mergedOf(x: String, y: String): String =
          if (pref.nonEmpty && y.startsWith(pref)) x + y.substring(pref.length)
          else x + y
        // exact mode: ONE merge per round, by proof — see the
        // no-WordPiece-batch note above this method. Approximate
        // mode extends the head with score-ordered pairwise-disjoint
        // merges (skip-not-stop; application stays well-defined and
        // the delta folds exact — only the ORDER vs sequential is
        // approximate, the documented opt-in).
        val triples = {
          val buf = scala.collection.mutable.ArrayBuffer((a, b, mergedOf(a, b)))
          if (approxMaxBatch > 1) {
            val seen = scala.collection.mutable.Set(a, b, buf.head._3)
            var i = 0
            while (buf.length < approxMaxBatch && i < top.length) {
              val (x, y) = (top(i).getString(0), top(i).getString(1))
              val m = mergedOf(x, y)
              if (!(seen(x) || seen(y) || seen(m))) {
                buf += ((x, y, m))
                seen += x; seen += y; seen += m
              }
              i += 1
            }
          }
          buf.take(numMerges - merges.length).toIndexedSeq
        }
        merges ++= triples
        rounds += 1
        if (merges.length == numMerges) {
          // last merge recorded: the folded pair/symbol tables and the
          // merged word table would never be read — skip their jobs
        } else {
        // ONE adjacency scan of the word table per round: the combined
        // kernel emits pair deltas (s null) and symbol deltas (pa
        // null) together for the WHOLE batch, mapped straight onto the
        // unified (a, b) key — pair deltas keep pb, symbol deltas take
        // b NULL — so ONE union+aggregate pin folds both tables at
        // once and the delta needs no pin of its own (single consumer).
        // Un-pinned rounds FOLD into the kernel, not the plan (r15):
        // the batch kernels are order-faithful, so the rounds since
        // the last pin compose as ONE batchStep with the concatenated
        // `pending` batch — same merge sequence, bit-identical
        // rewrites — instead of stacked projections. Every round's
        // generated source is then IDENTICAL (merge lists ride
        // addReferenceObj, not source text): Janino compiles each
        // trainer plan shape ONCE per JVM instead of once per chain
        // depth, and one decode→applyAll→encode pass replaces k.
        val preSyms =
          if (pending.isEmpty) col("syms")
          else BpeEncodeExpr.batchStep(col("syms"), pending)
        val delta = words
          .select(col("cnt"),
            explode(BpeEncodeExpr.batchDelta(preSyms, triples,
              withSymbols = true)).as("p"))
          .filter(col("p.pa").isNotNull || col("p.s").isNotNull)
          .select(coalesce(col("p.pa"), col("p.s")).as("a"),
            when(col("p.pa").isNotNull, col("p.pb")).as("b"),
            (col("p.d") * col("cnt")).as("c"))
        val (nextTab, nextTabPins) = Pins.pin(
          tab.unionByName(delta)
            .groupBy(col("a"), col("b"))
            .agg(sum(col("c")).as("c"))
            .filter(col("c") > 0))
        Pins.release(tab, tabPins)
        tab = nextTab
        tabPins = nextTabPins
        pending = pending ++ triples
        if (rounds % pinEvery == 0) {
          val (pinned, nextPins) = Pins.pin(words.select(
            BpeEncodeExpr.batchStep(col("syms"), pending).as("syms"),
            col("cnt")))
          Pins.release(words, wordPins)
          words = pinned
          wordPins = nextPins
          pending = IndexedSeq.empty
        }
        }
      }
    }
    Pins.release(tab, tabPins)
    Pins.release(words, wordPins)
    lastWpTrainRounds = rounds
    import spark.implicits._
    merges.toIndexedSeq.zipWithIndex
      .map { case ((a, b, m), i) => (i.toLong, a, b, m) }
      .toDF("rank", "a", "b", "merged")
  }

  /** Encoder-ready WordPiece vocabulary (base symbols in code-point
    * order, then merged tokens in rank order) from one corpus scan +
    * one driver train — the [[WordpieceExpr]] input shape.
    */
  def wordpieceVocab(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      tokenPattern: String = "[a-z]+",
      minCount: Long = 1L,
      maxWords: Int = 4 << 20,
      continuationPrefix: String = "##"): IndexedSeq[String] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val wc = bpeWordCounts(df, textCol, tokenPattern, minCount, maxWords, "wordpieceVocab")
    Wordpiece.trainWithVocab(wc, numMerges, continuationPrefix)._2
  }

  /** Tokenizer vocabulary export for a [[bpeTrain]] run: base tokens
    * (every single code-point symbol occurring in the minCount-floored
    * word vocabulary, id'd in code-point order) followed by the
    * surviving merged tokens (first formation wins when two merge
    * paths produce the same string — HF-style string-keyed vocab),
    * id'd densely in merge-rank order after the base block.
    *
    * Returns `(token_id bigint, token string, kind 'base'|'merged')`.
    */
  def bpeVocab(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      tokenPattern: String = "[a-z]+",
      minCount: Long = 1L,
      maxWords: Int = 4 << 20): DataFrame =
    bpeTrainWithVocab(df, textCol, numMerges, tokenPattern, minCount, maxWords)._2

  /** One corpus scan + ONE driver merge loop feeding both exports:
    * `(mergesDf, vocabDf)` with the exact [[bpeTrain]] / [[bpeVocab]]
    * schemas. Callers that need the merge list AND the id table (the
    * token-ID encode shape) call this instead of bpeTrain + bpeVocab,
    * which would scan and train twice.
    */
  def bpeTrainWithVocab(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      tokenPattern: String = "[a-z]+",
      minCount: Long = 1L,
      maxWords: Int = 4 << 20): (DataFrame, DataFrame) = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val wc = bpeWordCounts(df, textCol, tokenPattern, minCount, maxWords, "bpeVocab")
    val merges = Bpe.train(wc, numMerges)
    val base = wc.iterator.flatMap(w => Bpe.codePointSymbols(w._1))
      .toSet.toIndexedSeq
      .sortWith((a, b) => Bpe.cpCompare(a, b) < 0)
    val baseSet = base.toSet
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    merges.foreach { case (a, b) =>
      val t = a + b
      if (!baseSet.contains(t)) seen += t // first formation wins
    }
    val spark = df.sparkSession
    import spark.implicits._
    val vocab =
      (base.zipWithIndex.map { case (t, i) => (i.toLong, t, "base") } ++
        seen.iterator.zipWithIndex.map { case (t, i) =>
          ((base.length + i).toLong, t, "merged")
        })
        .toDF("token_id", "token", "kind")
    (mergesToDf(spark, merges), vocab)
  }

  /** Driver-side `(a, b)` merge list from a [[bpeTrain]] output frame
    * (or any frame with `rank`, `a`, `b` columns) — the shape
    * [[BpeEncodeExpr]] ships in the task closure.
    */
  def collectMerges(mergesDf: DataFrame): IndexedSeq[(String, String)] =
    mergesDf.select(col("rank"), col("a"), col("b"))
      .orderBy(col("rank"))
      .collect()
      .toIndexedSeq
      .map(r => (r.getString(1), r.getString(2)))

  /** Per-document BPE token counts under a trained merge list: one
    * codegen'd [[BpeEncodeExpr]] scan pass, count-only (no token
    * strings materialize — the 100 TB shape). Docs whose text has no
    * `tokenPattern` match report 0.
    */
  def bpeTokenCounts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)],
      tokenPattern: String = "[a-z]+"): DataFrame =
    df.select(col(idCol),
      BpeEncodeExpr.count(
        lower(coalesce(col(textCol), lit(""))), merges, tokenPattern)
        .as("n_bpe_tokens"))

  /** Persist a trained tokenizer as parquet under `dir`: `merges/`
    * (rank, a, b[, merged]) and optionally `vocab/` (token_id, token,
    * kind) — the artifact a serving/encode job reloads WITHOUT
    * retraining (training scans the corpus; encoding should only ever
    * read this). Tiny tables → one file each.
    */
  def saveTokenizer(
      dir: String, merges: DataFrame, vocab: Option[DataFrame] = None): Unit = {
    merges.coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    vocab.foreach(_.coalesce(1).write.mode("overwrite").parquet(s"$dir/vocab"))
  }

  /** Reload the driver-side merge list ([[BpeEncodeExpr]]'s closure
    * shape) from a [[saveTokenizer]] directory.
    */
  def loadTokenizerMerges(
      spark: org.apache.spark.sql.SparkSession, dir: String): IndexedSeq[(String, String)] =
    collectMerges(spark.read.parquet(s"$dir/merges"))

  /** Reload the vocab token list (the [[WordpieceExpr]] /
    * [[LatticeEncodeExpr]] input shape), id-ordered.
    */
  def loadTokenizerVocab(
      spark: org.apache.spark.sql.SparkSession, dir: String): IndexedSeq[String] =
    spark.read.parquet(s"$dir/vocab")
      .orderBy("token_id").select("token")
      .collect().map(_.getString(0)).toIndexedSeq

  /** Persist a trained unigram-LM vocabulary (the [[unigramTrain]]
    * output shape, `(token, cnt, cost_nano)`) under `dir/unigram` —
    * the third tokenizer family's artifact, so decode jobs reload
    * costs instead of retraining (the [[saveTokenizer]] contract).
    */
  def saveUnigram(dir: String, vocab: DataFrame): Unit =
    vocab.coalesce(1).write.mode("overwrite").parquet(s"$dir/unigram")

  /** Reload a [[saveUnigram]] artifact as the aligned
    * `(vocab, costs)` pair [[LatticeEncodeExpr]] and
    * [[unigramEncodeWords]] take, token-ordered.
    */
  def loadUnigram(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (IndexedSeq[String], IndexedSeq[Long]) = {
    val rows = spark.read.parquet(s"$dir/unigram")
      .orderBy("token").select("token", "cost_nano")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    (rows.map(_._1).toIndexedSeq, rows.map(_._2).toIndexedSeq)
  }

  // ------------------------------------------------------------------
  // Unigram-LM (SentencePiece) scored decode — Kudo 2018,
  // arXiv:1804.10959. Piece probabilities come from corpus-weighted
  // SUBSTRING occurrence counts (every vocab token, at every position
  // of every word occurrence), turned into integer nano-nat costs
  // round(ln(total/count)·1e9) — the repo's established ln-rounding
  // convention (charEntropy, unigramSurprisal, A-ES keys), so the
  // whole decode is SQL-replayable including its total cost.
  // ------------------------------------------------------------------

  /** Corpus-weighted substring-occurrence counts for `vocab` and their
    * nano-nat unigram costs, ALIGNED with `vocab`. Distributed shape:
    * word counts (one aggregation over the token explode), then every
    * substring of each DISTINCT word up to the longest vocab token —
    * `O(distinct words · len · maxTokenLen)` rows, corpus-size
    * independent — equi-joined against the broadcast vocab and
    * count-aggregated. Every vocab token must occur (a BPE/WordPiece
    * vocab trained on the same corpus always does — merged tokens are
    * literal substrings of corpus words); absent tokens fail loud
    * rather than receive an invented probability.
    */
  def unigramCosts(
      df: DataFrame,
      textCol: String,
      vocab: Seq[String],
      tokenPattern: String = "[a-z]+"): Array[Long] = {
    require(vocab.nonEmpty, "unigramCosts: empty vocab")
    val maxLen = vocab.map(_.length).max
    val spark = df.sparkSession
    import spark.implicits._
    val wc = df
      .select(explode(regexp_extract_all(
        lower(coalesce(col(textCol), lit(""))), lit(tokenPattern), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val occ = wc
      .select(col("word"), col("cnt"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("pos"))
      .select(col("cnt"), col("pos"),
        explode(sequence(lit(1),
          least(lit(maxLen), length(col("word")) - col("pos")))).as("l"),
        col("word"))
      .select(col("cnt"),
        expr("substring(word, pos + 1, l)").as("sub"))
      .join(broadcast(vocab.toDF("sub")), Seq("sub"))
      .groupBy("sub").agg(sum(col("cnt")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = vocab.filterNot(occ.contains)
    require(missing.isEmpty,
      s"unigramCosts: vocab tokens absent from the corpus: ${missing.take(5).mkString(", ")}")
    val total = occ.values.sum
    vocab.map(t =>
      Math.round(Math.log(total.toDouble / occ(t)) * 1e9)).toArray
  }

  /** Scored Viterbi segmentation of every distinct corpus word under
    * `(vocab, costs)`: `(word, n_pieces, pieces, cost_nano)` where
    * `cost_nano` is the exact integer sum of the chosen pieces' costs
    * (−1 for UNK words). One codegen'd [[LatticeEncodeExpr]] pass
    * over the distinct-word table; the piece→cost lookup for the sum
    * is a plan-literal map (vocab-sized, broadcast-like).
    */
  def unigramEncodeWords(
      df: DataFrame,
      textCol: String,
      vocab: Seq[String],
      costs: Seq[Long],
      tokenPattern: String = "[a-z]+",
      unk: String = "[UNK]"): DataFrame = {
    // if unk were itself a vocab token, a real single-piece
    // segmentation equal to it would be indistinguishable from the
    // whole-word failure — refuse the ambiguity
    require(!vocab.contains(unk),
      s"unigramEncodeWords: unk token '$unk' collides with a vocab entry")
    val costMap = typedLit(vocab.zip(costs).toMap)
    df.select(explode(regexp_extract_all(
          lower(coalesce(col(textCol), lit(""))), lit(tokenPattern), lit(0))).as("word"))
      .distinct()
      .select(col("word"),
        LatticeEncodeExpr(col("word"), vocab, unk, costs).as("_p"))
      // a map miss (only the unk piece can miss) nulls the aggregate —
      // coalesce to the -1 sentinel, which cannot shadow a real total
      .select(col("word"), size(col("_p")).as("n_pieces"),
        array_join(col("_p"), "|").as("pieces"),
        coalesce(
          aggregate(col("_p"), lit(0L), (acc, p) => acc + element_at(costMap, p)),
          lit(-1L)).as("cost_nano"))
  }

  /** TRAIN a unigram-LM (SentencePiece) vocabulary — Kudo 2018,
    * arXiv:1804.10959 §3.2, in its VITERBI ("hard-EM") variant: the
    * E-step assigns every word its single best segmentation under the
    * current piece costs (the exact-integer [[LatticeEncodeExpr]]
    * Viterbi, one codegen scan over the DISTINCT-word table per
    * round), piece counts fold corpus-weighted from those
    * segmentations, and the M-step recomputes nano-nat costs
    * `round(ln(total/count)·1e9)` — the repo's established
    * cross-engine ln-rounding convention. Soft EM (forward-backward
    * expected counts) accumulates float path sums whose addition
    * order no two engines reproduce bit-for-bit; the hard variant
    * keeps every intermediate an exact integer (costs included), so
    * the WHOLE training run is DuckDB-replayable — q_unigram_train's
    * oracle replays seed counts, both Viterbi rounds, the prune, and
    * the final costs verbatim. (SentencePiece itself documents the
    * Viterbi path as the degenerate point of its EM; the trade is the
    * usual hard-vs-soft EM one.)
    *
    * Shape per round: seed = ALL substrings of distinct words up to
    * `maxTokenLen`, corpus-weighted (`O(distinct words · len ·
    * maxTokenLen)` rows — corpus-size independent, the
    * [[unigramCosts]] scale argument); single characters are
    * mandatory (coverage — no word can UNK) and never pruned; the
    * multi-char seed keeps the top `seedSize − #chars` by
    * `(count desc, token asc)`. Each EM round re-segments, recounts,
    * reprices, and prunes the multi-char block to
    * `vocabSize − #chars` by the same total order. Pieces unused by
    * any Viterbi path drop out (the vocabulary may end smaller than
    * `vocabSize` on tiny corpora — documented, not padded).
    *
    * Returns `(token, cnt, cost_nano)` — final Viterbi usage counts
    * and costs, the [[unigramEncodeWords]] input shape.
    */
  /** Shared plumbing of the two unigram trainers: the distinct-word
    * count table and the substring-occurrence SEED — all substrings
    * up to `maxTokenLen`, corpus-weighted, split into the mandatory
    * single-code-point block and the top `seeds − #chars` multi-char
    * block by `(count desc, token asc)`. The substring-count table is
    * pinned so the char collect and the multi TakeOrdered read the
    * `O(distinct words · len · maxTokenLen)` explode ONCE
    * (PlanSpec-pinned).
    */
  private def unigramSeed(
      wcPinned: DataFrame,
      maxTokenLen: Int,
      seeds: Int,
      who: String): (Array[(String, Long)], Array[(String, Long)]) = {
    val occ = wcPinned
      .select(col("word"), col("cnt"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("pos"))
      .select(col("cnt"), col("pos"),
        explode(sequence(lit(1),
          least(lit(maxTokenLen), length(col("word")) - col("pos")))).as("l"),
        col("word"))
      .select(col("cnt"), expr("substring(word, pos + 1, l)").as("sub"))
      .groupBy("sub").agg(sum(col("cnt")).as("n"))
    val (occPinned, occPins) = Pins.pin(occ)
    try {
      val cs = occPinned.filter(length(col("sub")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      require(cs.nonEmpty, s"$who: empty corpus")
      val ms = occPinned.filter(length(col("sub")) > 1)
        .orderBy(col("n").desc, col("sub").asc)
        .limit(math.max(0, seeds - cs.length))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      (cs, ms)
    } finally Pins.release(occPinned, occPins)
  }

  /** Distinct-word occurrence counts of `textCol` — the table every
    * unigram-trainer pass (seed and EM rounds) scans.
    */
  private def unigramWordCounts(
      df: DataFrame, textCol: String, tokenPattern: String): DataFrame =
    df.select(explode(regexp_extract_all(
        lower(coalesce(col(textCol), lit(""))), lit(tokenPattern), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Corpus-weighted Viterbi piece-usage counts of `(vocab, costs)`
    * over `textCol` — one [[LatticeEncodeExpr]] scan of the
    * distinct-word table (the trainers' E-step shape, exposed for
    * apply-time jobs like q_unigram_apply). Returns `(token, cnt)`.
    */
  def unigramUsageCounts(
      df: DataFrame,
      textCol: String,
      vocab: Seq[String],
      costs: Seq[Long],
      tokenPattern: String = "[a-z]+",
      unk: String = "[UNK]"): DataFrame =
    unigramWordCounts(df, textCol, tokenPattern)
      .select(col("cnt"),
        explode(LatticeEncodeExpr(col("word"), vocab, unk, costs)).as("token"))
      .groupBy("token").agg(sum(col("cnt")).as("cnt"))

  def unigramTrain(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      tokenPattern: String = "[a-z]+",
      maxTokenLen: Int = 8,
      seedSize: Int = 0, // 0 = 4 × vocabSize
      emRounds: Int = 2): DataFrame = {
    require(vocabSize >= 2, "vocabSize must be >= 2")
    require(maxTokenLen >= 2, "maxTokenLen must be >= 2")
    require(emRounds >= 1, "emRounds must be >= 1")
    val seeds = if (seedSize <= 0) vocabSize * 4 else seedSize
    require(seeds >= vocabSize, s"seedSize $seeds < vocabSize $vocabSize")
    val spark = df.sparkSession
    import spark.implicits._
    val (wcPinned, wcPins) = Pins.pin(unigramWordCounts(df, textCol, tokenPattern))
    try {
      val (chars, multis) = unigramSeed(wcPinned, maxTokenLen, seeds, "unigramTrain")
      def priced(entries: Array[(String, Long)]): (Seq[String], Seq[Long]) = {
        val total = entries.map(_._2).sum
        val sorted = entries.sortBy(_._1) // stable vocab order: token asc
        (sorted.map(_._1).toSeq,
          sorted.map(e => Math.round(Math.log(total.toDouble / e._2) * 1e9)).toSeq)
      }
      var (vocab, costs) = priced(chars ++ multis)
      var counted: Array[(String, Long)] = chars ++ multis
      var round = 0
      while (round < emRounds) {
        round += 1
        // E (hard): Viterbi usage counts under the current costs
        val use = wcPinned
          .select(col("cnt"),
            explode(LatticeEncodeExpr(col("word"), vocab, "[UNK]", costs)).as("piece"))
          .groupBy("piece").agg(sum(col("cnt")).as("n"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        require(!use.exists(_._1 == "[UNK]"),
          "unigramTrain: a word failed to segment — single-char coverage broken")
        // prune: chars are mandatory; multis keep the top block by
        // (count desc, token asc); unused pieces drop out. Char
        // membership is by SET (never Java String.length — a
        // supplementary-plane char is one code point, two UTF-16
        // units, and must not land in both blocks), and the token
        // tie-break is cpCompare — the binary-collation invariant the
        // Spark-side seed order and the DuckDB oracle share.
        val useMap = use.toMap
        val charSet = chars.map(_._1).toSet
        val keptChars = chars.map { case (c, _) => (c, useMap.getOrElse(c, 0L)) }
        val nMulti = math.max(0, vocabSize - chars.length)
        val keptMultis = use
          .filter { case (t, _) => !charSet(t) }
          .sortWith { case ((ta, na), (tb, nb)) =>
            if (na != nb) na > nb else Bpe.cpCompare(ta, tb) < 0 }
          .take(nMulti)
        counted = keptChars ++ keptMultis
        // M: reprice over the kept set (zero-count chars keep coverage
        // via a +1 floor on the count — a char the corpus never uses
        // standalone must stay encodable, at the worst cost)
        val floored = counted.map { case (t, n) => (t, math.max(n, 1L)) }
        val repriced = priced(floored)
        vocab = repriced._1
        costs = repriced._2
      }
      val countMap = counted.toMap
      vocab.zip(costs)
        .map { case (t, c) => (t, countMap.getOrElse(t, 0L), c) }
        .toDF("token", "cnt", "cost_nano")
    } finally Pins.release(wcPinned, wcPins)
  }

  /** TRAIN a unigram-LM vocabulary with Kudo 2018's SOFT EM — the
    * full §3.2 algorithm: the E-step computes EXPECTED piece counts
    * by forward-backward over every word's segmentation lattice
    * ([[LatticeExpectExpr]], one codegen scan over the distinct-word
    * table per round), the M-step renormalizes `logp(x) =
    * ln(E(x)/ΣE)`, and pruning ranks multi-char pieces by LIKELIHOOD
    * LOSS — Kudo's approximation `loss(x) = E(x)·(altCost(x) −
    * cost(x))` where `altCost(x)` is the Viterbi cost of segmenting
    * the piece's own string WITHOUT itself (computed on the driver
    * over the vocab-sized table; single characters are mandatory and
    * never pruned, so every string stays segmentable).
    *
    * Soft vs hard, honestly: expected counts are IEEE doubles whose
    * aggregation order is partition-dependent, so unlike
    * [[unigramTrain]] (the Viterbi/hard variant, bit-exact and fully
    * DuckDB-replayable) this trainer's outputs carry float noise at
    * the 1e-12 relative level. The q_unigram_em gate therefore pins
    * the prune-neutral configuration (`vocabSize == seedSize`, one EM
    * round) at MILLI-NAT granularity — a cross-engine-stable
    * discretization — while the prune path is spec-verified against
    * an independent driver reference.
    *
    * Returns `(token, e_count double, cost_milli bigint)` — final
    * expected counts and `round(ln(ΣE/E)·1e3)` milli-nat costs.
    */
  def unigramTrainSoft(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      tokenPattern: String = "[a-z]+",
      maxTokenLen: Int = 8,
      seedSize: Int = 0,
      emRounds: Int = 2): DataFrame = {
    require(vocabSize >= 2, "vocabSize must be >= 2")
    require(maxTokenLen >= 2, "maxTokenLen must be >= 2")
    require(emRounds >= 1, "emRounds must be >= 1")
    val seeds = if (seedSize <= 0) vocabSize * 4 else seedSize
    require(seeds >= vocabSize, s"seedSize $seeds < vocabSize $vocabSize")
    val spark = df.sparkSession
    import spark.implicits._
    val (wcPinned, wcPins) = Pins.pin(unigramWordCounts(df, textCol, tokenPattern))
    try {
      val (charsL, multisL) = unigramSeed(wcPinned, maxTokenLen, seeds, "unigramTrainSoft")
      val chars = charsL.map { case (t, n) => (t, n.toDouble) }
      val multis = multisL.map { case (t, n) => (t, n.toDouble) }
      // (vocab sorted token-asc, logp) from positive weights
      def priced(entries: Array[(String, Double)]): (IndexedSeq[String], Array[Double]) = {
        val total = entries.map(_._2).sum
        val sorted = entries.sortBy(_._1)
        (sorted.map(_._1).toIndexedSeq,
          sorted.map(e => math.log(e._2 / total)).toArray)
      }
      var (vocab, logp) = priced(chars ++ multis)
      var eCounts: Map[String, Double] =
        (chars ++ multis).toMap // placeholder until the first E-step
      val charSet = chars.map(_._1).toSet
      var round = 0
      while (round < emRounds) {
        round += 1
        // E: expected piece counts, corpus-weighted (forward-backward)
        val vSnap = vocab
        val use = wcPinned
          .select(col("cnt"),
            explode(LatticeExpectExpr(col("word"), vSnap, logp.toIndexedSeq)).as("p"))
          .groupBy(col("p.tid").as("tid"))
          .agg(sum(col("p.e") * col("cnt")).as("e"))
          .collect().map(r => (vSnap(r.getInt(0)), r.getDouble(1)))
        // prune multis by likelihood loss (chars mandatory): loss =
        // E(x) * (Viterbi cost of x's string without x - cost(x)) —
        // Kudo's alternative-encoding approximation
        val costOf = vocab.zip(logp).map { case (t, l) => (t, -l) }.toMap
        def altCost(piece: String): Double = {
          val n = piece.length
          val INF = Double.MaxValue
          val suf = Array.fill(n + 1)(INF); suf(n) = 0.0
          var i = n - 1
          while (i >= 0) {
            var l = 1
            val lim = math.min(maxTokenLen, n - i)
            while (l <= lim) {
              val sub = piece.substring(i, i + l)
              if (sub != piece) costOf.get(sub).foreach { c =>
                if (suf(i + l) != INF && c + suf(i + l) < suf(i))
                  suf(i) = c + suf(i + l)
              }
              l += 1
            }
            i -= 1
          }
          suf(0)
        }
        val useMap = use.toMap
        val keptChars = chars.map { case (c, _) => (c, useMap.getOrElse(c, 0.0)) }
        val nMulti = math.max(0, vocabSize - chars.length)
        val multiUse = use.filter { case (t, _) => !charSet(t) }
        val keptMultis =
          if (multiUse.length <= nMulti) multiUse
          else multiUse
            .map { case (t, e) => (t, e, e * (altCost(t) - costOf(t))) }
            // token tie-break by cpCompare — binary collation, like
            // every other driver-side order in the tokenizer family
            .sortWith { case ((ta, _, la), (tb, _, lb)) =>
              if (la != lb) la > lb else Bpe.cpCompare(ta, tb) < 0 }
            .take(nMulti)
            .map { case (t, e, _) => (t, e) }
        val kept = keptChars ++ keptMultis
        eCounts = kept.toMap
        // M: renormalize over the kept set (zero-count floor at 1e-9
        // so a never-used char keeps a finite worst-case prob)
        val repriced = priced(kept.map { case (t, e) => (t, math.max(e, 1e-9)) })
        vocab = repriced._1
        logp = repriced._2
      }
      vocab.zip(logp)
        .map { case (t, l) =>
          (t, eCounts.getOrElse(t, 0.0), Math.round(-l * 1e3)) }
        .toDF("token", "e_count", "cost_milli")
    } finally Pins.release(wcPinned, wcPins)
  }

}
