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
    * lowercase, strip non [a-z0-9 ], collapse whitespace.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

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
  def corpusRarity(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxCount: Long = 2L): DataFrame = {
    val toks = filter(split(normalizeText(col(textCol)), " "), w => length(w) > 0)
    val exploded = df.select(col(idCol).as("id"), explode(toks).as("tok"))
    val counts = exploded.groupBy("tok").agg(count(lit(1)).as("_tc"))
    exploded.join(counts, "tok")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("_tc") <= maxCount, 1L).otherwise(0L)).as("n_rare"))
      .withColumn(
        "rare_frac",
        round(col("n_rare").cast("double") / col("n_tokens"), 6))
      .withColumnRenamed("id", idCol)
  }
}
