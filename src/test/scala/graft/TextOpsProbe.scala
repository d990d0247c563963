package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused probe for the round-5 text-op kernels (tfidf hash
  * dictionary, one-pass chunking) on the same 1M-doc synthetic corpus
  * ScaleProbe uses, without paying for the rest of the suite.
  * `sbt "Test/runMain graft.TextOpsProbe [docs]"`.
  */
object TextOpsProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val words = Array("spark", "query", "row", "data", "join", "filter",
      "window", "stream", "table", "scan", "merge", "sort", "key", "hash",
      "plan", "code", "node", "task", "stage", "shuffle")
    val wordsCol = array(words.toIndexedSeq.map(lit): _*)
    val docs = spark.range(nDocs).repartition(32).select(
      col("id"),
      concat_ws(" ", transform(sequence(lit(0), lit(49)),
        i => element_at(wordsCol, pmod(hash(col("id"), i), lit(20)) + 1))).as("text"))
    timed(s"tfidfTopTerms ($nDocs docs)") {
      functions.TextFunctions.tfidfTopTerms(docs, "id", "text", k = 3).count()
    }
    timed(s"chunkDocuments ($nDocs docs)") {
      functions.Curation.chunkDocuments(docs, "id", "text",
        maxTokens = 32, overlap = 8).count()
    }
    timed(s"unigramSurprisal ($nDocs docs)") {
      functions.TextFunctions.unigramSurprisal(docs, "id", "text")
        .agg(sum("nll_nano")).head()
    }
    timed(s"bigramLmScore ($nDocs docs, train=even score=odd)") {
      functions.TextFunctions.bigramLmScore(
          docs.filter(col("id") % 2 === 0), docs.filter(col("id") % 2 === 1),
          "id", "text")
        .agg(sum("nll_nano"), sum("n_backoff")).head()
    }
    // blocklist: automaton cost must be flat in pattern count; the
    // contains-chain strawman (what a naive pipeline runs) is linear
    // in it AND blows up the expression tree
    val rnd = new scala.util.Random(5)
    def randPats(n: Int): Seq[String] = (1 to n * 2).map(_ =>
        (1 to (2 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      .distinct.take(n)
    val pats1k = randPats(1000) ++ Seq("spark", "shuffle", "scan")
    timed(s"blocklistHits ($nDocs docs, ${pats1k.size} patterns, AC kernel)") {
      functions.Blocklist.hits(docs, "id", "text", pats1k)
        .agg(sum("n_hits")).head()
    }
    val pats100 = pats1k.take(97) ++ Seq("spark", "shuffle", "scan")
    timed(s"blocklistHits ($nDocs docs, 100 patterns, AC kernel)") {
      functions.Blocklist.hits(docs, "id", "text", pats100)
        .agg(sum("n_hits")).head()
    }
    timed(s"contains-chain strawman ($nDocs docs, 100 patterns)") {
      docs.select(pats100.map(p =>
          (length(col("text")) - length(replace(col("text"), lit(p), lit(""))))
            .cast("long").as(s"c")).reduce(_ + _).as("n"))
        .agg(sum("n")).head()
    }
    timed(s"cdcChunks ($nDocs docs, w=16 d=64)") {
      functions.Cdc.chunks(docs, "id", "text")
        .agg(count(lit(1)), sum("len")).head()
    }
    timed(s"trigramLmScore ($nDocs docs, train=even score=odd)") {
      functions.TextFunctions.trigramLmScore(
          docs.filter(col("id") % 2 === 0), docs.filter(col("id") % 2 === 1),
          "id", "text")
        .agg(sum("nll_nano"), sum("n_backoff")).head()
    }
    timed(s"approxNgramDiversity ($nDocs docs, 32 domains)") {
      functions.TextFunctions.approxNgramDiversity(
          docs.withColumn("dom", pmod(col("id"), lit(32))), "dom", "text")
        .count()
    }
    // containment / jaccard probe corpus: 50k vocab (the 20-word corpus
    // above is pathologically self-similar — every shingle is shared),
    // every 50th doc a truncated copy of its predecessor so exactly
    // nDocs/50 planted containment pairs exist
    val wide = spark.range(nDocs).repartition(32)
      .withColumn("eff", when(col("id") % 50 === 49, col("id") - 1).otherwise(col("id")))
      .withColumn("len", when(col("id") % 50 === 49, lit(24)).otherwise(lit(49)))
      .select(col("id"), concat_ws(" ",
        transform(sequence(lit(0), col("len")),
          i => concat(lit("w"), pmod(hash(col("eff"), i), lit(50000))))).as("text"))
      .localCheckpoint(true)
    timed(s"dsirResample ($nDocs docs, 10k target)") {
      val target = wide.filter(col("id") % 100 === 0).select("id", "text")
      functions.Curation.dsirResample(wide, "id", "text", target, "text",
        k = 1000).count()
    }
    timed(s"containmentPairs ($nDocs docs, 50k vocab)") {
      val n = functions.Dedup.containmentPairs(wide, "id", "text", threshold = 0.9).count()
      println(s"        containment pairs = $n (planted ${nDocs / 50})")
    }
    timed(s"ngramJaccardPairs ($nDocs docs, 50k vocab)") {
      functions.Dedup.ngramJaccardPairs(wide, "id", "text", threshold = 0.4).count()
    }
    // block-combination simhash join: the planted truncated copies are
    // ~half-overlap (hamming >> 3), so TRUE pairs stay near zero and
    // the probe measures the candidate machinery on the adversarial
    // (uniform random fingerprints) corpus — 20 tables x 32-bit keys;
    // recall is spec'd in FunctionsSpec. The naive 4x16-bit split
    // measured 106 s here (27M false candidates, n²/2^16).
    timed(s"simhashPairs ($nDocs docs, 50k vocab, ham<=3)") {
      val n = functions.Dedup.simhashPairs(wide, "id", "text").count()
      println(s"        simhash pairs = $n")
    }
    // span removal on the wide corpus: each planted truncated copy
    // shares its full 25-token prefix with its predecessor, so the
    // duplicated slice is ~2/50 of all docs
    timed(s"removeDuplicatedSpans ($nDocs docs, 50k vocab)") {
      val r = functions.Dedup.removeDuplicatedSpans(wide, "id", "text")
        .agg(sum("n_removed_tokens")).head().getLong(0)
      println(s"        tokens removed = $r")
    }
    // line dedup over multi-line docs: re-chunk each 50-token doc into
    // 8-word lines (the gate's construction); planted copies repeat
    // their predecessor's lines
    timed(s"dedupLines ($nDocs docs, 8-word lines)") {
      val ws = split(col("text"), " ")
      val lined = wide.select(col("id"), array_join(
        transform(sequence(lit(0L), greatest(ceil(size(ws) / lit(8.0)).cast("long"), lit(1L)) - 1),
          i => array_join(slice(ws, (i * 8 + 1).cast("int"), lit(8)), " ")),
        "\n").as("text"))
      val r = functions.Curation.dedupLines(lined, "id", "text")
        .agg(sum("n_removed")).head().getLong(0)
      println(s"        lines removed = $r")
    }
    timed(s"normalizeUnicode NFC scan ($nDocs docs)") {
      docs.select(sum(length(
        functions.TextFunctions.normalizeUnicode(col("text"))))).head()
    }
    // hashed classifier: train on two disjoint halves (cost probe, not
    // a separation probe), then score the whole corpus both ways
    val wTbl = timed(s"trainTokenClassifier ($nDocs docs)") {
      functions.Curation.trainTokenClassifier(
        wide.filter(col("id") % 2 === 0), "text",
        wide.filter(col("id") % 2 === 1), "text").localCheckpoint(true)
    }
    timed(s"classifierScore join path ($nDocs docs, forced)") {
      // scanMaxBuckets=2 forces the feature-explode join (the r9
      // default auto-selects the scan kernel on full-spine tables)
      functions.Curation.classifierScore(wide, "id", "text", wTbl,
          scanMaxBuckets = 2)
        .agg(sum("logit_nano")).head()
    }
    timed(s"classifierScore auto (r9 scan default, $nDocs docs)") {
      functions.Curation.classifierScore(wide, "id", "text", wTbl)
        .agg(sum("logit_nano")).head()
    }
    val wArr = functions.Curation.collectClassifierWeights(wTbl)
    timed(s"classifierScoreScan kernel ($nDocs docs)") {
      functions.Curation.classifierScoreScan(wide, "id", "text", wArr)
        .agg(sum("logit_nano")).head()
    }
    // per-domain cap under pathological skew: 80% of the corpus in ONE
    // domain — the shape that melts a row_number window (800k-row
    // single-task sort); the bounded bottom-k never buffers > 2*cap
    val domained = wide.withColumn("domain",
      when(col("id") % 10 < 8, lit("hot.example.com"))
        .otherwise(concat(lit("d"), pmod(col("id"), lit(1000)), lit(".example.com"))))
    timed(s"capPerDomain ($nDocs docs, 80% one domain, cap=100)") {
      val n = functions.Curation.capPerDomain(domained, "id", "domain", cap = 100).count()
      println(s"        kept = $n")
    }
    timed(s"mixtureByTemperature ($nDocs docs, alpha=0.5)") {
      functions.Curation.mixtureByTemperature(
        domained, "domain", col("id"), targetRows = nDocs / 2).count()
    }
    timed(s"filterByDomains suffix chain ($nDocs docs)") {
      functions.Curation.filterByDomains(domained, "domain",
        Seq("hot.example.com", "d7.example.com")).count()
    }
    timed(s"hostOf + registeredDomain scan ($nDocs docs)") {
      val url = concat(lit("https://user@"), col("domain"), lit(":8443/p/"), col("id"))
      domained.select(functions.TextFunctions.registeredDomain(
        functions.TextFunctions.hostOf(url)).as("rd"))
        .groupBy("rd").count().count()
    }
    spark.stop()
  }
}
