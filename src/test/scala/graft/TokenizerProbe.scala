package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the r10 scan kernels at corpus scale:
  * greedy WordPiece vs uniform-lattice vs scored-lattice segmentation
  * over 1M distinct words with a 32k-token vocab (tokenizer-scale
  * trie), plus the Bloom build/probe pair at 10M keys / 2^26 bits.
  * All kernels are scan-side; the numbers are per-core segmentation /
  * screening throughput — the quantity that multiplies out to cluster
  * scale. `sbt "Test/runMain graft.TokenizerProbe [words]"`.
  */
object TokenizerProbe {
  def main(args: Array[String]): Unit = {
    val nWords = args.lift(0).map(_.toLong).getOrElse(1000000L)
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
      println(f"[probe] $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // ~1M words, len 3-12, 26-letter alphabet (hash-derived)
    val wordsDf = spark.range(nWords).repartition(32)
      .selectExpr(
        "concat_ws('', transform(sequence(0, pmod(hash(id, 7), 26) % 10 + 2), " +
          "i -> chr(97 + pmod(hash(id, i), 26)))) AS w")
      .localCheckpoint(true)
    val rnd = new scala.util.Random(7)
    val vocab = (('a' to 'z').map(_.toString) ++
      (1 to 32000).map(_ => (1 to 2 + rnd.nextInt(6))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)).distinct
    val costs = vocab.map(v => (math.abs(v.hashCode).toLong % 30000000000L))
    println(s"[probe] vocab ${vocab.size} tokens, $nWords words")
    for (round <- 1 to 2) {
      timed(s"WordpieceExpr greedy #$round") {
        val n = wordsDf.select(size(functions.WordpieceExpr(
          col("w"), vocab, continuationPrefix = "")).as("n"))
          .agg(sum("n")).head().getLong(0)
        println(s"        greedy pieces = $n")
      }
      timed(s"LatticeEncodeExpr uniform #$round") {
        val n = wordsDf.select(size(functions.LatticeEncodeExpr(
          col("w"), vocab)).as("n"))
          .agg(sum("n")).head().getLong(0)
        println(s"        lattice pieces = $n")
      }
      timed(s"LatticeEncodeExpr scored #$round") {
        val n = wordsDf.select(size(functions.LatticeEncodeExpr(
          col("w"), vocab, costs = costs)).as("n"))
          .agg(sum("n")).head().getLong(0)
        println(s"        scored pieces = $n")
      }
    }

    // ---- Unigram-LM training at 1M distinct words (r11) -------------
    // hard (Viterbi) EM: seed substring counts are the heavy job
    // (~40M occurrence rows -> distinct-substring fold); each EM round
    // is one codegen lattice scan + a key-sized fold
    timed("unigramTrain 1M words vocab=2000 seed=8000 2 rounds") {
      val v = functions.TextFunctions.unigramTrain(
        wordsDf.toDF("w"), "w", vocabSize = 2000, tokenPattern = "[a-z]+",
        maxTokenLen = 6, seedSize = 8000, emRounds = 2)
      println(s"        vocab rows = ${v.count()}")
    }
    // soft (forward-backward) EM, prune-neutral round
    timed("unigramTrainSoft 1M words seed=2000 1 round") {
      val v = functions.TextFunctions.unigramTrainSoft(
        wordsDf.toDF("w"), "w", vocabSize = 2000, tokenPattern = "[a-z]+",
        maxTokenLen = 6, seedSize = 2000, emRounds = 1)
      println(s"        vocab rows = ${v.count()}")
    }

    // ---- Winnowing at 1M docs (r10 verdict item 5) ------------------
    // 40-word docs; 30% carry a shared 12-word boilerplate sentence —
    // the hot-fingerprint case the maxBucket cap exists for. Measures
    // fingerprint scan throughput, the match join, and the cap's
    // actual drop rate on this corpus.
    val nDocs = nWords
    val boiler = "terms of service apply all rights reserved click here to unsubscribe now"
    val docsDf = spark.range(nDocs).repartition(32)
      .selectExpr("id AS doc_id",
        "concat(CASE WHEN id % 10 < 3 THEN '" + boiler + " ' ELSE '' END, " +
          "concat_ws(' ', transform(sequence(0, 39), " +
          "i -> concat('tok', pmod(hash(id, i), 50000))))) AS text")
      .localCheckpoint(true)
    for (round <- 1 to 2) {
      val fp = timed(s"winnowFingerprints 1M docs k=8 w=8 #$round") {
        val f = functions.Dedup
          .winnowFingerprints(docsDf, "doc_id", "text", k = 8, w = 8)
          .localCheckpoint(true)
        println(s"        fingerprints = ${f.count()}")
        f
      }
      if (round == 2) {
        val buckets = fp.groupBy("h").count()
        val stats = buckets.agg(
          count(lit(1)), sum(when(col("count") > 1000, 1).otherwise(0)),
          sum(when(col("count") > 1000, col("count")).otherwise(0)), sum("count"))
          .head()
        println(s"        distinct h = ${stats.getLong(0)}, " +
          s"buckets>1000 = ${stats.getLong(1)} " +
          s"(${stats.getLong(2)} of ${stats.getLong(3)} rows dropped by the cap)")
      }
      timed(s"winnowMatches 1M docs #$round") {
        val m = functions.Dedup.winnowMatches(docsDf, "doc_id", "text",
          k = 8, w = 8, minShared = 2)
        println(s"        match pairs = ${m.count()}")
      }
    }

    // ---- Bloom at 10M keys / 2^26 bits / k=6 ------------------------
    val nKeys = nWords * 10
    val keys = spark.range(nKeys).repartition(32)
      .selectExpr("concat('key_', id) AS key", "id")
      .localCheckpoint(true)
    for (round <- 1 to 2) {
      val bloom = timed(s"bloomBuild 10M keys m=2^26 k=6 #$round") {
        val b = functions.Sketches.bloomBuild(keys, "key", 1 << 26, 6)
          .localCheckpoint(true)
        println(s"        words = ${b.count()}")
        b
      }
      timed(s"bloomProbe 10M keys #$round") {
        val hits = functions.Sketches.bloomProbe(keys, "id", "key", bloom, 1 << 26, 6)
          .filter(col("hit")).count()
        println(s"        hits = $hits / $nKeys (members: all must hit)")
        require(hits == nKeys, "false negative!")
      }
    }
    spark.stop()
  }
}
