package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the BPE tokenizer: driver-loop cost on a large
  * synthetic vocabulary (the gate corpus has 31 distinct words — it
  * exercises correctness, not scale) and the end-to-end train+encode
  * passes over a 1M-doc frame.
  * `sbt "Test/runMain graft.BpeProbe [nWords] [nMerges] [nDocs]"`.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val nWords = args.lift(0).map(_.toInt).getOrElse(200000)
    val nMerges = args.lift(1).map(_.toInt).getOrElse(1000)
    val nDocs = args.lift(2).map(_.toLong).getOrElse(1000000L)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // deterministic synthetic vocab: 3-12 lowercase chars, Zipf-ish
    // counts (rank r gets ~N/r) — the shape a minCount-floored 100 TB
    // vocabulary actually has
    val rnd = new scala.util.Random(7)
    val vocab: IndexedSeq[(String, Long)] = (0 until nWords).map { r =>
      val len = 3 + rnd.nextInt(10)
      val w = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      (w, math.max(1L, (nWords.toLong * 10) / (r + 1)))
    }.distinct

    println(s"[probe] vocab=${vocab.length} distinct words, merges=$nMerges")
    val merges = timed(s"Bpe.train driver loop (${vocab.length} words, $nMerges merges)") {
      functions.Bpe.train(vocab, nMerges)
    }
    println(s"[probe] learned ${merges.length} merges")

    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1M docs of 50 words drawn Zipf-ish from the synthetic vocab
    val wArr = vocab.map(_._1).toArray
    val bc = spark.sparkContext.broadcast(wArr)
    import spark.implicits._
    val docs = spark.range(nDocs).repartition(32).mapPartitions { it =>
      val words = bc.value
      it.map { r =>
        val id: Long = r
        var h = id * 0x9e3779b97f4a7c15L
        val sb = new StringBuilder
        var i = 0
        while (i < 50) {
          h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
          // Zipf-ish: square the uniform draw to bias to low ranks
          val u = ((h >>> 11).toDouble / (1L << 53).toDouble)
          val idx = math.min(words.length - 1, (u * u * words.length).toInt)
          if (i > 0) sb.append(' ')
          sb.append(words(idx))
          i += 1
        }
        (id, sb.toString)
      }
    }.toDF("id", "text")

    docs.write.mode("overwrite").parquet("/tmp/bpe_probe_docs")
    val saved = spark.read.parquet("/tmp/bpe_probe_docs")

    timed(s"bpeTrain end-to-end ($nDocs docs, $nMerges merges)") {
      functions.TextFunctions.bpeTrain(saved, "text", nMerges).count()
    }
    timed(s"bpeTokenCounts encode scan ($nDocs docs, ${merges.length} merges)") {
      functions.TextFunctions
        .bpeTokenCounts(saved, "id", "text", merges)
        .agg(sum("n_bpe_tokens")).head()
    }

    // --- distributed trainer PAST the driver cap -------------------
    // 4.5M distinct words (> bpeTrain's 4M maxWords default): the
    // driver path must refuse loud; bpeTrainDistributed must train.
    val nBig = args.lift(3).map(_.toLong).getOrElse(4500000L)
    val big = spark.range(nBig).mapPartitions { it =>
      it.map { id =>
        // distinct by construction: base-26 rendering of the id,
        // 'a'-padded to 6+ chars, prefixed to keep Zipf-free uniformity
        var x: Long = id
        val sb = new StringBuilder
        while (sb.length < 10) { sb.append(('a' + (x % 26)).toChar); x /= 26 }
        (id, sb.toString)
      }
    }.toDF("id", "text")
    big.write.mode("overwrite").parquet("/tmp/bpe_probe_big")
    val bigSaved = spark.read.parquet("/tmp/bpe_probe_big")
    val refused = timed(s"bpeTrain refuses loud at $nBig words") {
      try { functions.TextFunctions.bpeTrain(bigSaved, "text", 4).count(); false }
      catch { case e: IllegalArgumentException => e.getMessage.contains("maxWords") }
    }
    println(s"[probe] driver-path loud refusal: $refused")
    val t4 = System.nanoTime()
    timed(s"bpeTrainDistributed ($nBig distinct words, 4 merges)") {
      functions.TextFunctions.bpeTrainDistributed(bigSaved, "text", 4).count()
    }
    println(f"[probe] per-merge (4-merge run): ${(System.nanoTime() - t4) / 4e9}%6.2f s")
    // the real-vocab economics check: incremental pair maintenance
    // must hold its per-merge cost flat as the merge count grows —
    // the pre-r10 full-rescan shape paid the whole word table per
    // round (~21 s/round here), capping practical vocab size
    val nDeep = args.lift(4).map(_.toInt).getOrElse(256)
    val tD = System.nanoTime()
    val learned = timed(s"bpeTrainDistributed ($nBig distinct words, $nDeep merges)") {
      functions.TextFunctions.bpeTrainDistributed(bigSaved, "text", nDeep).count()
    }
    val roundsD = functions.TextFunctions.lastBpeTrainRounds
    println(f"[probe] per-merge ($nDeep-merge run): ${(System.nanoTime() - tD) / (nDeep * 1e9)}%6.2f s  " +
      f"(learned $learned in $roundsD rounds, ${nDeep.toDouble / roundsD}%4.1f merges/round)")
    // the opt-in approximate batch mode on the same (near-uniform,
    // exact-batch-adversarial) corpus — the round-floor contrast
    val tA = System.nanoTime()
    val learnedA = timed(s"bpeTrainDistributed approx ($nBig words, $nDeep merges)") {
      functions.TextFunctions
        .bpeTrainDistributed(bigSaved, "text", nDeep, exactBatch = false).count()
    }
    val roundsA = functions.TextFunctions.lastBpeTrainRounds
    println(f"[probe] per-merge approx ($nDeep-merge run): ${(System.nanoTime() - tA) / (nDeep * 1e9)}%6.2f s  " +
      f"(learned $learnedA in $roundsA rounds, ${nDeep.toDouble / roundsA}%4.1f merges/round)")

    // --- distributed WordPiece at the same shape -------------------
    // the likelihood arg-max adds two symbol-table joins + the
    // sym-delta fold per round — quantify the premium over BPE
    val nWp = args.lift(5).map(_.toInt).getOrElse(64)
    val tW = System.nanoTime()
    val wpLearned = timed(s"wordpieceTrainDistributed ($nBig distinct words, $nWp merges)") {
      functions.TextFunctions.wordpieceTrainDistributed(bigSaved, "text", nWp).count()
    }
    println(f"[probe] per-merge WordPiece ($nWp-merge run): ${(System.nanoTime() - tW) / (nWp * 1e9)}%6.2f s  (learned $wpLearned)")
    // the opt-in approximate WP batch mode (exact batching is proven
    // impossible under the likelihood score — this is WP's scale path)
    val tWa = System.nanoTime()
    val wpA = timed(s"wordpieceTrainDistributed approx ($nBig words, $nWp merges)") {
      functions.TextFunctions
        .wordpieceTrainDistributed(bigSaved, "text", nWp, approxMaxBatch = 16).count()
    }
    val wpRounds = functions.TextFunctions.lastWpTrainRounds
    println(f"[probe] per-merge WP approx ($nWp-merge run): ${(System.nanoTime() - tWa) / (nWp * 1e9)}%6.2f s  " +
      f"(learned $wpA in $wpRounds rounds, ${nWp.toDouble / wpRounds}%4.1f merges/round)")
    spark.stop()
  }
}
