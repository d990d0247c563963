package graft

import org.apache.spark.sql.SparkSession

/** The 30k-merge-class tokenizer REHEARSAL: one end-to-end
  * approximate-batch BPE training at a realistic vocabulary size on
  * the 4.5M-distinct-word table (BpeProbe's exact-batch-adversarial
  * corpus — near-uniform counts, so exact batching degenerates to ~1
  * merge/round and the approximate mode is the production path).
  * The r11 batching cure was measured at 256 merges; this validates
  * it at its actual design point and records wall clock, rounds, and
  * merges/round.
  *
  * `sbt "Test/runMain graft.BpeRehearsal [nBig] [nMerges] [maxBatch]"`.
  */
object BpeRehearsal {
  def main(args: Array[String]): Unit = {
    val nBig = args.lift(0).map(_.toLong).getOrElse(4500000L)
    val nMerges = args.lift(1).map(_.toInt).getOrElse(16384)
    val maxBatch = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // BpeProbe's big table, verbatim: distinct-by-construction base-26
    // renderings, 10 chars each — near-uniform pair counts
    val big = spark.range(nBig).mapPartitions { it =>
      it.map { id =>
        var x: Long = id
        val sb = new StringBuilder
        while (sb.length < 10) { sb.append(('a' + (x % 26)).toChar); x /= 26 }
        (id, sb.toString)
      }
    }.toDF("id", "text")
    big.write.mode("overwrite").parquet("/tmp/bpe_rehearsal_big")
    val saved = spark.read.parquet("/tmp/bpe_rehearsal_big")

    val t0 = System.nanoTime()
    val learned = functions.TextFunctions.bpeTrainDistributed(
      saved, "text", nMerges, maxBatch = maxBatch, exactBatch = false).count()
    val wall = (System.nanoTime() - t0) / 1e9
    val rounds = functions.TextFunctions.lastBpeTrainRounds
    println(f"[probe] bpeTrainDistributed approx ($nBig%d words, $nMerges%d merges, " +
      f"maxBatch=$maxBatch%d): wall $wall%.0f s, learned $learned%d in $rounds%d rounds " +
      f"(${learned.toDouble / rounds}%4.1f merges/round, ${wall / learned}%6.3f s/merge)")
    spark.stop()
  }
}
