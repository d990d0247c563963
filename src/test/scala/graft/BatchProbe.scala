package graft

import org.apache.spark.sql.SparkSession

/** Round-count probe for BATCHED distributed BPE training on a
  * Zipf-ish vocabulary — the realistic corpus shape. BpeProbe's
  * 4.5M-word base-26 table has near-UNIFORM pair counts, the
  * adversarial case where exact batching's strict-dominance trim can
  * never fire; this probe measures both the exact and the opt-in
  * approximate mode on fast-decaying counts.
  * `sbt "Test/runMain graft.BatchProbe [nWords] [nMerges] [maxBatch]"`.
  *
  * r11 measurements (local[16], 200k words):
  *   exact   1000 merges: 313 rounds (3.2/round), 0.148 s/merge
  *   exact   4000 merges: 1752 rounds (2.3/round) — tail ties cluster
  *   approx  1000 merges:  81 rounds (12.3/round), 0.042 s/merge
  */
object BatchProbe {
  def main(args: Array[String]): Unit = {
    val nWords = args.lift(0).map(_.toInt).getOrElse(200000)
    val nMerges = args.lift(1).map(_.toInt).getOrElse(1000)
    val maxBatch = args.lift(2).map(_.toInt).getOrElse(64)

    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Zipf-ish weights via bounded word repetition (the trainer counts
    // word OCCURRENCES, so rank r repeats ~min(64, 10N/r) times — the
    // fast-decaying pair-count SHAPE is what this probe needs)
    val rnd = new scala.util.Random(7)
    val rows = (0 until nWords).flatMap { r =>
      val len = 3 + rnd.nextInt(10)
      val w = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val reps = math.max(1L, math.min(64L, (nWords.toLong * 10) / (r + 1))).toInt
      Seq.fill(reps)(w)
    }
    val docs = rows.grouped(512).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }
      .toSeq.toDF("id", "text")
    docs.write.mode("overwrite").parquet("/tmp/bpe_batch_probe")
    val saved = spark.read.parquet("/tmp/bpe_batch_probe")

    for (exact <- Seq(true, false)) {
      val t0 = System.nanoTime()
      val learned = functions.TextFunctions
        .bpeTrainDistributed(saved, "text", nMerges,
          maxBatch = maxBatch, exactBatch = exact)
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      val rounds = functions.TextFunctions.lastBpeTrainRounds
      val mode = if (exact) "exact " else "approx"
      println(f"[probe] BATCH zipf $mode: $learned merges in $rounds rounds " +
        f"(${learned.toDouble / rounds}%.1f merges/round), $secs%.1f s total, " +
        f"${secs / learned}%.3f s/merge, maxBatch=$maxBatch")
    }
    spark.stop()
  }
}
