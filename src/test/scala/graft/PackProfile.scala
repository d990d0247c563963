package graft

import graft.functions.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off breakdown of packSequences phase costs — the q_token_pack
  * bench creep investigation (r2 1.28 s → r3 1.46 s at sf0.1).
  * `sbt "Test/runMain graft.PackProfile [rows]"`.
  */
object PackProfile {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pack] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // --- ScaleProbe-size synthetic --------------------------------
    val docs = spark.range(n).toDF("doc_id")
      .withColumn("n_tokens", (pmod(hash(col("doc_id")), lit(900)) + 100).cast("long"))
    timed(s"input count ($n rows)") { docs.count() }
    val parted = docs.repartitionByRange(64, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__tok", col("n_tokens"))
    timed("range-exchange + sort + cache") { parted.cache().count() }
    timed("phase-1 per-partition totals collect") {
      parted.groupBy(col("__pid")).agg(sum(col("__tok"))).collect()
    }
    timed("full packSequencesRun (lazy, scoped cache) + count") {
      Curation.packSequencesRun(docs, col("n_tokens"), 4096L,
        Seq(col("doc_id")), numPartitions = 64)(_.count())
    }
    timed("full packSequences (pin)") {
      Curation.packSequences(docs, col("n_tokens"), 4096L,
        Seq(col("doc_id")), numPartitions = 64).count()
    }
    parted.unpersist()

    // --- the sf0.1 gate shape (documents + TextStatsExpr) ----------
    val sf = "/root/testdata/sf0.1"
    val tok = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextStatsExpr(col("text"))
          .getField("n_tokens").cast("long").as("n_tokens"))
    for (i <- 1 to 3) {
      timed(s"gate shape packSequencesRun (run $i)") {
        Curation.packSequencesRun(tok, col("n_tokens"), 2048L,
          Seq(col("doc_id")), numPartitions = 8)(_.count())
      }
      timed(s"gate shape packSequences pin (run $i)") {
        Curation.packSequences(tok, col("n_tokens"), 2048L,
          Seq(col("doc_id")), numPartitions = 8).count()
      }
    }
    spark.stop()
  }
}
