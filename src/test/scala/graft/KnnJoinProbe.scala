package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Join-strategy sizing probe for [[graft.functions.Similarity.ivfPqKnnJoin]]
  * at a PRODUCTION codebook shape: the per-probe-row ADC table is
  * `m·k` longs (m=16, k=256 ⇒ 32 KiB/row), so a broadcast query side
  * costs `nQueries · nProbe · 32 KiB` — the r12 cost note said "size
  * the batch accordingly or pass broadcastQueries=false" without a
  * number. This measures both join modes across query-batch sizes
  * and records the crossover as a sizing rule (NOTES.md).
  *
  * `sbt "Test/runMain graft.KnnJoinProbe [nVecs] [nQueriesCsv]"`
  * (defaults 1M vectors, batches 1k/10k). Run with
  * SPARK_DRIVER_MEM=48g — the 10k-query broadcast side alone is
  * ~2.5 GiB serialized.
  */
object KnnJoinProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val batches = args.lift(1).getOrElse("1000,10000")
      .split(",").map(_.trim.toInt).toSeq
    val dim = 64
    val coarseK = 64
    val m = 16
    val k = 256
    val nProbe = 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // the probe MEASURES the oversized-broadcast regime — lift the
      // 1 GiB default so the 10k-query broadcast run completes for a
      // number instead of dying at collection (the death itself is
      // recorded in NOTES: it IS what a default deployment hits)
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-60s $s%8.2f s")
      (r, s)
    }

    val vecs = spark.range(nVecs).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => ((pmod(hash(col("id"), j), lit(20001)) - lit(10000)) / lit(10000.0))
          .cast("float")).as("embedding"))
    vecs.write.mode("overwrite").parquet("/tmp/knn_probe_vecs")
    val saved = spark.read.parquet("/tmp/knn_probe_vecs")

    val scale = functions.Similarity.kmeansGlobalScale(saved, "embedding")
    val ((coarse, cbs), _) =
      timed(s"ivfPqFit ($nVecs vecs, coarseK=$coarseK, m=$m, k=$k, iters=1)") {
        functions.Similarity.ivfPqFit(saved, "vec_id", "embedding",
          coarseK = coarseK, m = m, k = k, iters = 1, scale = scale)
      }
    timed("saveIvfPqEncoded (m=16 codes, partitioned by cell)") {
      functions.Similarity.saveIvfPqEncoded(saved, "vec_id", "embedding",
        scale, coarse, cbs, "/tmp/knn_probe_codes")
    }
    val codes = spark.read.parquet("/tmp/knn_probe_codes")

    val tblKb = m * k * 8 / 1024
    for (nq <- batches) {
      val queries = saved.filter(col("vec_id") < nq)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val bcastMb = nq.toLong * nProbe * m * k * 8 / (1024.0 * 1024.0)
      println(f"[probe] batch $nq%d queries: probe side = ${nq * nProbe}%d rows x " +
        f"$tblKb%d KiB tables = $bcastMb%.0f MiB pre-serialization")
      for (bcast <- Seq(true, false)) {
        val (n, t) = timed(s"ivfPqKnnJoin nq=$nq broadcastQueries=$bcast") {
          functions.Similarity.ivfPqKnnJoin(queries, "query_id", "embedding",
            codes, "vec_id", k = 10, scale = scale, coarse = coarse,
            codebooks = cbs, nProbe = nProbe,
            broadcastQueries = Some(bcast)).count()
        }
        println(f"[probe] nq=$nq%d bcast=$bcast: $n%d rows, ${nq / t}%.1f queries/s")
      }
      val autoPick = nq.toLong * nProbe * m * k * 8 <=
        functions.Similarity.KnnBroadcastBytesMax
      val (_, tAuto) = timed(s"ivfPqKnnJoin nq=$nq AUTO (picks bcast=$autoPick)") {
        functions.Similarity.ivfPqKnnJoin(queries, "query_id", "embedding",
          codes, "vec_id", k = 10, scale = scale, coarse = coarse,
          codebooks = cbs, nProbe = nProbe).count()
      }
      println(f"[probe] nq=$nq%d auto: ${nq / tAuto}%.1f queries/s")
    }
    spark.stop()
  }
}
