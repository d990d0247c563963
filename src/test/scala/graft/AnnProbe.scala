package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving-latency probe for the persisted IVF-PQ layout: at 1M+
  * vectors, compare a top-k answered by the inline-encode path
  * (ivfPqTopK — full scan, coarse assign + m sub-assigns per row,
  * per query) against the stored-codes path (ivfPqTopKFromCodes over
  * saveIvfPqEncoded's cell-partitioned layout — partition-pruned scan
  * of m-byte codes + one broadcast ADC join). The gate corpus (2k
  * vectors) proves bit-equality; this records the latency gap the
  * layout exists for.
  *
  * `sbt "Test/runMain graft.AnnProbe [nVecs] [coarseK] [nProbe]"`.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val coarseK = args.lift(1).map(_.toInt).getOrElse(64)
    val nProbe = args.lift(2).map(_.toInt).getOrElse(4)
    val dim = 64
    val m = 8
    val k = 16
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-52s $s%8.2f s")
      (r, s)
    }

    // deterministic dense vectors: hash-derived floats in [-1, 1)
    val vecs = spark.range(nVecs).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => ((pmod(hash(col("id"), j), lit(20001)) - lit(10000)) / lit(10000.0))
          .cast("float")).as("embedding"))
    vecs.write.mode("overwrite").parquet("/tmp/ann_probe_vecs")
    val saved = spark.read.parquet("/tmp/ann_probe_vecs")

    val scale = functions.Similarity.kmeansGlobalScale(saved, "embedding")
    val ((coarse, cbs), _) = timed(s"ivfPqFit ($nVecs vecs, coarseK=$coarseK, m=$m, k=$k)") {
      functions.Similarity.ivfPqFit(saved, "vec_id", "embedding",
        coarseK = coarseK, m = m, k = k, iters = 2, scale = scale)
    }
    val (_, tSave) = timed("saveIvfPqEncoded (encode once, partitioned by cell)") {
      functions.Similarity.saveIvfPqEncoded(saved, "vec_id", "embedding",
        scale, coarse, cbs, "/tmp/ann_probe_codes")
    }
    val codes = spark.read.parquet("/tmp/ann_probe_codes")
    val query = saved.filter(col("vec_id") === 42).head.getSeq[Float](1)

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val recompute = (1 to 3).map { i =>
      timed(s"ivfPqTopK recompute path (run $i)") {
        functions.Similarity.ivfPqTopK(saved, "vec_id", "embedding", query,
          kTop = 10, scale = scale, coarse = coarse, codebooks = cbs,
          nProbe = nProbe).collect()
      }._2
    }
    val persisted = (1 to 3).map { i =>
      timed(s"ivfPqTopKFromCodes persisted path (run $i)") {
        functions.Similarity.ivfPqTopKFromCodes(codes, "vec_id", query,
          kTop = 10, scale = scale, coarse = coarse, codebooks = cbs,
          nProbe = nProbe).collect()
      }._2
    }
    // the two paths must agree bit-for-bit at probe scale too
    val a = functions.Similarity.ivfPqTopK(saved, "vec_id", "embedding", query,
      kTop = 10, scale = scale, coarse = coarse, codebooks = cbs, nProbe = nProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = functions.Similarity.ivfPqTopKFromCodes(codes, "vec_id", query,
      kTop = 10, scale = scale, coarse = coarse, codebooks = cbs, nProbe = nProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    require(a == b, s"persisted top-k diverged:\n$a\nvs\n$b")
    println(f"[probe] ANN serving at $nVecs%d vecs, nProbe=$nProbe/$coarseK: " +
      f"recompute ${median(recompute)}%.2f s vs persisted ${median(persisted)}%.2f s " +
      f"(${median(recompute) / median(persisted)}%.1fx; one-time encode+store $tSave%.1f s; " +
      f"top-10 bit-equal)")

    // bulk retrieval: a query TABLE against the same stored codes —
    // per-query probes, one DPP-pruned equi-join, bottom-k agg
    val nQueries = args.lift(3).map(_.toInt).getOrElse(1000)
    val queries = saved.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val (nOut, tKnn) = timed(s"ivfPqKnnJoin ($nQueries queries x top-10, nProbe=$nProbe)") {
      functions.Similarity.ivfPqKnnJoin(queries, "query_id", "embedding",
        codes, "vec_id", k = 10, scale = scale, coarse = coarse,
        codebooks = cbs, nProbe = nProbe).count()
    }
    println(f"[probe] bulk retrieval: $nOut%d result rows, " +
      f"${nQueries / tKnn}%.0f queries/s against $nVecs%d stored codes")

    // LIVING-INDEX maintenance: rebuild the same layout as 16 append
    // batches (the streaming-ingest fragmentation shape), record file
    // count + serving latency, compact, record again — the number the
    // compactor exists for.
    val fragDir = "/tmp/ann_probe_frag"
    val (_, tFrag) = timed("fragmented build (16 append batches)") {
      functions.Similarity.saveIvfPqEncoded(
        saved.filter(col("vec_id") % 16 === 0), "vec_id", "embedding",
        scale, coarse, cbs, fragDir)
      (1 to 15).foreach { i =>
        functions.Similarity.appendIvfPqEncoded(
          saved.filter(col("vec_id") % 16 === i), "vec_id", "embedding",
          scale, coarse, cbs, fragDir)
      }
    }
    def layoutFiles(dir: String): Int = {
      val d = new java.io.File(dir)
      d.listFiles().filter(_.isDirectory)
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    }
    val filesBefore = layoutFiles(fragDir)
    val fragServe = (1 to 3).map { i =>
      timed(s"topKFromCodes over FRAGMENTED layout (run $i)") {
        functions.Similarity.ivfPqTopKFromCodes(spark.read.parquet(fragDir),
          "vec_id", query, kTop = 10, scale = scale, coarse = coarse,
          codebooks = cbs, nProbe = nProbe).collect()
      }._2
    }
    val fragTop = functions.Similarity.ivfPqTopKFromCodes(
        spark.read.parquet(fragDir), "vec_id", query, kTop = 10,
        scale = scale, coarse = coarse, codebooks = cbs, nProbe = nProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val (_, tCompact) = timed("compactIvfPqLayout (1 file/cell, staged swap)") {
      functions.Similarity.compactIvfPqLayout(spark, fragDir, filesPerCell = 1)
    }
    val filesAfter = layoutFiles(fragDir)
    val compServe = (1 to 3).map { i =>
      timed(s"topKFromCodes over COMPACTED layout (run $i)") {
        functions.Similarity.ivfPqTopKFromCodes(spark.read.parquet(fragDir),
          "vec_id", query, kTop = 10, scale = scale, coarse = coarse,
          codebooks = cbs, nProbe = nProbe).collect()
      }._2
    }
    val compTop = functions.Similarity.ivfPqTopKFromCodes(
        spark.read.parquet(fragDir), "vec_id", query, kTop = 10,
        scale = scale, coarse = coarse, codebooks = cbs, nProbe = nProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    require(compTop == fragTop && compTop == b,
      s"compaction changed the top-k:\n$compTop\nvs\n$fragTop\nvs\n$b")
    println(f"[probe] compaction at $nVecs%d vecs: $filesBefore%d files -> " +
      f"$filesAfter%d (compact pass $tCompact%.1f s, 16-batch build $tFrag%.1f s); " +
      f"serve ${median(fragServe)}%.2f s fragmented vs ${median(compServe)}%.2f s " +
      f"compacted; top-10 bit-equal to the one-shot layout")

    // RECALL observability + RE-FIT migration at probe scale: the
    // recall report is one bulk retrieval + one O(sample x corpus)
    // exact pass — the sample size is the cost knob; the refit is a
    // full fit + re-encode + staged swap (the migration an operator
    // schedules when the report's recall falls).
    val rq = saved.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val (rep, tRecall) = timed("ivfPqRecallReport (100-query sample, k=10)") {
      functions.Similarity.ivfPqRecallReport(codes, saved, rq,
          "query_id", "embedding", "vec_id", "embedding", k = 10,
          scale = scale, coarse = coarse, codebooks = cbs, nProbe = nProbe)
        .agg(sum("n_hit").as("h"), sum("n_true").as("t")).head
    }
    println(f"[probe] recall report at $nVecs%d vecs: overall recall@10 " +
      f"${rep.getLong(0) * 1000 / rep.getLong(1)}%d permille " +
      f"(nProbe=$nProbe/$coarseK), pass $tRecall%.1f s")
    val (refitParams, tRefit) = timed("refitIvfPqLayout (fit + re-encode + swap)") {
      functions.Similarity.refitIvfPqLayout(spark, fragDir, saved,
        "vec_id", "embedding", coarseK = coarseK, m = m, k = k, iters = 2)
    }
    println(f"[probe] refit migration at $nVecs%d vecs: $tRefit%.1f s end-to-end")

    // INCREMENTAL compaction at probe scale: dirty a few hot cells
    // (the steady-state ingest shape) and let the threshold pass
    // rewrite only those — the dirty-fraction win over the
    // whole-layout shuffle measured above
    val (rs, rc, rb) = refitParams
    val dirtyCells = spark.read.parquet(fragDir)
      .select("cell").distinct().orderBy("cell").limit(4)
      .collect().map(_.getInt(0))
    val hotIds = functions.Similarity.ivfPqEncode(saved, "vec_id", "embedding",
        rs, rc, rb)
      .filter(col("cell").isin(dirtyCells.map(Integer.valueOf): _*))
      .select("vec_id")
    val hotRows = saved.join(hotIds, "vec_id")
    (1 to 3).foreach { _ =>
      functions.Similarity.appendIvfPqEncoded(hotRows, "vec_id", "embedding",
        rs, rc, rb, fragDir)
    }
    val rQuery = saved.filter(col("vec_id") === 42).head.getSeq[Float](1)
    val preInc = functions.Similarity.ivfPqTopKFromCodes(
        spark.read.parquet(fragDir), "vec_id", rQuery, kTop = 10,
        scale = rs, coarse = rc, codebooks = rb, nProbe = nProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val (ranInc, tInc) = timed(
      s"compactIvfPqLayoutIfNeeded(incremental) — ${dirtyCells.length}/$coarseK dirty") {
      functions.Similarity.compactIvfPqLayoutIfNeeded(spark, fragDir,
        maxFilesPerCell = 4, incremental = true)
    }
    require(ranInc, "threshold pass should have fired on the dirtied cells")
    val postInc = functions.Similarity.ivfPqTopKFromCodes(
        spark.read.parquet(fragDir), "vec_id", rQuery, kTop = 10,
        scale = rs, coarse = rc, codebooks = rb, nProbe = nProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    require(postInc == preInc, "incremental compaction changed the top-k")
    println(f"[probe] incremental compaction: ${dirtyCells.length}%d/$coarseK%d " +
      f"dirty cells rewritten in $tInc%.1f s (whole-layout pass above: " +
      f"$tCompact%.1f s); top-10 bit-equal")

    // PER-CELL DELETE REPAIR at probe scale: a clustered delete batch
    // (every id of the 4 hot cells' sample, ~the shape of a tenant or
    // source purge) dirties only those cells — repairIvfPqCells must
    // cost ~the dirty fraction, not the whole-layout shuffle.
    val delIds = functions.Similarity.ivfPqEncode(saved, "vec_id", "embedding",
        rs, rc, rb)
      .filter(col("cell").isin(dirtyCells.map(Integer.valueOf): _*) &&
        pmod(col("vec_id"), lit(50)) === 0)
      .select("vec_id")
    val survivors = saved.join(delIds, Seq("vec_id"), "left_anti")
    val (repairedCells, tRepair) = timed(
      s"repairIvfPqCells (clustered delete, ~${dirtyCells.length}/$coarseK dirty)") {
      functions.Similarity.repairIvfPqCells(spark, fragDir, survivors, "vec_id")
    }
    println(f"[probe] per-cell delete repair: ${repairedCells.length}%d/$coarseK%d " +
      f"cells rewritten in $tRepair%.1f s (whole-layout rewrite benchmark: " +
      f"$tCompact%.1f s compact / $tRefit%.1f s refit)")
    spark.stop()
  }
}
