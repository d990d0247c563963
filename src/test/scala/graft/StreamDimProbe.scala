package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Throughput/state probe for the versioned-dim stream-stream as-of
  * join (`StreamIngest.enrichAsOfDimStream`): the q_stream_asof_dim
  * gate proves correctness on ~10k events; this drives ~1M keys with
  * multi-version dims ACROSS MANY MICRO-BATCHES and records, per
  * batch, the trigger wall time and the state-store row count — the
  * numbers that certify the O(#keys) state floor and the r12
  * sorted-merge state maintenance (a hot key receiving versions every
  * batch must not degrade quadratically).
  *
  * One key (key 0) is deliberately HOT: it receives `hotPerChunk`
  * dim versions in every chunk, so its retained-dims list is merged
  * into every single micro-batch — the exact shape the r11 ADVICE
  * flagged against the full re-sort.
  *
  * `sbt "Test/runMain graft.StreamDimProbe [nKeys] [chunks] [hotPerChunk]"`.
  */
object StreamDimProbe {
  def main(args: Array[String]): Unit = {
    val nKeys = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val chunks = args.lift(1).map(_.toInt).getOrElse(8)
    val hotPerChunk = args.lift(2).map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft-dimprobe")
    val srcDir = base.resolve("src").toString
    val ckDir = base.resolve("ck").toString

    // one file per chunk, written in time order (the file source lists
    // by mtime): every chunk carries one event + one dim version per
    // key in its own time band, plus the hot key's version burst —
    // so EVERY key's state is touched in EVERY micro-batch
    val bandUs = 1000L * 1000000L // 1000 s per chunk, in micros
    (0 until chunks).foreach { c =>
      val t0 = c.toLong * bandUs
      val rows = spark.range(nKeys).select(
        col("id").as("key"),
        // event in the middle of the band, dim version at its start —
        // the event's pick is this chunk's version (same-key, earlier)
        (lit(t0) + pmod(hash(col("id"), lit(c)), lit(bandUs / 2)) + lit(bandUs / 4))
          .as("t_us"),
        lit(false).as("is_dim"),
        (col("id") * lit(chunks.toLong) + lit(c.toLong)).as("id_ev"),
        lit(null).cast("string").as("payload"))
      val dims = spark.range(nKeys).select(
        col("id").as("key"),
        (lit(t0) + pmod(hash(col("id"), lit(c + 9000)), lit(bandUs / 4))).as("t_us"),
        lit(true).as("is_dim"),
        lit(-1L).as("id_ev"),
        concat(lit("v"), lit(c), lit("_"), col("id")).as("payload"))
      val hot = spark.range(hotPerChunk).select(
        lit(0L).as("key"),
        (lit(t0) + col("id") % lit(bandUs / 4)).as("t_us"),
        lit(true).as("is_dim"),
        lit(-1L).as("id_ev"),
        concat(lit("h"), lit(c), lit("_"), col("id")).as("payload"))
      rows.unionByName(dims).unionByName(hot)
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    val schema = "key long, t_us long, is_dim boolean, id_ev long, payload string"

    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      def onQueryStarted(e: QueryStartedEvent): Unit = ()
      def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val stateRows =
          if (p.stateOperators.nonEmpty) p.stateOperators(0).numRowsTotal else -1L
        batches += ((p.batchId, p.durationMs.get("triggerExecution").longValue(),
          stateRows))
      }
    })

    def src() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val enriched = graft.streaming.StreamIngest.enrichAsOfDimStream(
      src().filter(!col("is_dim"))
        .select(col("key"), col("t_us"), col("id_ev")),
      "key", "t_us", "id_ev",
      src().filter(col("is_dim"))
        .select(col("key"), col("t_us"), col("payload")),
      "key", "t_us", "payload",
      watermarkDelay = "1 second")

    val t0 = System.nanoTime()
    val q = enriched.writeStream
      .format("memory").queryName("dimprobe").outputMode("append")
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // listener events are async
    val out = spark.table("dimprobe")
    val n = out.count()
    val matched = out.filter(col("dim_t_us") >= 0).count()
    println(f"[probe] enrichAsOfDimStream $nKeys%d keys x $chunks%d chunks " +
      f"(+hot key $hotPerChunk%d versions/chunk): wall $wall%.1f s, " +
      f"emitted $n%d (matched $matched%d)")
    batches.sortBy(_._1).foreach { case (b, ms, st) =>
      println(f"[probe]   batch $b%2d: trigger ${ms / 1000.0}%7.2f s, state rows $st%d")
    }
    spark.stop()
  }
}
