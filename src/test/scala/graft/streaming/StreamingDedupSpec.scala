package graft.streaming

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming exact dedup: first arrival per key wins within the
  * watermark; state for old keys is EVICTED once the watermark passes
  * their expiry, so a key recurring much later is re-emitted — exactly
  * the bounded-state contract that lets the operator run forever.
  * Batch boundaries are forced by re-running an AvailableNow query
  * against a shared checkpoint (each run sees only the new file).
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("dropDuplicatesWithinWatermark dedups within, re-admits after eviction") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdd")
    val src = dir.resolve("in"); java.nio.file.Files.createDirectories(src)
    val chk = dir.resolve("chk").toString
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("t", DoubleType)))

    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def runBatch(): Seq[String] = {
      emitted.clear()
      val stream = spark.readStream.schema(schema).parquet(src.toString)
      val q = StreamIngest.streamingDedup(stream, Seq("k"), "t", "10 seconds")
        .writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("k").collect().foreach(r => emitted.add(r.getString(0)))
          ()
        }
        .start()
      q.awaitTermination()
      scala.jdk.CollectionConverters.CollectionHasAsScala(emitted).asScala.toSeq.sorted
    }

    // batch 1: duplicate A within one batch collapses; B kept
    Seq(("A", 0.0), ("A", 1.0), ("B", 5.0)).toDF("k", "t")
      .write.mode("append").parquet(src.toString)
    assert(runBatch() == Seq("A", "B"))

    // batch 2: A recurs while its state is still live -> dropped
    Seq(("A", 10000.0), ("C", 10005.0)).toDF("k", "t")
      .write.mode("append").parquet(src.toString)
    assert(runBatch() == Seq("C"))

    // batch 3: watermark (~9995s) long past A's expiry (t=0+10s) ->
    // state evicted, A re-admitted
    Seq(("A", 20000.0)).toDF("k", "t")
      .write.mode("append").parquet(src.toString)
    assert(runBatch() == Seq("A"))
  }

  test("screenStreamAgainstIndex: multi-batch union equals the batch screen") {
    import graft.functions.{Dedup, DedupExpressions}
    def doc(salt: Int): String =
      (0 until 25).map(i => s"tok${(i * 11 + salt * 7) % 400}").mkString(" ")
    // corpus 0..19; new docs 100..111, of which the even ones clone a
    // corpus doc (near-dup) and the odd ones are fresh
    val corpus = (0 until 20).map(i => (i.toLong, doc(i))).toDF("id", "text")
    val newDocs = (0 until 12).map { i =>
      (100L + i, if (i % 2 == 0) doc(i / 2) else doc(1000 + i))
    }.toDF("id", "text")
    val idx = Dedup.buildSignatureIndex(
      corpus.select(col("id"),
        DedupExpressions.minhashSig(col("text"), 64, 3).as("sig")))
    val base = java.nio.file.Files.createTempDirectory("graft-scr")
    val srcDir = base.resolve("src").toString
    newDocs.repartitionByRange(4, col("id")).write.parquet(srcDir)
    val outDir = base.resolve("out").toString
    var batches = 0
    val q = StreamIngest.screenStreamAgainstIndex(
      spark.readStream.schema(StructType(Seq(
          StructField("id", LongType), StructField("text", StringType))))
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      "id", "text", idx, threshold = 0.5, base.resolve("ck").toString) { (res, _) =>
      batches += 1
      res.write.mode("append").parquet(outDir)
    }
    q.awaitTermination()
    assert(batches >= 2, s"expected multiple micro-batches, got $batches")
    val streamed = spark.read.parquet(outDir)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val batch = Dedup.dedupAgainstIndex(newDocs, "id", "text", idx, 0.5)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(streamed == batch)
    assert((0 until 12).forall(i => streamed(100L + i).isDefined == (i % 2 == 0)))
  }
}
