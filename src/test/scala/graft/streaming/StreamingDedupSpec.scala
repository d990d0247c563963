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
}
