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

  test("intervalJoinStreams: multi-batch stream-stream join equals the batch interval join") {
    val base = java.nio.file.Files.createTempDirectory("graft-ssj")
    val src = base.resolve("src").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("k", LongType),
      StructField("typ", StringType), StructField("t", DoubleType)))
    // user 1: click 10 -> buys at 50 (in), 200 (out of 100s gap), 5 (before)
    // user 2: click 100 -> buy 150 (in); buy arrives in an EARLIER file
    //   than its click (right-before-left order — the join must buffer)
    // user 3: buy only; user 4: click only
    val rows = Seq(
      (1L, 1L, "c", 10.0), (2L, 1L, "p", 50.0), (3L, 1L, "p", 200.0),
      (4L, 1L, "p", 5.0), (5L, 2L, "p", 150.0), (6L, 2L, "c", 100.0),
      (7L, 3L, "p", 30.0), (8L, 4L, "c", 40.0))
    // three files -> three micro-batches per side (maxFilesPerTrigger=1)
    rows.grouped(3).foreach { g =>
      g.toDF("id", "k", "typ", "t").coalesce(1).write.mode("append").parquet(src)
    }
    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("typ") === "c")
        .select(col("k").as("ck"), col("id").as("click_id"), col("t").as("ct")),
      df.filter(col("typ") === "p")
        .select(col("k").as("pk"), col("id").as("buy_id"), col("t").as("pt")))
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val (lc, rp) = (
      sides(spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)),
      sides(spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)))
    val q = StreamIngest.intervalJoinStreams(
        lc._1, rp._2, "ck", "pk", "ct", "pt",
        maxGap = "100 seconds", watermark = "1 hour")
      .writeStream.outputMode("append")
      .option("checkpointLocation", base.resolve("ck").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("click_id", "buy_id").collect()
          .foreach(r => out.add((r.getLong(0), r.getLong(1))))
        ()
      }
      .start()
    q.awaitTermination()
    val streamed = scala.jdk.CollectionConverters
      .CollectionHasAsScala(out).asScala.toSet
    // batch expectation: same interval condition, plain join
    val batch = rows.toDF("id", "k", "typ", "t")
    val (bc, bp) = (sides(batch)._1, sides(batch)._2)
    val expected = bc.join(bp,
        col("ck") === col("pk") &&
          col("pt") >= col("ct") && col("pt") <= col("ct") + lit(100.0))
      .select("click_id", "buy_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected == Set((1L, 2L), (6L, 5L)), s"fixture drifted: $expected")
    assert(streamed == expected,
      s"stream-stream join diverged: streamed=$streamed expected=$expected")
  }

  test("intervalJoinStreams left_outer: unmatched rows flush once the watermark passes") {
    val base = java.nio.file.Files.createTempDirectory("graft-ssjo")
    val src = base.resolve("src").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("k", LongType),
      StructField("typ", StringType), StructField("t", DoubleType)))
    // advancing timeline so the watermark can move without dropping
    // anything: u1 click->buy (match), u4 click never matched (must
    // flush as a null row), u5 buy arrives BEFORE its click
    // (right-before-left buffering), u2 matches in a later batch, u9
    // is the far-future watermark pusher (itself unflushable: final
    // wm 99900 < 100000 + 100)
    val files = Seq(
      Seq((1L, 1L, "c", 10.0), (2L, 1L, "p", 50.0), (3L, 4L, "c", 40.0),
        (7L, 5L, "p", 900.0)),
      Seq((4L, 2L, "c", 1000.0), (5L, 2L, "p", 1050.0), (8L, 5L, "c", 880.0)),
      Seq((6L, 9L, "c", 100000.0)))
    files.foreach(g =>
      g.toDF("id", "k", "typ", "t").coalesce(1).write.mode("append").parquet(src))
    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("typ") === "c")
        .select(col("k").as("ck"), col("id").as("click_id"), col("t").as("ct")),
      df.filter(col("typ") === "p")
        .select(col("k").as("pk"), col("id").as("buy_id"), col("t").as("pt")))
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val (lc, rp) = (
      sides(spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)),
      sides(spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)))
    val q = StreamIngest.intervalJoinStreams(
        lc._1, rp._2, "ck", "pk", "ct", "pt",
        maxGap = "100 seconds", watermark = "100 seconds", joinType = "left_outer")
      .writeStream.outputMode("append")
      .option("checkpointLocation", base.resolve("ck").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("click_id"), coalesce(col("buy_id"), lit(-1L)).as("buy_id"))
          .collect().foreach(r => out.add((r.getLong(0), r.getLong(1))))
        ()
      }
      .start()
    q.awaitTermination()
    val streamed = scala.jdk.CollectionConverters
      .CollectionHasAsScala(out).asScala.toSet
    assert(streamed == Set((1L, 2L), (4L, 5L), (8L, 7L), (3L, -1L)),
      s"left_outer stream diverged: $streamed")
    // == the batch left join restricted to the flushed region
    // (ct + maxGap < final watermark 99900)
    val batch = files.flatten.toDF("id", "k", "typ", "t")
    val (bc, bp) = (sides(batch)._1, sides(batch)._2)
    val expected = bc.filter(col("ct") + 100.0 < 99900.0)
      .join(bp,
        col("ck") === col("pk") &&
          col("pt") >= col("ct") && col("pt") <= col("ct") + lit(100.0),
        "left")
      .select(col("click_id"), coalesce(col("buy_id"), lit(-1L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == expected, s"batch twin diverged: $expected")
  }

  test("intervalJoinStreams right_outer/full_outer: symmetric flush contracts") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("k", LongType),
      StructField("typ", StringType), StructField("t", DoubleType)))
    // u1 click->buy match; u4 click never matched; u7 buy never
    // matched; u5 buy arrives BEFORE its click; u2 matches across
    // batches; u9 far-future click pushes the LEFT watermark (itself
    // unflushable as an unmatched left row: right wm stays at
    // 1050 - 100 = 950 < 100000 + 100)
    val files = Seq(
      Seq((1L, 1L, "c", 10.0), (2L, 1L, "p", 50.0), (3L, 4L, "c", 40.0),
        (7L, 5L, "p", 900.0), (9L, 7L, "p", 60.0)),
      Seq((4L, 2L, "c", 1000.0), (5L, 2L, "p", 1050.0), (8L, 5L, "c", 880.0)),
      Seq((6L, 9L, "c", 100000.0)))
    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("typ") === "c")
        .select(col("k").as("ck"), col("id").as("click_id"), col("t").as("ct")),
      df.filter(col("typ") === "p")
        .select(col("k").as("pk"), col("id").as("buy_id"), col("t").as("pt")))
    def run(joinType: String): Set[(Long, Long)] = {
      val base = java.nio.file.Files.createTempDirectory(s"graft-ssj-$joinType")
      val src = base.resolve("src").toString
      files.foreach(g =>
        g.toDF("id", "k", "typ", "t").coalesce(1).write.mode("append").parquet(src))
      val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      val (lc, rp) = (
        sides(spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)),
        sides(spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)))
      val q = StreamIngest.intervalJoinStreams(
          lc._1, rp._2, "ck", "pk", "ct", "pt",
          maxGap = "100 seconds", watermark = "100 seconds", joinType = joinType)
        .writeStream.outputMode("append")
        .option("checkpointLocation", base.resolve("ck").toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select(coalesce(col("click_id"), lit(-1L)).as("click_id"),
              coalesce(col("buy_id"), lit(-1L)).as("buy_id"))
            .collect().foreach(r => out.add((r.getLong(0), r.getLong(1))))
          ()
        }
        .start()
      q.awaitTermination()
      scala.jdk.CollectionConverters.CollectionHasAsScala(out).asScala.toSet
    }
    // right_outer: the unmatched buy (u7) flushes once the LEFT
    // watermark (99900, from the pusher click) passes its time 60;
    // unmatched clicks never emit
    assert(run("right_outer") == Set((1L, 2L), (4L, 5L), (8L, 7L), (-1L, 9L)),
      "right_outer stream diverged")
    // full_outer: both unmatched sides flush; the pusher click stays
    // buffered (tail contract — right wm 950 < 100000 + 100)
    assert(run("full_outer") ==
      Set((1L, 2L), (4L, 5L), (8L, 7L), (3L, -1L), (-1L, 9L)),
      "full_outer stream diverged")
    intercept[IllegalArgumentException] {
      StreamIngest.intervalJoinStreams(
        sides(files.flatten.toDF("id", "k", "typ", "t"))._1,
        sides(files.flatten.toDF("id", "k", "typ", "t"))._2,
        "ck", "pk", "ct", "pt", joinType = "cross")
    }
  }

  test("enrichAsOfDimStream: versioned-dim STREAM as-of under the flushed-region contract") {
    import graft.streaming.AsOfDimOut
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("t_us", LongType),
      StructField("typ", StringType), StructField("id", LongType),
      StructField("payload", StringType)))
    def us(sec: Long): Long = sec * 1000000L
    // batch 1: events BEFORE some of their dims (cross-batch buffering
    // is the operator's whole point); batch 2: the dims + more events,
    // incl. a same-time tie (k4, two versions at t=10 -> payload "b"
    // wins); batch 3: the watermark pusher (its own event stays
    // buffered — the tail contract)
    val files = Seq(
      Seq((1L, us(5), "e", 101L, null), (1L, us(10), "e", 102L, null),
        (3L, us(45), "e", 301L, null), (2L, us(20), "e", 201L, null),
        (1L, us(10), "d", -1L, "v1")),
      Seq((1L, us(50), "d", -1L, "v2"), (3L, us(40), "d", -1L, "w1"),
        (4L, us(10), "d", -1L, "a"), (4L, us(10), "d", -1L, "b"),
        (1L, us(30), "e", 103L, null), (1L, us(60), "e", 104L, null),
        (4L, us(15), "e", 401L, null)),
      Seq((9L, us(100000), "e", 901L, null)))
    val base = java.nio.file.Files.createTempDirectory("graft-asofdim")
    val src = base.resolve("src").toString
    files.foreach(g =>
      g.toDF("k", "t_us", "typ", "id", "payload")
        .coalesce(1).write.mode("append").parquet(src))
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String)]()
    def stream() =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    val q = StreamIngest.enrichAsOfDimStream(
        stream().filter(col("typ") === "e")
          .select(col("k"), col("t_us"), col("id")),
        "k", "t_us", "id",
        stream().filter(col("typ") === "d")
          .select(col("k"), col("t_us"), col("payload")),
        "k", "t_us", "payload",
        watermarkDelay = "100 seconds")
      .writeStream.outputMode("append")
      .option("checkpointLocation", base.resolve("ck").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[AsOfDimOut], _: Long) =>
        b.collect().foreach(r =>
          out.add((r.event_id, r.dim_t_us, Option(r.dim_payload).getOrElse("none"))))
        ()
      }
      .start()
    q.awaitTermination()
    val streamed = scala.jdk.CollectionConverters
      .CollectionHasAsScala(out).asScala.toSet
    assert(streamed == Set(
      (101L, -1L, "none"),       // before the key's first version
      (102L, us(10), "v1"),      // version time == event time: inclusive
      (103L, us(10), "v1"),
      (104L, us(50), "v2"),
      (201L, -1L, "none"),       // key with no dim at all
      (301L, us(40), "w1"),      // dim arrived a BATCH AFTER the event
      (401L, us(10), "b")),      // same-time versions: max payload wins
      s"streamed as-of diverged: $streamed")
    // == the batch as-of restricted to the flushed region (the pusher
    // event at 100000 > wm 99900 must stay buffered)
    val batch = files.flatten.toDF("k", "t_us", "typ", "id", "payload")
    val ev = batch.filter(col("typ") === "e" && col("t_us") <= lit(us(99900)))
      .select(col("k"), col("t_us").as("et"), col("id"))
    val dm = batch.filter(col("typ") === "d")
      .select(col("k").as("dk"), col("t_us").as("dt"), col("payload"))
    import org.apache.spark.sql.expressions.Window
    val expected = ev.join(dm, ev("k") === dm("dk") && col("dt") <= col("et"), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id"), col("et"))
          .orderBy(col("dt").desc_nulls_last, col("payload").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("id"), coalesce(col("dt"), lit(-1L)),
        coalesce(col("payload"), lit("none")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed == expected, s"batch twin diverged: $expected")
  }

  test("enrichAsOfDimStream contracts: code-point tie-break, null payload loud") {
    import graft.streaming.AsOfDimOut
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("t_us", LongType),
      StructField("typ", StringType), StructField("id", LongType),
      StructField("payload", StringType)))
    // same-time versions whose payloads ORDER DIFFERENTLY under Java
    // UTF-16 vs code-point comparison: U+10000 (surrogate pair, Java
    // "smaller") vs U+FFFD — the pick must be U+10000, the CODE-POINT
    // max, matching the oracle's binary VARCHAR collation
    val supp = new String(Character.toChars(0x10000))
    val bmp = "\uFFFD"
    def run(rows: Seq[(Long, Long, String, Long, String)]): Seq[AsOfDimOut] = {
      val base = java.nio.file.Files.createTempDirectory("graft-asofdim-c")
      val src = base.resolve("src").toString
      rows.toDF("k", "t_us", "typ", "id", "payload")
        .coalesce(1).write.mode("append").parquet(src)
      val out = new java.util.concurrent.ConcurrentLinkedQueue[AsOfDimOut]()
      def stream() = spark.readStream.schema(schema).parquet(src)
      val q = StreamIngest.enrichAsOfDimStream(
          stream().filter(col("typ") === "e").select(col("k"), col("t_us"), col("id")),
          "k", "t_us", "id",
          stream().filter(col("typ") === "d").select(col("k"), col("t_us"), col("payload")),
          "k", "t_us", "payload",
          watermarkDelay = "10 seconds")
        .writeStream.outputMode("append")
        .option("checkpointLocation", base.resolve("ck").toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[AsOfDimOut], _: Long) =>
          b.collect().foreach(out.add); ()
        }
        .start()
      q.awaitTermination()
      scala.jdk.CollectionConverters.CollectionHasAsScala(out).asScala.toSeq
    }
    val got = run(Seq(
      (1L, 10000000L, "d", -1L, supp), (1L, 10000000L, "d", -1L, bmp),
      (1L, 15000000L, "e", 1L, null),
      (9L, 100000000L, "e", 9L, null))) // watermark pusher
    val pick = got.find(_.event_id == 1L).get
    assert(pick.dim_payload == supp,
      s"tie must break by CODE POINT (binary collation), got '${pick.dim_payload}'")
    // a null dim payload is a loud contract violation, not an NPE
    val e = intercept[Exception] {
      run(Seq((2L, 10000000L, "d", -1L, null),
        (9L, 100000000L, "e", 9L, null)))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("null dim payload")), msgs(e).mkString(" | "))
  }

  test("enrichAsOfScd2: inclusive start, exclusive end, open current, unknown key") {
    val dim = Seq(
      (1L, 10.0, Some(20.0), "v1"), (1L, 20.0, None, "v2"),
      (2L, 50.0, None, "w1"))
      .toDF("d_key", "d_start", "d_end", "d_val")
      .select(col("d_key"), col("d_start"),
        col("d_end").cast("double").as("d_end"), col("d_val"))
    val events = Seq(
      (100L, 1L, 5.0),   // before the first version -> none
      (101L, 1L, 10.0),  // _start inclusive -> v1
      (102L, 1L, 20.0),  // _end exclusive -> v2 starts here
      (103L, 1L, 19.999),// still v1
      (104L, 1L, 9999.0),// open current -> v2
      (105L, 9L, 15.0))  // unknown key -> none
      .toDF("id", "k", "t")
    val got = StreamIngest.enrichAsOfScd2(events, "t", dim, "k", "d_key", "d_start", "d_end")
      .select(col("id"), coalesce(col("d_val"), lit("none")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(100L -> "none", 101L -> "v1", 102L -> "v2",
      103L -> "v1", 104L -> "v2", 105L -> "none"), s"got $got")
    // SCD2 intervals never fan out: one output row per event
    assert(StreamIngest.enrichAsOfScd2(events, "t", dim, "k", "d_key", "d_start", "d_end").count() == 6)
    // store-wrapped events carry _start/_end themselves: the default
    // dim column names must still resolve (qualified references)
    val storeDim = dim.select(col("d_key"), col("d_start").as("_start"),
      col("d_end").as("_end"), col("d_val"))
    val storeEvents = events.withColumn("_start", col("t"))
    val q = StreamIngest.enrichAsOfScd2(storeEvents, "t", storeDim, "k", "d_key")
      .select(col("id"), coalesce(col("d_val"), lit("none")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(q == got, "qualified-reference path diverged")
    // an oversized dim fails with the NAMED contract at construction —
    // never a driver OOM mid-run
    val big = intercept[IllegalArgumentException] {
      StreamIngest.enrichAsOfScd2(events, "t", dim, "k", "d_key",
        "d_start", "d_end", maxBroadcastRows = 2L)
    }
    assert(big.getMessage.contains("maxBroadcastRows"), big.getMessage)
    // the non-broadcast fallback is value-identical (per-batch shuffle
    // join, bounded driver memory) and skips the count entirely
    val nb = StreamIngest.enrichAsOfScd2(events, "t", dim, "k", "d_key",
        "d_start", "d_end", broadcastDim = false, maxBroadcastRows = 2L)
      .select(col("id"), coalesce(col("d_val"), lit("none")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nb == got, "non-broadcast fallback diverged")
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
