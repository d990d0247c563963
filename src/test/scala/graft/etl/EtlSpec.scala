package graft.etl

import graft.SparkSpec
import graft.model.Meta
import graft.store.Container

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

class ActivityImportSpec extends SparkSpec {
  import spark.implicits._

  test("rebuilds scalar history backwards from a change log") {
    // forward truth: status None ->(t=10) 'open' ->(t=20) 'closed'
    val current = Seq(("1", 20.0, "closed", "alice")).toDF("_oid", "_start", "status", "owner")
    val acts = Seq(
      ("1", 10.0, "status", null.asInstanceOf[String], "open"),
      ("1", 20.0, "status", "open", "closed"))
      .toDF("_oid", "when", "field", "removed", "added")
    val hist = ActivityImport.rebuild(current, acts)
      .orderBy("_start").collect()
    assert(hist.length == 3)
    // oldest: status null, [<=10, 10)
    assert(hist(0).getAs[String]("status") == null)
    assert(hist(0).getAs[Double]("_end") == 10.0)
    // middle: open, [10, 20)
    assert(hist(1).getAs[String]("status") == "open")
    assert(hist(1).getAs[Double]("_start") == 10.0)
    assert(hist(1).getAs[Double]("_end") == 20.0)
    // current: closed, [20, null)
    assert(hist(2).getAs[String]("status") == "closed")
    assert(hist(2).isNullAt(hist(2).fieldIndex("_end")))
    // untouched field carried through
    assert(hist.forall(_.getAs[String]("owner") == "alice"))
  }

  test("array fields: inverse removes added, restores removed") {
    val current = Seq(("1", 30.0, Seq("a", "c"))).toDF("_oid", "_start", "tags")
    val acts = Seq(
      ("1", 30.0, "tags", "b", "c")) // at t=30: removed b, added c
      .toDF("_oid", "when", "field", "removed", "added")
    val hist = ActivityImport.rebuild(current, acts, arrayFields = Set("tags"))
      .orderBy("_start").collect()
    assert(hist.length == 2)
    assert(hist(0).getSeq[String](hist(0).fieldIndex("tags")).sorted == Seq("a", "b"))
    assert(hist(1).getSeq[String](hist(1).fieldIndex("tags")).sorted == Seq("a", "c"))
  }

  test("same-instant events merge into one version") {
    val current = Seq(("1", 10.0, "x2", "y2")).toDF("_oid", "_start", "f1", "f2")
    val acts = Seq(
      ("1", 10.0, "f1", "x1", "x2"),
      ("1", 10.0, "f2", "y1", "y2"))
      .toDF("_oid", "when", "field", "removed", "added")
    val hist = ActivityImport.rebuild(current, acts).orderBy("_start").collect()
    assert(hist.length == 2)
    assert(hist(0).getAs[String]("f1") == "x1" && hist(0).getAs[String]("f2") == "y1")
  }

  test("inconsistency between doc and activity recorded in _e") {
    val current = Seq(("1", 10.0, "actual")).toDF("_oid", "_start", "f")
    val acts = Seq(("1", 10.0, "f", "before", "expected"))
      .toDF("_oid", "when", "field", "removed", "added")
    val hist = ActivityImport.rebuild(current, acts).orderBy("_start").collect()
    val e = hist(0).getAs[Map[String, String]]("_e")
    assert(e != null && e.contains("f"))
  }

  test("forward-replay oracle: random change sequences round-trip") {
    val rng = new scala.util.Random(11)
    // build forward histories, derive (current, activities), rebuild
    val oids = (1 to 20).map(_.toString)
    val truth = oids.map { oid =>
      val n = 1 + rng.nextInt(5)
      var t = 10.0
      val states = scala.collection.mutable.ArrayBuffer[(Double, String)]((t, s"v0"))
      (1 to n).foreach { i =>
        t += 5 + rng.nextInt(20)
        states += ((t, s"v$i"))
      }
      oid -> states.toSeq
    }.toMap
    val current = truth.map { case (oid, st) => (oid, st.last._1, st.last._2) }
      .toSeq.toDF("_oid", "_start", "f")
    val acts = truth.flatMap { case (oid, st) =>
      st.sliding(2).collect { case Seq((_, prev), (when, next)) =>
        (oid, when, "f", prev, next)
      }
    }.toSeq.toDF("_oid", "when", "field", "removed", "added")
    val hist = ActivityImport.rebuild(current, acts).collect()
      .groupBy(_.getString(0))
    truth.foreach { case (oid, st) =>
      val got = hist(oid).sortBy(_.getDouble(1))
      assert(got.length == st.length, s"oid $oid version count")
      st.zipWithIndex.foreach { case ((start, v), i) =>
        assert(got(i).getAs[String]("f") == v, s"oid $oid version $i value")
        if (i > 0) assert(got(i).getDouble(1) == start, s"oid $oid version $i start")
        if (i < st.length - 1)
          assert(got(i).getAs[Double]("_end") == st(i + 1)._1, s"oid $oid version $i end")
        else assert(got(i).isNullAt(got(i).fieldIndex("_end")))
      }
    }
  }
}

class LoadersSpec extends SparkSpec {

  private def writeTemp(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-etl")
    val f = dir.resolve(name)
    Files.write(f, content.getBytes)
    f.toString
  }

  test("loadCsv: header, inferred types, normalized keys, row-number oid") {
    val p = writeTemp("fixture.csv",
      "Symbol,Price Close,Volume!\n$AJT,18.15,100\n$BXQ,7.5,200\n")
    val df = Loaders.loadCsv(spark, p)
    assert(df.columns.contains("symbol") && df.columns.contains("price_close")
      && df.columns.contains("volume"))
    val rows = df.orderBy("_oid").collect()
    assert(rows.map(_.getAs[Long]("_oid")).toSeq == Seq(1L, 2L))
    assert(rows(0).getAs[String]("symbol") == "$AJT")
    assert(rows(0).getAs[Double]("price_close") == 18.15)
    assert(rows.forall(_.getAs[String](Meta.HASH) != null))
  }

  test("loadCsv with column oid") {
    val p = writeTemp("f.csv", "id,v\n7,a\n9,b\n")
    val df = Loaders.loadCsv(spark, p, Loaders.OidColumn("id"))
    assert(df.select("_oid").collect().map(_.get(0).toString.toInt).sorted.toSeq == Seq(7, 9))
  }

  test("loadJsonIndex: orient=index dict-of-objects (meps.json shape)") {
    val p = writeTemp("meps.json",
      """{"1854": {"name": "A", "country": "X"}, "23784": {"name": "B", "country": "Y"}}""")
    val df = Loaders.loadJsonIndex(spark, p)
    val rows = df.orderBy("_oid").collect()
    assert(rows.map(_.getAs[String]("_oid")).toSeq == Seq("1854", "23784"))
    assert(rows(0).getAs[String]("name") == "A")
  }

  test("loadFile dispatch + unsupported extension") {
    val p = writeTemp("t.csv", "a,b\n1,2\n")
    assert(Loaders.loadFile(spark, p).count() == 1)
    intercept[IllegalArgumentException](Loaders.loadFile(spark, "x.pickle"))
  }

  test("parseTopLevelObject handles nesting and escapes") {
    val got = Loaders.parseTopLevelObject(
      """{"a": {"x": "{\"not\": 1}"}, "b": {"y": {"z": 2}}}""")
    assert(got.map(_._1) == Seq("a", "b"))
    assert(got(1)._2.contains("\"z\": 2"))
  }

  test("exportTable ORC round trip is lossless and loadFile dispatches .orc") {
    import spark.implicits._
    val df = Seq((1L, "alpha", 3.5), (2L, "beta", -1.25), (3L, null.asInstanceOf[String], 0.0))
      .toDF("id", "name", "score")
    val dir = Files.createTempDirectory("graft-orc-test").toString
    Loaders.exportTable(df.coalesce(1), dir, "orc")
    val back = spark.read.orc(dir)
    // file sources re-read everything as nullable; names+types must hold
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    // extension dispatch wraps the ORC part file like any other source
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".orc")).head.getAbsolutePath
    val loaded = Loaders.loadFile(spark, part, Loaders.OidColumn("id"))
    assert(loaded.select(Meta.OID).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException](Loaders.exportTable(df, dir, "xml"))
  }

  test("exportTable Avro round trip is lossless and loadFile dispatches .avro") {
    import spark.implicits._
    val df = Seq((1L, "alpha", 3.5), (2L, "beta", -1.25), (3L, null.asInstanceOf[String], 0.0))
      .toDF("id", "name", "score")
    val dir = Files.createTempDirectory("graft-avro-test").toString
    Loaders.exportTable(df.coalesce(1), dir, "avro")
    val back = spark.read.format(Loaders.AvroProvider).load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).head.getAbsolutePath
    val loaded = Loaders.loadFile(spark, part, Loaders.OidColumn("id"))
    assert(loaded.select(Meta.OID).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }
}

class PrepSpec extends SparkSpec {
  import spark.implicits._

  test("typecast with _e capture on failure") {
    val df = Seq(("1", "42", "not-a-number"), ("2", "7", "3.5"))
      .toDF("_oid", "a", "b")
    val out = Prep.prep(df, Map(
      "a" -> Prep.FieldSpec(IntegerType),
      "b" -> Prep.FieldSpec(DoubleType)))
    val rows = out.orderBy("_oid").collect()
    assert(rows(0).getAs[Int]("a") == 42)
    assert(rows(0).isNullAt(rows(0).fieldIndex("b")))
    val e = rows(0).getAs[Map[String, String]]("_e")
    assert(e("b") == "not-a-number")
    assert(rows(1).getAs[Map[String, String]]("_e") == null)
    assert(rows(1).getAs[Double]("b") == 3.5)
  }

  test("container normalization: null -> [], scalar -> [x], sorted") {
    val df = Seq((1, Seq("c", "a")), (2, null.asInstanceOf[Seq[String]]))
      .toDF("_oid", "tags")
    val out = Prep.prep(df, Map("tags" -> Prep.FieldSpec(StringType, container = true)))
    val rows = out.orderBy("_oid").collect()
    assert(rows(0).getSeq[String](1) == Seq("a", "c"))
    assert(rows(1).getSeq[String](1) == Seq.empty)
    // scalar column coerced to container
    val df2 = Seq((1, "solo")).toDF("_oid", "tags")
    val out2 = Prep.prep(df2, Map("tags" -> Prep.FieldSpec(StringType, container = true)))
    assert(out2.head().getSeq[String](1) == Seq("solo"))
  }

  test("convert + variants") {
    val df = Seq((1, "  HI ")).toDF("_oid", "name")
    val out = Prep.prep(df, Map(
      "name" -> Prep.FieldSpec(StringType,
        convert = Some(c => lower(trim(c))),
        variants = Map("name_len" -> (c => length(c))))))
    val r = out.head()
    assert(r.getAs[String]("name") == "hi")
    assert(r.getAs[Int]("name_len") == 2)
  }

  test("autoschema mirrors existing types") {
    val df = Seq((1L, "x", Seq(1, 2))).toDF("n", "s", "arr")
    val sch = Prep.autoschema(df)
    assert(sch("n") == Prep.FieldSpec(LongType))
    assert(sch("arr").container && sch("arr").dataType == IntegerType)
  }
}

class DeltaSpec extends SparkSpec {
  import spark.implicits._

  private def container(oids: (Long, Double)*): Container = {
    val df = oids.toSeq.toDF("_oid", "_start")
      .withColumn(Meta.END, lit(null).cast(DoubleType))
    new Container(spark, "t", df)
  }

  test("newOids: strictly beyond max known") {
    val src = Seq((1L, 0.0), (5L, 0.0), (9L, 0.0)).toDF("id", "mtime")
    val got = Delta.newOids(src, "id", container((1L, 10.0), (5L, 10.0)))
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(9L))
  }

  test("changedOids + deltaOids union") {
    val src = Seq((1L, 5.0), (5L, 50.0), (9L, 1.0)).toDF("id", "mtime")
    val tgt = container((1L, 10.0), (5L, 10.0))
    assert(Delta.changedOids(src, "id", "mtime", 20.0).collect().map(_.getLong(0)).toSeq == Seq(5L))
    val delta = Delta.deltaOids(src, "id", "mtime", tgt, 20.0)
      .collect().map(_.getLong(0)).sorted
    assert(delta.toSeq == Seq(5L, 9L))
  }

  test("missedOids: bloom-pruned resync equals the plain anti-join") {
    val src = (0L until 500L).map(i => (i, 0.0)).toDF("id", "mtime")
    val tgt = container((0L until 500L).filter(_ % 3 != 0).map(i => (i, 10.0)): _*)
    val expected = (0L until 500L).filter(_ % 3 == 0)
    // default fpp, and a pathological 0.5 fpp that floods the
    // candidate sliver with false positives — the exact join must
    // resolve every one of them
    for (fpp <- Seq(0.01, 0.5)) {
      val got = Delta.missedOids(src, "id", tgt, fpp = fpp)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expected, s"fpp=$fpp")
    }
    // string oids take the UTF-8 probe path
    val srcS = Seq("a", "b", "c", "d").toDF("id")
      .withColumn("mtime", lit(0.0))
    val tgtS = new Container(spark, "t",
      Seq("a", "c").toDF(Meta.OID)
        .withColumn(Meta.START, lit(0.0))
        .withColumn(Meta.END, lit(null).cast(DoubleType)))
    assert(Delta.missedOids(srcS, "id", tgtS).collect().map(_.getString(0)).sorted.toSeq
      == Seq("b", "d"))
  }

  test("watermark file round-trip; fallback to max(_start)") {
    val p = Files.createTempDirectory("graft-wm").resolve("wm.txt").toString
    assert(Delta.readWatermark(p, container((1L, 123.5))).contains(123.5))
    Delta.writeWatermark(p, 456.25)
    assert(Delta.readWatermark(p, container((1L, 123.5))).contains(456.25))
  }
}

class GitSourceSpec extends SparkSpec {

  test("parseLog handles records, parents, numstat, trailers via withTrailers") {
    val sep = ""; val rec = ""
    val out = s"${rec}abc123${sep}tree1${sep}p1 p2${sep}A <a@x>${sep}C <c@x>${sep}1000${sep}1000${sep}msg line\n\nSigned-off-by: Dev One <d@x>\nResolves: #42${sep}\n3\t1\tsrc/a.scala\n-\t-\tbin.dat\n" +
      s"${rec}def456${sep}tree2${sep}${sep}B <b@x>${sep}C <c@x>${sep}2000${sep}2000${sep}other${sep}\n1\t0\tREADME.md\n"
    val commits = GitSource.parseLog(out)
    assert(commits.length == 2)
    assert(commits(0).sha == "abc123" && commits(0).parents == Seq("p1", "p2"))
    assert(commits(0).files == Map("src/a.scala" -> (3, 1), "bin.dat" -> (0, 0)))
    assert(commits(1).parents.isEmpty && commits(1).files == Map("README.md" -> (1, 0)))

    import spark.implicits._
    val df = GitSource.withTrailers(
      Seq(commits(0).message).toDF("message"))
    val r = df.head()
    assert(r.getSeq[String](r.fieldIndex("signed_off_by")) == Seq("Dev One <d@x>"))
    assert(r.getSeq[String](r.fieldIndex("resolves")) == Seq("#42"))
  }

  test("loadCommits on this repo (driver-side git shellout)") {
    val df = GitSource.loadCommits(spark, "/root/repo")
    assert(df.count() > 0)
    assert(df.columns.contains("_hash") && df.columns.contains("acked_by"))
    assert(df.filter(col("added") > 0).count() > 0)
  }
}

class StreamIngestSpec extends SparkSpec {

  test("streaming upsert: micro-batched files SCD2-merge into a container") {
    import graft.streaming.StreamIngest
    val dir = Files.createTempDirectory("graft-stream")
    val src = dir.resolve("in"); val chk = dir.resolve("chk")
    Files.createDirectories(src)

    import spark.implicits._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", DoubleType),
      StructField("state", StringType)))
    // batch 1: two oids
    Seq((1L, 10.0, "a"), (2L, 10.0, "a"))
      .toDF("id", "ts", "state").write.mode("append").parquet(src.toString)

    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("_oid", LongType), StructField("_start", DoubleType),
        StructField("_end", DoubleType), StructField("state", StringType),
        StructField("_hash", StringType), StructField("_id", StringType),
        StructField("_v", IntegerType), StructField("__v__", StringType),
        StructField("_e", MapType(StringType, StringType)))))
    val c = new Container(spark, "s", empty)

    val q1 = StreamIngest.upsertStream(spark, src.toString, schema, c,
      "id", "ts", Seq("state"), chk.toString)
    q1.awaitTermination()
    assert(c.df.count() == 2)

    // batch 2: oid 1 changed, oid 2 unchanged, oid 3 new
    Seq((1L, 20.0, "b"), (2L, 20.0, "a"), (3L, 20.0, "a"))
      .toDF("id", "ts", "state").write.mode("append").parquet(src.toString)
    val q2 = StreamIngest.upsertStream(spark, src.toString, schema, c,
      "id", "ts", Seq("state"), chk.toString)
    q2.awaitTermination()

    val cur = c.df.filter(col("_end").isNull).collect()
      .map(r => r.getAs[Long]("_oid") -> r.getAs[String]("state")).toMap
    assert(cur == Map(1L -> "b", 2L -> "a", 3L -> "a"))
    // oid 1 rotated: closed version exists
    assert(c.df.filter(col("_end").isNotNull).count() == 1)
    assert(c.df.count() == 4)
  }

  test("stream-static enrichment joins the broadcast dim per micro-batch") {
    import graft.streaming.StreamIngest
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-enrich")
    val src = dir.resolve("in"); Files.createDirectories(src)
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("t", DoubleType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    Seq((1L, 10.0, "x", 1.0), (2L, 20.0, "x", 1.0), (1L, 3700.0, "y", 1.0))
      .toDF("user_id", "t", "event_type", "value")
      .write.mode("append").parquet(src.toString)
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val stream = spark.readStream.schema(schema).parquet(src.toString)
      .withColumn("__et", timestamp_seconds(col("t")))
    val agg = StreamIngest.enrichedWindowedCounts(
      stream, "__et", dim, "user_id", "tier",
      windowLen = "1 hour", watermark = "1 hour")
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("enrich_t")
      .option("checkpointLocation", dir.resolve("chk").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("enrich_t")
      .select(col("window.start").cast("long").as("w"), col("tier"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((0L, "gold", 1L), (0L, "basic", 1L), (3600L, "gold", 1L)))
  }
}

class StreamingSessionizeSpec extends graft.SparkSpec {
  import graft.streaming.{SessionEvent, StreamIngest}
  import org.apache.spark.sql.types._
  import java.nio.file.Files

  // Event epochs sit well above the initial watermark (0): Spark's
  // stateful late-row filter drops rows with event time <= the current
  // watermark, so a first-batch event at t=0.0 would be silently
  // discarded (see streamingSessionize scaladoc).
  private val B = 1e6

  test("flatMapGroupsWithState closes sessions across micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ss")
    val src = dir.resolve("in"); Files.createDirectories(src)
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("t", DoubleType),
      StructField("event_id", LongType), StructField("value", DoubleType)))
    // user 1: session A (t=B,B+100), then gap, session B (t=B+5000) open;
    // user 2: one open session
    Seq((1L, B, 0L, 1.0), (1L, B + 100.0, 1L, 2.0), (1L, B + 5000.0, 2L, 4.0),
        (2L, B, 3L, 8.0))
      .toDF("user_id", "t", "event_id", "value")
      .write.mode("append").parquet(src.toString)

    val stream = spark.readStream.schema(schema).parquet(src.toString)
      .as[SessionEvent]
    val qname = "sess_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamIngest.streamingSessionize(stream, gapSeconds = 1800.0)
      .writeStream.outputMode("append").format("memory").queryName(qname)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val closed = spark.table(qname).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
      .sortBy(r => (r._1, r._2))
    // user 1's first session closed by the gap; user 2's lone-event
    // session closed by the event-time TIMEOUT (watermark B+3200 passed
    // its lastT+gap = B+1800); user 1's B+5000 session stays open
    // (timeout B+6800 > watermark)
    assert(closed.toSeq == Seq((1L, B, B + 100.0, 2L, 3.0), (2L, B, B, 1L, 8.0)))

    // second batch: user 2 gets a far event -> user 2's session closes
    Seq((2L, B + 9000.0, 4L, 1.0)).toDF("user_id", "t", "event_id", "value")
      .write.mode("append").parquet(src.toString)
    val q2 = StreamIngest.streamingSessionize(
        spark.readStream.schema(schema).parquet(src.toString).as[SessionEvent],
        gapSeconds = 1800.0)
      .writeStream.outputMode("append").format("memory").queryName(qname + "b")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    // fresh run over all files: gap closes (1, B..B+100) and (2, B..B);
    // the final watermark B+7200 then times out user 1's B+5000 session
    val closed2 = spark.table(qname + "b").collect().map(_.getLong(0)).sorted
    assert(closed2.toSeq == Seq(1L, 1L, 2L))
  }

  test("event-time timeout closes and evicts sessions of users who go quiet") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ss-to")
    val src = dir.resolve("in"); Files.createDirectories(src)
    val chk = dir.resolve("chk")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("t", DoubleType),
      StructField("event_id", LongType), StructField("value", DoubleType)))

    Seq((1L, B, 0L, 1.0), (1L, B + 100.0, 1L, 2.0))
      .toDF("user_id", "t", "event_id", "value")
      .write.mode("append").parquet(src.toString)
    val qname = "sessto_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamIngest.streamingSessionize(
        spark.readStream.schema(schema).parquet(src.toString).as[SessionEvent],
        gapSeconds = 1800.0)
      .writeStream.outputMode("append").format("memory").queryName(qname)
      .option("checkpointLocation", chk.toString)
      .start()
    q.processAllAvailable()
    assert(spark.table(qname).count() == 0) // user 1's session still open

    // a far-future event from ANOTHER user advances the watermark past
    // user 1's (lastT + gap): user 1 never speaks again, yet the session
    // must close via timeout (the unbounded-state bug this guards)
    Seq((2L, B + 10000.0, 2L, 1.0)).toDF("user_id", "t", "event_id", "value")
      .write.mode("append").parquet(src.toString)
    q.processAllAvailable() // batch 2: watermark advances AFTER this batch
    Seq((2L, B + 10100.0, 3L, 1.0)).toDF("user_id", "t", "event_id", "value")
      .write.mode("append").parquet(src.toString)
    q.processAllAvailable() // batch 3: user 1 times out under wm=B+8200s
    q.stop()
    val rows = spark.table(qname).as[graft.streaming.SessionOut].collect()
    assert(rows.toSeq == Seq(graft.streaming.SessionOut(1L, B, B + 100.0, 2L, 3.0)))
  }
}

class WatermarkSpec extends graft.SparkSpec {
  import graft.streaming.StreamIngest
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.streaming.Trigger
  import java.nio.file.Files

  test("append-mode windows finalize past the watermark; late events are dropped") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-wm")
    val src = dir.resolve("in"); Files.createDirectories(src)
    val schema = StructType(Seq(
      StructField("ts", DoubleType), StructField("event_type", StringType),
      StructField("value", DoubleType)))

    // batch 1 must exist before the query starts (file source needs
    // the directory non-empty is not required, but keeps it simple)
    Seq((1.0, "a", 1.0), (2.0, "a", 1.0)).toDF("ts", "event_type", "value")
      .write.mode("append").parquet(src.toString)

    // ONE long-lived query; new files picked up per processAllAvailable
    val stream = spark.readStream.schema(schema).parquet(src.toString)
    val agg = StreamIngest.windowedCounts(stream, "ts", "10 seconds", "10 seconds")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wmtest").start()
    try {
      q.processAllAvailable()
      assert(spark.table("wmtest").count() == 0) // watermark hasn't passed

      // batch 2: event far ahead advances the watermark -> [0,10) finalizes
      Seq((100.0, "a", 1.0)).toDF("ts", "event_type", "value")
        .write.mode("append").parquet(src.toString)
      q.processAllAvailable()
      val finalized = spark.table("wmtest").collect()
      assert(finalized.length == 1 && finalized(0).getAs[Long]("n") == 2)

      // batch 3: a LATE event for [0,10) arrives -> dropped, not re-emitted
      Seq((3.0, "a", 99.0)).toDF("ts", "event_type", "value")
        .write.mode("append").parquet(src.toString)
      q.processAllAvailable()
      val after = spark.table("wmtest").collect()
      assert(after.length == 1 && after(0).getAs[Long]("n") == 2,
        "late event must not re-open the finalized window")
    } finally q.stop()
  }
}
