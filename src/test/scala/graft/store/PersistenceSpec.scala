package graft.store

import graft.SparkSpec
import graft.model.Meta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

class PersistenceSpec extends SparkSpec {
  import spark.implicits._

  test("save partitions by is_current; find(date=null) partition-prunes the scan") {
    val dir = Files.createTempDirectory("graft-persist").resolve("t").toString
    val hist = Seq(
      (1L, 100.0, Some(200.0), "old"),
      (1L, 200.0, None, "new"),
      (2L, 100.0, None, "only"))
      .toDF("_oid", "_start", "_end", "v")
      .select(col("_oid"), col("_start"),
        col("_end").cast(DoubleType).as("_end"), col("v"))
      .withColumn(Meta.HASH, Meta.contentHashOf("v" -> col("v")))
      .withColumn(Meta.ID, Meta.genId(col("_oid"), col("_start"), col("_end")))
    val c = new Container(spark, "t", hist, Some(dir))
    c.save()

    val loaded = Container.load(spark, "t", dir)
    val snap = loaded.find(date = null)
    assert(snap.count() == 2)
    val plan = snap.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("is_current"),
      s"expected partition pruning on is_current, got:\n$plan")

    // history queries still see everything
    assert(loaded.count(date = "~") == 3)
    // and upsert over the loaded state keeps working
    val inc = Seq((2L, 300.0, "changed")).toDF("_oid", "_start", "v")
      .withColumn(Meta.END, lit(null).cast(DoubleType))
      .withColumn(Meta.HASH, Meta.contentHashOf("v" -> col("v")))
      .withColumn(Meta.ID, Meta.genId(col("_oid"), col("_start"), col(Meta.END)))
    loaded.upsert(inc)
    assert(loaded.df.filter(col("_oid") === 2L).count() == 2)

    // the load -> mutate -> save loop: state's lineage still READS the
    // destination path; a naive overwrite deletes it before the plan
    // runs and loses the table (round-1 ADVICE high finding)
    loaded.save()
    val reloaded = Container.load(spark, "t", dir)
    assert(reloaded.count(date = "~") == 4)
    assert(reloaded.find(date = null).count() == 2)

    // and again through the Z-ordered writer (same staged-swap path)
    reloaded.saveZOrdered("_oid")
    assert(Container.load(spark, "t", dir).count(date = "~") == 4)
  }
}

class BucketedSpec extends SparkSpec {
  import spark.implicits._
  import graft.temporal.TemporalOps._

  test("bucketed save: per-_oid window runs without Exchange") {
    val df = Seq(
      (1L, 10.0, Some(20.0), "a"), (1L, 20.0, None, "b"), (2L, 10.0, None, "c"))
      .toDF("_oid", "_start", "_end", "v")
      .select(col("_oid"), col("_start"),
        col("_end").cast(DoubleType).as("_end"), col("v"))
      .withColumn(Meta.HASH, Meta.contentHashOf("v" -> col("v")))
      .withColumn(Meta.ID, Meta.genId(col("_oid"), col("_start"), col("_end")))
    val c = new Container(spark, "bt", df)
    c.saveBucketed("bucketed_t", numBuckets = 4)

    val lastV = spark.table("bucketed_t").lastVersion
    val plan = lastV.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed per-oid window should not shuffle, got:\n$plan")
    val got = lastV.collect().map(r => r.getAs[Long]("_oid") -> r.getAs[String]("v")).toMap
    assert(got == Map(1L -> "b", 2L -> "c"))
    spark.sql("DROP TABLE IF EXISTS bucketed_t")
  }

  test("co-bucketed join: two saveBucketed tables join with ZERO Exchange") {
    def mk(name: String, rows: Seq[(Long, Double, Option[Double], String)]): Unit = {
      val df = rows.toDF("_oid", "_start", "_end", "v")
        .select(col("_oid"), col("_start"),
          col("_end").cast(DoubleType).as("_end"), col("v"))
        .withColumn(Meta.HASH, Meta.contentHashOf("v" -> col("v")))
        .withColumn(Meta.ID, Meta.genId(col("_oid"), col("_start"), col("_end")))
      new Container(spark, name, df).saveBucketed(name, numBuckets = 4)
    }
    mk("cobkt_a", Seq((1L, 10.0, None, "a1"), (2L, 10.0, None, "a2"), (3L, 10.0, None, "a3")))
    mk("cobkt_b", Seq((1L, 10.0, None, "b1"), (2L, 10.0, None, "b2"), (9L, 10.0, None, "b9")))
    // SMJ over two co-bucketed scans: the required HashPartitioning
    // comes off BOTH scans — at 100 TB this join moves zero bytes
    val j = spark.table("cobkt_a").select(col("_oid"), col("v").as("va"))
      .join(spark.table("cobkt_b").select(col("_oid"), col("v").as("vb")), "_oid")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join should not shuffle, got:\n$plan")
      val got = j.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got == Set((1L, "a1", "b1"), (2L, "a2", "b2")))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    spark.sql("DROP TABLE IF EXISTS cobkt_a")
    spark.sql("DROP TABLE IF EXISTS cobkt_b")
  }
}

class ExtensionsSpec extends SparkSpec {

  test("minhash_sig / simhash64 callable from spark.sql") {
    new graft.GraftExtensions().register(spark)
    import spark.implicits._
    Seq(("a b c d e f g h", 1L)).toDF("text", "id").createOrReplaceTempView("docs")
    val row = spark.sql(
      "SELECT size(minhash_sig(text, 16, 2)) AS k, simhash64(text) AS h FROM docs").head()
    assert(row.getInt(0) == 16)
    assert(row.getLong(1) != 0L)
  }

  test("normalize_unicode callable from spark.sql; literal form validated") {
    new graft.GraftExtensions().register(spark)
    import spark.implicits._
    // decomposed e + combining acute (U+0301), and the fi ligature
    Seq(("cafe\u0301 \uFB01n", 1L)).toDF("text", "id")
      .createOrReplaceTempView("uni_docs")
    val row = spark.sql(
      """SELECT normalize_unicode(text) AS nfc,
        |       normalize_unicode(text, 'NFKC') AS nfkc FROM uni_docs""".stripMargin).head()
    assert(spark.sql("SELECT normalize_text('A,b  C!') AS n").head().getString(0) == "a b c")
    assert(row.getString(0) == "caf\u00e9 \uFB01n") // composed; ligature kept
    assert(row.getString(1) == "caf\u00e9 fin")      // NFKC also folds the ligature
    val err = intercept[Exception] {
      spark.sql("SELECT normalize_unicode(text, 'NFX') FROM uni_docs").head()
    }
    assert(err.getMessage.contains("NFC|NFD|NFKC|NFKD") ||
      err.getCause != null && err.getCause.getMessage.contains("NFC|NFD|NFKC|NFKD"))
  }

  test("text_stats / cosine_sim callable from spark.sql") {
    new graft.GraftExtensions().register(spark)
    import spark.implicits._
    Seq(("the quick brown fox.", Array(1.0f, 0.0f), Array(1.0f, 0.0f)))
      .toDF("text", "a", "b").createOrReplaceTempView("ext_docs")
    val row = spark.sql(
      "SELECT text_stats(text).n_tokens AS n, cosine_sim(a, b) AS c FROM ext_docs").head()
    assert(row.getInt(0) == 4)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-9)
  }

  test("md5_lower64 / sig_match_ratio / lsh_band callable from spark.sql") {
    new graft.GraftExtensions().register(spark)
    import spark.implicits._
    Seq(("abc", Array(1L, 2L, 3L, 4L), Array(1L, 2L, 9L, 4L), Array(0.5f, -0.25f)))
      .toDF("s", "sa", "sb", "vec").createOrReplaceTempView("ext_fns")
    val row = spark.sql(
      """SELECT md5_lower64(s) AS h, sig_match_ratio(sa, sb) AS r,
        |  lsh_band(vec, 0, 8) AS b FROM ext_fns""".stripMargin).head()
    assert(row.getLong(0) == graft.functions.HashUtil.md5Lower64("abc"))
    assert(math.abs(row.getDouble(1) - 0.75) < 1e-9)
    // same band value as the Column API
    val viaCol = Seq(Tuple1(Array(0.5f, -0.25f))).toDF("vec")
      .select(graft.functions.DedupExpressions.lshBand(col("vec"), 0, 8).as("b"))
      .head().getLong(0)
    assert(row.getLong(2) == viaCol)
  }
}

class IncrementalStoreSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (Long, Double, String)*) =
    rows.toSeq.toDF("_oid", "_start", "v")
      .withColumn(Meta.END, lit(null).cast(DoubleType))
      .withColumn(Meta.HASH, Meta.contentHashOf("v" -> col("v")))
      .withColumn(Meta.ID, Meta.genId(col("_oid"), col("_start"), col(Meta.END)))

  test("append-only history + snapshot replacement across flushes") {
    val root = java.nio.file.Files.createTempDirectory("graft-inc").resolve("t").toString
    val s = IncrementalStore.open(spark, "t", root)

    s.flushUpsert(batch((1L, 10.0, "a"), (2L, 10.0, "x")))
    assert(s.currentDf.count() == 2)
    assert(s.history.isEmpty)

    // flush 2: oid 1 changes, oid 2 unchanged, oid 3 new
    s.flushUpsert(batch((1L, 20.0, "b"), (2L, 20.0, "x"), (3L, 20.0, "n")))
    val cur = s.currentDf.collect().map(r => r.getAs[Long]("_oid") -> r.getAs[String]("v")).toMap
    assert(cur == Map(1L -> "b", 2L -> "x", 3L -> "n"))
    val hist = s.history.get.collect()
    assert(hist.length == 1)
    assert(hist(0).getAs[Long]("_oid") == 1L && hist(0).getAs[Double]("_end") == 20.0)
    assert(hist(0).getAs[String]("_id") == "1:10.0")
    assert(s.df.count() == 4)

    // flush 3: idempotent re-flush adds nothing
    val historyFiles = new java.io.File(root, "history").listFiles().count(_.getName.endsWith(".parquet"))
    s.flushUpsert(batch((1L, 30.0, "b"), (2L, 30.0, "x"), (3L, 30.0, "n")))
    assert(s.df.count() == 4)
    assert(s.currentDf.filter(col("_oid") === 1L).head().getAs[Double]("_start") == 20.0)

    // current-only read never lists the history directory
    val plan = s.currentDf.queryExecution.executedPlan.toString
    assert(plan.contains("current_v") && !plan.contains("history"))
  }
}

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("history compaction shrinks file count, preserves rows") {
    val root = java.nio.file.Files.createTempDirectory("graft-cmp").resolve("t").toString
    val s = IncrementalStore.open(spark, "t", root)
    def b(start: Double, v: String) =
      Seq((1L, start, v), (2L, start, v + "2")).toDF("_oid", "_start", "v")
        .withColumn(Meta.END, lit(null).cast(DoubleType))
        .withColumn(Meta.HASH, Meta.contentHashOf("v" -> col("v")))
        .withColumn(Meta.ID, Meta.genId(col("_oid"), col("_start"), col(Meta.END)))
    // 5 flushes, each rotating both oids -> 8 closed versions appended
    (1 to 5).foreach(i => s.flushUpsert(b(i * 10.0, s"v$i")))
    val before = s.history.get.count()
    assert(before == 8)
    val filesBefore = new java.io.File(root, "history").listFiles()
      .count(_.getName.endsWith(".parquet"))
    s.compactHistory(targetFiles = 1)
    val filesAfter = new java.io.File(root, "history").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesAfter == 1 && filesAfter < filesBefore)
    assert(s.history.get.count() == before)
    assert(s.df.count() == before + 2)
  }
}
