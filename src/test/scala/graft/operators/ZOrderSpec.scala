package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order layout quality: after clustering on (ts, user_id), EVERY
  * file's min/max range on EACH column must be a small slice of the
  * global range — that is the property parquet file-skipping prunes
  * on. A linear sort gives this on the leading column only.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events =
    spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select($"event_id", $"ts".cast("long").as("ts"), $"user_id")

  /** Mean per-file (max-min)/globalSpan for `c` over files of `dir`. */
  private def meanFileSpan(df: DataFrame, c: String): Double = {
    val g = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    val span = math.max(g.getDouble(1) - g.getDouble(0), 1e-9)
    val rows = df.groupBy(input_file_name())
      .agg((max(col(c)).cast("double") - min(col(c)).cast("double")).as("r"))
      .agg(avg($"r")).head()
    rows.getDouble(0) / span
  }

  test("cluster: narrow per-file ranges on BOTH columns; linear sort only on one") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString

    ZOrder.cluster(events, Seq("ts", "user_id"), numPartitions = 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    events.repartitionByRange(16, $"ts").sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(s"$dir/linear")

    val z = spark.read.parquet(s"$dir/z")
    val linear = spark.read.parquet(s"$dir/linear")

    // row multiset preserved
    assert(z.count() == events.count())
    assert(z.agg(sum($"event_id")).head().getLong(0) ==
      events.agg(sum($"event_id")).head().getLong(0))

    val zTs = meanFileSpan(z, "ts")
    val zUid = meanFileSpan(z, "user_id")
    val linTs = meanFileSpan(linear, "ts")
    val linUid = meanFileSpan(linear, "user_id")

    // z-order: both columns locally narrow (16 partitions over a 2-D
    // curve ⇒ expected span ~ 1/sqrt(16) = 0.25 per axis)
    assert(zTs < 0.6, s"z-order ts span too wide: $zTs")
    assert(zUid < 0.6, s"z-order user_id span too wide: $zUid")
    // linear sort: leading column narrow, other column ~ full range
    assert(linTs < 0.2, s"linear ts span unexpectedly wide: $linTs")
    assert(linUid > 0.8, s"linear user_id span unexpectedly narrow: $linUid")
  }

  test("withZValue interleaves monotonically on a single column") {
    val df = (0L until 256L).toDF("v")
    val z = ZOrder.withZValue(df, Seq("v"), bitsPerCol = 8)
      .orderBy("v").select("_z").as[Long].collect()
    assert(z.toSeq == z.sorted.toSeq, "single-column z-value must be monotone")
  }

  test("Container.saveZOrdered round-trips with is_current partitioning intact") {
    import graft.model.Meta
    import graft.store.Container
    val dir = java.nio.file.Files.createTempDirectory("zorder-cont").toString
    val hist = Seq(
      (1L, 10.0, Some(20.0), "a"),
      (1L, 20.0, None, "b"),
      (2L, 15.0, None, "c")
    ).toDF(Meta.OID, Meta.START, Meta.END, "v")
    val c = new Container(spark, "zc", hist, Some(dir))
    c.saveZOrdered(Meta.OID, Meta.START)
    assert(c.df.count() == 3)
    // current snapshot still partition-prunes on is_current
    assert(c.find(date = null).count() == 2)
    assert(Container.load(spark, "zc", dir).df.count() == 3)
  }

  test("string and timestamp columns are accepted") {
    val df = Seq(("apple", 1.0), ("banana", 2.0), ("cherry", 3.0)).toDF("s", "x")
    val z = ZOrder.withZValue(df, Seq("s", "x"), bitsPerCol = 8)
    assert(z.select("_z").distinct().count() == 3)
  }
}
