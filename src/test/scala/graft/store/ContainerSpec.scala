package graft.store

import graft.SparkSpec
import graft.model.Meta
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Port of the reference's shared `db_tester` battery
  * (test_sqla_proxy.py:28-167) + container versioning goldens
  * (test_MetriqueContainer.py:149-198).
  */
class ContainerSpec extends SparkSpec {

  /** One current object per oid: (oid, col_1, start). */
  private def objs(rows: (Long, Long, Double)*): DataFrame = {
    val schema = StructType(Seq(
      StructField("_oid", LongType), StructField("col_1", LongType),
      StructField("s", DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))), schema)
    df.select(col("_oid"), col("s").as(Meta.START),
        lit(null).cast(DoubleType).as(Meta.END), col("col_1"))
      .withColumn(Meta.HASH, Meta.contentHashOf("col_1" -> col("col_1")))
      .withColumn(Meta.ID, Meta.genId(col(Meta.OID), col(Meta.START), col(Meta.END)))
      .withColumn(Meta.V, lit(0))
      .withColumn(Meta.LIB_V, lit(Meta.LibVersion))
      .withColumn(Meta.E, lit(null).cast(MapType(StringType, StringType)))
  }

  private def empty: DataFrame = objs().limit(0)

  test("upsert: new oids insert as current") {
    val c = new Container(spark, "t", empty)
    c.upsert(objs((1L, 10L, 100.0), (2L, 20L, 100.0)))
    assert(c.df.count() == 2)
    assert(c.df.filter(col(Meta.END).isNull).count() == 2)
  }

  test("upsert idempotence: same content twice adds nothing (test_MetriqueContainer.py:164-170)") {
    val c = new Container(spark, "t", empty)
    c.upsert(objs((1L, 10L, 100.0)))
    c.upsert(objs((1L, 10L, 200.0))) // same content, later start
    assert(c.df.count() == 1)
    assert(c.df.head().getAs[Double](Meta.START) == 100.0)
  }

  test("upsert rotation: changed content closes old version, _ids == ['1', '1:<ts>']") {
    val c = new Container(spark, "t", empty)
    c.upsert(objs((1L, 10L, 100.0)))
    c.upsert(objs((1L, 11L, 200.0)))
    val rows = c.df.orderBy(Meta.START).collect()
    assert(rows.length == 2)
    val old = rows(0); val cur = rows(1)
    assert(old.getAs[Double](Meta.END) == 200.0)
    assert(old.getAs[String](Meta.ID) == "1:100.0")
    assert(cur.getAs[String](Meta.ID) == "1")
    assert(cur.isNullAt(cur.fieldIndex(Meta.END)))
    // third flush of the same new content: still 2 versions
    c.upsert(objs((1L, 11L, 300.0)))
    assert(c.df.count() == 2)
  }

  test("temporal count semantics per date-range form (test_sqla_proxy.py:100-110)") {
    // history: v1 [100,200), v2 [200,open)
    val hist = objs((1L, 10L, 100.0)).withColumn(Meta.END, lit(200.0))
      .withColumn(Meta.ID, Meta.genId(col(Meta.OID), col(Meta.START), col(Meta.END)))
      .unionByName(objs((1L, 11L, 200.0)))
    val c = new Container(spark, "t", hist)
    assert(c.count(date = null) == 1) // current only
    assert(c.count(date = "~") == 2) // all history
    assert(c.count(date = "1970-01-01 00:02:30") == 1) // as-of 150 s
    assert(c.count(date = "1970-01-01 00:01:40") == 0) // as-of 100: strict _start <
    assert(c.count(date = "~1970-01-01 00:02:30") == 1) // started before 150
    assert(c.count(date = "1970-01-01 00:02:30~") == 2) // alive on/after 150
  }

  test("find: projection appends default fields; sort+limit") {
    val c = new Container(spark, "t", objs((1L, 10L, 1.0), (2L, 20L, 1.0), (3L, 30L, 1.0)))
    val out = c.find(fields = "col_1", date = "~", sort = "_oid", descending = true, limit = 2)
    assert(out.columns.toSet == Set("col_1", "_start", "_end", "_oid"))
    assert(out.collect().map(_.getAs[Long]("_oid")).toSeq == Seq(3L, 2L))
  }

  test("distinct flattens array fields (sqlalchemy.py:706-721)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Seq("b", "a")), Row(2L, Seq("a", "c")))),
      StructType(Seq(
        StructField("_oid", LongType), StructField("tags", ArrayType(StringType)))))
    val c = new Container(spark, "t",
      df.withColumn(Meta.START, lit(0.0)).withColumn(Meta.END, lit(null).cast(DoubleType)))
    assert(c.distinct("tags").collect().map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(c.distinct("_oid").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("getLastField: max across all history") {
    val c = new Container(spark, "t", objs((1L, 10L, 100.0), (2L, 99L, 50.0)))
    assert(c.getLastField("col_1").contains(99L))
    assert(c.getLastField(Meta.START).contains(100.0))
  }

  test("history import replaces all versions of incoming oids") {
    val c = new Container(spark, "t", objs((1L, 10L, 100.0), (2L, 20L, 100.0)))
    val repl = objs((1L, 77L, 500.0))
    c.historyImport(repl)
    val rows = c.df.orderBy(Meta.OID).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("col_1") == 77L)
    assert(rows(1).getAs[Long]("col_1") == 20L)
  }

  test("dfind: per-version field diffs") {
    val hist = objs((1L, 10L, 100.0)).withColumn(Meta.END, lit(200.0))
      .unionByName(objs((1L, 11L, 200.0)))
    val c = new Container(spark, "t", hist)
    val d = c.dfind().collect()
    assert(d.length == 1)
    assert(d(0).getAs[String]("field") == "col_1")
    assert(d(0).getAs[String]("old_value") == "10")
    assert(d(0).getAs[String]("new_value") == "11")
  }

  test("deptree: BFS closure over a link field with cycles and depth limit") {
    // 1 -> 2 -> 3 -> 1 (cycle), 4 isolated
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 2L), Row(2L, 3L), Row(3L, 1L), Row(4L, null))),
      StructType(Seq(StructField("_oid", LongType), StructField("child", LongType))))
    val c = new Container(spark, "t",
      df.withColumn(Meta.START, lit(0.0)).withColumn(Meta.END, lit(null).cast(DoubleType)))
    assert(c.deptree("child", Seq(1L), date = "~").map(_.toString.toLong).sorted == Seq(1L, 2L, 3L))
    assert(c.deptree("child", Seq(1L), date = "~", level = 1).map(_.toString.toLong).sorted == Seq(1L, 2L))
    // isinMax = 0 forces every hop through the broadcast left_semi path;
    // the closure must be identical to the In-literal path
    assert(c.deptree("child", Seq(1L), date = "~", isinMax = 0).map(_.toString.toLong).sorted == Seq(1L, 2L, 3L))
    assert(c.deptree("child", Seq(1L), date = "~", level = 1, isinMax = 0).map(_.toString.toLong).sorted == Seq(1L, 2L))
  }

  test("deptree: mid-BFS switch from driver fringe to distributed fringe") {
    // binary-ish fan-out: 0 -> {1,2}, i -> {2i+1, 2i+2} up to 30.
    // isinMax = 2 keeps hop 1 (fringe {1,2}) on the driver path, then
    // hop 2's 4 kids trip the limit-probe and flip to the DataFrame
    // loop mid-traversal — the closure, the level semantics, and the
    // seen-set handoff (the oversized fringe must enter seen, r8
    // regression) all have to match the pure driver run.
    val links = (0L to 30L).map(i => Row(i, Seq(2 * i + 1, 2 * i + 2).filter(_ <= 30L)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(links),
      StructType(Seq(StructField("_oid", LongType),
        StructField("kids", ArrayType(LongType)))))
    val c = new Container(spark, "t",
      df.withColumn(Meta.START, lit(0.0)).withColumn(Meta.END, lit(null).cast(DoubleType)))
    val full = c.deptree("kids", Seq(0L), date = "~", isinMax = Int.MaxValue - 1)
      .map(_.toString.toLong).sorted
    assert(full == (0L to 30L), s"driver-path closure wrong: $full")
    val switched = c.deptree("kids", Seq(0L), date = "~", isinMax = 2)
      .map(_.toString.toLong).sorted
    assert(switched == full, s"switched closure diverged: $switched")
    // depth limit spanning the switch: level=3 reaches 0..14 on both paths
    val lvl = c.deptree("kids", Seq(0L), date = "~", level = 3, isinMax = 2)
      .map(_.toString.toLong).sorted
    assert(lvl == (0L to 14L), s"level-limited switched closure wrong: $lvl")
    assert(c.deptree("kids", Seq(0L), date = "~", level = 3).map(_.toString.toLong).sorted == lvl)
  }

  test("insert + union dedup by _id") {
    val c = new Container(spark, "t", objs((1L, 10L, 100.0)))
    c.insert(objs((2L, 20L, 100.0)))
    assert(c.df.count() == 2)
    assert(c.df.unionByName(c.df).dropDuplicates(Meta.ID).count() == 2)
  }
}
