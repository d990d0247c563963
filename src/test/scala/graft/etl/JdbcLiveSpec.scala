package graft.etl

import graft.model.Meta
import graft.store.Container

import org.apache.spark.sql.functions._

/** LIVE JDBC battery against embedded Apache Derby (on the Spark
  * classpath) — the twin of the reference's sqlalchemy proxy tests
  * (tests/test_sqla_proxy.py:28-167): partitioned extraction,
  * IN-list predicate batching, field-spec SQL with a LEFT JOIN, and
  * the delta/watermark resync, all against a real database instead of
  * shape-only assertions.
  */
/** The http(s) fetch wrapper, exercised against file:// URLs (the
  * environment has no egress; the retry/temp-file contract is URL-
  * scheme-independent). Reference: utils.py:1340-1359.
  */
class FetchSpec extends graft.SparkSpec {
  import java.nio.file.Files

  test("fetchToTemp downloads, keeps the extension, caller cleans up") {
    val src = Files.createTempFile("fetch-src-", ".csv")
    Files.writeString(src, "id,name\n1,a\n2,b\n")
    val got = Fetch.fetchToTemp(src.toUri.toString)
    assert(got.toString.endsWith(".csv"))
    assert(new String(Files.readAllBytes(got)).contains("2,b"))
    Files.delete(got); Files.delete(src)
  }

  test("fetchToTemp retries then fails with a diagnosable error; no temp leak") {
    val tmpDir = System.getProperty("java.io.tmpdir")
    def fetchTemps() = new java.io.File(tmpDir).list().count(_.startsWith("graft-fetch-"))
    val before = fetchTemps()
    val e = intercept[java.io.IOException] {
      Fetch.fetchToTemp("file:///nonexistent/graft-no-such-file.csv",
        retries = 3, backoffMs = 1L)
    }
    assert(e.getMessage.contains("after 3 attempts"))
    assert(fetchTemps() == before) // failed attempts deleted their temp files
  }

  test("loadUrl: fetch + extension dispatch + cleanup end-to-end") {
    val src = Files.createTempFile("fetch-src-", ".csv")
    Files.writeString(src, "id,state\n1,open\n2,closed\n3,open\n")
    val df = Fetch.loadUrl(spark, src.toUri.toString,
      oid = Loaders.OidColumn("id"), asOf = 123.0)
    assert(df.count() == 3)
    assert(df.columns.contains("state"))
    Files.delete(src)
  }
}

class JdbcLiveSpec extends graft.SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withConn[T](f: java.sql.Connection => T): T = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c)
    finally c.close()
  }

  private def setupDb(): Unit = withConn { c =>
    val st = c.createStatement()
    def drop(t: String): Unit =
      try { st.executeUpdate(s"DROP TABLE $t"); () } catch { case _: java.sql.SQLException => }
    drop("objects"); drop("owners")
    st.executeUpdate(
      "CREATE TABLE objects (id INT PRIMARY KEY, owner_id INT, state VARCHAR(16), mtime DOUBLE)")
    st.executeUpdate("CREATE TABLE owners (owner_id INT PRIMARY KEY, owner_name VARCHAR(32))")
    val ins = c.prepareStatement("INSERT INTO objects VALUES (?, ?, ?, ?)")
    (1 to 100).foreach { i =>
      ins.setInt(1, i); ins.setInt(2, i % 5)
      ins.setString(3, if (i % 3 == 0) "closed" else "open")
      ins.setDouble(4, 1000.0 + i)
      ins.executeUpdate()
    }
    val insO = c.prepareStatement("INSERT INTO owners VALUES (?, ?)")
    (0 until 5).foreach { o => insO.setInt(1, o); insO.setString(2, s"owner-$o"); insO.executeUpdate() }
    st.close()
  }

  test("partitioned numeric-range read: full rows, one stripe per partition") {
    setupDb()
    val df = JdbcSource.read(spark, url, "objects", "id", 1L, 100L, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    assert(df.agg(sum("id")).head().getLong(0) == 5050L)
  }

  test("IN-list predicate batching reads exactly the requested oids, one batch per partition") {
    setupDb()
    val oids = (1 to 30).filter(_ % 2 == 0)
    val preds = JdbcSource.oidBatchPredicates("id", oids, batchSize = 7)
    assert(preds.length == math.ceil(oids.size / 7.0).toInt)
    val df = JdbcSource.readByPredicates(spark, url, "objects", preds)
    assert(df.rdd.getNumPartitions == preds.length)
    assert(df.select("id").collect().map(_.getInt(0)).sorted.toSeq == oids)
  }

  test("field-spec SQL with LEFT JOIN extracts renamed + joined fields") {
    setupDb()
    val sql = JdbcSource.generateSql(
      "objects",
      Seq(
        JdbcSource.FieldSpec("id", Some("oid")),
        JdbcSource.FieldSpec("state"),
        JdbcSource.FieldSpec("owner_name", Some("owner"))),
      leftJoins = Seq("LEFT JOIN owners ON objects.owner_id = owners.owner_id"),
      where = Some("id <= 10"))
    val df = spark.read.jdbc(url, s"($sql) q", new java.util.Properties())
    assert(df.columns.toSeq.map(_.toLowerCase) == Seq("oid", "state", "owner"))
    val rows = df.collect().map(r => (r.getInt(0), r.getString(2))).toMap
    assert(rows.size == 10)
    assert(rows(3) == "owner-3")
  }

  test("delta watermark resync against the live table: new oids + mtime-changed oids") {
    setupDb()
    // target container knows oids 1..80 as of mtime 1080
    val known = spark.range(1, 81).select(col("id").as("k"))
    val target = new Container(spark, "objects",
      Meta.wrap(known, col("k"), asOf = 1080.0).withColumnRenamed("k", "okey"))
    // live side: 100 rows; rows 71..100 touched after the watermark
    withConn { c =>
      val st = c.createStatement()
      st.executeUpdate("UPDATE objects SET mtime = 2000.0 WHERE id > 70")
      st.close()
    }
    val source = JdbcSource.read(spark, url, "objects", "id", 1L, 100L, numPartitions = 4)
      .select(col("id").cast("long").as("id"), col("mtime"))
    val delta = Delta.deltaOids(source, "id", "mtime", target, since = 1500.0)
      .collect().map(_.getLong(0)).sorted
    // new: 81..100 (beyond max known); changed: 71..100 (mtime >= 1500)
    assert(delta.toSeq == (71L to 100L))
  }
}
