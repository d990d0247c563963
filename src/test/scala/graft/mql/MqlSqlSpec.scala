package graft.mql

import graft.SparkSpec

import org.apache.spark.sql.SparkSession

/** `mql()` as a SQL function — both wirings (running-session register,
  * builder-time extensions) plus the scale property that matters: the
  * compiled predicate reaches the parquet scan as a pushed filter.
  */
class MqlSqlSpec extends SparkSpec {

  test("mql() in spark.sql via register(): scalar + array semantics") {
    new graft.GraftExtensions().register(spark)
    import spark.implicits._
    Seq(
      (1L, 8.0, Seq("a", "b")),
      (2L, 9.0, Seq("c")),
      (3L, 3.0, Seq("a"))
    ).toDF("id", "x", "tags").createOrReplaceTempView("mql_sql_t")

    // array == is ANY-element (reference: parse.py:201-203)
    val ids = spark.sql(
      """SELECT id FROM mql_sql_t WHERE mql('x > 5 and tags == "a"')""")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L))

    // composes with ordinary SQL around it
    val n = spark.sql(
      """SELECT count(*) AS n FROM mql_sql_t WHERE mql('tags in ["a", "z"]') AND id < 3""")
      .head().getLong(0)
    assert(n == 1L)
  }

  test("round-5 kernels are SQL-callable after register()") {
    new graft.GraftExtensions().register(spark)
    import spark.implicits._
    Seq((1L, "the cat sat on the mat and the dog sat too")).toDF("id", "text")
      .createOrReplaceTempView("sqldocs")
    val r = spark.sql(
      """SELECT quality_stats(text).n_tokens AS n,
        |  size(shingle_set(text, 3)) AS n_sh,
        |  size(shingle_pos_hashes(text, 1)) AS n_tok,
        |  size(chunk_docs(text, 4, 1)) AS n_chunks
        |FROM sqldocs""".stripMargin).head()
    assert(r.getLong(0) == 11L)   // 11 tokens
    assert(r.getInt(1) == 9)      // 9 distinct 3-gram shingles
    assert(r.getInt(2) == 11)     // positional token hashes
    assert(r.getInt(3) == 4)      // chunks of 4 tokens, stride 3 over 11
  }

  test("mql() rejects non-literal and malformed arguments") {
    new graft.GraftExtensions().register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT mql(id) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("string literal"))
  }

  test("mql() via spark.sql.extensions resolves in analysis and pushes to the scan") {
    val base = spark // force shared session init before swapping
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-session")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    try {
      s2.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .createOrReplaceTempView("mql_ext_li")
      val df = s2.sql(
        """SELECT l_orderkey FROM mql_ext_li WHERE mql("l_quantity > 45.0 and l_returnflag == 'R'")""")
      val expected = s2.table("mql_ext_li")
        .where("l_quantity > 45.0 AND l_returnflag = 'R'").count()
      assert(df.count() == expected && expected > 0)
      // analysis-time rewrite ⇒ ordinary Filter ⇒ parquet PushedFilters
      val physical = df.queryExecution.toString
      assert(physical.contains("PushedFilters") &&
        physical.contains("GreaterThan(l_quantity,45.0)"),
        s"predicate not pushed to scan:\n$physical")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
