package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Canonical-hash goldens — FROZEN (the reference freezes its py2
  * `sha1(repr(...))` goldens the same way, test_utils.py:651-659; ours
  * is sha1 of the name-sorted to_json rendering per SURVEY §7.2-1).
  * These gate every later refactor of the hash: if one of these moves,
  * every stored `_hash` on disk is invalidated.
  */
class MetaSpec extends SparkSpec {
  import spark.implicits._

  test("contentHashOf golden: scalars") {
    val got = Seq((42L, "bee")).toDF("a", "b")
      .select(Meta.contentHashOf("a" -> col("a"), "b" -> col("b")).as("h"))
      .head().getString(0)
    assert(got == "32ef61a45c8ad686552ded7df2317b15fd0d6b7c")
  }

  test("contentHashOf golden: with array field, order preserved") {
    val got = Seq((42L, "bee", Seq("x", "y"))).toDF("a", "b", "tags")
      .select(Meta.contentHashOf(
        "a" -> col("a"), "b" -> col("b"), "tags" -> col("tags")).as("h"))
      .head().getString(0)
    assert(got == "edd727bdbd12d8973718ff1f83236510f2a29e74")
    // array ORDER is part of identity (reference: test_utils.py:661-662)
    val reordered = Seq((42L, "bee", Seq("y", "x"))).toDF("a", "b", "tags")
      .select(Meta.contentHashOf(
        "a" -> col("a"), "b" -> col("b"), "tags" -> col("tags")).as("h"))
      .head().getString(0)
    assert(reordered != got)
  }

  test("hash stability: field-name order does not matter, values do") {
    val df = Seq((1L, "v")).toDF("x", "y")
    val h1 = df.select(Meta.contentHashOf("x" -> col("x"), "y" -> col("y"))).head().getString(0)
    val h2 = df.select(Meta.contentHashOf("y" -> col("y"), "x" -> col("x"))).head().getString(0)
    assert(h1 == h2)
    val h3 = Seq((2L, "v")).toDF("x", "y")
      .select(Meta.contentHashOf("x" -> col("x"), "y" -> col("y"))).head().getString(0)
    assert(h3 != h1)
  }

  test("genId: current vs historical version (reference gen_id)") {
    val df = Seq((7L, 100.5)).toDF("o", "s")
    val cur = df.select(Meta.genId(col("o"), col("s"), lit(null).cast("double"))).head().getString(0)
    val hist = df.select(Meta.genId(col("o"), col("s"), lit(200.0))).head().getString(0)
    assert(cur == "7")
    assert(hist == "7:100.5")
  }

  test("normalizeFieldName (reference key normalization)") {
    assert(Meta.normalizeFieldName("Price Close") == "price_close")
    assert(Meta.normalizeFieldName("  A!!B  ") == "ab")
    assert(Meta.normalizeFieldName("__x__") == "x")
    assert(Meta.normalizeFieldName("$$$") == "_")
  }

  test("dt2ts / ts2dt round-trip and goldens") {
    assert(TimeUtils.dt2ts("2014-01-01") == 1388534400.0)
    assert(TimeUtils.dt2ts("2014-01-01T12:30:00") == 1388579400.0)
    assert(TimeUtils.dt2ts("2014-01-01 12:30:00+05:00") == 1388579400.0) // offsets dropped
    assert(TimeUtils.dt2ts("1388534400") == 1388534400.0)
    assert(TimeUtils.ts2dt(1388534400.0).startsWith("2014-01-01T00:00:00"))
  }
}
