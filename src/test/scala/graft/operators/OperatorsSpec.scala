package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregate equals the plain groupBy (incl. a hot key)") {
    val df = (Seq.fill(500)(("hot", 1.0)) ++ Seq(("a", 2.0), ("a", 3.0), ("b", 4.0)))
      .toDF("k", "v")
    val salted = Salt.aggregate(df, Seq("k"), Seq(
        "n" -> (count(lit(1)), sum(col("n")).cast("long")),
        "s" -> (sum(col("v")), sum(col("s")))))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(salted == plain)
    assert(salted("hot")._1 == 500L)
  }

  test("countByKey") {
    val df = Seq("x", "x", "y").toDF("k")
    val got = Salt.countByKey(df, Seq("k"), buckets = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("x" -> 2L, "y" -> 1L))
  }

  test("saltedJoin == plain equi-join incl. a hot key and duplicate right rows") {
    // hot key 1 (400 left rows), key 2 with TWO right matches (the
    // replicate-per-salt path must not double-count multiplicity),
    // key 3 unmatched on the right, right key 9 unmatched on the left
    val left = ((1 to 400).map(i => (1L, i.toLong)) ++
      Seq((2L, 900L), (2L, 901L), (3L, 950L))).toDF("k", "lv")
    val right = Seq((1L, "r1"), (2L, "r2a"), (2L, "r2b"), (9L, "r9")).toDF("k", "rv")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
    val inner = canon(Salt.saltedJoin(left, right, Seq("k"), buckets = 5))
    assert(inner == canon(left.join(right, Seq("k"))), "inner diverged")
    val lo = canon(Salt.saltedJoin(left, right, Seq("k"), buckets = 5, joinType = "left"))
    assert(lo == canon(left.join(right, Seq("k"), "left")), "left_outer diverged")
    assert(lo.exists(t => t._1 == 3L && t._3.isEmpty), "unmatched left row lost")
    // the hot key's left rows actually fan out over >1 salt value
    val salts = left.filter(col("k") === 1L)
      .withColumn("_s", pmod(hash(col("k"), col("lv")), lit(5)))
      .select("_s").distinct().count()
    assert(salts > 1, "hot key rows all landed on one salt — no skew relief")
    intercept[IllegalArgumentException] {
      Salt.saltedJoin(left, right, Seq("k"), joinType = "full")
    }
    intercept[IllegalArgumentException] {
      Salt.saltedJoin(left.withColumn("_salt", lit(1)), right, Seq("k"))
    }
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("session boundaries at gaps; rollup counts") {
    val df = Seq(
      (1L, 0.0), (1L, 100.0), (1L, 5000.0), (1L, 5100.0), // 2 sessions
      (2L, 0.0)) // 1 session
      .toDF("u", "t")
    val ids = Sessionize.withSessionIds(df, "u", "t", gapSeconds = 1800.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(ids((1L, 0.0)) == 1L && ids((1L, 100.0)) == 1L)
    assert(ids((1L, 5000.0)) == 2L && ids((1L, 5100.0)) == 2L)
    val roll = Sessionize.sessions(df, "u", "t", 1800.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(roll == Map((1L, 1L) -> 2L, (1L, 2L) -> 2L, (2L, 1L) -> 1L))
  }
}

class SketchesSpec extends graft.SparkSpec {
  import spark.implicits._
  import graft.functions.Sketches

  test("approx distinct within rsd of exact; HLL sketch merge estimates") {
    val df = (1 to 10000).map(i => ("k", i % 1000)).toDF("k", "v")
    val approx = Sketches.approxDistinctByKey(df, Seq("k"), "v", rsd = 0.02)
      .head().getLong(1)
    assert(math.abs(approx - 1000) < 100)
    val sk = Sketches.hllSketchByKey(df, Seq("k"), "v")
    val merged = Sketches.hllMerge(sk, Seq("k")).head().getLong(1).toDouble
    assert(math.abs(merged - 1000) < 100)
  }

  test("exact quantiles interpolate; approx within tolerance") {
    val df = (1 to 101).map(i => ("k", i.toDouble)).toDF("k", "v")
    val q = Sketches.quantilesByKey(df, Seq("k"), "v", Seq(0.5))
      .head().getSeq[Double](1)
    assert(q == Seq(51.0))
    val qa = Sketches.approxQuantilesByKey(df, Seq("k"), "v", Seq(0.5))
      .head().getSeq[Double](1)
    assert(math.abs(qa.head - 51.0) <= 1.0)
  }

  test("countMinEstimates within eps*N of exact point frequencies") {
    val df = (1 to 10000).map(i => ("t" + (i % 4)).toString).toDF("v")
    val est = Sketches.countMinEstimates(df, "v", Seq("t0", "t1", "t2", "t3")).toMap
    // CMS overestimates by at most eps*N (w.h.p.); never underestimates
    Seq("t0", "t1", "t2", "t3").foreach { t =>
      assert(est(t) >= 2500 && est(t) <= 2500 + 10, s"$t -> ${est(t)}")
    }
  }

  test("frequentItems surfaces the planted heavy hitter") {
    // value 7 has 30% frequency; the rest are near-unique
    val df = (1 to 10000).map(i => if (i % 10 < 3) 7L else i.toLong).toDF("v")
    val hits = Sketches.frequentItems(df, Seq("v"), support = 0.1)
      .head().getSeq[Long](0)
    assert(hits.contains(7L), s"heavy hitter missing from $hits")
  }

  test("histogram: equal bins, under/overflow rows, null skip") {
    val df = Seq(Some(-5.0), Some(0.0), Some(5.0), Some(9.9), Some(10.0),
      Some(25.0), None).map(Tuple1(_)).toDF("v")
    val out = Sketches.histogram(df, "v", lo = 0.0, hi = 10.0, bins = 2)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3))))
    assert(out.toSeq == Seq(
      (-1L, 1L, None, None),               // -5 underflows
      (0L, 1L, Some(0.0), Some(5.0)),      // 0.0
      (1L, 2L, Some(5.0), Some(10.0)),     // 5.0 and 9.9
      (2L, 2L, None, None)))               // 10.0 (right-open) and 25
  }

  test("trimOutliers keeps the IQR band, drops the planted outlier, skips NULLs") {
    val df = ((1 to 99).map(i => ("g", Some(i.toDouble))) ++
      Seq(("g", Some(10000.0)), ("g", None: Option[Double])))
      .toDF("k", "v")
    val kept = Sketches.trimOutliers(df, Seq("k"), "v")
      .select("v").collect().map(_.getDouble(0))
    assert(!kept.contains(10000.0) && kept.length == 99) // outlier + NULL gone
    assert(kept.min == 1.0 && kept.max == 99.0)          // the band survives intact
    // NULL group keys are a group, not silent data loss
    val withNullKey = ((1 to 20).map(i => (Some("g"), i.toDouble)) ++
      Seq((None: Option[String], 1.0), (None, 2.0), (None, 3.0)))
      .toDF("k", "v")
    val nullKept = Sketches.trimOutliers(withNullKey, Seq("k"), "v")
      .filter(col("k").isNull).count()
    assert(nullKept == 3)
    // fence-name collision is rejected up front, not an analysis error
    intercept[IllegalArgumentException] {
      Sketches.trimOutliers(df.withColumn("q1", col("v")), Seq("k"), "v")
    }
  }

  test("skewReport ranks heavy keys with exact shares and totals") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val out = Sketches.skewReport(df, Seq("k"), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("a", 6L, 0.6, 1L, 10L, 3L),
      ("b", 3L, 0.3, 2L, 10L, 3L)))
  }

  test("bloom filter: zero false negatives; FPs match the position-set reference exactly") {
    import graft.functions.HashUtil
    val m = 512
    val k = 4
    val members = (0 until 200).map(i => s"member_$i")
    val others = (0 until 300).map(i => s"other_$i")
    val bloom = Sketches.bloomBuild(members.toDF("key"), "key", mBits = m, numHashes = k)
    val probe = (members ++ others).zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "key")
    val got = Sketches.bloomProbe(probe, "id", "key", bloom, mBits = m, numHashes = k)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // independent reference: raw position-set semantics, no packing
    def positions(s: String): Seq[Long] = {
      val base = java.lang.Long.remainderUnsigned(HashUtil.md5Lower64(s), HashUtil.P)
      (0 until k).map(i => (HashUtil.laneA(i) * base + HashUtil.laneB(i)) % HashUtil.P % m)
    }
    val built = members.flatMap(positions).toSet
    (members ++ others).zipWithIndex.foreach { case (s, i) =>
      val want = positions(s).forall(built.contains)
      assert(got(i.toLong) == want, s"key $s: got ${got(i.toLong)}, want $want")
    }
    // members can NEVER miss; at this load (800 set-bit candidates in
    // 512 bits) some non-member must collide or the fixture is broken
    members.indices.foreach(i => assert(got(i.toLong), s"false negative at $i"))
    assert(others.indices.exists(i => got((members.size + i).toLong)),
      "fixture produced no false positive — m too large to exercise the FP path")
    assert(others.indices.exists(i => !got((members.size + i).toLong)),
      "all non-members hit — degenerate all-true filter")
    // packed words carry exactly the reference bit set
    val bits = bloom.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val popcount = bits.values.map(java.lang.Long.bitCount).sum
    assert(popcount == built.size, s"packed $popcount bits, reference ${built.size}")
    built.foreach { p =>
      assert((bits.getOrElse(p / 64, 0L) & (1L << (p % 64).toInt)) != 0L,
        s"reference position $p not set in the packed words")
    }
    // the join-free densified form answers identically (the streaming
    // / map-side-prefilter deployment shape)
    val words = Sketches.bloomWords(bloom, mBits = m)
    assert(words.length == m / 64)
    val inline = probe
      .select(col("id"), Sketches.bloomHit(col("key"), words, m, k).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(inline == got, "bloomHit diverged from bloomProbe")
  }

  test("bloom null keys: build skips them, probe reports hit=false (row retained)") {
    val m = 256
    val members = Seq(Some("x"), None, Some("y")).toDF("key")
    val bloom = Sketches.bloomBuild(members, "key", mBits = m)
    // no (null, null) word row — bloomWords must densify cleanly
    val words = Sketches.bloomWords(bloom, mBits = m)
    assert(words.exists(_ != 0L))
    val probe = Seq((1L, Some("x")), (2L, Option.empty[String]), (3L, Some("y")))
      .toDF("id", "key")
    val got = Sketches.bloomProbe(probe, "id", "key", bloom, mBits = m)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true), s"got $got")
    val inline = probe
      .select(col("id"), Sketches.bloomHit(col("key"), words, m).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(inline == got, "bloomHit null-key handling diverged from bloomProbe")
  }

  test("bloom probe against an empty filter misses everything; build bounds validated") {
    val empty = Sketches.bloomBuild(Seq.empty[String].toDF("key"), "key", mBits = 256)
    val got = Sketches.bloomProbe(
        Seq((1L, "x"), (2L, "y")).toDF("id", "key"), "id", "key", empty, mBits = 256)
      .collect().map(_.getBoolean(1))
    assert(got.forall(_ == false))
    intercept[IllegalArgumentException] {
      Sketches.bloomBuild(Seq("a").toDF("key"), "key", mBits = 0)
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomBuild(Seq("a").toDF("key"), "key", numHashes = 17)
    }
  }
}

class AsOfJoinSpec extends graft.SparkSpec {
  import spark.implicits._

  test("latest right at-or-before left time; null when none; equal-time matches") {
    val left = Seq((1L, 10.0, "e1"), (1L, 25.0, "e2"), (2L, 5.0, "e3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10.0, "a"), (1L, 20.0, "b"), (2L, 50.0, "z"))
      .toDF("rk", "rt", "state")
    val got = AsOfJoin.join(left, right, "k", "rk", "t", "rt", Seq("state"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(got == Map(
      "e1" -> Some("a"),  // equal time matches (<=)
      "e2" -> Some("b"),  // latest before 25
      "e3" -> None))      // right row is after
  }

  test("nullable payload: a null state still overwrites the carry") {
    val left = Seq((1L, 30.0, "e")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10.0, Some("old")), (1L, 20.0, None: Option[String]))
      .toDF("rk", "rt", "state")
    val got = AsOfJoin.join(left, right, "k", "rk", "t", "rt", Seq("state")).head()
    assert(got.isNullAt(3)) // the t=20 null version wins, not "old"
  }
}
