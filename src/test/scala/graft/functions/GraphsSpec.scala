package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer-nano PageRank: hand-checkable invariants, a naive
  * driver-side reference replay (the oracle's algebra), truncating-
  * division edges, and the pin-release contract.
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  /** Naive replay of the exact integer recurrence at a unit of
    * `10^digits`, rescaled to nano like the engine output.
    */
  private def naivePr(
      edges: Seq[(Long, Long)], iters: Int, d: Long = 850L,
      digits: Int = 9): Map[Long, Long] = {
    val u = math.pow(10, digits).toLong
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, g) => (s, g.size.toLong) }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var r = nodes.map(n => (n, u)).toMap
    (1 to iters).foreach { _ =>
      val c = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
      e.foreach { case (s, t) => c(t) += r(s) / deg(s) }
      r = nodes.map(n => (n, (1000L - d) * (u / 1000L) + (d * c(n)) / 1000L)).toMap
    }
    val toNano = math.pow(10, 9 - digits).toLong
    r.map { case (n, v) => (n, v * toNano) }
  }

  test("regular cycle is a fixpoint at exactly 1e9") {
    // a->b->c->a: deg 1 everywhere, mass conserved: 150M + 850M = 1e9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = Graphs.pageRank(edges, "src", "dst", iterations = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1000000000L, 2L -> 1000000000L, 3L -> 1000000000L))
  }

  test("star + chain matches the naive integer replay (truncating div exercised)") {
    // 3 leaves -> hub (deg-1 leaves), hub -> 3 leaves (deg 3: 1e9/3
    // truncates), plus a tail the hub feeds
    val e = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L),
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 20L))
    val got = Graphs.pageRank(e.toDF("src", "dst"), "src", "dst", iterations = 6)
      .as[(Long, Long)].collect().toMap
    assert(got == naivePr(e, 6))
    // the tail node has no out-edges (dangling) and never feeds back
    assert(got(20L) < got(10L))
  }

  test("duplicate and null edges are cleaned; iterations=1 supported") {
    val e = Seq(
      (Some(1L), Some(2L)), (Some(1L), Some(2L)), (None, Some(2L)), (Some(2L), None))
      .toDF("src", "dst")
    val got = Graphs.pageRank(e, "src", "dst", iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == naivePr(Seq((1L, 2L)), 1))
  }

  test("forced micro unit matches the micro naive replay, rescaled x1000") {
    // the truncating hub division (1e6/3 at micro vs 1e9/3 at nano)
    // makes micro ranks differ from nano beyond the trailing zeros —
    // this asserts the engine really computed at micro precision
    val e = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L),
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 20L))
    val got = Graphs.pageRank(
        e.toDF("src", "dst"), "src", "dst", iterations = 6, unit = "micro")
      .as[(Long, Long)].collect().toMap
    assert(got == naivePr(e, 6, digits = 6))
    assert(got.values.forall(_ % 1000L == 0L), "micro output rescales x1000")
    assert(got != naivePr(e, 6), "micro truncation must differ from nano here")
  }

  test("auto picks nano on small graphs; bad unit names fail loud") {
    val e = Seq((1L, 10L), (10L, 1L), (10L, 20L))
    val auto = Graphs.pageRank(
        e.toDF("src", "dst"), "src", "dst", iterations = 3, unit = "auto")
      .as[(Long, Long)].collect().toMap
    assert(auto == naivePr(e, 3), "auto == nano below the nano bound")
    val ex = intercept[IllegalArgumentException] {
      Graphs.pageRank(e.toDF("src", "dst"), "src", "dst", 3, unit = "femto")
    }
    assert(ex.getMessage.contains("unit must be one of"))
  }

  test("only the result's pins survive and unpin releases exactly them") {
    // assert on the ids the operator REGISTERED, not a global
    // persistent-RDD set-diff — that races under parallel suites
    val r = Graphs.pageRank(
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), "src", "dst", iterations = 3)
    r.count()
    val pins = Pins.registered(r)
    assert(pins.nonEmpty && pins.size <= 2,
      s"only the final round's pins may survive, got ${pins.size}")
    assert(pins.forall(spark.sparkContext.getPersistentRDDs.contains),
      "registered pins must be live before unpin")
    Graphs.unpin(r)
    assert(pins.forall(id => !spark.sparkContext.getPersistentRDDs.contains(id)),
      "unpin must release the result's blocks")
    Graphs.unpin(r) // idempotent no-op
  }

  test("triangleCounts: hand-checked graphs, duplicates/orientation-proof") {
    // K3 plus a pendant: nodes 1,2,3 form the triangle; 4 hangs off 3.
    // Edges deliberately duplicated and flipped — canonicalization
    // must collapse them.
    val e1 = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val got = Graphs.triangleCounts(e1, "src", "dst")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, round6(2.0 / 6.0))))
    assert(got(4L) == ((1L, 0L, 0.0)))

    // two triangles sharing edge (1,2): T(1)=T(2)=2, T(3)=T(4)=1
    val e2 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)).toDF("src", "dst")
    val got2 = Graphs.triangleCounts(e2, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got2 == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))

    // total-triangle conservation on a seeded random graph: sum of
    // per-node counts == 3 * naive triple-loop count
    val rnd = new scala.util.Random(11)
    val edges = (1 to 120).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val naive = (for {
      a <- 0L until 20L; b <- a + 1 until 20L; c <- b + 1 until 20L
      if canon((a, b)) && canon((b, c)) && canon((a, c))
    } yield 1).size
    val sumPerNode = Graphs.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .agg(sum("n_triangles")).collect()(0).getLong(0)
    assert(sumPerNode == 3L * naive, s"per-node sum $sumPerNode vs 3x$naive")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Weighted-walk replay: contribution (r·w) div W(u), parallel
    * edges pre-summed.
    */
  private def naiveWpr(
      edges: Seq[(Long, Long, Long)], iters: Int, d: Long = 850L): Map[Long, Long] = {
    val e = edges.groupBy(t => (t._1, t._2))
      .map { case ((s, t), g) => (s, t, g.map(_._3).sum) }.toSeq
    val ws = e.groupBy(_._1).map { case (s, g) => (s, g.map(_._3).sum) }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var r = nodes.map(n => (n, 1000000000L)).toMap
    (1 to iters).foreach { _ =>
      val c = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
      e.foreach { case (s, t, w) => c(t) += (r(s) * w) / ws(s) }
      r = nodes.map(n => (n, 150L * 1000000L + (d * c(n)) / 1000L)).toMap
    }
    r
  }

  test("weightedPageRank: parallel edges sum, skew pulls rank, replay exact") {
    // hub 10 sends 9/10 of its mass to 1 (w=9 vs 1); parallel (2,10)
    // edges must merge to w=5
    val e = Seq((10L, 1L, 9L), (10L, 2L, 1L), (1L, 10L, 3L),
      (2L, 10L, 2L), (2L, 10L, 3L))
    val got = Graphs.weightedPageRank(
        e.toDF("src", "dst", "w"), "src", "dst", "w", iterations = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == naiveWpr(e, 5))
    assert(got(1L) > got(2L), "the w=9 target must outrank the w=1 target")
  }

  test("weightedPageRank with uniform weights equals the unweighted walk; w<1 loud") {
    val e = Seq((1L, 10L), (2L, 10L), (10L, 1L), (10L, 2L), (10L, 20L))
    val wpr = Graphs.weightedPageRank(
        e.map(t => (t._1, t._2, 1L)).toDF("src", "dst", "w"),
        "src", "dst", "w", iterations = 4)
      .as[(Long, Long)].collect().toMap
    val pr = Graphs.pageRank(e.toDF("src", "dst"), "src", "dst", iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(wpr == pr)
    val ex = intercept[IllegalArgumentException] {
      Graphs.weightedPageRank(
        Seq((1L, 2L, 0L)).toDF("src", "dst", "w"), "src", "dst", "w", iterations = 1)
    }
    assert(ex.getMessage.contains("weights must be >= 1"))
  }

  /** Seeded-walk replay: [[naivePr]] with base term and initial mass
    * gated on seed membership.
    */
  private def naivePpr(
      edges: Seq[(Long, Long)], seeds: Set[Long], iters: Int,
      d: Long = 850L, digits: Int = 9): Map[Long, Long] = {
    val u = math.pow(10, digits).toLong
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, g) => (s, g.size.toLong) }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var r = nodes.map(n => (n, if (seeds(n)) u else 0L)).toMap
    (1 to iters).foreach { _ =>
      val c = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
      e.foreach { case (s, t) => c(t) += r(s) / deg(s) }
      r = nodes.map(n => (n,
        (if (seeds(n)) (1000L - d) * (u / 1000L) else 0L) + (d * c(n)) / 1000L)).toMap
    }
    val toNano = math.pow(10, 9 - digits).toLong
    r.map { case (n, v) => (n, v * toNano) }
  }

  test("personalizedPageRank: seeded star/chain matches the naive replay; unreached stay 0") {
    // hub graph plus a DISCONNECTED pair (40,41): no path from the
    // seed -> exact 0, and the frontier filter must not drop the rows
    val e = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L),
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 20L),
      (40L, 41L), (41L, 40L))
    val seeds = Seq(1L).toDF("s")
    val got = Graphs.personalizedPageRank(
        e.toDF("src", "dst"), "src", "dst", seeds, "s", iterations = 6)
      .as[(Long, Long)].collect().toMap
    assert(got == naivePpr(e, Set(1L), 6))
    assert(got(40L) == 0L && got(41L) == 0L, "unreached nodes report exact 0")
    assert(got(1L) > got(20L), "the seed outranks the far tail")
  }

  test("personalizedPageRank: all-node seed set equals the global walk; no-seed fails loud") {
    val e = Seq((1L, 10L), (10L, 1L), (10L, 20L))
    val all = Seq(1L, 10L, 20L).toDF("s")
    val ppr = Graphs.personalizedPageRank(
        e.toDF("src", "dst"), "src", "dst", all, "s", iterations = 4)
      .as[(Long, Long)].collect().toMap
    val pr = Graphs.pageRank(e.toDF("src", "dst"), "src", "dst", iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(ppr == pr)
    val ex = intercept[IllegalArgumentException] {
      Graphs.personalizedPageRank(
        e.toDF("src", "dst"), "src", "dst", Seq(99L).toDF("s"), "s", iterations = 2)
    }
    assert(ex.getMessage.contains("no seed id occurs in the graph"))
  }

  /** Synchronous peel replay: symmetrize/clean, then per round drop
    * ALL nodes with degree < k at once; None = run to fixpoint.
    */
  private def naiveCore(
      edges: Seq[(Long, Long)], k: Int, rounds: Option[Int]): Map[Long, Long] = {
    var e = edges.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
    var round = 0
    var done = e.isEmpty
    while (!done) {
      val deg = e.groupBy(_._1).map { case (n, g) => (n, g.size) }
      val keep = deg.filter(_._2 >= k).keySet
      val next = e.filter(p => keep(p._1) && keep(p._2))
      round += 1
      done = rounds.map(round >= _).getOrElse(next.size == e.size) || next.isEmpty
      e = next
    }
    e.groupBy(_._1).map { case (n, g) => (n, g.size.toLong) }
  }

  test("kCore: K4 + pendant chain peels to exactly the K4; chain case needs 2 rounds") {
    // K4 on {1,2,3,4}; chain 4-5-6 hangs off it
    val e = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val got = Graphs.kCore(e.toDF("src", "dst"), "src", "dst", k = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(got == naiveCore(e, 3, None))

    // chain a-b-c-d at k=2: round 1 keeps {b,c} (degree-2 mid nodes),
    // round 2 empties — kCoreRounds(1) differs from the fixpoint
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val r1 = Graphs.kCoreRounds(chain.toDF("src", "dst"), "src", "dst", k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(2L -> 1L, 3L -> 1L))
    assert(r1 == naiveCore(chain, 2, Some(1)))
    val fix = Graphs.kCore(chain.toDF("src", "dst"), "src", "dst", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(fix.isEmpty)
  }

  test("kCore: seeded random graph replays the synchronous peel at fixed rounds and fixpoint") {
    val rnd = new scala.util.Random(29)
    val e = (1 to 120).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    for (r <- Seq(Some(1), Some(2), None)) {
      val got = r match {
        case Some(n) => Graphs.kCoreRounds(e.toDF("src", "dst"), "src", "dst", 3, n)
        case None => Graphs.kCore(e.toDF("src", "dst"), "src", "dst", 3)
      }
      assert(got.as[(Long, Long)].collect().toMap == naiveCore(e, 3, r), s"rounds=$r")
    }
  }

  /** Synchronous LPA replay: symmetrize, then per round every node
    * takes the (count desc, label asc)-best neighbor label.
    */
  private def naiveLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val nodes = und.map(_._1).distinct
    var lab = nodes.map(n => (n, n)).toMap
    (1 to iters).foreach { _ =>
      lab = und.groupBy(_._2).map { case (v, es) =>
        val best = es.map(e => lab(e._1)).groupBy(identity)
          .toSeq.map { case (l, g) => (-g.size.toLong, l) }.min
        (v, best._2)
      }
    }
    lab
  }

  test("labelPropagation: bridged cliques match the synchronous replay") {
    // two triangles bridged at (3,10); edges deliberately directed,
    // duplicated, and self-looped — canonicalization must absorb all
    val e = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (2L, 2L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (3L, 10L))
    for (iters <- Seq(1, 2, 5)) {
      val got = Graphs.labelPropagation(e.toDF("src", "dst"), "src", "dst", iters)
        .as[(Long, Long)].collect().toMap
      assert(got == naiveLpa(e, iters), s"iters=$iters")
    }
    // by round 5 each clique coalesces onto one label and the two
    // cliques stay distinct (the bridge cannot outvote a triangle)
    val stable = Graphs.labelPropagation(e.toDF("src", "dst"), "src", "dst", 5)
      .as[(Long, Long)].collect().toMap
    assert(Set(stable(1L), stable(2L), stable(3L)).size == 1)
    assert(Set(stable(10L), stable(11L), stable(12L)).size == 1)
    assert(stable(1L) != stable(10L))
  }

  test("labelPropagation: seeded random graph replays exactly (tie-break total)") {
    val rnd = new scala.util.Random(7)
    val e = (1 to 150).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
    val got = Graphs.labelPropagation(e.toDF("src", "dst"), "src", "dst", 4)
      .as[(Long, Long)].collect().toMap
    assert(got == naiveLpa(e, 4))
  }

  /** Integer HITS replay: per half-step, sum then truncating
    * max-rescale into [0, 1e6] with the ceiling divisor.
    */
  private def naiveHits(
      edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val U = 1000000L
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var h = nodes.map(n => (n, U)).toMap
    var a = Map.empty[Long, Long]
    (1 to iters).foreach { _ =>
      val rawA = nodes.map(n => (n, e.filter(_._2 == n).map(x => h(x._1)).sum)).toMap
      val da = math.max((rawA.values.max + U - 1) / U, 1L)
      a = rawA.map { case (n, v) => (n, v / da) }
      val rawH = nodes.map(n => (n, e.filter(_._1 == n).map(x => a(x._2)).sum)).toMap
      val dh = math.max((rawH.values.max + U - 1) / U, 1L)
      h = rawH.map { case (n, v) => (n, v / dh) }
    }
    nodes.map(n => (n, (h(n), a(n)))).toMap
  }

  test("hits: hub/authority separation on a hand graph; pure sinks score hub 0") {
    // 1 links to both targets, 2 to one: 1 is the better hub; 3 is
    // the better authority; 3/4 link nowhere -> hub 0
    val e = Seq((1L, 3L), (1L, 4L), (2L, 3L))
    val got = Graphs.hits(e.toDF("src", "dst"), "src", "dst", iterations = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == naiveHits(e, 3))
    assert(got(1L)._1 > got(2L)._1, "two out-links beat one")
    assert(got(3L)._2 > got(4L)._2, "two in-links beat one")
    assert(got(3L)._1 == 0L && got(4L)._1 == 0L, "sinks are zero hubs")
    assert(got(1L)._2 == 0L && got(2L)._2 == 0L, "sources are zero authorities")
    // the CEILING divisor keeps every score <= 1e6 but lands the max
    // in (5e5, 1e6] (d = ceil(m/U) can overshoot m/U by up to 2x)
    assert(got.values.map(_._1).max > 500000L && got.values.map(_._1).max <= 1000000L)
    assert(got.values.map(_._2).max > 500000L && got.values.map(_._2).max <= 1000000L)
  }

  test("hits: seeded random digraph replays exactly; nulls/dups cleaned") {
    val rnd = new scala.util.Random(13)
    val e = (1 to 200).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val withJunk = (e ++ e.take(20)).map { case (a, b) => (Some(a), Some(b)) } :+
      ((None: Option[Long], Some(1L))) :+ ((Some(1L), None: Option[Long]))
    val got = Graphs.hits(withJunk.toDF("src", "dst"), "src", "dst", iterations = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == naiveHits(e, 2))
  }

  test("hits: empty or all-null edge input fails loud, not with an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val e1 = intercept[IllegalArgumentException](
      Graphs.hits(empty, "src", "dst", iterations = 1))
    assert(e1.getMessage.contains("no edges"))
    val allNull = Seq((None: Option[Long], None: Option[Long])).toDF("src", "dst")
    val e2 = intercept[IllegalArgumentException](
      Graphs.hits(allNull, "src", "dst", iterations = 1))
    assert(e2.getMessage.contains("no edges"))
  }

  test("labelPropagation and hits register exactly their surviving pins") {
    val lp = Graphs.labelPropagation(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), "src", "dst", iterations = 2)
    lp.count()
    val lpPins = Pins.registered(lp)
    assert(lpPins.nonEmpty && lpPins.size <= 2)
    Graphs.unpin(lp)
    assert(lpPins.forall(id => !spark.sparkContext.getPersistentRDDs.contains(id)))

    val ht = Graphs.hits(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), "src", "dst", iterations = 2)
    ht.count()
    val htPins = Pins.registered(ht)
    assert(htPins.nonEmpty && htPins.size <= 4,
      s"only the final hub+auth raw pins may survive, got ${htPins.size}")
    Graphs.unpin(ht)
    assert(htPins.forall(id => !spark.sparkContext.getPersistentRDDs.contains(id)))
  }

  test("Pins.releaseAll reclaims pins leaked by callers that skip unpin") {
    // a "leaked" pin: materialized result, unpin never called
    val r = Graphs.pageRank(
      Seq((5L, 6L), (6L, 5L)).toDF("src", "dst"), "src", "dst", iterations = 2)
    r.count()
    val leaked = Pins.registered(r)
    assert(leaked.nonEmpty &&
      leaked.forall(spark.sparkContext.getPersistentRDDs.contains))
    val n = Curation.releaseAllPins(spark)
    assert(n >= leaked.size, s"releaseAll freed $n, leaked ${leaked.size}")
    assert(leaked.forall(id => !spark.sparkContext.getPersistentRDDs.contains(id)),
      "releaseAll must unpersist the leaked blocks")
    assert(Pins.registered(r).isEmpty, "registry must be cleared")
  }
}
