package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer-nano PageRank: hand-checkable invariants, a naive
  * driver-side reference replay (the oracle's algebra), truncating-
  * division edges, and the pin-release contract.
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  /** Naive replay of the exact integer recurrence. */
  private def naivePr(
      edges: Seq[(Long, Long)], iters: Int, d: Long = 850L): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, g) => (s, g.size.toLong) }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var r = nodes.map(n => (n, 1000000000L)).toMap
    (1 to iters).foreach { _ =>
      val c = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
      e.foreach { case (s, t) => c(t) += r(s) / deg(s) }
      r = nodes.map(n => (n, (1000L - d) * 1000000L + (d * c(n)) / 1000L)).toMap
    }
    r
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
}
