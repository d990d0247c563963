package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation.
  *
  * Web-scale training corpora routinely weight documents by the link
  * importance of their host (Common-Crawl-derived rankings), so
  * centrality over an edge table is a first-class curation input
  * alongside the content-quality scores in [[TextFunctions]] /
  * [[Curation]] (the reference's metrique analysis layer has no graph
  * analytics; this extends the large-scale-pipeline surface like the
  * dedup/ANN operators do).
  */
object Graphs {

  /** Fixed-iteration PageRank in integer nano-units — bit-identical
    * across engines, so the gate oracle replays it exactly.
    *
    * Formulation: the classic non-normalized damped walk,
    * `r₀ = 1e9` (1.0 nano-scaled) for every node and
    *
    * {{{ rᵢ₊₁(v) = (1000 - d)·1e6  +  (d · Σ_{(u,v)∈E} rᵢ(u) div deg(u)) div 1000 }}}
    *
    * with `d = dampingPerMille` (default 850 = 0.85). Every term is a
    * non-negative BIGINT and both divisions are truncating integer
    * division — Spark's `div` and DuckDB's `//` agree on non-negative
    * operands (truncation == floor there), which is what makes the
    * chained-CTE oracle exact. Dangling nodes (no out-edges) simply
    * leak their mass, the standard simple-variant behavior; nodes with
    * no in-edges settle at `(1000-d)·1e6`.
    *
    * Overflow bound: `Σ r` stays ≤ `nNodes · 1e9` and the damping
    * multiply stays below 2^63 while `nNodes · d < 1e10` — millions of
    * nodes at default damping, `require`d loud rather than silently
    * wrapped (ANSI mode would throw mid-job instead).
    *
    * Scale shape: the edge table (+ out-degree) is computed once,
    * pre-partitioned ON THE JOIN KEY `src` and pinned, so each of the
    * `iterations` rounds is one co-partitioned join (ranks shuffle 16
    * bytes/row onto the same hash partitioning every round — AQE
    * reuses it) + one `dst` aggregation; ranks pin every `pinEvery`
    * rounds through the shared [[Pins]] tracker (eager checkpoint —
    * reliable when a checkpoint dir is set) so lineage stays bounded
    * while the walk is not serialized on a materialization barrier
    * per round, and the previously pinned round releases. No
    * driver-side state beyond the loop counter.
    *
    * @return `(node bigint, rank_nano bigint)` — one row per distinct
    *         endpoint of `edges`.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      dampingPerMille: Int = 850,
      pinEvery: Int = 1): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampingPerMille >= 0 && dampingPerMille <= 1000,
      s"dampingPerMille must be in [0, 1000], got $dampingPerMille")
    require(pinEvery >= 1, "pinEvery must be >= 1")

    val (e, ePins) = Pins.pin(edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src")))
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // (src, dst, deg) co-partitioned on src — the per-round join probe
    val (eDeg, eDegPins) = Pins.pin(e.join(outdeg, "src").repartition(col("src")))
    val (nodes, nodePins) = Pins.pin(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct())

    val nNodes = nodes.count()
    require(nNodes * math.max(dampingPerMille, 1).toLong < 10000000000L,
      s"pageRank: $nNodes nodes would overflow the nano-unit damping multiply — " +
        "use a coarser unit (micro) variant for graphs beyond ~10M nodes")

    val base = lit((1000L - dampingPerMille) * 1000000L)
    // rounds chain lazily between pins; every `pinEvery`-th (plus the
    // final) round pins eagerly. Default 1 — A/B'd at the gate graph
    // (8 rounds, sf0.1, 5-10 run sets): per-round pins floor at
    // 4.4-5.3 s; pinEvery=3 and pinEvery=8 both sit ~7 s (the deeper
    // multi-join AQE plans lose more than the saved barriers gain).
    // The residual cost is scheduler/bookkeeping per round — an
    // iterative distributed walk's floor, not data volume (the same
    // 8 rounds dominate at any graph size that actually needs Spark).
    var ranks = nodes.withColumn("r", lit(1000000000L))
    var rankPins = Set.empty[Int]
    var i = 0
    while (i < iterations) {
      // one join + ONE aggregation per round: instead of aggregating
      // contributions and left-joining the node set back (a second
      // join), every node contributes a zero row to the same agg — the
      // integer sum is unchanged and no-in-edge nodes still surface
      val contrib = eDeg
        .join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst").as("node"), expr("r div deg").as("c"))
      val next = contrib
        .unionByName(nodes.select(col("node"), lit(0L).as("c")))
        .groupBy("node")
        .agg(sum(col("c")).as("c"))
        .select(col("node"),
          (base + expr(s"($dampingPerMille * c) div 1000"))
            .cast("long").as("r"))
      i += 1
      if (i % pinEvery == 0 || i == iterations) {
        val (pinned, nextPins) = Pins.pin(next)
        Pins.release(ranks, rankPins)
        ranks = pinned
        rankPins = nextPins
      } else {
        ranks = next
      }
    }
    // every pin is EAGER, so the final ranks no longer read the graph
    // pins — release them here rather than leaking session-lifetime
    // cache (the dsirWeights-pin lesson): only the result's pins
    // survive, registered so `Graphs.unpin(result)` frees them too
    Pins.release(e, ePins)
    Pins.release(eDeg, eDegPins)
    Pins.release(nodes, nodePins)
    val out = ranks.select(col("node"), col("r").as("rank_nano"))
    Pins.register(out, rankPins)
    out
  }

  /** Release the cached blocks behind a [[pageRank]] result; no-op
    * for any other frame (and when a reliable checkpoint dir made the
    * pins file-backed — see [[Pins]]).
    */
  def unpin(df: DataFrame): Unit = Pins.unpin(df)
}
