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
    * reuses it) + one `dst` aggregation; ranks pin per round through
    * [[graft.functions]]' checkpoint-or-localCheckpoint pattern (same
    * as `Dedup.connectedComponents`) so lineage stays O(1) deep, and
    * the previous round unpersists. No driver-side state beyond the
    * loop counter.
    *
    * @return `(node bigint, rank_nano bigint)` — one row per distinct
    *         endpoint of `edges`.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      dampingPerMille: Int = 850): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampingPerMille >= 0 && dampingPerMille <= 1000,
      s"dampingPerMille must be in [0, 1000], got $dampingPerMille")

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
    var (ranks, rankPins) = Pins.pin(nodes.withColumn("r", lit(1000000000L)))
    var i = 0
    while (i < iterations) {
      val contrib = eDeg
        .join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("c"))
      val (next, nextPins) = Pins.pin(nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (base + expr(s"($dampingPerMille * coalesce(c, 0L)) div 1000"))
            .cast("long").as("r")))
      Pins.release(ranks, rankPins)
      ranks = next
      rankPins = nextPins
      i += 1
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
