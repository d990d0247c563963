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

  /** Unit ladder for [[pageRank]]'s fixed-point arithmetic: the rank
    * unit is `10^digits` per 1.0 of walk mass. Two overflow bounds
    * govern, both derived from `Σ r ≤ nNodes · 10^digits` (total mass
    * never grows — see the pageRank scaladoc):
    *
    *  - the damping multiply `d · Σr < 2^63` holds while
    *    `nNodes · d < 9e18 / 10^digits` (9e18 keeps a ~2% margin under
    *    Long.MaxValue ≈ 9.223e18 — the old `1e10` nano guard admitted
    *    an ~8% window where near-total mass concentration could wrap
    *    the multiply in non-ANSI mode);
    *  - the nano-rescaled OUTPUT `r · 10^(9-digits) ≤ nNodes · 1e9`
    *    must stay under 2^63 — a unit-INDEPENDENT `nNodes < 9e9` cap,
    *    which is why the ladder stops at micro: micro's damping bound
    *    (9e12 node·damping ≥ 9e9 nodes at d ≤ 1000) already covers
    *    every graph that can emit `rank_nano` safely, and a coarser
    *    unit could never lift the output cap.
    */
  private val Units: Seq[(String, Int)] =
    Seq(("nano", 9), ("micro", 6))

  /** Largest safe `nNodes * dampingPerMille` for the damping multiply
    * at a unit of `10^digits`.
    */
  private def unitBound(digits: Int): Long =
    9000000000000000000L / math.pow(10, digits).toLong

  /** Unit-independent node cap from the nano-rescaled output bound. */
  private val MaxNodes: Long = 9000000000L

  /** Fixed-iteration PageRank in integer fixed-point units —
    * bit-identical across engines, so the gate oracle replays it
    * exactly.
    *
    * Formulation: the classic non-normalized damped walk in a unit of
    * `U = 10^digits` per 1.0 — `r₀ = U` for every node and
    *
    * {{{ rᵢ₊₁(v) = (1000 - d)·(U div 1000)  +  (d · Σ_{(u,v)∈E} rᵢ(u) div deg(u)) div 1000 }}}
    *
    * with `d = dampingPerMille` (default 850 = 0.85). Every term is a
    * non-negative BIGINT and both divisions are truncating integer
    * division — Spark's `div` and DuckDB's `//` agree on non-negative
    * operands (truncation == floor there), which is what makes the
    * chained-CTE oracle exact. Dangling nodes (no out-edges) simply
    * leak their mass, the standard simple-variant behavior; nodes with
    * no in-edges settle at `(1000-d)·(U div 1000)`.
    *
    * '''Unit selection''' (`unit` param): `"auto"` picks the finest
    * unit whose damping multiply provably cannot overflow —
    * `Σ r ≤ nNodes·U` (total mass is non-increasing: the damped sum
    * redistributes ≤ Σr and the base term re-injects exactly what
    * damping removed, minus truncation), so `d·Σr < 2^63` holds while
    * `nNodes·d < 9e18/U`. That is ~10.6M nodes at nano (d=850) and
    * ~9B at micro (where the unit-independent `rank_nano` output
    * bound, not damping, caps the ladder — see [[Units]]); web-scale
    * host graphs (~1e8-1e9 nodes) land in micro. The result column is
    * ALWAYS `rank_nano` (the unit result rescaled by `10^(9-digits)`,
    * exact in integers), so downstream code is unit-agnostic and only
    * the least-significant digits of precision vary. A forced
    * `"nano"|"micro"` is validated against the same bounds and fails
    * loud.
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
      pinEvery: Int = 1,
      unit: String = "auto"): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampingPerMille >= 0 && dampingPerMille <= 1000,
      s"dampingPerMille must be in [0, 1000], got $dampingPerMille")
    require(pinEvery >= 1, "pinEvery must be >= 1")
    require(unit == "auto" || Units.exists(_._1 == unit),
      s"unit must be one of auto|${Units.map(_._1).mkString("|")}, got $unit")

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
    require(nNodes < MaxNodes,
      s"pageRank: $nNodes nodes exceed the ~9e9 cap from the rank_nano " +
        "output bound (rank * 1e9 must stay under 2^63)")
    val load = nNodes * math.max(dampingPerMille, 1).toLong
    val digits = unit match {
      case "auto" =>
        // the micro damping bound (9e12 node·damping) is implied by the
        // MaxNodes cap at d <= 1000, so auto always finds a unit here
        Units.collectFirst { case (_, dg) if load < unitBound(dg) => dg }.get
      case name =>
        val dg = Units.find(_._1 == name).get._2
        require(load < unitBound(dg),
          s"pageRank: $nNodes nodes would overflow the $name-unit damping " +
            s"multiply (bound ${unitBound(dg)} node·damping) — use unit=\"auto\"")
        dg
    }
    val u = math.pow(10, digits).toLong
    val base = lit((1000L - dampingPerMille) * (u / 1000L))
    // rounds chain lazily between pins; every `pinEvery`-th (plus the
    // final) round pins eagerly. Default 1 — A/B'd at the gate graph
    // (8 rounds, sf0.1, 5-10 run sets): per-round pins floor at
    // 4.4-5.3 s; pinEvery=3 and pinEvery=8 both sit ~7 s (the deeper
    // multi-join AQE plans lose more than the saved barriers gain).
    // The residual cost is scheduler/bookkeeping per round — an
    // iterative distributed walk's floor, not data volume (the same
    // 8 rounds dominate at any graph size that actually needs Spark).
    var ranks = nodes.withColumn("r", lit(u))
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
    // rescale the selected unit back to nano (exact: integer multiply
    // by 10^(9-digits)) so the output schema is unit-agnostic
    val toNano = math.pow(10, 9 - digits).toLong
    val out = ranks.select(col("node"),
      (col("r") * lit(toNano)).cast("long").as("rank_nano"))
    Pins.register(out, rankPins)
    out
  }

  /** Release the cached blocks behind a [[pageRank]] result; no-op
    * for any other frame (and when a reliable checkpoint dir made the
    * pins file-backed — see [[Pins]]).
    */
  def unpin(df: DataFrame): Unit = Pins.unpin(df)

  /** Per-node triangle counts + local clustering coefficient over an
    * undirected edge table — the second host-graph quality signal
    * next to [[pageRank]] (a spam farm's link neighborhood is either
    * abnormally clique-ish or abnormally triangle-free for its
    * degree).
    *
    * Algorithm: degree orientation (Suri & Vassilvitskii, WWW'11
    * "Counting Triangles and the Curse of the Last Reducer" — the
    * public MapReduce formulation). Edges canonicalize + distinct,
    * then orient from the lower- to the higher-ranked endpoint under
    * the total order `(degree, id)`. Every triangle has exactly one
    * vertex with out-degree-2 in the orientation (its lowest-ranked),
    * so wedges enumerate as the oriented self-join on `src` with
    * `rank(v) < rank(w)`, and one more equi-join against the oriented
    * edge set closes them — each triangle found EXACTLY once, no
    * post-hoc division. The orientation is why this scales: a
    * hub of degree D contributes C(outdeg, 2) wedges where
    * `outdeg = O(sqrt(|E|))` regardless of D, so the curse-of-the-
    * last-reducer hot key cannot form. All joins are equi-joins on
    * node ids; all comparisons are integer-lexicographic
    * (struct compare == DuckDB row compare), so the DuckDB oracle
    * reproduces the triangle SET, not just the totals.
    *
    * Returns `(node, degree, n_triangles, clustering)` for every node
    * with degree >= 1; `clustering` = 2T/(d(d-1)) rounded to 6
    * (0.0 for degree-1 nodes).
    */
  def triangleCounts(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
    val deg = canon.select(col("a").as("node"))
      .unionByName(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // orient: (deg, id)-lower endpoint -> higher; carry both ranks
    val withRanks = canon
      .join(deg.select(col("node").as("a"), col("degree").as("_da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("_db")), "b")
    val lower = struct(col("_da"), col("a")) < struct(col("_db"), col("b"))
    val oriented = withRanks.select(
      when(lower, col("a")).otherwise(col("b")).as("src"),
      when(lower, col("b")).otherwise(col("a")).as("dst"),
      when(lower, struct(col("_db").as("d"), col("b").as("n")))
        .otherwise(struct(col("_da").as("d"), col("a").as("n"))).as("_r"))
    val o1 = oriented.select(col("src"), col("dst").as("v"), col("_r").as("_rv"))
    val o2 = oriented.select(col("src"), col("dst").as("w"), col("_r").as("_rw"))
    val wedges = o1.join(o2, Seq("src")).filter(col("_rv") < col("_rw"))
      .select(col("src").as("u"), col("v"), col("w"))
    val tris = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    val perNode = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("clustering",
        when(col("degree") < 2, lit(0.0)).otherwise(
          round(lit(2.0) * col("n_triangles").cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double"), 6)))
  }
}
