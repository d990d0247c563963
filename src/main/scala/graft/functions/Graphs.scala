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
      unit: String = "auto"): DataFrame =
    pageRank(edges, srcCol, dstCol, iterations, dampingPerMille, pinEvery,
      unit, fuseZero = false)

  /** Probe-visible overload: `fuseZero = true` swaps the per-round
    * union-zero branch (a separate map stage scanning the node pin
    * each round) for a REP-EDGE fusion — the join goes right-outer
    * over ranks, each node's zero presence row is emitted from its
    * single representative out-edge (`rep` = the min-dst edge, marked
    * once at setup) or from the null-padded row of a dangling node,
    * via one conditional-array explode. Same rows into the aggregate
    * (every node exactly one zero row + its in-contributions), so the
    * integer sums are identical; one fewer stage per round. Measured
    * A/B lives in GraphProbe `pr_ab` (r15, verdict #7); the production
    * default is whichever shape measured faster (see
    * OPTIMIZATION_r15.md).
    */
  private[graft] def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      dampingPerMille: Int,
      pinEvery: Int,
      unit: String,
      fuseZero: Boolean): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampingPerMille >= 0 && dampingPerMille <= 1000,
      s"dampingPerMille must be in [0, 1000], got $dampingPerMille")
    require(pinEvery >= 1, "pinEvery must be >= 1")
    require(unit == "auto" || Units.exists(_._1 == unit),
      s"unit must be one of auto|${Units.map(_._1).mkString("|")}, got $unit")

    // LAZY setup pins: the nNodes count below materializes nodes AND
    // (through its lineage) the cached edge table in ONE job; eDeg
    // fuses into round 1's rank pin. Saves the 3 separate eager
    // materialization barriers the old setup paid before round 1.
    val (e, ePins) = Pins.pin(edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src")), eager = false)
    // fused shape only: min(dst) marks ONE representative edge per src
    // (edges are distinct, so the flag is unique) — the zero presence
    // row is emitted from it instead of a union branch. The default
    // shape carries no extra column (the rep byte would ride the pin
    // cache every round for nothing).
    val outdeg =
      if (fuseZero) e.groupBy("src")
        .agg(count(lit(1)).as("deg"), min(col("dst")).as("_mindst"))
      else e.groupBy("src").agg(count(lit(1)).as("deg"))
    // (src, dst, deg[, rep]) co-partitioned on src — the per-round join probe
    val eDegPlan =
      if (fuseZero) e.join(outdeg, "src")
        .select(col("src"), col("dst"), col("deg"),
          (col("dst") === col("_mindst")).as("rep"))
      else e.join(outdeg, "src")
    val (eDeg, eDegPins) = Pins.pin(eDegPlan.repartition(col("src")),
      eager = false)
    val (nodes, nodePins) = Pins.pin(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct(), eager = false)

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
      // integer sum is unchanged and no-in-edge nodes still surface.
      // `fuseZero` emits that zero row from the join itself (rep edge /
      // dangling null-pad) instead of a union branch over the node pin.
      val rows =
        if (fuseZero) {
          val zeroRow = struct(col("node").as("n"), lit(0L).as("c"))
          val contribRow = struct(col("dst").as("n"), expr("r div deg").as("c"))
          eDeg.join(ranks, eDeg("src") === ranks("node"), "right_outer")
            .select(explode(
              when(col("src").isNull, array(zeroRow))
                .when(col("rep"), array(contribRow, zeroRow))
                .otherwise(array(contribRow))).as("x"))
            .select(col("x.n").as("node"), col("x.c").as("c"))
        } else {
          eDeg.join(ranks, eDeg("src") === ranks("node"))
            .select(col("dst").as("node"), expr("r div deg").as("c"))
            .unionByName(nodes.select(col("node"), lit(0L).as("c")))
        }
      val next = rows
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

  /** [[pageRank]] over WEIGHTED edges — transition probability
    * proportional to integer edge weight (link multiplicity, crawl
    * frequency, trust score). The per-edge contribution becomes
    *
    * {{{ (rᵢ(u) · w(u,v)) div W(u) }}}
    *
    * with `W(u) = Σ w(u,·)`; truncating division keeps total mass
    * non-increasing exactly as in the unweighted walk, so the same
    * unit-ladder argument holds with one extra multiply to guard:
    * `r · w < 2^63` needs `nNodes · maxW < 9e18 / U`, so the auto
    * unit selects on `nNodes · max(dampingPerMille, maxW)` (one
    * bounded min/max aggregate, which also rejects weights < 1 loud —
    * a zero or negative weight is a caller bug, not a silent drop).
    * Parallel edges merge by SUMMING weights (the natural
    * multiplicity semantics the unweighted walk's `distinct`
    * deliberately discards); null endpoints/weights drop.
    *
    * Scale shape identical to [[pageRank]]: `(src, dst, w, W)`
    * pre-partitioned on the join key and pinned, one co-partitioned
    * join + one aggregation per round, 16-byte rank rows.
    */
  def weightedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
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

    // LAZY setup pins — same fusion as pageRank's setup
    val (e, ePins) = Pins.pin(edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"),
        col(weightCol).cast("long").as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("w").isNotNull)
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
      .repartition(col("src")), eager = false)
    val wsum = e.groupBy("src").agg(sum(col("w")).as("ws"))
    val (eW, eWPins) = Pins.pin(e.join(wsum, "src").repartition(col("src")),
      eager = false)
    val (nodes, nodePins) = Pins.pin(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct(), eager = false)

    val nNodes = nodes.count()
    require(nNodes < MaxNodes,
      s"weightedPageRank: $nNodes nodes exceed the ~9e9 cap from the " +
        "rank_nano output bound")
    val wStats = e.agg(min(col("w")).as("mn"), max(col("w")).as("mx")).head()
    require(!wStats.isNullAt(0) && wStats.getLong(0) >= 1L,
      s"weightedPageRank: weights must be >= 1 (got min ${
        if (wStats.isNullAt(0)) "none" else wStats.getLong(0).toString})")
    val maxW = wStats.getLong(1)
    val load = nNodes * math.max(math.max(dampingPerMille, 1).toLong, maxW)
    val digits = unit match {
      case "auto" =>
        val found = Units.collectFirst { case (_, dg) if load < unitBound(dg) => dg }
        require(found.isDefined,
          s"weightedPageRank: $nNodes nodes x max weight $maxW overflow even " +
            s"the micro unit (bound ${unitBound(6)} node·weight) — rescale weights")
        found.get
      case name =>
        val dg = Units.find(_._1 == name).get._2
        require(load < unitBound(dg),
          s"weightedPageRank: $nNodes nodes x max weight $maxW would overflow " +
            s"the $name unit (bound ${unitBound(dg)}) — use unit=\"auto\"")
        dg
    }
    val u = math.pow(10, digits).toLong
    val base = lit((1000L - dampingPerMille) * (u / 1000L))
    var ranks = nodes.withColumn("r", lit(u))
    var rankPins = Set.empty[Int]
    var i = 0
    while (i < iterations) {
      val contrib = eW
        .join(ranks, eW("src") === ranks("node"))
        .select(col("dst").as("node"), expr("(r * w) div ws").as("c"))
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
    Pins.release(e, ePins)
    Pins.release(eW, eWPins)
    Pins.release(nodes, nodePins)
    val toNano = math.pow(10, 9 - digits).toLong
    val out = ranks.select(col("node"),
      (col("r") * lit(toNano)).cast("long").as("rank_nano"))
    Pins.register(out, rankPins)
    out
  }

  /** Personalized PageRank — [[pageRank]] with the teleport mass
    * restricted to a SEED set (Haveliwala 2002, "Topic-sensitive
    * PageRank"). The standard trusted-seed expansion tool for crawl
    * curation: seed the walk at known-good hosts and the rank measures
    * link proximity to the trusted core, which a global PageRank
    * (where a spam farm can bootstrap its own mass) cannot.
    *
    * Same exact-integer recurrence as [[pageRank]] with the base term
    * and initial mass gated on seed membership:
    *
    * {{{
    * r₀(v)   = [v ∈ S] · U
    * rᵢ₊₁(v) = [v ∈ S]·(1000-d)·(U div 1000) + (d · Σ_{(u,v)∈E} rᵢ(u) div deg(u)) div 1000
    * }}}
    *
    * Total mass is bounded by `|S| · U` (the same non-increasing
    * argument as the global walk, summed over seeds only), so the
    * unit ladder bounds scale with the SEED count, not the node
    * count: nano holds to ~10.6M seeds at d=850 on a graph of ANY
    * size, and the `rank_nano` output cap is `|S| < 9e9`. Non-seed
    * nodes the walk never reaches stay at exactly 0 (they are
    * reported — the zero is a signal: no link path from the trusted
    * core within `iterations` hops).
    *
    * Scale shape adds one structural win over the global walk: the
    * rank side of the per-round contribution join filters `r != 0`
    * first, so early rounds join only the reached FRONTIER (seeds,
    * then their k-hop neighborhood) instead of every node —
    * integer-exact (a zero rank contributes zero) and exactly what
    * makes seeded walks cheap on web-scale graphs. Pins cadence and
    * co-partitioning mirror [[pageRank]].
    *
    * @param seeds frame whose `seedCol` holds the seed node ids;
    *              ids not present in the graph are ignored.
    * @return `(node bigint, rank_nano bigint)` — one row per distinct
    *         endpoint of `edges`.
    */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
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

    // LAZY setup pins — same fusion as pageRank's setup (the nSeeds
    // count below is the materializing action)
    val (e, ePins) = Pins.pin(edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src")), eager = false)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val (eDeg, eDegPins) = Pins.pin(e.join(outdeg, "src").repartition(col("src")),
      eager = false)
    val seedIds = seeds
      .select(col(seedCol).cast("long").as("node")).filter(col("node").isNotNull)
      .distinct()
    val (nodes, nodePins) = Pins.pin(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .join(seedIds.withColumn("_s", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("_s"), lit(false)).as("is_seed")),
      eager = false)

    // the ladder bounds scale with SEED mass, not graph size
    val nSeeds = nodes.filter(col("is_seed")).count()
    require(nSeeds >= 1, "personalizedPageRank: no seed id occurs in the graph")
    require(nSeeds < MaxNodes,
      s"personalizedPageRank: $nSeeds seeds exceed the ~9e9 cap from the " +
        "rank_nano output bound (rank * 1e9 must stay under 2^63)")
    val load = nSeeds * math.max(dampingPerMille, 1).toLong
    val digits = unit match {
      case "auto" =>
        Units.collectFirst { case (_, dg) if load < unitBound(dg) => dg }.get
      case name =>
        val dg = Units.find(_._1 == name).get._2
        require(load < unitBound(dg),
          s"personalizedPageRank: $nSeeds seeds would overflow the $name-unit " +
            s"damping multiply (bound ${unitBound(dg)} seed·damping) — use unit=\"auto\"")
        dg
    }
    val u = math.pow(10, digits).toLong
    val baseSeed = lit((1000L - dampingPerMille) * (u / 1000L))
    var ranks = nodes.select(col("node"),
      when(col("is_seed"), lit(u)).otherwise(lit(0L)).as("r"))
    var rankPins = Set.empty[Int]
    var i = 0
    while (i < iterations) {
      // frontier-limited: zero ranks contribute zero — drop them
      // BEFORE the join so round cost tracks the reached set
      val contrib = eDeg
        .join(ranks.filter(col("r") =!= 0), eDeg("src") === col("node"))
        .select(col("dst").as("node"), expr("r div deg").as("c"),
          lit(false).as("is_seed"))
      // the union-zero rows carry the REAL seed flag (contrib rows
      // false), so max(is_seed) restores per-node membership in the
      // same aggregate — no second nodes join per round
      val next = contrib
        .unionByName(nodes.select(col("node"), lit(0L).as("c"), col("is_seed")))
        .groupBy("node")
        .agg(sum(col("c")).as("c"), max(col("is_seed")).as("is_seed"))
        .select(col("node"),
          (when(col("is_seed"), baseSeed).otherwise(lit(0L)) +
            expr(s"($dampingPerMille * c) div 1000"))
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
    Pins.release(e, ePins)
    Pins.release(eDeg, eDegPins)
    Pins.release(nodes, nodePins)
    val toNano = math.pow(10, 9 - digits).toLong
    val out = ranks.select(col("node"),
      (col("r") * lit(toNano)).cast("long").as("rank_nano"))
    Pins.register(out, rankPins)
    out
  }

  /** Fixed-round k-core peeling over an undirected edge table —
    * `rounds` synchronous rounds of "drop every node with current
    * degree < k" (Seidman 1983 coreness, the standard
    * well-embeddedness signal: a host in a high k-core is held by k
    * mutually-supporting neighbors, which isolated spam rings and
    * pendant mirror farms are not). Synchronous fixed-round peeling
    * is the replayable contract (same design as [[pageRank]] /
    * [[labelPropagation]]): every round recomputes degrees over the
    * surviving subgraph and drops ALL sub-k nodes at once, so a SQL
    * oracle chains the rounds verbatim. [[kCore]] runs the same
    * peel to the true fixpoint.
    *
    * Input is canonicalized like [[labelPropagation]] (nulls/self
    * loops dropped, duplicates collapsed, symmetrized). Each round is
    * one degree aggregation + one semi-join back onto the edge table
    * (both sides partitioned on the same key); the edge frame pins
    * per round and the previous pin releases.
    *
    * @return `(node, degree)` for nodes surviving all rounds, with
    *         degree measured IN the surviving subgraph. A node whose
    *         residual degree is still < k after `rounds` rounds
    *         survives only the fixpoint-unreached prefix — run
    *         [[kCore]] for the exact core.
    */
  def kCoreRounds(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      rounds: Int): DataFrame =
    kCorePeel(edges, srcCol, dstCol, k, Some(rounds))

  /** Exact k-core: [[kCoreRounds]] run to the fixpoint. The driver
    * checks a 16-byte count per round (strictly decreasing, so the
    * loop terminates in at most |V| rounds; real graphs settle in a
    * handful) — no row data is collected.
    */
  def kCore(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int): DataFrame =
    kCorePeel(edges, srcCol, dstCol, k, None)

  private def kCorePeel(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      rounds: Option[Int]): DataFrame = {
    require(k >= 1, "k must be >= 1")
    rounds.foreach(r => require(r >= 1, "rounds must be >= 1"))
    val half = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
    // LAZY pins throughout the peel: every pinned frame's first action
    // is the full-coverage count right below it, so materialization
    // fuses into the count job — 1 job per round instead of 2
    var (e, ePins) = Pins.pin(half
      .unionByName(half.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src")), eager = false)
    var edgeCount = e.count()
    var done = false
    var round = 0
    while (!done && edgeCount > 0L) {
      val deg = e.groupBy("src").agg(count(lit(1)).as("degree"))
      val keep = deg.filter(col("degree") >= k).select(col("src").as("_keep"))
      val (next, nextPins) = Pins.pin(e
        .join(keep, e("src") === keep("_keep"), "left_semi")
        .join(keep.withColumnRenamed("_keep", "_keep2"),
          e("dst") === col("_keep2"), "left_semi")
        .repartition(col("src")), eager = false)
      val nextCount = next.count()
      round += 1
      Pins.release(e, ePins)
      e = next
      ePins = nextPins
      done = rounds.map(round >= _).getOrElse(nextCount == edgeCount)
      edgeCount = nextCount
    }
    val out = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
    Pins.register(out, ePins)
    out
  }

  /** Deterministic synchronous label propagation — community
    * detection over an undirected edge table (Raghavan, Albert &
    * Kumara 2007, "Near linear time algorithm to detect community
    * structures in large-scale networks"). The curation use is the
    * complement of [[pageRank]]: PageRank scores individual hosts,
    * LPA groups them — link-farm rings and mirror clusters surface as
    * communities whose aggregate quality stats (spam score, dup rate)
    * then gate every member at once.
    *
    * Determinism (the property the published algorithm lacks): updates
    * are SYNCHRONOUS (round i+1 reads only round i's labels — no
    * visit-order dependence) and the tie-break is total — each node
    * takes the label with the highest neighbor count, smallest label
    * winning ties:
    *
    * {{{ labelᵢ₊₁(v) = argmax_{l} ( |{u ∈ N(v) : labelᵢ(u) = l}| , -l ) }}}
    *
    * with `label₀(v) = v`. Every comparison is integer, so a SQL
    * engine replays the rounds exactly (the gate oracle does, via
    * per-round `row_number() OVER (ORDER BY c DESC, label ASC)`).
    * Synchronous LPA can 2-cycle on bipartite regions rather than
    * converge — the fixed `iterations` contract (same as
    * [[pageRank]]) makes that a defined, replayable output, and in
    * curation practice a fixed small round count is what's run anyway
    * (labels stabilize within a few hops for the dense clusters that
    * matter).
    *
    * Input edges are canonicalized: null/self-loop rows dropped,
    * duplicates collapsed, and each edge voted in BOTH directions
    * (pass a directed table and it is treated as its undirected
    * support). Scale shape mirrors [[pageRank]]: the symmetrized edge
    * table is pre-partitioned on the join key `src` and pinned, each
    * round is one co-partitioned join + a two-level aggregation —
    * `(node, label)` counts (map-side combinable) then a per-node
    * `max(struct(count, -label))` argmax, 24-byte rows in both
    * exchanges, no driver state; labels pin every `pinEvery` rounds
    * through [[Pins]] and the previous pin releases. Labels never
    * grow (they are node ids), so there is no overflow ladder to
    * manage — this runs at any node count.
    *
    * @return `(node bigint, label bigint)` — one row per distinct
    *         endpoint; `label` is the community representative's id.
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      pinEvery: Int = 1): DataFrame =
    labelPropagation(edges, srcCol, dstCol, iterations, pinEvery,
      voteShape = "combine")

  /** Probe-visible overload: `voteShape` selects the per-round vote
    * aggregation physical shape (identical results, measured A/B in
    * GraphProbe — r15 adjudication of the r14 single-exchange rewrite):
    *
    *  - `"combine"`: `groupBy(node,label)` count → `groupBy(node)`
    *    argmax — 2 aggregate exchanges, BOTH map-side combinable. The
    *    production choice: the r14 driver bench showed the raw shape
    *    slower (+32%/+43% in both samples), and on converged or
    *    hub-skewed graphs raw votes concentrate an uncombined
    *    edge-scale row stream on single reducers (guide §2.5) while
    *    this shape ships at most one row per (node, distinct label)
    *    after the map-side partial.
    *  - `"raw"`: the r14 shape — `repartition(node)` once, then both
    *    aggregation levels satisfy the distribution in place: 1
    *    exchange carrying RAW votes (no map-side combine).
    *  - `"mode"`: one `groupBy(node).agg(mode(label, true))` — one
    *    exchange AND map-side reduction (the typed-imperative mode
    *    keeps a per-group label-count map; deterministic ties = lowest
    *    label, identical to the argmax order), but the aggregate runs
    *    outside whole-stage codegen; measured in GraphProbe before
    *    choosing the production default.
    */
  private[graft] def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      pinEvery: Int,
      voteShape: String): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(pinEvery >= 1, "pinEvery must be >= 1")
    require(Set("combine", "raw", "mode")(voteShape),
      s"voteShape must be combine|raw|mode, got $voteShape")
    val half = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
    // LAZY pin: round 1's rank pin is the first action over the
    // symmetrized edges and covers every partition — the edge cache
    // fills inside that job instead of a separate setup barrier
    val (e, ePins) = Pins.pin(half
      .unionByName(half.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src")), eager = false)
    // every endpoint appears as src after symmetrization, so the node
    // set needs no second union — and every node has >= 1 neighbor,
    // so the per-round vote join never drops a node
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    var labelPins = Set.empty[Int]
    var i = 0
    while (i < iterations) {
      val votes = e.join(labels, e("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
      // vote count then argmax by (count desc, label asc) — the argmax
      // is ONE map-side-combinable aggregate: lexicographic max of
      // (c, -label), no window, no per-node sort. The "raw" variant
      // trades the count level's exchange away by repartitioning raw
      // votes once; the "mode" variant gets one exchange AND map-side
      // reduction from the typed-imperative mode aggregate
      // (deterministic=true ties to the LOWEST label — exactly this
      // argmax's (count desc, label asc) order) at the price of
      // leaving whole-stage codegen (ObjectHashAggregate with a
      // per-group counting map). See the voteShape scaladoc for why
      // "combine" is the production shape.
      val next = voteShape match {
        case "mode" =>
          votes.groupBy("node")
            .agg(expr("mode(label, true)").as("label"))
        case shape =>
          val counted = (shape match {
            case "raw" => votes.repartition(col("node"))
            case _ => votes
          }).groupBy("node", "label").agg(count(lit(1)).as("c"))
          counted.groupBy("node")
            .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
            .select(col("node"), (-col("m.nl")).as("label"))
      }
      i += 1
      if (i % pinEvery == 0 || i == iterations) {
        val (pinned, nextPins) = Pins.pin(next)
        Pins.release(labels, labelPins)
        labels = pinned
        labelPins = nextPins
      } else {
        labels = next
      }
    }
    Pins.release(e, ePins)
    Pins.register(labels, labelPins)
    labels
  }

  /** Fixed-iteration HITS (Kleinberg 1999, "Authoritative sources in
    * a hyperlinked environment") in integer fixed-point — hubs and
    * authorities over a DIRECTED edge table. The curation signal
    * PageRank misses: a page can be an authority (linked by good
    * hubs) without itself linking anywhere, and directory/spam hubs
    * score high as hubs while staying low-authority — the two axes
    * separate link roles that a single random-walk score conflates.
    *
    * Arithmetic: scores live in micro units (1e6 = the per-round
    * maximum). Each iteration is the classic mutual recursion with a
    * truncating max-rescale after each half-step:
    *
    * {{{
    * rawA(v) = Σ_{(u,v)∈E} h(u);   a(v) = rawA(v) div max(1, ceil(max(rawA) / 1e6))
    * rawH(u) = Σ_{(u,v)∈E} a(v);   h(u) = rawH(u) div max(1, ceil(max(rawH) / 1e6))
    * }}}
    *
    * with `h₀ = 1e6` everywhere. The rescale divisor is derived with
    * integer ceiling division `(m + 1e6 - 1) div 1e6`, so every score
    * stays in `[0, 1e6]`, every raw sum is bounded by
    * `nNodes · 1e6 < 2^63` (loud `require` at 9e12 nodes — far past
    * any real host graph), and the whole chain is exact integer
    * arithmetic a SQL oracle replays verbatim. Max-rescaling (vs the
    * textbook L2 norm) keeps it integer-exact; the INDUCED RANKING is
    * what curation consumes and it is unaffected by the norm choice
    * up to the 1e-6 truncation granularity.
    *
    * Scale shape: the edge table is pinned twice, pre-partitioned on
    * `src` (the authority-step probe) and on `dst` (the hub-step
    * probe), so both half-step joins are co-partitioned every round;
    * score frames carry 16-byte rows. The per-half-step max is a
    * scalar aggregate over the just-pinned raw frame (a bounded
    * 1-row collect, same economics as the pin barrier itself).
    *
    * @return `(node, hub_micro, auth_micro)` — one row per distinct
    *         endpoint; sources that nothing links to have
    *         `auth_micro = 0`, sinks that link nowhere `hub_micro = 0`.
    */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val U = 1000000L
    val cleaned = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    // LAZY setup pins: the nNodes count materializes nodes + eBySrc in
    // one job; eByDst fuses into the first hub half-step's pin job
    val (eBySrc, eSrcPins) = Pins.pin(cleaned.repartition(col("src")), eager = false)
    val (eByDst, eDstPins) = Pins.pin(cleaned.repartition(col("dst")), eager = false)
    val (nodes, nodePins) = Pins.pin(eBySrc.select(col("src").as("node"))
      .unionByName(eBySrc.select(col("dst").as("node")))
      .distinct(), eager = false)
    val nNodes = nodes.count()
    require(nNodes > 0, "hits: no edges (empty or all-null edge input)")
    require(nNodes < 9000000000000L,
      s"hits: $nNodes nodes exceed the 9e12 cap (raw sums must stay under 2^63)")

    // truncating max-rescale of a (node, raw) frame into [0, U]: pin
    // raw (both the max aggregate and the rescale projection read the
    // cache — unpinned, the whole half-step subtree would run twice),
    // collect the 1-row max, divide by its ceiling ratio to U
    def rescale(raw: DataFrame, outCol: String): (DataFrame, Set[Int]) = {
      // LAZY pin: the 1-row max aggregate below is the first action and
      // covers every partition, so the half-step materializes INSIDE
      // that job instead of paying a separate eager one — 2 jobs per
      // iteration instead of 4 (measured ~25% off the walk's floor)
      val (pinnedRaw, rawPins) = Pins.pin(raw, eager = false)
      val m = pinnedRaw.agg(max(col("raw"))).head.getLong(0)
      val d = math.max((m + U - 1) / U, 1L)
      // `div` (truncating integer division), NOT `/` — the double
      // division loses exactness once raw exceeds 2^53
      (pinnedRaw.select(col("node"), expr(s"raw div ${d}L").as(outCol)), rawPins)
    }

    var hubs = nodes.withColumn("h", lit(U))
    var auths: DataFrame = null
    var hubPins = Set.empty[Int]
    var authPins = Set.empty[Int]
    var i = 0
    while (i < iterations) {
      // authority half-step: in-edge sum of hub scores; the union-zero
      // trick (pageRank) keeps no-in-edge nodes present without a
      // second join
      val rawA = eBySrc.join(hubs, eBySrc("src") === hubs("node"))
        .select(col("dst").as("node"), col("h").as("c"))
        .unionByName(nodes.select(col("node"), lit(0L).as("c")))
        .groupBy("node").agg(sum(col("c")).as("raw"))
      val (a, aPins) = rescale(rawA, "a")
      if (auths != null) Pins.release(auths, authPins)
      auths = a
      authPins = aPins
      // hub half-step: out-edge sum of the JUST-rescaled authorities
      val rawH = eByDst.join(auths, eByDst("dst") === auths("node"))
        .select(eByDst("src").as("node"), col("a").as("c"))
        .unionByName(nodes.select(col("node"), lit(0L).as("c")))
        .groupBy("node").agg(sum(col("c")).as("raw"))
      val (h, hPins) = rescale(rawH, "h")
      Pins.release(hubs, hubPins)
      hubs = h
      hubPins = hPins
      i += 1
    }
    Pins.release(eBySrc, eSrcPins)
    Pins.release(eByDst, eDstPins)
    Pins.release(nodes, nodePins)
    val out = hubs.join(auths, "node")
      .select(col("node"), col("h").as("hub_micro"), col("a").as("auth_micro"))
    Pins.register(out, hubPins ++ authPins)
    out
  }

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
    // NOTE (r14): canon/deg/oriented are each consumed by 2-3
    // downstream branches, so the PLAN re-expands the upstream subtree
    // per reference (174 Exchange nodes at the co-purchase gate).
    // Pinning the three stages was tried and REVERTED: runtime
    // exchange reuse already dedupes the clones (measured flat), while
    // the pinned variant held ~3 cached edge-scale RDDs per call that
    // no gate-shaped caller ever unpins — the heap pressure taxed every
    // downstream query in the same session. Leave the lazy subtree.
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
