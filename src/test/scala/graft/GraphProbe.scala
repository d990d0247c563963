package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Scale probe for the Graphs operators: synthetic graphs of three
  * shapes (`GRAPH_PROBE_KIND`):
  *
  *  - `powerlaw` (default): each node emits 5 edges to hash-biased
  *    targets — low ids collect quadratically more in-links, like
  *    hosts do.
  *  - `community`: planted partition (100-node communities, edges
  *    in-community) — LPA converges in a few rounds, so late rounds
  *    have neighbors voting the SAME label (the dup-factor regime the
  *    r14 raw-vote exchange bet against).
  *  - `hub`: 95% of nodes point at one of 8 hubs — the §2.5 skew
  *    regime where one reducer receives a hot node's entire
  *    uncombined vote list.
  *
  * `sbt "Test/runMain graft.GraphProbe [nNodes] [iters] [ops]"` where
  * `ops` is a comma list from pagerank,lpa,hits,lpa_ab (default
  * pagerank). `lpa_ab` runs labelPropagation under BOTH vote shapes
  * (combine vs raw — r15 adjudication) and prints wall seconds +
  * total shuffle-write bytes + a label checksum for each.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val nNodes = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val iters = args.lift(1).map(_.toInt).getOrElse(8)
    val ops = args.lift(2).getOrElse("pagerank").split(",").toSet
    val kind = sys.env.getOrElse("GRAPH_PROBE_KIND", "powerlaw")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      // GRAPH_PROBE_AQE=false A/Bs the adaptive re-planning share of
      // the per-round floor (r14 measurement)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAPH_PROBE_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // total shuffle-write bytes across completed stages — the §2.3
    // observable that adjudicates a map-side-combine trade. Listener
    // delivery is async; snapshots sleep briefly to drain.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    def drainAndRead(): Long = { Thread.sleep(1500); shuffleBytes.get() }

    val edges: DataFrame = kind match {
      case "community" =>
        // 100-node communities; each node links 5 in-community peers
        spark.range(nNodes).select(col("id").as("src"),
            explode(sequence(lit(0), lit(4))).as("k"))
          .select(col("src"),
            ((col("src") - pmod(col("src"), lit(100))) +
              pmod(hash(col("src"), col("k")), lit(100))).as("dst"))
          .filter(col("src") =!= col("dst"))
      case "hub" =>
        // 95% of nodes vote into 8 hubs, 5% spray uniformly
        spark.range(nNodes).select(col("id").as("src"),
            explode(sequence(lit(0), lit(4))).as("k"))
          .select(col("src"),
            when(pmod(hash(col("src"), col("k")), lit(100)) < 95,
                pmod(hash(col("k")), lit(8)))
              .otherwise(pmod(hash(col("src"), col("k"), lit(7)), lit(nNodes)))
              .cast("long").as("dst"))
          .filter(col("src") =!= col("dst"))
      case _ =>
        spark.range(nNodes).select(col("id").as("src"),
            explode(sequence(lit(0), lit(4))).as("k"))
          .select(col("src"),
            (pmod(hash(col("src"), col("k")), lit(nNodes)) *
              pmod(hash(col("k"), col("src")), lit(nNodes)) / lit(nNodes))
              .cast("long").as("dst"))
          .filter(col("src") =!= col("dst"))
    }
    edges.write.mode("overwrite").parquet("/tmp/graph_probe_edges")
    val saved = spark.read.parquet("/tmp/graph_probe_edges")
    println(s"[probe] kind=$kind edges=${saved.count()} nodes<=$nNodes iters=$iters")

    if (ops("pagerank")) {
      val t0 = System.nanoTime()
      val pr = functions.Graphs.pageRank(saved, "src", "dst", iterations = iters)
      val top = pr.orderBy(desc("rank_nano")).limit(5).collect()
      println(f"[probe] pageRank ($nNodes nodes, $iters iters)  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      println(s"[probe] top ranks: ${top.map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")}")
      functions.Graphs.unpin(pr)
    }
    if (ops("pr_ab")) {
      // union-zero vs rep-edge-fused per-round shape (r15, verdict #7);
      // identical checksums prove result identity
      val reps = sys.env.getOrElse("GRAPH_PROBE_AB_REPS", "3").toInt
      for (rep <- 1 to reps; fuse <- Seq(false, true)) {
        val b0 = drainAndRead()
        val t0 = System.nanoTime()
        val pr = functions.Graphs.pageRank(saved, "src", "dst", iters,
          850, 1, "auto", fuseZero = fuse)
        val sums = pr.agg(count(lit(1)), sum(col("rank_nano")),
          bit_xor(xxhash64(col("node"), col("rank_nano")))).head()
        val secs = (System.nanoTime() - t0) / 1e9
        val bytes = drainAndRead() - b0
        println(f"[probe] pr_ab rep=$rep fuseZero=$fuse%-5s " +
          f"$secs%7.2f s  shuffleMB=${bytes / 1e6}%9.1f  " +
          s"rows=${sums.getLong(0)} sumRank=${sums.getLong(1)} " +
          s"xorHash=${sums.getLong(2)}")
        functions.Graphs.unpin(pr)
      }
    }
    if (ops("lpa")) {
      val t0 = System.nanoTime()
      val lp = functions.Graphs.labelPropagation(saved, "src", "dst", iterations = iters)
      val nComm = lp.select(countDistinct(col("label"))).head.getLong(0)
      println(f"[probe] labelPropagation ($nNodes nodes, $iters iters)  ${(System.nanoTime() - t0) / 1e9}%8.2f s  communities=$nComm")
      functions.Graphs.unpin(lp)
    }
    if (ops("lpa_ab")) {
      // alternate the two shapes run-to-run so neither owns the warm
      // caches; equality of the checksums proves result identity
      val reps = sys.env.getOrElse("GRAPH_PROBE_AB_REPS", "3").toInt
      for (rep <- 1 to reps;
           shape <- sys.env.getOrElse("GRAPH_PROBE_LPA_SHAPES",
             "combine,raw").split(",").toSeq) {
        val b0 = drainAndRead()
        val t0 = System.nanoTime()
        val lp = functions.Graphs.labelPropagation(
          saved, "src", "dst", iters, 1, shape)
        val sums = lp.agg(count(lit(1)), sum(col("label")),
          bit_xor(xxhash64(col("node"), col("label")))).head()
        val secs = (System.nanoTime() - t0) / 1e9
        val bytes = drainAndRead() - b0
        println(f"[probe] lpa_ab rep=$rep shape=$shape%-7s " +
          f"$secs%7.2f s  shuffleMB=${bytes / 1e6}%9.1f  " +
          s"rows=${sums.getLong(0)} sumLabel=${sums.getLong(1)} " +
          s"xorHash=${sums.getLong(2)}")
        functions.Graphs.unpin(lp)
      }
    }
    if (ops("lpa_plan")) {
      // one ROUND-BODY plan per vote shape (the gate's result frame is
      // a pinned LogicalRDD — the per-round physical shape only exists
      // inside the loop, so rebuild one round here verbatim)
      val half = saved.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull &&
          col("src") =!= col("dst"))
      val e = half.unionByName(half.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().repartition(col("src"))
      val labels = e.select(col("src").as("node")).distinct()
        .withColumn("label", col("node"))
      for (shape <- Seq("combine", "raw")) {
        val votes = e.join(labels, e("src") === labels("node"))
          .select(col("dst").as("node"), col("label"))
        val counted = (shape match {
          case "raw" => votes.repartition(col("node"))
          case _ => votes
        }).groupBy("node", "label").agg(count(lit(1)).as("c"))
        val next = counted.groupBy("node")
          .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
          .select(col("node"), (-col("m.nl")).as("label"))
        println(s"\n========== lpa round body, voteShape=$shape ==========")
        println(next.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    if (ops("hits")) {
      val t0 = System.nanoTime()
      val ht = functions.Graphs.hits(saved, "src", "dst", iterations = iters)
      val top = ht.orderBy(desc("auth_micro")).limit(3).collect()
      println(f"[probe] hits ($nNodes nodes, $iters iters)  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      println(s"[probe] top auth: ${top.map(r => s"${r.getLong(0)}:${r.getLong(2)}").mkString(" ")}")
      functions.Graphs.unpin(ht)
    }
    spark.stop()
  }
}
