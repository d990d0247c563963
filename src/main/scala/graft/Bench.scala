package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall seconds.
  */
object Bench {
  /** Headline set: the scan/join/agg/window/temporal/dedup workloads a
    * 100 TB deployment actually runs hot — excludes the deliberately
    * quadratic small-subset correctness demos.
    */
  val Headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "q_window_topn", "q_sessionize", "q_salted_agg", "q_distinct_count",
    "q_find_mql", "q_date_asof", "q_last_version", "q_upsert_scd2",
    "q_activity_import", "q_stream_window",
    "q_token_counts", "q_quality_score", "q_dedup_exact",
    "q_minhash_pairs", "q_simhash", "q_embed_topk",
    "q_asof_join", "q_quantiles", "q_hll_distinct", "q_token_pack",
    // round-5/6 scan-side kernel operators: a kernel regression (a
    // shuffle or interpreted HOF creeping back) must move the driver's
    // round-over-round totals, not hide outside the headline set
    "q_quality_filter", "q_containment", "q_chunk_docs",
    "q_corpus_rarity", "q_dup_spans", "q_tfidf_terms", "q_surprisal",
    // round-6 selection/retrieval/clustering operators
    "q_bm25", "q_dsir_select", "q_kmeans", "q_hybrid_search",
    // round-6 (cont.): global line dedup + exact-substring removal
    "q_line_dedup", "q_remove_spans",
    // round-6 (cont.): domain curation + hashed quality classifier
    "q_domain_cap", "q_classifier_score", "q_mixture_temp",
    // round-6 (cont.): block-permutation simhash near-dup join
    "q_simhash_pairs",
    // round-6 (cont.): bigram stupid-backoff LM + n-gram diversity
    "q_bigram_lm", "q_ngram_diversity")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // per-query MEDIAN of `runs` back-to-back executions (default 3):
    // single-run numbers burned round 6 on host-contention noise —
    // a 1.5-4x swing documented in NOTES — so medians are the
    // permanent protocol. SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the
    // set for targeted adjudication runs.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries
    // warm the JVM/parquet footer cache once so per-query numbers
    // measure execution, not first-touch classloading
    queries("q1_pricing_summary")(spark, sfDir).count()
    val set = only match {
      case Some(o) => Headline.filter(o.contains)
      case None => Headline
    }
    val results = set.flatMap { name =>
      queries.get(name).map { fn =>
        val times = (0 until runs).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
          (System.nanoTime() - t0) / 1e9
        }.sorted
        name -> times(times.length / 2)
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$runs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
