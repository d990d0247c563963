package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality inspection: prints the formatted physical plan of key
  * queries and flags the properties that matter at 100 TB — parquet
  * filter pushdown, column pruning (ReadSchema), broadcast vs shuffle
  * joins, and whole-stage codegen coverage.
  * `sbt "runMain graft.Plans [queryName ...]"`.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_find_fields", "q_find_mql", "q1_pricing_summary",
        "q3_top_orders", "q5_nation_revenue", "q_date_asof",
        "q_upsert_scd2", "q_minhash_pairs", "q_embed_topk", "q_token_counts",
        "q_zorder_scan", "q_token_pack", "q_keep_best",
        "q_rolling_window", "q_boilerplate", "q_knn_join", "q_skew_report",
        "q_line_dedup", "q_remove_spans", "q_vocab",
        // r10: skew join (salt in the join keys), bloom screen
        // (broadcast-only), the two lattice decodes (scan kernels)
        "q_salted_join", "q_bloom_screen", "q_lattice_encode",
        "q_unigram_encode",
        // r11: media header parsing (one scan-side projection),
        // winnow matches (capped-bucket pair shape), leakage split
        // (components + hash buckets), token budget (two-phase),
        // PQ ADC (scan-side code lookups + TakeOrdered)
        "q_media_meta", "q_winnow_pairs", "q_leakage_split",
        "q_token_budget", "q_ann_pq",
        // r12: the persisted ANN serving paths (partition pruning +
        // broadcast ADC tables) and the exact re-rank composition
        "q_ann_pq_persisted", "q_ann_ivfpq_persisted",
        "q_ann_ivfpq_refined", "q_ann_ivfpq_knn",
        // r13: serving over a compacted layout (pruning must survive
        // the rewrite), the delete-synced refine, the recall
        // observability pair (BNLJ + bottom-k ground truth), the
        // refit migration's serving shape, and the contamination
        // range screen (broadcast eval, no shuffle)
        "q_ann_ivfpq_compacted", "q_ann_ivfpq_repaired",
        "q_ann_exact_knn", "q_ann_recall", "q_ann_ivfpq_refit",
        "q_semantic_contamination")
    for (n <- names; fn <- SparkEntry.queries.get(n)) {
      println(s"\n========== $n ==========")
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(plan)
      def flag(label: String, ok: Boolean): Unit =
        println(f"  [${if (ok) "ok" else "!!"}] $label")
      println(s"---------- summary $n ----------")
      flag("parquet scan present", plan.contains("Scan parquet"))
      flag("filters pushed", !plan.contains("PushedFilters: []") || !plan.contains("Filter"))
      flag("no cartesian product", !plan.contains("CartesianProduct") || n.contains("embed"))
      flag("broadcast join used (if joining)",
        !plan.contains("SortMergeJoin") || n == "q_upsert_scd2" || n.contains("minhash"))
    }
    spark.stop()
  }
}
