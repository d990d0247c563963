package graft

import org.apache.spark.sql.SparkSession

/** Cold-vs-warm codegen cost probe (r15, verdict #5): runs the named
  * gates N times in ONE JVM and prints, per run, the wall seconds and
  * the DELTA of Spark's Janino compilation metrics
  * (CodegenMetrics: generated-class compile count + summed compile
  * ms). A run whose compile delta is ~0 is hitting the generated-class
  * cache (keyed on source text); a large steady per-run delta means
  * the plan generates FRESH source text every run — the cold-start
  * cost the trainers were suspected of re-paying per merge round.
  *
  * `sbt "Test/runMain graft.CodegenProbe [runs] [gate ...]"` with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored as in Bench.
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = args.lift(0).map(_.toInt).getOrElse(2)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_wordpiece_train_dist", "q_bpe_train", "q_bpe_train_approx")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = org.apache.spark.metrics.source.CodegenMetrics
    def counts(): (Long, Long, Long) = (
      m.METRIC_COMPILATION_TIME.getCount,
      m.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum,
      m.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount)
    // warm the non-trainer machinery once so run 1 measures the
    // trainers' own codegen, not session-global first-touch classes
    SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    for (n <- names; fn <- SparkEntry.queries.get(n)) {
      var prev = counts()
      for (r <- 1 to runs) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        val cur = counts()
        println(f"[codegen] $n%-28s run $r  wall $wall%7.2f s  " +
          f"compiles +${cur._1 - prev._1}%4d  compileMs +${cur._2 - prev._2}%6d  " +
          f"classes +${cur._3 - prev._3}%4d")
        prev = cur
      }
    }
    spark.stop()
  }
}
