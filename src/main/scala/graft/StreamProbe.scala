package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main for the streaming gates: runs the named gates
  * (default: the stream-stream join family) with Bench's session
  * shape and prints each gate's wall seconds plus the raw
  * QueryProgress JSON per micro-batch, so the wall cost decomposes
  * into query startup vs per-batch phases (addBatch, state commit,
  * walCommit, ...). Measurement tooling only — no gate semantics.
  *
  * `sbt "runMain graft.StreamProbe [gate ...]"`, with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_STREAM_PARTITIONS
  * honored exactly as in Bench.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_stream_window", "q_stream_join", "q_stream_asof",
        "q_stream_asof_dim")
    // one warm run so classloading/codegen does not masquerade as
    // streaming startup in the numbers
    SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    for (n <- names; fn <- SparkEntry.queries.get(n); round <- 1 to 2) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"\n===== $n round $round wall $wall%.3f s =====")
      SparkEntry.lastStreamProgress.foreach(println)
    }
    spark.stop()
  }
}
