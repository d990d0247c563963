package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for Graphs.pageRank: synthetic power-law-ish directed
  * graph (each node emits 5 edges to hash-biased targets — low ids
  * collect quadratically more in-links, like hosts do).
  * `sbt "Test/runMain graft.GraphProbe [nNodes] [iters]"`.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val nNodes = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val iters = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val edges = spark.range(nNodes).select(col("id").as("src"),
        explode(sequence(lit(0), lit(4))).as("k"))
      .select(col("src"),
        (pmod(hash(col("src"), col("k")), lit(nNodes)) *
          pmod(hash(col("k"), col("src")), lit(nNodes)) / lit(nNodes))
          .cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    edges.write.mode("overwrite").parquet("/tmp/graph_probe_edges")
    val saved = spark.read.parquet("/tmp/graph_probe_edges")
    println(s"[probe] edges=${saved.count()} nodes<=$nNodes iters=$iters")

    val t0 = System.nanoTime()
    val pr = functions.Graphs.pageRank(saved, "src", "dst", iterations = iters)
    val top = pr.orderBy(desc("rank_nano")).limit(5).collect()
    println(f"[probe] pageRank ($nNodes nodes, $iters iters)  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    println(s"[probe] top ranks: ${top.map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")}")
    spark.stop()
  }
}
