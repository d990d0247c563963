package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused probe for the tfidfTopTerms hash-dictionary rewrite: the
  * same 1M-doc synthetic corpus ScaleProbe uses, without paying for
  * the rest of the suite. `sbt "Test/runMain graft.TfidfProbe [docs]"`.
  */
object TfidfProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val words = Array("spark", "query", "row", "data", "join", "filter",
      "window", "stream", "table", "scan", "merge", "sort", "key", "hash",
      "plan", "code", "node", "task", "stage", "shuffle")
    val wordsCol = array(words.toIndexedSeq.map(lit): _*)
    val docs = spark.range(nDocs).repartition(32).select(
      col("id"),
      concat_ws(" ", transform(sequence(lit(0), lit(49)),
        i => element_at(wordsCol, pmod(hash(col("id"), i), lit(20)) + 1))).as("text"))
    val t0 = System.nanoTime()
    val n = functions.TextFunctions.tfidfTopTerms(docs, "id", "text", k = 3).count()
    println(f"[probe] tfidfTopTerms ($nDocs docs) ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n rows)")
    spark.stop()
  }
}
