package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage decomposition for removeDuplicatedSpans. */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[span] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.functions.DedupExpressions
    val wide = spark.range(nDocs).repartition(32)
      .withColumn("eff", when(col("id") % 50 === 49, col("id") - 1).otherwise(col("id")))
      .withColumn("len", when(col("id") % 50 === 49, lit(24)).otherwise(lit(49)))
      .select(col("id"), concat_ws(" ",
        transform(sequence(lit(0), col("len")),
          i => concat(lit("w"), pmod(hash(col("eff"), i), lit(50000))))).as("text"))
      .localCheckpoint(true)
    val n = 8
    val positioned = wide.select(
      col("id").as("_rs_id"),
      posexplode(DedupExpressions.shinglePosHashes(col("text"), n))
        .as(Seq("_rs_pos", "_rs_h")))
    timed("positioned scan (count)") { positioned.count() }
    val dup = wide
      .select(col("id").as("_rs_id"),
        explode(DedupExpressions.shingleSet(col("text"), n)).as("_rs_h"))
      .groupBy("_rs_h").agg(count(lit(1)).as("_rs_df"))
      .filter(col("_rs_df") >= 2).select("_rs_h")
    timed("dup gram df (count)") { dup.count() }
    val dupC = dup.localCheckpoint(true)
    val dropTok = positioned
      .join(dupC, Seq("_rs_h"), "left_semi")
      .select(col("_rs_id"),
        explode(sequence(col("_rs_pos"), col("_rs_pos") + lit(n - 1))).as("_rs_tp"))
      .groupBy(col("_rs_id"))
      .agg(array_distinct(sort_array(collect_list(col("_rs_tp").cast("int"))))
        .as("_rs_drop"))
    timed("dropTok semi-join+agg (count, dup pinned)") { dropTok.count() }
    val dropC = dropTok.localCheckpoint(true)
    timed("rebuild join+kernel (dropTok pinned)") {
      val norm = graft.functions.TextFunctions.normalizeText(col("text"))
      wide.select(col("id"), col("text"))
        .join(dropC.withColumnRenamed("_rs_id", "id"), Seq("id"), "left")
        .withColumn("_rs_r", DedupExpressions.dropLines(
          translate(norm, " ", "\n"),
          coalesce(col("_rs_drop"), array().cast("array<int>"))))
        .select(col("id"), col("_rs_r.n_removed")).agg(sum("n_removed")).head()
    }
    timed("normalizeText scan only") {
      wide.select(sum(length(
        graft.functions.TextFunctions.normalizeText(col("text"))))).head()
    }
    timed("translate+dropLines, no regex, empty drops") {
      wide.select(sum(DedupExpressions.dropLines(
        translate(col("text"), " ", "\n"),
        array().cast("array<int>")).getField("n_removed"))).head()
    }
    timed("regex+translate+dropLines, empty drops") {
      wide.select(sum(DedupExpressions.dropLines(
        translate(graft.functions.TextFunctions.normalizeText(col("text")), " ", "\n"),
        array().cast("array<int>")).getField("n_removed"))).head()
    }
    timed("join only (dropTok pinned, no kernel)") {
      wide.select(col("id"), col("text"))
        .join(dropC.withColumnRenamed("_rs_id", "id"), Seq("id"), "left")
        .select(sum(length(col("text")))).head()
    }
    timed("full operator (sum n_removed_tokens)") {
      graft.functions.Dedup.removeDuplicatedSpans(wide, "id", "text")
        .agg(sum("n_removed_tokens")).head()
    }
    spark.stop()
  }
}
