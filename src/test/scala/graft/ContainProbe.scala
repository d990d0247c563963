package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the r9 PPJoin containmentPairs rewrite against the
  * r8 single-pass shape, on the TextOpsProbe corpus (nDocs/50 planted
  * containment pairs). Run twice in one JVM — compare SECOND numbers
  * (first run pays JIT + heap growth).
  * `sbt "Test/runMain graft.ContainProbe [docs]"`.
  */
object ContainProbe {
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
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val wide = spark.range(nDocs).repartition(32)
      .withColumn("eff", when(col("id") % 50 === 49, col("id") - 1).otherwise(col("id")))
      .withColumn("len", when(col("id") % 50 === 49, lit(24)).otherwise(lit(49)))
      .select(col("id"), concat_ws(" ",
        transform(sequence(lit(0), col("len")),
          i => concat(lit("w"), pmod(hash(col("eff"), i), lit(50000))))).as("text"))
      .localCheckpoint(true)
    for (round <- 1 to 2) {
      timed(s"containmentPairs PPJoin r9 #$round ($nDocs docs)") {
        val r = functions.Dedup.containmentPairs(wide, "id", "text", threshold = 0.9)
        println(s"   pairs = ${r.count()} (planted ${nDocs / 50})")
        functions.Dedup.unpinContainment(r)
      }
    }

    // ---- clustered corpus: where the C(n,2) pair explode dominates --
    // nDocs/5 docs in clusters of 100: 45 cluster-shared words + 5
    // doc-unique words -> ~43 shared shingles per pair at df=100, so
    // the r8 shape emits C(100,2)=4950 pair rows per shared shingle;
    // the prefix filter cuts emissions to ~(1-t)*48+1 flagged slots.
    val nClustered = nDocs / 5
    val clustered = spark.range(nClustered).repartition(32)
      .withColumn("cl", expr("id div 100"))
      .select(col("id"), concat_ws(" ",
        concat_ws(" ", transform(sequence(lit(0), lit(44)),
          i => concat(lit("w"), pmod(hash(col("cl"), i), lit(50000))))),
        concat_ws(" ", transform(sequence(lit(0), lit(4)),
          i => concat(lit("u"), pmod(hash(col("id"), i), lit(1000000)))))).as("text"))
      .localCheckpoint(true)
    // r8 shape replicated: full C(n,2) suffix-slice pair emission +
    // pair-count shuffle, then the containment filter
    def r8Containment(threshold: Double) = {
      val ex = clustered.select(col("id"),
          functions.DedupExpressions.shingleSet(col("text"), 3).as("hs"))
        .select(col("id"), size(col("hs")).as("n_sh"), explode_outer(col("hs")).as("h"))
        .filter(col("h").isNotNull)
      val by = ex.groupBy("h")
        .agg(functions.DedupExpressions.boundedCollectList(
          struct(col("id"), col("n_sh")), 10000).as("ids"))
        .filter(size(col("ids")).between(2, 10000))
      val oriented = by
        .select(col("ids"), posexplode(col("ids")).as(Seq("pa", "da")))
        .select(col("da"),
          explode(slice(col("ids"), col("pa") + lit(2), size(col("ids")))).as("db"))
        .select(
          when(col("da.id") < col("db.id"), col("da")).otherwise(col("db")).as("a"),
          when(col("da.id") < col("db.id"), col("db")).otherwise(col("da")).as("b"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
      oriented.groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("common"), max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
        .withColumn("containment",
          col("common").cast("double") / least(col("n_a"), col("n_b")).cast("double"))
        .filter(col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    }
    for (round <- 1 to 2) {
      timed(s"clustered r8 shape #$round ($nClustered docs, df=100)") {
        println(s"   pairs = ${r8Containment(0.85).count()}")
      }
      timed(s"clustered PPJoin r9 #$round ($nClustered docs, df=100)") {
        val r = functions.Dedup.containmentPairs(clustered, "id", "text", threshold = 0.85)
        println(s"   pairs = ${r.count()}")
        functions.Dedup.unpinContainment(r)
      }
    }
    spark.stop()
  }
}
