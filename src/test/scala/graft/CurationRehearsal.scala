package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Curation, Dedup, TextFunctions}

/** 100 TB dress rehearsal (VERDICT r5 item 5): the full curation
  * recipe — clean (boilerplate + html-strip + pii-scrub) →
  * qualityFilter → exact dedup → minhash near-dedup → contamination →
  * mixture → packSequences — composed over a 1M-doc synthetic corpus
  * with PLANTED exact dups (5%), near-dups (one-token edits, ~7.7%),
  * junk docs (2%), and a 200-doc eval set, so every stage does real
  * work.
  *
  * Per-stage wall time and shuffle read/write bytes come from a task
  * listener; stage boundaries are eager `localCheckpoint`s so each
  * stage's numbers are its MARGINAL cost (no upstream recompute
  * pollutes the deltas). Byte totals feed the NOTES table whose 100 TB
  * extrapolation is then arithmetic: a stage whose shuffle bytes are
  * super-linear in docs is a scale bug.
  *
  * `sbt "Test/runMain graft.CurationRehearsal [docs]"`.
  */
object CurationRehearsal {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    def mb(b: Long): String = f"${b / 1e6}%9.1f MB"
    var results = Vector.empty[(String, Double, Long, Long, Long)]
    def stage(label: String)(f: => DataFrame): DataFrame = {
      val r0 = shufRead.get(); val w0 = shufWrite.get()
      val t0 = System.nanoTime()
      val out = f.localCheckpoint(true) // eager: the stage job runs here
      val rows = out.count()            // cheap on the checkpointed plan
      val dt = (System.nanoTime() - t0) / 1e9
      val dr = shufRead.get() - r0; val dw = shufWrite.get() - w0
      results :+= ((label, dt, dr, dw, rows))
      println(f"[stage] $label%-28s $dt%7.2f s  read ${mb(dr)}  write ${mb(dw)}  rows $rows%9d")
      out
    }

    // --- corpus: 50k-word vocab, 50 tokens/doc; plant dups + junk ----
    val base = spark.range(nDocs).repartition(32)
      // 5% exact dups: id ≡ 19 (mod 20) clones the previous doc
      .withColumn("eff", when(col("id") % 20 === 19, col("id") - 1).otherwise(col("id")))
      .select(col("id"), concat_ws(" ",
        transform(sequence(lit(0), lit(49)),
          i => concat(lit("w"), pmod(hash(col("eff"), i), lit(50000))))).as("gen"))
      // ~7.7% near-dups: id ≡ 12 (mod 13) = previous doc with token 25
      // EDITED (an in-range edit — an appended 51st token would fall
      // off the 5×10-token lining below and collapse these into exact
      // dups, which is what the first rehearsal run measured)
      .withColumn("gen", when(col("id") % 13 === 12,
        concat_ws(" ", transform(sequence(lit(0), lit(49)),
          i => when(i === 25, lit("edited"))
            .otherwise(concat(lit("w"), pmod(hash(col("id") - 1, i), lit(50000))))))
        ).otherwise(col("gen")))
      // 2% junk: id ≡ 0 (mod 50) is a 2-token stub the filter rejects
      .withColumn("text", when(col("id") % 50 === 0, lit("x y")).otherwise(col("gen")))
      .select("id", "text")

    // line-ify into 10-token lines so boilerplate removal has lines to
    // key, and plant a SHARED FOOTER on every 10th doc — the actual
    // boilerplate the clean stage must strip. minDocs=3 below, so the
    // 2-doc planted dup/near-dup pairs survive line dedup (a clone
    // pair shares every line; at minDocs=2 cleaning would empty both
    // docs and the dedup stages would have nothing left to measure).
    val ws = split(col("text"), " ")
    val lined = base.select(col("id"),
      concat(
        array_join(transform(sequence(lit(0L), lit(4L)),
          i => array_join(slice(ws, (i * 10 + 1).cast("int"), lit(10)), " ")),
          "\n"),
        when(col("id") % 10 === 0,
          lit("\nsubscribe to our newsletter for daily updates now"))
          .otherwise(lit(""))).as("text"))

    // generation is its own stage: removeBoilerplateLines scans its
    // input twice (occurrence pass + rebuild join), and an un-pinned
    // synthetic lineage would bill the second generation pass to the
    // clean stage — real pipelines re-read a parquet scan instead
    val corpus = stage("corpus gen") { lined }

    val cleaned = stage("clean (boiler+strip+scrub)") {
      Curation.removeBoilerplateLines(corpus, "id", "text", minDocs = 3)
        .select(col("id"),
          TextFunctions.scrubPii(TextFunctions.stripHtml(col("clean_text"))).as("text"))
    }

    val kept = stage("qualityFilter") {
      TextFunctions.qualityFilter(cleaned, "id", "text",
          minTokens = 10, maxTokens = 100, minStopRatio = 0.0,
          minMeanWordLen = 1.0, maxMeanWordLen = 20.0, maxTopTokenFrac = 0.9,
          keepCols = Seq("text"))
        .filter(col("keep"))
        .select("id", "text", "n_tokens")
    }

    val exactDeduped = stage("exact dedup") {
      Dedup.exact(kept, "id", Seq("text"))
    }

    // near-dedup reported as its three sub-steps so the bytes table
    // attributes cost to the pair generation vs the component closure
    // vs the keep-set anti-join
    val pairs = stage("  minhash pairs") {
      Dedup.minhashPairs(exactDeduped, "id", "text", threshold = 0.5)
    }
    val canon = stage("  connected components") {
      Dedup.connectedComponents(pairs)
        .filter(col("id") =!= col("component"))
        .select(col("id"))
    }
    val nearDeduped = stage("  near-dedup anti-join") {
      exactDeduped.join(canon, Seq("id"), "left_anti")
    }

    val decontaminated = stage("contamination") {
      // % 5000 == 7: never a junk stub (7 ≢ 0 mod 50), so eval texts
      // are real 50-token docs that genuinely overlap the corpus
      val eval = base.filter(col("id") % 5000 === 7)
        .select(col("id").as("eval_id"), col("text").as("eval_text"))
      val hits = Curation.contamination(
          nearDeduped, "id", "text", eval, "eval_id", "eval_text",
          n = 5, minOverlap = 1)
        .select(col("corpus_id").as("id")).distinct()
      nearDeduped.join(hits, Seq("id"), "left_anti")
    }

    val mixed = stage("mixture") {
      val dom0 = decontaminated.filter(pmod(xxhash64(col("id")), lit(2)) === 0)
      val dom1 = decontaminated.filter(pmod(xxhash64(col("id")), lit(2)) === 1)
      Curation.mixture(
        Seq(("dom0", dom0, 1.0), ("dom1", dom1, 0.5)), col("id"))
    }

    val packed = stage("packSequences") {
      Curation.packSequences(
        mixed.select(col("id"), col("n_tokens"), col("mix_source"), col("mix_epoch")),
        col("n_tokens"), budget = 2048L,
        orderBy = Seq(col("mix_source"), col("mix_epoch"), col("id")))
    }

    val nPacks = packed.agg(count_distinct(col("pack_id"))).head().getLong(0)
    println(f"[stage] ${"TOTAL"}%-28s ${results.map(_._2).sum}%7.2f s  " +
      f"read ${mb(results.map(_._3).sum)}  write ${mb(results.map(_._4).sum)}  packs $nPacks%d")

    // solo stages, EXCLUDED from the chained TOTAL above: the global
    // line dedup and exact-substring removal operators measured over
    // the same lined corpus (shared footers + clone pairs give both
    // real work), so the bytes table covers them without changing the
    // recipe the round-over-round comparison pins
    stage("dedupLines (solo)") {
      Curation.dedupLines(corpus, "id", "text")
    }
    stage("removeDuplicatedSpans (solo)") {
      Dedup.removeDuplicatedSpans(corpus, "id", "text", n = 8, minDocs = 2)
    }
    spark.stop()
  }
}
