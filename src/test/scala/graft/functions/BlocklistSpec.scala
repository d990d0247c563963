package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Aho-Corasick blocklist kernel vs a naive position-scan count —
  * overlapping, nested, shared-prefix, and cross-token matches.
  */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def naiveCount(t: String, p: String): Long =
    (0 to t.length - p.length).count(i => t.startsWith(p, i)).toLong

  private def naiveRow(t: String, pats: Seq[String]): (Long, Int, Long) = {
    val counts = pats.map(naiveCount(t, _))
    (counts.sum, counts.count(_ > 0),
      counts.zipWithIndex.map { case (c, i) => c * (i + 1) }.sum)
  }

  test("classic he/she/his/hers panel: nested + fail-chain outputs") {
    val pats = Seq("he", "she", "his", "hers")
    val texts = Seq(
      (1L, "ushers"),        // she, he, hers all fire inside one word
      (2L, "shishhe"),       // his via fail transition; trailing he
      (3L, "hehehe"),        // repeated overlap-free
      (4L, "xyz"),           // nothing
      (5L, ""))              // empty text
    val got = Blocklist.hits(texts.toDF("doc_id", "text"), "doc_id", "text", pats)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getInt(2), r.getLong(3))))
    for ((id, row) <- got)
      assert(row == naiveRow(texts.find(_._1 == id).get._2, pats), s"doc $id")
    assert(got.find(_._1 == 1L).get._2 == ((3L, 3, naiveRow("ushers", pats)._3)))
  }

  test("overlapping self-similar matches count every end position") {
    val pats = Seq("aa", "aaa")
    val got = Blocklist.hits(Seq((1L, "aaaaa")).toDF("doc_id", "text"),
        "doc_id", "text", pats)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).head
    // "aaaaa": aa at 4 positions, aaa at 3
    assert(got == ((7L, 2, 4L * 1 + 3L * 2)))
    assert(got == naiveRow("aaaaa", pats))
  }

  test("seeded random corpus equals the naive scan for a 20-pattern list") {
    val rnd = new scala.util.Random(17)
    val alpha = "abc "
    val pats = (1 to 20).map(_ =>
      (1 to (1 + rnd.nextInt(4))).map(_ => alpha(rnd.nextInt(3))).mkString).distinct
    val docs = (1L to 60L).map(i =>
      (i, (1 to 80).map(_ => alpha(rnd.nextInt(4))).mkString))
    val got = Blocklist.hits(docs.toDF("doc_id", "text"), "doc_id", "text", pats)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
    val want = docs.map(d => naiveRow(d._2, pats))
    assert(got == want)
  }

  test("case folding lowers both sides; foldCase=false is exact-case") {
    val df = Seq((1L, "Scan SCAN scan")).toDF("doc_id", "text")
    val folded = Blocklist.hits(df, "doc_id", "text", Seq("scan")).collect().head
    assert(folded.getLong(1) == 3L)
    val exact = Blocklist.hits(df, "doc_id", "text", Seq("scan"), foldCase = false)
      .collect().head
    assert(exact.getLong(1) == 1L)
  }

  test("filterClean drops any-hit docs; duplicate/empty patterns fail loud") {
    val df = Seq((1L, "a clean doc"), (2L, "has spam here")).toDF("doc_id", "text")
    val clean = Blocklist.filterClean(df, "text", Seq("spam")).collect()
    assert(clean.map(_.getLong(0)).toSeq == Seq(1L))
    intercept[IllegalArgumentException](
      Blocklist.hits(df, "doc_id", "text", Seq("a", "a")))
    val e = intercept[Exception](
      Blocklist.hits(df, "doc_id", "text", Seq("a", "")).collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("non-empty")))
  }

  test("case-fold collisions: hits names the collision, filterClean dedupes") {
    val df = Seq((1L, "a clean doc"), (2L, "has Spam here")).toDF("doc_id", "text")
    // hits' checksum is index-weighted — collapsing silently would
    // remap indices, so it fails loud naming the folded pattern
    val e = intercept[IllegalArgumentException](
      Blocklist.hits(df, "doc_id", "text", Seq("Spam", "SPAM")))
    assert(e.getMessage.contains("case folding") && e.getMessage.contains("spam"))
    // any-hit filtering has no index semantics — dedupe and proceed
    val clean = Blocklist.filterClean(df, "text", Seq("Spam", "SPAM")).collect()
    assert(clean.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("kernel stays inside whole-stage codegen (and computes there)") {
    // a range-derived frame: a pure local relation constant-folds the
    // kernel at plan time and proves nothing about codegen
    val df = spark.range(10).select(col("id").as("doc_id"),
      concat(lit("scan the table row "), col("id")).as("text"))
    val out = Blocklist.hits(df, "doc_id", "text", Seq("scan", "table"))
    assert(out.agg(sum("n_hits")).head.getLong(0) == 20L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no whole-stage span:\n$plan")
  }
}
