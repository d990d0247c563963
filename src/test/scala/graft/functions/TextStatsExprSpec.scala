package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TextStatsExpr must be BIT-FOR-BIT equal to the Column formulations —
  * over hand-picked edge cases AND the full real documents table (the
  * oracle queries depend on this equality).
  */
class TextStatsExprSpec extends SparkSpec {
  import spark.implicits._

  private def columnsVersion(df: org.apache.spark.sql.DataFrame) =
    df.select(
      col("id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      TextFunctions.bpeTokenCount(col("text")).as("n_bpe"),
      round(TextFunctions.meanWordLength(col("text")), 9).as("mean_word_len"),
      round(TextFunctions.punctRatio(col("text")), 9).as("punct_ratio"),
      round(TextFunctions.stopwordRatio(col("text")), 9).as("stopword_ratio"),
      TextFunctions.qualityScore(col("text")).as("quality"))

  private def exprVersion(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"), TextStatsExpr(col("text")).as("s"))
      .select(
        col("id"),
        col("s.n_tokens").as("n_tokens"),
        col("s.n_bpe").as("n_bpe"),
        round(col("s.mean_word_len"), 9).as("mean_word_len"),
        round(col("s.punct_ratio"), 9).as("punct_ratio"),
        round(col("s.stopword_ratio"), 9).as("stopword_ratio"),
        col("s.quality").as("quality"))

  private def assertEqualOn(df: org.apache.spark.sql.DataFrame): Unit = {
    val a = columnsVersion(df).orderBy("id").collect()
    val b = exprVersion(df).orderBy("id").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.toSeq == y.toSeq, s"mismatch for id ${x.get(0)}: $x vs $y")
    }
  }

  test("edge cases match the Column formulations exactly") {
    val edge = Seq(
      (0L, "the quick brown fox! Is it, or is it not?"),
      (1L, ""),
      (2L, "   "),
      (3L, "\tleading tab"),
      (4L, "trailing space   "),
      (5L, "punct,,,only!!!???"),
      (6L, "ONE"),
      (7L, "a\nb\tc  d"),
      (8L, "numbers 123 and UPPER Case MiXeD"),
      (9L, "the the the the"),
      (10L, "...---'''\"\"\"[[[]]]((()))"))
      .toDF("id", "text")
    assertEqualOn(edge)
  }

  test("full documents table matches (sf0.001, 500 docs)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    assertEqualOn(docs)
  }

  // --- TokenTfExpr / TokenDictExpr: tfidf's scan-side kernels -------

  private val tfEdge = Seq(
    (0L, "the quick brown the fox the"),
    (1L, ""),
    (2L, "   "),
    (3L, "ONE one OnE"),
    (4L, "a b c a b a"),
    (5L, "punct,,,only!!!???"),
    (6L, "numbers 123 and 123 numbers"))

  test("TokenTfExpr matches the explode/groupBy tf formulation") {
    val docs = tfEdge.toDF("id", "text")
    val kernel = docs
      .select(col("id"), explode(TokenTfExpr(col("text"))).as("_p"))
      .select(col("id"), col("_p.h").as("h"), col("_p.tf").as("tf"))
      .orderBy("id", "h").collect().map(_.toSeq)
    val composed = docs
      .select(col("id"),
        explode(DedupExpressions.shinglePosHashes(col("text"), 1)).as("h"))
      .groupBy("id", "h").agg(count(lit(1)).as("tf"))
      .orderBy("id", "h").collect().map(_.toSeq)
    assert(kernel.toSeq == composed.toSeq)
  }

  test("TokenDictExpr matches the explode/min token dictionary") {
    val docs = (tfEdge ++ Seq((7L, "Zebra apple zebra APPLE"))).toDF("id", "text")
    val kernel = docs
      .select(explode(TokenDictExpr(col("text"))).as("_d"))
      .select(col("_d.h").as("h"), col("_d.term").as("term"))
      .groupBy("h").agg(min("term").as("term"))
      .orderBy("h").collect().map(_.toSeq)
    val toks = filter(split(TextFunctions.normalizeText(col("text")), " "),
      t => length(t) > 0)
    val composed = docs.select(explode(toks).as("term"))
      .select(DedupExpressions.md5Lower64(col("term")).as("h"), col("term"))
      .groupBy("h").agg(min("term").as("term"))
      .orderBy("h").collect().map(_.toSeq)
    assert(kernel.toSeq == composed.toSeq)
  }

  test("tf/dict kernels match the composed formulations on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val kTf = docs.select(col("id"), explode(TokenTfExpr(col("text"))).as("_p"))
      .select(col("id"), col("_p.h").as("h"), col("_p.tf").as("tf"))
      .orderBy("id", "h").collect().map(_.toSeq)
    val cTf = docs
      .select(col("id"),
        explode(DedupExpressions.shinglePosHashes(col("text"), 1)).as("h"))
      .groupBy("id", "h").agg(count(lit(1)).as("tf"))
      .orderBy("id", "h").collect().map(_.toSeq)
    assert(kTf.toSeq == cTf.toSeq)
    val kDict = docs.select(explode(TokenDictExpr(col("text"))).as("_d"))
      .select(col("_d.h").as("h"), col("_d.term").as("term"))
      .groupBy("h").agg(min("term").as("term"))
      .orderBy("h").collect().map(_.toSeq)
    val toks = filter(split(TextFunctions.normalizeText(col("text")), " "),
      t => length(t) > 0)
    val cDict = docs.select(explode(toks).as("term"))
      .select(DedupExpressions.md5Lower64(col("term")).as("h"), col("term"))
      .groupBy("h").agg(min("term").as("term"))
      .orderBy("h").collect().map(_.toSeq)
    assert(kDict.toSeq == cDict.toSeq)
  }

  private def naiveEntropy(t: String): (Long, Int, Long) = {
    val cps = t.codePoints().toArray
    val n = cps.length.toLong
    if (n == 0L) return (0L, 0, 0L)
    val counts = cps.groupBy(identity).view.mapValues(_.length.toLong)
    val sum = counts.values.map(k => k * math.round(math.log(n.toDouble / k) * 1e9)).sum
    (n, counts.size, sum / n)
  }

  test("charEntropy: constant text is 0, two-symbol text is ln 2, naive replay exact") {
    import spark.implicits._
    val texts = Seq(
      (1L, "aaaaaa"),            // one symbol -> exactly 0
      (2L, "ab"),                // uniform two symbols -> ~ln 2 nano
      (3L, "aabbccdd"),          // uniform four -> ~ln 4
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "éééé"),         // multi-byte code points, one symbol
      (6L, ""))                  // empty -> (0, 0, 0)
    val got = TextFunctions.charEntropy(texts.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got == texts.map(t => naiveEntropy(t._2)))
    assert(got(0)._3 == 0L)
    assert(math.abs(got(1)._3 - math.round(math.log(2) * 1e9)) <= 1L)
    assert(got(4) == ((4L, 1, 0L)), "é counted as ONE code point symbol")
    assert(got(5) == ((0L, 0, 0L)))
    // repetitive junk scores far below natural text
    assert(got(0)._3 < got(3)._3)
  }

  test("charEntropy kernel runs inside whole-stage codegen over a real scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextFunctions.charEntropy(docs, "doc_id", "text")
    out.collect()
    assert(out.queryExecution.executedPlan.toString.contains("*(1)"))
  }
}
