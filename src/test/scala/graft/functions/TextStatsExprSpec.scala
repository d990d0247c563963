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
}
