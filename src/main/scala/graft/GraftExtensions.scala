package graft

import graft.functions.{ChunkDocsExpr, CosineSimExpr, LshBandExpr, Md5Lower64Expr, MinHashSigExpr, NormalizeTextExpr, NormalizeUnicodeExpr, QualityStatsExpr, ShinglePosHashesExpr, ShingleSetExpr, SigMatchRatioExpr, SimHash64Expr, TextStatsExpr, TokenDictExpr, TokenTfExpr}
import graft.mql.{MqlPredicate, MqlSql, ResolveMqlPredicate, RewriteMqlPredicate}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Spark-native registration of the engine's custom expressions so
  * they're usable from `spark.sql(...)` as well as the Column API:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)  // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT minhash_sig(text, 64, 3), simhash64(text) FROM docs")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Register into an already-running session (the builder-time
    * `withExtensions` path isn't available post-start).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "minhash_sig",
      (args: Seq[Expression]) => args match {
        case Seq(text) => MinHashSigExpr(text, 64, 3)
        case Seq(text, k) => MinHashSigExpr(text, intArg(k, "k"), 3)
        case Seq(text, k, n) => MinHashSigExpr(text, intArg(k, "k"), intArg(n, "shingleN"))
        case _ => throw new IllegalArgumentException("minhash_sig(text[, k[, shingle_n]])")
      },
      "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64",
      (args: Seq[Expression]) => SimHash64Expr(args.head),
      "built-in")
    reg.createOrReplaceTempFunction(
      "normalize_text",
      (args: Seq[Expression]) => args match {
        case Seq(text) => NormalizeTextExpr(text)
        case _ => throw new IllegalArgumentException("normalize_text(text)")
      },
      "built-in")
    reg.createOrReplaceTempFunction(
      "normalize_unicode",
      (args: Seq[Expression]) => args match {
        case Seq(text) => NormalizeUnicodeExpr(text, "NFC")
        case Seq(text, f) => NormalizeUnicodeExpr(text, stringArg(f, "form"))
        case _ => throw new IllegalArgumentException(
          "normalize_unicode(text[, 'NFC'|'NFD'|'NFKC'|'NFKD'])")
      },
      "built-in")
    reg.createOrReplaceTempFunction(
      "text_stats",
      (args: Seq[Expression]) => new TextStatsExpr(args.head),
      "built-in")
    reg.createOrReplaceTempFunction(
      "cosine_sim",
      (args: Seq[Expression]) => CosineSimExpr(args(0), args(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "md5_lower64",
      (args: Seq[Expression]) => Md5Lower64Expr(args.head),
      "built-in")
    reg.createOrReplaceTempFunction(
      "sig_match_ratio",
      (args: Seq[Expression]) => SigMatchRatioExpr(args(0), args(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "lsh_band",
      (args: Seq[Expression]) => args match {
        case Seq(vec) => LshBandExpr(vec, 0, 16)
        case Seq(vec, off, bits) =>
          LshBandExpr(vec, intArg(off, "planeOffset"), intArg(bits, "nBits"))
        case _ => throw new IllegalArgumentException("lsh_band(vec[, plane_offset, n_bits])")
      },
      "built-in")
    reg.createOrReplaceTempFunction(
      "quality_stats",
      (args: Seq[Expression]) => args match {
        case Seq(text) => new QualityStatsExpr(text)
        case _ => throw new IllegalArgumentException("quality_stats(text)")
      },
      "built-in")
    reg.createOrReplaceTempFunction(
      "shingle_set",
      (args: Seq[Expression]) => args match {
        case Seq(text) => ShingleSetExpr(text, 3)
        case Seq(text, n) => ShingleSetExpr(text, intArg(n, "shingleN"))
        case _ => throw new IllegalArgumentException("shingle_set(text[, n])")
      },
      "built-in")
    reg.createOrReplaceTempFunction(
      "shingle_pos_hashes",
      (args: Seq[Expression]) => args match {
        case Seq(text, n) => ShinglePosHashesExpr(text, intArg(n, "shingleN"))
        case _ => throw new IllegalArgumentException("shingle_pos_hashes(text, n)")
      },
      "built-in")
    reg.createOrReplaceTempFunction(
      "chunk_docs",
      (args: Seq[Expression]) => args match {
        case Seq(text, m, o) =>
          ChunkDocsExpr(text, intArg(m, "maxTokens"), intArg(o, "overlap"))
        case _ => throw new IllegalArgumentException("chunk_docs(text, max_tokens, overlap)")
      },
      "built-in")
    reg.createOrReplaceTempFunction(
      "token_tf",
      (args: Seq[Expression]) => args match {
        case Seq(text) => new TokenTfExpr(text)
        case _ => throw new IllegalArgumentException("token_tf(text)")
      },
      "built-in")
    reg.createOrReplaceTempFunction(
      "token_dict",
      (args: Seq[Expression]) => args match {
        case Seq(text) => new TokenDictExpr(text)
        case _ => throw new IllegalArgumentException("token_dict(text)")
      },
      "built-in")
    reg.createOrReplaceTempFunction("mql", MqlSql.builder _, "built-in")
    // no analyzer-rule injection post-start: rewrite in the (mutable)
    // user-provided optimizer batch instead — see MqlSql scaladoc
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[RewriteMqlPredicate]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new RewriteMqlPredicate(spark)
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[graft.plans.StripRedundantKernelFilters]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          new graft.plans.StripRedundantKernelFilters
  }

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def stringArg(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => MinHashSigExpr(text, 64, 3)
        case Seq(text, k) => MinHashSigExpr(text, intArg(k, "k"), 3)
        case Seq(text, k, n) => MinHashSigExpr(text, intArg(k, "k"), intArg(n, "shingleN"))
        case _ => throw new IllegalArgumentException(
          "minhash_sig(text[, k[, shingle_n]])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => SimHash64Expr(text)
        case _ => throw new IllegalArgumentException("simhash64(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeTextExpr].getName, "normalize_text"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => NormalizeTextExpr(text)
        case _ => throw new IllegalArgumentException("normalize_text(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("normalize_unicode"),
      new ExpressionInfo(classOf[NormalizeUnicodeExpr].getName, "normalize_unicode"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => NormalizeUnicodeExpr(text, "NFC")
        case Seq(text, f) => NormalizeUnicodeExpr(text, stringArg(f, "form"))
        case _ => throw new IllegalArgumentException(
          "normalize_unicode(text[, 'NFC'|'NFD'|'NFKC'|'NFKD'])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("text_stats"),
      new ExpressionInfo(classOf[TextStatsExpr].getName, "text_stats"),
      (args: Seq[Expression]) => new TextStatsExpr(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSimExpr(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("md5_lower64"),
      new ExpressionInfo(classOf[Md5Lower64Expr].getName, "md5_lower64"),
      (args: Seq[Expression]) => Md5Lower64Expr(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("sig_match_ratio"),
      new ExpressionInfo(classOf[SigMatchRatioExpr].getName, "sig_match_ratio"),
      (args: Seq[Expression]) => SigMatchRatioExpr(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("lsh_band"),
      new ExpressionInfo(classOf[LshBandExpr].getName, "lsh_band"),
      (args: Seq[Expression]) => args match {
        case Seq(vec) => LshBandExpr(vec, 0, 16)
        case Seq(vec, off, bits) =>
          LshBandExpr(vec, intArg(off, "planeOffset"), intArg(bits, "nBits"))
        case _ => throw new IllegalArgumentException(
          "lsh_band(vec[, plane_offset, n_bits])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("quality_stats"),
      new ExpressionInfo(classOf[QualityStatsExpr].getName, "quality_stats"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => new QualityStatsExpr(text)
        case _ => throw new IllegalArgumentException("quality_stats(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSetExpr].getName, "shingle_set"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => ShingleSetExpr(text, 3)
        case Seq(text, n) => ShingleSetExpr(text, intArg(n, "shingleN"))
        case _ => throw new IllegalArgumentException("shingle_set(text[, n])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_pos_hashes"),
      new ExpressionInfo(classOf[ShinglePosHashesExpr].getName, "shingle_pos_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(text, n) => ShinglePosHashesExpr(text, intArg(n, "shingleN"))
        case _ => throw new IllegalArgumentException("shingle_pos_hashes(text, n)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("chunk_docs"),
      new ExpressionInfo(classOf[ChunkDocsExpr].getName, "chunk_docs"),
      (args: Seq[Expression]) => args match {
        case Seq(text, m, o) =>
          ChunkDocsExpr(text, intArg(m, "maxTokens"), intArg(o, "overlap"))
        case _ => throw new IllegalArgumentException("chunk_docs(text, max_tokens, overlap)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("token_tf"),
      new ExpressionInfo(classOf[TokenTfExpr].getName, "token_tf"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => new TokenTfExpr(text)
        case _ => throw new IllegalArgumentException("token_tf(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("token_dict"),
      new ExpressionInfo(classOf[TokenDictExpr].getName, "token_dict"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => new TokenDictExpr(text)
        case _ => throw new IllegalArgumentException("token_dict(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("mql"),
      new ExpressionInfo(classOf[MqlPredicate].getName, "mql"),
      MqlSql.builder _))
    ext.injectResolutionRule(_ => new ResolveMqlPredicate)
    // pre-CBO slot = once, AFTER the operator-optimization fixpoint
    // (where InferFiltersFromGenerate lives) — the strip rule cannot
    // oscillate with the rule whose output it removes
    ext.injectPreCBORule(_ => new graft.plans.StripRedundantKernelFilters)
  }
}
