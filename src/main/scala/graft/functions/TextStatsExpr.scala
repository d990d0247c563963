package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All text-quality statistics in ONE imperative pass per document.
  *
  * Bit-for-bit equal to the Column formulations in [[TextFunctions]]
  * (asserted against them over the real documents table in
  * TextStatsExprSpec) but ~40× cheaper: the composed version walks the
  * token arrays through 8+ interpreted higher-order-function passes per
  * row; at a 100 TB corpus scan that is the difference between hours
  * and days.
  *
  * NOT a CodegenFallback: `CollapseCodegenStages` refuses whole-stage
  * codegen for any plan containing one, so a fallback here would cut
  * the `*(N)` span of every text-pipeline stage it sits in. `doGenCode`
  * emits a static call to [[TextStatsExpr.compute]] — the generated
  * code stays in the span and the per-row work is one JIT-compiled
  * method call, no interpreted `eval` detour.
  *
  * Output struct: n_tokens int, n_bpe long, mean_word_len double,
  * punct_ratio double, stopword_ratio double, quality double.
  */
case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"text_stats requires a STRING column, got $t")
  }

  override def dataType: DataType = TextStatsExpr.schema

  override def nullSafeEval(input: Any): Any =
    TextStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStatsExpr$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(c: Expression): TextStatsExpr = copy(child = c)
  override def prettyName: String = "text_stats"
}

object TextStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_bpe", LongType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))

  def apply(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new TextStatsExpr(expression(text)))
  }

  /** The one-pass kernel; called from generated code (static forwarder)
    * and from the interpreted `eval` path alike.
    */
  def compute(input: UTF8String): InternalRow = {
    val text = input.toString
    val len = text.length

    // --- raw whitespace tokens: split(trim(text), "\s+") ------------
    // Spark `trim` strips 0x20 ONLY; Java-regex \s is the ASCII class;
    // `split` keeps a leading "" element (counted by size() in
    // tokenCount, filtered by length>0 in bpe/meanWordLength).
    @inline def isAsciiWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    var lo = 0
    var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    val emptyTrimmed = lo >= hi
    var nRuns = 0
    var sumWordLen = 0L
    var nBpeWords = 0L
    var i = lo
    var runLen = 0
    while (i <= hi) {
      val isWs = i == hi || isAsciiWs(text.charAt(i))
      if (isWs) {
        if (runLen > 0) {
          nRuns += 1
          sumWordLen += runLen
          nBpeWords += (runLen + 3) / 4 // ceil(len/4)
          runLen = 0
        }
      } else runLen += 1
      i += 1
    }
    // NON-EMPTY whitespace runs — the Column twin filters out the
    // empty tokens Java's split(-1) keeps for leading/trailing
    // non-space whitespace, so both sides count the same thing
    val nTokens = if (emptyTrimmed) 0 else nRuns

    // --- punctuation counts over the RAW text ------------------------
    var punctBpe = 0L // [.,;:!?] — bpeTokenCount's class
    var punctRatioChars = 0 // [.,;:!?'"()\[\]-] — punctRatio's class
    i = 0
    while (i < len) {
      val c = text.charAt(i)
      if (c == '.' || c == ',' || c == ';' || c == ':' || c == '!' || c == '?') {
        punctBpe += 1; punctRatioChars += 1
      } else if (c == '\'' || c == '"' || c == '(' || c == ')' || c == '[' ||
        c == ']' || c == '-') punctRatioChars += 1
      i += 1
    }

    // --- normalized tokens (normalizeText then split(" ")) -----------
    val norm = TextFunctionsRuntime.normalize(text)
    var nNorm = 0
    var nStops = 0
    i = 0
    var start = 0
    while (i <= norm.length) {
      if (i == norm.length || norm.charAt(i) == ' ') {
        if (i > start) {
          nNorm += 1
          if (TextFunctionsRuntime.Stopwords.contains(norm.substring(start, i))) nStops += 1
        }
        start = i + 1
      }
      i += 1
    }

    val meanWordLen = if (nRuns == 0) 0.0 else sumWordLen.toDouble / nRuns.toDouble
    val punctRatio = if (len == 0) 0.0 else punctRatioChars.toDouble / len.toDouble
    val stopRatio = if (nNorm == 0) 0.0 else nStops.toDouble / nNorm.toDouble
    val lenScore = math.min(len.toDouble / 500.0, 1.0)
    val stopScore = math.min(stopRatio * 4.0, 1.0)
    val punctPenalty = math.max(0.0, 1.0 - punctRatio * 5.0)
    val quality = BigDecimal(lenScore * 0.4 + stopScore * 0.3 + punctPenalty * 0.3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    InternalRow(
      nTokens,
      nBpeWords + punctBpe,
      meanWordLen,
      punctRatio,
      stopRatio,
      quality)
  }
}

/** The four integer aggregates [[TextFunctions.qualityFilter]] needs,
  * in ONE imperative pass per document — including the top-token count,
  * which the Column formulation could only get via an explode +
  * `(doc, token)` groupBy + doc groupBy (two shuffles over the whole
  * corpus). Every statistic here is per-DOCUMENT, so a per-row local
  * hash map replaces the corpus-wide shuffle: at 100 TB the filter
  * becomes a pure scan-side projection that composes with pushdown
  * instead of a three-stage job. Measured 51.6s → one-pass (~2s class)
  * at 1M docs; ScaleProbe records the exact number.
  *
  * Bit-equal to the explode/groupBy formulation (asserted in
  * CorpusCleanSpec): integer sums only; the ratio divisions stay in
  * the Column layer unchanged.
  *
  * Output struct: n_tokens long (total normalized tokens), top_count
  * long (max per-token frequency), stop_count long (total stopword
  * occurrences), char_sum long (sum of token lengths).
  */
case class QualityStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"quality_stats requires a STRING column, got $t")
  }

  override def dataType: DataType = QualityStatsExpr.schema

  override def nullSafeEval(input: Any): Any =
    QualityStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.QualityStatsExpr$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(c: Expression): QualityStatsExpr = copy(child = c)
  override def prettyName: String = "quality_stats"
}

object QualityStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("stop_count", LongType, nullable = false),
    StructField("char_sum", LongType, nullable = false)))

  def apply(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new QualityStatsExpr(expression(text)))
  }

  def compute(input: UTF8String): InternalRow = {
    val norm = TextFunctionsRuntime.normalize(input.toString)
    var n = 0L
    var stop = 0L
    var chars = 0L
    var top = 0L
    // per-document token frequencies; normalized docs are small
    // relative to a partition, so this map is bounded by the row, not
    // the corpus — the shuffle the Column twin needed is gone
    val counts = new java.util.HashMap[String, Long]()
    var i = 0
    var start = 0
    while (i <= norm.length) {
      if (i == norm.length || norm.charAt(i) == ' ') {
        if (i > start) {
          val tok = norm.substring(start, i)
          n += 1
          chars += tok.length
          if (TextFunctionsRuntime.Stopwords.contains(tok)) stop += 1
          val c = counts.getOrDefault(tok, 0L) + 1L
          counts.put(tok, c)
          if (c > top) top = c
        }
        start = i + 1
      }
      i += 1
    }
    InternalRow(n, top, stop, chars)
  }
}

/** Per-document token term frequencies in ONE imperative pass:
  * `array<struct<h: bigint, tf: bigint>>` keyed by the signed
  * md5-lower-64 token hash ([[HashUtil.md5Lower64]] — identical to
  * `shingle_pos_hashes(text, 1)` elements and to DuckDB's
  * `md5_number_lower`), one entry per DISTINCT token in
  * first-occurrence order.
  *
  * This is tfidfTopTerms' scan-side kernel: the explode→groupBy
  * formulation shuffles every (doc, token) occurrence (50M rows/1M
  * probe docs) just to count within what is already a single row's
  * text. Here the count map is bounded by the document, the pairs
  * never leave the row until the (already-counted) candidate explode,
  * and the whole pass stays inside whole-stage codegen (static
  * `compute` call, no CodegenFallback barrier).
  */
case class TokenTfExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_tf requires a STRING column, got $t")
  }

  override def dataType: DataType = TokenTfExpr.schema

  override def nullSafeEval(input: Any): Any =
    TokenTfExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenTfExpr$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(c: Expression): TokenTfExpr = copy(child = c)
  override def prettyName: String = "token_tf"
}

object TokenTfExpr {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  def apply(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new TokenTfExpr(expression(text)))
  }

  def compute(input: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val ws = HashUtil.tokens(input.toString)
    // hash → slot index; per-document, so bounded by the row
    val idx = new java.util.HashMap[java.lang.Long, Integer]()
    val hs = new scala.collection.mutable.ArrayBuffer[Long](math.min(ws.length, 64))
    val cnt = new scala.collection.mutable.ArrayBuffer[Long](math.min(ws.length, 64))
    var i = 0
    while (i < ws.length) {
      val h = HashUtil.md5Lower64(ws(i))
      val j = idx.get(h)
      if (j == null) {
        idx.put(h, Integer.valueOf(hs.length))
        hs += h
        cnt += 1L
      } else cnt(j.intValue()) += 1L
      i += 1
    }
    val out = new Array[Any](hs.length)
    var k = 0
    while (k < hs.length) {
      out(k) = InternalRow(hs(k), cnt(k))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Per-document DISTINCT tokens with their signed md5-lower-64 hashes
  * in ONE imperative pass: `array<struct<h: bigint, term: string>>`,
  * first-occurrence order. The term-dictionary side of
  * tfidfTopTerms: the Column formulation
  * (`explode(filter(split(normalizeText(text))))` + md5) walks every
  * token occurrence through interpreted HOFs (measured 44s of the old
  * 70s/1M-doc total); this emits each distinct token once per doc and
  * stays inside whole-stage codegen.
  */
case class TokenDictExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_dict requires a STRING column, got $t")
  }

  override def dataType: DataType = TokenDictExpr.schema

  override def nullSafeEval(input: Any): Any =
    TokenDictExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenDictExpr$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(c: Expression): TokenDictExpr = copy(child = c)
  override def prettyName: String = "token_dict"
}

object TokenDictExpr {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("term", StringType, nullable = false))), containsNull = false)

  def apply(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new TokenDictExpr(expression(text)))
  }

  def compute(input: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val ws = HashUtil.tokens(input.toString)
    // per-hash MIN term within the doc (not first occurrence): the
    // corpus-level min(term) downstream then equals a min over ALL
    // occurrences — bit-identical to the oracle even if an md5-64
    // collision ever pairs two distinct tokens
    val idx = new java.util.HashMap[java.lang.Long, Integer]()
    val hs = new scala.collection.mutable.ArrayBuffer[Long](math.min(ws.length, 64))
    val terms = new scala.collection.mutable.ArrayBuffer[String](math.min(ws.length, 64))
    var i = 0
    while (i < ws.length) {
      val h = HashUtil.md5Lower64(ws(i))
      val j = idx.get(h)
      if (j == null) {
        idx.put(h, Integer.valueOf(hs.length))
        hs += h
        terms += ws(i)
      } else if (ws(i).compareTo(terms(j.intValue())) < 0) terms(j.intValue()) = ws(i)
      i += 1
    }
    val out = new Array[Any](hs.length)
    var k = 0
    while (k < hs.length) {
      out(k) = InternalRow(hs(k), UTF8String.fromString(terms(k)))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** [[TextFunctions.normalizeText]] as a one-pass codegen'd kernel —
  * value-identical to the `lower` + two `regexp_replace` + `trim`
  * Column chain (the form every oracle CTE replicates), but a single
  * char loop: measured 57 s → ~2 s per 1M docs of regex evaluation on
  * the scan side of the rebuild operators.
  */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"normalize_text requires a STRING column, got $t")
  }
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    NormalizeTextExpr.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeTextExpr$$.MODULE$$.compute($c)")
  override protected def withNewChildInternal(c: Expression): NormalizeTextExpr =
    copy(child = c)
  override def prettyName: String = "normalize_text"
}

object NormalizeTextExpr {
  def compute(input: UTF8String): UTF8String =
    UTF8String.fromString(TextFunctionsRuntime.normalize(input.toString))
}

/** Shared runtime pieces matching TextFunctions' Column semantics. */
object TextFunctionsRuntime {
  val Stopwords: Set[String] = TextFunctions.EnglishStopwords.toSet

  /** normalizeText: lower, [^a-z0-9\s] -> ' ', collapse \s+ -> ' ',
    * trim. (Character classes are the ASCII ones the regexes use.)
    */
  def normalize(text: String): String = {
    // full-string lowercase off the ASCII fast path: Spark's lower()
    // has one-to-many mappings (İ → i+U+0307) per-char folding misses
    val t = if (HashUtil.isAllAscii(text)) text else text.toLowerCase
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    var pendingSpace = false
    while (i < t.length) {
      val c0 = t.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      val keep = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (keep) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else pendingSpace = true
      i += 1
    }
    sb.toString
  }
}

/** BM25's scan-side kernel: per-document normalized token count plus
  * term frequencies for ONLY the query's hash set, in one imperative
  * pass — `struct<dl: bigint, terms: array<struct<h, tf>>>`.
  *
  * The full [[TokenTfExpr]] → explode → `isin` formulation walks every
  * distinct term of every document into the explode just to discard
  * all but the handful of query terms; here the binary search against
  * the sorted query hashes (ships with the task closure, like
  * [[OovStatsExpr]]'s vocab) filters at the source, so the projection
  * output is O(|query|) per row no matter how wide the document is —
  * which is what makes the downstream per-id repartition exchange
  * (the one [[TextFunctions.bm25TopDocs]] reuses for stats, df and
  * scoring) a narrow shuffle at any corpus size. `dl` is the TOTAL
  * normalized token count (= sum of [[TokenTfExpr]] tfs — same
  * tokenizer, same length normalization as the term statistics).
  */
case class QueryTfExpr(child: Expression, qHashesSorted: Array[Long])
    extends UnaryExpression {
  require(qHashesSorted.nonEmpty, "query hash set must not be empty")
  // case-class equality on an Array param is reference-based, which
  // would make semantically identical instances never compare equal
  // and defeat semanticEquals/CSE/ReuseExchange — compare contents.
  override def equals(other: Any): Boolean = other match {
    case q: QueryTfExpr =>
      child == q.child &&
        java.util.Arrays.equals(qHashesSorted, q.qHashesSorted)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(qHashesSorted)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"query_tf requires a STRING column, got $t")
  }
  override def dataType: DataType = QueryTfExpr.outType

  /** Kernel; public for the codegen `addReferenceObj` call. */
  def computeQueryTf(input: UTF8String): InternalRow = {
    val ws = HashUtil.tokens(input.toString)
    val counts = new Array[Long](qHashesSorted.length)
    var i = 0
    while (i < ws.length) {
      val j = java.util.Arrays.binarySearch(
        qHashesSorted, HashUtil.md5Lower64(ws(i)))
      if (j >= 0) counts(j) += 1L
      i += 1
    }
    var nHit = 0
    var k = 0
    while (k < counts.length) { if (counts(k) > 0L) nHit += 1; k += 1 }
    val out = new Array[Any](nHit)
    var m = 0
    k = 0
    while (k < counts.length) {
      if (counts(k) > 0L) {
        out(m) = InternalRow(qHashesSorted(k), counts(k))
        m += 1
      }
      k += 1
    }
    InternalRow(ws.length.toLong,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out))
  }

  override def nullSafeEval(input: Any): Any =
    computeQueryTf(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("queryTf", this, classOf[QueryTfExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.computeQueryTf($c)")
  }
  override protected def withNewChildInternal(c: Expression): QueryTfExpr =
    copy(child = c)
  override def prettyName: String = "query_tf"
}

object QueryTfExpr {
  val outType: StructType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("terms", ArrayType(StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("tf", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  def apply(text: Column, qHashesSorted: Array[Long]): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new QueryTfExpr(expression(text), qHashesSorted))
  }
}

/** Normalized token COUNT only — `bigint`, equal by construction to
  * `size(HashUtil.tokens(text))` = the sum of [[TokenTfExpr]] tfs —
  * in one pass with zero allocation (no token strings, no hashes, no
  * per-doc map). This is the corpus-stats (`N`, `sum(dl)`) pass of
  * [[TextFunctions.bm25TopDocs]]: those are corpus-GLOBAL scalars that
  * must exist before any per-row score, so they cannot ride the
  * scoring scan without pinning a cache past the (lazy) call — instead
  * the second pass is stripped to the cheapest kernel that yields the
  * same `dl` the tokenizer would.
  */
case class NormTokenCountExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"norm_token_count requires a STRING column, got $t")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    NormTokenCountExpr.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormTokenCountExpr$$.MODULE$$.compute($c)")
  override protected def withNewChildInternal(c: Expression): NormTokenCountExpr =
    copy(child = c)
  override def prettyName: String = "norm_token_count"
}

object NormTokenCountExpr {
  def apply(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new NormTokenCountExpr(expression(text)))
  }

  def compute(input: UTF8String): Long = {
    val text = input.toString
    val t = if (HashUtil.isAllAscii(text)) text else text.toLowerCase
    var n = 0L
    var inTok = false
    var i = 0
    while (i < t.length) {
      val c0 = t.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      val keep = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (keep) { if (!inTok) { n += 1L; inTok = true } }
      else inTok = false
      i += 1
    }
    n
  }
}

/** Order-0 character entropy in ONE pass — the compression-ratio
  * proxy of the quality stack: repetitive template junk compresses to
  * near-zero entropy and binary/encoding garbage saturates it, both
  * long before a perplexity model needs to run. Per document over
  * Unicode CODE POINTS (so `substr`-based SQL engines replay the same
  * symbol stream):
  *
  * {{{ entropy_nano = (Σ_c k_c · round(ln(n / k_c) · 1e9)) div n }}}
  *
  * — the per-symbol average in integer nano-nats, with the rounding
  * applied per DISTINCT symbol before the exact integer sum/division
  * (the family's cross-engine determinism recipe: both engines round
  * the same positive doubles, everything after is integer-exact).
  * Empty/null-free contract: zero-length text reports (0, 0, 0).
  *
  * Output struct: n_chars long, n_distinct int, entropy_nano long.
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires a STRING column, got $t")
  }

  override def dataType: DataType = CharEntropyExpr.schema

  override def nullSafeEval(input: Any): Any =
    CharEntropyExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharEntropyExpr$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(c: Expression): CharEntropyExpr =
    copy(child = c)
  override def prettyName: String = "char_entropy"
}

object CharEntropyExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("entropy_nano", LongType, nullable = false)))

  def apply(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new CharEntropyExpr(expression(text)))
  }

  /** Kernel; called from generated code and interpreted eval alike. */
  def compute(input: UTF8String): InternalRow = {
    val text = input.toString
    // code-point histogram: ASCII fast path in a flat array, the rest
    // in a small map (real corpora are ASCII-dominated)
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Array[Long]] = null
    var n = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Long]]()
        val cell = other.get(cp)
        if (cell == null) other.put(cp, Array(1L)) else cell(0) += 1L
      }
      n += 1L
      i += Character.charCount(cp)
    }
    var sum = 0L
    var distinct = 0
    if (n > 0L) {
      val nd = n.toDouble
      var c = 0
      while (c < 128) {
        val k = ascii(c)
        if (k > 0L) {
          distinct += 1
          sum += k * math.round(math.log(nd / k.toDouble) * 1e9)
        }
        c += 1
      }
      if (other != null) {
        val it = other.values().iterator()
        while (it.hasNext) {
          val k = it.next()(0)
          distinct += 1
          sum += k * math.round(math.log(nd / k.toDouble) * 1e9)
        }
      }
    }
    InternalRow(n, distinct, if (n > 0L) sum / n else 0L)
  }
}
