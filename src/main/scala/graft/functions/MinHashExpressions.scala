package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

// None of these expressions is a CodegenFallback: CollapseCodegenStages
// refuses whole-stage codegen for ANY plan containing one, which would
// cut the *(N) span of every dedup/similarity stage. Stateless kernels
// codegen as static calls; stateful ones (plane cache, centroids, bloom
// bytes) ride `ctx.addReferenceObj(this)` and call an instance method.

/** Custom Catalyst expressions for the text-dedup hot path.
  *
  * The Column-composed formulations (`transform`/`aggregate` lanes) are
  * correct but interpreted — Spark's higher-order functions don't
  * participate in whole-stage codegen and get no common-subexpression
  * elimination, so a k-lane minhash re-walks the shingle array k times
  * through boxed lambda evaluation. These expressions do the whole
  * signature in ONE imperative pass per row (preference order (b) of
  * the build brief: custom `Expression` before custom operator).
  *
  * Hashing: every hash bottoms out in the lower 64 bits of MD5 —
  * deterministic across executors/runs (no object identity, no wall
  * clock, no Spark-internal seeds) AND exactly reproducible in the
  * DuckDB oracle as `md5_number_lower(...)`, which is what lets the
  * driver hash-compare minhash/simhash/fingerprint gate queries
  * end-to-end instead of trusting a rows>0 check. MD5 costs a few×
  * more than a xxhash-style mix per SHINGLE, but each shingle is
  * hashed once and the k min-hash lanes reuse it through cheap
  * affine transforms mod a Mersenne prime, so the signature cost is
  * still dominated by the lane loop, not the hash.
  */
object HashUtil {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Lower 64 bits of MD5 over UTF-8 bytes, little-endian over digest
    * bytes 8..15 — bit-for-bit DuckDB's `md5_number_lower(s)`
    * (returned there as UBIGINT; the Long here carries the same bit
    * pattern, so compare/shift UNSIGNED on both sides).
    */
  def md5Lower64(s: String): Long = {
    val d = md5Local.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) {
      h |= (d(8 + i) & 0xffL) << (8 * i)
      i += 1
    }
    h
  }

  /** Hash-space modulus for min-hash lanes: the Mersenne prime 2^31-1.
    * Keeping lane values in [0, P) makes the affine transform
    * `(a*h + b) mod P` overflow-free in SIGNED 64-bit on BOTH engines
    * (a,h < 2^31 ⇒ a*h < 2^62), and min() agrees between Scala's
    * signed Long and DuckDB's BIGINT because values are non-negative.
    */
  val P: Long = 2147483647L

  /** Lane-`i` (0-based) affine coefficients, mod [[P]] — the same
    * arithmetic the oracle SQL writes out with `i+1` 1-based.
    */
  @inline def laneA(lane: Int): Long = ((lane + 1L) * 2654435761L) % P
  @inline def laneB(lane: Int): Long = ((lane + 1L) * 40503L) % P

  /** Base hash of one shingle: md5-lower-64 (unsigned) mod [[P]].
    * DuckDB: `CAST(md5_number_lower(s) % 2147483647 AS BIGINT)`.
    */
  def shingleBase(s: String): Long = java.lang.Long.remainderUnsigned(md5Lower64(s), P)

  /** True iff every char is < 0x80 — gate for the per-char lowercase
    * fast path. Spark's `lower()` applies FULL-string lowercasing
    * with one-to-many mappings (U+0130 'İ' → 'i' + combining U+0307)
    * that per-char `Character.toLowerCase` cannot reproduce, so
    * non-ASCII input must go through `String.toLowerCase` to keep the
    * kernel bit-identical to its Column twin.
    */
  @inline private[functions] def isAllAscii(text: String): Boolean = {
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) >= 0x80) return false
      i += 1
    }
    true
  }

  /** Normalize + tokenize the way TextFunctions.normalizeText does:
    * lowercase, non-[a-z0-9] → separator, collapse runs.
    */
  def tokens(text: String): Array[String] = {
    val t = if (isAllAscii(text)) text else text.toLowerCase
    val sb = new java.lang.StringBuilder(t.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < t.length) {
      val c0 = t.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** Word n-gram shingle BASE hashes ([[shingleBase]] of the joined
    * shingle string). Shorter-than-n texts yield one whole-text
    * shingle, matching TextFunctions.wordShingles.
    */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val ws = tokens(text)
    if (ws.length <= n) {
      Array(shingleBase(ws.mkString(" ")))
    } else {
      val out = new Array[Long](ws.length - n + 1)
      var i = 0
      while (i + n <= ws.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ws(i + j))
          j += 1
        }
        out(i) = shingleBase(sb.toString)
        i += 1
      }
      out
    }
  }
}

/** k-lane MinHash signature of a text column in one pass:
  * `sig[lane] = min over shingles of (laneA*base + laneB) mod P` with
  * `base = md5_number_lower(shingle) mod P` — the textbook universal-
  * hash family, written so the DuckDB oracle reproduces every lane
  * exactly. Null/short inputs still produce a k-array (single
  * whole-text shingle), null text → null.
  */
case class MinHashSigExpr(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig requires a STRING column, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[UTF8String], k, shingleN)
  // NOT a CodegenFallback (one would veto whole-stage codegen for the
  // whole containing plan): generated code calls the static kernel, so
  // signature scans keep their *(N) span
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSigExpr$$.MODULE$$.compute($c, $k, $shingleN)")
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

object MinHashSigExpr {
  // lane coefficients per k, shared across instances/threads (pure
  // function of k; computeIfAbsent keeps it race-safe)
  private val laneCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, (Array[Long], Array[Long])]()
  private def lanes(k: Int): (Array[Long], Array[Long]) =
    laneCache.computeIfAbsent(k,
      _ => (Array.tabulate(k)(HashUtil.laneA), Array.tabulate(k)(HashUtil.laneB)))

  /** One-pass signature kernel; called from generated code (static
    * forwarder) and the interpreted path alike.
    */
  def compute(input: UTF8String, k: Int, shingleN: Int): ArrayData = {
    val (as, bs) = lanes(k)
    val hs = HashUtil.shingleHashes(input.toString, shingleN)
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var lane = 0
      while (lane < k) {
        val v = (as(lane) * h + bs(lane)) % HashUtil.P
        if (v < sig(lane)) sig(lane) = v
        lane += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** DISTINCT word n-gram shingle hashes (signed md5-lower-64 of each
  * shingle string) in one imperative pass — the scan-side kernel of
  * the set-similarity pair operators ([[graft.functions.Dedup]]
  * ngramJaccard/containment). The Column twin
  * (`array_distinct(transform(wordShingles(...), md5Lower64))`) walks
  * the text through interpreted regexp_replace + split + two HOFs per
  * row, and every downstream consumer (frequency prefilter, pruned
  * explode, per-doc sizes) re-evaluates it; this expression is one
  * JIT-compiled call per row that stays inside whole-stage codegen.
  * Distinct keeps first-occurrence order, matching `array_distinct`.
  * 64-bit keys (not [[HashUtil.shingleBase]]'s mod-2^31 lanes): at
  * ~10^8 corpus shingles a 2^31 space would produce ~10^6 accidental
  * intersections; 2^64 keeps the expected collision count < 1.
  */
case class ShingleSetExpr(child: Expression, shingleN: Int)
    extends UnaryExpression {
  require(shingleN >= 1, s"shingle_set needs n >= 1, got $shingleN")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_set requires a STRING column, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleSetExpr.compute(input.asInstanceOf[UTF8String], shingleN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleSetExpr$$.MODULE$$.compute($c, $shingleN)")
  override protected def withNewChildInternal(c: Expression): ShingleSetExpr = copy(child = c)
  override def prettyName: String = "shingle_set"
}

object ShingleSetExpr {
  def compute(input: UTF8String, n: Int): ArrayData = {
    val ws = HashUtil.tokens(input.toString)
    if (ws.length <= n) {
      new GenericArrayData(Array(HashUtil.md5Lower64(ws.mkString(" "))))
    } else {
      val seen = new java.util.HashSet[java.lang.Long]()
      val out = new scala.collection.mutable.ArrayBuffer[Long](ws.length - n + 1)
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i + n <= ws.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ws(i + j))
          j += 1
        }
        val h = HashUtil.md5Lower64(sb.toString)
        if (seen.add(h)) out += h
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }
}

/** POSITIONAL word n-gram hashes (signed md5-lower-64 per position,
  * duplicates kept) in one imperative pass. `n = 1` degenerates to
  * per-token hashes. Documents with fewer than `n` tokens yield an
  * EMPTY array (no whole-text fallback — positional consumers skip
  * short docs, matching the lead-window formulation's
  * `_t{n-1} IS NOT NULL` filter).
  *
  * Replaces two shuffle-heavy scan formulations: duplicatedSpans'
  * posexplode + `Window.partitionBy(id)` with n-1 `lead`s (a full
  * shuffle+sort of every token string just to assemble grams), and
  * corpusRarity's token-string explode. Consumers posexplode this
  * array of longs instead — position = array index, gram text never
  * leaves the row.
  */
case class ShinglePosHashesExpr(child: Expression, shingleN: Int)
    extends UnaryExpression {
  require(shingleN >= 1, s"shingle_pos_hashes needs n >= 1, got $shingleN")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_pos_hashes requires a STRING column, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShinglePosHashesExpr.compute(input.asInstanceOf[UTF8String], shingleN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShinglePosHashesExpr$$.MODULE$$.compute($c, $shingleN)")
  override protected def withNewChildInternal(c: Expression): ShinglePosHashesExpr =
    copy(child = c)
  override def prettyName: String = "shingle_pos_hashes"
}

object ShinglePosHashesExpr {
  def compute(input: UTF8String, n: Int): ArrayData = {
    val ws = HashUtil.tokens(input.toString)
    if (ws.length < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](ws.length - n + 1)
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i + n <= ws.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        j += 1
      }
      out(i) = HashUtil.md5Lower64(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Overlapping-window document chunks in ONE pass per row — chunking
  * is a per-DOCUMENT computation, so the posexplode + per-doc count
  * window + membership explode + `(doc, chunk)` reassembly groupBy
  * (two corpus-wide shuffles carrying every token string) collapse to
  * a scan-side kernel followed by a posexplode of the result. Chunk
  * `i` covers token positions `[i*stride, i*stride+maxTokens) ∩
  * [0, n)`; `nChunks = 1` if `n <= maxTokens` else
  * `floor((n-maxTokens-1)/stride) + 2`; zero-token docs yield an
  * EMPTY array (the exploded formulation emitted no rows for them).
  *
  * Output: array of struct (chunk_idx long, start_tok long, end_tok
  * long, n_tokens long, chunk_text string).
  */
case class ChunkDocsExpr(child: Expression, maxTokens: Int, overlap: Int)
    extends UnaryExpression {
  require(overlap >= 0 && overlap < maxTokens, "need 0 <= overlap < maxTokens")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"chunk_docs requires a STRING column, got $t")
  }
  override def dataType: DataType = ArrayType(ChunkDocsExpr.chunkType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ChunkDocsExpr.compute(input.asInstanceOf[UTF8String], maxTokens, overlap)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ChunkDocsExpr$$.MODULE$$.compute($c, $maxTokens, $overlap)")
  override protected def withNewChildInternal(c: Expression): ChunkDocsExpr = copy(child = c)
  override def prettyName: String = "chunk_docs"
}

object ChunkDocsExpr {
  val chunkType: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("start_tok", LongType, nullable = false),
    StructField("end_tok", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  def compute(input: UTF8String, maxTokens: Int, overlap: Int): ArrayData = {
    val ws = HashUtil.tokens(input.toString)
    val n = ws.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val stride = maxTokens - overlap
    val nChunks =
      if (n <= maxTokens) 1
      else ((n - maxTokens - 1) / stride) + 2
    val out = new Array[Any](nChunks)
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i < nChunks) {
      val start = i * stride
      val end = math.min(start + maxTokens, n)
      sb.setLength(0)
      var j = start
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(ws(j))
        j += 1
      }
      out(i) = InternalRow(
        i.toLong, start.toLong, end.toLong, (end - start).toLong,
        UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Rebuild a document minus a sorted list of line positions in ONE
  * pass — the scan-side half of
  * [[graft.functions.Curation.removeBoilerplateLines]]. The Column
  * formulation (`size(split)` + indexed `filter(split)` +
  * `array_join(split)`) re-splits the text once per consumer through
  * interpreted HOF evaluation; this kernel splits once and emits
  * `(n_lines, n_removed, clean_text)` together.
  */
case class DropLinesExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"drop_lines requires (STRING, ARRAY<INT>), got ($l, $r)")
  }
  override def dataType: DataType = DropLinesExpr.outType
  override def nullSafeEval(t: Any, d: Any): Any =
    DropLinesExpr.compute(t.asInstanceOf[UTF8String], d.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, d) => s"graft.functions.DropLinesExpr$$.MODULE$$.compute($t, $d)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DropLinesExpr =
    copy(left = l, right = r)
  override def prettyName: String = "drop_lines"
}

object DropLinesExpr {
  val outType: StructType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))

  /** `drop` holds 0-based positions into the `\n`-split of `text`
    * (Spark split semantics: limit -1, so trailing empties are kept
    * and "" is one empty line); out-of-range or duplicate entries are
    * ignored, so `n_removed` counts lines actually dropped.
    */
  def compute(text: UTF8String, drop: ArrayData): InternalRow = {
    val parts = text.toString.split("\n", -1)
    val dropFlag = new Array[Boolean](parts.length)
    var removed = 0
    var i = 0
    val nd = drop.numElements()
    while (i < nd) {
      val p = drop.getInt(i)
      if (p >= 0 && p < parts.length && !dropFlag(p)) {
        dropFlag(p) = true
        removed += 1
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder
    var first = true
    i = 0
    while (i < parts.length) {
      if (!dropFlag(i)) {
        if (!first) sb.append('\n')
        sb.append(parts(i))
        first = false
      }
      i += 1
    }
    InternalRow(parts.length.toLong, removed.toLong, UTF8String.fromString(sb.toString))
  }
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd scalar —
  * the first step of any multilingual curation pipeline (byte-level
  * dedup keys, fingerprints, and tokenizers all diverge on
  * composed-vs-decomposed encodings of the SAME visible text). Spark
  * ships no built-in for this; a Scala UDF would pay per-row
  * serialization. NFC is the oracle-checkable form (DuckDB
  * `nfc_normalize`); the K forms additionally fold compatibility
  * characters (ligatures, full-width digits) and are spec-tested.
  */
case class NormalizeUnicodeExpr(child: Expression, form: String)
    extends UnaryExpression {
  NormalizeUnicodeExpr.formOf(form) // reject bad forms at construction
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"normalize_unicode requires a STRING column, got $t")
  }
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    NormalizeUnicodeExpr.compute(input.asInstanceOf[UTF8String], form)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.NormalizeUnicodeExpr$$.MODULE$$.compute($c, "$form")""")
  override protected def withNewChildInternal(c: Expression): NormalizeUnicodeExpr =
    copy(child = c)
  override def prettyName: String = "normalize_unicode"
}

object NormalizeUnicodeExpr {
  private[functions] def formOf(form: String): java.text.Normalizer.Form =
    form match {
      case "NFC" => java.text.Normalizer.Form.NFC
      case "NFD" => java.text.Normalizer.Form.NFD
      case "NFKC" => java.text.Normalizer.Form.NFKC
      case "NFKD" => java.text.Normalizer.Form.NFKD
      case other => throw new IllegalArgumentException(
        s"normalize_unicode form must be NFC|NFD|NFKC|NFKD, got $other")
    }

  def compute(input: UTF8String, form: String): UTF8String = {
    val f = formOf(form) // one string match per row, shared by both calls
    val s = input.toString
    // the common case — already normalized ASCII/NFC text — is a
    // linear check with zero allocation
    if (java.text.Normalizer.isNormalized(s, f)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }
}

/** Scan-side OOV statistics against a FIXED vocabulary of signed
  * md5-64 token hashes: one tokenize+hash pass emits
  * `struct<n_tokens: bigint, n_oov: bigint>` per document, with a
  * binary search per token over the sorted vocab array. The
  * join-free twin of [[graft.functions.TextFunctions.oovRate]] for
  * when the vocab fits in memory (the normal case — it ships with
  * the task closure exactly like a broadcast), which also makes it a
  * STATELESS streaming stage.
  */
case class OovStatsExpr(child: Expression, vocabSorted: Array[Long])
    extends UnaryExpression {
  require(vocabSorted.nonEmpty, "vocab must not be empty")
  // case-class equality on an Array param is reference-based — compare
  // contents so semantically identical instances stay semanticEquals/
  // CSE/ReuseExchange-compatible (the QueryTfExpr lesson, r8)
  override def equals(other: Any): Boolean = other match {
    case e: OovStatsExpr =>
      child == e.child &&
        java.util.Arrays.equals(vocabSorted, e.vocabSorted)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(vocabSorted)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"oov_stats requires a STRING column, got $t")
  }
  override def dataType: DataType = OovStatsExpr.outType

  /** Kernel; public for the codegen `addReferenceObj` call. */
  def computeStats(input: UTF8String): InternalRow = {
    val ws = HashUtil.tokens(input.toString)
    var oov = 0L
    var i = 0
    while (i < ws.length) {
      if (java.util.Arrays.binarySearch(vocabSorted, HashUtil.md5Lower64(ws(i))) < 0)
        oov += 1L
      i += 1
    }
    InternalRow(ws.length.toLong, oov)
  }

  override def nullSafeEval(input: Any): Any =
    computeStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("oovStats", this, classOf[OovStatsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.computeStats($c)")
  }
  override protected def withNewChildInternal(c: Expression): OovStatsExpr =
    copy(child = c)
  override def prettyName: String = "oov_stats"
}

object OovStatsExpr {
  val outType: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_oov", LongType, nullable = false)))
}

/** One-pass hashed-linear-classifier scorer: unigram + bigram md5-64
  * feature hashes (exactly [[ShinglePosHashesExpr]] at n=1 and n=2 —
  * train and apply MUST agree) bucketed by `& (weights.length - 1)`,
  * each feature's nano-nat weight summed as longs →
  * `struct<n_feats, logit_nano>`. The weight table ships with the
  * task closure like a broadcast (`buckets` longs — 512 KiB at the
  * default 65536), which makes scoring a pure projection: no explode,
  * no join, no aggregation — so it runs unchanged as a STATELESS
  * streaming stage. Join-free twin of
  * [[graft.functions.Curation.classifierScore]].
  */
case class ClassifierScoreExpr(child: Expression, weights: Array[Long])
    extends UnaryExpression {
  require(weights.length >= 2 && (weights.length & (weights.length - 1)) == 0,
    s"weights length must be a power of two >= 2, got ${weights.length}")
  // case-class equality on an Array param is reference-based — compare
  // contents so semantically identical instances stay semanticEquals/
  // CSE/ReuseExchange-compatible (the QueryTfExpr lesson, r8)
  override def equals(other: Any): Boolean = other match {
    case e: ClassifierScoreExpr =>
      child == e.child &&
        java.util.Arrays.equals(weights, e.weights)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(weights)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"classifier_score requires a STRING column, got $t")
  }
  override def dataType: DataType = ClassifierScoreExpr.outType

  /** Kernel; public for the codegen `addReferenceObj` call. */
  def computeScore(input: UTF8String): InternalRow = {
    val mask = (weights.length - 1).toLong
    val ws = HashUtil.tokens(input.toString)
    var feats = 0L
    var logit = 0L
    var i = 0
    while (i < ws.length) {
      logit += weights((HashUtil.md5Lower64(ws(i)) & mask).toInt)
      feats += 1L
      i += 1
    }
    i = 0
    val sb = new java.lang.StringBuilder
    while (i + 2 <= ws.length) {
      sb.setLength(0)
      sb.append(ws(i)).append(' ').append(ws(i + 1))
      logit += weights((HashUtil.md5Lower64(sb.toString) & mask).toInt)
      feats += 1L
      i += 1
    }
    InternalRow(feats, logit)
  }

  override def nullSafeEval(input: Any): Any =
    computeScore(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("clsScore", this, classOf[ClassifierScoreExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.computeScore($c)")
  }
  override protected def withNewChildInternal(c: Expression): ClassifierScoreExpr =
    copy(child = c)
  override def prettyName: String = "classifier_score"
}

object ClassifierScoreExpr {
  val outType: StructType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("logit_nano", LongType, nullable = false)))
}

/** 64-bit SimHash of the word tokens in one pass: per bit, +1/-1 votes
  * over md5-lower-64 token hashes; sign → bit. The emitted Long's bit
  * pattern is reproducible in SQL from `md5_number_lower(token)`.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 requires a STRING column, got $t")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64Expr.compute(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64Expr$$.MODULE$$.compute($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(child = c)
  override def prettyName: String = "simhash64"
}

object SimHash64Expr {
  def compute(input: UTF8String): Long = {
    val ws = HashUtil.tokens(input.toString)
    val votes = new Array[Int](64)
    var i = 0
    while (i < ws.length) {
      val h = HashUtil.md5Lower64(ws(i))
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}

/** Fraction of equal positions between two long-array signatures —
  * the MinHash Jaccard estimator — in one pass (the zip_with/filter
  * composition is interpreted and allocates a boolean array per pair).
  */
case class SigMatchRatioExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sig_match_ratio requires two ARRAY<BIGINT> signatures, got $l, $r")
    }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(
      SigMatchRatioExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.SigMatchRatioExpr$$.MODULE$$.compute($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigMatchRatioExpr =
    copy(left = l, right = r)
  override def prettyName: String = "sig_match_ratio"
}

object SigMatchRatioExpr {
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var same = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) same += 1
      i += 1
    }
    if (n == 0) 0.0 else same.toDouble / n
  }
}

/** Lower-64-bit MD5 of a string column as a (signed) Long — the bit
  * pattern of DuckDB's `md5_number_lower`, so content fingerprints are
  * hash-comparable by the oracle (which converts its UBIGINT to the
  * signed twin via `x - 2^64` when `x >= 2^63`).
  */
case class Md5Lower64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_lower64 requires a STRING column, got $t")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashUtil.md5Lower64(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashUtil$$.MODULE$$.md5Lower64($c.toString())")
  override protected def withNewChildInternal(c: Expression): Md5Lower64Expr = copy(child = c)
  override def prettyName: String = "md5_lower64"
}

/** Random-hyperplane LSH band value of a float/double array column in
  * ONE imperative pass: `nBits` sign bits of dot products against
  * deterministic ±1 (Rademacher) hyperplanes, packed little-endian
  * into a Long. Plane signs derive from md5:
  * `sign(plane, j) = bit (j mod 64) of md5_lower64("lshplane_<plane>_<j/64>")`
  * — plane index is GLOBAL (`planeOffset + p`), so disjoint bands use
  * disjoint plane families and the whole 128-plane code is one md5 per
  * plane per 64 dims, reproducible verbatim in the DuckDB oracle.
  * Rademacher signs give the same cosine-LSH guarantee as Gaussian
  * planes (sign-stable under scaling; collision prob 1 - θ/π) without
  * any RNG state to ship to executors or to the oracle.
  *
  * Accumulation is ascending-j in doubles, matching the oracle's
  * `list_reduce` fold, so the `>= 0` sign decision is bit-identical.
  */
/** Deterministic ±1 random projection to `k` dimensions (Achlioptas
  * sign matrix drawn from the same md5 plane family as
  * [[LshBandExpr]], scaled by 1/√k): the cheap, data-independent
  * dimensionality reduction an embedding pipeline runs before
  * coarse clustering or visualization. Output dimension `p` is the
  * ascending-index fold `Σ_j v[j]·sign(planeOffset+p, j) / √k` —
  * bit-identical in DuckDB via `list_reduce(list_transform(...))`
  * (the repo's exact-order-fold recipe), so projections are
  * value-gated, not tolerance-gated.
  */
case class RandomProjectExpr(child: Expression, planeOffset: Int, k: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 4096, "k must be in [1, 4096]")
  require(planeOffset >= 0, "planeOffset must be >= 0")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"random_project requires ARRAY<FLOAT|DOUBLE>, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val planeBlocks =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Long]()
  private def signBits(plane: Int, blk: Int): Long =
    planeBlocks.computeIfAbsent(
      (plane.toLong << 32) | blk,
      key => HashUtil.md5Lower64(s"lshplane_${plane}_$blk"))

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Kernel; public for the codegen `addReferenceObj` handle. NB: the
    * scale is a DIVISION by √k (not a multiply by a precomputed
    * reciprocal) — the oracle's `/ sqrt(k)` must round identically.
    */
  def computeProj(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Double](k)
    var p = 0
    while (p < k) {
      val plane = planeOffset + p
      var acc = 0.0
      var j = 0
      while (j < n) {
        val v = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        val sign =
          if (((signBits(plane, j >>> 6) >>> (j & 63)) & 1L) == 1L) 1.0 else -1.0
        acc += v * sign
        j += 1
      }
      out(p) = acc / math.sqrt(k.toDouble)
      p += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    computeProj(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("randomProject", this, classOf[RandomProjectExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.computeProj($c)")
  }
  override protected def withNewChildInternal(c: Expression): RandomProjectExpr =
    copy(child = c)
  override def prettyName: String = "random_project"
}

case class LshBandExpr(child: Expression, planeOffset: Int, nBits: Int)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 63, "nBits must be in [1, 63]")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lsh_band requires ARRAY<FLOAT|DOUBLE>, got $t")
  }
  override def dataType: DataType = LongType

  // (plane, block) -> 64 sign bits; tiny and deterministic, cached per
  // expression instance. Concurrent map: instances are normally
  // task-private after deserialization, but driver-side evaluation
  // paths may share one — a racy plain map could silently corrupt and
  // mis-bucket.
  @transient private lazy val planeBlocks =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Long]()
  private def signBits(plane: Int, blk: Int): Long =
    planeBlocks.computeIfAbsent(
      (plane.toLong << 32) | blk,
      key => HashUtil.md5Lower64(s"lshplane_${plane}_$blk"))

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Kernel; public so generated code can call it through the
    * `addReferenceObj` handle (instance state: the plane-sign cache).
    */
  def computeBand(arr: ArrayData): Long = {
    val n = arr.numElements()
    var band = 0L
    var p = 0
    while (p < nBits) {
      val plane = planeOffset + p
      var acc = 0.0
      var j = 0
      while (j < n) {
        val v = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        val sign =
          if (((signBits(plane, j >>> 6) >>> (j & 63)) & 1L) == 1L) 1.0 else -1.0
        acc += v * sign
        j += 1
      }
      if (acc >= 0.0) band |= (1L << p)
      p += 1
    }
    band
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(computeBand(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshBand", this, classOf[LshBandExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.computeBand($c)")
  }
  override protected def withNewChildInternal(c: Expression): LshBandExpr = copy(child = c)
  override def prettyName: String = "lsh_band"
}

/** IVF cell assignment in one pass: argmax over `centroids` of the
  * plain dot product (centroids unit-normalized ⇒ equivalent to
  * nearest-by-cosine), ties to the lowest cell index. One k×dim
  * multiply-add loop per row — the Column-composed per-centroid
  * `aggregate(zip_with)` chain is k interpreted HOF walks.
  */
case class IvfAssignExpr(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "need at least one centroid")
  // case-class equality on an Array param is reference-based — compare
  // contents so semantically identical instances stay semanticEquals/
  // CSE/ReuseExchange-compatible (the QueryTfExpr lesson, r8)
  override def equals(other: Any): Boolean = other match {
    case e: IvfAssignExpr =>
      child == e.child &&
        java.util.Arrays.deepEquals(centroids.asInstanceOf[Array[Object]], e.centroids.asInstanceOf[Array[Object]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[Object]])
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ivf_assign requires ARRAY<FLOAT|DOUBLE>, got $t")
  }
  override def dataType: DataType = IntegerType

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Kernel; public for the codegen `addReferenceObj` call (instance
    * state: the centroid table).
    */
  def computeCell(arr: ArrayData): Int = {
    val n = arr.numElements()
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val m = math.min(n, cent.length)
      var d = 0.0
      var j = 0
      while (j < m) {
        val v = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        d += v * cent(j)
        j += 1
      }
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(computeCell(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfAssign", this, classOf[IvfAssignExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.computeCell($c)")
  }
  override protected def withNewChildInternal(c: Expression): IvfAssignExpr = copy(child = c)
  override def prettyName: String = "ivf_assign"
}

/** Cosine similarity of two float/double array columns in one
  * imperative pass — the Column-composed `aggregate(zip_with(...))`
  * formulation is an interpreted HOF chain that allocates per element.
  * Null arrays or zero norms → 0.0 (matches Similarity.cosine).
  */
/** Centered linear projection of a float/double array column through a
  * driver-held matrix (the PCA/whitening apply step):
  * `out(c) = Σ_i (x(i) - means(i)) · mat(c)(i)` — one imperative pass,
  * no per-element HOF allocation. `mat` rows are the (possibly
  * variance-scaled) component vectors; size ships with the plan
  * (k·d doubles — 4 KiB at d=64, k=8). Null arrays → null (unary
  * null-intercept); vectors shorter than d treat missing COORDINATES
  * as 0 (i.e. they still contribute `-means(i) · mat(c)(i)` to the
  * centered sum); entries past d are ignored (the matrix defines the
  * input dimensionality).
  */
case class ProjectVecExpr(
    child: Expression,
    means: Array[Double],
    mat: Array[Array[Double]])
    extends UnaryExpression {
  require(mat.nonEmpty, "need at least one projection row")
  require(mat.forall(_.length <= means.length),
    s"means has ${means.length} entries but a projection row has " +
      s"${mat.map(_.length).max} — every projected coordinate needs a mean")
  // content equality for CSE/ReuseExchange (the QueryTfExpr lesson)
  override def equals(other: Any): Boolean = other match {
    case e: ProjectVecExpr =>
      child == e.child &&
        java.util.Arrays.equals(means, e.means) &&
        java.util.Arrays.deepEquals(
          mat.asInstanceOf[Array[Object]], e.mat.asInstanceOf[Array[Object]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.util.Arrays.hashCode(means)) +
      java.util.Arrays.deepHashCode(mat.asInstanceOf[Array[Object]])
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"project_vec requires ARRAY<FLOAT|DOUBLE>, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Kernel; public for the codegen `addReferenceObj` call. */
  def computeProject(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](mat.length)
    var c = 0
    while (c < mat.length) {
      val row = mat(c)
      var acc = 0.0
      var i = 0
      // missing coordinates (short input vector) are 0, which still
      // contributes the centering term -means(i)*row(i)
      while (i < row.length) {
        val v =
          if (i >= n) 0.0
          else if (isFloat) arr.getFloat(i).toDouble
          else arr.getDouble(i)
        acc += (v - means(i)) * row(i)
        i += 1
      }
      out(c) = acc
      c += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    computeProject(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("projectVec", this, classOf[ProjectVecExpr].getName)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.computeProject($c)")
  }
  override protected def withNewChildInternal(c: Expression): ProjectVecExpr =
    copy(child = c)
  override def prettyName: String = "project_vec"
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two ARRAY<FLOAT|DOUBLE> columns, got $l, $r")
    }
  override def dataType: DataType = DoubleType

  @transient private lazy val lt = left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rt = right.dataType.asInstanceOf[ArrayType].elementType

  @inline private def get(arr: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case _ => arr.getDouble(i)
  }

  /** Kernel; public for the codegen `addReferenceObj` call (instance
    * state: the two element types).
    */
  def computeSim(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = get(x, lt, i); val yv = get(y, rt, i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(
      computeSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineSim", this, classOf[CosineSimExpr].getName)
    defineCodeGen(ctx, ev, (l, r) => s"$ref.computeSim($l, $r)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** Membership probe against a serialized
  * `org.apache.spark.util.sketch.BloomFilter` (as built by
  * `df.stat.bloomFilter`): false = DEFINITELY absent, true = maybe
  * present. The standard 100 TB anti-join pruner — rows the filter has
  * never seen skip the join shuffle entirely; only the might-contain
  * sliver (true matches + fpp) pays it. The filter bytes ride the
  * task binary (broadcast once per stage) and deserialize lazily once
  * per expression instance. Probe encoding matches
  * `DataFrameStatFunctions.bloomFilter`'s insertion: integral types as
  * longs, strings as their UTF-8 bytes.
  */
case class BloomMightContainExpr(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {
  // case-class equality on an Array param is reference-based — compare
  // contents so semantically identical instances stay semanticEquals/
  // CSE/ReuseExchange-compatible (the QueryTfExpr lesson, r8)
  override def equals(other: Any): Boolean = other match {
    case e: BloomMightContainExpr =>
      child == e.child &&
        java.util.Arrays.equals(filterBytes, e.filterBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(filterBytes)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType | BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires an integral/string/binary column, got $t")
  }
  override def dataType: DataType = BooleanType
  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  /** Kernel; public for the codegen `addReferenceObj` call. Takes Any:
    * generated code passes the child's primitive (autoboxed) or
    * UTF8String/byte[] reference.
    */
  def probe(input: Any): Boolean = child.dataType match {
    case LongType => bloom.mightContainLong(input.asInstanceOf[Long])
    case IntegerType => bloom.mightContainLong(input.asInstanceOf[Int].toLong)
    case ShortType => bloom.mightContainLong(input.asInstanceOf[Short].toLong)
    case ByteType => bloom.mightContainLong(input.asInstanceOf[Byte].toLong)
    case StringType => bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
    case BinaryType => bloom.mightContainBinary(input.asInstanceOf[Array[Byte]])
    case t => throw new IllegalArgumentException(s"bloom probe on unsupported type $t")
  }

  override def nullSafeEval(input: Any): Any = java.lang.Boolean.valueOf(probe(input))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContainExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }
  override protected def withNewChildInternal(c: Expression): BloomMightContainExpr =
    copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

/** Nearest-centroid assignment for integer-quantized k-means: argmin
  * of squared L2 distance over an `ARRAY<BIGINT|INT>` vector against a
  * broadcast integer centroid table, ties to the lower cell index.
  * All-integer distances (int8-range components, 64 dims ⇒ ≤ 2^22 per
  * vector) make the assignment bit-reproducible across engines —
  * float dot products are not, because Spark's aggregation order is
  * nondeterministic. Same `addReferenceObj` codegen pattern as
  * [[IvfAssignExpr]].
  */
case class KMeansAssignExpr(child: Expression, centroids: Array[Array[Long]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "need at least one centroid")
  // case-class equality on an Array param is reference-based — compare
  // contents so semantically identical instances stay semanticEquals/
  // CSE/ReuseExchange-compatible (the QueryTfExpr lesson, r8)
  override def equals(other: Any): Boolean = other match {
    case e: KMeansAssignExpr =>
      child == e.child &&
        java.util.Arrays.deepEquals(centroids.asInstanceOf[Array[Object]], e.centroids.asInstanceOf[Array[Object]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[Object]])
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"kmeans_assign requires ARRAY<BIGINT|INT>, got $t")
  }
  override def dataType: DataType = IntegerType

  @transient private lazy val isInt =
    child.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  /** Kernel; public for the codegen `addReferenceObj` call. */
  def computeCell(arr: ArrayData): Int = {
    val n = arr.numElements()
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val m = math.min(n, cent.length)
      var d = 0L
      var j = 0
      while (j < m) {
        val v = if (isInt) arr.getInt(j).toLong else arr.getLong(j)
        val diff = v - cent(j)
        d += diff * diff
        j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(computeCell(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kmeansAssign", this, classOf[KMeansAssignExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.computeCell($c)")
  }
  override protected def withNewChildInternal(c: Expression): KMeansAssignExpr =
    copy(child = c)
  override def prettyName: String = "kmeans_assign"
}

/** `collect_list` with a hard element cap: appends stop once the
  * buffer holds `cap + 1` elements, so a degenerate hot group (every
  * doc sharing one LSH band key, a boilerplate shingle in a billion
  * docs) can never grow an aggregation buffer — or its serialized
  * shuffle row — past cap+1 elements. Callers that keep only groups
  * with `size <= cap` lose nothing: kept groups are complete (their
  * size never reaches the cap+1 ceiling) and over-cap groups stay
  * DETECTABLE (size == cap+1) without being materialized. This is
  * what makes a single-shuffle `groupBy(key).agg(collect(ids))`
  * bucket build safe at 100 TB where the unbounded builtin would OOM
  * the reducer that owns the hot key.
  *
  * Extends Spark's own [[Collect]] TypedImperativeAggregate base, so
  * buffer serialization / ObjectHashAggregate integration are the
  * builtin `collect_list` paths; only update/merge gain the cap.
  */
case class BoundedCollectListExpr(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.Collect[
    scala.collection.mutable.ArrayBuffer[Any]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  private def maxKeep = cap + 1

  override lazy val bufferElementType: DataType = child.dataType

  override def convertToBufferElement(value: Any): Any = InternalRow.copyValue(value)

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Any] =
    scala.collection.mutable.ArrayBuffer.empty

  override def update(
      buffer: scala.collection.mutable.ArrayBuffer[Any],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[Any] =
    if (buffer.length >= maxKeep) buffer else super.update(buffer, input)

  override def merge(
      buffer: scala.collection.mutable.ArrayBuffer[Any],
      other: scala.collection.mutable.ArrayBuffer[Any]): scala.collection.mutable.ArrayBuffer[Any] = {
    val room = maxKeep - buffer.length
    if (room <= 0) buffer
    else if (other.length <= room) buffer ++= other
    else buffer ++= other.take(room)
  }

  override def eval(buffer: scala.collection.mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def withNewMutableAggBufferOffset(n: Int): BoundedCollectListExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BoundedCollectListExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectListExpr =
    copy(child = newChild)
  override def prettyName: String = "bounded_collect_list"
}

/** Mergeable bottom-`k` aggregate over `struct(priority: long,
  * tie: long, ...payload)` rows: keeps the `k` smallest elements by
  * `(priority, tie)` — a distributed top-k sketch with a HARD buffer
  * bound (at most `2k` elements per aggregation buffer; append-then-
  * trim keeps inserts amortized O(log k) without a heap object in the
  * serialized buffer). This is what makes a per-group "keep the best
  * k" safe on a hot group at 100 TB: a domain with a billion pages
  * contributes at most `2k` rows per map partition to the shuffle
  * (partial aggregation) and can never grow a reducer buffer past
  * `2k`, where the `row_number()` window formulation would sort the
  * entire group on one reducer.
  *
  * Determinism: the comparison key is exactly `(priority, tie)` —
  * callers must make that pair (astronomically) unique per element,
  * e.g. two independent md5-64 lanes of the element id; elements
  * whose FULL key collides may be kept in either order (2^-128 with
  * two md5 lanes — the repo-standard collision posture).
  */
case class BottomKByExpr(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.Collect[
    scala.collection.mutable.ArrayBuffer[Any]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length >= 2 &&
        s(0).dataType == LongType && s(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bottom_k_by needs struct(priority: bigint, tie: bigint, ...), got ${other.simpleString(3)}")
  }

  private def keyOf(e: Any): (Long, Long) = {
    val r = e.asInstanceOf[InternalRow]
    (r.getLong(0), r.getLong(1))
  }

  /** Sort ascending by (priority, tie) and drop everything past k. */
  private def trim(buffer: scala.collection.mutable.ArrayBuffer[Any])
      : scala.collection.mutable.ArrayBuffer[Any] = {
    val sorted = buffer.sortInPlaceBy(keyOf)(
      Ordering.Tuple2(Ordering.Long, Ordering.Long))
    if (sorted.length > k) sorted.takeInPlace(k) else sorted
  }

  override lazy val bufferElementType: DataType = child.dataType

  override def convertToBufferElement(value: Any): Any = InternalRow.copyValue(value)

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Any] =
    scala.collection.mutable.ArrayBuffer.empty

  override def update(
      buffer: scala.collection.mutable.ArrayBuffer[Any],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[Any] = {
    val b = super.update(buffer, input)
    if (b.length >= 2 * k) trim(b) else b
  }

  override def merge(
      buffer: scala.collection.mutable.ArrayBuffer[Any],
      other: scala.collection.mutable.ArrayBuffer[Any]): scala.collection.mutable.ArrayBuffer[Any] = {
    buffer ++= other
    if (buffer.length >= 2 * k) trim(buffer) else buffer
  }

  override def eval(buffer: scala.collection.mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(trim(buffer).toArray)

  override def withNewMutableAggBufferOffset(n: Int): BottomKByExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BottomKByExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BottomKByExpr =
    copy(child = newChild)
  override def prettyName: String = "bottom_k_by"
}

/** Exact integer PQ asymmetric-distance (ADC) sum: for codes
  * `[c_0..c_{m-1}]` and a per-query `m × k` distance table, returns
  * `Σ_sub table[sub][c_sub]` — the serving-path scorer of the PQ /
  * IVF-PQ family (Jégou, Douze & Schmid, TPAMI 2011). The table is a
  * COLUMN (a broadcast-joined per-cell table, a per-probe-row table,
  * or a literal for a single query), so one expression serves every
  * deployment shape.
  *
  * This replaces the interpreted `aggregate(zip_with(element_at...))`
  * HOF formulation: HOFs don't participate in whole-stage codegen and
  * box every lookup through lambda evaluation, and at a production
  * m = 64 every candidate row paid 64 interpreted closures (the
  * single biggest constant factor on the serving path — r12 verdict).
  * Same integers, so every ADC gate stays bit-identical.
  *
  * Contracts (identical to the HOF form's `guardedCodes`): a null
  * codes/table input yields null; a codes array whose LENGTH differs
  * from the table's m fails LOUD (a stale index written with a
  * different codebook set would otherwise emit NULL distances that
  * sort FIRST under ascending top-k); an out-of-range code fails loud
  * with the sub index (the HOF form died on ANSI `element_at`).
  */
case class PqAdcExpr(left: Expression, right: Expression, ctx: String)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(LongType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (ARRAY<INT> codes, ARRAY<ARRAY<BIGINT>> table), got ($l, $r)")
  }
  override def dataType: DataType = LongType

  /** Kernel; public for the codegen `addReferenceObj` call. */
  def adc(codesAny: Any, tableAny: Any): Long = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val table = tableAny.asInstanceOf[ArrayData]
    val m = table.numElements()
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"$ctx: stored code length ${codes.numElements()} != m = $m — " +
          "codes were written with a different codebook set")
    var d = 0L
    var sub = 0
    while (sub < m) {
      // a NULL element (corrupt file, external writer) must not read
      // as code 0 — UnsafeArrayData returns 0 for null slots, which
      // would score codebook entry 0 with a plausible wrong distance
      if (codes.isNullAt(sub))
        throw new IllegalArgumentException(
          s"$ctx: null code element at sub $sub — repair the stored codes")
      val row = table.getArray(sub)
      val c = codes.getInt(sub)
      if (c < 0 || c >= row.numElements())
        throw new IllegalArgumentException(
          s"$ctx: code $c out of range [0, ${row.numElements()}) at sub $sub — " +
            "codes were written with a different codebook set")
      d += row.getLong(c)
      sub += 1
    }
    d
  }

  override def nullSafeEval(codes: Any, table: Any): Any =
    java.lang.Long.valueOf(adc(codes, table))
  override protected def doGenCode(ctx2: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx2.addReferenceObj("pqAdc", this, classOf[PqAdcExpr].getName)
    defineCodeGen(ctx2, ev, (c, t) => s"$ref.adc($c, $t)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc"
}

/** The per-row `m × k` residual ADC table: for an integer residual
  * vector `r` (length m·ds) and the broadcast PQ codebooks, entry
  * `(sub, code)` is the exact squared L2 distance between `r`'s
  * sub-th slice and that code's centroid — the scan-side twin of the
  * driver-side `pqAdcTable`, used where each ROW carries its own
  * query (the bulk kNN join's per-(query, probed-cell) rows). One
  * imperative m·k·ds pass replacing three nested interpreted HOFs
  * (`transform(transform(aggregate(zip_with(slice...))))`); same
  * integers, bit-identical gates.
  *
  * Null residual yields null; a residual whose length differs from
  * m·ds fails LOUD (the caller's zip_with would otherwise have
  * null-padded a short vector into a plausible table).
  */
case class PqAdcTableExpr(child: Expression, codebooks: Array[Array[Array[Long]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks(0).nonEmpty, "empty codebooks")
  // content-based equality on the nested-Array param (the
  // KMeansAssignExpr lesson — reference equality breaks semanticEquals
  // / CSE / ReuseExchange for semantically identical instances)
  override def equals(other: Any): Boolean = other match {
    case e: PqAdcTableExpr =>
      child == e.child &&
        java.util.Arrays.deepEquals(
          codebooks.asInstanceOf[Array[Object]], e.codebooks.asInstanceOf[Array[Object]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[Object]])
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_table requires ARRAY<BIGINT> residual, got $t")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  @transient private lazy val m = codebooks.length
  @transient private lazy val k = codebooks(0).length
  @transient private lazy val ds = codebooks(0)(0).length

  /** Kernel; public for the codegen `addReferenceObj` call. */
  def computeTable(resAny: Any): ArrayData = {
    val res = resAny.asInstanceOf[ArrayData]
    if (res.numElements() != m * ds)
      throw new IllegalArgumentException(
        s"pq adc table: residual dimension ${res.numElements()} != m*ds = ${m * ds}")
    // loud null-element guard (the sibling-kernel contract — PqAdcExpr
    // / IntL2Expr / IvfPqEncodeExpr all fail loud): UnsafeArrayData
    // reads a null slot as 0, which would yield a plausibly WRONG ADC
    // table silently. One pass up front, off the m·k·ds hot loop.
    var p = 0
    while (p < m * ds) {
      if (res.isNullAt(p))
        throw new IllegalArgumentException(
          s"pq adc table: null residual element at $p")
      p += 1
    }
    val rows = new Array[Any](m)
    var sub = 0
    while (sub < m) {
      val cb = codebooks(sub)
      val row = new Array[Long](k)
      var code = 0
      while (code < k) {
        val cent = cb(code)
        var d = 0L
        var j = 0
        while (j < ds) {
          val diff = res.getLong(sub * ds + j) - cent(j)
          d += diff * diff
          j += 1
        }
        row(code) = d
        code += 1
      }
      rows(sub) = new GenericArrayData(row)
      sub += 1
    }
    new GenericArrayData(rows)
  }

  override def nullSafeEval(input: Any): Any = computeTable(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcTable", this, classOf[PqAdcTableExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.computeTable($c)")
  }
  override protected def withNewChildInternal(c: Expression): PqAdcTableExpr =
    copy(child = c)
  override def prettyName: String = "pq_adc_table"
}

/** Exact integer squared L2 distance between two quantized vectors
  * (`ARRAY<BIGINT>`) in one imperative pass — the refine/ground-truth
  * kernel (the `aggregate(zip_with(...))` HOF formulation pays two
  * boxed lambda closures per COMPONENT, interpreted; same integers,
  * bit-identical gates). Null array → null (the caller's null
  * contract — refine call sites wrap with a loud raise); a DIMENSION
  * MISMATCH fails loud with `ctx` (zip_with would have null-padded a
  * short vector into a null sum that silently drops the row); a null
  * ELEMENT fails loud (UnsafeArrayData reads null slots as 0 — a
  * plausible wrong distance).
  */
case class IntL2Expr(left: Expression, right: Expression, ctx: String)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"int_l2 requires (ARRAY<BIGINT>, ARRAY<BIGINT>), got ($l, $r)")
  }
  override def dataType: DataType = LongType

  /** Kernel; public for the codegen `addReferenceObj` call. */
  def l2(aAny: Any, bAny: Any): Long = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"$ctx: vector dimension ${b.numElements()} != $n")
    var d = 0L
    var j = 0
    while (j < n) {
      if (a.isNullAt(j) || b.isNullAt(j))
        throw new IllegalArgumentException(
          s"$ctx: null vector component at index $j — repair the table")
      val diff = a.getLong(j) - b.getLong(j)
      d += diff * diff
      j += 1
    }
    d
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(l2(a, b))
  override protected def doGenCode(ctx2: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx2.addReferenceObj("intL2", this, classOf[IntL2Expr].getName)
    defineCodeGen(ctx2, ev, (a, b) => s"$ref.l2($a, $b)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntL2Expr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "int_l2"
}

/** Fused PQ / IVF-PQ ENCODE kernel — the ingest-path hot loop as ONE
  * imperative pass per row: int8-quantize (`floor(x·127/scale + 0.5)`
  * — the kmeansQuantize formula verbatim, same double arithmetic),
  * coarse argmin (strict `<`, ties to the lower cell), integer
  * residual, and the per-sub codebook argmin — replacing an
  * interpreted `transform` + `zip_with` + m `slice`s per row (each a
  * boxed-closure lane over every component). Same integers: every
  * encode-fed gate is bit-identical. With `coarse` EMPTY this is the
  * plain-PQ encode (no cell, no residual; `cell` emitted as -1 and
  * dropped by the wrapper).
  *
  * Null vector → null (the encode convention — wrappers filter the
  * row out); a wrong DIMENSION fails loud ("vector dimension", the
  * family message); a null COMPONENT fails loud (the HOF chain used
  * to propagate it into a silent 0 read inside the assign kernels —
  * a plausible wrong code).
  */
case class IvfPqEncodeExpr(
    child: Expression,
    scale: Double,
    coarse: Array[Array[Long]],
    codebooks: Array[Array[Array[Long]]]) extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks(0).nonEmpty, "empty codebooks")
  // content-based equality on the Array params (the KMeansAssignExpr
  // lesson — reference equality breaks semanticEquals/CSE)
  override def equals(other: Any): Boolean = other match {
    case e: IvfPqEncodeExpr =>
      child == e.child && scale == e.scale &&
        java.util.Arrays.deepEquals(
          coarse.asInstanceOf[Array[Object]], e.coarse.asInstanceOf[Array[Object]]) &&
        java.util.Arrays.deepEquals(
          codebooks.asInstanceOf[Array[Object]], e.codebooks.asInstanceOf[Array[Object]])
    case _ => false
  }
  override def hashCode(): Int =
    ((31 * child.hashCode() + scale.hashCode()) * 31 +
      java.util.Arrays.deepHashCode(coarse.asInstanceOf[Array[Object]])) * 31 +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[Object]])
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // any numeric element — the replaced HOF chain quantized via
    // x.cast("double"), so integer/decimal vector columns must keep
    // encoding
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ivfpq_encode requires an ARRAY of a numeric type, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  @transient private lazy val m = codebooks.length
  @transient private lazy val ds = codebooks(0)(0).length
  @transient private lazy val dim =
    if (coarse.nonEmpty) coarse(0).length else m * ds
  @transient private lazy val elemAsDouble: (ArrayData, Int) => Double =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => (a, j) => a.getFloat(j).toDouble
      case DoubleType => (a, j) => a.getDouble(j)
      case LongType => (a, j) => a.getLong(j).toDouble
      case IntegerType => (a, j) => a.getInt(j).toDouble
      case ShortType => (a, j) => a.getShort(j).toDouble
      case ByteType => (a, j) => a.getByte(j).toDouble
      case d: DecimalType => (a, j) => a.getDecimal(j, d.precision, d.scale).toDouble
      case t => throw new IllegalStateException(s"unsupported element type $t")
    }

  /** Kernel; public for the codegen `addReferenceObj` call. */
  def encode(vecAny: Any): InternalRow = {
    val arr = vecAny.asInstanceOf[ArrayData]
    if (arr.numElements() != dim)
      throw new IllegalArgumentException(
        s"ivfpq encode: vector dimension ${arr.numElements()} != $dim")
    val q = new Array[Long](dim)
    var j = 0
    while (j < dim) {
      if (arr.isNullAt(j))
        throw new IllegalArgumentException(
          s"ivfpq encode: null vector component at index $j — repair the table")
      q(j) = math.floor(elemAsDouble(arr, j) * 127.0 / scale + 0.5).toLong
      j += 1
    }
    var cell = -1
    if (coarse.nonEmpty) {
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < coarse.length) {
        val cent = coarse(c)
        var d = 0L
        var t = 0
        while (t < dim) { val diff = q(t) - cent(t); d += diff * diff; t += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      cell = best
      val cent = coarse(best)
      j = 0
      while (j < dim) { q(j) -= cent(j); j += 1 }
    }
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      val cb = codebooks(sub)
      var bc = 0
      var bd = Long.MaxValue
      var code = 0
      while (code < cb.length) {
        val cc = cb(code)
        var d = 0L
        var t = 0
        while (t < ds) {
          val diff = q(sub * ds + t) - cc(t); d += diff * diff; t += 1
        }
        if (d < bd) { bd = d; bc = code }
        code += 1
      }
      codes(sub) = bc
      sub += 1
    }
    InternalRow(cell, new GenericArrayData(codes))
  }

  override def nullSafeEval(input: Any): Any = encode(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfPqEncode", this, classOf[IvfPqEncodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
  override protected def withNewChildInternal(c: Expression): IvfPqEncodeExpr =
    copy(child = c)
  override def prettyName: String = "ivfpq_encode"
}

/** L2-normalize a float/double vector to unit length in one
  * imperative pass (the HOF formulation evaluates the norm aggregate
  * once per OUTPUT component — no CSE for interpreted lambdas).
  * Null input → null; an ALL-ZERO vector → null (no direction — the
  * null rides the family's null contract: encode/fit entry points
  * exclude it, top-k callers filter; assert isNotNull after this
  * projection to fail loud instead); a null COMPONENT fails loud.
  * The cosine-serving recipe's ingest step: for unit vectors
  * `||a − b||² = 2 − 2·cos(a, b)`, so the exact-integer L2 family
  * serves cosine over this projection.
  */
case class L2NormalizeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"l2_normalize requires ARRAY<FLOAT|DOUBLE>, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Kernel; public for the codegen `addReferenceObj` call. Returns
    * null for an all-zero vector.
    */
  def norm(arrAny: Any): ArrayData = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"l2_normalize: null component at index $i — repair the vector")
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      v(i) = x
      s += x * x
      i += 1
    }
    if (s == 0.0) null
    else {
      val inv = 1.0 / math.sqrt(s)
      i = 0
      while (i < n) { v(i) *= inv; i += 1 }
      new GenericArrayData(v)
    }
  }

  override def nullSafeEval(input: Any): Any = norm(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("l2norm", this, classOf[L2NormalizeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.norm($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }
  override protected def withNewChildInternal(c: Expression): L2NormalizeExpr =
    copy(child = c)
  override def prettyName: String = "l2_normalize"
}

/** Column-API entry points for the custom expressions (Spark 4's
  * Column↔Expression bridge lives in `sql.classic.ExpressionUtils`).
  */
object DedupExpressions {
  import org.apache.spark.sql.GraftColumnBridge._

  def minhashSig(text: Column, k: Int = 64, shingleN: Int = 3): Column =
    column(MinHashSigExpr(expression(text), k, shingleN))

  def simhash64(text: Column): Column =
    column(SimHash64Expr(expression(text)))

  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    column(NormalizeUnicodeExpr(expression(text), form))

  def normalizeText(text: Column): Column =
    column(NormalizeTextExpr(expression(text)))

  def oovStats(text: Column, vocabSorted: Array[Long]): Column =
    column(OovStatsExpr(expression(text), vocabSorted))

  def cosineSim(a: Column, b: Column): Column =
    column(CosineSimExpr(expression(a), expression(b)))

  def sigMatchRatio(a: Column, b: Column): Column =
    column(SigMatchRatioExpr(expression(a), expression(b)))

  def md5Lower64(s: Column): Column =
    column(Md5Lower64Expr(expression(s)))

  def shingleSet(text: Column, shingleN: Int = 3): Column =
    column(ShingleSetExpr(expression(text), shingleN))

  def shinglePosHashes(text: Column, shingleN: Int): Column =
    column(ShinglePosHashesExpr(expression(text), shingleN))

  def chunkDocs(text: Column, maxTokens: Int, overlap: Int): Column =
    column(ChunkDocsExpr(expression(text), maxTokens, overlap))

  def dropLines(text: Column, dropPos: Column): Column =
    column(DropLinesExpr(expression(text), expression(dropPos)))

  def lshBand(vec: Column, planeOffset: Int, nBits: Int): Column =
    column(LshBandExpr(expression(vec), planeOffset, nBits))

  def randomProject(vec: Column, k: Int, planeOffset: Int = 0): Column =
    column(RandomProjectExpr(expression(vec), planeOffset, k))

  def ivfAssign(vec: Column, centroids: Array[Array[Double]]): Column =
    column(IvfAssignExpr(expression(vec), centroids))

  def bloomMightContain(c: Column, filterBytes: Array[Byte]): Column =
    column(BloomMightContainExpr(expression(c), filterBytes))

  def boundedCollectList(c: Column, cap: Int): Column =
    column(BoundedCollectListExpr(expression(c), cap).toAggregateExpression())

  def bottomKBy(c: Column, k: Int): Column =
    column(BottomKByExpr(expression(c), k).toAggregateExpression())

  def classifierScoreScan(text: Column, weights: Array[Long]): Column =
    column(ClassifierScoreExpr(expression(text), weights))

  def kmeansAssign(q: Column, centroids: Array[Array[Long]]): Column =
    column(KMeansAssignExpr(expression(q), centroids))

  def projectVec(vec: Column, means: Array[Double], mat: Array[Array[Double]]): Column =
    column(ProjectVecExpr(expression(vec), means, mat))

  def pqAdc(codes: Column, table: Column, ctx: String): Column =
    column(PqAdcExpr(expression(codes), expression(table), ctx))

  def pqAdcTables(residual: Column, codebooks: Array[Array[Array[Long]]]): Column =
    column(PqAdcTableExpr(expression(residual), codebooks))

  def intL2(a: Column, b: Column, ctx: String): Column =
    column(IntL2Expr(expression(a), expression(b), ctx))

  def ivfPqEncodeVec(
      vec: Column,
      scale: Double,
      coarse: Array[Array[Long]],
      codebooks: Array[Array[Array[Long]]]): Column =
    column(IvfPqEncodeExpr(expression(vec), scale, coarse, codebooks))

  def l2Normalize(vec: Column): Column =
    column(L2NormalizeExpr(expression(vec)))
}

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * SIGMOD'03 — the MOSS local document fingerprinting algorithm):
  * over an array of positional k-gram hashes, select in every window
  * of `w` consecutive hashes the MINIMUM (unsigned; RIGHTMOST
  * occurrence on ties), recording each selected position once.
  * Guarantee (the paper's): any substring match of at least
  * `w + k - 1` tokens between two documents shares at least one
  * selected fingerprint, while the expected density of selected
  * positions is only `2/(w+1)` — position-aware near-dup detection
  * at a fraction of the full k-gram set, the gap between MinHash
  * (whole-document similarity, no positions) and the full
  * [[ShinglePosHashesExpr]] explode (every gram).
  *
  * Unsigned min matches DuckDB's native UBIGINT ordering over
  * `md5_number_lower`, so the oracle replays every window's argmin
  * directly. Composes with [[ShinglePosHashesExpr]] in one codegen'd
  * projection; `pos` is the 1-based k-gram index.
  */
case class WinnowExpr(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"winnow needs a window >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow requires ARRAY<LONG>, got $t")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)

  /** Kernel; public for the codegen reference-object call. */
  def computeFp(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var last = -1
    var p = 0
    val lim = math.max(n - w, 0)
    while (p <= lim) {
      var best = p
      val end = math.min(p + w, n)
      var i = p + 1
      while (i < end) {
        if (java.lang.Long.compareUnsigned(arr.getLong(i), arr.getLong(best)) <= 0)
          best = i // <= keeps the RIGHTMOST minimum
        i += 1
      }
      if (best != last) {
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](best + 1, arr.getLong(best)))
        last = best
      }
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    computeFp(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowExpr].getName)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.computeFp($c)")
  }
  override protected def withNewChildInternal(c: Expression): WinnowExpr =
    copy(child = c)
  override def prettyName: String = "winnow"
}
