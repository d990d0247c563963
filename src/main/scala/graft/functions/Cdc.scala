package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking — the block-level dedup primitive
  * (Muthitacharoen, Chen & Mazières, SOSP'01 "A low-bandwidth network
  * file system"): cut a document at positions where a rolling hash of
  * the last `window` symbols masks to zero, so INSERTIONS shift only
  * the chunks they touch (fixed-size blocking re-aligns everything
  * after an edit — the reason CDC, not striding, is what storage and
  * multimodal-dedup systems run). Grouping the emitted chunk hashes
  * then finds shared blocks across documents/blobs regardless of
  * offset: the near-dup detector for the binary columns the
  * [[Multimodal]] surface models, and the shared-passage detector for
  * text at sub-document granularity.
  *
  * Determinism contract (what the gate oracle replays): the rolling
  * hash is the plain polynomial `h(i) = Σ_{j=0..w-1} cp(i-j)·B^j
  * mod M` over Unicode CODE POINTS, a cut falls AFTER every position
  * `i ≥ w` with `h(i) mod divisor == 0`, chunks are the segments
  * between cuts (the tail remainder included), and every quantity is
  * exact long arithmetic (`M < 2^31` keeps all products under
  * 2^62). The incremental update the kernel actually computes —
  * `h' = (h − cp_out·B^{w−1}) · B + cp_in mod M` — is algebraically
  * the same sum.
  *
  * Scale shape: one kernel pass per document producing the chunk
  * array scan-side; the wrapper explodes it in the same stage (no
  * array column ever enters an exchange) and the downstream dedup is
  * one hash groupBy.
  */
object Cdc {

  /** Per-document CDC chunks, exploded to rows.
    *
    * @return `(idCol, chunk_idx, start, len, chunk_hash)` — 1-based
    *         code-point offsets, md5-lower-64 of the chunk text.
    *         Empty/whitespace-only docs emit their single remainder
    *         chunk; zero-length text emits no rows.
    */
  def chunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 16,
      divisor: Int = 64,
      minLen: Int = 1,
      maxLen: Int = Int.MaxValue): DataFrame =
    df.select(col(idCol),
        posexplode(CdcChunkExpr(col(textCol), window, divisor, minLen, maxLen))
          .as(Seq("chunk_idx", "_c")))
      .select(col(idCol), col("chunk_idx"),
        col("_c.start").as("start"), col("_c.len").as("len"),
        col("_c.hash").as("chunk_hash"))

  /** Cross-document shared-block report: chunk everything, group by
    * chunk hash, keep blocks seen in more than one document — the
    * offset-insensitive sub-document dup detector.
    */
  def sharedBlocks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 16,
      divisor: Int = 64): DataFrame =
    chunks(df, idCol, textCol, window, divisor)
      .groupBy("chunk_hash")
      .agg(countDistinct(col(idCol)).as("n_docs"), count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") > 1)

  /** [[chunks]] over a BINARY column — the actual multimodal/blob
    * use: symbols are unsigned bytes, offsets are 1-based BYTE
    * offsets, chunk hashes are md5-lower-64 of the raw chunk bytes.
    * On ASCII data this equals the text form exactly (code points ==
    * bytes == UTF-8 hash input — spec-pinned); on arbitrary blobs it
    * is the LBFS algorithm verbatim.
    */
  def chunksBinary(
      df: DataFrame,
      idCol: String,
      binCol: String,
      window: Int = 16,
      divisor: Int = 64,
      minLen: Int = 1,
      maxLen: Int = Int.MaxValue): DataFrame =
    df.select(col(idCol),
        posexplode(CdcChunkExpr(col(binCol), window, divisor, minLen, maxLen))
          .as(Seq("chunk_idx", "_c")))
      .select(col(idCol), col("chunk_idx"),
        col("_c.start").as("start"), col("_c.len").as("len"),
        col("_c.hash").as("chunk_hash"))

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5-lower-64 of raw bytes (the string form's hash is over the
    * chunk's UTF-8 bytes, so the two agree whenever the byte slice IS
    * valid UTF-8 of the string slice).
    */
  private[functions] def md5Lower64Bytes(
      bytes: Array[Byte], from: Int, until: Int): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(bytes, from, until - from)
    val d = md.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h |= (d(8 + i) & 0xffL) << (8 * i); i += 1 }
    h
  }
}

/** CDC kernel; see [[Cdc]]. `minLen`/`maxLen` bound chunk lengths the
  * standard greedy way (cuts closer than `minLen` to the previous cut
  * are skipped, a cut is forced at `maxLen`) — sequential semantics a
  * SQL oracle cannot replay, so the GATE runs the pure-mask form
  * (minLen=1, maxLen=∞) and the bounded form is spec-gated against a
  * naive replay.
  */
case class CdcChunkExpr(
    child: Expression,
    window: Int,
    divisor: Int,
    minLen: Int,
    maxLen: Int) extends UnaryExpression {
  require(window >= 2, "window must be >= 2")
  require(divisor >= 2, "divisor must be >= 2")
  require(minLen >= 1 && maxLen >= minLen,
    s"need 1 <= minLen <= maxLen, got $minLen..$maxLen")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires a STRING or BINARY column, got $t")
  }

  override def dataType: DataType = ArrayType(CdcChunkExpr.chunkSchema, containsNull = false)

  /** Kernel; public for the codegen reference-object call. */
  def compute(input: UTF8String): GenericArrayData = {
    val text = input.toString
    // code-point array once: boundaries and substrings both need
    // code-point addressing (UTF-16 offsets would diverge from the
    // oracle's substr on non-BMP text)
    val cps = text.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val B = 257L
    val M = 1000000007L
    var pw = 1L // B^(w-1) mod M
    var j = 1
    while (j < window) { pw = pw * B % M; j += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var chunkStart = 0 // 0-based inclusive
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * B + cps(i)) % M
      if (i >= window) {
        // retire the symbol that left the window
        h = (h - cps(i - window) % M * (pw * B % M)) % M
        if (h < 0) h += M
      }
      val winFull = i >= window - 1
      val sinceCut = i - chunkStart + 1
      val cut =
        (winFull && h % divisor == 0L && sinceCut >= minLen) || sinceCut >= maxLen
      if (cut) {
        out += CdcChunkExpr.chunkRow(text, cps, chunkStart, i + 1)
        chunkStart = i + 1
      }
      i += 1
    }
    if (chunkStart < n) out += CdcChunkExpr.chunkRow(text, cps, chunkStart, n)
    new GenericArrayData(out.toArray)
  }

  /** Byte-symbol twin of [[compute]]: unsigned bytes, byte offsets,
    * chunk hash over the raw slice.
    */
  def computeBytes(bytes: Array[Byte]): GenericArrayData = {
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val B = 257L
    val M = 1000000007L
    var pw = 1L
    var j = 1
    while (j < window) { pw = pw * B % M; j += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var chunkStart = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * B + (bytes(i) & 0xff)) % M
      if (i >= window) {
        h = (h - (bytes(i - window) & 0xff) * (pw * B % M)) % M
        if (h < 0) h += M
      }
      val winFull = i >= window - 1
      val sinceCut = i - chunkStart + 1
      val cut =
        (winFull && h % divisor == 0L && sinceCut >= minLen) || sinceCut >= maxLen
      if (cut) {
        out += InternalRow(chunkStart + 1, i + 1 - chunkStart,
          Cdc.md5Lower64Bytes(bytes, chunkStart, i + 1))
        chunkStart = i + 1
      }
      i += 1
    }
    if (chunkStart < n)
      out += InternalRow(chunkStart + 1, n - chunkStart,
        Cdc.md5Lower64Bytes(bytes, chunkStart, n))
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case BinaryType => computeBytes(input.asInstanceOf[Array[Byte]])
    case _ => compute(input.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdc", this, classOf[CdcChunkExpr].getName)
    child.dataType match {
      case BinaryType => defineCodeGen(ctx, ev, c => s"$ref.computeBytes($c)")
      case _ => defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }
  }

  override protected def withNewChildInternal(c: Expression): CdcChunkExpr =
    copy(child = c)
  override def prettyName: String = "cdc_chunks"
}

object CdcChunkExpr {
  val chunkSchema: StructType = StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false)))

  /** Build one chunk row for cps[from, until): 1-based code-point
    * start, code-point length, md5-lower-64 of the chunk string.
    */
  private[functions] def chunkRow(
      text: String, cps: Array[Int], from: Int, until: Int): InternalRow = {
    val sb = new java.lang.StringBuilder((until - from) * 2)
    var k = from
    while (k < until) { sb.appendCodePoint(cps(k)); k += 1 }
    InternalRow(from + 1, until - from, HashUtil.md5Lower64(sb.toString))
  }

  def apply(
      text: Column, window: Int, divisor: Int,
      minLen: Int, maxLen: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new CdcChunkExpr(expression(text), window, divisor, minLen, maxLen))
  }
}
