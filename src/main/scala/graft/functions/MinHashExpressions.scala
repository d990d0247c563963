package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
  * Hashing: xxhash64-style avalanche mixes over murmur-hashed shingle
  * strings — deterministic across executors/runs (no object identity,
  * no wall clock), independent of Spark's internal hash seeds.
  */
object HashUtil {
  /** 64-bit avalanche (xxhash64 finalizer constants). */
  @inline def mix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** FNV-1a 64-bit over UTF-8 bytes — simple, fast, deterministic. */
  def hashUtf8(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Normalize + tokenize the way TextFunctions.normalizeText does:
    * lowercase, non-[a-z0-9] → separator, collapse runs.
    */
  def tokens(text: String): Array[String] = {
    val sb = new java.lang.StringBuilder(text.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < text.length) {
      val c = Character.toLowerCase(text.charAt(i))
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** Word n-gram shingle hashes (hash of the joined shingle string).
    * Shorter-than-n texts yield one whole-text shingle, matching
    * TextFunctions.wordShingles.
    */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val ws = tokens(text)
    if (ws.length <= n) {
      Array(hashUtf8(UTF8String.fromString(ws.mkString(" "))))
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
        out(i) = hashUtf8(UTF8String.fromString(sb.toString))
        i += 1
      }
      out
    }
  }
}

/** k-lane MinHash signature of a text column in one pass:
  * `sig[i] = min over shingles of mix64(shingleHash ^ mix64(i+1))`.
  * Null/short inputs still produce a k-array (single whole-text
  * shingle), null text → null.
  */
case class MinHashSigExpr(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val hs = HashUtil.shingleHashes(input.asInstanceOf[UTF8String].toString, shingleN)
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var lane = 0
      while (lane < k) {
        val v = HashUtil.mix64(h ^ HashUtil.mix64(lane + 1L))
        if (v < sig(lane)) sig(lane) = v
        lane += 1
      }
      lane = 0
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** 64-bit SimHash of the word tokens in one pass: per bit, +1/-1 votes
  * over token hashes; sign → bit.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val ws = HashUtil.tokens(input.asInstanceOf[UTF8String].toString)
    val votes = new Array[Int](64)
    var i = 0
    while (i < ws.length) {
      val h = HashUtil.mix64(HashUtil.hashUtf8(UTF8String.fromString(ws(i))))
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
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** Fraction of equal positions between two long-array signatures —
  * the MinHash Jaccard estimator — in one pass (the zip_with/filter
  * composition is interpreted and allocates a boolean array per pair).
  */
case class SigMatchRatioExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var same = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) same += 1
      i += 1
    }
    java.lang.Double.valueOf(if (n == 0) 0.0 else same.toDouble / n)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigMatchRatioExpr =
    copy(left = l, right = r)
  override def prettyName: String = "sig_match_ratio"
}

/** Cosine similarity of two float/double array columns in one
  * imperative pass — the Column-composed `aggregate(zip_with(...))`
  * formulation is an interpreted HOF chain that allocates per element.
  * Null arrays or zero norms → 0.0 (matches Similarity.cosine).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lt = left.dataType.asInstanceOf[ArrayType].elementType
    val rt = right.dataType.asInstanceOf[ArrayType].elementType
    @inline def get(arr: ArrayData, t: DataType, i: Int): Double = t match {
      case FloatType => arr.getFloat(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case LongType => arr.getLong(i).toDouble
      case _ => arr.getDouble(i)
    }
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = get(x, lt, i); val yv = get(y, rt, i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    java.lang.Double.valueOf(if (denom == 0.0) 0.0 else dot / denom)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
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

  def cosineSim(a: Column, b: Column): Column =
    column(CosineSimExpr(expression(a), expression(b)))

  def sigMatchRatio(a: Column, b: Column): Column =
    column(SigMatchRatioExpr(expression(a), expression(b)))
}
