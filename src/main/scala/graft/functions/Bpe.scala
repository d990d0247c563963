package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer training + encoding.
  *
  * Training is the Sennrich word-count formulation (Sennrich, Haddow &
  * Birch 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"): the corpus reduces to a `(word, count)` vocabulary — the
  * ONLY distributed pass — and the merge loop runs on the driver over
  * that bounded table with incremental pair-count maintenance (each
  * merge touches only the words that contain the merged pair, the
  * standard formulation's complexity). At 100 TB the corpus scan is
  * the cost; the distinct-word vocabulary after a `minCount` floor is
  * orders of magnitude smaller and driver-bounded by contract
  * (`maxWords` fails loud, never truncates silently — truncation would
  * change the learned merges).
  *
  * Exact cross-engine semantics, shared by training, the encode
  * kernel, and the DuckDB oracle:
  *
  *  - a word is one match of `tokenPattern` (no end-of-word marker —
  *    merges never cross word boundaries);
  *  - symbols start as Unicode CODE POINTS (not UTF-16 code units);
  *  - one merge step replaces adjacent `(a, b)` occurrences greedily
  *    left-to-right, non-overlapping — identical to a single string
  *    `replace` over the separator-terminated symbol string
  *    `s1·s2·…·sn·` with pattern `a·b·` → `a b·` (each symbol carries
  *    its OWN trailing separator, so adjacent matches share no
  *    characters and `a a a → (aa) a` exactly like the greedy scan);
  *  - the best pair maximizes total count, ties broken by smallest
  *    `(a, b)` in code-point order (= UTF-8 byte order, what DuckDB's
  *    binary string collation yields);
  *  - merges apply IN LEARNED ORDER at encode time (Sennrich's encode)
  *    — so `k` chained SQL `replace` stages reproduce the encoder
  *    bit-for-bit, which is what makes the q_bpe_train/q_bpe_encode
  *    oracles expressible without recursion.
  *
  * Reference ties: metriqueql's analysis layer has token statistics
  * but no trainable tokenizer; this is part of the training-data
  * pipeline surface (SURVEY §6) alongside `TextFunctions.bpeTokenCount`
  * (the 4-chars-per-token heuristic this replaces when real subword
  * counts are needed).
  */
object Bpe {

  /** Compare by Unicode code point — equals UTF-8 byte order, the
    * collation DuckDB uses for `ORDER BY` on strings. Java's
    * `String.compareTo` orders by UTF-16 code unit, which disagrees
    * for supplementary-plane vs U+E000..U+FFFF characters.
    */
  def cpCompare(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** Split into code-point symbols. */
  private[functions] def codePointSymbols(word: String): Array[String] = {
    val n = word.codePointCount(0, word.length)
    val out = new Array[String](n)
    var i = 0
    var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val w = Character.charCount(cp)
      out(k) = word.substring(i, i + w)
      k += 1
      i += w
    }
    out
  }

  /** One greedy left-to-right, non-overlapping merge pass. */
  private[functions] def applyMerge(
      syms: Array[String], a: String, b: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
        out += a + b
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.toArray
  }

  /** Train `numMerges` merges over a `(word, count)` vocabulary.
    * Stops early (returns fewer rows) when no adjacent pair is left.
    * Pure driver code over the bounded vocab; deterministic: the
    * arg-max is a strict total order (count desc, then `(a, b)` asc
    * by [[cpCompare]]), so hash-map iteration order cannot leak in.
    */
  def train(
      wordCounts: Seq[(String, Long)],
      numMerges: Int): IndexedSeq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val entries = wordCounts.iterator.filter(_._1.nonEmpty).toArray
    val syms = entries.map { case (w, _) => codePointSymbols(w) }
    val cnts = entries.map(_._2)

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    // word indices that MAY contain the pair (stale entries tolerated:
    // the apply step re-checks adjacency before touching a word)
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]

    def add(p: (String, String), c: Long, wi: Int): Unit = {
      pairCount.updateWith(p) { cur => Some(cur.getOrElse(0L) + c) }
      pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wi
    }
    def sub(p: (String, String), c: Long): Unit =
      pairCount.updateWith(p) {
        case Some(cur) if cur > c => Some(cur - c)
        case _ => None
      }

    var wi = 0
    while (wi < syms.length) {
      val s = syms(wi)
      var k = 0
      while (k + 1 < s.length) { add((s(k), s(k + 1)), cnts(wi), wi); k += 1 }
      wi += 1
    }

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var it = 0
    while (it < numMerges && pairCount.nonEmpty) {
      var best: (String, String) = null
      var bestC = Long.MinValue
      pairCount.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && {
              val d = cpCompare(p._1, best._1)
              d < 0 || (d == 0 && cpCompare(p._2, best._2) < 0)
            })) {
          best = p
          bestC = c
        }
      }
      merges += best
      val (a, b) = best
      pairWords.remove(best).foreach { ids =>
        ids.foreach { i =>
          val old = syms(i)
          var k = 0
          var hit = false
          while (!hit && k + 1 < old.length) {
            hit = old(k) == a && old(k + 1) == b
            k += 1
          }
          if (hit) {
            val c = cnts(i)
            k = 0
            while (k + 1 < old.length) { sub((old(k), old(k + 1)), c); k += 1 }
            val nw = applyMerge(old, a, b)
            k = 0
            while (k + 1 < nw.length) { add((nw(k), nw(k + 1)), c, i); k += 1 }
            syms(i) = nw
          }
        }
      }
      pairCount.remove(best)
      it += 1
    }
    merges.toIndexedSeq
  }

  /** Encode one word: in-order merge application with a substring
    * pre-check — `(a, b)` can only occur adjacently if `a + b` is a
    * substring of the word (symbol concatenation is invariant under
    * merging), so most of the merge list is skipped per word at the
    * cost of one `indexOf`.
    */
  private[functions] def encodeWord(
      word: String, merges: IndexedSeq[(String, String)]): Array[String] = {
    var s = codePointSymbols(word)
    var r = 0
    while (r < merges.length && s.length > 1) {
      val (a, b) = merges(r)
      if (word.contains(a + b)) s = applyMerge(s, a, b)
      r += 1
    }
    s
  }
}

/** One-pass BPE encode kernel: tokenize with `tokenPattern`, encode
  * every word with the trained merge list, and emit either the flat
  * token array (`emitTokens = true`, `array<string>`) or just the
  * token COUNT (`bigint` — the 100 TB scan shape: no token strings
  * ever materialize). Stays inside whole-stage codegen via a static
  * forwarder call (same pattern as [[TextStatsExpr]]).
  *
  * Words repeat Zipf-style, so the kernel memoizes `word → tokens`
  * per executor THREAD (thread-confined map ⇒ no locking, no sharing
  * across the `local[32]`/executor-core pool; bounded at 64k entries,
  * cleared on overflow — hot words re-enter immediately).
  */
case class BpeEncodeExpr(
    child: Expression,
    merges: Seq[(String, String)],
    tokenPattern: String,
    emitTokens: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_encode requires a STRING column, got $t")
  }

  override def dataType: DataType =
    if (emitTokens) ArrayType(StringType, containsNull = false) else LongType

  @transient private lazy val mergesIdx = merges.toIndexedSeq
  @transient private lazy val pattern = java.util.regex.Pattern.compile(tokenPattern)
  @transient private lazy val cache: ThreadLocal[java.util.HashMap[String, Array[String]]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Array[String]]())

  private def tokensOf(word: String): Array[String] = {
    val m = cache.get()
    var t = m.get(word)
    if (t == null) {
      t = Bpe.encodeWord(word, mergesIdx)
      if (m.size() >= 65536) m.clear()
      m.put(word, t)
    }
    t
  }

  /** Kernel; public for the codegen `addReferenceObj` call. */
  def computeBpe(input: UTF8String): Any = {
    val m = pattern.matcher(input.toString)
    if (emitTokens) {
      val out = mutable.ArrayBuffer.empty[Any]
      while (m.find()) {
        val t = tokensOf(m.group())
        var i = 0
        while (i < t.length) { out += UTF8String.fromString(t(i)); i += 1 }
      }
      new GenericArrayData(out.toArray)
    } else {
      var n = 0L
      while (m.find()) n += tokensOf(m.group()).length
      java.lang.Long.valueOf(n)
    }
  }

  override def nullSafeEval(input: Any): Any =
    computeBpe(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncodeExpr].getName)
    val out = if (emitTokens) "org.apache.spark.sql.catalyst.util.ArrayData" else "Long"
    defineCodeGen(ctx, ev, c => s"($out) $ref.computeBpe($c)")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncodeExpr =
    copy(child = c)
  override def prettyName: String = "bpe_encode"
}

object BpeEncodeExpr {
  /** Flat BPE token array for `text`. */
  def tokens(text: Column, merges: Seq[(String, String)], tokenPattern: String): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new BpeEncodeExpr(expression(text), merges, tokenPattern, emitTokens = true))
  }

  /** BPE token COUNT for `text` — no token strings materialize. */
  def count(text: Column, merges: Seq[(String, String)], tokenPattern: String): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new BpeEncodeExpr(expression(text), merges, tokenPattern, emitTokens = false))
  }
}
