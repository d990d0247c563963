package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

  /** UTF-8 bytes rendered as 2-char lowercase hex pairs — the
    * byte-level (GPT-2-shape) symbol alphabet. Rendering bytes as hex
    * keeps every symbol a plain `[0-9a-f]+` string, so the SAME merge
    * loop, encode kernel, and chained-`replace` DuckDB oracle apply
    * unchanged (`lower(hex(encode(word)))` chunked in twos on the SQL
    * side); single-byte hex order == unsigned byte order, so the
    * tie-break total order is the byte-sequence order a raw-bytes
    * implementation would use.
    */
  private[functions] def byteHexSymbols(word: String): Array[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = String.format("%02x", Byte.box(bytes(i)))
      i += 1
    }
    out
  }

  /** Lowercase hex of `word`'s UTF-8 bytes (the byte-level "word"
    * string the encode kernel and [[MergeIndex]] operate on).
    */
  private[functions] def toHex(word: String): String = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(Character.forDigit(b >> 4, 16))
      sb.append(Character.forDigit(b & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Fixed-width chunk symbols (stage-0 of a byte-level encode over
    * the hex string; width 2 = one byte per symbol).
    */
  private[functions] def chunkSymbols(s: String, width: Int): Array[String] = {
    val n = (s.length + width - 1) / width
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      out(i) = s.substring(i * width, math.min((i + 1) * width, s.length))
      i += 1
    }
    out
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

  /** One greedy left-to-right, non-overlapping merge pass. `merged`
    * is the replacement symbol — `a + b` for plain BPE, the
    * continuation-stripped concatenation for WordPiece.
    */
  private[functions] def applyMerge(
      syms: Array[String], a: String, b: String,
      merged: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
        out += merged
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.toArray
  }

  private[functions] def applyMerge(
      syms: Array[String], a: String, b: String): Array[String] =
    applyMerge(syms, a, b, a + b)

  /** Growable int list (word indices per pair; duplicates tolerated —
    * the apply step re-checks adjacency, and after the first visit the
    * word no longer contains the pair). Shared with [[Wordpiece]] —
    * one copy of the pair-index bookkeeping to keep in sync.
    */
  private[functions] final class IntList {
    var a: Array[Int] = new Array[Int](4)
    var n: Int = 0
    def add(x: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = x
      n += 1
    }
  }

  /** Open-addressing pair table: key = `(aId << 32) | bId` → live
    * count + occurrence word list. Keys are non-negative (symbol ids
    * are), so -1 is the empty sentinel. Slots are never removed —
    * count 0 means dead (`live` tracks the non-zero population); the
    * table is bounded by distinct pairs ever seen.
    */
  private final class PairTable(initialCapacityPow2: Int) {
    private var cap = initialCapacityPow2
    private var mask = cap - 1
    var keys: Array[Long] = Array.fill(cap)(-1L)
    var counts: Array[Long] = new Array[Long](cap)
    var words: Array[IntList] = new Array[IntList](cap)
    var live: Int = 0
    private var used: Int = 0

    private def grow(): Unit = {
      val ok = keys; val oc = counts; val ow = words
      cap <<= 1; mask = cap - 1
      keys = Array.fill(cap)(-1L)
      counts = new Array[Long](cap)
      words = new Array[IntList](cap)
      var i = 0
      while (i < ok.length) {
        if (ok(i) != -1L) {
          var s = (scala.util.hashing.byteswap64(ok(i)) & mask).toInt
          while (keys(s) != -1L) s = (s + 1) & mask
          keys(s) = ok(i); counts(s) = oc(i); words(s) = ow(i)
        }
        i += 1
      }
    }

    /** Find-or-insert slot for `key`. */
    def slot(key: Long): Int = {
      var s = (scala.util.hashing.byteswap64(key) & mask).toInt
      while (keys(s) != -1L && keys(s) != key) s = (s + 1) & mask
      if (keys(s) == -1L) {
        if ((used + 1) * 10 > cap * 6) { grow(); return slot(key) }
        keys(s) = key
        used += 1
      }
      s
    }

    /** Slot of an existing key, -1 if absent. */
    def find(key: Long): Int = {
      var s = (scala.util.hashing.byteswap64(key) & mask).toInt
      while (keys(s) != -1L && keys(s) != key) s = (s + 1) & mask
      if (keys(s) == -1L) -1 else s
    }

    def addCount(s: Int, delta: Long): Long = {
      val was = counts(s)
      val now = was + delta
      counts(s) = if (now > 0) now else 0L
      if (was == 0L && counts(s) > 0L) live += 1
      else if (was > 0L && counts(s) == 0L) live -= 1
      counts(s)
    }
  }

  /** Binary max-heap of `(count, pairKey)` snapshots on two parallel
    * long arrays (no boxing): count desc, then `(a, b)` asc by the
    * CODE-POINT order of the symbol strings — the exact total order
    * the arg-max scan would use, so heap internals cannot leak into
    * the result.
    */
  private final class SnapshotHeap(symStrs: mutable.ArrayBuffer[String]) {
    private var cs = new Array[Long](1 << 12)
    private var ks = new Array[Long](1 << 12)
    var n: Int = 0

    /** true when (c1,k1) has strictly higher priority than (c2,k2) */
    private def before(c1: Long, k1: Long, c2: Long, k2: Long): Boolean = {
      if (c1 != c2) return c1 > c2
      val a = cpCompare(symStrs((k1 >>> 32).toInt), symStrs((k2 >>> 32).toInt))
      if (a != 0) return a < 0
      cpCompare(symStrs(k1.toInt), symStrs(k2.toInt)) < 0
    }

    def push(c: Long, k: Long): Unit = {
      if (n == cs.length) {
        cs = java.util.Arrays.copyOf(cs, n * 2)
        ks = java.util.Arrays.copyOf(ks, n * 2)
      }
      var i = n
      n += 1
      while (i > 0 && before(c, k, cs((i - 1) >> 1), ks((i - 1) >> 1))) {
        val p = (i - 1) >> 1
        cs(i) = cs(p); ks(i) = ks(p)
        i = p
      }
      cs(i) = c; ks(i) = k
    }

    var popCount: Long = 0L
    var popKey: Long = 0L

    def pop(): Unit = {
      popCount = cs(0); popKey = ks(0)
      n -= 1
      val c = cs(n); val k = ks(n)
      var i = 0
      var continue = true
      while (continue) {
        val l = 2 * i + 1
        if (l >= n) continue = false
        else {
          var m = l
          val r = l + 1
          if (r < n && before(cs(r), ks(r), cs(l), ks(l))) m = r
          if (before(cs(m), ks(m), c, k)) {
            cs(i) = cs(m); ks(i) = ks(m)
            i = m
          } else continue = false
        }
      }
      cs(i) = c; ks(i) = k
    }
  }

  /** Train `numMerges` merges over a `(word, count)` vocabulary.
    * Stops early (returns fewer rows) when no adjacent pair is left.
    * Pure driver code over the bounded vocab; deterministic: the
    * arg-max is a strict total order (count desc, then `(a, b)` asc
    * by [[cpCompare]]), so no hash/heap iteration order can leak in
    * (spec'd against a from-scratch recount trainer on randomized
    * corpora).
    *
    * Engineering shape, for the vocab sizes a 100 TB corpus floors
    * down to (millions of words): symbols intern to int ids, pair
    * stats live in an open-addressing primitive table keyed by the
    * packed id pair, the arg-max is a lazy-deletion snapshot heap
    * (pops validate against the live count), and each merge updates
    * only the words that contain the merged pair (their indices ride
    * the table slot). The tuple-keyed HashMap version of this loop
    * measured 37-40 s for 1 000 merges over a 200k-word vocab; this
    * one ~6 s, identical merges.
    */
  def train(
      wordCounts: Seq[(String, Long)],
      numMerges: Int,
      symbolize: String => Array[String] = codePointSymbols): IndexedSeq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val entries = wordCounts.iterator.filter(_._1.nonEmpty).toArray
    val symIds = new java.util.HashMap[String, Integer]()
    val symStrs = mutable.ArrayBuffer.empty[String]
    def idOf(s: String): Int = {
      var id = symIds.get(s)
      if (id == null) {
        id = Integer.valueOf(symStrs.length)
        symStrs += s
        symIds.put(s, id)
      }
      id.intValue()
    }
    val syms: Array[Array[Int]] = entries.map { case (w, _) =>
      symbolize(w).map(idOf)
    }
    val cnts = entries.map(_._2)

    val table = new PairTable(1 << 16)
    val heap = new SnapshotHeap(symStrs)
    @inline def key(a: Int, b: Int): Long = (a.toLong << 32) | (b.toLong & 0xffffffffL)

    def add(a: Int, b: Int, c: Long, wi: Int): Unit = {
      val k = key(a, b)
      val s = table.slot(k)
      val nv = table.addCount(s, c)
      heap.push(nv, k)
      if (table.words(s) == null) table.words(s) = new IntList
      table.words(s).add(wi)
    }
    def sub(a: Int, b: Int, c: Long): Unit = {
      val s = table.find(key(a, b))
      if (s >= 0 && table.counts(s) > 0L) {
        val nv = table.addCount(s, -c)
        if (nv > 0L) heap.push(nv, key(a, b))
      }
    }

    var wi = 0
    while (wi < syms.length) {
      val s = syms(wi)
      var k = 0
      while (k + 1 < s.length) { add(s(k), s(k + 1), cnts(wi), wi); k += 1 }
      wi += 1
    }

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var it = 0
    while (it < numMerges && table.live > 0) {
      // pop until a live snapshot: count matches the table AND > 0
      var bestKey = -1L
      while (bestKey == -1L) {
        heap.pop()
        val s = table.find(heap.popKey)
        if (s >= 0 && table.counts(s) == heap.popCount && heap.popCount > 0L)
          bestKey = heap.popKey
      }
      val a = (bestKey >>> 32).toInt
      val b = bestKey.toInt
      merges += ((symStrs(a), symStrs(b)))
      val mergedId = idOf(symStrs(a) + symStrs(b))
      val bs = table.find(bestKey)
      val ids = table.words(bs)
      table.words(bs) = null
      // kill the pair: count -> 0 (live--), stale snapshots discard
      table.addCount(bs, -table.counts(bs))
      var x = 0
      while (x < ids.n) {
        val i = ids.a(x)
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
          while (k + 1 < old.length) { sub(old(k), old(k + 1), c); k += 1 }
          // int-id twin of applyMerge: greedy left-to-right
          val nw = new Array[Int](old.length)
          var m = 0
          var j = 0
          while (j < old.length) {
            if (j + 1 < old.length && old(j) == a && old(j + 1) == b) {
              nw(m) = mergedId; m += 1; j += 2
            } else {
              nw(m) = old(j); m += 1; j += 1
            }
          }
          val trimmed = if (m == nw.length) nw else java.util.Arrays.copyOf(nw, m)
          k = 0
          while (k + 1 < trimmed.length) { add(trimmed(k), trimmed(k + 1), c, i); k += 1 }
          syms(i) = trimmed
        }
        x += 1
      }
      it += 1
    }
    merges.toIndexedSeq
  }

  /** Encode one word: in-order merge application with a substring
    * pre-check — `(a, b)` can only occur adjacently if `a + b` is a
    * substring of the word (symbol concatenation is invariant under
    * merging), so most of the merge list is skipped per word at the
    * cost of one `indexOf`. This is the REFERENCE implementation the
    * specs hold [[MergeIndex.encode]] equal to; the kernel uses the
    * index (same semantics, ~4-5× cheaper at 1k merges and growing
    * with table size — the pre-check is linear in it, the index
    * constant).
    */
  private[functions] def encodeWord(
      word: String, merges: IndexedSeq[(String, String)],
      symbolize: String => Array[String] = codePointSymbols): Array[String] = {
    var s = symbolize(word)
    var r = 0
    while (r < merges.length && s.length > 1) {
      val (a, b) = merges(r)
      if (word.contains(a + b)) s = applyMerge(s, a, b)
      r += 1
    }
    s
  }

  /** Merge table indexed by the boundary 2-gram of each merged string
    * (the UTF-16 code units either side of the `a|b` join). Any
    * occurrence of `a + b` in a word contains that 2-gram at offset
    * `|a| - 1`, so the merges applicable to a word are found by one
    * pass over its adjacent char pairs — bucket lookup + a full
    * `regionMatches` verification — instead of `numMerges` indexOf
    * calls (the linear pre-check measured 68 s for a 1M-doc encode
    * scan under a 1 000-merge table; the index ~15 s, same output).
    * Applicable ranks then apply IN ORDER — semantics identical to
    * [[encodeWord]] by construction (the candidate set is a superset
    * filter exactly like the indexOf pre-check; `applyMerge` no-ops
    * when the pair is not adjacent).
    */
  final class MergeIndex(
      val merges: IndexedSeq[(String, String)],
      val symbolWidth: Int = 1) extends Serializable {
    private val mergedStr: Array[String] = merges.iterator.map { case (a, b) => a + b }.toArray
    private val aChars: Array[Int] = merges.iterator.map(_._1.length).toArray
    private val buckets: java.util.HashMap[Int, Array[Int]] = {
      val tmp = new java.util.HashMap[Int, mutable.ArrayBuffer[Int]]()
      var r = 0
      while (r < merges.length) {
        val (a, b) = merges(r)
        val key = (a.charAt(a.length - 1).toInt << 16) | b.charAt(0).toInt
        var buf = tmp.get(key)
        if (buf == null) { buf = mutable.ArrayBuffer.empty[Int]; tmp.put(key, buf) }
        buf += r
        r += 1
      }
      val out = new java.util.HashMap[Int, Array[Int]](tmp.size * 2)
      tmp.forEach((k, v) => out.put(k, v.toArray))
      out
    }

    private def baseSymbols(word: String): Array[String] =
      if (symbolWidth == 1) codePointSymbols(word)
      else chunkSymbols(word, symbolWidth)

    def encode(word: String): Array[String] = {
      if (word.length < 2) return baseSymbols(word)
      var ranks: Array[Int] = null
      var nRanks = 0
      var seen: java.util.BitSet = null
      var i = 0
      while (i + 1 < word.length) {
        val bucket = buckets.get((word.charAt(i).toInt << 16) | word.charAt(i + 1).toInt)
        if (bucket != null) {
          var k = 0
          while (k < bucket.length) {
            val r = bucket(k)
            if (seen == null || !seen.get(r)) {
              val start = i - (aChars(r) - 1)
              val m = mergedStr(r)
              if (start >= 0 && start + m.length <= word.length &&
                  word.regionMatches(start, m, 0, m.length)) {
                if (seen == null) seen = new java.util.BitSet(merges.length)
                seen.set(r)
                if (ranks == null) ranks = new Array[Int](8)
                else if (nRanks == ranks.length) ranks = java.util.Arrays.copyOf(ranks, nRanks * 2)
                ranks(nRanks) = r
                nRanks += 1
              }
            }
            k += 1
          }
        }
        i += 1
      }
      var s = baseSymbols(word)
      if (nRanks > 0) {
        java.util.Arrays.sort(ranks, 0, nRanks)
        var j = 0
        while (j < nRanks && s.length > 1) {
          val (a, b) = merges(ranks(j))
          s = applyMerge(s, a, b)
          j += 1
        }
      }
      s
    }
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
    emitTokens: Boolean,
    byteLevel: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_encode requires a STRING column, got $t")
  }

  override def dataType: DataType =
    if (emitTokens) ArrayType(StringType, containsNull = false) else LongType

  @transient private lazy val mergeIndex =
    new Bpe.MergeIndex(merges.toIndexedSeq, symbolWidth = if (byteLevel) 2 else 1)
  @transient private lazy val pattern = java.util.regex.Pattern.compile(tokenPattern)

  // byte level: the merge table speaks hex-pair symbols, so the word
  // handed to the index (and memoized on) is the hex rendering; the
  // emitted tokens are hex strings — id-joinable against bpeVocabBytes
  private def tokensOf(
      m: java.util.HashMap[String, Array[String]], rawWord: String): Array[String] = {
    val word = if (byteLevel) Bpe.toHex(rawWord) else rawWord
    var t = m.get(word)
    if (t == null) {
      t = mergeIndex.encode(word)
      if (m.size() >= 65536) m.clear()
      m.put(word, t)
    }
    t
  }

  /** Kernel; public for the codegen `addReferenceObj` call. */
  def computeBpe(input: UTF8String): Any = {
    val cache = BpeEncodeExpr.cacheFor(mergeIndex)
    val m = pattern.matcher(input.toString)
    if (emitTokens) {
      val out = mutable.ArrayBuffer.empty[Any]
      while (m.find()) {
        val t = tokensOf(cache, m.group())
        var i = 0
        while (i < t.length) { out += UTF8String.fromString(t(i)); i += 1 }
      }
      new GenericArrayData(out.toArray)
    } else {
      var n = 0L
      while (m.find()) n += tokensOf(cache, m.group()).length
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

  /** Word→tokens memo, STATIC and keyed by [[Bpe.MergeIndex]]
    * IDENTITY (each expression instance deserializes exactly one
    * index per executor, and identical identity implies identical
    * merges — no fingerprint collision risk and the outer lookup is
    * an identity-hash get, not a merges-list hash). Thread-confined
    * via ThreadLocal (no locking across the executor-core pool) but
    * shared across expression INSTANCES: long-lived executor threads
    * no longer retain one map per defunct instance (the r8 advice) —
    * retention is bounded at `MaxIndexes` live indexes × 64k words
    * per thread, cleared wholesale on overflow.
    */
  private val MaxIndexes = 8
  private val caches: ThreadLocal[
      java.util.IdentityHashMap[Bpe.MergeIndex, java.util.HashMap[String, Array[String]]]] =
    ThreadLocal.withInitial(() =>
      new java.util.IdentityHashMap[Bpe.MergeIndex, java.util.HashMap[String, Array[String]]]())

  private[functions] def cacheFor(
      idx: Bpe.MergeIndex): java.util.HashMap[String, Array[String]] = {
    val outer = caches.get()
    var inner = outer.get(idx)
    if (inner == null) {
      if (outer.size() >= MaxIndexes) outer.clear()
      inner = new java.util.HashMap[String, Array[String]]()
      outer.put(idx, inner)
    }
    inner
  }

  /** Flat BPE token array for `text`. */
  def tokens(text: Column, merges: Seq[(String, String)], tokenPattern: String,
      byteLevel: Boolean = false): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new BpeEncodeExpr(expression(text), merges, tokenPattern,
      emitTokens = true, byteLevel = byteLevel))
  }

  /** Code-point symbolization as a codegen'd scan expression — the
    * distributed trainer's seed step (a row UDF here would drop the
    * whole seed scan out of whole-stage codegen).
    */
  def symbols(word: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(BpeSymbolsExpr(expression(word)))
  }

  /** One greedy merge pass over a symbol-array column — the
    * single-merge convenience form of [[batchStep]] (a one-element
    * batch; the r11 batch kernels superseded the dedicated
    * single-merge expressions). `merged` overrides the replacement
    * symbol (WordPiece strips the right side's continuation prefix);
    * None = plain `a + b`.
    */
  def mergeStep(syms: Column, a: String, b: String,
      merged: Option[String] = None): Column =
    batchStep(syms, Seq((a, b, merged.getOrElse(a + b))))

  /** Per-word pair-count deltas caused by merging `(a, b)` — empty
    * for unaffected words, so an `explode` over it emits work ONLY
    * for the words the merge touches. A one-element [[batchDelta]];
    * rows use the batch schema `(pa, pb, s, d)` with `s` always null.
    */
  def pairDelta(syms: Column, a: String, b: String,
      merged: Option[String] = None): Column =
    batchDelta(syms, Seq((a, b, merged.getOrElse(a + b))), withSymbols = false)

  /** Combined pair+symbol deltas of one merge in one scan — a
    * one-element [[batchDelta]] with symbol rows on.
    */
  def bothDelta(syms: Column, a: String, b: String,
      merged: Option[String] = None): Column =
    batchDelta(syms, Seq((a, b, merged.getOrElse(a + b))), withSymbols = true)

  private def validateBatch(merges: Seq[(String, String, String)]): Unit = {
    require(merges.nonEmpty, "batch must contain at least one merge")
    require(merges.forall { case (a, b, m) =>
      a.nonEmpty && b.nonEmpty && m.nonEmpty },
      "batch merge symbols must be non-empty")
  }

  /** Apply an ORDERED merge batch in one scan — see [[BpeBatchStepExpr]]. */
  def batchStep(syms: Column, merges: Seq[(String, String, String)]): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    validateBatch(merges)
    column(BpeBatchStepExpr(expression(syms), merges))
  }

  /** Pair (+ optionally symbol) deltas of an ORDERED merge batch in
    * one scan — see [[BpeBatchDeltaExpr]].
    */
  def batchDelta(syms: Column, merges: Seq[(String, String, String)],
      withSymbols: Boolean): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    validateBatch(merges)
    column(BpeBatchDeltaExpr(expression(syms), merges, withSymbols))
  }


  /** BPE token COUNT for `text` — no token strings materialize. */
  def count(text: Column, merges: Seq[(String, String)], tokenPattern: String,
      byteLevel: Boolean = false): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new BpeEncodeExpr(expression(text), merges, tokenPattern,
      emitTokens = false, byteLevel = byteLevel))
  }
}

/** [[Bpe.codePointSymbols]] as a codegen scan kernel:
  * `string → array<string>` of code-point symbols.
  */
case class BpeSymbolsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_symbols requires a STRING column, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** Kernel; public for the codegen `addReferenceObj` call. */
  def computeSymbols(input: UTF8String): ArrayData = {
    val syms = Bpe.codePointSymbols(input.toString)
    val out = new Array[Any](syms.length)
    var i = 0
    while (i < syms.length) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    computeSymbols(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeSymbols", this, classOf[BpeSymbolsExpr].getName)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.computeSymbols($c)")
  }
  override protected def withNewChildInternal(c: Expression): BpeSymbolsExpr =
    copy(child = c)
  override def prettyName: String = "bpe_symbols"
}




/** Shared machinery for the BATCH merge kernels: an ORDERED batch of
  * `(a, b, merged)` triples applied per word as sequential greedy
  * left-to-right [[Bpe.applyMerge]] passes. The batched trainers
  * select PROVABLY-independent merge prefixes (see
  * `TextFunctions.bpeTrainDistributed`), so one batch projection
  * replaces K single-merge rounds — K fewer synchronous Spark jobs,
  * the round-floor cure for 30k-merge production vocabularies.
  *
  * The kernel itself is order-faithful for ANY batch (a later merge
  * sees the earlier merges' rewrites), so its contract does not
  * depend on the trainer's disjointness proof. No-hit fast path: a
  * word containing none of the batch pairs is untouched (a pair that
  * only becomes adjacent AFTER an earlier batch merge applies implies
  * that earlier pair WAS present, so the any-pair pre-scan is sound).
  */
abstract class BpeBatchExprBase extends UnaryExpression {
  // NOTE: no `require` here — the base-class constructor runs before
  // the case subclass assigns `merges`, so a body-level require reads
  // null (and Java deserialization then fails with "unable to create
  // instance"). Validation lives in BpeEncodeExpr.batchStep/batchDelta.
  def merges: Seq[(String, String, String)]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<STRING>, got $t")
  }

  /** a-symbol → array of b-symbols of the batch (pre-scan index). */
  @transient protected lazy val pairIndex
      : java.util.HashMap[UTF8String, Array[UTF8String]] = {
    val m = new java.util.HashMap[UTF8String, Array[UTF8String]]()
    merges.groupBy(_._1).foreach { case (a, ms) =>
      m.put(UTF8String.fromString(a),
        ms.map(t => UTF8String.fromString(t._2)).toArray)
    }
    m
  }

  /** True iff any batch pair is adjacent in `arr`; enforces the
    * non-null symbol contract loud on the way (hit or not).
    */
  protected final def anyHit(arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    var hit = false
    while (!hit && i + 1 < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"$prettyName: null symbol at index $i — symbol arrays are non-null by contract")
      val bs = pairIndex.get(arr.getUTF8String(i))
      if (bs != null) {
        val nxt = arr.getUTF8String(i + 1)
        var k = 0
        while (!hit && k < bs.length) {
          hit = bs(k).equals(nxt)
          k += 1
        }
      }
      i += 1
    }
    if (!hit && n > 0 && arr.isNullAt(n - 1))
      throw new IllegalArgumentException(
        s"$prettyName: null symbol at index ${n - 1} — symbol arrays are non-null by contract")
    hit
  }

  protected final def decodeSyms(arr: ArrayData): Array[String] = {
    val n = arr.numElements()
    val out = new Array[String](n)
    var k = 0
    while (k < n) {
      if (arr.isNullAt(k)) throw new IllegalArgumentException(
        s"$prettyName: null symbol at index $k — symbol arrays are non-null by contract")
      out(k) = arr.getUTF8String(k).toString
      k += 1
    }
    out
  }

  protected final def applyAll(old: Array[String]): Array[String] = {
    var cur = old
    var j = 0
    while (j < merges.length) {
      val (a, b, m) = merges(j)
      cur = Bpe.applyMerge(cur, a, b, m)
      j += 1
    }
    cur
  }
}

/** The ordered-batch word rewrite — see [[BpeBatchExprBase]]. */
case class BpeBatchStepExpr(child: Expression,
    merges: Seq[(String, String, String)])
    extends BpeBatchExprBase {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** Kernel; public for the codegen `addReferenceObj` call. */
  def computeBatch(arr: ArrayData): ArrayData = {
    if (!anyHit(arr)) return arr
    val applied = applyAll(decodeSyms(arr))
    val out = new Array[Any](applied.length)
    var k = 0
    while (k < applied.length) {
      out(k) = UTF8String.fromString(applied(k)); k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    computeBatch(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeBatchStep", this, classOf[BpeBatchStepExpr].getName)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.computeBatch($c)")
  }
  override protected def withNewChildInternal(c: Expression): BpeBatchStepExpr =
    copy(child = c)
  override def prettyName: String = "bpe_batch_step"
}

/** Pair (and, with `withSymbols`, symbol) count deltas of an ORDERED
  * merge batch in ONE adjacency scan: `delta = counts(after all K
  * merges) − counts(before)` — identical to the telescoped sum of K
  * per-merge deltas, in one kernel invocation. Output rows use the
  * [[BpeBothDeltaExpr]] schema (`pa`/`pb` pair rows with `s` null;
  * symbol rows with `pa`/`pb` null); `withSymbols = false` emits pair
  * rows only (the plain-BPE trainer keeps no symbol table). Untouched
  * words return an EMPTY array — explode = the affected-words filter.
  */
case class BpeBatchDeltaExpr(child: Expression,
    merges: Seq[(String, String, String)],
    withSymbols: Boolean)
    extends BpeBatchExprBase {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pa", StringType, nullable = true),
      StructField("pb", StringType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("d", LongType, nullable = false))),
    containsNull = false)

  @transient private lazy val emptyResult = new GenericArrayData(Array.empty[Any])

  /** Kernel; public for the codegen `addReferenceObj` call. */
  def computeBatch(arr: ArrayData): ArrayData = {
    if (!anyHit(arr)) return emptyResult
    val old = decodeSyms(arr)
    val applied = applyAll(old)
    val pm = new java.util.LinkedHashMap[(String, String), Long]()
    val sm = new java.util.LinkedHashMap[String, Long]()
    var k = 0
    while (k < old.length) {
      if (withSymbols) sm.merge(old(k), -1L, (x, y) => x + y)
      if (k + 1 < old.length)
        pm.merge((old(k), old(k + 1)), -1L, (x, y) => x + y)
      k += 1
    }
    k = 0
    while (k < applied.length) {
      if (withSymbols) sm.merge(applied(k), 1L, (x, y) => x + y)
      if (k + 1 < applied.length)
        pm.merge((applied(k), applied(k + 1)), 1L, (x, y) => x + y)
      k += 1
    }
    val out = mutable.ArrayBuffer.empty[Any]
    pm.forEach { (key, d) =>
      if (d != 0L) {
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString(key._1), UTF8String.fromString(key._2), null, d))
      }
    }
    sm.forEach { (s, d) =>
      if (d != 0L) {
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](null, null, UTF8String.fromString(s), d))
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    computeBatch(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeBatchDelta", this, classOf[BpeBatchDeltaExpr].getName)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.computeBatch($c)")
  }
  override protected def withNewChildInternal(c: Expression): BpeBatchDeltaExpr =
    copy(child = c)
  override def prettyName: String = "bpe_batch_delta"
}
