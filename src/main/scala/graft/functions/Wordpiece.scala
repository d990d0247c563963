package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first subword segmentation — the WordPiece /
  * MaxMatch ENCODE algorithm (Wu et al. 2016, GNMT §4.1; the
  * inference-time tokenizer of the BERT family, and with an empty
  * continuation prefix the classic maximal-munch dictionary
  * segmenter). Complements the [[Bpe]] family: BPE encodes by
  * replaying merge RANKS, WordPiece encodes by greedy longest VOCAB
  * match — given the same vocabulary they disagree exactly where a
  * locally-longest piece beats the merge order, which is why serving
  * stacks must pin ONE of them and why both belong in the library.
  *
  * Semantics (HF-compatible): scan the word left to right; at each
  * position take the LONGEST vocab token matching (continuation
  * positions — pos > 0 — match against `continuationPrefix`-marked
  * vocab entries); if NO token matches at some position the ENTIRE
  * word becomes one `unk` token (not a char skip — the standard
  * WordPiece failure mode). Greedy + longest is deterministic, which
  * makes the whole operator SQL-replayable: the gate oracle
  * precomputes the best-match length per (word, position) with plain
  * joins, then follows the successor chain with a recursive CTE.
  *
  * Scale shape: the vocab ships as strings in the serialized
  * expression; a per-executor lazy trie answers longest-match in
  * O(piece length); the expression is codegen-friendly (reference-obj
  * call, same as [[BlocklistCountExpr]]) and runs scan-side — apply
  * to the DISTINCT word table (the [[Bpe]] family's trick) so each
  * word segments once no matter how often it occurs.
  */
case class WordpieceExpr(
    child: Expression,
    vocab: Seq[String],
    continuationPrefix: String,
    unk: String) extends UnaryExpression {
  require(vocab.nonEmpty, "wordpiece requires a non-empty vocab")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordpiece requires a STRING column, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** (initial trie, continuation trie) — with an empty prefix both
    * point at the same structure.
    */
  @transient private lazy val tries: (WordpieceTrie, WordpieceTrie) = {
    val init = new WordpieceTrie(
      vocab.filterNot(_.startsWith(continuationPrefix) && continuationPrefix.nonEmpty))
    val cont =
      if (continuationPrefix.isEmpty) init
      else new WordpieceTrie(vocab.collect {
        case t if t.startsWith(continuationPrefix) =>
          t.substring(continuationPrefix.length)
      })
    (init, cont)
  }

  /** Kernel; public for the codegen reference-object call. Returns
    * the piece array (continuation pieces re-wearing their prefix).
    */
  def compute(input: UTF8String): GenericArrayData = {
    val word = input.toString
    if (word.isEmpty) return new GenericArrayData(Array.empty[Any])
    val (init, cont) = tries
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < word.length) {
      val trie = if (pos == 0) init else cont
      val len = trie.longestMatch(word, pos)
      if (len <= 0) {
        return new GenericArrayData(Array[Any](UTF8String.fromString(unk)))
      }
      val piece =
        if (pos == 0) word.substring(0, len)
        else continuationPrefix + word.substring(pos, pos + len)
      out += UTF8String.fromString(piece)
      pos += len
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpiece", this, classOf[WordpieceExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): WordpieceExpr =
    copy(child = c)
  override def prettyName: String = "wordpiece"
}

object WordpieceExpr {
  def apply(
      word: Column, vocab: Seq[String],
      continuationPrefix: String = "##", unk: String = "[UNK]"): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new WordpieceExpr(expression(word), vocab, continuationPrefix, unk))
  }
}

/** OPTIMAL lattice segmentation — Viterbi over the piece lattice with
  * uniform piece scores, i.e. the MINIMUM-piece-count segmentation
  * (the SentencePiece unigram decode of Kudo 2018, arXiv:1804.10959,
  * specialized to equal log-probs so the whole decode is
  * integer-exact and SQL-replayable). Complements [[WordpieceExpr]]'s
  * greedy MaxMatch: greedy commits to the locally longest piece and
  * can strand the tail (vocab {ab,cde,a,b,c,d,e}: greedy segments
  * "abcde" as ab|c|d|e — 4 pieces — where the lattice finds ab|cde),
  * so the pair measures exactly the compression a lattice decoder
  * buys over greedy at serving time.
  *
  * Determinism: among minimum-count segmentations, reconstruction
  * takes the LONGEST admissible piece at each position left to right
  * (two admissible pieces at one position have distinct lengths, so
  * the tie-break is total). If no segmentation covers the word the
  * ENTIRE word becomes `unk`, matching the WordPiece failure
  * convention. DP is O(len · maxPieceLen) per word over the
  * per-executor lazy trie; the expression is codegen-friendly
  * (reference-obj call) and runs scan-side — apply to the DISTINCT
  * word table so each word segments once.
  */
case class LatticeEncodeExpr(
    child: Expression,
    vocab: Seq[String],
    unk: String,
    costs: Seq[Long]) extends UnaryExpression {
  require(vocab.nonEmpty, "lattice_encode requires a non-empty vocab")
  require(costs.isEmpty || costs.length == vocab.length,
    s"lattice_encode: ${costs.length} costs for ${vocab.length} vocab tokens")
  require(costs.forall(c => c >= 0 && c < (1L << 39)),
    "lattice_encode: costs must be non-negative nano-nats < 2^39 " +
      "(ln-space: a cost of 2^39 nano-nats is e^549 — no finite corpus " +
      "produces it; the bound keeps eff·pieces overflow-free)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lattice_encode requires a STRING column, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** Effective integer cost per piece: `1024·cost + 1` folds the
    * piece-count tie-break INTO one Long objective — any total-cost
    * difference of ≥ 1 nano-nat (×1024 > the 1024-piece bound below)
    * dominates, equal-cost paths then prefer fewer pieces, and the
    * longest-first reconstruction settles what remains. With no costs
    * (all zero) the objective degenerates to exactly the
    * minimum-piece-count DP. The scored-mode length guard below is
    * 1024 = the 2^10 shift, so a path can never gain more than 2^10
    * extra pieces — any ≥1-nano-nat total-cost difference therefore
    * strictly dominates the tie-break (cost-dominance holds at the
    * guard boundary, not just typically).
    */
  @transient private lazy val trie: WordpieceTrie =
    new WordpieceTrie(
      vocab,
      if (costs.isEmpty) vocab.map(_ => 1L)
      else costs.map(c => (c << 10) + 1L))

  /** Kernel; public for the codegen reference-object call. */
  def compute(input: UTF8String): GenericArrayData = {
    val word = input.toString
    if (word.isEmpty) return new GenericArrayData(Array.empty[Any])
    val n = word.length
    // scored mode: eff < 2^49 + 1 per piece, ≤ 2^10 pieces → sums
    // < 2^59, and ≤ 2^10 pieces keeps the ×1024 cost fold dominant
    // over the piece-count tie-break (see the `trie` doc)
    require(n <= (if (costs.isEmpty) 1 << 20 else 1024),
      s"lattice_encode: ${n}-char input — chunk first (overflow-free, " +
        "tie-break-sound bound)")
    val INF = Long.MaxValue
    // suf(p) = min total effective cost covering word[p..n); backward DP
    val suf = new Array[Long](n + 1)
    java.util.Arrays.fill(suf, INF)
    suf(n) = 0L
    var pos = n - 1
    while (pos >= 0) {
      var best = INF
      trie.eachMatchCost(word, pos) { (l, eff) =>
        val c = suf(pos + l)
        if (c != INF && c + eff < best) best = c + eff
      }
      suf(pos) = best
      pos -= 1
    }
    if (suf(0) == INF)
      return new GenericArrayData(Array[Any](UTF8String.fromString(unk)))
    // forward reconstruction: longest piece continuing an optimal path
    // (eachMatchCost ascends in length, so the last admissible wins)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    pos = 0
    while (pos < n) {
      var bl = 0
      trie.eachMatchCost(word, pos) { (l, eff) =>
        if (suf(pos + l) != INF && suf(pos) == eff + suf(pos + l)) bl = l
      }
      out += UTF8String.fromString(word.substring(pos, pos + bl))
      pos += bl
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lattice", this, classOf[LatticeEncodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): LatticeEncodeExpr =
    copy(child = c)
  override def prettyName: String = "lattice_encode"
}

object LatticeEncodeExpr {
  def apply(
      word: Column, vocab: Seq[String],
      unk: String = "[UNK]", costs: Seq[Long] = Nil): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new LatticeEncodeExpr(expression(word), vocab, unk, costs))
  }
}

/** WordPiece TRAINING (Schuster & Nakajima 2012; Wu et al. 2016 §4.1;
  * the scoring convention of the HuggingFace `tokenizers`
  * WordpieceTrainer): identical merge mechanics to [[Bpe.train]] —
  * greedy left-to-right pair replacement over a `(word, count)`
  * vocabulary — but the best pair maximizes the LIKELIHOOD score
  * `count(ab) / (count(a) · count(b))` instead of the raw pair count,
  * where `count(x)` is the occurrence-weighted frequency of symbol
  * `x` under the CURRENT segmentation. Symbols follow the BERT
  * convention: a word's first code point is plain, every later one
  * wears the continuation prefix (`##`), and a merged token strips
  * the right side's prefix (`a + ##b → ab`, `##a + ##b → ##ab`) — so
  * the trained vocabulary feeds [[WordpieceExpr]]'s greedy
  * longest-match encoder directly.
  *
  * The arg-max is exact-integer: score comparison cross-multiplies
  * `c₁·ca₂·cb₂` vs `c₂·ca₁·cb₁` (BigInt — no float division anywhere
  * near the decision), ties broken by smallest `(a, b)` in
  * [[Bpe.cpCompare]] code-point order, so the whole train is
  * deterministic and SQL-replayable (the gate oracle replays each
  * stage's arg-max with a HUGEINT cross-multiplied anti-join).
  * Unlike raw-count BPE, a merge changes the scores of every pair
  * touching `a` or `b` (their symbol counts moved), so each round
  * re-scans the live pair table for the arg-max — pair counts and
  * symbol counts themselves update incrementally (only words
  * containing the merged pair are touched, the [[Bpe.train]]
  * complexity).
  */
object Wordpiece {

  /** Train `numMerges` likelihood-scored merges; returns
    * `(a, b, merged)` in learned order (fewer rows on pair
    * exhaustion). Pure driver code over the bounded vocab — the same
    * `maxWords` contract as [[Bpe.train]] applies upstream.
    */
  def train(
      wordCounts: Seq[(String, Long)],
      numMerges: Int,
      continuationPrefix: String = "##"): IndexedSeq[(String, String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val entries = wordCounts.iterator.filter(_._1.nonEmpty).toArray
    val symIds = new java.util.HashMap[String, Integer]()
    val symStrs = scala.collection.mutable.ArrayBuffer.empty[String]
    val symCount = scala.collection.mutable.ArrayBuffer.empty[Long]
    def idOf(s: String): Int = {
      var id = symIds.get(s)
      if (id == null) {
        id = Integer.valueOf(symStrs.length)
        symStrs += s
        symCount += 0L
        symIds.put(s, id)
      }
      id.intValue()
    }
    val syms: Array[Array[Int]] = entries.map { case (w, _) =>
      val cps = Bpe.codePointSymbols(w)
      val out = new Array[Int](cps.length)
      var i = 0
      while (i < cps.length) {
        out(i) = idOf(if (i == 0) cps(i) else continuationPrefix + cps(i))
        i += 1
      }
      out
    }
    val cnts = entries.map(_._2)

    @inline def key(a: Int, b: Int): Long = (a.toLong << 32) | (b.toLong & 0xffffffffL)
    val pairCount = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    val pairWords = new java.util.HashMap[java.lang.Long, Bpe.IntList]()
    def addPair(a: Int, b: Int, c: Long, wi: Int): Unit = {
      val k = java.lang.Long.valueOf(key(a, b))
      pairCount.merge(k, java.lang.Long.valueOf(c), (x, y) => x + y)
      var l = pairWords.get(k)
      if (l == null) { l = new Bpe.IntList; pairWords.put(k, l) }
      l.add(wi)
    }
    def subPair(a: Int, b: Int, c: Long): Unit = {
      val k = java.lang.Long.valueOf(key(a, b))
      val cur = pairCount.get(k)
      if (cur != null) pairCount.put(k, java.lang.Long.valueOf(cur.longValue() - c))
    }

    var wi = 0
    while (wi < syms.length) {
      val s = syms(wi)
      val c = cnts(wi)
      var k = 0
      while (k < s.length) {
        symCount(s(k)) += c
        if (k + 1 < s.length) addPair(s(k), s(k + 1), c, wi)
        k += 1
      }
      wi += 1
    }

    // candidate1 strictly better than candidate2 under the likelihood
    // score, ties by smallest (a, b) in code-point order. Double
    // prefilter with a wide margin (each side's relative FP error is
    // ~4e-16); BigInt cross-multiplication decides anything closer.
    def beats(k1: Long, c1: Long, k2: Long, c2: Long): Boolean = {
      val a1 = (k1 >>> 32).toInt; val b1 = k1.toInt
      val a2 = (k2 >>> 32).toInt; val b2 = k2.toInt
      val ca1 = symCount(a1); val cb1 = symCount(b1)
      val ca2 = symCount(a2); val cb2 = symCount(b2)
      val d1 = c1.toDouble / (ca1.toDouble * cb1.toDouble)
      val d2 = c2.toDouble / (ca2.toDouble * cb2.toDouble)
      if (d1 > d2 * (1.0 + 1e-9)) return true
      if (d2 > d1 * (1.0 + 1e-9)) return false
      val x1 = BigInt(c1) * BigInt(ca2) * BigInt(cb2)
      val x2 = BigInt(c2) * BigInt(ca1) * BigInt(cb1)
      if (x1 != x2) return x1 > x2
      val a = Bpe.cpCompare(symStrs(a1), symStrs(a2))
      if (a != 0) return a < 0
      Bpe.cpCompare(symStrs(b1), symStrs(b2)) < 0
    }

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    var it = 0
    var exhausted = false
    while (it < numMerges && !exhausted) {
      // arg-max scan over live pairs (scores shift globally each
      // round — a BPE-style lazy heap can't memoize them)
      var bestKey = -1L
      var bestC = 0L
      val itEntries = pairCount.entrySet().iterator()
      while (itEntries.hasNext) {
        val e = itEntries.next()
        val c = e.getValue.longValue()
        if (c <= 0L) itEntries.remove()
        else if (bestKey == -1L || beats(e.getKey.longValue(), c, bestKey, bestC)) {
          bestKey = e.getKey.longValue()
          bestC = c
        }
      }
      if (bestKey == -1L) exhausted = true
      else {
        val a = (bestKey >>> 32).toInt
        val b = bestKey.toInt
        val sa = symStrs(a)
        val sb = symStrs(b)
        val merged =
          if (continuationPrefix.nonEmpty && sb.startsWith(continuationPrefix))
            sa + sb.substring(continuationPrefix.length)
          else sa + sb
        merges += ((sa, sb, merged))
        val mergedId = idOf(merged)
        val ids = pairWords.remove(java.lang.Long.valueOf(bestKey))
        pairCount.remove(java.lang.Long.valueOf(bestKey))
        var x = 0
        while (ids != null && x < ids.n) {
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
            while (k < old.length) {
              symCount(old(k)) -= c
              if (k + 1 < old.length) subPair(old(k), old(k + 1), c)
              k += 1
            }
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
            while (k < trimmed.length) {
              symCount(trimmed(k)) += c
              if (k + 1 < trimmed.length) addPair(trimmed(k), trimmed(k + 1), c, i)
              k += 1
            }
            syms(i) = trimmed
          }
          x += 1
        }
      }
      it += 1
    }
    merges.toIndexedSeq
  }

  /** [[train]] plus the encoder-ready vocabulary: base symbols (every
    * stage-0 symbol of the vocabulary — initial code points and
    * `##`-marked continuations — in code-point order) followed by the
    * merged tokens in rank order (first formation wins, base-block
    * members skipped). Feed the token list straight to
    * [[WordpieceExpr]].
    */
  def trainWithVocab(
      wordCounts: Seq[(String, Long)],
      numMerges: Int,
      continuationPrefix: String = "##"): (IndexedSeq[(String, String, String)], IndexedSeq[String]) = {
    val merges = train(wordCounts, numMerges, continuationPrefix)
    val base = wordCounts.iterator.filter(_._1.nonEmpty).flatMap { case (w, _) =>
      Bpe.codePointSymbols(w).zipWithIndex.map { case (c, i) =>
        if (i == 0) c else continuationPrefix + c
      }
    }.toSet.toIndexedSeq.sortWith((a, b) => Bpe.cpCompare(a, b) < 0)
    val baseSet = base.toSet
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    merges.foreach { case (_, _, m) => if (!baseSet.contains(m)) seen += m }
    (merges, base ++ seen.toIndexedSeq)
  }
}

/** Char trie answering "longest vocab token starting at word[pos]" in
  * one descent. HashMap children — vocab size is tokenizer-scale
  * (tens of thousands), built once per executor. The optional
  * `tokenCosts` (aligned with `tokens`) ride the terminal nodes for
  * the scored-lattice descent; absent = 0.
  */
private[functions] final class WordpieceTrie(
    tokens: Seq[String], tokenCosts: Seq[Long] = Nil) {
  require(tokenCosts.isEmpty || tokenCosts.length == tokens.length,
    "one cost per token (or none)")
  private final class Node {
    val children = new java.util.HashMap[Character, Node]()
    var terminal = false
    var cost = 0L
  }
  private val root = new Node
  tokens.zipWithIndex.foreach { case (t, ti) =>
    var n = root
    var i = 0
    while (i < t.length) {
      var c = n.children.get(t.charAt(i))
      if (c == null) { c = new Node; n.children.put(t.charAt(i), c) }
      n = c
      i += 1
    }
    if (t.nonEmpty) {
      n.terminal = true
      if (tokenCosts.nonEmpty) n.cost = tokenCosts(ti)
    }
  }

  /** Length of the longest token matching word[pos..); 0 if none. */
  def longestMatch(word: String, pos: Int): Int = {
    var n = root
    var i = pos
    var best = 0
    while (i < word.length) {
      n = n.children.get(word.charAt(i))
      if (n == null) return best
      i += 1
      if (n.terminal) best = i - pos
    }
    best
  }

  /** Invoke `f(len)` for EVERY vocab token matching word[pos..), in
    * ascending length order — one descent, same cost as
    * [[longestMatch]].
    */
  def eachMatch(word: String, pos: Int)(f: Int => Unit): Unit = {
    var n = root
    var i = pos
    while (i < word.length) {
      n = n.children.get(word.charAt(i))
      if (n == null) return
      i += 1
      if (n.terminal) f(i - pos)
    }
  }

  /** [[eachMatch]] carrying each token's cost. */
  def eachMatchCost(word: String, pos: Int)(f: (Int, Long) => Unit): Unit = {
    var n = root
    var i = pos
    while (i < word.length) {
      n = n.children.get(word.charAt(i))
      if (n == null) return
      i += 1
      if (n.terminal) f(i - pos, n.cost)
    }
  }
}

/** Per-word EXPECTED piece counts under a unigram LM — the E-step of
  * Kudo 2018's soft EM (arXiv:1804.10959 §3.2): forward-backward over
  * the segmentation lattice, where a segmentation's probability is
  * proportional to the product of its pieces' probabilities. Emits
  * `array<struct<tid int, e double>>` — `tid` the vocab index,
  * `e = E[count(piece) | word]` = the sum of edge posteriors
  * `exp(α(i) + logp + β(j) − α(n))` over that piece's lattice edges.
  * Log-space with streaming log-sum-exp, so a 1000-piece word cannot
  * underflow. Unreachable (UNK) words emit an EMPTY array — the
  * caller decides whether that is an error (the trainer seeds all
  * single characters precisely so it never happens).
  *
  * Float caveat, by design: expected counts are IEEE doubles and the
  * downstream aggregation's summation order is partition-dependent —
  * this kernel backs the SOFT trainer (`TextFunctions.
  * unigramTrainSoft`), whose gate compares at milli-nat granularity;
  * the bit-exact cross-engine path is the HARD variant
  * (`unigramTrain` / [[LatticeEncodeExpr]]).
  */
case class LatticeExpectExpr(
    child: Expression,
    vocab: Seq[String],
    logProbs: Seq[Double]) extends UnaryExpression {
  require(vocab.nonEmpty, "lattice_expect requires a non-empty vocab")
  require(logProbs.length == vocab.length,
    s"lattice_expect: ${logProbs.length} log-probs for ${vocab.length} vocab tokens")
  require(logProbs.forall(lp => lp <= 0.0 && !lp.isNaN),
    "lattice_expect: log-probs must be finite and <= 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lattice_expect requires a STRING column, got $t")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tid", IntegerType, nullable = false),
      StructField("e", DoubleType, nullable = false))),
    containsNull = false)

  @transient private lazy val index: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    vocab.zipWithIndex.foreach { case (t, i) => m.put(t, i) }
    m
  }
  @transient private lazy val maxLen: Int = vocab.map(_.length).max
  @transient private lazy val lp: Array[Double] = logProbs.toArray
  @transient private lazy val empty = new GenericArrayData(Array.empty[Any])

  // streaming log-sum-exp accumulate: acc ⊕ x in log space
  private def lse(acc: Double, x: Double): Double =
    if (acc == Double.NegativeInfinity) x
    else if (x == Double.NegativeInfinity) acc
    else if (acc >= x) acc + math.log1p(math.exp(x - acc))
    else x + math.log1p(math.exp(acc - x))

  /** Kernel; public for the codegen `addReferenceObj` call. */
  def computeExpect(input: UTF8String): GenericArrayData = {
    val word = input.toString
    val n = word.length
    if (n == 0) return empty
    require(n <= (1 << 16),
      s"lattice_expect: ${n}-char input — chunk first")
    val NEG = Double.NegativeInfinity
    // forward: alpha(j) = log Σ_paths prob(word[0..j))
    val alpha = Array.fill(n + 1)(NEG)
    alpha(0) = 0.0
    var i = 0
    while (i < n) {
      if (alpha(i) != NEG) {
        var l = 1
        val lim = math.min(maxLen, n - i)
        while (l <= lim) {
          val tid = index.getOrDefault(word.substring(i, i + l), -1)
          if (tid >= 0) alpha(i + l) = lse(alpha(i + l), alpha(i) + lp(tid))
          l += 1
        }
      }
      i += 1
    }
    if (alpha(n) == NEG) return empty // UNK word: no segmentation
    // backward: beta(i) = log Σ_paths prob(word[i..n))
    val beta = Array.fill(n + 1)(NEG)
    beta(n) = 0.0
    i = n - 1
    while (i >= 0) {
      var l = 1
      val lim = math.min(maxLen, n - i)
      while (l <= lim) {
        if (beta(i + l) != NEG) {
          val tid = index.getOrDefault(word.substring(i, i + l), -1)
          if (tid >= 0) beta(i) = lse(beta(i), lp(tid) + beta(i + l))
        }
        l += 1
      }
      i -= 1
    }
    // edge posteriors, accumulated per piece id
    val acc = new java.util.HashMap[Integer, java.lang.Double]()
    i = 0
    while (i < n) {
      if (alpha(i) != NEG) {
        var l = 1
        val lim = math.min(maxLen, n - i)
        while (l <= lim) {
          if (beta(i + l) != NEG) {
            val tid = index.getOrDefault(word.substring(i, i + l), -1)
            if (tid >= 0) {
              val post = math.exp(alpha(i) + lp(tid) + beta(i + l) - alpha(n))
              acc.merge(tid, post, (a, b) => a + b)
            }
          }
          l += 1
        }
      }
      i += 1
    }
    // deterministic emission order: ascending token id
    val ids = new Array[Int](acc.size())
    val it = acc.keySet().iterator()
    var k = 0
    while (it.hasNext) { ids(k) = it.next(); k += 1 }
    java.util.Arrays.sort(ids)
    val out = new Array[Any](ids.length)
    k = 0
    while (k < ids.length) {
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](ids(k), acc.get(ids(k)).doubleValue()))
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    computeExpect(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("latticeExpect", this, classOf[LatticeExpectExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.computeExpect($c)")
  }
  override protected def withNewChildInternal(c: Expression): LatticeExpectExpr =
    copy(child = c)
  override def prettyName: String = "lattice_expect"
}

object LatticeExpectExpr {
  def apply(word: Column, vocab: Seq[String], logProbs: Seq[Double]): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(new LatticeExpectExpr(expression(word), vocab, logProbs))
  }
}
