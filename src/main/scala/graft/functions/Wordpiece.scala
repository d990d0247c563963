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

/** Char trie answering "longest vocab token starting at word[pos]" in
  * one descent. HashMap children — vocab size is tokenizer-scale
  * (tens of thousands), built once per executor.
  */
private[functions] final class WordpieceTrie(tokens: Seq[String]) {
  private final class Node {
    val children = new java.util.HashMap[Character, Node]()
    var terminal = false
  }
  private val root = new Node
  tokens.foreach { t =>
    var n = root
    var i = 0
    while (i < t.length) {
      var c = n.children.get(t.charAt(i))
      if (c == null) { c = new Node; n.children.put(t.charAt(i), c) }
      n = c
      i += 1
    }
    if (t.nonEmpty) n.terminal = true
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
}
