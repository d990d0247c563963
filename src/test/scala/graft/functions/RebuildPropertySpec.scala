package graft.functions

import graft.SparkSpec

import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized reference-model tests for the text-rebuild operators:
  * dedupLines and removeDuplicatedSpans are replayed by plain-Scala
  * models over small random corpora (deterministic seeds), so the
  * distributed formulations are checked against an implementation
  * with no shared code and no shared failure modes.
  */
class RebuildPropertySpec extends SparkSpec {
  import spark.implicits._

  // tiny vocab + short docs force plenty of collisions/repeats
  private def randomCorpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = Array("a", "bb", "ccc", "dd", "e")
    (0 until nDocs).map { i =>
      val nLines = rnd.nextInt(4) // 0..3
      val text = (0 until nLines).map { _ =>
        if (rnd.nextInt(6) == 0) "" // blank line
        else (0 until (1 + rnd.nextInt(3)))
          .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }.mkString("\n")
      (i.toLong, text)
    }
  }

  private def refDedupLines(corpus: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val seen = scala.collection.mutable.Set.empty[String]
    // global (id, pos) order IS ascending corpus order here
    corpus.sortBy(_._1).map { case (id, text) =>
      val lines = text.split("\n", -1)
      val kept = lines.zipWithIndex.filter { case (l, _) =>
        l.trim.isEmpty || seen.add(l.trim)
      }.map(_._1)
      id -> ((lines.length.toLong, (lines.length - kept.length).toLong,
        kept.mkString("\n")))
    }.toMap
  }

  test("dedupLines matches a sequential reference over random corpora") {
    for (seed <- 1L to 5L) {
      val corpus = randomCorpus(seed, 40)
      val got = Curation.dedupLines(corpus.toDF("doc_id", "text"), "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == refDedupLines(corpus), s"seed=$seed")
    }
  }

  private def refRemoveSpans(
      corpus: Seq[(Long, String)], n: Int, minDocs: Int): Map[Long, (Long, Long, String)] = {
    def toks(t: String): Array[String] = HashUtil.tokens(t)
    val gramDocs = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    for ((id, text) <- corpus; ws = toks(text); i <- 0 to ws.length - n)
      gramDocs.getOrElseUpdate(ws.slice(i, i + n).mkString(" "),
        scala.collection.mutable.Set.empty) += id
    val dup = gramDocs.filter(_._2.size >= minDocs).keySet
    corpus.map { case (id, text) =>
      val ws = toks(text)
      val drop = Array.fill(ws.length)(false)
      for (i <- 0 to ws.length - n
           if dup.contains(ws.slice(i, i + n).mkString(" "));
           j <- i until i + n) drop(j) = true
      val kept = ws.zipWithIndex.filterNot(p => drop(p._2)).map(_._1)
      id -> ((ws.length.toLong, drop.count(identity).toLong, kept.mkString(" ")))
    }.toMap
  }

  test("removeDuplicatedSpans matches a sequential reference over random corpora") {
    // longer docs over a tiny vocab so 3-grams repeat across docs
    for (seed <- 1L to 5L) {
      val rnd = new Random(seed)
      val vocab = Array("a", "bb", "ccc", "dd", "e", "ff", "g")
      val corpus = (0 until 30).map { i =>
        val len = rnd.nextInt(10) // 0..9 tokens
        (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val got = Dedup.removeDuplicatedSpans(
          corpus.toDF("doc_id", "text"), "doc_id", "text", n = 3, minDocs = 2)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == refRemoveSpans(corpus, 3, 2), s"seed=$seed")
    }
  }
}
