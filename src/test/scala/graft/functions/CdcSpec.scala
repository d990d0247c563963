package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CDC kernel vs a DIRECT (non-incremental) polynomial replay, the
  * shift-resilience property that is the whole point of
  * content-defined (vs fixed-stride) chunking, and the greedy
  * min/max-bounded form.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val B = 257L
  private val M = 1000000007L

  /** Direct replay: window hash from the polynomial definition at
    * every end position, greedy min/max cuts, md5-lower-64 chunks.
    */
  private def naiveChunks(
      text: String, w: Int, d: Int,
      minLen: Int = 1, maxLen: Int = Int.MaxValue): Seq[(Int, Int, Long)] = {
    val cps = text.codePoints().toArray
    val n = cps.length
    if (n == 0) return Seq.empty
    def h(endIdx: Int): Long = // 0-based inclusive end, window full
      (0 until w).map(j => cps(endIdx - j) % M * powMod(j) % M).sum % M
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var last = -1
    for (i <- 0 until n) {
      val winFull = i >= w - 1
      val since = i - last
      if ((winFull && h(i) % d == 0 && since >= minLen) || since >= maxLen) {
        cuts += i
        last = i
      }
    }
    val bounds = (-1 +: cuts.toSeq) :+ (n - 1)
    bounds.sliding(2).collect { case Seq(a, b) if b > a =>
      val s = new java.lang.StringBuilder
      (a + 1 to b).foreach(k => s.appendCodePoint(cps(k)))
      (a + 2, b - a, HashUtil.md5Lower64(s.toString)) // 1-based start
    }.toSeq.distinct
  }

  private def powMod(j: Int): Long = {
    var p = 1L
    (0 until j).foreach(_ => p = p * B % M)
    p
  }

  private def engine(
      texts: Seq[(Long, String)], w: Int = 16, d: Int = 64,
      minLen: Int = 1, maxLen: Int = Int.MaxValue): Map[Long, Seq[(Int, Int, Long)]] =
    Cdc.chunks(texts.toDF("doc_id", "text"), "doc_id", "text", w, d, minLen, maxLen)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), (r.getInt(2), r.getInt(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("chunks equal the direct polynomial replay on seeded random text") {
    val rnd = new scala.util.Random(23)
    val texts = (1L to 20L).map(i =>
      (i, (1 to 100 + rnd.nextInt(400)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString))
    val got = engine(texts, w = 8, d = 16)
    for ((id, t) <- texts)
      assert(got(id) == naiveChunks(t, 8, 16), s"doc $id")
    // lengths tile the doc exactly
    for ((id, t) <- texts)
      assert(got(id).map(_._2).sum == t.length, s"doc $id tiling")
  }

  test("shift resilience: a prefix insertion leaves later chunk hashes intact") {
    val rnd = new scala.util.Random(41)
    val body = (1 to 3000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shifted = "zzzzzzz" + body // 7-cp insertion, not a multiple of anything
    val got = engine(Seq((1L, body), (2L, shifted)), w = 8, d = 16)
    val h1 = got(1L).map(_._3).toSet
    val h2 = got(2L).map(_._3).toSet
    // all but the first chunk(s) re-align: the overlap must dominate
    val shared = h1.intersect(h2).size
    assert(shared >= h1.size - 2,
      s"CDC must re-align after an insertion: shared=$shared of ${h1.size}")
  }

  test("min/max bounds replay the greedy semantics; degenerate cases") {
    val rnd = new scala.util.Random(7)
    val texts = (1L to 10L).map(i =>
      (i, (1 to 300).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString))
    val got = engine(texts, w = 8, d = 8, minLen = 20, maxLen = 60)
    for ((id, t) <- texts) {
      val want = naiveChunks(t, 8, 8, minLen = 20, maxLen = 60)
      assert(got(id) == want, s"doc $id")
      val lens = got(id).map(_._2)
      assert(lens.init.forall(l => l >= 20 && l <= 60), s"doc $id bounds: $lens")
    }
    // empty text -> no rows; short text -> single remainder chunk
    val edge = engine(Seq((1L, ""), (2L, "abc")), w = 8, d = 16)
    assert(!edge.contains(1L))
    assert(edge(2L) == Seq((1, 3, HashUtil.md5Lower64("abc"))))
  }

  test("binary form == text form on ASCII (code points == bytes == hash input)") {
    val rnd = new scala.util.Random(59)
    val texts = (1L to 15L).map(i =>
      (i, (1 to 200 + rnd.nextInt(200)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString))
    val asText = Cdc.chunks(texts.toDF("doc_id", "text"), "doc_id", "text",
        window = 8, divisor = 16)
      .orderBy("doc_id", "chunk_idx").collect().map(_.toSeq).toSeq
    val asBytes = Cdc.chunksBinary(
        texts.map { case (i, t) => (i, t.getBytes("UTF-8")) }.toDF("doc_id", "bin"),
        "doc_id", "bin", window = 8, divisor = 16)
      .orderBy("doc_id", "chunk_idx").collect().map(_.toSeq).toSeq
    assert(asText == asBytes)
    // non-ASCII blob: still tiles exactly in BYTE offsets
    val blob = Array.tabulate[Byte](500)(i => ((i * 131 + 7) % 256 - 128).toByte)
    val chunks = Cdc.chunksBinary(Seq((1L, blob)).toDF("id", "b"), "id", "b",
        window = 8, divisor = 16)
      .orderBy("chunk_idx").collect()
    assert(chunks.map(_.getInt(3)).sum == 500)
    assert(chunks.head.getInt(2) == 1)
  }

  test("sharedBlocks surfaces a planted cross-doc paragraph") {
    val rnd = new scala.util.Random(13)
    def rand(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val para = rand(800)
    val docs = Seq(
      (1L, rand(500) + para + rand(300)),
      (2L, rand(200) + para + rand(600)),
      (3L, rand(1500)))
    val shared = Cdc.sharedBlocks(docs.toDF("doc_id", "text"), "doc_id", "text",
        window = 8, divisor = 16)
      .collect()
    assert(shared.nonEmpty, "the planted paragraph must surface as shared blocks")
    assert(shared.forall(_.getLong(1) >= 2))
  }
}
