package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training + encode: golden merges (independently verified
  * against a DuckDB chained-replace run AND a from-scratch Python
  * reference during oracle design), greedy-overlap semantics,
  * tie-breaks, early exhaustion, and kernel == chained-replace
  * equality on randomized words (the exact contract the q_bpe_*
  * oracles rely on).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val foxDocs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "pack my box with five dozen liquor jugs",
    "the jugs of liquor belong to the lazy fox")

  // verified cross-engine golden (DuckDB chained-CTE == Python ref)
  private val foxGolden = Seq(
    (0L, "t", "h", "th"), (1L, "th", "e", "the"), (2L, "o", "x", "ox"),
    (3L, "q", "u", "qu"), (4L, "a", "z", "az"), (5L, "az", "y", "azy"),
    (6L, "c", "k", "ck"), (7L, "d", "o", "do"))

  test("bpeTrain matches the cross-engine golden merges") {
    val df = foxDocs.toDF("text")
    val got = TextFunctions.bpeTrain(df, "text", numMerges = 8)
      .orderBy("rank").as[(Long, String, String, String)].collect().toSeq
    assert(got == foxGolden)
  }

  test("greedy left-to-right non-overlap: aaa merges once per pass") {
    // [a,a,a] -> merge (a,a) -> [aa, a]; next best pair is (aa, a)
    val m = Bpe.train(Seq(("aaa", 10L)), 3)
    assert(m == Seq(("a", "a"), ("aa", "a")))
    assert(Bpe.encodeWord("aaa", m.toIndexedSeq).toSeq == Seq("aaa"))
    // [a,a,a,a] under merge (a,a) -> [aa, aa], then (aa,aa) -> [aaaa]
    val m4 = Bpe.train(Seq(("aaaa", 10L)), 2)
    assert(m4 == Seq(("a", "a"), ("aa", "aa")))
  }

  test("tie-break is (count desc, a asc, b asc) in code-point order") {
    // pairs (b,c) and (a,b) both appear once; (a,b) wins the tie
    val m = Bpe.train(Seq(("abc", 1L)), 1)
    assert(m == Seq(("a", "b")))
    // count dominates: (x,y) twice beats (a,b) once
    val m2 = Bpe.train(Seq(("xy", 2L), ("ab", 1L)), 1)
    assert(m2 == Seq(("x", "y")))
  }

  test("pair supply exhaustion stops early with fewer rows") {
    val m = Bpe.train(Seq(("ab", 5L)), 10)
    assert(m == Seq(("a", "b"))) // after the merge no adjacent pair remains
    val df = Seq("ab ab ab").toDF("text")
    assert(TextFunctions.bpeTrain(df, "text", numMerges = 10).count() == 1L)
  }

  test("minCount floors the vocab; maxWords fails loud") {
    val df = Seq("aa aa aa zz").toDF("text")
    // zz appears once -> dropped by minCount=2; only (a,a) trainable
    val m = TextFunctions.bpeTrain(df, "text", 5, minCount = 2L)
      .select("a", "b").as[(String, String)].collect().toSeq
    assert(m == Seq(("a", "a")))
    val e = intercept[IllegalArgumentException] {
      TextFunctions.bpeTrain(df, "text", 2, maxWords = 1)
    }
    assert(e.getMessage.contains("maxWords"))
  }

  /** Naive chained-replace reference — the oracle's algebra verbatim:
    * each symbol wrapped in TWO distinct separators, one plain string
    * replace per merge. Two separators, not one: with only a trailing
    * separator the pattern `ab·b·` suffix-matches inside `[cab, b]`
    * and merges a symbol SUFFIX — the leading separator anchors the
    * match at a symbol boundary, and because adjacent matches share
    * no characters, left-to-right non-overlapping replace = the
    * greedy merge scan exactly.
    */
  private def chainedReplace(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val s1 = '\u0002'
    val s2 = '\u001f'
    var s = word.map(c => s"$s1$c$s2").mkString
    merges.foreach { case (a, b) =>
      s = s.replace(s"$s1$a$s2$s1$b$s2", s"$s1$a$b$s2")
    }
    s.split(s2).toSeq.map(_.stripPrefix(s1.toString)).filter(_.nonEmpty)
  }

  test("encodeWord == chained separator-replace on randomized words") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcd"
    val words = Seq.fill(300)(
      (1 to (1 + rnd.nextInt(12))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val corpus = words.mkString(" ")
    val merges = Bpe.train(
      words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq, 20)
    assert(merges.size == 20, "corpus must support 20 merges for this test")
    words.distinct.foreach { w =>
      val kernel = Bpe.encodeWord(w, merges).toSeq
      val ref = chainedReplace(w, merges)
      assert(kernel == ref, s"word $w: kernel $kernel vs chained-replace $ref")
      assert(kernel.mkString == w, "token concatenation must reproduce the word")
    }
    // and the Column kernel agrees end-to-end (codegen path)
    val got = Seq(corpus).toDF("text")
      .select(BpeEncodeExpr.count(col("text"), merges, "[a-z]+").as("n"))
      .as[Long].head()
    val want = words.map(w => chainedReplace(w, merges).size.toLong).sum
    assert(got == want)
  }

  /** From-scratch reference trainer: recount ALL pairs every
    * iteration (the oracle's algebra) — guards the incremental
    * pair-stat + lazy-deletion-heap machinery in Bpe.train.
    */
  private def naiveTrain(wc: Seq[(String, Long)], k: Int): Seq[(String, String)] = {
    var vocab = wc.filter(_._1.nonEmpty).map { case (w, c) => (w.map(_.toString).toArray, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < k && !done) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (s, c) =>
        s.sliding(2).filter(_.length == 2).foreach(p =>
          pc.updateWith((p(0), p(1)))(cur => Some(cur.getOrElse(0L) + c)))
      }
      if (pc.isEmpty) done = true
      else {
        val best = pc.keys.minBy(identity)(Ordering.fromLessThan[(String, String)] { (x, y) =>
          val cx = pc(x); val cy = pc(y)
          if (cx != cy) cx > cy
          else {
            val d = Bpe.cpCompare(x._1, y._1)
            d < 0 || (d == 0 && Bpe.cpCompare(x._2, y._2) < 0)
          }
        })
        out += best
        vocab = vocab.map { case (s, c) => (Bpe.applyMerge(s, best._1, best._2), c) }
        i += 1
      }
    }
    out.toSeq
  }

  test("incremental heap trainer == from-scratch recount trainer (randomized)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val alpha = if (seed % 2 == 0) "ab" else "abc" // tiny alphabets stress re-formed tokens
      val words = (1 to 120).map(_ =>
        (1 to (1 + rnd.nextInt(10))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      val wc = words.groupBy(identity).map { case (w, g) => (w, g.size.toLong * (1 + rnd.nextInt(5))) }.toSeq
      val fast = Bpe.train(wc, 30)
      val slow = naiveTrain(wc, 30)
      assert(fast == slow, s"seed $seed: heap trainer diverged from recount trainer")
    }
  }

  test("bpeTrainDistributed == driver bpeTrain: identical merge tables (randomized)") {
    // tiny alphabets force count ties and re-formed tokens — the cases
    // where a tie-break or collation divergence between the driver
    // heap loop and the distributed argmax would surface; pinEvery=3
    // exercises both the pinned and the lazily-chained round paths
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(100 + seed)
      val alpha = if (seed % 2 == 0) "ab" else "abcd"
      val docs = (1 to 60).map { i =>
        (i.toLong, (1 to (3 + rnd.nextInt(8))).map(_ =>
          (1 to (1 + rnd.nextInt(7))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
          .mkString(" "))
      }.toDF("doc_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("rank").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
      val drv = rows(TextFunctions.bpeTrain(docs, "text", numMerges = 25))
      val dist = rows(TextFunctions.bpeTrainDistributed(
        docs, "text", numMerges = 25, pinEvery = 3))
      assert(dist == drv, s"seed $seed: distributed trainer diverged from driver loop")
    }
  }

  test("wordpieceTrainDistributed == driver Wordpiece.train: identical merge tables (randomized)") {
    // same tie-heavy fixtures as the BPE equivalence test — plus the
    // likelihood score's extra failure surface: symbol-count deltas,
    // the ##-stripped merged symbol, and the double-margin candidate
    // set feeding the exact BigInt arg-max
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(300 + seed)
      val alpha = if (seed % 2 == 0) "ab" else "abcd"
      val docs = (1 to 60).map { i =>
        (i.toLong, (1 to (3 + rnd.nextInt(8))).map(_ =>
          (1 to (1 + rnd.nextInt(7))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
          .mkString(" "))
      }.toDF("doc_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("rank").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
      val drv = rows(TextFunctions.wordpieceTrain(docs, "text", numMerges = 20))
      val dist = rows(TextFunctions.wordpieceTrainDistributed(
        docs, "text", numMerges = 20, pinEvery = 3))
      assert(dist == drv, s"seed $seed: distributed WordPiece diverged from driver loop")
    }
  }

  test("wordpieceTrainDistributed: continuation algebra and exhaustion match the driver") {
    // "abc" x 5: round 1 must merge (##b, ##c) -> ##bc (the tie-break
    // case WordpieceSpec pins on the driver), round 2 (a, ##bc) -> abc,
    // then exhaustion
    val docs = Seq((1L, "abc abc abc abc abc")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSeq
    val dist = rows(TextFunctions.wordpieceTrainDistributed(docs, "text", numMerges = 5))
    assert(dist == Seq(("##b", "##c", "##bc"), ("a", "##bc", "abc")), s"got $dist")
  }

  test("saveTokenizer/load round trip: reloaded artifacts encode identically") {
    val docs = foxDocs.toDF("text")
    val (mergesDf, vocabDf) = TextFunctions.bpeTrainWithVocab(docs, "text", numMerges = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-tok").toString
    TextFunctions.saveTokenizer(dir, mergesDf, Some(vocabDf))
    val merges = TextFunctions.loadTokenizerMerges(spark, dir)
    assert(merges == TextFunctions.collectMerges(mergesDf), "merge list drifted")
    val vocab = TextFunctions.loadTokenizerVocab(spark, dir)
    assert(vocab == vocabDf.orderBy("token_id").select("token")
      .collect().map(_.getString(0)).toIndexedSeq, "vocab drifted")
    // the reloaded artifacts drive both encoders bit-identically
    val viaLoaded = docs.select(
        BpeEncodeExpr.count(lower(col("text")), merges, "[a-z]+").as("n"))
      .agg(sum("n")).head().getLong(0)
    val viaFresh = docs.select(
        BpeEncodeExpr.count(lower(col("text")),
          TextFunctions.collectMerges(mergesDf), "[a-z]+").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(viaLoaded == viaFresh && viaLoaded > 0)
    val seg = Seq("quick").toDF("w")
      .select(WordpieceExpr(col("w"), vocab, continuationPrefix = "").as("p"))
      .head().getSeq[String](0)
    assert(seg.mkString == "quick")
  }

  test("saveUnigram/loadUnigram: reloaded artifact decodes identically") {
    val docs = foxDocs.toDF("text")
    val trained = TextFunctions.unigramTrain(docs, "text",
      vocabSize = 20, maxTokenLen = 4, seedSize = 60, emRounds = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ug").toString
    TextFunctions.saveUnigram(dir, trained)
    val (vocab, costs) = TextFunctions.loadUnigram(spark, dir)
    val fresh = trained.orderBy("token").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(vocab.zip(costs) == fresh.toSeq, "artifact drifted")
    val viaLoaded = TextFunctions
      .unigramEncodeWords(docs, "text", vocab, costs)
      .orderBy("word").collect().map(_.toSeq).toSeq
    val viaFresh = TextFunctions
      .unigramEncodeWords(docs, "text",
        fresh.map(_._1).toSeq, fresh.map(_._2).toSeq)
      .orderBy("word").collect().map(_.toSeq).toSeq
    assert(viaLoaded == viaFresh && viaLoaded.nonEmpty)
  }

  test("delta/merge kernels reject null symbol elements loud (never NPE / silent nulls)") {
    val df = Seq(1).toDF("i")
      .select(array(lit("a"), lit("b"), lit(null).cast("string")).as("syms"))
    for (c <- Seq(
        BpeEncodeExpr.mergeStep(col("syms"), "a", "b"),
        BpeEncodeExpr.pairDelta(col("syms"), "a", "b"),
        BpeEncodeExpr.bothDelta(col("syms"), "a", "b"))) {
      val e = intercept[Exception] { df.select(c).collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("null symbol")),
        s"expected the loud null-symbol contract, got: ${msgs(e).mkString(" | ")}")
    }
    // the contract is loud even when the merge pair is ABSENT — the
    // pre-scan checks nulls, not just the post-hit allocation loop
    // (a hit-gated check would make the violation only sometimes
    // visible)
    for (c <- Seq(
        BpeEncodeExpr.mergeStep(col("syms"), "x", "y"),
        BpeEncodeExpr.pairDelta(col("syms"), "x", "y"),
        BpeEncodeExpr.bothDelta(col("syms"), "x", "y"))) {
      val e = intercept[Exception] { df.select(c).collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("null symbol")),
        s"no-hit rows must still fail loud: ${msgs(e).mkString(" | ")}")
    }
    // a null in the LAST slot (never the left element of any adjacency
    // probe) is caught by the explicit tail check
    val tail = Seq(1).toDF("i")
      .select(array(lit("a"), lit(null).cast("string")).as("syms"))
    val te = intercept[Exception] {
      tail.select(BpeEncodeExpr.pairDelta(col("syms"), "x", "y")).collect()
    }
    def tmsgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ tmsgs(t.getCause)
    assert(tmsgs(te).exists(_.contains("null symbol")))
  }

  test("selectBpeBatch: disjoint prefix, strict-dominance trim, collision stops") {
    def sel(rows: Seq[(String, String, Long)], maxBatch: Int,
        universe: Set[String] = Set("a", "b", "c", "d", "e", "f", "x")) =
      TextFunctions.selectBpeBatch(rows.toIndexedSeq, maxBatch, universe)
        .map(r => (r._1, r._2))
    // plain disjoint prefix; stop at the shared-symbol row; the row
    // above the stop count survives the trim
    assert(sel(Seq(("a", "b", 10L), ("c", "d", 8L), ("b", "e", 7L)), 8) ==
      Seq(("a", "b"), ("c", "d")))
    // a tie AT the stop count is trimmed: a pair the batch creates
    // could reach that count and win the tie-break
    assert(sel(Seq(("a", "b", 10L), ("c", "d", 7L), ("b", "e", 7L)), 8) ==
      Seq(("a", "b")))
    // the head's merged string already exists as a symbol -> K=1
    // (existing "ab"-pairs could GAIN on top of an existing count)
    assert(sel(Seq(("a", "b", 10L), ("c", "d", 8L)), 8,
      universe = Set("a", "b", "c", "d", "ab")) == Seq(("a", "b")))
    // a later candidate mentioning the head's merged string stops the
    // walk even though its raw symbols are disjoint
    assert(sel(Seq(("a", "b", 10L), ("ab", "c", 8L), ("e", "f", 6L)), 8) ==
      Seq(("a", "b")))
    // collect horizon: the sentinel row's count bounds the trim even
    // with no interaction among the walked rows
    assert(sel(Seq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 8L)), 2) ==
      Seq(("a", "b")))
    assert(sel(Seq(("a", "b", 10L), ("c", "d", 9L), ("e", "f", 8L)), 2) ==
      Seq(("a", "b"), ("c", "d")))
    // whole table seen, no interactions -> everything batches
    assert(sel(Seq(("a", "b", 10L), ("c", "d", 1L)), 8) ==
      Seq(("a", "b"), ("c", "d")))
    // approximate mode (opt-in): SKIPS interacting candidates and
    // keeps collecting disjoint ones — no stop, no dominance trim
    def selApprox(rows: Seq[(String, String, Long)], maxBatch: Int) =
      TextFunctions.selectBpeBatch(rows.toIndexedSeq, maxBatch,
        Set("a", "b", "c", "d", "e", "f"), exact = false).map(r => (r._1, r._2))
    assert(selApprox(Seq(("a", "b", 10L), ("b", "e", 9L), ("c", "d", 7L)), 8) ==
      Seq(("a", "b"), ("c", "d")))
  }

  test("approximate batch mode: fewer rounds, explicit opt-in, exact head merge") {
    // a chain-heavy corpus where exact batching yields 1 merge/round
    val docs = (1 to 30).map(i => (i.toLong, "thethe then they them the"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
    val drv = rows(TextFunctions.bpeTrain(docs, "text", numMerges = 6))
    val exactD = rows(TextFunctions.bpeTrainDistributed(docs, "text", numMerges = 6))
    val exactRounds = TextFunctions.lastBpeTrainRounds
    assert(exactD == drv, "exact mode must stay bit-identical")
    val approx = rows(TextFunctions.bpeTrainDistributed(docs, "text",
      numMerges = 6, exactBatch = false))
    val approxRounds = TextFunctions.lastBpeTrainRounds
    assert(approx.length == 6, s"approx mode under-learned: $approx")
    assert(approx.head == drv.head,
      "the head merge is the exact arg-max in BOTH modes")
    assert(approxRounds <= exactRounds,
      s"approx used $approxRounds rounds vs exact $exactRounds")
    // on a fully disjoint corpus the two modes coincide exactly
    val dj = Seq((1L, Seq("ab", "cd", "ef", "gh").flatMap(w =>
      Seq.fill(5)(w)).mkString(" "))).toDF("doc_id", "text")
    val e = rows(TextFunctions.bpeTrainDistributed(dj, "text", numMerges = 4))
    val ap = rows(TextFunctions.bpeTrainDistributed(dj, "text",
      numMerges = 4, exactBatch = false))
    assert(e == ap)
  }

  test("batched bpeTrainDistributed == driver on the created-pair interception corpus") {
    // After merging (a,b), the CREATED pair (x,ab) has count N — above
    // (c,d)'s M — so sequential picks it second. A naive disjoint
    // batch would have grabbed (c,d); the stop rule must not.
    val docs = (1 to 40).map(i => (i.toLong, "xab xab cd")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
    val drv = rows(TextFunctions.bpeTrain(docs, "text", numMerges = 3))
    val dist = rows(TextFunctions.bpeTrainDistributed(docs, "text", numMerges = 3))
    assert(dist == drv, s"batch selection diverged:\n$dist\nvs driver\n$drv")
    assert(drv.map(d => (d._2, d._3)).take(2) == Seq(("a", "b"), ("x", "ab")),
      s"fixture lost its point: $drv")
  }

  test("batching fires on disjoint-alphabet corpora: fewer rounds, identical merges") {
    // eight strictly-ordered, symbol-disjoint top pairs -> sequential
    // picks them in count order and one batch round learns them all
    val words = Seq("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op")
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(100 - 10 * i)(w) }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
    val drv = rows(TextFunctions.bpeTrain(docs, "text", numMerges = 8))
    val dist = rows(TextFunctions.bpeTrainDistributed(docs, "text", numMerges = 8))
    assert(dist == drv)
    assert(TextFunctions.lastBpeTrainRounds == 1,
      s"expected ONE batch round for 8 disjoint merges, got ${TextFunctions.lastBpeTrainRounds}")
    // numMerges caps the batch: asking for 3 must learn exactly 3
    val dist3 = rows(TextFunctions.bpeTrainDistributed(docs, "text", numMerges = 3))
    assert(dist3 == drv.take(3))
  }

  test("wordpieceTrainDistributed approxMaxBatch: opt-in batching, exact head, fewer rounds") {
    val docs = (1 to 30).map(i => (i.toLong, "ab ab ab cd cd ef gh gh gh gh"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSeq
    val exact = rows(TextFunctions.wordpieceTrainDistributed(docs, "text", numMerges = 4))
    val exactRounds = TextFunctions.lastWpTrainRounds
    assert(exactRounds == 4, s"exact mode is one merge per round, got $exactRounds")
    val approx = rows(TextFunctions.wordpieceTrainDistributed(docs, "text",
      numMerges = 4, approxMaxBatch = 8))
    val approxRounds = TextFunctions.lastWpTrainRounds
    assert(approx.length == 4)
    assert(approx.head == exact.head, "the head merge is the exact arg-max in BOTH modes")
    assert(approxRounds < exactRounds,
      s"approx used $approxRounds rounds vs exact $exactRounds")
    // the two-symbol words are fully disjoint: the learned merge SET
    // coincides even though the contract only promises the head
    assert(approx.toSet == exact.toSet,
      s"disjoint corpus should coincide: $approx vs $exact")
  }

  test("bpeTrainDistributed stops early on pair exhaustion like the driver loop") {
    val docs = Seq((1L, "ab a b"), (2L, "ab")).toDF("doc_id", "text")
    val drv = TextFunctions.bpeTrain(docs, "text", numMerges = 5).collect()
    val dist = TextFunctions.bpeTrainDistributed(docs, "text", numMerges = 5).collect()
    assert(drv.length == 1 && dist.length == 1, "one merge (a,b) then exhaustion")
    assert(dist.map(_.toSeq).toSeq == drv.map(_.toSeq).toSeq)
  }

  test("MergeIndex.encode == reference encodeWord == chained-replace (binary alphabet)") {
    val rnd = new scala.util.Random(7)
    val words = (1 to 400).map(_ =>
      (1 to (1 + rnd.nextInt(14))).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString)
    val wc = words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
    val merges = Bpe.train(wc, 40)
    val idx = new Bpe.MergeIndex(merges)
    words.distinct.foreach { w =>
      val viaIndex = idx.encode(w).toSeq
      val viaScan = Bpe.encodeWord(w, merges).toSeq
      val viaReplace = chainedReplace(w, merges)
      assert(viaIndex == viaScan, s"$w: index $viaIndex vs scan $viaScan")
      assert(viaScan == viaReplace, s"$w: scan $viaScan vs replace $viaReplace")
    }
  }

  test("bpeTokenCounts: nulls and no-match text count 0; cache repeats agree") {
    val merges = Seq(("t", "h"), ("th", "e"))
    val df = Seq(
      (1L, "the the the"), (2L, null.asInstanceOf[String]),
      (3L, "123 !!!"), (4L, "THE the")).toDF("doc_id", "text")
    val got = TextFunctions.bpeTokenCounts(df, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // "the" -> [the] = 1 token; doc4 lowercased -> 2 words x 1 token
    assert(got == Seq((1L, 3L), (2L, 0L), (3L, 0L), (4L, 2L)))
  }

  test("BpeEncodeExpr.tokens emits the flat in-order token stream") {
    val merges = Seq(("a", "b"))
    val got = Seq("ab cab abab").toDF("text")
      .select(BpeEncodeExpr.tokens(col("text"), merges, "[a-z]+").as("t"))
      .as[Seq[String]].head()
    assert(got == Seq("ab", "c", "ab", "ab", "ab"))
  }

  test("bpeVocab: base block in code-point order, merged block dense by rank") {
    val df = foxDocs.toDF("text")
    val v = TextFunctions.bpeVocab(df, "text", numMerges = 8)
      .orderBy("token_id")
      .as[(Long, String, String)].collect().toSeq
    val (base, merged) = v.partition(_._3 == "base")
    // ids: 0..B-1 base then B.. merged, no gaps
    assert(v.map(_._1) == v.indices.map(_.toLong))
    assert(base.map(_._2) == base.map(_._2).sorted) // ascii => plain sort ok
    assert(merged.map(_._2) == foxGolden.map(_._4), "merged block follows rank order")
    // minCount floor shrinks the base alphabet too (symbols come from
    // the floored vocab, not the raw corpus)
    val v2 = TextFunctions.bpeVocab(
      Seq("aa aa aa zq").toDF("text"), "text", 2, minCount = 2L)
      .as[(Long, String, String)].collect().toSeq
    assert(v2 == Seq((0L, "a", "base"), (1L, "aa", "merged")))
  }

  test("tokens kernel + vocab join: every emitted token has a vocab id") {
    // multi-char symbols ARE merged-token strings and base chars come
    // from the same floored vocab — the id lookup can only miss on
    // text outside the training corpus
    val df = foxDocs.toDF("text")
    val merges = TextFunctions.collectMerges(
      TextFunctions.bpeTrain(df, "text", 8))
    val vocab = TextFunctions.bpeVocab(df, "text", 8)
      .select("token", "token_id")
    val toks = df.select(
      explode(BpeEncodeExpr.tokens(lower(col("text")), merges, "[a-z]+")).as("token"))
    val missing = toks.join(vocab, Seq("token"), "left_anti").count()
    assert(missing == 0L, s"$missing emitted tokens lack a vocab id")
    // and the token count via ids equals the count-only kernel
    val viaJoin = toks.count()
    val viaKernel = df.select(
      BpeEncodeExpr.count(lower(col("text")), merges, "[a-z]+").as("n"))
      .agg(sum("n")).as[Long].head()
    assert(viaJoin == viaKernel)
  }

  test("byte-level train on pure ASCII == char-level merges mapped through hex") {
    // on single-byte text the byte walk sees the same pair counts and
    // the hex tie-break order equals the code-point order, so the
    // merge tables must be bijective images of each other
    def hexOf(s: String) = Bpe.toHex(s)
    val df = foxDocs.toDF("text")
    val chars = TextFunctions.bpeTrain(df, "text", numMerges = 8)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2)))
    val bytes = TextFunctions.bpeTrainBytes(df, "text", numMerges = 8)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2)))
    assert(bytes.toSeq == chars.toSeq.map { case (a, b) => (hexOf(a), hexOf(b)) })
  }

  test("byte-level splits multi-byte code points; token concat == word hex") {
    // é = c3 a9 (two symbols at stage 0, mergeable); the kernel must
    // emit hex tokens whose concatenation is exactly the word's hex
    val docs = Seq((1L, "café café café né"), (2L, "cafe ne café")).toDF("doc_id", "text")
    val mergesDf = TextFunctions.bpeTrainBytes(docs, "text", numMerges = 6,
      tokenPattern = "[a-zé]+")
    val merges = TextFunctions.collectMerges(mergesDf)
    assert(merges.exists { case (a, b) => a == "c3" && b == "a9" },
      s"frequent é must learn the (c3, a9) merge, got $merges")
    val idx = new Bpe.MergeIndex(merges, symbolWidth = 2)
    for (w <- Seq("café", "cafe", "né", "éé")) {
      val toks = idx.encode(Bpe.toHex(w))
      assert(toks.mkString == Bpe.toHex(w), s"$w: tokens must concat to the hex")
      assert(toks.toSeq == Bpe.encodeWord(
        Bpe.toHex(w), merges, Bpe.chunkSymbols(_, 2)).toSeq,
        s"$w: index encode must equal the reference scan")
    }
    // kernel parity: counts from the codegen'd byteLevel kernel equal
    // a driver-side re-encode of every word
    val got = TextFunctions.bpeTokenCountsBytes(
      docs, "doc_id", "text", merges, tokenPattern = "[a-zé]+")
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    def countDoc(t: String) =
      "[a-zé]+".r.findAllIn(t.toLowerCase).map(w => idx.encode(Bpe.toHex(w)).length.toLong).sum
    assert(got == Seq(countDoc("café café café né"), countDoc("cafe ne café")))
  }

  test("code-point compare orders like UTF-8 bytes (supplementary plane)") {
    // U+10000 (surrogate pair, starts 0xD800) vs U+FFFD: UTF-16 code
    // units would order U+10000 FIRST; code points order it LAST.
    val lo = "\ufffd"
    val hi = new String(Character.toChars(0x10000))
    assert(Bpe.cpCompare(lo, hi) < 0 && lo.compareTo(hi) > 0)
  }
}
