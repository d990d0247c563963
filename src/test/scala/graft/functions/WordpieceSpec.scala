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

  // ---- training -----------------------------------------------------

  test("training: likelihood score picks the exclusive pair raw-count BPE would skip") {
    // count(aa)=10 but 'a' occurs 22 times -> score 10/(22*22) ≈ .021;
    // count(bc)=9 with b,c occurring ONLY there -> 9/81 ≈ .111. BPE
    // (raw count) merges (a,##a) first; WordPiece must merge (b,##c).
    val wc = Seq(("aa", 10L), ("bc", 9L), ("ab", 2L))
    val wp = Wordpiece.train(wc, numMerges = 1)
    assert(wp.head == (("b", "##c", "bc")), s"got ${wp.head}")
    val bpe = Bpe.train(wc, 1)
    assert(bpe.head == (("a", "a")), "raw-count BPE picks the frequent pair")
  }

  test("training: continuation algebra — merged tokens strip the right ##") {
    // "abc" x 5: stage-0 symbols a, ##b, ##c. Scores: (a,##b) =
    // 5/(5*5) = (##b,##c) — tie broken by (a,##b) < (##b,##c) in
    // binary order ('#' < 'a'? no: 'a'=0x61 > '#'=0x23, so "##b" <
    // "a" ... (a,##b) vs (##b,##c): compare first elements "a" vs
    // "##b": "##b" is SMALLER -> (##b,##c) wins the tie
    val wp = Wordpiece.train(Seq(("abc", 5L)), numMerges = 2)
    assert(wp(0) == (("##b", "##c", "##bc")),
      s"tie must break to the code-point-smaller pair; got ${wp(0)}")
    // after merging ##b+##c -> ##bc: pair (a, ##bc) remains
    assert(wp(1) == (("a", "##bc", "abc")), s"got ${wp(1)}")
  }

  test("training: randomized corpora match a from-scratch recount trainer") {
    // naive reference: re-symbolize + recount everything each round,
    // score by exact BigInt cross-multiplication, tie by (a, b)
    def naive(wc: Seq[(String, Long)], k: Int): Seq[(String, String, String)] = {
      var words: Seq[(Array[String], Long)] = wc.filter(_._1.nonEmpty).map { case (w, c) =>
        (Bpe.codePointSymbols(w).zipWithIndex.map { case (s, i) =>
          if (i == 0) s else "##" + s
        }, c)
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
      var continue = true
      while (out.size < k && continue) {
        val sym = scala.collection.mutable.Map.empty[String, Long]
        val pair = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((s, c) <- words) {
          s.foreach(t => sym(t) = sym.getOrElse(t, 0L) + c)
          s.sliding(2).filter(_.length == 2).foreach(p =>
            pair((p(0), p(1))) = pair.getOrElse((p(0), p(1)), 0L) + c)
        }
        if (pair.isEmpty) continue = false
        else {
          val best = pair.toSeq.minBy { case ((a, b), c) =>
            // exact: sort by -score then (a,b); encode score as a
            // comparable rational via BigDecimal of the cross ratio —
            // tiny corpora, BigDecimal(200 digits) is exact enough to
            // never reorder vs true rational comparison here
            (scala.math.BigDecimal(-c) / (scala.math.BigDecimal(sym(a)) * scala.math.BigDecimal(sym(b))), a, b)
          }
          val (a, b) = best._1
          val merged = a + (if (b.startsWith("##")) b.substring(2) else b)
          out += ((a, b, merged))
          words = words.map { case (s, c) =>
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < s.length) {
              if (j + 1 < s.length && s(j) == a && s(j + 1) == b) { buf += merged; j += 2 }
              else { buf += s(j); j += 1 }
            }
            (buf.toArray, c)
          }
        }
      }
      out.toSeq
    }
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(500 + seed)
      val alpha = if (seed % 2 == 0) "ab" else "abcd"
      val wc = (1 to 40).map { _ =>
        ((1 to (1 + rnd.nextInt(7))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString,
          (1 + rnd.nextInt(20)).toLong)
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      val fast = Wordpiece.train(wc, 12)
      val slow = naive(wc, 12)
      assert(fast == slow, s"seed $seed: incremental trainer diverged from recount trainer")
    }
  }

  test("trainWithVocab feeds the encode kernel: trained corpus re-segments") {
    val docs = Seq("the cat sat", "the bat", "the mat sat")
    val wc = docs.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => (w, g.size.toLong) }.toSeq
    val (merges, vocab) = Wordpiece.trainWithVocab(wc, numMerges = 6)
    assert(merges.nonEmpty && vocab.nonEmpty)
    // base block: every stage-0 symbol present, code-point ordered
    assert(vocab.contains("t") && vocab.contains("##h") && vocab.contains("##e"))
    // every trained word encodes with ZERO [UNK] under the vocab
    val got = segment(wc.map(_._1), vocab)
    for ((w, _) <- wc) {
      assert(!got(w).contains("[UNK]"), s"$w -> ${got(w)}")
      // pieces reassemble the word (strip ##)
      assert(got(w).map(_.stripPrefix("##")).mkString == w)
    }
  }

  // ---- lattice (optimal) decode --------------------------------------

  private def lattice(words: Seq[String], vocab: Seq[String]): Map[String, Seq[String]] =
    words.toDF("w")
      .select(col("w"), LatticeEncodeExpr(col("w"), vocab).as("p"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toSeq)).toMap

  test("lattice finds the minimal segmentation greedy misses; rescues greedy dead-ends") {
    // greedy: ab|c|d (3 pieces, ab commits and strands bcd);
    // lattice: a|bcd (2) — the minimum
    val v1 = Seq("a", "b", "c", "d", "ab", "bcd")
    assert(lattice(Seq("abcd"), v1)("abcd") == Seq("a", "bcd"))
    assert(segment(Seq("abcd"), v1, cont = "")("abcd") == Seq("ab", "c", "d"))
    // greedy dead-ends to whole-word UNK; the lattice segments
    val v2 = Seq("a", "ab", "bc")
    assert(lattice(Seq("abc"), v2)("abc") == Seq("a", "bc"))
    assert(segment(Seq("abc"), v2, cont = "")("abc") == Seq("[UNK]"))
  }

  test("lattice tie-break: longest admissible piece, left to right") {
    // ab|cd and a|bcd are both 2 pieces — the longer FIRST piece wins
    val got = lattice(Seq("abcd"), Seq("ab", "cd", "a", "bcd"))
    assert(got("abcd") == Seq("ab", "cd"), s"got ${got("abcd")}")
  }

  test("lattice UNK + empty-word conventions match WordPiece") {
    val got = lattice(Seq("abq", ""), Seq("a", "b", "ab"))
    assert(got("abq") == Seq("[UNK]"))
    assert(got("") == Seq.empty)
  }

  test("scored lattice: costs override piece count; uniform mode unchanged") {
    // cheap ab + cd beat the single expensive abcd piece — the scored
    // decode picks MORE pieces when the LM says so (uniform picks 1)
    val vocab = Seq("abcd", "ab", "cd")
    val dear = Seq(2000000000L, 100L, 100L) // abcd is e^2-rare
    val scored = Seq("abcd").toDF("w")
      .select(LatticeEncodeExpr(col("w"), vocab, costs = dear).as("p"))
      .head().getSeq[String](0)
    assert(scored == Seq("ab", "cd"), s"got $scored")
    assert(lattice(Seq("abcd"), vocab)("abcd") == Seq("abcd"),
      "uniform mode must still minimize piece count")
    // equal-cost tie falls back to fewer pieces (the 1024c+1 fold)
    val tied = Seq("abcd").toDF("w")
      .select(LatticeEncodeExpr(col("w"), vocab,
        costs = Seq(200L, 100L, 100L)).as("p"))
      .head().getSeq[String](0)
    assert(tied == Seq("abcd"), s"equal total cost must prefer fewer pieces: $tied")
    intercept[IllegalArgumentException] {
      LatticeEncodeExpr(col("w"), vocab, costs = Seq(1L)) // arity mismatch
    }
    intercept[IllegalArgumentException] {
      LatticeEncodeExpr(col("w"), vocab, costs = Seq(-1L, 0L, 0L))
    }
    // scored-mode length guard = 1024 — the same 2^10 as the cost
    // fold's shift, so a path can never pick up more extra pieces
    // than one nano-nat of cost dominates (the tie-break stays sound
    // at the boundary, not just typically). 1024 chars pass; 1025
    // reject loud.
    val okLong = Seq("a" * 1024).toDF("w")
      .select(LatticeEncodeExpr(col("w"), Seq("a"), costs = Seq(5L)).as("p"))
      .head().getSeq[String](0)
    assert(okLong.length == 1024)
    val ge = intercept[Exception] {
      Seq("a" * 1025).toDF("w")
        .select(LatticeEncodeExpr(col("w"), Seq("a"), costs = Seq(5L)))
        .collect()
    }
    def gmsgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ gmsgs(t.getCause)
    assert(gmsgs(ge).exists(_.contains("chunk first")), gmsgs(ge).mkString(" | "))
    // uniform mode keeps the wide 2^20 bound (no cost fold to protect)
    val uni = Seq("a" * 2048).toDF("w")
      .select(LatticeEncodeExpr(col("w"), Seq("a")).as("p"))
      .head().getSeq[String](0)
    assert(uni.length == 2048)
  }

  test("unigramCosts + unigramEncodeWords: counts, costs, and totals replay exactly") {
    val docs = Seq("aba cab abacab", "cab cab ab a b c").toDF("text")
    val vocab = Seq("a", "b", "c", "ab", "ba", "cab", "abacab")
    val costs = TextFunctions.unigramCosts(docs, "text", vocab)
    // reference counts by brute force
    val words = docs.collect().flatMap(_.getString(0).split(" "))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val occ = vocab.map { v =>
      v -> words.map { case (w, c) =>
        c * (0 until w.length).count(p => w.startsWith(v, p))
      }.sum
    }.toMap
    val total = occ.values.sum
    vocab.zipWithIndex.foreach { case (v, i) =>
      assert(costs(i) == Math.round(Math.log(total.toDouble / occ(v)) * 1e9),
        s"cost of $v")
    }
    val got = TextFunctions.unigramEncodeWords(docs, "text", vocab, costs.toSeq)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getString(2), r.getLong(3)))).toMap
    // every word's total == the sum of its chosen pieces' costs
    val cm = vocab.zip(costs).toMap
    got.foreach { case (w, (n, pieces, cost)) =>
      val ps = pieces.split('|').toSeq
      assert(ps.size == n, s"$w piece count")
      assert(ps.mkString == w, s"$w pieces reassemble")
      assert(cost == ps.map(cm).sum, s"$w cost sum")
    }
    // the rare long piece: abacab occurs once, so its single-piece
    // cost still beats any multi-piece split (each sub-piece is rarer
    // than ... verify against exhaustive enumeration)
    assert(got("abacab")._1 == 1, s"abacab: ${got("abacab")}")
    // a vocab token absent from the corpus fails loud
    val e = intercept[IllegalArgumentException] {
      TextFunctions.unigramCosts(docs, "text", vocab :+ "zzz")
    }
    assert(e.getMessage.contains("zzz"))
  }

  test("scored lattice == exhaustive min-cost reference on randomized corpora") {
    def enumerate(w: String, vs: Set[String]): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to w.length).flatMap { l =>
        val h = w.substring(0, l)
        if (vs(h)) enumerate(w.substring(l), vs).map(h +: _) else Seq.empty
      }
    val rnd = new scala.util.Random(123)
    for (trial <- 1 to 4) {
      val vocab = (Seq("a", "b") ++ (1 to 14).map(_ =>
        (1 to 1 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString))
        .distinct
      val costs = vocab.map(_ => rnd.nextInt(1000000).toLong)
      val eff = vocab.zip(costs).map { case (v, c) => v -> (c * 1024 + 1) }.toMap
      def reference(w: String): Seq[String] = {
        val all = enumerate(w, vocab.toSet)
        if (all.isEmpty) Seq("[UNK]")
        else {
          val minEff = all.map(_.map(eff).sum).min
          all.filter(_.map(eff).sum == minEff).maxBy(_.map(_.length))(
            math.Ordering.Implicits.seqOrdering[Seq, Int])
        }
      }
      val words = (1 to 40).map(_ =>
        (1 to 2 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString).distinct
      val got = words.toDF("w")
        .select(col("w"), LatticeEncodeExpr(col("w"), vocab, costs = costs).as("p"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
      for (w <- words)
        assert(got(w) == reference(w), s"trial $trial $w: ${got(w)} vs ${reference(w)}")
    }
  }

  test("lattice == exhaustive-enumeration reference on randomized corpora") {
    // reference: enumerate ALL segmentations, keep min count, then the
    // lexicographically LARGEST piece-length sequence (== taking the
    // longest admissible piece left to right)
    def enumerate(w: String, vs: Set[String]): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to w.length).flatMap { l =>
        val h = w.substring(0, l)
        if (vs(h)) enumerate(w.substring(l), vs).map(h +: _) else Seq.empty
      }
    def reference(w: String, vs: Set[String]): Seq[String] = {
      val all = enumerate(w, vs)
      if (all.isEmpty) Seq("[UNK]")
      else {
        val minN = all.map(_.size).min
        all.filter(_.size == minN).maxBy(_.map(_.length))(
          math.Ordering.Implicits.seqOrdering[Seq, Int])
      }
    }
    val rnd = new scala.util.Random(91)
    val vocab = (Seq("a", "b", "c") ++ (1 to 30).map(_ =>
      (1 to 1 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)).distinct
    // drop one single char from some trials so UNK paths are exercised
    val vocabNoC = vocab.filterNot(_ == "c")
    for ((vs, tag) <- Seq((vocab, "full"), (vocabNoC, "no-c"))) {
      val words = (1 to 60).map(_ =>
        (1 to 2 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString).distinct
      val got = lattice(words, vs)
      val set = vs.toSet
      for (w <- words)
        assert(got(w) == reference(w, set), s"[$tag] $w: ${got(w)} vs ${reference(w, set)}")
    }
  }

  test("unigramTrain == independent driver-side reference hard-EM (randomized)") {
    // the reference re-implements the documented algorithm from
    // scratch (its own Viterbi over eff = 1024c+1, its own seed/
    // prune/reprice) — agreement pins the distributed trainer's
    // semantics, not its plumbing
    def refViterbi(word: String, eff: Map[String, Long]): Seq[String] = {
      val n = word.length
      val maxL = eff.keys.map(_.length).max
      val INF = Long.MaxValue
      val suf = Array.fill(n + 1)(INF); suf(n) = 0L
      for (pos <- (n - 1) to 0 by -1) {
        var best = INF
        for (l <- 1 to math.min(maxL, n - pos)) {
          eff.get(word.substring(pos, pos + l)).foreach { e =>
            if (suf(pos + l) != INF && e + suf(pos + l) < best)
              best = e + suf(pos + l)
          }
        }
        suf(pos) = best
      }
      if (suf(0) == INF) return Seq("[UNK]")
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < n) {
        var bl = 0
        for (l <- 1 to math.min(maxL, n - pos)) {
          eff.get(word.substring(pos, pos + l)).foreach { e =>
            if (suf(pos + l) != INF && suf(pos) == e + suf(pos + l)) bl = l
          }
        }
        out += word.substring(pos, pos + bl)
        pos += bl
      }
      out.toSeq
    }
    def refTrain(words: Seq[(String, Long)], vocabSize: Int, maxLen: Int,
        seeds: Int, rounds: Int): Seq[(String, Long, Long)] = {
      val occ = scala.collection.mutable.Map.empty[String, Long]
      for ((w, c) <- words; p <- 0 until w.length;
           l <- 1 to math.min(maxLen, w.length - p))
        occ(w.substring(p, p + l)) = occ.getOrElse(w.substring(p, p + l), 0L) + c
      val chars = occ.filter(_._1.length == 1).toArray
      val multis = occ.filter(_._1.length > 1).toArray
        .sortBy { case (t, c) => (-c, t) }.take(math.max(0, seeds - chars.length))
      def price(es: Array[(String, Long)]): Map[String, Long] = {
        val tot = es.map(_._2).sum
        es.map { case (t, c) =>
          t -> Math.round(Math.log(tot.toDouble / c) * 1e9) }.toMap
      }
      var costs = price(chars ++ multis)
      var counted: Array[(String, Long)] = chars ++ multis
      for (_ <- 1 to rounds) {
        val eff = costs.map { case (t, c) => t -> ((c << 10) + 1L) }
        val use = scala.collection.mutable.Map.empty[String, Long]
        for ((w, c) <- words; p <- refViterbi(w, eff))
          use(p) = use.getOrElse(p, 0L) + c
        assert(!use.contains("[UNK]"))
        val keptChars = chars.map { case (c, _) => (c, use.getOrElse(c, 0L)) }
        val keptMultis = use.toArray.filter(_._1.length > 1)
          .sortBy { case (t, c) => (-c, t) }
          .take(math.max(0, vocabSize - chars.length))
        counted = keptChars ++ keptMultis
        costs = price(counted.map { case (t, c) => (t, math.max(c, 1L)) })
      }
      val cm = counted.toMap
      costs.toSeq.sortBy(_._1).map { case (t, c) => (t, cm.getOrElse(t, 0L), c) }
    }
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(700 + seed)
      val alpha = if (seed % 2 == 0) "abc" else "abcde"
      val raw = (1 to 80).map(_ =>
        (1 to 2 + rnd.nextInt(8)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      val wc = raw.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
      val docs = Seq((1L, raw.mkString(" "))).toDF("doc_id", "text")
      val got = TextFunctions.unigramTrain(docs, "text",
          vocabSize = 12, maxTokenLen = 5, seedSize = 40, emRounds = 2)
        .orderBy("token").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      val want = refTrain(wc, 12, 5, 40, 2)
      assert(got == want, s"seed $seed:\n$got\nvs reference\n$want")
    }
  }

  test("unigramTrain: chars never pruned; floor cost for unused chars; vocab caps") {
    // 'q' appears only inside a frequent multi-char piece, so its
    // Viterbi usage is 0 — it must survive with the +1-floored cost
    val docs = Seq((1L, Seq.fill(30)("aqb").mkString(" ") + " cc cc cc"))
      .toDF("doc_id", "text")
    val out = TextFunctions.unigramTrain(docs, "text",
        vocabSize = 6, maxTokenLen = 3, seedSize = 20, emRounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val toks = out.map(_._1).toSet
    assert(Set("a", "b", "c", "q").subsetOf(toks), s"chars pruned: $toks")
    assert(out.count(_._1.length > 1) <= 2, s"multi block over cap: $toks")
    val q = out.find(_._1 == "q").get
    assert(q._2 == 0L, s"q should be unused, got $q")
    // floored cost = ln(total/1): the maximum cost in the table
    assert(q._3 == out.map(_._3).max, s"unused char must carry the max cost: $out")
    intercept[IllegalArgumentException] {
      TextFunctions.unigramTrain(docs, "text", vocabSize = 50, seedSize = 10)
    }
  }


  test("LatticeExpectExpr == exhaustive-enumeration expected counts (randomized)") {
    // reference: enumerate ALL segmentations, weight by the product of
    // piece probabilities, accumulate exact expected counts
    def refExpect(word: String, vocab: IndexedSeq[String],
        probs: Map[String, Double]): Map[String, Double] = {
      def segs(w: String): Seq[Seq[String]] =
        if (w.isEmpty) Seq(Seq.empty)
        else (1 to w.length).flatMap { l =>
          val h = w.substring(0, l)
          if (probs.contains(h)) segs(w.substring(l)).map(h +: _) else Seq.empty
        }
      val all = segs(word)
      if (all.isEmpty) return Map.empty
      val weights = all.map(sg => sg.map(probs).product)
      val z = weights.sum
      all.zip(weights).foldLeft(Map.empty[String, Double]) { case (m, (sg, w)) =>
        sg.foldLeft(m)((mm, p) => mm.updated(p, mm.getOrElse(p, 0.0) + w / z))
      }
    }
    val rnd = new scala.util.Random(55)
    val alpha = "abc"
    val vocab = (Seq("a", "b", "c") ++ (1 to 20).map(_ =>
      (1 to 2 + rnd.nextInt(3)).map(_ => alpha(rnd.nextInt(3))).mkString)).distinct.toIndexedSeq
    val raw = vocab.map(_ => 0.05 + rnd.nextDouble())
    val z = raw.sum
    val probs = vocab.zip(raw.map(_ / z)).toMap
    val logp = vocab.map(t => math.log(probs(t)))
    val words = (1 to 50).map(_ =>
      (1 to 2 + rnd.nextInt(7)).map(_ => alpha(rnd.nextInt(3))).mkString).distinct
    val got = words.toDF("w")
      .select(col("w"), LatticeExpectExpr(col("w"), vocab, logp).as("p"))
      .collect().map { r =>
        r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => vocab(x.getInt(0)) -> x.getDouble(1)).toMap
      }.toMap
    for (w <- words) {
      val want = refExpect(w, vocab, probs)
      val have = got(w)
      assert(have.keySet == want.keySet, s"$w: ${have.keySet} vs ${want.keySet}")
      for ((t, e) <- want)
        assert(math.abs(have(t) - e) <= 1e-9 * math.max(1.0, e.abs),
          s"$w/$t: ${have(t)} vs $e")
      // expected piece count is a convex mix of segmentation lengths
      val tot = have.values.sum
      assert(tot >= 1.0 - 1e-9 && tot <= w.length + 1e-9)
    }
    // single-path word: exact integer counts (no float mixing at all)
    val one = Seq("abc").toDF("w")
      .select(LatticeExpectExpr(col("w"), IndexedSeq("ab", "c"),
        Seq(math.log(0.5), math.log(0.5))).as("p"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(one.map(r => (r.getInt(0), r.getDouble(1))).toSet ==
      Set((0, 1.0), (1, 1.0)))
    // UNK word: empty array, not a crash
    val unk = Seq("q").toDF("w")
      .select(LatticeExpectExpr(col("w"), IndexedSeq("a"), Seq(0.0)).as("p"))
      .head().getSeq[Any](0)
    assert(unk.isEmpty)
  }

  test("unigramTrainSoft: one prune-neutral EM round == independent reference") {
    def refExpectAll(words: Seq[(String, Long)], vocab: IndexedSeq[String],
        probs: Map[String, Double]): Map[String, Double] = {
      def segs(w: String): Seq[Seq[String]] =
        if (w.isEmpty) Seq(Seq.empty)
        else (1 to w.length).flatMap { l =>
          val h = w.substring(0, l)
          if (probs.contains(h)) segs(w.substring(l)).map(h +: _) else Seq.empty
        }
      words.foldLeft(Map.empty[String, Double]) { case (m, (w, c)) =>
        val all = segs(w)
        val weights = all.map(sg => sg.map(probs).product)
        val z = weights.sum
        all.zip(weights).foldLeft(m) { case (mm, (sg, wt)) =>
          sg.foldLeft(mm)((m2, p) =>
            m2.updated(p, m2.getOrElse(p, 0.0) + c * wt / z))
        }
      }
    }
    val raw = Seq.fill(40)("abab") ++ Seq.fill(25)("ba") ++ Seq.fill(10)("aab")
    val docs = Seq((1L, raw.mkString(" "))).toDF("doc_id", "text")
    val wc = raw.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
    // replicate the seed exactly (all substrings <= 3, top multis)
    val occ = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- wc; p <- 0 until w.length; l <- 1 to math.min(3, w.length - p))
      occ(w.substring(p, p + l)) = occ.getOrElse(w.substring(p, p + l), 0L) + c
    val chars = occ.filter(_._1.length == 1).toSeq
    val multis = occ.filter(_._1.length > 1).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(10 - chars.length)
    val seedTotal = (chars ++ multis).map(_._2).sum.toDouble
    val seedProbs = (chars ++ multis).map { case (t, c) => t -> c / seedTotal }.toMap
    val vocab = seedProbs.keys.toIndexedSeq.sorted
    val e = refExpectAll(wc, vocab, seedProbs)
    val z = e.values.sum
    val wantCosts = vocab.map(t =>
      t -> Math.round(math.log(z / math.max(e.getOrElse(t, 0.0), 1e-9)) * 1e3)).toMap
    val got = TextFunctions.unigramTrainSoft(docs, "text",
        vocabSize = 10, maxTokenLen = 3, seedSize = 10, emRounds = 1)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.map(_._1).toSet == vocab.toSet, s"vocab diverged: ${got.toSeq}")
    for ((t, ec, cm) <- got) {
      val want = e.getOrElse(t, 0.0)
      assert(math.abs(ec - want) <= 1e-9 * math.max(1.0, want),
        s"$t expected-count ${ec} vs $want")
      assert(cm == wantCosts(t), s"$t cost_milli $cm vs ${wantCosts(t)}")
    }
  }

  test("unigramTrainSoft prunes by likelihood LOSS, not raw expected count") {
    // xy is frequent but cheaply re-encodable (x, y are common
    // singles); zw is rarer but its characters exist ONLY inside it,
    // so removing zw is expensive. Count-ranking keeps xy; Kudo's
    // loss-ranking must keep zw.
    val raw = Seq.fill(50)("xy") ++ Seq.fill(30)("zw") ++
      Seq.fill(200)("x") ++ Seq.fill(200)("y")
    val docs = Seq((1L, raw.mkString(" "))).toDF("doc_id", "text")
    val out = TextFunctions.unigramTrainSoft(docs, "text",
        vocabSize = 5, maxTokenLen = 2, seedSize = 8, emRounds = 2)
      .collect().map(_.getString(0)).toSet
    // 4 chars (x,y,z,w) + exactly ONE multi slot
    assert(out.contains("zw") && !out.contains("xy"),
      s"loss pruning must keep the irreplaceable piece: $out")
    assert(Set("x", "y", "z", "w").subsetOf(out))
  }

}
