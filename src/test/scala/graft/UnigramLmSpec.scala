package graft

import graft.llm.UnigramLm

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: enumerate EVERY segmentation of `word`
    * into vocab pieces (single chars fall back to `unk`), return the
    * max total score. */
  private def bruteBest(word: String, logp: Map[String, Double],
                        maxLen: Int, unk: Double = -1e9): Double = {
    if (word.isEmpty) return 0.0
    (1 to math.min(maxLen, word.length)).map { l =>
      val piece = word.substring(0, l)
      val s = logp.getOrElse(piece, if (l == 1) unk else Double.NegativeInfinity)
      if (s == Double.NegativeInfinity) Double.NegativeInfinity
      else s + bruteBest(word.substring(l), logp, maxLen, unk)
    }.max
  }

  private def score(pieces: Seq[String], logp: Map[String, Double]): Double =
    pieces.map(p => logp.getOrElse(p, -1e9)).sum

  test("viterbi achieves the brute-force optimum on every word up to length 7") {
    // distinct 'irrational' log-probs -> unique optima, no tie ambiguity
    val logp = Map("a" -> -2.31, "b" -> -2.57, "ab" -> -1.93, "ba" -> -3.11,
      "aab" -> -2.71, "bb" -> -2.02, "abab" -> -3.97)
    val words = for {
      n <- 1 to 7
      i <- 0 until (1 << n)
    } yield (0 until n).map(j => if (((i >> j) & 1) == 0) 'a' else 'b').mkString
    words.foreach { w =>
      val got = UnigramLm.viterbi(w, logp, maxPieceLen = 4)
      assert(got.mkString == w, s"'$w' pieces must concatenate back")
      assert(math.abs(score(got.toSeq, logp) - bruteBest(w, logp, 4)) < 1e-12,
        s"'$w': viterbi ${got.mkString("+")} not optimal")
    }
  }

  test("unknown characters fall back to single-char unk instead of failing") {
    val got = UnigramLm.viterbi("axb", Map("a" -> -1.0, "b" -> -1.0), 4)
    assert(got.toSeq === Seq("a", "x", "b"))
  }

  test("learnLocal: respects the target size, keeps every char, is input-order independent") {
    val words = Array(("sparkle", 40L), ("sparks", 35L), ("spark", 90L),
      ("park", 20L), ("bark", 15L), ("lark", 10L), ("spa", 5L))
    val v1 = UnigramLm.learnLocal(words, vocabSize = 16, maxPieceLen = 6, emRounds = 3)
    val v2 = UnigramLm.learnLocal(words.reverse, vocabSize = 16, maxPieceLen = 6, emRounds = 3)
    assert(v1 === v2, "training must not depend on collect order")
    val pieces = v1.map(_._1).toSet
    val chars = words.flatMap(_._1.map(_.toString)).toSet
    assert(chars.subsetOf(pieces), "single chars are never pruned")
    assert(v1.size <= 16)
    assert(v1.forall { case (_, lp) => lp < 0 && !lp.isInfinite })
    // the dominant word's surface must be covered by a multi-char piece
    assert(pieces.exists(p => p.length >= 4 && "spark".contains(p)),
      s"no compressive piece for the dominant word in $pieces")
  }

  test("encoding compresses a repetitive corpus and concatenates back exactly") {
    val docs = Seq.tabulate(60)(i => (i.toLong, "spark spark streaming spark"))
      .toDF("doc_id", "text")
    val vocab = UnigramLm.learn(docs, vocabSize = 24, maxPieceLen = 8, emRounds = 3)
    val out = UnigramLm.encode(docs, vocab).collect()
    out.foreach { r =>
      val toks = r.getSeq[String](1)
      assert(toks.mkString == "sparksparkstreamingspark")
      assert(r.getAs[Int]("n_words") === 4)
      // 4 words, 24 chars: a learned vocab must beat char-level
      assert(r.getAs[Int]("n_ulm_tokens") < 24)
      assert(r.getAs[Int]("n_ulm_tokens") >= 4)
    }
  }

  test("distributed encode equals the local viterbi, on any partitioning") {
    val vocab = Seq("a" -> -2.31, "b" -> -2.57, "ab" -> -1.93, "bb" -> -2.02)
    val rows = Seq((1L, "ab abb babb"), (2L, "bbbb"), (3L, ""), (4L, "aabba"))
    val results = Seq(1, 4).map { p =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, p)).toDF("doc_id", "text")
      UnigramLm.encode(df, vocab, maxPieceLen = 2).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    }
    assert(results.distinct.size === 1)
    val lp = vocab.toMap
    // hand-derived optima: "abb" -> a+bb (-4.33 beats ab+b -4.50),
    // "babb" -> b+a+bb (-6.90 beats b+ab+b -7.07)
    assert(results.head(1L) === Seq("ab") ++ Seq("a", "bb") ++ Seq("b", "a", "bb"))
    assert(results.head(2L) === UnigramLm.viterbi("bbbb", lp, 2).toSeq)
    assert(results.head(3L) === Seq.empty)
    assert(results.head(4L) === UnigramLm.viterbi("aabba", lp, 2).toSeq)
  }

  test("learnDistributed produces the IDENTICAL vocabulary to the in-JVM " +
      "trainer, and learn() falls back to it past the word cap") {
    val docs = Seq.tabulate(40)(i =>
        (i.toLong, "sparkle sparks spark park bark lark spa streaming"))
      .toDF("doc_id", "text")
    val local = UnigramLm.learn(docs, vocabSize = 20, maxPieceLen = 6,
      emRounds = 3)
    val dist = UnigramLm.learnDistributed(UnigramLm.wordFreq(docs),
      vocabSize = 20, maxPieceLen = 6, emRounds = 3)
    assert(dist === local,
      "distributed EM diverged from the in-JVM trainer — same corpus must " +
        "train the same (piece, logp) vocabulary bit-for-bit")
    // the cap routes through the fallback instead of refusing (the old
    // behavior was a hard require; the family now degrades like Bpe.learn)
    val viaCap = UnigramLm.learn(docs, vocabSize = 20, maxPieceLen = 6,
      emRounds = 3, maxLocalWords = 1)
    assert(viaCap === local)
  }

  test("standing vocab table round-trips and requireEncodes trips on corruption") {
    val docs = Seq.tabulate(30)(i => (i.toLong, "spark spark pipeline"))
      .toDF("doc_id", "text")
    val vocab = UnigramLm.learn(docs, vocabSize = 24, maxPieceLen = 8, emRounds = 3)
    val vt = UnigramLm.vocabTable(spark, vocab)
    assertSameRows(
      UnigramLm.encodeWith(docs, vt).drop("ulm_tokens"),
      UnigramLm.encode(docs, vocab).drop("ulm_tokens"))
    // analytic gate: "abab" must segment as ab+ab under this vocab
    val gateVocab = Seq("a" -> -2.0, "b" -> -2.0, "ab" -> -1.0)
    UnigramLm.requireEncodes(spark, gateVocab,
      Seq("abab" -> Seq("ab", "ab"), "aba" -> Seq("ab", "a")))
    // corrupted vocab (ab made expensive) must trip the gate
    val bad = Seq("a" -> -1.0, "b" -> -1.0, "ab" -> -9.0)
    intercept[IllegalArgumentException] {
      UnigramLm.requireEncodes(spark, bad, Seq("abab" -> Seq("ab", "ab")))
    }
  }
}
