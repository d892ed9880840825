package graft

import graft.llm.WordPiece
import org.apache.spark.sql.functions._

/** WordPiece has no DuckDB-expressible oracle (greedy longest-match
  * is a data-dependent loop), so correctness is pinned here: an
  * independent from-scratch reference trainer/encoder, algebraic
  * properties, determinism across partitionings, and proof that the
  * planted driver gate trips on a corrupted vocabulary. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent reference implementation (deliberately naive) ----

  private def refTokenize(text: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq

  /** Reference training: word OCCURRENCES (not the frequency table),
    * pair AND symbol counts recomputed from scratch every round,
    * argmax by exact-rational score with (a, b) tie-breaks. */
  private def refLearn(corpus: Seq[String], numMerges: Int): Seq[String] = {
    var words: Seq[Array[String]] =
      corpus.flatMap(refTokenize).map(w => WordPiece.units(w))
    val baseUnits = words.flatten.distinct.sorted
    val vocab = Seq.newBuilder[String]
    vocab ++= baseUnits
    var r = 0
    var stop = false
    while (r < numMerges && !stop) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      val sc = scala.collection.mutable.Map[String, Long]()
      words.foreach { w =>
        w.foreach(s => sc(s) = sc.getOrElse(s, 0L) + 1)
        w.toSeq.sliding(2).foreach {
          case Seq(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) + 1
          case _ =>
        }
      }
      if (pc.isEmpty) stop = true
      else {
        // exact-rational argmax: maximize n/(sc(a)*sc(b))
        val best = pc.toSeq.reduceLeft { (x, y) =>
          val ((xa, xb), xn) = x
          val ((ya, yb), yn) = y
          val l = BigInt(xn) * (BigInt(sc(ya)) * BigInt(sc(yb)))
          val rr = BigInt(yn) * (BigInt(sc(xa)) * BigInt(sc(xb)))
          val c = l.compare(rr)
          if (c > 0) x
          else if (c < 0) y
          else if (Ordering.Tuple2[String, String].lteq((xa, xb), (ya, yb))) x
          else y
        }._1
        vocab += WordPiece.joinUnits(best._1, best._2)
        words = words.map(w => WordPiece.applyMerge(w, best._1, best._2))
        r += 1
      }
    }
    vocab.result()
  }

  /** Reference greedy longest-match-first encoder. */
  private def refEncode(word: String, vocab: Set[String]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cands = (i + 1 to word.length).map { j =>
        (if (i == 0) "" else "##") + word.substring(i, j)
      }.filter(vocab.contains)
      if (cands.isEmpty) return Seq(WordPiece.Unk)
      val hit = cands.maxBy(_.length)
      out += hit
      i += hit.length - (if (i == 0) 0 else 2)
    }
    out.result()
  }

  private val corpus = Seq(
    "the cat sat on the mat",
    "the cats sat on the mats",
    "matter of the material cat",
    "a cataract on the catamaran",
    "thematic math on the mat",
    "scattered cattle in the thicket")

  // ------------------------------- units -------------------------------

  test("units and joinUnits follow the ## continuation rule") {
    assert(WordPiece.units("word").toSeq === Seq("w", "##o", "##r", "##d"))
    assert(WordPiece.units("a").toSeq === Seq("a"))
    assert(WordPiece.joinUnits("w", "##o") === "wo")
    assert(WordPiece.joinUnits("##r", "##d") === "##rd")
  }

  test("applyMerge merges left-to-right without re-overlap, absorbing ##") {
    assert(WordPiece.applyMerge(Array("a", "##b", "##c"), "a", "##b").toSeq ===
      Seq("ab", "##c"))
    assert(WordPiece.applyMerge(
      Array("##a", "##a", "##a"), "##a", "##a").toSeq === Seq("##aa", "##a"))
  }

  // ------------------------------ training ------------------------------

  test("learnLocal matches the from-scratch reference on the toy corpus") {
    for (m <- Seq(1, 3, 8, 20)) {
      val got = WordPiece.learn(corpus.toDF("text"), m)
      val want = refLearn(corpus, m)
      assert(got === want, s"numMerges=$m")
    }
  }

  test("learnLocal matches the reference at a deep merge count (512)") {
    // richer surface so 512 merges don't exhaust the pair space early
    val big = (0 until 400).map(i =>
      s"prefix${i % 37}stem${i % 13} shared${i % 7}suffix ${i % 97}tail")
    val got = WordPiece.learn(big.toDF("text"), 512)
    val want = refLearn(big, 512)
    assert(got === want)
  }

  test("training is deterministic across partitionings") {
    val df1 = corpus.toDF("text").repartition(1)
    val df7 = corpus.toDF("text").repartition(7)
    assert(WordPiece.learn(df1, 10) === WordPiece.learn(df7, 10))
  }

  test("likelihood scoring differs from raw-count BPE on a planted corpus") {
    // "xy" occurs 4 times but x,y are common; "qz" occurs 3 times with
    // rare q,z — likelihood picks (q,##z) first, raw count picks (x,##y)
    val planted = Seq.fill(4)("xy xi yo xa yu") ++ Seq.fill(3)("qz")
    val wpVocab = WordPiece.learn(planted.toDF("text"), 1)
    val merged = wpVocab.filterNot(p =>
      p.length == 1 || (p.startsWith("##") && p.length == 3))
    assert(merged === Seq("qz"))
    val bpeMerge = graft.llm.Bpe.learn(planted.toDF("text"), 1).head
    assert(bpeMerge._1 == "x" || bpeMerge._2 == "y")
  }

  test("distributed fallback agrees with the in-JVM trainer") {
    val wf = WordPiece.wordFreq(corpus.toDF("text"))
    val got = WordPiece.learnDistributed(wf, 8)
    val want = WordPiece.learn(corpus.toDF("text"), 8)
    assert(got === want)
  }

  // ------------------------------ encoding ------------------------------

  test("encodeWord is greedy longest-match-first with whole-word UNK") {
    val vocab = Set("un", "##aff", "##able", "##ably", "aff", "##ord",
      "a", "##f", "##o", "##r", "##d")
    assert(WordPiece.encodeWord("unaffable", vocab).toSeq ===
      Seq("un", "##aff", "##able"))
    assert(WordPiece.encodeWord("afford", vocab).toSeq ===
      Seq("aff", "##ord"))
    // 'x' has no piece anywhere -> whole word collapses to UNK
    assert(WordPiece.encodeWord("affx", vocab).toSeq === Seq(WordPiece.Unk))
    // over-long words short-circuit to UNK
    assert(WordPiece.encodeWord("a" * 201, vocab + "##a").toSeq ===
      Seq(WordPiece.Unk))
  }

  test("distributed encode matches the reference encoder word-for-word") {
    val vocab = WordPiece.learn(corpus.toDF("text"), 24)
    val vset = vocab.toSet
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(5)
    val got = WordPiece.encode(docs, vocab).orderBy("doc_id")
      .select("wp_tokens").as[Seq[String]].collect()
    val want = corpus.map(t => refTokenize(t).flatMap(refEncode(_, vset)))
    assert(got.toSeq.map(_.toList) === want.map(_.toList))
  }

  test("encoding a corpus word under its own training never yields UNK") {
    val vocab = WordPiece.learn(corpus.toDF("text"), 5)
    val docs = corpus.toDF("text").withColumn("doc_id", lit(1L))
    val toks = WordPiece.encode(docs, vocab)
      .select(explode(col("wp_tokens")).as("t"))
      .filter(col("t") === WordPiece.Unk).count()
    assert(toks === 0L) // base units always cover training words
  }

  test("encodeWith round-trips through the persisted vocab table") {
    val vocab = WordPiece.learn(corpus.toDF("text"), 12)
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val direct = WordPiece.encode(docs, vocab).orderBy("doc_id")
      .select("wp_tokens").as[Seq[String]].collect().toSeq
    val viaTable = WordPiece.encodeWith(docs,
        WordPiece.vocabTable(spark, vocab)).orderBy("doc_id")
      .select("wp_tokens").as[Seq[String]].collect().toSeq
    assert(direct === viaTable)
  }

  test("token counts: concatenation identity and n_words agreement") {
    val vocab = WordPiece.learn(corpus.toDF("text"), 16)
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rows = WordPiece.encode(docs, vocab)
      .select("doc_id", "wp_tokens", "n_words", "n_wp_tokens").collect()
    rows.foreach { r =>
      val toks = r.getSeq[String](1)
      assert(r.getInt(3) === toks.size)
      // strip ## markers and concatenate -> the original word stream
      val joined = toks.map(_.stripPrefix("##")).mkString
      val want = refTokenize(corpus(r.getLong(0).toInt)).mkString
      assert(joined === want)
    }
    // fewer merges can never DECREASE token counts
    val fewer = WordPiece.learn(corpus.toDF("text"), 2)
    val nF = WordPiece.encode(docs, fewer).agg(sum("n_wp_tokens")).head().getLong(0)
    val nM = WordPiece.encode(docs, vocab).agg(sum("n_wp_tokens")).head().getLong(0)
    assert(nF >= nM)
  }

  // ------------------------------- gate --------------------------------

  test("requireEncodes trips on a corrupted vocabulary") {
    val vocab = Seq("un", "##aff", "##able", "u", "##n", "##a", "##f",
      "##b", "##l", "##e")
    val want = Seq("un", "##aff", "##able")
    // sanity: the real vocab passes
    WordPiece.requireEncodes(spark, vocab, Seq(("unaffable", want)))
    // corrupt: drop every multi-char piece so the plant encodes to units
    val corrupted = vocab.filter(p => p.stripPrefix("##").length == 1)
    val ex = intercept[IllegalArgumentException] {
      WordPiece.requireEncodes(spark, corrupted, Seq(("unaffable", want)))
    }
    assert(ex.getMessage.contains("wordpiece encode gate"))
  }
}
