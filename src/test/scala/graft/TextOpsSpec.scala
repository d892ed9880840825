package graft

import graft.llm.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  test("chunk covers every token once per window with exact overlap") {
    import spark.implicits._
    val words = (1 to 25).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, words), (2L, "a b c"), (3L, "   ")).toDF("doc_id", "text")
    val got = TextOps.chunk(df, chunkTokens = 10, overlap = 3)
      .as[(Long, Int, String, Int)].collect().sortBy(r => (r._1, r._2))
    // doc 1: 25 tokens, stride 7 -> chunks at 0,7,14 + final window catching 25
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq === Seq(0, 1, 2, 3))
    assert(d1(0)._3.startsWith("w1 ") && d1(0)._4 === 10)
    assert(d1(1)._3.startsWith("w8 "))               // overlap of 3: w8,w9,w10 shared
    assert(d1(3)._3.endsWith(" w25") && d1(3)._4 === 4) // last, short
    // consecutive chunks share exactly `overlap` tokens
    val t0 = d1(0)._3.split(" ").toSet; val t1 = d1(1)._3.split(" ").toSet
    assert(t0.intersect(t1).size === 3)
    // short doc: single chunk, whole doc; blank doc: no chunks
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0, "a b c", 3)))
    assert(!got.exists(_._1 == 3L))
    // every token of doc 1 appears in some chunk
    val covered = d1.flatMap(_._3.split(" ")).toSet
    assert(covered === (1 to 25).map(i => s"w$i").toSet)
  }

  test("redact replaces every PII occurrence and leaves clean text alone") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "mail a@b.org and c.d+x@e-f.co twice, call 555-123-4567, from 10.0.0.1"),
      (2L, "no pii here at all"),
      (3L, "almost: 1234-123-4567 is not a phone, 1.2.3 not an ip")
    ).toDF("doc_id", "text")
    val got = TextOps.redact(df).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "mail <EMAIL> and <EMAIL> twice, call <PHONE>, from <IP>")
    assert(got(2L) === "no pii here at all")
    assert(got(3L) === "almost: 1234-123-4567 is not a phone, 1.2.3 not an ip")
    // custom patterns + order
    val custom = TextOps.redact(df, patterns = Seq("[0-9]+" -> "#"))
    assert(custom.filter(col("doc_id") === 1L).head.getAs[String]("text")
      === "mail a@b.org and c.d+x@e-f.co twice, call #-#-#, from #.#.#.#")
  }

  test("redact is case-insensitive on emails: mixed case is still PII") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact John.Doe@Example.COM please"),
      (2L, "ALLCAPS@HOST.ORG and MiXeD.cAsE+tag@Sub.Domain.Net")
    ).toDF("doc_id", "text")
    val got = TextOps.redact(df).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "contact <EMAIL> please")
    assert(got(2L) === "<EMAIL> and <EMAIL>")
  }
  test("gopherRepetition counts duplicate lines/paragraphs and n-gram masses exactly") {
    import spark.implicits._
    val df = Seq(
      // 3× repeated line + 1 unique; one paragraph
      (1L, "hello world\nhello world\nhello world\nunique line here"),
      // long clean doc: 60 distinct words, nothing repeats
      (2L, (1 to 60).map(i => s"w$i").mkString(" ")),
      // a 5-gram repeated back-to-back, then distinct filler
      (3L, "alpha beta gamma delta epsilon alpha beta gamma delta epsilon end"),
      // repeated paragraph (blank lines separate paragraphs)
      (4L, "para one text\n\npara one text\n\nother para"),
      (5L, "")).toDF("doc_id", "text")
    val got = TextOps.gopherRepetition(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    val d1 = got(1L)
    assert(d1.getAs[Long]("n_lines") === 4L)
    assert(d1.getAs[Long]("n_dup_lines") === 2L)
    assert(d1.getAs[Long]("n_line_chars") === 49L)     // 3*11 + 16
    assert(d1.getAs[Long]("n_dup_line_chars") === 22L) // 2 extra copies * 11
    assert(d1.getAs[Long]("n_paras") === 1L)
    assert(d1.getAs[Long]("n_words") === 9L)
    assert(d1.getAs[Long]("top_2gram_chars") === 30L)  // "hello world" x3 * 10 chars
    assert(d1.getAs[Int]("passes_repetition") === 0)   // dup-line fraction 2/4 > 0.3

    val d2 = got(2L)
    assert(d2.getAs[Long]("n_words") === 60L)
    assert(d2.getAs[Long]("n_dup_lines") === 0L)
    assert(d2.getAs[Long]("dup_5gram_chars") === 0L)
    assert(d2.getAs[Int]("passes_repetition") === 1)

    val d3 = got(3L)
    // "alpha beta gamma delta epsilon" repeats at positions 0 and 5:
    // one extra occurrence * 26 token chars
    assert(d3.getAs[Long]("dup_5gram_chars") === 26L)
    assert(d3.getAs[Int]("passes_repetition") === 0)

    val d4 = got(4L)
    assert(d4.getAs[Long]("n_paras") === 3L)
    assert(d4.getAs[Long]("n_dup_paras") === 1L)
    assert(d4.getAs[Long]("n_para_chars") === 36L)     // 2*13 + 10
    assert(d4.getAs[Long]("n_dup_para_chars") === 13L)
    assert(d4.getAs[Long]("n_lines") === 3L)           // blank lines don't compete
    assert(d4.getAs[Int]("passes_repetition") === 0)   // dup-para fraction 1/3 > 0.3

    val d5 = got(5L)
    assert(d5.getAs[Long]("n_words") === 0L)
    assert(d5.getAs[Int]("passes_repetition") === 0)   // empty docs never pass
  }

  test("gopherRepetition agrees with an independent quadratic reference on random text") {
    import spark.implicits._
    // independent reimplementation: quadratic count-by-scan, no hash maps,
    // so a kernel bug and a reference bug can't coincide
    def trimSp(s: String) = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    def stats(items: Seq[String]): (Long, Long, Long, Long) = {
      val d = items.distinct
      val dupChars = d.map { x =>
        val c = items.count(_ == x)
        if (c > 1) (c - 1).toLong * x.length else 0L
      }.sum
      (items.size.toLong, (items.size - d.size).toLong,
        items.map(_.length.toLong).sum, dupChars)
    }
    def ref(text: String): Seq[Long] = {
      val lines = text.split("\n").toSeq.map(trimSp).filter(_.nonEmpty)
      val paras = text.split("\n\n").toSeq.map(trimSp).filter(_.nonEmpty)
      val (nl, dl, cl, dcl) = stats(lines)
      val (np, dp, cp, dcp) = stats(paras)
      val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
      def gramsOf(n: Int) = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      def topMass(n: Int): Long = {
        val gs = gramsOf(n)
        val masses = gs.distinct.map { g =>
          val c = gs.count(_ == g)
          (c, c.toLong * (g.length - (n - 1)))
        }
        if (masses.isEmpty) 0L else masses.max._2
      }
      def dupMass(n: Int): Long = {
        val gs = gramsOf(n)
        gs.distinct.map { g =>
          val c = gs.count(_ == g)
          if (c > 1) (c - 1).toLong * (g.length - (n - 1)) else 0L
        }.sum
      }
      val wc = toks.map(_.length.toLong).sum
      Seq(toks.size.toLong, wc, nl, dl, cl, dcl, np, dp, cp, dcp,
        topMass(2), topMass(3), topMass(4),
        dupMass(5), dupMass(6), dupMass(7), dupMass(8), dupMass(9), dupMass(10))
    }
    // fixed-seed random docs over a collision-prone alphabet (few distinct
    // tokens => real duplicates; spaces/newlines/punct exercise trimming)
    val rnd = new scala.util.Random(7)
    val alphabet = "ab c\nd.# "
    val texts = (0 until 40).map { i =>
      (i.toLong, (0 until rnd.nextInt(200)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val got = TextOps.gopherRepetition(texts.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.toSeq.drop(1).dropRight(1).map(_.asInstanceOf[Long]))
      .toMap
    texts.foreach { case (id, text) =>
      assert(got(id) === ref(text), s"doc $id mismatch, text=${text.replace("\n", "\\n")}")
    }
  }

  import spark.implicits._

  private def docs = Seq(
    (1L, "The cat sat on the mat."),
    (2L, "The cat sat on the mat."),
    (3L, "Der Hund und die Katze."),
    (4L, "le chat et la souris"),
    (5L, "")).toDF("doc_id", "text")

  test("exactDedup keeps min-id doc of each text group") {
    val kept = TextOps.exactDedup(docs).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 4L, 5L))
  }

  test("exactDedupStats counts duplicates") {
    val stats = TextOps.exactDedupStats(docs)
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toMap
    assert(stats(1L) === 2L)
    assert(stats(3L) === 1L)
  }

  test("textQuality counts are exact") {
    val r = TextOps.textQuality(docs).filter($"doc_id" === 1).collect()(0)
    assert(r.getAs[Int]("n_chars") === 23)
    assert(r.getAs[Int]("n_spaces") === 5)
    assert(r.getAs[Int]("n_upper") === 1)
    assert(r.getAs[Int]("n_sentence_punct") === 1)
  }

  test("tokenCount segmentations") {
    val r = TextOps.tokenCount(docs).filter($"doc_id" === 1).collect()(0)
    assert(r.getAs[Int]("n_ws_tokens") === 6)
    assert(r.getAs[Int]("n_word_tokens") === 6)
    assert(r.getAs[Int]("n_bpeish_tokens") === 7) // 6 words + '.'
  }

  test("langId picks the dominant stopword profile") {
    val preds = TextOps.langId(docs)
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    assert(preds(1L) === "en")
    assert(preds(3L) === "de")
    assert(preds(4L) === "fr")
  }

  test("repetitionSignals counts duplicate lines and bigrams exactly") {
    val d = Seq(
      (1L, "a b c\na b c\nx y"),   // dup line; bigrams: ab,bc,ca,ab,bc,cx,xy
      (2L, "one"),                  // no bigrams
      (3L, "")).toDF("doc_id", "text")
    // per doc: (n_lines, n_distinct_lines, n_word_2grams, n_distinct_2grams)
    val m = TextOps.repetitionSignals(d).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    assert(m(1L) === ((3, 2, 7, 5)))
    assert(m(2L) === ((1, 1, 0, 0)))
    assert(m(3L) === ((1, 1, 0, 0)))
  }

  test("fingerprint is case/punctuation-insensitive on the token stream") {
    val pair = Seq((1L, "Hello, World!"), (2L, "hello world")).toDF("doc_id", "text")
    val fps = TextOps.fingerprint(pair).select("fingerprint").as[String].collect()
    assert(fps(0) === fps(1))
  }

  test("dedupParagraphs: global first occurrence survives, docs reconstruct in order") {
    val d = Seq(
      (1L, "alpha beta\nshared boilerplate\ngamma"),
      (2L, "shared boilerplate\ndelta\n\nepsilon"),
      (3L, "shared boilerplate\nshared boilerplate\nzeta")).toDF("doc_id", "text")
    val m = TextOps.dedupParagraphs(d)
      .select("doc_id", "clean_text", "n_paras", "n_paras_kept")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1 owns the first occurrence; later copies vanish
    assert(m(1L)._2 === "alpha beta\nshared boilerplate\ngamma")
    assert(m(1L)._3 === 3 && m(1L)._4 === 3)
    // doc 2 loses the duplicate but keeps its layout empty line
    assert(m(2L)._2 === "delta\n\nepsilon")
    assert(m(2L)._3 === 4 && m(2L)._4 === 3)
    // doc 3 loses BOTH copies
    assert(m(3L)._2 === "zeta")
    assert(m(3L)._4 === 1)
  }

  test("gopherQuality: the published rules gate on exact integer arithmetic") {
    val good = (("the quick brown fox jumps over the lazy dog and then " * 6) +
      "we have that to be of note with care.").trim
    val tooShort = "the and of one two."                         // < 50 words
    val symbols = good + " " + ("#tag " * 30)                    // symbol ratio >= 0.1
    val bullets = (0 until 20).map(i => s"- item $i").mkString("\n") // 100% bullets
    val noStops = ("lorem ipsum dolor sit amet consectetur " * 10).trim
    val d = Seq((1L, good), (2L, tooShort), (3L, symbols), (4L, bullets),
      (5L, noStops)).toDF("doc_id", "text")
    val m = TextOps.gopherQuality(d).select("doc_id", "passes_gopher")
      .as[(Long, Int)].collect().toMap
    assert(m(1L) === 1, "well-formed prose passes")
    assert(m(2L) === 0, "under the word-count floor")
    assert(m(3L) === 0, "symbol ratio over 10%")
    assert(m(4L) === 0, "all-bullet document")
    assert(m(5L) === 0, "no common stop words")
  }

  test("c4LineFilter keeps punctuated >=5-word lines and gates the document") {
    val text = Seq(
      "This is a proper sentence with enough words.",   // kept
      "Short line.",                                    // < 5 words
      "This line has no terminal punctuation at all",   // no [.!?"]
      "Enable javascript to view this fancy page now.", // javascript
      "Another good sentence follows right here today!",
      "And a third full sentence closes the document?").mkString("\n")
    val d = Seq((1L, text), (2L, "Tiny doc. With two lines.")).toDF("doc_id", "text")
    val rows = TextOps.c4LineFilter(d)
      .select("doc_id", "clean_text", "n_lines", "n_lines_kept", "keep_doc")
      .as[(Long, String, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    val (_, clean, nLines, nKept, keep) = rows(1L)
    assert(nLines === 6 && nKept === 3 && keep === 1)
    assert(clean.linesIterator.size === 3)
    assert(!clean.contains("javascript") && !clean.contains("Short line"))
    // doc 2: its one line survives (5 words, punctuated) but the document
    // fails the >=3-sentences gate
    assert(rows(2L)._4 === 1 && rows(2L)._5 === 0)
  }

  test("rareTokenScore counts rare-token mass against the corpus's own LM") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a a a b"), // corpus: a=9, b=1 → b rare at minFreq=2
      (2L, "a a a a"),
      (3L, "")).toDF("doc_id", "text")
    val m = TextOps.rareTokenScore(d, minFreq = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(m(1L) === ((6L, 2L, 1L, 1)))  // 1 rare occurrence; 5·1 ≤ 6 passes
    assert(m(2L) === ((4L, 1L, 0L, 1)))
    assert(m(3L) === ((0L, 0L, 0L, 0)))  // token-less docs survive, fail the gate
  }

  test("rareTokenScoreWith: unseen tokens are maximally rare; matches inline on self-LM") {
    import spark.implicits._
    val corpus = Seq((1L, "a a a b"), (2L, "a b b")).toDF("doc_id", "text")
    val batch = Seq((10L, "a z z z z z")).toDF("doc_id", "text")
    // LM: a=4, b=3 — z unseen (freq 0 < 2). batch: 6 tokens, 5 rare → fails 5·5 ≤ 6
    val lm = TextOps.unigramModel(corpus)
    val r = TextOps.rareTokenScoreWith(batch, lm, minFreq = 2).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)) === ((6L, 2L, 5L, 0)))
    // the one-shot op IS the incremental op against its own model
    assertSameRows(
      TextOps.rareTokenScore(corpus, minFreq = 2),
      TextOps.rareTokenScoreWith(corpus, lm, minFreq = 2))
  }

  test("corpusProfile: exact lower median with deterministic tie rank") {
    import spark.implicits._
    val d = Seq(
      (1L, "g1", 10L), (2L, "g1", 30L), (3L, "g1", 20L), (4L, "g1", 40L),
      (5L, "g2", 7L)).toDF("doc_id", "lang", "n_chars")
    val m = TextOps.corpusProfile(d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // g1: n=4 → rank (4+1) div 2 = 2 → sorted sizes 10,20,30,40 → median 20
    assert(m("g1") === ((4L, 100L, 10L, 40L, 20L)))
    assert(m("g2") === ((1L, 7L, 7L, 7L, 7L)))
  }

  test("tfidfKeywords ranks by exact linear tf-idf with token tiebreak") {
    import spark.implicits._
    val d = Seq(
      (1L, "x x y z"),
      (2L, "y z"),
      (3L, "z")).toDF("doc_id", "text")
    // df: x=1 y=2 z=3, n=3 → d1 scores: x=6.0, y=1.5, z=1.0
    val got = TextOps.tfidfKeywords(d, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getDouble(5)))
      .toMap
    assert(got((1L, 1)) === (("x", 6.0)))
    assert(got((1L, 2)) === (("y", 1.5)))
    assert(got((2L, 1)) === (("y", 1.5)))
    assert(got((2L, 2)) === (("z", 1.0)))
    assert(got((3L, 1)) === (("z", 1.0)))
    assert(got.size === 5)
  }

  test("property: rareTokenScore equals a naive per-doc recompute on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c", "dd", "ee", "f0")
    val docGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word))
    val corpusGen = Gen.listOfN(8, docGen)
    val prop = Prop.forAll(corpusGen) { corpus =>
      val df = corpus.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextOps.rareTokenScore(df, minFreq = 2).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
      val freq = corpus.flatten.groupBy(identity).view.mapValues(_.size).toMap
      corpus.zipWithIndex.forall { case (ws, i) =>
        val nTok = ws.size.toLong
        val nDis = ws.distinct.size.toLong
        val nRare = ws.count(w => freq(w) < 2).toLong
        val passes = if (nTok > 0 && nRare * 5 <= nTok) 1 else 0
        got(i.toLong) == ((nTok, nDis, nRare, passes))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, s"rareTokenScore mismatch vs naive: ${res.status}")
  }

  test("property: tfidfKeywords top-k equals a naive ranking on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c", "dd", "ee")
    val docGen = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, word))
    val prop = Prop.forAll(Gen.listOfN(6, docGen)) { corpus =>
      val df = corpus.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextOps.tfidfKeywords(df, k = 2).collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
      val n = corpus.size.toLong
      val dfreq = corpus.map(_.distinct).flatten.groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      corpus.zipWithIndex.forall { case (ws, i) =>
        val ranked = ws.groupBy(identity).view.mapValues(_.size.toLong).toSeq
          .map { case (t, tf) => (t, (tf * n).toDouble / dfreq(t)) }
          .sortBy { case (t, s) => (-s, t) }
          .take(2).map(_._1)
        ranked.zipWithIndex.forall { case (t, r) => got((i.toLong, r + 1)) == t }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, s"tfidfKeywords mismatch vs naive: ${res.status}")
  }

  test("property: tfidfKeywordsWith against the corpus's own model ≡ one-shot") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c", "dd", "ee")
    val docGen = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, word))
    val prop = Prop.forAll(Gen.listOfN(6, docGen)) { corpus =>
      val df = corpus.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val oneShot = TextOps.tfidfKeywords(df, k = 2).collect()
        .map(r => (r.getLong(0), r.getInt(1)) ->
          ((r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
      val split = TextOps.tfidfKeywordsWith(df, TextOps.docFreqModel(df), k = 2)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) ->
          ((r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
      oneShot == split
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, s"split form diverged from one-shot: ${res.status}")
  }

  test("tfidfKeywordsWith: standing model scores a batch; OOV tokens get df=1") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "x x y z"),
      (2L, "y z"),
      (3L, "z")).toDF("doc_id", "text")
    val model = TextOps.docFreqModel(corpus) // df: x=1 y=2 z=3, n_docs=3
    val batch = Seq((10L, "y qq z")).toDF("doc_id", "text")
    val got = TextOps.tfidfKeywordsWith(batch, model, k = 3).collect()
      .map(r => r.getInt(1) -> ((r.getString(2), r.getLong(4), r.getDouble(5))))
      .toMap
    // qq is OOV → df=1 → score 1*3/1 = 3.0, ranked above y (1.5) and z (1.0)
    assert(got(1) === (("qq", 1L, 3.0)))
    assert(got(2) === (("y", 2L, 1.5)))
    assert(got(3) === (("z", 3L, 1.0)))
  }

  test("property: corpusProfile median equals the naive sorted lower median") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val rowGen = for {
      g <- Gen.oneOf("g1", "g2", "g3")
      sz <- Gen.chooseNum(0L, 9L) // narrow domain → plenty of duplicate sizes
    } yield (g, sz)
    val prop = Prop.forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, sz), i) => (i.toLong, g, sz) }
        .toDF("doc_id", "lang", "n_chars")
      val got = TextOps.corpusProfile(df).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(5))).toMap
      rows.groupBy(_._1).forall { case (g, rs) =>
        val sizes = rs.map(_._2).sorted
        val median = sizes(((sizes.size + 1) / 2) - 1)
        got(g) == ((rs.size.toLong, median))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, s"corpusProfile mismatch vs naive: ${res.status}")
  }

  test("normalizeText: tabs→spaces, controls dropped, runs collapsed, edges trimmed") {
    import spark.implicits._
    val d = Seq(
      (1L, "  Hello\tworld! \n \n\n\n  line\r two  "),
      (2L, "clean")).toDF("doc_id", "text")
    val m = TextOps.normalizeText(d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(m(1L)._1 === "Hello world!\n\nline two")
    assert(m(1L)._2 === 34 && m(1L)._3 === 22)
    assert(m(2L) === (("clean", 5, 5)))
  }

  test("bigramModel counts adjacent pairs exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the cat mat"),
      (2L, "the cat")).toDF("doc_id", "text")
    val m = graft.llm.TextOps.bigramModel(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("the", "cat")) == 3L) // twice in doc1, once in doc2
    assert(m(("cat", "sat")) == 1L && m(("on", "the")) == 1L &&
      m(("cat", "mat")) == 1L && m(("sat", "on")) == 1L)
    assert(m.values.sum == 7L) // 6 transitions in doc1 + 1 in doc2
  }

  test("bigram_ppl matches an in-JVM reference (interpolated backoff)") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c a b c a b"),
      (2L, "c b a"),
      (3L, "b b b a")).toDF("doc_id", "text")
    val got = graft.llm.TextOps.bigramScore(corpus, minFreq = 2, lambda = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

    // independent reference: count from raw strings
    def toks(s: String) = s.split(" ").toSeq
    val texts = Map(1L -> "a b c a b c a b", 2L -> "c b a", 3L -> "b b b a")
    val uni = texts.values.flatMap(toks).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = texts.values.flatMap(t => toks(t).sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = uni.values.sum.toDouble
    val v = uni.size.toDouble
    texts.foreach { case (id, t) =>
      val pairs = toks(t).sliding(2).map(p => (p(0), p(1))).toSeq
      val nll = pairs.map { case (w1, w2) =>
        val p = 0.9 * (bi.getOrElse((w1, w2), 0L).toDouble /
            math.max(uni.getOrElse(w1, 0L).toDouble, 1.0)) +
          0.1 * ((uni.getOrElse(w2, 0L).toDouble + 1.0) / (n + v))
        -math.log(p)
      }
      val want = math.exp(nll.sum / nll.size)
      val (nb, _, ppl) = got(id)
      assert(nb == pairs.size.toLong)
      assert(math.abs(ppl - want) < 1e-9,
        s"doc $id ppl $ppl != reference $want")
    }
  }

  test("bigramScoreWith flags unseen transitions against a standing LM") {
    import spark.implicits._
    val standing = Seq(
      (1L, "the quick brown fox jumps the quick brown fox jumps"),
      (2L, "the quick brown fox jumps over it")).toDF("doc_id", "text")
    val lmB = graft.llm.TextOps.bigramModel(standing)
    val lmU = graft.llm.TextOps.unigramModel(standing)
    val batch = Seq(
      (10L, "the quick brown fox"),   // transitions all seen >= 2
      (11L, "fox brown quick the"),   // scrambled: transitions unseen
      (12L, "x")).toDF("doc_id", "text") // single token: no bigrams
    val got = graft.llm.TextOps.bigramScoreWith(batch, lmB, lmU, minFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(4)))).toMap
    assert(got(10L) == ((3L, 3L, 1)))
    assert(got(11L)._2 == 0L && got(11L)._3 == 0)
    assert(got(12L) == ((0L, 0L, 0)))
    // the fluent doc's perplexity beats the scrambled doc's
    val ppls = graft.llm.TextOps.bigramScoreWith(batch, lmB, lmU, minFreq = 2)
      .filter(org.apache.spark.sql.functions.col("bigram_ppl").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ppls(10L) < ppls(11L),
      s"fluent ppl ${ppls(10L)} should beat scrambled ${ppls(11L)}")
  }

  test("collocations: Mikolov phrase score with discount, total order, top-k cut") {
    import spark.implicits._
    // "new york" appears 4x adjacent; "the the" 3x from frequent parts;
    // N = total tokens. delta = 2 drops pairs with c_xy <= 2.
    val docs = Seq(
      (1L, "new york new york the city"),
      (2L, "new york the the the city"),
      (3L, "new york the the the city")).toDF("doc_id", "text")
    val out = graft.llm.TextOps.collocations(docs, minCount = 2, k = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toSeq
    val m = out.toMap
    // hand counts: tokens N=18; c(new)=4, c(york)=4, c(the)=7, c(city)=3
    // pairs: (new,york)=4, (york,new)=1, (york,the)=3, (the,the)=4,
    //        (the,city)=3, (city ends docs)
    assert(m(("new", "york")) == ((4L, 4L, 4L, (4.0 - 2) * 18 / (4.0 * 4))))
    assert(m(("the", "the")) == ((4L, 7L, 7L, (4.0 - 2) * 18 / (7.0 * 7))))
    assert(m(("york", "the")) == ((3L, 4L, 7L, (3.0 - 2) * 18 / (4.0 * 7))))
    assert(m(("the", "city")) == ((3L, 7L, 3L, (3.0 - 2) * 18 / (7.0 * 3))))
    assert(!m.contains(("york", "new")), "c_xy <= delta must drop")
    // ranking: (new,york) 2.25 > (the,city) ~0.857 > (york,the) ~0.643
    //          > (the,the) ~0.735 ... compute: (the,the)=2*18/49=0.7347
    val ranked = out.map(_._1)
    assert(ranked.head == (("new", "york")))
    // k cut: k=2 keeps exactly the top two by (score desc, w1, w2)
    val top2 = graft.llm.TextOps.collocations(docs, minCount = 2, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(top2 == ranked.take(2))
  }

  test("cooccurrencePmi: hand-counted windowed pairs, unordered " +
      "canonicalization, self-pairs, window bound") {
    import spark.implicits._
    // doc: a b c a  → window 2 ordered pairs: (a,b),(b,c),(c,a),(a,c),(b,a)
    // unordered: (a,b)×2, (b,c)×1, (a,c)×2
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val out = graft.llm.TextOps.cooccurrencePmi(docs, window = 2,
        minCount = 1, k = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    // minCount=1 keeps pairs with cnt > 1 only
    assert(out === Map(("a", "b") -> 2L, ("a", "c") -> 2L))
    // window 1 reduces to adjacent pairs: (a,b),(b,c),(c,a) — all cnt 1,
    // so nothing survives cnt > 1
    assert(graft.llm.TextOps.cooccurrencePmi(docs, window = 1,
      minCount = 1, k = 10).count() === 0L)
    // self-pairs within the window count: "x y x" window 2 → (x,x) once
    val d2 = Seq((1L, "x y x x")).toDF("doc_id", "text")
    val self = graft.llm.TextOps.cooccurrencePmi(d2, window = 2,
        minCount = 1, k = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    // ordered window-2 pairs of x y x x: (x,y),(y,x),(x,x)@d1,(x,x)@d2,
    // (y,x)@d2 → unordered (x,x)×2, (x,y)×3
    assert(self === Map(("x", "x") -> 2L, ("x", "y") -> 3L))
    // pairs never cross documents
    val d3 = Seq((1L, "p q"), (2L, "q p")).toDF("doc_id", "text")
    val cross = graft.llm.TextOps.cooccurrencePmi(d3, window = 4,
      minCount = 1, k = 10).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(cross === Map(("p", "q") -> 2L))
  }
}
