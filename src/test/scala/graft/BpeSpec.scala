package graft

import graft.llm.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

/** BPE has no DuckDB-expressible oracle (rank-greedy merging is a
  * data-dependent fixpoint), so correctness is pinned here instead:
  * an independent in-memory reference implementation, algebraic
  * properties, and determinism across partitionings. */
class BpeSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  // ---- independent reference implementation (deliberately naive) ----

  private def refTokenize(text: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq

  /** Reference training: pair counts over raw word OCCURRENCES (not the
    * word-frequency table), recomputed from scratch each round. */
  private def refLearn(corpus: Seq[String], numMerges: Int): Seq[(String, String)] = {
    var words: Seq[Seq[String]] =
      corpus.flatMap(refTokenize).map(_.map(_.toString))
    val merges = Seq.newBuilder[(String, String)]
    var r = 0
    var stop = false
    while (r < numMerges && !stop) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { w =>
        w.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
          case _ =>
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.map(w =>
          Bpe.applyMerge(w.toArray, best._1, best._2).toSeq)
        r += 1
      }
    }
    merges.result()
  }

  private def refEncode(text: String, merges: Seq[(String, String)]): Seq[String] = {
    val ranks = merges.zipWithIndex.toMap
    refTokenize(text).flatMap(w => Bpe.encodeWord(w, ranks))
  }

  // ------------------------------- specs -------------------------------

  test("applyMerge merges left-to-right without re-overlap") {
    assert(Bpe.applyMerge(Array("a", "b", "c"), "a", "b").toSeq === Seq("ab", "c"))
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq === Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "b", "a", "b"), "a", "b").toSeq === Seq("ab", "ab"))
    assert(Bpe.applyMerge(Array("x"), "a", "b").toSeq === Seq("x"))
    assert(Bpe.applyMerge(Array[String](), "a", "b").toSeq === Seq())
  }

  test("encodeWord applies merges rank-greedily to the fixpoint") {
    // ranks: (l,o)=0, (lo,w)=1 — "lower" → lo w e r → low e r
    val ranks = Map(("l", "o") -> 0, ("lo", "w") -> 1)
    assert(Bpe.encodeWord("lower", ranks).toSeq === Seq("low", "e", "r"))
    // unknown word: stays at character level
    assert(Bpe.encodeWord("xyz", ranks).toSeq === Seq("x", "y", "z"))
    // rank order matters: lower rank wins even when it appears later
    val r2 = Map(("b", "c") -> 0, ("a", "b") -> 1)
    assert(Bpe.encodeWord("abc", r2).toSeq === Seq("a", "bc"))
  }

  test("learn matches the occurrence-level reference on small corpora") {
    val corpora = Table("corpus",
      Seq("the cat sat on the mat", "the cat ate the rat"),
      Seq("aaa aaab aab", "abab baba"),
      Seq("low lower lowest", "new newer newest", "wide wider widest"))
    forAll(corpora) { corpus =>
      val got = Bpe.learn(corpus.toDF("text"), numMerges = 6)
      assert(got === refLearn(corpus, 6),
        s"distributed training diverged from the reference on $corpus")
    }
  }

  test("learn stops early when no pair repeats and is partitioning-independent") {
    val one = Seq("ab").toDF("text")
    // "ab" has exactly one pair; after merging it nothing is left
    assert(Bpe.learn(one, numMerges = 10) === Seq(("a", "b")))
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    assert(Bpe.learn(docs, 5) === Bpe.learn(docs.repartition(7), 5))
  }

  test("encode matches the reference and concatenation is the identity") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(30)
      .select("doc_id", "text").cache()
    val merges = Bpe.learn(docs, numMerges = 12)
    val got = Bpe.encode(docs, merges).collect()
    val texts = docs.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    got.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      val toks = row.getAs[scala.collection.Seq[String]]("bpe_tokens").toSeq
      assert(toks === refEncode(texts(id), merges), s"doc $id diverged")
      // tokens concatenate back to exactly the tokenized text
      assert(toks.mkString === refTokenize(texts(id)).mkString, s"doc $id lossy")
      // merging can only shrink the sequence, never below the word count
      assert(row.getAs[Int]("n_bpe_tokens") >= row.getAs[Int]("n_words"))
    }
  }

  test("more merges never increase a document's token count") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(30)
      .select("doc_id", "text").cache()
    val merges = Bpe.learn(docs, numMerges = 12)
    val few = Bpe.encode(docs, merges.take(4))
      .select(col("doc_id"), col("n_bpe_tokens").as("n_few"))
    val many = Bpe.encode(docs, merges)
      .select(col("doc_id"), col("n_bpe_tokens").as("n_many"))
    val bad = few.join(many, "doc_id").filter(col("n_many") > col("n_few")).count()
    assert(bad === 0, "a merge increased some document's token count")
  }

  test("512-merge training matches the reference — production merge counts stay exact") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(80)
      .select("text").cache()
    val corpus = docs.collect().map(_.getString(0)).toSeq
    val got = Bpe.learn(docs, numMerges = 512)
    val want = refLearn(corpus, 512)
    assert(got.length === want.length)
    assert(got === want, "in-JVM incremental trainer diverged from the reference at depth")
  }

  test("property: incremental trainer equals the naive reference on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // a 3-letter alphabet maximizes pair collisions, count ties and
    // re-merge chains — the adversarial regime for incremental counts
    val wordGen = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpusGen = Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, wordGen))
    val prop = Prop.forAll(corpusGen, Gen.choose(1, 20)) { (words, merges) =>
      val wf = words.groupBy(identity)
        .map { case (w, g) => (w, g.size.toLong) }.toArray
      Bpe.learnLocal(wf, merges) == refLearn(Seq(words.mkString(" ")), merges)
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("the local and distributed trainers agree (maxLocalWords=0 forces the fallback)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(40)
      .select("text").cache()
    assert(Bpe.learn(docs, 8) === Bpe.learn(docs, 8, maxLocalWords = 0))
  }

  test("training runs O(1) Spark jobs regardless of merge count") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(80)
      .select("text").localCheckpoint() // stage the input outside the window
    val sc = spark.sparkContext
    sc.setJobGroup("bpe-jobcount", "bpe 512-merge training")
    try Bpe.learn(docs, numMerges = 512)
    finally sc.clearJobGroup()
    val jobs = sc.statusTracker.getJobIdsForGroup("bpe-jobcount").length
    // one wordFreq scan+collect (limit may split into a couple of jobs) —
    // NOT one aggregation per merge (512 merges ran here)
    assert(jobs >= 1 && jobs <= 4,
      s"training ran $jobs Spark jobs for 512 merges — driver-paced loop is back")
  }

  test("requireEncodes passes on correct ranks and trips on corrupted rank order") {
    val merges = Seq(("a", "a"), ("aa", "aa"), ("b", "c"), ("a", "b"))
    val plants = Seq(
      "aaaaaaaaa" -> Seq("aaaa", "aaaa", "a"),
      "abcabc abc ab" -> Seq("a", "bc", "a", "bc", "a", "bc", "ab"))
    Bpe.requireEncodes(spark, merges, plants) // must not throw
    // corrupt: reverse the rank order — (a,b) now outranks (b,c), so
    // "abcabc" encodes to ab c ab c instead of a bc a bc
    val ex = intercept[IllegalArgumentException] {
      Bpe.requireEncodes(spark, merges.reverse, plants)
    }
    assert(ex.getMessage.contains("bpe encode gate"))
  }

  test("encodeWith a persisted merges table equals the in-memory run") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(30)
    val merges = Bpe.learn(docs, numMerges = 8)
    val path = java.nio.file.Files
      .createTempDirectory("graft_bpe").toString + "/merges"
    Bpe.mergesTable(spark, merges).write.parquet(path)
    assertSameRows(
      Bpe.encodeWith(docs, spark.read.parquet(path)).drop("bpe_tokens"),
      Bpe.encode(docs, merges).drop("bpe_tokens"))
  }
}
