package graft

import graft.llm.{Bpe, UnigramLm, WordPiece}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Local-vs-distributed trainer parity as a PROPERTY for the whole
  * tokenizer family: on random small corpora (3-letter alphabet — the
  * adversarial regime for pair-count ties and re-merge chains) the
  * distributed trainer (forced via `maxLocalWords = 0`) must produce
  * the BIT-IDENTICAL vocabulary the in-JVM trainer does. Fixed-corpus
  * parity pins live in Bpe/UnigramLm/WordPieceSpec; these properties
  * guard the tie-breaking rules, which only random corpora exercise
  * broadly. Trial counts stay modest — every trial trains through
  * Spark twice. */
class TokenizerParityPropertySpec extends SparkSpec {
  import spark.implicits._

  private val wordGen = Gen.choose(1, 6)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val corpusGen = Gen.choose(2, 12)
    .flatMap(n => Gen.listOfN(n, wordGen))

  private def check(prop: Prop, trials: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: BPE local and distributed trainers agree on random corpora") {
    check(Prop.forAll(corpusGen, Gen.choose(1, 6)) { (words, merges) =>
      val docs = Seq(words.mkString(" ")).toDF("text")
      Bpe.learn(docs, merges) == Bpe.learn(docs, merges, maxLocalWords = 0)
    }, trials = 10)
  }

  test("property: WordPiece local and distributed trainers agree on " +
      "random corpora") {
    check(Prop.forAll(corpusGen, Gen.choose(1, 6)) { (words, merges) =>
      val docs = Seq(words.mkString(" ")).toDF("text")
      WordPiece.learn(docs, merges) ==
        WordPiece.learn(docs, merges, maxLocalWords = 0)
    }, trials = 10)
  }

  test("property: Unigram-LM local and distributed trainers agree on " +
      "random corpora (bit-identical (piece, logp) vocabularies)") {
    check(Prop.forAll(corpusGen, Gen.choose(4, 16)) { (words, vocab) =>
      val docs = Seq(words.mkString(" ")).toDF("text")
      UnigramLm.learn(docs, vocab, maxPieceLen = 4, emRounds = 2) ==
        UnigramLm.learn(docs, vocab, maxPieceLen = 4, emRounds = 2,
          maxLocalWords = 0)
    }, trials = 8)
  }
}
