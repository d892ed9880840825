package graft

import graft.llm.QualityClassifier
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Independent in-JVM multinomial NB (add-one smoothing), the
    * reference the distributed pipeline must reproduce. */
  private def referenceScores(docs: Seq[(Long, String, Int)]): Map[Long, Double] = {
    val tok = "[a-z0-9]+".r
    val words = docs.map { case (id, t, y) => (id, tok.findAllIn(t.toLowerCase).toSeq, y) }
    val np = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val nn = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    words.foreach { case (_, ws, y) =>
      ws.foreach(w => if (y == 1) np(w) += 1 else nn(w) += 1)
    }
    val vocab = (np.keySet ++ nn.keySet).size
    val tp = np.values.sum.toDouble; val tn = nn.values.sum.toDouble
    val dp = docs.count(_._3 == 1).toDouble; val dn = docs.count(_._3 == 0).toDouble
    words.map { case (id, ws, _) =>
      id -> (math.log(dp / dn) + ws.map(w =>
        math.log((np(w) + 1.0) / (tp + vocab)) -
          math.log((nn(w) + 1.0) / (tn + vocab))).sum)
    }.toMap
  }

  private val corpus = Seq(
    (1L, "fast query good table scan", 1),
    (2L, "good fast merge batch data", 1),
    (3L, "table scan fast good query data", 1),
    (4L, "slow junk slow junk table", 0),
    (5L, "junk slow noise slow batch", 0),
    (6L, "fast good data query merge scan", 1),
    (7L, "noise junk slow table slow", 0))

  test("distributed NB matches an independent in-JVM reference implementation") {
    val df = corpus.toDF("doc_id", "text", "weak_label")
    val scored = QualityClassifier.scoreWith(df,
      QualityClassifier.train(df), QualityClassifier.priors(df))
      .select("doc_id", "nb_score", "nb_label").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    val ref = referenceScores(corpus)
    corpus.foreach { case (id, _, _) =>
      val (s, l) = scored(id)
      assert(math.abs(s - ref(id)) < 1e-9, s"doc $id: $s vs ref ${ref(id)}")
      assert(l === (if (ref(id) > 0) 1 else 0))
    }
  }

  test("the model recovers the planted signal with full training agreement") {
    val df = corpus.toDF("doc_id", "text", "weak_label")
    val scored = QualityClassifier.scoreWith(df,
      QualityClassifier.train(df), QualityClassifier.priors(df)).collect()
    scored.foreach { r =>
      assert(r.getAs[Int]("nb_label") === r.getAs[Int]("weak_label"),
        s"doc ${r.getAs[Long]("doc_id")} misclassified")
      assert(r.getAs[Double]("nb_margin") > 1e-6, "decision too close to the boundary")
    }
  }

  test("standing model scores a new batch: unseen tokens smooth, empty docs get the prior") {
    val trainDf = corpus.toDF("doc_id", "text", "weak_label")
    val model = QualityClassifier.train(trainDf)
    val pri = QualityClassifier.priors(trainDf)
    val batch = Seq((10L, "fast good zebra quark"), (11L, ""), (12L, "slow junk zebra"))
      .toDF("doc_id", "text")
    val out = QualityClassifier.scoreWith(batch, model, pri).collect()
      .map(r => r.getLong(0) -> r).toMap
    // unseen tokens contribute only the smoothing asymmetry; the seen
    // tokens dominate the sign
    assert(out(10L).getAs[Int]("nb_label") === 1)
    assert(out(12L).getAs[Int]("nb_label") === 0)
    // empty doc = prior alone: 4 pos vs 3 neg docs -> positive
    val prior = math.log(4.0 / 3.0)
    assert(math.abs(out(11L).getAs[Double]("nb_score") - prior) < 1e-12)
  }

  test("scoring is partitioning-independent at the decision level") {
    val labels = Seq(1, 7, 32).map { p =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(corpus, p)).toDF("doc_id", "text", "weak_label")
      QualityClassifier.scoreWith(df, QualityClassifier.train(df),
        QualityClassifier.priors(df))
        .select("doc_id", "nb_label").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    assert(labels.distinct.size === 1)
  }
}
