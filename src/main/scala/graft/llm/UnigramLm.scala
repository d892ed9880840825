package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Trainable unigram-LM tokenizer (Kudo 2018, arXiv:1804.10959 — the
 * SentencePiece default), completing the tokenizer family next to
 * [[Bpe]]: where BPE grows a vocabulary bottom-up by merging, the
 * unigram LM starts from a large seed of candidate pieces and PRUNES
 * toward the target size under an EM-estimated piece distribution;
 * encoding is Viterbi segmentation maximizing Σ log p(piece).
 *
 * Spark posture — identical to [[Bpe]]'s, for the same scale reasons:
 *
 *   - TRAINING runs on the word-frequency table, not the corpus: one
 *     `explode words → groupBy word` aggregation (the only corpus
 *     scan), collected under the same documented cap and trained
 *     in-JVM — ONE Spark job total regardless of vocab size or EM
 *     rounds. The collected surface is SORTED before training so
 *     float accumulation order (and therefore the learned vocab) is
 *     bit-identical on any partitioning.
 *   - ENCODING is embarrassingly parallel: the `(piece, logp)` vocab
 *     broadcasts, each partition memoizes word → pieces (Zipf cache),
 *     no shuffle, no driver involvement.
 *
 * Deliberate simplifications, stated: hard EM (Viterbi counts rather
 * than full forward-backward expectations) and pruning by expected
 * count rather than exact likelihood-loss ranking — the standard
 * fast-reimplementation trade; single-character pieces are never
 * pruned, so every word stays encodable. Viterbi ties break toward
 * the LONGEST last piece, then the earliest split — deterministic,
 * and pinned in UnigramLmSpec against an independent brute-force
 * enumerator of all segmentations.
 *
 * Like BPE, Viterbi segmentation is a data-dependent DP with no
 * DuckDB expression, so the driver row is rows-only — but gate-ful:
 * [[requireEncodes]] pushes plants with analytically-derivable
 * segmentations through the real distributed encode path.
 */
object UnigramLm {

  /** Viterbi segmentation of one word under `logp`: maximizes the sum
    * of piece log-probs over all segmentations into known pieces.
    * Every single char is guaranteed present in a learned vocab; for
    * robustness an unknown char falls back to a floor score so foreign
    * input still segments (flagged by the caller if it cares).
    * Ties: the LAST piece prefers longer (checked via strict `>` on a
    * backward scan from longer to shorter), then earlier splits. */
  private[graft] def viterbi(word: String, logp: Map[String, Double],
                             maxPieceLen: Int,
                             unkScore: Double = -1e9): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // split point producing best(i)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      // longer last piece scanned first so equal scores keep it
      var l = math.min(maxPieceLen, i)
      while (l >= 1) {
        val j = i - l
        if (best(j) > Double.NegativeInfinity) {
          val piece = word.substring(j, i)
          val s = logp.get(piece) match {
            case Some(p) => best(j) + p
            case None => if (l == 1) best(j) + unkScore else Double.NegativeInfinity
          }
          if (s > best(i)) { best(i) = s; back(i) = j }
        }
        l -= 1
      }
      i += 1
    }
    val out = List.newBuilder[String]
    val rev = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var p = n
    while (p > 0) { rev += ((back(p), p)); p = back(p) }
    rev.reverseIterator.foreach { case (a, b) => out += word.substring(a, b) }
    out.result().toArray
  }

  /** The distinct-word surface — shares [[Bpe.wordFreq]]'s shape (and
    * the one-scan property). */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    Bpe.wordFreq(docs, textCol)

  /**
   * Learn a `(piece, logp)` vocabulary of (at most) `vocabSize` pieces.
   * One Spark job (the word-frequency aggregation); everything after
   * the capped collect is in-JVM. Past `maxLocalWords` the trainer
   * falls back to [[learnDistributed]] — per-EM-round distributed
   * expected-count aggregation, the same above-cap posture as
   * [[Bpe.learn]] (the family used to be asymmetric here: unigram
   * hard-refused where BPE degraded gracefully).
   */
  def learn(docs: DataFrame, vocabSize: Int, textCol: String = "text",
            maxPieceLen: Int = 8, emRounds: Int = 4,
            maxLocalWords: Int = 2000000): Seq[(String, Double)] = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val wf = wordFreq(docs, textCol)
    val head = wf.limit(maxLocalWords + 1).collect()
    if (head.length <= maxLocalWords)
      learnLocal(head.map(r => (r.getAs[String]("word"), r.getAs[Long]("cnt"))),
        vocabSize, maxPieceLen, emRounds)
    else learnDistributed(wf, vocabSize, maxPieceLen, emRounds)
  }

  /** In-JVM trainer over the collected word surface: seed with every
    * substring up to `maxPieceLen` weighted by count·(len−1) (single
    * chars always in), then rounds of { hard-EM re-estimate, prune the
    * bottom 20 % by expected count } until the vocab fits. Words sort
    * first so double accumulation order is fixed. */
  private[graft] def learnLocal(wordsIn: Array[(String, Long)], vocabSize: Int,
                                maxPieceLen: Int, emRounds: Int): Seq[(String, Double)] = {
    import scala.collection.mutable
    val words = wordsIn.sortBy(_._1)
    if (words.isEmpty) return Seq.empty
    val chars: Set[String] =
      words.iterator.flatMap(_._1.map(_.toString)).toSet
    // ---- seed: substring counts, trimmed to a working set
    val seedCount = mutable.HashMap.empty[String, Long].withDefaultValue(0L)
    words.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          seedCount(w.substring(i, i + l)) += c
          l += 1
        }
        i += 1
      }
    }
    val seedBudget = math.max(vocabSize * 4, chars.size + vocabSize)
    var vocab: Set[String] = chars ++ seedCount.iterator
      .filter(_._1.length > 1)
      .toSeq
      // count·(len−1) favors pieces that actually compress; ties break
      // on the piece string so the seed is deterministic
      .sortBy { case (p, c) => (-c * (p.length - 1), p) }
      .take(seedBudget - chars.size)
      .map(_._1)

    trainLoop(vocab, vocabSize, emRounds, logp => {
      val exp = mutable.HashMap.empty[String, Double].withDefaultValue(0.0)
      words.foreach { case (w, c) =>
        viterbi(w, logp, maxPieceLen).foreach(p => exp(p) += c.toDouble)
      }
      exp
    })
  }

  /** The shared EM-estimate / prune driver loop — ONE implementation
    * behind both trainers, so the local and distributed paths cannot
    * drift: `em(logp)` returns the expected piece counts under the
    * current distribution (in-JVM Viterbi sweep locally, one
    * explode→groupBy aggregation distributively — integer count sums
    * below 2^53 are exact in doubles in any order, so the two agree
    * bit-for-bit; UnigramLmSpec pins the parity). */
  private def trainLoop(vocab0: Set[String], vocabSize: Int, emRounds: Int,
                        em: Map[String, Double] =>
                          scala.collection.mutable.Map[String, Double])
      : Seq[(String, Double)] = {
    var vocab = vocab0
    var logp: Map[String, Double] = {
      val tot = vocab.size.toDouble
      vocab.iterator.map(p => p -> math.log(1.0 / tot)).toMap
    }
    def reestimate(exp: scala.collection.mutable.Map[String, Double]): Unit = {
      val total = exp.valuesIterator.sum
      logp = vocab.iterator.map { p =>
        // add-one over the vocab keeps never-used single chars finite
        p -> math.log((exp.getOrElse(p, 0.0) + 1.0) / (total + vocab.size))
      }.toMap
    }
    var done = false
    while (!done) {
      var r = 0
      var exp = em(logp)
      while (r < emRounds) { reestimate(exp); exp = em(logp); r += 1 }
      val multi = vocab.iterator.filter(_.length > 1).toSeq
        .sortBy(p => (exp.getOrElse(p, 0.0), p)) // ascending: least-used first
      if (vocab.size <= vocabSize || multi.isEmpty) {
        // fits — or only the unprunable single chars remain (an
        // alphabet larger than vocabSize keeps every char regardless)
        reestimate(exp); done = true
      } else {
        // prune the bottom 20% of multi-char pieces by expected count,
        // never more than the overshoot; single chars are untouchable
        val dropN = math.max(1, math.min(multi.size,
          math.min(vocab.size - vocabSize, (vocab.size * 0.2).toInt)))
        vocab = vocab -- multi.take(dropN)
        reestimate(exp)
      }
    }
    logp.toSeq.sortBy { case (p, lp) => (-lp, p) }
  }

  /**
   * Fallback trainer for a word surface past the driver cap — the
   * [[Bpe.learnDistributed]] posture applied to EM: the seed substring
   * counts are one explode→groupBy aggregation whose TOP-seed-budget
   * head (vocab-sized, never word-surface-sized) is all that reaches
   * the driver, and each EM round is one distributed Viterbi-encode +
   * piece-count aggregation under the broadcast `logp`, collecting only
   * the (vocab-bounded) expected-count table. Correct at any corpus
   * scale but driver-paced — `(emRounds+1) × prune-iterations` Spark
   * jobs — which is why [[learn]] prefers the in-JVM path whenever the
   * Zipf-bounded surface fits. Expected counts are LONG sums (exact),
   * and the in-JVM path's double accumulation of integer counts is
   * exact too, so the two trainers produce IDENTICAL vocabularies on
   * the same corpus (pinned in UnigramLmSpec).
   */
  private[graft] def learnDistributed(wordFreq: DataFrame, vocabSize: Int,
                                      maxPieceLen: Int, emRounds: Int)
      : Seq[(String, Double)] = {
    import scala.collection.mutable
    val spark = wordFreq.sparkSession
    val base = wordFreq.select(col("word"), col("cnt")).localCheckpoint()
    val subUdf = udf { (w: String) =>
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          out += w.substring(i, i + l); l += 1
        }
        i += 1
      }
      out.result()
    }
    val subs = base
      .select(explode(subUdf(col("word"))).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("c"))
      .localCheckpoint()
    val chars: Set[String] = subs.filter(length(col("piece")) === 1)
      .select("piece").collect().map(_.getString(0)).toSet
    if (chars.isEmpty) return Seq.empty
    val seedBudget = math.max(vocabSize * 4, chars.size + vocabSize)
    // same seed rule as learnLocal: count·(len−1), ties on the piece —
    // TakeOrdered via orderBy+limit, so only the head is collected
    val multiSeed = subs.filter(length(col("piece")) > 1)
      .select(col("piece"), (col("c") * (length(col("piece")) - 1)).as("s"))
      .orderBy(col("s").desc, col("piece").asc)
      .limit(math.max(0, seedBudget - chars.size))
      .select("piece").collect().map(_.getString(0))
    trainLoop(chars ++ multiSeed, vocabSize, emRounds, logp => {
      val bc = spark.sparkContext.broadcast(logp)
      val encUdf = udf((w: String) => viterbi(w, bc.value, maxPieceLen).toSeq)
      val rows = base
        .select(explode(encUdf(col("word"))).as("piece"), col("cnt"))
        .groupBy("piece").agg(sum("cnt").as("c"))
        .collect()
      val m = mutable.HashMap.empty[String, Double].withDefaultValue(0.0)
      rows.foreach(r => m(r.getString(0)) = r.getLong(1).toDouble)
      m
    })
  }

  /** [[learn]]'s result as a persistable `(piece, logp)` table — the
    * standing-model form (persist once, [[encodeWith]] per batch). */
  def vocabTable(spark: SparkSession, vocab: Seq[(String, Double)]): DataFrame = {
    import spark.implicits._
    vocab.toDF("piece", "logp")
  }

  /** Encode every document: `(idCol, ulm_tokens, n_words,
    * n_ulm_tokens)`. The vocab broadcasts; a per-partition word memo
    * turns Zipf text into cache hits; no shuffle. */
  def encode(docs: DataFrame, vocab: Seq[(String, Double)],
             textCol: String = "text", idCol: String = "doc_id",
             maxPieceLen: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(vocab.toMap)
    val enc = udf(new (String => (Seq[String], Int)) with Serializable {
      @transient private lazy val memo =
        new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
      def apply(text: String): (Seq[String], Int) = {
        if (text == null) return (Seq.empty, 0)
        val words = Dedup.tokenize(text)
        val out = Seq.newBuilder[String]
        words.foreach { w =>
          out ++= memo.computeIfAbsent(w, viterbi(_, bc.value, maxPieceLen))
        }
        (out.result(), words.length)
      }
    })
    docs.select(col(idCol), enc(col(textCol)).as("__enc__"))
      .select(col(idCol), col("__enc__._1").as("ulm_tokens"),
        col("__enc__._2").as("n_words"))
      .withColumn("n_ulm_tokens", size(col("ulm_tokens")))
  }

  /** [[encode]] against a persisted [[vocabTable]]. */
  def encodeWith(docs: DataFrame, vocabDf: DataFrame,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val vocab = vocabDf.collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Double]("logp"))).toSeq
    encode(docs, vocab, textCol, idCol,
      maxPieceLen = vocab.iterator.map(_._1.length).foldLeft(1)(math.max))
  }

  /** Driver-run encoder gate (the [[Bpe.requireEncodes]] pattern):
    * encode plants with analytically-derivable Viterbi segmentations
    * through the real distributed path and `require` equality. */
  def requireEncodes(spark: SparkSession, vocab: Seq[(String, Double)],
                     plants: Seq[(String, Seq[String])]): Unit = {
    import spark.implicits._
    val docs = plants.zipWithIndex
      .map { case ((t, _), i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = encode(docs, vocab).select("doc_id", "ulm_tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    plants.zipWithIndex.foreach { case ((t, want), i) =>
      require(got(i.toLong) == want,
        s"unigram encode gate: '$t' segmented to ${got(i.toLong)}, expected $want")
    }
  }
}
