package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Trainable byte-pair-encoding tokenizer (Sennrich et al. 2016,
 * arXiv:1508.07909) — the "train a tokenizer on the corpus, then
 * tokenize the corpus" step of a pretraining data pipeline, expressed
 * Spark-first:
 *
 *   - TRAINING runs on the word-frequency table, not the corpus: one
 *     `explode words → groupBy word` aggregation reduces any corpus to
 *     its distinct-word surface (the classical BPE trick), which is
 *     collected under a documented cap and trained in-JVM with
 *     incremental pair maintenance — ONE Spark job total for any merge
 *     count, with a distributed per-merge-aggregation fallback above
 *     the cap. The corpus text is scanned exactly once either way.
 *   - ENCODING is embarrassingly parallel: the learned merge ranks
 *     broadcast to every task (bounded by `numMerges`, like IVF
 *     centroids), each partition memoizes word → tokens (Zipf makes
 *     the cache hit rate enormous), and no shuffle happens at all.
 *
 * The per-word merge kernel is a tight JVM function, not HOF
 * expressions, for the same measured reason as `repStatsOf`
 * (`TextOps.scala`): rank-greedy adjacent merging is a data-dependent
 * fixpoint loop, and its declarative form is an O(rounds · len²)
 * interpreted expression tree. Consequently `bpe_token_count` is a
 * rows-only driver check (no DuckDB-expressible oracle); correctness
 * is pinned by BpeSpec against an independent in-memory reference
 * implementation and by algebraic properties (concatenation identity,
 * count monotonicity, determinism).
 *
 * Words follow the library-wide token rule (`[a-z0-9]+` over lowered
 * text, `Dedup.tokenize`); merges never cross word boundaries.
 */
object Bpe {

  /** One left-to-right pass merging every adjacent (a, b) into a+b —
    * the classical in-word merge step (occurrences found after a merge
    * do not re-overlap it: "aaa" + (a,a) → ["aa", "a"]). */
  private[graft] def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Encode one word under the learned ranks: repeatedly merge ALL
    * occurrences of the lowest-rank adjacent pair until no adjacent
    * pair is mergeable — the reference greedy-rank BPE application. */
  private[graft] def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) done = true
      else {
        syms = applyMerge(syms, best._1, best._2)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** The distinct-word surface: `(word, cnt)` with corpus frequencies.
    * This is the only pass over the corpus text during training. */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /**
   * Learn `numMerges` BPE merges from the corpus. Returns the merges
   * in rank order. Ties in pair frequency break on (a, b) ascending so
   * training is bit-deterministic on any partitioning (the word surface
   * is ASCII `[a-z0-9]+`, where JVM String order and Spark's UTF-8
   * binary order agree).
   *
   * Scale: ONE Spark job total, independent of the merge count. The
   * corpus reduces to its distinct-word surface (the classical BPE
   * trick — Zipf-bounded, orders of magnitude below the corpus; for a
   * 100 TB corpus train on a `Sampling.hashSample`, which bounds it
   * further and stays reproducible), that word-frequency table is
   * collected, and all merges train in-JVM with INCREMENTAL pair
   * maintenance ([[learnLocal]]): merging (a, b) re-counts only the
   * words that contain it, so a production 32 k-vocab run is
   * O(Σ affected-word lengths), not 32 k sequential driver-paced Spark
   * jobs over the word table (the round-10 scale ceiling this replaces).
   *
   * `maxLocalWords` is the honest knob: a distinct-word surface larger
   * than the cap (2 M words ≈ a few hundred MB of driver state — far
   * past any Zipf-plausible natural-language corpus, sampled or not)
   * falls back to [[learnDistributed]]'s one-aggregation-per-merge
   * loop, which never materializes the surface on the driver.
   */
  def learn(docs: DataFrame, numMerges: Int, textCol: String = "text",
            maxLocalWords: Int = 2000000): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val wf = wordFreq(docs, textCol)
    val head = wf.limit(maxLocalWords + 1).collect()
    if (head.length <= maxLocalWords)
      learnLocal(head.map(r =>
        (r.getAs[String]("word"), r.getAs[Long]("cnt"))), numMerges)
    else learnDistributed(wf, numMerges)
  }

  /**
   * The in-JVM incremental trainer over the collected word-frequency
   * table — the standard fast-BPE structure (Sennrich 2016's released
   * trainer works the same way): pair → count, pair → containing
   * words, and a lazy-deletion priority queue over (count, a, b). Each
   * round pops the current argmax (stale heap entries are skipped —
   * an entry is live iff its count equals the pair's current count),
   * then re-counts ONLY the words containing the merged pair: a word's
   * old adjacent-pair contributions are subtracted in full, the merge
   * applies, the new contributions add back — whole-word recount
   * sidesteps every local-delta off-by-one, and parity with both the
   * per-round distributed aggregation and the naive occurrence-level
   * reference is pinned in BpeSpec (512-merge run included).
   */
  private[graft] def learnLocal(words: Array[(String, Long)],
                                numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val syms: Array[Array[String]] = words.map(_._1.map(_.toString).toArray)
    val cnts: Array[Long] = words.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    val heap = new java.util.PriorityQueue[(Long, String, String)](
      math.max(11, words.length),
      new java.util.Comparator[(Long, String, String)] {
        def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(y._1, x._1) // count desc
          if (c != 0) c
          else {
            val a = x._2.compareTo(y._2) // then (a, b) asc
            if (a != 0) a else x._3.compareTo(y._3)
          }
        }
      })
    def bump(p: (String, String), by: Long): Unit = {
      val n = pairCount.getOrElse(p, 0L) + by
      if (n <= 0L) { pairCount.remove(p); () }
      else { pairCount(p) = n; heap.add((n, p._1, p._2)); () }
    }
    def addWord(wi: Int): Unit = {
      val w = syms(wi)
      var i = 0
      while (i + 1 < w.length) {
        val p = (w(i), w(i + 1))
        bump(p, cnts(wi))
        pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += wi
        i += 1
      }
    }
    // subtract a word's contributions; its pairWords entries go stale
    // instead of being removed (cheap), and are containment-checked on use
    def dropWord(wi: Int): Unit = {
      val w = syms(wi)
      var i = 0
      while (i + 1 < w.length) { bump((w(i), w(i + 1)), -cnts(wi)); i += 1 }
    }
    syms.indices.foreach(addWord)
    val merges = Seq.newBuilder[(String, String)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      var best: (String, String) = null
      while (best == null && !heap.isEmpty) {
        val e = heap.poll()
        if (pairCount.getOrElse((e._2, e._3), 0L) == e._1) best = (e._2, e._3)
      }
      if (best == null) done = true
      else {
        merges += best
        for (wi <- pairWords.remove(best).getOrElse(mutable.HashSet.empty[Int])) {
          val w = syms(wi)
          var has = false
          var i = 0
          while (!has && i + 1 < w.length) {
            has = w(i) == best._1 && w(i + 1) == best._2
            i += 1
          }
          if (has) {
            dropWord(wi)
            syms(wi) = applyMerge(w, best._1, best._2)
            addWord(wi)
          }
        }
        r += 1
      }
    }
    merges.result()
  }

  /** Fallback trainer for a word surface past the driver cap: one
    * adjacent-pair aggregation over the distributed word table plus a
    * 1-row argmax collect PER MERGE (the evolving symbol table
    * localCheckpoints each round to keep lineage flat). Correct at any
    * scale but driver-paced — suitable for modest merge counts only,
    * which is why [[learn]] prefers the in-JVM path whenever the
    * Zipf-bounded surface fits. */
  private[graft] def learnDistributed(wordFreq: DataFrame,
                                      numMerges: Int): Seq[(String, String)] = {
    val toChars = udf((w: String) => w.map(_.toString))
    var wf = wordFreq
      .select(toChars(col("word")).as("syms"), col("cnt"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val pairs = wf
        .select(explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"), col("cnt"))
        .select(col("p.a"), col("p.b"), col("cnt"))
        .groupBy("a", "b").agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (pairs.isEmpty) exhausted = true
      else {
        val (a, b) = (pairs(0).getAs[String]("a"), pairs(0).getAs[String]("b"))
        merges += ((a, b))
        val applyM = udf((syms: Seq[String]) =>
          applyMerge(syms.toArray, a, b).toSeq)
        wf = wf.select(applyM(col("syms")).as("syms"), col("cnt"))
          .localCheckpoint()
        r += 1
      }
    }
    merges.result()
  }

  /** [[learn]]'s result as a persistable `(rank, a, b)` table — the
    * standing-model form (persist once, [[encodeWith]] per batch). */
  def mergesTable(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "a", "b")
  }

  /**
   * Encode every document under the learned merges: `(idCol,
   * bpe_tokens, n_words, n_bpe_tokens)`. The rank map broadcasts; a
   * per-partition word → tokens memo turns Zipf-distributed text into
   * mostly cache hits; no shuffle, no driver involvement.
   */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, r) => p -> r }.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    // one kernel returns (tokens, word count) together — tokenization
    // is the dominant per-row cost, and a separate regexp_extract_all
    // column for n_words would re-run it over every byte of text
    val enc = udf(new (String => (Seq[String], Int)) with Serializable {
      @transient private lazy val memo =
        new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
      def apply(text: String): (Seq[String], Int) = {
        if (text == null) return (Seq.empty, 0)
        val words = Dedup.tokenize(text)
        val out = Seq.newBuilder[String]
        words.foreach { w =>
          out ++= memo.computeIfAbsent(w, encodeWord(_, bc.value))
        }
        (out.result(), words.length)
      }
    })
    docs.select(col(idCol), enc(col(textCol)).as("__enc__"))
      .select(col(idCol), col("__enc__._1").as("bpe_tokens"),
        col("__enc__._2").as("n_words"))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")))
  }

  /** [[encode]] against a persisted [[mergesTable]]: collects the
    * (bounded, rank-ordered) merge list — the same standing-model
    * pattern as `rareTokenScoreWith` / IVF's trained centroids. */
  def encodeWith(docs: DataFrame, mergesDf: DataFrame,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val merges = mergesDf.orderBy("rank").collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"))).toSeq
    encode(docs, merges, textCol, idCol)
  }

  /** Driver-run encoder gate (the pattern ann_topk used to graduate
    * from rows-only): encode planted texts whose token sequences are
    * ANALYTICALLY derivable under known merges through the real
    * distributed [[encode]] path, and `require` exact equality — a
    * broken rank map or merge kernel then fails the driver's query
    * run, not just the sbt suite. BpeSpec proves the gate trips on a
    * deliberately corrupted rank order. */
  def requireEncodes(spark: SparkSession, merges: Seq[(String, String)],
                     plants: Seq[(String, Seq[String])]): Unit = {
    import spark.implicits._
    val docs = plants.zipWithIndex
      .map { case ((t, _), i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = encode(docs, merges).select("doc_id", "bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    plants.zipWithIndex.foreach { case ((t, want), i) =>
      require(got(i.toLong) == want,
        s"bpe encode gate: '$t' encoded to ${got(i.toLong)}, expected $want")
    }
  }
}
