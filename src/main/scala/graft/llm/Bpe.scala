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
 *     its distinct-word surface (the classical BPE trick), and each
 *     merge round is then a single adjacent-pair aggregation over that
 *     table plus a narrow per-row merge application. The corpus text
 *     is scanned exactly once, regardless of the number of merges.
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
   * training is bit-deterministic on any partitioning.
   *
   * Scale: each round aggregates adjacent pairs over the WORD table
   * (distinct words × avg symbols — Zipf-bounded, orders of magnitude
   * below the corpus) and collects exactly ONE row (the argmax). The
   * evolving symbol table is localCheckpointed every round, so lineage
   * stays flat across dozens of merges. For a 100 TB corpus, train on
   * a `Sampling.hashSample` of documents — tokenizer training is
   * estimation, and a content-keyed sample keeps it reproducible.
   */
  def learn(docs: DataFrame, numMerges: Int,
            textCol: String = "text"): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val toChars = udf((w: String) => w.map(_.toString))
    var wf = wordFreq(docs, textCol)
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
}
