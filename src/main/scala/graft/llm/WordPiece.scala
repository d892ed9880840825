package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Trainable WordPiece tokenizer (Schuster & Nakajima 2012; the BERT
 * tokenizer, Devlin et al. 2019) — completes the library's tokenizer
 * family next to rank-greedy [[Bpe]] and the likelihood-pruned
 * [[UnigramLm]]:
 *
 *   - TRAINING is BPE-shaped (merge a pair per round over the
 *     distinct-word surface) but picks the pair maximizing the
 *     LIKELIHOOD score `count(ab) / (count(a) · count(b))` instead of
 *     the raw pair count — the merge that most increases corpus
 *     likelihood under a unigram model of the pieces. Same Spark
 *     shape as [[Bpe.learn]]: ONE corpus scan builds the
 *     word-frequency table, which is collected under a documented cap
 *     and trained in-JVM with INCREMENTAL pair/symbol maintenance;
 *     above the cap a distributed per-round-aggregation fallback
 *     keeps the surface off the driver.
 *   - Word-internal continuation pieces carry the `##` prefix
 *     (`word → w ##o ##r ##d` before any merge), so the learned
 *     vocabulary distinguishes word-initial from word-internal
 *     pieces exactly as BERT's does.
 *   - ENCODING ignores merge order entirely: greedy
 *     longest-match-first against the finished vocabulary (the
 *     WordPiece application rule — this is what makes it a different
 *     tokenizer from BPE, whose encoder replays merge ranks). A word
 *     with any unmatchable tail encodes to `[UNK]` whole, per the
 *     reference algorithm. Broadcast vocab + per-partition word memo,
 *     no shuffle — the same embarrassingly-parallel shape as
 *     [[Bpe.encode]].
 *
 * Score comparisons during training are EXACT-RATIONAL (BigInt
 * cross-products, never a floating division), with ties broken on
 * (a, b) ascending — training is bit-deterministic on any
 * partitioning. Like BPE, greedy longest-match is a data-dependent
 * loop with no DuckDB expression, so the driver row is rows-only and
 * correctness is pinned by WordPieceSpec against an independent
 * from-scratch reference implementation plus the planted
 * [[requireEncodes]] driver gate.
 *
 * Words follow the library-wide token rule (`[a-z0-9]+` over lowered
 * text, `Dedup.tokenize`); merges never cross word boundaries.
 */
object WordPiece {

  val Unk = "[UNK]"

  /** A word as its initial WordPiece units: first character bare,
    * every continuation character `##`-prefixed. */
  private[graft] def units(word: String): Array[String] = {
    val out = new Array[String](word.length)
    var i = 0
    while (i < word.length) {
      out(i) = if (i == 0) word.substring(0, 1) else "##" + word.charAt(i)
      i += 1
    }
    out
  }

  /** Join two adjacent units into their merged unit: the right side's
    * `##` marker is absorbed (`w + ##o → wo`, `##r + ##d → ##rd`). */
  private[graft] def joinUnits(a: String, b: String): String =
    a + (if (b.startsWith("##")) b.substring(2) else b)

  /** One left-to-right pass merging every adjacent (a, b) occurrence
    * (no re-overlap, mirroring [[Bpe.applyMerge]]). */
  private[graft] def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += joinUnits(a, b)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** The distinct-word surface — identical to [[Bpe.wordFreq]] (one
    * corpus scan, Zipf-bounded result). */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    Bpe.wordFreq(docs, textCol)

  /**
   * Learn a WordPiece vocabulary of `numMerges` merged pieces from
   * the corpus. Returns the full vocabulary: every base unit present
   * in the word surface (sorted ascending — deterministic) followed
   * by the merged pieces in creation order. Mirrors [[Bpe.learn]]'s
   * scale posture: the Zipf-bounded word surface is collected under
   * `maxLocalWords` and trained in-JVM ([[learnLocal]]); above the
   * cap the distributed fallback runs two aggregations per round.
   */
  def learn(docs: DataFrame, numMerges: Int, textCol: String = "text",
            maxLocalWords: Int = 2000000): Seq[String] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val wf = wordFreq(docs, textCol)
    val head = wf.limit(maxLocalWords + 1).collect()
    if (head.length <= maxLocalWords)
      learnLocal(head.map(r =>
        (r.getAs[String]("word"), r.getAs[Long]("cnt"))), numMerges)
    else learnDistributed(wf, numMerges)
  }

  /** Exact-rational score comparison: is `p1/(a1·b1) > p2/(a2·b2)`?
    * Cross-multiplied in BigInt so corpus-scale counts can never
    * overflow or round. */
  private def scoreGt(p1: Long, a1: Long, b1: Long,
                      p2: Long, a2: Long, b2: Long): Int = {
    val l = BigInt(p1) * (BigInt(a2) * BigInt(b2))
    val r = BigInt(p2) * (BigInt(a1) * BigInt(b1))
    l.compare(r)
  }

  /**
   * In-JVM incremental trainer over the collected word surface. Data
   * structures mirror [[Bpe.learnLocal]] plus a SYMBOL-count table
   * (the score's denominator): pair → count, symbol → count,
   * pair → containing words, symbol → containing pairs, and a
   * lazy-deletion heap over `(pairCount, symCount(a), symCount(b))`
   * snapshots — an entry is live iff all three still match current
   * counts. Mutations only mark pairs/symbols dirty; each round ends
   * by snapshotting every dirty pair (including pairs whose DENOMINATOR
   * moved via a touched symbol) against the settled counts, so at pop
   * time the true argmax always has a live entry. A merge re-counts
   * ONLY the words containing the merged pair (whole-word
   * subtract/re-add, as in BPE).
   */
  private[graft] def learnLocal(words: Array[(String, Long)],
                                numMerges: Int): Seq[String] = {
    import scala.collection.mutable
    val syms: Array[Array[String]] = words.map(w => units(w._1))
    val cnts: Array[Long] = words.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val symCount = mutable.HashMap.empty[String, Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    val symPairs = mutable.HashMap.empty[String, mutable.HashSet[(String, String)]]
    // (pairCount, symCount(a), symCount(b), a, b) snapshots
    val heap = new java.util.PriorityQueue[(Long, Long, Long, String, String)](
      math.max(11, words.length),
      new java.util.Comparator[(Long, Long, Long, String, String)] {
        def compare(x: (Long, Long, Long, String, String),
                    y: (Long, Long, Long, String, String)): Int = {
          val c = scoreGt(y._1, y._2, y._3, x._1, x._2, x._3) // score desc
          if (c != 0) c
          else {
            val a = x._4.compareTo(y._4) // then (a, b) asc
            if (a != 0) a else x._5.compareTo(y._5)
          }
        }
      })
    def snapshot(p: (String, String)): Unit =
      pairCount.get(p).foreach { pc =>
        heap.add((pc, symCount.getOrElse(p._1, 0L),
          symCount.getOrElse(p._2, 0L), p._1, p._2)); ()
      }
    // Heap snapshots are only valid against SETTLED counts, and counts
    // are in flux while a round's affected words are subtracted and
    // re-added — so mutations never snapshot directly; they mark the
    // pair (or symbol, which fans out to its containing pairs) dirty,
    // and the round ends by snapshotting every dirty pair once against
    // the final counts. A pair with unchanged (pc, sa, sb) keeps its
    // prior live snapshot; everything else gets a fresh one.
    val dirtyPairs = mutable.HashSet.empty[(String, String)]
    val dirtySyms = mutable.HashSet.empty[String]
    def bumpPair(p: (String, String), by: Long): Unit = {
      val n = pairCount.getOrElse(p, 0L) + by
      if (n <= 0L) { pairCount.remove(p); () }
      else {
        pairCount(p) = n
        symPairs.getOrElseUpdate(p._1, mutable.HashSet.empty) += p
        symPairs.getOrElseUpdate(p._2, mutable.HashSet.empty) += p
      }
      dirtyPairs += p
      ()
    }
    def bumpSym(s: String, by: Long): Unit = {
      val n = symCount.getOrElse(s, 0L) + by
      if (n <= 0L) symCount.remove(s) else symCount(s) = n
      dirtySyms += s
      ()
    }
    def settleRound(): Unit = {
      dirtySyms.foreach(s =>
        dirtyPairs ++= symPairs.getOrElse(s, mutable.HashSet.empty))
      dirtyPairs.foreach(snapshot)
      dirtyPairs.clear()
      dirtySyms.clear()
    }
    def addWord(wi: Int): Unit = {
      val w = syms(wi)
      var i = 0
      while (i < w.length) {
        bumpSym(w(i), cnts(wi))
        if (i + 1 < w.length) {
          val p = (w(i), w(i + 1))
          bumpPair(p, cnts(wi))
          pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += wi
        }
        i += 1
      }
    }
    def dropWord(wi: Int): Unit = {
      val w = syms(wi)
      var i = 0
      while (i < w.length) {
        bumpSym(w(i), -cnts(wi))
        if (i + 1 < w.length) bumpPair((w(i), w(i + 1)), -cnts(wi))
        i += 1
      }
    }
    syms.indices.foreach(addWord)
    settleRound() // initial snapshots against fully-built counts
    val base = symCount.keys.toSeq.sorted
    val vocab = Seq.newBuilder[String]
    vocab ++= base
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      var best: (String, String) = null
      while (best == null && !heap.isEmpty) {
        val e = heap.poll()
        val live = pairCount.getOrElse((e._4, e._5), 0L) == e._1 &&
          symCount.getOrElse(e._4, 0L) == e._2 &&
          symCount.getOrElse(e._5, 0L) == e._3
        if (live) best = (e._4, e._5)
      }
      if (best == null) done = true
      else {
        vocab += joinUnits(best._1, best._2)
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
        settleRound()
        r += 1
      }
    }
    vocab.result()
  }

  /** Distributed fallback above the driver cap: per round, ONE
    * adjacent-pair aggregation + ONE symbol aggregation over the
    * evolving word table, joined to score. The argmax orders on the
    * IEEE-double score (exact-rational comparison has no distributed
    * sort key) with (a, b) tie-breaks — pairs whose exact scores
    * differ by under 1 double ulp may order differently from the
    * in-JVM path's BigInt compare; documented, and only reachable
    * past a 2M-distinct-word surface. Driver-paced like
    * [[Bpe.learnDistributed]]; suitable for modest merge counts. */
  private[graft] def learnDistributed(wordFreq: DataFrame,
                                      numMerges: Int): Seq[String] = {
    val toUnits = udf((w: String) => units(w).toSeq)
    var wf = wordFreq
      .select(toUnits(col("word")).as("syms"), col("cnt"))
      .localCheckpoint()
    val baseVocab = wf.select(explode(col("syms")).as("s")).distinct()
      .orderBy("s").collect().map(_.getString(0)).toSeq
    val vocab = Seq.newBuilder[String]
    vocab ++= baseVocab
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val symCnt = wf.select(explode(col("syms")).as("s"), col("cnt"))
        .groupBy("s").agg(sum("cnt").as("sc"))
      val pairs = wf
        .select(explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"), col("cnt"))
        .select(col("p.a"), col("p.b"), col("cnt"))
        .groupBy("a", "b").agg(sum(col("cnt")).as("n"))
        .join(symCnt.withColumnRenamed("s", "a").withColumnRenamed("sc", "sa"), Seq("a"))
        .join(symCnt.withColumnRenamed("s", "b").withColumnRenamed("sc", "sb"), Seq("b"))
        .withColumn("score",
          col("n").cast("double") /
            (col("sa").cast("double") * col("sb").cast("double")))
        .orderBy(col("score").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (pairs.isEmpty) exhausted = true
      else {
        val (a, b) = (pairs(0).getAs[String]("a"), pairs(0).getAs[String]("b"))
        vocab += joinUnits(a, b)
        val applyM = udf((syms: Seq[String]) =>
          applyMerge(syms.toArray, a, b).toSeq)
        wf = wf.select(applyM(col("syms")).as("syms"), col("cnt"))
          .localCheckpoint()
        r += 1
      }
    }
    vocab.result()
  }

  /** The vocabulary as a persistable `(piece_id, piece)` table — the
    * standing-model form (persist once, [[encodeWith]] per batch). */
  def vocabTable(spark: SparkSession, vocab: Seq[String]): DataFrame = {
    import spark.implicits._
    vocab.zipWithIndex.map { case (p, i) => (i, p) }.toDF("piece_id", "piece")
  }

  /** Greedy longest-match-first encoding of one word against the
    * vocabulary — the WordPiece application rule: at each position
    * take the LONGEST vocab piece (`##`-prefixed past position 0)
    * matching a prefix of the remainder; any unmatchable position
    * turns the WHOLE word into `[UNK]`. `maxInputChars` guards the
    * O(len²) worst case on pathological tokens (BERT uses 200). */
  private[graft] def encodeWord(word: String, vocab: Set[String],
                                maxInputChars: Int = 200): Array[String] = {
    if (word.isEmpty) return Array.empty
    if (word.length > maxInputChars) return Array(Unk)
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      var j = word.length
      var hit: String = null
      while (hit == null && j > i) {
        val cand =
          if (i == 0) word.substring(i, j) else "##" + word.substring(i, j)
        if (vocab.contains(cand)) hit = cand else j -= 1
      }
      if (hit == null) return Array(Unk)
      out += hit
      i = j
    }
    out.result()
  }

  /** Encode every document under the finished vocabulary: `(idCol,
    * wp_tokens, n_words, n_wp_tokens)`. Broadcast vocab set +
    * per-partition word memo, no shuffle — mirrors [[Bpe.encode]]. */
  def encode(docs: DataFrame, vocab: Seq[String],
             textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(vocab.toSet)
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
      .select(col(idCol), col("__enc__._1").as("wp_tokens"),
        col("__enc__._2").as("n_words"))
      .withColumn("n_wp_tokens", size(col("wp_tokens")))
  }

  /** [[encode]] against a persisted [[vocabTable]] (bounded collect,
    * same standing-model pattern as [[Bpe.encodeWith]]). */
  def encodeWith(docs: DataFrame, vocabDf: DataFrame,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val vocab = vocabDf.orderBy("piece_id").collect()
      .map(_.getAs[String]("piece")).toSeq
    encode(docs, vocab, textCol, idCol)
  }

  /** Driver-run encoder gate (same pattern as [[Bpe.requireEncodes]]):
    * encode planted texts with analytically-derivable piece sequences
    * through the real distributed [[encode]] path and `require`
    * equality, so a broken vocab or matcher fails the driver's query
    * run. WordPieceSpec proves the gate trips on a corrupted vocab. */
  def requireEncodes(spark: SparkSession, vocab: Seq[String],
                     plants: Seq[(String, Seq[String])]): Unit = {
    import spark.implicits._
    val docs = plants.zipWithIndex
      .map { case ((t, _), i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = encode(docs, vocab).select("doc_id", "wp_tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    plants.zipWithIndex.foreach { case ((t, want), i) =>
      require(got(i.toLong) == want,
        s"wordpiece encode gate: '$t' encoded to ${got(i.toLong)}, expected $want")
    }
  }
}
