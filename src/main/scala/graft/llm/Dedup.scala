package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Near-duplicate detection at corpus scale: MinHash+LSH, SimHash, and
 * exact n-gram Jaccard verification.
 *
 * Scale design (the whole point of these operators):
 *  - NO all-pairs comparison anywhere. Candidate generation is a
 *    bucket join — MinHash signatures are banded and pairs form only
 *    inside (band, band-hash) buckets; SimHash pairs form only inside
 *    16-bit chunk buckets. Shuffle volume is O(docs × bands), not
 *    O(docs²).
 *  - Signatures are computed by explode → hash-groupBy-min: one shuffle
 *    keyed by doc_id, all aggregates map-side-combined. Everything is
 *    built-in codegen'd expressions — no UDFs.
 *  - Exact Jaccard runs only on LSH candidates (a tiny set), using
 *    array_intersect/array_union on distinct shingle sets.
 */
object Dedup {

  private val TokenRe = "[a-z0-9]+".r

  /** FNV-1a 64-bit over UTF-8 bytes — deterministic, allocation-free. */
  private def hash64(s: String): Long = {
    var h = -3750763034362895579L // FNV offset basis
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xFF)) * 1099511628211L; i += 1 }
    h
  }

  private[llm] def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else TokenRe.findAllIn(text.toLowerCase).toArray

  private def shingleArray(text: String, n: Int): Array[String] = {
    val toks = tokenize(text)
    if (toks.length < n) Array.empty
    else Array.tabulate(toks.length - n + 1)(i => toks.slice(i, i + n).mkString(" "))
  }

  /**
   * Word n-gram shingles of normalized text, as an array column.
   *
   * Deliberately a Scala UDF, not composed built-ins: the declarative
   * formulation (`transform(sequence(...), i → concat_ws(slice(...)))`)
   * runs interpreted per element with boxing — measured ~1 ms/row at 150
   * tokens, 50× slower than this single tight JVM call per row. The UDF
   * is still partition-parallel and shuffle-free.
   */
  def shingles(text: Column, n: Int): Column = {
    val f = udf((t: String, nn: Int) => shingleArray(t, nn).toSeq)
    f(text, lit(n))
  }

  /** Universal-hash parameters (a,b) per MinHash function, fixed seed so
    * signatures are reproducible across runs/executors. */
  private val Prime = 2147483647L // 2^31-1, Mersenne
  private def hashParams(numHashes: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(numHashes)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /**
   * MinHash signatures: one row per doc, `signature` = array of
   * `numHashes` minima of (a_i * h(shingle) + b_i) mod p.
   *
   * One shuffle-free pass: tokenize → shingle → base-hash → `numHashes`
   * running minima, all in a single per-row JVM loop. Two declarative
   * alternatives were measured at sf0.1 and rejected: explode +
   * 64-column groupBy-min (~5 s — explode of the interpreted shingle HOF
   * dominates) and per-slot `array_min(transform(...))` (~40% slower
   * still — higher-order functions evaluate interpreted per element).
   * Docs with no shingles keep an empty signature.
   */
  /** The one-loop signature kernel shared by [[minhashSignatures]] and
    * [[buildNearDupIndex]]. */
  private def signatureUdf(numHashes: Int, shingleN: Int) = {
    val params = hashParams(numHashes)
    udf { (text: String) =>
      // shingle hashes without materializing shingle strings: hash each
      // token once, then combine n consecutive token hashes polynomially
      // (base B mod P) — same candidate-generation quality, no per-shingle
      // string allocation
      val toks = tokenize(text)
      if (toks.length < shingleN) Seq.empty[Long]
      else {
        val th = new Array[Long](toks.length)
        var i = 0
        while (i < toks.length) { th(i) = Math.floorMod(hash64(toks(i)), Prime); i += 1 }
        val B = 1000003L
        val seen = new java.util.HashSet[Long]()
        val hs = new Array[Long](toks.length - shingleN + 1)
        var n = 0
        i = 0
        while (i <= toks.length - shingleN) {
          var h = 0L
          var j = 0
          while (j < shingleN) { h = Math.floorMod(h * B + th(i + j), Prime); j += 1 }
          if (seen.add(h)) { hs(n) = h; n += 1 }
          i += 1
        }
        params.map { case (a, b) =>
          var m = Long.MaxValue
          var k = 0
          while (k < n) {
            val v = Math.floorMod(a * hs(k) + b, Prime)
            if (v < m) m = v
            k += 1
          }
          m
        }
      }
    }
  }

  def minhashSignatures(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id",
                        numHashes: Int = 64, shingleN: Int = 3): DataFrame =
    docs.select(col(idCol),
      signatureUdf(numHashes, shingleN)(col(textCol)).as("signature"))

  /**
   * One-pass, PERSISTABLE corpus index for incremental near-dup runs:
   * `(idCol, signature, sh)` — the minhash signature for LSH banding and
   * the distinct shingle set for exact verification, computed in ONE
   * projection over the corpus (no join, one IO pass). Write it as
   * parquet once per corpus generation; the daily run reads it via
   * [[incrementalNearDupPairsWith]] instead of re-shingling the whole
   * history — that is what makes the daily cost O(batch) in practice,
   * not just in principle.
   */
  def buildNearDupIndex(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id",
                        numHashes: Int = 64, shingleN: Int = 3): DataFrame =
    docs.select(col(idCol),
      signatureUdf(numHashes, shingleN)(col(textCol)).as("signature"),
      array_distinct(shingles(col(textCol), shingleN)).as("sh"))

  /** Band keys for LSH: one row per (doc, band) with a hash of the
    * band's signature slice — the bucket-join key. */
  def lshBands(signatures: DataFrame, idCol: String = "doc_id",
               bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val bandStructs = array((0 until bands).map { j =>
      struct(lit(j).as("band"),
        xxhash64(concat_ws(",",
          transform(slice(col("signature"), j * rowsPerBand + 1, rowsPerBand),
            _.cast("string"))), lit(j)).as("bh"))
    }: _*)
    signatures.filter(size(col("signature")) > 0)
      .select(col(idCol), explode(bandStructs).as("b"))
      .select(col(idCol), col("b.band"), col("b.bh"))
  }

  /** Candidate pairs: docs sharing at least one LSH bucket. The join key
    * (band, band-hash) is uniformly distributed unless the corpus has
    * giant exact-dup clusters — run exact dedup first for that case. */
  def candidatePairs(signatures: DataFrame, idCol: String = "doc_id",
                     bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val b1 = lshBands(signatures, idCol, bands, rowsPerBand)
      .toDF("id1", "band", "bh")
    val b2 = b1.toDF("id2", "band", "bh")
    b1.join(b2, Seq("band", "bh"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Candidate pairs with the signature-estimate pre-filter applied:
    * before candidates are rejoined with their (large) shingle arrays for
    * exact verification, pairs whose [[estimatedJaccard]] falls below
    * `threshold - margin` are dropped. The estimate from 64 slots has
    * σ ≈ √(j(1−j)/64) ≈ 0.05 at j=0.8, so the default margin 0.2 (4σ)
    * keeps a true j≥threshold pair with P ≈ 1−3e−5 — negligible next to
    * the banding miss rate — while discarding the accidental bucket
    * collisions that would otherwise drag full shingle arrays through the
    * verification shuffle. At 100 TB that shuffle is the dominant cost of
    * near-dup mining; the signatures are already materialized and 64
    * longs wide, so the pre-filter is effectively free. */
  def prefilteredCandidates(signatures: DataFrame, idCol: String = "doc_id",
                            threshold: Double = 0.8, margin: Double = 0.2,
                            bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    // select by name, not positional toDF — callers may pass extra columns
    // or a different column order than (id, signature)
    val sig1 = signatures.select(col(idCol).as("id1"), col("signature").as("sig1"))
    val sig2 = signatures.select(col(idCol).as("id2"), col("signature").as("sig2"))
    candidatePairs(signatures, idCol, bands, rowsPerBand)
      .join(sig1, "id1")
      .join(sig2, "id2")
      .filter(estimatedJaccard(col("sig1"), col("sig2")) >= threshold - margin)
      .select("id1", "id2")
  }

  /**
   * Near-duplicate pairs with **exact** n-gram Jaccard ≥ `threshold`,
   * candidates generated by MinHash-LSH. With 64 hashes / 16 bands of 4,
   * a pair at j=0.8 is a candidate with p≈0.9998 (and ≈1 for j≥0.9), so
   * the result matches the all-pairs answer while doing bucket-join work.
   */
  def nearDupPairs(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", threshold: Double = 0.8,
                   numHashes: Int = 64, shingleN: Int = 3,
                   bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    // localCheckpoint materializes the signatures once: without the
    // barrier the signature subtree is recomputed on both sides of the
    // band self-join. (A per-row expression-only formulation via
    // transform/array_min was tried and measured ~40% slower at sf0.1 —
    // Spark's higher-order functions evaluate interpreted with per-element
    // boxing, while this explode → groupBy-min shape is fully codegen'd
    // and its shuffle carries only ~|docs| rows after map-side combine.)
    val sigs = minhashSignatures(docs, textCol, idCol, numHashes, shingleN)
      .localCheckpoint()
    val cands = prefilteredCandidates(sigs, idCol, threshold, margin = 0.2,
      bands = bands, rowsPerBand = rowsPerBand)
    val sh = docs.select(col(idCol),
      array_distinct(shingles(col(textCol), shingleN)).as("sh"))
    cands
      .join(sh.toDF("id1", "sh1"), "id1")
      .join(sh.toDF("id2", "sh2"), "id2")
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /**
   * Near-duplicate pairs by exact n-gram Jaccard with PREFIX-FILTERED
   * candidate generation — the deterministic alternative to MinHash-LSH
   * (PPJoin-family prefix filtering, Xiao et al., WWW'08 "Efficient
   * Similarity Joins for Near Duplicate Detection"): recall is exactly 1
   * at ANY threshold by the prefix-filtering theorem, where LSH banding
   * trades recall for bucket count.
   *
   * Theorem: order every doc's distinct n-gram set by one global total
   * order; if J(A,B) ≥ t, the first |A| − ⌈t·|A|⌉ + 1 grams of A and the
   * first |B| − ⌈t·|B|⌉ + 1 grams of B share at least one gram. So
   * candidates come from a bucket join on PREFIX grams only. The global
   * order used is (document frequency, gram) ascending — rare-first, the
   * standard heuristic: a boilerplate gram shared by half the corpus
   * sorts to the END of every set and almost never lands in a prefix, so
   * buckets stay tiny.
   *
   * Scale shape: one groupBy(gram) for document frequencies, one window
   * per doc for prefix ranks, a bucket self-join on prefix grams, exact
   * Jaccard only on candidates. Shuffles are O(docs × grams) metadata and
   * O(candidates) verification — never O(docs²). The ceil() in the prefix
   * bound is computed with a small downward bias so floating-point noise
   * can only lengthen a prefix (more candidates), never shorten it below
   * the theorem's requirement.
   */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", threshold: Double = 0.8,
                        shingleN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(threshold > 0 && threshold <= 1, s"threshold $threshold not in (0,1]")
    // barrier: consumed by the frequency agg, the prefix build, and both
    // verification sides — without it the shingle UDF recomputes 4×
    val sh = docs.select(col(idCol).as("id"),
        array_distinct(shingles(col(textCol), shingleN)).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()
    val grams = sh.select(col("id"), size(col("sh")).as("n"),
      explode(col("sh")).as("gram"))
    val dfreq = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("id").orderBy(col("df"), col("gram"))
    val prefix = grams.join(dfreq, "gram")
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <=
        col("n") - ceil(col("n") * lit(threshold) - lit(1e-6)).cast("int") + 1)
      .select(col("id"), col("gram"))
    val cands = prefix.select(col("id").as("id1"), col("gram"))
      .join(prefix.select(col("id").as("id2"), col("gram")), "gram")
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    cands
      .join(sh.select(col("id").as("id1"), col("sh").as("sh1")), "id1")
      .join(sh.select(col("id").as("id2"), col("sh").as("sh2")), "id2")
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /**
   * Incremental near-dup detection: pairs between a NEW batch and an
   * existing corpus only — the daily-ingest shape. Re-running
   * [[nearDupPairs]] over corpus+batch would re-pair the corpus with
   * itself (quadratic-in-history candidate work that was already done);
   * here corpus×corpus bucket collisions never form, because the band
   * join is new-side × corpus-side by construction. Candidates still get
   * the signature-estimate pre-filter and exact shingle verification,
   * with the same tuning knobs as the batch operator. At 100 TB the
   * corpus side's signatures/bands are computed once and persisted — the
   * daily cost is O(batch) signature work plus the bucket join.
   */
  def incrementalNearDupPairs(newDocs: DataFrame, corpus: DataFrame,
                              textCol: String = "text", idCol: String = "doc_id",
                              threshold: Double = 0.8,
                              numHashes: Int = 64, shingleN: Int = 3,
                              bands: Int = 16, rowsPerBand: Int = 4): DataFrame =
    incrementalNearDupPairsWith(newDocs,
      buildNearDupIndex(corpus, textCol, idCol, numHashes, shingleN)
        .localCheckpoint(),
      textCol, idCol, threshold, numHashes, shingleN, bands, rowsPerBand)

  /**
   * Incremental near-dup against a PRE-BUILT corpus index
   * ([[buildNearDupIndex]], typically persisted as parquet) — the
   * amortized entry point: the corpus is never re-read, re-tokenized,
   * or re-signed; the daily run pays signature work for the batch plus
   * the new×corpus band join only.
   */
  def incrementalNearDupPairsWith(newDocs: DataFrame, corpusIndex: DataFrame,
                                  textCol: String = "text", idCol: String = "doc_id",
                                  threshold: Double = 0.8,
                                  numHashes: Int = 64, shingleN: Int = 3,
                                  bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val newIdx = buildNearDupIndex(newDocs, textCol, idCol, numHashes, shingleN)
      .localCheckpoint()
    val cands = lshBands(newIdx, idCol, bands, rowsPerBand)
      .toDF("new_id", "band", "bh")
      .join(lshBands(corpusIndex, idCol, bands, rowsPerBand)
          .toDF("old_id", "band", "bh"),
        Seq("band", "bh"))
      .select("new_id", "old_id").distinct()
      .join(newIdx.select(col(idCol).as("new_id"),
        col("signature").as("sig1"), col("sh").as("sh_new_id")), "new_id")
      .join(corpusIndex.select(col(idCol).as("old_id"),
        col("signature").as("sig2"), col("sh").as("sh_old_id")), "old_id")
      .filter(estimatedJaccard(col("sig1"), col("sig2")) >= threshold - 0.2)
    cands
      .withColumn("jaccard",
        size(array_intersect(col("sh_new_id"), col("sh_old_id"))).cast("double") /
          size(array_union(col("sh_new_id"), col("sh_old_id"))))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("old_id"), col("jaccard"))
  }

  /**
   * Train/eval contamination detection: every (test doc, train doc) pair
   * sharing at least `minShared` distinct word `shingleN`-grams — the
   * standard "did an eval answer leak into the training corpus?" sweep.
   *
   * Scale shape: both sides explode to DISTINCT shingles and meet in one
   * equi-join on the shingle string, then one count per surviving pair —
   * O(shared-shingle occurrences) through the shuffle, never test×train
   * all-pairs. Ubiquitous phrases are the skew risk AND a precision
   * risk: `maxTrainDocFreq` drops shingles appearing in more than that
   * many train docs (computed with one extra aggregation) so boilerplate
   * can't flood the join or manufacture fake contamination.
   */
  def contaminationPairs(train: DataFrame, test: DataFrame,
                         textCol: String = "text", idCol: String = "doc_id",
                         shingleN: Int = 3, minShared: Int = 3,
                         maxTrainDocFreq: Option[Int] = None): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    def side(df: DataFrame, out: String): DataFrame =
      df.select(col(idCol).as(out),
          explode(array_distinct(shingles(col(textCol), shingleN))).as("gram"))
    val tr0 = side(train, "train_id")
    val tr = maxTrainDocFreq.fold(tr0) { cap =>
      val common = tr0.groupBy("gram").agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select("gram")
      tr0.join(common, Seq("gram"), "left_anti")
    }
    side(test, "test_id").join(tr, "gram")
      .groupBy("test_id", "train_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /**
   * The daily-ingest dedup ACTION: new docs that survive near-dup
   * checks BOTH against the standing corpus (via its persisted
   * [[buildNearDupIndex]]) and within the batch itself (min-id
   * survivor, the [[dedupNear]] rule) — i.e. exactly what is safe to
   * append. Cost is the incremental band join (new×corpus only) plus
   * the batch-internal LSH pass over the (small) batch; the corpus is
   * never rescanned.
   */
  def dedupNewBatch(newDocs: DataFrame, corpusIndex: DataFrame,
                    textCol: String = "text", idCol: String = "doc_id",
                    threshold: Double = 0.8,
                    numHashes: Int = 64, shingleN: Int = 3,
                    bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val vsCorpus = incrementalNearDupPairsWith(newDocs, corpusIndex,
      textCol, idCol, threshold, numHashes, shingleN, bands, rowsPerBand)
      .select(col("new_id").as(idCol))
    val internal = nearDupPairs(newDocs, textCol, idCol, threshold,
      numHashes, shingleN, bands, rowsPerBand)
      .select(col("id2").as(idCol))
    newDocs.join(vsCorpus.unionByName(internal).distinct(), Seq(idCol), "left_anti")
  }

  /**
   * Standing eval-set shingle index for INCREMENTAL decontamination:
   * one `(gram, test_id)` row per distinct word `shingleN`-gram per
   * eval doc. Persist it once per benchmark release; every daily train
   * batch then checks against the index without re-shingling the eval
   * set — the same persisted-index pattern as [[buildNearDupIndex]] /
   * `unigramModel`. Eval suites are tiny next to a training corpus, so
   * the persisted index is usually broadcast by AQE at join time.
   */
  def benchmarkIndex(test: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id", shingleN: Int = 3): DataFrame =
    test.select(col(idCol).as("test_id"),
      explode(array_distinct(shingles(col(textCol), shingleN))).as("gram"))

  /**
   * [[contaminationPairs]] against a STANDING [[benchmarkIndex]]: only
   * the batch is shingled; cost is O(batch shingles + shared-gram
   * occurrences) per day, never a re-sweep of the eval set. Boilerplate
   * control moves from the one-shot form's per-corpus `maxTrainDocFreq`
   * to an optional `commonGrams` blocklist (one `gram` column) computed
   * ONCE from the standing corpus — a per-batch doc-freq cap would make
   * a gram's fate depend on which day it arrived.
   */
  def contaminationPairsWith(batch: DataFrame, benchIndex: DataFrame,
                             textCol: String = "text", idCol: String = "doc_id",
                             shingleN: Int = 3, minShared: Int = 3,
                             commonGrams: Option[DataFrame] = None): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val b0 = batch.select(col(idCol).as("train_id"),
      explode(array_distinct(shingles(col(textCol), shingleN))).as("gram"))
    val b = commonGrams.fold(b0)(cg =>
      b0.join(cg.select("gram"), Seq("gram"), "left_anti"))
    b.join(benchIndex.select("test_id", "gram"), "gram")
      .groupBy("test_id", "train_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /**
   * The incremental decontamination ACTION: batch docs safe to append
   * given the standing [[benchmarkIndex]] — one anti-join over the ids
   * [[contaminationPairsWith]] flags. With the full train corpus as the
   * batch and no gram blocklist this selects exactly what the one-shot
   * [[decontaminate]] keeps (DedupSpec pins the equivalence).
   */
  def decontaminateWith(batch: DataFrame, benchIndex: DataFrame,
                        textCol: String = "text", idCol: String = "doc_id",
                        shingleN: Int = 3, minShared: Int = 3,
                        commonGrams: Option[DataFrame] = None): DataFrame = {
    val bad = contaminationPairsWith(batch, benchIndex, textCol, idCol,
      shingleN, minShared, commonGrams)
      .select(col("train_id").as(idCol)).distinct()
    batch.join(bad, Seq(idCol), "left_anti")
  }

  /**
   * Decontaminate a training corpus against an eval set: drop every
   * train doc sharing at least `minShared` distinct shingles with ANY
   * test doc — the action step on top of [[contaminationPairs]]'s
   * report. One distinct over the offending train ids plus one
   * left-anti join; the train side passes through exactly once, so the
   * cost profile is the sweep's (shingle equi-join, never test×train
   * all-pairs) plus an anti-join keyed on the id.
   */
  def decontaminate(train: DataFrame, test: DataFrame,
                    textCol: String = "text", idCol: String = "doc_id",
                    shingleN: Int = 3, minShared: Int = 3,
                    maxTrainDocFreq: Option[Int] = None): DataFrame = {
    val bad = contaminationPairs(train, test, textCol, idCol, shingleN,
      minShared, maxTrainDocFreq)
      .select(col("train_id").as(idCol)).distinct()
    train.join(bad, Seq(idCol), "left_anti")
  }

  /** Estimated Jaccard from two signatures (fraction of equal slots) —
    * cheap pre-filter when shingle sets are too large to rejoin. */
  def estimatedJaccard(sig1: Column, sig2: Column): Column =
    aggregate(zip_with(sig1, sig2, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(sig1)

  /** Near-dup–deduplicated corpus: of every matched pair the larger id is
    * dropped (min-id survivor, same rule as exact dedup). Pairwise — for
    * chains a→b→c where (a,c) is not itself a pair, see
    * [[connectedComponents]] + [[dedupNearTransitive]]. */
  def dedupNear(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id", threshold: Double = 0.8): DataFrame = {
    val losers = nearDupPairs(docs, textCol, idCol, threshold)
      .select(col("id2").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /**
   * Connected components over a pair list by ALTERNATING STAR
   * CONTRACTION (large-star / small-star, Kiveris et al., "Connected
   * Components in MapReduce and Beyond", SoCC'14): each round first
   * hangs every node's larger neighbors off its neighborhood minimum
   * (large-star), then folds the remaining small edges onto that
   * minimum (small-star). Components contract geometrically, so the
   * fixpoint — a star with the component's MIN id at the hub — arrives
   * in O(log n) rounds where one-hop min-label propagation needs
   * O(diameter): a pathological 10⁵-node chain component (crawl
   * mirrors, paraphrase chains) finishes in ~17 rounds instead of 10⁵.
   * Every round is two join+agg pairs shuffling on the node id; the
   * fixpoint check is a DETERMINISTIC set compare (count + anti-join),
   * never a hash heuristic. Throws if `maxIter` is hit rather than
   * returning silently-wrong groups.
   * Returns (id, component) where component = min id of the group.
   */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30): DataFrame =
    connectedComponentsWithRounds(pairs, maxIter)._1

  /** [[connectedComponents]] exposing the round count (test observable
    * for the O(log n) bound). */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame, maxIter: Int = 30): (DataFrame, Int) = {
    val nodes = pairs.select(col("id1").as("id"))
      .union(pairs.select(col("id2").as("id"))).distinct()
    // parent-pointer orientation: (u, v) with v < u, no self loops
    var edges = pairs.select(
        greatest(col("id1"), col("id2")).as("u"),
        least(col("id1"), col("id2")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint() // bound lineage growth across rounds
    // fast path: if no node appears in two edges (distinct edge endpoints
    // == 2·|edges|) every component IS a single edge — the common shape at
    // high similarity thresholds (isolated dup pairs) — and the
    // (u>v)-oriented edge set already labels each pair with its min id.
    // Skips the contraction rounds (~4 shuffles each). Endpoints are
    // counted over the SELF-LOOP-FILTERED edge set: self-loop-only nodes
    // sit outside the edges and take the isolated-node label below.
    val nEdges = edges.count()
    val nEndpoints = edges.select(col("u").as("id"))
      .union(edges.select(col("v").as("id"))).distinct().count()
    if (nEdges > 0 && nEndpoints == 2 * nEdges) {
      val lab = edges.select(col("u").as("id"), col("v").as("component"))
        .union(edges.select(col("v").as("id"), col("v").as("component")))
      val comp = nodes.join(lab, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("component"), col("id")).as("component"))
      return (comp, 0)
    }
    var iter = 0
    var converged = nEdges == 0
    while (iter < maxIter && !converged) {
      // large-star: over BOTH directions, attach each strictly-larger
      // neighbor v of u to m(u) = min(N(u) ∪ {u})
      val both = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = both.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      // no distinct here: small-star's min-agg tolerates duplicate
      // edges, and `next` dedups — saves one shuffle per round
      val large = both.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      // small-star: fold every smaller neighbor (and u itself) onto
      // m(u) = min(N_small(u) ∪ {u}); input is (u > v)-oriented, so
      // N_small(u) is exactly u's out-neighbors and m(u) = min(v)
      val minsS = large.groupBy("u").agg(min("v").as("m"))
      val joined = large.join(minsS, "u")
      val next = joined.select(col("v").as("u"), col("m").as("v"))
        .union(joined.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      // deterministic fixpoint: same size and no edge outside the old set
      converged = next.count() == edges.count() &&
        next.join(edges, Seq("u", "v"), "left_anti").isEmpty
      edges = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "raise maxIter")
    // at the fixpoint every edge is (node → component min); roots and
    // isolated nodes label themselves
    val comp = nodes
      .join(edges.select(col("u").as("id"), col("v").as("component")),
        Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("component"))
    (comp, iter)
  }

  /**
   * One-hop min-label propagation components — the O(diameter) baseline
   * [[connectedComponents]] replaced. Kept as the independent reference
   * implementation the equivalence property test checks star contraction
   * against (two algorithms agreeing is a far stronger oracle than one
   * algorithm agreeing with itself).
   */
  private[graft] def minLabelComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .union(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .localCheckpoint()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "b2"),
          col("b") === col("b2"))
        .groupBy(col("a").as("id"))
        .agg(min("component").as("nbr_min"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .localCheckpoint() // bound lineage growth across iterations
      val changed = updated.join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") =!= col("old")).limit(1).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"minLabelComponents did not converge in $maxIter iterations " +
          "(graph diameter exceeds maxIter) — raise maxIter")
    labels
  }

  /** Near-dup dedup with TRANSITIVE grouping: one survivor (min id) per
    * connected component of the pair graph. */
  def dedupNearTransitive(docs: DataFrame, textCol: String = "text",
                          idCol: String = "doc_id",
                          threshold: Double = 0.8): DataFrame = {
    val comps = connectedComponents(
      nearDupPairs(docs, textCol, idCol, threshold).select("id1", "id2"))
    val losers = comps.filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /**
   * Transitive near-dup dedup keeping the BEST doc of every component
   * (greatest `priorityCol`, ties to the smallest id) instead of the
   * arbitrary min-id survivor — the curation rule real pipelines want:
   * of N near-identical crawls, keep the longest/cleanest one. Same
   * cost shape as [[dedupNearTransitive]] (bucketed pair generation +
   * min-label components) plus one window over the docs that belong to
   * any component; singleton docs pass through untouched.
   */
  def dedupNearBest(docs: DataFrame, priorityCol: String,
                    textCol: String = "text", idCol: String = "doc_id",
                    threshold: Double = 0.8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comps = connectedComponents(
      nearDupPairs(docs, textCol, idCol, threshold).select("id1", "id2"))
    val member = docs.join(comps.withColumnRenamed("id", idCol), Seq(idCol))
    val w = Window.partitionBy("component")
      .orderBy(col(s"`$priorityCol`").desc, col(s"`$idCol`").asc)
    val survivors = member
      .withColumn("__graft_rn__", row_number().over(w))
      .filter(col("__graft_rn__") === 1)
      .select(col(s"`$idCol`"))
    val singletons = docs.join(comps.withColumnRenamed("id", idCol),
      Seq(idCol), "left_anti")
    docs.join(survivors, Seq(idCol), "left_semi").unionByName(singletons)
  }

  // ------------------------------------------------------------ SimHash

  /** Token hash for SimHash: first 8 bytes (big-endian) of md5. Chosen
    * over FNV/xxhash deliberately: md5 exists in every engine (DuckDB,
    * Trino, Postgres, Python), so fingerprints are recomputable outside
    * Spark — which is what lets the driver's DuckDB oracle brute-force-
    * verify [[simhashPairs]] end to end, and what a production pipeline
    * needs when dedup state outlives the engine that wrote it. */
  private def md5Hash64(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d).getLong
  }

  /**
   * 64-bit SimHash over word tokens: bit i of the fingerprint is the
   * sign of Σ_tokens (±1 depending on bit i of [[md5Hash64]](token)).
   * Same single-pass per-row loop rationale as [[minhashSignatures]].
   * Ties (sum == 0) → bit 0; docs with no tokens fingerprint to 0.
   */
  def simhash(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    val f = udf { (text: String) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val sums = new Array[Int](64)
      tokenize(text).foreach { t =>
        val h = md5Hash64(md, t)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
          i += 1
        }
      }
      var bits = 0L
      var i = 0
      while (i < 64) { if (sums(i) > 0) bits |= (1L << i); i += 1 }
      bits
    }
    docs.select(col(idCol), f(col(textCol)).as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * SimHash near-dup pairs with hamming distance ≤ `maxDistance` (< 16):
   * the fingerprint splits into four 16-bit chunks; any pair within
   * distance ≤ 3 agrees on ≥1 chunk (pigeonhole), so candidates come from
   * a chunk-bucket join, then the exact bit_count filter.
   */
  def simhashPairs(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", maxDistance: Int = 3): DataFrame = {
    // 4 chunks guarantee (pigeonhole) a shared chunk only up to distance 3;
    // beyond that the bucket join silently loses recall, so refuse
    require(maxDistance <= 3,
      "4-chunk banding guarantees full recall only for maxDistance <= 3")
    // Zero-token docs all fingerprint to 0 (see simhash), so they would
    // share ALL four chunk buckets with each other — k token-less docs
    // make k²/2 candidate pairs in one bucket. Drop them before chunk
    // explosion (a doc has ≥1 token iff its text has an alphanumeric
    // char), mirroring lshBands' size(signature) > 0 filter; identical-
    // content clusters belong to exact dedup, as candidatePairs advises.
    val tokenful = docs.filter(col(textCol).rlike("[a-zA-Z0-9]"))
    // same materialization-barrier rationale as nearDupPairs
    val sh = simhash(tokenful, textCol, idCol).localCheckpoint()
    val chunks = array((0 until 4).map { j =>
      struct(lit(j).as("chunk"),
        shiftright(col("simhash"), j * 16).bitwiseAND(0xFFFFL).as("ck"))
    }: _*)
    val b1 = sh.select(col(idCol).as("id1"), col("simhash").as("sh1"),
      explode(chunks).as("c"))
      .select(col("id1"), col("sh1"), col("c.chunk"), col("c.ck"))
    val b2 = b1.toDF("id2", "sh2", "chunk", "ck")
    b1.join(b2, Seq("chunk", "ck"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), hamming(col("sh1"), col("sh2")).as("distance"))
      .distinct()
      .filter(col("distance") <= maxDistance)
  }

  /** Positioned k-gram rows for [[duplicatedSpans]]: (1-based start
    * position, space-joined k tokens). Same tight-UDF rationale as
    * [[shingles]] — one JVM call per row, partition-parallel,
    * shuffle-free; the declarative `transform(sequence(...))` form runs
    * interpreted per element and was measured ~50× slower. */
  private def posGramUdf(k: Int) = udf { (t: String) =>
    val toks = tokenize(t)
    if (toks.length < k) Seq.empty[(Int, String)]
    else (1 to toks.length - k + 1)
      .map(i => (i, toks.slice(i - 1, i + k - 1).mkString(" ")))
  }

  /**
   * Corpus-wide EXACT duplicated-span detection — the exact-substring
   * dedup of Lee et al. 2021 ("Deduplicating Training Data Makes
   * Language Models Better", arXiv:2107.06499, which finds ≥50-token
   * runs with a suffix array) re-expressed Spark-first: for every
   * unordered doc pair sharing a run of ≥ `minSpanTokens` consecutive
   * tokens, the length of the longest shared run and the count of
   * maximal shared runs.
   *
   * How: positioned token k-grams equi-join on the gram STRING (a
   * content bucket — candidates only ever meet inside a shared gram,
   * never all-pairs, and no hashing means no false candidates); matches
   * between a pair lie on diagonals `pos_a − pos_b`, and consecutive
   * matches on one diagonal merge into maximal runs with one
   * islands window (`pos_a − row_number`). A true shared run of L
   * tokens yields exactly L−k+1 consecutive gram matches, so
   * `span = matches + k − 1` is exact — recall 1 and precision 1 at
   * any threshold ≥ k, by construction.
   *
   * Scale: the join is keyed on the gram, so cost is Σ df(gram)² over
   * matched grams — near-linear for k ≥ 8 where real-text grams are
   * almost unique. The one honest knob is `maxGramDocFreq`: drop grams
   * occurring in more than that many docs BEFORE the join (boilerplate
   * headers, license blocks). The recall caveat is precise: a span is
   * missed only if EVERY k-gram inside it exceeds the cap; any one
   * sub-cap anchor gram re-seeds its diagonal, and the island then
   * under-reports length rather than losing the pair. The islands
   * window partitions by (pair, diagonal) — granular, skew-free. */
  def duplicatedSpans(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", k: Int = 8,
                      minSpanTokens: Int = 12,
                      maxGramDocFreq: Option[Int] = None): DataFrame =
    sharedSpans(docs, textCol, idCol, k, minSpanTokens, maxGramDocFreq)
      .groupBy("doc_a", "doc_b")
      .agg(max(col("span_tokens")).as("max_span_tokens"),
        count(lit(1)).as("n_spans"))

  /** The maximal shared runs themselves, one row per island:
    * `(doc_a, doc_b, start_a, start_b, span_tokens)` with 1-based
    * token start positions on both sides — the building block
    * [[duplicatedSpans]] aggregates and [[removeDuplicatedSpans]]
    * cuts. Mechanics and scale notes in [[duplicatedSpans]]. */
  def sharedSpans(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id", k: Int = 8,
                  minSpanTokens: Int = 12,
                  maxGramDocFreq: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"k-gram width must be >= 2, got $k")
    require(minSpanTokens >= k,
      s"minSpanTokens ($minSpanTokens) below k ($k) is unsatisfiable: " +
        "a single matched gram already spans k tokens")
    val g0 = spanGramIndex(docs, textCol, idCol, k)
    val g = maxGramDocFreq match {
      case None => g0
      case Some(cap) =>
        require(cap >= 2, s"maxGramDocFreq must be >= 2, got $cap")
        val hot = g0.groupBy("gram")
          .agg(countDistinct(col(idCol)).as("df"))
          .filter(col("df") > cap).select("gram")
        g0.join(hot, Seq("gram"), "left_anti")
    }
    val a = g.select(col(idCol).as("doc_a"), col("pos").as("pos_a"), col("gram"))
    val b = g.select(col(idCol).as("doc_b"), col("pos").as("pos_b"), col("gram"))
    val w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    a.join(b, "gram")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pos_a"),
        (col("pos_a") - col("pos_b")).as("diag"))
      .withColumn("grp", col("pos_a") - row_number().over(w))
      .groupBy("doc_a", "doc_b", "diag", "grp")
      .agg(count(lit(1)).as("matches"), min(col("pos_a")).as("start_a"))
      .withColumn("span_tokens", col("matches") + lit(k - 1))
      .filter(col("span_tokens") >= minSpanTokens)
      .select(col("doc_a"), col("doc_b"), col("start_a"),
        (col("start_a") - col("diag")).as("start_b"), col("span_tokens"))
  }

  /** Tokens with 1-based positions (same tight-UDF rationale as
    * [[posGramUdf]]). */
  private def posTokUdf = udf { (t: String) =>
    tokenize(t).toSeq.zipWithIndex.map { case (tok, i) => (i + 1, tok) }
  }

  /** The positioned k-gram table `(idCol, pos, gram)` — [[sharedSpans]]'
    * join input, exposed as the PERSISTABLE standing-corpus index for
    * incremental span dedup (same amortization contract as
    * [[benchmarkIndex]]: build once per corpus generation, write as
    * parquet — partition or cluster by `gram` prefix at scale so the
    * daily batch join prunes — and feed [[sharedSpansAgainst]] at
    * O(batch) cost per day). */
  def spanGramIndex(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id", k: Int = 8): DataFrame =
    docs.select(col(idCol), explode(posGramUdf(k)(col(textCol))).as("pg"))
      .select(col(idCol), col("pg._1").as("pos"), col("pg._2").as("gram"))

  /**
   * The REMOVAL action of Lee et al. 2021's exact-substring dedup:
   * keep the FIRST occurrence (the smallest id, per `doc_a < doc_b`)
   * of every duplicated span and cut it from every later doc. Output
   * is one row per input doc with the cleaned text as a NORMALIZED
   * token stream (lowercase alnum tokens, single-space joined —
   * pipelines running token-level dedup operate on exactly this
   * stream; byte-faithful reconstruction is out of scope and
   * documented so). A doc whose every token is cut comes back as ''
   * — downstream length gates drop it.
   *
   * Plan: [[sharedSpans]] intervals on the b side → one range-predicate
   * LEFT ANTI join against the positioned tokens (equi on doc id, so
   * it stays a hash join; intervals per doc are few) → one
   * sort-rebuild aggregate. Overlapping cut intervals need no
   * pre-merge — the anti join handles overlap naturally.
   */
  def removeDuplicatedSpans(docs: DataFrame, textCol: String = "text",
                            idCol: String = "doc_id", k: Int = 8,
                            minSpanTokens: Int = 12,
                            maxGramDocFreq: Option[Int] = None): DataFrame = {
    val cuts = sharedSpans(docs, textCol, idCol, k, minSpanTokens, maxGramDocFreq)
      .select(col("doc_b").as("cut_id"), col("start_b").as("lo"),
        (col("start_b") + col("span_tokens") - 1).as("hi"))
    cutAndRebuild(docs, cuts, textCol, idCol)
  }

  /** Shared removal tail: positioned tokens → one range-predicate LEFT
    * ANTI join against the cut intervals (equi on doc id, so it stays a
    * hash join; intervals per doc are few) → one sort-rebuild
    * aggregate. Overlapping cut intervals need no pre-merge — the anti
    * join handles overlap naturally. */
  private def cutAndRebuild(docs: DataFrame, cuts: DataFrame,
                            textCol: String, idCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(posTokUdf(col(textCol))).as("pt"))
      .select(col(idCol), col("pt._1").as("pos"), col("pt._2").as("tok"))
    val kept = toks.join(cuts,
      toks(idCol) === cuts("cut_id") &&
        col("pos") >= col("lo") && col("pos") <= col("hi"),
      "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        s => s.getField("tok"))).as("__cleaned__"))
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("__cleaned__"), lit("")).as(textCol))
  }

  /**
   * INCREMENTAL duplicated-span detection — the batch-vs-standing-corpus
   * form of [[sharedSpans]], mirroring [[decontaminateWith]]: maximal
   * runs shared between a NEW batch and a corpus whose positioned-gram
   * index ([[spanGramIndex]]) was built once and persisted. Only the
   * batch is gram-exploded at query time; the corpus contributes the
   * gram-keyed equi-join against its index — O(batch) per day, where
   * re-running [[sharedSpans]] over corpus+batch would re-pair the
   * whole corpus every run (the quadratic-in-history trap
   * [[incrementalNearDupPairs]] documents). Output matches
   * [[sharedSpans]] with `doc_a` = corpus doc, `doc_b` = batch doc.
   *
   * `maxGramDocFreq` caps gram document-frequency measured over the
   * CORPUS INDEX (boilerplate lives in the standing corpus; the cap
   * must not drift with daily batch composition) — same recall caveat
   * as [[duplicatedSpans]]. Epochs are distinct documents by contract:
   * ids shared across batch and corpus are excluded defensively.
   * Batch-internal spans are deliberately out of scope — run
   * [[removeDuplicatedSpans]] within the batch for those.
   */
  def sharedSpansAgainst(batch: DataFrame, corpusIndex: DataFrame,
                         textCol: String = "text", idCol: String = "doc_id",
                         k: Int = 8, minSpanTokens: Int = 12,
                         maxGramDocFreq: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"k-gram width must be >= 2, got $k")
    require(minSpanTokens >= k,
      s"minSpanTokens ($minSpanTokens) below k ($k) is unsatisfiable: " +
        "a single matched gram already spans k tokens")
    val bg0 = spanGramIndex(batch, textCol, idCol, k)
    val bg = maxGramDocFreq match {
      case None => bg0
      case Some(cap) =>
        require(cap >= 2, s"maxGramDocFreq must be >= 2, got $cap")
        val hot = corpusIndex.groupBy("gram")
          .agg(countDistinct(col(idCol)).as("df"))
          .filter(col("df") > cap).select("gram")
        bg0.join(hot, Seq("gram"), "left_anti")
    }
    val a = corpusIndex.select(col(idCol).as("doc_a"),
      col("pos").as("pos_a"), col("gram"))
    val b = bg.select(col(idCol).as("doc_b"), col("pos").as("pos_b"), col("gram"))
    val w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    a.join(b, "gram")
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pos_a"),
        (col("pos_a") - col("pos_b")).as("diag"))
      .withColumn("grp", col("pos_a") - row_number().over(w))
      .groupBy("doc_a", "doc_b", "diag", "grp")
      .agg(count(lit(1)).as("matches"), min(col("pos_a")).as("start_a"))
      .withColumn("span_tokens", col("matches") + lit(k - 1))
      .filter(col("span_tokens") >= minSpanTokens)
      .select(col("doc_a"), col("doc_b"), col("start_a"),
        (col("start_a") - col("diag")).as("start_b"), col("span_tokens"))
  }

  /** The incremental REMOVAL action: cut every span the batch shares
    * with the standing corpus FROM THE BATCH ONLY (the corpus member
    * always wins — epochs are ordered, same rule as
    * [[Similarity.semanticDedupBatch]]). Output is one row per batch
    * doc with the cleaned normalized token stream, exactly
    * [[removeDuplicatedSpans]]' contract; the corpus is never
    * rewritten, so the persisted index stays valid. */
  def removeDuplicatedSpansAgainst(batch: DataFrame, corpusIndex: DataFrame,
                                   textCol: String = "text",
                                   idCol: String = "doc_id", k: Int = 8,
                                   minSpanTokens: Int = 12,
                                   maxGramDocFreq: Option[Int] = None): DataFrame = {
    val cuts = sharedSpansAgainst(batch, corpusIndex, textCol, idCol, k,
      minSpanTokens, maxGramDocFreq)
      .select(col("doc_b").as("cut_id"), col("start_b").as("lo"),
        (col("start_b") + col("span_tokens") - 1).as("hi"))
    cutAndRebuild(batch, cuts, textCol, idCol)
  }
}
