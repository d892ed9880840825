package graft.table

import graft.llm.{Retrieval, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Shared machinery for CDF-maintained index views ([[Bm25IndexView]],
 * [[PositionalIndexView]], [[AnnIndexView]]): net a change-feed slice
 * per (id, payload) under ±1 signs, and the id-membership gates every
 * standing index needs before folding a delta.
 */
private[table] object CdfNetting {

  /** Net `cdf` per (`idCol`, `payloadCols`) with sign +1 for
    * insert/update_postimage and −1 for delete/update_preimage, so a
    * dir-rewrite commit's coarse feed (all old dir rows − / survivors
    * +) cancels to the minimal delta. Returns `(ins, del)` — rows
    * entering and rows leaving, both checkpointed. Refuses feeds that
    * net to duplicate same-direction rows for one id (|net| ≠ 1, or
    * two different payloads entering for the same id) — duplicate ids
    * cannot index. */
  def net(cdf: DataFrame, idCol: String, payloadCols: Seq[String],
          what: String): (DataFrame, DataFrame) = {
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val cols = col(s"`$idCol`") +: payloadCols.map(c => col(s"`$c`"))
    val netted = cdf.select(cols :+ sign.as("__sign__"): _*)
      .groupBy(cols: _*)
      .agg(sum("__sign__").as("__cnt__"))
      .filter(col("__cnt__") =!= 0L)
      .localCheckpoint()
    val badCnt = netted.filter(abs(col("__cnt__")) =!= 1L)
    val dupDir = netted
      .groupBy(col(s"`$idCol`"), (col("__cnt__") > 0L).as("__pos__"))
      .agg(count(lit(1)).as("__n__"))
      .filter(col("__n__") > 1L)
    require(badCnt.isEmpty && dupDir.isEmpty,
      s"$what: the change-feed slice nets to duplicate rows for one id " +
        "(|net sign| != 1 or multiple same-direction payloads) — " +
        "duplicate ids cannot index; dedup upstream")
    (netted.filter(col("__cnt__") > 0L).select(cols: _*),
      netted.filter(col("__cnt__") < 0L).select(cols: _*))
  }

  /** Every id in `delIds` must exist among `indexIds` (subtracting
    * rows that were never added would corrupt the index silently).
    * One narrow pass over the index, broadcast semi-join. */
  def requireExistingIds(indexIds: DataFrame, delIds: DataFrame,
                         what: String): Unit = {
    val del = delIds.distinct().localCheckpoint()
    val nDel = del.count()
    if (nDel == 0) return
    val matched = indexIds
      .join(broadcast(del), indexIds.columns.toSeq, "semi")
      .distinct().count()
    require(matched == nDel,
      s"$what: ${nDel - matched} deleted ids are not in the index — the " +
        "delta does not describe this index's corpus")
  }

  /** Every id in `insIds` must be NEW relative to the surviving index
    * (`indexIds` minus `delIds`) — bloom-gated: only bloom-positive
    * suspects reach the exact semi-check, so the common all-new batch
    * never touches the index at all. An update's reused id passes
    * because its delete lands in the same delta. Ids compare as
    * strings (the blooms hash `xxhash64(cast(id as string))`). */
  def requireNewIds(spark: SparkSession, indexIds: DataFrame,
                    insIds: DataFrame, delIds: DataFrame,
                    bloom: Option[Array[Byte]], what: String): Unit = {
    val idName = insIds.columns.head
    val ins = insIds.distinct()
    val suspects = (bloom match {
      case Some(bytes) =>
        graft.expressions.MightContain.register(spark)
        ins.filter(call_function(graft.expressions.MightContain.Name,
          lit(bytes), xxhash64(col(s"`$idName`").cast("string"))))
      case None => ins
    }).localCheckpoint()
    if (suspects.isEmpty) return
    val dup = indexIds
      .join(broadcast(suspects), indexIds.columns.toSeq, "semi")
      .join(broadcast(delIds.distinct().toDF("__del__")),
        col(s"`${indexIds.columns.head}`").cast("string") ===
          col("__del__").cast("string"), "anti")
      .distinct().count()
    require(dup == 0L,
      s"$what: $dup inserted ids already exist in the surviving index — " +
        "inserts must be new or paired with a delete")
  }
}

/**
 * The POSITIONAL index behind [[Retrieval.phraseSearchWith]] as a
 * standing, CDF-maintained view — the [[Bm25IndexView]] pattern for
 * exact phrase search: the corpus lives in a [[ManagedTable]], the
 * `(doc_id, pos, tok)` occurrence rows live in their own ManagedTable,
 * and each refresh reads ONLY the unprocessed change-feed range.
 * Positions are per-document, so maintenance is ROW-LOCAL — no
 * df-style cross-document statistic moves:
 *
 *   - a pure-insert slice lands as an APPEND commit of the batch's own
 *     posexploded rows — O(batch), the standing index is not even read;
 *   - a slice with deletes/updates rewrites once: survivors leave by
 *     broadcast anti-join on the (batch-sized) deleted-id set, the
 *     entering docs' rows union on — one narrow pass, no shuffle of
 *     the index (the same budget the BM25 view's signed path pays).
 *
 * Exactly-once watermarks, the doc-id bloom gate, and the loud
 * duplicate-id / recreated-source contracts are [[Bm25IndexView]]'s,
 * verbatim; the bloom only ever grows (deleted ids stay — a re-insert
 * falls through to the exact check against the surviving index).
 */
final class PositionalIndexView(spark: SparkSession, sourcePath: String,
                                statePath: String,
                                textCol: String = "text",
                                idCol: String = "doc_id",
                                expectedDocs: Long = 10000000L) {

  private def meta(v: Long) = Some(s"""{"sourceVersion":$v}""")
  private val MetaRe = """\{"sourceVersion":(\d+)\}""".r

  private def source = ManagedTable(spark, sourcePath)
  private def state = ManagedTable(spark, statePath)
  private val bloomPath = statePath.stripSuffix("/") + "_bloom"

  /** The last source version folded into the index. */
  def sourceVersion: Long = {
    val c = state.lastCommit.getOrElse(throw new IllegalStateException(
      s"positional view state $statePath does not exist — call initialize() first"))
    c.userMetadata match {
      case Some(MetaRe(v)) => v.toLong
      case other => throw new IllegalStateException(
        s"state commit carries no sourceVersion watermark: $other")
    }
  }

  /** Build from the corpus's CURRENT snapshot — bloom first (crash
    * between the two only over-approximates, never under-covers). */
  def initialize(): Long = {
    val v = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    val snapshot = source.read
    Retrieval.bm25IndexBloom(snapshot.select(col(idCol).as("doc_id")),
        expectedDocs)
      .write.mode("overwrite").parquet(bloomPath)
    state.write(Retrieval.positionalIndex(snapshot, textCol, idCol),
      "PHRASE_INIT", "replace", meta(v))
    v
  }

  /** Fold the unprocessed change-feed range. No-op (no commit) when
    * already current or the range nets to nothing. */
  def refresh(): Long = {
    val last = sourceVersion
    val latest = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    require(latest >= last,
      s"source went backwards: watermark $last, latest $latest — was the " +
        "corpus table recreated? Re-initialize the view.")
    if (latest == last) return last
    val cdf = source.readChangeFeed(last + 1, Some(latest))
    val (ins, del) = CdfNetting.net(cdf, idCol, Seq(textCol),
      "positional index view")
    if (ins.isEmpty && del.isEmpty) return last
    val (bloomBytes, _, _) = Retrieval.bm25BloomFrom(
      spark.read.parquet(bloomPath))
    val insIds = ins.select(col(s"`$idCol`").as("doc_id"))
    val delIds = del.select(col(s"`$idCol`").as("doc_id"))
    CdfNetting.requireNewIds(spark, state.read.select("doc_id"), insIds,
      delIds, Some(bloomBytes), "positional index view")
    if (!ins.isEmpty)
      Retrieval.bm25BloomAdd(spark.read.parquet(bloomPath), ins, idCol)
        .write.mode("overwrite").parquet(bloomPath)
    if (del.isEmpty)
      // positions are row-local: a pure-insert slice APPENDS its own
      // rows, the standing index is never read or rewritten
      state.write(Retrieval.positionalIndex(ins, textCol, idCol),
        "PHRASE_REFRESH", "append", meta(latest))
    else {
      CdfNetting.requireExistingIds(state.read.select("doc_id"), delIds,
        "positional index view")
      val survivors = state.read
        .join(broadcast(delIds.distinct().toDF("__del__")),
          col("doc_id").cast("string") === col("__del__").cast("string"),
          "anti")
      state.write(
        survivors.unionByName(Retrieval.positionalIndex(ins, textCol, idCol)),
        "PHRASE_REFRESH", "replace", meta(latest),
        expectedPrevVersion = state.latestVersion)
    }
    latest
  }

  /** The maintained occurrence table — feed straight into
    * [[Retrieval.phraseSearchWith]]. */
  def read: DataFrame = state.read
}

/**
 * The standing NEAR-DUP index ([[graft.llm.Dedup.buildNearDupIndex]] —
 * the MinHash-signature + shingle-set table behind incremental
 * batch-vs-corpus dedup) as a CDF-maintained view. This closes the
 * most consequential curation asymmetry of the dedup family itself: a
 * stale index keeps DELETED documents' signatures, so a re-submitted
 * document is rejected as a duplicate of a GHOST — a doc the corpus no
 * longer contains. Rows are per-document (signature + shingle set), so
 * maintenance is row-local exactly like [[PositionalIndexView]]:
 * pure-insert slices land as APPEND commits of the batch's own
 * signature rows (the standing index is not even read), delete slices
 * rewrite once via broadcast anti-join, updates are the (−pre, +post)
 * pair. Same watermark/bloom/duplicate-id contracts as the family.
 */
final class NearDupIndexView(spark: SparkSession, sourcePath: String,
                             statePath: String,
                             textCol: String = "text",
                             idCol: String = "doc_id",
                             numHashes: Int = 64, shingleN: Int = 3,
                             expectedDocs: Long = 10000000L) {
  import graft.llm.Dedup

  private def meta(v: Long) = Some(s"""{"sourceVersion":$v}""")
  private val MetaRe = """\{"sourceVersion":(\d+)\}""".r

  private def source = ManagedTable(spark, sourcePath)
  private def state = ManagedTable(spark, statePath)
  private val bloomPath = statePath.stripSuffix("/") + "_bloom"

  private def build(docs: DataFrame): DataFrame =
    Dedup.buildNearDupIndex(docs, textCol, idCol, numHashes, shingleN)

  /** The last source version folded into the index. */
  def sourceVersion: Long = {
    val c = state.lastCommit.getOrElse(throw new IllegalStateException(
      s"neardup view state $statePath does not exist — call initialize() first"))
    c.userMetadata match {
      case Some(MetaRe(v)) => v.toLong
      case other => throw new IllegalStateException(
        s"state commit carries no sourceVersion watermark: $other")
    }
  }

  /** Build from the corpus's CURRENT snapshot (bloom first — the
    * family's crash-safe order). */
  def initialize(): Long = {
    val v = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    val snapshot = source.read
    Retrieval.bm25IndexBloom(snapshot.select(col(s"`$idCol`").as("doc_id")),
        expectedDocs)
      .write.mode("overwrite").parquet(bloomPath)
    state.write(build(snapshot), "NEARDUP_INIT", "replace", meta(v))
    v
  }

  /** Fold the unprocessed change-feed range. No-op (no commit) when
    * already current or the range nets to nothing. */
  def refresh(): Long = {
    val last = sourceVersion
    val latest = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    require(latest >= last,
      s"source went backwards: watermark $last, latest $latest — was the " +
        "corpus table recreated? Re-initialize the view.")
    if (latest == last) return last
    val cdf = source.readChangeFeed(last + 1, Some(latest))
    val (ins, del) = CdfNetting.net(cdf, idCol, Seq(textCol), "neardup view")
    if (ins.isEmpty && del.isEmpty) return last
    val (bloomBytes, _, _) = Retrieval.bm25BloomFrom(
      spark.read.parquet(bloomPath))
    val insIds = ins.select(col(s"`$idCol`").as("doc_id"))
    val delIds = del.select(col(s"`$idCol`").as("doc_id"))
    CdfNetting.requireNewIds(spark,
      state.read.select(col(s"`$idCol`").as("doc_id")), insIds, delIds,
      Some(bloomBytes), "neardup view")
    if (!ins.isEmpty)
      Retrieval.bm25BloomAdd(spark.read.parquet(bloomPath), ins, idCol)
        .write.mode("overwrite").parquet(bloomPath)
    if (del.isEmpty)
      state.write(build(ins), "NEARDUP_REFRESH", "append", meta(latest))
    else {
      CdfNetting.requireExistingIds(
        state.read.select(col(s"`$idCol`").as("doc_id")), delIds,
        "neardup view")
      val survivors = state.read
        .join(broadcast(delIds.distinct().toDF("__del__")),
          col(s"`$idCol`").cast("string") === col("__del__").cast("string"),
          "anti")
      state.write(survivors.unionByName(build(ins)),
        "NEARDUP_REFRESH", "replace", meta(latest),
        expectedPrevVersion = state.latestVersion)
    }
    latest
  }

  /** The maintained signature index. */
  def read: DataFrame = state.read

  /** Keep only the batch docs that are near-dups of NOTHING — neither
    * the maintained corpus index (ghost-free: deleted docs no longer
    * reject re-submissions) nor each other
    * ([[graft.llm.Dedup.dedupNewBatch]]). */
  def dedupBatch(newDocs: DataFrame, threshold: Double = 0.8,
                 bands: Int = 16, rowsPerBand: Int = 4): DataFrame =
    Dedup.dedupNewBatch(newDocs, state.read, textCol, idCol, threshold,
      numHashes, shingleN, bands, rowsPerBand)
}

/**
 * The standing DECONTAMINATION benchmark index
 * ([[graft.llm.Dedup.benchmarkIndex]] — one `(gram, test_id)` row per
 * distinct eval-doc shingle) as a CDF-maintained view over the
 * BENCHMARK table. Benchmarks change too: suites gain members
 * (appends) and retire them (deletes) — and a stale index keeps a
 * retired benchmark's grams, so clean training documents are held
 * back as "contaminated" against eval items that no longer exist
 * (ghost contamination — the exact mirror of the corpus-side ghost
 * dedup). Grams are per-eval-doc, so maintenance is row-local like
 * [[PositionalIndexView]]: pure-insert slices APPEND the batch's own
 * gram rows, delete slices rewrite once via broadcast anti-join on
 * `test_id`, updates are the (−pre, +post) pair. Same watermark /
 * bloom / duplicate-id contracts as the family.
 */
final class BenchmarkIndexView(spark: SparkSession, sourcePath: String,
                               statePath: String,
                               textCol: String = "text",
                               idCol: String = "doc_id",
                               shingleN: Int = 3,
                               expectedDocs: Long = 10000000L) {
  import graft.llm.Dedup

  private def meta(v: Long) = Some(s"""{"sourceVersion":$v}""")
  private val MetaRe = """\{"sourceVersion":(\d+)\}""".r

  private def source = ManagedTable(spark, sourcePath)
  private def state = ManagedTable(spark, statePath)
  private val bloomPath = statePath.stripSuffix("/") + "_bloom"

  private def build(docs: DataFrame): DataFrame =
    Dedup.benchmarkIndex(docs, textCol, idCol, shingleN)

  /** The last source version folded into the index. */
  def sourceVersion: Long = {
    val c = state.lastCommit.getOrElse(throw new IllegalStateException(
      s"benchmark view state $statePath does not exist — call initialize() first"))
    c.userMetadata match {
      case Some(MetaRe(v)) => v.toLong
      case other => throw new IllegalStateException(
        s"state commit carries no sourceVersion watermark: $other")
    }
  }

  /** Build from the benchmark table's CURRENT snapshot. */
  def initialize(): Long = {
    val v = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    val snapshot = source.read
    Retrieval.bm25IndexBloom(snapshot.select(col(s"`$idCol`").as("doc_id")),
        expectedDocs)
      .write.mode("overwrite").parquet(bloomPath)
    state.write(build(snapshot), "BENCH_INIT", "replace", meta(v))
    v
  }

  /** Fold the unprocessed change-feed range. No-op (no commit) when
    * already current or the range nets to nothing. */
  def refresh(): Long = {
    val last = sourceVersion
    val latest = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    require(latest >= last,
      s"source went backwards: watermark $last, latest $latest — was the " +
        "benchmark table recreated? Re-initialize the view.")
    if (latest == last) return last
    val cdf = source.readChangeFeed(last + 1, Some(latest))
    val (ins, del) = CdfNetting.net(cdf, idCol, Seq(textCol), "benchmark view")
    if (ins.isEmpty && del.isEmpty) return last
    val (bloomBytes, _, _) = Retrieval.bm25BloomFrom(
      spark.read.parquet(bloomPath))
    val insIds = ins.select(col(s"`$idCol`").as("doc_id"))
    val delIds = del.select(col(s"`$idCol`").as("doc_id"))
    CdfNetting.requireNewIds(spark,
      state.read.select(col("test_id").as("doc_id")), insIds, delIds,
      Some(bloomBytes), "benchmark view")
    if (!ins.isEmpty)
      Retrieval.bm25BloomAdd(spark.read.parquet(bloomPath), ins, idCol)
        .write.mode("overwrite").parquet(bloomPath)
    if (del.isEmpty)
      state.write(build(ins), "BENCH_REFRESH", "append", meta(latest))
    else {
      CdfNetting.requireExistingIds(
        state.read.select(col("test_id").as("doc_id")), delIds,
        "benchmark view")
      val survivors = state.read
        .join(broadcast(delIds.distinct().toDF("__del__")),
          col("test_id").cast("string") === col("__del__").cast("string"),
          "anti")
      state.write(survivors.unionByName(build(ins)),
        "BENCH_REFRESH", "replace", meta(latest),
        expectedPrevVersion = state.latestVersion)
    }
    latest
  }

  /** The maintained `(test_id, gram)` index. */
  def read: DataFrame = state.read

  /** Keep only the batch docs safe to train on — not contaminated
    * against any CURRENT benchmark member
    * ([[graft.llm.Dedup.decontaminateWith]], ghost-free). */
  def decontaminate(batch: DataFrame, minShared: Int = 3,
                    commonGrams: Option[DataFrame] = None): DataFrame =
    Dedup.decontaminateWith(batch, state.read, textCol, idCol, shingleN,
      minShared, commonGrams)
}

/**
 * The standing SEMANTIC-DEDUP index ([[Similarity.buildSemanticIndex]]
 * — each corpus vector with its k-means cell and centroid cosine) as a
 * CDF-maintained view — the embedding-space sibling of
 * [[NearDupIndexView]], closing the same ghost asymmetry: a stale
 * index keeps deleted vectors, so a re-submitted (or re-embedded)
 * document is semantically rejected against a doc the corpus no
 * longer contains. The cell quantizer trains ONCE at [[initialize]]
 * and persists beside the state (the [[AnnIndexView]] add-vs-train
 * split — re-training on drift is an explicit re-initialize); rows
 * are per-vector, so pure-insert slices APPEND their own cell-assigned
 * rows and delete slices rewrite once via broadcast anti-join. Same
 * watermark/bloom/duplicate-id contracts as the family.
 */
final class SemanticIndexView(spark: SparkSession, sourcePath: String,
                              statePath: String,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding",
                              nlist: Int = 16, trainIters: Int = 2,
                              expectedVecs: Long = 10000000L) {

  private def meta(v: Long) = Some(s"""{"sourceVersion":$v}""")
  private val MetaRe = """\{"sourceVersion":(\d+)\}""".r

  private def source = ManagedTable(spark, sourcePath)
  private def state = ManagedTable(spark, statePath)
  private val bloomPath = statePath.stripSuffix("/") + "_bloom"
  private val centsPath = statePath.stripSuffix("/") + "_centroids"

  /** The frozen cell quantizer (trained at [[initialize]]). */
  def centroids: Array[Array[Double]] =
    Similarity.centroidsFrom(spark.read.parquet(centsPath))

  /** The last source version folded into the index. */
  def sourceVersion: Long = {
    val c = state.lastCommit.getOrElse(throw new IllegalStateException(
      s"semantic view state $statePath does not exist — call initialize() first"))
    c.userMetadata match {
      case Some(MetaRe(v)) => v.toLong
      case other => throw new IllegalStateException(
        s"state commit carries no sourceVersion watermark: $other")
    }
  }

  /** Train the quantizer on the CURRENT snapshot and index it. */
  def initialize(): Long = {
    val v = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    val snapshot = source.read
    val cents = Similarity.trainCentroids(snapshot, nlist, trainIters,
      idCol, vecCol)
    Similarity.centroidsTable(spark, cents)
      .write.mode("overwrite").parquet(centsPath)
    Retrieval.bm25IndexBloom(snapshot.select(col(s"`$idCol`").as("doc_id")),
        expectedVecs)
      .write.mode("overwrite").parquet(bloomPath)
    state.write(Similarity.buildSemanticIndex(cents, snapshot, idCol, vecCol),
      "SEMANTIC_INIT", "replace", meta(v))
    v
  }

  /** Fold the unprocessed change-feed range against the FROZEN
    * quantizer. No-op (no commit) when already current or the range
    * nets to nothing. */
  def refresh(): Long = {
    val last = sourceVersion
    val latest = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    require(latest >= last,
      s"source went backwards: watermark $last, latest $latest — was the " +
        "corpus table recreated? Re-initialize the view.")
    if (latest == last) return last
    val cdf = source.readChangeFeed(last + 1, Some(latest))
    val (ins, del) = CdfNetting.net(cdf, idCol, Seq(vecCol), "semantic view")
    if (ins.isEmpty && del.isEmpty) return last
    val (bloomBytes, _, _) = Retrieval.bm25BloomFrom(
      spark.read.parquet(bloomPath))
    val insIds = ins.select(col(s"`$idCol`").as("doc_id"))
    val delIds = del.select(col(s"`$idCol`").as("doc_id"))
    CdfNetting.requireNewIds(spark,
      state.read.select(col(s"`$idCol`").as("doc_id")), insIds, delIds,
      Some(bloomBytes), "semantic view")
    if (!ins.isEmpty)
      Retrieval.bm25BloomAdd(spark.read.parquet(bloomPath), ins, idCol)
        .write.mode("overwrite").parquet(bloomPath)
    if (del.isEmpty)
      state.write(Similarity.buildSemanticIndex(centroids, ins, idCol, vecCol),
        "SEMANTIC_REFRESH", "append", meta(latest))
    else {
      CdfNetting.requireExistingIds(
        state.read.select(col(s"`$idCol`").as("doc_id")), delIds,
        "semantic view")
      val survivors = state.read
        .join(broadcast(delIds.distinct().toDF("__del__")),
          col(s"`$idCol`").cast("string") === col("__del__").cast("string"),
          "anti")
      state.write(survivors.unionByName(
          Similarity.buildSemanticIndex(centroids, ins, idCol, vecCol)),
        "SEMANTIC_REFRESH", "replace", meta(latest),
        expectedPrevVersion = state.latestVersion)
    }
    latest
  }

  /** The maintained `(id, vec, cell, cent_cos)` index. */
  def read: DataFrame = state.read

  /** Keep only the batch vectors that are semantic duplicates of
    * NOTHING — neither the maintained (ghost-free) corpus index nor
    * each other ([[Similarity.semanticDedupBatch]]). */
  def dedupBatch(batch: DataFrame, threshold: Double): DataFrame =
    Similarity.semanticDedupBatch(centroids, batch, state.read, threshold,
      idCol, vecCol)
}

/**
 * The corpus unigram language model ([[graft.llm.TextOps.unigramModel]]
 * — the `(tok, freq)` table behind rare-token gating, tf-idf and the
 * rarity curation filters) as a standing, CDF-maintained view. Token
 * counts are PURELY ADDITIVE, so this is the cleanest member of the
 * family: an entering doc's term frequencies add, a leaving doc's
 * subtract, an update is the (−pre, +post) pair — the fold is exact
 * under any mix of appends, deletes, and updates, with no append-only
 * carve-out and no id-membership gates at all (a count can simply go
 * to zero and leave). This is what keeps ingest-gate models HONEST
 * under curation: after a dedup pass deletes corpus rows, the standing
 * LM still equals the model a full recompute would build — scoring
 * never drifts from the corpus it claims to describe.
 *
 * Refresh cost: O(batch) tokenization + one shuffle of the VOCABULARY
 * table (the state is token-type-sized — Heaps' law puts it orders of
 * magnitude below the corpus, so folding it through one hash aggregate
 * is the honest, simple plan; there is no 10^10-row frame anywhere).
 * A negative folded count (deleting occurrences that were never added
 * — a feed that does not describe this corpus) refuses loudly before
 * the commit. Watermarks, restart recovery, and the concurrency fence
 * are the family's, verbatim.
 */
final class CorpusLmView(spark: SparkSession, sourcePath: String,
                         statePath: String,
                         textCol: String = "text",
                         idCol: String = "doc_id") {

  private def meta(v: Long) = Some(s"""{"sourceVersion":$v}""")
  private val MetaRe = """\{"sourceVersion":(\d+)\}""".r

  private def source = ManagedTable(spark, sourcePath)
  private def state = ManagedTable(spark, statePath)

  /** The last source version folded into the model. */
  def sourceVersion: Long = {
    val c = state.lastCommit.getOrElse(throw new IllegalStateException(
      s"lm view state $statePath does not exist — call initialize() first"))
    c.userMetadata match {
      case Some(MetaRe(v)) => v.toLong
      case other => throw new IllegalStateException(
        s"state commit carries no sourceVersion watermark: $other")
    }
  }

  /** Build the model from the corpus's CURRENT snapshot. */
  def initialize(): Long = {
    val v = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    state.write(graft.llm.TextOps.unigramModel(source.read, textCol, idCol),
      "LM_INIT", "replace", meta(v))
    v
  }

  /** Fold the unprocessed change-feed range. No-op (no commit) when
    * already current or the range nets to nothing. */
  def refresh(): Long = {
    val last = sourceVersion
    val latest = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    require(latest >= last,
      s"source went backwards: watermark $last, latest $latest — was the " +
        "corpus table recreated? Re-initialize the view.")
    if (latest == last) return last
    val cdf = source.readChangeFeed(last + 1, Some(latest))
    val (ins, del) = CdfNetting.net(cdf, idCol, Seq(textCol), "lm view")
    if (ins.isEmpty && del.isEmpty) return last
    val lm = graft.llm.TextOps.unigramModel(_: DataFrame, textCol, idCol)
    val delta = lm(ins).select(col("tok"), col("freq"))
      .unionByName(lm(del).select(col("tok"), (-col("freq")).as("freq")))
    val merged = state.read.select("tok", "freq").unionByName(delta)
      .groupBy("tok").agg(sum("freq").as("freq"))
      .localCheckpoint()
    require(merged.filter(col("freq") < 0L).isEmpty,
      "lm view: the folded model went NEGATIVE for some token — the slice " +
        "subtracts occurrences this corpus never added; re-initialize")
    state.write(merged.filter(col("freq") > 0L), "LM_REFRESH", "replace",
      meta(latest), expectedPrevVersion = state.latestVersion)
    latest
  }

  /** The maintained `(tok, freq)` model — feed straight into
    * [[graft.llm.TextOps.rareTokenScoreWith]] /
    * `tfidfKeywordsWith`-style standing-model scorers. */
  def read: DataFrame = state.read
}

/**
 * The Naive-Bayes quality-filter model
 * ([[graft.llm.QualityClassifier]] — the GPT-3/CCNet-style learned
 * ingest gate) as a standing, CDF-maintained view: the weakly-labeled
 * corpus lives in a [[ManagedTable]] (text + 0/1 label columns), the
 * `(token, n_pos, n_neg)` count model lives in its own ManagedTable,
 * and the doc-count priors ride each state commit's metadata (two
 * longs — no side table). Like [[CorpusLmView]], every statistic is
 * ADDITIVE, so the fold is exact under any mix of appends, deletes,
 * and label-or-text updates: an entering doc adds its per-class token
 * counts, a leaving doc subtracts them, priors move by signed doc
 * counts. After curation deletes corpus rows, [[score]] still decides
 * exactly as a model retrained from scratch would — the learned gate
 * never drifts from the corpus it claims to describe. The state is
 * vocabulary-sized; a count gone negative refuses loudly before the
 * commit.
 */
final class ClassifierModelView(spark: SparkSession, sourcePath: String,
                                statePath: String,
                                textCol: String = "text",
                                idCol: String = "doc_id",
                                labelCol: String = "weak_label") {
  import graft.llm.QualityClassifier

  private def meta(v: Long, dPos: Long, dNeg: Long) =
    Some(s"""{"sourceVersion":$v,"dPos":$dPos,"dNeg":$dNeg}""")
  private val MetaRe =
    """\{"sourceVersion":(\d+),"dPos":(\d+),"dNeg":(\d+)\}""".r

  private def source = ManagedTable(spark, sourcePath)
  private def state = ManagedTable(spark, statePath)

  /** (folded source version, positive-doc prior, negative-doc prior). */
  def watermark: (Long, Long, Long) = {
    val c = state.lastCommit.getOrElse(throw new IllegalStateException(
      s"classifier view state $statePath does not exist — call initialize() first"))
    c.userMetadata match {
      case Some(MetaRe(v, p, n)) => (v.toLong, p.toLong, n.toLong)
      case other => throw new IllegalStateException(
        s"state commit carries no watermark/priors: $other")
    }
  }

  def sourceVersion: Long = watermark._1

  private def priorsOf(docs: DataFrame): (Long, Long) = {
    // coalesce: sum() over an empty side (e.g. a delete-less slice) is NULL
    val r = QualityClassifier.priors(docs, labelCol)
      .select(coalesce(col("d_pos"), lit(0L)),
        coalesce(col("d_neg"), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Train from the corpus's CURRENT snapshot. */
  def initialize(): Long = {
    val v = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    val snapshot = source.read
    val (dp, dn) = priorsOf(snapshot)
    state.write(QualityClassifier.train(snapshot, textCol, labelCol),
      "NB_INIT", "replace", meta(v, dp, dn))
    v
  }

  /** Fold the unprocessed change-feed range. No-op (no commit) when
    * already current or the range nets to nothing. */
  def refresh(): Long = {
    val (last, dp0, dn0) = watermark
    val latest = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    require(latest >= last,
      s"source went backwards: watermark $last, latest $latest — was the " +
        "corpus table recreated? Re-initialize the view.")
    if (latest == last) return last
    val cdf = source.readChangeFeed(last + 1, Some(latest))
    val (ins, del) = CdfNetting.net(cdf, idCol, Seq(textCol, labelCol),
      "classifier view")
    if (ins.isEmpty && del.isEmpty) return last
    val train = QualityClassifier.train(_: DataFrame, textCol, labelCol)
    val delta = train(ins)
      .unionByName(train(del).select(col("token"),
        (-col("n_pos")).as("n_pos"), (-col("n_neg")).as("n_neg")))
    val merged = state.read.select("token", "n_pos", "n_neg")
      .unionByName(delta)
      .groupBy("token")
      .agg(sum("n_pos").as("n_pos"), sum("n_neg").as("n_neg"))
      .localCheckpoint()
    require(merged.filter(col("n_pos") < 0L || col("n_neg") < 0L).isEmpty,
      "classifier view: the folded model went NEGATIVE for some token — " +
        "the slice subtracts counts this corpus never added; re-initialize")
    val (dpi, dni) = priorsOf(ins)
    val (dpd, dnd) = priorsOf(del)
    state.write(
      merged.filter(col("n_pos") > 0L || col("n_neg") > 0L),
      "NB_REFRESH", "replace",
      meta(latest, dp0 + dpi - dpd, dn0 + dni - dnd),
      expectedPrevVersion = state.latestVersion)
    latest
  }

  /** The maintained `(token, n_pos, n_neg)` model. */
  def read: DataFrame = state.read

  /** The maintained doc-count priors as the 1-row frame
    * [[graft.llm.QualityClassifier.scoreWith]] expects. */
  def priorsRow: DataFrame = {
    import spark.implicits._
    val (_, dp, dn) = watermark
    Seq((dp, dn)).toDF("d_pos", "d_neg")
  }

  /** Score a batch against the maintained model — identical decisions
    * to a model retrained on the current corpus snapshot. */
  def score(batch: DataFrame): DataFrame =
    QualityClassifier.scoreWith(batch, state.read, priorsRow, textCol, idCol)
}

/**
 * The IVF-PQ ANN index as a standing, CDF-maintained view — the
 * [[Bm25IndexView]] lifecycle applied to [[Similarity.ivfPqIndex]]:
 * the vector corpus lives in a [[ManagedTable]], the codes table
 * `(vec_id, pq_codes, cell)` lives in its own ManagedTable, and the
 * quantizer (coarse centroids + PQ codebooks) trains ONCE at
 * [[initialize]] and persists beside the state — FAISS's add-vs-train
 * split: appends append-encode against the frozen quantizer
 * ([[Similarity.ivfPqAppend]], O(batch)); deletes drop code rows
 * (trivially signed — codes are per-vector, nothing cross-vector
 * moves); re-training is a POLICY decision (watch
 * [[Similarity.pqReconstructionError]] and re-[[initialize]] on
 * drift), never a side effect of refresh.
 *
 * Refresh shape: a pure-insert slice is an APPEND commit of the
 * batch's encoded rows (the standing codes are not even read); a
 * slice with deletes rewrites once via broadcast anti-join. The same
 * exactly-once watermark, bloom gate, and duplicate-id contracts as
 * the lexical views.
 */
final class AnnIndexView(spark: SparkSession, sourcePath: String,
                         statePath: String,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding",
                         nlist: Int = 16, m: Int = 8, ksub: Int = 16,
                         trainIters: Int = 2,
                         expectedVecs: Long = 10000000L) {

  private def meta(v: Long) = Some(s"""{"sourceVersion":$v}""")
  private val MetaRe = """\{"sourceVersion":(\d+)\}""".r

  private def source = ManagedTable(spark, sourcePath)
  private def state = ManagedTable(spark, statePath)
  private val bloomPath = statePath.stripSuffix("/") + "_bloom"
  private val centsPath = statePath.stripSuffix("/") + "_centroids"
  private val booksPath = statePath.stripSuffix("/") + "_books"

  /** The frozen coarse quantizer (trained at [[initialize]]). */
  def centroids: Array[Array[Double]] =
    Similarity.centroidsFrom(spark.read.parquet(centsPath))

  /** The frozen PQ codebooks (trained at [[initialize]]). */
  def codebooks: Array[Array[Array[Double]]] =
    Similarity.pqBooksFrom(spark.read.parquet(booksPath))

  /** The last source version folded into the codes table. */
  def sourceVersion: Long = {
    val c = state.lastCommit.getOrElse(throw new IllegalStateException(
      s"ann view state $statePath does not exist — call initialize() first"))
    c.userMetadata match {
      case Some(MetaRe(v)) => v.toLong
      case other => throw new IllegalStateException(
        s"state commit carries no sourceVersion watermark: $other")
    }
  }

  /** Train the quantizer on the CURRENT snapshot and encode it — the
    * only O(corpus) training step in the view's lifetime. Quantizer
    * and bloom write before the state commit (same crash-safe order as
    * the lexical views: a crash leaves artifacts the old state simply
    * does not reference yet). */
  def initialize(): Long = {
    val v = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    val snapshot = source.read
    val (cents, books, codes) = Similarity.ivfPqIndex(snapshot, nlist, m,
      ksub, trainIters, idCol, vecCol)
    Similarity.centroidsTable(spark, cents)
      .write.mode("overwrite").parquet(centsPath)
    Similarity.pqBooksTable(spark, books)
      .write.mode("overwrite").parquet(booksPath)
    Retrieval.bm25IndexBloom(snapshot.select(col(idCol).as("doc_id")),
        expectedVecs)
      .write.mode("overwrite").parquet(bloomPath)
    // the codes are BORN clustered by `cell` (the property lands in the
    // same commit and governs this very write): each file covers a
    // disjoint cell range with sorted row groups, so the driver-regime
    // probe's `cell IN (...)` filter prunes at dir-stat and row-group
    // grain — the IVF scan touches only probed cells' bytes. Appends
    // inherit the property, so refresh batches cluster too.
    state.write(codes, "ANN_INIT", "replace", meta(v),
      propertiesOverride =
        Some(Map(ManagedTable.ClusterColumnsProp -> "cell")))
    v
  }

  /** Fold the unprocessed change-feed range against the FROZEN
    * quantizer. No-op (no commit) when already current or the range
    * nets to nothing. */
  def refresh(): Long = {
    val last = sourceVersion
    val latest = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    require(latest >= last,
      s"source went backwards: watermark $last, latest $latest — was the " +
        "corpus table recreated? Re-initialize the view.")
    if (latest == last) return last
    val cdf = source.readChangeFeed(last + 1, Some(latest))
    val (ins, del) = CdfNetting.net(cdf, idCol, Seq(vecCol), "ann index view")
    if (ins.isEmpty && del.isEmpty) return last
    val (bloomBytes, _, _) = Retrieval.bm25BloomFrom(
      spark.read.parquet(bloomPath))
    val insIds = ins.select(col(s"`$idCol`").as("doc_id"))
    val delIds = del.select(col(s"`$idCol`").as("doc_id"))
    CdfNetting.requireNewIds(spark,
      state.read.select(col(s"`$idCol`").as("doc_id")), insIds, delIds,
      Some(bloomBytes), "ann index view")
    val encoded =
      if (ins.isEmpty) None
      else Some(Similarity.ivfPqAppend(centroids, codebooks, ins, idCol, vecCol))
    if (!ins.isEmpty)
      Retrieval.bm25BloomAdd(spark.read.parquet(bloomPath), ins, idCol)
        .write.mode("overwrite").parquet(bloomPath)
    if (del.isEmpty)
      state.write(encoded.get, "ANN_REFRESH", "append", meta(latest))
    else {
      CdfNetting.requireExistingIds(
        state.read.select(col(s"`$idCol`").as("doc_id")), delIds,
        "ann index view")
      val survivors = state.read
        .join(broadcast(delIds.distinct().toDF("__del__")),
          col(s"`$idCol`").cast("string") === col("__del__").cast("string"),
          "anti")
      val merged = encoded match {
        case Some(e) => survivors.unionByName(e)
        case None => survivors
      }
      state.write(merged, "ANN_REFRESH", "replace", meta(latest),
        expectedPrevVersion = state.latestVersion)
    }
    latest
  }

  /** The maintained codes table. */
  def read: DataFrame = state.read

  /** Serve top-k from the standing artifacts: probe-pruned ADC scan
    * over the maintained codes, exact re-rank against the CURRENT
    * corpus snapshot ([[Similarity.ivfPqTopKWith]] — both query-batch
    * regimes apply). */
  def search(queries: DataFrame, k: Int, nProbe: Int = 4,
             rerank: Int = 64): DataFrame =
    Similarity.ivfPqTopKWith(centroids, codebooks, state.read, source.read,
      queries, k, nProbe, rerank, idCol, vecCol)
}
