package graft.table

import graft.llm.Retrieval
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The BM25 inverted index as a STANDING, CDF-maintained artifact — the
 * [[IncrementalAggView]] pattern applied to [[graft.llm.Retrieval]]'s
 * retrieval index: the corpus lives in a [[ManagedTable]], the postings
 * live in their own ManagedTable (time travel, history and concurrency
 * checks for free), and each refresh reads ONLY the unprocessed
 * change-feed range of the corpus and folds it with
 * [[Retrieval.bm25IndexMerge]] — O(batch) per day, the corpus text is
 * never re-tokenized. Before this class, `bm25IndexMerge` folded a
 * batch the caller handed it; the view closes the loop: WHICH rows are
 * new comes from the corpus table's own commit log.
 *
 * Exactly-once, restart-safe: the last folded corpus version rides each
 * state commit's `userMetadata`, so a re-run reads the watermark from
 * the state's commit log and processes `(watermark, latest]` or
 * nothing; the replace commit carries `expectedPrevVersion`, so two
 * racing refreshes cannot both land.
 *
 * The append-only doc-id gate stays O(batch): a [[Retrieval
 * .bm25IndexBloom]] persists NEXT TO the state and each refresh tests
 * the slice against it, folding the slice's ids back in with
 * [[Retrieval.bm25BloomAdd]]. The bloom write deliberately precedes the
 * state commit — a crash between the two leaves the bloom with ids the
 * index lacks, which only produces false POSITIVES (an exact re-check
 * that passes), never a silently-skipped collision.
 *
 * ANY slice folds — appends, deletes, and updates: the change rows net
 * per `(doc_id, text)` under a ±1 sign (so a dir-rewrite commit's
 * coarse feed — all old dir rows − / survivors + — cancels to the
 * minimal delta, the [[IncrementalJoinAggView]] additivity argument),
 * pure-insert slices take [[Retrieval.bm25IndexMerge]]'s proven
 * append path, and mixed slices take
 * [[Retrieval.bm25IndexApplyDelta]]'s signed posting maintenance
 * (df decrements per deleted doc token, doc-count/length scalars move
 * by signed sums, updates are a (−pre, +post) pair tokenized from the
 * feed itself). The corpus text is never re-read in either path — this
 * is what lets the index survive the pipeline's own curation actions
 * (span dedup, fuzzy dedup, decontamination, SQL DELETE/UPDATE), which
 * all write non-insert slices.
 *
 * The bloom only ever GROWS (deleted ids stay in it): a re-inserted
 * previously-deleted id tests bloom-positive and falls through to the
 * exact check against the surviving index, which passes — the bloom
 * over-approximates by design, never under-covers.
 */
final class Bm25IndexView(spark: SparkSession, sourcePath: String,
                          statePath: String,
                          textCol: String = "text",
                          idCol: String = "doc_id",
                          expectedDocs: Long = 10000000L) {

  private def meta(v: Long) = Some(s"""{"sourceVersion":$v}""")
  private val MetaRe = """\{"sourceVersion":(\d+)\}""".r

  private def source = ManagedTable(spark, sourcePath)
  private def state = ManagedTable(spark, statePath)
  private val bloomPath = statePath.stripSuffix("/") + "_bloom"

  /** The last source version folded into the index (from the state
    * table's own commit metadata; maintenance commits on the state —
    * OPTIMIZE/ANALYZE/CLUSTER record no watermark — are transparent). */
  def sourceVersion: Long =
    CdfNetting.commitMetas(state, "bm25 view", statePath)
      .collectFirst { case MetaRe(v) => v.toLong }
      .getOrElse(throw new IllegalStateException(
        "no commit in the bm25 view state's history carries a sourceVersion " +
          "watermark — was the state table created outside the view?"))

  /** Build the index from the corpus's CURRENT snapshot — the only
    * O(corpus) step in the view's lifetime (one tokenize + the bloom's
    * one distinct). The bloom writes BEFORE the state commit — the same
    * crash-safe order as [[refresh]]: a crash between the two leaves a
    * bloom that covers MORE ids than the (old or absent) state, which
    * only produces false positives routed to the exact re-check, never
    * a silently-skipped collision (the reverse order would leave a
    * stale bloom UNDER-covering the new index). */
  def initialize(): Long = {
    val v = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    val snapshot = source.read
    Retrieval.bm25IndexBloom(snapshot.select(col(idCol).as("doc_id")),
        expectedDocs)
      .write.mode("overwrite").parquet(bloomPath)
    state.write(Retrieval.bm25Index(snapshot, textCol, idCol),
      "BM25_INIT", "replace", meta(v))
    v
  }

  /** Fold the unprocessed change-feed range into the index. No-op (no
    * new commit) when already current or when the range carries no
    * rows. Returns the new watermark. */
  def refresh(): Long = {
    val last = sourceVersion
    val latest = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    require(latest >= last,
      s"source went backwards: watermark $last, latest $latest — was the " +
        "corpus table recreated? Re-initialize the view.")
    if (latest == last) return last
    val cdf = source.readChangeFeed(last + 1, Some(latest))
    // net the slice per (doc_id, text) under ±1: insert/update_postimage
    // enter, delete/update_preimage leave; a row inserted AND deleted (or
    // a coarse dir-rewrite feed's untouched survivors) cancels to nothing
    val (ins, del) = CdfNetting.net(cdf, idCol, Seq(textCol), "bm25 view")
    if (ins.isEmpty && del.isEmpty) return last // range nets to nothing
    val bloomRow = spark.read.parquet(bloomPath)
    val (bloomBytes, _, _) = Retrieval.bm25BloomFrom(bloomRow)
    val merged =
      if (del.isEmpty) // pure-append slice: the proven merge path
        Retrieval.bm25IndexMerge(state.read, ins, textCol, idCol,
          docIdBloom = Some(bloomBytes))
      else
        Retrieval.bm25IndexApplyDelta(state.read, ins, del, textCol, idCol,
          docIdBloom = Some(bloomBytes))
    // bloom BEFORE state: a crash between the two can only over-approximate
    // (bm25BloomAdd returns a driver-built row — no read dependence on
    // bloomPath remains when the overwrite lands). Deleted ids stay in the
    // bloom deliberately — over-approximation routes a re-insert of such
    // an id to the exact check, which passes against the surviving index.
    // A delete-only slice leaves the bloom as-is (nothing new to cover,
    // and Spark's bloom builder cannot fold an empty frame).
    if (!ins.isEmpty)
      Retrieval.bm25BloomAdd(bloomRow, ins, idCol)
        .write.mode("overwrite").parquet(bloomPath)
    state.write(merged, "BM25_REFRESH", "replace", meta(latest),
      expectedPrevVersion = state.latestVersion)
    latest
  }

  /** The maintained postings table — feed straight into
    * [[Retrieval.bm25SearchWith]] / [[Retrieval.hybridTopKWith]]. */
  def read: DataFrame = state.read
}
