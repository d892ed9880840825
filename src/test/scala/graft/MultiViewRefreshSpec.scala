package graft

import graft.llm.Retrieval
import graft.table._
import org.apache.spark.sql.functions._

/** One-pass multi-view maintenance ([[StandingViews]]): N standing
  * views over one corpus fold from ONE change-feed read per watermark
  * (netted once per payload signature), commit-for-commit equal to
  * individually-refreshed twins — the flagship pipeline's daily tick
  * without N scans of a TB-scale slice. */
class MultiViewRefreshSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("spark", "merge", "table", "stream", "window",
    "bay", "york", "hash", "row", "group")

  /** Docs with BOTH payload kinds: text (bm25/phrase/neardup netting)
    * and an embedding (ann netting). */
  private def docs(ids: Range, shift: Double = 0.0) = ids.map { i =>
    val text = Seq(words(i % 10), words((i / 2) % 10), words((i * 3) % 10))
      .mkString(" ")
    val emb = Array.tabulate(8)(d => math.sin(i * 7 + d * 3) + shift).toSeq
    (i.toLong, text, emb)
  }.toDF("doc_id", "text", "embedding")

  test("refreshAll: N views fold from ONE change-feed read, each equal " +
      "to its individually-refreshed twin") {
    val src = tmpDir("mv_src")
    val t = ManagedTable(spark, src)
    t.write(docs(0 until 64), "APPEND", "append")
    def mkSet(tag: String) = Seq[CdfMaintainedView](
      new Bm25IndexView(spark, src, tmpDir(s"mv_${tag}_bm25"),
        expectedDocs = 1000),
      new PositionalIndexView(spark, src, tmpDir(s"mv_${tag}_ph"),
        expectedDocs = 1000),
      new NearDupIndexView(spark, src, tmpDir(s"mv_${tag}_nd"),
        expectedDocs = 1000),
      // the additive corpus-LM shares the text views' netting SIGNATURE
      new CorpusLmView(spark, src, tmpDir(s"mv_${tag}_lm")),
      new AnnIndexView(spark, src, tmpDir(s"mv_${tag}_ann"),
        idCol = "doc_id", vecCol = "embedding", nlist = 4, m = 4, ksub = 8,
        expectedVecs = 1000))
    val multi = mkSet("a")
    val twins = mkSet("b")
    def twinRefresh(v: CdfMaintainedView): Unit = v match {
      case r: RowLocalIndexView => r.refresh(); ()
      case l: CorpusLmView => l.refresh(); ()
      case other => fail(s"unexpected view kind $other")
    }
    def readOf(v: CdfMaintainedView) = v match {
      case r: RowLocalIndexView => r.read
      case l: CorpusLmView => l.read
      case other => fail(s"unexpected view kind $other")
    }
    (multi ++ twins).foreach(_.initialize())
    // one day's churn: an append, a curation delete, a text-only update
    // (the embedding netting must see it cancel to nothing)
    t.write(docs(64 until 72), "APPEND", "append")
    t.delete(col("doc_id") === 3L)
    t.update(Map("text" -> lit("fresh york window")), col("doc_id") === 5L)
    twins.foreach(twinRefresh)
    ManagedTable.changeFeedReads.set(0L)
    assert(StandingViews.refreshAll(spark, multi) === t.latestVersion.get)
    assert(ManagedTable.changeFeedReads.get === 1L,
      "however many views, the unprocessed slice is read ONCE")
    multi.zip(twins).foreach { case (a, b) =>
      assert(a.sourceVersion === b.sourceVersion)
      assert(readOf(a).exceptAll(readOf(b)).isEmpty &&
        readOf(b).exceptAll(readOf(a)).isEmpty,
        "one-pass fold drifted from the individually-refreshed twin")
    }
    // already-current pass: zero reads, zero commits
    val heads = multi.map(v => v.sourceVersion)
    ManagedTable.changeFeedReads.set(0L)
    StandingViews.refreshAll(spark, multi)
    assert(ManagedTable.changeFeedReads.get === 0L)
    assert(multi.map(_.sourceVersion) === heads)
    // spanning two sources refuses loudly
    val foreign = new Bm25IndexView(spark, tmpDir("mv_other_src"),
      tmpDir("mv_other_st"))
    val e = intercept[IllegalArgumentException](
      StandingViews.refreshAll(spark, multi :+ foreign))
    assert(e.getMessage.contains("ONE source"))
  }

  test("refreshAll groups by watermark: a lagging view heals with its " +
      "own slice read") {
    val src = tmpDir("mvw_src")
    val t = ManagedTable(spark, src)
    t.write(docs(0 until 16), "APPEND", "append")
    val bm25 = new Bm25IndexView(spark, src, tmpDir("mvw_bm25"),
      expectedDocs = 1000)
    val phrase = new PositionalIndexView(spark, src, tmpDir("mvw_ph"),
      expectedDocs = 1000)
    bm25.initialize(); phrase.initialize()
    t.write(docs(16 until 20), "APPEND", "append")
    bm25.refresh() // bm25 leads; phrase lags
    t.write(docs(20 until 24), "APPEND", "append")
    ManagedTable.changeFeedReads.set(0L)
    StandingViews.refreshAll(spark, Seq(bm25, phrase))
    assert(ManagedTable.changeFeedReads.get === 2L,
      "two watermark groups → two slice reads, never one per view")
    assert(bm25.sourceVersion === t.latestVersion.get &&
      phrase.sourceVersion === t.latestVersion.get)
    val rebuilt = Retrieval.bm25Postings(t.read, "text", "doc_id")
    assert(bm25.read.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(bm25.read).isEmpty)
    val rebuiltP = Retrieval.positionalIndex(t.read, "text", "doc_id")
    assert(phrase.read.exceptAll(rebuiltP).isEmpty &&
      rebuiltP.exceptAll(phrase.read).isEmpty)
  }

  test("refreshStreamAll: ONE CDF stream drives every view's fold per " +
      "micro-batch; a resumed checkpoint folds only the new slice") {
    val src = tmpDir("mvs_src")
    val ck = tmpDir("mvs_ck")
    val t = ManagedTable(spark, src)
    t.write(docs(0 until 16), "APPEND", "append")
    val bm25 = new Bm25IndexView(spark, src, tmpDir("mvs_bm25"),
      expectedDocs = 1000)
    val phrase = new PositionalIndexView(spark, src, tmpDir("mvs_ph"),
      expectedDocs = 1000)
    bm25.initialize(); phrase.initialize()
    t.write(docs(16 until 24), "APPEND", "append")
    t.delete(col("doc_id") === 2L)
    val q = StandingViews.refreshStreamAll(spark, Seq(bm25, phrase), ck)
    assert(q.awaitTermination(120000), "multi-view stream did not drain")
    def checkBoth(): Unit = {
      val rebuilt = Retrieval.bm25Postings(t.read, "text", "doc_id")
      assert(bm25.read.exceptAll(rebuilt).isEmpty &&
        rebuilt.exceptAll(bm25.read).isEmpty)
      val rebuiltP = Retrieval.positionalIndex(t.read, "text", "doc_id")
      assert(phrase.read.exceptAll(rebuiltP).isEmpty &&
        rebuiltP.exceptAll(phrase.read).isEmpty)
    }
    checkBoth()
    // resume the SAME checkpoint after one more slice — exactly that
    // slice folds into BOTH views
    t.write(docs(24 until 28), "APPEND", "append")
    val q2 = StandingViews.refreshStreamAll(spark, Seq(bm25, phrase), ck)
    assert(q2.awaitTermination(120000))
    checkBoth()
    assert(bm25.sourceVersion === t.latestVersion.get &&
      phrase.sourceVersion === t.latestVersion.get)
    // an up-to-date pass on a fresh checkpoint commits nothing
    val heads = Seq(bm25, phrase).map(_.sourceVersion)
    val q3 = StandingViews.refreshStreamAll(spark, Seq(bm25, phrase),
      tmpDir("mvs_ck2"))
    assert(q3.awaitTermination(120000))
    assert(Seq(bm25, phrase).map(_.sourceVersion) === heads)
  }
}
