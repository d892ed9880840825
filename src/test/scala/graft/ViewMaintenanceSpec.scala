package graft

import graft.llm.Retrieval
import graft.table.{Bm25IndexView, ClassifierModelView, CorpusLmView,
  ManagedTable, PositionalIndexView}
import org.apache.spark.sql.functions._

/** Layout maintenance for the CDF-maintained view family, and streaming
  * refresh for the additive model views.
  *
  * The O(batch) refresh design has a deliberate cost: every append
  * slice lands one dir spanning the index's WHOLE key range (a daily
  * batch touches the full vocabulary), so per-dir stats overlap
  * completely and skipping reads degrade to full-dir listings as
  * appends accumulate. `recluster` (heavy, periodic) re-establishes
  * disjoint per-dir ranges with a persisted grid; `maintain` (cheap,
  * routine) folds the append tail onto that grid and materializes
  * accumulated deletion vectors. Both must be INVISIBLE to everything
  * else: same watermark, same scalars, same search rows, and the next
  * refresh still lands O(batch) commits. */
class ViewMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  /** 26 distinct leading tokens spread across the alphabet so a string
    * bucket grid on `tok` has real quantiles to cut at. */
  private val names = Seq("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
    "november", "oscar", "papa", "quebec", "romeo", "sierra", "tango",
    "uniform", "victor", "whiskey", "xray", "yankee", "zulu")

  private def corpus(ids: Range) = ids.map { i =>
    val a = names(i % names.length)
    val b = names((i * 7 + 3) % names.length)
    (i.toLong, s"$a $b $a shared")
  }.toDF("doc_id", "text")

  private val queries = Seq(
    (1L, "alpha shared"), (2L, "zulu quebec"), (3L, "mike november lima"))
    .toDF("query_id", "query_text")

  test("recluster + maintain are invisible to the BM25 view: watermark, " +
      "scalars, and search rows unchanged; tail folds onto the grid; " +
      "skipping reads prune dirs") {
    val src = tmpDir("vm_src")
    val st = tmpDir("vm_state")
    val t = ManagedTable(spark, src)
    t.write(corpus(0 until 60), "APPEND", "append")
    new Bm25IndexView(spark, src, st, expectedDocs = 1000).initialize()
    val view = new Bm25IndexView(spark, src, st)
    t.write(corpus(60 until 90), "APPEND", "append")
    assert(view.refresh() === 1L)
    t.delete(col("doc_id") % 10 === 4) // DV slice through the view
    assert(view.refresh() === 2L)
    val stateT = ManagedTable(spark, st)
    assert(stateT.lastCommit.get.dvDirs.nonEmpty,
      "the delete slice must have landed deletion vectors")

    val before = view.search(queries, k = 5, exact = true).collect().toSeq
    val w0 = view.sourceVersion
    val s0 = view.scalars

    // HEAVY pass: full rewrite into bucket dirs + persisted grid
    view.recluster("tok", 4)
    val afterCluster = ManagedTable(spark, st).lastCommit.get
    assert(afterCluster.dirs.forall(_.contains(s"/${ManagedTable.CLUSTER_COL}=")),
      "recluster must leave only bucket dirs")
    assert(afterCluster.dvDirs.isEmpty,
      "the full rewrite materializes tombstones — no DVs survive")
    assert(afterCluster.userMetadata.isEmpty,
      "maintenance commits carry no watermark")
    assert(view.sourceVersion === w0 && view.scalars === s0,
      "recluster must be transparent to the watermark walk")
    assertSameRows(view.search(queries, k = 5, exact = true).toDF(),
      before.toDF(spark, view.search(queries, k = 5, exact = true).schema))

    // a skipping read on a lexically extreme token prunes whole buckets
    val fullFiles = view.read.inputFiles.length
    val prunedFiles = view.readWhere(col("tok") === "zulu").inputFiles.length
    assert(prunedFiles < fullFiles,
      s"bucketed state must dir-prune: $prunedFiles vs $fullFiles")
    assertSameRows(view.readWhere(col("tok") === "zulu"),
      view.read.filter(col("tok") === "zulu"))

    // O(batch) appends keep landing as unbucketed tail dirs...
    t.write(corpus(90 until 110), "APPEND", "append")
    assert(view.refresh() === 3L)
    val withTail = ManagedTable(spark, st).lastCommit.get
    assert(withTail.operation == "BM25_REFRESH" &&
      withTail.dirs.exists(!_.contains(s"/${ManagedTable.CLUSTER_COL}=")),
      "refresh after recluster must still APPEND an O(batch) tail dir")

    // ...and the CHEAP pass folds exactly the tail onto the SAME grid
    view.maintain()
    val afterMaintain = ManagedTable(spark, st).lastCommit.get
    assert(afterMaintain.dirs.forall(_.contains(s"/${ManagedTable.CLUSTER_COL}=")),
      "maintain must fold the tail onto the persisted grid")
    assert(view.sourceVersion === 3L,
      "maintain must be transparent to the watermark walk")
    assertSameRows(
      view.read,
      Retrieval.bm25Postings(t.read, "text", "doc_id"))

    // lifecycle continues: another slice folds, search equals rebuilt
    t.write(corpus(110 until 120), "APPEND", "append")
    assert(view.refresh() === 4L)
    assertSameRows(
      view.search(queries, k = 5, exact = true),
      Retrieval.bm25TopK(t.read, queries, k = 5, exact = true))
  }

  private implicit class RowsToDf(rows: Seq[org.apache.spark.sql.Row]) {
    def toDF(s: org.apache.spark.sql.SparkSession,
             schema: org.apache.spark.sql.types.StructType)
        : org.apache.spark.sql.DataFrame =
      s.createDataFrame(s.sparkContext.parallelize(rows.toList), schema)
  }

  test("the pruned driver-regime search equals the full-scan search in " +
      "both regimes") {
    val src = tmpDir("vm_psrc")
    val st = tmpDir("vm_pstate")
    val t = ManagedTable(spark, src)
    t.write(corpus(0 until 80), "APPEND", "append")
    new Bm25IndexView(spark, src, st, expectedDocs = 1000).initialize()
    val view = new Bm25IndexView(spark, src, st)
    view.recluster("tok", 4)
    val pruned = view.search(queries, k = 6, exact = true)
    // maxPrunedToks = 0 forces the gate shut: the full postings frame
    // flows and only the scoring path's semi-join prunes
    val full = view.search(queries, k = 6, exact = true, maxPrunedToks = 0)
    assertSameRows(pruned, full)
    assertSameRows(pruned,
      Retrieval.bm25TopK(t.read, queries, k = 6, exact = true))
  }

  test("maintain without a grid bin-packs a fragmented positional index " +
      "and preserves its rows") {
    val src = tmpDir("vm_phsrc")
    val st = tmpDir("vm_phstate")
    val t = ManagedTable(spark, src)
    t.write(corpus(0 until 20), "APPEND", "append")
    new PositionalIndexView(spark, src, st, expectedDocs = 1000).initialize()
    val view = new PositionalIndexView(spark, src, st)
    (1 to 4).foreach { e =>
      t.write(corpus(20 * e until 20 * (e + 1)), "APPEND", "append")
      assert(view.refresh() === e.toLong)
    }
    val fragmented = ManagedTable(spark, st).lastCommit.get.dirs.size
    assert(fragmented >= 5, "each refresh must have appended its own dir")
    val rows = view.read.collect().toSeq
    view.maintain() // no grid: compactDirs folds the small dirs
    val folded = ManagedTable(spark, st).lastCommit.get
    assert(folded.dirs.size < fragmented,
      s"maintain must shrink the dir count, got ${folded.dirs.size}")
    assert(folded.userMetadata.isEmpty, "maintenance carries no watermark")
    assert(view.sourceVersion === 4L)
    assertSameRows(view.read, rows.toDF(spark, view.read.schema))
    // the lifecycle continues over the compacted layout
    t.write(corpus(100 until 110), "APPEND", "append")
    assert(view.refresh() === 5L)
  }

  test("phrase search through the positional view prunes dirs after " +
      "recluster and matches the full-scan ranking") {
    val src = tmpDir("vm_phssrc")
    val st = tmpDir("vm_phsstate")
    val t = ManagedTable(spark, src)
    t.write(corpus(0 until 80), "APPEND", "append")
    new PositionalIndexView(spark, src, st, expectedDocs = 1000).initialize()
    val view = new PositionalIndexView(spark, src, st)
    view.recluster("tok", 4)
    val phrases = Seq((1L, "alpha bravo"), (2L, "zulu yankee"))
      .toDF("query_id", "query_text")
    val pruned = view.search(phrases, k = 5)
    val full = view.search(phrases, k = 5, maxPrunedToks = 0)
    assertSameRows(pruned, full)
    assertSameRows(pruned,
      Retrieval.phraseSearch(t.read, phrases, k = 5))
    val prunedFiles = view.readWhere(col("tok") === "zulu").inputFiles.length
    assert(prunedFiles < view.read.inputFiles.length,
      "bucketed occurrences must dir-prune the phrase token read")
  }

  test("ANN search through the view prunes code dirs to the probed-cell " +
      "union after recluster and matches the unpruned ranking") {
    import graft.table.AnnIndexView
    val src = tmpDir("vm_annsrc")
    val st = tmpDir("vm_annstate")
    // deterministic embeddings: 4 well-separated direction clusters
    val vecs = (0 until 120).map { i =>
      val base = Array.fill(8)(0.05 * ((i * 13) % 7))
      base(i % 4) = 10.0 + (i % 11) * 0.1
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val t = ManagedTable(spark, src)
    t.write(vecs, "APPEND", "append")
    new AnnIndexView(spark, src, st, nlist = 4, m = 4, ksub = 8,
      expectedVecs = 1000).initialize()
    val view = new AnnIndexView(spark, src, st, nlist = 4, m = 4, ksub = 8)
    view.recluster("cell", 4)
    val queries = vecs.filter(col("vec_id").isin(3L, 17L, 42L))
      .select(col("vec_id"), col("embedding"))
    val pruned = view.search(queries, k = 5, nProbe = 1)
    // unpruned reference: the same plan over the full codes frame
    val full = graft.llm.Similarity.ivfPqTopKWith(view.centroids,
      view.codebooks, view.read, t.read, queries, k = 5, nProbe = 1)
    assertSameRows(pruned, full)
    val cells = graft.llm.Similarity.probeCellUnion(view.centroids,
      queries, nProbe = 1).get
    assert(cells.nonEmpty && cells.size < 4,
      s"3 clustered queries at nProbe=1 must probe a strict cell subset, " +
        s"got $cells")
    val prunedFiles =
      view.readWhere(col("cell").isin(cells: _*)).inputFiles.length
    assert(prunedFiles < view.read.inputFiles.length,
      "cell-bucketed codes must dir-prune the probed-cell read")
  }

  test("AS-OF serving: searchAt(v) reproduces the ranking a past run " +
      "served, equals the one-shot ranking over the matching source " +
      "snapshot, and survives later maintenance") {
    val src = tmpDir("vm_asof_src")
    val st = tmpDir("vm_asof_state")
    val t = ManagedTable(spark, src)
    t.write(corpus(0 until 50), "APPEND", "append")
    new Bm25IndexView(spark, src, st, expectedDocs = 1000).initialize()
    val view = new Bm25IndexView(spark, src, st)
    val vInit = ManagedTable(spark, st).latestVersion.get
    val atInit = view.search(queries, k = 5, exact = true).collect().toSeq
    t.write(corpus(50 until 90), "APPEND", "append")
    assert(view.refresh() === 1L)
    t.delete(col("doc_id") % 9 === 2)
    assert(view.refresh() === 2L)
    view.recluster("tok", 4)
    view.maintain()
    // the pinned walk names the matching SOURCE version...
    assert(view.sourceVersionAt(vInit) === 0L)
    assert(view.scalarsAt(vInit) !== view.scalars)
    // ...and the as-of ranking is bit-identical to what that state
    // served then, AND to a fresh one-shot over the source as-of
    val asOf = view.searchAt(vInit, queries, k = 5, exact = true)
    assertSameRows(asOf, atInit.toDF(spark, asOf.schema))
    assertSameRows(asOf,
      Retrieval.bm25TopK(t.readAt(0L), queries, k = 5, exact = true))
    // the head keeps serving the current world
    assertSameRows(view.search(queries, k = 5, exact = true),
      Retrieval.bm25TopK(t.read, queries, k = 5, exact = true))
  }

  test("a resumed view stream survives interleaved maintenance: the " +
      "txn high-water rides maintenance commits, nothing double-folds") {
    val src = tmpDir("vm_smx_src")
    val st = tmpDir("vm_smx_state")
    val ck = tmpDir("vm_smx_ck")
    val t = ManagedTable(spark, src)
    t.write(corpus(0 until 30), "APPEND", "append")
    new Bm25IndexView(spark, src, st, expectedDocs = 1000).initialize()
    val view = new Bm25IndexView(spark, src, st)
    t.write(corpus(30 until 50), "APPEND", "append")
    assert(view.refreshStream(ck).awaitTermination(120000))
    assert(view.sourceVersion === 1L)
    // maintenance between stream epochs: recluster + maintain land
    // watermark-less commits that MUST carry the (checkpoint, epoch)
    // high-water forward — losing it would make the resumed stream
    // replay epoch 0 as new and double-fold the first slice
    view.recluster("tok", 4)
    t.delete(col("doc_id") % 10 === 3)
    assert(view.refresh() === 2L)
    view.maintain()
    t.write(corpus(50 until 60), "APPEND", "append")
    assert(view.refreshStream(ck).awaitTermination(120000))
    assert(view.sourceVersion === 3L)
    assertSameRows(view.read,
      Retrieval.bm25Postings(t.read, "text", "doc_id"))
  }

  test("recluster rebuilds the doc-id bloom from the current ids: " +
      "deleted ids drop out, the lifecycle continues") {
    val src = tmpDir("vm_blsrc")
    val st = tmpDir("vm_blstate")
    val t = ManagedTable(spark, src)
    t.write(corpus(0 until 60), "APPEND", "append")
    new Bm25IndexView(spark, src, st, expectedDocs = 1000).initialize()
    val view = new Bm25IndexView(spark, src, st)
    t.delete(col("doc_id") >= 40)
    assert(view.refresh() === 1L)
    def bloomHits(ids: Seq[Long]): Int = {
      val (bytes, _, _) = Retrieval.bm25BloomFrom(
        ManagedTable(spark, st.stripSuffix("/") + "_bloom").read)
      graft.expressions.MightContain.register(spark)
      ids.map(i => Seq(i).toDF("id")
        .filter(call_function(graft.expressions.MightContain.Name,
          lit(bytes), xxhash64(col("id").cast("string"))))
        .count()).sum.toInt
    }
    val deleted = (40L until 60L).toSeq
    assert(bloomHits(deleted) === 20,
      "before the rebuild every deleted id must still be bloom-positive")
    view.recluster("tok", 4)
    assert(bloomHits(deleted) < 20,
      "the heavy pass must re-derive the bloom from the CURRENT ids — " +
        "deleted ids stay positive only at the fpp rate")
    assert(bloomHits((0L until 40L).toSeq) === 40,
      "every live id must remain covered after the rebuild")
    // a previously-deleted id re-inserts cleanly against the fresh bloom
    t.write(corpus(40 until 45), "APPEND", "append")
    assert(view.refresh() === 2L)
    assertSameRows(view.read,
      Retrieval.bm25Postings(t.read, "text", "doc_id"))
  }

  test("semantic dedupBatch prunes the index read to the batch's " +
      "assigned-cell union and matches the unpruned decision") {
    import graft.table.SemanticIndexView
    val src = tmpDir("vm_semsrc")
    val st = tmpDir("vm_semstate")
    val vecs = (0 until 100).map { i =>
      val base = Array.fill(8)(0.01 * ((i * 7) % 5))
      base(i % 4) = 5.0 + (i % 9) * 0.1
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val t = ManagedTable(spark, src)
    t.write(vecs, "APPEND", "append")
    new SemanticIndexView(spark, src, st, nlist = 4, expectedVecs = 1000)
      .initialize()
    val view = new SemanticIndexView(spark, src, st, nlist = 4)
    view.recluster("cell", 4)
    // batch: one exact corpus copy (re-submitted id), one fresh vector
    val batch = vecs.filter(col("vec_id") === 7L)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
      .unionByName(Seq((6000L, Array.fill(8)(0.0).updated(0, -9.0)))
        .toDF("vec_id", "embedding"))
    val pruned = view.dedupBatch(batch, threshold = 0.95)
    val full = graft.llm.Similarity.semanticDedupBatch(view.centroids,
      batch, view.read, 0.95)
    assertSameRows(pruned, full)
    assert(pruned.filter(col("vec_id") === 5007L).isEmpty,
      "the corpus copy must be rejected against the maintained index")
    assert(!pruned.filter(col("vec_id") === 6000L).isEmpty,
      "the fresh vector must survive")
    val cells = graft.llm.Similarity.assignedCellUnion(view.centroids, batch)
    assert(view.readWhere(col("cell").isin(cells: _*)).inputFiles.length <
      view.read.inputFiles.length,
      "the cell-bucketed index must dir-prune the batch's cell read")
  }

  test("the view-search TVFs serve the standing indexes from SQL and " +
      "match the Scala serving paths") {
    val src = tmpDir("vm_tvfsrc")
    val st = tmpDir("vm_tvfstate")
    val t = ManagedTable(spark, src)
    t.write(corpus(0 until 60), "APPEND", "append")
    new Bm25IndexView(spark, src, st, expectedDocs = 1000).initialize()
    val view = new Bm25IndexView(spark, src, st)
    view.recluster("tok", 4)
    queries.createOrReplaceTempView("vm_tvf_q")
    assertSameRows(
      spark.sql(s"SELECT * FROM graft_bm25_view_search('$src', '$st', " +
        "'vm_tvf_q', 6, 'true')"),
      view.search(queries, k = 6, exact = true))
    val phSt = tmpDir("vm_tvfph")
    new PositionalIndexView(spark, src, phSt, expectedDocs = 1000).initialize()
    val phView = new PositionalIndexView(spark, src, phSt)
    assertSameRows(
      spark.sql(s"SELECT * FROM graft_phrase_view_search('$src', '$phSt', " +
        "'vm_tvf_q', 6)"),
      phView.search(queries, k = 6))
    // AS-OF from SQL: pin the init state, append + refresh, and the
    // pinned TVF must keep serving the historical ranking
    val vInit = ManagedTable(spark, st).latestVersion.get
    t.write(corpus(60 until 80), "APPEND", "append")
    assert(view.refresh() === 1L)
    assertSameRows(
      spark.sql(s"SELECT * FROM graft_bm25_view_search_at('$src', '$st', " +
        s"$vInit, 'vm_tvf_q', 6, 'true')"),
      view.searchAt(vInit, queries, k = 6, exact = true))
    assert(spark.sql(s"SELECT * FROM graft_bm25_view_search_at('$src', " +
        s"'$st', $vInit, 'vm_tvf_q', 6, 'true')")
      .exceptAll(view.search(queries, k = 6, exact = true)).count() > 0,
      "the pinned ranking must differ from the refreshed head here")
  }

  test("the view-dedup TVFs gate batches from SQL and match the Scala " +
      "dedupBatch / decontaminate paths") {
    import graft.table.{BenchmarkIndexView, NearDupIndexView, SemanticIndexView}
    val src = tmpDir("vm_ddsrc")
    val t = ManagedTable(spark, src)
    t.write(corpus(0 until 40), "APPEND", "append")
    // near-dup: an exact copy of a live doc must reject, a nonce doc
    // survives — TVF rows ≡ the Scala gate
    val ndSt = tmpDir("vm_ddnd")
    new NearDupIndexView(spark, src, ndSt, expectedDocs = 1000).initialize()
    val ndView = new NearDupIndexView(spark, src, ndSt)
    val batch = corpus(3 until 4)
      .select((col("doc_id") + 5000L).as("doc_id"), col("text"))
      .unionByName(Seq((6000L, (1 to 12).map(k => s"zzfreshtok$k")
        .mkString(" "))).toDF("doc_id", "text"))
      .localCheckpoint()
    batch.createOrReplaceTempView("vm_dd_b")
    assertSameRows(
      spark.sql(s"SELECT * FROM graft_neardup_view_dedup('$src', '$ndSt', " +
        "'vm_dd_b', 0.8)"),
      ndView.dedupBatch(batch, 0.8))
    assert(spark.sql(s"SELECT * FROM graft_neardup_view_dedup('$src', " +
      s"'$ndSt', 'vm_dd_b', 0.8)").filter(col("doc_id") === 5003L).isEmpty)
    // benchmark decontamination: a doc sharing an eval's shingles drops
    val bxSt = tmpDir("vm_ddbx")
    new BenchmarkIndexView(spark, src, bxSt, expectedDocs = 1000).initialize()
    val bxView = new BenchmarkIndexView(spark, src, bxSt)
    assertSameRows(
      spark.sql(s"SELECT * FROM graft_benchmark_view_decontaminate(" +
        s"'$src', '$bxSt', 'vm_dd_b', 2)"),
      bxView.decontaminate(batch, minShared = 2))
    // semantic: the embedding-space gate from SQL
    val vsrc = tmpDir("vm_ddvsrc"); val smSt = tmpDir("vm_ddsm")
    val vt = ManagedTable(spark, vsrc)
    val vecs = (0 until 32).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 7 + d * 3)).toSeq))
      .toDF("vec_id", "embedding")
    vt.write(vecs, "APPEND", "append")
    new SemanticIndexView(spark, vsrc, smSt, nlist = 4).initialize()
    val smView = new SemanticIndexView(spark, vsrc, smSt, nlist = 4)
    val vbatch = vecs.filter(col("vec_id") === 7L)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
      .localCheckpoint()
    vbatch.createOrReplaceTempView("vm_dd_vb")
    assertSameRows(
      spark.sql(s"SELECT * FROM graft_semantic_view_dedup('$vsrc', " +
        s"'$smSt', 'vm_dd_vb', 0.95)"),
      smView.dedupBatch(vbatch, 0.95))
    assert(spark.sql(s"SELECT * FROM graft_semantic_view_dedup('$vsrc', " +
      s"'$smSt', 'vm_dd_vb', 0.95)").isEmpty,
      "the corpus copy must be rejected against the maintained index")
  }

  test("the corpus LM view folds a streamed CDF range exactly once and " +
      "matches the rebuilt model; the resumed checkpoint does not " +
      "double-fold") {
    val src = tmpDir("vm_lmsrc")
    val st = tmpDir("vm_lmstate")
    val ck = tmpDir("vm_lmck")
    val t = ManagedTable(spark, src)
    t.write(corpus(0 until 40), "APPEND", "append")
    val view = new CorpusLmView(spark, src, st)
    view.initialize()
    t.write(corpus(40 until 60), "APPEND", "append")
    t.delete(col("doc_id") % 7 === 2)
    t.update(Map("text" -> concat(col("text"), lit(" zzrevised"))),
      col("doc_id") % 11 === 3)
    assert(view.refreshStream(ck).awaitTermination(120000),
      "the LM view stream did not drain")
    assert(view.sourceVersion === 3L)
    assertSameRows(view.read,
      graft.llm.TextOps.unigramModel(t.read, "text", "doc_id"))
    // resume the SAME checkpoint after one more slice: exactly that
    // batch folds, nothing double-applies
    t.write(corpus(200 until 210), "APPEND", "append")
    assert(view.refreshStream(ck).awaitTermination(120000))
    assert(view.sourceVersion === 4L)
    assertSameRows(view.read,
      graft.llm.TextOps.unigramModel(t.read, "text", "doc_id"))
    // and a batch refresh interleaves as a no-op
    val vBefore = ManagedTable(spark, st).latestVersion
    assert(view.refresh() === 4L)
    assert(ManagedTable(spark, st).latestVersion === vBefore)
  }

  test("two LM-view refreshes racing: the additive fold can never land " +
      "twice (the fence is its ONLY protection — no id gates)") {
    val src = tmpDir("vm_lmrace_src")
    val st = tmpDir("vm_lmrace_st")
    val t = ManagedTable(spark, src)
    t.write(corpus(0 until 30), "APPEND", "append")
    new CorpusLmView(spark, src, st).initialize()
    t.write(corpus(30 until 50), "APPEND", "append")
    val gate = new java.util.concurrent.CyclicBarrier(2)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val attempts = Seq(
      Future { gate.await()
        scala.util.Try(new CorpusLmView(spark, src, st).refresh()) },
      Future { gate.await()
        scala.util.Try(new CorpusLmView(spark, src, st).refresh()) })
      .map(Await.result(_, 120.seconds))
    assert(attempts.exists(_.isSuccess), "at least one refresh must land")
    attempts.filter(_.isFailure).foreach { f =>
      val msg = f.failed.get.getMessage
      assert(msg.contains("advanced from version") ||
        msg.contains("concurrent commit detected") ||
        msg.contains("watermark advanced from"),
        s"the losing refresh must fail on the fence, got: $msg")
    }
    // whatever the interleave: counts folded EXACTLY once
    val view = new CorpusLmView(spark, src, st)
    assert(view.sourceVersion === 1L)
    assertSameRows(view.read,
      graft.llm.TextOps.unigramModel(t.read, "text", "doc_id"))
    assert(view.refresh() === 1L)
  }

  test("two agg-view refreshes racing: the tagged-union fold can never " +
      "double-apply a slice") {
    import graft.table.IncrementalAggView
    val src = tmpDir("vm_aggrace_src")
    val st = tmpDir("vm_aggrace_st")
    val t = ManagedTable(spark, src)
    val rows = (ids: Range) => ids.map(i =>
      (i.toLong, names(i % names.length), (i % 7).toLong))
      .toDF("id", "grp", "v")
    t.write(rows(0 until 40), "APPEND", "append")
    val mk = () => new IncrementalAggView(spark, src, st,
      Seq("grp"), Seq("v"), Seq("v"))
    mk().initialize()
    t.write(rows(40 until 70), "APPEND", "append")
    val gate = new java.util.concurrent.CyclicBarrier(2)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val attempts = Seq(
      Future { gate.await(); scala.util.Try(mk().refresh()) },
      Future { gate.await(); scala.util.Try(mk().refresh()) })
      .map(Await.result(_, 120.seconds))
    assert(attempts.exists(_.isSuccess), "at least one refresh must land")
    attempts.filter(_.isFailure).foreach { f =>
      val msg = f.failed.get.getMessage
      assert(msg.contains("advanced from version") ||
        msg.contains("concurrent commit detected") ||
        msg.contains("while this refresh netted"),
        s"the losing refresh must fail on the fence, got: $msg")
    }
    val expected = t.read.groupBy("grp")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast("decimal(28,6)")).cast("decimal(28,6)").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"))
    assertSameRows(mk().read, expected)
    assert(mk().refresh() === 1L)
  }

  test("the NB classifier view folds a streamed CDF range exactly once: " +
      "model and priors match the from-scratch retrain") {
    import graft.llm.QualityClassifier
    val src = tmpDir("vm_nbsrc")
    val st = tmpDir("vm_nbstate")
    val ck = tmpDir("vm_nbck")
    val labeled = (ids: Range) => ids.map { i =>
      (i.toLong, s"${names(i % names.length)} ${names((i * 5 + 1) % names.length)}",
        (i % 3 == 0): Boolean)
    }.toDF("doc_id", "text", "weak_label")
      .withColumn("weak_label", col("weak_label").cast("int"))
    val t = ManagedTable(spark, src)
    t.write(labeled(0 until 40), "APPEND", "append")
    val view = new ClassifierModelView(spark, src, st)
    view.initialize()
    t.write(labeled(40 until 60), "APPEND", "append")
    t.delete(col("doc_id") % 5 === 1)
    t.update(Map("weak_label" -> (lit(1) - col("weak_label"))),
      col("doc_id") % 13 === 2) // label flips move BOTH class counts
    assert(view.refreshStream(ck).awaitTermination(120000),
      "the NB view stream did not drain")
    assert(view.sourceVersion === 3L)
    assertSameRows(view.read,
      QualityClassifier.train(t.read, "text", "weak_label"))
    val expected = QualityClassifier.priors(t.read, "weak_label")
      .select(coalesce(col("d_pos"), lit(0L)),
        coalesce(col("d_neg"), lit(0L))).head()
    val (_, dp, dn) = view.watermark
    assert((dp, dn) === ((expected.getLong(0), expected.getLong(1))),
      "streamed priors must equal the retrained priors")
  }
}
