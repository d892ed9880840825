package graft

import graft.llm.Retrieval
import graft.table.{Bm25IndexView, ManagedTable}
import org.apache.spark.sql.functions._

/** Lifecycle pins for the CDF-maintained BM25 index view: fold-equals-
  * rebuild under appends, deletes, AND updates (signed posting
  * maintenance), watermark recovery across instances, no-op refreshes,
  * and the loud duplicate-id / recreated-source contracts. */
class Bm25IndexViewSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark merge table table"),
    (2L, "spark merge"),
    (3L, "table table table table table"),
    (4L, "window stream window stream window"),
    (5L, "merge"),
    (6L, "stream table spark"),
    (7L, "window merge window")).toDF("doc_id", "text")

  test("two refreshed epochs equal the from-scratch index; restart resumes; " +
      "current refresh is a zero-commit no-op") {
    val src = tmpDir("bm25v_src")
    val st = tmpDir("bm25v_state")
    val t = ManagedTable(spark, src)
    t.write(corpus.filter(col("doc_id") <= 3), "APPEND", "append")
    new Bm25IndexView(spark, src, st, expectedDocs = 1000).initialize()
    t.write(corpus.filter(col("doc_id").isin(4L, 5L)), "APPEND", "append")
    assert(new Bm25IndexView(spark, src, st).refresh() === 1L)
    t.write(corpus.filter(col("doc_id") >= 6), "APPEND", "append")
    val restarted = new Bm25IndexView(spark, src, st)
    assert(restarted.refresh() === 2L)
    val vBefore = ManagedTable(spark, st).latestVersion
    assert(restarted.refresh() === 2L)
    assert(ManagedTable(spark, st).latestVersion === vBefore,
      "an already-current refresh must not commit")
    val q = Seq((1L, "spark merge"), (2L, "window table"))
      .toDF("query_id", "query_text")
    assertSameRows(
      Retrieval.bm25SearchWith(q, restarted.read, k = 7, exact = true),
      Retrieval.bm25TopK(corpus, q, k = 7, exact = true))
  }

  private def searchEquals(view: Bm25IndexView, t: ManagedTable): Unit = {
    val q = Seq((1L, "spark merge"), (2L, "window table"), (3L, "stream"))
      .toDF("query_id", "query_text")
    assertSameRows(
      Retrieval.bm25SearchWith(q, view.read, k = 7, exact = true),
      Retrieval.bm25TopK(t.read, q, k = 7, exact = true))
  }

  test("deletes fold through signed posting maintenance: merged equals " +
      "rebuilt, df/scalars decrement, postings leave") {
    val src = tmpDir("bm25v_del")
    val st = tmpDir("bm25v_dels")
    val t = ManagedTable(spark, src)
    t.write(corpus, "APPEND", "append")
    val view = new Bm25IndexView(spark, src, st, expectedDocs = 1000)
    view.initialize()
    // a coarse dir-rewrite delete (no captured change data): the
    // survivors' +/− rows must net away and only doc 3 leave
    t.delete(col("doc_id") === 3L)
    assert(view.refresh() === 1L)
    searchEquals(view, t)
    val merged = view.read
    val rebuilt = Retrieval.bm25Index(t.read, "text", "doc_id")
    assert(merged.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(merged).isEmpty,
      "merged postings table must equal the from-scratch rebuild exactly")
    assert(merged.filter(col("doc_id") === 3L).isEmpty)
    // delete-then-append in SEPARATE slices, one refresh folds both
    t.delete(col("doc_id") === 4L)
    t.write(Seq((8L, "stream stream merge")).toDF("doc_id", "text"),
      "APPEND", "append")
    assert(view.refresh() === 3L)
    searchEquals(view, t)
  }

  test("updates fold as (−pre, +post) pairs; re-inserting a deleted id " +
      "passes the bloom's exact re-check") {
    val src = tmpDir("bm25v_upd")
    val st = tmpDir("bm25v_upds")
    val t = ManagedTable(spark, src)
    t.write(corpus, "APPEND", "append")
    val view = new Bm25IndexView(spark, src, st, expectedDocs = 1000)
    view.initialize()
    // dir-rewrite UPDATE without captured CDF: the coarse feed nets to
    // the (−old text, +new text) pair
    t.update(Map("text" -> lit("table stream freshword")),
      col("doc_id") === 2L)
    assert(view.refresh() === 1L)
    searchEquals(view, t)
    // delete an id, then re-insert it in a later slice: the id is still
    // bloom-positive, so the exact check against the SURVIVING index
    // must let it back in
    t.delete(col("doc_id") === 5L)
    assert(view.refresh() === 2L)
    t.write(Seq((5L, "merge window merge")).toDF("doc_id", "text"),
      "APPEND", "append")
    assert(view.refresh() === 3L)
    searchEquals(view, t)
    val rebuilt = Retrieval.bm25Index(t.read, "text", "doc_id")
    assert(view.read.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(view.read).isEmpty)
  }

  test("a duplicate-id feed refuses loudly") {
    val src = tmpDir("bm25v_dup")
    val st = tmpDir("bm25v_dups")
    val t = ManagedTable(spark, src)
    t.write(corpus, "APPEND", "append")
    val view = new Bm25IndexView(spark, src, st, expectedDocs = 1000)
    view.initialize()
    // two inserts of an EXISTING id with different texts in one slice
    t.write(Seq((9L, "alpha beta"), (9L, "gamma delta"))
      .toDF("doc_id", "text"), "APPEND", "append")
    val e = intercept[IllegalArgumentException] { view.refresh() }
    assert(e.getMessage.contains("duplicate"))
  }

  test("a recreated source table is refused instead of silently refolded") {
    val src = tmpDir("bm25v_src3")
    val st = tmpDir("bm25v_state3")
    val t = ManagedTable(spark, src)
    t.write(corpus, "APPEND", "append")
    t.write(corpus, "APPEND", "append")
    val view = new Bm25IndexView(spark, src, st, expectedDocs = 1000)
    view.initialize() // watermark 1
    // simulate a recreate: wipe and write a single fresh commit (v0)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(src))
    ManagedTable(spark, src).write(corpus, "APPEND", "append")
    val e = intercept[IllegalArgumentException] { view.refresh() }
    assert(e.getMessage.contains("went backwards"))
  }
}
