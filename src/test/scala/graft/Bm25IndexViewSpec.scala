package graft

import graft.llm.Retrieval
import graft.table.{Bm25IndexView, ManagedTable}
import org.apache.spark.sql.functions._

/** Lifecycle pins for the CDF-maintained BM25 index view: fold-equals-
  * rebuild, watermark recovery across instances, no-op refreshes, and
  * the loud append-only contract. */
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

  test("a change-feed slice with updates or deletes refuses loudly") {
    val src = tmpDir("bm25v_src2")
    val st = tmpDir("bm25v_state2")
    val t = ManagedTable(spark, src)
    t.write(corpus, "APPEND", "append")
    val view = new Bm25IndexView(spark, src, st, expectedDocs = 1000)
    view.initialize()
    t.delete(col("doc_id") === 3L)
    val e = intercept[IllegalArgumentException] { view.refresh() }
    assert(e.getMessage.contains("APPEND slices only"))
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
