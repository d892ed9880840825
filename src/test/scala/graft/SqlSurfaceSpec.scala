package graft

import graft.llm.TextOps

/** The operator library's SQL surface: TVFs injected by
  * [[GraftExtensions]] must resolve from pure SQL text and produce the
  * SAME rows as the Scala API (they splice the identical plan). */
class SqlSurfaceSpec extends SparkSpec {

  private def docsView(): Unit =
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("documents")

  test("graft_token_count TVF matches the Scala API row for row") {
    docsView()
    assertSameRows(
      spark.sql("SELECT * FROM graft_token_count('documents')"),
      TextOps.tokenCount(spark.table("documents")))
  }

  test("graft_chunk TVF threads integer args through to the operator") {
    docsView()
    assertSameRows(
      spark.sql("SELECT * FROM graft_chunk('documents', 40, 10)"),
      TextOps.chunk(spark.table("documents"), chunkTokens = 40, overlap = 10))
  }

  test("TVFs compose inside larger SQL: join of two gates") {
    docsView()
    // the sf0.001 corpus has no " the "/" and "-style stop words, so the
    // full gopher verdict is 0 everywhere — compose on the word-count
    // rule instead, which does discriminate here
    val n = spark.sql(
      """SELECT count(*) AS n FROM graft_gopher_repetition('documents') r
        |JOIN graft_gopher_quality('documents') q USING (doc_id)
        |WHERE r.passes_repetition = 1 AND q.n_words BETWEEN 50 AND 100000""".stripMargin)
      .head.getLong(0)
    assert(n > 0, "composed TVF join returned no rows")
    // and the composition agrees with the API-side composition
    val api = TextOps.gopherRepetition(spark.table("documents"))
      .filter("passes_repetition = 1").select("doc_id")
      .join(TextOps.gopherQuality(spark.table("documents"))
        .filter("n_words BETWEEN 50 AND 100000").select("doc_id"), "doc_id")
      .count()
    assert(n === api)
  }

  test("graft_hash_sample / graft_hash_split from SQL match the Scala sampling rule") {
    docsView()
    assertSameRows(
      spark.sql("SELECT * FROM graft_hash_sample('documents', 'doc_id', 0.25)"),
      graft.operators.Sampling.hashSample(spark.table("documents"), Seq("doc_id"), 0.25))
    assertSameRows(
      spark.sql("SELECT * FROM graft_hash_split('documents', 'doc_id', 0.2)"),
      graft.operators.Sampling.hashSplit(spark.table("documents"), Seq("doc_id"), 0.2))
  }

  test("graft_cap_per_group TVF caps rows per group, lazily (no analysis-time job)") {
    docsView()
    assertSameRows(
      spark.sql("SELECT * FROM graft_cap_per_group('documents', 'lang', 5, 'doc_id')"),
      graft.operators.Sampling.capPerGroup(spark.table("documents"),
        groupCols = Seq("lang"), cap = 5, keys = Seq("doc_id"), hotGroupFactor = 0))
  }

  test("SQL-text task transforms can call the operator library") {
    // the reference's "everything is SQL text" execution type
    // (core/schemas/features.py:24-26) — a pure-SQL task step reaches the
    // curation operators through the TVF surface, no Scala in the task
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.task.SparkTask.sqlTransform(
      "SELECT doc_id, n_word_tokens FROM graft_token_count('docs') WHERE n_word_tokens >= 50")
      .apply(Map("docs" -> docs), Map.empty)("default")
    val api = TextOps.tokenCount(docs)
      .filter("n_word_tokens >= 50").select("doc_id", "n_word_tokens")
    assertSameRows(out, api)
  }

  test("TVF misuse fails loudly: wrong arity and non-string table arg") {
    docsView()
    val e1 = intercept[Exception](
      spark.sql("SELECT * FROM graft_chunk('documents', 40)").collect())
    assert(e1.getMessage.contains("graft_chunk"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM graft_token_count(42)").collect())
    assert(e2.getMessage.contains("string literal"), e2.getMessage)
  }
}
