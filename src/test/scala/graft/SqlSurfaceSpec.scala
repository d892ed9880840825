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

  test("graft_duplicated_spans TVF matches the Scala API row for row") {
    docsView()
    assertSameRows(
      spark.sql("SELECT * FROM graft_duplicated_spans('documents', 8, 12)"),
      graft.llm.Dedup.duplicatedSpans(spark.table("documents"),
        k = 8, minSpanTokens = 12))
  }

  test("graft_remove_duplicated_spans TVF matches the Scala API row for row") {
    docsView()
    assertSameRows(
      spark.sql("SELECT * FROM graft_remove_duplicated_spans('documents', 8, 12)"),
      graft.llm.Dedup.removeDuplicatedSpans(spark.table("documents"),
        k = 8, minSpanTokens = 12))
  }

  test("graft_approx_quantiles TVF estimates land within eps·n ranks") {
    docsView()
    // sketch CONTENT is partitioning-dependent, so the SQL/Scala twin is
    // the GUARANTEE, not row equality: every estimate within eps·n
    val n = spark.table("documents").count()
    val sizes = spark.table("documents")
      .select(org.apache.spark.sql.functions.col("n_chars").cast("double"))
      .as[Double](org.apache.spark.sql.Encoders.scalaDouble).collect().sorted
    val est = spark.sql(
      "SELECT * FROM graft_approx_quantiles('documents', 'n_chars', '0.25,0.5,0.75', 0.05)")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for ((p, v) <- est) {
      val r = math.max(1L, math.ceil(p * n).toLong)
      val lo = sizes.count(_ < v) + 1L
      val hi = sizes.count(_ <= v).toLong
      val err = if (r < lo) lo - r else if (r > hi) r - hi else 0L
      assert(err <= (0.05 * n).toLong, s"p=$p err $err")
    }
  }

  test("graft_expectations TVF parses the rule DSL and matches the Scala API") {
    docsView()
    import graft.operators.Expectations
    assertSameRows(
      spark.sql("""SELECT * FROM graft_expectations('documents',
        | 'not_null:text; unique:doc_id; range:n_chars:0:100000;
        |  regex:lang:^[a-z][a-z]$; one_of:lang:en|de|fr|es|zh;
        |  check:has_chars:n_chars >= 0')""".stripMargin),
      Expectations.check(spark.table("documents"), Seq(
        Expectations.NotNull("text"),
        Expectations.Unique(Seq("doc_id")),
        Expectations.InRange("n_chars", 0, 100000),
        Expectations.MatchesRegex("lang", "^[a-z][a-z]$"),
        Expectations.OneOf("lang", Seq("en", "de", "fr", "es", "zh")),
        Expectations.Satisfies("n_chars >= 0", "has_chars"))))
    // malformed rules fail loudly at analysis
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_expectations('documents', 'range:n_chars:x:y')"))
    assert(e.getMessage.contains("numeric"), e.getMessage)
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

  test("two-table TVFs: as-of and range joins resolve both sides by name") {
    import spark.implicits._
    Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"), (3L, 5L, "d"))
      .toDF("k", "lt", "lv").createOrReplaceTempView("asof_left")
    Seq((1L, 8L, 1.0), (1L, 19L, 2.0), (2L, 99L, 3.0))
      .toDF("k", "rt", "rv").createOrReplaceTempView("asof_right")
    assertSameRows(
      spark.sql("SELECT * FROM graft_asof_join('asof_left', 'asof_right', 'lt', 'rt', 'k')"),
      graft.operators.AsOfJoin.join(
        spark.table("asof_left"), spark.table("asof_right"), "lt", "rt", Seq("k")))

    Seq((1L, 12L), (1L, 30L), (2L, 7L)).toDF("k", "pt")
      .createOrReplaceTempView("rj_points")
    Seq((1L, 10L, 15L, "w1"), (2L, 0L, 100L, "w2")).toDF("k", "s", "e", "w")
      .createOrReplaceTempView("rj_intervals")
    assertSameRows(
      spark.sql("SELECT * FROM graft_range_join('rj_points', 'pt', 'rj_intervals', 's', 'e', 10, 'k')"),
      graft.operators.RangeJoin.pointInInterval(
        spark.table("rj_points"), "pt", spark.table("rj_intervals"), "s", "e",
        bucketWidth = 10L, keys = Seq("k")))
  }

  test("graft_semantic_dedup TVF trains at resolution, serves the same rows as the API") {
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").createOrReplaceTempView("emb")
    assertSameRows(
      spark.sql("SELECT * FROM graft_semantic_dedup('emb', 0.9, 8)"),
      graft.llm.Similarity.semanticDedup(spark.table("emb"),
        threshold = 0.9, nlist = 8))
  }

  test("graft_semantic_dedup_batch TVF matches the two-epoch API") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    emb.filter(col("vec_id") % 2 === 0).createOrReplaceTempView("corpus_e")
    emb.filter(col("vec_id") % 2 === 1).createOrReplaceTempView("batch_e")
    val cents = graft.llm.Similarity.trainCentroids(spark.table("corpus_e"), 8)
    assertSameRows(
      spark.sql("SELECT * FROM graft_semantic_dedup_batch('batch_e', 'corpus_e', 0.9, 8)"),
      graft.llm.Similarity.semanticDedupBatch(cents, spark.table("batch_e"),
        graft.llm.Similarity.buildSemanticIndex(cents, spark.table("corpus_e")),
        threshold = 0.9))
  }

  test("corpus-stat TVFs (rare tokens, tf-idf, normalize, mixture) match the API") {
    docsView()
    assertSameRows(
      spark.sql("SELECT * FROM graft_rare_tokens('documents', 5)"),
      TextOps.rareTokenScore(spark.table("documents"), minFreq = 5))
    assertSameRows(
      spark.sql("SELECT * FROM graft_tfidf_keywords('documents', 2)"),
      TextOps.tfidfKeywords(spark.table("documents"), k = 2))
    assertSameRows(
      spark.sql("SELECT * FROM graft_normalize_text('documents')"),
      TextOps.normalizeText(spark.table("documents")))
    assertSameRows(
      spark.sql(
        "SELECT * FROM graft_mixture_sample('documents', 'lang', 'en:0.5,de:0.5', 20, 'doc_id')"),
      graft.operators.Sampling.mixtureSample(spark.table("documents"), "lang",
        Map("en" -> 0.5, "de" -> 0.5), total = 20, keys = Seq("doc_id"),
        hotGroupFactor = 0))
    assertSameRows(
      spark.sql("SELECT * FROM graft_corpus_profile('documents')"),
      TextOps.corpusProfile(spark.table("documents")))
    // two-table LM scoring: persisted-model view + batch view
    TextOps.unigramModel(spark.table("documents"))
      .createOrReplaceTempView("lm")
    assertSameRows(
      spark.sql("SELECT * FROM graft_rare_tokens_against('documents', 'lm', 2)"),
      TextOps.rareTokenScoreWith(spark.table("documents"),
        spark.table("lm"), minFreq = 2))
    TextOps.docFreqModel(spark.table("documents"))
      .createOrReplaceTempView("dfm")
    assertSameRows(
      spark.sql("SELECT * FROM graft_tfidf_keywords_against('documents', 'dfm', 2)"),
      TextOps.tfidfKeywordsWith(spark.table("documents"),
        spark.table("dfm"), k = 2))
    assertSameRows(
      spark.sql(
        "SELECT * FROM graft_export_shards('documents', 'lang', 'doc_id', 'n_chars', 2000)"),
      graft.llm.Packing.exportShards(
        graft.llm.Packing.packSequences(spark.table("documents"),
          Seq("lang"), Seq("doc_id"), "n_chars", 2000L), Seq("lang")))
  }

  test("training-order and decontamination TVFs match the API") {
    docsView()
    assertSameRows(
      spark.sql("SELECT * FROM graft_training_order('documents', 'doc_id', 8, 'ep1')"),
      graft.operators.Sampling.trainingOrder(spark.table("documents"),
        Seq("doc_id"), numShards = 8, salt = "ep1"))
    // two-table forms over a standing benchmark index view
    val docs = spark.table("documents")
    graft.llm.Dedup.benchmarkIndex(docs.filter("doc_id % 5 = 0"))
      .createOrReplaceTempView("benchidx")
    docs.filter("doc_id % 5 <> 0").createOrReplaceTempView("trainbatch")
    assertSameRows(
      spark.sql("SELECT * FROM graft_contamination_against('trainbatch', 'benchidx', 2)"),
      graft.llm.Dedup.contaminationPairsWith(spark.table("trainbatch"),
        spark.table("benchidx"), minShared = 2))
    assertSameRows(
      spark.sql("SELECT * FROM graft_decontaminate_against('trainbatch', 'benchidx', 2)"),
      graft.llm.Dedup.decontaminateWith(spark.table("trainbatch"),
        spark.table("benchidx"), minShared = 2))
  }

  test("span-index TVFs: build, detect and cut against a standing index from SQL") {
    docsView()
    val docs = spark.table("documents")
    val corpus = docs.filter("doc_id % 3 <> 0")
    val batch = docs.filter("doc_id % 3 = 0")
    corpus.createOrReplaceTempView("spancorpus")
    batch.createOrReplaceTempView("spanbatch")
    // build the index from SQL (the CTAS-able standing artifact)...
    spark.sql("SELECT * FROM graft_span_index('spancorpus', 8)")
      .createOrReplaceTempView("spanidx")
    // ...then both the detection and the removal TVFs match the API
    assertSameRows(
      spark.sql(
        "SELECT * FROM graft_shared_spans_against('spanbatch', 'spanidx', 8, 12)"),
      graft.llm.Dedup.sharedSpansAgainst(batch,
        graft.llm.Dedup.spanGramIndex(corpus), k = 8, minSpanTokens = 12))
    assertSameRows(
      spark.sql(
        "SELECT * FROM graft_remove_spans_against('spanbatch', 'spanidx', 8, 12)"),
      graft.llm.Dedup.removeDuplicatedSpansAgainst(batch,
        graft.llm.Dedup.spanGramIndex(corpus), k = 8, minSpanTokens = 12))
  }

  test("graft_bpe_encode TVF encodes against a persisted merges view") {
    docsView()
    val docs = spark.table("documents").limit(30)
    docs.createOrReplaceTempView("bpedocs")
    val merges = graft.llm.Bpe.learn(docs, numMerges = 6)
    graft.llm.Bpe.mergesTable(spark, merges).createOrReplaceTempView("bpemerges")
    assertSameRows(
      spark.sql("SELECT doc_id, n_words, n_bpe_tokens FROM graft_bpe_encode('bpedocs', 'bpemerges')"),
      graft.llm.Bpe.encode(docs, merges)
        .select("doc_id", "n_words", "n_bpe_tokens"))
  }

  test("graft_fuzzy_join TVF matches the API in self and two-table forms") {
    import graft.operators.FuzzyJoin
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_name")
    parts.createOrReplaceTempView("parts_v")
    assertSameRows(
      spark.sql("SELECT * FROM graft_fuzzy_join('parts_v', 'p_partkey', 'p_name', 1)"),
      FuzzyJoin.fuzzySelfJoin(parts, "p_partkey", "p_name", 1))
    assertSameRows(
      spark.sql("""SELECT * FROM graft_fuzzy_join('parts_v', 'p_partkey', 'p_name',
        |'parts_v', 'p_partkey', 'p_name', 1)""".stripMargin),
      FuzzyJoin.fuzzyJoin(parts, parts, "p_partkey", "p_name",
        "p_partkey", "p_name", 1))
  }

  test("graft_unigram_encode TVF encodes against a persisted vocab view") {
    docsView()
    val docs = spark.table("documents").limit(30)
    docs.createOrReplaceTempView("ulmdocs")
    val vocab = graft.llm.UnigramLm.learn(docs, vocabSize = 48, emRounds = 2)
    graft.llm.UnigramLm.vocabTable(spark, vocab)
      .createOrReplaceTempView("ulmvocab")
    assertSameRows(
      spark.sql("SELECT doc_id, n_words, n_ulm_tokens FROM graft_unigram_encode('ulmdocs', 'ulmvocab')"),
      graft.llm.UnigramLm.encode(docs, vocab)
        .select("doc_id", "n_words", "n_ulm_tokens"))
  }

  test("drift TVFs: profile and verdicts match the API") {
    import graft.operators.Expectations
    docsView()
    val docs = spark.table("documents")
    val dsl = "count; nulls:text; distinct:lang"
    assertSameRows(
      spark.sql(s"SELECT * FROM graft_metrics_profile('documents', '$dsl')"),
      Expectations.metricsProfile(docs, Expectations.parseMetrics(dsl)))
    docs.filter("doc_id % 2 = 0").createOrReplaceTempView("cur_epoch")
    Expectations.metricsProfile(spark.table("cur_epoch"),
      Expectations.parseMetrics(dsl)).createOrReplaceTempView("cur_prof")
    Expectations.metricsProfile(docs, Expectations.parseMetrics(dsl))
      .createOrReplaceTempView("hist_prof")
    assertSameRows(
      spark.sql("SELECT * FROM graft_drift_check('cur_prof', 'hist_prof', 300000)"),
      Expectations.driftCheck(spark.table("cur_prof"),
        spark.table("hist_prof"), 300000L))
  }

  test("graft_dataset_card TVF matches the API") {
    docsView()
    assertSameRows(
      spark.sql("SELECT * FROM graft_dataset_card('documents')"),
      graft.llm.TextOps.datasetCard(spark.table("documents")))
  }

  test("graft_heavy_hitters TVF matches the API") {
    docsView()
    assertSameRows(
      spark.sql("SELECT * FROM graft_heavy_hitters('documents', 'lang', 'source', 64, 3)"),
      graft.operators.Sketches.heavyHitters(spark.table("documents"),
        Seq("lang"), "source", capacity = 64, k = 3))
  }

  test("quality-classifier TVFs: one-shot and standing-model forms match the API") {
    import graft.llm.QualityClassifier
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("weak_label",
        (col("n_chars") >= 250).cast("int"))
    docs.createOrReplaceTempView("docs_labeled")
    assertSameRows(
      spark.sql("SELECT * FROM graft_quality_classify('docs_labeled', 'weak_label')"),
      QualityClassifier.scoreWith(docs,
        QualityClassifier.train(docs), QualityClassifier.priors(docs)))
    QualityClassifier.train(docs).createOrReplaceTempView("nb_model")
    QualityClassifier.priors(docs).createOrReplaceTempView("nb_priors")
    assertSameRows(
      spark.sql(
        "SELECT * FROM graft_quality_score_against('docs_labeled', 'nb_model', 'nb_priors')"),
      QualityClassifier.scoreWith(docs,
        spark.table("nb_model"), spark.table("nb_priors")))
  }

  test("KMV TVFs: per-group distinct and two-table overlap match the API") {
    import graft.operators.Sketches
    import org.apache.spark.sql.functions._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.createOrReplaceTempView("orders")
    orders.filter(year(col("o_orderdate")) === 1995)
      .createOrReplaceTempView("orders95")
    orders.filter(year(col("o_orderdate")) === 1996)
      .createOrReplaceTempView("orders96")
    assertSameRows(
      spark.sql(
        "SELECT * FROM graft_kmv_distinct('orders', 'o_orderpriority', 'o_custkey', 256)"),
      Sketches.kmvMergeEstimate(
        Sketches.kmvSketch(orders, Seq("o_orderpriority"), "o_custkey", 256),
        Seq("o_orderpriority")))
    val viaSql = spark.sql(
      "SELECT * FROM graft_kmv_overlap('orders95', 'orders96', 'o_custkey', 256)")
      .collect().head
    // overlap estimates must agree with the direct pairwise set ops
    def one(t: org.apache.spark.sql.DataFrame, as: String) =
      Sketches.kmvSketch(t.withColumn("g", lit(1)), Seq("g"), "o_custkey", 256)
        .select(col(Sketches.KmvCol).as(as))
    val api = Sketches.kmvSetEstimates(
      one(spark.table("orders95"), "ska").crossJoin(one(spark.table("orders96"), "skb")),
      "ska", "skb").collect().head
    Seq("est_a", "est_b", "est_union", "est_inter", "est_diff_a").foreach(c =>
      assert(viaSql.getAs[Long](c) === api.getAs[Long](c), c))
  }

  test("TVF misuse fails loudly: wrong arity and non-string table arg") {
    docsView()
    val e1 = intercept[Exception](
      spark.sql("SELECT * FROM graft_chunk('documents', 40)").collect())
    assert(e1.getMessage.contains("graft_chunk"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM graft_token_count(42)").collect())
    assert(e2.getMessage.contains("string literal"), e2.getMessage)
    // malformed weights_csv entries get descriptive errors, not MatchError
    val e3 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_mixture_sample('documents', 'lang', 'en=0.5', 20, 'doc_id')").collect())
    assert(e3.getMessage.contains("stratum:weight"), e3.getMessage)
    val e4 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_mixture_sample('documents', 'lang', 'en:0.5:x', 20, 'doc_id')").collect())
    assert(e4.getMessage.contains("stratum:weight"), e4.getMessage)
    val e5 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_mixture_sample('documents', 'lang', 'en:half', 20, 'doc_id')").collect())
    assert(e5.getMessage.contains("numeric"), e5.getMessage)
  }

  test("graft_bigram_fluency TVF matches the Scala API") {
    docsView()
    assertSameRows(
      spark.sql("SELECT * FROM graft_bigram_fluency('documents')"),
      TextOps.bigramScore(spark.table("documents")))
  }

  test("graft_knn and graft_sq8_topk TVFs match the Scala API") {
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").createOrReplaceTempView("emb_corpus")
    spark.table("emb_corpus").filter("vec_id < 5")
      .createOrReplaceTempView("emb_queries")
    assertSameRows(
      spark.sql("SELECT * FROM graft_knn('emb_corpus', 'emb_queries', 5)"),
      graft.llm.Similarity.bruteForceTopK(
        spark.table("emb_corpus"), spark.table("emb_queries"), 5))
    assertSameRows(
      spark.sql("SELECT * FROM graft_sq8_topk('emb_corpus', 'emb_queries', 5)"),
      graft.llm.Similarity.sq8TopK(
        spark.table("emb_corpus"), spark.table("emb_queries"), 5))
  }

  test("graft_cohort_retention and graft_resample_locf TVFs match the Scala API") {
    val ev0 = spark.read.parquet(s"$sf/events.parquet")
    ev0.withColumn("ts_us", Queries.eventMicros(ev0))
      .createOrReplaceTempView("ev_us")
    assertSameRows(
      spark.sql(
        "SELECT * FROM graft_cohort_retention('ev_us', 'ts_us', 'user_id', 7)"),
      graft.operators.EventAnalytics.cohortRetention(spark.table("ev_us")))
    assertSameRows(
      spark.sql("SELECT * FROM graft_resample_locf('ev_us', 'event_type', " +
        "'ts_us', 'value', 'event_id', 1)"),
      graft.operators.EventAnalytics.resampleLocf(spark.table("ev_us"),
        "event_type", "ts_us", "value", "event_id"))
  }

  test("graft_collocations TVF matches the Scala API") {
    spark.read.parquet(s"$sf/documents.parquet")
      .createOrReplaceTempView("colloc_docs")
    assertSameRows(
      spark.sql("SELECT * FROM graft_collocations('colloc_docs', 3, 10)"),
      graft.llm.TextOps.collocations(
        spark.table("colloc_docs"), minCount = 3, k = 10))
  }

  test("graft_hybrid_topk TVF matches the Scala API") {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .createOrReplaceTempView("hy_docs")
    spark.read.parquet(s"$sf/embeddings.parquet")
      .createOrReplaceTempView("hy_emb")
    Seq((3L, "spark table merge")).toDF("query_id", "query_text")
      .createOrReplaceTempView("hy_qt")
    spark.table("hy_emb").filter("vec_id = 3")
      .createOrReplaceTempView("hy_qv")
    assertSameRows(
      spark.sql(
        "SELECT * FROM graft_hybrid_topk('hy_docs', 'hy_emb', 'hy_qt', 'hy_qv', 5)"),
      graft.llm.Retrieval.hybridTopK(spark.table("hy_docs"),
        spark.table("hy_emb"), spark.table("hy_qt"), spark.table("hy_qv"), 5))
  }

  test("graft_hybrid_topk_indexed TVF serves from persisted index tables " +
      "and matches the Scala API") {
    import spark.implicits._
    import graft.llm.{Retrieval, Similarity}
    spark.read.parquet(s"$sf/documents.parquet")
      .createOrReplaceTempView("hyi_docs")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    emb.createOrReplaceTempView("hyi_emb")
    Seq((3L, "spark table merge")).toDF("query_id", "query_text")
      .createOrReplaceTempView("hyi_qt")
    emb.filter("vec_id = 3").createOrReplaceTempView("hyi_qv")
    Retrieval.bm25Index(spark.table("hyi_docs"))
      .createOrReplaceTempView("hyi_bm25")
    val (cents, books, codes) =
      Similarity.ivfPqIndex(emb, nlist = 8, m = 8, ksub = 8)
    Similarity.centroidsTable(spark, cents).createOrReplaceTempView("hyi_cents")
    Similarity.pqBooksTable(spark, books).createOrReplaceTempView("hyi_books")
    codes.localCheckpoint().createOrReplaceTempView("hyi_codes")
    assertSameRows(
      spark.sql(
        "SELECT * FROM graft_hybrid_topk_indexed('hyi_bm25', 'hyi_cents', " +
          "'hyi_books', 'hyi_codes', 'hyi_emb', 'hyi_qt', 'hyi_qv', 5)"),
      Retrieval.hybridTopKWith(spark.table("hyi_qt"), spark.table("hyi_qv"),
        spark.table("hyi_bm25"), cents, books, spark.table("hyi_codes"),
        spark.table("hyi_emb"), k = 5))
  }

  test("graft_funnel / graft_funnel_stats TVFs thread steps and bounds " +
      "through to the operators") {
    import spark.implicits._
    val D = graft.operators.EventAnalytics.MicrosPerDay
    Seq((1L, "view", 0L), (1L, "click", D), (1L, "purchase", 2 * D),
        (2L, "view", 0L), (2L, "click", 3 * D))
      .toDF("user_id", "event_type", "ts_us")
      .createOrReplaceTempView("fn_ev")
    assertSameRows(
      spark.sql("SELECT * FROM graft_funnel('fn_ev', 'ts_us', 'user_id', " +
        "'event_type', 'view,click,purchase', 5, 2)"),
      graft.operators.EventAnalytics.funnelWindowed(spark.table("fn_ev"),
        Seq("view", "click", "purchase"),
        conversionWindowMicros = Some(5 * D), maxStepGapMicros = Some(2 * D)))
    assertSameRows(
      spark.sql("SELECT * FROM graft_funnel_stats('fn_ev', 'ts_us', " +
        "'user_id', 'event_type', 'view,click,purchase', 0, 0)"),
      graft.operators.EventAnalytics.funnelConversionStats(spark.table("fn_ev"),
        Seq("view", "click", "purchase")))
    // optional 8th argument routes the anchor policy
    assertSameRows(
      spark.sql("SELECT * FROM graft_funnel('fn_ev', 'ts_us', 'user_id', " +
        "'event_type', 'view,click,purchase', 5, 2, 'any_qualifying')"),
      graft.operators.EventAnalytics.funnelWindowed(spark.table("fn_ev"),
        Seq("view", "click", "purchase"),
        conversionWindowMicros = Some(5 * D), maxStepGapMicros = Some(2 * D),
        anchorPolicy = "any_qualifying"))
  }

  test("graft_cooccurrence and graft_cascade_rerank TVFs match the Scala API") {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .createOrReplaceTempView("co_docs")
    assertSameRows(
      spark.sql("SELECT * FROM graft_cooccurrence('co_docs', 3, 5, 10)"),
      graft.llm.TextOps.cooccurrencePmi(spark.table("co_docs"), window = 3,
        minCount = 5, k = 10))
    spark.read.parquet(s"$sf/embeddings.parquet")
      .createOrReplaceTempView("co_emb")
    Seq((3L, "table hash")).toDF("query_id", "query_text")
      .createOrReplaceTempView("co_qt")
    spark.table("co_emb").filter("vec_id = 3")
      .createOrReplaceTempView("co_qv")
    assertSameRows(
      spark.sql("SELECT * FROM graft_cascade_rerank('co_docs', 'co_emb', " +
        "'co_qt', 'co_qv', 20, 5)"),
      graft.llm.Retrieval.cascadeRerank(spark.table("co_qt"),
        spark.table("co_qv"),
        graft.llm.Retrieval.bm25Index(spark.table("co_docs")),
        spark.table("co_emb"), recallN = 20, k = 5))
  }

  test("graft_bm25_topk TVF matches the Scala API in both modes") {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .createOrReplaceTempView("bm25_docs")
    Seq((1L, "spark table merge"), (2L, "customer query"))
      .toDF("query_id", "query_text").createOrReplaceTempView("bm25_q")
    assertSameRows(
      spark.sql("SELECT * FROM graft_bm25_topk('bm25_docs', 'bm25_q', 4)"),
      graft.llm.Retrieval.bm25TopK(
        spark.table("bm25_docs"), spark.table("bm25_q"), 4))
    assertSameRows(
      spark.sql(
        "SELECT * FROM graft_bm25_topk('bm25_docs', 'bm25_q', 4, 'true')"),
      graft.llm.Retrieval.bm25TopK(
        spark.table("bm25_docs"), spark.table("bm25_q"), 4, exact = true))
  }
}
