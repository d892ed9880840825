package graft

import graft.llm.{Retrieval, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{In, InSet}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.functions._

/** Query-batch scale pins for the retrieval/ANN entry points: past the
  * driver size gate NOTHING query-sized may collect to the driver or
  * ride a broadcast/`isin` literal. The distributed paths must agree
  * with the driver-sized paths row-for-row (same candidates, same
  * float-add order, bit-identical scores), and the plan shape is
  * pinned so a future entry point cannot quietly reintroduce a
  * query-side collect.
  *
  * All inputs derive from `spark.range` — no `LocalRelation` exists
  * anywhere in these plans by construction, which is what lets the
  * structural pin assert "no driver-collected data feeds this join". */
class QueryScaleSpec extends SparkSpec {

  /** n deterministic, pairwise-distinct 8-dim vectors. */
  private def vecs(n: Int, idOffset: Long = 0L): DataFrame =
    spark.range(n).select((col("id") + idOffset).as("vec_id"),
      array((0 until 8).map(d =>
        sin(col("id") * (d + 1) + lit(d * 0.7))): _*).as("embedding"))

  /** n synthetic docs over a tiny closed vocabulary. */
  private def docs(n: Int): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        concat(lit("alpha"), col("id") % 5),
        concat(lit("beta"), col("id") % 3),
        lit("common")).as("text"))

  private lazy val corpus = vecs(200).localCheckpoint()
  private lazy val probes = vecs(40, idOffset = 1000).localCheckpoint()
  private lazy val ivfpq = {
    val (c, b, cd) = Similarity.ivfPqIndex(corpus, nlist = 4, m = 2, ksub = 4)
    (c, b, cd.localCheckpoint())
  }

  test("ivfPqTopKWith: distributed cell-join path matches the driver path exactly") {
    val (cents, books, codes) = ivfpq
    val drv = Similarity.ivfPqTopKWith(cents, books, codes, corpus, probes,
      k = 5, nProbe = 2, rerank = 16)
    val dist = Similarity.ivfPqTopKWith(cents, books, codes, corpus, probes,
      k = 5, nProbe = 2, rerank = 16, maxDriverQueries = 0)
    assertSameRows(dist, drv)
  }

  test("pqTopKWith: distributed crossJoin path matches the driver path exactly") {
    val books = Similarity.pqTrain(corpus, m = 2, ksub = 4)
    val codes = Similarity.pqEncode(corpus, books).localCheckpoint()
    val drv = Similarity.pqTopKWith(books, codes, corpus, probes, k = 5,
      rerank = 16)
    val dist = Similarity.pqTopKWith(books, codes, corpus, probes, k = 5,
      rerank = 16, maxDriverQueries = 0)
    assertSameRows(dist, drv)
  }

  test("sq8TopKWith: distributed path matches the driver path exactly") {
    val (mins, maxs) = Similarity.sq8Train(corpus)
    val codes = Similarity.sq8Encode(corpus, mins, maxs).localCheckpoint()
    val drv = Similarity.sq8TopKWith(mins, maxs, codes, corpus, probes, k = 5,
      rerank = 16)
    val dist = Similarity.sq8TopKWith(mins, maxs, codes, corpus, probes, k = 5,
      rerank = 16, maxDriverQueries = 0)
    assertSameRows(dist, drv)
  }

  test("bruteForceTopK: unhinted path matches the broadcast path exactly") {
    val drv = Similarity.bruteForceTopK(corpus, probes, k = 5)
    val dist = Similarity.bruteForceTopK(corpus, probes, k = 5,
      maxBroadcastQueries = 0)
    assertSameRows(dist, drv)
  }

  test("bm25SearchWith: shuffled-join path matches the broadcast path exactly") {
    val idx = Retrieval.bm25Index(docs(60)).localCheckpoint()
    val queries = spark.range(30).select(col("id").as("query_id"),
      concat_ws(" ", concat(lit("alpha"), col("id") % 5),
        lit("common")).as("query_text"))
    val drv = Retrieval.bm25SearchWith(queries, idx, k = 4, exact = true)
    val dist = Retrieval.bm25SearchWith(queries, idx, k = 4, exact = true,
      maxBroadcastQueries = 0)
    assertSameRows(dist, drv)
  }

  test("bm25SearchPostings: the normalized layout matches the denormalized " +
      "ranking bit-for-bit, in BOTH query-batch regimes") {
    val corpus60 = docs(60).localCheckpoint()
    val idx = Retrieval.bm25Index(corpus60).localCheckpoint()
    val post = Retrieval.bm25Postings(corpus60).localCheckpoint()
    val scal = post.groupBy("doc_id").agg(first("dl").as("dl"))
      .agg(count(lit(1)), sum("dl")).head()
    val (nDocs, totalLen) = (scal.getLong(0), scal.getLong(1))
    val queries = spark.range(30).select(col("id").as("query_id"),
      concat_ws(" ", concat(lit("alpha"), col("id") % 5),
        lit("common")).as("query_text"))
    val denorm = Retrieval.bm25SearchWith(queries, idx, k = 4, exact = true)
    val norm = Retrieval.bm25SearchPostings(queries, post, nDocs, totalLen,
      k = 4, exact = true)
    val normDist = Retrieval.bm25SearchPostings(queries, post, nDocs,
      totalLen, k = 4, exact = true, maxBroadcastQueries = 0)
    assertSameRows(norm, denorm)
    assertSameRows(normDist, denorm)
  }

  test("plan pin: past the gate no isin literal on cell and no LocalRelation " +
      "feeds the ANN join; the driver path keeps its isin pruning") {
    val (cents, books, codes) = ivfpq
    val dist = Similarity.ivfPqTopKWith(cents, books, codes, corpus, probes,
      k = 5, nProbe = 2, rerank = 16, maxDriverQueries = 0)
    val plan = dist.queryExecution.optimizedPlan
    val inFilters = plan.collect { case f: Filter => f }.flatMap(f =>
      f.condition.collect { case i: In => i.sql; case i: InSet => i.sql })
    assert(inFilters.isEmpty,
      s"distributed path must not prune with a driver-side literal list: $inFilters")
    val locals = plan.collect { case l: LocalRelation if l.data.nonEmpty => l }
    assert(locals.isEmpty,
      "a LocalRelation (driver-collected rows) feeds the distributed ANN plan")
    // negative control: the pin itself distinguishes the two paths —
    // the driver-sized path DOES prune codes with an isin literal
    val drv = Similarity.ivfPqTopKWith(cents, books, codes, corpus, probes,
      k = 5, nProbe = 2, rerank = 16)
    val drvIn = drv.queryExecution.optimizedPlan.collect { case f: Filter => f }
      .flatMap(f => f.condition.collect { case i: In => i; case i: InSet => i })
    assert(drvIn.nonEmpty, "driver path lost its probed-cell isin pruning")
  }

  test("100k-query batch through bm25SearchWith: no driver-sized state, " +
      "full k per query") {
    val idx = Retrieval.bm25Index(docs(50)).localCheckpoint()
    val queries = spark.range(100000).select(col("id").as("query_id"),
      concat(lit("alpha"), col("id") % 5).as("query_text"))
    val out = Retrieval.bm25SearchWith(queries, idx, k = 3, exact = true)
    // every query term alpha{0..4} matches exactly 10 of the 50 docs
    assert(out.count() === 300000L)
    // scores are per-query-term-identical across queries sharing a term:
    // spot-check one stratum against the driver-sized path
    val one = spark.range(1).select(lit(7L).as("query_id"),
      lit("alpha2").as("query_text"))
    val expect = Retrieval.bm25SearchWith(one, idx, k = 3, exact = true)
      .select("rank", "doc_id", "score_scaled")
    assertSameRows(
      out.filter(col("query_id") === 7).select("rank", "doc_id", "score_scaled"),
      expect)
  }

  test("100k-query batch through ivfPqTopKWith: distributed cell join, " +
      "planted copies rank their original first") {
    val (cents, books, codes) = ivfpq
    // query i carries the exact embedding of corpus vector i % 200 —
    // its first probe is that vector's own cell, and the full-candidate
    // exact re-rank must put the original at rank 1 (cosine 1)
    val queries = spark.range(100000).select(
      (col("id") + 1000000).as("vec_id"),
      array((0 until 8).map(d =>
        sin((col("id") % 200) * (d + 1) + lit(d * 0.7))): _*).as("embedding"))
    val out = Similarity.ivfPqTopKWith(cents, books, codes, corpus, queries,
      k = 1, nProbe = 2, rerank = 128).localCheckpoint()
    assert(out.count() === 100000L)
    val wrong = out.filter(col("neighbor_id") =!=
      pmod(col("query_id") - 1000000, lit(200))).count()
    assert(wrong === 0L,
      s"$wrong of 100000 planted copies did not rank their original first")
  }
}
