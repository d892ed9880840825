package graft

import graft.llm.Retrieval
import org.apache.spark.sql.functions._

/** BM25 pins: exact-mode scores against an independent BigInt
  * reference computation, length-normalization and idf ordering
  * behaviour, OOV handling, exact-vs-double rank agreement, and the
  * standing-index round trip through parquet. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark merge table table"),           // dl 4
    (2L, "spark merge"),                       // dl 2 — same tf, shorter
    (3L, "table table table table table"),     // dl 5
    (4L, "window stream window stream window"), // dl 5
    (5L, "merge")                              // dl 1
  ).toDF("doc_id", "text")

  /** Independent exact-mode reference: BigInt arithmetic, no Spark. */
  private def refExact(docs: Seq[(Long, String)], query: String,
                       k: Int): Seq[(Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq }
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val n = BigInt(docs.size)
    val totalLen = BigInt(dl.values.sum)
    val df = toks.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (t, o) => t -> BigInt(o.size) }
    val qts = "[a-z0-9]+".r.findAllIn(query.toLowerCase).toSeq.distinct
    val scores = toks.flatMap { case (id, ts) =>
      val tfm = ts.groupBy(identity).map { case (t, o) => t -> BigInt(o.size) }
      val s = qts.flatMap { q =>
        tfm.get(q).map { tf =>
          // staged form, mirroring Retrieval's overflow-safe arithmetic
          val sat = (44 * tf * totalLen * BigInt(Retrieval.ExactScale)) /
            (20 * tf * totalLen + 6 * totalLen + 18 * BigInt(dl(id)) * n)
          ((2 * n - 2 * df(q) + 1) * sat) / (2 * df(q) + 1)
        }
      }
      if (s.isEmpty) None else Some(id -> s.sum.toLong)
    }
    scores.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  test("exact-mode scores match the BigInt reference, ranks and all") {
    val docsSeq = Seq(1L -> "spark merge table table", 2L -> "spark merge",
      3L -> "table table table table table",
      4L -> "window stream window stream window", 5L -> "merge")
    val queries = Seq((1L, "spark merge"), (2L, "table"),
      (3L, "window table")).toDF("query_id", "query_text")
    val got = Retrieval.bm25TopK(corpus, queries, k = 5, exact = true)
      .select("query_id", "rank", "doc_id", "score_scaled")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    val want = Seq(1L -> "spark merge", 2L -> "table", 3L -> "window table")
      .flatMap { case (qid, q) =>
        refExact(docsSeq, q, 5).zipWithIndex.map { case ((id, s), i) =>
          (qid, i + 1, id, s) } }
    assert(got === want)
  }

  test("length normalization: same tf, shorter document ranks higher") {
    // docs 1 and 2 both have tf(spark)=1, tf(merge)=1; doc 2 is shorter
    val q = Seq((1L, "spark")).toDF("query_id", "query_text")
    val r = Retrieval.bm25TopK(corpus, q, k = 2, exact = true)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(r === Seq(2L, 1L))
  }

  test("rarer term outweighs a common one at equal tf and dl") {
    // df(stream)=1 < df(table)=2; doc 4 (stream-bearing) must beat
    // doc 3 (table-bearing) for a query holding one term of each
    val q = Seq((1L, "stream table")).toDF("query_id", "query_text")
    val top = Retrieval.bm25TopK(corpus, q, k = 1, exact = true)
      .select("doc_id").as[Long].head()
    assert(top === 4L)
  }

  test("OOV query terms contribute nothing; all-OOV query yields no rows") {
    val q = Seq((1L, "spark zzz"), (2L, "zzz qqq")).toDF("query_id", "query_text")
    val out = Retrieval.bm25TopK(corpus, q, k = 5, exact = true)
    assert(out.filter(col("query_id") === 2L).count() === 0L)
    val withOov = out.filter(col("query_id") === 1L)
      .select("doc_id", "score_scaled").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val clean = Retrieval.bm25TopK(corpus,
        Seq((1L, "spark")).toDF("query_id", "query_text"), k = 5, exact = true)
      .select("doc_id", "score_scaled").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withOov === clean)
  }

  test("double mode agrees with exact mode on ranking") {
    val q = Seq((1L, "spark merge"), (2L, "window table"))
      .toDF("query_id", "query_text")
    def ranks(exact: Boolean) =
      Retrieval.bm25TopK(corpus, q, k = 5, exact = exact)
        .select("query_id", "rank", "doc_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ranks(exact = true) === ranks(exact = false))
  }

  test("standing index round-trips through parquet") {
    val dir = tmpDir("bm25idx")
    Retrieval.bm25Index(corpus).write.parquet(dir)
    val q = Seq((1L, "spark merge table")).toDF("query_id", "query_text")
    assertSameRows(
      Retrieval.bm25SearchWith(q, spark.read.parquet(dir), k = 5, exact = true),
      Retrieval.bm25TopK(corpus, q, k = 5, exact = true))
  }

  test("bm25IndexMerge: merged index equals a from-scratch rebuild") {
    // batch introduces a brand-new token ("alpha": old df 0) plus
    // overlaps ("spark", "table") whose df must bump on OLD rows too
    val batch = Seq((6L, "alpha spark"), (7L, "alpha table alpha"))
      .toDF("doc_id", "text")
    val merged = Retrieval.bm25IndexMerge(Retrieval.bm25Index(corpus), batch)
    val rebuilt = Retrieval.bm25Index(corpus.unionByName(batch))
    assertSameRows(merged, rebuilt)
  }

  test("bm25IndexMerge refuses doc-id collisions (append-only semantics)") {
    val clash = Seq((2L, "whatever text")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25IndexMerge(Retrieval.bm25Index(corpus), clash)
    }
    assert(e.getMessage.contains("append-only"))
  }

  test("search over a merged index matches search over the rebuilt one") {
    val batch = Seq((6L, "spark merge spark merge")).toDF("doc_id", "text")
    val q = Seq((1L, "spark merge")).toDF("query_id", "query_text")
    assertSameRows(
      Retrieval.bm25SearchWith(q,
        Retrieval.bm25IndexMerge(Retrieval.bm25Index(corpus), batch),
        k = 6, exact = true),
      Retrieval.bm25TopK(corpus.unionByName(batch), q, k = 6, exact = true))
  }

  test("bloom-gated merge: same result as the exact gate, catches covered " +
      "collisions, and the no-hit fast path really skips the index") {
    val idx = Retrieval.bm25Index(corpus).localCheckpoint()
    val bloomRow = Retrieval.bm25IndexBloom(idx, expectedItems = 100)
    val (bytes, _, _) = Retrieval.bm25BloomFrom(bloomRow)
    val batch = Seq((6L, "spark merge spark")).toDF("doc_id", "text")
    val q = Seq((1L, "spark merge")).toDF("query_id", "query_text")
    // bloom path == exact path on a clean append
    assertSameRows(
      Retrieval.bm25SearchWith(q,
        Retrieval.bm25IndexMerge(idx, batch, docIdBloom = Some(bytes)),
        k = 6, exact = true),
      Retrieval.bm25SearchWith(q, Retrieval.bm25IndexMerge(idx, batch),
        k = 6, exact = true))
    // a collision the bloom covers still refuses
    val clash = Seq((2L, "whatever")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25IndexMerge(idx, clash, docIdBloom = Some(bytes))
    }
    assert(e.getMessage.contains("append-only"))
    // the fast-path pin: a bloom that does NOT cover id 2 skips the
    // exact semi-join entirely — the collision sails through, which is
    // the documented trust contract (bloom must cover the index) and
    // the structural proof that no full-index distinct runs on a miss
    val partial = Retrieval.bm25IndexBloom(
      idx.filter(col("doc_id") =!= 2L), expectedItems = 100)
    val (partialBytes, _, _) = Retrieval.bm25BloomFrom(partial)
    Retrieval.bm25IndexMerge(idx, clash, docIdBloom = Some(partialBytes))
      .count() // no throw: the gate never consulted the index
    // bloom maintenance: after bm25BloomAdd folds a batch, re-merging
    // those same ids IS caught
    val grown = Retrieval.bm25BloomAdd(bloomRow, batch)
    val (grownBytes, _, _) = Retrieval.bm25BloomFrom(grown)
    val merged = Retrieval.bm25IndexMerge(idx, batch, docIdBloom = Some(bytes))
      .localCheckpoint()
    val e2 = intercept[IllegalArgumentException] {
      Retrieval.bm25IndexMerge(merged, batch, docIdBloom = Some(grownBytes))
    }
    assert(e2.getMessage.contains("append-only"))
  }

  test("rrfFuse: hand-computed scores, consensus beats single-source") {
    def s(r: Int): Long = Retrieval.Scale / (60 + r)
    val a = Seq((1L, 100L, 1), (1L, 101L, 2), (1L, 102L, 3))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 101L, 1), (1L, 103L, 2))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(_._1)
    // doc 101 appears in both (ranks 2 and 1) and must fuse to the top
    assert(got === Seq(
      (1, 101L, s(2) + s(1), 2L),
      (2, 100L, s(1), 1L),
      (3, 103L, s(2), 1L),
      (4, 102L, s(3), 1L)))
  }

  test("rrfFuse of a single ranking preserves its order") {
    val a = Seq((1L, 7L, 1), (1L, 9L, 2), (1L, 8L, 3))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a), k = 3)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(7L, 9L, 8L))
  }

  test("hybridTopK fuses the bm25 and cosine rank lists") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Seq(1.0f, 0.0f)), Row(2L, Seq(0.9f, 0.1f)),
        Row(3L, Seq(0.0f, 1.0f)), Row(4L, Seq(0.1f, 0.9f)),
        Row(5L, Seq(0.7f, 0.7f)))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val qText = Seq((1L, "spark merge")).toDF("query_id", "query_text")
    val qVec = emb.filter(col("vec_id") === 1L)
    val fused = Retrieval.hybridTopK(corpus, emb, qText, qVec, k = 5)
    // doc 2: lexical rank 2 (bm25: doc2 beats doc1 on length) AND
    // vector rank 1 (closest to probe 1) — consensus must win
    val top = fused.orderBy("rank").select("doc_id").as[Long].head()
    assert(top === 2L)
    val n = fused.filter(col("doc_id") === 2L)
      .select("n_sources").as[Long].head()
    assert(n === 2L)
  }

  test("hybridTopKWith over standing indexes equals hybridTopK when the " +
      "IVF-PQ index probes every cell") {
    import graft.llm.Similarity
    // 5 corpus vectors, dim 4 (m=2 → subdim 2); probe vectors are fresh
    // ids so nothing self-excludes asymmetrically between the paths
    val emb = Seq(
      (1L, Seq(1.0, 0.0, 0.2, 0.1)), (2L, Seq(0.9, 0.1, 0.2, 0.1)),
      (3L, Seq(0.0, 1.0, 0.1, 0.3)), (4L, Seq(0.1, 0.9, 0.4, 0.0)),
      (5L, Seq(0.7, 0.7, 0.1, 0.1))).toDF("vec_id", "embedding")
    val qText = Seq((100L, "spark merge"), (101L, "table window"))
      .toDF("query_id", "query_text")
    val qVec = Seq(
      (100L, Seq(0.95, 0.05, 0.2, 0.1)),
      (101L, Seq(0.05, 0.95, 0.2, 0.2))).toDF("vec_id", "embedding")
    val dir = tmpDir("hybrid_idx")
    Retrieval.bm25Index(corpus).write.parquet(s"$dir/bm25")
    val (cents, books, codes) = Similarity.ivfPqIndex(emb, nlist = 2, m = 2,
      ksub = 2)
    codes.write.parquet(s"$dir/codes")
    // nProbe = nlist and rerank ≥ corpus: every candidate is exact
    // re-ranked, so the indexed vector ranker IS brute force — the two
    // fusion paths must agree bit for bit, proving the index round-trip
    val got = Retrieval.hybridTopKWith(qText, qVec,
      spark.read.parquet(s"$dir/bm25"), cents, books,
      spark.read.parquet(s"$dir/codes"), emb,
      k = 5, kPerRanker = 3, nProbe = 2, rerank = 5)
    val want = Retrieval.hybridTopK(corpus, emb, qText, qVec, k = 5,
      kPerRanker = 3)
    assertSameRows(got, want)
  }

  test("phraseSearch: exact adjacency, overlap, repeats, and order all " +
      "behave — and the index round-trips through parquet") {
    val docs = Seq(
      (1L, "new york city new york"),       // "new york" ×2
      (2L, "york new"),                      // both tokens, wrong order
      (3L, "new new new"),                   // repeated-token phrase ×2
      (4L, "the new york times"),            // "new york" ×1 mid-doc
      (5L, "newyork")                        // one fused token — no match
    ).toDF("doc_id", "text")
    val q = Seq(
      (1L, "new york"), (2L, "new new"), (3L, "new york city"),
      (4L, "absent phrase"), (5L, "york")).toDF("query_id", "query_text")
    val got = Retrieval.phraseSearch(docs, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (1L, 1, 1L, 2L), (1L, 2, 4L, 1L),  // counts rank doc 1 first
      (2L, 1, 3L, 2L),                    // overlapping repeated-token hits
      (3L, 1, 1L, 1L),                    // three-word phrase, once
      (5L, 1, 1L, 2L), (5L, 2, 2L, 1L), (5L, 3, 4L, 1L))) // single-token
    // standing-index form equals the one-shot through a parquet round trip
    val dir = tmpDir("posidx")
    Retrieval.positionalIndex(docs).write.parquet(dir)
    assertSameRows(
      Retrieval.phraseSearchWith(q, spark.read.parquet(dir), k = 10),
      Retrieval.phraseSearch(docs, q, k = 10))
  }

  test("phraseSearch: the shuffled query path matches the broadcast path") {
    val docs = corpus
    val q = Seq((1L, "spark merge"), (2L, "table table"))
      .toDF("query_id", "query_text")
    assertSameRows(
      Retrieval.phraseSearch(docs, q, k = 5),
      Retrieval.phraseSearchWith(q, Retrieval.positionalIndex(docs), k = 5,
        maxBroadcastQueries = 0))
  }

  test("cascadeRerank: BM25 recalls, cosine reorders, and the cut stays " +
      "inside the recall set") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // lexically docs 1 and 2 both match "spark merge" (doc 2 shorter →
    // bm25 rank 1); the probe vector sits next to doc 1's embedding, so
    // the re-ranker must SWAP them. doc 5 matches lexically but has no
    // embedding — it must drop, not null-rank.
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Seq(1.0, 0.0)), Row(2L, Seq(0.0, 1.0)),
        Row(3L, Seq(0.5, 0.5)), Row(4L, Seq(0.3, 0.7)),
        Row(100L, Seq(0.9, 0.1)))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(DoubleType)))))
    val qText = Seq((100L, "spark merge")).toDF("query_id", "query_text")
    val qVec = emb.filter(col("vec_id") === 100L)
    val got = Retrieval.cascadeRerank(qText, qVec,
        Retrieval.bm25Index(corpus), emb, recallN = 5, k = 5)
      .orderBy("rank")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getInt(3)))
    // candidates with embeddings: docs 1, 2 (doc 5 matched bm25 but has
    // no vector). probe (0.9, 0.1) is closest to doc 1 (1, 0)
    assert(got.map(_._2).toSeq === Seq(1L, 2L),
      s"re-ranker must put doc 1 first: ${got.mkString(", ")}")
    assert(got.head._3 > got(1)._3,
      "bm25_rank must show the pre-rerank order (doc 2 was lexically first)")
  }

  test("query-term dedup: repeated terms in the query text score once") {
    val q1 = Seq((1L, "spark spark spark")).toDF("query_id", "query_text")
    val q2 = Seq((1L, "spark")).toDF("query_id", "query_text")
    assertSameRows(Retrieval.bm25TopK(corpus, q1, k = 5, exact = true),
      Retrieval.bm25TopK(corpus, q2, k = 5, exact = true))
  }
}
