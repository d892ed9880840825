package graft

import graft.llm.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cosine top-k (exact) + LSH ANN recall on the driver embeddings table. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queries: DataFrame = emb.filter($"vec_id" < 20)

  test("cosine of a vector with itself is 1") {
    val one = emb.limit(1)
      .select(Similarity.cosine(
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")))
      .as[Double].head()
    assert(math.abs(one - 1.0) < 1e-9)
  }

  test("bruteForceTopK: k rows per query, descending cos, no self-match") {
    val k = 10
    val out = Similarity.bruteForceTopK(emb, queries, k).cache()
    val counts = out.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.toSet === Set(k.toLong))
    assert(out.filter($"query_id" === $"neighbor_id").count() === 0)
    val ordered = out.filter($"query_id" === 0).orderBy("rank")
      .select("cos").as[Double].collect()
    assert(ordered.toSeq === ordered.sorted.reverse.toSeq)
  }

  test("annTopK recall beats the scanned fraction (LSH bits carry signal)") {
    // The driver embeddings are near-random (labels uncorrelated with
    // cosine neighborhoods — checked empirically), the hardest case for
    // LSH. Measured deterministic recalls on sf0.001, 20 queries:
    //   p=6 d=1 scans 10.9% → recall 0.21;  p=8 d=3 scans 36% → 0.575.
    val k = 10
    val bf = Similarity.bruteForceTopK(emb, queries, k)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(emb, queries, k, numPlanes = 8, probeDistance = 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(ann).size.toDouble / bf.size
    assert(recall >= 0.5, s"ANN recall $recall")
    val scannedFraction = (0 to 3).map(i =>
      (0 until 8).combinations(i).size).sum.toDouble / 256
    assert(recall > scannedFraction, s"recall $recall vs scanned $scannedFraction")
  }

  test("ivfTopK: planted exact copies rank their original first") {
    val base = emb.select("vec_id", "embedding")
    val planted = base.filter($"vec_id" < 20)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val corpus = base.unionByName(planted).localCheckpoint()
    val qs = corpus.filter($"vec_id" >= 10000)
    val top1 = Similarity.ivfTopK(corpus, qs, 10)
      .filter($"rank" === 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a copy computes the same argmax cell as its original → co-located
    assert(top1 === (0L until 20L).map(i => (i + 10000, i)).toSet)
  }

  test("ivfTopK recall beats hyperplane LSH at a comparable scan fraction") {
    val k = 10
    val bf = Similarity.bruteForceTopK(emb, queries, k)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, k, nlist = 16, nProbe = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    // nProbe/nlist = 1/4 of the corpus scanned; adaptive cells must do
    // better than proportional
    assert(recall > 0.25, s"IVF recall $recall not above scan fraction 0.25")
  }

  test("trainCentroids is deterministic and keeps empty cells alive") {
    val c1 = Similarity.trainCentroids(emb, nlist = 8, iters = 2)
    val c2 = Similarity.trainCentroids(emb, nlist = 8, iters = 2)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    assert(c1.length === 8 && c1.forall(_.nonEmpty))
  }

  test("ivfTopKWith on persisted centroids equals the train-inline path") {
    val cents = Similarity.trainCentroids(emb, nlist = 16, iters = 2)
    val reused = Similarity.ivfTopKWith(cents, emb, queries, 10, nProbe = 4)
    val inline = Similarity.ivfTopK(emb, queries, 10, nlist = 16, nProbe = 4)
    assertSameRows(reused, inline)
  }

  test("annTopK candidate join is bucket-keyed, not a cross join") {
    val ann = Similarity.annTopK(emb, queries, 10)
    assert(ann.count() > 0)
    val plan = ann.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"), plan.take(400))
  }

  test("embeddingNearDups finds planted near-identical vectors, no false positives") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // corpus + two planted near-duplicates of existing vectors
    val base = emb.limit(100).collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray))
    val dup1 = (9001L, base(3)._2.map(v => v * 1.0001f))
    val dup2 = (9002L, base(7)._2.clone())
    val rows = (base.toSeq :+ dup1 :+ dup2).map { case (id, v) => Row(id, v.toSeq) }
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val corpus = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4).toJavaRDD(), schema)
    val pairs = Similarity.embeddingNearDups(corpus, threshold = 0.999)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 9001L)), s"missed planted dup: $pairs")
    assert(pairs.contains((7L, 9002L)), s"missed exact dup: $pairs")
    // random 64-dim vectors never reach cos >= 0.999
    assert(pairs.size === 2, s"false positives: $pairs")
  }

  // ------------------------------------------------ semantic dedup

  private def vecsDf(rows: (Long, Array[Double])*): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, v) => Row(id, v.toSeq) }, 2).toJavaRDD(), schema)
  }

  test("semanticDedup: keep-the-outlier survivor, transitive groups, tie on min id") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val corpus = vecsDf(
      // cell 0 chain: cos(a,b)≈0.993, cos(b,c)≈0.993, cos(a,c)≈0.972 —
      // one transitive group of 3; c is farthest from the centroid
      1L -> Array(1.0, 0.0),   // cent_cos 1.0
      2L -> Array(1.0, 0.12),  // cent_cos ≈0.993
      3L -> Array(1.0, 0.24),  // cent_cos ≈0.972 → survivor
      // cell 1: identical pair ties on cent_cos → min id survives
      10L -> Array(0.0, 1.0),
      11L -> Array(0.0, 1.0),
      // cell 1 singleton (negative cosine to both centroids)
      12L -> Array(-1.0, -0.5))
    val out = Similarity.semanticDedupWith(cents, corpus, threshold = 0.99)
      .as[(Long, Long)].collect().toSet
    assert(out === Set((3L, 3L), (10L, 2L), (12L, 1L)),
      s"unexpected survivors: $out")
  }

  test("semanticDedup compares only WITHIN a cell (SemDeDup scoping)") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // cos(d,e) ≈ 0.9993 ≥ threshold, but d lands in cell 0 and e in
    // cell 1 — SemDeDup never compares across cells, so both survive
    val corpus = vecsDf(
      4L -> Array(0.72, 0.694),
      5L -> Array(0.694, 0.72))
    val out = Similarity.semanticDedupWith(cents, corpus, threshold = 0.99)
      .as[(Long, Long)].collect().toSet
    assert(out === Set((4L, 1L), (5L, 1L)), s"cross-cell merge: $out")
  }

  test("semanticDedup end-to-end with trained quantizer: planted copies lose, originals keep") {
    val base = emb.select("vec_id", "embedding")
    val planted = base.filter($"vec_id" < 5)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val corpus = base.unionByName(planted)
    val natural = base.count()
    val out = Similarity.semanticDedup(corpus, threshold = 0.9, nlist = 8)
      .cache()
    assert(out.count() === natural, "every natural vector must survive")
    assert(out.filter($"vec_id" >= 10000).count() === 0, "a copy survived")
    assert(out.filter($"group_size" === 2).count() === 5)
    assert(out.filter($"group_size" === 1).count() === natural - 5)
  }

  test("semanticDedupBatch: corpus member wins cross-epoch, outlier rule within batch") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val corpus = vecsDf(
      1L -> Array(1.0, 0.0),
      2L -> Array(0.0, 1.0))
    val index = Similarity.buildSemanticIndex(cents, corpus)
    val batch = vecsDf(
      // exact copy of corpus vector 1 → dropped (corpus wins)
      20L -> Array(1.0, 0.0),
      // near-dup of corpus vector 2 (cos ≈ 0.993) → dropped
      21L -> Array(0.12, 1.0),
      // within-batch pair in cell 0, no corpus match (cos to corpus
      // v1 ≈ 0.81 < 0.99): outlier (farther from centroid) survives
      30L -> Array(1.0, 0.7),
      31L -> Array(1.0, 0.82),
      // genuinely new singleton
      40L -> Array(-1.0, -0.5))
    val out = Similarity.semanticDedupBatch(cents, batch, index, threshold = 0.99)
      .as[(Long, Long)].collect().toSet
    assert(out === Set((31L, 2L), (40L, 1L)), s"unexpected batch survivors: $out")
  }

  test("autoNlist keeps the mean cell at targetCellSize as the corpus grows") {
    // floor: tiny corpora still train a 16-cell quantizer
    assert(Similarity.autoNlist(100, 1024) === 16)
    assert(Similarity.autoNlist(16 * 1024, 1024) === 16)
    // scaling region: nlist tracks ⌈n / target⌉, so a 10× corpus gets
    // 10× the cells and the MEAN cell size stays put — the Σ|cell|²
    // bound no longer depends on the caller re-sizing by hand
    assert(Similarity.autoNlist(100 * 1024, 1024) === 100)
    assert(Similarity.autoNlist(1000 * 1024, 1024) === 1000)
    assert(Similarity.autoNlist(100 * 1024 + 1, 1024) === 101, "ceil, not floor")
    // honest cap of the flat (driver-collected) quantizer
    assert(Similarity.autoNlist(1L << 40, 1024) === (1 << 16))
  }

  test("semanticDedup auto-sizes its quantizer when nlist is omitted") {
    val base = emb.select("vec_id", "embedding")
    val planted = base.filter($"vec_id" < 5)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val corpus = base.unionByName(planted)
    // auto path (nlist = 0): counts the corpus, sizes the quantizer,
    // and still finds exactly the planted duplicate groups
    val out = Similarity.semanticDedup(corpus, threshold = 0.9,
      targetCellSize = 8).cache()
    assert(out.count() === base.count())
    assert(out.filter($"vec_id" >= 10000).count() === 0)
    assert(out.filter($"group_size" === 2).count() === 5)
  }

  test("pqTopK: shape, determinism, and planted copies find their originals") {
    val planted = emb.filter($"vec_id" < 10)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val corpus = emb.select("vec_id", "embedding")
      .unionByName(planted).localCheckpoint()
    val qs = corpus.filter($"vec_id" >= 10000)
    val got = Similarity.pqTopK(corpus, qs, k = 5).cache()
    // shape: 5 ranks per query, cos descending, no self-matches
    assert(got.count() === 50)
    assert(got.filter($"query_id" === $"neighbor_id").count() === 0)
    // a planted exact copy must surface its original at rank 1 (the ADC
    // candidates re-rank by exact cosine, and cos(copy, original) = 1)
    val top1 = got.filter($"rank" === 1)
      .select($"query_id", $"neighbor_id").collect()
    top1.foreach(r => assert(r.getLong(1) === r.getLong(0) - 10000,
      s"planted query ${r.getLong(0)} ranked ${r.getLong(1)} first"))
    // deterministic under repartitioning (codebooks are seed-free)
    val again = Similarity.pqTopK(corpus.repartition(9), qs, k = 5)
    assertSameRows(got.select("query_id", "rank", "neighbor_id"),
      again.select("query_id", "rank", "neighbor_id"))
  }

  test("pqTopKWith on persisted codes equals the one-shot path; recall beats floor") {
    val corpus = emb.localCheckpoint()
    val qs = emb.filter($"vec_id" < 20)
    val books = Similarity.pqTrain(corpus, m = 8, ksub = 16)
    val codesPath = java.nio.file.Files
      .createTempDirectory("graft_pq").toString + "/codes"
    Similarity.pqEncode(corpus, books).write.parquet(codesPath)
    val viaDisk = Similarity.pqTopKWith(books,
      spark.read.parquet(codesPath), corpus, qs, k = 10)
    assertSameRows(viaDisk.select("query_id", "rank", "neighbor_id"),
      Similarity.pqTopK(corpus, qs, k = 10)
        .select("query_id", "rank", "neighbor_id"))
    // exact re-rank of 64 ADC candidates: recall@10 well above random
    val bf = Similarity.bruteForceTopK(corpus, qs, 10)
    val hits = viaDisk.select("query_id", "neighbor_id")
      .intersect(bf.select("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / bf.count()
    assert(recall >= 0.5, f"PQ recall@10 $recall%.3f below 0.5")
  }

  test("centroids and codebooks round-trip through their persistable tables") {
    val corpus = emb.localCheckpoint()
    val cents = Similarity.trainCentroids(corpus, nlist = 8)
    val books = Similarity.pqTrain(corpus, m = 8, ksub = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    Similarity.centroidsTable(spark, cents).write.parquet(s"$dir/c")
    Similarity.pqBooksTable(spark, books).write.parquet(s"$dir/b")
    val c2 = Similarity.centroidsFrom(spark.read.parquet(s"$dir/c"))
    val b2 = Similarity.pqBooksFrom(spark.read.parquet(s"$dir/b"))
    assert(c2.length === cents.length)
    assert(cents.zip(c2).forall { case (a, b) => a.sameElements(b) },
      "centroid round-trip changed values or cell order")
    assert(b2.length === books.length && b2(0).length === books(0).length)
    assert(books.flatten[Array[Double]].zip(b2.flatten[Array[Double]])
      .forall { case (a, b) => a.sameElements(b) },
      "codebook round-trip changed values or (m, code) order")
  }

  test("ivfPqAppend encodes a new epoch exactly as the index build would") {
    val corpus = emb.filter($"vec_id" % 2 === 0).localCheckpoint()
    val (cents, books, _) = Similarity.ivfPqIndex(corpus, nlist = 8, m = 8, ksub = 16)
    val batch = emb.filter($"vec_id" % 2 === 1).localCheckpoint()
    val appended = Similarity.ivfPqAppend(cents, books, batch)
    assert(appended.columns.sorted.toSeq === Seq("cell", "pq_codes", "vec_id"))
    assert(appended.count() === batch.count())
    // an exact copy of an indexed vector must get its original's cell+codes
    val copies = corpus.limit(5)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val copyCodes = Similarity.ivfPqAppend(cents, books, copies)
      .select(($"vec_id" - 10000).as("vec_id"), $"pq_codes", $"cell")
    val origCodes = Similarity.ivfPqAppend(cents, books, corpus.limit(5))
    assertSameRows(copyCodes, origCodes)
  }

  test("pqReconstructionError: zero when the corpus IS the codebook, detects corruption") {
    // ksub >= distinct vectors and init-from-smallest-ids => every vector
    // is its own sub-centroid after round 0; error must be ~0
    val tiny = emb.orderBy("vec_id").limit(8).localCheckpoint()
    val books = Similarity.pqTrain(tiny, m = 8, ksub = 8, iters = 1)
    val e0 = Similarity.pqReconstructionError(books, tiny)
    assert(e0 < 1e-12, s"self-codebook reconstruction error $e0 should be ~0")
    // corrupting the codebooks must raise the drift signal
    val bad = books.map(_.map(_.map(_ + 10.0)))
    assert(Similarity.pqReconstructionError(bad, tiny) > 1.0)
  }

  test("ivfPqTopKWith: probe-all equals plain PQ; pruning keeps recall; copies found") {
    val planted = emb.filter($"vec_id" < 10)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val corpus = emb.select("vec_id", "embedding")
      .unionByName(planted).localCheckpoint()
    val qs = corpus.filter($"vec_id" >= 10000)
    val (cents, books, codes0) = Similarity.ivfPqIndex(corpus,
      nlist = 8, m = 8, ksub = 16)
    val codes = codes0.localCheckpoint()
    // probing EVERY cell must reduce exactly to the unpruned PQ search
    val all = Similarity.ivfPqTopKWith(cents, books, codes, corpus, qs,
      k = 5, nProbe = 8)
    val pq = Similarity.pqTopKWith(books, codes.drop("cell"), corpus, qs, k = 5)
    assertSameRows(all.select("query_id", "rank", "neighbor_id"),
      pq.select("query_id", "rank", "neighbor_id"))
    // pruned probing: planted copies still surface their original at 1
    // (a copy's first probe IS its original's cell)
    val pruned = Similarity.ivfPqTopKWith(cents, books, codes, corpus, qs,
      k = 5, nProbe = 2).cache()
    pruned.filter($"rank" === 1)
      .select($"query_id", $"neighbor_id").collect()
      .foreach(r => assert(r.getLong(1) === r.getLong(0) - 10000,
        s"planted query ${r.getLong(0)} ranked ${r.getLong(1)} first"))
    // recall vs brute force stays useful at a quarter of the scan
    val bf = Similarity.bruteForceTopK(corpus, qs, 5)
    val hits = pruned.select("query_id", "neighbor_id")
      .intersect(bf.select("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / bf.count()
    assert(recall >= 0.25, f"IVF-PQ recall@5 $recall%.3f below 0.25")
  }

  test("sq8: encode is dim bytes, decode error bounded by half a step") {
    val (mins, maxs) = Similarity.sq8Train(emb)
    val dim = mins.length
    val codes = Similarity.sq8Encode(emb, mins, maxs)
    val row = codes.join(emb, "vec_id").limit(50)
      .select($"sq8_code", $"embedding".cast("array<double>"))
      .as[(Array[Byte], Seq[Double])].collect()
    row.foreach { case (code, v) =>
      assert(code.length == dim)
      v.indices.foreach { i =>
        val scale = (maxs(i) - mins(i)) / 255.0
        val decoded = mins(i) + (code(i) + 128) * scale
        assert(math.abs(decoded - v(i)) <= scale / 2 + 1e-12,
          s"dim $i decode error exceeds half a quantization step")
      }
    }
  }

  test("sq8TopK: planted copies rank first; recall beats PQ's floor") {
    val base = emb.select($"vec_id", $"embedding")
    val planted = base.filter($"vec_id" < 10)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val corpus = base.unionByName(planted).localCheckpoint()
    val qs = corpus.filter($"vec_id" >= 10000)
    val got = Similarity.sq8TopK(corpus, qs, 10).cache()
    assert(got.filter($"rank" === 1)
      .filter($"neighbor_id" =!= $"query_id" - 10000).count() == 0,
      "a planted exact copy did not rank its original first")
    val bf = Similarity.bruteForceTopK(corpus, qs, 10)
    val hits = got.select("query_id", "neighbor_id")
      .intersect(bf.select("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / bf.count()
    assert(recall >= 0.6, f"SQ8 recall@10 $recall%.3f below 0.6 — byte " +
      "resolution on every dim should beat PQ's sub-code compression here")
  }

  test("sq8 ranges round-trip through the persistable table") {
    val (mins, maxs) = Similarity.sq8Train(emb)
    val (m2, x2) = Similarity.sq8RangesFrom(
      Similarity.sq8RangesTable(spark, mins, maxs))
    assert(m2.toSeq == mins.toSeq && x2.toSeq == maxs.toSeq)
  }
}
