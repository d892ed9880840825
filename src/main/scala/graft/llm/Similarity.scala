package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Two paths:
 *  - [[bruteForceTopK]]: exact cosine top-k — the query side broadcasts
 *    while it fits the size gate (corpus scanned once, no shuffle except
 *    the final per-query top-k), and degrades to a distributed
 *    nested-loop past it. The correctness baseline and the right tool
 *    when |queries| is small.
 *  - [[annTopK]]: random-hyperplane LSH. Corpus vectors land in one
 *    sign-bit bucket; queries probe their own bucket plus all buckets at
 *    hamming distance 1 (multi-probe), so the join touches
 *    (numPlanes+1)/2^numPlanes of the corpus per query instead of all of
 *    it — the scale path for large query sets.
 *
 * All math is built-in expressions (`zip_with` dot products) — codegen'd,
 * no UDFs, columnar-scan friendly.
 */
object Similarity {

  /** Dot product of two numeric array columns (expression form — fine for
    * one-off scalar uses; the hot paths below use the UDF variants). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /**
   * Cosine similarity as one tight per-row JVM loop. Deliberately a UDF:
   * the `aggregate(zip_with(...))` formulation evaluates interpreted with
   * per-element boxing — measured ~8× slower on 64-dim vectors at sf0.1.
   * A fully codegen'd native Catalyst expression of the same computation
   * exists as [[graft.expressions.CosineSimilarity]] (`graft_cosine` after
   * `CosineSimilarity.register(spark)`), which additionally avoids the
   * UDF's serialization boundary — the operators below use it via
   * [[nativeCosine]]; this Column-only variant keeps the session-free API.
   */
  def cosine(a: Column, b: Column): Column = cosUdf(a, b)

  /** Codegen'd cosine for the operator hot paths: registers the native
    * expression on the frame's session and calls it by name. */
  private[llm] def nativeCosine(session: org.apache.spark.sql.SparkSession,
                           a: Column, b: Column): Column = {
    graft.expressions.CosineSimilarity.register(session)
    call_function("graft_cosine", a, b)
  }

  private val cosUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
    // null/ragged-safe: null in → null out; length mismatch → common prefix
    if (a == null || b == null) null
    else {
      val n = math.min(a.length, b.length)
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      java.lang.Double.valueOf(d / math.sqrt(na * nb))
    }
  }

  /** Size gate shared by every query-side entry point in this family:
    * `true` iff `df` has at most `cap` rows, probed with a
    * `limit(cap+1).count()` — the limit short-circuits the scan, so the
    * probe costs O(cap) rows regardless of the frame's true size, and
    * never materializes anything on the driver.
    *
    * DETERMINISM CONTRACT: the probe executes the query frame once and
    * the entry point's join executes it again, so the frame must yield
    * the same rows on re-execution. Every stable source (tables,
    * parquet, a checkpointed frame) satisfies this; a nondeterministic
    * frame (`.sample` without a seed, an unordered `.limit` over a
    * shuffle, `rand()`) could legally change rows between the probe and
    * the join — gate decision and results would be internally
    * consistent per execution but not with each other. Callers holding
    * such a frame should `localCheckpoint()` it first (which also
    * pins the rows the answer is FOR — the right call regardless of
    * this gate). */
  /** Collect `df` if it holds at most `cap` rows, in ONE job — the
    * fused form of the `fitsDriver(df, cap)` + `df.collect()` pair the
    * skipping-read serving paths used to pay two jobs for. None past
    * the cap (the caller's full-scan regime). */
  private[graft] def collectUpTo(df: DataFrame, cap: Int)
      : Option[Array[org.apache.spark.sql.Row]] = {
    if (cap <= 0) return None
    val rows = df.limit(cap + 1).collect()
    if (rows.length <= cap) Some(rows) else None
  }

  private[graft] def fitsDriver(df: DataFrame, cap: Int): Boolean =
    cap > 0 && {
      // literal query batches (Seq(...).toDF and anything the optimizer
      // folds to a LocalRelation) answer from the plan alone — the
      // serving paths call this gate on every search, and a Spark job
      // per gate is pure driver latency for a frame whose size is
      // already known on the driver
      df.queryExecution.optimizedPlan match {
        case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          lr.data.lengthCompare(cap) <= 0
        case _ => df.limit(cap + 1).count() <= cap
      }
    }

  /**
   * Exact top-k neighbors per query; output: (query_id, rank,
   * neighbor_id, cos). Self-matches (same id) are excluded.
   *
   * Query-batch scale: up to `maxBroadcastQueries` rows the query side
   * is broadcast-hinted (one corpus scan, no shuffle before the
   * per-query top-k — the right plan for probe-sized batches); past
   * the gate the hint is DROPPED and the join runs as a distributed
   * nested-loop/cartesian — no driver-sized assumption anywhere, at
   * the honest O(|corpus|·|queries|) cost brute force IS at that
   * scale (use the IVF/PQ family when that cost is wrong).
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     maxBroadcastQueries: Int = 65536): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cvec"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qvec"))
    val qSide = if (fitsDriver(queries, maxBroadcastQueries)) broadcast(q) else q
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(qSide, col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", nativeCosine(corpus.sparkSession, col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Deterministic random hyperplanes (seeded) as literal arrays. */
  private def planes(numPlanes: Int, dim: Int): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket id of a vector under the hyperplane set — one pass
    * over the vector per plane, single JVM call per row. */
  private def bucketExpr(vec: Column, ps: Seq[Array[Double]]): Column = {
    val f = udf { (v: Seq[Double]) =>
      var bucket = 0
      var p = 0
      while (p < ps.length) {
        val plane = ps(p)
        var d = 0.0; var i = 0
        while (i < plane.length && i < v.length) { d += v(i) * plane(i); i += 1 }
        if (d > 0) bucket |= (1 << p)
        p += 1
      }
      bucket
    }
    f(vec)
  }

  /**
   * Approximate top-k via LSH buckets + multi-probe: the query probes its
   * own bucket plus every bucket within hamming distance `probeDistance`
   * of it. Output shape matches [[bruteForceTopK]].
   *
   * Tuning: with `numPlanes=p` and `probeDistance=d` a query examines
   * Σ_{i≤d} C(p,i) of the 2^p buckets. Hyperplane bits correlate with
   * cosine, so recall beats the scanned fraction — but on *unclustered*
   * (near-random) corpora the gap is modest; pick (p, d) for the
   * recall/cost point the workload needs (SimilaritySpec measures one).
   */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              numPlanes: Int = 6, probeDistance: Int = 1,
              dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ps = planes(numPlanes, dim)
    val masks = (0 until (1 << numPlanes))
      .filter(m => Integer.bitCount(m) <= probeDistance)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cvec"))
      .withColumn("bucket", bucketExpr(col("cvec"), ps))
    val probeBuckets = (b: Column) =>
      array(masks.map(m => b.bitwiseXOR(lit(m))): _*)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qvec"))
      .withColumn("bucket",
        explode(probeBuckets(bucketExpr(col("qvec"), ps))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", nativeCosine(corpus.sparkSession, col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  // ------------------------------------------------------------ IVF

  /** Argmax-cosine cell id of a vector against the broadcast centroid
    * table — one tight JVM loop per row (nlist × dim mults). */
  private def nearestCellUdf(cents: Array[Array[Double]]) = udf { (v: Seq[Double]) =>
    var best = 0; var bestCos = Double.MinValue
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var d = 0.0; var nv = 0.0; var nc = 0.0; var i = 0
      while (i < ct.length && i < v.length) {
        d += v(i) * ct(i); nv += v(i) * v(i); nc += ct(i) * ct(i); i += 1
      }
      val cos = if (nv == 0 || nc == 0) -2.0 else d / math.sqrt(nv * nc)
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    best
  }

  /** The union of probed cells across a DRIVER-REGIME query batch —
    * `Some(cells)` when `queries` fits the gate (the same
    * deterministic [[fitsDriver]] probe [[ivfPqTopKWith]] applies, so
    * the two decisions always agree), `None` past it (a corpus-scale
    * query batch's cell set must not become driver state). Serving
    * paths use the union for a SKIPPING read of the codes table
    * (`cell IN (...)` prunes whole dirs from commit-log stats once
    * the codes are bucket-clustered by cell); [[ivfPqTopKWith]]'s own
    * per-query probe map then re-filters inside the survivors, so
    * results are identical to the unpruned scan. */
  def probeCellUnion(cents: Array[Array[Double]], queries: DataFrame,
                     nProbe: Int, maxDriverQueries: Int = 4096,
                     vecCol: String = "embedding"): Option[Seq[Int]] =
    if (!fitsDriver(queries, maxDriverQueries)) None
    else Some(queries
      .select(explode(probeCellsUdf(cents, nProbe)(
        col(vecCol).cast("array<double>"))).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted)

  /** The distinct nearest-cell assignments of a batch — at most
    * `cents.length` values whatever the batch size (the domain is the
    * cell ids), so collecting it is safe at ANY scale, with no driver
    * gate: the distinct runs distributed and only ≤ nlist ints reach
    * the driver. Serving/dedup paths use it for a skipping read of a
    * cell-keyed index (`cell IN (...)`); the downstream cell equi-join
    * re-filters inside the survivors, so results are identical. */
  def assignedCellUnion(cents: Array[Array[Double]], batch: DataFrame,
                        vecCol: String = "embedding"): Seq[Int] =
    batch.select(nearestCellUdf(cents)(
        col(vecCol).cast("array<double>")).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted

  /** The `nProbe` nearest cells of a vector, nearest first. */
  private def probeCellsUdf(cents: Array[Array[Double]], nProbe: Int) =
    udf { (v: Seq[Double]) =>
      cents.indices.map { c =>
        val ct = cents(c)
        var d = 0.0; var nv = 0.0; var nc = 0.0; var i = 0
        while (i < ct.length && i < v.length) {
          d += v(i) * ct(i); nv += v(i) * v(i); nc += ct(i) * ct(i); i += 1
        }
        (if (nv == 0 || nc == 0) -2.0 else d / math.sqrt(nv * nc), c)
      }.sortBy { case (cos, c) => (-cos, c) }.take(nProbe).map(_._2)
    }

  /**
   * Deterministic spherical-k-means-lite coarse quantizer: centroids
   * initialize from the `nlist` smallest-id corpus vectors and refine
   * with `iters` Lloyd rounds. Each round is ONE distributed pass —
   * assign (broadcast centroids, per-row loop) then per-dimension mean
   * via posexplode + groupBy(cell, pos) — and collects only
   * nlist × dim aggregates to the driver. Cells that lose all members
   * keep their previous centroid. Fixed seed-free construction: the same
   * corpus always trains the same quantizer (resumable pipelines can
   * persist and reuse it).
   */
  def trainCentroids(corpus: DataFrame, nlist: Int, iters: Int = 2,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): Array[Array[Double]] = {
    require(nlist >= 1, "nlist must be >= 1")
    val base = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    var cents: Array[Array[Double]] = base.orderBy(col("id")).limit(nlist)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(cents.nonEmpty, "empty corpus: cannot train an IVF quantizer")
    (0 until iters).foreach { _ =>
      val means = base
        .withColumn("cell", nearestCellUdf(cents)(col("v")))
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      cents = next
    }
    cents
  }

  /**
   * IVF (inverted-file) approximate top-k — the coarse-quantizer scale
   * path next to hyperplane LSH ([[annTopK]]): corpus vectors land in
   * their argmax-cosine centroid cell; each query probes its `nProbe`
   * nearest cells, so the join touches ≈ nProbe/nlist of the corpus per
   * query, and unlike hyperplane buckets the cells ADAPT to the data's
   * cluster structure (k-means training). Exact cosine + per-query top-k
   * on the probed candidates only. Output shape matches
   * [[bruteForceTopK]]: (query_id, rank, neighbor_id, cos).
   *
   * A query identical to a corpus vector always lands in that vector's
   * own cell (same computation, same argmax), so exact matches are found
   * with probability 1 — the property the planted oracle checks.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              nlist: Int = 16, nProbe: Int = 4,
              trainIters: Int = 2): DataFrame =
    ivfTopKWith(trainCentroids(corpus, nlist, trainIters, idCol, vecCol),
      corpus, queries, k, idCol, vecCol, nProbe)

  /**
   * IVF top-k against a PRE-TRAINED quantizer — the amortized-cost entry
   * point: train once per corpus generation ([[trainCentroids]] is
   * deterministic, so the centroid array is persistable and
   * re-derivable), then serve every query batch without re-running
   * Lloyd rounds. At 100 TB the training passes dominate a single query
   * batch's cost; a daily pipeline should hold centroids fixed between
   * re-clusters exactly like any vector-index build.
   */
  def ivfTopKWith(cents: Array[Array[Double]],
                  corpus: DataFrame, queries: DataFrame, k: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cents.nonEmpty, "ivfTopKWith needs a non-empty centroid set")
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cvec"))
      .withColumn("cell", nearestCellUdf(cents)(col("cvec")))
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qvec"))
      .withColumn("cell", explode(probeCellsUdf(cents, nProbe)(col("qvec"))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(q, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", nativeCosine(corpus.sparkSession, col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Argmax cell id AND the cosine to that winning centroid in one pass
    * over the vector — [[nearestCellUdf]] already computes both, this
    * variant just keeps the cosine instead of dropping it. */
  private def cellAndCosUdf(cents: Array[Array[Double]]) = udf { (v: Seq[Double]) =>
    var best = 0; var bestCos = Double.MinValue
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var d = 0.0; var nv = 0.0; var nc = 0.0; var i = 0
      while (i < ct.length && i < v.length) {
        d += v(i) * ct(i); nv += v(i) * v(i); nc += ct(i) * ct(i); i += 1
      }
      val cos = if (nv == 0 || nc == 0) -2.0 else d / math.sqrt(nv * nc)
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    (best, bestCos)
  }

  /**
   * SemDeDup-style semantic deduplication (Abbas et al. 2023,
   * arXiv:2303.09540): k-means-cluster the embedding space with the
   * [[trainCentroids]] coarse quantizer, compare pairs only WITHIN a
   * cluster cell, connect the `cosine >= threshold` pairs into duplicate
   * groups, and keep ONE survivor per group — the member with the LOWEST
   * cosine to its cell centroid (the paper's keep-the-outlier rule, §2:
   * low-similarity-to-centroid examples preserve diversity), ties broken
   * by smallest id. Output: one row per surviving vector,
   * (idCol, group_size) with group_size = 1 for vectors in no duplicate
   * pair.
   *
   * 100 TB shape: candidate volume is Σ_cell |cell|² — bounded by the
   * quantizer's balance, never corpus². With `nlist = 0` (the default)
   * the quantizer is SIZED FROM THE CORPUS: one count() and
   * [[autoNlist]] pick `max(16, ⌈N/targetCellSize⌉)` cells, so the
   * mean cell stays at `targetCellSize` no matter how the corpus
   * grows, instead of depending on the caller knowing to scale a
   * hand-picked nlist; the within-cell self-join is a plain equi-join
   * on `cell`, so AQE
   * skew-split handles hot cells; grouping is the O(log n)
   * star-contraction CC ([[graft.llm.Dedup.connectedComponents]]); cell
   * assignment is computed once and reused by both join sides and the
   * survivor pick (localCheckpoint). An exact copy always lands in its
   * original's cell (identical vector ⇒ identical argmax), so exact
   * duplicates are found with probability 1 — the property the planted
   * oracle checks.
   */
  def semanticDedup(corpus: DataFrame, threshold: Double,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    nlist: Int = 0, trainIters: Int = 2,
                    targetCellSize: Long = 1024): DataFrame = {
    val nl =
      if (nlist > 0) nlist
      else autoNlist(corpus.count(), targetCellSize)
    semanticDedupWith(trainCentroids(corpus, nl, trainIters, idCol, vecCol),
      corpus, threshold, idCol, vecCol)
  }

  /** Quantizer sizing for [[semanticDedup]]'s auto mode (`nlist = 0`):
    * `max(16, ⌈n / targetCellSize⌉)`, capped at 2^16 cells. The cap is
    * the flat quantizer's honest limit — centroids are collected to and
    * broadcast from the driver (nlist × dim doubles; 2^16 × 1k dims ≈
    * 0.5 GB is the ceiling of reasonable), so beyond ~2^16 ×
    * targetCellSize vectors the MEAN cell grows past target and
    * Σ|cell|² with it: at that scale pass `nlist` explicitly and
    * train a sampled / hierarchical quantizer instead. Keeping the
    * formula a visible function makes the bound testable without
    * training anything. */
  private[graft] def autoNlist(n: Long, targetCellSize: Long,
                               maxNlist: Int = 1 << 16): Int = {
    require(targetCellSize > 0, s"targetCellSize must be positive, got $targetCellSize")
    val want = (n + targetCellSize - 1) / targetCellSize
    math.min(maxNlist.toLong, math.max(16L, want)).toInt
  }

  /** [[semanticDedup]] against a PRE-TRAINED quantizer — like
    * [[ivfTopKWith]], the amortized entry point: train once per corpus
    * generation, dedup every batch against the same fixed cells. */
  def semanticDedupWith(cents: Array[Array[Double]],
                        corpus: DataFrame, threshold: Double,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cents.nonEmpty, "semanticDedupWith needs a non-empty centroid set")
    require(threshold > 0 && threshold <= 1,
      s"cosine threshold must be in (0, 1], got $threshold")
    val assigned = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("cc", cellAndCosUdf(cents)(col("v")))
      .select(col("id"), col("v"),
        col("cc._1").as("cell"), col("cc._2").as("cent_cos"))
      .localCheckpoint()
    val pairs = assigned.select(col("id").as("id1"), col("v").as("v1"), col("cell"))
      .join(assigned.select(col("id").as("id2"), col("v").as("v2"), col("cell")),
        Seq("cell"))
      .filter(col("id1") < col("id2"))
      .filter(nativeCosine(corpus.sparkSession, col("v1"), col("v2")) >= threshold)
      .select("id1", "id2")
    val comps = graft.llm.Dedup.connectedComponents(pairs) // (id, component)
    val sized = comps.groupBy("component").agg(count(lit(1)).as("group_size"))
    val w = Window.partitionBy("component")
      .orderBy(col("cent_cos").asc, col("id").asc)
    val survivors = comps.join(assigned.select("id", "cent_cos"), "id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(sized, "component")
      .select(col("id").as(idCol), col("group_size"))
    val singletons = assigned.select(col("id"))
      .join(comps.select("id"), Seq("id"), "left_anti")
      .select(col("id").as(idCol), lit(1L).as("group_size"))
    survivors.unionByName(singletons)
  }

  /**
   * The persistable standing index for INCREMENTAL semantic dedup: the
   * (surviving) corpus with each vector's quantizer cell and centroid
   * cosine attached — `(idCol, vecCol, cell, cent_cos)`. Build it once
   * per corpus generation (same amortization contract as
   * [[Dedup.buildNearDupIndex]]: persist as parquet next to the
   * centroid array), then score every daily batch with
   * [[semanticDedupBatch]] at O(batch) cost — the corpus is never
   * re-assigned or re-scanned beyond the cell-keyed join.
   */
  def buildSemanticIndex(cents: Array[Array[Double]], corpus: DataFrame,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    require(cents.nonEmpty, "buildSemanticIndex needs a non-empty centroid set")
    corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
      .withColumn("__cc__", cellAndCosUdf(cents)(col(vecCol)))
      .select(col(idCol), col(vecCol),
        col("__cc__._1").as("cell"), col("__cc__._2").as("cent_cos"))
  }

  /**
   * Incremental (two-epoch) semantic dedup — the daily-ingest action
   * mirroring [[Dedup.dedupNewBatch]]: from a NEW batch of vectors,
   * keep exactly what is safe to append to a standing corpus. A batch
   * vector is dropped when it has a `cosine >= threshold` match in its
   * cell against the corpus index (the corpus member always wins —
   * epochs are ordered); the remainder is deduped WITHIN the batch by
   * the full [[semanticDedupWith]] rule (keep-the-outlier survivor,
   * min-id tie). Output matches [[semanticDedup]]: one row per
   * surviving batch vector, `(idCol, group_size)` over the
   * within-batch groups.
   *
   * Cost per day is O(batch): the batch is cell-assigned (twice — once
   * for the corpus probe, once inside the batch-internal pass; both
   * are narrow single-pass UDF projections), the corpus side
   * contributes only the cell-keyed equi-join against its PRE-BUILT
   * index, and no corpus×corpus candidate ever forms — re-running the
   * batch operator over corpus+batch would redo quadratic-in-history
   * work, exactly the trap [[Dedup.incrementalNearDupPairs]] documents.
   * An exact copy of a corpus vector lands in its original's cell with
   * probability 1 (identical argmax), so cross-epoch exact duplicates
   * are always caught — the property the planted oracle checks.
   */
  def semanticDedupBatch(cents: Array[Array[Double]], batch: DataFrame,
                         corpusIndex: DataFrame, threshold: Double,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    require(cents.nonEmpty, "semanticDedupBatch needs a non-empty centroid set")
    require(threshold > 0 && threshold <= 1,
      s"cosine threshold must be in (0, 1], got $threshold")
    val b = batch
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("cell", nearestCellUdf(cents)(col("v")))
    val dupOfCorpus = b
      .join(corpusIndex.select(col(vecCol).cast("array<double>").as("cv"),
        col("cell")), Seq("cell"))
      .filter(nativeCosine(batch.sparkSession, col("v"), col("cv")) >= threshold)
      .select(col("id").as(idCol)).distinct()
    val kept = batch.join(dupOfCorpus, Seq(idCol), "left_anti")
    semanticDedupWith(cents, kept, threshold, idCol, vecCol)
  }

  /**
   * Embedding-cosine near-duplicate pairs: corpus self-join restricted to
   * shared LSH buckets (probing the corpus side's exact bucket plus the
   * query side's hamming-`probeDistance` neighborhood), then the exact
   * cosine filter. No all-pairs comparison; candidate volume scales with
   * bucket occupancy, not corpus². High thresholds (near-identical
   * vectors) get near-perfect recall because near-identical vectors agree
   * on almost every hyperplane sign.
   */
  def embeddingNearDups(corpus: DataFrame, threshold: Double,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        numPlanes: Int = 8, probeDistance: Int = 2,
                        dim: Int = 64): DataFrame = {
    val ps = planes(numPlanes, dim)
    val masks = (0 until (1 << numPlanes))
      .filter(m => Integer.bitCount(m) <= probeDistance)
    val base = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket0", bucketExpr(col("v"), ps))
      .localCheckpoint() // materialize buckets once for both join sides
    val left = base.select(col(idCol).as("id1"), col("v").as("v1"),
      explode(array(masks.map(m => col("bucket0").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val right = base.select(col(idCol).as("id2"), col("v").as("v2"),
      col("bucket0").as("bucket"))
    // no distinct needed: the right side carries exactly one bucket per
    // id2, so a pair meets at most once across all of id1's probes
    left.join(right, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        nativeCosine(corpus.sparkSession, col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  // --------------------- product quantization (PQ) ---------------------

  /** Nearest sub-centroid by squared L2 (PQ's assignment metric — the
    * codebook minimizes reconstruction error, which is what makes the
    * ADC dot-product approximation unbiased), ties on the lower code. */
  private def nearestSubCode(books: Array[Array[Array[Double]]], m: Int,
                             sub: Array[Double]): Int = {
    val book = books(m)
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < book.length) {
      var d = 0.0
      var i = 0
      while (i < sub.length) {
        val t = sub(i) - book(j)(i); d += t * t; i += 1
      }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  /**
   * Train PQ codebooks: the vector dimension splits into `m` equal
   * subspaces, each with its own `ksub`-centroid codebook (Jégou 2011,
   * "Product quantization for nearest neighbor search"). Deterministic
   * like [[trainCentroids]]: init from the `ksub` smallest-id
   * sub-slices, refine with Lloyd rounds where each round is ONE
   * distributed pass per the whole vector (all `m` subspaces assign and
   * re-average in the same job via posexplode arithmetic); only
   * m × ksub × subdim aggregates ever reach the driver.
   */
  def pqTrain(corpus: DataFrame, m: Int, ksub: Int, iters: Int = 2,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    require(m >= 1 && ksub >= 1, "pqTrain needs m >= 1 and ksub >= 1")
    val base = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")).localCheckpoint()
    val dim = base.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"vector dim $dim not divisible into $m subspaces")
    val subdim = dim / m
    val seed = base.orderBy(col("id")).limit(ksub)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(seed.nonEmpty, "empty corpus: cannot train PQ codebooks")
    var books: Array[Array[Array[Double]]] = Array.tabulate(m)(mi =>
      seed.map(v => v.slice(mi * subdim, (mi + 1) * subdim)))
    (0 until iters).foreach { _ =>
      val bc = base.sparkSession.sparkContext.broadcast(books)
      val codesOf = udf((v: Seq[Double]) => {
        val arr = v.toArray
        (0 until bc.value.length).map(mi =>
          nearestSubCode(bc.value, mi,
            arr.slice(mi * subdim, (mi + 1) * subdim)))
      })
      val means = base
        .withColumn("codes", codesOf(col("v")))
        .select(posexplode(col("v")).as(Seq("pos", "x")), col("codes"))
        .withColumn("m", expr(s"pos div $subdim").cast("int"))
        .withColumn("j", element_at(col("codes"), (col("m") + 1).cast("int")))
        .groupBy(col("m"), col("j"), (col("pos") % subdim).as("i"))
        .agg(avg(col("x")).as("mean"))
        .collect()
      val next = books.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
      books = next
    }
    books
  }

  /** Encode every vector to its `m` sub-codes — the compressed corpus
    * representation (`m` small ints ≈ m bytes per vector at ksub ≤ 256,
    * vs 4·dim bytes raw). Persist next to the codebooks; the raw
    * vectors are only ever touched again for exact re-ranking. */
  def pqEncode(corpus: DataFrame, books: Array[Array[Array[Double]]],
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val subdim = books(0)(0).length
    val bc = corpus.sparkSession.sparkContext.broadcast(books)
    val codesOf = udf((v: Seq[Double]) => {
      val arr = v.toArray
      (0 until bc.value.length).map(mi =>
        nearestSubCode(bc.value, mi, arr.slice(mi * subdim, (mi + 1) * subdim)))
    })
    corpus.select(col(idCol), codesOf(col(vecCol).cast("array<double>"))
      .as("pq_codes"))
  }

  /**
   * PQ top-k with asymmetric-distance scoring and exact re-ranking:
   * each query precomputes its m × ksub lookup table ONCE, every corpus
   * CODE row is then scored with m table adds (the ADC scan — the point
   * of PQ is that this pass reads the ~m-byte codes, not the 4·dim-byte
   * vectors), the top `rerank` ADC candidates per query re-rank by
   * exact cosine against the raw vectors (an id-keyed join touching
   * only rerank × queries rows), and the final (query_id, rank,
   * neighbor_id, cos) matches [[bruteForceTopK]]'s shape. The LUT
   * kernel is a mapPartitions for the same measured reason as the
   * multimodal codec: per-(partition, query) table reuse is the whole
   * algorithm, and no expression form amortizes it.
   *
   * Everything is deterministic: codebooks train seed-free, ADC ties
   * break on neighbor id, re-rank ties likewise.
   */
  def pqTopKWith(books: Array[Array[Array[Double]]], codes: DataFrame,
                 corpus: DataFrame, queries: DataFrame, k: Int,
                 rerank: Int = 64, idCol: String = "vec_id",
                 vecCol: String = "embedding",
                 maxDriverQueries: Int = 4096): DataFrame = {
    if (fitsDriver(queries, maxDriverQueries)) {
      val scored = adcScore(books,
        codes.select(col(idCol).cast("long").as("neighbor_id"),
          col("pq_codes"), lit(0).as("cell")),
        queries, queryCells = None, idCol, vecCol)
      rerankExact(scored, corpus, queries, k, rerank, idCol, vecCol)
    } else {
      // plain PQ scores every (query, code) pair — past the driver gate
      // that is an explicit distributed crossJoin (NOT an equi-join on a
      // constant cell, which would collapse to one partition), scored by
      // the per-partition-LUT kernel; no query-side driver state
      val joined = codes
        .select(col(idCol).cast("long").as("neighbor_id"), col("pq_codes"))
        .crossJoin(queries.select(col(idCol).cast("long").as("query_id"),
          col(vecCol).cast("array<double>").as("qvec")))
      rerankExact(adcScoreJoined(books, joined), corpus, queries, k, rerank,
        idCol, vecCol, broadcastQueries = false)
    }
  }

  /** The ADC kernel: score each (probe-eligible query, code row) pair
    * with m lookup-table adds. `queryCells = Some(map)` restricts a
    * query to codes whose `cell` it probes (the IVF-PQ path); None
    * scores every pair (plain PQ). mapPartitions: per-(partition,
    * query) LUT reuse is the algorithm — no expression form amortizes
    * the table build. */
  private def adcScore(books: Array[Array[Array[Double]]], codesWithCell: DataFrame,
                       queries: DataFrame, queryCells: Option[Map[Long, Set[Int]]],
                       idCol: String, vecCol: String): DataFrame = {
    val spark = queries.sparkSession
    val subdim = books(0)(0).length
    val bcBooks = spark.sparkContext.broadcast(books)
    val qRows = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("qvec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val bcQ = spark.sparkContext.broadcast(qRows)
    val bcCells = spark.sparkContext.broadcast(queryCells)
    import spark.implicits._
    codesWithCell
      .select(col("neighbor_id"), col("pq_codes"), col("cell"))
      .as[(Long, Seq[Int], Int)]
      .mapPartitions { it =>
        val books = bcBooks.value
        val m = books.length
        // one LUT per query per partition: lut(q)(mi)(j) = dot(q_mi, book_mi_j)
        val luts = bcQ.value.map { case (qid, qv) =>
          (qid, Array.tabulate(m)(mi => books(mi).map { c =>
            var s = 0.0
            var i = 0
            while (i < c.length) { s += c(i) * qv(mi * subdim + i); i += 1 }
            s
          }))
        }
        val cellsOf = bcCells.value
        it.flatMap { case (nid, cs, cell) =>
          luts.iterator
            .filter { case (qid, _) =>
              cellsOf.forall(_.get(qid).exists(_.contains(cell))) }
            .map { case (qid, lut) =>
              var s = 0.0
              var mi = 0
              while (mi < m) { s += lut(mi)(cs(mi)); mi += 1 }
              (qid, nid, s)
            }
        }
      }.toDF("query_id", "neighbor_id", "approx_dot")
  }

  /** The DISTRIBUTED ADC kernel — the past-driver-scale sibling of
    * [[adcScore]]: takes the ALREADY-JOINED (candidate, query) rows
    * `(neighbor_id, pq_codes, query_id, qvec)` — produced by a
    * cell-keyed equi-join (IVF-PQ) or an explicit crossJoin (plain
    * PQ) — and scores each with m lookup-table adds. The query set
    * never touches the driver; LUT amortization survives as a
    * per-partition LRU keyed by query id (after the cell shuffle a
    * partition's rows cluster by cell, so the queries probing those
    * cells repeat — hit rates stay high without unbounded state;
    * capacity 4096 LUTs ≈ 4 MB at m=8, ksub=16). */
  private def adcScoreJoined(books: Array[Array[Array[Double]]],
                             joined: DataFrame): DataFrame = {
    val spark = joined.sparkSession
    val subdim = books(0)(0).length
    val bcBooks = spark.sparkContext.broadcast(books)
    import spark.implicits._
    joined
      .select(col("neighbor_id"), col("pq_codes"), col("query_id"), col("qvec"))
      .as[(Long, Seq[Int], Long, Seq[Double])]
      .mapPartitions { it =>
        val books = bcBooks.value
        val m = books.length
        val cache = new java.util.LinkedHashMap[Long, Array[Array[Double]]](
            64, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[Long, Array[Array[Double]]]): Boolean =
            size() > 4096
        }
        it.map { case (nid, cs, qid, qv) =>
          var lut = cache.get(qid)
          if (lut == null) {
            val arr = qv.toArray
            lut = Array.tabulate(m)(mi => books(mi).map { c =>
              var s = 0.0
              var i = 0
              while (i < c.length) { s += c(i) * arr(mi * subdim + i); i += 1 }
              s
            })
            cache.put(qid, lut)
          }
          var s = 0.0
          var mi = 0
          while (mi < m) { s += lut(mi)(cs(mi)); mi += 1 }
          (qid, nid, s)
        }
      }.toDF("query_id", "neighbor_id", "approx_dot")
  }

  /** Shared tail of the PQ family: keep each query's top `rerank` ADC
    * candidates, re-rank them by exact cosine against the raw vectors
    * (an id-keyed join touching rerank × queries rows), emit top-k.
    * `broadcastQueries = false` (the past-driver-scale path) drops the
    * broadcast hint on the query join and lets AQE pick the strategy. */
  private def rerankExact(scored: DataFrame, corpus: DataFrame,
                          queries: DataFrame, k: Int, rerank: Int,
                          idCol: String, vecCol: String,
                          broadcastQueries: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && rerank >= k, s"need 1 <= k <= rerank, got k=$k rerank=$rerank")
    val spark = corpus.sparkSession
    val wA = Window.partitionBy("query_id")
      .orderBy(col("approx_dot").desc, col("neighbor_id").asc)
    val cands = scored
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= rerank)
      .select("query_id", "neighbor_id")
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cvec"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("qvec"))
    val qSide = if (broadcastQueries) broadcast(q) else q
    val wE = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.join(c, "neighbor_id").join(qSide, "query_id")
      .withColumn("cos", nativeCosine(spark, col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** One-shot [[pqTopKWith]]: train + encode + search. At scale, train
    * and encode once per corpus generation and persist both. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 8, ksub: Int = 16, rerank: Int = 64,
             trainIters: Int = 2, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val books = pqTrain(corpus, m, ksub, trainIters, idCol, vecCol)
    pqTopKWith(books, pqEncode(corpus, books, idCol, vecCol),
      corpus, queries, k, rerank, idCol, vecCol)
  }

  /**
   * IVF-PQ — the production vector-index architecture (FAISS's
   * default): the IVF coarse quantizer PRUNES (each query's ADC scan
   * touches only its `nProbe` cells' codes, ≈ nProbe/nlist of the
   * corpus), PQ COMPRESSES (the scan reads m-byte codes), and the top
   * `rerank` survivors re-rank by exact cosine. The index is
   * (centroids, codebooks, codes-with-cell) — all three persist once
   * per corpus generation; [[ivfPqIndex]] builds them together so the
   * corpus is scanned once for both assignments.
   *
   * A query identical to a corpus vector probes that vector's own cell
   * first (same argmax), so exact matches always enter the candidate
   * set — recall of planted duplicates degrades only through the ADC
   * cut, exactly as in [[pqTopKWith]].
   */
  def ivfPqIndex(corpus: DataFrame, nlist: Int, m: Int, ksub: Int,
                 trainIters: Int = 2, idCol: String = "vec_id",
                 vecCol: String = "embedding")
      : (Array[Array[Double]], Array[Array[Array[Double]]], DataFrame) = {
    val cents = trainCentroids(corpus, nlist, trainIters, idCol, vecCol)
    val books = pqTrain(corpus, m, ksub, trainIters, idCol, vecCol)
    val codes = pqEncode(corpus, books, idCol, vecCol)
      .join(corpus.select(col(idCol),
        nearestCellUdf(cents)(col(vecCol).cast("array<double>")).as("cell")),
        idCol)
    (cents, books, codes)
  }

  // -------------------- index persistence & refresh --------------------

  /** The coarse quantizer as a persistable table `(cell, centroid)` —
    * write next to the codes parquet; [[centroidsFrom]] reloads. */
  def centroidsTable(spark: org.apache.spark.sql.SparkSession,
                     cents: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
  }

  /** Reload a persisted [[centroidsTable]] (cell-ordered; the array
    * index IS the cell id, so ordering is load-bearing). */
  def centroidsFrom(df: DataFrame): Array[Array[Double]] =
    df.orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)

  /** PQ codebooks as a persistable table `(m, code, center)`. */
  def pqBooksTable(spark: org.apache.spark.sql.SparkSession,
                   books: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    (for {
      (book, mi) <- books.zipWithIndex
      (c, j) <- book.zipWithIndex
    } yield (mi, j, c.toSeq)).toSeq.toDF("m", "code", "center")
  }

  /** Reload a persisted [[pqBooksTable]] (m/code-ordered). */
  def pqBooksFrom(df: DataFrame): Array[Array[Array[Double]]] = {
    val rows = df.orderBy("m", "code").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toArray))
    rows.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2)).toArray
  }

  /**
   * INCREMENTAL index refresh — the standing-quantizer pattern of
   * [[semanticDedupBatch]] applied to the IVF-PQ index: a new epoch's
   * vectors are encoded against the EXISTING codebooks and assigned to
   * the EXISTING cells, producing codes rows in [[ivfPqIndex]]'s exact
   * shape to APPEND to the persisted codes table — O(batch) per epoch,
   * no corpus re-encode, no re-train. An exact copy of an indexed
   * vector gets its original's cell and codes (identical argmins), so
   * cross-epoch duplicates stay discoverable at full fidelity.
   *
   * Re-training is a POLICY, not a side effect: codebooks quantize
   * well until the data distribution drifts, so compare
   * [[pqReconstructionError]] on the new batch against the build-time
   * error and rebuild the index (then re-encode everything, once) when
   * it degrades past tolerance — exactly FAISS's add-vs-train split.
   */
  def ivfPqAppend(cents: Array[Array[Double]],
                  books: Array[Array[Array[Double]]], batch: DataFrame,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame =
    pqEncode(batch, books, idCol, vecCol)
      .join(batch.select(col(idCol),
        nearestCellUdf(cents)(col(vecCol).cast("array<double>")).as("cell")),
        idCol)

  /** Mean squared L2 reconstruction error of `vecs` under the
    * codebooks — the drift signal behind [[ivfPqAppend]]'s re-train
    * policy. One distributed pass; a single scalar reaches the driver. */
  def pqReconstructionError(books: Array[Array[Array[Double]]],
                            vecs: DataFrame,
                            vecCol: String = "embedding"): Double = {
    val subdim = books(0)(0).length
    val bc = vecs.sparkSession.sparkContext.broadcast(books)
    val errOf = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      var e = 0.0
      var mi = 0
      while (mi < bc.value.length) {
        val sub = arr.slice(mi * subdim, (mi + 1) * subdim)
        val c = bc.value(mi)(nearestSubCode(bc.value, mi, sub))
        var i = 0
        while (i < sub.length) { val t = sub(i) - c(i); e += t * t; i += 1 }
        mi += 1
      }
      e
    }
    vecs.select(avg(errOf(col(vecCol).cast("array<double>"))).as("mse"))
      .head().getDouble(0)
  }

  /** Serve from a persisted IVF-PQ index: each query ADC-scores ONLY
    * the codes in its `nProbe` probed cells, then the exact re-rank.
    * Output matches [[bruteForceTopK]].
    *
    * Two query-batch regimes, gated by [[fitsDriver]]:
    *
    *   - up to `maxDriverQueries` rows: the probe map (queries ×
    *     nProbe ints) collects to the driver, the codes scan prunes
    *     with an `isin` over the probed-cell union (partition pruning
    *     when cells are a partition/cluster key), and the ADC kernel
    *     broadcasts per-query LUTs — minimum latency for the
    *     query-by-example / triage shape;
    *   - past the gate (a production million-query batch — RAG
    *     back-fill, corpus-wide decontamination): NOTHING query-sized
    *     touches the driver. Probe cells are assigned DISTRIBUTIVELY
    *     (the centroid array — nlist × dim doubles, tiny — ships in
    *     the UDF closure; each query row explodes to its nProbe
    *     cells), candidates come from a cell-keyed equi-join against
    *     the codes (AQE handles hot cells as ordinary join skew), and
    *     [[adcScoreJoined]] scores with a per-partition LUT cache.
    *     One extra shuffle of the (small) exploded query side buys
    *     unbounded batch scale. */
  def ivfPqTopKWith(cents: Array[Array[Double]],
                    books: Array[Array[Array[Double]]], codes: DataFrame,
                    corpus: DataFrame, queries: DataFrame, k: Int,
                    nProbe: Int = 4, rerank: Int = 64,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    maxDriverQueries: Int = 4096): DataFrame = {
    if (fitsDriver(queries, maxDriverQueries)) {
      val probeMap: Map[Long, Set[Int]] = queries
        .select(col(idCol).cast("long"),
          probeCellsUdf(cents, nProbe)(col(vecCol).cast("array<double>")))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
      // prune the scan itself to the union of probed cells — with cells
      // persisted as a partition/cluster key this is partition pruning
      val union = probeMap.values.flatten.toSet.toSeq
      val probed = codes
        .filter(col("cell").isin(union: _*))
        .select(col(idCol).cast("long").as("neighbor_id"),
          col("pq_codes"), col("cell").cast("int").as("cell"))
      val scored = adcScore(books, probed, queries, Some(probeMap), idCol, vecCol)
      rerankExact(scored, corpus, queries, k, rerank, idCol, vecCol)
    } else {
      val qcells = queries
        .select(col(idCol).cast("long").as("query_id"),
          col(vecCol).cast("array<double>").as("qvec"))
        .withColumn("cell",
          explode(probeCellsUdf(cents, nProbe)(col("qvec"))))
      val probed = codes.select(col(idCol).cast("long").as("neighbor_id"),
        col("pq_codes"), col("cell").cast("int").as("cell"))
      // a code row carries exactly ONE cell, so a (query, candidate)
      // pair meets at most once across the query's nProbe explosions
      val scored = adcScoreJoined(books, probed.join(qcells, Seq("cell")))
      rerankExact(scored, corpus, queries, k, rerank, idCol, vecCol,
        broadcastQueries = false)
    }
  }

  // ---- scalar quantization (SQ8) ---------------------------------------

  /**
   * Train SQ8 ranges: per-dimension [min, max] over the corpus — the
   * affine scalar quantizer (FAISS `IndexScalarQuantizer(QT_8bit)`,
   * the third classic compression point next to PQ and raw floats:
   * SQ8 keeps EVERY dimension at byte resolution — dim bytes/vector,
   * 8× under float64 arrays — where PQ keeps m sub-codes; better
   * recall than PQ at the same small dim, larger codes).
   *
   * One distributed pass: posexplode → groupBy(dim position) →
   * min/max — `dim` groups with map-side partial aggregation, so the
   * shuffle is O(partitions × dim) regardless of corpus size; only
   * 2 × dim doubles reach the driver.
   */
  def sq8Train(corpus: DataFrame, idCol: String = "vec_id",
               vecCol: String = "embedding"): (Array[Double], Array[Double]) = {
    val rows = corpus
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect()
    require(rows.nonEmpty, "empty corpus: cannot train SQ8 ranges")
    val dim = rows.map(_.getInt(0)).max + 1
    val mins = new Array[Double](dim)
    val maxs = new Array[Double](dim)
    rows.foreach { r =>
      mins(r.getInt(0)) = r.getDouble(1); maxs(r.getInt(0)) = r.getDouble(2)
    }
    (mins, maxs)
  }

  /** Encode every vector to `dim` bytes under the trained ranges:
    * byte = round((x − min) / (max − min) × 255) − 128, constant
    * dimensions encode 0. BinaryType — the compressed corpus the
    * approximate scan reads; persist next to the ranges. */
  def sq8Encode(corpus: DataFrame, mins: Array[Double], maxs: Array[Double],
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val bcMin = spark.sparkContext.broadcast(mins)
    val bcMax = spark.sparkContext.broadcast(maxs)
    val enc = udf { (v: Seq[Double]) =>
      val mn = bcMin.value; val mx = bcMax.value
      val out = new Array[Byte](v.length)
      var i = 0
      while (i < v.length) {
        val range = mx(i) - mn(i)
        val q = if (range <= 0.0) 0
          else math.max(0, math.min(255,
            math.round((v(i) - mn(i)) / range * 255.0).toInt))
        out(i) = (q - 128).toByte
        i += 1
      }
      out
    }
    corpus.select(col(idCol), enc(col(vecCol).cast("array<double>")).as("sq8_code"))
  }

  /**
   * SQ8 top-k: approximate dot against the byte codes via the affine
   * identity  dot(q, v̂) = Σ q_d·min_d + Σ (q_d·scale_d)·(byte_d+128),
   * so each query precomputes one scalar (the min term) and one
   * per-dim scale table, and the scan is dim byte-multiply-adds per
   * candidate over the BYTE codes — the same query-LUT shape as PQ's
   * ADC kernel and the same mapPartitions rationale (per-(partition,
   * query) table reuse IS the algorithm). Top `rerank` survivors
   * re-rank by exact cosine; output matches [[bruteForceTopK]].
   */
  def sq8TopKWith(mins: Array[Double], maxs: Array[Double], codes: DataFrame,
                  corpus: DataFrame, queries: DataFrame, k: Int,
                  rerank: Int = 64, idCol: String = "vec_id",
                  vecCol: String = "embedding",
                  maxDriverQueries: Int = 4096): DataFrame = {
    val spark = queries.sparkSession
    val dim = mins.length
    val scales = Array.tabulate(dim) { i =>
      val r = maxs(i) - mins(i); if (r <= 0.0) 0.0 else r / 255.0
    }
    val bcMin = spark.sparkContext.broadcast(mins)
    val bcScale = spark.sparkContext.broadcast(scales)
    import spark.implicits._
    val driverSized = fitsDriver(queries, maxDriverQueries)
    val scored = if (driverSized) {
      val qRows = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qvec")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val bcQ = spark.sparkContext.broadcast(qRows)
      codes
        .select(col(idCol).cast("long").as("neighbor_id"), col("sq8_code"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val mn = bcMin.value; val sc = bcScale.value
          // per-query affine table: (Σ q_d·min_d, q_d·scale_d per dim)
          val tables = bcQ.value.map { case (qid, qv) =>
            var qmin = 0.0
            val qs = new Array[Double](qv.length)
            var i = 0
            while (i < qv.length) {
              qmin += qv(i) * mn(i); qs(i) = qv(i) * sc(i); i += 1
            }
            (qid, qmin, qs)
          }
          it.flatMap { case (nid, code) =>
            tables.iterator.map { case (qid, qmin, qs) =>
              var s = qmin
              var i = 0
              while (i < code.length) { s += qs(i) * (code(i) + 128); i += 1 }
              (qid, nid, s)
            }
          }
        }.toDF("query_id", "neighbor_id", "approx_dot")
    } else {
      // past the driver gate the query set never collects: explicit
      // distributed crossJoin (SQ8 scores every pair by construction),
      // affine tables rebuilt through a per-partition LRU keyed by
      // query id — the [[adcScoreJoined]] amortization pattern
      codes.select(col(idCol).cast("long").as("neighbor_id"), col("sq8_code"))
        .crossJoin(queries.select(col(idCol).cast("long").as("query_id"),
          col(vecCol).cast("array<double>").as("qvec")))
        .as[(Long, Array[Byte], Long, Seq[Double])]
        .mapPartitions { it =>
          val mn = bcMin.value; val sc = bcScale.value
          val cache = new java.util.LinkedHashMap[Long, (Double, Array[Double])](
              64, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[Long, (Double, Array[Double])]): Boolean =
              size() > 4096
          }
          it.map { case (nid, code, qid, qv) =>
            var t = cache.get(qid)
            if (t == null) {
              var qmin = 0.0
              val qs = new Array[Double](qv.length)
              var i = 0
              while (i < qv.length) {
                qmin += qv(i) * mn(i); qs(i) = qv(i) * sc(i); i += 1
              }
              t = (qmin, qs)
              cache.put(qid, t)
            }
            var s = t._1
            val qs = t._2
            var i = 0
            while (i < code.length) { s += qs(i) * (code(i) + 128); i += 1 }
            (qid, nid, s)
          }
        }.toDF("query_id", "neighbor_id", "approx_dot")
    }
    rerankExact(scored, corpus, queries, k, rerank, idCol, vecCol,
      broadcastQueries = driverSized)
  }

  /** One-shot [[sq8TopKWith]]: train ranges + encode + search. At
    * scale, train and encode once per corpus generation and persist
    * both ([[sq8RangesTable]]/[[sq8RangesFrom]]). */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
              rerank: Int = 64, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val (mins, maxs) = sq8Train(corpus, idCol, vecCol)
    sq8TopKWith(mins, maxs, sq8Encode(corpus, mins, maxs, idCol, vecCol),
      corpus, queries, k, rerank, idCol, vecCol)
  }

  /** Persistable `(pos, mn, mx)` form of trained SQ8 ranges — the
    * standing-model pattern the whole family follows. */
  def sq8RangesTable(spark: org.apache.spark.sql.SparkSession,
                     mins: Array[Double], maxs: Array[Double]): DataFrame = {
    import spark.implicits._
    mins.indices.map(i => (i, mins(i), maxs(i))).toDF("pos", "mn", "mx")
  }

  def sq8RangesFrom(df: DataFrame): (Array[Double], Array[Double]) = {
    val rows = df.select("pos", "mn", "mx").collect()
    val dim = rows.map(_.getInt(0)).max + 1
    val mins = new Array[Double](dim)
    val maxs = new Array[Double](dim)
    rows.foreach { r =>
      mins(r.getInt(0)) = r.getDouble(1); maxs(r.getInt(0)) = r.getDouble(2)
    }
    (mins, maxs)
  }
}
