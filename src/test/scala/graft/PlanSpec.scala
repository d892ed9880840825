package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Plan-shape assertions: the scale guarantees (pushdown, pruning,
  * broadcast, no cartesian products) are structural properties of the
  * optimized plan — check them, don't hope for them. */
class PlanSpec extends SparkSpec {

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

  /** Final physical plan with AQE unwrapped (requires executing first). */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Collect file scans, recursing through AQE query-stage wrappers. */
  private def fileScans(plan: SparkPlan): Seq[FileSourceScanExec] =
    plan.collect {
      case s: FileSourceScanExec => Seq(s)
      case q: QueryStageExec => fileScans(q.plan)
    }.flatten

  private def fileScans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] =
    fileScans(finalPlan(df))

  test("q1: filter pushes to the parquet scan and columns are pruned") {
    val df = Queries.q1PricingSummary(spark, sf)
    val scan = fileScans(df).head
    assert(scan.dataFilters.nonEmpty, "no data filters reached the scan")
    val readCols = scan.requiredSchema.fieldNames.toSet
    assert(readCols.subsetOf(Set("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_shipdate")),
      s"scan reads more than needed: $readCols")
    assert(!readCols.contains("l_comment"))
  }

  test("q5: dimension joins are broadcast, no cartesian product anywhere") {
    val plan = finalPlan(Queries.q5RegionRevenue(spark, sf)).toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
    assert(!plan.toLowerCase.contains("cartesian"), "cartesian product in plan")
  }

  test("q4: the EXISTS is a semi join — one row per order, no fact explosion") {
    val plan = finalPlan(Queries.q4OrderPriority(spark, sf)).toString
    assert(plan.contains("LeftSemi"), s"expected a semi join:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"), "cartesian product in plan")
    // the order-date window must prune the orders scan
    val scans = fileScans(Queries.q4OrderPriority(spark, sf))
    val orderScan = scans.find(_.requiredSchema.fieldNames.contains("o_orderdate"))
    assert(orderScan.exists(_.dataFilters.nonEmpty),
      "order-date window did not reach the orders scan")
  }

  test("q21: semi and anti joins on the late set, supplier broadcast, no cartesian") {
    val plan = finalPlan(Queries.q21WaitingSuppliers(spark, sf)).toString
    assert(plan.contains("LeftSemi"), s"expected the multi-supplier semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"expected the no-other-late anti join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "supplier dim should broadcast")
    assert(!plan.toLowerCase.contains("cartesian"), "cartesian product in plan")
  }

  test("q17/q22: correlated scalars broadcast; q18 agg-then-join; no cartesian") {
    val p17 = finalPlan(Queries.q17SmallQuantity(spark, sf)).toString
    assert(p17.contains("BroadcastHashJoin"),
      s"q17 per-part average should broadcast:\n$p17")
    assert(!p17.toLowerCase.contains("cartesian"))
    val p18 = finalPlan(Queries.q18LargeOrders(spark, sf)).toString
    assert(p18.contains("HashAggregate"), "q18 needs the HAVING pre-agg")
    assert(!p18.toLowerCase.contains("cartesian"))
    val p22 = finalPlan(Queries.q22GlobalSales(spark, sf)).toString
    assert(p22.contains("LeftAnti"), s"q22 needs the no-recent-orders anti join:\n$p22")
    // the scalar avg is the ONLY nested-loop broadcast (1-row build side)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p22).size <= 1, p22)
  }

  test("q6: all three predicates and the 3-column projection reach the scan") {
    val scan = fileScans(Queries.q6ForecastRevenue(spark, sf)).head
    assert(scan.dataFilters.size >= 3,
      s"expected shipdate/discount/quantity at the scan, got ${scan.dataFilters}")
    val readCols = scan.requiredSchema.fieldNames.toSet
    assert(readCols.subsetOf(Set("l_shipdate", "l_discount", "l_quantity",
      "l_extendedprice")), s"scan reads more than needed: $readCols")
  }

  test("q19: the disjunction stays a hash join on partkey — never a cartesian") {
    val plan = finalPlan(Queries.q19DiscountRevenue(spark, sf)).toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the part side must broadcast-hash-join on the common equi key:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "OR-predicate must not degrade the join to a nested loop")
  }

  test("q13: the priority predicate stays inside the LEFT OUTER join condition") {
    val plan = finalPlan(Queries.q13CustomerDistribution(spark, sf)).toString
    assert(plan.contains("LeftOuter"), s"expected a left outer join:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"))
    // conservation: the outer join must not lose a single customer —
    // every customer lands in exactly one c_count bucket
    val total = Queries.q13CustomerDistribution(spark, sf)
      .agg(sum(col("custdist"))).head.getLong(0)
    val customers = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(total === customers,
      s"outer join lost customers: $total buckets-total vs $customers")
  }

  test("q2/q15: min-cost and max-revenue join-backs broadcast; no cartesian (beyond 1-row scalars)") {
    val p2 = finalPlan(Queries.q2MinCostSupplier(spark, sf)).toString
    assert(p2.contains("BroadcastHashJoin"),
      s"q2's per-part min should broadcast into the join-back:\n$p2")
    assert(!p2.toLowerCase.contains("cartesian"))
    val p15 = finalPlan(Queries.q15TopSupplier(spark, sf)).toString
    // the scalar max is the ONLY nested-loop broadcast (1-row build side)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p15).size <= 1, p15)
    assert(!p15.toLowerCase.contains("cartesian"))
  }

  test("q7/q8/q9: dims broadcast ahead of the fact joins; no cartesian") {
    // pre-AQE physical plan: at sf0.001 the q7 nation-pair slice is
    // legitimately empty and AQE collapses the whole tree to
    // EmptyRelation — the join strategy is still the structural
    // property under test, and it lives in the static plan
    for ((name, df) <- Seq(
        "q7" -> Queries.q7VolumeShipping(spark, sf),
        "q8" -> Queries.q8MarketShare(spark, sf),
        "q9" -> Queries.q9ProductProfit(spark, sf))) {
      val plan = df.queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$name dims should broadcast:\n${plan.take(500)}")
      assert(!plan.toLowerCase.contains("cartesian"), s"$name has a cartesian")
    }
  }

  test("dedup spans: gram join and cut anti-join stay equi/hash — no nested loop") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    for ((name, df) <- Seq(
        "duplicatedSpans" -> graft.llm.Dedup.duplicatedSpans(docs, k = 8, minSpanTokens = 12),
        "removeDuplicatedSpans" -> graft.llm.Dedup.removeDuplicatedSpans(docs, k = 8, minSpanTokens = 12))) {
      val plan = df.queryExecution.sparkPlan.toString
      assert(!plan.toLowerCase.contains("cartesian") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name degraded to a non-equi join:\n${plan.take(600)}")
    }
  }

  test("bm25IndexApplyDelta: every index-side join is broadcast — the " +
      "standing index is never sort-merge/shuffle-joined") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val index = graft.llm.Retrieval.bm25Index(docs, "text", "doc_id")
      .localCheckpoint()
    val ins = Seq((900001L, "fresh spark merge text"))
      .toDF("doc_id", "text")
    val del = docs.filter(col("doc_id") < 3).localCheckpoint()
    val out = graft.llm.Retrieval.bm25IndexApplyDelta(index, ins, del)
    val plan = out.queryExecution.sparkPlan.toString
    // delta-sized frames shuffle (their own aggregations); the INDEX must
    // only ever meet them through broadcast joins — a sort-merge or
    // shuffled-hash join here would shuffle 10^10 postings per refresh
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin") &&
      !plan.toLowerCase.contains("cartesianproduct"),
      s"index-side join degraded to a shuffle:\n${plan.take(1500)}")
  }

  test("temperature quotas: scalars broadcast, corpus scanned once, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.operators.Sampling.temperatureQuotas(docs, "lang", total = 100L)
    val plan = finalPlan(df)
    // nested-loop joins are only the 1-row scalar broadcasts (n_max,
    // sw_sum) — the strata-sized subtree appears twice in the TREE (once
    // under the sw_sum build side), which is a third BNL *node*, but the
    // underlying count shuffle is exchange-reused, so the 100 TB scan
    // runs once — pinned below, which is the property that matters
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan.toString).size <= 3,
      plan.toString.take(600))
    assert(!plan.toString.toLowerCase.contains("cartesianproduct"))
    assert(fileScans(plan).size === 1,
      s"corpus must be scanned exactly once, got ${fileScans(plan).size} scans")
  }

  test("analytics queries stay inside WholeStageCodegen") {
    // codegen'd operators render with the `*(stageId)` prefix
    val plan = finalPlan(Queries.q1PricingSummary(spark, sf)).toString
    assert(plan.contains("*("), plan.take(400))
  }

  test("constraint anti join broadcasts the small reference side") {
    // build a variant guaranteed non-empty at sf0.001 (150 customers) so
    // AQE doesn't legitimately collapse the plan to EmptyRelation
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val allowed = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_custkey") < 100)
      .select(col("c_custkey").as("o_custkey"))
    val df = graft.write.WritePatterns.constraintViolations(orders, allowed, Seq("o_custkey"))
    val plan = finalPlan(df).toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(500))
  }

  test("managed-table scan prunes columns through the commit-log read path") {
    val path = tmpDir("plan_mt")
    import spark.implicits._
    graft.write.Writers.append(spark, path,
      Seq((1, "a", "junk")).toDF("id", "v", "extra"),
      graft.write.WriteOptions(now = Some("2026-01-01 00:00:00")))
    val df = graft.table.ManagedTable(spark, path).read.select("id")
    val scan = fileScans(df).head
    assert(scan.requiredSchema.fieldNames.toSeq === Seq("id"))
  }

  test("identity assignment keeps the batch distributed (no single-partition stage)") {
    // guards the zipWithIndex shape: the old row_number() over an empty
    // partition spec funnelled the whole batch through ONE task
    import spark.implicits._
    val t = graft.meta.DataObjects.TableDef("t_idplan", Seq(
      graft.meta.DataObjects.ColumnSchema("sk", "bigint", identity = true),
      graft.meta.DataObjects.ColumnSchema("v", "string")))
    val batch = spark.range(0, 10000, 1, numPartitions = 8)
      .select(col("id").cast("string").as("v"))
    val out = graft.meta.DataObjects.applyColumnSemantics(
      spark, t, tmpDir("idplan"), batch)
    assert(out.rdd.getNumPartitions === 8,
      "identity assignment must preserve the input partitioning")
    val plan = finalPlan(out)
    assert(!plan.toString.contains("Window"),
      "identity must not be a global window")
    val singleParts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning.numPartitions == 1 => e
    }
    assert(singleParts.isEmpty, "single-partition exchange in identity plan")
    // numbering is still gap-free and continues from identityStart
    val sks = out.select("sk").as[Long].collect().sorted
    assert(sks.toSeq === (1L to 10000L))
  }

  test("exact dedup is a single hash aggregate, not a window sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = finalPlan(graft.llm.TextOps.exactDedupStats(docs)).toString
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("Window"), "dedup should not need a window sort")
  }

  test("hash sampling, splitting, redaction, and chunking are narrow (zero exchanges)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Seq(
      "hashSample" -> graft.operators.Sampling.hashSample(docs, Seq("doc_id"), 0.3),
      "hashSplit" -> graft.operators.Sampling.hashSplit(docs, Seq("doc_id"), 0.2),
      "redact" -> graft.llm.TextOps.redact(docs),
      "chunk" -> graft.llm.TextOps.chunk(docs, chunkTokens = 40, overlap = 10),
      // both gopher gates are per-document: one scan, nothing to shuffle
      "gopherQuality" -> graft.llm.TextOps.gopherQuality(docs),
      "gopherRepetition" -> graft.llm.TextOps.gopherRepetition(docs)
    ).foreach { case (name, df) =>
      val plan = finalPlan(df).toString
      assert(!plan.contains("Exchange"), s"$name shuffled:\n$plan")
    }
  }

  test("packSequences, capPerGroup, and capTokensPerGroup shuffle exactly once, on the group key") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Seq(
      "packSequences" -> graft.llm.Packing.packSequences(
        docs, Seq("lang"), Seq("doc_id"), "n_chars", 2000L),
      "capPerGroup" -> graft.operators.Sampling.capPerGroup(
        docs, Seq("source"), 15, Seq("doc_id")),
      "capTokensPerGroup" -> graft.operators.Sampling.capTokensPerGroup(
        docs, Seq("lang"), "n_chars", 20000L, Seq("doc_id"))
    ).foreach { case (name, df) =>
      val plan = finalPlan(df).toString
      val n = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(n === 1, s"$name: expected one shuffle, got $n:\n$plan")
    }
  }

  test("contamination join is an equi-join on the gram — no nested loop, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val split = graft.operators.Sampling.hashSplit(docs, Seq("doc_id"), 0.2)
    val pairs = graft.llm.Dedup.contaminationPairs(
      split.filter(col("split") === "train"),
      split.filter(col("split") === "test"), minShared = 1)
    val plan = finalPlan(pairs).toString
    assert(!plan.contains("NestedLoop"), s"nested loop in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    // the decontamination ACTION keeps the same shape: gram equi-join,
    // then an anti-join on the id — still no all-pairs anywhere
    val clean = graft.llm.Dedup.decontaminate(
      split.filter(col("split") === "train").drop("split"),
      split.filter(col("split") === "test").drop("split"), minShared = 3)
    val cplan = finalPlan(clean).toString
    assert(!cplan.contains("NestedLoop") && !cplan.contains("CartesianProduct"),
      s"non-equi join in decontaminate:\n$cplan")
    assert(cplan.contains("LeftAnti"), s"expected an anti-join in:\n$cplan")
  }

  test("corpus-stat ops: wordcount-shaped joins, broadcast scalar, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // rare tokens: every join is keyed (tok / doc_id) — no pair explosion
    val rare = finalPlan(graft.llm.TextOps.rareTokenScore(docs)).toString
    assert(!rare.contains("CartesianProduct"), s"cartesian in rareTokenScore:\n$rare")
    assert(!rare.contains("NestedLoop"), s"nested loop in rareTokenScore:\n$rare")
    // tf-idf: the ONLY non-equi join is the 1-row corpus-count broadcast
    val tf = finalPlan(graft.llm.TextOps.tfidfKeywords(docs)).toString
    assert(!tf.contains("CartesianProduct"), s"cartesian in tfidfKeywords:\n$tf")
    val nested = "BroadcastNestedLoopJoin".r.findAllIn(tf).size
    assert(nested <= 1, s"more than the scalar broadcast in tfidfKeywords:\n$tf")
    // normalization is narrow; profile and mixture shuffle on their group key
    val norm = finalPlan(graft.llm.TextOps.normalizeText(docs)).toString
    assert(!norm.contains("Exchange"), s"normalizeText shuffled:\n$norm")
    val mix = finalPlan(graft.operators.Sampling.mixtureSample(docs, "lang",
      Map("en" -> 0.5, "de" -> 0.5), total = 20, keys = Seq("doc_id"),
      hotGroupFactor = 0)).toString
    val n = "Exchange hashpartitioning".r.findAllIn(mix).size
    assert(n === 1, s"mixtureSample: expected one shuffle, got $n:\n$mix")
  }

  test("round-11 ops: NB scoring, KMV sketching, fuzzy join keep scale-safe shapes") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("weak_label", (col("n_chars") >= 250).cast("int"))
    // NB scoring: class totals are inlined literals, so the plan is
    // exactly the model equi-join + the doc-keyed aggregate — no
    // nested-loop joins of any kind, no cartesian
    val nb = finalPlan(graft.llm.QualityClassifier.scoreWith(docs,
      graft.llm.QualityClassifier.train(docs),
      graft.llm.QualityClassifier.priors(docs))).toString
    assert(!nb.contains("CartesianProduct"), s"cartesian in NB scoring:\n$nb")
    assert(!nb.contains("NestedLoop"), s"nested loop in NB scoring:\n$nb")
    // KMV sketch build: one hash-agg with a map-side partial (the udaf
    // must combine before the exchange, or every raw hash shuffles)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val sk = graft.operators.Sketches.kmvSketch(
      orders, Seq("o_orderpriority"), "o_custkey", 256)
    val skPlan = finalPlan(sk).toString
    // partial + final kmvdistinct aggregates (the partial lives inside
    // the AQE shuffle stage — count on the rendered tree)
    assert("kmvdistinct".r.findAllIn(skPlan).size >= 2,
      s"KMV sketch must partial-aggregate map-side:\n$skPlan")
    assert("Exchange hashpartitioning".r.findAllIn(skPlan).size === 1,
      s"KMV sketch: expected exactly one shuffle:\n$skPlan")
    // fuzzy join: candidates from an equi-join on the variant
    val parts = spark.read.parquet(s"$sf/part.parquet")
    val fz = finalPlan(graft.operators.FuzzyJoin.fuzzySelfJoin(
      parts, "p_partkey", "p_name", 1)).toString
    assert(!fz.contains("CartesianProduct") && !fz.contains("NestedLoop"),
      s"fuzzy join must stay an equi-join:\n$fz")
  }

  test("bm25: query terms broadcast onto the postings; no cartesian, no nested loop") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val q = Seq((1L, "spark table merge")).toDF("query_id", "query_text")
    val p = finalPlan(graft.llm.Retrieval.bm25TopK(docs, q, k = 5,
      exact = true)).toString
    // the tiny query-term set must reach the postings as a broadcast
    // hash join — a shuffled join would move every posting for nothing
    assert(p.contains("BroadcastHashJoin"),
      s"bm25 query terms must broadcast-join the postings:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in bm25:\n$p")
    // the ONE BroadcastNestedLoopJoin allowed is the 1-row corpus-scalar
    // broadcast (n_docs, total_len) — anything more is a real pair blowup
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      s"bm25: more than the scalar broadcast nested-loop:\n$p")
  }

  test("phrase search / cascade / co-occurrence plans: hash joins only, " +
      "no cartesian, candidate-bounded re-rank") {
    import spark.implicits._
    import graft.llm.{Retrieval, TextOps}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val phrases = Seq((1L, "table hash")).toDF("query_id", "query_text")
    val pPlan = finalPlan(Retrieval.phraseSearch(docs, phrases, k = 5)).toString
    // the (doc, pos) diagonal meets the query side in a hash join
    // (broadcast for a probe-sized batch); never a cartesian
    assert(pPlan.contains("BroadcastHashJoin"),
      s"phrase query side should broadcast-join the positional index:\n$pPlan")
    assert(!pPlan.toLowerCase.contains("cartesianproduct"),
      s"cartesian in phrase search:\n$pPlan")
    val qv = emb.filter(col("vec_id") === 3L)
    val cPlan = finalPlan(Retrieval.cascadeRerank(
      Seq((3L, "table hash")).toDF("query_id", "query_text"), qv,
      Retrieval.bm25Index(docs), emb, recallN = 20, k = 5)).toString
    assert(!cPlan.toLowerCase.contains("cartesianproduct"),
      s"cartesian in cascade re-rank:\n$cPlan")
    // the re-rank joins CANDIDATES (post-window) to embeddings by id —
    // the window cut must sit below the cosine join, which is what
    // bounds the expensive stage to recallN × queries rows
    assert(cPlan.indexOf("row_number") >= 0 &&
      cPlan.contains("graft_cosine"),
      s"cascade plan lost its window cut or native cosine:\n$cPlan")
    val oPlan = finalPlan(TextOps.cooccurrencePmi(docs, window = 2,
      minCount = 5, k = 5)).toString
    assert(!oPlan.toLowerCase.contains("cartesianproduct"),
      s"cartesian in co-occurrence:\n$oPlan")
  }

  test("DV read: tombstones broadcast as an anti-join; filters still reach the scan") {
    import graft.table.ManagedTable
    import spark.implicits._
    val path = tmpDir("plan_dv")
    val t = ManagedTable(spark, path)
    t.write((1 to 50000).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      "APPEND", "append")
    t.deleteVectors(col("id") % 1000 === 0)
    val df = t.readWhere(col("id") < 25000)
    val planStr = finalPlan(df).toString
    // the typical (small) tombstone set must broadcast — a
    // shuffle-both-sides anti-join would tax every read with an exchange
    assert(planStr.contains("BroadcastHashJoin") && planStr.contains("LeftAnti"),
      s"DV anti-join should broadcast the tombstones:\n$planStr")
    // DV application must not break predicate pushdown on the data scan
    val dataScan = fileScans(df)
      .find(_.requiredSchema.fieldNames.contains("id")).get
    assert(dataScan.dataFilters.nonEmpty,
      "readWhere predicate no longer reaches the parquet scan under DVs")
    assert(!planStr.toLowerCase.contains("cartesian"))
  }
}
