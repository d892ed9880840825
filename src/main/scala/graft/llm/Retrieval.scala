package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a document corpus (Robertson & Walker
  * 1994; the Okapi BM25 weighting in its standard `k1 = 1.2`,
  * `b = 0.75` operating point) — the retrieval primitive of a
  * training-data pipeline: "find the corpus documents most relevant
  * to this query" drives eval-set decontamination triage, targeted
  * corpus audits, and RAG-style context selection.
  *
  * Two scoring modes:
  *
  *   - '''production''' (`exact = false`, the default): the Lucene
  *     form `ln(1 + (N − df + ½)/(df + ½)) · tf·(k1+1) /
  *     (tf + k1·(1 − b + b·dl/avgdl))` in IEEE doubles. The right
  *     choice at scale, but `ln` plus a multi-term float SUM makes
  *     the result engine-rounding-dependent, so it cannot sit under
  *     a cross-engine hash gate.
  *   - '''exact''' (`exact = true`): every per-term score is a pair of
  *     staged integer divisions over exactly-computed integers, so the
  *     per-document sum is an exact BIGINT — bit-identical in any
  *     engine. With `k1 = 6/5` and `b = 3/4` the per-term score
  *     `idf_lin · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))` clears to the
  *     staged form (L = Σ dl, SCALE = [[ExactScale]] = 10^6)
  *     {{{
  *       sat  = (44 · tf · L · SCALE) div (20·tf·L + 6·L + 18·dl·N)
  *       term = ((2N − 2df + 1) · sat) div (2df + 1)
  *     }}}
  *     The linear idf `(2N−2df+1)/(2df+1)` replaces the log idf — a
  *     documented variant (the RSJ idf without the log), steeper on
  *     rare terms but with the same sign behaviour; tf saturation and
  *     length normalization are exactly BM25's. The staged division is
  *     the overflow-safe shape — the naive single fraction's numerator
  *     grows with tf (`~(2N)·44·tf·L·SCALE`), so a spam term in a long
  *     doc would push a DECIMAL(38,0)/HUGEINT past 38 digits; staging
  *     caps each intermediate independently of tf:
  *     {{{
  *       stage 1:  44·tf·L·SCALE ≤ 10^38  ⇔  tf·L ≤ 2.3·10^30
  *                 (tf < 2^31 per parquet-string doc, L ≤ 10^17: safe)
  *       sat       ≤ 44·SCALE/20 = 2.2·10^6        (denominator ≥ 20·tf·L)
  *       stage 2:  (2N+1)·sat ≤ 10^38              (any N: safe)
  *       term      < (2N−1)/3 · 2.2·SCALE  (df ≥ 1 on a matched posting)
  *                 — fits BIGINT for N ≤ 6·10^12 docs; past that (far
  *                 beyond 100 TB's N ~ 2·10^10) the ANSI overflow is a
  *                 loud error, never a silent wrap.
  *     }}}
  *     Both stages floor (`div` / DuckDB `//`) on all-positive
  *     operands, so the two engines agree bit-for-bit.
  *
  * Scale shape: the standing index ([[bm25Index]]) is one tokenize +
  * two hash aggregates; scoring ([[bm25SearchWith]]) joins the query
  * term set against the postings — broadcast-hinted while the batch
  * fits the size gate, a plain shuffled join past it — so the only
  * postings touched are the ones whose `tok` appears in some query:
  * the candidate set is the union of the query terms' posting lists,
  * never the corpus. One shuffle on `(query_id, doc_id)` sized by
  * matched postings, then a top-k window partitioned per query — the
  * window partitions are bounded by each query's candidate count, not
  * the corpus, at any batch size.
  */
object Retrieval {

  /** 10^9: fixed-point scale of the double-mode display column and the
    * RRF fusion arithmetic (rank denominators are tiny, so the head
    * room is free there). */
  val Scale = 1000000000L

  /** 10^6: fixed-point scale of the EXACT-mode score. One part per
    * million of ranking resolution — still far below any meaningful
    * relevance difference — chosen so the per-term BIGINT bound
    * `(2N−1)/3 · 2.2·ExactScale` holds through N ≈ 6·10^12 documents
    * (a 10^9 scale would overflow a long at N ≈ 6·10^9, BELOW the
    * 100 TB operating point this mode advertises). */
  val ExactScale = 1000000L

  // private[graft]: the standing-index views reuse the EXACT tokenizer
  // for their commit-metadata scalar deltas (a re-spelled regex there
  // could silently drift from the postings build)
  private[graft] def toks(c: org.apache.spark.sql.Column) =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** The DISTINCT token set of a query batch, under exactly the
    * tokenizer every index here uses — the one-column frame a serving
    * path hands to a skipping read (`tok IN (...)` over a clustered
    * postings table prunes at dir grain) before scoring. */
  def queryToks(queries: DataFrame,
                queryTextCol: String = "query_text"): DataFrame =
    queries.select(explode(toks(col(queryTextCol))).as("tok")).distinct()

  /** The standing BM25 inverted index: one self-contained postings
    * table `(tok, doc_id, tf, dl, df, n_docs, total_len)` — document
    * length, document frequency, and the two corpus scalars stamped on
    * every posting so a persisted parquet copy needs no side tables
    * (the same self-containment as [[TextOps.docFreqModel]]; the
    * stamped columns run-length-compress to nothing in parquet).
    * Build cost: one tokenize, a `(doc, tok)` count, a per-doc length
    * roll-up, a per-tok df roll-up, and a 1-row broadcast of the
    * corpus scalars. Persist once per frozen corpus; re-derive only on
    * corpus change. */
  def bm25Index(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val dt = postings(docs, textCol, idCol)
    val df = dt.groupBy("tok").agg(count(lit(1)).as("df"))
    val scalars = dt.groupBy("doc_id").agg(first("dl").as("__dl__"))
      .agg(count(lit(1)).as("n_docs"), sum("__dl__").as("total_len"))
    dt.join(df, Seq("tok")).crossJoin(broadcast(scalars))
  }

  /** `(tok, doc_id, tf, dl)` postings of a document set — the df-less,
    * stamp-less core both [[bm25Index]] and [[bm25IndexMerge]] build
    * on. PUBLIC as the normalized standing-index layout
    * ([[graft.table.Bm25IndexView]]'s state): every column is a
    * function of its OWN document, so index maintenance is row-local —
    * an entering doc appends its rows, a leaving doc's rows delete, and
    * nothing else in the table moves. `df` is NOT stored: it is the
    * posting-list length, re-derivable at query time over exactly the
    * matched lists ([[bm25SearchPostings]]); the two corpus scalars
    * (`n_docs`, `total_len`) live wherever the caller keeps index
    * metadata (the view rides them on its commit log). This is what
    * makes a daily refresh O(batch) on the WRITE side — the
    * denormalized [[bm25Index]] must restamp every row when the corpus
    * scalars move, i.e. on every batch. */
  def bm25Postings(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    postings(docs, textCol, idCol)

  private def postings(docs: DataFrame, textCol: String,
                       idCol: String): DataFrame = {
    val dt = docs.select(col(idCol).as("doc_id"),
        explode(toks(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dl = dt.groupBy("doc_id").agg(sum("tf").as("dl"))
    dt.join(dl, Seq("doc_id"))
  }

  /** A persistable one-row bloom filter over the index's doc ids —
    * the O(1)-per-merge sibling of the index itself, built ONCE per
    * index generation (one distinct over the postings) so
    * [[bm25IndexMerge]]'s append-only gate never has to re-distinct
    * 10^10 doc ids per daily fold: the batch tests against the bloom
    * (O(batch), inside WholeStageCodegen via `graft_might_contain`),
    * and the exact semi-join fallback runs only for bloom-positive
    * ids. Row: `(bloom, expected_items, fpp)` — the sizing params ride
    * along so [[bm25BloomAdd]] can build merge-compatible batch blooms.
    * Ids hash as strings (`xxhash64(cast(id as string))`), so integral
    * and string id columns both work; build and probe must agree. */
  def bm25IndexBloom(index: DataFrame, expectedItems: Long,
                     fpp: Double = 0.01): DataFrame = {
    val spark = index.sparkSession
    val bf = index.select(col("doc_id").cast("string").as("__id__")).distinct()
      .select(xxhash64(col("__id__")).as("__h__"))
      .stat.bloomFilter("__h__", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    import spark.implicits._
    Seq((bos.toByteArray, expectedItems, fpp))
      .toDF("bloom", "expected_items", "fpp")
  }

  /** Reload a persisted [[bm25IndexBloom]] row. */
  def bm25BloomFrom(df: DataFrame): (Array[Byte], Long, Double) = {
    val r = df.select("bloom", "expected_items", "fpp").head()
    (r.getAs[Array[Byte]](0), r.getLong(1), r.getDouble(2))
  }

  /** Fold a batch's doc ids into a standing [[bm25IndexBloom]] — the
    * maintenance step paired with every [[bm25IndexMerge]]: the batch
    * builds its own bloom UNDER THE SAME SIZING (same bit width and
    * hash count, so the merge is element-wise OR) and the union row
    * persists alongside the merged index. The bloom must always cover
    * the index: a stale bloom turns the collision gate into silent
    * false negatives (documented on [[bm25IndexMerge]]). */
  def bm25BloomAdd(bloomRow: DataFrame, newDocs: DataFrame,
                   idCol: String = "doc_id"): DataFrame = {
    val spark = newDocs.sparkSession
    val (bytes, items, fpp) = bm25BloomFrom(bloomRow)
    val old = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val add = newDocs.select(col(idCol).cast("string").as("__id__")).distinct()
      .select(xxhash64(col("__id__")).as("__h__"))
      .stat.bloomFilter("__h__", items, fpp)
    old.mergeInPlace(add)
    val bos = new java.io.ByteArrayOutputStream()
    old.writeTo(bos)
    import spark.implicits._
    Seq((bos.toByteArray, items, fpp)).toDF("bloom", "expected_items", "fpp")
  }

  /** Fold an APPEND batch into a standing [[bm25Index]] without
    * touching the corpus text again — the O(batch)-per-day form every
    * standing model here gets ([[TextOps.tfidfKeywordsWith]],
    * `decontaminateWith`, …), for the index that would otherwise
    * re-tokenize 100 TB to admit a day's documents.
    *
    * What actually changes when docs append: `df` moves ONLY for
    * tokens the batch contains; `n_docs`/`total_len` are scalar adds;
    * existing postings' `(tok, doc_id, tf, dl)` never change. So:
    *
    *   - existing rows: one LEFT broadcast-join against the batch's
    *     (tiny) per-token df delta — a narrow pass over the index, no
    *     shuffle of it;
    *   - batch rows: the batch's own postings, joined to the OLD df of
    *     just-matched tokens (a semi-join-pruned aggregate over the
    *     matched posting lists only);
    *   - stamps: one 1-row aggregate of each side, re-broadcast.
    *
    * Requires batch doc ids to be NEW (append semantics — an id
    * collision would duplicate postings). The gate has two costs:
    *
    *   - `docIdBloom = None`: an exact distinct×distinct semi-join —
    *     correct anywhere, but the index-side distinct is a full
    *     shuffle of 10^10 doc ids at daily cadence;
    *   - `docIdBloom = Some(bytes)` (a [[bm25IndexBloom]] covering the
    *     index): the batch's distinct ids test against the bloom in
    *     O(batch); when NO id is bloom-positive — the overwhelmingly
    *     common append-only case — the index is never touched at all,
    *     and on a (rare, fpp-bounded) positive only the suspect ids'
    *     posting rows are semi-scanned, no full-index distinct ever.
    *     THE BLOOM MUST COVER THE INDEX: fold every merged batch with
    *     [[bm25BloomAdd]]; a stale bloom silently skips the exact
    *     check for ids it has never seen (RetrievalSpec pins exactly
    *     that skip — it is the fast path working as designed). */
  def bm25IndexMerge(index: DataFrame, newDocs: DataFrame,
                     textCol: String = "text",
                     idCol: String = "doc_id",
                     docIdBloom: Option[Array[Byte]] = None): DataFrame = {
    val newPost = postings(newDocs, textCol, idCol)
    val dup = docIdBloom match {
      case Some(bytes) =>
        graft.expressions.MightContain.register(index.sparkSession)
        val suspects = newPost.select("doc_id").distinct()
          .filter(call_function(graft.expressions.MightContain.Name,
            lit(bytes), xxhash64(col("doc_id").cast("string"))))
          .localCheckpoint()
        if (suspects.isEmpty) 0L
        else index.select("doc_id")
          .join(broadcast(suspects), Seq("doc_id"), "semi")
          .distinct().count()
      case None =>
        index.select("doc_id").distinct()
          .join(newPost.select("doc_id").distinct(), Seq("doc_id"), "semi")
          .count()
    }
    require(dup == 0L,
      s"bm25IndexMerge: $dup batch doc ids already exist in the index — " +
        "merge is append-only; dedup or reassign ids first")
    val batchDf = newPost.groupBy("tok").agg(count(lit(1)).as("__dfb__"))
    // old df for exactly the batch's tokens: prune the index to matched
    // posting lists first (semi-join on the broadcast token set), then a
    // vocab-bounded aggregate — never a full-index df rebuild
    val oldDfMatched = index.join(broadcast(batchDf.select("tok")),
        Seq("tok"), "semi")
      .groupBy("tok").agg(max("df").as("__dfo__"))
    val oldScalars = index.agg(max("n_docs").as("__n0__"),
      max("total_len").as("__l0__"))
    val batchScalars = newPost.groupBy("doc_id").agg(first("dl").as("__dl__"))
      .agg(count(lit(1)).as("__nb__"), sum("__dl__").as("__lb__"))
    val stamps = oldScalars.crossJoin(batchScalars)
      .select((col("__n0__") + col("__nb__")).as("n_docs"),
        (col("__l0__") + col("__lb__")).as("total_len"))
    // narrow df bump on existing rows (batchDf broadcasts), then the
    // batch's rows under old+batch df; stamps re-broadcast onto all
    val updatedOld = index.drop("n_docs", "total_len")
      .join(broadcast(batchDf), Seq("tok"), "left")
      .withColumn("df", col("df") + coalesce(col("__dfb__"), lit(0L)))
      .drop("__dfb__")
    val newRows = newPost
      .join(broadcast(oldDfMatched), Seq("tok"), "left")
      .join(broadcast(batchDf), Seq("tok"))
      .withColumn("df", coalesce(col("__dfo__"), lit(0L)) + col("__dfb__"))
      .drop("__dfo__", "__dfb__")
    updatedOld.unionByName(newRows).crossJoin(broadcast(stamps))
  }

  /** Apply a SIGNED document delta — `insDocs` entering, `delDocs`
    * (with their text) leaving — to a standing [[bm25Index]], the
    * general maintenance step [[bm25IndexMerge]]'s append-only form
    * cannot express. This is what lets a standing index survive the
    * pipeline's own curation: `removeDuplicatedSpans`, fuzzy dedup,
    * decontamination actions and SQL `DELETE FROM`/`UPDATE` all write
    * deletes (or update pairs) to the corpus table, and an index that
    * only accepts appends would force a full rebuild after every
    * curation pass. The algebra is [[graft.table.IncrementalJoinAggView]]'s
    * ±1 identity applied to postings:
    *
    *   - `df` moves by `Σ sign` per token over the delta's `(doc, tok)`
    *     posting rows (a deleted doc decrements df for each of its
    *     tokens; an inserted one increments) — a token whose df reaches
    *     zero simply has no surviving rows left to carry it;
    *   - `n_docs` / `total_len` move by the signed scalar sums;
    *   - deleted docs' `(tok, doc_id, tf, dl)` rows leave by anti-join
    *     against the (batch-sized, broadcast) deleted-id set; surviving
    *     rows keep their tf/dl untouched (a doc's own postings never
    *     change while it lives);
    *   - an UPDATE is a (−preimage, +postimage) pair — both sides
    *     tokenize from the delta itself, the corpus text is never
    *     re-read.
    *
    * Cost: one narrow pass over the index (broadcast anti-join +
    * broadcast df-delta left join, no shuffle of the index) plus
    * O(delta) tokenization — the same budget as the append-only merge.
    *
    * Loud gates, all O(delta) against the index:
    *   - every deleted doc with at least one POSTING must exist in the
    *     index (subtracting postings that were never added would
    *     corrupt df silently) — a deleted doc whose text tokenizes to
    *     NOTHING is exempt: it never entered the postings or `n_docs`
    *     at build time, so deleting it is a legal no-op, not
    *     corruption (gating on it would wedge the index on a perfectly
    *     valid corpus DELETE);
    *   - every `insDocs` id must be NEW relative to the surviving index
    *     (post-delete), bloom-gated exactly like [[bm25IndexMerge]] —
    *     an update's reused id passes because its delete lands in the
    *     same delta.
    *
    * Every delta-side join broadcasts only under `maxBroadcastIds`
    * ([[Similarity.fitsDriver]]'s probe) — the pipeline's own
    * corpus-wide curation (fuzzy dedup, span dedup, decontamination)
    * can delete a data-scaled fraction of the corpus, and an ungated
    * broadcast of that id set is a driver/executor OOM; past the gate
    * the same joins run shuffled. */
  def bm25IndexApplyDelta(index: DataFrame, insDocs: DataFrame,
                          delDocs: DataFrame,
                          textCol: String = "text",
                          idCol: String = "doc_id",
                          docIdBloom: Option[Array[Byte]] = None,
                          maxBroadcastIds: Int = 65536): DataFrame = {
    def gated(df: DataFrame): DataFrame =
      if (Similarity.fitsDriver(df, maxBroadcastIds)) broadcast(df) else df
    val insPost = postings(insDocs, textCol, idCol)
    val delPost = postings(delDocs, textCol, idCol)
    // ids from the delta's own POSTINGS, not every deleted source id —
    // zero-token docs have no index rows to subtract (see scaladoc)
    val delIds = delPost.select(col("doc_id").cast("string").as("doc_id"))
      .distinct().localCheckpoint()
    val nDel = delIds.count()
    if (nDel > 0) {
      val matched = index.select(col("doc_id").cast("string").as("doc_id"))
        .join(gated(delIds), Seq("doc_id"), "semi").distinct().count()
      require(matched == nDel,
        s"bm25IndexApplyDelta: ${nDel - matched} deleted doc ids are not in " +
          "the index — the delta does not describe this index's corpus")
    }
    val insIds = insPost.select("doc_id").distinct()
    val suspects = (docIdBloom match {
      case Some(bytes) =>
        graft.expressions.MightContain.register(index.sparkSession)
        insIds.filter(call_function(graft.expressions.MightContain.Name,
          lit(bytes), xxhash64(col("doc_id").cast("string"))))
      case None => insIds
    }).localCheckpoint()
    if (!suspects.isEmpty) {
      val dup = index.select("doc_id")
        .join(gated(suspects), Seq("doc_id"), "semi")
        .join(gated(delIds.select(col("doc_id").as("__del__"))),
          col("doc_id").cast("string") === col("__del__"), "anti")
        .distinct().count()
      require(dup == 0L,
        s"bm25IndexApplyDelta: $dup inserted doc ids already exist in the " +
          "surviving index — inserts must be new or paired with a delete")
    }
    // signed df delta per token: one row per (doc, tok) on each side
    // (checkpointed — it feeds two joins and the size-gate probe, and
    // must yield the same rows to all three)
    val dfDelta = insPost.select(col("tok"), lit(1L).as("__d__"))
      .unionByName(delPost.select(col("tok"), lit(-1L).as("__d__")))
      .groupBy("tok").agg(sum("__d__").as("__dfd__"))
      .localCheckpoint()
    val dfDeltaG = gated(dfDelta)
    def scalars(post: DataFrame) = post
      .groupBy("doc_id").agg(first("dl").as("__dl__"))
      .agg(coalesce(count(lit(1)), lit(0L)).as("__n__"),
        coalesce(sum("__dl__"), lit(0L)).as("__l__"))
    val oldScalars = index.agg(coalesce(max("n_docs"), lit(0L)).as("__n0__"),
      coalesce(max("total_len"), lit(0L)).as("__l0__"))
    val stamps = oldScalars
      .crossJoin(scalars(insPost).select(col("__n__").as("__ni__"),
        col("__l__").as("__li__")))
      .crossJoin(scalars(delPost).select(col("__n__").as("__nd__"),
        col("__l__").as("__ld__")))
      .select((col("__n0__") + col("__ni__") - col("__nd__")).as("n_docs"),
        (col("__l0__") + col("__li__") - col("__ld__")).as("total_len"))
    // old stamped df for exactly the insert batch's tokens (semi-pruned
    // posting lists, never a full df rebuild) — the stamped value counts
    // deleted docs, and dfDelta's −1s correct for them
    val oldDfMatched = index.join(gated(insPost.select("tok").distinct()),
        Seq("tok"), "semi")
      .groupBy("tok").agg(max("df").as("__dfo__"))
    val survivors = index.drop("n_docs", "total_len")
      .join(gated(delIds.select(col("doc_id").as("__del__"))),
        col("doc_id").cast("string") === col("__del__"), "anti")
      .join(dfDeltaG, Seq("tok"), "left")
      .withColumn("df", col("df") + coalesce(col("__dfd__"), lit(0L)))
      .drop("__dfd__")
    val newRows = insPost
      .join(gated(oldDfMatched), Seq("tok"), "left")
      .join(dfDeltaG, Seq("tok"))
      .withColumn("df", coalesce(col("__dfo__"), lit(0L)) + col("__dfd__"))
      .drop("__dfo__", "__dfd__")
    survivors.unionByName(newRows).crossJoin(broadcast(stamps))
  }

  /** Top-`k` documents per query against a STANDING index (the
    * persisted-model form, like [[TextOps.tfidfKeywordsWith]]): only
    * the queries are tokenized; query terms are DISTINCT per query
    * (qtf is ignored — standard for short queries) and broadcast, so
    * the index side is filtered to matched posting lists before any
    * shuffle. Ties break (score desc, doc_id asc) for a total,
    * engine-independent order. Returns
    * `(query_id, rank, doc_id, score_scaled, n_terms_matched)`; in
    * double mode `score_scaled` is `floor(score · SCALE)` (ranking is
    * done on the un-floored double; the column is floored only for a
    * stable display surface). */
  def bm25SearchWith(queries: DataFrame, index: DataFrame, k: Int = 5,
                     exact: Boolean = false,
                     queryTextCol: String = "query_text",
                     queryIdCol: String = "query_id",
                     maxBroadcastQueries: Int = 65536): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val qterms = queries.select(col(queryIdCol).as("query_id"),
        explode(toks(col(queryTextCol))).as("tok"))
      .distinct()
    // query batches up to the gate broadcast their term set (posting
    // lists prune before any shuffle — minimum latency); past it the
    // hint drops and the tok join runs shuffled — a production
    // million-query batch must never become driver/broadcast state.
    // The gate probe is a limit(cap+1).count() — O(cap), short-circuits.
    val qSide =
      if (Similarity.fitsDriver(queries, maxBroadcastQueries))
        broadcast(qterms)
      else qterms
    val matched = index.join(qSide, Seq("tok"))
    bm25ScoreAndRank(matched, k, exact)
  }

  /** Top-`k` per query against the NORMALIZED standing layout — a
    * [[bm25Postings]] table plus the two corpus scalars (from the
    * index's metadata; [[graft.table.Bm25IndexView]] rides them on its
    * commit log). `df` is derived HERE, from exactly the matched
    * posting lists: the query token set semi-prunes the postings, and
    * one window count per `tok` partition IS the document frequency
    * (each `(tok, doc)` holds one row). Costs one extra shuffle of the
    * matched lists on `tok` versus the denormalized path — bounded by
    * the candidate set, never the corpus — and buys a write path where
    * daily maintenance appends only the batch's rows. Scoring, ranking,
    * tie-breaks, and both arithmetic modes are [[bm25SearchWith]]'s,
    * bit-identical. */
  def bm25SearchPostings(queries: DataFrame, postings: DataFrame,
                         nDocs: Long, totalLen: Long, k: Int = 5,
                         exact: Boolean = false,
                         queryTextCol: String = "query_text",
                         queryIdCol: String = "query_id",
                         maxBroadcastQueries: Int = 65536): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val qterms = queries.select(col(queryIdCol).as("query_id"),
        explode(toks(col(queryTextCol))).as("tok"))
      .distinct()
    val small = Similarity.fitsDriver(queries, maxBroadcastQueries)
    val qSide = if (small) broadcast(qterms) else qterms
    val qtoks = qterms.select("tok").distinct()
    val qtokSide = if (small) broadcast(qtoks) else qtoks
    // semi-prune the postings to matched lists FIRST (the semi-join
    // pushes into the scan when broadcast), THEN count df per tok over
    // those lists alone — a full-vocabulary df rebuild never happens
    val matchedPost = postings.join(qtokSide, Seq("tok"), "semi")
      .withColumn("df", count(lit(1)).over(Window.partitionBy("tok")))
    val matched = matchedPost.join(qSide, Seq("tok"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("total_len", lit(totalLen))
    bm25ScoreAndRank(matched, k, exact)
  }

  /** Shared scoring tail of [[bm25SearchWith]] / [[bm25SearchPostings]]:
    * `matched` carries `(query_id, doc_id, tf, dl, df, n_docs,
    * total_len)` — score per term, sum per (query, doc), top-k window
    * with the (score desc, doc_id asc) total order. */
  private def bm25ScoreAndRank(matched: DataFrame, k: Int,
                               exact: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "DECIMAL(38,0)"
    // staged: sat = (44·tf·L·SCALE) div (20tfL + 6L + 18·dl·N) is a
    // BIGINT ≤ 2.2·SCALE regardless of tf, then the idf stage — see the
    // object scaladoc for the overflow analysis both stages satisfy
    val termScore =
      if (exact)
        expr(s"""(CAST(2*n_docs - 2*df + 1 AS $dec)
                 * ((CAST(44 AS $dec) * CAST(tf AS $dec)
                     * CAST(total_len AS $dec) * CAST($ExactScale AS $dec))
                    div
                    (CAST(20 AS $dec)*CAST(tf AS $dec)*CAST(total_len AS $dec)
                     + CAST(6 AS $dec)*CAST(total_len AS $dec)
                     + CAST(18 AS $dec)*CAST(dl AS $dec)*CAST(n_docs AS $dec))))
                div CAST(2*df + 1 AS $dec)
             """)
      else {
        val avgdl = col("total_len").cast("double") / col("n_docs")
        val idf = log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
        idf * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
      }
    val scored = matched.withColumn("__s__", termScore)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__s__")).as("__score__"),
        count(lit(1)).as("n_terms_matched"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__score__").desc, col("doc_id").asc)
    // exact mode: `div` yields BIGINT per term, so the per-doc sum is
    // an exact long (no float ever enters the plan). Double mode
    // floors only the OUTPUT column; ranking uses the full double.
    val outScore =
      (if (exact) col("__score__") else floor(col("__score__") * Scale))
        .cast("long").as("score_scaled")
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), outScore,
        col("n_terms_matched"))
  }

  /** Positional postings: one row per token OCCURRENCE `(tok, doc_id,
    * pos)` — the index behind exact phrase search, the retrieval
    * operation BM25's bag-of-words postings cannot express (bags know
    * a doc has "new" and "york", not that they are adjacent). Build
    * cost: one tokenize + posexplode, no aggregation at all; persist
    * once per frozen corpus next to [[bm25Index]]. Size: one row per
    * corpus token (the index IS the tokenized corpus re-keyed), so at
    * 100 TB partition/cluster it by `tok` — every search touches only
    * its phrases' posting lists. */
  def positionalIndex(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(toks(col(textCol))).as(Seq("pos", "tok")))

  /** Exact phrase search against a standing [[positionalIndex]]: top-k
    * documents per phrase by OCCURRENCE COUNT of the exact token
    * sequence (case-folded, same `[a-z0-9]+` tokenization as the rest
    * of the family). One aggregation finds every occurrence of every
    * phrase — the DIAGONAL-ANCHOR trick ([[Dedup]] uses the same math
    * for duplicated-span detection): a phrase occurrence starting at
    * document position `a` puts its `qpos`-th token at `pos = a +
    * qpos`, so every matched (phrase token, posting) pair votes for
    * anchor `pos − qpos`, and an anchor collecting ALL `qlen` distinct
    * phrase positions is one complete occurrence. No per-term
    * self-join chain (the classic positional-intersection plan is
    * n−1 joins for an n-word phrase); arbitrary phrase length at one
    * `(query, doc, anchor)` hash aggregate whose input is bounded by
    * the matched posting lists. Repeated phrase tokens are exact (a
    * (query,qpos,doc,pos) pair joins at most once — each side holds
    * one token per position); overlapping occurrences count separately
    * (distinct anchors), the standard convention. Everything is
    * integer arithmetic — ranks, counts, and ties (n_matches desc,
    * doc_id asc) sit bit-identical under the cross-engine hash gate.
    * The query side carries the family's [[Similarity.fitsDriver]]
    * broadcast gate. Output: `(query_id, rank, doc_id, n_matches)`;
    * phrases with no full occurrence contribute no rows. */
  def phraseSearchWith(phrases: DataFrame, index: DataFrame, k: Int = 10,
                       queryTextCol: String = "query_text",
                       queryIdCol: String = "query_id",
                       maxBroadcastQueries: Int = 65536): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val qtok = phrases.select(col(queryIdCol).as("query_id"),
      posexplode(toks(col(queryTextCol))).as(Seq("qpos", "tok")))
    val qlen = qtok.groupBy("query_id").agg(count(lit(1)).as("__qlen__"))
    val small = Similarity.fitsDriver(phrases, maxBroadcastQueries)
    val qSide = if (small) broadcast(qtok) else qtok
    val qlenSide = if (small) broadcast(qlen) else qlen
    val occurrences = index.join(qSide, Seq("tok"))
      .groupBy(col("query_id"), col("doc_id"),
        (col("pos") - col("qpos")).as("__anchor__"))
      .agg(count(lit(1)).as("__n__"))
      .join(qlenSide, Seq("query_id"))
      .filter(col("__n__") === col("__qlen__"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("n_matches").desc, col("doc_id").asc)
    occurrences.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_matches"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "n_matches")
  }

  /** One-shot [[phraseSearchWith]]: index and search in one plan. */
  def phraseSearch(docs: DataFrame, phrases: DataFrame, k: Int = 10,
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    phraseSearchWith(phrases, positionalIndex(docs, textCol, idCol), k)

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009 — the
    * standard way to combine heterogeneous rankers, used by every
    * hybrid lexical+vector search stack): each ranking contributes
    * `1/(rrfK + rank)` per (query, doc), summed across rankers.
    * Computed integer-exact as `SCALE div (rrfK + rank)` — ranks are
    * small integers, so the quantization error (< 1 part in 10^7 of
    * the largest term) never reorders anything RRF itself wouldn't
    * call a tie, and the summed BIGINT is bit-identical in any engine.
    * Each input is a `(query_id, doc_id, rank)` list; docs missing
    * from a ranker simply contribute nothing (standard RRF).
    * Shape: union of k-bounded rank lists (tiny), one hash aggregate,
    * one per-query top-k window. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0 && rrfK >= 0, s"bad k=$k / rrfK=$rrfK")
    import org.apache.spark.sql.expressions.Window
    val all = rankings
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_ unionByName _)
    val scored = all
      .withColumn("__rrf__", expr(s"$Scale div ($rrfK + rank)"))
      .groupBy("query_id", "doc_id")
      .agg(sum("__rrf__").as("rrf_scaled"), count(lit(1)).as("n_sources"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_scaled").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_scaled"), col("n_sources"))
  }

  /** Hybrid lexical+vector retrieval: exact-mode BM25 over the text
    * side and brute-force cosine over the embedding side, fused by
    * [[rrfFuse]]. `queriesText` is `(query_id, query_text)`;
    * `queriesVec` is `(vec_id, embedding)` query-by-example probes
    * whose `vec_id` MUST equal the matching `query_id` (the fusion
    * joins on it). The vector ranker excludes the probe itself
    * (query-by-example convention); the lexical ranker has no such
    * notion — RRF fuses whatever each ranker returns. At scale use
    * [[hybridTopKWith]], which serves both rankers from standing
    * indexes; fusion is ranker-agnostic. */
  def hybridTopK(docs: DataFrame, embeddings: DataFrame,
                 queriesText: DataFrame, queriesVec: DataFrame, k: Int,
                 kPerRanker: Int = 20, rrfK: Int = 60,
                 textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val lex = bm25TopK(docs, queriesText, kPerRanker, exact = true,
        textCol = textCol, idCol = idCol)
      .select("query_id", "doc_id", "rank")
    val vec = Similarity.bruteForceTopK(embeddings, queriesVec, kPerRanker)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, vec), k, rrfK)
  }

  /** Hybrid retrieval served ENTIRELY from standing indexes — the
    * production form of [[hybridTopK]]: the lexical ranker runs
    * [[bm25SearchWith]] against a persisted [[bm25Index]] (exact
    * integer mode), the vector ranker runs
    * [[Similarity.ivfPqTopKWith]] against a persisted IVF-PQ index
    * (probe-pruned ADC scan + exact re-rank), and [[rrfFuse]] combines
    * the two k-bounded rank lists. Nothing here scans the corpus text
    * or raw vectors beyond each ranker's own candidate sets, and both
    * rankers carry the query-batch size gates — so this entry point
    * serves everything from a query-by-example probe to a
    * million-query RAG back-fill against 100 TB-scale indexes.
    * `queriesVec.vec_id` must equal the matching text `query_id`
    * ([[hybridTopK]]'s fusion-join convention). */
  def hybridTopKWith(queriesText: DataFrame, queriesVec: DataFrame,
                     bm25Idx: DataFrame,
                     cents: Array[Array[Double]],
                     books: Array[Array[Array[Double]]],
                     codes: DataFrame, corpusVecs: DataFrame, k: Int,
                     kPerRanker: Int = 20, rrfK: Int = 60,
                     nProbe: Int = 4, rerank: Int = 64): DataFrame = {
    val lex = bm25SearchWith(queriesText, bm25Idx, kPerRanker, exact = true)
      .select("query_id", "doc_id", "rank")
    val vec = Similarity.ivfPqTopKWith(cents, books, codes, corpusVecs,
        queriesVec, kPerRanker, nProbe, rerank)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, vec), k, rrfK)
  }

  /** Two-stage CASCADE retrieval — the other production composition
    * next to [[hybridTopKWith]]'s fusion: stage 1 recalls each query's
    * top `recallN` documents by exact-mode BM25 against the standing
    * index (cheap, lexical, integer-exact), stage 2 re-ranks ONLY
    * those candidates by exact cosine between the query vector and
    * the documents' embeddings. Fusion treats the rankers as peers;
    * a cascade uses the cheap ranker to bound the expensive one's
    * work — the re-rank join touches `recallN × |queries|` rows no
    * matter the corpus size, which is why this shape (retrieve →
    * re-rank) is the default architecture of every neural search
    * stack. `queriesVec.vec_id` must equal the matching text
    * `query_id`; candidates without an embedding drop (inner join —
    * an unembedded doc cannot be re-ranked). Output: `(query_id,
    * rank, doc_id, bm25_rank)` — the rank movement between the two
    * columns IS the re-ranker's contribution. */
  def cascadeRerank(queriesText: DataFrame, queriesVec: DataFrame,
                    bm25Idx: DataFrame, embeddings: DataFrame,
                    recallN: Int = 100, k: Int = 10): DataFrame = {
    require(k >= 1 && recallN >= k,
      s"need 1 <= k <= recallN, got k=$k recallN=$recallN")
    import org.apache.spark.sql.expressions.Window
    val cands = bm25SearchWith(queriesText, bm25Idx, recallN, exact = true)
      .select(col("query_id"), col("doc_id"), col("rank").as("bm25_rank"))
    val q = queriesVec.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("qvec"))
    val c = embeddings.select(col("vec_id").as("doc_id"),
      col("embedding").cast("array<double>").as("cvec"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos__").desc, col("doc_id").asc)
    cands.join(c, "doc_id").join(q, "query_id")
      .withColumn("__cos__",
        Similarity.nativeCosine(embeddings.sparkSession, col("qvec"),
          col("cvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "bm25_rank")
  }

  /** One-shot form: index the corpus and search in one plan. Fine for
    * ad-hoc runs; at 100 TB persist [[bm25Index]] once and use
    * [[bm25SearchWith]] so each query batch touches only its matched
    * posting lists. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 5,
               exact: Boolean = false, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame =
    bm25SearchWith(queries, bm25Index(docs, textCol, idCol), k, exact)
}
