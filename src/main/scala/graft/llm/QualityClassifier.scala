package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Model-based quality filtering — the "learned filter" stage of a
 * training-data pipeline (GPT-3's quality classifier, CCNet's learned
 * gates): distill cheap rule verdicts (Gopher/C4-style gates) into a
 * multinomial Naive Bayes text classifier (McCallum & Nigam 1998)
 * that generalizes them from token evidence, then score every
 * document with the learned per-token log-odds.
 *
 * Why NB and not a deep scorer: training is ONE tokenize pass and ONE
 * shuffle on token (a word-count per class), the model is a
 * Zipf-bounded `(token, n_pos, n_neg)` table that persists as a
 * managed table and scores any later batch without retraining, and
 * every number in the model is an integer count — so an independent
 * engine can re-derive the model and the decisions from the raw
 * corpus, which is what the kmv/CMS-style oracle gate does.
 *
 * Decision rule (add-one smoothing, token multiplicity counted —
 * the standard multinomial form):
 *
 *   score(d) = ln(d_pos/d_neg)
 *            + Σ_{t∈d} [ ln((n_pos(t)+1)/(t_pos+V)) −
 *                        ln((n_neg(t)+1)/(t_neg+V)) ]
 *   label(d) = score(d) > 0
 *
 * The score is floating (libm-dependent at the last ulp, and
 * float-sum order differs between engines), so decisions are only
 * engine-stable away from the boundary: [[scoreWith]] exposes the
 * margin and callers gate `min |score|` in-query before hashing the
 * labels — the same posture as bigram fluency's spec-pinned `ppl`
 * next to its oracle-exact integer verdict.
 *
 * Scale shape: training is explode → one hash-agg on token (map-side
 * combined, vocabulary Zipf-bounded). Scoring is explode → ONE
 * equi-join against the model (AQE-broadcast when the vocab is
 * small) → one doc-keyed aggregate. No driver-side loops; the class
 * totals are five bounded scalars collected once and inlined as plan
 * literals.
 */
object QualityClassifier {

  private def toks(textCol: String): Column =
    regexp_extract_all(lower(col(s"`$textCol`")), lit("[a-z0-9]+"), lit(0))

  /** Train token-level class counts from a weakly-labeled corpus.
    * `labelCol` is 1/0 (or boolean) — 1 = keep-quality. Returns the
    * model as a single DataFrame: one row per token
    * `(token, n_pos, n_neg)` — persist it as a managed table to score
    * later batches with [[scoreWith]] without retraining. */
  def train(docs: DataFrame, textCol: String = "text",
            labelCol: String = "weak_label"): DataFrame = {
    val y = col(s"`$labelCol`").cast("int")
    docs.select(y.as("__y__"), explode(toks(textCol)).as("token"))
      .groupBy("token")
      .agg(sum(col("__y__")).cast("long").as("n_pos"),
        sum(lit(1) - col("__y__")).cast("long").as("n_neg"))
  }

  /** Doc-count priors for the corpus the model was trained on. */
  def priors(docs: DataFrame, labelCol: String = "weak_label"): DataFrame = {
    val y = col(s"`$labelCol`").cast("int")
    docs.agg(sum(y).cast("long").as("d_pos"),
      (count(lit(1)) - sum(y)).cast("long").as("d_neg"))
  }

  /** Score a batch against a standing model: appends
    * `nb_score` (double log-odds), `nb_label` (int 1/0) and
    * `nb_margin` (|score|). Tokens unseen in training get the pure
    * smoothing weight (the `coalesce(.., 0)` path); empty documents
    * score the prior alone. */
  def scoreWith(batch: DataFrame, model: DataFrame, priorRow: DataFrame,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // five bounded scalars, collected once (the audited 1-row pattern)
    // and inlined as literals — keeps the scoring plan to ONE model
    // join + ONE doc-keyed aggregate, no scalar broadcasts
    val t = model.agg(
      sum("n_pos").cast("double").as("tp"),
      sum("n_neg").cast("double").as("tn"),
      count(lit(1)).cast("double").as("v")).collect().head
    val p = priorRow.select(col("d_pos").cast("double"),
      col("d_neg").cast("double")).collect().head
    val (tpv, tnv) = (t.getDouble(0) + t.getDouble(2), t.getDouble(1) + t.getDouble(2))
    val prior = math.log(p.getDouble(0) / p.getDouble(1))
    val perDoc = batch
      .select(col(s"`$idCol`"), explode(toks(textCol)).as("token"))
      .join(model, Seq("token"), "left")
      .withColumn("__w__",
        log((coalesce(col("n_pos"), lit(0L)).cast("double") + 1.0) / lit(tpv)) -
        log((coalesce(col("n_neg"), lit(0L)).cast("double") + 1.0) / lit(tnv)))
      .groupBy(col(s"`$idCol`"))
      .agg(sum(col("__w__")).as("__sumw__"))
    batch.join(perDoc, Seq(idCol), "left")
      .withColumn("nb_score", lit(prior) + coalesce(col("__sumw__"), lit(0.0)))
      .withColumn("nb_label", (col("nb_score") > 0).cast("int"))
      .withColumn("nb_margin", abs(col("nb_score")))
      .drop("__sumw__")
  }

  /** One-shot: weak-label the corpus with `weakLabel`, train on it,
    * score it with its own model (tokenizes twice — at 100 TB persist
    * [[train]]'s model once and score batches with [[scoreWith]]). */
  def classify(docs: DataFrame, weakLabel: Column,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val labeled = docs.withColumn("weak_label", weakLabel.cast("int"))
    scoreWith(labeled, train(labeled, textCol), priors(labeled),
      textCol, idCol)
  }
}
