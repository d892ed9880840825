package graft

import graft.llm.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an implemented operator from SURVEY.md §2
  * (or a beyond-parity LLM-pipeline operator); [[oracleSql]] holds the
  * DuckDB-equivalent SQL for the driver's hash compare. Column names and
  * value renderings (timestamps cast to string, exact-decimal sums) are
  * aligned between both sides by construction.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q5RegionRevenue(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // analytics core (joins/aggs/windows/sort/limit — SURVEY §2.4)
    "q1_pricing_summary" -> (Queries.q1PricingSummary(_, _)),
    "q3_top_orders" -> (Queries.q3TopOrders(_, _)),
    "q5_region_revenue" -> (Queries.q5RegionRevenue(_, _)),
    "events_window" -> (Queries.eventsWindow(_, _)),
    // metadata-hash core + write patterns (SURVEY §1.4, §2.2)
    "key_data_hash" -> (Queries.keyDataHash(_, _)),
    "append_basic" -> (Queries.appendBasic(_, _)),
    "append_managed" -> (Queries.appendManaged(_, _)),
    "overwrite_managed" -> (Queries.overwriteManaged(_, _)),
    "scd1_upsert" -> (Queries.scd1Upsert(_, _)),
    "scd2_initial" -> (Queries.scd2Initial(_, _)),
    "scd2_two_loads" -> (Queries.scd2TwoLoads(_, _)),
    "scd3_shift" -> (Queries.scd3Shift(_, _)),
    "constraint_violations" -> (Queries.constraintViolations(_, _)),
    // task model + features + CDC + streaming (SURVEY §2.3, §2.7, §2.8, §2.9)
    "task_e2e_csv_append" -> (Queries.taskE2eCsvAppend(_, _)),
    "cdc_two_runs" -> (Queries.cdcTwoRuns(_, _)),
    "stream_append" -> (Queries.streamAppend(_, _)),
    // LLM-pipeline text operators
    "dedup_exact" -> ((s, d) => TextOps.exactDedupStats(Queries.pq(s, d, "documents"))),
    "text_quality" -> ((s, d) => TextOps.textQuality(Queries.pq(s, d, "documents"))),
    "token_count" -> ((s, d) => TextOps.tokenCount(Queries.pq(s, d, "documents"))),
    "lang_id" -> ((s, d) => TextOps.langId(Queries.pq(s, d, "documents"))),
    "doc_fingerprint" -> ((s, d) => TextOps.fingerprint(Queries.pq(s, d, "documents"))))

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Queries.q1Sql,
    "q3_top_orders" -> Queries.q3Sql,
    "q5_region_revenue" -> Queries.q5Sql,
    "events_window" -> Queries.eventsWindowSql,
    "key_data_hash" -> Queries.keyDataHashSql,
    "append_basic" -> Queries.appendBasicSql,
    "append_managed" -> Queries.appendManagedSql,
    "overwrite_managed" -> Queries.overwriteManagedSql,
    "scd1_upsert" -> Queries.scd1UpsertSql,
    "scd2_initial" -> Queries.scd2InitialSql,
    "scd2_two_loads" -> Queries.scd2TwoLoadsSql,
    "scd3_shift" -> Queries.scd3ShiftSql,
    "constraint_violations" -> Queries.constraintViolationsSql,
    "task_e2e_csv_append" -> Queries.taskE2eCsvAppendSql,
    "cdc_two_runs" -> Queries.cdcTwoRunsSql,
    "stream_append" -> Queries.streamAppendSql,
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        | length(text) AS n_chars,
        | length(text) - length(replace(text, ' ', '')) AS n_spaces,
        | len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
        | len(regexp_extract_all(text, '[.!?]')) AS n_sentence_punct,
        | len(regexp_extract_all(text, '[0-9]')) AS n_digits,
        | length(text) - length(replace(text, ' the ', '')) AS stopword_score
        |FROM documents""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        | len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
        | len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_word_tokens,
        | len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS n_bpeish_tokens
        |FROM documents""".stripMargin,
    "lang_id" ->
      """WITH t AS (SELECT doc_id, ' ' || lower(text) || ' ' AS tx FROM documents),
        |s AS (SELECT doc_id,
        | (length(tx) - length(replace(tx, ' the ', ''))) + (length(tx) - length(replace(tx, ' and ', ''))) + (length(tx) - length(replace(tx, ' a ', ''))) AS score_en,
        | (length(tx) - length(replace(tx, ' der ', ''))) + (length(tx) - length(replace(tx, ' und ', ''))) + (length(tx) - length(replace(tx, ' die ', ''))) AS score_de,
        | (length(tx) - length(replace(tx, ' le ', ''))) + (length(tx) - length(replace(tx, ' et ', ''))) + (length(tx) - length(replace(tx, ' la ', ''))) AS score_fr,
        | (length(tx) - length(replace(tx, ' el ', ''))) + (length(tx) - length(replace(tx, ' y ', ''))) + (length(tx) - length(replace(tx, ' los ', ''))) AS score_es
        | FROM t)
        |SELECT doc_id, score_en, score_de, score_fr, score_es,
        | CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
        |      WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
        |      WHEN score_fr >= score_es THEN 'fr'
        |      ELSE 'es' END AS predicted_lang
        |FROM s""".stripMargin,
    "doc_fingerprint" ->
      """SELECT doc_id,
        | md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fingerprint,
        | len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
        |FROM documents""".stripMargin)
}
