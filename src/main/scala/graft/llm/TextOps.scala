package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines.
 * All are single-pass, codegen-friendly column expressions (no UDFs), so
 * they stay inside WholeStageCodegen and scale linearly with the corpus:
 * the only shuffle in this file is the dedup groupBy on the 128-bit text
 * hash, which partitions evenly by construction.
 */
object TextOps {

  /** Exact-duplicate groups: one row per distinct text, with the winning
    * (minimum) doc id and the duplicate count. Hash-groupBy — the shuffle
    * key is md5(text), uniformly distributed at any scale. */
  def exactDedupStats(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** The deduplicated corpus: keeps the min-id document of each exact-text
    * group. Implemented as an aggregate + semi join (both on the same key,
    * so AQE plans a single exchange reuse), never a window sort. */
  def exactDedup(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val keep = exactDedupStats(docs, textCol, idCol)
      .select(col("keep_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  private def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Substring-occurrence score: `length(t) - length(replace(t, s, ''))`
    * — a multiple of `length(s)`, kept un-divided so integer semantics
    * are identical across engines. Literal (non-regex) replace. */
  private def occScore(c: Column, s: String): Column =
    length(c) - length(call_function("replace", c, lit(s), lit("")))

  /** Per-document quality signals: size, whitespace, punctuation and
    * case counts — the length/punct/stopword-ratio family. Counts (not
    * ratios) so results are exact integers. */
  def textQuality(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      length(t).as("n_chars"),
      (length(t) - length(call_function("replace", t, lit(" "), lit("")))).as("n_spaces"),
      countMatches(t, "[A-Z]").as("n_upper"),
      countMatches(t, "[.!?]").as("n_sentence_punct"),
      countMatches(t, "[0-9]").as("n_digits"),
      occScore(t, " the ").as("stopword_score"))
  }

  /** Token counts: whitespace tokens plus a BPE-ish regex segmentation
    * (runs of alphanumerics, or single non-alphanumeric non-space marks). */
  def tokenCount(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      size(split(trim(t), "\\s+")).as("n_ws_tokens"),
      size(regexp_extract_all(lower(t), lit("[a-z0-9]+"), lit(0))).as("n_word_tokens"),
      size(regexp_extract_all(lower(t), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))
        .as("n_bpeish_tokens"))
  }

  /** Stopword-profile language ID (n-gram heuristic): per-language scores
    * from distinctive function-word occurrences; the argmax (ties broken by
    * the fixed en>de>fr>es order) is the prediction. Pure expressions —
    * deterministic and identically computable in any SQL engine. */
  def langId(docs: DataFrame, textCol: String = "text",
             idCol: String = "doc_id"): DataFrame = {
    val t = concat(lit(" "), lower(col(textCol)), lit(" "))
    val en = occScore(t, " the ") + occScore(t, " and ") + occScore(t, " a ")
    val de = occScore(t, " der ") + occScore(t, " und ") + occScore(t, " die ")
    val fr = occScore(t, " le ") + occScore(t, " et ") + occScore(t, " la ")
    val es = occScore(t, " el ") + occScore(t, " y ") + occScore(t, " los ")
    docs.select(
      col(idCol),
      en.as("score_en"), de.as("score_de"), fr.as("score_fr"), es.as("score_es"),
      when(en >= de && en >= fr && en >= es, lit("en"))
        .when(de >= fr && de >= es, lit("de"))
        .when(fr >= es, lit("fr"))
        .otherwise(lit("es")).as("predicted_lang"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1 use duplicate
    * line / n-gram fractions as quality gates for web text): counts of
    * total vs distinct lines and word bigrams per document. Emitted as
    * exact integer COUNTS — the caller derives fractions — so the values
    * hash identically across engines. Line counts use built-in split;
    * bigrams reuse the [[Dedup.shingles]] tight-loop UDF (the HOF
    * formulation is interpreted per element — see Dedup's scaladoc). */
  def repetitionSignals(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n")
    val toks = regexp_extract_all(lower(t), lit("[a-z0-9]+"), lit(0))
    docs.select(
      col(idCol),
      size(lines).as("n_lines"),
      size(array_distinct(lines)).as("n_distinct_lines"),
      greatest(size(toks) - 1, lit(0)).as("n_word_2grams"),
      size(array_distinct(Dedup.shingles(t, 2))).as("n_distinct_2grams"))
  }

  /** Duplicated-passage removal at paragraph granularity — the corpus
    * cleanup C4 does for repeated spans and Dolma does per paragraph:
    * across the WHOLE corpus only the first occurrence of each paragraph
    * survives (first = smallest `(doc_id, paragraph index)`, a total
    * order, so the result is deterministic), and every document is
    * reconstructed without its duplicated paragraphs. Whitespace-only
    * paragraphs are layout, not content — they never compete and are
    * always kept.
    *
    * Scale shape: the global first occurrence is `min(doc_id, idx)` PER
    * CONTENT HASH via groupBy-agg (map-side partial aggregation collapses
    * a boilerplate paragraph duplicated a billion times into one row per
    * mapper — a row_number window would ship every copy to one reducer
    * with no combine and no AQE skew handling), then an equi-join back on
    * the hash (AQE splits any residual skewed partition) and one
    * per-document regroup — no all-pairs comparison anywhere. */
  def dedupParagraphs(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val p = docs.select(col(idCol), posexplode(split(col(textCol), "\n")))
      .toDF(idCol, "para_idx", "para")
      .withColumn("__h", md5(trim(col("para"))))
    val firsts = p.filter(trim(col("para")) =!= "")
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("para_idx"))).as("__first"))
    val flagged = p.join(firsts, Seq("__h"), "left")
      .withColumn("keep",
        trim(col("para")) === "" ||
          struct(col(idCol), col("para_idx")) === col("__first"))
    flagged.groupBy(col(idCol)).agg(
      array_join(
        transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("para_idx"), col("para"))))),
          s => s.getField("para")),
        "\n").as("clean_text"),
      count(lit(1)).as("n_paras"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_paras_kept"))
  }

  /** Gopher quality gate (Rae et al. 2021, "Scaling Language Models",
    * §A1.1 — the published web-text filter rules): per-document signals
    * as EXACT INTEGER counts plus the composite verdict, with every
    * ratio rule rewritten as integer arithmetic (`10·symbols < words`
    * instead of `symbols/words < 0.1`) so the result hashes identically
    * in any engine — no float thresholds anywhere. Rules covered: word
    * count in [50, 100k]; mean word length in [3, 10]; hash/ellipsis
    * symbol ratio < 0.1; bullet-started lines < 90%; ellipsis-ended
    * lines < 30%; words with an alphabetic char > 80%; at least two
    * distinct common stop words present. Pure built-in expressions —
    * narrow, shuffle-free, codegen'd; at 100 TB this is one scan.
    *
    * Rae-rule parity: this is the QUALITY half of the published filter;
    * the repetition half (duplicate line/paragraph/n-gram fractions,
    * Table A1) is [[gopherRepetition]], the language filter is [[langId]],
    * and the blocklist rules live in [[c4LineFilter]]. */
  def gopherQuality(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val ws = split(trim(t), "\\s+")
    val nWords = size(ws)
    val wordChars = aggregate(ws, lit(0), (acc, w) => acc + length(w))
    val nAlphaWords = size(filter(ws, w => w.rlike("[a-zA-Z]")))
    val nHash = size(regexp_extract_all(t, lit("#"), lit(0)))
    // "..." occurrences via replace-shrink; the count is (removed chars)/3,
    // exact because every removed char belongs to one occurrence
    val nEllipsis =
      ((length(t) - length(call_function("replace", t, lit("..."), lit("")))) / 3)
        .cast("int")
    val lines = transform(split(t, "\n"), l => trim(l))
    val nLines = size(lines)
    val nBullet = size(filter(lines, l => l.rlike("^[-*]")))
    val nEllLines = size(filter(lines, l => l.rlike("\\.\\.\\.$")))
    val padded = concat(lit(" "), lower(t), lit(" "))
    val nStops = Seq(" the ", " be ", " to ", " of ", " and ", " that ",
        " have ", " with ")
      .map(s => when(padded.contains(s), 1).otherwise(0))
      .reduce(_ + _)
    val nSymbols = nHash + nEllipsis
    docs.select(
      col(idCol),
      nWords.as("n_words"),
      wordChars.as("n_word_chars"),
      nAlphaWords.as("n_alpha_words"),
      nSymbols.as("n_symbols"),
      nLines.as("n_lines"),
      nBullet.as("n_bullet_lines"),
      nEllLines.as("n_ellipsis_lines"),
      nStops.as("n_stopwords"),
      (nWords >= 50 && nWords <= 100000 &&
        wordChars >= nWords * 3 && wordChars <= nWords * 10 &&
        nSymbols * 10 < nWords &&
        nBullet * 10 < nLines * 9 &&
        nEllLines * 10 < nLines * 3 &&
        nAlphaWords * 10 > nWords * 8 &&
        nStops >= 2).cast("int").as("passes_gopher"))
  }

  /** Per-document counters backing [[gopherRepetition]]; all sizes are
    * exact integer counts so the verdict arithmetic is float-free. */
  private case class RepStats(
      nWords: Long, nWordChars: Long,
      nLines: Long, nDupLines: Long, nLineChars: Long, nDupLineChars: Long,
      nParas: Long, nDupParas: Long, nParaChars: Long, nDupParaChars: Long,
      top2: Long, top3: Long, top4: Long,
      dup5: Long, dup6: Long, dup7: Long, dup8: Long, dup9: Long, dup10: Long)

  /** SQL-semantics trim: strips ' ' only. `String.trim` also strips
    * `\n`/`\t` (anything ≤ U+0020), which would diverge from the SQL
    * `trim()` every other engine runs on the same text. */
  private def sqlTrim(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  /** (total, occurrences-beyond-first, total chars, chars in
    * occurrences-beyond-first) over `items`, where an item's char size is
    * `length - sepChars` (grams are space-joined, so `sepChars = n - 1`
    * recovers the pure token chars). */
  private def dupCounts(items: Iterable[String], sepChars: Int): (Long, Long, Long, Long) = {
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    items.foreach(it => counts.update(it, counts.getOrElse(it, 0) + 1))
    var total = 0L; var dups = 0L; var totalChars = 0L; var dupChars = 0L
    counts.foreach { case (item, cnt) =>
      val chars = (item.length - sepChars).toLong
      total += cnt
      totalChars += cnt * chars
      if (cnt > 1) { dups += cnt - 1; dupChars += (cnt - 1) * chars }
    }
    (total, dups, totalChars, dupChars)
  }

  /** One-pass per-document repetition kernel. Deliberately a tight JVM
    * UDF, not HOF expressions: duplicate counting needs a hash map per
    * document (the declarative formulation is O(items²) interpreted — the
    * same measured rationale as [[Dedup.shingles]]). Still narrow,
    * partition-parallel, shuffle-free. */
  private def repStatsOf(text: String): RepStats = {
    if (text == null)
      return RepStats(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val lines = text.split("\n").iterator.map(sqlTrim).filter(_.nonEmpty).toSeq
    val paras = text.split("\n\n").iterator.map(sqlTrim).filter(_.nonEmpty).toSeq
    val (nL, dL, cL, dcL) = dupCounts(lines, 0)
    val (nP, dP, cP, dcP) = dupCounts(paras, 0)
    val toks = Dedup.tokenize(text)
    var nWordChars = 0L
    toks.foreach(t => nWordChars += t.length)
    // per n: either the top-gram char mass (n = 2..4) or the duplicated
    // char mass (n = 5..10), from one HashMap pass per n
    val top = new Array[Long](5)
    val dup = new Array[Long](11)
    var n = 2
    while (n <= 10) {
      if (toks.length >= n) {
        val m = scala.collection.mutable.HashMap.empty[String, Int]
        var i = 0
        val sb = new java.lang.StringBuilder
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j)); j += 1
          }
          val g = sb.toString
          m.update(g, m.getOrElse(g, 0) + 1)
          i += 1
        }
        if (n <= 4) {
          // most-frequent gram's char mass; ties broken by the mass itself
          // (max over (count, count·chars) lexicographically) so the result
          // is deterministic — Counter-insertion-order tie-breaks are not
          var bc = 0; var bm = 0L
          m.foreach { case (g, cnt) =>
            val mass = cnt.toLong * (g.length - (n - 1))
            if (cnt > bc || (cnt == bc && mass > bm)) { bc = cnt; bm = mass }
          }
          top(n) = bm
        } else {
          var s = 0L
          m.foreach { case (g, cnt) =>
            if (cnt > 1) s += (cnt - 1).toLong * (g.length - (n - 1))
          }
          dup(n) = s
        }
      }
      n += 1
    }
    RepStats(toks.length.toLong, nWordChars, nL, dL, cL, dcL, nP, dP, cP, dcP,
      top(2), top(3), top(4), dup(5), dup(6), dup(7), dup(8), dup(9), dup(10))
  }

  /** Gopher repetition gate (Rae et al. 2021, Table A1 — the published
    * MassiveWeb repetition filters), companion to [[gopherQuality]]'s
    * quality rules. Thresholds are EXACTLY Table A1's, each rewritten as
    * integer arithmetic so the verdict hashes identically in any engine:
    *
    *   | rule                         | threshold | integer form                    |
    *   |------------------------------|-----------|---------------------------------|
    *   | duplicate line fraction      | ≤ 0.30    | 10·dup_lines ≤ 3·lines          |
    *   | duplicate paragraph fraction | ≤ 0.30    | 10·dup_paras ≤ 3·paras          |
    *   | dup line char fraction       | ≤ 0.20    | 5·dup_line_chars ≤ line_chars   |
    *   | dup paragraph char fraction  | ≤ 0.20    | 5·dup_para_chars ≤ para_chars   |
    *   | top 2-gram char fraction     | ≤ 0.20    | 5·top2 ≤ word_chars             |
    *   | top 3-gram char fraction     | ≤ 0.18    | 50·top3 ≤ 9·word_chars          |
    *   | top 4-gram char fraction     | ≤ 0.16    | 25·top4 ≤ 4·word_chars          |
    *   | dup 5-gram char fraction     | ≤ 0.15    | 20·dup5 ≤ 3·word_chars          |
    *   | dup 6-gram char fraction     | ≤ 0.14    | 50·dup6 ≤ 7·word_chars          |
    *   | dup 7-gram char fraction     | ≤ 0.13    | 100·dup7 ≤ 13·word_chars        |
    *   | dup 8-gram char fraction     | ≤ 0.12    | 25·dup8 ≤ 3·word_chars          |
    *   | dup 9-gram char fraction     | ≤ 0.11    | 100·dup9 ≤ 11·word_chars        |
    *   | dup 10-gram char fraction    | ≤ 0.10    | 10·dup10 ≤ word_chars           |
    *
    * Documented deviations from the paper's prose (chosen for determinism
    * and cross-engine exactness; the paper leaves them unspecified):
    * lines/paragraphs are space-trimmed and blank ones don't compete;
    * "characters" means token chars (`[a-z0-9]+` of the lowercased text,
    * separators excluded) so every fraction shares one denominator;
    * duplicated-n-gram char mass counts occurrences BEYOND the first
    * (`(count−1)·chars`, overlapping occurrences each count — positional
    * coverage is not expressible without per-position bookkeeping that no
    * SQL engine reproduces bit-for-bit); the top-gram tie-break is by
    * char mass, never hash-map iteration order. Word-count floors, mean
    * word length, symbol ratios and stop-word rules live in
    * [[gopherQuality]]; the language filter is [[langId]]; the
    * "lorem ipsum"/blocklist rules live in [[c4LineFilter]]. Together the
    * three cover every Rae Table-A1 rule that is integer-decidable; the
    * only ones deliberately out are the trained-classifier and
    * langdetect-model filters (model-weight-dependent, not reproducible
    * as arithmetic).
    *
    * Scale shape: ONE narrow scan — all stats are per-document, so there
    * is no shuffle anywhere; at 100 TB this parallelizes embarrassingly
    * across input splits. */
  def gopherRepetition(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val statsUdf = udf(repStatsOf _)
    docs
      .select(col(idCol), statsUdf(col(textCol)).as("__r"))
      .select(
        col(idCol),
        col("__r.nWords").as("n_words"),
        col("__r.nWordChars").as("n_word_chars"),
        col("__r.nLines").as("n_lines"),
        col("__r.nDupLines").as("n_dup_lines"),
        col("__r.nLineChars").as("n_line_chars"),
        col("__r.nDupLineChars").as("n_dup_line_chars"),
        col("__r.nParas").as("n_paras"),
        col("__r.nDupParas").as("n_dup_paras"),
        col("__r.nParaChars").as("n_para_chars"),
        col("__r.nDupParaChars").as("n_dup_para_chars"),
        col("__r.top2").as("top_2gram_chars"),
        col("__r.top3").as("top_3gram_chars"),
        col("__r.top4").as("top_4gram_chars"),
        col("__r.dup5").as("dup_5gram_chars"),
        col("__r.dup6").as("dup_6gram_chars"),
        col("__r.dup7").as("dup_7gram_chars"),
        col("__r.dup8").as("dup_8gram_chars"),
        col("__r.dup9").as("dup_9gram_chars"),
        col("__r.dup10").as("dup_10gram_chars"))
      .withColumn("passes_repetition",
        (col("n_words") > 0 &&
          col("n_dup_lines") * 10 <= col("n_lines") * 3 &&
          col("n_dup_paras") * 10 <= col("n_paras") * 3 &&
          col("n_dup_line_chars") * 5 <= col("n_line_chars") &&
          col("n_dup_para_chars") * 5 <= col("n_para_chars") &&
          col("top_2gram_chars") * 5 <= col("n_word_chars") &&
          col("top_3gram_chars") * 50 <= col("n_word_chars") * 9 &&
          col("top_4gram_chars") * 25 <= col("n_word_chars") * 4 &&
          col("dup_5gram_chars") * 20 <= col("n_word_chars") * 3 &&
          col("dup_6gram_chars") * 50 <= col("n_word_chars") * 7 &&
          col("dup_7gram_chars") * 100 <= col("n_word_chars") * 13 &&
          col("dup_8gram_chars") * 25 <= col("n_word_chars") * 3 &&
          col("dup_9gram_chars") * 100 <= col("n_word_chars") * 11 &&
          col("dup_10gram_chars") * 10 <= col("n_word_chars")).cast("int"))
  }

  /** C4 line-level cleaning (Raffel et al. 2020, §2.2 — the published
    * heuristics): keep lines that end in terminal punctuation, have at
    * least five words, and don't mention javascript; then keep the
    * document iff the cleaned text still has >= 3 sentence marks and the
    * raw text has no "lorem ipsum" and no curly brace. Line filtering is
    * a higher-order `filter` over the split array — one scan, no
    * explode/regroup shuffle — and the verdict is integer-exact. */
  def c4LineFilter(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val lines = transform(split(t, "\n"), l => trim(l))
    val kept = filter(lines, l =>
      l.rlike("[.!?\"]$") &&
        size(split(l, "\\s+")) >= 5 &&
        !lower(l).contains("javascript"))
    val cleanText = array_join(kept, "\n")
    val nSentences = size(regexp_extract_all(cleanText, lit("[.!?]"), lit(0)))
    docs.select(
      col(idCol),
      cleanText.as("clean_text"),
      size(lines).as("n_lines"),
      size(kept).as("n_lines_kept"),
      (nSentences >= 3 &&
        !lower(t).contains("lorem ipsum") &&
        !t.contains("{")).cast("int").as("keep_doc"))
  }

  /** Rolling-hash document fingerprint (Rabin-Karp-style over the word
    * sequence, mod 2^61-1) — a cheap order-sensitive signature, exactly
    * reproducible in SQL via the same fold. */
  def fingerprint(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    // polynomial rolling hash base 31 over character codes is cross-engine
    // fragile; instead fingerprint = md5 of the normalized token stream.
    val tokens = regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))
    docs.select(col(idCol),
      md5(concat_ws(" ", tokens)).as("fingerprint"),
      size(tokens).as("n_tokens"))
  }

  /**
   * Split documents into overlapping token-window chunks — the context
   * preparation step for training and retrieval pipelines. Chunk `k`
   * spans whitespace tokens `[k·stride, k·stride + chunkTokens)` with
   * `stride = chunkTokens - overlap`; the last chunk is the one whose
   * window reaches the end (shorter is fine), so every token appears in
   * at least one chunk and consecutive chunks share exactly `overlap`
   * tokens.
   *
   * Pure built-in expressions (split → sequence → explode → slice):
   * narrow, shuffle-free, and exactly recomputable in SQL — the chunk
   * boundary arithmetic is integer-only, so engines agree token for
   * token. Empty/whitespace-only docs produce no chunks.
   */
  def chunk(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id",
            chunkTokens: Int = 256, overlap: Int = 32): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val stride = chunkTokens - overlap
    val toks = split(trim(col(textCol)), "\\s+")
    val n = size(toks)
    // ceil((n - chunkTokens) / stride) in pure int arithmetic, floored at 0
    val lastK = greatest(lit(0),
      floor((n - chunkTokens + stride - 1).cast("double") / stride).cast("int"))
    docs
      .withColumn("__toks__", toks)
      .filter(length(trim(col(textCol))) > 0)
      .withColumn("chunk_id", explode(sequence(lit(0), lastK)))
      .withColumn("__ck__",
        slice(col("__toks__"), col("chunk_id") * stride + 1, lit(chunkTokens)))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", col("__ck__")).as("chunk_text"),
        size(col("__ck__")).as("n_chunk_tokens"))
  }

  /** PII patterns kept deliberately RE2-safe (character classes, bounded
    * quantifiers, non-capturing groups, inline `(?i)` — no lookaround, no
    * backrefs) so the identical regex runs on Spark (java.util.regex) and
    * any RE2-based engine, and the redaction is cross-engine reproducible.
    * The email pattern is case-insensitive: `John.Doe@Example.COM` is PII
    * exactly as much as its lowercase form. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}" -> "<EMAIL>",
    "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b" -> "<PHONE>",
    "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b" -> "<IP>")

  /** Redact every occurrence of each pattern with its token, in order.
    * Pure codegen'd `regexp_replace` chain — narrow, no UDF. Order
    * matters when patterns overlap (emails first, so an address is one
    * `<EMAIL>` rather than a word plus an `<IP>`-like tail). */
  def redact(docs: DataFrame, textCol: String = "text",
             patterns: Seq[(String, String)] = PiiPatterns,
             outCol: String = "text"): DataFrame = {
    val cleaned = patterns.foldLeft(col(textCol)) {
      case (c, (pattern, token)) => regexp_replace(c, pattern, token)
    }
    docs.withColumn(outCol, cleaned)
  }

  /** Per-(doc, token) term frequencies — the shared kernel under
    * [[rareTokenScore]] and [[tfidfKeywords]]. The explode is immediately
    * re-aggregated on (doc, token), so the shuffled volume is the
    * DISTINCT-token surface (with map-side combine), not the raw token
    * stream — the standard wordcount shape, linear at any corpus size.
    * Token convention matches [[tokenCount]]'s `n_word_tokens`. */
  private def docTermFreq(docs: DataFrame, textCol: String,
                          idCol: String): DataFrame =
    docs.select(col(idCol),
        explode(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
          .as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus-LM token rarity — the language-model quality signal of
    * CCNet (Wenzek et al. 2020) recast exact: instead of a KenLM
    * perplexity (whose `log` makes the score depend on each engine's
    * libm rounding), score each document by the exact integer count of
    * its token occurrences that are RARE under the corpus's own unigram
    * model (`corpus frequency < minFreq`). High rare fraction ≈ the
    * high-perplexity tail CCNet buckets away; the verdict is the pure
    * integer rule `n_rare_tokens · 5 ≤ n_tokens` (rare mass ≤ 20%) on
    * non-empty docs. Token-less documents survive with zero counts and
    * a failing verdict (nothing to attest quality).
    *
    * Scale shape: one wordcount aggregate ([[docTermFreq]]), a
    * frequency roll-up on `tok`, an equi-join back on `tok` (AQE
    * broadcast when the vocabulary is small), and a final doc-keyed
    * aggregate — every shuffle is on a naturally high-cardinality key.
    * The term-freq subtree feeds BOTH the per-doc side and the model
    * roll-up, so the one-shot form tokenizes the corpus twice; at
    * 100 TB prefer the production split — persist [[unigramModel]]
    * once, then [[rareTokenScoreWith]] per batch — which tokenizes
    * each document exactly once per scoring run. */
  def rareTokenScore(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id", minFreq: Long = 3): DataFrame =
    rareTokenScoreWith(docs, unigramModel(docs, textCol, idCol),
      textCol, idCol, minFreq)

  /** The corpus unigram LM behind [[rareTokenScore]]: `(tok, freq)`
    * occurrence counts. Persist it (parquet) and feed
    * [[rareTokenScoreWith]] to score DAILY batches at O(batch) cost —
    * the same persisted-index pattern as the incremental near-dup
    * family ([[Dedup.incrementalNearDupPairsWith]]). */
  def unigramModel(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    docTermFreq(docs, textCol, idCol)
      .groupBy("tok").agg(sum("tf").as("freq"))

  /** [[rareTokenScore]] against a STANDING model: batch tokens the LM
    * has never seen have corpus frequency 0 — maximally rare, exactly
    * the out-of-distribution signal an ingest gate wants. Only the
    * batch is tokenized; the model side is a plain `(tok, freq)` table
    * (broadcast when small). */
  def rareTokenScoreWith(batch: DataFrame, lm: DataFrame,
                         textCol: String = "text", idCol: String = "doc_id",
                         minFreq: Long = 3): DataFrame = {
    require(minFreq > 0, s"minFreq must be positive, got $minFreq")
    val dt = docTermFreq(batch, textCol, idCol)
    val perDoc = dt.join(lm, Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(sum("tf").as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens"),
        sum(when(coalesce(col("freq"), lit(0L)) < minFreq, col("tf"))
          .otherwise(0L)).as("n_rare_tokens"))
    batch.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct_tokens"), lit(0L)).as("n_distinct_tokens"),
        coalesce(col("n_rare_tokens"), lit(0L)).as("n_rare_tokens"),
        (coalesce(col("n_tokens"), lit(0L)) > 0 &&
          coalesce(col("n_rare_tokens"), lit(0L)) * 5 <=
            coalesce(col("n_tokens"), lit(0L)))
          .cast("int").as("passes_rarity"))
  }

  /** Ordered adjacent token pairs per doc: `(idCol, w1, w2)` — the raw
    * material for the bigram LM and its scoring join. posexplode keeps
    * token ORDER (a plain explode would lose adjacency); the pair build
    * is narrow (no shuffle until the model aggregate). */
  private def docBigrams(docs: DataFrame, textCol: String,
                         idCol: String): DataFrame =
    docs.select(col(idCol),
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))
          .as("__toks__"))
      .select(col(idCol), col("__toks__"),
        posexplode(col("__toks__")).as(Seq("__i__", "w2")))
      .filter(col("__i__") >= 1)
      // element_at is 1-based: position __i__ is the PREVIOUS token
      .select(col(idCol), element_at(col("__toks__"), col("__i__")).as("w1"),
        col("w2"))

  /** The corpus bigram LM: `(w1, w2, cnt)` adjacent-pair counts — the
    * 2-gram companion of [[unigramModel]], persisted the same way and
    * fed to [[bigramScoreWith]] to score daily batches at O(batch). */
  def bigramModel(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    docBigrams(docs, textCol, idCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))

  /** Corpus-wide collocation mining — the phrase-detection score of
    * Mikolov et al. 2013 ("Distributed representations of words and
    * phrases", §4): adjacent pairs whose joint count is high relative
    * to their parts' counts are phrases ("new york", byte-pair
    * candidates, multi-word entities for a tokenizer's seed vocab).
    * Score `= (c_xy − δ) · N / (c_x · c_y)` with `δ = minCount` as the
    * discount that suppresses rare-word noise (their formula verbatim;
    * it is PMI's argument with a subtracted prior, so the ranking is
    * PMI-rank-equivalent at equal δ). Pairs with `c_xy ≤ δ` drop.
    *
    * Engine-exact: products are computed in DECIMAL(38,0) (no BIGINT
    * overflow even at 100 TB pair counts), then ONE cast-to-double each
    * and ONE IEEE division — both correctly-rounded, so the score is
    * bit-identical in any engine, no `log` anywhere. The global top-k
    * is `orderBy(score desc, w1, w2).limit(k)` — a TakeOrdered (per-
    * partition partial top-k + driver merge of k·P rows), never a
    * global sort. Count tables (bigram LM + unigram LM + a 1-row
    * broadcast scalar) are the only shuffles; corpus text is scanned
    * once per model, and both models are the persistable
    * [[bigramModel]]/[[unigramModel]] so a standing corpus pays
    * neither scan again. */
  def collocations(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", minCount: Long = 5,
                   k: Int = 20): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(minCount > 0, s"minCount must be positive, got $minCount")
    val bg = bigramModel(docs, textCol, idCol)
      .withColumnRenamed("cnt", "pair_cnt")
      .filter(col("pair_cnt") > minCount)
    val uni = unigramModel(docs, textCol, idCol)
    val n = uni.agg(sum("freq").as("n_tokens"))
    val dec = "DECIMAL(38,0)"
    bg.join(uni.select(col("tok").as("w1"), col("freq").as("w1_cnt")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("freq").as("w2_cnt")), Seq("w2"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        expr(s"CAST(CAST(pair_cnt - $minCount AS $dec) * CAST(n_tokens AS $dec) AS DOUBLE)") /
          expr(s"CAST(CAST(w1_cnt AS $dec) * CAST(w2_cnt AS $dec) AS DOUBLE)"))
      .select(col("w1"), col("w2"), col("pair_cnt"), col("w1_cnt"),
        col("w2_cnt"), col("score"))
      .orderBy(col("score").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /**
   * Windowed co-occurrence mining with PMI-style scoring — the
   * word2vec-window generalization of [[collocations]] (which scores
   * ADJACENT pairs only): every unordered token pair within `window`
   * positions of each other in a document counts once per occurrence,
   * and pairs rank by the discounted normalized ratio
   * `(pair_cnt − minCount) · n_pairs / (w1_cnt · w2_cnt)` — PMI
   * without the log (log is monotone, so the top-k set and order are
   * PMI's; the ratio keeps the arithmetic one exact DECIMAL(38,0)
   * product per side and ONE IEEE division, bit-identical across
   * engines like [[collocations]]'s score).
   *
   * Scale shape: NO per-document self-join (a doc-keyed self-join is
   * quadratic in document length — a pathological 10^6-token doc
   * would explode). Instead the positional table joins ONCE against
   * itself exploded by offset `d ∈ [1, window]` on the exact key
   * `(doc, pos + d)` — the diagonal trick again — so candidate volume
   * is exactly `window · corpus_tokens`, linear at any document
   * length. Pairs canonicalize unordered (`least/greatest`);
   * `n_pairs` is the total windowed-pair count (the PMI normalizer).
   * Ties break (score desc, w1, w2) for a total order; top-k is a
   * TakeOrdered, never a global sort.
   */
  def cooccurrencePmi(docs: DataFrame, window: Int = 5,
                      textCol: String = "text", idCol: String = "doc_id",
                      minCount: Long = 5, k: Int = 20): DataFrame = {
    require(window >= 1 && window <= 64,
      s"window must be in [1, 64], got $window")
    require(k > 0, s"k must be positive, got $k")
    require(minCount > 0, s"minCount must be positive, got $minCount")
    val base = docs.select(col(idCol).as("__id__"),
      posexplode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as(Seq("__pos__", "__tok__")))
    val right = base.select(col("__id__"),
      explode(sequence(lit(1), lit(window))).as("__d__"),
      col("__pos__"), col("__tok__").as("__tb__"))
      .select(col("__id__"), (col("__pos__") - col("__d__")).as("__pos__"),
        col("__tb__"))
    val pairs = base.join(right, Seq("__id__", "__pos__"))
      .select(least(col("__tok__"), col("__tb__")).as("w1"),
        greatest(col("__tok__"), col("__tb__")).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("pair_cnt"))
    val nPairs = pairs.agg(sum("pair_cnt").as("n_pairs"))
    val uni = unigramModel(docs, textCol, idCol)
    val dec = "DECIMAL(38,0)"
    val scored = pairs.filter(col("pair_cnt") > minCount)
      .join(uni.select(col("tok").as("w1"), col("freq").as("w1_cnt")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("freq").as("w2_cnt")), Seq("w2"))
      .crossJoin(broadcast(nPairs))
      .withColumn("score",
        expr(s"CAST(CAST(pair_cnt - $minCount AS $dec) * CAST(n_pairs AS $dec) AS DOUBLE)") /
          expr(s"CAST(CAST(w1_cnt AS $dec) * CAST(w2_cnt AS $dec) AS DOUBLE)"))
    scored.select(col("w1"), col("w2"), col("pair_cnt"), col("w1_cnt"),
        col("w2_cnt"), col("score"))
      .orderBy(col("score").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /**
   * Bigram fluency against a STANDING LM — the 2-gram extension of the
   * CCNet-style rarity gate ([[rareTokenScoreWith]]): a document whose
   * token TRANSITIONS rarely occur in the corpus reads as disfluent
   * (scrambled text, keyword stuffing, OCR noise) even when every
   * individual token is common — exactly the signal a unigram model
   * cannot see.
   *
   * Two outputs per doc:
   *   - the ORACLE-EXACT integers `n_bigrams` / `n_seen_bigrams`
   *     (transitions with corpus count ≥ `minFreq`) and the pure
   *     integer verdict `passes_fluency` (`n_seen_bigrams · 2 ≥
   *     n_bigrams`) — deterministic in any engine, like the rarity
   *     gate's integer rule;
   *   - `bigram_ppl`, the true interpolated perplexity
   *     `exp(mean −ln p)` with `p(w2|w1) = λ·c(w1,w2)/c(w1) +
   *     (1−λ)·(c(w2)+1)/(N+V)` (Jelinek–Mercer over an add-one
   *     unigram backoff, the CCNet shape). Floating — libm-dependent
   *     at the last ulp, so it is spec-pinned against an in-JVM
   *     reference rather than oracle-hashed.
   *
   * Scale shape: pair explode is narrow; ONE equi-join on (w1, w2)
   * against the model (AQE-broadcast when the LM is small), two cheap
   * unigram joins for the backoff, one doc-keyed aggregate. The N/V
   * scalars ride a broadcast 1-row cross join.
   */
  def bigramScoreWith(batch: DataFrame, bigramLm: DataFrame,
                      unigramLm: DataFrame,
                      textCol: String = "text", idCol: String = "doc_id",
                      minFreq: Long = 3, lambda: Double = 0.9): DataFrame = {
    require(minFreq > 0, s"minFreq must be positive, got $minFreq")
    require(lambda > 0.0 && lambda < 1.0, s"lambda must be in (0,1), got $lambda")
    val scalars = unigramLm.agg(
      sum("freq").cast("double").as("__N__"),
      count(lit(1)).cast("double").as("__V__"))
    val uni1 = unigramLm.select(col("tok").as("w1"), col("freq").as("c1"))
    val uni2 = unigramLm.select(col("tok").as("w2"), col("freq").as("c2"))
    val scored = docBigrams(batch, textCol, idCol)
      .join(bigramLm, Seq("w1", "w2"), "left")
      .join(uni1, Seq("w1"), "left")
      .join(uni2, Seq("w2"), "left")
      .crossJoin(broadcast(scalars))
      .withColumn("__p__",
        lit(lambda) *
          (coalesce(col("cnt"), lit(0L)).cast("double") /
            greatest(coalesce(col("c1"), lit(0L)).cast("double"), lit(1.0))) +
        lit(1.0 - lambda) *
          ((coalesce(col("c2"), lit(0L)).cast("double") + 1.0) /
            (col("__N__") + col("__V__"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(coalesce(col("cnt"), lit(0L)) >= minFreq, 1L).otherwise(0L))
          .as("n_seen_bigrams"),
        exp(avg(-log(col("__p__")))).as("bigram_ppl"))
    batch.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_seen_bigrams"), lit(0L)).as("n_seen_bigrams"),
        col("bigram_ppl"),
        (coalesce(col("n_bigrams"), lit(0L)) > 0 &&
          coalesce(col("n_seen_bigrams"), lit(0L)) * 2 >=
            coalesce(col("n_bigrams"), lit(0L)))
          .cast("int").as("passes_fluency"))
  }

  /** One-shot [[bigramScoreWith]]: the corpus scores against its own
    * bigram + unigram models (tokenizes twice — at 100 TB persist the
    * models once and score batches with the `With` form). */
  def bigramScore(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id", minFreq: Long = 3,
                  lambda: Double = 0.9): DataFrame =
    bigramScoreWith(docs, bigramModel(docs, textCol, idCol),
      unigramModel(docs, textCol, idCol), textCol, idCol, minFreq, lambda)

  /** Per-group corpus profile with an EXACT lower median — `avg`/
    * `percentile_approx` summaries are engine-specific, but "the value
    * at rank ⌊(n+1)/2⌋ under a total order" is the same integer in any
    * engine. The rank selection is HISTOGRAM-decomposed: aggregate to
    * per-(group, size) counts first, then walk the cumulative count to
    * the target rank. The window therefore sorts DISTINCT sizes per
    * group (bounded by the value domain — doc lengths, not doc counts),
    * never the rows themselves: a 10-billion-doc language with 1M
    * distinct lengths windows 1M rows, not 10B. Duplicate sizes
    * collapse, so no id tiebreak is needed — the rank-R value is the
    * same under any tie order. */
  def corpusProfile(docs: DataFrame, groupCol: String = "lang",
                    sizeCol: String = "n_chars"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = col(s"`$groupCol`")
    val sz = col(s"`$sizeCol`").cast("long")
    val stats = docs.groupBy(g).agg(
      count(lit(1)).as("n_docs"),
      sum(sz).as("total_chars"),
      min(sz).as("min_chars"),
      max(sz).as("max_chars"))
    val hist = docs.groupBy(g, sz.as("__sz__"))
      .agg(count(lit(1)).as("__cnt__"))
    val w = Window.partitionBy(g).orderBy(col("__sz__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = hist.withColumn("__cum__", sum(col("__cnt__")).over(w))
      .join(stats.select(g, col("n_docs")), Seq(groupCol))
      .filter(col("__cum__") >= expr("(n_docs + 1) div 2") &&
        col("__cum__") - col("__cnt__") < expr("(n_docs + 1) div 2"))
      .select(g, col("__sz__").as("median_chars"))
    stats.join(med, Seq(groupCol))
  }

  /** Dataset card (Gebru 2021, "Datasheets for datasets" — the release
    * artifact every corpus ships with), as a long-form (metric, scope,
    * value) table so new metrics never change the schema. Global rows:
    * doc/char/word totals, exact-duplicate docs, distinct sources;
    * per-language rows: docs, chars, share of corpus. Cost: ONE scan
    * aggregate for the global row, one text-hash aggregate for the dup
    * count, one groupBy for languages — every branch is map-side
    * combinable; values render as strings (counts exactly, shares as a
    * fixed-scale decimal) so the card is engine-comparable. */
  def datasetCard(docs: DataFrame, textCol: String = "text",
                  langCol: String = "lang", sourceCol: String = "source",
                  sizeCol: String = "n_chars"): DataFrame = {
    val sz = col(s"`$sizeCol`").cast("long")
    val words = size(regexp_extract_all(lower(col(s"`$textCol`")),
      lit("[a-z0-9]+"), lit(0))).cast("long")
    val globals = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(sz).as("n_chars"),
      sum(words).as("n_words"),
      countDistinct(col(s"`$sourceCol`")).as("n_sources"))
    val dups = docs.groupBy(md5(col(s"`$textCol`").cast("binary")).as("h"))
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_exact_dups"))
    val g = globals.crossJoin(broadcast(dups))
    val globalRows = Seq("n_docs", "n_chars", "n_words", "n_sources",
      "n_exact_dups").map(mName =>
      g.select(lit(mName).as("metric"), lit("corpus").as("scope"),
        col(mName).cast("string").as("value")))
    val perLang = docs.groupBy(col(s"`$langCol`").as("scope"))
      .agg(count(lit(1)).as("docs"), sum(sz).as("chars"))
      .crossJoin(broadcast(globals.select(col("n_docs"))))
    val langRows = Seq(
      perLang.select(lit("lang_docs").as("metric"), col("scope"),
        col("docs").cast("string").as("value")),
      perLang.select(lit("lang_chars").as("metric"), col("scope"),
        col("chars").cast("string").as("value")),
      perLang.select(lit("lang_share_bp").as("metric"), col("scope"),
        // integer basis points: exact in any engine, no float division
        expr("docs * 10000 div n_docs").cast("string").as("value")))
    (globalRows ++ langRows).reduce(_ unionByName _)
  }

  /** Top-`k` characteristic keywords per document by tf·idf, with the
    * idf kept LINEAR (`n_docs / df`) instead of logarithmic: per-doc
    * ranking is order-equivalent for any monotone idf, and the linear
    * form is one exact integer product and one IEEE division — bit
    * identical in every engine, where `ln` is not. Ranking order is
    * (score desc, token asc); `tok` is unique per doc, so the order is
    * total and the row_number deterministic.
    *
    * Scale shape: wordcount aggregate, `df` roll-up on `tok`, equi-join
    * back, then a per-doc window — partitioned on the doc id, millions
    * of small partitions, never a global sort. The 1-row corpus size
    * joins in via broadcast. Like [[rareTokenScore]], the term-freq
    * subtree is read twice (per-doc side + df roll-up) — at 100 TB
    * prefer the production split: persist [[docFreqModel]] once per
    * frozen corpus, then [[tfidfKeywordsWith]] per scoring run, which
    * tokenizes each document exactly once. */
  def tfidfKeywords(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id", k: Int = 3): DataFrame = {
    // Thread the corpus size from a plain row count of the input — NOT
    // through docFreqModel's stamped n_docs column, which would force a
    // second wordcount aggregate (and a second 1-row broadcast) just to
    // re-derive a scalar the docs scan gives for free.
    val dt = docTermFreq(docs, textCol, idCol)
    rankTfidf(dt, dt.groupBy("tok").agg(count(lit(1)).as("df")),
      docs.agg(count(lit(1)).as("n_docs")), idCol, k)
  }

  /** The standing document-frequency model behind [[tfidfKeywords]]:
    * `(tok, df, n_docs)`, with the corpus size stamped on every row so
    * a persisted model is self-contained. Persist it (parquet) once per
    * frozen corpus and feed [[tfidfKeywordsWith]] — then each scoring
    * run tokenizes only the batch, where the one-shot form reads the
    * corpus term-freq subtree twice (documented there). Same
    * persisted-index pattern as [[unigramModel]]. */
  def docFreqModel(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // 1-row × n cross join: a broadcast of a single scalar row, not a
    // pair explosion — the only way to thread a lazy corpus count in
    docTermFreq(docs, textCol, idCol)
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
  }

  /** [[tfidfKeywords]] against a STANDING model: only the batch is
    * tokenized; the model side is a plain `(tok, df, n_docs)` table
    * (broadcast when small). Batch tokens the model has never seen get
    * `df = 1` — as distinctive as a token can be under a model that
    * cannot distinguish them from a true singleton. Scoring a corpus
    * against its own model is bit-identical to the one-shot form
    * (every token matches, so the OOV rule never fires). */
  def tfidfKeywordsWith(batch: DataFrame, dfModel: DataFrame,
                        textCol: String = "text", idCol: String = "doc_id",
                        k: Int = 3): DataFrame =
    rankTfidf(docTermFreq(batch, textCol, idCol),
      dfModel.select(col("tok"), col("df")),
      dfModel.agg(max(col("n_docs")).as("n_docs")), idCol, k)

  /** Shared ranking tail of [[tfidfKeywords]]/[[tfidfKeywordsWith]]:
    * join per-doc term freqs to the `(tok, df)` side (left + OOV
    * `df = 1`, a no-op when the model covers the batch), broadcast the
    * 1-row `n_docs` scalar, score, and take the per-doc top-k window.
    * Exactly ONE non-equi join — the scalar broadcast — in either
    * calling form; PlanSpec pins that. */
  private def rankTfidf(dt: DataFrame, dfSide: DataFrame, nDocs: DataFrame,
                        idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val scored = dt.join(dfSide, Seq("tok"), "left")
      .withColumn("df", coalesce(col("df"), lit(1L)))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("tok").asc)
    scored.withColumn("kw_rank", row_number().over(w))
      .filter(col("kw_rank") <= k)
      .select(col(idCol), col("kw_rank"), col("tok"), col("tf"), col("df"),
        col("score"))
  }

  /** Whitespace/control normalization — the unexciting first pass of
    * every web-text pipeline, kept strictly cross-engine: every rule is
    * a global `regexp_replace` over RE2-safe character classes (no
    * lookaround, no `\s` whose meaning varies by engine), applied in a
    * fixed order: (1) tabs become spaces (dropping them would glue
    * words); (2) drop the remaining ASCII control chars except `\n`
    * (incl. `\r`, DEL); (3) collapse space runs; (4) trim spaces around
    * newlines; (5) collapse 3+ newlines to a paragraph break; (6) trim
    * outer whitespace. Narrow, shuffle-free, codegen'd. */
  def normalizeText(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val steps: Seq[(String, String)] = Seq(
      "\\t" -> " ",
      "[\\x00-\\x08\\x0B-\\x1F\\x7F]" -> "",
      "  +" -> " ",
      " *\\n *" -> "\n",
      "\\n\\n\\n+" -> "\n\n",
      "^[ \\n]+|[ \\n]+$" -> "")
    val cleanText = steps.foldLeft(col(textCol)) {
      case (c, (pattern, repl)) => regexp_replace(c, pattern, repl)
    }
    docs.select(col(idCol),
      length(col(textCol)).as("n_chars_raw"),
      cleanText.as("clean_text"))
      .withColumn("n_chars_clean", length(col("clean_text")))
      .select(col(idCol), col("clean_text"), col("n_chars_raw"),
        col("n_chars_clean"))
  }
}
