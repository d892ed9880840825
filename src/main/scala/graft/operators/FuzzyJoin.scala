package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exact fuzzy join on edit distance — the entity-resolution primitive
 * ("same supplier, misspelled name") — with EXACT recall and no
 * all-pairs comparison, via deletion neighborhoods (FastSS; Bocek et
 * al. 2007, "Fast Similarity Search in Large Dictionaries").
 *
 * Candidate rule: if `levenshtein(u, v) ≤ k` then deleting at most `k`
 * characters from each side can produce a COMMON string (align the
 * edits: a substitution deletes one char from each side, a deletion
 * from `u`'s side only, an insertion from `v`'s side only — at most
 * `k` deletions per side total). The contrapositive makes the
 * deletion-neighborhood equi-join a NECESSARY condition, so candidates
 * come from an `explode variants → equi-join on variant` — shuffle
 * volume O(rows · len^k), never O(rows²) — and the exact codegen'd
 * `levenshtein` verifies each candidate pair once. False candidates
 * (neighborhoods can intersect past distance k) are eliminated by the
 * verify; recall is exact by the necessity argument.
 *
 * Practical k is 1–2: the neighborhood has Σ_{i≤k} C(len, i) variants
 * per string (len+1 at k=1), which is also why this beats a q-gram
 * count filter at small k — no length/threshold case analysis, one
 * clean bucket key. The join key space is dominated by near-unique
 * variants, so skew only arises from strings sharing long runs —
 * the verify stays per-candidate either way.
 */
object FuzzyJoin {

  /** All distinct strings obtained by deleting AT MOST `k` characters
    * (includes the string itself — the 0-deletion variant). */
  private[graft] def deletionVariants(s: String, k: Int): Seq[String] = {
    var frontier = Set(s)
    var all = frontier
    var round = 0
    while (round < k && frontier.exists(_.nonEmpty)) {
      frontier = frontier.flatMap(v =>
        (0 until v.length).map(i => v.substring(0, i) + v.substring(i + 1)))
      all = all ++ frontier
      round += 1
    }
    all.toSeq
  }

  /**
   * Pairs `(leftKey, rightKey, leftVal, rightVal, edit_distance)` with
   * `levenshtein(leftVal, rightVal) ≤ maxDist`. Keys name each row
   * (results deduplicate on the key pair — two strings can share many
   * variants). NULL values never match.
   */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
                leftKey: String, leftCol: String,
                rightKey: String, rightCol: String,
                maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3,
      s"maxDist must be in [1, 3] (the neighborhood is O(len^k)), got $maxDist")
    val variants = udf((s: String) => deletionVariants(s, maxDist))
    def side(df: DataFrame, key: String, value: String, kOut: String,
             vOut: String) =
      df.filter(col(s"`$value`").isNotNull)
        .select(col(s"`$key`").as(kOut), col(s"`$value`").as(vOut),
          explode(variants(col(s"`$value`"))).as("__var__"))
    side(left, leftKey, leftCol, "left_key", "left_val")
      .join(side(right, rightKey, rightCol, "right_key", "right_val"),
        "__var__")
      .drop("__var__")
      .dropDuplicates("left_key", "right_key")
      .withColumn("edit_distance",
        levenshtein(col("left_val"), col("right_val")))
      .filter(col("edit_distance") <= maxDist)
  }

  /** Self-join form: distinct unordered pairs (`left_key < right_key`)
    * within `maxDist` — the dedup/entity-resolution candidate list. */
  def fuzzySelfJoin(df: DataFrame, key: String, value: String,
                    maxDist: Int): DataFrame =
    fuzzyJoin(df, df, key, value, key, value, maxDist)
      .filter(col("left_key") < col("right_key"))

  /** Dedup ACTION over [[fuzzySelfJoin]]: keep the FIRST occurrence
    * (minimum key) of every fuzzy group, drop any row within `maxDist`
    * of a lower-keyed row — the keep-first rule exact dedup and span
    * dedup use, applied to near-identical strings. One anti-join on
    * the key; survivors of chains (a~b, b~c but a!~c) follow the
    * pairwise rule: a row drops iff SOME earlier row is within
    * maxDist, so `c` survives only if no earlier row is close to it. */
  def fuzzyDedup(df: DataFrame, key: String, value: String,
                 maxDist: Int): DataFrame = {
    val losers = fuzzySelfJoin(df, key, value, maxDist)
      .select(col("right_key").as(key))
    df.join(losers, Seq(key), "left_anti")
  }
}
