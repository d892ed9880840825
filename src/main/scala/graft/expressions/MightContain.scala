package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}

/**
 * Registers `graft_might_contain(bloom_bytes, xxhash64_value)` backed by
 * Spark's own codegen'd [[BloomFilterMightContain]] — the expression the
 * optimizer's runtime row-level filtering injects. Exposing it as a named
 * function lets [[graft.operators.Sketches.bloomPrunedJoin]] probe a
 * pre-built filter inside WholeStageCodegen instead of through an
 * interpreted per-row Scala UDF boundary on the 100 TB fact side.
 *
 * Contract (same as Spark's internal use): the filter must have been
 * built by `putLong` over `xxhash64` values of the key, and the probe
 * value must be `xxhash64` of the same type-normalized key — both sides
 * hash identically or pruning silently turns into false negatives.
 */
object MightContain {

  val Name = "graft_might_contain"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name,
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"$Name(bloom, value) takes exactly two arguments")
        BloomFilterMightContain(children.head, children(1))
      },
      "built-in")
}
