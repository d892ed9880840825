package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * Bridge into Spark's classic `Dataset.ofRows` factory (`private[sql]`) —
 * the standard extension-library shim (Delta Lake and Iceberg ship the
 * identical few lines) for turning an ANALYZED `LogicalPlan` back into a
 * `DataFrame` inside a `RunnableCommand`, where a SQL statement hands the
 * command its already-resolved source query as a plan, not a DataFrame.
 *
 * This is the only file compiled into a Spark package; everything it uses
 * is Spark's own public-jar bytecode, and the one call it exposes is the
 * inverse of the fully-public `df.queryExecution.logical`.
 */
object GraftShims {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** Catalyst `Expression` → public `Column` (inverse of the public
    * `expr(...)` path) — what the SQL-DML commands use to hand parsed
    * MERGE/UPDATE/DELETE expressions to the DataFrame API. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    ExpressionUtils.column(e)

  /** Single-part column name of an identity partition transform
    * (`PARTITIONED BY (col)`), None for anything else — the
    * `IdentityTransform`/`FieldReference` extractors are `private[sql]`
    * in ScalaSig despite public bytecode, so the CTAS rule reads them
    * through this shim. */
  def identityTransformCol(
      t: org.apache.spark.sql.connector.expressions.Transform): Option[String] =
    t match {
      case org.apache.spark.sql.connector.expressions.IdentityTransform(
          org.apache.spark.sql.connector.expressions.FieldReference(parts))
          if parts.size == 1 =>
        Some(parts.head)
      case _ => None
    }
}
