package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native Catalyst expression for cosine similarity over two
 * `array<double>` columns — the "custom Expression with doGenCode beats
 * a Scala UDF" extension path: generated code calls a static JVM helper
 * directly inside WholeStageCodegen, with none of the UDF's
 * encoder/serialization boundary and none of the interpreted
 * higher-order-function per-element overhead.
 *
 * (The reference has no custom expressions at all — SURVEY.md §2.6; this
 * is a beyond-parity component for the similarity operators.)
 */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine needs two array<double> args, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.CosineSimilarity.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Tight loop over Catalyst ArrayData — no boxing, no copies.
    * Null elements contribute 0 (skipped) — defined semantics instead of
    * the undefined value `getDouble` returns on a null slot. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = a.getDouble(i)
        val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
      }
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** Register as the SQL function `graft_cosine` on a session, callable
    * via `expr("graft_cosine(a, b)")` / `call_function`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_cosine(a, b) takes two arrays")
        CosineSimilarity(children.head, children(1))
      },
      "built-in")
}
