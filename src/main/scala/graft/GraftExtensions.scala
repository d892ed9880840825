package graft

import graft.expressions.{CosineSimilarity, MightContain}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}

/**
 * Session-extensions entry point: enable with
 * `--conf spark.sql.extensions=graft.GraftExtensions` (or
 * `.withExtensions` on the builder) to get the engine's native functions
 * in every session without imperative registration.
 *
 * Currently injects `graft_cosine` ([[CosineSimilarity]]) and
 * `graft_might_contain` ([[MightContain]]); future custom
 * expressions/rules/strategies register here.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_cosine(a, b) takes two arrays")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier(MightContain.Name),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, MightContain.Name),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"${MightContain.Name}(bloom, value) takes two arguments")
        BloomFilterMightContain(children.head, children(1))
      }))
  }
}
