package graft

import graft.expressions.FloatDotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point (SURVEY.md §4.2's reserved escape
  * hatch, exercised): registers graft's native expressions with the
  * session's function registry so pure-SQL users reach the codegen'd
  * kernels too. Enabled via
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession sets it).
  *
  *   SELECT float_dot(a.embedding, b.embedding) FROM ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: per-key top-k heap operator (partial →
    // exchange → final), SURVEY.md §4.2's custom-SparkStrategy path
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "float_dot(arrayA, arrayB)")
        FloatDotProduct(args.head, args(1))
      }))
  }
}
