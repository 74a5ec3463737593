package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions hook (SURVEY §7 extension ladder, step c):
 * registers the engine's native expressions in the SQL function registry so
 * plain SQL text can call them:
 *
 * {{{
 *   SparkSession.builder()
 *     .withExtensions(new GraftExtensions)   // or
 *     .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
 *   ...
 *   spark.sql("SELECT vector_dot(a.embedding, b.embedding) FROM ...")
 * }}}
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vectorDotDescriptor)
  }
}

object GraftExtensions {
  val vectorDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"vector_dot takes 2 arguments, got ${children.size}")
      VectorDot(children.head, children(1))
    })
}
