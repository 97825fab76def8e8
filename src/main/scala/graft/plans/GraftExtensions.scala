package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.{DotProduct, L2Norm}

/** Session-extension entry point: enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  * Injects the engine's native expressions into the function registry so
  * both SQL text and the Column API resolve them. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"), DotProduct.info,
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_norm"), L2Norm.info,
      (children: Seq[Expression]) => L2Norm(children.head)))
  }
}
