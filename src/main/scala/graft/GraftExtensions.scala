package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.HammingDistance

/** Session-extension entry point (SURVEY.md §2.12): registers the engine's
  * native Catalyst expressions for every session of a cluster via
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions
  *
  * so SQL users get `hamming(a, b)` (full whole-stage codegen) without any
  * driver-side registration call. Programmatic sessions can equivalently use
  * `HammingDistance.register(spark)` or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming"),
      (exprs: Seq[Expression]) => HammingDistance(exprs(0), exprs(1))))
  }
}
