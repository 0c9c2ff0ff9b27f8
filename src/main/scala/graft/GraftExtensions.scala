package graft

import graft.functions.{CosineSimilarityExpr, InnerProductExpr, L2DistanceExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: registers graft's native Catalyst expressions under
  * the reference's SQL names so `spark.sql("... l2_distance(a, b) ...")`
  * plans the codegen'd kernel directly (no UDF wrapper).
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` —
  * or `--conf spark.sql.extensions=graft.GraftExtensions` on a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "built-in")

  private def register(
      e: SparkSessionExtensions, name: String, usage: String,
      builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

  override def apply(e: SparkSessionExtensions): Unit = {
    // ANN top-k pushdown over registered IVF indexes (no-op when none)
    e.injectPostHocResolutionRule(session => new graft.plans.IvfAnnRule(session))
    register(e, "l2_distance", "l2_distance(a, b) - euclidean distance of two vectors",
      args => L2DistanceExpr(args(0), args(1)))
    register(e, "inner_product", "inner_product(a, b) - dot product of two vectors",
      args => InnerProductExpr(args(0), args(1)))
    register(e, "cosine_similarity", "cosine_similarity(a, b)",
      args => CosineSimilarityExpr(args(0), args(1)))
  }
}
