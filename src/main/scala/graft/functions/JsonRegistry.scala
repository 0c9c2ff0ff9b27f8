package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers native [[JsonScalarExpr]] builders in the session's
  * FunctionRegistry at runtime — same effect as
  * `SparkSessionExtensions.injectFunction` but callable from
  * `GraftSession.registerAll` on an already-built session.
  */
private[functions] object JsonRegistry {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "built-in")

  def native(spark: SparkSession, name: String, usage: String,
      builder: Seq[Expression] => Expression = null): Unit = {
    val b: Seq[Expression] => Expression =
      if (builder != null) builder else args => JsonScalarExpr(name, args)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info(name, usage), b)
  }
}
