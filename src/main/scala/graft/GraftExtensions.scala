package graft

import graft.functions.{CosineSimilarityExpr, InnerProductExpr, L2DistanceExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

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
    // ANN top-k pushdown over registered IVF/HNSW indexes (no-op when none)
    e.injectPostHocResolutionRule(session => new graft.plans.IvfAnnRule(session))
    e.injectPostHocResolutionRule(session => new graft.plans.HnswAnnRule(session))
    e.injectPostHocResolutionRule(session => new graft.plans.IvfPqAnnRule(session))
    register(e, "l2_distance", "l2_distance(a, b) - euclidean distance of two vectors",
      args => L2DistanceExpr(args(0), args(1)))
    register(e, "inner_product", "inner_product(a, b) - dot product of two vectors",
      args => InnerProductExpr(args(0), args(1)))
    register(e, "cosine_similarity", "cosine_similarity(a, b)",
      args => CosineSimilarityExpr(args(0), args(1)))
    // single-pass JSON mutation program (chains fuse at build time)
    register(e, "json_insert", "json_insert(doc, path, value)",
      args => graft.functions.JsonMutateExpr.insert(args(0), args(1), args(2)))
    register(e, "json_replace", "json_replace(doc, path, value)",
      args => graft.functions.JsonMutateExpr.replace(args(0), args(1), args(2)))
    register(e, "json_set", "json_set(doc, path, value)",
      args => graft.functions.JsonMutateExpr.set(args(0), args(1), args(2)))
    register(e, "json_remove", "json_remove(doc, path)",
      args => graft.functions.JsonMutateExpr.remove(args(0), args(1)))
    register(e, "json_merge_patch", "json_merge_patch(target, patch)",
      args => graft.functions.JsonMutateExpr.mergePatch(args(0), args(1)))
    register(e, "fulltext_match",
      "fulltext_match(text, query) - MATCH ... AGAINST predicate " +
        "(natural mode: any term; boolean mode: +must / -mustnot / should)",
      args => fulltextMatch(args(0), args(1)))
  }

  /** Expand `fulltext_match(text, query)` into token-set expressions at
    * function-resolution time — the reference's MATCH...AGAINST predicate
    * (relevance > 0 semantics; `pkg/fulltext/fulltext.go:731` boolean
    * parser). Literal queries get boolean-mode parsing; non-literal
    * queries fall back to any-term-overlap. Scoring lives in
    * `graft.fulltext.Bm25` (needs corpus stats, not expression-local).
    */
  private def fulltextMatch(text: Expression, query: Expression): Expression = {
    def tokensOf(e: Expression): Expression =
      StringSplit(Lower(StringTrim(e)), Literal("\\s+"), Literal(-1))
    val tk = tokensOf(text)
    def has(term: String): Expression = ArrayContains(tk, Literal(UTF8String.fromString(term), StringType))
    query match {
      case Literal(s: UTF8String, StringType) =>
        val toks = s.toString.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val must = toks.filter(_.startsWith("+")).map(_.drop(1)).filter(_.nonEmpty)
        val mustNot = toks.filter(_.startsWith("-")).map(_.drop(1)).filter(_.nonEmpty)
        val should = toks.filterNot(t => t.startsWith("+") || t.startsWith("-"))
        val positive: Expression =
          if (must.nonEmpty) must.map(has).reduce[Expression](And)
          else if (should.nonEmpty) should.map(has).reduce[Expression](Or)
          else Literal(false)
        mustNot.map(t => Not(has(t)): Expression).foldLeft(positive)(And)
      case q => ArraysOverlap(tk, tokensOf(q))
    }
  }
}
