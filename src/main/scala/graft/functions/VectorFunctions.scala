package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector/embedding scalar functions over `ArrayType(FloatType)` columns —
  * the reference's vecf32 function surface (registry
  * `pkg/sql/plan/function/list_builtIn.go:6316`, SIMD kernels
  * `pkg/vectorindex/metric/distance_func.go`): l1_norm, l2_norm,
  * inner_product, cosine_similarity/distance, l2_distance[_sq],
  * normalize_l2, subvector, vector_dims, summation.
  *
  * Implemented as higher-order Catalyst expression combinators
  * (zip_with/aggregate/transform): codegen-friendly, no UDF serialization,
  * and all arithmetic is double-widened so results are IEEE-deterministic
  * across engines. Spark's whole-stage codegen is the analog of the
  * reference's SIMD asm kernels.
  */
object VectorFunctions {

  // Spark 4 classic bridge: Column <-> catalyst Expression
  private def asExpr(c: Column) =
    org.apache.spark.sql.GraftColumnBridge.expression(c)
  private def asCol(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.GraftColumnBridge.column(e)

  /** Σ aᵢ·bᵢ — native codegen'd kernel ([[InnerProductExpr]]). */
  def innerProduct(a: Column, b: Column): Column =
    asCol(InnerProductExpr(asExpr(a), asExpr(b)))

  def l1Norm(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + abs(x.cast("double")))

  def l2NormSq(a: Column): Column = innerProduct(a, a)

  def l2Norm(a: Column): Column = sqrt(l2NormSq(a))

  def l2DistanceSq(a: Column, b: Column): Column = {
    val d = l2Distance(a, b)
    d * d
  }

  /** √Σ(aᵢ−bᵢ)² — native codegen'd kernel ([[L2DistanceExpr]]). */
  def l2Distance(a: Column, b: Column): Column =
    asCol(L2DistanceExpr(asExpr(a), asExpr(b)))

  /** Single-pass dot/(‖a‖·‖b‖) ([[CosineSimilarityExpr]]); null for zero
    * vectors.
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    asCol(CosineSimilarityExpr(asExpr(a), asExpr(b)))

  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** Unit-normalized copy (null if zero vector), as array<double>. */
  def normalizeL2(a: Column): Column =
    when(l2Norm(a) === 0, lit(null))
      .otherwise(transform(a, x => x.cast("double") / l2Norm(a)))

  /** 1-based start (negative = from the end), `len` elements; without
    * `len`, to the end — reference `subvector` semantics
    * (`pkg/sql/plan/function/func_unary.go:364-421`): start 0 and
    * non-positive len yield an empty vector, NULL args yield NULL,
    * non-integer args truncate to int.
    */
  def subvector(a: Column, start: Int, len: Int = -1): Column =
    subvectorCol(a, lit(start), if (len < 0) None else Some(lit(len)))

  def subvectorCol(a: Column, start0: Column, len0: Option[Column]): Column = {
    val s = start0.cast("int")
    // slice() clamps an over-long length, so size(a) means "to the end";
    // a literal Int.MaxValue would overflow slice's start+length int math
    val l = len0.map(_.cast("int")).getOrElse(size(a))
    // NULL args propagate through the conditional naturally; start 0 or
    // len <= 0 short-circuit to an empty (typed) array before slice()
    // can reject the out-of-domain start
    when(s === 0 || l <= 0, slice(a, lit(1), lit(0)))
      .otherwise(slice(a, s, l))
  }

  def vectorDims(a: Column): Column = size(a)

  /** Σ elements (reference `summation`). */
  def summation(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double"))
}
