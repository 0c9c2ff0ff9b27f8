package graft.functions

import graft.functions.GeoFunctions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst geometry predicates — the hot filter path of the geo
  * family (reference ST_CONTAINS/ST_WITHIN/ST_INTERSECTS/ST_DISJOINT and
  * the MBR* registry ids, `function_id.go:619-651,683-691`).
  *
  * Two wins over the ScalaUDF surface these replace:
  *  - a FOLDABLE side (the usual `st_contains('POLYGON(...)', col)`
  *    region filter) is parsed ONCE per operator, not once per row;
  *  - operands may be BinaryType (OGC WKB, e.g. an `st_aswkb` column
  *    materialized next to the data) so repeated predicates over the
  *    same geometry skip WKT text parsing entirely.
  *
  * Evaluation is CodegenFallback — the kernel is branchy Scala — but
  * stays inside the operator (no UDF encoder round trip). The WKT UDF
  * family remains registered for the long tail.
  */
case class GeoPredicateExpr(op: String, left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = GeoPredicateExpr.sqlName(op)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt == StringType || dt == BinaryType
    if (Seq(left, right).forall(e => ok(e.dataType)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects WKT strings or WKB binary, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private def geomOf(v: Any, dt: DataType): Option[Geom] = dt match {
    case StringType => parseWkt(v.asInstanceOf[UTF8String].toString)
    case BinaryType => GeoOverlay.fromWkb(v.asInstanceOf[Array[Byte]])
    case _ => None
  }

  // parse a foldable side once per operator instance
  @transient private lazy val leftConst: Option[Geom] =
    if (left.foldable) Option(left.eval(null)).flatMap(geomOf(_, left.dataType)) else None
  @transient private lazy val rightConst: Option[Geom] =
    if (right.foldable) Option(right.eval(null)).flatMap(geomOf(_, right.dataType)) else None

  override def eval(input: InternalRow): Any = {
    val a = leftConst.orElse {
      val v = left.eval(input)
      if (v == null) return null
      geomOf(v, left.dataType)
    }.orNull
    if (a == null) return null
    val b = rightConst.orElse {
      val v = right.eval(input)
      if (v == null) return null
      geomOf(v, right.dataType)
    }.orNull
    if (b == null) return null
    GeoPredicateExpr.evalOp(op, a, b)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object GeoPredicateExpr {
  /** op tokens: contains within intersects disjoint, and mbr:<relate>. */
  def evalOp(op: String, a: Geom, b: Geom): Any = op match {
    case "contains" => contains(a, b).map(Boolean.box).orNull
    case "within" => within(a, b).map(Boolean.box).orNull
    case "intersects" => Boolean.box(intersects(a, b))
    case "disjoint" => Boolean.box(!intersects(a, b))
    case mbr if mbr.startsWith("mbr:") =>
      Boolean.box(mbrRelate(mbr.substring(4), a, b))
    case other => throw new IllegalStateException(s"geo op $other")
  }

  def sqlName(op: String): String =
    if (op.startsWith("mbr:")) s"mbr${op.substring(4)}" else s"st_$op"

  val ops: Seq[String] =
    Seq("contains", "within", "intersects", "disjoint") ++
      Seq("contains", "coveredby", "covers", "disjoint", "equals",
        "intersects", "overlaps", "touches", "within").map("mbr:" + _)
}
