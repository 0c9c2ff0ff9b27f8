package graft.plans

import graft.functions.L2DistanceExpr
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** ANN top-k pushdown: rewrites
  * `ORDER BY l2_distance(vecCol, <literal query>) ASC LIMIT k`
  * over an IVF-indexed corpus into a probe of the `nprobe` nearest cells
  * (reference planner rewrites `apply_indices_ivfflat.go` /
  * `pushdownVectorIndexTopToTableScan`, query_builder.go:3299).
  *
  * The match is by CANONICALIZED corpus plan, so any DataFrame/SQL query
  * whose sort-child is exactly the indexed corpus gets the rewrite; the
  * nearest-cell choice happens driver-side against the (tiny) centroid
  * table, and the rewritten plan scans only nprobe/nlist of the corpus.
  * The rewrite preserves the original output attributes (exprIds) via an
  * aliasing Project, so parents are untouched. Approximate by contract,
  * like the reference's index path.
  */
class IvfAnnRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def literalVector(e: Expression): Option[Array[Double]] = e match {
    case Literal(a: ArrayData, ArrayType(FloatType, _)) =>
      Some(a.toFloatArray().map(_.toDouble))
    case Literal(a: ArrayData, ArrayType(DoubleType, _)) =>
      Some(a.toDoubleArray())
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (IvfIndex.indexes.isEmpty) return plan
    plan.transformDown {
      case limit @ GlobalLimit(IntegerLiteral(k),
          LocalLimit(_, sort @ Sort(
            Seq(SortOrder(dist @ L2DistanceExpr(attr: AttributeReference, qe), Ascending, _, _)),
            true, child, _))) =>
        val rewritten = for {
          q <- literalVector(qe)
          idx <- IvfIndex.indexes.find(ix =>
            ix.vecCol == attr.name && child.canonicalized == ix.corpusPlan)
          probePlan = {
            val cellIds = IvfIndex.nearestCells(idx, q)
            idx.cells.filter(col("__ivf_cell").isin(cellIds: _*))
              .drop("__ivf_cell").queryExecution.analyzed
          }
          // rebind the probe's output to the original attribute ids
          aliases <- {
            val opts = child.output.map(out =>
              probePlan.output.find(_.name == out.name)
                .map(src => Alias(src, out.name)(exprId = out.exprId)))
            if (opts.forall(_.isDefined)) Some(opts.map(_.get)) else None
          }
        } yield GlobalLimit(Literal(k), LocalLimit(Literal(k),
          Sort(sort.order, global = true, Project(aliases, probePlan))))
        rewritten.getOrElse(limit)
    }
  }
}
