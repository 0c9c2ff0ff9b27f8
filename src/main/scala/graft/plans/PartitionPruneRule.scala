package graft.plans

import graft.sql.Partitions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Partition pruning for [[Partitions]]-managed tables — the Spark-first
  * re-expression of the reference's pruner (`pkg/partitionprune/prune.go:43`
  * builds the hit-partition bitmap from the WHERE clause; here the same
  * metadata decision emits a `_graft_part IN (...)` conjunct that
  * FileSourceStrategy turns into PartitionFilters, so non-matching
  * partition DIRECTORIES are skipped before any file listing/IO).
  *
  * Scope (documented, conservative): RANGE/LIST tables whose partition
  * expression is a bare column, with =, <, <=, >, >=, IN predicates
  * against literals. Anything else leaves the plan untouched — scans stay
  * correct, just unpruned (HASH assignment uses Spark's `hash`, which is
  * deliberately not re-evaluated on the driver).
  */
class PartitionPruneRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!Partitions.any(session)) return plan
    plan.transformUp {
      case f @ Filter(cond, child)
          if !cond.references.exists(_.name == Partitions.PartCol) &&
            !alreadyGuarded(child) =>
        prune(f, cond, child).getOrElse(f)
    }
  }

  private def alreadyGuarded(p: LogicalPlan): Boolean = p.exists {
    case Filter(c, _) => c.references.exists(_.name == Partitions.PartCol)
    case _ => false
  }

  /** The relation is only prunable if every node between the Filter and
    * the scan is one a Filter may be pushed through without changing the
    * row set the upper operators see: Filters, deterministic Projects,
    * and Joins (descending into the side holding the scan — the derived
    * conjuncts are null-intolerant, so the outer-join null-extension
    * argument holds). Window/Limit/Sample/Aggregate etc. bail — pruning
    * below them would renumber/resample against the pruned scan.
    */
  private def findRel(p: LogicalPlan): Option[LogicalRelation] = p match {
    case r: LogicalRelation if r.output.exists(_.name == Partitions.PartCol) => Some(r)
    case Filter(_, c) => findRel(c)
    case pr: org.apache.spark.sql.catalyst.plans.logical.Project
        if pr.projectList.forall(_.deterministic) => findRel(pr.child)
    case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => findRel(s.child)
    case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
      findRel(j.left).orElse(findRel(j.right))
    case _ => None
  }

  private def prune(f: Filter, cond: Expression, child: LogicalPlan): Option[LogicalPlan] = {
    val rel = findRel(child).getOrElse(return None)
    val spec = rel.catalogTable
      .flatMap(ct => Partitions.byPhys(session, ct.identifier.table))
      .getOrElse(return None)
    // pruning handles the bare-column expression shape only
    if (!spec.exprSql.matches("^[A-Za-z_]\\w*$")) return None
    val srcAttr = rel.output.find(_.name.equalsIgnoreCase(spec.exprSql))
      .getOrElse(return None)
    val partAttr = rel.output.find(_.name == Partitions.PartCol)
      .getOrElse(return None)

    // collect [lo, hi] / value-set constraints from conjuncts on the
    // source column; unknown conjuncts are ignored (superset = safe)
    var lo = Double.NegativeInfinity
    var hi = Double.PositiveInfinity
    var hiInc = true
    var values: Option[Set[Double]] = None
    var found = false
    def num(l: Literal): Option[Double] = l.value match {
      case null => None
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: Number => Some(n.doubleValue())
      case _ => None
    }
    def isSrc(e: Expression): Boolean = e match {
      case a: AttributeReference => a.exprId == srcAttr.exprId
      // only value-PRESERVING casts: CAST(dbl AS INT) = 5 is satisfied by
      // 5.4, which may live in a partition the bound math would skip
      case Cast(a: AttributeReference, dt, _, _) =>
        a.exprId == srcAttr.exprId && Cast.canUpCast(a.dataType, dt)
      case _ => false
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    conjuncts(cond).foreach {
      case EqualTo(a, l: Literal) if isSrc(a) =>
        num(l).foreach { v => values = Some(values.getOrElse(Set.empty) + v); found = true }
      case EqualTo(l: Literal, a) if isSrc(a) =>
        num(l).foreach { v => values = Some(values.getOrElse(Set.empty) + v); found = true }
      case LessThan(a, l: Literal) if isSrc(a) =>
        num(l).foreach { v => if (v <= hi) { hi = v; hiInc = false }; found = true }
      case LessThanOrEqual(a, l: Literal) if isSrc(a) =>
        num(l).foreach { v => if (v < hi) { hi = v; hiInc = true }; found = true }
      case GreaterThan(a, l: Literal) if isSrc(a) =>
        num(l).foreach { v => if (v > lo) lo = v; found = true }
      case GreaterThanOrEqual(a, l: Literal) if isSrc(a) =>
        num(l).foreach { v => if (v > lo) lo = v; found = true }
      case GreaterThan(l: Literal, a) if isSrc(a) => // lit > a  ==  a < lit
        num(l).foreach { v => if (v <= hi) { hi = v; hiInc = false }; found = true }
      case LessThan(l: Literal, a) if isSrc(a) =>
        num(l).foreach { v => if (v > lo) lo = v; found = true }
      case In(a, items) if isSrc(a) && items.forall(_.isInstanceOf[Literal]) =>
        val vs = items.flatMap(i => num(i.asInstanceOf[Literal]))
        if (vs.length == items.length) { values = Some(vs.toSet); found = true }
      case _ =>
    }
    if (!found) return None

    val eligible: Seq[String] = spec.method match {
      case "range" =>
        // an unevaluable (non-MAXVALUE) bound disables pruning
        if (spec.parts.zip(spec.rangeNum).exists {
          case (p, n) => p.upper.isDefined && n.isEmpty }) return None
        var prev = Double.NegativeInfinity
        spec.parts.zip(spec.rangeNum).flatMap { case (p, up) =>
          val b = up.getOrElse(Double.PositiveInfinity) // MAXVALUE
          // partition interval [prev, b)
          val hit = values match {
            case Some(vs) => vs.exists(v => v >= prev && v < b)
            case None => lo < b && (if (hiInc) hi >= prev else hi > prev)
          }
          prev = b
          if (hit) Some(p.name) else None
        }
      case "list" =>
        if (spec.listNum.exists(_.isEmpty)) return None // non-numeric / tuple items
        spec.parts.zip(spec.listNum).flatMap { case (p, items) =>
          val hit = items.get.exists { v =>
            values match {
              case Some(vs) => vs.contains(v)
              case None => v >= lo && (if (hiInc) v <= hi else v < hi)
            }
          }
          if (hit) Some(p.name) else None
        }
      case _ => return None // hash: assignment uses executor-side hash()
    }
    if (eligible.length >= spec.parts.length) return None

    val guard =
      if (eligible.isEmpty) IsNull(partAttr) // no partition can match
      else In(partAttr,
        eligible.map(n => Literal(UTF8String.fromString(n), StringType)))
    var done = false
    val newChild = child.transformUp {
      case r: LogicalRelation if (r eq rel) && !done =>
        done = true
        Filter(guard, r)
    }
    Some(Filter(cond, newChild))
  }
}
