package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, Coalesce, EvalMode, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Exact-money summation kernel (optimization guide §1.2 "per-task work"
  * / §4 expression choice).
  *
  * The engine's money contract is `CAST(round(sum(CAST(x AS
  * DECIMAL(30,6))), 2) AS DOUBLE)`: per-row doubles are IEEE-identical
  * across engines, so snapping each row to 6 decimal places BEFORE the
  * sum makes the aggregate order-independent and bit-identical to the
  * DuckDB oracle. The straightforward Decimal formulation pays
  * `Double.toString` + `BigDecimal.setScale` + a Decimal(38,6) buffer
  * per row — the single biggest CPU kernel in the TPC-H set (q1 spends
  * its time here).
  *
  * This kernel keeps the identical value contract but runs on longs:
  *
  *  - [[MoneyMantissa]] converts a double to its scale-6 long mantissa,
  *    rounding HALF_UP on the double's SHORTEST-DECIMAL value — exactly
  *    what `CAST(x AS DECIMAL(30,6))` does (`Decimal(d)` goes through
  *    `BigDecimal.valueOf(d)` = `Double.toString`). A branch-free double
  *    fast path decides whenever the scaled value is provably far from a
  *    .5 boundary; within 4 ulp of a boundary it falls back to the exact
  *    BigDecimal computation (~never: relative width ≈ 1e-15).
  *  - [[MoneyLongSum]] sums the mantissas with ANSI (overflow-checked)
  *    adds: a long buffer instead of Decimal(38,6), fully codegen-able.
  *  - [[MantissaToMoney]] / [[MantissaToDouble]] finish per GROUP (not
  *    per row), via exact BigDecimal arithmetic, reproducing
  *    `round(sum, 2) :: double` and `sum :: double` respectively.
  *
  * Domain: |x| ≤ 9×10¹² per row (mantissa ≤ 9×10¹⁸ < Long.MaxValue) and
  * |Σ| ≤ Long.MaxValue µunits ≈ 9.2×10¹² money units. Beyond either the
  * kernel throws ArithmeticException (loud, never silently divergent) —
  * the DECIMAL(30,6) contract itself only reaches 10²⁴. NaN/±Inf map to
  * NULL exactly like the non-ANSI cast.
  */
object MoneyKernel {
  /** Scale-6 mantissa of the shortest-decimal value of d, HALF_UP.
    * Caller must exclude NaN/Inf. Throws ArithmeticException when the
    * mantissa does not fit a long.
    */
  def mantissa(d: Double): Long = {
    val a = Math.abs(d)
    // fast path needs y=a*1e6 < 2^51 so floor/frac stay exact longs
    if (a <= 2.0e9) {
      val y = a * 1e6
      val f = Math.floor(y)
      val frac = y - f
      // |computed y − exact scaled shortest-decimal value| ≤ ulp(y)/2
      // (the multiply) + ulp(a)·5e5 ≤ 2·ulp(y); 4 ulp is a safe margin
      val eps = Math.ulp(y) * 4.0
      if (frac > 0.5 + eps) { val m = f.toLong + 1L; if (d < 0) -m else m }
      else if (frac < 0.5 - eps) { val m = f.toLong; if (d < 0) -m else m }
      else exact(d)
    } else exact(d)
  }

  private def exact(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** round(decimal(38,6) m, 2) cast to double — once per group. */
  def toMoney(m: Long): Double =
    java.math.BigDecimal.valueOf(m, 6)
      .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()

  /** decimal(38,6) m cast to double (single correct rounding even past
    * 2^53, where `m / 1e6` would double-round) — once per group.
    */
  def toDouble(m: Long): Double =
    java.math.BigDecimal.valueOf(m, 6).doubleValue()
}

/** Scale-6 long mantissa of a double, HALF_UP on its shortest-decimal
  * value; NULL for NaN/±Inf (matching non-ANSI `CAST(d AS DECIMAL(30,6))`).
  */
case class MoneyMantissa(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "money_mantissa"
  override protected def nullSafeEval(input: Any): Any = {
    val d = input.asInstanceOf[Double]
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) null
    else MoneyKernel.mantissa(d)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => s"""
      if (Double.isNaN($d) || Double.isInfinite($d)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.MoneyKernel.mantissa($d);
      }""")
  override protected def withNewChildInternal(newChild: Expression): MoneyMantissa =
    copy(child = newChild)
}

/** Overflow-checked sum of long mantissas: long buffer, ANSI adds
  * (codegen = Math.addExact), NULL over empty/all-null input like
  * sum(decimal).
  */
case class MoneyLongSum(child: Expression) extends DeclarativeAggregate {
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "money_long_sum"
  private lazy val sum = AttributeReference("sum", LongType)()
  private def zero = Literal(0L)
  override lazy val aggBufferAttributes: Seq[AttributeReference] = sum :: Nil
  override lazy val initialValues: Seq[Expression] = Seq(Literal(null, LongType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    // null child leaves the buffer unchanged; ANSI Add throws on overflow
    Coalesce(Seq(Add(Coalesce(Seq(sum, zero)), child, EvalMode.ANSI), sum)))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Coalesce(Seq(Add(Coalesce(Seq(sum.left, zero)), sum.right, EvalMode.ANSI),
      sum.left)))
  override lazy val evaluateExpression: Expression = sum
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MoneyLongSum =
    copy(child = newChildren.head)
}

/** `CAST(round(m_as_decimal_38_6, 2) AS DOUBLE)` — the money contract's
  * final projection, evaluated once per group.
  */
case class MantissaToMoney(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "mantissa_to_money"
  override protected def nullSafeEval(input: Any): Any =
    MoneyKernel.toMoney(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, m => s"graft.functions.MoneyKernel.toMoney($m)")
  override protected def withNewChildInternal(newChild: Expression): MantissaToMoney =
    copy(child = newChild)
}

/** `CAST(m_as_decimal_38_6 AS DOUBLE)` — scale-6 double, once per group. */
case class MantissaToDouble(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "mantissa_to_double"
  override protected def nullSafeEval(input: Any): Any =
    MoneyKernel.toDouble(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, m => s"graft.functions.MoneyKernel.toDouble($m)")
  override protected def withNewChildInternal(newChild: Expression): MantissaToDouble =
    copy(child = newChild)
}

object MoneyExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column => asCol, expression => asExpr}

  /** Aggregate: Σ mantissa(c) — replaces `sum(c.cast("decimal(30,6)"))`
    * up to the final presentation (pair with [[toMoney]]/[[toDouble]]).
    */
  def sumMantissa(c: Column): Column =
    asCol(MoneyLongSum(MoneyMantissa(asExpr(c))).toAggregateExpression())

  /** Aggregate: Σ of already-computed mantissas (re-aggregation of a
    * [[sumMantissa]] result at a coarser grouping — lossless, exactly as
    * decimal sums re-sum).
    */
  def sumMantissaLong(c: Column): Column =
    asCol(MoneyLongSum(asExpr(c)).toAggregateExpression())

  /** `round(m, 2)::double` over a mantissa(-sum) column. */
  def toMoney(m: Column): Column = asCol(MantissaToMoney(asExpr(m)))

  /** `m::double` (scale-6) over a mantissa(-sum) column. */
  def toDouble(m: Column): Column = asCol(MantissaToDouble(asExpr(m)))

  /** Drop-in for `round(sum(c.cast("decimal(30,6)")), 2).cast("double")`. */
  def moneySum(c: Column): Column = toMoney(sumMantissa(c))
}
