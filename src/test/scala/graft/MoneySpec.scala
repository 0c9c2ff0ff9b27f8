package graft

import graft.functions.{MoneyExpressions, MoneyKernel}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Pins the long-mantissa money kernel to the DECIMAL(30,6) contract it
  * replaces: `CAST(round(sum(CAST(x AS DECIMAL(30,6))), 2) AS DOUBLE)`
  * must be BIT-identical between the Decimal formulation and the
  * MoneyMantissa/MoneyLongSum kernel — including half-round boundaries,
  * negative ties, NaN/Inf, and group/window shapes.
  */
class MoneySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Reference semantics of CAST(d AS DECIMAL(30,6)):
    * Decimal(d) = BigDecimal.valueOf(d) (shortest decimal string),
    * then setScale(6, HALF_UP).
    */
  private def refMantissa(d: Double): BigInt =
    BigInt(java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).unscaledValue())

  test("mantissa matches the Decimal cast across the exponent range (property)") {
    val rnd = new Random(20260818L)
    val samples = Seq.newBuilder[Double]
    // random magnitudes over the full supported exponent range
    for (_ <- 1 to 20000) {
      val exp = rnd.nextInt(22) - 9 // 1e-9 .. 1e12
      val m = (rnd.nextDouble() * 2 - 1) * math.pow(10.0, exp)
      samples += m
    }
    // adversarial: exact half-boundaries in decimal text (k + 5e-7 grid),
    // where binary-vs-decimal rounding can disagree
    for (i <- 0 to 2000) {
      val k = i * 37 + i.toDouble / 8
      samples += k + 5e-7
      samples += -(k + 5e-7)
      samples += k + 15e-7
      samples += k - 5e-7
    }
    // powers of two (exact binary values, long decimal expansions)
    for (e <- -20 to 40) { samples += math.pow(2.0, e); samples += -math.pow(2.0, e) }
    samples += 0.0; samples += -0.0
    var checked = 0
    samples.result().foreach { d =>
      val ref = refMantissa(d)
      if (ref.isValidLong) {
        assert(MoneyKernel.mantissa(d) == ref.toLong,
          s"mantissa($d): got ${MoneyKernel.mantissa(d)}, want $ref")
        checked += 1
      }
    }
    assert(checked > 20000)
  }

  test("mantissa boundary cases") {
    assert(MoneyKernel.mantissa(0.0000005) == refMantissa(0.0000005).toLong)
    assert(MoneyKernel.mantissa(-0.0000005) == refMantissa(-0.0000005).toLong)
    assert(MoneyKernel.mantissa(1.0000005) == refMantissa(1.0000005).toLong)
    assert(MoneyKernel.mantissa(-1.0000005) == refMantissa(-1.0000005).toLong)
    assert(MoneyKernel.mantissa(123456789.1234565) ==
      refMantissa(123456789.1234565).toLong)
    // large but in-domain (exact-path territory, > 2e9 fast-path cutoff)
    assert(MoneyKernel.mantissa(8.9e12) == refMantissa(8.9e12).toLong)
    assert(MoneyKernel.mantissa(-8.9e12) == refMantissa(-8.9e12).toLong)
  }

  test("mantissa overflows loudly outside the supported domain") {
    intercept[ArithmeticException](MoneyKernel.mantissa(1.0e13))
    intercept[ArithmeticException](MoneyKernel.mantissa(-1.0e13))
  }

  test("kernel sum is bit-identical to the Decimal sum in group-by and window shapes") {
    import spark.implicits._
    val rnd = new Random(42L)
    val rows = (1 to 5000).map { i =>
      val v = i % 97 match {
        case 0 => Double.NaN
        case 1 => Double.PositiveInfinity
        case 2 => Double.NegativeInfinity
        case _ => (rnd.nextDouble() * 2 - 1) * math.pow(10.0, rnd.nextInt(10) - 3)
      }
      (i % 7, i, v)
    }
    val df = rows.toDF("g", "k", "v")
    val dec = sum($"v".cast("decimal(30,6)"))
    // group-by: money (scale-2) and scale-6 double presentations
    val a = df.groupBy($"g").agg(
        round(dec, 2).cast("double").as("m2"),
        dec.cast("double").as("m6"))
      .orderBy($"g").collect()
    val sm = MoneyExpressions.sumMantissa($"v")
    val b = df.groupBy($"g").agg(
        MoneyExpressions.toMoney(sm).as("m2"),
        MoneyExpressions.toDouble(sm).as("m6"))
      .orderBy($"g").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(java.lang.Double.doubleToRawLongBits(x.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(y.getDouble(1)), s"m2 differs: $x vs $y")
      assert(java.lang.Double.doubleToRawLongBits(x.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(y.getDouble(2)), s"m6 differs: $x vs $y")
    }
    // window frames (running + sliding ROWS, as w2 uses)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"g").orderBy($"k")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sli = w.rowsBetween(-2, 0)
    val wa = df.select($"g", $"k",
        round(sum($"v".cast("decimal(30,6)")).over(run), 2).cast("double").as("r"),
        sum($"v".cast("decimal(30,6)")).over(sli).cast("double").as("s"))
      .orderBy($"g", $"k").collect()
    val wb = df.select($"g", $"k",
        MoneyExpressions.toMoney(MoneyExpressions.sumMantissa($"v").over(run)).as("r"),
        MoneyExpressions.toDouble(MoneyExpressions.sumMantissa($"v").over(sli)).as("s"))
      .orderBy($"g", $"k").collect()
    // frames holding only NaN/Inf rows yield NULL sums on both paths
    def bitsOrNull(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None
      else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(i)))
    wa.zip(wb).foreach { case (x, y) =>
      assert(bitsOrNull(x, 2) == bitsOrNull(y, 2), s"run differs: $x vs $y")
      assert(bitsOrNull(x, 3) == bitsOrNull(y, 3), s"sliding differs: $x vs $y")
    }
    // re-aggregation of mantissa sums (g3's rollup-from-finest shape)
    val fine = df.groupBy($"g").agg(MoneyExpressions.sumMantissa($"v").as("sm"),
      sum($"v".cast("decimal(30,6)")).as("sd"))
    val coarse = fine.agg(
      MoneyExpressions.toMoney(MoneyExpressions.sumMantissaLong($"sm")).as("km"),
      round(sum($"sd"), 2).cast("double").as("dm")).collect()(0)
    assert(java.lang.Double.doubleToRawLongBits(coarse.getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(coarse.getDouble(1)))
    // empty input -> NULL, like sum(decimal)
    val empty = df.filter($"g" > 100).agg(
      MoneyExpressions.toMoney(MoneyExpressions.sumMantissa($"v")).as("m")).collect()(0)
    assert(empty.isNullAt(0))
  }

  test("sum overflow throws instead of wrapping") {
    import spark.implicits._
    val df = Seq(8.0e12, 8.0e12, 8.0e12).toDF("v")
    val e = intercept[Exception] {
      df.agg(MoneyExpressions.toMoney(MoneyExpressions.sumMantissa($"v"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[ArithmeticException] ||
      c.getClass.getName.contains("Arithmetic")), s"unexpected: $e")
  }
}
