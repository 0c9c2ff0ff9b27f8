package graft

import graft.operators.TimeWindow
import graft.operators.TimeWindow._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two keys with different gaps: a @ {0,10,40}, b @ {10,20}
  private def fixture = Seq(
    ("a", 0L, 1.0), ("a", 10L, 2.0), ("a", 40L, 5.0),
    ("b", 10L, 10.0), ("b", 20L, 30.0)).toDF("k", "ws", "v")

  private def filled(mode: FillMode): Map[(String, Long), Option[Double]] =
    TimeWindow.gapFill(fixture, "ws", 10L, "v", mode, keys = Seq("k"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  test("keyed gap fill builds per-key spines independently") {
    val m = filled(FillNull)
    assert(m.keySet.count(_._1 == "a") == 5) // 0..40 by 10
    assert(m.keySet.count(_._1 == "b") == 2) // 10..20 by 10
    assert(m(("a", 20L)).isEmpty && m(("a", 30L)).isEmpty)
  }

  test("prev/next fill stay within their key") {
    val prev = filled(FillPrev)
    assert(prev(("a", 20L)).contains(2.0))
    assert(prev(("a", 30L)).contains(2.0))
    val next = filled(FillNext)
    assert(next(("a", 20L)).contains(5.0))
    assert(next(("b", 10L)).contains(10.0)) // untouched existing value
  }

  test("linear fill interpolates interior gaps per key") {
    val m = filled(FillLinear)
    assert(m(("a", 20L)).contains(3.0)) // 2 + (5-2)*(20-10)/(40-10)
    assert(m(("a", 30L)).contains(4.0))
    assert(m(("a", 40L)).contains(5.0))
  }

  test("value fill uses the constant only for gaps") {
    val m = filled(FillValue(-1.0))
    assert(m(("a", 20L)).contains(-1.0))
    assert(m(("a", 10L)).contains(2.0))
  }
}
