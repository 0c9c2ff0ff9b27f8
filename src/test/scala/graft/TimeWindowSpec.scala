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

  // keyless path: values at {0, 10, 70, 130}, step 10 — with
  // slotsPerBucket=4 the spine spans 4 buckets, so every fill below
  // must carry across bucket boundaries
  private def keyless = Seq((0L, 1.0), (10L, 2.0), (70L, 8.0), (130L, 14.0))
    .toDF("ws", "v")

  private def filledKeyless(mode: FillMode): Map[Long, Option[Double]] =
    TimeWindow.gapFill(keyless, "ws", 10L, "v", mode, slotsPerBucket = 4L)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

  test("keyless fill is bucketed but exact across bucket boundaries") {
    val nul = filledKeyless(FillNull)
    assert(nul.size == 14 && nul(20L).isEmpty && nul(120L).isEmpty)

    val prev = filledKeyless(FillPrev)
    // slots 20..60 fall in later buckets than the donor at ws=10
    assert((20L to 60L by 10L).forall(w => prev(w).contains(2.0)))
    assert((80L to 120L by 10L).forall(w => prev(w).contains(8.0)))

    val next = filledKeyless(FillNext)
    assert((20L to 60L by 10L).forall(w => next(w).contains(8.0)))
    assert((80L to 120L by 10L).forall(w => next(w).contains(14.0)))

    val lin = filledKeyless(FillLinear)
    assert(lin(20L).contains(3.0))  // 2 + (8-2)*(20-10)/(70-10)
    assert(lin(40L).contains(5.0))
    assert(lin(100L).contains(11.0)) // 8 + (14-8)*(100-70)/(130-70)
    assert(lin(0L).contains(1.0) && lin(130L).contains(14.0))
  }

  test("keyless fill plans a partitioned window, not a global one") {
    val plan = TimeWindow.gapFill(keyless, "ws", 10L, "v", FillPrev, slotsPerBucket = 4L)
      .queryExecution.executedPlan.toString
    // the row-level window must be partitioned by the bucket column
    assert(plan.contains("_b"), s"expected bucketed window in plan:\n$plan")
  }

  test("small-input fast path and bucketed path produce identical fills") {
    for (mode <- Seq(FillNull, FillPrev, FillNext, FillLinear, FillValue(-1.0))) {
      def run(spb: Long) =
        TimeWindow.gapFill(keyless, "ws", 10L, "v", mode, slotsPerBucket = spb)
          .collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
          .toMap
      // spb=4 → bucketed, spb=8192 (default regime) → single-window fast path
      assert(run(4L) == run(8192L), s"paths diverge for $mode")
    }
  }

  test("fast-path literal spine matches sequence semantics off-grid") {
    // max-min not a multiple of step: the spine stops at the last grid
    // slot ≤ max in both formulations (range-generated literals in the
    // fast path, sequence(mn, mx, step) in the bucketed/keyed path)
    val offGrid = Seq((0L, 1.0), (25L, 5.0)).toDF("ws", "v")
    def run(spb: Long) =
      TimeWindow.gapFill(offGrid, "ws", 10L, "v", FillPrev, slotsPerBucket = spb)
        .collect().map(r => r.getLong(0)).sorted.toSeq
    assert(run(8192L) == Seq(0L, 10L, 20L))
    assert(run(2L) == run(8192L))
  }
}
