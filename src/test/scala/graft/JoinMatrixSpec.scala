package graft

import org.scalatest.funsuite.AnyFunSuite

/** Join-type matrix over NULL-bearing keys — mirrors the reference BVT
  * `test/distributed/cases/join/join.sql` tiny-table shape (`t1(s1 int)`,
  * `t2(s1 int)`): NULL keys never match in equi joins, outer sides emit
  * them, semi/anti follow 2/3-valued logic.
  */
class JoinMatrixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val t1 = Seq[Option[Int]](Some(1), Some(2), Some(2), Some(3), None)
    .toDF("s1")
  private lazy val t2 = Seq[Option[Int]](Some(2), Some(3), Some(4), None)
    .toDF("s1")

  private def cnt(joinType: String): Long =
    t1.join(t2, t1("s1") === t2("s1"), joinType).count()

  test("inner: NULLs never match; duplicates multiply") {
    assert(cnt("inner") == 3) // 2,2 match one 2 + 3 matches 3
  }
  test("left outer: every left row survives") {
    assert(cnt("left_outer") == 5) // 3 matched + unmatched 1 and NULL
  }
  test("right outer: every right row survives") {
    assert(cnt("right_outer") == 5) // 3 matched + unmatched 4 and NULL
  }
  test("full outer: both unmatched sides survive") {
    assert(cnt("full_outer") == 7)
  }
  test("left semi: distinct existence, no multiplication") {
    assert(cnt("left_semi") == 3) // 2,2,3
  }
  test("left anti: NULL key is kept (no match possible)") {
    assert(cnt("left_anti") == 2) // 1 and NULL
  }
  test("null-safe equality joins NULL to NULL") {
    val c = t1.join(t2, t1("s1") <=> t2("s1"), "inner").count()
    assert(c == 4) // inner 3 + NULL<=>NULL
  }
  test("cross join is the full product") {
    assert(t1.crossJoin(t2).count() == 20)
  }
}
