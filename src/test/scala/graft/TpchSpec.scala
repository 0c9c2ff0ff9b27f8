package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    // hermetic warehouse: a fresh JVM starts with an empty in-memory
    // catalog, so ANY leftover table dir from a killed run is stale —
    // a managed CREATE TABLE would silently adopt its part files
    // (phantom rows, then FILE_NOT_EXIST poisoning the run). Purge all
    // but the persistent fulltext/vector index cache before first use.
    val wh = new java.io.File("spark-warehouse")
    Option(wh.listFiles()).getOrElse(Array.empty[java.io.File])
      .filterNot(_.getName == "_graft_indexes")
      .foreach(deleteRec)
    GraftSession.local(4)
  }
  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
    f.delete()
  }
}

class TpchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every declared query runs and returns a sane result on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0, s"$name returned negative count")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("q1 aggregates are consistent") {
    val rows = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val n = r.getAs[Long]("count_order")
      val avgQty = r.getAs[Double]("avg_qty")
      assert(math.abs(sumQty / n - avgQty) < 0.01)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query with an oracle has matching column names declared") {
    // oracle SQL must alias to the same names: cheap static sanity — every
    // spark output column name appears in the oracle text.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val cols = SparkEntry.queries(name)(spark, sf).columns
      cols.foreach(c =>
        assert(sql.toLowerCase.contains(c.toLowerCase),
          s"$name: column $c not mentioned in oracle SQL"))
    }
  }
}
