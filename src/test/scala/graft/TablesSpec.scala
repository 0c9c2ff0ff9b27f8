package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Guard against testdata regeneration silently breaking ingestion: every
  * table at every available SF must load, have rows, and events.ts must
  * resolve to a plain TIMESTAMP whatever the parquet writer encoded.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(d => s"/root/testdata/$d")
    .filter(d => new java.io.File(d).isDirectory)

  test("testdata dirs are present") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* dirs found")
  }

  test("every table loads with rows at every SF") {
    for (dir <- sfDirs; name <- Tables.names) {
      val df = Tables.load(spark, dir, name)
      assert(df.columns.nonEmpty, s"$dir/$name has no columns")
      assert(df.limit(1).count() == 1, s"$dir/$name is empty")
    }
  }

  test("events.ts is a usable session-zone timestamp") {
    for (dir <- sfDirs) {
      val df = Tables.events(spark, dir)
      val dt = df.schema("ts").dataType
      assert(dt == TimestampType, s"$dir events.ts is $dt, want TimestampType")
      assert(dt != TimestampNTZType)
      // the projection the r6 regression died on must analyze and run
      import org.apache.spark.sql.functions._
      val minMax = df.agg(min("ts"), max("ts")).collect()(0)
      assert(minMax.getTimestamp(0) != null && minMax.getTimestamp(1) != null)
      assert(!minMax.getTimestamp(0).after(minMax.getTimestamp(1)))
    }
  }
}
