package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL surface: extension-injected native functions + registered UDF
  * names are callable from `spark.sql`, and external CSV/JSON sources
  * round-trip (reference External operator, §2.1).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("extension-injected vector functions resolve in SQL") {
    val r = spark.sql(
      """SELECT l2_distance(array(0.0F, 3.0F), array(4.0F, 0.0F)) AS d,
        |       inner_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS ip,
        |       round(cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)), 6) AS cs
        |""".stripMargin).head
    assert(r.getDouble(0) == 5.0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 1.0)
  }

  test("registered UDF names resolve in SQL") {
    val r = spark.sql(
      """SELECT inet_aton('10.0.0.1') AS ip,
        |       period_add(202411L, 3L) AS pa,
        |       json_merge_patch('{"a":1}', '{"b":2}') AS jm,
        |       mo_date_format(timestamp'1997-06-15 10:30:00', '%Y/%m/%d %H:%i') AS fmt
        |""".stripMargin).head
    assert(r.getLong(0) == 167772161L)
    assert(r.getLong(1) == 202502L)
    assert(r.getString(2) == """{"a":1,"b":2}""")
    assert(r.getString(3) == "1997/06/15 10:30")
  }

  test("csv and json sources round-trip a table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ext").toString
    val src = Tables.nation(spark, "/root/testdata/sf0.001")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/nation_csv")
    src.write.mode("overwrite").json(s"$dir/nation_json")
    val fromCsv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/nation_csv")
    val fromJson = spark.read.json(s"$dir/nation_json")
    assert(fromCsv.count() == 25 && fromJson.count() == 25)
    assert(fromCsv.columns.sorted.sameElements(src.columns.sorted))
    // values survive the round trip
    val names = fromJson.select("n_name").collect().map(_.getString(0)).toSet
    assert(names == src.select("n_name").collect().map(_.getString(0)).toSet)
  }
}
