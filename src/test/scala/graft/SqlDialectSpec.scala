package graft

import graft.sql.GraftSql
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference-dialect SQL layer: interval()/sliding()/fill() windows,
  * scored MATCH...AGAINST, sample(N rows | K percent) — each parsed from
  * raw SQL (reference syntax per `test/distributed/cases/window/
  * time_window.sql`, `fulltext/fulltext.sql`, `sample/sample.sql`) and
  * mapped onto TimeWindow / Bm25 / the window-rank sample rewrite.
  */
class SqlDialectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("splitTop splits only top-level commas") {
    assert(GraftSql.splitTop("a, max(b, c), 'x,y', d as e") ==
      Seq("a", "max(b, c)", "'x,y'", "d as e"))
  }

  // ---------------------------------------------------------- interval
  private def tsTable(): Unit =
    Seq(
      ("2021-01-01 00:00:00", 10, "a"),
      ("2021-01-01 05:00:00", 20, "a"),
      // 06:00-12:00 bucket empty
      ("2021-01-01 13:00:00", 40, "b"),
      ("2021-01-02 01:00:00", 80, "b"))
      .toDF("tss", "v", "k")
      .select(to_timestamp($"tss").as("ts"), $"v", $"k")
      .createOrReplaceTempView("tw_t")

  test("interval(ts, N, unit) groups into _wstart/_wend windows") {
    tsTable()
    val rows = GraftSql.sql(spark,
      "SELECT _wstart, _wend, max(v) AS mx, min(v) AS mn FROM tw_t interval(ts, 6, hour)")
      .orderBy("_wstart")
      .select(unix_timestamp($"_wstart"), unix_timestamp($"_wend"), $"mx", $"mn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    val day = 1609459200L // 2021-01-01 UTC
    assert(rows.toSeq == Seq(
      (day, day + 21600, 20, 10),
      (day + 43200, day + 64800, 40, 40),
      (day + 86400, day + 108000, 80, 80)))
  }

  test("fill(prev) materializes gap windows with carried values") {
    tsTable()
    val rows = GraftSql.sql(spark,
      "SELECT _wstart, max(v) AS mx FROM tw_t interval(ts, 6, hour) fill(prev)")
      .orderBy("_wstart").select($"mx").as[Int].collect()
    // spine 00,06,12,18,00 → 20 carried into 06-12, 40 into 18-24
    assert(rows.toSeq == Seq(20, 20, 40, 40, 80))
  }

  test("fill(value, X) and fill(linear) follow the reference modes") {
    tsTable()
    val v = GraftSql.sql(spark,
      "SELECT _wstart, max(v) AS mx FROM tw_t interval(ts, 6, hour) fill(value, -1)")
      .orderBy("_wstart").select($"mx").as[Double].collect()
    assert(v.toSeq == Seq(20.0, -1.0, 40.0, -1.0, 80.0))
    val lin = GraftSql.sql(spark,
      "SELECT _wstart, max(v) AS mx FROM tw_t interval(ts, 6, hour) fill(linear)")
      .orderBy("_wstart").select($"mx").as[Double].collect()
    assert(lin.toSeq == Seq(20.0, 30.0, 40.0, 60.0, 80.0))
  }

  test("sliding(M, unit) produces overlapping windows") {
    tsTable()
    val n = GraftSql.sql(spark,
      "SELECT _wstart, count(v) AS n FROM tw_t interval(ts, 12, hour) sliding(6, hour)")
      .count()
    // each event lands in 2 windows; distinct starts ≥ 4
    assert(n >= 4)
  }

  test("WHERE inside an interval query filters before windowing") {
    tsTable()
    val rows = GraftSql.sql(spark,
      "SELECT _wstart, max(v) AS mx FROM tw_t WHERE k = 'b' interval(ts, 6, hour)")
      .orderBy("_wstart").select($"mx").as[Int].collect()
    assert(rows.toSeq == Seq(40, 80))
  }

  // ------------------------------------------------------------ sample
  private def sampleTable(): Unit =
    Seq((1, Some("x")), (1, Some("y")), (1, Some("z")), (1, None),
        (2, None), (2, None), (3, Some("only")))
      .toDF("g", "s").createOrReplaceTempView("sm_t")

  test("sample(col, N rows) draws non-null values per group") {
    sampleTable()
    val rows = GraftSql.sql(spark,
      "SELECT g, sample(s, 2 rows) AS v FROM sm_t GROUP BY g ORDER BY g, v")
      .collect().map(r => (r.getInt(0), Option(r.getString(1))))
    val byG = rows.groupBy(_._1)
    assert(byG(1).length == 2 && byG(1).forall(_._2.isDefined)) // nulls skipped
    assert(byG(2).toSeq == Seq((2, None)))                      // all-null group → 1 null row
    assert(byG(3).toSeq == Seq((3, Some("only"))))              // fewer rows than N
  }

  test("sample is deterministic across runs and partitionings") {
    sampleTable()
    def got = GraftSql.sql(spark,
      "SELECT g, sample(s, 2 rows) AS v FROM sm_t GROUP BY g ORDER BY g, v")
      .collect().toSeq
    assert(got == got)
    val global = GraftSql.sql(spark,
      "SELECT sample(s, 3 rows) AS v FROM sm_t").collect()
    assert(global.length == 3 && global.forall(!_.isNullAt(0)))
  }

  test("sample(col, K percent) sizes by ceil of the non-null count") {
    sampleTable()
    val n = GraftSql.sql(spark,
      "SELECT sample(s, 50 percent) AS v FROM sm_t").count()
    assert(n == 2) // ceil(4 * 0.5)
  }

  // ------------------------------------------------------- MATCH/AGAINST
  private def docTable(): Unit =
    Seq((1L, "spark joins fast"), (2L, "flink streams"), (3L, "spark spark streams"))
      .toDF("doc_id", "text").createOrReplaceTempView("ft_t")

  test("scored MATCH in projection, predicate MATCH in WHERE") {
    docTable()
    GraftSql.registerPrimaryKey("ft_t", "doc_id")
    val rows = GraftSql.sql(spark,
      """SELECT doc_id, MATCH(text) AGAINST('spark' IN NATURAL LANGUAGE MODE) AS score
        |FROM ft_t
        |WHERE MATCH(text) AGAINST('spark' IN NATURAL LANGUAGE MODE)
        |ORDER BY score DESC, doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.map(_._1).toSeq == Seq(3L, 1L)) // doc 3 has tf=2 → higher bm25
    assert(rows.forall(_._2 > 0))
  }

  test("projection-only MATCH filters to matching docs (reference index-apply)") {
    // the reference's `select *, match(...) as score from t` keeps ONLY
    // matching docs (BVT fulltext.result:63-65) — the index join is inner
    docTable()
    val rows = GraftSql.sql(spark,
      """SELECT doc_id, MATCH(text) AGAINST('spark' IN NATURAL LANGUAGE MODE) AS score
        |FROM ft_t ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.map(_._1).toSeq.sorted == Seq(1L, 3L)) // doc 2 has no 'spark'
    assert(rows.forall(_._2 > 0))
  }

  test("natural mode is a positional phrase (reference SqlPhrase)") {
    docTable()
    def ids(q: String) = GraftSql.sql(spark,
      s"""SELECT doc_id FROM ft_t
         |WHERE MATCH(text) AGAINST('$q' IN NATURAL LANGUAGE MODE)""".stripMargin)
      .collect().map(_.getLong(0)).toSeq.sorted
    // adjacency in order, not OR: doc1 is "spark joins fast"
    assert(ids("spark joins") == Seq(1L))
    assert(ids("joins spark") == Seq())
    assert(ids("spark fast") == Seq()) // words present but not adjacent
  }

  test("boolean mode MATCH respects +/- operators through SQL") {
    docTable()
    val ids = GraftSql.sql(spark,
      """SELECT doc_id FROM ft_t
        |WHERE MATCH(text) AGAINST('+spark -joins' IN BOOLEAN MODE)
        |ORDER BY doc_id""".stripMargin)
      .as[Long].collect()
    assert(ids.toSeq == Seq(3L))
  }

  test("standard SQL passes through untouched") {
    assert(GraftSql.sql(spark, "SELECT 1 AS one").as[Int].head() == 1)
    // INTERVAL literals must not trip the interval() rewriter
    assert(GraftSql.sql(spark,
      "SELECT timestamp'2021-01-01 00:00:00' + INTERVAL 1 DAY AS t").count() == 1)
  }

  // ------------------------------------------------ PREPARE / EXECUTE
  test("PREPARE/EXECUTE with USING vars binds ? placeholders") {
    Seq((1, 11), (2, 22), (3, 33)).toDF("a", "b")
      .createOrReplaceTempView("prep_t")
    GraftSql.sql(spark, "prepare stmt1 from 'select a, b from prep_t where a > ? order by a'")
    GraftSql.sql(spark, "set @a_var = 1")
    assert(GraftSql.sql(spark, "execute stmt1 using @a_var")
      .as[(Int, Int)].collect().toSeq == Seq((2, 22), (3, 33)))
    GraftSql.sql(spark, "set @a_var = 2")
    assert(GraftSql.sql(spark, "execute stmt1 using @a_var")
      .as[(Int, Int)].collect().toSeq == Seq((3, 33)))
    GraftSql.sql(spark, "deallocate prepare stmt1")
    assertThrows[IllegalStateException](
      GraftSql.sql(spark, "execute stmt1 using @a_var"))
  }

  test("user @vars substitute into plain queries; strings stay quoted") {
    GraftSql.sql(spark, "set @s = 'a?@b'")
    // ? and @ INSIDE the stored string are not treated as placeholders
    // on re-substitution
    assert(GraftSql.sql(spark, "select @s as v").as[String].head() == "a?@b")
    GraftSql.sql(spark, "set @n = 1 + 2")
    assert(GraftSql.sql(spark, "select @n + 1 as v").as[Int].head() == 4)
    // unset vars are NULL, like MySQL
    assert(GraftSql.sql(spark, "select @never_set as v").filter("v is null").count() == 1)
    // @@system variables are left for Spark (conf lookup), not rewritten
    assertThrows[Exception](GraftSql.sql(spark, "select @@not_a_real_sysvar"))
  }

  test("prepared statement with multiple params and literal row values") {
    spark.sql("drop table if exists prep_ins")
    spark.sql("create table prep_ins(a int, b int) using parquet")
    GraftSql.sql(spark, """prepare pi from "insert into prep_ins values (?, ?), (?, 99)"""")
    GraftSql.sql(spark, "set @x=5")
    GraftSql.sql(spark, "set @y=55")
    GraftSql.sql(spark, "set @z=9")
    GraftSql.sql(spark, "execute pi using @x, @y, @z")
    assert(spark.table("prep_ins").orderBy("a").as[(Int, Int)].collect().toSeq ==
      Seq((5, 55), (9, 99)))
    assert(GraftSql.preparedBody(spark, "pi").exists(_.startsWith("insert into prep_ins")))
    spark.sql("drop table prep_ins")
  }

  // ------------------------------------------- quantified ALL/ANY/SOME
  test("quantified comparisons: ALL/ANY/SOME over subqueries with 3VL") {
    Seq(1, 5, 9).toDF("a").createOrReplaceTempView("qt")
    Seq(Some(2), Some(4), None).toDF("s").createOrReplaceTempView("qs_null")
    Seq(2, 4).toDF("s").createOrReplaceTempView("qs")
    Seq.empty[Int].toDF("s").createOrReplaceTempView("qs_empty")
    def as(q: String): Seq[Int] =
      GraftSql.sql(spark, q).orderBy("a").as[Int].collect().toSeq

    // plain set, ordering ops
    assert(as("select a from qt where a > all(select s from qs)") == Seq(5, 9))
    assert(as("select a from qt where a < all(select s from qs)") == Seq(1))
    assert(as("select a from qt where a > any(select s from qs)") == Seq(5, 9))
    assert(as("select a from qt where a < some(select s from qs)") == Seq(1))
    // NULL in the set: ALL comparisons go UNKNOWN unless already FALSE
    assert(as("select a from qt where a > all(select s from qs_null)").isEmpty)
    // ANY still TRUE when a witness exists, UNKNOWN otherwise
    assert(as("select a from qt where a > any(select s from qs_null)") == Seq(5, 9))
    // empty set: ALL is TRUE, ANY is FALSE
    assert(as("select a from qt where a > all(select s from qs_empty)") == Seq(1, 5, 9))
    assert(as("select a from qt where a > any(select s from qs_empty)").isEmpty)
    // = / <> route through IN / NOT IN (NULL-aware)
    assert(as("select a from qt where a = any(select s from qs union all select 5)") == Seq(5))
    assert(as("select a from qt where a <> all(select s from qs)") == Seq(1, 5, 9))
    assert(as("select a from qt where a <> all(select s from qs_null)").isEmpty)
    // = ALL over a single-value set
    assert(as("select a from qt where a = all(select 5)") == Seq(5))
    assert(as("select a from qt where a <> any(select 5 union all select 5)") == Seq(1, 9))
    // HAVING context (the reference BVT shape, subquery-with-exists.sql:221)
    assert(as("select a from qt group by a having a > all(select s from qs)") == Seq(5, 9))
    // no false positives: UNION ALL ( SELECT, aggregate ALL, GROUP BY ALL
    assert(GraftSql.sql(spark,
      "select a from qt union all (select s from qs)").count() == 5)
  }
}
