package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: at 100 TB the PLAN is the product — these pin
  * the properties that make the queries scale (pushdown, pruning,
  * broadcast, top-k, partial aggregation) so a refactor can't silently
  * regress them.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // materialize so AQE finalizes the plan (codegen spans visible)
    df.queryExecution.executedPlan.toString
  }

  test("q6: filters are pushed to the parquet scan") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(l_shipdate)") || p.contains("GreaterThanOrEqual"), p)
  }

  test("q6: scan reads only needed columns") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("l_extendedprice"), p)
    assert(!p.contains("l_partkey"), "column pruning failed: l_partkey read\n" + p)
    assert(!p.contains("l_returnflag"), "column pruning failed: l_returnflag read\n" + p)
  }

  test("q5: dimension joins broadcast, no cartesian") {
    val p = plan("q5_local_supplier")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q3: top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1: aggregation is partial (map-side) then final") {
    val p = plan("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // the money kernel renames the sum (partial_money_long_sum); the
    // invariant under test is the map-side partial phase itself
    assert(p.contains("partial_money_long_sum") || p.contains("partial_sum"), p)
    assert(p.contains("*("), "no whole-stage codegen spans\n" + p)
  }

  test("q4: EXISTS compiles to a semi join, not a full join") {
    val p = plan("q4_order_priority")
    assert(p.contains("LeftSemi"), p)
  }

  test("knn: query side is broadcast against the corpus scan") {
    val p = plan("v2_knn_cosine")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("v5: blocked pair generation joins on the block key, no cartesian") {
    val p = plan("v5_similar_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ft1: exact-term probe prunes the bucketed postings at file level") {
    val p = plan("ft1_bm25_natural")
    assert(p.contains("_tb"), p)
    // a non-empty PartitionFilters entry on the postings scan
    assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(p).isDefined, p)
  }

  test("geo: hot predicates are native expressions, not ScalaUDFs") {
    import org.apache.spark.sql.functions._
    import graft.functions.{GeoFunctions => G}
    GraftSession.init(spark)
    val rect = lit("POLYGON((-90 -45,90 -45,90 45,-90 45,-90 -45))")
    val df = spark.range(10).select(
      concat(lit("POINT("), col("id").cast("string"), lit(" 1)")).as("w"))
    val filtered = df.filter(G.st_contains(rect, col("w")))
      .withColumn("i", G.st_intersects(col("w"), rect))
      .withColumn("m", G.mbr_relate("within", col("w"), rect))
    val p = filtered.queryExecution.executedPlan.toString
    assert(!p.contains("UDF"), "geo predicate still routes a ScalaUDF\n" + p)
    assert(p.contains("st_contains"), p)
    // SQL names resolve to the same native expression
    val sqlPlan = spark.sql(
      """SELECT st_contains('POLYGON((0 0,4 0,4 4,0 4,0 0))', 'POINT(1 1)') c,
        |       mbrintersects('POINT(1 1)', 'POLYGON((0 0,4 0,4 4,0 4,0 0))') m
        |""".stripMargin)
    assert(!sqlPlan.queryExecution.executedPlan.toString.contains("UDF"))
    assert(sqlPlan.head.getBoolean(0) && sqlPlan.head.getBoolean(1))
    // WKB operands evaluate without reparsing WKT
    val viaWkb = spark.sql(
      "SELECT st_within(st_aswkb('POINT(1 1)'), st_aswkb('POLYGON((0 0,4 0,4 4,0 4,0 0))'))")
    assert(viaWkb.head.getBoolean(0))
  }

  test("partitioned table: partition-column predicate prunes directories") {
    import graft.sql.GraftSql
    GraftSql.sql(spark, "drop table if exists pp_plan")
    GraftSql.sql(spark,
      """create table pp_plan (ok bigint, price double)
        |partition by range (ok) (
        |  partition p0 values less than (1000),
        |  partition p1 values less than (2000),
        |  partition p2 values less than maxvalue)""".stripMargin)
    GraftSql.sql(spark,
      "insert into pp_plan select id, cast(id as double) " +
        "from (select explode(sequence(1, 2999)) as id)")
    val df = GraftSql.sql(spark, "select count(*) as n from pp_plan where ok < 900")
    assert(df.head.getLong(0) == 899L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the pruner's _graft_part IN (...) guard must land in PartitionFilters
    assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(p).isDefined, p)
    assert(p.contains("_graft_part"), p)
    // and actual directory selection shrinks to the matching partition
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findScans(pl: SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      pl match {
        case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
        case q: QueryStageExec => findScans(q.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(findScans)
      }
    val scanned = findScans(df.queryExecution.executedPlan)
      .map(_.selectedPartitions.partitionCount)
    assert(scanned == Seq(1), s"expected 1 selected partition, got $scanned")
    // a LIST table prunes on equality too
    GraftSql.sql(spark, "drop table if exists pl_plan")
    GraftSql.sql(spark,
      """create table pl_plan (id bigint, name string)
        |partition by list (id) (
        |  partition r0 values in (1, 3, 5),
        |  partition r1 values in (2, 4, 6))""".stripMargin)
    GraftSql.sql(spark,
      "insert into pl_plan values (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')")
    val dl = GraftSql.sql(spark, "select name from pl_plan where id = 2")
    assert(dl.collect().map(_.getString(0)).toSeq == Seq("b"))
    val pl = dl.queryExecution.executedPlan.toString
    assert(pl.contains("_graft_part"), pl)
    GraftSql.sql(spark, "drop table if exists pp_plan")
    GraftSql.sql(spark, "drop table if exists pl_plan")
  }
}
