package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TPC-H q1–q22 adapted to the driver testdata star schema (FIXTURES.md §A:
  * no partsupp, money as double, dates as timestamps, several columns
  * dropped). Each query keeps the ORIGINAL's operator shape — the point is
  * operator coverage parity with the reference's TPC-H correctness corpus
  * (`test/distributed/cases/benchmark/tpch/03_QUERIES/` in the reference) —
  * with constants chosen to select non-trivial row counts on this data.
  *
  * Scale notes (100 TB readiness):
  *  - `region`/`nation` are fixed-size → always `broadcast()`.
  *  - All other joins are left declarative so AQE picks
  *    broadcast-vs-shuffle from runtime stats and splits skewed keys.
  *  - Aggregates are plain `groupBy` → Spark does partial (map-side)
  *    aggregation automatically; no `collect()` anywhere — scalar
  *    subqueries are 1-row DataFrames cross-joined in.
  *  - Double aggregates are rounded in BOTH Spark and the DuckDB oracle so
  *    summation-order differences cannot flip the hash compare.
  */
object Tpch extends QueryModule {

  private def rev: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))
  private def money(c: Column): Column = round(c, 2)

  /** Exact money summation: per-row double expressions are IEEE-identical
    * across engines, so snapping them to 6 decimal places BEFORE the sum
    * makes the aggregate order-independent and bit-identical to the DuckDB
    * oracle (double sums differ in the last ulp with summation order, which
    * flips round-half boundaries). SQL mirror:
    * `CAST(round(sum(CAST(e AS DECIMAL(30,6))), 2) AS DOUBLE)`.
    * Implementation: the long-mantissa kernel
    * ([[graft.functions.MoneyExpressions]]) — value-identical to the
    * DECIMAL(30,6) formulation (MoneySpec pins half-round boundaries and
    * the full exponent range) without the per-row Double.toString +
    * BigDecimal cost that dominated q1's profile.
    */
  private def dsumMantissa(c: Column): Column =
    graft.functions.MoneyExpressions.sumMantissa(c)
  private def moneySum(c: Column): Column =
    graft.functions.MoneyExpressions.moneySum(c)

  // ---------------------------------------------------------------- q1
  // Pricing summary: full-scan group-aggregate (reference Group operator,
  // pkg/sql/colexec/group/). Partial agg → 4-group final; at 100 TB this is
  // one scan + tiny shuffle.
  private def q1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(rev).as("sum_disc_price"),
        moneySum(rev * (lit(1) + col("l_tax"))).as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(round(sum(CAST(l_quantity AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_qty,
      | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_base_price,
      | CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_disc_price,
      | CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_charge,
      | round(avg(l_quantity), 6) AS avg_qty,
      | round(avg(l_extendedprice), 6) AS avg_price,
      | round(avg(l_discount), 6) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q2
  // Min-cost supplier: correlated "max per group" subquery, expressed as a
  // window max (no partsupp → derive part↔supplier pairs from lineitem).
  private def q2(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_type") === "LARGE" && col("p_size").between(10, 20))
      .select(col("p_partkey"))
    val ps = Tables.lineitem(s, d)
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val j = ps
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
    val w = Window.partitionBy(col("l_partkey"))
    j.withColumn("max_bal", max(col("s_acctbal")).over(w))
      .filter(col("s_acctbal") === col("max_bal"))
      .select(money(col("s_acctbal")).as("acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"))
      .orderBy(desc("acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
  }

  private val q2Sql =
    """WITH ps AS (
      |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20),
      |j AS (
      |  SELECT ps.l_partkey, s.s_name, s.s_acctbal, n.n_name,
      |         max(s.s_acctbal) OVER (PARTITION BY ps.l_partkey) AS max_bal
      |  FROM ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey
      |          JOIN nation n ON s.s_nationkey = n.n_nationkey)
      |SELECT round(s_acctbal, 2) AS acctbal, s_name, n_name, l_partkey AS p_partkey
      |FROM j WHERE s_acctbal = max_bal
      |ORDER BY acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  // ---------------------------------------------------------------- q3
  // Shipping-priority top-k: 3-way join + agg + TakeOrderedAndProject.
  private def q3(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-03-15")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-03-15")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(moneySum(rev).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), to_date(col("o_orderdate")).as("o_orderdate"))
      .orderBy(desc("revenue"), col("o_orderdate"), col("l_orderkey"))
      .limit(10)

  private val q3Sql =
    """SELECT l_orderkey, CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue,
      |       CAST(o_orderdate AS DATE) AS o_orderdate
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q4
  // Order-priority check: EXISTS → left-semi join with a non-equi conjunct
  // (late shipment = shipped >30 days after order date).
  private def q4(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-07-01") && col("o_orderdate") < lit("1997-10-01"))
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    o.join(li,
        li("l_orderkey") === o("o_orderkey") &&
          li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q4Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q5
  // Local-supplier volume: 6-table join chain with an extra equi condition
  // c_nationkey = s_nationkey; region/nation broadcast.
  private def q5(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(moneySum(rev).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))

  private val q5Sql =
    """SELECT n_name, CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q6
  // Forecast revenue: pure scan+filter+agg — predicate pushdown showcase.
  private def q6(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  private val q6Sql =
    """SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q7
  // Volume shipping between two nations: double nation join + disjunctive
  // pair filter + year extraction.
  private def q7(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.supplier(s, d)
      .join(Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1998-01-01")),
        col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(moneySum(rev).as("volume"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val q7Sql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |       CAST(year(l_shipdate) AS INTEGER) AS l_year,
      |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS volume
      |FROM supplier
      |JOIN lineitem ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---------------------------------------------------------------- q8
  // Market share: 7-table join + conditional aggregation ratio.
  private def q8(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") === "ECONOMY"), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
        col("c_rk") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_6", rev).otherwise(lit(0.0))) / sum(rev), 6)
        .as("mkt_share"))
      .orderBy(col("o_year"))
  }

  private val q8Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |       round(sum(CASE WHEN n2.n_name = 'NATION_6'
      |                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      |             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  // ---------------------------------------------------------------- q9
  // Product-type profit: LIKE filter + 5-way join + grouped profit
  // (supplycost replaced by 0.5 * p_retailprice — no partsupp).
  private def q9(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_name").like("%widget%")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(moneySum(rev - lit(0.5) * col("p_retailprice") * col("l_quantity")).as("sum_profit"))
      .orderBy(col("nation"), desc("o_year"))

  private val q9Sql =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
      |                 - 0.5 * p_retailprice * l_quantity AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY n_name, CAST(year(o_orderdate) AS INTEGER)
      |ORDER BY nation, o_year DESC""".stripMargin

  // ---------------------------------------------------------------- q10
  // Returned-item report: join + agg + top-20.
  private def q10(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-10-01") && col("o_orderdate") < lit("1997-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(moneySum(rev).as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)

  private val q10Sql =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q11
  // Important-stock: group-agg + HAVING against a scalar subquery
  // (1-row DataFrame cross-joined — no collect).
  private def q11(s: SparkSession, d: String): DataFrame = {
    val base = Tables.lineitem(s, d)
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("l_partkey"), rev.as("v"))
    // the HAVING threshold is the grand total × 0.001 — re-sum the
    // per-part sums instead of re-running the whole join chain for a
    // second full-table aggregate (the grouped frame sits behind its
    // exchange, so both readers share one execution); grouped is ~|parts|
    // rows, so the extra aggregate is negligible at any scale
    val grouped = base.groupBy(col("l_partkey"))
      .agg(sum(col("v")).as("raw_value"))
    val total = grouped.agg((sum(col("raw_value")) * lit(0.001)).as("threshold"))
    grouped
      .crossJoin(broadcast(total))
      .filter(col("raw_value") > col("threshold"))
      .select(col("l_partkey").as("p_partkey"), money(col("raw_value")).as("value"))
      .orderBy(desc("value"), col("p_partkey"))
  }

  private val q11Sql =
    """WITH base AS (
      |  SELECT l_partkey, l_extendedprice * (1 - l_discount) AS v
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE')
      |SELECT l_partkey AS p_partkey, round(sum(v), 2) AS value
      |FROM base GROUP BY l_partkey
      |HAVING sum(v) > (SELECT sum(v) * 0.001 FROM base)
      |ORDER BY value DESC, p_partkey""".stripMargin

  // ---------------------------------------------------------------- q12
  // Shipping modes (adapted to return flags): join + conditional counts.
  private def q12(s: SparkSession, d: String): DataFrame = {
    val hi = when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01") &&
          col("l_returnflag").isin("A", "R")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(hi).as("high_line_count"), sum(lit(1L) - hi).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  private val q12Sql =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_returnflag IN ('A','R')
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q13
  // Customer order-count distribution: LEFT OUTER join + two-level agg.
  private def q13(s: SparkSession, d: String): DataFrame = {
    // aggregate orders per customer BEFORE the outer join (one partial-agg
    // shuffle of the filtered orders), then the join carries one row per
    // customer and the old post-join groupBy(c_custkey) — a full shuffle
    // of the joined rows — disappears; o_orderkey is non-null, so
    // count(o_orderkey) per customer ≡ the pre-aggregated count, 0 when
    // unmatched
    val ordCnt = Tables.orders(s, d).filter(col("o_orderpriority") =!= "5-LOW")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("_n"))
    Tables.customer(s, d)
      .join(ordCnt, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("_n"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  private val q13Sql =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------- q14
  // Promo revenue: join + conditional-agg ratio over one ship month.
  private def q14(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-09-01") && col("l_shipdate") < lit("1997-10-01"))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) / sum(rev), 6)
        .as("promo_revenue"))

  private val q14Sql =
    """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
      |                             THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      |             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin

  // ---------------------------------------------------------------- q15
  // Top supplier: CTE revenue view + "= max" via unpartitioned window.
  private def q15(s: SparkSession, d: String): DataFrame = {
    val revenue = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(rev).as("total_revenue"))
    // "= max" via a broadcast 1-row aggregate, NOT an unpartitioned window
    // (which would funnel every row through a single partition at scale).
    val maxRev = revenue.agg(max(col("total_revenue")).as("max_rev"))
    revenue.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_rev"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), money(col("total_revenue")).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  private val q15Sql =
    """WITH revenue AS (
      |  SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
      |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q16
  // Parts/supplier relationship: NOT IN → anti join + count distinct.
  private def q16(s: SparkSession, d: String): DataFrame = {
    val badSupp = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 1000).select(col("s_suppkey"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#5" && col("p_size").isin(9, 14, 15, 22, 31, 37)),
        col("l_partkey") === col("p_partkey"))
      .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#5' AND p_size IN (9, 14, 15, 22, 31, 37)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------- q17
  // Small-quantity revenue: correlated per-part AVG subquery → agg + join.
  private def q17(s: SparkSession, d: String): DataFrame = {
    // the correlated AVG is only ever read for parts passing the part
    // filter — restrict lineitem to those parts BEFORE the per-part
    // aggregate, so the groupBy shuffles the selective subset instead of
    // the whole table (the unfiltered per-part averages were computed
    // and then discarded by the join)
    val li = Tables.lineitem(s, d)
      .join(Tables.part(s, d)
          .filter(col("p_type") === "MEDIUM" && col("p_size") < 25)
          .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
    val partAvg = li.groupBy(col("l_partkey").as("pk"))
      .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_threshold"))
    li.join(partAvg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg(round(graft.functions.MoneyExpressions
        .toDouble(dsumMantissa(col("l_extendedprice"))) / 7.0, 6).as("avg_yearly"))
  }

  private val q17Sql =
    """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0, 6) AS avg_yearly
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type = 'MEDIUM' AND p_size < 25
      |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin

  // ---------------------------------------------------------------- q18
  // Large-volume customers: IN over HAVING subquery → semi join.
  private def q18(s: SparkSession, d: String): DataFrame = {
    // every final group key is order-level, so the per-order quantity sum
    // computed for the HAVING filter IS the output sum_qty: aggregate
    // lineitem once and join the ~0 surviving orders straight to
    // customer⨝orders — the original shape scanned and joined lineitem a
    // second time only to re-derive the same sum (2 lineitem passes → 1)
    val big = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("oq")).filter(col("oq") > 150)
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_orderdate"), col("o_totalprice"),
        money(col("oq")).as("sum_qty"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(100)
  }

  private val q18Sql =
    """SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |       o_totalprice, round(sum(l_quantity), 2) AS sum_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q19
  // Discounted revenue: disjunction-of-conjunctions join predicate.
  private def q19(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 21)) ||
        (col("p_brand") === "Brand#19" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#5" && col("p_size").between(1, 40) &&
          col("l_quantity").between(20, 50)))
      .agg(moneySum(rev).as("revenue"))

  private val q19Sql =
    """SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
      |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 40 AND l_quantity BETWEEN 20 AND 50)""".stripMargin

  // ---------------------------------------------------------------- q20
  // Potential part promotion: nested IN subqueries → semi-join chain.
  private def q20(s: SparkSession, d: String): DataFrame = {
    val smallParts = Tables.part(s, d).filter(col("p_name").like("small%"))
      .select(col("p_partkey"))
    val heavySupp = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .join(smallParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > 50)
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, d)
      .join(heavySupp, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  private val q20Sql =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY l_suppkey, l_partkey HAVING sum(l_quantity) > 50)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q21
  // Waiting suppliers: EXISTS + NOT EXISTS self-joins on lineitem
  // (late = shipped >60 days after order date).
  private def q21(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val l1 = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"))
    // kept as declarative semi/anti joins: a per-order countDistinct
    // reformulation was tried this round and measured SLOWER at sf0.1
    // (1.05s vs 0.68s — two distinct-aggregate passes cost more than the
    // broadcast semi/anti they replaced), with no structural win at scale
    // (the duplicated l1 shuffle dedupes via ReusedExchange either way)
    val others = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val othersLate = l1.select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
    l1
      .join(others, col("ok2") === col("l_orderkey") && col("sk2") =!= col("l_suppkey"), "left_semi")
      .join(othersLate, col("ok3") === col("l_orderkey") && col("sk3") =!= col("l_suppkey"), "left_anti")
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
      .limit(20)
  }

  private val q21Sql =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON l1.l_orderkey = o_orderkey
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND o3.o_orderstatus = 'F'
      |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q22
  // Global sales opportunity: scalar AVG subquery + NOT EXISTS anti join
  // (cntrycode replaced by c_custkey % 10 — no phone column).
  private def q22(s: SparkSession, d: String): DataFrame = {
    val segs = Seq("BUILDING", "MACHINERY", "FURNITURE")
    val c = Tables.customer(s, d).filter(col("c_mktsegment").isin(segs: _*))
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy((col("c_custkey") % 10).cast("int").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), moneySum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  private val q22Sql =
    """SELECT CAST(c_custkey % 10 AS INTEGER) AS cntrycode,
      |       count(*) AS numcust, CAST(round(sum(CAST(c_acctbal AS DECIMAL(30,6))), 2) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'FURNITURE')
      |  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
      |                   WHERE c_acctbal > 0
      |                     AND c_mktsegment IN ('BUILDING', 'MACHINERY', 'FURNITURE'))
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin

  override val queries: Seq[Q] = Seq(
    Q("q1_pricing_summary", q1, Some(q1Sql)),
    Q("q2_min_cost_supplier", q2, Some(q2Sql)),
    Q("q3_shipping_priority", q3, Some(q3Sql)),
    Q("q4_order_priority", q4, Some(q4Sql)),
    Q("q5_local_supplier", q5, Some(q5Sql)),
    Q("q6_forecast_revenue", q6, Some(q6Sql)),
    Q("q7_volume_shipping", q7, Some(q7Sql)),
    Q("q8_market_share", q8, Some(q8Sql)),
    Q("q9_product_profit", q9, Some(q9Sql)),
    Q("q10_returned_items", q10, Some(q10Sql)),
    Q("q11_important_stock", q11, Some(q11Sql)),
    Q("q12_ship_priority_class", q12, Some(q12Sql)),
    Q("q13_customer_distribution", q13, Some(q13Sql)),
    Q("q14_promo_revenue", q14, Some(q14Sql)),
    Q("q15_top_supplier", q15, Some(q15Sql)),
    Q("q16_part_supplier_rel", q16, Some(q16Sql)),
    Q("q17_small_qty_revenue", q17, Some(q17Sql)),
    Q("q18_large_volume_customer", q18, Some(q18Sql)),
    Q("q19_discounted_revenue", q19, Some(q19Sql)),
    Q("q20_part_promotion", q20, Some(q20Sql)),
    Q("q21_waiting_suppliers", q21, Some(q21Sql)),
    Q("q22_sales_opportunity", q22, Some(q22Sql)))
}
