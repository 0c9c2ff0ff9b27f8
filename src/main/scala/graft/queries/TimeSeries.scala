package graft.queries

import graft.Tables
import graft.operators.TimeWindow
import graft.operators.TimeWindow._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series window + gap-fill queries over the `events` stream table
  * (reference BVT `test/distributed/cases/window/time_window.sql`).
  * Window starts are exposed as epoch seconds (`ws`) so both engines
  * compare exact integers; window() buckets are epoch-aligned in Spark,
  * mirrored in DuckDB with floor(epoch/width)*width.
  */
object TimeSeries extends QueryModule {

  // exact-money kernel: value-identical to sum(CAST(c AS DECIMAL(30,6)))
  // (MoneySpec pins the equivalence) without the per-row decimal cost
  private def moneySum(c: Column): Column =
    graft.functions.MoneyExpressions.moneySum(c)

  // Tumbling 1-day windows per event type.
  private def tumbling(s: SparkSession, d: String): DataFrame =
    TimeWindow.tumbling(Tables.events(s, d), col("ts"), "1 day",
        Seq(col("event_type")),
        Seq(count(lit(1)).as("n"), moneySum(col("value")).as("total")))
      .select(col("event_type"), to_unix_timestamp(col("_wstart")).as("ws"),
        to_unix_timestamp(col("_wend")).as("we"), col("n"), col("total"))
      .orderBy(col("event_type"), col("ws"))

  private val tumblingSql =
    """SELECT event_type,
      |       CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS ws,
      |       CAST(floor(epoch(ts) / 86400) * 86400 + 86400 AS BIGINT) AS we,
      |       count(*) AS n,
      |       CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS total
      |FROM events GROUP BY event_type, ws, we
      |ORDER BY event_type, ws""".stripMargin

  // Sliding windows: width 1 day, slide 12 hours (each event in 2 windows).
  private def slidingQ(s: SparkSession, d: String): DataFrame =
    TimeWindow.sliding(Tables.events(s, d), col("ts"), "1 day", "12 hours",
        Nil, Seq(count(lit(1)).as("n"), moneySum(col("value")).as("total")))
      .select(to_unix_timestamp(col("_wstart")).as("ws"), col("n"), col("total"))
      .orderBy(col("ws"))

  private val slidingSql =
    """SELECT CAST(floor(epoch(ts) / 43200) * 43200 - k.k * 43200 AS BIGINT) AS ws,
      |       count(*) AS n,
      |       CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS total
      |FROM events, (VALUES (0), (1)) k(k)
      |GROUP BY ws ORDER BY ws""".stripMargin

  // Gap-fill base: 6-hourly sum of 'error' event values (sparse buckets).
  private def errAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).filter(col("event_type") === "error")
      .groupBy((floor(to_unix_timestamp(col("ts")) / 21600) * 21600).cast("long").as("ws"))
      .agg(moneySum(col("value")).as("v"))

  private val errAggSql =
    """SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS ws,
      |       CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS v
      |FROM events WHERE event_type = 'error' GROUP BY ws""".stripMargin

  private def fillQuery(mode: FillMode)(s: SparkSession, d: String): DataFrame =
    TimeWindow.gapFill(errAgg(s, d), "ws", 21600L, "v", mode)
      .select(col("ws"), round(col("v"), 6).as("v"))
      .orderBy(col("ws"))

  private def spineSql(fillExpr: String, windowClause: String = "") =
    s"""WITH agg AS ($errAggSql),
       |spine AS (
       |  SELECT unnest(generate_series((SELECT min(ws) FROM agg),
       |                                (SELECT max(ws) FROM agg), 21600)) AS ws),
       |j AS (SELECT s.ws, a.v FROM spine s LEFT JOIN agg a ON s.ws = a.ws)
       |SELECT ws, round($fillExpr, 6) AS v FROM j $windowClause ORDER BY ws""".stripMargin

  private val fillPrevSql = spineSql(
    "last_value(v IGNORE NULLS) OVER (ORDER BY ws ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
  private val fillNextSql = spineSql(
    "first_value(v IGNORE NULLS) OVER (ORDER BY ws ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)")
  private val fillValueSql = spineSql("coalesce(v, 0.0)")
  private val fillNullSql = spineSql("v")
  private val fillLinearSql = spineSql(
    """CASE WHEN v IS NOT NULL THEN v
      |     WHEN last_value(v IGNORE NULLS) OVER back IS NOT NULL
      |      AND first_value(v IGNORE NULLS) OVER fwd IS NOT NULL
      |     THEN last_value(v IGNORE NULLS) OVER back
      |          + (first_value(v IGNORE NULLS) OVER fwd
      |             - last_value(v IGNORE NULLS) OVER back)
      |            * (ws - last_value(CASE WHEN v IS NOT NULL THEN ws END IGNORE NULLS) OVER back)
      |            / (first_value(CASE WHEN v IS NOT NULL THEN ws END IGNORE NULLS) OVER fwd
      |               - last_value(CASE WHEN v IS NOT NULL THEN ws END IGNORE NULLS) OVER back)
      |     ELSE NULL END""".stripMargin,
    """WINDOW back AS (ORDER BY ws ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |       fwd AS (ORDER BY ws ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)""".stripMargin)

  override val queries: Seq[Q] = Seq(
    Q("tw1_tumbling_day", tumbling, Some(tumblingSql)),
    Q("tw2_sliding_12h", slidingQ, Some(slidingSql)),
    Q("tw3_fill_prev", fillQuery(FillPrev), Some(fillPrevSql)),
    Q("tw4_fill_next", fillQuery(FillNext), Some(fillNextSql)),
    Q("tw5_fill_value", fillQuery(FillValue(0.0)), Some(fillValueSql)),
    Q("tw6_fill_null", fillQuery(FillNull), Some(fillNullSql)),
    Q("tw7_fill_linear", fillQuery(FillLinear), Some(fillLinearSql)))
}
