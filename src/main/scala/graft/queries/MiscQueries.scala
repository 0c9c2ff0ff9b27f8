package graft.queries

import graft.Tables
import graft.operators.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sampling + table-function + lateral coverage (reference sample operator
  * §2.6, TableFunction §2.10, Apply/lateral §2.3).
  */
object MiscQueries extends QueryModule {

  // ------------------------------------------- deterministic group sample
  private def sp1(s: SparkSession, d: String): DataFrame =
    Sampling.deterministicSample(
        Tables.orders(s, d).withColumn("blk", (col("o_custkey") % 10).cast("long")),
        Seq(col("blk")), 2, col("o_orderkey"))
      .select(col("blk"), col("o_orderkey"))
      .orderBy(col("blk"), col("o_orderkey"))

  private val sp1Sql =
    """SELECT blk, o_orderkey FROM (
      |  SELECT o_custkey % 10 AS blk, o_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey % 10
      |                       ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 2 ORDER BY blk, o_orderkey""".stripMargin

  // ------------------------------------- random sample: sizes invariant
  private def sp2(s: SparkSession, d: String): DataFrame =
    Sampling.randomSample(
        Tables.customer(s, d).withColumn("blk", (col("c_custkey") % 7).cast("long")),
        Seq(col("blk")), 5)
      .groupBy(col("blk")).agg(count(lit(1)).as("n_sampled"))
      .orderBy(col("blk"))

  private val sp2Sql =
    """SELECT c_custkey % 7 AS blk,
      |  least(count(*), 5) AS n_sampled
      |FROM customer GROUP BY blk ORDER BY blk""".stripMargin

  // -------------------------------------------------- generate_series
  private def tf1(s: SparkSession, d: String): DataFrame =
    s.range(1)
      .select(explode(sequence(lit(1L), lit(1000L), lit(7L))).as("n"))
      .select(col("n"), (col("n") * col("n")).as("sq"))
      .filter(col("n") % 2 === 1)
      .orderBy(col("n"))

  private val tf1Sql =
    """SELECT n, n * n AS sq FROM (
      |  SELECT unnest(generate_series(1, 1000, 7)) AS n) t
      |WHERE n % 2 = 1 ORDER BY n""".stripMargin

  // ------------------------------------------------------ unnest (json)
  private def tf2(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .select(col("event_id"),
        explode(array(col("k"), col("k") * 2, col("k") * 3)).as("kx"))
      .groupBy(col("event_id")).agg(sum(col("kx")).as("ksum"), count(lit(1)).as("n"))
      .orderBy(col("event_id"))

  private val tf2Sql =
    """SELECT event_id,
      |  CAST(sum(kx) AS BIGINT) AS ksum, count(*) AS n
      |FROM (
      |  SELECT event_id,
      |    unnest([CAST(json_extract_string(props, '$.k') AS BIGINT) * m]) AS kx
      |  FROM events, (VALUES (1), (2), (3)) mult(m)) t
      |GROUP BY event_id ORDER BY event_id""".stripMargin

  // --------------------------------------------------- lateral (Apply)
  /** Correlated lateral subquery: top-2 customers per nation — the
    * reference's Apply operator (`pkg/sql/colexec/apply/types.go:30-43`).
    */
  private def tf3(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT n.n_name, t.c_name, t.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_name, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin)
  }

  private val tf3Sql =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM nation n,
      |LATERAL (SELECT c_name, c_acctbal FROM customer c
      |         WHERE c.c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin

  // ------------------------------------- generic unnest(json, path) TF
  /** The reference's full unnest output shape (index/key/path/value/
    * this, `table_function/unnest.go`): object members of `props` at
    * `$` plus array elements of a synthesized doc at `$.tags`, stacked.
    * Every column is re-derived arithmetically in DuckDB from the known
    * document shape.
    */
  private def tf4(s: SparkSession, d: String): DataFrame = {
    import graft.operators.JsonUnnest
    val ev = Tables.events(s, d)
    val objRows = JsonUnnest.unnest(
        ev.select(col("event_id"), col("props")), col("props"), "$",
        keep = Seq(col("event_id")))
      .withColumn("kind", lit("obj"))
    val doc = concat(lit("""{"tags":[1,2,"""), (col("event_id") % 7).cast("string"),
      lit("]}"))
    val arrRows = JsonUnnest.unnest(
        ev.select(col("event_id"), doc.as("doc")), col("doc"), "$.tags",
        keep = Seq(col("event_id")))
      .withColumn("kind", lit("arr"))
    objRows.unionByName(arrRows)
      .select(col("event_id"), col("kind"), col("index"), col("key"),
        col("path"), col("value"), col("this"))
      .orderBy(col("event_id"), col("kind"), col("index"))
  }

  private val tf4Sql =
    """SELECT event_id, kind, "index", key, path, value, this FROM (
      |  SELECT event_id, 'obj' AS kind, CAST(NULL AS INTEGER) AS "index",
      |    'k' AS key, '$.k' AS path,
      |    CAST(json_extract(props, '$.k') AS VARCHAR) AS value,
      |    '{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR) || '}' AS this
      |  FROM events
      |  UNION ALL
      |  SELECT event_id, 'arr' AS kind, CAST(i AS INTEGER) AS "index",
      |    CAST(NULL AS VARCHAR) AS key,
      |    '$.tags[' || CAST(i AS VARCHAR) || ']' AS path,
      |    CASE i WHEN 0 THEN '1' WHEN 1 THEN '2'
      |           ELSE CAST(event_id % 7 AS VARCHAR) END AS value,
      |    '[1,2,' || CAST(event_id % 7 AS VARCHAR) || ']' AS this
      |  FROM events CROSS JOIN range(0, 3) r(i))
      |ORDER BY event_id, kind, "index"""".stripMargin

  // ----------------------------------------------- LOAD DATA ingestion
  /** The reference's `LOAD DATA INFILE` SQL ingest path
    * (`pkg/sql/colexec/external/external.go:152,829`) through GraftSql:
    * pipe-separated CSV with empty-string numerics (→ NULL, issue_24211
    * semantics) loaded into a catalog table, then aggregated. The oracle
    * re-reads the same fixture with DuckDB's read_csv.
    */
  private val loadFixture = "/root/repo/fixtures/load_demo.csv"

  private def load1(s: SparkSession, d: String): DataFrame = {
    s.sql("DROP TABLE IF EXISTS load_demo")
    // explicit temp LOCATION: immune to warehouse leftovers from a
    // crashed prior run (LOCATION_ALREADY_EXISTS on managed create)
    val loc = java.nio.file.Files.createTempDirectory("graft_load_demo")
    s.sql("CREATE TABLE load_demo(id INT, qty INT, amount DOUBLE, label STRING) " +
      s"USING parquet LOCATION '$loc/t'")
    graft.sql.GraftSql.sql(s,
      s"load data infile '$loadFixture' into table load_demo " +
        "fields terminated by '|' parallel 'true'")
    s.table("load_demo")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(col("qty")).as("total_qty"),
        round(sum(col("amount").cast("decimal(30,6)")), 2).cast("double")
          .as("total_amount"),
        count(col("amount")).as("n_amount"),
        count(col("qty")).as("n_qty"))
      .orderBy(col("label"))
  }

  // empty numeric cells load as 0 (MySQL/issue_24211 semantics) — the
  // oracle reads raw strings and applies the same coercion
  private val load1Sql =
    s"""SELECT label, count(*) AS n,
      |  CAST(sum(CASE WHEN qty = '' THEN 0 ELSE CAST(qty AS INTEGER) END) AS BIGINT)
      |    AS total_qty,
      |  CAST(round(sum(CAST(CASE WHEN amount = '' THEN '0' ELSE amount END
      |    AS DECIMAL(30,6))), 2) AS DOUBLE) AS total_amount,
      |  count(amount) AS n_amount, count(qty) AS n_qty
      |FROM read_csv('/root/repo/fixtures/load_demo.csv', delim='|', header=false,
      |  nullstr='\\N', all_varchar=true,
      |  columns={'id':'VARCHAR','qty':'VARCHAR','amount':'VARCHAR','label':'VARCHAR'})
      |GROUP BY label ORDER BY label""".stripMargin

  // (projection-context 3VL IN is exercised through the BVT goldens —
  // subquery/subquery-with-in.result — rather than a DuckDB oracle
  // pair: DuckDB's own projection-IN null handling diverges from the
  // standard here)

  override val queries: Seq[Q] = Seq(
    Q("tf4_unnest_json", tf4, Some(tf4Sql)),
    Q("sp1_group_sample", sp1, Some(sp1Sql)),
    Q("sp2_random_sample_sizes", sp2, Some(sp2Sql)),
    Q("tf1_generate_series", tf1, Some(tf1Sql)),
    Q("tf2_unnest", tf2, Some(tf2Sql)),
    Q("tf3_lateral_topn", tf3, Some(tf3Sql)),
    Q("load1_csv_ingest", load1, Some(load1Sql)))
}
