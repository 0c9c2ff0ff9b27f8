package graft.queries

import graft.Tables
import graft.sql.GraftSql
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's NON-standard SQL syntax, exercised as raw SQL strings
  * through [[graft.sql.GraftSql]] — `interval()/sliding()/fill()` time
  * windows, scored `MATCH...AGAINST`, and `sample(N rows)`, each mapped
  * onto the existing operators and oracle-checked. A reference user's
  * query text runs as-is; only the epoch/rounding projections below are
  * post-stages for cross-engine hash stability.
  */
object SqlDialectQueries extends QueryModule {

  private def run(s: SparkSession, d: String, q: String): DataFrame = {
    Tables.registerAll(s, d)
    GraftSql.sql(s, q)
  }

  // ------------------------------------------- tws1: interval + fill(prev)
  /** `test/distributed/cases/window/time_window.sql:13` shape: tumbling
    * 6-hour windows; the conditional sum is NULL in windows with no
    * 'error' events and fill(prev) carries the previous value forward.
    * The reference emits ONLY data-bearing windows — no interior gap
    * expansion even under fill() (`window/time_window.result:272-281`) —
    * so fill patches NULL cells across the sparse emitted rows.
    */
  private def tws1(s: SparkSession, d: String): DataFrame =
    run(s, d,
      """SELECT _wstart, _wend,
        |       CAST(round(sum(CASE WHEN event_type = 'error'
        |         THEN CAST(value AS DECIMAL(30,6)) END), 2) AS DOUBLE) AS v
        |FROM events
        |interval(ts, 6, hour) fill(prev)""".stripMargin)
      .select(to_unix_timestamp(col("_wstart")).as("ws"),
        to_unix_timestamp(col("_wend")).as("we"),
        round(col("v"), 6).as("v"))
      .orderBy(col("ws"))

  private val tws1Sql =
    """WITH agg AS (
      |  SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS ws,
      |         CAST(round(sum(CASE WHEN event_type = 'error'
      |           THEN CAST(value AS DECIMAL(30,6)) END), 2) AS DOUBLE) AS v
      |  FROM events GROUP BY ws)
      |SELECT ws, ws + 21600 AS we,
      |       round(coalesce(v, last_value(v IGNORE NULLS) OVER
      |         (ORDER BY ws ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS v
      |FROM agg ORDER BY ws""".stripMargin

  // ------------------------------------- tws2: interval + sliding, no fill
  /** `time_window.sql:23` shape: 1-day windows sliding every 12 hours. */
  private def tws2(s: SparkSession, d: String): DataFrame =
    run(s, d,
      """SELECT _wstart, count(event_id) AS n,
        |       CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS total
        |FROM events
        |interval(ts, 1, day) sliding(12, hour)""".stripMargin)
      .select(to_unix_timestamp(col("_wstart")).as("ws"), col("n"), col("total"))
      .orderBy(col("ws"))

  // the reference emits no sliding window starting before the
  // grid-aligned min(ts) (optimizer/column_pruning.result) — the oracle
  // drops the leading partials the cross-join construction generates
  private val tws2Sql =
    """SELECT CAST(floor(epoch(ts) / 43200) * 43200 - k.k * 43200 AS BIGINT) AS ws,
      |       count(*) AS n,
      |       CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS total
      |FROM events, (VALUES (0), (1)) k(k)
      |GROUP BY ws
      |HAVING ws >= (SELECT CAST(floor(min(epoch(ts)) / 43200) * 43200 AS BIGINT)
      |              FROM events)
      |ORDER BY ws""".stripMargin

  // --------------------------------------- fts1: scored MATCH ... AGAINST
  /** `fulltext.sql:353` shape: MATCH in projection (scored) AND in WHERE
    * (MySQL "relevance > 0" predicate), boolean mode.
    */
  private def fts1(s: SparkSession, d: String): DataFrame =
    run(s, d,
      """SELECT doc_id,
        |       round(MATCH(text) AGAINST('+spark -error join' IN BOOLEAN MODE), 6) AS score
        |FROM documents
        |WHERE MATCH(text) AGAINST('+spark -error join' IN BOOLEAN MODE)
        |ORDER BY score DESC, doc_id
        |LIMIT 20""".stripMargin)

  private val TOK = """regexp_split_to_array(lower(trim(text)), '\s+')"""
  private val fts1Sql =
    s"""WITH tok AS (SELECT doc_id, unnest($TOK) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |q AS (SELECT unnest(['spark','join']) AS term),
       |scored AS (
       |  SELECT tf.doc_id,
       |    sum(pow(log10(n_docs / df), 2)
       |        * (tf * 2.5) / (tf + 1.5 * (1 - 0.75 + 0.75 * dl / avgdl))) AS score
       |  FROM tf JOIN q USING (term) JOIN dfreq USING (term)
       |       JOIN dl USING (doc_id) CROSS JOIN stats
       |  GROUP BY tf.doc_id)
       |SELECT s.doc_id, round(s.score, 6) AS score FROM scored s
       |WHERE EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = s.doc_id AND tf.term = 'spark')
       |  AND NOT EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = s.doc_id AND tf.term = 'error')
       |ORDER BY score DESC, s.doc_id LIMIT 20""".stripMargin

  // -------------------------- ft10: multi-column MATCH(col1, col2) AGAINST
  /** `fulltext.sql` shape: `match(body, title) against('spark join')` —
    * the listed columns form ONE combined index (the reference
    * tokenizer concatenates them with '\n',
    * `fulltext_tokenize.go:142-150`), and natural mode is a POSITIONAL
    * PHRASE over the whole query (`patternToSql` → `SqlPhrase`,
    * `pkg/fulltext/sql.go:575-580`) scored with the reference BM25
    * (log10²-idf over the phrase df, tf = occurrences, ×nwords —
    * `fulltext.go:217-222`, `table_function/fulltext.go:805-830`). The
    * oracle re-derives the phrase anchors and the exact formula.
    */
  private def ft10(s: SparkSession, d: String): DataFrame =
    run(s, d,
      """SELECT doc_id,
        |       round(MATCH(text, source) AGAINST('spark join'), 6) AS score
        |FROM documents
        |ORDER BY score DESC, doc_id
        |LIMIT 20""".stripMargin)

  private val MTOK =
    """regexp_split_to_array(lower(trim(concat_ws(chr(10), text, source))), '\s+')"""
  private val ft10Sql =
    s"""WITH tok AS (SELECT doc_id, unnest($MTOK) AS term,
       |                    generate_subscripts($MTOK, 1) AS pos
       |             FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |anchors AS (
       |  SELECT doc_id, pos - 0 AS anchor FROM tok WHERE term = 'spark'
       |  UNION ALL
       |  SELECT doc_id, pos - 1 AS anchor FROM tok WHERE term = 'join'),
       |occ AS (SELECT doc_id, anchor FROM anchors
       |        GROUP BY doc_id, anchor HAVING count(*) = 2),
       |r AS (SELECT doc_id, count(*) AS occs FROM occ GROUP BY doc_id),
       |scored AS (
       |  SELECT r.doc_id,
       |    2 * power(log10(n_docs / (SELECT count(*) FROM r)), 2)
       |      * (occs * 2.5) / (occs + 1.5 * (1 - 0.75 + 0.75 * dl / avgdl)) AS score
       |  FROM r JOIN dl USING (doc_id) CROSS JOIN stats)
       |SELECT doc_id, round(score, 6) AS score FROM scored
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  // ----------------------------------------- sps1: sample(N rows) grouped
  /** `sample.sql:16` shape: per-group N-row sample inside GROUP BY,
    * determinized by md5 rank (see GraftSql.sampleRewrite).
    */
  private def sps1(s: SparkSession, d: String): DataFrame =
    run(s, d,
      """SELECT o_orderpriority, sample(o_orderstatus, 3 rows) AS st
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority, st""".stripMargin)

  private val sps1Sql =
    """SELECT o_orderpriority, st FROM (
      |  SELECT o_orderpriority, o_orderstatus AS st,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY (o_orderstatus IS NULL), md5(CAST(o_orderstatus AS VARCHAR))) AS _rn,
      |    count(o_orderstatus) OVER (PARTITION BY o_orderpriority) AS _nn
      |  FROM orders)
      |WHERE (_nn > 0 AND st IS NOT NULL AND _rn <= 3) OR (_nn = 0 AND _rn = 1)
      |ORDER BY o_orderpriority, st""".stripMargin

  // ------------------------------------- sps2: global sample over an expr
  private def sps2(s: SparkSession, d: String): DataFrame =
    run(s, d,
      """SELECT sample(lower(p_type), 5 rows) AS t
        |FROM part
        |ORDER BY t""".stripMargin)

  private val sps2Sql =
    """SELECT t FROM (
      |  SELECT lower(p_type) AS t,
      |    row_number() OVER (
      |      ORDER BY (lower(p_type) IS NULL), md5(CAST(lower(p_type) AS VARCHAR))) AS _rn,
      |    count(lower(p_type)) OVER () AS _nn
      |  FROM part)
      |WHERE (_nn > 0 AND t IS NOT NULL AND _rn <= 5) OR (_nn = 0 AND _rn = 1)
      |ORDER BY t""".stripMargin

  // ------------- pd1: partitioned table DDL + routed insert + pruned scan
  /** MySQL `PARTITION BY RANGE` (reference partition DDL + pruner,
    * `pkg/partitionprune/prune.go:43`): create → per-row routed
    * DISTRIBUTED insert → scan with a partition-column predicate. The
    * plan prunes to the matching partition directories (PartitionFilters
    * asserted in PlanSpec); the oracle computes the same aggregate over
    * the unpartitioned source.
    */
  private def pd1(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    GraftSql.sql(s, "drop table if exists orders_part")
    GraftSql.sql(s,
      """create table orders_part (
        |  o_orderkey bigint, o_totalprice double, o_orderstatus string)
        |partition by range (o_orderkey) (
        |  partition p0 values less than (4000),
        |  partition p1 values less than (8000),
        |  partition p2 values less than maxvalue)""".stripMargin)
    GraftSql.sql(s,
      "insert into orders_part select o_orderkey, o_totalprice, o_orderstatus from orders")
    GraftSql.sql(s,
      """select o_orderstatus, count(*) as n,
        |       cast(round(sum(cast(o_totalprice as decimal(30,6))), 2) as double) as total
        |from orders_part where o_orderkey < 4000
        |group by o_orderstatus order by o_orderstatus""".stripMargin)
  }

  private val pd1Sql =
    """SELECT o_orderstatus, count(*) AS n,
      |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,6))), 2) AS DOUBLE) AS total
      |FROM orders WHERE o_orderkey < 4000
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  override val queries: Seq[Q] = Seq(
    Q("tws1_interval_sql", tws1, Some(tws1Sql)),
    Q("tws2_sliding_sql", tws2, Some(tws2Sql)),
    Q("fts1_match_sql", fts1, Some(fts1Sql)),
    Q("ft10_multicol_match", ft10, Some(ft10Sql)),
    Q("sps1_sample_sql", sps1, Some(sps1Sql)),
    Q("sps2_sample_expr_sql", sps2, Some(sps2Sql)),
    Q("pd1_partitioned_scan", pd1, Some(pd1Sql)))
}
