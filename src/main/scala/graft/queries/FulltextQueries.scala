package graft.queries

import graft.Tables
import graft.fulltext.Bm25
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fulltext BM25 queries over `documents` (MATCH ... AGAINST parity). */
object FulltextQueries extends QueryModule {

  private val TOK = """regexp_split_to_array(lower(trim(text)), '\s+')"""

  /** DuckDB BM25 scaffolding shared by the oracles. */
  private def bm25Cte(queryTermsSql: String) =
    s"""tok AS (SELECT doc_id, unnest($TOK) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |q AS ($queryTermsSql),
       |scored AS (
       |  SELECT tf.doc_id,
       |    sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
       |        * (tf * 2.5) / (tf + 1.5 * (1 - 0.75 + 0.75 * dl / avgdl))) AS score
       |  FROM tf JOIN q USING (term) JOIN dfreq USING (term)
       |       JOIN dl USING (doc_id) CROSS JOIN stats
       |  GROUP BY tf.doc_id)""".stripMargin

  // --------------------------------------------- natural language mode
  private val nlQuery = "spark join stream window"

  private def ft1(s: SparkSession, d: String): DataFrame =
    Bm25.matchAgainst(Tables.documents(s, d), "doc_id", "text", nlQuery)
      .orderBy(desc("score"), col("doc_id"))
      .limit(20)
      .select(col("doc_id"), round(col("score"), 6).as("score"))

  private val ft1Sql =
    s"""WITH ${bm25Cte("SELECT unnest(['spark','join','stream','window']) AS term")}
       |SELECT doc_id, round(score, 6) AS score FROM scored
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  // --------------------------------------------------------- boolean mode
  // +spark (must) -error (must not) join (should)
  private def ft2(s: SparkSession, d: String): DataFrame =
    Bm25.matchAgainst(Tables.documents(s, d), "doc_id", "text",
        "+spark -error join", booleanMode = true)
      .orderBy(desc("score"), col("doc_id"))
      .limit(20)
      .select(col("doc_id"), round(col("score"), 6).as("score"))

  private val ft2Sql =
    s"""WITH ${bm25Cte("SELECT unnest(['spark','join']) AS term")}
       |SELECT s.doc_id, round(s.score, 6) AS score FROM scored s
       |WHERE EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = s.doc_id AND tf.term = 'spark')
       |  AND NOT EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = s.doc_id AND tf.term = 'error')
       |ORDER BY score DESC, s.doc_id LIMIT 20""".stripMargin

  // ------------------------------------------------- index statistics
  /** The inverted index itself as a queryable artifact: top terms by
    * document frequency (ties broken by term).
    */
  private def ft3(s: SparkSession, d: String): DataFrame = {
    val index = Bm25.buildIndex(Tables.documents(s, d), "doc_id", "text")
    Bm25.docFreq(index)
      .join(index.groupBy(col("term")).agg(sum(col("tf")).as("total_tf")), Seq("term"))
      .orderBy(desc("df"), col("term"))
      .limit(30)
      .select(col("term"), col("df"), col("total_tf"))
  }

  private val ft3Sql =
    s"""WITH tok AS (SELECT doc_id, unnest($TOK) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term)
       |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
       |FROM tf GROUP BY term ORDER BY df DESC, term LIMIT 30""".stripMargin

  // ----------------------------------------- MATCH ... AGAINST predicate
  /** The SQL-surface predicate form (extension-injected `fulltext_match`,
    * expanded into token-set expressions at resolution).
    */
  private def ft4(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT doc_id,
        |  fulltext_match(text, 'spark stream') AS m_natural,
        |  fulltext_match(text, '+spark -error join') AS m_boolean
        |FROM documents ORDER BY doc_id""".stripMargin)
  }

  private val ft4Sql =
    s"""SELECT doc_id,
       |  (list_contains($TOK, 'spark') OR list_contains($TOK, 'stream')) AS m_natural,
       |  (list_contains($TOK, 'spark') AND NOT list_contains($TOK, 'error')) AS m_boolean
       |FROM documents ORDER BY doc_id""".stripMargin

  override val queries: Seq[Q] = Seq(
    Q("ft1_bm25_natural", ft1, Some(ft1Sql)),
    Q("ft2_bm25_boolean", ft2, Some(ft2Sql)),
    Q("ft3_index_stats", ft3, Some(ft3Sql)),
    Q("ft4_match_predicate", ft4, Some(ft4Sql)))
}
