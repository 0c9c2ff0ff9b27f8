package graft.fulltext

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fulltext search: `MATCH(cols) AGAINST(query [IN NATURAL LANGUAGE MODE |
  * IN BOOLEAN MODE])` re-expressed as an inverted-index DataFrame plus a
  * BM25 scorer (reference: `pkg/fulltext/fulltext.go:215-223` scoring with
  * k1/b in `pkg/fulltext/types.go:19-20`; boolean-mode parser
  * `fulltext.go:731`).
  *
  * Scale design: the posting list (term, doc_id, tf) is the canonical
  * shuffle-by-term inverted index; a query is a broadcast semi-join of a
  * handful of terms against it — the corpus is never rescanned per term.
  * At 100 TB the postings would be written bucketed by term so matches
  * prune at file level (≙ the reference's fulltext index table).
  */
object Bm25 {

  val K1 = 1.5
  val B = 0.75

  /** Posting lists: one row per (doc, term) with term frequency + doc
    * length. Reused across queries — persist/write once per corpus.
    */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("dl", sum(col("tf")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))

  /** Corpus stats (N, avgdl) as a 1-row DataFrame (broadcast later). */
  def corpusStats(index: DataFrame): DataFrame =
    index.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

  /** Document frequency per term. */
  def docFreq(index: DataFrame): DataFrame =
    index.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** BM25 score of every document matching ≥1 query term.
    * idf = ln((N - df + 0.5)/(df + 0.5) + 1)  (Robertson-Sparck Jones+1).
    */
  def scoreNatural(index: DataFrame, queryTerms: Seq[String]): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val q = queryTerms.distinct.toDF("term")
    val withDf = index
      .join(broadcast(q), Seq("term"))
      .join(broadcast(docFreq(index).join(broadcast(q), Seq("term"))), Seq("term"))
      .crossJoin(broadcast(corpusStats(index)))
    withDf
      .withColumn("_idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("_w",
        col("_idf") * (col("tf") * (K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("_w")).as("score"))
  }

  /** Minimal boolean mode: `+term` must appear, `-term` must not, bare
    * terms are optional should-terms (scored). Scoring uses the plus and
    * should terms.
    */
  def scoreBoolean(index: DataFrame, query: String): DataFrame = {
    val toks = query.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    val must = toks.filter(_.startsWith("+")).map(_.drop(1))
    val mustNot = toks.filter(_.startsWith("-")).map(_.drop(1))
    val should = toks.filterNot(t => t.startsWith("+") || t.startsWith("-"))
    val spark = index.sparkSession
    import spark.implicits._
    var result = scoreNatural(index, must ++ should)
    must.foreach { t =>
      val docsWith = index.filter(col("term") === t).select(col("doc_id"))
      result = result.join(docsWith, Seq("doc_id"), "left_semi")
    }
    if (mustNot.nonEmpty) {
      val excluded = index
        .join(broadcast(mustNot.toDF("term")), Seq("term"))
        .select(col("doc_id")).distinct()
      result = result.join(excluded, Seq("doc_id"), "left_anti")
    }
    result
  }

  /** One-call `match ... against` on a raw document table. */
  def matchAgainst(docs: DataFrame, idCol: String, textCol: String,
      query: String, booleanMode: Boolean = false): DataFrame = {
    val index = buildIndex(docs, idCol, textCol)
    if (booleanMode) scoreBoolean(index, query)
    else scoreNatural(index, query.trim.toLowerCase.split("\\s+").toSeq)
  }
}
