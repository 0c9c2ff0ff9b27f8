package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness oracle.
  * Output column names/types must match between the two (the driver's
  * compare sorts columns by name and hashes values).
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryModule {
  def queries: Seq[Q]
}
