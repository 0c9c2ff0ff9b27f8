package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog of the driver-generated testdata tables (TESTDATA.md).
  *
  * Mirrors the reference's table-scan surface (TableScan,
  * reference `pkg/sql/colexec/table_scan/`): reads are plain columnar
  * parquet scans so Catalyst gets predicate pushdown, column pruning and
  * row-group (zonemap-equivalent) skipping for free. At 100 TB each
  * `name.parquet` would be a partitioned directory; the API is unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columnar scan of one table. Keep filters/projections on the returned
    * DataFrame so they reach the parquet reader (PushedFilters/ReadSchema).
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright — we read it as a nanosecond long
    * (legacy flag) and truncate to a microsecond timestamp, matching how
    * DuckDB casts TIMESTAMP_NS → TIMESTAMP.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // session-level nanosAsLong is set once in GraftSession.builder;
      // set here only if the caller built its own session (library-safe:
      // no repeated conf writes on the hot read path)
      if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"), col("props"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view for `spark.sql` queries. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  // Typed accessors — small dims first (broadcast candidates at any scale).
  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
