package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.14): the reference has no
  * continuous-query engine — its streaming-adjacent features are CDC
  * tasks (`pkg/cdc/`) and the time-window operator (§2.8). Spark's
  * capability-equivalent: streaming reads + watermarked window aggregates
  * + stateful sessionization; CDC ≙ a streaming source feeding
  * `foreachBatch` sinks.
  */
object StreamingWindows {

  /** Streaming scan of an events parquet directory. Structured Streaming
    * needs an explicit schema, so we take it from a one-off batch read of
    * the same dir, then normalize `ts` to a session-zone TIMESTAMP exactly
    * like `Tables.load`: legacy TIMESTAMP(NANOS)-as-long is truncated to
    * micros, TIMESTAMP(MICROS)/NTZ passes through (session zone is UTC).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val fileSchema = spark.read.parquet(dir).schema
    val ts = fileSchema("ts").dataType match {
      case LongType => timestamp_micros((col("ts") / 1000L).cast("long"))
      case _: TimestampNTZType => col("ts").cast("timestamp")
      case _ => col("ts")
    }
    spark.readStream.schema(fileSchema).parquet(dir).withColumn("ts", ts)
  }

  /** Watermarked tumbling-window aggregate (append-mode capable). */
  def tumblingCounts(events: DataFrame, width: String = "1 day",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("_wstart"), col("event_type"),
        col("n"), col("total"))

  /** Run a streaming query over a (static) parquet dir through the memory
    * sink until all available data is processed; returns the result table.
    */
  def runToCompletion(spark: SparkSession, streaming: DataFrame,
      name: String, mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = streaming.writeStream.format("memory")
      .queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Streaming exact dedup for ingest pipelines: watermarked
    * `dropDuplicates` on a fingerprint column — late arrivals beyond
    * the watermark age out of state, so memory is bounded by the
    * watermark horizon instead of the stream's lifetime (the batch
    * analog is `Dedup.exact`; in an LLM ingest DAG this is the
    * keep-first-seen stage).
    */
  def dedupByFingerprint(stream: DataFrame, fingerprintCol: String,
      tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicates(fingerprintCol)

  final case class SessionEvent(user_id: Long, ts_micros: Long, value: Double)
  final case class UserSession(
      user_id: Long, session_start: Long, session_end: Long, n_events: Int,
      total_value: Double)

  /** Gap-based sessionization with explicit state —
    * `flatMapGroupsWithState` (the KeyValueGroupedDataset custom-state
    * surface). Emits a session when `gapMicros` of silence passes.
    */
  def sessionize(events: Dataset[SessionEvent], gapMicros: Long): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionEvent], UserSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[List[SessionEvent]]) =>
          // batch-mode usage: all rows for the key arrive at once
          val sorted = rows.toList.sortBy(e => (e.ts_micros, e.value))
          val sessions = scala.collection.mutable.ListBuffer[UserSession]()
          var cur = List.empty[SessionEvent]
          sorted.foreach { e =>
            if (cur.nonEmpty && e.ts_micros - cur.head.ts_micros > gapMicros) {
              sessions += close(userId, cur.reverse)
              cur = Nil
            }
            cur = e :: cur
          }
          if (cur.nonEmpty) sessions += close(userId, cur.reverse)
          sessions.iterator
      }
  }

  private def close(userId: Long, evs: List[SessionEvent]): UserSession =
    UserSession(userId, evs.head.ts_micros, evs.last.ts_micros, evs.size,
      evs.map(_.value).sum)

  /** CDC-style sink: stream micro-batches upserted into a keyed state
    * table via `foreachBatch` (the reference's CDC task pushes ordered
    * changes into mysql/matrixone sinks, `pkg/cdc/sinker.go:40`; on Spark
    * the sink contract is foreachBatch + MERGE-style upsert). Keeps the
    * latest row per key — returns the upsert target for inspection.
    */
  def upsertByKey(spark: SparkSession, source: DataFrame, keyCol: String,
      orderCol: String, targetView: String): Unit = {
    import org.apache.spark.sql.expressions.{Window => W}
    // Long-running-stream hygiene: each micro-batch caches its merged
    // state frame, so the previous batch's cache must be released once
    // the view swap makes it unreachable — otherwise cached state grows
    // by one full state-table copy per batch.
    var prevCached: Option[DataFrame] = None
    val q = source.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val existing =
          if (spark.catalog.tableExists(s"global_temp.$targetView"))
            spark.table(s"global_temp.$targetView")
          else batch.limit(0)
        val merged = existing.unionByName(batch)
          .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
            W.partitionBy(org.apache.spark.sql.functions.col(keyCol))
              .orderBy(org.apache.spark.sql.functions.col(orderCol).desc)))
          .filter(org.apache.spark.sql.functions.col("_rn") === 1)
          .drop("_rn")
        // materialize before replacing the view the next batch reads
        merged.cache().count()
        // foreachBatch runs in a cloned session: only GLOBAL temp views
        // are visible to the caller's session
        merged.createOrReplaceGlobalTempView(targetView)
        prevCached.foreach(_.unpersist())
        prevCached = Some(merged)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
