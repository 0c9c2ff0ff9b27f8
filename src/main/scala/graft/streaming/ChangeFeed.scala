package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** CDC change-feed SOURCE + apply (SURVEY §2.14): the reference's CDC
  * reader tails a table's changes and emits ordered
  * insert/update/delete rows (`pkg/cdc/reader_v2_change_collector.go`
  * collects per-transaction changes; `pkg/cdc/sinker.go` replays them
  * in LSN order into a sink table). The Spark-native equivalent of the
  * change LOG is an append-only directory of change records consumed
  * by `readStream` — the same shape Delta's Change Data Feed and a
  * Kafka-backed Debezium topic expose:
  *
  *   __op  string  -- "i" insert | "u" update | "d" delete
  *   __lsn long    -- total order over changes (the reference's
  *                    commit-ts; ties in __ts are broken by __lsn)
  *   __ts  long    -- event-time micros (watermarkable)
  *   <key + payload columns per `valueSchema`>
  *
  * `apply` replays a micro-batch into a keyed snapshot with
  * last-writer-wins semantics: the highest-LSN change per key decides,
  * and a delete removes the key — exactly the reference sinker's
  * upsert/delete replay. The snapshot keeps `__lsn` so replay is
  * idempotent across batches (re-delivered older changes lose the
  * window rank and are ignored).
  *
  * At 100 TB the apply path shuffles only (key, batch ∪ snapshot) on
  * the key — for a real deployment the snapshot side would be a Delta/
  * Iceberg MERGE target; the window-over-union formulation here is the
  * engine-neutral core of that MERGE.
  */
object ChangeFeed {

  val opCol = "__op"
  val lsnCol = "__lsn"
  val tsCol = "__ts"

  private val metaFields = Seq(
    StructField(opCol, StringType), StructField(lsnCol, LongType),
    StructField(tsCol, LongType))

  def changeSchema(valueSchema: StructType): StructType =
    StructType(metaFields ++ valueSchema.fields)

  /** Streaming scan of an append-only change-log directory (json lines —
    * the log is small relative to the table; parquet works identically).
    */
  def read(spark: SparkSession, dir: String, valueSchema: StructType): DataFrame =
    spark.readStream.schema(changeSchema(valueSchema)).json(dir)

  /** Apply one micro-batch of changes to the keyed snapshot view.
    * Visible for spec-level replay/idempotency tests; `follow` wires it
    * into a streaming query.
    */
  def applyBatch(spark: SparkSession, batch: DataFrame, keyCol: String,
      targetView: String, prevCached: Option[DataFrame]): DataFrame = {
    val existing =
      if (spark.catalog.tableExists(s"global_temp.$targetView"))
        spark.table(s"global_temp.$targetView")
      else batch.limit(0)
    // snapshot rows re-enter the race as carriers of their applied LSN;
    // a re-delivered change with lsn <= snapshot's loses rank => idempotent.
    // Deletes stay in the state as TOMBSTONES (filtered by `snapshot`) so
    // a late re-delivery of an older change can never resurrect the key —
    // compacted-log semantics; a production deploy would expire tombstones
    // past the redelivery horizon.
    val merged = existing.unionByName(batch)
      .withColumn("_rn", row_number().over(
        W.partitionBy(col(keyCol)).orderBy(col(lsnCol).desc)))
      .filter(col("_rn") === 1)
      .drop("_rn")
    merged.cache().count()
    merged.createOrReplaceGlobalTempView(targetView)
    prevCached.foreach(_.unpersist())
    merged
  }

  /** Follow a change stream into a keyed snapshot global temp view,
    * processing everything currently available (the test-mode analog of
    * a continuously-running CDC task — callers re-invoke after new log
    * files land, or `start` without stop for continuous tailing).
    */
  def follow(spark: SparkSession, changes: DataFrame, keyCol: String,
      targetView: String): Unit = {
    var prevCached: Option[DataFrame] = None
    val q = changes.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        prevCached = Some(applyBatch(spark, batch, keyCol, targetView, prevCached))
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** The snapshot without tombstones or CDC metadata — what a reader of
    * the sink table sees.
    */
  def snapshot(spark: SparkSession, targetView: String): DataFrame =
    spark.table(s"global_temp.$targetView")
      .filter(col(opCol) =!= "d").drop(opCol, lsnCol, tsCol)
}
