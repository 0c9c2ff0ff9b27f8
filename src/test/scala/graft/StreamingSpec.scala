package graft

import graft.streaming.StreamingWindows
import graft.streaming.StreamingWindows.{SessionEvent, UserSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming tumbling counts equal the batch computation") {
    // streaming sources need a directory, not a file
    val dir = java.nio.file.Files.createTempDirectory("stream_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val streaming = StreamingWindows.tumblingCounts(
      StreamingWindows.readEvents(spark, dir.toString))
    val got = StreamingWindows.runToCompletion(spark, streaming, "stream_out")
      .select(col("_wstart"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(got == batch)
  }

  test("streaming watermarked dedup keeps one row per fingerprint, like batch distinct") {
    val dir = java.nio.file.Files.createTempDirectory("stream_dedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    // fingerprint with heavy collisions so dedup actually drops rows
    val src = StreamingWindows.readEvents(spark, dir.toString)
      .withColumn("fp", expr("event_id % 97"))
    val got = StreamingWindows.runToCompletion(spark,
      StreamingWindows.dedupByFingerprint(src, "fp"),
      "dedup_out", org.apache.spark.sql.streaming.OutputMode.Append())
    assert(got.count() == 97)
    assert(got.select("fp").distinct().count() == 97)
  }

  test("CDC-style foreachBatch upsert keeps the latest row per key") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val src = StreamingWindows.readEvents(spark, dir.toString)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
    StreamingWindows.upsertByKey(spark, src, "user_id", "ts", "user_latest")
    val got = spark.table("global_temp.user_latest")
    // compare latest event per user against the batch computation
    val expected = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(spark, sf)
        .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("_rn") === 1)
    }
    assert(got.count() == expected.count())
    val gotMax = got.groupBy().agg(org.apache.spark.sql.functions.max("ts")).head.get(0)
    val expMax = expected.groupBy().agg(org.apache.spark.sql.functions.max("ts")).head.get(0)
    assert(gotMax == expMax)
  }

  test("CDC change-feed source: incremental insert/update/delete replay to a keyed snapshot") {
    import graft.streaming.ChangeFeed
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("cdc_feed")
    val valueSchema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    def log(name: String, lines: String*): Unit =
      java.nio.file.Files.write(dir.resolve(name),
        lines.mkString("\n").getBytes("UTF-8"))

    // batch 1: inserts + one update in the same log segment
    log("000.json",
      """{"__op":"i","__lsn":10,"__ts":10,"k":1,"v":"a"}""",
      """{"__op":"i","__lsn":20,"__ts":11,"k":2,"v":"b"}""",
      """{"__op":"u","__lsn":30,"__ts":12,"k":1,"v":"a2"}""")
    ChangeFeed.follow(spark,
      ChangeFeed.read(spark, dir.toString, valueSchema), "k", "cdc_snap")
    assert(ChangeFeed.snapshot(spark, "cdc_snap")
      .collect().map(r => (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("v"))))
      .toSet == Set((1L, "a2"), (2L, "b")))

    // batch 2: a new segment lands — delete k=1, insert k=3, plus a
    // LATE out-of-order change for k=2 (lsn 15 < applied lsn 20) that
    // must lose to the snapshot. The fresh follow() has no checkpoint,
    // so segment 000 is replayed too — exercising idempotent re-apply.
    log("001.json",
      """{"__op":"d","__lsn":40,"__ts":13,"k":1,"v":null}""",
      """{"__op":"i","__lsn":50,"__ts":14,"k":3,"v":"c"}""",
      """{"__op":"u","__lsn":15,"__ts":11,"k":2,"v":"STALE"}""")
    ChangeFeed.follow(spark,
      ChangeFeed.read(spark, dir.toString, valueSchema), "k", "cdc_snap")
    assert(ChangeFeed.snapshot(spark, "cdc_snap")
      .collect().map(r => (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("v"))))
      .toSet == Set((2L, "b"), (3L, "c")))
  }

  test("sessionize splits on gaps and aggregates per session") {
    import spark.implicits._
    val minute = 60L * 1000000
    val events = Seq(
      SessionEvent(1L, 0 * minute, 1.0),
      SessionEvent(1L, 5 * minute, 2.0),
      SessionEvent(1L, 100 * minute, 3.0), // > 30min gap → new session
      SessionEvent(2L, 0 * minute, 4.0)).toDS()
    val sessions = StreamingWindows.sessionize(events, gapMicros = 30 * minute)
      .collect().sortBy(s => (s.user_id, s.session_start))
    assert(sessions.length == 3)
    assert(sessions(0) == UserSession(1L, 0, 5 * minute, 2, 3.0))
    assert(sessions(1) == UserSession(1L, 100 * minute, 100 * minute, 1, 3.0))
    assert(sessions(2).user_id == 2L && sessions(2).n_events == 1)
  }
}
