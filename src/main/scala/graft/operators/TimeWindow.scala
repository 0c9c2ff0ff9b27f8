package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-window aggregation + gap fill — the reference's non-standard
  * `select _wstart, _wend, agg(...) from t interval(ts, N, unit)
  * [sliding(...)] fill(prev|next|none|null|value|linear)` surface
  * (operators `pkg/sql/colexec/timewin/types.go:199` and
  * `pkg/sql/colexec/fill/types.go:39-81`; fill modes
  * `pkg/pb/plan/plan.pb.go:908-916`).
  *
  * Spark-first design: tumbling/sliding windows are the built-in
  * `window()` expression (codegen'd, partition-parallel); gap fill joins
  * the aggregated (already small) result against a dense spine generated
  * with `sequence()` and fills with ignore-nulls window functions.
  *
  * Scale notes: the fill runs on AGGREGATED rows (one per window×key), not
  * raw events, so its window sort is tiny even at 100 TB input. With
  * `keys`, the fill parallelizes per key; keyless fill is a single
  * partition by construction (a global timeline is inherently ordered) —
  * fine because its input is already one row per window.
  */
object TimeWindow {

  sealed trait FillMode
  case object FillNone extends FillMode            // drop nothing, no spine
  case object FillNull extends FillMode            // spine, gaps stay NULL
  case object FillPrev extends FillMode            // last non-null before
  case object FillNext extends FillMode            // first non-null after
  final case class FillValue(v: Double) extends FillMode
  case object FillLinear extends FillMode          // interpolate interior gaps

  /** The reference aligns window boundaries to its Datetime origin
    * 0001-01-01 00:00:00 (`left = val - val % interval`,
    * `pkg/sql/colexec/timewin/timewin.go:475` — `val` is micros since
    * year 1), not the Unix epoch. 0001-01-01 is a whole number of days
    * (719162) before 1970-01-01, so second/minute/hour/1-day windows
    * coincide with epoch alignment, but e.g. 3-day windows sit 1 day
    * off. Spark's `window()` exposes the shift as `startTime`.
    */
  private[graft] val MoOriginEpochSec = -719162L * 86400L
  /** startTime shift (seconds) aligning a `periodSec` grid to the MO origin. */
  private[graft] def moOffsetSec(periodSec: Long): Long =
    java.lang.Math.floorMod(MoOriginEpochSec, periodSec)
  private val WidthRe = """(?i)\s*(\d+)\s*(second|minute|hour|day)s?\s*""".r
  private def moStartTime(period: String): String = {
    val p = period match {
      case WidthRe(n, u) => n.toLong * (u.toLowerCase match {
        case "second" => 1L
        case "minute" => 60L
        case "hour" => 3600L
        case "day" => 86400L
      })
      case _ => 1L
    }
    s"${moOffsetSec(p)} seconds"
  }

  /** Tumbling window aggregate: `_wstart`/`_wend` ≙ reference column names. */
  def tumbling(df: DataFrame, ts: Column, width: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys :+ window(ts, width, width, moStartTime(width)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("_wstart", col("window.start"))
      .withColumn("_wend", col("window.end"))
      .drop("window")

  /** Sliding window aggregate (width/slide), e.g. 1 day every 12 hours. */
  def sliding(df: DataFrame, ts: Column, width: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys :+ window(ts, width, slide, moStartTime(slide)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("_wstart", col("window.start"))
      .withColumn("_wend", col("window.end"))
      .drop("window")

  /** Gap fill over a numeric window-start column (epoch seconds or any
    * regular numeric spine with step `step`). Missing (key, ws) slots are
    * materialized via an exploded `sequence(min, max, step)` per key and
    * `valueCol` is filled per `mode`.
    *
    * With `keys`, fills parallelize per key. KEYLESS fill is
    * range-bucketed instead of funneled through one global window:
    * slots are generated per time bucket (`slotsPerBucket` each),
    * row-level fills run partitioned by bucket, and boundary carry-over
    * (the last/first non-null of preceding/following buckets) comes
    * from a per-bucket summary — a DataFrame with ONE ROW PER BUCKET —
    * broadcast back. Only that tiny summary ever crosses buckets, so a
    * decade of 1-second windows fills shuffle-parallel.
    */
  def gapFill(df: DataFrame, ws: String, step: Long, valueCol: String,
      mode: FillMode, keys: Seq[String] = Nil,
      slotsPerBucket: Long = 65536L): DataFrame = {
    if (mode == FillNone) return df
    if (keys.nonEmpty) return gapFillKeyed(df, ws, step, valueCol, mode, keys)

    // One tiny eager job on the (already-aggregated, persisted) frame
    // decides the path: a spine that fits in one bucket takes the
    // single-window formulation — the bucketed machinery pays extra
    // stages that only amortize on timelines longer than a bucket.
    // 64k slots per task is still trivially memory-bounded; a decade of
    // 1-second windows is ~4.8k buckets → parallel at cluster scale.
    val dfp = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val b = dfp.agg(min(col(ws)).cast("long").as("mn"),
      max(col(ws)).cast("long").as("mx")).head
    if (b.isNullAt(0)) return dfp
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val slots = (mx - mn) / step + 1
    // pmod(ws, 1) is a constant key the optimizer can't fold away: it
    // states "deliberately single-partition over bounded input" without
    // tripping WindowExec's all-data-one-task warning. The spine comes
    // straight from the just-probed literal bounds (`range` is born
    // partitioned) — the keyed path would re-derive min/max with a
    // second aggregate+exchange over data we already reduced driver-side.
    if (slots <= slotsPerBucket) {
      val spine = dfp.sparkSession.range(0L, slots)
        .select((lit(mn) + col("id") * step).cast(dfp.schema(ws).dataType).as(ws))
      val joined = spine.join(dfp, Seq(ws), "left")
        .withColumn("_gk", pmod(col(ws).cast("long"), lit(1L)))
      return fillJoined(joined, ws, valueCol, mode, Seq(col("_gk"))).drop("_gk")
    }

    val v = col(valueCol)
    val span = step * slotsPerBucket
    // distributed spine from the literal bounds: `range` is born
    // partitioned (no shuffle, no second bounds job), each task
    // explodes only its own bucket's slots — no single task ever
    // holds the whole timeline
    val spine = df.sparkSession.range(0L, (mx - mn) / span + 1)
      .select(col("id").as("_b"),
        explode(sequence(
          lit(mn) + col("id") * span,
          least(lit(mx), lit(mn) + (col("id") + 1) * span - step),
          lit(step))).as(ws))
    val joined = spine.join(dfp, Seq(ws), "left")

    val wB = Window.partitionBy(col("_b")).orderBy(col(ws))
    val back = wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = wB.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    def stripped(d: DataFrame) = d.drop("_b")
    mode match {
      case FillNull => stripped(joined)
      case FillValue(const) => stripped(joined.withColumn(valueCol, coalesce(v, lit(const))))
      case FillPrev | FillNext | FillLinear =>
        // per-bucket boundary summary: one row per bucket (tiny)
        val summary = joined.groupBy(col("_b")).agg(
          max_by(v, when(v.isNotNull, col(ws))).as("_lastV"),
          max(when(v.isNotNull, col(ws))).as("_lastW"),
          min_by(v, when(v.isNotNull, col(ws))).as("_firstV"),
          min(when(v.isNotNull, col(ws))).as("_firstW"))
        // running carry across the bucket summaries: one row per bucket,
        // so a single partition is bounded-small by construction (a
        // decade of 1-second slots is ~40k summary rows). pmod(_b, 1)
        // is a constant partition key the optimizer can't fold away —
        // it states "deliberately single-partition over bounded input"
        // without tripping WindowExec's all-data-one-task warning
        val one = pmod(col("_b"), lit(1L))
        val wPrev = Window.partitionBy(one)
          .orderBy(col("_b")).rowsBetween(Window.unboundedPreceding, -1)
        val wNext = Window.partitionBy(one)
          .orderBy(col("_b")).rowsBetween(1, Window.unboundedFollowing)
        val carried = summary
          .withColumn("_cp", last(when(col("_lastV").isNotNull,
            struct(col("_lastV"), col("_lastW"))), ignoreNulls = true).over(wPrev))
          .withColumn("_cn", first(when(col("_firstV").isNotNull,
            struct(col("_firstV"), col("_firstW"))), ignoreNulls = true).over(wNext))
          .select(col("_b"),
            col("_cp._lastV").as("_carryPrevV"), col("_cp._lastW").as("_carryPrevW"),
            col("_cn._firstV").as("_carryNextV"), col("_cn._firstW").as("_carryNextW"))
        val withCarry = joined.join(broadcast(carried), Seq("_b"))

        val inPrevV = last(v, ignoreNulls = true).over(back)
        val inPrevW = last(when(v.isNotNull, col(ws)), ignoreNulls = true).over(back)
        val inNextV = first(v, ignoreNulls = true).over(fwd)
        val inNextW = first(when(v.isNotNull, col(ws)), ignoreNulls = true).over(fwd)
        val effPrevV = when(inPrevV.isNotNull, inPrevV).otherwise(col("_carryPrevV"))
        val effPrevW = when(inPrevV.isNotNull, inPrevW).otherwise(col("_carryPrevW"))
        val effNextV = when(inNextV.isNotNull, inNextV).otherwise(col("_carryNextV"))
        val effNextW = when(inNextV.isNotNull, inNextW).otherwise(col("_carryNextW"))

        val filled = mode match {
          case FillPrev => withCarry.withColumn(valueCol, effPrevV)
          case FillNext => withCarry.withColumn(valueCol, effNextV)
          case _ => withCarry.withColumn(valueCol,
            when(v.isNotNull, v)
              .when(effPrevV.isNotNull && effNextV.isNotNull,
                effPrevV + (effNextV - effPrevV) * (col(ws) - effPrevW) / (effNextW - effPrevW))
              .otherwise(lit(null)))
        }
        stripped(filled.drop("_carryPrevV", "_carryPrevW", "_carryNextV", "_carryNextW"))
      case FillNone => stripped(joined) // unreachable
    }
  }

  private def gapFillKeyed(df: DataFrame, ws: String, step: Long, valueCol: String,
      mode: FillMode, keys: Seq[String]): DataFrame = {
    val kcols = keys.map(col)
    val bounds = df.groupBy(kcols: _*).agg(min(col(ws)).as("mn"), max(col(ws)).as("mx"))
    val spine = bounds.select(
      kcols :+ explode(sequence(col("mn"), col("mx"), lit(step))).as(ws): _*)
    val joined = spine.join(df, keys :+ ws, "left")
    fillJoined(joined, ws, valueCol, mode, kcols)
  }

  /** Fill application over an already spine-joined frame, windowed per
    * `partCols`.
    */
  private def fillJoined(joined: DataFrame, ws: String, valueCol: String,
      mode: FillMode, partCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partCols: _*).orderBy(col(ws))
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    mode match {
      case FillNull => joined
      case FillValue(const) => joined.withColumn(valueCol, coalesce(v, lit(const)))
      case FillPrev =>
        joined.withColumn(valueCol, last(v, ignoreNulls = true).over(back))
      case FillNext =>
        joined.withColumn(valueCol, first(v, ignoreNulls = true).over(fwd))
      case FillLinear =>
        val prevV = last(v, ignoreNulls = true).over(back)
        val prevW = last(when(v.isNotNull, col(ws)), ignoreNulls = true).over(back)
        val nextV = first(v, ignoreNulls = true).over(fwd)
        val nextW = first(when(v.isNotNull, col(ws)), ignoreNulls = true).over(fwd)
        joined.withColumn(valueCol,
          when(v.isNotNull, v)
            .when(prevV.isNotNull && nextV.isNotNull,
              prevV + (nextV - prevV) * (col(ws) - prevW) / (nextW - prevW))
            .otherwise(lit(null)))
      case FillNone => joined // unreachable
    }
  }
}
