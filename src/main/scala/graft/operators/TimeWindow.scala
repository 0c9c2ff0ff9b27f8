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

  /** Tumbling window aggregate: `_wstart`/`_wend` ≙ reference column names. */
  def tumbling(df: DataFrame, ts: Column, width: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys :+ window(ts, width): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("_wstart", col("window.start"))
      .withColumn("_wend", col("window.end"))
      .drop("window")

  /** Sliding window aggregate (width/slide), e.g. 1 day every 12 hours. */
  def sliding(df: DataFrame, ts: Column, width: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys :+ window(ts, width, slide): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("_wstart", col("window.start"))
      .withColumn("_wend", col("window.end"))
      .drop("window")

  /** Gap fill over a numeric window-start column (epoch seconds or any
    * regular numeric spine with step `step`). Missing (key, ws) slots are
    * materialized via an exploded `sequence(min, max, step)` per key and
    * `valueCol` is filled per `mode`.
    */
  def gapFill(df: DataFrame, ws: String, step: Long, valueCol: String,
      mode: FillMode, keys: Seq[String] = Nil): DataFrame = {
    if (mode == FillNone) return df
    val kcols = keys.map(col)
    val bounds =
      if (keys.isEmpty) df.agg(min(col(ws)).as("mn"), max(col(ws)).as("mx"))
      else df.groupBy(kcols: _*).agg(min(col(ws)).as("mn"), max(col(ws)).as("mx"))
    val spine = bounds.select(
      kcols :+ explode(sequence(col("mn"), col("mx"), lit(step))).as(ws): _*)
    val joined = spine.join(df, keys :+ ws, "left")
    val w = Window.partitionBy(kcols: _*).orderBy(col(ws))
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
