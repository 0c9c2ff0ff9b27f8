package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Re-aggregatable sketch aggregates — the reference's
  * `bitmap_construct_agg`/`bitmap_or_agg`/`bitmap_count`
  * (`pkg/sql/colexec/aggexec/`) and `hll_add`/`hll_merge`/
  * `hll_cardinality` (mergeable HLL sketches, unlike
  * `approx_count_distinct` which cannot be re-merged at SQL level).
  *
  * Implemented as typed `Aggregator`s with byte-array buffers (no
  * external sketch libraries): bitmap = java.util.BitSet words, HLL =
  * dense 2^p register array. Both are associative + commutative, so Spark
  * runs them as partial (map-side) aggregates with a tiny merge shuffle —
  * the property that makes them work at 100 TB: per-partition sketches,
  * merged, never re-scanning.
  */
object Sketches {

  // ------------------------------------------------------------- bitmap
  /** Build an exact membership bitmap from non-negative Long values
    * (NULLs are skipped, not hashed as zero).
    */
  object BitmapConstructAgg extends Aggregator[java.lang.Long, java.util.BitSet, Array[Byte]] {
    def zero: java.util.BitSet = new java.util.BitSet()
    def reduce(b: java.util.BitSet, v0: java.lang.Long): java.util.BitSet = {
      if (v0 != null) {
        val v = v0.longValue
        if (v >= 0 && v < Int.MaxValue) b.set(v.toInt)
      }
      b
    }
    def merge(a: java.util.BitSet, b: java.util.BitSet): java.util.BitSet = {
      a.or(b); a
    }
    def finish(b: java.util.BitSet): Array[Byte] = b.toByteArray
    def bufferEncoder: Encoder[java.util.BitSet] = Encoders.javaSerialization
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** OR-merge pre-built bitmaps (re-aggregation path). */
  object BitmapOrAgg extends Aggregator[Array[Byte], java.util.BitSet, Array[Byte]] {
    def zero: java.util.BitSet = new java.util.BitSet()
    def reduce(b: java.util.BitSet, v: Array[Byte]): java.util.BitSet = {
      if (v != null) b.or(java.util.BitSet.valueOf(v)); b
    }
    def merge(a: java.util.BitSet, b: java.util.BitSet): java.util.BitSet = {
      a.or(b); a
    }
    def finish(b: java.util.BitSet): Array[Byte] = b.toByteArray
    def bufferEncoder: Encoder[java.util.BitSet] = Encoders.javaSerialization
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def bitmapCount(bytes: Array[Byte]): Long =
    if (bytes == null) 0L else java.util.BitSet.valueOf(bytes).cardinality().toLong

  // ---------------------------------------------------------------- HLL
  val HllP = 14
  val HllM: Int = 1 << HllP // 16384 registers

  private def alpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m)

  /** 64-bit avalanche hash (splitmix64) — deterministic, engine-local. */
  private def hash64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def addToRegisters(reg: Array[Byte], v: Long): Unit = {
    val h = hash64(v)
    val idx = (h >>> (64 - HllP)).toInt
    val w = h << HllP
    val rho = (if (w == 0) 64 - HllP else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rho > reg(idx)) reg(idx) = rho.toByte
  }

  def hllEstimate(reg: Array[Byte]): Long = {
    if (reg == null || reg.isEmpty) return 0L
    val m = reg.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.pow(2.0, -reg(i))
      if (reg(i) == 0) zeros += 1
      i += 1
    }
    var est = alpha(m) * m * m / sum
    if (est <= 2.5 * m && zeros > 0) est = m * math.log(m.toDouble / zeros)
    math.round(est)
  }

  /** hll_add: values → dense HLL sketch (binary, mergeable). NULLs are
    * skipped — hashing them as zero inflated small cardinalities
    * (func_hll.result).
    */
  object HllAddAgg extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](HllM)
    def reduce(b: Array[Byte], v: java.lang.Long): Array[Byte] = {
      if (v != null) addToRegisters(b, v.longValue)
      b
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    def finish(b: Array[Byte]): Array[Byte] = b
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** hll_merge: sketches → merged sketch. */
  object HllMergeAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](HllM)
    def reduce(b: Array[Byte], v: Array[Byte]): Array[Byte] = {
      if (v != null) { var i = 0; while (i < b.length) { if (v(i) > b(i)) b(i) = v(i); i += 1 } }
      b
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    def finish(b: Array[Byte]): Array[Byte] = b
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ------------------------------------------------------- Column API
  def bitmap_construct_agg(c: Column): Column =
    udaf(BitmapConstructAgg, Encoders.LONG).apply(c)
  def bitmap_or_agg(c: Column): Column = udaf(BitmapOrAgg).apply(c)
  def hll_add(c: Column): Column = udaf(HllAddAgg, Encoders.LONG).apply(c)
  def hll_merge(c: Column): Column = udaf(HllMergeAgg).apply(c)

  /** Register scalar + aggregate SQL names. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("bitmap_construct_agg", udaf(BitmapConstructAgg, Encoders.LONG))
    spark.udf.register("bitmap_or_agg", udaf(BitmapOrAgg))
    spark.udf.register("hll_add", udaf(HllAddAgg, Encoders.LONG))
    spark.udf.register("hll_merge", udaf(HllMergeAgg))
    // reference registry spells the aggregate forms with _agg
    spark.udf.register("hll_add_agg", udaf(HllAddAgg, Encoders.LONG))
    spark.udf.register("hll_merge_agg", udaf(HllMergeAgg))
    spark.udf.register("bitmap_count", (b: Array[Byte]) => bitmapCount(b))
    spark.udf.register("hll_cardinality", (b: Array[Byte]) =>
      if (b == null) null
      else java.lang.Long.valueOf(hllEstimate(b)))
    // the reference's buckets are 0-BASED val>>15 / val&32767
    // (func_bitmap2.result: 65536 → bucket 2); Spark 4's builtins of the
    // same names are 1-based, so explicit registrations shadow them
    spark.udf.register("bitmap_bucket_number", (v: java.lang.Long) =>
      if (v == null) null else java.lang.Long.valueOf(v.longValue >> 15))
    spark.udf.register("bitmap_bit_position", (v: java.lang.Long) =>
      if (v == null) null else java.lang.Long.valueOf(v.longValue & 32767L))
  }
}
