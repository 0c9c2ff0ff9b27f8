package graft.operators

import org.apache.spark.sql.DataFrame

/** Driver-side size guard for operators that `.collect()` + broadcast a
  * query set (HNSW, IVF-PQ): correct only in the query ≪ corpus regime,
  * so an oversized query side fails FAST with a clear error instead of
  * silently OOMing the driver.
  */
object QueryGuard {

  /** Default cap: 100k query rows × a ~64-dim float vector ≈ tens of MB
    * broadcast — comfortably driver-safe; beyond that the caller should
    * partition the query side (e.g. loop batches, or use the index
    * probe paths which keep queries distributed).
    */
  val MaxQueryRows: Long = 100000L

  def check(queries: DataFrame, op: String, max: Long = MaxQueryRows): Unit = {
    val n = queries.limit((max + 1).toInt).count()
    if (n > max)
      throw new IllegalArgumentException(
        s"$op: query side has > $max rows; this operator collects and " +
          s"broadcasts the query set (query << corpus regime). Batch the " +
          s"queries or use a distributed probe path instead.")
  }
}
