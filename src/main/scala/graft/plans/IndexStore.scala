package graft.plans

import org.apache.spark.sql.SparkSession

/** Shared location + lifecycle for materialized index tables (IVF cells,
  * PQ codes, HNSW graph shards).
  *
  * The location is `graft.index.dir` if set, else a `_graft_indexes`
  * subdirectory of the Spark SQL warehouse — i.e. a path on the SHARED
  * filesystem, so executor-written part files and the driver read-back
  * see the same store on a real cluster (a `createTempDirectory` on the
  * driver's local disk would only work in local mode). Dropping an index
  * deletes its directory.
  */
object IndexStore {

  /** Root directory for materialized indexes (created on demand). */
  def root(spark: SparkSession): String =
    spark.conf.getOption("graft.index.dir").getOrElse {
      spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") + "/_graft_indexes"
    }

  /** Stable per-index path under the root; safe for any FS the session
    * can reach (the key is sanitized into a path segment).
    */
  def path(spark: SparkSession, kind: String, key: String): String =
    root(spark) + "/" + kind + "/" + key.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Recursively delete an index directory (any Hadoop-visible FS). */
  def delete(spark: SparkSession, dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}
