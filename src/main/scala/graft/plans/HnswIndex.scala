package graft.plans

import graft.operators.Hnsw
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col

/** HNSW ANN index registry — the analog of the reference's HNSW index
  * tables (`pkg/vectorindex/hnsw/`, planner rewrite
  * `apply_indices_hnsw.go`): per-partition graphs serialized into a
  * materialized parquet table, probed shard-parallel at query time.
  */
object HnswIndex {

  final case class Index(
      name: String,
      corpusPlan: LogicalPlan,
      idCol: String,
      vecCol: String,
      efSearch: Int,
      graphs: DataFrame)

  private val registry = scala.collection.concurrent.TrieMap.empty[String, Index]
  private val built = scala.collection.concurrent.TrieMap.empty[String, Index]

  def indexes: Seq[Index] = registry.values.toSeq
  def drop(name: String): Unit = registry.remove(name)
  def clear(): Unit = registry.clear()

  /** Build the sharded graphs ONCE per corpus, materialized to parquet
    * (≙ the reference writing usearch model parts into index tables at
    * CREATE INDEX time), and register for [[HnswAnnRule]].
    */
  def forCorpus(key: String, df: DataFrame, idCol: String, vecCol: String,
      m: Int = 16, efConstruction: Int = 100, efSearch: Int = 64): Index =
    built.getOrElseUpdate(s"$key#$m#$efConstruction", {
      val spark = df.sparkSession
      val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-index").toString
      Hnsw.buildShardedGraphs(df, idCol, vecCol, m, efConstruction)
        .write.mode("overwrite").parquet(dir)
      val graphs = spark.read.parquet(dir)
      val idx = Index(key, df.queryExecution.analyzed.canonicalized,
        idCol, vecCol, efSearch, graphs)
      registry.put(key, idx)
      idx
    })

  /** Lazy top-k candidate ids for a literal query vector. */
  def probe(idx: Index, q: Array[Double], k: Int): DataFrame =
    Hnsw.searchShards(idx.graphs, q.map(_.toFloat), k, idx.efSearch)
      .select(col("neighbor_id"))
}
