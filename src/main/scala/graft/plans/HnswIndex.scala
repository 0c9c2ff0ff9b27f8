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
      graphs: DataFrame,
      dir: String)

  private val registry = scala.collection.concurrent.TrieMap.empty[String, Index]
  private val built = scala.collection.concurrent.TrieMap.empty[String, Index]

  def indexes: Seq[Index] = registry.values.toSeq
  def drop(name: String): Unit =
    registry.remove(name).foreach { idx =>
      built.filterInPlace((_, v) => v.name != name)
      probeCache.filterInPlace((k, _) => k._1 != name)
      IndexStore.delete(idx.graphs.sparkSession, idx.dir)
    }
  def clear(): Unit = registry.keys.toSeq.foreach(drop)

  /** Build the sharded graphs ONCE per corpus, materialized to parquet
    * in [[IndexStore]] (≙ the reference writing usearch model parts into
    * index tables at CREATE INDEX time), and register for [[HnswAnnRule]].
    * Re-registers on every call so drop()+rebuild re-arms the rule; all
    * build/probe params are in the cache key.
    */
  def forCorpus(key: String, df: DataFrame, idCol: String, vecCol: String,
      m: Int = 16, efConstruction: Int = 100, efSearch: Int = 64): Index = {
    val idx = built.getOrElseUpdate(s"$key#$m#$efConstruction#$efSearch", {
      val spark = df.sparkSession
      val dir = IndexStore.path(spark, "hnsw", s"$key-$m-$efConstruction")
      // NULL vectors are absent from the index; match plan stays unfiltered
      Hnsw.buildShardedGraphs(df.filter(col(vecCol).isNotNull),
          idCol, vecCol, m, efConstruction)
        .write.mode("overwrite").parquet(dir)
      val graphs = spark.read.parquet(dir)
      Index(key, df.queryExecution.analyzed.canonicalized,
        idCol, vecCol, efSearch, graphs, dir)
    })
    registry.put(key, idx)
    idx
  }

  /** Per-(index, query, k) cached lazy candidate plan — the analyzer may
    * apply [[HnswAnnRule]] on every analysis of a matching plan.
    */
  private val probeCache =
    scala.collection.concurrent.TrieMap.empty[(String, Seq[Double], Int), DataFrame]

  def probe(idx: Index, q: Array[Double], k: Int): DataFrame =
    probeCache.getOrElseUpdate((idx.name, q.toSeq, k),
      Hnsw.searchShards(idx.graphs, q.map(_.toFloat), k, idx.efSearch)
        .select(col("neighbor_id")))
}
