package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and blocked n-gram Jaccard.
  *
  * Scale design (the whole point at 100 TB):
  *  - NOTHING here is O(n²) over the corpus. Candidate generation is
  *    always a shuffle-join on a blocking key (LSH band, SimHash chunk,
  *    explicit block), so cost is sum over buckets of |bucket|².
  *  - Signatures are computed in one codegen'd pass per document (no
  *    explode of shingles, no UDFs).
  *  - Hot buckets (boilerplate docs) are the classic skew risk — AQE skew
  *    join handles moderate cases; `maxBucket` drops degenerate buckets
  *    (a bucket with 10⁶ identical-signature docs is itself a finding).
  */
object Dedup {

  /** Exact dedup on a normalized key: keeps the smallest id per group. */
  def exact(df: DataFrame, idCol: String, keyCol: Column): DataFrame =
    df.withColumn("_key", keyCol)
      .groupBy(col("_key"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .drop("_key")

  /** Candidate pairs whose MinHash band keys collide; `a_id < b_id`. */
  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      maxBucket: Int = 1000): DataFrame = {
    val rows = numHashes / bands
    // persisted for the same three-reader reason as
    // [[minhashCandidatesFromShingles]]
    val sigs = df
      .select(col(idCol).as("_id"), tokens(col(textCol)).as("_tk"))
      .withColumn("_sh", wordShingles(col("_tk"), shingleN))
      .filter(size(col("_sh")) > 0)
      .withColumn("_sig", minhashSignature(col("_sh"), numHashes))
      .select(col("_id"), posexplode(bandKeys(col("_sig"), bands, rows)))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_key")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // drop degenerate buckets before the self-join (skew guard): bucket
    // sizes via hash AGGREGATE + semi-join on the small survivor set —
    // no per-partition sort, unlike a count-over-window
    val okBuckets = sigs.groupBy(col("_band"), col("_key"))
      .agg(count(lit(1)).as("_bucket_n"))
      .filter(col("_bucket_n") <= maxBucket)
      .select(col("_band"), col("_key"))
    val sized = sigs.join(okBuckets, Seq("_band", "_key"), "left_semi")
    val a = sized.select(col("_band"), col("_key"), col("_id").as("a_id"))
    val b = sized.select(col("_band"), col("_key"), col("_id").as("b_id"))
    a.join(b, Seq("_band", "_key")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
  }

  /** MinHash LSH candidates verified with exact shingle Jaccard.
    *
    * NOTE (lifetime contract): the returned plan reads two frames this
    * call persists (the shingle table and the banded signature table).
    * They stay registered until the caller's `spark.catalog.clearCache()`
    * — which Bench/Verify issue after every query — or session end; a
    * long-lived service embedding this operator must do the same.
    */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String, threshold: Double,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    // shingling is the expensive projection and is needed by candidate
    // generation AND both verify sides — persist so it is computed once
    // (at cluster scale this materializes as a signature table).
    // NEGATIVE RESULT (r13, guide §1.2): repartitioning the raw text to
    // core count before this kernel (to split the single-file scan's one
    // task) measured 2.26–3.05 s vs 1.53–1.68 s without — every
    // downstream stage then schedules 32 tiny tasks against the
    // 32-block cache and the added latency dwarfs the parallel kernel
    // win. Same conclusion as r12's global parallelism floor.
    val sh = df.select(col(idCol).as("_sid"),
        wordShingles(tokens(col(textCol)), shingleN).as("_sh") /* sorted */)
      .filter(size(col("_sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = minhashCandidatesFromShingles(sh, numHashes, bands)
    // exact-Jaccard verify, §8-style "decide small, attach payloads":
    // the PAIR LIST is the small decision table — broadcast it and
    // stream the (persisted) shingle table past it, so the corpus-wide
    // shingle arrays are never the build side of anything (the previous
    // shape broadcast the FULL shingle table twice, once per pair side).
    // Candidate generation executes exactly once, inside the first
    // broadcast. |cands| is LSH-bounded (maxBucket caps bucket fan-out);
    // a corpus whose candidate pairs outgrow a broadcast has outgrown
    // pairwise verify itself and needs the maxBucket guard tightened.
    val withA = sh.select(col("_sid").as("a_id"), col("_sh").as("_sha"))
      .join(broadcast(cands), Seq("a_id"))
    sh.select(col("_sid").as("b_id"), col("_sh").as("_shb"))
      .join(broadcast(withA), Seq("b_id"))
      .withColumn("jacc", jaccardSorted(col("_sha"), col("_shb")))
      .filter(col("jacc") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jacc"), 6).as("jacc"))
  }

  /** Candidate pairs from a pre-shingled (_sid, _sh) frame. */
  private def minhashCandidatesFromShingles(
      sh: DataFrame, numHashes: Int, bands: Int,
      maxBucket: Int = 1000): DataFrame = {
    val rows = numHashes / bands
    // the banded signature is read THREE times downstream (bucket-size
    // aggregate + both self-join sides); without a persist the 64-hash
    // MinHash kernel re-runs over every shingle set per read — the
    // signature pass dominated dd2's profile (3× ≈ +1s at sf0.1). The
    // persisted frame is (id, band, key): bands× the corpus row count,
    // bytes-per-row tiny — at cluster scale this is the signature table
    // a real pipeline would materialize anyway.
    val sigs = sh
      .withColumn("_sig", minhashSignature(col("_sh"), numHashes))
      .select(col("_sid").as("_id"), posexplode(bandKeys(col("_sig"), bands, rows)))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_key")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize now (one pass also fills the upstream shingle cache):
    // the downstream plan launches its broadcast builds CONCURRENTLY, and
    // racing readers of a cold cache each recompute the shingle+signature
    // pass — profiled as 4 parallel ~0.5s jobs doing identical work.
    // Plan-capture tools (PlanDump) set `graft.plan.only` so DataFrame
    // CONSTRUCTION stays execution-free for them.
    if (!sys.props.contains("graft.plan.only")) sigs.count()
    // degenerate-bucket guard (skew, guide §2.5) as a count-over-window
    // ON THE SELF-JOIN'S OWN KEY: the window's hashpartitioning(_band,
    // _key) exchange is exactly the partitioning the band self-join
    // needs, so both join inputs read ONE reused exchange — the previous
    // bucket-size AGGREGATE + broadcast-semi-join spent a second pass
    // over sigs plus a broadcast build to produce the same survivor set
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_band"), col("_key"))
    val sized = sigs.withColumn("_bucket_n", count(lit(1)).over(w))
      .filter(col("_bucket_n") <= maxBucket)
    val a = sized.select(col("_band"), col("_key"), col("_id").as("a_id"))
    val b = sized.select(col("_band"), col("_key"), col("_id").as("b_id"))
    a.join(b, Seq("_band", "_key")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
  }

  /** SimHash near-dup pairs: 64-bit signature, LSH over `maxHamming + 1`
    * equal chunks (pigeonhole: a pair within `maxHamming` bit flips must
    * share at least one exact chunk), verified with exact hamming
    * distance. Fewer/wider chunks = exponentially fewer random bucket
    * collisions — with 8-bit chunks every corpus ≥ a few thousand docs
    * collides on every key (2^8 keys), which goes quadratic at scale; a
    * maxHamming of 3 gets 16-bit chunks (2^16 keys).
    */
  /** `portable = true` switches the signature to [[simhashBitsMd5]]
    * (md5-derived bits a DuckDB oracle re-derives exactly); the default
    * xxhash64 signature is faster but engine-local.
    */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3,
      maxBucket: Int = 1000, portable: Boolean = false): DataFrame = {
    require(maxHamming <= 7, "chunking supports maxHamming <= 7")
    val nChunks = maxHamming + 1
    val chunkBits = 64 / nChunks // last (64 mod nChunks) bits join no chunk
    val bitsOf =
      if (portable) simhashBitsMd5(tokens(col(textCol)))
      else simhashBits(tokens(col(textCol)))
    val sigs = df
      .select(col(idCol).as("_id"), bitsOf.as("_bits"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // chunk key = 64-bit hash of the bit slice (not the "0101…" string):
    // narrower exchange/join keys; collisions only add candidates, and
    // every pair is verified by exact hamming below
    val chunked = sigs.select(col("_id"), col("_bits"),
        posexplode(transform(sequence(lit(0), lit(nChunks - 1)),
          c => xxhash64(slice(col("_bits"), c * chunkBits + 1, lit(chunkBits))))))
      .withColumnRenamed("pos", "_chunk").withColumnRenamed("col", "_key")
    val okBuckets = chunked.groupBy(col("_chunk"), col("_key"))
      .agg(count(lit(1)).as("_bucket_n"))
      .filter(col("_bucket_n") <= maxBucket)
      .select(col("_chunk"), col("_key"))
    val sized = chunked.join(okBuckets, Seq("_chunk", "_key"), "left_semi")
    // dedup candidate PAIRS first (ids only — the bit arrays stay out of
    // the band join/shuffle), then verify each pair's hamming once
    val a = sized.select(col("_chunk"), col("_key"), col("_id").as("a_id"))
    val b = sized.select(col("_chunk"), col("_key"), col("_id").as("b_id"))
    val cands = a.join(b, Seq("_chunk", "_key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    cands
      .join(sigs.select(col("_id").as("a_id"), col("_bits").as("_ba")), Seq("a_id"))
      .join(sigs.select(col("_id").as("b_id"), col("_bits").as("_bb")), Seq("b_id"))
      .select(col("a_id"), col("b_id"), hammingBits(col("_ba"), col("_bb")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Jaccard histogram over all pairs within each block, via a posting
    * -list self-join: explode shingles → join on (block, shingle) → the
    * per-pair match count IS the intersection size. Shingle ARRAYS never
    * cross the shuffle (only (block, shingle, id) rows), which is what
    * makes this formulation win at scale; pairs sharing no shingle are
    * accounted into the 0-bucket arithmetically (n·(n−1)/2 per block minus
    * observed pairs).
    */
  def blockedJaccardHistogram(
      df: DataFrame, idCol: String, textCol: String, blockCols: Seq[Column],
      shingleN: Int = 2, buckets: Int = 10): DataFrame = {
    val base = df.select(
        struct(blockCols: _*).as("_block"),
        col(idCol).as("_id"),
        wordShingles(tokens(col(textCol)), shingleN).as("_sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = base.select(col("_block"), col("_id"), size(col("_sh")).as("_sz"))
    val posting = base.select(col("_block"), col("_id"), explode(col("_sh")).as("_g"))
    val inter = posting.as("x").join(posting.as("y"),
        col("x._block") === col("y._block") && col("x._g") === col("y._g") &&
          col("x._id") < col("y._id"))
      .groupBy(col("x._block").as("_block"), col("x._id").as("a_id"), col("y._id").as("b_id"))
      .agg(count(lit(1)).as("_inter"))
    val scored = inter
      .join(sizes.select(col("_block"), col("_id").as("a_id"), col("_sz").as("_sa")),
        Seq("_block", "a_id"))
      .join(sizes.select(col("_block"), col("_id").as("b_id"), col("_sz").as("_sb")),
        Seq("_block", "b_id"))
      .withColumn("jacc",
        col("_inter").cast("double") / (col("_sa") + col("_sb") - col("_inter")))
    val nonzeroHist = scored
      .groupBy(floor(col("jacc") * buckets).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
    // pairs with empty intersection → bucket 0
    val totalPairs = sizes.groupBy(col("_block")).agg(count(lit(1)).as("_n"))
      .agg(sum(col("_n") * (col("_n") - 1) / 2).as("_total")).select(col("_total"))
    val nonzeroPairs = scored.agg(count(lit(1)).as("_nz")).select(col("_nz"))
    val zeroRow = totalPairs.crossJoin(nonzeroPairs)
      .select(lit(0L).as("bucket"), (col("_total") - col("_nz")).cast("long").as("n_pairs"))
      .filter(col("n_pairs") > 0)
    nonzeroHist.union(zeroRow)
      .groupBy(col("bucket")).agg(sum(col("n_pairs")).cast("long").as("n_pairs"))
  }

  /** Blocked exact n-gram Jaccard: all pairs WITHIN a blocking key. */
  def blockedJaccard(
      df: DataFrame, idCol: String, textCol: String, blockCols: Seq[Column],
      shingleN: Int = 2): DataFrame = {
    val base = df.select(
      struct(blockCols: _*).as("_block"),
      col(idCol).as("_id"),
      wordShingles(tokens(col(textCol)), shingleN).as("_sh") /* sorted */)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = base.select(col("_block"), col("_id").as("a_id"), col("_sh").as("_sha"))
    val b = base.select(col("_block"), col("_id").as("b_id"), col("_sh").as("_shb"))
    a.join(b, Seq("_block")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), jaccardSorted(col("_sha"), col("_shb")).as("jacc"))
  }
}
