package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every declared query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * - Queries run in sorted name order after a warmup execution, so JVM /
  *   codegen warmup is not charged to whichever query runs first.
  * - Results are written to the `noop` sink: full evaluation of every
  *   output column (a bare `count()` lets Catalyst prune the projection
  *   and under-reports work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]").getOrCreate()
    GraftSession.init(spark)
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String): Either[String, Double] =
      try {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable => Left(e.getMessage) }
      finally spark.catalog.clearCache() // per-query persisted frames

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warmup: absorb JVM/codegen/parquet-footer costs outside the timings
    exec(names.head)

    val results = names.map { n =>
      val r = exec(n)
      r.left.foreach(msg => System.err.println(s"[bench] $n failed: $msg"))
      n -> r.getOrElse(-1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
