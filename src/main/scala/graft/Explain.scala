package graft

/** Dev utility: print `explain("formatted")` for any declared query —
  * `sbt "runMain graft.Explain q9_product_profit dd2_minhash_lsh"`.
  * Used each round to confirm plans stay scale-shaped (pruned scans,
  * partial aggregation below shuffles, broadcasts on small sides).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]").getOrCreate()
    GraftSession.init(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (n <- args) {
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
