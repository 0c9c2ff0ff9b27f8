package graft
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
