package graft

import graft.functions.DecimalGuard
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecimalGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("checked_decimal passes fitting values through at the target type") {
    val df = Seq("123.456", "-0.01").toDF("s")
      .select(DecimalGuard.checked_decimal(col("s"), 10, 2).as("d"))
    assert(df.schema("d").dataType.sql == "DECIMAL(10,2)")
    assert(df.as[java.math.BigDecimal].collect().map(_.toPlainString).toSeq ==
      Seq("123.46", "-0.01"))
    assert(Seq[Option[String]](None).toDF("s")
      .select(DecimalGuard.checked_decimal(col("s"), 10, 2))
      .head.isNullAt(0))
  }

  test("overflow throws the reference's error text instead of going NULL") {
    val e = intercept[Exception] {
      Seq("123456789.0").toDF("s")
        .select(DecimalGuard.checked_decimal(col("s"), 5, 2)).collect()
    }
    def rootMessage(t: Throwable): String =
      if (t.getCause != null) rootMessage(t.getCause)
      else Option(t.getMessage).getOrElse("")
    assert(rootMessage(e).contains("Decimal128 scale overflow"))
    // same via the SQL name
    val e2 = intercept[Exception] {
      spark.sql("SELECT checked_decimal('99999999999', 5, 0)").collect()
    }
    assert(rootMessage(e2).contains("Decimal128 scale overflow"))
  }

  test("precision beyond 38 (the decimal256 regime) is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      DecimalGuard.checked_decimal(lit("1"), 40, 0)
    }
    assert(e.getMessage.contains("internal-only"))
  }

  test("iceberg catalog confs land on the standard public keys") {
    val confs = GraftSession.icebergCatalogConfs("lake", "/tmp/lakehouse", "hadoop")
    assert(confs("spark.sql.catalog.lake") == "org.apache.iceberg.spark.SparkCatalog")
    assert(confs("spark.sql.catalog.lake.type") == "hadoop")
    assert(confs("spark.sql.catalog.lake.warehouse") == "/tmp/lakehouse")
    // runtime-settable: applying to a live session must not throw (the
    // catalog instantiates lazily, only on first reference)
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    assert(spark.conf.get("spark.sql.catalog.lake.warehouse") == "/tmp/lakehouse")
  }
}
