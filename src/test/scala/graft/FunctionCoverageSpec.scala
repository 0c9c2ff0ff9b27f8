package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spot checks that the MySQL-name surface SURVEY §2.13 maps to Spark
  * built-ins actually resolves and behaves (the oracle queries cover the
  * custom gaps; these cover the built-in claims with no DuckDB
  * equivalent to oracle against).
  */
class FunctionCoverageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def one(sql: String): Any = spark.sql(s"SELECT $sql").head.get(0)

  test("string builtins: soundex, crc32, encode/decode, conv, format_number") {
    assert(one("soundex('Robert')") == "R163")
    assert(one("crc32('spark')") != null)
    assert(one("decode(encode('héllo', 'UTF-8'), 'UTF-8')") == "héllo")
    assert(one("conv('ff', 16, 10)") == "255")
    assert(one("format_number(1234567.891, 2)") == "1,234,567.89")
    assert(one("ascii('A')") == 65)
    assert(one("instr('hello', 'll')") == 3)
    assert(one("locate('l', 'hello', 4)") == 4)
    assert(one("split_part('a,b,c', ',', 2)") == "b")
  }

  test("crypto builtins: aes round trip, sha1, md5") {
    assert(one("CAST(aes_decrypt(aes_encrypt('secret', '0000111122223333'), " +
      "'0000111122223333') AS STRING)") == "secret")
    assert(one("sha1('x')").toString.length == 40)
    assert(one("md5('x')").toString.length == 32)
  }

  test("datetime builtins: str_to_date analog, makedate, add_months, next_day") {
    val ts = graft.functions.MoFunctions.mysqlFormatToJava("%Y-%m-%d %H:%i:%s")
    assert(ts == "yyyy-MM-dd HH:mm:ss")
    assert(one("to_timestamp('1997/06/15 10:30', 'yyyy/MM/dd HH:mm')") != null)
    assert(one("make_date(1997, 6, 15)").toString == "1997-06-15")
    assert(one("add_months(DATE'1997-01-31', 1)").toString == "1997-02-28")
    assert(one("datediff(DATE'1997-02-01', DATE'1997-01-01')") == 31)
  }

  test("math builtins: cot, sinh, bin, hex, bround") {
    assert(one("round(cot(1.0), 4)") == 0.6421)
    assert(one("sinh(0.0)") == 0.0)
    assert(one("bin(5)") == "101")
    assert(one("hex(255)") == "FF")
    assert(one("bround(2.5, 0)").toString.toDouble == 2.0) // banker's rounding
  }

  test("conditional builtins: if, nullif, nvl, coalesce, isnotnull") {
    assert(one("if(1 < 2, 'y', 'n')") == "y")
    assert(one("nullif(3, 3)") == null)
    assert(one("nvl(NULL, 7)") == 7)
    assert(one("coalesce(NULL, NULL, 9)") == 9)
  }
}
