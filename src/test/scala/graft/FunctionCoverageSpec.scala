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

  test("Column.startsWith/endsWith stay boolean builtins after init") {
    // Spark 4.1's Column API resolves startsWith/endsWith/contains BY
    // NAME through the function registry: a session UDF registered under
    // the same name silently shadows the builtin at every internal call
    // site (Bm25 prefix joins, serialExtract). Guard the types.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.BooleanType
    val df = spark.range(1).select(
      lit("abc").startsWith(lit("a")).as("sw"),
      lit("abc").endsWith(lit("c")).as("ew"),
      lit("abc").contains(lit("b")).as("ct"))
    assert(df.schema.fields.forall(_.dataType == BooleanType),
      s"shadowed builtin: ${df.schema.simpleString}")
    assert(df.head == org.apache.spark.sql.Row(true, true, true))
    // the MySQL 1/0 conformance spelling lives under mo_-prefixed names
    assert(one("mo_startswith('abc', 'a')") == 1)
    assert(one("mo_endswith('abc', 'b')") == 0)
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

  test("yearweek matches MySQL mode-0 on year-boundary dates") {
    import org.apache.spark.sql.functions._
    import graft.functions.MoFunctions.yearweek
    // Expected values from the reference algorithm
    // (pkg/container/types/date.go calcWeekFromCalendar, WeekYear mode 0):
    // early-January dates before the year's first Sunday belong to the
    // PREVIOUS year's week 52/53.
    val cases = Seq(
      "2027-01-01" -> 202652L, // Fri before first Sunday of 2027
      "2026-01-01" -> 202552L, // Thu
      "2025-01-05" -> 202501L, // first Sunday of 2025
      "2025-01-04" -> 202452L, // Sat before it
      "2023-12-31" -> 202353L, // Sunday starting week 53
      "2024-01-06" -> 202353L, // Sat inside that same week
      "2024-01-07" -> 202401L, // first Sunday of 2024
      "1998-08-15" -> 199832L,
      "2028-01-02" -> 202801L) // Jan 2 is a Sunday
    import spark.implicits._
    val got = cases.map(_._1).toDF("d")
      .select(yearweek(to_date(col("d"))).as("yw"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map(_._2), s"got $got")
  }

  test("serial round-trips fields, preserves order, propagates nulls") {
    import org.apache.spark.sql.functions._
    import graft.functions.MoFunctions.{serial, serialFull, serialExtract}
    import spark.implicits._
    // hostile payloads: separator and escape bytes inside the values
    val df = Seq(
      ("plain", "b"),
      ("with\u0000nul", "with\u0001soh"),
      ("\u0001\u0002", "\u0001\u0003"),
      ("", "empty-left")).toDF("a", "b")
    val rt = df.select(
      serialExtract(serial(Seq(col("a"), col("b"))), 0).as("a2"),
      serialExtract(serial(Seq(col("a"), col("b"))), 1).as("b2"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rt == Seq(("plain", "b"), ("with\u0000nul", "with\u0001soh"),
      ("\u0001\u0002", "\u0001\u0003"), ("", "empty-left")))
    // injectivity on the advisor's collision case: ('ab','c') vs ('a','bc')
    val packed = Seq(("ab", "c"), ("a", "bc")).toDF("a", "b")
      .select(serial(Seq(col("a"), col("b"))).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(packed.distinct.size == 2)
    // field-by-field order: ("a","bc") sorts before ("ab","c") because
    // field 1 "a" < "ab" and the separator sorts below every data byte
    assert(packed(1) < packed(0))
    // null semantics: serial -> NULL, serial_full -> null-tagged field
    val nrow = Seq((Option.empty[String], "x")).toDF("a", "b").select(
      serial(Seq(col("a"), col("b"))).as("s"),
      serialExtract(serialFull(Seq(col("a"), col("b"))), 0).as("f0"),
      serialExtract(serialFull(Seq(col("a"), col("b"))), 1).as("f1")).head
    assert(nrow.isNullAt(0) && nrow.isNullAt(1) && nrow.getString(2) == "x")
  }

  test("json extras: MySQL semantics incl. DuckDB-divergent containment") {
    import graft.functions.JsonExtras._
    // MySQL: a bare scalar is NOT contained in an object's values
    assert(jsonContains("""{"k":5}""", "5").contains(false))
    assert(jsonContains("""{"a":1,"b":2}""", """{"b":2}""").contains(true))
    assert(jsonContains("[1,[2,3],4]", "[3,1]").contains(true))
    assert(jsonContains("[1,2]", "[3]").contains(false))
    assert(jsonContains("5", "5.0").contains(true)) // numeric coercion
    assert(jsonType("[]") == "ARRAY" && jsonType("2.5") == "DOUBLE" &&
      jsonType("null") == "NULL")
    assert(jsonValid("""{"k":1}x""").contains(false)) // trailing junk
    assert(jsonDepth("[]").contains(1))
    assert(jsonDepth("""[1,{"a":[2]}]""").contains(4))
    assert(jsonUnquote("\"a\\nb\"") == "a\nb")
    assert(jsonMergePreserve("""{"a":[1]}""", """{"a":2}""") == """{"a":[1,2]}""")
  }

  test("inet6 and time helpers") {
    import graft.functions.MoFunctions._
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    assert(hex(inet6AtonBytes("::1")) == "0" * 31 + "1")
    assert(hex(inet6AtonBytes("2001:db8::8a2e:370:7334")) ==
      "20010db80000000000008a2e03707334")
    // MO collapses an IPv4-mapped address to its 4 bytes
    // (func_misc_inet6.result)
    assert(hex(inet6AtonBytes("::ffff:192.0.2.128")) == "c0000280")
    assert(hex(inet6AtonBytes("10.0.5.9")) == "0a000509")
    for (bad <- Seq("1::2::3", "12345::", "::g", "1.2.3", "1:2:3:4:5:6:7:8:9"))
      assert(inet6AtonBytes(bad) == null, s"accepted $bad")
    // ntoa is aton's inverse, RFC 5952 compressed
    for (ip <- Seq("::1", "2001:db8::8a2e:370:7334", "fe80::", "1:0:0:2::3"))
      assert(inet6NtoaStr(inet6AtonBytes(ip)) == ip, ip)
    assert(isIpv6Str("::1") && !isIpv6Str("10.0.0.1") && !isIpv6Str("nope"))
    assert(getFormat("DATE", "ISO").contains("%Y-%m-%d"))
    assert(getFormat("TIME", "USA").contains("%h:%i:%s %p"))
    assert(getFormat("DATE", "XXX").isEmpty)
  }

  test("sec_to_time/time_to_sec: >=100h never truncates, negatives are signed whole values") {
    import org.apache.spark.sql.functions._
    import graft.functions.MoFunctions
    import spark.implicits._
    val df = Seq(360001L, -1L, -5400L, 3725L).toDF("s")
    val r = df.select(MoFunctions.secToTime(col("s"))).as[String].collect()
    assert(r.sameElements(Array("100:00:01", "-00:00:01", "-01:30:00", "01:02:05")))
    val t = Seq("100:00:01", "-00:00:01", "-01:30:00", "01:02:05").toDF("t")
    val back = t.select(MoFunctions.timeToSec(col("t"))).as[Long].collect()
    assert(back.sameElements(Array(360001L, -1L, -5400L, 3725L)))
    // the SQL name carries MO's quirks (func_datetime_sec_to_time.result):
    // negative totals are NULL unless an exact hour count, which renders
    // with an unpadded hour; beyond ±838:59:59 is NULL (no clamp)
    val sqlRow = spark.sql(
      "select sec_to_time(360001), sec_to_time(-1), time_to_sec('-01:30:00')," +
        " sec_to_time(-3600), sec_to_time(3020400)").head
    assert(sqlRow.getString(0) == "100:00:01")
    assert(sqlRow.isNullAt(1))
    assert(sqlRow.getLong(2) == -5400L)
    assert(sqlRow.getString(3) == "-1:00:00")
    assert(sqlRow.isNullAt(4))
    // addTime/subTime compose through the signed forms
    val comp = Seq(("00:00:01", "00:00:02")).toDF("a", "b")
      .select(MoFunctions.subTime(col("a"), col("b"))).as[String].head()
    assert(comp == "-00:00:01")
  }

  test("vector kernels raise on dimension mismatch") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorFunctions.innerProduct(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): String = {
      var c: Throwable = t
      val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append(' '); c = c.getCause }
      sb.toString
    }
    assert(msgs(e).contains("dimension mismatch"))
  }
}
