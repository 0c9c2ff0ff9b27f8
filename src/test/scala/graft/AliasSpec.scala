package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference-name alias surface ([[graft.functions.MoAliases]] +
  * json_extract family): every name resolves natively and computes the
  * MySQL-documented value. Numeric assertions go through toString to
  * stay agnostic of int/long/float/double return widths.
  */
class AliasSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def vals(sql: String): IndexedSeq[String] = {
    val r = spark.sql(sql).head
    (0 until r.length).map(i => if (r.isNullAt(i)) null else r.get(i).toString)
  }

  test("string/datetime/predicate aliases compute MySQL semantics") {
    val v = vals(
      """SELECT to_lower('AbC') lo, to_upper('AbC') up, lengthutf8('héllo') l8,
        |  mid('abcdef', 2, 3) md, oct(64) oc, ord('A') od,
        |  strcmp('a', 'b') sc1, strcmp('b', 'b') sc2, strcmp('c', 'b') sc3,
        |  to_base64('ab') b64,
        |  CAST(from_base64(to_base64('ab')) AS STRING) fb64,
        |  findinset('b', 'a,b,c') fis, format(1234567.891, 2) fmt,
        |  empty('') e1, empty('x') e2,
        |  field('b', 'a', 'b', 'c') fld,
        |  reg_match('abc', '^a') rm, not_reg_match('abc', '^b') nrm,
        |  week(date'2024-01-15') wk, microsecond(timestamp'2024-01-15 10:30:00.123456') us,
        |  to_seconds(timestamp'1970-01-01 00:00:01') tsec,
        |  makedate(2024, 32) mkd, from_days(to_days(date'2024-03-01')) fd,
        |  is_null(NULL) inl, is_not_null(1) innl, iff(1, 'y', 'n') ifv,
        |  istrue(NULL) it, isnotfalse(NULL) inf""".stripMargin)
    assert(v(0) == "abc" && v(1) == "ABC")
    assert(v(2) == "5")
    assert(v(3) == "bcd")
    assert(v(4) == "100" && v(5) == "65")
    assert(v(6) == "-1" && v(7) == "0" && v(8) == "1")
    assert(v(9) == "YWI=" && v(10) == "ab")
    assert(v(11) == "2")
    assert(v(12) == "1,234,567.89")
    assert(v(13) == "1" && v(14) == "0")
    assert(v(15) == "2")
    assert(v(16) == "true" && v(17) == "true")
    // MySQL WEEK default mode 0 (Sunday-first): 2024-01-15 is week 2,
    // not ISO weekofyear's 3
    assert(v(18) == "2")
    assert(v(19) == "123456")
    assert(v(20) == "62167219201")
    assert(v(21) == "2024-02-01")
    assert(v(22) == "2024-03-01")
    assert(v(23) == "true" && v(24) == "true")
    assert(v(25) == "y")
    assert(v(26) == "false" && v(27) == "true")
  }

  test("vector and codec aliases resolve to the native kernels") {
    val v = vals(
      """SELECT l1_norm(array(3.0F, -4.0F)) l1, l2_norm(array(3.0F, 4.0F)) l2,
        |  l2_distance_sq(array(0.0F, 0.0F), array(3.0F, 4.0F)) dsq,
        |  round(cosine_distance(array(1.0F, 0.0F), array(1.0F, 0.0F)), 6) cd,
        |  round(element_at(normalize_l2(array(3.0F, 4.0F)), 1), 1) nv1,
        |  subvector(array(1.0F, 2.0F, 3.0F), 1, 2) sv,
        |  summation(array(1.0F, 2.0F, 3.0F)) sm, vector_dims(array(1.0F, 2.0F)) vd,
        |  is_ipv4('10.0.0.1') i4a, is_ipv4('999.0.0.1') i4b,
        |  is_uuid(uuid()) iu,
        |  bin_to_uuid(uuid_to_bin('12345678-1234-5678-1234-567812345678')) uu""".stripMargin)
    assert(v(0) == "7.0" && v(1) == "5.0")
    assert(v(2) == "25.0" && v(3) == "0.0")
    assert(v(4) == "0.6")
    // subvector start is 1-based (SUBSTRING convention, as in the reference)
    assert(v(5).contains("1.0") && v(5).contains("2.0") && !v(5).contains("3.0"))
    assert(v(6) == "6.0" && v(7) == "2")
    assert(v(8) == "true" && v(9) == "false" && v(10) == "true")
    assert(v(11) == "12345678-1234-5678-1234-567812345678")
  }

  test("json_extract family: quoted JSON text vs unquoted scalar vs double") {
    val v = vals(
      """SELECT json_extract('{"a": {"s": "x", "n": 2.5}}', '$.a.s') je,
        |  json_extract('{"a": [1, 2]}', '$.a') jarr,
        |  json_extract('{"a": 1}', '$.nope') jmiss,
        |  json_extract_string('{"a": {"s": "x"}}', '$.a.s') jes,
        |  json_extract_float64('{"a": {"n": 2.5}}', '$.a.n') jef,
        |  serial_extract(serial_full('k', 7), 1) sx,
        |  group_concat(c, '|') gc
        |FROM (SELECT explode(array('x')) AS c)""".stripMargin)
    // MySQL group_concat(e1, e2): the args CONCATENATE per row (a
    // separator is only ever the SEPARATOR keyword) — so 'x','|' → "x|"
    assert(v(0) == "\"x\"")
    assert(v(1) == "[1,2]")
    assert(v(2) == null)
    assert(v(3) == "x")
    assert(v(4) == "2.5")
    assert(v(5) == "7")
    assert(v(6) == "x|")
    // these resolve natively — no ScalaUDF (week/conv/str_to_date are
    // deliberate UDF exceptions: MySQL calc_week / base-wrap / lenient
    // parse semantics aren't expressible as combinators)
    val plan = spark.sql(
      "SELECT strcmp('a','b'), to_seconds(timestamp'1970-01-01 00:00:01'), " +
        "json_extract('{}', '$.a'), l1_norm(array(1.0F))")
    assert(!plan.queryExecution.analyzed.toString.contains("UDF"))
  }
}
