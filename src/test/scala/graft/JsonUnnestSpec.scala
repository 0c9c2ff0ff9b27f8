package graft

import graft.operators.JsonUnnest
import graft.operators.JsonUnnest.Entry
import org.scalatest.funsuite.AnyFunSuite

/** Kernel cases mirroring the reference's bytejson unnest semantics
  * (`bytejson.go:1273-1361`): container expansion, scalar no-rows,
  * outer fallback, wildcard multi-target paths, recursive mode.
  */
class JsonUnnestSpec extends AnyFunSuite {

  private def u(doc: String, path: String, outer: Boolean = false,
      recursive: Boolean = false): Seq[Entry] =
    JsonUnnest.unnestSeq(doc, path, outer, recursive)

  test("array unnest: index set, key null, element paths") {
    val rows = u("""{"a": [10, "x", {"b":1}]}""", "$.a")
    assert(rows == Seq(
      Entry(0, null, "$.a[0]", "10", """[10,"x",{"b":1}]"""),
      Entry(1, null, "$.a[1]", "\"x\"", """[10,"x",{"b":1}]"""),
      Entry(2, null, "$.a[2]", """{"b":1}""", """[10,"x",{"b":1}]""")))
  }

  test("object unnest: key set, index null") {
    val rows = u("""{"k1": 1, "k2": {"n": 2}}""", "$")
    assert(rows == Seq(
      Entry(null, "k1", "$.k1", "1", """{"k1":1,"k2":{"n":2}}"""),
      Entry(null, "k2", "$.k2", """{"n":2}""", """{"k1":1,"k2":{"n":2}}""")))
  }

  test("scalar at path yields no rows; outer emits path+this only") {
    assert(u("""{"a": 5}""", "$.a").isEmpty)
    assert(u("""{"a": 5}""", "$.a", outer = true) ==
      Seq(Entry(null, null, "$.a", null, "5")))
    // missing path: no targets, even outer adds nothing
    assert(u("""{"a": 5}""", "$.zz", outer = true).isEmpty)
  }

  test("wildcard paths expand to multiple targets") {
    val rows = u("""{"a": [{"t": [1]}, {"t": [2, 3]}]}""", "$.a[*].t")
    assert(rows == Seq(
      Entry(0, null, "$.a[0].t[0]", "1", "[1]"),
      Entry(0, null, "$.a[1].t[0]", "2", "[2,3]"),
      Entry(1, null, "$.a[1].t[1]", "3", "[2,3]")))
    val keys = u("""{"x": {"i": [1]}, "y": {"i": [2]}}""", "$.*.i")
    assert(keys.map(_.path) == Seq("$.x.i[0]", "$.y.i[0]"))
  }

  test("recursive descends into nested containers") {
    val rows = u("""{"a": {"b": [7]}}""", "$", recursive = true)
    assert(rows == Seq(
      Entry(null, "a", "$.a", """{"b":[7]}""", """{"a":{"b":[7]}}"""),
      Entry(null, "b", "$.a.b", "[7]", """{"b":[7]}"""),
      Entry(0, null, "$.a.b[0]", "7", "[7]")))
  }

  test("invalid doc or path yields no rows") {
    assert(u("not json", "$").isEmpty)
    assert(u("""{"a":1}""", "nope").isEmpty)
    assert(u(null, "$").isEmpty)
  }

  test("SQL surface: explode(unnest_json(...)) works") {
    val spark = SparkTestSession.spark
    val rows = spark.sql(
      """select u.* from (select explode(unnest_json('{"a":[5,6]}', '$.a', false)) as u)""")
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(0) == 0 && rows(0).getString(3) == "5")
  }
}
