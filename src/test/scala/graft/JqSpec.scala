package graft

import graft.functions.Jq
import org.scalatest.funsuite.AnyFunSuite

/** Conformance cases ported from the reference's jq test corpus
  * (`test/distributed/cases/function/func_jq.sql` / `.result`).
  * The reference embeds gojq; we implement the documented subset, so
  * gojq-only forms (`def`, `reduce`, `foreach`, `as`, `&`) must raise
  * for `jq` and yield NULL for `try_jq` — the same observable contract
  * as the reference's own error rows.
  */
class JqSpec extends AnyFunSuite {

  private def jq(doc: String, prog: String): String = Jq.jqEval(doc, prog)
  private def tryJq(doc: String, prog: String): String = Jq.tryJqEval(doc, prog)
  private def jqFails(doc: String, prog: String): Unit = {
    intercept[Jq.JqError](Jq.jqEval(doc, prog)); ()
  }

  test("field access and identity") {
    assert(jq("""{"foo": 128}""", ".foo") == "128")
    assert(jq("""{"a": {"b": 42}}""", ".a.b") == "42")
    assert(tryJq("""{"foo": 128}""", ".foo") == "128")
    assert(jq("""{"foo::bar": "zoo"}""", """.["foo::bar"]""") == "\"zoo\"")
  }

  test("null arguments propagate as SQL NULL") {
    assert(jq(null, ".foo") == null)
    assert(jq("""{"a":1}""", null) == null)
    assert(tryJq(null, ".foo") == null)
  }

  test("invalid document JSON: jq raises, try_jq nulls") {
    jqFails("""{"foo": {bar: []} }""", ".")
    assert(tryJq("""{"foo": {bar: []} }""", ".") == null)
    jqFails("", ".")
    assert(tryJq("", ".") == null)
  }

  test("empty program: missing query") {
    jqFails("1", "")
    assert(tryJq("1", "") == null)
  }

  test("slices") {
    assert(jq("""["a", "b", "c", "d", "e"]""", ".[2:4]") == """["c","d"]""")
    assert(jq("""["a", "b", "c", "d", "e"]""", ".[:3]") == """["a","b","c"]""")
    assert(jq("""["a", "b", "c", "d", "e"]""", ".[-2:]") == """["d","e"]""")
  }

  test("iteration concatenates outputs with no separator") {
    assert(jq("""["a", "b", "c"]""", ".[]") == "\"a\"\"b\"\"c\"")
    assert(jq("[]", ".[]") == "")
    assert(jq("""{"foo": ["a", "b"]}""", ".foo[]") == "\"a\"\"b\"")
    assert(jq("""{"a":1, "b":2}""", ".[]") == "12")
    assert(jq("""[{"id":1},{"id":2},{"id":3}]""", ".[] | .id") == "123")
  }

  test("comma and index streams") {
    assert(jq("""{"a":1, "b":2}""", ".a, .b") == "12")
    assert(jq("""["a", "b", "c", "d", "e"]""", ".[4,2]") == "\"e\"\"c\"")
    assert(jq("""{"a": 1, "b": [2, 3]}""", "[.a, .b[]]") == "[1,2,3]")
    assert(jq("[1, 2, 3]", "[ .[] | . * 2]") == "[2,4,6]")
  }

  test("object construction: literal, shorthand, computed keys") {
    assert(jq("""{"a":1, "b":2}""", "{aa: .a, bb: .b}") == """{"aa":1,"bb":2}""")
    assert(jq("""{"id": "sample", "10": {"b": 42}}""", """{(.id): .["10"].b}""")
      == """{"sample":42}""")
    assert(jq("""{"user":"stedolan","titles":["JQ Primer", "More JQ"]}""",
      "{user, title: .titles[]}")
      == """{"title":"JQ Primer","user":"stedolan"}{"title":"More JQ","user":"stedolan"}""")
    assert(jq("1", "{}") == "{}")
    assert(jq("""{"a": 5}""", """{"k": .a}""") == """{"k":5}""")
  }

  test("recursive descent raises on non-object under .a like the reference") {
    jqFails("""[[{"a":1}]]""", ".. | .a")
    assert(jq("""[[{"a":1}]]""", "[.. | .a?]") == "[1]")
  }

  test("arithmetic with jq null/object semantics") {
    assert(jq("""{"a":1, "b":2}""", ".a + .b") == "3")
    assert(jq("""{"a":1, "b":2}""", ".a + null") == "1")
    assert(jq("""{"a":1, "b":2}""", ". + {c: 3}") == """{"a":1,"b":2,"c":3}""")
    assert(jq("""{"a":1, "b":2}""", ". + {a: 3, c: 3}") == """{"a":3,"b":2,"c":3}""")
  }

  test("update assignment") {
    assert(jq("""{"a":1, "b":2}""", ".a += 1 | .b *= 2") == """{"a":2,"b":4}""")
  }

  test("if/elif/else") {
    val prog = """if . == 0 then "zero" elif . == 1 then "one" else "many" end"""
    assert(jq("0", prog) == "\"zero\"")
    assert(jq("1", prog) == "\"one\"")
    assert(jq("2", prog) == "\"many\"")
  }

  test("try/catch and optional suffix") {
    assert(jq("""[{}, true, {"a":1}]""", "[.[]|try .a]") == "[null,1]")
    assert(jq("""[{}, true, {"a":1}]""", "[.[]|.a?]") == "[null,1]")
    assert(jq("""[{}, true, {"a":1}]""",
      """[.[]|try .a catch ". is not an object"]""")
      == """[null,". is not an object",1]""")
  }

  test("unsupported gojq forms raise; try_jq maps them to NULL") {
    jqFails("[1, 2, 3]", ".foo & .bar")
    assert(tryJq("[1, 2, 3]", ".foo & .bar") == null)
    jqFails("1", "def fact($n): 1; fact(50)")
    assert(tryJq("""{"a":1} [2] 3""", ". as {$a} ?// [$a] ?// $a | $a") == null)
  }

  test("reduce/foreach with $var bindings (func_jq.result)") {
    assert(jq("[1, 2, 3]", "reduce .[] as $item (0; + $item)") == "3")
    assert(jq("[1, 2, 3]", "reduce .[] as $x (0; . + $x)") == "6")
    assert(jq("[1, 2, 3]", "foreach .[] as $item(0; . + $item; [$item, . * 2])") ==
      "[1,2][2,6][3,12]")
  }

  test("builtins: length keys type add map select min max join") {
    assert(jq("""[1,2,3]""", "length") == "3")
    assert(jq("\"abc\"", "length") == "3")
    assert(jq("""{"b":1,"a":2}""", "keys") == """["a","b"]""")
    assert(jq("""[1,2,3]""", "add") == "6")
    assert(jq("""[1,2,3]""", "map(. + 1)") == "[2,3,4]")
    assert(jq("""[1,2,3]""", "[.[] | select(. > 1)]") == "[2,3]")
    assert(jq("""[3,1,2]""", "min") == "1")
    assert(jq("""[3,1,2]""", "max") == "3")
    assert(jq("""["a","b"]""", """join("-")""") == "\"a-b\"")
    assert(jq("""{"a":1}""", "type") == "\"object\"")
    assert(jq("""{"a":1}""", """has("a")""") == "true")
  }

  test("huge integer literals in doc survive extraction") {
    assert(jq("""{"foo": 4722366482869645213696}""", ".foo")
      == "4722366482869645213696")
  }

  test("SQL registration: jq and try_jq callable from spark.sql") {
    val spark = SparkTestSession.spark
    val row = spark.sql(
      """select jq('{"a":1, "b":2}', '{aa: .a, bb: .b}') as j,
        |       try_jq('[1]', '.foo & .bar') as t""".stripMargin).head
    assert(row.getString(0) == """{"aa":1,"bb":2}""")
    assert(row.isNullAt(1))
  }
}
