package graft

import graft.functions.JsonTail._
import org.scalatest.funsuite.AnyFunSuite

/** MySQL-semantics cases for the JSON long tail that the DuckDB oracle
  * can't express (schema keywords, report shape, bytejson key order).
  */
class JsonTailSpec extends AnyFunSuite {

  test("json_value: scalars unquote, containers and missing paths are NULL") {
    assert(jsonValue("""{"a": {"b": "x y"}}""", "$.a.b") == "x y")
    assert(jsonValue("""{"a": [1, 2]}""", "$.a[1]") == "2")
    assert(jsonValue("""{"a": [1, 2]}""", "$.a") == null)
    assert(jsonValue("""{"a": 1}""", "$.b") == null)
    assert(jsonValue("""{"a": null}""", "$.a") == null)
    assert(jsonValue("""{"a b": 7}""", "$.\"a b\"") == "7")
    assert(jsonValue("""{"a": 1}""", "not-a-path") == null)
    assert(jsonValue("not json", "$.a") == null)
  }

  test("json_length: containers count elements, scalars are 1") {
    assert(jsonLength("""{"a":1,"b":2}""").contains(2L))
    assert(jsonLength("[1,2,3]").contains(3L))
    assert(jsonLength("\"str\"").contains(1L))
    assert(jsonLength("{}").contains(0L))
    assert(jsonLengthPath("""{"a": [1,2,3]}""", "$.a").contains(3L))
    assert(jsonLengthPath("""{"a": 1}""", "$.nope").isEmpty)
  }

  test("json_keys: bytejson sorted order with MySQL-style separators") {
    assert(jsonKeys("""{"b":1,"a":2,"c":3}""") == """["a", "b", "c"]""")
    assert(jsonKeys("[1,2]") == null)
    assert(jsonKeysPath("""{"o": {"z":1,"y":2}}""", "$.o") == """["y", "z"]""")
    assert(jsonKeysPath("""{"o": [1]}""", "$.o") == null)
  }

  test("json_pretty: 2-space indent, sorted keys, nested containers") {
    assert(jsonPretty("""{"b":[1,2],"a":{"x":1}}""") ==
      "{\n  \"a\": {\n    \"x\": 1\n  },\n  \"b\": [\n    1,\n    2\n  ]\n}")
    assert(jsonPretty("{}") == "{}")
    assert(jsonPretty("[]") == "[]")
    assert(jsonPretty("3") == "3")
  }

  test("json_overlaps: arrays, objects, scalar-vs-array, numeric equality") {
    assert(jsonOverlaps("[1,2,3]", "[3,4]").contains(true))
    assert(jsonOverlaps("[1,2]", "[3,4]").contains(false))
    assert(jsonOverlaps("""{"a":1,"b":2}""", """{"b":2}""").contains(true))
    assert(jsonOverlaps("""{"a":1}""", """{"a":2}""").contains(false))
    assert(jsonOverlaps("[1,2]", "2").contains(true))
    assert(jsonOverlaps("5", "[1,5]").contains(true))
    assert(jsonOverlaps("5", "5.0").contains(true))
    assert(jsonOverlaps("""{"a":1}""", "[{\"a\":1}]").contains(true))
    assert(jsonOverlaps("bad", "[1]").isEmpty)
  }

  test("json_schema_valid: keyword subset") {
    val schema =
      """{"type":"object","required":["name","age"],
        |  "properties":{
        |    "name":{"type":"string","minLength":2,"pattern":"^[A-Z]"},
        |    "age":{"type":"integer","minimum":0,"maximum":150},
        |    "tags":{"type":"array","minItems":1,"uniqueItems":true,
        |            "items":{"type":"string"}}}}""".stripMargin
    assert(jsonSchemaValid(schema, """{"name":"Bob","age":40}""").contains(true))
    assert(jsonSchemaValid(schema, """{"name":"Bob"}""").contains(false))
    assert(jsonSchemaValid(schema, """{"name":"Bob","age":-1}""").contains(false))
    assert(jsonSchemaValid(schema, """{"name":"bob","age":4}""").contains(false))
    assert(jsonSchemaValid(schema, """{"name":"Bob","age":4,"tags":[]}""").contains(false))
    assert(jsonSchemaValid(schema, """{"name":"Bob","age":4,"tags":["x","x"]}""").contains(false))
    assert(jsonSchemaValid(schema, """{"name":"Bob","age":4,"tags":["x",1]}""").contains(false))
    assert(jsonSchemaValid(schema, """{"name":"Bob","age":4,"tags":["x","y"]}""").contains(true))
    // integer satisfies "number"
    assert(jsonSchemaValid("""{"type":"number"}""", "3").contains(true))
    assert(jsonSchemaValid("""{"enum":[1,2]}""", "2.0").contains(true))
    assert(jsonSchemaValid("""{"const":"a"}""", "\"b\"").contains(false))
    assert(jsonSchemaValid(
      """{"properties":{"a":{}},"additionalProperties":false}""",
      """{"a":1,"b":2}""").contains(false))
    assert(jsonSchemaValid("bad", "{}").isEmpty)
  }

  test("json_schema_validation_report: MySQL report shape") {
    val schema = """{"properties":{"lat":{"type":"number","minimum":-90}}}"""
    assert(jsonSchemaValidationReport(schema, """{"lat": 10}""") == """{"valid":true}""")
    // MO's gojsonschema rendering (func_json_schema.result): $-path
    // document locations, '#/<keyword>' schema location, exact reason
    val bad = jsonSchemaValidationReport(schema, """{"lat": -100}""")
    assert(bad.contains("\"valid\":false"))
    assert(bad.contains("\"reason\":\"Must be greater than or equal to -90\""))
    assert(bad.contains("\"schema-location\":\"#/minimum\""))
    assert(bad.contains("\"document-location\":\"$.lat\""))
    assert(bad.contains("\"schema-failed-keyword\":\"minimum\""))
  }

  test("SQL names plan as native JsonScalarExpr, no ScalaUDF, MySQL arities") {
    val spark = SparkTestSession.spark
    val row = spark.sql(
      """SELECT json_value('{"a":{"b":7}}', '$.a.b') v,
        |  json_length('[1,2,3]') l1, json_length('{"a":[1,2]}', '$.a') l2,
        |  json_keys('{"b":1,"a":2}') k,
        |  json_type('[1]') t, json_depth('{"a":{"b":1}}') d,
        |  json_contains('[1,2,3]', '2') c,
        |  json_contains_path('{"a":1,"b":2}', 'all', '$.a', '$.b') cp,
        |  json_unquote(json_quote('x"y')) uq,
        |  json_merge_preserve('{"a":1}', '{"a":2}') mp""".stripMargin).head
    assert(row.getString(0) == "7")
    assert(row.getLong(1) == 3L && row.getLong(2) == 2L)
    assert(row.getString(3) == """["a", "b"]""")
    assert(row.getString(4) == "ARRAY" && row.getInt(5) == 3)
    assert(row.getBoolean(6) && row.getBoolean(7))
    assert(row.getString(8) == "x\"y")
    assert(row.getString(9) == """{"a":[1,2]}""")
    // the long tail is off UDFs: the analyzed plan holds JsonScalarExpr only
    val plan = spark.sql("SELECT json_value('{}', '$.k'), json_depth('{}')")
    assert(!plan.queryExecution.analyzed.toString.contains("UDF"),
      "JSON long-tail SQL names must not resolve to ScalaUDF")
  }
}
