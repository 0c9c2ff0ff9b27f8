package graft

import graft.functions.{JsonMutateExpr, JsonMutation}
import org.apache.spark.sql.GraftColumnBridge.{expression => asExpr}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The single-pass mutation expression: program semantics, chain
  * fusion, and SQL-surface parity with the scalar reference impl.
  */
class JsonMutateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("chained mutations fuse into ONE expression (one parse, one serialize)") {
    val chained = JsonMutation.json_set(
      JsonMutation.json_remove(
        JsonMutation.json_insert(col("j"), lit("$.a"), lit("1")),
        lit("$.b")),
      lit("$.c"), lit("3"))
    asExpr(chained) match {
      case JsonMutateExpr(children) =>
        assert(children.length == 1 + 3 * 3, "three ops share one program")
      case other => fail(s"expected fused JsonMutateExpr, got $other")
    }
  }

  test("program applies edits in order with MySQL no-parent-autocreate semantics") {
    import spark.implicits._
    val df = Seq("""{"b":2,"k":{"n":5}}""").toDF("j")
    val out = df.select(
      JsonMutation.json_set(
        JsonMutation.json_remove(
          JsonMutation.json_insert(col("j"), lit("$.a"), lit("1")),
          lit("$.b")),
        lit("$.k.n"), lit("9")).as("r1"),
      JsonMutation.json_insert(col("j"), lit("$.b"), lit("99")).as("ins_noop"),
      JsonMutation.json_replace(col("j"), lit("$.zz"), lit("1")).as("repl_noop"),
      JsonMutation.json_set(col("j"), lit("$.missing.leaf"), lit("1")).as("deep_noop"),
      JsonMutation.json_merge_patch(col("j"), lit("""{"b":null,"x":7}""")).as("mp")
    ).head
    assert(out.getString(0) == """{"k":{"n":9},"a":1}""")
    assert(out.getString(1) == """{"b":2,"k":{"n":5}}""")
    assert(out.getString(2) == """{"b":2,"k":{"n":5}}""")
    assert(out.getString(3) == """{"b":2,"k":{"n":5}}""")
    assert(out.getString(4) == """{"k":{"n":5},"x":7}""")
  }

  test("SQL names plan the native expression and agree with the scalar reference") {
    val r = spark.sql(
      """select json_set(json_remove('{"a":1,"b":2}', '$.a'), '$.c', '3') as chain,
        |       json_merge_patch('{"a":{"x":1}}', '{"a":{"y":2}}') as mp""".stripMargin).head
    assert(r.getString(0) == JsonMutation.jsonSet(
      JsonMutation.jsonRemove("""{"a":1,"b":2}""", "$.a"), "$.c", "3"))
    assert(r.getString(1) == JsonMutation.jsonMergePatch("""{"a":{"x":1}}""", """{"a":{"y":2}}"""))
    // the SQL plan contains the native expression, not a UDF
    val plan = spark.sql("""select json_set('{"a":1}', '$.a', '2') as x""")
      .queryExecution.analyzed.toString
    assert(plan.contains("json_mutate"), s"expected native json_mutate in plan:\n$plan")
  }

  test("null propagation") {
    import spark.implicits._
    val df = Seq((null: String, """{"a":1}""")).toDF("n", "j")
    val r = df.select(
      JsonMutation.json_set(col("n"), lit("$.a"), lit("1")).as("a"),
      JsonMutation.json_set(col("j"), lit("$.a"), col("n")).as("b"),
      JsonMutation.json_merge_patch(col("j"), col("n")).as("c")).head
    // a NULL doc or patch is NULL out; a NULL VALUE stores the json
    // null scalar (func_json_set.result: JSON_SET(…, '$.fruits[1]',
    // null) keeps the array with a null element)
    assert(r.isNullAt(0) && r.getString(1) == """{"a":null}""" && r.isNullAt(2))
  }
}
