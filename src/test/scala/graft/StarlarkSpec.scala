package graft

import graft.functions.Starlark
import org.scalatest.funsuite.AnyFunSuite

/** The starlark(code, arg) scalar surface
  * (`pkg/sql/plan/function/func_builtin_starlark.go`): module + main()
  * convention, repr result semantics (a returned string is QUOTED,
  * `:165` appends `res.String()`), try_ → NULL on error, and the
  * predeclared jq bridge.
  */
class StarlarkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(code: String, arg: String): String =
    Starlark.starlarkEval(code, arg)

  test("main(arg) convention with repr result semantics") {
    // a returned string is the starlark repr — quoted
    assert(run("def main(s):\n    return s\n", "x") == "\"x\"")
    assert(run("def main(s):\n    return len(s)\n", "hello") == "5")
    assert(run("def main(s):\n    return None\n", "x") == null)
    // NULL argument row → NULL without running main
    assert(run("def main(s):\n    return s\n", null) == null)
  }

  test("top-level control flow, while, global reassign, recursion") {
    val code =
      """total = 0
        |for i in range(5):
        |    total += i
        |
        |def fib(n):
        |    if n < 2:
        |        return n
        |    return fib(n - 1) + fib(n - 2)
        |
        |def bump():
        |    global_probe = 1  # binds where defined (module scope here)
        |
        |def main(s):
        |    n = int(s)
        |    acc = 0
        |    while n > 0:
        |        acc += fib(n)
        |        n -= 1
        |    return [total, acc]
        |""".stripMargin
    // total = 0+1+2+3+4 = 10; fib(1..6) = 1+1+2+3+5+8 = 20
    assert(run(code, "6") == "[10, 20]")
  }

  test("strings, lists, dicts, comprehensions, slicing") {
    val code =
      """def main(s):
        |    words = s.split(",")
        |    up = [w.strip().upper() for w in words if w.strip() != ""]
        |    d = {}
        |    for i, w in enumerate(up):
        |        d[w] = i
        |    return [up, d, s[0:3], "-".join(up), sorted(up, )[0]]
        |""".stripMargin
    assert(run(code, "b, a,  ,c") ==
      """[["B", "A", "C"], {"B": 0, "A": 1, "C": 2}, "b, ", "B-A-C", "A"]""")
  }

  test("arithmetic follows starlark semantics (floor div/mod, / is float)") {
    val code =
      """def main(s):
        |    return [7 // 2, -7 // 2, 7 % 3, -7 % 3, 7 / 2, 2 * 3.5,
        |            "ab" * 2, [1] * 3, min(3, 1, 2), max([4, 9]), sum([1, 2, 3])]
        |""".stripMargin
    assert(run(code, "") ==
      "[3, -4, 1, 2, 3.5, 7.0, \"abab\", [1, 1, 1], 1, 9, 6]")
  }

  test("tuple assignment, in/not in, chained compare, conditional expr") {
    val code =
      """def main(s):
        |    a, b = 1, 2
        |    a, b = b, a
        |    ok = 1 < a <= 2
        |    has = "el" in s and s not in ["x"]
        |    label = "big" if a > 1 else "small"
        |    return [a, b, ok, has, label]
        |""".stripMargin
    assert(run(code, "hello") == "[2, 1, True, True, \"big\"]")
  }

  test("predeclared jq bridge runs the same engine as SQL jq") {
    val code =
      """def main(s):
        |    return jq(".a + .b", s)
        |""".stripMargin
    // jq returns the marshaled JSON string; repr quotes it
    assert(run(code, """{"a": 1, "b": 2}""") == "\"3\"")
  }

  test("errors: starlark raises, try_starlark nulls") {
    val bad = "def main(s):\n    return undefined_name\n"
    assertThrows[Starlark.StarlarkError](Starlark.starlarkEval(bad, "x"))
    assert(Starlark.tryStarlarkEval(bad, "x") == null)
    // missing main
    assertThrows[Starlark.StarlarkError](Starlark.starlarkEval("x = 1", "x"))
    assert(Starlark.tryStarlarkEval("x = 1", "x") == null)
    // fail() builtin
    assert(Starlark.tryStarlarkEval(
      "def main(s):\n    fail(\"boom\")\n", "x") == null)
    // runaway loop hits the execution budget instead of hanging the task
    assert(Starlark.tryStarlarkEval(
      "def main(s):\n    while True:\n        pass\n", "x") == null)
  }

  test("registered SQL functions: starlark and try_starlark") {
    GraftSession.init(spark)
    val r = spark.sql(
      """SELECT starlark('def main(s):\n    return s.upper()\n', 'ok') AS a,
        |       try_starlark('def main(s):\n    return boom\n', 'x') AS b
        |""".stripMargin.replace("\\n", "\n")).head
    assert(r.getString(0) == "\"OK\"")
    assert(r.isNullAt(1))
  }
}
