package graft

import graft.operators.Onnx
import org.scalatest.funsuite.AnyFunSuite

/** onnx_run seam: shape parsing, stub math, per-model session reuse,
  * backend registry (mirrors LlmSpec for the llm seam).
  */
class OnnxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("shape json parses dims and dtype") {
    val s = Onnx.parseShape("""{"dim":[1,1,4],"dtype":"float32"}""")
    assert(s.dims == Seq(1, 1, 4) && s.size == 4 && s.dtype == "float32")
    assert(Onnx.parseShape("""{"dim":[3]}""").dtype == "float32")
    intercept[IllegalArgumentException](Onnx.parseShape("""{"nope":1}"""))
  }

  test("stub backend: documented deterministic math, input validated") {
    val model = "abcde".getBytes // len 5
    val out = Onnx.runOnce(model, "[1, 2, 3]", """{"dim":[3]}""", """{"dim":[2]}""")
    assert(out == "[11.0,17.0]") // sum=6 → 6*1+5, 6*2+5
    // same call again (cached session) is identical
    assert(Onnx.runOnce(model, "[1, 2, 3]", """{"dim":[3]}""", """{"dim":[2]}""") == out)
    intercept[IllegalArgumentException](
      Onnx.runOnce(model, "[1]", """{"dim":[3]}""", """{"dim":[2]}"""))
    assert(Onnx.runOnce(null, "[1]", """{"dim":[1]}""", """{"dim":[1]}""") == null)
  }

  test("a registered backend takes over via use() and reset()") {
    val calls = new java.util.concurrent.atomic.AtomicInteger
    Onnx.registerBackend("const7", new Onnx.OnnxBackend {
      override def create(model: Array[Byte]): Onnx.OnnxSession = {
        calls.incrementAndGet()
        new Onnx.OnnxSession {
          override def run(in: Array[Double], out: Onnx.Shape): Array[Double] =
            Array.fill(out.size)(7.0)
        }
      }
    })
    try {
      Onnx.use("const7")
      assert(Onnx.runOnce("m".getBytes, "[9]", """{"dim":[1]}""", """{"dim":[2]}""")
        == "[7.0,7.0]")
      // per-digest session reuse: second row, same model → no new create
      Onnx.runOnce("m".getBytes, "[1]", """{"dim":[1]}""", """{"dim":[2]}""")
      assert(calls.get() == 1)
      intercept[IllegalArgumentException](Onnx.use("missing"))
    } finally {
      Onnx.use("stub")
      Onnx.reset()
    }
  }

  test("sql surface: onnx_run registered and usable from spark.sql") {
    GraftSession.init(spark)
    val r = spark.sql(
      """SELECT onnx_run(CAST('ab' AS BINARY), to_json(array(2, 3)),
        |'{"dim":[2]}', '{"dim":[1]}') AS o""".stripMargin).head.getString(0)
    assert(r == "[7.0]") // sum=5 → 5*1+2
  }
}
