package graft

import graft.operators.Llm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LLM-builtin plumbing: backend registry, per-config client reuse,
  * deterministic stub behavior, SQL + pipeline forms.
  */
class LlmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("stub chat is deterministic and model/addr-tagged") {
    val a = Llm.chatOnce("stub", "local", "m1", "", "summarize the fast table scan")
    val b = Llm.chatOnce("stub", "local", "m1", "", "summarize the fast table scan")
    assert(a == b && a.startsWith("[m1@local]") && a.contains("summarize the fast table"))
    assert(Llm.chatOnce("stub", "local", "m1", "", "different query") != a)
  }

  test("stub embedding is unit-norm and stable") {
    val v = Llm.embedOnce("stub", "local", "m1", "", "hello world")
    assert(v.length == 64)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(v.sameElements(Llm.embedOnce("stub", "local", "m1", "", "hello world")))
  }

  test("unknown backend fails with a clear error; custom backends register") {
    val e = intercept[IllegalArgumentException](
      Llm.chatOnce("nope", "x", "y", "", "q"))
    assert(e.getMessage.contains("unknown server backend"))
    Llm.registerBackend("echo", new Llm.LlmBackend {
      override def create(addr: String, model: String, options: String): Llm.LlmClient =
        new Llm.LlmClient {
          override def chat(q: String): String = s"echo:$q"
          override def embed(t: String): Array[Float] = Array(1f)
        }
    })
    assert(Llm.chatOnce("echo", "a", "m", "", "hi") == "echo:hi")
  }

  test("SQL surface and mapPartitions pipeline form") {
    import spark.implicits._
    val sql = spark.sql(
      "select llm_chat('stub', 'local', 'm1', '', 'classify this doc') as r").head.getString(0)
    assert(sql.startsWith("[m1@local]"))

    val df = Seq((1L, "first doc"), (2L, "second doc")).toDF("id", "text")
    val out = Llm.chatColumn(df, "text", "summary")
    assert(out.columns.toSeq == Seq("id", "text", "summary"))
    val rows = out.orderBy("id").collect()
    assert(rows.forall(_.getString(2).startsWith("[stub-1@local]")))
    assert(rows(0).getString(2) ==
      Llm.chatOnce("stub", "local", "stub-1", "", "first doc"))
  }
}
