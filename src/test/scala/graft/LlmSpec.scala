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

  test("http backend: real JSON-over-HTTP round trip through the seam") {
    // in-process mock model server (JDK HttpServer), ollama-shaped protocol
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def handler(f: com.fasterxml.jackson.databind.JsonNode => String) =
      new com.sun.net.httpserver.HttpHandler {
        override def handle(x: com.sun.net.httpserver.HttpExchange): Unit = {
          val req = mapper.readTree(x.getRequestBody.readAllBytes())
          val resp = f(req).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          x.sendResponseHeaders(200, resp.length)
          x.getResponseBody.write(resp)
          x.close()
        }
      }
    server.createContext("/chat", handler { req =>
      s"""{"text":"model=${req.get("model").asText()} says: ${req.get("query").asText()}"}"""
    })
    server.createContext("/embed", handler { req =>
      val n = req.get("query").asText().length
      s"""{"embedding":[$n.0, 1.5, -2.0]}"""
    })
    server.start()
    try {
      val addr = s"http://127.0.0.1:${server.getAddress.getPort}"
      val chat = Llm.chatOnce("http", addr, "mock-7b", "", "hello seam")
      assert(chat == "model=mock-7b says: hello seam")
      val emb = Llm.embedOnce("http", addr, "mock-7b", "", "abcd")
      assert(emb.toSeq == Seq(4.0f, 1.5f, -2.0f))
      // the pipeline form drives the same client from executor threads
      import spark.implicits._
      val out = Llm.chatColumn(Seq((1L, "x"), (2L, "yy")).toDF("id", "text"),
        "text", "resp", server = "http", addr = addr, model = "mock-7b")
      val rows = out.orderBy("id").collect().map(_.getString(2))
      assert(rows.toSeq == Seq("model=mock-7b says: x", "model=mock-7b says: yy"))
    } finally server.stop(0)
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
