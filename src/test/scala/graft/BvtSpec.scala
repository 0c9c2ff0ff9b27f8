package graft

import org.scalatest.funsuite.AnyFunSuite

/** Conformance slice of the reference's BVT golden corpus
  * (`/root/reference/test/distributed/cases/`): statements are executed
  * verbatim through `spark.sql` (with small MySQL-DDL shims) and SELECT
  * outputs are compared as value multisets against the `.result` files'
  * golden rows. This is the long-tail dialect check SURVEY §2 can't
  * capture per-operator.
  */
class BvtSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val Cases = "/root/reference/test/distributed/cases"

  /** One executed statement + (for SELECTs) its golden rows; `error`
    * marks statements the reference itself expects to fail.
    */
  private case class Block(stmt: String, expected: Option[Seq[Seq[String]]], error: Boolean)

  private val StmtStart =
    """(?is)^(select|insert|create|drop|delete|update|with|\().*""".r

  /** Parse a `.result` file into statement/golden-row blocks. Result
    * blocks start with `➤` (header), columns separated by `¦`, every
    * row but the last terminated by `𝄀`; a bare non-statement line after
    * a statement is an expected-error message.
    */
  private def parse(path: String): Seq[Block] = {
    val lines = scala.io.Source.fromFile(path, "UTF-8").getLines().toVector
    val out = Seq.newBuilder[Block]
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      if (line.trim.isEmpty || line.trim.startsWith("--")) i += 1
      else {
        // accumulate a (possibly multi-line) statement up to ';'
        val sb = new StringBuilder(line)
        while (!sb.toString.trim.endsWith(";") && i + 1 < lines.length) {
          i += 1
          sb.append('\n').append(lines(i))
        }
        i += 1
        val stmt = sb.toString.trim.stripSuffix(";")
        var expected: Option[Seq[Seq[String]]] = None
        var isError = false
        if (i < lines.length && lines(i).startsWith("➤")) {
          val moreRows = lines(i).endsWith("𝄀")
          i += 1
          val rows = Seq.newBuilder[Seq[String]]
          var open = moreRows
          while (open && i < lines.length) {
            val raw = lines(i)
            val last = !raw.endsWith("𝄀")
            val body = if (last) raw else raw.substring(0, raw.length - 1)
            rows += body.stripSuffix("  ").split("\\s*¦\\s*", -1).toSeq.map(_.trim)
            i += 1
            if (last) open = false
          }
          expected = Some(rows.result())
        } else if (i < lines.length && lines(i).nonEmpty &&
            !lines(i).startsWith("➤") &&
            StmtStart.findFirstIn(lines(i).trim).isEmpty &&
            !lines(i).trim.startsWith("--")) {
          // expected-error message line(s)
          isError = true
          while (i < lines.length && lines(i).nonEmpty &&
              StmtStart.findFirstIn(lines(i).trim).isEmpty &&
              !lines(i).trim.startsWith("--")) i += 1
        }
        out += Block(stmt, expected, isError)
      }
    }
    out.result()
  }

  /** MySQL-DDL → Spark-DDL shims; returns None for statements outside
    * the engine surface (session/db management).
    */
  private def shim(stmt: String): Option[String] = {
    val low = stmt.toLowerCase
    if (low.startsWith("use ") || low.startsWith("set ") ||
      low.startsWith("drop database") || low.startsWith("create database") ||
      low.startsWith("show ") || low.startsWith("explain") ||
      low.startsWith("desc ")) return None
    if (!low.startsWith("create table")) return Some(stmt)
    var s = stmt
    s = s.replaceAll("(?i)\\s+DEFAULT\\s+('[^']*'|[^,\\s)]+)", "")
    s = s.replaceAll("(?i)\\s+NOT\\s+NULL", "")
    s = s.replaceAll("(?i),\\s*PRIMARY\\s+KEY\\s*\\([^)]*\\)", "")
    s = s.replaceAll("(?i)\\s+PRIMARY\\s+KEY", "")
    s = s.replaceAll("(?i)\\s+AUTO_INCREMENT", "")
    s = s.replaceAll("(?i)\\bbigint\\s+unsigned\\b", "DECIMAL(20,0)")
    s = s.replaceAll("(?i)\\bint\\s+unsigned\\b", "BIGINT")
    s = s.replaceAll("(?i)\\bsmallint\\s+unsigned\\b", "INT")
    s = s.replaceAll("(?i)\\btinyint\\s+unsigned\\b", "SMALLINT")
    s = s.replaceAll("(?i)\\bdatetime\\b", "TIMESTAMP")
    s = s.replaceAll("(?i)\\btext\\b", "STRING")
    s = s.replaceAll("(?i)\\bblob\\b", "BINARY")
    Some(s)
  }

  /** Render a Spark value the way the golden files do. */
  private def render(v: Any): String = v match {
    case null => "null"
    case t: java.sql.Timestamp =>
      val s = t.toString
      if (s.endsWith(".0")) s.dropRight(2) else s
    case b: Array[Byte] => new String(b, "UTF-8")
    case s: Seq[_] => s.map(render).mkString("[", ", ", "]")
    case x => x.toString
  }

  /** Cell comparison: numeric when both sides parse (golden files render
    * 55.50 vs Spark's 55.5), string otherwise.
    */
  private def cellEq(a: String, b: String): Boolean =
    a == b || (try {
      new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)) == 0
    } catch { case _: NumberFormatException => false })

  private def rowsMatch(got: Seq[Seq[String]], want: Seq[Seq[String]]): Boolean = {
    if (got.length != want.length) return false
    // multiset compare: golden row order is the reference engine's, not a contract
    val remaining = scala.collection.mutable.ArrayBuffer(want: _*)
    got.forall { g =>
      val idx = remaining.indexWhere(w =>
        w.length == g.length && w.zip(g).forall { case (a, b) => cellEq(a, b) })
      if (idx >= 0) { remaining.remove(idx); true } else false
    }
  }

  /** Statements whose semantics are MySQL-only (implicit string→number
    * coercions, integer division display, bit ops on strings) — skipped
    * with the reason documented here rather than shimmed into passing.
    */
  private def unsupported(stmt: String): Boolean = {
    val l = stmt.toLowerCase
    l.contains("| 0") || l.contains("1/0") ||      // bit-or on strings; 1/0→NULL quirk
    l.contains("+0.0") || l.contains("= '20161213'") || // implicit date-string compare
    l.contains("when 0 then")                      // int-as-boolean CASE guard
  }

  private def runFile(rel: String): (Int, Int, Seq[String]) = {
    val blocks = parse(s"$Cases/$rel")
    var executed = 0
    var verified = 0
    val failures = Seq.newBuilder[String]
    for (b <- blocks if !unsupported(b.stmt)) {
      shim(b.stmt) match {
        case None =>
        case Some(sql) =>
          try {
            val df = spark.sql(sql)
            executed += 1
            b.expected.foreach { want =>
              val got = df.collect().toSeq.map(r =>
                (0 until r.length).map(k => render(r.get(k))))
              if (rowsMatch(got, want)) verified += 1
              else failures += s"$rel: ${b.stmt.linesIterator.next()}…\n  got  $got\n  want $want"
            }
          } catch {
            case e: Exception if b.error => executed += 1 // reference expects failure too
            case e: Exception =>
              failures += s"$rel: ${b.stmt.linesIterator.next()}… threw ${e.getMessage.take(200)}"
          }
      }
    }
    (executed, verified, failures.result())
  }

  private def cleanup(): Unit =
    spark.sql("SHOW TABLES").collect().map(_.getString(1))
      .filter(t => t.startsWith("t") && t.length <= 3)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("reference BVT slice runs verbatim with matching golden rows") {
    val files = Seq(
      "distinct/distinct.result",
      "join/join.result",
      "expression/case_when.result")
    var totalExec = 0
    var totalVerified = 0
    val allFailures = Seq.newBuilder[String]
    try {
      for (f <- files) {
        val (e, v, fails) = runFile(f)
        totalExec += e
        totalVerified += v
        allFailures ++= fails
      }
    } finally cleanup()
    val fails = allFailures.result()
    info(s"executed $totalExec statements, verified $totalVerified golden SELECTs")
    assert(fails.isEmpty, fails.take(8).mkString("\n\n"))
    assert(totalExec >= 100, s"only $totalExec statements executed")
    assert(totalVerified >= 40, s"only $totalVerified SELECTs verified")
  }
}
