package graft.sql

import graft.fulltext.Bm25
import graft.operators.TimeWindow
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap

/** The reference's MySQL-dialect SQL surface for its NON-standard syntax,
  * accepted as raw strings and rewritten onto the existing operators —
  * the "thin SQL-rewrite layer only where needed" of SURVEY §1.1. No
  * Catalyst parser fork: each construct is recognized pre-parse, mapped
  * to standard Spark SQL plus a DataFrame post-stage, and everything
  * else passes through to `spark.sql` untouched.
  *
  * Covered constructs (reference grammar + tests cited per method):
  *  - `SELECT _wstart, _wend, aggs FROM t [WHERE ...]
  *     interval(ts, N, unit) [sliding(M, unit)] [fill(...)]`
  *    (`pkg/sql/colexec/timewin/types.go:199`,
  *    `test/distributed/cases/window/time_window.sql:13,23`)
  *  - scored `MATCH(col) AGAINST('q' [IN BOOLEAN MODE|IN NATURAL
  *    LANGUAGE MODE])` in projection and/or WHERE
  *    (`pkg/fulltext/fulltext.go:731`,
  *    `test/distributed/cases/fulltext/fulltext.sql:353-355`)
  *  - `sample(expr, N rows | K percent)` in the select list, with
  *    optional GROUP BY (`pkg/sql/colexec/sample/types.go:31-32`,
  *    `test/distributed/cases/sample/sample.sql:16`)
  *
  * Scale note: the rewrites only ever produce the operators' own plans
  * (windowed agg + bucketed gap fill, postings-table probe join, one
  * window pass per group) — the SQL layer adds no collect, no extra
  * shuffle, no driver loop.
  */
object GraftSql {

  /** table name → unique-id column used to join fulltext scores back.
    * The reference requires a PK for a fulltext index
    * (`pkg/sql/plan/build_constraint_util.go` fulltext checks); here the
    * registry defaults to the table's first column when unregistered.
    */
  private val primaryKeys = TrieMap[String, String]("documents" -> "doc_id")
  def registerPrimaryKey(table: String, pk: String): Unit =
    primaryKeys.put(table, pk)

  private val viewSeq = new AtomicLong(0L)

  /** Entry point: accept reference-dialect SQL, return the DataFrame. */
  def sql(spark: SparkSession, query: String): DataFrame = {
    val q0 = query.trim.stripSuffix(";").trim
    prepareRewrite(spark, q0).getOrElse {
      // user variables resolve to their SET-time literals everywhere else
      val q = substituteOutsideQuotes(q0, "@", name => userVarLit(spark, name))
      // dropping a table forgets its fulltext indexes (a recreated
      // table starts with none — fulltext.sql:438-440 recreates and
      // re-registers the same index name)
      """(?is)^drop\s+table\s+(?:if\s+exists\s+)?(?:`?\w+`?\.)?`?(\w+)`?\s*$""".r
        .findFirstMatchIn(q)
        .foreach { m =>
          ftIndexCols.remove(ftKey(spark, m.group(1)))
          // vector indexes die with their table too (registry keys are
          // "$name-$table-$vecCol")
          val mid = s"-${m.group(1)}-"
          (graft.plans.IvfIndex.indexes.map(_.name) ++
            graft.plans.HnswIndex.indexes.map(_.name) ++
            graft.plans.IvfPqIndex.indexes.map(_.name))
            .filter(_.contains(mid)).distinct.foreach { n =>
              graft.plans.IvfIndex.drop(n)
              graft.plans.HnswIndex.drop(n)
              graft.plans.IvfPqIndex.drop(n)
            }
        }
      val q2 = quantifiedRewrite(q)
      intervalRewrite(spark, q2)
        .orElse(sampleRewrite(spark, q2))
        .orElse(fulltextDdlRewrite(spark, q2))
        .orElse(matchRewrite(spark, q2))
        .orElse(indexDdlRewrite(spark, q2))
        .getOrElse(spark.sql(q2))
    }
  }

  // ------------------------------------------------------------------
  // Quantified comparison subqueries: x OP ALL|ANY|SOME (SELECT ...)
  // ------------------------------------------------------------------

  /** Spark has no `x > ALL (SELECT ...)` surface (MySQL/the reference
    * parse it, `subquery-with-any.sql`, `subquery-with-exists.sql:221`);
    * rewrite into NULL-aware min/max scalar-subquery forms:
    *   - `<> ALL` → `NOT IN`, `= ANY` → `IN` (Spark's native NULL-aware
    *     [anti-]semi joins — the scale path);
    *   - ordering ops → compare against `max`/`min` with empty-set and
    *     NULL-in-set handling per 3VL (ALL over ∅ is TRUE, ANY over ∅ is
    *     FALSE; a NULL element forces UNKNOWN unless the comparison is
    *     already decided FALSE for ALL / TRUE for ANY).
    * The scalar subqueries this emits are uncorrelated w.r.t. the left
    * operand, so Catalyst plans each once (ReusedSubquery) — no per-row
    * re-execution. Known divergence: in a filter context UNKNOWN and
    * FALSE both drop the row, but under an enclosing NOT(...) the
    * rewrite's FALSE-vs-UNKNOWN choice for a NULL left operand can
    * differ from strict 3VL.
    */
  private[graft] def quantifiedRewrite(q0: String): String = {
    val KeyRe = """(?i)\b(all|any|some)\s*\(""".r
    var s = q0
    var guard = 0
    var changed = true
    while (changed && guard < 32) {
      changed = false; guard += 1
      val hit = KeyRe.findAllMatchIn(s).flatMap { m =>
        lhsBefore(s, m.start).flatMap { case (lhs, op, lhsStart) =>
          val open = s.indexOf('(', m.start)
          balancedSpan(s, open).flatMap { case (inner, end) =>
            if ("""(?is)^\s*(select|with)\b""".r.findFirstIn(inner).isDefined)
              Some((lhs, op, m.group(1).toLowerCase, inner, lhsStart, end))
            else None
          }
        }
      }.toSeq.headOption
      hit.foreach { case (lhs, op, kind, sq, from, to) =>
        s = s.substring(0, from) + quantTemplate(lhs, op, kind, sq) + s.substring(to)
        changed = true
      }
    }
    s
  }

  /** Left operand + comparison operator ending right before `idx`
    * (a bare column/literal/qualified name, or one balanced
    * parenthesized expression / call).
    */
  private def lhsBefore(s: String, idx: Int): Option[(String, String, Int)] = {
    val pre = s.substring(0, idx)
    val m = """(?s)(<=|>=|<>|!=|=|<|>)\s*$""".r.findFirstMatchIn(pre).getOrElse(return None)
    val op = m.group(1)
    var e = m.start
    while (e > 0 && Character.isWhitespace(pre(e - 1))) e -= 1
    if (e == 0) return None
    if (pre(e - 1) == ')') {
      var depth = 0
      var i = e - 1
      while (i >= 0) {
        val c = pre(i)
        if (c == ')') depth += 1
        else if (c == '(') {
          depth -= 1
          if (depth == 0) {
            // include a function name directly before the '('
            var j = i
            while (j > 0 && (pre(j - 1).isLetterOrDigit || pre(j - 1) == '_' || pre(j - 1) == '.')) j -= 1
            return Some((pre.substring(j, e), op, j))
          }
        }
        i -= 1
      }
      None
    } else {
      """[\w.`']+$""".r.findFirstIn(pre.substring(0, e))
        .map(t => (t, op, e - t.length))
    }
  }

  /** `(inner, endIndexAfterClose)` for the paren opening at `open`,
    * skipping quoted strings.
    */
  private def balancedSpan(s: String, open: Int): Option[(String, Int)] = {
    if (open < 0 || s(open) != '(') return None
    var depth = 0
    var i = open
    var quote: Char = 0
    while (i < s.length) {
      val c = s(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') quote = c
      else if (c == '(') depth += 1
      else if (c == ')') {
        depth -= 1
        if (depth == 0) return Some((s.substring(open + 1, i), i + 1))
      }
      i += 1
    }
    None
  }

  private def quantTemplate(x: String, op0: String, kind: String, sq: String): String = {
    val a = s"__q${viewSeq.incrementAndGet()}"
    val cnt = s"(SELECT count(*) FROM ($sq) ${a}c)"
    val nulls = s"(SELECT count(*) FROM ($sq) ${a}n(__qv) WHERE __qv IS NULL)"
    val mx = s"(SELECT max(__qv) FROM ($sq) ${a}x(__qv))"
    val mn = s"(SELECT min(__qv) FROM ($sq) ${a}m(__qv))"
    val dc = s"(SELECT count(DISTINCT __qv) FROM ($sq) ${a}d(__qv))"
    val nul = "CAST(NULL AS BOOLEAN)"
    val op = if (op0 == "!=") "<>" else op0
    val all = kind == "all"
    (op, all) match {
      case ("<>", true) => s"(($x) NOT IN ($sq))"
      case ("=", false) => s"(($x) IN ($sq))"
      case ("=", true) =>
        s"(CASE WHEN $cnt = 0 THEN TRUE WHEN $dc > 1 THEN FALSE " +
          s"WHEN NOT(($x) = $mx) THEN FALSE " +
          s"WHEN $nulls > 0 OR ($x) IS NULL THEN $nul ELSE TRUE END)"
      case ("<>", false) =>
        s"(CASE WHEN $cnt = 0 THEN FALSE WHEN ($x) IS NULL THEN $nul " +
          s"WHEN $dc > 1 THEN TRUE WHEN $dc = 1 AND ($x) <> $mx THEN TRUE " +
          s"WHEN $nulls > 0 THEN $nul ELSE FALSE END)"
      case (o, true) => // >, >=, <, <= ALL: compare against the extreme
        val m = if (o == ">" || o == ">=") mx else mn
        s"(CASE WHEN $cnt = 0 THEN TRUE " +
          s"WHEN $nulls > 0 THEN (CASE WHEN NOT(($x) $o $m) THEN FALSE ELSE $nul END) " +
          s"ELSE ($x) $o $m END)"
      case (o, false) => // >, >=, <, <= ANY
        val m = if (o == ">" || o == ">=") mn else mx
        s"(CASE WHEN $cnt = 0 THEN FALSE WHEN ($x) $o $m THEN TRUE " +
          s"WHEN $nulls > 0 OR ($x) IS NULL THEN $nul ELSE FALSE END)"
    }
  }

  // ------------------------------------------------------------------
  // CREATE FULLTEXT INDEX / ALTER TABLE ... ADD FULLTEXT INDEX
  // ------------------------------------------------------------------

  /** table-key → (index name, column set, parser). The reference
    * REJECTS a CREATE/ALTER ADD whose column set EQUALS an existing
    * fulltext index's set — same length and same members, not mere
    * overlap ("not allowed to use the same column",
    * `pkg/fulltext/plugin/plan/schema.go:77-95`; golden accepts
    * `(json1)` then `(json1, json2)` at `fulltext.result:285-291`,
    * rejects a second `(body, title)` at `:46`). MATCH over a table
    * with registered indexes requires one whose column set matches.
    * Tables with NO registered index build postings on demand — the
    * programmatic convenience surface.
    */
  private val ftIndexCols = TrieMap[String, Vector[(String, Set[String], String)]]()
  private def ftKey(spark: SparkSession, table: String) =
    s"${System.identityHashCode(spark.sharedState)}#${table.toLowerCase}"

  private val CreateFtRe =
    ("""(?is)^create\s+fulltext\s+index\s+`?(\w+)`?\s+on\s+(?:`?\w+`?\.)?`?(\w+)`?""" +
      """\s*\(([^)]*)\)\s*(?:with\s+parser\s+(\w+))?\s*$""").r
  private val AlterFtRe =
    ("""(?is)^alter\s+table\s+(?:`?\w+`?\.)?`?(\w+)`?\s+add\s+fulltext\s+index\s+""" +
      """`?(\w+)`?\s*\(([^)]*)\)\s*(?:with\s+parser\s+(\w+))?\s*$""").r

  private def ftCols(txt: String): Set[String] =
    splitTop(txt).map(_.trim.stripPrefix("`").stripSuffix("`").toLowerCase)
      .filter(_.nonEmpty).toSet

  private def fulltextDdlRewrite(spark: SparkSession, q: String): Option[DataFrame] = {
    import spark.implicits._
    def register(table: String, name: String, cols: Set[String],
        parser: String): DataFrame = {
      val key = ftKey(spark, table)
      val existing = ftIndexCols.getOrElse(key, Vector.empty)
      if (existing.exists(_._2 == cols))
        throw new IllegalArgumentException(
          "not supported: Fulltext index are not allowed to use the same column")
      ftIndexCols.put(key, existing :+ ((name, cols, Option(parser).getOrElse("").toLowerCase)))
      Seq((name, table, cols.mkString(","), "created"))
        .toDF("index_name", "table_name", "columns", "status")
    }
    q match {
      case CreateFtRe(name, table, colsTxt, parser) =>
        Some(register(table, name, ftCols(colsTxt), parser))
      case AlterFtRe(table, name, colsTxt, parser) =>
        Some(register(table, name, ftCols(colsTxt), parser))
      case _ => None
    }
  }

  // ------------------------------------------------------------------
  // PREPARE name FROM 'sql' / EXECUTE name [USING @a, ...] /
  // DEALLOCATE PREPARE name / SET @var = expr
  // ------------------------------------------------------------------

  private val preparedStmts = TrieMap[String, String]()
  private val userVars = TrieMap[String, String]()
  private def sessKey(spark: SparkSession, name: String): String =
    s"${System.identityHashCode(spark.sharedState)}#${name.toLowerCase}"
  private def userVarLit(spark: SparkSession, name: String): String =
    userVars.getOrElse(sessKey(spark, name), "NULL")

  /** Body of a prepared statement, if registered (e.g. for a conformance
    * harness that needs to know which table an EXECUTE touches).
    */
  def preparedBody(spark: SparkSession, name: String): Option[String] =
    preparedStmts.get(sessKey(spark, name))

  /** Per-session relevancy algorithm for MATCH scoring — the
    * reference's `SET ft_relevancy_algorithm = "TF-IDF"|"BM25"`
    * (`test/distributed/cases/fulltext/fulltext.sql:7`).
    */
  private val ftAlgo = TrieMap[Int, String]()
  private val FtAlgoRe =
    """(?is)^set\s+ft_relevancy_algorithm\s*=\s*["']?([\w-]+)["']?$""".r
  private def sessionAlgo(spark: SparkSession): String =
    ftAlgo.getOrElse(System.identityHashCode(spark.sharedState), "bm25")

  private val PrepareRe = """(?is)^prepare\s+(\w+)\s+from\s+(.+)$""".r
  private val ExecuteRe = """(?is)^execute\s+(\w+)(?:\s+using\s+(.+))?$""".r
  private val DeallocRe = """(?is)^deallocate\s+(?:prepare\s+)?(\w+)$""".r
  private val SetVarRe = """(?is)^set\s+(@\w.*)$""".r

  /** Render a driver-side value as a SQL literal for `?` / `@var`
    * substitution.
    */
  private def sqlLit(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case d: java.sql.Date => s"DATE '$d'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case b: Array[Byte] => "X'" + b.map("%02X".format(_)).mkString + "'"
    case x: java.math.BigDecimal => x.toPlainString
    case x => x.toString
  }

  /** Replace tokens introduced by `marker` (`"@"` names or `"?"`
    * placeholders) outside single/double-quoted literals and backticks.
    * `@@system` variables are left untouched.
    */
  private def substituteOutsideQuotes(
      q: String, marker: String, resolve: String => String): String = {
    val sb = new StringBuilder
    var i = 0
    var quote: Char = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (quote != 0) {
        sb.append(c)
        if (c == '\\' && i + 1 < q.length && quote != '`') {
          sb.append(q.charAt(i + 1)); i += 1
        } else if (c == quote) quote = 0
        i += 1
      } else if (c == '\'' || c == '"' || c == '`') {
        quote = c; sb.append(c); i += 1
      } else if (marker == "?" && c == '?') {
        sb.append(resolve("?")); i += 1
      } else if (marker == "@" && c == '@' &&
          i + 1 < q.length && q.charAt(i + 1) != '@' &&
          (i == 0 || q.charAt(i - 1) != '@') &&
          q.charAt(i + 1).isUnicodeIdentifierPart) {
        var j = i + 1
        while (j < q.length && (q.charAt(j).isUnicodeIdentifierPart ||
          q.charAt(j) == '_')) j += 1
        sb.append(resolve(q.substring(i + 1, j)))
        i = j
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** MySQL prepared-statement surface (reference
    * `test/distributed/cases/prepare/prepare.test`; wire-protocol
    * prepare in `pkg/frontend/mysql_cmd_executor.go`): PREPARE stores
    * the text, EXECUTE substitutes `?` placeholders with the USING
    * variables' SET-time values and re-enters [[sql]], so a prepared
    * reference-dialect statement (MATCH, interval, sample) still hits
    * its rewrite. SET @v evaluates the RHS eagerly to a literal.
    */
  private def prepareRewrite(spark: SparkSession, q: String): Option[DataFrame] =
    q match {
      case FtAlgoRe(algo) =>
        ftAlgo.put(System.identityHashCode(spark.sharedState),
          algo.toLowerCase.replace("-", "")) // "TF-IDF" → "tfidf"
        Some(spark.emptyDataFrame)
      case PrepareRe(name, bodyRaw) =>
        val b = bodyRaw.trim
        val body =
          if (b.length >= 2 && (b.head == '\'' || b.head == '"') && b.last == b.head)
            b.substring(1, b.length - 1)
              .replace("\\" + b.head, b.head.toString)
              .replace("" + b.head + b.head, b.head.toString)
          else b
        preparedStmts.put(sessKey(spark, name), body)
        Some(spark.emptyDataFrame)
      case ExecuteRe(name, usingOrNull) =>
        val body = preparedStmts.getOrElse(sessKey(spark, name),
          throw new IllegalStateException(
            s"prepared statement '$name' does not exist"))
        val params = Option(usingOrNull).toSeq
          .flatMap(u => splitTop(u)).map(_.trim).map {
            case v if v.startsWith("@") => userVarLit(spark, v.drop(1))
            case v => v // literal argument
          }
        val it = params.iterator
        val bound = substituteOutsideQuotes(body, "?",
          _ => if (it.hasNext) it.next()
          else throw new IllegalArgumentException(
            s"not enough USING parameters for '$name'"))
        Some(sql(spark, bound))
      case DeallocRe(name) =>
        preparedStmts.remove(sessKey(spark, name))
        Some(spark.emptyDataFrame)
      case SetVarRe(assigns) =>
        splitTop(assigns).foreach { a =>
          """(?is)^\s*@(\w+)\s*:?=\s*(.+)$""".r.findFirstMatchIn(a).foreach { m =>
            val rhs = substituteOutsideQuotes(
              m.group(2).trim, "@", n => userVarLit(spark, n))
            val v =
              try sqlLit(spark.sql(s"SELECT $rhs").collect().head.get(0))
              catch { case _: Exception => "NULL" } // e.g. @@sysvar RHS
            userVars.put(sessKey(spark, m.group(1)), v)
          }
        }
        Some(spark.emptyDataFrame)
      case _ => None
    }

  // ------------------------------------------------------------------
  // CREATE INDEX name USING {IVFFLAT|HNSW|IVFPQ} ON tbl(col) [options]
  // ------------------------------------------------------------------

  private val CreateIndexRe =
    ("""(?is)^create\s+index\s+(`?\w+`?)\s+using\s+(ivfflat|hnsw|ivfpq)\s+""" +
      """on\s+([A-Za-z_]\w*)\s*\(\s*([A-Za-z_]\w*)\s*\)\s*(.*)$""").r
  /** Unquoted reserved words are a parse error in the reference
    * (`vector_index.result`: `create index add using ivfflat` fails,
    * backticked it works). The regex accepts both; reject bare keywords.
    */
  private val ReservedIndexNames =
    Set("add", "index", "key", "primary", "select", "from", "where", "using")
  private val DropIndexRe =
    """(?is)^drop\s+index\s+(\w+)(?:\s+on\s+([A-Za-z_]\w*))?$""".r

  /** The reference's vector-index DDL (`create index ... using ivfflat on
    * t(col) lists=N op_type "vector_l2_ops"`, BVT
    * `cases/vector/vector_ivfflat_*.sql`; HNSW params `m/ef_construction/
    * ef_search`, `pkg/vectorindex/hnsw/`). Builds + registers the index
    * through the same registries the ANN planner rules probe
    * ([[graft.plans.IvfAnnRule]]), so a subsequent plain
    * `ORDER BY l2_distance(col, array(...)) LIMIT k` takes the index —
    * exactly the reference's `ivf_create` once / `ivf_search` per query
    * split (`table_function.go:180-201`). `include(...)` carry columns
    * are accepted and ignored: the probe here always joins back to the
    * source row, so every column is available. Metric comes from the
    * QUERY (the rule matches l2/cosine sorts); `op_type` is validated
    * but not stored.
    */
  private def indexDdlRewrite(spark: SparkSession, q: String): Option[DataFrame] = {
    import spark.implicits._
    q match {
      case CreateIndexRe(nameRaw, method, table, vecCol, optsTxt) =>
        // bare reserved words are a parse error in the reference;
        // backticked they are legal identifiers (vector_index.result)
        if (!nameRaw.startsWith("`") && ReservedIndexNames(nameRaw.toLowerCase))
          throw new IllegalArgumentException(
            s"SQL parser error: syntax error near '$nameRaw'")
        val name = nameRaw.stripPrefix("`").stripSuffix("`")
        val opts = parseIndexOpts(optsTxt)
        val df0 = spark.table(table)
        require(df0.columns.contains(vecCol), s"no column $vecCol on $table")
        // the reference rejects non-vector columns; NULL vectors are
        // simply absent from the index
        df0.schema(vecCol).dataType match {
          case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType |
            org.apache.spark.sql.types.DoubleType, _) =>
          case other => throw new IllegalArgumentException(
            s"not supported: vector index on column type ${other.simpleString}")
        }
        // an empty corpus (or all-NULL vector column) builds no cells;
        // queries simply keep the exact plan (reference builds an empty
        // index and scans, vector_index.result:97-98,183-186). More
        // centroids than rows would also break the kmeans — clamp.
        // NOTE: the index registries match user queries by the TABLE's
        // canonicalized plan, so the unfiltered df0 is what we register;
        // null-vector rows are dropped inside the build itself.
        val df = df0
        val nRows = df0.filter(col(vecCol).isNotNull).count()
        if (nRows == 0)
          return Some(Seq((name, table, vecCol, method.toLowerCase, "created"))
            .toDF("index_name", "table_name", "column_name", "method", "status"))
        def clamp(v: Int): Int = math.max(1, math.min(v, nRows).toInt)
        val pk = primaryKeys.getOrElse(table, df.columns.head)
        def iOpt(k: String, dflt: Int) = opts.get(k).map(_.toInt).getOrElse(dflt)
        val key = s"$name-$table-$vecCol"
        // one name per table (the reference errors on re-use,
        // vector_index.result: "duplicate key name 'idx01'")
        val prefix = s"$name-$table-"
        if ((graft.plans.IvfIndex.indexes.map(_.name) ++
          graft.plans.HnswIndex.indexes.map(_.name) ++
          graft.plans.IvfPqIndex.indexes.map(_.name)).exists(_.startsWith(prefix)))
          throw new IllegalArgumentException(s"duplicate key name '$name'")
        method.toLowerCase match {
          case "ivfflat" =>
            graft.plans.IvfIndex.forCorpus(key, df, vecCol,
              nlist = clamp(iOpt("lists", 16)), nprobe = iOpt("nprobe", 4))
          case "hnsw" =>
            graft.plans.HnswIndex.forCorpus(key, df, pk, vecCol,
              m = iOpt("m", 16), efConstruction = iOpt("ef_construction", 100),
              efSearch = iOpt("ef_search", 64))
          case "ivfpq" =>
            graft.plans.IvfPqIndex.forCorpus(key, df, pk, vecCol,
              nlist = iOpt("lists", 16), mSub = iOpt("m", 8),
              codebookSize = iOpt("codebook", 16), nprobe = iOpt("nprobe", 8))
        }
        Some(Seq((name, table, vecCol, method.toLowerCase, "created"))
          .toDF("index_name", "table_name", "column_name", "method", "status"))
      case DropIndexRe(name, tableOrNull) =>
        val table = Option(tableOrNull)
        val prefix = table.map(t => s"$name-$t-").getOrElse(s"$name-")
        val dropped =
          (graft.plans.IvfIndex.indexes.map(_.name) ++
            graft.plans.HnswIndex.indexes.map(_.name) ++
            graft.plans.IvfPqIndex.indexes.map(_.name))
            .filter(n => n == name || n.startsWith(prefix)).distinct
        dropped.foreach { n =>
          graft.plans.IvfIndex.drop(n)
          graft.plans.HnswIndex.drop(n)
          graft.plans.IvfPqIndex.drop(n)
        }
        Some(Seq((name, if (dropped.nonEmpty) "dropped" else "not found"))
          .toDF("index_name", "status"))
      case _ => None
    }
  }

  /** `lists=2 m=16 ef_construction=100 op_type "vector_l2_ops"
    * include(a, b)` → key/value map (include list and op_type validated,
    * then dropped).
    */
  private def parseIndexOpts(txt: String): Map[String, String] = {
    // both `lists=2` and the bare `LISTS 2` form appear in the corpus
    val kv = """(?i)(\w+)\s*=?\s*(\d+)""".r.findAllMatchIn(txt)
      .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
    """(?i)op_type\s*=?\s*["']?(\w+)["']?""".r.findFirstMatchIn(txt).foreach { m =>
      val ot = m.group(1).toLowerCase
      require(ot.startsWith("vector_"), s"unknown op_type $ot")
    }
    kv
  }

  // ------------------------------------------------------------------
  // interval(ts, N, unit) [sliding(M, unit)] [fill(mode[, value])]
  // ------------------------------------------------------------------

  private val IntervalRe =
    """(?is)^\s*select\s+(.*?)\s+from\s+(.*?)\s*\binterval\s*\(\s*([A-Za-z_][\w.]*)\s*,\s*(\d+)\s*,\s*(\w+)\s*\)\s*(.*)$""".r
  private val SlidingRe = """(?is)^sliding\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)\s*(.*)$""".r
  private val FillRe =
    """(?is)^fill\s*\(\s*(prev|next|none|null|linear|value\s*,\s*(-?[\d.]+))\s*\)\s*(.*)$""".r

  private def unitSeconds(u: String): Long = u.toLowerCase match {
    case "second" | "seconds" => 1L
    case "minute" | "minutes" => 60L
    case "hour" | "hours" => 3600L
    case "day" | "days" => 86400L
    case other => throw new IllegalArgumentException(
      s"interval(): unsupported unit '$other' (second|minute|hour|day)")
  }

  /** Split a select list on top-level commas (paren-aware). */
  private[graft] def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var inStr = false
    val cur = new StringBuilder
    for (c <- s) c match {
      case '\'' => inStr = !inStr; cur += c
      case '(' if !inStr => depth += 1; cur += c
      case ')' if !inStr => depth -= 1; cur += c
      case ',' if depth == 0 && !inStr => out += cur.toString.trim; cur.clear()
      case _ => cur += c
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.result()
  }

  private def intervalRewrite(spark: SparkSession, q: String): Option[DataFrame] =
    IntervalRe.findFirstMatchIn(q).map { m =>
      val (selectList, fromPart, tsCol, n, unit) =
        (m.group(1), m.group(2), m.group(3), m.group(4).toLong, m.group(5))
      var rest = m.group(6).trim
      var widthSec = n * unitSeconds(unit)
      var stepSec = widthSec
      rest match {
        case SlidingRe(sn, su, tail) =>
          stepSec = sn.toLong * unitSeconds(su)
          rest = tail.trim
        case _ =>
      }
      var fill: TimeWindow.FillMode = TimeWindow.FillNone
      rest match {
        case FillRe(mode, value, tail) =>
          fill = mode.toLowerCase.takeWhile(_.isLetter) match {
            case "prev" => TimeWindow.FillPrev
            case "next" => TimeWindow.FillNext
            case "none" => TimeWindow.FillNone
            case "null" => TimeWindow.FillNull
            case "linear" => TimeWindow.FillLinear
            case "value" => TimeWindow.FillValue(value.toDouble)
          }
          rest = tail.trim
        case _ =>
      }

      // rewrite the select list onto the standard window() group:
      // _wstart/_wend come from the window struct; everything else is a
      // grouped aggregate and passes through verbatim
      val items = splitTop(selectList)
      val mapped = items.map { it =>
        val lower = it.toLowerCase
        if (lower == "_wstart") "window.start AS _wstart"
        else if (lower == "_wend") "window.end AS _wend"
        else it
      }
      // always carry _wstart internally: the fill stage needs the spine.
      // Repeated select items (e.g. `_wstart, ..., _wstart`) collapse to
      // one grouped column — the final projection re-duplicates by name
      val withStart =
        (if (items.exists(_.equalsIgnoreCase("_wstart"))) mapped
         else "window.start AS _wstart" +: mapped).distinct
      // startTime aligns the window grid to the reference's Datetime
      // origin (0001-01-01) — see TimeWindow.moOffsetSec
      val offsetSec = TimeWindow.moOffsetSec(stepSec)
      val grouped = spark.sql(
        s"""SELECT ${withStart.mkString(", ")}
           |FROM $fromPart
           |GROUP BY window($tsCol, '$widthSec seconds', '$stepSec seconds', '$offsetSec seconds')""".stripMargin)

      val outCols = items.map(itemName)
      val filled =
        if (fill == TimeWindow.FillNone) grouped
        else {
          val valueCols = grouped.columns
            .filterNot(c => c == "_wstart" || c == "_wend").toSeq
          var d = grouped
            .withColumn("_ws", unix_timestamp(col("_wstart")).cast("long"))
            .drop("_wstart", "_wend")
          // one fill pass per agg column over the same (aggregated,
          // already tiny per slot) frame — see TimeWindow.gapFill for the
          // bucketed scale path each pass takes
          for (vc <- valueCols)
            d = TimeWindow.gapFill(d, "_ws", stepSec, vc, fill)
          // windows advance by the slide but each spans the full width
          d.withColumn("_wstart", timestamp_seconds(col("_ws")))
            .withColumn("_wend", timestamp_seconds(col("_ws") + widthSec))
            .drop("_ws")
        }
      val projected = filled.select(outCols.map(col): _*)
      applySuffix(spark, projected, rest)
    }

  /** Output name of a select-list item (alias, or Spark's natural name). */
  private def itemName(item: String): String = {
    val AliasRe = """(?is)^.*\s+as\s+([A-Za-z_]\w*)\s*$""".r
    item match {
      case AliasRe(a) => a
      case _ => item.trim
    }
  }

  /** Apply a trailing `ORDER BY ... / LIMIT ...` suffix, if present, by
    * round-tripping through a temp view (keeps this layer parser-free).
    */
  private def applySuffix(spark: SparkSession, df: DataFrame, suffix: String): DataFrame =
    if (suffix.isEmpty) df
    else {
      val v = s"_graft_sql_${viewSeq.incrementAndGet()}"
      df.createOrReplaceTempView(v)
      spark.sql(s"SELECT * FROM $v $suffix")
    }

  // ------------------------------------------------------------------
  // sample(expr, N rows | K percent)
  // ------------------------------------------------------------------

  private val SampleRe =
    """(?is)^\s*select\s+(.*?)\s+from\s+(.*)$""".r
  private val SampleCallRe =
    """(?is)sample\s*\(\s*(.+?)\s*,\s*(\d+(?:\.\d+)?)\s+(rows?|percent)\s*\)(?:\s+as\s+([A-Za-z_]\w*))?""".r

  /** Deterministic per-group sample: the reference's reservoir pool
    * (`pkg/sql/colexec/sample/samplePool.go`) is random; this surface
    * determinizes it by ranking on md5 of the sampled value so the same
    * rows come back on any engine/partitioning (what an oracle — and a
    * reproducible training-data pipeline — needs). NULL semantics match the
    * reference's results file: samples draw from non-null values; a
    * group with only nulls yields one NULL row.
    */
  private def sampleRewrite(spark: SparkSession, q: String): Option[DataFrame] = {
    val call = SampleCallRe.findFirstMatchIn(q)
    if (call.isEmpty) return None
    val c = call.get
    val expr0 = c.group(1)
    val amount = c.group(2)
    val kind = c.group(3).toLowerCase
    val alias = Option(c.group(4)).getOrElse("sample_col")

    val m = SampleRe.findFirstMatchIn(q).getOrElse(
      throw new IllegalArgumentException("sample(): unsupported query shape"))
    val selectList = m.group(1)
    var fromRest = m.group(2).trim

    // peel trailing ORDER BY / LIMIT, then GROUP BY, off the FROM tail
    var suffix = ""
    val OrderRe = """(?is)^(.*?)\s+(order\s+by\s+.*)$""".r
    fromRest match {
      case OrderRe(pre, tail) => fromRest = pre.trim; suffix = tail.trim
      case _ =>
    }
    var groupCols = Seq.empty[String]
    val GroupRe = """(?is)^(.*?)\s+group\s+by\s+(.*)$""".r
    fromRest match {
      case GroupRe(pre, cols) =>
        fromRest = pre.trim; groupCols = splitTop(cols)
      case _ =>
    }

    // non-sample select items must be group columns (reference rule)
    val others = splitTop(selectList).filterNot(SampleCallRe.findFirstIn(_).isDefined)
    val partBy =
      if (groupCols.nonEmpty) s"PARTITION BY ${groupCols.mkString(", ")}"
      else ""
    val keep = kind match {
      case "percent" =>
        s"(_nn > 0 AND $alias IS NOT NULL AND _rn <= ceil(_nn * $amount / 100.0)) OR (_nn = 0 AND _rn = 1)"
      case _ =>
        s"(_nn > 0 AND $alias IS NOT NULL AND _rn <= $amount) OR (_nn = 0 AND _rn = 1)"
    }
    val proj = (others :+ alias).mkString(", ")
    val inner =
      s"""SELECT ${(others :+ s"($expr0) AS $alias").mkString(", ")},
         |  row_number() OVER ($partBy
         |    ORDER BY (($expr0) IS NULL), md5(CAST(($expr0) AS STRING))) AS _rn,
         |  count(($expr0)) OVER ($partBy) AS _nn
         |FROM $fromRest""".stripMargin
    val sampled = spark.sql(
      s"SELECT $proj FROM (\n$inner\n) WHERE $keep")
    Some(applySuffix(spark, sampled, suffix))
  }

  // ------------------------------------------------------------------
  // MATCH(col) AGAINST('q' [IN ... MODE]) — scored, projection + WHERE
  // ------------------------------------------------------------------

  private val MatchRe =
    """(?is)match\s*\(\s*([A-Za-z_][\w.]*(?:\s*,\s*[A-Za-z_][\w.]*)*)\s*\)\s*against\s*\(\s*'([^']*)'\s*(in\s+boolean\s+mode|in\s+natural\s+language\s+mode)?\s*\)""".r
  private val FromRe =
    """(?is)\bfrom\s+([A-Za-z_]\w*)(\s+(?:as\s+)?(?!where\b|group\b|order\b|limit\b|left\b|right\b|inner\b|join\b|on\b)([A-Za-z_]\w*))?""".r

  /** Rewrites every MATCH…AGAINST into a reference to a LEFT-JOINed
    * score table computed by [[Bm25.matchAgainst]] against the cached
    * postings index — scored in projections (MySQL relevance value,
    * 0 for non-matches), a `score IS NOT NULL` predicate in boolean
    * contexts (MySQL's "relevance > 0" WHERE semantics).
    */
  private def matchRewrite(spark: SparkSession, q: String): Option[DataFrame] = {
    val hits = MatchRe.findAllMatchIn(q).toList
    if (hits.isEmpty) return None

    val from = FromRe.findFirstMatchIn(q).getOrElse(
      throw new IllegalArgumentException("MATCH(): single-table FROM required"))
    val table = from.group(1)
    val tblRef = Option(from.group(3)).getOrElse(table)
    val pk = primaryKeys.getOrElse(table, spark.table(table).columns.head)

    // one score view per distinct (cols, query, mode)
    val distinctCalls = hits.map(h =>
      (h.group(1), h.group(2), Option(h.group(3)).exists(_.toLowerCase.contains("boolean"))))
      .distinct
    val views = distinctCalls.zipWithIndex.map { case ((colsTxt, query, bool), i) =>
      // MATCH(col1, col2, ...) scores over ONE combined index across all
      // listed columns (the reference concatenates them at tokenize time,
      // fulltext_tokenize.go:142-150)
      val textCols = splitTop(colsTxt).map(_.trim.split('.').last)
      // once the table has DDL-registered fulltext indexes, the
      // reference's rules apply: the MATCH columns must equal one
      // index's column set; the index's parser picks the tokenizer
      // (query-side parsing is parser-independent except gojieba —
      // `ParsePatternInNLMode`, fulltext.go:919-923)
      val tokenizer = ftIndexCols.get(ftKey(spark, table)).map { idxs =>
        val want = textCols.map(_.toLowerCase).toSet
        val hit = idxs.find(_._2 == want).getOrElse(
          throw new IllegalStateException(
            "not supported: MATCH() AGAINST() cannot be replaced by FULLTEXT INDEX " +
              s"(no fulltext index on (${textCols.mkString(", ")}))"))
        hit._3 match {
          case "" | "default" => "simple"
          case "json" => "json"
          case "gojieba" => "chinese"
          case other => throw new UnsupportedOperationException(
            s"UNSUPPORTED_FEATURE: fulltext parser '$other' on the SQL MATCH surface")
        }
      }.getOrElse("simple")
      // key the cached postings index by the table's resolved plan, not
      // just its name — the same view name over different data must not
      // hit a stale index
      val planKey = spark.table(table).queryExecution.analyzed.semanticHash()
      val scores = Bm25.matchAgainstMulti(spark.table(table), pk, textCols, query,
          booleanMode = bool, cacheKey = s"$table#${textCols.mkString(",")}#$planKey",
          algo = sessionAlgo(spark), tokenizer = tokenizer)
        .withColumnRenamed("doc_id", "__ft_id")
      val v = s"_graft_ft_${viewSeq.incrementAndGet()}"
      scores.createOrReplaceTempView(v)
      ((colsTxt, query, bool), (v, i))
    }.toMap

    // replace occurrences innermost-text-first (they don't nest/overlap)
    val sb = new StringBuilder(q)
    for (h <- hits.reverse) {
      val key = (h.group(1), h.group(2),
        Option(h.group(3)).exists(_.toLowerCase.contains("boolean")))
      val (v, _) = views(key)
      val prefix = sb.substring(0, h.start)
      val isPredicate =
        """(?is).*\b(where|and|or|not|on)\s*\(?\s*$""".r.matches(prefix)
      val repl =
        if (isPredicate) s"($v.score IS NOT NULL)"
        else s"coalesce($v.score, CAST(0.0 AS DOUBLE))"
      sb.replace(h.start, h.end, repl)
    }

    // splice the JOINs right after the FROM table reference — found
    // again in the REWRITTEN text (the replacements above shifted
    // offsets). INNER join: the reference's index-apply filters
    // non-matching rows even for a projection-only MATCH (BVT
    // `fulltext.result:63-65` keeps just the matching doc)
    val joins = views.values.toSeq.sortBy(_._2).map { case (v, _) =>
      s" JOIN $v ON $tblRef.$pk = $v.__ft_id"
    }.mkString
    // a bare `SELECT *` must not pick up the joined score columns
    val replaced = sb.toString
      .replaceFirst("(?is)^\\s*select\\s+\\*", s"SELECT $tblRef.*")
    val from2 = FromRe.findFirstMatchIn(replaced).get
    val fromEnd = from2.start + from2.matched.length
    val rewritten = replaced.substring(0, fromEnd) + joins + replaced.substring(fromEnd)
    Some(spark.sql(rewritten))
  }
}
