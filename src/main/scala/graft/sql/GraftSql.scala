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
    val q = query.trim.stripSuffix(";").trim
    intervalRewrite(spark, q)
      .orElse(sampleRewrite(spark, q))
      .orElse(matchRewrite(spark, q))
      .orElse(indexDdlRewrite(spark, q))
      .getOrElse(spark.sql(q))
  }

  // ------------------------------------------------------------------
  // CREATE INDEX name USING {IVFFLAT|HNSW|IVFPQ} ON tbl(col) [options]
  // ------------------------------------------------------------------

  private val CreateIndexRe =
    ("""(?is)^create\s+index\s+(\w+)\s+using\s+(ivfflat|hnsw|ivfpq)\s+""" +
      """on\s+([A-Za-z_]\w*)\s*\(\s*([A-Za-z_]\w*)\s*\)\s*(.*)$""").r
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
      case CreateIndexRe(name, method, table, vecCol, optsTxt) =>
        val opts = parseIndexOpts(optsTxt)
        val df = spark.table(table)
        require(df.columns.contains(vecCol), s"no column $vecCol on $table")
        val pk = primaryKeys.getOrElse(table, df.columns.head)
        def iOpt(k: String, dflt: Int) = opts.get(k).map(_.toInt).getOrElse(dflt)
        val key = s"$name-$table-$vecCol"
        method.toLowerCase match {
          case "ivfflat" =>
            graft.plans.IvfIndex.forCorpus(key, df, vecCol,
              nlist = iOpt("lists", 16), nprobe = iOpt("nprobe", 4))
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
    val kv = """(?i)(\w+)\s*=\s*(\d+)""".r.findAllMatchIn(txt)
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
      var slideClause = ""
      rest match {
        case SlidingRe(sn, su, tail) =>
          stepSec = sn.toLong * unitSeconds(su)
          slideClause = s", '${sn.toLong * unitSeconds(su)} seconds'"
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
      // always carry _wstart internally: the fill stage needs the spine
      val withStart =
        if (items.exists(_.equalsIgnoreCase("_wstart"))) mapped
        else "window.start AS _wstart" +: mapped
      val grouped = spark.sql(
        s"""SELECT ${withStart.mkString(", ")}
           |FROM $fromPart
           |GROUP BY window($tsCol, '$widthSec seconds'$slideClause)""".stripMargin)

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
          d.withColumn("_wstart", timestamp_seconds(col("_ws")))
            .withColumn("_wend", timestamp_seconds(col("_ws") + stepSec))
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
      // key the cached postings index by the table's resolved plan, not
      // just its name — the same view name over different data must not
      // hit a stale index
      val planKey = spark.table(table).queryExecution.analyzed.semanticHash()
      val scores = Bm25.matchAgainstMulti(spark.table(table), pk, textCols, query,
          booleanMode = bool, cacheKey = s"$table#${textCols.mkString(",")}#$planKey")
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

    // splice the LEFT JOINs right after the FROM table reference — found
    // again in the REWRITTEN text (the replacements above shifted offsets)
    val joins = views.values.toSeq.sortBy(_._2).map { case (v, _) =>
      s" LEFT JOIN $v ON $tblRef.$pk = $v.__ft_id"
    }.mkString
    val replaced = sb.toString
    val from2 = FromRe.findFirstMatchIn(replaced).get
    val fromEnd = from2.start + from2.matched.length
    val rewritten = replaced.substring(0, fromEnd) + joins + replaced.substring(fromEnd)
    Some(spark.sql(rewritten))
  }
}
