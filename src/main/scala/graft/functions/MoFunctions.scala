package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** MySQL-dialect scalar functions the reference exposes that Spark lacks
  * (registry: reference `pkg/sql/plan/function/list_builtIn.go`;
  * 562 ids in `function_id.go:809`). Spark built-ins cover most families
  * (SURVEY §2.13) — this module fills the gaps as *expression combinators*
  * (stay inside whole-stage codegen; no UDF serialization) and registers
  * SQL names for `spark.sql` users via `registerAll`.
  */
object MoFunctions {

  // ----------------------------------------------------------- strings
  /** ELT(n, e1, e2, ...): n-th string (1-based), NULL out of range. */
  def elt(n: Column, options: Seq[Column]): Column =
    element_at(array(options: _*), n.cast("int"))

  /** FIELD(e, e1, e2, ...): 1-based index of e, 0 if absent. */
  /** FIELD compares numerically when values coerce (field(1, 1.0) = 1)
    * and case-insensitively on strings (MySQL ci collation;
    * `func_field.result` pins field('aa','AA') = 1). A NULL needle is
    * always 0.
    */
  def field(e: Column, options: Seq[Column]): Column = {
    val hits = options.zipWithIndex.map { case (o, k) =>
      when((o <=> e) ||
        (lower(o.cast("string")) <=> lower(e.cast("string"))), lit(k + 1L))
    }
    when(e.isNull, 0L).otherwise(coalesce(hits :+ lit(0L): _*))
  }

  /** INSERT(str, pos, len, newstr) — MySQL string splice (1-based). */
  def insertStr(str: Column, pos: Column, len: Column, newstr: Column): Column =
    when(pos < 1 || pos > length(str), str)
      .otherwise(concat(
        str.substr(lit(1), (pos - 1).cast("int")),
        newstr,
        str.substr((pos + len).cast("int"), length(str))))

  /** MAKE_SET(bits, s1, s2, ...): comma-join of strings whose bit is set. */
  def makeSet(bits: Column, options: Seq[String]): Column =
    concat_ws(",", filter(
      zip_with(array(options.map(lit): _*),
        sequence(lit(0), lit(options.size - 1)),
        (s, i) => when(bits.cast("long")
          .bitwiseAND(pow(lit(2), i).cast("long")) =!= 0, s).otherwise(lit(null))),
      x => x.isNotNull))

  /** EXPORT_SET(bits, on, off, sep, n). */
  def exportSet(bits: Column, on: String, off: String, sep: String, n: Int): Column =
    concat_ws(sep, transform(sequence(lit(0), lit(n - 1)), i =>
      when(bits.cast("long").bitwiseAND(pow(lit(2), i).cast("long")) =!= 0,
        lit(on)).otherwise(lit(off))))

  /** QUOTE(s): single-quoted with backslash escaping (MySQL semantics). */
  def quote(s: Column): Column =
    concat(lit("'"),
      regexp_replace(regexp_replace(s, "\\\\", "\\\\\\\\"), "'", "\\\\'"),
      lit("'"))

  /** SUBSTRING_INDEX is built-in; LEFT/RIGHT/REPEAT etc. are built-in. */

  // ----------------------------------------------------------- datetime
  /** Translate a MySQL date-format pattern to a JVM DateTimeFormatter
    * pattern (`%Y-%m-%d %H:%i:%s` → `yyyy-MM-dd HH:mm:ss`).
    */
  def mysqlFormatToJava(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' => sb.append("yyyy"); case 'y' => sb.append("yy")
          case 'm' => sb.append("MM");   case 'c' => sb.append("M")
          case 'd' => sb.append("dd");   case 'e' => sb.append("d")
          case 'H' => sb.append("HH");   case 'k' => sb.append("H")
          case 'h' | 'I' => sb.append("hh")
          case 'i' => sb.append("mm")
          case 's' | 'S' => sb.append("ss")
          case 'f' => sb.append("SSSSSS")
          case 'p' => sb.append("a")
          case 'W' => sb.append("EEEE"); case 'a' => sb.append("EEE")
          case 'M' => sb.append("MMMM"); case 'b' => sb.append("MMM")
          case 'j' => sb.append("DDD")
          case '%' => sb.append("%")
          case other => sb.append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** MySQL DATE_FORMAT. */
  def moDateFormat(ts: Column, mysqlFmt: String): Column =
    date_format(ts, mysqlFormatToJava(mysqlFmt))

  /** MySQL STR_TO_DATE (timestamp result). */
  def moStrToDate(s: Column, mysqlFmt: String): Column =
    to_timestamp(s, mysqlFormatToJava(mysqlFmt))

  /** TO_DAYS: days since year 0 (MySQL convention: TO_DAYS('1970-01-01')
    * = 719528).
    */
  def toDays(d: Column): Column =
    (datediff(d, to_date(lit("1970-01-01"))) + 719528).cast("long")

  /** FROM_DAYS: inverse of toDays. */
  def fromDays(n: Column): Column =
    date_add(to_date(lit("1970-01-01")), (n - 719528).cast("int"))

  /** PERIOD_ADD(yyyymm, n months). */
  def periodAdd(p: Column, n: Column): Column = {
    val months = (p / 100).cast("long") * 12 + (p % 100) - 1 + n
    ((months / 12).cast("long") * 100 + (months % 12) + 1).cast("long")
  }

  /** PERIOD_DIFF(p1, p2) in months. */
  def periodDiff(p1: Column, p2: Column): Column =
    (((p1 / 100).cast("long") * 12 + (p1 % 100)) -
      ((p2 / 100).cast("long") * 12 + (p2 % 100))).cast("long")

  /** YEARWEEK — MySQL default mode 0 (reference
    * `pkg/container/types/date.go:893` `YearWeek`, i.e. MySQL calc_week
    * with WeekYear): weeks start Sunday; week 1 is the first week that
    * begins in the year (days before the year's first Sunday belong to
    * the previous year's week 52/53). Closed form verified against a
    * transcription of the reference algorithm over 1970–2060: with
    * ws = the Sunday on/before d, YEARWEEK = year(ws)*100 + (weeks from
    * the first Sunday of year(ws) to ws) + 1.
    */
  def yearweek(d: Column): Column = {
    val ws = date_sub(d, dayofweek(d) - lit(1))
    val jan1 = trunc(ws, "year")
    val firstSun = date_add(jan1, (lit(8) - dayofweek(jan1)) % 7)
    (year(ws).cast("long") * 100 +
      floor(datediff(ws, firstSun) / lit(7)).cast("long") + 1)
  }

  /** YEARWEEK ISO variant (MySQL mode 3: Monday-start ISO 8601 weeks). */
  def yearweekIso(d: Column): Column =
    (extract(lit("YEAROFWEEK"), d).cast("long") * 100 + weekofyear(d)).cast("long")

  /** SEC_TO_TIME(n) → 'HH:MM:SS' (MySQL TIME rendering). Hours are
    * zero-padded to 2 but never truncated (360001 → '100:00:01'), and
    * negative totals render with a leading '-' ('-00:00:01'), matching
    * MySQL.
    */
  def secToTime(n: Column): Column = {
    val total = n.cast("long")
    val s = abs(total)
    val hh = (s / 3600).cast("long").cast("string")
    val body = concat(
      when(length(hh) < 2, lpad(hh, 2, "0")).otherwise(hh), lit(":"),
      lpad(((s % 3600) / 60).cast("long").cast("string"), 2, "0"), lit(":"),
      lpad((s % 60).cast("string"), 2, "0"))
    when(total < 0, concat(lit("-"), body)).otherwise(body)
  }

  /** TIME_TO_SEC('HH:MM:SS') — inverse of secToTime. A leading '-'
    * negates the WHOLE value ('-01:30:00' → -5400), per MySQL; the
    * sign is not just applied to the hours field.
    */
  def timeToSec(t: Column): Column = {
    val neg = substring(t, 1, 1) === "-"
    val u = when(neg, substring(t, 2, 1000000)).otherwise(t)
    val p = split(u, ":")
    val total = element_at(p, 1).cast("long") * 3600 +
      element_at(p, 2).cast("long") * 60 + element_at(p, 3).cast("long")
    when(neg, -total).otherwise(total)
  }

  /** MAKETIME(h, m, s). */
  def makeTime(h: Column, m: Column, s: Column): Column =
    concat(lpad(h.cast("long").cast("string"), 2, "0"), lit(":"),
      lpad(m.cast("long").cast("string"), 2, "0"), lit(":"),
      lpad(s.cast("long").cast("string"), 2, "0"))

  /** ADDTIME(t, delta) / SUBTIME on 'HH:MM:SS' strings. */
  def addTime(t: Column, delta: Column): Column =
    secToTime(timeToSec(t) + timeToSec(delta))
  def subTime(t: Column, delta: Column): Column =
    secToTime(timeToSec(t) - timeToSec(delta))

  /** TIMEDIFF(ts1, ts2) → signed 'HH:MM:SS' of the timestamp delta
    * (MySQL renders negative diffs with a leading '-').
    */
  def timeDiff(ts1: Column, ts2: Column): Column = {
    val secs = unix_timestamp(ts1) - unix_timestamp(ts2)
    when(secs < 0, concat(lit("-"), secToTime(-secs))).otherwise(secToTime(secs))
  }

  /** GET_FORMAT(type, standard) → MySQL format pattern (static lookup,
    * MySQL reference table).
    */
  def getFormat(kind: String, standard: String): Option[String] = {
    val key = (kind.toUpperCase, standard.toUpperCase)
    val table = Map(
      ("DATE", "USA") -> "%m.%d.%Y", ("DATE", "JIS") -> "%Y-%m-%d",
      ("DATE", "ISO") -> "%Y-%m-%d", ("DATE", "EUR") -> "%d.%m.%Y",
      ("DATE", "INTERNAL") -> "%Y%m%d",
      ("TIME", "USA") -> "%h:%i:%s %p", ("TIME", "JIS") -> "%H:%i:%s",
      ("TIME", "ISO") -> "%H:%i:%s", ("TIME", "EUR") -> "%H.%i.%s",
      ("TIME", "INTERNAL") -> "%H%i%s",
      ("DATETIME", "USA") -> "%Y-%m-%d %H.%i.%s",
      ("DATETIME", "JIS") -> "%Y-%m-%d %H:%i:%s",
      ("DATETIME", "ISO") -> "%Y-%m-%d %H:%i:%s",
      ("DATETIME", "EUR") -> "%Y-%m-%d %H.%i.%s",
      ("DATETIME", "INTERNAL") -> "%Y%m%d%H%i%s")
    table.get(key)
  }

  // -------------------------------------------------------------- inet6
  /** Parse an IPv6 literal (with :: compression and embedded IPv4) to 16
    * bytes; dotted-quad IPv4 to 4 bytes (MySQL INET6_ATON). Pure parser —
    * never touches the resolver.
    */
  def inet6AtonBytes(s: String): Array[Byte] = {
    if (s == null) return null
    if (!s.contains(':')) {
      val q = s.split("\\.")
      if (q.length != 4) return null
      val out = new Array[Byte](4)
      try {
        for (i <- 0 until 4) {
          val v = q(i).toInt
          if (v < 0 || v > 255) return null
          out(i) = v.toByte
        }
      } catch { case _: NumberFormatException => return null }
      return out
    }
    // IPv6: split on "::" (at most one), expand the gap with zero groups
    val dc = s.indexOf("::")
    if (dc >= 0 && s.indexOf("::", dc + 1) >= 0) return null
    def groups(part: String): Option[Array[Int]] = {
      if (part.isEmpty) return Some(Array.empty)
      val raw = part.split(":", -1)
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      for ((g, i) <- raw.zipWithIndex) {
        if (g.contains('.')) {
          // embedded IPv4 must be the final group
          if (i != raw.length - 1) return None
          val v4 = inet6AtonBytes(g)
          if (v4 == null || v4.length != 4) return None
          out += ((v4(0) & 0xff) << 8 | (v4(1) & 0xff))
          out += ((v4(2) & 0xff) << 8 | (v4(3) & 0xff))
        } else {
          if (g.isEmpty || g.length > 4) return None
          try out += Integer.parseInt(g, 16)
          catch { case _: NumberFormatException => return None }
        }
      }
      Some(out.toArray)
    }
    val (headS, tailS) =
      if (dc >= 0) (s.substring(0, dc), s.substring(dc + 2)) else (s, "")
    (groups(headS), groups(tailS)) match {
      case (Some(h), Some(t)) =>
        val fill = 8 - h.length - t.length
        if (dc < 0 && h.length != 8) null
        else if (dc >= 0 && fill < 1) null
        else {
          val gs = h ++ Array.fill(math.max(fill, 0))(0) ++ t
          if (gs.length != 8) null
          else {
            val out = new Array[Byte](16)
            for (i <- 0 until 8) {
              out(2 * i) = ((gs(i) >> 8) & 0xff).toByte
              out(2 * i + 1) = (gs(i) & 0xff).toByte
            }
            out
          }
        }
      case _ => null
    }
  }

  /** 16 bytes → RFC 5952 compressed IPv6 text; 4 bytes → dotted quad
    * (MySQL INET6_NTOA).
    */
  def inet6NtoaStr(b: Array[Byte]): String = {
    if (b == null) return null
    if (b.length == 4) return b.map(_ & 0xff).mkString(".")
    if (b.length != 16) return null
    val gs = (0 until 8).map(i => ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
    // longest run of zero groups (length >= 2) compresses to ::
    var bestStart = -1
    var bestLen = 0
    var i = 0
    while (i < 8) {
      if (gs(i) == 0) {
        var j = i
        while (j < 8 && gs(j) == 0) j += 1
        if (j - i > bestLen) { bestStart = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    if (bestLen < 2) gs.map(g => Integer.toHexString(g)).mkString(":")
    else {
      val head = gs.take(bestStart).map(g => Integer.toHexString(g)).mkString(":")
      val tail = gs.drop(bestStart + bestLen).map(g => Integer.toHexString(g)).mkString(":")
      s"$head::$tail"
    }
  }

  def isIpv6Str(s: String): Boolean =
    s != null && s.contains(':') && inet6AtonBytes(s) != null

  /** CONVERT_TZ(dt, from_tz, to_tz) — reinterpret naive wall-clock dt
    * from from_tz and render it in to_tz (reference `convert_tz`,
    * `list_builtIn.go:8733`). Session timezone is UTC (GraftSession), so
    * a TimestampType's wall-clock reading IS its UTC rendering, making
    * the to_utc/from_utc pair exactly MySQL's semantics.
    */
  def convertTz(ts: Column, fromTz: String, toTz: String): Column =
    from_utc_timestamp(to_utc_timestamp(ts, fromTz), toTz)

  // --------------------------------------------------------------- math
  /** MySQL TRUNCATE(x, d): toward zero. */
  def truncateNum(x: Column, d: Int): Column = {
    val f = math.pow(10, d)
    (x * f).cast("long").cast("double") / f
  }

  // --------------------------------------------------------------- misc
  /** INET_ATON: dotted quad → long. */
  def inetAton(ip: Column): Column = {
    val p = split(ip, "\\.")
    when(size(p) === 4,
      element_at(p, 1).cast("long") * 16777216L +
        element_at(p, 2).cast("long") * 65536L +
        element_at(p, 3).cast("long") * 256L +
        element_at(p, 4).cast("long"))
  }

  /** INET_NTOA: long → dotted quad. */
  def inetNtoa(n: Column): Column =
    concat_ws(".",
      ((n / 16777216).cast("long") % 256).cast("string"),
      ((n / 65536).cast("long") % 256).cast("string"),
      ((n / 256).cast("long") % 256).cast("string"),
      (n.cast("long") % 256).cast("string"))

  def isIpv4(s: Column): Column =
    s.rlike("^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$")

  /** IS_UUID. */
  def isUuid(s: Column): Column =
    s.rlike("^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")

  /** UUID_TO_BIN / BIN_TO_UUID (no swap flag). */
  def uuidToBin(s: Column): Column = unhex(regexp_replace(s, "-", ""))
  def binToUuid(b: Column): Column = {
    val h = lower(hex(b))
    concat_ws("-", substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  /** serial/serial_full/serial_extract: pack columns into ONE injective,
    * order-preserving string key (reference `func_builtin_serial.go`
    * packs a typed binary tuple via types.Packer; here fields pack as
    * strings -- documented deviation).
    *
    * Encoding: fields joined by u0000; each field is a null tag ("0" =
    * NULL, "1" = present) + the value, escaping u0001 -> u0001u0003
    * then u0000 -> u0001u0002. The separator never appears inside an
    * encoded field (injective), escape targets keep source byte order
    * (u0000 -> ..u0002 < u0001 -> ..u0003), and the separator u0000
    * sorts below every encoded byte, so the packed key sorts
    * field-by-field. `serial` is NULL if any field is NULL (reference
    * semantics); `serialFull` keeps NULL fields (tag "0", sorting first).
    */
  private def serialEnc(c: Column): Column =
    regexp_replace(
      regexp_replace(c.cast("string"), "\u0001", "\u0001\u0003"),
      "\u0000", "\u0001\u0002")

  private def serialField(c: Column): Column =
    when(c.isNull, lit("0")).otherwise(concat(lit("1"), serialEnc(c)))

  def serialFull(cols: Seq[Column]): Column =
    concat_ws("\u0000", cols.map(serialField): _*)

  def serial(cols: Seq[Column]): Column =
    when(cols.map(_.isNotNull).reduce(_ && _), serialFull(cols))

  /** Inverse of the packing above: the idx-th (0-based) field as a
    * string, NULL for NULL-tagged fields or out-of-range idx.
    */
  def serialExtract(s: Column, idx: Int): Column = {
    val f = element_at(split(s, "\u0000"), idx + 1)
    when(f.startsWith("1"),
      regexp_replace(
        regexp_replace(substring(f, 2, Int.MaxValue), "\u0001\u0002", "\u0000"),
        "\u0001\u0003", "\u0001"))
  }

  /** Register SQL names usable from `spark.sql`. Each name resolves to
    * the SAME expression tree the Column API above builds (stays in
    * whole-stage codegen — no ScalaUDF on the SQL surface); only the
    * byte-level IPv6 helpers and dynamic (non-literal) format arguments
    * fall back to a UDF.
    */
  def registerAll(spark: SparkSession): Unit = {
    import org.apache.spark.sql.GraftColumnBridge.{column => asCol, eagerExpression}
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
    import org.apache.spark.unsafe.types.UTF8String

    def nat(name: String, usage: String)(build: Seq[Column] => Column): Unit =
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "built-in"),
        (args: Seq[Expression]) => eagerExpression(build(args.map(asCol))))
    def strLit(e: Column): Option[String] = eagerExpression(e) match {
      case Literal(s: UTF8String, _) => Some(s.toString)
      case _ => None
    }

    // dynamic-format fallbacks (rare: almost every caller passes literals)
    val dynDateFormat = udf((ts: java.sql.Timestamp, fmt: String) =>
      if (ts == null || fmt == null) null
      else ts.toLocalDateTime.format(
        java.time.format.DateTimeFormatter.ofPattern(mysqlFormatToJava(fmt))))
    val dynConvertTz = udf((ts: java.sql.Timestamp, from: String, to: String) =>
      if (ts == null || from == null || to == null) null
      else java.sql.Timestamp.valueOf(
        ts.toLocalDateTime.atZone(java.time.ZoneId.of(from))
          .withZoneSameInstant(java.time.ZoneId.of(to)).toLocalDateTime))
    val dynGetFormat = udf((k: String, std: String) =>
      if (k == null || std == null) null else getFormat(k, std).orNull)

    nat("mo_date_format", "mo_date_format(ts, mysql_fmt)") { args =>
      strLit(args(1)) match {
        case Some(fmt) => moDateFormat(args(0), fmt)
        case None => dynDateFormat(args(0), args(1))
      }
    }
    nat("to_days", "to_days(date)")(args => toDays(args(0)))
    nat("period_add", "period_add(yyyymm, n)")(args => periodAdd(args(0), args(1)))
    nat("period_diff", "period_diff(p1, p2)")(args => periodDiff(args(0), args(1)))
    nat("inet_aton", "inet_aton(ip)")(args => inetAton(args(0)))
    nat("inet_ntoa", "inet_ntoa(n)")(args => inetNtoa(args(0)))
    nat("sec_to_time", "sec_to_time(seconds)")(args => secToTime(args(0)))
    nat("time_to_sec", "time_to_sec(time)")(args => timeToSec(args(0)))
    nat("maketime", "maketime(h, m, s)")(args => makeTime(args(0), args(1), args(2)))
    nat("get_format", "get_format(kind, standard)") { args =>
      (strLit(args(0)), strLit(args(1))) match {
        case (Some(k), Some(std)) => lit(getFormat(k, std).orNull)
        case _ => dynGetFormat(args(0), args(1))
      }
    }
    nat("convert_tz", "convert_tz(ts, from_tz, to_tz)") { args =>
      (strLit(args(1)), strLit(args(2))) match {
        case (Some(from), Some(to)) => convertTz(args(0), from, to)
        case _ => dynConvertTz(args(0), args(1), args(2))
      }
    }
    // byte-level codecs: no expression-combinator equivalent
    spark.udf.register("inet6_aton", inet6AtonBytes _)
    spark.udf.register("inet6_ntoa", inet6NtoaStr _)
    spark.udf.register("is_ipv6", (s: String) => isIpv6Str(s))
  }
}
