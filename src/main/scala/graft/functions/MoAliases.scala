package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-name aliases for reference builtins whose semantics graft (or
  * Spark) already implements under another name — the audit of
  * `pkg/sql/plan/function/function_id.go` against the session registry
  * surfaced these as "missing" only at the name level. Each resolves to
  * a codegen'd combinator tree (eager ColumnNode conversion, same
  * pattern as [[MoFunctions.registerAll]]); none are UDFs.
  *
  * Out of scope and NOT aliased here: mo_* admin/introspection, fault
  * injection, locks, sequences (currval/nextval), prefix_* index
  * helpers, h3/s2 cell indexes, the st_* long tail beyond
  * [[GeoFunctions]], and parser-level syntax (`interval`, `is`,
  * `values`, `convert`, `group_concat ... SEPARATOR`).
  */
object MoAliases {

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
    def strLit(e: Column): String = eagerExpression(e) match {
      case Literal(s: UTF8String, _) => s.toString
      case other => throw new IllegalArgumentException(
        s"expected a string literal argument, got $other")
    }
    def intLit(e: Column): Int = eagerExpression(e) match {
      case Literal(v, _) if v != null => v.toString.toInt
      case other => throw new IllegalArgumentException(
        s"expected an integer literal argument, got $other")
    }

    // ---------------------------------------------------------- strings
    nat("to_lower", "to_lower(s)")(a => lower(a(0)))
    nat("to_upper", "to_upper(s)")(a => upper(a(0)))
    nat("lengthutf8", "lengthutf8(s) - length in characters")(a => char_length(a(0)))
    nat("mid", "mid(s, pos, len) - MySQL alias of substring")(a =>
      if (a.length == 3) substring(a(0), a(1), a(2)) else a(0).substr(a(1), lit(Int.MaxValue)))
    nat("oct", "oct(n) - octal rendering")(a => conv(a(0).cast("string"), 10, 8))
    nat("ord", "ord(s) - code of the leading character")(a => ascii(a(0)))
    nat("strcmp", "strcmp(a, b) - -1/0/1")(a =>
      when(a(0).isNull || a(1).isNull, lit(null))
        .when(a(0) < a(1), -1).when(a(0) === a(1), 0).otherwise(1))
    nat("from_base64", "from_base64(s)")(a => unbase64(a(0)).cast("string"))
    nat("to_base64", "to_base64(s)")(a => base64(a(0).cast("binary")))
    nat("findinset", "findinset(s, set)")(a => find_in_set(a(0), a(1)))
    nat("format", "format(x, d) - thousands-grouped rendering")(a =>
      format_number(a(0), if (a.length > 1) intLit(a(1)) else 0))
    nat("empty", "empty(s) - 1 when zero-length")(a => (char_length(a(0)) === 0).cast("int"))
    nat("field", "field(e, v1, v2, ...) - 1-based index of e")(a =>
      MoFunctions.field(a.head, a.tail))
    nat("make_set", "make_set(bits, s1, s2, ...)")(a =>
      MoFunctions.makeSet(a.head, a.tail.map(strLit)))
    nat("export_set", "export_set(bits, on, off[, sep[, n]])")(a =>
      MoFunctions.exportSet(a(0), strLit(a(1)), strLit(a(2)),
        if (a.length > 3) strLit(a(3)) else ",",
        if (a.length > 4) intLit(a(4)) else 64))
    nat("reg_match", "reg_match(s, pattern)")(a => regexp_like(a(0), a(1)))
    nat("not_reg_match", "not_reg_match(s, pattern)")(a => !regexp_like(a(0), a(1)))

    // --------------------------------------------------------- datetime
    nat("curtime", "curtime()")(_ => date_format(current_timestamp(), "HH:mm:ss"))
    nat("utc_time", "utc_time()")(_ => date_format(current_timestamp(), "HH:mm:ss"))
    nat("sysdate", "sysdate()")(_ => current_timestamp())
    nat("localtime", "localtime()")(_ => current_timestamp())
    // session timezone is UTC (GraftSession) so now() IS the UTC reading
    nat("utc_timestamp", "utc_timestamp()")(_ => current_timestamp())
    nat("utc_date", "utc_date()")(_ => current_date())
    nat("week", "week(d)")(a => weekofyear(a(0)))
    nat("microsecond", "microsecond(ts)")(a =>
      (unix_micros(a(0).cast("timestamp")) % 1000000L).cast("int"))
    // MySQL TO_SECONDS: seconds since year 0 (TO_SECONDS('1970-01-01') =
    // 62167219200 = 719528 days * 86400)
    nat("to_seconds", "to_seconds(ts)")(a =>
      unix_timestamp(a(0).cast("timestamp")) + 62167219200L)
    nat("makedate", "makedate(year, dayofyear)")(a =>
      when(a(1) <= 0, lit(null)).otherwise(
        date_add(make_date(a(0), lit(1), lit(1)), (a(1) - 1).cast("int"))))
    nat("from_days", "from_days(n)")(a => MoFunctions.fromDays(a(0)))
    nat("yearweek", "yearweek(d)")(a => MoFunctions.yearweek(a(0)))
    nat("addtime", "addtime(t, delta)")(a => MoFunctions.addTime(a(0), a(1)))
    nat("subtime", "subtime(t, delta)")(a => MoFunctions.subTime(a(0), a(1)))
    nat("timediff", "timediff(t1, t2)")(a => MoFunctions.timeDiff(a(0), a(1)))
    nat("str_to_date", "str_to_date(s, mysql_fmt)")(a =>
      MoFunctions.moStrToDate(a(0), strLit(a(1))))

    // ------------------------------------------------------- predicates
    nat("is_null", "is_null(x)")(a => a(0).isNull)
    nat("is_not_null", "is_not_null(x)")(a => a(0).isNotNull)
    nat("iff", "iff(cond, then, else)")(a =>
      when(a(0).cast("boolean"), a(1)).otherwise(a(2)))
    nat("istrue", "istrue(x) - NULL counts as false")(a => a(0) <=> true)
    nat("isfalse", "isfalse(x)")(a => a(0) <=> false)
    nat("isnottrue", "isnottrue(x)")(a => !(a(0) <=> true))
    nat("isnotfalse", "isnotfalse(x)")(a => !(a(0) <=> false))
    nat("isunknown", "isunknown(x)")(a => a(0).isNull)
    nat("isnotunknown", "isnotunknown(x)")(a => a(0).isNotNull)

    // ---------------------------------------------------------- vectors
    nat("l1_norm", "l1_norm(v)")(a => VectorFunctions.l1Norm(a(0)))
    nat("l2_norm", "l2_norm(v)")(a => VectorFunctions.l2Norm(a(0)))
    nat("l2_distance_sq", "l2_distance_sq(a, b)")(a =>
      VectorFunctions.l2DistanceSq(a(0), a(1)))
    nat("cosine_distance", "cosine_distance(a, b)")(a =>
      VectorFunctions.cosineDistance(a(0), a(1)))
    nat("normalize_l2", "normalize_l2(v)")(a => VectorFunctions.normalizeL2(a(0)))
    nat("subvector", "subvector(v, start[, len])")(a =>
      VectorFunctions.subvectorCol(a(0), a(1),
        if (a.length > 2) Some(a(2)) else None))
    nat("summation", "summation(v)")(a => VectorFunctions.summation(a(0)))
    nat("vector_dims", "vector_dims(v)")(a => VectorFunctions.vectorDims(a(0)))

    // ------------------------------------------------------- misc codecs
    nat("is_ipv4", "is_ipv4(s)")(a =>
      regexp_like(a(0), lit("^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}" +
        "(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$")))
    nat("is_uuid", "is_uuid(s)")(a => MoFunctions.isUuid(a(0)))
    nat("uuid_to_bin", "uuid_to_bin(s)")(a => MoFunctions.uuidToBin(a(0)))
    nat("bin_to_uuid", "bin_to_uuid(b)")(a => MoFunctions.binToUuid(a(0)))
    nat("serial", "serial(c1, c2, ...) - NULL-propagating composite key")(a =>
      MoFunctions.serial(a))
    nat("serial_full", "serial_full(c1, c2, ...) - NULL-preserving composite key")(a =>
      MoFunctions.serialFull(a))
    nat("serial_extract", "serial_extract(s, idx)")(a =>
      MoFunctions.serialExtract(a(0), intLit(a(1))))
    nat("group_concat", "group_concat(e[, sep]) - listagg")(a =>
      call_function("listagg", a(0), if (a.length > 1) a(1) else lit(",")))
  }
}
