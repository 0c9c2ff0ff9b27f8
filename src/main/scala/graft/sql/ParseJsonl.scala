package graft.sql

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The reference's JSONL table functions (`pkg/sql/plan/function/
  * table_func_parse_jsonl.go`; BVT `function/tvf_parse_jsonl.sql`):
  *
  *   parse_jsonl_data('<lines>' [, spec])   — inline document
  *   parse_jsonl_file('<path>' [, spec])    — file ('.gz'/'.bz2' too)
  *
  * spec forms:
  *   - absent: one STRING column `value` holding each raw line;
  *   - a type-code string, one char per column ('bIt'): b=bool,
  *     i=int32, I=int64, f=float32, F=float64, s=string(JSON text),
  *     t=datetime — columns named col0..colN, rows must be JSON arrays;
  *   - a JSON config '{"format":"array"|"object","cols":[{name,type}]}'.
  *
  * Strictness matches the goldens: non-array rows, wrong arity, and
  * type mismatches all ERROR (no silent null-fill in array mode;
  * object mode null-fills missing keys).
  */
object ParseJsonl extends Serializable {

  private val M = new com.fasterxml.jackson.databind.ObjectMapper()
  M.configure(com.fasterxml.jackson.databind.SerializationFeature
    .ORDER_MAP_ENTRIES_BY_KEYS, true)

  final case class ColSpec(name: String, kind: Char)

  def parseSpec(spec: String): (Boolean, Seq[ColSpec]) = {
    val t = spec.trim
    if (t.startsWith("{")) {
      val node =
        try M.readTree(t)
        catch { case _: Exception => throw new IllegalArgumentException(
          "unexpected end of JSON input") }
      val obj = t.startsWith("{") && node != null && node.isObject
      if (!obj) throw new IllegalArgumentException("unexpected end of JSON input")
      val fmt = Option(node.get("format")).map(_.asText("array")).getOrElse("array")
      val cols = Option(node.get("cols")).toSeq.flatMap { arr =>
        (0 until arr.size).map { i =>
          val c = arr.get(i)
          val kind = c.get("type").asText() match {
            case "bool" => 'b'
            case "int32" => 'i'
            case "int64" => 'I'
            case "float32" => 'f'
            case "float64" => 'F'
            case "string" => 's'
            case "datetime" | "timestamp" => 't'
            case other => throw new IllegalArgumentException(
              s"invalid input: invalid type $other")
          }
          ColSpec(c.get("name").asText(), kind)
        }
      }
      (fmt == "object", cols)
    } else {
      val cols = t.zipWithIndex.map { case (c, k) =>
        if (!"biIfFst".contains(c))
          throw new IllegalArgumentException(
            s"invalid input: Invalid character '$c' in options")
        ColSpec(s"col$k", c)
      }
      (false, cols)
    }
  }

  def sparkType(kind: Char): DataType = kind match {
    case 'b' => BooleanType
    case 'i' => IntegerType
    case 'I' => LongType
    case 'f' => FloatType
    case 'F' => DoubleType
    case 's' => StringType
    case 't' => TimestampType
  }

  private def convert(v: com.fasterxml.jackson.databind.JsonNode,
      kind: Char): Any = {
    if (v == null || v.isNull) return null
    kind match {
      case 'b' =>
        if (!v.isBoolean) throw new IllegalArgumentException(
          "invalid input: invalid bool value")
        v.asBoolean()
      case 'i' =>
        if (!v.isNumber) throw new IllegalArgumentException(
          "invalid input: invalid number value")
        v.asDouble().toInt
      case 'I' =>
        if (!v.isNumber) throw new IllegalArgumentException(
          "invalid input: invalid number value")
        v.asDouble().toLong
      case 'f' =>
        if (!v.isNumber) throw new IllegalArgumentException(
          "invalid input: invalid number value")
        v.asDouble().toFloat
      case 'F' =>
        if (!v.isNumber) throw new IllegalArgumentException(
          "invalid input: invalid number value")
        v.asDouble()
      case 's' =>
        // canonical JSON text: numbers bare, strings quoted, objects
        // with sorted keys (the reference's Go map marshal)
        M.writeValueAsString(M.treeToValue(v, classOf[Object]))
      case 't' =>
        if (!v.isTextual) throw new IllegalArgumentException(
          "invalid input: invalid datetime value")
        java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.parse(v.asText().replace(' ', 'T')))
    }
  }

  def parseLine(line: String, objectMode: Boolean,
      cols: Seq[ColSpec]): Row = {
    val node =
      try M.readTree(line)
      catch { case _: Exception => throw new IllegalArgumentException(
        s"json: cannot unmarshal ${line.take(40)}") }
    if (objectMode) {
      if (node == null || !node.isObject)
        throw new IllegalArgumentException(
          s"""json: cannot unmarshal "${line.take(40)}" into object""")
      Row.fromSeq(cols.map(c => convert(node.get(c.name), c.kind)))
    } else {
      if (node == null || !node.isArray)
        throw new IllegalArgumentException(
          s"""json: cannot unmarshal "${line.take(40)}" into Go value of type []interface {}""")
      if (node.size > cols.length)
        throw new IllegalArgumentException(
          "invalid input: too many columns in the jsonl file")
      Row.fromSeq(cols.indices.map(i =>
        if (i < node.size) convert(node.get(i), cols(i).kind) else null))
    }
  }

  /** Build the TVF result frame. `data` is inline text (None → read
    * `path` — Spark's text reader decompresses .gz/.bz2 via the Hadoop
    * codecs, keeping the scan distributed).
    */
  def frame(spark: SparkSession, data: Option[String], path: Option[String],
      spec: Option[String]): DataFrame = {
    val lines: Either[Seq[String], DataFrame] = data match {
      case Some(d) => Left(d.split("\n", -1).toSeq.filter(_.trim.nonEmpty))
      case None =>
        val p = Stages.resolvePath(spark, path.get)
        Right(spark.read.text(p))
    }
    spec match {
      case None =>
        lines match {
          case Left(ls) =>
            spark.createDataFrame(
              spark.sparkContext.parallelize(ls.map(Row(_)), math.max(1, ls.size / 10000)),
              StructType(Seq(StructField("value", StringType))))
          case Right(df) => df.toDF("value")
        }
      case Some(sp) =>
        val (objectMode, cols) = parseSpec(sp)
        val schema = StructType(cols.map(c =>
          StructField(c.name, sparkType(c.kind), nullable = true)))
        lines match {
          case Left(ls) =>
            // inline data: parse eagerly so spec violations surface as
            // the statement's error (the goldens pin the messages)
            val rows = ls.map(parseLine(_, objectMode, cols))
            spark.createDataFrame(
              spark.sparkContext.parallelize(rows, math.max(1, rows.size / 10000)), schema)
          case Right(df) =>
            val om = objectMode
            val cs = cols
            spark.createDataFrame(
              df.rdd.map(r => parseLine(r.getString(0), om, cs)), schema)
        }
    }
  }
}
