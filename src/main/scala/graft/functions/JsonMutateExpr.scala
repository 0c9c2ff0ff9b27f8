package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MySQL JSON mutation as ONE expression evaluating a mutation PROGRAM:
  * the document is parsed once, every edit is applied in order on the
  * tree, and the result is serialized once — the reference evaluates
  * byte-level on bytejson the same way (`pkg/bytejson`, builtins
  * `json_insert json_replace json_set json_remove json_merge_patch` in
  * `list_builtIn.go`). Chained mutations fuse structurally: the Column
  * API flattens `json_set(json_remove(doc, …), …)` into a single
  * program, so an N-step chain costs one parse + one serialize instead
  * of N of each (the round-1/2 UDF path's hot-spot).
  *
  * children layout: doc :: (opLiteral, path, value)* — `value` is a
  * null literal for `remove`; `path` is `$` for `merge_patch`.
  */
case class JsonMutateExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {

  require(children.nonEmpty && (children.length - 1) % 3 == 0,
    "JsonMutateExpr: children must be doc + (op, path, value) triples")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_mutate"

  @transient private lazy val mapper = JsonMutation.mapper

  /** Parse `value` as JSON when possible, else treat as a JSON string.
    * A SQL NULL value becomes the JSON null scalar (MySQL:
    * `JSON_SET(doc, path, NULL)` stores json null —
    * func_json_set.result).
    */
  private def valueNode(value: String): JsonNode =
    if (value == null) mapper.getNodeFactory.nullNode()
    else try mapper.readTree(value)
    catch { case _: Exception => mapper.getNodeFactory.textNode(value) }

  /** RFC 7396 merge patch. */
  private def mergePatch(t: JsonNode, p: JsonNode): JsonNode =
    if (!p.isObject) p.deepCopy()
    else {
      val out = if (t.isObject) t.deepCopy[ObjectNode]() else mapper.createObjectNode()
      val it = p.properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isNull) out.remove(e.getKey)
        else out.set[ObjectNode](e.getKey, mergePatch(out.path(e.getKey), e.getValue))
      }
      out
    }

  override def eval(input: InternalRow): Any = {
    val docAny = children.head.eval(input)
    // a NULL doc poisons path ops, but a merge_patch chain can recover:
    // json_merge_patch(NULL, '[1,2]') = [1,2] — a non-object patch
    // replaces whatever the target was (func_json_merge.result)
    var root: JsonNode =
      if (docAny == null) null else mapper.readTree(docAny.toString)
    var i = 1
    while (i + 2 < children.length) {
      val opAny = children(i).eval(input)
      val pathAny = children(i + 1).eval(input)
      val valAny = children(i + 2).eval(input)
      if (opAny == null) return null
      val op = opAny.toString
      if (op == "merge_patch") {
        val p = if (valAny == null) null else mapper.readTree(valAny.toString)
        root =
          if (p == null) null // NULL patch poisons
          else if (!p.isObject) p.deepCopy[JsonNode]()
          else if (root == null) null // object patch over poisoned target
          else mergePatch(root, p)
      } else {
        if (pathAny == null || root == null) return null
        JsonMutation.parseMutPath(pathAny.toString) match {
          case Some(segs) =>
            root = JsonMutation.applyMutOp(root, op, segs,
              valueNode(if (valAny == null) null else valAny.toString))
          case None => // invalid path: no-op (sweep-safe)
        }
      }
      i += 3
    }
    if (root == null) null
    else UTF8String.fromString(mapper.writeValueAsString(root))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object JsonMutateExpr {
  private def lit(s: String): Expression = Literal(UTF8String.fromString(s), StringType)

  /** Build a one-op mutation, FUSING with an inner [[JsonMutateExpr]]
    * doc so chains share a single parse/serialize.
    */
  def op(doc: Expression, opName: String, path: Expression, value: Expression): Expression =
    doc match {
      case JsonMutateExpr(inner) => JsonMutateExpr(inner ++ Seq(lit(opName), path, value))
      case _ => JsonMutateExpr(Seq(doc, lit(opName), path, value))
    }

  def insert(doc: Expression, path: Expression, value: Expression): Expression =
    op(doc, "insert", path, value)
  def replace(doc: Expression, path: Expression, value: Expression): Expression =
    op(doc, "replace", path, value)
  def set(doc: Expression, path: Expression, value: Expression): Expression =
    op(doc, "set", path, value)
  def remove(doc: Expression, path: Expression): Expression =
    op(doc, "remove", path, Literal(null, StringType))
  def mergePatch(doc: Expression, patch: Expression): Expression =
    op(doc, "merge_patch", lit("$"), patch)
}
