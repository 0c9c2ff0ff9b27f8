package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** MySQL JSON mutation functions the reference supports but Spark lacks
  * (SURVEY §2.13: `json_insert json_replace json_set json_remove
  * json_merge_patch` — reference registry `list_builtIn.go`).
  *
  * Implemented over Jackson (already on Spark's classpath). Paths are the
  * common `$.a.b` object-member form (array subscripts out of scope,
  * documented). UDF-based first pass — mutation functions are rarely in
  * the scan-heavy hot path; promote to native expressions if profiling
  * says otherwise.
  */
object JsonMutation {

  @transient private lazy val mapper = new ObjectMapper()

  private def parsePath(path: String): Seq[String] = {
    require(path.startsWith("$"), s"unsupported path $path")
    path.stripPrefix("$").split("\\.").filter(_.nonEmpty).toSeq
  }

  /** Parse `value` as JSON when possible, else treat as a JSON string. */
  private def valueNode(value: String) =
    try mapper.readTree(value)
    catch { case _: Exception => mapper.getNodeFactory.textNode(value) }

  private def mutate(doc: String, path: String, value: String,
      insert: Boolean, replace: Boolean): String = {
    if (doc == null) return null
    val root = mapper.readTree(doc)
    val segs = parsePath(path)
    if (segs.isEmpty) return doc
    var node = root
    // MySQL (and the reference) treat a nonexistent PARENT path as a
    // no-op for every mutation mode — intermediate objects are never
    // auto-created; only the leaf member may be added.
    segs.dropRight(1).foreach { s =>
      node match {
        case o: ObjectNode if o.has(s) => node = o.get(s)
        case _ => return doc
      }
    }
    node match {
      case o: ObjectNode =>
        val leaf = segs.last
        val exists = o.has(leaf)
        if ((exists && replace) || (!exists && insert))
          o.set[ObjectNode](leaf, valueNode(value))
      case _ =>
    }
    mapper.writeValueAsString(root)
  }

  def jsonInsert(doc: String, path: String, value: String): String =
    mutate(doc, path, value, insert = true, replace = false)

  def jsonReplace(doc: String, path: String, value: String): String =
    mutate(doc, path, value, insert = false, replace = true)

  def jsonSet(doc: String, path: String, value: String): String =
    mutate(doc, path, value, insert = true, replace = true)

  def jsonRemove(doc: String, path: String): String = {
    if (doc == null) return null
    val root = mapper.readTree(doc)
    val segs = parsePath(path)
    if (segs.isEmpty) return doc
    var node = root
    segs.dropRight(1).foreach { s =>
      if (node.isObject && node.has(s)) node = node.get(s) else return doc
    }
    node match {
      case o: ObjectNode => o.remove(segs.last)
      case _ =>
    }
    mapper.writeValueAsString(root)
  }

  /** RFC 7396 merge patch (MySQL `json_merge_patch`). */
  def jsonMergePatch(target: String, patch: String): String = {
    if (target == null || patch == null) return null
    def merge(t: com.fasterxml.jackson.databind.JsonNode,
        p: com.fasterxml.jackson.databind.JsonNode): com.fasterxml.jackson.databind.JsonNode =
      if (!p.isObject) p.deepCopy()
      else {
        val out = if (t.isObject) t.deepCopy[ObjectNode]() else mapper.createObjectNode()
        val it = p.properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.isNull) out.remove(e.getKey)
          else out.set[ObjectNode](e.getKey, merge(out.path(e.getKey), e.getValue))
        }
        out
      }
    mapper.writeValueAsString(merge(mapper.readTree(target), mapper.readTree(patch)))
  }

  // Column API — native single-pass [[JsonMutateExpr]]: chained
  // mutations fuse into one parse + one serialize (the functions above
  // remain as the driver-side scalar reference used by specs)
  import org.apache.spark.sql.GraftColumnBridge.{column => asCol, expression => asExpr}

  def json_insert(doc: Column, path: Column, value: Column): Column =
    asCol(JsonMutateExpr.insert(asExpr(doc), asExpr(path), asExpr(value)))
  def json_replace(doc: Column, path: Column, value: Column): Column =
    asCol(JsonMutateExpr.replace(asExpr(doc), asExpr(path), asExpr(value)))
  def json_set(doc: Column, path: Column, value: Column): Column =
    asCol(JsonMutateExpr.set(asExpr(doc), asExpr(path), asExpr(value)))
  def json_remove(doc: Column, path: Column): Column =
    asCol(JsonMutateExpr.remove(asExpr(doc), asExpr(path)))
  def json_merge_patch(a: Column, b: Column): Column =
    asCol(JsonMutateExpr.mergePatch(asExpr(a), asExpr(b)))

  /** SQL names are injected as native expression builders in
    * [[graft.GraftExtensions]] — nothing to register here anymore.
    */
  def registerAll(spark: SparkSession): Unit = ()
}
