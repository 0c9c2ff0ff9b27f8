package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-pipeline queries: documents.text bytes stand in for media
  * payloads; the decode stub derives deterministic metadata from the
  * leading bytes, which the DuckDB oracle reproduces with ascii()
  * arithmetic (texts are ASCII).
  */
object MultimodalQueries extends QueryModule {

  private def media(s: SparkSession, d: String): DataFrame =
    Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text")

  // ----------------------------------------------------- media metadata
  private def mm1(s: SparkSession, d: String): DataFrame =
    media(s, d)
      .select(col("media_id"), col("mime"), col("n_bytes"))
      .orderBy(col("media_id"))

  private val mm1Sql =
    """SELECT doc_id AS media_id,
      |  'application/octet-stream' AS mime,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |FROM documents ORDER BY media_id""".stripMargin

  // --------------------------------------------------------- decode stub
  private def mm2(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeImages(media(s, d)).toDF()
      .select(col("media_id"), col("width"), col("height"), col("channels"),
        round(col("brightness"), 6).as("brightness"))
      .orderBy(col("media_id"))

  private val mm2Sql =
    """SELECT doc_id AS media_id,
      |  CAST(64 + ascii(substring(text, 1, 1)) % 64 AS INTEGER) AS width,
      |  CAST(64 + ascii(substring(text, 2, 1)) % 64 AS INTEGER) AS height,
      |  3 AS channels,
      |  round(list_sum([CAST(ascii(substring(text, i, 1)) AS DOUBLE)
      |                  for i in range(1, least(17, len(text) + 1))])
      |        / least(16, len(text)) / 255.0, 6) AS brightness
      |FROM documents ORDER BY media_id""".stripMargin

  // ------------------------------------------------------ frame sampling
  private def mm3(s: SparkSession, d: String): DataFrame =
    Multimodal.frameChecksums(media(s, d), frameBytes = 64)
      .filter(col("media_id") < 50)
      .orderBy(col("media_id"), col("frame_idx"))

  private val mm3Sql =
    """SELECT doc_id AS media_id,
      |  CAST(f - 1 AS BIGINT) AS frame_idx,
      |  CAST(length(substring(text, (f - 1) * 64 + 1, 64)) AS BIGINT) AS frame_len,
      |  md5(substring(text, (f - 1) * 64 + 1, 64)) AS frame_md5
      |FROM documents
      |CROSS JOIN LATERAL (SELECT unnest(generate_series(1, greatest(len(text) // 64, 1))) AS f) t
      |WHERE doc_id < 50 AND length(substring(text, (f - 1) * 64 + 1, 64)) > 0
      |ORDER BY media_id, frame_idx""".stripMargin

  // --------------------------------------------- resize metadata stage
  private def mm4(s: SparkSession, d: String): DataFrame =
    Multimodal.resize(Multimodal.decodeImages(media(s, d)), 224, 224)
      .groupBy(col("width"), col("height"))
      .agg(count(lit(1)).as("n"), round(avg(col("brightness")), 6).as("avg_brightness"))
      .orderBy(col("width"))

  private val mm4Sql =
    """SELECT 224 AS width, 224 AS height, count(*) AS n,
      |  round(avg(list_sum([CAST(ascii(substring(text, i, 1)) AS DOUBLE)
      |                      for i in range(1, least(17, len(text) + 1))])
      |            / least(16, len(text)) / 255.0), 6) AS avg_brightness
      |FROM documents""".stripMargin

  // -------------------------------------- datalink document round-trip
  /** Wrap each document's text into REAL containers (a zip+document.xml
    * DOCX and a Flate-compressed-stream PDF) and parse them back with
    * the datalink extractors ([[graft.functions.DocText]]) — the oracle
    * is simply the original text, so the whole container+parser path is
    * verified end-to-end cross-engine.
    */
  private def mm5(s: SparkSession, d: String): DataFrame = {
    import graft.functions.DocText
    val wrapDocx = udf { (text: String) =>
      val xmlSafe = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      val xml = "<?xml version=\"1.0\"?><w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\">" +
        s"<w:body><w:p><w:r><w:t>$xmlSafe</w:t></w:r></w:p></w:body></w:document>"
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
      z.write(xml.getBytes("UTF-8")); z.closeEntry(); z.close()
      bos.toByteArray
    }
    val wrapPdf = udf { (text: String) =>
      val esc = text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
      val content = s"BT /F1 12 Tf ($esc) Tj ET".getBytes("ISO-8859-1")
      val defl = new java.util.zip.Deflater()
      defl.setInput(content); defl.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
      val body = out.toByteArray
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(("%PDF-1.4\n4 0 obj\n<< /Length " + body.length +
        " /Filter /FlateDecode >>\nstream\n").getBytes("ISO-8859-1"))
      bos.write(body)
      bos.write("\nendstream\nendobj\n%%EOF".getBytes("ISO-8859-1"))
      bos.toByteArray
    }
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        DocText.parse_document_text(wrapDocx(col("text")),
          lit("application/vnd.openxmlformats-officedocument.wordprocessingml.document"))
          .as("docx_text"),
        DocText.parse_document_text(wrapPdf(col("text")), lit("application/pdf"))
          .as("pdf_text"))
      .orderBy(col("doc_id"))
  }

  private val mm5Sql =
    """SELECT doc_id, text AS docx_text, text AS pdf_text
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ mm6 onnx_run
  /** The ONNX inference builtin through the stub backend
    * (`func_builtin_onnx.go` signature): model varbinary + json input/
    * shapes in, json tensor out. The stub's documented math
    * (`out(j) = sum(input)·(j+1) + len(model)`) makes this a HARD
    * oracle: DuckDB re-derives all three output components from the
    * same integer inputs.
    */
  private def mm6(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT doc_id,
        |  onnx_run(CAST('stub-model-v1' AS BINARY),
        |           to_json(array(n_chars, doc_id % 100)),
        |           '{"dim":[1,2],"dtype":"float64"}',
        |           '{"dim":[3]}') AS res
        |FROM documents""".stripMargin)
      .select(col("doc_id"),
        expr("transform(from_json(res, 'array<double>'), x -> CAST(x AS BIGINT))")
          .as("out_vals"))
      .select(col("doc_id"),
        element_at(col("out_vals"), 1).as("o1"),
        element_at(col("out_vals"), 2).as("o2"),
        element_at(col("out_vals"), 3).as("o3"))
      .orderBy(col("doc_id"))
  }

  private val mm6Sql =
    """SELECT doc_id,
      |  CAST((n_chars + doc_id % 100) * 1 + 13 AS BIGINT) AS o1,
      |  CAST((n_chars + doc_id % 100) * 2 + 13 AS BIGINT) AS o2,
      |  CAST((n_chars + doc_id % 100) * 3 + 13 AS BIGINT) AS o3
      |FROM documents ORDER BY doc_id""".stripMargin

  override val queries: Seq[Q] = Seq(
    Q("mm6_onnx_stub", mm6, Some(mm6Sql)),
    Q("mm5_datalink_roundtrip", mm5, Some(mm5Sql)),
    Q("mm1_media_meta", mm1, Some(mm1Sql)),
    Q("mm2_decode_stub", mm2, Some(mm2Sql)),
    Q("mm3_frame_checksums", mm3, Some(mm3Sql)),
    Q("mm4_resize_stage", mm4, Some(mm4Sql)))
}
