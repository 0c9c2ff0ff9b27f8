package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import graft.functions.DocText
import org.scalatest.funsuite.AnyFunSuite

/** Datalink document parsing on generated fixtures: a real in-memory
  * DOCX (zip + word/document.xml) and real PDFs (uncompressed and
  * FlateDecode content streams, literal/hex strings, escapes).
  */
class DocTextSpec extends AnyFunSuite {

  private def docxBytes(xml: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("[Content_Types].xml"))
    z.write("<Types/>".getBytes("UTF-8")); z.closeEntry()
    z.putNextEntry(new ZipEntry("word/document.xml"))
    z.write(xml.getBytes("UTF-8")); z.closeEntry()
    z.close()
    bos.toByteArray
  }

  private val wordXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
      |<w:body>
      |<w:p><w:r><w:t>Hello </w:t></w:r><w:r><w:t>world</w:t></w:r></w:p>
      |<w:p><w:r><w:t>Second paragraph</w:t></w:r></w:p>
      |<w:p><w:r><w:t>Tabs</w:t><w:tab/><w:t>here</w:t></w:r></w:p>
      |</w:body>
      |</w:document>""".stripMargin

  test("docx: paragraphs joined with newlines, runs concatenated") {
    val text = DocText.docxText(docxBytes(wordXml))
    assert(text == "Hello world\nSecond paragraph\nTabs\there")
  }

  test("docx: garbage bytes and zip without document.xml yield null") {
    assert(DocText.docxText("not a zip".getBytes) == null)
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("other.txt")); z.write(1); z.closeEntry(); z.close()
    assert(DocText.docxText(bos.toByteArray) == null)
  }

  private def pdfAround(content: Array[Byte], flate: Boolean): Array[Byte] = {
    val body =
      if (!flate) content
      else {
        val d = new Deflater()
        d.setInput(content); d.finish()
        val out = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        out.toByteArray
      }
    val filter = if (flate) "/Filter /FlateDecode " else ""
    val bos = new ByteArrayOutputStream()
    bos.write(("%PDF-1.4\n4 0 obj\n<< /Length " + body.length + " " + filter +
      ">>\nstream\n").getBytes("ISO-8859-1"))
    bos.write(body)
    bos.write("\nendstream\nendobj\n%%EOF".getBytes("ISO-8859-1"))
    bos.toByteArray
  }

  private val contentOps =
    "BT /F1 12 Tf 72 700 Td (Hello \\(PDF\\) world) Tj 0 -14 Td (line two \\101) Tj ET\n" +
      "BT <48692068657821> Tj ET"

  test("pdf: uncompressed content stream text operators") {
    val text = DocText.pdfText(pdfAround(contentOps.getBytes("ISO-8859-1"), flate = false))
    assert(text != null)
    assert(text.contains("Hello (PDF) world"))
    assert(text.contains("line two A"))       // octal escape \101 = 'A'
    assert(text.contains("Hi hex!"))          // hex string
    // Td line advances separate lines
    assert(text.indexOf("Hello (PDF) world") < text.indexOf("line two"))
  }

  test("pdf: FlateDecode content stream inflates and extracts the same") {
    val text = DocText.pdfText(pdfAround(contentOps.getBytes("ISO-8859-1"), flate = true))
    assert(text != null && text.contains("Hello (PDF) world") && text.contains("Hi hex!"))
  }

  test("pdf: TJ array form and non-text streams") {
    val tj = "BT [(A) -120 (B) 30 (C)] TJ ET"
    val text = DocText.pdfText(pdfAround(tj.getBytes("ISO-8859-1"), flate = false))
    assert(text == "ABC")
    assert(DocText.pdfText("no streams here".getBytes) == null)
  }

  test("dispatch by mime + SQL registration") {
    assert(DocText.extractText("plain".getBytes("UTF-8"), "text/plain") == "plain")
    assert(DocText.extractText(docxBytes(wordXml),
      "application/vnd.openxmlformats-officedocument.wordprocessingml.document")
      .startsWith("Hello world"))
    assert(DocText.extractText(Array[Byte](1, 2), "image/png") == null)
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq((pdfAround(contentOps.getBytes("ISO-8859-1"), flate = true),
      "application/pdf")).toDF("payload", "mime")
    df.createOrReplaceTempView("doctest_payloads")
    val got = spark.sql(
      "select parse_document_text(payload, mime) from doctest_payloads").head.getString(0)
    assert(got.contains("Hello (PDF) world"))
  }
}
