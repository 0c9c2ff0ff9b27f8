package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal decode seam: the REAL ImageIO decoder against generated
  * PNGs through the same mapPartitions stage the stub uses — schema,
  * encoders, and per-partition iteration carry an actual codec.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** A w×h PNG filled with one RGB color, as bytes. */
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIO decoder extracts real dimensions and brightness from PNGs") {
    import spark.implicits._
    val media = Seq(
      (1L, png(8, 4, 0xFFFFFF)),   // white → brightness 1.0
      (2L, png(3, 5, 0x000000)),   // black → brightness 0.0
      (3L, png(2, 2, 0x7F7F7F)),   // mid gray → 127/255
      (4L, "not an image".getBytes)) // undecodable → zeroed record
      .toDF("media_id", "bytes")
    val got = Multimodal.decodeImages(media, Multimodal.ImageIoDecoder)
      .collect().map(d => d.media_id -> d).toMap
    assert(got(1L).width == 8 && got(1L).height == 4 && got(1L).channels == 3)
    assert(math.abs(got(1L).brightness - 1.0) < 1e-9)
    assert(got(2L).width == 3 && got(2L).height == 5 && got(2L).brightness == 0.0)
    assert(math.abs(got(3L).brightness - 127.0 / 255.0) < 1e-9)
    assert(got(4L).width == 0 && got(4L).channels == 0)
  }

  test("stub decoder remains the deterministic default") {
    import spark.implicits._
    val media = Seq((9L, "abc".getBytes)).toDF("media_id", "bytes")
    val a = Multimodal.decodeImages(media).collect().head
    val b = Multimodal.decodeImages(media).collect().head
    assert(a == b && a.channels == 3)
  }
}
