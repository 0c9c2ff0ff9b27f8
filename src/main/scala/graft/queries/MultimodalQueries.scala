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

  override val queries: Seq[Q] = Seq(
    Q("mm1_media_meta", mm1, Some(mm1Sql)),
    Q("mm2_decode_stub", mm2, Some(mm2Sql)),
    Q("mm3_frame_checksums", mm3, Some(mm3Sql)),
    Q("mm4_resize_stage", mm4, Some(mm4Sql)))
}
