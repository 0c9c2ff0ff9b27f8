package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: opaque `binary` payload + typed metadata, with
  * decode/feature/resize/frame-sample stages as `mapPartitions` stages.
  *
  * Reference analog: the `datalink` type + pdf/docx parsers
  * (`pkg/datalink/`), and `load_file_chunks` (§2.10). At 100 TB the
  * payloads live in parquet binary columns (or a `binaryFile` source dir);
  * every stage below is partition-parallel with no shuffle.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libs): `decodeImages` derives deterministic fake pixels/metadata from
  * the bytes. The Spark-side plumbing — schema, encoders, per-partition
  * batch iteration, binary slicing — is real and tested; swap
  * `stubDecode` with a JNI/javacpp codec to productionize.
  */
object Multimodal {

  /** A decoded image record (stub). */
  final case class Decoded(
      media_id: Long, width: Int, height: Int, channels: Int, brightness: Double)

  /** Wrap a text corpus as a media table: (media_id, bytes, mime, n_bytes).
    * Stand-in for `spark.read.format("binaryFile")` at test scale.
    */
  def asMedia(docs: DataFrame, idCol: String, payloadCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      col(payloadCol).cast("binary").as("bytes"),
      lit("application/octet-stream").as("mime"),
      length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"))

  /** STUB decode: deterministic metadata from leading bytes (would be the
    * codec call). One pass per partition; rows stream through an iterator
    * exactly like an Arrow batch would.
    */
  private def stubDecode(id: Long, bytes: Array[Byte]): Decoded = {
    val b0 = if (bytes.length > 0) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    val n = math.min(16, bytes.length)
    var sum = 0.0
    var i = 0
    while (i < n) { sum += (bytes(i) & 0xff); i += 1 }
    Decoded(id, 64 + b0 % 64, 64 + b1 % 64, 3,
      if (n == 0) 0.0 else sum / n / 255.0)
  }

  def decodeImages(media: DataFrame): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => stubDecode(id, bytes) })
  }

  /** Resize stage (stub): pure metadata arithmetic, preserves the record
    * shape a real resampler would produce.
    */
  def resize(decoded: Dataset[Decoded], w: Int, h: Int): DataFrame =
    decoded.toDF().withColumn("width", lit(w)).withColumn("height", lit(h))

  /** Frame sampling: slice the payload into fixed-size "frames" and keep
    * every `stride`-th — binary slicing is a codegen'd expression, the
    * explode is the only row-multiplier.
    */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(col("media_id"), col("bytes"),
        (length(col("bytes")) / frameBytes).cast("int").as("_nframes"))
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), greatest(col("_nframes") - 1, lit(0))),
          i => i)).as(Seq("_i", "frame_idx")))
      .filter(col("frame_idx") % stride === 0)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"))

  /** Frame payloads with checksums (binary substring + md5, both
    * codegen'd expressions).
    */
  def frameChecksums(media: DataFrame, frameBytes: Int): DataFrame =
    media
      .withColumn("_nframes",
        greatest((length(col("bytes")) / frameBytes).cast("int"), lit(1)))
      .select(col("media_id"), col("bytes"),
        explode(sequence(lit(0), col("_nframes") - 1)).as("frame_idx"))
      .withColumn("frame",
        expr(s"substring(bytes, frame_idx * $frameBytes + 1, $frameBytes)"))
      .filter(length(col("frame")) > 0)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_md5"))
}
