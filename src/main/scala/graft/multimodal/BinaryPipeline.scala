package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2, table 3): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata, and
  * per-record feature extraction runs as a distributed `mapPartitions`
  * over batched rows (the Scala analog of mapInPandas — one JVM-side
  * iterator per ~128 MB input split, no driver involvement).
  *
  * The decode kernels are STUBBED (this container has no image/audio
  * codecs): `decodeStub` derives deterministic pseudo-features from the
  * payload bytes so the Spark-side plumbing — schema, encoders, batch
  * shape, partitioning — is real and testable, and a production build
  * swaps `decodeStub` for a JNI/codec call without touching the plan.
  */
object BinaryPipeline {

  case class MediaRecord(
      media_id: Long,
      media_type: String, // image | audio | video
      payload: Array[Byte],
      source: String,
      n_bytes: Long)

  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int, // stub: derived, stands in for decoded dimensions
      height: Int,
      n_frames: Int, // stub: frame-sample count for video/audio
      checksum: Long)

  /** Build a media table from the documents corpus: payloads are the
    * UTF-8 bytes (a stand-in for real image/audio blobs with realistic
    * size skew), media_type cycles deterministically.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"),
        col("source"),
        length(col("text")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** STUB decode kernel: deterministic pseudo-features from raw bytes.
    * Replace with a real codec (JNI to libjpeg/ffmpeg or an Arrow-batched
    * Python worker) in production — the signature is the contract.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    var h = 1125899906842597L // FNV-ish rolling checksum over the payload
    var i = 0
    while (i < r.payload.length) { h = 31 * h + (r.payload(i) & 0xff); i += 1 }
    val dim = math.max(1, (r.n_bytes % 1024).toInt)
    MediaFeatures(
      media_id = r.media_id,
      media_type = r.media_type,
      n_bytes = r.n_bytes,
      width = dim,
      height = math.max(1, dim / 2),
      n_frames = if (r.media_type == "image") 1 else math.max(1, (r.n_bytes / 64).toInt),
      checksum = h)
  }

  /** Distributed feature extraction: mapPartitions so a real decoder can
    * amortize per-partition init (codec contexts, model weights) across
    * the batch — the same shape a Pandas-UDF/mapInPandas pipeline has in
    * PySpark.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map(decodeStub) }
  }

  /** Resize: re-encode each payload to a bounded-size representation
    * (every k-th byte so the output is ≤ `maxBytes`), updating the typed
    * metadata to match — the plumbing contract of an image resize
    * (payload in → smaller payload + new dimensions out, applied
    * per-record inside mapPartitions, never on the driver). A real
    * build swaps the byte-stride for a codec's scale kernel.
    */
  def resize(media: Dataset[MediaRecord], maxBytes: Int = 256): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val stride = math.max(1, math.ceil(r.payload.length.toDouble / maxBytes).toInt)
        val out = r.payload.indices.by(stride).map(r.payload).toArray
        r.copy(payload = out, n_bytes = out.length.toLong)
      }
    }
  }

  /** Frame sampling for video/audio payloads: every `stride`-th byte
    * stands in for every k-th decoded frame; emitted as (media_id,
    * frame_idx, frame_byte) rows. Demonstrates the explode-shaped
    * output contract of a real frame sampler.
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter(r => r.media_type != "image")
      .flatMap { r =>
        r.payload.indices.by(stride).map(i => (r.media_id, i / stride, r.payload(i).toInt))
      }
      .toDF("media_id", "frame_idx", "frame_byte")
  }
}
