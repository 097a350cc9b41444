package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2, table 3): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata, and
  * per-record feature extraction runs as a distributed `mapPartitions`
  * over batched rows (the Scala analog of mapInPandas — one JVM-side
  * iterator per ~128 MB input split, no driver involvement).
  *
  * Decode kernels: the IMAGE branch is REAL — `decodeImage` uses
  * `javax.imageio` (pure JVM: PNG/BMP/GIF/JPEG codecs ship with the
  * JDK, no native deps) and returns true pixel dimensions; payloads
  * ImageIO can't parse fall back to the stub so synthetic corpora still
  * flow. Audio/video remain STUBBED (`decodeStub` derives deterministic
  * pseudo-features from payload bytes — the JDK ships no such codecs):
  * the plumbing — schema, encoders, batch shape, partitioning — is real
  * and testable, and a production build swaps the stub for a JNI/ffmpeg
  * call without touching the plan.
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

  private def payloadChecksum(payload: Array[Byte]): Long = {
    var h = 1125899906842597L // FNV-ish rolling checksum over the payload
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    h
  }

  /** REAL image decode: true pixel dimensions via the JDK's bundled
    * ImageIO codecs (PNG/BMP/GIF/JPEG). Returns None both for bytes no
    * registered reader understands AND for recognized-but-corrupt
    * payloads (a truncated PNG makes ImageIO.read THROW, not return
    * null — and a dirty web corpus is full of those; one bad record
    * must degrade to the stub, not fail the job).
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      Option(img).map(i => (i.getWidth, i.getHeight))
    } catch {
      case _: java.io.IOException | _: RuntimeException => None
    }

  /** STUB decode kernel (audio/video, and image bytes ImageIO rejects):
    * deterministic pseudo-features from raw bytes. Replace with a real
    * codec (JNI to ffmpeg or an Arrow-batched Python worker) in
    * production — the signature is the contract.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val dim = math.max(1, (r.n_bytes % 1024).toInt)
    MediaFeatures(
      media_id = r.media_id,
      media_type = r.media_type,
      n_bytes = r.n_bytes,
      width = dim,
      height = math.max(1, dim / 2),
      n_frames = if (r.media_type == "image") 1 else math.max(1, (r.n_bytes / 64).toInt),
      checksum = payloadChecksum(r.payload))
  }

  /** Per-record dispatch: real ImageIO decode for images, stub for the
    * codec-less media types.
    */
  def decode(r: MediaRecord): MediaFeatures =
    if (r.media_type == "image")
      decodeImage(r.payload) match {
        case Some((w, h)) =>
          MediaFeatures(r.media_id, r.media_type, r.n_bytes,
            width = w, height = h, n_frames = 1,
            checksum = payloadChecksum(r.payload))
        case None => decodeStub(r)
      }
    else decodeStub(r)

  /** Distributed feature extraction: mapPartitions so the decoder
    * amortizes per-partition init across the batch (here: disabling
    * ImageIO's temp-file cache once per task so decodes stay in-memory)
    * — the same shape a Pandas-UDF/mapInPandas pipeline has in PySpark.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map(decode)
    }
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
