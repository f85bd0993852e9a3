package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The Spark-side design is the real artifact here — schema, partition-
  * preserving batch processing, deterministic outputs — while the actual
  * codec call is STUBBED (this container has no image/audio libraries): the
  * `???`-equivalent is [[StubCodec]], a deterministic fake whose "pixels"
  * are derived from the bytes. Swapping StubCodec for a JNI/FFI codec (or a
  * `mapInPandas`-style Python bridge) changes nothing about the plumbing.
  *
  * Scale design: decode is per-row map work with NO shuffle —
  * `mapPartitions` keeps the codec's per-batch setup cost (model load,
  * decoder init) amortized across each partition, exactly like a Pandas UDF
  * batch. Binary payloads stay in the executor; only extracted features
  * (small fixed-width vectors) flow onward.
  */
object Multimodal {

  /** Typed row for decoded media features. */
  case class MediaFeatures(id: Long, format: String, n_bytes: Long,
                           width: Int, height: Int, checksum: Long,
                           features: Array[Float])

  /** Deterministic fake codec — stands in for the real image/audio decoder. */
  object StubCodec {
    /** "Decode" a media blob: dimensions + a fixed-width feature vector,
      * all pure functions of the bytes (so tests and oracles can pin them).
      */
    def decode(id: Long, format: String, bytes: Array[Byte], dim: Int): MediaFeatures = {
      var checksum = 0L
      var i = 0
      while (i < bytes.length) {
        checksum = (checksum * 31 + (bytes(i) & 0xff)) % 1000000007L
        i += 1
      }
      val width = 1 + (checksum % 64).toInt
      val height = 1 + ((checksum / 64) % 64).toInt
      val features = new Array[Float](dim)
      var j = 0
      while (j < dim) {
        features(j) = if (bytes.isEmpty) 0f
          else (bytes(j % bytes.length) & 0xff).toFloat / 255f
        j += 1
      }
      MediaFeatures(id, format, bytes.length.toLong, width, height, checksum, features)
    }
  }

  /** Decode + feature-extract over a (id, format, media binary) frame.
    * Partition-preserving mapPartitions: one codec instance per partition.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("format").cast("string"), col("media"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup seam (real codec init goes here, once per batch)
        it.map { case (id, fmt, bytes) => StubCodec.decode(id, fmt, bytes, dim) }
      }
  }

  /** "Resize": metadata transform only (a real impl would transcode bytes).
    * Kept as a pure column expression — no data movement.
    */
  def resizeMeta(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("width"), col("height")))
    decoded
      .withColumn("out_width", greatest(lit(1), floor(col("width") * scale)).cast("int"))
      .withColumn("out_height", greatest(lit(1), floor(col("height") * scale)).cast("int"))
  }

  /** Frame sampling for "video" blobs: every k-th fixed-size window of the
    * byte stream becomes a frame payload — the partition/batch shape of real
    * frame extraction, with arithmetic standing in for the codec.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    media
      .withColumn("n_frames", (length(col("media")) / frameBytes).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(floor((col("n_frames") - 1) / everyK).cast("int"), lit(0)))))
      .withColumn("frame",
        expr(s"substring(media, frame_idx * $everyK * $frameBytes + 1, $frameBytes)"))
      .drop("media")
  }
}
