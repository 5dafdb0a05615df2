package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §7.4): image/audio/video as opaque
  * BINARY columns with typed metadata, processed by partition-batched
  * transforms. The Spark-side plumbing — schema, partitioning, batch
  * iteration shape — is real and tested; the actual codec call is STUBBED
  * behind [[Codec]] with a deterministic fake (media libraries are not in
  * this container).
  *
  * Scala equivalent of the mapInPandas pattern: `Dataset[T].mapPartitions`
  * over case-class rows — one fused partition pass, no per-row driver
  * round-trips, arbitrary native-lib calls allowed inside.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      meta_format: String, n_bytes: Long)

  /** Extracted features (decode stub output). */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      checksum: Long, width: Int, height: Int, n_frames: Int,
      byte_entropy: Double)

  /** STUB — the real implementation calls an image/audio codec here
    * (e.g. libjpeg / ffmpeg via JNI). The fake is deterministic in the
    * payload bytes so tests are stable: "dimensions" derive from a byte
    * checksum, "entropy" is the real byte-histogram entropy (which IS a
    * legitimate feature and exercises a full pass over the payload).
    */
  object Codec {
    def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
      var cks = 0L
      var i = 0
      while (i < payload.length) { cks = cks * 31 + (payload(i) & 0xff); i += 1 }
      val w = 16 + (math.abs(cks) % 1920).toInt
      val h = 16 + (math.abs(cks / 7) % 1080).toInt
      val frames = 1 + (math.abs(cks / 11) % 32).toInt
      (w, h, frames)
    }

    def byteEntropy(payload: Array[Byte]): Double = {
      if (payload.isEmpty) return 0.0
      val hist = new Array[Long](256)
      var i = 0
      while (i < payload.length) { hist(payload(i) & 0xff) += 1; i += 1 }
      var e = 0.0
      val n = payload.length.toDouble
      var b = 0
      while (b < 256) {
        if (hist(b) > 0) { val p = hist(b) / n; e -= p * math.log(p) / math.log(2) }
        b += 1
      }
      e
    }

    def checksum(payload: Array[Byte]): Long = {
      val crc = new java.util.zip.CRC32()
      crc.update(payload)
      crc.getValue
    }
  }

  /** Build a media table from the documents fixture: text bytes stand in
    * for the opaque payload (deterministic), kind round-robins
    * image/audio/video. Real pipelines read payloads from object-store
    * parquet/binaryFile sources with exactly this schema.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("stub/v1").as("meta_format"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** Partition-batched feature extraction — the mapInPandas-shaped pass.
    * Decode/resize/frame-sample happen per-partition inside the executor;
    * the iterator shape means constant memory per partition regardless of
    * row count.
    */
  def extractFeatures(s: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f) = Codec.decodeStub(r.payload)
        MediaFeatures(r.media_id, r.kind, r.n_bytes,
          Codec.checksum(r.payload), w, h,
          if (r.kind == "video") f else 1,
          Codec.byteEntropy(r.payload))
      }
    }
  }

  /** Frame sampling stub: every `stride`-th fixed-size chunk of the payload
    * (what frame extraction looks like to Spark: one input row → N output
    * rows, partition-local, no shuffle).
    */
  def sampleFrames(s: SparkSession, dir: String, chunk: Int = 64,
      stride: Int = 4): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow]
      .filter(_.kind == "video")
      .flatMap { r =>
        val nChunks = math.max(1, r.payload.length / chunk)
        (0 until nChunks by stride).map { ci =>
          val from = ci * chunk
          val until = math.min(from + chunk, r.payload.length)
          (r.media_id, ci, until - from,
            Codec.checksum(java.util.Arrays.copyOfRange(r.payload, from, until)))
        }
      }
      .toDF("media_id", "frame_idx", "frame_bytes", "frame_checksum")
  }

  /** Binary metadata projection — oracle-checkable: byte length and MD5 of
    * the payload (equals MD5 of the source text bytes).
    */
  def binaryMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(
      col("media_id"), col("kind"), col("n_bytes"),
      md5(col("payload")).as("md5_hex"))

  /** A "resized" media row: payload replaced by its downsampled form plus
    * the old/new logical dimensions.
    */
  final case class ResizedMedia(media_id: Long, kind: String,
      src_width: Int, src_height: Int, dst_width: Int, dst_height: Int,
      n_bytes_in: Long, n_bytes_out: Long, payload_out: Array[Byte])

  /** Resize stub: one-row→one-row payload transform, the image-resize
    * shape (decode → scale to fit a `maxDim` bounding box, aspect
    * preserved → re-encode). The stub "re-encode" keeps every `stride`-th
    * byte, with stride = ceil(max(w,h)/maxDim)² (area ratio) — so output
    * size scales like a real downsample and the transform is deterministic
    * and testable. Partition-local, constant memory, no shuffle.
    */
  def resize(s: SparkSession, dir: String, maxDim: Int = 256): Dataset[ResizedMedia] = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (w, h, _) = Codec.decodeStub(r.payload)
        val scale = math.max(1, math.ceil(math.max(w, h).toDouble / maxDim).toInt)
        val dw = math.max(1, w / scale)
        val dh = math.max(1, h / scale)
        val out =
          if (scale == 1) r.payload
          else {
            val stride = scale * scale
            val n = (r.payload.length + stride - 1) / stride
            val b = new Array[Byte](n)
            var i = 0
            while (i < n) { b(i) = r.payload(i * stride); i += 1 }
            b
          }
        ResizedMedia(r.media_id, r.kind, w, h, dw, dh,
          r.payload.length.toLong, out.length.toLong, out)
      }
    }
  }
}
