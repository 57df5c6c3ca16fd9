package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling.
  *
  * Design: media is an opaque `binary` column + a typed metadata struct —
  * the same "engine stays schema-agnostic about payloads" stance the
  * reference takes with its opaque `Bytes` values (reference
  * `package.scala:39-42,102-105`). All pipeline plumbing (schema,
  * partition sizing, batched per-partition processing, feature output
  * shape) is real Spark; ONLY the codec call is stubbed, because no
  * image/audio libraries exist in this container.
  *
  * STUB NOTE: `decodeStub` is a clearly-marked deterministic fake standing
  * in for a real decoder (e.g. javax.imageio / ffmpeg bindings). It
  * produces a reproducible feature vector from the bytes so tests can
  * assert plumbing end-to-end. Swap `decodeStub` for a real codec without
  * touching any other line.
  */
object Multimodal {

  /** media row: (id, kind, bytes, meta{width,height,sample_rate,duration_ms}) */
  case class MediaMeta(width: Int, height: Int, sampleRate: Int, durationMs: Long)
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           feature: Array[Float])

  /** Wrap raw binary payloads into the canonical media schema. */
  def asMediaTable(spark: SparkSession, df: DataFrame, idCol: String,
                   bytesCol: String, kind: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
        col(bytesCol).cast("binary").as("bytes"))
      .withColumn("meta", struct(lit(0).as("width"), lit(0).as("height"),
        lit(0).as("sampleRate"), lit(0L).as("durationMs")))
      .as[MediaRow]
  }

  /** ======== STUBBED CODEC ========
    * Deterministic fake "decode + feature extract": folds the payload bytes
    * into a `dim`-float vector (splitmix-style mixing). A real
    * implementation decodes pixels/samples here; everything around it —
    * batching, schema, null handling — is production plumbing.
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null) return out
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      out(i % dim) += ((h >>> 40).toInt & 0xffff) / 65536.0f
      i += 1
    }
    out
  }

  /** Batched per-partition feature extraction — the Scala analogue of a
    * pandas-UDF `mapInPandas` stage: one JVM-side pass per partition, media
    * bytes never shuffled, features (small) are the only thing that flows
    * downstream. Partition count should be sized so a partition's payload
    * fits in executor memory (`spark.sql.files.maxPartitionBytes` governs
    * the scan side).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 32): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.media_id, m.kind,
          if (m.bytes == null) 0L else m.bytes.length.toLong,
          decodeStub(m.bytes, dim))
      }
    }
  }

  /** "Resize" stage stub: pool the payload down by an integer `factor`
    * (every `factor` consecutive bytes average into one) and update the
    * typed metadata to match — the schema/metadata plumbing of an
    * image-resize stage, with the pixel resample stubbed at the marked
    * line. Pure per-row map: payloads never shuffle, output rows keep the
    * canonical media schema so resize stages compose with
    * [[extractFeatures]]/[[frameSample]].
    */
  def resize(media: Dataset[MediaRow], factor: Int = 4): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(factor > 0)
    media.map { m =>
      val bytes = if (m.bytes == null) Array.empty[Byte] else m.bytes
      val n = math.max(if (bytes.isEmpty) 0 else 1, bytes.length / factor)
      val out = new Array[Byte](n) // STUB: real pixel/sample resample here
      var i = 0
      while (i < n) {
        var s = 0; var j = 0
        while (j < factor && i * factor + j < bytes.length) {
          s += bytes(i * factor + j) & 0xff; j += 1
        }
        out(i) = (s / math.max(1, j)).toByte
        i += 1
      }
      m.copy(bytes = out,
        meta = m.meta.copy(width = m.meta.width / factor,
          height = m.meta.height / factor))
    }
  }

  /** "Resize / frame-sample" stage stub: for video-kind rows, sample every
    * `everyNth` frame. The frame split is stubbed as fixed-size byte
    * chunks; a real impl calls the container demuxer at the marked line.
    */
  def frameSample(media: Dataset[MediaRow], everyNth: Int = 10,
                  frameBytes: Int = 4096): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val bytes = if (m.bytes == null) Array.empty[Byte] else m.bytes
      val nFrames = math.max(1, bytes.length / frameBytes)  // STUB: demux here
      (0 until nFrames by everyNth).map { f =>
        val start = f * frameBytes
        val frame = bytes.slice(start, math.min(start + frameBytes, bytes.length))
        (m.media_id, f, frame.length, decodeStub(frame, 16))
      }
    }.toDF("media_id", "frame_no", "frame_bytes", "feature")
  }
}
