package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling.
  *
  * Design: media is an opaque `binary` column + a typed metadata struct —
  * the same "engine stays schema-agnostic about payloads" stance the
  * reference takes with its opaque `Bytes` values (reference
  * `package.scala:39-42,102-105`). All pipeline plumbing (schema,
  * partition sizing, batched per-partition processing, feature output
  * shape) is real Spark.
  *
  * The IMAGE codec is real: `javax.imageio` (PNG/BMP/GIF/JPEG decode +
  * PNG encode) and `java.awt.Graphics2D` resampling. The AUDIO codec is
  * real too: `javax.sound.sampled.AudioSystem` (WAV/AIFF/AU container
  * parse + 16-bit PCM decode, [[decodeAudio]]/[[audioWindows]]). VIDEO
  * containers are real as well: a hand-rolled pure-JDK RIFF/AVI demuxer
  * ([[demuxAvi]]/[[aviBytes]]) splits Motion-JPEG/Motion-PNG streams into
  * per-frame payloads that the image codec then decodes
  * ([[frameSample]]). Everything is JDK-built-in — zero external
  * dependencies. Payloads that decode as none of these fall back to a
  * clearly-marked deterministic byte-fold so the pipeline never crashes
  * on a bad payload.
  */
object Multimodal {

  /** media row: (id, kind, bytes, meta{width,height,sample_rate,duration_ms}) */
  case class MediaMeta(width: Int, height: Int, sampleRate: Int, durationMs: Long)
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           feature: Array[Float])
  /** Typed per-image stats from a REAL decode; `decoded=false` rows carry
    * zeros (payload was not a decodable image). */
  case class ImageStats(media_id: Long, decoded: Boolean, width: Int, height: Int,
                        mean_r: Long, mean_g: Long, mean_b: Long, n_bytes: Long)

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

  // ======== REAL image codec (JDK javax.imageio + Graphics2D) ========

  /** Decode any ImageIO-supported payload (PNG/BMP/GIF/JPEG). None when the
    * bytes are not a decodable image — callers fall back rather than throw,
    * because at 100 TB a corrupt payload must not kill the stage. */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] = {
    if (bytes == null || bytes.length == 0) None
    else
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
  }

  /** Encode a BufferedImage as PNG bytes (lossless, deterministic for a
    * given pixel buffer — the JDK PNG writer emits no timestamp chunks). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Render a solid-color RGB image and encode it as PNG. Used by tests and
    * the driver queries to derive REAL image payloads from tabular data. */
  def solidPng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
    val row = Array.fill(width)(rgb)
    var y = 0
    while (y < height) { img.setRGB(0, y, width, 1, row, 0, width); y += 1 }
    encodePng(img)
  }

  /** Per-channel pixel means of a decoded image (rounded to nearest). */
  def channelMeans(img: BufferedImage): (Long, Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < px.length) {
      val p = px(i)
      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      i += 1
    }
    val n = px.length.toLong
    (math.round(sr.toDouble / n), math.round(sg.toDouble / n),
      math.round(sb.toDouble / n))
  }

  /** Real per-partition image decode → typed stats. The heavy payload never
    * shuffles; only the small stats rows flow downstream. Non-decodable
    * payloads yield `decoded=false` zero rows instead of failing the stage. */
  def imageStats(media: Dataset[MediaRow]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val nBytes = if (m.bytes == null) 0L else m.bytes.length.toLong
        decodeImage(m.bytes) match {
          case Some(img) =>
            val (r, g, b) = channelMeans(img)
            ImageStats(m.media_id, decoded = true, img.getWidth, img.getHeight,
              r, g, b, nBytes)
          case None =>
            ImageStats(m.media_id, decoded = false, 0, 0, 0L, 0L, 0L, nBytes)
        }
      }
    }
  }

  // ======== REAL audio codec (JDK javax.sound.sampled) ========

  /** Typed per-window audio features from a REAL decode: `w_peak` is the
    * max absolute sample, `w_sumsq` the exact integer sum of squares (the
    * RMS numerator — kept integral so any engine reproduces it
    * bit-for-bit; RMS itself is `sqrt(w_sumsq / w_n)`). Media-level
    * `sample_rate`/`duration_ms` ride every window row.
    */
  case class AudioWindow(media_id: Long, sample_rate: Int, duration_ms: Long,
                         window_no: Int, w_n: Int, w_peak: Int, w_sumsq: Long)

  /** Encode signed 16-bit mono PCM as a WAV via the JDK's own
    * `javax.sound.sampled.AudioSystem` writer — the audio twin of
    * [[solidPng]]: tests and driver queries derive REAL WAV payloads from
    * tabular data, so every decoded feature is oracle-computable.
    */
  def pcmWavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    require(sampleRate > 0)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) { // 16-bit little-endian per WAV PCM
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV/AIFF/AU payload to (sampleRate, mono 16-bit samples)
    * through `AudioSystem` — a REAL container parse + PCM decode, not a
    * byte-fold. None when the bytes are not decodable audio (same
    * degrade-don't-kill stance as [[decodeImage]]). Multi-channel input
    * takes channel 0; 16-bit signed PCM (either endianness) supported.
    */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    import javax.sound.sampled.AudioSystem
    if (bytes == null || bytes.length == 0) return None
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        // the sample loop below assumes SIGNED 16-bit PCM — a PCM_UNSIGNED
        // (or a-law/u-law) 16-bit stream would be silently misread, so it is
        // rejected like any other undecodable payload
        if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          return None
        val frameBytes = fmt.getFrameSize
        val raw = ais.readAllBytes()
        val nFrames = raw.length / frameBytes
        val out = new Array[Short](nFrames)
        var i = 0
        while (i < nFrames) { // channel 0 of each frame
          val o = i * frameBytes
          val s =
            if (fmt.isBigEndian) ((raw(o) << 8) | (raw(o + 1) & 0xff))
            else ((raw(o + 1) << 8) | (raw(o) & 0xff))
          out(i) = s.toShort
          i += 1
        }
        Some((math.round(fmt.getSampleRate), out))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Real per-partition audio decode → per-window features. Payloads never
    * shuffle — only the small feature rows flow downstream; non-decodable
    * payloads yield no rows instead of failing the stage. Windows are
    * `windowSamples` wide; the last window may be short (`w_n` carries the
    * actual count).
    */
  def audioWindows(media: Dataset[MediaRow],
                   windowSamples: Int = 160): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    require(windowSamples > 0)
    media.flatMap { m =>
      decodeAudio(m.bytes) match {
        case Some((rate, samples)) =>
          val durationMs = samples.length.toLong * 1000L / rate
          val nWin = (samples.length + windowSamples - 1) / windowSamples
          (0 until nWin).map { w =>
            val from = w * windowSamples
            val until = math.min(from + windowSamples, samples.length)
            var peak = 0; var sumsq = 0L; var i = from
            while (i < until) {
              val v = samples(i).toInt
              if (math.abs(v) > peak) peak = math.abs(v)
              sumsq += v.toLong * v.toLong
              i += 1
            }
            AudioWindow(m.media_id, rate, durationMs, w, until - from, peak, sumsq)
          }
        case None => Nil
      }
    }
  }

  /** ======== FALLBACK byte-fold (video payloads only) ========
    * Deterministic byte-fold standing in for codecs the JDK lacks (audio
    * sample decode, video demux): folds the payload bytes into a
    * `dim`-float vector (splitmix-style mixing) so the feature-pipeline
    * plumbing stays testable end-to-end on any payload.
    */
  def byteFoldFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
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
    * downstream. Decodable images get REAL features
    * `[width, height, meanR, meanG, meanB, 0…]`; anything else gets the
    * deterministic byte-fold fallback. Partition count should be sized so a
    * partition's payload fits in executor memory
    * (`spark.sql.files.maxPartitionBytes` governs the scan side).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 32): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val nBytes = if (m.bytes == null) 0L else m.bytes.length.toLong
        val feat = decodeImage(m.bytes) match {
          case Some(img) =>
            val (r, g, b) = channelMeans(img)
            val out = new Array[Float](dim)
            val real = Array(img.getWidth.toFloat, img.getHeight.toFloat,
              r.toFloat, g.toFloat, b.toFloat)
            System.arraycopy(real, 0, out, 0, math.min(dim, real.length))
            out
          case None => byteFoldFeature(m.bytes, dim)
        }
        MediaFeatures(m.media_id, m.kind, nBytes, feat)
      }
    }
  }

  /** Resize stage. Decodable images take the REAL path: decode, Graphics2D
    * bilinear resample to `(max(1, w/factor), max(1, h/factor))`, re-encode
    * PNG, metadata set from the ACTUAL decoded dimensions. Non-decodable
    * payloads fall back to integer byte-pooling (every `factor` consecutive
    * bytes average into one) so the stage still composes for audio-ish
    * payloads. Pure per-row map: payloads never shuffle, output rows keep
    * the canonical media schema so resize stages compose with
    * [[extractFeatures]]/[[imageStats]]/[[frameSample]].
    */
  def resize(media: Dataset[MediaRow], factor: Int = 4): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(factor > 0)
    media.map { m =>
      decodeImage(m.bytes) match {
        case Some(img) =>
          val w2 = math.max(1, img.getWidth / factor)
          val h2 = math.max(1, img.getHeight / factor)
          val dst = new BufferedImage(w2, h2, BufferedImage.TYPE_INT_RGB)
          val gfx = dst.createGraphics()
          try {
            gfx.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
              RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            gfx.drawImage(img, 0, 0, w2, h2, null)
          } finally gfx.dispose()
          m.copy(bytes = encodePng(dst),
            meta = m.meta.copy(width = w2, height = h2))
        case None =>
          val bytes = if (m.bytes == null) Array.empty[Byte] else m.bytes
          val n = math.max(if (bytes.isEmpty) 0 else 1, bytes.length / factor)
          val out = new Array[Byte](n) // FALLBACK: byte pooling, not pixels
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
  }

  // ======== REAL video container demux (RIFF / AVI, pure JDK) ========

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Build a minimal standard RIFF 'AVI ' container around per-frame
    * compressed payloads ('00dc' chunks): hdrl (avih + one video strl),
    * movi, idx1. `codec` is the stream handler fourcc — "MJPG" for JPEG
    * frames (Motion JPEG), "MPNG" for PNG frames (Motion PNG). Tests and
    * driver queries derive REAL video payloads from tabular data with
    * this, the same move as [[solidPng]] / [[pcmWavBytes]].
    */
  def aviBytes(frames: Seq[Array[Byte]], width: Int, height: Int,
               fps: Int = 10, codec: String = "MJPG"): Array[Byte] = {
    require(fps > 0 && width > 0 && height > 0)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fourcc(id) ++ le32(data.length) ++ data ++ pad
    }
    def list(kind: String, payload: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ le32(4 + payload.length) ++ fourcc(kind) ++ payload
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
      le32(frames.size) ++ le32(0) ++ le32(1) ++ le32(maxFrame) ++
      le32(width) ++ le32(height) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fourcc("vids") ++ fourcc(codec) ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++ le32(frames.size) ++
      le32(maxFrame) ++ le32(-1) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(width) ++ le16(height)
    val strf = le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++ le16(24) ++
      fourcc(codec) ++ le32(width * height * 3) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviChunks = frames.map(f => chunk("00dc", f))
    val movi = list("movi", moviChunks.flatten.toArray)
    // idx1: one keyframe entry per chunk, offsets relative to 'movi'+4
    var off = 4
    val idx = frames.zip(moviChunks).flatMap { case (f, c) =>
      val e = fourcc("00dc") ++ le32(0x10) ++ le32(off) ++ le32(f.length)
      off += c.length
      e
    }.toArray
    val body = fourcc("AVI ") ++ hdrl ++ movi ++ chunk("idx1", idx)
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** Parse a RIFF 'AVI ' container and return the video frame payloads
    * ('##dc'/'##db' chunks, in stream order). Nil when the bytes are not
    * an AVI — callers fall back rather than throw, the same
    * degrade-don't-kill stance as [[decodeImage]]/[[decodeAudio]].
    * Truncated containers yield the frames that fit (payloads at 100 TB
    * arrive damaged; salvage beats discard).
    */
  def demuxAvi(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length < 12) return Nil
    def str4(o: Int) = new String(bytes, o, 4, "US-ASCII")
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    if (str4(0) != "RIFF" || str4(8) != "AVI ") return Nil
    val out = Seq.newBuilder[Array[Byte]]
    // offsets are Longs: a corrupt size field near 2^31 would overflow Int
    // arithmetic into a NEGATIVE `end` that slips past the truncation
    // guard and throws from copyOfRange — in Long, an absurd size simply
    // reads as `end > to` and stops, per the salvage contract
    def walk(from: Long, to: Long): Unit = {
      var o = from
      var ok = true
      while (ok && o + 8 <= to) {
        val id = str4(o.toInt)
        val sz = u32(o.toInt + 4) // unsigned 32-bit: 0 .. 2^32-1
        val end = o + 8 + sz
        if (id == "LIST" && sz >= 4) {
          // a truncated LIST is still walked over the bytes that DID
          // arrive — salvage the frames that fit
          walk(o + 12, math.min(end, to))
          if (end > to) ok = false else o = end + (sz & 1)
        } else if (end > to) ok = false // truncated plain chunk: stop
        else {
          if (id.endsWith("dc") || id.endsWith("db"))
            out += java.util.Arrays.copyOfRange(bytes, o.toInt + 8, end.toInt)
          o = end + (sz & 1)
        }
      }
    }
    walk(12L, bytes.length.toLong)
    out.result()
  }

  /** Frame-sample stage: for video-kind rows, REAL RIFF/AVI demux
    * ([[demuxAvi]]) splits the payload into frames, every `everyNth` frame
    * is decoded with the REAL image codec ([[decodeImage]] — MJPG/MPNG
    * frames are ImageIO-decodable), and only small per-frame stats rows
    * flow downstream (payloads never shuffle). Non-AVI payloads fall back
    * to fixed-size byte chunks with `decoded = false`, so the sampling
    * plumbing still runs on arbitrary bytes and a corrupt payload degrades
    * instead of killing the stage.
    */
  def frameSample(media: Dataset[MediaRow], everyNth: Int = 10,
                  frameBytes: Int = 4096): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val bytes = if (m.bytes == null) Array.empty[Byte] else m.bytes
      val frames = demuxAvi(bytes)
      if (frames.nonEmpty) {
        (0 until frames.size by everyNth).map { f =>
          val fb = frames(f)
          decodeImage(fb) match {
            case Some(img) =>
              val (r, g, b) = channelMeans(img)
              (m.media_id, f, fb.length, true, img.getWidth, img.getHeight, r, g, b)
            case None =>
              (m.media_id, f, fb.length, false, 0, 0, 0L, 0L, 0L)
          }
        }
      } else {
        val nChunks = math.max(1, bytes.length / frameBytes)
        (0 until nChunks by everyNth).map { f =>
          val start = f * frameBytes
          val chunk = bytes.slice(start, math.min(start + frameBytes, bytes.length))
          (m.media_id, f, chunk.length, false, 0, 0, 0L, 0L, 0L)
        }
      }
    }.toDF("media_id", "frame_no", "frame_bytes", "decoded",
      "width", "height", "mean_r", "mean_g", "mean_b")
  }

  // ======== perceptual hash (pHash, DCT variant) + image near-dup ========

  /** 64-bit DCT perceptual hash (the pHash construction, Zauner 2010
    * "Implementation and Benchmarking of Perceptual Image Hash
    * Functions"): luminance → deterministic 32×32 area-average resample →
    * 2-D DCT-II → the top-left 8×8 low-frequency block → each bit =
    * coefficient above the block's median. Uniform brightness shifts move
    * only the DC term (excluded via the median over the mixed block);
    * small pixel-level noise perturbs low-frequency coefficients far less
    * than pattern structure does — so re-encoded / lightly-edited copies
    * of an image hash within a few bits while distinct images are ~32
    * bits apart (the random baseline).
    *
    * Every stage is integer math or IEEE double ops on
    * `StrictMath.cos`-derived constants — bit-identical on any JVM, so
    * hashes computed by different executors (or rounds) always agree.
    */
  def phash64(img: BufferedImage): Long = {
    val n = 32
    // luminance, area-averaged onto an n×n grid (exact integer sums)
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val sums = new Array[Long](n * n)
    val cnts = new Array[Long](n * n)
    var y = 0
    while (y < h) {
      val cy = y * n / h
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        val lum = 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
        val cell = cy * n + x * n / w
        sums(cell) += lum; cnts(cell) += 1
        x += 1
      }
      y += 1
    }
    val g = new Array[Double](n * n)
    var i = 0
    while (i < n * n) {
      g(i) = if (cnts(i) == 0) 0.0 else sums(i).toDouble / (1000.0 * cnts(i))
      i += 1
    }
    // 2-D DCT-II, only the first 8 output rows/cols are needed
    val k = 8
    val cos = Array.tabulate(k, n)((u, x) =>
      StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * n)))
    val coef = new Array[Double](k * k)
    var u = 0
    while (u < k) {
      var v = 0
      while (v < k) {
        var s = 0.0
        var yy = 0
        while (yy < n) {
          var xx = 0
          var rowS = 0.0
          while (xx < n) { rowS += g(yy * n + xx) * cos(v)(xx); xx += 1 }
          s += rowS * cos(u)(yy)
          yy += 1
        }
        coef(u * k + v) = s
        v += 1
      }
      u += 1
    }
    val sorted = coef.clone(); java.util.Arrays.sort(sorted)
    val median = (sorted(k * k / 2 - 1) + sorted(k * k / 2)) / 2.0
    var hash = 0L
    i = 0
    while (i < k * k) {
      if (coef(i) > median) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Deterministic patterned PNG for fixtures: an 8×8 grid of 4×4-pixel
    * blocks whose gray levels hash off `gid` (strong low-frequency
    * content — exactly what pHash keys on), plus per-`member` pixel noise
    * (±2 gray at member-derived positions). Members of one `gid` are
    * near-duplicate images; different `gid`s are unrelated patterns.
    */
  def patternPng(gid: Long, member: Long, size: Int = 32): Array[Byte] = {
    require(size % 8 == 0)
    val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
    val blk = size / 8
    def h64(a: Long, b: Long, c: Long): Long = {
      var x = a * 0x9E3779B97F4A7C15L + b * 0xC2B2AE3D27D4EB4FL + c * 0x165667B19E3779F9L
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
      x
    }
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        val base = (h64(gid, x / blk, y / blk) & 0xff).toInt
        val noise = (h64(gid * 131 + member, x, y) % 5).toInt - 2 // ±2
        val v = math.max(0, math.min(255, base + noise))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Per-image 64-bit perceptual hash; heavy payloads decode per partition
    * and never shuffle — only (id, decoded, phash) flows downstream.
    */
  def imagePhash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        decodeImage(m.bytes) match {
          case Some(img) => (m.media_id, true, phash64(img))
          case None => (m.media_id, false, 0L)
        }
      }
    }.toDF("media_id", "decoded", "phash")
  }

  // ======== audio fingerprinting (constellation hashing) ========

  /** Shazam-style constellation fingerprints (Wang 2003, "An
    * Industrial-Strength Audio Search Algorithm"): frame the decoded PCM,
    * take each frame's spectral PEAK band (direct DFT at `bands`
    * frequencies — `StrictMath` tables, deterministic on any JVM; ties
    * break to the lower band), then hash (peak_t, peak_{t+dt}, dt) pairs
    * for dt = 1..fanout. Emits one small (media_id, frame_no, hash32) row
    * per pair — the payload itself never shuffles.
    */
  def audioFingerprints(media: Dataset[MediaRow], frameSize: Int = 256,
                        hop: Int = 128, bands: Int = 32,
                        fanout: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    require(bands >= 2 && frameSize >= bands && hop >= 1 && fanout >= 1)
    media.flatMap { m =>
      decodeAudio(m.bytes) match {
        case None => Iterator.empty
        case Some((_, samples)) =>
          val cosT = Array.tabulate(bands, frameSize)((k, n) =>
            StrictMath.cos(2.0 * StrictMath.PI * (k + 1) * n / frameSize))
          val sinT = Array.tabulate(bands, frameSize)((k, n) =>
            StrictMath.sin(2.0 * StrictMath.PI * (k + 1) * n / frameSize))
          val nFrames = math.max(0, (samples.length - frameSize) / hop + 1)
          val peaks = new Array[Int](nFrames)
          var t = 0
          while (t < nFrames) {
            val off = t * hop
            var best = 0; var bestMag = -1.0
            var k = 0
            while (k < bands) {
              var re = 0.0; var im = 0.0
              var n = 0
              while (n < frameSize) {
                val s = samples(off + n).toDouble
                re += s * cosT(k)(n); im += s * sinT(k)(n)
                n += 1
              }
              val mag = re * re + im * im
              if (mag > bestMag) { bestMag = mag; best = k }
              k += 1
            }
            peaks(t) = best
            t += 1
          }
          for {
            t0 <- (0 until nFrames).iterator
            dt <- 1 to fanout
            if t0 + dt < nFrames
          } yield (m.media_id, t0,
            ((peaks(t0) & 0xff) << 16) | ((peaks(t0 + dt) & 0xff) << 8) | (dt & 0xff))
      }
    }.toDF("media_id", "frame_no", "hash")
  }

  /** Audio near-dup by OFFSET-DELTA VOTING over shared constellation
    * hashes — Wang's matching step: a true copy (even time-shifted) piles
    * its shared hashes onto ONE frame-offset delta, while chance hash
    * collisions scatter across deltas. Pairs whose best-aligned vote
    * count reaches `minVotes` are matches; `best_dt` recovers the shift.
    * The join moves only (id, frame, int32-hash) rows and buckets by
    * hash — never all-pairs, never the audio bytes.
    */
  def audioNearDup(fingerprints: DataFrame, minVotes: Int = 10): DataFrame = {
    val a = fingerprints.toDF("idA", "tA", "hash")
    val b = fingerprints.toDF("idB", "tB", "hash")
    a.join(b, Seq("hash"))
      .filter(col("idA") < col("idB"))
      .groupBy(col("idA"), col("idB"), (col("tB") - col("tA")).as("dt"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("idA"), col("idB"))
      .agg(max(struct(col("votes"), col("dt"))).as("__best"))
      .select(col("idA"), col("idB"),
        col("__best.votes").as("votes"), col("__best.dt").as("best_dt"))
      .filter(col("votes") >= minVotes)
  }

  /** Deterministic tonal WAV for fixtures: 1 s of 8 kHz mono PCM whose
    * dominant tone sits exactly on a DFT bin center and changes every
    * `segFrames` frames, the bin sequence keyed by `gid`; `member`
    * time-shifts the signal by whole hops (plus small additive noise), so
    * members of a gid are shifted near-copies the offset-delta vote must
    * align, and different gids share no peak sequence.
    */
  def toneWav(gid: Long, member: Long, rate: Int = 8000, seconds: Double = 1.0,
              frameSize: Int = 256, hop: Int = 128, segFrames: Int = 2): Array[Byte] = {
    val nS = (rate * seconds).toInt
    val shift = (member * 3 * hop).toInt
    def h64(a: Long, b: Long): Long = {
      var x = a * 0x9E3779B97F4A7C15L + b * 0xC2B2AE3D27D4EB4FL
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
      x
    }
    val samples = new Array[Short](nS)
    var i = 0
    while (i < nS) {
      val src = i + shift // shifted copy of the same underlying signal
      val seg = src / (segFrames * hop)
      val band = 2 + (((h64(gid, seg) % 28) + 28) % 28).toInt // bins 3..30
      val freq = (band + 1).toDouble * rate / frameSize // bin center
      val tone = 8000.0 * StrictMath.sin(2.0 * StrictMath.PI * freq * src / rate)
      val noise = ((h64(gid * 131 + member, i) % 201) - 100).toDouble
      samples(i) = math.max(Short.MinValue, math.min(Short.MaxValue,
        math.round(tone + noise))).toShort
      i += 1
    }
    pcmWavBytes(rate, samples)
  }

  /** Near-duplicate image pairs by banded Hamming join over perceptual
    * hashes — the image twin of SimHash text dedup (`Dedup.simhash`):
    * 8 bands of 8 bits bucket the corpus, candidates collide on ANY equal
    * band, and the exact `bit_count(xor)` verify keeps pairs within
    * `maxHamming`. With 8 bands, any pair within Hamming ≤ 7 shares at
    * least one clean band (pigeonhole) — recall is STRUCTURAL, not
    * probabilistic. Never all-pairs: at 100 TB the join is |bucket|²
    * per 8-bit-band bucket, and unrelated images (~32 bits apart) almost
    * never collide on a band.
    */
  def phashNearDup(hashes: DataFrame, maxHamming: Int = 7): DataFrame = {
    require(maxHamming <= 7, "8×8-bit banding guarantees recall only to Hamming 7")
    val bands = hashes.filter(col("decoded"))
      .select(col("media_id"), col("phash"),
        explode(expr("transform(sequence(0, 7), " +
          "b -> named_struct('band_no', b, 'band_val', shiftright(phash, b * 8) & 255L))"))
          .as("band"))
      .select(col("media_id"), col("phash"),
        col("band.band_no").as("band_no"), col("band.band_val").as("band_val"))
    val a = bands.toDF("idA", "hashA", "band_no", "band_val")
    val b = bands.toDF("idB", "hashB", "band_no", "band_val")
    a.join(b, Seq("band_no", "band_val"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        expr("CAST(bit_count(hashA ^ hashB) AS INT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
