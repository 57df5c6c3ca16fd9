package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal: REAL JDK image codec (javax.imageio decode, Graphics2D
  * resample, PNG encode), REAL audio codec (javax.sound.sampled), and a
  * REAL pure-JDK RIFF/AVI video demuxer (Motion-JPEG / Motion-PNG);
  * deterministic byte-fold fallback only for payloads none of those
  * decode.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val payloads = (0 until 20).map { i =>
    (i.toLong, Array.tabulate[Byte](1000 + i * 100)(j => ((i * 31 + j) % 127).toByte))
  }

  // real PNGs: id i → (2+i) × (1+i%5), solid color (i*11, i*23, i*41) mod 256
  private lazy val pngs = (0 until 12).map { i =>
    (i.toLong, Multimodal.solidPng(2 + i, 1 + i % 5,
      (i * 11) % 256, (i * 23) % 256, (i * 41) % 256))
  }

  test("real codec: PNG encode → ImageIO decode round-trips dims and channel means") {
    val bytes = Multimodal.solidPng(5, 3, 10, 20, 30)
    val img = Multimodal.decodeImage(bytes).get
    assert(img.getWidth == 5 && img.getHeight == 3)
    assert(Multimodal.channelMeans(img) == ((10L, 20L, 30L)))
    // non-image payloads must decode to None, never throw
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
  }

  test("imageStats: real decode per partition, exact dims/means, decoded flag") {
    val df = pngs.toDF("id", "data")
    val media = Multimodal.asMediaTable(spark, df, "id", "data", "image")
    val stats = Multimodal.imageStats(media).collect().sortBy(_.media_id)
    assert(stats.length == pngs.length && stats.forall(_.decoded))
    stats.foreach { st =>
      val i = st.media_id.toInt
      assert(st.width == 2 + i && st.height == 1 + i % 5)
      assert(st.mean_r == (i * 11) % 256 && st.mean_g == (i * 23) % 256 &&
        st.mean_b == (i * 41) % 256)
    }
    // a corrupt payload yields decoded=false zeros, not a stage failure
    val bad = Seq((99L, Array[Byte](9, 9, 9))).toDF("id", "data")
    val badStats = Multimodal.imageStats(
      Multimodal.asMediaTable(spark, bad, "id", "data", "image")).collect()
    assert(badStats.length == 1 && !badStats(0).decoded && badStats(0).width == 0)
  }

  test("resize: real Graphics2D half-size keeps solid color, dims follow max(1, v/f)") {
    val df = pngs.toDF("id", "data")
    val media = Multimodal.asMediaTable(spark, df, "id", "data", "image")
    val halved = Multimodal.imageStats(Multimodal.resize(media, factor = 2))
      .collect().sortBy(_.media_id)
    halved.foreach { st =>
      val i = st.media_id.toInt
      assert(st.decoded, "resized payload must re-decode as a real PNG")
      assert(st.width == math.max(1, (2 + i) / 2))
      assert(st.height == math.max(1, (1 + i % 5) / 2))
      assert(st.mean_r == (i * 11) % 256 && st.mean_g == (i * 23) % 256 &&
        st.mean_b == (i * 41) % 256)
    }
    // factor beyond the dims clamps to 1×1
    val tiny = Multimodal.imageStats(Multimodal.resize(media, factor = 1000)).collect()
    assert(tiny.forall(st => st.width == 1 && st.height == 1))
  }

  test("extractFeatures: decodable images carry [w,h,r,g,b] real features") {
    val df = pngs.take(4).toDF("id", "data")
    val media = Multimodal.asMediaTable(spark, df, "id", "data", "image")
    val feats = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.media_id)
    feats.foreach { f =>
      val i = f.media_id.toInt
      assert(f.feature.take(5).toSeq == Seq[Float](2 + i, 1 + i % 5,
        (i * 11) % 256, (i * 23) % 256, (i * 41) % 256))
    }
  }

  test("feature extraction: deterministic, right shape, bytes never null-crash") {
    val df = payloads.toDF("id", "data")
    val media = Multimodal.asMediaTable(spark, df, "id", "data", "image")
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.media_id)
    assert(f1.length == 20)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.feature.toSeq == b.feature.toSeq, "stub decode must be deterministic")
    }
    assert(f1.forall(_.feature.length == 8))
    assert(f1.forall(f => f.n_bytes == 1000 + f.media_id * 100))
  }

  test("frame sampling fallback: non-AVI payloads chunk every Nth fixed-size slice, undecoded") {
    val df = payloads.take(3).toDF("id", "data")
    val media = Multimodal.asMediaTable(spark, df, "id", "data", "video")
    val frames = Multimodal.frameSample(media, everyNth = 1, frameBytes = 256)
    val byId = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(byId(0L) == 1000 / 256) // 3 full frames... plus remainder handling
    assert(frames.filter($"frame_bytes" > 256).count() == 0)
    assert(frames.filter($"decoded").count() == 0, "arbitrary bytes never claim a decode")
  }

  private def jpegBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("AVI demux round-trip: Motion-JPEG frames come back byte-identical and decodable") {
    val imgs = (0 until 5).map { i =>
      val img = new java.awt.image.BufferedImage(32, 24,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(i * 40 % 256, i * 80 % 256, i * 20 % 256))
      g.fillRect(0, 0, 32, 24); g.dispose()
      jpegBytes(img)
    }
    val avi = Multimodal.aviBytes(imgs, 32, 24, fps = 5, codec = "MJPG")
    val frames = Multimodal.demuxAvi(avi)
    assert(frames.size == 5, "every 00dc chunk demuxes")
    frames.zip(imgs).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want), "frame payloads are byte-identical")
    }
    frames.foreach { f =>
      val img = Multimodal.decodeImage(f)
      assert(img.exists(i => i.getWidth == 32 && i.getHeight == 24),
        "each demuxed JPEG frame decodes with the container's dims")
    }
  }

  test("AVI demux degrades: garbage is Nil, truncation salvages the frames that fit") {
    assert(Multimodal.demuxAvi(null) == Nil)
    assert(Multimodal.demuxAvi(Array[Byte](1, 2, 3)) == Nil)
    assert(Multimodal.demuxAvi("RIFFxxxxWAVE".getBytes("US-ASCII")) == Nil)
    val imgs = (0 until 4).map(i => Multimodal.solidPng(8, 8, i, i, i))
    val avi = Multimodal.aviBytes(imgs, 8, 8, codec = "MPNG")
    val full = Multimodal.demuxAvi(avi)
    assert(full.size == 4)
    // cut inside the last movi chunk: earlier frames still come back
    val cut = java.util.Arrays.copyOf(avi, avi.length - imgs.last.length - 200)
    val salvaged = Multimodal.demuxAvi(cut)
    assert(salvaged.nonEmpty && salvaged.size < 4)
    salvaged.zip(imgs).foreach { case (g, w) => assert(java.util.Arrays.equals(g, w)) }
    // corrupt SIZE field near 2^31: Int arithmetic would overflow into a
    // negative chunk end and THROW from copyOfRange; the contract is
    // salvage-then-stop. Patch the last frame chunk's size to 0x7FFFFFF0.
    val evil = avi.clone()
    val lastFrame = imgs.last
    def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    // the last REAL '00dc' chunk header (size field == frame length) —
    // a bare fourcc search would land on the idx1 index entries instead
    val idx = Range(0, evil.length - 8).lastIndexWhere(o =>
      evil(o) == '0'.toByte && evil(o + 1) == '0'.toByte &&
        evil(o + 2) == 'd'.toByte && evil(o + 3) == 'c'.toByte &&
        u32(evil, o + 4) == lastFrame.length)
    assert(idx > 0)
    evil(idx + 4) = 0xf0.toByte; evil(idx + 5) = 0xff.toByte
    evil(idx + 6) = 0xff.toByte; evil(idx + 7) = 0x7f.toByte
    val beforeEvil = Multimodal.demuxAvi(evil)
    assert(beforeEvil.size == 3, s"expected the 3 intact frames, got ${beforeEvil.size}")
    beforeEvil.zip(imgs).foreach { case (g, w) => assert(java.util.Arrays.equals(g, w)) }
  }

  test("frameSample: real demux + real per-frame decode, exact solid-color means") {
    val vids = (0L until 3L).map { id =>
      val frames = (0 until 4).map(i =>
        Multimodal.solidPng(10, 6, (id * 50 + i).toInt, i * 30, 255 - i * 10))
      (id, Multimodal.aviBytes(frames, 10, 6, codec = "MPNG"))
    }
    val media = Multimodal.asMediaTable(spark, vids.toDF("id", "data"), "id", "data", "video")
    val out = Multimodal.frameSample(media, everyNth = 2)
      .select("media_id", "frame_no", "decoded", "width", "height",
        "mean_r", "mean_g", "mean_b")
      .as[(Long, Int, Boolean, Int, Int, Long, Long, Long)].collect().toSet
    val want = (for { id <- 0L until 3L; i <- 0 until 4 by 2 } yield
      (id, i, true, 10, 6, id * 50 + i, (i * 30).toLong, (255 - i * 10).toLong)).toSet
    assert(out == want)
  }

  test("media table round-trips parquet with binary payloads intact") {
    val df = payloads.toDF("id", "data")
    val media = Multimodal.asMediaTable(spark, df, "id", "data", "image")
    val dir = tmpDir("graft-media")
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[Multimodal.MediaRow]
      .collect().sortBy(_.media_id)
    assert(back.length == payloads.length)
    back.zip(payloads.sortBy(_._1)).foreach { case (m, (id, bytes)) =>
      assert(m.media_id == id && java.util.Arrays.equals(m.bytes, bytes))
      assert(m.kind == "image" && m.meta != null)
    }
  }

  test("resize: pooled length, averaged bytes, metadata scaled, composes with features") {
    val df = payloads.toDF("id", "data")
    val media = Multimodal.asMediaTable(spark, df, "id", "data", "image")
    val resized = Multimodal.resize(media, factor = 4).collect().sortBy(_.media_id)
    resized.zip(payloads.sortBy(_._1)).foreach { case (m, (id, orig)) =>
      assert(m.media_id == id)
      assert(m.bytes.length == orig.length / 4)
      // first output byte is the average of the first 4 input bytes
      val exp = (orig.take(4).map(_ & 0xff).sum / 4).toByte
      assert(m.bytes(0) == exp)
    }
    // deterministic run-to-run, and the output still feeds extractFeatures
    val again = Multimodal.resize(media, factor = 4).collect().sortBy(_.media_id)
    resized.zip(again).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a.bytes, b.bytes))
    }
    val feats = Multimodal.extractFeatures(
      Multimodal.resize(media, factor = 4), dim = 8).collect()
    assert(feats.length == payloads.length && feats.forall(_.feature.length == 8))
  }

  test("non-video rows are excluded from frame sampling") {
    val df = payloads.take(3).toDF("id", "data")
    val media = Multimodal.asMediaTable(spark, df, "id", "data", "audio")
    assert(Multimodal.frameSample(media).count() == 0)
  }

  test("audio codec round-trips: WAV encode then AudioSystem decode returns the samples") {
    val samples = Array.tabulate(330)(i => ((i * 7919) % 30000 - 15000).toShort)
    val wav = Multimodal.pcmWavBytes(8000, samples)
    // a real RIFF/WAVE container came out
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val Some((rate, back)) = Multimodal.decodeAudio(wav)
    assert(rate == 8000)
    assert(back.sameElements(samples), "PCM decode must be lossless")
    // corrupt payloads degrade, not throw
    assert(Multimodal.decodeAudio("not audio".getBytes).isEmpty)
    assert(Multimodal.decodeAudio(null).isEmpty)
    assert(Multimodal.decodeAudio(wav.take(10)).isEmpty)
  }

  test("audioWindows: per-window peak and exact sum of squares from a real decode") {
    val samples = Array.tabulate(330)(i => ((i % 100) - 50).toShort) // 3 windows: 160,160,10
    val df = Seq((1L, Multimodal.pcmWavBytes(16000, samples)),
      (2L, "junk payload".getBytes)).toDF("id", "data")
    val media = Multimodal.asMediaTable(spark, df, "id", "data", "audio")
    val rows = Multimodal.audioWindows(media, windowSamples = 160)
      .collect().sortBy(r => (r.media_id, r.window_no))
    assert(rows.forall(_.media_id == 1L), "non-decodable payload must emit no rows")
    assert(rows.map(_.w_n).toSeq == Seq(160, 160, 10))
    assert(rows.forall(_.sample_rate == 16000))
    assert(rows.forall(_.duration_ms == 330L * 1000 / 16000))
    rows.foreach { r =>
      val slice = samples.slice(r.window_no * 160, r.window_no * 160 + r.w_n)
      assert(r.w_peak == slice.map(v => math.abs(v.toInt)).max)
      assert(r.w_sumsq == slice.map(v => v.toLong * v.toLong).sum)
    }
  }
}
