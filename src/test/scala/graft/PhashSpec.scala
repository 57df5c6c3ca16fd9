package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** DCT perceptual hash + banded-Hamming image near-dup. */
class PhashSpec extends SparkSuite {
  import spark.implicits._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("phash64 is deterministic and decode-stable through PNG round-trips") {
    val png = Multimodal.patternPng(gid = 7, member = 0)
    val img = Multimodal.decodeImage(png).get
    val h1 = Multimodal.phash64(img)
    val h2 = Multimodal.phash64(Multimodal.decodeImage(Multimodal.encodePng(img)).get)
    assert(h1 == h2, "hash must survive a lossless re-encode")
    assert(h1 == Multimodal.phash64(Multimodal.decodeImage(Multimodal.patternPng(7, 0)).get))
  }

  test("members of one pattern group hash within a few bits; distinct groups are far") {
    val gids = 0L until 40L
    val hashes = gids.map { g =>
      (0L until 3L).map(mm =>
        Multimodal.phash64(Multimodal.decodeImage(Multimodal.patternPng(g, mm)).get))
    }
    // near-dup members: tiny pixel noise must not move low-freq structure
    hashes.foreach { hs =>
      for (a <- hs; b <- hs)
        assert(ham(a, b) <= 4, s"same-group Hamming ${ham(a, b)} too large")
    }
    // unrelated patterns: far apart (random baseline ~32 bits)
    val reps = hashes.map(_.head)
    var minCross = 64
    for (i <- reps.indices; j <- reps.indices if i < j)
      minCross = math.min(minCross, ham(reps(i), reps(j)))
    assert(minCross > 12, s"cross-group Hamming $minCross suspiciously low")
  }

  test("scaling an image preserves its hash (resample invariance)") {
    val img = Multimodal.decodeImage(Multimodal.patternPng(11, 0, size = 64)).get
    val small = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = small.createGraphics()
    g2.drawImage(img, 0, 0, 32, 32, null); g2.dispose()
    assert(ham(Multimodal.phash64(img), Multimodal.phash64(small)) <= 6)
  }

  test("phashNearDup finds exactly the planted near-duplicate groups") {
    val rows = (0L until 120L).map { i =>
      val gid = i / 4
      (i, Multimodal.patternPng(gid, i % 4))
    }.toDF("media_id", "payload")
    val media = Multimodal.asMediaTable(spark, rows, "media_id", "payload", "image")
    val hashes = Multimodal.imagePhash(media)
    assert(hashes.filter(!col("decoded")).count() == 0)
    val pairs = Multimodal.phashNearDup(hashes, maxHamming = 7)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    val truth = (for {
      g <- 0L until 30L
      a <- g * 4 until g * 4 + 4
      b <- a + 1 until g * 4 + 4
    } yield (a, b)).toSet
    assert(truth.subsetOf(pairs),
      s"missed ${truth.diff(pairs).size} planted near-dup pairs")
    assert(pairs.subsetOf(truth),
      s"${pairs.diff(truth).size} false-positive cross-group pairs")
  }

  test("corrupt payloads degrade to decoded=false rows, not failures") {
    val rows = Seq((1L, Array[Byte](1, 2, 3)), (2L, Multimodal.patternPng(0, 0)))
      .toDF("media_id", "payload")
    val media = Multimodal.asMediaTable(spark, rows, "media_id", "payload", "image")
    val got = Multimodal.imagePhash(media).orderBy("media_id")
      .as[(Long, Boolean, Long)].collect()
    assert(got(0)._2 == false && got(1)._2 == true)
  }
}
