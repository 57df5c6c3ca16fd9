package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Constellation audio fingerprinting + offset-delta-vote near-dup. */
class AudioDedupSpec extends SparkSuite {
  import spark.implicits._

  test("planted shifted near-copies are found exactly, with the shift recovered") {
    val rows = (0L until 36L).map(i => (i, Multimodal.toneWav(i / 3, i % 3)))
      .toDF("media_id", "payload")
    val media = Multimodal.asMediaTable(spark, rows, "media_id", "payload", "audio")
    val fps = Multimodal.audioFingerprints(media)
    val got = Multimodal.audioNearDup(fps, minVotes = 50)
      .as[(Long, Long, Long, Long)].collect()
    val pairs = got.map(r => (r._1, r._2)).toSet
    val truth = (for {
      g <- 0L until 12L
      a <- g * 3 until g * 3 + 3
      b <- a + 1 until g * 3 + 3
    } yield (a, b)).toSet
    assert(truth.subsetOf(pairs), s"missed ${truth.diff(pairs).size} planted pairs")
    assert(pairs.subsetOf(truth), s"${pairs.diff(truth).size} false positives")
    // members shift by member*3 hops: the (m, m+1) vote alignment must
    // recover a 3-frame offset (sign depends on direction)
    got.filter(r => r._2 == r._1 + 1).foreach { r =>
      assert(math.abs(r._4) == 3, s"pair (${r._1},${r._2}) best_dt=${r._4}")
    }
  }

  test("vote margins: same-group floors far above cross-group ceilings") {
    val rows = (0L until 30L).map(i => (i, Multimodal.toneWav(i / 3, i % 3)))
      .toDF("media_id", "payload")
    val media = Multimodal.asMediaTable(spark, rows, "media_id", "payload", "audio")
    val all = Multimodal.audioNearDup(Multimodal.audioFingerprints(media), minVotes = 1)
      .withColumn("same", floor(col("idA") / 3) === floor(col("idB") / 3))
      .groupBy("same").agg(min("votes").as("mn"), max("votes").as("mx"))
      .as[(Boolean, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(all(true)._1 >= 50, s"same-group vote floor ${all(true)._1}")
    assert(!all.contains(false) || all(false)._2 < 50,
      s"cross-group vote ceiling ${all.get(false)}")
  }

  test("non-audio payloads produce no fingerprints") {
    val rows = Seq((1L, Array[Byte](9, 9, 9))).toDF("media_id", "payload")
    val media = Multimodal.asMediaTable(spark, rows, "media_id", "payload", "audio")
    assert(Multimodal.audioFingerprints(media).count() == 0)
  }
}
