package graft

import graft.text.TextAnalysis

/** Stupid-Backoff trigram LM: hand-computed scores covering every backoff
  * branch, plus invariances.
  */
class BackoffLmSpec extends SparkSuite {
  import spark.implicits._

  // train corpus: "a b c a b c" → N = 6, V = 3
  //   tri: "a b c"×2, "b c a"×1, "c a b"×1
  //   big: "a b"×2, "b c"×2, "c a"×1
  //   uni: a×2 b×2 c×2
  private val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")

  private def scores(scoreText: String): (Long, Long) = {
    val score = Seq((1L, scoreText)).toDF("doc_id", "text")
    val r = TextAnalysis.stupidBackoffScore(train, score)
      .as[(Long, Long, Long)].head()
    (r._2, r._3)
  }

  test("trigram hit and OOV floor, hand-computed") {
    // "a b c d": pos (a,b,c) c3=2/c2ctx("a b")=2 → 1.0 → 1e9 nano
    //            pos (b,c,d): no tri, no big "c d", d OOV →
    //              0.16·(0+1)/(6+3) → floor(17777777.77) = 17777777
    val (n, nano) = scores("a b c d")
    assert(n == 2)
    assert(nano == (1000000000L + 17777777L) / 2) // 508888888
  }

  test("bigram backoff and in-vocab unigram floor, hand-computed") {
    // "c a d a b": (c,a,d): d OOV floor → 17777777
    //              (a,d,a): no tri/big "d a"; uni a=2 → 0.16·3/9 →
    //                floor(53333333.33) = 53333333
    //              (d,a,b): big "a b"=2, c1ctx(a)=2 → 0.4·1.0 → 400000000
    val (n, nano) = scores("c a d a b")
    assert(n == 3)
    assert(nano == (17777777L + 53333333L + 400000000L) / 3) // 157037036
  }

  test("a doc phrased exactly like the training corpus scores all-trigram-hits") {
    val (n, nano) = scores("a b c a b")
    // (a,b,c): 2/2=1.0; (b,c,a): 1/2=0.5; (c,a,b): 1/1=1.0
    assert(n == 3 && nano == (1000000000L + 500000000L + 1000000000L) / 3)
  }

  test("docs under 3 tokens are excluded; held-out split never self-scores") {
    val score = Seq((1L, "a b"), (3L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.stupidBackoffScore(train, score)
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == Seq(3L))
  }

  test("pplBuckets: per-language terciles, monotone in score, all docs bucketed") {
    import org.apache.spark.sql.functions._
    // language X: 9 held-out docs with strictly increasing LM typicality
    // (more copies of the trained trigram "a b c"); language Y: 3 docs.
    // Terciles must split X 3/3/3 and Y 1/1/1, monotone by score.
    val rnd = new scala.util.Random(5)
    val docs = (0 until 9).map { i =>
      // i+1 trained trigrams then one OOV tail token
      val good = Seq.fill(i + 1)("a b c").mkString(" ")
      (2L * i + 1, s"$good zz${i}", "X")
    } ++ Seq((101L, "a b c", "Y"), (103L, "a b c a", "Y"), (105L, "a b c a b", "Y"))
    val score = docs.toDF("doc_id", "text", "lang")
    val res = TextAnalysis.pplBuckets(train.withColumn("lang", lit("X")), score)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(res.length == 12, "every held-out doc >= 3 tokens is bucketed")
    for (lang <- Seq("X", "Y")) {
      val l = res.filter(_._2 == lang).sortBy(_._3)
      val n = l.length
      assert(l.take(n / 3).forall(_._4 == "tail"))
      assert(l.slice(n / 3, 2 * n / 3).forall(_._4 == "middle"))
      assert(l.drop(2 * n / 3).forall(_._4 == "head"))
    }
  }
}
