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
}
