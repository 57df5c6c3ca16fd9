package graft

import graft.text.TextAnalysis

/** Nearest-centroid (Rocchio) classification, hand-computed. */
class RocchioSpec extends SparkSuite {
  import spark.implicits._

  test("hand-computed centroids, cosines, and argmax") {
    val train = Seq((0L, "en", "cat dog dog"), (2L, "fr", "chat chien"))
      .toDF("doc_id", "lang", "text")
    val score = Seq((1L, "dog cat"), (3L, "chien"), (5L, "zebra"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.nearestCentroid(train, score, "lang")
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    // doc 1: dot(en)=1·1+1·2=3, dn=√2, cn=√5 → floor(1e6·3/√10)=948683
    // doc 3: dot(fr)=1, dn=1, cn=√2 → floor(1e6/√2)=707106
    // doc 5: no token overlap → no prediction
    assert(got == Seq((1L, "en", 948683L), (3L, "fr", 707106L)))
  }

  test("score ties break to the lexicographically smaller label") {
    val train = Seq((0L, "b", "x"), (2L, "a", "x")).toDF("doc_id", "lang", "text")
    val score = Seq((1L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.nearestCentroid(train, score, "lang")
      .as[(Long, String, Long)].head()
    assert(got == ((1L, "a", 1000000L)))
  }

  test("repeated tokens weight both tf and the centroid") {
    val train = Seq((0L, "a", "w w w"), (2L, "b", "w v")).toDF("doc_id", "lang", "text")
    val score = Seq((1L, "w w")).toDF("doc_id", "text")
    // dot(a)=2·3=6, cn(a)=3, dn=2 → cos=1.0; dot(b)=2·1, cn(b)=√2 →
    // cos=1/√2 — class a wins with a perfect score
    val got = TextAnalysis.nearestCentroid(train, score, "lang")
      .as[(Long, String, Long)].head()
    assert(got == ((1L, "a", 1000000L)))
  }
}
