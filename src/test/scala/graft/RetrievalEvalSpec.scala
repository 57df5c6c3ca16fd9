package graft

import org.apache.spark.sql.functions._

import graft.text.RetrievalEval

/** MRR / recall@k / nDCG@k, hand-computed on a pinned run. */
class RetrievalEvalSpec extends SparkSuite {
  import spark.implicits._

  test("discount constants are the floor(1e9/log2(r+1)) table") {
    val d = RetrievalEval.discountMicro(3).toMap
    assert(d(1) == 1000000000L) // log2(2)=1
    assert(d(2) == math.floor(1e9 / (math.log(3) / math.log(2))).toLong)
    assert(RetrievalEval.discountValuesSql(2) == s"(1, 1000000000), (2, ${d(2)})")
  }

  test("hand-computed metrics: perfect, partial, and miss queries") {
    // q1: rel docs {10, 11}, ranked 10,11 first → perfect
    // q2: rel docs {20, 21, 22}, only 21 retrieved at rank 3 (k=3)
    // q3: rel doc {30}, not retrieved in top-3
    val runs = Seq(
      (1L, 10L, 9.0), (1L, 11L, 8.0), (1L, 12L, 7.0),
      (2L, 25L, 9.0), (2L, 26L, 8.0), (2L, 21L, 7.0), (2L, 22L, 0.5),
      (3L, 35L, 9.0), (3L, 36L, 8.0), (3L, 37L, 7.0), (3L, 30L, 1.0)
    ).toDF("query_id", "doc_id", "score")
    val qrels = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (2L, 22L), (3L, 30L))
      .toDF("query_id", "doc_id")
    val got = RetrievalEval.evaluate(runs, qrels, k = 3)
      .orderBy("query_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    val d = RetrievalEval.discountMicro(3).toMap
    // q1: fr=1 → mrr 1e9; recall 2/2 → 1e9; dcg=d1+d2, idcg=d1+d2 → 1e6
    assert(got(0) == ((1L, 2L, 1000000000L, 1000000000L, 1000000L)))
    // q2: fr=3 → floor(1e9/3); recall 1/3 → floor(1e9/3); dcg=d3,
    //     idcg=d1+d2+d3 (n_rel=3 >= k)
    assert(got(1) == ((2L, 3L, 333333333L, 333333333L,
      math.floor((1e6 * d(3)) / (d(1) + d(2) + d(3))).toLong)))
    // q3: no hit in top-3 → all zeros
    assert(got(2) == ((3L, 1L, 0L, 0L, 0L)))
  }

  test("rank ties break deterministically on doc_id; k bounds IDCG") {
    val runs = Seq((1L, 5L, 1.0), (1L, 4L, 1.0)).toDF("query_id", "doc_id", "score")
    val qrels = Seq((1L, 5L), (1L, 4L), (1L, 99L)).toDF("query_id", "doc_id")
    val got = RetrievalEval.evaluate(runs, qrels, k = 2)
      .as[(Long, Long, Long, Long, Long)].head()
    val d = RetrievalEval.discountMicro(2).toMap
    // doc 4 ranks 1 (tie broken ascending), both hit; n_rel=3 but IDCG
    // caps at k=2
    assert(got == ((1L, 3L, 1000000000L,
      math.floor((1e9 * 2) / 3.0).toLong,
      1000000L)))
  }
}
