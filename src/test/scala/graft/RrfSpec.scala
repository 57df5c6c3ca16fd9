package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis
import graft.similarity.Similarity

/** Reciprocal-rank fusion: exact integer arithmetic against hand-computed
  * values, multi-retriever/multi-query shapes, and the ranked dense
  * shortlist helper it consumes.
  */
class RrfSpec extends SparkSuite {

  private def ranking(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("q_id", "rank", "doc_id")
  }

  test("fused scores are exact integer nano-units (hand-computed)") {
    // retriever A: doc 10 rank 1, doc 20 rank 2; retriever B: doc 20 rank 1
    val a = ranking((0L, 1L, 10L), (0L, 2L, 20L))
    val b = ranking((0L, 1L, 20L))
    val got = TextAnalysis.rrfFuse(Seq(a, b), k = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val c1 = 1000000000L / 61  // rank 1
    val c2 = 1000000000L / 62  // rank 2
    // doc 20: c2 + c1 beats doc 10: c1
    assert(got.toSeq == Seq((1L, 20L, c1 + c2), (2L, 10L, c1)))
  }

  test("ties break by ascending doc id; k bounds the output per query") {
    val a = ranking((0L, 1L, 30L), (0L, 2L, 40L))
    val b = ranking((0L, 1L, 40L), (0L, 2L, 30L))
    val got = TextAnalysis.rrfFuse(Seq(a, b), k = 1).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 30L))) // equal scores -> lower id first
  }

  test("queries fuse independently") {
    val a = ranking((0L, 1L, 1L), (1L, 1L, 2L))
    val b = ranking((0L, 1L, 1L), (1L, 1L, 3L))
    val got = TextAnalysis.rrfFuse(Seq(a, b), k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val c1 = 1000000000L / 61
    assert(got.filter(_._1 == 0L).toSeq == Seq((0L, 1L, 1L)))
    // q 1: docs 2 and 3 each got one rank-1 contribution -> tie, id order
    assert(got.filter(_._1 == 1L).map(t => (t._2, t._3)).toSeq ==
      Seq((1L, 2L), (2L, 3L)))
  }

  test("rankedTopK emits (q_id, rank, id) ranks 1..k by rounded cosine") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0f, 1f)),
      (4L, Seq(1f, 0.01f))).toDF("vec_id", "embedding")
    val got = Similarity.rankedTopK(df, Array(1f, 0f), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._2).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_._3).toSeq == Seq(1L, 4L, 2L)) // by cosine desc
    assert(got.forall(_._1 == 0L))
  }
}
