package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity
import graft.pipeline.Sampling

/** Binary sign-bit signatures + Hamming top-k, and curriculum staging. */
class BinaryCurriculumSpec extends SparkSuite {

  test("quantizeBinary packs sign bits 32 per word (independent check)") {
    import spark.implicits._
    val v = (0 until 40).map(i => if (i % 3 == 0) 1f else -1f)
    val df = Seq((1L, v)).toDF("vec_id", "embedding")
    val sig = Similarity.quantizeBinary(df).head().getSeq[Long](1)
    assert(sig.length == 2) // ceil(40/32)
    val want0 = (0 until 32).filter(_ % 3 == 0).map(1L << _).sum
    val want1 = (32 until 40).filter(_ % 3 == 0).map(i => 1L << (i - 32)).sum
    assert(sig == Seq(want0, want1))
  }

  test("zero dims quantize to 0 bits; hamming distance is exact popcount") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1f, -1f, 0f, 1f)),   // bits 0,3 -> 0b1001 = 9
      (2L, Seq(1f, 1f, 1f, 1f)),    // 0b1111 = 15
      (3L, Seq(-1f, -1f, -1f, 0f))  // 0
    ).toDF("vec_id", "embedding")
    val sigs = Similarity.quantizeBinary(df)
    val m = sigs.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(m(1L) == Seq(9L) && m(2L) == Seq(15L) && m(3L) == Seq(0L))
    val top = Similarity.hammingTopK(sigs, Array(9L), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // d(1)=0, d(2)=popcount(9^15)=2, d(3)=popcount(9)=2 -> tie by id
    assert(top.toSeq == Seq((1L, 0L), (2L, 2L), (3L, 2L)))
  }

  test("hamming top-k retrieves same-cluster vectors (the sketch's real contract)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val centers = Vector.fill(4)(Array.fill(32)(rnd.nextFloat() * 2f - 1f))
    val df = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f).toSeq)
    }.toDF("vec_id", "embedding")
    val sigs = Similarity.quantizeBinary(df)
    val qSig = sigs.filter(col("vec_id") === 8)
      .select("sig").head().getSeq[Long](0).toArray
    // sign bits keep CLUSTER structure (coarse recall); they deliberately
    // drop magnitude, so fine-grain cosine rank agreement is NOT the
    // contract — same-cluster membership of the shortlist is
    val ham = Similarity.hammingTopK(sigs, qSig, 10)
      .collect().map(_.getLong(0))
    assert(ham.count(_ % 4 == 0) >= 8,
      s"top-10 should be mostly cluster 0: ${ham.mkString(",")}")
  }

  test("curriculumStages: rare-word docs land in later stages, boundaries exact") {
    import spark.implicits._
    // 8 docs of common words, 4 with progressively rarer vocabulary
    val docs = ((0 until 8).map(i => (i.toLong, "the cat sat on the mat")) ++
      Seq((8L, "the cat zygote"), (9L, "quark boson zygote"),
          (10L, "quark xylem phloem"), (11L, "abstruse recondite esoteric"))).toDF("doc_id", "text")
    val out = Sampling.curriculumStages(docs, stages = 4).orderBy("doc_id").collect()
    val stage = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((0L until 8L).forall(stage(_) == 1L), "common docs in stage 1")
    assert(stage(11L) == 4L, "all-hapax doc in the last stage")
    assert(stage(8L) >= 2L && stage(9L) > stage(8L) - 1, "mixed docs in between")
    // difficulty is the tf-weighted integer mean of (1000 * nDocs) div df
    val d0 = out.find(_.getLong(0) == 0L).get.getLong(1)
    // doc 0 tokens: the×2 (df 9), cat (df 9 — also in doc 8), sat/on/mat (df 8)
    val n = 12L
    def rar(dfT: Long) = (1000L * n) / dfT
    val want = (3 * rar(9) + 3 * rar(8)) / 6
    assert(d0 == want, s"got $d0 want $want")
  }

  test("curriculumStages is invariant to partitioning") {
    import spark.implicits._
    val docs = (0 until 40).map(i =>
      (i.toLong, s"w${i % 7} w${i % 3} common word")).toDF("doc_id", "text")
    val a = Sampling.curriculumStages(docs.repartition(7), 4).orderBy("doc_id").collect()
    val b = Sampling.curriculumStages(docs.coalesce(1), 4).orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
