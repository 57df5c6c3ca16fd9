package graft

import graft.text.TextAnalysis
import graft.pipeline.Sampling
import org.apache.spark.sql.functions._

/** Round-12 corpus-mining operators: per-doc TF-IDF keywords, PMI
  * collocations, and the leakage-safe cluster split. The driver oracle
  * hash-verifies the full arithmetic; these gates pin the SEMANTIC
  * contracts small SQL can't express as directly (a planted phrase tops
  * the collocation list, a distinctive term tops its document, linked
  * near-dups never straddle splits).
  */
class TextMiningSpec extends SparkSuite {
  import spark.implicits._

  test("keywords: a document's distinctive rare term outranks corpus-wide terms") {
    val docs = Seq(
      (1L, "the quick fox xylophone xylophone the"),
      (2L, "the quick dog barks the"),
      (3L, "the quick cat sleeps the"),
      (4L, "the quick bird sings the")
    ).toDF("doc_id", "text")
    val kw = TextAnalysis.keywords(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // 'xylophone' (df=1, tf=2) outscores every same-idf hapax and all
    // corpus-wide terms
    assert(kw.contains((1L, 1L, "xylophone")))
    // 'the'/'quick' appear in every doc (df=4) — minimal idf, never rank 1
    assert(!kw.exists(t => t._2 == 1L && (t._3 == "the" || t._3 == "quick")))
    // exactly k rows per doc
    assert(kw.groupBy(_._1).forall(_._2.length == 2))
  }

  test("collocations: a planted phrase tops the list; hapax pairs are guarded") {
    val phrase = Seq.fill(10)("new york city council").mkString(" ")
    val noise = (0 until 40).map(i => s"word$i filler${i % 7} common text here")
    val docs = (phrase +: noise).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val top = TextAnalysis.collocations(docs, k = 3, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // 'new york' (and its phrase siblings) occur 10x with unigram counts
    // 10 — the strongest association in the corpus
    assert(top.map(t => (t._1, t._2)).contains(("new", "york")), top.mkString(", "))
    assert(top.forall(_._3 >= 5L), "minCount guard must hold")
  }

  test("collocations score is the exact integer PMI argument") {
    // corpus: 'a b' 6 times, tokens: a x6, b x6, c x12 (c c pairs 6x)
    val docs = (Seq.fill(6)("a b") ++ Seq.fill(6)("c c")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = TextAnalysis.collocations(docs, k = 10, minCount = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    // N = 24 tokens; (a,b): 1000*6*24 div (6*6) = 4000; (c,c): 1000*6*24 div (12*12) = 1000
    assert(rows(("a", "b")) == ((6L, 4000L)))
    assert(rows(("c", "c")) == ((6L, 1000L)))
  }

  test("leakageSafeSplit: linked near-dups share a split, singletons follow assignSplits") {
    val n = 1000L
    val docs = spark.range(n).select(col("id").as("doc_id"))
    // link pairs (2k, 2k+1): each pair must land in ONE split
    val links = spark.range(n / 2).select(
      (col("id") * 2).as("idA"), (col("id") * 2 + 1).as("idB"))
    val out = Sampling.leakageSafeSplit(docs, "doc_id", links,
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "entity", "split")
      .as[(Long, Long, String)].collect()
    val byDoc = out.map(t => t._1 -> t._3).toMap
    (0L until n by 2).foreach { a =>
      assert(byDoc(a) == byDoc(a + 1), s"pair ($a, ${a + 1}) straddles splits")
    }
    // entity = cluster min id
    assert(out.forall(t => t._2 == t._1 - (t._1 % 2)))
    // distribution lands near the 80/10/10 weights (pairs move in twos)
    val dist = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(dist("train") > 700 && dist("train") < 900, dist.toString)
    // unlinked corpus degenerates to assignSplits-by-id exactly
    val solo = Sampling.leakageSafeSplit(docs, "doc_id",
      spark.emptyDataFrame.select(lit(0L).as("idA"), lit(0L).as("idB")).limit(0),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val plain = Sampling.assignSplits(docs, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(solo == plain)
  }
}
