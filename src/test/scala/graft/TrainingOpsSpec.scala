package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Sampling
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Training-mix and corpus-stats operators: split assignment, interleave
  * fairness, vocabulary top-k, and int8 quantization invariants.
  */
class TrainingOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b a", "s1"), (2L, "b c", "s1"), (3L, "a", "s1"), (4L, "c c c", "s1"),
    (5L, "a b", "s2"), (6L, "b", "s2"), (7L, "a a b b", "s2"), (8L, "c", "s2")
  ).toDF("doc_id", "text", "source")

  test("topTokens: counts the corpus vocabulary, orders by count desc then token") {
    val top = TextAnalysis.topTokens(docs, 10).as[(String, Long)].collect()
    assert(top.toSeq == Seq(("a", 6L), ("b", 6L), ("c", 5L)))
  }

  test("topNgrams: bigrams only from docs with >= 2 tokens") {
    val top = TextAnalysis.topNgrams(docs, 2, 3).as[(String, Long)].collect()
    // "a b" appears in docs 1, 5, 7; single-token docs 3/6/8 contribute none
    assert(top.head == ("a b", 3L))
    assert(top.map(_._1).forall(_.split(" ").length == 2))
  }

  test("bigramNovelty: shared bigrams counted once per doc, novel fraction exact") {
    val corpus = Seq(
      (1L, "x y z w"),   // bigrams: "x y" (shared with doc 2), "y z", "z w"
      (2L, "x y q"),     // "x y" shared, "y q" novel
      (3L, "solo")       // < 2 tokens → excluded
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bigramNovelty(corpus)
      .select("doc_id", "n_bigrams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((1L, 3L, 2L, 0.6667), (2L, 2L, 1L, 0.5)))
  }

  test("domainMixture: weights proportional to sqrt(size), sum to 1") {
    val df = Seq(
      (1L, "d1", 100L), (2L, "d1", 300L),   // d1 size 400 → sqrt 20
      (3L, "d2", 100L)                      // d2 size 100 → sqrt 10
    ).toDF("doc_id", "source", "n_chars")
    val r = Sampling.domainMixture(df, "source", "n_chars")
      .select("source", "n_docs", "size_sum", "weight")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    assert(r.toSeq == Seq(("d1", 2L, 400L, 0.666667), ("d2", 1L, 100L, 0.333333)))
    assert(math.abs(r.map(_._4).sum - 1.0) < 1e-6)
  }

  test("headByBudget: bucketed prefix scan equals the naive global running sum") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 500).toDF("id")
      .withColumn("sz", (col("id") % 37 + 1).cast("long"))
    val budget = 3000L
    // naive single-reducer oracle: global running sum in hash order
    val pos = Sampling.hashMod(col("id"), 1L << 32)
    val naive = df.withColumn("__p", pos)
      .withColumn("run", sum(col("sz")).over(Window.orderBy(col("__p"), col("id"))))
      .filter(col("run") <= budget).select("id").as[Long].collect().toSet
    for (nBuckets <- Seq(1, 7, 256)) {
      val got = graft.pipeline.Packing.headByBudget(df, "id", "sz", budget, nBuckets)
        .select("id").as[Long].collect().toSet
      assert(got == naive, s"nBuckets=$nBuckets")
    }
    // selected set is a prefix: total size within budget, adding the next
    // doc in hash order would exceed it
    val total = df.filter(col("id").isInCollection(naive)).agg(sum("sz"))
      .as[Long].head()
    assert(total <= budget)
  }

  test("assignSplits: total partition, deterministic, matches hash thresholds") {
    val ids = spark.range(0, 2000).toDF("id")
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val assigned = Sampling.assignSplits(ids, "id", splits)
    val counts = assigned.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000)
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // threshold semantics: split is a pure function of hashMod(id, 100)
    val bad = assigned
      .withColumn("pos", Sampling.hashMod(col("id"), 100L))
      .filter(
        (col("pos") < 80 && col("split") =!= "train") ||
        (col("pos") >= 80 && col("pos") < 90 && col("split") =!= "val") ||
        (col("pos") >= 90 && col("split") =!= "test"))
      .count()
    assert(bad == 0)
    // repartitioning must not change any assignment
    val again = Sampling.assignSplits(ids.repartition(7), "id", splits)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("interleaved: every prefix of k*groups rows is group-balanced") {
    val rows = Sampling.interleaved(docs, "source", "doc_id")
      .select("rn", "source", "doc_id").as[(Long, String, Long)].collect()
    assert(rows.length == 8)
    // equal-size groups: positions 2k and 2k+1 hold rank k+1 of each source
    rows.grouped(2).zipWithIndex.foreach { case (pair, k) =>
      assert(pair.map(_._2).toSet == Set("s1", "s2"), s"prefix $k unbalanced")
      assert(pair.forall(_._1 == k + 1))
    }
  }

  test("quantizeInt8: codes in [-127,127], max-abs element hits ±127, zero vec is zeros") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),
      (3L, Array(2.0f, 1.0f, -0.5f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(vecs)
      .select("vec_id", "q").as[(Long, Seq[Long])].collect().toMap
    assert(q(1L) == Seq(64L, -127L, 32L))   // floor(±x/maxabs*127+0.5)
    assert(q(2L) == Seq(0L, 0L, 0L))
    assert(q(3L) == Seq(127L, 64L, -32L))   // floor(-31.75 + 0.5) = -32
    assert(q.values.flatten.forall(v => v >= -127 && v <= 127))
  }

  test("oovRate: counts token occurrences outside the top-k vocabulary") {
    // vocabSize 2 → vocab {a, b} (counts 6/6 beat c's 5); c is OOV
    val r = TextAnalysis.oovRate(docs, vocabSize = 2)
      .select("doc_id", "n_tokens", "n_oov").as[(Long, Long, Long)]
      .collect().map { case (id, n, oov) => id -> ((n, oov)) }.toMap
    assert(r(1L) == ((3L, 0L)))  // "a b a"
    assert(r(2L) == ((2L, 1L)))  // "b c" — c is OOV
    assert(r(4L) == ((3L, 3L)))  // "c c c"
    assert(r(8L) == ((1L, 1L)))  // "c"
  }

  test("redactPii: emails and phones replaced and counted, clean text untouched") {
    val df = Seq(
      (1L, "write to al.bo%x@ex-a.co or call 555-0199 now"),
      (2L, "no pii here 12-3")).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df)
      .select("doc_id", "n_emails", "n_phones", "redacted")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 1L, 1L, "write to <EMAIL> or call <PHONE> now")))
    assert(r(1) == ((2L, 0L, 0L, "no pii here 12-3")))
  }

  test("approx_count_distinct: HLL estimate within 5% of exact") {
    val toks = spark.range(0, 20000)
      .select(concat(lit("tok"), (col("id") % 1000)).as("token"))
    val row = toks.agg(
      count_distinct(col("token")).as("exact"),
      approx_count_distinct(col("token"), 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(exact == 1000L)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"HLL estimate $approx too far from exact $exact")
  }

  test("dedupSegments: strips segments shared across docs, keeps order, empties boilerplate-only docs") {
    val df = Seq(
      (1L, "a b c d e f"), // 2-token segs: "a b" | "c d" | "e f"
      (2L, "x y a b"),     // segs: "x y" | "a b"
      (3L, "p q"),         // segs: "p q"
      (4L, "a b")          // entirely boilerplate
    ).toDF("doc_id", "text")
    val r = graft.dedup.Dedup.dedupSegments(df, segTokens = 2, minDf = 2)
      .select("doc_id", "n_segs", "n_removed", "cleaned")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 3L, 1L, "c d e f")))
    assert(r(1) == ((2L, 2L, 1L, "x y")))
    assert(r(2) == ((3L, 1L, 0L, "p q")))
    assert(r(3) == ((4L, 1L, 1L, "")))
  }

  test("substringSpans memoizes its persisted gram table across repeated calls") {
    graft.dedup.Dedup.releaseGramCache()
    val df = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    graft.dedup.Dedup.substringSpans(df, gramTokens = 3, minDf = 2).collect()
    // the span query and its apply step (or a bench re-run) must share ONE
    // pinned gram table, not accumulate a fresh persist per call
    graft.dedup.Dedup.removeSpans(df,
      graft.dedup.Dedup.substringSpans(df, gramTokens = 3, minDf = 2)).collect()
    assert(graft.dedup.Dedup.gramCache.size == 1,
      s"expected one shared gram cache entry, saw ${graft.dedup.Dedup.gramCache.size}")
    graft.dedup.Dedup.releaseGramCache()
    assert(graft.dedup.Dedup.gramCache.isEmpty)
  }

  test("substringSpans: cross-doc runs merge to maximal spans; within-doc repeats and short docs don't flag") {
    val df = Seq(
      (1L, "a b c d e f g h"),         // shares "a b c d e" w/ 2, "f g h" w/ 5
      (2L, "z z a b c d e z z z"),      // the quoted run sits mid-doc
      (3L, "p q r p q r p q r"),        // repeats only WITHIN itself -> clean
      (4L, "m n"),                      // shorter than the gram window
      (5L, "a b c q q q q f g h")       // two shared runs split by a gap > L
    ).toDF("doc_id", "text")
    val r = graft.dedup.Dedup.substringSpans(df, gramTokens = 3, minDf = 2)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int, Int)].collect()
    // doc 1: dup window positions {0,1,2,5}; gap 5-2=3 <= L so the two runs
    // touch ([2,5) + [5,8)) and merge into one fully-covered span [0,8)
    assert(r.toSeq == Seq(
      (1L, 0, 8, 8),
      (2L, 2, 7, 5),
      (5L, 0, 3, 3),
      (5L, 7, 10, 3)))

    val cleaned = graft.dedup.Dedup.removeSpans(df,
        graft.dedup.Dedup.substringSpans(df, gramTokens = 3, minDf = 2))
      .orderBy("doc_id").as[(Long, Int, Int, String)].collect()
    assert(cleaned.toSeq == Seq(
      (1L, 8, 8, ""),                        // fully covered -> empty
      (2L, 10, 5, "z z z z z"),              // mid-doc quote excised
      (3L, 9, 0, "p q r p q r p q r"),       // self-repeats untouched
      (4L, 2, 0, "m n"),
      (5L, 10, 6, "q q q q")))               // both shared runs dropped
  }

  test("substringSpans: randomized differential vs a brute-force reference") {
    // tiny vocab + short docs force heavy cross-doc gram collisions, so
    // every merge/split/boundary case of the island algebra gets exercised
    val rng = new scala.util.Random(77)
    val smallVocab = Vector("a", "b", "c", "d")
    for (round <- 1 to 5) {
      val l = 2 + round % 3 // gram width 2..4
      val docs = (0 until 12).map { i =>
        val n = rng.nextInt(14) // 0..13 tokens, incl. below-width docs
        (i.toLong, (0 until n).map(_ => smallVocab(rng.nextInt(smallVocab.size))).mkString(" "))
      }
      // reference: literal grams, cross-doc df, interval union per doc
      val toks = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq
      }.toMap
      val grams = for {
        (id, tk) <- toks.toSeq
        i <- 0 to tk.length - l
      } yield (id, i, tk.slice(i, i + l).mkString(" "))
      val df2 = grams.groupBy(_._3).filter { case (_, g) => g.map(_._1).distinct.size >= 2 }.keySet
      val expected = (for {
        (id, _) <- docs
        ps = grams.collect { case (`id`, p, g) if df2(g) => p }.sorted
        if ps.nonEmpty
      } yield {
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        for (p <- ps) {
          if (spans.nonEmpty && p <= spans.last._2) {
            val (s, e) = spans.last; spans(spans.size - 1) = (s, math.max(e, p + l))
          } else spans += ((p, p + l))
        }
        spans.map { case (s, e) => (id, s, e, e - s) }
      }).flatten.sortBy(r => (r._1, r._2))
      val got = graft.dedup.Dedup.substringSpans(
          docs.toDF("doc_id", "text"), gramTokens = l, minDf = 2)
        .orderBy("doc_id", "span_start")
        .as[(Long, Int, Int, Int)].collect().toSeq
      assert(got == expected, s"round $round (l=$l): got $got\nwant $expected")
    }
  }

  test("weighted: max-weight always kept, zero-weight never, rate tracks weight, deterministic") {
    val df = (0L until 1000L).map(i =>
      (i, if (i % 10 == 0) 100.0 else if (i % 10 == 1) 0.0 else 50.0)).toDF("id", "w")
    val kept = Sampling.weighted(df, "id", "w").as[(Long, Double)].collect()
    assert(kept.count(_._2 == 100.0) == 100)
    assert(!kept.exists(_._2 == 0.0))
    val frac50 = kept.count(_._2 == 50.0).toDouble / 800
    assert(frac50 > 0.4 && frac50 < 0.6, s"p=0.5 rows kept at rate $frac50")
    val again = Sampling.weighted(df, "id", "w").as[(Long, Double)].collect()
    assert(kept.toSet == again.toSet)
  }

  test("labelCohesion: identical vectors cohere at 1.0, mixed label lower") {
    val vecs = Seq(
      (1L, Array(1f, 0f), "a"), (2L, Array(1f, 0f), "a"), (3L, Array(1f, 0f), "a"),
      (4L, Array(1f, 0f), "b"), (5L, Array(0f, 1f), "b")
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.labelCohesion(vecs)
      .select("label", "n_vecs", "avg_cos", "min_cos")
      .as[(String, Long, Double, Double)].collect().sortBy(_._1)
    assert(r(0) == (("a", 3L, 1.0, 1.0)))
    // centroid of b is (.5, .5): both members sit at cos 0.7071
    assert(r(1)._1 == "b" && r(1)._2 == 2L && r(1)._3 == 0.7071 && r(1)._4 == 0.7071)
  }

  test("bm25TopK: tf and length normalization rank as BM25 must; plan broadcast-filters the token stream") {
    import graft.text.TextAnalysis
    val docs = Seq(
      (1L, "spark spark spark join"),            // high tf, short
      (2L, "spark join " + ("filler " * 50).trim), // one hit, long
      (3L, "spark join spark"),                  // two hits, short
      (4L, "nothing relevant here at all"),      // no hit
      (5L, "join join")                          // other term only
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, Seq("spark"), 10)
      .select("rank", "doc_id", "score_milli")
      .as[(Long, Long, Long)].collect().toSeq
    // docs 4 and 5 never match; ranking: tf3 short > tf2 short > tf1 long
    assert(out.map(_._2) == Seq(1L, 3L, 2L), s"got $out")
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
    assert(out.map(_._3).sliding(2).forall(p => p.head >= p.last), "scores descend")
    // deterministic tie-break by doc id on equal scores
    val ties = Seq((7L, "alpha beta"), (6L, "alpha beta")).toDF("doc_id", "text")
    val tied = TextAnalysis.bm25TopK(ties, Seq("alpha"), 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(tied == Seq(6L, 7L))
    // scale shape: the exploded token stream is reduced by a broadcast
    // semi join BEFORE any aggregation exchange
    val plan = TextAnalysis.bm25TopK(docs, Seq("spark"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast semi join in:\n$plan")
  }

  test("quantizeInt8: dequantization error bounded by half a step") {
    val vecs = Seq((1L, Array(0.37f, -0.91f, 0.003f, 0.64f)))
      .toDF("vec_id", "embedding")
    val row = Similarity.quantizeInt8(vecs)
      .select("embedding", "q", "scale").head()
    val orig = row.getSeq[Float](0)
    val codes = row.getSeq[Long](1)
    val scale = row.getDouble(2)
    orig.zip(codes).foreach { case (v, c) =>
      assert(math.abs(v - c * scale) <= scale / 2 + 1e-12)
    }
  }
}
