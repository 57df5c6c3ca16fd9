package graft

import org.apache.spark.sql.functions._
import graft.functions.{functions => gf}

/** Custom Catalyst expression kernels: interpreted eval vs codegen path vs
  * an independent Scala reimplementation.
  */
class KernelsSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def vec(n: Int): Array[Float] = Array.fill(n)(rnd.nextFloat() - 0.5f)

  private def cosineRef(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  test("CosineSim matches independent implementation (codegen path)") {
    val pairs = Seq.fill(50)((vec(64), vec(64)))
    val df = pairs.toDF("a", "b")
    val got = df.select(gf.cosine_sim($"a", $"b")).as[Double].collect()
    val want = pairs.map { case (a, b) => cosineRef(a, b) }
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
  }

  test("CosineSim zero-norm returns 0.0, null returns null") {
    val df = Seq((Array(0f, 0f), Array(1f, 2f))).toDF("a", "b")
    assert(df.select(gf.cosine_sim($"a", $"b")).as[Double].head() == 0.0)
    val withNull = spark.sql("SELECT CAST(NULL AS ARRAY<FLOAT>) AS a, array(CAST(1.0 AS FLOAT)) AS b")
    assert(withNull.select(gf.cosine_sim($"a", $"b")).collect().head.isNullAt(0))
  }

  test("SimHash64: identical token sets agree; hamming grows with edits") {
    val base = (1 to 40).map(i => s"tok$i")
    val near = base.updated(0, "changed")
    val far = (1 to 40).map(i => s"other$i")
    val df = Seq(base, base, near, far).toDF("toks")
    val hs = df.select(gf.simhash64($"toks")).as[Long].collect()
    assert(hs(0) == hs(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(2)) < ham(hs(0), hs(3)))
  }

  test("MinHashSig estimates Jaccard within tolerance") {
    val a = (1 to 200).map(_.toString)
    val b = (51 to 250).map(_.toString) // |A∩B|=150, |A∪B|=250 → J=0.6
    val df = Seq(a, b).toDF("sh")
    val sigs = df.select(gf.minhash_sig($"sh", 256)).as[Seq[Long]].collect()
    val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / 256.0
    assert(math.abs(est - 0.6) < 0.12, s"estimate $est too far from 0.6")
  }

  test("MinHashTextSig: fused path ≈ Jaccard; identical text identical sig; case/ws-insensitive") {
    val a = (1 to 200).map(i => s"w$i").mkString(" ")
    val b = (51 to 250).map(i => s"w$i").mkString(" ") // 1-gram J = 0.6
    val df = Seq(a, a, b, a.toUpperCase, "  " + a.replace(" ", "   ") + "  ", "", "one two")
      .toDF("t")
    val sigs = df.select(gf.minhash_text_sig($"t", 1, 256)).as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) == sigs(3), "ASCII case-insensitive")
    assert(sigs(0) == sigs(4), "whitespace-run insensitive")
    val est = sigs(0).zip(sigs(2)).count { case (x, y) => x == y } / 256.0
    assert(math.abs(est - 0.6) < 0.12, s"estimate $est too far from 0.6")
    assert(sigs(5).forall(_ == Long.MaxValue), "empty doc keeps empty signature")
    // short doc (< ngram tokens) still produces a real signature
    val short = df.limit(0).sparkSession.createDataset(Seq("one two"))(
      org.apache.spark.sql.Encoders.STRING).toDF("t")
      .select(gf.minhash_text_sig($"t", 3, 8)).as[Seq[Long]].head()
    assert(short.exists(_ != Long.MaxValue))
  }

  test("ShingleHashes + JaccardSorted: exact Jaccard via hashed sets") {
    val a = (1 to 100).map(i => s"w$i").mkString(" ")
    val b = (41 to 140).map(i => s"w$i").mkString(" ") // 1-gram J = 60/140
    val df = Seq((a, a), (a, b), (a, ""), ("", "")).toDF("x", "y")
    val j = df.select(gf.jaccard_sorted(
      gf.shingle_hashes($"x", 1), gf.shingle_hashes($"y", 1))).as[Double].collect()
    assert(j(0) == 1.0)
    assert(math.abs(j(1) - 60.0 / 140.0) < 1e-12)
    assert(j(2) == 0.0)
    assert(j(3) == 1.0) // both empty = identical
    // sets are sorted and distinct
    val sh = Seq("b a b a c").toDF("t")
      .select(gf.shingle_hashes($"t", 1)).as[Seq[Long]].head()
    assert(sh.length == 3 && sh == sh.sorted && sh.distinct == sh)
  }

  test("RollingMinHash: equality for shared content, stability") {
    val df = Seq("the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "a completely different document body here").toDF("t")
    val fps = df.select(gf.doc_fingerprint($"t", 16)).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
    // shorter than window falls back to full-text hash
    val short = Seq("tiny", "tiny", "tinz").toDF("t")
      .select(gf.doc_fingerprint($"t", 16)).as[Long].collect()
    assert(short(0) == short(1) && short(0) != short(2))
  }

  test("kernels survive interpreted (non-codegen) eval too") {
    withCodegenOff {
      val df = Seq((vec(16), vec(16))).toDF("a", "b")
      val g = df.select(gf.cosine_sim($"a", $"b")).as[Double].head()
      assert(!g.isNaN)
      val t = Seq(Seq("a", "b", "c")).toDF("toks")
      t.select(gf.simhash64($"toks"), gf.minhash_sig($"toks", 8)).collect()
    }
  }

  private def withCodegenOff(f: => Unit): Unit = {
    val key = "spark.sql.codegen.wholeStage"
    val fallback = "spark.sql.codegen.factoryMode"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    spark.conf.set(fallback, "NO_CODEGEN")
    try f finally {
      spark.conf.set(key, old)
      spark.conf.set(fallback, "FALLBACK")
    }
  }

  test("mmrRerank matches an independent greedy reference; lambda extremes behave") {
    import graft.similarity.Similarity
    def milli(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong)
    def simNano(a: Array[Long], b: Array[Long]): Long = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = a.map(x => x.toDouble * x).sum
      val nb = b.map(x => x.toDouble * x).sum
      if (na == 0 || nb == 0) 0L
      else math.floor(1.0e9 * dot / (math.sqrt(na) * math.sqrt(nb)) + 0.5).toLong
    }
    def refMmr(items: Seq[(Long, Long, Array[Long])], k: Int,
               lam: Int): Seq[(Long, Long)] = {
      var rest = items.toList
      var picked = List.empty[(Long, Array[Long])]
      val out = Seq.newBuilder[(Long, Long)]
      while (picked.size < math.min(k, items.size)) {
        val scored = rest.map { case (id, rel, vm) =>
          val ms = if (picked.isEmpty) 0L
            else picked.map(p => simNano(vm, p._2)).max
          (id, lam * rel - (1000L - lam) * ms, vm)
        }
        val best = scored.minBy(t => (-t._2, t._1))
        out += ((best._1, best._2))
        picked ::= (best._1, best._3)
        rest = rest.filterNot(_._1 == best._1)
      }
      out.result()
    }
    val items = (0 until 3).flatMap { q =>
      (0 until 15).map { i =>
        (q.toLong, i.toLong, (rnd.nextInt(2000000000) - 1000000000).toLong,
          vec(16))
      }
    }
    val df = items.toDF("q_id", "vec_id", "rel_nano", "embedding")
    Seq(0, 300, 700, 1000).foreach { lam =>
      val got = Similarity.mmrRerank(df, k = 5, lambdaMilli = lam)
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
      (0 until 3).foreach { q =>
        val mine = items.filter(_._1 == q)
          .map(t => (t._2, t._3, milli(t._4)))
        assert(got(q.toLong) == refMmr(mine, 5, lam), s"q=$q lam=$lam")
      }
    }
    // lambda=1000 is pure relevance: picks == top-5 by (rel desc, id)
    val pure = Similarity.mmrRerank(df, k = 5, lambdaMilli = 1000)
      .filter($"q_id" === 0L).orderBy("rank")
      .as[(Long, Long, Long, Long)].collect().map(_._3).toSeq
    val want = items.filter(_._1 == 0).sortBy(t => (-t._3, t._2)).take(5).map(_._2)
    assert(pure == want)
    // diversity kicks in: an exact duplicate of the top item is never
    // picked second at lambda=500 (its max-sim is 1e9, any other wins)
    val dup = Seq(
      (9L, 1L, 1000000000L, Array(1f, 0f, 0f, 0f)),
      (9L, 2L, 999999999L, Array(1f, 0f, 0f, 0f)),
      (9L, 3L, 400000000L, Array(0f, 1f, 0f, 0f))
    ).toDF("q_id", "vec_id", "rel_nano", "embedding")
    val dp = Similarity.mmrRerank(dup, k = 2, lambdaMilli = 500)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect().map(_._3).toSeq
    assert(dp == Seq(1L, 3L), s"duplicate must lose to the diverse item: $dp")
  }

  test("signProject matches an independent fmix32 reference, signs are balanced") {
    import graft.similarity.Similarity
    // reference fmix32 (murmur3 finalizer) on the true bit ops
    def fmix(x0: Long): Long = {
      var h = x0 & 0xffffffffL
      h ^= h >>> 16; h = (h * 2246822507L) & 0xffffffffL
      h ^= h >>> 13; h = (h * 3266489909L) & 0xffffffffL
      h ^= h >>> 16
      h
    }
    def sign(i: Int, j: Int): Long = if (fmix(i * 4096L + j) % 2 == 0) 1L else -1L
    def milli(x: Float): Long = math.floor(x.toDouble * 1000 + 0.5).toLong
    val inDim = 64; val outDim = 8
    val rows = (0 until 40).map(i => (i.toLong, vec(inDim)))
    val got = Similarity.signProject(rows.toDF("vec_id", "embedding"),
        outDim, inDim)
      .select("vec_id", "proj_milli")
      .as[(Long, Seq[Long])].collect().toMap
    rows.foreach { case (id, v) =>
      val want = (0 until outDim).map(j =>
        (0 until inDim).map(i => milli(v(i)) * sign(i, j)).sum)
      assert(got(id) == want, s"vec $id")
    }
    // the ±1 matrix itself: every output column near-balanced and no two
    // columns (anti-)correlated — the failure mode of a weak mixer
    val m = Array.tabulate(inDim, outDim)((i, j) => sign(i, j).toInt)
    (0 until outDim).foreach { j =>
      val s = (0 until inDim).map(m(_)(j)).sum
      assert(math.abs(s) <= 20, s"column $j unbalanced: $s")
    }
    for (a <- 0 until outDim; b <- a + 1 until outDim) {
      val dot = (0 until inDim).map(i => m(i)(a) * m(i)(b)).sum
      assert(math.abs(dot) < inDim / 2, s"columns $a,$b correlated: $dot")
    }
  }
}
