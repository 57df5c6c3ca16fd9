package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Product-quantization verification: exact structural properties (codes
  * = per-subspace argmin, ADC = reconstruction distance, rerank-all =
  * exact search) plus a recall contract on clustered synthetic vectors.
  */
class PqSpec extends SparkSuite {

  private def syntheticVecs(n: Int, dim: Int, seed: Int = 7) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // clustered: 8 centers, Gaussian-ish noise — PQ-friendly structure
    val centers = Vector.fill(8)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    (0 until n).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.3f).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("codes are per-subspace L2 argmins against the codebooks (independent check)") {
    val df = syntheticVecs(120, 16)
    val model = Similarity.pqTrain(df, m = 4, k = 8)
    assert(model.m == 4 && model.k == 8 && model.subDim == 4)
    val joined = Similarity.pqEncode(df, model)
      .join(df, "vec_id").orderBy("vec_id").collect()
    joined.foreach { r =>
      val codes = r.getSeq[Int](1)
      val v = r.getSeq[Float](2).toArray
      for (sub <- 0 until 4) {
        val dists = (0 until 8).map { cell =>
          val c = model.codebooks(sub)(cell)
          (0 until 4).map(i => math.pow(v(sub * 4 + i).toDouble - c(i).toDouble, 2)).sum
        }
        val best = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
        assert(codes(sub) == best, s"vec ${r.getLong(0)} sub $sub")
      }
    }
  }

  test("ADC distance equals query-to-reconstruction squared L2 exactly") {
    val df = syntheticVecs(60, 16)
    val model = Similarity.pqTrain(df, m = 4, k = 8)
    val codes = Similarity.pqEncode(df, model)
    val query = df.filter(col("vec_id") === 5)
      .select("embedding").head().getSeq[Float](0).toArray
    val got = Similarity.pqTopK(codes, model, query, 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val codeMap = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    codeMap.foreach { case (id, cs) =>
      val recon = cs.zipWithIndex.flatMap { case (c, sub) => model.codebooks(sub)(c) }
      val want = recon.zipWithIndex.map { case (x, i) =>
        val diff = query(i).toDouble - x.toDouble; diff * diff }.sum
      assert(math.abs(got(id) - want) < 1e-12, s"vec $id")
    }
  }

  test("encoding is invariant to partitioning; codes stay within [0, k)") {
    val df = syntheticVecs(100, 16)
    val model = Similarity.pqTrain(df, m = 4, k = 8)
    val a = Similarity.pqEncode(df.repartition(7), model).orderBy("vec_id").collect()
    val b = Similarity.pqEncode(df.coalesce(1), model).orderBy("vec_id").collect()
    assert(a.map(_.getSeq[Int](1)).toSeq == b.map(_.getSeq[Int](1)).toSeq)
    a.foreach(_.getSeq[Int](1).foreach(c => assert(c >= 0 && c < 8)))
  }

  test("rerank over the full corpus equals exact cosine search") {
    val df = syntheticVecs(80, 16)
    val model = Similarity.pqTrain(df, m = 4, k = 8)
    val codes = Similarity.pqEncode(df, model)
    val query = df.filter(col("vec_id") === 3)
      .select("embedding").head().getSeq[Float](0).toArray
    // shortlist covers every row -> rerank IS exact search
    val got = Similarity.pqTopKRerank(codes, df, model, query, k = 10, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = Similarity.bruteForceTopK(df, query, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("recall contract: ADC top-10 recovers most of the exact L2 top-10") {
    val df = syntheticVecs(400, 32)
    val model = Similarity.pqTrain(df, m = 8, k = 16)
    val codes = Similarity.pqEncode(df, model)
    val query = df.filter(col("vec_id") === 11)
      .select("embedding").head().getSeq[Float](0).toArray
    val adc = Similarity.pqTopK(codes, model, query, 10).select("vec_id")
    val exact = Similarity.bruteForceTopKL2(df, query, 10).select("vec_id")
    val hits = adc.intersect(exact).count()
    assert(hits >= 5, s"ADC recall too low: $hits/10")
    // rerank with a 4x shortlist must do at least as well
    val rr = Similarity.pqTopKRerank(codes, df, model, query, 10, rerank = 4)
      .select("vec_id")
    val exactCos = Similarity.bruteForceTopK(df, query, 10).select("vec_id")
    val rrHits = rr.intersect(exactCos).count()
    assert(rrHits >= hits, s"rerank recall $rrHits worse than ADC $hits")
  }

  test("IVF-PQ: ADC distance equals residual-to-reconstruction L2 exactly") {
    val df = syntheticVecs(120, 16)
    val (codes, centroids, model) = Similarity.ivfPqBuild(df, nCells = 4, m = 4, k = 8)
    val query = df.filter(col("vec_id") === 9)
      .select("embedding").head().getSeq[Float](0).toArray
    // probe EVERY cell so all rows get scored
    val got = Similarity.ivfPqTopK(codes, centroids, model, query, 120, nProbe = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = codes.collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
    rows.foreach { case (id, cell, cs) =>
      val cent = centroids(cell)
      val qRes = query.indices.map(i => query(i) - cent(i))
      val recon = cs.zipWithIndex.flatMap { case (c, sub) => model.codebooks(sub)(c) }
      val want = recon.zipWithIndex.map { case (x, i) =>
        val d = qRes(i).toDouble - x.toDouble; d * d }.sum
      assert(math.abs(got(id) - want) < 1e-12, s"vec $id")
    }
  }

  test("IVF-PQ probe scans only probed cells; recall holds on clustered data") {
    val df = syntheticVecs(400, 32)
    val (codes, centroids, model) = Similarity.ivfPqBuild(df, nCells = 8, m = 8, k = 16)
    val query = df.filter(col("vec_id") === 16)
      .select("embedding").head().getSeq[Float](0).toArray
    val probedK = Similarity.ivfPqTopK(codes, centroids, model, query, 20, nProbe = 3)
    // scan containment: every returned row's cell is among the probed set
    val cellOf = codes.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cells = probedK.collect().map(r => cellOf(r.getLong(0))).toSet
    assert(cells.size <= 3, s"results from ${cells.size} cells with nProbe=3")
    val exact = Similarity.bruteForceTopKL2(df, query, 10).select("vec_id")
    val hits = probedK.select("vec_id").intersect(exact).count()
    assert(hits >= 5, s"IVF-PQ top-20 recovered only $hits of exact top-10")
  }

  test("pqTrain refuses non-divisible dims and oversized k") {
    val df = syntheticVecs(10, 16)
    intercept[IllegalArgumentException](Similarity.pqTrain(df, m = 5, k = 4))
    intercept[IllegalArgumentException](Similarity.pqTrain(df, m = 4, k = 300))
  }
}
