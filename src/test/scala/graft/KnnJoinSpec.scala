package graft

import graft.similarity.Similarity

/** Distributed k-NN join ([[Similarity.knnJoin]]): the unbounded-query-side
  * ANN shape. Contracts:
  *  - probing EVERY cell makes it exact: row-for-row equal (ids AND
  *    cosines) to the window-rank oracle;
  *  - with a partial probe it agrees with the driver-ranked
  *    [[Similarity.ivfTopKBatch]] on the same index/nProbe — the per-row
  *    cell-ranking expression and the driver's `rankCells` choose the
  *    same cells;
  *  - `excludeSelf` drops the trivial self pair and still returns k rows.
  */
class KnnJoinSpec extends SparkSuite {
  import spark.implicits._
  private val rnd = new scala.util.Random(4242)

  test("full probe (nProbe = nCells) is exact: equals the window oracle row for row") {
    val dim = 16
    def v(): Array[Float] = Array.fill(dim)(rnd.nextFloat() - 0.5f)
    val vs = (0 until 180).map(i => (i.toLong, v()))
    val df = vs.toDF("vec_id", "embedding").cache()
    val (indexed, cents) = Similarity.ivfBuild(df, 8)
    val queries = df.select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val knn = Similarity.knnJoin(indexed, cents, queries, k = 7, nProbe = cents.size)
      .select("q_id", "vec_id", "cosine").as[(Long, Long, Double)].collect().toSet
    val oracle = Similarity.windowTopKBatchOracle(df, queries, 7)
      .select("q_id", "vec_id", "cosine").as[(Long, Long, Double)].collect().toSet
    assert(knn == oracle)
  }

  test("partial probe agrees with the driver-ranked batch probe per query") {
    val dim = 16
    def v(): Array[Float] = Array.fill(dim)(rnd.nextFloat() - 0.5f)
    val vs = (0 until 200).map(i => (i.toLong, v()))
    val df = vs.toDF("vec_id", "embedding").cache()
    val (indexed, cents) = Similarity.ivfBuild(df, 8)
    val qids = Seq(3L, 41L, 77L, 150L)
    val queries = qids.map(i => (i, vs(i.toInt)._2)).toDF("q_id", "q_vec")
    val joinRes = Similarity.knnJoin(indexed, cents, queries, k = 10, nProbe = 4)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val batchRes = Similarity.ivfTopKBatch(indexed, cents, queries, 10, nProbe = 4)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(joinRes == batchRes,
      "expression-ranked cells diverged from driver-ranked cells")
  }

  test("tied/duplicate centroids: expression ranking breaks ties toward the " +
       "LOWER cell id, agreeing with the driver-ranked probe") {
    // four centroids, two DUPLICATED — every query's centroid scores tie
    // pairwise, so a 1-cell probe is decided purely by tie-break; the expression
    // path and rankCells must still probe identical cells
    val c0 = Array.fill(8)(0.5f)
    val c1 = Array.tabulate(8)(i => if (i < 4) 1.0f else -1.0f)
    val cents = Seq(c0, c1, c0.clone(), c1.clone())
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) c0 else c1
      (i.toLong, base.map(_ + (rnd.nextFloat() - 0.5f) * 0.01f), i % 4)
    }
    val indexed = rows.toDF("vec_id", "embedding", "cell")
    val queries = rows.take(6).map(r => (r._1, r._2)).toDF("q_id", "q_vec")
    val joinRes = Similarity.knnJoin(indexed, cents, queries, k = 3, nProbe = 1)
      .select("q_id", "vec_id", "cosine").as[(Long, Long, Double)].collect().toSet
    val batchRes = Similarity.ivfTopKBatch(indexed, cents, queries, 3, nProbe = 1)
      .select("q_id", "vec_id", "cosine").as[(Long, Long, Double)].collect().toSet
    assert(joinRes == batchRes,
      "tie-break diverged between expression and driver cell ranking")
  }

  test("excludeSelf drops the self pair and still returns k rows per query") {
    val dim = 16
    def v(): Array[Float] = Array.fill(dim)(rnd.nextFloat() - 0.5f)
    val vs = (0 until 150).map(i => (i.toLong, v()))
    val df = vs.toDF("vec_id", "embedding").cache()
    val (indexed, cents) = Similarity.ivfBuild(df, 8)
    val queries = df.select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val res = Similarity.knnJoin(indexed, cents, queries, k = 5,
      nProbe = cents.size, excludeSelf = true)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
    assert(!res.exists { case (q, id) => q == id }, "self pair must be excluded")
    val perQ = res.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perQ.size == 150 && perQ.values.forall(_ == 5))
  }

  test("self-kNN recall vs exact truth under a partial probe") {
    val dim = 16
    def v(): Array[Float] = Array.fill(dim)(rnd.nextFloat() - 0.5f)
    val vs = (0 until 200).map(i => (i.toLong, v()))
    val df = vs.toDF("vec_id", "embedding").cache()
    val (indexed, cents) = Similarity.ivfBuild(df, 8)
    val queries = df.select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val approx = Similarity.knnJoin(indexed, cents, queries, k = 10, nProbe = 4)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val exact = Similarity.windowTopKBatchOracle(df, queries, 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val meanRecall = approx.intersect(exact).size.toDouble / exact.size
    assert(meanRecall >= 0.5, s"mean self-kNN recall too low: $meanRecall")
    // every query found itself: rank 1 survives any probe that includes
    // the query's own cell (it always does — it's the nearest centroid)
    val selves = approx.filter { case (q, id) => q == id }
    assert(selves.size == 200)
  }
}
