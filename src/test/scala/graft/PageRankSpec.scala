package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Integer fixed-point PageRank: hand-computed exact values, randomized
  * differential against a plain-collections reference of the same
  * quantized recurrence, partitioning invariance, dangling handling.
  */
class PageRankSpec extends SparkSuite {

  private def edgesDf(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  /** Independent reference: same quantized recurrence over plain maps. */
  private def refPagerank(es: Seq[(Long, Long)], iters: Int,
                          dampMilli: Long = 850L): Map[Long, Long] = {
    val edges = es.distinct
    val deg = edges.groupBy(_._1).map { case (s, g) => (s, g.size.toLong) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val base = 1000000000L / n
    val teleport = ((1000L - dampMilli) * base) / 1000L
    var r = nodes.map(v => (v, base)).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filter(v => !deg.contains(v)).map(r).sum
      val perNode = dangling / n
      val contrib = scala.collection.mutable.HashMap.empty[Long, Long]
      for ((s, d) <- edges if deg.contains(s))
        contrib(d) = contrib.getOrElse(d, 0L) + r(s) / deg(s)
      r = nodes.map(v =>
        (v, teleport + dampMilli * (contrib.getOrElse(v, 0L) + perNode) / 1000L)).toMap
    }
    r
  }

  test("hand-computed two-node cycle") {
    // 1 <-> 2: symmetric, each keeps base rank through every iteration
    val es = Seq((1L, 2L), (2L, 1L))
    val got = PageRank.pagerank(edgesDf(es), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = 1000000000L / 2
    val expect1 = ((1000L - 850L) * base) / 1000L + 850L * base / 1000L
    // one iteration from symmetric state stays fixed: r = teleport + 0.85*r_prev
    // which converges below base; just cross-check vs the reference
    assert(got == refPagerank(es, 3))
    assert(got(1L) == got(2L))
    assert(got(1L) <= base && got(1L) >= expect1 - 1)
  }

  test("randomized differential vs plain-collections reference") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 20 + rnd.nextInt(20)
      val es = Seq.fill(4 * n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val got = PageRank.pagerank(edgesDf(es), iters = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refPagerank(es, 5), s"trial $trial")
    }
  }

  test("dangling node redistributes its mass; hub outranks leaf") {
    // star: everyone links to 0; 0 links nowhere (dangling)
    val es = (1L to 5L).map(i => (i, 0L))
    val got = PageRank.pagerank(edgesDf(es), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPagerank(es, 5))
    assert(got(0L) > got(1L), "hub must outrank leaves")
    assert((1L to 5L).map(got).toSet.size == 1, "leaves tie exactly")
  }

  test("damp=0 gives every node the pure teleport rank") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val got = PageRank.pagerank(edgesDf(es), iters = 4, dampMilli = 0)
      .collect().map(r => r.getLong(1)).toSet
    assert(got == Set(1000000000L / 3))
  }

  test("invariant to input partitioning and duplicate edges") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (1L, 2L), (1L, 2L))
    val a = PageRank.pagerank(edgesDf(es).repartition(5), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = refPagerank(es, 4)
    assert(a == b)
  }
}
