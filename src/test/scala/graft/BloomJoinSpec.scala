package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

/** Bloom-filter join reduction: the prefilter must never lose a matching
  * row (no false negatives — the property the exact-result claim rests
  * on), must actually discard most non-matching rows at sane sizing, and
  * the composed semi join must be row-identical to the plain one.
  */
class BloomJoinSpec extends SparkSuite {
  import spark.implicits._

  private def fixture = {
    val fact = (1L to 5000L).map(i => (i, s"f$i")).toDF("fk", "fv")
    // dim hits a sparse 3%-ish slice of the fact key space
    val dim = (1L to 5000L).filter(_ % 37 == 0).map(i => (i, s"d$i")).toDF("dk", "dv")
    (fact, dim)
  }

  test("bloom semi join == plain semi join, row for row") {
    val (fact, dim) = fixture
    val viaBloom = BloomJoin.semiJoin(fact, dim, "fk", "dk",
      expectedItems = 1L << 12, numBits = 1L << 16)
      .select("fk", "fv").collect().toSet
    val plain = fact.join(dim, $"fk" === $"dk", "left_semi")
      .select("fk", "fv").collect().toSet
    assert(viaBloom == plain)
    assert(plain.nonEmpty)
  }

  test("prefilter keeps every matching key (no false negatives)") {
    val (fact, dim) = fixture
    val kept = BloomJoin.prefilter(fact, dim, "fk", "dk",
      expectedItems = 1L << 12, numBits = 1L << 16)
      .select("fk").as[Long].collect().toSet
    val matching = dim.select("dk").as[Long].collect().toSet
    assert(matching.subsetOf(kept),
      s"bloom lost matching keys: ${(matching -- kept).take(5)}")
  }

  test("prefilter discards most non-matching rows at 10 bits/item") {
    val (fact, dim) = fixture
    val keptN = BloomJoin.prefilter(fact, dim, "fk", "dk",
      expectedItems = 1L << 12, numBits = 1L << 16).count()
    val matchN = dim.count()
    // ~1% fp rate at this sizing; allow 10% of the non-matching side
    assert(keptN <= matchN + (5000 - matchN) / 10,
      s"prefilter kept $keptN rows for $matchN matches — filter not selective")
  }

  test("prefilter plans scan-side: no exchange anywhere in the filtered fact") {
    val (fact, dim) = fixture
    val pre = BloomJoin.prefilter(fact, dim, "fk", "dk",
      expectedItems = 1L << 12, numBits = 1L << 16)
    pre.count()
    val plan = pre.queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    val exchanges = helper.collect(plan) { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"bloom prefilter must not shuffle the fact side, found: $exchanges")
  }

  test("degenerate dims: empty dim keeps nothing, full dim keeps everything") {
    val (fact, dim) = fixture
    val empty = dim.filter(lit(false))
    assert(BloomJoin.semiJoin(fact, empty, "fk", "dk",
      expectedItems = 16, numBits = 1L << 10).count() == 0L)
    val full = fact.select($"fk".as("dk"))
    assert(BloomJoin.semiJoin(fact, full, "fk", "dk",
      expectedItems = 1L << 13, numBits = 1L << 17).count() == 5000L)
  }
}
