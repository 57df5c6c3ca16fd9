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

  test("semi join works when fact and dim share the key column name") {
    val fact = (1L to 200L).map(i => (i, s"f$i")).toDF("k", "fv")
    val dim = (1L to 200L).filter(_ % 10 == 0).map(i => Tuple1(i)).toDF("k")
    val n = BloomJoin.semiJoin(fact, dim, "k", "k",
      expectedItems = 64, numBits = 1L << 10).count()
    assert(n == 20L)
  }

  test("sketch size guard: numBits above the 32 MB ceiling throws typed") {
    val (fact, dim) = fixture
    intercept[BloomJoin.SketchTooLargeException] {
      BloomJoin.keyFilterBytes(dim, col("dk"), 1L << 20, 1L << 30)
    }
    intercept[IllegalArgumentException] {
      BloomJoin.keyFilterBytes(dim, col("dk"), 1L << 20, 0L)
    }
    // derived sizing: 10 bits/item, floored, capped
    assert(BloomJoin.derivedNumBits(1) == 64L)
    assert(BloomJoin.derivedNumBits(1000) == 10000L)
    assert(BloomJoin.derivedNumBits(1L << 40) == BloomJoin.MaxSketchBits)
  }

  test("merge ORs two filters: union of key sets, no false negatives") {
    val a = (1L to 500L).map(Tuple1(_)).toDF("k")
    val b = (10000L to 10500L).map(Tuple1(_)).toDF("k")
    val bits = 1L << 14
    val fa = BloomJoin.keyFilterBytes(a, col("k"), 1L << 10, bits)
    val fb = BloomJoin.keyFilterBytes(b, col("k"), 1L << 10, bits)
    val merged = BloomJoin.merge(fa, fb)
    val probe = (a.select("k") union b.select("k"))
    val kept = probe.filter(BloomJoin.mightContain(merged, col("k"))).count()
    assert(kept == probe.count(), "merged filter lost keys from one side")
    // null passthrough (empty side)
    assert(BloomJoin.merge(null, fa).sameElements(fa))
    assert(BloomJoin.merge(fa, null).sameElements(fa))
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

  test("big sketches probe via broadcast, not a plan literal; small stay literal") {
    val (fact, dim) = fixture
    // 2^24 bits = 2 MB serialized — above InlineSketchBytes (1 MB)
    val big = BloomJoin.keyFilterBytes(dim, col("dk"), 1L << 10, 1L << 24)
    assert(big.length > BloomJoin.InlineSketchBytes)
    // RDD-backed fact: a LocalRelation would let ConvertToLocalRelation
    // evaluate the probe at optimization time and erase the filter node
    val factRdd = spark.createDataFrame(
      spark.sparkContext.parallelize(fact.collect().toSeq, 4), fact.schema)
    val probed = factRdd.filter(BloomJoin.mightContain(big, col("fk")))
    // the plan must carry a broadcast HANDLE, not megabytes of literal:
    // Catalyst re-hashes every literal on each rule pass, and a literal
    // ships inside every task binary
    val exprs = probed.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case b: graft.operators.BloomMightContainBc => b
    })
    assert(exprs.nonEmpty, probed.queryExecution.optimizedPlan.treeString.take(1000))
    // no false negatives through the broadcast path either
    val matches = dim.select($"dk".as("fk")).collect().map(_.getLong(0)).toSet
    val kept = probed.select("fk").collect().map(_.getLong(0)).toSet
    assert(matches.subsetOf(kept))
    // small sketch: same probe stays a literal (no broadcast round trip)
    val small = BloomJoin.keyFilterBytes(dim, col("dk"), 1L << 10, 1L << 14)
    val litProbe = fact.filter(BloomJoin.mightContain(small, col("fk")))
    val bcExprs = litProbe.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case b: graft.operators.BloomMightContainBc => b
    })
    assert(bcExprs.isEmpty)
  }
}
