package graft

import graft.pipeline.Profiler
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkSuite {
  import spark.implicits._

  test("profile: nulls, distincts, min/max rendering, string mean length") {
    val df = Seq(
      (1L, Some(1.5), Some("aa")),
      (2L, Some(2.25), Some("bbbb")),
      (3L, None, Some("aa")),
      (4L, Some(1.5), None)
    ).toDF("id", "x", "s")
    val p = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "s", "x"))

    val id = p("id")
    assert(id.getLong(1) == 4L && id.getLong(2) == 0L && id.getLong(3) == 4L)
    assert(id.getString(4) == "1" && id.getString(5) == "4")
    assert(id.isNullAt(6))

    val x = p("x")
    assert(x.getLong(2) == 1L, "one null in x")
    assert(x.getLong(3) == 2L, "distinct excludes nulls")
    assert(x.getString(4) == "1.5000" && x.getString(5) == "2.2500")

    val s = p("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 2L)
    assert(s.getString(4) == "aa" && s.getString(5) == "bbbb")
    assert(math.abs(s.getDouble(6) - 2.6667) < 1e-9, "mean of 2,4,2 rounded")
  }

  test("timestamp columns render as yyyy-MM-dd HH:mm:ss") {
    val df = Seq("2021-03-04 05:06:07", "2020-01-01 00:00:00")
      .toDF("raw").select(col("raw").cast("timestamp").as("ts"))
    val p = Profiler.profile(df).collect().head
    assert(p.getString(4) == "2020-01-01 00:00:00")
    assert(p.getString(5) == "2021-03-04 05:06:07")
  }

  test("column names with dots and backticks profile correctly (no struct-access misparse)") {
    val df = Seq((1L, "x"), (2L, "y"), (2L, null))
      .toDF("a.b", "weird`name")
    val p = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("a.b").getLong(2) == 0L && p("a.b").getLong(3) == 2L)
    assert(p("weird`name").getLong(2) == 1L && p("weird`name").getLong(3) == 2L)
  }

  test("approx mode keeps the shape and lands near the exact counts") {
    val df = (0 until 1000).map(i => (i.toLong, (i % 37).toString)).toDF("id", "k")
    val exact = Profiler.profile(df).collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profiler.profile(df, exact = false).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(exact("k") == 37L)
    assert(math.abs(approx("id") - 1000L) <= 50L)
    assert(math.abs(approx("k") - 37L) <= 4L)
    // approx plan must NOT contain the multi-distinct Expand
    val plan = Profiler.profile(df, exact = false).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile should not Expand:\n$plan")
  }

  test("histogram: exact integer bins, degenerate single-value domain, TakeOrdered-free") {
    // domain [0, 99], 10 bins of width 10: value v lands in v/10
    val df = (0 until 100).flatMap(v => Seq.fill(v % 3 + 1)(v.toLong)).toDF("x")
    val got = Profiler.histogram(df, "x", bins = 10)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 10)
    got.foreach { case (bin, n, lo, hi) =>
      assert(lo / 10 == bin && hi / 10 == bin, s"bin $bin spans [$lo,$hi]")
      assert(n == (lo to hi).map(_ % 3 + 1).sum)
    }
    // single-value domain: one bin 0, count = rows
    val one = Profiler.histogram(Seq(7L, 7L, 7L).toDF("x"), "x", bins = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(one.toSeq == Seq((0L, 3L)))
    // partitioning invariance
    val re = Profiler.histogram(df.repartition(7), "x", bins = 10)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(re.toSeq == got.toSeq)
  }

  test("corrMatrix: matches an independent reference; zero variance is null; one scan") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 500).map { i =>
      val x = rnd.nextInt(100).toLong
      (x, x * 3 - 7 + rnd.nextInt(10), rnd.nextInt(1000).toLong, 42L)
    }
    val df = rows.toDF("a", "b", "c", "const")
    val got = Profiler.corrMatrix(df, Seq("a", "b", "c", "const"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    def ref(xs: Seq[Long], ys: Seq[Long]): Option[Long] = {
      val n = xs.size.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val (d1, d2) = (n * sxx - sx * sx, n * syy - sy * sy)
      if (d1 <= 0 || d2 <= 0) None
      else Some(math.floor(1e6 * (n * sxy - sx * sy).toDouble /
        (math.sqrt(d1.toDouble) * math.sqrt(d2.toDouble)) + 0.5).toLong)
    }
    val series = Map("a" -> rows.map(_._1), "b" -> rows.map(_._2),
      "c" -> rows.map(_._3), "const" -> rows.map(_._4))
    for (((a, b), v) <- got) assert(v == ref(series(a), series(b)), s"($a,$b)")
    // near-perfect linear dependence lands near 1e6; constants are null
    assert(got(("a", "b")).get > 990000L)
    assert(got(("a", "const")).isEmpty)
    // one scan: a single aggregate, no join/union of scans
    val plan = Profiler.corrMatrix(df, Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), plan.take(1500))
  }

  test("exactK: deterministic, partitioning-invariant, plans TakeOrderedAndProject") {
    import graft.pipeline.Sampling
    val df = spark.range(0, 5000).select(col("id").as("doc_id"))
    val a = Sampling.exactK(df, "doc_id", 40).collect().map(_.getLong(0)).toSet
    val b = Sampling.exactK(df.repartition(13), "doc_id", 40)
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 40)
    val plan = Sampling.exactK(df, "doc_id", 40).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("proportionalK: exact total, largest-remainder seats, k >= N degeneracy") {
    import graft.pipeline.Sampling
    // strata 34/33/33, k=10: quotas 3/3/3, one seat to the largest
    // remainder (s0: r=40 vs 30/30)
    val df = spark.range(0, 100).select(col("id").as("doc_id"),
      concat(lit("s"), (col("id") % 3)).as("source"))
    val got = Sampling.proportionalK(df, "source", "doc_id", 10)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("s0" -> 4L, "s1" -> 3L, "s2" -> 3L), got.toString)
    // exact total and determinism under repartitioning
    val a = Sampling.proportionalK(df, "source", "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.proportionalK(df.repartition(7), "source", "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 10)
    // k >= N keeps everything (allocations cap at stratum sizes)
    assert(Sampling.proportionalK(df, "source", "doc_id", 500).count() == 100L)
  }

  test("Expect: planted violations counted exactly, null semantics pinned") {
    import graft.pipeline.Expect
    val dim = Seq(1L, 2L, 3L).toDF("d")
    val df = Seq(
      (Some(1L), Some(10L), "a"),   // clean
      (Some(1L), Some(2L), "a"),    // duplicate key 1
      (None, Some(3L), "b"),        // null key (counts for not_null)
      (None, Some(99L), "c"),       // second null key -> null group dups
      (Some(4L), None, "a"),        // null x -> x > 0 is NULL -> violation
      (Some(5L), Some(-7L), "d")    // negative + dangling fk? x=-7 not in dim
    ).map { case (k, x, s) => (k, x, s) }
      .toDF("k", "x", "s")
    val got = Expect.check(df, Seq(
        Expect.NotNull("k"),
        Expect.Check("x_positive", "x > 0"),
        Expect.Check("s_domain", "s in ('a', 'b', 'c')"),
        Expect.Unique(Seq("k")),
        Expect.Ref("x", dim, "d")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "not_null:k" -> 2L,
      "x_positive" -> 2L,      // the NULL predicate counts, like the -7
      "s_domain" -> 1L,
      "unique:k" -> 2L,        // dup key 1 excess=1, the two nulls group: excess=1
      "ref:x" -> 3L))          // 10, 99, -7 miss the dim; the null fk does not count
    // a clean frame reports all zeros (incl. the empty-anti-join path)
    val clean = Seq((1L, 1L, "a"), (2L, 2L, "b")).toDF("k", "x", "s")
    val zeros = Expect.check(clean, Seq(
        Expect.NotNull("k"), Expect.Unique(Seq("k")), Expect.Ref("x", dim, "d")))
      .collect().map(r => r.getLong(1)).toSeq
    assert(zeros == Seq(0L, 0L, 0L))
  }

  test("Expect.Ref bloom prefilter: matches the exact path; empty dim routes every key to violations joinlessly") {
    import graft.pipeline.Expect
    val dim = (1L to 1000L).toDF("d")
    // 500 compliant keys + dangling keys (one duplicated: per-ROW counts)
    val facts = ((1L to 500L) ++ Seq(5000L, 5000L, 6000L, -3L)).toDF("x")
    def run(rule: Expect.Rule): Long =
      Expect.check(facts, Seq(rule)).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap.apply("ref:x")
    val exact = run(Expect.Ref("x", dim, "d"))
    val bloom = run(Expect.Ref("x", dim, "d", bloomItems = Some(1000L)))
    assert(exact == 4L && bloom == exact,
      s"bloom path drifted: exact=$exact bloom=$bloom")
    // empty dim: keyFilterBytes returns no sketch (bf == null) and EVERY
    // non-null key must count as a violation — with zero join
    val empty = dim.filter(col("d") < 0L)
    val gotEmpty = run(Expect.Ref("x", empty, "d", bloomItems = Some(10L)))
    val exactEmpty = run(Expect.Ref("x", empty, "d"))
    assert(gotEmpty == 504L && exactEmpty == 504L)
  }

  test("corrMatrix: magnitudes where a BIGINT moment would wrap stay exact (decimal accumulation)") {
    val rnd = new scala.util.Random(7)
    // ~2e9-scale values at n=500: sum(x²) ≈ 2e21 >> 2⁶³ ≈ 9.2e18 — a long
    // accumulator silently wraps here; the decimal(38,0) moments must
    // reproduce the BigInt reference exactly
    val rows = (0 until 500).map { _ =>
      val x = 1500000000L + rnd.nextInt(1000000000)
      val y = 2L * x - 500000000L + rnd.nextInt(1000) // near-perfect linear
      val z = 1000000000L + rnd.nextInt(2000000000)   // independent
      (x, y, z)
    }
    val df = rows.toDF("x", "y", "z")
    val got = Profiler.corrMatrix(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    def ref(xs: Seq[Long], ys: Seq[Long]): Option[Long] = {
      val n = BigInt(xs.size)
      val sx = xs.map(BigInt(_)).sum; val sy = ys.map(BigInt(_)).sum
      val sxx = xs.map(v => BigInt(v) * v).sum
      val syy = ys.map(v => BigInt(v) * v).sum
      val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
      val d1 = n * sxx - sx * sx; val d2 = n * syy - sy * sy
      if (d1 <= 0 || d2 <= 0) None
      else Some(math.floor(1e6 * (n * sxy - sx * sy).toDouble /
        (math.sqrt(d1.toDouble) * math.sqrt(d2.toDouble)) + 0.5).toLong)
    }
    val series = Map("x" -> rows.map(_._1), "y" -> rows.map(_._2),
      "z" -> rows.map(_._3))
    for (((a, b), v) <- got) assert(v == ref(series(a), series(b)), s"($a,$b)")
    assert(got(("x", "y")).get > 999000L, "near-linear pair must land near 1e6")
    assert(math.abs(got(("x", "z")).get) < 200000L, "independent pair near 0")
  }
}
