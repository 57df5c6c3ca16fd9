package graft

import scala.util.Random

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.core._
import graft.plans.AsOfZipJoinExec

/** The as-of co-range join: two range-laid snapshots join "latest right
  * row at-or-before" with ZERO exchanges (prefix-cut legs + per-leg
  * ordered merge holding one candidate row). Content parity against an
  * independently-written driver-side reference is the correctness
  * contract; the zero-exchange plan and the live ordering claims are the
  * scale contract.
  */
class AsOfCoRangeJoinSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def store(dir: String) = new FsSnapshotStore(s"$dir/store", spark)

  /** Driver-side reference: for each left (k, ts, lv) pick the right row
    * with the greatest (ts, rv) at-or-before (strictly-before) ts within
    * the key group and tolerance band.
    */
  private def ref(left: Seq[(Long, Long, String)], right: Seq[(Long, Long, Long)],
                  strict: Boolean, tol: Long, outer: Boolean)
      : Seq[(Long, Long, String, Option[Long], Option[Long])] =
    left.sorted.flatMap { case (k, ts, lv) =>
      val cands = right.filter { case (rk, rts, _) =>
        rk == k && (if (strict) rts < ts else rts <= ts) &&
          (tol < 0 || ts - rts <= tol) }
      if (cands.nonEmpty) {
        val m = cands.maxBy(c => (c._2, c._3))
        Some((k, ts, lv, Some(m._2), Some(m._3)))
      } else if (outer) Some((k, ts, lv, None, None))
      else None
    }

  private def collected(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Long, String, Option[Long], Option[Long])] =
    df.select(col("k"), col("ts"), col("lv"), col("asof_ts"), col("rv"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).sorted

  test("as-of join matches the reference, plans zero exchanges, keeps order claims") {
    val st = store(tmpDir("graft-asof"))
    // multi-version right: key k has readings at ts = multiples of 10;
    // left probes at every ts — matched probes pick the floor reading
    val left = (1L to 50L).flatMap(k => Seq(3L, 17L, 40L).map(ts =>
      (k, ts, s"l$k-$ts")))
    val right = (1L to 60L by 2L).flatMap(k => (0L to 40L by 10L).map(ts =>
      (k, ts, k * 1000 + ts)))
    val ixL = KVIndex.bootstrap(st, "al", left.toDF("k", "ts", "lv")
      .repartition(1), Seq("k", "ts"), maxRowsPerFile = 16).toOption.get
    val ixR = KVIndex.bootstrap(st, "ar", right.toDF("k", "ts", "rv")
      .repartition(1), Seq("k", "ts"), maxRowsPerFile = 64).toOption.get

    for (outer <- Seq(false, true)) {
      val jt = if (outer) "left_outer" else "inner"
      val j = ixL.asOfJoin(ixR, equiLen = 1, joinType = jt)
      assert(collected(j) == ref(left, right, strict = false, tol = -1, outer),
        s"content mismatch for $jt")
      val plan = j.queryExecution.executedPlan
      assert(collectFirst(plan) { case z: AsOfZipJoinExec => z }.isDefined,
        s"expected AsOfZipJoinExec for $jt:\n$plan")
      assert(collect(plan) { case e: ShuffleExchangeExec => e }.isEmpty,
        s"as-of co-range join must plan zero exchanges ($jt):\n$plan")
    }

    // the merge's key-ordered emission is a live claim: ORDER BY (k, ts)
    // above the INNER join plans no global sort and no exchange
    val ordered = ixL.asOfJoin(ixR, equiLen = 1).orderBy("k", "ts")
    val oPlan = ordered.queryExecution.executedPlan
    assert(collect(oPlan) { case e: ShuffleExchangeExec => e }.isEmpty &&
      collect(oPlan) { case s: SortExec if s.global => s }.isEmpty,
      s"ORDER BY the left key above the as-of join must elide sort+exchange:\n$oPlan")
    assert(collected(ordered) == ref(left, right, strict = false, tol = -1, outer = false))
  }

  test("strict and tolerance bounds, exact edges") {
    val st = store(tmpDir("graft-asof-tol"))
    val left = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 7L, "c"), (3L, 5L, "d"))
    val right = Seq((1L, 10L, 100L), (1L, 2L, 101L), (2L, 1L, 200L), (3L, 6L, 300L))
    val ixL = KVIndex.bootstrap(st, "tl", left.toDF("k", "ts", "lv")
      .repartition(1), Seq("k", "ts")).toOption.get
    val ixR = KVIndex.bootstrap(st, "tr", right.toDF("k", "ts", "rv")
      .repartition(1), Seq("k", "ts")).toOption.get

    for ((strict, tol) <- Seq((false, -1L), (true, -1L), (false, 5L), (true, 8L), (false, 0L))) {
      val got = collected(ixL.asOfJoin(ixR, equiLen = 1,
        joinType = "left_outer", strict = strict, tolerance = tol))
      assert(got == ref(left, right, strict, tol, outer = true),
        s"mismatch at strict=$strict tol=$tol")
    }
    // spot the edges: strict drops the equal-ts match; tol=0 keeps ONLY it
    val strictGot = collected(ixL.asOfJoin(ixR, equiLen = 1,
      joinType = "left_outer", strict = true))
    assert(strictGot.contains((1L, 10L, "a", Some(2L), Some(101L))))
    val tol0 = collected(ixL.asOfJoin(ixR, equiLen = 1,
      joinType = "left_outer", tolerance = 0L))
    assert(tol0.contains((1L, 10L, "a", Some(10L), Some(100L))) &&
      tol0.contains((2L, 7L, "c", None, None)))
  }

  test("ties on (equi, ts) break by the remaining right key — deterministic latest") {
    val st = store(tmpDir("graft-asof-tie"))
    // right keyed (k, ts, seq): two rows share (k, ts); the greater seq wins
    val right = Seq((1L, 5L, 1L, 10L), (1L, 5L, 2L, 20L), (1L, 9L, 1L, 30L))
    val ixR = KVIndex.bootstrap(st, "xr", right.toDF("k", "ts", "seq", "rv")
      .repartition(1), Seq("k", "ts", "seq")).toOption.get
    val ixL = KVIndex.bootstrap(st, "xl", Seq((1L, 7L, "p"))
      .toDF("k", "ts", "lv").repartition(1), Seq("k", "ts")).toOption.get
    val got = ixL.asOfJoin(ixR, equiLen = 1)
      .select("k", "ts", "lv", "asof_ts", "rv")
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 7L, "p", 5L, 20L)))
  }

  test("non-key ts column with nulls: local sorts order it, null ts never matches") {
    val st = store(tmpDir("graft-asof-nk"))
    // right keyed (k, id); the reading time rts is a VALUE column
    val right = Seq((1L, 1L, Some(5L), 100L), (1L, 2L, None, 999L),
      (1L, 3L, Some(8L), 300L), (2L, 1L, None, 888L))
    val ixR = KVIndex.bootstrap(st, "nr",
      right.toDF("k", "id", "rts", "rv").repartition(1),
      Seq("k", "id")).toOption.get
    val left = Seq((1L, 6L, "a"), (1L, 9L, "b"), (2L, 4L, "c"))
    val ixL = KVIndex.bootstrap(st, "nl", left.toDF("k", "ts", "lv")
      .repartition(1), Seq("k", "ts")).toOption.get
    val got = ixL.asOfJoin(ixR, equiLen = 1, rightTsCol = "rts",
        joinType = "left_outer")
      .select(col("k"), col("ts"), col("lv"), col("asof_ts"), col("rv"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).sorted
    // k=1: probe 6 floors to rts=5; probe 9 to rts=8. k=2: only a
    // null-ts reading exists — never matches.
    assert(got == Seq((1L, 6L, "a", Some(5L), Some(100L)),
      (1L, 9L, "b", Some(8L), Some(300L)), (2L, 4L, "c", None, None)))
  }

  test("non-intersecting equi ranges: inner is empty, left_outer null-extends via bypass legs") {
    val st = store(tmpDir("graft-asof-dis"))
    val ixL = KVIndex.bootstrap(st, "dl", (1L to 20L).map(k => (k, 5L, s"l$k"))
      .toDF("k", "ts", "lv").repartition(1), Seq("k", "ts")).toOption.get
    val ixR = KVIndex.bootstrap(st, "dr", (1000L to 1020L).map(k => (k, 1L, k))
      .toDF("k", "ts", "rv").repartition(1), Seq("k", "ts")).toOption.get
    assert(ixL.asOfJoin(ixR, equiLen = 1).count() == 0L)
    val outer = ixL.asOfJoin(ixR, equiLen = 1, joinType = "left_outer")
    assert(outer.count() == 20L &&
      outer.filter(col("asof_ts").isNull && col("rv").isNull).count() == 20L)
    assert(collect(outer.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e }.isEmpty)
  }

  test("overlapping left layout falls back to the stock plan with identical content") {
    val st = store(tmpDir("graft-asof-ov"))
    // interleave a second batch so the manifest cannot guarantee disjoint
    // ranges (same construction as the equi join's fallback spec)
    val evens = (1 to 50).map(i => (2L * i, 5L, s"e$i")).toDF("k", "ts", "lv")
      .repartition(1)
    val ix0 = KVIndex.bootstrap(st, "ovl", evens, Seq("k", "ts"),
      maxRowsPerFile = 16).toOption.get
    val odds = (1 to 50).map(i => (2L * i - 1, 5L, s"o$i")).toDF("k", "ts", "lv")
      .withColumn("version", lit("tx-asof-ov")).repartition(1)
    val (_, extra) = st.writeData("ovl", odds, KeySpec(Seq("k", "ts")), 4)
    val m2 = ix0.manifest.copy(version = ix0.manifest.version + 1,
      snapshotId = java.util.UUID.randomUUID().toString,
      numElements = 100L, files = ix0.manifest.files ++ extra,
      disjointHint = None)
    val ov = new KVIndex(st, st.commit(m2, ix0.manifest.version))
    val leftRows = (1 to 100).map(i => (i.toLong, 5L, if (i % 2 == 0) s"e${i / 2}" else s"o${(i + 1) / 2}"))

    val right = (1L to 100L).map(k => (k, 3L, k * 7))
    val ixR = KVIndex.bootstrap(st, "ovr", right.toDF("k", "ts", "rv")
      .repartition(1), Seq("k", "ts")).toOption.get
    val j = ov.asOfJoin(ixR, equiLen = 1, joinType = "left_outer")
    assert(collectFirst(j.queryExecution.executedPlan) {
      case z: AsOfZipJoinExec => z }.isEmpty,
      "overlapping layout must not take the as-of zip join")
    assert(collected(j) == ref(leftRows, right, strict = false, tol = -1, outer = true))
  }

  test("randomized differential: layouts x types x strict x tolerance vs the reference") {
    val st = store(tmpDir("graft-asof-rand"))
    val rnd = new Random(20260815L)
    for (round <- 1 to 6) {
      val nK = 1 + rnd.nextInt(12)
      val left = rnd.shuffle((1L to nK.toLong).flatMap(k =>
        (0 until rnd.nextInt(8)).map(_ => (k, rnd.nextInt(50).toLong)))
        .distinct.toList).map { case (k, ts) => (k, ts, s"l$k-$ts") }
      val right = rnd.shuffle((1L to nK.toLong).flatMap(k =>
        (0 until rnd.nextInt(8)).map(_ => (k, rnd.nextInt(50).toLong)))
        .distinct.toList).map { case (k, ts) => (k, ts, k * 100 + ts) }
      if (left.nonEmpty && right.nonEmpty) {
        val mrfL = Seq(4, 16, 64)(rnd.nextInt(3))
        val mrfR = Seq(4, 16, 64)(rnd.nextInt(3))
        val ixL = KVIndex.bootstrap(st, s"rl$round", left.toDF("k", "ts", "lv")
          .repartition(1), Seq("k", "ts"), maxRowsPerFile = mrfL).toOption.get
        val ixR = KVIndex.bootstrap(st, s"rr$round", right.toDF("k", "ts", "rv")
          .repartition(1), Seq("k", "ts"), maxRowsPerFile = mrfR).toOption.get
        for (outer <- Seq(false, true); strict <- Seq(false, true)) {
          val tol = Seq(-1L, 0L, 7L)(rnd.nextInt(3))
          val rpl = Seq(-1L, 8L, 40L)(rnd.nextInt(3))
          val got = collected(ixL.asOfJoin(ixR, equiLen = 1,
            joinType = if (outer) "left_outer" else "inner",
            strict = strict, tolerance = tol, rowsPerLeg = rpl))
          assert(got == ref(left, right, strict, tol, outer),
            s"round=$round outer=$outer strict=$strict tol=$tol rpl=$rpl")
        }
      }
    }
  }

  test("timestamp ts with a micros tolerance: exec and fallback paths agree exactly") {
    val st = store(tmpDir("graft-asof-tsty"))
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
    // readings at 99s/150s (k=1) and 10s (k=2); probes at 100s/200s/50s
    val left = withTs(Seq((1L, 100L, 1L), (1L, 200L, 2L), (2L, 50L, 3L))
      .toDF("k", "sec", "v")).withColumnRenamed("v", "lv")
    val right = withTs(Seq((1L, 99L, 10L), (1L, 150L, 20L), (2L, 10L, 30L))
      .toDF("k", "sec", "v")).withColumnRenamed("v", "rv")
    val ixL = KVIndex.bootstrap(st, "tsl", left.repartition(1),
      Seq("k", "ts")).toOption.get
    val ixR = KVIndex.bootstrap(st, "tsr", right.repartition(1),
      Seq("k", "ts")).toOption.get
    // 5-second tolerance in MICROSECONDS (the TIMESTAMP native unit)
    def shaped(j: org.apache.spark.sql.DataFrame) =
      j.select(col("k"), unix_seconds(col("ts")).as("t"),
          unix_seconds(col("asof_ts")).as("m"), col("rv"))
        .collect().toSeq.map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).sorted
    val zipped = ixL.asOfJoin(ixR, equiLen = 1, joinType = "left_outer",
      tolerance = 5000000L)
    assert(collectFirst(zipped.queryExecution.executedPlan) {
      case z: AsOfZipJoinExec => z }.isDefined)
    val want = Seq(
      (1L, 100L, Some(99L), Some(10L)), // 1 s inside the band
      (1L, 200L, None, None),           // floor is 50 s back — outside
      (2L, 50L, None, None))            // floor is 40 s back — outside
    assert(shaped(zipped) == want)

    // force the stock fallback by breaking the right layout's disjointness
    // with an interleaved second batch; semantics must not move
    val extraRows = withTs(Seq((1L, 120L, 40L), (2L, 45L, 50L))
      .toDF("k", "sec", "v")).withColumnRenamed("v", "rv")
      .withColumn("version", lit("tx-asof-tsty")).repartition(1)
    val (_, extra) = st.writeData("tsr", extraRows, KeySpec(Seq("k", "ts")), 2)
    val m2 = ixR.manifest.copy(version = ixR.manifest.version + 1,
      snapshotId = java.util.UUID.randomUUID().toString,
      numElements = 5L, files = ixR.manifest.files ++ extra,
      disjointHint = None)
    val ovR = new KVIndex(st, st.commit(m2, ixR.manifest.version))
    val fb = ixL.asOfJoin(ovR, equiLen = 1, joinType = "left_outer",
      tolerance = 5000000L)
    assert(collectFirst(fb.queryExecution.executedPlan) {
      case z: AsOfZipJoinExec => z }.isEmpty, "overlapping right must fall back")
    // the 120 s reading is now k=1/200 s's floor, 80 s outside the band;
    // 45 s is k=2/50 s's floor and INSIDE it — identical rule, stock plan
    assert(shaped(fb) == Seq(
      (1L, 100L, Some(99L), Some(10L)),
      (1L, 200L, None, None),
      (2L, 50L, Some(45L), Some(50L))))
  }

  test("two-column equi prefix (equiLen = 2): tuple boundaries never split a group") {
    val st = store(tmpDir("graft-asof-el2"))
    // keys (region, device, ts): the equi group is the (region, device)
    // PAIR — boundary tuples are length 2 and a group must never split
    val right = for (r <- 1L to 4L; d <- 1L to 12L; ts <- Seq(0L, 10L, 20L))
      yield (r, d, ts, r * 1000 + d * 10 + ts)
    val left = for (r <- 1L to 5L; d <- 1L to 14L; ts <- Seq(5L, 25L))
      yield (r, d, ts, s"p$r-$d-$ts")
    val ixR = KVIndex.bootstrap(st, "e2r", right.toDF("r", "d", "ts", "rv")
      .repartition(1), Seq("r", "d", "ts"), maxRowsPerFile = 8).toOption.get
    val ixL = KVIndex.bootstrap(st, "e2l", left.toDF("r", "d", "ts", "lv")
      .repartition(1), Seq("r", "d", "ts"), maxRowsPerFile = 16).toOption.get

    def reference(outer: Boolean) = left.toSeq.sorted.flatMap { case (r, d, ts, lv) =>
      val cands = right.filter(x => x._1 == r && x._2 == d && x._3 <= ts)
      if (cands.nonEmpty) { val m = cands.maxBy(x => (x._3, x._4))
        Some((r, d, ts, lv, Some(m._3), Some(m._4))) }
      else if (outer) Some((r, d, ts, lv, None, None)) else None
    }
    def shaped(df: org.apache.spark.sql.DataFrame) =
      df.select(col("r"), col("d"), col("ts"), col("lv"), col("asof_ts"), col("rv"))
        .collect().toSeq.map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          x.getString(3),
          if (x.isNullAt(4)) None else Some(x.getLong(4)),
          if (x.isNullAt(5)) None else Some(x.getLong(5)))).sorted

    for (outer <- Seq(false, true)) {
      val j = ixL.asOfJoin(ixR, equiLen = 2,
        joinType = if (outer) "left_outer" else "inner")
      assert(shaped(j) == reference(outer), s"asOfJoin el=2 outer=$outer")
      assert(collect(j.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e }.isEmpty)
    }
    // the probe join with a 2-column prefix routes on the tuple
    val probes = left.toSeq.map { case (r, d, ts, lv) => (r, d, ts, lv) }
      .toDF("r", "d", "ts", "lv").repartition(3)
    val viaProbe = shaped(ixR.asOfProbe(probes, Seq("r", "d"), "ts",
      joinType = "left_outer"))
    assert(viaProbe == reference(outer = true))
  }

  test("column pruning reaches the leg scans; left filters push below the join") {
    val st = store(tmpDir("graft-asof-prune"))
    val left = (1L to 400L).map(k => (k, 5L, s"l$k", s"wide-l$k"))
    val right = (1L to 400L).map(k => (k, 3L, k * 7, s"wide-r$k"))
    val ixL = KVIndex.bootstrap(st, "pl", left.toDF("k", "ts", "lv", "lw")
      .repartition(1), Seq("k", "ts"), maxRowsPerFile = 64).toOption.get
    val ixR = KVIndex.bootstrap(st, "pr", right.toDF("k", "ts", "rv", "rw")
      .repartition(1), Seq("k", "ts"), maxRowsPerFile = 64).toOption.get
    val q = ixL.asOfJoin(ixR, equiLen = 1)
      .filter(col("k") <= 100L).select("k", "ts", "rv")
    val plan = q.queryExecution.executedPlan
    val scans = collect(plan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty)
    // neither side's wide payload column is read
    assert(scans.forall(s => !s.requiredSchema.fieldNames.contains("lw") &&
      !s.requiredSchema.fieldNames.contains("rw")),
      s"wide columns must be pruned from the leg scans:\n$plan")
    // the left-only filter evaluates at the scans (pushed), not above the join
    assert(scans.exists(_.dataFilters.nonEmpty),
      s"expected the key bound pushed into leg scans:\n$plan")
    assert(q.count() == 100L)
  }
}
