package graft

import scala.util.Random

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.core._
import graft.plans.AsOfZipJoinExec

/** The as-of PROBE join: an arbitrary DataFrame of probe rows enriched
  * against a range-laid snapshot — probes are routed onto the snapshot's
  * leg boundaries (one partitioner shuffle of the probe side ALONE), the
  * snapshot never moves. Content parity against a driver-side reference
  * is the correctness contract; the no-SQL-exchange plan, the leg-count
  * alignment and the routing/leg boundary agreement are the scale
  * contract.
  */
class AsOfProbeSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def store(dir: String) = new FsSnapshotStore(s"$dir/store", spark)

  private def ref(probes: Seq[(Long, Long, String)], right: Seq[(Long, Long, Long)],
                  strict: Boolean, tol: Long, outer: Boolean)
      : Seq[(Long, Long, String, Option[Long], Option[Long])] =
    probes.sorted.flatMap { case (k, ts, lv) =>
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

  test("probe join matches the reference; the SQL plan has zero exchanges; legs align") {
    val st = store(tmpDir("graft-aprobe"))
    val right = (1L to 40L).flatMap(k => (0L to 90L by 10L).map(ts =>
      (k, ts, k * 1000 + ts)))
    val ixR = KVIndex.bootstrap(st, "apr", right.toDF("k", "ts", "rv")
      .repartition(1), Seq("k", "ts"), maxRowsPerFile = 32).toOption.get
    // probes: unsorted, duplicated, keys beyond the snapshot, null-free
    val probes = Seq((7L, 35L, "a"), (2L, 5L, "b"), (7L, 35L, "a2"),
      (99L, 50L, "miss"), (1L, 0L, "edge"), (40L, 95L, "hi"))
    val pdf = probes.toDF("k", "ts", "lv").repartition(3)

    for (outer <- Seq(false, true)) {
      val jt = if (outer) "left_outer" else "inner"
      val j = ixR.asOfProbe(pdf, Seq("k"), "ts", joinType = jt)
      assert(collected(j) == ref(probes, right, strict = false, tol = -1, outer),
        s"content mismatch for $jt")
      val plan = j.queryExecution.executedPlan
      assert(collectFirst(plan) { case z: AsOfZipJoinExec => z }.isDefined,
        s"expected AsOfZipJoinExec for $jt:\n$plan")
      // the probe routing is an RDD-level partitioner shuffle (probe side
      // only); the SQL plan itself must stay exchange-free
      assert(collect(plan) { case e: ShuffleExchangeExec => e }.isEmpty,
        s"no SQL exchange expected ($jt):\n$plan")
    }

    // leg alignment: output partitions == boundary count + 1
    val bounds = ixR.probeLegPlans(1) match {
      case graft.core.ProbeLegs.Legs(b, _) => b
      case other => fail(s"expected Legs, got $other")
    }
    val j = ixR.asOfProbe(pdf, Seq("k"), "ts")
    assert(j.rdd.getNumPartitions == bounds.length + 1,
      s"probe partitions must align with the snapshot's legs")
  }

  test("empty and out-of-range probe batches answer without any snapshot scan") {
    val st = store(tmpDir("graft-aprobe-empty"))
    val right = (1L to 40L).flatMap(k => (0L to 90L by 10L).map(ts =>
      (k, ts, k * 1000 + ts)))
    val ixR = KVIndex.bootstrap(st, "apre", right.toDF("k", "ts", "rv")
      .repartition(1), Seq("k", "ts"), maxRowsPerFile = 32).toOption.get

    def snapshotScanned(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("apre")

    // EMPTY probe batch (the idle-stream micro-batch): result empty,
    // schema intact, zero snapshot files touched — "cost follows the
    // stream's rate"
    val empty = Seq.empty[(Long, Long, String)].toDF("k", "ts", "lv")
    for (jt <- Seq("inner", "left_outer")) {
      val j = ixR.asOfProbe(empty, Seq("k"), "ts", joinType = jt)
      assert(j.columns.toSeq == Seq("k", "ts", "lv", "asof_ts", "rv"), jt)
      assert(j.count() == 0L, jt)
      assert(!snapshotScanned(j), s"empty probe batch must not scan the snapshot ($jt)")
    }
    for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
      val j = ixR.probeJoin(empty.drop("ts"), Seq("k"), jt)
      assert(j.count() == 0L, jt)
      assert(!snapshotScanned(j), s"empty probe batch must not scan the snapshot ($jt)")
    }

    // probes wholly OUTSIDE the snapshot's key range: bounds prune every
    // file → the provably match-free answer, not a full stock-join pass
    val out = Seq((900L, 5L, "x"), (901L, 7L, "y")).toDF("k", "ts", "lv")
    val inner = ixR.asOfProbe(out, Seq("k"), "ts", joinType = "inner")
    assert(inner.count() == 0L)
    assert(!snapshotScanned(inner), "all-pruned inner must not scan the snapshot")
    val outer = ixR.asOfProbe(out, Seq("k"), "ts", joinType = "left_outer")
    assert(collected(outer) == Seq(
      (900L, 5L, "x", None, None), (901L, 7L, "y", None, None)))
    assert(!snapshotScanned(outer), "all-pruned outer must not scan the snapshot")
    val anti = ixR.probeJoin(out.drop("ts"), Seq("k"), "left_anti")
    assert(anti.orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(900L, 901L))
    assert(!snapshotScanned(anti), "all-pruned anti must not scan the snapshot")
    val po = ixR.probeJoin(out.drop("ts"), Seq("k"), "left_outer")
    assert(po.count() == 2L && po.filter(col("rv").isNotNull).count() == 0L)
    assert(!snapshotScanned(po), "all-pruned left_outer must not scan the snapshot")
  }

  test("probe join agrees with the snapshot-to-snapshot asOfJoin on identical data") {
    val st = store(tmpDir("graft-aprobe-eq"))
    val right = (1L to 30L).flatMap(k => Seq(0L, 7L, 20L).map(ts =>
      (k, ts, k * 10 + ts)))
    val left = (1L to 35L).map(k => (k, (k % 25) + 1, s"p$k"))
    val ixR = KVIndex.bootstrap(st, "eqr", right.toDF("k", "ts", "rv")
      .repartition(1), Seq("k", "ts"), maxRowsPerFile = 16).toOption.get
    val ixL = KVIndex.bootstrap(st, "eql", left.toDF("k", "ts", "lv")
      .repartition(1), Seq("k", "ts"), maxRowsPerFile = 64).toOption.get
    for (jt <- Seq("inner", "left_outer"); strict <- Seq(false, true)) {
      val viaProbe = collected(ixR.asOfProbe(ixL.df.select("k", "ts", "lv"),
        Seq("k"), "ts", joinType = jt, strict = strict))
      val viaJoin = collected(ixL.asOfJoin(ixR, equiLen = 1,
        joinType = jt, strict = strict))
      assert(viaProbe == viaJoin, s"probe vs join divergence at $jt strict=$strict")
    }
  }

  test("null probe keys never match; left_outer keeps them; inner drops them") {
    val st = store(tmpDir("graft-aprobe-null"))
    val ixR = KVIndex.bootstrap(st, "nr", (1L to 10L).map(k => (k, 1L, k))
      .toDF("k", "ts", "rv").repartition(1), Seq("k", "ts")).toOption.get
    val pdf = Seq((Some(1L), Some(5L), "ok"), (None, Some(5L), "nullk"),
      (Some(2L), None, "nullts")).toDF("k", "ts", "lv")
    val outer = ixR.asOfProbe(pdf, Seq("k"), "ts", joinType = "left_outer")
      .select(col("lv"), col("rv")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq.sortBy(_._1)
    assert(outer == Seq(("nullk", None), ("nullts", None), ("ok", Some(1L))))
    assert(ixR.asOfProbe(pdf, Seq("k"), "ts").count() == 1L)
  }

  test("randomized differential incl. tolerance, layouts, duplicate probes") {
    val st = store(tmpDir("graft-aprobe-rand"))
    val rnd = new Random(816L)
    for (round <- 1 to 5) {
      val nK = 1 + rnd.nextInt(10)
      val right = rnd.shuffle((1L to nK.toLong).flatMap(k =>
        (0 until rnd.nextInt(6)).map(_ => (k, rnd.nextInt(40).toLong)))
        .distinct.toList).map { case (k, ts) => (k, ts, k * 100 + ts) }
      // probes are NOT deduped — duplicates must each match independently
      val probes = (0 until rnd.nextInt(60)).map { i =>
        val k = 1L + rnd.nextInt(nK + 2) // some keys miss the snapshot
        val ts = rnd.nextInt(45).toLong
        (k, ts, s"p$i-$k-$ts")
      }
      if (right.nonEmpty && probes.nonEmpty) {
        val ixR = KVIndex.bootstrap(st, s"rr$round", right.toDF("k", "ts", "rv")
          .repartition(1), Seq("k", "ts"),
          maxRowsPerFile = Seq(4, 16, 64)(rnd.nextInt(3))).toOption.get
        val pdf = probes.toDF("k", "ts", "lv").repartition(1 + rnd.nextInt(4))
        for (outer <- Seq(false, true)) {
          val strict = rnd.nextBoolean()
          val tol = Seq(-1L, 0L, 6L)(rnd.nextInt(3))
          val got = collected(ixR.asOfProbe(pdf, Seq("k"), "ts",
            joinType = if (outer) "left_outer" else "inner",
            strict = strict, tolerance = tol,
            rowsPerLeg = Seq(-1L, 8L)(rnd.nextInt(2))))
          assert(got == ref(probes, right, strict, tol, outer),
            s"round=$round outer=$outer strict=$strict tol=$tol")
        }
      }
    }
  }

  test("equi probeJoin: all four types match the stock join; prefix groups emit every row") {
    val st = store(tmpDir("graft-pjoin"))
    // composite-keyed snapshot: a PREFIX probe join must emit the whole
    // (k, sub) group per matching probe
    val right = (1L to 20L).flatMap(k => (1L to (k % 3 + 1)).map(sub =>
      (k, sub, k * 100 + sub)))
    val ixR = KVIndex.bootstrap(st, "pj", right.toDF("k", "sub", "rv")
      .repartition(1), Seq("k", "sub"), maxRowsPerFile = 8).toOption.get
    val probes = Seq((Some(3L), "a"), (Some(3L), "dup"), (Some(19L), "b"),
      (Some(99L), "miss"), (None: Option[Long], "nullk"))
    val pdf = probes.toDF("k", "tag").repartition(2)

    val stockBase = pdf.alias("p").join(ixR.df.alias("r"),
      col("p.k") === col("r.k"), _: String)
    for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
      val got = ixR.probeJoin(pdf, Seq("k"), joinType = jt)
      val want = jt match {
        case "inner" | "left_outer" =>
          stockBase(jt).select(col("p.k"), col("tag"), col("sub"), col("rv"))
        case _ => stockBase(jt).select(col("p.k"), col("tag"))
      }
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.collect().toSeq.map(_.toSeq.map(v => Option(v).map(_.toString)))
          .sortBy(_.toString)
      assert(norm(got) == norm(want), s"content mismatch for $jt")
      val plan = got.queryExecution.executedPlan
      assert(collectFirst(plan) {
        case z: graft.plans.ZipPartitionsJoinExec => z }.isDefined,
        s"expected the zip join for $jt:\n$plan")
      assert(collect(plan) { case e: ShuffleExchangeExec => e }.isEmpty,
        s"no SQL exchange expected for $jt:\n$plan")
    }
    // spot-check prefix-group emission: probe k=3 (twice) x its 1-sub
    // group, k=19 x its 2-sub group
    assert(ixR.probeJoin(pdf, Seq("k")).count() ==
      2L * right.count(_._1 == 3L) + right.count(_._1 == 19L))
  }

  test("equi probeJoin randomized differential vs the stock join") {
    val st = store(tmpDir("graft-pjoin-rand"))
    val rnd = new Random(4242L)
    for (round <- 1 to 4) {
      val right = (1L to (5L + rnd.nextInt(15))).flatMap(k =>
        (1L to (1L + rnd.nextInt(3))).map(sub => (k, sub, k * 10 + sub)))
      val ixR = KVIndex.bootstrap(st, s"pr$round", right.toDF("k", "sub", "rv")
        .repartition(1), Seq("k", "sub"),
        maxRowsPerFile = Seq(4, 16)(rnd.nextInt(2))).toOption.get
      val probes = (0 until 30).map(i => (rnd.nextInt(25).toLong, s"t$i"))
      val pdf = probes.toDF("k", "tag").repartition(1 + rnd.nextInt(3))
      for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
        val got = ixR.probeJoin(pdf, Seq("k"), joinType = jt,
          rowsPerLeg = Seq(-1L, 6L)(rnd.nextInt(2)))
        val want = jt match {
          case "inner" | "left_outer" =>
            pdf.alias("p").join(ixR.df.alias("r"), col("p.k") === col("r.k"), jt)
              .select(col("p.k"), col("tag"), col("sub"), col("rv"))
          case _ =>
            pdf.alias("p").join(ixR.df.alias("r"), col("p.k") === col("r.k"), jt)
              .select(col("p.k"), col("tag"))
        }
        def norm(df: org.apache.spark.sql.DataFrame) =
          df.collect().toSeq.map(_.toSeq.map(v => Option(v).map(_.toString)))
            .sortBy(_.toString)
        assert(norm(got) == norm(want), s"round=$round jt=$jt")
      }
    }
  }

  test("probe bounds prune the snapshot files: selective probes scan covering files only") {
    val st = store(tmpDir("graft-pjoin-prune"))
    val right = (1L to 4000L).map(k => (k, 1L, k * 3))
    val ixR = KVIndex.bootstrap(st, "pp", right.toDF("k", "ts", "rv")
      .repartition(1), Seq("k", "ts"), maxRowsPerFile = 200).toOption.get
    assert(ixR.numFiles >= 15, s"fixture needs many files, got ${ixR.numFiles}")
    val probes = (1000L to 1100L).map(k => (k, s"p$k")).toDF("k", "tag")

    def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      collect(df.queryExecution.executedPlan) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.flatMap(_.relation.location.inputFiles).distinct.length

    val pruned = ixR.probeJoin(probes, Seq("k"))
    val unpruned = ixR.probeJoin(probes, Seq("k"), pruneFiles = false)
    assert(scannedFiles(pruned) <= 3,
      s"101-key probe slice must scan ~1 covering file, planned ${scannedFiles(pruned)}")
    assert(scannedFiles(unpruned) >= 15)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(_.toSeq.map(String.valueOf)).sortBy(_.toString)
    assert(norm(pruned) == norm(unpruned))
    assert(pruned.count() == 101L)

    // the as-of probe prunes the same way (equi-prefix grain)
    val asof = ixR.asOfProbe(probes.withColumn("ts", lit(5L)), Seq("k"), "ts")
    assert(scannedFiles(asof) <= 3)
    assert(asof.count() == 101L)
  }

  test("lowest equi group spanning the first file boundary: empty leg 0 merges away") {
    val st = store(tmpDir("graft-aprobe-leg0"))
    // k=1 has 20 readings across several 8-row files: the first prefix
    // boundary is (1), and every full key (1, ts) sorts ABOVE its own
    // prefix — leg 0 would cover no files and must merge into leg 1
    val right = (0L until 20L).map(ts => (1L, ts, ts * 10)) ++
      (2L to 30L).map(k => (k, 0L, k * 100))
    val ixR = KVIndex.bootstrap(st, "lg", right.toDF("k", "ts", "rv")
      .repartition(1), Seq("k", "ts"), maxRowsPerFile = 8).toOption.get
    val probes = Seq((1L, 7L, "a"), (1L, 50L, "b"), (2L, 3L, "c"), (0L, 9L, "below"))
    val got = collected(ixR.asOfProbe(probes.toDF("k", "ts", "lv"),
      Seq("k"), "ts", joinType = "left_outer"))
    assert(got == ref(probes, right, strict = false, tol = -1, outer = true))
    // the equi probe join takes the same leg construction (probe ts
    // renamed: the prefix join's output carries the snapshot's tail key)
    assert(ixR.probeJoin(probes.toDF("k", "pts", "lv"), Seq("k")).count() ==
      2 * 20L + 1L) // k=1 probes match all 20 group rows; k=2 one; 0 none
  }

  test("Int-keyed snapshot reopened from disk: JSON-widened bounds still route") {
    val dir = tmpDir("graft-aprobe-int")
    val right = (1 to 400).map(k => (k, k.toLong * 3))
    KVIndex.bootstrap(new FsSnapshotStore(s"$dir/store", spark), "ik",
      right.toDF("k", "rv").repartition(1), Seq("k"),
      maxRowsPerFile = 50).toOption.get
    // a FRESH store instance reads the manifest from JSON, which widens
    // Int bounds to Long — routing must narrow them back to the schema
    val reopened = KVIndex.open(new FsSnapshotStore(s"$dir/store", spark), "ik")
      .toOption.get
    val probes = (100 to 140).map(k => (k, s"p$k")).toDF("k", "tag")
    val j = reopened.probeJoin(probes, Seq("k"))
    assert(j.count() == 41L)
    assert(j.select(sum(col("rv"))).head.getLong(0) ==
      (100 to 140).map(_ * 3L).sum)
  }

  test("big probe sets bloom-prefilter the leg scans; small ones skip the sketch") {
    val st = store(tmpDir("graft-aprobe-bloom"))
    val right = (1L to 5000L).map(k => (k, 1L, k * 3))
    val ixR = KVIndex.bootstrap(st, "bl", right.toDF("k", "ts", "rv")
      .repartition(1), Seq("k", "ts"), maxRowsPerFile = 2000).toOption.get
    // 400 sparse probes (every 11th key) spread over the whole key range:
    // the bounds prune keeps all files, the bloom drops non-matching rows
    // inside the scans before the per-leg sort
    val big = (1L to 4400L by 11L).map(k => (k, s"p$k")).toDF("k", "tag")
    val j = ixR.probeJoin(big, Seq("k"))
    assert(j.queryExecution.executedPlan.toString.contains("might_contain"),
      "expected the bloom prefilter in the leg scans")
    assert(j.count() == 400L)
    // parity with the unfiltered stock join
    assert(j.select(sum(col("rv"))).head.getLong(0) ==
      (1L to 4400L by 11L).map(_ * 3L).sum)
    // below the threshold: no sketch job, no predicate
    val small = Seq((5L, "a"), (17L, "b")).toDF("k", "tag")
    val js = ixR.probeJoin(small, Seq("k"))
    assert(!js.queryExecution.executedPlan.toString.contains("might_contain"))
    assert(js.count() == 2L)
    // the as-of probe takes the same prefilter (equi-prefix grain)
    val asof = ixR.asOfProbe(big.withColumn("ts", lit(9L)), Seq("k"), "ts")
    assert(asof.queryExecution.executedPlan.toString.contains("might_contain"))
    assert(asof.count() == 400L)
  }

  test("key types x REOPENED snapshots: routing agrees with the merge for Int/Long/String/Timestamp keys") {
    // manifest JSON round-trips rewrite key bounds (Int->Long widening,
    // Timestamp->ms truncation): the router and the leg slices must stay
    // consistent with each other AND with full-precision merge equality
    val dir = tmpDir("graft-aprobe-types")
    val rnd = new Random(1606L)

    def check[T](tag: String, df: org.apache.spark.sql.DataFrame,
                 probes: org.apache.spark.sql.DataFrame, expectInner: Long): Unit = {
      KVIndex.bootstrap(new FsSnapshotStore(s"$dir/$tag", spark), tag,
        df.repartition(1), Seq("k", "ts"), maxRowsPerFile = 16).toOption.get
      val re = KVIndex.open(new FsSnapshotStore(s"$dir/$tag", spark), tag)
        .toOption.get
      val inner = re.probeJoin(probes, Seq("k"))
      assert(inner.count() == expectInner, s"$tag inner count")
      // stock parity on the reopened handle
      val want = probes.alias("p").join(re.df.alias("r"),
        col("p.k") === col("r.k")).count()
      assert(inner.count() == want, s"$tag stock parity")
    }

    // Int keys (widen to Long in JSON)
    check("ti",
      (1 to 300).map(i => (i, 1L, i * 2L)).toDF("k", "ts", "rv"),
      (50 to 80).map(i => (i, s"p$i")).toDF("k", "tag"), 31L)
    // String keys (lexicographic boundaries)
    check("ts",
      (1 to 300).map(i => (f"k$i%04d", 1L, i.toLong)).toDF("k", "ts", "rv"),
      (50 to 80).map(i => (f"k$i%04d", s"p$i")).toDF("k", "tag"), 31L)
    // Timestamp keys (ms-truncated bounds; values carry micros)
    val tsRows = (1 to 300).map(i => (i.toLong * 1000 + rnd.nextInt(999), 1L, i.toLong))
    val tsDf = tsRows.toDF("us", "ts", "rv")
      .select(timestamp_micros(col("us")).as("k"), col("ts"), col("rv"))
    val tsProbes = tsRows.slice(49, 80).map(_._1).toDF("us")
      .select(timestamp_micros(col("us")).as("k"), lit("p").as("tag"))
    check("tt", tsDf, tsProbes, 31L)
  }

  test("overlapping snapshot layout falls back to the stock probe plan") {
    val st = store(tmpDir("graft-aprobe-ov"))
    val evens = (1 to 50).map(i => (2L * i, 5L, 2L * i)).toDF("k", "ts", "rv")
      .repartition(1)
    val ix0 = KVIndex.bootstrap(st, "povl", evens, Seq("k", "ts"),
      maxRowsPerFile = 16).toOption.get
    val odds = (1 to 50).map(i => (2L * i - 1, 5L, 2L * i - 1))
      .toDF("k", "ts", "rv").withColumn("version", lit("tx-aprobe-ov"))
      .repartition(1)
    val (_, extra) = st.writeData("povl", odds, KeySpec(Seq("k", "ts")), 4)
    val m2 = ix0.manifest.copy(version = ix0.manifest.version + 1,
      snapshotId = java.util.UUID.randomUUID().toString,
      numElements = 100L, files = ix0.manifest.files ++ extra,
      disjointHint = None)
    val ov = new KVIndex(st, st.commit(m2, ix0.manifest.version))
    val right = (1 to 100).map(i => (i.toLong, 5L, i.toLong))
    val probes = (1L to 100L).map(k => (k, 9L, s"p$k"))
    val j = ov.asOfProbe(probes.toDF("k", "ts", "lv"), Seq("k"), "ts",
      joinType = "left_outer")
    assert(collectFirst(j.queryExecution.executedPlan) {
      case z: AsOfZipJoinExec => z }.isEmpty,
      "overlapping layout must not take the probe zip join")
    assert(collected(j) == ref(probes, right, strict = false, tol = -1, outer = true))
  }
}
