package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.core._
import graft.plans.ZipPartitionsJoinExec

/** The conf-gated EAGER probe-bounds path of the SQL probe rewrites
  * (`spark.graft.probe.sqlEagerBounds`): one optimizer-time min/max/count
  * job over the probe side buys SQL text the API path's economics —
  * probe-derived file pruning of the snapshot's legs, typed answers for
  * empty / fully-out-of-range probe sets (zero snapshot files read), and
  * the ≥256-probe bloom prefilter of the leg scans. Soundness gates
  * pinned here: graft-preserving join types never prune (their unmatched
  * snapshot rows must survive), nondeterministic probe sides decline the
  * eager pass (it re-executes the probe subtree), and content always
  * matches the stock twin.
  */
class SqlEagerBoundsSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def withEager[T](f: => T): T = {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.probe.sqlEagerBounds", "true")
    try f finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.unset("spark.graft.probe.sqlEagerBounds") // back to `auto`
    }
  }

  private def zipCount(df: org.apache.spark.sql.DataFrame): Int =
    collect(df.queryExecution.executedPlan) { case z: ZipPartitionsJoinExec => z }.size

  private def sorted(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq

  // one shared snapshot: 3000 rows over ~47 files (maxRowsPerFile = 64).
  // The "all files" baseline comes from a conf-OFF probe rewrite over a
  // full-range probe set: `inputFiles` of the raw DSV2 graft scan is empty
  // (custom Scan, not a FileRelation), but the rewritten leg union reads
  // plain parquet relations and reports every file it would touch.
  private lazy val (catName, nFilesAll): (String, Int) = {
    val dir = tmpDir("graft-eager")
    val st = new FsSnapshotStore(s"$dir/store", spark)
    val dim = (1 to 3000).map(i => (i.toLong, s"d$i", i * 7L))
      .toDF("k", "dv", "dx").repartition(1)
    KVIndex.bootstrap(st, "dim", dim, Seq("k"), maxRowsPerFile = 64).toOption.get
    spark.conf.set("spark.sql.catalog.egb", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.egb.root", st.root)
    (1L to 3000L).map(k => (k, "w")).toDF("k", "fv")
      .createOrReplaceTempView("egb_allkeys")
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val all = try spark.sql(
      "SELECT f.k, d.dv FROM egb_allkeys f JOIN egb.dim d ON f.k = d.k")
      .inputFiles.length
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
    assert(all > 20, s"fixture should split into many files, got $all")
    ("egb", all)
  }

  test("eager bounds prune the snapshot's files from the probe set") {
    val nAll = nFilesAll
    (100L to 150L).map(k => (k, s"f$k")).toDF("k", "fv")
      .createOrReplaceTempView("egb_narrow")
    val sql = "SELECT f.k, f.fv, d.dv FROM egb_narrow f JOIN egb.dim d ON f.k = d.k"
    withEager {
      val q = spark.sql(sql)
      assert(zipCount(q) == 1, s"must still zip:\n${q.queryExecution.executedPlan}")
      val pruned = q.inputFiles.length
      assert(pruned <= 3,
        s"probes in [100,150] must prune to the covering files, read $pruned of $nAll")
      assert(sorted(q) == (100L to 150L).map(k =>
        Seq(s"$k", s"f$k", s"d$k")).sortBy(_.mkString("|")))
    }
    // conf off: same plan shape, no probe-derived prune
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.probe.sqlEagerBounds", "false")
    try {
      val q0 = spark.sql(sql)
      assert(zipCount(q0) == 1)
      assert(q0.inputFiles.length == nAll,
        "with the conf OFF the rewrite must not run probe-side jobs")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.unset("spark.graft.probe.sqlEagerBounds")
    }
  }

  test("probe bounds intersect the snapshot's own pushed WHERE bounds") {
    (1L to 2000L).map(k => (k, s"f$k")).toDF("k", "fv")
      .createOrReplaceTempView("egb_wide")
    withEager {
      // probes end at 2000, the WHERE starts at 2900: the intersection is
      // empty, so the rewrite answers with zero files and zero rows
      val q = spark.sql(
        """SELECT f.k, d.dv FROM egb_wide f JOIN egb.dim d
           ON f.k = d.k WHERE d.k >= 2900""")
      assert(q.inputFiles.isEmpty,
        s"disjoint WHERE/probe ranges must read zero files, read ${q.inputFiles.length}")
      assert(q.count() == 0)
      // overlapping case: WHERE >= 1500 ∩ probes [1,2000] = [1500,2000]
      val q2 = spark.sql(
        """SELECT f.k, d.dv FROM egb_wide f JOIN egb.dim d
           ON f.k = d.k WHERE d.k >= 1500""")
      assert(zipCount(q2) == 1)
      val read = q2.inputFiles.length
      assert(read < nFilesAll / 2,
        s"intersected bounds must prune below half the files, read $read")
      assert(q2.count() == 501)
    }
  }

  test("empty probe set answers without touching the snapshot") {
    Seq.empty[(Long, String)].toDF("k", "fv").createOrReplaceTempView("egb_empty")
    withEager {
      for (jt <- Seq("JOIN", "LEFT JOIN", "LEFT SEMI JOIN", "LEFT ANTI JOIN")) {
        val sel = jt match {
          case "LEFT SEMI JOIN" | "LEFT ANTI JOIN" => "f.k, f.fv"
          case _ => "f.k, f.fv, d.dv"
        }
        val q = spark.sql(s"SELECT $sel FROM egb_empty f $jt egb.dim d ON f.k = d.k")
        assert(q.inputFiles.isEmpty, s"$jt: empty probes must read zero snapshot files")
        assert(q.count() == 0, s"$jt: empty probes give an empty result")
      }
    }
  }

  test("all probes out of range: typed answers per join type, zero files") {
    (Seq((Option(100001L), "a"), (Option(100002L), "b"),
      (Option.empty[Long], "nul"))).toDF("k", "fv")
      .createOrReplaceTempView("egb_oor")
    withEager {
      val inner = spark.sql(
        "SELECT f.k, f.fv, d.dv FROM egb_oor f JOIN egb.dim d ON f.k = d.k")
      assert(inner.inputFiles.isEmpty && inner.count() == 0)

      val louter = spark.sql(
        "SELECT f.k, f.fv, d.dv FROM egb_oor f LEFT JOIN egb.dim d ON f.k = d.k")
      assert(louter.inputFiles.isEmpty)
      assert(sorted(louter) == Seq(
        Seq("100001", "a", "null"), Seq("100002", "b", "null"),
        Seq("null", "nul", "null")).sortBy(_.mkString("|")))

      val semi = spark.sql(
        "SELECT f.k, f.fv FROM egb_oor f LEFT SEMI JOIN egb.dim d ON f.k = d.k")
      assert(semi.inputFiles.isEmpty && semi.count() == 0)

      val anti = spark.sql(
        "SELECT f.k, f.fv FROM egb_oor f LEFT ANTI JOIN egb.dim d ON f.k = d.k")
      assert(anti.inputFiles.isEmpty)
      assert(sorted(anti) == Seq(Seq("100001", "a"), Seq("100002", "b"),
        Seq("null", "nul")).sortBy(_.mkString("|")))

      // probe on the RIGHT of a RIGHT JOIN (graft left, probe preserved)
      val router = spark.sql(
        "SELECT d.dv, f.k, f.fv FROM egb.dim d RIGHT JOIN egb_oor f ON d.k = f.k")
      assert(router.inputFiles.isEmpty)
      assert(sorted(router) == Seq(
        Seq("null", "100001", "a"), Seq("null", "100002", "b"),
        Seq("null", "null", "nul")).sortBy(_.mkString("|")))
    }
  }

  test("graft on the LEFT: inner and semi prune by the right-side probe bounds") {
    (200L to 260L).map(k => (k, s"g$k")).toDF("k", "fv")
      .createOrReplaceTempView("egb_left_narrow")
    withEager {
      val inner = spark.sql(
        "SELECT d.k, d.dv, f.fv FROM egb.dim d JOIN egb_left_narrow f ON d.k = f.k")
      assert(zipCount(inner) == 1)
      assert(inner.inputFiles.length <= 3,
        s"graft-left inner must prune, read ${inner.inputFiles.length} of $nFilesAll")
      assert(sorted(inner) == (200L to 260L).map(k =>
        Seq(s"$k", s"d$k", s"g$k")).sortBy(_.mkString("|")))

      val semi = spark.sql(
        "SELECT d.k, d.dv FROM egb.dim d LEFT SEMI JOIN egb_left_narrow f ON d.k = f.k")
      assert(semi.inputFiles.length <= 3,
        s"graft-left semi must prune, read ${semi.inputFiles.length} of $nFilesAll")
      assert(semi.count() == 61)
    }
  }

  test("graft-preserving types never prune (unmatched snapshot rows survive)") {
    val nAll = nFilesAll
    Seq((5L, "a"), (7L, "b")).toDF("k", "fv").createOrReplaceTempView("egb_two")
    withEager {
      // FULL JOIN: every unmatched dim row must survive null-extended
      val full = spark.sql(
        "SELECT f.k, f.fv, d.k AS dk, d.dv FROM egb_two f FULL JOIN egb.dim d ON f.k = d.k")
      assert(full.inputFiles.length == nAll,
        "FULL JOIN must not prune the snapshot by probe bounds")
      assert(full.count() == 3000) // 2 matched + 2998 dim-only
      // RIGHT JOIN with graft on the right: dim rows preserved
      val right = spark.sql(
        "SELECT f.fv, d.k, d.dv FROM egb_two f RIGHT JOIN egb.dim d ON f.k = d.k")
      assert(right.inputFiles.length == nAll)
      assert(right.count() == 3000)
      // LEFT ANTI with graft on the LEFT preserves unmatched graft rows
      val ganti = spark.sql(
        "SELECT d.k FROM egb.dim d LEFT ANTI JOIN egb_two f ON d.k = f.k")
      assert(ganti.inputFiles.length == nAll)
      assert(ganti.count() == 2998)
    }
  }

  test("nondeterministic probe side declines the eager pass but still zips") {
    val nAll = nFilesAll
    withEager {
      // NB: `rand() >= 0` won't do — the optimizer folds comparisons that
      // are provable from rand's [0,1) range, leaving a deterministic
      // probe. shuffle(array(1,2))[0] > 0 is nondeterministic AND
      // unfoldable AND always true, so the decline is observable on a
      // deterministic row set.
      val q = spark.sql(
        """SELECT f.k, d.dv FROM
             (SELECT k, fv FROM (SELECT id AS k, 'x' AS fv FROM range(100, 120))
              WHERE shuffle(array(1, 2))[0] > 0) f
           JOIN egb.dim d ON f.k = d.k""")
      assert(zipCount(q) == 1, s"must still zip:\n${q.queryExecution.executedPlan}")
      assert(q.inputFiles.length == nAll,
        "a nondeterministic probe side must not run the bounds job")
      assert(q.count() == 20)
    }
  }

  test("rerun-unstable probe plans (LIMIT) decline the eager pass") {
    val nAll = nFilesAll
    withEager {
      // an unordered LIMIT picks rows by partition arrival order — two
      // executions can return DIFFERENT key sets, so stale bounds could
      // prune files holding the routed pass's matches; must decline
      val q = spark.sql(
        """SELECT f.k, d.dv FROM
             (SELECT id AS k FROM range(100, 1000) LIMIT 50) f
           JOIN egb.dim d ON f.k = d.k""")
      assert(zipCount(q) == 1, s"must still zip:\n${q.queryExecution.executedPlan}")
      assert(q.inputFiles.length == nAll,
        "a LIMIT probe side must not run the bounds job")
      assert(q.count() == 50)
    }
  }

  test("≥256 probes add the bloom prefilter to the leg scans") {
    // 300 sparse probes across the key space: bounds prune little, the
    // bloom sketch drops non-matching snapshot rows inside the leg scans
    (1L to 3000L by 10L).map(k => (k, s"f$k")).toDF("k", "fv")
      .createOrReplaceTempView("egb_sparse")
    val sql = "SELECT f.k, f.fv, d.dv FROM egb_sparse f JOIN egb.dim d ON f.k = d.k"
    withEager {
      val q = spark.sql(sql)
      assert(zipCount(q) == 1)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"300 probes must bloom-prefilter the legs:\n$plan")
      assert(sorted(q) == (1L to 3000L by 10L).map(k =>
        Seq(s"$k", s"f$k", s"d$k")).sortBy(_.mkString("|")))
    }
  }

  test("AUTO mode (default): a LocalRelation probe prunes with no conf set") {
    // r18: the default is `auto` — fire the eager pass only when the
    // probe's re-execution cost is provably trivial (every leaf a
    // LocalRelation / loaded cache). A narrow in-memory probe set gets
    // the file prune WITHOUT any session conf.
    val nAll = nFilesAll
    (200L to 230L).map(k => (k, s"a$k")).toDF("k", "fv")
      .createOrReplaceTempView("egb_auto")
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(spark.conf.getOption("spark.graft.probe.sqlEagerBounds").isEmpty ||
        spark.conf.get("spark.graft.probe.sqlEagerBounds") == "auto")
      val q = spark.sql(
        "SELECT f.k, f.fv, d.dv FROM egb_auto f JOIN egb.dim d ON f.k = d.k")
      assert(zipCount(q) == 1, s"must zip:\n${q.queryExecution.executedPlan}")
      val pruned = q.inputFiles.length
      assert(pruned <= 3,
        s"auto mode must prune a LocalRelation probe ($pruned of $nAll files)")
      assert(sorted(q) == (200L to 230L).map(k =>
        Seq(s"$k", s"a$k", s"d$k")).sortBy(_.mkString("|")))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
  }

  test("AUTO mode: a file-scan probe DECLINES the silent job (r16 stance)") {
    // the probe side re-executes under the eager pass; for a plan whose
    // cost the optimizer cannot bound exactly (a parquet scan), auto must
    // NOT run the job — explicit `true` remains the opt-in
    val dir = tmpDir("graft-eager-auto")
    val probePath = s"$dir/probes.parquet"
    (400L to 420L).map(k => (k, s"p$k")).toDF("k", "fv")
      .write.parquet(probePath)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.read.parquet(probePath).createOrReplaceTempView("egb_fileprobe")
      val sql = "SELECT f.k, f.fv, d.dv FROM egb_fileprobe f JOIN egb.dim d ON f.k = d.k"
      val q = spark.sql(sql)
      assert(zipCount(q) == 1, "still zips (routing needs no eager pass)")
      val snapFiles = q.inputFiles.count(!_.contains("probes.parquet"))
      assert(snapFiles > 3,
        s"auto must NOT prune from a file-scan probe (read $snapFiles snapshot files)")
      // ... but a loaded CACHE of the same probe qualifies
      val cached = spark.read.parquet(probePath).cache()
      cached.count() // materialize the buffers — exact stats, free rescan
      cached.createOrReplaceTempView("egb_cachedprobe")
      val q2 = spark.sql(
        "SELECT f.k, f.fv, d.dv FROM egb_cachedprobe f JOIN egb.dim d ON f.k = d.k")
      val pruned = q2.inputFiles.count(!_.contains("probes.parquet"))
      assert(pruned <= 3,
        s"a materialized cached probe must auto-prune ($pruned snapshot files)")
      assert(sorted(q2.select("k", "fv", "dv")) == (400L to 420L).map(k =>
        Seq(s"$k", s"p$k", s"d$k")).sortBy(_.mkString("|")))
      cached.unpersist()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
  }

  test("as-of idiom's probe construction prunes under the conf too") {
    val dir = tmpDir("graft-eager-asof")
    val st = new FsSnapshotStore(s"$dir/store", spark)
    val readings = (1 to 2000).map(i => (i.toLong % 200, i.toLong, s"v$i"))
      .toDF("uid", "seq", "v").repartition(1)
    KVIndex.bootstrap(st, "rd", readings.orderBy("uid", "seq"),
      Seq("uid", "seq"), maxRowsPerFile = 64).toOption.get
    spark.conf.set("spark.sql.catalog.egba", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.egba.root", st.root)
    Seq((5L, 100L), (5L, 2000L), (7L, 50L)).toDF("uid", "pseq")
      .createOrReplaceTempView("egba_ev")
    val sql = """
      SELECT uid, pseq, aseq, v FROM (
        SELECT p.uid, p.pseq, r.seq AS aseq, r.v,
               row_number() OVER (PARTITION BY p.uid ORDER BY r.seq DESC) AS rn
        FROM (SELECT uid, max(pseq) AS pseq FROM egba_ev GROUP BY uid) p
        LEFT JOIN egba.rd r ON p.uid = r.uid AND r.seq <= p.pseq
      ) WHERE rn = 1"""
    // baseline: the conf-OFF idiom rewrite reads every file (explicitly
    // off — the default `auto` would already prune this LocalRelation-
    // rooted probe side, which the last assertion below pins)
    spark.conf.set("spark.graft.probe.sqlEagerBounds", "false")
    val (nAll, want) = try {
      val base = spark.sql(sql)
      val basePlan = base.queryExecution.executedPlan.toString
      assert(basePlan.contains("AsOfZipJoin") && !basePlan.contains("Window"),
        s"idiom must plan the merge without the conf too:\n$basePlan")
      val n = base.inputFiles.length
      assert(n > 10, s"fixture should split into many files, got $n")
      (n, sorted(base))
    } finally spark.conf.unset("spark.graft.probe.sqlEagerBounds")
    withEager {
      val q = spark.sql(sql)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfZipJoin") && !plan.contains("Window"),
        s"idiom must still plan the merge:\n$plan")
      assert(q.inputFiles.length < nAll,
        s"probe uids {5,7} must prune files: read ${q.inputFiles.length} of $nAll")
      assert(sorted(q) == want, "eager as-of content must match the unpruned run")
    }
    // AUTO (default, conf unset): the GROUP BY probe side roots in a
    // LocalRelation, so the idiom prunes with no conf at all
    val qa = spark.sql(sql)
    assert(qa.inputFiles.length < nAll,
      s"auto mode must prune the LocalRelation-rooted as-of probe: " +
        s"read ${qa.inputFiles.length} of $nAll")
    assert(sorted(qa) == want, "auto as-of content must match")
  }
}
