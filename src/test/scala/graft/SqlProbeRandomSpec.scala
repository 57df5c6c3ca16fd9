package graft

import org.apache.spark.sql.functions._

import graft.core._
import graft.plans.{AsOfZipJoinExec, ZipPartitionsJoinExec}

/** Randomized DIFFERENTIAL for the r17 SQL rewrites: random snapshot
  * layouts × probe sets × join types driven through PLAIN SQL TEXT, each
  * compared row-for-row against the stock plan on the same inputs (the
  * broadcast guard declines the rewrite under the default threshold, so
  * the stock twin is one conf flip away). The as-of idiom and the
  * count-range rewrite are compared against driver-side references.
  * Fixed-seed rerun convention as in `CoRangeJoinRandomSpec`.
  */
class SqlProbeRandomSpec extends SparkSuite
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def store(dir: String) = new FsSnapshotStore(s"$dir/store", spark)

  private def withThreshold[T](v: String)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def zipCount(df: org.apache.spark.sql.DataFrame): Int =
    collect(df.queryExecution.executedPlan) {
      case z: ZipPartitionsJoinExec => z
      case a: AsOfZipJoinExec => a
    }.size

  for (seed <- Seq(43, 101))
  test(s"random layouts × probe sets × join types through SQL text — seed $seed") {
    val rnd = new scala.util.Random(seed)
    val st = store(tmpDir(s"graft-sqlprand$seed"))

    for (round <- 1 to 5) {
      // composite layouts keep k LEADING (the join binds the leading
      // component; a tail-only equality correctly declines and is pinned
      // by SqlProbeJoinSpec) — composite rounds are then PREFIX joins
      // emitting whole (k, k2) groups per probe
      val composite = rnd.nextBoolean()
      val keys = if (composite) Seq("k", "k2") else Seq("k")
      val snapLo = rnd.nextInt(500); val snapHi = snapLo + 500 + rnd.nextInt(2000)
      val snapKeys = (snapLo to snapHi).filter(_ => rnd.nextDouble() < 0.8)
      val snap =
        if (composite) snapKeys.flatMap(i => (0 until 1 + i % 3).map(s =>
            (i.toLong, s, s"d$i-$s")))
          .toDF("k", "k2", "dv").repartition(1)
        else snapKeys.map(i => (i.toLong, s"d$i")).toDF("k", "dv").repartition(1)
      val id = s"spr_${seed}_$round"
      KVIndex.bootstrap(st, id, snap, keys,
        maxRowsPerFile = 16 << rnd.nextInt(5)).toOption.get
      spark.conf.set(s"spark.sql.catalog.sprc$seed", "graft.sources.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.sprc$seed.root", st.root)

      // probes: inside, outside, duplicated, occasionally null
      val pLo = rnd.nextInt(3500); val pHi = pLo + 100 + rnd.nextInt(1500)
      val probes = (pLo to pHi).filter(_ => rnd.nextDouble() < 0.5)
        .flatMap(i => Seq.fill(1 + rnd.nextInt(2))(i))
        .map(i => (if (rnd.nextDouble() < 0.02) None else Some(i.toLong), s"f$i"))
      probes.toDF("pk", "fv").createOrReplaceTempView(s"spr_facts$seed")

      // join on the LEADING key component only (a prefix join when the
      // snapshot is composite-keyed)
      val (jt, sel) = Seq(
        ("JOIN", "f.pk, f.fv, d.dv"),
        ("LEFT JOIN", "f.pk, f.fv, d.dv"),
        ("LEFT SEMI JOIN", "f.pk, f.fv"),
        ("LEFT ANTI JOIN", "f.pk, f.fv"),
        ("RIGHT JOIN", "f.pk, f.fv, d.dv"),
        ("FULL JOIN", "f.pk, f.fv, d.dv"))(rnd.nextInt(6))
      val sql = s"SELECT $sel FROM spr_facts$seed f $jt sprc$seed.$id d ON f.pk = d.k"

      // half the rounds run the conf-gated EAGER path too: probe-derived
      // file prune + typed answers + bloom — the differential then fuzzes
      // its soundness across join types, nulls, dups, out-of-range probes
      val eager = rnd.nextBoolean()
      val (got, zipped, stockJoins) = withThreshold("-1") {
        if (eager) spark.conf.set("spark.graft.probe.sqlEagerBounds", "true")
        try {
          val q = spark.sql(sql)
          val sj = collect(q.queryExecution.executedPlan) {
            case b: org.apache.spark.sql.execution.joins.BaseJoinExec => b
          }.size
          (q.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq,
            zipCount(q), sj)
        } finally spark.conf.unset("spark.graft.probe.sqlEagerBounds")
      }
      if (eager)
        // zipped == 0 is legitimate ONLY for the typed short-circuits
        // (empty / fully-out-of-range probe sets), which plan NO join at
        // all — a silent decline to a stock join must fail, or the
        // differential would compare stock against stock
        assert(zipped == 1 || (zipped == 0 && stockJoins == 0),
          s"round $round $jt: eager planned $zipped zips, $stockJoins stock joins")
      else assert(zipped == 1,
        s"round $round $jt: probe rewrite must fire under -1 threshold")
      val (want, stockZipped) = {
        val q = spark.sql(sql)
        (q.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq,
          zipCount(q))
      }
      assert(stockZipped == 0, s"round $round $jt: stock twin must not zip")
      assert(got == want, s"seed $seed round $round $jt: content mismatch " +
        s"(${got.length} vs ${want.length} rows)")
    }
  }

  for (seed <- Seq(57))
  test(s"random as-of idioms through SQL text vs a driver reference — seed $seed") {
    val rnd = new scala.util.Random(seed)
    val st = store(tmpDir(s"graft-asofrand$seed"))
    for (round <- 1 to 4) {
      val right = (1L to 40L).filter(_ => rnd.nextDouble() < 0.8).flatMap(k =>
        (0L to 50L by (3 + rnd.nextInt(9)).toLong).map(ts => (k, ts, k * 1000 + ts)))
      val left = (1L to 50L).filter(_ => rnd.nextDouble() < 0.7).flatMap(k =>
        Seq.fill(1 + rnd.nextInt(2))((k, rnd.nextInt(60).toLong, s"l$k")))
        .distinct
      val rid = s"ar_${seed}_$round"; val lid = s"al_${seed}_$round"
      KVIndex.bootstrap(st, rid, right.toDF("k", "rts", "rv").repartition(1),
        Seq("k", "rts"), maxRowsPerFile = 8 << rnd.nextInt(4)).toOption.get
      KVIndex.bootstrap(st, lid, left.toDF("k", "ts", "lv").repartition(1),
        Seq("k", "ts"), maxRowsPerFile = 8 << rnd.nextInt(4)).toOption.get
      spark.conf.set(s"spark.sql.catalog.arc$seed", "graft.sources.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.arc$seed.root", st.root)
      val strict = rnd.nextBoolean(); val outer = rnd.nextBoolean()
      val q = spark.sql(
        s"""SELECT k, ts, lv, asof_ts, rv FROM (
            SELECT p.k, p.ts, p.lv, r.rts AS asof_ts, r.rv,
                   row_number() OVER (PARTITION BY p.k, p.ts ORDER BY r.rts DESC) AS rn
            FROM arc$seed.$lid p ${if (outer) "LEFT JOIN" else "JOIN"} arc$seed.$rid r
              ON p.k = r.k AND r.rts ${if (strict) "<" else "<="} p.ts
          ) WHERE rn = 1""")
      assert(zipCount(q) == 1, s"round $round: idiom must plan the as-of merge")
      val want = left.sorted.flatMap { case (k, ts, lv) =>
        val cands = right.filter { case (rk, rts, _) =>
          rk == k && (if (strict) rts < ts else rts <= ts) }
        if (cands.nonEmpty) {
          val m = cands.maxBy(c => (c._2, c._3))
          Some((k, ts, lv, Some(m._2), Some(m._3)))
        } else if (outer) Some((k, ts, lv, None, None)) else None
      }
      val got = q.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).sorted
      assert(got == want, s"seed $seed round $round strict=$strict outer=$outer mismatch")
    }
  }

  test("random count-range bounds vs a driver reference") {
    val rnd = new scala.util.Random(71)
    val st = store(tmpDir("graft-cntrand"))
    val keys = (1L to 3000L).filter(_ % 7 != 0)
    KVIndex.bootstrap(st, "crr", keys.map(k => (k, k * 2)).toDF("k", "v")
      .repartition(1), Seq("k"), maxRowsPerFile = 128).toOption.get
    spark.conf.set("spark.sql.catalog.crrc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.crrc.root", st.root)
    for (_ <- 1 to 12) {
      val a = rnd.nextInt(3500).toLong; val b = a + rnd.nextInt(2000)
      val (loOp, loPred) = if (rnd.nextBoolean()) (">=", (k: Long) => k >= a)
        else (">", (k: Long) => k > a)
      val (hiOp, hiPred) = if (rnd.nextBoolean()) ("<=", (k: Long) => k <= b)
        else ("<", (k: Long) => k < b)
      graft.sources.GraftScan.lastPlannedFiles = -1
      val df = spark.sql(s"SELECT count(*) AS c, min(k) AS mn, max(k) AS mx " +
        s"FROM crrc.crr WHERE k $loOp $a AND k $hiOp $b")
      df.queryExecution.executedPlan
      val planned = graft.sources.GraftScan.lastPlannedFiles
      val want = keys.filter(k => loPred(k) && hiPred(k))
      val r = df.head()
      assert(r.getLong(0) == want.size, s"count WHERE k $loOp $a AND k $hiOp $b")
      if (want.nonEmpty)
        assert(r.getLong(1) == want.min && r.getLong(2) == want.max,
          s"min/max WHERE k $loOp $a AND k $hiOp $b")
      else assert(r.isNullAt(1) && r.isNullAt(2))
      assert(planned >= 0 && planned <= 2, s"planned $planned boundary files")
    }
  }

  test("random composite-prefix count ranges vs a driver reference") {
    val rnd = new scala.util.Random(83)
    val st = store(tmpDir("graft-cntprand"))
    // (g, k) keyed, ~70 rows per g over 64-row files: pinned-g ranges
    // regularly have interior files AND boundary cuts
    val rows = (1L to 3500L).filter(_ % 5 != 0).map(i => (i / 70, i))
    KVIndex.bootstrap(st, "cpr", rows.toDF("g", "k").repartition(1),
      Seq("g", "k"), maxRowsPerFile = 64).toOption.get
    spark.conf.set("spark.sql.catalog.cprc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cprc.root", st.root)
    for (_ <- 1 to 12) {
      val gPin = rnd.nextInt(55).toLong
      val a = rnd.nextInt(3800).toLong; val b = a + rnd.nextInt(300)
      val (loOp, loPred) = if (rnd.nextBoolean()) (">=", (k: Long) => k >= a)
        else (">", (k: Long) => k > a)
      val (hiOp, hiPred) = if (rnd.nextBoolean()) ("<=", (k: Long) => k <= b)
        else ("<", (k: Long) => k < b)
      // drop one side sometimes: eq-pinned prefix with a half-open tail
      val sides = rnd.nextInt(3)
      val where = sides match {
        case 0 => s"g = $gPin AND k $loOp $a AND k $hiOp $b"
        case 1 => s"g = $gPin AND k $loOp $a"
        case _ => s"g = $gPin AND k $hiOp $b"
      }
      val want = rows.filter { case (g, k) =>
        g == gPin && (sides == 2 || loPred(k)) && (sides == 1 || hiPred(k)) }
      graft.sources.GraftScan.lastPlannedFiles = -1
      val df = spark.sql(s"SELECT count(*) AS c, min(k) AS mn, max(k) AS mx, " +
        s"min(g) AS gm FROM cprc.cpr WHERE $where")
      df.queryExecution.executedPlan
      val planned = graft.sources.GraftScan.lastPlannedFiles
      val r = df.head()
      assert(r.getLong(0) == want.size, s"count WHERE $where")
      if (want.nonEmpty)
        assert(r.getLong(1) == want.map(_._2).min && r.getLong(2) == want.map(_._2).max &&
          r.getLong(3) == gPin, s"min/max WHERE $where")
      else assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
      assert(planned >= 0 && planned <= 2, s"WHERE $where planned $planned files")
    }
  }
}
