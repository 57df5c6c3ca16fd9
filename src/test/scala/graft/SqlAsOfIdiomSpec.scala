package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.core._
import graft.plans.AsOfZipJoinExec

/** The AS-OF SQL idiom: `JOIN ... ON k AND rts <= ts` + `row_number()
  * OVER (PARTITION BY left key ORDER BY rts DESC) = 1` over two graft
  * snapshots plans [[graft.plans.AsOfZipJoinExec]] — zero exchanges, NO
  * window — instead of the shuffle + window the text spells. Content
  * parity against a driver-side reference is the correctness contract;
  * the no-window/no-exchange plan and the strict decline rules are the
  * scale contract.
  */
class SqlAsOfIdiomSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def store(dir: String) = new FsSnapshotStore(s"$dir/store", spark)

  private def ref(left: Seq[(Long, Long, String)], right: Seq[(Long, Long, Long)],
                  strict: Boolean, outer: Boolean)
      : Seq[(Long, Long, String, Option[Long], Option[Long])] =
    left.sorted.flatMap { case (k, ts, lv) =>
      val cands = right.filter { case (rk, rts, _) =>
        rk == k && (if (strict) rts < ts else rts <= ts) }
      if (cands.nonEmpty) {
        val m = cands.maxBy(c => (c._2, c._3))
        Some((k, ts, lv, Some(m._2), Some(m._3)))
      } else if (outer) Some((k, ts, lv, None, None))
      else None
    }

  private def collected(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Long, String, Option[Long], Option[Long])] =
    df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))).sorted

  private def asofCount(df: org.apache.spark.sql.DataFrame): Int =
    collect(df.queryExecution.executedPlan) { case z: AsOfZipJoinExec => z }.size

  private def windowCount(df: org.apache.spark.sql.DataFrame): Int =
    collect(df.queryExecution.executedPlan) { case w: WindowExec => w }.size

  private def exchangeCount(df: org.apache.spark.sql.DataFrame): Int =
    collect(df.queryExecution.executedPlan) { case e: ShuffleExchangeExec => e }.size

  // shared fixture: probes keyed (k, ts), readings keyed (k, rts) —
  // key ranges overlap partially so left_outer has unmatched probes
  private lazy val (leftRows, rightRows, cat) = {
    val st = store(tmpDir("graft-asofsql"))
    val left = (1L to 50L).flatMap(k => Seq(3L, 17L, 40L).map(ts =>
      (k, ts, s"l$k-$ts")))
    val right = (1L to 60L by 2L).flatMap(k => (0L to 40L by 10L).map(ts =>
      (k, ts, k * 1000 + ts)))
    KVIndex.bootstrap(st, "pr", left.toDF("k", "ts", "lv").repartition(1),
      Seq("k", "ts"), maxRowsPerFile = 16).toOption.get
    KVIndex.bootstrap(st, "rd", right.toDF("k", "rts", "rv").repartition(1),
      Seq("k", "rts"), maxRowsPerFile = 16).toOption.get
    spark.conf.set("spark.sql.catalog.asofsql", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.asofsql.root", st.root)
    (left, right, "asofsql")
  }

  private def idiom(join: String, bound: String): String =
    s"""SELECT k, ts, lv, asof_ts, rv FROM (
        SELECT p.k, p.ts, p.lv, r.rts AS asof_ts, r.rv,
               row_number() OVER (PARTITION BY p.k, p.ts ORDER BY r.rts DESC) AS rn
        FROM $cat.pr p $join $cat.rd r
          ON p.k = r.k AND r.rts $bound p.ts
      ) WHERE rn = 1"""

  test("the idiom plans the as-of merge: no window, zero exchanges, content parity") {
    for ((join, outer) <- Seq(("JOIN", false), ("LEFT JOIN", true));
         (bound, strict) <- Seq(("<=", false), ("<", true))) {
      val q = spark.sql(idiom(join, bound))
      assert(asofCount(q) == 1,
        s"$join/$bound must plan AsOfZipJoin:\n${q.queryExecution.executedPlan}")
      assert(windowCount(q) == 0, s"$join/$bound must drop the window")
      assert(exchangeCount(q) == 0, s"$join/$bound must plan zero exchanges")
      assert(collected(q) == ref(leftRows, rightRows, strict, outer),
        s"$join/$bound content mismatch")
    }
  }

  test("rn <= 1 and extra WHERE conjuncts rewrite too; rn survives as literal 1") {
    val q = spark.sql(
      s"""SELECT k, ts, rn, rv FROM (
          SELECT p.k, p.ts, r.rv,
                 row_number() OVER (PARTITION BY p.k, p.ts ORDER BY r.rts DESC) AS rn
          FROM $cat.pr p JOIN $cat.rd r ON p.k = r.k AND r.rts <= p.ts
        ) WHERE rn <= 1 AND rv % 2 = 0""")
    assert(asofCount(q) == 1, s"rn <= 1 must rewrite:\n${q.queryExecution.executedPlan}")
    assert(windowCount(q) == 0)
    val want = ref(leftRows, rightRows, strict = false, outer = false)
      .filter(_._5.exists(_ % 2 == 0))
      .map(r => (r._1, r._2, 1, r._5.get)).sorted
    val got = q.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).sorted
    assert(got == want, "content mismatch with extra conjunct")
  }

  test("a single-side ON predicate becomes a pushed filter and still rewrites") {
    // `AND r.rv > 5000` leaves the ON via stock predicate pushdown and
    // lands as a right-side Filter, which replays BELOW the merge —
    // candidates are filtered before the pick, exactly the stock pick
    val q = spark.sql(
      s"""SELECT k, ts, rv FROM (
          SELECT p.k, p.ts, r.rv,
                 row_number() OVER (PARTITION BY p.k, p.ts ORDER BY r.rts DESC) AS rn
          FROM $cat.pr p JOIN $cat.rd r
            ON p.k = r.k AND r.rts <= p.ts AND r.rv > 5000
        ) WHERE rn = 1""")
    assert(asofCount(q) == 1, s"pushed right filter must still rewrite:\n${q.queryExecution.executedPlan}")
    val want = leftRows.sorted.flatMap { case (k, ts, _) =>
      val cands = rightRows.filter(c => c._1 == k && c._2 <= ts && c._3 > 5000)
      if (cands.nonEmpty) Some((k, ts, cands.maxBy(c => (c._2, c._3))._3)) else None
    }.sorted
    val got = q.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got == want, "pushed-filter content mismatch")
  }

  test("a GROUP BY probe side (provably unique) routes onto the snapshot's legs") {
    // the classic "latest reading per user at their last event" shape:
    // the probe side is an Aggregate exposing its full grouping set —
    // unique per group, so the window pick IS the as-of pick; the probe
    // side routes (one RDD shuffle), the snapshot never moves
    leftRows.toDF("k", "ts", "lv").createOrReplaceTempView("asof_agg_src")
    for ((join, outer) <- Seq(("JOIN", false), ("LEFT JOIN", true))) {
      val q = spark.sql(
        s"""SELECT k, pts, asof_ts, rv FROM (
            SELECT p.k, p.pts, r.rts AS asof_ts, r.rv,
                   row_number() OVER (PARTITION BY p.k ORDER BY r.rts DESC) AS rn
            FROM (SELECT k, max(ts) AS pts FROM asof_agg_src GROUP BY k) p
            $join $cat.rd r ON p.k = r.k AND r.rts <= p.pts
          ) WHERE rn = 1""")
      assert(asofCount(q) == 1,
        s"aggregate probe side must route ($join):\n${q.queryExecution.executedPlan}")
      assert(windowCount(q) == 0, s"no window expected ($join)")
      assert(exchangeCount(q) <= 1, // the GROUP BY's own exchange only
        s"at most the aggregate's exchange expected ($join)")
      val probes = leftRows.groupBy(_._1).map { case (k, rs) => (k, rs.map(_._2).max) }
      val want = probes.toSeq.sorted.flatMap { case (k, pts) =>
        val cands = rightRows.filter(c => c._1 == k && c._2 <= pts)
        if (cands.nonEmpty) { val mx = cands.maxBy(c => (c._2, c._3)); Some((k, pts, Some(mx._2), Some(mx._3))) }
        else if (outer) Some((k, pts, None, None)) else None
      }
      val got = q.collect().toSeq.map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).sorted
      assert(got == want, s"aggregate-probe content mismatch ($join)")
    }
  }

  test("a SELECT DISTINCT probe side proves uniqueness on its full output") {
    // DISTINCT lowers to Aggregate(all cols) — unique on the exposed
    // tuple, so PARTITION BY the full DISTINCT set routes like the
    // GROUP BY shape (r18, kv_sql_asof_distinct's contract)
    leftRows.toDF("k", "ts", "lv").createOrReplaceTempView("asof_dist_src")
    val q = spark.sql(
      s"""SELECT k, pts, asof_ts, rv FROM (
          SELECT p.k, p.pts, r.rts AS asof_ts, r.rv,
                 row_number() OVER (PARTITION BY p.k, p.pts ORDER BY r.rts DESC) AS rn
          FROM (SELECT DISTINCT k, ts AS pts FROM asof_dist_src) p
          LEFT JOIN $cat.rd r ON p.k = r.k AND r.rts <= p.pts
        ) WHERE rn = 1""")
    assert(asofCount(q) == 1,
      s"DISTINCT probe side must route:\n${q.queryExecution.executedPlan}")
    assert(windowCount(q) == 0, "no window expected for the DISTINCT probe")
    val probes = leftRows.map(l => (l._1, l._2)).distinct
    val want = probes.sorted.map { case (k, pts) =>
      val cands = rightRows.filter(c => c._1 == k && c._2 <= pts)
      if (cands.nonEmpty) { val mx = cands.maxBy(c => (c._2, c._3)); (k, pts, Some(mx._2), Some(mx._3)) }
      else (k, pts, None, None)
    }
    val got = q.collect().toSeq.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))).sorted
    assert(got == want, "DISTINCT-probe content mismatch")

    // decline twin: PARTITION BY only part of the DISTINCT tuple — rows
    // within a k are NOT unique, the window pick is not the as-of pick,
    // so the idiom must keep the stock join+window
    val qBad = spark.sql(
      s"""SELECT k, pts, asof_ts, rv FROM (
          SELECT p.k, p.pts, r.rts AS asof_ts, r.rv,
                 row_number() OVER (PARTITION BY p.k ORDER BY r.rts DESC) AS rn
          FROM (SELECT DISTINCT k, ts AS pts FROM asof_dist_src) p
          LEFT JOIN $cat.rd r ON p.k = r.k AND r.rts <= p.pts
        ) WHERE rn = 1""")
    assert(asofCount(qBad) == 0,
      "a partial partition key over a DISTINCT pair must DECLINE")
    assert(windowCount(qBad) == 1, "the stock window must survive the decline")
  }

  test("a tolerance band (rts >= ts - K) maps to the merge's native-unit tolerance") {
    for ((join, outer) <- Seq(("JOIN", false), ("LEFT JOIN", true))) {
      val q = spark.sql(
        s"""SELECT k, ts, lv, asof_ts, rv FROM (
            SELECT p.k, p.ts, p.lv, r.rts AS asof_ts, r.rv,
                   row_number() OVER (PARTITION BY p.k, p.ts ORDER BY r.rts DESC) AS rn
            FROM $cat.pr p $join $cat.rd r
              ON p.k = r.k AND r.rts <= p.ts AND r.rts >= p.ts - 10
          ) WHERE rn = 1""")
      assert(asofCount(q) == 1,
        s"tolerance idiom must rewrite ($join):\n${q.queryExecution.executedPlan}")
      assert(windowCount(q) == 0 && exchangeCount(q) == 0, join)
      val want = leftRows.sorted.flatMap { case (k, ts, lv) =>
        val cands = rightRows.filter(c => c._1 == k && c._2 <= ts && ts - c._2 <= 10)
        if (cands.nonEmpty) {
          val m = cands.maxBy(c => (c._2, c._3))
          Some((k, ts, lv, Some(m._2), Some(m._3)))
        } else if (outer) Some((k, ts, lv, None, None)) else None
      }
      assert(collected(q) == want, s"tolerance content mismatch ($join)")
    }
  }

  test("DATE tolerance bands: date_sub/date_add spell raw-day tolerances") {
    // DATE's native unit is the raw day count — no time-of-day, no zone —
    // so date_sub(p.d, K) is the exact band the merge's tolerance compares
    val st = store(tmpDir("graft-asofdate"))
    def d(day: Int): java.sql.Date = java.sql.Date.valueOf(f"2024-03-${day}%02d")
    val left = (1L to 20L).flatMap(k => Seq(5, 15, 25).map(dd => (k, d(dd), s"l$k-$dd")))
    val right = (1L to 24L by 2L).flatMap(k => Seq(1, 8, 14, 22).map(dd =>
      (k, d(dd), k * 100 + dd)))
    KVIndex.bootstrap(st, "prd", left.toDF("k", "d", "lv").repartition(1),
      Seq("k", "d"), maxRowsPerFile = 16).toOption.get
    KVIndex.bootstrap(st, "rdd", right.toDF("k", "rd", "rv").repartition(1),
      Seq("k", "rd"), maxRowsPerFile = 16).toOption.get
    spark.conf.set("spark.sql.catalog.asofdate", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.asofdate.root", st.root)

    def want(tolDays: Int, outer: Boolean) = left.sortBy(r => (r._1, r._2.toString))
      .flatMap { case (k, pd, lv) =>
        val cands = right.filter { case (rk, rd, _) =>
          rk == k && !rd.after(pd) &&
            (pd.toLocalDate.toEpochDay - rd.toLocalDate.toEpochDay) <= tolDays }
        if (cands.nonEmpty) {
          val m = cands.maxBy(c => (c._2.toString, c._3))
          Some((k, pd.toString, lv, Some(m._2.toString), Some(m._3)))
        } else if (outer) Some((k, pd.toString, lv, None, None)) else None
      }
    def got(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq.map(r =>
      (r.getLong(0), String.valueOf(r.getDate(1)), r.getString(2),
        if (r.isNullAt(3)) None else Some(String.valueOf(r.getDate(3))),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .sortBy(t => (t._1, t._2))

    for ((band, join, outer) <- Seq(
        ("r.rd >= date_sub(p.d, 10)", "JOIN", false),
        ("r.rd >= date_sub(p.d, 10)", "LEFT JOIN", true),
        ("date_add(p.d, -10) <= r.rd", "LEFT JOIN", true),
        // a whole-day ANSI interval on DATE is day arithmetic too: Spark
        // resolves it to DateAdd(d, -extract_days), never touching a zone
        ("r.rd >= p.d - INTERVAL '10' DAY", "LEFT JOIN", true))) {
      val q = spark.sql(
        s"""SELECT k, d, lv, asof_d, rv FROM (
            SELECT p.k, p.d, p.lv, r.rd AS asof_d, r.rv,
                   row_number() OVER (PARTITION BY p.k, p.d ORDER BY r.rd DESC) AS rn
            FROM asofdate.prd p $join asofdate.rdd r
              ON p.k = r.k AND r.rd <= p.d AND $band
          ) WHERE rn = 1""")
      assert(asofCount(q) == 1,
        s"DATE band '$band' must rewrite ($join):\n${q.queryExecution.executedPlan}")
      assert(windowCount(q) == 0 && exchangeCount(q) == 0, band)
      assert(got(q) == want(10, outer), s"DATE tolerance content mismatch ($band, $join)")
    }

    // a SUB-DAY interval component on DATE casts the arithmetic through
    // TIMESTAMP (session-tz-dependent) — the band is no longer a plain
    // DATE attribute shape and the idiom declines to the stock window plan
    val tzDep = spark.sql(
      s"""SELECT * FROM (
          SELECT p.k, p.d, r.rv,
                 row_number() OVER (PARTITION BY p.k, p.d ORDER BY r.rd DESC) AS rn
          FROM asofdate.prd p JOIN asofdate.rdd r
            ON p.k = r.k AND r.rd <= p.d
               AND r.rd >= p.d - INTERVAL '10 01' DAY TO HOUR
        ) WHERE rn = 1""")
    assert(asofCount(tzDep) == 0, "sub-day interval DATE band must decline")
  }

  test("declines: extra plain bound, partial partition key, ASC order, non-graft side") {
    // a SECOND plain ts-like bound (not a tolerance shape) stays in the
    // ON — stock plan (window survives)
    val extra = spark.sql(
      s"""SELECT * FROM (
          SELECT p.k, p.ts, r.rv,
                 row_number() OVER (PARTITION BY p.k, p.ts ORDER BY r.rts DESC) AS rn
          FROM $cat.pr p JOIN $cat.rd r
            ON p.k = r.k AND r.rts <= p.ts AND r.rv <= p.ts
        ) WHERE rn = 1""")
    assert(asofCount(extra) == 0, "a second plain bound must decline")
    assert(windowCount(extra) == 1)

    // PARTITION BY only k (left key is (k, ts)): per-key pick, NOT an
    // as-of join — must decline
    val partial = spark.sql(
      s"""SELECT * FROM (
          SELECT p.k, p.ts, r.rv,
                 row_number() OVER (PARTITION BY p.k ORDER BY r.rts DESC) AS rn
          FROM $cat.pr p JOIN $cat.rd r ON p.k = r.k AND r.rts <= p.ts
        ) WHERE rn = 1""")
    assert(asofCount(partial) == 0, "partial partition key must decline")

    // ASC order = EARLIEST match, not the as-of floor — must decline
    val asc = spark.sql(
      s"""SELECT * FROM (
          SELECT p.k, p.ts, r.rv,
                 row_number() OVER (PARTITION BY p.k, p.ts ORDER BY r.rts ASC) AS rn
          FROM $cat.pr p JOIN $cat.rd r ON p.k = r.k AND r.rts <= p.ts
        ) WHERE rn = 1""")
    assert(asofCount(asc) == 0, "ASC order must decline")

    // non-graft probe side: declines (stock window plan)
    leftRows.toDF("k", "ts", "lv").createOrReplaceTempView("asof_plain")
    val plainSide = spark.sql(
      s"""SELECT * FROM (
          SELECT p.k, p.ts, r.rv,
                 row_number() OVER (PARTITION BY p.k, p.ts ORDER BY r.rts DESC) AS rn
          FROM asof_plain p JOIN $cat.rd r ON p.k = r.k AND r.rts <= p.ts
        ) WHERE rn = 1""")
    assert(asofCount(plainSide) == 0, "non-graft side must decline (for now)")
    // correctness of the declined plans is Spark's own guarantee; spot-check one
    assert(partial.count() > 0)
  }
}
