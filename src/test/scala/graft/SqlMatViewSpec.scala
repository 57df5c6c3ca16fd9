package graft

import org.apache.spark.sql.functions._

import graft.core._

/** `CREATE MATERIALIZED VIEW` / `REFRESH MATERIALIZED VIEW` SQL surface
  * ([[graft.sources.GraftMatView]] + [[graft.sources.GraftSqlParser]]):
  * the incremental-view economics (refresh ∝ COW diff) reachable from SQL
  * text. Contract: after any source mutations, REFRESH makes the view
  * hash-identical to a from-scratch recompute — and the statements are
  * spec-restricted with typed errors, never a silently non-incremental
  * view.
  */
class SqlMatViewSpec extends SparkSuite {
  import spark.implicits._

  private def freshCat(tag: String): (String, FsSnapshotStore) = {
    val st = new FsSnapshotStore(tmpDir(s"graft-sqlmv-$tag") + "/store", spark)
    val cat = s"mv$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", st.root)
    (cat, st)
  }

  test("aggregate view: create from SQL, mutate source, REFRESH == recompute") {
    val (cat, st) = freshCat("agg")
    val src0 = (1L to 2000L).map(i => (i, i % 37, i % 101)).toDF("k", "g", "v")
    val v1 = KVIndex.bootstrap(st, "src", src0, Seq("k"))
      .fold(e => sys.error(e.message), identity)

    spark.sql(s"""CREATE MATERIALIZED VIEW $cat.mv AS
      SELECT g, sum(v) AS sum_v, count(*) AS agg_cnt,
             min(v) AS min_v, max(v) AS max_v
      FROM $cat.src GROUP BY g""")
    val view1 = KVIndex.open(st, "mv").fold(e => sys.error(e.message), identity)
    assert(view1.count == 37L)

    // mutate: upsert some, remove a band, insert new keys (new groups too)
    val res = v1.execute(Seq(
      Command.Insert((1L to 80L).map(i => (i, i % 37, 500L + i)).toDF("k", "g", "v"),
        upsert = true),
      Command.Remove((300L to 500L).map(Tuple1(_)).toDF("k")),
      Command.Insert((5001L to 5050L).map(i => (i, 37L + i % 3, i)).toDF("k", "g", "v"))))
    assert(res.success, s"mutation failed: ${res.error}")

    spark.sql(s"REFRESH MATERIALIZED VIEW $cat.mv")
    val got = spark.sql(s"SELECT g, sum_v, agg_cnt, min_v, max_v FROM $cat.mv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    val want = spark.sql(
      s"""SELECT g, sum(v) AS s, count(*) AS c, min(v) AS mn, max(v) AS mx
          FROM $cat.src GROUP BY g""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got == want, "refresh must equal the from-scratch recompute")

    // idempotent: a second refresh with no source movement is a no-op
    val vBefore = KVIndex.open(st, "mv").toOption.get.manifest.version
    spark.sql(s"REFRESH MATERIALIZED VIEW $cat.mv")
    assert(KVIndex.open(st, "mv").toOption.get.manifest.version == vBefore,
      "refresh without source movement must not commit a new version")
  }

  test("single-sum legacy naming is enforced with guidance") {
    val (cat, st) = freshCat("leg")
    KVIndex.bootstrap(st, "src",
      (1L to 100L).map(i => (i, i % 5, i)).toDF("k", "g", "v"), Seq("k"))
      .fold(e => sys.error(e.message), identity)
    val e = intercept[Exception] {
      spark.sql(s"""CREATE MATERIALIZED VIEW $cat.bad AS
        SELECT g, sum(v) AS sum_v, count(*) AS agg_cnt FROM $cat.src GROUP BY g""")
    }
    assert(e.getMessage.contains("agg_sum"), s"guide to the legacy name: ${e.getMessage}")
    // with the right alias it works and reads back
    spark.sql(s"""CREATE MATERIALIZED VIEW $cat.mv AS
      SELECT g, sum(v) AS agg_sum, count(*) AS agg_cnt FROM $cat.src GROUP BY g""")
    val got = spark.sql(s"SELECT g, agg_sum, agg_cnt FROM $cat.mv ORDER BY g")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = (1L to 100L).groupBy(_ % 5).map { case (g, ks) =>
      (g, ks.sum, ks.size.toLong) }.toSeq.sortBy(_._1)
    assert(got == want)
  }

  test("join view: create from SQL USING shape, mutate both sides, REFRESH == recompute") {
    val (cat, st) = freshCat("join")
    val a0 = (1L to 1000L).map(i => (i, i * 3)).toDF("k", "av")
    val b0 = (1L to 900L).map(i => (i, s"b$i")).toDF("k", "bv")
    val a1 = KVIndex.bootstrap(st, "a", a0, Seq("k")).fold(e => sys.error(e.message), identity)
    val b1 = KVIndex.bootstrap(st, "b", b0, Seq("k")).fold(e => sys.error(e.message), identity)

    spark.sql(s"CREATE MATERIALIZED VIEW $cat.jv AS " +
      s"SELECT * FROM $cat.a JOIN $cat.b USING (k)")
    assert(KVIndex.open(st, "jv").toOption.get.count == 900L)

    a1.execute(Seq(
      Command.Update((1L to 50L).map(i => (i, i * 7)).toDF("k", "av")),
      Command.Remove((100L to 150L).map(Tuple1(_)).toDF("k")))).orThrow
    b1.execute(Seq(
      Command.Insert((901L to 950L).map(i => (i, s"n$i")).toDF("k", "bv")))).orThrow

    spark.sql(s"REFRESH MATERIALIZED VIEW $cat.jv")
    val got = spark.sql(s"SELECT k, av, bv FROM $cat.jv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    val want = spark.sql(
      s"SELECT a.k, a.av, b.bv FROM $cat.a a JOIN $cat.b b ON a.k = b.k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    assert(got == want, "join refresh must equal the from-scratch join")
  }

  test("typed declines: bad shapes never create a silently-broken view") {
    val (cat, st) = freshCat("err")
    KVIndex.bootstrap(st, "src",
      (1L to 100L).map(i => (i, i % 5, i, i / 2.0)).toDF("k", "g", "v", "f"),
      Seq("k")).fold(e => sys.error(e.message), identity)

    def bad(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}\nfor: $sql")
      assert(!st.exists("bad"), s"failed create must not leave an index: $sql")
    }
    // missing count(*)
    bad(s"CREATE MATERIALIZED VIEW $cat.bad AS SELECT g, sum(v) AS sum_v " +
      s"FROM $cat.src GROUP BY g", "agg_cnt")
    // unsupported aggregate
    bad(s"CREATE MATERIALIZED VIEW $cat.bad AS SELECT g, avg(v) AS a, " +
      s"count(*) AS agg_cnt FROM $cat.src GROUP BY g", "unsupported aggregate")
    // min without max
    bad(s"CREATE MATERIALIZED VIEW $cat.bad AS SELECT g, sum(v) AS sum_v, " +
      s"count(*) AS agg_cnt, min(v) AS min_v FROM $cat.src GROUP BY g", "PAIRS")
    // float sum breaks incremental==recompute (core rejects; surfaced)
    val eF = intercept[Exception] {
      spark.sql(s"CREATE MATERIALIZED VIEW $cat.bad AS SELECT g, " +
        s"sum(f) AS sum_f, count(*) AS agg_cnt FROM $cat.src GROUP BY g")
    }
    assert(!st.exists("bad"))
    // filtered source would silently maintain the wrong corpus
    bad(s"CREATE MATERIALIZED VIEW $cat.bad AS SELECT g, sum(v) AS sum_v, " +
      s"count(*) AS agg_cnt FROM (SELECT * FROM $cat.src WHERE v > 5) " +
      s"GROUP BY g", "single graft catalog table")
    // refresh of a non-view index
    val eR = intercept[Exception](spark.sql(s"REFRESH MATERIALIZED VIEW $cat.src"))
    assert(eR.getMessage.contains("not a materialized view"), eR.getMessage)
    // non-graft catalog
    val eC = intercept[Exception](spark.sql(
      "CREATE MATERIALIZED VIEW nocat.bad AS SELECT 1 AS x"))
    assert(eC.getMessage.contains("not a configured catalog"), eC.getMessage)
    // stock statements still parse through the delegate untouched
    assert(spark.sql("SELECT 1 AS one").collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("DROP TABLE removes a view; re-create sees the fresh source") {
    val (cat, st) = freshCat("drop")
    KVIndex.bootstrap(st, "src",
      (1L to 50L).map(i => (i, i % 3, i)).toDF("k", "g", "v"), Seq("k"))
      .fold(e => sys.error(e.message), identity)
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mv AS SELECT g, sum(v) AS agg_sum, " +
      s"count(*) AS agg_cnt FROM $cat.src GROUP BY g")
    spark.sql(s"DROP TABLE $cat.mv")
    assert(!st.exists("mv"))
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mv AS SELECT g, sum(v) AS agg_sum, " +
      s"count(*) AS agg_cnt FROM $cat.src GROUP BY g")
    assert(KVIndex.open(st, "mv").toOption.get.count == 3L)
  }

  test("DROP MATERIALIZED VIEW: drops views, refuses tables, IF EXISTS tolerates") {
    val (cat, st) = freshCat("dmv")
    KVIndex.bootstrap(st, "src",
      (1L to 50L).map(i => (i, i % 3, i)).toDF("k", "g", "v"), Seq("k"))
      .fold(e => sys.error(e.message), identity)
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mv AS SELECT g, sum(v) AS agg_sum, " +
      s"count(*) AS agg_cnt FROM $cat.src GROUP BY g")
    spark.sql(s"DROP MATERIALIZED VIEW $cat.mv")
    assert(!st.exists("mv"))
    // a plain index is NOT a materialized view — typed refusal
    val e = intercept[Exception](spark.sql(s"DROP MATERIALIZED VIEW $cat.src"))
    assert(e.getMessage.contains("use DROP TABLE"), e.getMessage)
    assert(st.exists("src"), "the refusal must not drop the table")
    // absent: plain fails, IF EXISTS no-ops
    val e2 = intercept[Exception](spark.sql(s"DROP MATERIALIZED VIEW $cat.mv"))
    assert(e2.getMessage.contains("does not exist"), e2.getMessage)
    spark.sql(s"DROP MATERIALIZED VIEW IF EXISTS $cat.mv") // no throw
  }

  test("filtered view (r19): WHERE recorded in the spec, refresh == recompute") {
    val (cat, st) = freshCat("whr")
    val src0 = (1L to 2000L).map(i => (i, i % 37, i % 101)).toDF("k", "g", "v")
    val v1 = KVIndex.bootstrap(st, "src", src0, Seq("k"))
      .fold(e => sys.error(e.message), identity)

    spark.sql(s"""CREATE MATERIALIZED VIEW $cat.mv AS
      SELECT g, sum(v) AS sum_v, count(*) AS agg_cnt,
             min(v) AS min_v, max(v) AS max_v
      FROM $cat.src WHERE v >= 20 AND g < 30 GROUP BY g""")

    // mutate across the predicate boundary in every direction: rows
    // entering the filtered set (v bumped over 20), leaving it (zeroed),
    // removed outright, fresh inserts on both sides of the predicate
    val res = v1.execute(Seq(
      Command.Insert((1L to 80L).map(i => (i, i % 37, 500L + i)).toDF("k", "g", "v"),
        upsert = true),
      Command.Insert((81L to 160L).map(i => (i, i % 37, 0L)).toDF("k", "g", "v"),
        upsert = true),
      Command.Remove((300L to 500L).map(Tuple1(_)).toDF("k")),
      Command.Insert((5001L to 5050L).map(i => (i, i % 31, i % 19)).toDF("k", "g", "v"))))
    assert(res.success, s"mutation failed: ${res.error}")

    spark.sql(s"REFRESH MATERIALIZED VIEW $cat.mv")
    val got = spark.sql(s"SELECT g, sum_v, agg_cnt, min_v, max_v FROM $cat.mv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    val want = spark.sql(
      s"""SELECT g, sum(v) AS s, count(*) AS c, min(v) AS mn, max(v) AS mx
          FROM $cat.src WHERE v >= 20 AND g < 30 GROUP BY g""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got == want, "filtered refresh must equal the filtered recompute")

    // the pure-± (no min/max) path under a WHERE too
    spark.sql(s"""CREATE MATERIALIZED VIEW $cat.mv2 AS
      SELECT g, sum(v) AS agg_sum, count(*) AS agg_cnt
      FROM $cat.src WHERE v % 2 = 0 GROUP BY g""")
    val v2 = KVIndex.open(st, "src").toOption.get
    v2.execute(Seq(
      Command.Insert((1L to 40L).map(i => (i, i % 37, i)).toDF("k", "g", "v"),
        upsert = true))).orThrow
    spark.sql(s"REFRESH MATERIALIZED VIEW $cat.mv2")
    val got2 = spark.sql(s"SELECT g, agg_sum, agg_cnt FROM $cat.mv2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val want2 = spark.sql(s"SELECT g, sum(v) AS s, count(*) AS c " +
      s"FROM $cat.src WHERE v % 2 = 0 GROUP BY g")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got2 == want2)
  }

  test("MV time travel (r20): lifecycle commits are dual-stamped, TIMESTAMP AS OF re-opens pre-refresh state") {
    val (cat, st) = freshCat("asof")
    val src0 = (1L to 300L).map(i => (i, i % 7, i)).toDF("k", "g", "v")
    val v1 = KVIndex.bootstrap(st, "src", src0, Seq("k"))
      .fold(e => sys.error(e.message), identity)
    spark.sql(s"""CREATE MATERIALIZED VIEW $cat.mv AS
      SELECT g, sum(v) AS agg_sum, count(*) AS agg_cnt
      FROM $cat.src GROUP BY g""")
    val h1 = spark.sql(s"SHOW HISTORY $cat.mv").collect()
    assert(h1.length == 1 && !h1.head.isNullAt(2),
      s"create must record one dual-stamped line: ${h1.mkString}")
    val w1 = h1.head.getLong(2)
    while (System.currentTimeMillis() <= w1) Thread.sleep(1)
    // mutate + refresh: the pre-refresh aggregate must stay reachable
    v1.execute(Seq(Command.Remove((1L to 100L).map(Tuple1(_)).toDF("k"))),
      "tx-mvasof").orThrow
    spark.sql(s"REFRESH MATERIALIZED VIEW $cat.mv")
    val h2 = spark.sql(s"SHOW HISTORY $cat.mv").collect()
    assert(h2.length == 2 && h2.last.getLong(2) > w1, h2.mkString(","))
    val w2 = h2.last.getLong(2)
    def totals(ms: Long): (Long, Long) = {
      val r = spark.sql(s"SELECT CAST(sum(agg_sum) AS BIGINT), " +
        s"CAST(sum(agg_cnt) AS BIGINT) FROM $cat.mv " +
        s"FOR TIMESTAMP AS OF timestamp_millis($ms)").head
      (r.getLong(0), r.getLong(1))
    }
    assert(totals(w1) == ((1L to 300L).sum, 300L), "pre-refresh state at the create stamp")
    assert(totals(w2) == ((101L to 300L).sum, 200L), "post-refresh state at the refresh stamp")
    // VERSION AS OF works on the same lineage
    val vNow = KVIndex.open(st, "mv").toOption.get.manifest.version
    val pre = spark.sql(s"SELECT CAST(sum(agg_cnt) AS BIGINT) FROM $cat.mv " +
      s"VERSION AS OF ${vNow - 1}").head.getLong(0)
    assert(pre == 300L)
    // the JOIN view records history too
    KVIndex.bootstrap(st, "jb", (1L to 50L).map(i => (i, i * 2)).toDF("k", "w"), Seq("k"))
      .fold(e => sys.error(e.message), identity)
    spark.sql(s"""CREATE MATERIALIZED VIEW $cat.jv AS
      SELECT * FROM $cat.src JOIN $cat.jb USING (k)""")
    val hj = spark.sql(s"SHOW HISTORY $cat.jv").collect()
    assert(hj.length == 1 && !hj.head.isNullAt(2),
      s"join-view create must dual-stamp: ${hj.mkString}")
  }

  test("filtered view declines: drifting predicates never create") {
    val (cat, st) = freshCat("whrerr")
    KVIndex.bootstrap(st, "src",
      (1L to 100L).map(i => (i, i % 5, i)).toDF("k", "g", "v"), Seq("k"))
      .fold(e => sys.error(e.message), identity)
    def bad(where: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(
        s"CREATE MATERIALIZED VIEW $cat.bad AS SELECT g, sum(v) AS agg_sum, " +
          s"count(*) AS agg_cnt FROM $cat.src WHERE $where GROUP BY g"))
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}\nfor WHERE $where")
      assert(!st.exists("bad"), s"failed create must not leave an index: $where")
    }
    bad("rand() > 0.5", "nondeterministic")
    bad("v > (SELECT min(v) FROM VALUES (1) AS t(v))", "subquery")
    bad("k > unix_millis(current_timestamp()) - 1000", "time-dependent")
    bad("version = 'x'", "non-source column")
    // r20 (ADVICE): session-config-sensitive constructs — the predicate
    // is persisted as SQL text and re-parsed at refresh, so TIMESTAMP
    // literals (render in the create-time session timezone, re-parse in
    // the refresh-time one), timezone-dependent casts, and lossy casts
    // (ANSI-mode-dependent) must never ride a view spec
    bad("CAST(k AS TIMESTAMP) < TIMESTAMP '2020-01-01 00:00:00'",
      "session-config-sensitive")
    bad("CAST(v AS INT) > 5", "session-config-sensitive")
  }
}
