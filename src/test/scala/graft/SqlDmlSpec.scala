package graft

import org.apache.spark.sql.DataFrame

import graft.core._

/** SQL `UPDATE` / `MERGE INTO` compiled to atomic command batches
  * ([[graft.sources.GraftDmlStrategy]]) — semantics, key moves, engine
  * column protection, the MERGE cardinality rule, and snapshot/versioning
  * behavior (each statement = exactly one COW version).
  */
class SqlDmlSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(cat: String): (FsSnapshotStore, String) = {
    val store = new FsSnapshotStore(tmpDir(s"graft-dml-$cat"), spark)
    val rows = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "price")
    KVIndex.bootstrap(store, "t", rows, Seq("k"))
      .fold(e => sys.error(e.message), identity)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", store.root)
    (store, s"$cat.t")
  }

  private def content(tbl: String): Seq[(Long, String, Double)] =
    spark.sql(s"SELECT k, name, price FROM $tbl ORDER BY k")
      .as[(Long, String, Double)].collect().toSeq

  test("UPDATE: filtered assignment batch, one new version, untouched rows keep their tx version") {
    val (store, tbl) = freshTable("gdml1")
    val v0 = store.loadLatestLazy("t").fold(e => sys.error(e.message), identity).version
    spark.sql(s"UPDATE $tbl SET price = price * 2, name = concat(name, '!') WHERE k >= 3")
    assert(content(tbl) == Seq((1L, "a", 10.0), (2L, "b", 20.0),
      (3L, "c!", 60.0), (4L, "d!", 80.0)))
    val m = store.loadLatestLazy("t").fold(e => sys.error(e.message), identity)
    assert(m.version == v0 + 1, "one UPDATE = exactly one new snapshot version")
    // engine-stamped tx version differs between touched and untouched rows
    val versions = spark.sql(s"SELECT k, version FROM $tbl").as[(Long, String)]
      .collect().toMap
    assert(versions(3L) == versions(4L) && versions(1L) != versions(3L))
  }

  test("UPDATE with no matching rows commits nothing") {
    val (store, tbl) = freshTable("gdml2")
    val v0 = store.loadLatestLazy("t").fold(e => sys.error(e.message), identity).version
    spark.sql(s"UPDATE $tbl SET price = 0.0 WHERE k > 1000")
    assert(store.loadLatestLazy("t").fold(e => sys.error(e.message), identity).version == v0)
  }

  test("UPDATE that moves a key compiles to Remove+Insert in one atomic batch") {
    val (_, tbl) = freshTable("gdml3")
    spark.sql(s"UPDATE $tbl SET k = k + 100 WHERE k <= 2")
    assert(content(tbl).map(_._1) == Seq(3L, 4L, 101L, 102L))
    // a key move COLLIDING with an existing key is the library's typed
    // duplicate-key error and commits nothing
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $tbl SET k = 3 WHERE k = 101")
    }
    assert(e.getMessage.contains("LEAF_DUPLICATE_KEY"), e.getMessage)
    assert(content(tbl).map(_._1) == Seq(3L, 4L, 101L, 102L), "failed batch must not commit")
  }

  test("UPDATE cannot assign the engine-maintained version column; VERSION AS OF is read-only") {
    val (_, tbl) = freshTable("gdml4")
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $tbl SET version = 'boo' WHERE k = 1")
    }
    assert(e.getMessage.contains("engine-maintained"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"UPDATE $tbl VERSION AS OF 1 SET price = 0.0")
    }
    // Spark itself rejects time-travel DML at parse/analysis; either its
    // error or ours is fine — the write must not happen
    assert(content(tbl) == Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("MERGE: matched update + conditional delete + not-matched insert, one version") {
    val (store, tbl) = freshTable("gdml5")
    val v0 = store.loadLatestLazy("t").fold(e => sys.error(e.message), identity).version
    Seq((2L, "B2", 222.0), (3L, "DEL", 0.0), (9L, "i", 90.0), (10L, "j", 91.0))
      .toDF("k", "name", "price").createOrReplaceTempView("dml_src")
    spark.sql(
      s"""MERGE INTO $tbl t USING dml_src s ON t.k = s.k
         |WHEN MATCHED AND s.name = 'DEL' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET name = s.name, price = s.price
         |WHEN NOT MATCHED THEN INSERT (k, name, price) VALUES (s.k, s.name, s.price)
         |""".stripMargin)
    assert(content(tbl) == Seq((1L, "a", 10.0), (2L, "B2", 222.0),
      (4L, "d", 40.0), (9L, "i", 90.0), (10L, "j", 91.0)))
    assert(store.loadLatestLazy("t").fold(e => sys.error(e.message), identity).version == v0 + 1,
      "a MERGE with update+delete+insert is ONE atomic snapshot version")
  }

  test("MERGE with an arbitrary source takes the probe-routed zip join (snapshot never shuffles)") {
    val store = new FsSnapshotStore(tmpDir("graft-dml-pm"), spark)
    val rows = (1L to 3000L).map(k => (k, s"n$k", k * 1.5))
      .toDF("k", "name", "price").repartition(1)
    KVIndex.bootstrap(store, "t", rows, Seq("k"), maxRowsPerFile = 256)
      .fold(e => sys.error(e.message), identity)
    spark.conf.set("spark.sql.catalog.gdmlpm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdmlpm.root", store.root)
    // source: a plain local frame — matches, an unmatched insert, a delete
    Seq((5L, "UP5", 500.0), (2999L, "DEL", 0.0), (9999L, "NEW", 9.0))
      .toDF("k", "name", "price").createOrReplaceTempView("dml_pm_src")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql(
        s"""MERGE INTO gdmlpm.t t USING dml_pm_src s ON t.k = s.k
           |WHEN MATCHED AND s.name = 'DEL' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET name = s.name, price = s.price
           |WHEN NOT MATCHED THEN INSERT (k, name, price) VALUES (s.k, s.name, s.price)
           |""".stripMargin)
      assert(graft.sources.GraftDml.lastMergeJoinPath == "probe",
        s"expected the probe merge join, took '${graft.sources.GraftDml.lastMergeJoinPath}'")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val got = spark.sql("SELECT k, name, price FROM gdmlpm.t ORDER BY k")
      .as[(Long, String, Double)].collect().toSeq
    val want = ((1L to 3000L).filterNot(_ == 2999L).map {
      case 5L => (5L, "UP5", 500.0)
      case k => (k, s"n$k", k * 1.5)
    } :+ (9999L, "NEW", 9.0)).sortBy(_._1)
    assert(got == want, "probe merge content mismatch")
    // small snapshot (default threshold): stock/broadcast path keeps MERGE
    val (_, tbl2) = freshTable("gdmlpm2")
    Seq((2L, "x", 1.0)).toDF("k", "name", "price")
      .createOrReplaceTempView("dml_pm_src2")
    spark.sql(s"MERGE INTO $tbl2 t USING dml_pm_src2 s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET name = s.name")
    assert(graft.sources.GraftDml.lastMergeJoinPath == "stock",
      "a broadcastable snapshot must keep the stock merge join")
  }

  test("MERGE: NOT MATCHED BY SOURCE update/delete, first-matching-clause-wins") {
    val (_, tbl) = freshTable("gdml6")
    Seq((1L, "x", 1.0)).toDF("k", "name", "price").createOrReplaceTempView("dml_src2")
    spark.sql(
      s"""MERGE INTO $tbl t USING dml_src2 s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET price = s.price
         |WHEN NOT MATCHED BY SOURCE AND t.k >= 4 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE AND t.k >= 3 THEN UPDATE SET name = 'kept'
         |""".stripMargin)
    // k=4 deleted by the FIRST matching clause (not updated by the second);
    // k=3 updated by the second; k=2 untouched (no clause matches)
    assert(content(tbl) == Seq((1L, "a", 1.0), (2L, "b", 20.0), (3L, "kept", 30.0)))
  }

  test("MERGE rejects a source that matches one target row twice (cardinality)") {
    val (store, tbl) = freshTable("gdml7")
    val v0 = store.loadLatestLazy("t").fold(e => sys.error(e.message), identity).version
    Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "name", "price")
      .createOrReplaceTempView("dml_src3")
    val e = intercept[Exception] {
      spark.sql(s"MERGE INTO $tbl t USING dml_src3 s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET price = s.price")
    }
    assert(e.getMessage.contains("MERGE_CARDINALITY_VIOLATION"), e.getMessage)
    assert(store.loadLatestLazy("t").fold(e => sys.error(e.message), identity).version == v0)
  }

  test("MERGE insert-only with unassigned nullable column defaults to NULL") {
    val (_, tbl) = freshTable("gdml8")
    Seq((7L, 70.0)).toDF("k", "price").createOrReplaceTempView("dml_src4")
    spark.sql(s"MERGE INTO $tbl t USING dml_src4 s ON t.k = s.k " +
      "WHEN NOT MATCHED THEN INSERT (k, price) VALUES (s.k, s.price)")
    val r = spark.sql(s"SELECT name, price FROM $tbl WHERE k = 7")
      .as[(Option[String], Double)].head()
    assert(r == (None, 70.0))
  }

  test("UPDATE condition may carry a subquery (re-analyzed against the fresh snapshot)") {
    val (_, tbl) = freshTable("gdml10")
    Seq(2L, 3L).toDF("kk").createOrReplaceTempView("dml_keys")
    spark.sql(s"UPDATE $tbl SET price = 0.0 WHERE k IN (SELECT kk FROM dml_keys)")
    assert(content(tbl).map(_._3) == Seq(10.0, 0.0, 0.0, 40.0))
  }

  test("DML serializes behind a concurrent writer (commit-CAS retry)") {
    val (store, tbl) = freshTable("gdml9")
    // stale handle: another writer commits AFTER the UPDATE's target
    // manifest was resolved — the retry loop re-opens LATEST and re-derives
    val ix = KVIndex.open(store, "t").fold(e => sys.error(e.message), identity)
    ix.execute(Seq(Command.Insert(Seq((50L, "z", 0.5)).toDF("k", "name", "price")))).orThrow
    spark.sql(s"UPDATE $tbl SET price = -1.0 WHERE k = 50")
    assert(content(tbl).find(_._1 == 50L).map(_._3).contains(-1.0))
  }

  test("MERGE with a graft snapshot source compiles to the co-range zip join (zero-exchange upsert)") {
    import org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val store = new FsSnapshotStore(tmpDir("graft-dml-zip"), spark)
    val tgt = (1 to 2000).map(i => (i.toLong, s"n$i", i * 1.0))
      .toDF("k", "name", "price").repartition(1)
    KVIndex.bootstrap(store, "t", tgt, Seq("k"), maxRowsPerFile = 256)
      .fold(e => sys.error(e.message), identity)
    val src = (1500 to 2500).map(i => (i.toLong, i * 0.5)).toDF("k", "p2")
      .repartition(1)
    KVIndex.bootstrap(store, "s", src, Seq("k"), maxRowsPerFile = 256)
      .fold(e => sys.error(e.message), identity)
    spark.conf.set("spark.sql.catalog.gdmlzip", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdmlzip.root", store.root)
    val mergeSql =
      """MERGE INTO gdmlzip.t t USING gdmlzip.s s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET price = s.p2
        |WHEN NOT MATCHED THEN INSERT (k, name, price) VALUES (s.k, 'new', s.p2)
        |WHEN NOT MATCHED BY SOURCE AND t.k < 10 THEN DELETE
        |""".stripMargin

    // plan pin: the MERGE's target×source full outer compiles to the zip
    // join with ZERO exchanges in its stage (r14 verdict item #2)
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val analyzed = ss.sessionState.executePlan(
      ss.sessionState.sqlParser.parsePlan(mergeSql)).analyzed
    val mit = analyzed.collectFirst { case mm: MergeIntoTable => mm }.get
    val out = mit.targetTable.collectFirst {
      case r: DataSourceV2Relation => r.output }.get
    val ix = KVIndex.open(store, "t").fold(e => sys.error(e.message), identity)
    val joined = graft.sources.GraftDml.coRangeMergeJoin(spark, ix, out, mit)
    assert(joined.isDefined, "graft-source MERGE must take the co-range join")
    val plan = joined.get.queryExecution.executedPlan
    assert(plan.collectFirst {
      case z: graft.plans.ZipPartitionsJoinExec => z }.isDefined,
      s"expected the zip join in the MERGE's join stage:\n$plan")
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"graft-source MERGE join must plan zero exchanges:\n$plan")
    // both markers ride the join: matched / source-only / target-only
    import org.apache.spark.sql.functions.col
    val kinds = joined.get.groupBy(
      col("__graft_t").isNotNull, col("__graft_s").isNotNull).count()
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(kinds((true, true)) == 501L && kinds((true, false)) == 1499L &&
      kinds((false, true)) == 500L, s"unexpected row classes: $kinds")

    // end to end through the real statement: one version, exact contents
    spark.sql(mergeSql)
    val got = spark.sql("SELECT k, name, price FROM gdmlzip.t ORDER BY k")
      .as[(Long, String, Double)].collect()
    assert(got.length == 1991 + 500)
    assert(got.head == ((10L, "n10", 10.0))) // 1..9 deleted by-source
    assert(got.find(_._1 == 1500L).contains((1500L, "n1500", 750.0)))
    assert(got.find(_._1 == 2500L).contains((2500L, "new", 1250.0)))
    assert(got.count(_._2 == "new") == 500)
  }
}
