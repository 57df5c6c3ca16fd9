package graft

import graft.core._

/** Time-travel port of `TemporalIndexSpec.scala:206-233`: after every
  * committed batch record a snapshot; then for EVERY recorded (t, model)
  * pair re-open the index at t and assert full equality with the model
  * state at that moment. Plus floor-lookup clamping semantics.
  */
class TemporalSpec extends SparkSuite {
  import spark.implicits._

  test("snapshot log replay: findIndexAt(t) equals the model at t") {
    val store = new FsSnapshotStore(tmpDir("graft-temporal"), spark)
    var model = (1 to 50).map(i => (f"k$i%03d", "v0")).toMap
    var ix = KVIndex.bootstrap(store, "tt", model.toSeq.toDF("k", "v"), Seq("k"),
      maxRowsPerFile = 16).toOption.get
    var clock = 1000L
    store.recordSnapshot("tt", ix.manifest.version, clock)
    var history = Vector((clock, model))

    val rnd = new scala.util.Random(11)
    (1 to 8).foreach { round =>
      val op = rnd.nextInt(3)
      val res = op match {
        case 0 =>
          val k = f"new$round%03d"
          model += (k -> s"r$round")
          ix.execute(Seq(Command.Insert(Seq((k, s"r$round")).toDF("k", "v"))))
        case 1 =>
          val k = model.keys.toSeq.sorted.apply(rnd.nextInt(model.size))
          model += (k -> s"u$round")
          ix.execute(Seq(Command.Update(Seq((k, s"u$round")).toDF("k", "v"))))
        case 2 =>
          val k = model.keys.toSeq.sorted.apply(rnd.nextInt(model.size))
          model -= k
          ix.execute(Seq(Command.Remove(Seq(k).toDF("k"))))
      }
      assert(res.success)
      clock += 1000L
      store.recordSnapshot("tt", res.snapshot.get.version, clock)
      history :+= ((clock, model))
      ix = KVIndex.open(store, "tt").toOption.get
    }

    // replay every recorded instant — and instants between snapshots (floor)
    history.foreach { case (t, m) =>
      Seq(t, t + 500L).foreach { probe =>
        val snap = KVIndex.openAt(store, "tt", probe).toOption.get
        val got = snap.df.select("k", "v").as[(String, String)].collect().toMap
        assert(got == m, s"replay at t=$probe")
      }
    }
    // before the first snapshot clamps to the earliest (reference binSearch clamp)
    val first = KVIndex.openAt(store, "tt", 1L).toOption.get
    assert(first.df.count() == history.head._2.size)

    // ---- vacuum: keep last 2 versions, old snapshots become unreachable,
    //      latest still reads the full model ----
    val (droppedManifests, deletedFiles) = store.vacuum("tt", retainVersions = 2, graceMs = 0L)
    assert(droppedManifests > 0)
    assert(deletedFiles > 0, "old COW files should be swept")
    val latest = KVIndex.open(store, "tt").toOption.get
    val got = latest.df.select("k", "v").as[(String, String)].collect().toMap
    assert(got == history.last._2)
    // history log pruned to kept versions → earliest probe now clamps to a kept one
    val clamped = KVIndex.openAt(store, "tt", 1L).toOption.get
    assert(clamped.manifest.version >= latest.manifest.version - 1)
  }

  test("wall-clock time travel: TIMESTAMP AS OF floors on the dual stamp") {
    val root = tmpDir("graft-temporal-wall")
    val store = new FsSnapshotStore(root, spark)
    val ix = KVIndex.bootstrap(store, "wt", (1 to 20).map(i => (i.toLong, i * 10L))
      .toDF("k", "v"), Seq("k")).toOption.get
    store.recordSnapshot("wt", ix.manifest.version, ts = 1000L, wallMs = 60000L)
    val m2 = ix.execute(Seq(Command.Insert(Seq((1L, 999L)).toDF("k", "v"),
      upsert = true)), "tx-w2").orThrow
    store.recordSnapshot("wt", m2.version, ts = 2000L, wallMs = 120000L)

    // floor between the stamps → v1; at/after the second → v2; before the
    // first clamps to the earliest (the findAt T3 semantics, wall-clock twin)
    assert(store.findAtWallClock("wt", 90000L) == Some(ix.manifest.version))
    assert(store.findAtWallClock("wt", 120000L) == Some(m2.version))
    assert(store.findAtWallClock("wt", 1L) == Some(ix.manifest.version))
    assert(store.findIndexAtWall("wt", 90000L).map(_.version) == Some(ix.manifest.version))
    // memoized twin revalidates on history change (new record is seen)
    val m3 = new KVIndex(store, m2).execute(Seq(Command.Insert(
      Seq((2L, 888L)).toDF("k", "v"), upsert = true)), "tx-w3").orThrow
    store.recordSnapshot("wt", m3.version, ts = 3000L, wallMs = 180000L)
    assert(store.findIndexAtWall("wt", 500000L).map(_.version) == Some(m3.version))
    // historyLogWall carries all three dual stamps
    assert(store.historyLogWall("wt").map(_._3) == Seq(Some(60000L), Some(120000L), Some(180000L)))

    // SQL surface: TIMESTAMP AS OF through the catalog (micros → ms floor)
    spark.conf.set("spark.sql.catalog.graft_wt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_wt.root", root)
    try {
      val v1Row = spark.sql(
        "SELECT v FROM graft_wt.wt TIMESTAMP AS OF '1970-01-01 00:01:30' WHERE k = 1")
      assert(v1Row.collect().map(_.getLong(0)).toSeq == Seq(10L))
      val v3Row = spark.sql(
        "SELECT v FROM graft_wt.wt TIMESTAMP AS OF '1970-01-01 01:00:00' WHERE k = 1")
      assert(v3Row.collect().map(_.getLong(0)).toSeq == Seq(999L))
      // no recorded history → typed refusal
      KVIndex.bootstrap(store, "nohist", Seq((1L, 1L)).toDF("k", "v"), Seq("k"))
      val e = intercept[Exception](spark.sql(
        "SELECT * FROM graft_wt.nohist TIMESTAMP AS OF '1970-01-01 00:01:00'").collect())
      assert(e.getMessage.contains("no recorded history"), e.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.graft_wt")
      spark.conf.unset("spark.sql.catalog.graft_wt.root")
    }

    // a pre-upgrade (undated) entry poisons the wall-clock timeline: typed
    // refusal, while the monotonic findAt keeps working
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "wt", "history.jsonl"),
      "{\"ts\":4000,\"version\":99}\n".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    val refusal = intercept[UnsupportedOperationException](
      store.findAtWallClock("wt", 90000L))
    assert(refusal.getMessage.contains("without one"), refusal.getMessage)
    assert(store.findAt("wt", 1500L) == Some(ix.manifest.version))

    // vacuum's history rewrite preserves the wall stamps (and the absence
    // of one) verbatim
    val store2 = new FsSnapshotStore(tmpDir("graft-temporal-wall2"), spark)
    val j1 = KVIndex.bootstrap(store2, "wv", Seq((1L, 1L)).toDF("k", "v"), Seq("k")).toOption.get
    store2.recordSnapshot("wv", j1.manifest.version, ts = 1000L, wallMs = 7000L)
    val j2 = j1.execute(Seq(Command.Insert(Seq((2L, 2L)).toDF("k", "v"))), "tx-wv2").orThrow
    store2.recordSnapshot("wv", j2.version, ts = 2000L, wallMs = 9000L)
    store2.vacuum("wv", retainVersions = 1, graceMs = 0L)
    assert(store2.historyLogWall("wv") == Seq((2000L, j2.version, Some(9000L))))
  }
}
