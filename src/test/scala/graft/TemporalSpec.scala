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
}
