package graft

import org.apache.spark.sql.functions._

import graft.core._

/** Incrementally-maintained materialized JOIN view: exactness against a
  * full recompute through upserts / removals / new matches on BOTH
  * sources, version bookkeeping, no-op idempotence, and the
  * changed-key-envelope read bound.
  */
class MaterializedJoinSpec extends SparkSuite {
  import spark.implicits._

  private def store(dir: String) = new FsSnapshotStore(s"$dir/store", spark)

  private def recompute(a: KVIndex, b: KVIndex): Seq[(Long, Long, String)] =
    a.df.select(col("k"), col("av"))
      .join(b.df.select(col("k"), col("bv")), Seq("k"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq

  test("create = full join; refresh applies both sides' diffs exactly; no-op is a no-op") {
    val st = store(tmpDir("graft-mjoin"))
    val aDf = (1 to 2000).map(i => (i.toLong, i * 2L)).toDF("k", "av").repartition(1)
    val bDf = (1 to 2000).filter(_ % 3 != 0).map(i => (i.toLong, s"b$i"))
      .toDF("k", "bv").repartition(1)
    val a1 = KVIndex.bootstrap(st, "mj_a", aDf, Seq("k"),
      maxRowsPerFile = 256).toOption.get
    val b1 = KVIndex.bootstrap(st, "mj_b", bDf, Seq("k"),
      maxRowsPerFile = 256).toOption.get

    val v1 = MaterializedJoin.create(st, "mj_v", a1, b1)
      .fold(e => fail(e.message), identity)
    assert(v1.df.select("k", "av", "bv").as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq == recompute(a1, b1))

    // mutate A: value changes + removals + a brand-new matching key
    val a2 = new KVIndex(st, a1.execute(Seq(
      Command.Insert((500 to 520).map(i => (i.toLong, -i.toLong)).toDF("k", "av"),
        upsert = true),
      Command.Insert(Seq((2002L, 42L)).toDF("k", "av")), // no match in B yet
      Command.Remove((100 to 110).map(_.toLong).toDF("k"))), "tx-mj-a2").orThrow,
      256)
    // mutate B: value changes + removals + a new key matching A's new one
    val b2 = new KVIndex(st, b1.execute(Seq(
      Command.Insert((700 to 720).filter(_ % 3 != 0)
        .map(i => (i.toLong, s"B$i")).toDF("k", "bv"), upsert = true),
      Command.Insert(Seq((2002L, "fresh")).toDF("k", "bv")),
      Command.Remove((200 to 205).filter(_ % 3 != 0).map(_.toLong).toDF("k"))),
      "tx-mj-b2").orThrow, 256)

    val v2 = MaterializedJoin.refresh(st, "mj_v", a2, b2)
      .fold(e => fail(e.message), identity)
    assert(v2.manifest.version == v1.manifest.version + 1,
      "one refresh = exactly one view version")
    val got = v2.df.select("k", "av", "bv").as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == recompute(a2, b2))
    // spot the row classes: changed-A (500), changed-B (700), removed-A
    // key (100), removed-B key (200), new match (2002)
    assert(got.find(_._1 == 500L).contains((500L, -500L, "b500")))
    assert(got.find(_._1 == 700L).contains((700L, 1400L, "B700")))
    assert(!got.exists(_._1 == 100L) && !got.exists(_._1 == 200L))
    assert(got.find(_._1 == 2002L).contains((2002L, 42L, "fresh")))

    // refresh against the same versions: no commit, same manifest
    val v3 = MaterializedJoin.refresh(st, "mj_v", a2, b2)
      .fold(e => fail(e.message), identity)
    assert(v3.manifest.version == v2.manifest.version)

    // the view rejects foreign sources
    val e = intercept[IllegalArgumentException] {
      MaterializedJoin.refresh(st, "mj_v", b2, a2).fold(x => fail(x.message), identity)
    }
    assert(e.getMessage.contains("tracks"))
  }

  test("refresh reads only the changed-key envelope, not the corpora") {
    val st = store(tmpDir("graft-mjoin2"))
    val aDf = (1 to 10000).map(i => (i.toLong, i * 2L)).toDF("k", "av").repartition(1)
    val bDf = (1 to 10000).map(i => (i.toLong, s"b$i")).toDF("k", "bv").repartition(1)
    val a1 = KVIndex.bootstrap(st, "mj2_a", aDf, Seq("k"),
      maxRowsPerFile = 500).toOption.get // 20 files
    val b1 = KVIndex.bootstrap(st, "mj2_b", bDf, Seq("k"),
      maxRowsPerFile = 500).toOption.get
    MaterializedJoin.create(st, "mj2_v", a1, b1, maxRowsPerFile = 500)
      .fold(e => fail(e.message), identity)

    // touch a NARROW key window on A only
    val a2 = new KVIndex(st, a1.execute(Seq(
      Command.Insert((4000 to 4050).map(i => (i.toLong, -1L)).toDF("k", "av"),
        upsert = true)), "tx-mj2").orThrow, 500)

    // measure input bytes via task metrics (NB: Spark also counts cached-
    // block reads as input, so the fair reference is the FULL RECOMPUTE —
    // a create over the same sources — under the same accounting, not a
    // bare scan pass)
    val readBytes = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        readBytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    }
    // listenerBus is private[spark]; polling a quiesced counter is enough
    def waitListeners(): Unit = {
      var last = -1L
      while (last != readBytes.get()) { last = readBytes.get(); Thread.sleep(200) }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      MaterializedJoin.create(st, "mj2_vfull", a2, b1, maxRowsPerFile = 500)
        .fold(e => fail(e.message), identity)
      waitListeners()
      val recomputeBytes = readBytes.getAndSet(0L)
      assert(recomputeBytes > 0)

      val v2 = MaterializedJoin.refresh(st, "mj2_v", a2, b1)
        .fold(e => fail(e.message), identity)
      waitListeners()
      val refreshBytes = readBytes.get()
      assert(refreshBytes > 0)
      assert(refreshBytes < recomputeBytes / 2,
        s"refresh read $refreshBytes bytes vs $recomputeBytes for the full " +
          "recompute — not bounded by the changed envelope")

      assert(v2.df.filter(col("k") === 4000L).select("av").as[Long].head() == -1L)
      assert(v2.df.count() == 10000L)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
