package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Incremental materialized aggregate: refresh(diff) must equal a full
  * recompute bit-for-bit — pinned over randomized mutation sequences and
  * both storage backends — while reading only the source diff's unshared
  * files. Group migration, emptied groups, idempotence, float rejection.
  */
class MaterializedAggSpec extends SparkSuite {
  import spark.implicits._

  private def srcRows(n: Int): DataFrame =
    spark.range(0, n).select(col("id").as("k"),
      (col("id") % 7).as("grp"), (col("id") * 10 + 1).as("cents"))

  private def recompute(src: KVIndex): Seq[(Long, Long, Long)] =
    src.df.groupBy("grp")
      .agg(sum(coalesce(col("cents"), lit(0))).as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  private def viewRows(view: KVIndex): Seq[(Long, Long, Long)] =
    view.df.select("grp", "agg_sum", "agg_cnt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  private def stores: Seq[(String, SnapshotStore)] = Seq(
    "fs" -> new FsSnapshotStore(tmpDir("graft-magg"), spark),
    "mem" -> new MemorySnapshotStore(spark))

  test("refresh after upsert+insert+remove equals full recompute (both backends)") {
    for ((tag, store) <- stores) {
      val src0 = KVIndex.bootstrap(store, "s1", srcRows(200), Seq("k"))
        .fold(e => fail(e.message), identity)
      val view0 = MaterializedAgg.create(store, "v1", src0, Seq("grp"), "cents")
        .fold(e => fail(e.message), identity)
      assert(viewRows(view0) == recompute(src0), s"[$tag] create")
      // one batch: zero out low keys, remove a band, insert fresh keys
      val res = src0.execute(Seq(
        Command.Insert(srcRows(200).filter(col("k") < 20)
          .withColumn("cents", lit(0L)), upsert = true),
        Command.Remove(spark.range(50, 80).select(col("id").as("k"))),
        Command.Insert(spark.range(1000, 1040).select(col("id").as("k"),
          lit(3L).as("grp"), (col("id") * 2).as("cents")))))
      val src1 = new KVIndex(store, res.orThrow)
      val view1 = MaterializedAgg.refresh(store, "v1", src1)
        .fold(e => fail(e.message), identity)
      assert(viewRows(view1) == recompute(src1), s"[$tag] refresh")
    }
  }

  test("group migration: changing a row's group moves its mass exactly") {
    val store = new MemorySnapshotStore(spark)
    val src0 = KVIndex.bootstrap(store, "s2", srcRows(50), Seq("k"))
      .fold(e => fail(e.message), identity)
    MaterializedAgg.create(store, "v2", src0, Seq("grp"), "cents")
      .fold(e => fail(e.message), identity)
    // move keys 0..9 into group 99 (grp is a VALUE col of the source)
    val res = src0.execute(Seq(Command.Insert(
      srcRows(50).filter(col("k") < 10).withColumn("grp", lit(99L)),
      upsert = true)))
    val src1 = new KVIndex(store, res.orThrow)
    val view1 = MaterializedAgg.refresh(store, "v2", src1)
      .fold(e => fail(e.message), identity)
    assert(viewRows(view1) == recompute(src1))
    assert(viewRows(view1).exists(_._1 == 99L))
  }

  test("a group emptied by removals disappears from the view") {
    val store = new MemorySnapshotStore(spark)
    val src0 = KVIndex.bootstrap(store, "s3", srcRows(70), Seq("k"))
      .fold(e => fail(e.message), identity)
    MaterializedAgg.create(store, "v3", src0, Seq("grp"), "cents")
      .fold(e => fail(e.message), identity)
    // group 6 = keys where id % 7 == 6 -> remove them all
    val res = src0.execute(Seq(Command.Remove(
      srcRows(70).filter(col("grp") === 6L).select("k"))))
    val src1 = new KVIndex(store, res.orThrow)
    val view1 = MaterializedAgg.refresh(store, "v3", src1)
      .fold(e => fail(e.message), identity)
    assert(!viewRows(view1).exists(_._1 == 6L))
    assert(viewRows(view1) == recompute(src1))
  }

  test("refresh is idempotent per source version; stale src is a no-op") {
    val store = new MemorySnapshotStore(spark)
    val src0 = KVIndex.bootstrap(store, "s4", srcRows(30), Seq("k"))
      .fold(e => fail(e.message), identity)
    MaterializedAgg.create(store, "v4", src0, Seq("grp"), "cents")
      .fold(e => fail(e.message), identity)
    val res = src0.execute(Seq(Command.Remove(Seq(3L).toDF("k"))))
    val src1 = new KVIndex(store, res.orThrow)
    val v1 = MaterializedAgg.refresh(store, "v4", src1).fold(e => fail(e.message), identity)
    val v2 = MaterializedAgg.refresh(store, "v4", src1).fold(e => fail(e.message), identity)
    assert(v2.manifest.version == v1.manifest.version, "second refresh must not commit")
    val vStale = MaterializedAgg.refresh(store, "v4", src0).fold(e => fail(e.message), identity)
    assert(vStale.manifest.version == v1.manifest.version, "older src must not regress the view")
  }

  test("randomized mutation sequences: view tracks recompute across refreshes") {
    val rnd = new scala.util.Random(23)
    val store = new MemorySnapshotStore(spark)
    var src = KVIndex.bootstrap(store, "s5", srcRows(120), Seq("k"))
      .fold(e => fail(e.message), identity)
    MaterializedAgg.create(store, "v5", src, Seq("grp"), "cents")
      .fold(e => fail(e.message), identity)
    var nextKey = 2000L
    for (step <- 1 to 4) {
      val existing = src.df.select("k").as[Long].collect().sorted
      val rmKeys = rnd.shuffle(existing.toSeq).take(5 + rnd.nextInt(10))
      val upKeys = rnd.shuffle(existing.filterNot(rmKeys.contains).toSeq)
        .take(5 + rnd.nextInt(10))
      val ins = (0 until 8).map { _ => nextKey += 1;
        (nextKey, rnd.nextInt(9).toLong, rnd.nextInt(1000).toLong) }
      val res = src.execute(Seq(
        Command.Remove(rmKeys.toDF("k")),
        Command.Insert(upKeys.map(k => (k, rnd.nextInt(9).toLong,
          rnd.nextInt(1000).toLong)).toDF("k", "grp", "cents"), upsert = true),
        Command.Insert(ins.toDF("k", "grp", "cents"))))
      src = new KVIndex(store, res.orThrow)
      val view = MaterializedAgg.refresh(store, "v5", src)
        .fold(e => fail(e.message), identity)
      assert(viewRows(view) == recompute(src), s"step $step")
    }
  }

  test("multi-column + min/max view: refresh equals full recompute, " +
       "including removal of a group's extremes (both backends)") {
    import MaterializedAgg.ViewSpec
    for ((tag, store) <- stores) {
      val rows = spark.range(0, 100).select(col("id").as("k"),
        (col("id") % 5).as("grp"), (col("id") * 10).as("cents"),
        (col("id") % 13).as("pts"))
      val src0 = KVIndex.bootstrap(store, "s6", rows, Seq("k"))
        .fold(e => fail(e.message), identity)
      val spec = ViewSpec(Seq("cents", "pts"), Seq("cents"))
      val view0 = MaterializedAgg.create(store, "v6", src0, Seq("grp"), spec)
        .fold(e => fail(e.message), identity)
      def recomputeMm(src: KVIndex) = src.df.groupBy("grp")
        .agg(sum(coalesce(col("cents"), lit(0))).as("sum_cents"),
          sum(coalesce(col("pts"), lit(0))).as("sum_pts"),
          count(lit(1)).as("agg_cnt"),
          min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
        .orderBy("grp").collect().map(_.toSeq).toSeq
      def viewMm(v: KVIndex) = v.df
        .select("grp", "sum_cents", "sum_pts", "agg_cnt", "min_cents", "max_cents")
        .orderBy("grp").collect().map(_.toSeq).toSeq
      assert(viewMm(view0) == recomputeMm(src0), s"[$tag] create")
      // remove each group's current MAX (k 95..99) and the global MIN
      // (k=0), upsert a new low outlier, insert fresh rows incl. a new grp
      val res = src0.execute(Seq(
        Command.Remove((95L to 99L).toDF("k").unionByName(Seq(0L).toDF("k"))),
        Command.Insert(Seq((1L, 1L, -500L, 3L)).toDF("k", "grp", "cents", "pts"),
          upsert = true),
        Command.Insert(Seq((200L, 9L, 7L, 1L)).toDF("k", "grp", "cents", "pts"))))
      val src1 = new KVIndex(store, res.orThrow)
      val view1 = MaterializedAgg.refresh(store, "v6", src1)
        .fold(e => fail(e.message), identity)
      assert(viewMm(view1) == recomputeMm(src1),
        s"[$tag] min/max must track extreme removals via touched-group recompute")
    }
  }

  test("min/max updates even when a swap cancels the sum and count deltas") {
    import MaterializedAgg.ViewSpec
    val store = new MemorySnapshotStore(spark)
    // group 1 holds {0, 10}; swap to {4, 6}: sum 10 -> 10, count 2 -> 2,
    // but min 0 -> 4 and max 10 -> 6 — the canceled-delta shortcut trap
    val src0 = KVIndex.bootstrap(store, "s7",
      Seq((1L, 1L, 0L), (2L, 1L, 10L), (3L, 2L, 5L)).toDF("k", "grp", "cents"),
      Seq("k")).fold(e => fail(e.message), identity)
    MaterializedAgg.create(store, "v7", src0, Seq("grp"),
      ViewSpec(Seq("cents"), Seq("cents"))).fold(e => fail(e.message), identity)
    val res = src0.execute(Seq(Command.Insert(
      Seq((1L, 1L, 4L), (2L, 1L, 6L)).toDF("k", "grp", "cents"), upsert = true)))
    val src1 = new KVIndex(store, res.orThrow)
    val view1 = MaterializedAgg.refresh(store, "v7", src1)
      .fold(e => fail(e.message), identity)
    val g1 = view1.df.filter(col("grp") === 1L)
      .select("sum_cents", "agg_cnt", "min_cents", "max_cents")
      .as[(Long, Long, Long, Long)].head()
    assert(g1 == ((10L, 2L, 4L, 6L)), s"swap must refresh extremes: $g1")
    // the untouched group's recompute is a no-op: a second identical
    // refresh must not commit a new version either
    val view2 = MaterializedAgg.refresh(store, "v7", src1)
      .fold(e => fail(e.message), identity)
    assert(view2.manifest.version == view1.manifest.version)
  }

  test("randomized mutations against the min/max view track recompute") {
    import MaterializedAgg.ViewSpec
    val rnd = new scala.util.Random(91)
    val store = new MemorySnapshotStore(spark)
    var src = KVIndex.bootstrap(store, "s8",
      spark.range(0, 80).select(col("id").as("k"), (col("id") % 6).as("grp"),
        (col("id") * 3 % 101).as("cents")), Seq("k"))
      .fold(e => fail(e.message), identity)
    MaterializedAgg.create(store, "v8", src, Seq("grp"),
      ViewSpec(Seq("cents"), Seq("cents"))).fold(e => fail(e.message), identity)
    var nextKey = 5000L
    for (step <- 1 to 3) {
      val existing = src.df.select("k").as[Long].collect().sorted
      val rmKeys = rnd.shuffle(existing.toSeq).take(4 + rnd.nextInt(8))
      val upKeys = rnd.shuffle(existing.filterNot(rmKeys.contains).toSeq)
        .take(4 + rnd.nextInt(8))
      val ins = (0 until 6).map { _ => nextKey += 1;
        (nextKey, rnd.nextInt(8).toLong, rnd.nextInt(400).toLong - 200L) }
      val res = src.execute(Seq(
        Command.Remove(rmKeys.toDF("k")),
        Command.Insert(upKeys.map(k => (k, rnd.nextInt(8).toLong,
          rnd.nextInt(400).toLong - 200L)).toDF("k", "grp", "cents"), upsert = true),
        Command.Insert(ins.toDF("k", "grp", "cents"))))
      src = new KVIndex(store, res.orThrow)
      val view = MaterializedAgg.refresh(store, "v8", src)
        .fold(e => fail(e.message), identity)
      val got = view.df.select("grp", "sum_cents", "agg_cnt", "min_cents", "max_cents")
        .orderBy("grp").collect().map(_.toSeq).toSeq
      val want = src.df.groupBy("grp")
        .agg(sum(coalesce(col("cents"), lit(0))).as("s"), count(lit(1)).as("c"),
          min(col("cents")).as("mn"), max(col("cents")).as("mx"))
        .orderBy("grp").collect().map(_.toSeq).toSeq
      assert(got == want, s"step $step")
    }
  }

  test("float source columns are rejected (exactness contract)") {
    val store = new MemorySnapshotStore(spark)
    val rows = spark.range(0, 10).select(col("id").as("k"),
      (col("id") % 3).as("grp"), col("id").cast("double").as("w"))
    val src = KVIndex.bootstrap(store, "s6", rows, Seq("k"))
      .fold(e => fail(e.message), identity)
    intercept[IllegalArgumentException](
      MaterializedAgg.create(store, "v6", src, Seq("grp"), "w"))
  }

  /** FS store double recording which data files each readFiles call opens. */
  private class RecordingFsStore(root0: String) extends FsSnapshotStore(root0, spark) {
    val reads = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    override def readFiles(paths: Seq[String],
                           m: SnapshotManifest): DataFrame = {
      reads += paths
      super.readFiles(paths, m)
    }
  }

  test("refresh reads only the diff's unshared source files (COW contract)") {
    val store = new RecordingFsStore(tmpDir("graft-magg-cow"))
    // many files: small maxRowsPerFile forces a multi-file snapshot
    val src0 = KVIndex.bootstrap(store, "s7", srcRows(4000), Seq("k"),
        maxRowsPerFile = 256).fold(e => fail(e.message), identity)
    MaterializedAgg.create(store, "v7", src0, Seq("grp"), "cents")
      .fold(e => fail(e.message), identity)
    val nFiles = src0.numFiles
    assert(nFiles >= 6, s"need a multi-file source, got $nFiles")
    // touch ONE key -> COW rewrites one source file
    val res = src0.execute(Seq(Command.Insert(
      Seq((7L, 0L, 0L)).toDF("k", "grp", "cents"), upsert = true)))
    val src1 = new KVIndex(store, res.orThrow)
    store.reads.clear()
    val view1 = MaterializedAgg.refresh(store, "v7", src1)
      .fold(e => fail(e.message), identity)
    // snapshot the read log BEFORE the test's own full recompute below
    val refreshReads = store.reads.toList
    assert(viewRows(view1) == recompute(src1))
    // the COW contract: refresh reads each side's UNSHARED files only —
    // the files old and new snapshots share (untouched by the upsert)
    // are never opened. (The write itself may have split the touched
    // file into several small outputs; those are legitimately unshared.)
    val srcReads = refreshReads.filter(_.exists(_.contains("/s7/")))
    assert(srcReads.nonEmpty)
    val shared = src0.manifest.files.map(_.path).toSet
      .intersect(src1.manifest.files.map(_.path).toSet)
    assert(shared.size >= nFiles - 2, s"expected mostly-shared snapshots, shared=${shared.size}")
    val readShared = srcReads.flatten.distinct.filter(shared.contains)
    assert(readShared.isEmpty,
      s"refresh opened ${readShared.size} SHARED source files — not COW-diff-sized")
  }
}
