package graft

import graft.core._

/** The manifest layer at large file counts (SCALE.md: 100 TB / 32 MB files
  * ≈ 3M entries). Above `inlineFilesMax` the file list is stored as a
  * parquet checkpoint (the Delta-checkpoint pattern) instead of inline
  * JSON; loads resolve the checkpoint, vacuum sweeps unreferenced ones,
  * and O(files) planning passes run on typed comparisons (KeyOrd's
  * BigDecimal-via-toString numeric path is gone for integral/floating
  * keys).
  */
class ManifestScaleSpec extends SparkSuite {

  private val N = 60000 // > inlineFilesMax (10k): forces the checkpoint path

  private def bigFiles(n: Int): Seq[FileEntry] =
    (0 until n).map { i =>
      FileEntry(s"fake/part-$i", 10L, Seq(i * 10L), Seq(i * 10L + 9))
    }

  private def commitBig(store: SnapshotStore, id: String, n: Int): SnapshotManifest = {
    val m0 = store.createIndex(id, Seq("k"), Seq("v"), colTypes = Seq("BIGINT", "STRING"))
      .fold(e => fail(e.message), identity)
    store.commit(
      m0.copy(version = 1L, snapshotId = java.util.UUID.randomUUID().toString,
        numElements = n * 10L, lastChangeVersion = "tx-big", files = bigFiles(n)),
      expectedParent = 0L)
  }

  test("60k-file manifest round-trips through the checkpoint on both backends") {
    for (store <- Seq(new FsSnapshotStore(tmpDir("graft-bigmanifest"), spark),
                      new MemorySnapshotStore(spark))) {
      val committed = commitBig(store, "big", N)
      assert(committed.files.size == N, "commit returns the inline manifest")
      val loaded = store.loadLatest("big").fold(e => fail(e.message), identity)
      assert(loaded.filesRef.isEmpty, "loadVersion must resolve AND clear the ref")
      assert(loaded.files.size == N)
      assert(loaded.files == committed.files, "checkpoint must round-trip exactly, in order")
      assert(loaded.numElements == N * 10L)
      // the stored JSON itself stays small — the monolith is gone
      assert(loaded.filesDisjointOrdered)
    }
  }

  test("point-get planning over a 60k-file manifest is bounded") {
    val store = new FsSnapshotStore(tmpDir("graft-bigmanifest-prune"), spark)
    commitBig(store, "big", N)
    val t0 = System.nanoTime()
    val m = store.loadLatest("big").fold(e => fail(e.message), identity)
    val loadSec = (System.nanoTime() - t0) / 1e9
    // 100 point-get planning passes: the O(files) covering-file scan a
    // read plans with — typed KeyOrd compares, no BigDecimal allocation
    val t1 = System.nanoTime()
    var hits = 0
    for (q <- 0 until 100) {
      val key = Seq((q * 997L) % (N * 10L))
      hits += m.files.count(f =>
        KeyOrd.compare(f.min, key) <= 0 && KeyOrd.compare(key, f.max) <= 0)
    }
    val pruneSec = (System.nanoTime() - t1) / 1e9
    assert(hits == 100, "each point key lands in exactly one file")
    assert(loadSec < 15.0, s"checkpointed open took ${loadSec}s")
    assert(pruneSec < 5.0, s"100 prune passes over 60k files took ${pruneSec}s")
  }

  /** Store double that counts checkpoint materializations. */
  private class CountingFsStore(root0: String) extends FsSnapshotStore(root0, spark) {
    @volatile var fullListReads = 0
    @volatile var entriesMaterialized = 0L
    def resetCounts(): Unit = { fullListReads = 0; entriesMaterialized = 0L }
    override protected def readFileList(rel: String): Seq[FileEntry] = {
      fullListReads += 1
      val r = super.readFileList(rel); entriesMaterialized += r.size; r
    }
    override protected def readFileListWhere(rel: String,
                                             pred: FileEntry => Boolean): Seq[FileEntry] = {
      val r = super.readFileListWhere(rel, pred); entriesMaterialized += r.size; r
    }
    override protected def readFileListFirst(rel: String, pred: FileEntry => Boolean,
                                             fromEnd: Boolean): Option[FileEntry] = {
      val r = super.readFileListFirst(rel, pred, fromEnd)
      entriesMaterialized += r.size; r
    }
  }

  test("lazy open: point planning over a 60k-file checkpoint materializes only covering entries") {
    val store = new CountingFsStore(tmpDir("graft-lazy-open"))
    commitBig(store, "big", N)
    val ix = KVIndex.open(store, "big").fold(e => fail(e.message), identity)
    assert(ix.manifest.filesRef.isDefined, "open must keep the checkpoint ref lazy")
    assert(ix.manifest.disjointHint.contains(true), "commit must record disjointness")
    store.resetCounts()
    // covering-file locate, successor/predecessor seeks, covered-range count:
    // each plans through a Spark-side checkpoint filter, never the full list
    assert(ix.findFile(Seq(123455L)).exists(_.min.head == 123450L))
    assert(ix.nextKeyFile(Seq(123459L)).exists(_.min.head == 123460L))
    assert(ix.previousKeyFile(Seq(0L)).isEmpty)
    assert(ix.countRange(Seq(100L), Seq(129L)) == 30L) // 3 covered files, zero data IO
    assert(store.fullListReads == 0,
      "point planning over a lazy manifest must not materialize the full file list")
    assert(store.entriesMaterialized <= 8,
      s"expected O(covering files) entries, materialized ${store.entriesMaterialized}")
    // whole-list operations resolve once and cache the resolution
    assert(ix.numFiles == N)
    assert(store.fullListReads == 1)
    ix.numFiles
    assert(store.fullListReads == 1, "full resolve must be cached on the index")
  }

  test("small manifests stay inline JSON (no checkpoint IO)") {
    val store = new FsSnapshotStore(tmpDir("graft-smallmanifest"), spark)
    val committed = commitBig(store, "small", 50)
    val raw = java.nio.file.Files.readString(
      java.nio.file.Paths.get(store.root, "small", "v1.manifest.json"))
    assert(raw.contains("\"files\":[{"), "small manifests keep inline files")
    assert(!raw.contains("filesRef"))
    assert(store.loadLatest("small").toOption.get.files == committed.files)
  }

  test("vacuum sweeps checkpoints of dropped versions, keeps the referenced one") {
    val store = new FsSnapshotStore(tmpDir("graft-bigmanifest-vac"), spark)
    val v1 = commitBig(store, "big", N)
    // two more big versions on the same lineage
    val v2 = store.commit(v1.copy(version = 2L,
      snapshotId = java.util.UUID.randomUUID().toString, files = bigFiles(N)), 1L)
    store.commit(v2.copy(version = 3L,
      snapshotId = java.util.UUID.randomUUID().toString, files = bigFiles(N)), 2L)
    val flDir = java.nio.file.Paths.get(store.root, "big", "filelist")
    assert(java.nio.file.Files.list(flDir).count() == 3)
    val (droppedManifests, _) = store.vacuum("big", retainVersions = 1, graceMs = 0L)
    assert(droppedManifests == 3) // v0 (createIndex), v1, v2
    assert(java.nio.file.Files.list(flDir).count() == 1,
      "dropped versions' checkpoints must be swept")
    val kept = store.loadLatest("big").fold(e => fail(e.message), identity)
    assert(kept.version == 3L && kept.files.size == N,
      "the surviving version must still resolve its checkpoint")
  }

  test("bootstrap file count is bounded by REAL rows even when plan stats overshoot") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    // a join+window lineage whose optimizer size estimate compounds far
    // past reality — the shape that once wrote a 1M-row table as 100k
    // ten-row files (and made every later scan a 100k-file open)
    val a = spark.range(20000L).select(col("id").as("k"), (col("id") % 97).as("x"))
    val b = spark.range(20000L).select(col("id").as("k"), (col("id") % 89).as("y"))
    val heavy = a.join(b, "k")
      .withColumn("r", row_number().over(Window.partitionBy(col("x")).orderBy(col("k"))))
      .select(col("k"), (col("x") + col("y") + col("r")).as("v"))
    val est = BigDecimal(heavy.queryExecution.optimizedPlan.stats.sizeInBytes)
    val store = new MemorySnapshotStore(spark)
    val ix = KVIndex.bootstrap(store, "guard", heavy, Seq("k"),
        maxRowsPerFile = 4096L)
      .fold(e => fail(e.message), identity)
    // 20k rows / 4096-row files -> 5 files; without the exact-count
    // guard an inflated estimate dictates the layout instead
    assert(ix.numFiles == 5,
      s"expected 5 files for 20k rows at 4096/file (stats estimated $est bytes), " +
        s"got ${ix.numFiles}")
    assert(ix.df.count() == 20000L)
  }
}
