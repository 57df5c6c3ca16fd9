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
}
