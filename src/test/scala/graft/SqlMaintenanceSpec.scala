package graft

import org.apache.spark.sql.functions._

import graft.core._

/** The r19 maintenance STATEMENT HEADS ([[graft.sources.GraftMaintenance]]
  * + [[graft.sources.GraftSqlParser]]): `VACUUM cat.t [RETAIN n
  * VERSIONS]`, `COMPACT cat.t`, `SHOW HISTORY cat.t` — the API-only
  * maintenance ops reachable from SQL text, row-returning, with typed
  * errors on non-graft targets.
  */
class SqlMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private def freshCat(tag: String): (String, FsSnapshotStore) = {
    val st = new FsSnapshotStore(tmpDir(s"graft-sqlmaint-$tag") + "/store", spark)
    val cat = s"mt$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", st.root)
    (cat, st)
  }

  /** Every file under `root` with its byte content hashed — equality means
    * the store is byte-identical (the DRY RUN contract).
    */
  private def storeFingerprint(root: String): Map[String, String] = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val base = Paths.get(root)
    val walk = Files.walk(base)
    try walk.iterator().asScala.filter(Files.isRegularFile(_)).map { p =>
      val md = java.security.MessageDigest.getInstance("MD5")
      base.relativize(p).toString ->
        md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
    }.toMap
    finally walk.close()
  }

  test("COMPACT then VACUUM through SQL: result rows, data invariance") {
    val (cat, st) = freshCat("vac")
    def slice(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, i * 3)).toDF("k", "v")
    var ix = KVIndex.bootstrap(st, "t", slice(0L, 100L), Seq("k"))
      .fold(e => sys.error(e.message), identity)
    for ((lo, hi) <- Seq((100L, 200L), (200L, 300L), (300L, 400L)))
      ix = new KVIndex(st, ix.execute(Seq(Command.Insert(slice(lo, hi)))).orThrow)
    val checksum = ix.df.agg(sum(col("v"))).head.getLong(0)

    val c = spark.sql(s"COMPACT $cat.t").collect()
    assert(c.length == 1 && c.head.getBoolean(0), c.mkString)
    assert(c.head.getLong(2) == 4 && c.head.getLong(3) == 1,
      s"4 files compacted to 1, got ${c.mkString}")

    spark.conf.set("spark.graft.sql.vacuum.graceMs", "0")
    try {
      // DRY RUN first (r20): the same plan, counted, NOTHING touched —
      // the store is byte-identical afterwards and the counts equal what
      // the destructive run then actually removes
      val snap0 = storeFingerprint(st.root)
      val dry = spark.sql(s"VACUUM $cat.t RETAIN 1 VERSIONS DRY RUN").collect()
      assert(dry.length == 1)
      assert(dry.head.getLong(0) == 5 && dry.head.getLong(1) == 4,
        s"dry run must report the would-be counts: ${dry.mkString}")
      assert(storeFingerprint(st.root) == snap0,
        "DRY RUN must leave the store byte-identical")
      // idempotent: a second dry run reports the same counts
      val dry2 = spark.sql(s"VACUUM $cat.t RETAIN 1 VERSIONS DRY RUN").collect()
      assert(dry2.head.getLong(0) == 5 && dry2.head.getLong(1) == 4, dry2.mkString)
      assert(storeFingerprint(st.root) == snap0)

      val v = spark.sql(s"VACUUM $cat.t RETAIN 1 VERSIONS").collect()
      assert(v.length == 1)
      assert(v.head.getLong(0) == 5, s"manifests v0..v4 dropped: ${v.mkString}")
      assert(v.head.getLong(1) == 4, s"4 pre-compact files swept: ${v.mkString}")
      assert(v.head.getLong(0) == dry.head.getLong(0) &&
        v.head.getLong(1) == dry.head.getLong(1),
        "destructive counts must equal the dry run's report")
    } finally spark.conf.unset("spark.graft.sql.vacuum.graceMs")

    val after = KVIndex.open(st, "t").fold(e => sys.error(e.message), identity)
    assert(after.count == 400L)
    assert(after.df.agg(sum(col("v"))).head.getLong(0) == checksum)
    // default RETAIN is 2 — a bare re-VACUUM has nothing left to drop
    spark.conf.set("spark.graft.sql.vacuum.graceMs", "0")
    try {
      val again = spark.sql(s"VACUUM $cat.t").collect()
      assert(again.head.getLong(0) == 0 && again.head.getLong(1) == 0, again.mkString)
    } finally spark.conf.unset("spark.graft.sql.vacuum.graceMs")
  }

  test("SHOW HISTORY returns the dual-stamped temporal log") {
    val (cat, st) = freshCat("hist")
    val ix = KVIndex.bootstrap(st, "h", Seq((1L, 1L)).toDF("k", "v"), Seq("k"))
      .fold(e => sys.error(e.message), identity)
    st.recordSnapshot("h", ix.manifest.version, ts = 1000L, wallMs = 5000L)
    val m2 = ix.execute(Seq(Command.Insert(Seq((2L, 2L)).toDF("k", "v"))), "tx-h2").orThrow
    st.recordSnapshot("h", m2.version, ts = 2000L, wallMs = 6000L)

    val rows = spark.sql(s"SHOW HISTORY $cat.h").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((ix.manifest.version, 1000L, 5000L), (m2.version, 2000L, 6000L)))
    // empty history: zero rows, not an error (T2 is explicit)
    KVIndex.bootstrap(st, "h2", Seq((1L, 1L)).toDF("k", "v"), Seq("k"))
    assert(spark.sql(s"SHOW HISTORY $cat.h2").collect().isEmpty)
  }

  test("typed errors: absent table, RETAIN 0; non-graft catalogs fall through") {
    val (cat, _) = freshCat("err")
    val e1 = intercept[Exception](spark.sql(s"VACUUM $cat.nope").collect())
    assert(e1.getMessage.contains("does not exist"), e1.getMessage)
    val e3 = intercept[Exception](
      spark.sql(s"VACUUM $cat.nope RETAIN 0 VERSIONS").collect())
    assert(e3.getMessage.contains("at least 1"), e3.getMessage)
    // r20 (ADVICE): the maintenance heads intercept ONLY graft catalogs —
    // a catalog owned by another extension (or none at all) falls through
    // to the delegate parser instead of being hijacked with a typed
    // "not a graft catalog" error, so e.g. Delta's own VACUUM keeps
    // working in a session that also loads the graft extensions
    spark.conf.set("spark.sql.catalog.foreigncat", "some.other.CatalogImpl")
    try {
      for (stmt <- Seq("VACUUM foreigncat.t", "COMPACT foreigncat.t",
          "SHOW HISTORY foreigncat.t", "VACUUM nocat.t")) {
        val e = intercept[Exception](spark.sql(stmt).collect())
        assert(!e.getMessage.contains("graft"),
          s"'$stmt' must fall through to the delegate parser, got: ${e.getMessage}")
      }
    } finally spark.conf.unset("spark.sql.catalog.foreigncat")
  }
}
