package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{Command, LeafNode}
import org.apache.spark.sql.types.{BooleanType, LongType}

import graft.core.{GraftException, KVIndex, SnapshotStore}

/** SQL surface for the engine's maintenance operations — the API-only
  * `SnapshotStore.vacuum` / `KVIndex.compact` / `historyLogWall` reachable
  * as statement heads through the same [[GraftSqlParser]] interceptor the
  * MATERIALIZED VIEW statements use:
  *
  * {{{
  *   VACUUM cat.t [RETAIN n VERSIONS]   -- GC: keep newest n (default 2),
  *                                      -- mark-and-sweep unreferenced files
  *   COMPACT cat.t                      -- W6: merge under-filled files
  *   SHOW HISTORY cat.t                 -- the T2 temporal log (dual stamps)
  * }}}
  *
  * Each returns result rows like Spark's own utility statements (VACUUM:
  * removal counts; COMPACT: version + file counts; SHOW HISTORY: one row
  * per recorded snapshot). Non-graft catalogs and absent indexes fail with
  * typed errors — nothing silently no-ops.
  *
  * `VACUUM`'s sweep grace window follows
  * `spark.graft.sql.vacuum.graceMs` (default
  * [[graft.core.SnapshotStore.DefaultVacuumGraceMs]]); a maintenance
  * window that wants the exact deterministic sweep sets it to 0.
  */
object GraftMaintenance {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"graft maintenance: $msg")

  /** The store behind a graft catalog name — the [[GraftMatView.storeFor]]
    * contract: typed error on non-graft catalogs.
    */
  private def storeAndIndex(spark: SparkSession, cat: String,
                            id: String): (SnapshotStore, KVIndex) = {
    val store = GraftMatView.storeFor(spark, cat, what = "maintenance statement")
    if (!store.exists(id)) fail(s"$cat.$id does not exist")
    (store, KVIndex.open(store, id).fold(e => throw GraftException(e), identity))
  }

  def runVacuum(spark: SparkSession, cat: String, id: String,
                retain: Int, dryRun: Boolean): Seq[InternalRow] = {
    if (retain < 1) fail(s"RETAIN $retain VERSIONS — at least 1 version must survive")
    val (store, _) = storeAndIndex(spark, cat, id)
    val graceMs = spark.conf.getOption("spark.graft.sql.vacuum.graceMs")
      .map { raw =>
        try raw.trim.toLong
        catch { case _: NumberFormatException => fail(
          s"spark.graft.sql.vacuum.graceMs must be a millisecond count, got '$raw'") }
      }.getOrElse(SnapshotStore.DefaultVacuumGraceMs)
    // DRY RUN: the same plan, counted but never swept — the Delta idiom
    // for inspecting a destructive sweep before committing to it
    val (m, f) = store.vacuum(id, retainVersions = retain, graceMs = graceMs,
      dryRun = dryRun)
    Seq(InternalRow(m.toLong, f.toLong))
  }

  def runCompact(spark: SparkSession, cat: String, id: String): Seq[InternalRow] = {
    val (_, ix) = storeAndIndex(spark, cat, id)
    val before = ix.numFiles
    val r = ix.compact()
    val m = r.snapshot.getOrElse(
      r.error.fold(fail("compact returned no snapshot"))(e => throw GraftException(e)))
    val after = new KVIndex(ix.store, m).numFiles
    Seq(InternalRow(m.version != ix.manifest.version, m.version,
      before.toLong, after.toLong))
  }

  def runShowHistory(spark: SparkSession, cat: String, id: String): Seq[InternalRow] = {
    val (store, _) = storeAndIndex(spark, cat, id)
    store.historyLogWall(id).map { case (ts, v, ms) =>
      InternalRow(v, ts, ms.map(Long.box).orNull)
    }
  }
}

/** Logical maintenance commands — eagerly executed, row-returning (the
  * SHOW TABLES pattern).
  */
final case class VacuumTableCommand(cat: String, id: String, retain: Int,
                                    dryRun: Boolean = false)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("manifests_removed", LongType, nullable = false)(),
    AttributeReference("files_deleted", LongType, nullable = false)())
}
final case class CompactTableCommand(cat: String, id: String)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("compacted", BooleanType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)())
}
final case class ShowHistoryCommand(cat: String, id: String)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("ts", LongType, nullable = false)(),
    AttributeReference("wall_ms", LongType, nullable = true)())
}
