package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{GraftException, KVIndex, SnapshotStore}

/** Change-data-capture stream over a snapshot index's version history:
  * `spark.readStream.format("graft").option("root", r).load(id)` emits one
  * micro-batch per committed snapshot version — the COW dividend made
  * streaming. Offsets ARE snapshot versions; the first batch is the full
  * snapshot as `added` rows, every later batch is `KVIndex.diff` between
  * the last seen version and the new LATEST, reshaped to
  * `(key..., value..., _change in {added, removed, changed})`. Because
  * diff skips files shared by both manifests, each batch's cost is
  * proportional to the CHANGED data, not the index size — a 100-TB index
  * whose writer commits small batches streams small batches.
  *
  * Retention contract: the stream reads manifests of past versions, so
  * `vacuum(retainVersions = n)` must keep at least the stream's maximum
  * lag in versions; a vacuumed-away start version fails the batch with a
  * clear error rather than silently skipping changes.
  *
  * Admission control: `.option("maxVersionsPerBatch", n)` bounds how many
  * committed versions one micro-batch may span. Without it, a reader
  * restarted after a month of commits would plan ONE batch diffing across
  * the whole gap — correct, but a giant unit of work with no intermediate
  * progress or checkpoint. With the cap, [[getOffset]] advances at most
  * `n` versions past the last batch this source planned, so the gap
  * drains in `ceil(gap / n)` bounded batches whose change-rows union to
  * the full diff (and preserve intermediate changes a collapsed diff
  * would cancel). Offsets already committed to the query checkpoint are
  * always served as-is — the cap shapes FUTURE batches, never re-splits
  * a planned one.
  */
final class GraftChangeSource(store: SnapshotStore, indexId: String,
                              maxVersionsPerBatch: Option[Long] = None)
    extends Source {

  require(maxVersionsPerBatch.forall(_ >= 1L),
    "graft: maxVersionsPerBatch must be >= 1")

  /** End version of the last batch this instance planned — the base the
    * cap advances from. Restart recovery initializes it: Spark replays
    * `getBatch` for the last checkpointed batch before asking for new
    * offsets, so the first capped step starts from the checkpoint, not
    * from zero.
    */
  @volatile private var lastPlanned: Option[Long] = None

  override val schema: StructType = GraftChangeSource.changeSchema(
    store.emptyTyped(store.loadLatestLazy(indexId)
      .fold(e => throw GraftException(e), identity)).schema)

  override def getOffset: Option[Offset] =
    store.loadLatestLazy(indexId).toOption.map { m =>
      val capped = (maxVersionsPerBatch, lastPlanned) match {
        case (Some(max), Some(prev)) => math.min(m.version, prev + max)
        case _ => m.version // first batch is the full snapshot either way
      }
      LongOffset(capped)
    }

  private def versionOf(o: Offset): Long = o.json.toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    def openVersion(v: Long): KVIndex =
      try new KVIndex(store, store.loadVersionLazy(indexId, v))
      catch {
        case e: java.util.NoSuchElementException =>
          throw new IllegalStateException(
            s"graft stream on '$indexId': version $v is gone (vacuumed?) — " +
              "keep vacuum retainVersions above the stream's version lag", e)
      }
    val keyed = start.map(versionOf) match {
      case None =>
        // initial batch: the whole snapshot at endV enters as `added`
        val m = store.loadVersionLazy(indexId, endV)
        val base = store.read(m)
        base.select((m.keyCols ++ m.valueCols).map(col) :+
          lit("added").as("_change"): _*)
      case Some(startV) =>
        val from = openVersion(startV)
        val to = openVersion(endV)
        val vals = from.manifest.valueCols.filterNot(_ == "version")
        from.diff(to).select(
          from.manifest.keyCols.map(col) ++
            vals.map(c => coalesce(col(s"new_$c"), col(s"old_$c")).as(c)) :+
            col("change").as("_change"): _*)
    }
    lastPlanned = Some(endV)
    org.apache.spark.sql.graft.Shim.asStreamingBatch(keyed)
  }

  override def stop(): Unit = ()
}

object GraftChangeSource {
  /** key + value columns + `_change`; the per-row write-version stamp is
    * dropped (diff excludes it — COW rewrites re-stamp unchanged rows).
    */
  private[sources] def changeSchema(snapshot: StructType): StructType =
    StructType(snapshot.fields.filterNot(_.name == "version") :+
      StructField("_change", StringType, nullable = true))
}
