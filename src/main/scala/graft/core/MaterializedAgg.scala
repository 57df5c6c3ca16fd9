package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate view over a snapshot index — the
  * materialized-view maintenance a 100 TB store needs: re-aggregating the
  * corpus per commit is O(corpus), but the COW diff between two snapshot
  * versions reads ONLY unshared files ([[KVIndex.diff]]), so a refresh
  * costs O(changed data) + O(touched groups).
  *
  * The view is itself a [[KVIndex]] keyed by the group columns with value
  * columns `agg_sum` (of one source column) and `agg_cnt` — enough to
  * derive sum/count/avg. The SOURCE position the view reflects rides in
  * the view manifest's `lastChangeVersion` (`magg:<srcId>:<valueCol>:v<N>
  * :<uuid>`), so refresh knows exactly which diff to apply and is
  * idempotent per source version.
  *
  * EXACTNESS contract: the maintained state is bit-identical to a full
  * recompute, which requires order-independent addition — the source
  * column must be integral or decimal (floats are REJECTED: their sums
  * depend on association order, so "incremental == recompute" could not
  * hold and the whole point of the oracle-checked view would be lost).
  *
  * Refresh plan shape: diff (unshared files only) → per-row ±events (a
  * `changed` row emits a removal at its OLD group and an addition at its
  * NEW group, so rows MIGRATING between groups just work) → one
  * map-side-combined aggregate to (group, dSum, dCnt) → left join onto
  * the view state → one COW write batch (upserts + removals of emptied
  * groups). Untouched groups' files are never rewritten (file-grain COW).
  * MIN/MAX are deliberately absent: they are not incrementally
  * maintainable under removals without per-group recompute.
  */
object MaterializedAgg {

  private def txOf(srcId: String, valueCol: String, srcVersion: Long): String =
    s"magg:$srcId:$valueCol:v$srcVersion:${java.util.UUID.randomUUID()}"

  /** (srcId, valueCol, srcVersion) recorded in a view manifest. */
  private[graft] def sourceOf(m: SnapshotManifest): (String, String, Long) =
    m.lastChangeVersion.split(":") match {
      case Array("magg", id, vc, v, _*) if v.startsWith("v") =>
        (id, vc, v.drop(1).toLong)
      case _ => throw new IllegalStateException(
        s"${m.id} is not a MaterializedAgg view (tx='${m.lastChangeVersion}')")
    }

  private def requireExactType(df: DataFrame, valueCol: String): Unit = {
    import org.apache.spark.sql.types._
    df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType | _: DecimalType => ()
      case t => throw new IllegalArgumentException(
        s"MaterializedAgg needs an integral/decimal column for exact " +
          s"order-independent maintenance; '$valueCol' is $t — fix the " +
          "units upstream (e.g. cents as BIGINT), don't sum floats")
    }
  }

  /** Full aggregate of `src`'s current snapshot, materialized as index
    * `viewId` (grouped on `groupCols`, summing/counting `valueCol`).
    */
  def create(store: SnapshotStore, viewId: String, src: KVIndex,
             groupCols: Seq[String], valueCol: String): Either[GraftError, KVIndex] = {
    val df = src.df
    requireExactType(df, valueCol)
    // coalesce BEFORE the sum: SQL sum() skips NULLs and yields NULL for
    // an all-null group, which the incremental ± arithmetic could not
    // reproduce; null-as-zero makes both paths agree exactly
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(sum(coalesce(col(valueCol), lit(0))).as("agg_sum"),
        count(lit(1)).as("agg_cnt"))
    KVIndex.bootstrap(store, viewId, agg, groupCols,
      txVersion = txOf(src.manifest.id, valueCol, src.manifest.version))
  }

  /** Apply the COW diff between the view's recorded source version and
    * `src`'s current version. No-op (same index returned, no commit) when
    * already current or when the diff nets out to zero.
    */
  def refresh(store: SnapshotStore, viewId: String, src: KVIndex): Either[GraftError, KVIndex] =
    KVIndex.open(store, viewId).map { view =>
      val (srcId, valueCol, v0) = sourceOf(view.manifest)
      require(srcId == src.manifest.id,
        s"view $viewId tracks $srcId, not ${src.manifest.id}")
      if (src.manifest.version <= v0) view
      else refreshFrom(store, view, src, valueCol, v0)
    }

  private def refreshFrom(store: SnapshotStore, view: KVIndex, src: KVIndex,
                          valueCol: String, v0: Long): KVIndex = {
      val srcId = src.manifest.id
      val old = new KVIndex(store, store.loadVersion(srcId, v0))
      val delta = groupDeltas(old.diff(src), view.manifest.keyCols,
        valueCol, src.manifest.keyCols.toSet)
      val state = view.df.select(
        view.manifest.keyCols.map(col) :+ col("agg_sum") :+ col("agg_cnt"): _*)
      val sumType = state.schema("agg_sum").dataType
      val applied = delta.join(state, view.manifest.keyCols, "left")
        .select(view.manifest.keyCols.map(col) ++ Seq(
          (coalesce(col("agg_sum"), lit(0)) + col("d_sum")).cast(sumType).as("agg_sum"),
          (coalesce(col("agg_cnt"), lit(0L)) + col("d_cnt")).cast("long").as("agg_cnt")): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val upserts = applied.filter(col("agg_cnt") > 0L)
        val removes = applied.filter(col("agg_cnt") === 0L)
          .select(view.manifest.keyCols.map(col): _*)
        val cmds = Seq(
          if (upserts.isEmpty) None else Some(Command.Insert(upserts, upsert = true)),
          if (removes.isEmpty) None else Some(Command.Remove(removes))).flatten
        if (cmds.isEmpty) view
        else {
          val res = view.execute(cmds,
            txOf(srcId, valueCol, src.manifest.version))
          new KVIndex(store, res.orThrow)
        }
      } finally applied.unpersist()
  }

  /** Per-group net deltas from a [[KVIndex.diff]] frame: each diff row
    * contributes a removal event at its OLD group and/or an addition at
    * its NEW group; groups whose events cancel exactly are dropped (their
    * files must not churn).
    */
  private def groupDeltas(diff: DataFrame, groupCols: Seq[String],
                          valueCol: String, srcKeys: Set[String]): DataFrame = {
    def sideCol(c: String, side: String): Column =
      if (srcKeys.contains(c)) col(c) else col(s"${side}_$c")
    def events(side: String, changes: Seq[String], sign: Int) = diff
      .filter(col("change").isin(changes: _*))
      .select(groupCols.map(c => sideCol(c, side).as(c)) ++ Seq(
        (lit(sign) * coalesce(sideCol(valueCol, side), lit(0))).as("d_sum"),
        lit(sign.toLong).as("d_cnt")): _*)
    events("old", Seq("removed", "changed"), -1)
      .unionByName(events("new", Seq("added", "changed"), 1))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("d_sum")).as("d_sum"), sum(col("d_cnt")).as("d_cnt"))
      .filter(col("d_sum") =!= 0 || col("d_cnt") =!= 0L)
  }
}
