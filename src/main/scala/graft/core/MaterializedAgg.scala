package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate view over a snapshot index — the
  * materialized-view maintenance a 100 TB store needs: re-aggregating the
  * corpus per commit is O(corpus), but the COW diff between two snapshot
  * versions reads ONLY unshared files ([[KVIndex.diff]]), so a refresh
  * costs O(changed data) + O(touched groups).
  *
  * The view is itself a [[KVIndex]] keyed by the group columns. A
  * [[MaterializedAgg.ViewSpec]] names the maintained aggregates:
  *
  *  - `sumCols` — one `sum_<c>` column each (plus the shared `agg_cnt`),
  *    all maintained in ONE pass over the diff's ±events; several value
  *    columns cost no extra jobs over one. The single-column no-min/max
  *    view keeps the legacy `agg_sum`/`agg_cnt` names.
  *  - `minMaxCols` — `min_<m>`/`max_<m>` each. Min/max are NOT
  *    incrementally maintainable under removals (dropping the current
  *    minimum says nothing about the next one), so refresh recomputes
  *    them from the SOURCE — but only for TOUCHED groups: the diff names
  *    the groups whose membership changed, a semi-join restricts the
  *    source aggregate to exactly those. Cost: one source scan whose
  *    AGGREGATION is bounded by touched rows (and when the group columns
  *    are the source's leading key, the scan itself prunes to their
  *    files); untouched groups never rewrite. A spec without min/max
  *    never scans the source at all — the pure-± economics.
  *
  * The SOURCE position the view reflects rides in the view manifest's
  * `lastChangeVersion` (`magg:<srcId>:<spec>:v<N>:<uuid>`), so refresh
  * knows exactly which diff to apply and is idempotent per source
  * version.
  *
  * EXACTNESS contract: the maintained state is bit-identical to a full
  * recompute, which requires order-independent arithmetic — sum columns
  * must be integral or decimal (floats are REJECTED: their sums depend on
  * association order, so "incremental == recompute" could not hold).
  * Min/max are order-independent for any orderable type, so min/max
  * columns carry no type restriction.
  */
object MaterializedAgg {

  /** The aggregates a view maintains. Column names must not contain the
    * manifest-encoding separators.
    *
    * `where` (r19) is an optional DETERMINISTIC row predicate in SQL text
    * applied to the SOURCE before aggregation — the view maintains
    * `SELECT g, aggs FROM src WHERE p GROUP BY g`. The SAME text filters
    * the full aggregate at create time and each diff side at refresh (an
    * old row that passed p contributes its removal, a new row that passes
    * p its addition; rows p drops contribute nothing on either side), so
    * incremental == recompute holds verbatim. Time-dependent or
    * nondeterministic predicates are the caller's to reject — they would
    * filter a refresh's diff differently than create filtered the corpus.
    * The text is persisted base64-encoded in the spec segment of the view
    * manifest's tx string (SQL may contain any separator character).
    */
  final case class ViewSpec(sumCols: Seq[String], minMaxCols: Seq[String] = Nil,
                            where: Option[String] = None) {
    require(sumCols.nonEmpty, "at least one sum column")
    require((sumCols ++ minMaxCols).forall(c => !Seq(",", "|", ":").exists(c.contains)),
      "view columns must not contain ',', '|' or ':'")
    // fail at SPEC construction, not as an opaque AnalysisException mid-
    // refresh after the view manifest already exists: a repeated column
    // would produce duplicate/ambiguous view columns (sum_c twice, or
    // min_c next to another min_c)
    require(sumCols.distinct.size == sumCols.size,
      s"duplicate sum columns: ${sumCols.mkString(",")}")
    require(minMaxCols.distinct.size == minMaxCols.size,
      s"duplicate min/max columns: ${minMaxCols.mkString(",")}")
    require(where.forall(_.trim.nonEmpty), "empty WHERE predicate")
    /** single sum, no min/max — keeps the original agg_sum/agg_cnt names
      * (a filtered single-sum view keeps them too: the filter changes
      * which rows aggregate, not what the view stores)
      */
    private[graft] def legacy: Boolean = sumCols.sizeIs == 1 && minMaxCols.isEmpty
    private[graft] def sumName(c: String): String = if (legacy) "agg_sum" else s"sum_$c"
    private[core] def encode: String = where match {
      case None => sumCols.mkString(",") +
        (if (minMaxCols.nonEmpty) "|" + minMaxCols.mkString(",") else "")
      case Some(w) => sumCols.mkString(",") + "|" + minMaxCols.mkString(",") + "|" +
        java.util.Base64.getEncoder.encodeToString(w.getBytes("UTF-8"))
    }
    /** view value columns in schema order */
    private[core] def valueNames: Seq[String] =
      sumCols.map(sumName) ++ Seq("agg_cnt") ++
        minMaxCols.flatMap(m => Seq(s"min_$m", s"max_$m"))
    /** `where` applied (or not) to a source-shaped frame */
    private[core] def filtered(df: DataFrame): DataFrame =
      where.fold(df)(w => df.filter(expr(w)))
  }

  private[core] def decodeSpec(s: String): ViewSpec = {
    def cols(part: String): Seq[String] = part.split(",").toSeq.filter(_.nonEmpty)
    s.split("\\|", -1) match {
      case Array(sums) => ViewSpec(cols(sums))
      case Array(sums, mm) => ViewSpec(cols(sums), cols(mm))
      case Array(sums, mm, w) => ViewSpec(cols(sums), cols(mm),
        Some(new String(java.util.Base64.getDecoder.decode(w), "UTF-8")))
      case _ => throw new IllegalStateException(s"bad MaterializedAgg spec '$s'")
    }
  }

  private def txOf(srcId: String, spec: ViewSpec, srcVersion: Long): String =
    s"magg:$srcId:${spec.encode}:v$srcVersion:${java.util.UUID.randomUUID()}"

  /** (srcId, spec, srcVersion) recorded in a view manifest. */
  private[graft] def sourceOf(m: SnapshotManifest): (String, ViewSpec, Long) =
    m.lastChangeVersion.split(":") match {
      case Array("magg", id, spec, v, _*) if v.startsWith("v") =>
        (id, decodeSpec(spec), v.drop(1).toLong)
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

  /** The full aggregate expressions of a spec, shared by create and the
    * touched-group recompute so the two paths are the same arithmetic.
    * `coalesce` BEFORE the sum: SQL `sum()` skips NULLs and yields NULL
    * for an all-null group, which the incremental ± arithmetic could not
    * reproduce; null-as-zero makes both paths agree exactly.
    */
  private def aggExprs(spec: ViewSpec): Seq[Column] =
    spec.sumCols.map(c => sum(coalesce(col(c), lit(0))).as(spec.sumName(c))) ++
      Seq(count(lit(1)).as("agg_cnt")) ++
      spec.minMaxCols.flatMap(m => Seq(min(col(m)).as(s"min_$m"), max(col(m)).as(s"max_$m")))

  /** Full aggregate of `src`'s current snapshot, materialized as index
    * `viewId` (grouped on `groupCols`, maintaining `spec`).
    */
  def create(store: SnapshotStore, viewId: String, src: KVIndex,
             groupCols: Seq[String], spec: ViewSpec): Either[GraftError, KVIndex] = {
    val df = src.df
    spec.sumCols.foreach(requireExactType(df, _))
    // a value column whose DERIVED name (sum_c / min_c / max_c / agg_cnt)
    // collides with a group column would only surface later as an opaque
    // AnalysisException during refresh — reject it here, pre-manifest
    val clash = spec.valueNames.toSet intersect groupCols.toSet
    require(clash.isEmpty,
      s"view value column(s) ${clash.mkString(",")} collide with group columns")
    val e = aggExprs(spec)
    val agg = spec.filtered(df).groupBy(groupCols.map(col): _*).agg(e.head, e.tail: _*)
    // recordHistory: every view lifecycle commit is dual-stamped (r20),
    // so catalog `TIMESTAMP AS OF` time travel works on the VIEW like on
    // any history-recording table — a refresh's pre-state stays one
    // wall-clock floor lookup away (one appended history line per commit)
    KVIndex.bootstrap(store, viewId, agg, groupCols,
      txVersion = txOf(src.manifest.id, spec, src.manifest.version),
      recordHistory = true)
  }

  /** Single-sum convenience (the original surface). */
  def create(store: SnapshotStore, viewId: String, src: KVIndex,
             groupCols: Seq[String], valueCol: String): Either[GraftError, KVIndex] =
    create(store, viewId, src, groupCols, ViewSpec(Seq(valueCol)))

  /** Apply the COW diff between the view's recorded source version and
    * `src`'s current version. No-op (same index returned, no commit) when
    * already current or when the diff nets out to zero.
    */
  def refresh(store: SnapshotStore, viewId: String, src: KVIndex): Either[GraftError, KVIndex] =
    KVIndex.open(store, viewId).map { view =>
      val (srcId, spec, v0) = sourceOf(view.manifest)
      require(srcId == src.manifest.id,
        s"view $viewId tracks $srcId, not ${src.manifest.id}")
      if (src.manifest.version <= v0) view
      else if (spec.minMaxCols.isEmpty) refreshIncremental(store, view, src, spec, v0)
      else refreshTouched(store, view, src, spec, v0)
    }

  /** Pure-± path (no min/max): diff → per-group net deltas → one join
    * onto the view state → one COW write batch. The source is never
    * scanned.
    */
  private def refreshIncremental(store: SnapshotStore, view: KVIndex, src: KVIndex,
                                 spec: ViewSpec, v0: Long): KVIndex = {
    val srcId = src.manifest.id
    val old = new KVIndex(store, store.loadVersion(srcId, v0))
    val gcols = view.manifest.keyCols
    val delta = groupDeltas(old.diff(src), gcols, spec, src.manifest.keyCols,
        src.manifest.valueCols.filterNot(_ == "version"))
      // groups whose events cancel exactly are dropped — their files
      // must not churn (only sound without min/max: a swap that
      // preserves sum and count can still move a group's extremes)
      .filter(spec.sumCols.map(c => col(s"d_${spec.sumName(c)}") =!= 0)
        .reduce(_ || _) || col("d_cnt") =!= 0L)
    val state = view.df.select((gcols ++ spec.valueNames).map(col): _*)
    val sumTypes = spec.sumCols.map(c => state.schema(spec.sumName(c)).dataType)
    val applied = delta.join(state, gcols, "left")
      .select(gcols.map(col) ++
        spec.sumCols.zip(sumTypes).map { case (c, t) =>
          val n = spec.sumName(c)
          (coalesce(col(n), lit(0)) + col(s"d_$n")).cast(t).as(n)
        } ++ Seq(
        (coalesce(col("agg_cnt"), lit(0L)) + col("d_cnt")).cast("long").as("agg_cnt")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val upserts = applied.filter(col("agg_cnt") > 0L)
      val removes = applied.filter(col("agg_cnt") === 0L).select(gcols.map(col): _*)
      commit(store, view, upserts, removes, txOf(src.manifest.id, spec, src.manifest.version))
    } finally applied.unpersist()
  }

  /** Min/max path: the diff names the TOUCHED groups; their rows (and
    * only theirs — a semi-join) re-aggregate from the source with the
    * same expressions `create` used. Unchanged recomputes are dropped by
    * a null-safe compare against the view state, so a no-op touch never
    * rewrites a file. Emptied groups (touched but absent from the
    * recompute) are removed.
    */
  private def refreshTouched(store: SnapshotStore, view: KVIndex, src: KVIndex,
                             spec: ViewSpec, v0: Long): KVIndex = {
    val srcId = src.manifest.id
    val old = new KVIndex(store, store.loadVersion(srcId, v0))
    val gcols = view.manifest.keyCols
    val srcKeyCols = src.manifest.keyCols
    val srcValueCols = src.manifest.valueCols.filterNot(_ == "version")
    val srcKeys = srcKeyCols.toSet
    val diff = old.diff(src)
    def side(c: String, s: String): Column =
      if (srcKeys.contains(c)) col(c) else col(s"${s}_$c")
    // touched = every group named by ANY diff event, BEFORE cancellation
    // (a swap preserving sum and count can still move a group's extremes,
    // so min/max views may not use the canceled-delta shortcut). Each
    // side reshapes to source names first so the spec's WHERE (if any)
    // evaluates on that side's row values — a row the predicate drops on
    // both sides touches nothing.
    def sideView(changes: Seq[String], s: String): DataFrame =
      spec.filtered(diff.filter(col("change").isin(changes: _*))
        .select((srcKeyCols ++ srcValueCols).map(c => side(c, s).as(c)): _*))
    val touched = sideView(Seq("removed", "changed"), "old")
      .select(gcols.map(col): _*)
      .unionByName(sideView(Seq("added", "changed"), "new")
        .select(gcols.map(col): _*))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val e = aggExprs(spec)
      val fresh = spec.filtered(src.df).join(touched, gcols, "left_semi")
        .groupBy(gcols.map(col): _*).agg(e.head, e.tail: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val state = view.df.select((gcols ++ spec.valueNames).map(col): _*)
        // drop no-op recomputes (null-safe compare on every maintained col)
        val stateAliased = state.select(gcols.map(col) ++
          spec.valueNames.map(n => col(n).as(s"__old_$n")): _*)
        val upserts = fresh.join(stateAliased, gcols, "left")
          .filter(!spec.valueNames.map(n => col(n) <=> col(s"__old_$n")).reduce(_ && _))
          .select((gcols ++ spec.valueNames).map(col): _*)
        // emptied groups: touched, present in the view, absent from fresh
        val removes = touched.join(state.select(gcols.map(col): _*), gcols, "left_semi")
          .join(fresh.select(gcols.map(col): _*), gcols, "left_anti")
        commit(store, view, upserts, removes, txOf(srcId, spec, src.manifest.version))
      } finally fresh.unpersist()
    } finally touched.unpersist()
  }

  private def commit(store: SnapshotStore, view: KVIndex,
                     upserts: DataFrame, removes: DataFrame, tx: String): KVIndex = {
    // one job decides BOTH emptiness probes (a union of the two limit-1
    // scans over the caller-persisted deltas) — the former isEmpty pair
    // cost two driver round trips per refresh
    val present = upserts.limit(1).select(lit("u").as("side"))
      .unionByName(removes.limit(1).select(lit("r").as("side")))
      .collect().map(_.getString(0)).toSet
    val cmds = Seq(
      if (present("u")) Some(Command.Insert(upserts, upsert = true)) else None,
      if (present("r")) Some(Command.Remove(removes)) else None).flatten
    if (cmds.isEmpty) view
    // recordHistory: see create — refresh commits are dual-stamped too
    else new KVIndex(store, view.execute(cmds, tx, recordHistory = true).orThrow)
  }

  /** Per-group net deltas from a [[KVIndex.diff]] frame: each diff row
    * contributes a removal event at its OLD group and/or an addition at
    * its NEW group (so rows MIGRATING between groups just work), one
    * `d_<sum>` per sum column plus `d_cnt` — several value columns ride
    * the same two-event union and single aggregate.
    */
  private def groupDeltas(diff: DataFrame, groupCols: Seq[String],
                          spec: ViewSpec, srcKeyCols: Seq[String],
                          srcValueCols: Seq[String]): DataFrame = {
    val srcKeys = srcKeyCols.toSet
    def sideCol(c: String, side: String): Column =
      if (srcKeys.contains(c)) col(c) else col(s"${side}_$c")
    // each side is first reshaped to SOURCE column names so the spec's
    // WHERE (if any) evaluates on that side's row values — an old row
    // that passed it contributes its removal, a new row that passes it
    // its addition, rows it drops contribute nothing; Catalyst's column
    // pruning drops the unreferenced side columns again
    def events(side: String, changes: Seq[String], sign: Int) = {
      val sideView = diff.filter(col("change").isin(changes: _*))
        .select((srcKeyCols ++ srcValueCols).map(c => sideCol(c, side).as(c)): _*)
      spec.filtered(sideView)
        .select(groupCols.map(col) ++
          spec.sumCols.map(c =>
            (lit(sign) * coalesce(col(c), lit(0))).as(s"d_${spec.sumName(c)}")) ++ Seq(
          lit(sign.toLong).as("d_cnt")): _*)
    }
    events("old", Seq("removed", "changed"), -1)
      .unionByName(events("new", Seq("added", "changed"), 1))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col(s"d_${spec.sumName(spec.sumCols.head)}")).as(s"d_${spec.sumName(spec.sumCols.head)}"),
        (spec.sumCols.tail.map(c =>
          sum(col(s"d_${spec.sumName(c)}")).as(s"d_${spec.sumName(c)}")) :+
          sum(col("d_cnt")).as("d_cnt")): _*)
  }
}
