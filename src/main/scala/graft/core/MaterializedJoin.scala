package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized JOIN view over two snapshot
  * indexes — the join twin of [[MaterializedAgg]]: re-joining two corpora
  * per commit is O(corpus), but the COW diffs between the view's recorded
  * source versions and the current ones name exactly the CHANGED keys, so
  * a refresh costs O(changed keys + their covering files) on either side.
  *
  * The view is itself a [[KVIndex]]: the full inner equi-join of `a` and
  * `b` on their (positionally matched) key columns in the USING shape —
  * `a`'s key and value columns, then `b`'s value columns (names must not
  * collide; the engine `version` stamp is the VIEW's own). Because both
  * sources are key-unique, so is the view, keyed by `a`'s key columns.
  *
  * Refresh economics, step by step:
  *  1. `diff(a0, a)` and `diff(b0, b)` read only NON-SHARED files (the
  *     zip-join diff) — O(changed data), zero exchanges.
  *  2. The changed-key set K = keys of both diffs. Every view row whose
  *     key is outside K is untouched BY CONSTRUCTION (its inputs are
  *     byte-identical in shared files), so nothing else is read or
  *     rewritten.
  *  3. Fresh rows for K come from manifest-pruned slices
  *     ([[KVIndex.tableForRange]] over K's leading-key envelope, then an
  *     exact semi-join) of BOTH sources — COW clusters changes, so the
  *     envelope usually covers few files.
  *  4. No-op recomputes are dropped by a null-safe compare against the
  *     view's own (equally pruned) state — an upsert that reproduces the
  *     stored row never churns a file. Keys in the view but absent from
  *     the fresh join are removed. One atomic command batch = one view
  *     version.
  *
  * The recorded source positions ride in the view manifest's
  * `lastChangeVersion` (`mjoin:<aId>:<bId>:va<N>:vb<M>:<uuid>`), so
  * refresh knows which diffs to apply and is idempotent per source
  * version pair. A refresh where neither source moved is a no-op (same
  * index returned, no commit).
  */
object MaterializedJoin {

  private def txOf(aId: String, bId: String, va: Long, vb: Long): String =
    s"mjoin:$aId:$bId:va$va:vb$vb:${java.util.UUID.randomUUID()}"

  /** (aId, bId, va, vb) recorded in a view manifest. */
  private[graft] def sourceOf(m: SnapshotManifest): (String, String, Long, Long) =
    m.lastChangeVersion.split(":") match {
      case Array("mjoin", aId, bId, va, vb, _*)
          if va.startsWith("va") && vb.startsWith("vb") =>
        (aId, bId, va.drop(2).toLong, vb.drop(2).toLong)
      case _ => throw new IllegalStateException(
        s"${m.id} is not a MaterializedJoin view (tx='${m.lastChangeVersion}')")
    }

  /** `b`'s value columns (everything but its keys and the engine stamp). */
  private def bVals(b: KVIndex): Seq[String] =
    b.manifest.valueCols.filterNot(_ == "version")

  /** Full inner join of the two current snapshots, materialized as index
    * `viewId`. The create itself is the exchange-free co-range zip join;
    * key uniqueness of the result is structural (both sides key-unique,
    * full-key equality), so the bootstrap skips the validation pass.
    * `maxRowsPerFile` sizes the VIEW's files — it is also the refresh's
    * read grain (the changed-key envelope prunes whole view files), so a
    * view of one giant file would re-read itself on every refresh.
    */
  def create(store: SnapshotStore, viewId: String,
             a: KVIndex, b: KVIndex,
             maxRowsPerFile: Long = 1L << 19): Either[GraftError, KVIndex] = {
    val joined = a.coRangeJoin(b).drop("version")
    // recordHistory: every view lifecycle commit is dual-stamped (r20) so
    // catalog `TIMESTAMP AS OF` works on the view — see MaterializedAgg
    KVIndex.bootstrap(store, viewId, joined, a.key.cols,
      txVersion = txOf(a.manifest.id, b.manifest.id,
        a.manifest.version, b.manifest.version),
      maxRowsPerFile = maxRowsPerFile,
      validateKeys = false,
      recordHistory = true)
  }

  /** Bring the view up to `a`/`b`'s current versions by the changed-key
    * delta. No-op when neither source moved.
    */
  def refresh(store: SnapshotStore, viewId: String,
              a: KVIndex, b: KVIndex): Either[GraftError, KVIndex] =
    KVIndex.open(store, viewId).map { view =>
      val (aId, bId, va, vb) = sourceOf(view.manifest)
      require(aId == a.manifest.id && bId == b.manifest.id,
        s"view $viewId tracks ($aId, $bId), not " +
          s"(${a.manifest.id}, ${b.manifest.id})")
      if (a.manifest.version <= va && b.manifest.version <= vb) view
      else {
        val kcols = a.key.cols
        val a0 = new KVIndex(store, store.loadVersion(aId, va))
        val b0 = new KVIndex(store, store.loadVersion(bId, vb))
        // changed keys from BOTH diffs (each reads only non-shared files);
        // the diff's key columns are already coalesced/non-null
        val ka = a0.diff(a).select(kcols.map(col): _*)
        val kb = b0.diff(b).select(b.key.cols.map(col): _*).toDF(kcols: _*)
        val keys = ka.unionByName(kb).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // ONE job answers both "any changed keys?" and the envelope:
          // the diff's key columns are non-null by contract, so a null
          // min means zero rows (version bump with no data change)
          val Array(bRow) = keys
            .agg(min(col(kcols.head)).as("lo"), max(col(kcols.head)).as("hi"))
            .collect()
          if (bRow.isNullAt(0)) view
          else {
            // leading-key envelope of K → manifest-pruned slices; the
            // semi-join restores exactness inside the envelope
            val lo = bRow.get(0); val hi = bRow.get(1)
            val aSlice = a.tableForHeadRange(lo, hi).df
              .join(keys, kcols, "left_semi").drop("version")
            val bKeyed = b.tableForHeadRange(lo, hi).df
              .select((b.key.cols ++ bVals(b)).map(col): _*)
              .toDF(kcols ++ bVals(b): _*)
            val fresh = aSlice.join(bKeyed, kcols, "inner")
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              val viewCols = view.manifest.keyCols ++
                view.manifest.valueCols.filterNot(_ == "version")
              val state = view.tableForHeadRange(lo, hi).df
                .join(keys, kcols, "left_semi")
                .select(viewCols.map(col): _*)
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              try {
                val valueNames = viewCols.filterNot(kcols.contains)
                val stateAliased = state.select(kcols.map(col) ++
                  valueNames.map(n => col(n).as(s"__old_$n")): _*)
                // drop no-op recomputes: an unchanged row never churns a file
                val upserts = fresh.join(stateAliased, kcols, "left")
                  .filter(!valueNames.map(n => col(n) <=> col(s"__old_$n"))
                    .reduce(_ && _))
                  .select(viewCols.map(col): _*)
                // view rows whose key lost its match (or its source row)
                val removes = state.select(kcols.map(col): _*)
                  .join(fresh.select(kcols.map(col): _*), kcols, "left_anti")
                val tx = txOf(aId, bId, a.manifest.version, b.manifest.version)
                // one job decides both emptiness probes (union of the two
                // limit-1 scans) instead of two isEmpty round trips
                val present = upserts.limit(1).select(lit("u").as("side"))
                  .unionByName(removes.limit(1).select(lit("r").as("side")))
                  .collect().map(_.getString(0)).toSet
                val cmds = Seq(
                  if (present("u")) Some(Command.Insert(upserts, upsert = true))
                  else None,
                  if (present("r")) Some(Command.Remove(removes)) else None).flatten
                if (cmds.isEmpty) view
                // dual-stamped like create — TIMESTAMP AS OF sees refreshes
                else new KVIndex(store,
                  view.execute(cmds, tx, recordHistory = true).orThrow)
              } finally state.unpersist()
            } finally fresh.unpersist()
          }
        } finally keys.unpersist()
      }
    }
}
