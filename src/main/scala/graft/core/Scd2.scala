package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) materialization of an index's
  * VERSION HISTORY: one row per (key, value incarnation) with the
  * half-open version interval `[valid_from, valid_to)` it was current
  * in (`valid_to` null = still current) — the audit/"as-of any time"
  * table a warehouse keeps next to a mutating dimension, derived here
  * from the store's own snapshots instead of hand-maintained triggers.
  *
  * Reference analogue: the temporal surface (`TemporalIndex` floor
  * lookups) answers "state AT version v"; this answers the transposed
  * question "every state each key has ever had, with validity" in one
  * relational pass.
  *
  * Scale shape: the walk is consecutive [[KVIndex.diff]]s, so each step
  * costs O(data CHANGED in that step) — COW-shared files never read —
  * and the assembled event table is churn-sized, never versions×table.
  * Interval assembly is ONE key-partitioned window (`lead` over the
  * per-key event sequence): an incarnation opened at v closes at the
  * key's next event version, whether that's a re-write (`changed`
  * opens the successor) or a `removed` tombstone. The version stamp
  * column is excluded from change detection (COW file rewrites of
  * payload-identical rows cancel inside diff), so intervals reflect
  * actual value changes only.
  */
object Scd2 {

  /** @param versions the committed versions to walk, oldest first;
    *                 defaults to the store's recorded history for `id`.
    */
  def scd2(store: SnapshotStore, id: String,
           versions: Seq[Long] = Nil): DataFrame = {
    val vs =
      if (versions.nonEmpty) versions
      else store.historyLog(id).map(_._2).distinct.sorted
    require(vs.nonEmpty, s"scd2: no versions recorded for '$id'")
    require(vs == vs.distinct.sorted, "scd2: versions must be ascending")
    def openIx(v: Long) = new KVIndex(store, store.loadVersionLazy(id, v))
    val first = openIx(vs.head)
    val kcols = first.manifest.keyCols
    val vals = first.manifest.valueCols.filterNot(_ == "version")
    // the v₀ snapshot opens every key's first incarnation
    val init = first.df.select(
      kcols.map(col) ++ vals.map(col) :+
        lit(vs.head).as("__v") :+ lit("o").as("__t"): _*)
    val steps = vs.sliding(2).collect { case Seq(a, b) =>
      val d = openIx(a).diff(openIx(b))
      val opens = d.filter(col("change").isin("added", "changed"))
        .select(kcols.map(col) ++ vals.map(c => col(s"new_$c").as(c)) :+
          lit(b).as("__v") :+ lit("o").as("__t"): _*)
      // tombstones carry the old values (dropped after the window —
      // they only need to SORT into the key's event sequence)
      val closes = d.filter(col("change") === "removed")
        .select(kcols.map(col) ++ vals.map(c => col(s"old_$c").as(c)) :+
          lit(b).as("__v") :+ lit("c").as("__t"): _*)
      opens.union(closes)
    }.toSeq
    val events = (init +: steps).reduce(_ union _)
    val w = Window.partitionBy(kcols.map(col): _*).orderBy(col("__v"))
    events
      .withColumn("valid_to", lead(col("__v"), 1).over(w))
      .filter(col("__t") === "o")
      .select(kcols.map(col) ++ vals.map(col) :+
        col("__v").as("valid_from") :+ col("valid_to"): _*)
  }

  /** Point-in-time enrichment: each fact row gets the dimension values
    * that were current AT `facts(versionCol)` — a LEFT join on key
    * equality plus interval membership (`valid_from ≤ v < valid_to`,
    * open-ended intervals match everything from `valid_from` on).
    * Facts probing before a key existed, inside a removal gap, or at an
    * unknown key keep null dimension columns.
    *
    * Scale shape: the join key is the EQUALITY key (hash join,
    * broadcastable dimension); the interval predicate rides along as a
    * join residual over the handful of incarnations each key has — no
    * band join, no per-version dimension copies.
    */
  def asOf(dim: DataFrame, facts: DataFrame, keyCols: Seq[String],
           versionCol: String): DataFrame = {
    val f = facts.alias("__f")
    val d = dim.alias("__d")
    val v = col(s"__f.$versionCol")
    val cond = keyCols.map(k => col(s"__f.$k") === col(s"__d.$k"))
      .reduce(_ && _) &&
      col("__d.valid_from") <= v &&
      (col("__d.valid_to").isNull || v < col("__d.valid_to"))
    val dimVals = dim.columns.toSeq
      .filterNot(c => keyCols.contains(c) || c == "valid_from" || c == "valid_to")
    f.join(d, cond, "left")
      .select(facts.columns.toSeq.map(c => col(s"__f.$c")) ++
        dimVals.map(c => col(s"__d.$c")): _*)
  }
}
