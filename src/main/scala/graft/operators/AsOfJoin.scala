package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the temporal lookup the
  * reference serves with per-key floor queries (`TemporalIndex.find`,
  * `TemporalIndex.scala:31-38`), generalized to joining two event sets.
  *
  * Implementation is the union+window formulation, not join→groupBy→join:
  * tag right rows 0 and left rows 1, union, then one window
  * `last_value(right value) ignore nulls` over (key, ts, tag) gives every
  * left row the latest right row at-or-before its timestamp. ONE shuffle
  * on the key — at 100 TB that's half the exchanges of the naive plan,
  * and no join explosion when a key has many right-side rows.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its latest row at-or-before is attached)
    * @param key       equi-key column name present on both sides
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param attach    columns of `right` to attach (aliased as given)
    * @param tolerance max allowed (leftTs - rightTs) in seconds; <=0 = unbounded
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, attach: Seq[String],
           tolerance: Long = 0L): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__tag", lit(1))
      .select((leftCols.map(col) :+ col("__ts") :+ col("__tag")) ++
        attach.map(a => lit(null).cast(right.schema(a).dataType).as(s"__r_$a")): _*)
    val r = right.withColumn("__ts", col(rightTs)).withColumn("__tag", lit(0))
      .select((leftCols.map(c => if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__ts") :+ col("__tag")) ++ attach.map(a => col(a).as(s"__r_$a")): _*)
    // right rows sort before left rows at equal ts (tag 0 < 1) → "at or before"
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val attached = l.unionByName(r)
      .withColumn("__r_ts", last(when(col("__tag") === 0, col("__ts")), ignoreNulls = true).over(w))
      .withColumns(attach.map(a =>
        a -> last(when(col("__tag") === 0, col(s"__r_$a")), ignoreNulls = true).over(w)).toMap)
    val within =
      if (tolerance <= 0) lit(true)
      else col("__r_ts").isNotNull &&
        (unix_millis(col("__ts")) - unix_millis(col("__r_ts"))) <= tolerance * 1000
    attached.filter(col("__tag") === 1)
      .withColumn("__keep", within)
      .select((leftCols.map(col) :+
        when(col("__keep"), col("__r_ts")).as("asof_ts")) ++
        attach.map(a => when(col("__keep"), col(a)).otherwise(lit(null)).as(a)): _*)
  }
}
