package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch time-series utilities over event streams — the resample /
  * gap-fill shape every metrics or sensor pipeline needs before
  * downstream modeling (SQL:2016's "gap filling" with
  * last-observation-carried-forward interpolation).
  */
object TimeSeries {

  /** Bucket `tsCol` into `bucketMs` bins per key, sum `valCol` (in exact
    * integer cents — the repo's portable-double discipline), then fill
    * every EMPTY bin between each key's first and last observation with
    * the last observed value (LOCF) and flag it `was_gap`.
    *
    * Plan shape: one map-side-combined aggregate to (key, bin) grain —
    * the only pass over the raw events; the bin spine is generated
    * per key with `sequence` + `explode` from the key's own [min,max]
    * bin span (spine rows = span buckets, independent of event count);
    * the LOCF fill is one ordered window per key. At 100 TB the spine
    * dominates only if spans are huge relative to activity — cap with a
    * coarser `bucketMs`, or pre-split multi-year spans; the raw event
    * table is never re-scanned either way.
    *
    * Returns (keyCol, bin, filled_cents, was_gap); `bin` is
    * `floor(epoch_ms / bucketMs)` so any engine reproduces it exactly.
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              bucketMs: Long): DataFrame = {
    require(bucketMs >= 1)
    val bucketed = df
      .withColumn("__bin", floor(unix_millis(col(tsCol)) / bucketMs).cast("long"))
      .groupBy(col(keyCol), col("__bin"))
      .agg(sum(floor(col(valCol) * 100 + 0.5).cast("long")).as("__cents"))
    val spine = bucketed.groupBy(col(keyCol))
      .agg(min(col("__bin")).as("__lo"), max(col("__bin")).as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"))).as("__bin"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__bin"))
    spine.join(bucketed, Seq(keyCol, "__bin"), "left")
      .withColumn("filled_cents", last(col("__cents"), ignoreNulls = true).over(w))
      .withColumn("was_gap", col("__cents").isNull)
      .select(col(keyCol), col("__bin").as("bin"), col("filled_cents"), col("was_gap"))
  }
}
