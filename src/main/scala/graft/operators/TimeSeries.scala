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
  /** Rolling z-score anomaly detection: each (key, bucket)'s total is
    * scored against the mean/std of its TRAILING `lookback` observed
    * buckets — the standard metrics-pipeline outlier flag. Only rows with
    * a full trailing window are scored (no partial-window edge
    * semantics).
    *
    * Engine-exact: the window sums (Σx, Σx², n) are exact integers over
    * cents; mean, variance and z are a fixed sequence of correctly-
    * rounded double ops quantized to micro-units — so scores hash-match
    * an independent engine. Zero-variance windows are excluded (z is
    * undefined, and IEEE ±Inf would poison the quantization).
    *
    * Plan shape: one map-side-combined aggregate to bucket grain, one
    * ordered window per key over the (bucket-count-sized, not
    * event-sized) series. Returns (keyCol, bin, cents, z_micro).
    */
  def anomalies(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                bucketMs: Long, lookback: Int = 24): DataFrame = {
    require(bucketMs >= 1 && lookback >= 2)
    val bucketed = df
      .withColumn("__bin", floor(unix_millis(col(tsCol)) / bucketMs).cast("long"))
      .groupBy(col(keyCol), col("__bin"))
      .agg(sum(floor(col(valCol) * 100 + 0.5).cast("long")).as("__cents"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__bin"))
      .rowsBetween(-lookback, -1)
    bucketed
      .withColumn("__s", sum(col("__cents")).over(w))
      .withColumn("__sq", sum(col("__cents") * col("__cents")).over(w))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") === lookback)
      .withColumn("__var",
        (col("__sq") - col("__s") * col("__s") / col("__n")) / col("__n"))
      .filter(col("__var") > 0)
      .withColumn("z_micro",
        floor(lit(1e6) * ((col("__cents") - col("__s") / col("__n")) /
          sqrt(col("__var")))).cast("long"))
      .select(col(keyCol), col("__bin").as("bin"),
        col("__cents").as("cents"), col("z_micro"))
  }

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
