package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable non-equi band join: all row pairs whose event times lie within
  * `bandMs` of each other.
  *
  * A naive `a JOIN b ON abs(a.ts - b.ts) <= W` has no equi-key, so Spark
  * plans a broadcast-nested-loop / cartesian product — quadratic and
  * undistributable at scale. This operator converts the band predicate
  * into an equi-join: bucket the time axis at the band width
  * (`floor(ms / W)`), explode ONE side into its bucket ± 1 (a fixed 3×
  * row expansion), hash-join on the bucket (plus any `keys` columns), and
  * apply the exact band predicate after the join. Any in-band pair differs
  * by at most one bucket, so each qualifying pair is found exactly once;
  * the id inequality keeps one orientation per pair.
  *
  * Plan shape: one shuffle on (keys, bucket) for both sides — the standard
  * distributed interval-join layout (the same trick Structured Streaming's
  * stream-stream interval join and Flink's window join use internally).
  * Bucket occupancy is data-density × band, independent of total size, so
  * the join stays balanced at any scale; a hot (keys, bucket) cell is
  * handled like any skewed equi-join (AQE skew split / salting).
  *
  * Output columns: `keys` as-is, every other column twice with `a_` / `b_`
  * prefixes, plus `a_ms` / `b_ms` epoch-millis.
  */
object RangeJoin {

  def bandJoin(df: DataFrame, idCol: String, tsCol: String, bandMs: Long,
               keys: Seq[String] = Nil): DataFrame = {
    require(bandMs > 0)
    val base = df
      .withColumn("ms", unix_millis(col(tsCol)))
      .drop(tsCol)
      .withColumn("__bucket", floor(col("ms") / bandMs))
    def prefixed(p: String, d: DataFrame): DataFrame =
      d.columns.foldLeft(d) { (acc, c) =>
        if (keys.contains(c) || c == "__bucket") acc
        else acc.withColumnRenamed(c, s"${p}_$c")
      }
    val a = prefixed("a", base)
    val b = prefixed("b", base
      .withColumn("__probe",
        explode(array(col("__bucket") - 1, col("__bucket"), col("__bucket") + 1)))
      .drop("__bucket")
      .withColumnRenamed("__probe", "__bucket"))
    a.join(b, keys :+ "__bucket")
      .filter(col(s"a_$idCol") < col(s"b_$idCol") &&
        abs(col("a_ms") - col("b_ms")) <= bandMs)
      .drop("__bucket")
  }
}
