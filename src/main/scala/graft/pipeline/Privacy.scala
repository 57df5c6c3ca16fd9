package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-preserving release helpers — the k-anonymity suppression rule
  * (Sweeney 2002) every aggregate data release applies before leaving a
  * governed boundary: a group of quasi-identifiers is only published if
  * at least `k` individuals share it; smaller groups are coalesced into
  * one suppressed bucket so their members stay indistinguishable.
  */
object Privacy {

  /** Aggregate `df` by `quasiCols` (count + exact-cents sum of `valCol`);
    * groups with fewer than `k` rows collapse into a single `*` row.
    *
    * Plan shape: ONE map-side-combined aggregate to quasi-group grain,
    * then a group-count split — the raw table is scanned once, and the
    * suppressed-bucket fold runs over the (small) aggregate, not the
    * data. Returns (quasiCols..., n_rows, cents_sum) with the suppressed
    * bucket's quasi columns all `*`.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int,
                 valCol: String): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1)
    // quasi columns release as strings so the suppressed bucket's `*`
    // marker types uniformly regardless of the source column types
    val agg = df.groupBy(quasiCols.map(c => col(c).cast("string").as(c)): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(floor(col(valCol) * 100 + 0.5).cast("long")).as("cents_sum"))
    val kept = agg.filter(col("n_rows") >= k)
    val suppressed = agg.filter(col("n_rows") < k)
      .select(quasiCols.map(c => lit("*").as(c)) ++
        Seq(col("n_rows"), col("cents_sum")): _*)
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("cents_sum")).as("cents_sum"))
      // an empty suppressed set publishes nothing (not a zero row)
      .filter(col("n_rows") > 0)
    kept.unionByName(suppressed)
  }
}
