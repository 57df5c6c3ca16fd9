package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiling — the "what is actually in this 100 TB
  * table" operator every ingest pipeline runs before anything else.
  * For every column: row count, null count, distinct count, min / max
  * (rendered deterministically), and mean string length.
  *
  * ONE aggregate job computes every column's stats from a single scan —
  * no per-column passes. Exact distinct counts use Spark's
  * multi-distinct rewrite (an Expand of n_cols replicas feeding
  * map-side partial aggregation — n_cols × |rows| intermediate rows but
  * still one scan and one shuffle); at 100 TB pass `exact = false` to
  * swap every distinct for `approx_count_distinct` (HLL++ at
  * rsd = 0.02, one buffer per column per task, no Expand) — same
  * output shape, ±2% counts.
  *
  * Rendering is pinned so the profile is engine-reproducible:
  * fractional numerics round to 4 dp and render as DECIMAL(18,4)
  * strings, integers render as-is, temporals as `yyyy-MM-dd HH:mm:ss`.
  */
object Profiler {

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val fields = df.schema.fields.toSeq
    // backtick-quote every field reference: a column name containing a
    // dot would otherwise parse as struct access (and a literal backtick
    // escapes by doubling)
    def q(n: String): Column = col("`" + n.replace("`", "``") + "`")
    def nd(c: Column): Column =
      if (exact) count_distinct(c) else approx_count_distinct(c, 0.02)
    val aggExprs = Seq(count(lit(1)).as("__rows")) ++ fields.flatMap { f =>
      val c = q(f.name)
      val (mn, mx): (Column, Column) = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          (min(c).cast(StringType), max(c).cast(StringType))
        case FloatType | DoubleType | _: DecimalType =>
          (round(min(c), 4).cast(DecimalType(18, 4)).cast(StringType),
            round(max(c), 4).cast(DecimalType(18, 4)).cast(StringType))
        case StringType => (min(c), max(c))
        case DateType | TimestampType | TimestampNTZType =>
          (date_format(min(c), "yyyy-MM-dd HH:mm:ss"),
            date_format(max(c), "yyyy-MM-dd HH:mm:ss"))
        case _ => (lit(null).cast(StringType), lit(null).cast(StringType))
      }
      val avgLen = f.dataType match {
        case StringType => round(avg(length(c)), 4)
        case _ => lit(null).cast(DoubleType)
      }
      Seq(
        count(c).as(s"__nn_${f.name}"),
        nd(c).as(s"__nd_${f.name}"),
        mn.as(s"__mn_${f.name}"),
        mx.as(s"__mx_${f.name}"),
        avgLen.as(s"__al_${f.name}"))
    }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val rows = fields.map { f =>
      struct(
        lit(f.name).as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - q(s"__nn_${f.name}")).as("n_nulls"),
        q(s"__nd_${f.name}").cast(LongType).as("n_distinct"),
        q(s"__mn_${f.name}").as("min_repr"),
        q(s"__mx_${f.name}").as("max_repr"),
        q(s"__al_${f.name}").as("avg_len"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .orderBy("column")
  }

  /** Pairwise Pearson correlation of INTEGRAL columns, every pair from
    * ONE aggregate over ONE scan (the textbook sum-of-products
    * identity): `corr = (n·Σxy − Σx·Σy) / √(n·Σxx − Σx²)·√(n·Σyy − Σy²)`.
    * All moments accumulate as EXACT `decimal(38,0)` (a per-row product
    * of two longs is ≤ 38 digits, so every sum short of 38 digits is
    * exact — `n·max(|x|)²` may exceed BIGINT freely); only the final
    * quotient runs in double (sqrt and one divide are IEEE-correctly
    * rounded — the Rocchio recipe), half-up quantized to micro-units,
    * so the whole matrix hash-matches an independent engine.
    * Zero-variance columns yield null.
    *
    * Caller contract: columns must be integral (quantize floats to
    * cents/basis-points first). Should a moment genuinely overflow 38
    * digits, decimal arithmetic raises a typed ArithmeticException under
    * ANSI mode (null under non-ANSI) — exactness-or-error, never a
    * silently wrapped matrix.
    *
    * Scale shape: `1 + 2k + k(k−1)/2` conditional sums in one map-side
    * combined aggregate; the pair explosion happens on the single
    * result row. One scan regardless of k.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2)
    val pairs = for (i <- cols.indices; j <- i + 1 until cols.size)
      yield (cols(i), cols(j))
    // Moments accumulate in DecimalType(38,0): a per-row product of two
    // longs is ≤ 38 digits (9.2e18² ≈ 8.5e37), so decimal(19,0)×decimal
    // multiplication is EXACT where a `long` accumulator would silently
    // wrap once |x|²·n crosses 2⁶³ (cents-scaled 1e7 values at 1e9 rows).
    // Should even 38 digits overflow, decimal arithmetic raises a typed
    // ArithmeticException under ANSI (null under non-ANSI) instead of
    // wrapping — exactness-or-error, never a silently wrong matrix.
    val dec = "decimal(19,0)"
    val aggs = Seq(count(lit(1)).cast("decimal(38,0)").as("__n")) ++
      cols.flatMap(c => Seq(
        sum(col(c).cast(dec)).as(s"__s_$c"),
        sum(col(c).cast(dec) * col(c).cast(dec)).as(s"__ss_$c"))) ++
      pairs.map { case (a, b) =>
        sum(col(a).cast(dec) * col(b).cast(dec)).as(s"__p_${a}_$b") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      val num = s"__n * __p_${a}_$b - __s_$a * __s_$b"
      val d1 = s"__n * __ss_$a - __s_$a * __s_$a"
      val d2 = s"__n * __ss_$b - __s_$b * __s_$b"
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col("__n").cast("long").as("n"),
        expr(s"case when ($d1) <= 0 or ($d2) <= 0 then null else " +
          s"cast(floor(1e6 * cast($num as double) / " +
          s"(sqrt(cast($d1 as double)) * sqrt(cast($d2 as double))) + 0.5) " +
          "as bigint) end").as("corr_micro"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Equi-width histogram of an INTEGRAL column (quantize floats to
    * cents/milli first — integer bin arithmetic is what makes the whole
    * histogram engine-exact): bin `i` covers
    * `[mn + i·w, mn + (i+1)·w)` with `w = (mx − mn + 1) / bins`
    * conceptually; concretely `bin = ((x − mn) · bins) div (mx − mn + 1)`,
    * always in `[0, bins)`, plus each bin's observed lo/hi/count.
    *
    * Scale shape: one 1-row min/max aggregate broadcast onto a second
    * scan's bin projection + one map-side-combined count — two scans,
    * the minimum for a data-dependent binning; no sort anywhere.
    */
  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins >= 1)
    val mm = df.agg(min(col(valueCol)).cast("long").as("__mn"),
      max(col(valueCol)).cast("long").as("__mx"))
    df.select(col(valueCol).cast("long").as("__x"))
      .filter(col("__x").isNotNull)
      .crossJoin(broadcast(mm))
      .withColumn("bin", expr(
        s"case when __mx = __mn then 0L else ((__x - __mn) * $bins) div (__mx - __mn + 1) end"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min(col("__x")).as("lo"), max(col("__x")).as("hi"))
  }
}
