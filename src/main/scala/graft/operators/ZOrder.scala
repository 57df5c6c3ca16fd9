package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-dimensional file pruning.
  *
  * A 100 TB table sorted linearly on ONE column gives file-level min/max
  * stats that prune scans on that column only; a query filtering on the
  * OTHER column reads everything. Interleaving the bits of two columns and
  * range-partitioning + sorting on the interleaved value clusters rows so
  * every file covers a small RECTANGLE of the (a, b) space — min/max stats
  * become selective on BOTH columns at once, which is the layout trick
  * behind Delta/Iceberg `ZORDER BY` re-expressed as plain Spark operators.
  *
  * The z-value itself is pure integer bit math — a sum of shifted bit
  * tests — so any engine replays it exactly; [[zSql]] emits the unrolled
  * ANSI expression the DuckDB oracle runs.
  */
object ZOrder {

  /** Bit-interleave of two non-negative values confined to `bits` low bits
    * each: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * A codegen'd projection — no shuffle.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31)
    val am = pmod(a.cast("long"), lit(1L << bits))
    val bm = pmod(b.cast("long"), lit(1L << bits))
    (0 until bits).map { i =>
      shiftright(am, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(bm, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The same interleave as portable SQL over column expressions `a`, `b`
    * (already confined to non-negative < 2^bits by the caller).
    */
  def zSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Cluster `df` into `numFiles` z-ordered partitions: range-repartition
    * on the z-value (one sampling pass + one shuffle — the same cost as a
    * global sort) and sort within each partition, so a per-partition
    * writer emits files whose min/max stats are tight on BOTH columns.
    * The helper column is kept as `zCol` for stats/debugging; drop it
    * before writing if the sink schema must stay unchanged.
    */
  def zorderBy(df: DataFrame, colA: String, colB: String, numFiles: Int,
               bits: Int = 16, zCol: String = "__z"): DataFrame =
    df.withColumn(zCol, zValue(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(zCol)
}
