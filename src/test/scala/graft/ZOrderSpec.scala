package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order layout: interleave correctness and the property the layout
  * exists for — per-partition min/max ranges stay tight on BOTH dimensions
  * (a linearly sorted layout is tight on the sort column only).
  */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("zValue interleaves bits (a even positions, b odd)") {
    val r = Seq((3L, 5L), (1L, 0L), (0L, 1L), (65535L, 0L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    // a=0b11,b=0b101 → 1 + 2 + 4 + 32 = 39
    assert(r == Seq(39L, 1L, 2L, 0x55555555L))
  }

  test("z-ordered partitions cover tight rectangles; linear sort does not") {
    // full 64×64 grid
    val grid = spark.range(0, 4096)
      .select((col("id") % 64).as("a"), (col("id") / 64).as("b"))
    def avgRanges(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("a") - min("a")).as("ra"), (max("b") - min("b")).as("rb"))
        .agg(avg("ra"), avg("rb")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (za, zb) = avgRanges(ZOrder.zorderBy(grid, "a", "b", numFiles = 16, bits = 6))
    // 16 z-partitions over a 64×64 grid ≈ 16×16 quadrants
    assert(za <= 24 && zb <= 24, s"z-order ranges ($za, $zb) not tight")
    val (la, lb) = avgRanges(
      grid.repartitionByRange(16, col("a")).sortWithinPartitions("a"))
    assert(la <= 8, s"linear layout should be tight on its sort column ($la)")
    assert(lb >= 60, s"linear layout should be WIDE on the other column ($lb)")
    assert(zb < lb / 2, "z-order must beat linear sort on the non-sort dimension")
  }
}
