package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise mean of an `array<float>` column as a real AGGREGATE.
  *
  * The posexplode formulation — `posexplode(vec)` then `groupBy(g, pos)` —
  * shuffles dim × N rows: at dim=1024 the shuffle is 1024× the row count.
  * This Aggregator keeps ONE `Array[Double]` accumulator per group, so
  * partial aggregation applies: each map task sends a single dim-length
  * buffer per group across the shuffle and merges are element-wise adds.
  *
  * Sums accumulate in DOUBLE; the finished mean is cast to FLOAT, absorbing
  * last-ulp summation-order wobble exactly like the `avg(..).cast("float")`
  * it replaces — centroids stay reproducible across partitionings.
  */
final case class VecMeanBuf(sum: Array[Double], n: Long)

class VecMeanAgg extends Aggregator[Seq[Float], VecMeanBuf, Seq[Float]] {

  override def zero: VecMeanBuf = VecMeanBuf(Array.empty, 0L)

  override def reduce(b: VecMeanBuf, v: Seq[Float]): VecMeanBuf = {
    if (v == null) return b
    val s = if (b.sum.length >= v.length) b.sum
            else java.util.Arrays.copyOf(b.sum, v.length)
    var i = 0
    while (i < v.length) { s(i) += v(i); i += 1 }
    VecMeanBuf(s, b.n + 1)
  }

  override def merge(x: VecMeanBuf, y: VecMeanBuf): VecMeanBuf = {
    if (y.n == 0) return x
    if (x.n == 0) return y
    val (big, small) = if (x.sum.length >= y.sum.length) (x.sum, y.sum)
                       else (y.sum, x.sum)
    val s = java.util.Arrays.copyOf(big, big.length)
    var i = 0
    while (i < small.length) { s(i) += small(i); i += 1 }
    VecMeanBuf(s, x.n + y.n)
  }

  override def finish(b: VecMeanBuf): Seq[Float] =
    if (b.n == 0) Nil
    else {
      val out = new Array[Float](b.sum.length)
      var i = 0
      while (i < b.sum.length) { out(i) = (b.sum(i) / b.n).toFloat; i += 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }

  override def bufferEncoder: Encoder[VecMeanBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Float]] = ExpressionEncoder()
}

object VecMeanAgg {
  /** Column form: `df.groupBy(g).agg(vecMean(col("embedding")))` →
    * `array<float>` per-group element-wise mean. */
  def vecMean: Column => Column = {
    val u = udaf(new VecMeanAgg, ExpressionEncoder[Seq[Float]]())
    v => u(v)
  }
}
