package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per group as a real AGGREGATE, not a window.
  *
  * `row_number().over(Window.partitionBy(g).orderBy(score))` + filter — the
  * usual formulation — shuffles EVERY row to its group's partition and
  * sorts it, then throws away all but k. This Aggregator keeps a bounded
  * k-item buffer, so Spark's partial aggregation applies: each map task
  * sends at most k rows per group across the shuffle, and merges are
  * k-way list merges. At 100 TB corpora × many queries this is the
  * difference between shuffling the corpus and shuffling k·groups rows.
  *
  * Ordering: score DESC, then id ASC — ties break identically to
  * `orderBy(col(score).desc, col(id).asc)`, so results match the window
  * formulation row for row.
  */
final case class Scored(id: Long, score: Double)

class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  private def lt(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[Scored] = Nil

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = {
    if (buf.size >= k && !lt(a, buf.last)) buf
    else {
      val (before, after) = buf.span(lt(_, a))
      (before ++ (a +: after)).take(k)
    }
  }

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = {
    // k-way merge of two sorted bounded lists
    val out = Seq.newBuilder[Scored]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < x.size || j < y.size)) {
      if (j >= y.size || (i < x.size && lt(x(i), y(j)))) { out += x(i); i += 1 }
      else { out += y(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(reduction: Seq[Scored]): Seq[Scored] = reduction
  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopKAgg {
  /** Column form: `df.groupBy(g).agg(topK(3)(col("id"), col("score")))`. */
  def topK(k: Int): (Column, Column) => Column = {
    val u = udaf(new TopKAgg(k), Encoders.product[Scored])
    (id, score) => u(id, score)
  }

  /** Per-group top-k rows: (groupCol..., id, score) out, one row per
    * kept item — the drop-in for window rank + filter.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                   scoreCol: String, k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(topK(k)(col(idCol), col(scoreCol)).as("__topk"))
      .select(col(groupCol), explode(col("__topk")).as("__s"))
      .select(col(groupCol), col("__s.id").as(idCol), col("__s.score").as(scoreCol))
}
