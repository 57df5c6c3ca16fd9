package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing — grouping documents into fixed token-budget "packs"
  * for training-batch assembly (the standard move that turns a ragged
  * document stream into dense fixed-length training sequences).
  *
  * Packing is defined deterministically so the SAME packs come out of any
  * engine, partitioning, or retry: a document's pack is
  * `floor(startOffset / budget)` where startOffset is the running token
  * count of all earlier documents (by id) in the document's bucket —
  * contiguous-fill packing. Documents may straddle a pack boundary; the
  * consumer splits them at materialization, which keeps the assignment a
  * pure function of (bucket, id-order, token counts).
  *
  * Scale: one shuffle on the bucket key, then a running-sum window WITHIN
  * each bucket — no global sort, no single-reducer window. Buckets are
  * deterministic hash buckets of the id ([[Sampling.hashMod]]), so at
  * 100 TB you raise `nBuckets` to the desired parallelism and every bucket
  * packs independently.
  */
object Packing {

  /** Adds `bucket` and `pack_id` to `df`. `tokensCol` is the per-document
    * token count (see `TextAnalysis.tokenStats`).
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, nBuckets: Int): DataFrame = {
    require(budget > 0 && nBuckets > 0)
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bucket", Sampling.hashMod(col(idCol), nBuckets))
      .withColumn("pack_id",
        floor(coalesce(sum(col(tokensCol)).over(w), lit(0L)) / budget))
  }
}
