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

  /** Sliding-window document chunking — the other half of batch assembly:
    * long documents split into `budget`-token chunks whose starts advance
    * by `budget - overlap` tokens (chunk i covers tokens
    * `[i*step, i*step+budget)`; the final chunk may be short). A pure
    * per-row projection + explode — no shuffle, no state, linear at any
    * scale. Empty docs produce no chunks.
    */
  def chunkDocs(df: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", budget: Int = 32,
                overlap: Int = 8): DataFrame = {
    require(budget > 0 && overlap >= 0 && overlap < budget)
    val step = budget - overlap
    val tk = graft.functions.functions.ws_tokens(col(textCol))
    df.select(col(idCol), tk.as("__tk"))
      .withColumn("__n", size(col("__tk")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__tk"), col("__n"),
        explode(sequence(lit(0),
          ceil(col("__n") / lit(step.toDouble)).cast("int") - 1)).as("__c"))
      .select(col(idCol), col("__c").cast("long").as("chunk_no"),
        least(lit(budget.toLong), col("__n") - col("__c") * step)
          .cast("long").as("n_chunk_tokens"),
        element_at(col("__tk"), col("__c") * step + 1).as("head_token"))
  }
}
