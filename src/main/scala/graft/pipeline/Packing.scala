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

  /** Global budget cut — "take the first `budget` units of the
    * (deterministically) shuffled corpus": selects every document whose
    * RUNNING size total, in the canonical hash-shuffle order
    * ([[Sampling.hashMod]] position, id tiebreak), stays within `budget`.
    * The standard "assemble exactly N tokens of training data" step.
    *
    * A naive running total is a global sort + single-reducer window; this
    * is the scalable two-pass prefix scan instead: (1) documents land in
    * `nBuckets` ORDER-PRESERVING position buckets (bucket = pos / width,
    * so bucket i's positions all precede bucket i+1's); per-bucket sums —
    * `nBuckets` rows total, at any corpus size — produce each bucket's
    * starting offset via a tiny single-partition window; (2) the running
    * total WITHIN each bucket is a partitioned window, all buckets in
    * parallel, plus the broadcast offset. No global sort, no
    * single-reducer scan of the data.
    */
  def headByBudget(df: DataFrame, idCol: String, sizeCol: String,
                   budget: Long, nBuckets: Int = 256): DataFrame = {
    require(budget > 0 && nBuckets > 0)
    val width = (1L << 32) / nBuckets
    val pos = Sampling.hashMod(col(idCol), 1L << 32)
    val bucketed = df.withColumn("__pos", pos)
      .withColumn("__b", (col("__pos") / width).cast("int"))
    val offsets = bucketed.groupBy("__b")
      .agg(sum(col(sizeCol)).as("__bs"))
      .withColumn("__off", coalesce(
        sum(col("__bs")).over(Window.orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__b", "__off")
    val run = Window.partitionBy(col("__b"))
      .orderBy(col("__pos"), col(idCol))
    bucketed.join(broadcast(offsets), Seq("__b"))
      .withColumn("__run", col("__off") + sum(col(sizeCol)).over(run))
      .filter(col("__run") <= budget)
      .drop("__b", "__pos", "__off", "__run")
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
