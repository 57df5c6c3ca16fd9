package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval quality metrics — MRR, recall@k and nDCG@k per query —
  * the evaluation loop every retrieval stack (BM25 [[TextAnalysis.bm25]],
  * hybrid RRF, ANN search) runs against its relevance judgments
  * (trec_eval's core metric set, distributed).
  *
  * Engine-portable by the repo's integer-quantization discipline:
  *  - MRR: `floor(1e9 / first_relevant_rank)` — pure integer/exact ops;
  *  - recall@k: `floor(1e9 · hits / n_rel)`;
  *  - nDCG@k: DCG is an exact integer sum of PRE-QUANTIZED literal
  *    discounts `D(r) = floor(1e9 / log2(r+1))` (the only transcendental
  *    is evaluated ONCE, driver-side, into the [[discountMicro]] literal
  *    table that both the plan and any SQL oracle embed verbatim), IDCG
  *    the prefix sum of the same literals, and the ratio is two
  *    correctly-rounded double ops — so every metric hash-matches an
  *    independent engine bit for bit.
  *
  * Scale shape: the per-query top-k runs through the rank-filter pattern
  * Spark plans as WindowGroupLimit (partial top-k per partition before the
  * one shuffle on query_id); qrels join is a hash join on (query, doc);
  * the discount table is a k-row broadcast. Queries with no relevant
  * documents are excluded (IDCG undefined — trec_eval drops them too).
  */
object RetrievalEval {

  /** `floor(1e9 / log2(r+1))` for ranks 1..maxRank — THE metric-defining
    * constants (computed once; embedded as literals everywhere).
    */
  def discountMicro(maxRank: Int): Seq[(Int, Long)] =
    (1 to maxRank).map(r =>
      r -> math.floor(1e9 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** SQL `(VALUES ...)` body of the discount table, for oracle parity. */
  def discountValuesSql(maxRank: Int): String =
    discountMicro(maxRank).map { case (r, d) => s"($r, $d)" }.mkString(", ")

  /** @param runs  (queryCol, docCol, scoreCol) candidate rankings
    * @param qrels (queryCol, docCol) binary relevance judgments
    * @return (queryCol, n_rel, mrr_micro, recall_micro, ndcg_micro),
    *         one row per judged query
    */
  def evaluate(runs: DataFrame, qrels: DataFrame, k: Int = 10,
               queryCol: String = "query_id", docCol: String = "doc_id",
               scoreCol: String = "score"): DataFrame = {
    require(k >= 1)
    val spark = runs.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(docCol).asc)
    val topk = runs
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k) // rank-filter → WindowGroupLimit
      .select(col(queryCol), col(docCol), col("__r"))
    val nRel = qrels.groupBy(col(queryCol)).agg(count(lit(1)).as("n_rel"))
    val disc = discountMicro(k).toDF("__r", "__d")
    val hits = topk.join(qrels.select(col(queryCol), col(docCol)).distinct(),
        Seq(queryCol, docCol))
      .join(broadcast(disc), Seq("__r"))
      .groupBy(col(queryCol))
      .agg(min(col("__r")).as("__fr"), count(lit(1)).as("__h"),
        sum(col("__d")).as("__dcg"))
    // IDCG = prefix sums of the same literal discounts, keyed by
    // min(n_rel, k) — a k-row broadcast lookup
    val prefix = {
      var acc = 0L
      discountMicro(k).map { case (r, d) => acc += d; (r.toLong, acc) }
    }.toDF("__nr", "__idcg")
    nRel
      .withColumn("__nr", least(col("n_rel"), lit(k.toLong)))
      .join(broadcast(prefix), Seq("__nr"))
      .join(hits, Seq(queryCol), "left")
      .select(col(queryCol), col("n_rel"),
        coalesce(floor(lit(1e9) / col("__fr")), lit(0L)).cast("long").as("mrr_micro"),
        coalesce(floor(lit(1e9) * col("__h") / col("n_rel")), lit(0L))
          .cast("long").as("recall_micro"),
        coalesce(floor((lit(1e6) * col("__dcg")) / col("__idcg")), lit(0L))
          .cast("long").as("ndcg_micro"))
  }
}
