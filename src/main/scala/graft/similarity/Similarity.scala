package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{functions => gf}

/** Approximate-nearest-neighbor search over an `Array[Float]` embedding
  * column.
  *
  *  - [[bruteForceTopK]] is the exact baseline: one codegen'd cosine per row
  *    + distributed top-k (`TakeOrderedAndProject`) — no shuffle of vectors,
  *    only of the k survivors per partition.
  *  - [[ivfTopK]] is the scale path: k-means-lite (deterministic seeded
  *    centroid sample, one refinement pass), assign every vector to its
  *    nearest centroid at index build; queries probe only `nProbe` cells.
  *    At 100 TB this turns a full scan into reading ~nProbe/nCells of the
  *    data, with partition pruning if the index is written partitioned by
  *    cell id.
  */
object Similarity {

  /** Exact top-k cosine neighbors of one query vector. */
  def bruteForceTopK(df: DataFrame, query: Array[Float], k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    df.select(col(idCol), gf.cosine_sim(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Exact cosine range search: every vector within cosine >= `threshold`
    * of the query — top-k's sibling when the RADIUS, not the count, is the
    * contract ("find all near-duplicates of this one"). Same scan-once,
    * no-vector-shuffle plan as [[bruteForceTopK]]; only survivors leave
    * the scan. The comparison is made on the 4-dp-rounded cosine so the
    * survivor set is reproducible across engines (raw last-ulp dot-product
    * differences cannot flip a boundary row).
    */
  def rangeSearch(df: DataFrame, query: Array[Float], threshold: Double,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    df.select(col(idCol), round(gf.cosine_sim(col(vecCol), q), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Differential-test ORACLE ONLY — window-rank formulation of batch
    * top-k. It shuffles EVERY scored row (corpus × queries) to sort each
    * query's partition, which is a scale-killer at 100 TB; the shipped
    * path is [[bruteForceTopKBatchAgg]], whose bounded aggregate sends at
    * most k rows per query per map task. Kept package-private so library
    * callers cannot reach the unbounded shuffle by accident; specs use it
    * to cross-check the Aggregator row for row.
    */
  private[graft] def windowTopKBatchOracle(corpus: DataFrame, queries: DataFrame, k: Int,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    val scored = corpus.join(broadcast(queries))
      .select(col(qIdCol), col(idCol),
        gf.cosine_sim(col(vecCol), col(qVecCol)).as("cosine"))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact top-k for MANY query vectors at once (the batch shape a training
    * pipeline actually runs): broadcast the queries, one pass over the
    * corpus, per-query top-k through the bounded
    * [[graft.operators.TopKAgg]] aggregate — partial aggregation sends at
    * most k rows per query per map task across the shuffle. The scale path.
    */
  def bruteForceTopKBatchAgg(corpus: DataFrame, queries: DataFrame, k: Int,
                             idCol: String = "vec_id", vecCol: String = "embedding",
                             qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    val scored = corpus.join(broadcast(queries))
      .select(col(qIdCol), col(idCol),
        gf.cosine_sim(col(vecCol), col(qVecCol)).as("cosine"))
    graft.operators.TopKAgg.topKPerGroup(scored, qIdCol, idCol, "cosine", k)
  }

  /** Build an IVF index: pick `nCells` deterministic seed centroids, one
    * Lloyd refinement pass, then tag every row with its nearest cell.
    * Result caches/persists as the "index"; write it partitioned by
    * `cell` for partition-pruned probes.
    */
  def ivfBuild(df: DataFrame, nCells: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): (DataFrame, Seq[Array[Float]]) = {
    // deterministic sample: smallest xxhash64(id) — reproducible, one pass
    val seeds = df.select(col(idCol), col(vecCol))
      .withColumn("h", xxhash64(col(idCol)))
      .orderBy("h").limit(nCells)
      .collect().map(_.getSeq[Float](1).toArray)
    // one refinement pass: assign to nearest seed, then element-wise mean
    // per cell via the bounded vector-sum Aggregator — ONE dim-length
    // buffer per (map task, cell) crosses the shuffle (the posexplode
    // formulation shuffled dim×N rows), and only nCells×dim floats reach
    // the driver, never whole member vectors
    val assigned0 = assign(df, seeds, idCol, vecCol)
    val comps = assigned0.groupBy(col("cell"))
      .agg(graft.operators.VecMeanAgg.vecMean(col(vecCol)).as("m"))
      .collect()
    val refined = comps.sortBy(_.getInt(0))
      .map(_.getSeq[Float](1).toArray).toSeq
    (assign(df, refined, idCol, vecCol), refined)
  }

  /** Persist an IVF index partitioned by cell: probes read only the
    * probed cells' files (partition pruning — at scale this is the whole
    * point of IVF: nProbe/nCells of the bytes).
    */
  def ivfWrite(indexed: DataFrame, path: String): Unit =
    indexed.write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Probe a stored IVF index — the cell filter prunes parquet
    * partitions before any IO.
    */
  def ivfTopKFromStore(spark: org.apache.spark.sql.SparkSession, path: String,
                       centroids: Seq[Array[Float]], query: Array[Float],
                       k: Int, nProbe: Int,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfTopK(spark.read.parquet(path), centroids, query, k, nProbe, idCol, vecCol)

  private def assign(df: DataFrame, centroids: Seq[Array[Float]],
                     idCol: String, vecCol: String): DataFrame = {
    val scores = centroids.zipWithIndex.map { case (c, i) =>
      struct(gf.cosine_sim(col(vecCol), array(c.map(lit): _*)).as("s"),
        lit(i).as("cell"))
    }
    df.withColumn("cell", array_max(array(scores: _*)).getField("cell"))
  }

  /** Symmetric int8 scalar quantization of an embedding column — the
    * standard 4× footprint cut before ANN indexing: each vector is scaled
    * by its own max-abs so codes are `floor(v / maxabs * 127 + 0.5)` in
    * [-127, 127]; zero vectors quantize to zeros. All arithmetic is DOUBLE
    * with explicit floor(x+0.5) rounding, so any engine reproduces the
    * identical codes bit-for-bit (library round() tie-breaking varies;
    * this does not). A pure projection — no shuffle, codegen'd.
    */
  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val vd = transform(col(vecCol), v => v.cast("double"))
    val ma = array_max(transform(col(vecCol), v => abs(v.cast("double"))))
    df.withColumn("__ma", ma)
      .withColumn("q",
        when(col("__ma") === 0.0, transform(vd, _ => lit(0L)))
          .otherwise(transform(vd,
            v => floor(v / col("__ma") * 127.0 + 0.5).cast("long"))))
      .withColumn("scale", col("__ma") / 127.0)
      .drop("__ma")
  }

  /** Query→cell ranking shared by the single and batch probes (double
    * arithmetic, deterministic tie-break on cell id): the best `nProbe`
    * cells by query-centroid cosine.
    */
  private def rankCells(centroids: Seq[Array[Float]], query: Array[Float],
                        nProbe: Int): Seq[Int] = {
    val nq = math.sqrt(query.map(x => x.toDouble * x).sum)
    centroids.zipWithIndex.map { case (c, i) =>
      val dot = c.zip(query).map { case (a, b) => a.toDouble * b }.sum
      val nc = math.sqrt(c.map(x => x.toDouble * x).sum)
      (if (nc == 0 || nq == 0) 0.0 else dot / (nc * nq), i)
    }.sortBy(p => (-p._1, p._2)).take(nProbe).map(_._2)
  }

  /** Probe an IVF index: rank cells by query-centroid cosine, scan only the
    * best `nProbe` cells, exact cosine inside them.
    */
  def ivfTopK(indexed: DataFrame, centroids: Seq[Array[Float]],
              query: Array[Float], k: Int, nProbe: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ranked = rankCells(centroids, query, nProbe)
    val q = array(query.map(v => lit(v)): _*)
    indexed.filter(col("cell").isin(ranked: _*))
      .select(col(idCol), gf.cosine_sim(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Probe an IVF index with MANY queries at once — the batch shape a
    * training pipeline actually runs (N lookups per stage, not one).
    * The probed cells are UNIONED across queries and the index is scanned
    * ONCE: a cell probed by m queries is still read once, its rows
    * replicated to those m queries by a broadcast join against the tiny
    * (cell, q_id) probe map — never a rescan. Per-query top-k goes through
    * the bounded [[graft.operators.TopKAgg]] aggregate, so at most k rows
    * per query per map task cross the shuffle (same scale path as
    * [[bruteForceTopKBatchAgg]]).
    *
    * `queries` is the SMALL side (same contract as the broadcast in the
    * brute-force batch): its rows are collected to rank cells per query on
    * the driver — nQueries × nCells cosine ops. The contract is ENFORCED:
    * more than `maxQueries` rows raise [[BatchTooLargeException]] instead
    * of silently OOMing the driver (same stance as `streamNearDupIngest`'s
    * `maxDriverProbes`); split a bigger batch or raise the bound knowingly.
    */
  final class BatchTooLargeException(n: Int)
    extends IllegalArgumentException(
      s"ivfTopKBatch query batch exceeds maxQueries=$n rows; " +
        "split the batch or raise maxQueries explicitly")

  def ivfTopKBatch(indexed: DataFrame, centroids: Seq[Array[Float]],
                   queries: DataFrame, k: Int, nProbe: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   qIdCol: String = "q_id", qVecCol: String = "q_vec",
                   maxQueries: Int = 65536): DataFrame = {
    val spark = indexed.sparkSession
    import spark.implicits._
    val qRows = queries.select(col(qIdCol).cast("long"), col(qVecCol))
      .limit(maxQueries + 1).collect()
    if (qRows.length > maxQueries) throw new BatchTooLargeException(maxQueries)
    val probes: Seq[(Int, Long)] = qRows.toSeq.flatMap { r =>
        val qid = r.getLong(0)
        val qv = r.getSeq[Float](1).toArray
        rankCells(centroids, qv, nProbe).map(cell => (cell, qid))
      }
    val unionCells = probes.map(_._1).distinct
    val probeDf = probes.toDF("cell", qIdCol)
    val scored = indexed.filter(col("cell").isin(unionCells: _*)) // one scan
      .join(broadcast(probeDf), Seq("cell"))
      .join(broadcast(queries.select(col(qIdCol).cast("long").as(qIdCol), col(qVecCol))),
        Seq(qIdCol))
      .select(col(qIdCol), col(idCol),
        gf.cosine_sim(col(vecCol), col(qVecCol)).as("cosine"))
    graft.operators.TopKAgg.topKPerGroup(scored, qIdCol, idCol, "cosine", k)
  }

  /** Batch probe against a cell-partitioned stored index: the unioned
    * cell filter prunes parquet partitions before any IO, so the batch
    * reads only the cells SOME query probes — at scale, ~|union of
    * probed cells|/nCells of the index bytes, once, for the whole batch.
    */
  def ivfTopKBatchFromStore(spark: org.apache.spark.sql.SparkSession, path: String,
                            centroids: Seq[Array[Float]], queries: DataFrame,
                            k: Int, nProbe: Int,
                            idCol: String = "vec_id", vecCol: String = "embedding",
                            qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame =
    ivfTopKBatch(spark.read.parquet(path), centroids, queries, k, nProbe,
      idCol, vecCol, qIdCol, qVecCol)

  /** Per-label centroid cohesion — the embedding-space cluster health
    * check (is a label's region tight or diffuse?): mean vector per label,
    * then every vector's cosine to its OWN label's centroid, aggregated to
    * per-label count / average / minimum.
    *
    * The per-dimension mean is cast to FLOAT before the cosine: a double
    * sum's last-ulp wobble across summation orders (partitionings, engines)
    * is absorbed by the float rounding, making the centroid — and the
    * downstream cosines — reproducible.
    *
    * Plan shape: centroids come from the bounded vector-sum Aggregator
    * ([[graft.operators.VecMeanAgg]]) — one dim-length buffer per
    * (map task, label) crosses the shuffle, partial aggregation applies —
    * then broadcast back; cosines are one codegen'd projection pass, then
    * the per-label aggregate. (The old posexplode formulation shuffled
    * dim × N rows — 1024× the row count at dim=1024.)
    */
  def labelCohesion(df: DataFrame, idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val centroids = df.groupBy(col(labelCol))
      .agg(graft.operators.VecMeanAgg.vecMean(col(vecCol)).as("centroid"))
    df.join(broadcast(centroids), Seq(labelCol))
      .select(col(labelCol),
        gf.cosine_sim(col(vecCol), col("centroid")).as("cos_c"))
      .groupBy(col(labelCol))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(round(col("cos_c"), 4)), 4).as("avg_cos"),
        round(min(col("cos_c")), 4).as("min_cos"))
  }
}
