package graft.pipeline

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** End-to-end training-corpus cleaning: the composition a 100 TB data
  * pipeline actually runs, as one operator —
  *
  *   quality signals → quality floor → exact dedup → near-dedup
  *   (MinHash+LSH, keep the lowest id of each near-dup cluster) →
  *   language filter → per-stage counts.
  *
  * Plan shape: the per-row stages are one projection pass; the dedup
  * stages are the shuffle-minimal operators of [[graft.dedup.Dedup]];
  * near-dup clustering is the full transitive closure
  * ([[graft.dedup.Dedup.clusters]] min-label propagation).
  */
object CleanCorpus {

  final case class Stats(input: Long, afterQuality: Long, afterExact: Long,
                         afterNearDup: Long, afterLang: Long)

  def apply(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
            minQuality: Double = 0.2, nearDupThreshold: Double = 0.8,
            keepLangs: Seq[String] = Seq("en")): (DataFrame, Stats) = {
    // input / after-quality counts ride as OBSERVED metrics on the plan and
    // are collected during the first action that materializes `exact` — no
    // dedicated count() jobs, and in particular no extra full scan of the
    // corpus just to size the input (at 100 TB that scan is the pipeline's
    // single most expensive job). Caveat: observed metrics are accumulator
    // sums, so a partition computed twice within that action (speculative
    // task, executor loss) can overcount these two INFORMATIONAL stats;
    // the survivor DataFrames themselves are unaffected.
    val obsIn = org.apache.spark.sql.Observation()
    val obsQ = org.apache.spark.sql.Observation()

    // 1. quality floor (one codegen'd projection pass)
    val scored = TextAnalysis.qualityScore(
      docs.observe(obsIn, F.count(F.lit(1)).as("n")), textCol)
    val q = scored.filter(col("quality") >= minQuality)
      .observe(obsQ, F.count(F.lit(1)).as("n")).cache()

    // 2. exact dedup (hash groupBy — bodies never shuffle)
    val exact = Dedup.exactSurvivors(q, idCol, textCol).cache()
    val nE = exact.count()
    val input = obsIn.get("n").asInstanceOf[Long]
    val nQ = obsQ.get("n").asInstanceOf[Long]

    // 3. near-dedup with transitive clustering: keep min(id) per connected
    //    near-dup cluster (min-label propagation over candidate pairs)
    val near = Dedup.nearDupSurvivors(exact, idCol, textCol, nearDupThreshold).cache()
    val nN = near.count()

    // 4. language filter (predicted language, not the metadata column)
    val lang = TextAnalysis.languageId(near, textCol)
      .filter(col("pred_lang").isin(keepLangs: _*))
    val nL = lang.count()

    // 3 actions total (was 5): nE forces q+exact caches and harvests the
    // observed input/quality counts; nN runs the LSH+clustering; nL the
    // language pass over the near-dedup survivors.
    q.unpersist(); exact.unpersist(); near.unpersist()
    (lang, Stats(input, nQ, nE, nN, nL))
  }
}
