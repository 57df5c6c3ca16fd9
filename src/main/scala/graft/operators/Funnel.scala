package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel conversion analysis over an event stream: how many
  * users performed step₁, then step₂ AFTER it, then step₃ … all within
  * `windowMs` of their FIRST step₁ — the product-analytics staple
  * (strictly-ordered funnel with a conversion window, earliest-entry
  * semantics).
  */
object Funnel {

  /** @return one row per step: (step_no, step, users_reached,
    *         conversion_micro) where conversion is vs step₁ reachers in
    *         exact integer micro-units.
    *
    * Plan shape: step k is ONE hash join of the step-k event slice (a
    * heavily filtered scan) against the step-(k-1) reacher table keyed by
    * user, followed by a per-user min — k-1 joins total for a k-step
    * funnel, each moving only (user, ts) pairs for users still in the
    * funnel (monotonically shrinking). No per-user event-list collection,
    * no window over the raw stream — at 100 TB the funnel tables are
    * user-cardinality-sized, never event-sized.
    */
  def conversions(events: DataFrame, steps: Seq[String], windowMs: Long,
                  userCol: String = "user_id", tsCol: String = "ts",
                  typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2)
    val spark = events.sparkSession
    import spark.implicits._
    val ms = unix_millis(col(tsCol))
    // earliest step-1 entry per user opens that user's window
    var reach = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(ms).as("__t"))
      .withColumn("__open", col("__t"))
    val counts = Seq.newBuilder[(Int, String, Long)]
    counts += ((1, steps.head, reach.count()))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      reach = events.filter(col(typeCol) === step)
        .select(col(userCol), ms.as("__e"))
        .join(reach, Seq(userCol))
        .filter(col("__e") > col("__t") &&
          col("__e") <= col("__open") + windowMs)
        .groupBy(col(userCol))
        .agg(min(col("__e")).as("__t"), first(col("__open")).as("__open"))
      counts += ((i + 1, step, reach.count()))
    }
    val all = counts.result()
    val base = all.head._3
    all.map { case (no, step, n) =>
      (no.toLong, step, n, if (base == 0) 0L else math.floorDiv(1000000L * n, base))
    }.toDF("step_no", "step", "users_reached", "conversion_micro")
  }

  /** Frequent event paths: each user's events in (time, id) order form a
    * sequence; every length-`n` contiguous subsequence of event types is
    * a path, and the corpus's top-`k` paths by occurrence are returned
    * (count desc, path asc — fully deterministic).
    *
    * Plan shape: ONE per-user aggregate collects the (ms, id, type)
    * triples and sorts them locally (per-user sequences are session-sized,
    * not corpus-sized), one shingle explode, one map-side-combined count,
    * and a top-k — the clickstream "what do users do next" staple.
    */
  def topPaths(events: DataFrame, n: Int = 3, k: Int = 20,
               userCol: String = "user_id", tsCol: String = "ts",
               typeCol: String = "event_type",
               idCol: String = "event_id"): DataFrame = {
    require(n >= 2 && k >= 1)
    events
      .select(col(userCol),
        struct(unix_millis(col(tsCol)).as("ms"), col(idCol).as("id"),
          col(typeCol).as("t")).as("__e"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("__e"))).as("__evs"))
      .select(expr("transform(__evs, e -> e.t)").as("__types"))
      .filter(size(col("__types")) >= n)
      .select(explode(graft.functions.functions.shingles(col("__types"), n)).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("path").asc)
      .limit(k)
  }
}
