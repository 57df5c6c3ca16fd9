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
}
