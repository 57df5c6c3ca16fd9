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

  /** Step-to-step conversion LATENCY for an ordered funnel: for each
    * adjacent step pair, how long converting users took (count, exact
    * median and max, in ms) — the "where does the funnel stall"
    * companion to [[conversions]], same earliest-entry window
    * semantics: step k's time is the user's EARLIEST qualifying step-k
    * event inside the window their first step-1 opened.
    *
    * @return (step_no, from_step, to_step, n_users, p50_ms, max_ms),
    *         one row per adjacent pair.
    *
    * Plan shape: the same monotonically-shrinking user-keyed reacher
    * fold as [[conversions]] (k−1 joins of filtered event slices,
    * user-cardinality tables), then per pair one user-keyed join of two
    * reacher tables + a bounded aggregate; `percentile_disc` is exact
    * and engine-portable (the pplBuckets precedent).
    */
  def stepLatencies(events: DataFrame, steps: Seq[String], windowMs: Long,
                    userCol: String = "user_id", tsCol: String = "ts",
                    typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2)
    val spark = events.sparkSession
    import spark.implicits._
    val ms = unix_millis(col(tsCol))
    var reach = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(ms).as("__t"))
      .withColumn("__open", col("__t"))
    val reaches = Seq.newBuilder[DataFrame]
    reaches += reach
    steps.drop(1).foreach { step =>
      reach = events.filter(col(typeCol) === step)
        .select(col(userCol), ms.as("__e"))
        .join(reach, Seq(userCol))
        .filter(col("__e") > col("__t") &&
          col("__e") <= col("__open") + windowMs)
        .groupBy(col(userCol))
        .agg(min(col("__e")).as("__t"), first(col("__open")).as("__open"))
      reaches += reach
    }
    val rs = reaches.result()
    val parts = rs.sliding(2).zipWithIndex.collect { case (Seq(a, b), i) =>
      a.select(col(userCol), col("__t").as("__ta"))
        .join(b.select(col(userCol), col("__t").as("__tb")), Seq(userCol))
        .select((col("__tb") - col("__ta")).as("__d"))
        .agg(count(lit(1)).as("n_users"),
          // Spark's percentile_disc yields DOUBLE; ms diffs are exact
          // integers well under 2^53, so the round-trip cast is lossless
          expr("cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY __d) as bigint)")
            .as("p50_ms"),
          max(col("__d")).as("max_ms"))
        .select(lit((i + 1).toLong).as("step_no"),
          lit(steps(i)).as("from_step"), lit(steps(i + 1)).as("to_step"),
          col("n_users"), col("p50_ms"), col("max_ms"))
    }.toSeq
    parts.reduce(_ unionByName _)
  }

  /** Cohort retention matrix: users are grouped by the week of their
    * FIRST event (their cohort), and each cohort's share of users still
    * active `k` weeks later is reported — the product-analytics
    * retention triangle. Weeks are Monday-truncated calendar weeks so
    * the bucketing is engine-portable; retention is exact integer
    * micro-units vs the cohort's week-0 size (every cohort member is by
    * construction active in week 0).
    *
    * @return (cohort_week DATE, week_offset, active_users,
    *         retention_micro), one row per (cohort, offset) with ≥1
    *         active user.
    *
    * Plan shape: the raw event table is scanned ONCE, into the distinct
    * (user, week) table (map-side combined, user-week-sized, never
    * event-sized); cohorts are a second aggregate over THAT table
    * (min week per user), so everything after the first exchange is
    * user-cardinality — the cheapest possible shape at 100 TB.
    */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    val week = to_date(date_trunc("week", col(tsCol)))
    val active = events.select(col(userCol), week.as("__w")).distinct()
    val cohorts = active.groupBy(col(userCol))
      .agg(min(col("__w")).as("cohort_week"))
    val sized = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("__size"))
    active.join(cohorts, Seq(userCol))
      .groupBy(col("cohort_week"),
        (datediff(col("__w"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(sized, Seq("cohort_week"))
      .withColumn("retention_micro",
        expr("(1000000 * active_users) div __size"))
      .select("cohort_week", "week_offset", "active_users", "retention_micro")
  }

  /** First-order Markov transition matrix over the event stream: for
    * each user, events in (time, id) order form a chain, and every
    * consecutive (from → to) type pair is counted; the transition
    * probability is exact integer micro-units of the from-state's total
    * outgoing count — "given a click, what happens next" as one table.
    *
    * @return (from_type, to_type, n_transitions, prob_micro), every
    *         observed pair.
    *
    * Plan shape: ONE event-sized shuffle (by user, for the lag window —
    * transitions within a user are meaningless across partitions),
    * carrying only (user, ms, id, type) — raw payload columns are
    * pruned before the exchange. Everything downstream is map-side
    * combined to |event-type-vocabulary|²-sized tables: the pair count,
    * the totals aggregate, and their join.
    */
  def transitions(events: DataFrame, userCol: String = "user_id",
                  tsCol: String = "ts", typeCol: String = "event_type",
                  idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col("__ms"), col(idCol))
    val pairs = events
      .select(col(userCol), unix_millis(col(tsCol)).as("__ms"),
        col(idCol), col(typeCol).as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n_transitions")).as("__total"))
    pairs.join(totals, Seq("from_type"))
      .withColumn("prob_micro",
        expr("(1000000 * n_transitions) div __total"))
      .select("from_type", "to_type", "n_transitions", "prob_micro")
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
