package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries
import graft.pipeline.Sampling

/** Gap-fill/LOCF resample and per-domain quota capping. */
class TimeSeriesCapSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("gapFill: empty buckets carry the last value forward and flag was_gap") {
    // user 1: events in minutes 0 and 3 (bucketMs = 1 min) → bins 1,2 gap
    val df = Seq(
      (1L, ts(0), 1.00), (1L, ts(0), 0.50), (1L, ts(3), 2.00),
      (2L, ts(5), 9.99)
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.gapFill(df, "user_id", "ts", "value", bucketMs = 60000L)
      .orderBy("user_id", "bin").as[(Long, Long, Long, Boolean)].collect()
    val base = got(0)._2 // epoch-minute of 2024-01-01T00:00
    assert(got.map(r => (r._1, r._2 - base, r._3, r._4)).toSeq == Seq(
      (1L, 0L, 150L, false), (1L, 1L, 150L, true), (1L, 2L, 150L, true),
      (1L, 3L, 200L, false), (2L, 5L, 999L, false)))
  }

  test("gapFill: single-bucket keys produce one un-gapped row") {
    val df = Seq((7L, ts(1), 3.25)).toDF("user_id", "ts", "value")
    val got = TimeSeries.gapFill(df, "user_id", "ts", "value", bucketMs = 60000L)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.length == 1 && got.head._3 == 325L && !got.head._4)
  }

  test("anomalies: trailing-window z-scores, hand-computed; partial/zero-var windows excluded") {
    val df = Seq(
      (1L, ts(1), 1.00), (1L, ts(2), 2.00), (1L, ts(3), 1.00), (1L, ts(4), 4.00),
      // user 2: zero-variance trailing window → excluded
      (2L, ts(1), 1.00), (2L, ts(2), 1.00), (2L, ts(3), 9.00)
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.anomalies(df, "user_id", "ts", "value",
        bucketMs = 60000L, lookback = 2)
      .orderBy("user_id", "bin").as[(Long, Long, Long, Long)].collect().toSeq
    // user 1 bin3: mean(100,200)=150 std=50 → z=-1; bin4: z=(400-150)/50=5
    assert(got.map(r => (r._1, r._3, r._4)) == Seq(
      (1L, 100L, -1000000L), (1L, 400L, 5000000L)))
  }

  test("domainCap keeps the top-n per domain with deterministic tie-breaks") {
    val df = Seq(
      ("a", 1L, 100L), ("a", 2L, 300L), ("a", 3L, 300L), ("a", 4L, 50L),
      ("b", 5L, 10L)
    ).toDF("source", "doc_id", "n_chars")
    val got = Sampling.domainCap(df, "source", 2, "n_chars", "doc_id")
      .orderBy("doc_id").as[(String, Long, Long)].collect().toSeq
    // domain a: 300-chars docs 2 and 3 (tie → lower id first, both kept at
    // n=2); doc 1/4 dropped. domain b under quota: kept whole.
    assert(got == Seq(("a", 2L, 300L), ("a", 3L, 300L), ("b", 5L, 10L)))
  }

  test("domainCap plans as WindowGroupLimit (partial top-n before the shuffle)") {
    val df = (1L to 1000L).map(i => (s"s${i % 5}", i, i * 7 % 997))
      .toDF("source", "doc_id", "n_chars")
    val plan = Sampling.domainCap(df, "source", 3, "n_chars", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }
}
