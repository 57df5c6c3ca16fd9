package graft

import java.sql.Timestamp

import graft.operators.Funnel
import graft.pipeline.Privacy

/** k-anonymity suppression and frequent-path mining. */
class PrivacyPathsSpec extends SparkSuite {
  import spark.implicits._

  test("kAnonymize keeps big groups, folds small ones into one '*' bucket") {
    val df = (Seq.fill(5)(("us", "auto", 1.0)) ++ Seq.fill(3)(("fr", "auto", 2.0)) ++
      Seq(("de", "bike", 4.5))).toDF("nation", "segment", "bal")
    val got = Privacy.kAnonymize(df, Seq("nation", "segment"), k = 4, "bal")
      .orderBy("nation").as[(String, String, Long, Long)].collect().toSeq
    // fr(3) + de(1) suppressed together: 4 rows, 600 + 450 cents
    assert(got == Seq(("*", "*", 4L, 1050L), ("us", "auto", 5L, 500L)))
  }

  test("kAnonymize with nothing to suppress emits no '*' row") {
    val df = Seq.fill(4)(("us", "auto", 1.0)).toDF("nation", "segment", "bal")
    val got = Privacy.kAnonymize(df, Seq("nation", "segment"), k = 2, "bal").collect()
    assert(got.length == 1 && got.head.getString(0) == "us")
  }

  test("topPaths orders per user by (time, id) and counts contiguous n-grams") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val events = Seq(
      // user 1: a b c a b c  → "a b c"×2, "b c a"×1, "c a b"×1
      (1L, ts(0), "a", 1L), (1L, ts(1), "b", 2L), (1L, ts(2), "c", 3L),
      (1L, ts(3), "a", 4L), (1L, ts(4), "b", 5L), (1L, ts(5), "c", 6L),
      // user 2: a b c (same-ts tie broken by id: 8 before 9)
      (2L, ts(0), "a", 7L), (2L, ts(1), "b", 8L), (2L, ts(1), "c", 9L),
      // user 3: too short
      (3L, ts(0), "a", 10L), (3L, ts(1), "b", 11L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = Funnel.topPaths(events, n = 3, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a b c", 3L), ("b c a", 1L), ("c a b", 1L)))
  }
}
