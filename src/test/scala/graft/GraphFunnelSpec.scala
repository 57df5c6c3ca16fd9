package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Funnel, Graphs}

/** Degree-oriented triangle counting and ordered-funnel conversions. */
class GraphFunnelSpec extends SparkSuite {
  import spark.implicits._

  test("triangleCorners: hand-built graph, every triangle counted once per corner") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant 5 + an
    // isolated edge (6,7); duplicates/reversed/self edges must not matter
    val edges = Seq(
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (2, 1), (3, 3), (4, 5), (6, 7), (1, 2)
    ).toDF("src", "dst")
    val got = Graphs.triangleCorners(edges)
      .as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 3L))
    assert(got.values.sum / 3 == 4, "global count = corner sum / 3")
  }

  test("triangleCorners randomized differential vs brute force") {
    val rnd = new scala.util.Random(42)
    val edges = (1 to 400).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val got = Graphs.triangleCorners(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    // brute force
    val und = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = scala.collection.mutable.Map.empty[Long, Long]
    for {
      i <- nodes.indices; j <- i + 1 until nodes.size; k <- j + 1 until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if und((a, b)) && und((a, c)) && und((b, c))
      n <- Seq(a, b, c)
    } brute(n) = brute.getOrElse(n, 0L) + 1
    assert(got == brute.toMap)
  }

  test("funnel: ordered within-window semantics, hand-checked") {
    def ts(h: Int, m: Int = 0) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val events = Seq(
      // user 1 converts fully in order
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // user 2: click BEFORE view → stops at view
      (2L, ts(2), "click"), (2L, ts(3), "view"),
      // user 3: purchase before click → reaches click only
      (3L, ts(1), "view"), (3L, ts(2), "purchase"), (3L, ts(4), "click"),
      // user 4: full order but purchase outside the 6h window of FIRST view
      (4L, ts(1), "view"), (4L, ts(2), "click"), (4L, ts(9), "purchase"),
      // user 5 never views
      (5L, ts(1), "click"), (5L, ts(2), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.conversions(events, Seq("view", "click", "purchase"),
        windowMs = 6 * 3600 * 1000L)
      .orderBy("step_no")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "view", 4L, 1000000L),
      (2L, "click", 3L, 750000L), // users 1, 3, 4
      (3L, "purchase", 1L, 250000L))) // user 1 only
  }

  test("funnel: earliest-entry semantics — a later re-view cannot reopen the window") {
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // first view at 01:00 opens a 2h window; the 05:00 re-view does NOT
    // reopen it, so the 06:00 click is out of window
    val events = Seq(
      (1L, ts(1), "view"), (1L, ts(5), "view"), (1L, ts(6), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.conversions(events, Seq("view", "click"),
        windowMs = 2 * 3600 * 1000L)
      .orderBy("step_no").as[(Long, String, Long, Long)].collect()
    assert(got(1)._3 == 0L)
  }

  test("stepLatencies: exact medians over hand-built conversion times") {
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val events = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "view"), (2L, ts(5), "click"),
      (3L, ts(1), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.stepLatencies(events, Seq("view", "click", "purchase"),
        windowMs = 24 * 3600 * 1000L)
      .orderBy("step_no")
      .as[(Long, String, String, Long, Long, Long)].collect().toSeq
    val h = 3600000L
    assert(got == Seq(
      (1L, "view", "click", 2L, h, 4 * h), // diffs 1h, 4h -> disc-median 1h
      (2L, "click", "purchase", 1L, h, h)))
  }

  test("retention: hand-built cohorts — week-0 is always 100%, churn shows") {
    def ts(d: String) = Timestamp.valueOf(s"2024-01-$d 10:00:00")
    // weeks (Mondays): 2024-01-01, 01-08, 01-15. Users 1,2 cohort w0
    // (user 2 returns in w1 and w2, user 1 only w0); user 3 cohort w1.
    val events = Seq(
      (1L, 10L, ts("01")), (2L, 11L, ts("03")),
      (2L, 12L, ts("09")), (3L, 13L, ts("10")),
      (2L, 14L, ts("16")), (2L, 15L, ts("17"))
    ).toDF("user_id", "event_id", "ts")
    val got = Funnel.retention(events)
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 2L, 1000000L),
      ("2024-01-01", 1L, 1L, 500000L),
      ("2024-01-01", 2L, 1L, 500000L),
      ("2024-01-08", 0L, 1L, 1000000L)))
  }

  test("transitions: per-user chains, probabilities condition on the from state") {
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // user 1: a->b->a->c ; user 2: a->b. Chains never cross users.
    val events = Seq(
      (1L, 1L, ts(1), "a"), (1L, 2L, ts(2), "b"),
      (1L, 3L, ts(3), "a"), (1L, 4L, ts(4), "c"),
      (2L, 5L, ts(1), "a"), (2L, 6L, ts(2), "b")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Funnel.transitions(events)
      .as[(String, String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    // from a: b twice, c once (of 3); from b: a once (of 1)
    assert(got == Map(
      ("a", "b") -> ((2L, 666666L)),
      ("a", "c") -> ((1L, 333333L)),
      ("b", "a") -> ((1L, 1000000L))))
    // a same-timestamp tie breaks on event_id — deterministic chains
    val tied = Seq(
      (9L, 1L, ts(1), "x"), (9L, 2L, ts(1), "y"), (9L, 3L, ts(1), "z")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val chain = Funnel.transitions(tied)
      .as[(String, String, Long, Long)].collect().map(t => (t._1, t._2)).toSet
    assert(chain == Set(("x", "y"), ("y", "z")))
  }
}
