package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.core.Skew
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class SkewAndStreamOpsSpec extends SparkSuite {
  import spark.implicits._

  test("saltedJoin equals plain inner join on skewed data") {
    // hot key 1 with 5000 rows, long tail
    val left = ((1 to 5000).map(i => (1L, i)) ++ (1 to 500).map(i => (i.toLong + 1, i)))
      .toDF("k", "payload")
    val right = (1 to 400).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = left.join(right, "k").agg(count(lit(1)), sum($"payload")).head()
    val salted = Skew.saltedJoin(left, right, "k", 8)
      .agg(count(lit(1)), sum($"payload")).head()
    assert(plain == salted)
  }

  test("keyHistogram surfaces the hot key first") {
    val df = ((1 to 100).map(_ => (7L, "x")) ++ (1 to 10).map(i => (i.toLong + 100, "y")))
      .toDF("k", "v")
    val top = Skew.keyHistogram(df, "k", 1).as[(Long, Long)].head()
    assert(top == ((7L, 100L)))
  }

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("bandJoin equals the naive band predicate, never misses cross-bucket pairs") {
    // cluster timestamps around bucket edges so ±1-bucket probing is
    // actually exercised (pairs straddling a bucket boundary)
    val rows = Seq(0L, 50L, 119L, 120L, 121L, 240L, 400L, 430L, 1000L).zipWithIndex
      .map { case (sec, i) => (i.toLong, new Timestamp(sec * 1000L), s"t${i % 2}") }
      .toDF("event_id", "ts", "event_type")
    val fast = graft.operators.RangeJoin.bandJoin(rows, "event_id", "ts", bandMs = 120000L)
      .select("a_event_id", "b_event_id").as[(Long, Long)].collect().toSet
    val a = rows.select(col("event_id").as("ia"), col("ts").as("ta"))
    val b = rows.select(col("event_id").as("ib"), col("ts").as("tb"))
    val naive = a.crossJoin(b)
      .filter(col("ia") < col("ib") &&
        abs(unix_millis(col("ta")) - unix_millis(col("tb"))) <= 120000L)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(fast == naive && naive.nonEmpty)
    // the band predicate must ride an EQUI join on the bucket — never a
    // cartesian / broadcast-nested-loop plan
    val plan = graft.operators.RangeJoin.bandJoin(rows, "event_id", "ts", 120000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.dedupStream(input.toDF())
      .writeStream.outputMode("append").format("memory").queryName("dd_out").start()
    input.addData(Event(1, ts(0), 1, "view", 1.0), Event(1, ts(1), 1, "view", 1.0),
      Event(2, ts(2), 1, "view", 1.0))
    q.processAllAvailable()
    input.addData(Event(2, ts(3), 1, "view", 1.0), Event(3, ts(4), 1, "view", 1.0))
    q.processAllAvailable()
    val ids = spark.table("dd_out").select("event_id").as[Long].collect().sorted
    q.stop()
    assert(ids.toSeq == Seq(1L, 2L, 3L))
    spark.sql("DROP TABLE IF EXISTS dd_out")
  }

  test("stream-stream interval join matches clicks to preceding signup") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.clickAfterSignup(input.toDF())
      .writeStream.outputMode("append").format("memory").queryName("ss_out").start()
    input.addData(
      Event(1, ts(0), 1, "signup", 0.0),
      Event(2, ts(10), 1, "click", 0.0),   // within the hour → match
      Event(3, ts(10), 2, "click", 0.0),   // user 2 never signed up → no match
      Event(4, ts(90), 1, "click", 0.0))   // 90 min after signup → no match
    q.processAllAvailable()
    val matched = spark.table("ss_out").select("event_id").as[Long].collect().sorted
    q.stop()
    assert(matched.toSeq == Seq(2L))
    spark.sql("DROP TABLE IF EXISTS ss_out")
  }

  test("AsOfJoin: latest at-or-before per key, ties, no-match, tolerance") {
    import graft.operators.AsOfJoin
    val left = Seq((1L, 10L, ts(60)), (2L, 10L, ts(30)), (3L, 20L, ts(60)),
      (4L, 30L, ts(60))).toDF("id", "k", "lts")
    val right = Seq((10L, ts(30), "a"), (10L, ts(50), "b"), (10L, ts(70), "c"),
      (20L, ts(61), "late")).toDF("k", "rts", "v")
    val res = AsOfJoin.join(left, right, "k", "lts", "rts", Seq("v"))
      .select($"id", $"v").as[(Long, Option[String])].collect().toMap
    assert(res(1L).contains("b"))   // 50 <= 60, latest
    assert(res(2L).contains("a"))   // tie at 30 counts (at-or-before)
    assert(res(3L).isEmpty)         // only later right rows
    assert(res(4L).isEmpty)         // key never on right
    // tolerance (seconds): the 10-minute-old right row survives a 600 s
    // tolerance, not a 300 s one
    val tol = AsOfJoin.join(left, right, "k", "lts", "rts", Seq("v"), tolerance = 600)
      .select($"id", $"v").as[(Long, Option[String])].collect().toMap
    assert(tol(1L).contains("b") && tol(2L).contains("a"))
    val tol2 = AsOfJoin.join(left, right, "k", "lts", "rts", Seq("v"), tolerance = 300)
      .select($"id", $"v").as[(Long, Option[String])].collect().toMap
    assert(tol2(1L).isEmpty, "beyond tolerance")
  }

  test("manifest JSON round-trips every key type") {
    import graft.core.{FileEntry, SnapshotManifest}
    val m = SnapshotManifest("id1", 3L, "snap", Seq("a", "b"), Seq("v"), 42L,
      -1L, "tx9", Seq(
        FileEntry("/p/1", 10L, Seq("s", 1L), Seq("t", 2L)),
        FileEntry("/p/2", 32L, Seq(1.5, true), Seq(2.5, false)),
        FileEntry("/p/3", 1L, Seq(null, java.sql.Date.valueOf("2024-02-01")),
          Seq("x", new java.sql.Timestamp(1700000000123L)))))
    val back = SnapshotManifest.fromJson(SnapshotManifest.toJson(m))
    assert(back == m)
  }
}
