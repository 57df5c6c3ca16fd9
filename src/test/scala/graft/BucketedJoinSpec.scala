package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Layout-level join co-location: two tables bucketed on the join key with
  * the same bucket count must merge-join WITHOUT a shuffle on either side —
  * the property that turns a snapshot-shaped storage layout into free join
  * locality at 100 TB (no re-partitioning of either fact table).
  */
class BucketedJoinSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("co-bucketed merge join plans zero exchanges under the join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bkt-spec").toString
    val left = (1 to 1000).map(i => (i.toLong, i % 50, s"l$i"))
      .toDF("k", "grp", "lv")
    val right = (1 to 200).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    left.write.mode("overwrite").option("path", s"$dir/l")
      .bucketBy(4, "k").sortBy("k").saveAsTable("bjs_left")
    right.write.mode("overwrite").option("path", s"$dir/r")
      .bucketBy(4, "k").sortBy("k").saveAsTable("bjs_right")

    val joined = spark.table("bjs_left").hint("merge")
      .join(spark.table("bjs_right"), Seq("k"))
    val rows = joined.select("k", "lv", "rv").collect()
    assert(rows.length == 200)

    val plan = joined.queryExecution.executedPlan
    val smj = collectFirst(plan) { case j: SortMergeJoinExec => j }
    assert(smj.isDefined, s"expected a sort-merge join, got:\n$plan")
    // no exchange anywhere below the join: both sides read bucketed files
    // already distributed by k
    val exchangesBelow = collect(smj.get) { case e: ShuffleExchangeExec => e }
    assert(exchangesBelow.isEmpty,
      s"co-bucketed join must not shuffle, found: $exchangesBelow")

    spark.sql("DROP TABLE IF EXISTS bjs_left")
    spark.sql("DROP TABLE IF EXISTS bjs_right")
  }

  test("two exported snapshots merge-join with zero exchanges and exact content") {
    import graft.core._
    val dir = java.nio.file.Files.createTempDirectory("graft-bkt-kv").toString
    val store = new FsSnapshotStore(s"$dir/store", spark)
    val a = (1 to 500).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (200 to 700).map(i => (i.toLong, s"b$i")).toDF("k", "bv")
    val ixA = KVIndex.bootstrap(store, "ja", a, Seq("k")).toOption.get
    val ixB = KVIndex.bootstrap(store, "jb", b, Seq("k")).toOption.get
    ixA.toBucketedTable("bjs_ka", 4, s"$dir/ta")
    ixB.toBucketedTable("bjs_kb", 4, s"$dir/tb")

    val joined = spark.table("bjs_ka").hint("merge")
      .join(spark.table("bjs_kb"), Seq("k"))
    val rows = joined.select("k", "av", "bv").as[(Long, String, String)]
      .collect().sortBy(_._1)
    assert(rows.length == 301) // keys 200..500
    assert(rows.head == ((200L, "a200", "b200")) && rows.last == ((500L, "a500", "b500")))

    val smj = collectFirst(joined.queryExecution.executedPlan) {
      case j: SortMergeJoinExec => j
    }
    assert(smj.isDefined)
    assert(collect(smj.get) { case e: ShuffleExchangeExec => e }.isEmpty,
      "exported snapshot join must not shuffle")

    spark.sql("DROP TABLE IF EXISTS bjs_ka")
    spark.sql("DROP TABLE IF EXISTS bjs_kb")
  }
}
