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
}
