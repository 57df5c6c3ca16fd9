package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Partition pruning on hive-layout parquet — the two forms that decide
  * whether a 100-TB fact scan reads 3 partitions or 300:
  *  - static: a literal filter on the partition column prunes directories
  *    at planning time;
  *  - dynamic (DPP): the pruning predicate only exists at RUNTIME, as the
  *    surviving keys of the filtered dimension side of a join.
  */
class PartitionPruningSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private lazy val dir: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-prune-spec").toString
    (1 to 300).map(i => (i.toLong, s"t${i % 3}", i * 1.0))
      .toDF("id", "etype", "v")
      .write.mode("overwrite").partitionBy("etype").parquet(p)
    p
  }

  test("static pruning: partition-column filter reaches the scan, not a post-filter") {
    val q = spark.read.parquet(dir).filter(col("etype") === "t1")
    // execute THE INSPECTED plan (collect() drives q's own QueryExecution;
    // a derived q.count() would execute a different one and leave these
    // metrics at 0, making the file-count assert vacuous)
    assert(q.collect().length == 100)
    val scan = collectFirst(q.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }.get
    // the partition filter is applied at file listing: one of three
    // partition directories survives
    assert(scan.partitionFilters.nonEmpty)
    assert(scan.relation.location.inputFiles.length >= 3) // all dirs on disk
    val scanned = scan.metrics("numFiles").value
    assert(scanned > 0, "inspected plan did not execute — metric is empty")
    assert(scanned <= scan.relation.location.inputFiles.length / 3,
      s"static pruning read $scanned files of ${scan.relation.location.inputFiles.length}")
  }

  test("dynamic pruning: runtime dim filter prunes fact partitions via DPP") {
    // at test-data sizes the size-stats benefit estimate declines DPP;
    // the fallback ratio heuristic is what a stats-less 100-TB scan uses
    val key = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      // the filtering side must be a relation scan (a LocalRelation never
      // qualifies as a selective-predicate source for DPP)
      val dimPath =
        java.nio.file.Files.createTempDirectory("graft-prune-dim").toString
      Seq(("t0", 1), ("t1", 5), ("t2", 5)).toDF("k", "score")
        .write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.parquet(dimPath)
      val q = spark.read.parquet(dir)
        .join(dim.filter(col("score") >= 5), col("etype") === col("k"))
      assert(q.count() == 200) // t1 + t2
      val scan = collectFirst(q.queryExecution.executedPlan) {
        case s: FileSourceScanExec if s.output.exists(_.name == "etype") => s
      }.get
      // the scan carries a dynamic pruning predicate fed by the dim side
      val hasDpp = scan.partitionFilters.exists(e =>
        e.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]).isDefined)
      assert(hasDpp, s"expected a dynamicpruning partition filter, got: ${scan.partitionFilters}")
    } finally spark.conf.set(key, prev)
  }
}
