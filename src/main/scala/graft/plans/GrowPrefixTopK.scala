package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, SinglePartition}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Exec-time GROW-THE-PREFIX scan for FILTERED SQL top-k
  * (`WHERE <residual> ORDER BY <key prefix> LIMIT n`,
  * [[graft.sources.GraftOrderedScan]]).
  *
  * The manifest top-k rung can cut an exact n-row file prefix only when
  * no predicate sits between the limit and the scan — a filtered prefix
  * might not hold n survivors while later files do, so the optimizer
  * cannot bound the read statically. But EXECUTION can: the child here is
  * the residual-filtered ordered stitch over the covering files (legs =
  * partitions, ascending in key order, each internally key-sorted — rows
  * stream out in GLOBAL key order), so the first n child output rows ARE
  * the query's top-n survivors. `doExecute` pulls child partitions in
  * DOUBLING batches (1, 2, 4, …) of driver-launched jobs, stopping as
  * soon as n survivors exist — a selective predicate over a 100-file
  * snapshot reads a handful of files; the worst case (zero survivors)
  * scans every partition EXACTLY ONCE across ~log2(P) job launches, the
  * same total IO as the stock full covering read. This is Spark's own
  * `executeTake` incremental-partition pattern applied to key-ordered
  * manifest legs (public `SparkPlan.executeTake` prior art), with the
  * survivor counting done by the REAL filter running inside the child
  * plan — no optimizer-time selectivity guess anywhere.
  *
  * Scale shape: per-job driver traffic is bounded by the still-missing
  * row count (each partition task emits at most `n - have` rows), total
  * driver residency ≤ n rows — the same bound TakeOrderedAndProject's
  * collect path carries — and the rewrite is capped at
  * `spark.graft.sql.topk.growMaxRows` (default 100k) so a huge LIMIT
  * keeps the stock distributed plan. Never-launched partitions never
  * read their files.
  */
final case class GrowPrefixTopK(limit: Int, child: LogicalPlan) extends UnaryNode {
  require(limit > 0, s"GrowPrefixTopK limit must be positive, got $limit")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = Some(limit.toLong)
  override protected def withNewChildInternal(newChild: LogicalPlan): GrowPrefixTopK =
    copy(child = newChild)
}

final case class GrowPrefixTopKExec(limit: Int, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = SinglePartition
  // the collected prefix preserves the child's intra/cross-partition key
  // order, so the single output partition is globally ordered like the
  // child's partitions were
  override def outputOrdering: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
    child.outputOrdering

  /** Runs ONCE (lazy): the incremental scan loop. Partition indexes only
    * ever advance — no partition is computed twice.
    */
  private lazy val rows: Array[InternalRow] = {
    val rdd = child.execute()
    val total = rdd.getNumPartitions
    val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var scanned = 0
    var batch = 1
    var launches = 0
    while (buf.length < limit && scanned < total) {
      val upTo = math.min(scanned + batch, total)
      val parts = (scanned until upTo).toArray
      val need = limit - buf.length
      // rows must be COPIED before leaving the iterator (unsafe row reuse)
      val res = sparkContext.runJob(rdd,
        (it: Iterator[InternalRow]) => it.take(need).map(_.copy()).toArray,
        parts.toIndexedSeq)
      // runJob preserves the requested partition order, which is key order
      res.foreach { arr =>
        val keep = math.min(arr.length, limit - buf.length)
        var i = 0
        while (i < keep) { buf += arr(i); i += 1 }
      }
      scanned = upTo
      batch *= 2
      launches += 1
    }
    GrowPrefixTopKExec.record(scanned, total, launches)
    buf.toArray
  }

  override def executeCollect(): Array[InternalRow] = rows

  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(rows.toIndexedSeq, 1)

  override protected def withNewChildInternal(newChild: SparkPlan): GrowPrefixTopKExec =
    copy(child = newChild)
}

object GrowPrefixTopKExec {
  /** Telemetry for plan pins: how much of the covering stitch the last
    * grow-prefix execution actually pulled.
    */
  @volatile var lastScannedPartitions: Int = -1
  @volatile var lastTotalPartitions: Int = -1
  @volatile var lastLaunches: Int = -1
  private[plans] def record(scanned: Int, total: Int, launches: Int): Unit = {
    lastScannedPartitions = scanned
    lastTotalPartitions = total
    lastLaunches = launches
  }
  def resetTelemetry(): Unit = record(-1, -1, -1)
}
