package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, SinglePartition}
import org.apache.spark.sql.execution.{SparkPlan, SQLExecution, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

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
  * Scale shape: each partition task emits at most `n − have` rows, so
  * ONE JOB can transiently deliver up to `batchSize × (n − have)` rows
  * to the driver before the buffer truncates — the same exposure
  * Spark's own `executeTake` carries (its batches quadruple unbounded);
  * here the batch size is additionally CAPPED so the per-job transient
  * stays ≤ max(2^20, 16 n) rows (the cap only bites when the missing
  * count is large — exactly when the driver needs the protection; a
  * nearly-full page keeps pure doubling and its ~log2(P) launch bound).
  * The retained result is always ≤ n rows, and the whole rewrite is
  * gated at `spark.graft.sql.topk.growMaxRows` (default 100k) so a huge
  * LIMIT keeps the stock distributed plan. Never-launched partitions
  * never read their files.
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

  /** Telemetry is PER-NODE SQL metrics (read via
    * [[GrowPrefixTopKExec.telemetryOf]]), not process-global state — a
    * concurrent query through this exec in the same JVM cannot clobber
    * another query's reading between its run and its assertion.
    */
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "scannedLegs" -> SQLMetrics.createMetric(sparkContext, "key-ordered legs scanned"),
    "totalLegs" -> SQLMetrics.createMetric(sparkContext, "key-ordered legs in stitch"),
    "jobLaunches" -> SQLMetrics.createMetric(sparkContext, "incremental job launches"))

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
    // per-job transient bound (see class doc): a batch of B partitions can
    // return up to B × need rows before truncation, so B is capped by the
    // still-missing count — pure doubling while the transient stays small
    val maxTransientRows = math.max(1L << 20, 16L * limit)
    while (buf.length < limit && scanned < total) {
      val need = limit - buf.length
      val thisBatch = math.max(1L, math.min(batch.toLong, maxTransientRows / need)).toInt
      val upTo = math.min(scanned + thisBatch, total)
      val parts = (scanned until upTo).toArray
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
      batch = thisBatch * 2
      launches += 1
    }
    longMetric("scannedLegs").set(scanned.toLong)
    longMetric("totalLegs").set(total.toLong)
    longMetric("jobLaunches").set(launches.toLong)
    // the loop runs on the driver, so push the updates to the UI the way
    // Spark's own driver-side metrics do (BroadcastExchangeExec pattern)
    SQLMetrics.postDriverMetricUpdates(sparkContext,
      sparkContext.getLocalProperty(SQLExecution.EXECUTION_ID_KEY),
      metrics.values.toSeq)
    buf.toArray
  }

  override def executeCollect(): Array[InternalRow] = rows

  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(rows.toIndexedSeq, 1)

  override protected def withNewChildInternal(newChild: SparkPlan): GrowPrefixTopKExec =
    copy(child = newChild)
}

object GrowPrefixTopKExec {
  /** Per-query telemetry for plan pins: every grow-prefix node in `df`'s
    * executed plan with its (scannedLegs, totalLegs, jobLaunches) metric
    * values — read AFTER an action ran the frame. Empty when the query
    * never planned the rung (the decline probes test exactly that).
    */
  def telemetryOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] = {
    val helper =
      new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    helper.collectWithSubqueries(df.queryExecution.executedPlan) {
      case g: GrowPrefixTopKExec =>
        (g.longMetric("scannedLegs").value, g.longMetric("totalLegs").value,
          g.longMetric("jobLaunches").value)
    }
  }
}
