package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Partition-zipped equi-join of two CO-RANGED children — the physical
  * half of the snapshot-layout join ([[graft.core.KVIndex.coRangeJoin]] /
  * [[graft.sources.GraftCoRangeJoin]]).
  *
  * Contract (the CALLER constructs it, this node trusts it): partition i
  * of `left` and partition i of `right` hold exactly the rows of the same
  * key RANGE — a shared, totally ordered sequence of leg boundaries cut
  * from BOTH manifests' file bounds, every row routed to exactly one leg.
  * Under that invariant a join key can only ever meet its match inside
  * the same partition index, so the join is `zipPartitions` + a per-leg
  * in-memory hash join: ZERO exchanges on either side, the snapshot
  * range layout doing for joins what the manifest stitch does for
  * ORDER BY.
  *
  * Spark's own vocabulary cannot express this invariant —
  * `KeyGroupedPartitioning` (storage-partitioned joins) requires each
  * partition to hold ONE partition-key value, while a range leg holds an
  * interval of keys — which is why this is a custom node rather than a
  * `SupportsReportPartitioning` report on the scan; see the design note
  * on [[graft.core.KVIndex.coRangeJoin]].
  *
  * Memory: the RIGHT leg of each partition is buffered in a hash map, so
  * per-task memory is O(right rows per leg) — the caller cuts legs from
  * both sides' file bounds precisely so both legs stay ≈ one manifest
  * batch (a single file larger than the batch target is the floor, as
  * everywhere in the manifest machinery). Inner join; rows with a null
  * key never match (SQL equality).
  */
final case class ZipPartitionsJoin(left: LogicalPlan, right: LogicalPlan,
                                   leftKeys: Seq[Attribute],
                                   rightKeys: Seq[Attribute]) extends BinaryNode {
  require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty)
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): ZipPartitionsJoin =
    copy(left = newLeft, right = newRight)
}

final case class ZipPartitionsJoinExec(left: SparkPlan, right: SparkPlan,
                                       leftKeys: Seq[Expression],
                                       rightKeys: Seq[Expression])
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def doExecute(): RDD[InternalRow] = {
    val lrdd = left.execute()
    val rrdd = right.execute()
    require(lrdd.getNumPartitions == rrdd.getNumPartitions,
      s"co-range join children must have identical partitioning: " +
        s"${lrdd.getNumPartitions} vs ${rrdd.getNumPartitions} partitions")
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lAttrs = left.output
    val rAttrs = right.output
    lrdd.zipPartitions(rrdd, preservesPartitioning = false) { (li, ri) =>
      val rKeyProj = UnsafeProjection.create(rKeys, rAttrs)
      val lKeyProj = UnsafeProjection.create(lKeys, lAttrs)
      val outProj = UnsafeProjection.create(
        (lAttrs ++ rAttrs).map(_.asInstanceOf[Expression]), lAttrs ++ rAttrs)
      // build on the right leg: rows AND projected keys must be copied —
      // the scan reuses its row buffer across next() calls
      val byKey = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[InternalRow]]()
      while (ri.hasNext) {
        val r = ri.next()
        val k = rKeyProj(r)
        if (!k.anyNull) {
          var bucket = byKey.get(k)
          if (bucket == null) {
            bucket = new scala.collection.mutable.ArrayBuffer[InternalRow](1)
            byKey.put(k.copy(), bucket)
          }
          bucket += r.copy()
        }
      }
      val joined = new JoinedRow
      // Iterator.flatMap exhausts each inner iterator before advancing the
      // outer one, so `l` (the scan's reused buffer) is safe to reference
      // lazily — it cannot be overwritten while its matches still stream
      li.flatMap { l =>
        val k = lKeyProj(l)
        val bucket = if (k.anyNull) null else byKey.get(k)
        if (bucket == null) Iterator.empty
        else bucket.iterator.map(r => outProj(joined(l, r)))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): ZipPartitionsJoinExec =
    copy(left = newLeft, right = newRight)
}
