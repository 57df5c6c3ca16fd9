package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
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
  * STREAMING MERGE join: ZERO exchanges on either side, the snapshot
  * range layout doing for joins what the manifest stitch does for
  * ORDER BY.
  *
  * Join types: INNER, the LEFT-preserving family (LeftOuter, LeftSemi,
  * LeftAnti), RIGHT OUTER and FULL OUTER — the snapshot-diff primitives
  * ("which keys are missing / present / changed on either side") with no
  * shuffle. For the preserving types the caller must route EVERY
  * preserved row into some leg (ranges only one side covers ride the
  * `leftOnly`/`rightOnly` branches of `coRangeLegPlans`). Null join keys
  * follow SQL equality: never matched, so inner/semi drop them, outer
  * types null-extend them, anti keeps them.
  *
  * Spark's own vocabulary cannot express the leg invariant —
  * `KeyGroupedPartitioning` (storage-partitioned joins) requires each
  * partition to hold ONE partition-key value, while a range leg holds an
  * interval of keys — which is why this is a custom node rather than a
  * `SupportsReportPartitioning` report on the scan; see the design note
  * on [[graft.core.KVIndex.coRangeJoin]].
  *
  * Memory: NO build side. [[ZipPartitionsJoinExec.requiredChildOrdering]]
  * asks for both legs sorted by their keys, so `EnsureRequirements`
  * inserts a LOCAL `SortExec` per child (no exchange — the distribution
  * requirement stays unspecified) whose `UnsafeExternalSorter` SPILLS to
  * disk past its managed-memory budget; the join itself then streams both
  * sorted iterators, buffering only the CURRENT duplicate-key group of
  * the right leg. Per-task heap is therefore O(one key's right rows) no
  * matter how large a leg grows — an oversized leg (or a pathological
  * rows-per-leg setting) degrades to a disk-backed sort, never an OOM.
  */
final case class ZipPartitionsJoin(left: LogicalPlan, right: LogicalPlan,
                                   leftKeys: Seq[Attribute],
                                   rightKeys: Seq[Attribute],
                                   joinType: JoinType = Inner) extends BinaryNode {
  require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty)
  require(ZipPartitionsJoin.supports(joinType),
    s"ZipPartitionsJoin: unsupported join type $joinType")
  override def output: Seq[Attribute] = joinType match {
    case LeftSemi | LeftAnti => left.output
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case RightOuter => left.output.map(_.withNullability(true)) ++ right.output
    case FullOuter => left.output.map(_.withNullability(true)) ++
      right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): ZipPartitionsJoin =
    copy(left = newLeft, right = newRight)
}

object ZipPartitionsJoin {
  def supports(jt: JoinType): Boolean = jt match {
    case Inner | LeftOuter | LeftSemi | LeftAnti | RightOuter | FullOuter => true
    case _ => false
  }
}

final case class ZipPartitionsJoinExec(left: SparkPlan, right: SparkPlan,
                                       leftKeys: Seq[Expression],
                                       rightKeys: Seq[Expression],
                                       joinType: JoinType)
    extends BinaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override def output: Seq[Attribute] = joinType match {
    case LeftSemi | LeftAnti => left.output
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case RightOuter => left.output.map(_.withNullability(true)) ++ right.output
    case FullOuter => left.output.map(_.withNullability(true)) ++
      right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }

  /** Sorted legs make the join a stream: `EnsureRequirements` satisfies
    * this with a local, SPILLABLE sort per child (no exchange — the
    * distribution requirement is unspecified), which is what bounds task
    * memory at any leg size.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(leftKeys.map(SortOrder(_, Ascending)),
      rightKeys.map(SortOrder(_, Ascending)))

  /** FULL OUTER interleaves right-only rows whose LEFT attributes are
    * null, so neither the left-key ordering nor the range partitioning
    * survives — both claims are dropped for it. RIGHT OUTER claims them
    * on the RIGHT keys instead (its preserved, never-null side: the
    * merge emits in key order and right-only rows carry their own key).
    */
  override def outputOrdering: Seq[SortOrder] =
    joinType match {
      case FullOuter => Nil
      case RightOuter => rightKeys.map(SortOrder(_, Ascending))
      case _ => leftKeys.map(SortOrder(_, Ascending))
    }

  /** The output is range-partitioned by the FULL left key list in the
    * exact sense of Spark's own [[RangePartitioning]]: leg i covers a key
    * range strictly below leg i+1 (the shared boundary cut is a sequence
    * of full-key values with half-open leg predicates, so rows equal on
    * the whole key tuple always share a leg), and within a leg the merge
    * streams in key order. Reporting the stock partitioning buys, with
    * stock semantics and zero custom rules: ORDER BY the join key elides
    * its global sort and range exchange; GROUP BY / PARTITION BY any
    * superset of the keys elides its hash exchange (`satisfies0` demands
    * every ordering expression in the clustering, so a key PREFIX —
    * which a boundary CAN split — correctly keeps its shuffle); and a
    * further join above replans its own exchanges (`RangeShuffleSpec` is
    * compatible with nothing and cannot create a partitioning, so
    * EnsureRequirements never zips two of these against each other).
    * Rests on the engine's non-null key contract (a null-keyed row has no
    * place in a range layout to begin with).
    */
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    if (joinType == FullOuter)
      org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(
        left.outputPartitioning.numPartitions)
    else
      org.apache.spark.sql.catalyst.plans.physical.RangePartitioning(
        outputOrdering, left.outputPartitioning.numPartitions)

  override protected def doExecute(): RDD[InternalRow] = {
    val lrdd = left.execute()
    val rrdd = right.execute()
    require(lrdd.getNumPartitions == rrdd.getNumPartitions,
      s"co-range join children must have identical partitioning: " +
        s"${lrdd.getNumPartitions} vs ${rrdd.getNumPartitions} partitions")
    val numOutputRows = longMetric("numOutputRows")
    val jt = joinType
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lAttrs = left.output
    val rAttrs = right.output
    val keyTypes = leftKeys.map(_.dataType)
    lrdd.zipPartitions(rrdd, preservesPartitioning = false) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lAttrs)
      val rKeyProj = UnsafeProjection.create(rKeys, rAttrs)
      val outPair = UnsafeProjection.create(
        (lAttrs ++ rAttrs).map(_.asInstanceOf[Expression]), lAttrs ++ rAttrs)
      val outLeft = UnsafeProjection.create(
        lAttrs.map(_.asInstanceOf[Expression]), lAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rAttrs.size) // all-null row

      // FULL / RIGHT OUTER: a symmetric merge that also emits unmatched
      // RIGHT rows (null-extended on the left); right outer SKIPS
      // unmatched-left emissions. Lookahead on both sides; a staged
      // emission advances its source only AFTER the row is consumed, so
      // the scan/sort row-buffer reuse never corrupts it.
      if (jt == FullOuter || jt == RightOuter) new Iterator[InternalRow] {
        private val nullLeft = new GenericInternalRow(lAttrs.size)
        private var lRow: InternalRow = _; private var lKey: UnsafeRow = _
        private var lLoaded = false
        private var rRow: InternalRow = _; private var rKey: UnsafeRow = _
        private var rLoaded = false
        private val rGroup = new scala.collection.mutable.ArrayBuffer[InternalRow](1)
        private var rGroupKey: UnsafeRow = _
        private var gi = 0
        private var emitKind = 0 // 1 = pair, 2 = left-only, 3 = right-only
        private var started = false
        private var done = false

        private def loadLeft(): Unit =
          if (li.hasNext) { lRow = li.next(); lKey = lKeyProj(lRow); lLoaded = true }
          else { lRow = null; lLoaded = false }
        private def loadRight(): Unit =
          if (ri.hasNext) { rRow = ri.next(); rKey = rKeyProj(rRow); rLoaded = true }
          else { rRow = null; rLoaded = false }

        // RIGHT OUTER shares this merge but SKIPS unmatched-left
        // emissions: the left row just advances
        private def stageLeftOnly(): Unit =
          if (jt == RightOuter) loadLeft() else emitKind = 2

        private def prepare(): Boolean = {
          if (!started) { loadLeft(); loadRight(); started = true }
          while (true) {
            if (emitKind != 0) return true
            if (lLoaded && rGroupKey != null) {
              if (!lKey.anyNull && keyOrd.compare(lKey, rGroupKey) == 0) {
                if (gi < rGroup.length) { emitKind = 1; return true }
                gi = 0; loadLeft() // this left's pairs are all emitted
              } else if (lKey.anyNull || keyOrd.compare(lKey, rGroupKey) > 0) {
                rGroup.clear(); rGroupKey = null // permanently stale
              } else stageLeftOnly() // defensively unmatched
            }
            else if (!lLoaded && !rLoaded) return false
            else if (!lLoaded) emitKind = 3 // drain unmatched right
            else if (lKey.anyNull) stageLeftOnly() // null key never matches
            else if (!rLoaded) stageLeftOnly() // drain unmatched left
            else if (rKey.anyNull) emitKind = 3
            else {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) emitKind = 3
              else if (c > 0) stageLeftOnly()
              else { // buffer the duplicate-key group, then pair
                rGroupKey = rKey.copy(); rGroup.clear(); gi = 0
                do { rGroup += rRow.copy(); loadRight() }
                while (rLoaded && !rKey.anyNull &&
                  keyOrd.compare(rKey, rGroupKey) == 0)
              }
            }
          }
          false
        }

        override def hasNext: Boolean =
          !done && { val h = prepare(); if (!h) done = true; h }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty join iterator")
          numOutputRows += 1
          emitKind match {
            case 1 =>
              val out = outPair(joined(lRow, rGroup(gi)))
              gi += 1
              if (gi >= rGroup.length) emitKind = 0 // prepare() advances left
              else emitKind = 1
              out
            case 2 =>
              val out = outPair(joined(lRow, nullRight))
              emitKind = 0; loadLeft()
              out
            case _ =>
              val out = outPair(joined(nullLeft, rRow))
              emitKind = 0; loadRight()
              out
          }
        }
      }
      // streaming many-to-many merge join over two key-sorted iterators.
      // Only the right side's CURRENT duplicate-key group is buffered
      // (copied — the scan/sort reuses its row buffer); the left row is
      // held by reference, safe because `li.next()` is never called while
      // its emissions still stream.
      else new Iterator[InternalRow] {
        private var lRow: InternalRow = _
        private var lKey: UnsafeRow = _
        private val rGroup = new scala.collection.mutable.ArrayBuffer[InternalRow](1)
        private var rGroupKey: UnsafeRow = _ // null = no live group
        private var rRow: InternalRow = _ // lookahead; null once exhausted
        private var rKey: UnsafeRow = _
        private var rStarted = false
        private var gi = 0
        private var emitGroup = false // emit (lRow, rGroup(gi)) while gi < len
        private var emitLeftOnly = false // emit lRow alone / null-extended
        private var done = false

        private def advanceRight(): Unit = {
          while (ri.hasNext) {
            val r = ri.next(); val k = rKeyProj(r)
            if (!k.anyNull) { rRow = r; rKey = k; return }
          }
          rRow = null; rKey = null
        }

        /** Loads/checks the right duplicate-key group for the CURRENT
          * left key; false for a null left key (SQL equality).
          */
        private def matched(): Boolean = {
          if (lKey.anyNull) return false
          if (rGroupKey != null) {
            val c = keyOrd.compare(lKey, rGroupKey)
            if (c == 0) return true
            if (c < 0) return false // left below the buffered group
            rGroup.clear(); rGroupKey = null // permanently stale
          }
          while (rRow != null && keyOrd.compare(rKey, lKey) < 0) advanceRight()
          if (rRow != null && keyOrd.compare(rKey, lKey) == 0) {
            rGroupKey = rKey.copy()
            do { rGroup += rRow.copy(); advanceRight() }
            while (rRow != null && keyOrd.compare(rKey, rGroupKey) == 0)
            true
          } else false
        }

        /** Positions the iterator on the next emission. */
        private def prepare(): Boolean = {
          while (true) {
            if (emitGroup) {
              if (gi < rGroup.length) return true
              emitGroup = false
            }
            if (emitLeftOnly) return true
            if (!rStarted) { advanceRight(); rStarted = true }
            if (!li.hasNext) return false
            lRow = li.next(); lKey = lKeyProj(lRow); gi = 0
            val m = matched()
            jt match {
              case Inner => if (m) emitGroup = true
              case LeftSemi => if (m) emitLeftOnly = true
              case LeftAnti => if (!m) emitLeftOnly = true
              case LeftOuter =>
                if (m) emitGroup = true else emitLeftOnly = true
              case t => throw new IllegalStateException(s"unsupported: $t")
            }
          }
          false
        }

        override def hasNext: Boolean =
          !done && { val h = prepare(); if (!h) done = true; h }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty join iterator")
          numOutputRows += 1
          if (emitLeftOnly) {
            emitLeftOnly = false
            jt match {
              case LeftOuter => outPair(joined(lRow, nullRight))
              case _ => outLeft(lRow)
            }
          } else {
            val out = outPair(joined(lRow, rGroup(gi)))
            gi += 1
            out
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): ZipPartitionsJoinExec =
    copy(left = newLeft, right = newRight)
}
