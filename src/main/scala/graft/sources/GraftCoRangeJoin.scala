package graft.sources

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

import graft.core.KVIndex
import graft.plans.ZipPartitionsJoin

/** Exchange-free key-equi-joins through the DSV2 path: `SELECT ... FROM
  * cat.a JOIN cat.b ON a.<keys> = b.<keys>` plans the co-range zip join
  * ([[graft.core.KVIndex.coRangeJoin]]) instead of shuffling both sides —
  * the JOIN twin of [[GraftOrderedScan]]'s ordering rewrite, and the
  * layout capability `SupportsReportPartitioning` cannot express for a
  * RANGE-laid source (`KeyGroupedPartitioning` partitions hold one key
  * value each; a range leg holds an interval — see the design note on
  * `coRangeJoin`).
  *
  * Eligibility is strict — the stock join stays whenever:
  *  - the join is not INNER, or its condition is anything but a
  *    conjunction of plain attribute equalities covering BOTH indexes'
  *    FULL key column lists positionally (a leading-key-prefix equality
  *    is NOT leg-aligned: a boundary can split rows sharing the prefix);
  *  - either side is not a plain [[GraftScan]] relation (aggregate/limit
  *    pushdown collapsed it), possibly under deterministic Filters —
  *    which are kept, re-applied above the replaced side;
  *  - either snapshot's layout cannot guarantee disjoint file ranges.
  */
object GraftCoRangeJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, Inner, Some(cond), _) =>
      rewrite(j, l, r, cond).getOrElse(j)
  }

  /** A child is eligible when it is a plain GraftScan relation under zero
    * or more deterministic Filters; returns (relation, scan, filters
    * outermost-first).
    */
  private def side(p: LogicalPlan)
      : Option[(DataSourceV2ScanRelation, GraftScan, Seq[Expression])] = p match {
    case f @ Filter(c, child) if c.deterministic =>
      side(child).map { case (rel, g, fs) => (rel, g, c +: fs) }
    case rel: DataSourceV2ScanRelation => rel.scan match {
      case org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper(g: GraftScan, _, _)
          if g.plainScan => Some((rel, g, Nil))
      case g: GraftScan if g.plainScan => Some((rel, g, Nil))
      case _ => None
    }
    case _ => None
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
                      cond: Expression): Option[LogicalPlan] = {
    val (lrel, lg, lFilters) = side(l).getOrElse(return None)
    val (rrel, rg, rFilters) = side(r).getOrElse(return None)

    // the condition must be exactly the full positional key equalities
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
        conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    val lIds = lrel.output.map(_.exprId).toSet
    val rIds = rrel.output.map(_.exprId).toSet
    val pairs = conjuncts(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if lIds.contains(a.exprId) && rIds.contains(b.exprId) => (a.name, b.name)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if lIds.contains(a.exprId) && rIds.contains(b.exprId) => (a.name, b.name)
      case _ => return None
    }
    val lKeyCols = lg.manifestRef.keyCols
    val rKeyCols = rg.manifestRef.keyCols
    if (lKeyCols.size != rKeyCols.size) return None
    val wanted = lKeyCols.zip(rKeyCols)
    if (pairs.toSet != wanted.toSet || pairs.size < wanted.size) return None

    val lIx = new KVIndex(lg.storeRef, lg.manifestRef)
    val rIx = new KVIndex(rg.storeRef, rg.manifestRef)
    // KEEP the scans' file prune: the join equates the full key lists, so
    // either side's pushed leading-key bounds constrain BOTH sides —
    // intersect them and cut the legs from the covering files only
    // (exactness is unaffected: the same predicates re-apply below)
    val (lLo, lHi) = lg.pushedKeyBounds
    val (rLo, rHi) = rg.pushedKeyBounds
    val lo = (lLo ++ rLo).reduceOption(graft.core.KeyOrd.max(_, _))
    val hi = (lHi ++ rHi).reduceOption(graft.core.KeyOrd.min(_, _))
    // per-leg row target from session conf (e.g. for wider tasks on a
    // scan-heavy join); ≤ 0 = the index's maxRowsPerFile convention
    val rowsPerLeg = org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.corange.rowsPerLeg", "-1").toLong
    lIx.coRangeLegPlans(rIx, rowsPerLeg, lo, hi).map { case (lPlan, rPlan, lKeys, rKeys) =>
      val zj = ZipPartitionsJoin(lPlan, rPlan, lKeys, rKeys)
      // restore each original side's (possibly pruned) output under its
      // original exprIds, so cond consumers above keep resolving — the
      // GraftOrderedScan pattern, once per side
      def aliased(out: Seq[Attribute], src: Seq[Attribute]) = {
        val byName = src.map(a => a.name -> a).toMap
        out.map(o => Alias(byName(o.name), o.name)(exprId = o.exprId))
      }
      val projected: LogicalPlan = Project(
        aliased(lrel.output, lPlan.output) ++ aliased(rrel.output, rPlan.output),
        zj)
      // pushed-down side filters re-apply above (they were residual-kept
      // by the scan builder — the file prune itself moved INTO the leg
      // construction, so nothing is lost); leg boundary predicates stay
      // inside the legs
      val withFilters = (lFilters ++ rFilters)
        .foldLeft(projected)((p, c) => Filter(c, p))
      withFilters
    }
  }
}
