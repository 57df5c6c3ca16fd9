package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

import graft.core.{KeyOrd, KVIndex}

/** Serves `SELECT count(*) FROM cat.t WHERE <leading-key range>` at
  * MANIFEST cost — the SQL twin of [[graft.core.KVIndex.countRange]] and
  * the filtered complement of the scan's unfiltered `count(*)` aggregate
  * pushdown (`GraftScanBuilder.translateAgg`, which a pushed filter
  * correctly declines: DSV2 only pushes aggregates when no post-scan
  * filter remains, and the scan's residual-filter protocol keeps exact
  * predicates above the scan by design).
  *
  * Rewrite: `Aggregate(count(*), Filter(range, graftScan))` becomes
  *
  * {{{
  *   Project [interiorRows + boundaryCount]
  *     Aggregate [count(1) AS boundaryCount]
  *       Filter <the original predicate>
  *         <scan of ONLY the boundary files>
  * }}}
  *
  * where `interiorRows` is the manifest row-count sum of every file whose
  * leading-key range lies ENTIRELY inside the predicate (counted with
  * ZERO io), and the boundary files — the ones the predicate cuts
  * through, at most two on a disjoint layout — are the only files
  * scanned. A range spanning terabytes of interior files answers by
  * reading at most two. When the bounds prune everything or no boundary
  * file remains, the answer is a LocalRelation — zero files scanned.
  *
  * Sound for ANY file layout (overlapping included): each row lives in
  * exactly one file, coverage is judged per file, and a file containing
  * null leading keys is never "covered" (null sorts first, so its
  * manifest min is null and fails the coverage check) — null-keyed rows
  * only ever meet the exact predicate in a boundary scan, which drops
  * them like SQL does.
  *
  * Eligibility: group-less count-star/count-literal aggregates only (no DISTINCT, no
  * FILTER clause), over zero or more attribute-only Projects and ONE
  * Filter whose conjuncts are all =, <, <=, >, >=, IsNotNull on the
  * snapshot's leading key column against foldable literals, over a plain
  * graft scan. Anything else keeps the stock plan.
  */
object GraftCountRange extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groups, aggExprs, child, _) if groups.isEmpty =>
      rewrite(agg, aggExprs, child).getOrElse(agg)
  }

  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(Count(Seq(Literal(_, _))), Complete, false, None, _), _) => true
    case _ => false
  }

  /** Inclusive-flagged bound: (value in EXTERNAL form, inclusive). */
  private type Bound = (Any, Boolean)

  private def rewrite(agg: Aggregate, aggExprs: Seq[NamedExpression],
                      child0: LogicalPlan): Option[LogicalPlan] = {
    if (aggExprs.isEmpty || !aggExprs.forall(isCountStar)) return None
    // peel attribute-only Projects (column pruning for count(*))
    var child = child0
    while (child match {
      case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        child = c; true
      case _ => false
    }) ()
    val (cond, rel, g) = child match {
      case Filter(c, r: DataSourceV2ScanRelation) => r.scan match {
        case org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper(gs: GraftScan, _, _)
            if gs.plainScan => (c, r, gs)
        case gs: GraftScan if gs.plainScan => (c, r, gs)
        case _ => return None
      }
      case _ => return None
    }
    val keyCol = g.manifestRef.keyCols.head
    val keyAttr = rel.output.find(_.name == keyCol).getOrElse(return None)

    // every conjunct must be a leading-key range shape; fold into
    // (lo, hi) bounds with inclusivity, values in external form
    def ext(l: Literal): Any =
      KeyOrd.normLiteral(CatalystTypeConverters.convertToScala(l.value, l.dataType))
    var lo: Option[Bound] = None
    var hi: Option[Bound] = None
    def tightenLo(v: Any, inc: Boolean): Unit = lo match {
      case None => lo = Some((v, inc))
      case Some((v0, inc0)) =>
        val c = KeyOrd.compare(Seq(v), Seq(v0))
        if (c > 0) lo = Some((v, inc))
        else if (c == 0 && !inc) lo = Some((v, false))
    }
    def tightenHi(v: Any, inc: Boolean): Unit = hi match {
      case None => hi = Some((v, inc))
      case Some((v0, inc0)) =>
        val c = KeyOrd.compare(Seq(v), Seq(v0))
        if (c < 0) hi = Some((v, inc))
        else if (c == 0 && !inc) hi = Some((v, false))
    }
    def isKey(a: Expression): Boolean = a match {
      case ar: AttributeReference => ar.exprId == keyAttr.exprId
      case _ => false
    }
    GraftCoRangeJoin.conjuncts(cond).foreach {
      case EqualTo(a, l: Literal) if isKey(a) && l.value != null =>
        tightenLo(ext(l), inc = true); tightenHi(ext(l), inc = true)
      case EqualTo(l: Literal, a) if isKey(a) && l.value != null =>
        tightenLo(ext(l), inc = true); tightenHi(ext(l), inc = true)
      case GreaterThanOrEqual(a, l: Literal) if isKey(a) && l.value != null =>
        tightenLo(ext(l), inc = true)
      case LessThanOrEqual(l: Literal, a) if isKey(a) && l.value != null =>
        tightenLo(ext(l), inc = true)
      case GreaterThan(a, l: Literal) if isKey(a) && l.value != null =>
        tightenLo(ext(l), inc = false)
      case LessThan(l: Literal, a) if isKey(a) && l.value != null =>
        tightenLo(ext(l), inc = false)
      case LessThanOrEqual(a, l: Literal) if isKey(a) && l.value != null =>
        tightenHi(ext(l), inc = true)
      case GreaterThanOrEqual(l: Literal, a) if isKey(a) && l.value != null =>
        tightenHi(ext(l), inc = true)
      case LessThan(a, l: Literal) if isKey(a) && l.value != null =>
        tightenHi(ext(l), inc = false)
      case GreaterThan(l: Literal, a) if isKey(a) && l.value != null =>
        tightenHi(ext(l), inc = false)
      case IsNotNull(a) if isKey(a) => () // implied by any range bound
      case _ => return None
    }

    val ix = new KVIndex(g.storeRef, g.manifestRef)
    val files = ix.manifestFiles
    def headIn(h: Any, b: Option[Bound], isLo: Boolean): Boolean =
      h != null && b.forall { case (v, inc) =>
        val c = KeyOrd.compare(Seq(h), Seq(v))
        if (isLo) c > 0 || (inc && c == 0) else c < 0 || (inc && c == 0)
      }
    // a file can hold a match only if some head in [min.head, max.head]
    // satisfies the bounds; conservative (nulls sort first, so a null max
    // means an all-null file — provably matchless, the predicate is
    // null-rejecting)
    val overlap = files.filter { f =>
      f.max.head != null &&
        lo.forall { case (v, inc) =>
          val c = KeyOrd.compare(Seq(f.max.head), Seq(v)); c > 0 || (inc && c == 0) } &&
        hi.forall { case (v, inc) =>
          val c = KeyOrd.compare(Seq(f.min.head), Seq(v)); c < 0 || (inc && c == 0) ||
            f.min.head == null }
    }
    val (covered, boundary) = overlap.partition(f =>
      headIn(f.min.head, lo, isLo = true) && headIn(f.max.head, hi, isLo = false))
    val interior = covered.map(_.rows).sum
    GraftScan.lastPlannedFiles = boundary.size

    if (boundary.isEmpty) {
      // ZERO files scanned: the whole count from manifest stats
      return Some(LocalRelation(aggExprs.map(_.toAttribute),
        Seq(InternalRow(aggExprs.map(_ => interior: Any): _*))))
    }
    // scan ONLY the boundary files, re-apply the ORIGINAL predicate
    // exactly (its attr exprIds restored over the bounded read)
    val bScan = g.storeRef.readFiles(boundary.map(_.path), g.manifestRef)
      .queryExecution.analyzed
    val bAliased = GraftCoRangeJoin.aliasTo(rel.output, bScan)
    val cnt = Alias(AggregateExpression(Count(Seq(Literal(1L))), Complete,
      isDistinct = false), "graft_boundary_count")()
    val bAgg = Aggregate(Nil, Seq(cnt), Filter(cond, bAliased), None)
    Some(Project(aggExprs.map(a =>
      Alias(Add(Literal(interior), cnt.toAttribute), a.name)(exprId = a.exprId)),
      bAgg))
  }
}
