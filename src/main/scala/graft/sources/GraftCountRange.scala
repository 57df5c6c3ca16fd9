package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Coalesce, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project, Union}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

import graft.core.{KeyOrd, KVIndex}

/** Serves `SELECT count(*) / min(k) / max(k) FROM cat.t WHERE
  * <leading-key range>` at MANIFEST cost — the SQL twin of
  * [[graft.core.KVIndex.countRange]] and the filtered complement of the
  * scan's unfiltered aggregate pushdown (`GraftScanBuilder.translateAgg`,
  * which a pushed filter correctly declines: DSV2 only pushes aggregates
  * when no post-scan filter remains, and the scan's residual-filter
  * protocol keeps exact predicates above the scan by design).
  *
  * Rewrite: `Aggregate(count/min/max, Filter(range, graftScan))` becomes
  * the same aggregate over a UNION of (k, cnt) rows:
  *
  * {{{
  *   Aggregate [coalesce(sum(cnt),0) / min(k) / max(k)]
  *     Union
  *       LocalRelation [(min covered head, interior rows), (max covered head, 0)]
  *       Project [(k, 1)] Filter <original predicate> <boundary files scan>
  * }}}
  *
  * The covered files — every file whose leading-key range lies ENTIRELY
  * inside the predicate — collapse driver-side to TWO rows (min/max/sum
  * are associative; the heads are real in-range key values), counted and
  * bounded with ZERO io; the boundary files the predicate cuts through —
  * at most two on a disjoint layout — are the only files scanned. A
  * range spanning terabytes of interior files answers by reading at most
  * two; an edge-aligned or all-pruned range reads none.
  *
  * Reference analogue: subtree cardinalities served from node metadata
  * (reference `Meta.scala` counters, surfaced as A4 in SURVEY §2.3) —
  * this is the same stats-not-scan answer lifted to SQL text.
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

  /** The aggregate shapes served from the manifest: count-star (count
    * over a literal), and min/max of the given attribute.
    */
  private sealed trait Served
  private case object CountStar extends Served
  private case object MinKey extends Served
  private case object MaxKey extends Served

  private def served(e: NamedExpression, key: Attribute): Option[Served] = e match {
    case Alias(AggregateExpression(Count(Seq(Literal(_, _))), Complete, false, None, _), _) =>
      Some(CountStar)
    case Alias(AggregateExpression(Min(a: AttributeReference), Complete, false, None, _), _)
        if a.exprId == key.exprId => Some(MinKey)
    case Alias(AggregateExpression(Max(a: AttributeReference), Complete, false, None, _), _)
        if a.exprId == key.exprId => Some(MaxKey)
    case _ => None
  }

  /** Inclusive-flagged bound: (value in EXTERNAL form, inclusive). */
  private type Bound = (Any, Boolean)

  private def rewrite(agg: Aggregate, aggExprs: Seq[NamedExpression],
                      child0: LogicalPlan): Option[LogicalPlan] = {
    if (aggExprs.isEmpty) return None
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
    val shapes = aggExprs.map(e => served(e, keyAttr).getOrElse(return None))

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

    // The replacement aggregates over a UNION of two row sources shaped
    // (k, cnt):
    //  - the covered files collapse DRIVER-SIDE to at most TWO rows —
    //    (min covered head, interior row sum) and (max covered head, 0):
    //    min/max/sum are associative, heads are real in-range key values,
    //    so the partials are exact and the LocalRelation stays O(1) no
    //    matter how many million files the range spans;
    //  - the boundary files (≤2 on a disjoint layout) scanned with the
    //    ORIGINAL predicate, each row as (k, 1).
    // count(*) = coalesce(sum(cnt), 0); min/max(k) = min/max(k).
    val keyType = keyAttr.dataType
    val kOut = AttributeReference("graft_k", keyType, nullable = true)()
    val cOut = AttributeReference("graft_cnt", LongType, nullable = false)()
    def narrow(v: Any): Any = (v, keyType) match {
      // manifest JSON round-trips widen numerics (Int -> Long, Float ->
      // Double): narrow back before the catalyst conversion
      case (n: java.lang.Number, org.apache.spark.sql.types.IntegerType) => Int.box(n.intValue())
      case (n: java.lang.Number, org.apache.spark.sql.types.ShortType) => Short.box(n.shortValue())
      case (n: java.lang.Number, org.apache.spark.sql.types.ByteType) => Byte.box(n.byteValue())
      case (n: java.lang.Number, org.apache.spark.sql.types.LongType) => Long.box(n.longValue())
      case (n: java.lang.Number, org.apache.spark.sql.types.FloatType) => Float.box(n.floatValue())
      case (n: java.lang.Number, org.apache.spark.sql.types.DoubleType) => Double.box(n.doubleValue())
      case _ => v
    }
    val toInternal = CatalystTypeConverters.createToCatalystConverter(keyType)
    val statRows: Seq[InternalRow] =
      if (covered.isEmpty) Nil
      else {
        val minHead = covered.map(_.min.head)
          .reduce((a, b) => if (KeyOrd.compare(Seq(a), Seq(b)) <= 0) a else b)
        val maxHead = covered.map(_.max.head)
          .reduce((a, b) => if (KeyOrd.compare(Seq(a), Seq(b)) >= 0) a else b)
        Seq(InternalRow(toInternal(narrow(minHead)), interior),
          InternalRow(toInternal(narrow(maxHead)), 0L))
      }
    val statsRel = LocalRelation(Seq(kOut, cOut), statRows)
    val branches: Seq[LogicalPlan] =
      if (boundary.isEmpty) Seq(statsRel)
      else {
        // scan ONLY the boundary files, re-apply the ORIGINAL predicate
        // exactly (its attr exprIds restored over the bounded read)
        val bScan = g.storeRef.readFiles(boundary.map(_.path), g.manifestRef)
          .queryExecution.analyzed
        val bAliased = GraftCoRangeJoin.aliasTo(rel.output, bScan)
        val bRows = Project(Seq(
          Alias(keyAttr, kOut.name)(exprId = kOut.exprId),
          Alias(Literal(1L), cOut.name)(exprId = cOut.exprId)),
          Filter(cond, bAliased))
        Seq(statsRel, bRows)
      }
    val src: LogicalPlan = branches match {
      case Seq(only) => only
      case many => Union(many)
    }
    def ae(f: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction) =
      AggregateExpression(f, Complete, isDistinct = false)
    val outExprs: Seq[NamedExpression] = aggExprs.zip(shapes).map { case (a, sh) =>
      val expr: Expression = sh match {
        case CountStar => Coalesce(Seq(ae(Sum(cOut)), Literal(0L)))
        case MinKey => ae(Min(kOut))
        case MaxKey => ae(Max(kOut))
      }
      Alias(expr, a.name)(exprId = a.exprId)
    }
    Some(Aggregate(Nil, outExprs, src, None))
  }
}
