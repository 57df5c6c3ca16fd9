package graft.sources

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Descending, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, NullsLast, RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, Union, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.core.KVIndex
import graft.plans.AsOfZipJoin

/** Recognizes the classic AS-OF SQL idiom over two graft snapshots and
  * plans the exchange-free ordered merge ([[graft.plans.AsOfZipJoin]])
  * instead of the shuffle + window it would otherwise cost:
  *
  * {{{
  *   SELECT ... FROM (
  *     SELECT p.*, r.*, row_number() OVER (
  *       PARTITION BY p.<left keys...> ORDER BY r.rts DESC) AS rn
  *     FROM cat.probes p [LEFT] JOIN cat.readings r
  *       ON p.k = r.k AND r.rts <= p.ts   -- or < for strictly-before
  *   ) WHERE rn = 1
  * }}}
  *
  * This is the engine's OWN fallback shape ([[graft.core.KVIndex.asOfJoin]]'s
  * `stockAsOf`), so the rewrite is exactly the inverse of that lowering.
  * Matched plan fragment: `Filter(rn = 1, Window([row_number() AS rn],
  * partitionSpec, orderSpec, join))` with an optional `WindowGroupLimit`
  * and an optional column-pruning `Project` between Window and Join (both
  * optimizer-inserted). The replacement emits `rn` as the literal 1 (it
  * is 1 for every surviving row), so enclosing operators are untouched.
  *
  * Eligibility — the stock plan stays unless ALL hold:
  *  - join type INNER or LEFT OUTER; both sides plain graft scans under
  *    deterministic Filters/Projects (replayed below the merge, exactly
  *    where the stock plan evaluated them);
  *  - the condition is leading-prefix key equalities on BOTH snapshots
  *    plus EXACTLY ONE ts bound `r.rts <= l.lts` (`<` = strict) between
  *    plain attributes — any extra conjunct (tolerance arithmetic,
  *    value predicates) declines;
  *  - PARTITION BY covers the LEFT snapshot's full key (keys are unique
  *    under the engine's contract, so partitions are per-left-row — the
  *    exact requirement for window-pick == as-of semantics); extra
  *    left-side attrs are harmless and allowed;
  *  - ORDER BY is `rts DESC [NULLS LAST]` followed positionally by the
  *    right snapshot's remaining key columns DESC — exactly the merge's
  *    deterministic greatest-(ts, rest) pick. A bare `rts DESC` with
  *    trailing right key columns left unordered would be a
  *    nondeterministic pick and declines;
  *  - the filter keeps rank 1 (`rn = 1` / `rn <= 1`); other conjuncts
  *    replay above the merge.
  *
  * Scale shape: identical to the API as-of join — legs cut at equi-prefix
  * grain from both manifests, per-leg one-candidate ordered merge, zero
  * exchanges, no window, O(1) memory beyond the local leg sorts.
  */
object GraftAsOfIdiom extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(_, w: Window) => rewrite(f, w).getOrElse(f)
  }

  private def isRankOne(e: Expression, rn: Attribute): Boolean = e match {
    case EqualTo(a: AttributeReference, Literal(1, IntegerType)) => a.exprId == rn.exprId
    case EqualTo(Literal(1, IntegerType), a: AttributeReference) => a.exprId == rn.exprId
    case LessThanOrEqual(a: AttributeReference, Literal(1, IntegerType)) => a.exprId == rn.exprId
    case GreaterThanOrEqual(Literal(1, IntegerType), a: AttributeReference) => a.exprId == rn.exprId
    case _ => false
  }

  private def rewrite(f: Filter, w: Window): Option[LogicalPlan] = {
    // exactly one window expression: row_number() (its frame is fixed by
    // the analyzer; the function alone identifies the idiom)
    val rnAttr = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)) => a.toAttribute
      case _ => return None
    }
    val fConjuncts = GraftCoRangeJoin.conjuncts(f.condition)
    val (rankConj, restConj) = fConjuncts.partition(isRankOne(_, rnAttr))
    if (rankConj.isEmpty) return None
    // the leftover filter conjuncts replay above; they may reference rn
    // (it is the literal 1 there after the rewrite)

    // peel the optimizer's WindowGroupLimit, then an interposed Project
    // (column pruning AND inner-SELECT aliases pushed below the window —
    // its inputs are join outputs, so it replays verbatim over the merge)
    val beneath = w.child match {
      case wgl: WindowGroupLimit if wgl.limit >= 1 => wgl.child
      case other => other
    }
    val (interposed, j) = beneath match {
      case p @ Project(ps, jj: Join) if ps.forall(_.deterministic) => (Some(p), jj)
      case jj: Join => (None, jj)
      case _ => return None
    }
    val (jt, leftOuter) = j.joinType match {
      case Inner => (Inner: JoinType, false)
      case LeftOuter => (LeftOuter: JoinType, true)
      case _ => return None
    }
    val cond = j.condition.getOrElse(return None)
    val (lrel, lg, lRebuild) = GraftCoRangeJoin.side(j.left).getOrElse(return None)
    val (rrel, rg, rRebuild) = GraftCoRangeJoin.side(j.right).getOrElse(return None)
    val lIds = lrel.output.map(_.exprId).toSet
    val rIds = rrel.output.map(_.exprId).toSet
    val lOut = j.left.outputSet
    val rOut = j.right.outputSet

    // split the condition: equi pairs on relation attrs + ONE ts bound
    var equi = Vector.empty[(AttributeReference, AttributeReference)]
    var ts: Option[(AttributeReference, AttributeReference, Boolean)] = None // (lTs, rTs, strict)
    GraftCoRangeJoin.conjuncts(cond).foreach {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if lIds.contains(a.exprId) && rIds.contains(b.exprId) => equi :+= ((a, b))
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if lIds.contains(a.exprId) && rIds.contains(b.exprId) => equi :+= ((a, b))
      case LessThanOrEqual(r: AttributeReference, l: AttributeReference)
          if rOut.contains(r) && lOut.contains(l) && ts.isEmpty => ts = Some((l, r, false))
      case GreaterThanOrEqual(l: AttributeReference, r: AttributeReference)
          if rOut.contains(r) && lOut.contains(l) && ts.isEmpty => ts = Some((l, r, false))
      case LessThan(r: AttributeReference, l: AttributeReference)
          if rOut.contains(r) && lOut.contains(l) && ts.isEmpty => ts = Some((l, r, true))
      case GreaterThan(l: AttributeReference, r: AttributeReference)
          if rOut.contains(r) && lOut.contains(l) && ts.isEmpty => ts = Some((l, r, true))
      case _ => return None
    }
    val (lTs, rTs, strict) = ts.getOrElse(return None)
    if (lTs.dataType != rTs.dataType) return None

    // equi pairs must cover a leading prefix of BOTH key lists; the ts
    // attrs must sit outside the equi prefix
    val lKeyCols = lg.manifestRef.keyCols
    val rKeyCols = rg.manifestRef.keyCols
    val names = equi.map { case (a, b) => (a.name, b.name) }.distinct
    val m = names.size
    if (m == 0 || m > math.min(lKeyCols.size, rKeyCols.size)) return None
    if (names.toSet != lKeyCols.take(m).zip(rKeyCols.take(m)).toSet) return None
    if (lKeyCols.take(m).contains(lTs.name) && lIds.contains(lTs.exprId)) return None
    if (rKeyCols.take(m).contains(rTs.name) && rIds.contains(rTs.exprId)) return None

    // PARTITION BY: left-side attrs only, covering the left snapshot's
    // FULL key (unique => one partition per left row)
    val lByName = lrel.output.map(a => a.name -> a).toMap
    if (!w.partitionSpec.forall {
      case a: AttributeReference => lOut.contains(a)
      case _ => false
    }) return None
    val psIds = w.partitionSpec.collect { case a: AttributeReference => a.exprId }.toSet
    if (!lKeyCols.forall(c => lByName.get(c).exists(a => psIds.contains(a.exprId))))
      return None

    // ORDER BY: rts DESC, then the right snapshot's remaining key columns
    // DESC, positionally — the merge's greatest-(ts, rest) pick. NULLS
    // LAST (DESC's default) required: matched candidates never carry a
    // null ts, but a NULLS FIRST on a rest column would invert the pick.
    val rByName = rrel.output.map(a => a.name -> a).toMap
    val rRestNames = rKeyCols.drop(m).filterNot(_ == rTs.name)
    val wantedOrder: Seq[Attribute] =
      rTs +: rRestNames.map(c => rByName.getOrElse(c, return None))
    val os = w.orderSpec
    if (os.size != wantedOrder.size) return None
    os.zip(wantedOrder).foreach {
      case (SortOrder(a: AttributeReference, Descending, no, _), want)
          if a.exprId == want.exprId && (no == NullsLast || !a.nullable) => ()
      case _ => return None
    }

    // build the co-range legs at equi-prefix grain (both manifests), the
    // API asOfJoin's construction — zero exchanges, probe-side included
    val lIx = new KVIndex(lg.storeRef, lg.manifestRef)
    val rIx = new KVIndex(rg.storeRef, rg.manifestRef)
    val rRestAttrs = rRestNames.map(rByName)
    lIx.coRangeLegPlans(rIx, GraftCoRangeJoin.rowsPerLegConf(),
        lg.pushedKeyBounds, rg.pushedKeyBounds, jt, keyLen = m).map {
      case (zipOpt, leftOnlyOpt, _) =>
        val lEqui = lKeyCols.take(m).map(c => equi.find(_._1.name == c).get._1)
        val rEqui = lKeyCols.take(m).map(c => equi.find(_._1.name == c).get._2)
        val zip = zipOpt.map { case (lPlan, rPlan, _, _) =>
          AsOfZipJoin(
            lRebuild(GraftCoRangeJoin.aliasTo(lrel.output, lPlan)),
            rRebuild(GraftCoRangeJoin.aliasTo(rrel.output, rPlan)),
            lEqui, rEqui, lTs, rTs,
            Nil, rRestAttrs, leftOuter, strict, tolerance = -1L)
        }
        // equi ranges only the left covers: null-extend (left_outer only;
        // inner construction returns no left-only branch)
        val leftOnly = leftOnlyOpt.map { lp =>
          val stack = lRebuild(GraftCoRangeJoin.aliasTo(lrel.output, lp))
          Project(stack.output ++ j.right.output.map(a =>
            Alias(Literal(null, a.dataType), a.name)(exprId = a.exprId)), stack)
        }
        val merged: LogicalPlan = Seq(zip, leftOnly).flatten match {
          case Seq(only) => only
          case many => Union(many)
        }
        // replay the interposed Project (its inputs are join outputs,
        // which `merged` provides under the same exprIds), then reproduce
        // the Window's output: its child's columns + rn == literal 1
        val withProj: LogicalPlan = interposed match {
          case Some(p) => Project(p.projectList, merged)
          case None => merged
        }
        val base = Project(withProj.output :+
          Alias(Literal(1, IntegerType), rnAttr.name)(exprId = rnAttr.exprId),
          withProj)
        if (restConj.isEmpty) base
        else Filter(restConj.reduce(
          org.apache.spark.sql.catalyst.expressions.And(_, _)), base)
    }
  }
}
