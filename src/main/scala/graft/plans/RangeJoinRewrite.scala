package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** Auto range-join rewrite — a whole-plan optimizer extension (the
  * builder brief's architecture tier (c)): an inner join whose ONLY
  * join predicates are a lower and an upper bound on the same point
  * expression (`pt >= lo AND pt < hi` in any orientation) has no
  * equi-join keys, so Spark plans it as a broadcast-nested-loop /
  * cartesian product — |points|×|intervals| work. This rule rewrites
  * the LOGICAL join into the grid-bucket form [[graft.ops.RangeJoin]]
  * builds by hand: the point side gains its grid cell, the interval
  * side explodes to the cells it may overlap, the join becomes an
  * equi-join on the cell with the ORIGINAL predicates kept as the
  * residual exact filter. Same rewrite class as the range-join
  * optimization commercial Spark platforms apply under a hint; here
  * the hint is the session conf `spark.graft.rangeJoin.binSize`
  * (cell width in the point column's own units; 0/unset disables the
  * rule entirely, so it is opt-in like any join hint).
  *
  * Correctness containment: the enumerated cells `[cell(lo), cell(hi)]`
  * are a SUPERSET of the cells the half-open interval touches for any
  * monotone cell function, and truncating integer division IS monotone
  * for either sign — the residual filter then removes every edge
  * false-positive, so inclusivity/exclusivity and negative domains
  * never change results (ExtSpec pins equality against the unrewritten
  * brute-force join on a signed domain). Null points/bounds produce a
  * null cell, which the cell equi-join drops — exactly the rows the
  * original null-rejecting comparisons dropped.
  *
  * Scale: shuffle ∝ points + interval-cell copies instead of the
  * nested-loop product — pick the bin near the median interval length
  * (each interval explodes to ~len/bin + 1 cells). The rewritten join
  * contains an equi-conjunct, so the rule cannot re-match its own
  * output (idempotent under transformUp), and any join that already
  * has an equi key (e.g. the per-user interval joins) is left alone —
  * Spark's hash joins handle those fine with the range as a post-scan
  * filter.
  *
  * Registration: `spark.sql.extensions=graft.GraftExtensions` injects
  * it at session build; [[ensureRegistered]] adds it to a live
  * session's experimental optimizer rules (tests, REPLs).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val BinConf = "spark.graft.rangeJoin.binSize"

  def ensureRegistered(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(RangeJoinRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ RangeJoinRewrite

  private def binSize: Long =
    try SQLConf.get.getConfString(BinConf, "0").toLong
    catch { case _: NumberFormatException => 0L }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bin = binSize
    if (bin <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, bin).getOrElse(j)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Both canonical orientations (point expr, bound expr, isLower) of a
    * comparison conjunct whose two sides reference the two different
    * join children — `a <= b` is simultaneously "a is a lower bound of
    * b" and "b is an upper bound of a", and which reading is the range
    * join's point only becomes clear when a conjunct pair shares a
    * point expression. */
  private def asBounds(c: Expression, left: LogicalPlan,
      right: LogicalPlan): Seq[(Expression, Expression, Boolean)] = {
    def crossesSides(a: Expression, b: Expression): Boolean = {
      def sideOf(e: Expression): Option[Boolean] = {
        val refs = e.references
        if (refs.isEmpty) None
        else if (refs.subsetOf(left.outputSet)) Some(true)
        else if (refs.subsetOf(right.outputSet)) Some(false)
        else None
      }
      (sideOf(a), sideOf(b)) match {
        case (Some(sa), Some(sb)) => sa != sb
        case _ => false
      }
    }
    // normalize to (small, large): small <= large (strictness handled
    // by the residual filter, so it never affects the cell algebra)
    val ordered = c match {
      case LessThanOrEqual(a, b) => Some((a, b))
      case LessThan(a, b) => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case GreaterThan(a, b) => Some((b, a))
      case _ => None
    }
    ordered match {
      case Some((small, large)) if crossesSides(small, large) =>
        // large as the point (small its lower bound), and
        // small as the point (large its upper bound)
        Seq((large, small, true), (small, large, false))
      case _ => Seq.empty
    }
  }

  private def rewrite(j: Join, bin: Long): Option[LogicalPlan] = {
    val (left, right) = (j.left, j.right)
    val cond = j.condition.get
    val hint = j.hint
    val conjuncts = splitConjuncts(cond)
    // a usable equi key means Spark already has a hash-join shape —
    // leave the join alone (and this also makes the rule idempotent:
    // the rewritten join carries a cell equi-conjunct)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.nonEmpty && a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)) ||
        (b.references.nonEmpty && b.references.subsetOf(left.outputSet) &&
          a.references.subsetOf(right.outputSet))
      case _ => false
    }
    if (hasEqui) return None
    val bounds = conjuncts.flatMap(c => asBounds(c, left, right))
    // need a lower and an upper bound on the SAME point expression,
    // integral-typed (the grid arithmetic is integer division)
    import org.apache.spark.sql.types._
    def isIntegral(dt: DataType): Boolean = dt match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    val lowers = bounds.collect { case (p, b, true) => (p, b) }
    val uppers = bounds.collect { case (p, b, false) => (p, b) }
    val candidates = for {
      (pt1, lo) <- lowers
      (pt2, hi) <- uppers
      if pt1.semanticEquals(pt2)
      if isIntegral(pt1.dataType) && isIntegral(lo.dataType) &&
        isIntegral(hi.dataType)
    } yield (pt1, lo, hi)
    candidates.headOption.map { case (pt, lo, hi) =>
      val ptOnLeft = pt.references.subsetOf(left.outputSet)
      def cell(e: Expression): Expression =
        new IntegralDivide(Cast(e, LongType), Literal(bin))
      val ptCell = AttributeReference("__graft_pt_cell", LongType)()
      val ivCell = AttributeReference("__graft_iv_cell", LongType)()
      val (pointChild, ivChild) = if (ptOnLeft) (left, right) else (right, left)
      val pointPlan = Project(
        pointChild.output :+ Alias(cell(pt), ptCell.name)(ptCell.exprId),
        pointChild)
      val ivPlan = Generate(
        // Sequence is TimeZoneAware (for temporal sequences): without a
        // zone it reports unresolved and the optimizer rejects the plan
        Explode(Sequence(cell(lo), cell(hi), None)
          .withTimeZone(SQLConf.get.sessionLocalTimeZone)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(ivCell), child = ivChild)
      val (newLeft, newRight) =
        if (ptOnLeft) (pointPlan, ivPlan) else (ivPlan, pointPlan)
      val newCond = And(EqualTo(ptCell, ivCell), cond)
      Project(j.output,
        Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
