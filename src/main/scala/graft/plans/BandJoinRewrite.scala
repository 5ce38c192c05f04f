package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule vectorizing NON-EQUI band joins.
  *
  * A join whose only condition is a band — `l.t BETWEEN r.t - w1 AND
  * r.t + w2` with no equality conjunct — gives Spark nothing to hash
  * or sort on: the planner falls back to `BroadcastNestedLoopJoin`,
  * which compares every row pair. At 100 TB that is the difference
  * between a shuffle join and an O(|L|·|R|) scan that never finishes.
  * The repo's temporal operators avoid the trap by HAND-bucketing
  * (`q_t2_range_join`); this rule applies the same transformation to
  * the naive form a user actually writes, inside Catalyst:
  *
  *   bucket size B = w1 + w2 + 1, so any pair within the band has
  *   floor-div buckets differing by at most 1. The LEFT side generates
  *   3 probe rows (bucket − 1, bucket, bucket + 1); the join becomes
  *   an EQUI-join on (probe bucket == right bucket) with the original
  *   band kept as a residual filter. Each qualifying pair matches
  *   exactly once (the probe set hits each bucket value once), so no
  *   dedup is needed — candidate volume is 3·|L| plus bucket-aligned
  *   pairs instead of |L|·|R|.
  *
  * Scope (everything else is left untouched): INNER joins, both band
  * columns `LongType` expressions drawing from exactly one side each,
  * non-negative literal widths, and no existing equi conjunct (if one
  * exists the hash join is already available and the rewrite would
  * just add work). Floor division uses Math.floorDiv semantics built
  * wrap-safely from a truncating divide minus one when the remainder
  * is negative (exact for all Long inputs at B ≥ 2 — no intermediate
  * can overflow); the degenerate B = 1 band (w1 = w2 = 0) is plain
  * equality and surfaces directly as an equi conjunct instead, which
  * also preserves floorDiv's B ≥ 2 contract. The rewrite is
  * idempotent — the produced join HAS an equi conjunct, so the rule
  * skips it on the optimizer's next fixed-point pass. Toggleable per
  * session for the PlanSpec with/without comparison.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.bandJoinRewrite.enabled"

  private def isEqui(l: LogicalPlan, r: LogicalPlan, e: Expression): Boolean =
    e match {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
      case EqualNullSafe(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
      case _ => false
    }

  /** (leftExpr, rightExpr, w1, w2) for `la >= rb − w1` / `la <= rb + w2`
    * conjunct pairs, with `la` from the left side and `rb` the SAME
    * expression on the right side in both bounds. */
  private def bandOf(l: LogicalPlan, r: LogicalPlan,
                     conjuncts: Seq[Expression])
  : Option[(Expression, Expression, Long, Long, Seq[Expression])] = {
    def side(e: Expression): Option[Boolean] = // true = left
      if (e.references.nonEmpty && e.references.subsetOf(l.outputSet)) Some(true)
      else if (e.references.nonEmpty && e.references.subsetOf(r.outputSet)) Some(false)
      else None
    // normalize each conjunct to (la, rb, kind, w): kind ≥ is lower bound
    sealed case class Bound(la: Expression, rb: Expression, lower: Boolean,
                            w: Long)
    def asBound(e: Expression): Option[Bound] = {
      def norm(a: Expression, b: Expression, lower: Boolean): Option[Bound] =
        (side(a), b) match {
          case (Some(true), Subtract(rb, Literal(w: Long, LongType), _))
              if side(rb).contains(false) && w >= 0 && a.dataType == LongType =>
            if (lower) Some(Bound(a, rb, lower = true, w)) else None
          case (Some(true), Add(rb, Literal(w: Long, LongType), _))
              if side(rb).contains(false) && w >= 0 && a.dataType == LongType =>
            if (!lower) Some(Bound(a, rb, lower = false, w)) else None
          case _ => None
        }
      e match {
        case GreaterThanOrEqual(a, b) => norm(a, b, lower = true)
        case LessThanOrEqual(a, b) => norm(a, b, lower = false)
        case _ => None
      }
    }
    val bounds = conjuncts.map(c => c -> asBound(c))
    val lower = bounds.collectFirst { case (c, Some(b)) if b.lower => (c, b) }
    val upper = bounds.collectFirst { case (c, Some(b)) if !b.lower => (c, b) }
    (lower, upper) match {
      case (Some((cl, bl)), Some((cu, bu)))
          if bl.la.semanticEquals(bu.la) && bl.rb.semanticEquals(bu.rb) =>
        val rest = conjuncts.filterNot(c => c.eq(cl) || c.eq(cu))
        Some((bl.la, bl.rb, bl.w, bu.w, rest))
      case _ => None
    }
  }

  /** Wrap-safe floor division for b >= 2 (Math.floorDiv semantics):
    * truncating divide, minus one when the remainder is negative. The
    * previous x - pmod(x, b) form wrapped past Long.MinValue for x
    * within pmod(x, b) of the domain edge, silently mis-bucketing
    * (and so DROPPING) qualifying pairs near Long.MinValue. Here the
    * quotient magnitude is at most 2^62 for b >= 2, so neither the
    * divide nor the -1 adjustment can overflow. */
  private def floorDiv(x: Expression, b: Long): Expression = {
    val q = IntegralDivide(x, Literal(b))
    val r = Remainder(x, Literal(b))
    Add(q, If(LessThan(r, Literal(0L)), Literal(-1L), Literal(0L)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else plan.transform {
      case j @ Join(l, r, Inner, Some(cond), hint)
          if j.resolved && !cond.exists(!_.deterministic) => {
        val conjuncts = splitConjunctivePredicates(cond)
        if (conjuncts.exists(isEqui(l, r, _))) j
        else bandOf(l, r, conjuncts) match {
          case Some((la, rb, w1, w2, _)) if w1 <= (Long.MaxValue - 1) / 2 &&
              w2 <= (Long.MaxValue - 1) / 2 =>
            // (guard: w1 + w2 + 1 must not overflow — absurd widths
            // keep the nested loop rather than mis-bucketing)
            val b = w1 + w2 + 1
            if (b == 1L) {
              // Zero-width band (w1 = w2 = 0) is plain equality:
              // surface the equi key and let Spark hash-join it —
              // also keeps floorDiv's b >= 2 no-overflow contract.
              Join(l, r, Inner, Some(And(EqualTo(la, rb), cond)), hint)
            } else {
            val bl = floorDiv(la, b)
            val probes = CreateArray(Seq(
              Subtract(bl, Literal(1L)), bl, Add(bl, Literal(1L))))
            val bAttr = AttributeReference("__band_bucket", LongType)()
            val gen = Generate(Explode(probes), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(bAttr), child = l)
            val newCond = And(EqualTo(bAttr, floorDiv(rb, b)), cond)
            Project(j.output, Join(gen, r, Inner, Some(newCond), hint))
            }
          case _ => j
        }
      }
    }
}
