package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule canonicalizing the reference's optional-filter stack
  * into sargable predicates (SURVEY §4's reserved Catalyst extension).
  *
  * The reference serves every filter through text-typed bind parameters
  * (`app/api/v2/queries.py:17-23` — `(:p IS NULL OR col = :p)` with
  * params arriving as strings from the HTTP layer, `routes.py`). Once
  * parameters bind, Catalyst's `ConstantFolding`/`BooleanSimplification`
  * clear the `IS NULL OR` scaffolding on their own — but the text-typed
  * equality survives as `CAST(col AS STRING) = 'p'`, which defeats both
  * parquet pushdown and partition pruning: Spark's own
  * `UnwrapCastInBinaryComparison` unwraps numeric widening casts, not
  * string casts. At 100 TB that is the difference between a footer-level
  * row-group skip and a full-column scan.
  *
  * This rule unwraps `CAST(col AS STRING) = 'p'` (and `<=>`, `IN`) into
  * `col = typed(p)` when the rewrite is provably exact:
  *
  *  - the child type's string rendering is INJECTIVE (integral types,
  *    DATE, TIMESTAMP under the session zone): distinct values render to
  *    distinct strings, so `str(col) = str(v)` ⇔ `col = v`, and the
  *    null cases align on both sides (cast of null is null). The rewrite
  *    is therefore valid in ANY expression context, not just filters.
  *  - the literal ROUND-TRIPS: `cast(cast('p' AS T) AS STRING) = 'p'`,
  *    checked at plan time on the literal. A non-canonical parameter
  *    ('05', '2024-1-2', 'abc') matches nothing under string equality,
  *    and a naive typed rewrite would wrongly match; those are left
  *    untouched (correct, just unpushed — the degenerate case).
  *
  * Range comparisons (`>=`, `<`) are deliberately NOT unwrapped: string
  * order is lexicographic, and although fixed-width canonical renderings
  * happen to be order-isomorphic, variable-width values (years < 1000,
  * fractional seconds, negative numbers) are not — equality is the only
  * obviously-total case, and it is the one the reference's id/flag
  * filters use.
  *
  * Injected via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.functions.GraftExtensions]]) so it joins the operator-
  * optimization fixed point BEFORE filter pushdown consumes the plan.
  * Toggleable per-session (`spark.graft.unwrapStringCast.enabled`) so
  * plan tests can assert the with/without difference.
  */
object UnwrapStringCast extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.unwrapStringCast.enabled"

  /** Injectivity of the string rendering, PER ZONE for zoned
    * timestamps: in a DST-observing zone the fall-back hour repeats —
    * two distinct instants render to the same wall-clock string (no
    * offset suffix), so `str(ts) = 'p'` matches both while `ts = lit`
    * matches only the parser's pick. The literal round-trip check
    * cannot catch this (it round-trips fine), so TimestampType is only
    * injective when the resolved zone has a fixed offset (UTC, +05:30).
    * TimestampNTZ / DATE / integrals are zone-free and always safe. */
  private def injective(dt: DataType, tz: Option[String]): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampNTZType => true
    case TimestampType =>
      val zone = tz.getOrElse(conf.sessionLocalTimeZone)
      try {
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .getZoneId(zone).getRules.isFixedOffset
      } catch { case _: Exception => false }
    case _ => false
  }

  private def isDefaultString(dt: DataType): Boolean = dt == StringType

  /** Parse `s` back into `dt` and demand an exact string round-trip;
    * the typed literal is returned only when the rewrite is exact. */
  private def roundTrip(
      s: UTF8String, dt: DataType, tz: Option[String]): Option[Literal] = {
    val zone = tz.orElse(Some(conf.sessionLocalTimeZone))
    val parsed = Cast(Literal(s, StringType), dt, zone, EvalMode.TRY).eval(null)
    if (parsed == null) None
    else {
      val back =
        Cast(Literal(parsed, dt), StringType, zone, EvalMode.LEGACY).eval(null)
      if (s == back) Some(Literal(parsed, dt)) else None
    }
  }

  private object UnwrappableCast {
    def unapply(e: Expression): Option[(Expression, Option[String])] = e match {
      case Cast(child, dt, tz, _)
          if isDefaultString(dt) && injective(child.dataType, tz) &&
            !child.foldable =>
        Some((child, tz))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else plan.transformAllExpressions {
      case eq @ EqualTo(UnwrappableCast(child, tz), Literal(s: UTF8String, st))
          if isDefaultString(st) =>
        roundTrip(s, child.dataType, tz)
          .map(l => EqualTo(child, l)).getOrElse(eq)
      case eq @ EqualTo(Literal(s: UTF8String, st), UnwrappableCast(child, tz))
          if isDefaultString(st) =>
        roundTrip(s, child.dataType, tz)
          .map(l => EqualTo(l, child)).getOrElse(eq)
      case eq @ EqualNullSafe(
            UnwrappableCast(child, tz), Literal(s: UTF8String, st))
          if isDefaultString(st) =>
        roundTrip(s, child.dataType, tz)
          .map(l => EqualNullSafe(child, l)).getOrElse(eq)
      case eq @ EqualNullSafe(
            Literal(s: UTF8String, st), UnwrappableCast(child, tz))
          if isDefaultString(st) =>
        roundTrip(s, child.dataType, tz)
          .map(l => EqualNullSafe(l, child)).getOrElse(eq)
      // IN over an all-literal list: rewrite only when EVERY element
      // round-trips — dropping a non-matching element would be sound for
      // non-null lists, but keeping the all-or-nothing contract makes
      // the rewrite trivially exact (same element count, same nulls).
      case in @ In(UnwrappableCast(child, tz), list)
          if list.nonEmpty && list.forall {
            case Literal(_: UTF8String, st) => isDefaultString(st)
            case _ => false
          } =>
        val typed = list.flatMap {
          case Literal(s: UTF8String, _) => roundTrip(s, child.dataType, tz)
          case _ => None
        }
        if (typed.length == list.length) In(child, typed) else in
    }
}
