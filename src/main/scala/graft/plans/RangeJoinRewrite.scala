package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, IntegerType,
  LongType, TimestampType}

/** Optimizer rule: rewrite a DECLARATIVE bounded-difference (range)
  * theta-join
  *
  * {{{ a.join(b, b("t") >= a("t") - W && b("t") <= a("t")) }}}
  *
  * — more generally any pair of conjuncts bounding `x - y` in `[lo, hi]`
  * with `x` a LongType or TimestampType expression over one side and `y`
  * over the other (timestamps are normalized to the micros domain via
  * `UnixMicros`, with `± INTERVAL` day-time arithmetic folded into the
  * bounds) —
  * into a union of TWO disjoint bucketed EQUI-joins. Without the rewrite
  * Catalyst has no equi-conjunct to extract, so it plans a cartesian /
  * broadcast-nested-loop join — O(n·m) comparisons, dead at scale. With
  * bucket width `B = hi - lo`, `y` in `[x - hi, x - lo]` implies
  * `y div B` is `(x - lo) div B` or `(x - lo) div B - 1` (truncated
  * division is monotone and moves by at most one across an interval of
  * width B, for all signs), so
  *
  *  - branch 0 joins on `(x - lo) div B === y div B`,
  *  - branch 1 joins on `(x - lo) div B === y div B + 1`,
  *
  * and the two branches PARTITION the candidate space (the bucket
  * equalities are mutually exclusive), so row multiplicity is preserved
  * exactly — no dedup pass, safe under duplicate rows. Candidates per
  * bucket are bounded by two windows of traffic, never a whole input.
  * When `hi == lo` the difference is pinned (`x - y = hi`) and a single
  * plain equi-join branch on `x - hi === y` suffices.
  *
  * Scope guards (anything outside falls through untouched):
  *  - inner/cross join whose condition's conjuncts yield both a lower
  *    and an upper bound on the same semantic `(x, y)` pair; `x`/`y` may
  *    carry literal offsets (`Add`/`Subtract` with int/long literals are
  *    folded into the bounds); strict `<`/`>` tighten the constant by 1
  *    (exact over integral types);
  *  - no existing cross-side equi-conjunct (then the join is already
  *    hash-joinable and bucketing would only add a second scan);
  *  - both inputs deterministic (each side is re-instantiated once per
  *    branch, as in [[HammingJoinRewrite]]).
  *
  * The branch joins keep the ORIGINAL condition verbatim (the exact
  * range test and any other conjuncts), so the rewrite can never change
  * the result set — only the access path. For hand-tuned pipelines
  * [[graft.operators.IntervalJoin]] is the single-scan form (it fans the
  * right side out with one explode instead of re-reading it per branch);
  * this rule is the rescue path for ad-hoc declarative queries,
  * registered via [[graft.GraftExtensions]].
  *
  * Reference analog: window-bounded span/date alignment
  * (`/root/reference/edsnlp/pipes/misc/sections/sections.py`, qualifier
  * context windows) surfaced as a plan transformation.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** An inequality conjunct normalized to `x - y <= c` (upper = true)
    * or `x - y >= c` (upper = false), x over `left`, y over `right`.
    */
  private case class DiffBound(x: Expression, y: Expression, c: Long,
      upper: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt, Some(cond), hint)
        if (jt == Inner || jt == Cross) && deterministic(j) =>
      val conjuncts = splitConjunctivePredicates(cond)
      def sides(a: Expression, b: Expression): Boolean = {
        val (ra, rb) = (a.references, b.references)
        ra.nonEmpty && rb.nonEmpty &&
          ((ra.subsetOf(left.outputSet) && rb.subsetOf(right.outputSet)) ||
            (ra.subsetOf(right.outputSet) && rb.subsetOf(left.outputSet)))
      }
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) => sides(a, b)
        case _ => false
      }
      val bounds =
        if (hasEqui) Nil
        else conjuncts.flatMap(diffBound(_, left, right))
      // first (x, y) pair with both an upper and a lower bound; take the
      // tightest of each
      val window = bounds.filter(_.upper).flatMap { ub =>
        val lbs = bounds.filter(b => !b.upper &&
          b.x.semanticEquals(ub.x) && b.y.semanticEquals(ub.y))
        if (lbs.isEmpty) None
        else {
          val hi = bounds.filter(b => b.upper &&
            b.x.semanticEquals(ub.x) && b.y.semanticEquals(ub.y))
            .map(_.c).min
          Some((ub.x, ub.y, lbs.map(_.c).max, hi))
        }
      }.headOption
      window match {
        case Some((x, y, lo, hi)) if hi == lo =>
          // difference pinned: x - y = hi is an ordinary equi-join key
          val branchCond = And(EqualTo(Subtract(x, Literal(hi)), y), cond)
          Join(left, right, Inner, Some(branchCond), hint)
        case Some((x, y, lo, hi)) if hi > lo =>
          val b = Literal(hi - lo)
          val lb = IntegralDivide(Subtract(x, Literal(lo)), b)
          val rb = IntegralDivide(y, b)
          val branches: Seq[LogicalPlan] = Seq(
            Join(left, right, Inner,
              Some(And(EqualTo(lb, rb), cond)), hint),
            Join(left, right, Inner,
              Some(And(EqualTo(lb, Add(rb, Literal(1L))), cond)), hint))
          branches.reduce[LogicalPlan]((a, c) => Union(a, c))
        case _ => j // no window (or contradictory bounds: hi < lo)
      }
  }

  /** `attr-with-offset` decomposition: e = base + off with off folded
    * from Add/Subtract literal wrappers. Bases normalize to the Long
    * MICROS domain: a LongType base passes through; a TimestampType base
    * wraps in `UnixMicros` (a monotone bijection, so every comparison is
    * preserved) with `ts ± INTERVAL` day-time arithmetic folded into the
    * offset — `a.join(b, $"v_ts".between($"ts" - expr("INTERVAL 15
    * MINUTES"), $"ts"))` is recognized directly. Year-month intervals are
    * NOT constant-width in micros and fall through unrecognized.
    */
  private def decompose(e: Expression): Option[(Expression, Long)] =
    e match {
      case Add(a, IntegralLiteral(c), _) => decompose(a).map {
        case (b, o) => (b, o + c) }
      case Add(IntegralLiteral(c), a, _) => decompose(a).map {
        case (b, o) => (b, o + c) }
      case Subtract(a, IntegralLiteral(c), _) => decompose(a).map {
        case (b, o) => (b, o - c) }
      case TimestampAddInterval(t, Literal(c: Long, _: DayTimeIntervalType),
          _) => decompose(t).map { case (b, o) => (b, o + c) }
      case _ if e.dataType == LongType => Some((e, 0L))
      case _ if e.dataType == TimestampType => Some((UnixMicros(e), 0L))
      case _ => None
    }

  private object IntegralLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case _ => None
    }
  }

  /** Normalize one conjunct to a bound on `x - y` with x over left and
    * y over right. Strict forms tighten by 1 — exact over integers.
    */
  private def diffBound(c: Expression, left: LogicalPlan,
      right: LogicalPlan): Seq[DiffBound] = {
    // a <= b + slack  (slack -1 encodes the strict form)
    def leq(a: Expression, b: Expression, slack: Long): Seq[DiffBound] =
      (decompose(a), decompose(b)) match {
        case (Some((p, ca)), Some((q, cb)))
            if p.references.nonEmpty && q.references.nonEmpty =>
          if (p.references.subsetOf(left.outputSet) &&
              q.references.subsetOf(right.outputSet))
            // p - q <= cb - ca + slack
            Seq(DiffBound(p, q, cb - ca + slack, upper = true))
          else if (p.references.subsetOf(right.outputSet) &&
              q.references.subsetOf(left.outputSet))
            // q - p >= ca - cb - slack
            Seq(DiffBound(q, p, ca - cb - slack, upper = false))
          else Nil
        case _ => Nil
      }
    c match {
      case LessThanOrEqual(a, b) => leq(a, b, 0L)
      case LessThan(a, b) => leq(a, b, -1L)
      case GreaterThanOrEqual(a, b) => leq(b, a, 0L)
      case GreaterThan(a, b) => leq(b, a, -1L)
      case _ => Nil
    }
  }

  private def deterministic(p: LogicalPlan): Boolean =
    p.collectFirst {
      case q if q.expressions.exists(!_.deterministic) => q
    }.isEmpty
}
