package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join,
  LogicalPlan, Union}
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
  * the result set — only the access path. Rows within the tracked
  * overflow `margin` of the Long range edge (where the bucket
  * arithmetic — or the user's own offsets — would overflow) are
  * excluded from the bucket branches and routed through two near-empty
  * edge-filtered RESCUE branches that replay the original condition
  * with identical wrap-or-throw behavior, so fidelity holds across the
  * full 64-bit domain in both ANSI and legacy arithmetic modes. For hand-tuned pipelines
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

  /** Marks joins this rule emitted: the rescue limbs keep the original
    * (equi-free) condition, so without the tag the rule would re-fire on
    * its own output forever (transformDown visits replaced subtrees).
    */
  private val rewrittenTag =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean](
      "graft.rangeJoinRewritten")

  /** An inequality conjunct normalized to `x - y <= c` (upper = true)
    * or `x - y >= c` (upper = false), x over `left`, y over `right`.
    * `margin` = how close to the Long range edge a base value must be
    * before 64-bit arithmetic (the user's own offsets, or the rewrite's
    * `x - lo`) can wrap for this conjunct — the edge-zone radius the
    * rescue branches must cover.
    */
  private case class DiffBound(x: Expression, y: Expression, c: Long,
      upper: Boolean, margin: Long)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt, Some(cond), hint)
        if (jt == Inner || jt == Cross) && deterministic(j) &&
          j.getTagValue(rewrittenTag).isEmpty =>
      val conjuncts = splitConjunctivePredicates(cond)
      def sides(a: Expression, b: Expression): Boolean = {
        val (ra, rb) = (a.references, b.references)
        ra.nonEmpty && rb.nonEmpty &&
          ((ra.subsetOf(left.outputSet) && rb.subsetOf(right.outputSet)) ||
            (ra.subsetOf(right.outputSet) && rb.subsetOf(left.outputSet)))
      }
      val hasEqui = conjuncts.exists {
        // EqualNullSafe is a hash-joinable key too — rewriting on top of
        // either equality form would only add a second scan
        case EqualTo(a, b) => sides(a, b)
        case EqualNullSafe(a, b) => sides(a, b)
        case _ => false
      }
      val bounds =
        if (hasEqui) Nil
        else conjuncts.flatMap(diffBound(_, left, right))
      // first (x, y) pair with both an upper and a lower bound; take the
      // tightest of each
      val window = bounds.filter(_.upper).flatMap { ub =>
        val same = bounds.filter(b =>
          b.x.semanticEquals(ub.x) && b.y.semanticEquals(ub.y))
        val lbs = same.filter(!_.upper)
        if (lbs.isEmpty) None
        else {
          val hi = same.filter(_.upper).map(_.c).min
          val lo = lbs.map(_.c).max
          Some((ub.x, ub.y, lo, hi, same.map(_.margin).max))
        }
      }.headOption
      window match {
        case Some((x, y, lo, hi, margin0)) if hi >= lo &&
            scala.util.Try(Math.subtractExact(hi, lo)).isSuccess &&
            margin0 < (1L << 61) =>
          // B == 1 adds one more wrap site: branch 1's `rb + 1` for a
          // base AT the very edge
          val margin =
            if (hi - lo == 1L) math.max(margin0, 1L) else margin0
          // FIDELITY IS TO SPARK'S OWN EVALUATION of the original
          // condition — in BOTH arithmetic modes. For rows within
          // `margin` of the Long range edge the rewrite's `x - lo` (and
          // for such rows possibly the user's own offsets) overflow:
          // non-ANSI that wraps the row into a far-away bucket (silently
          // dropping pairs the un-rewritten join emits), ANSI it throws
          // on an expression THE USER NEVER WROTE. `margin`
          // conservatively covers every partial offset sum and both
          // window bounds, so: bucket branches handle all rows OUTSIDE
          // the edge zones exactly (their keys If-neutralize edge rows —
          // see `keyed` — so ANSI key evaluation cannot throw), and rows
          // inside an edge zone route to rescue branches that keep the
          // ORIGINAL condition verbatim — identical wrap-or-throw
          // behavior to the un-rewritten join, behind pushed-down
          // near-empty edge filters (with AQE an empty zone eliminates
          // the branch at runtime). Branches partition the row space, so
          // multiplicity is preserved with no dedup.
          def edge(v: Expression): Expression =
            Or(GreaterThan(v, Literal(Long.MaxValue - margin)),
              LessThan(v, Literal(Long.MinValue + margin)))
          val guards: Seq[Expression] =
            if (margin == 0L) Nil
            else Seq(Not(edge(x)), Not(edge(y)))
          // ANSI subtlety: the hash join evaluates EXTRACTED key
          // expressions on every row, OUTSIDE the condition's
          // short-circuit — so a key that can overflow must neutralize
          // its own edge rows (If evaluates lazily; bucket 0 for an edge
          // row is harmless because the guard conjunct still excludes it
          // from the result)
          def keyed(v: Expression, k: Expression): Expression =
            if (margin == 0L) k else If(edge(v), Literal(0L), k)
          val bucketBranches: Seq[LogicalPlan] =
            if (hi == lo) {
              // difference pinned: x - y = hi is an ordinary equi-join key
              val eq = EqualTo(keyed(x, Subtract(x, Literal(hi))), y)
              Seq(Join(left, right, Inner,
                Some((guards :+ eq :+ cond).reduce(And)), hint))
            } else {
              val b = Literal(hi - lo)
              val lb = keyed(x, IntegralDivide(Subtract(x, Literal(lo)), b))
              val rb = IntegralDivide(y, b)
              Seq(
                Join(left, right, Inner,
                  Some((guards :+ EqualTo(lb, rb) :+ cond).reduce(And)),
                  hint),
                Join(left, right, Inner,
                  Some((guards :+ EqualTo(lb, keyed(y, Add(rb, Literal(1L))))
                    :+ cond).reduce(And)), hint))
            }
          val rescue: Seq[LogicalPlan] =
            if (margin == 0L) Nil
            else Seq(
              // edge-x rows against everything; then non-edge-x rows
              // against edge-y rows — disjoint and jointly covering the
              // complement of the guarded space
              Join(Filter(edge(x), left), right, Inner, Some(cond), hint),
              Join(Filter(Not(edge(x)), left), Filter(edge(y), right),
                Inner, Some(cond), hint))
          (bucketBranches ++ rescue).foreach {
            // tag only each branch's TOP join — joins nested inside the
            // original children must stay rewritable
            case bj: Join => bj.setTagValue(rewrittenTag, true)
            case _ =>
          }
          (bucketBranches ++ rescue).reduce[LogicalPlan]((a, c) => Union(a, c))
        case _ => j // no window, contradictory bounds (hi < lo), a
                    // window wider than the Long domain, or offsets so
                    // large the edge zones would swallow the domain —
                    // bucketing is pointless there
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
  /** (base, totalOffset, maxAbsPrefix): maxAbsPrefix is the largest
    * |partial offset sum| evaluated anywhere in the runtime expression
    * tree — the user's arithmetic wraps exactly when the base is within
    * that distance of the Long range edge, so it feeds the rescue
    * margin.
    */
  private def decompose(e: Expression)
      : Option[(Expression, Long, Long)] = {
    def add(a: Expression, c: Long): Option[(Expression, Long, Long)] =
      decompose(a).flatMap { case (b, o, m) =>
        try {
          val o2 = Math.addExact(o, c)
          Some((b, o2, math.max(m, Math.absExact(o2))))
        } catch { case _: ArithmeticException => None }
      }
    e match {
      case Add(a, IntegralLiteral(c), _) => add(a, c)
      case Add(IntegralLiteral(c), a, _) => add(a, c)
      case Subtract(a, IntegralLiteral(c), _) if c != Long.MinValue =>
        add(a, -c)
      case TimestampAddInterval(t, Literal(c: Long, _: DayTimeIntervalType),
          _) => add(t, c)
      case _ if e.dataType == LongType => Some((e, 0L, 0L))
      case _ if e.dataType == TimestampType => Some((UnixMicros(e), 0L, 0L))
      case _ => None
    }
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
    * Bound constants use CHECKED arithmetic: offsets near the Long edge
    * would otherwise wrap into a wrong (and silently result-changing)
    * window — an overflowing bound is simply not recognized.
    */
  private def diffBound(c: Expression, left: LogicalPlan,
      right: LogicalPlan): Seq[DiffBound] = {
    def checked(f: => Long): Option[Long] =
      try Some(f) catch { case _: ArithmeticException => None }
    // a <= b + slack  (slack -1 encodes the strict form)
    def leq(a: Expression, b: Expression, slack: Long): Seq[DiffBound] =
      (decompose(a), decompose(b)) match {
        case (Some((p, ca, ma)), Some((q, cb, mb)))
            if p.references.nonEmpty && q.references.nonEmpty =>
          // |bound| covers the rewrite's own `x - lo`/`x - hi`; ma/mb
          // cover the user's partial offset sums (B == 1's `rb + 1`
          // hazard is added at the window level where B is known)
          def margin(c: Long): Option[Long] =
            checked(Math.absExact(c)).map(ac =>
              math.max(ac, math.max(ma, mb)))
          if (p.references.subsetOf(left.outputSet) &&
              q.references.subsetOf(right.outputSet))
            // p - q <= cb - ca + slack
            (for {
              c <- checked(Math.addExact(Math.subtractExact(cb, ca), slack))
              m <- margin(c)
            } yield DiffBound(p, q, c, upper = true, m)).toSeq
          else if (p.references.subsetOf(right.outputSet) &&
              q.references.subsetOf(left.outputSet))
            // q - p >= ca - cb - slack
            (for {
              c <- checked(Math.subtractExact(Math.subtractExact(ca, cb),
                slack))
              m <- margin(c)
            } yield DiffBound(q, p, c, upper = false, m)).toSeq
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
