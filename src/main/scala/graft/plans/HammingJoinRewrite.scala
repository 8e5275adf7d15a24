package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a DECLARATIVE Hamming-distance theta-join
  *
  * {{{ a.crossJoin(b).filter(bit_count(a("fp") ^ b("fp")) <= r) }}}
  *
  * into a union of `r + 1` disjoint band EQUI-joins (the pigeonhole
  * principle: two 64-bit words within Hamming distance r agree exactly on
  * at least one of r+1 disjoint bit bands). Without the rewrite Catalyst
  * can only plan a cartesian/broadcast-nested-loop join — O(n·m)
  * comparisons, dead at scale; with it, each branch is an ordinary hash
  * join on a band value whose build/probe keys Catalyst extracts itself.
  * Branch `i` additionally requires bands `0..i-1` to DIFFER ("first
  * agreeing band"), so the branches partition the candidate space and
  * row multiplicity is preserved exactly — no dedup pass, safe under
  * duplicate fingerprints.
  *
  * Scope guards (anything outside falls through untouched):
  *  - inner/cross join whose condition contains
  *    `bit_count(x ^ y) <= lit` (or `<`, or the flipped `>=`/`>` form)
  *    with x and y LongType, one from each side;
  *  - no existing cross-side equi-conjunct (then the join is already
  *    hash-joinable and banding would only add overhead);
  *  - radius in [0, 15] — 16 bands of a 64-bit word are 4 bits each,
  *    below which band equality stops being selective;
  *  - both inputs deterministic (the rewrite re-instantiates each side
  *    once per branch; non-deterministic sides must not be re-executed).
  *
  * The branch joins keep the ORIGINAL condition verbatim (the exact
  * Hamming test and any other conjuncts), so the rewrite can never
  * change the result set — only the access path. Each branch re-reads
  * its inputs; for a hand-tuned pipeline the explicit banded APIs
  * (`dedup/SimHash.nearDuplicates`, `multimodal mediaNearDuplicates`)
  * explode signatures in a single pass — this rule is the rescue path
  * for ad-hoc declarative queries, registered via [[graft.GraftExtensions]].
  *
  * Reference analog: the same pigeonhole banding simstring/LSH matchers
  * apply at the algorithm level (`/root/reference/edsnlp/matchers/
  * simstring.py:52-316`), here surfaced as a plan transformation.
  */
object HammingJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val MaxRadius = 15

  private case class HammingPred(x: Expression, y: Expression, radius: Int)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt, Some(cond), hint)
        if (jt == Inner || jt == Cross) && deterministic(j) =>
      val conjuncts = splitConjunctivePredicates(cond)
      def crossSide(a: Expression, b: Expression): Boolean = {
        val (ra, rb) = (a.references, b.references)
        ra.nonEmpty && rb.nonEmpty &&
          ((ra.subsetOf(left.outputSet) && rb.subsetOf(right.outputSet)) ||
            (ra.subsetOf(right.outputSet) && rb.subsetOf(left.outputSet)))
      }
      val hasEqui = conjuncts.exists {
        // EqualNullSafe is a hash-joinable key too — banding on top of
        // either equality form would only add overhead
        case EqualTo(a, b) => crossSide(a, b)
        case EqualNullSafe(a, b) => crossSide(a, b)
        case _ => false
      }
      val ham = if (hasEqui) None else conjuncts.collectFirst {
        Function.unlift(hammingPredicate(_, crossSide))
      }
      ham match {
        case Some(HammingPred(x, y, r)) if r >= 0 && r <= MaxRadius =>
          val n = r + 1
          val base = 64 / n
          val sizes = Seq.fill(n - 1)(base) :+ (64 - base * (n - 1))
          val offsets = sizes.scanLeft(0)(_ + _)
          def band(e: Expression, i: Int): Expression = {
            val mask =
              if (sizes(i) == 64) -1L else (1L << sizes(i)) - 1
            BitwiseAnd(ShiftRightUnsigned(e, Literal(offsets(i))),
              Literal(mask))
          }
          val branches: Seq[LogicalPlan] = (0 until n).map { i =>
            val agree = EqualTo(band(x, i), band(y, i))
            val priorDiffer: Seq[Expression] =
              (0 until i).map(k => Not(EqualTo(band(x, k), band(y, k))))
            val branchCond = (agree +: priorDiffer :+ cond).reduce(And)
            Join(left, right, Inner, Some(branchCond), hint)
          }
          branches.reduce[LogicalPlan]((a, b) => Union(a, b))
        case _ => j
      }
  }

  /** A negative radius (empty result) is left to Catalyst's constant
    * folding; a radius >= 64 makes the predicate vacuous and banding
    * pointless — both fall outside [0, MaxRadius] and pass through.
    */
  private def hammingPredicate(
      c: Expression,
      crossSide: (Expression, Expression) => Boolean)
      : Option[HammingPred] = {
    def mk(x: Expression, y: Expression, r: Int): Option[HammingPred] =
      if (x.dataType == LongType && y.dataType == LongType &&
          crossSide(x, y)) Some(HammingPred(x, y, r))
      else None
    c match {
      case LessThanOrEqual(BitwiseCount(BitwiseXor(x, y)),
          Literal(r: Int, IntegerType)) => mk(x, y, r)
      case LessThan(BitwiseCount(BitwiseXor(x, y)),
          Literal(r: Int, IntegerType)) => mk(x, y, r - 1)
      case GreaterThanOrEqual(Literal(r: Int, IntegerType),
          BitwiseCount(BitwiseXor(x, y))) => mk(x, y, r)
      case GreaterThan(Literal(r: Int, IntegerType),
          BitwiseCount(BitwiseXor(x, y))) => mk(x, y, r - 1)
      case _ => None
    }
  }

  private def deterministic(p: LogicalPlan): Boolean =
    p.collectFirst {
      case q if q.expressions.exists(!_.deterministic) => q
    }.isEmpty
}
