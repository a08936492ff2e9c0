package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: turn a band-range join into an equi join.
  *
  * A join whose only usable condition is a range —
  *   a.join(b, a("x") <= b("x") && b("x") - a("x") <= lit(w))
  * — has no equi conjunct, so Spark plans a broadcast-nested-loop or
  * cartesian product: O(|a|*|b|) comparisons. But a band of width w
  * admits the classic bucket trick (each side bucketed by floor(x/w),
  * the probe side exploded into its bucket and its predecessor), which
  * this rule applies automatically:
  *
  *   Join(cond) ==> Project(origOutput)(
  *     Join(left + bkt(lx), Explode(right + [bkt(rx), bkt(rx)-1]),
  *          cond && lbkt === rbkt))
  *
  * The original condition is kept verbatim (the equi bucket conjunct
  * only prunes pairs), so results are identical — spec-tested — while
  * the planner now has a hash-joinable key. Pattern recognized:
  * `lx <(=) rx` and `rx - lx <= w` conjuncts over the same two
  * numeric expressions, one from each side, w a positive literal.
  * graft.operators.Dedup.jaccardPairs is the hand-written form of the
  * same rewrite; with this rule injected (GraftExtensions) users get
  * it for free on natural range-join syntax.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] {

  private val BktPrefix = "_graft_bkt"

  private def fromSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def widthOf(e: Expression): Option[Double] = e match {
    case Literal(v: Number, _) if v.doubleValue() > 0 => Some(v.doubleValue())
    case _ => None
  }

  /** Splits a condition into conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.exists {
          case a: Attribute => a.name.startsWith(BktPrefix)
          case _            => false
        } =>
      val cs = conjuncts(cond)
      // already has an equi conjunct (one side each)? nothing to gain
      val hasEqui = cs.exists {
        case EqualTo(l, r) =>
          (fromSide(l, left) && fromSide(r, right)) ||
            (fromSide(l, right) && fromSide(r, left))
        case _ => false
      }
      val band = if (hasEqui) None else cs.collectFirst {
        // rx - lx <= w  with lx from left, rx from right
        case LessThanOrEqual(Subtract(rx, lx, _), wLit)
            if fromSide(lx, left) && fromSide(rx, right) &&
              widthOf(wLit).isDefined &&
              cs.exists { // ... plus an ordering conjunct on the same pair
                case LessThan(a, b)        => a.semanticEquals(lx) && b.semanticEquals(rx)
                case LessThanOrEqual(a, b) => a.semanticEquals(lx) && b.semanticEquals(rx)
                case _                     => false
              } =>
          (lx, rx, widthOf(wLit).get)
      }
      band match {
        case None => j
        case Some((lx, rx, w)) =>
          // Bucket function: any monotone f with f(x + w) <= f(x) + 1
          // works (then bkt(rx) ∈ {bkt(lx), bkt(lx)+1} for the band).
          // For integral keys and whole w use exact integer division —
          // the double floor(x/w) can round to a DIFFERENT bucket on
          // each side for |x| > 2^53 (or fp-boundary quotients), and a
          // wrong equi conjunct silently drops true matches. Integer
          // `div` truncates toward zero (not floor): across the
          // negative-to-positive boundary f(x+w) = f(x) (e.g.
          // trunc(-5/10) = trunc(5/10) = 0), elsewhere f(x+w) = f(x)+1.
          // Only monotonicity plus f(x) <= f(x+w) <= f(x)+1 is needed
          // for the two-bucket probe set, and truncation satisfies it.
          def isIntegral(t: DataType): Boolean = t match {
            case ByteType | ShortType | IntegerType | LongType => true
            case _ => false
          }
          val integralKeys =
            isIntegral(lx.dataType) && isIntegral(rx.dataType) &&
              w == math.floor(w) && w <= Long.MaxValue.toDouble
          def bktOf(x: Expression): Expression =
            if (integralKeys)
              IntegralDivide(Cast(x, LongType), Literal(w.toLong))
            else
              Cast(Floor(Divide(Cast(x, DoubleType), Literal(w))), LongType)

          val lBkt = Alias(bktOf(lx), s"${BktPrefix}_l")()
          val newLeft = Project(left.output :+ lBkt, left)

          val rBktExpr = bktOf(rx)
          val probeArr = CreateArray(Seq(
            rBktExpr, Subtract(rBktExpr, Literal(1L))))
          val rBktAttr = AttributeReference(s"${BktPrefix}_r", LongType)()
          val newRight = Generate(
            Explode(probeArr), unrequiredChildIndex = Nil, outer = false,
            qualifier = None, generatorOutput = Seq(rBktAttr), right)

          val newCond = And(cond, EqualTo(lBkt.toAttribute, rBktAttr))
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), hint))
      }
  }
}
