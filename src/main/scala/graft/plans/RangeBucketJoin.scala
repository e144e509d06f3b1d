package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a pure interval-containment join (a "range
  * join": `point >= lo AND point <= hi` with NO equi conjunct) into a
  * bucketized equi join.
  *
  * Open-source Spark has no range-join optimization — such a join plans
  * as BroadcastNestedLoopJoin (or a cartesian product), i.e. O(points ×
  * intervals) comparisons, which is the classic time-series bottleneck at
  * scale (the DOCSIS shape: "which maintenance window does each snapshot
  * fall in"). The rewrite:
  *
  *  - point side: add `bucket = floor(point / W)` (one bucket per row);
  *  - interval side: explode `sequence(floor(lo/W), floor(hi/W))` (one
  *    row per covered bucket);
  *  - join on bucket equality AND the original band condition.
  *
  * Each matching pair survives exactly once (a point has exactly one
  * bucket), so no dedup is needed, and every operator in the rewritten
  * plan is a stock Spark operator — shuffle/broadcast hash join, codegen,
  * AQE all apply. Cost drops to O(points + intervals × spread) where
  * spread = interval width / W.
  *
  * Scope guards (the rule must never change semantics):
  *  - INNER joins, or LEFT OUTER when the point side is the left
  *    (preserved) side — a point row still has exactly one bucket, so
  *    unmatched rows surface once with nulls, as before;
  *  - no equi conjunct between the sides (Spark already plans those as
  *    hash joins with the band as a post-filter);
  *  - point/lo/hi are deterministic and timestamp- or integral-typed
  *    (bucketing uses truncating integer division on seconds, which is
  *    monotonic — the only property the rewrite needs, so negative
  *    domains are safe too; see RangeBucketJoinProps);
  *  - the full original condition is kept as the join filter, so any
  *    extra conjuncts remain enforced.
  *
  * Bucket width: `spark.graft.rangeJoin.bucketSeconds` (default 3600).
  * Pick W within ~10× of the typical interval width: too small explodes
  * the interval side, too large degrades toward per-bucket cartesian.
  * Disable with `spark.graft.rangeJoin.enabled=false`.
  */
object RangeBucketJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val ENABLED = "spark.graft.rangeJoin.enabled"
  private val BUCKET_SECONDS = "spark.graft.rangeJoin.bucketSeconds"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ENABLED, "true").toBoolean
  private def bucketWidth: Long =
    SQLConf.get.getConfString(BUCKET_SECONDS, "3600").toLong

  /** point-in-interval predicate pair found in the join condition. */
  private case class Band(point: Expression, lo: Expression, hi: Expression,
      pointOnLeft: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case j @ Join(left, right, joinType, Some(cond), _)
          if (joinType == Inner || joinType == LeftOuter) &&
            !hasEquiConjunct(cond, left, right) =>
        extractBand(cond, left, right) match {
          case Some(b) if joinType == Inner || b.pointOnLeft =>
            rewrite(j, b)
          case _ => j
        }
    }
  }

  /** true iff some conjunct is `leftExpr = rightExpr` — Spark's own
    * hash-join planning already handles those.
    */
  private def hasEquiConjunct(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) => sidesDiffer(a, b, left, right)
      case EqualNullSafe(a, b) => sidesDiffer(a, b, left, right)
      case _ => false
    }

  private def sidesDiffer(a: Expression, b: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
      (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))

  private def bucketable(e: Expression): Boolean = e.dataType match {
    case TimestampType | LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Normalize every comparison conjunct to (small, large); then find a
    * lower bound `lo <= point` and an upper bound `point <= hi` where
    * point references exactly one join side and lo/hi the other.
    */
  private def extractBand(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[Band] = {
    def side(e: Expression): Option[Boolean] = // Some(true)=left only
      if (e.references.nonEmpty && e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.nonEmpty && e.references.subsetOf(right.outputSet)) Some(false)
      else None

    // (small, large) pairs, inclusive or strict alike — the original
    // condition is re-applied verbatim, so strictness never leaks here.
    val ordered = splitConjunctivePredicates(cond).collect {
      case LessThan(a, b) => (a, b)
      case LessThanOrEqual(a, b) => (a, b)
      case GreaterThan(a, b) => (b, a)
      case GreaterThanOrEqual(a, b) => (b, a)
    }

    val candidates = for {
      (lo, p1) <- ordered
      (p2, hi) <- ordered
      if p1.semanticEquals(p2) && p1.deterministic &&
        lo.deterministic && hi.deterministic &&
        bucketable(p1) && bucketable(lo) && bucketable(hi)
      pSide <- side(p1)
      loSide <- side(lo)
      hiSide <- side(hi)
      if loSide == hiSide && loSide != pSide
    } yield Band(p1, lo, hi, pointOnLeft = pSide)
    candidates.headOption
  }

  /** floor(e / W) in whole seconds as a LongType expression. Cast and
    * Sequence are TimeZoneAware — the optimizer runs after
    * ResolveTimeZone, so the id must be supplied here or the plan
    * becomes unresolved.
    */
  private def tz: Option[String] = Some(SQLConf.get.sessionLocalTimeZone)

  private def bucketOf(e: Expression, w: Long): Expression =
    IntegralDivide(Cast(e, LongType, tz), Literal(w))

  private def rewrite(j: Join, b: Band): LogicalPlan = {
    val w = bucketWidth
    val (pointPlan, intervalPlan) =
      if (b.pointOnLeft) (j.left, j.right) else (j.right, j.left)

    // point side: one bucket column per row
    val pBucket = Alias(bucketOf(b.point, w), "__graft_pbucket")()
    val pointProj = Project(pointPlan.output :+ pBucket, pointPlan)

    // interval side: one row per covered bucket
    val iBucketAttr =
      AttributeReference("__graft_ibucket", LongType, nullable = false)()
    val bLo = bucketOf(b.lo, w)
    val bHi = bucketOf(b.hi, w)
    // sequence(start, stop, 1) throws on start > stop — an inverted
    // interval must simply match nothing, like it does under NLJ
    val seq = If(LessThanOrEqual(bLo, bHi),
      Sequence(bLo, bHi, Some(Literal(1L)), tz),
      Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
    val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None,
      generatorOutput = Seq(iBucketAttr), child = intervalPlan)

    val newCond = And(EqualTo(pBucket.toAttribute, iBucketAttr), j.condition.get)
    val newJoin =
      if (b.pointOnLeft) Join(pointProj, gen, j.joinType, Some(newCond), j.hint)
      else Join(gen, pointProj, j.joinType, Some(newCond), j.hint)
    Project(j.output, newJoin)
  }
}
