package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a PURE range-predicate inner join
  * `l ⋈ r ON p >= s AND p < e` (p from one side; s, e from the other; all
  * epoch-µs BIGINTs, the engine's event-time convention) into the bucketed
  * equi-join of [[graft.ext.Ranges.bucketedRangeJoin]] — Catalyst finds no
  * equi-key in the raw predicate and plans a BroadcastNestedLoopJoin or a
  * CartesianProduct, O(|L|·|R|) at any scale.
  *
  * This is rung (c) of the build brief's custom-operator ladder (a logical
  * rewrite via `Rule[LogicalPlan]`), here WITHOUT a custom SparkPlan: the
  * rewritten tree is ordinary Generate/Join/Filter/Project, so Spark's own
  * shuffled hash / sort-merge strategies (and AQE) plan the physical side.
  * The rule makes the [[graft.ext.Ranges]] decomposition available to ANY
  * query — `spark.sql("... ON p >= s AND p < e")` included — instead of
  * only callers of the library API.
  *
  * Gated on `spark.graft.rangejoin.bucketUs` (> 0): bucket width is a
  * cost/statistics decision (interval-length-scaled), so the user states it;
  * unset ⇒ the rule is inert. Idempotent by construction: the rewritten
  * join's condition carries a bucket equi-conjunct, which the matcher
  * excludes.
  *
  * Register per-session via `spark.experimental.extraOptimizations` or
  * globally with `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
case class RangeJoinBucketing() extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rangejoin.bucketUs"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = try conf.getConfString(ConfKey, "0").toLong catch { case _: NumberFormatException => 0L }
    if (width <= 0) plan
    else plan transform {
      case j @ Join(l, r, Inner,
          Some(And(GreaterThanOrEqual(p1, s), LessThan(p2, e))), hint)
          if p1.semanticEquals(p2) && allLong(p1, s, e) =>
        sides(p1, s, e, l, r) match {
          case Some((pts, ivs, flipped)) =>
            val rewritten = bucketed(pts, ivs, p1, s, e, width, j.condition.get, flipped, hint)
            Project(j.output, rewritten)
          case None => j
        }
    }
  }

  private def allLong(es: Expression*): Boolean = es.forall(_.dataType == LongType)

  /** points side = the side the probe expression reads; intervals side = the
    * side both bounds read. None when the condition straddles sides. */
  private def sides(p: Expression, s: Expression, e: Expression,
      l: LogicalPlan, r: LogicalPlan): Option[(LogicalPlan, LogicalPlan, Boolean)] = {
    val bounds = s.references ++ e.references
    if (p.references.subsetOf(l.outputSet) && bounds.subsetOf(r.outputSet))
      Some((l, r, false))
    else if (p.references.subsetOf(r.outputSet) && bounds.subsetOf(l.outputSet))
      Some((r, l, true))
    else None
  }

  private def bucketed(points: LogicalPlan, intervals: LogicalPlan,
      p: Expression, s: Expression, e: Expression, width: Long,
      rangeCond: Expression, flipped: Boolean,
      hint: JoinHint): LogicalPlan = {
    val w = Literal(width, LongType)
    def bkt(x: Expression): Expression = IntegralDivide(x, w)

    val pBkt = Alias(bkt(p), "__p_bkt")()
    val pts = Project(points.output :+ pBkt, points)

    val ivBkt = AttributeReference("__iv_bkt", LongType)()
    // degenerate intervals (e <= s) match nothing but MUST NOT reach the
    // explode: sequence(start, stop, 1) THROWS when stop < start (an empty
    // interval one bucket back), so filter them out first
    val nonEmpty = Filter(GreaterThan(e, s), intervals)
    // timeZoneId must be pinned here: Sequence is TimeZoneAwareExpression and
    // stays UNRESOLVED with None — the optimizer never re-runs ResolveTimeZone
    val gen = Explode(Sequence(bkt(s), bkt(Subtract(e, Literal(1L, LongType))),
      Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone)))
    val ivs = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(ivBkt), child = nonEmpty)

    // keep the original child order so downstream attribute expectations and
    // any join hint sides still line up
    val (lhs, rhs) = if (flipped) (ivs, pts) else (pts, ivs)
    Join(lhs, rhs, Inner,
      Some(And(EqualTo(pBkt.toAttribute, ivBkt), rangeCond)), hint)
  }
}

/** `spark.sql.extensions` entry point: the optimizer rule plus the engine's
  * codegen'd expressions registered as SQL functions, so the raw-SQL surface
  * (`spark.sql(...)`) reaches the same fast paths as the library API:
  *
  *  - `graft_tokens(str)`       → lowercase `[a-z0-9]+` token array
  *                                ([[graft.functions.AsciiRunTokens]] over
  *                                `lower()`, the TextOps.fastTokens pipeline)
  *  - `graft_vec_dot(a, b)`     → float-vector dot product in strict
  *                                left-to-right double accumulation
  *                                ([[graft.functions.FloatVectorDot]])
  *  - `graft_sorted_intersect(a, b)` → intersection size of two SORTED
  *                                string arrays ([[graft.functions.SortedIntersectCount]])
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Lower}
  import graft.functions.{AsciiRunTokens, FloatVectorDot, MortonInterleave, SortedIntersectCount}

  private def info(name: String, clazz: String, usage: String) =
    new ExpressionInfo(clazz, name) // (usage is Scaladoc-only: the richer
  // ExpressionInfo constructors validate `group`/`source` against Spark's
  // built-in registry vocabularies, which user functions aren't part of)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RangeJoinBucketing())
    ext.injectFunction((FunctionIdentifier("graft_tokens"),
      info("graft_tokens", classOf[AsciiRunTokens].getCanonicalName,
        "graft_tokens(str) - lowercase [a-z0-9]+ token runs of str"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_tokens expects 1 argument")
        AsciiRunTokens(Lower(children.head))
      }))
    ext.injectFunction((FunctionIdentifier("graft_vec_dot"),
      info("graft_vec_dot", classOf[FloatVectorDot].getCanonicalName,
        "graft_vec_dot(a, b) - dot product of two float vectors, sequential double accumulation"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_vec_dot expects 2 arguments")
        FloatVectorDot(children(0), children(1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_zorder"),
      info("graft_zorder", classOf[MortonInterleave].getCanonicalName,
        "graft_zorder(x, y) - Morton bit-interleave of two bigint bucket ordinals (low 31 bits each)"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_zorder expects 2 arguments")
        MortonInterleave(children(0), children(1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_sorted_intersect"),
      info("graft_sorted_intersect", classOf[SortedIntersectCount].getCanonicalName,
        "graft_sorted_intersect(a, b) - intersection size of two sorted string arrays"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_sorted_intersect expects 2 arguments")
        SortedIntersectCount(children(0), children(1))
      }))
  }
}
