package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Catalyst-level integration through Spark's two PUBLIC extension points —
  * the (c) tier of the custom-operator ladder (compose < Expression <
  * Rule/Strategy via SparkSessionExtensions):
  *
  *  - [[StrictPlanGuard]], an optimizer `Rule[LogicalPlan]` enforcing at
  *    RUNTIME the plan property the test suite enforces at CI time
  *    (PlanFingerprintSpec): no partitionless window. `ORDER BY` windows
  *    with an empty `PARTITION BY` collapse the whole relation into ONE
  *    task — invisible on a laptop corpus, a guaranteed straggler-or-OOM
  *    on a 1000-executor job. Opt-in per session (`spark.graft.strictPlans`
  *    = true): a pipeline author flips it on in production sessions and a
  *    q55-class plan fails FAST at planning, with the fix named, instead
  *    of hanging a cluster. Legitimate pre-reduced tiny-input windows stay
  *    available by leaving the flag off (the library's own four audited
  *    sites run under non-strict sessions).
  *
  *  - SQL registration of the graft native expressions (char_entropy,
  *    token_entropy) so `spark.sql("SELECT char_entropy(text) …")` works
  *    in any session built `.withExtensions(new GraftExtensions)` or with
  *    `spark.sql.extensions=graft.plans.GraftExtensions` — the Column-API
  *    helpers in [[graft.functions]] keep working unchanged either way.
  *
  * [[GraftExtensions.enableStrictPlans]] arms the guard POST-HOC on an
  * existing session via `spark.experimental.extraOptimizations` (also a
  * public API, session-scoped) for callers who didn't build their session
  * with extensions.
  */
object StrictPlanGuard extends Rule[LogicalPlan] {
  val confKey = "spark.graft.strictPlans"

  /** Per-site opt-in (round 16, r15 verdict #4): comma-separated window
    * ALIAS names. A partitionless window passes the guard iff EVERY one of
    * its window expressions is aliased to a name in this list — so an
    * honest pre-reduced site opts in by giving its window a distinctive
    * direct alias and naming it here, while every unnamed partitionless
    * window still fails fast. (A window nested inside a bigger expression
    * is extracted by Catalyst under a synthetic `_weN` alias, which can
    * never match — opting in REQUIRES the direct alias, which is the
    * point: the site must be deliberate.) */
  val allowKey = "spark.graft.strictPlans.allow"

  /** The library's own four audited pre-reduced partitionless windows:
    * each windows over an input already bounded by orderBy+limit or
    * per-step aggregates. PlanFingerprintSpec's CI sweep pins WHICH
    * queries may carry a partitionless window (both directions, by query
    * name); ExtensionsSpec pins that the ALIAS set below equals exactly
    * the window aliases those queries produce (both directions too — a
    * renamed or removed site must be pruned here, or a stale entry would
    * let an unrelated future window ride its name through the guard). */
  val graftPreReducedSites: Seq[String] =
    Seq("__vocab_rank", "__funnel_prev", "__path_rank", "__skew_rank", "__skew_cum")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (SQLConf.get.getConfString(confKey, "false") == "true") {
      val allowed = SQLConf.get.getConfString(allowKey, "")
        .split(",").map(_.trim).filter(_.nonEmpty).toSet
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty &&
            !w.windowExpressions.forall(e => allowed.contains(e.name)) =>
          throw new IllegalStateException(
            s"[graft strict plans] partitionless window (ORDER BY with no PARTITION BY) " +
              s"over ${w.windowExpressions.map(_.name).mkString(", ")}: this plans a " +
              "single-partition stage that serializes the whole relation through one task " +
              "at cluster scale. Partition the window, or use the distributed forms " +
              "(Relational.globalNtile for NTILE, terasort row-index machinery for ranks); " +
              s"for a genuinely pre-reduced input, alias the window directly and add the " +
              s"alias to $allowKey (or unset $confKey).")
        case _ => ()
      }
    }
    plan
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => StrictPlanGuard)
    GraftExtensions.sqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
  }
}

object GraftExtensions {
  /** The graft natives exposed to SQL (the Column-API constructors in
    * [[graft.functions]] remain the primary surface). */
  private def unary(name: String, mk: Expression => Expression): Seq[Expression] => Expression =
    es => {
      // a plain es.head would silently DROP extra arguments (a
      // plausible-looking wrong result) and throw a bare
      // NoSuchElementException on zero — name the function and arity
      if (es.length != 1) throw new IllegalArgumentException(
        s"$name expects exactly 1 argument, got ${es.length}")
      mk(es.head)
    }

  val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "char_entropy" -> unary("char_entropy", graft.functions.CharEntropy(_)),
    "token_entropy" -> unary("token_entropy", graft.functions.TokenEntropy(_))
  )

  /** Arm [[StrictPlanGuard]] on an EXISTING session (no rebuild needed):
    * registers the rule through `experimental.extraOptimizations` (public,
    * session-scoped) and flips the conf the rule keys on. Idempotent.
    * `allow` opts in named pre-reduced window sites (see
    * [[StrictPlanGuard.allowKey]]); pass
    * [[StrictPlanGuard.graftPreReducedSites]] to run the graft surface
    * itself under the guard. */
  def enableStrictPlans(spark: SparkSession, allow: Seq[String] = Nil): Unit = {
    if (!spark.experimental.extraOptimizations.contains(StrictPlanGuard))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ StrictPlanGuard
    spark.conf.set(StrictPlanGuard.confKey, "true")
    // the call's argument IS the full allowlist state (r16 advice): always
    // overwrite — re-arming with allow = Nil must CLEAR any allowlist a
    // previous enable left in the session conf, not silently inherit it
    spark.conf.set(StrictPlanGuard.allowKey, allow.mkString(","))
  }
}
