package graft

import graft.plans.{GraftExtensions, StrictPlanGuard}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions tier (plans/Extensions.scala): the runtime
  * strict-plans guard (the PlanFingerprintSpec property enforced at
  * planning time, per session) and SQL-side registration of the graft
  * native expressions. */
class ExtensionsSpec extends SparkSpec {

  private def messages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))

  test("strict guard: partitionless window fails fast; partitioned passes; session-scoped") {
    val s = spark.newSession()
    GraftExtensions.enableStrictPlans(s)
    val df = s.range(10).toDF("x")
    val ex = intercept[Throwable] {
      df.withColumn("r", row_number().over(Window.orderBy(col("x")))).collect()
    }
    assert(messages(ex).exists(_.contains("partitionless window")), s"got: $ex")
    // a partitioned window is exactly what strict mode steers toward
    val ok = df.withColumn("r",
      row_number().over(Window.partitionBy(col("x") % 2).orderBy(col("x"))))
    assert(ok.count() == 10L)
    // the guard is SESSION-scoped: the shared suite session stays untouched
    assert(spark.range(5).toDF("x")
      .withColumn("r", row_number().over(Window.orderBy(col("x")))).count() == 5L)
    // flipping the conf back off disarms without removing the rule
    s.conf.set(StrictPlanGuard.confKey, "false")
    assert(df.withColumn("r", row_number().over(Window.orderBy(col("x")))).count() == 10L)
  }

  test("allowlist: named pre-reduced windows pass; unnamed still fail; nested alias can't opt in") {
    val s = spark.newSession()
    GraftExtensions.enableStrictPlans(s, allow = Seq("__ok_rank"))
    val df = s.range(10).toDF("x")
    // the allowlisted DIRECT alias passes
    assert(df.withColumn("__ok_rank", row_number().over(Window.orderBy(col("x"))))
      .count() == 10L)
    // an unlisted alias still fails fast
    val ex = intercept[Throwable] {
      df.withColumn("r", row_number().over(Window.orderBy(col("x")))).collect()
    }
    assert(messages(ex).exists(_.contains("partitionless window")), s"got: $ex")
    // a NESTED window (cast outside) is extracted under a synthetic _weN
    // alias — it cannot ride an allowlisted outer name; the opt-in must be
    // the direct alias, deliberately
    val ex2 = intercept[Throwable] {
      df.withColumn("__ok_rank",
        row_number().over(Window.orderBy(col("x"))).cast("long")).collect()
    }
    assert(messages(ex2).exists(_.contains("partitionless window")), s"got: $ex2")
    // a window with ANY unlisted expression alongside a listed one fails
    val ex3 = intercept[Throwable] {
      df.select(col("x"),
        row_number().over(Window.orderBy(col("x"))).as("__ok_rank"),
        sum(col("x")).over(Window.orderBy(col("x"))).as("sneak")).collect()
    }
    assert(messages(ex3).exists(_.contains("partitionless window")), s"got: $ex3")
  }

  test("re-arming with allow = Nil CLEARS a previously-set allowlist (r16 advice)") {
    val s = spark.newSession()
    GraftExtensions.enableStrictPlans(s, allow = Seq("__ok_rank"))
    val df = s.range(10).toDF("x")
    assert(df.withColumn("__ok_rank", row_number().over(Window.orderBy(col("x"))))
      .count() == 10L)
    // strict-with-no-allowances must be exactly that: the second call's
    // argument IS the full allowlist state, not a merge with the first's
    GraftExtensions.enableStrictPlans(s)
    val ex = intercept[Throwable] {
      df.withColumn("__ok_rank", row_number().over(Window.orderBy(col("x")))).collect()
    }
    assert(messages(ex).exists(_.contains("partitionless window")), s"got: $ex")
  }

  test("graftPreReducedSites equals exactly the four sites' window aliases (both directions)") {
    // rot-proofing for the allowlist itself (r16 review): a renamed or
    // removed site must be pruned from graftPreReducedSites, or a stale
    // entry would let some unrelated future window ride its name through
    // the guard. Collect every partitionless LOGICAL window alias across
    // the four allowlisted queries and assert set equality.
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}
    val dir = sf("sf0.001")
    val sites = Seq("t66_token_rarity", "e103_funnel", "e118_event_paths",
      "q101_skew_profile")
    val found = scala.collection.mutable.Set[String]()
    sites.foreach { name =>
      val plan: LogicalPlan =
        SparkEntry.queries(name)(spark, dir).queryExecution.analyzed
      plan.foreach {
        case w: LWindow if w.partitionSpec.isEmpty =>
          w.windowExpressions.foreach(e => found += e.name)
        case _ => ()
      }
      spark.catalog.clearCache()
    }
    assert(found == StrictPlanGuard.graftPreReducedSites.toSet,
      s"allowlist drift: found=$found declared=${StrictPlanGuard.graftPreReducedSites}")
  }

  test("the FULL driver surface plan-builds under strict plans + the graft allowlist") {
    // r15 verdict #4: the guard was spec-tested in isolation while the
    // shipped queries ran non-strict. This sweep arms the guard on a child
    // session with exactly StrictPlanGuard.graftPreReducedSites allowlisted
    // and forces ANALYSIS + OPTIMIZATION of every driver query there —
    // proving the runtime guard and PlanFingerprintSpec's CI sweep enforce
    // the same property over the same surface: the four audited
    // pre-reduced sites pass BY NAME, everything else has zero
    // partitionless windows. (Streaming queries route their stateful run
    // through SparkEntry's memoized stream child session, which this
    // strict child does not arm — their plans are covered by the CI
    // sweep's physical walk; every batch plan here builds strict.)
    val s = spark.newSession()
    GraftExtensions.enableStrictPlans(s, allow = StrictPlanGuard.graftPreReducedSites)
    val dir = sf("sf0.001")
    // the graft native-function registries are PER-SESSION and the Column
    // constructors register into SparkSession.active — point it at the
    // strict child for the sweep (restored after)
    val prevActive = SparkSession.getActiveSession
    SparkSession.setActiveSession(s)
    try
      SparkEntry.queries.foreach { case (name, fn) =>
        try {
          fn(s, dir).queryExecution.optimizedPlan
          ()
        } catch {
          case e: Throwable if messages(e).exists(_.contains("partitionless window")) =>
            fail(s"$name trips the strict guard: ${messages(e).mkString(" | ")}")
        } finally s.catalog.clearCache()
      }
    finally {
      SparkSession.clearActiveSession()
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("extended session: spark.sql reaches the graft natives; guard rides along") {
    // building WITH extensions needs a fresh SparkSession over the shared
    // SparkContext — clear the default/active slots and restore after
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession(); SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
      val r = s2.sql(
        "SELECT char_entropy('aabb') AS e, token_entropy(array('x','y','x','y')) AS t").head()
      assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 1.0)
      assert(s2.sql("SELECT char_entropy('') AS e").head().isNullAt(0))
      // the injected optimizer rule is present; arming is still the conf
      s2.conf.set(StrictPlanGuard.confKey, "true")
      val ex = intercept[Throwable] {
        s2.range(4).toDF("x")
          .withColumn("r", row_number().over(Window.orderBy(col("x")))).collect()
      }
      assert(messages(ex).exists(_.contains("partitionless window")), s"got: $ex")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
