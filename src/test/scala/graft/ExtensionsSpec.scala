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
