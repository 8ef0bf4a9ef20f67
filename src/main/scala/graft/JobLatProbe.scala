package graft

/** Dev probe (r19 optimization, verdict #4 evidence): the wall-clock cost
  * of ONE trivial Spark job on this host, warm — the unit price of a
  * query's "composition latency" (driver-side actions + AQE stage
  * materializations, each of which is one job). Measured as the median of
  * `reps` single-task jobs after a JIT warmup, plus the same for a
  * 32-task wave (the per-round shape the iterative family schedules).
  * If a mid-tier query runs J jobs, J × this number bounds what job-count
  * reduction could possibly buy at sf0.1 — the go/no-go evidence for
  * restructuring query composition vs documenting it as inherent. */
object JobLatProbe {
  def main(args: Array[String]): Unit = {
    val spark = core.Engine.session("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    def medianMs(parts: Int, reps: Int): Double = {
      val rdd = sc.parallelize(1 to parts, parts)
      (1 to 5).foreach(_ => rdd.count()) // warm JIT + scheduler paths
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); rdd.count(); (System.nanoTime() - t0) / 1e6
      }.sorted
      ts(reps / 2)
    }
    println(f"[joblat] 1-task job median  ${medianMs(1, 41)}%.2f ms")
    println(f"[joblat] 32-task job median ${medianMs(32, 41)}%.2f ms")
    println(f"[joblat] 256-task job median ${medianMs(256, 21)}%.2f ms")
    // one trivial SQL action (plans + AQE machinery included)
    val df = spark.range(2)
    (1 to 5).foreach(_ => df.count())
    val ts = (1 to 21).map { _ =>
      val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"[joblat] trivial SQL count median ${ts(10)}%.2f ms")
    spark.stop()
  }
}
