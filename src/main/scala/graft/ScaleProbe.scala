package graft

/** Dev tool: SAME-SESSION, same-host-window scale ratio for one query —
  * min-of-4 at each scale, back to back. Cross-artifact ratios divide two
  * numbers measured hours apart in different host windows; on a
  * sub-second sf0.1 base a ±0.15 s window swing moves the published ratio
  * ~25%, which is how d105 read 7.3x from artifacts while measuring 5.3x
  * same-window (see docs/PLANS.md round-11 notes). Use this before
  * treating any cross-artifact ratio on a sub-second base as a shape
  * problem. Usage: runMain graft.ScaleProbe <query> <dirA> <dirB>. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleProbe <query> <dirA> <dirB>")
    val (q, dirA, dirB) = (args(0), args(1), args(2))
    val spark = core.Engine.session("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(q, SparkEntry.benchOnlyQueries(q))
    def best(dir: String): Double =
      (1 to 4).map { _ =>
        val t0 = System.nanoTime(); fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
    val (a, b) = (best(dirA), best(dirB))
    println(f"[probe] $q $dirA=${a}%.3f s $dirB=${b}%.3f s ratio=${b / a}%.2f")
    spark.stop()
  }
}
