package graft

/** Benchmark entrypoint (driver contract: ONE JSON line on stdout).
  *
  * Also writes a committed per-round artifact with per-pass AND min numbers
  * plus per-pass JVM warmup markers (JIT compilation + GC time deltas), so
  * builder and driver benches can be diffed from the repo alone AND a
  * cold-JVM drift (pass-1 slow, JIT delta large) is distinguishable from a
  * plan regression (all passes slow, JIT quiet) without re-running anything.
  */
object Bench {
  private def jitMs: Long = {
    val c = java.lang.management.ManagementFactory.getCompilationMXBean
    if (c != null && c.isCompilationTimeMonitoringSupported) c.getTotalCompilationTime else -1L
  }
  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime.max(0L)).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val artifact = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/BENCH_local.json")
    // Default 3 passes: pass 1 is pure JIT warmup (its JIT delta dwarfs the
    // later passes'), so min-of-2-warm estimates the same statistic as
    // min-of-4-warm at ~60% of the wall clock.
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt.max(1)
    // Wall-clock deadline (seconds, measured from just before the first
    // query): the artifact must be emitted from whatever passes completed
    // rather than letting an external timeout kill the process with nothing
    // written (round-7 driver run: rc 124 at pass 2/5, zero perf evidence).
    // Pass 1 always runs to completion (a partial pass 1 would hole the
    // query surface); later passes neither start when the elapsed time plus
    // the previous pass's wall says they won't fit, nor run past the
    // deadline mid-pass (their partial timings still feed the per-query min).
    val deadlineS = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_S", "420").toDouble
    // the library's own session factory (incl. the scale-aware AQE knobs):
    // the bench must measure the configuration users actually run
    val spark = core.Engine.session(s"local[$cpus]", cpus.toInt)
    // Multiple passes, min per query: host timing noise on this VM is 2-4x
    // run-to-run, and the minimum is the stable estimate of true cost.
    // optional comma-separated query filter (e.g. the dedup/ANN family for
    // the sf1 stress artifact, whose dir has only documents + embeddings).
    // Bench-only queries (composed stress flows, measured alternatives) join
    // the pool ONLY when named explicitly — an unfiltered run benches
    // exactly the driver's correctness surface.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val pool =
      if (only.isDefined) SparkEntry.queries ++ SparkEntry.benchOnlyQueries
      else SparkEntry.queries
    // a throwing query must surface as a FAILURE, not masquerade as a fast
    // timing — its partial elapsed is recorded as None (null in the
    // artifact, excluded from min/total), and the process exits non-zero
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val warmups = scala.collection.mutable.ArrayBuffer[String]()
    val queryList = pool.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val benchT0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - benchT0) / 1e9
    var deadlineHit = false
    var lastPassWall = 0.0
    var passesDone = 0
    val passes = scala.collection.mutable.ArrayBuffer[Map[String, Option[Double]]]()
    var pass = 0
    while (pass < nPasses && !deadlineHit) {
      pass += 1
      if (pass > 1 && elapsed + lastPassWall > deadlineS) {
        // the next pass is predicted not to fit — stop with what we have
        deadlineHit = true
      } else {
        val (jit0, gc0, t0p) = (jitMs, gcMs, System.nanoTime())
        val res = scala.collection.mutable.LinkedHashMap[String, Option[Double]]()
        val it = queryList.iterator
        var aborted = false
        while (it.hasNext && !aborted) {
          val (name, fn) = it.next()
          if (pass > 1 && elapsed > deadlineS) {
            deadlineHit = true; aborted = true
            System.err.println(f"[bench] deadline ${deadlineS}%.0f s hit mid-pass$pass after $elapsed%.1f s — emitting artifact from completed work")
          } else {
            val t0 = System.nanoTime()
            val ok = try { fn(spark, sfDir).count(); true } catch {
              case e: Throwable =>
                failed += name
                System.err.println(s"[bench] FAILED $name: ${e.getMessage}")
                false
            }
            val secs = (System.nanoTime() - t0) / 1e9
            System.err.println(f"[bench] pass$pass $name $secs%.2f s${if (ok) "" else " (FAILED)"}")
            spark.catalog.clearCache() // drop operator-internal persists between queries
            res(name) = if (ok) Some(secs) else None
          }
        }
        lastPassWall = (System.nanoTime() - t0p) / 1e9
        val wallS = String.format(java.util.Locale.ROOT, "%.3f", Double.box(lastPassWall))
        warmups += s"""{"pass":$pass,"complete":${!aborted},"wall_s":$wallS,"jit_ms":${jitMs - jit0},"gc_ms":${gcMs - gc0}}"""
        passes += res.toMap
        if (!aborted) passesDone += 1
      }
    }
    val names = queryList.map(_._1).sorted
    def minOf(n: String): Option[Double] = {
      val ok = passes.flatMap(_.get(n).flatten) // partial passes lack tail queries
      if (ok.isEmpty) None else Some(ok.min)
    }
    val results = names.flatMap(n => minOf(n).map(n -> _))
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def fmt(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    // 3-decimal values: the driver keeps only a bounded stdout tail, and at
    // a 110-query surface full-precision doubles push the line start (the
    // parseable "{"metric":…" prefix) out of that window — ms precision is
    // all a min-of-passes estimate carries anyway
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val detail = names.map { n =>
      val per = passes.map(p => p.get(n).flatten.map(fmt).getOrElse("null")).mkString("[", ",", "]")
      s""""$n":{"passes":$per,"min":${minOf(n).map(fmt).getOrElse("null")}}"""
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // a failure-tainted total is NOT comparable round-over-round (the failed
    // query's cost silently vanishes from the sum) — null it in the artifact
    // and let n_queries say how many mins the total aggregates
    val totalJson = if (failed.isEmpty) fmt(total) else "null"
    val art =
      s"""{"sf":"$sfDir","cpus":$cpus,"n_passes":$nPasses,"n_passes_done":$passesDone,"deadline_s":${fmt(deadlineS)},"deadline_hit":$deadlineHit,"total_min":$totalJson,"n_queries":${results.size},"failed":$failedJson,"warmup":${warmups.mkString("[", ",", "]")},"queries":$detail}"""
    val out = java.nio.file.Paths.get(artifact)
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(out, (art + "\n").getBytes("UTF-8"))
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[bench] ${failed.size} queries FAILED: ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}
