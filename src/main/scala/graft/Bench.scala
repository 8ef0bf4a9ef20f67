package graft

/** Benchmark entrypoint (driver contract: ONE JSON line on stdout).
  *
  * QUERY-MAJOR scheduling (round 10): each query runs `reps` times
  * back-to-back, so its plans/codegen stay hot and min-of-reps is a WARM
  * minimum even when the host is slow — the round-7/round-9 failure mode
  * (pass-major scheduling + a slow host = the deadline consumed by one
  * all-cold pass, every published number a JIT artifact) cannot recur:
  *  - queries run cheapest-first (ordered by the latest committed
  *    bench/BENCH_local_r*.json mins), so a deadline truncates the
  *    expensive TAIL, not the whole surface;
  *  - the artifact is (re)written after every query, so an external kill
  *    loses at most the in-flight query;
  *  - on deadline, everything reached has a warm min (reps 2+ of a query
  *    are only skipped when the deadline hits between its reps — flagged
  *    per-query as "warm":false).
  * The stdout line is a COMPACT summary (total, counts, slowest-10) —
  * the full 141-query line exceeded the driver's ~2.2 KB stdout-tail
  * capture in r8 AND r9 (`parsed: null`); per-query detail lives in the
  * committed artifact.
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

  /** Per-query warm mins from the newest committed round artifact
    * (bench/BENCH_local_r{N}.json, highest N; override with
    * SPARK_GRAFT_BENCH_ORDER). Used ONLY to order cheapest-first —
    * a parse failure degrades to name order, never to an error. */
  private def priorMins(): (String, Map[String, Double]) = {
    import java.nio.file.{Files, Paths}
    val explicit = sys.env.get("SPARK_GRAFT_BENCH_ORDER").map(Paths.get(_))
    val chosen = explicit.orElse {
      val dir = Paths.get("bench")
      if (!Files.isDirectory(dir)) None
      else {
        import scala.jdk.CollectionConverters._
        val re = "BENCH_local_r(\\d+)\\.json".r
        Files.list(dir).iterator().asScala
          .flatMap { p => p.getFileName.toString match {
            case re(n) => Some((n.toInt, p)); case _ => None } }
          .toSeq.sortBy(-_._1).headOption.map(_._2)
      }
    }
    chosen match {
      case Some(p) if Files.isReadable(p) =>
        val txt = new String(Files.readAllBytes(p), "UTF-8")
        val q = "\"([A-Za-z0-9_]+)\":\\{\"passes\":\\[[^\\]]*\\],\"min\":([0-9.]+)".r
        (p.toString, q.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap)
      case _ => ("none", Map.empty)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val artifact = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/BENCH_local.json")
    // 3 back-to-back reps per query: rep 1 pays that query's JIT, reps 2-3
    // are warm; min-of-3 estimates the same statistic pass-major min-of-3
    // did, without needing three full passes to fit the deadline.
    val reps = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt.max(1)
    // Wall-clock deadline (seconds, from just before the first query): no
    // NEW query (and no additional rep) starts past it. Worst-case
    // overshoot = one in-flight rep; the running artifact already holds
    // every completed query either way.
    val deadlineS = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_S", "420").toDouble
    // the library's own session factory (incl. the scale-aware AQE knobs):
    // the bench must measure the configuration users actually run
    val spark = core.Engine.session(s"local[$cpus]", cpus.toInt)
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
    val (orderSource, prior) = priorMins()
    // cheapest-first; queries with no committed min (new this round) slot
    // at a mid-cost 0.5 s estimate rather than the front (they may be
    // expensive) or the back (they would never get driver numbers)
    val queryList = pool.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy { case (name, _) => (prior.getOrElse(name, 0.5), name) }
    // a throwing query must surface as a FAILURE, not masquerade as a fast
    // timing — its failed rep is recorded as null (excluded from min/total)
    // and the process exits non-zero
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val benchT0 = System.nanoTime()
    val (jit0, gc0) = (jitMs, gcMs)
    def elapsed: Double = (System.nanoTime() - benchT0) / 1e9
    var deadlineHit = false
    // per query: (rep timings in run order; None = that rep failed)
    val results = scala.collection.mutable.LinkedHashMap[String, Vector[Option[Double]]]()
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def fmt(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def minOf(ts: Vector[Option[Double]]): Option[Double] = {
      val ok = ts.flatten; if (ok.isEmpty) None else Some(ok.min)
    }
    def isWarm(ts: Vector[Option[Double]]): Boolean = ts.flatten.size >= 2
    def writeArtifact(done: Boolean): Unit = {
      val mins = results.toSeq.flatMap { case (n, ts) => minOf(ts).map(n -> _) }
      val nWarm = results.count { case (_, ts) => isWarm(ts) }
      val total = mins.map(_._2).sum
      // a failure-tainted total is NOT comparable round-over-round (the
      // failed query's cost silently vanishes from the sum) — null it and
      // let n_queries say how many mins the total aggregates
      val totalJson = if (failed.isEmpty) fmt(total) else "null"
      val detail = results.toSeq.sortBy(_._1).map { case (n, ts) =>
        val per = ts.map(_.map(fmt).getOrElse("null")).mkString("[", ",", "]")
        s""""$n":{"passes":$per,"min":${minOf(ts).map(fmt).getOrElse("null")},"warm":${isWarm(ts)}}"""
      }.mkString("{", ",", "}")
      val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val skipped = queryList.map(_._1).filterNot(results.contains)
      val skippedJson = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
      val art =
        s"""{"sf":"$sfDir","cpus":$cpus,"scheduling":"query-major","order_source":"$orderSource","reps":$reps,"deadline_s":${fmt(deadlineS)},"deadline_hit":$deadlineHit,"complete":$done,"wall_s":${fmt(elapsed)},"jit_ms":${jitMs - jit0},"gc_ms":${gcMs - gc0},"total_min":$totalJson,"n_queries":${mins.size},"n_warm":$nWarm,"failed":$failedJson,"skipped":$skippedJson,"queries":$detail}"""
      val out = java.nio.file.Paths.get(artifact)
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(out, (art + "\n").getBytes("UTF-8"))
    }
    val it = queryList.iterator
    while (it.hasNext && !deadlineHit) {
      val (name, fn) = it.next()
      if (elapsed > deadlineS) {
        deadlineHit = true
        System.err.println(f"[bench] deadline ${deadlineS}%.0f s hit after $elapsed%.1f s — ${results.size}/${queryList.size} queries measured (all warm)")
      } else {
        var ts = Vector.empty[Option[Double]]
        var rep = 0
        var stop = false
        while (rep < reps && !stop) {
          rep += 1
          if (rep > 1 && elapsed > deadlineS) {
            // keep rep-1's (cold) min rather than discard the query; the
            // per-query "warm" flag records the downgrade
            deadlineHit = true; stop = true
          } else {
            val t0 = System.nanoTime()
            val ok = try { fn(spark, sfDir).count(); true } catch {
              case e: Throwable =>
                failed += name
                System.err.println(s"[bench] FAILED $name: ${e.getMessage}")
                false
            }
            val secs = (System.nanoTime() - t0) / 1e9
            ts :+= (if (ok) Some(secs) else None)
            spark.catalog.clearCache() // drop operator-internal persists between reps
            if (!ok) stop = true // don't re-run a throwing query twice more
          }
        }
        results(name) = ts
        System.err.println(f"[bench] $name ${ts.map(_.map(fmt).getOrElse("FAIL")).mkString("/")} s min=${minOf(ts).map(fmt).getOrElse("-")}")
        writeArtifact(done = false)
      }
    }
    writeArtifact(done = !deadlineHit)
    val mins = results.toSeq.flatMap { case (n, ts) => minOf(ts).map(n -> _) }
    val total = mins.map(_._2).sum
    val nWarm = results.count { case (_, ts) => isWarm(ts) }
    // slowest-10 only: keeps the line well under the driver's ~2.2 KB
    // stdout-tail capture; the artifact has the full per-query map
    val slow = mins.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${mins.size},"n_warm":$nWarm,"deadline_hit":$deadlineHit,"failed":$failedJson,"artifact":"$artifact","queries":$slow,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[bench] ${failed.size} queries FAILED: ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}
