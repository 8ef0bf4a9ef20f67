package graft

/** Round-16 diagnostic (VERDICT #1): where does the streaming family's
  * per-rep JIT go? Runs one streaming query N times in one JVM and prints,
  * per rep: wall seconds, Janino compilations + generated-source bytes +
  * compile ms (Spark's CodegenMetrics — cache MISSES only; a cache hit
  * adds nothing), and JVM JIT ms. If reps 2+ still compile fresh Janino
  * classes, the codegen cache is missing on re-analysis and the fix is to
  * make the per-run plan reuse cached code, not to warm anything. */
object StreamJitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val name = if (args.length > 1) args(1) else "q94_stream_neardup"
    val reps = if (args.length > 2) args(2).toInt else 4
    val spark = core.Engine.session("local[16]", 16)
    // dump every Janino-compiled source (cache misses only) so reps can be
    // diffed: what text is unstable across re-analyses of the same query?
    if (sys.env.contains("GRAFT_PROBE_DUMP"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
        org.apache.logging.log4j.Level.DEBUG)
    val fn = SparkEntry.queries(name)
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    def jit: Long = {
      val c = java.lang.management.ManagementFactory.getCompilationMXBean
      if (c != null && c.isCompilationTimeMonitoringSupported) c.getTotalCompilationTime else -1L
    }
    for (i <- 1 to reps) {
      val (c0, b0, t0, j0) = (cg.METRIC_COMPILATION_TIME.getCount,
        cg.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount,
        cg.METRIC_SOURCE_CODE_SIZE.getCount, jit)
      val w0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val secs = (System.nanoTime() - w0) / 1e9
      println(f"[probe] $name rep $i: $secs%.3f s rows=$n janino_compiles=${cg.METRIC_COMPILATION_TIME.getCount - c0} janino_src_bytes=${cg.METRIC_SOURCE_CODE_SIZE.getCount - t0} janino_bytecode=${cg.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount - b0} jvm_jit_ms=${jit - j0}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
