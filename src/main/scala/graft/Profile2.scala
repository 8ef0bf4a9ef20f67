package graft

/** Dev-only: repeated-run timing distribution for one query. */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = sys.env.getOrElse("SPARK_GRAFT_Q", "d22_jaccard_pairs")
    val spark = core.Engine.session("local[32]", 32)
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(qname)(spark, dir).count()
      val gc = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      val gcMs = { var s = 0L; gc.forEach(b => s += b.getCollectionTime); s }
      println(f"[prof] $qname run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows, cumGC ${gcMs}ms)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
