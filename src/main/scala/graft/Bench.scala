package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // committed per-round artifact with per-pass AND min numbers, so builder
    // and driver benches can be diffed from the repo alone
    val artifact = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/BENCH_local.json")
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Multiple passes, min per query: host timing noise on this VM is 2-4x
    // run-to-run, and the minimum is the stable estimate of true cost.
    // optional comma-separated query filter (e.g. the dedup/ANN family for
    // the sf1 stress artifact, whose dir has only documents + embeddings)
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a throwing query must surface as a FAILURE, not masquerade as a fast
    // timing — the artifact records it and the process exits non-zero
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val passes = (1 to nPasses).map { pass =>
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            failed += name
            System.err.println(s"[bench] FAILED $name: ${e.getMessage}")
        }
        val secs = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] pass$pass $name $secs%.2f s")
        spark.catalog.clearCache() // drop operator-internal persists between queries
        name -> secs
      }.toMap
    }
    val names = passes.head.keys.toSeq.sorted
    val results = names.map(name => name -> passes.map(_(name)).min)
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def fmt(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val detail = names.map { n =>
      val per = passes.map(p => fmt(p(n))).mkString("[", ",", "]")
      s""""$n":{"passes":$per,"min":${fmt(passes.map(_(n)).min)}}"""
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val art =
      s"""{"sf":"$sfDir","cpus":$cpus,"n_passes":$nPasses,"total_min":${fmt(total)},"failed":$failedJson,"queries":$detail}"""
    val out = java.nio.file.Paths.get(artifact)
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(out, (art + "\n").getBytes("UTF-8"))
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[bench] ${failed.size} queries FAILED: ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}
