package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // dev convenience (driver passes exactly 2 args): an optional 3rd arg
    // comma-list restricts the dump for fast single-query oracle iteration
    val only = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the library's own session factory (r16): previously a hand-rolled
    // builder that duplicated Engine's confs MINUS the newer ones — it
    // missed spark.sql.artifact.isolation.enabled=false, so the driver's
    // correctness runs re-paid the full streaming codegen-cache loss the
    // JIT fix removed. One factory, one configuration.
    val spark = core.Engine.session(s"local[$cpus]", cpus.toInt)
    new java.io.File(outDir).mkdirs()
    // coalesce(1) gives the driver one tidy file per query, and at the
    // driver's sf0.01 it is free. But coalesce inserts NO exchange — it
    // narrows the query's ENTIRE final stage to one task, single-threading
    // a heavy query's whole compute. For local cross-scale hardening runs
    // (sf0.1: ~10× the data) set SPARK_GRAFT_VERIFY_NO_COALESCE=1 to write
    // the query's natural (range-partitioned, globally sorted) output:
    // part files carry disjoint ascending key ranges in filename order, so
    // an order-preserving sorted-glob read (DuckDB default) sees the same
    // row order the single file would have. The driver path is unchanged.
    val noCoalesce = sys.env.get("SPARK_GRAFT_VERIFY_NO_COALESCE").contains("1")
    // the dump below generates stash-backed oracle SQL (s143 pqt, d74/p92
    // auto planes) — scope it to THIS run's dir so a stale stash from a
    // different scale fails loudly instead of emitting wrong SQL
    SparkEntry.oracleScope = Some(sfDir)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val res = fn(spark, sfDir)
        (if (noCoalesce) res else res.coalesce(1))
          .write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally spark.catalog.clearCache() // drop operator-internal persists
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
