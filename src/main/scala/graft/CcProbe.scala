package graft
import org.apache.spark.sql.functions._

/** Dev tool: run connectedComponents on a saved pair-list parquet with the
  * round-pacing log — the repro harness for the r8 stats-compounding
  * planner blowup (see the truncate note in ops/Dedup.scala). Usage:
  * `GRAFT_CC_LOG=1 runMain graft.CcProbe [pairsParquet] [maxIter]`. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = core.Engine.session("local[8]", 8)
    val path = args.headOption.getOrElse("/tmp/vsf1/d74_embed_neardup_lsh")
    val maxIter = if (args.length > 1) args(1).toInt else 50
    val pairs = spark.read.parquet(path).select(col("id_a"), col("id_b"))
    val t0 = System.nanoTime()
    val cc = ops.Dedup.connectedComponents(pairs, "id_a", "id_b", maxIter)
    val n = cc.count()
    println(f"[ccprobe] ${(System.nanoTime() - t0) / 1e9}%.1f s, $n labeled nodes")
    spark.stop()
  }
}
