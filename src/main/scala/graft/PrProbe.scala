package graft
import org.apache.spark.sql.functions._
object PrProbe {
  def main(args: Array[String]): Unit = {
    val spark = core.Engine.session("local[32]", 32)
    val docs = core.Tables.documents(spark, "/root/testdata/sf0.1")
    def time[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f
      println(f"[probe] $l ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val sims = ops.Dedup.simHash(docs, "doc_id", "text")
    val pairs = ops.Dedup.simHashPairs(sims, maxDist = 3)
    val n = time("pairs count")(pairs.count())
    println(s"[probe] pairs = $n, nodes = " + pairs.select(col("id_a")).union(pairs.select(col("id_b"))).distinct().count())
    time("pageRank 10 iters")(ops.Graph.pageRank(pairs, "id_a", "id_b", 10).count())
    time("pageRank again")(ops.Graph.pageRank(pairs, "id_a", "id_b", 10).count())
    spark.stop()
  }
}
