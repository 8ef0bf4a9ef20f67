package graft

import org.apache.spark.sql.functions._

/** Dev probe (round 14): the PQ serving tiers' recall-vs-knob response —
  * the tuning curve s143's single-config report sits on. For each sfDir
  * arg, prints mean recall@10 (8 held-out queries vs exact brute force)
  * for the full-scan ADC tier across `expand` and for the bucket-pruned
  * tier across (planes, expand). The knobs trade scan cost against
  * recall: expand widens the re-rank candidate set (cost ∝ k·expand
  * exact distances per query), planes narrows the bucket prune (cost ∝
  * corpus/2^planes ADC rows per query). Random synthetic embeddings are
  * the WORST case for an untrained grid codebook — the curve's shape
  * (monotone in expand, degrading in planes) is the evidence, not the
  * absolute numbers; the trained-codebook path (pqCodebookTrained, spec
  * recall floors) lifts the whole curve. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = core.Engine.session("local[16]", 16)
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val e = core.Tables.table(spark, dir, "embeddings")
      val q = e.filter(col("vec_id") < 8)
      val exact = ops.Checkpointing.stage(
        ops.Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10))
      val cb = ops.Similarity.pqCodebook(8, 16, 8)
      def mean(approx: org.apache.spark.sql.DataFrame): Double =
        ops.Similarity.recallAtK(approx, exact)
          .agg(avg(col("recall"))).first().getDouble(0)
      for (expand <- Seq(4, 8, 16)) {
        val r = mean(ops.Similarity.pqTopK(e, q, "vec_id", "embedding",
          k = 10, codebook = cb, expand = expand))
        println(f"[recallprobe] dir=$dir tier=pq expand=$expand%-2d recall@10=$r%.3f")
      }
      for (planes <- Seq(2, 3, 4); expand <- Seq(4, 16)) {
        val r = mean(ops.Similarity.lshPqTopK(e, q, "vec_id", "embedding",
          k = 10, codebook = cb, planes = planes, dim = 64, expand = expand))
        println(f"[recallprobe] dir=$dir tier=lshpq planes=$planes expand=$expand%-2d recall@10=$r%.3f")
      }
      // the serving auto-contract (round 15): planes sized by
      // autoServingPlanes from the corpus count — the printed planes value
      // is the evidence that the knob tracks corpus growth (1 at the
      // 500-vector gate, 3 at sf0.1's 2000, 6 at the 10× stress corpus)
      // while recall stays at the fixed-knob curve's occupancy-safe end
      val n = e.count()
      for (expand <- Seq(4, 16)) {
        val planes = ops.Similarity.autoServingPlanes(n, 10, expand)
        val r = mean(ops.Similarity.lshPqTopK(e, q, "vec_id", "embedding",
          k = 10, codebook = cb, planes = planes, dim = 64, expand = expand))
        println(f"[recallprobe] dir=$dir tier=lshpq_auto n=$n planes=$planes expand=$expand%-2d recall@10=$r%.3f")
      }
    }
    spark.stop()
  }
}
