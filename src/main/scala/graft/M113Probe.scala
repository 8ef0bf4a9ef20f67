package graft

import org.apache.spark.sql.functions._

/** Dev probe (round 11): adjudicate m113's 6.2× 10×-stress ratio — is the
  * growth the banded-Hamming CANDIDATE set (quadratic bucket occupancy =
  * data shape) or fixed bucket width? Prints, per sfDir arg: signature
  * count, per-band bucket-occupancy candidate sum Σ C(k,2), the top bucket
  * widths, and the verified output pair count. */
object M113Probe {
  def main(args: Array[String]): Unit = {
    val spark = core.Engine.session("local[16]", 16)
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val media = graft.multimodal.Multimodal.attachBinary(
        core.Tables.table(spark, dir, "documents"), "doc_id", "text")
      val sigs = graft.multimodal.Multimodal.pHash60(media)
        .select(col("id"), col("phash").as("simhash")).cache()
      val n = sigs.count()
      // the production banding itself (private[graft]): the probe's bucket
      // occupancy is BY CONSTRUCTION the candidate set simHashPairs joins
      val banded = ops.Dedup.simHashBanded(sigs)
      val buckets = banded.groupBy("band", "bsig").agg(count(lit(1)).as("k"))
        .cache()
      val cand = buckets.agg(sum((col("k") * (col("k") - 1) / 2).cast("long")))
        .first().getLong(0)
      val top = buckets.orderBy(col("k").desc).limit(5)
        .collect().map(r => s"${r.getLong(2)}").mkString(",")
      val pairs = ops.Dedup.simHashPairs(sigs, maxDist = 3).count()
      println(s"[m113probe] dir=$dir sigs=$n candidates=$cand topBucketK=$top outPairs=$pairs")
      sigs.unpersist(); buckets.unpersist()
    }
    spark.stop()
  }
}
