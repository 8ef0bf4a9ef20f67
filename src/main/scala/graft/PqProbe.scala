package graft

import org.apache.spark.sql.functions._

/** Dev probe: recall@10 through expand=4 pqTopK for the md5-grid vs the
  * trained codebook, against exact brute force. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = core.Engine.session("local[16]", 16)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val e = core.Tables.table(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    println(s"[pqprobe] corpus=${e.count()}")
    val brute = ops.Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(cb: Array[Array[Array[Double]]], label: String, expand: Int): Unit = {
      val got = ops.Similarity.pqTopK(e, q, "vec_id", "embedding", 10, cb, expand = expand)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[pqprobe] $label expand=$expand recall=${got.intersect(brute).size}/${brute.size}")
    }
    recall(ops.Similarity.pqCodebook(8, 16, 8), "md5grid", 4)
    val t512 = ops.Similarity.pqCodebookTrained(e, "vec_id", "embedding", 8, 16, 8, trainCap = 512)
    recall(t512, "trained(cap512)", 4)
    recall(t512, "trained(cap512)", 8)
    val t5 = ops.Similarity.pqCodebookTrained(e, "vec_id", "embedding", 8, 16, 8, iters = 10, trainCap = 4096)
    recall(t5, "trained(cap4096,it10)", 4)
    spark.stop()
  }
}
