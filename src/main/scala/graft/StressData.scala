package graft

import org.apache.spark.sql.functions._

/** Dev-only: derive an N× stress corpus from the driver's sf0.1 tables, for
  * scale evidence on the dedup/ANN family (the driver generates no sf1 data).
  *
  * Scaling must not manufacture a quadratic output blow-up: naive
  * replication makes every copy of a document an exact/near duplicate of
  * its siblings, so pair queries would emit O(copies²) rows and any timing
  * would measure the synthetic explosion, not the engine. Instead each copy
  * is made mutually NON-duplicate while preserving intra-copy structure:
  *  - documents, copy k>0: every token suffixed `_k` — shingle/token sets
  *    are isomorphic per copy (same sizes, same intersections, same skew),
  *    disjoint across copies;
  *  - embeddings, copy k>0: dimensions cyclically rotated by 7k — cosine is
  *    invariant under a common permutation, so intra-copy geometry (and the
  *    near-dup pair structure) is exactly preserved, while cross-copy
  *    vectors decorrelate.
  * Ids shift by k·10⁹ per copy, so copy 0 keeps the original ids (the ANN
  * query sets still resolve).
  */
object StressData {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val spark = core.Engine.session("local[32]", 32)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val dN = (0 until copies).map { k =>
      val d = docs.withColumn("doc_id", col("doc_id") + lit(k.toLong * 1000000000L))
      if (k == 0) d
      else d.withColumn("text",
        array_join(transform(split(col("text"), " "), t => concat(t, lit(s"_$k"))), " "))
    }.reduce(_ unionByName _)
    dN.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val eN = (0 until copies).map { k =>
      val e = emb.withColumn("vec_id", col("vec_id") + lit(k.toLong * 1000000000L))
      val s = (7 * k) % dim
      if (s == 0) e
      else e.withColumn("embedding",
        concat(slice(col("embedding"), s + 1, dim - s), slice(col("embedding"), 1, s)))
    }.reduce(_ unionByName _)
    eN.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"[stress] wrote $out: docs=${spark.read.parquet(s"$out/documents.parquet").count()} " +
      s"embeddings=${spark.read.parquet(s"$out/embeddings.parquet").count()}")
    spark.stop()
  }
}
