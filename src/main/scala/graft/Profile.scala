package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the bench hot spots (not part of the driver
  * contract). Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Profile"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = core.Engine.session("local[32]", 32)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val d = core.Tables.table(spark, dir, "documents")
    time("docs read+count")(d.count())
    time("docs widen count")(core.Par.widen(d).count())

    val wd = core.Par.widen(d)
    val sh0 = wd.select(col("doc_id").as("id"),
      explode(array_distinct(TextFunctions.shingles(col("text"), 3))).as("shingle"))
    time("shingle explode")(sh0.count())
    time("shingle explode again")(sh0.count())

    // d22 pieces
    val sh = sh0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("persist materialize")(sh.count())
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    time("sizes")(sizes.count())
    val a = sh.toDF("id_a", "shingle_a")
    val b = sh.toDF("id_b", "shingle_b")
    val inter = a.hint("shuffle_hash")
      .join(b, a("shingle_a") === b("shingle_b") && a("id_a") < b("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    time("inter (shuffle_hash)")(inter.count())
    val inter2 = a.join(b, a("shingle_a") === b("shingle_b") && a("id_a") < b("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    time("inter (no hint)")(inter2.count())
    val joined = inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= 0.8)
    time("d22 full tail")(joined.count())
    sh.unpersist()

    time("d22 end-to-end")(SparkEntry.queries("d22_jaccard_pairs")(spark, dir).count())
    spark.catalog.clearCache()

    // d23 pieces
    val sets = wd.select(col("doc_id").as("id"),
        array_distinct(TextFunctions.shingles(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("d23 sets persist")(sets.count())
    val shingles2 = sets.select(col("id"), explode(col("sh")).as("shingle"))
    val sig = ops.Dedup.minHashSignatures(shingles2, 64)
    time("d23 signatures (64 aggs)")(sig.count())
    val banded = sig.select(col("id"),
      posexplode(array((0 until 16).map { bnd =>
        xxhash64((0 until 4).map(j => col(s"h${bnd * 4 + j}")): _*)
      }: _*)).as(Seq("band", "bsig")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("d23 banded persist")(banded.count())
    val l = banded.toDF("id_a", "band_a", "bsig_a")
    val rt = banded.toDF("id_b", "band_b", "bsig_b")
    val cand = l.hint("shuffle_hash").join(rt,
        l("band_a") === rt("band_b") && l("bsig_a") === rt("bsig_b") && l("id_a") < rt("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    time("d23 candidates")(cand.count())
    spark.catalog.clearCache()
    time("d23 end-to-end")(SparkEntry.queries("d23_minhash_lsh")(spark, dir).count())
    spark.catalog.clearCache()

    // d24, s36
    time("d24 end-to-end")(SparkEntry.queries("d24_simhash_pairs")(spark, dir).count())
    spark.catalog.clearCache()
    val e = core.Tables.table(spark, dir, "embeddings")
    time("s36 kmeans only") {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val train = core.Par.widen(e).select(array_to_vector(
        transform(col("embedding"), x => x.cast("double"))).as("features"))
      val model = new KMeans().setK(16).setSeed(42L).setMaxIter(5).fit(train)
      model.clusterCenters.length.toLong
    }
    time("s36 end-to-end")(SparkEntry.queries("s36_ann_ivf")(spark, dir).count())
    spark.stop()
  }
}
