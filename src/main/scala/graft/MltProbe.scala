package graft

import org.apache.spark.sql.functions._

/** Round-16 diagnostic: where does s157_sparse_mlt's sf0.1 time go?
  * Times each stage of the chain separately on a warm session. */
object MltProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = core.Engine.session("local[32]", 32)
    val docs = core.Tables.documents(spark, dir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mlt] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (rep <- 1 to 2) {
      println(s"[mlt] ---- rep $rep ----")
      val toks = docs.select(col("doc_id").as("id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "").as("__t"))
        .filter(size(col("__t")) >= 3)
        .select(col("id"), expr(
          "transform(sequence(1, size(__t) - 2), i -> concat_ws(' ', slice(__t, i, 3)))").as("__terms"))
        .select(col("id"), explode(col("__terms")).as("w"))
      val tf = toks.groupBy(col("id"), col("w")).agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val n = broadcast(docs.agg(count(lit(1)).as("__n")))
      val wq0 = tf.join(dfq, Seq("w")).crossJoin(n)
        .withColumn("wq", floor(col("tf") * (col("__n") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) * lit(1e3) + lit(0.5)).cast("long"))
        .select(col("id"), col("w"), col("wq"), col("df"))
      time("toks count") { toks.count() }
      time("tf count") { tf.count() }
      time("dfq count") { dfq.count() }
      time("wq0 count (no checkpoint)") { wq0.count() }
      val wq = time("stage wq (localCheckpoint)") { ops.Checkpointing.stage(wq0) }
      time("norms count") {
        wq.groupBy(col("id"))
          .agg(sum((col("wq") * col("wq")).cast("decimal(38,0)")).as("norm2")).count()
      }
      val posts = wq.filter(col("df") <= 500)
      val a = posts.toDF("id_a", "w", "wq_a", "df_a")
      val b = posts.toDF("id_b", "w", "wq_b", "df_b")
      val joined = a.hint("shuffle_hash").join(b, Seq("w"))
        .filter(col("id_a") < col("id_b"))
      time("pair join count only") { joined.count() }
      val dots = joined.groupBy(col("id_a"), col("id_b"))
        .agg(sum((col("wq_a").cast("decimal(19,0)") * col("wq_b").cast("decimal(19,0)")).cast("decimal(38,0)")).as("dot"))
      time("dots (decimal agg)") { dots.count() }
      val dotsL = joined.groupBy(col("id_a"), col("id_b"))
        .agg(sum(col("wq_a") * col("wq_b")).as("dotl"))
      time("dots (long agg, overflow-unsafe)") { dotsL.count() }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
