package graft

import graft.ops.ScaleJoins
import org.apache.spark.sql.functions._

/** Scale-join machinery: bucketed co-located joins (shuffle-free plan),
  * salted skew joins (correctness vs plain join), approximate distinct. */
class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plan has no shuffle Exchange between the scans") {
    val o = core.Tables.orders(spark, sf("sf0.001"))
    val c = core.Tables.customer(spark, sf("sf0.001"))
      .withColumnRenamed("c_custkey", "o_custkey")
    ScaleJoins.writeBucketed(o, "graft_orders_b", "o_custkey", 8)
    ScaleJoins.writeBucketed(c, "graft_customer_b", "o_custkey", 8)
    val j = ScaleJoins.bucketedJoin(spark, "graft_orders_b", "graft_customer_b", "o_custkey")
    val plan = j.queryExecution.executedPlan.toString
    // SortMergeJoin over bucketed scans: no ShuffleExchange on either side
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(j.count() == core.Tables.orders(spark, sf("sf0.001")).count())
  }

  test("salted join returns exactly the rows of the plain join") {
    val skewed = (1 to 2000).map(i => (if (i % 10 == 0) 7L else i.toLong, s"v$i")).toDF("k", "lv")
    val dim = (1L to 2000L).map(k => (k, s"d$k")).toDF("k", "rv")
    val plain = skewed.join(dim, Seq("k")).select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    val salted = ScaleJoins.saltedJoin(skewed, dim, "k", salts = 4)
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("IVF ANN: high recall vs brute force, identical scores on overlap") {
    val e = core.Tables.embeddings(spark, sf("sf0.001"))
    val q = e.filter(col("vec_id") < 5)
    val brute = ops.Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = ops.Similarity.ivfTopK(e, q, "vec_id", "embedding", 10, nlist = 8, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ivf.nonEmpty)
    val overlap = ivf.keySet.intersect(brute.keySet)
    assert(overlap.size >= ivf.size / 2, s"recall too low: ${overlap.size}/${ivf.size}")
    overlap.foreach(k => assert(ivf(k) == brute(k)))
  }

  test("stratifiedExact: exactly k per stratum, deterministic across runs") {
    val d = core.Tables.documents(spark, sf("sf0.001"))
    val s1 = ops.Sampling.stratifiedExact(d, "lang", "doc_id", 10)
      .select("doc_id").as[Long].collect().toSet
    val s2 = ops.Sampling.stratifiedExact(d, "lang", "doc_id", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)
    val counts = ops.Sampling.stratifiedExact(d, "lang", "doc_id", 10)
      .groupBy("lang").count().select("count").as[Long].collect()
    assert(counts.forall(_ == 10))
  }

  test("topTerms: ranked term frequencies per group") {
    val df = Seq((1L, "en", "a a a b b c"), (2L, "en", "b c c"), (3L, "fr", "x y x"))
      .toDF("id", "lang", "text")
    val got = ops.Sampling.topTerms(df, "lang", "text", 2)
      .orderBy(col("lang"), col("rank"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("en", "a", 3L, 1L), ("en", "b", 3L, 2L), ("fr", "x", 2L, 1L), ("fr", "y", 1L, 2L)))
  }

  test("approx distinct within rsd of exact") {
    val li = core.Tables.lineitem(spark, sf("sf0.001"))
    val r = ScaleJoins.distinctCounts(li, Seq("l_returnflag"), "l_partkey").collect()
    r.foreach { row =>
      val exact = row.getAs[Long]("exact_distinct").toDouble
      val approx = row.getAs[Long]("approx_distinct").toDouble
      assert(math.abs(approx - exact) / exact < 0.15, s"approx $approx vs exact $exact")
    }
  }
}
