package graft

import org.apache.spark.sql.functions._

/** Theta-sketch corpus set algebra (ops/Sketches): exact-mode parity with
  * true distinct-set algebra on the corpus fixture, and the estimation-mode
  * contract (determinism as a pure function of the input set, bounded
  * relative error) the d147 scaladoc promises beyond 2^lgK distinct. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("thetaShingleOverlap: exact mode reproduces true distinct-set algebra") {
    val d = core.Tables.documents(spark, sf("sf0.001"))
    val got = ops.Sketches.thetaShingleOverlap(d, "source", "text")
      .orderBy(col("slice_a"), col("slice_b")).collect()
    // independent recompute with plain distinct sets
    val sets = d.select(col("source"),
        explode(graft.functions.TextFunctions.shingles(col("text"), 3)).as("s"))
      .distinct().collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }
    got.foreach { r =>
      val (sa, sb) = (sets(r.getString(0)), sets(r.getString(1)))
      assert(r.getLong(2) == sa.size.toLong && r.getLong(3) == sb.size.toLong)
      assert(r.getLong(4) == sa.intersect(sb).size.toLong,
        s"${r.getString(0)} x ${r.getString(1)} intersection")
      assert(r.getLong(5) == sa.union(sb).size.toLong)
      val jac = math.floor(r.getLong(4).toDouble / r.getLong(5).toDouble * 1e6 + 0.5) / 1e6
      assert(r.getDouble(6) == jac)
    }
    // every unordered slice pair reports, including zero-overlap ones
    assert(got.length == sets.size * (sets.size - 1) / 2)
  }

  test("thetaNovelty: exact mode reproduces the distinct anti-join count") {
    val d = core.Tables.documents(spark, sf("sf0.001"))
    val a = d.filter(col("doc_id") % 3 =!= 0)
    val b = d.filter(col("doc_id") % 2 =!= 0)
    val r = ops.Sketches.thetaNovelty(a, b, "text").head()
    def shingleSet(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(graft.functions.TextFunctions.shingles(col("text"), 3)).as("s"))
        .distinct().collect().map(_.getString(0)).toSet
    val (sa, sb) = (shingleSet(a), shingleSet(b))
    assert(r.getLong(0) == sa.size.toLong && r.getLong(1) == sb.size.toLong)
    assert(r.getLong(2) == sb.diff(sa).size.toLong)
    val nov = math.floor(r.getLong(2).toDouble / r.getLong(1).toDouble * 1e6 + 0.5) / 1e6
    assert(r.getDouble(3) == nov)
  }

  test("theta estimation mode: pure function of the input set, bounded error") {
    // 10k distinct values per slice through a 2^12-entry sketch → the
    // sketch leaves exact mode; the estimate must still be reproducible
    // run to run (hash-threshold retention has no RNG state) and inside
    // a few RSE (1/sqrt(4096) ≈ 1.6%) of the truth
    val xs = (1 to 20000).map(i => ("s" + (i % 2), "v" + i)).toDF("slice", "v")
    def est() = xs.groupBy(col("slice"))
      .agg(theta_sketch_estimate(theta_sketch_agg(col("v"), 12)).as("e"))
      .orderBy(col("slice")).collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val e1 = est()
    assert(e1 == est(), "theta must be a pure function of the input set")
    e1.foreach { case (s, e) =>
      assert(math.abs(e - 10000.0) / 10000.0 < 0.05, s"$s estimate $e vs 10000")
    }
  }
}
