package graft

import graft.agg.Folds
import graft.ops.Stats
import org.apache.spark.sql.functions._

/** Numeric goldens from the reference stats suite (FIXTURES.md §5;
  * agnes src/stats.rs:223-445, src/view_stats.rs:305-369). Tolerance 1e-6,
  * same as the reference tests. */
class StatsFoldsSpec extends SparkSpec {
  import spark.implicits._

  private val fixture: Seq[java.lang.Double] =
    Seq[java.lang.Double](-5.0, -4.0, null, 12.0, 3.0, null, 6.0, 0.0, -3.1)

  private def approx(a: Double, b: Double, tol: Double = 1e-6): Boolean = math.abs(a - b) <= tol

  test("describe matches reference stat goldens (stats.rs:307-328)") {
    val df = fixture.toDF("x")
    val row = Stats.describe(df, Seq("x")).collect().head
    assert(row.getAs[Long]("n") == 7)
    assert(row.getAs[Long]("n_na") == 2)
    assert(approx(row.getAs[Double]("sum"), 8.9))
    assert(approx(row.getAs[Double]("mean"), 1.271429, 1e-6))
    assert(approx(row.getAs[Double]("stdev"), 6.168391, 1e-6))
    assert(row.getAs[Double]("min") == -5.0 && row.getAs[Double]("max") == 12.0)
  }

  test("all-NA column: mean 0.0, min/max NULL (stats.rs:376-386, 434-443)") {
    val df = Seq[java.lang.Double](null, null).toDF("x")
    val row = Stats.describe(df, Seq("x")).collect().head
    assert(row.getAs[Double]("mean") == 0.0)
    assert(row.getAs[Double]("sum") == 0.0)
    assert(row.isNullAt(row.fieldIndex("min")) && row.isNullAt(row.fieldIndex("max")))
  }

  test("naCounts per column (stats.rs:12-35)") {
    val row = Stats.naCounts(fixture.toDF("x"), Seq("x")).collect().head
    assert(row.getAs[Long]("n_exists") == 7 && row.getAs[Long]("n_na") == 2)
  }

  test("custom folds: sumSq skips NA (stats.rs:86-112), meanOrZero all-NA→0 (stats.rs:76-83)") {
    val df = fixture.toDF("x")
    val ss = df.agg(Folds.sumSqCol(col("x"))).as[Double].collect().head
    // -5²+(-4)²+12²+3²+6²+0²+(-3.1)² = 25+16+144+9+36+0+9.61
    assert(approx(ss, 239.61))
    val allNa = Seq[java.lang.Double](null, null).toDF("x")
    assert(allNa.agg(Folds.meanOrZeroCol(col("x"))).as[Double].collect().head == 0.0)
    val m = df.agg(Folds.meanOrZeroCol(col("x"))).as[Double].collect().head
    assert(approx(m, 8.9 / 7))
  }

  test("view_stats goldens on emp/extra_emp fixtures (view_stats.rs:314-368)") {
    val emp = Fixtures.emp.toDF("EmpId", "DeptId", "EmpName")
    val r1 = Stats.describe(emp, Seq("EmpId")).collect().head
    assert(r1.getAs[Double]("min") == 0.0 && r1.getAs[Double]("max") == 10.0)
    assert(r1.getAs[Double]("sum") == 40.0)
    assert(approx(r1.getAs[Double]("mean"), 5.714286, 1e-4))
    assert(approx(r1.getAs[Double]("stdev"), 3.683942, 1e-4))
    val extra = Fixtures.extraEmp.toDF("SalaryOffset", "DidTraining", "VacationHrs")
    val r2 = Stats.describe(extra, Seq("SalaryOffset", "VacationHrs")).collect()
      .map(r => r.getString(0) -> r).toMap
    val so = r2("SalaryOffset")
    assert(so.getAs[Double]("min") == -33.0 && so.getAs[Double]("max") == 12.0)
    assert(so.getAs[Double]("sum") == -13.0)
    assert(approx(so.getAs[Double]("mean"), -1.857143, 1e-4))
    assert(approx(so.getAs[Double]("stdev"), 15.004761, 1e-4))
    val vh = r2("VacationHrs")
    assert(approx(vh.getAs[Double]("min"), -1.2, 1e-4) && approx(vh.getAs[Double]("max"), 98.3, 1e-4))
    assert(approx(vh.getAs[Double]("sum"), 238.6, 1e-4))
    assert(approx(vh.getAs[Double]("mean"), 34.0857143, 1e-4))
    assert(approx(vh.getAs[Double]("stdev"), 35.070948, 1e-4))
  }

  test("product fold: arbitrary non-builtin monoid via udaf") {
    val df = Seq[java.lang.Double](2.0, null, 3.0, 0.5).toDF("x")
    assert(df.agg(Folds.productCol(col("x"))).as[Double].collect().head == 3.0)
  }

  test("approxQuantiles: within rank-error of exact percentiles") {
    val li = core.Tables.lineitem(spark, sf("sf0.001")).select(col("l_extendedprice"))
    val exactVals = li.orderBy(col("l_extendedprice"))
      .collect().map(_.getDouble(0))
    val n = exactVals.length
    val probs = Seq(0.1, 0.5, 0.9)
    val got = graft.ops.Stats.approxQuantiles(li, Nil, "l_extendedprice", probs, accuracy = 1000)
      .head.getSeq[Double](0)
    probs.zip(got).foreach { case (p, q) =>
      // GK guarantee: returned value's rank within n/accuracy of ceil(p*n)
      val rank = exactVals.count(_ <= q)
      val slack = n / 1000 + 1
      assert(math.abs(rank - p * n) <= slack + 1,
        s"p=$p: rank $rank vs ${p * n} (n=$n, slack=$slack)")
    }
  }

  test("countMinSketch: never undercounts, bounded overcount") {
    val li = core.Tables.lineitem(spark, sf("sf0.001"))
    val total = li.count()
    val cms = graft.ops.Stats.countMinSketch(li, "l_returnflag", eps = 0.001, delta = 0.01)
    val exact = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"CMS undercounted $k: $est < $c")
      assert(est <= c + math.ceil(0.001 * total).toLong * 3,
        s"CMS overcount beyond bound for $k: $est vs $c")
    }
  }

  test("variance formula variants (stats.rs:139-161)") {
    val df = fixture.toDF("x")
    val r = df.agg(
      var_samp(col("x")).as("v"), var_pop(col("x")).as("vp"),
      stddev_samp(col("x")).as("s"), stddev_pop(col("x")).as("sp")).collect().head
    assert(approx(r.getAs[Double]("v"), 38.049048, 1e-5))
    assert(approx(r.getAs[Double]("vp"), 32.613469, 1e-5))
    assert(approx(r.getAs[Double]("s"), 6.168391, 1e-5))
    assert(approx(r.getAs[Double]("sp"), 5.710820, 1e-5))
  }

  test("momentsSketch: ANY disjoint split merges to EXACTLY the full sketch, empty slices are identity") {
    val rows: Seq[(Long, java.lang.Double, java.lang.Double)] =
      (1L to 40L).map { i =>
        val x: java.lang.Double = if (i % 7 == 0) null else i * 1.25 - 20.0
        val y: java.lang.Double = if (i % 11 == 0) null else 100.0 - i * 0.5
        (i, x, y)
      }
    val df = rows.toDF("k", "x", "y")
    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("field").collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), String.valueOf(r.get(3)), String.valueOf(r.get(4)),
        String.valueOf(r.get(5)), String.valueOf(r.get(6)))).toSeq
    val full = Stats.momentsSketch(df, Seq("x", "y"))
    // 3-way split by key — decimal state, so the merge is EXACT, not approx
    val parts = (0 until 3).map(i => Stats.momentsSketch(
      df.filter(col("k") % 3 === i), Seq("x", "y")))
    assert(rowsOf(Stats.mergeMoments(parts)) == rowsOf(full))
    // merging an empty slice's sketch changes nothing (n=0, sums 0,
    // extrema NULL — min/max ignore NULL)
    val empty = Stats.momentsSketch(df.filter(col("k") < 0), Seq("x", "y"))
    assert(rowsOf(Stats.mergeMoments(Seq(full, empty))) == rowsOf(full))
    // merge is associative/commutative: any merge tree, same sketch
    val treeA = Stats.mergeMoments(Seq(Stats.mergeMoments(parts.take(2)), parts(2)))
    val treeB = Stats.mergeMoments(Seq(parts(2), Stats.mergeMoments(parts.drop(1).take(1) :+ parts.head)))
    assert(rowsOf(treeA) == rowsOf(treeB) && rowsOf(treeA) == rowsOf(full))
    // exact-merge guard (r17 advice): a DIFFERENT decimal scale fails
    // loudly — unionByName would silently widen and the merged sketch
    // would match neither recompute. Same scale at a different precision
    // (a merged sketch's sum is wider than a fresh one's) must still merge:
    // the tree assertions above already exercise exactly that.
    val scaled4 = Stats.momentsSketch(df, Seq("x", "y"), scale = 4)
    val ex = intercept[IllegalArgumentException] {
      Stats.mergeMoments(Seq(full, scaled4)).collect()
    }
    assert(ex.getMessage.contains("decimal scale"))
  }

  test("psiDrift: identical slices ≈ 0, shifted slice large, clamped out-of-range, full spine, nulls out") {
    import graft.ops.Stats
    val base = ((1 to 100).map(i => Some(i.toDouble)) :+ (None: Option[Double]))
      .toDF("x")
    // identical distribution: every term 0 exactly (p == q bin-wise)
    val same = Stats.psiDrift(base, base.filter(col("x").isNotNull), "x", bins = 10)
      .collect()
    assert(same.length == 10, "every bin must emit a row")
    assert(same.forall(_.getAs[Double]("psi") == 0.0))
    assert(same.map(_.getAs[Long]("base_n")).sum == 100L, "the NULL never entered a bin")
    // hard shift: current sits entirely above base's range → clamps into
    // the top bin, PSI far beyond the 0.25 'shifted' rule of thumb
    val shifted = (1000 to 1100).map(i => Tuple1(i.toDouble)).toDF("x")
    val drift = Stats.psiDrift(base, shifted, "x", bins = 10).collect()
    assert(drift.length == 10)
    val top = drift.find(_.getAs[Long]("bin") == 9L).get
    assert(top.getAs[Long]("cur_n") == 101L, "out-of-range values clamp into the edge bin")
    assert(drift.head.getAs[Double]("psi") > 0.25, s"psi=${drift.head.getAs[Double]("psi")}")
    // a CONSTANT calibration window is rejected LOUDLY (r17 second
    // review): w = 0 would collapse both sides into bin 0 and report
    // PSI ≈ 0 "stable" for arbitrarily drifted current data — the metric
    // must not mask exactly the event it exists to catch
    val const = Seq(5.0, 5.0, 5.0).map(Tuple1(_)).toDF("x")
    val e = intercept[IllegalArgumentException](
      Stats.psiDrift(const, const, "x", bins = 4))
    assert(e.getMessage.contains("zero-width calibration window"))
  }

  test("psiBinExpr: cell assignment, edge clamping, degenerate width — the q175 stream binner") {
    import graft.ops.Stats
    val df = Seq(-5.0, 0.0, 4.99, 5.0, 45.0, 50.0, 99.0).map(Tuple1(_)).toDF("v")
    val got = df.select(Stats.psiBinExpr(col("v"), 0.0, 5.0, 10).as("b"))
      .collect().map(_.getLong(0)).toSeq
    // below-range clamps to 0, on-edge opens the next cell, at/above the
    // top edge clamps to bins-1
    assert(got == Seq(0L, 0L, 0L, 1L, 9L, 9L, 9L))
    val degenerate = df.select(Stats.psiBinExpr(col("v"), 7.0, 0.0, 10))
      .collect().map(_.getLong(0)).toSet
    assert(degenerate == Set(0L))
  }

  test("momentsReport: mean/stdev match describe on 2dp-exact data; all-NA column goes NULL") {
    val df = Seq[java.lang.Double](-5.0, -4.0, null, 12.0, 3.0, null, 6.0, 0.0, -3.1)
      .toDF("x")
    val rep = Stats.momentsReport(Stats.momentsSketch(df, Seq("x"))).collect().head
    assert(rep.getAs[Long]("n") == 7 && rep.getAs[Long]("n_na") == 2)
    assert(rep.getAs[Double]("min") == -5.0 && rep.getAs[Double]("max") == 12.0)
    assert(rep.getAs[Double]("sum") == 8.9)
    assert(approx(rep.getAs[Double]("mean"), 1.271429, 1e-6))
    assert(approx(rep.getAs[Double]("stdev"), 6.168391, 1e-6))
    // all-NA: the maintenance sketch reports NULL mean/stdev (describe
    // keeps the reference's 0.0 sink contract — different consumers)
    val na = Stats.momentsReport(Stats.momentsSketch(
      Seq[java.lang.Double](null, null).toDF("x"), Seq("x"))).collect().head
    assert(na.getAs[Long]("n") == 0L && na.isNullAt(na.fieldIndex("mean"))
      && na.isNullAt(na.fieldIndex("stdev")))
  }
}
