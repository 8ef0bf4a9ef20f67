package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column summary statistics — the reference's `view_stats` sink
  * (agnes src/view_stats.rs:219-303: Field/Type/Min/Max/Sum/Mean/StDev per
  * column) plus the per-statistic primitives from src/stats.rs.
  *
  * Everything runs in ONE aggregation pass over the table (single scan, one
  * reduce) — the reference also folds each column once but re-walks per
  * statistic; here the statistics for every column are computed together and
  * the tiny 1×(7·N) result row is reshaped driver-side.
  *
  * Reference NA edge cases reproduced (src/stats.rs:76-83, 139-160):
  * mean/variance of an all-NA column are 0.0 (not NULL); min/max are NULL.
  */
object Stats {

  /** Long-format stats table: one row per requested numeric column with
    * (field, dtype, n, n_na, min, max, sum, mean, stdev). Deterministic row
    * order = input column order.
    */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      val d = col(c).cast(DoubleType)
      Seq(
        count(d).as(s"${c}__n"),
        (count(lit(1)) - count(d)).as(s"${c}__n_na"),
        min(d).as(s"${c}__min"),
        max(d).as(s"${c}__max"),
        coalesce(sum(d), lit(0.0)).as(s"${c}__sum"),
        coalesce(avg(d), lit(0.0)).as(s"${c}__mean"),
        coalesce(stddev_samp(d), lit(0.0)).as(s"${c}__stdev"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // Reshape the single wide row into long format with stack — still one job.
    val fields = cols.zipWithIndex.map { case (c, i) =>
      val dtype = df.schema(c).dataType.simpleString
      s"'$c', '$dtype', `${c}__n`, `${c}__n_na`, `${c}__min`, `${c}__max`, `${c}__sum`, `${c}__mean`, `${c}__stdev`"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $fields) as (field, dtype, n, n_na, min, max, sum, mean, stdev)"))
  }

  /** Approximate quantiles via Spark's Greenwald-Khanna sketch
    * (`approx_percentile`) — the 100 TB tier of q39's exact percentiles: an
    * exact quantile needs a full sort, the sketch is one pass with bounded
    * memory and rank error ≤ 1/`accuracy`. Returns one row per group with an
    * array column of the requested quantiles. */
  def approxQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
                      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val pcts = typedLit(probs)
    val grouped = if (keys.isEmpty) df.groupBy() else df.groupBy(keys.map(col): _*)
    grouped.agg(percentile_approx(col(valueCol), pcts, lit(accuracy)).as("approx_quantiles"))
  }

  /** Count-min sketch for heavy-hitter frequency estimates: constant memory,
    * one pass, point-query estimates that only ever over-count (by ≤ eps·N
    * with probability 1-delta) — the frequency analogue of the HLL tier in
    * [[ScaleJoins.distinctCounts]]. Driver-side queryable sketch. */
  def countMinSketch(df: DataFrame, valueCol: String,
                     eps: Double = 0.001, delta: Double = 0.01,
                     seed: Int = 42): org.apache.spark.util.sketch.CountMinSketch =
    df.stat.countMinSketch(valueCol, eps, delta, seed)

  /** Per-column NA / existing counts (agnes `NaCount`, src/stats.rs:12-35). */
  def naCounts(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__exists"),
          (count(lit(1)) - count(col(c))).as(s"${c}__na"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val fields = cols.map(c => s"'$c', `${c}__exists`, `${c}__na`").mkString(", ")
    wide.select(expr(s"stack(${cols.size}, $fields) as (field, n_exists, n_na)"))
  }
}
