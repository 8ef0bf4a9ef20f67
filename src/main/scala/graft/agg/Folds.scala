package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom aggregation folds — the Spark counterpart of agnes's arbitrary
  * `aggregate(init, f)` user folds (src/view.rs:1496-1586, fold applied at
  * view.rs:1516-1525).
  *
  * The reference fold is sequential-only (`Fn(&mut Agg, Value<&T>)`); Spark's
  * `Aggregator` additionally demands an associative+commutative `merge` so
  * partial aggregates combine map-side before the shuffle — the price of
  * distribution, and the reason these run at 100 TB while the reference is
  * single-threaded. Every fold here states its merge explicitly.
  *
  * NULL handling matches the reference: NA values are skipped by the fold
  * (agnes folds receive `Value::Na` and the built-in folds ignore it,
  * src/stats.rs:37-61).
  */
object Folds {

  /** Sum of squares (agnes `SumSq`, src/stats.rs:86-112; NA contributes 0). */
  val sumSq: Aggregator[java.lang.Double, Double, Double] =
    new Aggregator[java.lang.Double, Double, Double] {
      def zero: Double = 0.0
      def reduce(b: Double, a: java.lang.Double): Double =
        if (a == null) b else b + a * a
      def merge(b1: Double, b2: Double): Double = b1 + b2
      def finish(b: Double): Double = b
      def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Mean ignoring NA, 0.0 when all-NA (agnes `Mean`, src/stats.rs:63-84). */
  val meanOrZero: Aggregator[java.lang.Double, (Double, Long), Double] =
    new Aggregator[java.lang.Double, (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), a: java.lang.Double): (Double, Long) =
        if (a == null) b else (b._1 + a, b._2 + 1)
      def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
        (a._1 + b._1, a._2 + b._2)
      def finish(b: (Double, Long)): Double = if (b._2 == 0) 0.0 else b._1 / b._2
      def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Product fold — an example of an arbitrary user fold the reference API
    * admits; included to exercise the UDAF path with a non-built-in monoid. */
  val product: Aggregator[java.lang.Double, Double, Double] =
    new Aggregator[java.lang.Double, Double, Double] {
      def zero: Double = 1.0
      def reduce(b: Double, a: java.lang.Double): Double = if (a == null) b else b * a
      def merge(b1: Double, b2: Double): Double = b1 * b2
      def finish(b: Double): Double = b
      def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Column-level handles usable in `df.agg(...)`. */
  def sumSqCol(c: Column): Column      = udaf(sumSq).apply(c)
  def meanOrZeroCol(c: Column): Column = udaf(meanOrZero).apply(c)
  def productCol(c: Column): Column    = udaf(product).apply(c)
}
