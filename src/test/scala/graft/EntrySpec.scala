package graft

/** Driver-contract smoke: `entry` must return rows on sf0.001 (t1 gate),
  * and every declared oracle key must correspond to a query. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query; queries without oracle are known") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
    // the sanctioned rows-only set: randomized sketch (q57), iterative
    // float optimization (s36), and the unigram hard-EM stage (t153 —
    // per-word Viterbi DP has no SQL replay; its seed stage t152 is
    // oracle-exact and UnigramSpec carries the EM bound)
    val rowsOnly = qs.diff(os)
    assert(rowsOnly == Set("s36_ann_ivf", "q57_approx_distinct", "t153_unigram_lm"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("all queries execute on sf0.001 (empty results allowed, e.g. anti-join)") {
    val dir = sf("sf0.001")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count() // throws on any planning/execution error
      assert(n >= 0, name)
      spark.catalog.clearCache()
    }
  }

  test("normalizeEventTs: every driver ts generation folds to one shape") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // one instant, three physical flavors the generator has produced:
    // int64 nanoseconds, naive timestamp[us] (TIMESTAMP_NTZ), tz-aware µs
    val usEpoch = 820454400123456L // 1996-01-01 00:00:00.123456 UTC
    val base = spark.range(1).select(lit(7L).as("event_id"), lit(usEpoch).as("us"),
      lit("purchase").as("event_type"))
    val flavors = Seq(
      base.select(col("event_id"), (col("us") * 1000L).as("ts"), col("event_type")),
      base.select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"), col("event_type")),
      base.select(col("event_id"),
        timestamp_micros(col("us")).as("ts"), col("event_type")))
    val outs = flavors.map { df =>
      val out = core.Tables.normalizeEventTs(df)
      // shape: ts_ns long replaces ts in place, µs TIMESTAMP appended last
      assert(out.columns.toSeq == Seq("event_id", "ts_ns", "event_type", "ts"), df.schema.simpleString)
      assert(out.schema("ts_ns").dataType == LongType)
      assert(out.schema("ts").dataType == TimestampType)
      out.select(col("ts_ns"), unix_micros(col("ts")).as("ts_us")).head()
    }
    outs.foreach { r =>
      assert(r.getLong(0) == usEpoch * 1000L, s"ts_ns ${r.getLong(0)}")
      assert(r.getLong(1) == usEpoch, s"ts ${r.getLong(1)}")
    }
    val bad = base.select(col("event_id"), col("us").cast("string").as("ts"))
    intercept[IllegalArgumentException](core.Tables.normalizeEventTs(bad))
  }
}
