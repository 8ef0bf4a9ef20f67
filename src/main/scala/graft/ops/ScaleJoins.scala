package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join machinery for the cases that decide whether a plan survives a 100×
  * scale-up: co-located (bucketed) joins that skip the shuffle entirely, and
  * salted joins that break hot keys. (Beyond the reference surface — agnes
  * is single-node and has only an in-memory sort-merge join,
  * src/join.rs:443-531.)
  */
object ScaleJoins {

  /** Persist a table bucketed by `key` so future equi-joins on `key` between
    * co-bucketed tables need NO shuffle (both sides pre-partitioned on disk).
    * The 100 TB pattern for fact tables joined repeatedly on the same key.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sortBy: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a previous JVM's metastore may be gone while the managed location
    // remains; clear the orphaned directory so saveAsTable can claim it
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    sortBy.map(w.sortBy(_)).getOrElse(w).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — shuffle-free when both
    * were written with [[writeBucketed]] and equal bucket counts. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)

  /** Skew-aware equi-join, size-adaptive between the two plans that beat a
    * hot key at different scales:
    *
    *  - **Broadcast short-circuit** — when the small side's estimated size
    *    (Catalyst plan statistics, no extra job) fits
    *    `broadcastBudgetBytes`, this is a plain broadcast hash join on
    *    `key`. A broadcast join never shuffles the large side, so there is
    *    no hot partition to split and salting would only multiply the
    *    broadcast build by `salts` — the exact fragility (a salts×|small|
    *    hash relation built under heap pressure) this branch avoids.
    *  - **Salted shuffle join** — when the small side exceeds the budget,
    *    the large side gets a deterministic salt in [0, salts), the small
    *    side is replicated `salts` times (exploded AFTER an explicit
    *    repartition so the replication is distributed, and hinted
    *    `shuffle_hash` so the plan never re-broadcasts the exploded
    *    relation), and the join runs on (key, salt). Breaks a hot key's
    *    single monster partition into `salts` tasks — the pathological case
    *    AQE's skew splitter can't handle (one key bigger than memory).
    *
    * The salt hashes `key` plus `saltCols` — a NARROW natural key (e.g. a
    * line number) that varies within the hot key. Hashing only `key` would
    * put every row of the hot key in one salt bucket (no split); hashing the
    * whole row would reference every column and defeat column pruning at the
    * scan. Caveat: rows identical across (key ++ saltCols) hash to the same
    * salt, so a hot key made of duplicate rows only splits if `saltCols`
    * actually varies — pick a column that does (any unique-ish id).
    * Either branch returns exactly the rows of the plain equi-join for the
    * supported join types: inner, left (outer), left_semi, left_anti.
    * Right/full outer are rejected — on the salted path an unmatched
    * small-side row exists once per salt, so the null-extended output
    * would carry `salts` duplicate copies.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int, saltCols: Seq[String],
                 joinType: String = "inner",
                 broadcastBudgetBytes: Long = 32L << 20): DataFrame = {
    require(salts > 1, "salts must be > 1")
    require(saltCols.nonEmpty,
      "saltCols must name at least one column that varies within a hot key")
    require(!Set("right", "rightouter", "full", "fullouter", "outer")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not support join type '$joinType': unmatched " +
        "small-side rows would be emitted once per salt")
    // optimizer ESTIMATE: exact for a freshly-scanned file source, but a
    // post-shuffle intermediate with no stats can land either side of the
    // budget. Acceptable — an over-estimate only costs the salted path's
    // extra shuffle, an under-estimate broadcasts something biggish once,
    // and AQE re-checks the physical join choice from runtime sizes anyway.
    val estSmall = small.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estSmall <= broadcastBudgetBytes) {
      large.join(broadcast(small), Seq(key), joinType)
    } else {
      // deterministic across task retries: the salt is a pure function of row
      // content (never spark_partition_id / monotonically_increasing_id, which
      // change on recomputation and would corrupt the join).
      val l = large.withColumn("__salt",
        pmod(xxhash64((key +: saltCols).map(col): _*), lit(salts)).cast("int"))
      val r = graft.core.Par.widen(small)
        .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
        .hint("shuffle_hash")
      l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
    }
  }

  /** As-of join: attach to each left row the latest right row (by `rTime`)
    * with `rTime <= lTime` for the same `key` — the time-series lookup
    * (trades←quotes, purchases←signups). Implemented as a tagged union +
    * one window per key: ONE shuffle on `key`, linear in total rows, where
    * the naive correlated-subquery shape is a quadratic per-row point
    * lookup. Right rows sort before left rows at equal timestamps, so an
    * exactly-simultaneous right row counts (inclusive semantics).
    *
    * The payload travels as ONE struct column, so the attached values are
    * always a single right row's tuple — a per-column fill could stitch a
    * tuple together from different simultaneous rows when some payload
    * column is NULL. When several right rows share (key, rTime), the
    * largest payload struct (Spark's lexicographic struct order) wins:
    * deterministic across runs and task retries.
    *
    * Output: all left columns plus `<prefix><payloadCol>` for each requested
    * right payload column (NULL when no prior right row exists).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               lTime: String, rTime: String, payloadCols: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    val leftCols = left.columns.toSeq
    val pType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)))
    val taggedL = left
      .select(Seq(col(key), col(lTime).as("__t"), lit(0).as("__tag")) ++
        leftCols.filterNot(_ == key).map(col) :+
        lit(null).cast(pType).as("__p"): _*)
    val taggedR = right
      .select(Seq(col(key), col(rTime).as("__t"), lit(1).as("__tag")) ++
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payloadCols.map(col): _*).as("__p"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__tag").desc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedL.unionByName(taggedR)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 0)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col("__p").getField(c).as(s"$prefix$c")): _*)
  }

  /** Keyed range join: rows of `r` whose `rVal` falls in
    * [l.lVal + loDelta, l.lVal + hiDelta) for the same key — "events in the
    * window before each anchor, per user". The equi key makes this a plain
    * hash join with the range as a residual predicate: partitionable, never
    * a cartesian. For range joins with NO shared key, use
    * [[rangeJoinBinned]]. Alias-qualified internally, so same-lineage
    * frames (two filters of one table) resolve correctly.
    */
  def rangeJoinKeyed(l: DataFrame, r: DataFrame, lKey: String, rKey: String,
                     lVal: String, rVal: String, loDelta: Long, hiDelta: Long,
                     joinType: String = "inner"): DataFrame = {
    val (la, ra) = (l.alias("__rjk_l"), r.alias("__rjk_r"))
    def lc(n: String) = col(s"__rjk_l.`$n`")
    def rc(n: String) = col(s"__rjk_r.`$n`")
    val cond = lc(lKey) === rc(rKey) &&
      rc(rVal) >= lc(lVal) + loDelta && rc(rVal) < lc(lVal) + hiDelta
    la.join(ra, cond, joinType)
  }

  /** Banded (binned) range join: match left rows whose `lVal` column falls
    * in a right-side interval [`lo`, `hi`). A naive range join degenerates to
    * a broadcast-nested-loop / cartesian at scale; binning turns it into an
    * equi-join on a coarse bucket (each interval replicated over the buckets
    * it spans) followed by the exact range filter — the standard interval-
    * join layout for time ranges, IP ranges, and numeric bands.
    * `binWidth` trades replication (wide intervals → many bins) against
    * bucket selectivity; pick it near the median interval width.
    */
  def rangeJoinBinned(l: DataFrame, r: DataFrame, lVal: String,
                      lo: String, hi: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lb = l.withColumn("__bin", floor(col(lVal) / binWidth).cast("long"))
    val rb = r.withColumn("__bin",
      explode(sequence(floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    lb.join(rb, Seq("__bin"))
      .filter(col(lVal) >= col(lo) && col(lVal) < col(hi))
      .drop("__bin")
  }

  /** Distinct count tiering: exact (`count distinct`), and the sketch the
    * reference lacks — HyperLogLog++ `approx_count_distinct`, constant
    * memory per group at any cardinality. `rsd` = relative standard error. */
  def distinctCounts(df: DataFrame, keys: Seq[String], valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      countDistinct(col(valueCol)).as("exact_distinct"),
      approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))
}
