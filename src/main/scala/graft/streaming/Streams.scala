package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming layer (beyond the reference surface — agnes has no
  * streaming at all, SURVEY.md §2.9). The same transforms used in batch
  * queries run incrementally here: `readStream` → transforms → `writeStream`,
  * watermarks bound state, and custom session state lives in
  * `flatMapGroupsWithState` — Spark's replacement for hand-rolled stream
  * operators.
  */
object Streams {

  /** A typed event row (mirrors the driver's `events` table, µs precision). */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** An emitted closed session. */
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  case class SessionState(start: Long, end: Long, n: Long, total: Double)

  /** Tumbling/sliding event-time windowed aggregation with a watermark.
    * Works identically on a batch DataFrame (for oracle parity) and a
    * streaming one.
    */
  def windowedAgg(events: DataFrame, tsCol: String, keyCol: String,
                  windowDur: String, slide: Option[String] = None,
                  watermark: String = "10 minutes",
                  aggs: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    val win = slide.map(s => window(col(tsCol), windowDur, s))
      .getOrElse(window(col(tsCol), windowDur))
    val aggCols = if (aggs.nonEmpty) aggs
      else Seq(count(lit(1)).as("n"), sum(col("value")).as("total"))
    src.groupBy(win, col(keyCol))
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** Gap-based sessionization. A session closes when no event arrives
    * within `gapMs` of the previous one (or, in streaming, on event-time
    * timeout past the watermark). Emits closed sessions only.
    *
    * Two execution shapes, one semantics:
    *  - **streaming**: typed state in `flatMapGroupsWithState` — O(1) state
    *    per live key (start/end/count/sum), closed by watermark timeout.
    *  - **batch**: the gaps-and-islands window form — `WindowExec` sorts
    *    (user, ts) within hash(user) partitions (a spillable secondary
    *    sort), so per-key memory is O(1) here too; a per-group in-memory
    *    sort would buffer a pathological hot user's whole history.
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    if (!events.isStreaming) return sessionizeBatch(events, gapMs)
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, rows, state: GroupState[SessionState]) =>
          var out = List.empty[Session]
          var st = state.getOption
          if (state.hasTimedOut) {
            st.foreach(s => out ::= emit(userId, s))
            state.remove()
            out.iterator
          } else {
            // a micro-batch's rows arrive unordered — sort within the batch
            // (bounded by the trigger interval, not the key's full history)
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            for (e <- sorted) {
              val t = e.ts.getTime
              st match {
                case Some(s) if t - s.end <= gapMs =>
                  st = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
                case Some(s) =>
                  out ::= emit(userId, s)
                  st = Some(SessionState(t, t, 1, e.value))
                case None =>
                  st = Some(SessionState(t, t, 1, e.value))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            out.reverseIterator
          }
      }
  }

  /** Batch gaps-and-islands sessionize: break flag via `lag`, running sum of
    * breaks numbers the sessions, one aggregation closes them. Identical
    * output to the streaming operator on the same (complete) input. Gap math
    * is at ms precision, matching the streaming path's `Timestamp.getTime`. */
  private def sessionizeBatch(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("__ms"))
    val brk = when(col("__ms") - lag(col("__ms"), 1).over(w) > gapMs, lit(1L))
      .otherwise(lit(0L))
    events.toDF()
      .withColumn("__ms", unix_millis(col("ts")))
      .withColumn("__grp",
        sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__grp"))
      .agg(
        timestamp_millis(min(col("__ms"))).as("session_start"),
        timestamp_millis(max(col("__ms"))).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))
      .as[Session]
  }

  private def emit(userId: Long, s: SessionState): Session =
    Session(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
      s.n, s.total)

  /** Streaming exact deduplication with bounded state: drops rows whose
    * `keys` were already seen, holding state only within the watermark
    * horizon (`dropDuplicatesWithinWatermark`) so state size tracks the
    * duplicate-arrival window, not the whole stream — the only dedup shape
    * that survives an unbounded stream. Batch input degrades to plain
    * `dropDuplicates` (the exact-dedup twin, Dedup.exact's key semantics). */
  def dedupStream(df: DataFrame, keys: Seq[String], tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    if (df.isStreaming) df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keys)
    else df.dropDuplicates(keys)

  /** File-source streaming reader with the same schema as a batch table —
    * the entry point for incremental pipelines over landing directories.
    * `glob` filters which files in the directory belong to the stream. */
  def readStream(spark: SparkSession, path: String,
                 schema: org.apache.spark.sql.types.StructType,
                 glob: Option[String] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    glob.map(g => r.option("pathGlobFilter", g)).getOrElse(r).parquet(path)
  }

  /** Parquet file sink with checkpointing — the durable end of an
    * incremental pipeline. Exactly-once per file-sink semantics come from
    * the checkpoint + write-ahead manifest. `availableNow = true` drains
    * everything currently in the source and stops (the batch-like catch-up
    * run); otherwise the query polls every `triggerMs`. */
  def writeStreamParquet(df: DataFrame, path: String, checkpoint: String,
                         triggerMs: Long = 5000,
                         availableNow: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery = {
    val trigger =
      if (availableNow) org.apache.spark.sql.streaming.Trigger.AvailableNow()
      else org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerMs)
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }
}
