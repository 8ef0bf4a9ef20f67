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

  /** Gap-based sessionization with typed state. A session closes when no
    * event arrives within `gapMs` of the previous one (or, in streaming, on
    * event-time timeout past the watermark). Emits closed sessions only.
    *
    * State per user is O(1) — start/end/count/sum — so the operator scales
    * with the number of *live* keys, not events.
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeout =
      if (events.isStreaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", "10 minutes") else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](OutputMode.Append, timeout) {
        (userId, rows, state: GroupState[SessionState]) =>
          var out = List.empty[Session]
          var st = state.getOption
          if (state.hasTimedOut) {
            st.foreach(s => out ::= emit(userId, s))
            state.remove()
            out.iterator
          } else {
            // batch path: rows arrive unordered — sort within the group
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
              if (streaming) {
                state.update(s)
                state.setTimeoutTimestamp(s.end + gapMs)
              } else {
                // batch: group is complete — close the trailing session
                out ::= emit(userId, s)
                state.remove()
              }
            }
            out.reverseIterator
          }
      }
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
    * the entry point for incremental pipelines over landing directories. */
  def readStream(spark: SparkSession, path: String,
                 schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Parquet file sink with checkpointing — the durable end of an
    * incremental pipeline. Exactly-once per file-sink semantics come from
    * the checkpoint + write-ahead manifest. */
  def writeStreamParquet(df: DataFrame, path: String, checkpoint: String,
                         triggerMs: Long = 5000): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerMs))
      .start()
}
