package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.GraftException

/** Structured Streaming counterparts of the batch operators, for continuously
  * arriving event data (north-star extension; the reference is batch-only —
  * SURVEY §2.E). Two shapes:
  *
  *  - windowed rollup: watermark + tumbling window + the same measure set as
  *    the `events` cube, emitting append-mode finalized windows;
  *  - stateful sessionization: flatMapGroupsWithState with event-time
  *    timeout, emitting a session row when the inactivity gap closes — the
  *    streaming twin of [[graft.ops.Sessionize]].
  *
  * At scale both partition by key (window/user) and keep state per key in the
  * state store; no driver-side accumulation.
  */
object Streaming {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, value_sum: Double)
  // not private: Catalyst codegen instantiates the state encoder reflectively
  final case class SessionState(start_us: Long, end_us: Long,
      n_events: Long, value_sum: Double)

  /** Tumbling-window rollup with a watermark for late data. */
  def windowedRollup(events: DataFrame, windowLen: String, watermark: String)
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("event_count"),
        sum(expr("CAST((value) AS DECIMAL(27,6))")).cast("double")
          .as("value_sum"),
        approx_count_distinct("user_id").as("approx_users"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("event_count"), col("value_sum"), col("approx_users"))

  /** Stateful sessionization: sessions close after `gapMinutes` of
    * per-user event-time inactivity (or watermark timeout). */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapMinutes: Int)
      : Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    // exact µs (getTime is ms-truncated; getNanos carries the fraction)
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator.single(
          SessionOut(userId, s.start_us, s.end_us, s.n_events, s.value_sum))
      }
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var closed = Vector.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val us = micros(e.ts)
        cur match {
          case Some(s) if us - s.end_us <= gapUs =>
            cur = Some(SessionState(s.start_us, us, s.n_events + 1,
              s.value_sum + e.value))
          case Some(s) =>
            closed :+= SessionOut(userId, s.start_us, s.end_us, s.n_events,
              s.value_sum)
            cur = Some(SessionState(us, us, 1L, e.value))
          case None =>
            cur = Some(SessionState(us, us, 1L, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.end_us / 1000L + gapMinutes * 60L * 1000L)
      }
      closed.iterator
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming EXACT DEDUP — the continuous twin of the batch keep-first
    * pipeline ([[graft.ops.TextOps.dedupKeepFirst]]): drop every document
    * whose content digest has already been admitted. Same md5 content key
    * as the batch op, so a corpus ingested incrementally admits exactly
    * the first arrival per digest.
    *
    * State = one (digest) row per DISTINCT document in the state store,
    * hash-partitioned — at 100 TB that is the deduped-corpus cardinality
    * spread across executors, the minimum any exact streaming dedup can
    * hold. When the source carries an event-time column, pass it with a
    * watermark delay and dedup state is EVICTED once the watermark passes
    * (duplicates only matter within the horizon) — the bounded-state form
    * an always-on ingest pipeline runs. */
  def dedupDocsStream(docs: DataFrame, tsCol: Option[String] = None,
      watermark: String = "1 hour"): DataFrame = {
    val keyed = docs.withColumn("digest", md5(col("text")))
    tsCol match {
      case Some(ts) => keyed.withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark("digest")
      case None => keyed.dropDuplicates("digest")
    }
  }

  /** Drive a streaming query over a bounded source synchronously (memory
    * sink) — the local-smoke harness from the Spark guide. Returns the sink
    * table name. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): String = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    name
  }

  /** File-based streaming read of an events directory with the events
    * schema (parquet source → the transforms above). */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val batch = spark.read.parquet(dir)
    if (batch.schema.fieldNames.isEmpty)
      GraftException.badRequest(s"no events at $dir")
    spark.readStream.schema(batch.schema).parquet(dir)
  }
}
