package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event sessionization (gaps-and-islands): a new session starts after
  * `gapMinutes` of per-user inactivity. One shuffle on user_id; both window
  * passes and the final per-session aggregation reuse that partitioning.
  * (A Structured Streaming variant with flatMapGroupsWithState lives in
  * [[graft.streaming.StreamingSessionize]].)
  */
object Sessionize {

  def sessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    val order = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(order))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sess_idx", sum(col("new_sess")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_idx"))
      .agg(
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"),
        sum(expr("CAST((value) AS DECIMAL(27,6))")).cast("double")
          .as("value_sum"))
      .orderBy("user_id", "sess_idx")
  }

  /** Daily SESSION-QUALITY rollup over [[sessions]] — sessions started per
    * day with mean duration and mean events/session (the engagement
    * dashboard companion to the per-session table). Durations ride as exact
    * integer micros into one fixed-shape double division (the e06
    * convention), so the rollup replays bit-identically in SQL. Adds one
    * day-keyed aggregation over session-sized rows to the sessionize
    * plan — no new corpus-scale work. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessions(events, gapMinutes)
      .withColumn("day", expr("CAST(timestamp_micros(start_us) AS DATE)"))
      .groupBy("day")
      .agg(
        count(lit(1)).as("sessions"),
        sum(col("n_events")).as("events"),
        (sum(col("end_us") - col("start_us")).cast("double") /
          count(lit(1)) / lit(1000000.0)).as("avg_secs"),
        (sum(col("n_events")).cast("double") / count(lit(1)))
          .as("avg_events"))
      .orderBy("day")
}
