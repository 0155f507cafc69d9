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
}
