package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-structured event payload operators: the `props` column carries JSON;
  * extraction stays in Catalyst (`get_json_object`) — no UDFs, codegen'd,
  * pushdown-friendly. */
object EventOps {

  /** Per-event-type stats over a JSON-extracted numeric field. */
  def jsonFieldStats(events: DataFrame, field: String): DataFrame = {
    val k = get_json_object(col("props"), s"$$.$field").cast("long")
    events.select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        count(col("k")).as("k_cnt"))
      .orderBy("event_type")
  }
}
