package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semi-structured event payload operators: the `props` column carries JSON;
  * extraction stays in Catalyst (`get_json_object`) — no UDFs, codegen'd,
  * pushdown-friendly. */
object EventOps {

  /** AS-OF JOIN — attach to each event the most recent state row at or
    * before the event's time (ties on the state timestamp broken by the
    * highest `stateOrd`, e.g. the largest order key). Spark has no native
    * as-of join; the naive inequality join is a range join that blows up
    * O(|events|·|states per key|). This is the SCALE form: union both
    * streams, ONE shuffle+sort per key, and carry the latest state forward
    * with last(_, ignoreNulls) over an unbounded-preceding frame — cost is
    * a single sort of (events + states), independent of how many states
    * precede each event.
    *
    * Inputs: events(user_id, event_id, t) and states(user_id, t, ord, value)
    * with `t` of one comparable type (here DATE). Output: one row per event
    * with the as-of `ord`/`value` (null when no state precedes). */
  def asofJoin(events: DataFrame, states: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("t"),
      lit(0).as("is_state"), lit(null).cast("long").as("ord"),
      col("event_id"), lit(null).cast("double").as("value"))
    val st = states.select(col("user_id"), col("t"),
      lit(1).as("is_state"), col("ord"),
      lit(null).cast("long").as("event_id"), col("value"))
    // same (user, t): states first (is_state desc), multiple states by ord
    // asc so the carried-forward last() is the max-ord state
    val w = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("is_state").desc, col("ord").asc_nulls_last,
        col("event_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(st)
      .withColumn("asof_ord",
        last(when(col("is_state") === 1, col("ord")), ignoreNulls = true)
          .over(w))
      .withColumn("asof_value",
        last(when(col("is_state") === 1, col("value")), ignoreNulls = true)
          .over(w))
      .where(col("is_state") === 0)
      .select(col("event_id"), col("user_id"), col("t"),
        col("asof_ord"), col("asof_value"))
      .orderBy("event_id")
  }

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
