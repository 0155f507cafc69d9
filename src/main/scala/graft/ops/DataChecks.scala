package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ-style validation gate an ingest
  * pipeline runs before publishing a snapshot): each check is one
  * violation-counting frame, unioned into a single (check_name, n_violations)
  * report. A clean warehouse reports all zeros; the SPEC plants violations
  * and asserts each check catches exactly them.
  *
  * Scale shape: every check is a single scan, aggregate, or join in the
  * shape Catalyst already optimizes — the FK orphan checks are LEFT ANTI
  * hash joins (shuffled on the key when both sides are large; never a
  * nested loop), duplicate-key detection is one map-side-combined count per
  * key, and range/null checks are map-only filters. The final union of
  * 1-row frames is free. Nothing collects; nothing is quadratic.
  */
object DataChecks {

  /** One (check, n_violations) row: COUNT of the violating rows. */
  private def check(name: String, violations: DataFrame): DataFrame =
    violations.agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Referential-integrity, key-uniqueness, and domain checks over the
    * order-to-lineitem star. Returns one row per check, ordered by check_name. */
  def dqAudit(orders: DataFrame, lineitem: DataFrame,
      customer: DataFrame): DataFrame = {
    val orphanLine = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
    val orphanOrder = orders.select(col("o_custkey"))
      .join(customer.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
    val dupOrderKey = orders.groupBy("o_orderkey")
      .agg(count(lit(1)).as("c")).where(col("c") > 1)
    val dupLineNo = lineitem.groupBy("l_orderkey", "l_linenumber")
      .agg(count(lit(1)).as("c")).where(col("c") > 1)
    val badQty = lineitem.where(col("l_quantity") <= 0)
    val badDiscount = lineitem.where(
      col("l_discount") < 0 || col("l_discount") > 1)
    val shipBeforeOrder = lineitem
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") < col("o_orderdate"))
    val nullKeys = orders.where(
      col("o_orderkey").isNull || col("o_custkey").isNull)
    Seq(
      check("duplicate_line_number", dupLineNo),
      check("duplicate_order_key", dupOrderKey),
      check("lineitem_discount_range", badDiscount),
      check("lineitem_nonpositive_qty", badQty),
      check("lineitem_orphan_order", orphanLine),
      check("order_null_keys", nullKeys),
      check("order_orphan_customer", orphanOrder),
      check("ship_before_order_date", shipBeforeOrder))
      .reduce(_ unionByName _)
      .orderBy("check_name")
  }
}
