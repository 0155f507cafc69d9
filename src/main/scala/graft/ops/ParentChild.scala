package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parent-child hierarchy support (ref B11: `parentColumn` + `<Closure>`
  * table, foodmart.xml:529-547). Spark has no recursive joins, so the
  * transitive closure is materialized once at registration time by iterative
  * self-join (depth-bounded, log-depth iterations for balanced trees), and
  * every rollup afterwards is a plain join + groupBy:
  *
  *   fact ⋈ closure(descendant = fk) → groupBy(ancestor) → agg
  *
  * At 100 TB the closure is dimension-sized (|nodes| × avg-depth rows), built
  * once and broadcast — the fact table is never traversed recursively.
  */
object ParentChild {

  /** Transitive closure incl. self-pairs: (ancestor, descendant, depth).
    * `edges` must have columns (idCol, parentCol); roots have null parent. */
  def closure(edges: DataFrame, idCol: String, parentCol: String,
      maxDepth: Int = 32): DataFrame = {
    val child2parent = edges.select(col(idCol).as("c"), col(parentCol).as("p"))
      .where(col(parentCol).isNotNull)
    var acc = edges.select(col(idCol).as("ancestor"),
      col(idCol).as("descendant"), lit(0).as("depth"))
    var frontier = child2parent.select(col("p").as("ancestor"),
      col("c").as("descendant"), lit(1).as("depth"))
    var d = 1
    while (d <= maxDepth && !frontier.isEmpty) {
      acc = acc.unionByName(frontier)
      val next = frontier.as("f")
        .join(child2parent.as("cp"), col("f.ancestor") === col("cp.c"))
        .select(col("cp.p").as("ancestor"),
          col("f.descendant").as("descendant"),
          (col("f.depth") + 1).as("depth"))
      frontier = next.localCheckpoint() // truncate the growing lineage
      d += 1
    }
    acc
  }

  /** Transitive rollup: aggregate fact rows into every ancestor of their
    * attachment node. `aggs` are (groupBy-ready) aggregation columns. */
  def rollup(fact: DataFrame, closureDf: DataFrame, factFk: String,
      aggs: Seq[org.apache.spark.sql.Column]): DataFrame =
    fact.join(broadcast(closureDf), fact(factFk) === closureDf("descendant"))
      .groupBy(col("ancestor"))
      .agg(aggs.head, aggs.tail: _*)

  /** The demo org-tree over customers: parent(c) = c / 2 (integer), root = 0
    * (keys are 0-based) — deterministic, so the DuckDB oracle can rebuild it
    * with a recursive CTE. Subtree sales per ancestor customer. */
  def customerOrgRollup(customer: DataFrame, orders: DataFrame): DataFrame = {
    val edges = customer.select(col("c_custkey").as("id"),
      when(col("c_custkey") > 0, expr("c_custkey DIV 2")).as("parent"))
    val cl = closure(edges, "id", "parent")
    rollup(orders, cl, "o_custkey", Seq(
      sum(expr("CAST((o_totalprice) AS DECIMAL(27,6))")).cast("double")
        .as("subtree_sales"),
      count(lit(1)).as("subtree_orders")))
      .withColumnRenamed("ancestor", "customer")
      .orderBy("customer")
  }
}
