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
    * `edges` must have columns (idCol, parentCol); roots have null parent.
    *
    * Computed by PATH DOUBLING: each round joins the ≤d-step relation with
    * itself, covering ≤2d steps — ⌈log₂ depth⌉ shuffles instead of one per
    * tree level (a depth-60 chain closes in 6 rounds). In a forest every
    * (ancestor, descendant) pair has exactly one path, so distinct() is
    * exact dedup, not an approximation. */
  def closure(edges: DataFrame, idCol: String, parentCol: String,
      maxDepth: Int = 64): DataFrame = {
    val self = edges.select(col(idCol).as("ancestor"),
      col(idCol).as("descendant"), lit(0).as("depth"))
    var rel = edges.where(col(parentCol).isNotNull)
      .select(col(parentCol).as("ancestor"), col(idCol).as("descendant"),
        lit(1).as("depth"))
      .localCheckpoint()
    var covered = 1L
    var count = rel.count()
    var growing = true
    while (growing && covered < maxDepth) {
      val next = rel.as("x").join(rel.as("y"),
          col("x.ancestor") === col("y.descendant"))
        .select(col("y.ancestor").as("ancestor"),
          col("x.descendant").as("descendant"),
          (col("x.depth") + col("y.depth")).as("depth"))
      val doubled = rel.unionByName(next).distinct().localCheckpoint()
      val newCount = doubled.count()
      growing = newCount > count
      rel = doubled
      count = newCount
      covered *= 2
    }
    self.unionByName(rel)
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
