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
  * once and broadcast (or shuffle-joined when the tree itself is huge) — the
  * fact table is never traversed recursively.
  */
object ParentChild {

  /** Transitive closure incl. self-pairs: (ancestor, descendant, depth).
    * `edges` must have columns (idCol, parentCol); roots have null parent.
    *
    * Computed by DEDUP-FREE PATH DOUBLING: a pair of depth e ∈ (d, 2d]
    * decomposes UNIQUELY as (descendant → up exactly d steps) ∘ (≤d more
    * steps), so joining the depth-exactly-d frontier against the full ≤d
    * relation generates each new pair exactly once — ⌈log₂ depth⌉ join
    * shuffles (a depth-60 chain closes in 6 rounds) and, unlike the naive
    * rel∪(rel⋈rel) form, NO distinct() shuffle per round. */
  def closure(edges: DataFrame, idCol: String, parentCol: String,
      maxDepth: Int = 64): DataFrame = {
    val self = edges.select(col(idCol).as("ancestor"),
      col(idCol).as("descendant"), lit(0).as("depth"))
    var full = edges.where(col(parentCol).isNotNull)
      .select(col(parentCol).as("ancestor"), col(idCol).as("descendant"),
        lit(1).as("depth"))
      .localCheckpoint()
    var frontier = full // pairs at exactly depth d
    var d = 1L
    var growing = frontier.count() > 0
    while (growing && d < maxDepth) {
      // frontier(d) ⋈ full(≤d) → all pairs of depth d+1 .. 2d, each once.
      // The RDD round-trip mints fresh attribute ids: frontier/full/next
      // otherwise share lineage, which trips Union constraint rewriting
      // (it's free — the checkpoint already materialized the rows).
      val cp = frontier.as("x").join(full.as("y"),
          col("x.ancestor") === col("y.descendant"))
        .select(col("y.ancestor").as("ancestor"),
          col("x.descendant").as("descendant"),
          (col("x.depth") + col("y.depth")).as("depth"))
        .localCheckpoint()
      val next = cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
      if (cp.isEmpty) growing = false
      else {
        full = full.unionByName(next) // disjoint depth ranges — no dedup
        frontier = next.where(col("depth") === d * 2)
        d *= 2
      }
    }
    self.unionByName(full)
  }

  /** Transitive rollup: aggregate fact rows into every ancestor of their
    * attachment node. `aggs` are (groupBy-ready) aggregation columns.
    *
    * `broadcastClosure` mirrors `JoinSpec.broadcastable`: the closure is
    * |nodes| × avg-depth rows, so a typical dimension broadcasts, but a
    * 100M-member tree at depth ~20 is billions of rows — pass false there
    * and the join shuffles on the attachment key instead (same semantics,
    * co-partitioned fact ⋈ closure). */
  def rollup(fact: DataFrame, closureDf: DataFrame, factFk: String,
      aggs: Seq[org.apache.spark.sql.Column],
      broadcastClosure: Boolean = true): DataFrame =
    fact.join(if (broadcastClosure) broadcast(closureDf) else closureDf,
        fact(factFk) === closureDf("descendant"))
      .groupBy(col("ancestor"))
      .agg(aggs.head, aggs.tail: _*)

  /** Closure of the demo org-tree over customers: parent(c) = c / 2
    * (integer), root = 0 (keys are 0-based) — deterministic, so the DuckDB
    * oracle can rebuild it with a recursive CTE. Materialized
    * (localCheckpoint) because this is the registration-time artifact the
    * reference's `<Closure>` table corresponds to (foodmart.xml:529-547) —
    * cache it via [[IndexCache]] and every rollup afterwards is a plain
    * join + groupBy. */
  def customerClosure(customer: DataFrame): DataFrame = {
    val edges = customer.select(col("c_custkey").as("id"),
      when(col("c_custkey") > 0, expr("c_custkey DIV 2")).as("parent"))
    closure(edges, "id", "parent").localCheckpoint()
  }

  /** Subtree sales per ancestor customer over the demo org-tree.
    * `closureDf` lets the caller pass the cached registration-time closure;
    * absent, it is built inline. */
  def customerOrgRollup(customer: DataFrame, orders: DataFrame,
      closureDf: Option[DataFrame] = None): DataFrame = {
    val cl = closureDf.getOrElse(customerClosure(customer))
    rollup(orders, cl, "o_custkey", Seq(
      sum(expr("CAST((o_totalprice) AS DECIMAL(27,6))")).cast("double")
        .as("subtree_sales"),
      count(lit(1)).as("subtree_orders")))
      .withColumnRenamed("ancestor", "customer")
      .orderBy("customer")
  }
}
