package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model._
import graft.ops.ParentChild
import graft.planner.LevelRef
import graft.result.Metadata
import SparkTestSession.{catalog => cat, spark}

/** Parent-child closure (B11) + ragged hierarchies (B12). The ragged test
  * builds its own tiny catalog — the engine is schema-driven, not bound to
  * the TPC-H star. */
class HierarchySpec extends AnyFunSuite {

  test("closure contains self, parent and transitive pairs (B11)") {
    import spark.implicits._
    // chain 1 ← 2 ← 4, and 1 ← 3
    val edges = Seq((1L, None: Option[Long]), (2L, Some(1L)), (3L, Some(1L)),
      (4L, Some(2L))).toDF("id", "parent")
    val cl = ParentChild.closure(edges, "id", "parent")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(cl == Set((1L, 1L, 0), (2L, 2L, 0), (3L, 3L, 0), (4L, 4L, 0),
      (1L, 2L, 1), (1L, 3L, 1), (2L, 4L, 1), (1L, 4L, 2)))
  }

  test("transitive rollup: root subtree equals the grand total (B11)") {
    val orders = cat.table("orders")
    val rolled = ParentChild.customerOrgRollup(cat.table("customer"), orders)
      .collect()
    val root = rolled.find(_.getLong(0) == 0L).get
    assert(root.getLong(2) == orders.count()) // every order reaches the root
    // each node's subtree >= its own direct sales
    val direct = orders.groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rolled.foreach { r =>
      assert(r.getLong(2) >= direct.getOrElse(r.getLong(0), 0L))
    }
  }

  test("non-broadcast closure rollup matches broadcast path, plan shuffles") {
    val customer = cat.table("customer")
    val orders = cat.table("orders")
    val closure = ParentChild.closure(
      customer.select(col("c_custkey").as("id"),
        when(col("c_custkey") === 0L, lit(null))
          .otherwise(col("c_custkey") / 2).cast("long").as("parent")),
      "id", "parent")
    val aggs = Seq(count(lit(1)).as("n_orders"))
    // forced-large simulation: with auto-broadcast off, only the explicit
    // hint may broadcast — exactly the 100M-member-tree scenario where the
    // closure exceeds any broadcast threshold
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val viaBroadcast = ParentChild.rollup(orders, closure, "o_custkey", aggs)
        .collect().map(_.toSeq).toSet
      val viaShuffle = ParentChild.rollup(orders, closure, "o_custkey", aggs,
        broadcastClosure = false)
      assert(viaShuffle.collect().map(_.toSeq).toSet == viaBroadcast)
      val shufflePlan = viaShuffle.queryExecution.executedPlan.toString()
      assert(!shufflePlan.contains("BroadcastHashJoin"), shufflePlan)
      // and the hinted path still broadcasts (JoinSpec.broadcastable analog)
      val hintedPlan = ParentChild.rollup(orders, closure, "o_custkey", aggs)
        .queryExecution.executedPlan.toString()
      assert(hintedPlan.contains("BroadcastHashJoin"), hintedPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("ragged hierarchy hides IfBlankName / IfParentsName members (B12)") {
    import spark.implicits._
    val places = Seq(
      ("IL", "Israel", "Israel", "Tel Aviv"),   // city == country's name link
      ("IL", "Israel", "Israel", "Haifa"),
      ("US", "USA", "WA", "Seattle"),
      ("US", "USA", "", "DC"),                  // blank state (ragged)
      ("VA", "Vatican", "Vatican", "Vatican"))  // city == parent name
      .toDF("country_code", "country", "state", "city")
    val dim = DimensionDef("Geo", Seq(HierarchyDef("Geo", Seq(
      LevelDef("Country", "country_code", "country_code",
        nameExpr = Some("country")),
      LevelDef("State", "state", "state", hideIf = Some("IfBlankName")),
      LevelDef("City", "city", "city", hideIf = Some("IfParentsName"))))))
    val cube = CubeDef("places", "places", Seq(dim),
      Seq(MeasureDef("Count", "n", Agg.CountAll, "1")))
    val custom = new CubeCatalog(spark, SchemaDef("t", Seq(cube)),
      Map("places" -> places))
    val states = Metadata.levelMembers(custom, cube,
      LevelRef("Geo", Some("State"))).map(_("key"))
    assert(!states.contains("")) // blank state hidden
    assert(states.toSet == Set("Israel", "WA", "Vatican"))
    val cities = Metadata.levelMembers(custom, cube,
      LevelRef("Geo", Some("City"))).map(_("key"))
    assert(!cities.contains("Vatican")) // same-as-parent hidden
    assert(cities.toSet == Set("Tel Aviv", "Haifa", "Seattle", "DC"))
    // aggregation is NOT affected by hiding (reference semantics)
    val agg = planner.Planner.plan(custom, planner.CubeQuery("places",
      Seq(planner.LevelDrill(LevelRef("Geo", Some("City")))), Seq("n")))
      .collect()
    assert(agg.map(_.getString(0)).toSet ==
      Set("Tel Aviv", "Haifa", "Seattle", "DC", "Vatican"))
  }
}
