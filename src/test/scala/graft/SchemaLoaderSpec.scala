package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.model.GraftException
import graft.planner._
import graft.sources.{SchemaLoader, Sinks}
import graft.result.Json
import SparkTestSession.{spark, sf}

/** Declarative JSON catalog loading (the XML-catalog analog) over mixed
  * source formats, with load-time validation. */
class SchemaLoaderSpec extends AnyFunSuite {

  private def drill(d: String, l: String = null) =
    LevelDrill(LevelRef(d, Option(l)))

  private lazy val csvDir: String = {
    val dir = Files.createTempDirectory("graft-csv").toString + "/region"
    Sinks.csvSingle(SparkTestSession.catalog.table("region"), dir)
    dir
  }

  private def catalogJson(regionSource: String): String =
    s"""{
       |  "name": "mini",
       |  "tables": [
       |    $regionSource,
       |    {"name": "nation", "path": "$sf/nation.parquet"},
       |    {"name": "orders", "path": "$sf/orders.parquet"},
       |    {"name": "customer", "path": "$sf/customer.parquet"},
       |    {"name": "geo", "join": {"left": "nation", "right": "region",
       |      "leftKey": "n_regionkey", "rightKey": "r_regionkey"}},
       |    {"name": "cust_geo", "join": {"left": "customer", "right": "geo",
       |      "leftKey": "c_nationkey", "rightKey": "n_nationkey"}}
       |  ],
       |  "cubes": [{
       |    "name": "orders",
       |    "factTable": "orders",
       |    "dimensions": [
       |      {"name": "Geography", "join": {"table": "cust_geo",
       |        "foreignKey": "o_custkey", "primaryKey": "c_custkey"},
       |       "hierarchies": [{"name": "Geo", "levels": [
       |         {"name": "Region", "key": "r_regionkey", "alias": "region",
       |          "caption": "r_name"},
       |         {"name": "Nation", "key": "n_nationkey", "alias": "nation",
       |          "caption": "n_name"}]}]},
       |      {"name": "OrderDate", "type": "time", "hierarchies": [
       |        {"name": "Monthly", "levels": [
       |          {"name": "Year", "key": "year(o_orderdate)",
       |           "alias": "order_year"},
       |          {"name": "Month", "key": "month(o_orderdate)",
       |           "alias": "order_month"}]}]}
       |    ],
       |    "measures": [
       |      {"name": "Total Sales", "alias": "total_sales",
       |       "aggregator": "sum", "expr": "o_totalprice"},
       |      {"name": "Orders", "alias": "order_count",
       |       "aggregator": "count-all", "expr": "1"}
       |    ],
       |    "calculatedMembers": [
       |      {"alias": "avg_sale", "formula": "total_sales / order_count"}],
       |    "lagMeasures": [
       |      {"alias": "yoy_sales", "base": "total_sales",
       |       "timeDimension": "OrderDate", "periods": 12}],
       |    "cumMeasures": [
       |      {"alias": "ytd_sales", "base": "total_sales",
       |       "timeDimension": "OrderDate", "resetLevel": "Year"}],
       |    "totalMeasures": [
       |      {"alias": "sales_geo_total", "base": "total_sales",
       |       "dimension": "Geography"}]
       |  }]
       |}""".stripMargin

  private val parquetRegion = s"""{"name": "region", "path": "$sf/region.parquet"}"""

  test("JSON catalog over parquet answers queries identically to the code catalog") {
    val cat = SchemaLoader.load(spark, catalogJson(parquetRegion))
    val got = Planner.plan(cat, CubeQuery("orders",
      Seq(drill("Geography", "Region")),
      Seq("total_sales", "order_count", "avg_sale"))).collect()
    val want = Planner.plan(SparkTestSession.catalog, CubeQuery("orders",
      Seq(drill("Geography", "Region")),
      Seq("total_sales", "order_count"))).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getInt(0) == w.getInt(0))
      assert(g.getDouble(2) == w.getDouble(2)) // identical decimal-exact sums
      assert(g.getDouble(4) == g.getDouble(2) / g.getLong(3))
    }
  }

  test("declared lag periods and cum measures load and plan (B8 ext)") {
    val cat = SchemaLoader.load(spark, catalogJson(parquetRegion))
    val rows = Planner.plan(cat, CubeQuery("orders",
      Seq(drill("OrderDate", "Year"), drill("OrderDate", "Month")),
      Seq("total_sales", "ytd_sales", "yoy_sales"))).collect()
    assert(rows.nonEmpty)
    var year = -1; var acc = BigDecimal(0)
    rows.zipWithIndex.foreach { case (r, i) =>
      if (r.getInt(0) != year) { year = r.getInt(0); acc = BigDecimal(0) }
      acc += BigDecimal(r.getDouble(2))
      assert(math.abs(r.getDouble(3) - acc.toDouble) < 1e-6,
        s"declared ytd at $year-${r.getInt(1)}")
      if (i >= 12)
        assert(r.getDouble(4) == rows(i - 12).getDouble(2),
          s"declared yoy periods=12 at row $i")
      else assert(r.isNullAt(4))
    }
  }

  test("declared total measures load and plan (share-of-total ext)") {
    val cat = SchemaLoader.load(spark, catalogJson(parquetRegion))
    val rows = Planner.plan(cat, CubeQuery("orders",
      Seq(drill("Geography", "Region"), drill("OrderDate", "Year")),
      Seq("total_sales", "sales_geo_total"))).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getInt(2)).values.foreach { byYear =>
      val tot = byYear.map(r => BigDecimal(r.getDouble(3))).sum.toDouble
      byYear.foreach(r => assert(math.abs(r.getDouble(4) - tot) < 1e-6))
    }
  }

  test("CSV source joins into the same star (B1 multi-format sources)") {
    val csvRegion =
      s"""{"name": "region", "format": "csv", "path": "$csvDir",
         |"options": {"header": "true", "inferSchema": "true"}}""".stripMargin
    val cat = SchemaLoader.load(spark, catalogJson(csvRegion))
    val rows = Planner.plan(cat, CubeQuery("orders",
      Seq(drill("Geography", "Region")), Seq("order_count"))).collect()
    assert(rows.map(_.getLong(2)).sum ==
      SparkTestSession.catalog.table("orders").count())
  }

  test("ORC and JSON sources join into the same star (B1)") {
    val region = SparkTestSession.catalog.table("region")
    val orcDir = Files.createTempDirectory("graft-orc").toString + "/region"
    region.write.mode("overwrite").orc(orcDir)
    val jsonDir = Files.createTempDirectory("graft-json").toString + "/region"
    region.write.mode("overwrite").json(jsonDir)
    Seq(
      s"""{"name": "region", "format": "orc", "path": "$orcDir"}""",
      s"""{"name": "region", "format": "json", "path": "$jsonDir",
         |"options": {"inferSchema": "true"}}""".stripMargin).foreach { src =>
      val cat = SchemaLoader.load(spark, catalogJson(src))
      val rows = Planner.plan(cat, CubeQuery("orders",
        Seq(drill("Geography", "Region")), Seq("order_count"))).collect()
      assert(rows.map(_.getLong(2)).sum ==
        SparkTestSession.catalog.table("orders").count(), src)
    }
  }

  test("load-time validation rejects bad expressions and missing keys (400)") {
    val badMeasure = catalogJson(parquetRegion)
      .replace("\"expr\": \"o_totalprice\"", "\"expr\": \"no_such_column\"")
    assert(intercept[GraftException](
      SchemaLoader.load(spark, badMeasure)).status == 400)
    val badFk = catalogJson(parquetRegion)
      .replace("\"foreignKey\": \"o_custkey\"", "\"foreignKey\": \"nope\"")
    assert(intercept[GraftException](
      SchemaLoader.load(spark, badFk)).status == 400)
  }

  private def withRoles(json: String, roles: String): String =
    json.trim.stripSuffix("}") + s""", "roles": $roles }"""

  test("roles load from JSON, enforce, and validate at load time (B18)") {
    val good = withRoles(catalogJson(parquetRegion),
      """[{"name": "emea", "cubeGrants": [{"cube": "orders",
        |  "hierarchyGrants": [{"dimension": "Geography",
        |    "rollupPolicy": "partial",
        |    "memberGrants": [{"level": "Region", "keys": [0, 3]}]}]}]}]"""
        .stripMargin)
    val cat = SchemaLoader.load(spark, good)
    val restricted = Planner.plan(cat, CubeQuery("orders", Nil,
      Seq("total_sales"), role = Some("emea"))).collect()(0).getDouble(0)
    val open = Planner.plan(cat, CubeQuery("orders", Nil,
      Seq("total_sales"))).collect()(0).getDouble(0)
    assert(restricted < open)
    // a typo'd grant would be a silent security hole → load-time 400
    val badDim = good.replace("\"dimension\": \"Geography\"",
      "\"dimension\": \"Geografy\"")
    assert(intercept[GraftException](
      SchemaLoader.load(spark, badDim)).status == 400)
    val badLevel = good.replace("\"level\": \"Region\"",
      "\"level\": \"Regio\"")
    assert(intercept[GraftException](
      SchemaLoader.load(spark, badLevel)).status == 400)
    val badPolicy = good.replace("\"rollupPolicy\": \"partial\"",
      "\"rollupPolicy\": \"some\"")
    assert(intercept[GraftException](
      SchemaLoader.load(spark, badPolicy)).status == 400)
    val badCube = good.replace("\"cube\": \"orders\"",
      "\"cube\": \"ordres\"")
    assert(intercept[GraftException](
      SchemaLoader.load(spark, badCube)).status == 400)
  }

  test("Json.parse round-trips the writer") {
    val doc = scala.collection.immutable.ListMap(
      "a" -> Seq(1L, 2.5, "x\n", null, true),
      "b" -> scala.collection.immutable.ListMap("c" -> "d"))
    assert(Json.parse(Json.write(doc)) == doc)
  }
}
