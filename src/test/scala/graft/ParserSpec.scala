package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.GraftException
import graft.planner._
import graft.TpchCatalog.salesCube

/** Cut/drilldown grammar tests (analog of query_builder_spec parse_cut,
  * spec/query_builder_spec.rb:124-151). */
class ParserSpec extends AnyFunSuite {

  test("segments honor bracket quoting") {
    assert(QueryParser.segments("[Time].[Monthly].[Year]") ==
      Seq("Time", "Monthly", "Year"))
    assert(QueryParser.segments("Geography.Region") == Seq("Geography", "Region"))
    assert(QueryParser.segments("[Store Type].[Type]") ==
      Seq("Store Type", "Type"))
    assert(QueryParser.segments("[A.B].[C]") == Seq("A.B", "C"))
  }

  test("typed keys: long, double, string") {
    assert(QueryParser.typedKey("42") == 42L)
    assert(QueryParser.typedKey("4.5") == 4.5)
    assert(QueryParser.typedKey("Brand#1") == "Brand#1")
  }

  test("drilldown forms (A2) incl. named set (A15)") {
    assert(QueryParser.parseDrilldown(salesCube, "Geography") ==
      LevelDrill(LevelRef("Geography")))
    assert(QueryParser.parseDrilldown(salesCube, "Geography.Nation") ==
      LevelDrill(LevelRef("Geography", Some("Nation"))))
    assert(QueryParser.parseDrilldown(salesCube, "Part.Brands.Brand") ==
      LevelDrill(LevelRef("Part", Some("Brand"), Some("Brands"))))
    assert(QueryParser.parseDrilldown(salesCube, "[Top Brands]") ==
      NamedSetDrill("Top Brands"))
    assert(intercept[GraftException](
      QueryParser.parseDrilldown(salesCube, "A.B.C.D")).status == 400)
    assert(intercept[GraftException](
      QueryParser.parseDrilldown(salesCube, "[Geography].&[2]")).status == 400)
  }

  test("member / set / range / named-set cuts (A4-A7)") {
    assert(QueryParser.parseCut(salesCube, "[Geography].[Region].[2]") ==
      MemberCut(LevelRef("Geography", Some("Region")), 2L))
    assert(QueryParser.parseCut(salesCube,
      "{[ReturnFlag].[ReturnFlag].[A], [ReturnFlag].[ReturnFlag].[R]}") ==
      SetCut(LevelRef("ReturnFlag", Some("ReturnFlag")), Seq("A", "R")))
    assert(QueryParser.parseCut(salesCube,
      "([ShipDate].[Monthly].[Year].[1996] : [ShipDate].[Monthly].[Year].[1998])") ==
      RangeCut(LevelRef("ShipDate", Some("Year"), Some("Monthly")), 1996L, 1998L))
    assert(QueryParser.parseCut(salesCube, "[Top Brands]") ==
      NamedSetCut("Top Brands"))
  }

  test("cut error contract: mixed-level sets, bad ranges, empties") {
    assert(intercept[GraftException](QueryParser.parseCut(salesCube,
      "{[ReturnFlag].[ReturnFlag].[A], [LineStatus].[LineStatus].[O]}"))
      .status == 400)
    assert(intercept[GraftException](QueryParser.parseCut(salesCube,
      "([Geography].[Region].[1] : [Geography].[Nation].[5])")).status == 400)
    assert(intercept[GraftException](
      QueryParser.parseCut(salesCube, "")).status == 400)
    assert(intercept[GraftException](
      QueryParser.parseCut(salesCube, "{}")).status == 400)
    assert(intercept[GraftException](
      QueryParser.parseCut(salesCube, "[Unterminated")).status == 400)
  }

  test("measure filters (A10)") {
    assert(QueryParser.parseFilter(salesCube, "revenue > 1000") ==
      MeasureFilter("revenue", ">", 1000.0))
    assert(QueryParser.parseFilter(salesCube, "[Measures].[sum_qty] <= 4.5") ==
      MeasureFilter("sum_qty", "<=", 4.5))
    assert(intercept[GraftException](
      QueryParser.parseFilter(salesCube, "revenue >")).status == 400)
  }

  test("order spec (A11)") {
    assert(QueryParser.parseOrder(salesCube, "revenue", Some("desc")) ==
      OrderSpec(OrderByMeasure("revenue"), desc = true))
    assert(QueryParser.parseOrder(salesCube, "Geography.Nation.caption", None) ==
      OrderSpec(OrderByLevel(LevelRef("Geography", Some("Nation")), "caption")))
    assert(QueryParser.parseOrder(salesCube, "net", Some("BDESC")) ==
      OrderSpec(OrderByMeasure("net"), desc = true))
  }

  test("fromParams assembles a full CubeQuery") {
    val q = QueryParser.fromParams(salesCube, Map(
      "drilldown[]" -> Seq("Geography.Region", "[Top Brands]"),
      "measures[]" -> Seq("revenue", "cnt"),
      "cut[]" -> Seq("[ShipDate].[Monthly].[Year].[1997]"),
      "filter[]" -> Seq("revenue > 5"),
      "order" -> Seq("revenue"), "order_desc" -> Seq("desc"),
      "offset" -> Seq("10"), "limit" -> Seq("5"),
      "nonempty" -> Seq("true"), "parents" -> Seq("true")))
    assert(q.drilldowns == Seq(LevelDrill(LevelRef("Geography", Some("Region"))),
      NamedSetDrill("Top Brands")))
    assert(q.cuts == Seq(MemberCut(
      LevelRef("ShipDate", Some("Year"), Some("Monthly")), 1997L)))
    assert(q.offset == 10L && q.limit.contains(5L) && q.nonempty && q.parents)
  }
}
