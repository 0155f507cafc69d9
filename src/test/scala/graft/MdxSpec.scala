package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.GraftException
import graft.planner._
import graft.TpchCatalog.salesCube
import SparkTestSession.{catalog => cat}

/** MDX-subset endpoint: the dialect the reference's builder emits compiles
  * onto the same IR and returns the same results as the REST params. */
class MdxSpec extends AnyFunSuite {

  test("SELECT measures ON COLUMNS, level.Members ON ROWS FROM cube") {
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue], [Measures].[Quantity]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM [sales]""".stripMargin)
    assert(q == CubeQuery("sales",
      Seq(LevelDrill(LevelRef("Geography", Some("Region")))),
      Seq("revenue", "sum_qty"), nonempty = false)) // MDX default = dense
  }

  test("CROSSJOIN and * compose drilldowns; NON EMPTY is honored") {
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([Geography].[Region].Members,
        |  [ShipDate].[Monthly].[Year].Members) ON ROWS
        |FROM sales""".stripMargin)
    assert(q.drilldowns == Seq(
      LevelDrill(LevelRef("Geography", Some("Region"))),
      LevelDrill(LevelRef("ShipDate", Some("Year"), Some("Monthly")))))
    assert(q.nonempty)
  }

  test("TOPCOUNT becomes a top-k cut; results match the named-set query") {
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |TOPCOUNT([Part].[Brands].[Brand].Members, 5, [Measures].[Revenue]) ON ROWS
        |FROM sales""".stripMargin)
    val viaMdx = Planner.plan(cat, q).collect().map(_.toSeq)
    val viaNamedSet = Planner.plan(cat, CubeQuery("sales",
      Seq(NamedSetDrill("Top Brands")), Seq("revenue"))).collect()
      .map(_.toSeq)
    assert(viaMdx.toSeq == viaNamedSet.toSeq)
  }

  test("WHERE slicer tuple and DESCENDANTS") {
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |DESCENDANTS([Geography].[Region].[3], [Geography].[Supplier]) ON ROWS
        |FROM sales
        |WHERE ([ReturnFlag].[ReturnFlag].[R] * [ShipDate].[Monthly].[Year].[1997])""".stripMargin)
    assert(q.drilldowns == Seq(LevelDrill(LevelRef("Geography", Some("Supplier")))))
    assert(q.cuts.toSet == Set(
      MemberCut(LevelRef("Geography", Some("Region")), 3L),
      MemberCut(LevelRef("ReturnFlag", Some("ReturnFlag")), "R"),
      MemberCut(LevelRef("ShipDate", Some("Year"), Some("Monthly")), 1997L)))
    assert(Planner.plan(cat, q).collect().nonEmpty)
  }

  test("member-set literal on rows") {
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |{[ReturnFlag].[ReturnFlag].[A], [ReturnFlag].[ReturnFlag].[R]} ON ROWS
        |FROM sales""".stripMargin)
    val rows = Planner.plan(cat, q).collect()
    assert(rows.map(_.getString(0)).toSet == Set("A", "R"))
  }

  test("error contract: bad MDX, wrong cube, unknown measure") {
    assert(intercept[GraftException](
      MdxParser.parse(salesCube, "DRILLTHROUGH garbage")).status == 400)
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      "SELECT {[Measures].[Revenue]} ON COLUMNS, [Geography].[Region].Members ON ROWS FROM [nope]"))
      .status == 400)
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      "SELECT {[Measures].[Nope]} ON COLUMNS, [Geography].[Region].Members ON ROWS FROM sales"))
      .status == 400)
  }
}
