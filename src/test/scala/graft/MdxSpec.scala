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

  test("WITH MEMBER defines a query-scoped calc measure (B7 ad hoc)") {
    val q = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[margin] AS
        |  '[Measures].[Gross] - [Measures].[Discount Amount]'
        |SELECT {[Measures].[margin]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)
    assert(q.adhocCalcs.map(c => (c.alias, c.formula)) ==
      Seq(("margin", "gross - disc_amt")))
    val rows = Planner.plan(cat, q).collect()
    // margin == the schema-declared 'net' calc member, by construction
    val net = Planner.plan(cat, CubeQuery("sales",
      Seq(LevelDrill(LevelRef("Geography", Some("Region")))), Seq("net")))
      .collect()
    assert(rows.map(_.getDouble(2)).toSeq == net.map(_.getDouble(2)).toSeq)
    // shadowing a declared measure is a 400
    val shadow = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[net] AS '[Measures].[Gross]'
        |SELECT {[Measures].[net]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS FROM sales""".stripMargin)
    assert(intercept[GraftException](Planner.plan(cat, shadow)).status == 400)
  }

  test("MDX references a PARALLELPERIOD lag measure by alias (B8 ext)") {
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue], [Measures].[yoy_prev_revenue],
        |  [Measures].[yoy_growth]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].Members) ON ROWS
        |FROM sales""".stripMargin)
    val rows = Planner.plan(cat, q).collect()
    assert(rows.length > 12)
    (12 until rows.length).foreach { i =>
      assert(rows(i).getDouble(3) == rows(i - 12).getDouble(2),
        s"row $i: MDX yoy lag mismatch")
    }
  }

  test("MDX references the Ytd running measure by alias (B8 ext)") {
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue], [Measures].[ytd_revenue]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].Members) ON ROWS
        |FROM sales""".stripMargin)
    val rows = Planner.plan(cat, q).collect()
    assert(rows.nonEmpty)
    var year = -1; var acc = BigDecimal(0)
    rows.foreach { r =>
      if (r.getInt(0) != year) { year = r.getInt(0); acc = BigDecimal(0) }
      acc += BigDecimal(r.getDouble(2))
      assert(math.abs(r.getDouble(3) - acc.toDouble) < 1e-6,
        s"MDX ytd at $year-${r.getInt(1)}")
    }
  }

  test("WITH MEMBER tuple navigation: PrevMember reuses the declared lag") {
    // the foodmart Profit Growth pattern (foodmart.xml:351-366): the tuple
    // resolves to the cube's declared prev_revenue lag (same base, dim,
    // periods), COALESCEEMPTY becomes null-coalescing over the lag value
    val q = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[Revenue Growth] AS
        |  '[Measures].[Revenue] - COALESCEEMPTY(
        |     ([Measures].[Revenue], [ShipDate].PrevMember),
        |     [Measures].[Revenue])'
        |SELECT {[Measures].[Revenue], [Measures].[Revenue Growth]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].Members) ON ROWS
        |FROM sales""".stripMargin)
    assert(q.adhocLags.isEmpty, "must reuse the declared prev_revenue lag")
    assert(q.adhocCalcs.map(_.formula) ==
      Seq("revenue - coalesce(\n     prev_revenue,\n     revenue)"))
    val rows = Planner.plan(cat, q).collect()
    assert(rows.length > 1)
    // first member of the domain: no previous → growth coalesces to 0
    assert(rows.head.getDouble(3) == 0.0)
    // later rows: growth == revenue - previous row's revenue (dense months)
    (1 until rows.length).foreach { i =>
      assert(math.abs(rows(i).getDouble(3) -
        (rows(i).getDouble(2) - rows(i - 1).getDouble(2))) < 1e-6,
        s"row $i growth")
    }
  }

  test("WITH MEMBER tuple Lag(n) synthesizes an ad-hoc lag measure") {
    val q = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[Rev 2mo Ago] AS
        |  '([Measures].[Revenue], [ShipDate].CurrentMember.Lag(2))'
        |SELECT {[Measures].[Revenue], [Measures].[Rev 2mo Ago]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].Members) ON ROWS
        |FROM sales""".stripMargin)
    assert(q.adhocLags.map(l => (l.base, l.timeDim, l.periods)) ==
      Seq(("revenue", "ShipDate", 2)))
    val rows = Planner.plan(cat, q).collect()
    assert(rows.length > 2)
    (2 until rows.length).foreach { i =>
      assert(rows(i).getDouble(3) == rows(i - 2).getDouble(2),
        s"row $i: Lag(2) mismatch")
    }
    // navigation on an unknown dimension is a 400
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[x] AS
        |  '([Measures].[Revenue], [Wat].PrevMember)'
        |SELECT {[Measures].[x]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS FROM sales""".stripMargin))
      .status == 400)
  }

  test("WITH MEMBER All-member tuple computes share-of-total") {
    val q = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[geo share] AS
        |  '[Measures].[Revenue] /
        |   ([Measures].[Revenue], [Geography].[All Regions])'
        |SELECT {[Measures].[Revenue], [Measures].[geo share]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)
    // the declared revenue_geo_total (same base + dim) is reused
    assert(q.adhocTotals.isEmpty)
    assert(q.adhocCalcs.map(_.formula) ==
      Seq("revenue /\n   revenue_geo_total"))
    val rows = Planner.plan(cat, q).collect()
    assert(rows.length == 5)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    // an undeclared (base, dim) pair synthesizes an ad-hoc total
    val q2 = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[qty share] AS
        |  '[Measures].[Quantity] /
        |   ([Measures].[Quantity], [Part].[All Brands])'
        |SELECT {[Measures].[qty share]} ON COLUMNS,
        |[Part].[Brands].[Brand].Members ON ROWS
        |FROM sales""".stripMargin)
    assert(q2.adhocTotals.map(t => (t.base, t.dim)) == Seq(("sum_qty", "Part")))
    val shares = Planner.plan(cat, q2).collect().map(_.getDouble(1))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
  }

  test("ClosingPeriod/OpeningPeriod tuples: semi-additive balances at the " +
      "calendar-domain edge, empty when the partition lacks the edge month") {
    def mdx(fn: String) = MdxParser.parse(salesCube,
      s"""WITH MEMBER [Measures].[edge revenue] AS
         |  '([Measures].[Revenue],
         |    ${fn}PERIOD([ShipDate].[Monthly].[Month],
         |      [ShipDate].[Monthly].[Year].CurrentMember))'
         |SELECT {[Measures].[Revenue], [Measures].[edge revenue]}
         |  ON COLUMNS,
         |NON EMPTY CROSSJOIN([Geography].[Nation].Members,
         |  CROSSJOIN([ShipDate].[Monthly].[Year].Members,
         |    [ShipDate].[Monthly].[Month].Members)) ON ROWS
         |FROM sales""".stripMargin)
    val q = mdx("CLOSING")
    assert(q.adhocCums.map(c =>
        (c.base, c.timeDim, c.resetLevel, c.edge, c.edgeLevel)) ==
      Seq(("revenue", "ShipDate", "Year", "closing", "Month")))
    // rows: nation(0) label(1) year(2) month(3) revenue(4) edge(5)
    val rows = Planner.plan(cat, q).collect().map(r =>
      (r.getInt(0), r.getInt(2), r.getInt(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    // the calendar domain is corpus-wide: closing month of a year = the
    // max month any nation shipped in (every fact row has a nation, so
    // that month is visible in the axis)
    val closingMonth = rows.groupBy(_._2).view.mapValues(_.map(_._3).max)
    val byCell = rows.map(t => (t._1, t._2, t._3) -> t._4).toMap
    rows.foreach { case (nation, year, _, _, edge) =>
      assert(edge == byCell.get((nation, year, closingMonth(year))),
        s"nation $nation year $year")
    }
    // a nation with no December data carries an EMPTY closing cell (the
    // fixture is sparse at sf0.001, so such cells exist)
    assert(rows.exists(_._5.isEmpty))
    // opening variant: value at the year's FIRST domain month
    val or = Planner.plan(cat, mdx("OPENING")).collect().map(r =>
      (r.getInt(0), r.getInt(2), r.getInt(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    val openingMonth = or.groupBy(_._2).view.mapValues(_.map(_._3).min)
    or.foreach { case (nation, year, _, _, edge) =>
      assert(edge == or.find(t => t._1 == nation && t._2 == year &&
        t._3 == openingMonth(year)).map(_._4))
    }
    // a slicer cut on the time dimension must not clip the balance: the
    // cut member's WHOLE year rides the window domain, so a month-3 axis
    // still reads its year's closing (December-side) value
    val qCut = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[edge revenue] AS
        |  '([Measures].[Revenue],
        |    CLOSINGPERIOD([ShipDate].[Monthly].[Month],
        |      [ShipDate].[Monthly].[Year].CurrentMember))'
        |SELECT {[Measures].[Revenue], [Measures].[edge revenue]}
        |  ON COLUMNS,
        |NON EMPTY CROSSJOIN([Geography].[Nation].Members,
        |  CROSSJOIN([ShipDate].[Monthly].[Year].Members,
        |    [ShipDate].[Monthly].[Month].Members)) ON ROWS
        |FROM sales
        |WHERE ([ShipDate].[Monthly].[Month].[3])""".stripMargin)
    val cutRows = Planner.plan(cat, qCut).collect().map(r =>
      (r.getInt(0), r.getInt(2), r.getInt(3),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(cutRows.nonEmpty && cutRows.forall(_._3 == 3)) // axis clipped
    cutRows.foreach { case (nation, year, _, edge) =>
      assert(edge == byCell.get((nation, year, closingMonth(year))),
        s"cut must not clip the balance: nation $nation year $year")
    }
    // a leaf coarser than the drilled axis cannot represent the closing
    // member's value — 400, never a silently wrong pick
    val qBad = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[bad] AS
        |  '([Measures].[Revenue],
        |    CLOSINGPERIOD([ShipDate].[Monthly].[Quarter],
        |      [ShipDate].[Monthly].[Year].CurrentMember))'
        |SELECT {[Measures].[bad]} ON COLUMNS,
        |CROSSJOIN([ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].Members) ON ROWS
        |FROM sales""".stripMargin)
    val e = intercept[GraftException](Planner.plan(cat, qBad).collect())
    assert(e.status == 400 && e.getMessage.contains("finest drilled"))
  }

  test("CurrentMember.Parent tuple computes share-of-parent; shares sum " +
      "to 1 within each parent; parent level must ride the axis") {
    val q = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[nation share] AS
        |  '[Measures].[Revenue] /
        |   ([Measures].[Revenue], [Geography].CurrentMember.Parent)'
        |SELECT {[Measures].[Revenue], [Measures].[nation share]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([Geography].[Region].Members,
        |  [Geography].[Nation].Members) ON ROWS
        |FROM sales""".stripMargin)
    assert(q.adhocTotals.map(t => (t.base, t.dim, t.parent)) ==
      Seq(("revenue", "Geography", true)))
    val rows = Planner.plan(cat, q).collect()
    // within each region, nation shares sum to 1 exactly (same window)
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(5)).sum - 1.0) < 1e-9)
    }
    // the synthesized parent total is DISTINCT from the declared All
    // total: with multiple regions, at least one nation's parent share
    // exceeds its share of the grand total
    assert(rows.map(_.getInt(0)).distinct.length > 1)
    // parent of a TOP-level member is All: same value as the plain total
    val qTop = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[region share] AS
        |  '[Measures].[Revenue] /
        |   ([Measures].[Revenue], [Geography].CurrentMember.Parent)'
        |SELECT {[Measures].[region share]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)
    val topShares = Planner.plan(cat, qTop).collect().map(_.getDouble(2))
    assert(math.abs(topShares.sum - 1.0) < 1e-9)
    // drilling only Nation (no parent level on the axis) is a 400 with
    // guidance, not a silent grand-total share
    val qNoParent = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[nation share] AS
        |  '[Measures].[Revenue] /
        |   ([Measures].[Revenue], [Geography].CurrentMember.Parent)'
        |SELECT {[Measures].[nation share]} ON COLUMNS,
        |[Geography].[Nation].Members ON ROWS
        |FROM sales""".stripMargin)
    val e = intercept[GraftException](Planner.plan(cat, qNoParent).collect())
    assert(e.status == 400 && e.getMessage.contains("parent level 'Region'"))
    // an undrilled dimension has no CurrentMember to take a parent of
    val qUndrilled = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[share] AS
        |  '[Measures].[Revenue] /
        |   ([Measures].[Revenue], [Geography].CurrentMember.Parent)'
        |SELECT {[Measures].[share]} ON COLUMNS,
        |[Part].[Brands].[Brand].Members ON ROWS
        |FROM sales""".stripMargin)
    val e2 = intercept[GraftException](
      Planner.plan(cat, qUndrilled).collect())
    assert(e2.status == 400 && e2.getMessage.contains("requires a drilldown"))
  }

  test("ad-hoc WITH MEMBER arithmetic on a virtual cube parses against " +
      "the mdxView and plans over the drill-across frame; a measure the " +
      "virtual cube does not expose stays a clean 400") {
    val view = Planner.mdxView(cat, "commerce")
    assert(view.name == "commerce")
    // exposed surface = both member cubes' exposed measures + vc calcs
    assert(view.measure("Total Sales").exists(_.alias == "total_sales"))
    assert(view.measure("Revenue").exists(_.alias == "revenue"))
    assert(view.calcMembers.exists(_.alias == "rev_per_order"))
    val q = MdxParser.parse(view,
      """WITH MEMBER [Measures].[rps] AS
        |  '[Measures].[Revenue] / [Measures].[Total Sales]'
        |SELECT {[Measures].[rps]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS FROM commerce""".stripMargin)
    assert(q.cube == "commerce" && q.adhocCalcs.nonEmpty)
    val rows = Planner.plan(cat, q).collect()
    assert(rows.length == 5 && rows.forall(!_.isNullAt(2)))
    // sales' order_cnt is NOT exposed by commerce — unknown at parse
    val e = intercept[GraftException](MdxParser.parse(view,
      """WITH MEMBER [Measures].[x] AS
        |  '[Measures].[Revenue] / [Measures].[Line Count]'
        |SELECT {[Measures].[x]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS FROM commerce""".stripMargin))
    assert(e.status == 400)
  }

  test("tuple navigation on a virtual cube is a clean 400, never a crash") {
    // a virtual cube only conforms axes — tuple measures live in member
    // cubes. Two failure shapes: a SYNTHESIZED ad-hoc total (Quantity over
    // Part is undeclared) and a REUSED declared alias (revenue_geo_total)
    // that the virtual cube does not expose. Both must 400 with a
    // diagnosable message, not die in Spark analysis.
    val anchor = Planner.anchorCube(cat, "commerce").copy(name = "commerce")
    val synth = MdxParser.parse(anchor,
      """WITH MEMBER [Measures].[x] AS
        |  '([Measures].[Quantity], [Part].[All Brands])'
        |SELECT {[Measures].[x]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS FROM commerce""".stripMargin)
      .copy(cube = "commerce")
    val e1 = intercept[GraftException](Planner.plan(cat, synth))
    assert(e1.status == 400 && e1.getMessage.contains("virtual cube"))
    val reused = MdxParser.parse(anchor,
      """WITH MEMBER [Measures].[x] AS
        |  '([Measures].[Revenue], [Geography].[All Regions])'
        |SELECT {[Measures].[x]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS FROM commerce""".stripMargin)
      .copy(cube = "commerce")
    val e2 = intercept[GraftException](Planner.plan(cat, reused))
    assert(e2.status == 400 &&
      e2.getMessage.contains("revenue_geo_total"), e2.getMessage)
  }

  test("two same-period navigations on different dims synthesize distinct lags") {
    // the lag alias carries the dimension: ([Revenue], [ShipDate].Lag(2))
    // and ([Revenue], [Geography].Lag(2)) in one WITH clause must not
    // collapse onto one synthesized measure (alias-collision regression)
    val q = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[x] AS
        |  '([Measures].[Revenue], [ShipDate].CurrentMember.Lag(2)) -
        |   ([Measures].[Revenue], [Geography].CurrentMember.Lag(2))'
        |SELECT {[Measures].[x]} ON COLUMNS,
        |[ShipDate].[Monthly].[Month].Members ON ROWS
        |FROM sales""".stripMargin)
    assert(q.adhocLags.map(l => (l.timeDim, l.periods)).toSet ==
      Set(("ShipDate", 2), ("Geography", 2)))
    assert(q.adhocLags.map(_.alias).distinct.size == 2)
    // both aliases substituted into the formula
    val formula = q.adhocCalcs.head.formula
    q.adhocLags.foreach(l => assert(formula.contains(l.alias), formula))
  }

  test("fixed-member tuples: an off-axis pin equals the cut query, a " +
      "drilled pin OVERRIDES the axis member (Mondrian), unqualified " +
      "members resolve top-down, and every unsupported state 400s clean") {
    def plan(mdx: String) =
      Planner.plan(cat, MdxParser.parse(salesCube, mdx)).collect()
    val pinMdx =
      """WITH MEMBER [Measures].[pin] AS
        |  '([Measures].[Revenue], [Geography].[Region].[2])'
        |SELECT {[Measures].[Revenue], [Measures].[pin]} ON COLUMNS,
        |NON EMPTY [Part].[Brand].Members ON ROWS FROM sales""".stripMargin
    val rows = plan(pinMdx)
      .map(r => r.getString(0) -> (r.get(1), Option(r.get(2)))).toMap
    // ground truth: the same axis with an explicit region-2 cut
    val cutRows = Planner.plan(cat, CubeQuery("sales",
        Seq(LevelDrill(LevelRef("Part", Some("Brand")))), Seq("revenue"),
        cuts = Seq(MemberCut(LevelRef("Geography", Some("Region")), 2L))))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(rows.nonEmpty && cutRows.nonEmpty)
    cutRows.foreach { case (brand, rev) =>
      assert(rows(brand)._2.contains(rev),
        s"pin at $brand: ${rows(brand)._2} vs cut $rev")
    }
    // a brand with no region-2 facts pins to null, not 0
    rows.filterNot(r => cutRows.contains(r._1))
      .foreach { case (_, (_, pin)) => assert(pin.isEmpty) }
    // unqualified member: [Geography].[2] searches the hierarchy top-down
    // and lands on Region (the first level whose key domain has 2)
    assert(plan(pinMdx.replace("[Geography].[Region].[2]",
        "[Geography].[2]"))
      .map(r => r.getString(0) -> (r.get(1), Option(r.get(2)))).toMap
      == rows)
    // drilled pin: the tuple overrides the axis member — every region row
    // of a brand carries the brand's region-2 revenue
    val over = plan(
      """WITH MEMBER [Measures].[pin] AS
        |  '([Measures].[Revenue], [Geography].[Region].[2])'
        |SELECT {[Measures].[Revenue], [Measures].[pin]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([Geography].[Region].Members,
        |  [Part].[Brand].Members) ON ROWS FROM sales""".stripMargin)
    over.groupBy(_.getString(2)).foreach { case (brand, rs) =>
      val pins = rs.map(r => Option(r.get(4))).distinct
      assert(pins.size == 1, s"pin not partition-constant at $brand")
      assert(pins.head == cutRows.get(brand).map(identity),
        s"override at $brand: ${pins.head} vs ${cutRows.get(brand)}")
    }
    // 400s: cut on the pinned dimension (tuple overrides the slicer)…
    val eCut = intercept[GraftException](plan(pinMdx.replace(
      "FROM sales", "FROM sales WHERE ([Geography].[Region].[1])")))
    assert(eCut.status == 400 &&
      eCut.getMessage.contains("overrides the slicer"), eCut.getMessage)
    // …a pin COARSER than the drill is Mondrian's ancestor-value case:
    // every Nation row shows the REGION-2 TOTAL (the ancestor's value),
    // merged from the drilled descendants' cells
    val region2Total = Planner.plan(cat, CubeQuery("sales", Nil,
        Seq("revenue"),
        cuts = Seq(MemberCut(LevelRef("Geography", Some("Region")), 2L))))
      .collect().head.get(0)
    val coarser = plan(
      """WITH MEMBER [Measures].[pin] AS
        |  '([Measures].[Revenue], [Geography].[Region].[2])'
        |SELECT {[Measures].[Revenue], [Measures].[pin]} ON COLUMNS,
        |NON EMPTY [Geography].[Nation].Members ON ROWS
        |FROM sales""".stripMargin)
    assert(coarser.nonEmpty)
    coarser.foreach(r => assert(r.get(3) == region2Total,
      s"coarser pin at ${r.get(0)}: ${r.get(3)} vs $region2Total"))
    // …while a pin FINER than the drill stays a clean 400 (a finer
    // member does not determine one value per coarser row)
    val eLvl = intercept[GraftException](plan(
      """WITH MEMBER [Measures].[pin] AS
        |  '([Measures].[Revenue], [Geography].[Nation].[3])'
        |SELECT {[Measures].[pin]} ON COLUMNS,
        |NON EMPTY [Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin))
    assert(eLvl.status == 400 &&
      eLvl.getMessage.contains("FINER"), eLvl.getMessage)
    // …an unqualified member that exists at NO level…
    val eMem = intercept[GraftException](plan(pinMdx.replace(
      "[Geography].[Region].[2]", "[Geography].[Allentown]")))
    assert(eMem.status == 400 &&
      eMem.getMessage.contains("not found in any level"), eMem.getMessage)
    // …and a pin on a virtual cube (no member cube machinery to route to)
    val eVc = intercept[GraftException](Planner.plan(cat,
      MdxParser.parse(Planner.mdxView(cat, "commerce"),
        """WITH MEMBER [Measures].[pin] AS
          |  '([Measures].[Revenue], [Geography].[Region].[2])'
          |SELECT {[Measures].[pin]} ON COLUMNS,
          |[Geography].[Region].Members ON ROWS
          |FROM commerce""".stripMargin)))
    assert(eVc.status == 400 &&
      eVc.getMessage.contains("virtual cube"), eVc.getMessage)
  }

  test("multi-member tuple pins: both-off-axis equals the doubly-cut " +
      "query, the mixed drilled/off-axis state overrides the drilled " +
      "axis, and a duplicated dimension 400s") {
    def plan(mdx: String) =
      Planner.plan(cat, MdxParser.parse(salesCube, mdx)).collect()
    val mdx =
      """WITH MEMBER [Measures].[pin] AS
        |  '([Measures].[Revenue], [Geography].[Region].[2],
        |    [ShipDate].[Year].[1995])'
        |SELECT {[Measures].[Revenue], [Measures].[pin]} ON COLUMNS,
        |NON EMPTY [Part].[Brand].Members ON ROWS FROM sales""".stripMargin
    val rows = plan(mdx).map(r => r.getString(0) -> Option(r.get(2))).toMap
    // ground truth: the same axis cut to region 2 AND ship-year 1995
    val cutRows = Planner.plan(cat, CubeQuery("sales",
        Seq(LevelDrill(LevelRef("Part", Some("Brand")))), Seq("revenue"),
        cuts = Seq(MemberCut(LevelRef("Geography", Some("Region")), 2L),
          MemberCut(LevelRef("ShipDate", Some("Year")), 1995L))))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(rows.nonEmpty && cutRows.nonEmpty)
    cutRows.foreach { case (brand, rev) =>
      assert(rows(brand).contains(rev),
        s"tuple pin at $brand: ${rows(brand)} vs cut $rev")
    }
    // a brand with no (region 2 × 1995) facts pins to null, not 0
    rows.filterNot(r => cutRows.contains(r._1))
      .foreach { case (_, pin) => assert(pin.isEmpty) }
    // mixed state: Region drilled (the tuple overrides the axis member),
    // Year off-axis (fact mask) — every region row of a brand carries
    // the brand's (region 2 × 1995) value, partition-constant
    val over = plan(
      """WITH MEMBER [Measures].[pin] AS
        |  '([Measures].[Revenue], [Geography].[Region].[2],
        |    [ShipDate].[Year].[1995])'
        |SELECT {[Measures].[Revenue], [Measures].[pin]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([Geography].[Region].Members,
        |  [Part].[Brand].Members) ON ROWS FROM sales""".stripMargin)
    over.groupBy(_.getString(2)).foreach { case (brand, rs) =>
      val pins = rs.map(r => Option(r.get(4))).distinct
      assert(pins.size == 1, s"mixed pin not partition-constant at $brand")
      assert(pins.head == cutRows.get(brand).map(identity),
        s"mixed override at $brand: ${pins.head} vs ${cutRows.get(brand)}")
    }
    // one member per dimension, as in a Mondrian tuple
    val eDup = intercept[GraftException](plan(mdx.replace(
      "[ShipDate].[Year].[1995]", "[Geography].[Nation].[3]")))
    assert(eDup.status == 400 && eDup.getMessage.contains("twice"),
      eDup.getMessage)
  }

  test("mixed navigation+pin tuple: ([M], [Time].PrevMember, " +
      "[Region].[2]) is the lag of the pinned measure; a drilled pinned " +
      "dim and a navigated-and-pinned dim both 400") {
    def plan(mdx: String) =
      Planner.plan(cat, MdxParser.parse(salesCube, mdx)).collect()
    val rows = plan(
      """WITH MEMBER [Measures].[prev_asia] AS
        |  '([Measures].[Revenue], [ShipDate].PrevMember,
        |    [Geography].[Region].[2])'
        |SELECT {[Measures].[Revenue], [Measures].[prev_asia]} ON COLUMNS,
        |[ShipDate].[Year].Members ON ROWS FROM sales""".stripMargin)
    // ground truth: the pin-only query per year, shifted by one member
    val pinByYear = plan(
      """WITH MEMBER [Measures].[asia] AS
        |  '([Measures].[Revenue], [Geography].[Region].[2])'
        |SELECT {[Measures].[asia]} ON COLUMNS,
        |[ShipDate].[Year].Members ON ROWS FROM sales""".stripMargin)
      .map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val y = r.getInt(0)
      assert(Option(r.get(2)) == pinByYear.getOrElse(y - 1, None),
        s"year $y: ${Option(r.get(2))} vs ${pinByYear.get(y - 1)}")
    }
    // pinned dim on the axis under navigation → the planner's clean 400
    // (the lag needs the pin's aggregation-time column)
    val eDrill = intercept[GraftException](plan(
      """WITH MEMBER [Measures].[p] AS
        |  '([Measures].[Revenue], [ShipDate].PrevMember,
        |    [Geography].[Region].[2])'
        |SELECT {[Measures].[p]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([Geography].[Region].Members,
        |  [ShipDate].[Year].Members) ON ROWS FROM sales""".stripMargin))
    assert(eDrill.status == 400 &&
      eDrill.getMessage.contains("pinned dimension is on the axis"),
      eDrill.getMessage)
    // one dimension both navigated and pinned is a contradiction
    val eTwice = intercept[GraftException](plan(
      """WITH MEMBER [Measures].[p] AS
        |  '([Measures].[Revenue], [ShipDate].PrevMember,
        |    [ShipDate].[Year].[1995])'
        |SELECT {[Measures].[p]} ON COLUMNS,
        |[ShipDate].[Year].Members ON ROWS FROM sales""".stripMargin))
    assert(eTwice.status == 400 && eTwice.getMessage.contains("twice"),
      eTwice.getMessage)
  }

  test("a DENSE coarser-pin axis backfills the merged pin value onto " +
      "filler rows (partition-constant, like totals)") {
    def plan(mdx: String) =
      Planner.plan(cat, MdxParser.parse(salesCube, mdx)).collect()
    // no NON EMPTY: the dense axis may contain (region, month) fillers
    // with a null Revenue — the coarser pin must still show the region's
    // 1995 total on EVERY row of the partition, fillers included
    val rows = plan(
      """WITH MEMBER [Measures].[y95] AS
        |  '([Measures].[Revenue], [ShipDate].[Year].[1995])'
        |SELECT {[Measures].[Revenue], [Measures].[y95]} ON COLUMNS,
        |CROSSJOIN([Geography].[Region].Members,
        |  [ShipDate].[Month].Members) ON ROWS FROM sales""".stripMargin)
    assert(rows.nonEmpty)
    rows.groupBy(_.getInt(0)).foreach { case (region, rs) =>
      val pins = rs.map(r => Option(r.get(4))).distinct
      assert(pins.size == 1,
        s"region $region: pin not partition-constant across dense rows")
      assert(pins.head.nonEmpty, s"region $region: pin missing")
    }
  }

  test("explicit tuple-set axis: {(t1),(t2)} enumerates exactly the " +
      "listed combinations — dense keeps a listed-but-empty tuple as a " +
      "null cell, NON EMPTY drops it, malformed sets 400") {
    def plan(mdx: String) =
      Planner.plan(cat, MdxParser.parse(salesCube, mdx)).collect()
    // ground truth + an EMPTY (region, part) combination discovered from
    // the full crossjoin (parts are sparse across regions, unlike brands)
    val full = plan(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([Geography].[Region].Members,
        |  [Part].[Part].Members) ON ROWS FROM sales""".stripMargin)
      .map(r => (r.getInt(0), r.getLong(2)) -> r.get(4)).toMap
    val present = full.keySet.head
    val parts = full.keySet.map(_._2)
    val absent = (0 to 4).flatMap(region =>
        parts.map(region.asInstanceOf[Int] -> _))
      .find(!full.contains(_))
      .getOrElse(fail("no empty (region, part) combo at this scale"))
    def mdxFor(nonEmpty: Boolean) =
      s"""SELECT {[Measures].[Revenue]} ON COLUMNS,
         |${if (nonEmpty) "NON EMPTY " else ""}{
         |  ([Geography].[Region].[${present._1}],
         |   [Part].[Part].[${present._2}]),
         |  ([Geography].[Region].[${absent._1}],
         |   [Part].[Part].[${absent._2}])} ON ROWS
         |FROM sales""".stripMargin
    // dense (default): BOTH listed tuples appear — the present one with
    // its exact value, the empty one as a null cell — and nothing else
    // (the per-dim domains' cross product is trimmed to the list)
    val dense = plan(mdxFor(nonEmpty = false))
      .map(r => (r.getInt(0), r.getLong(2)) -> Option(r.get(4))).toMap
    assert(dense.keySet == Set(present, absent), s"dense keys $dense")
    assert(dense(present) == Option(full(present)))
    assert(dense(absent).isEmpty, "empty listed tuple must be a null cell")
    // NON EMPTY: only the tuple with facts survives
    val ne = plan(mdxFor(nonEmpty = true))
      .map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(ne == Set(present))
    // 400s: tuples naming different levels, and a duplicated dim
    val eShape = intercept[GraftException](plan(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |{([Geography].[Region].[1], [Part].[Brand].[Brand#13]),
        | ([Geography].[Region].[2], [Order].[Priority].[5-LOW])} ON ROWS
        |FROM sales""".stripMargin))
    assert(eShape.status == 400 &&
      eShape.getMessage.contains("same levels"), eShape.getMessage)
    val eDup = intercept[GraftException](plan(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |{([Geography].[Region].[1], [Geography].[Region].[2])} ON ROWS
        |FROM sales""".stripMargin))
    assert(eDup.status == 400 &&
      eDup.getMessage.contains("at most once"), eDup.getMessage)
  }

  test("a tuple set composes with CROSSJOIN: the listed combinations " +
      "fan out over the other set's members with doubly-cut values") {
    def plan(mdx: String) =
      Planner.plan(cat, MdxParser.parse(salesCube, mdx)).collect()
    val rows = plan(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY CROSSJOIN(
        |  {([Geography].[Region].[1], [Order].[Priority].[1-URGENT]),
        |   ([Geography].[Region].[3], [Order].[Priority].[5-LOW])},
        |  [ReturnFlag].[ReturnFlag].Members) ON ROWS
        |FROM sales""".stripMargin)
    assert(rows.nonEmpty)
    // only the two listed (region, priority) pairs appear, each fanned
    // over return flags
    val pairs = rows.map(r => (r.getInt(0), r.getString(2))).toSet
    assert(pairs == Set((1, "1-URGENT"), (3, "5-LOW")), s"pairs $pairs")
    // values equal the doubly-cut per-flag query for each listed pair
    pairs.foreach { case (region, prio) =>
      val want = Planner.plan(cat, CubeQuery("sales",
          Seq(LevelDrill(LevelRef("ReturnFlag"))), Seq("revenue"),
          cuts = Seq(MemberCut(LevelRef("Geography", Some("Region")),
              region.toLong),
            MemberCut(LevelRef("Order", Some("Priority")), prio))))
        .collect().map(r => r.getString(0) -> r.get(1)).toMap
      val got = rows.filter(r =>
          r.getInt(0) == region && r.getString(2) == prio)
        .map(r => r.getString(3) -> r.get(4)).toMap
      assert(got == want, s"($region, $prio): $got vs $want")
    }
  }

  test("a member merely starting with 'All' is not a grand total — it " +
      "parses as a FIXED-MEMBER tuple (pinned measure), never a total") {
    // [City].[Allentown] must NOT silently become a share-of-total
    // denominator; it is a fixed-member pin whose key resolves (or 400s,
    // member-not-found) at plan time
    val q = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[x] AS
        |  '[Measures].[Revenue] / ([Measures].[Revenue], [Geography].[Allentown])'
        |SELECT {[Measures].[x]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)
    assert(q.adhocTotals.isEmpty)
    assert(q.adhocPinned.flatMap(_.pins.map(s => (s.dim, s.level, s.key)))
      == Seq(("Geography", "", "Allentown")))
    assert(q.adhocCalcs.head.formula
      .contains(q.adhocPinned.head.alias))
    // the genuine All member (with the word boundary) still rewrites
    val ok = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[s] AS
        |  '[Measures].[Revenue] / ([Measures].[Revenue], [Geography].[All])'
        |SELECT {[Measures].[s]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)
    assert(ok.adhocCalcs.head.formula == "revenue / revenue_geo_total")
  }

  test("WITH MEMBER alias may contain spaces (standard MDX names)") {
    val q = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[Profit Margin] AS
        |  '[Measures].[Gross] - [Measures].[Discount Amount]'
        |SELECT {[Measures].[Profit Margin]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)
    assert(q.adhocCalcs.map(c => (c.alias, c.formula)) ==
      Seq(("Profit Margin", "gross - disc_amt")))
    assert(Planner.plan(cat, q).columns.contains("Profit Margin"))
  }

  test("FILTER compiles to HAVING, ORDER to the result order") {
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |ORDER(FILTER([Part].[Brands].[Brand].Members,
        |  [Measures].[Revenue] > 10000000), [Measures].[Revenue], DESC) ON ROWS
        |FROM sales""".stripMargin)
    assert(q.filters == Seq(MeasureFilter("revenue", ">", 1.0e7)))
    assert(q.order == Some(OrderSpec(OrderByMeasure("revenue"), desc = true)))
    val rows = Planner.plan(cat, q).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(1))
    assert(revs.forall(_ > 1.0e7))
    assert(revs.sameElements(revs.sortBy(-(_: Double))))
  }

  test("HEAD limits, HIERARCHIZE is the default order (no-op)") {
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |HEAD(HIERARCHIZE([Geography].[Region].Members), 3) ON ROWS
        |FROM sales""".stripMargin)
    assert(q.limit == Some(3L))
    val rows = Planner.plan(cat, q).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2)) // hierarchical order
  }

  test("member range and .Children navigate the hierarchy") {
    val range = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |[ShipDate].[Monthly].[Year].[1995] : [ShipDate].[Monthly].[Year].[1997] ON ROWS
        |FROM sales""".stripMargin)
    assert(range.cuts == Seq(RangeCut(
      LevelRef("ShipDate", Some("Year"), Some("Monthly")), 1995L, 1997L)))
    val years = Planner.plan(cat, range).collect().map(_.getInt(0))
    assert(years.forall(y => y >= 1995 && y <= 1997) && years.nonEmpty)
    val kids = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |[Geography].[Region].[2].Children ON ROWS
        |FROM sales""".stripMargin)
    assert(kids.drilldowns == Seq(LevelDrill(
      LevelRef("Geography", Some("Nation"), Some("Geography")))))
    assert(kids.cuts == Seq(MemberCut(LevelRef("Geography", Some("Region")), 2L)))
    // leaf members have no children
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |[Geography].[Supplier].[1].Children ON ROWS FROM sales""".stripMargin))
      .status == 400)
  }

  test("BOTTOMCOUNT keeps the k worst members by the measure") {
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |BOTTOMCOUNT([Part].[Brands].[Brand].Members, 3, [Measures].[Revenue]) ON ROWS
        |FROM sales""".stripMargin)
    assert(q.cuts == Seq(TopKCut(LevelRef("Part", Some("Brand"), Some("Brands")),
      3, "revenue", asc = true)))
    val bottom = Planner.plan(cat, q).collect().map(_.getString(0)).toSet
    val all = Planner.plan(cat, CubeQuery("sales",
      Seq(LevelDrill(LevelRef("Part", Some("Brand"), Some("Brands")))),
      Seq("revenue"))).collect()
    val expected = all.sortBy(_.getDouble(1)).take(3).map(_.getString(0)).toSet
    assert(bottom == expected)
  }

  test("UNION/EXCEPT/INTERSECT fold enumerations; SUBSET pages") {
    def rows(set: String): Seq[Any] = Planner.plan(cat, MdxParser.parse(
      salesCube,
      s"""SELECT {[Measures].[Revenue]} ON COLUMNS,
         |$set ON ROWS FROM sales""".stripMargin))
      .collect().toSeq.map(_.get(0))
    // union dedups and spans both branches
    assert(rows("UNION({[Geography].[Region].[0], [Geography].[Region].[1]}," +
      " {[Geography].[Region].[1], [Geography].[Region].[3]})") ==
      Seq(0, 1, 3))
    // intersect keeps the common member
    assert(rows("INTERSECT({[Geography].[Region].[0], [Geography].[Region].[1]}," +
      " {[Geography].[Region].[1], [Geography].[Region].[3]})") == Seq(1))
    // except of .Members is a NOT IN exclusion cut
    assert(rows("EXCEPT([Geography].[Region].Members," +
      " {[Geography].[Region].[2]})") == Seq(0, 1, 3, 4))
    // nested algebra: (All − {2}) ∩ {1,2,3} = {1,3}
    assert(rows("INTERSECT(EXCEPT([Geography].[Region].Members," +
      " {[Geography].[Region].[2]})," +
      " {[Geography].[Region].[1], [Geography].[Region].[2], [Geography].[Region].[3]})") ==
      Seq(1, 3))
    // SUBSET(set, start, count) pages the default order
    assert(rows("SUBSET([Geography].[Region].Members, 1, 2)") == Seq(1, 2))
    // mixed-level arguments are a 400
    assert(intercept[GraftException](rows(
      "UNION([Geography].[Region].Members, [Geography].[Nation].Members)"))
      .status == 400)
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

  test("WITH SET defines a query-scoped set; later sets and axis wrappers " +
      "may reference it") {
    val q = MdxParser.parse(salesCube,
      """WITH SET [Euro Pair] AS '{[Geography].[Nation].[3], [Geography].[Nation].[7]}'
        |SET [Trio] AS 'UNION([Euro Pair], {[Geography].[Nation].[9]})'
        |SELECT {[Measures].[Revenue]} ON COLUMNS,
        |ORDER([Trio], [Measures].[Revenue], DESC) ON ROWS
        |FROM [sales]""".stripMargin)
    val inline = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |ORDER({[Geography].[Nation].[3], [Geography].[Nation].[7],
        |  [Geography].[Nation].[9]}, [Measures].[Revenue], DESC) ON ROWS
        |FROM [sales]""".stripMargin)
    assert(q == inline)
    // the set composes under TOPCOUNT too
    val topQ = MdxParser.parse(salesCube,
      """WITH SET [Picked] AS '[Part].[Brand].Members'
        |SELECT {[Measures].[Revenue]} ON COLUMNS,
        |TOPCOUNT([Picked], 3, [Measures].[Revenue]) ON ROWS
        |FROM [sales]""".stripMargin)
    assert(topQ.cuts.exists {
      case TopKCut(_, 3, "revenue", false) => true; case _ => false
    })
    // WITH may carry SET and MEMBER together
    val both = MdxParser.parse(salesCube,
      """WITH SET [R] AS '[Geography].[Region].Members'
        |MEMBER [Measures].[Dbl] AS '[Measures].[Revenue] * 2'
        |SELECT {[Measures].[Dbl]} ON COLUMNS, [R] ON ROWS
        |FROM [sales]""".stripMargin)
    assert(both.adhocCalcs.map(_.alias) == Seq("Dbl") &&
      both.drilldowns == Seq(LevelDrill(LevelRef("Geography", Some("Region")))))
    // shadowing a dimension or a schema named set is a 400
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """WITH SET [Geography] AS '[Part].[Brand].Members'
        |SELECT {[Measures].[Revenue]} ON COLUMNS, [Geography] ON ROWS
        |FROM [sales]""".stripMargin)).status == 400)
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """WITH SET [Top Brands] AS '[Part].[Brand].Members'
        |SELECT {[Measures].[Revenue]} ON COLUMNS, [Top Brands] ON ROWS
        |FROM [sales]""".stripMargin)).status == 400)
  }

  test("Sum(level.Members, measure) compiles onto the All-member total") {
    val q = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[share2] AS
        |'[Measures].[revenue] / Sum([Geography].[Region].Members, [Measures].[revenue])'
        |SELECT {[Measures].[revenue], [Measures].[share2]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM [sales]""".stripMargin)
    // reuses the schema-declared TotalMeasureDef for (revenue, Geography)
    assert(q.adhocTotals.isEmpty)
    val rows = Planner.plan(cat, q).collect()
    val declared = Planner.plan(cat, CubeQuery("sales",
      Seq(LevelDrill(LevelRef("Geography", Some("Region")))),
      Seq("revenue", "revenue_geo_share"))).collect()
      .map(r => r.getInt(0) -> r.getDouble(3)).toMap
    rows.foreach(r => assert(r.getDouble(3) == declared(r.getInt(0))))
    // Aggregate() is a synonym; an unknown dimension is still a 400
    val q2 = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[t] AS
        |'Aggregate([Part].[Brands].[Brand].Members, [Measures].[revenue])'
        |SELECT {[Measures].[t]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM [sales]""".stripMargin)
    assert(q2.adhocTotals.exists(_.dim == "Part"))
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[t] AS
        |'Sum([Nope].[X].Members, [Measures].[revenue])'
        |SELECT {[Measures].[t]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM [sales]""".stripMargin)).status == 400)
  }

  test("DISTINCT() sets the A14 flag; redundant parens are transparent") {
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |DISTINCT(([Geography].[Region].Members)) ON ROWS
        |FROM [sales]""".stripMargin)
    assert(q.distinct &&
      q.drilldowns == Seq(LevelDrill(LevelRef("Geography", Some("Region")))))
  }

  test("NONEMPTYCROSSJOIN folds into NON EMPTY CROSSJOIN") {
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NONEMPTYCROSSJOIN([Geography].[Region].Members,
        |  [Part].[Brands].[Brand].Members) ON ROWS
        |FROM sales""".stripMargin)
    val q2 = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([Geography].[Region].Members,
        |  [Part].[Brands].[Brand].Members) ON ROWS
        |FROM sales""".stripMargin)
    assert(q.nonempty && q == q2)
    // the function arriving through a WITH SET reference still folds
    val q3 = MdxParser.parse(salesCube,
      """WITH SET [S] AS 'NONEMPTYCROSSJOIN([Geography].[Region].Members,
        |  [Part].[Brands].[Brand].Members)'
        |SELECT {[Measures].[Revenue]} ON COLUMNS,
        |[S] ON ROWS FROM sales""".stripMargin)
    assert(q3.nonempty && q3.drilldowns == q.drilldowns)
  }

  test("TOPPERCENT over a restricted set uses the SET's total, not the " +
      "whole level's") {
    // find the top revenue brand, then exclude it: the 25% prefix must be
    // computed over the REMAINING brands' total
    val all = Planner.plan(cat, CubeQuery("sales",
        Seq(LevelDrill(LevelRef("Part", Some("Brand"), Some("Brands")))),
        Seq("revenue"))).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val top = all.maxBy(_._2)._1
    val q = MdxParser.parse(salesCube,
      s"""SELECT {[Measures].[Revenue]} ON COLUMNS,
         |TOPPERCENT(EXCEPT([Part].[Brands].[Brand].Members,
         |  {[Part].[Brands].[Brand].[$top]}), 25,
         |  [Measures].[Revenue]) ON ROWS
         |FROM sales""".stripMargin)
    val sel = Planner.plan(cat, q).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val rest = all.filterNot(_._1 == top)
    val restTotal = rest.map(_._2).sum
    assert(sel.nonEmpty && !sel.exists(_._1 == top))
    val sum = sel.map(_._2).sum
    assert(sum >= 0.25 * restTotal - 1e-6,
      "prefix must cover 25% of the REMAINING set's total")
    assert(sum - sel.map(_._2).min < 0.25 * restTotal + 1e-6, "minimality")
  }

  test("TAIL over a HEAD/SUBSET-paged set is a 400, nested TAILs compose " +
      "as min") {
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |TAIL(HEAD([Geography].[Region].Members, 10), 3) ON ROWS
        |FROM sales""".stripMargin)).status == 400)
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |TAIL(SUBSET([Geography].[Region].Members, 5, 20), 3) ON ROWS
        |FROM sales""".stripMargin)).status == 400)
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |TAIL(TAIL([Geography].[Region].Members, 5), 3) ON ROWS
        |FROM sales""".stripMargin)
    assert(q.tailLimit.contains(3L))
  }

  test("ORDER CurrentMember binds the deepest drilled level of the " +
      "dimension; an explicit level path binds that level") {
    // Year AND Month drilled: the bare dimension form must bind Month
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |ORDER(CROSSJOIN([ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].Members),
        |  [ShipDate].CurrentMember.Key, DESC) ON ROWS
        |FROM sales""".stripMargin)
    assert(q.order.contains(OrderSpec(OrderByLevel(
      LevelRef("ShipDate", Some("Month"), Some("Monthly")), "key"),
      desc = true)))
    // explicit level path picks Year
    val q2 = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |ORDER(CROSSJOIN([ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].Members),
        |  [ShipDate].[Monthly].[Year].CurrentMember.Key, DESC) ON ROWS
        |FROM sales""".stripMargin)
    assert(q2.order.contains(OrderSpec(OrderByLevel(
      LevelRef("ShipDate", Some("Year"), Some("Monthly")), "key"),
      desc = true)))
    // naming an undrilled level is a 400
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |ORDER([ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].CurrentMember.Key, DESC) ON ROWS
        |FROM sales""".stripMargin)).status == 400)
  }

  test("ORDER accepts the member expressions the reference emits: " +
      "Properties('X'), Caption — computed without being projected") {
    // the exact shape query_helper.rb emits for order=property
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |HEAD(ORDER([Part].[Brands].[Part].Members,
        |  [Part].CurrentMember.Properties('Retail Price'), BDESC), 20)
        |ON ROWS
        |FROM sales""".stripMargin)
    assert(q.order.contains(OrderSpec(OrderByLevel(
      LevelRef("Part", Some("Part"), Some("Brands")), "Retail Price"),
      desc = true)))
    val viaMdx = Planner.plan(cat, q).collect()
    // same ordering through the REST-style IR, property NOT projected —
    // the order column rides internally and is dropped from the output
    val viaIr = Planner.plan(cat, CubeQuery("sales",
      Seq(LevelDrill(LevelRef("Part", Some("Part"), Some("Brands")))),
      Seq("revenue"),
      order = Some(OrderSpec(OrderByLevel(
        LevelRef("Part", Some("Part"), Some("Brands")), "Retail Price"),
        desc = true)),
      limit = Some(20))).collect()
    assert(viaMdx.map(_.toSeq).toSeq == viaIr.map(_.toSeq).toSeq)
    assert(viaMdx.head.schema.fieldNames.toSeq ==
      Seq("part", "part_label", "revenue"), "order property must not leak")
    // caption spelling
    val q2 = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Line Count]} ON COLUMNS,
        |ORDER([Geography].[Geography].[Nation].Members,
        |  [Geography].CurrentMember.Caption, BDESC) ON ROWS
        |FROM sales""".stripMargin)
    val rows = Planner.plan(cat, q2).collect()
    val caps = rows.map(_.getString(1))
    assert(caps.toSeq == caps.sortBy(identity)(Ordering[String].reverse).toSeq)
    // ordering by a property of an undrilled dimension is a 400
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |ORDER([Geography].[Region].Members,
        |  [Part].CurrentMember.Properties('Size'), DESC) ON ROWS
        |FROM sales""".stripMargin)).status == 400)
  }

  test("TAIL keeps the last n axis tuples in forward order; HEAD pages " +
      "within the tail") {
    val base = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].Members) ON ROWS
        |FROM sales""".stripMargin)
    val all = Planner.plan(cat, base).collect()
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY TAIL(CROSSJOIN([ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].Members), 3) ON ROWS
        |FROM sales""".stripMargin)
    assert(q.tailLimit.contains(3L))
    val tail3 = Planner.plan(cat, q).collect()
    assert(tail3.map(_.toSeq).toSeq ==
      all.takeRight(3).map(_.toSeq).toSeq)
    // HEAD(TAIL(s, 3), 1) = third-from-last row
    val q2 = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY HEAD(TAIL(CROSSJOIN(
        |  [ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].Members), 3), 1) ON ROWS
        |FROM sales""".stripMargin)
    val one = Planner.plan(cat, q2).collect()
    assert(one.map(_.toSeq).toSeq ==
      all.takeRight(3).take(1).map(_.toSeq).toSeq)
  }

  test("TOPPERCENT keeps the minimal top prefix covering the share; " +
      "TOPSUM is the absolute form; bad thresholds 400") {
    val q = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |TOPPERCENT([Part].[Brands].[Brand].Members, 25,
        |  [Measures].[Revenue]) ON ROWS
        |FROM sales""".stripMargin)
    assert(q.cuts == Seq(TopShareCut(
      LevelRef("Part", Some("Brand"), Some("Brands")), 25.0, "revenue")))
    val all = Planner.plan(cat, CubeQuery("sales",
        Seq(LevelDrill(LevelRef("Part", Some("Brand"), Some("Brands")))),
        Seq("revenue"))).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val total = all.map(_._2).sum
    val sel = Planner.plan(cat, q).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val sum = sel.map(_._2).sum
    assert(sel.nonEmpty && sel.length < all.length)
    // covers the share, and dropping the smallest member would not
    assert(sum >= 0.25 * total - 1e-6)
    assert(sum - sel.map(_._2).min < 0.25 * total + 1e-6)
    // it is a TOP prefix: every selected revenue >= every unselected one
    val selSet = sel.map(_._1).toSet
    val out = all.filterNot(p => selSet(p._1))
    assert(sel.map(_._2).min >= out.map(_._2).max - 1e-9)
    // TOPSUM: absolute threshold spelling
    val q2 = MdxParser.parse(salesCube,
      s"""SELECT {[Measures].[Revenue]} ON COLUMNS,
         |TOPSUM([Part].[Brands].[Brand].Members, ${total / 4},
         |  [Measures].[Revenue]) ON ROWS
         |FROM sales""".stripMargin)
    assert(q2.cuts.exists { case TopShareCut(_, _, "revenue", true, _, _) => true
      case _ => false })
    val sel2 = Planner.plan(cat, q2).collect().map(_.getString(0)).toSet
    assert(sel2 == selSet, "25% of total as TOPSUM selects the same set")
    // BOTTOMPERCENT: the ASCENDING prefix — every selected revenue <=
    // every unselected one, covering the share minimally
    val qb = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |BOTTOMPERCENT([Part].[Brands].[Brand].Members, 10,
        |  [Measures].[Revenue]) ON ROWS
        |FROM sales""".stripMargin)
    assert(qb.cuts.exists {
      case TopShareCut(_, 10.0, "revenue", false, _, true) => true
      case _ => false })
    val selB = Planner.plan(cat, qb).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val sumB = selB.map(_._2).sum
    assert(selB.nonEmpty && selB.length < all.length)
    assert(sumB >= 0.10 * total - 1e-6)
    assert(sumB - selB.map(_._2).max < 0.10 * total + 1e-6)
    val selBSet = selB.map(_._1).toSet
    val outB = all.filterNot(p => selBSet(p._1))
    assert(selB.map(_._2).max <= outB.map(_._2).min + 1e-9)
    // BOTTOMSUM: absolute spelling selects the same ascending prefix
    val qb2 = MdxParser.parse(salesCube,
      s"""SELECT {[Measures].[Revenue]} ON COLUMNS,
         |BOTTOMSUM([Part].[Brands].[Brand].Members, ${sumB - 1e-6},
         |  [Measures].[Revenue]) ON ROWS
         |FROM sales""".stripMargin)
    assert(Planner.plan(cat, qb2).collect().map(_.getString(0)).toSet ==
      selBSet)
    // error contract
    assert(intercept[GraftException](Planner.plan(cat,
      MdxParser.parse(salesCube,
        """SELECT {[Measures].[Revenue]} ON COLUMNS,
          |TOPPERCENT([Part].[Brands].[Brand].Members, 150,
          |  [Measures].[Revenue]) ON ROWS
          |FROM sales""".stripMargin))).status == 400)
    assert(intercept[GraftException](Planner.plan(cat,
      MdxParser.parse(salesCube,
        """SELECT {[Measures].[Revenue]} ON COLUMNS,
          |BOTTOMPERCENT([Part].[Brands].[Brand].Members, 0,
          |  [Measures].[Revenue]) ON ROWS
          |FROM sales""".stripMargin))).status == 400)
  }

  test("Sum(Ytd(), M) reuses the declared running measure; bare Ytd() " +
      "resolves against the cube's single time dimension") {
    val q = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[ytd2] AS 'Sum(Ytd(), [Measures].[Revenue])'
        |SELECT {[Measures].[Revenue], [Measures].[ytd2]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].Members) ON ROWS
        |FROM sales""".stripMargin)
    // (revenue, ShipDate, Year) matches the declared ytd_revenue — no
    // ad-hoc synthesis, the calc is a plain alias of it
    assert(q.adhocCums.isEmpty)
    assert(q.adhocCalcs.map(_.formula) == Seq("ytd_revenue"))
    val rows = Planner.plan(cat, q).collect()
    assert(rows.nonEmpty)
    var year = -1; var acc = BigDecimal(0)
    rows.foreach { r =>
      if (r.getInt(0) != year) { year = r.getInt(0); acc = BigDecimal(0) }
      acc += BigDecimal(r.getDouble(2))
      assert(math.abs(r.getDouble(3) - acc.toDouble) < 1e-6,
        s"Sum(Ytd()) at $year-${r.getInt(1)}")
    }
  }

  test("Sum(PeriodsToDate(level), M) synthesizes an ad-hoc cum measure " +
      "resetting at that level (QTD)") {
    val q = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[qtd] AS
        |  'Sum(PeriodsToDate([ShipDate].[Monthly].[Quarter]),
        |       [Measures].[Revenue])'
        |SELECT {[Measures].[Revenue], [Measures].[qtd]} ON COLUMNS,
        |NON EMPTY CROSSJOIN(CROSSJOIN(
        |  [ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Quarter].Members),
        |  [ShipDate].[Monthly].[Month].Members) ON ROWS
        |FROM sales""".stripMargin)
    assert(q.adhocCums.map(c => (c.base, c.timeDim, c.resetLevel)) ==
      Seq(("revenue", "ShipDate", "Quarter")))
    val rows = Planner.plan(cat, q).collect()
    assert(rows.nonEmpty)
    var key = (-1, -1); var acc = BigDecimal(0)
    rows.foreach { r =>
      val k = (r.getInt(0), r.getInt(1))
      if (k != key) { key = k; acc = BigDecimal(0) }
      acc += BigDecimal(r.getDouble(3))
      assert(math.abs(r.getDouble(4) - acc.toDouble) < 1e-6,
        s"QTD at $key month ${r.getInt(2)}")
    }
    // unknown reset level is a 400
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[x] AS
        |  'Sum(PeriodsToDate([ShipDate].[Decade]), [Measures].[Revenue])'
        |SELECT {[Measures].[x]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS FROM sales""".stripMargin))
      .status == 400)
  }

  test("Avg(LastPeriods(n), M) reuses the declared moving average and " +
      "synthesizes ad-hoc windows for other n") {
    val q = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[ma3] AS
        |  'Avg(LastPeriods(3), [Measures].[Revenue])'
        |MEMBER [Measures].[ma2] AS
        |  'Avg(LastPeriods(2, [ShipDate].CurrentMember), [Measures].[Revenue])'
        |SELECT {[Measures].[Revenue], [Measures].[ma3],
        |  [Measures].[ma2]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].Members) ON ROWS
        |FROM sales""".stripMargin)
    // n=3 matches the declared revenue_3mo_avg; n=2 is ad-hoc
    assert(q.adhocMovings.map(m => (m.base, m.timeDim, m.periods)) ==
      Seq(("revenue", "ShipDate", 2)))
    assert(q.adhocCalcs.map(_.formula) == Seq("revenue_3mo_avg",
      "__mdx_avg_revenue_ShipDate_2"))
    val rows = Planner.plan(cat, q).collect()
    assert(rows.length > 2)
    (1 until rows.length).foreach { i =>
      val want = (rows(i).getDouble(2) + rows(i - 1).getDouble(2)) / 2.0
      assert(math.abs(rows(i).getDouble(4) - want) < 1e-6,
        s"row $i trailing-2 mean")
    }
  }

  test("WITH MEMBER COUNT(level.Members) is the schema reader's member " +
      "count — role-scoped under a role; unknown levels 400 at parse") {
    val orders = cat.cube("orders")
    def q = MdxParser.parse(orders,
      """WITH MEMBER [Measures].[spn] AS
        |  '[Measures].[total_sales] / COUNT([Geography].[Nation].Members)'
        |SELECT {[Measures].[total_sales], [Measures].[spn]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM orders""".stripMargin)
    def denominator(role: Option[String]): Double = {
      val r = Planner.plan(cat, q.copy(role = role)).collect().head
      r.getDouble(2) / r.getDouble(3)
    }
    // 25 nations in the schema; emea sees only regions {0, 3} → the
    // testdata's nation k maps to region k % 5 → 10 visible nations
    assert(math.abs(denominator(None) - 25.0) < 1e-6)
    assert(math.abs(denominator(Some("emea")) - 10.0) < 1e-6)
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[x] AS
        |  'COUNT([Geography].[Bogus].Members)'
        |SELECT {[Measures].[x]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)).status == 400)
    // prefix-alias pair (Month / MonthName): both counts substitute intact
    // — 12 months and 12 month names
    val q2 = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[x] AS
        |  'COUNT([ShipDate].[Monthly].[Month].Members) * 1000 +
        |   COUNT([ShipDate].[MonthNames].[MonthName].Members)'
        |SELECT {[Measures].[Revenue], [Measures].[x]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)
    val v = Planner.plan(cat, q2).collect().head.getDouble(3)
    assert(v == 12012.0, s"got $v")
    // an identifier merely ENDING in Count( is not the COUNT function —
    // clean 400, not a silent rewrite of its tail
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[x] AS
        |  'DistinctCount([Geography].[Region].Members)'
        |SELECT {[Measures].[x]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)).status == 400)
  }

  test("non-finite TOPPERCENT/TOPSUM thresholds and out-of-Int-range or " +
      "garbage HEAD/TAIL/SUBSET counts are 400s, not silent wrong answers") {
    def bad(mdx: String): Unit =
      assert(intercept[GraftException](
        MdxParser.parse(salesCube, mdx)).status == 400, mdx)
    // toDouble accepts 'NaN'/'Infinity'; both must reject at parse time
    Seq("NaN", "Infinity", "-Infinity").foreach { th =>
      bad(s"""SELECT {[Measures].[Revenue]} ON COLUMNS,
             |TOPPERCENT([Part].[Brands].[Brand].Members, $th,
             |  [Measures].[Revenue]) ON ROWS FROM sales""".stripMargin)
      bad(s"""SELECT {[Measures].[Revenue]} ON COLUMNS,
             |TOPSUM([Part].[Brands].[Brand].Members, $th,
             |  [Measures].[Revenue]) ON ROWS FROM sales""".stripMargin)
    }
    // counts above Int.MaxValue would truncate inside limit(); negatives
    // and garbage are garbage — all 400
    val over = (Int.MaxValue.toLong + 1).toString
    Seq(over, "-1", "12x").foreach { n =>
      bad(s"""SELECT {[Measures].[Revenue]} ON COLUMNS,
             |HEAD([Geography].[Region].Members, $n) ON ROWS
             |FROM sales""".stripMargin)
      bad(s"""SELECT {[Measures].[Revenue]} ON COLUMNS,
             |TAIL([Geography].[Region].Members, $n) ON ROWS
             |FROM sales""".stripMargin)
      bad(s"""SELECT {[Measures].[Revenue]} ON COLUMNS,
             |SUBSET([Geography].[Region].Members, $n, 2) ON ROWS
             |FROM sales""".stripMargin)
    }
    // the REST param path shares the discipline
    assert(intercept[GraftException](QueryParser.fromParams(salesCube,
      Map("measures[]" -> Seq("revenue"), "limit" -> Seq(over))))
      .status == 400)
    assert(intercept[GraftException](QueryParser.fromParams(salesCube,
      Map("measures[]" -> Seq("revenue"), "offset" -> Seq("-2"))))
      .status == 400)
  }

  test("Rank: 1-based, descending, ties share a rank, per other-dim group") {
    val rows = Planner.plan(cat, MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[rk] AS
        |  'Rank([Geography].CurrentMember,
        |        [Geography].[Nation].Members, [Measures].[Revenue])'
        |SELECT {[Measures].[Revenue], [Measures].[rk]} ON COLUMNS,
        |NON EMPTY [Geography].[Nation].Members ON ROWS
        |FROM sales""".stripMargin)).collect()
    val byRank = rows.sortBy(_.getLong(rows.head.fieldIndex("rk")))
    val revs = byRank.map(r => r.getDouble(r.fieldIndex("revenue")))
    // rank order is revenue-descending and ranks start at 1
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    assert(byRank.head.getLong(byRank.head.fieldIndex("rk")) == 1L)
    // ties (if any) share a rank; distinct revenues get distinct ranks
    val pairs = rows.map(r =>
      r.getDouble(r.fieldIndex("revenue")) -> r.getLong(r.fieldIndex("rk")))
    assert(pairs.groupBy(_._1).values.forall(g => g.map(_._2).distinct.size == 1))
    // ranking a dimension the query does not drill 400s (the set has no
    // axis context — a silent wrong answer would be worse)
    assert(intercept[GraftException](Planner.plan(cat,
      MdxParser.parse(salesCube,
        """WITH MEMBER [Measures].[rk] AS
          |  'Rank([Part].CurrentMember, [Part].[Brands].[Brand].Members,
          |        [Measures].[Revenue])'
          |SELECT {[Measures].[rk]} ON COLUMNS,
          |NON EMPTY [Geography].[Region].Members ON ROWS
          |FROM sales""".stripMargin))).status == 400)
    // a set level that differs from the drilled level 400s too
    assert(intercept[GraftException](Planner.plan(cat,
      MdxParser.parse(salesCube,
        """WITH MEMBER [Measures].[rk] AS
          |  'Rank([Geography].CurrentMember, [Geography].[Region].Members,
          |        [Measures].[Revenue])'
          |SELECT {[Measures].[Revenue], [Measures].[rk]} ON COLUMNS,
          |NON EMPTY [Geography].[Nation].Members ON ROWS
          |FROM sales""".stripMargin))).status == 400)
    // a calculated-member base 400s at parse time (the window would
    // reference a column computed after it)
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[rk] AS
        |  'Rank([Geography].CurrentMember, [Geography].[Nation].Members,
        |        [Measures].[net])'
        |SELECT {[Measures].[rk]} ON COLUMNS,
        |NON EMPTY [Geography].[Nation].Members ON ROWS
        |FROM sales""".stripMargin)).status == 400)
    // cross-dimension rank and unknown dimensions 400
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[rk] AS
        |  'Rank([Geography].CurrentMember,
        |        [Part].[Brands].[Brand].Members, [Measures].[Revenue])'
        |SELECT {[Measures].[rk]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)).status == 400)
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[rk] AS
        |  'Rank([Nope].CurrentMember, [Nope].[X].Members,
        |        [Measures].[Revenue])'
        |SELECT {[Measures].[rk]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)).status == 400)
  }

  test("Avg/Min/Max set aggregates: axis-window benchmark semantics") {
    val rows = Planner.plan(cat, MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[vs_avg] AS
        |  '[Measures].[Revenue] - AVG([Geography].[Nation].Members,
        |                              [Measures].[Revenue])'
        |MEMBER [Measures].[nmax] AS
        |  'MAX([Geography].[Nation].Members, [Measures].[Revenue])'
        |MEMBER [Measures].[nmin] AS
        |  'MIN([Geography].[Nation].Members, [Measures].[Revenue])'
        |MEMBER [Measures].[nmed] AS
        |  'MEDIAN([Geography].[Nation].Members, [Measures].[Revenue])'
        |SELECT {[Measures].[Revenue], [Measures].[vs_avg],
        |  [Measures].[nmax], [Measures].[nmin], [Measures].[nmed]}
        |  ON COLUMNS,
        |NON EMPTY [Geography].[Nation].Members ON ROWS
        |FROM sales""".stripMargin)).collect()
    def d(r: org.apache.spark.sql.Row, c: String) =
      r.getDouble(r.fieldIndex(c))
    val revs = rows.map(d(_, "revenue"))
    // deviations from the set mean sum to ~0; max/min are the set extremes
    assert(math.abs(rows.map(d(_, "vs_avg")).sum) < 1e-4)
    assert(rows.forall(r => d(r, "nmax") == revs.max))
    assert(rows.forall(r => d(r, "nmin") == revs.min))
    // median sits strictly inside the set's range (all revenues distinct)
    val med = d(rows.head, "nmed")
    assert(rows.forall(r => d(r, "nmed") == med))
    assert(med > revs.min && med < revs.max)
    // a set aggregate over a dimension the query does not drill 400s —
    // the undrilled average would silently be the WRONG member set
    assert(intercept[GraftException](Planner.plan(cat,
      MdxParser.parse(salesCube,
        """WITH MEMBER [Measures].[bavg] AS
          |  'AVG([Part].[Brands].[Brand].Members, [Measures].[Revenue])'
          |SELECT {[Measures].[Revenue], [Measures].[bavg]} ON COLUMNS,
          |NON EMPTY [Geography].[Region].Members ON ROWS
          |FROM sales""".stripMargin))).status == 400)
    // and so does a set level that differs from the drilled level
    assert(intercept[GraftException](Planner.plan(cat,
      MdxParser.parse(salesCube,
        """WITH MEMBER [Measures].[ravg] AS
          |  'AVG([Geography].[Region].Members, [Measures].[Revenue])'
          |SELECT {[Measures].[Revenue], [Measures].[ravg]} ON COLUMNS,
          |NON EMPTY [Geography].[Nation].Members ON ROWS
          |FROM sales""".stripMargin))).status == 400)
    // unknown dimension 400s at parse time
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[x] AS
        |  'AVG([Nope].[X].Members, [Measures].[Revenue])'
        |SELECT {[Measures].[x]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)).status == 400)
  }

  test("FILTER with AND-conjoined conditions; OR rejects") {
    val conj = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |FILTER([Part].[Brands].[Brand].Members,
        |  [Measures].[Revenue] > 1000 AND [Measures].[Quantity] < 90000)
        |  ON ROWS
        |FROM sales""".stripMargin)
    val nested = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |FILTER(FILTER([Part].[Brands].[Brand].Members,
        |  [Measures].[Revenue] > 1000), [Measures].[Quantity] < 90000)
        |  ON ROWS
        |FROM sales""".stripMargin)
    assert(conj == nested && conj.filters.length == 2)
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |FILTER([Part].[Brands].[Brand].Members,
        |  [Measures].[Revenue] > 1000 OR [Measures].[Quantity] < 9)
        |  ON ROWS
        |FROM sales""".stripMargin)).status == 400)
  }

  test("TOPCOUNT over a tuple set is ORDER + HEAD on the axis") {
    val top = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |TOPCOUNT(CROSSJOIN([Geography].[Region].Members,
        |  [ReturnFlag].[ReturnFlag].Members), 4,
        |  [Measures].[Revenue]) ON ROWS
        |FROM sales""".stripMargin)
    val viaOrder = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |HEAD(ORDER(CROSSJOIN([Geography].[Region].Members,
        |  [ReturnFlag].[ReturnFlag].Members),
        |  [Measures].[Revenue], DESC), 4) ON ROWS
        |FROM sales""".stripMargin)
    assert(top == viaOrder)
    val rows = Planner.plan(cat, top).collect()
    assert(rows.length == 4)
    val revs = rows.map(r => r.getDouble(r.fieldIndex("revenue")))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    // BOTTOMCOUNT tuple form ranks ascending
    val bottom = Planner.plan(cat, MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |BOTTOMCOUNT(CROSSJOIN([Geography].[Region].Members,
        |  [ReturnFlag].[ReturnFlag].Members), 2,
        |  [Measures].[Revenue]) ON ROWS
        |FROM sales""".stripMargin)).collect()
    assert(bottom.length == 2)
    val brevs = bottom.map(r => r.getDouble(r.fieldIndex("revenue")))
    assert(brevs.head <= revs.min && brevs.zip(brevs.tail)
      .forall { case (a, b) => a <= b })
    // the single-level form still compiles to a TopKCut (q34 shape)
    val single = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |TOPCOUNT([Part].[Brands].[Brand].Members, 5,
        |  [Measures].[Revenue]) ON ROWS
        |FROM sales""".stripMargin)
    assert(single.cuts.exists(_.isInstanceOf[TopKCut]))
  }

  test("NonEmpty(set[, measure]) folds into the nonempty flag") {
    val base = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY [Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)
    val fn = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NONEMPTY([Geography].[Region].Members) ON ROWS
        |FROM sales""".stripMargin)
    val fnM = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NonEmpty([Geography].[Region].Members, [Measures].[Revenue])
        |  ON ROWS
        |FROM sales""".stripMargin)
    assert(fn == base && fnM == base)
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NonEmpty([Geography].[Region].Members, [Measures].[Nope]) ON ROWS
        |FROM sales""".stripMargin)).status == 400)
  }

  test("IIF and IsEmpty compile; nested IsEmpty 400s") {
    val rows = Planner.plan(cat, MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[flag] AS
        |  'IIF(IsEmpty(([Measures].[Revenue], [ShipDate].PrevMember)),
        |       -1.0, 1.0)'
        |SELECT {[Measures].[Revenue], [Measures].[flag]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].Members) ON ROWS
        |FROM sales""".stripMargin)).collect()
    // pure-literal branches type as DECIMAL in Spark SQL — read numerically
    val flags = rows.map(r => r.get(r.fieldIndex("flag")).toString.toDouble)
    // exactly the first month of the axis has no previous member
    assert(flags.count(_ == -1.0) == 1 && flags.count(_ == 1.0) ==
      rows.length - 1)
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[x] AS
        |  'IIF(IsEmpty(if(true, [Measures].[Revenue], 0)), 0, 1)'
        |SELECT {[Measures].[x]} ON COLUMNS,
        |[Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)).status == 400)
  }

  test("partial-set aggregates: SUM/AVG/MIN over an explicit member list " +
      "restrict the axis window; complete-set braces and mixed levels 400") {
    val rows = Planner.plan(cat, MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[pair] AS
        |  'SUM({[Geography].[Region].[1], [Geography].[Region].[2]},
        |       [Measures].[Revenue])'
        |MEMBER [Measures].[pair_min] AS
        |  'MIN({[Geography].[Region].[1], [Geography].[Region].[2]},
        |       [Measures].[Revenue])'
        |SELECT {[Measures].[Revenue], [Measures].[pair],
        |  [Measures].[pair_min]} ON COLUMNS,
        |NON EMPTY [Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)).collect()
    def d(r: org.apache.spark.sql.Row, c: String) =
      r.getDouble(r.fieldIndex(c))
    val revByRegion = rows.map(r =>
      r.getInt(r.fieldIndex("region")) -> d(r, "revenue")).toMap
    val expect = Seq(1, 2).flatMap(revByRegion.get)
    val dec = (x: Double) =>
      new java.math.BigDecimal(x.toString).setScale(6,
        java.math.RoundingMode.HALF_UP)
    val expectSum = expect.map(dec).reduce(_ add _).doubleValue
    rows.foreach { r =>
      assert(d(r, "pair") == expectSum)
      assert(d(r, "pair_min") == expect.min)
    }
    // Aggregate is the SUM spelling
    val agg = Planner.plan(cat, MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[pair] AS
        |  'AGGREGATE({[Geography].[Region].[1], [Geography].[Region].[2]},
        |             [Measures].[Revenue])'
        |SELECT {[Measures].[pair]} ON COLUMNS,
        |NON EMPTY [Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)).collect()
    assert(agg.forall(r => d(r, "pair") == expectSum))
    // braced complete set 400s with the supported spelling
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[x] AS
        |  'SUM({[Geography].[Region].Members}, [Measures].[Revenue])'
        |SELECT {[Measures].[x]} ON COLUMNS,
        |NON EMPTY [Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)).status == 400)
    // members of different levels 400
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[x] AS
        |  'SUM({[Geography].[Region].[1], [Geography].[Nation].[3]},
        |       [Measures].[Revenue])'
        |SELECT {[Measures].[x]} ON COLUMNS,
        |NON EMPTY [Geography].[Region].Members ON ROWS
        |FROM sales""".stripMargin)).status == 400)
    // set level must match the drilled level at plan time
    assert(intercept[GraftException](Planner.plan(cat, MdxParser.parse(
      salesCube,
      """WITH MEMBER [Measures].[x] AS
        |  'SUM({[Geography].[Region].[1]}, [Measures].[Revenue])'
        |SELECT {[Measures].[x]} ON COLUMNS,
        |NON EMPTY [Geography].[Nation].Members ON ROWS
        |FROM sales""".stripMargin))).status == 400)
  }

  test("member navigation: ANCESTOR/.Parent/FirstChild/OPENINGPERIOD " +
      "resolve to full-path member cuts; wrong directions 400") {
    def plan(mdx: String) =
      Planner.plan(cat, MdxParser.parse(salesCube, mdx))
        .collect().map(_.toSeq).toSeq
    val direct = plan(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY [Part].[Brands].[Brand].Members ON ROWS
        |FROM sales
        |WHERE [Geography].[Region].[3]""".stripMargin)
    // ANCESTOR(nation 3, Region) slicer == cutting region 3 directly
    assert(plan(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY [Part].[Brands].[Brand].Members ON ROWS
        |FROM sales
        |WHERE ANCESTOR([Geography].[Nation].[3], [Geography].[Region])"""
        .stripMargin) == direct)
    // .Parent is ANCESTOR one level up
    assert(plan(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY [Part].[Brands].[Brand].Members ON ROWS
        |FROM sales
        |WHERE [Geography].[Nation].[3].Parent""".stripMargin) == direct)
    // OPENINGPERIOD(Month, 1995) = the FULL PATH (year 1995 AND its first
    // quarter AND month) — never month-1-of-every-year
    val q1995 = CubeQuery("sales",
      Seq(LevelDrill(LevelRef("Geography", Some("Region")))),
      Seq("revenue"), cuts = Seq(
        MemberCut(LevelRef("ShipDate", Some("Year"), Some("Monthly")), 1995),
        MemberCut(LevelRef("ShipDate", Some("Quarter"), Some("Monthly")), 1),
        MemberCut(LevelRef("ShipDate", Some("Month"), Some("Monthly")), 1)))
    assert(plan(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY [Geography].[Region].Members ON ROWS
        |FROM sales
        |WHERE OPENINGPERIOD([ShipDate].[Monthly].[Month],
        |  [ShipDate].[Monthly].[Year].[1995])""".stripMargin) ==
      Planner.plan(cat, q1995).collect().map(_.toSeq).toSeq)
    // FirstChild of year 1995 = its first Quarter
    val firstQ = CubeQuery("sales",
      Seq(LevelDrill(LevelRef("Geography", Some("Region")))),
      Seq("revenue"), cuts = Seq(
        MemberCut(LevelRef("ShipDate", Some("Year"), Some("Monthly")), 1995),
        MemberCut(LevelRef("ShipDate", Some("Quarter"), Some("Monthly")), 1)))
    assert(plan(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY [Geography].[Region].Members ON ROWS
        |FROM sales
        |WHERE [ShipDate].[Monthly].[Year].[1995].FirstChild""".stripMargin) ==
      Planner.plan(cat, firstQ).collect().map(_.toSeq).toSeq)
    // ANCESTOR downward 400s at plan time
    assert(intercept[GraftException](Planner.plan(cat, MdxParser.parse(
      salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY [Part].[Brands].[Brand].Members ON ROWS
        |FROM sales
        |WHERE ANCESTOR([Geography].[Region].[3], [Geography].[Nation])"""
        .stripMargin))).status == 400)
    // top-level member has no parent below All
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY [Part].[Brands].[Brand].Members ON ROWS
        |FROM sales
        |WHERE [Geography].[Region].[3].Parent""".stripMargin)).status == 400)
    // a leaf member has no children
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY [Part].[Brands].[Brand].Members ON ROWS
        |FROM sales
        |WHERE [Geography].[Supplier].[1].FirstChild""".stripMargin))
      .status == 400)
    // cross-hierarchy navigation 400s at plan time
    assert(intercept[GraftException](Planner.plan(cat, MdxParser.parse(
      salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY [Geography].[Region].Members ON ROWS
        |FROM sales
        |WHERE OPENINGPERIOD([ShipDate].[Weekly].[Week],
        |  [ShipDate].[Monthly].[Year].[1995])""".stripMargin))).status == 400)
    // an AMBIGUOUS anchor (Month 6 exists in every Year) 400s instead of
    // silently cutting to an arbitrary parent's path
    assert(intercept[GraftException](Planner.plan(cat, MdxParser.parse(
      salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY [Geography].[Region].Members ON ROWS
        |FROM sales
        |WHERE ANCESTOR([ShipDate].[Monthly].[Month].[6],
        |  [ShipDate].[Monthly].[Year])""".stripMargin)))
      .status == 400)
    // a navigation member as an axis SET drills its target level
    val axis = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |ANCESTOR([Geography].[Nation].[3], [Geography].[Region]) ON ROWS
        |FROM sales""".stripMargin)
    assert(axis.drilldowns ==
      Seq(LevelDrill(LevelRef("Geography", Some("Region")))))
    assert(axis.cuts.exists {
      case NavCut(_, _, t, "ancestor") => t.level.contains("Region")
      case _ => false
    })
  }

  test("GENERATE(set, TOPCOUNT(...)): per-group top-k equals the brute " +
      "per-group recompute, blocks ride in rank order; BOTTOMCOUNT flips " +
      "the direction; malformed forms 400") {
    val rows = Planner.plan(cat, MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  TOPCOUNT([Part].[Brands].[Brand].Members, 2,
        |    [Measures].[Revenue])) ON ROWS
        |FROM sales""".stripMargin)).collect()
    // brute recompute from the plain region × brand axis
    val full = Planner.plan(cat, CubeQuery("sales",
      Seq(LevelDrill(LevelRef("Geography", Some("Region"))),
        LevelDrill(LevelRef("Part", Some("Brand"), Some("Brands")))),
      Seq("revenue"))).collect()
      .map(r => (r.getInt(0), r.getString(2), r.getDouble(3)))
    val expect = full.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (_, g) => g.sortBy(t => (-t._3, t._2)).take(2)
    }
    assert(rows.map(r => (r.getInt(0), r.getString(2), r.getDouble(3)))
      .toSeq == expect.toSeq)
    // per-region blocks arrive contiguous, ranked by measure desc
    rows.grouped(2).foreach { g =>
      assert(g.map(_.getInt(0)).distinct.length == 1)
      assert(g(0).getDouble(3) >= g(1).getDouble(3))
    }
    // BOTTOMCOUNT: the k SMALLEST per group
    val bottom = Planner.plan(cat, MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  BOTTOMCOUNT([Part].[Brands].[Brand].Members, 2,
        |    [Measures].[Revenue])) ON ROWS
        |FROM sales""".stripMargin)).collect()
      .map(r => (r.getInt(0), r.getString(2), r.getDouble(3)))
    val expectB = full.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (_, g) => g.sortBy(t => (t._3, t._2)).take(2)
    }
    assert(bottom.toSeq == expectB.toSeq)
    // error contract: non-TopCount inner set, overlapping dims, bad arity
    for (bad <- Seq(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |GENERATE([Geography].[Geography].[Region].Members,
        |  [Part].[Brands].[Brand].Members) ON ROWS
        |FROM sales""".stripMargin,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |GENERATE([Geography].[Geography].[Region].Members,
        |  TOPCOUNT([Geography].[Geography].[Nation].Members, 2,
        |    [Measures].[Revenue])) ON ROWS
        |FROM sales""".stripMargin,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |GENERATE([Geography].[Geography].[Region].Members) ON ROWS
        |FROM sales""".stripMargin))
      assert(intercept[GraftException](
        Planner.plan(cat, MdxParser.parse(salesCube, bad))).status == 400)
  }

  test("GENERATE + TOPPERCENT/TOPSUM: per-group minimal coverage prefix " +
      "equals the brute recompute (crossing row included); BOTTOMSUM " +
      "orders ascending; bad thresholds 400") {
    val full = Planner.plan(cat, CubeQuery("sales",
      Seq(LevelDrill(LevelRef("Geography", Some("Region"))),
        LevelDrill(LevelRef("Part", Some("Brand"), Some("Brands")))),
      Seq("revenue"))).collect()
      .map(r => (r.getInt(0), r.getString(2), r.getDouble(3)))
    def prefixCover(g: Seq[(Int, String, Double)], target: Double,
        asc: Boolean): Seq[(Int, String, Double)] = {
      val sorted = g.sortBy(t => (if (asc) t._3 else -t._3, t._2))
      var cum = 0.0
      sorted.takeWhile { t => val before = cum; cum += t._3
        before < target }
    }
    val pct = Planner.plan(cat, MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  TOPPERCENT([Part].[Brands].[Brand].Members, 40,
        |    [Measures].[Revenue])) ON ROWS
        |FROM sales""".stripMargin)).collect()
      .map(r => (r.getInt(0), r.getString(2), r.getDouble(3)))
    val expectPct = full.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (_, g) => prefixCover(g.toSeq, 0.40 * g.map(_._3).sum, false)
    }
    assert(pct.toSeq == expectPct.toSeq)
    // every group covers ≥ 40% and dropping its last row would not
    assert(pct.groupBy(_._1).forall { case (k, g) =>
      val tot = full.filter(_._1 == k).map(_._3).sum
      g.map(_._3).sum >= 0.4 * tot - 1e-6 &&
        g.init.map(_._3).sum < 0.4 * tot
    })
    // BOTTOMSUM: ascending minimal prefix reaching an absolute sum
    val bs = Planner.plan(cat, MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  BOTTOMSUM([Part].[Brands].[Brand].Members, 1000000,
        |    [Measures].[Revenue])) ON ROWS
        |FROM sales""".stripMargin)).collect()
      .map(r => (r.getInt(0), r.getString(2), r.getDouble(3)))
    val expectBs = full.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (_, g) => prefixCover(g.toSeq, 1000000.0, true)
    }
    assert(bs.toSeq == expectBs.toSeq)
    for (bad <- Seq("TOPPERCENT([Part].[Brands].[Brand].Members, 150, " +
        "[Measures].[Revenue])",
      "TOPPERCENT([Part].[Brands].[Brand].Members, -5, " +
        "[Measures].[Revenue])",
      "TOPSUM([Part].[Brands].[Brand].Members, xyz, " +
        "[Measures].[Revenue])"))
      assert(intercept[GraftException](MdxParser.parse(salesCube,
        s"""SELECT {[Measures].[Revenue]} ON COLUMNS,
           |GENERATE([Geography].[Geography].[Region].Members,
           |  $bad) ON ROWS
           |FROM sales""".stripMargin)).status == 400)
  }

  test("EXTRACT projects a crossjoin onto the named dims in argument " +
      "order; equals the direct drill under the same slicer; bad forms " +
      "400") {
    val ext = Planner.plan(cat, MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY EXTRACT(
        |  CROSSJOIN([Geography].[Geography].[Nation].Members,
        |    [Part].[Brands].[Brand].Members), [Part]) ON ROWS
        |FROM sales
        |WHERE [Geography].[Geography].[Region].[2]""".stripMargin))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val direct = Planner.plan(cat, CubeQuery("sales",
      Seq(LevelDrill(LevelRef("Part", Some("Brand"), Some("Brands")))),
      Seq("revenue"),
      cuts = Seq(MemberCut(LevelRef("Geography", Some("Region")), 2))))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(ext.toSeq == direct.toSeq && ext.nonEmpty)
    // multi-dim extraction keeps the ARGUMENT order of the dims
    val two = MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |EXTRACT(CROSSJOIN([Geography].[Geography].[Nation].Members,
        |  [Part].[Brands].[Brand].Members), [Part], [Geography]) ON ROWS
        |FROM sales""".stripMargin)
    assert(two.drilldowns == Seq(
      LevelDrill(LevelRef("Part", Some("Brand"), Some("Brands"))),
      LevelDrill(LevelRef("Geography", Some("Nation"), Some("Geography")))))
    assert(two.distinct)
    for (bad <- Seq(
      "EXTRACT([Geography].[Geography].[Nation].Members)",
      "EXTRACT([Geography].[Geography].[Nation].Members, [Nope])",
      "EXTRACT([Geography].[Geography].[Nation].Members, [Part])",
      // a named dimension drilled ONLY via a named set would silently
      // lose its projection (Extract keeps LevelDrills) — must 400, the
      // same guard GENERATE applies
      "EXTRACT(CROSSJOIN([Top Brands], " +
        "[Geography].[Geography].[Nation].Members), [Part])"))
      assert(intercept[GraftException](MdxParser.parse(salesCube,
        s"""SELECT {[Measures].[Revenue]} ON COLUMNS,
           |$bad ON ROWS
           |FROM sales""".stripMargin)).status == 400)
  }

  test("GENERATE inner FILTER is the per-group HAVING idiom: equals the " +
      "axis-level FILTER over the crossjoin (the predicate evaluates in " +
      "the tuple context); AND-conjoined predicates compose; bad forms 400") {
    val gen = Planner.plan(cat, MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  FILTER([Part].[Brands].[Brand].Members,
        |    [Measures].[Revenue] > 200000)) ON ROWS
        |FROM sales""".stripMargin)).collect().map(_.toSeq)
    val flat = Planner.plan(cat, MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY FILTER(
        |  CROSSJOIN([Geography].[Geography].[Region].Members,
        |    [Part].[Brands].[Brand].Members),
        |  [Measures].[Revenue] > 200000) ON ROWS
        |FROM sales""".stripMargin)).collect().map(_.toSeq)
    assert(gen.toSeq == flat.toSeq && gen.nonEmpty)
    // conjunction: tighter than either term alone
    val and = Planner.plan(cat, MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  FILTER([Part].[Brands].[Brand].Members,
        |    [Measures].[Revenue] > 200000 AND
        |    [Measures].[Quantity] > 1500)) ON ROWS
        |FROM sales""".stripMargin)).collect().map(_.toSeq)
    assert(and.length <= gen.length)
    assert(and.toSet.subsetOf(gen.toSet))
    for (bad <- Seq(
      // OR predicates are rejected (disjunctive HAVING not modeled)
      "FILTER([Part].[Brands].[Brand].Members, " +
        "[Measures].[Revenue] > 1 OR [Measures].[Quantity] > 1)",
      // missing condition / unknown measure / junk comparator
      "FILTER([Part].[Brands].[Brand].Members)",
      "FILTER([Part].[Brands].[Brand].Members, [Measures].[Nope] > 1)",
      "FILTER([Part].[Brands].[Brand].Members, [Measures].[Revenue] ?? 1)",
      // inner set drilling the outer dimension is degenerate
      "FILTER([Geography].[Geography].[Nation].Members, " +
        "[Measures].[Revenue] > 1)",
      // named-set drilldowns don't carry a partition position
      "FILTER([Top Brands], [Measures].[Revenue] > 1)"))
      assert(intercept[GraftException](MdxParser.parse(salesCube,
        s"""SELECT {[Measures].[Revenue]} ON COLUMNS,
           |GENERATE([Geography].[Geography].[Region].Members,
           |  $bad) ON ROWS
           |FROM sales""".stripMargin)).status == 400)
  }

  test("GENERATE inner ORDER sorts each group block by the measure with " +
      "no truncation: same rows as the plain crossjoin, block-sorted; " +
      "ASC is the default; bad directions 400") {
    def rowsOf(mdx: String) = Planner.plan(cat,
      MdxParser.parse(salesCube, mdx)).collect().map(_.toSeq)
    val ordered = rowsOf(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  ORDER([Part].[Brands].[Brand].Members,
        |    [Measures].[Revenue], DESC)) ON ROWS
        |FROM sales""".stripMargin)
    val plain = rowsOf(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([Geography].[Geography].[Region].Members,
        |  [Part].[Brands].[Brand].Members) ON ROWS
        |FROM sales""".stripMargin)
    // no truncation: the same tuple set, re-ordered
    assert(ordered.toSet == plain.toSet && ordered.nonEmpty)
    assert(ordered.toSeq != plain.toSeq, "fixture must reorder some block")
    // per-group: revenue non-increasing within each region block, and the
    // blocks themselves arrive in region order
    val byRegion = ordered.map(r =>
      (r.head, r.last.asInstanceOf[Double]))
    assert(byRegion.map(_._1.toString).distinct.toSeq ==
      byRegion.map(_._1.toString).distinct.sorted.toSeq)
    byRegion.groupBy(_._1).values.foreach { g =>
      val revs = g.map(_._2).toSeq
      assert(revs == revs.sortBy(-_), s"block not sorted desc: $revs")
    }
    // default direction is ASC — the exact reverse of each DESC block
    // (ties impossible at this fixture's revenue precision)
    val asc = rowsOf(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  ORDER([Part].[Brands].[Brand].Members,
        |    [Measures].[Revenue])) ON ROWS
        |FROM sales""".stripMargin)
    assert(asc.toSet == ordered.toSet)
    for (bad <- Seq(
      "ORDER([Part].[Brands].[Brand].Members, [Measures].[Revenue], UP)",
      "ORDER([Part].[Brands].[Brand].Members)",
      "ORDER([Part].[Brands].[Brand].Members, [Part].[Brands].[Brand])"))
      assert(intercept[GraftException](MdxParser.parse(salesCube,
        s"""SELECT {[Measures].[Revenue]} ON COLUMNS,
           |GENERATE([Geography].[Geography].[Region].Members,
           |  $bad) ON ROWS
           |FROM sales""".stripMargin)).status == 400)
  }

  test("GENERATE composes FILTER inside the ranked forms: " +
      "TOPCOUNT(FILTER(set, pred), k, m) prunes tuples BEFORE the " +
      "per-group ranking, TOPPERCENT totals the filtered set, and " +
      "ORDER(FILTER(...)) sorts the survivors") {
    def rowsOf(mdx: String) = Planner.plan(cat,
      MdxParser.parse(salesCube, mdx)).collect().map(_.toSeq)
    val composed = rowsOf(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  TOPCOUNT(FILTER([Part].[Brands].[Brand].Members,
        |    [Measures].[Quantity] > 1500), 2,
        |    [Measures].[Revenue])) ON ROWS
        |FROM sales""".stripMargin)
    // reference semantics by hand: filter the (region, brand) pairs by
    // quantity, THEN take each region's top-2 by revenue — reproduce
    // from the two uncomposed queries
    val filtered = rowsOf(
      """SELECT {[Measures].[Revenue], [Measures].[Quantity]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  FILTER([Part].[Brands].[Brand].Members,
        |    [Measures].[Quantity] > 1500)) ON ROWS
        |FROM sales""".stripMargin)
    val expect = filtered
      .map(r => (r.head.toString, r(1), r(2), r(3).asInstanceOf[Double]))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .flatMap { case (_, g) =>
        g.sortBy(x => (-x._4, x._3.toString)).take(2)
      }
      .map(x => Seq(x._1.toLong, x._2, x._3, x._4))
    assert(composed.map(_.mkString("|")).toSeq ==
      expect.map(_.mkString("|")).toSeq)
    assert(composed.nonEmpty)
    // the filter binds BEFORE the rank: some region's top-2 must differ
    // from the unfiltered top-2 (the fixture guarantees at least one
    // brand with top-2 revenue but quantity <= 1500 somewhere)
    val plainTop = rowsOf(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  TOPCOUNT([Part].[Brands].[Brand].Members, 2,
        |    [Measures].[Revenue])) ON ROWS
        |FROM sales""".stripMargin)
    assert(composed.map(_.mkString("|")).toSeq !=
      plainTop.map(_.mkString("|")).toSeq,
      "fixture must make the filter change at least one region's top-2")
    // TOPPERCENT over a filtered set: the survivors of each group form
    // the 100% total, so a 100% threshold returns exactly the FILTER form
    val pct100 = rowsOf(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  TOPPERCENT(FILTER([Part].[Brands].[Brand].Members,
        |    [Measures].[Quantity] > 1500), 100,
        |    [Measures].[Revenue])) ON ROWS
        |FROM sales""".stripMargin)
    val justFilter = rowsOf(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  FILTER([Part].[Brands].[Brand].Members,
        |    [Measures].[Quantity] > 1500)) ON ROWS
        |FROM sales""".stripMargin)
    assert(pct100.map(_.mkString("|")).toSet ==
      justFilter.map(_.mkString("|")).toSet)
    // ORDER over a filtered set: same rows as FILTER, block-sorted
    val ordFilter = rowsOf(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  ORDER(FILTER([Part].[Brands].[Brand].Members,
        |    [Measures].[Quantity] > 1500),
        |    [Measures].[Revenue], DESC)) ON ROWS
        |FROM sales""".stripMargin)
    assert(ordFilter.map(_.mkString("|")).toSet ==
      justFilter.map(_.mkString("|")).toSet)
    // malformed composed forms 400
    for (bad <- Seq(
      "TOPCOUNT(FILTER([Part].[Brands].[Brand].Members), 2, " +
        "[Measures].[Revenue])",
      "TOPCOUNT(FILTER([Part].[Brands].[Brand].Members, " +
        "[Measures].[Revenue] > 1 OR [Measures].[Quantity] > 1), 2, " +
        "[Measures].[Revenue])"))
      assert(intercept[GraftException](MdxParser.parse(salesCube,
        s"""SELECT {[Measures].[Revenue]} ON COLUMNS,
           |GENERATE([Geography].[Geography].[Region].Members,
           |  $bad) ON ROWS
           |FROM sales""".stripMargin)).status == 400)
  }

  test("axis-level FILTER wrapping a truncating GENERATE evaluates AFTER " +
      "the per-group top-k (a failing top-2 member drops, rank 3 is NOT " +
      "promoted) — the opposite of the composed inner FILTER; FILTER " +
      "over a paged set 400s") {
    def rowsOf(mdx: String) = Planner.plan(cat,
      MdxParser.parse(salesCube, mdx)).collect().map(_.mkString("|"))
    val top2 = rowsOf(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  TOPCOUNT([Part].[Brands].[Brand].Members, 2,
        |    [Measures].[Revenue])) ON ROWS
        |FROM sales""".stripMargin)
    val outer = rowsOf(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY FILTER(
        |  GENERATE([Geography].[Geography].[Region].Members,
        |    TOPCOUNT([Part].[Brands].[Brand].Members, 2,
        |      [Measures].[Revenue])),
        |  [Measures].[Avg Discount] > 0.05) ON ROWS
        |FROM sales""".stripMargin)
    val innerComposed = rowsOf(
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  TOPCOUNT(FILTER([Part].[Brands].[Brand].Members,
        |    [Measures].[Avg Discount] > 0.05), 2,
        |    [Measures].[Revenue])) ON ROWS
        |FROM sales""".stripMargin)
    // outer FILTER: a strict subset of the UNfiltered top-2 (members
    // drop, nothing is promoted in) — Mondrian evaluates Generate first
    assert(outer.toSet.subsetOf(top2.toSet))
    assert(outer.nonEmpty && outer.length < top2.length,
      "fixture must drop at least one top-2 member")
    // the composed inner form back-fills from below the original top-2,
    // so the two forms genuinely differ on this fixture
    assert(innerComposed.toSet != outer.toSet,
      "fixture must distinguish filter-then-rank from rank-then-filter")
    assert(innerComposed.exists(r => !top2.toSet.contains(r)),
      "inner form must promote a sub-top-2 member somewhere")
    // FILTER over a HEAD/SUBSET/TAIL-paged set cannot evaluate after the
    // paging in this planner — explicit 400, never a silent pre-filter
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |FILTER(HEAD([Part].[Brands].[Brand].Members, 5),
        |  [Measures].[Revenue] > 1) ON ROWS
        |FROM sales""".stripMargin)).status == 400)
  }

  test("GENERATE ranks by a measure NOT on COLUMNS (it rides the " +
      "aggregation internally); TOPCOUNT 0 inside GENERATE is an empty " +
      "axis, never a planner crash") {
    // rank brands by Quantity, display Revenue — the idiomatic
    // rank-by-one-show-another Mondrian query
    val rows = Planner.plan(cat, MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  TOPCOUNT([Part].[Brands].[Brand].Members, 2,
        |    [Measures].[Quantity])) ON ROWS
        |FROM sales""".stripMargin))
    assert(rows.columns.toSeq ==
      Seq("region", "region_label", "brand", "revenue"))
    val got = rows.collect()
      .map(r => (r.getInt(0), r.getString(2), r.getDouble(3)))
    val full = Planner.plan(cat, CubeQuery("sales",
      Seq(LevelDrill(LevelRef("Geography", Some("Region"))),
        LevelDrill(LevelRef("Part", Some("Brand"), Some("Brands")))),
      Seq("revenue", "sum_qty"))).collect()
      .map(r => (r.getInt(0), r.getString(2), r.getDouble(3),
        r.getDouble(4)))
    val expect = full.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (_, g) => g.sortBy(t => (-t._4, t._2)).take(2)
        .map(t => (t._1, t._2, t._3))
    }
    assert(got.toSeq == expect.toSeq)
    // k = 0: empty per-group set → empty axis (the axis-level TOPCOUNT 0
    // contract), not GroupedTopK's require(k >= 1)
    val empty = Planner.plan(cat, MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
        |  TOPCOUNT([Part].[Brands].[Brand].Members, 0,
        |    [Measures].[Revenue])) ON ROWS
        |FROM sales""".stripMargin)).collect()
    assert(empty.isEmpty)
  }

  test("GENERATE with a multi-level outer set partitions on the full " +
      "outer tuple") {
    val rows = Planner.plan(cat, MdxParser.parse(salesCube,
      """SELECT {[Measures].[Revenue]} ON COLUMNS,
        |NON EMPTY GENERATE(
        |  CROSSJOIN([Geography].[Geography].[Region].Members,
        |    [ShipDate].[Monthly].[Year].Members),
        |  TOPCOUNT([Part].[Brands].[Brand].Members, 2,
        |    [Measures].[Revenue])) ON ROWS
        |FROM sales""".stripMargin)).collect()
      .map(r => (r.getInt(0), r.getInt(2), r.getString(3), r.getDouble(4)))
    val full = Planner.plan(cat, CubeQuery("sales",
      Seq(LevelDrill(LevelRef("Geography", Some("Region"))),
        LevelDrill(LevelRef("ShipDate", Some("Year"), Some("Monthly"))),
        LevelDrill(LevelRef("Part", Some("Brand"), Some("Brands")))),
      Seq("revenue"))).collect()
      .map(r => (r.getInt(0), r.getInt(2), r.getString(3), r.getDouble(4)))
    val expect = full.groupBy(t => (t._1, t._2)).toSeq.sortBy(_._1)
      .flatMap { case (_, g) => g.sortBy(t => (-t._4, t._3)).take(2) }
    assert(rows.toSeq == expect.toSeq)
    // every (region, year) block has at most 2 rows
    assert(rows.groupBy(t => (t._1, t._2)).forall(_._2.length <= 2))
  }

  test("NextMember/Lead(n) look forward; the time domain expands past " +
      "the cut") {
    val q = MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[next_rev] AS
        |  '([Measures].[Revenue], [ShipDate].NextMember)'
        |MEMBER [Measures].[rev_in_3mo] AS
        |  '([Measures].[Revenue], [ShipDate].CurrentMember.Lead(3))'
        |SELECT {[Measures].[Revenue], [Measures].[next_rev],
        |  [Measures].[rev_in_3mo]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].Members) ON ROWS
        |FROM sales""".stripMargin)
    assert(q.adhocLags.map(_.periods).sorted == Seq(-3, -1))
    // out-of-Int periods 400 at parse (never a NumberFormatException 500)
    assert(intercept[GraftException](MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[x] AS
        |  '([Measures].[Revenue], [ShipDate].CurrentMember.Lead(99999999999))'
        |SELECT {[Measures].[x]} ON COLUMNS,
        |NON EMPTY [ShipDate].[Monthly].[Month].Members ON ROWS
        |FROM sales""".stripMargin)).status == 400)
    // [Dim].[Hierarchy].Members names the HIERARCHY's drilled level (the
    // standard multi-hierarchy set spelling), not a level called 'Monthly'
    val hierSet = Planner.plan(cat, MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[mrank] AS
        |  'Rank([ShipDate].CurrentMember, [ShipDate].[Monthly].Members,
        |        [Measures].[Revenue])'
        |SELECT {[Measures].[Revenue], [Measures].[mrank]} ON COLUMNS,
        |NON EMPTY [ShipDate].[Monthly].[Month].Members ON ROWS
        |FROM sales
        |WHERE [ShipDate].[Monthly].[Year].[1995]""".stripMargin)).collect()
    assert(hierSet.nonEmpty &&
      hierSet.map(_.getLong(hierSet.head.fieldIndex("mrank"))).sorted
        .sameElements(1L to hierSet.length))
    val rows = Planner.plan(cat, q).collect()
    def ym(r: org.apache.spark.sql.Row) =
      (r.getInt(r.fieldIndex("ship_year")), r.getInt(r.fieldIndex("ship_month")))
    val revByYm = rows.map(r =>
      ym(r) -> r.getDouble(r.fieldIndex("revenue"))).toMap
    def next(y: Int, m: Int, k: Int): (Int, Int) = {
      val t = y * 12 + (m - 1) + k; (t / 12, t % 12 + 1)
    }
    // month axis is gap-free at this sf: next_rev(i) == revenue(i+1 month)
    rows.foreach { r =>
      val (y, m) = ym(r)
      val nr = r.fieldIndex("next_rev")
      if (revByYm.contains(next(y, m, 1)))
        assert(r.getDouble(nr) == revByYm(next(y, m, 1)))
      else assert(r.isNullAt(nr))
      val l3 = r.fieldIndex("rev_in_3mo")
      if (revByYm.contains(next(y, m, 3)))
        assert(r.getDouble(l3) == revByYm(next(y, m, 3)))
      else assert(r.isNullAt(l3))
    }
    // cut to month 6: the forward domain expansion still reaches month 7
    // (off-axis), so next_rev at (y, 6) equals the uncut (y, 7) revenue
    val cut = Planner.plan(cat, MdxParser.parse(salesCube,
      """WITH MEMBER [Measures].[next_rev] AS
        |  '([Measures].[Revenue], [ShipDate].NextMember)'
        |SELECT {[Measures].[Revenue], [Measures].[next_rev]} ON COLUMNS,
        |NON EMPTY CROSSJOIN([ShipDate].[Monthly].[Year].Members,
        |  [ShipDate].[Monthly].[Month].Members) ON ROWS
        |FROM sales
        |WHERE [ShipDate].[Monthly].[Month].[6]""".stripMargin)).collect()
    assert(cut.nonEmpty && cut.forall(r =>
      r.getInt(r.fieldIndex("ship_month")) == 6))
    cut.foreach { r =>
      val (y, _) = ym(r)
      if (revByYm.contains((y, 7)))
        assert(r.getDouble(r.fieldIndex("next_rev")) == revByYm((y, 7)))
    }
  }
}
