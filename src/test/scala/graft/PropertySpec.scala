package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.planner._
import SparkTestSession.{catalog => cat}

/** Property-based invariants over randomized cube queries (SURVEY §5: an
  * upgrade over the reference's example-based tests). Deterministic seeded
  * sampling (the scalatest⇄scalacheck bridge isn't in the offline cache),
  * real execution per sample. */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 8)(body: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var found = 0
    var i = 0
    while (found < n && i < n * 10) {
      g.apply(params, Seed(42L + i)).foreach { a => body(a); found += 1 }
      i += 1
    }
    assert(found == n, s"could only generate $found/$n samples")
  }

  private val levelGen: Gen[LevelRef] = Gen.oneOf(
    LevelRef("Geography", Some("Region")),
    LevelRef("Geography", Some("Nation")),
    LevelRef("Part", Some("Brand"), Some("Brands")),
    LevelRef("ReturnFlag", Some("ReturnFlag")),
    LevelRef("LineStatus", Some("LineStatus")),
    LevelRef("ShipDate", Some("Year"), Some("Monthly")))

  private val drillsGen: Gen[Seq[LevelRef]] = for {
    n <- Gen.choose(1, 3)
    ls <- Gen.pick(n, Seq(
      LevelRef("Geography", Some("Nation")),
      LevelRef("Part", Some("Brand"), Some("Brands")),
      LevelRef("ReturnFlag", Some("ReturnFlag")),
      LevelRef("LineStatus", Some("LineStatus")),
      LevelRef("ShipDate", Some("Year"), Some("Monthly"))))
  } yield ls.toSeq

  private val cutGen: Gen[Cut] = Gen.oneOf(
    Gen.oneOf(0, 1, 2, 3, 4).map(k =>
      MemberCut(LevelRef("Geography", Some("Region")), k)),
    Gen.someOf(Seq("A", "N", "R")).suchThat(_.nonEmpty).map(ks =>
      SetCut(LevelRef("ReturnFlag", Some("ReturnFlag")), ks.toSeq)),
    Gen.choose(1995, 1999).map(y =>
      RangeCut(LevelRef("ShipDate", Some("Year"), Some("Monthly")), y, y + 2)))

  private val grandTotal: Double =
    Planner.plan(cat, CubeQuery("sales", Nil, Seq("revenue")))
      .collect()(0).getDouble(0)

  test("additivity: any drilldown's revenues sum to the grand total") {
    forAll(drillsGen) { drills =>
      val df = Planner.plan(cat, CubeQuery("sales",
        drills.map(LevelDrill(_)), Seq("revenue")))
      val cols = df.columns.length
      val total = df.collect().map(_.getDouble(cols - 1)).sum
      assert(math.abs(total - grandTotal) < 1e-4,
        s"drills=$drills total=$total grand=$grandTotal")
    }
  }

  test("share-of-parent fractions sum to 1 within every region (q46)") {
    val rows = SparkEntry.queries("q46_share_of_parent")(
      SparkTestSession.spark, SparkTestSession.sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (region, rs) =>
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-9, s"$region shares sum to $s")
    }
  }

  test("MDX parent-total invariants under random extra drills and " +
      "month cuts: every cell's parent total equals its region group sum") {
    val gen = for {
      extra <- Gen.someOf(Seq(
        LevelRef("Part", Some("Brand"), Some("Brands")),
        LevelRef("ReturnFlag", Some("ReturnFlag"))))
      months <- Gen.someOf(1 to 12)
    } yield (extra.toSeq, months.toSeq.sorted)
    forAll(gen, n = 6) { case (extra, months) =>
      val q = CubeQuery("sales",
        (Seq(LevelRef("Geography", Some("Region")),
          LevelRef("Geography", Some("Nation"))) ++ extra)
          .map(LevelDrill(_)),
        Seq("revenue", "ptot"),
        cuts = if (months.isEmpty) Nil
          else Seq(SetCut(LevelRef("ShipDate", Some("Month"),
            Some("Monthly")), months)),
        adhocTotals = Seq(graft.model.TotalMeasureDef(
          "ptot", "revenue", "Geography", parent = true)))
      val df = Planner.plan(cat, q)
      val cols = df.columns
      val rIdx = cols.indexOf("revenue")
      val pIdx = cols.indexOf("ptot")
      val gIdx = cols.indices.filterNot(i =>
        Seq("nation", "nation_label", "revenue", "ptot").contains(cols(i)))
      val rows = df.collect()
      assert(rows.nonEmpty, s"extra=$extra months=$months")
      rows.groupBy(r => gIdx.map(r.get)).foreach { case (g, rs) =>
        val tot = rs.map(_.getDouble(rIdx)).sum
        rs.foreach(r => assert(math.abs(r.getDouble(pIdx) - tot) < 1e-6,
          s"group $g: ptot=${r.getDouble(pIdx)} sum=$tot " +
            s"(extra=$extra months=$months)"))
      }
    }
  }

  test("domain-exact lag invariants under random month-set cuts (B8)") {
    // the round-4 semantic gap: lag must reference the CALENDAR-previous
    // member of the time domain, never "the previous month present on this
    // partition's axis". For any random month subset cut (and optionally a
    // region partition), every output row's prev_revenue must equal the
    // UNCUT query's value at the hierarchy-previous member — null exactly
    // when that member has no data for the partition or is the domain head.
    def key(r: org.apache.spark.sql.Row, reg: Boolean): (Any, Int, Int) =
      if (reg) (r.getInt(0), r.getInt(2), r.getInt(3))
      else ((), r.getInt(0), r.getInt(1))
    def timeDrills = Seq(drill("ShipDate", "Year", "Monthly"),
      drill("ShipDate", "Month", "Monthly"))
    def drill(d: String, l: String, h: String) =
      LevelDrill(LevelRef(d, Some(l), Some(h)))
    val domain: Seq[(Int, Int)] = Planner.plan(cat, CubeQuery("sales",
        timeDrills, Seq("revenue"))).collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted
    val prevMember: Map[(Int, Int), (Int, Int)] =
      domain.zip(domain.drop(1)).map { case (p, m) => m -> p }.toMap
    for (withRegion <- Seq(false, true)) {
      val drills0 =
        if (withRegion) Seq(drill("Geography", "Region", "Geography"))
        else Nil
      val uncut = Planner.plan(cat, CubeQuery("sales",
          drills0 ++ timeDrills, Seq("revenue", "prev_revenue"))).collect()
      val uncutRev = uncut.map(r => key(r, withRegion) ->
        r.getDouble(if (withRegion) 4 else 2)).toMap
      forAll(Gen.someOf(1 to 12).suchThat(_.nonEmpty), n = 4) { monthsRaw =>
        val months = monthsRaw.toSeq.sorted
        val rows = Planner.plan(cat, CubeQuery("sales",
          drills0 ++ timeDrills, Seq("revenue", "prev_revenue"),
          cuts = Seq(SetCut(LevelRef("ShipDate", Some("Month"),
            Some("Monthly")), months)))).collect()
        // axis = exactly the uncut keys in the cut months (value-invariant)
        val got = rows.map(r => key(r, withRegion)).toSet
        val want = uncutRev.keySet.filter(k => months.contains(k._3))
        assert(got == want, s"months=$months region=$withRegion axis")
        rows.foreach { r =>
          val k = key(r, withRegion)
          val (revI, prevI) = if (withRegion) (4, 5) else (2, 3)
          assert(r.getDouble(revI) == uncutRev(k), s"$k revenue changed")
          prevMember.get((k._2, k._3))
            .flatMap(p => uncutRev.get((k._1, p._1, p._2))) match {
            case Some(v) => assert(r.getDouble(prevI) == v, s"$k prev")
            case None => assert(r.isNullAt(prevI), s"$k prev should be null")
          }
        }
      }
    }
  }

  test("share-of-total invariants under random drills and cuts") {
    // for any drill combination including Geography and any cut on OTHER
    // dims: within each non-Geography coordinate, totals are constant,
    // equal the coordinate's revenue sum, and shares sum to 1
    val otherCutGen: Gen[Option[Cut]] = Gen.oneOf(
      Gen.const(None),
      Gen.someOf(Seq("A", "N", "R")).suchThat(_.nonEmpty).map(ks =>
        Some(SetCut(LevelRef("ReturnFlag", Some("ReturnFlag")), ks.toSeq))))
    val geoLevel: Gen[LevelRef] = Gen.oneOf(
      LevelRef("Geography", Some("Region")), LevelRef("Geography", Some("Nation")))
    val otherDrill: Gen[Option[LevelRef]] = Gen.oneOf(
      None, Some(LevelRef("ReturnFlag", Some("ReturnFlag"))),
      Some(LevelRef("LineStatus", Some("LineStatus"))))
    forAll(Gen.zip(geoLevel, otherDrill, otherCutGen)) {
      case (geo, other, cut) =>
        val drills = (Seq(geo) ++ other.toSeq).map(LevelDrill(_))
        val rows = Planner.plan(cat, CubeQuery("sales", drills,
          Seq("revenue", "revenue_geo_total", "revenue_geo_share"),
          cuts = cut.toSeq)).collect()
        assert(rows.nonEmpty)
        val nCols = rows.head.length
        val (revI, totI, shareI) = (nCols - 3, nCols - 2, nCols - 1)
        // group by the non-geo coordinate: geo drills lead the axis with
        // (key, label); the remaining axis columns are the other dim's
        rows.groupBy(r => (2 until revI).map(r.get)).values
          .foreach { part =>
            val total = part.head.getDouble(totI)
            assert(part.forall(r => math.abs(r.getDouble(totI) - total) < 1e-6),
              "total must be constant within a partition")
            val sumRev = part.map(r => BigDecimal(r.getDouble(revI))).sum
            assert(math.abs(sumRev.toDouble - total) < 1e-6)
            assert(math.abs(part.map(_.getDouble(shareI)).sum - 1.0) < 1e-9)
          }
    }
  }

  test("rank and set-aggregate invariants under random drills and cuts") {
    import graft.model.{RankMeasureDef, SetAggMeasureDef}
    val otherCutGen: Gen[Option[Cut]] = Gen.oneOf(
      Gen.const(None),
      Gen.someOf(Seq("A", "N", "R")).suchThat(_.nonEmpty).map(ks =>
        Some(SetCut(LevelRef("ReturnFlag", Some("ReturnFlag")), ks.toSeq))))
    val geoLevel: Gen[LevelRef] = Gen.oneOf(
      LevelRef("Geography", Some("Region")),
      LevelRef("Geography", Some("Nation")))
    val otherDrill: Gen[Option[LevelRef]] = Gen.oneOf(
      None, Some(LevelRef("ReturnFlag", Some("ReturnFlag"))),
      Some(LevelRef("LineStatus", Some("LineStatus"))))
    forAll(Gen.zip(geoLevel, otherDrill, otherCutGen)) {
      case (geo, other, cut) =>
        val drills = (Seq(geo) ++ other.toSeq).map(LevelDrill(_))
        val rows = Planner.plan(cat, CubeQuery("sales", drills,
          Seq("revenue", "rk", "sa_avg", "sa_min", "sa_max"),
          cuts = cut.toSeq,
          adhocRanks = Seq(RankMeasureDef("rk", "revenue", "Geography")),
          adhocSetAggs = Seq(
            SetAggMeasureDef("sa_avg", "revenue", "Geography", "avg"),
            SetAggMeasureDef("sa_min", "revenue", "Geography", "min"),
            SetAggMeasureDef("sa_max", "revenue", "Geography", "max"))))
          .collect()
        assert(rows.nonEmpty)
        val nCols = rows.head.length
        val (revI, rkI, avgI, minI, maxI) =
          (nCols - 5, nCols - 4, nCols - 3, nCols - 2, nCols - 1)
        // within each non-geo coordinate: RANK = 1 + #strictly-greater,
        // min/max are the set extremes, avg·n reproduces the exact sum
        rows.groupBy(r => (2 until revI).map(r.get)).values.foreach { part =>
          val revs = part.map(_.getDouble(revI))
          part.foreach { r =>
            val rev = r.getDouble(revI)
            assert(r.getLong(rkI) == 1L + revs.count(_ > rev),
              "rank must count strictly-greater members (ties share)")
            assert(r.getDouble(minI) == revs.min)
            assert(r.getDouble(maxI) == revs.max)
            assert(math.abs(r.getDouble(avgI) * revs.length -
              revs.map(BigDecimal(_)).sum.toDouble) < 1e-4)
          }
        }
    }
  }

  test("a cut never increases any group's value, and filters the axis") {
    forAll(Gen.zip(drillsGen, cutGen)) { case (drills, cut) =>
      val base = CubeQuery("sales", drills.map(LevelDrill(_)), Seq("revenue"))
      val free = Planner.plan(cat, base).collect()
      val cutQ = try Some(Planner.plan(cat, base.copy(cuts = Seq(cut)))
        .collect())
      catch { case e: graft.model.GraftException => None } // ascendant guard
      cutQ.foreach { cutRows =>
        val freeMap = free.map(r =>
          r.toSeq.dropRight(1) -> r.getDouble(r.length - 1)).toMap
        assert(cutRows.length <= free.length)
        cutRows.foreach { r =>
          val key = r.toSeq.dropRight(1)
          val v = r.getDouble(r.length - 1)
          freeMap.get(key).foreach(fv => assert(v <= fv + 1e-6,
            s"cut=$cut key=$key cutVal=$v freeVal=$fv"))
        }
      }
    }
  }

  test("nonempty is always a key-subset of dense with identical cells") {
    forAll(drillsGen) { drills =>
      val q = CubeQuery("sales", drills.map(LevelDrill(_)), Seq("revenue"))
      val sparse = Planner.plan(cat, q.copy(nonempty = true)).collect()
      val dense = Planner.plan(cat, q.copy(nonempty = false)).collect()
      assert(sparse.length <= dense.length)
      val denseMap = dense.map(r =>
        r.toSeq.dropRight(1) -> r.get(r.length - 1)).toMap
      sparse.foreach { r =>
        assert(denseMap(r.toSeq.dropRight(1)) == r.get(r.length - 1))
      }
    }
  }

  test("HAVING output rows all satisfy the predicate and appear in the base") {
    forAll(Gen.zip(drillsGen, Gen.choose(1.0e5, 5.0e7))) {
      case (drills, threshold) =>
        val base = CubeQuery("sales", drills.map(LevelDrill(_)), Seq("revenue"))
        val all = Planner.plan(cat, base).collect()
          .map(r => r.toSeq.dropRight(1) -> r.getDouble(r.length - 1)).toMap
        val kept = Planner.plan(cat, base.copy(
          filters = Seq(MeasureFilter("revenue", ">", threshold)))).collect()
        kept.foreach { r =>
          val v = r.getDouble(r.length - 1)
          assert(v > threshold)
          assert(all(r.toSeq.dropRight(1)) == v)
        }
        assert(kept.length == all.values.count(_ > threshold))
    }
  }

  test("pagination partitions the ordered axis") {
    forAll(Gen.zip(levelGen, Gen.choose(0, 6), Gen.choose(1, 5))) {
      case (level, offset, limit) =>
        val base = CubeQuery("sales", Seq(LevelDrill(level)), Seq("revenue"))
        val all = Planner.plan(cat, base).collect().map(_.toSeq)
        val page = Planner.plan(cat, base.copy(offset = offset,
          limit = Some(limit))).collect().map(_.toSeq)
        assert(page.toSeq == all.slice(offset, offset + limit).toSeq)
    }
  }

  test("TopPercent invariants under random thresholds: top prefix, " +
      "coverage, minimality, monotone in p") {
    val brandRef = LevelRef("Part", Some("Brand"), Some("Brands"))
    val all = Planner.plan(cat, CubeQuery("sales",
        Seq(LevelDrill(brandRef)), Seq("revenue"))).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val total = all.map(_._2).sum
    var prevSel = Set.empty[String]
    var prevP = 0.0
    forAll(Gen.choose(5, 95).map(_.toDouble), n = 6) { p =>
      val sel = Planner.plan(cat, CubeQuery("sales",
          Seq(LevelDrill(brandRef)), Seq("revenue"),
          cuts = Seq(TopShareCut(brandRef, p, "revenue"))))
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      val sum = sel.map(_._2).sum
      assert(sum >= p / 100.0 * total - 1e-6, s"p=$p coverage")
      assert(sel.length == all.length ||
        sum - sel.map(_._2).min < p / 100.0 * total + 1e-6, s"p=$p minimality")
      // top prefix: every selected revenue >= every unselected one
      val s = sel.map(_._1).toSet
      val out = all.filterNot(x => s(x._1))
      if (out.nonEmpty)
        assert(sel.map(_._2).min >= out.map(_._2).max - 1e-9, s"p=$p prefix")
      // monotone: a larger p can only grow the selection
      if (p >= prevP) assert(prevSel.subsetOf(s), s"p=$p monotone")
      else assert(s.subsetOf(prevSel), s"p=$p monotone (shrink)")
      prevSel = s; prevP = p
    }
  }
}
