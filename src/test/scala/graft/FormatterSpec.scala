package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.planner._
import graft.result._
import SparkTestSession.{catalog => cat}

/** Result-shaping tests: tidy headers/CSV (C5/C8 contract —
  * spec/fixtures/webshop_1.csv shape), axes JSON (C1), JSON writer. */
class FormatterSpec extends AnyFunSuite {

  private def drill(d: String, l: String = null, h: String = null) =
    LevelDrill(LevelRef(d, Option(l), Option(h)))

  private val q2 = CubeQuery("sales",
    Seq(drill("Geography", "Region"), drill("Part", "Brand", "Brands")),
    Seq("revenue", "sum_qty"))

  test("tidy headers follow the ID/caption pair contract (C5)") {
    val t = Formatters.tidy(cat, q2)
    assert(t.headers == Seq("ID Region", "Region", "ID Brand", "Brand",
      "Revenue", "Quantity"))
    assert(t.rows.nonEmpty)
    // caption duplicates the key for label-less levels (webshop_1.csv shape)
    val r0 = t.rows.head
    assert(r0(2) == r0(3))
  }

  test("parents=true prepends ancestor ID/caption pairs (C3)") {
    val t = Formatters.tidy(cat, CubeQuery("sales",
      Seq(drill("Geography", "Supplier")), Seq("revenue"), parents = true))
    assert(t.headers == Seq("ID Region", "Region", "ID Nation", "Nation",
      "ID Supplier", "Supplier", "Revenue"))
  }

  test("CSV: plain decimals, CRLF, empty string for null (C8)") {
    val csv = Formatters.csv(Formatters.Tidy(Seq("a", "b"),
      Seq(Seq("x,y", null), Seq(java.lang.Double.valueOf(1.5491877E7),
        java.lang.Double.valueOf(0.25)))))
    assert(csv == "a,b\r\n\"x,y\",\r\n15491877,0.25\r\n")
  }

  test("dense CSV has empty cells for empty combos (C1/C6)") {
    // Part × Month (2400 combos over 6000 fact rows) is guaranteed sparse ⇒
    // dense mode must enumerate empty combinations with null cells
    val dense = Formatters.tidy(cat, CubeQuery("sales",
      Seq(drill("Part", "Part", "Brands"), drill("ShipDate", "Month", "Monthly")),
      Seq("revenue"), nonempty = false))
    assert(dense.rows.exists(r => r.last == null)) // kept, serialized empty
    val sparse = Formatters.tidy(cat, CubeQuery("sales",
      Seq(drill("Part", "Part", "Brands"), drill("ShipDate", "Month", "Monthly")),
      Seq("revenue"), nonempty = false, sparse = true))
    assert(sparse.rows.length == dense.rows.count(_.last != null))
    assert(sparse.rows.length < dense.rows.length)
  }

  test("tidy CSV golden-file BYTE parity, dense and sparse (C5/C6/C8 — " +
      "the reference's webshop_1.csv / webshop_1_sparse.csv contract)") {
    // the committed goldens (src/test/resources/golden, regenerate via
    // Test/runMain graft.GoldenGen) pin every serialization convention at
    // once: ID/caption header pairs, hierarchical row order, EMPTY fields
    // for null measures (never "null"/"0" — spec/fixtures/webshop_1.csv
    // dragon 7), plain decimals without scientific notation, RFC-4180
    // quoting, CRLF line ends. Any drift in planner order, densify
    // domains, or cell formatting breaks the byte compare.
    def golden(name: String): String = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        getClass.getResource(s"/golden/$name").toURI)), "UTF-8")
    def q(sparse: Boolean) = CubeQuery("sales",
      Seq(drill("Part", "Part", "Brands"),
        drill("ShipDate", "Month", "Monthly")),
      Seq("revenue", "cnt"),
      cuts = Seq(RangeCut(LevelRef("ShipDate", Some("Month"),
        Some("Monthly")), 1, 3)),
      nonempty = false, sparse = sparse)
    val dense = Formatters.csv(Formatters.tidy(cat, q(sparse = false)))
    assert(dense == golden("part_month_dense.csv"))
    // the dense file must actually exercise the empty-cell convention
    assert(dense.contains(",,\r\n"), "golden lost its empty cells")
    val sparse = Formatters.csv(Formatters.tidy(cat, q(sparse = true)))
    assert(sparse == golden("part_month_sparse.csv"))
    assert(!sparse.contains(",,\r\n"))
    assert(sparse.linesIterator.size < dense.linesIterator.size)
  }

  test("dense + parents fills ancestor paths on empty combos (C1+C3)") {
    val rows = planner.Planner.plan(cat, CubeQuery("sales",
      Seq(drill("Geography", "Supplier"), drill("ShipDate", "Month", "Monthly")),
      Seq("revenue"), nonempty = false, parents = true)).collect()
    // ancestors (region/nation) present on EVERY row, including null cells
    assert(rows.exists(r => r.isNullAt(r.length - 1)))
    rows.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(2), "ancestor keys must be filled")
    }
    // domain = suppliers × distinct (year, quarter, month) chains
    val nSupp = cat.table("supplier").count()
    val nChains = cat.table("lineitem")
      .selectExpr("year(l_shipdate)", "quarter(l_shipdate)", "month(l_shipdate)")
      .distinct().count()
    assert(rows.length == nSupp * nChains)
  }

  test("jsonrecords object and array forms (C8)") {
    val t = Formatters.Tidy(Seq("k", "v"), Seq(Seq("a", 1), Seq("b", null)))
    assert(Formatters.jsonRecords(t, asArrays = false) ==
      """[{"k":"a","v":1},{"k":"b","v":null}]""")
    assert(Formatters.jsonRecords(t, asArrays = true) ==
      """{"variables":["k","v"],"data":[["a",1],["b",null]]}""")
  }

  test("axes JSON: measures axis first, per-dim member axes, aligned cells (C1)") {
    val doc = AxesResult.build(cat, q2)
    val axes = doc("axes").asInstanceOf[Seq[Any]]
    assert(axes.length == 3) // measures + 2 drilldowns
    // cell_keys/values are LAZY views (C1 streaming serialization — a
    // dense maxCells result must never exist twice on the heap); the JSON
    // writer streams them, so they must be Iterable but NOT a materialized
    // (or memoizing) Seq
    val values = doc("values").asInstanceOf[Iterable[Seq[Any]]]
    val cellKeys = doc("cell_keys").asInstanceOf[Iterable[Seq[Any]]]
    assert(values.isInstanceOf[scala.collection.View[_]],
      "values must stream lazily into the serializer")
    assert(cellKeys.isInstanceOf[scala.collection.View[_]])
    assert(values.size == cellKeys.size)
    assert(values.forall(_.length == 2)) // one entry per measure
    assert(cellKeys.forall(_.length == 2)) // one key per drilldown
  }

  test("member dicts carry ancestors when parents=true (C2/C3)") {
    val doc = AxesResult.build(cat, CubeQuery("sales",
      Seq(drill("Geography", "Nation")), Seq("revenue"), parents = true))
    val axis1 = doc("axes").asInstanceOf[Seq[Any]](1)
      .asInstanceOf[Map[String, Any]]
    val m0 = axis1("members").asInstanceOf[Seq[Any]].head
      .asInstanceOf[Map[String, Any]]
    val anc = m0("ancestors").asInstanceOf[Seq[Any]]
    assert(anc.length == 1)
    assert(anc.head.asInstanceOf[Map[String, Any]]("level_name") == "Region")
  }

  test("caption[] substitutes a property for the member caption (C4)") {
    val q = CubeQuery("sales",
      Seq(drill("Part", "Part", "Brands")), Seq("revenue"),
      captions = Seq(PropertyRef(L_part, "Type")), limit = Some(5))
    val t = Formatters.tidy(cat, q)
    // caption column now carries p_type values (UPPERCASE), not p_name
    val caps = t.rows.map(_(1).toString)
    assert(caps.forall(_.matches("[A-Z ]+")), s"captions were $caps")
    val doc = AxesResult.build(cat, q)
    val m0 = doc("axes").asInstanceOf[Seq[Any]](1)
      .asInstanceOf[Map[String, Any]]("members").asInstanceOf[Seq[Any]].head
      .asInstanceOf[Map[String, Any]]
    assert(m0("caption") == caps.head)
  }

  private val L_part = LevelRef("Part", Some("Part"), Some("Brands"))

  test("Json writer escaping and special values") {
    assert(Json.write(Map("a" -> "x\"y\n", "b" -> None, "c" -> 1.5)) ==
      """{"a":"x\"y\n","b":null,"c":1.5}""")
    assert(Json.write(Seq(Double.NaN)) == "[null]")
  }

  test("metadata serializers (C9)") {
    val dict = Metadata.cubeDict(cat.cube("sales"))
    assert(dict("name") == "sales")
    val measures = dict("measures").asInstanceOf[Seq[Map[String, Any]]]
    assert(measures.exists(m => m("name") == "Order Count" &&
      m("aggregator") == "distinct-count"))
    val members = Metadata.levelMembers(cat, cat.cube("sales"),
      LevelRef("Geography", Some("Region")))
    assert(members.map(_("key")) == Seq(0, 1, 2, 3, 4))
    assert(members.head("caption") == "AFRICA")
  }

  test("member by key resolves ancestors (§2.D)") {
    val m = Metadata.memberByKey(cat, cat.cube("sales"),
      LevelRef("Geography", Some("Nation")), 3L)
    assert(m.nonEmpty)
    val anc = m.get("ancestors").asInstanceOf[Seq[Map[String, Any]]]
    assert(anc.head("caption") == "EUROPE")
  }
}
