package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.GraftException
import graft.planner._
import graft.TpchCatalog.salesCube

/** Mutation fuzzing of the request parsers: every mutated input must either
  * parse or raise a GraftException (the 400/403/404 contract) — never an
  * index error, NPE, match error, or stack overflow. The reference's Ruby
  * layer returns 400 for malformed expressions (spec/api_spec.rb:117-169);
  * this pins the same contract under adversarial input, deterministically
  * (fixed seed). */
class FuzzSpec extends AnyFunSuite {

  private val validMdx = Seq(
    """SELECT {[Measures].[Revenue], [Measures].[Quantity]} ON COLUMNS,
      |[Geography].[Region].Members ON ROWS
      |FROM [sales]""".stripMargin,
    """SELECT {[Measures].[Revenue]} ON COLUMNS,
      |NON EMPTY CROSSJOIN([Geography].[Region].Members,
      |  [Part].[Brands].[Brand].Members) ON ROWS
      |FROM sales WHERE ([ShipDate].[Monthly].[Year].[1995])""".stripMargin,
    """WITH MEMBER [Measures].[m] AS
      |  '([Measures].[Revenue], [ShipDate].[Monthly].PrevMember)'
      |SELECT {[Measures].[m]} ON COLUMNS,
      |ORDER(FILTER([Part].[Brands].[Brand].Members,
      |  [Measures].[Revenue] > 1000), [Measures].[Revenue], DESC) ON ROWS
      |FROM sales""".stripMargin,
    """SELECT {[Measures].[Revenue]} ON COLUMNS,
      |TOPCOUNT(HEAD(SUBSET([Geography].[Region].Members, 1, 9), 7), 3,
      |  [Measures].[Revenue]) ON ROWS
      |FROM sales""".stripMargin,
    // the round-11 tuple constructs: share-of-parent and the anchored
    // semi-additive closing balance — mutations must 400, never crash
    """WITH MEMBER [Measures].[nation share] AS
      |  '[Measures].[Revenue] /
      |   ([Measures].[Revenue], [Geography].CurrentMember.Parent)'
      |SELECT {[Measures].[nation share]} ON COLUMNS,
      |CROSSJOIN([Geography].[Region].Members,
      |  [Geography].[Nation].Members) ON ROWS
      |FROM sales""".stripMargin,
    """WITH MEMBER [Measures].[closing] AS
      |  '([Measures].[Revenue],
      |    CLOSINGPERIOD([ShipDate].[Monthly].[Month],
      |      [ShipDate].[Monthly].[Year].CurrentMember))'
      |SELECT {[Measures].[closing]} ON COLUMNS,
      |CROSSJOIN([ShipDate].[Monthly].[Year].Members,
      |  [ShipDate].[Monthly].[Month].Members) ON ROWS
      |FROM sales""".stripMargin,
    // the round-12 per-group top-k / coverage constructs — mutations must
    // 400 (bad arity, stray inner sets, mangled brackets), never crash
    """SELECT {[Measures].[Revenue]} ON COLUMNS,
      |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
      |  TOPCOUNT([Part].[Brands].[Brand].Members, 3,
      |    [Measures].[Revenue])) ON ROWS
      |FROM sales""".stripMargin,
    """SELECT {[Measures].[Revenue]} ON COLUMNS,
      |GENERATE([Geography].[Geography].[Region].Members,
      |  TOPPERCENT([Part].[Brands].[Brand].Members, 40,
      |    [Measures].[Revenue])) ON ROWS
      |FROM sales""".stripMargin,
    """SELECT {[Measures].[Revenue]} ON COLUMNS,
      |EXTRACT(CROSSJOIN([Geography].[Geography].[Nation].Members,
      |  [Part].[Brands].[Brand].Members), [Part]) ON ROWS
      |FROM sales""".stripMargin,
    // the round-13 per-group HAVING form — mangled predicates (OR, junk
    // comparators, missing args) must 400, never crash
    """SELECT {[Measures].[Revenue]} ON COLUMNS,
      |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
      |  FILTER([Part].[Brands].[Brand].Members,
      |    [Measures].[Revenue] > 2300000 AND
      |    [Measures].[Quantity] >= 10)) ON ROWS
      |FROM sales""".stripMargin,
    // the round-13 per-group ORDER form — mangled directions/measures
    // must 400, never crash
    """SELECT {[Measures].[Revenue]} ON COLUMNS,
      |GENERATE([Geography].[Geography].[Region].Members,
      |  ORDER([Part].[Brands].[Brand].Members,
      |    [Measures].[Revenue], DESC)) ON ROWS
      |FROM sales""".stripMargin,
    // the round-13 composed form (FILTER inside the ranked inner set) —
    // mangled nesting must 400, never crash
    """SELECT {[Measures].[Revenue]} ON COLUMNS,
      |NON EMPTY GENERATE([Geography].[Geography].[Region].Members,
      |  TOPCOUNT(FILTER([Part].[Brands].[Brand].Members,
      |    [Measures].[Avg Discount] > 0.05), 2,
      |    [Measures].[Revenue])) ON ROWS
      |FROM sales""".stripMargin,
    // the round-13 post-truncation form (FILTER wrapping GENERATE) —
    // mangled wrappers must 400, never crash
    """SELECT {[Measures].[Revenue]} ON COLUMNS,
      |NON EMPTY FILTER(
      |  GENERATE([Geography].[Geography].[Region].Members,
      |    TOPCOUNT([Part].[Brands].[Brand].Members, 2,
      |      [Measures].[Revenue])),
      |  [Measures].[Avg Discount] > 0.05) ON ROWS
      |FROM sales""".stripMargin,
    // the round-15 fixed-member pin forms (explicit level and unqualified)
    // — mangled member paths, stray hierarchy segments, broken tuple
    // parens must 400, never crash
    """WITH MEMBER [Measures].[asia] AS
      |  '([Measures].[Revenue], [Geography].[Region].[2])'
      |MEMBER [Measures].[share] AS
      |  '[Measures].[Revenue] / ([Measures].[Revenue], [Geography].[2])'
      |SELECT {[Measures].[asia], [Measures].[share]} ON COLUMNS,
      |NON EMPTY [Part].[Brands].[Brand].Members ON ROWS
      |FROM sales""".stripMargin,
    // the round-16 MULTI-member pin and coarser-pin forms — mangled
    // member lists, dangling commas, duplicated dims must 400, never
    // crash
    """WITH MEMBER [Measures].[asia95] AS
      |  '([Measures].[Revenue], [Geography].[Region].[2],
      |    [ShipDate].[Year].[1995])'
      |SELECT {[Measures].[Revenue], [Measures].[asia95]} ON COLUMNS,
      |NON EMPTY CROSSJOIN([Geography].[Region].Members,
      |  [ShipDate].[Monthly].[Month].Members) ON ROWS
      |FROM sales""".stripMargin,
    // the round-16 mixed navigation+pin tuple — mangled nav suffixes,
    // commas, and member paths must 400, never crash
    """WITH MEMBER [Measures].[prev_asia] AS
      |  '([Measures].[Revenue], [ShipDate].PrevMember,
      |    [Geography].[Region].[2])'
      |SELECT {[Measures].[Revenue], [Measures].[prev_asia]} ON COLUMNS,
      |[ShipDate].[Monthly].[Year].Members ON ROWS
      |FROM sales""".stripMargin)

  private val validCuts = Seq(
    "[Geography].[Region].[1]",
    "{[Geography].[Region].[1], [Geography].[Region].[2]}",
    "([ShipDate].[Monthly].[Year].[1994] : [ShipDate].[Monthly].[Year].[1996])")

  private def assertContract(what: String, input: String)(run: => Any): Unit =
    try { run; () } catch {
      case _: GraftException => ()
      case e: Throwable =>
        fail(s"$what escaped the error contract with " +
          s"${e.getClass.getName}: ${e.getMessage}\ninput: $input")
    }

  test("mutated MDX parses or 400s — never an internal error") {
    val rnd = new scala.util.Random(42)
    val junk = "]}{[(),.:&*' \"\\;%$#@!"
    def mutate(s: String): String = rnd.nextInt(6) match {
      case 0 => s.take(rnd.nextInt(s.length + 1)) // truncate
      case 1 => // flip one char to structural junk
        val i = rnd.nextInt(s.length)
        s.substring(0, i) + junk.charAt(rnd.nextInt(junk.length)) +
          s.substring(i + 1)
      case 2 => // delete a window
        val i = rnd.nextInt(s.length)
        s.substring(0, i) + s.substring(math.min(s.length, i + 1 + rnd.nextInt(8)))
      case 3 => // duplicate a window in place
        val i = rnd.nextInt(s.length)
        val j = math.min(s.length, i + 1 + rnd.nextInt(12))
        s.substring(0, j) + s.substring(i, j) + s.substring(j)
      case 4 => // inject a stray token
        val toks = Seq("ON ROWS", "CROSSJOIN(", "{", "}", "].[", "FROM",
          "WHERE", "'", "WITH MEMBER", ",,", "()")
        val i = rnd.nextInt(s.length + 1)
        s.substring(0, i) + toks(rnd.nextInt(toks.length)) + s.substring(i)
      case _ => s.reverse
    }
    for (q <- validMdx; _ <- 1 to 400) {
      var m = q
      (0 until 1 + rnd.nextInt(3)).foreach(_ => if (m.nonEmpty) m = mutate(m))
      assertContract("MDX", m)(MdxParser.parse(salesCube, m))
    }
  }

  test("mutated cut/drilldown/param inputs parse or 400 — never an " +
      "internal error") {
    val rnd = new scala.util.Random(7)
    def mangle(s: String): String = rnd.nextInt(4) match {
      case 0 => s.take(rnd.nextInt(s.length + 1))
      case 1 => s.replace("].", "]..")
      case 2 => val i = rnd.nextInt(s.length)
        s.substring(0, i) + "[{]}(,):" .charAt(rnd.nextInt(8)) +
          s.substring(i + 1)
      case _ => s + s.takeRight(rnd.nextInt(s.length + 1))
    }
    for (c <- validCuts; _ <- 1 to 300) {
      val m = mangle(c)
      assertContract("cut", m)(QueryParser.parseCut(salesCube, m))
      assertContract("drilldown", m)(QueryParser.parseDrilldown(salesCube, m))
    }
    // flat params: garbage values for every recognized key
    val keys = Seq("drilldown[]", "measures[]", "cut[]", "filter[]",
      "order", "order_desc", "offset", "limit", "nonempty", "distinct",
      "parents", "properties[]", "caption[]", "sparse")
    val vals = Seq("", "]", "[x].[", "-9999999999999999999999", "1e309",
      "NaN", "true]", "måx", "[Measures].[Revenue] >>> 1", "\u0000")
    for (k <- keys; v <- vals)
      assertContract("params", s"$k=$v")(
        QueryParser.fromParams(salesCube, Map(k -> Seq(v))))
  }
}
