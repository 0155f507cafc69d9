package graft.planner

import graft.model._

/** MDX-subset parser for the raw-MDX endpoint (ref POST /mdx, api.rb:21-50).
  * The reference's own REST layer only ever EMITS a constrained MDX dialect
  * (query_helper.rb), and its /mdx test corpus uses TOPCOUNT + Crossjoin —
  * this parser accepts exactly that dialect and compiles it onto the same
  * CubeQuery IR the REST params use (full MDX is explicitly out of scope,
  * SURVEY §3.2):
  *
  *   SELECT {[Measures].[M], ...} ON COLUMNS,
  *          [NON EMPTY] <set> ON ROWS
  *   FROM [Cube]
  *   [WHERE (<member> [* <member>]...)]
  *
  *   <set> ::= [Dim].[Level].Members | [Dim].[Hier].[Level].Members
  *           | [Named Set]
  *           | {<member>, ...}
  *           | CROSSJOIN(<set>, <set>) | <set> * <set>
  *           | TOPCOUNT(<set>, k, [Measures].[M])
  *           | DESCENDANTS(<member>, [Dim].[Level])
  */
object MdxParser {

  def parse(cube: CubeDef, mdx: String): CubeQuery = {
    val text = mdx.trim
    val re = ("""(?is)^\s*SELECT\s+(.*?)\s+ON\s+COLUMNS\s*,\s*(.*?)\s+ON\s+ROWS""" +
      """\s+FROM\s+(\S+)\s*(?:WHERE\s+(.*?))?\s*$""").r
    text match {
      case re(colAxis, rowAxisRaw, cubeName, slicer) =>
        val fromCube = stripBrackets(cubeName.trim)
        if (fromCube != cube.name)
          GraftException.badRequest(
            s"MDX FROM cube '$fromCube' does not match '${cube.name}'")
        val measures = parseMeasureAxis(cube, colAxis.trim)
        val (nonEmpty, rowAxis) = {
          val t = rowAxisRaw.trim
          if (t.toUpperCase.startsWith("NON EMPTY"))
            (true, t.substring("NON EMPTY".length).trim)
          else (false, t)
        }
        val (drills, cuts) = parseSet(cube, rowAxis)
        val slicerCuts = Option(slicer).map(_.trim).filter(_.nonEmpty)
          .map(parseSlicer(cube, _)).getOrElse(Nil)
        CubeQuery(cube.name, drills, measures, cuts = cuts ++ slicerCuts,
          nonempty = nonEmpty)
      case _ => GraftException.badRequest(
        "cannot parse MDX (supported: SELECT <measures> ON COLUMNS, <set> ON ROWS FROM <cube> [WHERE <tuple>])")
    }
  }

  private def stripBrackets(s: String): String = {
    val t = s.trim
    if (t.startsWith("[") && t.endsWith("]")) t.substring(1, t.length - 1)
    else t
  }

  private def parseMeasureAxis(cube: CubeDef, s: String): Seq[String] = {
    val inner =
      if (s.startsWith("{") && s.endsWith("}")) s.substring(1, s.length - 1)
      else s
    splitTop(inner, ',').map { m =>
      QueryParser.segments(m) match {
        case Seq("Measures", name) => resolveMeasure(cube, name)
        case Seq(name) => resolveMeasure(cube, name)
        case _ => GraftException.badRequest(s"bad measure expression '$m'")
      }
    }
  }

  /** Measures may be referenced by display name or alias. */
  private def resolveMeasure(cube: CubeDef, name: String): String =
    cube.measure(name).map(_.alias)
      .orElse(cube.calcMembers.find(_.alias == name).map(_.alias))
      .orElse(cube.lagMeasures.find(_.alias == name).map(_.alias))
      .getOrElse(GraftException.badRequest(s"measure '$name' not found"))

  /** Row-axis set → (drilldowns, cuts). */
  def parseSet(cube: CubeDef, s: String): (Seq[Drill], Seq[Cut]) = {
    val t = s.trim
    val upper = t.toUpperCase
    if (upper.startsWith("CROSSJOIN(") && t.endsWith(")")) {
      val args = splitTop(t.substring("CROSSJOIN(".length, t.length - 1), ',')
      if (args.length != 2)
        GraftException.badRequest(s"CROSSJOIN takes 2 sets: '$s'")
      val (d1, c1) = parseSet(cube, args(0))
      val (d2, c2) = parseSet(cube, args(1))
      (d1 ++ d2, c1 ++ c2)
    } else if (splitTop(t, '*').length > 1) {
      val parts = splitTop(t, '*')
      val parsed = parts.map(parseSet(cube, _))
      (parsed.flatMap(_._1), parsed.flatMap(_._2))
    } else if (upper.startsWith("TOPCOUNT(") && t.endsWith(")")) {
      val args = splitTop(t.substring("TOPCOUNT(".length, t.length - 1), ',')
      if (args.length != 3)
        GraftException.badRequest(s"TOPCOUNT takes (set, k, measure): '$s'")
      val (drills, cuts) = parseSet(cube, args(0))
      val level = drills match {
        case Seq(LevelDrill(ref)) => ref
        case _ => GraftException.badRequest(
          s"TOPCOUNT set must be a single level enumeration: '$s'")
      }
      val k = args(1).trim.toInt
      val m = QueryParser.segments(args(2)) match {
        case Seq("Measures", name) => resolveMeasure(cube, name)
        case Seq(name) => resolveMeasure(cube, name)
        case _ => GraftException.badRequest(s"bad TOPCOUNT measure '${args(2)}'")
      }
      (drills, cuts :+ TopKCut(level, k, m))
    } else if (upper.startsWith("DESCENDANTS(") && t.endsWith(")")) {
      val args = splitTop(t.substring("DESCENDANTS(".length, t.length - 1), ',')
      if (args.length != 2)
        GraftException.badRequest(s"DESCENDANTS takes (member, level): '$s'")
      val cut = QueryParser.parseCut(cube, args(0)) // member cut on ancestor
      val levelRef = QueryParser.segments(args(1)) match {
        case Seq(d, l) => LevelRef(d, Some(l))
        case Seq(d, h, l) => LevelRef(d, Some(l), Some(h))
        case _ => GraftException.badRequest(s"bad DESCENDANTS level '${args(1)}'")
      }
      (Seq(LevelDrill(levelRef)), Seq(cut))
    } else if (t.startsWith("{") && t.endsWith("}")) {
      // explicit member set: drill the shared level + set cut (or named set)
      val cut = QueryParser.parseCut(cube, t)
      cut match {
        case SetCut(level, _) => (Seq(LevelDrill(level)), Seq(cut))
        case other => GraftException.badRequest(s"unsupported set literal '$t'")
      }
    } else if (upper.endsWith(".MEMBERS")) {
      val path = t.substring(0, t.length - ".Members".length)
      QueryParser.segments(path) match {
        case Seq(d) => (Seq(LevelDrill(LevelRef(d))), Nil)
        case Seq(d, l) => (Seq(LevelDrill(LevelRef(d, Some(l)))), Nil)
        case Seq(d, h, l) => (Seq(LevelDrill(LevelRef(d, Some(l), Some(h)))), Nil)
        case _ => GraftException.badRequest(s"bad level path '$path'")
      }
    } else {
      val name = stripBrackets(t)
      if (cube.namedSet(name).nonEmpty) (Seq(NamedSetDrill(name)), Nil)
      else GraftException.badRequest(s"unsupported set expression '$t'")
    }
  }

  /** WHERE (m1 * m2 * ...) — slicer tuple of member cuts (ref A16). */
  private def parseSlicer(cube: CubeDef, s: String): Seq[Cut] = {
    val inner =
      if (s.startsWith("(") && s.endsWith(")")) s.substring(1, s.length - 1)
      else s
    splitTop(inner, '*').map(QueryParser.parseCut(cube, _))
  }

  /** Split at depth 0 (parens/braces), honoring bracket quoting. */
  private def splitTop(s: String, sep: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inBracket = false
    for (c <- s) c match {
      case '[' if !inBracket => inBracket = true; cur.append(c)
      case ']' if inBracket => inBracket = false; cur.append(c)
      case '(' | '{' if !inBracket => depth += 1; cur.append(c)
      case ')' | '}' if !inBracket => depth -= 1; cur.append(c)
      case `sep` if depth == 0 && !inBracket =>
        out += cur.result(); cur.clear()
      case other => cur.append(other)
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
