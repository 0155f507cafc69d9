package graft.sources

import scala.collection.immutable.ListMap
import org.w3c.dom.{Document, Element}
import graft.model._

/** Mondrian 3.x XML schema catalog ingestion — the reference's entire schema
  * surface (ref spec/spec_helper.rb:45 `catalog:` param; the fixtures
  * spec/fixtures/foodmart.xml and webshop.xml). An existing mondrian-rest
  * user points graft at the same XML file they already have; every element
  * maps onto its [[graft.model]] counterpart:
  *
  *   Schema/Cube/Table            → SchemaDef/CubeDef.factTable
  *   Dimension/Hierarchy/Level    → DimensionDef/HierarchyDef/LevelDef
  *     (column/nameColumn/ordinalColumn → keyExpr/nameExpr/ordExpr;
  *      KeyExpression/NameExpression/OrdinalExpression pick the hive ||
  *      generic SQL dialect — Spark SQL parses both)
  *   DimensionUsage               → the shared dimension re-bound under the
  *                                  usage name with the usage's foreignKey
  *   Join (snowflake)             → a derived pre-join table (B3: collapsed
  *                                  ONCE at load; the planner only ever sees
  *                                  star equi-joins), surfaced as
  *                                  [[MondrianXml.SnowflakeJoinDef]]
  *   Measure / MeasureExpression  → MeasureDef (aggregator map below)
  *   CalculatedMember/Formula     → CalcMemberDef with `[Measures].[X]`
  *                                  refs rewritten to aliases; the
  *                                  COALESCEEMPTY((m, [T].PREVMEMBER), m)
  *                                  idiom (ref foodmart.xml:351-357) becomes
  *                                  the LagMeasureDef it IS; formulas using
  *                                  calculus outside the compiled subset are
  *                                  skipped and reported (never silently
  *                                  mistranslated)
  *   NamedSet/Formula (TopCount)  → NamedSetDef
  *   Level parentColumn + Closure → [[MondrianXml.ParentChildDef]] (B11:
  *                                  the closure metadata; graft's
  *                                  ops.ParentChild materializes closures
  *                                  natively, so the Mondrian closure table
  *                                  is optional input, not a requirement)
  *   hideMemberIf                 → LevelDef.hideIf (B12; "Never" → None)
  *   VirtualCube/VirtualCubeMeasure → VirtualCubeDef
  *   Role/SchemaGrant/CubeGrant/HierarchyGrant/MemberGrant → RoleDef tree
  *                                  (member paths resolve to the level at
  *                                  the path's depth, ordered so later
  *                                  grants override — Mondrian nesting)
  *
  * Deliberately IGNORED (with reasons, not silently dropped semantics):
  *   CalculatedMemberProperty other than FORMAT_STRING — Mondrian
  *     rendering hints graft's REST layer doesn't evaluate (formatString
  *     and <Annotations> ARE carried and served verbatim in metadata,
  *     ref mondrian_ext.rb:37-80 / api_spec.rb:40);
  *   AggName/AggExclude — Mondrian's hand-declared aggregate-table routing;
  *     graft's B17 rollup registry + advisor replaces this mechanism;
  *   visible="false" — graft surfaces every declared member (the reference
  *     API exposes no visibility toggles either).
  *
  * Parsing is DOM (JDK javax.xml, no extra dependency) with DTDs and
  * external entities disabled — a schema file is config, not a vector.
  */
object MondrianXml {

  /** A snowflake `<Join>` collapsed to a derived pre-join table: binding
    * materializes `leftTable ⋈ rightTable ON leftKey = rightKey` under
    * `name` (the B3 registration-time collapse). */
  final case class SnowflakeJoinDef(name: String, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String)

  /** Parent-child hierarchy declaration (ref foodmart.xml:530-548 HR
    * Employees): the level's self-referencing parent column plus the
    * optional precomputed closure table. */
  final case class ParentChildDef(cube: String, dim: String, hierarchy: String,
      level: String, childColumn: String, parentColumn: String,
      nullParentValue: Option[String], nameColumn: Option[String],
      closureTable: Option[String], closureParentColumn: Option[String],
      closureChildColumn: Option[String])

  /** A calculated member / named set whose formula uses MDX calculus
    * outside graft's compiled subset — reported, never guessed at. */
  final case class SkippedFormula(cube: String, name: String, formula: String,
      reason: String)

  /** Parse result: the bound-ready model plus everything binding needs
    * (derived joins, required base tables) and everything a migration
    * audit wants (parent-child metadata, skipped formulas). */
  final case class XmlCatalog(
      schema: SchemaDef,
      joins: Seq[SnowflakeJoinDef],
      parentChild: Seq[ParentChildDef],
      skipped: Seq[SkippedFormula],
      requiredTables: Seq[String])

  def parseFile(path: String): XmlCatalog =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  def parse(xmlText: String): XmlCatalog = {
    val doc = secureParse(xmlText)
    val root = doc.getDocumentElement
    if (root.getTagName != "Schema")
      GraftException.badRequest(s"expected <Schema>, got <${root.getTagName}>")
    val schemaName = attr(root, "name").getOrElse("schema")

    val sharedDims = children(root, "Dimension").map(parseDim)
      .map(d => d.name -> d).to(ListMap)

    val joinsAcc = scala.collection.mutable.LinkedHashSet.empty[SnowflakeJoinDef]
    val pcAcc = scala.collection.mutable.ListBuffer.empty[ParentChildDef]
    val skippedAcc = scala.collection.mutable.ListBuffer.empty[SkippedFormula]

    val cubes = children(root, "Cube").map(c =>
      parseCube(c, sharedDims, joinsAcc, pcAcc, skippedAcc))

    val virtuals = children(root, "VirtualCube").map(v =>
      parseVirtual(v, cubes, skippedAcc))

    val roles = children(root, "Role").map(r => parseRole(r, cubes))

    val schema = SchemaDef(schemaName, cubes, virtuals, roles)
    val required = (cubes.map(_.factTable) ++
      joinsAcc.toSeq.flatMap(j => Seq(j.leftTable, j.rightTable)) ++
      cubes.flatMap(_.dimensions).flatMap(_.join).map(_.table)
        .filterNot(t => joinsAcc.exists(_.name == t)) ++
      pcAcc.flatMap(_.closureTable)).distinct
    XmlCatalog(schema, joinsAcc.toSeq, pcAcc.toList, skippedAcc.toList,
      required)
  }

  // ------------------------------------------------------------ DOM helpers

  private def secureParse(xmlText: String): Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(
      new org.xml.sax.InputSource(new java.io.StringReader(xmlText)))
  }

  private def children(el: Element, tag: String): Seq[Element] = {
    val nl = el.getChildNodes
    (0 until nl.getLength).map(nl.item)
      .collect { case e: Element if e.getTagName == tag => e }
  }

  private def attr(el: Element, name: String): Option[String] =
    Option(el.getAttribute(name)).filter(_.nonEmpty)

  private def boolAttr(el: Element, name: String, default: Boolean): Boolean =
    attr(el, name).map(_.toBoolean).getOrElse(default)

  /** `<Annotations><Annotation name="k">v</Annotation>…</Annotations>` —
    * served verbatim in metadata (ref mondrian_ext.rb:46-52, the
    * annotation map the reference exposes on cubes/named sets/members). */
  private def parseAnnotations(el: Element): Map[String, String] =
    children(el, "Annotations").headOption.map { a =>
      ListMap(children(a, "Annotation").flatMap(an =>
        attr(an, "name").map(_ -> an.getTextContent.trim)): _*)
    }.getOrElse(Map.empty)

  /** `<X><SQL dialect="…">…</SQL></X>` → the hive || generic || first
    * dialect's text (Spark SQL is Hive-compatible; Mondrian's generic
    * dialect is plain unquoted SQL, which Spark also parses). */
  private def sqlExpr(el: Element, wrapper: String): Option[String] =
    children(el, wrapper).headOption.map { w =>
      val sqls = children(w, "SQL")
      val pick = sqls.find(s => attr(s, "dialect").contains("hive"))
        .orElse(sqls.find(s => attr(s, "dialect").contains("generic")))
        .orElse(sqls.headOption)
        .getOrElse(GraftException.badRequest(
          s"<$wrapper> holds no <SQL> dialect"))
      pick.getTextContent.trim
    }

  /** Stable snake_case identifier from a display name. */
  private def san(s: String): String =
    s.trim.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .stripPrefix("_").stripSuffix("_")

  /** A bare column reference as a Spark SQL expression (backtick-quoted
    * when the name isn't a plain identifier). */
  private def colExpr(c: String): String =
    if (c.matches("[A-Za-z_][A-Za-z0-9_]*")) c else s"`$c`"

  private def stripBrackets(s: String): Seq[String] =
    "\\[([^\\]]*)\\]".r.findAllMatchIn(s).map(_.group(1)).toSeq match {
      case Seq() => s.split("\\.").map(_.trim).toSeq // unbracketed form
      case segs => segs
    }

  // ----------------------------------------------------- dimension parsing

  private final case class XLevel(name: String, column: Option[String],
      keySql: Option[String], nameColumn: Option[String],
      nameSql: Option[String], ordColumn: Option[String],
      ordSql: Option[String], hideIf: Option[String],
      props: Seq[(String, String)], parentColumn: Option[String],
      nullParentValue: Option[String],
      closure: Option[(String, String, String)])

  private final case class XHier(name: Option[String], hasAll: Boolean,
      allMemberName: Option[String], primaryKey: Option[String],
      table: Option[String], join: Option[SnowflakeJoinDef],
      levels: Seq[XLevel])

  private final case class XDim(name: String, isTime: Boolean,
      foreignKey: Option[String], hiers: Seq[XHier])

  private def parseDim(el: Element): XDim = XDim(
    name = attr(el, "name").getOrElse(
      GraftException.badRequest("<Dimension> without name")),
    isTime = attr(el, "type").contains("TimeDimension"),
    foreignKey = attr(el, "foreignKey"),
    hiers = children(el, "Hierarchy").map(parseHier))

  private def parseHier(el: Element): XHier = {
    val table = children(el, "Table").headOption.flatMap(attr(_, "name"))
    val join = children(el, "Join").headOption.map { j =>
      val ts = children(j, "Table").flatMap(attr(_, "name"))
      if (ts.length != 2) GraftException.badRequest(
        s"<Join> must hold exactly two <Table>s (nested joins unsupported), got ${ts.length}")
      val lk = attr(j, "leftKey").getOrElse(
        GraftException.badRequest("<Join> without leftKey"))
      val rk = attr(j, "rightKey").getOrElse(
        GraftException.badRequest("<Join> without rightKey"))
      SnowflakeJoinDef(s"${ts(0)}__${ts(1)}", ts(0), ts(1), lk, rk)
    }
    XHier(
      name = attr(el, "name"),
      hasAll = boolAttr(el, "hasAll", default = true),
      allMemberName = attr(el, "allMemberName"),
      primaryKey = attr(el, "primaryKey"),
      table = table,
      join = join,
      levels = children(el, "Level").map(parseLevel))
  }

  private def parseLevel(el: Element): XLevel = XLevel(
    name = attr(el, "name").getOrElse(
      GraftException.badRequest("<Level> without name")),
    column = attr(el, "column"),
    keySql = sqlExpr(el, "KeyExpression"),
    nameColumn = attr(el, "nameColumn").orElse(attr(el, "captionColumn")),
    nameSql = sqlExpr(el, "NameExpression"),
    ordColumn = attr(el, "ordinalColumn"),
    ordSql = sqlExpr(el, "OrdinalExpression"),
    hideIf = attr(el, "hideMemberIf").filter(_ != "Never"),
    props = children(el, "Property").map(p =>
      attr(p, "name").getOrElse(GraftException.badRequest(
        "<Property> without name")) ->
        sqlExpr(p, "PropertyExpression").orElse(attr(p, "column").map(colExpr))
          .getOrElse(GraftException.badRequest(
            s"<Property> without column: ${attr(p, "name")}"))),
    parentColumn = attr(el, "parentColumn"),
    nullParentValue = attr(el, "nullParentValue"),
    closure = children(el, "Closure").headOption.map { c =>
      val t = children(c, "Table").headOption.flatMap(attr(_, "name"))
        .getOrElse(GraftException.badRequest("<Closure> without <Table>"))
      (t, attr(c, "parentColumn").getOrElse(""),
        attr(c, "childColumn").getOrElse(""))
    })

  /** Bind a parsed dimension under a usage name: resolve the one effective
    * (table, primaryKey) across its hierarchies, derive snowflake pre-join
    * tables, and mint level aliases (`<dim>_<level>`; a level NAME that
    * repeats within the dimension with a different key expression gets the
    * hierarchy infix so aliases stay 1:1 with expressions). */
  private def bindDim(x: XDim, usageName: String, foreignKey: Option[String],
      factTable: String, cubeName: String,
      joinsAcc: scala.collection.mutable.LinkedHashSet[SnowflakeJoinDef],
      pcAcc: scala.collection.mutable.ListBuffer[ParentChildDef])
      : DimensionDef = {
    def err(msg: String): Nothing =
      GraftException.badRequest(s"dimension '$usageName': $msg")

    // effective table per hierarchy: a <Join> collapses to its derived name
    val hierTables: Seq[Option[String]] = x.hiers.map { h =>
      h.join.foreach(joinsAcc += _)
      h.join.map(_.name).orElse(h.table)
    }
    val tables = hierTables.flatten.distinct
    if (tables.length > 1)
      err(s"hierarchies bind different tables (${tables.mkString(", ")}) — " +
        "split them into separate dimensions")
    val pks = x.hiers.flatMap(_.primaryKey).distinct
    if (pks.length > 1)
      err(s"hierarchies declare different primaryKeys (${pks.mkString(", ")})")

    val fk = foreignKey.orElse(x.foreignKey)
    val join: Option[JoinSpec] = tables.headOption match {
      // the dimension's table IS the fact and no FK was declared:
      // degenerate — levels evaluate over the fact row itself (ref
      // foodmart.xml Store cube `<DimensionUsage name="Store" source=
      // "Store"/>` with no foreignKey)
      case Some(t) if t == factTable && fk.isEmpty => None
      case Some(t) =>
        val pk = pks.headOption.getOrElse(
          err(s"table '$t' bound without a primaryKey"))
        Some(JoinSpec(t, fk.getOrElse(
          err(s"table '$t' bound without a foreignKey")), pk))
      case None => None // no <Table>/<Join> anywhere: degenerate over fact
    }

    // level alias minting: name → distinct key expressions across hiers
    def keyOf(l: XLevel): String =
      l.keySql.orElse(l.column.map(colExpr)).getOrElse(
        err(s"level '${l.name}' has neither column nor KeyExpression"))
    val byName = x.hiers.flatMap(_.levels).groupBy(_.name)
      .map { case (n, ls) => n -> ls.map(keyOf).distinct.length }
    def aliasOf(h: XHier, l: XLevel): String = {
      val base = s"${san(usageName)}_${san(l.name)}"
      if (byName(l.name) > 1) s"${san(usageName)}_${san(h.name.getOrElse(x.name))}_${san(l.name)}"
      else base
    }

    val hiers = x.hiers.map { h =>
      val levels = h.levels.map { l =>
        val alias = aliasOf(h, l)
        l.closure.foreach { case (ct, cp, cc) =>
          pcAcc += ParentChildDef(cubeName, usageName,
            h.name.getOrElse(x.name), l.name,
            childColumn = l.column.getOrElse(""),
            parentColumn = l.parentColumn.getOrElse(""),
            nullParentValue = l.nullParentValue,
            nameColumn = l.nameColumn,
            closureTable = Some(ct),
            closureParentColumn = Some(cp).filter(_.nonEmpty),
            closureChildColumn = Some(cc).filter(_.nonEmpty))
        }
        // a parentColumn WITHOUT a closure still records the parent-child
        // declaration (graft materializes closures natively — B11)
        if (l.closure.isEmpty && l.parentColumn.isDefined)
          pcAcc += ParentChildDef(cubeName, usageName,
            h.name.getOrElse(x.name), l.name, l.column.getOrElse(""),
            l.parentColumn.get, l.nullParentValue, l.nameColumn,
            None, None, None)
        LevelDef(
          name = l.name,
          keyExpr = keyOf(l),
          alias = alias,
          nameExpr = l.nameSql.orElse(l.nameColumn.map(colExpr)),
          ordExpr = l.ordSql.orElse(l.ordColumn.map(colExpr)),
          properties = l.props.map { case (pn, pe) =>
            PropertyDef(pn, pe, s"${alias}_${san(pn)}") },
          hideIf = l.hideIf)
      }
      HierarchyDef(h.name.getOrElse(x.name), levels, h.hasAll,
        h.allMemberName)
    }
    DimensionDef(usageName, hiers, join, x.isTime)
  }

  // ----------------------------------------------------------- cube parsing

  private val aggregators: Map[String, Agg] = Map(
    "sum" -> Agg.Sum, "count" -> Agg.Count, "min" -> Agg.Min,
    "max" -> Agg.Max, "avg" -> Agg.Avg,
    "distinct-count" -> Agg.DistinctCount,
    "distinct count" -> Agg.DistinctCount)

  private def parseCube(el: Element, shared: Map[String, XDim],
      joinsAcc: scala.collection.mutable.LinkedHashSet[SnowflakeJoinDef],
      pcAcc: scala.collection.mutable.ListBuffer[ParentChildDef],
      skippedAcc: scala.collection.mutable.ListBuffer[SkippedFormula])
      : CubeDef = {
    val name = attr(el, "name").getOrElse(
      GraftException.badRequest("<Cube> without name"))
    val fact = children(el, "Table").headOption.flatMap(attr(_, "name"))
      .getOrElse(GraftException.badRequest(
        s"cube '$name': no <Table> fact (a <View> fact is not supported — " +
          "register the view's SQL as a derived table instead)"))

    // document order matters for nothing here, but keep it for metadata
    val dims = {
      val nl = el.getChildNodes
      (0 until nl.getLength).map(nl.item).collect {
        case e: Element if e.getTagName == "DimensionUsage" =>
          val src = attr(e, "source").getOrElse(GraftException.badRequest(
            s"cube '$name': <DimensionUsage> without source"))
          val x = shared.getOrElse(src, GraftException.badRequest(
            s"cube '$name': DimensionUsage names unknown dimension '$src'"))
          bindDim(x, attr(e, "name").getOrElse(src), attr(e, "foreignKey"),
            fact, name, joinsAcc, pcAcc)
        case e: Element if e.getTagName == "Dimension" =>
          val x = parseDim(e)
          bindDim(x, x.name, x.foreignKey, fact, name, joinsAcc, pcAcc)
      }
    }

    val measures = children(el, "Measure").map { m =>
      val mn = attr(m, "name").getOrElse(
        GraftException.badRequest(s"cube '$name': <Measure> without name"))
      val ex = sqlExpr(m, "MeasureExpression")
        .map(stripTableQualifiers(_, fact))
        .orElse(attr(m, "column").map(colExpr))
        .getOrElse(GraftException.badRequest(
          s"cube '$name': measure '$mn' has neither column nor expression"))
      val agg = attr(m, "aggregator").flatMap(aggregators.get).getOrElse(
        GraftException.badRequest(
          s"cube '$name': measure '$mn' has unknown aggregator " +
            s"'${attr(m, "aggregator").getOrElse("")}'"))
      MeasureDef(mn, san(mn), agg, ex,
        formatString = attr(m, "formatString"),
        annotations = parseAnnotations(m))
    }

    // calculated members translate in document order so later formulas can
    // reference earlier calc aliases (ref Profit Growth → Profit last Period)
    val aliasMap = scala.collection.mutable.LinkedHashMap.empty[String, String]
    measures.foreach(m => aliasMap += m.name -> m.alias)
    val calcAcc = scala.collection.mutable.ListBuffer.empty[CalcMemberDef]
    val lagAcc = scala.collection.mutable.ListBuffer.empty[LagMeasureDef]
    children(el, "CalculatedMember").foreach { cm =>
      val cn = attr(cm, "name").getOrElse(
        GraftException.badRequest(s"cube '$name': CalculatedMember without name"))
      if (!attr(cm, "dimension").forall(_ == "Measures"))
        skippedAcc += SkippedFormula(name, cn, "",
          s"non-Measures calculated member (dimension=${attr(cm, "dimension").getOrElse("")})")
      else {
        val formula = attr(cm, "formula")
          .orElse(children(cm, "Formula").headOption
            .map(_.getTextContent.trim))
          .getOrElse(GraftException.badRequest(
            s"cube '$name': calculated member '$cn' without formula"))
        // <CalculatedMemberProperty name="FORMAT_STRING" value="$#,##0.00"/>
        val fmt = children(cm, "CalculatedMemberProperty")
          .find(p => attr(p, "name").contains("FORMAT_STRING"))
          .flatMap(attr(_, "value"))
        translateFormula(formula, san(cn), aliasMap.toMap) match {
          case FormulaCalc(c) =>
            calcAcc += c.copy(formatString = fmt); aliasMap += cn -> c.alias
          case FormulaLag(l) => lagAcc += l; aliasMap += cn -> l.alias
          case FormulaSkip(reason) =>
            skippedAcc += SkippedFormula(name, cn, formula, reason)
        }
      }
    }

    val namedSets = children(el, "NamedSet").flatMap { ns =>
      val nn = attr(ns, "name").getOrElse(
        GraftException.badRequest(s"cube '$name': NamedSet without name"))
      val formula = attr(ns, "formula").orElse(
        children(ns, "Formula").headOption.map(_.getTextContent.trim))
        .getOrElse("")
      parseTopCount(formula, aliasMap.toMap) match {
        case Some((dim, level, k, by)) => Some(NamedSetDef(nn, dim, level, k, by,
          annotations = parseAnnotations(ns)))
        case None =>
          skippedAcc += SkippedFormula(name, nn, formula,
            "named set formula is not TopCount(<level>.Members, k, <measure>)")
          None
      }
    }

    CubeDef(name, fact, dims.toSeq, measures, calcAcc.toList, lagAcc.toList,
      namedSets = namedSets, defaultMeasure = attr(el, "defaultMeasure"),
      annotations = parseAnnotations(el))
  }

  /** Mondrian generic-dialect SQL qualifies fact columns as
    * `fact_table.column` / `"fact"."column"` / `` `fact`.`column` `` —
    * Spark sees an unresolvable qualifier over the registered frame, so
    * strip the fact-table prefix (and normalize double-quoted identifiers
    * to plain ones). */
  private def stripTableQualifiers(sql: String, fact: String): String = {
    // word-boundary match only: an identifier that merely CONTAINS the
    // fact name ("total_sales_fact.amount" for fact "sales_fact") must
    // survive untouched
    val f = java.util.regex.Pattern.quote(fact)
    sql.replaceAll(s"`$f`\\.", "")
      .replaceAll("\"" + f + "\"\\.", "")
      .replaceAll(s"(?<![A-Za-z0-9_`\"])$f\\.", "")
      .replaceAll("\"([A-Za-z_][A-Za-z0-9_]*)\"", "$1")
  }

  private sealed trait FormulaResult
  private final case class FormulaCalc(c: CalcMemberDef) extends FormulaResult
  private final case class FormulaLag(l: LagMeasureDef) extends FormulaResult
  private final case class FormulaSkip(reason: String) extends FormulaResult

  private val measureRef = "(?:\\[Measures\\]|Measures)\\.\\[([^\\]]+)\\]".r
  private val lagPattern = ("(?i)^\\s*COALESCEEMPTY\\s*\\(\\s*\\(\\s*" +
    "(?:\\[Measures\\]|Measures)\\.\\[([^\\]]+)\\]\\s*,\\s*" +
    "\\[([^\\]]+)\\](?:\\.\\[[^\\]]+\\])*\\.PREVMEMBER\\s*\\)\\s*,\\s*" +
    "(?:\\[Measures\\]|Measures)\\.\\[([^\\]]+)\\]\\s*\\)\\s*$").r

  /** `[Measures].[X]` refs → aliases; the COALESCEEMPTY-PREVMEMBER idiom →
    * a lag measure; anything still holding MDX brackets after substitution
    * is outside the compiled subset → skipped with the reason. */
  private def translateFormula(formula: String, alias: String,
      aliases: Map[String, String]): FormulaResult =
    formula match {
      case lagPattern(base, timeDim, coalesceTo)
          if base == coalesceTo && aliases.contains(base) =>
        FormulaLag(LagMeasureDef(alias, aliases(base), timeDim,
          coalesceToBase = true))
      case _ =>
        var unknown: Option[String] = None
        val aliasValues = aliases.values.toSet
        val substituted = measureRef.replaceAllIn(formula, m => {
          val ref = m.group(1)
          // display name → alias; a calc member's display name survives
          // only as its sanitized alias, so fall back to that form
          aliases.get(ref)
            .orElse(Some(san(ref)).filter(aliasValues.contains)) match {
            case Some(a) => java.util.regex.Matcher.quoteReplacement(a)
            case None => unknown = Some(ref); m.matched
          }
        })
        unknown match {
          case Some(ref) =>
            FormulaSkip(s"references unknown measure '$ref'")
          case None if substituted.contains("[") =>
            FormulaSkip("uses MDX member calculus outside the compiled " +
              "subset (tuples / navigation beyond PREVMEMBER)")
          case None => FormulaCalc(CalcMemberDef(alias, substituted))
        }
    }

  private val topCountPattern = ("(?i)^\\s*TopCount\\s*\\(\\s*" +
    "\\[([^\\]]+)\\]\\.\\[([^\\]]+)\\]\\.MEMBERS\\s*,\\s*(\\d+)\\s*,\\s*" +
    "(?:\\[Measures\\]|Measures)\\.\\[([^\\]]+)\\]\\s*\\)\\s*$").r

  private def parseTopCount(formula: String,
      aliases: Map[String, String]): Option[(String, String, Int, String)] =
    formula match {
      case topCountPattern(dim, level, k, measure) =>
        aliases.get(measure).map(a => (dim, level, k.toInt, a))
      case _ => None
    }

  // --------------------------------------------------------- virtual cubes

  private def parseVirtual(el: Element, cubes: Seq[CubeDef],
      skippedAcc: scala.collection.mutable.ListBuffer[SkippedFormula])
      : VirtualCubeDef = {
    val name = attr(el, "name").getOrElse(
      GraftException.badRequest("<VirtualCube> without name"))
    // measure display name → alias, per member cube (incl. calc members)
    def cubeAliases(c: CubeDef): Map[String, String] =
      c.measures.map(m => m.name -> m.alias).toMap ++
        c.calcMembers.map(cm => cm.alias -> cm.alias) ++
        c.lagMeasures.map(l => l.alias -> l.alias)
    val vms = children(el, "VirtualCubeMeasure").flatMap { vm =>
      val cn = attr(vm, "cubeName").getOrElse(GraftException.badRequest(
        s"virtual cube '$name': VirtualCubeMeasure without cubeName"))
      val mn = attr(vm, "name").map(stripBrackets).map(_.last).getOrElse(
        GraftException.badRequest(
          s"virtual cube '$name': VirtualCubeMeasure without name"))
      val cube = cubes.find(_.name == cn).getOrElse(
        GraftException.badRequest(
          s"virtual cube '$name': unknown member cube '$cn'"))
      // a measure name that resolves neither as a declared measure nor as
      // a (translated) calc alias was skipped during cube parse — skip its
      // virtual projection too, with a trail
      cubeAliases(cube).get(mn).orElse(cubeAliases(cube).get(san(mn))) match {
        case Some(a) => Some(cn -> a)
        case None =>
          skippedAcc += SkippedFormula(name, mn, "",
            s"virtual measure references '$mn' which cube '$cn' did not translate")
          None
      }
    }
    val grouped = vms.groupBy(_._1).map { case (c, ms) =>
      c -> ms.map(_._2)
    }.toSeq.sortBy(_._1)
    val allAliases: Map[String, String] = cubes.flatMap(c =>
      cubeAliases(c).toSeq).toMap
    val calcs = children(el, "CalculatedMember").flatMap { cm =>
      val cn = attr(cm, "name").getOrElse("")
      val formula = attr(cm, "formula").orElse(
        children(cm, "Formula").headOption.map(_.getTextContent.trim))
        .getOrElse("")
      translateFormula(formula, san(cn), allAliases) match {
        case FormulaCalc(c) => Some(c)
        case FormulaLag(_) =>
          skippedAcc += SkippedFormula(name, cn, formula,
            "lag calculated members on virtual cubes are not supported")
          None
        case FormulaSkip(reason) =>
          skippedAcc += SkippedFormula(name, cn, formula, reason); None
      }
    }
    VirtualCubeDef(name, grouped, calcs)
  }

  // ---------------------------------------------------------------- roles

  private def parseRole(el: Element, cubes: Seq[CubeDef]): RoleDef = {
    val name = attr(el, "name").getOrElse(
      GraftException.badRequest("<Role> without name"))
    val sg = children(el, "SchemaGrant").headOption.getOrElse(
      GraftException.badRequest(s"role '$name': no <SchemaGrant>"))
    val schemaAccess = attr(sg, "access").getOrElse("all") match {
      // Mondrian's schema access "all_dimensions" behaves as none-for-cubes
      case "all_dimensions" => "none"
      case a => a
    }
    val cubeGrants = children(sg, "CubeGrant").map { cg =>
      val cubeName = attr(cg, "cube").getOrElse(GraftException.badRequest(
        s"role '$name': CubeGrant without cube"))
      val cube = cubes.find(_.name == cubeName)
      val hgs = children(cg, "HierarchyGrant").map(parseHierarchyGrant(
        name, cubeName, cube, _))
      CubeGrantDef(cubeName, attr(cg, "access").getOrElse("all"), hgs)
    }
    RoleDef(name, schemaAccess, cubeGrants)
  }

  private def parseHierarchyGrant(role: String, cubeName: String,
      cube: Option[CubeDef], el: Element): HierarchyGrantDef = {
    def err(msg: String): Nothing =
      GraftException.badRequest(s"role '$role' / cube '$cubeName': $msg")
    // hierarchy="[Store]" names the dim; "[Time.Weekly]" dim + hierarchy
    val href = attr(el, "hierarchy").map(stripBrackets).getOrElse(
      err("HierarchyGrant without hierarchy"))
    val (dimName, hierName) = href.head.split("\\.").toSeq match {
      case Seq(d) => (d, None)
      case Seq(d, h) => (d, Some(h))
      case _ => err(s"unparseable hierarchy ref '${href.head}'")
    }
    val dim = cube.flatMap(_.dimension(dimName))
    val hier = dim.flatMap(_.hierarchy(hierName))
    def levelNameOf(ref: String): String = stripBrackets(ref).last
    val access = attr(el, "access").getOrElse("custom")
    val memberGrants = children(el, "MemberGrant").map { mg =>
      val path = attr(mg, "member").map(stripBrackets).getOrElse(
        err("MemberGrant without member"))
      // [Store].[USA].[CA] → segments after the dim walk the levels
      val keys = path.drop(1)
      if (keys.isEmpty) err(s"member grant path too short: ${path.mkString(".")}")
      val levelName = hier match {
        case Some(h) if keys.length <= h.levels.length =>
          h.levels(keys.length - 1).name
        case Some(h) =>
          err(s"member path deeper than hierarchy ${dimName}.${h.name}")
        case None => // unknown cube (virtual-only grant) — positional name
          s"level${keys.length - 1}"
      }
      // keys.init rides along as the ancestor path so the grant stays
      // confined to its declared branch (leaf keys repeat across parents:
      // [Time].[1997].[Q1] must not grant Q1 of 1998)
      MemberGrantDef(levelName, Seq(keys.last),
        attr(mg, "access").getOrElse("all"), path = keys.init)
    }
    HierarchyGrantDef(
      dim = dimName,
      hierarchy = hierName,
      access = access,
      topLevel = attr(el, "topLevel").map(levelNameOf),
      bottomLevel = attr(el, "bottomLevel").map(levelNameOf),
      rollupPolicy = attr(el, "rollupPolicy").getOrElse("partial"),
      memberGrants = memberGrants)
  }
}
