package graft.planner

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.CubeCatalog
import graft.model._

/** B18 — roles and access grants (ref Mondrian `<Role>`/`<SchemaGrant>`/
  * `<CubeGrant>`/`<HierarchyGrant>`/`<MemberGrant>`; mondrian-rest loads
  * schemas that may declare them but never surfaces a role over REST — here
  * the REST layer selects one with `role=`/`X-Graft-Role`).
  *
  * Enforcement is split along Spark's execution model:
  *
  *  - cube/dimension/level access and the topLevel..bottomLevel band are
  *    plan-time checks → 403 before any job runs;
  *  - `partial` rollup policy compiles the member-visibility predicate into
  *    a filter on the joined fact frame, so Catalyst pushes it into the
  *    scans like any cut and every rollup (axis cells, totals, grand
  *    totals) aggregates visible members only;
  *  - `full` policy never filters the fact: axis membership is a
  *    broadcast-sized semi-join of the aggregated axis against the visible
  *    member list (dim-frame side), so ancestor cells keep their complete
  *    values while invisible members drop off the axis;
  *  - `hidden` policy additionally masks (nulls) any measure cell whose
  *    member subtree is not FULLY visible — a per-drilled-key
  *    `min(visible)` flag joined from the dim frame.
  *
  * Grants are per-hierarchy, like Mondrian's: a grant on Geography's
  * default hierarchy does not constrain a Weekly hierarchy of the same
  * dimension unless that hierarchy has its own grant.
  *
  * Degenerate dimensions (no dim table) evaluate the visibility predicate
  * over the fact itself; `partial` stays a pure scan filter, but `full`/
  * `hidden` membership lookups then cost a fact-side distinct — prefer
  * `partial` for degenerate dims at scale.
  */
object Roles {

  /** Resolve a query's role name. None → unrestricted (a Mondrian
    * connection with no role). Unknown names are 403, not 404: the role
    * list is itself access-control metadata. */
  def resolve(schema: SchemaDef, name: Option[String]): Option[RoleDef] =
    name.map(n => schema.role(n).getOrElse(
      GraftException.forbidden(s"unknown role '$n'")))

  def checkCubeAccess(role: RoleDef, cubeName: String): Unit =
    if (!role.cubeVisible(cubeName))
      GraftException.forbidden(
        s"role '${role.name}' has no access to cube '$cubeName'")

  /** The grant governing one hierarchy of one dimension in one cube, if
    * any. A grant with no `hierarchy` names the dimension's DEFAULT
    * hierarchy (and an access="none" grant with no hierarchy denies the
    * whole dimension). */
  def grantFor(role: RoleDef, cubeName: String, dim: DimensionDef,
      hier: HierarchyDef): Option[HierarchyGrantDef] =
    role.cubeGrant(cubeName).flatMap(_.hierarchyGrants.find(g =>
      g.dim == dim.name && (g.access == "none" && g.hierarchy.isEmpty ||
        g.hierarchy.getOrElse(dim.defaultHierarchy.name) == hier.name)))

  /** One custom grant bound to its resolved dimension/hierarchy. */
  final case class DimGrant(dim: DimensionDef, hier: HierarchyDef,
      grant: HierarchyGrantDef) {

    /** Whether the grant restricts MEMBERSHIP (band-only grants restrict
      * levels, which is a pure plan-time check — no data-side work). */
    def restricts: Boolean = grant.memberGrants.nonEmpty

    /** Member-visibility predicate over any frame where the hierarchy's
      * level key expressions evaluate (the dim frame, or the joined fact).
      * Ordered member grants fold into a CASE chain where the LAST
      * matching entry wins (Mondrian nested-grant override); anything no
      * entry names is denied. No member grants → the whole band visible. */
    def visibleCol: Column =
      if (grant.memberGrants.isEmpty) lit(true)
      else grant.memberGrants.foldLeft(lit(false)) { (acc, mg) =>
        val lvl = hier.level(mg.level).getOrElse(GraftException.badRequest(
          s"member grant level '${mg.level}' not found in ${dim.name}.${hier.name}"))
        when(expr(lvl.keyExpr).isin(mg.keys: _*), lit(mg.access == "all"))
          .otherwise(acc)
      }

    /** Level depths inside the visible band. */
    def bandDepths: Range = {
      val top = grant.topLevel.map(l => hier.levels.indexWhere(_.name == l))
        .getOrElse(0)
      val bottom = grant.bottomLevel
        .map(l => hier.levels.indexWhere(_.name == l))
        .getOrElse(hier.levels.size - 1)
      top to bottom
    }

    def levelVisible(depth: Int): Boolean =
      grant.access != "none" && bandDepths.contains(depth)
  }

  /** All custom grants the role holds on this cube's hierarchies. */
  def customGrants(role: Option[RoleDef], cube: CubeDef): Seq[DimGrant] =
    role.toSeq.flatMap { r =>
      for {
        dim <- cube.dimensions
        hier <- dim.hierarchies
        g <- grantFor(r, cube.name, dim, hier) if g.access == "custom"
      } yield DimGrant(dim, hier, g)
    }

  /** 403 any drill/cut/property level the role cannot see: denied
    * hierarchy, or level outside the custom band. */
  def validateLevels(role: RoleDef, cube: CubeDef,
      levels: Seq[Planner.ResolvedLevel]): Unit =
    levels.foreach { rl =>
      grantFor(role, cube.name, rl.dim, rl.hier).foreach { g =>
        if (g.access == "none")
          GraftException.forbidden(
            s"role '${role.name}' has no access to dimension '${rl.dim.name}'")
        if (g.access == "custom" &&
            !DimGrant(rl.dim, rl.hier, g).levelVisible(rl.depth))
          GraftException.forbidden(
            s"role '${role.name}' cannot see level '${rl.level.name}' of '${rl.dim.name}'")
      }
    }

  /** The frame member visibility evaluates over: the dimension table, or
    * the fact for degenerate dimensions. */
  def dimFrame(cat: CubeCatalog, cube: CubeDef, dg: DimGrant): DataFrame =
    dg.dim.join match {
      case Some(js) => cat.table(js.table)
      case None => cat.fact(cube)
    }

  /** Post-aggregation enforcement for `full`/`hidden` grants whose
    * dimension is on the axis, plus `hidden` masking for grants whose
    * dimension is NOT drilled (the rollup then spans invisible members →
    * null). `partial` grants need nothing here: their fact filter already
    * shaped every cell, and densify's domains were restricted at the
    * source.
    *
    * @param semiJoinMembership false in dense mode — densify built the
    *        axis from role-filtered member domains, so membership is
    *        already decided and a second semi-join would be wasted work
    */
  def applyPostAgg(cat: CubeCatalog, cube: CubeDef, df0: DataFrame,
      grants: Seq[DimGrant], groupLevels: Seq[Planner.ResolvedLevel],
      measureAliases: Seq[String], semiJoinMembership: Boolean): DataFrame =
    grants.filter(g => g.restricts && g.grant.rollupPolicy != "partial")
      .foldLeft(df0) { (df, dg) =>
        val drilled = groupLevels.filter(rl =>
          rl.dim.name == dg.dim.name && rl.hier.name == dg.hier.name)
        if (drilled.isEmpty) {
          // Undrilled hierarchy: every cell is a rollup across ALL its
          // members. full → show it; hidden → the rollup includes members
          // a custom grant withholds, so it is null. (A custom grant with
          // member grants is treated as restricting — deciding "the grants
          // happen to cover every member" would cost a data-side check on
          // every query for a vanishingly rare schema.)
          if (dg.grant.rollupPolicy == "hidden" &&
              dg.grant.memberGrants.nonEmpty)
            measureAliases.foldLeft(df)((d, m) =>
              d.withColumn(m, lit(null).cast(d.schema(m).dataType)))
          else df
        } else {
          val keyAliases = drilled.map(_.level.alias)
          val keyCols = drilled.map(rl =>
            expr(rl.level.keyExpr).as(rl.level.alias))
          val src = dimFrame(cat, cube, dg)
          val membership =
            if (!semiJoinMembership) df
            else df.join(
              broadcast(src.filter(dg.visibleCol)
                .select(keyCols: _*).distinct()),
              keyAliases, "left_semi")
          if (dg.grant.rollupPolicy == "full") membership
          else {
            // hidden: null any cell whose deepest drilled member has an
            // invisible descendant — min(visible) over the subtree
            val completeness = src
              .groupBy(keyCols: _*)
              .agg(min(dg.visibleCol).as("__role_complete"))
            val joined = membership.join(broadcast(completeness),
              keyAliases, "left")
            measureAliases.foldLeft(joined)((d, m) =>
              d.withColumn(m, when(col("__role_complete"), col(m))
                .otherwise(lit(null).cast(d.schema(m).dataType))))
              .drop("__role_complete")
          }
        }
    }

  // ------------------------------------------------------------- metadata

  /** Cubes the role may list (ref Mondrian SchemaGrant semantics). */
  def visibleCubes(schema: SchemaDef, role: Option[RoleDef]): Seq[CubeDef] =
    role match {
      case None => schema.cubes
      case Some(r) => schema.cubes.filter(c => r.cubeVisible(c.name))
    }

  def visibleVirtualCubes(schema: SchemaDef,
      role: Option[RoleDef]): Seq[VirtualCubeDef] = role match {
    case None => schema.virtualCubes
    case Some(r) => schema.virtualCubes.filter(v => r.cubeVisible(v.name))
  }

  /** The cube as the role sees it: denied hierarchies dropped (a dimension
    * with none left disappears), custom bands truncated to their visible
    * levels. Serialization-side only — the planner enforces on the
    * original definition. */
  def filteredCube(role: Option[RoleDef], cube: CubeDef): CubeDef =
    role match {
      case None => cube
      case Some(r) =>
        val dims = cube.dimensions.flatMap { dim =>
          val hiers = dim.hierarchies.flatMap { h =>
            grantFor(r, cube.name, dim, h) match {
              case Some(g) if g.access == "none" => None
              case Some(g) if g.access == "custom" =>
                val band = DimGrant(dim, h, g).bandDepths
                Some(h.copy(levels =
                  h.levels.zipWithIndex.collect {
                    case (l, i) if band.contains(i) => l
                  }))
              case _ => Some(h)
            }
          }
          if (hiers.isEmpty) None else Some(dim.copy(hierarchies = hiers))
        }
        cube.copy(dimensions = dims)
    }
}
