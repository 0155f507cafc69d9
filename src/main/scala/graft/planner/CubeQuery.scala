package graft.planner

/** Query IR — the Spark-native analog of the reference's REST→MDX parameter
  * set (reference lib/mondrian_rest/query_helper.rb; operator inventory
  * SURVEY.md §2.A). A [[CubeQuery]] is what the REST layer produces and what
  * [[Planner]] turns into one declarative DataFrame plan.
  */

/** `Dim`, `Dim.Level`, or `Dim.Hierarchy.Level` (ref query_helper.rb:99-135). */
final case class LevelRef(dim: String, level: Option[String] = None,
    hierarchy: Option[String] = None)

/** Cut expressions (ref query_helper.rb:45-93; grammar §2.A A4-A7). Values are
  * member keys, typed as the level key's natural Scala type. */
sealed trait Cut
final case class MemberCut(level: LevelRef, key: Any) extends Cut
final case class SetCut(level: LevelRef, keys: Seq[Any]) extends Cut
final case class RangeCut(level: LevelRef, lo: Any, hi: Any) extends Cut
final case class NamedSetCut(set: String) extends Cut
/** Ad-hoc TopCount/BottomCount restriction (MDX `TOPCOUNT(set, k, measure)`
  * without a schema named set): keep the k best members of the level by the
  * measure — `asc = true` is BOTTOMCOUNT (k worst). */
final case class TopKCut(level: LevelRef, k: Int, byMeasure: String,
    asc: Boolean = false) extends Cut
/** Negated member-set cut (MDX `EXCEPT([L].Members, {…})`): every member of
  * the level EXCEPT these keys — a NOT IN that still pushes into the scan. */
final case class ExcludeCut(level: LevelRef, keys: Seq[Any]) extends Cut
/** Member-navigation cut (MDX `ANCESTOR(m, level)` / `m.Parent` /
  * `m.FirstChild` / `m.LastChild` / `OPENINGPERIOD(level, m)` /
  * `CLOSINGPERIOD(level, m)`): the single member at `target` reached by
  * navigating the hierarchy from the member `key` of level `of`. The key
  * of the navigated-to member is resolved at PLAN time with one memoized
  * 1-row lookup against the dimension's own table (degenerate dims: the
  * fact), then the cut is an ordinary pushdown-able equality on `target`.
  * `mode` ∈ ancestor (target above `of`) | first | last (the edge
  * descendant of `of` at `target`, by the hierarchy's member order). */
final case class NavCut(of: LevelRef, key: Any, target: LevelRef,
    mode: String) extends Cut
/** Explicit axis TUPLE SET (MDX `{([D1].[L1].[k1], [D2].[L2].[k2]), …}
  * ON ROWS`): the axis enumerates exactly these member COMBINATIONS —
  * Mondrian's hand-picked-tuples axis. `levels` is the shared
  * per-position level list (every tuple names the same levels in the
  * same order — tuple-set well-formedness), `rows` the key combinations.
  * The parser emits it ALONGSIDE one per-level [[SetCut]] (the union of
  * that position's keys), which does the scan pruning and bounds the
  * dense member domains; the planner then applies this cut AFTER
  * densification as one axis-sized OR-of-ANDs literal predicate — dense
  * shapes keep listed-but-empty tuples as null cells while unlisted
  * combinations from the domains' cross product never appear. */
final case class TupleCut(levels: Seq[LevelRef],
    rows: Seq[Seq[Any]]) extends Cut
/** TopPercent / TopSum restriction (MDX `TOPPERCENT(set, p, m)` /
  * `TOPSUM(set, s, m)`): the minimal descending-by-measure prefix of the
  * level's members whose cumulative total reaches the threshold — a percent
  * of the set total (`absolute = false`, Pareto-style "members covering p%
  * of revenue") or an absolute sum (`absolute = true`). `within` carries
  * the argument set's own restrictions (`TOPPERCENT(EXCEPT(...), …)`), so
  * both the prefix and the percent denominator are computed over the GIVEN
  * set, not the whole level. (Like inline TOPCOUNT, evaluation is cube
  * context — the slicer does not restrict the selection.) `asc = true` is
  * the BOTTOMPERCENT / BOTTOMSUM form: the minimal ASCENDING-by-measure
  * prefix (the long tail covering the threshold). */
final case class TopShareCut(level: LevelRef, threshold: Double,
    byMeasure: String, absolute: Boolean = false,
    within: Seq[Cut] = Nil, asc: Boolean = false) extends Cut

/** Axis drilldowns (ref A2/A15). */
sealed trait Drill
final case class LevelDrill(level: LevelRef) extends Drill
final case class NamedSetDrill(set: String) extends Drill

/** Post-aggregation measure predicate, ANDed (HAVING; ref A10,
  * query_helper.rb:4-7 ops `> < >= <= = <>`). */
final case class MeasureFilter(measure: String, op: String, value: Double)

/** Axis ordering (ref A11): by a measure alias, or by a drilled level's
  * key/caption/ordinal/property. */
sealed trait OrderTarget
final case class OrderByMeasure(measure: String) extends OrderTarget
final case class OrderByLevel(level: LevelRef, what: String = "key")
    extends OrderTarget // what ∈ key | caption | ordinal | <property name>
final case class OrderSpec(target: OrderTarget, desc: Boolean = false)

/** Requested member property column (ref C4, api_helpers.rb:96-132). */
final case class PropertyRef(level: LevelRef, property: String)

/** MDX `Generate(set1, TopCount(set2, k, m))` — the "top N per group"
  * idiom: for each member of set1 the inner TopCount evaluates in that
  * member's context and the results concatenate. The axis partitions on
  * set1's drilled levels (the FIRST `groupDrills` drilldowns) and keeps
  * `k` tuples per partition by `measure` (desc for TopCount, asc for
  * BottomCount); within each partition the axis preserves the inner
  * ranking order, like Mondrian's Generate output.
  *
  * `threshold` selects the TopPercent/TopSum inner form instead: the
  * minimal per-group ordered prefix whose cumulative measure reaches the
  * threshold (percent of the GROUP total, or an absolute sum when
  * `absolute`) — `k` is ignored. Same cumulative-before < limit
  * semantics as the axis-level TopShareCut, per group.
  *
  * `orderOnly` selects the inner ORDER form: every tuple survives, the
  * per-group ranking only ORDERS each set1 block by the measure —
  * `k`/`threshold` are ignored. */
final case class GroupTopSpec(groupDrills: Int, k: Int, measure: String,
    desc: Boolean = true, threshold: Option[Double] = None,
    absolute: Boolean = false, orderOnly: Boolean = false)

final case class CubeQuery(
    cube: String,
    drilldowns: Seq[Drill],
    measures: Seq[String],
    cuts: Seq[Cut] = Nil,
    filters: Seq[MeasureFilter] = Nil,        // HAVING, applied before order
    order: Option[OrderSpec] = None,
    offset: Long = 0,
    limit: Option[Long] = None,
    // MDX TAIL(set, n): keep the LAST n tuples of the axis order (emitted
    // in forward order). Applied before offset/limit, so HEAD(TAIL(s, n),
    // k) and SUBSET(TAIL(s, n), …) page within the tail.
    tailLimit: Option[Long] = None,
    // MDX Generate(set1, TopCount(set2, k, m)): per-group top-k, applied
    // before DISTINCT/TAIL/ORDER/SUBSET in the finish sequence (one
    // GroupedTopK bounded-heap pass, never a per-group sort)
    groupTop: Option[GroupTopSpec] = None,
    // HAVING applied AFTER the groupTop truncation — the axis-level
    // FILTER wrapping a truncating GENERATE (Mondrian evaluates the
    // generated set first, THEN filters it, so a top-2 member failing
    // the predicate is dropped, never back-filled by rank 3). Distinct
    // from `filters`, which prune BEFORE the ranking (the composed
    // inner-FILTER form).
    postFilters: Seq[MeasureFilter] = Nil,
    nonempty: Boolean = true,   // groupBy output is naturally nonempty; dense
    // mode (the reference's default JSON shape) densifies via member-domain
    // cross product + left join (SURVEY §2.4 C1)
    distinct: Boolean = false,
    parents: Boolean = false,                  // C3: prepend ancestor columns
    properties: Seq[PropertyRef] = Nil,
    captions: Seq[PropertyRef] = Nil,          // C4: property replaces caption
    sparse: Boolean = false,                   // C6: drop all-null measure rows
    // Query-scoped calculated measures (MDX `WITH MEMBER [Measures].[X] AS
    // '<formula>'`): merged with the cube's schema calc members at plan time.
    adhocCalcs: Seq[graft.model.CalcMemberDef] = Nil,
    // Lag measures synthesized from MDX tuple navigation —
    // `([Measures].[M], [Time].PrevMember)` / `[Time].Lag(n)` inside a WITH
    // MEMBER formula — merged with the cube's declared lag measures.
    adhocLags: Seq[graft.model.LagMeasureDef] = Nil,
    // ALL-member tuple totals — `([Measures].[M], [Dim].[All ...])` — same
    // merge path as adhocLags.
    adhocTotals: Seq[graft.model.TotalMeasureDef] = Nil,
    // PERIODSTODATE running sums — `Sum(PeriodsToDate([T].[Year]), [M])` /
    // `Sum(Ytd(), [M])` — and trailing moving averages —
    // `Avg(LastPeriods(n), [M])` — synthesized the same way.
    adhocCums: Seq[graft.model.CumMeasureDef] = Nil,
    adhocMovings: Seq[graft.model.MovingMeasureDef] = Nil,
    // `Rank([D].CurrentMember, [D].[L].Members, [Measures].[M])` inside a
    // WITH MEMBER formula — the member's 1-based rank by the measure among
    // the axis members of its dimension (ties share a rank).
    adhocRanks: Seq[graft.model.RankMeasureDef] = Nil,
    // `Avg|Min|Max(<level>.Members, [Measures].[M])` inside a WITH MEMBER
    // formula — the axis-set aggregate benchmark (TotalMeasureDef's SUM
    // generalized; same merge path).
    adhocSetAggs: Seq[graft.model.SetAggMeasureDef] = Nil,
    // Fixed-member tuples — `([Measures].[M], [Dim].[Level].[Key])` inside
    // a WITH MEMBER formula (the pin-to-a-member idiom); same merge path.
    adhocPinned: Seq[graft.model.PinnedMeasureDef] = Nil,
    // `COUNT(<level>.Members)` inside a WITH MEMBER formula — (alias,
    // level). Mondrian evaluates Level.Members through the schema reader
    // (role-visible members, NOT slicer-filtered), so the value is a
    // plan-time constant per (cube, level, role): the planner substitutes
    // the memoized count into the formula before calc evaluation.
    adhocCounts: Seq[(String, LevelRef)] = Nil,
    // B18: evaluate under this schema-declared role's grants. Part of the
    // case-class identity ON PURPOSE — the per-catalog query-result cache
    // keys on the normalized CubeQuery, so two roles can never share a
    // cached axis.
    role: Option[String] = None)
