package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semi-structured event payload operators: the `props` column carries JSON;
  * extraction stays in Catalyst (`get_json_object`) — no UDFs, codegen'd,
  * pushdown-friendly. */
object EventOps {

  /** AS-OF JOIN — attach to each event the most recent state row at or
    * before the event's time (ties on the state timestamp broken by the
    * highest `stateOrd`, e.g. the largest order key). Spark has no native
    * as-of join; the naive inequality join is a range join that blows up
    * O(|events|·|states per key|). This is the SCALE form: union both
    * streams, ONE shuffle+sort per key, and carry the latest state forward
    * with last(_, ignoreNulls) over an unbounded-preceding frame — cost is
    * a single sort of (events + states), independent of how many states
    * precede each event.
    *
    * Inputs: events(user_id, event_id, t) and states(user_id, t, ord, value)
    * with `t` of one comparable type (here DATE). Output: one row per event
    * with the as-of `ord`/`value` (null when no state precedes). */
  def asofJoin(events: DataFrame, states: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("t"),
      lit(0).as("is_state"), lit(null).cast("long").as("ord"),
      col("event_id"), lit(null).cast("double").as("value"))
    val st = states.select(col("user_id"), col("t"),
      lit(1).as("is_state"), col("ord"),
      lit(null).cast("long").as("event_id"), col("value"))
    // same (user, t): states first (is_state desc), multiple states by ord
    // asc so the carried-forward last() is the max-ord state
    val w = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("is_state").desc, col("ord").asc_nulls_last,
        col("event_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(st)
      .withColumn("asof_ord",
        last(when(col("is_state") === 1, col("ord")), ignoreNulls = true)
          .over(w))
      .withColumn("asof_value",
        last(when(col("is_state") === 1, col("value")), ignoreNulls = true)
          .over(w))
      .where(col("is_state") === 0)
      .select(col("event_id"), col("user_id"), col("t"),
        col("asof_ord"), col("asof_value"))
      .orderBy("event_id")
  }

  /** ORDERED FUNNEL: for each user, the first time they completed step 1,
    * then step 2 at-or-after that, then step 3 at-or-after THAT, etc. —
    * the sequential-conversion analysis behind product funnels. Rows are
    * the step-1 cohort; later step times are null once the user drops out
    * (monotone by construction: t_{i+1} only exists given t_i).
    *
    * Each step is a filtered min-aggregate keyed on user_id joined to the
    * previous step's frontier — all shuffles share the user_id key, so the
    * exchange is reused across steps; no windows over full event history,
    * no per-user event arrays. Timestamps surface as epoch MICROS longs
    * (raw timestamps diverge between engines on the nanos parquet). */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val base = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    val stepTimes = steps.zipWithIndex
      .foldLeft(Vector.empty[DataFrame]) { case (acc, (step, i)) =>
        val t = s"t${i + 1}_us"
        val evs = base.where(col("event_type") === step)
        val reached = acc.lastOption match {
          case None =>
            evs.groupBy("user_id").agg(min(col("ts_us")).as(t))
          case Some(prev) =>
            val pt = s"t$i" + "_us"
            evs.join(prev.select(col("user_id"), col(pt)), Seq("user_id"))
              .where(col("ts_us") >= col(pt))
              .groupBy("user_id").agg(min(col("ts_us")).as(t))
        }
        acc :+ reached
      }
    val joined = stepTimes.tail.foldLeft(stepTimes.head) { (l, r) =>
      l.join(r, Seq("user_id"), "left")
    }
    joined
      .withColumn("steps_completed",
        steps.indices.map(i =>
          when(col(s"t${i + 1}_us").isNotNull, 1).otherwise(0))
          .reduce(_ + _))
      .orderBy("user_id")
  }

  /** WINDOWED funnel — [[funnel]] with a maximum gap between CONSECUTIVE
    * steps (the product-analytics "converted within N hours" constraint):
    * each later step is the earliest occurrence in
    * `[t_prev, t_prev + windowSecs]`; outside the window the user stalls
    * at the previous step even if the event happens later. Anchoring
    * matches [[funnel]]: t1 is the user's FIRST step-1 event (the step-1
    * cohort — no re-anchoring on later step-1 occurrences; that keeps the
    * result a deterministic chain of min-aggregations instead of a
    * per-user sequence scan). Same scale shape as [[funnel]]: one
    * user-keyed min-aggregation per step, left-join assembly. */
  def windowedFunnel(events: DataFrame, steps: Seq[String],
      windowSecs: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(windowSecs > 0, "windowSecs must be positive")
    val winUs = windowSecs * 1000000L
    val base = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    val stepTimes = steps.zipWithIndex
      .foldLeft(Vector.empty[DataFrame]) { case (acc, (step, i)) =>
        val t = s"t${i + 1}_us"
        val evs = base.where(col("event_type") === step)
        val reached = acc.lastOption match {
          case None =>
            evs.groupBy("user_id").agg(min(col("ts_us")).as(t))
          case Some(prev) =>
            val pt = s"t$i" + "_us"
            evs.join(prev.select(col("user_id"), col(pt)), Seq("user_id"))
              .where(col("ts_us") >= col(pt) &&
                col("ts_us") <= col(pt) + lit(winUs))
              .groupBy("user_id").agg(min(col("ts_us")).as(t))
        }
        acc :+ reached
      }
    val joined = stepTimes.tail.foldLeft(stepTimes.head) { (l, r) =>
      l.join(r, Seq("user_id"), "left")
    }
    joined
      .withColumn("steps_completed",
        steps.indices.map(i =>
          when(col(s"t${i + 1}_us").isNotNull, 1).otherwise(0))
          .reduce(_ + _))
      .orderBy("user_id")
  }

  /** COHORT RETENTION — the event-analytics companion to [[funnel]]: group
    * users by the day of their first activity (the cohort) and count how
    * many are still active at each day offset. Days are epoch-anchored
    * integer indices (datediff from a fixed date) so no engine-specific
    * week/calendar semantics enter the result.
    *
    * Scale shape: activity distinct-ifies on (user, day) — one shuffle that
    * the per-user min reuses as a sub-key aggregation; the (cohort, offset)
    * rollup then counts pre-distinct rows (no count-distinct re-shuffle);
    * the cohort-size join is agg-output-sized (AQE broadcasts it). Work ∝
    * events, memory ∝ active (user, day) pairs per partition. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val act = events
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1996-01-01").cast("date"))
          .as("d"))
      .distinct()
    val first = act.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
    val sizes = first.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_size"))
    act.join(first, "user_id")
      .groupBy(col("cohort_day"), (col("d") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(sizes, "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("active_users"),
        col("cohort_size"),
        (col("active_users").cast("double") / col("cohort_size"))
          .as("retention"))
      .orderBy("cohort_day", "day_offset")
  }

  /** DAU/MAU STICKINESS by event type — the per-feature engagement ratio
    * next to [[retentionCohorts]] in any product-analytics suite: for each
    * (event_type, calendar month), the average daily active users over the
    * month's ACTIVE days divided by the month's distinct actives. A
    * stickiness of 1.0 means every monthly user shows up every active day;
    * DAU-churned features drift toward 1/active_days.
    *
    * Calendar arithmetic is engine-neutral integer math (the
    * [[retentionCohorts]] convention): `month_id` = year·12 + month, days
    * are `CAST(ts AS DATE)`. Averages divide exact integer sums, so the
    * doubles replay bit-for-bit cross-engine.
    *
    * Scale shape: one distinct over (event_type, day, user) — the only
    * corpus-sized shuffle, map-side partial; DAU and MAU are two-phase
    * hash aggs over that skinny frame; the final join is
    * (types × months)-sized, AQE-broadcast. No windows, no driver state. */
  def stickiness(events: DataFrame): DataFrame = {
    val act = events
      .select(col("event_type"), col("ts").cast("date").as("day"),
        col("user_id"))
      .distinct()
    val dau = act.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("dau"))
    val avgDau = dau
      .groupBy(col("event_type"),
        (year(col("day")) * 12 + month(col("day"))).cast("long")
          .as("month_id"))
      .agg(count(lit(1)).as("active_days"),
        (sum("dau").cast("double") / count(lit(1))).as("avg_dau"))
    val mau = act
      .select(col("event_type"),
        (year(col("day")) * 12 + month(col("day"))).cast("long")
          .as("month_id"),
        col("user_id"))
      .distinct()
      .groupBy("event_type", "month_id").agg(count(lit(1)).as("mau"))
    avgDau.join(mau, Seq("event_type", "month_id"))
      .select(col("event_type"), col("month_id"), col("active_days"),
        col("avg_dau"), col("mau"),
        (col("avg_dau") / col("mau")).as("stickiness"))
      .orderBy("event_type", "month_id")
  }

  /** Conversion LATENCY by acquisition cohort: for each user whose first
    * `from` event precedes (or equals) their first `to` event, the time
    * from first touch to conversion, rolled up by first-touch day — the
    * "how long does conversion take, and is it drifting" report that sits
    * next to funnel counts ([[funnel]]) in any growth pipeline.
    *
    * Cohort days are epoch-anchored integer indices (same convention as
    * [[retentionCohorts]] — no engine calendar semantics); latencies ride
    * as exact integer micros until the final division, so every mean is an
    * integer-sum ratio, bit-reproducible in any aggregation order.
    *
    * Scale shape: one user_id-keyed aggregation over filtered events (the
    * two min-aggregates fuse into one hash agg), then a cohort-day rollup
    * of user-sized rows. Work ∝ events, no joins, no windows. */
  /** KAPLAN–MEIER survival estimate of time-to-conversion WITH CENSORING —
    * the right-censored complement of [[timeToConvert]] (which silently
    * conditions on conversion happening; survival analysis is how a growth
    * team reads "how long until purchase" without that bias). Subjects are
    * users with a `from` event (time origin = their first `from`); a user
    * whose first `to` lands at/after the origin converts at duration
    * `⌊Δ/day⌋`; a user who never converts is right-censored at the corpus
    * horizon (max event ts — the end of observation). Per duration-day t:
    * `at_risk n_t` (subjects with duration ≥ t), `events d_t`, `censored
    * c_t`, and `S(t) = Π_{u≤t} (1 − d_u/n_u)` — the product-limit
    * estimator (Kaplan & Meier 1958).
    *
    * Scale shape: one user-keyed aggregation over filtered events (exactly
    * [[timeToConvert]]'s shape), a 1-row horizon broadcast, then all
    * windows run over the DAY-GRID frame (≤ observation-span rows, never
    * the data — the bucket-frame convention of [[graft.ops.Ranking]]).
    * The survival product rides exp∘Σln rounded at 1e-9 (the cross-engine
    * float recipe); a day with d_t = n_t pins S to exactly 0 from then on
    * (no ln(0)). */
  def kaplanMeier(events: DataFrame, from: String = "signup",
      to: String = "purchase"): DataFrame = {
    val usDay = 86400000000L
    val horizon = events.agg(max(unix_micros(col("ts"))).as("h_us"))
    val durations = events
      .where(col("event_type").isin(from, to))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === from, unix_micros(col("ts"))))
          .as("t0"),
        min(when(col("event_type") === to, unix_micros(col("ts"))))
          .as("t1"))
      .where(col("t0").isNotNull)
      .crossJoin(broadcast(horizon))
      .select(
        when(col("t1").isNotNull && col("t1") >= col("t0"),
          floor((col("t1") - col("t0")) / lit(usDay)))
          .otherwise(floor((col("h_us") - col("t0")) / lit(usDay)))
          .cast("long").as("day"),
        when(col("t1").isNotNull && col("t1") >= col("t0"), 1L)
          .otherwise(0L).as("observed"))
    val byDay = durations.groupBy("day")
      .agg(sum(col("observed")).as("events"),
        sum(lit(1L) - col("observed")).as("censored"))
    // day-grid windows: at-risk = subjects not yet exited before this day
    val all = Window.orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val before = Window.orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withRisk = byDay.withColumn("at_risk",
      sum(col("events") + col("censored")).over(all) -
        coalesce(sum(col("events") + col("censored")).over(before), lit(0L)))
    val factor = lit(1.0) -
      col("events").cast("double") / col("at_risk").cast("double")
    withRisk
      .withColumn("__zero", when(factor <= lit(0.0), 1L).otherwise(0L))
      .withColumn("__ln", when(factor > lit(0.0), log(factor))
        .otherwise(lit(0.0)))
      .withColumn("survival",
        when(sum(col("__zero")).over(upTo) > 0, lit(0.0))
          .otherwise(round(exp(sum(col("__ln")).over(upTo)), 9)))
      .select(col("day").cast("int").as("day"), col("at_risk"),
        col("events"), col("censored"), col("survival"))
      .orderBy("day")
  }

  def timeToConvert(events: DataFrame, from: String = "view",
      to: String = "purchase"): DataFrame = {
    val firsts = events
      .where(col("event_type").isin(from, to))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === from, unix_micros(col("ts"))))
          .as("t_from_us"),
        min(when(col("event_type") === to, unix_micros(col("ts"))))
          .as("t_to_us"))
      .where(col("t_from_us").isNotNull && col("t_to_us").isNotNull &&
        col("t_to_us") >= col("t_from_us"))
    firsts
      .select(
        datediff(timestamp_micros(col("t_from_us")).cast("date"),
          lit("1996-01-01").cast("date")).as("cohort_day"),
        (col("t_to_us") - col("t_from_us")).as("delta_us"))
      .groupBy("cohort_day")
      .agg(count(lit(1)).as("converted"),
        sum(col("delta_us")).as("sum_us"),
        min(col("delta_us")).as("min_us"),
        max(col("delta_us")).as("max_us"))
      .select(col("cohort_day"), col("converted"),
        (col("sum_us").cast("double") / col("converted") / lit(1000000.0))
          .as("avg_secs"),
        (col("min_us").cast("double") / lit(1000000.0)).as("min_secs"),
        (col("max_us").cast("double") / lit(1000000.0)).as("max_secs"))
      .orderBy("cohort_day")
  }

  /** ROLLING time-window aggregates over the daily series: per event type,
    * each day's revenue plus the trailing `days`-day rolling sum/mean — the
    * moving-average smoothing every metrics dashboard runs. Calendar-aware:
    * the frame is a RANGE over epoch-day indices (gap days genuinely absent
    * from the window), not a row count.
    *
    * Scale shape: the raw-event aggregation shuffles once on (type, day);
    * the window then runs PARTITIONED BY event type over day-count-sized
    * rows — never a global single-partition window. Sums ride as
    * DECIMAL(27,6) until the end, so window accumulation order (segment
    * trees in some engines, sequential in others) cannot move a float bit. */
  def rollingDaily(events: DataFrame, days: Int = 7): DataFrame = {
    val daily = events
      .select(col("event_type"), col("ts").cast("date").as("day"),
        expr("CAST(value AS DECIMAL(27,6))").as("v"))
      .groupBy("event_type", "day")
      .agg(sum(col("v")).as("rev_d"), count(lit(1)).as("n_d"))
      .withColumn("day_i",
        datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy("event_type").orderBy(col("day_i"))
      .rangeBetween(-(days - 1), 0)
    daily
      .withColumn("roll_rev", sum(col("rev_d")).over(w))
      .withColumn("roll_n", sum(col("n_d")).over(w))
      .select(col("event_type"), col("day"),
        col("rev_d").cast("double").as("revenue"),
        col("roll_rev").cast("double").as("rolling_revenue"),
        (col("roll_rev").cast("double") / col("roll_n").cast("double"))
          .as("rolling_avg_value"),
        col("roll_n").as("rolling_events"))
      .orderBy("event_type", "day")
  }

  /** ANOMALY DETECTION over the daily event stream — flag days whose
    * revenue deviates more than `z` trailing standard deviations from the
    * preceding `days`-day window (the data-quality monitor a pipeline runs
    * on its own ingest volumes; the trailing window EXCLUDES the current
    * day so an anomaly cannot mask itself). Sums and sums-of-squares ride
    * DECIMAL — rev as DECIMAL(18,6), its square exact in DECIMAL(37,12) —
    * so the window accumulation is order-independent; mean/variance/σ/z is
    * then one fixed-shape double expression (sqrt is correctly rounded
    * IEEE), bit-identical across engines. Same scale shape as
    * [[rollingDaily]]: one shuffle to daily grain, windows partitioned by
    * event type over day-count-sized rows. */
  def anomalyDays(events: DataFrame, days: Int = 7,
      z: Double = 2.0): DataFrame = {
    val daily = events
      .select(col("event_type"), col("ts").cast("date").as("day"),
        expr("CAST(value AS DECIMAL(18,6))").as("v"))
      .groupBy("event_type", "day")
      .agg(sum(col("v")).as("rev"))
      .withColumn("day_i",
        datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy("event_type").orderBy(col("day_i"))
      .rangeBetween(-days, -1)
    daily
      .withColumn("n_prev", count(col("rev")).over(w))
      .withColumn("s1", sum(col("rev")).over(w))
      // rev re-narrowed to (18,6) so the product is exact DECIMAL(37,12),
      // then re-quantized to scale 6 — lossless for ≤3-decimal daily sums
      // (monetary inputs) and it keeps s2's integer representation under
      // 2⁵³, so BOTH engines' decimal→double conversions are exact and the
      // variance chain is bit-identical (wide decimals double-round in
      // some engines' toDouble)
      .withColumn("s2",
        sum(expr("CAST(CAST(rev AS DECIMAL(18,6)) * " +
          "CAST(rev AS DECIMAL(18,6)) AS DECIMAL(38,6))")).over(w))
      .where(col("n_prev") >= 2)
      .withColumn("mean", col("s1").cast("double") / col("n_prev"))
      .withColumn("variance", greatest(lit(0.0),
        col("s2").cast("double") / col("n_prev") -
          col("mean") * col("mean")))
      // σ and z round to 9 decimals (t14/t23 recipe): the s2 decimal is
      // wider than 2⁵³, and one engine's decimal→double conversion double-
      // rounds — a ~1e-13 relative wobble that 1e-9 rounding absorbs; the
      // |z| ≥ threshold filter runs on the rounded value on both sides so
      // the row sets agree too
      .withColumn("sigma", round(sqrt(col("variance")), 9))
      .withColumn("zscore",
        when(col("sigma") > 0.0, round(
          (col("rev").cast("double") - col("mean")) / col("sigma"), 9)))
      .where(col("zscore").isNotNull && abs(col("zscore")) >= z)
      .select(col("event_type"), col("day"),
        col("rev").cast("double").as("revenue"),
        col("n_prev"), col("mean"), col("sigma"), col("zscore"))
      .orderBy("event_type", "day")
  }

  /** Bounded INTERVAL JOIN — per event, aggregate the same user's orders in
    * the trailing `days`-day window. The naive spelling is an inequality
    * (range) join that Spark can only run as a per-key nested loop — it
    * blows up O(|events|·|orders per user|). This is the BUCKETED form: both
    * sides key on (user, ⌊epoch_day / days⌋); each order additionally posts
    * to the NEXT bucket, so every qualifying (event, order) pair — which
    * spans at most one bucket boundary — meets on exactly one equi-key, and
    * the exact window predicate prunes the rest. Work: one 2× explode of
    * the orders side + one hash equi-join; never a nested loop, at any
    * scale. A candidate pair meets once (its order-bucket posting matching
    * the event's bucket is unique), so no dedup pass is needed.
    *
    * Output: one row per event with the trailing-window order count and
    * decimal-exact total (0/0.0 when none — the join is left). */
  def intervalJoin(events: DataFrame, orders: DataFrame,
      days: Int = 7): DataFrame = {
    val anchor = lit("1970-01-01").cast("date")
    val ev = events.select(col("event_id"), col("user_id"),
        col("ts").cast("date").as("e_day"))
      .withColumn("e_d", datediff(col("e_day"), anchor))
      .withColumn("bucket", expr(s"e_d DIV $days"))
    val ord = orders.select(col("o_custkey").as("user_id"),
        datediff(col("o_orderdate").cast("date"), anchor).as("o_d"),
        expr("CAST(o_totalprice AS DECIMAL(27,6))").as("v"))
      .withColumn("b0", expr(s"o_d DIV $days"))
      .withColumn("bucket", explode(array(col("b0"), col("b0") + 1)))
      .select("user_id", "bucket", "o_d", "v")
    ev.join(ord, Seq("user_id", "bucket"), "left")
      .withColumn("hit",
        col("o_d").isNotNull &&
          col("o_d") <= col("e_d") && col("o_d") > col("e_d") - days)
      .groupBy("event_id", "user_id", "e_day")
      .agg(
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_orders"),
        coalesce(sum(when(col("hit"), col("v"))), lit(0).cast("decimal(27,6)"))
          .cast("double").as("order_total"))
      .orderBy("event_id")
  }

  /** EXACT per-group percentiles of the event value — the latency/size
    * distribution report every pipeline SLO review asks for. The p-th
    * percentile is defined discretely (no interpolation): the value at
    * 1-based rank ⌈p·n/100⌉ in (value, event_id) ascending order — a total
    * order, so the picked ROW (hence its double value, bit-for-bit) is
    * deterministic and replayable by any engine; interpolated percentile_cont
    * would instead inherit each engine's interpolation arithmetic.
    *
    * Scale shape: one shuffle on event_type, then a per-type sort (Spark
    * external-sorts each partition; ranks never leave their partition).
    * Parallelism = #groups — the right shape for a grouped report; for a
    * percentile of ONE billion-row group use approx_percentile or a
    * two-phase histogram instead (documented trade, not this operator's
    * contract). ⌈p·n/100⌉ is computed on exact integer-valued doubles
    * (p·n < 2⁵³), so the ceiling has no ulp hazard. */
  def valuePercentiles(events: DataFrame,
      ps: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      "percentiles must be in 1..100")
    // nulls-last explicitly: Spark's ASC default is nulls-first, SQL
    // engines' is typically nulls-last — pin the total order either way
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").asc_nulls_last, col("event_id").asc)
    val ranked = events.select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
    val picks = ps.map { p =>
      max(when(col("rn") ===
          greatest(lit(1), ceil(lit(p) * col("n") / lit(100.0)).cast("int")),
        col("value"))).as(s"p$p")
    }
    ranked.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), picks: _*)
      .orderBy("event_type")
  }

  /** NEXT-EVENT TRANSITION MATRIX — the Markov view of the event stream:
    * for each event type, how users' immediately-following event
    * distributes (count + row-normalized share), top-k transitions
    * overall. The "what do users do after X" primitive behind flow
    * diagrams and funnel discovery.
    *
    * Scale shape: the lead() window partitions BY USER (a user's history is
    * bounded — the legitimate per-key window, unlike a global one);
    * transition counting is one map-side-combined hash agg on the
    * (prev, next) pair; the per-prev totals frame is event-type-cardinality
    * sized and broadcasts; top-k is TakeOrderedAndProject. */
  def eventTransitions(events: DataFrame, k: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val pairs = events
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("prev_type").agg(sum("n").as("tot"))
    pairs.join(broadcast(totals), "prev_type")
      .withColumn("share", col("n").cast("double") / col("tot").cast("double"))
      .select("prev_type", "next_type", "n", "share")
      .orderBy(col("n").desc, col("prev_type").asc, col("next_type").asc)
      .limit(k)
  }

  /** SESSION PATH MINING — the top-k ordered event-type journeys, the
    * "what do users actually do" report behind funnel design: sessionize
    * (same gaps-and-islands pass as [[Sessionize.sessions]]), render each
    * session's first `maxSteps` event types as one `a>b>c` path string,
    * and count sessions per path. Complements [[eventTransitions]] (the
    * first-order Markov view): transitions lose order beyond one hop,
    * paths keep the whole prefix.
    *
    * Scale shape: one shuffle on user_id feeds both window passes AND the
    * per-session collect (the session id starts with user_id, so the
    * groupBy reuses the partitioning); per-session event lists are
    * session-sized (bounded by the gap parameter in practice), sorted
    * in-buffer by (ts, event_id) via `array_sort` over structs — fully
    * deterministic, no `collect_list` order dependence. The path table is
    * ≤ session-count-sized and collapses in partial aggregation; top-k is
    * TakeOrderedAndProject under a (count, path) total order. */
  def topPaths(events: DataFrame, gapMinutes: Int = 30, maxSteps: Int = 8,
      k: Int = 20): DataFrame =
    sessionPaths(events, gapMinutes, maxSteps)
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)

  /** The per-session path table [[topPaths]] counts over: one row per
    * (user, session) with the session's start micros and its first
    * `maxSteps` event types as a `a>b>c` string. Public because the
    * streaming twin ([[graft.streaming.Streaming.sessionPathsStream]])
    * is gated against it per watermark-closed session. */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30,
      maxSteps: Int = 8): DataFrame = {
    val order = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val gapUs = gapMinutes * 60L * 1000000L
    val sess = events
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(order))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sess_idx", sum(col("new_sess")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess
      .groupBy("user_id", "sess_idx")
      .agg(min(col("ts_us")).as("start_us"),
        collect_list(
          struct(col("ts_us"), col("event_id"), col("event_type"))).as("evs"))
      .select(col("user_id"), col("start_us"), expr(
        s"""array_join(transform(slice(array_sort(evs), 1, $maxSteps),
           |           x -> x.event_type), '>')""".stripMargin).as("path"))
  }

  /** SESSION PRECEDENCE MINING — how many sessions see event type A
    * strictly BEFORE event type B (some A-occurrence earlier than some
    * B-occurrence ⇔ first(A) < last(B)): the order-sensitive
    * co-occurrence table behind "do users browse before they buy?" —
    * between [[eventTransitions]] (adjacent-only) and [[topPaths]]
    * (whole-prefix exact): A>B here counts even with arbitrary events in
    * between. The length-2 core of sequential-pattern (PrefixSpan-style)
    * mining, kept exact and oracle-replayable.
    *
    * Scale shape: one user_id shuffle sessionizes; per-session per-type
    * first/last occurrences reuse that partitioning; ordered pairs
    * generate MAP-SIDE from each session's type list with higher-order
    * functions (the q53 basket trick — pair work Σ types², bounded by the
    * event-type vocabulary, collapsing in partial aggregation before any
    * exchange); top-k is TakeOrderedAndProject. */
  def precedencePairs(events: DataFrame, gapMinutes: Int = 30,
      k: Int = 20): DataFrame = {
    val order = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val gapUs = gapMinutes * 60L * 1000000L
    val occ = events
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(order))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sess_idx", sum(col("new_sess")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_idx", "event_type")
      .agg(min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"))
    occ
      .groupBy("user_id", "sess_idx")
      .agg(collect_list(struct(col("event_type"), col("first_us"),
        col("last_us"))).as("ts"))
      .select(explode(expr(
        """filter(flatten(transform(ts, a ->
          |  transform(ts, b -> struct(a.event_type AS before_type,
          |    b.event_type AS after_type, a.first_us AS fa,
          |    b.last_us AS lb)))),
          |  p -> p.before_type != p.after_type AND p.fa < p.lb)"""
          .stripMargin)).as("p"))
      .groupBy(col("p.before_type").as("before_type"),
        col("p.after_type").as("after_type"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("before_type").asc,
        col("after_type").asc)
      .limit(k)
  }

  /** CONVERSION ATTRIBUTION — first-touch / last-touch marketing
    * attribution: for every conversion event, the earliest and the most
    * recent PRECEDING touch event (click/view) by the same user, plus the
    * microsecond gap to the last touch. The canonical web-analytics join
    * a warehouse answers per conversion.
    *
    * Shape: one pass, two ignore-nulls window lookups (`first`/`last` over
    * `when(isTouch, …)`), both partitioned by user and ordered by
    * (ts, event_id) — the frame ends one row before the current event, so
    * a conversion at the same microsecond as a touch only attributes to it
    * when the touch's event_id sorts earlier. No self-join: at 100 TB the
    * event history streams through each user partition once. */
  def attribution(events: DataFrame, convType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view")): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin(touchTypes: _*)
    events
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"))
      .withColumn("first_touch_id",
        first(when(isTouch, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("first_touch_type",
        first(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("last_touch_id",
        last(when(isTouch, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_touch_us",
        last(when(isTouch, col("ts_us")), ignoreNulls = true).over(w))
      .withColumn("last_touch_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .where(col("event_type") === convType &&
        col("last_touch_id").isNotNull)
      .select(col("event_id").as("conv_id"), col("user_id"),
        col("ts_us").as("conv_ts_us"),
        col("first_touch_id"), col("first_touch_type"),
        col("last_touch_id"), col("last_touch_type"),
        (col("ts_us") - col("last_touch_us")).as("us_since_last_touch"))
      .orderBy("conv_id")
  }

  /** POSITION-BASED (U-shaped) MULTI-TOUCH ATTRIBUTION — each conversion
    * distributes credit across every touch in its JOURNEY SEGMENT (the
    * touches since the user's previous conversion, so a touch credits
    * exactly one conversion): 40% to the first touch, 40% to the last,
    * the remaining 20% split evenly over the middle ones; two touches
    * split 50/50 and a lone touch takes 100% — the standard U-shaped
    * model between first-touch and last-touch ([[attribution]] gives
    * those). Credits per conversion sum to exactly 1 in IEEE doubles
    * only when n ≤ 2; for larger n the sum is 0.8 + (n−2)·(0.2/(n−2))
    * up to rounding — consumers aggregating credit should tolerate ulps.
    *
    * Shape at scale: one running-count window over the user partition
    * assigns segments, one row_number + count pair over (user, segment),
    * then an equi-join of touches to their segment's conversion — all
    * partitioned on user, no data-sized windows, no self-joins beyond the
    * segment join (≤ one conversion per segment by construction). */
  def positionAttribution(events: DataFrame, convType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view")): DataFrame = {
    val isTouch = col("event_type").isin(touchTypes: _*)
    val isConv = col("event_type") === convType
    val ord = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val ev = events
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .where(isTouch || isConv)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"))
      // segment = #conversions STRICTLY before this event in user order
      .withColumn("seg", coalesce(sum(when(isConv, 1L))
        .over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val segW = Window.partitionBy("user_id", "seg")
    val touches = ev.where(isTouch)
      .withColumn("rn",
        row_number().over(segW.orderBy(col("ts_us").asc,
          col("event_id").asc)))
      .withColumn("n", count(lit(1)).over(segW))
    val convs = ev.where(isConv)
      .select(col("user_id"), col("seg"), col("event_id").as("conv_id"),
        col("ts_us").as("conv_ts_us"))
    touches.join(convs, Seq("user_id", "seg"))
      .withColumn("position",
        when(col("n") === 1, "only")
          .when(col("rn") === 1, "first")
          .when(col("rn") === col("n"), "last")
          .otherwise("middle"))
      .withColumn("credit",
        when(col("n") === 1, lit(1.0))
          .when(col("n") === 2, lit(0.5))
          .when(col("rn") === 1 || col("rn") === col("n"), lit(0.4))
          .otherwise(lit(0.2) / (col("n") - 2)))
      .select(col("conv_id"), col("user_id"), col("conv_ts_us"),
        col("event_id").as("touch_id"), col("event_type").as("touch_type"),
        col("rn").cast("long").as("touch_rank"), col("n").as("n_touches"),
        col("position"), col("credit"))
      .orderBy("conv_id", "touch_rank")
  }

  /** TIME-DECAY MULTI-TOUCH ATTRIBUTION — each conversion distributes
    * credit over its journey segment's touches with exponential recency
    * weighting: raw weight 2^(−Δt/halfLife) (a touch `halfLife` minutes
    * before the conversion earns half the weight of one at the instant),
    * normalized per conversion — the fourth standard model next to
    * first/last-touch ([[attribution]]) and U-shaped
    * ([[positionAttribution]]).
    *
    * Cross-engine exactness: pow(2, −Δt/h) is evaluated on identical IEEE
    * inputs (exact µs-integer ratios); each raw weight is quantized to
    * DECIMAL(38,18) so the per-conversion normalizer is an
    * aggregation-ORDER-independent decimal sum, and the final
    * round(credit, 9) absorbs any sub-nano libm drift (the t14 ln()
    * discipline, applied to exp2).
    *
    * The DECIMAL(38,18) quantization floors weights below 1e-18 to zero —
    * a touch more than ~60 half-lives before its conversion carries no
    * credit (and a conversion whose every touch is that stale nulls out);
    * size `halfLife` to the corpus's touch-to-conversion span (a 24 h
    * half-life covers gaps up to ~60 days).
    *
    * Same scale shape as [[positionAttribution]]: segment windows over the
    * user partition, the normalizer a conversion-sized window — no
    * self-joins, no data-sized windows. */
  def timeDecayAttribution(events: DataFrame, halfLifeMinutes: Int = 60,
      convType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view")): DataFrame = {
    require(halfLifeMinutes > 0, "halfLife must be positive")
    val isTouch = col("event_type").isin(touchTypes: _*)
    val isConv = col("event_type") === convType
    val ord = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val ev = events
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .where(isTouch || isConv)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"))
      .withColumn("seg", coalesce(sum(when(isConv, 1L))
        .over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val touches = ev.where(isTouch)
      .select(col("user_id"), col("seg"), col("event_id").as("touch_id"),
        col("ts_us").as("touch_ts_us"), col("event_type").as("touch_type"))
    val convs = ev.where(isConv)
      .select(col("user_id"), col("seg"), col("event_id").as("conv_id"),
        col("ts_us").as("conv_ts_us"))
    val halfLifeUs = halfLifeMinutes * 60L * 1000000L
    val w = Window.partitionBy("conv_id")
    touches.join(convs, Seq("user_id", "seg"))
      .withColumn("w_dec",
        pow(lit(2.0), -((col("conv_ts_us") - col("touch_ts_us"))
          .cast("double") / lit(halfLifeUs.toDouble)))
          .cast("decimal(38,18)"))
      .withColumn("credit", round(
        col("w_dec").cast("double") /
          sum(col("w_dec")).over(w).cast("double"), 9))
      .select(col("conv_id"), col("user_id"), col("conv_ts_us"),
        col("touch_id"), col("touch_type"),
        ((col("conv_ts_us") - col("touch_ts_us"))).as("us_before_conv"),
        col("credit"))
      .orderBy("conv_id", "us_before_conv", "touch_id")
  }

  /** IN-SESSION ATTRIBUTION — [[attribution]] scoped to the conversion's
    * own session (the standard e-commerce ask: "which touch in THIS visit
    * converted"): session boundaries come from the same gaps-and-islands
    * pass as [[Sessionize.sessions]] (computed over ALL events, so the
    * indices agree with the session table), then the first/last-touch
    * window lookups partition by (user, session). A touch in a previous
    * session never attributes; a conversion opening its session emits
    * nothing. Same one-pass shape as [[attribution]] — two windows over
    * the user partition, no self-join. */
  def attributionInSession(events: DataFrame, gapMinutes: Int = 30,
      convType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view")): DataFrame = {
    val order = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val gapUs = gapMinutes * 60L * 1000000L
    val tagged = events
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(order))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sess_idx", sum(col("new_sess")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("event_id", "user_id", "sess_idx", "ts_us", "event_type")
    val w = Window.partitionBy("user_id", "sess_idx")
      .orderBy(col("ts_us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin(touchTypes: _*)
    tagged
      .withColumn("first_touch_id",
        first(when(isTouch, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_touch_id",
        last(when(isTouch, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_touch_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("last_touch_us",
        last(when(isTouch, col("ts_us")), ignoreNulls = true).over(w))
      .where(col("event_type") === convType &&
        col("last_touch_id").isNotNull)
      .select(col("event_id").as("conv_id"), col("user_id"),
        col("sess_idx"), col("ts_us").as("conv_ts_us"),
        col("first_touch_id"), col("last_touch_id"),
        col("last_touch_type"),
        (col("ts_us") - col("last_touch_us")).as("us_since_last_touch"))
      .orderBy("conv_id")
  }

  /** Per-event-type stats over a JSON-extracted numeric field. */
  def jsonFieldStats(events: DataFrame, field: String): DataFrame = {
    val k = get_json_object(col("props"), s"$$.$field").cast("long")
    events.select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        count(col("k")).as("k_cnt"))
      .orderBy("event_type")
  }
}
