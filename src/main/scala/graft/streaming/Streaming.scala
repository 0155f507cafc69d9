package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.GraftException

/** Structured Streaming counterparts of the batch operators, for continuously
  * arriving event data (north-star extension; the reference is batch-only —
  * SURVEY §2.E). Two shapes:
  *
  *  - windowed rollup: watermark + tumbling window + the same measure set as
  *    the `events` cube, emitting append-mode finalized windows;
  *  - stateful sessionization: flatMapGroupsWithState with event-time
  *    timeout, emitting a session row when the inactivity gap closes — the
  *    streaming twin of [[graft.ops.Sessionize]].
  *
  * At scale both partition by key (window/user) and keep state per key in the
  * state store; no driver-side accumulation.
  */
object Streaming {

  // exact µs (getTime is ms-truncated; getNanos carries the fraction)
  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Parse a state-TTL interval string to positive milliseconds (shared by
    * the attribution streams' idle-horizon expiry). */
  private def ttlMillis(stateTtl: Option[String]): Option[Long] =
    stateTtl.map { s =>
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
        .safeStringToInterval(
          org.apache.spark.unsafe.types.UTF8String.fromString(s.trim))
      if (iv == null || iv.months != 0)
        throw new IllegalArgumentException(
          s"stateTtl must be a day/time interval, got '$s'")
      val ms = iv.days * 86400000L + iv.microseconds / 1000L
      if (ms <= 0)
        throw new IllegalArgumentException(
          s"stateTtl must be positive, got '$s'")
      ms
    }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, value_sum: Double)
  // not private: Catalyst codegen instantiates the state encoder reflectively
  final case class SessionState(start_us: Long, end_us: Long,
      n_events: Long, value_sum: Double)

  /** Tumbling-window rollup with a watermark for late data. */
  def windowedRollup(events: DataFrame, windowLen: String, watermark: String)
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("event_count"),
        sum(expr("CAST((value) AS DECIMAL(27,6))")).cast("double")
          .as("value_sum"),
        approx_count_distinct("user_id").as("approx_users"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("event_count"), col("value_sum"), col("approx_users"))

  /** Stateful sessionization: sessions close after `gapMinutes` of
    * per-user event-time inactivity (or watermark timeout). */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapMinutes: Int)
      : Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L


    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator.single(
          SessionOut(userId, s.start_us, s.end_us, s.n_events, s.value_sum))
      }
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var closed = Vector.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val us = micros(e.ts)
        cur match {
          case Some(s) if us - s.end_us <= gapUs =>
            cur = Some(SessionState(s.start_us, us, s.n_events + 1,
              s.value_sum + e.value))
          case Some(s) =>
            closed :+= SessionOut(userId, s.start_us, s.end_us, s.n_events,
              s.value_sum)
            cur = Some(SessionState(us, us, 1L, e.value))
          case None =>
            cur = Some(SessionState(us, us, 1L, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.end_us / 1000L + gapMinutes * 60L * 1000L)
      }
      closed.iterator
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class PathOut(user_id: Long, start_us: Long, path: String)
  // buf holds the session's earliest `maxSteps` (ts_us, event_id, type)
  // triples in sorted order — an incremental order statistic, so a late
  // (within-watermark) event still lands in its time position
  final case class PathState(start_us: Long, end_us: Long,
      buf: Seq[(Long, Long, String)])

  /** Streaming SESSION PATHS — the continuous twin of
    * [[graft.ops.EventOps.sessionPaths]]: per-user gap sessionization
    * (the [[sessionize]] state machine) carrying the session's first
    * `maxSteps` event types, emitted as one `a>b>c` path row when the
    * session closes (gap break or watermark timeout). Downstream path
    * COUNTING is an ordinary streaming aggregation over this output —
    * kept separate exactly like the batch pair (per-session table →
    * count), so both halves stay individually testable.
    *
    * State per user is one open session: two longs plus at most
    * `maxSteps` buffered triples — bounded regardless of session length
    * (the capped buffer keeps the earliest `maxSteps` by (ts, event_id),
    * which is exactly the prefix the batch `slice(array_sort(...))`
    * renders; dropping the largest is safe because a later insert can
    * only displace larger elements). */
  def sessionPathsStream(spark: SparkSession, events: Dataset[Event],
      gapMinutes: Int, maxSteps: Int = 8): Dataset[PathOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def render(buf: Seq[(Long, Long, String)]): String =
      buf.map(_._3).mkString(">")
    def insert(buf: Seq[(Long, Long, String)],
        e: (Long, Long, String)): Seq[(Long, Long, String)] =
      ((buf :+ e).sortBy(t => (t._1, t._2))).take(maxSteps)

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[PathState]): Iterator[PathOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator.single(PathOut(userId, s.start_us, render(s.buf)))
      }
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var closed = Vector.empty[PathOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val us = micros(e.ts)
        val triple = (us, e.event_id, e.event_type)
        cur match {
          case Some(s) if us - s.end_us <= gapUs =>
            cur = Some(PathState(math.min(s.start_us, us),
              math.max(s.end_us, us), insert(s.buf, triple)))
          case Some(s) =>
            closed :+= PathOut(userId, s.start_us, render(s.buf))
            cur = Some(PathState(us, us, Seq(triple)))
          case None =>
            cur = Some(PathState(us, us, Seq(triple)))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.end_us / 1000L + gapMinutes * 60L * 1000L)
      }
      closed.iterator
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  // unified as-of input: events carry event_id, states carry (ord, value)
  final case class AsofIn(user_id: Long, ts: java.sql.Timestamp, is_state: Int,
      event_id: Option[Long], ord: Option[Long], value: Option[Double])
  final case class AsofOut(event_id: Long, user_id: Long, t_us: Long,
      asof_ord: Option[Long], asof_value: Option[Double])
  // reorder buffer: events awaiting the watermark + states (compacted)
  final case class AsofBuf(events: Seq[(Long, Long)],
      states: Seq[(Long, Long, Double)])

  /** Streaming AS-OF JOIN — the continuous twin of
    * [[graft.ops.EventOps.asofJoin]]: each event is enriched with the
    * user's most recent state at-or-before its event time, correctly under
    * out-of-order arrival. Events wait in a per-user REORDER BUFFER until
    * the watermark passes their timestamp (after which no earlier state
    * can still arrive — the same guarantee batch sorting gives), then emit
    * matched against the max-(t, ord) state ≤ their time, the batch
    * window's carry-forward rule exactly.
    *
    * State per user stays BOUNDED: emitted events leave the buffer, and
    * states older than the watermark compact to the single latest one
    * (any future event is newer than the watermark, so older states can
    * never win again). At scale this is the standard streaming-enrichment
    * shape: state ∝ in-flight (watermark-window) data, not history.
    *
    * CAVEAT (inherent to multi-input event time, policy = min): the global
    * watermark is the MINIMUM across both inputs, so a state stream that
    * stops advancing (e.g. a bounded reference feed) pins the watermark
    * and no event ever closes. Keep the state stream live (heartbeats) or
    * join static reference data as a batch broadcast instead. */
  def asofJoinStream(spark: SparkSession, events: DataFrame,
      states: DataFrame, delay: String): Dataset[AsofOut] = {
    import spark.implicits._


    def update(userId: Long, rows: Iterator[AsofIn],
        st: GroupState[AsofBuf]): Iterator[AsofOut] = {
      val buf = st.getOption.getOrElse(AsofBuf(Nil, Nil))
      var evs = buf.events
      var sts = buf.states
      if (!st.hasTimedOut) rows.foreach { r =>
        val us = micros(r.ts)
        if (r.is_state == 1) sts :+= ((us, r.ord.get, r.value.get))
        else evs :+= ((us, r.event_id.get))
      }
      val wmMs = st.getCurrentWatermarkMs()
      val (ready, pending) = evs.partition(_._1 / 1000 <= wmMs)
      val sorted = sts.sortBy(s => (s._1, s._2))
      val out = ready.sortBy(identity).map { case (t, id) =>
        val m = sorted.takeWhile(_._1 <= t).lastOption // max (t, ord) ≤ t
        AsofOut(id, userId, t, m.map(_._2), m.map(_._3))
      }
      // compact: states at-or-before the watermark collapse to the latest
      val (old, fresh) = sorted.partition(_._1 / 1000 <= wmMs)
      val keep = old.lastOption.toSeq ++ fresh
      if (pending.isEmpty && keep.isEmpty) st.remove()
      else {
        st.update(AsofBuf(pending, keep))
        if (pending.nonEmpty) // flush when the watermark passes the oldest
          st.setTimeoutTimestamp(pending.map(_._1).min / 1000 + 1)
      }
      out.iterator
    }

    val ev = events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), lit(0).as("is_state"),
        col("event_id").cast("long").as("event_id"),
        lit(null).cast("long").as("ord"),
        lit(null).cast("double").as("value"))
    val stDf = states.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), lit(1).as("is_state"),
        lit(null).cast("long").as("event_id"),
        col("ord").cast("long").as("ord"),
        col("value").cast("double").as("value"))
    ev.unionByName(stDf).as[AsofIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class FunnelIn(user_id: Long, ts: java.sql.Timestamp, step: Int)
  final case class FunnelProg(user_id: Long, step_times_us: Seq[Long],
      steps_completed: Int)
  // buffered (t_us, step) pending the watermark + the set step times
  final case class FunnelSt(buf: Seq[(Long, Int)], times: Seq[Long])

  /** Streaming ORDERED FUNNEL — the continuous twin of
    * [[graft.ops.EventOps.funnel]]: per user, the earliest time each step
    * was reached at-or-after the previous step's time. Events wait in the
    * same watermark reorder buffer as [[asofJoinStream]], then apply to the
    * per-user step machine in global (t, step) order — ascending across
    * triggers because the watermark only moves forward, so each step time
    * is set exactly once, to the value the batch operator computes. A
    * buffered event for step s+1 that precedes the (future) step-s time can
    * never become eligible (all later-set times are ≥ its own t), so
    * skipping it on processing is exact, and state stays bounded: the
    * reorder buffer drains at the watermark and the step vector is k longs.
    *
    * Emits a refreshed (user, step-times, steps_completed) row whenever a
    * user's vector extends; the LATEST row per user equals the batch
    * funnel (steps_completed is monotone, so "latest" is well-defined in
    * append mode). */
  def funnelStream(spark: SparkSession, events: DataFrame,
      steps: Seq[String], delay: String): Dataset[FunnelProg] = {
    import spark.implicits._
    require(steps.size >= 2, "a funnel needs at least two steps")


    def update(userId: Long, rows: Iterator[FunnelIn],
        st: GroupState[FunnelSt]): Iterator[FunnelProg] = {
      val prev = st.getOption.getOrElse(FunnelSt(Nil, Nil))
      var buf = prev.buf
      if (!st.hasTimedOut)
        rows.foreach(r => buf :+= ((micros(r.ts), r.step)))
      val wmMs = st.getCurrentWatermarkMs()
      val (ready, pending) = buf.partition(_._1 / 1000 <= wmMs)
      var times = prev.times
      ready.sortBy(identity).foreach { case (t, s) =>
        if (s == times.length && (s == 0 || t >= times(s - 1)))
          times :+= t
      }
      val out =
        if (times.length > prev.times.length)
          Iterator.single(FunnelProg(userId, times, times.length))
        else Iterator.empty
      if (pending.isEmpty && times.isEmpty) st.remove()
      else {
        st.update(FunnelSt(pending, times))
        if (pending.nonEmpty)
          st.setTimeoutTimestamp(pending.map(_._1).min / 1000 + 1)
      }
      out
    }

    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (acc, (s, i)) =>
        when(col("event_type") === s, lit(i)).otherwise(acc)
      }
    events.withWatermark("ts", delay)
      .withColumn("step", stepIdx)
      .where(col("step").isNotNull)
      .select(col("user_id"), col("ts"), col("step"))
      .as[FunnelIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class TransIn(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String)
  final case class TransOut(user_id: Long, next_id: Long, next_us: Long,
      prev_type: String, next_type: String)
  // reorder buffer (t_us, id, type) + the O(1) last-seen-type context
  final case class TransSt(buf: Seq[(Long, Long, String)],
      lastType: Option[String])

  /** Streaming EVENT TRANSITIONS — the continuous twin of
    * [[graft.ops.EventOps.eventTransitions]]' pair stream: each event
    * (after its watermark passes, via the [[asofJoinStream]] reorder
    * buffer) emits one (prev_type → its type) row against the user's
    * previous event in global (t, event_id) order. Downstream Markov
    * counts/shares are an ordinary streaming aggregation over this
    * output — kept separate exactly like the batch pair (window pass →
    * hash agg). State per user: the in-flight buffer plus ONE string
    * (the last seen type) — the asymptotic minimum; the context is
    * sticky (a user's next event after any gap still transitions from
    * their last, matching the batch window's unbounded frame). */
  def transitionsStream(spark: SparkSession, events: DataFrame,
      delay: String): Dataset[TransOut] = {
    import spark.implicits._

    def update(userId: Long, rows: Iterator[TransIn],
        st: GroupState[TransSt]): Iterator[TransOut] = {
      val prev = st.getOption.getOrElse(TransSt(Nil, None))
      // Vector: appends are effectively O(1); a List here would make a hot
      // user's per-batch buffering quadratic while the watermark lags
      var buf = prev.buf.toVector
      if (!st.hasTimedOut)
        rows.foreach(r => buf :+= ((micros(r.ts), r.event_id, r.event_type)))
      val wmMs = st.getCurrentWatermarkMs()
      val (ready, pending) = buf.partition(_._1 / 1000 <= wmMs)
      var lastType = prev.lastType
      val out = Vector.newBuilder[TransOut]
      ready.sortBy(t => (t._1, t._2)).foreach { case (t, id, tp) =>
        lastType.foreach(p => out += TransOut(userId, id, t, p, tp))
        lastType = Some(tp)
      }
      st.update(TransSt(pending, lastType))
      if (pending.nonEmpty)
        st.setTimeoutTimestamp(pending.map(_._1).min / 1000 + 1)
      out.result().iterator
    }

    events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[TransIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class AttrIn(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, kind: Int, etype: String)
  final case class AttrOut(conv_id: Long, user_id: Long, conv_ts_us: Long,
      first_touch_id: Long, first_touch_type: String,
      last_touch_id: Long, last_touch_type: String,
      us_since_last_touch: Long)
  // reorder buffer (t_us, id, kind, type) + the O(1) attribution context;
  // lastT is the max event time seen (µs) — the TTL idle-horizon anchor
  final case class AttrSt(buf: Seq[(Long, Long, Int, String)],
      first: Option[(Long, String)], last: Option[(Long, String, Long)],
      lastT: Long = 0L)

  /** Streaming CONVERSION ATTRIBUTION — the continuous twin of
    * [[graft.ops.EventOps.attribution]]: each conversion emits its
    * first/last preceding touch, correct under out-of-order arrival via
    * the same per-user watermark reorder buffer as [[asofJoinStream]].
    * Ready rows apply to the user's attribution context in global
    * (t, event_id) order — ascending across triggers because the watermark
    * only moves forward — so every emitted row equals the batch operator's
    * for that conversion. State per user is the in-flight buffer plus an
    * O(1) context (first touch is sticky; last touch is the latest seen):
    * the asymptotic minimum for this query. */
  def attributionStream(spark: SparkSession, events: DataFrame,
      delay: String, convType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view"),
      stateTtl: Option[String] = None): Dataset[AttrOut] = {
    import spark.implicits._

    // State retention: first-touch attribution is INHERENTLY unbounded —
    // a conversion years after the first click must still see it, so a
    // user's O(1) context lives as long as the stream by default (the
    // buffer itself always drains at the watermark). `stateTtl` bounds it
    // for deployments that only need attribution within a horizon: the
    // context expires when the EVENT-TIME gap between consecutive events
    // exceeds the TTL, and a later conversion re-attributes from the
    // post-gap touches (documented divergence from the batch operator
    // beyond the horizon). The expiry is enforced IN the ordered apply
    // loop — a pure function of event times, identical whatever the
    // micro-batch boundaries — and the state-store cleanup timer merely
    // removes a context the gap rule already voids (any event accepted
    // after removal is above the watermark, hence beyond the gap).
    val ttlMs: Option[Long] = ttlMillis(stateTtl)


    def update(userId: Long, rows: Iterator[AttrIn],
        st: GroupState[AttrSt]): Iterator[AttrOut] = {
      val prev = st.getOption.getOrElse(AttrSt(Nil, None, None))
      var buf = prev.buf
      if (!st.hasTimedOut)
        rows.foreach(r =>
          buf :+= ((micros(r.ts), r.event_id, r.kind, r.etype)))
      val wmMs = st.getCurrentWatermarkMs()
      val (ready, pending) = buf.partition(_._1 / 1000 <= wmMs)
      var first = prev.first
      var last = prev.last
      // lastT = the last APPLIED event time: the gap anchor (pending rows
      // haven't happened yet from the context's point of view)
      var lastT = prev.lastT
      val out = Seq.newBuilder[AttrOut]
      ready.sortBy(r => (r._1, r._2)).foreach { case (t, id, kind, tp) =>
        // event-time idle-horizon expiry — a pure function of consecutive
        // event times, so the output is identical whatever the micro-batch
        // boundaries (the cleanup timer below never decides semantics)
        if (ttlMs.exists(ttl => lastT > 0 && t - lastT > ttl * 1000)) {
          first = None; last = None
        }
        if (t > lastT) lastT = t
        if (kind == 0) {
          if (first.isEmpty) first = Some((id, tp))
          last = Some((id, tp, t))
        } else last.foreach { case (lid, ltp, lt) =>
          out += AttrOut(id, userId, t, first.get._1, first.get._2,
            lid, ltp, t - lt)
        }
      }
      if (pending.isEmpty && first.isEmpty && last.isEmpty) st.remove()
      else if (pending.isEmpty && ttlMs.exists(ttl =>
          st.hasTimedOut && wmMs >= lastT / 1000 + ttl)) {
        // state-store CLEANUP (not semantics): buffer drained and the
        // watermark has passed lastT + ttl, so any event still admitted
        // has t > watermark ≥ lastT + ttl — the gap rule above would void
        // this context anyway; dropping it just frees the store
        st.remove()
      } else {
        st.update(AttrSt(pending, first, last, lastT))
        if (pending.nonEmpty)
          st.setTimeoutTimestamp(pending.map(_._1).min / 1000 + 1)
        else ttlMs.foreach(ttl => st.setTimeoutTimestamp(
          math.max(lastT / 1000 + ttl, wmMs + 1)))
      }
      out.result().iterator
    }

    val kind = when(col("event_type").isin(touchTypes: _*), lit(0))
      .when(col("event_type") === convType, lit(1))
    events.withWatermark("ts", delay)
      .withColumn("kind", kind)
      .where(col("kind").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("kind"),
        col("event_type").as("etype"))
      .as[AttrIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class PosOut(conv_id: Long, user_id: Long, conv_ts_us: Long,
      touch_id: Long, touch_type: String, touch_rank: Long,
      n_touches: Long, position: String, credit: Double)
  // reorder buffer + the current journey segment's touch list (in apply
  // order — rank is the index); lastT anchors the TTL idle horizon
  final case class PosSt(buf: Seq[(Long, Long, Int, String)],
      touches: Seq[(Long, String)], lastT: Long = 0L)

  /** Streaming POSITION-BASED ATTRIBUTION — the continuous twin of
    * [[graft.ops.EventOps.positionAttribution]]: when the watermark closes
    * a conversion, it distributes the 40/20/40 U-shaped credit over the
    * touches of its journey segment and the segment resets — emitted rows
    * equal the batch operator's for every watermark-closed conversion
    * (same reorder-buffer discipline as [[attributionStream]]). State per
    * user is the in-flight buffer plus the CURRENT segment's touch list:
    * an endless never-converting touch stream grows the list, so
    * `stateTtl` bounds it the same way as [[attributionStream]]'s — the
    * segment resets when the EVENT-TIME gap between consecutive events
    * exceeds the TTL (deterministic whatever the batch boundaries;
    * documented divergence from batch beyond the horizon), and the
    * cleanup timer reclaims idle users' store entries. */
  def positionAttributionStream(spark: SparkSession, events: DataFrame,
      delay: String, convType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view"),
      stateTtl: Option[String] = None): Dataset[PosOut] = {
    import spark.implicits._

    val ttlMs: Option[Long] = ttlMillis(stateTtl)

    def update(userId: Long, rows: Iterator[AttrIn],
        st: GroupState[PosSt]): Iterator[PosOut] = {
      val prev = st.getOption.getOrElse(PosSt(Nil, Nil))
      var buf = prev.buf
      if (!st.hasTimedOut)
        rows.foreach(r =>
          buf :+= ((micros(r.ts), r.event_id, r.kind, r.etype)))
      val wmMs = st.getCurrentWatermarkMs()
      val (ready, pending) = buf.partition(_._1 / 1000 <= wmMs)
      var touches = prev.touches
      var lastT = prev.lastT
      val out = Seq.newBuilder[PosOut]
      ready.sortBy(r => (r._1, r._2)).foreach { case (t, id, kind, tp) =>
        // event-time idle-horizon expiry (see attributionStream)
        if (ttlMs.exists(ttl => lastT > 0 && t - lastT > ttl * 1000))
          touches = Nil
        if (t > lastT) lastT = t
        if (kind == 0) touches :+= ((id, tp))
        else {
          val n = touches.length
          touches.zipWithIndex.foreach { case ((tid, ttp), i) =>
            val rn = i + 1
            val position =
              if (n == 1) "only"
              else if (rn == 1) "first"
              else if (rn == n) "last"
              else "middle"
            // same IEEE arithmetic as the batch operator's Columns
            val credit =
              if (n == 1) 1.0
              else if (n == 2) 0.5
              else if (rn == 1 || rn == n) 0.4
              else 0.2 / (n - 2)
            out += PosOut(id, userId, t, tid, ttp, rn.toLong, n.toLong,
              position, credit)
          }
          touches = Nil // the segment resets at its conversion
        }
      }
      if (pending.isEmpty && touches.isEmpty) st.remove()
      else if (pending.isEmpty && ttlMs.exists(ttl =>
          st.hasTimedOut && wmMs >= lastT / 1000 + ttl)) {
        // cleanup, not semantics: any event still admitted is above the
        // watermark, hence beyond the gap — the apply-loop reset would
        // void this segment anyway (see attributionStream)
        st.remove()
      } else {
        st.update(PosSt(pending, touches, lastT))
        if (pending.nonEmpty)
          st.setTimeoutTimestamp(pending.map(_._1).min / 1000 + 1)
        else ttlMs.foreach(ttl => st.setTimeoutTimestamp(
          math.max(lastT / 1000 + ttl, wmMs + 1)))
      }
      out.result().iterator
    }

    val kind = when(col("event_type").isin(touchTypes: _*), lit(0))
      .when(col("event_type") === convType, lit(1))
    events.withWatermark("ts", delay)
      .withColumn("kind", kind)
      .where(col("kind").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("kind"),
        col("event_type").as("etype"))
      .as[AttrIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class AnomIn(event_type: String, ts: java.sql.Timestamp,
      value: Double)
  final case class AnomOut(event_type: String, day_i: Long, revenue: Double,
      n_prev: Long, mean: Double, sigma: Double, zscore: Double)
  // per-type state: accumulating day→rev decimal sums (scale-6 strings —
  // exact, encoder-friendly) and the last day already emitted
  final case class AnomSt(days: Seq[(Long, String)], emittedThrough: Long)

  /** Streaming ANOMALY DETECTION — the continuous twin of
    * [[graft.ops.EventOps.anomalyDays]]: per event type, a day is scored
    * against the trailing `days`-day window once the WATERMARK passes its
    * end (no more events can join that day — the same finality batch
    * grouping has), so emitted rows equal the batch operator's on every
    * watermark-closed day. Revenue accumulates as scale-6 decimals and the
    * mean/σ/z chain replays the batch arithmetic step for step (squares
    * re-quantized to scale 6, σ and z rounded at 1e-9), so the equality is
    * bit-exact, not approximate.
    *
    * State per type stays BOUNDED: closed days older than the trailing
    * window evict; what remains is ≤ `days` closed days plus the open
    * (watermark-window) days — the streaming-aggregation minimum. */
  def anomalyStream(spark: SparkSession, events: DataFrame, days: Int,
      z: Double, delay: String): Dataset[AnomOut] = {
    import spark.implicits._
    val dayUs = 86400L * 1000000L

    def dec6(v: java.math.BigDecimal): java.math.BigDecimal =
      v.setScale(6, java.math.RoundingMode.HALF_UP)
    def round9(d: Double): Double =
      java.math.BigDecimal.valueOf(d)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue

    def update(typ: String, rows: Iterator[AnomIn],
        st: GroupState[AnomSt]): Iterator[AnomOut] = {
      val prev = st.getOption.getOrElse(AnomSt(Nil, Long.MinValue))
      var revs: Map[Long, java.math.BigDecimal] = prev.days
        .map { case (d, s) => d -> new java.math.BigDecimal(s) }.toMap
      if (!st.hasTimedOut) rows.foreach { r =>
        val d = Math.floorDiv(micros(r.ts), dayUs)
        // the same double→DECIMAL(18,6) quantization as the batch cast
        val v = dec6(java.math.BigDecimal.valueOf(r.value))
        revs = revs.updated(d, revs.get(d).fold(v)(_.add(v)))
      }
      val wmMs = st.getCurrentWatermarkMs()
      // day d is closed once the watermark reaches its end
      val closedThrough = Math.floorDiv(wmMs, 86400000L) - 1
      val ready = revs.keys.filter(d =>
        d > prev.emittedThrough && d <= closedThrough).toSeq.sorted
      val out = ready.flatMap { d =>
        val win = ((d - days) until d).flatMap(revs.get)
        val n = win.length
        if (n < 2) None
        else {
          val s1 = win.reduce(_.add(_))
          val s2 = win.map(r => dec6(r.multiply(r))).reduce(_.add(_))
          val mean = s1.doubleValue / n
          val variance =
            math.max(0.0, s2.doubleValue / n - mean * mean)
          val sigma = round9(math.sqrt(variance))
          val rev = revs(d)
          if (sigma > 0.0) {
            val zs = round9((rev.doubleValue - mean) / sigma)
            if (math.abs(zs) >= z)
              Some(AnomOut(typ, d, rev.doubleValue, n, mean, sigma, zs))
            else None
          } else None
        }
      }
      val emitted = if (ready.nonEmpty) ready.max else prev.emittedThrough
      // evict closed days that can no longer appear in any future window
      // (sentinel guard: MinValue - days would wrap positive and drop all)
      val cutoff =
        if (emitted == Long.MinValue) Long.MinValue else emitted - days
      val keep = revs.filter { case (d, _) => d > cutoff }
      if (keep.isEmpty) st.remove()
      else {
        st.update(AnomSt(
          keep.toSeq.sortBy(_._1).map { case (d, v) => d -> v.toPlainString },
          emitted))
        val oldestOpen = keep.keys.filter(_ > emitted).reduceOption(_ min _)
        // flush when the watermark closes the oldest still-open day
        oldestOpen.foreach(d => st.setTimeoutTimestamp((d + 1) * 86400000L))
      }
      out.iterator
    }

    events.withWatermark("ts", delay)
      .select(col("event_type"), col("ts"), col("value"))
      .as[AnomIn]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming EXACT DEDUP — the continuous twin of the batch keep-first
    * pipeline ([[graft.ops.TextOps.dedupKeepFirst]]): drop every document
    * whose content digest has already been admitted. Same md5 content key
    * as the batch op, so a corpus ingested incrementally admits exactly
    * the first arrival per digest.
    *
    * State = one (digest) row per DISTINCT document in the state store,
    * hash-partitioned — at 100 TB that is the deduped-corpus cardinality
    * spread across executors, the minimum any exact streaming dedup can
    * hold. When the source carries an event-time column, pass it with a
    * watermark delay and dedup state is EVICTED once the watermark passes
    * (duplicates only matter within the horizon) — the bounded-state form
    * an always-on ingest pipeline runs. */
  def dedupDocsStream(docs: DataFrame, tsCol: Option[String] = None,
      watermark: String = "1 hour"): DataFrame = {
    val keyed = docs.withColumn("digest", md5(col("text")))
    tsCol match {
      case Some(ts) => keyed.withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark("digest")
      case None => keyed.dropDuplicates("digest")
    }
  }

  final case class LshIn(band: Int, bh: Long, doc_id: Long,
      sh: Seq[Long], sig: Seq[Long])
  final case class LshPost(doc_id: Long, sh: Seq[Long], sig: Seq[Long])
  final case class NearDupPair(doc_a: Long, doc_b: Long,
      est_jaccard: Double, jaccard: Double)

  /** Streaming NEAR-DUP detection — the continuous twin of
    * [[graft.ops.Dedup.minhashLshPairs]] / the always-on form of the
    * nightly [[graft.ops.Dedup.lshDeltaPairs]]: every arriving document is
    * checked against everything already ingested, and each qualifying
    * (earlier, later) pair is emitted exactly once, as it becomes known.
    * Same shingling, signatures, banding and true-Jaccard verify as the
    * batch op, so the emitted pair SET equals the batch run over the same
    * corpus regardless of arrival order (StreamingSpec proves it on the
    * planted-duplicate fixture).
    *
    * Shape: per-document shingling/signing is the map side (the same
    * native expressions as batch); documents explode to band keys and
    * `flatMapGroupsWithState` keyed on (band, bh) holds the bucket's
    * postings — THE LSH INDEX IS THE STATE, hash-partitioned across
    * executors exactly like the batch `LshIndex` parquet would be. A new
    * posting verifies against its bucket-mates only (bounded by genuine
    * similarity, never corpus size). Cross-band duplicate pairs dedup in a
    * downstream stateful distinct on the survivor-sized pair stream.
    *
    * State per bucket = its postings (ids + signatures + hashed shingles).
    * Like any dedup index, it grows with the DISTINCT corpus — that is the
    * floor for exact near-dup detection; a retention horizon (drop
    * postings older than a watermark) is the bounded-state variant, at the
    * cost of missing pairs that straddle it.
    *
    * Emit-once without a second stateful stage: a pair colliding in
    * several bands would surface in each, so a bucket emits it only when
    * its band is the SMALLEST band whose signature slices agree — both
    * postings carry their full signatures, so every bucket computes the
    * same shared-band set locally and exactly one elects itself. (A pure
    * 64-bit band-hash collision with unequal slices falls outside the
    * election and would emit from its own bucket — the 2⁻⁶⁴ case where
    * batch dedups and streaming could double-emit.) */
  def nearDupStream(spark: SparkSession, docs: DataFrame, shingleK: Int,
      bands: Int, rows: Int, threshold: Double): Dataset[NearDupPair] = {
    import spark.implicits._
    val h = bands * rows

    def sharedBands(a: Seq[Long], b: Seq[Long]): Seq[Int] =
      (0 until bands).filter { bi =>
        var i = bi * rows
        var eq = true
        while (eq && i < (bi + 1) * rows) { eq = a(i) == b(i); i += 1 }
        eq
      }

    def update(key: (Int, Long), ins: Iterator[LshIn],
        st: GroupState[Seq[LshPost]]): Iterator[NearDupPair] = {
      var posts = st.getOption.getOrElse(Nil)
      val out = Seq.newBuilder[NearDupPair]
      ins.foreach { in =>
        posts.foreach { p =>
          if (p.doc_id != in.doc_id) {
            val shared = sharedBands(in.sig, p.sig)
            if (shared.headOption.forall(_ == key._1)) {
              val est = in.sig.zip(p.sig).count { case (a, b) => a == b }
                .toDouble / h
              val inter = in.sh.toSet.intersect(p.sh.toSet).size
              val j = inter.toDouble / (in.sh.size + p.sh.size - inter)
              if (j >= threshold)
                out += NearDupPair(math.min(in.doc_id, p.doc_id),
                  math.max(in.doc_id, p.doc_id), est, j)
            }
          }
        }
        posts :+= LshPost(in.doc_id, in.sh, in.sig)
      }
      st.update(posts)
      out.result().iterator
    }

    val posted = docs
      .select(col("doc_id"),
        graft.ops.Dedup.hashedShingles("text", shingleK).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", graft.ops.Dedup.minhashSignature("sh", h))
      .select(col("doc_id"), col("sh"), col("sig"),
        explode(graft.ops.Dedup.bandKeyCols(bands, rows)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bh").as("bh"),
        col("doc_id"), col("sh"), col("sig"))
      .as[LshIn]
    posted
      .groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** CONTINUOUS AGGREGATE-TABLE MAINTENANCE — the streaming form of
    * [[graft.planner.Rollups.refresh]]: each micro-batch of NEW fact rows
    * aggregates to delta partials, merges into the stored rollup with the
    * crash-safe two-rename swap, and re-registers in the catalog, so B17
    * routing answers from a rollup that is never more than one batch stale.
    * The OLAP analog of a streaming materialized view.
    *
    * Exactly-once despite foreachBatch's at-least-once replay: the batch id
    * rides INSIDE the staged rollup directory (`_graft_marker`), made
    * visible by the same rename that publishes the data — a replayed batch
    * sees its own id (or a later one) already applied and no-ops. Batch 0
    * initializes the rollup at `path`; a pre-existing rollup (nightly
    * bootstrap over history) is merged into, so bootstrap + streaming tail
    * is the deployment shape at 100 TB: one full scan ever, deltas forever.
    *
    * Scale shape per batch: work ∝ delta size + rollup size (one hash agg
    * over the batch, one merge agg over rollup∪delta partials — never the
    * fact history). State lives in parquet, not the state store: restarts
    * resume from the directory + source checkpoint. */
  def rollupRefreshStream(cat: graft.CubeCatalog, cubeName: String,
      levelRefs: Seq[graft.planner.LevelRef], factStream: DataFrame,
      path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    factStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyRollupBatch(cat, cubeName, levelRefs, batch, batchId, path)
      }
      .start()

  /** One micro-batch of [[rollupRefreshStream]], exposed for direct testing
    * of the replay guard. */
  def applyRollupBatch(cat: graft.CubeCatalog, cubeName: String,
      levelRefs: Seq[graft.planner.LevelRef], batch: DataFrame,
      batchId: Long, path: String): Unit = {
    import graft.planner.Rollups
    val cube = cat.cube(cubeName)
    val applied = Rollups.readMarker(cat.spark, path)
      .flatMap(_.toLongOption)
    if (applied.exists(_ >= batchId)) {
      // Replayed after a restart — the swap already published this batch's
      // DATA. Still re-register: a crash between the swap and the previous
      // registration leaves the catalog pinned to the renamed-away file
      // listing, and a parquet frame's listing is fixed at read time.
      val rls = levelRefs.map(graft.planner.Planner.resolve(cube, _))
      cat.replaceRollup(Rollups.load(cat.spark, cube.name,
        rls.flatMap(graft.planner.Planner.levelAliasesOf).toSet, path))
    } else {
      val r = Rollups.refresh(cat, cube, levelRefs, path, batch,
        marker = Some(batchId.toString))
      cat.replaceRollup(r)
    }
  }

  /** Drive a streaming query over a bounded source synchronously (memory
    * sink) — the local-smoke harness from the Spark guide. Returns the sink
    * table name. */
  /** STREAMING DAU twin of the distinct half of
    * [[graft.ops.EventOps.stickiness]] (e21): per (event_type, calendar
    * day) DISTINCT-user counts maintained incrementally. Exact streaming
    * distinct = first-seen dedup keyed on (event_type, day window,
    * user_id) — `dropDuplicatesWithinWatermark` bounds that state by the
    * watermark horizon (a day's user set expires once the watermark passes
    * the day; the keys themselves are day-scoped, so state is
    * O(active days × users), never unbounded history) — then the DAU count
    * is an ordinary watermark-finalized windowed aggregation. Emits one
    * (day_start, event_type, dau) row per closed day, bit-equal to the
    * batch `COUNT(DISTINCT user_id)` (UTC session timezone ⇒ the 1-day
    * tumbling window lands on the same calendar boundary as the batch
    * CAST(ts AS DATE)). Month stickiness is a stateless rollup of this
    * day table — the Kappa serving split: the stream maintains the
    * expensive distinct state, the month ratio aggregates its output. */
  def dauStream(events: DataFrame, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      // the day window inherits the event-time watermark; ts itself must
      // not survive the select (two event-time columns is an error)
      .select(col("event_type"), window(col("ts"), "1 day").as("w"),
        col("user_id"))
      .dropDuplicatesWithinWatermark("event_type", "w", "user_id")
      .groupBy(col("w"), col("event_type"))
      .agg(count(lit(1)).as("dau"))
      .select(col("w.start").as("day_start"), col("event_type"), col("dau"))

  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): String = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    name
  }

  /** File-based streaming read of an events directory with the events
    * schema (parquet source → the transforms above). */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val batch = spark.read.parquet(dir)
    if (batch.schema.fieldNames.isEmpty)
      GraftException.badRequest(s"no events at $dir")
    spark.readStream.schema(batch.schema).parquet(dir)
  }
}
