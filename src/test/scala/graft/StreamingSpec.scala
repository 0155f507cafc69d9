package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Streaming
import graft.ops.Sessionize
import SparkTestSession.{catalog => cat, spark}

/** Structured Streaming specs: bounded parquet source driven synchronously
  * through a memory sink; stateful sessionization cross-checked against the
  * batch gaps-and-islands implementation. */
class StreamingSpec extends AnyFunSuite {

  // Stage the events table as a µs-timestamp parquet dir (the raw testdata
  // carries ns timestamps, which the streaming reader can't take directly).
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-events").toString
    cat.table("events").coalesce(2).write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed rollup over a stream matches the batch computation") {
    val stream = Streaming.readEventsStream(spark, eventsDir)
    val name = Streaming.runToMemory(spark,
      Streaming.windowedRollup(stream, "1 day", "1 hour"), "rollup_test")
    val streamed = spark.table(name)
      .select("window_start", "event_type", "event_count", "value_sum")
      .collect().map(r => (r.get(0), r.get(1)) -> (r.get(2), r.get(3))).toMap
    val batch = cat.table("events")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("event_count"),
        sum(expr("CAST((value) AS DECIMAL(27,6))")).cast("double")
          .as("value_sum"))
      .select(col("window.start"), col("event_type"), col("event_count"),
        col("value_sum"))
      .collect().map(r => (r.get(0), r.get(1)) -> (r.get(2), r.get(3))).toMap
    // append mode emits only watermark-finalized windows ⇒ subset, and every
    // emitted window agrees exactly with the batch aggregate
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, v) => assert(batch(k) == v) }
  }

  test("streaming DAU matches batch COUNT(DISTINCT user_id) per " +
      "(event_type, day); replayed events do not inflate it") {
    // replay each event twice — the first-seen dedup must keep DAU exact
    // under at-least-once delivery
    val dupDir = Files.createTempDirectory("graft-dau").toString
    val ev = cat.table("events")
    ev.coalesce(1).write.mode("append").parquet(dupDir)
    ev.coalesce(1).write.mode("append").parquet(dupDir)
    val stream = Streaming.readEventsStream(spark, dupDir)
    val name = Streaming.runToMemory(spark,
      Streaming.dauStream(stream, "1 hour"), "dau_test")
    val streamed = spark.table(name).collect()
      .map(r => (r.get(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = ev
      .groupBy(window(col("ts"), "1 day").getField("start").as("day_start"),
        col("event_type"))
      .agg(countDistinct("user_id").as("dau"))
      .collect().map(r => (r.get(0), r.getString(1)) -> r.getLong(2)).toMap
    // append mode emits only watermark-closed days ⇒ subset; every emitted
    // day's DAU equals the batch distinct count exactly
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, v) => assert(batch(k) == v, s"day $k") }
    // the month rollup of the emitted day table reproduces e21's
    // avg-DAU numerator for months whose days all closed
    val monthAvg = spark.table(name)
      .groupBy(expr("year(day_start)*12 + month(day_start)").as("month_id"),
        col("event_type"))
      .agg((sum("dau").cast("double") / count(lit(1))).as("avg_dau"))
      .collect()
    assert(monthAvg.nonEmpty)
  }

  test("streaming dedup drops replayed events within the watermark") {
    import org.apache.spark.sql.functions._
    // replay every event twice (two identical file sets) — at-least-once
    // delivery simulation
    val dupDir = Files.createTempDirectory("graft-dup").toString
    val ev = cat.table("events")
    ev.coalesce(1).write.mode("append").parquet(dupDir)
    ev.coalesce(1).write.mode("append").parquet(dupDir)
    val stream = Streaming.readEventsStream(spark, dupDir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(lit(1).as("one"))
      .agg(count(lit(1)).as("n"))
    val name = Streaming.runToMemory(spark, stream, "dedup_test",
      org.apache.spark.sql.streaming.OutputMode.Update)
    val n = spark.table(name).orderBy(col("n").desc).collect()(0).getLong(1)
    assert(n == ev.count()) // duplicates dropped, originals kept
  }

  test("streaming as-of join matches batch for every watermark-closed event") {
    import org.apache.spark.sql.functions._
    // states = purchase events (same time range as the event stream — a
    // state feed that LAGS the events would pin the min-policy watermark
    // and nothing would ever close; see the asofJoinStream caveat);
    // views/clicks enrich with the user's most recent purchase
    val evStream = Streaming.readEventsStream(spark, eventsDir)
      .where(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val stStream = Streaming.readEventsStream(spark, eventsDir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("ord"),
        col("value"))
    val name = Streaming.runToMemory(spark,
      Streaming.asofJoinStream(spark, evStream, stStream, "1 minute").toDF(),
      "asof_test")
    val streamed = spark.table(name).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4))))).toMap
    // batch truth on identical µs inputs
    val evB = cat.table("events").where(col("event_type") =!= "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"))
    val stB = cat.table("events").where(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id").as("ord"), col("value"))
    val batch = graft.ops.EventOps.asofJoin(evB, stB).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4))))).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { case (id, v) =>
      assert(batch.contains(id), s"event $id not in batch")
      assert(batch(id) == v, s"event $id differs: ${batch(id)} vs $v")
    }
    // only events the final watermark never passed may be unemitted
    val delayUs = 60L * 1000000L
    val horizon = math.min(
      evB.agg(max(col("t"))).collect()(0).getLong(0),
      stB.agg(max(col("t"))).collect()(0).getLong(0)) - delayUs
    val unemitted = batch.keySet -- streamed.keySet
    val lateOk = batch.filter { case (_, (_, t, _, _)) =>
      t / 1000 > horizon / 1000 }.keySet
    assert(unemitted.subsetOf(lateOk),
      s"${(unemitted -- lateOk).size} closed events missing")
  }

  test("streaming attribution equals batch for every watermark-closed " +
      "conversion") {
    val stream = Streaming.readEventsStream(spark, eventsDir)
    val name = Streaming.runToMemory(spark,
      Streaming.attributionStream(spark, stream, "1 minute").toDF(),
      "attr_test")
    val streamed = spark.table(name).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val batch = graft.ops.EventOps.attribution(cat.table("events")).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { case (id, v) =>
      assert(batch.contains(id), s"conversion $id not in batch")
      assert(batch(id) == v, s"conversion $id differs: ${batch(id)} vs $v")
    }
    // only conversions after the final watermark may be unemitted
    val delayUs = 60L * 1000000L
    val horizon = cat.table("events")
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0) - delayUs
    val unemitted = batch.keySet -- streamed.keySet
    val lateOk = batch.filter { case (_, v) =>
      v(1).asInstanceOf[Long] / 1000 > horizon / 1000 }.keySet
    assert(unemitted.subsetOf(lateOk),
      s"${(unemitted -- lateOk).size} closed conversions missing")
  }

  test("streaming position attribution equals batch for every " +
      "watermark-closed conversion") {
    val stream = Streaming.readEventsStream(spark, eventsDir)
    val name = Streaming.runToMemory(spark,
      Streaming.positionAttributionStream(spark, stream, "1 minute").toDF(),
      "posattr_test")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(3))
    val streamed = spark.table(name).collect()
      .map(r => key(r) -> r.toSeq).toMap
    val batch = graft.ops.EventOps.positionAttribution(cat.table("events"))
      .collect().map(r => key(r) -> r.toSeq).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, v) =>
      assert(batch.contains(k), s"credit row $k not in batch")
      assert(batch(k) == v, s"credit row $k differs: ${batch(k)} vs $v")
    }
    // only conversions after the final watermark may be unemitted
    val delayUs = 60L * 1000000L
    val horizon = cat.table("events")
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0) - delayUs
    val unemittedConvs = (batch.keySet -- streamed.keySet).map(_._1)
    val lateOk = batch.collect { case ((conv, _), v)
      if v(2).asInstanceOf[Long] / 1000 > horizon / 1000 => conv }.toSet
    assert(unemittedConvs.subsetOf(lateOk),
      s"${(unemittedConvs -- lateOk).size} closed conversions missing")
  }

  test("streaming funnel's latest row per user equals the batch funnel") {
    val steps = Seq("view", "click", "purchase")
    val stream = Streaming.readEventsStream(spark, eventsDir)
    val name = Streaming.runToMemory(spark,
      Streaming.funnelStream(spark, stream, steps, "1 minute").toDF(),
      "funnel_test")
    // steps_completed is monotone per user → max row is the latest
    val streamed = spark.table(name).collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        val last = rows.maxBy(_.getInt(2))
        u -> ((last.getSeq[Long](1), last.getInt(2)))
      }
    val batch = graft.ops.EventOps.funnel(cat.table("events"), steps)
      .collect()
      .map { r =>
        val times = (1 to steps.size).map(i => Option(r.get(i)))
          .takeWhile(_.nonEmpty).map(_.get.asInstanceOf[Long])
        r.getLong(0) -> ((times, r.getInt(steps.size + 1)))
      }.toMap
    assert(streamed.nonEmpty)
    // every streamed vector must equal the batch vector for that user
    streamed.foreach { case (u, (times, n)) =>
      assert(batch.contains(u), s"user $u not in batch funnel")
      val (bTimes, bN) = batch(u)
      // the stream may still be short of steps landing after the final
      // watermark; whatever it HAS emitted must be a prefix of batch
      assert(times == bTimes.take(times.length), s"user $u: $times vs $bTimes")
      assert(n <= bN)
    }
    // users fully closed by the final watermark must match exactly
    val horizonUs = cat.table("events")
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0) -
      60L * 1000000L
    val fullyClosed = cat.table("events")
      .where(col("event_type").isin(steps: _*))
      .groupBy("user_id").agg(max(unix_micros(col("ts"))).as("t"))
      .where(col("t") <= horizonUs)
      .collect().map(_.getLong(0)).toSet
    fullyClosed.foreach { u =>
      if (batch.contains(u)) {
        assert(streamed.contains(u), s"closed user $u missing from stream")
        assert(streamed(u) == batch(u), s"closed user $u differs")
      }
    }
  }

  test("streaming anomaly days equal batch for every watermark-closed day") {
    val name = Streaming.runToMemory(spark,
      Streaming.anomalyStream(spark,
        Streaming.readEventsStream(spark, eventsDir), 7, 1.5, "1 minute")
        .toDF(), "anom_test")
    val streamed = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    val batch = graft.ops.EventOps.anomalyDays(cat.table("events"), 7, 1.5)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay) ->
        ((r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))))
      .toMap
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, v) =>
      assert(batch.get(k).contains(v), s"$k differs: ${batch.get(k)} vs $v")
    }
    // only days the final watermark never closed may be unemitted
    val maxUs = cat.table("events")
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    val horizonDay =
      Math.floorDiv(maxUs - 60L * 1000000L, 86400L * 1000000L) - 1
    val unemitted = batch.keySet -- streamed.keySet
    assert(unemitted.forall(_._2 > horizonDay),
      s"closed days missing: ${unemitted.filter(_._2 <= horizonDay)}")
  }

  test("streaming document dedup admits exactly one doc per content digest") {
    // replay the corpus twice (at-least-once ingest) — the streaming twin
    // must admit each distinct content exactly once, matching the batch
    // keep-first pipeline's digest set
    val dir = Files.createTempDirectory("graft-docs").toString
    val docs = cat.table("documents")
    docs.coalesce(1).write.mode("append").parquet(dir)
    docs.coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val name = Streaming.runToMemory(spark,
      Streaming.dedupDocsStream(stream), "docs_dedup_test")
    val admitted = spark.table(name).select("digest").collect()
      .map(_.getString(0))
    assert(admitted.length == admitted.distinct.length, "no digest twice")
    val batchDigests = docs.select(md5(col("text")).as("d")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(admitted.toSet == batchDigests)
  }

  test("media decode + canonicalize are streaming-safe: the stateless " +
      "map transforms (decodeFeatures over transcodePcm16) produce the " +
      "batch rows exactly under a parquet stream — no state, trivially " +
      "exactly-once") {
    val dir = Files.createTempDirectory("graft-media").toString
    val media = graft.ops.Multimodal.attachSyntheticUlaw(
      cat.table("documents").limit(60), 1, 10)
    media.coalesce(2).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(media.schema).parquet(dir)
    val name = Streaming.runToMemory(spark,
      graft.ops.Multimodal.decodeFeatures(spark,
        graft.ops.Multimodal.transcodePcm16(stream)).toDF(),
      "media_decode_test")
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val streamed = keyed(spark.table(name).collect())
    val batch = keyed(graft.ops.Multimodal.decodeFeatures(spark,
      graft.ops.Multimodal.transcodePcm16(media)).toDF().collect())
    assert(streamed.nonEmpty && streamed.size == batch.size)
    streamed.foreach { case (id, v) => assert(batch(id) == v) }
  }

  test("streaming near-dup emits exactly the batch LSH pair set, once each") {
    import org.apache.spark.sql.streaming.OutputMode
    // planted exact duplicate + the corpus, ingested as two file batches so
    // pair endpoints arrive in different triggers
    val docs = cat.table("documents")
    val clone = docs.where(col("doc_id") === 7L)
      .withColumn("doc_id", lit(100007L))
    val corpus = docs.unionByName(clone)
    val dir = Files.createTempDirectory("graft-neardup").toString
    corpus.where(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir)
    corpus.where(col("doc_id") % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(corpus.schema).parquet(dir)
    val name = Streaming.runToMemory(spark,
      Streaming.nearDupStream(spark, stream, 3, 32, 4, 0.9).toDF(),
      "neardup_stream_test", OutputMode.Update)
    val streamed = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(streamed.length == streamed.distinct.length,
      "each pair must emit exactly once (band election)")
    val batch = graft.ops.Dedup.minhashLshPairs(corpus, 3, 32, 4, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(streamed.toSet == batch.toSet,
      s"stream ${streamed.length} pairs vs batch ${batch.length}")
    assert(streamed.exists(p => p._1 == 7L && p._2 == 100007L && p._4 == 1.0))
  }

  test("stateful sessionization emits exactly the batch-closed sessions") {
    import spark.implicits._
    val stream = Streaming.readEventsStream(spark, eventsDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Streaming.Event]
    val name = Streaming.runToMemory(spark,
      Streaming.sessionize(spark, stream, 30).toDF(), "sessions_test")
    val streamed = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val batch = Sessionize.sessions(cat.table("events"), 30).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    // every streamed (closed) session matches a batch session exactly
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, (endUs, n)) =>
      assert(batch.contains(k), s"session $k missing from batch")
      assert(batch(k) == ((endUs, n)), s"session $k differs")
    }
    // the only batch sessions the stream may not have closed yet are each
    // user's final session (no later event advances the watermark past it)
    val unclosed = batch.keySet -- streamed.keySet
    val lastPerUser = batch.groupBy(_._1._1).values
      .map(_.keySet.maxBy(_._2)).toSet
    assert(unclosed.subsetOf(lastPerUser))
  }

  test("streaming transitions emit the batch lead-pair per event") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val stream = Streaming.readEventsStream(spark, eventsDir)
    val name = Streaming.runToMemory(spark,
      Streaming.transitionsStream(spark, stream, "0 seconds").toDF(),
      "transitions_test")
    val streamed = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3), r.getString(4))).toMap
    // batch truth: each event's previous event type per user in
    // (ts, event_id) order
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val batch = cat.table("events")
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .select("user_id", "event_id", "ts_us", "prev_type", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, v) =>
      assert(batch.get(k).contains(v), s"pair for $k differs")
    }
    // only rows at/after the final watermark may still be pending
    val missing = batch.keySet -- streamed.keySet
    if (missing.nonEmpty) {
      val maxStreamedUs = streamed.values.map(_._1).max
      missing.foreach { k => assert(batch(k)._1 >= maxStreamedUs) }
    }
  }

  test("streaming session paths emit the batch per-session path strings") {
    import spark.implicits._
    val stream = Streaming.readEventsStream(spark, eventsDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Streaming.Event]
    val name = Streaming.runToMemory(spark,
      Streaming.sessionPathsStream(spark, stream, 30, 8).toDF(),
      "paths_test")
    val streamed = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val batch = graft.ops.EventOps.sessionPaths(cat.table("events"), 30, 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, path) =>
      assert(batch.get(k).contains(path), s"session $k path differs")
    }
    // unclosed = at most each user's final (watermark-open) session
    val unclosed = batch.keySet -- streamed.keySet
    val lastPerUser = batch.keySet.groupBy(_._1).values
      .map(_.maxBy(_._2)).toSet
    assert(unclosed.subsetOf(lastPerUser))
  }

  test("streaming rollup refresh: routed answers track the stream; replays no-op") {
    import graft.planner.{CubeQuery, LevelDrill, LevelRef, Planner, Rollups}
    // isolated catalog so the registered rollup can't leak into suites
    // sharing the cached one
    val isoCat = TpchCatalog.build(spark, SparkTestSession.sf)
    val dir = Files.createTempDirectory("graft-rollupstream").toString
    val path = s"$dir/rollup"
    val factDir = s"$dir/fact"
    val orders = cat.table("orders")
    val slice1 = orders.where(col("o_orderkey") % 2 === 0)
    val slice2 = orders.where(col("o_orderkey") % 2 =!= 0)
    slice1.coalesce(1).write.mode("append").parquet(factDir)

    val refs = Seq(LevelRef("OrderDate", Some("Year")),
      LevelRef("Priority", Some("Priority")))
    val stream = spark.readStream.schema(orders.schema).parquet(factDir)
    val sq = Streaming.rollupRefreshStream(isoCat, "orders", refs, stream,
      path, s"$dir/ckpt")
    def routed(): Map[String, (Double, Long)] =
      Planner.plan(isoCat, CubeQuery("orders",
        Seq(LevelDrill(LevelRef("Priority"))),
        Seq("total_sales", "order_count"))).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    def truth(of: org.apache.spark.sql.DataFrame): Map[String, (Double, Long)] =
      of.groupBy("o_orderpriority")
        .agg(sum(expr("CAST(o_totalprice AS DECIMAL(27,6))")).cast("double"),
          count(lit(1)))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
        .toMap
    // the serving layer's result cache must not outlive a rollup swap —
    // drive the same query through the cached AxesResult path around a batch
    def servedCounts(): Double = {
      val doc = graft.result.Json.parse(graft.result.AxesResult.json(isoCat,
        CubeQuery("orders", Seq(LevelDrill(LevelRef("Priority"))),
          Seq("order_count")))).asInstanceOf[Map[String, Any]]
      def flat(v: Any): Seq[Double] = v match {
        case s: Seq[_] => s.flatMap(flat)
        case n: Number => Seq(n.doubleValue())
        case _ => Nil
      }
      flat(doc("values")).sum
    }
    try {
      sq.processAllAvailable()
      // the answer is slice1-ONLY — which also proves the query ROUTED to
      // the streaming rollup instead of scanning the (full) catalog fact
      assert(routed() == truth(slice1))
      assert(servedCounts() == slice1.count().toDouble) // now cached
      slice2.coalesce(1).write.mode("append").parquet(factDir)
      sq.processAllAvailable()
      assert(routed() == truth(orders))
      // the swap invalidated the cached axis: the served answer is fresh
      assert(servedCounts() == orders.count().toDouble)
    } finally sq.stop()
    // replay guard: re-applying the last published batch id must change
    // nothing (foreachBatch redelivers the trailing batch after a restart)
    val marker = Rollups.readMarker(spark, path)
    assert(marker.exists(_.toLongOption.nonEmpty))
    val before = spark.read.parquet(path).collect().toSet
    Streaming.applyRollupBatch(isoCat, "orders", refs, slice2,
      marker.get.toLong, path)
    assert(Rollups.readMarker(spark, path) == marker)
    assert(spark.read.parquet(path).collect().toSet == before)
    // and a NEW batch id with fresh rows still merges (delta discipline)
    Streaming.applyRollupBatch(isoCat, "orders", refs, slice2,
      marker.get.toLong + 1, path)
    val doubled = routed()
    val t1 = truth(orders); val t2 = truth(slice2)
    doubled.foreach { case (k, (sales, n)) =>
      assert(n == t1(k)._2 + t2(k)._2)
      assert(math.abs(sales - (t1(k)._1 + t2(k)._1)) < 1e-6)
    }
  }

  test("attribution stateTtl expires an idle user's context; without a " +
      "TTL the first touch is sticky forever") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_id", LongType), StructField("event_type",
        StringType)))
    def file(dir: String, rows: (Long, String, Long, String)*): Unit =
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows.map { case (u, t, id, tp) =>
            org.apache.spark.sql.Row(u, java.sql.Timestamp.valueOf(t), id,
              tp) }, 1), schema)
        .write.mode("append").parquet(dir)
    val dir = Files.createTempDirectory("graft-attr-ttl").toString
    // file 1: user 1's only touch; user 2 pushes the watermark to ~09:59
    file(dir, (1L, "2024-01-01 00:00:00", 10L, "click"),
      (2L, "2024-01-01 10:00:00", 20L, "view"))
    // file 2 (later batch): between batches the buffer-drain timer fires
    // with the watermark already past 00:00 + TTL → with a 1-hour TTL the
    // context expires; user 3 pushes the watermark past the conversion
    file(dir, (3L, "2024-01-01 20:00:00", 30L, "view"))
    // file 3: user 1 converts at 15:00 — watermark-closed by now
    file(dir, (1L, "2024-01-01 15:00:00", 40L, "purchase"),
      (4L, "2024-01-02 10:00:00", 50L, "view"))
    def run(ttl: Option[String], q: String): Seq[org.apache.spark.sql.Row] = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      Streaming.runToMemory(spark, Streaming.attributionStream(spark,
        stream, "1 minute", stateTtl = ttl).toDF(), q)
      spark.table(q).filter(col("user_id") === 1).collect().toSeq
    }
    val noTtl = run(None, "attr_ttl_off")
    assert(noTtl.length == 1 &&
      noTtl.head.getAs[Long]("first_touch_id") == 10L,
      s"without TTL the conversion attributes to the click: $noTtl")
    val withTtl = run(Some("1 hour"), "attr_ttl_on")
    assert(withTtl.isEmpty,
      s"a 1-hour-TTL context must expire before the 15:00 conversion: " +
        s"$withTtl")
  }
}
