package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.ScaleOps
import SparkTestSession.{catalog => cat, spark}

/** Physical-layout techniques: bucketed co-located joins (no exchange) and
  * salted joins/aggregations (identical results, skew split). */
class ScaleOpsSpec extends AnyFunSuite {

  test("same-bucketed tables join without a shuffle") {
    ScaleOps.writeBucketed(cat.table("lineitem"), "li_b",
      Seq("l_orderkey"), 8)
    ScaleOps.writeBucketed(cat.table("orders")
      .withColumnRenamed("o_orderkey", "l_orderkey"), "ord_b",
      Seq("l_orderkey"), 8)
    val joined = ScaleOps.bucketedJoin(spark, "li_b", "ord_b",
      Seq("l_orderkey"))
    joined.count() // finalize AQE
    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n${plan.take(800)}")
    assert(joined.count() == cat.table("lineitem").count())
  }

  test("a year cut on a time-partitioned fact prunes partitions at the " +
      "scan and matches the unpartitioned result") {
    import graft.model._
    import graft.planner._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-part").toString
    ScaleOps.writePartitioned(
      cat.table("lineitem")
        .withColumn("ship_year", year(col("l_shipdate"))),
      dir, Seq("ship_year"))
    val fact = spark.read.parquet(dir)
    // minimal cube over the partitioned layout: the Year level's key IS
    // the physical partition column, so the cut reaches the directory list
    val cube = CubeDef("sales_part", "lineitem_part",
      dimensions = Seq(DimensionDef("ShipDate", Seq(HierarchyDef("Monthly",
        Seq(LevelDef("Year", "ship_year", "ship_year"),
          LevelDef("Month", "month(l_shipdate)", "ship_month")))),
        isTime = true)),
      measures = Seq(MeasureDef("Revenue", "revenue", Agg.Sum,
        "l_extendedprice * (1.0 - l_discount)")))
    val pcat = new CubeCatalog(spark,
      SchemaDef("part_demo", Seq(cube)), Map("lineitem_part" -> fact))
    val q = CubeQuery("sales_part",
      Seq(LevelDrill(LevelRef("ShipDate", Some("Month"), Some("Monthly")))),
      Seq("revenue"),
      cuts = Seq(MemberCut(LevelRef("ShipDate", Some("Year"),
        Some("Monthly")), 1995)))
    val df = Planner.plan(pcat, q)
    df.count() // finalize AQE so the executed plan is the real one
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters:") &&
      plan.replaceAll("#\\d+", "").contains("ship_year = 1995"),
      s"cut must prune partitions:\n${plan.take(1200)}")
    // identical numbers to the standard (unpartitioned, expression-keyed)
    // catalog answering the same question
    val base = Planner.plan(cat, CubeQuery("sales",
        Seq(LevelDrill(LevelRef("ShipDate", Some("Month"), Some("Monthly")))),
        Seq("revenue"),
        cuts = Seq(MemberCut(LevelRef("ShipDate", Some("Year"),
          Some("Monthly")), 1995))))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val part = df.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(part == base)
  }

  test("decontamination plan broadcasts bench grams, never cartesians") {
    val docs = cat.table("documents")
    val df = ops.TextOps.decontaminate(
      docs.where(col("source") =!= "src0"),
      docs.where(col("source") === "src0"), 5)
    df.count() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"bench gram join must broadcast:\n${plan.take(800)}")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("salted join equals the plain join exactly") {
    val li = cat.table("lineitem").select("l_orderkey", "l_extendedprice")
    val ord = cat.table("orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(ord, "l_orderkey")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = ScaleOps.saltedJoin(li, ord, "l_orderkey", 4)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted aggregation equals the plain aggregation exactly") {
    val li = cat.table("lineitem")
    val plain = li.groupBy("l_returnflag")
      .agg(sum(expr("CAST(l_quantity AS DECIMAL(27,6))")).cast("double")
        .as("q"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val salted = ScaleOps.saltedAggregate(li, Seq("l_returnflag"), 8, Seq(
      sum(expr("CAST(l_quantity AS DECIMAL(27,6))")).as("qp") ->
        sum(col("qp")).cast("double").as("q"),
      count(lit(1)).as("np") -> sum(col("np")).as("n")))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(salted == plain)
  }

  test("time-partitioned sink writes prune on read (PartitionFilters)") {
    // the 100 TB fact layout: partition by the cut column (SURVEY §4.3) so a
    // year cut never touches the other years' files
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val li = cat.table("lineitem")
      .withColumn("ship_year", expr("year(l_shipdate)"))
    graft.sources.Sinks.write(li, dir, partitionBy = Seq("ship_year"))
    val back = spark.read.parquet(dir).where(col("ship_year") === 1996)
    val plan = back.queryExecution.executedPlan.toString()
    assert("PartitionFilters: \\[[^\\]]*1996".r.findFirstIn(plan).nonEmpty,
      plan)
    assert(back.count() ==
      li.where(expr("year(l_shipdate) = 1996")).count())
  }

  test("corpus export round-trips clean; tampering is detected per slice") {
    val dir = java.nio.file.Files.createTempDirectory("graft-exp").toString +
      "/corpus"
    val docs = cat.table("documents")
    val manifest = graft.sources.Sinks.exportCorpus(docs, dir, "lang")
    assert(manifest.columns.toSeq ==
      Seq("lang", "docs", "tokens", "checksum"))
    assert(manifest.agg(sum(col("docs"))).collect()(0).getLong(0) ==
      docs.count())
    // clean export: validator returns no drifted slices
    assert(graft.sources.Sinks.validateExport(spark, dir, "lang").isEmpty)
    // drop one partition directory wholesale → exactly that slice reported
    val langs = manifest.select("lang").collect().map(_.getString(0))
    val victim = langs.head
    val vdir = java.nio.file.Paths.get(dir, s"lang=$victim")
    java.nio.file.Files.walk(vdir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.delete(p))
    val drift = graft.sources.Sinks.validateExport(spark, dir, "lang")
      .collect()
    assert(drift.map(_.getString(0)).toSeq == Seq(victim))
    assert(drift(0).isNullAt(2)) // actual_docs null: the slice is GONE
  }
}
