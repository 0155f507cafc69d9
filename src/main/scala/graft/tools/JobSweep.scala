package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** `runMain graft.tools.JobSweep <prefix,prefix,...|all> [sfDir]` — run every
  * matching SparkEntry query once under bench conditions (warm catalog +
  * memoization, cleared storage) and print ONE LINE per query: driver job
  * count, stage count, task count, build/execute wall. The instrument for
  * guide §1 on the fast tail, where per-action scheduling overhead — not
  * compute — dominates: job count is the thing to minimize.
  */
object JobSweep {
  def main(args: Array[String]): Unit = {
    val prefixes = args.headOption.filter(_ != "all")
      .map(_.split(",").map(_.trim).toSeq)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)

    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      prefixes.forall(_.exists(n.startsWith))
    }

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += e.stageInfo.numTasks
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup: same as Bench — catalog + one pass so memoized member lookups
    // and codegen are warm; the measured loop then sees steady state
    graft.CubeCatalog.forDir(spark, sfDir)
    selected.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()

    println(f"${"query"}%-28s ${"jobs"}%5s ${"stg"}%5s ${"tasks"}%6s " +
      f"${"build"}%7s ${"exec"}%7s")
    var totJobs = 0L
    var totWall = 0.0
    selected.foreach { case (name, fn) =>
      org.apache.spark.sql.graftshim.SparkShim.drainListenerBus(spark, 10000)
      jobs = 0; stages = 0; tasks = 0
      val t0 = System.nanoTime()
      val df = try { fn(spark, sfDir) } catch { case _: Throwable => null }
      val t1 = System.nanoTime()
      if (df != null) { try { df.count() } catch { case _: Throwable => () } }
      val t2 = System.nanoTime()
      org.apache.spark.sql.graftshim.SparkShim.drainListenerBus(spark, 10000)
      println(f"$name%-28s $jobs%5d $stages%5d $tasks%6d " +
        f"${(t1 - t0) / 1e9}%7.3f ${(t2 - t1) / 1e9}%7.3f")
      totJobs += jobs
      totWall += (t2 - t0) / 1e9
    }
    println(f"TOTAL ${selected.size} queries: $totJobs jobs, $totWall%.1f s")
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
