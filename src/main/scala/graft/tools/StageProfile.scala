package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** `runMain graft.tools.StageProfile <name> [sfDir] [reps]` — run one
  * SparkEntry query and print every JOB and STAGE with wall durations and
  * task counts (guide §1: find where the time goes before changing code).
  * Stages carry their callsite so exchanges/checkpoints are attributable.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.tools.StageProfile <query> [sfDir] [reps]")
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)

    case class St(id: Int, name: String, tasks: Int, ms: Long, callsite: String)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val jobStart = scala.collection.mutable.Map.empty[Int, Long]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        stages += St(i.stageId, i.name, i.numTasks, ms, i.details.linesIterator
          .find(l => l.contains("graft") && !l.contains("StageProfile"))
          .getOrElse("").trim)
      }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart(e.jobId) = e.time
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs += ((e.jobId, e.time - jobStart.getOrElse(e.jobId, e.time)))
    }
    spark.sparkContext.addSparkListener(listener)

    (0 until reps).foreach { rep =>
      spark.catalog.clearCache()
      stages.clear(); jobs.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir) // frame construction (planner work, any
      val t1 = System.nanoTime() // member-lookup collects run here)
      val n = df.count()
      val t2 = System.nanoTime()
      val wall = (t2 - t0) / 1e9
      println(f"[split] build ${(t1 - t0) / 1e9}%.3f s, " +
        f"execute ${(t2 - t1) / 1e9}%.3f s")
      // drain the bus for real — a fixed sleep can miss late completions
      org.apache.spark.sql.graftshim.SparkShim.drainListenerBus(spark, 10000)
      println(f"%n=== $name rep$rep: $wall%.3f s total, $n rows, " +
        f"${jobs.size} jobs, ${stages.size} stages ===")
      println(f"jobs: ${jobs.sortBy(_._1).map(j => s"${j._2}ms").mkString(" ")}")
      stages.sortBy(-_.ms).take(25).foreach { s =>
        println(f"  ${s.ms}%6d ms  ${s.tasks}%4d tasks  stage${s.id}%-5d " +
          f"${s.name.take(60)}%-60s ${s.callsite.take(80)}")
      }
    }
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
