package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** `runMain graft.tools.TimeQuery <name> [sfDir] [reps]` — time one
  * SparkEntry query in isolation (count() to execute, no result writing),
  * after a warmup rep. Add `explain` as 4th arg to print the formatted plan. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (args.lift(3).contains("explain")) fn(spark, sfDir).explain("formatted")
    (0 until reps).foreach { i =>
      spark.catalog.clearCache() // cold-cache, warm-JVM per rep
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[time] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
