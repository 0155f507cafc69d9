package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a gate query's result rows against any sf-layout directory —
  * the inspection counterpart of [[TimeQuery]] (which only times).
  * Usage: runMain graft.tools.ShowQuery <query> [sfDir] [rows]
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val rows = args.lift(2).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    graft.SparkEntry.queries(name)(spark, sfDir).show(rows, truncate = false)
    spark.stop()
  }
}
