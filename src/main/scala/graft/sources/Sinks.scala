package graft.sources

import org.apache.spark.sql.DataFrame

/** Result sinks. The reference streams results over HTTP only (SURVEY §2.E
  * notes "sinks: none"); a Spark-native engine should also land results as
  * files — with the partitioning knobs that matter at scale. */
object Sinks {

  /** Write a (typically aggregated, axis-sized) result. For fact-sized
    * exports use `partitionBy` so downstream reads prune, and
    * `maxRecordsPerFile` to bound file sizes. */
  def write(df: DataFrame, path: String, format: String = "parquet",
      mode: String = "overwrite", partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L,
      options: Map[String, String] = Map.empty): Unit = {
    var w = df.write.format(format).mode(mode).options(options)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    if (maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
    w.save(path)
  }

  /** Single-file CSV export with the tidy conventions (header, empty string
    * for null) — for small axis-sized results only. */
  def csvSingle(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("emptyValue", "").csv(path)
}
