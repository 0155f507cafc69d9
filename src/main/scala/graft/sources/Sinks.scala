package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Per-partition manifest of a document corpus: docs, whitespace tokens,
    * and an aggregation-ORDER-INDEPENDENT content checksum (decimal sum of
    * per-doc xxhash64 — a decimal, not a long, because ANSI long sums
    * overflow; any added/dropped/altered text changes it). */
  def corpusManifest(docs: DataFrame, partitionCol: String): DataFrame =
    docs.groupBy(col(partitionCol))
      .agg(count(lit(1)).as("docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("tokens"),
        sum(xxhash64(col("text")).cast("decimal(38,0)")).as("checksum"))
      .orderBy(partitionCol)

  /** Curated-corpus EXPORT — the terminal step of a training-data pipeline:
    * land the filtered/deduped corpus as `partitionCol`-partitioned parquet
    * (downstream readers prune on it) with bounded file sizes, and write a
    * single-file JSON manifest next to it recording per-partition doc/token
    * counts and the content checksum. Returns the manifest frame.
    *
    * Scale shape: one shuffle-free partitioned write (Spark splits files
    * per partition value) + one corpus aggregation for the manifest. The
    * manifest is partition-cardinality-sized — driver-safe by design. */
  def exportCorpus(docs: DataFrame, path: String, partitionCol: String,
      maxRecordsPerFile: Long = 1000000L): DataFrame = {
    write(docs, path, partitionBy = Seq(partitionCol),
      maxRecordsPerFile = maxRecordsPerFile)
    val manifest = corpusManifest(docs, partitionCol)
    manifest.coalesce(1).write.mode("overwrite").json(path + "_manifest")
    manifest
  }

  /** Re-read an export and verify it against its manifest: every partition
    * present, counts/tokens/checksum identical. Returns the per-partition
    * comparison (empty = clean) so callers can report WHICH slice drifted —
    * the post-copy integrity check a pipeline runs before handing a corpus
    * to a training job. */
  def validateExport(spark: SparkSession, path: String, partitionCol: String)
      : DataFrame = {
    val actual = corpusManifest(spark.read.parquet(path), partitionCol)
    val expected = spark.read.json(path + "_manifest")
      .select(col(partitionCol), col("docs"), col("tokens"),
        col("checksum").cast("decimal(38,0)").as("checksum"))
    expected.as("e").join(actual.as("a"), Seq(partitionCol), "full_outer")
      .where(
        col("e.docs").isNull || col("a.docs").isNull ||
        col("e.docs") =!= col("a.docs") ||
        col("e.tokens") =!= col("a.tokens") ||
        col("e.checksum") =!= col("a.checksum"))
      .select(col(partitionCol), col("e.docs").as("manifest_docs"),
        col("a.docs").as("actual_docs"), col("e.tokens").as("manifest_tokens"),
        col("a.tokens").as("actual_tokens"))
  }
}
