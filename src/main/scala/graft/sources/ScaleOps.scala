package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout techniques for the 100 TB design point: bucketing for
  * shuffle-free co-located joins, and salting for skewed keys. Both preserve
  * results exactly — they only change the physical plan. */
object ScaleOps {

  /** Write a table bucketed (and sorted) by join keys. Subsequent equi-joins
    * between tables bucketed the same way need NO shuffle — at fact scale
    * (lineitem ⋈ orders on the order key) that removes the dominant exchange
    * from every query that crosses them. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Write a fact TIME-PARTITIONED (the SURVEY §4.3 design point): with the
    * partition column declared as a level key, a cut on it becomes a
    * partition filter that prunes whole directories at the scan — at 100 TB
    * the difference between touching one year and listing all of them.
    * Results are identical to the unpartitioned layout (ScaleOpsSpec proves
    * both the pruning and the equality). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Shuffle-free join of two same-bucketed tables (hinted merge join so
    * neither side broadcasts away the demonstration). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      usingKeys: Seq[String]): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), usingKeys)

  /** Salted equi-join for a skewed key: the (big, skewed) left side gets a
    * deterministic salt derived from its row content; the right side is
    * replicated once per salt. The join key becomes (key, salt), splitting a
    * hot key's rows across `salts` tasks. Results are identical to the
    * unsalted join. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts)).cast("int"))
    val saltedRight = right
      .withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
    saltedLeft.join(saltedRight,
        saltedLeft(key) === saltedRight(key) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop(saltedRight(key)).drop("__salt")
  }

  /** Two-stage salted aggregation for skew-prone high-cardinality
    * aggregations: partial aggregate on (keys, salt), then final aggregate on
    * keys. Spark's hash aggregate already does map-side partials; this form
    * additionally splits a single hot REDUCER key across `salts` reducers.
    * `partials` maps each measure to (stage1 agg, stage2 re-agg of stage1). */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
      partials: Seq[(Column, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(salts)).cast("int"))
    val stage1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._1, partials.tail.map(_._1): _*)
    stage1.groupBy(keys.map(col): _*)
      .agg(partials.head._2, partials.tail.map(_._2): _*)
  }
}
