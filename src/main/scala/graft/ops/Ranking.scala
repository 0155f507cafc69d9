package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — total-order row numbers and equi-depth
  * tiles WITHOUT a single-partition window.
  *
  * A bare `row_number() OVER (ORDER BY v)` moves the whole table to one
  * partition (Spark warns, and at 100 TB it simply does not run). The
  * two-phase shape here is the same trick [[TextOps.packOffsets]] uses for
  * sequence packing: bucket rows by an equi-width range of the sort value,
  * count per bucket, turn the bucket counts into starting offsets (the only
  * unpartitioned window runs over the bucket-count-sized aggregate, which is
  * bounded by value-range/width, never by row count), then rank WITHIN each
  * bucket — partitioned, parallel — and add the bucket's offset. Equal sort
  * values always share a bucket, so concatenating bucket-local orders IS the
  * global order. This is exactly how a range-partitioned sort assigns global
  * positions; we keep it declarative so Catalyst still prunes and pushes
  * down around it.
  */
object Ranking {

  /** Global 1-based row number over (value asc, tieBreak asc), appended as
    * `rankCol`. `bucketWidth` sizes the equi-width value buckets: pick it so
    * the bucket COUNT stays bounded (range/width buckets — that aggregate
    * is the only data that ever concentrates). Ties on value must be broken
    * by `tieBreak` (unique), making the order total and the result
    * deterministic under any partitioning. */
  def globalRank(df: DataFrame, value: Column, tieBreak: Column,
      bucketWidth: Double, rankCol: String = "global_rank"): DataFrame =
    ranked(df, value, tieBreak, bucketWidth, rankCol)
      .drop("__rk_total")

  /** [[globalRank]] plus a `__rk_total` column (the total row count,
    * piggybacked on the bucket-offset frame — no extra pass over the
    * data). */
  private def ranked(df: DataFrame, value: Column, tieBreak: Column,
      bucketWidth: Double, rankCol: String): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // localCheckpoint: the bucketed frame feeds BOTH the offset aggregate
    // and the rank join — without it the (possibly expensive) upstream plan
    // runs twice; blocks are GC-released with the result (Dedup convention)
    val b = df.withColumn("__rk_v", value)
      .withColumn("__rk_t", tieBreak)
      .withColumn("__rk_b",
        floor(col("__rk_v").cast("double") / lit(bucketWidth)).cast("long"))
      .localCheckpoint(eager = false)
    // bucket-count-sized: the unpartitioned windows below are bounded by the
    // value range, not the row count (packOffsets discipline); the total
    // rides the same tiny frame so callers never re-aggregate the data
    val offs = b.groupBy("__rk_b").agg(count(lit(1)).as("__rk_n"))
      .withColumn("__rk_off", coalesce(
        sum("__rk_n").over(Window.orderBy("__rk_b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__rk_total",
        sum("__rk_n").over(Window.orderBy("__rk_b").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("__rk_b", "__rk_off", "__rk_total")
    b.withColumn("__rk_w", row_number().over(
        Window.partitionBy("__rk_b")
          .orderBy(col("__rk_v").asc, col("__rk_t").asc)))
      .join(broadcast(offs), "__rk_b")
      .withColumn(rankCol, col("__rk_off") + col("__rk_w"))
      .drop("__rk_b", "__rk_v", "__rk_t", "__rk_w", "__rk_off")
  }

  /** SQL-standard NTILE(tiles) computed from a global rank and the total
    * row count: the first (n mod tiles) tiles take ⌈n/tiles⌉ rows, the rest
    * ⌊n/tiles⌋ — pure integer arithmetic, so it matches every engine's
    * NTILE bit-for-bit. `rank` is 1-based, `n` the total count. */
  def ntileOf(rank: Column, n: Column, tiles: Int): Column = {
    val nL = n.cast("long")
    val baseL = intDiv(nL, lit(tiles.toLong))
    val rem = nL % lit(tiles.toLong)
    val cut = rem * (baseL + 1)
    // greatest(baseL, 1): when n < tiles the otherwise-branch is never
    // selected (cut = n covers every rank); the clamp only keeps the
    // division total
    when(rank <= cut, intDiv(rank - 1, baseL + 1) + 1)
      .otherwise(rem + intDiv(rank - cut - 1, greatest(baseL, lit(1L))) + 1)
      .cast("int")
  }

  /** Exact integer division on Column (Column./ is double division; the
    * decimal hop keeps 38-digit exactness, floor restores the integer). */
  private def intDiv(a: Column, b: Column): Column =
    floor(a.cast("decimal(38,0)") / b.cast("decimal(38,0)")).cast("long")

  /** PREFIX SUM of `weight` within each `part` group, over the
    * (value asc, tieBreak asc) total order, EXCLUSIVE of the current row —
    * appended as `outCol`. Same two-phase shape as [[globalRank]], with the
    * group key prepended to the bucket: per-(group, bucket) subtotals
    * cumulate in a window partitioned BY GROUP over the bucket order
    * (groups × buckets rows — tiny), and the per-row window partitions by
    * (group, bucket). A group's rows therefore never concentrate on one
    * partition, no matter how large the group — the failure mode of the
    * naive `SUM OVER (PARTITION BY group ORDER BY …)`, whose per-group
    * state is unbounded at corpus scale. */
  def groupedPrefixSum(df: DataFrame, part: Column, value: Column,
      tieBreak: Column, weight: Column, bucketWidth: Double,
      outCol: String): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b = df.withColumn("__rk_p", part)
      .withColumn("__rk_v", value)
      .withColumn("__rk_t", tieBreak)
      .withColumn("__rk_w", weight.cast("long"))
      .withColumn("__rk_b",
        floor(col("__rk_v").cast("double") / lit(bucketWidth)).cast("long"))
      .localCheckpoint(eager = false)
    val offs = b.groupBy("__rk_p", "__rk_b")
      .agg(sum("__rk_w").as("__rk_n"))
      .withColumn("__rk_off", coalesce(
        sum("__rk_n").over(Window.partitionBy("__rk_p").orderBy("__rk_b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__rk_p", "__rk_b", "__rk_off")
    b.withColumn("__rk_c", coalesce(
        sum("__rk_w").over(Window.partitionBy("__rk_p", "__rk_b")
          .orderBy(col("__rk_v").asc, col("__rk_t").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(offs), Seq("__rk_p", "__rk_b"))
      .withColumn(outCol, col("__rk_off") + col("__rk_c"))
      .drop("__rk_p", "__rk_b", "__rk_v", "__rk_t", "__rk_w", "__rk_c",
        "__rk_off")
  }

  /** Equi-depth tiling: appends `tile` (1..tiles, NTILE semantics) over the
    * total order (value asc, tieBreak asc). The total count rides the
    * broadcast bucket-offset frame — no second pass over the data, no
    * driver collect, no global window. */
  def equiDepthTiles(df: DataFrame, value: Column, tieBreak: Column,
      tiles: Int, bucketWidth: Double): DataFrame = {
    require(tiles > 0, "tiles must be positive")
    ranked(df, value, tieBreak, bucketWidth, "global_rank")
      .withColumn("tile",
        ntileOf(col("global_rank"), col("__rk_total"), tiles))
      .drop("__rk_total")
  }
}
