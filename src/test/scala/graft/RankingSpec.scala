package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Ranking
import SparkTestSession.spark

/** Two-phase distributed global rank / NTILE tiling: equals the
  * single-partition window forms row-for-row, without ever running one. */
class RankingSpec extends AnyFunSuite {
  import spark.implicits._

  // values with heavy ties across bucket boundaries-to-be, unique tiebreak
  private def frame(n: Int) = (1 to n)
    .map(i => ((i * 37 % 19) * 10.0, i.toLong))
    .toDF("v", "id")

  test("globalRank equals a global row_number over (v, id)") {
    val df = frame(977)
    val got = Ranking.globalRank(df, col("v"), col("id"), bucketWidth = 25.0)
    val want = df.withColumn("global_rank",
      row_number().over(Window.orderBy(col("v").asc, col("id").asc))
        .cast("long"))
    assert(got.select("v", "id", "global_rank").except(want).isEmpty &&
      want.except(got.select("v", "id", "global_rank")).isEmpty)
  }

  test("equiDepthTiles matches SQL NTILE, n not divisible by tiles") {
    val df = frame(103) // 103 = 4*25 + 3: first 3 tiles take 26
    val got = Ranking.equiDepthTiles(df, col("v"), col("id"),
      tiles = 4, bucketWidth = 40.0)
    val want = df.withColumn("tile", ntile(4).over(
      Window.orderBy(col("v").asc, col("id").asc)))
    assert(got.select("v", "id", "tile").except(want).isEmpty &&
      want.except(got.select("v", "id", "tile")).isEmpty)
    val sizes = got.groupBy("tile").count().orderBy("tile")
      .as[(Int, Long)].collect().toSeq
    assert(sizes == Seq((1, 26L), (2, 26L), (3, 26L), (4, 25L)))
  }

  test("fewer rows than tiles: each row its own tile, like NTILE") {
    val df = frame(3)
    val got = Ranking.equiDepthTiles(df, col("v"), col("id"),
      tiles = 8, bucketWidth = 50.0)
    val want = df.withColumn("tile", ntile(8).over(
      Window.orderBy(col("v").asc, col("id").asc)))
    assert(got.select("v", "id", "tile").except(want).isEmpty &&
      want.except(got.select("v", "id", "tile")).isEmpty)
  }

  test("ranking windows are partitioned (no single-partition data window)") {
    val df = frame(500)
    val ranked = Ranking.globalRank(df, col("v"), col("id"), 25.0)
    val plan = ranked.queryExecution.executedPlan.toString()
    // the per-row window must run partitioned on the bucket; the only
    // SinglePartition exchange allowed feeds the bucket-count-sized offsets
    val windows = plan.split("\n").filter(_.contains("Window "))
    assert(windows.exists(_.contains("__rk_b")),
      s"expected bucket-partitioned window:\n${plan.take(1200)}")
  }
}
