package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, processed batch-wise with mapPartitions
  * (the Scala analog of arrow-batched Python UDFs).
  *
  * The actual media decode is STUBBED (no codec libraries in this
  * environment): `decodeStub` derives deterministic fake features from the
  * bytes. Everything around it — schema, encoders, partition-wise batching,
  * metadata propagation — is the real plumbing a codec would plug into:
  * replace the body of `decodeStub` with the real decoder and nothing else
  * changes.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, nFrames: Int)
  case class MediaRow(doc_id: Long, media: Array[Byte], meta: MediaMeta)
  case class DecodedRow(doc_id: Long, format: String, width: Int, height: Int,
      n_frames: Int, n_bytes: Int, features: Array[Double])

  /** Attach a deterministic fake media payload + metadata to each document
    * (stands in for reading a real binary column from parquet). */
  def attachFakeMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      unhex(md5(col("text"))).as("media"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (lit(64) + (col("doc_id") % 8) * 32).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 5) * 48).cast("int").as("height"),
        (col("doc_id") % 10 + 1).cast("int").as("nFrames")).as("meta"))

  /** STUB decoder — stands in for an image/audio codec. Deterministic:
    * features are byte-derived moments. Real implementation would decode
    * `media` (e.g. via javax.imageio / ffmpeg bindings) per partition. */
  private def decodeStub(r: MediaRow): DecodedRow = {
    val bytes = r.media
    var s0 = 0.0; var s1 = 0.0; var mx = Double.MinValue
    var i = 0
    while (i < bytes.length) {
      val v = (bytes(i) & 0xff).toDouble
      s0 += v; s1 += v * v; if (v > mx) mx = v
      i += 1
    }
    val n = math.max(bytes.length, 1)
    DecodedRow(r.doc_id, r.meta.format, r.meta.width, r.meta.height,
      r.meta.nFrames, bytes.length,
      Array(s0 / n, math.sqrt(math.max(s1 / n - (s0 / n) * (s0 / n), 0.0)),
        mx, n.toDouble))
  }

  /** Partition-batched decode: binary column → typed features. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(decodeStub))
  }

  /** Deterministic frame sampling: every `stride`-th frame index, exploded to
    * one row per sampled frame (video path; frame decode itself stubbed). */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media.select(col("doc_id"), col("meta.nFrames").as("n_frames"),
        explode(expr(s"sequence(0, meta.nFrames - 1, $stride)"))
          .as("frame_idx"))
      .orderBy("doc_id", "frame_idx")

  /** DECODE-BATCH packing plan — assign media items to fixed-byte-budget
    * decode batches per modality, the scheduling step that feeds a GPU
    * decode pool (each worker takes one batch of ≈ `batchBytes` of decoded
    * output, so batch latency is uniform regardless of item sizes).
    * est_bytes is the decoded size (w·h·frames); the assignment is the
    * concat-then-chunk running sum (the t16 sequence-packing layout applied
    * to bytes), so it is deterministic and engine-replayable. The window
    * partitions by modality; at extreme per-modality cardinality the
    * bucketed two-phase prefix sum of [[TextOps.packOffsets]] is the scale
    * path (same contract). */
  def decodeBatchPlan(media: DataFrame, batchBytes: Long): DataFrame = {
    require(batchBytes > 0, "batchBytes must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("format").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    media.select(col("doc_id"), col("meta.format").as("format"),
        (col("meta.width").cast("long") * col("meta.height") *
          col("meta.nFrames")).as("est_bytes"))
      .withColumn("offset", coalesce(sum("est_bytes").over(w), lit(0L)))
      .withColumn("batch_id", expr(s"offset DIV ${batchBytes}L"))
      .select("doc_id", "format", "est_bytes", "offset", "batch_id")
      .orderBy("format", "doc_id")
  }

  /** 64-bit perceptual hash of the media payload, as two 32-bit halves —
    * STUB: a real pHash would decode and DCT the pixels; the stub derives
    * the 64 bits from the payload's leading bytes (locality-preserving on
    * the payload: a re-encode that perturbs trailing bytes or flips a
    * low bit yields a near-identical hash, the property the dedup pass
    * exploits). Halves ride as separate longs so Hamming distance is the
    * sum of two bit_counts — no wrapping 64-bit arithmetic anywhere the
    * oracle must replay (the d03 portable-SimHash discipline). */
  def mediaPhash(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      expr("CAST(conv(substr(hex(media), 1, 8), 16, 10) AS BIGINT)")
        .as("ph_hi"),
      expr("CAST(conv(substr(hex(media), 9, 8), 16, 10) AS BIGINT)")
        .as("ph_lo"))

  /** MEDIA NEAR-DUPLICATE detection — the image-dedup pass every multimodal
    * training pipeline runs (exact re-uploads and re-encodes of the same
    * asset): pairs within Hamming distance `maxHamming` of the 64-bit
    * [[mediaPhash]]. Candidates come from the pigeonhole combo blocks
    * shared with SimHash ([[Dedup.simhashBlockKeys]] — complete for
    * Hamming ≤ maxHamming, no false negatives), travel SKINNY through the
    * self-join, and verify with two bit_counts. Same scale shape as d03:
    * map-side hash, ~n/2^26-sized buckets, pair work linear until tens of
    * billions of assets. */
  def phashNearDupPairs(media: DataFrame, maxHamming: Int): DataFrame = {
    val fp = mediaPhash(media).localCheckpoint(eager = false)
    val keyed = fp
      .withColumn("ph",
        shiftleft(col("ph_hi"), 32).bitwiseOR(col("ph_lo")))
      .select(col("doc_id"),
        explode(Dedup.simhashBlockKeys("ph", maxHamming)).as("bk"))
    val cand = keyed.select(col("bk").as("bk_a"), col("doc_id").as("doc_a"))
      .join(keyed.select(col("bk").as("bk_b"), col("doc_id").as("doc_b")),
        col("bk_a") === col("bk_b") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    cand
      .join(fp.select(col("doc_id").as("doc_a"), col("ph_hi").as("hi_a"),
        col("ph_lo").as("lo_a")), "doc_a")
      .join(fp.select(col("doc_id").as("doc_b"), col("ph_hi").as("hi_b"),
        col("ph_lo").as("lo_b")), "doc_b")
      .withColumn("hamming",
        expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** ASPECT-RATIO BUCKETING + batch assembly — the multi-aspect training
    * step of image-generation pipelines (NovelAI's aspect-ratio bucketing,
    * SDXL-style multi-aspect finetuning): every image is assigned to the
    * bucket whose target aspect ratio bw/bh is CLOSEST to its own w/h, then
    * packed into fixed-size batches WITHIN its bucket, so every training
    * batch holds uniformly-shaped tensors and no image is cropped to a
    * foreign aspect.
    *
    * The argmin is exact integer arithmetic, not floats: the candidate
    * distances |w/h − bw_j/bh_j| share the per-image denominator h, so
    * comparing |w·bh_j − bw_j·h| · (L/bh_j), with L = lcm of the bucket
    * heights, is the same total order with no division anywhere — the
    * engine-portable determinism every oracle-replayed op here maintains.
    * Ties break to the lowest bucket index.
    *
    * Shape at scale: the bucket table is a literal (argmin is one map-only
    * array_min over per-bucket structs — no join, no shuffle), and batch
    * numbering uses [[graft.ops.Ranking.groupedPrefixSum]]'s two-phase
    * bucketed prefix count — NOT `row_number() OVER (PARTITION BY bucket)`,
    * whose per-bucket state is unbounded when billions of images land in a
    * handful of buckets. One range-bucketed shuffle total. */
  def arBucketPlan(media: DataFrame, buckets: Seq[(Int, Int)],
      batchSize: Int): DataFrame = {
    require(buckets.nonEmpty, "buckets must be non-empty")
    require(batchSize > 0, "batchSize must be positive")
    require(buckets.forall { case (bw, bh) => bw > 0 && bh > 0 },
      "bucket dims must be positive")
    def lcm(a: Long, b: Long): Long = a / BigInt(a).gcd(BigInt(b)).toLong * b
    val lcmBh = buckets.map(_._2.toLong).reduce(lcm)
    val scored = buckets.zipWithIndex.map { case ((bw, bh), j) =>
      struct(
        (abs(col("w") * lit(bh.toLong) - lit(bw.toLong) * col("h")) *
          lit(lcmBh / bh)).as("m"),
        lit(j).as("j"))
    }
    val sel = media.select(col("doc_id"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.width").cast("long").as("w"),
        col("meta.height").cast("long").as("h"))
      .withColumn("bucket", array_min(array(scored: _*)).getField("j"))
      .select(col("doc_id"), col("width"), col("height"), col("bucket"),
        element_at(array(buckets.map(b => lit(b._1)): _*),
          col("bucket") + 1).as("bucket_w"),
        element_at(array(buckets.map(b => lit(b._2)): _*),
          col("bucket") + 1).as("bucket_h"))
    Ranking.groupedPrefixSum(sel, col("bucket"), col("doc_id"),
        col("doc_id"), lit(1L), "__seq")
      .withColumn("batch_id", expr(s"CAST(__seq DIV $batchSize AS INT)"))
      .drop("__seq")
      .orderBy("doc_id")
  }

  /** Metadata-only resize plan (the real pixel op is the stubbed part). */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.select(col("doc_id"), col("meta.width").as("width"),
        col("meta.height").as("height"))
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
      .orderBy("doc_id")
}
