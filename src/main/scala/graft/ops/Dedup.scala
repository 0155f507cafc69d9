package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SimHash64.simhash64

/** Near-duplicate detection at corpus scale. Three families, all shuffle-lean:
  *
  *  - MinHash + LSH banding: shingle → minhash signature (per-row map) →
  *    band keys → shuffle on band key → candidate pairs within buckets only.
  *    The only quadratic work happens inside a bucket, and bucket sizes are
  *    bounded by genuine similarity, not corpus size.
  *  - SimHash (custom Catalyst expression) + 16-bit chunk blocking: pairs
  *    agreeing on ≥1 of 4 chunks are candidates (covers Hamming ≤ 3 exactly,
  *    by pigeonhole).
  *  - Exact blocked n-gram Jaccard: the verification oracle for both, and a
  *    standalone dedup for small blocks.
  */
object Dedup {

  /** Distinct k-word shingles of `text` (single-space tokenization). */
  def shingles(textCol: String, k: Int): Column = expr(
    s"""CASE WHEN size(split($textCol, ' ')) < $k THEN array()
       |ELSE array_distinct(transform(
       |  sequence(1, size(split($textCol, ' ')) - ${k - 1}),
       |  i -> concat_ws(' ', slice(split($textCol, ' '), i, $k)))) END"""
      .stripMargin)

  /** Distinct k-word shingles hashed to 64-bit longs. Intersection/union
    * SIZES are invariant under the (injective modulo ~2^-64 collisions)
    * hash, so Jaccard over hashed shingles equals Jaccard over strings —
    * while pairwise set ops run on longs instead of short strings (the hot
    * path of blocked O(n²) verification). Native one-pass expression
    * ([[graft.functions.ShingleHashes]]); the declarative
    * split/transform/xxhash64 chain it replaces is interpreted and was the
    * dominant cost of both LSH and exact-Jaccard dedup. */
  def hashedShingles(textCol: String, k: Int): Column =
    graft.functions.ShingleHashes.shingleHashes(col(textCol), k)

  /** MinHash signature: H independent permutations approximated by seeded
    * xxhash64; signature element j = min over shingles of hash_j. One
    * imperative pass via the native [[graft.functions.MinHashSig]]
    * expression. */
  def minhashSignature(shCol: String, numHashes: Int): Column =
    graft.functions.MinHashSig.minhashSig(col(shCol), numHashes)

  /** LSH candidate pairs from banded minhash signatures, with estimated
    * (signature-agreement) and true Jaccard; `threshold` filters on true.
    * bands*rows must equal the signature length. */
  def minhashLshPairs(docs: DataFrame, shingleK: Int, bands: Int, rows: Int,
      threshold: Double): DataFrame = {
    val h = bands * rows
    // persisted: shingling + signing is the expensive per-row map and this
    // frame feeds banding plus BOTH sides of the candidate re-attach join —
    // without the persist it is recomputed three times
    val sh = docs
      .select(col("doc_id"), hashedShingles("text", shingleK).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature("sh", h))
      .persist()
    // Candidate generation on SKINNY rows (doc_id + band key only) — the
    // signature/shingle arrays don't ride through the self-join shuffle.
    // Arrays re-attach per side after pair dedup.
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rows).map(r => s"sig[${b * rows + r}]")
      struct(lit(b).as("band"), expr(s"xxhash64(${slice.mkString(", ")})")
        .as("bh"))
    }
    val banded = sh.select(col("doc_id"),
      explode(array(bandCols: _*)).as("bk"))
    val cand = banded.select(col("bk").as("bk_a"), col("doc_id").as("doc_a"))
      .join(banded.select(col("bk").as("bk_b"), col("doc_id").as("doc_b")),
        col("bk_a") === col("bk_b") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("sig").as("sig_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        col("sig").as("sig_b")), "doc_b")
      .withColumn("est_jaccard", expr(
        s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), b -> b)) / $h"))
      .withColumn("inter", expr("size(array_intersect(sh_a, sh_b))"))
      .withColumn("jaccard",
        expr("inter / (size(sh_a) + size(sh_b) - inter)"))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup pairs: fingerprint via the native SimHash64 expression,
    * block on 4×16-bit chunks (pigeonhole-complete for Hamming ≤ 3), verify
    * with bit_count(xor). */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val fp = docs.select(col("doc_id"),
      simhash64(split(col("text"), " ")).as("sh"))
    val chunks = fp.select(col("doc_id"), col("sh"),
      explode(expr(
        """array(
          |  struct(0 AS c, CAST(sh & 65535 AS BIGINT) AS v),
          |  struct(1 AS c, CAST(shiftright(sh, 16) & 65535 AS BIGINT) AS v),
          |  struct(2 AS c, CAST(shiftright(sh, 32) & 65535 AS BIGINT) AS v),
          |  struct(3 AS c, CAST(shiftright(sh, 48) & 65535 AS BIGINT) AS v))"""
          .stripMargin)).as("ck"))
    val l = chunks.select(col("ck").as("ck"), col("doc_id").as("doc_a"),
      col("sh").as("sh_a"))
    val r = chunks.select(col("ck").as("ck2"), col("doc_id").as("doc_b"),
      col("sh").as("sh_b"))
    l.join(r, l("ck") === r("ck2") && l("doc_a") < r("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard within a blocking key (quadratic inside a block
    * only — at scale, block on a cheap partition key or LSH bucket first).
    * Two result-preserving prunes keep the O(block²) verification cheap:
    * shingle sets are hashed to longs, and pairs are dropped before the
    * intersect when their sizes alone bound Jaccard below the threshold
    * (J(A,B) ≤ min/max ⇒ |A| and |B| must be within a factor 1/t). */
  def ngramJaccardPairs(docs: DataFrame, k: Int, blockCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    // Inverted-index set-similarity join: instead of materializing O(block²)
    // pairwise array intersections, explode to (shingle → doc) postings,
    // equi-join on the shingle, and COUNT matches per pair — |A∩B| falls out
    // of the groupBy. Pairs sharing no shingle never exist (their Jaccard is
    // 0 < threshold), so results are identical to the quadratic form while
    // work scales with Σ df(shingle)² — the genuine overlap — not block².
    // The size-ratio bound (J ≤ min/max) prunes pairs pre-aggregation.
    // persisted: both posting sides of the self-join re-derive the shingles
    val sh = docs.select(col("doc_id"), col(blockCol).as("block"),
      hashedShingles("text", k).as("sh"))
      .withColumn("n", size(col("sh")))
      .persist()
    val posting = sh.select(col("block"), col("doc_id"), col("n"),
      explode(col("sh")).as("s"))
    val a = posting.select(col("block").as("block_a"),
      col("doc_id").as("doc_a"), col("n").as("na"), col("s").as("s_a"))
    val b = posting.select(col("block").as("block_b"),
      col("doc_id").as("doc_b"), col("n").as("nb"), col("s").as("s_b"))
    a.join(b, col("block_a") === col("block_b") && col("s_a") === col("s_b") &&
        col("doc_a") < col("doc_b") &&
        col("na") >= col("nb") * threshold &&
        col("nb") >= col("na") * threshold)
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", expr("inter / (na + nb - inter)"))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding cosine near-dup pairs within a blocking key. Embeddings are
    * L2-normalized, so cosine = dot product (sequential double fold — matches
    * the DuckDB oracle bit-for-bit). */
  def embeddingNearDupPairs(emb: DataFrame, blockCol: String,
      threshold: Double): DataFrame = {
    val e = emb.select(col("vec_id"), col(blockCol).as("block"),
      expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
    val a = e.select(col("block").as("block_a"), col("vec_id").as("vec_a"),
      col("v").as("v_a"))
    val b = e.select(col("block").as("block_b"), col("vec_id").as("vec_b"),
      col("v").as("v_b"))
    a.join(b, col("block_a") === col("block_b") && col("vec_a") < col("vec_b"))
      .withColumn("cos", Similarity.dot(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
      .orderBy("vec_a", "vec_b")
  }
}
