package graft.ops

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ONE GDPR entry point — `forget(ids)` composes every tombstone the
  * library grew per artifact family (text-LSH [[Dedup.tombstoneDelete]],
  * media fingerprints [[Multimodal.mediaFpDelete]], ANN
  * [[Similarity.pqDelete]]/[[Similarity.ivfDelete]]) and applies it to
  * every standing registration-time artifact of a session, so a
  * right-to-be-forgotten request is one call instead of a per-index
  * checklist a deployment forgets to finish. REST-exposed as
  * `POST /forget` next to `/flush` (same secret gate — both are
  * destructive admin surfaces).
  *
  * WHAT IS REWRITTEN — the walk over [[IndexCache.transformEntries]] is
  * type- and schema-directed, never key-string-guessing, with one
  * documented exception (clusters, below):
  *  - [[Dedup.LshIndex]]: postings + signatures anti-joined on doc_id —
  *    the forgotten doc stops matching delta ingests immediately;
  *  - [[Multimodal.MediaFpIndex]]: [[Multimodal.mediaFpDelete]];
  *  - [[Similarity.PqIndex]] / [[Similarity.IvfIndex]]:
  *    [[Similarity.pqDelete]] / [[Similarity.ivfDelete]] (certificate-
  *    exact serving is unchanged; stale trained geometry documented
  *    there);
  *  - [[Similarity.IvfPqIndex]]: [[Similarity.ivfPqDelete]] (codes
  *    anti-joined, centroids/codebooks stay — aggregate geometry, no
  *    recoverable row — and the per-cell residual bounds refresh from
  *    the survivors, the same-geometry-rebuild invariant its spec pins);
  *  - a [[DataFrame]] whose schema carries `doc_a`/`doc_b` (a standing
  *    pair list): anti-joined on both sides;
  *  - a [[DataFrame]] carrying `doc_id` + `cluster_id` (a standing
  *    cluster artifact): re-clustered through [[Dedup.tombstoneDelete]]
  *    when its sibling pair list is cached under the library's
  *    `lshpairs:`/`lshclusters:` key convention — deleting a node can
  *    SPLIT a component, which only the pair list can recompute. Without
  *    a sibling the deleted rows are dropped and each touched cluster
  *    relabels to its surviving min id — the forgotten doc appears
  *    nowhere, but bridge-split components stay merged until the next
  *    rebuild (conservative in the treat-as-duplicates direction);
  *  - any other [[DataFrame]] exposing a `doc_id` or `vec_id` column:
  *    anti-joined on it;
  *  - everything else (centroid/codebook arrays, BPE merge tables,
  *    hierarchy closures — no per-document rows): untouched.
  *
  * `ids` means ONE identity space across text, media, and vectors (the
  * pipeline convention: embeddings carry their document's id). Deletes
  * are idempotent — re-forgetting an id is a no-op — and the walk
  * quiesces only racing forgets, not ingests (the same "no concurrent
  * ingest during a delete batch" rule every tombstone op states).
  *
  * DURABLE copies too: every persisted layout the session saved or
  * loaded ([[IndexCache.persistedPaths]]) gets the delete batch appended
  * to its tombstone file via [[forgetPersisted]], and each `load*Index`
  * applies tombstones unconditionally — a saved-then-reloaded index can
  * no longer resurrect a forgotten doc.
  *
  * Scale shape: each rewrite is one skinny broadcast anti-join per frame
  * (the delete batch is human-sized), lazily stacked on the already-
  * checkpointed artifact — no artifact is rebuilt, no corpus text or
  * media is re-scanned; the durable side appends a few-KB tombstone file
  * per layout, never rewriting the layout itself. */
object Forget {

  /** What one [[forget]] call rewrote: artifact count per kind label. */
  final case class ForgetReport(replaced: Int, byKind: ListMap[String, Int])

  def forget(spark: SparkSession, ids: Seq[Long]): ForgetReport = {
    require(ids.nonEmpty, "forget needs at least one id")
    import spark.implicits._
    val del = broadcast(ids.toDF("__del").distinct())
    def anti(df: DataFrame, c: String): DataFrame =
      df.join(del, df(c) === col("__del"), "left_anti")
    var kinds = ListMap.empty[String, Int]
    def touched(kind: String): Unit =
      kinds = kinds.updated(kind, kinds.getOrElse(kind, 0) + 1)

    val replaced = IndexCache.transformEntries(spark) { (key, v) =>
      v match {
        case l: Dedup.LshIndex =>
          touched("lsh_index")
          Dedup.LshIndex(anti(l.postings, "doc_id"),
            anti(l.signatures, "doc_id"))
        case m: Multimodal.MediaFpIndex =>
          touched("media_fp_index")
          Multimodal.mediaFpDelete(m, ids.toDF("doc_id"))
        case p: Similarity.PqIndex =>
          touched("pq_index")
          Similarity.pqDelete(p, ids.toDF("vec_id"))
        case i: Similarity.IvfIndex =>
          touched("ivf_index")
          Similarity.ivfDelete(i, ids.toDF("vec_id"))
        case i: Similarity.IvfPqIndex =>
          touched("ivfpq_index")
          Similarity.ivfPqDelete(i, ids.toDF("vec_id"))
        case ds: org.apache.spark.sql.Dataset[_] =>
          val df = ds.toDF()
          val cols = df.columns.toSet
          if (cols("doc_a") && cols("doc_b")) {
            touched("pair_list")
            anti(anti(df, "doc_a"), "doc_b")
          } else if (cols("doc_id") && cols("cluster_id")) {
            touched("clusters")
            forgetClusters(spark, key, df, del, ids)
          } else if (cols("doc_id")) { touched("doc_frame"); anti(df, "doc_id") }
          else if (cols("vec_id")) { touched("vec_frame"); anti(df, "vec_id") }
          else v
        case _ => v
      }
    }
    // DURABLE copies: every persisted layout this session saved or loaded
    // gets the delete batch appended to its tombstone file, which every
    // load*Index applies unconditionally — so the forget survives a
    // process restart instead of living only in the session cache.
    val durable = IndexCache.persistedPaths(spark)
    durable.foreach { case (path, kind) =>
      forgetPersisted(spark, path, ids)
      touched(s"persisted_$kind")
    }
    ForgetReport(replaced + durable.size, kinds)
  }

  /** GDPR for a PERSISTED index layout ([[Dedup.saveLshIndex]],
    * [[Similarity.savePqIndex]], [[Similarity.saveIvfIndex]]): append the
    * delete batch to `path/tombstones/`, which the matching `load*Index`
    * applies UNCONDITIONALLY before returning the index — a reload can
    * never resurrect a forgotten row. Design choice: a tombstone file,
    * not an in-place rewrite — a forget then writes a few KB instead of
    * rewriting a corpus-sized layout (at 100 TB the index IS the data);
    * [[compactPersisted]] folds accumulated tombstones into the data
    * files when the operator chooses to pay that rewrite, and any full
    * rebuild compacts naturally by writing a fresh layout.
    *
    * CRASH-SAFE BY CONSTRUCTION, single step: Spark's file-commit
    * protocol publishes the appended files atomically at job commit
    * (uncommitted task output stays under `_temporary`, which reads
    * ignore), and there is no second step to crash between — either the
    * tombstones committed (every later load applies them) or the call
    * never happened (the caller retries). Re-appending the same ids is
    * idempotent: loads apply tombstones as a distinct anti-join. */
  def forgetPersisted(spark: SparkSession, path: String,
      ids: Seq[Long]): Unit = {
    require(ids.nonEmpty, "forget needs at least one id")
    import spark.implicits._
    ids.distinct.toDF("id").coalesce(1)
      .write.mode("append").parquet(s"$path/tombstones")
  }

  /** A persisted layout's committed tombstones, if any — the frame every
    * `load*Index` anti-joins before returning. */
  private[graft] def tombstonesAt(spark: SparkSession,
      path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString).select("id"))
    else None
  }

  /** COMPACT a persisted index layout: fold its committed tombstones
    * into the data files and drop the tombstone file — the bounded-
    * growth story for a layout that takes deletes for years between
    * full rebuilds. Detects the layout kind from its subdirectories,
    * round-trips it through the matching `load*Index` (which applies
    * the tombstones — and refreshes the ANN cell bounds — exactly as
    * serving would) into a staging dir, then swaps staged → live with
    * the Rollups rename discipline (live aside, staged in, aside
    * dropped). The tombstone file is COPIED into the staged dir before
    * the swap and deleted from the live dir only as the very LAST step,
    * which is what makes every crash window safe: correctness never
    * depends on the compaction having finished — loads apply tombstones
    * unconditionally, and re-applying them to already-compacted data is
    * an idempotent no-op anti-join. A crash leaves either the old
    * layout + tombstones (filtered at load), the staged copy beside an
    * intact live dir (retry overwrites it), the compacted layout +
    * tombstones (re-filtered to the same rows), or the finished state.
    * Returns false (no-op) when the layout carries no tombstones. */
  def compactPersisted(spark: SparkSession, path: String): Boolean = {
    import org.apache.hadoop.fs.{FileUtil, Path => HPath}
    if (tombstonesAt(spark, path).isEmpty) return false
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new HPath(path)
    val fs = live.getFileSystem(conf)
    def has(sub: String) = fs.exists(new HPath(s"$path/$sub"))
    val tmp = path + "__compact_tmp"
    fs.delete(new HPath(tmp), true) // leftover from a crashed attempt
    if (has("postings"))
      Dedup.saveLshIndex(Dedup.loadLshIndex(spark, path), tmp)
    else if (has("fingerprints"))
      Multimodal.saveMediaFpIndex(Multimodal.loadMediaFpIndex(spark, path),
        tmp)
    else if (has("codebooks") && has("cell_res"))
      Similarity.saveIvfPqIndex(Similarity.loadIvfPqIndex(spark, path), tmp)
    else if (has("codebooks"))
      Similarity.savePqIndex(Similarity.loadPqIndex(spark, path), tmp)
    else if (has("centroids"))
      Similarity.saveIvfIndex(Similarity.loadIvfIndex(spark, path), tmp)
    else throw new IllegalArgumentException(
      s"$path is not a persisted index layout")
    IndexCache.unregisterPersisted(spark, tmp) // staging dir, not an index
    // tombstones ride into the staged dir so the swap can never surface
    // a layout whose deletes vanished before its data was filtered
    FileUtil.copy(fs, new HPath(s"$path/tombstones"),
      fs, new HPath(s"$tmp/tombstones"), false, conf)
    val old = new HPath(path + "__compact_old")
    fs.delete(old, true)
    if (!fs.rename(live, old))
      throw new java.io.IOException(s"compact: rename $path aside failed")
    if (!fs.rename(new HPath(tmp), live)) {
      fs.rename(old, live) // restore; best-effort — staged copy remains
      throw new java.io.IOException(s"compact: rename $tmp -> $path failed")
    }
    fs.delete(old, true)
    fs.delete(new HPath(s"$path/tombstones"), true) // LAST: now redundant
    true
  }

  /** Cluster rewrite: exact re-clustering via the sibling pair list when
    * the `lshpairs:`/`lshclusters:` convention finds one (the pair entry
    * is rewritten by the same walk, and [[Dedup.tombstoneDelete]] filters
    * tombstones from whatever pair frame it gets, so walk order doesn't
    * matter); min-relabel fallback otherwise (see object doc). */
  private def forgetClusters(spark: SparkSession, key: String,
      clusters: DataFrame, del: DataFrame, ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    val sibling = Option(key).filter(_.startsWith("lshclusters:"))
      .flatMap(k => IndexCache.peek(spark,
        "lshpairs:" + k.stripPrefix("lshclusters:")))
      .collect { case p: org.apache.spark.sql.Dataset[_]
        if p.columns.contains("doc_a") && p.columns.contains("doc_b") =>
          p.toDF() }
    sibling match {
      case Some(pairs) =>
        Dedup.tombstoneDelete(clusters.select("doc_id"), ids.toDF("doc_id"),
          "doc_id", pairs.select("doc_a", "doc_b"), clusters)
      case None =>
        // Relabel ONLY clusters that lost a member: the delete batch is
        // human-sized, so the touched-cluster list is a broadcast
        // semi-join result — untouched clusters keep their labels
        // bit-for-bit (a cached frame whose labels are not min-based must
        // not have unrelated labels rewritten by someone else's forget).
        val touched = broadcast(
          clusters.join(del, clusters("doc_id") === col("__del"), "left_semi")
            .select("cluster_id").distinct()
            .withColumn("__touched", lit(1)))
        clusters.join(del, clusters("doc_id") === col("__del"), "left_anti")
          .join(touched, Seq("cluster_id"), "left")
          .withColumn("cluster_id",
            when(col("__touched") === 1,
              min(col("doc_id")).over(org.apache.spark.sql.expressions.Window
                .partitionBy(col("cluster_id"))))
              .otherwise(col("cluster_id")))
          .drop("__touched")
          .select(clusters.columns.map(col).toSeq: _*) // original col order
    }
  }
}
