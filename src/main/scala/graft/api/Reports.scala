package graft.api

import scala.collection.immutable.ListMap

import org.apache.spark.sql.DataFrame

import graft.CubeCatalog
import graft.model.GraftException
import graft.ops.{Analytics, DataChecks}
import graft.result.Formatters.Tidy

/** Named warehouse reports served over REST (`GET /reports[/:name[.ext]]`).
  *
  * The reference exposes only cube aggregation; these are the
  * analytics-on-the-side a deployment runs against the same registered
  * tables (data-quality gate before a training run, customer segmentation,
  * co-purchase lift). Each report is a fixed, parameter-free query over
  * catalog tables — the library call is the source of truth
  * ([[graft.ops.DataChecks]], [[graft.ops.Analytics]]); this registry only
  * names them for dispatch, so REST users reach the same plans the q51–q53
  * gate queries verify. Results are report-sized (tens of rows) by
  * construction, so the collect into a [[Tidy]] is driver-safe.
  */
object Reports {

  /** name -> (description, builder). */
  val registry: ListMap[String, (String, CubeCatalog => DataFrame)] = ListMap(
    "dq_audit" -> ("Data-quality audit: FK orphans, key uniqueness, domain " +
      "and cross-table date checks (check_name, n_violations)",
      c => DataChecks.dqAudit(c.table("orders"), c.table("lineitem"),
        c.table("customer"))),
    "rfm_segments" -> ("RFM customer segmentation: recency/frequency/" +
      "monetary terciles rolled up by segment code",
      c => Analytics.rfmSegments(c.table("orders"))),
    "copurchase_lift" -> ("Market-basket brand pairs by lift " +
      "(top-20, >= 5 co-orders)",
      c => Analytics.copurchaseLift(c.table("lineitem"), c.table("part"))),
    "corpus_health" -> ("Per-source corpus health: repetitive-doc " +
      "fraction (Gopher filters), mean repetition coverage, mean " +
      "Moore-Lewis ce_diff vs the src0 seed domain",
      c => graft.ops.TextOps.corpusHealth(c.table("documents"))),
    "top_paths" -> ("Top-20 whole-session event-type journeys " +
      "(30-minute sessions, first 8 steps)",
      c => graft.ops.EventOps.topPaths(c.table("events"), 30, 8, 20)),
    "probe_fit" -> ("Per-source fit of the trained linear quality probe: " +
      "document count, mean predicted quality, residual MSE vs the " +
      "rule-based score",
      c => graft.ops.TextOps.probeScore(c.table("documents"), 3, 0.5)))

  def list: Seq[ListMap[String, String]] =
    registry.toSeq.map { case (name, (desc, _)) =>
      ListMap("name" -> name, "description" -> desc)
    }

  def run(cat: CubeCatalog, name: String): Tidy = {
    val (_, build) = registry.getOrElse(name,
      GraftException.notFound(s"report not found: $name"))
    val df = build(cat)
    Tidy(df.columns.toSeq, df.collect().toSeq.map(_.toSeq))
  }
}
