package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.SparkShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The first two 32-bit halves of md5(input), each as an unsigned value in
  * a long — ONE digest pass, no hex-string round-trip.
  *
  * Bit-for-bit identical to the declarative form the portable SimHash gate
  * query contracts with its oracle:
  * `CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT)` (hi) and
  * `CAST(conv(substr(md5(s), 9, 8), 16, 10) AS BIGINT)` (lo) — hex chars
  * 1–8 are digest bytes 0–3 big-endian, chars 9–16 are bytes 4–7, and conv
  * of 8 hex digits is their unsigned 32-bit value, which always fits a
  * BIGINT. The declarative chain pays, PER TOKEN: a 32-char hex encode,
  * two substring allocations, two radix parses and two string→long casts;
  * this expression pays one digest and two shifts (guide §4 — cut
  * expression-level allocation in the hot map stage).
  *
  * Kept imperative (CodegenFallback) like [[ShingleHashes]]: the digest
  * dominates, and the surrounding plan stays whole-stage codegen'd. */
case class Md5Halves(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_halves expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // MessageDigest instances are not thread-safe and not shareable across
    // rows without reset bookkeeping; getInstance("MD5") is a cheap clone
    // from a cached provider entry, far below the hex/parse cost it removes
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    def u32(off: Int): Long =
      ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
        ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
    InternalRow(u32(0), u32(4))
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Halves =
    copy(child = newChild)
}

object Md5Halves {
  /** Column wrapper: md5_halves(textCol) → struct(hi BIGINT, lo BIGINT). */
  def md5Halves(text: Column): Column =
    SparkShim.column(Md5Halves(SparkShim.expression(text)))
}
