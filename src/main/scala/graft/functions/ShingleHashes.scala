package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.SparkShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct xxhash64-hashed k-word shingles of a text column, in ONE
  * imperative pass over the UTF-8 bytes.
  *
  * Semantically identical to the declarative form
  * `array_distinct(transform(sequence(...), i -> xxhash64(concat_ws(' ',
  * slice(split(text, ' '), i, k)))))` (same hash of the same shingle
  * strings, seed 42 like Spark's xxhash64 SQL function): tokens split on a
  * single space and re-joined with a single space reproduce the original
  * byte span, so each shingle is hashed directly as a slice of the input —
  * no token arrays, no string concatenation, no per-shingle lambda
  * invocation. The declarative chain is interpreted (higher-order functions
  * don't codegen) and dominated MinHash/Jaccard dedup runtime.
  *
  * Output order is sorted-unique (callers treat the result as a set:
  * signatures, intersection sizes, posting lists). Texts with fewer than k
  * tokens yield an empty array.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    // token boundaries: starts[j] .. ends[j) delimited by single spaces
    // (0x20 never appears inside a multi-byte UTF-8 sequence)
    var nTok = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    if (nTok < k) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = len
    val n = nTok - k + 1
    val hashes = new Array[Long](n)
    var s = 0
    while (s < n) {
      val from = starts(s)
      val until = ends(s + k - 1)
      hashes(s) = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + from, until - from, 42L)
      s += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place dedup of the sorted hashes
    var out = 0
    var j = 0
    while (j < n) {
      if (j == 0 || hashes(j) != hashes(j - 1)) { hashes(out) = hashes(j); out += 1 }
      j += 1
    }
    new GenericArrayData(
      if (out == n) hashes else java.util.Arrays.copyOf(hashes, out))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def shingleHashes(text: Column, k: Int): Column =
    SparkShim.column(ShingleHashes(SparkShim.expression(text), k))
}
