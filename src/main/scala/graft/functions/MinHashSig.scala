package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.SparkShim
import org.apache.spark.sql.types._

/** MinHash signature over a hashed-shingle array — native Catalyst
  * expression using ONE-PERMUTATION HASHING (Li, Owen, Zhang 2012): a single
  * rehash per shingle, bucketed into `numHashes` slots by its top bits, min
  * per slot, empty slots densified by circular rotation. One pass, one hash
  * per element (the naive H-permutations form costs H hashes per element),
  * zero intermediate allocations. Identical inputs ⇒ identical signatures;
  * per-slot collision probability approximates the Jaccard similarity
  * exactly like classic MinHash.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  // >= 2: numHashes == 1 would make slotShift 64, and Java long shifts are
  // mod 64, so (h >>> 64) == h and the slot index overflows the array.
  require(numHashes >= 2 && (numHashes & (numHashes - 1)) == 0,
    "numHashes must be a power of two >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got $other")
  }

  private val slotShift = 64 - Integer.numberOfTrailingZeros(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = XXH64.hashLong(arr.getLong(i), 42L)
      val slot = (h >>> slotShift).toInt
      if (h < sig(slot)) sig(slot) = h
      i += 1
    }
    // rotation densification: an empty slot borrows the next filled slot's
    // value (circularly), re-salted by the distance so borrowed values stay
    // distinct across slots
    var j = 0
    while (j < numHashes) {
      if (sig(j) == Long.MaxValue) {
        var d = 1
        while (d < numHashes && sig((j + d) & (numHashes - 1)) == Long.MaxValue)
          d += 1
        if (d < numHashes)
          sig(j) = XXH64.hashLong(sig((j + d) & (numHashes - 1)), j.toLong)
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def minhashSig(hashedShingles: Column, numHashes: Int): Column =
    SparkShim.column(MinHashSig(SparkShim.expression(hashedShingles), numHashes))
}
