package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.SparkShim
import org.apache.spark.sql.types._

/** Hyperplane-LSH sign-signature bucket id as ONE native expression: bit j
  * of the result is the sign of the sequential-fold dot of the input vector
  * with plane j.
  *
  * Semantically identical to the declarative spelling
  * `sum_j(when(dot(v, array(lit...)) >= 0, 1L << j))` — same fold order per
  * plane (bit-identical to [[DotProduct]] and to the SQL oracles), same
  * `>= 0` sign rule, planes folded over min(|v|, |plane|) — but that
  * spelling materializes bits × dim literal NODES in the plan (a 12-bit ×
  * 64-dim table is 768 literals per table; the multi-table production
  * sizing multiplies by T), which blows generated methods past the JIT
  * limits and drops the whole map side into interpreted evaluation — the
  * ScaleSweep measured the bucketing pass ~10× slower per flop than the
  * codegen'd brute-force scan. Here the plane matrix rides as ONE
  * reference object (O(1) plan nodes at ANY bits × tables) and the
  * generated code is two primitive loops. */
case class LshBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket expects array<double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var bucket = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val n = math.min(v.numElements(), p.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getDouble(i) * p(i); i += 1 }
      if (acc >= 0.0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mat = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      s"""
         |long $bucket = 0L;
         |for (int $j = 0; $j < $mat.length; $j++) {
         |  double[] __p = $mat[$j];
         |  int $n = java.lang.Math.min($v.numElements(), __p.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $v.getDouble($i) * __p[$i];
         |  }
         |  if ($acc >= 0.0) $bucket |= 1L << $j;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  // The case-class equals on an Array arg is reference equality, which
  // makes two semantically identical buckets never compare equal and
  // defeats Catalyst semanticEquals / common-subexpression elimination —
  // compare the plane CONTENTS instead (the matrix is driver-built and
  // immutable, so content equality is safe to cache in a hash).
  override def equals(other: Any): Boolean = other match {
    case that: LshBucket => child == that.child &&
      java.util.Arrays.deepEquals(planes.asInstanceOf[Array[AnyRef]],
        that.planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    SparkShim.column(LshBucket(SparkShim.expression(v), planes))
}
