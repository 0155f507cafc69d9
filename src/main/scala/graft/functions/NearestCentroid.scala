package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.SparkShim
import org.apache.spark.sql.types._

/** argmax_j (v · c_j − ‖c_j‖²/2) — k-means / coarse-quantizer assignment as
  * ONE native expression.
  *
  * Semantically identical to the declarative spelling
  * `array_max(array(struct(dot(v, array(lit…)) − bias, j)…)).getField("j")`:
  * the same sequential-fold dot per centroid (bit-identical to
  * [[DotProduct]] and the SQL oracles), the same driver-computed bias
  * ‖c‖²/2, and the same tie rule (equal scores → max j, the struct-max
  * order). But that spelling carries k × dim literal NODES in the plan —
  * the PQ encode stage (m subspaces × ksub centroids) overflowed janino's
  * 64 KB method limit and silently dropped whole stages to interpreted
  * evaluation (the OpsSpec "Code grows beyond 64 KB" fallbacks), and the
  * √n production nlist needed a broadcast-join + re-collapse workaround
  * (one shuffle per assignment). Here the centroid matrix rides as ONE
  * reference object: O(1) plan nodes and a map-only two-loop kernel at ANY
  * k — the join path's shuffle is gone.
  *
  * Only divergence from the declarative form: a NaN score would win
  * `array_max` (Spark orders NaN greatest) but loses the `>=` loop here —
  * unreachable for finite vectors and centroids.
  *
  * Returns −1 for an EMPTY centroid table (caller guards; the declarative
  * array_max would return null). */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<double>, got $other")
  }

  // ‖c_j‖²/2, computed once on the driver exactly like the declarative
  // spelling's `c.map(x => x * x).sum / 2.0` literal (same fold order)
  @transient private lazy val biases: Array[Double] =
    cents.map(c => c.map(x => x * x).sum / 2.0)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = Double.NegativeInfinity
    var bj = -1
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getDouble(i) * c(i); i += 1 }
      val score = acc - biases(j)
      if (score >= best) { best = score; bj = j }
      j += 1
    }
    bj
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mat = ctx.addReferenceObj("ncCents", cents, "double[][]")
      val bias = ctx.addReferenceObj("ncBiases", biases, "double[]")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bj = ctx.freshName("bj")
      val score = ctx.freshName("score")
      s"""
         |double $best = Double.NEGATIVE_INFINITY;
         |int $bj = -1;
         |for (int $j = 0; $j < $mat.length; $j++) {
         |  double[] __c = $mat[$j];
         |  int $n = java.lang.Math.min($v.numElements(), __c.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $v.getDouble($i) * __c[$i];
         |  }
         |  double $score = $acc - $bias[$j];
         |  if ($score >= $best) { $best = $score; $bj = $j; }
         |}
         |${ev.value} = $bj;
       """.stripMargin
    })

  // The case-class equals on an Array arg is reference equality, which
  // makes two semantically identical assignments never compare equal and
  // defeats Catalyst semanticEquals / common-subexpression elimination —
  // compare the centroid CONTENTS instead (driver-built, immutable).
  override def equals(other: Any): Boolean = other match {
    case that: NearestCentroid => child == that.child &&
      java.util.Arrays.deepEquals(cents.asInstanceOf[Array[AnyRef]],
        that.cents.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCentroid = copy(child = newChild)
}

object NearestCentroid {
  def nearestCentroid(v: Column, cents: Array[Array[Double]]): Column =
    SparkShim.column(NearestCentroid(SparkShim.expression(v), cents))
}
