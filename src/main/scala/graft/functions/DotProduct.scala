package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two `array<float>` columns,
  * accumulated in double precision in index order — the `dot` term of
  * [[CosineSimilarity]] with the norm accumulators removed.
  *
  * Exists for the pre-normalized cosine verify (guide §1.2 "per-task work"):
  * a banded near-dup verify evaluates cosine once per CANDIDATE PAIR, and
  * the norms in that loop are pair-invariant — each vector's norm is a
  * function of the vector alone, recomputed for every partner it meets. A
  * per-vector reciprocal norm computed once before the band explode turns
  * the per-pair loop into this dot product plus two multiplies, dropping the
  * inner-loop FMAs from 3 to 1 and the per-pair sqrt/div entirely. The dot
  * accumulation order is IDENTICAL to CosineSimilarity's, so the only
  * numeric difference in `dot * rinvA * rinvB` vs `dot / (normA * normB)`
  * is the final rounding step (≤ 2 ulps — equality on the fixture data is
  * asserted empirically before any registered query adopts it).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // Same analysis-time contract as CosineSimilarity: array<float> only —
  // getFloat on a double-backed array silently returns garbage.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isFloatArray(t: DataType): Boolean = t match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<float> arguments (cast with CAST(x AS ARRAY<FLOAT>)), " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
