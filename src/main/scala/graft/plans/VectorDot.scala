package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` columns.
  *
  * Semantically identical to the composable form
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`
  * (Similarity.dot) — same element order, same double accumulation — but
  * executes as one tight primitive loop in generated code instead of
  * per-element lambda dispatch with a boxed accumulator row. On the ANN
  * hot path (|Q|·|C| dot products of 64-float vectors) the HOF form's
  * allocation-per-element dominates; this is the classic case where a
  * custom `Expression` with `doGenCode` beats both a UDF and the built-in
  * higher-order functions.
  *
  * Null handling mirrors the HOF form on EVERY input, so the session-wide
  * RewriteDotProduct rule is semantics-preserving, not just on complete
  * equal-length vectors: unequal lengths → null (zip_with pads the shorter
  * side with null, the null product poisons the sum), and a null element
  * on either side → null (same poisoning).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  // length-mismatch and null-element inputs produce null even when both
  // child columns are non-nullable
  override def nullable: Boolean = true

  // ExpectsInputTypes/AbstractDataType are private[sql]; validate the
  // array<float> shape directly so `vector_dot(array<double>, ...)` fails
  // analysis with a clear message instead of misreading 8-byte elements
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> arguments, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}
