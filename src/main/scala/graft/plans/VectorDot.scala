package graft.plans

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
  * Null handling: null array → null (nullSafeEval); null *elements* are
  * read as 0-bias garbage by primitive access, so inputs must be
  * element-complete (embeddings are by construction).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // both children must be array<float>; enforced by the builders (the
  // registered function and RewriteDotProduct both check the shape —
  // ExpectsInputTypes/AbstractDataType are private[sql], so no coercion here)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
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
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}
