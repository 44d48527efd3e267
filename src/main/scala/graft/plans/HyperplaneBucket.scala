package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native signed-projection LSH bucket over an `array<float>` column —
  * bit j of the result is [dot(vec, plane_j) > 0] for
  * [[HyperplaneBucket.NumPlanes]] deterministic pseudo-random hyperplanes
  * with integer weights w(i, j) = ((i·31 + j·19) % 13) − 6.
  *
  * Semantically identical to the composable form Similarity built before
  * (one `aggregate(sequence(0, n-1), ...)` fold per plane): same element
  * order, same per-plane double accumulation, so results are bit-identical
  * and every DuckDB-oracle hash is preserved. The HOF form evaluates
  * NumPlanes separate folds — 8 × dims lambda dispatches with boxed
  * accumulators per row, on every row of every bucketed-ANN path (y2/y2b,
  * x5/x15 pair generation, m4, y5's LSH-PQ blocking); this runs ONE tight
  * primitive loop accumulating all planes per element.
  *
  * Null semantics mirror the HOF form exactly: a null ELEMENT poisons
  * every plane's fold, every `when(dot > 0, …)` falls to its 0 branch, and
  * the bucket is 0 (not null); only a null ARRAY yields null.
  */
case class HyperplaneBucket(child: Expression) extends UnaryExpression {

  import HyperplaneBucket.NumPlanes

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> argument, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val acc = new Array[Double](NumPlanes)
    var i = 0
    while (i < n) {
      // a null element nulls every plane's fold in the HOF form; every
      // when() then falls to 0, so the whole bucket is 0
      if (x.isNullAt(i)) return 0L
      val v = x.getFloat(i).toDouble
      var j = 0
      while (j < NumPlanes) {
        acc(j) += v * ((i * 31 + j * 19) % 13 - 6).toDouble
        j += 1
      }
      i += 1
    }
    var b = 0L
    var j = 0
    while (j < NumPlanes) {
      if (acc(j) > 0) b |= 1L << j
      j += 1
    }
    b
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val b = ctx.freshName("b")
      val nul = ctx.freshName("anyNull")
      val a = (0 until NumPlanes).map(j => ctx.freshName(s"acc$j"))
      val decls = a.map(n => s"double $n = 0.0;").mkString("\n")
      val adds = a.zipWithIndex.map { case (acc, j) =>
        s"$acc += $v * (double) (($i * 31 + $j * 19) % 13 - 6);"
      }.mkString("\n")
      val bits = a.zipWithIndex.map { case (acc, j) =>
        s"if ($acc > 0) $b |= ${1L << j}L;"
      }.mkString("\n")
      s"""
         |final int $n = $x.numElements();
         |$decls
         |boolean $nul = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { $nul = true; break; }
         |  final double $v = (double) $x.getFloat($i);
         |  $adds
         |}
         |long $b = 0L;
         |if (!$nul) {
         |  $bits
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Number of LSH hyperplanes (bucket signature bits) — the single source
    * shared with the composable form and the DuckDB oracle rendering. */
  val NumPlanes = 8
}
