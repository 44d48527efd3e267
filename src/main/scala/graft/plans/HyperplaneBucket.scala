package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native signed-projection LSH bucket over an `array<float>` column —
  * bit j of the result is [dot(vec, plane_j) > 0] for `planes`
  * deterministic pseudo-random hyperplanes with integer weights
  * [[HyperplaneBucket.weight]].
  *
  * `planes` is the SCALE knob: per-bucket candidate population in every
  * bucketed-ANN path is corpus/2^planes, so a growing corpus raises the
  * plane count to hold bucket sizes constant (each added plane halves
  * expected occupancy). It arrives as a literal second argument of the
  * SQL function (`hyperplane_bucket(vec, 16)`) so the plan — and the
  * DuckDB oracle rendering — parameterize the same way; the default 8
  * keeps every existing bucket id bit-identical to the original
  * fixed-8-plane form.
  *
  * Semantically identical to the composable form Similarity built before
  * (one `aggregate(sequence(0, n-1), ...)` fold per plane): same element
  * order, same per-plane double accumulation, so results are bit-identical
  * and every DuckDB-oracle hash is preserved. The HOF form evaluates
  * `planes` separate folds — planes × dims lambda dispatches with boxed
  * accumulators per row, on every row of every bucketed-ANN path (y2/y2b,
  * x5/x15 pair generation, m4, y5's LSH-PQ blocking); this runs ONE tight
  * primitive loop accumulating all planes per element.
  *
  * Null semantics mirror the HOF form exactly: a null ELEMENT poisons
  * every plane's fold, every `when(dot > 0, …)` falls to its 0 branch, and
  * the bucket is 0 (not null); only a null ARRAY yields null.
  */
case class HyperplaneBucket(child: Expression,
                            planes: Int = HyperplaneBucket.NumPlanes)
    extends UnaryExpression {

  require(planes >= 1 && planes <= HyperplaneBucket.MaxPlanes,
    s"hyperplane_bucket supports 1..${HyperplaneBucket.MaxPlanes} planes, got $planes")

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
    val acc = new Array[Double](planes)
    var i = 0
    while (i < n) {
      // a null element nulls every plane's fold in the HOF form; every
      // when() then falls to 0, so the whole bucket is 0
      if (x.isNullAt(i)) return 0L
      val v = x.getFloat(i).toDouble
      var j = 0
      while (j < planes) {
        acc(j) += v * HyperplaneBucket.weight(i, j).toDouble
        j += 1
      }
      i += 1
    }
    var b = 0L
    var j = 0
    while (j < planes) {
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
      val a = (0 until planes).map(j => ctx.freshName(s"acc$j"))
      val decls = a.map(n => s"double $n = 0.0;").mkString("\n")
      val adds = a.zipWithIndex.map { case (acc, j) =>
        s"$acc += $v * (double) (${HyperplaneBucket.weightJava(i, j)});"
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
  /** Default number of LSH hyperplanes (bucket signature bits) — the
    * single source shared with the composable form and the DuckDB oracle
    * rendering. */
  val NumPlanes = 8

  /** Hard ceiling on the plane count: the base lattice (mod 13) yields 13
    * distinct planes and the extension lattice (mod 17) another 17 — past
    * 13 + 17 a plane would duplicate an earlier one and its bit would
    * carry no information (the exact silent-halving bug the mod-7 form
    * had). Well under the 63-bit packing limit. */
  val MaxPlanes = 30

  /** Deterministic pseudo-random hyperplane weight: plane j, dimension i.
    * Planes 0-12 use the ORIGINAL lattice ((i·31 + j·19) % 13 − 6) —
    * multiplier 19 is invertible mod 13, so those planes are pairwise
    * distinct, and keeping them byte-identical preserves every existing
    * bucket id and oracle hash. Planes 13+ extend with a coprime lattice
    * ((i·29 + j·23) % 17 − 8): 23 is invertible mod 17, so the extension
    * planes are pairwise distinct too, and the different modulus/range
    * keeps them off the base lattice (spec-checked: all 30 planes
    * distinct on 64 dims). The mod-13 lattice could not extend past 13
    * planes — plane 13 would equal plane 0 (j·19 mod 13 cycles), exactly
    * the duplicate-plane bug the % 7 form had. */
  def weight(i: Int, j: Int): Int =
    if (j < 13) ((i * 31 + j * 19) % 13) - 6
    else ((i * 29 + j * 23) % 17) - 8

  /** Java/SQL source rendering of [[weight]] over a loop variable — the
    * single formula the codegen, the HOF form, and the DuckDB oracles all
    * print (they must never drift). */
  def weightJava(iVar: String, j: Int): String =
    if (j < 13) s"($iVar * 31 + ${j * 19}) % 13 - 6"
    else s"($iVar * 29 + ${j * 23}) % 17 - 8"
}
