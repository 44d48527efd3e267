package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-query probe for a serialized Count-Min sketch — the read side of
  * Spark's built-in `count_min_sketch` aggregate, which ships the sketch
  * builder but no SQL-reachable way to ask it anything. `graft_cms_estimate
  * (sketch, item)` deserializes the aggregate's binary output and returns
  * `estimateCount(item)`: an upper bound on the item's true frequency
  * (CMS never under-counts) that exceeds it by more than eps·N only with
  * probability 1−confidence.
  *
  * Items hash exactly as the aggregate inserted them: strings probe as
  * their UTF-8 bytes (`CountMinSketchAgg` adds `UTF8String.getBytes` via
  * `addBinary`), integral types widen to long. Deserialization is cached
  * per thread keyed on the sketch bytes, so the intended shape — one
  * aggregated sketch row cross-joined to a bounded probe list — pays one
  * decode per task, not per row. Not codegen'd: the probe side is
  * contract/report-sized by design (the corpus-sized pass is the
  * aggregate, which is Spark's own partial-merge implementation).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType | LongType | IntegerType | ShortType | ByteType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, string-or-integral item), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val sketch = CmsEstimate.sketchFor(sketchBytes.asInstanceOf[Array[Byte]])
    item match {
      case s: UTF8String => sketch.estimateCount(s.getBytes)
      case l: java.lang.Long => sketch.estimateCount(l)
      case i: java.lang.Integer => sketch.estimateCount(java.lang.Long.valueOf(i.longValue()))
      case sh: java.lang.Short => sketch.estimateCount(java.lang.Long.valueOf(sh.longValue()))
      case b: java.lang.Byte => sketch.estimateCount(java.lang.Long.valueOf(b.longValue()))
      case other => throw new IllegalArgumentException(
        s"$prettyName cannot probe item of class ${other.getClass.getName}")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  /** Per-thread one-entry decode cache: (sketch bytes → deserialized
    * sketch). Physical-plan expression trees can be shared across local
    * tasks, so the cache must not be instance state on the expression. */
  private val cache =
    new ThreadLocal[(Array[Byte], CountMinSketch)]

  private def sketchFor(bytes: Array[Byte]): CountMinSketch = {
    val hit = cache.get()
    // Reference-equality first: when the sketch rides the plan as a binary
    // LITERAL (the intended transport for multi-MB sketches — see
    // x51/x54's collect-once-inline pattern), every row hands the SAME
    // stable array and the probe is O(1). The content compare only runs
    // for row-carried sketches (e.g. a per-group sketch column), where
    // each access may materialize a fresh copy out of the UnsafeRow —
    // that full memcmp per row is exactly why multi-MB sketches must NOT
    // be attached to a relation via crossJoin(broadcast(...)).
    if (hit != null && ((hit._1 eq bytes) || java.util.Arrays.equals(hit._1, bytes))) hit._2
    else {
      val sk = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      cache.set((bytes, sk))
      sk
    }
  }
}
