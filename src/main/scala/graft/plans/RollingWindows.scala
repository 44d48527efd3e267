package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling polynomial fingerprints of every overlapping
  * k-element window of the input — `graft_rolling_windows(x, k, base, mod)`
  * returns `array<bigint>` with element p = fingerprint of the window
  * starting at position p (0-based): Σᵢ v(p+i)·base^(k−1−i) mod `mod`,
  * where v is the unsigned byte value for a STRING input (the corpus is
  * ASCII, so SQL `ascii(substring(...))` replays it) or the element value
  * for an `array<bigint>` input (e.g. a per-word md5-hash stream).
  *
  * This is the O(n) production form of the per-window hash the md5-window
  * operators (m5's payload phash, x18/x19's span fingerprints) pay
  * O(n·k·bytes-per-window) for: one md5 (or none) per ELEMENT, then each
  * successive window is one subtract-lead/multiply/add update — identical
  * residues to an independent per-window Horner fold, which is exactly how
  * the DuckDB oracles replay it (modular congruence makes the rolling and
  * direct forms agree bit-for-bit).
  *
  * `mod` must be < 2³¹ so every intermediate — (fp + m), (v mod m)·lead,
  * fp·base — stays far inside the signed-64 range in BOTH engines (DuckDB
  * errors on BIGINT overflow; non-ANSI Spark would wrap silently). With a
  * ~2³¹ modulus a fingerprint carries 31 effective bits: consumers that
  * pack two halves (simhash64) get 62 effective signature bits — bits 31
  * and 63 are constant, which still leaves every 16-bit band ≥ 15
  * effective bits. Empty/short inputs yield an EMPTY array (no windows),
  * null input yields null, and a null ARRAY ELEMENT contributes 0 (the
  * md5-hash streams this consumes are never-null by construction).
  * NEGATIVE array elements are normalized into [0, mod) — Java's % would
  * otherwise leak a negative residue into the subtract-lead slide — so
  * the rolling form stays congruent with an independent mathematical-mod
  * per-window Horner fold for arbitrary bigint inputs (all current
  * callers feed non-negative md5/byte streams, where % and mod agree).
  *
  * k, base, mod arrive as literals: they size nothing dynamically but are
  * plan-shape constants the oracle rendering must agree on. */
case class RollingWindows(child: Expression, k: Int, base: Long, mod: Long)
    extends UnaryExpression {

  require(k >= 1, s"graft_rolling_windows: window size must be >= 1, got $k")
  // base = 1 is the degenerate-but-useful lattice: window fingerprints
  // collapse to rolling window SUMS (mod m) — one pass for "sum of
  // element values per k-window" (e.g. window character lengths)
  require(base >= 1 && mod > 1 && mod <= Int.MaxValue.toLong,
    s"graft_rolling_windows: need base >= 1 and 1 < mod < 2^31, got ($base, $mod)")
  require(base < mod, s"graft_rolling_windows: base ($base) must be < mod ($mod)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_windows"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | ArrayType(LongType, _) | ArrayType(IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or array<bigint> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => RollingWindows.overBytes(s, k, base, mod)
    case a: ArrayData => RollingWindows.overLongs(a, k, base, mod,
      child.dataType.asInstanceOf[ArrayType].elementType == IntegerType)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val call = child.dataType match {
      case StringType =>
        (c: String) => s"graft.plans.RollingWindows.overBytes($c, $k, ${base}L, ${mod}L)"
      case ArrayType(et, _) =>
        val isInt = et == IntegerType
        (c: String) => s"graft.plans.RollingWindows.overLongs($c, $k, ${base}L, ${mod}L, $isInt)"
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingWindows =
    copy(child = newChild)
}

object RollingWindows {

  /** Extractor for an integral literal as Long — base/mod may be written
    * as INT or BIGINT literals in SQL. */
  object LongLit {
    def unapply(e: Expression): Option[Long] = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) =>
        Some(v.toLong)
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, LongType) =>
        Some(v)
      case _ => None
    }
  }

  /** Fingerprints over the string's bytes (unsigned). One tight loop:
    * Horner for window 0, then one O(1) update per slide. */
  def overBytes(s: UTF8String, k: Int, base: Long, mod: Long): ArrayData = {
    val bytes = s.getBytes
    roll(bytes.length, i => (bytes(i) & 0xFF).toLong, k, base, mod)
  }

  /** Fingerprints over a long (or int) array's elements. */
  def overLongs(a: ArrayData, k: Int, base: Long, mod: Long,
                intElements: Boolean): ArrayData = {
    val n = a.numElements()
    def at(i: Int): Long =
      if (a.isNullAt(i)) 0L
      else if (intElements) a.getInt(i).toLong
      else a.getLong(i)
    roll(n, at, k, base, mod)
  }

  private def roll(n: Int, v: Int => Long, k: Int, base: Long,
                   mod: Long): ArrayData = {
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // Java % of a negative element would yield a negative residue and
    // break the fp ∈ [0, mod) invariant the subtract-lead slide (and the
    // oracle's independent Horner folds) assume — normalize every element
    // into [0, mod) so arbitrary bigint inputs are congruence-safe
    def vm(i: Int): Long = { val r = v(i) % mod; if (r < 0) r + mod else r }
    val out = new Array[Long](n - k + 1)
    var fp = 0L
    var i = 0
    while (i < k) { fp = (fp * base + vm(i)) % mod; i += 1 }
    out(0) = fp
    var lead = 1L
    i = 1
    while (i < k) { lead = (lead * base) % mod; i += 1 }
    i = k
    while (i < n) {
      // every factor < mod < 2^31 keeps products < 2^62: no overflow in
      // either engine's 64-bit lane
      fp = ((fp - vm(i - k) * lead % mod + mod) % mod * base + vm(i)) % mod
      out(i - k + 1) = fp
      i += 1
    }
    new GenericArrayData(out)
  }
}
