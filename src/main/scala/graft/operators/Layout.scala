package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: space-filling-curve clustering for
  * multi-dimensional data skipping.
  *
  * At warehouse scale a table is pruned by parquet/ORC row-group min-max
  * stats (and partition values), which only help along the sort order —
  * sorting by `a` leaves predicates on `b` scanning every file. Z-order
  * (Morton) interleaving gives ONE sort key whose ranges stay tight on
  * EVERY participating dimension, so a `repartitionByRange(zval) +
  * sortWithinPartitions(zval)` write serves selective predicates on any
  * of the clustered columns from a small fraction of files (the
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * Everything here is integer algebra on BIGINT (shift/mask/or) — pure
  * codegen'd expressions, engine-exact, so the assignment is DuckDB-
  * oracle-able bit for bit. */
object Layout {

  /** Spread the low 8 bits of `c` so bit i lands at position 2i (the
    * standard mask-ladder Morton spread, 3 shift+mask rounds for 8-bit
    * inputs). Input must already be in [0, 256). */
  private def spread8(c: Column): Column = {
    val m0 = lit(3855L)  // 0x0F0F
    val m1 = lit(13107L) // 0x3333
    val m2 = lit(21845L) // 0x5555
    val s0 = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(m0)
    val s1 = s0.bitwiseOR(shiftleft(s0, 2)).bitwiseAND(m1)
    s1.bitwiseOR(shiftleft(s1, 1)).bitwiseAND(m2)
  }

  /** 16-bit Morton code of two 8-bit cell coordinates: `a`'s bits land
    * at odd positions (the high bit of each pair), `b`'s at even. */
  def morton2(a: Column, b: Column): Column =
    shiftleft(spread8(a), 1).bitwiseOR(spread8(b))

  /** Min-max quantization of a BIGINT column to [0, 2^bits):
    * `floor((v - min) * 2^bits / (max - min + 1))`. `int / int` is true
    * division → DOUBLE in both Spark and DuckDB; the floor is engine-
    * exact because the numerator stays far below 2^53 and an inexact
    * integer quotient of two ints differs from the nearest integer by
    * ≥ 1/denominator — orders of magnitude beyond the division's
    * half-ulp rounding, so the floor can never straddle. `minC`/`maxC`
    * are the column's corpus min/max (attach them with a one-row
    * broadcast, the scalar-attach pattern). */
  def quantize(v: Column, minC: Column, maxC: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    floor((v - minC) * lit(1L << bits) / (maxC - minC + lit(1L))).cast("long")
  }

  /** Z-order layout assignment over two BIGINT columns: quantizes each to
    * 8 bits against its corpus min/max (one tiny stats aggregate,
    * scalar-attached) and appends the 16-bit Morton code as `out`.
    * Writing the frame `repartitionByRange` + `sortWithinPartitions` on
    * `out` clusters it for min-max skipping on BOTH columns; the code is
    * also a ready-made spatial bucket key (prefix = coarser cell). */
  def zorder2(df: DataFrame, colA: String, colB: String,
              out: String): DataFrame = {
    val reserved = Seq("__mina", "__maxa", "__minb", "__maxb")
    require(!df.columns.exists(c => reserved.contains(c.toLowerCase)),
      s"column names ${reserved.mkString("/")} are reserved")
    val stats = df.agg(
      min(col(colA).cast("long")).as("__mina"), max(col(colA).cast("long")).as("__maxa"),
      min(col(colB).cast("long")).as("__minb"), max(col(colB).cast("long")).as("__maxb"))
    df.crossJoin(broadcast(stats))
      .withColumn(out, morton2(
        quantize(col(colA).cast("long"), col("__mina"), col("__maxa"), 8),
        quantize(col(colB).cast("long"), col("__minb"), col("__maxb"), 8)))
      .drop(reserved: _*)
  }
}
