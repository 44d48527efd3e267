package graft

import graft.operators.Layout
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("morton2 matches the bit-by-bit reference interleave") {
    val df = spark.range(65536)
      .select((col("id") % 256).as("a"), (col("id") / 256).cast("long").as("b"))
    def ref(a: Long, b: Long): Long =
      (0 until 8).map(i => (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i)))
        .reduce(_ | _)
    val rows = df.select(col("a"), col("b"),
      Layout.morton2(col("a"), col("b")).as("z")).as[(Long, Long, Long)].collect()
    assert(rows.length === 65536)
    rows.foreach { case (a, b, z) => assert(z === ref(a, b), s"a=$a b=$b") }
    // the curve is a bijection on the 16-bit square
    assert(rows.map(_._3).distinct.length === 65536)
  }

  test("z-ordered layout prunes range partitions on EITHER dimension; 1-d sort only on its own") {
    // independent dimensions (a hash scramble decorrelates b from a) —
    // the case where a one-column sort gives the other column nothing
    val df = spark.range(100000).select(
      col("id"),
      pmod(xxhash64(col("id"), lit(1)), lit(256L)).as("a"),
      pmod(xxhash64(col("id"), lit(2)), lit(256L)).as("b"))
    val z = Layout.zorder2(df, "a", "b", "zval")
    // pin each layout: repartitionByRange samples fresh bounds per
    // execution, and the touched-partition counts must observe ONE layout
    val zLayout = Housekeeping.pin(spark)(
      z.repartitionByRange(16, col("zval"))
        .withColumn("p", spark_partition_id()))
    val aLayout = Housekeeping.pin(spark)(
      df.repartitionByRange(16, col("a"))
        .withColumn("p", spark_partition_id()))
    try {
      def touched(frame: org.apache.spark.sql.DataFrame, pred: Column): Long =
        frame.filter(pred).select("p").distinct().count()
      // 1/16-selective predicate per dimension: 16 aligned 64x64 z-tiles
      // → a one-dimension band intersects ~4; range bounds are sampled,
      // not tile-aligned, so allow up to half the partitions
      val zA = touched(zLayout.df, col("a") < 16)
      val zB = touched(zLayout.df, col("b") < 16)
      assert(zA <= 8, s"z-layout touched $zA/16 partitions for the a-predicate")
      assert(zB <= 8, s"z-layout touched $zB/16 partitions for the b-predicate")
      // the one-column sort serves its own column but scans everything
      // for the other — exactly what z-order exists to fix
      val aOwn = touched(aLayout.df, col("a") < 16)
      val aOther = touched(aLayout.df, col("b") < 16)
      assert(aOwn <= 2, s"a-sort touched $aOwn/16 partitions for its own column")
      assert(aOther >= 12, s"independent b should hit nearly all a-sorted partitions, got $aOther")
      assert(zB < aOther, "z-order must beat the 1-d sort on the non-sorted dimension")
    } finally {
      zLayout.free(); aLayout.free()
      Housekeeping.releaseAllBlocks(spark)
    }
  }

  test("writeZOrdered files carry tight min-max footers on BOTH dimensions") {
    val df = spark.range(40000).select(
      col("id"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000L)).as("a"),
      pmod(xxhash64(col("id"), lit(2)), lit(1000L)).as("b"))
    val zDir = tmpDir("zorder_tbl"); val sDir = tmpDir("asort_tbl")
    graft.sources.Store.writeZOrdered(df, zDir, "a", "b", files = 16)
    graft.sources.Store.writeSorted(df, sDir, "a", files = 16)
    // per-file (min,max) width read back through the data (equivalent to
    // the footer stats a scan-level skip would use)
    def widths(dir: String, c: String): Seq[Long] =
      spark.read.parquet(dir)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("w"))
        .select("w").as[Long].collect().toSeq
    // z-order: most files span a fraction of both 1000-value ranges
    // (16 aligned z-tiles would give 250). Sampled bounds aren't
    // tile-aligned, so a file straddling a high curve bit legitimately
    // wraps one dimension — a FEW wide files are inherent to z-order;
    // what matters for skipping is that nearly all files stay tight on
    // BOTH dimensions.
    assert(widths(zDir, "a").count(_ >= 900) <= 3, s"a widths ${widths(zDir, "a")}")
    assert(widths(zDir, "b").count(_ >= 900) <= 3, s"b widths ${widths(zDir, "b")}")
    assert(widths(zDir, "a").count(_ <= 600) >= 12, s"a widths ${widths(zDir, "a")}")
    assert(widths(zDir, "b").count(_ <= 600) >= 12, s"b widths ${widths(zDir, "b")}")
    // the 1-d sort is tight on its own column and useless on the other
    assert(widths(sDir, "a").forall(_ <= 200))
    assert(widths(sDir, "b").count(_ >= 900) >= 12,
      "independent b should span nearly the full range in most a-sorted files")
  }

  test("zorder2 rejects reserved stat column names and degenerate input survives") {
    val flat = spark.range(10).select(lit(5L).as("a"), col("id").as("b"))
    // constant dimension quantizes to cell 0 — no division blowup
    val z = Layout.zorder2(flat, "a", "b", "zval").select("zval").as[Long].collect()
    assert(z.length === 10 && z.forall(v => v >= 0 && v < 65536))
    val clash = spark.range(3).select(col("id").as("__mina"), col("id").as("b"))
    intercept[IllegalArgumentException] {
      Layout.zorder2(clash, "__mina", "b", "zval")
    }
  }
}
