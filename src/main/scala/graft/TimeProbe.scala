package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for the versioned-store lifecycles. */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, d)
    (1 to 2).foreach { round =>
      println(s"---- round $round")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_probe/t$round"
      val store = graft.sources.Store(spark, path, "source")
      store.destroy()
      t("append v1")(store.appendVersioned(docs.filter(col("doc_id") % 3 === 1)))
      t("append v2")(store.appendVersioned(docs.filter(col("doc_id") % 3 === 2)))
      t("append v3")(store.appendVersioned(docs.filter(col("doc_id") % 3 === 0)))
      t("read.count")(store.read.count())
      t("dir read.count")(spark.read.parquet(path).count())
      t("resolve only")(store.read)
      t("probe isEmpty")(store.read.filter(col("doc_id") % 7 === 0).isEmpty)
      t("readVersion(2).count")(store.readVersion(2).count())
      t("readChanges(1,2).count")(store.readChanges(1, 2).count())
      t("purge")(store.purgeRestartLineage(col("doc_id") % 7 === 0))
      t("post read.count")(store.read.count())
      store.destroy()
    }
    spark.stop()
  }
}
