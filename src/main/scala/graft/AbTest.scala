package graft

import org.apache.spark.sql.SparkSession

/** In-JVM A/B config comparator (r13 optimization round): on a noisy
  * shared box, cross-JVM timing comparisons drift by 2×; alternating the
  * two configurations per iteration INSIDE one session and taking the min
  * per arm cancels the drift. Runtime-settable SQL confs only.
  *
  * Usage: runMain graft.AbTest <tableDir> <confKey=valA|valB> <query>...
  * Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_AB_ITERS (default 3 per arm).
  */
object AbTest {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: AbTest <dir> <key=valA|valB> <query>...")
    val dir = args(0)
    val Array(key, vals) = args(1).split("=", 2)
    val Array(valA, valB) = vals.split("\\|", 2)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val iters = sys.env.getOrElse("SPARK_GRAFT_AB_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.execution.topKSortFallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val elapsed = (System.nanoTime() - t0) / 1e9
      Housekeeping.releaseAllBlocks(spark)
      elapsed
    }

    names.foreach { name =>
      val (as, bs) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
      // "prop:<name>" keys flip a JVM system property instead of a SQL
      // conf — the lever for A/B-ing code-path switches (e.g.
      // graft.fanout) inside one session
      def set(v: String): Unit =
        if (key.startsWith("prop:")) System.setProperty(key.stripPrefix("prop:"), v)
        else spark.conf.set(key, v)
      // warm up IN arm-A state (r13 ADVICE: warming in session-default /
      // previous query's arm-B state biased arm A's first iteration)
      set(valA); run(name)
      (1 to iters).foreach { _ =>
        set(valA); as += run(name)
        set(valB); bs += run(name)
      }
      val (a, b) = (as.result(), bs.result())
      println(f"AB $name%-28s $key A=$valA%-8s min=${a.min}%7.2f all=${a.map(x => f"$x%.2f").mkString(",")}  B=$valB%-8s min=${b.min}%7.2f all=${b.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
