package graft

import org.apache.spark.sql.SparkSession

/** Scale-soak harness: times a named subset of the declared queries against
  * an arbitrary table directory (e.g. the 10× generated corpus under
  * `target/soak10`) through the noop sink — the measurement behind
  * SCALE.md's "the dedup path scales ~linearly" claim, so the claim is a
  * number, not a design argument.
  *
  * Usage: `runMain graft.Soak <tableDir> <query> [query...]`
  * Prints one JSON line: {"sf":dir,"queries":{name:sec,...}}.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Soak <tableDir> <query> [query...]")
    val (dir, names) = (args.head, args.tail.toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.execution.topKSortFallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PAR", "1024"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "1m"))
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val elapsed = (System.nanoTime() - t0) / 1e9
      // sweep AFTER capturing elapsed: hygiene cost stays out of the number
      Housekeeping.releaseAllBlocks(spark)
      elapsed
    }

    run(names.head) // warmup: JVM + codegen init
    val results = names.map(n => n -> (1 to 2).map(_ => run(n)).min)
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"sf":"$dir","queries":$qs}""")
    spark.stop()
  }
}
