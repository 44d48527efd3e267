package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local defaults tuned for the test harness (local[N], one JVM); on a real
  * cluster callers pass their own master/conf and only the SQL-level settings
  * below matter. AQE stays on so skewed shuffles re-plan at runtime, and
  * shuffle partitions match local cores instead of the 200 default.
  */
object GraftSession {
  def local(cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // keep orderBy+limit compiling to TakeOrderedAndProject (per-partition
      // heap + driver merge of k rows) up to production top-k sizes: above
      // this threshold Spark falls back to a full sort + single-partition
      // GlobalLimit, which is exactly the plan the engine's top-k rungs
      // (vocab pruning at 32k, TakeOrdered search) are designed to avoid.
      // 1M rows of token-sized records is comfortably driver-safe.
      .config("spark.sql.execution.topKSortFallbackThreshold", "1048576")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE coalescing floor (r13→r14, guide §2.5/§2.6): the default 1 MB
      // minPartitionSize serializes byte-tiny but CPU-dense stages (pair
      // scoring: vector dots, levenshtein, per-pair folds) onto ONE task —
      // bytes underestimate cost on compressed columnar data feeding
      // codegen-dense operators. r13 set the floor to 64k SESSION-WIDE;
      // the r14 per-query A/B showed that wins exactly where the pair
      // scorers run (x23 2.0 vs 7.2 s, x16 1.4 vs 3.6 s, x17 5.8 vs 6.4 s)
      // but COSTS the CC/minhash band 1.0–1.9 s per query in un-coalesced
      // tiny tasks across their many small stages (x24 3.6 vs 2.2 s,
      // x8 4.0 vs 2.7 s, m7 9.2 vs 7.3 s, z58 5.2 vs 3.9 s, x25 4.6 vs
      // 3.7 s). So the session default returns to Spark's 1m and the
      // three pair-scoring queries scope the 64k floor to themselves via
      // Housekeeping.scopedConf (restored by the harness sweep).
      // Env-overridable for cluster tuning either way.
      // r13: partitioned-store reads with >32 partition dirs were paying a
      // DISTRIBUTED listing job (~100–150 ms of job overhead per read) —
      // on local FS the driver lists 60 paths in ~ms, so the threshold
      // rises to 1024 here; an object-store deployment, where listing
      // really is the bottleneck, sets SPARK_GRAFT_LIST_PAR back down
      // (the upstream default is 32).
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PAR", "1024"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "1m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
