package graft

/** Joins that rely on AQE (not a forced hint) to choose broadcast must
  * degrade gracefully — same rows, shuffle join — when the build side
  * exceeds the broadcast budget. A forced `broadcast()` hint bypasses
  * Spark's size check entirely, which at corpus scale means a driver OOM
  * instead of a slower-but-correct plan; these gates prove the unhinted
  * form keeps both properties. */
class PipelineDegradeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("z17: bigram scoring survives a zero broadcast budget with identical rows") {
    val baseline = SparkEntry.queries("z17_bigram_logprob")(spark, sf).collect()
    val degraded = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = SparkEntry.queries("z17_bigram_logprob")(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        "with the budget at -1 the count-table joins must fall back to shuffle joins")
      df.collect()
    }
    assert(degraded.toSeq == baseline.toSeq,
      "join-strategy fallback changed the scored rows")
    Housekeeping.releaseAllBlocks(spark)
  }

  test("z26: KL drift survives a zero broadcast budget with identical rows") {
    // the per-term table is unhinted (vocabulary grows with the corpus);
    // the group-bounded tables keep explicit hints, which legitimately
    // survive a -1 threshold — so the assertion is that at least one
    // join FELL BACK to a shuffle join and the rows are unchanged
    val baseline = SparkEntry.queries("z26_kl_drift")(spark, sf).collect()
    val degraded = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = SparkEntry.queries("z26_kl_drift")(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert("(SortMerge|ShuffledHash)Join".r.findAllIn(plan).nonEmpty,
        "with the budget at -1 the per-term join must fall back to a shuffle join")
      df.collect()
    }
    assert(degraded.toSeq == baseline.toSeq,
      "join-strategy fallback changed the drift rows")
    Housekeeping.releaseAllBlocks(spark)
  }

  test("z38: Kneser-Ney scoring survives a zero broadcast budget with identical rows") {
    // all four count tables (bigram, context, continuation fwd/bwd) are
    // vocabulary/bigram-space sized and join UNHINTED; only the one-row
    // distinct-bigram total keeps its hint
    val baseline = SparkEntry.queries("z38_kneser_ney")(spark, sf).collect()
    val degraded = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = SparkEntry.queries("z38_kneser_ney")(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        "with the budget at -1 the count-table joins must fall back to shuffle joins")
      df.collect()
    }
    assert(degraded.toSeq == baseline.toSeq,
      "join-strategy fallback changed the KN-scored rows")
    Housekeeping.releaseAllBlocks(spark)
  }

  test("bucketed/IVF ANN survive a zero broadcast budget with identical rows") {
    // the query side of bucketedTopK/ivfTopKAssigned is unhinted (a query
    // batch can grow with the corpus); when AQE can't broadcast it, the
    // bucket/cell equi-join must shuffle — same rows, no cartesian. y3's
    // plan legitimately keeps ONE nested-loop join: the corpus × 8-anchor
    // quantizer scan, whose broadcast side is anchor-count-bounded by
    // definition — only the pure bucket joins assert a BNLJ-free plan.
    for (q <- Seq("y2_knn_bucketed", "y3_knn_ivf", "m4_media_embed_ann")) {
      val baseline = SparkEntry.queries(q)(spark, sf).collect()
      val degraded = withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val df = SparkEntry.queries(q)(spark, sf)
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"$q must not degrade to a cartesian product")
        if (q != "y3_knn_ivf")
          assert(!plan.contains("BroadcastNestedLoopJoin"),
            s"$q must degrade to a shuffled equi-join, not a cross product")
        df.collect()
      }
      assert(degraded.toSeq == baseline.toSeq,
        s"$q: join-strategy fallback changed the rows")
    }
    Housekeeping.releaseAllBlocks(spark)
  }
}
