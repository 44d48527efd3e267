package graft

import graft.operators.Relational
import graft.sources.Store
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg matches the direct aggregation on a skewed key") {
    // 10k rows on the hot key (half of them IDENTICAL rows — the case where
    // a row-content-only salt collapses), a handful elsewhere
    val skewed = spark.range(10000)
      .select(lit("HOT").as("k"), (col("id") % 5000).cast("double").as("v"))
      .union(Seq(("a", 5.0), ("b", 7.0), ("a", 1.0)).toDF("k", "v"))
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"), max("v").as("max_v"))
      .as[(String, Double, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val salted = Relational.saltedAgg(skewed, col("k"), salts = 8, Seq(
      Relational.SaltedSpec("sum_v", sum(col("v")), sum),
      Relational.SaltedSpec("n", count(lit(1)), c => sum(c)),
      Relational.SaltedSpec("max_v", max(col("v")), max)))
      .as[(String, Double, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(salted === direct)
    assert(salted("HOT")._2 === 10000L)
  }

  test("saltedJoin matches the plain inner join on a skewed key, spread over salts") {
    // 20k fact rows on one hot key (many identical — the content-salt
    // collapse case), a few elsewhere; dim has one row per key
    val fact = spark.range(20000)
      .select(lit(7L).as("k"), (col("id") % 100).cast("double").as("v"))
      .union(Seq((1L, 5.0), (2L, 7.0), (1L, 1.0)).toDF("k", "v"))
    val dim = Seq((7L, "hot"), (1L, "one"), (2L, "two"), (9L, "unused"))
      .toDF("k", "name")
    val direct = fact.join(dim, Seq("k"))
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .as[(Long, String, Long, Double)].collect().toSet
    val salted = Relational.saltedJoin(fact, dim, "k", salts = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(salted === direct)
    // the hot key's fact rows actually use more than one salt value
    val saltSpread = fact.withColumn("__salt", Relational.saltCol(fact, 8))
      .filter(col("k") === 7L).select("__salt").distinct().count()
    assert(saltSpread > 1)
  }

  test("hash split is deterministic, exhaustive, and roughly proportioned") {
    import graft.operators.Sampling
    val ids = spark.range(2000).toDF("id")
    val counts = ids.select(Sampling.splitAssign(col("id"), 80, 10).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === 2000) // every row assigned exactly one split
    assert(counts("train") > 1400 && counts("train") < 1800) // ~80%
    assert(counts("val") > 100 && counts("test") > 100)
    // a null key gets a NULL split, never a silent bucket (test-set skew)
    val nullSplit = Seq[Option[Long]](None).toDF("id")
      .select(Sampling.splitAssign(col("id"))).collect().head
    assert(nullSplit.isNullAt(0))
    // same assignment on re-evaluation (would fail for rand()-based splits)
    val twice = ids.select(col("id"), Sampling.splitAssign(col("id")).as("a"))
      .join(ids.select(col("id"), Sampling.splitAssign(col("id")).as("b")), "id")
      .filter(col("a") =!= col("b")).count()
    assert(twice === 0)
  }

  test("sampleByHash rates nest: the 5-permille sample is inside the 20-permille one") {
    import graft.operators.Sampling
    val ids = spark.range(5000).toDF("id")
    val small = Sampling.sampleByHash(ids, col("id"), 5).as[Long].collect().toSet
    val big = Sampling.sampleByHash(ids, col("id"), 20).as[Long].collect().toSet
    assert(small.subsetOf(big)) // threshold monotonicity — stable expansions
    assert(big.size > small.size && small.nonEmpty)
  }

  test("capPerGroup keeps at most n per stratum, deterministically") {
    import graft.operators.Sampling
    val df = spark.range(1000)
      .select((col("id") % 7).as("src"), col("id"))
    val capped = Sampling.capPerGroup(df, col("src"), col("id"), 20)
    val counts = capped.groupBy("src").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ === 20)) // every stratum hits the cap
    val again = Sampling.capPerGroup(df, col("src"), col("id"), 20)
      .select("id").as[Long].collect().toSet
    assert(again === capped.select("id").as[Long].collect().toSet)
  }

  test("weightedReservoir: k rows, deterministic, and invariant to weight rescaling") {
    import graft.operators.Sampling
    val df = spark.range(2000).select(col("id"), (col("id") % 97 + 1).as("w"))
    val picked = Sampling.weightedReservoir(df, col("id"), col("w"), 30)
      .select("id").as[Long].collect()
    assert(picked.length === 30 && picked.toSet.size === 30)
    // pure function of the data: same call → same set
    val again = Sampling.weightedReservoir(df, col("id"), col("w"), 30)
      .select("id").as[Long].collect()
    assert(again.toSet === picked.toSet)
    // E-S selection depends only on RELATIVE weights: w → 7w, same sample
    val scaled = Sampling.weightedReservoir(
        df.withColumn("w", col("w") * 7), col("id"), col("w"), 30)
      .select("id").as[Long].collect()
    assert(scaled.toSet === picked.toSet)
  }

  test("tokenBudget: allocation respects the budget, the epoch cap, and integer identities") {
    import graft.operators.Sampling
    // three sources: tiny (cap must bind under sqrt flattening), medium, huge
    val stats = Seq(("a", 100L), ("b", 10000L), ("c", 1000000L))
      .toDF("source", "n_tokens")
    val budget = stats.agg(sum(col("n_tokens")).cast("long").as("budget_tokens"))
    val got = Sampling.tokenBudget(stats, "source", "n_tokens", budget, maxEpochs = 4)
      .select("source", "n_tokens", "share", "target_tokens", "alloc_tokens",
        "epochs", "capped")
      .as[(String, Long, Double, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // shares normalize (floor slack below one token per source)
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-9)
    for ((_, (_, n, _, target, alloc, epochs, capped)) <- got) {
      assert(alloc === math.min(target, 4 * n))
      assert(capped === (target > 4 * n))
      assert(math.abs(epochs - alloc.toDouble / n) < 1e-12)
      assert(epochs <= 4.0 + 1e-12)
    }
    // sqrt flattening hands the tiny source far more than its raw share —
    // the cap must bind there and not on the huge source
    assert(got("a")._7 && !got("c")._7)
    // total allocation never exceeds the budget
    assert(got.values.map(_._5).sum <= 1010100L)
  }

  test("tokenBudget: a zero-token source raises instead of emitting NaN epochs") {
    import graft.operators.Sampling
    val stats = Seq(("a", 100L), ("bad", 0L)).toDF("source", "n_tokens")
    val budget = Seq(400L).toDF("budget_tokens")
    val e = intercept[Exception] {
      Sampling.tokenBudget(stats, "source", "n_tokens", budget).collect()
    }
    assert(e.getMessage.contains("token count must be positive"))
  }

  test("shardAssign: balanced within one max-document, deterministic, exhaustive") {
    import graft.operators.Sampling
    // adversarially skewed sizes: doc 0 is enormous, the rest follow a ramp
    val df = spark.range(500)
      .select(col("id"), (when(col("id") === 0, 50000L)
        .otherwise(col("id") % 97 + 1)).as("toks"))
    val assigned = Sampling.shardAssign(df, Seq("id"), "toks", nShards = 8)
    val perShard = assigned.groupBy("shard")
      .agg(sum("toks").as("t"), count(lit(1)).as("n"))
      .as[(Int, Long, Long)].collect()
    assert(perShard.map(_._1).sorted.toSeq === (0 until 8))
    assert(perShard.map(_._3).sum === 500L)
    // round-robin over the size-sorted order: shard spread is bounded by
    // one max NON-head document per slot position (the giant head doc sits
    // alone in its slot and only ever raises the max by itself)
    val loads = perShard.map(_._2)
    assert(loads.max - loads.min <= 50000L, s"spread ${loads.max - loads.min}")
    val noHead = assigned.filter(col("id") =!= 0).groupBy("shard")
      .agg(sum("toks").as("t")).as[(Int, Long)].collect().map(_._2)
    assert(noHead.max - noHead.min <= 97L, s"non-head spread ${noHead.max - noHead.min}")
    // deterministic: same call, same assignment
    val again = Sampling.shardAssign(df, Seq("id"), "toks", nShards = 8)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    val first = assigned.select("id", "shard").as[(Long, Int)].collect().toMap
    assert(again === first)
  }

  test("weightedReservoir favors heavy rows: mean sampled weight beats the population mean") {
    import graft.operators.Sampling
    // weights 1..1000 — a weighted sample's mean weight must sit well above
    // the uniform mean (500.5); with ~50 draws this is a huge-margin event
    val df = spark.range(1000).select(col("id"), (col("id") + 1).as("w"))
    val meanW = Sampling.weightedReservoir(df, col("id"), col("w"), 50)
      .agg(avg("w")).as[Double].collect().head
    assert(meanW > 550.0, s"weighted sample mean weight $meanW not above uniform mean")
  }

  test("groupedTopK matches the naive per-group window exactly, including small groups") {
    import graft.operators.Relational
    import org.apache.spark.sql.expressions.Window
    // 3 groups of very different sizes (one smaller than k), scores with
    // deliberate ties so the doc_id tiebreaker is exercised
    val df = spark.range(1200).select(col("id"),
        (col("id") % 3).cast("string").as("g"),
        (col("id") % 37).as("score"))
      .union(Seq((9999L, "tiny", 1L), (9998L, "tiny", 2L)).toDF("id", "g", "score"))
    val order = Seq(col("score").desc, col("id"))
    val got = Relational.groupedTopK(df, Seq("g"), col("id"), order, k = 7,
        out = "rank", salts = 4)
      .select("g", "rank", "id").as[(String, Int, Long)].collect().toSet
    val naive = df.withColumn("rank",
        row_number().over(Window.partitionBy("g").orderBy(order: _*)))
      .filter(col("rank") <= 7)
      .select("g", "rank", "id").as[(String, Int, Long)].collect().toSet
    assert(got === naive)
    // the 2-row group returns both rows, ranked 1..2
    assert(got.filter(_._1 == "tiny") === Set(("tiny", 1, 9998L), ("tiny", 2, 9999L)))
  }

  test("klDrift: zero against an identical pool, positive for a divergent source") {
    import graft.operators.TextAnalysis
    // one source: group distribution IS the corpus distribution → exact 0.0
    val same = Seq((1L, "a", "x y x z"), (2L, "a", "y z z x")).toDF("doc_id", "src", "text")
    val kl0 = TextAnalysis.klDrift(same, "src", "text")
      .select("kl").as[Double].collect().head
    assert(kl0 === 0.0)
    // two sources with disjoint vocabulary: both diverge from the pool
    val far = Seq((1L, "a", "x x y y"), (2L, "b", "p p q q")).toDF("doc_id", "src", "text")
    val kls = TextAnalysis.klDrift(far, "src", "text")
      .select("src", "kl").as[(String, Double)].collect().toMap
    // p_t = 1/2, q_t = 1/4 for every term → KL = ln 2 for both sources
    assert(kls.keySet === Set("a", "b"))
    kls.values.foreach(kl => assert(math.abs(kl - math.log(2.0)) < 1e-5, s"kl=$kl"))
  }

  test("HLL sketch union across shards estimates within tolerance, any sharding") {
    // the property that makes store-per-shard / union-on-read valid:
    // merging per-shard sketches answers the same question as one global
    // sketch — to within the sketch's error contract, and ONLY that: the
    // measured estimates here are 1225 (direct), 1220 (7 coarse shards),
    // 1225 (13 fine shards) for 1234 true distincts. They differ because
    // a DataSketches HLL below ~k coupons is an exact sparse list and
    // above it a dense estimator, so the per-shard distinct count decides
    // which side of the transition each sketch lands on. The contract is
    // tolerance, not equality — exactly what z29's oracle asserts.
    val df = spark.range(5000).select((col("id") % 1234).as("u"), (col("id") % 7).as("shard"))
    val direct = df.agg(expr("hll_sketch_estimate(hll_sketch_agg(u))")).as[Long].head()
    val unioned = df.groupBy("shard").agg(expr("hll_sketch_agg(u)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).as[Long].head()
    val resharded = df.groupBy((col("u") % 13).as("s2")).agg(expr("hll_sketch_agg(u)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).as[Long].head()
    for ((label, est) <- Seq(("direct", direct), ("union7", unioned), ("union13", resharded)))
      assert(math.abs(est - 1234L) <= (1234 * 0.05).toLong, s"$label estimate $est")
    // determinism: HLL is RNG-free — the same sharding always lands on
    // the same estimate (what makes z29's contract oracle stable)
    val again = df.groupBy("shard").agg(expr("hll_sketch_agg(u)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).as[Long].head()
    assert(again === unioned)
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    val dir = tmpDir("bucketed")
    val store = Store(spark, dir, "season")
    val facts = spark.range(1000).select(col("id").as("k"), (col("id") % 7).as("v"))
    val dims = spark.range(100).select(col("id").as("k"), concat(lit("d"), col("id")).as("tag"))
    store.writeBucketed(facts, "facts_b", "k", 4)
    store.writeBucketed(dims, "dims_b", "k", 4)
    // disable broadcast so the join must pick the co-located SMJ path
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("facts_b").join(spark.table("dims_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === 100)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
    }
  }

  test("fanOut widens a narrow under-parallel frame but is identity past a shuffle") {
    // scan-shaped (LocalRelation leaf + filter): under-parallel → repartition
    val narrow = Seq(1, 2, 3, 4).toDF("v").filter(col("v") > 0)
    assert(Tables.fanOut(narrow).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // shuffle-containing frame (r13 ADVICE): df.rdd on it would make AQE
    // materialize upstream stages at plan time — fanOut must return the
    // SAME frame without planning it
    val shuffled = Seq(1, 2, 2, 3).toDF("v").groupBy("v").count()
    assert(Tables.fanOut(shuffled) eq shuffled)
  }
}
