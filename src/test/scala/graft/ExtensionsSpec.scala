package graft

import graft.operators.{Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.5f, -2.0f, 3.25f), Array(0.5f, 4.0f, -1.0f)),
    (1L, Array(0.1f, 0.2f, 0.3f), Array(0.4f, 0.5f, 0.6f))
  ).toDF("id", "a", "b")

  test("vector_dot SQL function is registered and exact") {
    val got = vecs.select(expr("vector_dot(a, b)").as("d")).as[Double].collect()
    val want0 = 1.5f.toDouble * 0.5f + (-2.0f).toDouble * 4.0f + 3.25f.toDouble * (-1.0f)
    assert(got(0) === want0)
  }

  test("RewriteDotProduct replaces the HOF dot with the native expression, bit-identically") {
    // plan assertion needs a non-local source: over a local Seq the whole
    // projection constant-folds into a LocalRelation before we can look
    val ranged = spark.range(4).select(col("id"),
      array((0 until 8).map(i => (col("id") + i).cast("float")): _*).as("a"),
      array((0 until 8).map(i => (col("id") * 2 + i).cast("float")): _*).as("b"))
    val hof = ranged.select(col("id"), Similarity.dot("a", "b").as("d"))
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vector_dot"), s"rule did not fire:\n$optimized")
    val native = ranged.select(col("id"), expr("vector_dot(a, b)").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(hof.as[(Long, Double)].collect().toMap === native)
    // and on the local frame, values agree between HOF and native paths
    val localHof = vecs.select(col("id"), Similarity.dot("a", "b").as("d"))
      .as[(Long, Double)].collect().toMap
    val localNative = vecs.select(col("id"), expr("vector_dot(a, b)").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(localHof === localNative)
  }

  test("vector_dot mirrors the HOF form on degenerate inputs: unequal lengths and null elements") {
    // zip_with pads the shorter array with null and the null product
    // poisons the aggregate sum → null; vector_dot must agree so the
    // session-wide rewrite stays semantics-preserving on ALL inputs
    val degenerate = Seq(
      (0L, Some(Array(1.0f, 2.0f)), Some(Array(3.0f))),           // unequal lengths
      (1L, Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),     // clean
      (2L, None: Option[Array[Float]], Some(Array(3.0f, 4.0f)))   // null array
    ).toDF("id", "a", "b")
    val native = degenerate.select(col("id"), expr("vector_dot(a, b)").as("d"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val hof = degenerate.select(col("id"), Similarity.dot("a", "b").as("d"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(native === hof)
    assert(native(0).isEmpty && native(2).isEmpty && native(1).contains(11.0))
    // null ELEMENT: build via an expression (Seq encoder would fail on null Float)
    val withNullElem = spark.range(1).select(
      array(lit(1.0f), lit(null).cast("float")).as("a"),
      array(lit(2.0f), lit(3.0f)).as("b"))
    val ne = withNullElem.select(expr("vector_dot(a, b)").as("d")).collect()(0)
    val nh = withNullElem.select(Similarity.dot("a", "b").as("d")).collect()(0)
    assert(ne.isNullAt(0) && nh.isNullAt(0))
  }

  test("vector_dot rejects wrong arity and non-float arrays at analysis time") {
    val bad = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val e1 = intercept[Exception](bad.select(expr("vector_dot(a, b)")).collect())
    assert(e1.getMessage.contains("array<float>"), e1.getMessage)
    val e2 = intercept[Exception](vecs.select(expr("vector_dot(a)")).collect())
    assert(e2.getMessage.contains("2 arguments"), e2.getMessage)
  }

  test("hyperplane_bucket native == HOF reference on random, 8-dim, and degenerate vectors") {
    val rnd = new scala.util.Random(7)
    val rand64 = (0L until 200L).map(id =>
      (id, Array.fill(64)((rnd.nextFloat() - 0.5f) * 4f))).toDF("id", "v")
    val rand8 = (0L until 200L).map(id =>
      (id, Array.fill(8)((rnd.nextFloat() - 0.5f) * 4f))).toDF("id", "v")
    for ((df, dims) <- Seq((rand64, 64), (rand8, 8))) {
      val both = df.select(col("id"),
          Similarity.hyperplaneBucket("v", dims).as("nat"),
          Similarity.hyperplaneBucketHof("v", dims).as("hof"))
        .filter(col("nat") =!= col("hof"))
      assert(both.isEmpty, s"native/HOF bucket drift at dims=$dims")
      // buckets actually spread (the mod-13 planes are all distinct)
      assert(df.select(Similarity.hyperplaneBucket("v", dims)).distinct().count() > 10)
    }
    // null ELEMENT → every plane's fold poisons → bucket 0 in both forms
    val ne = spark.range(1)
      .select(expr(s"array(${("CAST(NULL AS FLOAT)" +: Seq.fill(63)("1.0F")).mkString(",")})").as("v"))
    val neRows = ne.select(
      Similarity.hyperplaneBucket("v").as("nat"),
      Similarity.hyperplaneBucketHof("v").as("hof")).collect()(0)
    assert(neRows.getLong(0) === 0L && neRows.getLong(1) === 0L)
    // null ARRAY → null
    val na = spark.range(1).select(lit(null).cast("array<float>").as("v"))
      .select(Similarity.hyperplaneBucket("v").as("nat")).collect()(0)
    assert(na.isNullAt(0))
  }

  test("hyperplane_bucket plane-count knob: native == HOF at 16 planes, low bits stable") {
    val rnd = new scala.util.Random(11)
    val df = (0L until 300L).map(id =>
      (id, Array.fill(64)((rnd.nextFloat() - 0.5f) * 4f))).toDF("id", "v")
    val drift = df.select(col("id"),
        Similarity.hyperplaneBucket("v", 64, planes = 16).as("nat"),
        Similarity.hyperplaneBucketHof("v", 64, planes = 16).as("hof"))
      .filter(col("nat") =!= col("hof"))
    assert(drift.isEmpty, "native/HOF drift at planes=16")
    // adding planes REFINES buckets: the low 8 bits of the 16-plane
    // bucket are exactly the 8-plane bucket (existing ids preserved)
    val stable = df.select(
        Similarity.hyperplaneBucket("v", 64, planes = 16).bitwiseAND(lit(255L)).as("lo"),
        Similarity.hyperplaneBucket("v", 64).as("b8"))
      .filter(col("lo") =!= col("b8"))
    assert(stable.isEmpty, "16-plane low bits drifted from the 8-plane bucket")
    // and the wider signature splits occupancy: strictly more distinct
    // buckets at 16 planes than at 8 on this corpus
    val n8 = df.select(Similarity.hyperplaneBucket("v", 64)).distinct().count()
    val n16 = df.select(Similarity.hyperplaneBucket("v", 64, planes = 16)).distinct().count()
    assert(n16 > n8, s"16 planes did not split buckets ($n16 <= $n8)")
    // every plane in the full 30-plane range is a distinct weight vector —
    // the mod-13 lattice would silently duplicate plane 0 at j=13
    val planes = (0 until graft.plans.HyperplaneBucket.MaxPlanes)
      .map(j => (0 until 64).map(i => Similarity.planeWeight(i, j)))
    assert(planes.distinct.size === graft.plans.HyperplaneBucket.MaxPlanes)
  }

  test("graft_rolling_windows: rolling fingerprints equal independent per-window Horner folds") {
    val (b, m) = graft.operators.TextAnalysis.RollingA
    // string (byte-window) form, including a doc shorter than k (empty
    // array, not null) and one exactly k long (single window)
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "short"), (3L, "exactly16bytes!!"), (4L, "aaaaaaaaaaaaaaaaaaaaaa"))
      .toDF("id", "t")
    val k = 16
    val got = docs.select(col("id"),
        graft.operators.TextAnalysis.rollingWindows(col("t"), k).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    def horner(vals: Seq[Long]): Long =
      vals.foldLeft(0L)((acc, x) => (acc * b + x % m) % m)
    for ((id, t) <- Seq(1L -> "the quick brown fox jumps over the lazy dog",
        2L -> "short", 3L -> "exactly16bytes!!", 4L -> "aaaaaaaaaaaaaaaaaaaaaa")) {
      val bytes = t.getBytes("UTF-8").map(x => (x & 0xFF).toLong).toSeq
      val want =
        if (bytes.length < k) Seq.empty[Long]
        else (0 to bytes.length - k).map(i => horner(bytes.slice(i, i + k)))
      assert(got(id) === want, s"doc $id rolling drifted from direct Horner")
    }
    // array<bigint> (word-hash-stream) form
    val arr = Seq((1L, Seq(7L, 4294967295L, 12L, 99L, 3L))).toDF("id", "hs")
    val gotA = arr.select(graft.operators.TextAnalysis.rollingWindows(col("hs"), 3).as("f"))
      .as[Seq[Long]].head()
    val vals = Seq(7L, 4294967295L, 12L, 99L, 3L)
    assert(gotA === (0 to 2).map(i => horner(vals.slice(i, i + 3))))
    // null input → null
    val nul = docs.select(graft.operators.TextAnalysis.rollingWindows(
        when(col("id") === 99L, col("t")), k).as("f"))
      .filter(col("f").isNull).count()
    assert(nul === 4L)
  }

  test("RollingWindows rolling update == direct Horner on random inputs (scalacheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // exercises the subtract-lead/multiply/add slide (the only nontrivial
    // arithmetic) directly on the static helper — no Spark job per case
    val latticeGen = Gen.oneOf((257L, 2147483647L), (263L, 2147483629L),
      (1L, 2147483647L)) // base=1: rolling window SUMS
    // word-hash range PLUS negative values: the expression normalizes any
    // bigint element into [0, mod), so the rolling slide must stay
    // congruent with a mathematical-mod Horner fold even below zero
    val valsGen = Gen.listOf(Gen.oneOf(
      Gen.chooseNum(0L, 4294967295L),
      Gen.chooseNum(Long.MinValue, Long.MaxValue)))
    val kGen = Gen.chooseNum(1, 12)
    val prop = Prop.forAll(valsGen, kGen, latticeGen) { case (vs, k, (b, m)) =>
      val got = graft.plans.RollingWindows
        .overLongs(new GenericArrayData(vs.toArray), k, b, m, intElements = false)
        .toLongArray().toSeq
      def pmod(x: Long) = { val r = x % m; if (r < 0) r + m else r }
      def horner(w: Seq[Long]) = w.foldLeft(0L)((acc, x) => (acc * b + pmod(x)) % m)
      val want =
        if (vs.length < k) Seq.empty[Long]
        else (0 to vs.length - k).map(i => horner(vs.slice(i, i + k)))
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("graft_cms_estimate reads back Spark's count_min_sketch exactly on a small vocab") {
    // 26 distinct terms, known counts: term i appears i+1 times. A sketch
    // with width 2000 over 26 keys is collision-free, so the CMS upper
    // bound is tight — estimate == exact for every term.
    val terms = ('a' to 'z').zipWithIndex
      .flatMap { case (c, i) => Seq.fill(i + 1)(c.toString) }
    val df = terms.toDF("term")
    val sk = df.agg(expr(
      "count_min_sketch(term, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)").as("sk"))
    val est = df.distinct().crossJoin(sk)
      .select(col("term"),
        call_function("graft_cms_estimate", col("sk"), col("term")).as("est"))
      .as[(String, Long)].collect().toMap
    ('a' to 'z').zipWithIndex.foreach { case (c, i) =>
      assert(est(c.toString) === i + 1L, s"term $c")
    }
    // absent key: CMS may over-count but never invents less than zero;
    // with this sketch the probe row is untouched → exactly 0
    val absent = sk.select(
      call_function("graft_cms_estimate", col("sk"), lit("zz")).as("est"))
      .as[Long].collect().head
    assert(absent >= 0L)
    // long items round-trip too (CountMinSketchAgg adds integrals as longs)
    val lsk = spark.range(100).select((col("id") % 10).as("k"))
      .agg(expr("count_min_sketch(k, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 7)").as("sk"))
    val l0 = lsk.select(
      call_function("graft_cms_estimate", col("sk"), lit(3L)).as("est"))
      .as[Long].collect().head
    assert(l0 === 10L)
    // analysis-time arity + type errors
    val e1 = intercept[Exception] { spark.sql("SELECT graft_cms_estimate(CAST('x' AS BINARY))") }
    assert(e1.getMessage.contains("2 arguments"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.range(1).select(call_function("graft_cms_estimate", lit(1), lit("a"))).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("binary"), e2.getMessage)
  }

  test("OPQ recall integers at sf0.001 are pinned for all three consumers (PQ, IVF-PQ, fitted)") {
    // Independent reproduction of the y13/y9b/y3f measurement through the
    // public Similarity API, asserting the EXACT hit counts — the declared
    // queries gate only the ≥ contract, so without these integers a
    // quantizer regression could hide inside a still-true inequality.
    val d = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, d)
      .withColumn("mvec", transform(col("embedding"), (x, i) =>
        (x.cast("double") * pow(lit(2.0), (lit(32.0) - i.cast("double")) / lit(16.0)))
          .cast("float")))
      .select(col("vec_id"), col("mvec"))
    val gram = Similarity.gramUpper(e, "mvec")
      .select("i", "j", "gram").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    val r = Similarity.opqRotation(Similarity.gramToMatrix(gram, 64), m = 8)
    val er = e.withColumn("rvec", Similarity.rotateVec("mvec", r))
      .localCheckpoint()
    val qPred = col("vec_id") % 50 === 0 && col("vec_id") < 1000
    val truth = Similarity.bruteForceTopK(
        e.filter(qPred), e, "vec_id", "mvec", k = 10)
      .select("q_id", "c_id").localCheckpoint()
    def hitCount(top: org.apache.spark.sql.DataFrame): Long =
      top.select("q_id", "c_id").join(truth, Seq("q_id", "c_id"), "left_semi").count()
    def cbOf(vecs: org.apache.spark.sql.DataFrame, vc: String, n: Int) =
      vecs.filter(col("vec_id") < n)
        .select(col("vec_id").as("anchor_id"), col(vc).as("anchor_vec"))
    // plain PQ (y13's arms)
    def pqArm(vecs: org.apache.spark.sql.DataFrame, vc: String): Long = {
      val cb = cbOf(vecs, vc, 16)
      hitCount(Similarity.pqTopK(
        Similarity.pqEncode(vecs, cb, "vec_id", vc, m = 8, subDim = 8),
        cb, vecs.filter(qPred), "vec_id", vc, m = 8, subDim = 8, k = 10))
    }
    // IVF-PQ (y9b's arms; y3f's rotated arm serves the same geometry off
    // the stored codes, so its counts coincide with these)
    def ivfPqArm(vecs: org.apache.spark.sql.DataFrame, vc: String): Long = {
      val assigned = Similarity.ivfAssign(vecs, cbOf(vecs, vc, 8), "vec_id", vc)
        .select(col("vec_id"), col(vc), col("cell"))
      val cb = cbOf(vecs, vc, 16)
      hitCount(Similarity.pqTopK(
        Similarity.pqEncode(assigned, cb, "vec_id", vc, m = 8, subDim = 8,
          carryCols = Seq("cell")),
        cb, assigned.filter(qPred), "vec_id", vc, m = 8, subDim = 8, k = 10,
        blockCol = Some("cell")))
    }
    val rvecs = er.select(col("vec_id"), col("rvec"))
    // plain PQ shows the rotation's win (21 -> 26); the IVF-PQ arms TIE
    // at this SF (24 = 24) because 8-cell pruning on ~60-vector cells is
    // the recall ceiling, not quantization error - the declared >=
    // contracts hold either way, and any drift in these integers is a
    // quantizer change that must be explained
    assert(pqArm(e, "mvec") === 21L, "y13 raw-PQ hits")
    assert(pqArm(rvecs, "rvec") === 26L, "y13 rotated-PQ hits")
    assert(ivfPqArm(e, "mvec") === 24L, "y9b raw IVF-PQ hits")
    assert(ivfPqArm(rvecs, "rvec") === 24L, "y9b/y3f rotated IVF-PQ hits")
  }

  test("y22 MIPS serving recall integers are pinned at sf0.001") {
    // y9b's precedent: the declared panel gates per-row hits against the
    // exact arm, but only the pinned integer makes a silent recall
    // regression (augmentation drift, bucket change, probe loss) loud.
    val d = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, d)
    val qPred: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      id => id % 50 === 0 && id < 1000
    // truth ranks by RAW DOT — mipsTopK's serving objective (NOT cosine:
    // bruteForceTopK's angular truth would pin a different quantity)
    val q = e.filter(qPred(col("vec_id")))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val scored = q.join(c, col("q_id") =!= col("c_id"))
      .withColumn("dot", round(Similarity.dot("q_vec", "c_vec"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("dot").desc, col("c_id").asc)
    val exact = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3).select("q_id", "c_id").localCheckpoint()
    val served = Similarity.mipsTopK(e, qPred, "vec_id", "embedding",
      k = 3, planes = 4)
    val hits = served.select("q_id", "c_id")
      .join(exact, Seq("q_id", "c_id"), "left_semi").count()
    // 10/30 at this SF (21/30 at sf0.01): the near-orthogonal synthetic
    // corpus's augmented geometry is the ceiling, not the reduction —
    // y21 proves rank-equivalence; this pins what the index surfaces
    assert(hits === 10L, "y22 MIPS bucket-serving hit count drifted")
    Housekeeping.releaseAllBlocks(spark)
  }

  test("x51 tail-sketch false-positive integers are pinned at sf0.001") {
    // The declared panel gates the CONTRACT booleans (no FN, FP within
    // the occupancy bound); this pins the raw FP count so a seed/width/
    // hash change in the sketch path is loud, not absorbed by the bound.
    val d = "/root/testdata/sf0.001"
    val k = 8
    def segsOf(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.chunkWords(df, "doc_id", "text", k)
        .select(TextAnalysis.hash32(col("chunk_text")).as("h1"),
          TextAnalysis.hash32b(col("chunk_text")).as("h2"))
    val docs = Tables.documents(spark, d)
    val baseCnt = segsOf(docs.filter(col("doc_id") % 10 =!= 0))
      .groupBy("h1", "h2").agg(count(lit(1)).as("df"))
    val sk = baseCnt.filter(col("df") === 1)
      .withColumn("key", concat_ws(":", col("h1"), col("h2")))
      .agg(expr("count_min_sketch(key, CAST(0.0001 AS DOUBLE), " +
        "CAST(0.99 AS DOUBLE), 42)").as("sk"))
    // miss probes: batch keys absent from the base entirely (df_base = 0,
    // batch count 1) — any est >= 1 among them is a false positive
    val missProbes = segsOf(docs.filter(col("doc_id") % 10 === 0))
      .groupBy("h1", "h2").agg(count(lit(1)).as("b"))
      .filter(col("b") === 1)
      .join(baseCnt, Seq("h1", "h2"), "left_anti")
    val nFp = missProbes.crossJoin(broadcast(sk))
      .withColumn("est", call_function("graft_cms_estimate", col("sk"),
        concat_ws(":", col("h1"), col("h2"))))
      .filter(col("est") >= 1).count()
    assert(nFp === 0L, "x51 tail-sketch FP count drifted at sf0.001")
    Housekeeping.releaseAllBlocks(spark)
  }

  test("kNN through the rewrite matches the hand path end-to-end") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(
      e.filter(col("vec_id") === 0), e, "vec_id", "embedding", k = 2)
    assert(out.queryExecution.optimizedPlan.toString.contains("vector_dot"))
    val top = out.orderBy("rank").as[(Long, Int, Long, Double)].collect()
    assert(top(0)._3 === 1L && top(0)._4 === 1.0)
  }

  test("y19/y20 mining integers at sf0.001 are pinned") {
    // The declared queries gate values against the oracle; these EXACT
    // integers pin the mining semantics so an index/quantizer change
    // can't drift the panels while still oracle-matching its own drift.
    val d = "/root/testdata/sf0.001"
    val y19 = SparkEntry.queries("y19_triplet_mine")(spark, d).localCheckpoint()
    assert(y19.count() === 50L)
    assert(y19.filter(col("neg_id").isNotNull).count() === 50L)
    assert(y19.filter(col("pos_id").isNotNull).count() === 47L,
      "3 anchors have no same-label candidate in their probed buckets")
    assert(y19.filter(col("margin") < 0).count() === 42L,
      "negative-margin anchors — the triplets a fine-tune needs first")
    val y20 = SparkEntry.queries("y20_pq_rerank")(spark, d).localCheckpoint()
    assert(y20.count() === 50L)
    assert(y20.filter(col("promoted")).count() === 34L,
      "rows the exact rerank moved up past their ADC rank")
    // exact-truth recall: the rerank DOUBLES the ADC top-5's hit count
    // within the same cell-blocked shortlist (both ceilinged by 8-cell
    // pruning — y9b's documented recall limit, not quantization error)
    val e = Tables.embeddings(spark, d)
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val pairs = q.join(c, col("q_id") =!= col("c_id"))
      .withColumn("d2", round(
        Similarity.dot("qv", "qv") - lit(2.0) * Similarity.dot("qv", "cv")
          + Similarity.dot("cv", "cv"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("d2").asc, col("c_id").asc)
    val truth = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("q_id", "c_id").localCheckpoint()
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.select("q_id", "c_id").join(truth, Seq("q_id", "c_id"), "left_semi").count()
    assert(hits(y20) === 8L, "rerank top-5 exact-truth hits")
    val y9 = SparkEntry.queries("y9_ivfpq")(spark, d).localCheckpoint()
    assert(hits(y9) === 4L, "ADC top-5 exact-truth hits (the rerank's baseline)")
  }
}
