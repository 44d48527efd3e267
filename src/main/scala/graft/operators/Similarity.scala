package graft.operators

import graft.Housekeeping
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Vector math uses higher-order functions (`zip_with`/`aggregate`) — pure
  * Catalyst expressions, no UDF serialization, deterministic left-to-right
  * fold. Floats are cast to double element-wise before multiplication so
  * both precision and cross-engine parity hold.
  *
  * Scale path: brute-force top-k is O(|Q|·|C|) with the query side
  * broadcast — right for small query sets or reranking. The hyperplane-LSH
  * bucketer turns ANN into a bucket-equi-join: assign each vector a
  * signature of sign bits, join on the signature, search within buckets —
  * the cross product never materializes. (An IVF variant is the same shape
  * with k-means centroids instead of hyperplanes.)
  */
object Similarity {

  /** Deterministic sequential-fold dot product of two float-array columns. */
  def dot(a: String, b: String): Column =
    expr(
      s"""aggregate(
         |  zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
         |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)

  /** L2 norm of a float-array column. */
  def norm(a: String): Column =
    sqrt(expr(
      s"""aggregate(
         |  transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
         |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin))

  /** Brute-force cosine top-k: every query row against every corpus row,
    * query side broadcast. Returns (query id, rank, neighbor id, cosine).
    * Cosine is rounded to 6 dp *before* ranking so the ordering (with id
    * tiebreak) is reproducible across engines and runs. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("q_nrm", norm("q_vec"))
    val c = corpus
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
      .withColumn("c_nrm", norm("c_vec"))
    val scored = broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .withColumn("cosine", round(dot("q_vec", "c_vec") / (col("q_nrm") * col("c_nrm")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cosine")
  }

  /** Default number of LSH hyperplanes (bucket signature bits) — delegated
    * to the native expression so the two forms can never disagree. The
    * plane count is the 100-TB knob: every bucketed path's per-bucket
    * candidate population is corpus/2^planes, so a production corpus
    * passes a higher `planes` to [[hyperplaneBucket]] (each added plane
    * halves expected occupancy — measured in the soak table). */
  val NumPlanes: Int = graft.plans.HyperplaneBucket.NumPlanes

  /** Deterministic pseudo-random hyperplane weight: plane j, dimension i —
    * delegated to the native expression's lattice (planes 0-12 the
    * original mod-13 form, 13+ a coprime mod-17 extension; see
    * HyperplaneBucket.weight for why mod 13 cannot extend past 13 planes
    * without duplicating one). */
  def planeWeight(i: Int, j: Int): Int = graft.plans.HyperplaneBucket.weight(i, j)

  /** SQL/Java source of [[planeWeight]] over a loop variable `iVar` —
    * shared by the HOF form here and every DuckDB oracle rendering so the
    * three never drift. */
  def planeWeightSql(iVar: String, j: Int): String =
    graft.plans.HyperplaneBucket.weightJava(iVar, j)

  /** Signed-projection bucket id (0..2^planes-1) for a float vector
    * column: bit j = [dot(vec, plane_j) > 0]. Evaluates through the native
    * codegen'd `hyperplane_bucket` expression (one primitive loop per row
    * accumulating all planes) registered by GraftExtensions; bit-identical
    * to [[hyperplaneBucketHof]], which remains the reference form the
    * parity spec checks against. The native form folds over the vector's
    * actual length while the HOF form truncates to `dims`, so the length
    * contract is ENFORCED here: a vector whose length differs from `dims`
    * raises (one length comparison per row — loud, instead of the two
    * forms silently bucketing differently). Null vectors stay null.
    * Requires a session built with the graft extensions — like
    * `vector_dot`, every production entry point (GraftSession/Verify/
    * Bench) installs them. */
  def hyperplaneBucket(vecCol: String, dims: Int = 64,
                       planes: Int = NumPlanes): Column = {
    val v = col(vecCol)
    when(v.isNull, lit(null).cast("bigint"))
      .when(size(v) === dims, call_function("hyperplane_bucket", v, lit(planes)))
      .otherwise(raise_error(concat(
        lit(s"hyperplane_bucket: expected a $dims-element vector, got "),
        size(v).cast("string"))))
  }

  /** The composable higher-order-function form of [[hyperplaneBucket]]:
    * one `aggregate` fold per plane over dims elements. Kept as the
    * executable specification of the bucket semantics (and for sessions
    * without the extensions installed). */
  def hyperplaneBucketHof(vecCol: String, dims: Int = 64,
                          planes: Int = NumPlanes): Column = {
    val bits = (0 until planes).map { j =>
      val dotJ = expr(
        s"""aggregate(sequence(0, ${dims - 1}), CAST(0 AS DOUBLE),
           |  (acc, i) -> acc + CAST($vecCol[i] AS DOUBLE)
           |                    * CAST(${planeWeightSql("i", j)} AS DOUBLE))""".stripMargin)
      when(dotJ > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** IVF cell assignment against a broadcast set of anchor vectors:
    * cell = argmin squared-L2 distance, ties to the lowest anchor id.
    * `anchors` columns: (anchor_id, anchor_vec). Distances are rounded to
    * 6 dp before the argmin so the assignment is reproducible across
    * engines/runs; the (dist, anchor_id) struct ordering breaks ties. */
  def ivfAssign(vectors: DataFrame, anchors: DataFrame, idCol: String,
                vecCol: String, extraCols: Seq[String] = Nil): DataFrame =
    rankCells(vectors, anchors, idCol, vecCol)
      .filter(col("__rn") === 1)
      .select(Seq(col(idCol), col(vecCol)) ++ extraCols.map(col) ++
        Seq(col("anchor_id").as("cell"), col("d2").as("cell_d2")): _*)

  /** Every (vector, anchor) pair with the rounded L2 distance and the
    * per-vector distance rank — the ONE implementation of the cell
    * ranking, so [[ivfAssign]] (rank 1) and [[ivfTopK]]'s nprobe probe
    * set (rank ≤ n) can never drift on rounding or tie-break. */
  private def rankCells(vectors: DataFrame, anchors: DataFrame, idCol: String,
                        vecCol: String): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(col("d2").asc, col("anchor_id").asc)
    vectors.crossJoin(broadcast(anchors))
      .withColumn("d2", round(
        dot(vecCol, vecCol) - lit(2.0) * dot(vecCol, "anchor_vec")
          + dot("anchor_vec", "anchor_vec"), 6))
      .withColumn("__rn", row_number().over(w))
  }

  /** One Lloyd refinement step: new centroid = element-wise mean of the
    * vectors assigned to each cell (posexplode → per-(cell, pos) mean →
    * re-assembled array). The k-means inner loop as pure DataFrame ops —
    * iterate assign/refine to taste; means are double so refined
    * assignments are NOT bit-reproducible across engines (keep refined
    * centroids out of oracle-matched queries). */
  def lloydRefine(assigned: DataFrame, vecCol: String): DataFrame =
    assigned
      .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(avg(col("x").cast("double")).as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
      .select(col("cell").as("anchor_id"),
        expr("transform(ps, p -> CAST(p.m AS FLOAT))").as("anchor_vec"))

  /** [[lloydRefine]] in ENGINE-REPLAYABLE arithmetic: per-(cell, pos)
    * means ride an exact DECIMAL(20,7) sum (component values snapshot
    * double→decimal, which is engine-stable at scale ≤ 12), the division
    * is ONE correctly-rounded IEEE op on identical operands, and the
    * result casts back to float exactly like [[lloydRefine]] — so refined
    * assignments CAN sit inside an oracle-matched query (y17), unlike the
    * plain double-avg form whose fold order drifts across engines. A cell
    * that loses all its vectors keeps its `prev` centroid ([[kmeansFit]]'s
    * dead-cell rule). Same shuffle shape as [[lloydRefine]]: posexplode →
    * one (cell, pos) aggregate (cardinality = cells × dims, bounded) →
    * cells-sized reassembly. */
  def lloydRefineExact(assigned: DataFrame, vecCol: String,
                       prev: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val means = assigned
      .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg((sum(col("x").cast(DoubleType).cast(DecimalType(20, 7)))
        .cast(DoubleType) / count(lit(1))).as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
      .select(col("cell").as("anchor_id"),
        expr("transform(ps, p -> CAST(p.m AS FLOAT))").as("anchor_vec"))
    means.unionByName(
      prev.join(means.select("anchor_id"), Seq("anchor_id"), "left_anti"))
  }

  /** One iteration's summary from [[kmeansFit]]: `wcss` is the total
    * within-cluster squared L2 at the round's ASSIGNMENT (before refine),
    * `maxMovement` the largest centroid L2 shift produced by the round's
    * refine, `nCells` the non-empty cell count. */
  final case class KmeansRound(iter: Int, wcss: Double, maxMovement: Double,
                               nCells: Long, n: Long)

  /** [[kmeansFit]] result: final anchors (same shape as the input —
    * (anchor_id, anchor_vec)), the per-round history, and whether the
    * movement threshold was reached before `maxIters`. */
  final case class KmeansResult(anchors: DataFrame, history: Seq[KmeansRound], converged: Boolean)

  /** Iterated Lloyd: alternate [[ivfAssign]] / [[lloydRefine]] until the
    * largest centroid movement drops below `eps` (L2) or `maxIters` rounds
    * pass — the k-means driver loop the one-step `lloydRefine` was always
    * meant to sit inside. Each round is two shuffles (the assignment
    * window + the refine aggregation); the driver only ever collects one
    * summary row per round, never data. Anchors are localCheckpoint'ed per
    * round so lineage stays flat across iterations. A cell that loses all
    * its vectors keeps its previous centroid (no respawn heuristic), so
    * the anchor count is stable. Both Lloyd steps are non-increasing in
    * WCSS, so `history` decreases monotonically (up to the 6-dp assignment
    * rounding documented on [[ivfAssign]]). */
  def kmeansFit(vectors: DataFrame, initAnchors: DataFrame, idCol: String,
                vecCol: String, maxIters: Int = 10, eps: Double = 1e-4): KmeansResult = {
    val spark = vectors.sparkSession
    // Housekeeping.pin per round: Dataset.unpersist does not free
    // localCheckpoint blocks, so the per-round anchor frames would leak
    var anchors = Housekeeping.pin(spark)(
      initAnchors.select(col("anchor_id"), col("anchor_vec")))
    val history = Seq.newBuilder[KmeansRound]
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val assigned = ivfAssign(vectors, anchors.df, idCol, vecCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val summary = assigned
          .agg(sum(col("cell_d2")), countDistinct(col("cell")), count(lit(1))).head()
        // empty vectors (or empty anchors → empty assignment): nothing to
        // move, the init anchors ARE the fixpoint — stop cleanly instead
        // of NPE-ing on the null sum
        if (summary.isNullAt(0))
          return KmeansResult(anchors.df, history.result(), converged = true)
        val (wcss, nCells, n) = (summary.getDouble(0), summary.getLong(1), summary.getLong(2))
        val refined = lloydRefine(assigned, vecCol)
        // dead cells keep their old centroid: refine only returns cells
        // with members, and dropping an anchor would shrink k silently.
        // Lazy pin (r13): the movement probe below always runs and
        // materializes the checkpoint — one job per round instead of two
        // (anchors.free() only happens after that probe, so the parent
        // blocks are still live when the chain executes).
        val next = Housekeeping.pinLazy(spark)(refined
          .unionByName(anchors.df.join(refined.select("anchor_id"), Seq("anchor_id"), "left_anti")))
        val moveRow = anchors.df.as("o")
          .join(next.df.as("n"), "anchor_id")
          .select(sqrt(expr(
            """aggregate(
              |  zip_with(o.anchor_vec, n.anchor_vec,
              |    (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
              |              * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
              |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)).as("m"))
          .agg(max(col("m"))).head()
        val movement = if (moveRow.isNullAt(0)) 0.0 else moveRow.getDouble(0)
        history += KmeansRound(i + 1, wcss, movement, nCells, n)
        anchors.free()
        anchors = next
        converged = movement < eps
      } finally assigned.unpersist()
      i += 1
    }
    // the final anchors block stays alive (the returned frame reads it);
    // the caller releases it after its action (Housekeeping.releaseAllBlocks)
    KmeansResult(anchors.df, history.result(), converged)
  }

  /** IVF ANN: assign every vector to its anchor cell, then top-k by cosine
    * within the query's `nprobe` NEAREST cells — the coarse-quantizer shape
    * of FAISS-style IVF flat, as one bucket equi-join (no cross product).
    * nprobe = 1 searches only the query's own cell; higher values are the
    * standard recall knob: a query near a cell boundary finds the
    * neighbors that fell just across it, at cost ∝ nprobe (the broadcast
    * query side grows nprobe rows per query; the candidate side never
    * duplicates — each candidate lives in exactly one cell, so a
    * (query, candidate) pair matches at most one probe cell). Anchors
    * here are seeded deterministic vectors; production would Lloyd-refine
    * them via [[kmeansFit]]. */
  def ivfTopK(vectors: DataFrame, anchors: DataFrame, queryIds: Column => Column,
              idCol: String, vecCol: String, k: Int, nprobe: Int = 1): DataFrame =
    ivfTopKAssigned(
      ivfAssign(vectors, anchors, idCol, vecCol).withColumn("nrm", norm(vecCol)),
      anchors, queryIds, idCol, vecCol, k, nprobe)

  /** [[ivfTopK]] over a PRE-ASSIGNED index relation — the persisted-index
    * read path: the corpus-wide anchor scan (`ivfAssign`, the expensive
    * build step) runs ONCE at index-build time and lands in a `Store`
    * table; per-query-batch jobs read (id, vec, cell[, nrm]) back and
    * join, never re-assigning the corpus. `anchors` is still needed for
    * the nprobe > 1 probe-set ranking (it is broadcast-sized by
    * definition). StoreSpec gates read-back == recompute. */
  def ivfTopKAssigned(index: DataFrame, anchors: DataFrame, queryIds: Column => Column,
                      idCol: String, vecCol: String, k: Int, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be at least 1, got $nprobe")
    val assigned =
      if (index.columns.contains("nrm")) index
      else index.withColumn("nrm", norm(vecCol))
    val q =
      if (nprobe == 1)
        assigned.filter(queryIds(col(idCol)))
          .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
            col("nrm").as("q_nrm"), col("cell"))
      else
        // re-rank the query rows' cell distances and keep the nprobe best;
        // queries are the tiny side, so the extra window is per-query-sized
        rankCells(assigned.filter(queryIds(col(idCol)))
            .select(col(idCol), col(vecCol)), anchors, idCol, vecCol)
          .filter(col("__rn") <= nprobe)
          .withColumn("nrm", norm(vecCol))
          .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
            col("nrm").as("q_nrm"), col("anchor_id").as("cell"))
    val c = assigned.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
      col("nrm").as("c_nrm"), col("cell"))
    // unhinted for the same reason as bucketedTopK: the query batch's
    // size is the caller's business, and AQE already broadcasts small ones
    val scored = q.join(c, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", round(dot("q_vec", "c_vec") / (col("q_nrm") * col("c_nrm")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "cell", "rank", "c_id", "cosine")
  }

  /** Bucketed ANN: top-k within the query vector's own bucket, or — with
    * `probeRadius = 1` — within the union of its bucket and every bucket
    * at Hamming distance 1 in signature space (multi-probe). Recall falls
    * off a cliff at bucket boundaries for near-boundary queries; probing
    * the 1-bit-flip neighbors recovers exactly those misses, and at scale
    * probing beats adding planes (more planes splits true neighbors apart;
    * more probes only widens the search). Same join shape: the query side
    * explodes into NumPlanes+1 probe keys (queries are the tiny broadcast
    * side, so the explode is cheap), the candidate side stays one row per
    * vector, and the cross product still never materializes. A candidate's
    * bucket matches at most one probe key, so no pair duplicates. Output
    * `bucket` is the query's OWN bucket in both modes. */
  def bucketedTopK(vectors: DataFrame, queryIds: Column => Column, idCol: String,
                   vecCol: String, k: Int, probeRadius: Int = 0,
                   dims: Int = 64, planes: Int = NumPlanes): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 1,
      s"probeRadius 0 (own bucket) or 1 (Hamming-1 neighbors) supported, got $probeRadius")
    val bucketed = vectors
      .select(col(idCol), col(vecCol))
      .withColumn("bucket", hyperplaneBucket(vecCol, dims, planes))
      .withColumn("nrm", norm(vecCol))
    val q0 = bucketed.filter(queryIds(col(idCol)))
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        col("nrm").as("q_nrm"), col("bucket"))
    val q =
      if (probeRadius == 0) q0.withColumn("__probe", col("bucket"))
      else q0.withColumn("__probe", explode(array(
        col("bucket") +:
          (0 until planes).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*)))
    val c = bucketed.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
      col("nrm").as("c_nrm"), col("bucket").as("__probe"))
    // NO broadcast hint on the query side: callers like media ANN pass a
    // modulus slice whose size grows WITH the corpus — a forced hint
    // would bypass Spark's size check and OOM the driver at scale (the
    // same failure mode the bigram tables had). AQE broadcasts while the
    // batch fits and degrades to a shuffled bucket equi-join when not.
    val scored = q.join(c, Seq("__probe"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", round(dot("q_vec", "c_vec") / (col("q_nrm") * col("c_nrm")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "bucket", "rank", "c_id", "cosine")
  }

  /** MIPS served on the hyperplane-bucket index — y21's norm-augmentation
    * reduction (Shrivastava & Li / Bachrach et al., the public reduction)
    * made operational: every CORPUS vector is augmented once at
    * index-build time with s = √(M² − ‖x‖²) (M = max corpus norm), every
    * QUERY with 0 — the augmentation is deliberately ASYMMETRIC (a
    * symmetric augment would add s_q·s_x to the inner product and stop
    * ranking MIPS). In the augmented space, cosine order ≡ raw-dot order
    * per query, so the EXISTING hyperplane machinery (signs at dims+1,
    * Hamming-1 multi-probe, bucket equi-join) generates candidates;
    * ranking then uses the raw 64-dim dot directly (rounded 6 dp, id
    * tiebreak) — the serving score IS the inner product, and the rounding
    * ties that separate y21's two rank columns cannot re-enter. The
    * augmented coordinate snaps to FLOAT (one IEEE correctly-rounded
    * cast, engine-stable) because that is the index's storage type —
    * augmentation is an index-build step, not a query-time one. Same
    * unhinted join + AQE discipline as [[bucketedTopK]]; `bucket` in the
    * output is the query's own (zero-augmented) bucket. */
  def mipsTopK(vectors: DataFrame, queryIds: Column => Column, idCol: String,
               vecCol: String, k: Int, probeRadius: Int = 1,
               dims: Int = 64, planes: Int = NumPlanes): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 1,
      s"probeRadius 0 (own bucket) or 1 (Hamming-1 neighbors) supported, got $probeRadius")
    val base = vectors.select(col(idCol), col(vecCol))
      .withColumn("__nrm", norm(vecCol))
    val m = base.agg(max(col("__nrm")).as("__mnorm"))
    val aug = base.crossJoin(broadcast(m))
      .withColumn("__s",
        sqrt(greatest(col("__mnorm") * col("__mnorm")
          - col("__nrm") * col("__nrm"), lit(0.0))).cast("float"))
    val c = aug
      .withColumn("__caug", concat(col(vecCol), array(col("__s"))))
      .withColumn("__probe", hyperplaneBucket("__caug", dims + 1, planes))
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"), col("__probe"))
    val q0 = aug.filter(queryIds(col(idCol)))
      .withColumn("__qaug", concat(col(vecCol), array(lit(0.0f))))
      .withColumn("bucket", hyperplaneBucket("__qaug", dims + 1, planes))
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"), col("bucket"))
    val q =
      if (probeRadius == 0) q0.withColumn("__probe", col("bucket"))
      else q0.withColumn("__probe", explode(array(
        col("bucket") +:
          (0 until planes).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*)))
    val scored = q.join(c, Seq("__probe"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("dot", round(dot("q_vec", "c_vec"), 6))
    val w = Window.partitionBy("q_id").orderBy(col("dot").desc, col("c_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "bucket", "rank", "c_id", "dot")
  }

  /** Triplet mining for embedding training: for each anchor, the nearest
    * SAME-label candidate (the positive) and the nearest DIFFERENT-label
    * candidate (the hard negative) inside the anchor's multi-probe bucket
    * neighborhood, plus the triplet margin pos − neg — the mining pass a
    * contrastive fine-tune runs over a labeled corpus. The candidate
    * generator is [[bucketedTopK]]'s (hyperplane signs, Hamming-1 probes,
    * unhinted join so AQE broadcasts the anchor slice while it fits); the
    * label split happens on the already-bucket-reduced candidate rows, so
    * the corpus never cross-products. Anchors with no same- or
    * different-label candidate in their probed buckets surface as null
    * columns — mining coverage is part of the signal (a null-heavy panel
    * says "add probes or drop planes"). */
  def tripletMine(vectors: DataFrame, queryIds: Column => Column, idCol: String,
                  vecCol: String, labelCol: String, probeRadius: Int = 1,
                  dims: Int = 64, planes: Int = NumPlanes): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 1,
      s"probeRadius 0 (own bucket) or 1 (Hamming-1 neighbors) supported, got $probeRadius")
    val bucketed = vectors
      .select(col(idCol), col(vecCol), col(labelCol))
      .withColumn("bucket", hyperplaneBucket(vecCol, dims, planes))
      .withColumn("nrm", norm(vecCol))
    val q0 = bucketed.filter(queryIds(col(idCol)))
      .select(col(idCol).as("q_id"), col(labelCol).as("q_label"),
        col(vecCol).as("q_vec"), col("nrm").as("q_nrm"), col("bucket"))
    val q =
      if (probeRadius == 0) q0.withColumn("__probe", col("bucket"))
      else q0.withColumn("__probe", explode(array(
        col("bucket") +:
          (0 until planes).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*)))
    val c = bucketed.select(col(idCol).as("c_id"), col(labelCol).as("c_label"),
      col(vecCol).as("c_vec"), col("nrm").as("c_nrm"), col("bucket").as("__probe"))
    // probe keys are distinct per anchor, so each (q, c) pair joins at most
    // once — no dedup pass needed before the per-anchor windows
    val scored = q.join(c, Seq("__probe"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine",
        round(dot("q_vec", "c_vec") / (col("q_nrm") * col("c_nrm")), 6))
      .select("q_id", "q_label", "c_id", "c_label", "cosine")
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
    val pos = scored.filter(col("q_label") === col("c_label"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("q_id"), col("c_id").as("pos_id"), col("cosine").as("pos_cosine"))
    val neg = scored.filter(col("q_label") =!= col("c_label"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("q_id"), col("c_id").as("neg_id"),
        col("c_label").as("neg_label"), col("cosine").as("neg_cosine"))
    q0.select("q_id", "q_label")
      .join(pos, Seq("q_id"), "left")
      .join(neg, Seq("q_id"), "left")
      .withColumn("margin", col("pos_cosine") - col("neg_cosine"))
  }

  /** Exact integer dot product of two int-array columns (deterministic —
    * integer arithmetic has no rounding, so quantized scores are
    * bit-identical across engines, partitionings, and runs). */
  def intDot(a: String, b: String): Column =
    expr(
      s"""aggregate(
         |  zip_with($a, $b, (x, y) -> CAST(x AS BIGINT) * y),
         |  CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin)

  /** Symmetric int8 scalar quantization: one corpus pass finds the global
    * max absolute component, every vector is scaled by 127/amax and each
    * component rounded to an int in [-127, 127] — the 4-bytes-per-dim
    * float corpus becomes 1 byte per dim (the simplest form of the
    * compression ladder that continues with PQ, [[pqEncode]]).
    *
    * Scale shape: the amax aggregate is one map-side-combinable pass
    * producing ONE row, cross-joined back broadcast; quantization itself
    * is a pure in-scan `transform`, so the whole encode is a single
    * corpus scan with a scalar side input. Precondition: a non-degenerate
    * corpus (amax > 0); an all-zero corpus would divide by zero.
    *
    * Determinism: scale = 127.0/amax and x·scale are single correctly-
    * rounded IEEE ops and `round` is half-away-from-zero in both engines,
    * so the quantized vectors — and everything downstream, because the
    * arithmetic is integer from here — are bit-identical. */
  def scalarQuantize(vectors: DataFrame, idCol: String, vecCol: String,
                     carryCols: Seq[String] = Nil): DataFrame = {
    val amax = vectors.agg(
      max(expr(s"array_max(transform($vecCol, x -> abs(CAST(x AS DOUBLE))))"))
        .as("amax"))
    vectors.crossJoin(broadcast(amax))
      .withColumn("__scale", lit(127.0) / col("amax"))
      .withColumn("qvec",
        expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * __scale) AS INT))"))
      .select(col(idCol) +: col("qvec") +: carryCols.map(col): _*)
  }

  /** Top-k over scalar-quantized vectors: integer dot products and
    * integer-derived norms, so the quantized-cosine ranking is exact
    * integer arithmetic plus one engine-stable division.
    *
    * `blockCol` (a hyperplane-LSH bucket / IVF cell the quantized rows
    * carry — the same coarse-quantizer role as [[pqTopK]]'s blockCol)
    * turns the serve join into a bucket equi-join, which is the ONLY
    * scale-safe form when the query set grows with the corpus: without it
    * both join sides are corpus-sized and the pair count is quadratic —
    * measured 1.2 s → 65 s for 10× data on the soak corpus. `None` keeps
    * the brute-force form with the query side broadcast — the rerank rung,
    * correct only for a bounded query batch. The blocked join is UNHINTED:
    * AQE broadcasts the query side while it fits and degrades to a
    * shuffled equi-join beyond (the y2/m4 lesson). */
  def quantizedTopK(vectors: DataFrame, queryIds: Column => Column, idCol: String,
                    vecCol: String, k: Int,
                    blockCol: Option[String] = None): DataFrame = {
    val qz = scalarQuantize(vectors, idCol, vecCol, blockCol.toSeq)
      .withColumn("nrm", sqrt(intDot("qvec", "qvec").cast("double")))
    val q = qz.filter(queryIds(col(idCol)))
      .select(col(idCol).as("q_id") +: col("qvec").as("q_q") +:
        col("nrm").as("q_nrm") +: blockCol.map(col).toSeq: _*)
    val c = qz.select(col(idCol).as("c_id") +: col("qvec").as("c_q") +:
      col("nrm").as("c_nrm") +: blockCol.map(col).toSeq: _*)
    val joined = blockCol match {
      case Some(b) => q.join(c, Seq(b)).filter(col("q_id") =!= col("c_id"))
      case None    => broadcast(q).join(c, col("q_id") =!= col("c_id"))
    }
    val scored = joined
      .withColumn("qcos", round(intDot("q_q", "c_q") / (col("q_nrm") * col("c_nrm")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("qcos").desc, col("c_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id") +: blockCol.map(col).toSeq ++:
        Seq(col("rank"), col("c_id"), col("qcos")): _*)
  }

  /** Deterministic pseudo-random projection weight for JL dimensionality
    * reduction: input dim i → output dim j. Same spirit as [[planeWeight]]
    * (sparse integer weights in [-8, 8], seeded by position, no RNG state
    * to ship or version) but a different lattice so a projected space
    * never accidentally aligns with the LSH planes. */
  def projWeight(i: Int, j: Int): Int = ((i * 37 + j * 23) % 17) - 8

  /** Johnson–Lindenstrauss random projection of a float-vector column to
    * `outDims` dimensions: output dim j = Σᵢ vec[i]·w(i,j), each component
    * a pinned left-to-right fold (deterministic, engine-portable — the
    * dotSql/bucketSql discipline). Pure projection, zero shuffle: runs
    * inside the scan's codegen stage, so reducing 64 floats to 16 costs
    * one map pass and every downstream shuffle/join/index moves 4× fewer
    * vector bytes — the cheapest lever a 100-TB embedding pipeline has
    * before any ANN structure is even chosen. JL guarantees pairwise
    * geometry is approximately preserved; y10's report MEASURES that on a
    * bounded sample instead of assuming it. */
  def randomProjection(vecCol: String, outDims: Int, inDims: Int = 64): Column = {
    val comps = (0 until outDims).map { j =>
      val terms = (0 until inDims).map(i =>
        s"CAST(element_at($vecCol, ${i + 1}) AS DOUBLE) * ${projWeight(i, j)}.0D")
      // pinned left-to-right sum: parenthesization is the parse order, so
      // both engines add in the identical sequence
      expr(terms.mkString("(", " + ", ")"))
    }
    array(comps: _*)
  }

  /** Exact upper-triangle Gram matrix of a float-vector column — the
    * one-pass second-moment relation under whitening / PCA / OPQ (the
    * dims×dims eigensolve is driver-side metadata once this lands).
    * Each vector expands to its dims·(dims+1)/2 products IN-TASK (two
    * chained posexplodes + j ≥ i — raw pair rows never leave the stage);
    * products snapshot at DECIMAL(30,10) so the corpus sum is exact and
    * shuffle-order-independent (the 20-digit integer headroom covers any
    * |xi·xj| < 1e20 — a component-magnitude bound no real embedding
    * approaches; at DECIMAL(20,10) a product ≥ 1e10 would overflow to
    * NULL in non-ANSI Spark and sum() would silently skip it); the
    * single shuffle carries the map-side-combined (i, j) partials —
    * dims² × partitions rows, never the corpus.
    * Output: (i, j, n, gram·as·double). */
  def gramUpper(vectors: DataFrame, vecCol: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    // r13 note: a single explode of a pre-built upper-triangle
    // array<struct> (flatten(transform(..transform(slice..)))) was tried
    // to halve the generated rows — and measured ~70% SLOWER (y12
    // 3.6 → 6.1 s): nested HOF struct construction is interpreted
    // per-element allocation, while the double posexplode runs inside
    // whole-stage codegen and the filtered half-rows never leave the
    // Generate stage. Kept the codegen'd form.
    vectors
      .select(col(vecCol).as("__v"), posexplode(col(vecCol)).as(Seq("i", "__xi")))
      .select(col("i"), col("__xi"), posexplode(col("__v")).as(Seq("j", "__xj")))
      .filter(col("j") >= col("i"))
      .select(col("i"), col("j"),
        (col("__xi").cast(DoubleType) * col("__xj").cast(DoubleType))
          .cast(DecimalType(30, 10)).as("__p"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(col("__p")).as("__s"))
      .select(col("i"), col("j"), col("n"), col("__s").cast(DoubleType).as("gram"))
  }

  /** Squared L2 distance between two float-array columns restricted to
    * subspace `subCol` (an INT column expression in scope, 0-based: dims
    * [sub·subDim, (sub+1)·subDim)), as a deterministic sequential fold.
    * Rounded to 6 dp so per-subspace argmins and distance tables are
    * reproducible across engines. */
  def subDist2(a: String, b: String, subCol: String, subDim: Int): Column =
    round(expr(
      s"""aggregate(
         |  zip_with(slice($a, $subCol * $subDim + 1, $subDim),
         |    slice($b, $subCol * $subDim + 1, $subDim),
         |    (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
         |              * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
         |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin), 6)

  /** Product-quantization encode: each vector becomes `m` one-byte-ish
    * codes — per subspace, the id of the nearest codebook anchor's
    * sub-slice (squared L2, ties to the lowest anchor id). `codebook` is
    * (anchor_id, anchor_vec) full-width vectors, broadcast-sized by
    * construction (m · k sub-centroids live inside k full vectors).
    *
    * Scale shape: the corpus side explodes to m rows per vector and joins
    * the BROADCAST codebook in-task; the argmin is a `min(struct)`
    * aggregate — map-side combinable, so the one shuffle carries ~m rows
    * per vector after partial aggregation, never the m·k distance rows,
    * and no per-vector window ever runs over the corpus. Output:
    * (idCol, sub, code). */
  /** PQ geometry must tile the vector exactly: a subspace slicing past the
    * array end would fold over an EMPTY slice and score 0 for every
    * anchor — silently wrong codes, not an error. */
  private def requirePqDims(m: Int, subDim: Int, dims: Int): Unit =
    require(m >= 1 && subDim >= 1 && m * subDim == dims,
      s"m ($m) x subDim ($subDim) must tile the $dims-dim vector exactly")

  def pqEncode(vectors: DataFrame, codebook: DataFrame, idCol: String,
               vecCol: String, m: Int, subDim: Int,
               carryCols: Seq[String] = Nil, dims: Int = 64): DataFrame = {
    requirePqDims(m, subDim, dims)
    val subs = vectors
      .select((col(idCol) +: col(vecCol) +: carryCols.map(col)): _*)
      .withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
    // carryCols (e.g. a precomputed LSH bucket) are functionally dependent
    // on the vector id, so grouping by them too costs nothing and saves a
    // corpus-sized join to re-attach them afterwards
    subs.crossJoin(broadcast(codebook))
      .withColumn("d6", subDist2(vecCol, "anchor_vec", "sub", subDim))
      .groupBy(col(idCol) +: col("sub") +: carryCols.map(col): _*)
      .agg(min(struct(col("d6"), col("anchor_id"))).as("w"))
      .select((col(idCol) +: col("sub") +: col("w.anchor_id").as("code") +:
        carryCols.map(col)): _*)
  }

  /** Driver-side cyclic Jacobi eigensolve of a small symmetric matrix —
    * the CONSUMER of [[gramUpper]]'s output: the Gram relation is dims²
    * scalars (a few KB at any corpus size — the y3b collect-one-summary
    * precedent), so the eigensolve is driver metadata, never a
    * distributed op. Deterministic: fixed (p, q) sweep order, fixed
    * convergence threshold, no randomness — the same Gram matrix yields
    * the same rotation on every run and every machine.
    * Returns (eigenvalues, eigenvectors) with eigenvector k in COLUMN k
    * of the returned matrix (A·v_k = λ_k·v_k). */
  def jacobiEigen(a0: Array[Array[Double]], maxSweeps: Int = 50,
                  tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    require(n > 0 && a0.forall(_.length == n), "jacobiEigen needs a square matrix")
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0; var i = 0
      while (i < n) { var j = i + 1; while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      math.sqrt(s)
    }
    var sweep = 0
    while (sweep < maxSweeps && offNorm > tol) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // stable tan: t = sign(θ)/(|θ| + sqrt(θ²+1)); θ=0 → t=1
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) { // A ← A·J (columns p, q)
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) { // A ← Jᵀ·A (rows p, q)
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < n) { // V ← V·J (eigenvectors accumulate in columns)
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Assemble the full symmetric dims×dims matrix from [[gramUpper]]'s
    * collected (i, j, gram) upper-triangle rows. */
  def gramToMatrix(rows: Seq[(Int, Int, Double)], dims: Int): Array[Array[Double]] = {
    val m = Array.fill(dims, dims)(0.0)
    rows.foreach { case (i, j, g) => m(i)(j) = g; m(j)(i) = g }
    m
  }

  /** OPQ-style rotation from the corpus second-moment (Gram) matrix:
    * eigen-decompose, sort eigenvectors by DESCENDING eigenvalue, then
    * deal them round-robin across the `m` PQ subspaces (sorted index t →
    * output position (t mod m)·subDim + t div m) — the eigenvalue-
    * allocation heuristic from the OPQ literature (Ge et al., CVPR 2013,
    * parametric form): each subspace carries a balanced slice of the
    * spectrum instead of subspace 0 hoarding all the variance, which is
    * what cuts per-subspace quantization error at equal code budget.
    * Returns row-major R (rotated[j] = ⟨R(j), x⟩); rows are orthonormal
    * because Jacobi's V is. Rotation is orthogonal, so full-width L2 /
    * cosine geometry is EXACTLY preserved (spec-gated) — only the
    * subspace tiling changes. */
  def opqRotation(gram: Array[Array[Double]], m: Int): Array[Array[Double]] = {
    val dims = gram.length
    require(m >= 1 && dims % m == 0, s"m ($m) must divide dims ($dims)")
    val subDim = dims / m
    val (vals, vecs) = jacobiEigen(gram)
    val order = (0 until dims).sortBy(k => (-vals(k), k))
    val r = Array.fill(dims, dims)(0.0)
    order.zipWithIndex.foreach { case (k, t) =>
      val pos = (t % m) * subDim + t / m
      var i = 0
      while (i < dims) { r(pos)(i) = vecs(i)(k); i += 1 }
    }
    r
  }

  /** Max |R·Rᵀ − I| — the driver-side orthogonality check a rotation must
    * pass before it is trusted at the encode seam. */
  def orthogonalityDefect(r: Array[Array[Double]]): Double = {
    val n = r.length
    var worst = 0.0
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        var s = 0.0; var k = 0
        while (k < n) { s += r(i)(k) * r(j)(k); k += 1 }
        val target = if (i == j) 1.0 else 0.0
        worst = math.max(worst, math.abs(s - target))
        j += 1
      }
      i += 1
    }
    worst
  }

  /** Apply a driver-computed rotation to a vector column: output
    * component j = Σᵢ R(j)(i)·vec[i], each a 6-dp-rounded pinned fold.
    * The matrix travels as ONE array<array<double>> literal (dims² ≈ 32 KB
    * at 64 dims — plan-constant, broadcast with the task binary, no join);
    * the fold is a HOF over the literal, so the rotation runs in-task
    * inside the scan stage — zero shuffle, the randomProjection shape with
    * a data-learned matrix instead of a fixed lattice. */
  def rotateVec(vecCol: String, r: Array[Array[Double]]): Column = {
    val dims = r.length
    val rl = typedLit(r.map(_.toSeq).toSeq)
    transform(sequence(lit(0), lit(dims - 1)), j =>
      round(aggregate(sequence(lit(0), lit(r.head.length - 1)), lit(0.0),
        (acc, i) => acc + get(col(vecCol), i).cast("double") * get(get(rl, j), i)), 6))
  }

  /** PQ asymmetric-distance (ADC) top-k: approximate squared L2 between a
    * query and a candidate = the sum over subspaces of the exact distance
    * from the query's sub-vector to the candidate's CODE centroid — the
    * candidate's full vector is never read at serve time, only its m
    * codes (the 64-dim float corpus becomes an m-byte code table).
    *
    * The per-(query, subspace, anchor) distance table is queries × m × k
    * rows — tiny; the serve join is codes ⋈ table on (sub, code), then a
    * per-(query, candidate) sum of m 6-dp-rounded distances carried in
    * exact DECIMAL (order-independent, so the approximate distance is
    * reproducible across engines and partitionings). Top-k by (distance,
    * candidate id). */
  def pqTopK(codes: DataFrame, codebook: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, m: Int, subDim: Int,
             k: Int, blockCol: Option[String] = None, dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    requirePqDims(m, subDim, dims)
    // blockCol (an LSH bucket / IVF cell both sides carry) turns the ADC
    // scan from corpus-per-query into bucket-per-query: without it BOTH
    // sides of the (sub, code) join grow with the corpus and the pair
    // count is quadratic — the coarse-quantizer half of a FAISS-style
    // IVF-PQ/LSH-PQ index is what keeps PQ serving sublinear at scale
    val table = queries
      .select((col(idCol).as("q_id") +: col(vecCol).as("q_vec") +:
        blockCol.map(col).toSeq): _*)
      .withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
      .crossJoin(broadcast(codebook))
      .select((col("q_id") +: col("sub") +: col("anchor_id").as("code") +:
        subDist2("q_vec", "anchor_vec", "sub", subDim)
          .cast(DecimalType(18, 6)).as("dd") +: blockCol.map(col).toSeq): _*)
    val scored = table.join(codes, blockCol.toSeq ++ Seq("sub", "code"))
      .filter(col("q_id") =!= col(idCol))
      .groupBy(col("q_id"), col(idCol).as("c_id"))
      .agg(sum(col("dd")).as("s_dec"))
      .withColumn("approx_d2", col("s_dec").cast(DoubleType))
    val w = Window.partitionBy("q_id").orderBy(col("approx_d2").asc, col("c_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "approx_d2")
  }
}
