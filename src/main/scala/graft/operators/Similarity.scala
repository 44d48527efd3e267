package graft.operators

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

  /** Number of LSH hyperplanes (bucket signature bits). */
  val NumPlanes = 8

  /** Deterministic pseudo-random hyperplane weight: plane j, dimension i. */
  def planeWeight(i: Int, j: Int): Int = ((i * 31 + j * 17) % 7) - 3

  /** Signed-projection bucket id (0..2^NumPlanes-1) for a 64-dim float
    * vector column: bit j = [dot(vec, plane_j) > 0]. */
  def hyperplaneBucket(vecCol: String, dims: Int = 64): Column = {
    val bits = (0 until NumPlanes).map { j =>
      val dotJ = expr(
        s"""aggregate(sequence(0, ${dims - 1}), CAST(0 AS DOUBLE),
           |  (acc, i) -> acc + CAST($vecCol[i] AS DOUBLE)
           |                    * CAST((i * 31 + $j * 17) % 7 - 3 AS DOUBLE))""".stripMargin)
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
                vecCol: String): DataFrame = {
    val withAnchor = vectors.crossJoin(broadcast(anchors))
      .withColumn("d2", round(
        dot(vecCol, vecCol) - lit(2.0) * dot(vecCol, "anchor_vec")
          + dot("anchor_vec", "anchor_vec"), 6))
    val w = Window.partitionBy(idCol).orderBy(col("d2").asc, col("anchor_id").asc)
    withAnchor
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(vecCol), col("anchor_id").as("cell"))
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

  /** IVF ANN: assign every vector to its anchor cell, then top-k by cosine
    * within the query's own cell — the coarse-quantizer shape of FAISS-style
    * IVF flat, as one bucket equi-join (no cross product). Anchors here are
    * seeded deterministic vectors; production would Lloyd-refine them. */
  def ivfTopK(vectors: DataFrame, anchors: DataFrame, queryIds: Column => Column,
              idCol: String, vecCol: String, k: Int): DataFrame = {
    val assigned = ivfAssign(vectors, anchors, idCol, vecCol)
      .withColumn("nrm", norm(vecCol))
    val q = assigned.filter(queryIds(col(idCol)))
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        col("nrm").as("q_nrm"), col("cell"))
    val c = assigned.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
      col("nrm").as("c_nrm"), col("cell"))
    val scored = broadcast(q).join(c, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", round(dot("q_vec", "c_vec") / (col("q_nrm") * col("c_nrm")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "cell", "rank", "c_id", "cosine")
  }

  /** Bucketed ANN: top-k within the query vector's own bucket. Same output
    * shape as bruteForceTopK; recall trades against the pruned search space
    * (multi-probe = union over neighboring buckets, not implemented here). */
  def bucketedTopK(vectors: DataFrame, queryIds: Column => Column, idCol: String,
                   vecCol: String, k: Int): DataFrame = {
    val bucketed = vectors
      .select(col(idCol), col(vecCol))
      .withColumn("bucket", hyperplaneBucket(vecCol))
      .withColumn("nrm", norm(vecCol))
    val q = bucketed.filter(queryIds(col(idCol)))
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        col("nrm").as("q_nrm"), col("bucket"))
    val c = bucketed.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
      col("nrm").as("c_nrm"), col("bucket"))
    val scored = broadcast(q).join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", round(dot("q_vec", "c_vec") / (col("q_nrm") * col("c_nrm")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "bucket", "rank", "c_id", "cosine")
  }
}
