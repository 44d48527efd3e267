package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Count-based bigram language-model operators — the ONE implementation
  * behind the batch held-out scorer (z41/x32b) and the streaming
  * perplexity gate, so the model format and the scoring formula can never
  * drift between them.
  *
  * The fitted model is a single relation: the (prev, cur, n_bg) bigram
  * count table. Every other statistic interpolated Kneser–Ney needs —
  * c(w1·), N1+(w1·), N1+(·w2), N1+(··), |continuation vocab| — is an
  * AGGREGATE of it, which is exactly what count-based LM toolkits
  * serialize. At 100 TB the table shards by key hash through the Store
  * (see PipelineQueries.knModelStored); the derivations here are
  * model-sized, never corpus-sized.
  */
object Lm {

  /** Per-position bigram token stream (idCol, prev, cur): one in-scan
    * explode, no shuffle. Docs under 2 words have no bigrams and are
    * absent. */
  def bigramTokens(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = docs
    .select(col(idCol), split(col(textCol), " ").as("ws"))
    .filter(size(col("ws")) >= 2)
    .select(col(idCol), explode(expr(
      "transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS prev, ws[i] AS cur))")).as("b"))
    .select(col(idCol), col("b.prev").as("prev"), col("b.cur").as("cur"))

  /** Fit: the (prev, cur, n_bg) count table — THE model. Map-side
    * combinable; grows with the observed-bigram space (Heaps' law), so
    * joins against it stay UNHINTED downstream. */
  def bigramCounts(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    bigramTokens(docs, idCol, textCol).groupBy("prev", "cur")
      .agg(count(lit(1)).as("n_bg"))

  /** Incremental model maintenance — the E2 lifecycle for the fitted LM:
    * merge an arriving batch's bigram counts into an existing model by
    * union + re-aggregation. Counts are additive, so fit(A) merged with
    * counts(B) EQUALS fit(A ∪ B) exactly (spec-gated) — the property
    * that lets a production reference model track a growing clean corpus
    * without refitting from scratch. Map-side combinable; at warehouse
    * scale the result lands back through the Store's partition overwrite
    * (both sides shard by the same key hash, so the merge shuffle is
    * partition-aligned). */
  def mergeCounts(model: DataFrame, batchCounts: DataFrame): DataFrame =
    model.select("prev", "cur", "n_bg")
      .unionByName(batchCounts.select("prev", "cur", "n_bg"))
      .groupBy("prev", "cur")
      .agg(sum(col("n_bg")).cast(LongType).as("n_bg"))

  /** Model-derived per-prev stats: c(w1·) and N1+(w1·) in one aggregate. */
  def prevStats(model: DataFrame): DataFrame =
    model.groupBy("prev").agg(
      sum(col("n_bg")).cast(LongType).as("n_prev"),
      count(lit(1)).cast(LongType).as("n1_fwd"))

  /** Model-derived continuation counts N1+(·w2). */
  def contStats(model: DataFrame): DataFrame =
    model.groupBy("cur").agg(count(lit(1)).cast(LongType).as("n1_bwd"))

  /** The interpolated-KN probability for one (possibly unseen) bigram
    * against fitted stats — all inputs are columns from LEFT joins, so
    * unseen events stay representable:
    *  - unseen bigram, seen prev: max(c−d,0) term is 0, the score is the
    *    backoff mass d·N1+(w1·)/c(w1·) times the continuation
    *    probability — interpolated KN's own floor;
    *  - unseen prev: the continuation probability alone;
    *  - unseen cur: the continuation rides an add-one floor,
    *    Pc(w2) = (N1+(·w2)+1)/(N1+(··)+V) — strictly positive, so ln
    *    never sees 0.
    * d = 0.75 (dyadic — exact against integer counts); the expression is
    * a pinned IEEE tree, identical in both engines. `n1Tot`/`vCont` are
    * the two model scalars (one-row aggregate — a driver literal in the
    * streaming gate, a broadcast row in batch). */
  def pknExpr(nBg: org.apache.spark.sql.Column, nPrev: org.apache.spark.sql.Column,
              n1Fwd: org.apache.spark.sql.Column, n1Bwd: org.apache.spark.sql.Column,
              n1Tot: org.apache.spark.sql.Column,
              vCont: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val pcont = (coalesce(n1Bwd, lit(0L)) + lit(1L)) / (n1Tot + vCont)
    when(nPrev.isNull, pcont)
      .otherwise(
        greatest(coalesce(nBg, lit(0L)).cast("double") - lit(0.75), lit(0.0))
          / nPrev
          + (lit(0.75) * n1Fwd / nPrev) * pcont)
  }

  /** Score `docs` against a fitted model: per doc, bigram count, count of
    * bigrams ABSENT from the model (the coverage/domain-drift
    * diagnostic), and the mean KN log-probability. ln snapshots at
    * DECIMAL(12,6) and sums exactly (the z15/z17 discipline); one IEEE
    * division at the boundary. Model aggregates are model-sized and
    * UNHINTED; only the one-row totals broadcast by hint. */
  def heldoutScored(model: DataFrame, docs: DataFrame,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val bg = bigramTokens(docs, idCol, textCol)
    val nt = model.agg(count(lit(1)).cast(LongType).as("n1_tot"),
      countDistinct(col("cur")).cast(LongType).as("v_cont"))
    bg.join(model, Seq("prev", "cur"), "left")
      .join(prevStats(model), Seq("prev"), "left")
      .join(contStats(model), Seq("cur"), "left")
      .crossJoin(broadcast(nt))
      .withColumn("pkn", pknExpr(col("n_bg"), col("n_prev"), col("n1_fwd"),
        col("n1_bwd"), col("n1_tot"), col("v_cont")))
      .withColumn("lp", log(col("pkn")).cast("decimal(12,6)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        sum(when(col("n_bg").isNull, 1).otherwise(0)).cast("int").as("n_unseen"),
        (sum(col("lp")).cast("double") / count(lit(1))).as("avg_kn_logprob"))
  }
}
