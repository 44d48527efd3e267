package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic sampling / split assignment for training-data curation.
  *
  * Corpus splits (train/val/test) and downsampling must be REPRODUCIBLE:
  * the same document must land in the same split on every run, every
  * engine, and every cluster size. `rand()`/`df.sample` are none of those
  * (seed- and partitioning-dependent), so everything here derives from the
  * md5 of a stable key — a pure, codegen-friendly column expression with
  * zero shuffle cost, and replayable in any engine with an md5 function.
  */
object Sampling {

  /** Stable bucket in [0, buckets): first 8 md5 hex digits of the key as
    * an integer, mod buckets. Uniform enough for splitting; bit-identical
    * everywhere (DuckDB: `('0x' || substring(md5(k), 1, 8))::BIGINT`). */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast(LongType),
      lit(buckets.toLong))

  /** Deterministic train/val/test assignment by percent thresholds. A null
    * key yields a NULL split, never a silent bucket: `otherwise("test")`
    * would route every null-keyed row into the test split — invisible
    * skew/leakage in exactly the op whose contract is correct assignment. */
  def splitAssign(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(key, 100)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .when(b.isNotNull, lit("test"))
  }

  /** Deterministic per-mille downsample — the constant-rate special case
    * of [[mixtureSample]]. A 1000-bucket space keeps sub-percent rates
    * expressible; the filter is a scan-level predicate, not a pass. */
  def sampleByHash(df: DataFrame, key: Column, permille: Int): DataFrame =
    mixtureSample(df, key, lit(permille))

  /** Mixture sampling: keep each row with a per-row rate (per-mille),
    * deterministically — the source-reweighting curation op ("80% of
    * src A, 10% of src B" corpus recipes). `ratePermille` is any column
    * expression (typically a when-ladder over the source column), so the
    * recipe stays a pure codegen'd predicate at the scan. */
  def mixtureSample(df: DataFrame, key: Column, ratePermille: Column): DataFrame =
    df.filter(hashBucket(key, 1000) < ratePermille)

  /** Stratified cap: keep at most `n` rows per group, chosen by md5 order
    * of the key — a deterministic "random" subset per stratum (the
    * cap-documents-per-domain curation op). The md5 string itself is the
    * sort key (lowercase hex in every engine), with the raw key as
    * tiebreaker for the total order.
    *
    * Scale shape: the stratum key is LOW-cardinality (a handful of
    * sources over a 100-TB corpus), so the naive `row_number() OVER
    * (PARTITION BY group ...)` would funnel each source's ENTIRE corpus
    * through one window task. This rides [[Relational.groupedTopK]]
    * instead: a salted local top-n bounds every task at 1/salts of a
    * stratum, then the exact rank replays on ≤ n·salts survivors per
    * group — identical rows to the naive window (spec-matched), never a
    * whole-stratum sort. */
  def capPerGroup(df: DataFrame, group: Column, key: Column, n: Int): DataFrame = {
    val reserved = Seq("__cap_g", "__cap_rn")
    require(!df.columns.exists(c => reserved.contains(c.toLowerCase)),
      s"column names ${reserved.mkString("/")} are reserved")
    Relational.groupedTopK(
        df.withColumn("__cap_g", group),
        groups = Seq("__cap_g"),
        keyCol = key,
        order = Seq(md5(key.cast("string")), key),
        k = n, out = "__cap_rn")
      .drop("__cap_g", "__cap_rn")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * each row draws a deterministic uniform u ∈ (0, 1] from md5 of its
    * key and scores ln(u)/w — the k LARGEST scores are a weighted sample
    * without replacement (equivalent to ranking u^(1/w), row selection
    * probability proportional to weight at each draw). This is THE
    * distributed form of weighted sampling: one scan computes every key,
    * `orderBy(...).limit(k)` plans as TakeOrderedAndProject — each
    * partition keeps its local top-k and a single reducer merges k·P
    * candidate rows, so no full sort and no corpus shuffle ever happens.
    * The score is snapshot at DECIMAL(18,12) so the selected SET is
    * reproducible across engines and cluster sizes; ties break by key.
    * The scale matters: casting double→DECIMAL is only engine-stable
    * while 10^scale × value is far from half-boundaries relative to the
    * scaling arithmetic's own rounding error — at scale 18 DuckDB's
    * binary 10^18 multiply wobbles the boundary decision ~1e-2 per row
    * (a 3%-per-row hash-flip rate, observed); at scale 12 the wobble is
    * ~1e-8 and also safely absorbs any 1-ulp cross-libm ln() drift.
    * Weights must be positive. The md5-uniform makes
    * the sample a pure function of the data — re-running the pipeline on
    * the same corpus selects the same rows (the same property z5/z6 build
    * splits and caps on). Scale-invariant: multiplying all weights by a
    * constant c rescales every score by 1/c and preserves the order, so
    * the selection depends only on RELATIVE weights. */
  /** The Efraimidis–Spirakis selection key ln(u)/w as a pure column:
    * u ∈ (0, 1] is a deterministic md5-uniform of the key, and the score
    * is snapshot at DECIMAL(18,12) (engine-stable; see weightedReservoir).
    * Shared by the global (weightedReservoir) and per-group
    * (Relational.groupedTopK over this key) sampling paths. The
    * positive-weight contract is ENFORCED, not just documented: a weight
    * ≤ 0 raises (a negative weight would flip ln(u)/w positive and
    * deterministically outrank every legitimate row; a zero weight would
    * yield a null score that silently never samples — both are corrupt
    * upstream data the sample must not absorb quietly). */
  def esKey(key: Column, weight: Column): Column = {
    // (h+1)/2^32 ∈ (0, 1]: h is hash32's 32-bit value; +1 avoids ln(0)
    val u = (TextAnalysis.hash32(key.cast("string")) + lit(1L)).cast("double") /
      lit(4294967296.0)
    val w = when(weight > 0, weight).otherwise(raise_error(concat(
      lit("esKey: weight must be positive, got "), weight.cast("string"))))
    (log(u) / w).cast("decimal(18,12)")
  }

  def weightedReservoir(df: DataFrame, key: Column, weight: Column, k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    df.withColumn("es_key", esKey(key, weight))
      .orderBy(col("es_key").desc, key)
      .limit(k)
  }

  /** Token-budget mixture allocation — the step that turns z22-style
    * temperature SHARES into an executable training recipe: given
    * per-source token counts, a global token budget, and a max-epoch cap
    * (the Llama/Pile discipline: never repeat a source more than ~4×
    * however much its share asks for), emit per source how many tokens it
    * contributes (`alloc_tokens`) and at what repeat rate (`epochs`).
    * `capped` marks sources whose temperature-flattened share exceeded
    * the epoch ceiling — the budget they could not absorb is reported,
    * not silently redistributed (a second proportional pass is a rerun of
    * this operator on the uncapped remainder).
    *
    * Float discipline (z22's): the weight is sqrt(n_tokens) — one
    * correctly-rounded op — snapshot at DECIMAL(18,8); the normalizer is
    * an exact decimal sum (shuffle-order-independent); share and
    * target_tokens are computed in two deterministic double ops and
    * floored to exact BIGINTs, after which the cap and allocation are
    * integer arithmetic; `epochs` is one raw IEEE division at the output
    * boundary. Scale: `stats` is source-level (a handful of rows at any
    * corpus size) — the one-row budget/normalizer cross-join broadcasts.
    *
    * `budget`: one-row frame with a BIGINT `budget_tokens` column
    * (typically an aggregate of `stats` itself, or a constant). */
  def tokenBudget(stats: DataFrame, keyCol: String, tokensCol: String,
                  budget: DataFrame, maxEpochs: Int = 4): DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    // a zero-token source is corrupt upstream data: its share is 0 but
    // `epochs` would be 0/0 = NaN, which silently poisons any downstream
    // comparison (NaN breaks both < and >=) — raise like esKey does
    val guarded = when(col(tokensCol) > 0, col(tokensCol))
      .otherwise(raise_error(concat(
        lit("tokenBudget: token count must be positive, got "),
        col(tokensCol).cast("string"))))
    val w = stats.withColumn("__w_dec",
      sqrt(guarded.cast("double")).cast("decimal(18,8)"))
    val tot = w.agg(sum(col("__w_dec")).as("__w_tot"))
    w.crossJoin(broadcast(tot)).crossJoin(broadcast(budget))
      .withColumn("share",
        col("__w_dec").cast("double") / col("__w_tot").cast("double"))
      .withColumn("target_tokens",
        floor(col("share") * col("budget_tokens").cast("double")))
      .withColumn("alloc_tokens",
        least(col("target_tokens"), col(tokensCol) * maxEpochs))
      .withColumn("epochs",
        col("alloc_tokens").cast("double") / col(tokensCol))
      .withColumn("capped", col("target_tokens") > col(tokensCol) * maxEpochs)
      .drop("__w_dec", "__w_tot")
  }

  /** Balanced shard assignment — the writer-side step after packing:
    * round-robin over the GLOBAL token-size-descending order, so each of
    * `nShards` output shards lands within one max-document of the mean
    * token load (the greedy balance data-parallel training needs; plain
    * `doc_id % n` leaves whatever size skew the id order carries).
    *
    * The global rank is NOT a corpus window function: it rides
    * [[Relational.runningTotal]]'s two-pass range-partition offsets
    * (bounded per-partition sorts, one partition-count-sized offset
    * table), so the corpus never funnels through one task. Deterministic:
    * rank ties break on `keyCols`. Adds `shard` ∈ [0, nShards). */
  def shardAssign(df: DataFrame, keyCols: Seq[String], tokensCol: String,
                  nShards: Int): DataFrame = {
    require(nShards >= 1, s"shard count must be positive, got $nShards")
    val reserved = Seq("__negt", "__one", "__rank")
    require(!df.columns.exists(c => reserved.contains(c.toLowerCase)),
      s"column names ${reserved.mkString("/")} are reserved")
    Relational.runningTotal(
        df.withColumn("__negt", -col(tokensCol)).withColumn("__one", lit(1L)),
        order = Seq("__negt") ++ keyCols, valueCol = "__one", out = "__rank")
      .withColumn("shard", ((col("__rank") - 1) % nShards).cast("int"))
      .drop("__negt", "__one", "__rank")
  }
}
