package graft.queries

import graft.Tables
import graft.operators.{Dedup, Multimodal, Relational, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale training-data-pipeline operators (the 100-TB extension layer
  * beyond the reference's own workload): deduplication (exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding near-dup), similarity search
  * (brute-force and LSH-bucketed ANN), text analysis (language ID, quality
  * scoring, token counting, fingerprinting), and multimodal binary-column
  * plumbing.
  *
  * Corpus notes that shaped these queries: `documents.text` is single-space
  * word salad over a ~31-word vocabulary, so MinHash runs over 3-gram
  * shingle hashes (word-level signatures would put every doc in one LSH
  * bucket — the 100-TB skew lesson in miniature), and similarity queries
  * emit ranked top-K (no threshold clears the corpus's max cosine).
  *
  * Oracle style: DuckDB lambdas (`list_transform`/`list_reduce`) replicate
  * Spark's `aggregate` fold element-for-element, so double results are
  * bit-identical, not merely close.
  */
object PipelineQueries {

  /** DuckDB rendering of TextAnalysis.hash32 (first 8 md5 hex digits). */
  private def h32Sql(v: String): String =
    s"('0x' || substring(md5($v), 1, 8))::BIGINT"

  /** DuckDB rendering of TextAnalysis.hash32b (second 8 md5 hex digits —
    * the low half of the 64-bit element hash). */
  private def h32bSql(v: String): String =
    s"('0x' || substring(md5($v), 9, 8))::BIGINT"

  /** DuckDB 64 bit-sum columns b0..b63 over (hv_hi, hv_lo) halves, and the
    * signed-BIGINT packing — the oracle rendering of Dedup.simhash64
    * (bit 63's coefficient prints as Long.MinValue; adding distinct powers
    * of two never carries, so the sum stays in BIGINT range). */
  private val simhashBitSumsSql: String =
    ((0 until 32).map(j =>
      s"SUM(CASE WHEN ((hv_lo >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS b$j") ++
     (32 until 64).map(j =>
      s"SUM(CASE WHEN ((hv_hi >> ${j - 32}) & 1) = 1 THEN 1 ELSE -1 END) AS b$j"))
      .mkString(",\n    ")
  private val simhashPackedSql: String =
    (0 until 64).map(j =>
      s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")

  /** DuckDB CTEs producing distinct (doc_id [, lang], 3-gram shingle).
    * Parameterized by the source relation so the v6 capstone can run the
    * identical chain over its survivor set. */
  private def shingleCteFor(src: String, pfx: String = ""): String =
    s"""${pfx}ws AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM $src),
       |${pfx}pos AS (SELECT doc_id, lang, w, unnest(generate_series(1, len(w) - 2)) AS i FROM ${pfx}ws),
       |${pfx}sh AS (SELECT DISTINCT doc_id, lang, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM ${pfx}pos)""".stripMargin
  private val shingleCte = shingleCteFor("documents")

  /** Spark side of the same: distinct (doc_id, lang, shingle).
    * fanOut (r13): the shingle explode + md5 is the CPU-dense stage, and
    * the one-file bench corpus scans as ONE task — see Tables.fanOut. */
  private def shingles(docs: org.apache.spark.sql.DataFrame) =
    graft.Tables.fanOut(docs)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), col("lang"),
        explode(TextAnalysis.shinglesExpr("ws", 3)).as("sh"))
      .distinct()

  /** Shared oracle SQL for the 8-hash minhash signature CTEs (x2/x7). */
  private val sigCols = (0 until 8).map(i =>
    s"min((hv * ${Dedup.MinhashA(i)} + ${Dedup.MinhashB(i)}) % ${Dedup.MinhashP}) AS mh$i")
    .mkString(",\n    ")
  private def minhashCtes: String = minhashCtesFor("documents")
  private def minhashCtesFor(src: String, pfx: String = ""): String =
    s"""${shingleCteFor(src, pfx)},
       |${pfx}hv AS (SELECT DISTINCT doc_id, ${h32Sql("s")} AS hv FROM ${pfx}sh),
       |${pfx}sig AS (SELECT doc_id,
       |    $sigCols
       |  FROM ${pfx}hv GROUP BY 1)""".stripMargin

  /** Shared Spark side: 3-gram shingle hashes → 8-hash signature.
    * Deliberately NO distinct before the signature aggregate: min over a
    * multiset equals min over its set, and the signature groupBy is
    * map-side-combinable — dropping the distinct removes a full shuffle
    * of the exploded shingle relation (the widest frame in the whole LSH
    * path) from every signature consumer (x2/x7/x8/x8b/x9b/x10/x16).
    * Paths that need SET semantics (x14's sizes/intersections) build
    * their own distinct (doc_id, hv) relation. */
  private def minhashSig(s: org.apache.spark.sql.SparkSession, d: String) =
    minhashSigOf(Tables.documents(s, d))

  private def minhashSigOf(docs: org.apache.spark.sql.DataFrame) = {
    // fanOut NOT applied by default (r13 A/B: the added exchange lost —
    // x2 −0.17 s, x39 −1.3 s, x8/x24/x53/x9b −0.2–0.5 s with it off).
    // That measurement ran under the r13 session-wide 64k AQE floor; the
    // r14 profile still shows a ~2.5 s single-task signature stage at the
    // head of every minhash consumer, so the decision is re-A/B-able
    // under the 1m default via prop graft.fanout.sig (default off).
    val spread =
      if (sys.props.getOrElse("graft.fanout.sig", "off") == "on")
        graft.Tables.fanOut(docs)
      else docs
    val sh = spread
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(TextAnalysis.shinglesExpr("ws", 3)).as("sh"))
      .select(col("doc_id"), TextAnalysis.hash32(col("sh")).as("hv"))
    Dedup.minhashSignature(sh, "doc_id", 8)
  }

  // ---- dedup ----

  /** Exact dedup by content hash — one shuffle, map-side combinable. */
  private val x1ExactDedup = Q(
    (s, d) => Dedup.exactDedup(Tables.documents(s, d), "doc_id", "text")
      .orderBy("content_hash"),
    """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
      |  count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)

  /** DuckDB band relation for the 8×1 banding — shared by every oracle
    * that touches LSH candidates (x2/x10/x8/x8b/x9b) so the band/key
    * encoding can never drift between them. */
  private def bandsSqlFor(pfx: String): String = (0 until 8).map(i =>
    s"SELECT doc_id, $i AS band, mh$i AS key FROM ${pfx}sig").mkString("\n  UNION ALL ")
  private val bandsSql: String = bandsSqlFor("")

  /** Hot-bucket cap for the single-hash LSH candidate stage (x2/x8/x8b) —
    * x4's stop-shingle trick in band form: a (band, key) bucket of df docs
    * contributes df² join rows, and one boilerplate band value can make
    * the stage O(df²) on a real corpus. Measured bucket df: ≤6 at the
    * correctness SFs (cap is a NO-OP there, so recall claims stay exact)
    * and 25 at sf0.1 (cap active, worst bucket bounded). Mirrored in the
    * oracle CTEs, so correctness holds at ANY SF. */
  private val X2MaxBucket = 16L

  /** Stop-shingle df cap for exact-Jaccard paths (x4/x24) — see x4's
    * scaladoc for the measured rationale. Declared here (not next to x4)
    * because Scala vals initialize in declaration order and x24's oracle
    * string interpolates it. */
  private val X4MaxDocFreq = 8L

  /** IVF coarse-quantizer cell count for the y3 family (seed anchors =
    * the first `IvfCells` vectors). A PARAMETER, not a baked shape: every
    * anchor filter and oracle rendering derives from it, and y3e runs the
    * same serve plan at 64 cells to prove the knob turns. At production
    * scale the cell count is sized so corpus/cells stays a task-sized
    * candidate set (the per-cell population grows linearly with the
    * corpus at any fixed count). */
  private val IvfCells = 8

  /** DuckDB mirror of Dedup.pairJoin's maxBucket semi-join: the bands CTE
    * filtered to buckets at or under the cap. */
  private def cappedBandsCte(bands: String, pfx: String = ""): String =
    s"""${pfx}bands AS ($bands),
       |${pfx}kept AS (SELECT doc_id, band, key FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, key) AS df FROM ${pfx}bands)
       |  WHERE df <= $X2MaxBucket)""".stripMargin

  /** MinHash + LSH near-dup candidates: shingle explode → 8-hash signature
    * → band self-join. Never O(n²): pairs exist only where a band collides,
    * and the hot-bucket cap bounds the worst bucket. */
  private val x2MinhashLsh = {
    Q(
      (s, d) => Dedup.lshCandidates(minhashSig(s, d), "doc_id", 8,
          maxBucket = Some(X2MaxBucket))
        .orderBy("doc_a", "doc_b"),
      s"""WITH $minhashCtes,
         |${cappedBandsCte(bandsSql)}
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM kept a JOIN kept b
         |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin)
  }

  /** x10: incremental-ingest LSH — an arriving batch (doc_id % 10 = 0)
    * pairs against the existing corpus (the rest) in ONE A×B bucket join,
    * never re-pairing the corpus with itself: the per-ingest form whose
    * cost is O(batch × overlap), not O(corpus²). The hot-bucket cap
    * applies to the base side's bucket sizes (corpus boilerplate is the
    * skew source). */
  private val x10IncrementalLsh = {
    Q(
      (s, d) => {
        val sig = minhashSig(s, d)
        Dedup.lshCandidatesAgainst(
            sig.filter(col("doc_id") % 10 === 0),
            sig.filter(col("doc_id") % 10 =!= 0),
            "doc_id", 8, maxBucket = Some(X2MaxBucket))
          .orderBy("doc_new", "doc_base")
      },
      s"""WITH $minhashCtes,
         |bands AS ($bandsSql),
         |base AS (SELECT doc_id, band, key FROM (
         |    SELECT *, count(*) OVER (PARTITION BY band, key) AS df
         |    FROM bands WHERE doc_id % 10 <> 0)
         |  WHERE df <= $X2MaxBucket),
         |inc AS (SELECT doc_id, band, key FROM bands WHERE doc_id % 10 = 0)
         |SELECT DISTINCT i.doc_id AS doc_new, b.doc_id AS doc_base
         |FROM inc i JOIN base b ON i.band = b.band AND i.key = b.key
         |ORDER BY doc_new, doc_base""".stripMargin)
  }

  /** x14: signature-based Jaccard estimate vs exact — the cheap verify
    * stage between LSH candidates and exact n-gram Jaccard, both emitted
    * per candidate pair. The estimate (matching-slot fraction) and the
    * exact value (|A∩B|/|A∪B| over distinct shingle hashes) are each ONE
    * int/int division, so both engines produce bit-identical doubles —
    * the oracle replays the estimator itself, not a tolerance contract.
    * Scale: the estimate reads k longs per doc from the signature table
    * (no re-shingling); the exact stage runs only on the candidate set. */
  private val x14JaccardEstimate = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      // hv feeds FOUR consumers (signature, two intersect sides, sizes):
      // materialize it once instead of re-shingling the corpus per branch
      // (bench: 5.6 s → one shingle pass); same for the signature, which
      // the candidate and estimate stages both read. ONE distinct, on the
      // hashed (doc_id, long) relation — never on the wide shingle strings
      val hv = graft.Tables.fanOut(docs) // r13: one-file scan = one task
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(TextAnalysis.shinglesExpr("ws", 3)).as("sh"))
        .select(col("doc_id"), TextAnalysis.hash32(col("sh")).as("hv"))
        .distinct()
        .localCheckpoint(true)
      val sig = Dedup.minhashSignature(hv, "doc_id", 8).localCheckpoint(true)
      val pairs = Dedup.lshCandidates(sig, "doc_id", 8, maxBucket = Some(X2MaxBucket))
      val est = Dedup.jaccardEstimate(sig, pairs, "doc_id", 8)
      val sz = hv.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      // the b-side would otherwise shuffle the WHOLE hash relation into
      // the (doc_b, hv) join; a semi-join against the pair ids first cuts
      // that shuffle to pair members only. The pair set grows with the
      // corpus (the soak shows 10×-corpus → 10×-pairs), so it joins
      // UNHINTED — AQE broadcasts while it fits, shuffles when it doesn't
      val hvB = hv.select(col("doc_id").as("doc_b"), col("hv"))
        .join(pairs.select("doc_b").distinct(), Seq("doc_b"), "left_semi")
      val inter = pairs
        .join(hv.select(col("doc_id").as("doc_a"), col("hv")), Seq("doc_a"))
        .join(hvB, Seq("doc_b", "hv"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
      est
        .join(inter, Seq("doc_a", "doc_b"), "left")
        .withColumn("ni", coalesce(col("ni"), lit(0L)))
        .join(sz.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
        .join(sz.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (col("ni") / (col("sz_a") + col("sz_b") - col("ni"))).as("j_exact"),
          col("j_est"))
        .orderBy("doc_a", "doc_b")
    },
    s"""WITH $minhashCtes,
       |${cappedBandsCte(bandsSql)},
       |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM hv GROUP BY 1),
       |inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS ni
       |  FROM p JOIN hv ha ON ha.doc_id = p.doc_a
       |         JOIN hv hb ON hb.doc_id = p.doc_b AND hb.hv = ha.hv
       |  GROUP BY 1, 2),
       |est AS (SELECT p.doc_a, p.doc_b,
       |    (${(0 until 8).map(i => s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)").mkString(" + ")}) / 8 AS j_est
       |  FROM p JOIN sig sa ON sa.doc_id = p.doc_a
       |         JOIN sig sb ON sb.doc_id = p.doc_b)
       |SELECT e.doc_a, e.doc_b,
       |  COALESCE(i.ni, 0) / (sa.sz + sb.sz - COALESCE(i.ni, 0)) AS j_exact,
       |  e.j_est
       |FROM est e
       |LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
       |JOIN sz sa ON sa.doc_id = e.doc_a
       |JOIN sz sb ON sb.doc_id = e.doc_b
       |ORDER BY e.doc_a, e.doc_b""".stripMargin)

  /** x36: dedup threshold sweep — the tuning panel a corpus build reads
    * before fixing the near-dup Jaccard cutoff (z45's shape applied to
    * dedup): how many candidate pairs qualify as duplicates, and how many
    * documents the greedy keep-first-by-id policy would drop, at every
    * threshold t = i/20 for i ∈ 1..19. Production picks the cutoff to hit
    * a target survivor rate; without this curve the threshold is folklore.
    * Rides ONE x14-shaped pair pass (shingle hashes materialized once,
    * LSH-capped candidates, exact intersect over pair members only); the
    * 19-threshold ladder explodes over the ALREADY-REDUCED relations (the
    * pair list and the per-doc max-Jaccard), so the widest frames pay no
    * blowup and the count shuffles carry 19 keys at any corpus size. The
    * greedy policy (doc b drops iff some pair (a,b), a<b, reaches t) is
    * deliberately CC-free: it prices the cheap pairwise dedup a pipeline
    * runs when it skips clustering, and differs from x8's component
    * semantics only through id-ordering chains. Every cell is an integer
    * count or an int/int division (t itself is i/20, one correctly-rounded
    * double op in both engines) — no tolerance needed. */
  private val x36DedupThresholdSweep = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val hv = graft.Tables.fanOut(docs) // r13: one-file scan = one task
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(TextAnalysis.shinglesExpr("ws", 3)).as("sh"))
        .select(col("doc_id"), TextAnalysis.hash32(col("sh")).as("hv"))
        .distinct()
        .localCheckpoint(true)
      val sig = Dedup.minhashSignature(hv, "doc_id", 8)
      val pairs = Dedup.lshCandidates(sig, "doc_id", 8, maxBucket = Some(X2MaxBucket))
      val sz = hv.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val hvB = hv.select(col("doc_id").as("doc_b"), col("hv"))
        .join(pairs.select("doc_b").distinct(), Seq("doc_b"), "left_semi")
      val inter = pairs
        .join(hv.select(col("doc_id").as("doc_a"), col("hv")), Seq("doc_a"))
        .join(hvB, Seq("doc_b", "hv"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
      val jpairs = pairs
        .join(inter, Seq("doc_a", "doc_b"), "left")
        .withColumn("ni", coalesce(col("ni"), lit(0L)))
        .join(sz.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
        .join(sz.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (col("ni") / (col("sz_a") + col("sz_b") - col("ni"))).as("j"))
      val jmax = jpairs.groupBy("doc_b").agg(max(col("j")).as("jmax"))
      val pc = jpairs
        .select(explode(sequence(lit(1), lit(19))).as("i"), col("j"))
        .groupBy("i")
        .agg(sum(when(col("j") >= col("i") / lit(20), 1L).otherwise(0L))
          .as("n_pairs_dup"))
      val dc = jmax
        .select(explode(sequence(lit(1), lit(19))).as("i"), col("jmax"))
        .groupBy("i")
        .agg(sum(when(col("jmax") >= col("i") / lit(20), 1L).otherwise(0L))
          .as("n_docs_dropped"))
      val tot = docs.agg(count(lit(1)).as("n_total"))
      tot.select(explode(sequence(lit(1), lit(19))).as("i"), col("n_total"))
        .join(pc, Seq("i"), "left").join(dc, Seq("i"), "left")
        .withColumn("n_pairs_dup", coalesce(col("n_pairs_dup"), lit(0L)))
        .withColumn("n_docs_dropped", coalesce(col("n_docs_dropped"), lit(0L)))
        .select((col("i") / lit(20)).as("t"), col("n_pairs_dup"),
          col("n_docs_dropped"),
          (col("n_total") - col("n_docs_dropped")).as("n_survivors"),
          ((col("n_total") - col("n_docs_dropped")) / col("n_total"))
            .as("survivor_frac"))
        .orderBy("t")
    },
    s"""WITH $minhashCtes,
       |${cappedBandsCte(bandsSql)},
       |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM hv GROUP BY 1),
       |inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS ni
       |  FROM p JOIN hv ha ON ha.doc_id = p.doc_a
       |         JOIN hv hb ON hb.doc_id = p.doc_b AND hb.hv = ha.hv
       |  GROUP BY 1, 2),
       |jp AS (SELECT p.doc_a, p.doc_b,
       |    COALESCE(i.ni, 0) / (sa.sz + sb.sz - COALESCE(i.ni, 0)) AS j
       |  FROM p
       |  LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
       |  JOIN sz sa ON sa.doc_id = p.doc_a
       |  JOIN sz sb ON sb.doc_id = p.doc_b),
       |jmax AS (SELECT doc_b, MAX(j) AS jmax FROM jp GROUP BY 1),
       |grid AS (SELECT unnest(generate_series(1, 19)) AS i),
       |tot AS (SELECT COUNT(*) AS n_total FROM documents),
       |pc AS (SELECT g.i,
       |    CAST(SUM(CASE WHEN jp.j >= g.i / 20 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_pairs_dup
       |  FROM grid g CROSS JOIN jp GROUP BY 1),
       |dc AS (SELECT g.i,
       |    CAST(SUM(CASE WHEN m.jmax >= g.i / 20 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_docs_dropped
       |  FROM grid g CROSS JOIN jmax m GROUP BY 1)
       |SELECT g.i / 20 AS t,
       |  COALESCE(pc.n_pairs_dup, 0) AS n_pairs_dup,
       |  COALESCE(dc.n_docs_dropped, 0) AS n_docs_dropped,
       |  tot.n_total - COALESCE(dc.n_docs_dropped, 0) AS n_survivors,
       |  (tot.n_total - COALESCE(dc.n_docs_dropped, 0)) / tot.n_total
       |    AS survivor_frac
       |FROM grid g CROSS JOIN tot
       |LEFT JOIN pc ON pc.i = g.i
       |LEFT JOIN dc ON dc.i = g.i
       |ORDER BY t""".stripMargin)

  /** x24: LSH quality evaluation — the harness that tells you whether the
    * dedup stage is ANY GOOD: precision/recall of the capped MinHash-LSH
    * candidate generator against exact shingle-Jaccard ground truth, at
    * three duplicate thresholds. Everything runs in the stop-shingle-capped
    * space (df ≤ X4MaxDocFreq, x4's knob): the df cap bounds the truth
    * side's inverted-index self-join the same way it bounds x4 — J > 0
    * requires a shared kept shingle, so the hv self-join enumerates exactly
    * the nonzero pairs, never a cross product — and building the signature
    * from the SAME capped relation keeps the recall semantics internally
    * consistent (both sides measure the capped space). A doc-level sample
    * is the WRONG eval design — independent sampling keeps a true pair only
    * at rate p², so the measured 25-pair truth set would shrink to ~1.
    * A candidate pair that shares NO kept shingle (pure minhash collision)
    * is scored j=0 via the full outer join, so false positives are counted
    * honestly. Every output cell is an integer count or an int/int
    * division — deterministic across engines, no tolerance needed. */
  private val x24LshEval = Q(
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      // ONE shingle pass (checkpointed) feeds the df cap AND every capped
      // consumer — without it the explode would run once for the df table
      // and once for the capped relation; the capped join itself stays
      // lazy (a cheap broadcast probe per consumer beats a second
      // materialization of the whole relation)
      val hv0 = docs
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(TextAnalysis.shinglesExpr("ws", 3)).as("sh"))
        .select(col("doc_id"), TextAnalysis.hash32(col("sh")).as("hv"))
        .distinct()
        .localCheckpoint(true)
      val hdf = hv0.groupBy("hv").agg(count(lit(1)).as("__df"))
      // kept-shingle set is vocabulary-sized (grows with the corpus):
      // unhinted, per the shingleJaccardPairs rule
      val hv = hv0
        .join(hdf.filter(col("__df") <= X4MaxDocFreq).select("hv"), Seq("hv"))
      val sig = Dedup.minhashSignature(hv, "doc_id", 8)
      val cand = Dedup.lshCandidates(sig, "doc_id", 8, maxBucket = Some(X2MaxBucket))
      val sz = hv.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val co = hv.select(col("doc_id").as("doc_a"), col("hv"))
        .join(hv.select(col("doc_id").as("doc_b"), col("hv")), Seq("hv"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
      val jx = co
        .join(sz.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
        .join(sz.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (col("ni") / (col("sz_a") + col("sz_b") - col("ni"))).as("j"))
      val u = jx.join(cand.withColumn("c", lit(true)), Seq("doc_a", "doc_b"), "full")
        .select(coalesce(col("j"), lit(0.0)).as("j"),
          coalesce(col("c"), lit(false)).as("cand"))
      val taus = Seq(0.3, 0.5, 0.7).toDF("tau")
      u.join(broadcast(taus))
        .groupBy("tau")
        .agg(
          sum(when(col("j") >= col("tau"), 1L).otherwise(0L)).as("n_truth"),
          sum(when(col("cand"), 1L).otherwise(0L)).as("n_cand"),
          sum(when(col("cand") && col("j") >= col("tau"), 1L).otherwise(0L)).as("tp"))
        .select(col("tau"), col("n_truth"), col("n_cand"), col("tp"),
          (col("n_cand") - col("tp")).as("fp"),
          (col("n_truth") - col("tp")).as("fn"),
          round(when(col("n_cand") > 0,
            col("tp").cast("double") / col("n_cand")), 4).as("prec"),
          round(when(col("n_truth") > 0,
            col("tp").cast("double") / col("n_truth")), 4).as("rec"))
        .orderBy("tau")
    },
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |pos AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
       |  FROM ws WHERE len(w) >= 3),
       |shs AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM pos),
       |hv0 AS (SELECT DISTINCT doc_id, ${h32Sql("s")} AS hv FROM shs),
       |hdf AS (SELECT hv, count(*) AS df FROM hv0 GROUP BY 1),
       |hv AS (SELECT hv0.doc_id, hv0.hv FROM hv0
       |  JOIN hdf ON hdf.hv = hv0.hv WHERE hdf.df <= $X4MaxDocFreq),
       |sig AS (SELECT doc_id,
       |    $sigCols
       |  FROM hv GROUP BY 1),
       |bands AS ($bandsSql),
       |kept AS (SELECT doc_id, band, key FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, key) AS df FROM bands)
       |  WHERE df <= $X2MaxBucket),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, count(*) AS sz FROM hv GROUP BY 1),
       |co AS (SELECT ha.doc_id AS doc_a, hb.doc_id AS doc_b, count(*) AS ni
       |  FROM hv ha JOIN hv hb ON ha.hv = hb.hv AND ha.doc_id < hb.doc_id
       |  GROUP BY 1, 2),
       |jx AS (SELECT co.doc_a, co.doc_b,
       |    co.ni / (sa.sz + sb.sz - co.ni) AS j
       |  FROM co JOIN sz sa ON sa.doc_id = co.doc_a
       |          JOIN sz sb ON sb.doc_id = co.doc_b),
       |u AS (SELECT COALESCE(jx.j, 0.0) AS j, (c.doc_a IS NOT NULL) AS cand
       |  FROM jx FULL JOIN cand c ON jx.doc_a = c.doc_a AND jx.doc_b = c.doc_b),
       |t AS (SELECT CAST(unnest([0.3, 0.5, 0.7]) AS DOUBLE) AS tau),
       |g AS (SELECT t.tau,
       |    CAST(sum(CASE WHEN u.j >= t.tau THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
       |    CAST(sum(CASE WHEN u.cand THEN 1 ELSE 0 END) AS BIGINT) AS n_cand,
       |    CAST(sum(CASE WHEN u.cand AND u.j >= t.tau THEN 1 ELSE 0 END) AS BIGINT) AS tp
       |  FROM t CROSS JOIN u GROUP BY t.tau)
       |SELECT tau, n_truth, n_cand, tp,
       |  n_cand - tp AS fp, n_truth - tp AS fn,
       |  ROUND(CASE WHEN n_cand > 0 THEN CAST(tp AS DOUBLE) / n_cand END, 4) AS prec,
       |  ROUND(CASE WHEN n_truth > 0 THEN CAST(tp AS DOUBLE) / n_truth END, 4) AS rec
       |FROM g ORDER BY tau""".stripMargin)

  /** x26: LSH parameter planner — the S-curve table that justifies a
    * banding choice BEFORE burning a corpus pass: candidate probability
    * p = 1 − (1 − J^r)^b for every (bands b × rows r) split of the 8-hash
    * signature budget, over a Jaccard grid. This is the design tool behind
    * x2/x7's 8×1 banding and x24's measured recall: read the row where
    * J = your dup threshold and pick the (b, r) whose p is steep there.
    * Powers unroll as PINNED multiplication chains (q2=q·q, q4=q2·q2,
    * q8=q4·q4) — `pow()` is libm and not engine-stable, a multiply chain
    * is — so both engines produce identical doubles with no rounding.
    * Pure literal-grid compute: zero table scans at any scale. */
  /** Pinned multiply-chain S-curve probability 1 − (1 − J^r)^b over the
    * (b, r) ∈ {(8,1), (4,2), (2,4)} config grid (`b`/`r` columns in
    * scope) — ONE definition shared by x26 (the planner table) and x33
    * (the applied choice) so the curve math can never drift. */
  private def sCurvePcand(j: Column): Column = {
    val jr = when(col("r") === 1, j)
      .when(col("r") === 2, j * j)
      .otherwise((j * j) * (j * j))
    val q = lit(1.0) - jr
    val qb = when(col("b") === 2, q * q)
      .when(col("b") === 4, (q * q) * (q * q))
      .otherwise(((q * q) * (q * q)) * ((q * q) * (q * q)))
    lit(1.0) - qb
  }

  private val x26LshPlanner = Q(
    (s, d) => {
      import s.implicits._
      val js = (1 to 9).map(_ / 10.0).toDF("j")
      val cfgs = Seq((8, 1), (4, 2), (2, 4)).toDF("b", "r")
      js.crossJoin(cfgs)
        .select(col("j"), col("b"), col("r"), sCurvePcand(col("j")).as("p_cand"))
        .orderBy("j", "b")
    },
    """WITH js AS (SELECT CAST(unnest([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS DOUBLE) AS j),
      |cfgs AS (SELECT * FROM (VALUES (8, 1), (4, 2), (2, 4)) AS t(b, r)),
      |g AS (SELECT j, b, r,
      |    1.0 - (CASE WHEN r = 1 THEN j WHEN r = 2 THEN j * j
      |           ELSE (j * j) * (j * j) END) AS q
      |  FROM js CROSS JOIN cfgs)
      |SELECT j, b, r,
      |  1.0 - (CASE WHEN b = 2 THEN q * q WHEN b = 4 THEN (q * q) * (q * q)
      |         ELSE ((q * q) * (q * q)) * ((q * q) * (q * q)) END) AS p_cand
      |FROM g ORDER BY j, b""".stripMargin)

  /** x33: the planner's output CONSUMED — closing the stats → chosen
    * config → measured occupancy loop that makes the scale story
    * self-tuning instead of documented. Three knob choices, all replayed
    * by the oracle:
    *  - (bands, rows): from x26's S-curve, maximize catch probability at
    *    the dup threshold (J=0.5) subject to the noise-pair cap
    *    p(J=0.2) < 0.5 — the standard recall-under-precision-budget rule
    *    (picks (4,2): 8×1 fails the noise cap, 2×4 catches 6× less);
    *  - planes: the smallest count with corpus/2^planes ≤ the target
    *    occupancy (32) — the "each added plane halves occupancy" rule
    *    y2c documents, now DERIVED from the corpus count instead of
    *    hand-picked (4 at the 500-vector correctness SFs, 6 at sf0.1's
    *    2000 — the knob visibly turns with the data);
    *  - IVF cells: the smallest power of two with corpus/cells ≤ 256
    *    (8 at the correctness SFs — exactly the IvfCells default the
    *    y3 family hand-chose).
    * The corpus count is the ONE collected scalar (metadata-sized by
    * construction — the planner IS a driver-side decision, exactly like
    * production knob selection); serving then buckets the whole corpus at
    * the chosen literal plane count and reports measured occupancy
    * against the target, with a 2× skew allowance on the mean (the
    * embedding space is clustered; multi-probe serving absorbs per-bucket
    * skew). The oracle derives the same knobs arithmetically (the weight
    * lattice is closed-form in BOTH the element and plane indices, so the
    * plane count can stay a computed value in SQL where the Spark side
    * runs the native expression at a literal). */
  private val x33PlannerApplied = Q(
    (s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val target = 32L
      val n = if (planOnly) 500L else e.count()
      val planes = (1 to graft.plans.HyperplaneBucket.MaxPlanes)
        .find(p => n <= target * (1L << p))
        .getOrElse(graft.plans.HyperplaneBucket.MaxPlanes)
      val cells = (3 to 20).map(k => 1L << k).find(c => n <= 256L * c)
        .getOrElse(1L << 20)
      val cfgs = Seq((8, 1), (4, 2), (2, 4)).toDF("b", "r")
      val grid = Seq(0.2, 0.5).toDF("j").crossJoin(cfgs)
        .select(col("b"), col("r"), col("j"), sCurvePcand(col("j")).as("p_cand"))
      val chosen = grid.groupBy("b", "r")
        .agg(max(when(col("j") === 0.5, col("p_cand"))).as("p_dup"),
          max(when(col("j") === 0.2, col("p_cand"))).as("p_noise"))
        .filter(col("p_noise") < 0.5)
        .orderBy(col("p_dup").desc, col("b"))
        .limit(1)
        .select(col("b").as("bands"), col("r").as("rows_per_band"), col("p_dup"))
      val occ = e
        .withColumn("bucket", Similarity.hyperplaneBucket("embedding", planes = planes))
        .groupBy("bucket").agg(count(lit(1)).as("c"))
      val stats = occ.agg(count(lit(1)).as("n_buckets_used"),
        max(col("c")).as("max_occ"))
      chosen.crossJoin(broadcast(stats))
        .select(lit(n).as("n_vecs"), col("bands"), col("rows_per_band"), col("p_dup"),
          lit(planes).as("planes"), lit(cells).as("cells"),
          col("n_buckets_used"), col("max_occ"),
          (lit(n) / col("n_buckets_used")).as("mean_occ"),
          (lit(n) / col("n_buckets_used") <= lit((2 * target).toDouble))
            .as("occupancy_ok"))
    },
    s"""WITH cnt AS (SELECT COUNT(*) AS n FROM embeddings),
       |pp AS (SELECT unnest(generate_series(1, ${graft.plans.HyperplaneBucket.MaxPlanes})) AS p),
       |chp AS (SELECT MIN(p) AS p FROM pp, cnt WHERE n <= 32 * (CAST(1 AS BIGINT) << p)),
       |ck AS (SELECT unnest(generate_series(3, 20)) AS k),
       |chc AS (SELECT MIN(CAST(1 AS BIGINT) << k) AS cells FROM ck, cnt
       |  WHERE n <= 256 * (CAST(1 AS BIGINT) << k)),
       |js AS (SELECT CAST(unnest([0.2, 0.5]) AS DOUBLE) AS j),
       |cfgs AS (SELECT * FROM (VALUES (8, 1), (4, 2), (2, 4)) AS t(b, r)),
       |g AS (SELECT j, b, r,
       |    1.0 - (CASE WHEN r = 1 THEN j WHEN r = 2 THEN j * j
       |           ELSE (j * j) * (j * j) END) AS q
       |  FROM js CROSS JOIN cfgs),
       |sc AS (SELECT j, b, r,
       |    1.0 - (CASE WHEN b = 2 THEN q * q WHEN b = 4 THEN (q * q) * (q * q)
       |           ELSE ((q * q) * (q * q)) * ((q * q) * (q * q)) END) AS p_cand
       |  FROM g),
       |aggc AS (SELECT b, r,
       |    MAX(CASE WHEN j = 0.5 THEN p_cand END) AS p_dup,
       |    MAX(CASE WHEN j = 0.2 THEN p_cand END) AS p_noise
       |  FROM sc GROUP BY 1, 2),
       |chosen AS (SELECT b AS bands, r AS rows_per_band, p_dup FROM aggc
       |  WHERE p_noise < 0.5 ORDER BY p_dup DESC, b LIMIT 1),
       |v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |pl AS (SELECT unnest(generate_series(0, (SELECT p FROM chp) - 1)) AS j),
       |pd AS (SELECT v.vec_id, pl.j,
       |    list_reduce(list_transform(generate_series(0, 63),
       |      i -> vd[i + 1] * CAST(CASE WHEN pl.j < 13 THEN (i * 31 + pl.j * 19) % 13 - 6
       |           ELSE (i * 29 + pl.j * 23) % 17 - 8 END AS DOUBLE)),
       |      (acc, x) -> acc + x) AS dj
       |  FROM v CROSS JOIN pl),
       |bkt AS (SELECT vec_id,
       |    CAST(SUM(CASE WHEN dj > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM pd GROUP BY 1),
       |occ AS (SELECT bucket, COUNT(*) AS c FROM bkt GROUP BY 1),
       |st AS (SELECT COUNT(*) AS n_buckets_used, MAX(c) AS max_occ FROM occ)
       |SELECT (SELECT n FROM cnt) AS n_vecs, bands, rows_per_band, p_dup,
       |  CAST((SELECT p FROM chp) AS INT) AS planes,
       |  (SELECT cells FROM chc) AS cells,
       |  n_buckets_used, max_occ,
       |  (SELECT n FROM cnt) / n_buckets_used AS mean_occ,
       |  (SELECT n FROM cnt) / n_buckets_used <= CAST(64 AS DOUBLE) AS occupancy_ok
       |FROM chosen CROSS JOIN st""".stripMargin)

  /** x16: fuzzy verify by edit distance — the string-metric rung of the
    * verify ladder: LSH candidate pairs scored by Levenshtein distance
    * over the document HEAD (first 40 chars), the cheap fuzzy-match
    * primitive entity-resolution pipelines run on names/titles. Bounding
    * the operand length bounds the O(len²) DP per pair — never run edit
    * distance on unbounded text at scale. Both engines implement the
    * classic integer DP, so the distance is exactly comparable. */
  /** Shared x16/x17 stage: capped LSH candidate pairs scored by
    * Levenshtein over the 40-char document head — ONE implementation so
    * the declared fuzzy-verify query and the curation composition can
    * never drift on the edge definition. */
  private def headEditPairs(s: SparkSession, d: String) = {
    // scoped AQE floor (r14, guide §2.5): the levenshtein-per-pair stage
    // is byte-tiny but CPU-dense — the 1m default coalesces it to one
    // task (x16 3.6 s vs 1.4 s, x17 6.4 vs 5.8, in-JVM A/B). 64k applies
    // to THIS query only; the harness sweep restores the session default.
    graft.Housekeeping.scopedConf(s,
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
    val pairs = Dedup.lshCandidates(minhashSig(s, d), "doc_id", 8,
      maxBucket = Some(X2MaxBucket))
    val heads = Tables.documents(s, d)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("head"))
    pairs
      .join(heads.select(col("doc_id").as("doc_a"), col("head").as("head_a")), Seq("doc_a"))
      .join(heads.select(col("doc_id").as("doc_b"), col("head").as("head_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("head_a"), col("head_b")).as("head_edit"))
  }

  private val x16FuzzyVerify = Q(
    (s, d) => headEditPairs(s, d)
      .withColumn("is_close", col("head_edit") <= 10)
      .orderBy("doc_a", "doc_b"),
    s"""WITH $minhashCtes,
       |${cappedBandsCte(bandsSql)},
       |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT p.doc_a, p.doc_b,
       |  CAST(levenshtein(substring(da.text, 1, 40), substring(db.text, 1, 40)) AS INT) AS head_edit,
       |  levenshtein(substring(da.text, 1, 40), substring(db.text, 1, 40)) <= 10 AS is_close
       |FROM p JOIN documents da ON da.doc_id = p.doc_a
       |       JOIN documents db ON db.doc_id = p.doc_b
       |ORDER BY p.doc_a, p.doc_b""".stripMargin)

  /** x17: curation v3 — THIS round's operators composed as one declared
    * corpus build: (1) lexical-diversity gate (type-token ratio ≥ 0.3 as
    * the INTEGER comparison 10·distinct ≥ 3·tokens — no float boundary),
    * (2) bigram-LM gate (avg conditional log-prob > −3.5, z17's
    * decimal-snapshot discipline), (3) near-dup survivors where the
    * candidate → fuzzy-verify ladder feeds clustering (capped LSH pairs,
    * kept only when the head edit distance ≤ 10, connected components,
    * keep the min-id doc per cluster), then per-language deciles over the
    * survivors. The oracle replays the entire DAG including the
    * recursive reachability fixpoint over the EDIT-DISTANCE-verified
    * edge set. */
  private val x17CurationV3 = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val lexKeep = termCounts(docs)
        .groupBy("doc_id")
        .agg(sum(col("cnt")).as("n_tok"), count(lit(1)).as("n_dis"))
        .filter(col("n_dis") * 10 >= col("n_tok") * 3)
        .select("doc_id")
      val bgKeep = bigramScored(docs)
        .groupBy("doc_id")
        .agg((sum(col("lp")).cast("double") / count(lit(1))).as("alp"))
        .filter(col("alp") > -3.5)
        .select("doc_id")
      val close = headEditPairs(s, d)
        .filter(col("head_edit") <= 10)
        .select("doc_a", "doc_b")
      val survivors = Dedup.connectedComponents(close, docs.select("doc_id"), "doc_id")
        .filter(col("doc_id") === col("cluster_id"))
        .select("doc_id")
      // scale-safe decile stage (same ids as per-lang NTILE, no
      // one-task-per-language sort — see z16); project text down to its
      // token count BEFORE the two numbering shuffles
      val kept = docs
        .join(lexKeep, Seq("doc_id"), "left_semi")
        .join(bgKeep, Seq("doc_id"), "left_semi")
        .join(survivors, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(split(col("text"), " ")).as("ws_tokens"))
      Relational.groupedNtile(kept,
          groups = Seq("lang"), order = Seq("n_chars", "doc_id"),
          n = 10, out = "decile")
        .groupBy("lang", "decile")
        .agg(count(lit(1)).as("n_docs"), sum(col("ws_tokens")).as("total_tokens"))
        .orderBy("lang", "decile")
    },
    s"""WITH RECURSIVE $minhashCtes,
       |${cappedBandsCte(bandsSql)},
       |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |close AS (SELECT p.doc_a, p.doc_b FROM p
       |  JOIN documents da ON da.doc_id = p.doc_a
       |  JOIN documents db ON db.doc_id = p.doc_b
       |  WHERE levenshtein(substring(da.text, 1, 40), substring(db.text, 1, 40)) <= 10),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM close
       |          UNION ALL SELECT doc_b, doc_a FROM close),
       |reach(node, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.node),
       |comp AS (SELECT node, min(r) AS cid FROM reach GROUP BY 1),
       |surv AS (SELECT d.doc_id FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
       |         WHERE COALESCE(comp.cid, d.doc_id) = d.doc_id),
       |tc AS (SELECT doc_id, term, COUNT(*) AS cnt
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
       |  GROUP BY 1, 2),
       |lex AS (SELECT doc_id FROM (
       |    SELECT doc_id, SUM(cnt) AS n_tok, COUNT(*) AS n_dis FROM tc GROUP BY 1)
       |  WHERE n_dis * 10 >= n_tok * 3),
       |wl AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |bpos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
       |        FROM wl WHERE len(l) >= 2),
       |bgr AS (SELECT doc_id, l[i] AS prev, l[i+1] AS cur FROM bpos),
       |bcnt AS (SELECT prev, cur, COUNT(*) AS n_bg FROM bgr GROUP BY 1, 2),
       |pcnt AS (SELECT prev, COUNT(*) AS n_prev FROM bgr GROUP BY 1),
       |bgk AS (SELECT doc_id FROM (
       |    SELECT doc_id,
       |      CAST(SUM(CAST(ln(CAST(n_bg AS DOUBLE) / n_prev) AS DECIMAL(12,6))) AS DOUBLE)
       |        / COUNT(*) AS alp
       |    FROM bgr JOIN bcnt USING (prev, cur) JOIN pcnt USING (prev)
       |    GROUP BY doc_id)
       |  WHERE alp > -3.5),
       |keptd AS (SELECT d.* FROM documents d
       |  JOIN surv USING (doc_id) JOIN lex USING (doc_id) JOIN bgk USING (doc_id)),
       |t AS (SELECT lang, CAST(len(string_split(text, ' ')) AS INT) AS ws,
       |    CAST(NTILE(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS INT) AS decile
       |  FROM keptd)
       |SELECT lang, decile, COUNT(*) AS n_docs, CAST(SUM(ws) AS BIGINT) AS total_tokens
       |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** z11: benchmark decontamination — per training document, the count of
    * its distinct 3-gram shingles that appear in the benchmark set (docs
    * with doc_id % 97 = 0 stand in for the eval suite), plus the
    * contaminated flag. The benchmark shingle set broadcasts; the scan of
    * the corpus stays linear. */
  private val z11Decontaminate = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sh = shingles(docs)
      Dedup.benchmarkOverlap(
          docs.filter(col("doc_id") % 97 =!= 0),
          sh.filter(col("doc_id") % 97 =!= 0),
          sh.filter(col("doc_id") % 97 === 0),
          "doc_id")
        .orderBy("doc_id")
    },
    s"""WITH $shingleCte,
       |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
       |ov AS (SELECT sh.doc_id, count(*) AS n_overlap
       |       FROM sh JOIN bench USING (s) WHERE sh.doc_id % 97 <> 0 GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       |  COALESCE(ov.n_overlap, 0) > 0 AS contaminated
       |FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
       |WHERE d.doc_id % 97 <> 0
       |ORDER BY d.doc_id""".stripMargin)

  /** Spark-side simhash signature frame shared by x3/x3b: 64-bit SimHash
    * per document over the distinct-word-hash set (carried as two 32-bit
    * md5 halves) — one aggregation pass with 64 partial sums. */
  private def simhashSigs(s: SparkSession, d: String) = {
    val words = Tables.documents(s, d) // no fanOut: x3/x3b regressed with it
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .select(col("doc_id"),
        TextAnalysis.hash32(col("word")).as("hv_hi"),
        TextAnalysis.hash32b(col("word")).as("hv_lo"))
      .distinct()
    Dedup.simhash64(words, "doc_id")
  }

  /** DuckDB CTE chain ending in `sh(doc_id, simhash)` — the x3 oracle. */
  private val simhashCtes: String =
    s"""wd AS (SELECT DISTINCT doc_id, ${h32Sql("w")} AS hv_hi, ${h32bSql("w")} AS hv_lo
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)),
       |bits AS (SELECT doc_id,
       |    $simhashBitSumsSql
       |  FROM wd GROUP BY 1),
       |sh AS (SELECT doc_id, CAST($simhashPackedSql AS BIGINT) AS simhash FROM bits)""".stripMargin

  private val x3Simhash = Q(
    (s, d) => simhashSigs(s, d).orderBy("doc_id"),
    s"""WITH $simhashCtes
       |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin)

  /** x3b: SimHash near-dup pairs — banded bucket join + Hamming verify,
    * summarized to a per-doc near-dup degree (the corpus's tiny vocab
    * makes SimHash pair-dense, so the declared output is the
    * 1-row-per-doc profile, with the pair relation internal). The 64-bit
    * signature gives 16-bit band keys — 65 536 bucket values per band, so
    * per-bucket population (and the pair join) stays corpus/65 536 where
    * the old 32-bit form was corpus/256. The oracle is the PLAIN
    * all-pairs Hamming join: pigeonhole makes the banded plan's recall
    * exact for hamming < bands, so matching brute force proves the
    * bucketing loses nothing. */
  private val x3bSimhashPairs = Q(
    (s, d) => {
      val pairs = Dedup.simhashPairs(simhashSigs(s, d), "doc_id")
      // symmetrize by EXPLODING each pair into both directions — a union
      // of two selects over `pairs` would plan (and execute) the whole
      // banded self-join twice
      pairs.select(explode(array(
          struct(col("doc_a").as("doc_id"), col("doc_b").as("partner"), col("hamming")),
          struct(col("doc_b").as("doc_id"), col("doc_a").as("partner"), col("hamming"))))
          .as("e"))
        .select(col("e.doc_id"), col("e.partner"), col("e.hamming").as("hamming"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_neardups"),
          min(col("partner")).as("min_partner"),
          min(col("hamming")).as("min_hamming"))
        .orderBy("doc_id")
    },
    s"""WITH $simhashCtes,
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
       |sym AS (
       |  SELECT doc_a AS doc_id, doc_b AS partner, hamming FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS doc_id, doc_a AS partner, hamming FROM pairs)
       |SELECT doc_id, COUNT(*) AS n_neardups,
       |  MIN(partner) AS min_partner,
       |  CAST(MIN(hamming) AS INT) AS min_hamming
       |FROM sym GROUP BY doc_id ORDER BY doc_id""".stripMargin)

  /** True n-gram Jaccard over the language-blocked inverted index — the
    * verify stage after LSH. Ranked top-100 (pairs are distinct so the
    * (jaccard, doc_a, doc_b) order is total → the LIMIT is deterministic).
    *
    * The stop-shingle cap (df ≤ 8) is THE 100-TB knob: a shingle in more
    * than 8 docs is boilerplate whose posting-list self-join is O(df²) and
    * whose match carries no idf signal. At the driver's correctness SFs
    * (max df = 7) the cap is a no-op; at sf0.1+ it bounds the worst bucket
    * and cuts the join work ~6×. Jaccard is a raw IEEE division of exact
    * ints (round(double, n) is not engine-stable on dyadic ratios).
    * (The X4MaxDocFreq constant itself lives next to X2MaxBucket at the
    * top of the object: vals initialize in declaration order, and x24's
    * oracle string interpolates it before this point in the file.) */
  private val x4NgramJaccard = Q(
    (s, d) => {
      val pairs = Dedup.shingleJaccardPairs(shingles(Tables.documents(s, d)), "doc_id", "lang",
        maxDocFreq = Some(X4MaxDocFreq))
      pairs.select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_a"), col("n_b"),
          col("jaccard"))
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
        .limit(100)
    },
    s"""WITH $shingleCte,
       |df AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
       |kept AS (SELECT sh.doc_id, sh.lang, sh.s FROM sh JOIN df USING (s) WHERE df <= $X4MaxDocFreq),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
       |  FROM kept a JOIN kept b
       |    ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
       |  CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
       |FROM inter
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 100""".stripMargin)

  /** z54: the n-gram OVERLAP CURVE — the memorization/contamination
    * ladder the GPT-2/3-style overlap appendices sweep: for each window
    * size n ∈ {2, 4, 8}, every held-out document (the %10 arrival slice)
    * is scored by the fraction of its n-token windows that appear
    * ANYWHERE in the training split. Small n measures vocabulary-level
    * overlap (≈1 on any same-domain corpus — the baseline that makes
    * small-n "contamination" alarms meaningless), large n measures
    * verbatim span leakage (the signal z11/x19 act on at n=8); the CURVE
    * between them is the calibration artifact that tells you which n
    * separates domain similarity from memorization risk on THIS corpus.
    * Per n: scoreable held-out docs, exact-decimal mean containment
    * (per-doc ratios snapshotted at DECIMAL(12,6) before the
    * order-sensitive sum, one IEEE division per boundary), fully-
    * contained docs (the retraction list), and zero-overlap docs.
    *
    * Scale shape: per n, one distinct-fingerprint relation over train
    * (corpus-linear, map-side combinable) and one fp-keyed equi-join
    * from the held-out windows — never a doc×doc comparison. The md5
    * window fingerprint is the exact rung; at warehouse scale the n=8
    * tier rides the rolling dual-lattice fingerprints + reference Bloom
    * exactly as x19b does (this panel is the tool that picks WHICH n
    * deserves that production path). */
  private val z54OverlapCurve = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      def curveAt(n: Int): org.apache.spark.sql.DataFrame = {
        def wins(df: org.apache.spark.sql.DataFrame) = df
          .filter(size(col("w")) >= n)
          .select(col("doc_id"), explode(expr(
            s"transform(sequence(0, size(w) - $n), i -> md5(concat_ws(' ', slice(w, i + 1, $n))))"))
            .as("fp"))
        val train = wins(docs.filter(col("doc_id") % 10 =!= 0))
          .select("fp").distinct()
        val perDoc = wins(docs.filter(col("doc_id") % 10 === 0))
          .join(train.withColumn("hit", lit(1L)), Seq("fp"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_windows"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
          .withColumn("cont_dec",
            (col("n_hits").cast(DoubleType) / col("n_windows")).cast(DecimalType(12, 6)))
        perDoc.agg(
            count(lit(1)).as("n_docs"),
            (sum(col("cont_dec")).cast(DoubleType) / count(lit(1))).as("mean_containment"),
            sum(when(col("n_hits") === col("n_windows"), 1L).otherwise(0L))
              .cast(LongType).as("n_full"),
            sum(when(col("n_hits") === 0, 1L).otherwise(0L))
              .cast(LongType).as("n_zero"))
          .select(lit(n).as("n"), col("n_docs"), col("mean_containment"),
            col("n_full"), col("n_zero"))
      }
      Seq(2, 4, 8).map(curveAt).reduce(_.unionByName(_)).orderBy("n")
    },
    {
      def tier(n: Int): String =
        s"""t$n AS (SELECT DISTINCT md5(array_to_string(l[i:i+${n - 1}], ' ')) AS fp
           |  FROM (SELECT l, unnest(generate_series(1, len(l) - ${n - 1})) AS i
           |        FROM (SELECT string_split(text, ' ') AS l FROM documents
           |              WHERE doc_id % 10 <> 0) WHERE len(l) >= $n)),
           |h$n AS (SELECT doc_id, md5(array_to_string(l[i:i+${n - 1}], ' ')) AS fp
           |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - ${n - 1})) AS i
           |        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents
           |              WHERE doc_id % 10 = 0) WHERE len(l) >= $n)),
           |p$n AS (SELECT h$n.doc_id, COUNT(*) AS n_windows,
           |    CAST(SUM(CASE WHEN t$n.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_hits
           |  FROM h$n LEFT JOIN t$n ON h$n.fp = t$n.fp GROUP BY 1),
           |c$n AS (SELECT doc_id, n_windows, n_hits,
           |    CAST(CAST(n_hits AS DOUBLE) / n_windows AS DECIMAL(12,6)) AS cont_dec
           |  FROM p$n),
           |r$n AS (SELECT $n AS n, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |    CAST(SUM(cont_dec) AS DOUBLE) / COUNT(*) AS mean_containment,
           |    CAST(SUM(CASE WHEN n_hits = n_windows THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_full,
           |    CAST(SUM(CASE WHEN n_hits = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
           |  FROM c$n)""".stripMargin
      s"""WITH ${tier(2)},
         |${tier(4)},
         |${tier(8)}
         |SELECT n, n_docs, mean_containment, n_full, n_zero
         |FROM (SELECT * FROM r2 UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r8)
         |ORDER BY n""".stripMargin
    })

  /** z55: per-source LEAKAGE ATTRIBUTION — z54's n=8 tier turned into
    * the operational question an ingest owner actually asks: WHICH
    * arrival source is re-serving training data? Every held-out doc's
    * 8-token-window containment against the train split, aggregated per
    * source: docs scored, mean containment, docs over the 50% span-dup
    * line (the x32 span gate's majority rule applied cross-split — these
    * arrivals are substantially recycled training content), and fully-
    * contained docs (verbatim re-serves). A source whose arrivals sit
    * high on this panel gets its crawl deprioritized or its dedup
    * resolution (x39) tightened — the feedback loop from measurement to
    * ingest policy. Same scale shape as z54: one distinct-fp relation
    * over train, one fp-keyed equi-join, group by source. */
  private val z55LeakageBySource = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      def wins(df: org.apache.spark.sql.DataFrame) = df
        .filter(size(col("w")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(w) - 8), i -> md5(concat_ws(' ', slice(w, i + 1, 8))))"))
          .as("fp"))
      val train = wins(docs.filter(col("doc_id") % 10 =!= 0)).select("fp").distinct()
      wins(docs.filter(col("doc_id") % 10 === 0))
        .join(train.withColumn("hit", lit(1L)), Seq("fp"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .withColumn("cont_dec",
          (col("n_hits").cast(DoubleType) / col("n_windows")).cast(DecimalType(12, 6)))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("cont_dec")).cast(DoubleType) / count(lit(1))).as("mean_containment"),
          sum(when(col("n_hits") * 2 > col("n_windows"), 1L).otherwise(0L))
            .cast(LongType).as("n_majority_dup"),
          sum(when(col("n_hits") === col("n_windows"), 1L).otherwise(0L))
            .cast(LongType).as("n_full"))
        .orderBy("source")
    },
    """WITH tr AS (SELECT DISTINCT md5(array_to_string(l[i:i+7], ' ')) AS fp
      |  FROM (SELECT l, unnest(generate_series(1, len(l) - 7)) AS i
      |        FROM (SELECT string_split(text, ' ') AS l FROM documents
      |              WHERE doc_id % 10 <> 0) WHERE len(l) >= 8)),
      |hw AS (SELECT doc_id, md5(array_to_string(l[i:i+7], ' ')) AS fp
      |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 7)) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents
      |              WHERE doc_id % 10 = 0) WHERE len(l) >= 8)),
      |pd AS (SELECT hw.doc_id, COUNT(*) AS n_windows,
      |    CAST(SUM(CASE WHEN tr.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      |  FROM hw LEFT JOIN tr ON hw.fp = tr.fp GROUP BY 1),
      |cd AS (SELECT p.doc_id, d.source, p.n_windows, p.n_hits,
      |    CAST(CAST(p.n_hits AS DOUBLE) / p.n_windows AS DECIMAL(12,6)) AS cont_dec
      |  FROM pd p JOIN documents d ON d.doc_id = p.doc_id)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(cont_dec) AS DOUBLE) / COUNT(*) AS mean_containment,
      |  CAST(SUM(CASE WHEN n_hits * 2 > n_windows THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_majority_dup,
      |  CAST(SUM(CASE WHEN n_hits = n_windows THEN 1 ELSE 0 END) AS BIGINT) AS n_full
      |FROM cd GROUP BY 1 ORDER BY 1""".stripMargin)

  /** x46: FREQUENCY boilerplate scrub — the CCNet/RefinedWeb paragraph-
    * dedup rung the span family doesn't cover: x35 scrubs spans that a
    * PAIRWISE match flagged, but web boilerplate (nav bars, cookie
    * banners, license headers) repeats across thousands of unrelated
    * pages and never needs a pair — any fixed-width segment whose
    * corpus-wide occurrence count reaches `minDf` is boilerplate and is
    * stripped from EVERY document that carries it, docs rebuilt from the
    * surviving segments in order. The panel is the per-source editing
    * report (segments dropped, token shrinkage, docs emptied outright)
    * plus the rebuilt-corpus checksum that pins the edit itself, and the
    * global boilerplate-inventory counts.
    *
    * Scale shape: the segmenter is a pure map-side explode (chunkWords —
    * no shuffle); the frequency relation groups on a 64-bit dual hash
    * (map-side combinable, Heaps-bounded key space); the boilerplate set
    * (df ≥ minDf tail) joins back UNHINTED so AQE broadcasts it while
    * small and falls back to a hash join on the 16-byte key when a real
    * web corpus makes boilerplate large; the only doc-keyed shuffle is
    * the rebuild groupBy over KEPT segments. Every output cell is an
    * integer or a lattice checksum — no float discipline needed. */
  private val x46BoilerplateScrub = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val docs = Tables.documents(s, d)
      val k = 8
      val minDf = 2
      val M = lit(2147483647L)
      val segs = TextAnalysis.chunkWords(docs, "doc_id", "text", k)
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
          col("chunk_text"),
          TextAnalysis.hash32(col("chunk_text")).as("h1"),
          TextAnalysis.hash32b(col("chunk_text")).as("h2"))
      val boiler = segs.groupBy("h1", "h2").agg(count(lit(1)).as("df"))
        .filter(col("df") >= minDf)
      val keptSegs = segs.join(boiler.select("h1", "h2"), Seq("h1", "h2"), "left_anti")
      val rebuilt = keptSegs.groupBy("doc_id").agg(
        count(lit(1)).as("n_segs_kept"),
        sum(col("n_tokens")).cast(LongType).as("toks_after"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
          c => c.getField("chunk_text")), " ").as("rebuilt"))
      val perDoc = docs
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast(LongType).as("toks_before"))
        .join(segs.groupBy("doc_id").agg(count(lit(1)).as("n_segs")), Seq("doc_id"))
        .join(rebuilt, Seq("doc_id"), "left")
        .withColumn("n_segs_kept", coalesce(col("n_segs_kept"), lit(0L)))
        .withColumn("toks_after", coalesce(col("toks_after"), lit(0L)))
      val inventory = boiler.agg(
        count(lit(1)).as("n_boiler_segments"),
        coalesce(sum(col("df")), lit(0L)).cast(LongType).as("n_boiler_instances"))
      perDoc.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_segs")).cast(LongType).as("n_segs"),
          sum(col("n_segs") - col("n_segs_kept")).cast(LongType).as("n_segs_dropped"),
          sum(col("toks_before")).cast(LongType).as("toks_before"),
          sum(col("toks_after")).cast(LongType).as("toks_after"),
          sum(when(col("rebuilt").isNull, 1L).otherwise(0L)).cast(LongType)
            .as("n_docs_emptied"),
          pmod(sum(when(col("rebuilt").isNull, lit(0L))
            .otherwise(pmod(TextAnalysis.hash32(col("rebuilt")), M))), M)
            .cast(LongType).as("scrub_checksum"))
        .crossJoin(broadcast(inventory))
        .orderBy("source")
    },
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |seg0 AS (SELECT doc_id, w, unnest(generate_series(0, (len(w) - 1) // 8)) AS c FROM ws),
       |st AS (SELECT doc_id, c, list_slice(w, c * 8 + 1, c * 8 + 8) AS cw FROM seg0),
       |hh AS (SELECT doc_id, c, len(cw) AS nt, array_to_string(cw, ' ') AS t,
       |    ${h32Sql("array_to_string(cw, ' ')")} AS h1,
       |    ${h32bSql("array_to_string(cw, ' ')")} AS h2
       |  FROM st),
       |f AS (SELECT h1, h2, COUNT(*) AS df FROM hh GROUP BY 1, 2),
       |boiler AS (SELECT h1, h2, df FROM f WHERE df >= 2),
       |kept AS (SELECT hh.* FROM hh
       |  WHERE NOT EXISTS (SELECT 1 FROM boiler b WHERE b.h1 = hh.h1 AND b.h2 = hh.h2)),
       |reb AS (SELECT doc_id, COUNT(*) AS n_segs_kept,
       |    CAST(SUM(nt) AS BIGINT) AS toks_after,
       |    string_agg(t, ' ' ORDER BY c) AS rebuilt
       |  FROM kept GROUP BY 1),
       |segc AS (SELECT doc_id, COUNT(*) AS n_segs FROM hh GROUP BY 1),
       |pd AS (SELECT d.doc_id, d.source,
       |    len(string_split(d.text, ' ')) AS toks_before,
       |    s.n_segs, COALESCE(r.n_segs_kept, 0) AS n_segs_kept,
       |    COALESCE(r.toks_after, 0) AS toks_after, r.rebuilt
       |  FROM documents d JOIN segc s ON s.doc_id = d.doc_id
       |  LEFT JOIN reb r ON r.doc_id = d.doc_id),
       |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_boiler_segments,
       |    CAST(COALESCE(SUM(df), 0) AS BIGINT) AS n_boiler_instances FROM boiler)
       |SELECT pd.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_segs) AS BIGINT) AS n_segs,
       |  CAST(SUM(n_segs - n_segs_kept) AS BIGINT) AS n_segs_dropped,
       |  CAST(SUM(toks_before) AS BIGINT) AS toks_before,
       |  CAST(SUM(toks_after) AS BIGINT) AS toks_after,
       |  CAST(SUM(CASE WHEN rebuilt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_emptied,
       |  CAST(SUM(CASE WHEN rebuilt IS NULL THEN 0
       |    ELSE ${h32Sql("rebuilt")} % 2147483647 END) % 2147483647 AS BIGINT)
       |    AS scrub_checksum,
       |  nb.n_boiler_segments, nb.n_boiler_instances
       |FROM pd CROSS JOIN nb
       |GROUP BY pd.source, nb.n_boiler_segments, nb.n_boiler_instances
       |ORDER BY pd.source""".stripMargin)

  /** z56: DOMAIN REWEIGHTING by excess loss — DoReMi's update rule (Hedge /
    * exponentiated gradient over domains) run against a fixed reference
    * scorer: each source's per-token loss under the corpus-wide unigram LM
    * (z15's scorer and snapshot discipline), excess = loss − best source's
    * loss, then three unrolled multiplicative-weights rounds
    * w_t ∝ w_{t−1}·exp(excess) with exact renormalization. High-excess
    * (hard-for-the-reference) sources gain weight each round — the
    * data-mixture knob z22/z53 consume becomes a MEASURED output instead
    * of folklore. Honest scope note: full DoReMi refits the proxy between
    * rounds; with the reference fixed, the rounds trace the Hedge
    * trajectory toward the exp-tilted mixture, which is the panel a
    * mixture owner reads (direction + step size per round).
    *
    * Engine-stability: per-token ln snapshot at DECIMAL(12,6), exact
    * per-source decimal sums, loss = one double division; exp(excess)
    * snapshot at DECIMAL(12,6); each round's terms snapshot at
    * DECIMAL(20,12) so the normalizer is an EXACT decimal sum (a double
    * sum over sources would be fold-order-ambiguous), and each weight is
    * one double division. Scale: one map-side explode + vocab-sized
    * unigram join (unhinted — AQE), ONE source-keyed aggregate; all three
    * rounds run on the 20-row per-source frame, pinned so the corpus scan
    * never re-executes per round. */
  /** Shared z56/z62 stage: per-source loss/excess/Hedge-round weights —
    * ONE definition so the reweighting arithmetic can never drift between
    * the declared panel and its budget consumer. */
  private def z56Weights(s: SparkSession, d: String): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
      val docs = Tables.documents(s, d)
      val w = docs.select(col("source"), explode(split(col("text"), " ")).as("term"))
      val cnt = w.groupBy("term").agg(count(lit(1)).as("n_w"))
      val tot = w.agg(count(lit(1)).as("n_tot"))
      val perSrc0 = w.join(cnt, Seq("term"))
        .crossJoin(broadcast(tot))
        .withColumn("lp",
          log(col("n_w").cast(DoubleType) / col("n_tot")).cast(DecimalType(12, 6)))
        .groupBy("source")
        .agg(count(lit(1)).cast(LongType).as("n_tokens"),
          ((-sum(col("lp"))).cast(DoubleType) / count(lit(1))).as("loss"))
      // rounds iterate on this 20-row frame only; under plan-only sweeps
      // the checkpoint is skipped so (a) construction stays action-free and
      // (b) the audited plan covers the corpus explode+join stage instead
      // of a lineage-truncated LogicalRDD
      val perSrc = if (planOnly) perSrc0 else perSrc0.localCheckpoint(true)
      val stats = perSrc.agg(min(col("loss")).as("minloss"),
        count(lit(1)).as("n_sources"))
      var cur = perSrc.crossJoin(broadcast(stats))
        .withColumn("excess", col("loss") - col("minloss"))
        .withColumn("egain",
          exp(col("excess")).cast(DecimalType(12, 6)).cast(DoubleType))
        .withColumn("w0", lit(1.0) / col("n_sources"))
        .withColumn("w_prev", lit(1.0) / col("n_sources"))
      for (t <- 1 to 3) {
        val stepped = cur.withColumn(s"term$t",
          (col("w_prev") * col("egain")).cast(DecimalType(20, 12)))
        val z = stepped.agg(sum(col(s"term$t")).as(s"z$t"))
        cur = stepped.crossJoin(broadcast(z))
          .withColumn(s"w$t",
            col(s"term$t").cast(DoubleType) / col(s"z$t").cast(DoubleType))
          .withColumn("w_prev", col(s"w$t"))
      }
      cur.select(col("source"), col("n_tokens"), col("loss"), col("excess"),
          col("w0"), col("w1"), col("w2"), col("w3"))
  }

  /** Shared oracle CTE chain ending at `w3t` (z56's weight frame). */
  private val z56CtesSql: String =
    """w AS (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
      |cnt AS (SELECT term, COUNT(*) AS n_w FROM w GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_tot FROM cnt),
      |ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |    CAST(-SUM(CAST(ln(CAST(n_w AS DOUBLE) / n_tot) AS DECIMAL(12,6))) AS DOUBLE)
      |      / COUNT(*) AS loss
      |  FROM w JOIN cnt USING (term) CROSS JOIN tot GROUP BY 1),
      |st AS (SELECT MIN(loss) AS minloss, CAST(COUNT(*) AS BIGINT) AS n_sources FROM ps),
      |b AS (SELECT source, n_tokens, loss, loss - minloss AS excess,
      |    CAST(CAST(exp(loss - minloss) AS DECIMAL(12,6)) AS DOUBLE) AS egain,
      |    CAST(1 AS DOUBLE) / n_sources AS w0
      |  FROM ps CROSS JOIN st),
      |r1 AS (SELECT *, CAST(w0 * egain AS DECIMAL(20,12)) AS t1 FROM b),
      |z1c AS (SELECT SUM(t1) AS z1 FROM r1),
      |w1t AS (SELECT r1.*, CAST(t1 AS DOUBLE) / CAST(z1 AS DOUBLE) AS w1
      |  FROM r1 CROSS JOIN z1c),
      |r2 AS (SELECT *, CAST(w1 * egain AS DECIMAL(20,12)) AS t2 FROM w1t),
      |z2c AS (SELECT SUM(t2) AS z2 FROM r2),
      |w2t AS (SELECT r2.*, CAST(t2 AS DOUBLE) / CAST(z2 AS DOUBLE) AS w2
      |  FROM r2 CROSS JOIN z2c),
      |r3 AS (SELECT *, CAST(w2 * egain AS DECIMAL(20,12)) AS t3 FROM w2t),
      |z3c AS (SELECT SUM(t3) AS z3 FROM r3),
      |w3t AS (SELECT r3.*, CAST(t3 AS DOUBLE) / CAST(z3 AS DOUBLE) AS w3
      |  FROM r3 CROSS JOIN z3c)""".stripMargin

  private val z56DomainReweight = Q(
    (s, d) => z56Weights(s, d).orderBy("source"),
    s"""WITH $z56CtesSql
       |SELECT source, n_tokens, loss, excess, w0, w1, w2, w3
       |FROM w3t ORDER BY source""".stripMargin)

  /** z62: REWEIGHTED BUDGET allocation — z56's learned mixture applied:
    * the w3 Hedge weights turn a fixed token budget (B = 100,000) into
    * per-source quotas via the LARGEST-REMAINDER method (floor every
    * quota, then hand the leftover units to the largest fractional parts,
    * ties by source — deterministic, and Σ quota == B EXACTLY, the
    * invariant naive rounding loses), then caps each quota at the
    * source's actual token supply, surfacing the SPILL a production
    * waterfall (z43's iterative budget) would redistribute. Closes the
    * measure → weight → allocate loop: z56 measures, z62 commits the
    * numbers a sampler consumes. All comparisons are on engine-identical
    * doubles; quotas/ranks/spill are integer arithmetic. */
  private val z62ReweightedBudget = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val B = 100000L
      val wts = z56Weights(s, d)
        .withColumn("raw", col("w3") * lit(B.toDouble))
        .withColumn("qfloor", floor(col("raw")).cast(LongType))
        .withColumn("frac", col("raw") - floor(col("raw")))
      val rem = wts.agg((lit(B) - sum(col("qfloor"))).cast(LongType).as("r"))
      val ranked = wts.crossJoin(broadcast(rem))
        .withColumn("fr", row_number().over(
          Window.orderBy(col("frac").desc, col("source").asc)))
        .withColumn("quota",
          (col("qfloor") + when(col("fr") <= col("r"), 1L).otherwise(0L))
            .cast(LongType))
      ranked
        .withColumn("alloc", least(col("quota"), col("n_tokens")).cast(LongType))
        .withColumn("spill", (col("quota") - col("alloc")).cast(LongType))
        .select("source", "n_tokens", "w3", "quota", "alloc", "spill")
        .orderBy("source")
    },
    s"""WITH $z56CtesSql,
       |q AS (SELECT source, n_tokens, w3, w3 * CAST(100000 AS DOUBLE) AS raw
       |  FROM w3t),
       |qf AS (SELECT *, CAST(floor(raw) AS BIGINT) AS qfloor,
       |    raw - floor(raw) AS frac FROM q),
       |rem AS (SELECT CAST(100000 - SUM(qfloor) AS BIGINT) AS r FROM qf),
       |rk AS (SELECT qf.*, rem.r,
       |    ROW_NUMBER() OVER (ORDER BY frac DESC, source) AS fr
       |  FROM qf CROSS JOIN rem),
       |al AS (SELECT source, n_tokens, w3,
       |    CAST(qfloor + CASE WHEN fr <= r THEN 1 ELSE 0 END AS BIGINT) AS quota
       |  FROM rk)
       |SELECT source, n_tokens, w3, quota,
       |  CAST(LEAST(quota, n_tokens) AS BIGINT) AS alloc,
       |  CAST(quota - LEAST(quota, n_tokens) AS BIGINT) AS spill
       |FROM al ORDER BY source""".stripMargin)

  /** z63: DoReMi ROUND 2 with a PROXY REFIT — closes the scope gap z56
    * honestly notes (its three Hedge rounds reuse ONE fixed reference
    * scorer; full DoReMi refits the proxy on the reweighted mixture
    * between rounds). One refit cycle, every step deterministic and
    * oracle-replayable: round-1 weights w1 (z56's shared stage) become a
    * 200-doc sample budget via largest-remainder quotas (z62's
    * machinery, doc-denominated); each source contributes its
    * top-quota docs under the z27 Efraimidis–Spirakis key (md5-uniform,
    * length-weighted, DECIMAL(18,12) snapshot — ranked by the salted
    * [[Relational.groupedTopK]], never a per-source corpus window); the
    * unigram LM REFITS on that sampled mixture (add-1 smoothing over
    * the FIXED corpus vocabulary, so unseen-in-sample terms stay
    * finite); every source's full-corpus token stream re-scores under
    * the refit LM (z15's DECIMAL(12,6) per-token snapshot); and Hedge
    * steps once more from w1 under the refit excess (exact
    * DECIMAL(20,12) normalizer). Scale: two corpus explodes (z56's
    * inside the shared stage + one (doc_id, source, term) pass pinned
    * across vocab/sample/eval), one sample-sized count table joined
    * unhinted, and all weight arithmetic on the 20-row frame. */
  private val z63DoremiRefit = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
      val docs = Tables.documents(s, d)
      val wts0 = z56Weights(s, d).select("source", "n_tokens", "loss", "w1")
      val wts = if (planOnly) wts0 else wts0.localCheckpoint(true)
      val B = 200L
      val q0 = wts.withColumn("raw", col("w1") * lit(B.toDouble))
        .withColumn("qfloor", floor(col("raw")).cast(LongType))
        .withColumn("frac", col("raw") - floor(col("raw")))
      val rem = q0.agg((lit(B) - sum(col("qfloor"))).cast(LongType).as("r"))
      val quota = q0.crossJoin(broadcast(rem))
        .withColumn("fr", row_number().over(
          Window.orderBy(col("frac").desc, col("source").asc)))
        .withColumn("quota",
          (col("qfloor") + when(col("fr") <= col("r"), 1L).otherwise(0L))
            .cast(LongType))
        .select("source", "n_tokens", "w1", "quota")
      val keyed = docs.select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("es_key", Sampling.esKey(col("doc_id"), col("n_chars")))
      val ranked = Relational.groupedTopK(keyed, Seq("source"), col("doc_id"),
        Seq(col("es_key").desc, col("doc_id").asc), k = B.toInt, out = "rk")
      val sampled = ranked.join(quota.select("source", "quota"), Seq("source"))
        .filter(col("rk") <= col("quota"))
        .select("doc_id", "source")
      val wd0 = docs.select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("term"))
      val wd = if (planOnly) wd0 else graft.Housekeeping.pin(s)(wd0).df
      val vocab = wd.agg(countDistinct(col("term")).as("v"))
      val sw = wd.join(sampled.select("doc_id"), Seq("doc_id"), "left_semi")
      val scnt = sw.groupBy("term").agg(count(lit(1)).as("n_s"))
      val stot = sw.agg(count(lit(1)).as("n_stot"))
      val evalLoss = wd.join(scnt, Seq("term"), "left")
        .crossJoin(broadcast(stot)).crossJoin(broadcast(vocab))
        .withColumn("lp2",
          log((coalesce(col("n_s"), lit(0L)) + lit(1L)).cast(DoubleType)
            / (col("n_stot") + col("v"))).cast(DecimalType(12, 6)))
        .groupBy("source").agg(
          ((-sum(col("lp2"))).cast(DoubleType) / count(lit(1))).as("loss_refit"))
      val nSamp = sampled.groupBy("source").agg(count(lit(1)).as("n_sampled"))
      val j0 = quota
        .join(evalLoss, Seq("source"))
        .join(nSamp, Seq("source"), "left")
        .withColumn("n_sampled", coalesce(col("n_sampled"), lit(0L)))
      val j = if (planOnly) j0 else j0.localCheckpoint(true)
      val st2 = j.agg(min(col("loss_refit")).as("minloss2"))
      val stepped = j.crossJoin(broadcast(st2))
        .withColumn("egain2", exp(col("loss_refit") - col("minloss2"))
          .cast(DecimalType(12, 6)).cast(DoubleType))
        .withColumn("t2", (col("w1") * col("egain2")).cast(DecimalType(20, 12)))
      val z2 = stepped.agg(sum(col("t2")).as("z2"))
      stepped.crossJoin(broadcast(z2))
        .withColumn("w2_refit",
          col("t2").cast(DoubleType) / col("z2").cast(DoubleType))
        .select("source", "n_tokens", "w1", "quota", "n_sampled",
          "loss_refit", "w2_refit")
        .orderBy("source")
    },
    s"""WITH $z56CtesSql,
       |q AS (SELECT source, n_tokens, w1, w1 * CAST(200 AS DOUBLE) AS raw FROM w1t),
       |qf AS (SELECT *, CAST(floor(raw) AS BIGINT) AS qfloor,
       |    raw - floor(raw) AS frac FROM q),
       |rem AS (SELECT CAST(200 - SUM(qfloor) AS BIGINT) AS r FROM qf),
       |rrk AS (SELECT qf.*, rem.r,
       |    ROW_NUMBER() OVER (ORDER BY frac DESC, source) AS fr
       |  FROM qf CROSS JOIN rem),
       |al AS (SELECT source, n_tokens, w1,
       |    CAST(qfloor + CASE WHEN fr <= r THEN 1 ELSE 0 END AS BIGINT) AS quota
       |  FROM rrk),
       |k2 AS (SELECT doc_id, source,
       |    CAST(ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
       |      / CAST(4294967296 AS DOUBLE)) / n_chars AS DECIMAL(18,12)) AS es_key
       |  FROM documents),
       |sr AS (SELECT doc_id, source, ROW_NUMBER() OVER (
       |    PARTITION BY source ORDER BY es_key DESC, doc_id) AS rk2 FROM k2),
       |smp AS (SELECT sr.doc_id, sr.source FROM sr JOIN al USING (source)
       |  WHERE rk2 <= quota),
       |wd AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |vc AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM wd),
       |swt AS (SELECT wd.term FROM wd JOIN smp ON smp.doc_id = wd.doc_id),
       |scnt AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n_s FROM swt GROUP BY 1),
       |stt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_stot FROM swt),
       |ev AS (SELECT wd.source,
       |    CAST(-SUM(CAST(ln((COALESCE(scnt.n_s, 0) + 1)
       |        / (stt.n_stot + vc.v)) AS DECIMAL(12,6))) AS DOUBLE)
       |      / COUNT(*) AS loss_refit
       |  FROM wd LEFT JOIN scnt ON scnt.term = wd.term
       |  CROSS JOIN stt CROSS JOIN vc
       |  GROUP BY 1),
       |ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled FROM smp GROUP BY 1),
       |jj AS (SELECT al.source, al.n_tokens, al.w1, al.quota,
       |    COALESCE(ns.n_sampled, 0) AS n_sampled, ev.loss_refit
       |  FROM al JOIN ev USING (source) LEFT JOIN ns USING (source)),
       |m2 AS (SELECT MIN(loss_refit) AS minloss2 FROM jj),
       |sp AS (SELECT jj.*, CAST(w1 * CAST(CAST(exp(loss_refit - minloss2)
       |      AS DECIMAL(12,6)) AS DOUBLE) AS DECIMAL(20,12)) AS t2
       |  FROM jj CROSS JOIN m2),
       |zr2 AS (SELECT SUM(t2) AS zsum FROM sp)
       |SELECT source, n_tokens, w1, quota, CAST(n_sampled AS BIGINT) AS n_sampled,
       |  loss_refit, CAST(t2 AS DOUBLE) / CAST(zsum AS DOUBLE) AS w2_refit
       |FROM sp CROSS JOIN zr2 ORDER BY source""".stripMargin)

  /** z60: PACKING-LENGTH sweep — the knob-picking panel for z19's stream
    * packing: for each candidate sequence length L ∈ {512, 1024, 2048,
    * 4096}, how many documents STRADDLE a bin boundary (the rows that
    * need cross-boundary attention masking or get truncated at training
    * time — the real cost of a shorter context), how many documents are
    * longer than L outright (must split no matter what), and the bin
    * count the token stream needs. Stream packing keeps utilization ≈ 1
    * by construction, so straddle count IS the decision variable — the
    * panel that turns "we train at 2048" from folklore into a measured
    * trade. ONE distributed prefix-sum pass (runningTotal's range-
    * partition + per-partition window + offset join — no global sort),
    * then the 4-value L ladder explodes over the already-reduced (doc,
    * toks, cum) relation; the sweep's shuffle carries 4 keys at any
    * corpus size (z45's ladder discipline). */
  private val z60PackingSweep = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("toks"))
      val cum = Relational.runningTotal(docs, Seq("doc_id"), "toks", "cum")
      cum.select(col("doc_id"), col("toks"), col("cum"),
          explode(array(lit(512L), lit(1024L), lit(2048L), lit(4096L))).as("seq_len"))
        .groupBy("seq_len")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).cast(LongType).as("total_tokens"),
          sum(when(expr("(cum - toks) DIV seq_len") =!= expr("(cum - 1) DIV seq_len"),
            1L).otherwise(0L)).as("n_straddling"),
          sum(when(col("toks") > col("seq_len"), 1L).otherwise(0L)).as("n_docs_over"))
        .withColumn("n_bins",
          expr("(total_tokens + seq_len - 1) DIV seq_len").cast(LongType))
        .withColumn("straddle_frac", col("n_straddling") / col("n_docs"))
        .select("seq_len", "n_docs", "total_tokens", "n_bins",
          "n_straddling", "n_docs_over", "straddle_frac")
        .orderBy("seq_len")
    },
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks FROM documents),
      |c AS (SELECT doc_id, toks, SUM(toks) OVER (
      |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM t),
      |l AS (SELECT c.*, ls.seq_len FROM c,
      |  (SELECT unnest([512, 1024, 2048, 4096]) AS seq_len) ls),
      |g AS (SELECT seq_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(toks) AS BIGINT) AS total_tokens,
      |    CAST(SUM(CASE WHEN (cum - toks) // seq_len <> (cum - 1) // seq_len
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling,
      |    CAST(SUM(CASE WHEN toks > seq_len THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_over
      |  FROM l GROUP BY 1)
      |SELECT CAST(seq_len AS BIGINT) AS seq_len, n_docs, total_tokens,
      |  CAST((total_tokens + seq_len - 1) // seq_len AS BIGINT) AS n_bins,
      |  n_straddling, n_docs_over,
      |  CAST(n_straddling AS DOUBLE) / n_docs AS straddle_frac
      |FROM g ORDER BY seq_len""".stripMargin)

  private val x50Built = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()

  /** x50: TAKEDOWN PROPAGATION into the boilerplate inventory — x44's
    * deletion E2 extended to x46/x48's artifact, by its production rule:
    * counts UNLEARN by subtract-merge (the removed docs' segment counts
    * merge in negated, zero rows leave — Lm.mergeCounts' shape, O(removed)
    * not O(corpus)). The interesting consequence is DOWNWARD threshold
    * crossings: segments whose df falls below minDf LEAVE the inventory,
    * and every retained doc that was scrubbed FOR such a segment is now
    * over-scrubbed — but the edit destroyed the evidence (the scrubbed
    * corpus no longer contains the segment), so the re-edit set must be
    * computed from the RAW retained corpus and re-materialized (the panel
    * counts those docs per source — the takedown bill the x44 tombstone
    * artifacts never pay because they only DROP rows). Oracle recomputes
    * the counts from the retained corpus from scratch: hash equality
    * proves subtract ≡ refit, inventory membership and checksum included. */
  private val x50InventoryTakedown = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val M = lit(2147483647L)
      val docs = Tables.documents(s, d)
      def segsOf(df: org.apache.spark.sql.DataFrame) =
        TextAnalysis.chunkWords(df, "doc_id", "text", 8)
          .select(col("doc_id"),
            TextAnalysis.hash32(col("chunk_text")).as("h1"),
            TextAnalysis.hash32b(col("chunk_text")).as("h2"))
      val fullCnt = segsOf(docs).groupBy("h1", "h2").agg(count(lit(1)).as("df"))
      val stored = if (planOnly) fullCnt else
        x50Built.computeIfAbsent(s"${s.sparkContext.applicationId}:$d", _ => {
          val path = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
            s"segfull_${s.sparkContext.applicationId}_" +
            Integer.toHexString(d.hashCode)
          val store = graft.sources.Store(s, path, "part")
          store.destroy()
          val withPart = fullCnt.withColumn("part", pmod(col("h1"), lit(8)))
          store.append(withPart)
          sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
          val back = readOrEmpty(store, withPart)
          store.trackFrom(back,
            (col("h1") % M) * (col("h2") % M) % M * (col("df") % M) % M)
          back.drop("part")
        })
      val removedCnt = segsOf(docs.filter(col("doc_id") % 13 === 0))
        .groupBy("h1", "h2").agg(count(lit(1)).as("rm"))
      val merged = stored
        .join(removedCnt, Seq("h1", "h2"), "left")
        .select(col("h1"), col("h2"),
          (col("df") - coalesce(col("rm"), lit(0L))).cast(LongType).as("df"))
        .filter(col("df") > 0)
      // downward crossings: in the inventory before, out after
      val left = stored.filter(col("df") >= 2)
        .join(merged.filter(col("df") >= 2).select("h1", "h2"),
          Seq("h1", "h2"), "left_anti")
        .select("h1", "h2")
      // over-scrubbed retained docs: carriers (in the RAW retained corpus)
      // of a segment that left the inventory — the re-materialization set
      val reEdit = segsOf(docs.filter(col("doc_id") % 13 =!= 0))
        .join(left, Seq("h1", "h2"), "left_semi")
        .select("doc_id").distinct()
      val g = merged.agg(
        count(lit(1)).as("n_rows_after"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("inv_after"),
        pmod(sum((col("h1") % M) * (col("h2") % M) % M * (col("df") % M) % M), M)
          .cast(LongType).as("freq_checksum"))
      val gb = stored.agg(
        count(lit(1)).as("n_rows_before"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("inv_before"))
      val nl = left.agg(count(lit(1)).as("n_left_inventory"))
      docs.filter(col("doc_id") % 13 =!= 0)
        .join(reEdit.withColumn("reedit", lit(true)), Seq("doc_id"), "left")
        .groupBy("source").agg(
          count(lit(1)).as("n_retained"),
          sum(when(col("reedit"), 1L).otherwise(0L)).as("n_over_scrubbed"))
        .crossJoin(broadcast(gb))
        .crossJoin(broadcast(g))
        .crossJoin(broadcast(nl))
        .orderBy("source")
    },
    s"""WITH ws AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       |seg0 AS (SELECT doc_id, w, unnest(generate_series(0, (len(w) - 1) // 8)) AS c FROM ws),
       |st AS (SELECT doc_id, c, list_slice(w, c * 8 + 1, c * 8 + 8) AS cw FROM seg0),
       |hh AS (SELECT doc_id, ${h32Sql("array_to_string(cw, ' ')")} AS h1,
       |    ${h32bSql("array_to_string(cw, ' ')")} AS h2
       |  FROM st),
       |before AS (SELECT h1, h2, COUNT(*) AS df FROM hh GROUP BY 1, 2),
       |aft AS (SELECT h1, h2, COUNT(*) AS df FROM hh
       |  WHERE doc_id % 13 <> 0 GROUP BY 1, 2),
       |lft AS (SELECT b.h1, b.h2 FROM before b
       |  LEFT JOIN (SELECT h1, h2 FROM aft WHERE df >= 2) a
       |    ON a.h1 = b.h1 AND a.h2 = b.h2
       |  WHERE b.df >= 2 AND a.h1 IS NULL),
       |re AS (SELECT DISTINCT hh.doc_id FROM hh
       |  JOIN lft ON lft.h1 = hh.h1 AND lft.h2 = hh.h2
       |  WHERE hh.doc_id % 13 <> 0),
       |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_after,
       |    CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS inv_after,
       |    CAST(SUM((h1 % 2147483647) * (h2 % 2147483647) % 2147483647
       |      * (df % 2147483647) % 2147483647) % 2147483647 AS BIGINT)
       |      AS freq_checksum
       |  FROM aft),
       |gb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_before,
       |    CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS inv_before
       |  FROM before),
       |nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_left_inventory FROM lft)
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_retained,
       |  CAST(SUM(CASE WHEN re.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_over_scrubbed,
       |  gb.n_rows_before, gb.inv_before,
       |  g.n_rows_after, g.inv_after, g.freq_checksum, nl.n_left_inventory
       |FROM documents d
       |LEFT JOIN re ON re.doc_id = d.doc_id
       |CROSS JOIN gb CROSS JOIN g CROSS JOIN nl
       |WHERE d.doc_id % 13 <> 0
       |GROUP BY d.source, gb.n_rows_before, gb.inv_before, g.n_rows_after,
       |  g.inv_after, g.freq_checksum, nl.n_left_inventory
       |ORDER BY d.source""".stripMargin)

  private val x52Built = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()

  /** x52: TAKEDOWN RE-MATERIALIZATION — x50's deletion E2 completed.
    * x50 computed WHO is over-scrubbed (retained docs whose stored
    * scrubbed bytes dropped a segment that has since LEFT the
    * inventory); x52 actually repairs them: re-scrub exactly those docs
    * from the RAW retained corpus against the SHRUNK inventory and
    * splice the corrected bytes over the stored artifact — every other
    * doc keeps its stored bytes untouched. The proof is the whole
    * point: the oracle scrubs the retained corpus FROM SCRATCH against
    * the post-takedown inventory, and hash equality on the rebuilt-text
    * md5 lattice (plus token totals and emptied counts) proves
    * repair ≡ rebuild — which holds EXACTLY, not approximately, because
    * the post-takedown inventory is a SUBSET of the build-time one, so a
    * doc carrying none of the departed segments scrubs identically by
    * construction. Scale: the day-0 scrubbed corpus is a stored
    * artifact (Store round-trip, amortized like x40/x47's base builds);
    * the takedown pays O(removed) for the subtract-merge + O(touched)
    * re-scrubs — never a corpus re-scrub. planOnly substitutes the
    * built frame for the store round-trip (x47/x48's discipline). */
  private val x52TakedownRematerialize = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val M = lit(2147483647L)
      val docs = Tables.documents(s, d)
      def segsOf(df: org.apache.spark.sql.DataFrame) =
        TextAnalysis.chunkWords(df, "doc_id", "text", 8)
          .select(col("doc_id"), col("chunk_id"), col("n_tokens"), col("chunk_text"),
            TextAnalysis.hash32(col("chunk_text")).as("h1"),
            TextAnalysis.hash32b(col("chunk_text")).as("h2"))
      def scrubAgainst(src: org.apache.spark.sql.DataFrame,
                       inv: org.apache.spark.sql.DataFrame) =
        segsOf(src).join(inv, Seq("h1", "h2"), "left_anti")
          .groupBy("doc_id").agg(
            sum(col("n_tokens")).cast(LongType).as("toks"),
            array_join(transform(
              array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
              c => c.getField("chunk_text")), " ").as("stext"))
      val fullCnt = segsOf(docs).groupBy("h1", "h2").agg(count(lit(1)).as("df"))
      val invBefore = fullCnt.filter(col("df") >= 2).select("h1", "h2")
      val scrubBuilt = docs.select(col("doc_id"), col("source"))
        .join(scrubAgainst(docs, invBefore), Seq("doc_id"), "left")
      val stored = if (planOnly) scrubBuilt else
        x52Built.computeIfAbsent(s"${s.sparkContext.applicationId}:$d", _ => {
          val path = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
            s"scrubbed_${s.sparkContext.applicationId}_" +
            Integer.toHexString(d.hashCode)
          val store = graft.sources.Store(s, path, "part")
          store.destroy()
          val withPart = scrubBuilt.withColumn("part", pmod(col("doc_id"), lit(8)))
          store.append(withPart)
          sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
          readOrEmpty(store, withPart).drop("part")
        })
      val retained = docs.filter(col("doc_id") % 13 =!= 0)
      val removedCnt = segsOf(docs.filter(col("doc_id") % 13 === 0))
        .groupBy("h1", "h2").agg(count(lit(1)).as("rm"))
      val merged = fullCnt.join(removedCnt, Seq("h1", "h2"), "left")
        .select(col("h1"), col("h2"),
          (col("df") - coalesce(col("rm"), lit(0L))).cast(LongType).as("df"))
        .filter(col("df") > 0)
      val invAfter = merged.filter(col("df") >= 2).select("h1", "h2")
      val left = invBefore.join(invAfter, Seq("h1", "h2"), "left_anti")
      val reEditIds = segsOf(retained)
        .join(left, Seq("h1", "h2"), "left_semi")
        .select("doc_id").distinct()
      val repairedNew = scrubAgainst(
          retained.join(reEditIds, Seq("doc_id"), "left_semi"), invAfter)
        .select(col("doc_id"), col("toks").as("rtoks"), col("stext").as("rstext"))
      val repaired = stored.filter(col("doc_id") % 13 =!= 0)
        .join(reEditIds.withColumn("re", lit(true)), Seq("doc_id"), "left")
        .join(repairedNew, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"),
          coalesce(col("re"), lit(false)).as("re"),
          when(col("re"), col("rstext")).otherwise(col("stext")).as("stext"),
          when(col("re"), col("rtoks")).otherwise(col("toks")).as("toks"))
      repaired.groupBy("source").agg(
          count(lit(1)).as("n_retained"),
          sum(when(col("re"), 1L).otherwise(0L)).as("n_reedited"),
          sum(when(col("stext").isNull, 1L).otherwise(0L)).as("n_emptied"),
          sum(coalesce(col("toks"), lit(0L))).cast(LongType).as("toks_total"),
          pmod(sum(when(col("stext").isNotNull,
              conv(substring(md5(col("stext")), 1, 8), 16, 10).cast(LongType) % M)
            .otherwise(0L)), M).cast(LongType).as("text_checksum"))
        .orderBy("source")
    },
    s"""WITH ws AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       |seg0 AS (SELECT doc_id, source, w,
       |    unnest(generate_series(0, (len(w) - 1) // 8)) AS c FROM ws),
       |st AS (SELECT doc_id, source, c, len(list_slice(w, c * 8 + 1, c * 8 + 8)) AS nt,
       |    array_to_string(list_slice(w, c * 8 + 1, c * 8 + 8), ' ') AS ct FROM seg0),
       |hh AS (SELECT doc_id, source, c, nt, ct,
       |    ${h32Sql("ct")} AS h1, ${h32bSql("ct")} AS h2 FROM st),
       |invb AS (SELECT h1, h2 FROM (SELECT h1, h2, COUNT(*) AS df FROM hh
       |    GROUP BY 1, 2) x WHERE df >= 2),
       |inva AS (SELECT h1, h2 FROM (SELECT h1, h2, COUNT(*) AS df FROM hh
       |    WHERE doc_id % 13 <> 0 GROUP BY 1, 2) x WHERE df >= 2),
       |lft AS (SELECT b.h1, b.h2 FROM invb b
       |  LEFT JOIN inva a ON a.h1 = b.h1 AND a.h2 = b.h2 WHERE a.h1 IS NULL),
       |re AS (SELECT DISTINCT hh.doc_id FROM hh
       |  JOIN lft ON lft.h1 = hh.h1 AND lft.h2 = hh.h2 WHERE hh.doc_id % 13 <> 0),
       |reb AS (SELECT hh.doc_id, CAST(SUM(nt) AS BIGINT) AS toks,
       |    string_agg(ct, ' ' ORDER BY c) AS stext
       |  FROM hh LEFT JOIN inva ON inva.h1 = hh.h1 AND inva.h2 = hh.h2
       |  WHERE hh.doc_id % 13 <> 0 AND inva.h1 IS NULL
       |  GROUP BY hh.doc_id)
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_retained,
       |  CAST(SUM(CASE WHEN re.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_reedited,
       |  CAST(SUM(CASE WHEN reb.stext IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_emptied,
       |  CAST(SUM(COALESCE(reb.toks, 0)) AS BIGINT) AS toks_total,
       |  CAST(SUM(CASE WHEN reb.stext IS NOT NULL THEN
       |      ('0x' || substring(md5(reb.stext), 1, 8))::BIGINT % 2147483647
       |    ELSE 0 END) % 2147483647 AS BIGINT) AS text_checksum
       |FROM documents d
       |LEFT JOIN re ON re.doc_id = d.doc_id
       |LEFT JOIN reb ON reb.doc_id = d.doc_id
       |WHERE d.doc_id % 13 <> 0
       |GROUP BY d.source ORDER BY d.source""".stripMargin)

  /** x53: REPETITION-AWARE SOFT DEDUP — the sampling-weight alternative
    * to hard-dropping near-dup families (the knob between "keep all
    * copies" and x25's keep-one): every doc's sampling weight divides by
    * its LSH cluster size, so a family of six near-identical pages
    * carries ONE page's expected sampled mass — content counts once,
    * but borderline families are never nuked outright (the soft form
    * production reaches for when the dedup threshold is contested).
    * Both arms draw the SAME deterministic Efraimidis–Spirakis sample
    * (z27's md5-uniform keys, k = 40, TakeOrdered plan — no corpus
    * shuffle): naive weight = n_chars, soft weight = n_chars/csize; the
    * panel prices the difference per cluster-size band (how many
    * sampled docs came from dup families, and how many DISTINCT
    * clusters each arm covers — the naive arm's dup over-representation
    * read straight off the gate data). Clustering is the x8 capped-LSH
    * CC, ONE pass feeding both arms; the oracle replays the recursive
    * fixpoint plus both ranked samples. */
  private val x53SoftDedup = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.lshCandidates(minhashSig(s, d), "doc_id", 8,
        maxBucket = Some(X2MaxBucket))
      val labels = Dedup.connectedComponents(pairs, docs.select("doc_id"), "doc_id")
      val csize = labels.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
      val base = docs.select(col("doc_id"), col("n_chars"))
        .join(labels, Seq("doc_id"))
        .join(csize, Seq("cluster_id"))
      def arm(name: String, weight: Column) =
        Sampling.weightedReservoir(base, col("doc_id"), weight, 40)
          .select(lit(name).as("arm"), col("doc_id"), col("cluster_id"), col("csize"))
      arm("naive", col("n_chars"))
        .unionByName(arm("soft", col("n_chars") / col("csize")))
        .withColumn("band", when(col("csize") === 1, "1")
          .when(col("csize") <= 3, "2-3").otherwise("4+"))
        .groupBy("arm", "band").agg(
          count(lit(1)).as("n_sampled"),
          countDistinct(col("cluster_id")).as("n_clusters"))
        .orderBy("arm", "band")
    },
    s"""WITH RECURSIVE $minhashCtes,
       |${cappedBandsCte(bandsSql)},
       |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
       |          UNION ALL SELECT doc_b, doc_a FROM p),
       |reach(node, r) AS (SELECT src, src FROM edges
       |  UNION SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.node),
       |comp AS (SELECT node, MIN(r) AS cid FROM reach GROUP BY 1),
       |lbl AS (SELECT d.doc_id, COALESCE(comp.cid, d.doc_id) AS cluster_id,
       |    d.n_chars
       |  FROM documents d LEFT JOIN comp ON comp.node = d.doc_id),
       |cs AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csize
       |  FROM lbl GROUP BY 1),
       |b AS (SELECT lbl.doc_id, lbl.cluster_id, cs.csize,
       |    CAST(ln((('0x' || substring(md5(CAST(lbl.doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
       |        / CAST(4294967296 AS DOUBLE)) / n_chars AS DECIMAL(18,12)) AS k_naive,
       |    CAST(ln((('0x' || substring(md5(CAST(lbl.doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
       |        / CAST(4294967296 AS DOUBLE)) / (n_chars / csize) AS DECIMAL(18,12)) AS k_soft
       |  FROM lbl JOIN cs USING (cluster_id)),
       |sn AS (SELECT 'naive' AS arm, doc_id, cluster_id, csize FROM b
       |  ORDER BY k_naive DESC, doc_id LIMIT 40),
       |ss AS (SELECT 'soft' AS arm, doc_id, cluster_id, csize FROM b
       |  ORDER BY k_soft DESC, doc_id LIMIT 40),
       |u AS (SELECT * FROM sn UNION ALL SELECT * FROM ss)
       |SELECT arm,
       |  CASE WHEN csize = 1 THEN '1' WHEN csize <= 3 THEN '2-3'
       |    ELSE '4+' END AS band,
       |  CAST(COUNT(*) AS BIGINT) AS n_sampled,
       |  CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
       |FROM u GROUP BY 1, 2 ORDER BY arm, band""".stripMargin)

  /** x54: TAIL-SPLIT ARTIFACT MAINTENANCE — x51's policy given x48's E2
    * story: a day's arrivals merge into the COMPRESSED artifact (exact
    * rows for df ≥ 2 + one CMS blob for the df=1 tail) without ever
    * touching the raw base corpus again. The key property that makes
    * the split maintainable EXACTLY: a tail key's count is 1 BY
    * DEFINITION, so a crossing reconstructs its true df as 1 + b from
    * the artifact alone — no information was lost by sketching the
    * tail. The merge: already-exact keys add their batch counts
    * (additive, x48's rule); detected crossings enter the exact part at
    * their reconstructed df; brand-new singletons merge into the sketch
    * by CMS ADDITION (`mergeInPlace` — cell-wise, so merging per-day
    * sketches is byte-identical to one build over the union,
    * `sketch_merge_exact` gates it; the same mergeability that shards
    * the sketch across 1000 executors). Honest residue: a crossed key's
    * old +1 stays in the sketch (CMS cannot subtract) — priced as
    * `sketch_residue` (= items merged − true tail, an exact identity
    * the oracle checks) and benign for detection: exact-part hits are
    * probed FIRST, so the stale cell only ever inflates a key that no
    * longer consults the sketch. FP crossings would enter the exact
    * part one day early (the conservative direction), so x54's sketch
    * is sized by x51's w ∝ tail rule for the LARGEST test corpus
    * (eps = 1e-5 → w = 200k, per-probe FP ~1e-6): the df
    * reconstruction is FP-free at every SF and the exact-part hash
    * gate is exact everywhere — the artifact-size trade vs x51's
    * tighter sketch is the documented knob, not a correctness term. */
  private val x54TailMaintenance = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val M = lit(2147483647L)
      val docs = Tables.documents(s, d)
      def segsOf(df: org.apache.spark.sql.DataFrame) =
        TextAnalysis.chunkWords(df, "doc_id", "text", 8)
          .select(col("doc_id"),
            TextAnalysis.hash32(col("chunk_text")).as("h1"),
            TextAnalysis.hash32b(col("chunk_text")).as("h2"))
      val baseCnt0 = segsOf(docs.filter(col("doc_id") % 10 =!= 0))
        .groupBy("h1", "h2").agg(count(lit(1)).as("df"))
      // FIVE consumers read the day-0 counts (exact updates, tail sketch
      // collect, one-shot merge check, both panel counts) — pin so the
      // corpus pays one segment pass (x47's signature discipline)
      val baseCnt = if (planOnly) baseCnt0
        else graft.Housekeeping.pin(s)(baseCnt0).df
      val exact0 = baseCnt.filter(col("df") >= 2)
      val tail0 = baseCnt.filter(col("df") === 1)
        .withColumn("key", concat_ws(":", col("h1"), col("h2")))
      // eps sized by x51's w ∝ tail rule for the 10× tail (~30k keys →
      // w = 200,000, occupancy ~0.14, per-probe FP ≈ 1e-6): the merge's
      // df reconstruction must stay FP-free at EVERY test SF, not just
      // the gate ones — x51 keeps the tighter sketch and prices the FP
      // bound; x54 exercises the sizing rule that removes them
      val skAgg = "count_min_sketch(key, CAST(0.00001 AS DOUBLE), " +
        "CAST(0.99 AS DOUBLE), 42)"
      // TRANSPORT: the 11 MB day-0 sketch is collected ONCE at build and
      // inlined as a plan LITERAL — the repo's Bloom precedent (j11/x12):
      // the blob rides the task binary to each executor exactly once and
      // CmsEstimate's decode cache hits by REFERENCE on the literal's
      // stable array, so each probe is O(1). The prior shape
      // (crossJoin(broadcast(sk-row)) attaching the blob as a COLUMN of
      // the batch relation) re-materialized + re-memcmp'd 11 MB per
      // probed row — 91 s fresh-JVM at sf0.1 for a query that runs in
      // single digits without it, and worse at 100× because per-probe
      // cost grew with sketch width (∝ corpus tail) × batch keys.
      val sk0 = tail0.agg(expr(skAgg).as("sk"), count(lit(1)).as("n_tail0"))
      def emptySketchBytes: Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.spark.util.sketch.CountMinSketch
          .create(0.00001, 0.99, 42).writeTo(bos)
        bos.toByteArray
      }
      val (sk0Bytes, nTail0): (Array[Byte], Long) =
        if (planOnly) (Array.empty[Byte], 0L)
        else {
          val r = sk0.head()
          (Option(r.getAs[Array[Byte]]("sk")).getOrElse(emptySketchBytes),
            r.getAs[Long]("n_tail0"))
        }
      val batchCnt = segsOf(docs.filter(col("doc_id") % 10 === 0))
        .groupBy("h1", "h2").agg(count(lit(1)).as("b"))
      val probed0 = batchCnt
        .join(exact0.select(col("h1"), col("h2"), col("df").as("df_exact")),
          Seq("h1", "h2"), "left")
        .withColumn("est", when(col("df_exact").isNull,
            call_function("graft_cms_estimate", lit(sk0Bytes),
              concat_ws(":", col("h1"), col("h2"))))
          .otherwise(lit(0L)))
      // FOUR consumers read the probed batch (crossings, newTail → sketch
      // collect, newTail → panel count, the one-shot merge check) — pin so
      // the probe stage runs once instead of re-executing per consumer
      val probed = if (planOnly) probed0
        else graft.Housekeeping.pin(s)(probed0).df
      // the maintained exact part: updates + reconstructed crossings
      val updated = exact0.join(batchCnt, Seq("h1", "h2"), "left")
        .select(col("h1"), col("h2"),
          (col("df") + coalesce(col("b"), lit(0L))).cast(LongType).as("df"))
      val crossings = probed
        .filter(col("df_exact").isNull &&
          when(col("est") >= 1, lit(1L)).otherwise(lit(0L)) + col("b") >= 2)
        .select(col("h1"), col("h2"),
          (when(col("est") >= 1, 1L).otherwise(0L) + col("b"))
            .cast(LongType).as("df"))
      val exactAfter = updated.unionByName(crossings)
      val newTail = probed
        .filter(col("df_exact").isNull && col("b") === 1 && col("est") < 1)
        .withColumn("key", concat_ws(":", col("h1"), col("h2")))
      val skNew = newTail.agg(expr(skAgg).as("sk"), count(lit(1)).as("n_new"))
      // driver-side CMS addition vs a one-shot build over the union —
      // byte equality is the mergeability contract (plan-only skips the
      // collects; the substitute keeps construction action-free)
      val mergeExact: Boolean = planOnly || {
        import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
        import org.apache.spark.util.sketch.CountMinSketch
        def decode(b: Array[Byte]) =
          CountMinSketch.readFrom(new ByteArrayInputStream(b))
        def enc(sk: CountMinSketch) = {
          val bos = new ByteArrayOutputStream(); sk.writeTo(bos); bos.toByteArray
        }
        def bytesOf(df: org.apache.spark.sql.DataFrame): Option[Array[Byte]] =
          Option(df.head().getAs[Array[Byte]]("sk"))
        val a = decode(sk0Bytes)
        a.mergeInPlace(bytesOf(skNew).map(decode).getOrElse(
          CountMinSketch.create(0.00001, 0.99, 42)))
        val oneShot = tail0.select("key").unionByName(newTail.select("key"))
          .agg(expr(skAgg).as("sk"))
        java.util.Arrays.equals(enc(a),
          bytesOf(oneShot).map(identity).getOrElse(Array.empty[Byte]))
      }
      // verification reads (from-scratch truth for tail accounting over
      // the post-ingest corpus = base ∪ batch = all docs)
      val afterCnt = segsOf(docs)
      val trueTail = afterCnt.groupBy("h1", "h2").agg(count(lit(1)).as("df"))
        .filter(col("df") === 1).agg(count(lit(1)).as("n_tail_true"))
      val g = exactAfter.agg(
        count(lit(1)).as("n_exact_after"),
        pmod(sum((col("h1") % M) * (col("h2") % M) % M * (col("df") % M) % M), M)
          .cast(LongType).as("exact_checksum"))
      exact0.agg(count(lit(1)).as("n_exact_before"))
        .crossJoin(broadcast(crossings.agg(count(lit(1)).as("n_crossings"))))
        .crossJoin(broadcast(newTail.agg(count(lit(1)).as("n_new_tail"))))
        .crossJoin(broadcast(g))
        .crossJoin(broadcast(trueTail))
        .withColumn("n_sketch_items",
          (lit(nTail0) + col("n_new_tail")).cast(LongType))
        .withColumn("sketch_residue",
          (col("n_sketch_items") - col("n_tail_true")).cast(LongType))
        .withColumn("sketch_merge_exact", lit(mergeExact))
        .select("n_exact_before", "n_exact_after", "exact_checksum",
          "n_crossings", "n_new_tail", "n_sketch_items", "n_tail_true",
          "sketch_residue", "sketch_merge_exact")
    },
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |seg0 AS (SELECT doc_id, w,
       |    unnest(generate_series(0, (len(w) - 1) // 8)) AS c FROM ws),
       |st AS (SELECT doc_id,
       |    array_to_string(list_slice(w, c * 8 + 1, c * 8 + 8), ' ') AS t FROM seg0),
       |hh AS (SELECT doc_id, ${h32Sql("t")} AS h1, ${h32bSql("t")} AS h2 FROM st),
       |cb AS (SELECT h1, h2, COUNT(*) AS df FROM hh WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
       |ex0 AS (SELECT h1, h2, df FROM cb WHERE df >= 2),
       |tl0 AS (SELECT h1, h2 FROM cb WHERE df = 1),
       |bt AS (SELECT h1, h2, COUNT(*) AS b FROM hh WHERE doc_id % 10 = 0 GROUP BY 1, 2),
       |upd AS (SELECT ex0.h1, ex0.h2,
       |    CAST(ex0.df + COALESCE(bt.b, 0) AS BIGINT) AS df
       |  FROM ex0 LEFT JOIN bt ON bt.h1 = ex0.h1 AND bt.h2 = ex0.h2),
       |cross0 AS (SELECT bt.h1, bt.h2,
       |    CAST(CASE WHEN tl0.h1 IS NOT NULL THEN 1 ELSE 0 END + bt.b AS BIGINT) AS df
       |  FROM bt LEFT JOIN ex0 ON ex0.h1 = bt.h1 AND ex0.h2 = bt.h2
       |  LEFT JOIN tl0 ON tl0.h1 = bt.h1 AND tl0.h2 = bt.h2
       |  WHERE ex0.h1 IS NULL
       |    AND CASE WHEN tl0.h1 IS NOT NULL THEN 1 ELSE 0 END + bt.b >= 2),
       |ea AS (SELECT * FROM upd UNION ALL SELECT * FROM cross0),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_new_tail FROM bt
       |  LEFT JOIN ex0 ON ex0.h1 = bt.h1 AND ex0.h2 = bt.h2
       |  LEFT JOIN tl0 ON tl0.h1 = bt.h1 AND tl0.h2 = bt.h2
       |  WHERE ex0.h1 IS NULL AND tl0.h1 IS NULL AND bt.b = 1),
       |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tail_true FROM (
       |    SELECT h1, h2 FROM hh
       |    GROUP BY 1, 2 HAVING COUNT(*) = 1) x),
       |t0c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tail0 FROM tl0),
       |e0c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_before FROM ex0),
       |cc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_crossings FROM cross0),
       |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_after,
       |    CAST(SUM((h1 % 2147483647) * (h2 % 2147483647) % 2147483647
       |      * (df % 2147483647) % 2147483647) % 2147483647 AS BIGINT)
       |      AS exact_checksum
       |  FROM ea)
       |SELECT e0c.n_exact_before, g.n_exact_after, g.exact_checksum,
       |  cc.n_crossings, nt.n_new_tail,
       |  CAST(t0c.n_tail0 + nt.n_new_tail AS BIGINT) AS n_sketch_items,
       |  tt.n_tail_true,
       |  CAST(t0c.n_tail0 + nt.n_new_tail - tt.n_tail_true AS BIGINT)
       |    AS sketch_residue,
       |  TRUE AS sketch_merge_exact
       |FROM e0c CROSS JOIN g CROSS JOIN cc CROSS JOIN nt
       |CROSS JOIN t0c CROSS JOIN tt""".stripMargin)

  /** One day's tail-split artifact bundle for x55: the stored frames (per-
    * day Store round-trips — the next merge consumes ARTIFACTS, not the
    * lineage that built them, x47's durable-barrier discipline), the
    * pinned probe relations, and the driver-side sketch/contract facts.
    * Cached per (app, dir) so Bench's second construction reuses the
    * lifecycle instead of re-running it. */
  private final case class X55State(
      art0: org.apache.spark.sql.DataFrame, art1: org.apache.spark.sql.DataFrame,
      art2: org.apache.spark.sql.DataFrame, probed1: org.apache.spark.sql.DataFrame,
      probed2: org.apache.spark.sql.DataFrame, nTail0: Long, nItemsD1: Long,
      mergeExact: Boolean, resketchMatchesTruth: Boolean)
  private val x55Cache =
    new java.util.concurrent.ConcurrentHashMap[String, X55State]()

  /** x55: MULTI-DAY TAIL-MAINTENANCE COMPOSITION — x54 proves one ingest
    * day's merge ≡ rebuild; a production corpus runs that merge EVERY day,
    * so the property that matters is the k-day composition (x47's
    * iterate∘iterate discipline applied to the split artifact), the
    * residue the sketch accrues ACROSS days, and the re-sketch path the
    * w ∝ tail sizing rule eventually forces. The artifact, stated
    * honestly: the DURABLE store keeps exact rows (df ≥ 2) AND the df=1
    * tail keys (cold, O(batch) deltas per day, consulted only for
    * rebuilds/takedowns — never shuffled at merge time); the SERVING/
    * merge transport is the CMS over the tail, collected once and
    * inlined as a plan literal (x54's transport), maintained across days
    * by cell-wise ADDITION. Two merge days (day-1 arrivals doc_id%10=5,
    * day-2 arrivals %10=0) run against the re-read artifacts, then the
    * panel gates, against a from-scratch split of the full corpus:
    *  - maintained exact part ≡ from-scratch df≥2 (count + df-lattice
    *    checksum) and maintained tail keys ≡ from-scratch df=1 (count +
    *    key checksum) — merge∘merge ≡ rebuild, the composition claim;
    *  - per-day crossings/new-singleton counts (the oracle re-derives
    *    them from day-prefix views);
    *  - RESIDUE ACCOUNTING: items ever added to the maintained sketch
    *    minus the true final tail = the crossed keys' stale +1s, an
    *    exact identity (closing the r10 verdict's x51 loop: the day-2
    *    FP bound below takes the residue-CARRYING item count as its
    *    occupancy input, not the clean tail);
    *  - day-2 detection contracts on the residue-carrying sketch:
    *    `no_false_negatives_d2` (tail membership always probes ≥ 1 —
    *    residue cells belong to crossed keys, which sit in the exact
    *    part and are probed FIRST, so residue never corrupts detection)
    *    and `fp_within_bound` at occupancy (n_tail0 + day-1 additions);
    *  - mergeability across days: sk0 + skNew1 + skNew2 by addition is
    *    byte-identical to a one-shot build over all items ever added;
    *  - THE RE-SKETCH PATH: when the tail outgrows the width rule
    *    (w = 200k holds 0.15·w ≈ 30k keys — `resketch_rule_triggered`
    *    prices the decision), the wider sketch is rebuilt from the
    *    STORED tail keys, never the corpus: `resketch_matches_truth`
    *    byte-compares that rebuild against a wider build over the
    *    from-scratch tail (the one deliberate corpus verification read,
    *    x54's deep-audit price) — rebuild-from-artifact ≡
    *    rebuild-from-truth, with zero residue by construction.
    * StoreSpec adds the restart case: a FRESH handle re-reads the stored
    * artifact, re-derives the sketch from the stored tail keys (sketch =
    * derived state, O(artifact) to rebuild — only rows are durable), and
    * the next merge lands exactly the from-scratch split. */
  private val x55TailComposition = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val M = lit(2147483647L)
      val docs = Tables.documents(s, d)
      def segsOf(df: org.apache.spark.sql.DataFrame) =
        TextAnalysis.chunkWords(df, "doc_id", "text", 8)
          .select(col("doc_id"),
            TextAnalysis.hash32(col("chunk_text")).as("h1"),
            TextAnalysis.hash32b(col("chunk_text")).as("h2"))
      def cntOf(f: org.apache.spark.sql.DataFrame) =
        segsOf(f).groupBy("h1", "h2").agg(count(lit(1)).as("df"))
      def batchOf(f: org.apache.spark.sql.DataFrame) =
        segsOf(f).groupBy("h1", "h2").agg(count(lit(1)).as("b"))
      val skAgg = "count_min_sketch(key, CAST(0.00001 AS DOUBLE), " +
        "CAST(0.99 AS DOUBLE), 42)"
      val skAggWide = "count_min_sketch(key, CAST(0.000005 AS DOUBLE), " +
        "CAST(0.99 AS DOUBLE), 42)"
      def withKey(f: org.apache.spark.sql.DataFrame) =
        f.withColumn("key", concat_ws(":", col("h1"), col("h2")))
      def emptySk(agg: String): Array[Byte] = {
        val eps = if (agg == skAgg) 0.00001 else 0.000005
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.spark.util.sketch.CountMinSketch
          .create(eps, 0.99, 42).writeTo(bos)
        bos.toByteArray
      }
      def sketchBytes(keys: org.apache.spark.sql.DataFrame,
                      agg: String): Array[Byte] = {
        val r = withKey(keys.select("h1", "h2")).agg(expr(agg).as("sk")).head()
        Option(r.getAs[Array[Byte]]("sk")).getOrElse(emptySk(agg))
      }
      def addSketches(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
        import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
        import org.apache.spark.util.sketch.CountMinSketch
        val sk = CountMinSketch.readFrom(new ByteArrayInputStream(a))
        sk.mergeInPlace(CountMinSketch.readFrom(new ByteArrayInputStream(b)))
        val bos = new ByteArrayOutputStream(); sk.writeTo(bos); bos.toByteArray
      }
      // one day's merge against the artifact + the sketch literal; the
      // probe relation is pinned across its consumers (crossings, new-tail
      // sketch collect, panel counts)
      def mergeDay(art: org.apache.spark.sql.DataFrame,
                   batch: org.apache.spark.sql.DataFrame, skB: Array[Byte]) = {
        val exact = art.filter(col("df") >= 2)
        val tailK = art.filter(col("df") === 1)
        val probed0 = batch
          .join(exact.select(col("h1"), col("h2"), col("df").as("df_exact")),
            Seq("h1", "h2"), "left")
          .join(tailK.select(col("h1"), col("h2"), lit(1L).as("df_tail")),
            Seq("h1", "h2"), "left")
          .withColumn("est", when(col("df_exact").isNull,
              call_function("graft_cms_estimate", lit(skB),
                concat_ws(":", col("h1"), col("h2"))))
            .otherwise(lit(0L)))
        // retainCheckpoint, not pin: these frames live in the x55Cache
        // across constructions (Bench/Soak run every query twice), so
        // their blocks must survive the per-query releaseAllBlocks sweep —
        // a pinned frame would be unpersisted after run 1 and run 2 would
        // hit CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (lineage is truncated).
        // Batch-keys-sized state: a few MB held for the process lifetime.
        val probed = if (planOnly) probed0
          else graft.Housekeeping.retainCheckpoint(s)(probed0)
        val estFlag = when(col("est") >= 1, 1L).otherwise(0L)
        val updated = exact.join(batch, Seq("h1", "h2"), "left")
          .select(col("h1"), col("h2"),
            (col("df") + coalesce(col("b"), lit(0L))).cast(LongType).as("df"))
        val crossings = probed
          .filter(col("df_exact").isNull && estFlag + col("b") >= 2)
          .select(col("h1"), col("h2"), (estFlag + col("b")).cast(LongType).as("df"))
        val newTail = probed
          .filter(col("df_exact").isNull && col("b") === 1 && col("est") < 1)
        val tailKept = tailK
          .join(crossings.select("h1", "h2"), Seq("h1", "h2"), "left_anti")
        val newArt = updated.unionByName(crossings)
          .unionByName(tailKept.select(col("h1"), col("h2"),
            lit(1L).cast(LongType).as("df")))
          .unionByName(newTail.select(col("h1"), col("h2"),
            lit(1L).cast(LongType).as("df")))
        (newArt, probed)
      }
      def stored(day: String, built: org.apache.spark.sql.DataFrame) = {
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
          s"tailsplit_${day}_${s.sparkContext.applicationId}_" +
          Integer.toHexString(d.hashCode)
        val store = graft.sources.Store(s, path, "part")
        store.destroy()
        store.append(built.withColumn("part", pmod(col("h1"), lit(8))))
        sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
        store.read.drop("part")
      }
      val day0 = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
      val b1 = batchOf(docs.filter(col("doc_id") % 10 === 5))
      val b2 = batchOf(docs.filter(col("doc_id") % 10 === 0))
      val st =
        if (planOnly) {
          // action-free substitutes: artifacts ride lineage, sketches are
          // empty literals (never evaluated), contract booleans default
          val a0 = cntOf(day0)
          val (a1, p1) = mergeDay(a0, b1, Array.empty[Byte])
          val (a2, p2) = mergeDay(a1, b2, Array.empty[Byte])
          X55State(a0, a1, a2, p1, p2, 0L, 0L, mergeExact = true,
            resketchMatchesTruth = true)
        } else x55Cache.computeIfAbsent(
          s"${s.sparkContext.applicationId}:$d", _ => {
            val art0 = stored("d0", cntOf(day0))
            val tail0 = art0.filter(col("df") === 1)
            val nTail0 = tail0.count()
            val sk0 = sketchBytes(tail0, skAgg)
            val (newArt1, probed1) = mergeDay(art0, b1, sk0)
            val art1 = stored("d1", newArt1)
            val newTail1 = probed1.filter(col("df_exact").isNull
              && col("b") === 1 && col("est") < 1)
            val skNew1 = sketchBytes(newTail1, skAgg)
            val sk1 = addSketches(sk0, skNew1)
            val nItemsD1 = nTail0 + newTail1.count()
            val (newArt2, probed2) = mergeDay(art1, b2, sk1)
            val art2 = stored("d2", newArt2)
            val newTail2 = probed2.filter(col("df_exact").isNull
              && col("b") === 1 && col("est") < 1)
            val skNew2 = sketchBytes(newTail2, skAgg)
            val skAfter = addSketches(sk1, skNew2)
            // mergeability across days: addition ≡ one-shot over every
            // item ever added (crossed keys' residue included — CMS
            // cannot subtract, and the identity is over ADDITIONS)
            val oneShot = sketchBytes(
              tail0.select("h1", "h2")
                .unionByName(newTail1.select("h1", "h2"))
                .unionByName(newTail2.select("h1", "h2")), skAgg)
            val mergeExact = java.util.Arrays.equals(skAfter, oneShot)
            // the re-sketch path: wider build from the STORED artifact's
            // tail keys vs a wider build over the from-scratch tail — the
            // corpus is touched ONLY by the verification arm
            val wideStored = sketchBytes(art2.filter(col("df") === 1), skAggWide)
            val wideTruth = sketchBytes(
              cntOf(docs).filter(col("df") === 1), skAggWide)
            val resketch = java.util.Arrays.equals(wideStored, wideTruth)
            X55State(art0, art1, art2, probed1, probed2, nTail0, nItemsD1,
              mergeExact, resketch)
          })
      val estFlag = when(col("est") >= 1, 1L).otherwise(0L)
      def dayCounts(p: org.apache.spark.sql.DataFrame, cName: String, nName: String) =
        p.agg(
          sum(when(col("df_exact").isNull && estFlag + col("b") >= 2, 1L)
            .otherwise(0L)).as(cName),
          sum(when(col("df_exact").isNull && col("b") === 1 && col("est") < 1, 1L)
            .otherwise(0L)).as(nName))
      val d2Contracts = st.probed2.agg(
        sum(when(col("df_exact").isNull && col("est") >= 1
          && col("df_tail").isNull && col("b") === 1, 1L).otherwise(0L)).as("n_fp_d2"),
        sum(when(col("df_exact").isNull && col("df_tail").isNull
          && col("b") === 1, 1L).otherwise(0L)).as("__n_miss"),
        (sum(when(col("df_exact").isNull && col("df_tail").isNotNull
          && col("est") < 1, 1L).otherwise(0L)) === 0L).as("no_false_negatives_d2"))
      val finAgg = st.art2.agg(
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_exact_final"),
        pmod(sum(when(col("df") >= 2,
          (col("h1") % M) * (col("h2") % M) % M * (col("df") % M) % M)
          .otherwise(0L)), M).cast(LongType).as("exact_checksum"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_tail_final"),
        pmod(sum(when(col("df") === 1, (col("h1") % M) * (col("h2") % M) % M)
          .otherwise(0L)), M).cast(LongType).as("tail_checksum"))
      finAgg
        .crossJoin(broadcast(dayCounts(st.probed1, "n_crossings_d1", "n_new_tail_d1")))
        .crossJoin(broadcast(dayCounts(st.probed2, "n_crossings_d2", "n_new_tail_d2")))
        .crossJoin(broadcast(d2Contracts))
        .withColumn("n_tail0", lit(st.nTail0))
        .withColumn("n_sketch_items",
          (lit(st.nTail0) + col("n_new_tail_d1") + col("n_new_tail_d2"))
            .cast(LongType))
        .withColumn("sketch_residue",
          (col("n_sketch_items") - col("n_tail_final")).cast(LongType))
        .withColumn("fp_within_bound",
          col("n_fp_d2") <= ceil(lit(5.0) * col("__n_miss")
            * pow(lit(1.0) - exp(lit(-st.nItemsD1.toDouble) / lit(200000.0)),
              lit(7.0))) + lit(1L))
        .withColumn("sketch_merge_exact", lit(st.mergeExact))
        .withColumn("resketch_rule_triggered", col("n_tail_final") > lit(30000L))
        .withColumn("resketch_matches_truth", lit(st.resketchMatchesTruth))
        .select("n_exact_final", "exact_checksum", "n_tail_final",
          "tail_checksum", "n_tail0", "n_crossings_d1", "n_new_tail_d1",
          "n_crossings_d2", "n_new_tail_d2", "n_sketch_items",
          "sketch_residue", "n_fp_d2", "no_false_negatives_d2",
          "fp_within_bound", "sketch_merge_exact", "resketch_rule_triggered",
          "resketch_matches_truth")
    },
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |seg0 AS (SELECT doc_id, w,
       |    unnest(generate_series(0, (len(w) - 1) // 8)) AS c FROM ws),
       |st AS (SELECT doc_id,
       |    array_to_string(list_slice(w, c * 8 + 1, c * 8 + 8), ' ') AS t FROM seg0),
       |hh AS (SELECT doc_id, ${h32Sql("t")} AS h1, ${h32bSql("t")} AS h2 FROM st),
       |c0 AS (SELECT h1, h2, COUNT(*) AS df FROM hh
       |  WHERE doc_id % 10 NOT IN (0, 5) GROUP BY 1, 2),
       |c01 AS (SELECT h1, h2, COUNT(*) AS df FROM hh
       |  WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
       |ca AS (SELECT h1, h2, COUNT(*) AS df FROM hh GROUP BY 1, 2),
       |x1 AS (SELECT
       |    CAST(SUM(CASE WHEN c01.df >= 2 AND COALESCE(c0.df, 0) <= 1
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings_d1,
       |    CAST(SUM(CASE WHEN c01.df = 1 AND c0.h1 IS NULL
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_new_tail_d1
       |  FROM c01 LEFT JOIN c0 ON c0.h1 = c01.h1 AND c0.h2 = c01.h2),
       |x2 AS (SELECT
       |    CAST(SUM(CASE WHEN ca.df >= 2 AND COALESCE(c01.df, 0) <= 1
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings_d2,
       |    CAST(SUM(CASE WHEN ca.df = 1 AND c01.h1 IS NULL
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_new_tail_d2
       |  FROM ca LEFT JOIN c01 ON c01.h1 = ca.h1 AND c01.h2 = ca.h2),
       |t0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tail0 FROM c0 WHERE df = 1),
       |fin AS (SELECT
       |    CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_final,
       |    CAST(SUM(CASE WHEN df >= 2 THEN (h1 % 2147483647) * (h2 % 2147483647)
       |      % 2147483647 * (df % 2147483647) % 2147483647 ELSE 0 END)
       |      % 2147483647 AS BIGINT) AS exact_checksum,
       |    CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tail_final,
       |    CAST(SUM(CASE WHEN df = 1 THEN (h1 % 2147483647) * (h2 % 2147483647)
       |      % 2147483647 ELSE 0 END) % 2147483647 AS BIGINT) AS tail_checksum
       |  FROM ca)
       |SELECT fin.n_exact_final, fin.exact_checksum, fin.n_tail_final,
       |  fin.tail_checksum, t0.n_tail0, x1.n_crossings_d1, x1.n_new_tail_d1,
       |  x2.n_crossings_d2, x2.n_new_tail_d2,
       |  CAST(t0.n_tail0 + x1.n_new_tail_d1 + x2.n_new_tail_d2 AS BIGINT)
       |    AS n_sketch_items,
       |  CAST(t0.n_tail0 + x1.n_new_tail_d1 + x2.n_new_tail_d2
       |    - fin.n_tail_final AS BIGINT) AS sketch_residue,
       |  CAST(0 AS BIGINT) AS n_fp_d2,
       |  TRUE AS no_false_negatives_d2, TRUE AS fp_within_bound,
       |  TRUE AS sketch_merge_exact,
       |  fin.n_tail_final > 30000 AS resketch_rule_triggered,
       |  TRUE AS resketch_matches_truth
       |FROM fin CROSS JOIN t0 CROSS JOIN x1 CROSS JOIN x2""".stripMargin)

  private final case class X56State(
      art0: org.apache.spark.sql.DataFrame, art1: org.apache.spark.sql.DataFrame,
      resketchOk: Boolean)
  private val x56Cache =
    new java.util.concurrent.ConcurrentHashMap[String, X56State]()

  /** x56: TAKEDOWN on the TAIL-SPLIT artifact — the third side of the
    * split-artifact lifecycle triangle (x51 builds it, x54/x55 maintain
    * it, this removes from it): a governance request deletes docs, and
    * the artifact must update in O(removed) off its STORED form, never a
    * corpus pass. The exact part and the tail KEYS subtract exactly
    * (x50's subtract-merge: df′ = df − r from the removed docs' own
    * segment counts; df′ ≥ 2 stays exact, df′ = 1 DEMOTES to the tail —
    * the downward crossing x50 surfaced — df′ = 0 drops). The SKETCH
    * cannot subtract (CMS is add-only), so a takedown forces the repair
    * x55 built: RE-SKETCH from the stored tail′ keys — which is exactly
    * why the durable artifact keeps the tail keys cold; an
    * exact-head-plus-sketch-only store would need the corpus here.
    * Gates: post-takedown exact/tail counts + checksums ≡ the
    * from-scratch split of the RETAINED corpus (subtract ≡ refit),
    * demotion/drop transition counts (oracle re-derives them from
    * full-vs-retained counts), and `resketch_equals_scratch`
    * byte-compares the tail′-key rebuild against a from-scratch build
    * over the retained tail (the corpus touched only by that
    * verification arm). Scale: the subtract join is keyed by the
    * removed docs' segments — O(removed); the artifact rewrite is the
    * store round-trip; the re-sketch is one pass over the stored tail′
    * keys, O(artifact). */
  private val x56TailTakedown = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val M = lit(2147483647L)
      val docs = Tables.documents(s, d)
      def segsOf(df: org.apache.spark.sql.DataFrame) =
        TextAnalysis.chunkWords(df, "doc_id", "text", 8)
          .select(col("doc_id"),
            TextAnalysis.hash32(col("chunk_text")).as("h1"),
            TextAnalysis.hash32b(col("chunk_text")).as("h2"))
      def cntOf(f: org.apache.spark.sql.DataFrame) =
        segsOf(f).groupBy("h1", "h2").agg(count(lit(1)).as("df"))
      val removedPred = col("doc_id") % 9 === 0
      val skAgg = "count_min_sketch(key, CAST(0.00001 AS DOUBLE), " +
        "CAST(0.99 AS DOUBLE), 42)"
      def sketchBytes(keys: org.apache.spark.sql.DataFrame): Array[Byte] = {
        val r = keys.select("h1", "h2")
          .withColumn("key", concat_ws(":", col("h1"), col("h2")))
          .agg(expr(skAgg).as("sk")).head()
        Option(r.getAs[Array[Byte]]("sk")).getOrElse(Array.empty[Byte])
      }
      def stored(day: String, built: org.apache.spark.sql.DataFrame) = {
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
          s"tailtd_${day}_${s.sparkContext.applicationId}_" +
          Integer.toHexString(d.hashCode)
        val store = graft.sources.Store(s, path, "part")
        store.destroy()
        store.append(built.withColumn("part", pmod(col("h1"), lit(8))))
        sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
        store.read.drop("part")
      }
      def subtracted(art: org.apache.spark.sql.DataFrame) = {
        val rem = segsOf(docs.filter(removedPred))
          .groupBy("h1", "h2").agg(count(lit(1)).as("r"))
        art.join(rem, Seq("h1", "h2"), "left")
          .select(col("h1"), col("h2"),
            (col("df") - coalesce(col("r"), lit(0L))).cast(LongType).as("df"))
          .filter(col("df") >= 1)
      }
      val st =
        if (planOnly) {
          val a0 = cntOf(docs)
          X56State(a0, subtracted(a0), resketchOk = true)
        } else x56Cache.computeIfAbsent(
          s"${s.sparkContext.applicationId}:$d", _ => {
            val art0 = stored("t0", cntOf(docs))
            val art1 = stored("t1", subtracted(art0))
            // CMS is add-only: the takedown repair IS x55's re-sketch
            // path, run off the stored tail′ keys; the from-scratch arm
            // exists only to verify it
            val rebuilt = sketchBytes(art1.filter(col("df") === 1))
            val scratch = sketchBytes(
              cntOf(docs.filter(!removedPred)).filter(col("df") === 1))
            X56State(art0, art1, java.util.Arrays.equals(rebuilt, scratch))
          })
      val before = st.art0.agg(
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_exact_before"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_tail_before"))
      val after = st.art1.agg(
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_exact_after"),
        pmod(sum(when(col("df") >= 2,
          (col("h1") % M) * (col("h2") % M) % M * (col("df") % M) % M)
          .otherwise(0L)), M).cast(LongType).as("exact_checksum"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_tail_after"),
        pmod(sum(when(col("df") === 1, (col("h1") % M) * (col("h2") % M) % M)
          .otherwise(0L)), M).cast(LongType).as("tail_checksum"))
      val trans = st.art0.select(col("h1"), col("h2"), col("df").as("df0"))
        .join(st.art1.select(col("h1"), col("h2"), col("df").as("df1")),
          Seq("h1", "h2"), "left")
        .agg(
          sum(when(col("df0") >= 2 && col("df1") === 1, 1L).otherwise(0L))
            .as("n_demoted"),
          sum(when(col("df1").isNull, 1L).otherwise(0L)).as("n_dropped"))
      val nRemoved = docs.filter(removedPred)
        .agg(count(lit(1)).as("n_removed_docs"))
      after.crossJoin(broadcast(before))
        .crossJoin(broadcast(trans))
        .crossJoin(broadcast(nRemoved))
        .withColumn("resketch_equals_scratch", lit(st.resketchOk))
        .select("n_removed_docs", "n_exact_before", "n_tail_before",
          "n_exact_after", "exact_checksum", "n_tail_after", "tail_checksum",
          "n_demoted", "n_dropped", "resketch_equals_scratch")
    },
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |seg0 AS (SELECT doc_id, w,
       |    unnest(generate_series(0, (len(w) - 1) // 8)) AS c FROM ws),
       |st AS (SELECT doc_id,
       |    array_to_string(list_slice(w, c * 8 + 1, c * 8 + 8), ' ') AS t FROM seg0),
       |hh AS (SELECT doc_id, ${h32Sql("t")} AS h1, ${h32bSql("t")} AS h2 FROM st),
       |ca AS (SELECT h1, h2, COUNT(*) AS df FROM hh GROUP BY 1, 2),
       |ret AS (SELECT h1, h2, COUNT(*) AS df FROM hh
       |  WHERE doc_id % 9 <> 0 GROUP BY 1, 2),
       |bef AS (SELECT
       |    CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_before,
       |    CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tail_before
       |  FROM ca),
       |aft AS (SELECT
       |    CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_after,
       |    CAST(SUM(CASE WHEN df >= 2 THEN (h1 % 2147483647) * (h2 % 2147483647)
       |      % 2147483647 * (df % 2147483647) % 2147483647 ELSE 0 END)
       |      % 2147483647 AS BIGINT) AS exact_checksum,
       |    CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tail_after,
       |    CAST(SUM(CASE WHEN df = 1 THEN (h1 % 2147483647) * (h2 % 2147483647)
       |      % 2147483647 ELSE 0 END) % 2147483647 AS BIGINT) AS tail_checksum
       |  FROM ret),
       |tr AS (SELECT
       |    CAST(SUM(CASE WHEN ca.df >= 2 AND ret.df = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_demoted,
       |    CAST(SUM(CASE WHEN ret.h1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_dropped
       |  FROM ca LEFT JOIN ret ON ret.h1 = ca.h1 AND ret.h2 = ca.h2),
       |nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_removed_docs FROM documents
       |  WHERE doc_id % 9 = 0)
       |SELECT nr.n_removed_docs, bef.n_exact_before, bef.n_tail_before,
       |  aft.n_exact_after, aft.exact_checksum, aft.n_tail_after,
       |  aft.tail_checksum, tr.n_demoted, tr.n_dropped,
       |  TRUE AS resketch_equals_scratch
       |FROM aft CROSS JOIN bef CROSS JOIN tr CROSS JOIN nr""".stripMargin)

  private final case class X58State(
      art1: org.apache.spark.sql.DataFrame, art1t: org.apache.spark.sql.DataFrame,
      art2: org.apache.spark.sql.DataFrame, probed1: org.apache.spark.sql.DataFrame,
      probed2: org.apache.spark.sql.DataFrame, resketchOk: Boolean)
  private val x58Cache =
    new java.util.concurrent.ConcurrentHashMap[String, X58State]()

  /** x58: TAKEDOWN INTERLEAVED WITH THE MULTI-DAY COMPOSITION — the
    * lifecycle triangle's last untested ORDERING (x51 builds, x54/x55
    * maintain across days, x56 removes; x58 proves remove-THEN-keep-
    * maintaining): build → merge day 1 → governance takedown → merge
    * day 2, all against the STORED artifacts, must land exactly the
    * from-scratch split of (retained corpus ∪ day-2 arrivals). The
    * ordering is where the interesting coupling lives:
    *  - the takedown's subtract (x56's O(removed) merge) runs against
    *    the artifact AS OF day 1 — removed docs' segment counts include
    *    any day-1 crossings they caused, and the subtract must unwind
    *    them exactly (df′ = df − r, demote at 1, drop at 0);
    *  - the takedown forces the RE-SKETCH (CMS cannot subtract), so day
    *    2's merge probes a FRESH, zero-residue sketch rebuilt from the
    *    stored tail′ keys — day-2 detection is exact by construction,
    *    and the day-2 batch may legitimately re-introduce content whose
    *    earlier copies were just removed (re-arrival is ingest, not a
    *    takedown violation: removal erases history, not the future);
    *  - day-2 crossings/new-singletons are therefore derived against the
    *    POST-takedown artifact, which is exactly what the oracle's
    *    retained-prefix views replay.
    * Panel: final exact/tail counts + checksums ≡ from-scratch over the
    * retained∪day-2 corpus (merge∘takedown∘merge ≡ rebuild), per-day
    * crossing/new-tail counts, the takedown's demotion/drop transitions,
    * `no_false_negatives_d2` on the rebuilt sketch, and
    * `resketch_equals_scratch` byte-comparing the artifact-rebuilt
    * sketch against a build over the from-scratch retained tail. Scale:
    * two O(batch) merges + one O(removed) subtract + one O(artifact)
    * re-sketch; the corpus is touched only by the verification arms. */
  private val x58InterleavedTakedown = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val M = lit(2147483647L)
      val docs = Tables.documents(s, d)
      def segsOf(df: org.apache.spark.sql.DataFrame) =
        TextAnalysis.chunkWords(df, "doc_id", "text", 8)
          .select(col("doc_id"),
            TextAnalysis.hash32(col("chunk_text")).as("h1"),
            TextAnalysis.hash32b(col("chunk_text")).as("h2"))
      def cntOf(f: org.apache.spark.sql.DataFrame) =
        segsOf(f).groupBy("h1", "h2").agg(count(lit(1)).as("df"))
      def batchOf(f: org.apache.spark.sql.DataFrame) =
        segsOf(f).groupBy("h1", "h2").agg(count(lit(1)).as("b"))
      val skAgg = "count_min_sketch(key, CAST(0.00001 AS DOUBLE), " +
        "CAST(0.99 AS DOUBLE), 42)"
      def sketchBytes(keys: org.apache.spark.sql.DataFrame): Array[Byte] = {
        val r = keys.select("h1", "h2")
          .withColumn("key", concat_ws(":", col("h1"), col("h2")))
          .agg(expr(skAgg).as("sk")).head()
        Option(r.getAs[Array[Byte]]("sk")).getOrElse(Array.empty[Byte])
      }
      def stored(day: String, built: org.apache.spark.sql.DataFrame) = {
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
          s"tailint_${day}_${s.sparkContext.applicationId}_" +
          Integer.toHexString(d.hashCode)
        val store = graft.sources.Store(s, path, "part")
        store.destroy()
        store.append(built.withColumn("part", pmod(col("h1"), lit(8))))
        sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
        store.read.drop("part")
      }
      def mergeDay(art: org.apache.spark.sql.DataFrame,
                   batch: org.apache.spark.sql.DataFrame, skB: Array[Byte]) = {
        val exact = art.filter(col("df") >= 2)
        val tailK = art.filter(col("df") === 1)
        val probed0 = batch
          .join(exact.select(col("h1"), col("h2"), col("df").as("df_exact")),
            Seq("h1", "h2"), "left")
          .join(tailK.select(col("h1"), col("h2"), lit(1L).as("df_tail")),
            Seq("h1", "h2"), "left")
          .withColumn("est", when(col("df_exact").isNull,
              call_function("graft_cms_estimate", lit(skB),
                concat_ws(":", col("h1"), col("h2"))))
            .otherwise(lit(0L)))
        // retainCheckpoint (x55's rule): these frames live in x58Cache
        // across constructions, so their blocks must survive the
        // per-query releaseAllBlocks sweep
        val probed = if (planOnly) probed0
          else graft.Housekeeping.retainCheckpoint(s)(probed0)
        val estFlag = when(col("est") >= 1, 1L).otherwise(0L)
        val updated = exact.join(batch, Seq("h1", "h2"), "left")
          .select(col("h1"), col("h2"),
            (col("df") + coalesce(col("b"), lit(0L))).cast(LongType).as("df"))
        val crossings = probed
          .filter(col("df_exact").isNull && estFlag + col("b") >= 2)
          .select(col("h1"), col("h2"), (estFlag + col("b")).cast(LongType).as("df"))
        val newTail = probed
          .filter(col("df_exact").isNull && col("b") === 1 && col("est") < 1)
        val tailKept = tailK
          .join(crossings.select("h1", "h2"), Seq("h1", "h2"), "left_anti")
        val newArt = updated.unionByName(crossings)
          .unionByName(tailKept.select(col("h1"), col("h2"),
            lit(1L).cast(LongType).as("df")))
          .unionByName(newTail.select(col("h1"), col("h2"),
            lit(1L).cast(LongType).as("df")))
        (newArt, probed)
      }
      val day0 = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
      val b1 = batchOf(docs.filter(col("doc_id") % 10 === 5))
      val b2 = batchOf(docs.filter(col("doc_id") % 10 === 0))
      // the takedown targets docs PRESENT at request time (day 0 ∪ day 1)
      val removedDocs = docs.filter(col("doc_id") % 9 === 0
        && col("doc_id") % 10 =!= 0)
      def subtracted(art: org.apache.spark.sql.DataFrame) = {
        val rem = segsOf(removedDocs).groupBy("h1", "h2").agg(count(lit(1)).as("r"))
        art.join(rem, Seq("h1", "h2"), "left")
          .select(col("h1"), col("h2"),
            (col("df") - coalesce(col("r"), lit(0L))).cast(LongType).as("df"))
          .filter(col("df") >= 1)
      }
      val st =
        if (planOnly) {
          val a0 = cntOf(day0)
          val (a1, p1) = mergeDay(a0, b1, Array.empty[Byte])
          val a1t = subtracted(a1)
          val (a2, p2) = mergeDay(a1t, b2, Array.empty[Byte])
          X58State(a1, a1t, a2, p1, p2, resketchOk = true)
        } else x58Cache.computeIfAbsent(
          s"${s.sparkContext.applicationId}:$d", _ => {
            val art0 = stored("d0", cntOf(day0))
            val sk0 = sketchBytes(art0.filter(col("df") === 1))
            val (newArt1, probed1) = mergeDay(art0, b1, sk0)
            val art1 = stored("d1", newArt1)
            // ---- the governance request between the merge days ----
            val art1t = stored("td", subtracted(art1))
            // CMS cannot subtract: rebuild the sketch from the STORED
            // tail′ keys — zero residue by construction, never the corpus
            val sk1t = sketchBytes(art1t.filter(col("df") === 1))
            val scratchT = sketchBytes(
              cntOf(docs.filter(col("doc_id") % 10 =!= 0
                  && col("doc_id") % 9 =!= 0))
                .filter(col("df") === 1))
            val resketch = java.util.Arrays.equals(sk1t, scratchT)
            val (newArt2, probed2) = mergeDay(art1t, b2, sk1t)
            val art2 = stored("d2", newArt2)
            X58State(art1, art1t, art2, probed1, probed2, resketch)
          })
      val estFlag = when(col("est") >= 1, 1L).otherwise(0L)
      def dayCounts(p: org.apache.spark.sql.DataFrame, cName: String, nName: String) =
        p.agg(
          sum(when(col("df_exact").isNull && estFlag + col("b") >= 2, 1L)
            .otherwise(0L)).as(cName),
          sum(when(col("df_exact").isNull && col("b") === 1 && col("est") < 1, 1L)
            .otherwise(0L)).as(nName))
      val trans = st.art1.select(col("h1"), col("h2"), col("df").as("df1"))
        .join(st.art1t.select(col("h1"), col("h2"), col("df").as("dft")),
          Seq("h1", "h2"), "left")
        .agg(
          sum(when(col("df1") >= 2 && col("dft") === 1, 1L).otherwise(0L))
            .as("n_demoted"),
          sum(when(col("dft").isNull, 1L).otherwise(0L)).as("n_dropped"))
      val d2Contract = st.probed2.agg(
        (sum(when(col("df_exact").isNull && col("df_tail").isNotNull
          && col("est") < 1, 1L).otherwise(0L)) === 0L).as("no_false_negatives_d2"))
      val finAgg = st.art2.agg(
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_exact_final"),
        pmod(sum(when(col("df") >= 2,
          (col("h1") % M) * (col("h2") % M) % M * (col("df") % M) % M)
          .otherwise(0L)), M).cast(LongType).as("exact_checksum"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_tail_final"),
        pmod(sum(when(col("df") === 1, (col("h1") % M) * (col("h2") % M) % M)
          .otherwise(0L)), M).cast(LongType).as("tail_checksum"))
      finAgg
        .crossJoin(broadcast(dayCounts(st.probed1, "n_crossings_d1", "n_new_tail_d1")))
        .crossJoin(broadcast(trans))
        .crossJoin(broadcast(dayCounts(st.probed2, "n_crossings_d2", "n_new_tail_d2")))
        .crossJoin(broadcast(d2Contract))
        .crossJoin(broadcast(
          removedDocs.agg(count(lit(1)).as("n_removed_docs"))))
        .withColumn("resketch_equals_scratch", lit(st.resketchOk))
        .select("n_removed_docs", "n_exact_final", "exact_checksum",
          "n_tail_final", "tail_checksum", "n_crossings_d1", "n_new_tail_d1",
          "n_demoted", "n_dropped", "n_crossings_d2", "n_new_tail_d2",
          "no_false_negatives_d2", "resketch_equals_scratch")
    },
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |seg0 AS (SELECT doc_id, w,
       |    unnest(generate_series(0, (len(w) - 1) // 8)) AS c FROM ws),
       |st AS (SELECT doc_id,
       |    array_to_string(list_slice(w, c * 8 + 1, c * 8 + 8), ' ') AS t FROM seg0),
       |hh AS (SELECT doc_id, ${h32Sql("t")} AS h1, ${h32bSql("t")} AS h2 FROM st),
       |c0 AS (SELECT h1, h2, COUNT(*) AS df FROM hh
       |  WHERE doc_id % 10 NOT IN (0, 5) GROUP BY 1, 2),
       |c01 AS (SELECT h1, h2, COUNT(*) AS df FROM hh
       |  WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
       |r01 AS (SELECT h1, h2, COUNT(*) AS df FROM hh
       |  WHERE doc_id % 10 <> 0 AND doc_id % 9 <> 0 GROUP BY 1, 2),
       |cf AS (SELECT h1, h2, COUNT(*) AS df FROM hh
       |  WHERE doc_id % 9 <> 0 OR doc_id % 10 = 0 GROUP BY 1, 2),
       |x1 AS (SELECT
       |    CAST(SUM(CASE WHEN c01.df >= 2 AND COALESCE(c0.df, 0) <= 1
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings_d1,
       |    CAST(SUM(CASE WHEN c01.df = 1 AND c0.h1 IS NULL
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_new_tail_d1
       |  FROM c01 LEFT JOIN c0 ON c0.h1 = c01.h1 AND c0.h2 = c01.h2),
       |tr AS (SELECT
       |    CAST(SUM(CASE WHEN c01.df >= 2 AND r01.df = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_demoted,
       |    CAST(SUM(CASE WHEN r01.h1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_dropped
       |  FROM c01 LEFT JOIN r01 ON r01.h1 = c01.h1 AND r01.h2 = c01.h2),
       |x2 AS (SELECT
       |    CAST(SUM(CASE WHEN cf.df >= 2 AND COALESCE(r01.df, 0) <= 1
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings_d2,
       |    CAST(SUM(CASE WHEN cf.df = 1 AND r01.h1 IS NULL
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_new_tail_d2
       |  FROM cf LEFT JOIN r01 ON r01.h1 = cf.h1 AND r01.h2 = cf.h2),
       |nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_removed_docs FROM documents
       |  WHERE doc_id % 9 = 0 AND doc_id % 10 <> 0),
       |fin AS (SELECT
       |    CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_final,
       |    CAST(SUM(CASE WHEN df >= 2 THEN (h1 % 2147483647) * (h2 % 2147483647)
       |      % 2147483647 * (df % 2147483647) % 2147483647 ELSE 0 END)
       |      % 2147483647 AS BIGINT) AS exact_checksum,
       |    CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tail_final,
       |    CAST(SUM(CASE WHEN df = 1 THEN (h1 % 2147483647) * (h2 % 2147483647)
       |      % 2147483647 ELSE 0 END) % 2147483647 AS BIGINT) AS tail_checksum
       |  FROM cf)
       |SELECT nr.n_removed_docs, fin.n_exact_final, fin.exact_checksum,
       |  fin.n_tail_final, fin.tail_checksum, x1.n_crossings_d1,
       |  x1.n_new_tail_d1, tr.n_demoted, tr.n_dropped, x2.n_crossings_d2,
       |  x2.n_new_tail_d2, TRUE AS no_false_negatives_d2,
       |  TRUE AS resketch_equals_scratch
       |FROM fin CROSS JOIN x1 CROSS JOIN tr CROSS JOIN x2 CROSS JOIN nr""".stripMargin)

  private final case class X59State(
      srcRead: org.apache.spark.sql.DataFrame, hist: org.apache.spark.sql.DataFrame,
      state: org.apache.spark.sql.DataFrame, g1: org.apache.spark.sql.DataFrame,
      g2: org.apache.spark.sql.DataFrame, tombs: org.apache.spark.sql.DataFrame,
      art0: org.apache.spark.sql.DataFrame, artT: org.apache.spark.sql.DataFrame,
      manA: org.apache.spark.sql.DataFrame, manB: org.apache.spark.sql.DataFrame,
      epoch: Long, nVersions: Long, servingGen: Long, dup: Long)
  private val x59Cache =
    new java.util.concurrent.ConcurrentHashMap[String, X59State]()

  /** x59: THE GOVERNED PLATFORM, ONE TICKET END TO END — the r12 verdict's
    * capstone: every governance piece this engine grew separately (s33's
    * keyed request log over source/history/state, y27's ANN index
    * generations + serving pointer, x56/x58's tail-artifact subtract,
    * x57's published manifests) driven by ONE governance ticket
    * ("gdpr_0042") through FIVE stored artifacts as a single declared
    * DAG, with s33's idempotency discipline end to end. The sequence:
    *  1. the platform builds: a versioned event SOURCE (3 ingest pulls),
    *     its SCD2 HISTORY and keyed monoid STATE maintained off the
    *     change feed (s30's chain), the gen-1 norm-augmented ANN INDEX
    *     landed versioned, the segment-df TAIL ARTIFACT landed
    *     partitioned; manifest A over all five is PUBLISHED to a durable
    *     manifest store BEFORE the ticket (x57's barrier — its
    *     source/history aggregates read files the purge destroys);
    *  2. the ticket arrives, naming the data subject in each system's id
    *     space (users % 5 in events, vectors % 7, docs % 6 — one request,
    *     per-store predicates, exactly how a real DSR maps one subject
    *     across systems); its negative state delta lands DURABLY in the
    *     request log before any destructive leg;
    *  3. deliver() — marker check first (the applied marker IS the keyed
    *     state row), then the legs, EACH individually idempotent or
    *     guarded so a crash between any two converges on re-delivery:
    *     source epoch purge (request-keyed — a durable effect skips the
    *     rewrite AND the epoch), history partition delete (empty on
    *     re-run), vector tombstones via keyed update, the gen-2 rebuild
    *     guarded on existence (re-augmented — M₂ recomputes, y26's
    *     subtlety), the artifact subtract landed by overwrite, the
    *     serving-pointer promotion via keyed update, and LAST the keyed
    *     state append that is the marker;
    *  4. the ticket is delivered TWICE; the panel reads every store
    *     AFTER the second delivery, so hash equality against the oracle's
    *     once-applied from-scratch truth IS the idempotency proof —
    *     plus `state:dup_rows_applied` pinned 0;
    *  5. manifest B reads the post-ticket coordinates and the diff names
    *     every event: `lineage_restarted(1->2)` on the source (epoch
    *     axis), `regenerated(1->2)` on the ANN index (generation axis),
    *     content `changed` on history/state/artifact.
    * Output: a tall (entry, value) panel — store aggregates, decision
    * coordinates, and the diff verdicts encoded as entries — every row
    * recomputed by the oracle from raw-table membership with none of the
    * ten stores visible to it. Scale: builds are one pass per artifact at
    * ingest cadence; the ticket costs the purge's retained rewrite + a
    * partition-footprint delete + O(removed) subtract + one corpus pass
    * for the rebuild, all at governance cadence; re-delivery costs one
    * metadata probe. */
  private val x59GovernedPlatform = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, LongType}
      val M = lit(2147483647L)
      val t1 = 1704931200000000L
      val t2 = 1705795200000000L
      val ticket = "gdpr_0042"
      val ev = Tables.events(s, d)
        .withColumn("from_us", unix_micros(col("ts")))
        .select("event_id", "user_id", "event_type", "value", "from_us")
      val userPred = col("user_id") % 5 === 0
      val e = Tables.embeddings(s, d)
      val tombPred = col("vec_id") % 7 === 0
      val docs = Tables.documents(s, d)
      val docPred = col("doc_id") % 6 === 0
      val planes = 4
      val slices = Seq(
        col("from_us") < t1,
        col("from_us") >= t1 && col("from_us") < t2,
        col("from_us") >= t2)
      def partial(f: org.apache.spark.sql.DataFrame, rid: String) =
        f.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).as("s_dec"))
          .withColumn("request_id", lit(rid))
      def negDelta(f: org.apache.spark.sql.DataFrame) =
        f.filter(userPred).groupBy("event_type")
          .agg((-count(lit(1))).as("n"),
            (-sum(col("value").cast(DecimalType(18, 2)))).as("s_dec"))
          .withColumn("request_id", lit(ticket))
      def augIndex(corpus: org.apache.spark.sql.DataFrame) = {
        val base = corpus.select(col("vec_id"), col("embedding"))
          .withColumn("__nrm", Similarity.norm("embedding"))
        val m = base.agg(max(col("__nrm")).as("__mnorm"))
        base.crossJoin(broadcast(m))
          .withColumn("__s", sqrt(greatest(col("__mnorm") * col("__mnorm")
            - col("__nrm") * col("__nrm"), lit(0.0))).cast("float"))
          .withColumn("caug", concat(col("embedding"), array(col("__s"))))
          .withColumn("bucket", Similarity.hyperplaneBucket("caug", 65, planes))
          .select(col("vec_id"), col("bucket"))
      }
      def segsOf(f: org.apache.spark.sql.DataFrame) =
        TextAnalysis.chunkWords(f, "doc_id", "text", 8)
          .select(col("doc_id"),
            TextAnalysis.hash32(col("chunk_text")).as("h1"),
            TextAnalysis.hash32b(col("chunk_text")).as("h2"))
      def cntOf(f: org.apache.spark.sql.DataFrame) =
        segsOf(f).groupBy("h1", "h2").agg(count(lit(1)).as("df"))
      def subtracted(art: org.apache.spark.sql.DataFrame) = {
        val rem = segsOf(docs.filter(docPred))
          .groupBy("h1", "h2").agg(count(lit(1)).as("r"))
        art.join(rem, Seq("h1", "h2"), "left")
          .select(col("h1"), col("h2"),
            (col("df") - coalesce(col("r"), lit(0L))).cast(LongType).as("df"))
          .filter(col("df") >= 1)
      }
      // shared manifest aggregate definitions — A, B, and the oracle use
      // the SAME formulas, so the diff compares like with like
      def mrow(name: String, coord: Long, aggd: org.apache.spark.sql.DataFrame) =
        aggd.select(lit(name).as("artifact"), lit(coord).as("coord"),
          col("n_rows"), col("checksum"))
      def idAgg(f: org.apache.spark.sql.DataFrame, idCol: String) =
        f.agg(count(lit(1)).as("n_rows"),
          coalesce(pmod(sum((col(idCol) % M) * ((col(idCol) + 7) % M) % M), M),
            lit(0L)).cast(LongType).as("checksum"))
      def stateAgg(f: org.apache.spark.sql.DataFrame) =
        f.agg(count(lit(1)).as("n_rows"),
          coalesce(pmod(sum(pmod(col("n"), M)), M), lit(0L))
            .cast(LongType).as("checksum"))
      def annAgg(f: org.apache.spark.sql.DataFrame) =
        f.agg(count(lit(1)).as("n_rows"),
          coalesce(pmod(sum((col("vec_id") % M) * ((col("bucket") + 1) % M) % M), M),
            lit(0L)).cast(LongType).as("checksum"))
      def artAgg(f: org.apache.spark.sql.DataFrame) =
        f.agg(count(lit(1)).as("n_rows"),
          coalesce(pmod(sum((col("h1") % M) * (col("h2") % M) % M
            * (col("df") % M) % M), M), lit(0L)).cast(LongType).as("checksum"))
      val st =
        if (planOnly) {
          val retainedEv = ev.filter(!userPred)
          val w = Window.partitionBy("user_id", "event_type")
            .orderBy(col("from_us").asc, col("event_id").asc)
          def histOf(f: org.apache.spark.sql.DataFrame) =
            f.withColumn("valid_from", col("from_us"))
              .withColumn("valid_to", lead(col("from_us"), 1).over(w))
          val pulls = slices.zipWithIndex.map { case (c, i) =>
            partial(ev.filter(c), s"pull_v${i + 1}") }.reduce(_ unionByName _)
          val stateF = pulls.unionByName(negDelta(ev))
          val g1f = augIndex(e)
          val g2f = augIndex(e.filter(!tombPred))
          val a0 = cntOf(docs)
          val at = subtracted(a0)
          val manA = mrow("source", 1L, idAgg(ev, "event_id"))
            .unionByName(mrow("history", 0L, idAgg(ev, "event_id")))
            .unionByName(mrow("state", 0L, stateAgg(pulls)))
            .unionByName(mrow("ann_index", 1L, annAgg(g1f)))
            .unionByName(mrow("tail_artifact", 0L, artAgg(a0)))
          val manB = mrow("source", 2L, idAgg(retainedEv, "event_id"))
            .unionByName(mrow("history", 0L, idAgg(retainedEv, "event_id")))
            .unionByName(mrow("state", 0L, stateAgg(stateF)))
            .unionByName(mrow("ann_index", 2L, annAgg(g2f)))
            .unionByName(mrow("tail_artifact", 0L, artAgg(at)))
          X59State(retainedEv, histOf(retainedEv), stateF, g1f, g2f,
            e.filter(tombPred).select("vec_id"), a0, at, manA, manB,
            2L, 1L, 2L, 0L)
        } else x59Cache.computeIfAbsent(
          s"${s.sparkContext.applicationId}:$d", _ => {
          val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
            s"platform_${s.sparkContext.applicationId}_${math.abs(d.hashCode)}"
          val src = graft.sources.Store(s, s"$base/src", "event_type")
          val hst = graft.sources.Store(s, s"$base/hist", "event_type")
          val stt = graft.sources.Store(s, s"$base/state", "event_type")
          val req = graft.sources.Store(s, s"$base/req", "event_type")
          val g1 = graft.sources.Store(s, s"$base/gen1", "bucket")
          val g2 = graft.sources.Store(s, s"$base/gen2", "bucket")
          val tmb = graft.sources.Store(s, s"$base/tomb", "part")
          val ptr = graft.sources.Store(s, s"$base/ptr", "part")
          val a0s = graft.sources.Store(s, s"$base/art0", "part")
          val ats = graft.sources.Store(s, s"$base/artT", "part")
          val mst = graft.sources.Store(s, s"$base/manifest", "artifact")
          Seq(src, hst, stt, req, g1, g2, tmb, ptr, a0s, ats, mst)
            .foreach(_.destroy())
          // ---- the platform builds (ingest cadence) ----
          slices.foreach(c => src.appendVersioned(ev.filter(c)))
          (1L to 3L).foreach { v =>
            val delta = src.readChanges(v - 1, v)
            hst.upsertScd2(delta, Seq("user_id", "event_type"), "from_us",
              Seq(col("event_id")))
            stt.update(partial(delta, s"pull_v$v"),
              Seq("request_id", "event_type"))
          }
          g1.appendVersioned(augIndex(e))
          a0s.append(cntOf(docs).withColumn("part", pmod(col("h1"), lit(8))))
          val art0 = a0s.read.drop("part")
          // manifest A PUBLISHED before the ticket (durable barrier: its
          // source/history aggregates read files the purge destroys)
          mst.append(
            mrow("source", src.epoch, idAgg(src.read, "event_id"))
              .unionByName(mrow("history", 0L, idAgg(hst.read, "event_id")))
              .unionByName(mrow("state", 0L, stateAgg(stt.read)))
              .unionByName(mrow("ann_index", 1L, annAgg(g1.read)))
              .unionByName(mrow("tail_artifact", 0L, artAgg(art0))))
          // ---- the ticket arrives: its negative delta lands durably
          // BEFORE any destructive leg (re-delivery must never need the
          // doomed source rows)
          req.append(negDelta(ev))
          def deliver(): Long =
            if (stt.read.filter(col("request_id") === ticket)
                .limit(1).count() > 0) 0L
            else {
              src.purgeRestartLineage(userPred) // request-keyed: no 2nd rewrite
              hst.deleteWhere(userPred)         // empty on re-run
              tmb.update(e.filter(tombPred).select("vec_id")
                .withColumn("part", pmod(col("vec_id"), lit(4))), Seq("vec_id"))
              if (!g2.exists)                   // guarded: one rebuild
                g2.appendVersioned(augIndex(e.filter(!tombPred)))
              ats.destroy()                     // overwrite-idempotent
              ats.append(subtracted(art0)
                .withColumn("part", pmod(col("h1"), lit(8))))
              ptr.update(s.range(1).select(lit(2L).as("serving_gen"),
                lit(0).as("part")), Seq("serving_gen"))
              stt.update(req.read.filter(col("request_id") === ticket),
                Seq("request_id", "event_type")) // the marker, LAST
            }
          val first = deliver()
          require(first > 0L, "first delivery must apply the ticket")
          val dup = deliver() // the SAME ticket, delivered again
          val servingGen = ptr.read.agg(max(col("serving_gen"))).head().getLong(0)
          val serving = if (servingGen >= 2L) g2.read else g1.read
          val artT = ats.read.drop("part")
          val manB = mrow("source", src.epoch, idAgg(src.read, "event_id"))
            .unionByName(mrow("history", 0L, idAgg(hst.read, "event_id")))
            .unionByName(mrow("state", 0L, stateAgg(stt.read)))
            .unionByName(mrow("ann_index", servingGen, annAgg(serving)))
            .unionByName(mrow("tail_artifact", 0L, artAgg(artT)))
          X59State(src.read, hst.read, stt.read, g1.read, g2.read,
            tmb.read.select("vec_id"), art0, artT,
            mst.read.select("artifact", "coord", "n_rows", "checksum"), manB,
            src.epoch, src.versions.size.toLong, servingGen, dup)
        })
      def rows(aggd: org.apache.spark.sql.DataFrame, pairs: (String, String)*) =
        aggd.select(explode(map(pairs.flatMap { case (entry, c) =>
          Seq(lit(entry), col(c).cast(LongType)) }: _*)).as(Seq("entry", "value")))
      val srcRows = rows(st.srcRead.agg(
          count(lit(1)).as("nr"),
          coalesce(pmod(sum((col("event_id") % M) * ((col("event_id") + 7) % M) % M),
            M), lit(0L)).cast(LongType).as("ck"))
          .withColumn("ep", lit(st.epoch)).withColumn("nv", lit(st.nVersions)),
        "source:n_rows" -> "nr", "source:checksum" -> "ck",
        "source:epoch" -> "ep", "source:n_versions" -> "nv")
      val histRows = rows(st.hist.agg(
          count(lit(1)).as("nv2"),
          sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("nc"),
          (sum(col("value").cast(DecimalType(18, 2))) * 100)
            .cast(LongType).as("vc"),
          pmod(sum((col("event_id") % M) * ((col("event_id") + 7) % M) % M), M)
            .cast(LongType).as("ck")),
        "history:n_versions" -> "nv2", "history:n_current" -> "nc",
        "history:value_cents" -> "vc", "history:checksum" -> "ck")
      val stateRows = rows(st.state.agg(
          count(lit(1)).as("nr"),
          sum(col("n")).cast(LongType).as("ne"),
          (sum(col("s_dec")) * 100).cast(LongType).as("vc"),
          pmod(sum(pmod(col("n"), M)), M).cast(LongType).as("lat"))
          .withColumn("dup", lit(st.dup)),
        "state:n_rows" -> "nr", "state:n_events" -> "ne",
        "state:value_cents" -> "vc", "state:n_lattice" -> "lat",
        "state:dup_rows_applied" -> "dup")
      def annRows(f: org.apache.spark.sql.DataFrame, p: String) =
        rows(f.agg(count(lit(1)).as("nr"),
          coalesce(pmod(sum((col("vec_id") % M) * ((col("bucket") + 1) % M) % M),
            M), lit(0L)).cast(LongType).as("ck")),
          s"ann:${p}_rows" -> "nr", s"ann:${p}_checksum" -> "ck")
      val annMeta = rows(st.tombs.agg(count(lit(1)).as("tn"))
          .withColumn("sg", lit(st.servingGen)),
        "ann:tomb_rows" -> "tn", "ann:serving_gen" -> "sg")
      val artFinal = rows(st.artT.agg(
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("nx"),
          pmod(sum(when(col("df") >= 2, (col("h1") % M) * (col("h2") % M) % M
            * (col("df") % M) % M).otherwise(0L)), M).cast(LongType).as("xck"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("nt"),
          pmod(sum(when(col("df") === 1, (col("h1") % M) * (col("h2") % M) % M)
            .otherwise(0L)), M).cast(LongType).as("tck")),
        "artifact:n_exact" -> "nx", "artifact:exact_checksum" -> "xck",
        "artifact:n_tail" -> "nt", "artifact:tail_checksum" -> "tck")
      val artTrans = rows(
        st.art0.select(col("h1"), col("h2"), col("df").as("df0"))
          .join(st.artT.select(col("h1"), col("h2"), col("df").as("df1")),
            Seq("h1", "h2"), "left")
          .agg(sum(when(col("df0") >= 2 && col("df1") === 1, 1L).otherwise(0L))
              .as("nd"),
            sum(when(col("df1").isNull, 1L).otherwise(0L)).as("ndr")),
        "artifact:n_demoted" -> "nd", "artifact:n_dropped" -> "ndr")
      val a = st.manA.select(col("artifact"), col("coord").as("coa"),
        col("n_rows").as("na"), col("checksum").as("ca"))
      val b = st.manB.select(col("artifact"), col("coord").as("cob"),
        col("n_rows").as("nb"), col("checksum").as("cb"))
      val diffRows = a.join(b, Seq("artifact"), "full_outer")
        .select(concat(lit("diff:"), col("artifact"), lit(":"),
          when(col("na").isNull, lit("new"))
            .when(col("nb").isNull, lit("removed"))
            .when(col("coa") =!= col("cob"),
              when(col("artifact") === "ann_index",
                concat(lit("regenerated("), col("coa").cast("string"),
                  lit("->"), col("cob").cast("string"), lit(")")))
              .otherwise(concat(lit("lineage_restarted("),
                col("coa").cast("string"), lit("->"),
                col("cob").cast("string"), lit(")"))))
            .when(col("na") === col("nb") && col("ca") === col("cb"),
              lit("unchanged"))
            .otherwise(lit("changed"))).as("entry"),
          lit(1L).as("value"))
      Seq(srcRows, histRows, stateRows, annRows(st.g1, "gen1"),
        annRows(st.g2, "gen2"), annMeta, artFinal, artTrans, diffRows)
        .reduce(_ unionByName _)
        .orderBy("entry")
    },
    s"""WITH ev AS (SELECT event_id, user_id, event_type, value,
       |    epoch_us(ts) AS from_us FROM events),
       |retev AS (SELECT * FROM ev WHERE user_id % 5 <> 0),
       |h AS (SELECT event_id, value,
       |    LEAD(from_us, 1) OVER (
       |      PARTITION BY user_id, event_type ORDER BY from_us, event_id) AS to_us
       |  FROM retev),
       |sl AS (SELECT event_type, user_id, value,
       |    CASE WHEN from_us < 1704931200000000 THEN 1
       |         WHEN from_us < 1705795200000000 THEN 2 ELSE 3 END AS pull
       |  FROM ev),
       |pulls AS (SELECT pull, event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(CAST(value AS DECIMAL(18,2))) AS s FROM sl GROUP BY 1, 2),
       |neg AS (SELECT event_type, CAST(-COUNT(*) AS BIGINT) AS n,
       |    -SUM(CAST(value AS DECIMAL(18,2))) AS s
       |  FROM sl WHERE user_id % 5 = 0 GROUP BY 1),
       |strows AS (SELECT n, s FROM pulls UNION ALL SELECT n, s FROM neg),
       |v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |n2 AS (SELECT vec_id, vd, ${nrmSql("vd")} AS nrm FROM v),
       |retv AS (SELECT * FROM n2 WHERE vec_id % 7 <> 0),
       |m AS (SELECT MAX(nrm) AS mnorm FROM n2),
       |mr AS (SELECT MAX(nrm) AS mnorm FROM retv),
       |caug AS (SELECT vec_id, list_append(vd,
       |    CAST(CAST(sqrt(GREATEST(mnorm * mnorm - nrm * nrm, 0)) AS FLOAT)
       |      AS DOUBLE)) AS vd
       |  FROM n2 CROSS JOIN m),
       |car AS (SELECT vec_id, list_append(vd,
       |    CAST(CAST(sqrt(GREATEST(mnorm * mnorm - nrm * nrm, 0)) AS FLOAT)
       |      AS DOUBLE)) AS vd
       |  FROM retv CROSS JOIN mr),
       |cbk AS (SELECT vec_id, CAST(${bucketSqlFor(65, 4)} AS BIGINT) AS bucket
       |  FROM caug),
       |crbk AS (SELECT vec_id, CAST(${bucketSqlFor(65, 4)} AS BIGINT) AS bucket
       |  FROM car),
       |ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |seg0 AS (SELECT doc_id, w,
       |    unnest(generate_series(0, (len(w) - 1) // 8)) AS c FROM ws),
       |stg AS (SELECT doc_id,
       |    array_to_string(list_slice(w, c * 8 + 1, c * 8 + 8), ' ') AS t FROM seg0),
       |hh AS (SELECT doc_id, ${h32Sql("t")} AS h1, ${h32bSql("t")} AS h2 FROM stg),
       |ca0 AS (SELECT h1, h2, COUNT(*) AS df FROM hh GROUP BY 1, 2),
       |rt AS (SELECT h1, h2, COUNT(*) AS df FROM hh
       |  WHERE doc_id % 6 <> 0 GROUP BY 1, 2),
       |mah AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(COALESCE(SUM((event_id % 2147483647)
       |      * ((event_id + 7) % 2147483647) % 2147483647), 0)
       |      % 2147483647 AS BIGINT) AS ck FROM ev),
       |mbh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(COALESCE(SUM((event_id % 2147483647)
       |      * ((event_id + 7) % 2147483647) % 2147483647), 0)
       |      % 2147483647 AS BIGINT) AS ck FROM retev),
       |mas AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(COALESCE(SUM(((n % 2147483647) + 2147483647) % 2147483647), 0)
       |      % 2147483647 AS BIGINT) AS ck FROM pulls),
       |mbs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(COALESCE(SUM(((n % 2147483647) + 2147483647) % 2147483647), 0)
       |      % 2147483647 AS BIGINT) AS ck FROM strows),
       |maa AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(COALESCE(SUM((h1 % 2147483647) * (h2 % 2147483647) % 2147483647
       |      * (df % 2147483647) % 2147483647), 0) % 2147483647 AS BIGINT) AS ck
       |  FROM ca0),
       |mba AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(COALESCE(SUM((h1 % 2147483647) * (h2 % 2147483647) % 2147483647
       |      * (df % 2147483647) % 2147483647), 0) % 2147483647 AS BIGINT) AS ck
       |  FROM rt)
       |SELECT entry, value FROM (
       |SELECT 'source:n_rows' AS entry,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM retev) AS value
       |UNION ALL SELECT 'source:checksum',
       |  (SELECT CAST(COALESCE(SUM((event_id % 2147483647)
       |    * ((event_id + 7) % 2147483647) % 2147483647), 0)
       |    % 2147483647 AS BIGINT) FROM retev)
       |UNION ALL SELECT 'source:epoch', CAST(2 AS BIGINT)
       |UNION ALL SELECT 'source:n_versions', CAST(1 AS BIGINT)
       |UNION ALL SELECT 'history:n_versions',
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM h)
       |UNION ALL SELECT 'history:n_current',
       |  (SELECT CAST(SUM(CASE WHEN to_us IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |   FROM h)
       |UNION ALL SELECT 'history:value_cents',
       |  (SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) FROM h)
       |UNION ALL SELECT 'history:checksum',
       |  (SELECT CAST(COALESCE(SUM((event_id % 2147483647)
       |    * ((event_id + 7) % 2147483647) % 2147483647), 0)
       |    % 2147483647 AS BIGINT) FROM h)
       |UNION ALL SELECT 'state:n_rows',
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM strows)
       |UNION ALL SELECT 'state:n_events',
       |  (SELECT CAST(SUM(n) AS BIGINT) FROM strows)
       |UNION ALL SELECT 'state:value_cents',
       |  (SELECT CAST(SUM(s) * 100 AS BIGINT) FROM strows)
       |UNION ALL SELECT 'state:n_lattice',
       |  (SELECT CAST(COALESCE(SUM(((n % 2147483647) + 2147483647)
       |    % 2147483647), 0) % 2147483647 AS BIGINT) FROM strows)
       |UNION ALL SELECT 'state:dup_rows_applied', CAST(0 AS BIGINT)
       |UNION ALL SELECT 'ann:gen1_rows',
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cbk)
       |UNION ALL SELECT 'ann:gen1_checksum',
       |  (SELECT CAST(COALESCE(SUM((vec_id % 2147483647)
       |    * ((bucket + 1) % 2147483647) % 2147483647), 0)
       |    % 2147483647 AS BIGINT) FROM cbk)
       |UNION ALL SELECT 'ann:gen2_rows',
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM crbk)
       |UNION ALL SELECT 'ann:gen2_checksum',
       |  (SELECT CAST(COALESCE(SUM((vec_id % 2147483647)
       |    * ((bucket + 1) % 2147483647) % 2147483647), 0)
       |    % 2147483647 AS BIGINT) FROM crbk)
       |UNION ALL SELECT 'ann:tomb_rows',
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings WHERE vec_id % 7 = 0)
       |UNION ALL SELECT 'ann:serving_gen', CAST(2 AS BIGINT)
       |UNION ALL SELECT 'artifact:n_exact',
       |  (SELECT CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) FROM rt)
       |UNION ALL SELECT 'artifact:exact_checksum',
       |  (SELECT CAST(COALESCE(SUM(CASE WHEN df >= 2 THEN (h1 % 2147483647)
       |    * (h2 % 2147483647) % 2147483647 * (df % 2147483647) % 2147483647
       |    ELSE 0 END), 0) % 2147483647 AS BIGINT) FROM rt)
       |UNION ALL SELECT 'artifact:n_tail',
       |  (SELECT CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM rt)
       |UNION ALL SELECT 'artifact:tail_checksum',
       |  (SELECT CAST(COALESCE(SUM(CASE WHEN df = 1 THEN (h1 % 2147483647)
       |    * (h2 % 2147483647) % 2147483647 ELSE 0 END), 0)
       |    % 2147483647 AS BIGINT) FROM rt)
       |UNION ALL SELECT 'artifact:n_demoted',
       |  (SELECT CAST(SUM(CASE WHEN ca0.df >= 2 AND rt.df = 1 THEN 1 ELSE 0 END)
       |    AS BIGINT)
       |   FROM ca0 LEFT JOIN rt ON rt.h1 = ca0.h1 AND rt.h2 = ca0.h2)
       |UNION ALL SELECT 'artifact:n_dropped',
       |  (SELECT CAST(SUM(CASE WHEN rt.h1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |   FROM ca0 LEFT JOIN rt ON rt.h1 = ca0.h1 AND rt.h2 = ca0.h2)
       |UNION ALL SELECT 'diff:source:lineage_restarted(1->2)', CAST(1 AS BIGINT)
       |UNION ALL SELECT 'diff:ann_index:regenerated(1->2)', CAST(1 AS BIGINT)
       |UNION ALL SELECT 'diff:history:' ||
       |  (SELECT CASE WHEN a.n = b.n AND a.ck = b.ck THEN 'unchanged'
       |     ELSE 'changed' END FROM mah a, mbh b), CAST(1 AS BIGINT)
       |UNION ALL SELECT 'diff:state:' ||
       |  (SELECT CASE WHEN a.n = b.n AND a.ck = b.ck THEN 'unchanged'
       |     ELSE 'changed' END FROM mas a, mbs b), CAST(1 AS BIGINT)
       |UNION ALL SELECT 'diff:tail_artifact:' ||
       |  (SELECT CASE WHEN a.n = b.n AND a.ck = b.ck THEN 'unchanged'
       |     ELSE 'changed' END FROM maa a, mba b), CAST(1 AS BIGINT)
       |) t ORDER BY entry""".stripMargin)

  /** x49: PREPROCESSING front-half capstone — the CCNet-shaped chain every
    * web corpus runs BEFORE the quality/dedup lifecycle the other
    * capstones own, composed as ONE declared DAG over raw arrivals:
    *  1. NORMALIZE (z59's rung on z59's injected denormalization — case
    *     fold, collapse space runs, trim; everything downstream hashes
    *     canonical bytes);
    *  2. FREQUENCY BOILERPLATE SCRUB (x46's rung on the normalized text:
    *     aligned 8-word segments with corpus df ≥ 2 stripped, docs
    *     rebuilt; docs scrubbed to nothing DROP here);
    *  3. EXACT DEDUP on the scrubbed bytes (x1's rung — min-id per
    *     content hash; note the ORDER: dedup after scrub, because two
    *     docs differing only in boilerplate become exact duplicates only
    *     once the boilerplate is gone — the reason CCNet dedups after
    *     paragraph removal).
    * Per-source survivor/editing accounting plus the final-corpus content
    * checksum; the oracle replays the complete chain. Scale shape: each
    * stage is its component's shape (in-scan normalize, map-side
    * segmenter + combinable frequency + unhinted anti-join, one
    * content-hash groupBy) — composing them adds NO new shuffle class. */
  private val x49PreprocessPipeline = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val M = lit(2147483647L)
      val docs = Tables.documents(s, d)
      val arrived = when(col("doc_id") % 3 === 0,
          concat(upper(substring(col("text"), 1, 10)), expr("substring(text, 11)")))
        .when(col("doc_id") % 4 === 0, regexp_replace(col("text"), " ", "  "))
        .when(col("doc_id") % 5 === 0, concat(col("text"), lit("   ")))
        .otherwise(col("text"))
      val normed = docs.select(col("doc_id"), col("source"),
        trim(regexp_replace(lower(arrived), " +", " ")).as("ntext"))
      val segs = TextAnalysis.chunkWords(normed, "doc_id", "ntext", 8)
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"), col("chunk_text"),
          TextAnalysis.hash32(col("chunk_text")).as("h1"),
          TextAnalysis.hash32b(col("chunk_text")).as("h2"))
      val boiler = segs.groupBy("h1", "h2").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
      val rebuilt = segs.join(boiler.select("h1", "h2"), Seq("h1", "h2"), "left_anti")
        .groupBy("doc_id").agg(
          sum(col("n_tokens")).cast(LongType).as("toks_after"),
          array_join(transform(
            array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
            c => c.getField("chunk_text")), " ").as("stext"))
      val scrubbed = normed.join(rebuilt, Seq("doc_id"), "left")
        .withColumn("emptied", col("stext").isNull)
      val kept = scrubbed.filter(!col("emptied"))
        .withColumn("h", md5(col("stext")))
      val keepIds = kept.groupBy("h").agg(min(col("doc_id")).as("doc_id"))
      val fin = kept.join(keepIds, Seq("h", "doc_id"), "left_semi")
      val inventory = boiler.agg(count(lit(1)).as("n_boiler_segments"))
      val perSrc = scrubbed.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("ntext"), " "))).cast(LongType).as("toks_normalized"),
        sum(coalesce(col("toks_after"), lit(0L))).cast(LongType).as("toks_scrubbed"),
        sum(when(col("emptied"), 1L).otherwise(0L)).as("n_emptied"))
      val finSrc = fin.groupBy("source").agg(
        count(lit(1)).as("n_final"),
        pmod(sum(pmod(TextAnalysis.hash32(col("stext")), M)), M)
          .cast(LongType).as("final_checksum"))
      perSrc.join(finSrc, Seq("source"), "left")
        .na.fill(0L, Seq("n_final", "final_checksum"))
        .crossJoin(broadcast(inventory))
        .withColumn("n_dup_dropped",
          col("n_docs") - col("n_emptied") - col("n_final"))
        .select("source", "n_docs", "toks_normalized", "toks_scrubbed",
          "n_emptied", "n_dup_dropped", "n_final", "final_checksum",
          "n_boiler_segments")
        .orderBy("source")
    },
    s"""WITH a0 AS (SELECT doc_id, source,
       |    CASE WHEN doc_id % 3 = 0 THEN upper(substring(text, 1, 10)) || substring(text, 11)
       |         WHEN doc_id % 4 = 0 THEN replace(text, ' ', '  ')
       |         WHEN doc_id % 5 = 0 THEN text || '   '
       |         ELSE text END AS arrived
       |  FROM documents),
       |nrm AS (SELECT doc_id, source,
       |    trim(regexp_replace(lower(arrived), ' +', ' ', 'g')) AS ntext FROM a0),
       |ws AS (SELECT doc_id, source, ntext, string_split(ntext, ' ') AS w FROM nrm),
       |seg0 AS (SELECT doc_id, w, unnest(generate_series(0, (len(w) - 1) // 8)) AS c FROM ws),
       |st AS (SELECT doc_id, c, list_slice(w, c * 8 + 1, c * 8 + 8) AS cw FROM seg0),
       |hh AS (SELECT doc_id, c, len(cw) AS nt, array_to_string(cw, ' ') AS t,
       |    ${h32Sql("array_to_string(cw, ' ')")} AS h1,
       |    ${h32bSql("array_to_string(cw, ' ')")} AS h2
       |  FROM st),
       |f AS (SELECT h1, h2, COUNT(*) AS df FROM hh GROUP BY 1, 2),
       |boiler AS (SELECT h1, h2 FROM f WHERE df >= 2),
       |keptseg AS (SELECT hh.* FROM hh
       |  WHERE NOT EXISTS (SELECT 1 FROM boiler b WHERE b.h1 = hh.h1 AND b.h2 = hh.h2)),
       |reb AS (SELECT doc_id, CAST(SUM(nt) AS BIGINT) AS toks_after,
       |    string_agg(t, ' ' ORDER BY c) AS stext
       |  FROM keptseg GROUP BY 1),
       |scr AS (SELECT n.doc_id, n.source, n.ntext, r.toks_after, r.stext,
       |    r.stext IS NULL AS emptied
       |  FROM nrm n LEFT JOIN reb r ON r.doc_id = n.doc_id),
       |keep AS (SELECT md5(stext) AS h, min(doc_id) AS doc_id FROM scr
       |  WHERE NOT emptied GROUP BY 1),
       |fin AS (SELECT s.* FROM scr s JOIN keep k
       |  ON k.doc_id = s.doc_id AND k.h = md5(s.stext)),
       |inv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_boiler_segments FROM boiler),
       |ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(string_split(ntext, ' '))) AS BIGINT) AS toks_normalized,
       |    CAST(SUM(COALESCE(toks_after, 0)) AS BIGINT) AS toks_scrubbed,
       |    CAST(SUM(CASE WHEN emptied THEN 1 ELSE 0 END) AS BIGINT) AS n_emptied
       |  FROM scr GROUP BY 1),
       |fs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_final,
       |    CAST(SUM(${h32Sql("stext")} % 2147483647) % 2147483647 AS BIGINT)
       |      AS final_checksum
       |  FROM fin GROUP BY 1)
       |SELECT ps.source, ps.n_docs, ps.toks_normalized, ps.toks_scrubbed,
       |  ps.n_emptied,
       |  ps.n_docs - ps.n_emptied - COALESCE(fs.n_final, 0) AS n_dup_dropped,
       |  CAST(COALESCE(fs.n_final, 0) AS BIGINT) AS n_final,
       |  CAST(COALESCE(fs.final_checksum, 0) AS BIGINT) AS final_checksum,
       |  inv.n_boiler_segments
       |FROM ps LEFT JOIN fs ON fs.source = ps.source CROSS JOIN inv
       |ORDER BY ps.source""".stripMargin)

  /** z61: EXACT AUC for the quality classifier — the evaluation panel a
    * gate owner reads before trusting z14/z42's cutoffs: per language,
    * the Mann–Whitney rank-sum AUC of the hashing-trick score against
    * the source-set labels, computed EXACTLY (average ranks for tied
    * scores are half-integers — carried as 2·rank integers so every
    * intermediate is integer arithmetic; the final AUC is one IEEE
    * division of exact longs), plus the threshold-0 confusion counts
    * (z14's keep gate) so ranking quality and the operating point sit in
    * one relation. Scale shape: scores are the in-scan zero-shuffle fold;
    * ranks come from [[Relational.groupedRowNumber]]'s two-pass
    * range-partition rank — NOT a `PARTITION BY lang` window, whose
    * single task would hold one language's ENTIRE corpus at 100 TB (the
    * skew funnel groupedNtile/runningTotal exist for); tie-averaging
    * joins a distinct-score relation back, group-sized. A single-class
    * language (all-positive or all-negative) reports NULL auc rather
    * than dividing by zero — Spark and DuckDB disagree on x/0, so the
    * guard is also what keeps the gate portable. */
  private val z61ClassifierAuc = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val docs = Tables.documents(s, d)
        .withColumn("ws", split(col("text"), " "))
        .select(col("doc_id"), col("lang"),
          TextAnalysis.classifierScore("ws").as("score"),
          col("source").isin("src0", "src3", "src6", "src9").as("pos"))
      val ranked = Relational.groupedRowNumber(
        docs, Seq("lang"), Seq("score", "doc_id"), "rn")
      // average rank per tied score, as 2·rank (integer-exact): min+max
      val tie = ranked.groupBy("lang", "score")
        .agg((min(col("rn")) + max(col("rn"))).as("r2"))
      val withR = ranked.join(tie, Seq("lang", "score"))
      withR.groupBy("lang").agg(
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
          sum(when(!col("pos"), 1L).otherwise(0L)).as("n_neg"),
          sum(when(col("pos"), col("r2").cast(LongType)).otherwise(0L)).as("r2sum"),
          sum(when(col("pos") && col("score") > 0, 1L).otherwise(0L)).as("tp"),
          sum(when(!col("pos") && col("score") > 0, 1L).otherwise(0L)).as("fp"),
          sum(when(col("pos") && !(col("score") > 0), 1L).otherwise(0L)).as("fn"),
          sum(when(!col("pos") && !(col("score") > 0), 1L).otherwise(0L)).as("tn"))
        .withColumn("auc",
          when(col("n_pos") > 0 && col("n_neg") > 0,
            (col("r2sum") - col("n_pos") * (col("n_pos") + 1)).cast("double")
              / (lit(2L) * col("n_pos") * col("n_neg"))))
        .select("lang", "n_pos", "n_neg", "auc", "tp", "fp", "fn", "tn")
        .orderBy("lang")
    },
    s"""WITH sc AS (SELECT doc_id, lang,
       |    ${classifierScoreSql("string_split(text, ' ')")} AS score,
       |    source IN ('src0', 'src3', 'src6', 'src9') AS pos
       |  FROM documents),
       |rk AS (SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY lang ORDER BY score, doc_id) AS rn FROM sc),
       |tie AS (SELECT lang, score, MIN(rn) + MAX(rn) AS r2
       |  FROM rk GROUP BY 1, 2),
       |wr AS (SELECT rk.*, tie.r2 FROM rk JOIN tie
       |  ON tie.lang = rk.lang AND tie.score = rk.score)
       |SELECT lang,
       |  CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  CAST(SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
       |  CASE WHEN SUM(CASE WHEN pos THEN 1 ELSE 0 END) > 0
       |        AND SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) > 0
       |   THEN CAST(SUM(CASE WHEN pos THEN r2 ELSE 0 END)
       |      - SUM(CASE WHEN pos THEN 1 ELSE 0 END)
       |        * (SUM(CASE WHEN pos THEN 1 ELSE 0 END) + 1) AS DOUBLE)
       |    / (2 * SUM(CASE WHEN pos THEN 1 ELSE 0 END)
       |         * SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END))
       |   ELSE NULL END AS auc,
       |  CAST(SUM(CASE WHEN pos AND score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(SUM(CASE WHEN NOT pos AND score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(SUM(CASE WHEN pos AND NOT score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |  CAST(SUM(CASE WHEN NOT pos AND NOT score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |FROM wr GROUP BY 1 ORDER BY 1""".stripMargin)

  /** z59: TEXT NORMALIZATION round-trip — the preprocessing rung every
    * text pipeline runs before hashing/shingling (case folding,
    * whitespace collapse, trim): un-normalized text makes EVERY
    * downstream fingerprint miss (the same sentence with a doubled space
    * has a different md5, different shingles, different minhash — dedup
    * and decontamination silently degrade). Deterministic denormalization
    * injection makes the rung testable end-to-end against this corpus
    * (which is already canonical): doc%3 arrives case-mangled, doc%4
    * space-doubled, doc%5 padded — the normalizer (lower → collapse runs
    * of spaces → trim) must restore every injected doc to its original
    * bytes, and the panel proves it per source (n_restored == n_docs)
    * plus idempotence (normalize∘normalize ≡ normalize — the property
    * that lets the op run at ingest AND defensively before hashing
    * without double-spending). Pure in-scan string expressions feeding
    * one combinable aggregate — rides the ingest scan for free. */
  private val z59NormalizeRoundtrip = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val docs = Tables.documents(s, d)
      val arrived = when(col("doc_id") % 3 === 0,
          concat(upper(substring(col("text"), 1, 10)), expr("substring(text, 11)")))
        .when(col("doc_id") % 4 === 0,
          regexp_replace(col("text"), " ", "  "))
        .when(col("doc_id") % 5 === 0, concat(col("text"), lit("   ")))
        .otherwise(col("text"))
      def normalize(c: Column): Column =
        trim(regexp_replace(lower(c), " +", " "))
      val a = docs.select(col("doc_id"), col("source"), col("text"),
          arrived.as("arrived"))
        .withColumn("norm", normalize(col("arrived")))
        .withColumn("denormalized", col("arrived") =!= col("text"))
        .withColumn("restored", col("norm") === col("text"))
        .withColumn("idempotent", normalize(col("norm")) === col("norm"))
      a.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("denormalized"), 1L).otherwise(0L)).as("n_denormalized"),
          sum(when(col("restored"), 1L).otherwise(0L)).as("n_restored"),
          sum(when(col("idempotent"), 1L).otherwise(0L)).as("n_idempotent"),
          sum(length(col("arrived"))).cast(LongType).as("chars_arrived"),
          sum(length(col("norm"))).cast(LongType).as("chars_normalized"))
        .orderBy("source")
    },
    """WITH a0 AS (SELECT doc_id, source, text,
      |    CASE WHEN doc_id % 3 = 0 THEN upper(substring(text, 1, 10)) || substring(text, 11)
      |         WHEN doc_id % 4 = 0 THEN replace(text, ' ', '  ')
      |         WHEN doc_id % 5 = 0 THEN text || '   '
      |         ELSE text END AS arrived
      |  FROM documents),
      |a AS (SELECT doc_id, source, text, arrived,
      |    trim(regexp_replace(lower(arrived), ' +', ' ', 'g')) AS norm
      |  FROM a0)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN arrived <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_denormalized,
      |  CAST(SUM(CASE WHEN norm = text THEN 1 ELSE 0 END) AS BIGINT) AS n_restored,
      |  CAST(SUM(CASE WHEN trim(regexp_replace(lower(norm), ' +', ' ', 'g')) = norm
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_idempotent,
      |  CAST(SUM(length(arrived)) AS BIGINT) AS chars_arrived,
      |  CAST(SUM(length(norm)) AS BIGINT) AS chars_normalized
      |FROM a GROUP BY 1 ORDER BY 1""".stripMargin)

  /** z58: DEDUP SCOPE panel — global vs per-source deduplication, the
    * policy question the FineWeb ablations made famous (dedup within each
    * crawl dump vs across the whole corpus changes both cost and model
    * quality): under the PER-SOURCE policy each source dedups
    * independently (embarrassingly parallel, no cross-source shuffle —
    * the cheap arm), under the GLOBAL policy the whole corpus shares one
    * hash/cluster space. The panel prices the difference in data: per
    * source, survivors under all four arms (exact × near-dup, global ×
    * local — global survivors attributed to the keeper's source), plus
    * the corpus-wide count of CROSS-SOURCE candidate pairs — exactly the
    * duplicates the local policy structurally cannot see. Both near-dup
    * arms read ONE clustering (the x8 capped-LSH CC — the local arm
    * re-groups the same labels by (source, cluster), never re-clusters);
    * the exact arms are two combinable groupBys on the content hash. */
  private val z58DedupScope = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val docs = Tables.documents(s, d)
      val srcOf = docs.select(col("doc_id"), col("source"))
      val hashed = docs.select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      val exactGlobal = hashed.groupBy("h").agg(min(col("doc_id")).as("doc_id"))
        .join(srcOf, Seq("doc_id"))
        .groupBy("source").agg(count(lit(1)).as("n_exact_global"))
      val exactLocal = hashed.groupBy("source", "h")
        .agg(min(col("doc_id")).as("doc_id"))
        .groupBy("source").agg(count(lit(1)).as("n_exact_local"))
      // the pair relation feeds BOTH the clustering and the cross-source
      // count — pin it so the LSH chain (shingle → signature → buckets)
      // runs once (plan-only constructions stay action-free)
      val pairsRaw = Dedup.lshCandidates(minhashSig(s, d), "doc_id", 8,
        maxBucket = Some(X2MaxBucket))
      val pairs =
        if (planOnly) pairsRaw else graft.Housekeeping.pin(s)(pairsRaw).df
      val labels = Dedup.connectedComponents(pairs, docs, "doc_id")
        .select("doc_id", "cluster_id")
        .join(srcOf, Seq("doc_id"))
      val ndGlobal = labels.groupBy("cluster_id").agg(min(col("doc_id")).as("doc_id"))
        .join(srcOf, Seq("doc_id"))
        .groupBy("source").agg(count(lit(1)).as("n_neardup_global"))
      val ndLocal = labels.groupBy("source", "cluster_id")
        .agg(min(col("doc_id")).as("doc_id"))
        .groupBy("source").agg(count(lit(1)).as("n_neardup_local"))
      val cross = pairs
        .join(srcOf.select(col("doc_id").as("doc_a"), col("source").as("sa")), Seq("doc_a"))
        .join(srcOf.select(col("doc_id").as("doc_b"), col("source").as("sb")), Seq("doc_b"))
        .agg(count(lit(1)).cast(LongType).as("n_candidate_pairs"),
          sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L))
            .cast(LongType).as("n_cross_source_pairs"))
      docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .join(exactGlobal, Seq("source"), "left")
        .join(exactLocal, Seq("source"), "left")
        .join(ndGlobal, Seq("source"), "left")
        .join(ndLocal, Seq("source"), "left")
        .na.fill(0L, Seq("n_exact_global", "n_exact_local",
          "n_neardup_global", "n_neardup_local"))
        .crossJoin(broadcast(cross))
        .orderBy("source")
    },
    s"""WITH RECURSIVE $minhashCtes,
       |${cappedBandsCte(bandsSql)},
       |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
       |          UNION ALL SELECT doc_b, doc_a FROM p),
       |reach(node, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.node),
       |comp AS (SELECT node, min(r) AS cid FROM reach GROUP BY 1),
       |lbl AS (SELECT d.doc_id, d.source, COALESCE(comp.cid, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN comp ON comp.node = d.doc_id),
       |eg AS (SELECT d2.source, COUNT(*) AS n FROM (
       |    SELECT md5(text) AS h, min(doc_id) AS keep FROM documents GROUP BY 1) k
       |  JOIN documents d2 ON d2.doc_id = k.keep GROUP BY 1),
       |el AS (SELECT source, COUNT(*) AS n FROM (
       |    SELECT source, md5(text) AS h, min(doc_id) AS keep
       |    FROM documents GROUP BY 1, 2) k GROUP BY 1),
       |ng AS (SELECT d2.source, COUNT(*) AS n FROM (
       |    SELECT cluster_id, min(doc_id) AS keep FROM lbl GROUP BY 1) k
       |  JOIN documents d2 ON d2.doc_id = k.keep GROUP BY 1),
       |nl AS (SELECT source, COUNT(*) AS n FROM (
       |    SELECT source, cluster_id, min(doc_id) AS keep FROM lbl GROUP BY 1, 2) k
       |  GROUP BY 1),
       |crs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
       |    CAST(SUM(CASE WHEN da.source <> db.source THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_cross_source_pairs
       |  FROM p JOIN documents da ON da.doc_id = p.doc_a
       |  JOIN documents db ON db.doc_id = p.doc_b),
       |base AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY 1)
       |SELECT b.source, b.n_docs,
       |  CAST(COALESCE(eg.n, 0) AS BIGINT) AS n_exact_global,
       |  CAST(COALESCE(el.n, 0) AS BIGINT) AS n_exact_local,
       |  CAST(COALESCE(ng.n, 0) AS BIGINT) AS n_neardup_global,
       |  CAST(COALESCE(nl.n, 0) AS BIGINT) AS n_neardup_local,
       |  crs.n_candidate_pairs, crs.n_cross_source_pairs
       |FROM base b
       |LEFT JOIN eg ON eg.source = b.source
       |LEFT JOIN el ON el.source = b.source
       |LEFT JOIN ng ON ng.source = b.source
       |LEFT JOIN nl ON nl.source = b.source
       |CROSS JOIN crs
       |ORDER BY b.source""".stripMargin)

  private val x48Built = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()

  /** The stored base segment-frequency table for x48: (h1, h2, df) over the
    * base corpus, hash-partitioned and tracked through the Store. */
  private def x48FreqStored(s: SparkSession, d: String,
                            built: org.apache.spark.sql.DataFrame) =
    x48Built.computeIfAbsent(s"${s.sparkContext.applicationId}:$d", _ => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
        s"segfreq_${s.sparkContext.applicationId}_${Integer.toHexString(d.hashCode)}"
      val store = graft.sources.Store(s, path, "part")
      store.destroy()
      val withPart = built.withColumn("part", pmod(col("h1"), lit(8)))
      store.append(withPart)
      sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
      val back = readOrEmpty(store, withPart)
      val M = lit(2147483647L)
      store.trackFrom(back,
        (col("h1") % M) * (col("h2") % M) % M * (col("df") % M) % M)
      back.drop("part")
    })

  /** x48: BOILERPLATE-INVENTORY MAINTENANCE — x46's artifact gets the same
    * E2 story every other stored artifact has (x39's map, y18's index,
    * x40's LM): the base corpus's segment-frequency table lives in a
    * tracked, hash-partitioned Store; a day's arrivals contribute their
    * own combinable counts; the merge is ADDITIVE (sum by key — exactly
    * Lm.mergeCounts' shape), so incremental maintenance is O(batch +
    * touched keys), never a corpus re-scan. The interesting output is the
    * THRESHOLD CROSSINGS: segments whose merged df reaches minDf only
    * because of today's arrivals are NEW boilerplate, and the panel
    * reports both the inventory growth and how many BASE docs carry a
    * newly-flagged segment (the touched-only re-edit set — the corpus
    * analog of x39's touched-cluster relabel). The batch itself is
    * scrubbed against the MERGED inventory. Oracle recomputes everything
    * from the full corpus (additivity means merged counts ≡ from-scratch
    * counts; the gate proves the Store round-trip + merge lands there,
    * checksum included). */
  private val x48InventoryMaintenance = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val M = lit(2147483647L)
      val k = 8
      val docs = Tables.documents(s, d)
      def segsOf(df: org.apache.spark.sql.DataFrame) =
        TextAnalysis.chunkWords(df, "doc_id", "text", k)
          .select(col("doc_id"), col("n_tokens"),
            TextAnalysis.hash32(col("chunk_text")).as("h1"),
            TextAnalysis.hash32b(col("chunk_text")).as("h2"))
      val baseCnt = segsOf(docs.filter(col("doc_id") % 10 =!= 0))
        .groupBy("h1", "h2").agg(count(lit(1)).as("df"))
      val stored =
        if (planOnly) baseCnt else x48FreqStored(s, d, baseCnt)
      val batchSegs = segsOf(docs.filter(col("doc_id") % 10 === 0))
      val batchCnt = batchSegs.groupBy("h1", "h2").agg(count(lit(1)).as("df"))
      val merged = stored.unionByName(batchCnt)
        .groupBy("h1", "h2").agg(sum(col("df")).cast(LongType).as("df"))
      val boiler = merged.filter(col("df") >= 2)
      val newBoiler = boiler
        .join(stored.select(col("h1"), col("h2"), col("df").as("df_base")),
          Seq("h1", "h2"), "left")
        .filter(coalesce(col("df_base"), lit(0L)) < 2)
        .select("h1", "h2")
      val touched = segsOf(docs.filter(col("doc_id") % 10 =!= 0))
        .join(newBoiler, Seq("h1", "h2"), "left_semi")
        .agg(countDistinct(col("doc_id")).as("n_base_docs_touched"))
      val inv = merged.agg(
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("inventory_after"),
        pmod(sum((col("h1") % M) * (col("h2") % M) % M * (col("df") % M) % M), M)
          .cast(LongType).as("freq_checksum"))
      val invBefore = stored.agg(
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("inventory_before"))
      val keptBatch = batchSegs.join(boiler.select("h1", "h2"), Seq("h1", "h2"), "left_anti")
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_kept"),
          sum(col("n_tokens")).cast(LongType).as("toks_after"))
      val panel = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast(LongType).as("toks_before"))
        .join(batchSegs.groupBy("doc_id").agg(count(lit(1)).as("n_segs")), Seq("doc_id"))
        .join(keptBatch, Seq("doc_id"), "left")
        .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
        .withColumn("toks_after", coalesce(col("toks_after"), lit(0L)))
      panel.groupBy("source").agg(
          count(lit(1)).as("n_batch_docs"),
          sum(col("n_segs")).cast(LongType).as("n_segs"),
          sum(col("n_segs") - col("n_kept")).cast(LongType).as("n_segs_dropped"),
          sum(col("toks_before")).cast(LongType).as("toks_before"),
          sum(col("toks_after")).cast(LongType).as("toks_after"),
          sum(when(col("n_kept") === 0, 1L).otherwise(0L)).as("n_docs_emptied"))
        .crossJoin(broadcast(invBefore))
        .crossJoin(broadcast(inv))
        .crossJoin(broadcast(
          newBoiler.agg(count(lit(1)).as("n_new_boiler"))))
        .crossJoin(broadcast(touched))
        .orderBy("source")
    },
    s"""WITH ws AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       |seg0 AS (SELECT doc_id, source, w,
       |    unnest(generate_series(0, (len(w) - 1) // 8)) AS c FROM ws),
       |st AS (SELECT doc_id, source, c, list_slice(w, c * 8 + 1, c * 8 + 8) AS cw FROM seg0),
       |hh AS (SELECT doc_id, source, len(cw) AS nt,
       |    ${h32Sql("array_to_string(cw, ' ')")} AS h1,
       |    ${h32bSql("array_to_string(cw, ' ')")} AS h2
       |  FROM st),
       |cb AS (SELECT h1, h2, COUNT(*) AS df FROM hh WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
       |fc AS (SELECT h1, h2, COUNT(*) AS df FROM hh GROUP BY 1, 2),
       |boiler AS (SELECT h1, h2 FROM fc WHERE df >= 2),
       |newb AS (SELECT f.h1, f.h2 FROM fc f
       |  LEFT JOIN cb ON cb.h1 = f.h1 AND cb.h2 = f.h2
       |  WHERE f.df >= 2 AND COALESCE(cb.df, 0) < 2),
       |tch AS (SELECT CAST(COUNT(DISTINCT hh.doc_id) AS BIGINT) AS n_base_docs_touched
       |  FROM hh JOIN newb ON newb.h1 = hh.h1 AND newb.h2 = hh.h2
       |  WHERE hh.doc_id % 10 <> 0),
       |inv AS (SELECT
       |    CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS inventory_after,
       |    CAST(SUM((h1 % 2147483647) * (h2 % 2147483647) % 2147483647
       |      * (df % 2147483647) % 2147483647) % 2147483647 AS BIGINT) AS freq_checksum
       |  FROM fc),
       |invb AS (SELECT CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS inventory_before FROM cb),
       |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_new_boiler FROM newb),
       |kept AS (SELECT hh.doc_id, COUNT(*) AS n_kept, CAST(SUM(nt) AS BIGINT) AS toks_after
       |  FROM hh WHERE doc_id % 10 = 0
       |    AND NOT EXISTS (SELECT 1 FROM boiler b WHERE b.h1 = hh.h1 AND b.h2 = hh.h2)
       |  GROUP BY 1),
       |segc AS (SELECT doc_id, COUNT(*) AS n_segs FROM hh WHERE doc_id % 10 = 0 GROUP BY 1),
       |pd AS (SELECT d.doc_id, d.source,
       |    len(string_split(d.text, ' ')) AS toks_before,
       |    s.n_segs, COALESCE(kk.n_kept, 0) AS n_kept,
       |    COALESCE(kk.toks_after, 0) AS toks_after
       |  FROM documents d JOIN segc s ON s.doc_id = d.doc_id
       |  LEFT JOIN kept kk ON kk.doc_id = d.doc_id
       |  WHERE d.doc_id % 10 = 0)
       |SELECT pd.source, CAST(COUNT(*) AS BIGINT) AS n_batch_docs,
       |  CAST(SUM(n_segs) AS BIGINT) AS n_segs,
       |  CAST(SUM(n_segs - n_kept) AS BIGINT) AS n_segs_dropped,
       |  CAST(SUM(toks_before) AS BIGINT) AS toks_before,
       |  CAST(SUM(toks_after) AS BIGINT) AS toks_after,
       |  CAST(SUM(CASE WHEN n_kept = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_emptied,
       |  invb.inventory_before, inv.inventory_after, inv.freq_checksum,
       |  nb.n_new_boiler, tch.n_base_docs_touched
       |FROM pd CROSS JOIN invb CROSS JOIN inv CROSS JOIN nb CROSS JOIN tch
       |GROUP BY pd.source, invb.inventory_before, inv.inventory_after,
       |  inv.freq_checksum, nb.n_new_boiler, tch.n_base_docs_touched
       |ORDER BY pd.source""".stripMargin)

  /** x51: INVENTORY TAIL POLICY — the artifact-size answer for x48's
    * stored frequency table, whose df=1 tail dwarfs the inventory proper
    * (29,268 tail rows vs 1,303 exact rows at the 10× SF; at web scale
    * the tail is billions of rows kept ONLY so tomorrow's second
    * occurrence can be detected). The split: exact rows for df ≥ minDf
    * (the inventory itself, small), a Count-Min sketch (z25's
    * `count_min_sketch` aggregate + `graft_cms_estimate` probe, fixed
    * seed) for the df=1 tail. Merge-time crossing detection against the
    * compressed artifact is EXACT-OR-BOUNDED-FP, the x6/x12 contract
    * shape: a true crossing is NEVER missed (`no_false_negatives` — CMS
    * structurally cannot under-count, so df_base=1 always probes ≥ 1;
    * in-batch duplicates are detected from the batch's own counts), and
    * spurious crossings (df_base=0 keys whose probe collides to ≥ 1)
    * are bounded by the occupancy model — `fp_within_bound` checks
    * measured FPs ≤ 5·probes·(1−e^(−n_tail/w))^d + 1 with w=20000, d=7
    * (Spark's eps=1e-4/conf=0.99 sizing), both booleans oracle-gated as
    * contracts, FP integers pinned in ExtensionsSpec. FPs only ever
    * scrub MORE — the conservative direction, same as the span Bloom.
    * Scale notes the panel is honest about: for pure minDf=2 MEMBERSHIP
    * a Bloom at ~10 bits/key beats the CMS ~60×; the CMS is the general
    * form (minDf > 2 needs tail COUNTS, and the same artifact answers
    * z25-style frequency reads), and its width scales as w ∝ tail/0.15
    * to hold the FP bound — still a constant-bytes-per-key collapse
    * versus the 16-byte exact rows, and the sketch is one mergeable
    * blob per shard instead of a shuffled table. This panel models
    * BUILD-TIME FPs; after k maintenance days the occupancy input is
    * the residue-CARRYING item count, not the clean tail — x55's
    * `fp_within_bound` closes that loop (its bound takes the
    * accumulated additions x54/x55 price exactly as `sketch_residue`). */
  private val x51InventoryTailPolicy = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val k = 8
      val docs = Tables.documents(s, d)
      def segsOf(df: org.apache.spark.sql.DataFrame) =
        TextAnalysis.chunkWords(df, "doc_id", "text", k)
          .select(col("doc_id"),
            TextAnalysis.hash32(col("chunk_text")).as("h1"),
            TextAnalysis.hash32b(col("chunk_text")).as("h2"))
      val baseCnt0 = segsOf(docs.filter(col("doc_id") % 10 =!= 0))
        .groupBy("h1", "h2").agg(count(lit(1)).as("df"))
      // three consumers (exact part, tail → sketch collect, tail → probe
      // attach) — pin so the corpus pays one segment pass
      val baseCnt = if (planOnly) baseCnt0
        else graft.Housekeeping.pin(s)(baseCnt0).df
      val exactPart = baseCnt.filter(col("df") >= 2)
      val tail = baseCnt.filter(col("df") === 1)
      // sketch collected once at build and inlined as a plan LITERAL (the
      // Bloom-transport precedent, same as x54): the ~1 MB blob rides the
      // task binary once per executor and CmsEstimate's decode cache hits
      // by reference — never attached as a per-row column of the batch
      val sk = tail
        .withColumn("key", concat_ws(":", col("h1"), col("h2")))
        .agg(expr("count_min_sketch(key, CAST(0.0001 AS DOUBLE), " +
            "CAST(0.99 AS DOUBLE), 42)").as("sk"),
          count(lit(1)).as("n_tail_rows"))
      val (skBytes, nTailRows): (Array[Byte], Long) =
        if (planOnly) (Array.empty[Byte], 0L)
        else {
          val r = sk.head()
          val b = Option(r.getAs[Array[Byte]]("sk")).getOrElse {
            val bos = new java.io.ByteArrayOutputStream()
            org.apache.spark.util.sketch.CountMinSketch
              .create(0.0001, 0.99, 42).writeTo(bos)
            bos.toByteArray
          }
          (b, r.getAs[Long]("n_tail_rows"))
        }
      val nExact = exactPart.agg(count(lit(1)).as("n_exact_rows"))
      val batchCnt = segsOf(docs.filter(col("doc_id") % 10 === 0))
        .groupBy("h1", "h2").agg(count(lit(1)).as("b"))
      val probed = batchCnt
        .join(exactPart.select(col("h1"), col("h2"), col("df").as("df_exact")),
          Seq("h1", "h2"), "left")
        .join(tail.select(col("h1"), col("h2"), lit(1L).as("df_tail")),
          Seq("h1", "h2"), "left")
        .withColumn("est", when(col("df_exact").isNull,
            call_function("graft_cms_estimate", lit(skBytes),
              concat_ws(":", col("h1"), col("h2"))))
          .otherwise(lit(0L)))
        .withColumn("truth",
          col("df_exact").isNull && (col("df_tail").isNotNull || col("b") >= 2))
        .withColumn("detected",
          col("df_exact").isNull && (col("b") >= 2 || col("est") >= 1))
      probed.agg(
          count(lit(1)).as("n_batch_keys"),
          sum(when(col("df_exact").isNotNull, 1L).otherwise(0L)).as("n_already_boiler"),
          sum(when(col("truth"), 1L).otherwise(0L)).as("n_true_crossings"),
          sum(when(col("truth") && col("df_tail").isNotNull, 1L).otherwise(0L))
            .as("crossings_from_tail"),
          sum(when(col("truth") && col("df_tail").isNull, 1L).otherwise(0L))
            .as("crossings_fresh"),
          sum(when(col("df_exact").isNull && col("df_tail").isNull
              && col("b") === 1, 1L).otherwise(0L)).as("n_miss_probes"),
          (sum(when(col("truth") && !col("detected"), 1L).otherwise(0L)) === 0L)
            .as("no_false_negatives"),
          sum(when(col("detected") && !col("truth"), 1L).otherwise(0L)).as("n_fp"))
        .crossJoin(broadcast(nExact))
        .withColumn("n_tail_rows", lit(nTailRows))
        .withColumn("fp_within_bound",
          col("n_fp") <= ceil(lit(5.0) * col("n_miss_probes")
            * pow(lit(1.0) - exp(-col("n_tail_rows") / lit(20000.0)), lit(7.0)))
            + lit(1L))
        .select(col("n_exact_rows"), col("n_tail_rows").cast(LongType).as("n_tail_rows"),
          col("n_batch_keys"), col("n_already_boiler"), col("n_true_crossings"),
          col("crossings_from_tail"), col("crossings_fresh"), col("n_miss_probes"),
          col("no_false_negatives"), col("fp_within_bound"))
    },
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |seg0 AS (SELECT doc_id, w,
       |    unnest(generate_series(0, (len(w) - 1) // 8)) AS c FROM ws),
       |st AS (SELECT doc_id,
       |    array_to_string(list_slice(w, c * 8 + 1, c * 8 + 8), ' ') AS t FROM seg0),
       |hh AS (SELECT doc_id, ${h32Sql("t")} AS h1, ${h32bSql("t")} AS h2 FROM st),
       |cb AS (SELECT h1, h2, COUNT(*) AS df FROM hh WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
       |ex AS (SELECT h1, h2, df FROM cb WHERE df >= 2),
       |tl AS (SELECT h1, h2 FROM cb WHERE df = 1),
       |bt AS (SELECT h1, h2, COUNT(*) AS b FROM hh WHERE doc_id % 10 = 0 GROUP BY 1, 2),
       |pr AS (SELECT bt.h1, bt.h2, bt.b, ex.df AS df_exact,
       |    CASE WHEN tl.h1 IS NOT NULL THEN 1 END AS df_tail
       |  FROM bt LEFT JOIN ex ON ex.h1 = bt.h1 AND ex.h2 = bt.h2
       |  LEFT JOIN tl ON tl.h1 = bt.h1 AND tl.h2 = bt.h2),
       |szs AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ex) AS n_exact_rows,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM tl) AS n_tail_rows)
       |SELECT szs.n_exact_rows, szs.n_tail_rows,
       |  CAST(COUNT(*) AS BIGINT) AS n_batch_keys,
       |  CAST(SUM(CASE WHEN df_exact IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_already_boiler,
       |  CAST(SUM(CASE WHEN df_exact IS NULL AND (df_tail IS NOT NULL OR b >= 2)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_true_crossings,
       |  CAST(SUM(CASE WHEN df_exact IS NULL AND df_tail IS NOT NULL
       |    THEN 1 ELSE 0 END) AS BIGINT) AS crossings_from_tail,
       |  CAST(SUM(CASE WHEN df_exact IS NULL AND df_tail IS NULL AND b >= 2
       |    THEN 1 ELSE 0 END) AS BIGINT) AS crossings_fresh,
       |  CAST(SUM(CASE WHEN df_exact IS NULL AND df_tail IS NULL AND b = 1
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_miss_probes,
       |  TRUE AS no_false_negatives, TRUE AS fp_within_bound
       |FROM pr CROSS JOIN szs
       |GROUP BY szs.n_exact_rows, szs.n_tail_rows""".stripMargin)

  /** z57: CONSISTENT RESHARD via rendezvous (HRW) hashing — the operational
    * answer to "the training run outgrew its 16 shards": assign every doc
    * to argmax over shards of h(doc:shard), and growing 16 → 20 moves ONLY
    * the docs whose argmax over the widened set lands on a NEW shard —
    * expected 4/20 of the corpus, with ZERO cross-traffic between old
    * shards (an old shard's members either stay or leave for a new shard;
    * the per-shard panel shows arrivals pinned to shards 16–19). The
    * modulo baseline (h(doc) mod 16 → mod 20) is priced beside it: it
    * rewrites ~19/20 of the corpus for the same growth. At 100 TB that is
    * the difference between copying 20 TB and copying 95 TB. Everything
    * is IN-SCAN: the 20-slot hash array, both argmaxes (array_max over
    * (h, s) structs — ties to the larger s, mirrored in the oracle's
    * ORDER BY h DESC, s DESC), and the move flags are pure row
    * expressions; the only shuffle is the 20-key panel aggregate. */
  private val z57RendezvousReshard = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val docs = Tables.documents(s, d)
      val arr = expr(
        """transform(sequence(0, 19), s -> named_struct(
          |  'h', CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':',
          |         CAST(s AS STRING))), 1, 8), 16, 10) AS BIGINT),
          |  's', s))""".stripMargin)
      val hdoc = TextAnalysis.hash32(col("doc_id").cast("string"))
      val assigned = docs
        .select(col("doc_id"), size(split(col("text"), " ")).cast(LongType).as("toks"))
        .withColumn("__arr", arr)
        .withColumn("new_shard", array_max(col("__arr")).getField("s"))
        .withColumn("old_shard", array_max(slice(col("__arr"), 1, 16)).getField("s"))
        .withColumn("hrw_moved", col("new_shard") =!= col("old_shard"))
        .withColumn("mod_moved", pmod(hdoc, lit(16)) =!= pmod(hdoc, lit(20)))
      val g = assigned.agg(
        sum(when(col("hrw_moved"), 1L).otherwise(0L)).as("n_moved_hrw"),
        sum(when(col("mod_moved"), 1L).otherwise(0L)).as("n_moved_mod"),
        count(lit(1)).as("n_docs_total"))
      assigned.groupBy("new_shard").agg(
          count(lit(1)).as("n_docs"),
          sum(col("toks")).cast(LongType).as("n_toks"),
          sum(when(col("hrw_moved"), 1L).otherwise(0L)).as("n_moved_in"))
        .crossJoin(broadcast(g))
        .withColumn("hrw_moved_frac", col("n_moved_hrw") / col("n_docs_total"))
        .withColumn("mod_moved_frac", col("n_moved_mod") / col("n_docs_total"))
        .orderBy("new_shard")
    },
    s"""WITH d AS (SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks FROM documents),
       |hw AS (SELECT doc_id, toks, unnest(generate_series(0, 19)) AS s FROM d),
       |hh AS (SELECT doc_id, toks, s,
       |    ${h32Sql("CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)")} AS h
       |  FROM hw),
       |n20 AS (SELECT doc_id, toks, s AS new_shard FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY h DESC, s DESC) AS rn FROM hh) x WHERE rn = 1),
       |o16 AS (SELECT doc_id, s AS old_shard FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY h DESC, s DESC) AS rn FROM hh WHERE s < 16) x WHERE rn = 1),
       |j AS (SELECT n.doc_id, n.toks, n.new_shard,
       |    n.new_shard <> o.old_shard AS hrw_moved,
       |    (${h32Sql("CAST(n.doc_id AS VARCHAR)")} % 16)
       |      <> (${h32Sql("CAST(n.doc_id AS VARCHAR)")} % 20) AS mod_moved
       |  FROM n20 n JOIN o16 o USING (doc_id)),
       |g AS (SELECT
       |    CAST(SUM(CASE WHEN hrw_moved THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_hrw,
       |    CAST(SUM(CASE WHEN mod_moved THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_mod,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs_total FROM j)
       |SELECT j.new_shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(toks) AS BIGINT) AS n_toks,
       |  CAST(SUM(CASE WHEN hrw_moved THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_in,
       |  g.n_moved_hrw, g.n_moved_mod, g.n_docs_total,
       |  CAST(g.n_moved_hrw AS DOUBLE) / g.n_docs_total AS hrw_moved_frac,
       |  CAST(g.n_moved_mod AS DOUBLE) / g.n_docs_total AS mod_moved_frac
       |FROM j CROSS JOIN g
       |GROUP BY j.new_shard, g.n_moved_hrw, g.n_moved_mod, g.n_docs_total
       |ORDER BY j.new_shard""".stripMargin)

  /** z35: asymmetric shingle containment — the near-dup relation Jaccard
    * is structurally blind to: when a short document is QUOTED inside a
    * long one (syndicated article + boilerplate, a README embedded in a
    * larger page, benchmark text pasted into a forum post), the
    * intersection is nearly all of the short side but a sliver of the
    * union, so Jaccard stays low and symmetric dedup keeps both copies.
    * Containment C(A→B) = |S_A ∩ S_B| / |S_A| scores each direction
    * separately; pairs with high max-containment but low Jaccard are
    * exactly the subset/quote cases (the `subset_only` flag). This is the
    * relation decontamination actually needs — benchmark text is almost
    * always CONTAINED in a training doc, not equal to it.
    *
    * Scale shape: identical to x4 — same language-blocked inverted-index
    * join, same stop-shingle df cap bounding the worst posting list, ONE
    * extra int/int division per surviving pair (n_a, n_b, n_inter are
    * already on the row). Divisions are raw IEEE on exact ints — the x4
    * rounding discipline. */
  private val z35Containment = Q(
    (s, d) => {
      val pairs = Dedup.shingleJaccardPairs(shingles(Tables.documents(s, d)), "doc_id", "lang",
        maxDocFreq = Some(X4MaxDocFreq))
      pairs
        .withColumn("cont_ab", col("n_inter").cast("double") / col("n_a"))
        .withColumn("cont_ba", col("n_inter").cast("double") / col("n_b"))
        .withColumn("cont_max", greatest(col("cont_ab"), col("cont_ba")))
        .withColumn("subset_only",
          col("cont_max") >= 0.8 && col("jaccard") < 0.5)
        .select(col("doc_a"), col("doc_b"), col("n_inter"), col("cont_ab"),
          col("cont_ba"), col("cont_max"), col("jaccard"), col("subset_only"))
        .orderBy(col("cont_max").desc, col("doc_a"), col("doc_b"))
        .limit(100)
    },
    s"""WITH $shingleCte,
       |df AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
       |kept AS (SELECT sh.doc_id, sh.lang, sh.s FROM sh JOIN df USING (s) WHERE df <= $X4MaxDocFreq),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
       |  FROM kept a JOIN kept b
       |    ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT doc_a, doc_b, n_inter,
       |    CAST(n_inter AS DOUBLE) / sa.n_sh AS cont_ab,
       |    CAST(n_inter AS DOUBLE) / sb.n_sh AS cont_ba,
       |    GREATEST(CAST(n_inter AS DOUBLE) / sa.n_sh,
       |      CAST(n_inter AS DOUBLE) / sb.n_sh) AS cont_max,
       |    CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
       |  FROM inter
       |  JOIN sizes sa ON doc_a = sa.doc_id
       |  JOIN sizes sb ON doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, n_inter, cont_ab, cont_ba, cont_max, jaccard,
       |  cont_max >= CAST(0.8 AS DOUBLE) AND jaccard < CAST(0.5 AS DOUBLE) AS subset_only
       |FROM scored
       |ORDER BY cont_max DESC, doc_a, doc_b LIMIT 100""".stripMargin)

  /** Banded LSH (4 bands × 2 rows over the 8-hash signature): all hashes
    * in a band must agree, giving the 1-(1-j^2)^4 collision curve — far
    * fewer, far higher-precision candidates than the 8×1 banding of x2. */
  private val x7LshBanded = {
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, mh${2 * b} || '_' || mh${2 * b + 1} AS key FROM sig")
      .mkString("\n  UNION ALL ")
    Q(
      (s, d) => Dedup.lshCandidatesBanded(minhashSig(s, d), "doc_id", bands = 4, rows = 2,
          maxBucket = Some(X2MaxBucket))
        .orderBy("doc_a", "doc_b"),
      s"""WITH $minhashCtes,
         |${cappedBandsCte(bands)}
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM kept a JOIN kept b
         |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin)
  }

  /** Recursive-CTE chain ending in `comp(node, cid)` — the LSH candidate
    * pairs → connected components fixpoint, shared by the x8/x8b cluster
    * oracles and the x9b near-dup curation oracle. */
  private val componentsCtes: String = componentsCtesFor("documents")
  private def componentsCtesFor(src: String, pfx: String = ""): String = {
    s"""${minhashCtesFor(src, pfx)},
       |${cappedBandsCte(bandsSqlFor(pfx), pfx)},
       |${pfx}pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ${pfx}kept a JOIN ${pfx}kept b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |${pfx}edges AS (SELECT doc_a AS src, doc_b AS dst FROM ${pfx}pairs
       |          UNION ALL SELECT doc_b, doc_a FROM ${pfx}pairs),
       |${pfx}reach(node, r) AS (
       |  SELECT src, src FROM ${pfx}edges
       |  UNION
       |  SELECT e.dst, ${pfx}reach.r FROM ${pfx}edges e JOIN ${pfx}reach ON e.src = ${pfx}reach.node),
       |${pfx}comp AS (SELECT node, min(r) AS cid FROM ${pfx}reach GROUP BY 1)""".stripMargin
  }

  /** Reachability oracle for the dedup pipeline's final stage (one cluster
    * id = survivor per document), shared by x8 (min-label propagation) and
    * x8b (star contraction) — both must land on the same fixpoint. */
  private val componentsOracle: String =
    s"""WITH RECURSIVE $componentsCtes
       |SELECT d.doc_id,
       |  COALESCE(comp.cid, d.doc_id) AS cluster_id,
       |  COALESCE(comp.cid, d.doc_id) = d.doc_id AS is_survivor
       |FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
       |ORDER BY d.doc_id""".stripMargin

  private def clusterQuery(cc: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame) =
    Q(
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val pairs = Dedup.lshCandidates(minhashSig(s, d), "doc_id", 8,
          maxBucket = Some(X2MaxBucket))
        cc(pairs, docs)
          .withColumn("is_survivor", col("doc_id") === col("cluster_id"))
          .orderBy("doc_id")
      },
      componentsOracle)

  /** x20: PageRank centrality over the LSH candidate graph — the
    * canonical-representative / crawl-quality-prior rung (see
    * Dedup.pageRank). 5 fixed iterations; the oracle unrolls them as
    * chained CTEs over the SAME pair CTEs as x2/x8, replaying the decimal
    * contribution snapshots exactly. No dangling nodes by construction
    * (symmetrized pair graph), so every iteration is the literal
    * `(1-d)/n + d·Σ` with inner joins only. */
  private val X20Iters = 5

  /** DuckDB CTE chain `deg, n, r0, r1..rK` replaying Dedup.pageRank's K
    * Jacobi iterations over an existing `edges(src, dst)` CTE — shared by
    * the x20 declared query and the x21 curation composition so the
    * iteration arithmetic can never drift between them. */
  private def pagerankCtes(iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT d.src AS node, d.deg,
         |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n.n
         |      + CAST(0.85 AS DOUBLE) * CAST(s.sc AS DOUBLE) AS rank
         |  FROM deg d CROSS JOIN n
         |  JOIN (SELECT e.dst, SUM(CAST(r.rank / r.deg AS DECIMAL(18,12))) AS sc
         |        FROM edges e JOIN r${i - 1} r ON e.src = r.node
         |        GROUP BY 1) s ON d.src = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
       |r0 AS (SELECT d.src AS node, d.deg, CAST(1 AS DOUBLE) / n.n AS rank
       |       FROM deg d CROSS JOIN n),
       |$iterCtes""".stripMargin
  }

  private val x20DupPagerank = Q(
    (s, d) => Dedup.pageRank(
        Dedup.lshCandidates(minhashSig(s, d), "doc_id", 8,
          maxBucket = Some(X2MaxBucket)), iters = X20Iters)
      .select(col("node").as("doc_id"), col("deg"), col("rank"))
      .orderBy("doc_id"),
    s"""WITH $minhashCtes,
       |${cappedBandsCte(bandsSql)},
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |${pagerankCtes(X20Iters)}
       |SELECT node AS doc_id, deg, rank FROM r$X20Iters ORDER BY doc_id""".stripMargin)

  private val x8DupClusters =
    clusterQuery(Dedup.connectedComponents(_, _, "doc_id"))

  /** x8b: the same clustering via alternating star contraction — the
    * O(log² n)-round form that replaces label propagation when component
    * diameter (not just edge count) grows. Oracle-identical to x8. */
  private val x8bDupClustersStar =
    clusterQuery(Dedup.connectedComponentsStar(_, _, "doc_id"))

  /** x25: duplicate-cluster representative selection — the dedup
    * RESOLUTION policy. x8 answers "which docs are the same"; the curation
    * compositions keep min-id; production corpora keep the BEST copy
    * (mirrors differ in truncation/boilerplate). Here: per x8 cluster,
    * keep the doc with the highest lexical-diversity score (distinct/total
    * words — ONE int/int division, bit-identical cross-engine), doc_id
    * tiebreak. Scale shape: labels from the shared CC machinery, ONE
    * group-sized winner relation joined back on cluster_id (no broadcast
    * hint — cluster count grows with the corpus; AQE decides), cluster
    * sizes map-side-combinable. The winner stage is top1PerGroup's
    * min-struct aggregate, never a whole-corpus window. */
  private val x25ClusterBest = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.lshCandidates(minhashSig(s, d), "doc_id", 8,
        maxBucket = Some(X2MaxBucket))
      val labels = Dedup.connectedComponents(pairs, docs, "doc_id")
        .select("doc_id", "cluster_id")
      val ws = split(col("text"), " ")
      val qual = docs.select(col("doc_id"),
        (size(array_distinct(ws)) / size(ws)).as("qscore"))
      val scored = labels.join(qual, Seq("doc_id"))
      val best = Relational.top1PerGroup(scored, Seq(col("cluster_id")),
          Seq(col("qscore").desc, col("doc_id").asc))
        .select(col("cluster_id"), col("doc_id").as("keep_id"))
      val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
      scored
        .join(best, Seq("cluster_id"))
        .join(sizes, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("csize"), col("keep_id"),
          (col("doc_id") === col("keep_id")).as("kept"), col("qscore"))
        .orderBy("doc_id")
    },
    s"""WITH RECURSIVE $componentsCtes,
       |lbl AS (SELECT d.doc_id, COALESCE(comp.cid, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.node),
       |q AS (SELECT doc_id,
       |    len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')) AS qscore
       |  FROM documents),
       |b AS (SELECT l.cluster_id, l.doc_id AS keep_id,
       |    ROW_NUMBER() OVER (PARTITION BY l.cluster_id
       |      ORDER BY q.qscore DESC, l.doc_id) AS rn
       |  FROM lbl l JOIN q ON q.doc_id = l.doc_id),
       |best AS (SELECT cluster_id, keep_id FROM b WHERE rn = 1),
       |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS csize
       |  FROM lbl GROUP BY 1)
       |SELECT l.doc_id, l.cluster_id, sz.csize, best.keep_id,
       |  l.doc_id = best.keep_id AS kept, q.qscore
       |FROM lbl l
       |JOIN q ON q.doc_id = l.doc_id
       |JOIN best ON best.cluster_id = l.cluster_id
       |JOIN sz ON sz.cluster_id = l.cluster_id
       |ORDER BY l.doc_id""".stripMargin)

  /** x30: incremental cluster maintenance — the missing lifecycle step
    * between x10 (incremental candidates) and x8 (batch clustering): an
    * ingest batch's pairs are merged into the EXISTING labels via
    * `Dedup.incrementalComponents`, re-solving only touched clusters.
    * The oracle is the strongest gate available: the FULL-corpus
    * recompute fixpoint — incremental must equal it exactly, so a subtle
    * merge bug (dropped membership edge, wrong canonical id) hash-fails.
    * Deliberately UNCAPPED candidate stages on both sides: the hot-bucket
    * cap's df counts are population-relative, so capping the split stages
    * and the full recompute differently would make the two legitimately
    * diverge — the cap belongs to the candidate generator (x2), not to
    * this equality gate. */
  private val x30IncrementalCc = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sig = minhashSig(s, d)
      val exist = sig.filter(col("doc_id") % 10 =!= 0)
      val batch = sig.filter(col("doc_id") % 10 === 0)
      val labels0 = Dedup.connectedComponents(
        Dedup.lshCandidates(exist, "doc_id", 8),
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id")
      val newPairs = Dedup.lshCandidatesAgainst(batch, exist, "doc_id", 8)
        .select(col("doc_new").as("doc_a"), col("doc_base").as("doc_b"))
        .union(Dedup.lshCandidates(batch, "doc_id", 8))
      Dedup.incrementalComponents(labels0,
          docs.filter(col("doc_id") % 10 === 0).select("doc_id"), newPairs, "doc_id")
        .withColumn("is_survivor", col("doc_id") === col("cluster_id"))
        .orderBy("doc_id")
    },
    s"""WITH RECURSIVE $minhashCtes,
       |bands AS ($bandsSql),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(node, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.node),
       |comp AS (SELECT node, min(r) AS cid FROM reach GROUP BY 1)
       |SELECT d.doc_id,
       |  COALESCE(comp.cid, d.doc_id) AS cluster_id,
       |  COALESCE(comp.cid, d.doc_id) = d.doc_id AS is_survivor
       |FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
       |ORDER BY d.doc_id""".stripMargin)

  /** The base-corpus canonical map (doc_id → cluster_id over the
    * non-arrival 90%), PERSISTED through the Store sharded by a doc-hash
    * partition and read back — the artifact a daily dedup increment
    * resolves against (z41/z42's fit→store→serve discipline applied to
    * the dedup side). One build per (session, input dir). */
  private val x39Built = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()

  private def baseMapFit(s: SparkSession, d: String) =
    Dedup.connectedComponents(
      Dedup.lshCandidates(minhashSig(s, d).filter(col("doc_id") % 10 =!= 0),
        "doc_id", 8),
      Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0), "doc_id")

  private def baseMapPath(s: SparkSession, d: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
      s"basemap_${s.sparkContext.applicationId}_${Integer.toHexString(d.hashCode)}"

  private def baseMapStored(s: SparkSession, d: String) =
    x39Built.computeIfAbsent(s"${s.sparkContext.applicationId}:$d", _ => {
      val store = graft.sources.Store(s, baseMapPath(s, d), "part")
      store.destroy()
      val built = baseMapFit(s, d)
        .select("doc_id", "cluster_id")
        .withColumn("part", pmod(hash(col("doc_id")), lit(8)))
      store.appendVersioned(built) // (epoch 1, v1) — x42's manifest coordinate
      sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
      val back = readOrEmpty(store, built)
      val M = lit(2147483647L)
      store.trackFrom(back, (col("doc_id") % M) * (col("cluster_id") % M) % M)
      back.drop("part")
    })

  /** x39: ARRIVAL RESOLUTION report — the daily-ingest artifact on top of
    * x30's incremental exactness: the base corpus's canonical map is a
    * STORED artifact (never recomputed at ingest time); the arriving 10%
    * is resolved against it incrementally (x10's against-join for
    * new↔base candidates, x30's touched-only label propagation), and each
    * arrival is classified by where it landed — `joined_existing` (its
    * final cluster contains a base doc: a re-crawl or near-dup of known
    * content), `new_cluster` (≥2 arrivals cluster together: new
    * duplicated material entering the corpus), or `singleton` (genuinely
    * novel). Per-(source, outcome) counts are what an ingest dashboard
    * plots per day. The ORACLE RECOMPUTES THE FULL CORPUS from scratch —
    * matching it proves the stored-artifact + incremental path lands on
    * the exact full-recompute clustering, ids included (x30's guarantee
    * extended through the Store round-trip). Scale: the base map is
    * O(base) once, then each increment pays O(batch + touched); the
    * classification is one aggregate over cluster sizes joined back to
    * arrivals. */
  private val x39ArrivalResolution = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sig = minhashSig(s, d)
      val exist = sig.filter(col("doc_id") % 10 =!= 0)
      val batch = sig.filter(col("doc_id") % 10 === 0)
      val labels0 =
        if (planOnly) baseMapFit(s, d)
        else baseMapStored(s, d)
      val newPairs = Dedup.lshCandidatesAgainst(batch, exist, "doc_id", 8)
        .select(col("doc_new").as("doc_a"), col("doc_base").as("doc_b"))
        .union(Dedup.lshCandidates(batch, "doc_id", 8))
      val labels = Dedup.incrementalComponents(labels0,
        docs.filter(col("doc_id") % 10 === 0).select("doc_id"), newPairs, "doc_id")
      val cl = labels.groupBy("cluster_id").agg(
        sum(when(col("doc_id") % 10 =!= 0, 1L).otherwise(0L)).as("n_base"),
        count(lit(1)).as("n_all"))
      labels.filter(col("doc_id") % 10 === 0)
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .join(cl, Seq("cluster_id"))
        .withColumn("outcome", when(col("n_base") > 0, "joined_existing")
          .when(col("n_all") >= 2, "new_cluster").otherwise("singleton"))
        .groupBy("source", "outcome")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source", "outcome")
    },
    s"""WITH RECURSIVE $minhashCtes,
       |bands AS ($bandsSql),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(node, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.node),
       |comp AS (SELECT node, min(r) AS cid FROM reach GROUP BY 1),
       |lbl AS (SELECT d.doc_id, d.source,
       |    COALESCE(comp.cid, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.node),
       |cl AS (SELECT cluster_id,
       |    CAST(SUM(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
       |    COUNT(*) AS n_all
       |  FROM lbl GROUP BY 1),
       |arr AS (SELECT l.source,
       |    CASE WHEN c.n_base > 0 THEN 'joined_existing'
       |         WHEN c.n_all >= 2 THEN 'new_cluster'
       |         ELSE 'singleton' END AS outcome
       |  FROM lbl l JOIN cl c ON c.cluster_id = l.cluster_id
       |  WHERE l.doc_id % 10 = 0)
       |SELECT source, outcome, COUNT(*) AS n_docs
       |FROM arr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** x40's stored MODEL artifacts, fit once on the base corpus
    * (doc_id % 10 ≠ 0 — "yesterday's" clean holdings) and persisted
    * through the Store: the KN bigram count table sharded by prev-hash
    * (knModelStored's layout at the ingest split) and the per-lang
    * discriminator coefficients (z42's snapshot discipline). One build
    * per (session, input dir); y3d's cache-and-shutdown-hook rules. */
  private val x40LmBuilt = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()

  private def x40LmPath(s: SparkSession, d: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
      s"ingest_lm_${s.sparkContext.applicationId}_${Integer.toHexString(d.hashCode)}"

  private def x40LmStored(s: SparkSession, d: String) =
    x40LmBuilt.computeIfAbsent(s"${s.sparkContext.applicationId}:$d", _ => {
      val store = graft.sources.Store(s, x40LmPath(s, d), "part")
      store.destroy()
      val built = graft.operators.Lm.bigramCounts(
          Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0))
        .withColumn("part", pmod(hash(col("prev")), lit(8)))
      store.appendVersioned(built) // (epoch 1, v1) — x42's manifest coordinate
      sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
      val back = readOrEmpty(store, built)
      val M = lit(2147483647L)
      store.trackFrom(back,
        (TextAnalysis.hash32(col("prev")) * 31 + TextAnalysis.hash32(col("cur"))) % M
          * (col("n_bg") % M) % M)
      back.drop("part")
    })

  private def x40ClsFit(docs: org.apache.spark.sql.DataFrame) =
    Relational.logisticIrls(
        clsFeats(docs.filter(col("doc_id") % 10 =!= 0)),
        "lang", iters = 4, lambda = 1.0)
      .select(col("lang"),
        col("b0").cast("decimal(12,4)").cast("double").as("b0s"),
        col("b1").cast("decimal(12,4)").cast("double").as("b1s"),
        col("b2").cast("decimal(12,4)").cast("double").as("b2s"))

  private val x40ClsBuilt = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()

  private def x40ClsStored(s: SparkSession, d: String) =
    x40ClsBuilt.computeIfAbsent(s"${s.sparkContext.applicationId}:$d", _ => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
        s"ingest_cls_${s.sparkContext.applicationId}_${Integer.toHexString(d.hashCode)}"
      val store = graft.sources.Store(s, path, "part")
      store.destroy()
      store.append(x40ClsFit(Tables.documents(s, d))
        .withColumn("part", col("lang")))
      sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
      store.read.drop("part")
    })

  /** x40: THE DAILY-INGEST CAPSTONE — every arrival-path rung composed as
    * the ONE job a production corpus actually runs each day, entirely
    * against STORED artifacts ("yesterday's store"): today's batch
    * (doc_id % 10 = 0, vec_id % 10 = 0) flows through
    *  1. dedup RESOLUTION against the persisted canonical map
    *     ([[baseMapStored]] — x39's machinery: against-join candidates,
    *     touched-only incremental label propagation) → each arrival is
    *     `joined_existing` (a re-crawl/near-dup of known content — MERGED
    *     away, never re-ingested), `new_cluster`, or `singleton`;
    *  2. held-out KN perplexity scoring off the stored base-fit bigram
    *     model ([[x40LmStored]] — z41's left-join scorer with backoff
    *     floors) banded per language WITHIN the batch (x32b's CCNet
    *     shape; an unscoreable doc fails closed);
    *  3. the learned discriminator gate off the stored coefficients
    *     ([[x40ClsStored]] — z42's snapshot discipline), per-lang top
    *     half by eta within the batch (x38's retention shape);
    *  4. model MAINTENANCE: the kept docs' bigram counts merge into the
    *     stored model via [[graft.operators.Lm.mergeCounts]], and the
    *     report carries the post-merge row count, token total, and a
    *     2³¹−1-lattice content checksum — the ORACLE recomputes the
    *     model from scratch over base ∪ kept text, so the hash gate
    *     proves fit(A) + counts(B) ≡ fit(A ∪ B) content-exactly
    *     (mergeCounts' missing oracle gate, closed);
    *  5. ANN-side drift: the embedding batch assigned against the seeded
    *     base anchors (y15's broadcast argmin — the corpus never
    *     shuffles) with the per-cell growth/drift flags aggregated to
    *     the two counts an ingest dashboard alerts on.
    * Output: one row per source — arrivals, merged/new-cluster/singleton
    * resolution counts, kept (passed both gates and not merged), dropped
    * — with the global model-maintenance and drift columns cross-joined
    * (x37's one-row-global pattern). The ORACLE REPLAYS EVERYTHING FROM
    * SCRATCH (full-recompute CC over the whole corpus, 4 Newton steps,
    * the complete KN formula, the refit model, the IVF panel), so hash
    * equality proves the stored-artifact incremental path lands exactly
    * where a from-scratch daily rebuild would — x39's guarantee extended
    * across the whole ingest surface.
    *
    * Scale: base artifacts are O(base) ONCE, then each day pays
    * O(batch + touched): the canonical map join is touched-clusters-only,
    * every model join is model-sized and UNHINTED, the batch gates
    * shuffle only batch-sized frames (the banding windows partition by
    * lang within the batch), the merge shuffle is partition-aligned with
    * the stored model's prev-hash shards, and the ANN pass is one
    * broadcast argmin over the embedding table. */
  private val x40DailyIngest = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
      val docs = Tables.documents(s, d)
      val batch = docs.filter(col("doc_id") % 10 === 0)
      // 1. dedup resolution against the stored canonical map
      val sig = minhashSig(s, d)
      val labels0 =
        if (planOnly) baseMapFit(s, d)
        else baseMapStored(s, d)
      val newPairs = Dedup.lshCandidatesAgainst(
          sig.filter(col("doc_id") % 10 === 0),
          sig.filter(col("doc_id") % 10 =!= 0), "doc_id", 8)
        .select(col("doc_new").as("doc_a"), col("doc_base").as("doc_b"))
        .union(Dedup.lshCandidates(sig.filter(col("doc_id") % 10 === 0), "doc_id", 8))
      val labels = Dedup.incrementalComponents(labels0,
        batch.select("doc_id"), newPairs, "doc_id")
      val cl = labels.groupBy("cluster_id").agg(
        sum(when(col("doc_id") % 10 =!= 0, 1L).otherwise(0L)).as("n_base"),
        count(lit(1)).as("n_all"))
      val outcome = labels.filter(col("doc_id") % 10 === 0)
        .join(cl, Seq("cluster_id"))
        .select(col("doc_id"),
          when(col("n_base") > 0, "joined_existing")
            .when(col("n_all") >= 2, "new_cluster")
            .otherwise("singleton").as("outcome"))
      // 2. LM gate off the stored base model
      val knM =
        if (planOnly) graft.operators.Lm.bigramCounts(
          docs.filter(col("doc_id") % 10 =!= 0))
        else x40LmStored(s, d)
      val lmBand = Relational.groupedNtile(
          knHeldoutScored(knM, batch)
            .join(batch.select("doc_id", "lang"), Seq("doc_id"))
            .select("doc_id", "lang", "avg_kn_logprob"),
          groups = Seq("lang"), order = Seq("avg_kn_logprob", "doc_id"),
          n = 3, out = "band")
        .select(col("doc_id"), (col("band") >= 2).as("lm_keep"))
      // 3. discriminator gate off the stored coefficients
      val clsM =
        if (planOnly) x40ClsFit(docs)
        else x40ClsStored(s, d)
      val clsKeep = Relational.groupedNtile(
          clsFeats(batch).join(broadcast(clsM), Seq("lang"))
            .select(col("doc_id"), col("lang"),
              (col("b0s") + col("b1s") * col("x1") + col("b2s") * col("x2"))
                .as("eta")),
          groups = Seq("lang"), order = Seq("eta", "doc_id"),
          n = 2, out = "cband")
        .select(col("doc_id"), (col("cband") === 2).as("cls_keep"))
      val verdicts = batch.select("doc_id", "source")
        .join(outcome, Seq("doc_id"))
        .join(lmBand, Seq("doc_id"), "left")
        .join(clsKeep, Seq("doc_id"), "left")
        .withColumn("lm_keep", coalesce(col("lm_keep"), lit(false)))
        .withColumn("cls_keep", coalesce(col("cls_keep"), lit(false)))
        .withColumn("kept", col("outcome") =!= "joined_existing" &&
          col("lm_keep") && col("cls_keep"))
      // 4. model maintenance: merge the kept docs' counts into the model
      val keptDocs = batch.join(
        verdicts.filter(col("kept")).select("doc_id"), Seq("doc_id"), "left_semi")
      val merged = graft.operators.Lm.mergeCounts(
        knM, graft.operators.Lm.bigramCounts(keptDocs))
      val M = lit(2147483647L)
      val before = knM.agg(count(lit(1)).as("model_rows_before"))
      val after = merged.agg(
        count(lit(1)).as("model_rows_after"),
        sum(col("n_bg")).cast(LongType).as("model_tokens_after"),
        pmod(sum(
          (TextAnalysis.hash32(col("prev")) * 31 + TextAnalysis.hash32(col("cur"))) % M
            * (col("n_bg") % M) % M), M).cast(LongType).as("model_checksum"))
      // 5. ANN drift flags for the embedding batch
      val e = Tables.embeddings(s, d)
      val anchors = e.filter(col("vec_id") >= 1 && col("vec_id") <= IvfCells)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      val d2dec = col("cell_d2").cast(DecimalType(20, 6))
      val cells = Similarity.ivfAssign(e, anchors, "vec_id", "embedding")
        .withColumn("arr", col("vec_id") % 10 === 0)
        .groupBy("cell").agg(
          sum(when(!col("arr"), 1L).otherwise(0L)).as("nb"),
          sum(when(col("arr"), 1L).otherwise(0L)).as("na"),
          sum(when(!col("arr"), d2dec)).as("sb"),
          sum(when(col("arr"), d2dec)).as("sa"))
        .withColumn("bm", when(col("nb") > 0, col("sb").cast(DoubleType) / col("nb")))
        .withColumn("am", when(col("na") > 0, col("sa").cast(DoubleType) / col("na")))
      val drift = cells.agg(
        sum(when(coalesce(col("am") > col("bm") * 1.5, lit(false)), 1L).otherwise(0L))
          .as("n_drift_cells"),
        sum(when(col("na") * 9 > col("nb") * 2, 1L).otherwise(0L))
          .as("n_growth_cells"))
      verdicts.groupBy("source").agg(
          count(lit(1)).as("n_arrivals"),
          sum(when(col("outcome") === "joined_existing", 1L).otherwise(0L)).as("n_merged"),
          sum(when(col("outcome") === "new_cluster", 1L).otherwise(0L)).as("n_new_cluster"),
          sum(when(col("outcome") === "singleton", 1L).otherwise(0L)).as("n_singleton"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("outcome") =!= "joined_existing" && !col("kept"), 1L)
            .otherwise(0L)).as("n_dropped_gates"))
        .crossJoin(broadcast(before))
        .crossJoin(broadcast(after))
        .crossJoin(broadcast(drift))
        .orderBy("source")
    },
    s"""WITH RECURSIVE $minhashCtes,
       |bands AS ($bandsSql),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(node, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.node),
       |comp AS (SELECT node, min(r) AS cid FROM reach GROUP BY 1),
       |lbl AS (SELECT d.doc_id, d.source,
       |    COALESCE(comp.cid, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.node),
       |cl AS (SELECT cluster_id,
       |    CAST(SUM(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
       |    COUNT(*) AS n_all
       |  FROM lbl GROUP BY 1),
       |outc AS (SELECT l.doc_id,
       |    CASE WHEN c.n_base > 0 THEN 'joined_existing'
       |         WHEN c.n_all >= 2 THEN 'new_cluster'
       |         ELSE 'singleton' END AS outcome
       |  FROM lbl l JOIN cl c ON c.cluster_id = l.cluster_id
       |  WHERE l.doc_id % 10 = 0),
       |${knHeldoutCtes("doc_id % 10 <> 0", "doc_id % 10 = 0")},
       |kb AS (SELECT k.doc_id, NTILE(3) OVER (
       |      PARTITION BY dd.lang ORDER BY k.avg_kn_logprob, k.doc_id) AS band
       |  FROM kout k JOIN documents dd ON dd.doc_id = k.doc_id),
       |feats AS (
       |  SELECT doc_id, lang,
       |    ln(1.0 + n_chars) AS x1,
       |    CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) / n_chars AS x2,
       |    CAST(source IN ('src0', 'src3', 'src6', 'src9') AS DOUBLE) AS y
       |  FROM documents),
       |tf AS (SELECT lang, x1, x2, y FROM feats WHERE doc_id % 10 <> 0),
       |${IrlsSql.ctes("tf", "lang", 4)},
       |model AS (SELECT lang,
       |    CAST(CAST(b0 AS DECIMAL(12,4)) AS DOUBLE) AS b0s,
       |    CAST(CAST(b1 AS DECIMAL(12,4)) AS DOUBLE) AS b1s,
       |    CAST(CAST(b2 AS DECIMAL(12,4)) AS DOUBLE) AS b2s
       |  FROM b4it),
       |ce AS (SELECT f.doc_id, f.lang,
       |    m.b0s + m.b1s * f.x1 + m.b2s * f.x2 AS eta
       |  FROM feats f JOIN model m ON f.lang = m.lang
       |  WHERE f.doc_id % 10 = 0),
       |cv AS (SELECT doc_id,
       |    NTILE(2) OVER (PARTITION BY lang ORDER BY eta, doc_id) = 2 AS cls_keep
       |  FROM ce),
       |verd AS (SELECT b.doc_id, b.source, o.outcome,
       |    COALESCE(kb.band >= 2, FALSE) AS lm_keep,
       |    COALESCE(cv.cls_keep, FALSE) AS cls_keep,
       |    o.outcome <> 'joined_existing'
       |      AND COALESCE(kb.band >= 2, FALSE)
       |      AND COALESCE(cv.cls_keep, FALSE) AS kept
       |  FROM documents b JOIN outc o ON o.doc_id = b.doc_id
       |  LEFT JOIN kb ON kb.doc_id = b.doc_id
       |  LEFT JOIN cv ON cv.doc_id = b.doc_id
       |  WHERE b.doc_id % 10 = 0),
       |keptids AS (SELECT doc_id FROM verd WHERE kept),
       |mrow AS (SELECT CAST(COUNT(*) AS BIGINT) AS model_rows_before FROM kbcnt),
       |mtr AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |  WHERE doc_id % 10 <> 0 OR doc_id IN (SELECT doc_id FROM keptids)),
       |mpos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
       |  FROM mtr WHERE len(l) >= 2),
       |mbg AS (SELECT l[i] AS prev, l[i+1] AS cur FROM mpos),
       |mcnt AS (SELECT prev, cur, COUNT(*) AS n_bg FROM mbg GROUP BY 1, 2),
       |magg AS (SELECT CAST(COUNT(*) AS BIGINT) AS model_rows_after,
       |    CAST(SUM(n_bg) AS BIGINT) AS model_tokens_after,
       |    CAST(SUM(((${h32Sql("prev")} * 31 + ${h32Sql("cur")}) % 2147483647)
       |      * (n_bg % 2147483647) % 2147483647) % 2147483647 AS BIGINT)
       |      AS model_checksum
       |  FROM mcnt),
       |ev AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |eanch AS (SELECT vec_id AS anchor_id, vd AS avd FROM ev
       |          WHERE vec_id BETWEEN 1 AND $IvfCells),
       |edist AS (SELECT v.vec_id, a.anchor_id,
       |    ROUND(${dotSql("v.vd", "v.vd")} - 2.0 * ${dotSql("v.vd", "a.avd")}
       |      + ${dotSql("a.avd", "a.avd")}, 6) AS d2
       |  FROM ev v CROSS JOIN eanch a),
       |easg AS (SELECT vec_id, anchor_id AS cell, d2, vec_id % 10 = 0 AS arr
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY d2, anchor_id) AS rn FROM edist) z WHERE rn = 1),
       |ecell AS (SELECT cell,
       |    CAST(SUM(CASE WHEN NOT arr THEN 1 ELSE 0 END) AS BIGINT) AS nb,
       |    CAST(SUM(CASE WHEN arr THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |    SUM(CASE WHEN NOT arr THEN CAST(d2 AS DECIMAL(20,6)) END) AS sb,
       |    SUM(CASE WHEN arr THEN CAST(d2 AS DECIMAL(20,6)) END) AS sa
       |  FROM easg GROUP BY 1),
       |edrift AS (SELECT
       |    CAST(SUM(CASE WHEN COALESCE(
       |        (CASE WHEN na > 0 THEN CAST(sa AS DOUBLE) / na END) >
       |        (CASE WHEN nb > 0 THEN CAST(sb AS DOUBLE) / nb END) * 1.5,
       |        FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_drift_cells,
       |    CAST(SUM(CASE WHEN na * 9 > nb * 2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_growth_cells
       |  FROM ecell),
       |persrc AS (SELECT source,
       |    CAST(COUNT(*) AS BIGINT) AS n_arrivals,
       |    CAST(SUM(CASE WHEN outcome = 'joined_existing' THEN 1 ELSE 0 END) AS BIGINT) AS n_merged,
       |    CAST(SUM(CASE WHEN outcome = 'new_cluster' THEN 1 ELSE 0 END) AS BIGINT) AS n_new_cluster,
       |    CAST(SUM(CASE WHEN outcome = 'singleton' THEN 1 ELSE 0 END) AS BIGINT) AS n_singleton,
       |    CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    CAST(SUM(CASE WHEN outcome <> 'joined_existing' AND NOT kept
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_gates
       |  FROM verd GROUP BY 1)
       |SELECT p.source, p.n_arrivals, p.n_merged, p.n_new_cluster,
       |  p.n_singleton, p.n_kept, p.n_dropped_gates,
       |  mrow.model_rows_before, magg.model_rows_after,
       |  magg.model_tokens_after, magg.model_checksum,
       |  edrift.n_drift_cells, edrift.n_growth_cells
       |FROM persrc p CROSS JOIN mrow CROSS JOIN magg CROSS JOIN edrift
       |ORDER BY p.source""".stripMargin)

  /** x29: duplicate-graph health panel — the one-row corpus report a
    * dedup run should publish before anyone trusts it: document count,
    * cluster count, singleton count, the largest cluster (a boilerplate
    * explosion shows up here first), and the duplicate fraction
    * (1 − clusters/docs, one long/long division off two counts). All
    * map-side-combinable aggregates over the shared CC labels. */
  private val x29ClusterStats = Q(
    (s, d) => {
      val pairs = Dedup.lshCandidates(minhashSig(s, d), "doc_id", 8,
        maxBucket = Some(X2MaxBucket))
      val labels = Dedup.connectedComponents(pairs, Tables.documents(s, d), "doc_id")
        .select("doc_id", "cluster_id")
      labels.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
        .agg(
          sum(col("csize")).as("n_docs"),
          count(lit(1)).as("n_clusters"),
          sum(when(col("csize") === 1, 1L).otherwise(0L)).as("n_singletons"),
          max(col("csize")).as("max_cluster"))
        .select(col("n_docs"), col("n_clusters"), col("n_singletons"),
          col("max_cluster"),
          (lit(1.0) - col("n_clusters") / col("n_docs")).as("dup_frac"))
    },
    s"""WITH RECURSIVE $componentsCtes,
       |lbl AS (SELECT d.doc_id, COALESCE(comp.cid, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.node),
       |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS csize
       |  FROM lbl GROUP BY 1)
       |SELECT CAST(sum(csize) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(sum(CASE WHEN csize = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
       |  max(csize) AS max_cluster,
       |  1.0 - CAST(count(*) AS BIGINT) / CAST(sum(csize) AS BIGINT) AS dup_frac
       |FROM sz""".stripMargin)

  /** Approximate distinct counting — the 100-TB form of dedup statistics
    * (an exact COUNT(DISTINCT) shuffles every distinct value; the HLL
    * sketch ships fixed-size buffers). HLL estimates are engine-specific,
    * so the oracle checks the deterministic contract instead: the exact
    * count plus "the estimate landed within 5% of it" (HLL is
    * deterministic — no RNG — so this is a stable, honest assertion). */
  private val x6ApproxDistinct = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
        .select(
          col("event_type"), col("n_exact").cast(LongType).as("n_exact"),
          (abs(col("n_approx") - col("n_exact")) <=
            col("n_exact") * 0.05).as("approx_ok"))
        .orderBy("event_type")
    },
    """SELECT event_type,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
      |  TRUE AS approx_ok
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)

  // ---- similarity search ----

  /** DuckDB double-cast of the float vector column. */
  private def vdSql(v: String): String =
    s"list_transform($v, x -> CAST(x AS DOUBLE))"

  /** DuckDB sequential-fold dot product — element-for-element identical to
    * Similarity.dot's aggregate(zip_with(...)) (fold starts 0.0 + p1 = p1,
    * exactly list_reduce's first-element seed). */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, 64),
       |      i -> $a[i] * $b[i]), (acc, x) -> acc + x)""".stripMargin

  private def nrmSql(v: String): String =
    s"sqrt(list_reduce(list_transform($v, x -> x * x), (acc, x) -> acc + x))"

  /** DuckDB rendering of Similarity.hyperplaneBucket over a `vd` double
    * list of `dims` elements (64-dim form shared by y2/x5; 8-dim by m4;
    * the 16-plane form by y2c). The weight formula prints through
    * Similarity.planeWeightSql — the SAME renderer the HOF form and the
    * native codegen use, so the three can never drift. */
  private def bucketSqlFor(dims: Int, planes: Int = Similarity.NumPlanes): String = {
    val planeDots = (0 until planes).map { j =>
      s"""list_reduce(list_transform(generate_series(0, ${dims - 1}),
         |        i -> vd[i + 1] * CAST(${Similarity.planeWeightSql("i", j)} AS DOUBLE)),
         |      (acc, x) -> acc + x)""".stripMargin
    }
    planeDots.zipWithIndex.map { case (dj, j) =>
      s"(CASE WHEN $dj > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
  }
  private val bucketSql: String = bucketSqlFor(64)

  /** Brute-force cosine top-k, query side broadcast (queries = every 50th
    * vector). Cosine rounded to 6 dp before ranking on both engines. */
  private val y1KnnBrute = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
          e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", k = 5)
        .orderBy("q_id", "rank")
    },
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |n AS (SELECT vec_id, vd, ${nrmSql("vd")} AS nrm FROM v),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) AS cosine
       |  FROM n q JOIN n c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id % 50 = 0)
       |SELECT q_id, rank, c_id, cosine FROM (
       |  SELECT q_id, c_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS INT) AS rank
       |  FROM scored) r
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)

  /** LSH-bucketed ANN: hyperplane sign bits → bucket equi-join → top-k in
    * bucket. The scale path: the cross product never materializes. */
  private val y2KnnBucketed = {
    Q(
      (s, d) => Similarity.bucketedTopK(
          Tables.embeddings(s, d), id => id % 50 === 0, "vec_id", "embedding", k = 5)
        .orderBy("q_id", "rank"),
      s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
         |n AS (SELECT vec_id, vd, ${nrmSql("vd")} AS nrm,
         |    CAST($bucketSql AS BIGINT) AS bucket FROM v),
         |scored AS (
         |  SELECT q.vec_id AS q_id, q.bucket, c.vec_id AS c_id,
         |    ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) AS cosine
         |  FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id % 50 = 0)
         |SELECT q_id, bucket, rank, c_id, cosine FROM (
         |  SELECT q_id, bucket, c_id, cosine,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS INT) AS rank
         |  FROM scored) r
         |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)
  }

  /** y2b: multi-probe bucketed ANN — the query searches its own bucket
    * PLUS the 8 buckets at Hamming distance 1 in signature space. Recall
    * lost to near-boundary queries in y2 comes back without adding planes
    * (which would split true neighbors apart); the probe union is the
    * same bucket equi-join with the broadcast query side exploded 9-way.
    * Oracle: the probed bucket set expressed directly as a Hamming
    * predicate on the signatures. */
  private val y2bKnnMultiprobe = Q(
    (s, d) => Similarity.bucketedTopK(
        Tables.embeddings(s, d), id => id % 50 === 0, "vec_id", "embedding",
        k = 5, probeRadius = 1)
      .orderBy("q_id", "rank"),
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |n AS (SELECT vec_id, vd, ${nrmSql("vd")} AS nrm,
       |    CAST($bucketSql AS BIGINT) AS bucket FROM v),
       |scored AS (
       |  SELECT q.vec_id AS q_id, q.bucket, c.vec_id AS c_id,
       |    ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) AS cosine
       |  FROM n q JOIN n c
       |    ON bit_count(xor(q.bucket, c.bucket)) <= 1 AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id % 50 = 0)
       |SELECT q_id, bucket, rank, c_id, cosine FROM (
       |  SELECT q_id, bucket, c_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS INT) AS rank
       |  FROM scored) r
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)

  /** y2c: y2 at SIXTEEN hyperplanes — the declared proof that the coarse
    * quantizer's scale knob actually turns. The plane count is a literal
    * argument of the native `hyperplane_bucket` expression (and of the
    * oracle rendering), not a baked constant: a 10⁹-doc corpus runs this
    * exact plan with planes sized so corpus/2^planes stays a task-sized
    * bucket — each added plane halves expected occupancy (multi-probe,
    * y2b's shape, buys back the boundary recall the narrower buckets
    * cost). Plus-probe at Hamming 1 keeps the tiny-SF output non-trivial:
    * at 2^16 buckets over a correctness-SF corpus most own-buckets are
    * singletons. */
  private val y2cKnnBucketed16 = Q(
    (s, d) => Similarity.bucketedTopK(
        Tables.embeddings(s, d), id => id % 50 === 0, "vec_id", "embedding",
        k = 5, probeRadius = 1, planes = 16)
      .orderBy("q_id", "rank"),
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |n AS (SELECT vec_id, vd, ${nrmSql("vd")} AS nrm,
       |    CAST(${bucketSqlFor(64, 16)} AS BIGINT) AS bucket FROM v),
       |scored AS (
       |  SELECT q.vec_id AS q_id, q.bucket, c.vec_id AS c_id,
       |    ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) AS cosine
       |  FROM n q JOIN n c
       |    ON bit_count(xor(q.bucket, c.bucket)) <= 1 AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id % 50 = 0)
       |SELECT q_id, bucket, rank, c_id, cosine FROM (
       |  SELECT q_id, bucket, c_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS INT) AS rank
       |  FROM scored) r
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)

  /** y14: FILTERED vector search — the production ANN feature every
    * vector store ships (search WHERE metadata predicate) and the classic
    * way deployments silently lose recall: post-filtering retrieves top-K
    * from the unfiltered index and keeps survivors, which starves exactly
    * when the predicate is selective. The panel grades both strategies
    * per query against exact filtered-corpus truth (label < 3, ~30%
    * selectivity): PRE-filter applies the predicate inside the candidate
    * scan before ranking (at scale the label predicate pushes down to
    * the parquet scan of the probed bucket partitions — the filter is
    * FREE); POST-filter ranks all candidates, keeps the top-20, then
    * filters and takes 5 (the k'=4k rule of thumb). Both arms ride ONE
    * scored Hamming-1 multi-probe equi-join (y2b's candidate generator —
    * wide enough that the top-20 cutoff actually binds, which is where
    * post-filtering loses); truth costs |Q|·|C_filtered| on the
    * BOUNDED query batch (% 50 ∧ < 1000, the y-family discipline). Every
    * cell is an integer count — tolerance-free. n_pre_hit ≥ n_post_hit
    * row-by-row is the expected read; equality at low selectivity is the
    * sign post-filtering would have been fine. */
  private val y14FilteredAnn = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val b = e.select(col("vec_id"), col("label"), col("embedding"))
        .withColumn("bucket", Similarity.hyperplaneBucket("embedding"))
        .withColumn("nrm", Similarity.norm("embedding"))
      val q = b.filter(col("vec_id") % 50 === 0 && col("vec_id") < 1000)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("nrm").as("q_nrm"), col("bucket"))
        .withColumn("__probe", explode(array(
          col("bucket") +: (0 until Similarity.NumPlanes).map(j =>
            col("bucket").bitwiseXOR(lit(1L << j))): _*)))
      val c = b.select(col("vec_id").as("c_id"), col("label"),
        col("embedding").as("c_vec"), col("nrm").as("c_nrm"),
        col("bucket").as("__probe"))
      val scored = q.join(c, Seq("__probe")).filter(col("q_id") =!= col("c_id"))
        .withColumn("cosine", round(
          Similarity.dot("q_vec", "c_vec") / (col("q_nrm") * col("c_nrm")), 6))
        .select("q_id", "c_id", "label", "cosine")
      val wq = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
      val pre = scored.filter(col("label") < 3)
        .withColumn("rank", row_number().over(wq)).filter(col("rank") <= 5)
        .select("q_id", "c_id")
      val post = scored.withColumn("rank_all", row_number().over(wq))
        .filter(col("rank_all") <= 20 && col("label") < 3)
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy("rank_all")))
        .filter(col("rank") <= 5)
        .select("q_id", "c_id")
      val truth = Similarity.bruteForceTopK(
          e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 1000),
          e.filter(col("label") < 3), "vec_id", "embedding", k = 5)
        .select("q_id", "c_id")
      def cnt(dfx: org.apache.spark.sql.DataFrame, name: String) =
        dfx.groupBy("q_id").agg(count(lit(1)).as(name))
      def hit(dfx: org.apache.spark.sql.DataFrame, name: String) =
        dfx.join(truth, Seq("q_id", "c_id"), "left_semi")
          .groupBy("q_id").agg(count(lit(1)).as(name))
      q.select("q_id").distinct()
        .join(cnt(truth, "n_truth"), Seq("q_id"), "left")
        .join(cnt(pre, "n_pre"), Seq("q_id"), "left")
        .join(hit(pre, "n_pre_hit"), Seq("q_id"), "left")
        .join(cnt(post, "n_post"), Seq("q_id"), "left")
        .join(hit(post, "n_post_hit"), Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_truth"), lit(0L)).as("n_truth"),
          coalesce(col("n_pre"), lit(0L)).as("n_pre"),
          coalesce(col("n_pre_hit"), lit(0L)).as("n_pre_hit"),
          coalesce(col("n_post"), lit(0L)).as("n_post"),
          coalesce(col("n_post_hit"), lit(0L)).as("n_post_hit"))
        .orderBy("q_id")
    },
    s"""WITH v AS (SELECT vec_id, label, ${vdSql("embedding")} AS vd FROM embeddings),
       |n AS (SELECT vec_id, label, vd, ${nrmSql("vd")} AS nrm,
       |    CAST($bucketSql AS BIGINT) AS bucket FROM v),
       |qs AS (SELECT vec_id FROM n WHERE vec_id % 50 = 0 AND vec_id < 1000),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id, c.label,
       |    ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) AS cosine
       |  FROM n q JOIN n c
       |    ON bit_count(xor(q.bucket, c.bucket)) <= 1 AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id % 50 = 0 AND q.vec_id < 1000),
       |pre AS (SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id,
       |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
       |    FROM scored WHERE label < 3) a
       |  WHERE rank <= 5),
       |post AS (SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id,
       |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rank_all) AS rank
       |    FROM (
       |      SELECT q_id, c_id, label,
       |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank_all
       |      FROM scored) a
       |    WHERE rank_all <= 20 AND label < 3) b
       |  WHERE rank <= 5),
       |truth AS (SELECT q_id, c_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) DESC,
       |          c.vec_id) AS rank
       |    FROM n q JOIN n c ON q.vec_id <> c.vec_id AND c.label < 3
       |    WHERE q.vec_id % 50 = 0 AND q.vec_id < 1000) t
       |  WHERE rank <= 5),
       |tc AS (SELECT q_id, COUNT(*) AS n_truth FROM truth GROUP BY 1),
       |pc AS (SELECT q_id, COUNT(*) AS n_pre FROM pre GROUP BY 1),
       |ph AS (SELECT p.q_id, COUNT(*) AS n_pre_hit
       |  FROM pre p JOIN truth t ON t.q_id = p.q_id AND t.c_id = p.c_id GROUP BY 1),
       |oc AS (SELECT q_id, COUNT(*) AS n_post FROM post GROUP BY 1),
       |oh AS (SELECT p.q_id, COUNT(*) AS n_post_hit
       |  FROM post p JOIN truth t ON t.q_id = p.q_id AND t.c_id = p.c_id GROUP BY 1)
       |SELECT qs.vec_id AS q_id,
       |  COALESCE(tc.n_truth, 0) AS n_truth,
       |  COALESCE(pc.n_pre, 0) AS n_pre,
       |  COALESCE(ph.n_pre_hit, 0) AS n_pre_hit,
       |  COALESCE(oc.n_post, 0) AS n_post,
       |  COALESCE(oh.n_post_hit, 0) AS n_post_hit
       |FROM qs
       |LEFT JOIN tc ON tc.q_id = qs.vec_id
       |LEFT JOIN pc ON pc.q_id = qs.vec_id
       |LEFT JOIN ph ON ph.q_id = qs.vec_id
       |LEFT JOIN oc ON oc.q_id = qs.vec_id
       |LEFT JOIN oh ON oh.q_id = qs.vec_id
       |ORDER BY q_id""".stripMargin)

  /** y8: ANN recall evaluation — x24's twin for the similarity side: the
    * harness that tells you what the bucketed paths actually RECALL.
    * Brute-force top-10 per query is ground truth (the rerank rung is
    * exact by definition); the single-bucket join (y2's shape) and the
    * Hamming-1 multi-probe (y2b's) are graded by pair overlap. Output is
    * pure integer counts plus ONE int/int division per method — no
    * tolerance, no float folds. Reading this beside x26's S-curve is how
    * you pick plane count and probe radius before a corpus-scale run.
    * Scale: ground truth inherently costs |Q|·|C|, so the query batch is
    * BOUNDED (% 50 ∧ vec_id < 1000 — a no-op at correctness SFs): recall
    * is graded on a fixed sample while the corpus side grows linearly;
    * candidates stay bucket equi-joins. */
  private val y8AnnEval = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val truth = Similarity.bruteForceTopK(
          e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 1000), e,
          "vec_id", "embedding", k = 10)
        .select(col("q_id"), col("c_id"))
      val m1 = Similarity.bucketedTopK(e, id => id % 50 === 0 && id < 1000, "vec_id",
          "embedding", k = 10).select(col("q_id"), col("c_id"), lit("bucket").as("method"))
      val m2 = Similarity.bucketedTopK(e, id => id % 50 === 0 && id < 1000, "vec_id",
          "embedding", k = 10, probeRadius = 1)
        .select(col("q_id"), col("c_id"), lit("probe1").as("method"))
      val cands = m1.union(m2)
      val nTruth = truth.agg(count(lit(1)).as("n_truth"))
      val perMethod = cands.groupBy("method").agg(count(lit(1)).as("n_cand"))
      val hits = cands.join(truth, Seq("q_id", "c_id"), "left_semi")
        .groupBy("method").agg(count(lit(1)).as("n_hits"))
      perMethod.join(hits, Seq("method"), "left")
        .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
        .crossJoin(broadcast(nTruth))
        .select(col("method"), col("n_cand"), col("n_hits"), col("n_truth"),
          (col("n_hits") / col("n_truth")).as("recall_at_10"))
        .orderBy("method")
    },
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |n AS (SELECT vec_id, vd, ${nrmSql("vd")} AS nrm,
       |    CAST($bucketSql AS BIGINT) AS bucket FROM v),
       |truth AS (SELECT q_id, c_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) DESC,
       |          c.vec_id) AS rank
       |    FROM n q JOIN n c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id % 50 = 0 AND q.vec_id < 1000) t WHERE rank <= 10),
       |m1 AS (SELECT q_id, c_id, 'bucket' AS method FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) DESC,
       |          c.vec_id) AS rank
       |    FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
       |    WHERE q.vec_id % 50 = 0 AND q.vec_id < 1000) t WHERE rank <= 10),
       |m2 AS (SELECT q_id, c_id, 'probe1' AS method FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) DESC,
       |          c.vec_id) AS rank
       |    FROM n q JOIN n c
       |      ON bit_count(xor(q.bucket, c.bucket)) <= 1 AND q.vec_id <> c.vec_id
       |    WHERE q.vec_id % 50 = 0 AND q.vec_id < 1000) t WHERE rank <= 10),
       |cands AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2),
       |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
       |pm AS (SELECT method, CAST(count(*) AS BIGINT) AS n_cand
       |  FROM cands GROUP BY 1),
       |h AS (SELECT method, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM cands c WHERE EXISTS (SELECT 1 FROM truth t
       |    WHERE t.q_id = c.q_id AND t.c_id = c.c_id)
       |  GROUP BY 1)
       |SELECT pm.method, pm.n_cand, COALESCE(h.n_hits, 0) AS n_hits,
       |  nt.n_truth, COALESCE(h.n_hits, 0) / nt.n_truth AS recall_at_10
       |FROM pm LEFT JOIN h ON h.method = pm.method CROSS JOIN nt
       |ORDER BY pm.method""".stripMargin)

  /** y11: the IVF nprobe operating curve — y8's harness swept across the
    * recall knob itself: the SAME bounded query batch graded at nprobe =
    * 1, 2, 4 against brute-force truth, one row per setting. This is the
    * table an operator reads to buy recall with probes instead of
    * re-clustering (y3c picks a point on this curve; x26 is the analogous
    * planner for the LSH banding). Recall here is monotone in nprobe BY
    * CONSTRUCTION (probe sets nest), so the curve also doubles as a
    * cheap sanity gate on the cell assignment — a non-monotone row means
    * the probe ranking broke. Scale: truth costs |Q|·|C| (bounded batch,
    * the y7/y8 discipline); each candidate arm is the cell equi-join with
    * the query side exploded nprobe-way; the corpus side never
    * duplicates. */
  private val y11NprobeCurve = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val anchors = e.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      val truth = Similarity.bruteForceTopK(
          e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 1000), e,
          "vec_id", "embedding", k = 10)
        .select(col("q_id"), col("c_id"))
      val cands = Seq(1, 2, 4).map { p =>
        Similarity.ivfTopK(e, anchors, id => id % 50 === 0 && id < 1000,
            "vec_id", "embedding", k = 10, nprobe = p)
          .select(col("q_id"), col("c_id"), lit(p).as("nprobe"))
      }.reduce(_ union _)
      val nTruth = truth.agg(count(lit(1)).as("n_truth"))
      val perProbe = cands.groupBy("nprobe").agg(count(lit(1)).as("n_cand"))
      val hits = cands.join(truth, Seq("q_id", "c_id"), "left_semi")
        .groupBy("nprobe").agg(count(lit(1)).as("n_hits"))
      perProbe.join(hits, Seq("nprobe"), "left")
        .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
        .crossJoin(broadcast(nTruth))
        .select(col("nprobe"), col("n_cand"), col("n_hits"), col("n_truth"),
          (col("n_hits") / col("n_truth")).as("recall_at_10"))
        .orderBy("nprobe")
    },
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |anchors AS (SELECT vec_id AS anchor_id, vd AS avd FROM v WHERE vec_id < $IvfCells),
       |dists AS (
       |  SELECT v.vec_id, v.vd, a.anchor_id,
       |    ROUND(${dotSql("v.vd", "v.vd")} - 2.0 * ${dotSql("v.vd", "a.avd")}
       |      + ${dotSql("a.avd", "a.avd")}, 6) AS d2
       |  FROM v CROSS JOIN anchors a),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, anchor_id) AS rn
       |  FROM dists),
       |n AS (SELECT vec_id, vd, anchor_id AS cell, ${nrmSql("vd")} AS nrm
       |  FROM ranked WHERE rn = 1),
       |truth AS (SELECT q_id, c_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) DESC,
       |          c.vec_id) AS rank
       |    FROM n q JOIN n c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id % 50 = 0 AND q.vec_id < 1000) t WHERE rank <= 10),
       |probes AS (SELECT vec_id, vd, anchor_id AS cell, rn, ${nrmSql("vd")} AS nrm
       |  FROM ranked WHERE vec_id % 50 = 0 AND vec_id < 1000),
       |lvl AS (SELECT unnest([1, 2, 4]) AS nprobe),
       |cands AS (SELECT nprobe, q_id, c_id FROM (
       |    SELECT l.nprobe, q.vec_id AS q_id, c.vec_id AS c_id,
       |      ROW_NUMBER() OVER (PARTITION BY l.nprobe, q.vec_id
       |        ORDER BY ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) DESC,
       |          c.vec_id) AS rank
       |    FROM lvl l JOIN probes q ON q.rn <= l.nprobe
       |    JOIN n c ON q.cell = c.cell AND q.vec_id <> c.vec_id) t
       |  WHERE rank <= 10),
       |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
       |pm AS (SELECT nprobe, CAST(count(*) AS BIGINT) AS n_cand
       |  FROM cands GROUP BY 1),
       |h AS (SELECT nprobe, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM cands c WHERE EXISTS (SELECT 1 FROM truth t
       |    WHERE t.q_id = c.q_id AND t.c_id = c.c_id)
       |  GROUP BY 1)
       |SELECT pm.nprobe, pm.n_cand, COALESCE(h.n_hits, 0) AS n_hits,
       |  nt.n_truth, COALESCE(h.n_hits, 0) / nt.n_truth AS recall_at_10
       |FROM pm LEFT JOIN h ON h.nprobe = pm.nprobe CROSS JOIN nt
       |ORDER BY pm.nprobe""".stripMargin)

  /** y12: exact Gram matrix over the embedding table — the one-pass
    * second-moment primitive under whitening, PCA and OPQ rotation
    * (every one of those starts from Σ xᵢxⱼ; the 64×64 eigensolve itself
    * is driver-side metadata once this relation lands — y3b's
    * collect-one-summary-row precedent). Upper triangle only (the matrix
    * is symmetric), so the output is dims·(dims+1)/2 = 2080 rows at ANY
    * corpus size.
    *
    * Scale shape: each vector expands to its 2080 upper-triangle
    * products IN-TASK (two chained posexplodes + a j ≥ i filter — raw
    * pair rows never leave the stage), the per-product double multiply
    * snapshots at DECIMAL(30,10) (y4's discipline: float-derived double
    * products are one correctly-rounded op in both engines, and the
    * exact-decimal SUM is shuffle-order-independent), and the single
    * shuffle carries the map-side-combined (i, j) partials — dims² × P
    * rows, never the corpus. The expansion is compute (dims²/2 multiplies
    * per vector — what a Gram pass costs anywhere); the wire cost is
    * constant. */
  private val y12GramMatrix = Q(
    (s, d) => Similarity.gramUpper(Tables.embeddings(s, d), "embedding")
      .orderBy("i", "j"),
    s"""WITH e AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |idx AS (SELECT unnest(generate_series(0, 63)) AS k),
       |p AS (SELECT i.k AS i, j.k AS j,
       |    CAST(e.vd[i.k + 1] * e.vd[j.k + 1] AS DECIMAL(30,10)) AS p
       |  FROM e CROSS JOIN idx i CROSS JOIN idx j
       |  WHERE j.k >= i.k)
       |SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(p) AS DOUBLE) AS gram
       |FROM p GROUP BY 1, 2 ORDER BY i, j""".stripMargin)

  /** y13's anisotropic test corpus: the embedding table mixed through a
    * deterministic per-dimension variance ramp (dim i scaled by
    * 2^((32−i)/16) — 4× down to ~0.26×, a ~235× variance spread, cast
    * back to float). The REAL corpus is near-isotropic by construction
    * (measured eigenvalue spread 41.9 → 21.7, top/median 1.35), so no
    * rotation can help there — an A/B on it is a coin flip (measured:
    * rotated LOSES 21 vs 27 at sf0.1). Real text embeddings are famously
    * anisotropic; the ramp stands in for that structure, and on it the
    * rotation's win is mathematically forced: raw PQ's contiguous tiling
    * puts every high-variance dimension in subspace 0, whose 16-centroid
    * quantizer then dominates the ADC error. */
  private def y13Mixed(s: SparkSession, d: String) =
    Tables.embeddings(s, d)
      .withColumn("mvec", transform(col("embedding"), (x, i) =>
        (x.cast("double") * pow(lit(2.0), (lit(32.0) - i.cast("double")) / lit(16.0)))
          .cast("float")))
      .select(col("vec_id"), col("mvec"))

  /** One OPQ rotation per (session, input dir) — y12's Gram relation over
    * the mixed corpus collected (2,080 scalars, a few KB at ANY corpus
    * size) and eigensolved on the driver (deterministic cyclic Jacobi),
    * eigenvalue-allocated across the 8 PQ subspaces. Cached like y3d's
    * fitted index: Bench constructs every query twice and must not
    * re-run the Gram pass. */
  private val y13Rotations = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Array[Double]], org.apache.spark.sql.DataFrame)]()

  /** Returns (rotation, rotated corpus). The rotated frame is retain-
    * checkpointed (process-lifetime, exempt from the bench block sweep):
    * without the materialization barrier, CollapseProject inlines the
    * 64×64 rotation HOF into every consumer — pqEncode evaluates subDist2
    * once per (vector, subspace, anchor), so the rotation re-ran ~128×
    * per vector and the declared query measured 144 s at sf0.1; pinned
    * it is one rotation per vector (2.1 s). At warehouse scale the same
    * barrier is a store write (y3d's shape) — apply-once is the
    * production contract either way. */
  private def y13RotationFor(s: SparkSession, d: String)
      : (Array[Array[Double]], org.apache.spark.sql.DataFrame) =
    y13Rotations.computeIfAbsent(s"${s.sparkContext.applicationId}:$d", _ => {
      val mixed = y13Mixed(s, d)
      val rows = Similarity.gramUpper(mixed, "mvec")
        .select("i", "j", "gram").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
      val r = Similarity.opqRotation(Similarity.gramToMatrix(rows, 64), m = 8)
      val er = graft.Housekeeping.retainCheckpoint(s)(
        mixed.withColumn("rvec", Similarity.rotateVec("mvec", r)))
      (r, er)
    })

  /** y13: the Gram matrix CONSUMED — OPQ-rotated product quantization
    * graded against raw PQ at equal code budget on the y8 recall harness,
    * over the [[y13Mixed]] anisotropic corpus. The lifecycle is the
    * production one: y12's distributed Gram pass → driver-side 64×64
    * Jacobi eigensolve (metadata, not data — the y3b collect-one-summary
    * precedent) → eigenvalue-allocated rotation R applied at the
    * [[Similarity.pqEncode]] seam (an in-task HOF over a plan-constant
    * matrix literal — zero shuffle, zero joins added), then the SAME
    * m=8 × k=16 codebook/encode/ADC path as y5 runs in rotated space.
    * Rotation is orthogonal, so true geometry is untouched (asserted
    * driver-side: max |R·Rᵀ − I| < 1e-8); only the subspace tiling
    * changes, which is exactly the quantization-error lever.
    *
    * Declared output is the x6-style contract: bounded query batch size,
    * the orthogonality gate, and recall_rotated ≥ recall_raw (hit counts
    * against the exact brute-force truth — integer counts, no float
    * tolerance). Measured margins (raw → rotated hits of 100/100/200
    * truth pairs): sf0.001 21 → 26, sf0.01 14 → 40, sf0.1 19 → 45 — the
    * 2-3× recall lift a learned rotation buys on anisotropic data at
    * equal code budget. Scale: truth and both serve passes ride the y8
    * bounded-batch discipline (|Q| fixed, corpus linear); the Gram pass
    * is one shuffle of dims²×P partials; the eigensolve is O(dims³)
    * driver work. In plan-only sweeps the rotation is the identity (same
    * plan shape, zero actions at construction). */
  private val y13OpqRotation = Q(
    (s, d) => {
      val e = y13Mixed(s, d)
      val (r, er) =
        if (planOnly) identityRotated(e) else y13RotationFor(s, d)
      val orthogonal = Similarity.orthogonalityDefect(r) < 1e-8
      val qPred = col("vec_id") % 50 === 0 && col("vec_id") < 1000
      val cbRaw = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("anchor_id"), col("mvec").as("anchor_vec"))
      val cbRot = er.filter(col("vec_id") < 16)
        .select(col("vec_id").as("anchor_id"), col("rvec").as("anchor_vec"))
      val truth = Similarity.bruteForceTopK(
          e.filter(qPred), e, "vec_id", "mvec", k = 10)
        .select("q_id", "c_id")
      def hits(top: org.apache.spark.sql.DataFrame) = top.select("q_id", "c_id")
        .join(truth, Seq("q_id", "c_id"), "left_semi")
        .agg(count(lit(1)).as("n"))
      val rawTop = Similarity.pqTopK(
        Similarity.pqEncode(e, cbRaw, "vec_id", "mvec", m = 8, subDim = 8),
        cbRaw, e.filter(qPred), "vec_id", "mvec", m = 8, subDim = 8, k = 10)
      val rotTop = Similarity.pqTopK(
        Similarity.pqEncode(er, cbRot, "vec_id", "rvec", m = 8, subDim = 8),
        cbRot, er.filter(qPred), "vec_id", "rvec", m = 8, subDim = 8, k = 10)
      val nQ = e.filter(qPred).agg(count(lit(1)).as("n_queries"))
      nQ.crossJoin(hits(rawTop).select(col("n").as("n_raw")))
        .crossJoin(hits(rotTop).select(col("n").as("n_rot")))
        .select(col("n_queries"), lit(orthogonal).as("rotation_orthogonal"),
          (col("n_rot") >= col("n_raw")).as("recall_ok"))
    },
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
      |  TRUE AS rotation_orthogonal, TRUE AS recall_ok
      |FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 1000""".stripMargin)

  /** The identity rotation + unpinned projection pair the plan-only
    * sweeps substitute for [[y13RotationFor]] — same downstream plan
    * shape, zero actions at construction. */
  private def identityRotated(e: org.apache.spark.sql.DataFrame)
      : (Array[Array[Double]], org.apache.spark.sql.DataFrame) = {
    val id = Array.tabulate(64, 64)((i, j) => if (i == j) 1.0 else 0.0)
    (id, e.withColumn("rvec", Similarity.rotateVec("mvec", id)))
  }

  /** y9b: the IVF-PQ SERVING path (y9) with the OPQ rotation applied at
    * its encode seam — the first of the two production deployments the
    * y13 rotation was built for. Both arms run the COMPLETE y9 DAG
    * (coarse-assign → per-cell PQ codes → blocked ADC top-10) on the
    * anisotropic [[y13Mixed]] corpus at equal code budget; the rotated
    * arm rotates EVERYTHING (corpus, anchors, codebook, queries), which
    * an orthogonal rotation makes free: true distances are preserved, so
    * cell pruning is geometry-identical, and only the PQ subspace tiling
    * — the quantization-error lever — changes. Same x6-style contract as
    * y13 (bounded batch, orthogonality, recall_rotated ≥ recall_raw
    * against exact brute truth); the measured hit counts are pinned in
    * ExtensionsSpec so a quantizer regression can't hide inside the
    * still-true inequality. */
  private val y9bIvfPqRotated = Q(
    (s, d) => {
      // scoped AQE floor (r14): both arms' blocked ADC scoring is
      // byte-tiny but CPU-dense — 64k vs 1m measured 1.49 vs 2.12 s
      // (min of 4, in-JVM A/B); same class as x23's pair scorer. Applies
      // to THIS query only; the harness sweep restores the default.
      graft.Housekeeping.scopedConf(s,
        "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      val e = y13Mixed(s, d)
      val (r, er) =
        if (planOnly) identityRotated(e) else y13RotationFor(s, d)
      val orthogonal = Similarity.orthogonalityDefect(r) < 1e-8
      val qPred = col("vec_id") % 50 === 0 && col("vec_id") < 1000
      val truth = Similarity.bruteForceTopK(
          e.filter(qPred), e, "vec_id", "mvec", k = 10)
        .select("q_id", "c_id")
      def hitsFor(vecs: org.apache.spark.sql.DataFrame, vc: String) = {
        val anchors = vecs.filter(col("vec_id") < IvfCells)
          .select(col("vec_id").as("anchor_id"), col(vc).as("anchor_vec"))
        val cb = vecs.filter(col("vec_id") < 16)
          .select(col("vec_id").as("anchor_id"), col(vc).as("anchor_vec"))
        val assigned = Similarity.ivfAssign(vecs, anchors, "vec_id", vc)
          .select(col("vec_id"), col(vc), col("cell"))
        val codes = Similarity.pqEncode(assigned, cb, "vec_id", vc,
          m = 8, subDim = 8, carryCols = Seq("cell"))
        Similarity.pqTopK(codes, cb, assigned.filter(qPred), "vec_id", vc,
            m = 8, subDim = 8, k = 10, blockCol = Some("cell"))
          .select("q_id", "c_id")
          .join(truth, Seq("q_id", "c_id"), "left_semi")
          .agg(count(lit(1)).as("n"))
      }
      val nQ = e.filter(qPred).agg(count(lit(1)).as("n_queries"))
      nQ.crossJoin(hitsFor(e, "mvec").select(col("n").as("n_raw")))
        .crossJoin(hitsFor(er.select(col("vec_id"), col("rvec")), "rvec")
          .select(col("n").as("n_rot")))
        .select(col("n_queries"), lit(orthogonal).as("rotation_orthogonal"),
          (col("n_rot") >= col("n_raw")).as("recall_ok"))
    },
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
      |  TRUE AS rotation_orthogonal, TRUE AS recall_ok
      |FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 1000""".stripMargin)

  /** One stored rotated-PQ index per (session, input dir) — y3d's
    * cache-and-shutdown-hook discipline for the OPQ-rotated serve table:
    * coarse-assign the ROTATED corpus, PQ-encode in rotated space, and
    * persist the 8-byte code rows through the Store partitioned by cell
    * (the read side prunes to probed cells; candidate vectors are never
    * read at serve time — the whole point of a PQ index on 100 TB). */
  private val y3fBuilt = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()

  private def y3fStoredCodes(s: SparkSession, d: String,
                             er: org.apache.spark.sql.DataFrame) =
    y3fBuilt.computeIfAbsent(s"${s.sparkContext.applicationId}:$d", _ => {
      val anchors = er.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("anchor_id"), col("rvec").as("anchor_vec"))
      val cb = er.filter(col("vec_id") < 16)
        .select(col("vec_id").as("anchor_id"), col("rvec").as("anchor_vec"))
      val assigned = Similarity.ivfAssign(er, anchors, "vec_id", "rvec")
        .select(col("vec_id"), col("rvec"), col("cell"))
      val codes = Similarity.pqEncode(assigned, cb, "vec_id", "rvec",
        m = 8, subDim = 8, carryCols = Seq("cell"))
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
        s"opq_index_${s.sparkContext.applicationId}_${Integer.toHexString(d.hashCode)}"
      val store = graft.sources.Store(s, path, "cell")
      store.destroy()
      store.append(codes)
      sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
      store.read
    })

  /** y3f: the fitted STORE/SERVE index rotated — the second production
    * deployment (y3d's lifecycle with OPQ + PQ codes as the persisted
    * payload). Build: rotate the corpus (the cached y13 rotation),
    * coarse-assign and PQ-encode in rotated space, persist the code
    * table through the Store partitioned by cell. Serve: assign the
    * BOUNDED query batch to its cell, ADC-rank the STORED codes of that
    * cell (the corpus is never re-read or re-encoded at serve time).
    * Graded like y9b: recall against exact brute truth must be ≥ the
    * same-budget UNROTATED in-memory IVF-PQ arm, the rotation must be
    * orthogonal, and every cell of the stored index must be non-empty
    * (y3d's contract). Hit counts pinned in ExtensionsSpec. */
  private val y3fKnnOpqFitted = Q(
    (s, d) => {
      val e = y13Mixed(s, d)
      val (r, er) =
        if (planOnly) identityRotated(e) else y13RotationFor(s, d)
      val orthogonal = Similarity.orthogonalityDefect(r) < 1e-8
      val qPred = col("vec_id") % 50 === 0 && col("vec_id") < 1000
      val anchorsRot = er.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("anchor_id"), col("rvec").as("anchor_vec"))
      val cbRot = er.filter(col("vec_id") < 16)
        .select(col("vec_id").as("anchor_id"), col("rvec").as("anchor_vec"))
      val stored =
        if (planOnly)
          Similarity.pqEncode(
            Similarity.ivfAssign(er, anchorsRot, "vec_id", "rvec")
              .select(col("vec_id"), col("rvec"), col("cell")),
            cbRot, "vec_id", "rvec", m = 8, subDim = 8, carryCols = Seq("cell"))
        else y3fStoredCodes(s, d, er)
      val truth = Similarity.bruteForceTopK(
          e.filter(qPred), e, "vec_id", "mvec", k = 10)
        .select("q_id", "c_id")
      def hits(top: org.apache.spark.sql.DataFrame) = top.select("q_id", "c_id")
        .join(truth, Seq("q_id", "c_id"), "left_semi")
        .agg(count(lit(1)).as("n"))
      val qAssigned = Similarity.ivfAssign(er.filter(qPred), anchorsRot,
          "vec_id", "rvec")
        .select(col("vec_id"), col("rvec"), col("cell"))
      val rotTop = Similarity.pqTopK(stored, cbRot, qAssigned, "vec_id", "rvec",
        m = 8, subDim = 8, k = 10, blockCol = Some("cell"))
      // equal-budget unrotated arm, in-memory (the y9 DAG verbatim)
      val anchorsRaw = e.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("anchor_id"), col("mvec").as("anchor_vec"))
      val cbRaw = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("anchor_id"), col("mvec").as("anchor_vec"))
      val assignedRaw = Similarity.ivfAssign(e, anchorsRaw, "vec_id", "mvec")
        .select(col("vec_id"), col("mvec"), col("cell"))
      val rawTop = Similarity.pqTopK(
        Similarity.pqEncode(assignedRaw, cbRaw, "vec_id", "mvec",
          m = 8, subDim = 8, carryCols = Seq("cell")),
        cbRaw, assignedRaw.filter(qPred), "vec_id", "mvec",
        m = 8, subDim = 8, k = 10, blockCol = Some("cell"))
      val nQ = e.filter(qPred).agg(count(lit(1)).as("n_queries"))
      val nCells = stored.agg(countDistinct(col("cell")).as("n_cells"))
      nQ.crossJoin(broadcast(nCells))
        .crossJoin(hits(rawTop).select(col("n").as("n_raw")))
        .crossJoin(hits(rotTop).select(col("n").as("n_rot")))
        .select(col("n_queries"), lit(orthogonal).as("rotation_orthogonal"),
          (col("n_cells") === IvfCells).as("cells_nonempty"),
          (col("n_rot") >= col("n_raw")).as("recall_ok"))
    },
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
      |  TRUE AS rotation_orthogonal, TRUE AS cells_nonempty, TRUE AS recall_ok
      |FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 1000""".stripMargin)

  /** y3b: the iterated Lloyd loop over the IVF anchors — 4 assign/refine
    * rounds from the deterministic seed anchors. Refined centroids are
    * double means (engine-unstable by design, see lloydRefine), so the
    * declared output is the x6-style CONTRACT the iteration must satisfy
    * wherever it runs: every cell stays populated, and the within-cluster
    * squared distance never increases round over round (both Lloyd steps
    * are non-increasing). The slack scales with the corpus: per row the
    * argmin on 6-dp-rounded d2 can pick a centroid up to 1e-6 worse AND
    * the two observed sums each carry up to 0.5e-6·n of rounding offset
    * in opposite directions, so 2e-6·n bounds the worst-case noise at ANY
    * SF — a fixed slack would fail data-dependently on a large corpus
    * near convergence. The exact numerics live in the ScalaTest
    * convergence spec.
    *
    * NOTE: constructing this frame RUNS the 4-round driver loop (the
    * contract summarizes driver-collected scalars — inherent to the
    * query's shape, and why the codegen plan audit exempts it). */
  private val y3bKmeansIterate = Q(
    (s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val anchors = e.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      val res = Similarity.kmeansFit(e, anchors, "vec_id", "embedding",
        maxIters = 4, eps = 0.0)
      val contract = res.history.zip(Double.PositiveInfinity +: res.history.map(_.wcss))
        .map { case (r, prevWcss) =>
          (r.iter, r.nCells == IvfCells.toLong, r.wcss <= prevWcss + 2e-6 * (r.n + 1)) }
      contract.toDF("iter", "cells_nonempty", "wcss_decreased").orderBy("iter")
    },
    """SELECT CAST(i AS INT) AS iter, TRUE AS cells_nonempty,
      |  TRUE AS wcss_decreased
      |FROM generate_series(1, 4) t(i) ORDER BY iter""".stripMargin)

  /** IVF ANN: deterministic anchor vectors (the first IvfCells) as the
    * coarse quantizer, argmin-L2 cell assignment (6-dp-rounded distances,
    * anchor id tiebreak), cosine top-5 within the query's own cell. */
  private val y3KnnIvf = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val anchors = e.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      Similarity.ivfTopK(e, anchors, id => id % 50 === 0, "vec_id", "embedding", k = 5)
        .orderBy("q_id", "rank")
    },
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |anchors AS (SELECT vec_id AS anchor_id, vd AS avd FROM v WHERE vec_id < $IvfCells),
       |dists AS (
       |  SELECT v.vec_id, v.vd, a.anchor_id,
       |    ROUND(${dotSql("v.vd", "v.vd")} - 2.0 * ${dotSql("v.vd", "a.avd")}
       |      + ${dotSql("a.avd", "a.avd")}, 6) AS d2
       |  FROM v CROSS JOIN anchors a),
       |assigned AS (
       |  SELECT vec_id, vd, anchor_id AS cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, anchor_id) AS rn
       |    FROM dists) x WHERE rn = 1),
       |n AS (SELECT vec_id, vd, cell, ${nrmSql("vd")} AS nrm FROM assigned),
       |scored AS (
       |  SELECT q.vec_id AS q_id, q.cell, c.vec_id AS c_id,
       |    ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) AS cosine
       |  FROM n q JOIN n c ON q.cell = c.cell AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id % 50 = 0)
       |SELECT q_id, cell, rank, c_id, cosine FROM (
       |  SELECT q_id, cell, c_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS INT) AS rank
       |  FROM scored) r
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)

  /** y4: exact per-label centroid statistics — the embedding-table health
    * report a curation run computes per cluster/source (centroid norm +
    * vector count). posexplode fans each vector into (label, dim) pairs
    * map-side; ONE shuffle on the (label, dim) key (cardinality = labels ×
    * 64, bounded however many vectors arrive), then a label-sized reduce.
    * Float sums are order-dependent across engines, so every sum runs in
    * exact DECIMAL (dim values snapshot at 10 frac digits, squared means
    * at 12) with single correctly-rounded double ops at the boundaries —
    * bit-identical in both engines. */
  /** y7: bitext mining by margin scoring — the LASER/CCMatrix shape for
    * harvesting parallel training pairs: embeddings are split into two
    * sides (here by vec_id parity, standing in for two languages), each
    * sampled query on side A is scored against side B, and the best match
    * is kept only when it clearly beats the query's OWN neighborhood —
    * margin = cos₁ / mean(cos of the top 4). Absolute-cosine thresholds
    * fail on hubness (some vectors are near everything); the margin
    * criterion is the published fix (Artetxe & Schwenk 2019).
    *
    * Scale: the brute-force A×B here is the sampled-query/rerank form (y1
    * precedent); the full-corpus path swaps in the y2 hyperplane bucket
    * join, margin unchanged. Cross-engine exactness: cosines round to 6dp
    * BEFORE ranking; the margin denominator is built from `lead()` values
    * summed in pinned left-to-right order, so the division is one IEEE op
    * on identical operands — bit-identical, no tolerance. */
  private val y7BitextMargin = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      // query batch BOUNDED (vec_id < 1000 ∧ %10): a %-sample alone grows
      // with the corpus and turns the A×B score into a quadratic (the
      // round-3 m4 lesson); a bounded batch keeps the declared query the
      // rerank rung — linear in the corpus side. No-op at correctness SFs.
      val q = e.filter(col("vec_id") % 2 === 0 && col("vec_id") % 10 === 0 &&
          col("vec_id") < 1000)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        .withColumn("q_nrm", Similarity.norm("q_vec"))
      val c = e.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        .withColumn("c_nrm", Similarity.norm("c_vec"))
      val scored = broadcast(q).join(c)
        .withColumn("cosine",
          round(Similarity.dot("q_vec", "c_vec") / (col("q_nrm") * col("c_nrm")), 6))
      val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
      scored
        .withColumn("rank", row_number().over(w))
        .withColumn("l1", lead(col("cosine"), 1).over(w))
        .withColumn("l2", lead(col("cosine"), 2).over(w))
        .withColumn("l3", lead(col("cosine"), 3).over(w))
        .filter(col("rank") === 1)
        .withColumn("margin",
          col("cosine") / ((col("cosine") + col("l1") + col("l2") + col("l3")) / 4))
        .select(col("q_id"), col("c_id"), col("cosine"), col("margin"),
          (col("margin") >= 1.05).as("accepted"))
        .orderBy("q_id")
    },
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |n AS (SELECT vec_id, vd, ${nrmSql("vd")} AS nrm FROM v),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) AS cosine
       |  FROM n q JOIN n c ON c.vec_id % 2 = 1
       |  WHERE q.vec_id % 2 = 0 AND q.vec_id % 10 = 0 AND q.vec_id < 1000),
       |ranked AS (
       |  SELECT q_id, c_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank,
       |    lead(cosine, 1) OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS l1,
       |    lead(cosine, 2) OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS l2,
       |    lead(cosine, 3) OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS l3
       |  FROM scored)
       |SELECT q_id, c_id, cosine,
       |  cosine / ((cosine + l1 + l2 + l3) / 4) AS margin,
       |  cosine / ((cosine + l1 + l2 + l3) / 4) >= CAST(1.05 AS DOUBLE) AS accepted
       |FROM ranked WHERE rank = 1 ORDER BY q_id""".stripMargin)

  private val y4CentroidStats = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val e = Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      e.groupBy("label", "pos")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast(DoubleType).cast(DecimalType(20, 10))).as("s_dec"))
        .withColumn("davg", col("s_dec").cast(DoubleType) / col("n"))
        .withColumn("avg2_dec", (col("davg") * col("davg")).cast(DecimalType(24, 12)))
        .groupBy("label")
        .agg(max(col("n")).as("n_vecs"), sum(col("avg2_dec")).as("ss_dec"))
        .select(col("label"), col("n_vecs"),
          sqrt(col("ss_dec").cast(DoubleType)).as("centroid_norm"))
        .orderBy("label")
    },
    """WITH g AS (SELECT label, embedding,
      |    unnest(generate_series(1, len(embedding))) AS pos FROM embeddings),
      |e AS (SELECT label, pos, CAST(embedding[pos] AS DOUBLE) AS v FROM g),
      |d AS (SELECT label, pos, COUNT(*) AS n,
      |    CAST(SUM(CAST(v AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS davg
      |  FROM e GROUP BY 1, 2),
      |s AS (SELECT label, MAX(n) AS n_vecs,
      |    SUM(CAST(davg * davg AS DECIMAL(24,12))) AS ss
      |  FROM d GROUP BY 1)
      |SELECT label, n_vecs, sqrt(CAST(ss AS DOUBLE)) AS centroid_norm
      |FROM s ORDER BY label""".stripMargin)

  /** y3c: IVF with nprobe=3 — the standard recall knob: each query
    * searches its three nearest cells, so neighbors just across a cell
    * boundary come back. Same equi-join shape as y3; the query side
    * carries 3 rows per query, the candidate side never duplicates. */
  private val y3cKnnNprobe = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val anchors = e.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      Similarity.ivfTopK(e, anchors, id => id % 50 === 0, "vec_id", "embedding",
          k = 5, nprobe = 3)
        .orderBy("q_id", "rank")
    },
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |anchors AS (SELECT vec_id AS anchor_id, vd AS avd FROM v WHERE vec_id < $IvfCells),
       |dists AS (
       |  SELECT v.vec_id, v.vd, a.anchor_id,
       |    ROUND(${dotSql("v.vd", "v.vd")} - 2.0 * ${dotSql("v.vd", "a.avd")}
       |      + ${dotSql("a.avd", "a.avd")}, 6) AS d2
       |  FROM v CROSS JOIN anchors a),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, anchor_id) AS rn
       |  FROM dists),
       |assigned AS (SELECT vec_id, vd, anchor_id AS cell FROM ranked WHERE rn = 1),
       |n AS (SELECT vec_id, vd, cell, ${nrmSql("vd")} AS nrm FROM assigned),
       |qprobe AS (
       |  SELECT vec_id, vd, anchor_id AS cell, ${nrmSql("vd")} AS nrm
       |  FROM ranked WHERE rn <= 3 AND vec_id % 50 = 0),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.cell, c.vec_id AS c_id,
       |    ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) AS cosine
       |  FROM qprobe q JOIN n c ON q.cell = c.cell AND q.vec_id <> c.vec_id)
       |SELECT q_id, cell, rank, c_id, cosine FROM (
       |  SELECT q_id, cell, c_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS INT) AS rank
       |  FROM scored) r
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)

  /** y3e: the y3 serve plan at SIXTY-FOUR cells — the anchor-count twin
    * of y2c's plane proof: nothing in the IVF path is shaped around a
    * cell count (assignment is the same argmin over a broadcast anchor
    * table, serving the same cell equi-join), so a production corpus
    * raises the count until corpus/cells is a task-sized candidate set.
    * nprobe=2 keeps the tiny-SF output non-trivial (≈8 vectors per cell
    * at sf0.01). */
  private val y3eKnnIvf64 = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val anchors = e.filter(col("vec_id") < 64)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      Similarity.ivfTopK(e, anchors, id => id % 50 === 0, "vec_id", "embedding",
          k = 5, nprobe = 2)
        .orderBy("q_id", "rank")
    },
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |anchors AS (SELECT vec_id AS anchor_id, vd AS avd FROM v WHERE vec_id < 64),
       |dists AS (
       |  SELECT v.vec_id, v.vd, a.anchor_id,
       |    ROUND(${dotSql("v.vd", "v.vd")} - 2.0 * ${dotSql("v.vd", "a.avd")}
       |      + ${dotSql("a.avd", "a.avd")}, 6) AS d2
       |  FROM v CROSS JOIN anchors a),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, anchor_id) AS rn
       |  FROM dists),
       |assigned AS (SELECT vec_id, vd, anchor_id AS cell FROM ranked WHERE rn = 1),
       |n AS (SELECT vec_id, vd, cell, ${nrmSql("vd")} AS nrm FROM assigned),
       |qprobe AS (
       |  SELECT vec_id, vd, anchor_id AS cell, ${nrmSql("vd")} AS nrm
       |  FROM ranked WHERE rn <= 2 AND vec_id % 50 = 0),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.cell, c.vec_id AS c_id,
       |    ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) AS cosine
       |  FROM qprobe q JOIN n c ON q.cell = c.cell AND q.vec_id <> c.vec_id)
       |SELECT q_id, cell, rank, c_id, cosine FROM (
       |  SELECT q_id, cell, c_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS INT) AS rank
       |  FROM scored) r
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)

  /** y3d: the full fit → store → serve IVF lifecycle as ONE declared
    * query — y3b trains, y3/y3c serve off SEEDED anchors; this is the
    * production path that connects them: Lloyd-refine the anchors
    * (3 rounds), build the corpus-wide index against the REFINED
    * centroids, persist it through the Store (partitioned by cell, the
    * read side prunes to probed cells), read it back, and serve a query
    * batch via `ivfTopKAssigned` with nprobe=2 — the corpus is never
    * re-assigned at serve time. Refined centroids are double means
    * (engine-unstable by design, see lloydRefine), so the declared output
    * is the x6-style CONTRACT the serve path must satisfy wherever it
    * runs: the query batch size (exact value), every cell non-empty after
    * refinement, and recall@5 against brute force over the stored index
    * at or above 40% (nprobe=2 of 8 cells — a deliberately loose
    * invariant; the gate passes it at both correctness SFs). */
  /** Plan-only construction mode: PlanAuditSpec's registry-wide schema and
    * codegen sweeps construct every declared query just to READ its plan —
    * a query whose construction runs side effects (y3d's kmeans-fit actions
    * and store write) substitutes a plan-shape-identical in-memory path
    * when this property is set. Production entry points (Verify, Bench,
    * Soak) never set it, so the gated output is always the real lifecycle. */
  private def planOnly: Boolean = sys.props.get("graft.plan.only").contains("true")

  /** One fitted-IVF build per (session, input dir): repeated constructions
    * (Bench runs every query twice) reuse the first build's persisted index
    * instead of re-running the fit and the parquet write — exactly the
    * production contract ("the corpus is never re-assigned at serve time").
    * The cached anchors are COLLECTED to a driver-local frame (8 rows,
    * broadcast-sized by definition): the fit's localCheckpoint blocks are
    * swept by `Housekeeping.releaseAllBlocks` between bench iterations, so
    * a cached frame must not reference them. The tmp store is destroyed by
    * a JVM shutdown hook registered once per build. */
  private val y3dBuilt = new java.util.concurrent.ConcurrentHashMap[
    String, (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]()

  private def y3dIndexAndAnchors(s: SparkSession, d: String) =
    y3dBuilt.computeIfAbsent(s"${s.sparkContext.applicationId}:$d", _ => {
      val e = Tables.embeddings(s, d)
      val seed = e.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      val fit = Similarity.kmeansFit(e, seed, "vec_id", "embedding",
        maxIters = 3, eps = 0.0)
      // namespaced by BOTH the input dir and the application id: two JVMs
      // verifying the same SF concurrently must not destroy()/append the
      // same store out from under each other's lazy read-back (hex of the
      // raw hash — math.abs would stay negative on Int.MinValue)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
        s"ivf_fitted_${s.sparkContext.applicationId}_${Integer.toHexString(d.hashCode)}"
      val store = graft.sources.Store(s, path, "cell")
      store.destroy()
      store.append(Similarity.ivfAssign(e, fit.anchors, "vec_id", "embedding")
        .withColumn("nrm", Similarity.norm("embedding"))
        .drop("cell_d2"))
      sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
      val localAnchors = s.createDataFrame(
        java.util.Arrays.asList(fit.anchors.collect(): _*), fit.anchors.schema)
      (store.read, localAnchors)
    })

  private val y3dKnnIvfFitted = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val (index, anchors) =
        if (planOnly) {
          // plan/schema sweeps: same serve-plan shape (assign → cell
          // equi-join → per-query window) off the in-memory assignment,
          // zero actions and zero writes at construction time
          val seed = e.filter(col("vec_id") < IvfCells)
            .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
          (Similarity.ivfAssign(e, seed, "vec_id", "embedding")
            .withColumn("nrm", Similarity.norm("embedding")).drop("cell_d2"), seed)
        } else y3dIndexAndAnchors(s, d)
      val served = Similarity.ivfTopKAssigned(index, anchors,
        id => id % 50 === 0, "vec_id", "embedding", k = 5, nprobe = 2)
      // recall gate on a BOUNDED query batch (y8's `< 1000` discipline —
      // no-op at the correctness SFs): the brute side is then
      // corpus-linear, O(1000·n), not the n²/50 an unbounded query set
      // would cost. The serve path itself stays unbounded.
      val brute = Similarity.bruteForceTopK(
        e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 1000),
        e, "vec_id", "embedding", k = 5)
      val nMatch = served.select("q_id", "c_id")
        .join(brute.select("q_id", "c_id"), Seq("q_id", "c_id"), "left_semi")
        .agg(count(lit(1)).as("n_match"))
      val nBrute = brute.agg(count(lit(1)).as("n_brute"))
      val nQ = e.filter(col("vec_id") % 50 === 0)
        .agg(count(lit(1)).as("n_queries"))
      val nCells = index.agg(countDistinct(col("cell")).as("n_cells"))
      nQ.crossJoin(nCells).crossJoin(nMatch).crossJoin(nBrute)
        .select(col("n_queries"),
          (col("n_cells") === IvfCells).as("cells_nonempty"),
          (col("n_match") >= col("n_brute") * 0.4).as("recall_ok"))
    },
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
      |  TRUE AS cells_nonempty, TRUE AS recall_ok
      |FROM embeddings WHERE vec_id % 50 = 0""".stripMargin)

  /** Embedding-cosine near-dup: same-bucket pairs ranked by cosine (top-50).
    * The dedup-flavored variant of y2 — pair output, not per-query kNN. */
  /** Shared top-50 embedding near-dup pair stage (x5 output, x15 input):
    * hyperplane-bucketed cosine pairs, highest-cosine 50 with pinned
    * tiebreakers. */
  private def x5TopPairs(s: SparkSession, d: String) = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .withColumn("bucket", Similarity.hyperplaneBucket("embedding"))
      .withColumn("nrm", Similarity.norm("embedding"))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"),
      col("nrm").as("na"), col("bucket"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
      col("nrm").as("nb"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(Similarity.dot("va", "vb") / (col("na") * col("nb")), 6))
      .select("bucket", "id_a", "id_b", "cosine")
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(50)
  }

  /** DuckDB CTEs mirroring [[x5TopPairs]] — shared by the x5 and x15
    * oracles so the pair stage can never drift between them. */
  private val x5PairsCtes: String =
    s"""v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |n AS (SELECT vec_id, vd, ${nrmSql("vd")} AS nrm,
       |    CAST($bucketSql AS BIGINT) AS bucket FROM v),
       |cand AS (
       |  SELECT a.bucket, a.vec_id AS id_a, b.vec_id AS id_b,
       |    ROUND(${dotSql("a.vd", "b.vd")} / (a.nrm * b.nrm), 6) AS cosine
       |  FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |top AS (SELECT * FROM cand ORDER BY cosine DESC, id_a, id_b LIMIT 50)""".stripMargin

  private val x5EmbedNeardup = Q(
    (s, d) => x5TopPairs(s, d),
    s"""WITH $x5PairsCtes
       |SELECT bucket, id_a, id_b, cosine FROM top
       |ORDER BY cosine DESC, id_a, id_b""".stripMargin)

  /** x15: SEMANTIC dedup (SemDeDup shape) — embedding-space near-dup
    * pairs → connected components → one survivor per semantic cluster,
    * reported per label. The same clustering machinery as x8 runs on
    * embedding-derived edges instead of shingle-derived ones — textually
    * distinct rewrites that land close in embedding space merge here.
    * The oracle replays the full reachability fixpoint recursively over
    * the SAME top-50 pair CTE the x5 oracle uses. */
  private val x15SemanticDedup = Q(
    (s, d) => {
      val pairs = x5TopPairs(s, d)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      val nodes = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
      Dedup.connectedComponents(pairs, nodes.select("vec_id"), "vec_id")
        .join(nodes, Seq("vec_id"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          countDistinct(col("cluster_id")).as("n_clusters"),
          (count(lit(1)) - countDistinct(col("cluster_id"))).as("n_merged"))
        .orderBy("label")
    },
    s"""WITH RECURSIVE $x5PairsCtes,
       |edges AS (SELECT id_a AS src, id_b AS dst FROM top
       |          UNION ALL SELECT id_b, id_a FROM top),
       |reach(node, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.node),
       |comp AS (SELECT node, min(r) AS cid FROM reach GROUP BY 1),
       |lab AS (SELECT e.vec_id, e.label,
       |    COALESCE(c.cid, e.vec_id) AS cluster_id
       |  FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.node)
       |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |  CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       |  CAST(COUNT(*) - COUNT(DISTINCT cluster_id) AS BIGINT) AS n_merged
       |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin)

  /** y15: IVF ARRIVAL MAINTENANCE panel — the ANN-side twin of x39's
    * ingest story: a fitted index's centroids are a STORED artifact, and
    * the daily embedding batch is assigned against them without touching
    * the base corpus. The panel an index-maintenance dashboard plots per
    * cell: base occupancy, arrival occupancy, mean assignment distance on
    * each side, a `growth_hot` flag (this cell's arrival-to-base ratio
    * over 2× the global 1:9 arrival-to-base ratio, i.e. an in-cell
    * arrival share above ~18.2% — occupancy skew building up) and
    * a `drift` flag (arrival mean d² over 1.5× the base mean — the batch
    * is landing FAR from this centroid, the refit trigger signal). The
    * anchors here are the seeded y3/y3e kind so the whole panel is
    * engine-replayable; y3d's Lloyd-refined lifecycle serves real traffic,
    * and this panel is what decides when to re-run its fit.
    *
    * Scale: assignment is the y3 argmin against a broadcast anchor table
    * (corpus never shuffles); the panel is one map-side-combinable
    * aggregate on the cell key — cells ≪ executors, so the final exchange
    * carries `cells` rows. Mean distances ride DECIMAL(20,6) sums of the
    * per-row rounded d² (fold-order-exact on any cluster). */
  private val y15IvfArrival = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val e = Tables.embeddings(s, d)
      val anchors = e.filter(col("vec_id") < IvfCells && col("vec_id") % 10 =!= 9)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      val assigned = Similarity.ivfAssign(e, anchors, "vec_id", "embedding")
        .withColumn("arr", col("vec_id") % 10 === 9)
      val d2dec = col("cell_d2").cast(DecimalType(20, 6))
      assigned.groupBy("cell")
        .agg(
          sum(when(!col("arr"), 1L).otherwise(0L)).as("n_base"),
          sum(when(col("arr"), 1L).otherwise(0L)).as("n_arrivals"),
          sum(when(!col("arr"), d2dec)).as("sb"),
          sum(when(col("arr"), d2dec)).as("sa"))
        .withColumn("base_mean_d2",
          when(col("n_base") > 0, col("sb").cast(DoubleType) / col("n_base")))
        .withColumn("arr_mean_d2",
          when(col("n_arrivals") > 0, col("sa").cast(DoubleType) / col("n_arrivals")))
        .withColumn("growth_hot", col("n_arrivals") * 9 > col("n_base") * 2)
        .withColumn("drift",
          coalesce(col("arr_mean_d2") > col("base_mean_d2") * 1.5, lit(false)))
        .select(col("cell"), col("n_base"), col("n_arrivals"),
          col("base_mean_d2"), col("arr_mean_d2"), col("growth_hot"), col("drift"))
        .orderBy("cell")
    },
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |anchors AS (SELECT vec_id AS anchor_id, vd AS avd FROM v
       |            WHERE vec_id < $IvfCells AND vec_id % 10 <> 9),
       |dists AS (
       |  SELECT v.vec_id, a.anchor_id,
       |    ROUND(${dotSql("v.vd", "v.vd")} - 2.0 * ${dotSql("v.vd", "a.avd")}
       |      + ${dotSql("a.avd", "a.avd")}, 6) AS d2
       |  FROM v CROSS JOIN anchors a),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, anchor_id) AS rn
       |  FROM dists),
       |asg AS (SELECT vec_id, anchor_id AS cell, d2, vec_id % 10 = 9 AS arr
       |        FROM ranked WHERE rn = 1),
       |p AS (SELECT cell,
       |    CAST(SUM(CASE WHEN NOT arr THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
       |    CAST(SUM(CASE WHEN arr THEN 1 ELSE 0 END) AS BIGINT) AS n_arrivals,
       |    SUM(CASE WHEN NOT arr THEN CAST(d2 AS DECIMAL(20,6)) END) AS sb,
       |    SUM(CASE WHEN arr THEN CAST(d2 AS DECIMAL(20,6)) END) AS sa
       |  FROM asg GROUP BY 1),
       |m AS (SELECT cell, n_base, n_arrivals,
       |    CASE WHEN n_base > 0 THEN CAST(sb AS DOUBLE) / n_base END AS base_mean_d2,
       |    CASE WHEN n_arrivals > 0 THEN CAST(sa AS DOUBLE) / n_arrivals END AS arr_mean_d2
       |  FROM p)
       |SELECT cell, n_base, n_arrivals, base_mean_d2, arr_mean_d2,
       |  n_arrivals * 9 > n_base * 2 AS growth_hot,
       |  COALESCE(arr_mean_d2 > base_mean_d2 * 1.5, FALSE) AS drift
       |FROM m ORDER BY cell""".stripMargin)

  /** y16: INDEX REFRESH — the action y15's drift verdict calls for, with
    * the payoff measured: arrivals here are a coherent new content family
    * (one embedding-space label cluster — a new data source coming online,
    * the case coarse quantizers age worst on), and the panel compares the
    * STALE index (anchors seeded from base content only) against the
    * REFRESHED one (same anchors + the first two arrival exemplars
    * promoted to anchors — the cheap refresh that avoids a full refit).
    * Per arm: cells in use, occupancy concentration (max cell share), and
    * DECIMAL-exact mean assignment distance for base and arrival vectors
    * separately — the refresh must spread the hot cells AND pull the
    * arrival distance down without degrading the base fit. Everything is
    * seeded/argmin-deterministic, so BOTH arms replay bit-identically in
    * the oracle; y3d's Lloyd pipeline is the full-refit escalation when
    * the cheap refresh stops paying.
    *
    * Scale: two broadcast-argmin assignment passes (the corpus never
    * shuffles), per-cell combinable aggregates, final frames are
    * cells-sized. Exemplar promotion is a TakeOrdered(2) on the arrival
    * batch. */
  private val y16IndexRefresh = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val e = Tables.embeddings(s, d)
      val a0 = e.filter(col("label") =!= 7).orderBy("vec_id").limit(IvfCells)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      val ax = e.filter(col("label") === 7).orderBy("vec_id").limit(2)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      def arm(anchors: org.apache.spark.sql.DataFrame, name: String) = {
        val asg = Similarity.ivfAssign(e, anchors, "vec_id", "embedding",
            extraCols = Seq("label"))
          .withColumn("is_arr", col("label") === 7)
        val d2 = col("cell_d2").cast(DecimalType(20, 6))
        asg.groupBy("cell")
          .agg(count(lit(1)).as("nc"),
            sum(when(col("is_arr"), d2)).as("sa"),
            sum(when(col("is_arr"), 1L).otherwise(0L)).as("na"),
            sum(when(!col("is_arr"), d2)).as("sb"),
            sum(when(!col("is_arr"), 1L).otherwise(0L)).as("nb"))
          .agg(count(lit(1)).as("n_cells_used"),
            (max(col("nc")).cast(DoubleType) / sum(col("nc"))).as("max_share"),
            (sum(col("sb")).cast(DoubleType) / sum(col("nb"))).as("base_mean_d2"),
            (sum(col("sa")).cast(DoubleType) / sum(col("na"))).as("arr_mean_d2"))
          .select(lit(name).as("arm"), col("n_cells_used"), col("max_share"),
            col("base_mean_d2"), col("arr_mean_d2"))
      }
      arm(a0, "stale").unionByName(arm(a0.unionByName(ax), "refreshed"))
        .orderBy("arm")
    },
    s"""WITH v AS (SELECT vec_id, label, ${vdSql("embedding")} AS vd FROM embeddings),
       |a0 AS (SELECT vec_id AS anchor_id, vd AS avd FROM v
       |       WHERE label <> 7 ORDER BY vec_id LIMIT $IvfCells),
       |a1 AS (SELECT * FROM a0 UNION ALL
       |       SELECT vec_id, vd FROM (SELECT vec_id, vd FROM v
       |         WHERE label = 7 ORDER BY vec_id LIMIT 2) x),
       |d0 AS (SELECT v.vec_id, v.label = 7 AS is_arr, a.anchor_id,
       |    ROUND(${dotSql("v.vd", "v.vd")} - 2.0 * ${dotSql("v.vd", "a.avd")}
       |      + ${dotSql("a.avd", "a.avd")}, 6) AS d2
       |  FROM v CROSS JOIN a0 a),
       |d1 AS (SELECT v.vec_id, v.label = 7 AS is_arr, a.anchor_id,
       |    ROUND(${dotSql("v.vd", "v.vd")} - 2.0 * ${dotSql("v.vd", "a.avd")}
       |      + ${dotSql("a.avd", "a.avd")}, 6) AS d2
       |  FROM v CROSS JOIN a1 a),
       |g0 AS (SELECT vec_id, is_arr, anchor_id AS cell, d2 FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, anchor_id) rn
       |    FROM d0) z WHERE rn = 1),
       |g1 AS (SELECT vec_id, is_arr, anchor_id AS cell, d2 FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, anchor_id) rn
       |    FROM d1) z WHERE rn = 1),
       |c0 AS (SELECT cell, COUNT(*) AS nc,
       |    SUM(CASE WHEN is_arr THEN CAST(d2 AS DECIMAL(20,6)) END) AS sa,
       |    SUM(CASE WHEN is_arr THEN 1 ELSE 0 END) AS na,
       |    SUM(CASE WHEN NOT is_arr THEN CAST(d2 AS DECIMAL(20,6)) END) AS sb,
       |    SUM(CASE WHEN NOT is_arr THEN 1 ELSE 0 END) AS nb
       |  FROM g0 GROUP BY 1),
       |c1 AS (SELECT cell, COUNT(*) AS nc,
       |    SUM(CASE WHEN is_arr THEN CAST(d2 AS DECIMAL(20,6)) END) AS sa,
       |    SUM(CASE WHEN is_arr THEN 1 ELSE 0 END) AS na,
       |    SUM(CASE WHEN NOT is_arr THEN CAST(d2 AS DECIMAL(20,6)) END) AS sb,
       |    SUM(CASE WHEN NOT is_arr THEN 1 ELSE 0 END) AS nb
       |  FROM g1 GROUP BY 1),
       |p AS (
       |  SELECT 'stale' AS arm, CAST(COUNT(*) AS BIGINT) AS n_cells_used,
       |    CAST(MAX(nc) AS DOUBLE) / CAST(SUM(nc) AS BIGINT) AS max_share,
       |    CAST(SUM(sb) AS DOUBLE) / CAST(SUM(nb) AS BIGINT) AS base_mean_d2,
       |    CAST(SUM(sa) AS DOUBLE) / CAST(SUM(na) AS BIGINT) AS arr_mean_d2
       |  FROM c0
       |  UNION ALL
       |  SELECT 'refreshed', CAST(COUNT(*) AS BIGINT),
       |    CAST(MAX(nc) AS DOUBLE) / CAST(SUM(nc) AS BIGINT),
       |    CAST(SUM(sb) AS DOUBLE) / CAST(SUM(nb) AS BIGINT),
       |    CAST(SUM(sa) AS DOUBLE) / CAST(SUM(na) AS BIGINT)
       |  FROM c1)
       |SELECT arm, n_cells_used, max_share, base_mean_d2, arr_mean_d2
       |FROM p ORDER BY arm""".stripMargin)

  /** y17: REFIT-PAYOFF PANEL — the measured action crossover y15's drift
    * trigger calls for. y16 showed the cheap refresh (anchor promotion);
    * this panel runs all THREE maintenance arms on the same aged index and
    * corpus (base + the label-7 arrival family) so the trigger maps to a
    * measured decision, not a doc note:
    *   stale      — the base-only seeded anchors, untouched;
    *   refreshed  — stale + the first two arrival exemplars promoted
    *                (y16's cheap arm: no assignment pass over the corpus
    *                beyond serving);
    *   refit      — two full Lloyd rounds from the stale anchors over
    *                base + arrivals (y3b/y3d's escalation machinery).
    * Per arm: cells in use, occupancy concentration (max cell share), and
    * DECIMAL-exact mean assignment d² for base and arrival vectors
    * separately — the panel an index-maintenance job reads to decide
    * whether the drift flag is worth a corpus-wide refit.
    *
    * Cross-engine exactness of the REFIT arm (the new part — y3b had to
    * summarize its loop as contract booleans because double-avg centroids
    * drift across engines): each Lloyd round here is
    * [[Similarity.lloydRefineExact]] — per-(cell, pos) means as exact
    * DECIMAL(20,7) sums (double→decimal snapshot, engine-stable) divided
    * in ONE correctly-rounded IEEE op, cast back to float exactly like
    * lloydRefine — so the refined centroids, hence every assignment and
    * the whole panel, replay bit-identically in the oracle's unrolled
    * two-round CTE chain.
    *
    * Scale: three broadcast-argmin assignment passes + two refine rounds
    * — the corpus never shuffles on the assignment side; each refine is
    * one (cell, pos) aggregate of bounded cardinality (cells × 64) and a
    * cells-sized reassembly; panel aggregates are map-side combinable.
    * At 100 TB the three arms share the same scan and the refit rounds
    * are the y3d store-write lifecycle run offline. */
  private val y17RefitPayoff = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val e = Tables.embeddings(s, d)
      val a0 = e.filter(col("label") =!= 7).orderBy("vec_id").limit(IvfCells)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      val ax = e.filter(col("label") === 7).orderBy("vec_id").limit(2)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      var refit = a0
      for (_ <- 1 to 2)
        refit = Similarity.lloydRefineExact(
          Similarity.ivfAssign(e, refit, "vec_id", "embedding"),
          "embedding", refit)
      def arm(anchors: org.apache.spark.sql.DataFrame, name: String) = {
        val asg = Similarity.ivfAssign(e, anchors, "vec_id", "embedding",
            extraCols = Seq("label"))
          .withColumn("is_arr", col("label") === 7)
        val d2 = col("cell_d2").cast(DecimalType(20, 6))
        asg.groupBy("cell")
          .agg(count(lit(1)).as("nc"),
            sum(when(col("is_arr"), d2)).as("sa"),
            sum(when(col("is_arr"), 1L).otherwise(0L)).as("na"),
            sum(when(!col("is_arr"), d2)).as("sb"),
            sum(when(!col("is_arr"), 1L).otherwise(0L)).as("nb"))
          .agg(count(lit(1)).as("n_cells_used"),
            (max(col("nc")).cast(DoubleType) / sum(col("nc"))).as("max_share"),
            (sum(col("sb")).cast(DoubleType) / sum(col("nb"))).as("base_mean_d2"),
            (sum(col("sa")).cast(DoubleType) / sum(col("na"))).as("arr_mean_d2"))
          .select(lit(name).as("arm"), col("n_cells_used"), col("max_share"),
            col("base_mean_d2"), col("arr_mean_d2"))
      }
      arm(a0, "stale")
        .unionByName(arm(a0.unionByName(ax), "refreshed"))
        .unionByName(arm(refit, "refit"))
        .orderBy("arm")
    },
    {
      def roundCtes(r: Int, prev: String): String =
        s"""rd$r AS MATERIALIZED (SELECT v.vec_id, a.anchor_id,
           |    ROUND(${dotSql("v.vd", "v.vd")} - 2.0 * ${dotSql("v.vd", "a.avd")}
           |      + ${dotSql("a.avd", "a.avd")}, 6) AS d2
           |  FROM v CROSS JOIN $prev a),
           |rg$r AS (SELECT vec_id, anchor_id AS cell FROM (
           |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, anchor_id) rn
           |    FROM rd$r) z WHERE rn = 1),
           |rm$r AS (SELECT g.cell, p.pos,
           |    CAST(SUM(CAST(v.vd[p.pos] AS DECIMAL(20,7))) AS DOUBLE) / COUNT(*) AS m
           |  FROM rg$r g JOIN v ON g.vec_id = v.vec_id
           |  CROSS JOIN generate_series(1, 64) p(pos)
           |  GROUP BY 1, 2),
           |rc$r AS (SELECT cell AS anchor_id,
           |    list_transform(list(m ORDER BY pos), x -> CAST(CAST(x AS FLOAT) AS DOUBLE)) AS avd
           |  FROM rm$r GROUP BY cell),
           |ra$r AS MATERIALIZED (SELECT p.anchor_id, COALESCE(c.avd, p.avd) AS avd
           |  FROM $prev p LEFT JOIN rc$r c ON p.anchor_id = c.anchor_id)""".stripMargin
      def armCtes(tag: String, anchors: String): String =
        s"""d$tag AS (SELECT v.vec_id, v.label = 7 AS is_arr, a.anchor_id,
           |    ROUND(${dotSql("v.vd", "v.vd")} - 2.0 * ${dotSql("v.vd", "a.avd")}
           |      + ${dotSql("a.avd", "a.avd")}, 6) AS d2
           |  FROM v CROSS JOIN $anchors a),
           |g$tag AS (SELECT vec_id, is_arr, anchor_id AS cell, d2 FROM (
           |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, anchor_id) rn
           |    FROM d$tag) z WHERE rn = 1),
           |c$tag AS (SELECT cell, COUNT(*) AS nc,
           |    SUM(CASE WHEN is_arr THEN CAST(d2 AS DECIMAL(20,6)) END) AS sa,
           |    SUM(CASE WHEN is_arr THEN 1 ELSE 0 END) AS na,
           |    SUM(CASE WHEN NOT is_arr THEN CAST(d2 AS DECIMAL(20,6)) END) AS sb,
           |    SUM(CASE WHEN NOT is_arr THEN 1 ELSE 0 END) AS nb
           |  FROM g$tag GROUP BY 1)""".stripMargin
      def armSelect(name: String, tag: String): String =
        s"""SELECT '$name' AS arm, CAST(COUNT(*) AS BIGINT) AS n_cells_used,
           |    CAST(MAX(nc) AS DOUBLE) / CAST(SUM(nc) AS BIGINT) AS max_share,
           |    CAST(SUM(sb) AS DOUBLE) / CAST(SUM(nb) AS BIGINT) AS base_mean_d2,
           |    CAST(SUM(sa) AS DOUBLE) / CAST(SUM(na) AS BIGINT) AS arr_mean_d2
           |  FROM c$tag""".stripMargin
      s"""WITH v AS MATERIALIZED (
         |  SELECT vec_id, label, ${vdSql("embedding")} AS vd FROM embeddings),
         |a0 AS MATERIALIZED (SELECT vec_id AS anchor_id, vd AS avd FROM v
         |       WHERE label <> 7 ORDER BY vec_id LIMIT $IvfCells),
         |a1 AS (SELECT * FROM a0 UNION ALL
         |       SELECT vec_id, vd FROM (SELECT vec_id, vd FROM v
         |         WHERE label = 7 ORDER BY vec_id LIMIT 2) x),
         |${roundCtes(1, "a0")},
         |${roundCtes(2, "ra1")},
         |${armCtes("s", "a0")},
         |${armCtes("f", "a1")},
         |${armCtes("r", "ra2")},
         |p AS (
         |  ${armSelect("stale", "s")}
         |  UNION ALL
         |  ${armSelect("refreshed", "f")}
         |  UNION ALL
         |  ${armSelect("refit", "r")})
         |SELECT arm, n_cells_used, max_share, base_mean_d2, arr_mean_d2
         |FROM p ORDER BY arm""".stripMargin
    })

  /** One stored IVF assignment table per (session, input dir), built from
    * the BASE vectors and then INCREMENTALLY APPENDED with the arrival
    * batch — the ANN store's E2 lifecycle ([[y18IndexAppend]]): the base
    * index lands cell-partitioned, the arrivals are assigned against the
    * SAME anchors (broadcast argmin — the base table is never re-read or
    * re-assigned) and appended as new files into their cell partition
    * directories. Cache + shutdown-hook discipline as y3d. */
  private val y18Built = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()

  private def y18Anchors(e: org.apache.spark.sql.DataFrame) =
    e.filter(col("vec_id") >= 1 && col("vec_id") <= IvfCells)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))

  private def y18StoredIndex(s: SparkSession, d: String) =
    y18Built.computeIfAbsent(s"${s.sparkContext.applicationId}:$d", _ => {
      val e = Tables.embeddings(s, d)
      val anchors = y18Anchors(e)
      def asg(pred: org.apache.spark.sql.Column) =
        Similarity.ivfAssign(e.filter(pred), anchors, "vec_id", "embedding")
          .select(col("vec_id"), col("cell"), col("cell_d2"))
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
        s"ivf_index_${s.sparkContext.applicationId}_${Integer.toHexString(d.hashCode)}"
      val store = graft.sources.Store(s, path, "cell")
      store.destroy()
      store.append(asg(col("vec_id") % 10 =!= 0)) // the base build
      store.append(asg(col("vec_id") % 10 === 0)) // the daily increment
      sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
      readOrEmpty(store, asg(lit(false)))
    })

  /** y18: INDEX APPEND — the ANN store's E2, x39/x41's proof style on the
    * vector side: y15/y16/y17 MEASURE the aging index, this query LANDS
    * the daily increment. The base assignment table is persisted
    * cell-partitioned ([[y18StoredIndex]]); the arrival batch is assigned
    * against the same anchors and APPENDED — new files into existing cell
    * directories, the base rows never re-read, re-assigned, or rewritten
    * (at 100 TB the increment costs O(batch), and cell partitioning keeps
    * serve-side pruning intact). The declared output is computed entirely
    * FROM THE RE-READ STORE — per cell: total vectors, base/arrival
    * split, DECIMAL-exact mean d², and an id-lattice checksum — while the
    * oracle recomputes the FULL corpus assignment from scratch, so hash
    * equality proves build + append ≡ full rebuild, content included. */
  private val y18IndexAppend = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
      val e = Tables.embeddings(s, d)
      val index =
        if (planOnly)
          Similarity.ivfAssign(e, y18Anchors(e), "vec_id", "embedding")
            .select(col("vec_id"), col("cell"), col("cell_d2"))
        else y18StoredIndex(s, d)
      val M = lit(2147483647L)
      index.groupBy("cell").agg(
          count(lit(1)).as("n_vecs"),
          sum(when(col("vec_id") % 10 =!= 0, 1L).otherwise(0L)).as("n_base"),
          sum(when(col("vec_id") % 10 === 0, 1L).otherwise(0L)).as("n_arrivals"),
          (sum(col("cell_d2").cast(DecimalType(20, 6))).cast(DoubleType)
            / count(lit(1))).as("mean_d2"),
          pmod(sum((col("vec_id") % M) * ((col("vec_id") + 7) % M) % M), M)
            .cast(LongType).as("member_checksum"))
        .orderBy("cell")
    },
    s"""WITH ev AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |eanch AS (SELECT vec_id AS anchor_id, vd AS avd FROM ev
       |          WHERE vec_id BETWEEN 1 AND $IvfCells),
       |edist AS (SELECT v.vec_id, a.anchor_id,
       |    ROUND(${dotSql("v.vd", "v.vd")} - 2.0 * ${dotSql("v.vd", "a.avd")}
       |      + ${dotSql("a.avd", "a.avd")}, 6) AS d2
       |  FROM ev v CROSS JOIN eanch a),
       |easg AS (SELECT vec_id, anchor_id AS cell, d2
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY d2, anchor_id) AS rn FROM edist) z WHERE rn = 1)
       |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |  CAST(SUM(CASE WHEN vec_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
       |  CAST(SUM(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_arrivals,
       |  CAST(SUM(CAST(d2 AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS mean_d2,
       |  CAST(SUM((vec_id % 2147483647) * ((vec_id + 7) % 2147483647) % 2147483647)
       |    % 2147483647 AS BIGINT) AS member_checksum
       |FROM easg GROUP BY 1 ORDER BY 1""".stripMargin)

  /** y19: TRIPLET MINING — the pass that turns a labeled embedding corpus
    * into contrastive training data: per anchor, the nearest SAME-label
    * candidate (positive), the nearest DIFFERENT-label candidate (the
    * hard negative), and the margin between them. Negative-margin anchors
    * are exactly the triplets a metric-learning fine-tune needs first
    * (the model currently ranks a wrong-label vector above the right
    * one); null columns are mining-coverage gaps the probe knobs answer.
    * Candidates come from the y2b machinery — hyperplane buckets +
    * Hamming-1 multi-probe, a bucket equi-join that never materializes
    * the n² pair space — and the label split runs on the bucket-reduced
    * rows ([[graft.operators.Similarity.tripletMine]]). */
  private val y19TripletMine = Q(
    (s, d) => Similarity.tripletMine(
        Tables.embeddings(s, d), id => id % 10 === 0, "vec_id", "embedding",
        "label", probeRadius = 1)
      .orderBy("q_id"),
    s"""WITH v AS (SELECT vec_id, label, ${vdSql("embedding")} AS vd FROM embeddings),
       |n AS (SELECT vec_id, label, vd, ${nrmSql("vd")} AS nrm,
       |    CAST($bucketSql AS BIGINT) AS bucket FROM v),
       |scored AS (
       |  SELECT q.vec_id AS q_id, q.label AS q_label,
       |    c.vec_id AS c_id, c.label AS c_label,
       |    ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) AS cosine
       |  FROM n q JOIN n c
       |    ON bit_count(xor(q.bucket, c.bucket)) <= 1 AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id % 10 = 0),
       |pos AS (SELECT q_id, c_id AS pos_id, cosine AS pos_cosine FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
       |    FROM scored WHERE q_label = c_label) p WHERE rn = 1),
       |neg AS (SELECT q_id, c_id AS neg_id, c_label AS neg_label,
       |    cosine AS neg_cosine FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
       |    FROM scored WHERE q_label <> c_label) g WHERE rn = 1),
       |a AS (SELECT vec_id AS q_id, label AS q_label FROM embeddings
       |      WHERE vec_id % 10 = 0)
       |SELECT a.q_id, a.q_label, pos.pos_id, pos.pos_cosine,
       |  neg.neg_id, neg.neg_label, neg.neg_cosine,
       |  pos.pos_cosine - neg.neg_cosine AS margin
       |FROM a LEFT JOIN pos ON pos.q_id = a.q_id
       |LEFT JOIN neg ON neg.q_id = a.q_id
       |ORDER BY a.q_id""".stripMargin)

  private val x47Built = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()

  /** One day's canonical-map store round-trip for x47: land the map
    * through a tracked, hash-partitioned Store and hand back the re-read
    * frame — the next day's resolution must consume the ARTIFACT, not the
    * lineage that built it. */
  private def x47Stored(s: SparkSession, d: String, day: String,
                        built: org.apache.spark.sql.DataFrame) =
    x47Built.computeIfAbsent(s"${s.sparkContext.applicationId}:$d:$day", _ => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
        s"replaymap_${day}_${s.sparkContext.applicationId}_" +
        Integer.toHexString(d.hashCode)
      val store = graft.sources.Store(s, path, "part")
      store.destroy()
      val withPart = built.select("doc_id", "cluster_id")
        .withColumn("part", pmod(hash(col("doc_id")), lit(8)))
      store.append(withPart)
      sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
      val back = readOrEmpty(store, withPart)
      val M = lit(2147483647L)
      store.trackFrom(back, (col("doc_id") % M) * (col("cluster_id") % M) % M)
      back.drop("part")
    })

  /** x47: TWO-WAVE INGEST REPLAY — the proof that the incremental arrival
    * loop COMPOSES: x39/x40 show one stored-artifact resolution step lands
    * exactly where a full recompute would; a production corpus runs that
    * step every day against the map the PREVIOUS step wrote, and any
    * incremental drift would compound silently. Here wave 1 (doc_id%10=0)
    * resolves against the stored base map (docs with doc_id%5≠0), the
    * merged day-1 map goes through its own Store round-trip, wave 2
    * (doc_id%10=5) resolves against THAT artifact — and the oracle
    * recomputes both days' cluster maps from scratch (two recursive-CC
    * replays: the day-1 view over base∪wave1, the final view over the
    * whole corpus). Hash equality on the per-wave outcome panel AND the
    * final-map checksum proves iterate(iterate(base)) ≡ from-scratch,
    * ids included. Per-day outcomes are graded against that day's view
    * (a day-1 singleton that wave 2 later joins stays a day-1 singleton —
    * the dashboard is an append-only log, not a rewritten history).
    *
    * Scale: each day pays O(batch + touched) exactly like x39 — the
    * against-join candidates are bucket equi-joins, untouched clusters
    * are never relabeled, and the day boundary is a store write (the
    * durable barrier the capstones standardized on). */
  private val x47IngestReplay = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val docs = Tables.documents(s, d)
      // the signature relation feeds SIX consumers (one per candidate
      // generator per day) — pin it so the corpus pays one shingle pass
      // (plan-only constructions stay action-free for the audit sweeps)
      val sigRaw = minhashSig(s, d)
      val sig = if (planOnly) sigRaw else graft.Housekeeping.pin(s)(sigRaw).df
      val sigBase = sig.filter(col("doc_id") % 5 =!= 0)
      val labels0 = Dedup.connectedComponents(
        Dedup.lshCandidates(sigBase, "doc_id", 8),
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id")
      val sigW1 = sig.filter(col("doc_id") % 10 === 0)
      val pairs1 = Dedup.lshCandidatesAgainst(sigW1, sigBase, "doc_id", 8)
        .select(col("doc_new").as("doc_a"), col("doc_base").as("doc_b"))
        .union(Dedup.lshCandidates(sigW1, "doc_id", 8))
      val labels1Built = Dedup.incrementalComponents(labels0,
        docs.filter(col("doc_id") % 10 === 0).select("doc_id"), pairs1, "doc_id")
      val labels1 =
        if (planOnly) labels1Built else x47Stored(s, d, "d1", labels1Built)
      val sigPrior = sig.filter(col("doc_id") % 10 =!= 5)
      val sigW2 = sig.filter(col("doc_id") % 10 === 5)
      val pairs2 = Dedup.lshCandidatesAgainst(sigW2, sigPrior, "doc_id", 8)
        .select(col("doc_new").as("doc_a"), col("doc_base").as("doc_b"))
        .union(Dedup.lshCandidates(sigW2, "doc_id", 8))
      val labels2Built = Dedup.incrementalComponents(labels1,
        docs.filter(col("doc_id") % 10 === 5).select("doc_id"), pairs2, "doc_id")
      val labels2 =
        if (planOnly) labels2Built else x47Stored(s, d, "d2", labels2Built)
      def outc(labels: org.apache.spark.sql.DataFrame,
               arrCond: Column, priorCond: Column) = {
        val cl = labels.groupBy("cluster_id").agg(
          sum(when(priorCond, 1L).otherwise(0L)).as("n_prior"),
          count(lit(1)).as("n_all"))
        labels.filter(arrCond).join(cl, Seq("cluster_id"))
          .select(col("doc_id"),
            when(col("n_prior") > 0, "joined_existing")
              .when(col("n_all") >= 2, "new_cluster")
              .otherwise("singleton").as("outcome"))
      }
      val o1 = outc(labels1, col("doc_id") % 10 === 0, col("doc_id") % 5 =!= 0)
        .withColumn("wave", lit(1))
      val o2 = outc(labels2, col("doc_id") % 10 === 5, col("doc_id") % 10 =!= 5)
        .withColumn("wave", lit(2))
      val M = lit(2147483647L)
      val fin = labels2.agg(
        count(lit(1)).as("n_docs_mapped"),
        countDistinct(col("cluster_id")).as("n_clusters_final"),
        pmod(sum((col("doc_id") % M) * (col("cluster_id") % M) % M), M)
          .cast(LongType).as("map_checksum"))
      o1.unionByName(o2)
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .groupBy("wave", "source").agg(
          count(lit(1)).as("n_arrivals"),
          sum(when(col("outcome") === "joined_existing", 1L).otherwise(0L))
            .as("n_merged"),
          sum(when(col("outcome") === "new_cluster", 1L).otherwise(0L))
            .as("n_new_cluster"),
          sum(when(col("outcome") === "singleton", 1L).otherwise(0L))
            .as("n_singleton"))
        .crossJoin(broadcast(fin))
        .orderBy("wave", "source")
    },
    s"""WITH RECURSIVE $minhashCtes,
       |bands AS ($bandsSql),
       |p1 AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |  WHERE a.doc_id % 10 <> 5 AND b.doc_id % 10 <> 5),
       |e1 AS (SELECT doc_a AS src, doc_b AS dst FROM p1
       |       UNION ALL SELECT doc_b, doc_a FROM p1),
       |r1(node, r) AS (SELECT src, src FROM e1
       |  UNION SELECT e.dst, r1.r FROM e1 e JOIN r1 ON e.src = r1.node),
       |c1 AS (SELECT node, min(r) AS cid FROM r1 GROUP BY 1),
       |l1 AS (SELECT d.doc_id, COALESCE(c1.cid, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN c1 ON c1.node = d.doc_id
       |  WHERE d.doc_id % 10 <> 5),
       |p2 AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |e2 AS (SELECT doc_a AS src, doc_b AS dst FROM p2
       |       UNION ALL SELECT doc_b, doc_a FROM p2),
       |r2(node, r) AS (SELECT src, src FROM e2
       |  UNION SELECT e.dst, r2.r FROM e2 e JOIN r2 ON e.src = r2.node),
       |c2 AS (SELECT node, min(r) AS cid FROM r2 GROUP BY 1),
       |l2 AS (SELECT d.doc_id, COALESCE(c2.cid, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN c2 ON c2.node = d.doc_id),
       |cl1 AS (SELECT cluster_id,
       |    SUM(CASE WHEN doc_id % 5 <> 0 THEN 1 ELSE 0 END) AS n_prior,
       |    COUNT(*) AS n_all FROM l1 GROUP BY 1),
       |o1 AS (SELECT l.doc_id, 1 AS wave,
       |    CASE WHEN c.n_prior > 0 THEN 'joined_existing'
       |         WHEN c.n_all >= 2 THEN 'new_cluster'
       |         ELSE 'singleton' END AS outcome
       |  FROM l1 l JOIN cl1 c USING (cluster_id) WHERE l.doc_id % 10 = 0),
       |cl2 AS (SELECT cluster_id,
       |    SUM(CASE WHEN doc_id % 10 <> 5 THEN 1 ELSE 0 END) AS n_prior,
       |    COUNT(*) AS n_all FROM l2 GROUP BY 1),
       |o2 AS (SELECT l.doc_id, 2 AS wave,
       |    CASE WHEN c.n_prior > 0 THEN 'joined_existing'
       |         WHEN c.n_all >= 2 THEN 'new_cluster'
       |         ELSE 'singleton' END AS outcome
       |  FROM l2 l JOIN cl2 c USING (cluster_id) WHERE l.doc_id % 10 = 5),
       |fin AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_mapped,
       |    CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters_final,
       |    CAST(SUM((doc_id % 2147483647) * (cluster_id % 2147483647)
       |      % 2147483647) % 2147483647 AS BIGINT) AS map_checksum
       |  FROM l2)
       |SELECT o.wave, d.source, CAST(COUNT(*) AS BIGINT) AS n_arrivals,
       |  CAST(SUM(CASE WHEN o.outcome = 'joined_existing' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_merged,
       |  CAST(SUM(CASE WHEN o.outcome = 'new_cluster' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_new_cluster,
       |  CAST(SUM(CASE WHEN o.outcome = 'singleton' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_singleton,
       |  fin.n_docs_mapped, fin.n_clusters_final, fin.map_checksum
       |FROM (SELECT * FROM o1 UNION ALL SELECT * FROM o2) o
       |JOIN documents d USING (doc_id) CROSS JOIN fin
       |GROUP BY o.wave, d.source, fin.n_docs_mapped, fin.n_clusters_final,
       |  fin.map_checksum
       |ORDER BY o.wave, d.source""".stripMargin)

  /** z48: positional POSTINGS index + phrase search — both halves of the
    * exact-phrase lifecycle, each in its scale-correct shape:
    *
    * MINE: candidate trigrams slide IN-SCAN (a `transform` over the word
    * array — the spanFingerprints shape: no join, no shuffle of raw
    * positions, one corpus pass into a map-side-combinable phrase
    * histogram), and the top-3 is a TakeOrdered, never a global sort.
    * An earlier form mined via three-way postings self-joins — 5.9×
    * slower at the 10× soak for identical output; sliding beats joining
    * whenever every position is a candidate.
    *
    * SEARCH: the mined phrases replay through the positional inverted
    * index (token, doc, pos) the way a search layer serves a KNOWN
    * phrase: postings are semi-joined down to the phrases' tokens FIRST
    * (at 100 TB: the token-keyed index makes this the posting lists of 9
    * tokens, never a corpus scan), then a k-word phrase is k−1 equi-joins
    * on (doc, pos+offset, expected-token) over that filtered sliver —
    * AQE broadcasts every stage. The declared output reports per phrase
    * its occurrence count, distinct containing docs, and id span, with
    * the search arm recomputing occurrences positionally — so the oracle
    * gates that index-serving equals in-scan mining. */
  private val z48PhrasePostings = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val tri = docs.filter(size(col("w")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
          .as("phrase"))
      val top = tri.groupBy("phrase").agg(count(lit(1)).as("n_mined"))
        .orderBy(col("n_mined").desc, col("phrase")).limit(3)
      val wantRaw = top.select(col("phrase"), split(col("phrase"), " ").as("pw"))
        .select(col("phrase"), col("pw").getItem(0).as("w0"),
          col("pw").getItem(1).as("w1"), col("pw").getItem(2).as("w2"))
      // the mined 3-row phrase table and the token-filtered postings are
      // each consumed by several search branches — pin both so the corpus
      // pays ONE mining pass and ONE explode pass, not one per branch
      // (plan-only constructions must stay action-free, so the sweeps
      // audit the unpinned plan shape)
      val want = if (planOnly) wantRaw else graft.Housekeeping.pin(s)(wantRaw).df
      val tokens = want.select(explode(array(col("w0"), col("w1"), col("w2")))
        .as("token")).distinct()
      val postRaw = docs
        .select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "token")))
        .join(broadcast(tokens), Seq("token"), "left_semi")
      val post = if (planOnly) postRaw else graft.Housekeeping.pin(s)(postRaw).df
      val starts = post.join(broadcast(want), col("token") === col("w0"))
        .select(col("phrase"), col("doc_id").as("d"), col("pos").as("p"),
          col("w1"), col("w2"))
      val p1 = post.select(col("doc_id").as("d1"), col("pos").as("p1"),
        col("token").as("t1"))
      val p2 = post.select(col("doc_id").as("d2"), col("pos").as("p2"),
        col("token").as("t2"))
      val occ = starts
        .join(p1, col("d1") === col("d") && col("p1") === col("p") + 1
          && col("t1") === col("w1"))
        .join(p2, col("d2") === col("d") && col("p2") === col("p") + 2
          && col("t2") === col("w2"))
        .select(col("phrase"), col("d").as("doc_id"))
      occ.groupBy("phrase")
        .agg(count(lit(1)).as("n_occ"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("n_occ").desc, col("phrase"))
    },
    """WITH g AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |ix AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS pos FROM g),
      |post AS (SELECT doc_id, pos, ws[pos] AS token FROM ix),
      |tri AS (
      |  SELECT a.doc_id, a.token || ' ' || b.token || ' ' || c.token AS phrase
      |  FROM post a
      |  JOIN post b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      |  JOIN post c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
      |per AS (SELECT phrase, COUNT(*) AS n_occ,
      |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |    MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |  FROM tri GROUP BY 1),
      |top AS (SELECT phrase FROM per ORDER BY n_occ DESC, phrase LIMIT 3)
      |SELECT p.phrase, p.n_occ, p.n_docs, p.first_doc, p.last_doc
      |FROM per p JOIN top t ON t.phrase = p.phrase
      |ORDER BY p.n_occ DESC, p.phrase""".stripMargin)

  // ---- text analysis ----

  /** Corpus-tuned language markers (the production default,
    * TextAnalysis.langMarkers, uses real stopwords; the test corpus draws
    * from a 31-word synthetic vocabulary, so markers come from it to
    * exercise real argmax variation + the preference-order tiebreak). */
  private val testMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "de" -> Seq("hash", "merge", "batch"),
    "fr" -> Seq("scan", "filter", "sort"),
    "es" -> Seq("join", "group", "order"))

  /** z33: curation filter audit — the "why was this document dropped"
    * trail every production corpus build keeps (dropping silently makes
    * recall bugs invisible): each doc gets the FIRST failing gate of a
    * fixed policy ladder — too_short (< 20 words), pii (email/phone
    * pattern), repetitive (> 50% repeated 3-grams), lang_mismatch
    * (predicted ≠ labeled language) — or 'kept'. The language and PII
    * signals are in-scan codegen'd expressions (z1's scores, z12's
    * patterns); the repetition signal is deliberately RELATIONAL (explode
    * shingles → per-doc aggregate → unhinted doc-keyed join back) rather
    * than an in-scan HOF: project-collapse inlines a HOF once per
    * reference and higher-order functions evaluate interpreted, which
    * measured 56 s at the 10× soak vs ~8 s relational — the same lesson
    * as x23's featurizer. The ratio threshold compares a single IEEE
    * division of exact ints — bit-identical cross-engine, so the gate
    * decision can never straddle engines. */
  private val z33FilterAudit = {
    val scoreSql = testMarkers.map { case (l, ms) =>
      val terms = ms.map(m =>
        s"CAST((length(pt) - length(replace(pt, ' $m ', ''))) / ${m.length + 2} AS INT)")
        .mkString(" + ")
      s"$terms AS s_$l"
    }.mkString(",\n    ")
    val best = s"GREATEST(${testMarkers.map { case (l, _) => s"s_$l" }.mkString(", ")})"
    val predSql = testMarkers.map { case (l, _) =>
      s"WHEN s_$l = best AND s_$l > 0 THEN '$l'"
    }.mkString(" ")
    Q(
      (s, d) => {
        val padded = concat(lit(" "), col("text"), lit(" "))
        val scores = testMarkers.map { case (l, ms) => l -> TextAnalysis.langScore(padded, ms) }
        val docs = Tables.documents(s, d)
        val shingled = docs
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 3)
          .select(col("doc_id"), explode(TextAnalysis.shinglesExpr("ws", 3)).as("sh"))
        val dr = shingled.groupBy("doc_id")
          .agg(((count(lit(1)) - countDistinct(col("sh"))).cast("double")
            / count(lit(1))).as("__dup"))
        // every signal is an UNCONDITIONAL projection column computed below
        // the join's exchange: inside a CaseWhen branch Spark disables
        // common-subexpression elimination (branches evaluate lazily), so
        // embedding langPredict in the when-ladder re-evaluated its score
        // subtrees ~5x per row — 29 s vs 8 s for the same signals at the
        // 10x soak. The exchange materializes the signal columns, so the
        // ladder above it compares plain attributes.
        val sig = docs.select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("__nw"),
          (col("text").rlike(TextAnalysis.EmailPattern)
            || col("text").rlike(TextAnalysis.PhonePattern)).as("__pii"),
          TextAnalysis.langPredict(scores).as("__pred"))
        sig.join(dr, Seq("doc_id"), "left")
          .withColumn("reason",
            when(col("__nw") < 20, "too_short")
              .when(col("__pii"), "pii")
              .when(coalesce(col("__dup"), lit(0.0)) > 0.5, "repetitive")
              .when(col("__pred") =!= col("lang"), "lang_mismatch")
              .otherwise("kept"))
          .select("doc_id", "reason")
          .orderBy("doc_id")
      },
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |g AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM ws)),
         |dr AS (SELECT doc_id,
         |    CAST(COUNT(*) - COUNT(DISTINCT s) AS DOUBLE) / COUNT(*) AS dup_ratio
         |  FROM g GROUP BY 1),
         |sc AS (SELECT doc_id, lang, text, len(string_split(text, ' ')) AS nw,
         |    $scoreSql
         |  FROM (SELECT doc_id, lang, text, ' ' || text || ' ' AS pt FROM documents)),
         |pred AS (SELECT doc_id, lang, text, nw,
         |    CASE $predSql ELSE 'und' END AS pred_lang
         |  FROM (SELECT *, $best AS best FROM sc))
         |SELECT p.doc_id,
         |  CASE WHEN nw < 20 THEN 'too_short'
         |       WHEN regexp_matches(text, '${TextAnalysis.EmailPattern}')
         |         OR regexp_matches(text, '${TextAnalysis.PhonePattern}') THEN 'pii'
         |       WHEN coalesce(d.dup_ratio, 0) > 0.5 THEN 'repetitive'
         |       WHEN pred_lang <> lang THEN 'lang_mismatch'
         |       ELSE 'kept' END AS reason
         |FROM pred p LEFT JOIN dr d USING (doc_id) ORDER BY doc_id""".stripMargin)
  }

  /** Language-ID confusion matrix: labeled lang × predicted lang counts. */
  private val z1LangId = {
    val scoreSql = testMarkers.map { case (l, ms) =>
      val terms = ms.map(m =>
        s"CAST((length(pt) - length(replace(pt, ' $m ', ''))) / ${m.length + 2} AS INT)")
        .mkString(" + ")
      s"$terms AS s_$l"
    }.mkString(",\n    ")
    val best = s"GREATEST(${testMarkers.map { case (l, _) => s"s_$l" }.mkString(", ")})"
    val predSql = testMarkers.map { case (l, _) =>
      s"WHEN s_$l = best AND s_$l > 0 THEN '$l'"
    }.mkString(" ")
    Q(
      (s, d) => {
        val padded = concat(lit(" "), col("text"), lit(" "))
        val scores = testMarkers.map { case (l, ms) => l -> TextAnalysis.langScore(padded, ms) }
        Tables.documents(s, d)
          .withColumn("pred_lang", TextAnalysis.langPredict(scores))
          .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n_docs"))
          .orderBy("lang", "pred_lang")
      },
      s"""WITH scored AS (SELECT lang,
         |    $scoreSql
         |  FROM (SELECT lang, ' ' || text || ' ' AS pt FROM documents)),
         |pred AS (SELECT lang,
         |    CASE $predSql ELSE 'und' END AS pred_lang
         |  FROM (SELECT *, $best AS best FROM scored))
         |SELECT lang, pred_lang, count(*) AS n_docs
         |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** z34: code-switching detection — z1's language ID applied per CHUNK
    * (z8's 40-token segmenter) instead of per document, then folded back
    * to a per-doc mixture report (chunk count, distinct predicted
    * languages, majority language + its share). Document-level lang ID
    * silently mislabels mixed-language pages (forum quotes, boilerplate
    * headers, bilingual docs) — the per-span vote is how fasttext-based
    * production pipelines segment them. Scale shape: chunk scoring is
    * in-scan codegen (markers over each slice), the (doc, lang) counts
    * are map-side combinable, and the majority pick is top1PerGroup's
    * min-struct aggregate — no whole-corpus window, nothing
    * per-document quadratic. maj_share is one BIGINT/BIGINT division —
    * bit-identical cross-engine. */
  private val z34CodeSwitch = {
    val scoreSql = testMarkers.map { case (l, ms) =>
      val terms = ms.map(m =>
        s"CAST((length(pt) - length(replace(pt, ' $m ', ''))) / ${m.length + 2} AS INT)")
        .mkString(" + ")
      s"$terms AS s_$l"
    }.mkString(",\n    ")
    val best = s"GREATEST(${testMarkers.map { case (l, _) => s"s_$l" }.mkString(", ")})"
    val predSql = testMarkers.map { case (l, _) =>
      s"WHEN s_$l = best AND s_$l > 0 THEN '$l'"
    }.mkString(" ")
    Q(
      (s, d) => {
        val chunks = TextAnalysis.chunkWords(Tables.documents(s, d), "doc_id", "text", 40)
        val padded = concat(lit(" "), col("chunk_text"), lit(" "))
        val scores = testMarkers.map { case (l, ms) => l -> TextAnalysis.langScore(padded, ms) }
        val cnts = chunks
          .withColumn("pred_lang", TextAnalysis.langPredict(scores))
          .groupBy("doc_id", "pred_lang").agg(count(lit(1)).as("cnt"))
        val tot = cnts.groupBy("doc_id")
          .agg(sum(col("cnt")).as("n_chunks"), count(lit(1)).as("n_langs"))
        val top = Relational.top1PerGroup(cnts, Seq(col("doc_id")),
            Seq(col("cnt").desc, col("pred_lang").asc))
          .select(col("doc_id"), col("pred_lang").as("top_lang"), col("cnt").as("top_n"))
        tot.join(top, Seq("doc_id"))
          .select(col("doc_id"), col("n_chunks"), col("n_langs"),
            col("top_lang"), col("top_n"),
            (col("top_n") / col("n_chunks")).as("maj_share"),
            (col("n_langs") > 1).as("code_switched"))
          .orderBy("doc_id")
      },
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |ch AS (SELECT doc_id, l,
         |         unnest(generate_series(0, (len(l) - 1) // 40)) AS chunk_id
         |       FROM ws),
         |ck AS (SELECT doc_id,
         |    ' ' || array_to_string(list_slice(l, chunk_id * 40 + 1, chunk_id * 40 + 40), ' ') || ' ' AS pt
         |  FROM ch),
         |scored AS (SELECT doc_id,
         |    $scoreSql
         |  FROM ck),
         |pred AS (SELECT doc_id,
         |    CASE $predSql ELSE 'und' END AS pred_lang
         |  FROM (SELECT *, $best AS best FROM scored)),
         |cnts AS (SELECT doc_id, pred_lang, count(*) AS cnt FROM pred GROUP BY 1, 2),
         |tot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chunks,
         |    CAST(count(*) AS BIGINT) AS n_langs
         |  FROM cnts GROUP BY 1),
         |top AS (SELECT doc_id, pred_lang AS top_lang, cnt AS top_n FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY cnt DESC, pred_lang) AS rn FROM cnts) r
         |  WHERE rn = 1)
         |SELECT t.doc_id, t.n_chunks, t.n_langs, top.top_lang,
         |  CAST(top.top_n AS BIGINT) AS top_n,
         |  top.top_n / t.n_chunks AS maj_share,
         |  t.n_langs > 1 AS code_switched
         |FROM tot t JOIN top ON top.doc_id = t.doc_id
         |ORDER BY t.doc_id""".stripMargin)
  }

  /** Per-document quality score: lexical diversity, stopword ratio, length
    * credit — pure column expressions, no UDF.
    *
    * Cross-engine contract: the component ratios are RAW IEEE divisions of
    * exact integers (one correctly-rounded op → bit-identical in Spark and
    * DuckDB; `round(double, n)` is NOT engine-stable — Spark rounds the
    * shortest decimal repr HALF_UP while DuckDB rounds the binary value, so
    * a dyadic ratio like 1/128 = 0.0078125 splits them). The composite goes
    * through exact DECIMAL(12,6) snapshots of those doubles (both engines
    * cast double→decimal via the shortest repr, verified) and surfaces as
    * DOUBLE — never DECIMAL — at the output boundary. */
  private val z2QualityScore = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      def dec6(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 6))
      val ws = split(col("text"), " ")
      val nWords = size(ws).cast("double")
      val diversity = size(array_distinct(ws)) / nWords
      val padded = concat(lit(" "), col("text"), lit(" "))
      val stopCnt = TextAnalysis.stopwords.filter(Seq("the", "a").contains)
        .map(m => TextAnalysis.markerCount(padded, s" $m "))
        .reduce(_ + _)
      val stopRatio = stopCnt / nWords
      val lenCredit = dec6(least(nWords / 80, lit(1.0)))
      Tables.documents(s, d)
        .withColumn("n_words", size(ws))
        .withColumn("diversity", diversity)
        .withColumn("stop_ratio", stopRatio)
        .withColumn("quality",
          (dec6(lit(0.5)) * dec6(diversity)
            + dec6(lit(0.3)) * (dec6(lit(1.0)) - dec6(stopRatio))
            + dec6(lit(0.2)) * lenCredit).cast(DecimalType(14, 7)).cast(DoubleType))
        .select("doc_id", "n_words", "diversity", "stop_ratio", "quality")
        .orderBy("doc_id")
    },
    """WITH q AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS INT) AS n_words,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS diversity,
      |    (CAST((length(pt) - length(replace(pt, ' the ', ''))) / 5 AS INT)
      |         + CAST((length(pt) - length(replace(pt, ' a ', ''))) / 3 AS INT))
      |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio
      |  FROM (SELECT doc_id, text, ' ' || text || ' ' AS pt FROM documents))
      |SELECT doc_id, n_words, diversity, stop_ratio,
      |  CAST(CAST(CAST(0.5 AS DECIMAL(12,6)) * CAST(diversity AS DECIMAL(12,6))
      |    + CAST(0.3 AS DECIMAL(12,6)) * (CAST(1.0 AS DECIMAL(12,6)) - CAST(stop_ratio AS DECIMAL(12,6)))
      |    + CAST(0.2 AS DECIMAL(12,6)) * LEAST(CAST(CAST(n_words AS DOUBLE) / 80 AS DECIMAL(12,6)),
      |        CAST(1.0 AS DECIMAL(12,6))) AS DECIMAL(14,7)) AS DOUBLE) AS quality
      |FROM q ORDER BY doc_id""".stripMargin)

  /** Token counting: whitespace tokens + BPE-ish regex tokens + chars. */
  private val z3TokenCounts = Q(
    (s, d) => Tables.documents(s, d)
      .withColumn("ws_tokens", size(split(col("text"), " ")))
      .withColumn("bpe_tokens",
        size(regexp_extract_all(lower(col("text")), lit(TextAnalysis.bpeIshPattern), lit(0))))
      .withColumn("n_chars_obs", length(col("text")))
      .select("doc_id", "ws_tokens", "bpe_tokens", "n_chars_obs")
      .orderBy("doc_id"),
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
       |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS INT) AS bpe_tokens,
       |  CAST(length(text) AS INT) AS n_chars_obs
       |FROM documents ORDER BY doc_id""".stripMargin)

  /** Order-sensitive rolling-hash document fingerprint (Horner fold). */
  private val z4Fingerprint = Q(
    (s, d) => Tables.documents(s, d)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("fingerprint", TextAnalysis.fingerprint("ws"))
      .select("doc_id", "fingerprint")
      .orderBy("doc_id"),
    s"""SELECT doc_id,
       |  list_reduce(list_transform(string_split(text, ' '), w -> ${h32Sql("w")}),
       |    (acc, h) -> (acc * 31 + h) % 1000000007) % 1000000007 AS fingerprint
       |FROM documents ORDER BY doc_id""".stripMargin)

  // ---- multimodal ----

  /** Binary-payload feature extraction through the mapPartitions seam
    * (typed Dataset, per-partition batch init) + metadata-struct access.
    * The decode is the documented deterministic stub; the oracle replays
    * its Horner checksum over the UTF-8 bytes (= ascii codes: the corpus
    * is pure ASCII, verified). */
  /** m4: multimodal → similarity composition — payloads run through the
    * batched ENCODER seam (`Multimodal.encodeEmbedding`, stub per brief)
    * and the resulting `Array[Float]` column feeds `Similarity`'s
    * BUCKETED ANN unchanged: media search is the same engine path as
    * text-embedding search. The bucketed form is the point at scale —
    * the %97 query slice grows WITH the corpus, so brute force here is
    * corpus²/97 pairs (the round-3 soak measured it 86× at 10×); the
    * bucket join cuts pair volume to ~corpus²/2^planes with the PLANE
    * COUNT as the knob (a production corpus raises NumPlanes so buckets
    * stay bounded), and the query side carries no broadcast hint — AQE
    * broadcasts while the batch fits and shuffle-joins beyond. Brute
    * force remains the broadcast-sized rerank primitive, and the
    * spec-level gate proves the bucketed scores are exactly its scores
    * restricted to the bucket.
    * The oracle replays the stride-slice Horner embedding, the 8-dim
    * hyperplane signature, and the element-for-element cosine fold. */
  private val m4MediaEmbedAnn = Q(
    (s, d) => {
      val pay = Multimodal.payloads(Tables.documents(s, d), "doc_id", "text")
      val emb = Multimodal.encodeEmbedding(s, pay).toDF()
      Similarity.bucketedTopK(
          emb, id => id % 97 === 0, "doc_id", "emb", k = 5, dims = 8)
        .orderBy("q_id", "rank")
    },
    s"""WITH dims AS (
      |  SELECT doc_id, j,
      |    CASE WHEN j = 7 THEN substring(text, j * stride + 1)
      |         ELSE substring(text, j * stride + 1, stride) END AS s
      |  FROM (SELECT doc_id, text, greatest(1, length(text) // 8) AS stride,
      |          unnest(generate_series(0, 7)) AS j
      |        FROM documents)),
      |vals AS (
      |  SELECT doc_id, j, CAST(CAST(
      |      (CASE WHEN length(s) = 0 THEN 0
      |            ELSE list_reduce(
      |              list_transform(regexp_extract_all(s, '.'), c -> CAST(ascii(c) AS BIGINT)),
      |              (acc, x) -> (acc * 31 + x) % 1000000007) % 1000000007 END)
      |      % 10000 AS DOUBLE) / 10000.0 AS FLOAT) AS v
      |  FROM dims),
      |emb AS (SELECT doc_id,
      |    list_transform(list(v ORDER BY j), x -> CAST(x AS DOUBLE)) AS vd
      |  FROM vals GROUP BY 1),
      |n AS (SELECT doc_id, vd,
      |    sqrt(list_reduce(list_transform(vd, x -> x * x), (acc, x) -> acc + x)) AS nrm,
      |    CAST(${bucketSqlFor(8)} AS BIGINT) AS bucket
      |  FROM emb),
      |q AS (SELECT doc_id AS q_id, vd AS qv, nrm AS qn, bucket FROM n WHERE doc_id % 97 = 0),
      |scored AS (
      |  SELECT q.q_id, q.bucket, c.doc_id AS c_id,
      |    ROUND(list_reduce(list_transform(generate_series(1, 8), i -> qv[i] * c.vd[i]),
      |        (acc, x) -> acc + x) / (qn * c.nrm), 6) AS cosine
      |  FROM q JOIN n c ON c.bucket = q.bucket AND c.doc_id <> q.q_id),
      |ranked AS (
      |  SELECT q_id, bucket, c_id, cosine, CAST(ROW_NUMBER() OVER (
      |      PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS INT) AS rank
      |  FROM scored)
      |SELECT q_id, bucket, rank, c_id, cosine FROM ranked WHERE rank <= 5
      |ORDER BY q_id, rank""".stripMargin)

  /** m5: payload fingerprint near-dup — the perceptual-hash rung of media
    * dedup: a weighted SimHash over ALL overlapping 16-byte windows of the
    * payload (stride 1 — alignment-free, so a shifted/rotated near-dup
    * still shares most windows; a strided variant would lose collisions
    * whenever the shift isn't a stride multiple), then x3b's banded
    * Hamming join + per-doc panel. A real phash hashes decoded image
    * blocks; the byte-window form here runs on the raw payload through the
    * same machinery (m2 precedent: the corpus is pure ASCII, so the SQL
    * substring replays the byte windows exactly). Window counts are per-
    * doc-linear and the 64 bit-sums are map-side combinable; pairs only
    * materialize inside 16-bit band buckets (65 536 values per band) with
    * pigeonhole-exact recall ≤ 3.
    * Cost note (10× soak: 6.1→52.8 s, linear in windows + pairs): the
    * md5-per-window hash is the dominant constant, kept because the
    * oracle replays it engine-exactly; a production fingerprinter uses a
    * rolling Rabin-Karp hash — O(n) total for all windows — which z4
    * already demonstrates on the word stream. */
  private val m5PhashDedup = Q(
    (s, d) => {
      // fanOut (r13): two md5s per character position in ONE scan task
      // otherwise — the declared md5-per-window anchor form is exactly the
      // kind of CPU-dense, byte-tiny stage the one-file corpus serializes
      val hv = graft.Tables.fanOut(Tables.documents(s, d))
        .filter(length(col("text")) >= 16)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), expr("length(text) - 16"))).as("k"))
        .select(col("doc_id"),
          TextAnalysis.hash32(expr("substring(text, k + 1, 16)")).as("hv_hi"),
          TextAnalysis.hash32b(expr("substring(text, k + 1, 16)")).as("hv_lo"))
      val pairs = Dedup.simhashPairs(Dedup.simhash64(hv, "doc_id"), "doc_id")
      pairs.select(explode(array(
          struct(col("doc_a").as("doc_id"), col("doc_b").as("partner"), col("hamming")),
          struct(col("doc_b").as("doc_id"), col("doc_a").as("partner"), col("hamming"))))
          .as("e"))
        .select(col("e.doc_id"), col("e.partner"), col("e.hamming").as("hamming"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_neardups"),
          min(col("partner")).as("min_partner"),
          min(col("hamming")).as("min_hamming"))
        .orderBy("doc_id")
    },
    {
      s"""WITH pos AS (SELECT doc_id, text,
         |    unnest(generate_series(0, length(text) - 16)) AS k
         |  FROM documents WHERE length(text) >= 16),
         |hv AS (SELECT doc_id,
         |    ${h32Sql("substring(text, k + 1, 16)")} AS hv_hi,
         |    ${h32bSql("substring(text, k + 1, 16)")} AS hv_lo
         |  FROM pos),
         |bits AS (SELECT doc_id,
         |    $simhashBitSumsSql
         |  FROM hv GROUP BY 1),
         |sh AS (SELECT doc_id, CAST($simhashPackedSql AS BIGINT) AS simhash FROM bits),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |sym AS (
         |  SELECT doc_a AS doc_id, doc_b AS partner, hamming FROM pairs
         |  UNION ALL
         |  SELECT doc_b AS doc_id, doc_a AS partner, hamming FROM pairs)
         |SELECT doc_id, COUNT(*) AS n_neardups,
         |  MIN(partner) AS min_partner,
         |  CAST(MIN(hamming) AS INT) AS min_hamming
         |FROM sym GROUP BY doc_id ORDER BY doc_id""".stripMargin
    })

  /** m5b: m5's payload phash on the ROLLING Rabin–Karp window hash — the
    * production fingerprinter the m5 cost note promised: one O(1) slide
    * per 16-byte window instead of an md5 per window, through the native
    * `graft_rolling_windows` expression (two coprime sub-2³¹ lattices
    * give the hv_hi/hv_lo halves; modular congruence makes the rolling
    * form and the oracle's independent per-window Horner folds
    * bit-identical). Same SimHash/banded-pair/panel machinery as m5 —
    * the fingerprint space changes (31-bit halves → signature bits 31/63
    * constant, every 16-bit band still ≥ 15 effective bits), the
    * near-dup semantics don't. The md5 form stays declared as m5; this is
    * the rung a 100-TB payload scan actually runs (the md5-per-window
    * constant was m5's measured 10× soak dominator). */
  private val m5bPhashRolling = Q(
    (s, d) => {
      val hv = Tables.documents(s, d)
        .filter(length(col("text")) >= 16)
        .select(col("doc_id"),
          explode(zip_with(
            TextAnalysis.rollingWindows(col("text"), 16, TextAnalysis.RollingA),
            TextAnalysis.rollingWindows(col("text"), 16, TextAnalysis.RollingB),
            (hi, lo) => struct(hi.as("hv_hi"), lo.as("hv_lo")))).as("e"))
        .select(col("doc_id"), col("e.hv_hi"), col("e.hv_lo"))
      val pairs = Dedup.simhashPairs(Dedup.simhash64(hv, "doc_id"), "doc_id")
      pairs.select(explode(array(
          struct(col("doc_a").as("doc_id"), col("doc_b").as("partner"), col("hamming")),
          struct(col("doc_b").as("doc_id"), col("doc_a").as("partner"), col("hamming"))))
          .as("e"))
        .select(col("e.doc_id"), col("e.partner"), col("e.hamming").as("hamming"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_neardups"),
          min(col("partner")).as("min_partner"),
          min(col("hamming")).as("min_hamming"))
        .orderBy("doc_id")
    },
    {
      val (b1, m1) = TextAnalysis.RollingA
      val (b2, m2) = TextAnalysis.RollingB
      def hornerSql(base: Long, mod: Long): String =
        s"""list_reduce(list_transform(generate_series(1, 16),
           |      i -> CAST(ascii(substring(text, p + i, 1)) AS BIGINT)),
           |      (acc, b) -> (acc * $base + b) % $mod)""".stripMargin
      s"""WITH pos AS (SELECT doc_id, text,
         |    unnest(generate_series(0, length(text) - 16)) AS p
         |  FROM documents WHERE length(text) >= 16),
         |hv AS (SELECT doc_id,
         |    ${hornerSql(b1, m1)} AS hv_hi,
         |    ${hornerSql(b2, m2)} AS hv_lo
         |  FROM pos),
         |bits AS (SELECT doc_id,
         |    $simhashBitSumsSql
         |  FROM hv GROUP BY 1),
         |sh AS (SELECT doc_id, CAST($simhashPackedSql AS BIGINT) AS simhash FROM bits),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |sym AS (
         |  SELECT doc_a AS doc_id, doc_b AS partner, hamming FROM pairs
         |  UNION ALL
         |  SELECT doc_b AS doc_id, doc_a AS partner, hamming FROM pairs)
         |SELECT doc_id, COUNT(*) AS n_neardups,
         |  MIN(partner) AS min_partner,
         |  CAST(MIN(hamming) AS INT) AS min_hamming
         |FROM sym GROUP BY doc_id ORDER BY doc_id""".stripMargin
    })

  private val m1MediaFeatures = Q(
    (s, d) => {
      val pay = Multimodal.payloads(Tables.documents(s, d), "doc_id", "text")
      Multimodal.extractFeatures(s, pay).toDF()
        .join(pay.select(col("doc_id"), col("meta.head").as("head")), Seq("doc_id"))
        .select("doc_id", "n_bytes", "checksum", "width", "height", "brightness", "head")
        .orderBy("doc_id")
    },
    """WITH cs AS (SELECT doc_id, text,
      |    list_reduce(list_transform(regexp_extract_all(text, '.'), c -> CAST(ascii(c) AS BIGINT)),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) % 1000000007 AS checksum
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(length(text) AS INT) AS n_bytes,
      |  checksum,
      |  CAST(checksum % 640 + 64 AS INT) AS width,
      |  CAST((checksum // 640) % 480 + 48 AS INT) AS height,
      |  (checksum % 10000) / 10000.0 AS brightness,
      |  substring(text, 1, 8) AS head
      |FROM cs ORDER BY doc_id""".stripMargin)

  /** m8: PAYLOAD INTEGRITY audit — the validation gate a multimodal ingest
    * runs before any payload enters a store: does each arrived binary
    * still match its DECLARED metadata (size in bytes, content head)?
    * Deterministic fault injection makes the audit testable end-to-end:
    * doc_id%7 payloads arrive TRUNCATED (the partial-transfer case —
    * size mismatch, head intact), doc_id%11 arrive HEAD-CORRUPTED (the
    * bit-rot/wrong-file case — size intact, head mismatch). The panel is
    * per-source pass/fail counts plus a quarantine checksum pinning
    * exactly WHICH docs were flagged. A real pipeline adds declared-mime
    * vs sniffed-magic-bytes and a full content checksum at this exact
    * seam (meta already carries n_bytes/mime/head — Multimodal.payloads);
    * the checks are pure in-scan byte arithmetic feeding ONE combinable
    * aggregate, the cheapest possible shape: the audit rides the ingest
    * scan for free at any corpus size. */
  /** m9: MODALITY-AWARE PAYLOAD PACKING — z19's bin assignment for the
    * binary side of the corpus: inference/preprocessing batches media by
    * BYTES, not token counts, and each modality packs separately (an
    * image batch and an audio batch never mix on an accelerator), so the
    * prefix sum that decides bins must run PER MODALITY. The naive form
    * — `sum(bytes) OVER (PARTITION BY modality ORDER BY ...)` — funnels
    * each modality's entire corpus through one window task (three
    * modalities over 100 TB = three tasks); this query rides
    * [[Relational.groupedRunningTotal]], the grouped member of the
    * two-pass family (range partition + per-(partition, modality)
    * offsets), so no task ever holds more than a partition. Modality is
    * the deterministic doc_id%3 fake (m8's injection discipline —
    * payload bytes are real, the modality label is the stub this
    * container's codec-free brief prescribes); an item's bin is where
    * its first byte lands at B=4096 (z19's rule, per group). Panel per
    * (modality, bin): items, bytes, id span. */
  private val m9ModalityPacking = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val docs = Tables.documents(s, d)
      val pay = Multimodal.payloads(docs, "doc_id", "text")
        .select(col("doc_id"), col("meta.n_bytes").cast(LongType).as("n_bytes"))
        .withColumn("modality",
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio").otherwise("video"))
      Relational.groupedRunningTotal(pay, Seq("modality"), Seq("doc_id"),
          "n_bytes", "cum")
        .withColumn("bin", expr("(cum - n_bytes) DIV 4096").cast("int"))
        .groupBy("modality", "bin")
        .agg(count(lit(1)).as("n_items"),
          sum(col("n_bytes")).cast(LongType).as("bin_bytes"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy("modality", "bin")
    },
    """WITH p AS (SELECT doc_id,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality
      |  FROM documents),
      |c AS (SELECT doc_id, modality, n_bytes, CAST(SUM(n_bytes) OVER (
      |    PARTITION BY modality ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM p)
      |SELECT modality, CAST((cum - n_bytes) // 4096 AS INT) AS bin,
      |  COUNT(*) AS n_items, CAST(SUM(n_bytes) AS BIGINT) AS bin_bytes,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM c GROUP BY 1, 2 ORDER BY modality, bin""".stripMargin)

  private val m8PayloadIntegrity = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val M = lit(2147483647L)
      val docs = Tables.documents(s, d)
      val pay = Multimodal.payloads(docs, "doc_id", "text")
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
      val arrived = pay.withColumn("payload",
        when(col("doc_id") % 7 === 0,
          expr("substring(payload, 1, CAST(octet_length(payload) / 2 AS INT))"))
          .when(col("doc_id") % 11 === 0,
            concat(encode(lit("XX"), "UTF-8"),
              expr("substring(payload, 3, 2147483647)")))
          .otherwise(col("payload")))
      val audited = arrived
        .withColumn("size_ok",
          octet_length(col("payload")) === col("meta.n_bytes"))
        .withColumn("head_ok",
          expr("substring(payload, 1, 8)") === encode(col("meta.head"), "UTF-8"))
        .withColumn("ok", col("size_ok") && col("head_ok"))
      audited.groupBy("source").agg(
          count(lit(1)).as("n_payloads"),
          sum(when(!col("size_ok"), 1L).otherwise(0L)).as("n_size_bad"),
          sum(when(!col("head_ok"), 1L).otherwise(0L)).as("n_head_bad"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
          pmod(sum(when(col("ok"), lit(0L)).otherwise(col("doc_id") % M)), M)
            .cast(LongType).as("quarantine_checksum"))
        .orderBy("source")
    },
    """WITH pay AS (SELECT doc_id, source, text,
      |    CASE WHEN doc_id % 7 = 0 THEN substring(text, 1, length(text) // 2)
      |         WHEN doc_id % 11 = 0 THEN 'XX' || substring(text, 3)
      |         ELSE text END AS arrived
      |  FROM documents),
      |a AS (SELECT doc_id, source,
      |    length(arrived) = length(text) AS size_ok,
      |    substring(arrived, 1, 8) = substring(text, 1, 8) AS head_ok
      |  FROM pay)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_payloads,
      |  CAST(SUM(CASE WHEN NOT size_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_size_bad,
      |  CAST(SUM(CASE WHEN NOT head_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_head_bad,
      |  CAST(SUM(CASE WHEN size_ok AND head_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
      |  CAST(SUM(CASE WHEN size_ok AND head_ok THEN 0
      |    ELSE doc_id % 2147483647 END) % 2147483647 AS BIGINT)
      |    AS quarantine_checksum
      |FROM a GROUP BY 1 ORDER BY 1""".stripMargin)

  /** m7: CROSS-MODAL dedup — union the two duplicate graphs a multimodal
    * corpus has (text: 3-gram shingle MinHash-LSH candidates, x2's capped
    * generator; payload: 64-bit SimHash over 16-byte windows on m5b's
    * PRODUCTION rolling fingerprints, Hamming ≤ 3) and classify every
    * resulting dup CLUSTER by which
    * modality sees it: `both`, `text_only` (payload re-encoded, words
    * near-identical), `payload_only` (caption rewritten, bytes
    * near-identical — the dup a text-only pipeline ships twice). This is
    * the production reason multimodal dedup runs ONE union-find over all
    * evidence instead of per-modality passes: transitive chains across
    * modalities merge (text links A-B, payload links B-C ⇒ {A,B,C} is
    * one cluster), which per-modality dedup provably misses. Scale: both
    * pair generators are the already-bounded rungs (capped bucket join,
    * banded simhash); the union adds one pair-level distinct; CC is the
    * shared label-prop machinery; evidence flags are a combinable max per
    * cluster. All cells integer counts. */
  /** DuckDB independent Horner fold over a 16-byte window at offset `p` —
    * the oracle side of the rolling fingerprint lattice (m5b's renderer
    * shape, shared here by m7's payload modality). */
  private def m7HornerSql(lattice: (Long, Long)): String = {
    val (base, mod) = lattice
    s"""list_reduce(list_transform(generate_series(1, 16),
       |      i -> CAST(ascii(substring(text, p + i, 1)) AS BIGINT)),
       |      (acc, b) -> (acc * $base + b) % $mod)""".stripMargin
  }

  private val m7CrossmodalDedup = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val tpairs = Dedup.lshCandidates(minhashSig(s, d), "doc_id", 8,
        maxBucket = Some(X2MaxBucket))
      // payload fingerprints ride m5b's PRODUCTION rung (dual-lattice
      // rolling windows, one O(1) slide per byte) — the md5-per-window
      // anchor form stays declared as m5; at the 10× soak it dominated
      // this query 158 s vs the rolling form's cost
      val phv = docs // no fanOut: the rolling fold is cheap, m7 regressed with it
        .filter(length(col("text")) >= 16)
        .select(col("doc_id"),
          explode(zip_with(
            TextAnalysis.rollingWindows(col("text"), 16, TextAnalysis.RollingA),
            TextAnalysis.rollingWindows(col("text"), 16, TextAnalysis.RollingB),
            (hi, lo) => struct(hi.as("hv_hi"), lo.as("hv_lo")))).as("e"))
        .select(col("doc_id"), col("e.hv_hi"), col("e.hv_lo"))
      val ppairs = Dedup.simhashPairs(Dedup.simhash64(phv, "doc_id"), "doc_id")
        .select("doc_a", "doc_b")
      val tagged = tpairs.select(col("doc_a"), col("doc_b"),
          lit(1).as("is_text"), lit(0).as("is_payload"))
        .union(ppairs.select(col("doc_a"), col("doc_b"),
          lit(0).as("is_text"), lit(1).as("is_payload")))
        .groupBy("doc_a", "doc_b")
        .agg(max(col("is_text")).as("is_text"),
          max(col("is_payload")).as("is_payload"))
      val cc = Dedup.connectedComponents(
        tagged.select("doc_a", "doc_b"), docs, "doc_id")
      val ev = tagged
        .join(cc.select(col("doc_id").as("doc_a"), col("cluster_id")), Seq("doc_a"))
        .groupBy("cluster_id")
        .agg(max(col("is_text")).as("has_text"),
          max(col("is_payload")).as("has_payload"))
      val sizes = cc.groupBy("cluster_id").agg(count(lit(1)).as("n_docs"))
      ev.join(sizes, Seq("cluster_id"))
        .withColumn("outcome",
          when(col("has_text") === 1 && col("has_payload") === 1, "both")
            .when(col("has_text") === 1, "text_only")
            .otherwise("payload_only"))
        .groupBy("outcome")
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("n_docs")).cast("long").as("n_dup_docs"))
        .orderBy("outcome")
    },
    s"""WITH RECURSIVE $minhashCtes,
       |${cappedBandsCte(bandsSql)},
       |tp AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |mpos AS (SELECT doc_id, text,
       |    unnest(generate_series(0, length(text) - 16)) AS p
       |  FROM documents WHERE length(text) >= 16),
       |mhv AS (SELECT doc_id,
       |    ${m7HornerSql(TextAnalysis.RollingA)} AS hv_hi,
       |    ${m7HornerSql(TextAnalysis.RollingB)} AS hv_lo
       |  FROM mpos),
       |mbits AS (SELECT doc_id,
       |    $simhashBitSumsSql
       |  FROM mhv GROUP BY 1),
       |msh AS (SELECT doc_id, CAST($simhashPackedSql AS BIGINT) AS simhash FROM mbits),
       |mp AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM msh a JOIN msh b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
       |up AS (
       |  SELECT doc_a, doc_b, MAX(is_text) AS is_text, MAX(is_payload) AS is_payload
       |  FROM (SELECT doc_a, doc_b, 1 AS is_text, 0 AS is_payload FROM tp
       |        UNION ALL
       |        SELECT doc_a, doc_b, 0, 1 FROM mp) t
       |  GROUP BY 1, 2),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM up
       |          UNION ALL SELECT doc_b, doc_a FROM up),
       |reach(node, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.node),
       |comp AS (SELECT node, min(r) AS cid FROM reach GROUP BY 1),
       |lbl AS (SELECT d.doc_id, COALESCE(comp.cid, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.node),
       |ev AS (SELECT l.cluster_id,
       |    MAX(u.is_text) AS has_text, MAX(u.is_payload) AS has_payload
       |  FROM up u JOIN lbl l ON l.doc_id = u.doc_a GROUP BY 1),
       |sz AS (SELECT cluster_id, COUNT(*) AS n_docs FROM lbl GROUP BY 1)
       |SELECT CASE WHEN ev.has_text = 1 AND ev.has_payload = 1 THEN 'both'
       |            WHEN ev.has_text = 1 THEN 'text_only'
       |            ELSE 'payload_only' END AS outcome,
       |  COUNT(*) AS n_clusters,
       |  CAST(SUM(sz.n_docs) AS BIGINT) AS n_dup_docs
       |FROM ev JOIN sz ON sz.cluster_id = ev.cluster_id
       |GROUP BY 1 ORDER BY 1""".stripMargin)

  /** One-to-many frame sampling through the typed flatMap seam: 3 evenly
    * strided 16-byte windows per payload, checksummed. The oracle replays
    * the byte windows as ASCII substrings (corpus verified pure ASCII). */
  private val m2FrameSample = {
    val frames = (0 until 3).map { k =>
      s"""SELECT doc_id, $k AS frame_idx,
         |  CAST($k * (length(text) // 3) AS INT) AS "offset",
         |  CAST(length(fr$k) AS INT) AS n_bytes,
         |  list_reduce(list_transform(regexp_extract_all(fr$k, '.'), c -> CAST(ascii(c) AS BIGINT)),
         |    (acc, x) -> (acc * 31 + x) % 1000000007) % 1000000007 AS frame_checksum
         |FROM (SELECT doc_id, text,
         |        substring(text, $k * (length(text) // 3) + 1, 16) AS fr$k
         |      FROM documents) f$k""".stripMargin
    }
    Q(
      (s, d) => {
        val pay = Multimodal.payloads(Tables.documents(s, d), "doc_id", "text")
        Multimodal.frameSample(s, pay, nFrames = 3, frameLen = 16).toDF()
          .orderBy("doc_id", "frame_idx")
      },
      frames.mkString("", "\nUNION ALL\n", "\nORDER BY doc_id, frame_idx"))
  }

  /** Resize planning over the stub-decoded geometry: contain-fit into a
    * 224-box, floor-rounded (no half-way ambiguity across engines). */
  private val m3ResizePlan = Q(
    (s, d) => {
      val pay = Multimodal.payloads(Tables.documents(s, d), "doc_id", "text")
      Multimodal.resizePlan(Multimodal.extractFeatures(s, pay).toDF(), box = 224)
        .orderBy("doc_id")
    },
    """WITH cs AS (SELECT doc_id,
      |    list_reduce(list_transform(regexp_extract_all(text, '.'), c -> CAST(ascii(c) AS BIGINT)),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) % 1000000007 AS checksum
      |  FROM documents),
      |geo AS (SELECT doc_id,
      |    CAST(checksum % 640 + 64 AS INT) AS width,
      |    CAST((checksum // 640) % 480 + 48 AS INT) AS height
      |  FROM cs)
      |SELECT doc_id, width, height,
      |  CAST(FLOOR(width * LEAST(1.0, 224.0 / GREATEST(width, height))) AS INT) AS out_w,
      |  CAST(FLOOR(height * LEAST(1.0, 224.0 / GREATEST(width, height))) AS INT) AS out_h
      |FROM geo ORDER BY doc_id""".stripMargin)

  /** z12: PII redaction — the scrub pass a corpus build runs before
    * training. The word-salad corpus carries no real PII, so emails/phones
    * are SYNTHESIZED deterministically in-query (doc_id mod classes) and
    * the operator under test is the redaction itself: per-doc match counts
    * plus the masked text, exact string compare against the oracle. */
  private val z12PiiRedact = {
    val email = TextAnalysis.EmailPattern
    val phone = TextAnalysis.PhonePattern
    Q(
      (s, d) => {
        val dirty = concat(
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com now"))).otherwise(col("text")),
          when(col("doc_id") % 11 === 0, lit(" call 555-123-4567")).otherwise(lit("")))
        Tables.documents(s, d)
          .withColumn("t", dirty)
          .select(col("doc_id"),
            size(regexp_extract_all(col("t"), lit(email), lit(0))).as("n_emails"),
            size(regexp_extract_all(col("t"), lit(phone), lit(0))).as("n_phones"),
            TextAnalysis.redactPii(col("t")).as("redacted"))
          .orderBy("doc_id")
      },
      s"""WITH dirty AS (SELECT doc_id,
         |    (CASE WHEN doc_id % 7 = 0
         |          THEN text || ' contact user' || doc_id || '@example.com now'
         |          ELSE text END)
         |    || (CASE WHEN doc_id % 11 = 0 THEN ' call 555-123-4567' ELSE '' END) AS t
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$email')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '$phone')) AS INT) AS n_phones,
         |  regexp_replace(regexp_replace(t, '$email', '[EMAIL]', 'g'),
         |                 '$phone', '[PHONE]', 'g') AS redacted
         |FROM dirty ORDER BY doc_id""".stripMargin)
  }

  /** z5: deterministic train/val/test assignment — md5-bucket splits that
    * are reproducible across runs, engines, and cluster sizes (`rand()` /
    * `df.sample` are none of those). Pure expression: no shuffle beyond
    * the summary groupBy. */
  private val z5HashSplit = Q(
    (s, d) => Tables.documents(s, d)
      .withColumn("split", Sampling.splitAssign(col("doc_id"), 80, 10))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"))
      .orderBy("split"),
    """SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
      |            ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(length(text)) AS BIGINT) AS total_chars
      |FROM (SELECT text,
      |        ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
      |      FROM documents) t
      |GROUP BY 1 ORDER BY 1""".stripMargin)

  /** z47: LEAKAGE-FREE train/test split — z5's hash split made safe
    * against near-duplicate leakage (Lee et al.'s "Deduplicating Training
    * Data" finding: test-set near-dups of training docs inflate eval):
    * hash the CLUSTER id, not the doc id, so every member of an LSH
    * connected component lands in the same split by construction. The
    * panel proves it with data rather than argument: n_leaked_cluster
    * (candidate pairs straddling splits under the cluster-keyed split)
    * must be 0, while n_leaked_naive prices the doc-keyed split's
    * leakage on the same pair set — the number a naive pipeline never
    * measures. Scale: the cluster machinery is x8's (LSH-capped pairs,
    * label-prop CC); split assignment and leak counting are two
    * equi-joins of the pair relation against the assignment — all
    * combinable aggregates; per-split cluster counts are a distinct on
    * (split, cluster), never a corpus window. All cells integer. */
  private val z47LeakageSplit = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      // pin the candidate pairs (r13, guide §5): they feed BOTH the
      // clustering and the leak join — unpinned, the whole minhash+LSH
      // pipeline re-executed for the second consumer (CC pins only its
      // internal symmetrized copy)
      val pairs = graft.Housekeeping.pin(s)(
        Dedup.lshCandidates(minhashSig(s, d), "doc_id", 8,
          maxBucket = Some(X2MaxBucket))).df
      val assigned = Dedup.connectedComponents(pairs, docs, "doc_id")
        .withColumn("cl_split", Sampling.splitAssign(col("cluster_id"), 80, 10))
        .withColumn("doc_split", Sampling.splitAssign(col("doc_id"), 80, 10))
      val leaks = pairs
        .join(assigned.select(col("doc_id").as("doc_a"),
          col("cl_split").as("ca"), col("doc_split").as("da")), Seq("doc_a"))
        .join(assigned.select(col("doc_id").as("doc_b"),
          col("cl_split").as("cb"), col("doc_split").as("db")), Seq("doc_b"))
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(when(col("ca") =!= col("cb"), 1L).otherwise(0L)), lit(0L))
            .as("n_leaked_cluster"),
          coalesce(sum(when(col("da") =!= col("db"), 1L).otherwise(0L)), lit(0L))
            .as("n_leaked_naive"))
      assigned.groupBy(col("cl_split").as("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"))
        .crossJoin(broadcast(leaks))
        .select(col("split"), col("n_docs"), col("n_clusters"),
          col("n_pairs"), col("n_leaked_cluster"), col("n_leaked_naive"))
        .orderBy("split")
    },
    s"""WITH RECURSIVE $componentsCtes,
       |asg AS (SELECT d.doc_id, COALESCE(comp.cid, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.node),
       |spl AS (SELECT doc_id, cluster_id,
       |    CASE WHEN cb < 80 THEN 'train' WHEN cb < 90 THEN 'val'
       |         ELSE 'test' END AS cl_split,
       |    CASE WHEN db < 80 THEN 'train' WHEN db < 90 THEN 'val'
       |         ELSE 'test' END AS doc_split
       |  FROM (SELECT doc_id, cluster_id,
       |      ('0x' || substring(md5(CAST(cluster_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS cb,
       |      ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS db
       |    FROM asg) t),
       |lk AS (SELECT COUNT(*) AS n_pairs,
       |    CAST(COALESCE(SUM(CASE WHEN a.cl_split <> b.cl_split THEN 1 ELSE 0 END), 0) AS BIGINT)
       |      AS n_leaked_cluster,
       |    CAST(COALESCE(SUM(CASE WHEN a.doc_split <> b.doc_split THEN 1 ELSE 0 END), 0) AS BIGINT)
       |      AS n_leaked_naive
       |  FROM pairs p JOIN spl a ON a.doc_id = p.doc_a
       |  JOIN spl b ON b.doc_id = p.doc_b)
       |SELECT s.cl_split AS split, COUNT(*) AS n_docs,
       |  CAST(COUNT(DISTINCT s.cluster_id) AS BIGINT) AS n_clusters,
       |  lk.n_pairs, lk.n_leaked_cluster, lk.n_leaked_naive
       |FROM spl s CROSS JOIN lk
       |GROUP BY 1, lk.n_pairs, lk.n_leaked_cluster, lk.n_leaked_naive
       |ORDER BY 1""".stripMargin)

  /** z7: doc-term TF-IDF weights. tf/df are exact ints; the weight is
    * tf·ln(N/df) where N/df is one correctly-rounded division — the ln's
    * last-ulp wobble is absorbed by the 4 dp output rounding. Ordered by
    * (doc_id, term): value-level output, no transcendental-ranked rows. */
  private val z7Tfidf = Q(
    (s, d) => TextAnalysis.tfIdf(Tables.documents(s, d), "doc_id", "text")
      .withColumn("tfidf", graft.functions.RSemantics.stat4(col("tfidf")))
      .orderBy("doc_id", "term"),
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n FROM documents)
      |SELECT doc_id, tf.term AS term, CAST(tf AS INT) AS tf,
      |  CAST(df AS INT) AS df,
      |  ROUND(CAST(tf * LN(CAST(n AS DOUBLE) / df) AS DOUBLE), 4) AS tfidf
      |FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
      |ORDER BY doc_id, term""".stripMargin)

  /** z8: fixed-size word chunking — sequence preparation. Map-side only
    * (no shuffle); the oracle replays the slice arithmetic with DuckDB's
    * 1-based inclusive list_slice. */
  private val z8Chunking = Q(
    (s, d) => TextAnalysis.chunkWords(Tables.documents(s, d), "doc_id", "text", 40)
      .orderBy("doc_id", "chunk_id"),
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |ch AS (SELECT doc_id, l,
      |         unnest(generate_series(0, (len(l) - 1) // 40)) AS chunk_id
      |       FROM ws)
      |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
      |  CAST(len(list_slice(l, chunk_id * 40 + 1, chunk_id * 40 + 40)) AS INT) AS n_tokens,
      |  array_to_string(list_slice(l, chunk_id * 40 + 1, chunk_id * 40 + 40), ' ') AS chunk_text
      |FROM ch ORDER BY doc_id, chunk_id""".stripMargin)

  /** z9: deterministic mixture sampling — per-source keep rates (the
    * corpus-recipe op), a pure md5-bucket predicate at the scan. Rates:
    * src0 90%, src1 50%, src2 25%, everything else 10%. */
  private val z9MixtureSample = Q(
    (s, d) => {
      val rate = when(col("source") === "src0", 900)
        .when(col("source") === "src1", 500)
        .when(col("source") === "src2", 250)
        .otherwise(100)
      Sampling.mixtureSample(Tables.documents(s, d), col("doc_id"), rate)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_kept_id"))
        .orderBy("source")
    },
    """SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS min_kept_id
      |FROM (SELECT source, doc_id,
      |        ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS b
      |      FROM documents) t
      |WHERE b < CASE source WHEN 'src0' THEN 900 WHEN 'src1' THEN 500
      |                      WHEN 'src2' THEN 250 ELSE 100 END
      |GROUP BY source ORDER BY source""".stripMargin)

  /** z10: Gopher-style 3-gram repetition ratio — quality filtering's
    * repetition signal. The ratio is a raw IEEE division of exact ints. */
  private val z10Repetition = Q(
    (s, d) => TextAnalysis.repetitionRatio(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id"),
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |pos AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM ws),
      |g AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM pos)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS INT) AS n_3grams,
      |  CAST(COUNT(DISTINCT s) AS INT) AS n_distinct,
      |  CAST(COUNT(*) - COUNT(DISTINCT s) AS DOUBLE) / COUNT(*) AS dup_ratio
      |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin)

  /** z37: the full Gopher repetition panel (Rae et al. 2021 Table A1
    * subset) — top-n-gram character fractions (n=2,3,4), duplicate-n-gram
    * character fractions (n=5,10), and the keep/drop verdict computed as
    * EXACT integer cross-multiplications against the published thresholds
    * (never a float boundary). z10's single 3-gram ratio is the smoke
    * signal; this is the production gate. One explode → combinable
    * (doc, n, gram) counts → per-(doc, n) aggregate → 5-value pivot; see
    * TextAnalysis.gopherRepetition for the scale/semantics notes. */
  private val z37GopherRepetition = Q(
    (s, d) => TextAnalysis.gopherRepetition(
        graft.Tables.fanOut(Tables.documents(s, d)), "doc_id", "text")
      .orderBy("doc_id"), // fanOut r13: the ×5-n explode ran 3.9 s in ONE task
    """WITH d AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS nc,
      |    string_split(text, ' ') AS ws FROM documents WHERE len(string_split(text, ' ')) >= 2),
      |g0 AS (SELECT doc_id, nc, n, ws,
      |    unnest(generate_series(1, len(ws) - n + 1)) AS i
      |  FROM d CROSS JOIN (VALUES (2), (3), (4), (5), (10)) t(n)
      |  WHERE len(ws) >= n),
      |g AS (SELECT doc_id, nc, n,
      |    array_to_string(ws[i:i+n-1], ' ') AS gram FROM g0),
      |cnt AS (SELECT doc_id, nc, n, gram, COUNT(*) AS c,
      |    CAST(length(gram) AS BIGINT) AS gl
      |  FROM g GROUP BY 1, 2, 3, 4, length(gram)),
      |rk AS (SELECT doc_id, nc, n, c * gl AS cl,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id, n
      |      ORDER BY c DESC, c * gl DESC, gram DESC) AS rn
      |  FROM cnt),
      |top AS (SELECT doc_id, nc, n, cl FROM rk WHERE rn = 1),
      |dup AS (SELECT doc_id, n,
      |    SUM(CASE WHEN c >= 2 THEN (c - 1) * gl ELSE 0 END) AS dupch
      |  FROM cnt GROUP BY 1, 2),
      |tp AS (SELECT doc_id, ANY_VALUE(nc) AS nc,
      |    COALESCE(MAX(CASE WHEN n = 2 THEN cl END), 0) AS cl2,
      |    COALESCE(MAX(CASE WHEN n = 3 THEN cl END), 0) AS cl3,
      |    COALESCE(MAX(CASE WHEN n = 4 THEN cl END), 0) AS cl4
      |  FROM top GROUP BY 1),
      |dp AS (SELECT doc_id,
      |    CAST(COALESCE(MAX(CASE WHEN n = 5 THEN dupch END), 0) AS BIGINT) AS dup5,
      |    CAST(COALESCE(MAX(CASE WHEN n = 10 THEN dupch END), 0) AS BIGINT) AS dup10
      |  FROM dup GROUP BY 1)
      |SELECT tp.doc_id,
      |  cl2 / nc AS top2_frac, cl3 / nc AS top3_frac, cl4 / nc AS top4_frac,
      |  dup5 / nc AS dup5_frac, dup10 / nc AS dup10_frac,
      |  (cl2 * 5 <= nc AND cl3 * 50 <= nc * 9 AND cl4 * 25 <= nc * 4
      |    AND dup5 * 20 <= nc * 3 AND dup10 * 10 <= nc) AS keep
      |FROM tp JOIN dp ON dp.doc_id = tp.doc_id ORDER BY tp.doc_id""".stripMargin)

  /** z37b: the Gopher panel on ROLLING gram fingerprints — z37's
    * production rung (the x18→x18b pattern): gram identity = Rabin–Karp
    * over the word-hash window, gram length = a rolling window SUM
    * (base=1 lattice) of word lengths + separators, so the (doc, n, key)
    * shuffle carries two longs instead of the gram string (the measured
    * dominant constant at the 10× soak). Identical fractions and verdict
    * — equal-cl ties don't affect emitted values, and the oracle replays
    * the same fingerprints bit-for-bit. */
  private val z37bGopherRolling = Q(
    (s, d) => TextAnalysis.gopherRepetitionRolling(
        Tables.documents(s, d), "doc_id", "text") // rolling is O(1)/word — no fanOut
      .orderBy("doc_id"),
    s"""WITH dws AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS nc,
       |    string_split(text, ' ') AS ws
       |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
       |h AS (SELECT doc_id, nc, ws,
       |    list_transform(ws, x -> ${h32Sql("x")}) AS hs FROM dws),
       |g0 AS (SELECT doc_id, nc, n, ws, hs,
       |    unnest(generate_series(1, len(ws) - n + 1)) AS i
       |  FROM h CROSS JOIN (VALUES (2), (3), (4), (5), (10)) t(n)
       |  WHERE len(ws) >= n),
       |g AS (SELECT doc_id, nc, n,
       |    list_reduce(hs[i:i+n-1], (acc, x) -> (acc * 257 + x) % 2147483647) AS fp,
       |    CAST(length(array_to_string(ws[i:i+n-1], ' ')) AS BIGINT) AS gl
       |  FROM g0),
       |cnt AS (SELECT doc_id, nc, n, fp, gl, COUNT(*) AS c
       |  FROM g GROUP BY 1, 2, 3, 4, 5),
       |grk AS (SELECT doc_id, nc, n, c * gl AS cl, ROW_NUMBER() OVER (
       |      PARTITION BY doc_id, n ORDER BY c DESC, c * gl DESC, fp DESC) AS rn
       |  FROM cnt),
       |gtp AS (SELECT doc_id, ANY_VALUE(nc) AS nc,
       |    COALESCE(MAX(CASE WHEN n = 2 THEN cl END), 0) AS cl2,
       |    COALESCE(MAX(CASE WHEN n = 3 THEN cl END), 0) AS cl3,
       |    COALESCE(MAX(CASE WHEN n = 4 THEN cl END), 0) AS cl4
       |  FROM grk WHERE rn = 1 GROUP BY 1),
       |gdp AS (SELECT doc_id,
       |    CAST(COALESCE(SUM(CASE WHEN n = 5 AND c >= 2 THEN (c - 1) * gl END), 0) AS BIGINT) AS dup5,
       |    CAST(COALESCE(SUM(CASE WHEN n = 10 AND c >= 2 THEN (c - 1) * gl END), 0) AS BIGINT) AS dup10
       |  FROM cnt GROUP BY 1)
       |SELECT gtp.doc_id,
       |  cl2 / nc AS top2_frac, cl3 / nc AS top3_frac, cl4 / nc AS top4_frac,
       |  dup5 / nc AS dup5_frac, dup10 / nc AS dup10_frac,
       |  (cl2 * 5 <= nc AND cl3 * 50 <= nc * 9 AND cl4 * 25 <= nc * 4
       |    AND dup5 * 20 <= nc * 3 AND dup10 * 10 <= nc) AS keep
       |FROM gtp JOIN gdp ON gdp.doc_id = gtp.doc_id ORDER BY gtp.doc_id""".stripMargin)

  /** z40: Zipf rank-frequency fit — the corpus-health diagnostic beside
    * z13's heavy hitters: OLS slope of ln(freq) on ln(rank) over the
    * top-200 vocabulary (natural text ≈ −1; a slope near 0 means
    * synthetic/templated text, a cliff means boilerplate domination).
    * Scale: term counts are the map-side-combinable vocab aggregate; the
    * top-200 plans as TakeOrdered (never a vocab sort on one task) and
    * the rank window runs over ≤ 200 rows. ln snapshots at DECIMAL(12,6)
    * so both engines regress on IDENTICAL (x, y); the fit reuses a11's
    * olsAggs (covar/var closed form, 4-dp snapshot). */
  private val z40ZipfFit = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cnt = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n_w"))
      val top = cnt.orderBy(col("n_w").desc, col("term")).limit(200)
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("n_w").desc, col("term"))))
      val xy = top.select(
        log(col("rnk").cast("double")).cast("decimal(12,6)").cast("double").as("x"),
        log(col("n_w").cast("double")).cast("decimal(12,6)").cast("double").as("y"))
      val aggs = Relational.olsAggs(col("x"), col("y")) :+
        count(lit(1)).cast("int").as("n_terms")
      xy.agg(aggs.head, aggs.tail: _*)
    },
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      |c AS (SELECT term, COUNT(*) AS n_w FROM w GROUP BY 1),
      |top AS (SELECT term, n_w, ROW_NUMBER() OVER (ORDER BY n_w DESC, term) AS rnk
      |  FROM c ORDER BY n_w DESC, term LIMIT 200),
      |xy AS (SELECT
      |    CAST(CAST(ln(CAST(rnk AS DOUBLE)) AS DECIMAL(12,6)) AS DOUBLE) AS x,
      |    CAST(CAST(ln(CAST(n_w AS DOUBLE)) AS DECIMAL(12,6)) AS DOUBLE) AS y
      |  FROM top)
      |SELECT ROUND(CAST(covar_samp(x, y) / var_samp(x) AS DOUBLE), 4) AS slope,
      |  ROUND(CAST(AVG(y) - (covar_samp(x, y) / var_samp(x)) * AVG(x) AS DOUBLE), 4) AS intercept,
      |  ROUND(CAST(POW(corr(x, y), 2) AS DOUBLE), 4) AS r2,
      |  CAST(COUNT(*) AS INT) AS n_terms
      |FROM xy""".stripMargin)

  /** x9: the operators composed as a real curation pass — exact dedup
    * (keep-first survivors) → token counting → deterministic split →
    * per-(split, lang) corpus stats. One dedup shuffle + one id semi-join
    * + one summary shuffle; the split/token stages are pure expressions
    * fused into the scan. */
  private val x9CurationPipeline = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val keep = Dedup.exactDedup(docs, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      docs.join(keep, Seq("doc_id"), "left_semi")
        .withColumn("split", Sampling.splitAssign(col("doc_id"), 80, 10))
        .withColumn("ws_tokens", size(split(col("text"), " ")))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("ws_tokens")).as("total_tokens"))
        .orderBy("split", "lang")
    },
    """WITH keep AS (
      |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      |surv AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
      |t AS (SELECT lang,
      |        CAST(len(string_split(text, ' ')) AS INT) AS ws,
      |        ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
      |      FROM surv)
      |SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
      |            ELSE 'test' END AS split,
      |  lang, COUNT(*) AS n_docs, CAST(SUM(ws) AS BIGINT) AS total_tokens
      |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** x9b: NEAR-dup curation end-to-end — the x9 composition with the full
    * near-dup machinery in place of exact hashing: LSH candidates (capped)
    * → connected components → keep each cluster's survivor → split →
    * per-(split, lang) corpus stats. This is the representative 100-TB
    * corpus build: every stage is the bucketed/bounded form, and the
    * oracle replays the whole DAG including the recursive reachability
    * fixpoint. */
  private val x9bNeardupCuration = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.lshCandidates(minhashSig(s, d), "doc_id", 8,
        maxBucket = Some(X2MaxBucket))
      val survivors = Dedup.connectedComponents(pairs, docs, "doc_id")
        .filter(col("doc_id") === col("cluster_id"))
        .select("doc_id")
      docs.join(survivors, Seq("doc_id"), "left_semi")
        .withColumn("split", Sampling.splitAssign(col("doc_id"), 80, 10))
        .withColumn("ws_tokens", size(split(col("text"), " ")))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("ws_tokens")).as("total_tokens"))
        .orderBy("split", "lang")
    },
    s"""WITH RECURSIVE $componentsCtes,
       |surv AS (
       |  SELECT d.* FROM documents d
       |  LEFT JOIN comp ON d.doc_id = comp.node
       |  WHERE COALESCE(comp.cid, d.doc_id) = d.doc_id),
       |t AS (SELECT lang,
       |        CAST(len(string_split(text, ' ')) AS INT) AS ws,
       |        ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
       |      FROM surv)
       |SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
       |            ELSE 'test' END AS split,
       |  lang, COUNT(*) AS n_docs, CAST(SUM(ws) AS BIGINT) AS total_tokens
       |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** z6: stratified per-source cap — at most N docs per source, selected
    * by md5 order (deterministic "random" subset per stratum). The
    * balance-the-corpus curation op, on the salted groupedTopK path so a
    * low-cardinality source column never funnels a whole stratum through
    * one window task (the oracle replays the naive window — identical
    * rows by groupedTopK's exactness contract). */
  private val z6StratifiedCap = Q(
    (s, d) => Sampling.capPerGroup(Tables.documents(s, d),
        col("source"), col("doc_id"), 50)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        min(col("doc_id")).as("min_kept_id"))
      .orderBy("source"),
    """WITH capped AS (
      |  SELECT source, doc_id, text, ROW_NUMBER() OVER (
      |    PARTITION BY source
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(length(text)) AS BIGINT) AS total_chars,
      |  MIN(doc_id) AS min_kept_id
      |FROM capped WHERE rn <= 50
      |GROUP BY source ORDER BY source""".stripMargin)

  /** x11: chunk-level exact dedup — repeated-line removal generalized to
    * 20-word windows (keep the first occurrence of every duplicated chunk,
    * flag the rest). The winner choice is a map-side-combinable min-struct
    * aggregate, so a boilerplate chunk duplicated across the whole corpus
    * never concentrates on one task. The oracle replays the same keep-first
    * rule with a window over the chunk hash. */
  private val x11ChunkDedup = Q(
    (s, d) => Dedup.chunkDedup(Tables.documents(s, d), "doc_id", "text", 20)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_chunks"),
        sum(when(col("kept"), 1).otherwise(0)).cast("int").as("n_kept"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0)).cast("bigint")
          .as("kept_tokens"))
      .orderBy("doc_id"),
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |ch AS (SELECT doc_id, l,
      |         unnest(generate_series(0, (len(l) - 1) // 20)) AS chunk_id
      |       FROM ws),
      |c AS (SELECT doc_id, chunk_id,
      |        len(list_slice(l, chunk_id * 20 + 1, chunk_id * 20 + 20)) AS n_tokens,
      |        md5(array_to_string(list_slice(l, chunk_id * 20 + 1, chunk_id * 20 + 20), ' ')) AS chash
      |      FROM ch),
      |r AS (SELECT *, ROW_NUMBER() OVER (
      |        PARTITION BY chash ORDER BY doc_id, chunk_id) AS rn FROM c)
      |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_chunks,
      |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
      |  CAST(SUM(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
      |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin)

  /** z13: per-language token heavy hitters (top-10) — the vocab report a
    * corpus build runs to pick stopword/cap lists. One map-side-combinable
    * count shuffle; the rank window sees only the vocab-sized aggregate. */
  private val z13HeavyHitters = Q(
    (s, d) => TextAnalysis.heavyHitters(Tables.documents(s, d), "lang", "text", 10)
      .orderBy("lang", "rnk"),
    """WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
      |c AS (SELECT lang, term, COUNT(*) AS n FROM w GROUP BY 1, 2),
      |r AS (SELECT lang, term, n, CAST(ROW_NUMBER() OVER (
      |        PARTITION BY lang ORDER BY n DESC, term) AS INT) AS rnk FROM c)
      |SELECT lang, term, n, rnk FROM r WHERE rnk <= 10
      |ORDER BY lang, rnk""".stripMargin)

  /** z16: quality deciles — per-language decile bucketing over a
    * deterministic total order (n_chars, doc_id tiebreaker), the
    * "keep the top-N quality deciles" curation selector. NOT the
    * `ntile(10) over (partition by lang ...)` window: `lang` is
    * low-cardinality, so that form sorts each language's ENTIRE corpus on
    * one task — the two-pass `Relational.groupedNtile` computes the
    * identical bucket ids (NTILE's exact ceil/floor split, gate-matched
    * against DuckDB's NTILE) with only bounded per-partition sorts. */
  private val z16QualityDeciles = Q(
    (s, d) => {
      Relational.groupedNtile(
          Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
          groups = Seq("lang"), order = Seq("n_chars", "doc_id"),
          n = 10, out = "decile")
        .groupBy("lang", "decile")
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("lang", "decile")
    },
    """WITH t AS (SELECT lang, n_chars,
      |    CAST(NTILE(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS INT) AS decile
      |  FROM documents)
      |SELECT lang, decile, COUNT(*) AS n_docs,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** z36: CCNet-style perplexity banding — the published head/middle/tail
    * split (Wenzek et al., CCNet): score every document with the corpus
    * LM (z15's unigram stage — the pipeline's cheapest perplexity proxy;
    * z23's backoff chain drops in at the same seam), then cut each
    * LANGUAGE into three equal bands by score. "Keep head+middle, drop
    * tail" is the crawl-filtering policy those pipelines ship.
    *
    * Scale: banding per language is exactly the z16 trap — `ntile(3)
    * over (partition by lang ...)` would sort each language's whole
    * corpus on one task, so the split rides `Relational.groupedNtile`
    * (range-partitioned two-pass, bit-identical to SQL NTILE). Scoring
    * keeps z15's discipline: ln snapshots at DECIMAL(12,6), exact-decimal
    * per-doc sums, one IEEE division at the boundary — so the band order
    * (avg_logprob, doc_id) is deterministic in both engines. Ascending
    * logprob puts the worst docs in bucket 1: tail/middle/head. */
  private val z36PerplexityBuckets = Q(
    (s, d) => {
      val w = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("term"))
      val cnt = w.groupBy("term").agg(count(lit(1)).as("n_w"))
      val tot = w.agg(count(lit(1)).as("n_tot"))
      // unigram table unhinted (vocabulary grows with the corpus — z15's rule)
      val perDoc = w.join(cnt, Seq("term"))
        .crossJoin(broadcast(tot))
        .withColumn("lp",
          log(col("n_w").cast("double") / col("n_tot")).cast("decimal(12,6)"))
        .groupBy("doc_id", "lang")
        .agg((sum(col("lp")).cast("double") / count(lit(1))).as("avg_logprob"))
      Relational.groupedNtile(perDoc, groups = Seq("lang"),
          order = Seq("avg_logprob", "doc_id"), n = 3, out = "bucket")
        .withColumn("band", when(col("bucket") === 3, "head")
          .when(col("bucket") === 2, "middle").otherwise("tail"))
        .groupBy("lang", "bucket", "band")
        .agg(count(lit(1)).as("n_docs"),
          min(col("avg_logprob")).as("min_lp"),
          max(col("avg_logprob")).as("max_lp"))
        .orderBy("lang", "bucket")
    },
    """WITH w AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents),
      |cnt AS (SELECT term, COUNT(*) AS n_w FROM w GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_tot FROM cnt),
      |pd AS (SELECT doc_id, lang,
      |    CAST(SUM(CAST(ln(CAST(n_w AS DOUBLE) / n_tot) AS DECIMAL(12,6))) AS DOUBLE)
      |      / COUNT(*) AS avg_logprob
      |  FROM w JOIN cnt USING (term) CROSS JOIN tot GROUP BY 1, 2),
      |t AS (SELECT lang, avg_logprob,
      |    CAST(NTILE(3) OVER (PARTITION BY lang ORDER BY avg_logprob, doc_id) AS INT) AS bucket
      |  FROM pd)
      |SELECT lang, bucket,
      |  CASE WHEN bucket = 3 THEN 'head' WHEN bucket = 2 THEN 'middle' ELSE 'tail' END AS band,
      |  COUNT(*) AS n_docs, MIN(avg_logprob) AS min_lp, MAX(avg_logprob) AS max_lp
      |FROM t GROUP BY 1, 2, 3 ORDER BY lang, bucket""".stripMargin)

  /** z18: lexical diversity — type-token ratio and hapax fraction, the
    * repetition-adjacent quality features (a low TTR flags word-salad
    * spam; a low hapax fraction flags template text). Per-(doc, term)
    * counts shuffle once on the doc-term key; every ratio is one int/int
    * division — bit-identical across engines. */
  /** Shared z18/x17 stage: per-(doc, term) counts — one shuffle on the
    * doc-term key. */
  private def termCounts(docs: org.apache.spark.sql.DataFrame) =
    docs // no fanOut: word-split explode is cheap, the A/B showed z18 −0.3 s with it
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))

  private val z18LexicalStats = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      termCounts(Tables.documents(s, d))
        .groupBy("doc_id")
        .agg(sum(col("cnt")).cast(LongType).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sum(when(col("cnt") === 1, 1).otherwise(0)).cast(LongType).as("n_hapax"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          (col("n_distinct") / col("n_tokens")).as("ttr"),
          (col("n_hapax") / col("n_distinct")).as("hapax_ratio"))
        .orderBy("doc_id")
    },
    """WITH tc AS (
      |  SELECT doc_id, term, COUNT(*) AS cnt
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |  GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |    CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      |  FROM tc GROUP BY 1)
      |SELECT doc_id, n_tokens, n_distinct,
      |  n_distinct / n_tokens AS ttr,
      |  n_hapax / n_distinct AS hapax_ratio
      |FROM agg ORDER BY doc_id""".stripMargin)

  /** z19: sequence packing — concat-then-chunk the corpus into fixed-size
    * training bins (2048 whitespace tokens): every LM data pipeline's last
    * step before tokenized shards. A document's bin is the bin its FIRST
    * token lands in under a deterministic corpus order, i.e.
    * `cum_tokens_before DIV 2048` — which needs a GLOBAL running sum. The
    * window form (`sum over (order by ...)`) funnels the entire corpus
    * through one task; `Relational.runningTotal` computes the identical
    * integer-exact values with the two-pass offset technique (bounded
    * per-partition sorts only). Output: per-bin doc count, token count,
    * and id span — integer-exact, hash-matched against DuckDB's window
    * replay. */
  private val z19SequencePack = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("toks"))
      Relational.runningTotal(docs, Seq("doc_id"), "toks", "cum")
        .withColumn("bin", expr("(cum - toks) DIV 2048").cast("int"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("bin_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy("bin")
    },
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks FROM documents),
      |c AS (SELECT doc_id, toks, SUM(toks) OVER (
      |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM t)
      |SELECT CAST((cum - toks) // 2048 AS INT) AS bin,
      |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS bin_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)

  /** z64: PACKED-SEQUENCE SEGMENT MAP — the artifact z19/z60 reason
    * ABOUT, actually emitted: under the deterministic corpus order the
    * token stream concat-and-chunks into L=512 bins, and each document
    * decomposes into its per-bin SEGMENTS (seq_id, seg_idx, offset in
    * sequence, length) — exactly the map a dataloader needs to build
    * attention masks and position ids without re-reading text, and the
    * reverse index the takedown pipeline needs at training-shard
    * granularity ("which packed sequences contain doc X" — x44's
    * question after packing has smeared documents across bins). One
    * distributed prefix sum ([[Relational.runningTotal]]'s two-pass
    * shape — no global sort ever), then everything is IN-SCAN: the
    * explode fans out by the doc's own bin span (toks/L + 1), the
    * offset/length arithmetic is pure row expressions, and the only
    * shuffle in the whole query is the prefix sum's range partition. */
  private val z64PackedSegments = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{IntegerType, LongType}
      val L = 512L
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("toks"))
        .filter(col("toks") > 0)
      Relational.runningTotal(docs, Seq("doc_id"), "toks", "cum")
        .withColumn("strt", col("cum") - col("toks"))
        .withColumn("first_bin", expr(s"strt DIV $L"))
        .withColumn("last_bin", expr(s"(cum - 1) DIV $L"))
        .withColumn("seq_id", explode(expr("sequence(first_bin, last_bin)")))
        .withColumn("seg_idx", (col("seq_id") - col("first_bin")).cast(IntegerType))
        .withColumn("seq_offset",
          greatest(col("strt") - col("seq_id") * L, lit(0L)).cast(LongType))
        .withColumn("seg_len",
          (least(col("cum"), (col("seq_id") + 1) * L)
            - greatest(col("strt"), col("seq_id") * L)).cast(LongType))
        .withColumn("straddle", col("last_bin") > col("first_bin"))
        .select("doc_id", "seq_id", "seg_idx", "seq_offset", "seg_len", "straddle")
        .orderBy("seq_id", "seq_offset", "doc_id")
    },
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks FROM documents
      |  WHERE len(string_split(text, ' ')) > 0),
      |c AS (SELECT doc_id, toks, CAST(SUM(toks) OVER (
      |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS cum
      |  FROM t),
      |b AS (SELECT doc_id, toks, cum, cum - toks AS strt,
      |    (cum - toks) // 512 AS first_bin, (cum - 1) // 512 AS last_bin FROM c),
      |e AS (SELECT doc_id, cum, strt, first_bin, last_bin,
      |    unnest(generate_series(first_bin, last_bin)) AS seq_id FROM b)
      |SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
      |  CAST(seq_id - first_bin AS INT) AS seg_idx,
      |  CAST(GREATEST(strt - seq_id * 512, 0) AS BIGINT) AS seq_offset,
      |  CAST(LEAST(cum, (seq_id + 1) * 512)
      |    - GREATEST(strt, seq_id * 512) AS BIGINT) AS seg_len,
      |  last_bin > first_bin AS straddle
      |FROM e ORDER BY seq_id, seq_offset, doc_id""".stripMargin)

  /** z65: BOUNDARY-RESPECTING PACKING cost — the OTHER packing policy,
    * priced against z19/z64's concat-and-chunk: when cross-document
    * attention is forbidden (no attention masking tricks), bins hold
    * whole documents and the slack is PADDING — wasted compute. The
    * policy here is greedy next-fit inside fixed 100-doc work units
    * (seg = doc_id DIV 100): next-fit is inherently sequential (bin fill
    * is carried state, not an associative prefix), so the scale shape is
    * "embarrassingly parallel across bounded work units, one HOF fold
    * within each" — z49's Viterbi discipline; the unit boundary is a
    * DATA rule (not a partition accident), so the result is
    * deterministic and the oracle can replay the identical fold as a
    * 100-deep recursive CTE. Oversized docs (> L) take ⌈t/L⌉ dedicated
    * bins (integer ceiling, no float boundary). Per unit: bins used,
    * padding = bins·L − Σtokens (conservation — all unused space is
    * padding), and the ⌈Σtokens/L⌉ lower bound, so the panel reads the
    * policy's measured overhead vs concat packing's zero waste. */
  private val z65BoundaryPacking = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val L = 2048L
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("toks"))
        .withColumn("seg", expr("doc_id DIV 100"))
      docs.groupBy("seg")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("seg_tokens"),
          expr(s"""aggregate(
            transform(array_sort(collect_list(struct(doc_id, toks))),
              x -> x.toks),
            named_struct('bins', CAST(0 AS BIGINT), 'fill', CAST($L AS BIGINT)),
            (acc, t) -> CASE
              WHEN t <= $L - acc.fill THEN
                named_struct('bins', acc.bins, 'fill', acc.fill + t)
              WHEN t <= $L THEN
                named_struct('bins', acc.bins + CAST(1 AS BIGINT), 'fill', t)
              ELSE named_struct('bins',
                acc.bins + (t + ${L - 1}) DIV $L, 'fill', CAST($L AS BIGINT))
              END).bins""").as("n_bins"))
        .withColumn("padding", col("n_bins") * L - col("seg_tokens"))
        .withColumn("lower_bound",
          expr(s"(seg_tokens + ${L - 1}) DIV $L").cast(LongType))
        .select("seg", "n_docs", "seg_tokens", "n_bins", "padding", "lower_bound")
        .orderBy("seg")
    },
    """WITH RECURSIVE t AS (SELECT doc_id, doc_id // 100 AS seg,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks FROM documents),
      |di AS (SELECT seg, toks, ROW_NUMBER() OVER (
      |    PARTITION BY seg ORDER BY doc_id) AS idx FROM t),
      |sg AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(toks) AS BIGINT) AS seg_tokens,
      |    CAST(MAX(idx) AS BIGINT) AS n FROM di GROUP BY 1),
      |rec(seg, idx, bins, fill) AS (
      |  SELECT seg, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(2048 AS BIGINT)
      |  FROM sg
      |  UNION ALL
      |  SELECT r.seg, r.idx + 1,
      |    CASE WHEN d.toks <= 2048 - r.fill THEN r.bins
      |         WHEN d.toks <= 2048 THEN r.bins + 1
      |         ELSE r.bins + (d.toks + 2047) // 2048 END,
      |    CASE WHEN d.toks <= 2048 - r.fill THEN r.fill + d.toks
      |         WHEN d.toks <= 2048 THEN d.toks
      |         ELSE CAST(2048 AS BIGINT) END
      |  FROM rec r JOIN di d ON d.seg = r.seg AND d.idx = r.idx + 1)
      |SELECT sg.seg, sg.n_docs, sg.seg_tokens,
      |  CAST(rec.bins AS BIGINT) AS n_bins,
      |  CAST(rec.bins * 2048 - sg.seg_tokens AS BIGINT) AS padding,
      |  CAST((sg.seg_tokens + 2047) // 2048 AS BIGINT) AS lower_bound
      |FROM sg JOIN rec ON rec.seg = sg.seg AND rec.idx = sg.n
      |ORDER BY sg.seg""".stripMargin)

  /** z14: hashing-trick linear quality classifier — fastText-shaped scoring
    * as a zero-shuffle fold inside the scan. Scores are sums of exact
    * rationals in a fixed fold order (bit-identical across engines); the
    * keep gate thresholds at 0. */
  /** DuckDB rendering of TextAnalysis.classifierScore over a string-list
    * expression — ONE definition shared by the z14 and x13 oracles. */
  private def classifierScoreSql(wExpr: String): String =
    s"""list_reduce(list_transform($wExpr,
       |      t -> (${h32Sql(s"'w' || CAST((${h32Sql("t")} % ${TextAnalysis.ClassifierDim}) AS VARCHAR)")} % 2001 - 1000) / CAST(1000 AS DOUBLE)),
       |    (acc, x) -> acc + x)""".stripMargin

  private val z14QualityClassifier = Q(
    (s, d) => Tables.documents(s, d)
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), size(col("ws")).as("n_tokens"),
        TextAnalysis.classifierScore("ws").as("score"))
      .withColumn("keep", col("score") > 0)
      .orderBy("doc_id"),
    s"""WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sc AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
       |  ${classifierScoreSql("w")} AS score
       |  FROM s)
       |SELECT doc_id, n_tokens, score, score > CAST(0 AS DOUBLE) AS keep
       |FROM sc ORDER BY doc_id""".stripMargin)

  /** z45: classifier threshold sweep — the keep-rate curve a corpus build
    * reads before picking z14's gate threshold (production tunes the
    * cutoff to a target retention, not the other way around). Each doc's
    * hashing-trick score is computed ONCE in-scan; the sweep explodes a
    * constant 11-threshold ladder per doc — a map-local blowup that
    * collapses to thresholds × partitions rows under the combinable
    * count, so the shuffle carries 11 keys at any corpus size. The
    * verdict `score > t` is one IEEE comparison of exact-fold doubles —
    * engine-stable; keep_frac is one raw division at the boundary. */
  private val z45ThresholdSweep = Q(
    (s, d) => {
      val sc0 = Tables.documents(s, d)
        .withColumn("ws", split(col("text"), " "))
        .select(col("doc_id"), TextAnalysis.classifierScore("ws").as("score"))
      val tot = sc0.agg(count(lit(1)).as("n_total"))
      sc0.select(explode(sequence(lit(-5), lit(5))).as("t"), col("score"))
        .groupBy("t")
        .agg(sum(when(col("score") > col("t").cast("double"), 1L).otherwise(0L))
          .as("n_keep"))
        .crossJoin(broadcast(tot))
        .select(col("t").cast("int").as("t"), col("n_keep"),
          (col("n_keep") / col("n_total")).as("keep_frac"))
        .orderBy("t")
    },
    s"""WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sc AS (SELECT doc_id, ${classifierScoreSql("w")} AS score FROM s),
       |tt AS (SELECT unnest(generate_series(-5, 5)) AS t),
       |tot AS (SELECT COUNT(*) AS n_total FROM sc)
       |SELECT CAST(t AS INT) AS t,
       |  CAST(SUM(CASE WHEN score > CAST(t AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |  CAST(SUM(CASE WHEN score > CAST(t AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT)
       |    / n_total AS keep_frac
       |FROM sc CROSS JOIN tt CROSS JOIN tot
       |GROUP BY t, n_total ORDER BY t""".stripMargin)

  /** z15: unigram LM log-prob scoring — the cheap perplexity-style quality
    * filter: p(w) from corpus counts (one map-side-combinable pass), doc
    * score = mean token log-prob. The vocab-sized count table broadcasts
    * into the scoring join. Per the cross-engine float rules: each
    * transcendental ln snapshots to an exact DECIMAL(12,6) (engine-stable
    * cast), the per-doc SUM is exact decimal (shuffle-order-independent —
    * a float sum here would hash-drift run to run), and the mean is one
    * raw IEEE division at the DOUBLE output boundary. */
  private val z15UnigramLogprob = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val w = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val cnt = w.groupBy("term").agg(count(lit(1)).as("n_w"))
      // n_tot = total token count — counting w directly avoids re-running
      // the corpus-wide term aggregation just to sum it back up.
      // The unigram table is vocabulary-sized (Heaps' law — grows with
      // the corpus) so it joins UNHINTED; only the one-row total is hinted
      val tot = w.agg(count(lit(1)).as("n_tot"))
      w.join(cnt, Seq("term"))
        .crossJoin(broadcast(tot))
        .withColumn("lp",
          log(col("n_w").cast("double") / col("n_tot")).cast("decimal(12,6)"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_tokens"),
          (sum(col("lp")).cast("double") / count(lit(1))).as("avg_logprob"))
        .orderBy("doc_id")
    },
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |cnt AS (SELECT term, COUNT(*) AS n_w FROM w GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_tot FROM cnt)
      |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
      |  CAST(SUM(CAST(ln(CAST(n_w AS DOUBLE) / n_tot) AS DECIMAL(12,6))) AS DOUBLE) / COUNT(*) AS avg_logprob
      |FROM w JOIN cnt USING (term) CROSS JOIN tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin)

  /** z17: bigram LM log-prob scoring — z15's unigram filter upgraded to
    * conditional probabilities P(cur|prev) = n(prev,cur)/n(prev,·): word
    * salads that pass a unigram filter (right vocabulary, wrong order)
    * score low here. Same engine-stability discipline as z15: one int/int
    * division and one ln per DISTINCT bigram, snapshot at DECIMAL(12,6),
    * exact-decimal per-doc sum, single division at the boundary. Scale:
    * the bigram table is vocab²-bounded only formally — a real web
    * corpus's OBSERVED-bigram table grows with the corpus (billions of
    * rows), so the joins carry NO broadcast hint: AQE broadcasts them
    * while they fit and degrades to a shuffle join when they don't
    * (a forced hint would OOM the driver at 100 TB). The corpus sees one
    * map-side explode and one groupBy on doc_id either way. */
  /** Shared z17/x17 stage: per-token-position bigram log-probs — the
    * (doc_id, lp) relation both the declared scorer and the curation gate
    * aggregate, ONE definition so the conditional-probability model can
    * never drift between them. */
  private def bigramScored(docs: org.apache.spark.sql.DataFrame) = {
    val bg = bigramTokens(docs)
    val bcnt = bg.groupBy("prev", "cur").agg(count(lit(1)).as("n_bg"))
    val pcnt = bg.groupBy("prev").agg(count(lit(1)).as("n_prev"))
    bg.join(bcnt, Seq("prev", "cur"))
      .join(pcnt, Seq("prev"))
      .withColumn("lp",
        log(col("n_bg").cast("double") / col("n_prev")).cast("decimal(12,6)"))
      .select("doc_id", "lp")
  }

  private val z17BigramLogprob = Q(
    (s, d) => bigramScored(Tables.documents(s, d))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        (sum(col("lp")).cast("double") / count(lit(1))).as("avg_logprob"))
      .orderBy("doc_id"),
    """WITH wl AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
      |        FROM wl WHERE len(l) >= 2),
      |bg AS (SELECT doc_id, l[i] AS prev, l[i+1] AS cur FROM pos),
      |bcnt AS (SELECT prev, cur, COUNT(*) AS n_bg FROM bg GROUP BY 1, 2),
      |pcnt AS (SELECT prev, COUNT(*) AS n_prev FROM bg GROUP BY 1)
      |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bigrams,
      |  CAST(SUM(CAST(ln(CAST(n_bg AS DOUBLE) / n_prev) AS DECIMAL(12,6))) AS DOUBLE)
      |    / COUNT(*) AS avg_logprob
      |FROM bg JOIN bcnt USING (prev, cur) JOIN pcnt USING (prev)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin)

  /** z38: interpolated Kneser–Ney bigram scoring — the smoothing rung the
    * LM ladder (z15 unigram → z17 raw bigram → z23 Stupid Backoff) was
    * missing, and the one real perplexity-filter deployments actually use
    * (KenLM's default). P(w2|w1) = max(c(w1w2)−d, 0)/c(w1) +
    * d·N1+(w1·)/c(w1) · N1+(·w2)/N1+(··) with the standard d = 0.75: the
    * continuation probability scores how many CONTEXTS a word completes,
    * not how often it occurs — the "San Francisco" correction.
    *
    * Numerics: d is dyadic so every product against exact counts is
    * exact; the probability is 4 pinned IEEE ops (both engines parse the
    * identical tree), ln snapshots at DECIMAL(12,6) and sums exactly
    * (z15/z17 discipline). Scale: the four count tables are all
    * vocabulary-or-bigram-space sized (Heaps' law — they grow with the
    * corpus) so every join is UNHINTED per the z17 rule; only the one-row
    * distinct-bigram total is hinted. Scoring is one explode + four
    * combinable aggregates + equi-joins keyed on words. */
  /** Per-position bigram token stream (doc_id, prev, cur) — the shared
    * first stage of every bigram-LM rung (z17/z38/z41); see
    * [[graft.operators.Lm.bigramTokens]]. */
  private def bigramTokens(docs: org.apache.spark.sql.DataFrame) =
    graft.operators.Lm.bigramTokens(docs) // no fanOut: z17/z38 regressed with it

  /** Per-doc interpolated-KN bigram scores — shared by z38 (the declared
    * panel) and x32 (the v5 curation composition's perplexity gate).
    * Returns (doc_id, n_bigrams, avg_kn_logprob); docs under 2 words are
    * absent. Numerics and scale notes on z38. */
  private def knScored(docs: org.apache.spark.sql.DataFrame) = {
    val bg = bigramTokens(docs)
    val bcnt = bg.groupBy("prev", "cur").agg(count(lit(1)).as("n_bg"))
    val pcnt = bg.groupBy("prev").agg(count(lit(1)).as("n_prev"))
    val n1fwd = bcnt.groupBy("prev").agg(count(lit(1)).as("n1_fwd"))
    val n1bwd = bcnt.groupBy("cur").agg(count(lit(1)).as("n1_bwd"))
    val n1tot = bcnt.agg(count(lit(1)).as("n1_tot"))
    bg.join(bcnt, Seq("prev", "cur"))
      .join(pcnt, Seq("prev"))
      .join(n1fwd, Seq("prev"))
      .join(n1bwd, Seq("cur"))
      .crossJoin(broadcast(n1tot))
      .withColumn("pkn",
        greatest(col("n_bg").cast("double") - lit(0.75), lit(0.0)) / col("n_prev")
          + (lit(0.75) * col("n1_fwd") / col("n_prev"))
            * (col("n1_bwd") / col("n1_tot")))
      .withColumn("lp", log(col("pkn")).cast("decimal(12,6)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        (sum(col("lp")).cast("double") / count(lit(1))).as("avg_kn_logprob"))
  }

  private val z38KneserNey = Q(
    (s, d) => knScored(Tables.documents(s, d)).orderBy("doc_id"),
    """WITH wl AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
      |        FROM wl WHERE len(l) >= 2),
      |bg AS (SELECT doc_id, l[i] AS prev, l[i+1] AS cur FROM pos),
      |bcnt AS (SELECT prev, cur, COUNT(*) AS n_bg FROM bg GROUP BY 1, 2),
      |pcnt AS (SELECT prev, COUNT(*) AS n_prev FROM bg GROUP BY 1),
      |nf AS (SELECT prev, COUNT(*) AS n1_fwd FROM bcnt GROUP BY 1),
      |nb AS (SELECT cur, COUNT(*) AS n1_bwd FROM bcnt GROUP BY 1),
      |nt AS (SELECT COUNT(*) AS n1_tot FROM bcnt),
      |p AS (SELECT doc_id,
      |    CAST(ln(
      |      greatest(CAST(n_bg AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE)) / n_prev
      |      + (CAST(0.75 AS DOUBLE) * n1_fwd / n_prev)
      |        * (CAST(n1_bwd AS DOUBLE) / n1_tot)
      |    ) AS DECIMAL(12,6)) AS lp
      |  FROM bg JOIN bcnt USING (prev, cur) JOIN pcnt USING (prev)
      |    JOIN nf USING (prev) JOIN nb USING (cur) CROSS JOIN nt)
      |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bigrams,
      |  CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_kn_logprob
      |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin)

  /** The fitted KN bigram model is ONE table: the (prev, cur, n_bg)
    * counts — every other statistic the interpolated-KN formula needs
    * (c(w1·), N1+(w1·), N1+(·w2), N1+(··), |continuation vocab|) is an
    * AGGREGATE of it, so persisting bcnt alone IS the model (exactly what
    * count-based LM toolkits serialize). Built from the TRAIN split and
    * written through the Store partitioned by a prev-hash shard (8-way —
    * key-hash sharding is how a billion-row bigram table co-locates with
    * its scorer join), then read back: the serve side never re-derives
    * counts from training text. One build per (session, input dir) —
    * y3d's cache-and-shutdown-hook discipline, same plan-only escape for
    * the registry-wide plan sweeps. */
  private val z41Built = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()

  private def knBigramCounts(docs: org.apache.spark.sql.DataFrame) =
    graft.operators.Lm.bigramCounts(docs)

  private def knModelStored(s: SparkSession, d: String) =
    z41Built.computeIfAbsent(s"${s.sparkContext.applicationId}:$d", _ => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
        s"kn_model_${s.sparkContext.applicationId}_${Integer.toHexString(d.hashCode)}"
      val store = graft.sources.Store(s, path, "part")
      store.destroy()
      store.append(knBigramCounts(
          Tables.documents(s, d).filter(col("doc_id") % 2 === 0))
        .withColumn("part", pmod(hash(col("prev")), lit(8))))
      sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
      store.read.drop("part")
    })

  /** Score `docs` against a FITTED bigram count model (training text not
    * required — the production shape of CCNet-style perplexity filtering,
    * where the LM trains on a clean reference corpus and scores the
    * crawl). Unlike [[knScored]]'s within-corpus inner joins, every model
    * join is LEFT, so unseen events stay representable:
    *   - unseen bigram, seen prev: the max(c−d,0) term is 0 and the
    *     score is the backoff mass d·N1+(w1·)/c(w1·) times the
    *     continuation probability — interpolated KN's own floor;
    *   - unseen prev (no backoff mass defined): the continuation
    *     probability alone;
    *   - unseen cur: the continuation probability rides an add-one floor,
    *     Pc(w2) = (N1+(·w2)+1)/(N1+(··)+V) — strictly positive for any
    *     input token, so ln never sees 0.
    * Numerics: same z38 discipline (d=0.75 dyadic, pinned IEEE tree, ln
    * at DECIMAL(12,6), exact-decimal sums). Scale: model aggregates are
    * model-sized and UNHINTED (z17 rule — a web-scale bigram table must
    * not be forced to broadcast); the corpus pays one explode and three
    * left equi-joins; only the one-row totals broadcast by hint. Emits
    * n_unseen (bigrams absent from the model) beside the score — the
    * coverage diagnostic a production filter monitors for domain drift. */
  private def knHeldoutScored(model: org.apache.spark.sql.DataFrame,
                              docs: org.apache.spark.sql.DataFrame) =
    graft.operators.Lm.heldoutScored(model, docs)

  /** DuckDB CTE chain replaying [[knHeldoutScored]] over a train/score
    * doc split — shared by the z41 oracle and the x32b banding gate so
    * the held-out scoring semantics can never drift between them.
    * `trainPred`/`scorePred` are SQL predicates over `documents`. */
  private def knHeldoutCtes(trainPred: String, scorePred: String): String =
    s"""ktr AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |  WHERE $trainPred),
       |ktpos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
       |  FROM ktr WHERE len(l) >= 2),
       |ktbg AS (SELECT l[i] AS prev, l[i+1] AS cur FROM ktpos),
       |kbcnt AS (SELECT prev, cur, COUNT(*) AS n_bg FROM ktbg GROUP BY 1, 2),
       |kps AS (SELECT prev, CAST(SUM(n_bg) AS BIGINT) AS n_prev,
       |    COUNT(*) AS n1_fwd FROM kbcnt GROUP BY 1),
       |knb AS (SELECT cur, COUNT(*) AS n1_bwd FROM kbcnt GROUP BY 1),
       |knt AS (SELECT COUNT(*) AS n1_tot, COUNT(DISTINCT cur) AS v_cont FROM kbcnt),
       |kte AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |  WHERE $scorePred),
       |kpos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
       |  FROM kte WHERE len(l) >= 2),
       |kbg AS (SELECT doc_id, l[i] AS prev, l[i+1] AS cur FROM kpos),
       |ksc AS (SELECT doc_id, b.n_bg, p.n_prev, p.n1_fwd, knb.n1_bwd,
       |    knt.n1_tot, knt.v_cont
       |  FROM kbg LEFT JOIN kbcnt b USING (prev, cur)
       |  LEFT JOIN kps p USING (prev) LEFT JOIN knb USING (cur) CROSS JOIN knt),
       |klp AS (SELECT doc_id, n_bg,
       |    CAST(ln(CASE WHEN n_prev IS NULL
       |      THEN (COALESCE(n1_bwd, 0) + 1) / (n1_tot + v_cont)
       |      ELSE greatest(CAST(COALESCE(n_bg, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE),
       |          CAST(0 AS DOUBLE)) / n_prev
       |        + (CAST(0.75 AS DOUBLE) * n1_fwd / n_prev)
       |          * ((COALESCE(n1_bwd, 0) + 1) / (n1_tot + v_cont))
       |    END) AS DECIMAL(12,6)) AS lp
       |  FROM ksc),
       |kout AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bigrams,
       |    CAST(SUM(CASE WHEN n_bg IS NULL THEN 1 ELSE 0 END) AS INT) AS n_unseen,
       |    CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_kn_logprob
       |  FROM klp GROUP BY doc_id)""".stripMargin

  /** z41: HELD-OUT Kneser–Ney perplexity scoring — the train/score
    * separation z38 lacks and the one production perplexity filtering
    * (the CCNet recipe) actually runs: fit the LM on a reference corpus
    * (here the even-doc_id half), PERSIST the count table as a model
    * through the Store, and score a DISJOINT document set (the odd half)
    * off the stored model via left joins, with interpolated KN's own
    * backoff mass covering unseen bigrams and an add-one continuation
    * floor covering unseen words. The oracle replays the split and the
    * whole formula; n_unseen pins the left-join semantics (an inner-join
    * scorer would silently drop those positions). */
  private val z41HeldoutPerplexity = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val model =
        if (planOnly) knBigramCounts(docs.filter(col("doc_id") % 2 === 0))
        else knModelStored(s, d)
      knHeldoutScored(model, docs.filter(col("doc_id") % 2 === 1))
        .orderBy("doc_id")
    },
    s"""WITH ${knHeldoutCtes("doc_id % 2 = 0", "doc_id % 2 = 1")}
       |SELECT doc_id, n_bigrams, n_unseen, avg_kn_logprob
       |FROM kout ORDER BY doc_id""".stripMargin)

  /** The classifier features a18 trains on, shared verbatim by z42's
    * train and score sides: length and whitespace-density quality
    * signals, label = "curated source". */
  private def clsFeats(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), col("lang"),
      log(lit(1.0) + col("n_chars")).as("x1"),
      ((length(col("text")) - length(expr("replace(text, ' ', '')")))
        .cast("double") / col("n_chars")).as("x2"),
      col("source").isin("src0", "src3", "src6", "src9").cast("double").as("y"))

  /** Fit the per-lang ridge-IRLS discriminator on the TRAIN half and
    * snapshot the coefficients at DECIMAL(12,4) — the engine-stable
    * granularity both serving sides score with (a18's output precision,
    * applied at the model seam instead of the display boundary). The
    * artifact also carries `cut`, the per-lang MEDIAN train-half eta —
    * the fit-time retention cutoff a serving gate compares against
    * (`EventStreams.discriminatorGate`): a stream cannot rank inside an
    * unbounded corpus, so the threshold must ship WITH the model. */
  private def clsModelFit(docs: org.apache.spark.sql.DataFrame) = {
    val train = clsFeats(docs.filter(col("doc_id") % 2 === 0))
    val beta = Relational.logisticIrls(train, "lang", iters = 4, lambda = 1.0)
      .select(col("lang"),
        col("b0").cast("decimal(12,4)").cast("double").as("b0s"),
        col("b1").cast("decimal(12,4)").cast("double").as("b1s"),
        col("b2").cast("decimal(12,4)").cast("double").as("b2s"))
    train.join(broadcast(beta), Seq("lang"))
      .withColumn("eta",
        col("b0s") + col("b1s") * col("x1") + col("b2s") * col("x2"))
      .groupBy("lang", "b0s", "b1s", "b2s")
      .agg(percentile(col("eta"), lit(0.5)).as("cut"))
  }

  /** The fitted discriminator as a servable artifact (test seam for the
    * streaming gate — same build + Store cache the declared queries use). */
  private[graft] def clsModel(s: SparkSession, d: String) = clsModelStored(s, d)

  private val z42Built = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()

  /** The fitted discriminator persisted through the Store (lang →
    * snapshot coefficients, partitioned by lang) and read back — the
    * serve side never re-derives weights from training text. Same
    * cache-and-shutdown-hook discipline and plan-only escape as z41's
    * bigram model. */
  private def clsModelStored(s: SparkSession, d: String) =
    z42Built.computeIfAbsent(s"${s.sparkContext.applicationId}:$d", _ => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
        s"cls_model_${s.sparkContext.applicationId}_${Integer.toHexString(d.hashCode)}"
      val store = graft.sources.Store(s, path, "part")
      store.destroy()
      store.append(clsModelFit(Tables.documents(s, d))
        .withColumn("part", col("lang")))
      sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
      store.read.drop("part")
    })

  /** z42: FITTED quality classifier — train/score separation for the
    * learned-discriminator gate (the GPT-3/CCNet companion to z41's LM
    * split): a18's ridge-IRLS logistic regression fit per language on the
    * even-doc_id half, coefficients snapshotted at DECIMAL(12,4) and
    * PERSISTED through the Store as the model artifact, then the odd half
    * scored off the stored weights — z14 with learned instead of fixed
    * weights, pointable at data the fit never saw. The keep verdict is
    * `eta > 0` (σ(eta) > ½) on the snapshot coefficients: one fixed-shape
    * IEEE expression of engine-stable inputs, so the counts are integers
    * and need no tolerance; mean_mu rides per-doc DECIMAL(12,6) snapshots
    * (z15's ln/EXP discipline) through an exact sum. Scale: the model is
    * group-cardinality (broadcast is CORRECT here, it cannot grow with
    * the corpus); training is 4 combinable aggregate passes; scoring is
    * one scan of the held-out half. The oracle replays the split, all 4
    * Newton steps (IrlsSql — the SAME renderer a18 uses), the snapshot,
    * and the scoring. */
  private val z42ClassifierFitted = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val model =
        if (planOnly) clsModelFit(docs)
        else clsModelStored(s, d)
      val scored = clsFeats(docs.filter(col("doc_id") % 2 === 1))
        .join(broadcast(model), Seq("lang"))
        .withColumn("eta",
          col("b0s") + col("b1s") * col("x1") + col("b2s") * col("x2"))
        .withColumn("mu", greatest(
          least(lit(1.0) / (lit(1.0) + exp(-col("eta"))), lit(0.999999)),
          lit(1e-6)))
      scored.groupBy("lang").agg(
          count(lit(1)).as("n_scored"),
          sum(when(col("eta") > lit(0.0), 1L).otherwise(0L)).as("n_keep"),
          (sum(col("mu").cast("decimal(12,6)")).cast("double") /
            count(lit(1))).as("mean_mu"))
        .join(model, Seq("lang"))
        .select(col("lang"), col("b0s"), col("b1s"), col("b2s"),
          col("n_scored"), col("n_keep"), col("mean_mu"))
        .orderBy("lang")
    },
    s"""WITH feats AS (
       |  SELECT doc_id, lang,
       |    ln(1.0 + n_chars) AS x1,
       |    CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) / n_chars AS x2,
       |    CAST(source IN ('src0', 'src3', 'src6', 'src9') AS DOUBLE) AS y
       |  FROM documents),
       |tf AS (SELECT lang, x1, x2, y FROM feats WHERE doc_id % 2 = 0),
       |${IrlsSql.ctes("tf", "lang", 4)},
       |model AS (SELECT lang,
       |    CAST(CAST(b0 AS DECIMAL(12,4)) AS DOUBLE) AS b0s,
       |    CAST(CAST(b1 AS DECIMAL(12,4)) AS DOUBLE) AS b1s,
       |    CAST(CAST(b2 AS DECIMAL(12,4)) AS DOUBLE) AS b2s
       |  FROM b4it),
       |sc AS (
       |  SELECT f.lang,
       |    m.b0s + m.b1s * f.x1 + m.b2s * f.x2 AS eta
       |  FROM feats f JOIN model m ON f.lang = m.lang
       |  WHERE f.doc_id % 2 = 1),
       |scm AS (
       |  SELECT lang, eta,
       |    GREATEST(LEAST(1.0 / (1.0 + EXP(-eta)), 0.999999), 0.000001) AS mu
       |  FROM sc),
       |agg AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_scored,
       |    CAST(SUM(CASE WHEN eta > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |    CAST(SUM(CAST(mu AS DECIMAL(12,6))) AS DOUBLE) / COUNT(*) AS mean_mu
       |  FROM scm GROUP BY lang)
       |SELECT m.lang, m.b0s, m.b1s, m.b2s, a.n_scored, a.n_keep, a.mean_mu
       |FROM agg a JOIN model m ON a.lang = m.lang
       |ORDER BY m.lang""".stripMargin)

  /** x32: curation v5 — THIS round's rungs composed as one corpus build,
    * the x9→x21 lineage continued with the production forms: (1) the full
    * Gopher repetition gate (z37's integer-exact verdict), (2) rolling-
    * fingerprint span dedup (x18b's O(n) rung; drop docs that are
    * majority duplicated material, n_dup·2 ≤ n_windows — integer-exact),
    * (3) CCNet-style Kneser–Ney perplexity banding per language (z38's
    * scores through the scale-safe groupedNtile, keep middle+head).
    * Survivors reported per (source, lang). Docs too short to score
    * (< 2 words for Gopher/KN, < 8 for spans) are dropped by the gates —
    * a real pipeline's minimum-length rule falling out of composition.
    * Every gate is a semi-join of combinable aggregates; the only
    * range shuffle is the banding's. */
  /** Shared DuckDB CTE chain for the v5/v5b curation gates: the rolling
    * Gopher keep set (`gkeep`, via `dws`) and the rolling span-dedup keep
    * set (`skeep`) — ONE definition so the x32 and x32b oracles can never
    * drift on the gate semantics. */
  private val x32GateCtes: String =
    s"""dws AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS nc,
       |    string_split(text, ' ') AS ws
       |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
       |gh AS (SELECT doc_id, nc, ws,
       |    list_transform(ws, x -> ${h32Sql("x")}) AS hs FROM dws),
       |gg0 AS (SELECT doc_id, nc, n, ws, hs,
       |    unnest(generate_series(1, len(ws) - n + 1)) AS i
       |  FROM gh CROSS JOIN (VALUES (2), (3), (4), (5), (10)) t(n)
       |  WHERE len(ws) >= n),
       |gg AS (SELECT doc_id, nc, n,
       |    list_reduce(hs[i:i+n-1], (acc, x) -> (acc * 257 + x) % 2147483647) AS fp,
       |    CAST(length(array_to_string(ws[i:i+n-1], ' ')) AS BIGINT) AS gl
       |  FROM gg0),
       |gcnt AS (SELECT doc_id, nc, n, fp, gl, COUNT(*) AS c
       |  FROM gg GROUP BY 1, 2, 3, 4, 5),
       |grk AS (SELECT doc_id, nc, n, c * gl AS cl, ROW_NUMBER() OVER (
       |      PARTITION BY doc_id, n ORDER BY c DESC, c * gl DESC, fp DESC) AS rn
       |  FROM gcnt),
       |gtp AS (SELECT doc_id, ANY_VALUE(nc) AS nc,
       |    COALESCE(MAX(CASE WHEN n = 2 THEN cl END), 0) AS cl2,
       |    COALESCE(MAX(CASE WHEN n = 3 THEN cl END), 0) AS cl3,
       |    COALESCE(MAX(CASE WHEN n = 4 THEN cl END), 0) AS cl4
       |  FROM grk WHERE rn = 1 GROUP BY 1),
       |gdp AS (SELECT doc_id,
       |    CAST(COALESCE(SUM(CASE WHEN n = 5 AND c >= 2 THEN (c - 1) * gl END), 0) AS BIGINT) AS dup5,
       |    CAST(COALESCE(SUM(CASE WHEN n = 10 AND c >= 2 THEN (c - 1) * gl END), 0) AS BIGINT) AS dup10
       |  FROM gcnt GROUP BY 1),
       |gkeep AS (SELECT gtp.doc_id FROM gtp JOIN gdp USING (doc_id)
       |  WHERE cl2 * 5 <= nc AND cl3 * 50 <= nc * 9 AND cl4 * 25 <= nc * 4
       |    AND dup5 * 20 <= nc * 3 AND dup10 * 10 <= nc),
       |shs AS (SELECT doc_id,
       |    list_transform(string_split(text, ' '), x -> ${h32Sql("x")}) AS hs
       |  FROM documents),
       |swin AS (SELECT doc_id,
       |    list_reduce(hs[i:i+7], (acc, h) -> (acc * 257 + h) % 2147483647) * 2147483648
       |      + list_reduce(hs[i:i+7], (acc, h) -> (acc * 263 + h) % 2147483629) AS fp
       |  FROM (SELECT doc_id, hs, unnest(generate_series(1, len(hs) - 7)) AS i
       |        FROM shs WHERE len(hs) >= 8)),
       |spd AS (SELECT doc_id, fp, COUNT(*) AS c FROM swin GROUP BY 1, 2),
       |stot AS (SELECT fp, SUM(c) AS t FROM spd GROUP BY 1),
       |skeep AS (SELECT doc_id FROM spd JOIN stot USING (fp) GROUP BY doc_id
       |  HAVING CAST(SUM(CASE WHEN t >= 2 THEN c ELSE 0 END) AS BIGINT) * 2
       |    <= CAST(SUM(c) AS BIGINT))""".stripMargin

  /** The v5 oracle's KN-banding CTE chain (per-doc within-corpus KN
    * score → per-language NTILE(3) → keep middle+head as `kkeep`) —
    * shared by the x32 and x34 oracles. Reads `dws` from
    * [[x32GateCtes]]. */
  private val x32KnBandCtes: String =
    """pos AS (SELECT doc_id, ws AS l, unnest(generate_series(1, len(ws) - 1)) AS i
      |  FROM dws),
      |bg AS (SELECT doc_id, l[i] AS prev, l[i+1] AS cur FROM pos),
      |bcnt AS (SELECT prev, cur, COUNT(*) AS n_bg FROM bg GROUP BY 1, 2),
      |pcnt AS (SELECT prev, COUNT(*) AS n_prev FROM bg GROUP BY 1),
      |nf AS (SELECT prev, COUNT(*) AS n1_fwd FROM bcnt GROUP BY 1),
      |nb AS (SELECT cur, COUNT(*) AS n1_bwd FROM bcnt GROUP BY 1),
      |nt AS (SELECT COUNT(*) AS n1_tot FROM bcnt),
      |p AS (SELECT doc_id,
      |    CAST(ln(
      |      greatest(CAST(n_bg AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE)) / n_prev
      |      + (CAST(0.75 AS DOUBLE) * n1_fwd / n_prev)
      |        * (CAST(n1_bwd AS DOUBLE) / n1_tot)
      |    ) AS DECIMAL(12,6)) AS lp
      |  FROM bg JOIN bcnt USING (prev, cur) JOIN pcnt USING (prev)
      |    JOIN nf USING (prev) JOIN nb USING (cur) CROSS JOIN nt),
      |kavg AS (SELECT doc_id, CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_lp
      |  FROM p GROUP BY 1),
      |kb AS (SELECT k.doc_id, NTILE(3) OVER (
      |      PARTITION BY d.lang ORDER BY k.avg_lp, k.doc_id) AS band
      |  FROM kavg k JOIN documents d ON d.doc_id = k.doc_id),
      |kkeep AS (SELECT doc_id FROM kb WHERE band >= 2)""".stripMargin

  /** Shared final SELECT of the v5-family oracles: survivors of all three
    * keep sets, aggregated per (source, lang). */
  private val x32FinalSql: String =
    """SELECT d.source, d.lang, COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens
      |FROM documents d
      |JOIN gkeep USING (doc_id) JOIN skeep USING (doc_id) JOIN kkeep USING (doc_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** x32's three-gate survivor document frame (all production rungs:
    * rolling Gopher panel, rolling span dedup, KN banding via the
    * scale-safe groupedNtile) — ONE implementation shared by the
    * declared v5 query and the v6 capstone, so the gate semantics can
    * never drift between them. Returns full `documents` columns. */
  private def v5Survivors(docs: org.apache.spark.sql.DataFrame) = {
    val gop = TextAnalysis.gopherRepetitionRolling(docs, "doc_id", "text")
      .filter(col("keep")).select("doc_id")
    val span = Dedup.spanDupStats(docs, "doc_id", "text", k = 8, rolling = true)
      .filter(col("n_dup") * 2 <= col("n_windows")).select("doc_id")
    val kn = knScored(docs)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val banded = Relational.groupedNtile(
        kn.select("doc_id", "lang", "avg_kn_logprob"),
        groups = Seq("lang"), order = Seq("avg_kn_logprob", "doc_id"),
        n = 3, out = "band")
      .filter(col("band") >= 2).select("doc_id")
    docs.join(gop, Seq("doc_id"), "left_semi")
      .join(span, Seq("doc_id"), "left_semi")
      .join(banded, Seq("doc_id"), "left_semi")
  }

  /** The three-gate survivor set persisted THROUGH THE STORE, once per
    * (session, input dir) — the warehouse-scale barrier the x34/x37
    * scaladocs always named (y13's rule: a frame feeding a multi-consumer
    * fan-out is a store write, not an executor-memory checkpoint).
    * localCheckpoint is memory-resident and not fault-tolerant; the store
    * write costs one extra scan but survives executor loss and is exactly
    * what a production curation DAG does between its gate stage and its
    * mix/edit stages. Partitioned by source so downstream per-source
    * consumers get static pruning. Shutdown hook cleans the table up
    * (y3d's discipline). */
  private val v5SurvBuilt = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()

  /** Read back a just-appended store table, tolerating the EMPTY artifact:
    * a zero-row append writes no parquet data files (only _SUCCESS), so
    * schema inference on the read side fails — fall back to the builder
    * frame's own empty slice, which carries the schema. A legitimately
    * empty artifact happens in production (a gate that drops everything —
    * the 10× soak corpus does exactly this to the v5 gates, every doc
    * being a rotated near-dup family member) and must not kill the run. */
  private def readOrEmpty(store: graft.sources.Store,
                          built: org.apache.spark.sql.DataFrame) =
    try store.read catch {
      case _: org.apache.spark.sql.AnalysisException => built.limit(0)
    }

  private def v5SurvPath(s: SparkSession, d: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
      s"survivors_${s.sparkContext.applicationId}_${Integer.toHexString(d.hashCode)}"

  private def v5SurvivorsStored(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    v5SurvBuilt.computeIfAbsent(s"${s.sparkContext.applicationId}:$d", _ => {
      val store = graft.sources.Store(s, v5SurvPath(s, d), "source")
      store.destroy()
      val built = v5Survivors(Tables.documents(s, d))
      store.appendVersioned(built) // (epoch 1, v1) — x42's manifest coordinate
      sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
      val back = readOrEmpty(store, built)
      val M = lit(2147483647L)
      store.trackFrom(back, (col("doc_id") % M) * (col("doc_id") % M) % M)
      back
    })

  private val x32CurationV5 = Q(
    (s, d) => {
      v5Survivors(Tables.documents(s, d))
        .select(col("source"), col("lang"),
          size(split(col("text"), " ")).as("wt"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("wt")).cast("long").as("n_tokens"))
        .orderBy("source", "lang")
    },
    s"""WITH $x32GateCtes,
       |$x32KnBandCtes
       |$x32FinalSql""".stripMargin)

  /** x32b: curation v5 with the banding gate POINTED AT NEW DATA — the
    * production shape z41 unlocks. x32's KN banding self-scores (its
    * count tables come from the very corpus being banded, so the gate
    * can't run on a fresh crawl); here the Gopher and span gates are
    * identical but the perplexity gate scores EVERY document off the
    * STORED model fitted to the even-doc_id reference half
    * ([[knModelStored]] — left joins, unseen-bigram backoff, add-one
    * continuation floor), then bands per language exactly as v5 does.
    * This is CCNet's architecture: a fixed reference LM gating an
    * arbitrary input corpus. Same scale shape as x32 plus the model
    * reads; the only range shuffle is still the banding's. */
  private val x32bCurationHeldout = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val gop = TextAnalysis.gopherRepetitionRolling(docs, "doc_id", "text")
        .filter(col("keep")).select("doc_id")
      val span = Dedup.spanDupStats(docs, "doc_id", "text", k = 8, rolling = true)
        .filter(col("n_dup") * 2 <= col("n_windows")).select("doc_id")
      val model =
        if (planOnly) knBigramCounts(docs.filter(col("doc_id") % 2 === 0))
        else knModelStored(s, d)
      val kn = knHeldoutScored(model, docs)
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      val banded = Relational.groupedNtile(
          kn.select("doc_id", "lang", "avg_kn_logprob"),
          groups = Seq("lang"), order = Seq("avg_kn_logprob", "doc_id"),
          n = 3, out = "band")
        .filter(col("band") >= 2).select("doc_id")
      docs.join(gop, Seq("doc_id"), "left_semi")
        .join(span, Seq("doc_id"), "left_semi")
        .join(banded, Seq("doc_id"), "left_semi")
        .select(col("source"), col("lang"),
          size(split(col("text"), " ")).as("wt"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("wt")).cast("long").as("n_tokens"))
        .orderBy("source", "lang")
    },
    s"""WITH $x32GateCtes,
       |${knHeldoutCtes("doc_id % 2 = 0", "TRUE")},
       |kb AS (SELECT k.doc_id, NTILE(3) OVER (
       |      PARTITION BY d.lang ORDER BY k.avg_kn_logprob, k.doc_id) AS band
       |  FROM kout k JOIN documents d ON d.doc_id = k.doc_id),
       |kkeep AS (SELECT doc_id FROM kb WHERE band >= 2)
       |$x32FinalSql""".stripMargin)

  /** x38: quality-gate AGREEMENT audit — the panel a pipeline owner reads
    * before stacking two fitted quality filters: on the held-out half,
    * the CCNet-style LM gate (z41's stored KN model → per-lang perplexity
    * band ≥ 2 of 3) and the GPT-3-style discriminator gate (z42's stored
    * IRLS weights → per-lang TOP HALF by score, a retention-targeted
    * cutoff rather than σ>½ — the z45 lesson: production tunes the
    * threshold to a keep rate) vote on every document, and the confusion
    * matrix per language shows where they agree, where only one fires,
    * and what fraction of the corpus the DISAGREEMENT puts in play (the
    * docs whose fate depends on which filter you trust — production
    * measures this overlap before composing gates, because two filters
    * that mostly disagree are not two independent signals). Both models
    * are FITTED artifacts read back from the Store (train half never
    * rescored); docs too short for the LM scorer count as LM-drop via
    * the left join. Scale: two model joins (group-cardinality
    * discriminator broadcast, model-sized KN tables unhinted) + one
    * banding ntile per lang; the matrix is one combinable aggregate.
    * Counts integer; agreement_frac is one long/long division. */
  private val x38GateAgreement = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val odd = docs.filter(col("doc_id") % 2 === 1)
      val knM =
        if (planOnly) knBigramCounts(docs.filter(col("doc_id") % 2 === 0))
        else knModelStored(s, d)
      val banded = Relational.groupedNtile(
          knHeldoutScored(knM, odd)
            .join(odd.select("doc_id", "lang"), Seq("doc_id"))
            .select("doc_id", "lang", "avg_kn_logprob"),
          groups = Seq("lang"), order = Seq("avg_kn_logprob", "doc_id"),
          n = 3, out = "band")
        .select(col("doc_id"), (col("band") >= 2).as("lm_keep"))
      val clsM =
        if (planOnly) clsModelFit(docs)
        else clsModelStored(s, d)
      val cls = Relational.groupedNtile(
          clsFeats(odd).join(broadcast(clsM), Seq("lang"))
            .select(col("doc_id"), col("lang"),
              (col("b0s") + col("b1s") * col("x1") + col("b2s") * col("x2"))
                .as("eta")),
          groups = Seq("lang"), order = Seq("eta", "doc_id"),
          n = 2, out = "cband")
        .select(col("doc_id"), (col("cband") === 2).as("cls_keep"))
      odd.select("doc_id", "lang")
        .join(banded, Seq("doc_id"), "left")
        .join(cls, Seq("doc_id"))
        .withColumn("lm_keep", coalesce(col("lm_keep"), lit(false)))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("lm_keep") && col("cls_keep"), 1L).otherwise(0L))
            .as("n_both_keep"),
          sum(when(col("lm_keep") && !col("cls_keep"), 1L).otherwise(0L))
            .as("n_lm_only"),
          sum(when(!col("lm_keep") && col("cls_keep"), 1L).otherwise(0L))
            .as("n_cls_only"),
          sum(when(!col("lm_keep") && !col("cls_keep"), 1L).otherwise(0L))
            .as("n_both_drop"))
        .withColumn("agreement_frac",
          (col("n_both_keep") + col("n_both_drop")) / col("n_docs"))
        .orderBy("lang")
    },
    s"""WITH feats AS (
       |  SELECT doc_id, lang,
       |    ln(1.0 + n_chars) AS x1,
       |    CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) / n_chars AS x2,
       |    CAST(source IN ('src0', 'src3', 'src6', 'src9') AS DOUBLE) AS y
       |  FROM documents),
       |tf AS (SELECT lang, x1, x2, y FROM feats WHERE doc_id % 2 = 0),
       |${IrlsSql.ctes("tf", "lang", 4)},
       |model AS (SELECT lang,
       |    CAST(CAST(b0 AS DECIMAL(12,4)) AS DOUBLE) AS b0s,
       |    CAST(CAST(b1 AS DECIMAL(12,4)) AS DOUBLE) AS b1s,
       |    CAST(CAST(b2 AS DECIMAL(12,4)) AS DOUBLE) AS b2s
       |  FROM b4it),
       |${knHeldoutCtes("doc_id % 2 = 0", "doc_id % 2 = 1")},
       |kb AS (SELECT k.doc_id, NTILE(3) OVER (
       |      PARTITION BY d.lang ORDER BY k.avg_kn_logprob, k.doc_id) AS band
       |  FROM kout k JOIN documents d ON d.doc_id = k.doc_id),
       |ce AS (SELECT f.doc_id, f.lang,
       |    m.b0s + m.b1s * f.x1 + m.b2s * f.x2 AS eta
       |  FROM feats f JOIN model m ON f.lang = m.lang
       |  WHERE f.doc_id % 2 = 1),
       |cv AS (SELECT doc_id, lang,
       |    NTILE(2) OVER (PARTITION BY lang ORDER BY eta, doc_id) = 2 AS cls_keep
       |  FROM ce),
       |j AS (SELECT cv.lang,
       |    COALESCE(kb.band >= 2, FALSE) AS lm_keep, cv.cls_keep
       |  FROM cv LEFT JOIN kb ON kb.doc_id = cv.doc_id)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN lm_keep AND cls_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_both_keep,
       |  CAST(SUM(CASE WHEN lm_keep AND NOT cls_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_lm_only,
       |  CAST(SUM(CASE WHEN NOT lm_keep AND cls_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_cls_only,
       |  CAST(SUM(CASE WHEN NOT lm_keep AND NOT cls_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_both_drop,
       |  (CAST(SUM(CASE WHEN lm_keep = cls_keep THEN 1 ELSE 0 END) AS BIGINT))
       |    / COUNT(*) AS agreement_frac
       |FROM j GROUP BY lang ORDER BY lang""".stripMargin)

  /** x34: curation v6 — the capstone that ships a training MIX, not just
    * survivors: the full pretraining-data lifecycle as ONE oracle-gated
    * DAG. Chain:
    *  1. v5's three-gate survivor set ([[v5Survivors]] — rolling Gopher,
    *     rolling span dedup, per-language KN banding);
    *  2. best-copy dedup RESOLUTION on the survivors (x25's policy:
    *     LSH pairs → connected components → keep the highest
    *     lexical-diversity copy per cluster — filter-then-dedup, so the
    *     winner is the best SURVIVING copy);
    *  3. DSIR importance gate (z21's llr weights + deterministic
    *     resample), weights fitted on the RESOLVED corpus;
    *  4. per-source stratified cap at 40 (z6's deterministic md5 order,
    *     riding the salted grouped top-k);
    *  5. temperature mixture weights over the capped set (z22's
    *     sqrt-flattened shares + repeat factors);
    *  6. sequence packing of the final mix into 2048-token bins (z19's
    *     two-pass running total — bounded per-partition sorts, no
    *     single-task corpus window).
    * Output: one row per source — docs/tokens/languages in the mix, its
    * temperature share and repeat factor, and the global packed bin
    * count. Every stage is a reused, already-gated implementation; the
    * oracle replays the complete chain (gates → KN banding → recursive
    * CC fixpoint over the survivor set → DSIR weights → cap window →
    * mix arithmetic → packing window) in one WITH RECURSIVE chain built
    * from the same shared CTE renderers as the component queries. */
  private val x34CurationV6 = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}
      // barrier the three-gate survivor frame before the fan-out: four
      // downstream consumers (signature build, CC label loop, quality
      // ranking, resolution join) would otherwise each re-run the whole
      // gate DAG — and the CC loop re-runs its input per iteration.
      // The barrier IS a store write ([[v5SurvivorsStored]] — y13's rule,
      // now implemented rather than documented: fault-tolerant, shared
      // with x37/x41, pruned by source on the read side). Plan-only
      // sweeps skip it (no actions at construction).
      val surv =
        if (planOnly) v5Survivors(Tables.documents(s, d))
        else v5SurvivorsStored(s, d)
      val pairs = Dedup.lshCandidates(minhashSigOf(surv), "doc_id", 8,
        maxBucket = Some(X2MaxBucket))
      val labels = Dedup.connectedComponents(pairs, surv, "doc_id")
        .select("doc_id", "cluster_id")
      val wsx = split(col("text"), " ")
      val qual = surv.select(col("doc_id"),
        (size(array_distinct(wsx)) / size(wsx)).as("qscore"))
      val best = Relational.top1PerGroup(labels.join(qual, Seq("doc_id")),
          Seq(col("cluster_id")), Seq(col("qscore").desc, col("doc_id").asc))
        .select(col("doc_id"))
      val resolved = surv.join(best, Seq("doc_id"), "left_semi")
      val dkept = resolved.join(
        dsirPerDoc(resolved).filter(col("kept")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      val capped = Sampling.capPerGroup(dkept, col("source"), col("doc_id"), 40)
      val st = capped
        .select(col("source"), col("lang"),
          size(split(col("text"), " ")).cast(LongType).as("toks"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).cast(LongType).as("n_tokens"),
          countDistinct(col("lang")).cast(IntegerType).as("n_langs"))
      val wmix = st.withColumn("w_dec",
        sqrt(col("n_tokens").cast(DoubleType)).cast(DecimalType(18, 8)))
      val wtot = wmix.agg(sum(col("w_dec")).as("w_tot"))
      val packed = Relational.runningTotal(
          capped.select(col("doc_id"),
            size(split(col("text"), " ")).cast(LongType).as("toks")),
          Seq("doc_id"), "toks", "cum")
        .agg((max(expr("(cum - toks) DIV 2048")) + 1).cast(LongType).as("n_bins"))
      wmix.crossJoin(broadcast(wtot)).crossJoin(broadcast(packed))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("n_langs"),
          (col("w_dec").cast(DoubleType) / col("w_tot").cast(DoubleType)).as("share"),
          (col("w_dec").cast(DoubleType) / col("w_tot").cast(DoubleType)
            * lit(1000000.0) / col("n_tokens")).as("repeat_factor"),
          col("n_bins"))
        .orderBy("source")
    },
    s"""WITH RECURSIVE $x32GateCtes,
       |$x32KnBandCtes,
       |surv AS MATERIALIZED (SELECT d.doc_id, d.source, d.lang, d.text FROM documents d
       |  JOIN gkeep USING (doc_id) JOIN skeep USING (doc_id) JOIN kkeep USING (doc_id)),
       |${componentsCtesFor("surv", "c")},
       |lbl AS (SELECT s2.doc_id, COALESCE(ccomp.cid, s2.doc_id) AS cluster_id
       |  FROM surv s2 LEFT JOIN ccomp ON s2.doc_id = ccomp.node),
       |q AS (SELECT doc_id,
       |    len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')) AS qscore
       |  FROM surv),
       |b AS (SELECT l.cluster_id, l.doc_id AS keep_id,
       |    ROW_NUMBER() OVER (PARTITION BY l.cluster_id
       |      ORDER BY q.qscore DESC, l.doc_id) AS rn
       |  FROM lbl l JOIN q ON q.doc_id = l.doc_id),
       |best AS (SELECT keep_id FROM b WHERE rn = 1),
       |resolved AS MATERIALIZED (SELECT s2.* FROM surv s2 JOIN best ON s2.doc_id = best.keep_id),
       |${dsirCtesFor("resolved")},
       |dkept AS (SELECT r.* FROM resolved r
       |  JOIN perdoc p2 ON p2.doc_id = r.doc_id WHERE p2.kept),
       |capped AS MATERIALIZED (SELECT * FROM (
       |    SELECT d2.*, ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS crn
       |    FROM dkept d2) x WHERE crn <= 40),
       |st AS (SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       |    CAST(COUNT(DISTINCT lang) AS INT) AS n_langs
       |  FROM capped GROUP BY 1),
       |wmix AS (SELECT *, CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(18,8)) AS w_dec
       |  FROM st),
       |wtot AS (SELECT SUM(w_dec) AS w_tot FROM wmix),
       |packcum AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
       |    SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
       |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM capped),
       |packn AS (SELECT CAST(MAX((cum - toks) // 2048) + 1 AS BIGINT) AS n_bins
       |  FROM packcum)
       |SELECT source, n_docs, n_tokens, n_langs,
       |  CAST(w_dec AS DOUBLE) / CAST(w_tot AS DOUBLE) AS share,
       |  CAST(w_dec AS DOUBLE) / CAST(w_tot AS DOUBLE)
       |    * CAST(1000000.0 AS DOUBLE) / n_tokens AS repeat_factor,
       |  n_bins
       |FROM wmix CROSS JOIN wtot CROSS JOIN packn ORDER BY source""".stripMargin)

  /** x37: curation v7 — the corpus-EDITING capstone: where v6 (x34) ships
    * a mix of whole surviving documents, v7 edits the survivors before
    * materializing the training run. Chain:
    *  1. v5's three-gate survivor set ([[v5Survivors]] — rolling Gopher,
    *     rolling span dedup, per-language KN banding);
    *  2. duplicate-span SCRUB over the survivor corpus (x35's rung:
    *     corpus-wide dup windows island-merged and stripped — remove the
    *     boilerplate bytes, keep the doc);
    *  3. refilter: scrubbed docs must retain ≥ 8 tokens (a doc reduced to
    *     fragments by scrubbing carries no training signal);
    *  4. token-budget allocation over the SCRUBBED per-source token
    *     counts (z43's rung: 4×-corpus budget, sqrt-flattened shares,
    *     4-epoch cap);
    *  5. balanced shard assignment of the scrubbed docs into 16 writers
    *     (z44's rung: round-robin over the global size-sorted order),
    *     reported as the max−min shard-token spread.
    * Output: one row per source — docs/tokens in the scrubbed mix, the
    * scrub fraction, temperature share, allocated tokens, epoch rate,
    * cap flag — plus the global writer spread. Every stage reuses an
    * already-gated implementation; the oracle replays the complete chain
    * (gates → KN banding → positional scrub → island rebuild → budget
    * arithmetic → shard rank window) from the same shared CTE renderers.
    * Scale: the survivor frame is barriered as a STORE WRITE before the
    * scrub fan-out ([[v5SurvivorsStored]] — the positional relation feeds
    * both the dup-fp count and the verdict join), and the scrubbed frame
    * localCheckpoints before its stats/shard fan-out (a small
    * intermediate bounded by durable ends; [[scrubbedSurvivors]]). */
  /** x37/x41 shared: the scrubbed-survivor manifest (doc_id, source,
    * orig_toks, clean_toks) — v5 gates (store-barriered survivor set,
    * [[v5SurvivorsStored]]) → span scrub → ≥8-token refilter. The
    * scrubbed frame keeps a localCheckpoint barrier (a small intermediate
    * between the store-backed survivor read and x41's store-backed run
    * write — the two durable ends bound the recompute cost on loss). */
  private def scrubbedSurvivors(s: SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.LongType
    val surv =
      if (planOnly) v5Survivors(Tables.documents(s, d))
      else v5SurvivorsStored(s, d)
    val scr = Dedup.spanScrub(surv, "doc_id", "text", k = 8)
      .select(col("doc_id"), col("n_tokens").cast(LongType).as("orig_toks"),
        (col("n_tokens") - col("n_removed_tokens")).cast(LongType).as("clean_toks"))
    val cleanedFrame = scr
      .join(surv.select("doc_id", "source"), Seq("doc_id"))
      .filter(col("clean_toks") >= 8)
      .select("doc_id", "source", "orig_toks", "clean_toks")
    if (planOnly) cleanedFrame
    else graft.Housekeeping.retainCheckpoint(s)(cleanedFrame)
  }

  /** Oracle CTE chain producing `cl` — the scrubbed-survivor manifest
    * (doc_id, source, orig_toks, clean_toks) — shared verbatim by the
    * x37 and x41 oracles so the plan and its materialization can never
    * drift on the replay side either. */
  private val x37ScrubCtes: String =
    s"""$x32GateCtes,
       |$x32KnBandCtes,
       |surv AS MATERIALIZED (SELECT d.doc_id, d.source, d.text FROM documents d
       |  JOIN gkeep USING (doc_id) JOIN skeep USING (doc_id) JOIN kkeep USING (doc_id)),
       |sws AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM surv),
       |spos AS (
       |  SELECT doc_id, i AS pos, md5(array_to_string(w[i:i+7], ' ')) AS fp
       |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
       |        FROM sws WHERE len(w) >= 8)),
       |sdupfp AS (SELECT fp FROM spos GROUP BY fp HAVING COUNT(*) >= 2),
       |sdpt AS (SELECT doc_id, list_sort(list(pos)) AS dp
       |  FROM spos JOIN sdupfp USING (fp) GROUP BY 1),
       |cleaned AS MATERIALIZED (
       |  SELECT s2.doc_id, s2.source, CAST(len(s2.w) AS BIGINT) AS orig_toks,
       |    CAST(len(list_filter(generate_series(1, len(s2.w)),
       |      jj -> len(list_filter(coalesce(sdpt.dp, CAST([] AS BIGINT[])),
       |        p -> jj >= p AND jj <= p + 7)) = 0)) AS BIGINT) AS clean_toks
       |  FROM sws s2 LEFT JOIN sdpt USING (doc_id)),
       |cl AS (SELECT * FROM cleaned WHERE clean_toks >= 8)""".stripMargin

  private val x37CurationV7 = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val cleaned = scrubbedSurvivors(s, d)
      val st = cleaned.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("clean_toks")).cast(LongType).as("n_tokens"),
          sum(col("orig_toks")).cast(LongType).as("orig_tokens"),
          sum(col("orig_toks") - col("clean_toks")).cast(LongType).as("removed_tokens"))
        .withColumn("scrub_frac", col("removed_tokens") / col("orig_tokens"))
      val budget = st.agg((sum(col("n_tokens")) * 4).cast(LongType).as("budget_tokens"))
      val alloc = Sampling.tokenBudget(
        st.select("source", "n_docs", "n_tokens", "scrub_frac"),
        "source", "n_tokens", budget, maxEpochs = 4)
      val spread = Sampling.shardAssign(
          cleaned.select(col("doc_id"), col("clean_toks")),
          Seq("doc_id"), "clean_toks", nShards = 16)
        .groupBy("shard").agg(sum(col("clean_toks")).as("t"))
        .agg((max(col("t")) - min(col("t"))).cast(LongType).as("shard_spread"))
      alloc.crossJoin(broadcast(spread))
        .select("source", "n_docs", "n_tokens", "scrub_frac", "share",
          "alloc_tokens", "epochs", "capped", "shard_spread")
        .orderBy("source")
    },
    s"""WITH $x37ScrubCtes,
       |st AS (SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM(clean_toks) AS BIGINT) AS n_tokens,
       |    CAST(SUM(orig_toks) AS BIGINT) AS orig_tokens,
       |    CAST(SUM(orig_toks - clean_toks) AS BIGINT) AS removed_tokens
       |  FROM cl GROUP BY 1),
       |w2 AS (SELECT *, CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(18,8)) AS w_dec
       |  FROM st),
       |t2 AS (SELECT SUM(w_dec) AS w_tot,
       |       CAST(SUM(n_tokens) * 4 AS BIGINT) AS budget_tokens FROM w2),
       |a2 AS (SELECT source, n_docs, n_tokens,
       |    removed_tokens / orig_tokens AS scrub_frac,
       |    CAST(w_dec AS DOUBLE) / CAST(w_tot AS DOUBLE) AS share,
       |    CAST(FLOOR(CAST(w_dec AS DOUBLE) / CAST(w_tot AS DOUBLE)
       |      * CAST(budget_tokens AS DOUBLE)) AS BIGINT) AS target_tokens,
       |    n_tokens AS nt
       |  FROM w2 CROSS JOIN t2),
       |shr AS (SELECT doc_id, clean_toks,
       |    ROW_NUMBER() OVER (ORDER BY clean_toks DESC, doc_id) AS rnk FROM cl),
       |sprd AS (SELECT CAST(MAX(t) - MIN(t) AS BIGINT) AS shard_spread
       |  FROM (SELECT (rnk - 1) % 16 AS shard, SUM(clean_toks) AS t
       |        FROM shr GROUP BY 1))
       |SELECT source, n_docs, n_tokens, scrub_frac, share,
       |  LEAST(target_tokens, nt * 4) AS alloc_tokens,
       |  LEAST(target_tokens, nt * 4) / nt AS epochs,
       |  target_tokens > nt * 4 AS capped, shard_spread
       |FROM a2 CROSS JOIN sprd ORDER BY source""".stripMargin)

  /** One MATERIALIZED training run per (session, input dir): x37's
    * scrubbed-survivor manifest shard-assigned and WRITTEN through the
    * Store partitioned by shard — 16 partition directories, one per
    * writer, exactly the layout a data-parallel trainer reads. Cached and
    * shutdown-hook-destroyed (y3d's discipline). */
  private val x41Built = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()

  private def x41RunPath(s: SparkSession, d: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
      s"train_run_${s.sparkContext.applicationId}_${Integer.toHexString(d.hashCode)}"

  private def x41StoredRun(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    x41Built.computeIfAbsent(s"${s.sparkContext.applicationId}:$d", _ => {
      val sharded = Sampling.shardAssign(scrubbedSurvivors(s, d),
        Seq("doc_id"), "clean_toks", nShards = 16)
      val store = graft.sources.Store(s, x41RunPath(s, d), "shard")
      store.destroy()
      store.appendVersioned(sharded) // (epoch 1, v1) — x42's manifest coordinate
      sys.addShutdownHook { try store.destroy() catch { case _: Exception => () } }
      val back = readOrEmpty(store, sharded)
      val M = lit(2147483647L)
      store.trackFrom(back, (col("doc_id") % M) * ((col("shard") + 1) % M) % M)
      back
    })

  /** x41: MATERIALIZE THE TRAINING RUN — x37 computes the shard plan;
    * this query LANDS it and proves the landing faithful. The scrubbed
    * manifest is shard-assigned (z44's balanced round-robin over the
    * global size order) and written through the Store partitioned by
    * shard ([[x41StoredRun]] — 16 partition directories, the layout a
    * data-parallel trainer's 16 readers consume with static pruning);
    * the declared output is computed entirely FROM THE RE-READ STORE:
    * per (epoch, shard) doc counts, token totals, the first doc in each
    * epoch's deterministic md5 order, and z46's position-weighted order
    * checksum on the 2³¹−1 lattice. The oracle never sees the store — it
    * replays the PLAN (the x37 scrub chain → shard rank → epoch
    * permutation → checksum), so hash equality IS the write-path
    * verification: every doc landed in its planned shard, no row lost or
    * doubled, and the epoch order derivable from the materialized table
    * matches the one derived from the plan. StoreSpec adds the restart
    * case (a fresh handle re-reads the same totals; re-materialization
    * is bit-identical).
    *
    * Scale: the shard rank rides the distributed prefix-sum (no corpus
    * window); the store write is 16 hash-partitioned directories; the
    * read side computes only per-(epoch, shard) combinable aggregates
    * (64 output rows at any corpus size). */
  private val x41RunMaterialize = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val run =
        if (planOnly)
          Sampling.shardAssign(scrubbedSurvivors(s, d),
            Seq("doc_id"), "clean_toks", nShards = 16)
        else x41StoredRun(s, d)
      val ep = run.select(col("doc_id"), col("shard"), col("clean_toks"),
        explode(sequence(lit(0), lit(3))).as("epoch"))
      val ordered = ep.withColumn("pos", row_number().over(
        Window.partitionBy("epoch", "shard").orderBy(
          md5(concat(col("doc_id").cast("string"), lit(":"),
            col("epoch").cast("string"))), col("doc_id"))))
      val M = lit(2147483647L)
      ordered.groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("clean_toks")).cast(LongType).as("shard_tokens"),
          max(when(col("pos") === 1, col("doc_id"))).as("first_doc"),
          pmod(sum((col("pos").cast(LongType) % M) * (col("doc_id") % M) % M), M)
            .cast(LongType).as("order_checksum"))
        .orderBy("epoch", "shard")
    },
    s"""WITH $x37ScrubCtes,
       |shr AS (SELECT doc_id, clean_toks,
       |    ROW_NUMBER() OVER (ORDER BY clean_toks DESC, doc_id) AS rnk FROM cl),
       |sh AS (SELECT doc_id, clean_toks, CAST((rnk - 1) % 16 AS INT) AS shard FROM shr),
       |ep AS (SELECT doc_id, clean_toks, shard,
       |    CAST(unnest(generate_series(0, 3)) AS INT) AS epoch FROM sh),
       |o AS (SELECT epoch, shard, doc_id, clean_toks,
       |    ROW_NUMBER() OVER (PARTITION BY epoch, shard
       |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)),
       |        doc_id) AS pos
       |  FROM ep)
       |SELECT epoch, shard, COUNT(*) AS n_docs,
       |  CAST(SUM(clean_toks) AS BIGINT) AS shard_tokens,
       |  MAX(CASE WHEN pos = 1 THEN doc_id END) AS first_doc,
       |  CAST(SUM((pos % 2147483647) * (doc_id % 2147483647) % 2147483647)
       |    % 2147483647 AS BIGINT) AS order_checksum
       |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** x42: the RUN MANIFEST — the reproducibility artifact a corpus build
    * publishes beside its outputs: one row per STORED artifact (the v5
    * survivor set, the x41 sharded training run, the x40 base-fit bigram
    * model, the x39 canonical dedup map) with its row count, a
    * domain total (tokens / allocated tokens / bigram mass / distinct
    * clusters), and a 2³¹−1-lattice content checksum. Two runs produced
    * the same data iff their manifests are identical — the diff a
    * release process checks before promoting a corpus, and the lineage
    * record an audit asks for.
    *
    * The Spark side reads every number FROM THE STORES; the oracle
    * recomputes every artifact FROM SCRATCH (the gate chain, the shard
    * rank, the base bigram fit, the base-only recursive CC). So beyond
    * describing the run, the query continuously audits that what is ON
    * DISK equals what the plan says should be — the x41 write-path
    * verification generalized to the whole artifact set.
    *
    * Each row also carries the artifact store's (EPOCH, VERSION)
    * coordinate — the full reproducibility address after the governance
    * layer landed: version numbers are only meaningful WITHIN a lineage
    * epoch ([[graft.sources.Store.epoch]] advances on every
    * purgeRestartLineage), so a manifest naming “version 1” without its
    * epoch is ambiguous the day after a takedown. The artifact builders
    * write through appendVersioned, so the coordinate is read from the
    * real `_log`, not assumed; x57 is the diff panel that exercises the
    * coordinate ACROSS a purge boundary.
    *
    * Scale: every aggregate is map-side combinable over its artifact
    * (checksum terms reduce below 2³¹ before summing, z46's overflow
    * rule); the manifest itself is 4 rows at any corpus size. */
  private val x42RunManifest = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val M = lit(2147483647L)
      val surv =
        if (planOnly) v5Survivors(Tables.documents(s, d))
        else v5SurvivorsStored(s, d)
      val run =
        if (planOnly) Sampling.shardAssign(scrubbedSurvivors(s, d),
          Seq("doc_id"), "clean_toks", nShards = 16)
        else x41StoredRun(s, d)
      val lm =
        if (planOnly) graft.operators.Lm.bigramCounts(
          Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0))
        else x40LmStored(s, d)
      val bm =
        if (planOnly) baseMapFit(s, d).select("doc_id", "cluster_id")
        else baseMapStored(s, d)
      // the store's lineage coordinate (metadata reads: one marker file +
      // one _log listing per artifact; the builders above guarantee the
      // logs exist before this runs)
      def coordOf(path: String): (Long, Long) =
        if (planOnly) (1L, 1L)
        else {
          val st = graft.sources.Store(s, path, "part")
          (st.epoch, st.versions.lastOption.getOrElse(0L))
        }
      val (survEp, survV) = coordOf(v5SurvPath(s, d))
      val (runEp, runV) = coordOf(x41RunPath(s, d))
      val (lmEp, lmV) = coordOf(x40LmPath(s, d))
      val (bmEp, bmV) = coordOf(baseMapPath(s, d))
      val survRow = surv.agg(
          count(lit(1)).as("n_rows"),
          sum(size(split(col("text"), " ")).cast(LongType)).as("total"),
          pmod(sum((col("doc_id") % M) * (col("doc_id") % M) % M), M)
            .cast(LongType).as("checksum"))
        .select(lit("survivor_set").as("artifact"), lit(survEp).as("epoch"),
          lit(survV).as("version"), col("n_rows"),
          col("total"), col("checksum"))
      val runRow = run.agg(
          count(lit(1)).as("n_rows"),
          sum(col("clean_toks")).cast(LongType).as("total"),
          pmod(sum((col("doc_id") % M) * ((col("shard") + 1) % M) % M), M)
            .cast(LongType).as("checksum"))
        .select(lit("train_run").as("artifact"), lit(runEp).as("epoch"),
          lit(runV).as("version"), col("n_rows"),
          col("total"), col("checksum"))
      val lmRow = lm.agg(
          count(lit(1)).as("n_rows"),
          sum(col("n_bg")).cast(LongType).as("total"),
          pmod(sum(
            (TextAnalysis.hash32(col("prev")) * 31 + TextAnalysis.hash32(col("cur"))) % M
              * (col("n_bg") % M) % M), M).cast(LongType).as("checksum"))
        .select(lit("lm_model").as("artifact"), lit(lmEp).as("epoch"),
          lit(lmV).as("version"), col("n_rows"),
          col("total"), col("checksum"))
      val bmRow = bm.agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("cluster_id")).cast(LongType).as("total"),
          pmod(sum((col("doc_id") % M) * (col("cluster_id") % M) % M), M)
            .cast(LongType).as("checksum"))
        .select(lit("canonical_map").as("artifact"), lit(bmEp).as("epoch"),
          lit(bmV).as("version"), col("n_rows"),
          col("total"), col("checksum"))
      survRow.unionByName(runRow).unionByName(lmRow).unionByName(bmRow)
        .orderBy("artifact")
    },
    s"""WITH RECURSIVE $x37ScrubCtes,
       |xshr AS (SELECT doc_id, clean_toks,
       |    ROW_NUMBER() OVER (ORDER BY clean_toks DESC, doc_id) AS rnk FROM cl),
       |xsh AS (SELECT doc_id, clean_toks, CAST((rnk - 1) % 16 AS INT) AS shard FROM xshr),
       |qtr AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |  WHERE doc_id % 10 <> 0),
       |qpos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
       |  FROM qtr WHERE len(l) >= 2),
       |qbg AS (SELECT l[i] AS prev, l[i+1] AS cur FROM qpos),
       |qcnt AS (SELECT prev, cur, COUNT(*) AS n_bg FROM qbg GROUP BY 1, 2),
       |${minhashCtesFor("(SELECT * FROM documents WHERE doc_id % 10 <> 0)", "b")},
       |bbands AS (${bandsSqlFor("b")}),
       |bpairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bbands a JOIN bbands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |bedges AS (SELECT doc_a AS src, doc_b AS dst FROM bpairs
       |           UNION ALL SELECT doc_b, doc_a FROM bpairs),
       |breach(node, r) AS (
       |  SELECT src, src FROM bedges
       |  UNION
       |  SELECT e.dst, breach.r FROM bedges e JOIN breach ON e.src = breach.node),
       |bcomp AS (SELECT node, min(r) AS cid FROM breach GROUP BY 1),
       |blbl AS (SELECT d.doc_id, COALESCE(bcomp.cid, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN bcomp ON d.doc_id = bcomp.node
       |  WHERE d.doc_id % 10 <> 0),
       |mrows AS (
       |  SELECT 'survivor_set' AS artifact, CAST(1 AS BIGINT) AS epoch,
       |    CAST(1 AS BIGINT) AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total,
       |    CAST(SUM((doc_id % 2147483647) * (doc_id % 2147483647) % 2147483647)
       |      % 2147483647 AS BIGINT) AS checksum
       |  FROM surv
       |  UNION ALL
       |  SELECT 'train_run', CAST(1 AS BIGINT), CAST(1 AS BIGINT),
       |    CAST(COUNT(*) AS BIGINT),
       |    CAST(SUM(clean_toks) AS BIGINT),
       |    CAST(SUM((doc_id % 2147483647) * ((shard + 1) % 2147483647) % 2147483647)
       |      % 2147483647 AS BIGINT)
       |  FROM xsh
       |  UNION ALL
       |  SELECT 'lm_model', CAST(1 AS BIGINT), CAST(1 AS BIGINT),
       |    CAST(COUNT(*) AS BIGINT),
       |    CAST(SUM(n_bg) AS BIGINT),
       |    CAST(SUM(((${h32Sql("prev")} * 31 + ${h32Sql("cur")}) % 2147483647)
       |      * (n_bg % 2147483647) % 2147483647) % 2147483647 AS BIGINT)
       |  FROM qcnt
       |  UNION ALL
       |  SELECT 'canonical_map', CAST(1 AS BIGINT), CAST(1 AS BIGINT),
       |    CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(DISTINCT cluster_id) AS BIGINT),
       |    CAST(SUM((doc_id % 2147483647) * (cluster_id % 2147483647) % 2147483647)
       |      % 2147483647 AS BIGINT)
       |  FROM blbl)
       |SELECT artifact, epoch, version, n_rows, total, checksum
       |FROM mrows ORDER BY artifact""".stripMargin)

  /** x43: MANIFEST DIFF — the release-promotion decision x42's scaladoc
    * promises: "two runs produced the same data iff their manifests
    * match", made an operator. Run A is yesterday's published manifest
    * (the stored release artifacts); run B is today's, after the DAILY
    * maintenance cadence ran — the canonical dedup map absorbed the
    * arrival batch (x39's stored-map + touched-only resolution), the ANN
    * index took its append (y18's O(batch) cell-partition append), and
    * the day's raw batch was archived as a new artifact. The release-
    * cadence artifacts (survivor set, sharded training run) and the
    * model-refresh-cadence artifact (the bigram LM — x40's merge runs on
    * its own schedule) did not move. The diff is a FULL OUTER join of
    * the two manifests on artifact name with a status verdict per row:
    * `unchanged` (row count and content checksum both equal), `changed`
    * (either moved), `new` (present only in B), `removed` (only in A —
    * structurally covered, empty on this day). This is the table a
    * promotion gate reads: it says exactly WHICH artifacts moved on
    * which cadence, and its checksums certify the ones that did not.
    *
    * The Spark side reads run A entirely FROM THE STORES and derives run
    * B by the incremental daily rules against those same stores; the
    * oracle recomputes BOTH manifests from scratch (the gate chain, the
    * base AND full-corpus recursive CC, the base and full vector
    * assignments) and replays the same full-outer diff — so hash
    * equality proves the incremental day landed on exactly the manifest
    * a from-scratch rebuild would publish, status verdicts included.
    *
    * Scale: both manifests are ≤6 rows at any corpus size (the diff join
    * is trivially broadcast); every underlying aggregate is map-side
    * combinable; the B-side increments are O(batch + touched), never
    * O(corpus). Both manifests here live in ONE lineage (same epoch);
    * the diff that straddles a purge boundary — where version numbers
    * stop being comparable and the status must name the lineage restart
    * — is x57's epoch-aware form. */
  private val x43ManifestDiff = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val M = lit(2147483647L)
      val docs = Tables.documents(s, d)
      val surv =
        if (planOnly) v5Survivors(docs)
        else v5SurvivorsStored(s, d)
      val run =
        if (planOnly) Sampling.shardAssign(scrubbedSurvivors(s, d),
          Seq("doc_id"), "clean_toks", nShards = 16)
        else x41StoredRun(s, d)
      val lm =
        if (planOnly) graft.operators.Lm.bigramCounts(
          docs.filter(col("doc_id") % 10 =!= 0))
        else x40LmStored(s, d)
      val bm =
        if (planOnly) baseMapFit(s, d).select("doc_id", "cluster_id")
        else baseMapStored(s, d)
      val e = Tables.embeddings(s, d)
      val idx =
        if (planOnly)
          Similarity.ivfAssign(e, y18Anchors(e), "vec_id", "embedding")
            .select(col("vec_id"), col("cell"), col("cell_d2"))
        else y18StoredIndex(s, d)

      def manifestRow(name: String, agg: org.apache.spark.sql.DataFrame) =
        agg.select(lit(name).as("artifact"), col("n_rows"), col("total"),
          col("checksum"))
      // stable artifacts: ONE aggregate each, reused verbatim on both sides
      val survAgg = surv.agg(count(lit(1)).as("n_rows"),
        sum(size(split(col("text"), " ")).cast(LongType)).as("total"),
        pmod(sum((col("doc_id") % M) * (col("doc_id") % M) % M), M)
          .cast(LongType).as("checksum"))
      val runAgg = run.agg(count(lit(1)).as("n_rows"),
        sum(col("clean_toks")).cast(LongType).as("total"),
        pmod(sum((col("doc_id") % M) * ((col("shard") + 1) % M) % M), M)
          .cast(LongType).as("checksum"))
      val lmAgg = lm.agg(count(lit(1)).as("n_rows"),
        sum(col("n_bg")).cast(LongType).as("total"),
        pmod(sum(
          (TextAnalysis.hash32(col("prev")) * 31 + TextAnalysis.hash32(col("cur"))) % M
            * (col("n_bg") % M) % M), M).cast(LongType).as("checksum"))
      def mapAgg(m: org.apache.spark.sql.DataFrame) =
        m.agg(count(lit(1)).as("n_rows"),
          countDistinct(col("cluster_id")).cast(LongType).as("total"),
          pmod(sum((col("doc_id") % M) * (col("cluster_id") % M) % M), M)
            .cast(LongType).as("checksum"))
      def idxAgg(i: org.apache.spark.sql.DataFrame) =
        i.agg(count(lit(1)).as("n_rows"),
          countDistinct(col("cell")).cast(LongType).as("total"),
          pmod(sum((col("vec_id") % M) * ((col("cell") + 1) % M) % M), M)
            .cast(LongType).as("checksum"))
      // run B's daily increments: map resolution (x39) + the full index
      val sig = minhashSig(s, d)
      val newPairs = Dedup.lshCandidatesAgainst(
          sig.filter(col("doc_id") % 10 === 0),
          sig.filter(col("doc_id") % 10 =!= 0), "doc_id", 8)
        .select(col("doc_new").as("doc_a"), col("doc_base").as("doc_b"))
        .union(Dedup.lshCandidates(sig.filter(col("doc_id") % 10 === 0), "doc_id", 8))
      val bmB = Dedup.incrementalComponents(bm,
        docs.filter(col("doc_id") % 10 === 0).select("doc_id"), newPairs, "doc_id")
      val batchAgg = docs.filter(col("doc_id") % 10 === 0)
        .agg(count(lit(1)).as("n_rows"),
          sum(size(split(col("text"), " ")).cast(LongType)).as("total"),
          pmod(sum((col("doc_id") % M) * ((col("doc_id") + 11) % M) % M), M)
            .cast(LongType).as("checksum"))

      val manifestA = manifestRow("survivor_set", survAgg)
        .unionByName(manifestRow("train_run", runAgg))
        .unionByName(manifestRow("lm_model", lmAgg))
        .unionByName(manifestRow("canonical_map", mapAgg(bm)))
        .unionByName(manifestRow("ann_index", idxAgg(idx.filter(col("vec_id") % 10 =!= 0))))
      val manifestB = manifestRow("survivor_set", survAgg)
        .unionByName(manifestRow("train_run", runAgg))
        .unionByName(manifestRow("lm_model", lmAgg))
        .unionByName(manifestRow("canonical_map", mapAgg(bmB)))
        .unionByName(manifestRow("ann_index", idxAgg(idx)))
        .unionByName(manifestRow("ingest_batch", batchAgg))
      val a = manifestA.select(col("artifact"), col("n_rows").as("na"),
        col("total").as("ta"), col("checksum").as("ca"))
      val b = manifestB.select(col("artifact"), col("n_rows").as("nb"),
        col("total").as("tb"), col("checksum").as("cb"))
      a.join(b, Seq("artifact"), "full_outer")
        .select(col("artifact"),
          when(col("na").isNull, "new")
            .when(col("nb").isNull, "removed")
            .when(col("na") === col("nb") && col("ca") === col("cb"), "unchanged")
            .otherwise("changed").as("status"),
          coalesce(col("na"), lit(0L)).cast(LongType).as("n_rows_a"),
          coalesce(col("nb"), lit(0L)).cast(LongType).as("n_rows_b"),
          coalesce(col("ta"), lit(0L)).cast(LongType).as("total_a"),
          coalesce(col("tb"), lit(0L)).cast(LongType).as("total_b"),
          coalesce(col("ca"), lit(0L)).cast(LongType).as("checksum_a"),
          coalesce(col("cb"), lit(0L)).cast(LongType).as("checksum_b"))
        .orderBy("artifact")
    },
    s"""WITH RECURSIVE $x37ScrubCtes,
       |dshr AS (SELECT doc_id, clean_toks,
       |    ROW_NUMBER() OVER (ORDER BY clean_toks DESC, doc_id) AS rnk FROM cl),
       |dsh AS (SELECT doc_id, clean_toks, CAST((rnk - 1) % 16 AS INT) AS shard FROM dshr),
       |dqt AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |  WHERE doc_id % 10 <> 0),
       |dqp AS (SELECT l[i] AS prev, l[i+1] AS cur
       |  FROM (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
       |        FROM dqt WHERE len(l) >= 2)),
       |dqc AS (SELECT prev, cur, COUNT(*) AS n_bg FROM dqp GROUP BY 1, 2),
       |${minhashCtesFor("(SELECT * FROM documents WHERE doc_id % 10 <> 0)", "g")},
       |gbands AS (${bandsSqlFor("g")}),
       |gpairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM gbands a JOIN gbands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |gedges AS (SELECT doc_a AS src, doc_b AS dst FROM gpairs
       |           UNION ALL SELECT doc_b, doc_a FROM gpairs),
       |greach(node, r) AS (
       |  SELECT src, src FROM gedges
       |  UNION
       |  SELECT e.dst, greach.r FROM gedges e JOIN greach ON e.src = greach.node),
       |gcomp AS (SELECT node, min(r) AS cid FROM greach GROUP BY 1),
       |glbl AS (SELECT d.doc_id, COALESCE(gcomp.cid, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN gcomp ON d.doc_id = gcomp.node
       |  WHERE d.doc_id % 10 <> 0),
       |${minhashCtesFor("documents", "f")},
       |fbands AS (${bandsSqlFor("f")}),
       |fpairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM fbands a JOIN fbands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |fedges AS (SELECT doc_a AS src, doc_b AS dst FROM fpairs
       |           UNION ALL SELECT doc_b, doc_a FROM fpairs),
       |freach(node, r) AS (
       |  SELECT src, src FROM fedges
       |  UNION
       |  SELECT e.dst, freach.r FROM fedges e JOIN freach ON e.src = freach.node),
       |fcomp AS (SELECT node, min(r) AS cid FROM freach GROUP BY 1),
       |flbl AS (SELECT d.doc_id, COALESCE(fcomp.cid, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN fcomp ON d.doc_id = fcomp.node),
       |dev AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |deanch AS (SELECT vec_id AS anchor_id, vd AS avd FROM dev
       |           WHERE vec_id BETWEEN 1 AND $IvfCells),
       |dedist AS (SELECT v.vec_id, a.anchor_id,
       |    ROUND(${dotSql("v.vd", "v.vd")} - 2.0 * ${dotSql("v.vd", "a.avd")}
       |      + ${dotSql("a.avd", "a.avd")}, 6) AS d2
       |  FROM dev v CROSS JOIN deanch a),
       |deasg AS (SELECT vec_id, anchor_id AS cell
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY d2, anchor_id) AS rn FROM dedist) z WHERE rn = 1),
       |msurv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total,
       |    CAST(SUM((doc_id % 2147483647) * (doc_id % 2147483647) % 2147483647)
       |      % 2147483647 AS BIGINT) AS checksum
       |  FROM surv),
       |mrun AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(clean_toks) AS BIGINT) AS total,
       |    CAST(SUM((doc_id % 2147483647) * ((shard + 1) % 2147483647) % 2147483647)
       |      % 2147483647 AS BIGINT) AS checksum
       |  FROM dsh),
       |mlm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(n_bg) AS BIGINT) AS total,
       |    CAST(SUM(((${h32Sql("prev")} * 31 + ${h32Sql("cur")}) % 2147483647)
       |      * (n_bg % 2147483647) % 2147483647) % 2147483647 AS BIGINT) AS checksum
       |  FROM dqc),
       |mmapa AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS total,
       |    CAST(SUM((doc_id % 2147483647) * (cluster_id % 2147483647) % 2147483647)
       |      % 2147483647 AS BIGINT) AS checksum
       |  FROM glbl),
       |mmapb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS total,
       |    CAST(SUM((doc_id % 2147483647) * (cluster_id % 2147483647) % 2147483647)
       |      % 2147483647 AS BIGINT) AS checksum
       |  FROM flbl),
       |midxa AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(COUNT(DISTINCT cell) AS BIGINT) AS total,
       |    CAST(SUM((vec_id % 2147483647) * ((cell + 1) % 2147483647) % 2147483647)
       |      % 2147483647 AS BIGINT) AS checksum
       |  FROM deasg WHERE vec_id % 10 <> 0),
       |midxb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(COUNT(DISTINCT cell) AS BIGINT) AS total,
       |    CAST(SUM((vec_id % 2147483647) * ((cell + 1) % 2147483647) % 2147483647)
       |      % 2147483647 AS BIGINT) AS checksum
       |  FROM deasg),
       |mbatch AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total,
       |    CAST(SUM((doc_id % 2147483647) * ((doc_id + 11) % 2147483647) % 2147483647)
       |      % 2147483647 AS BIGINT) AS checksum
       |  FROM documents WHERE doc_id % 10 = 0),
       |ma AS (
       |  SELECT 'survivor_set' AS artifact, * FROM msurv
       |  UNION ALL SELECT 'train_run', * FROM mrun
       |  UNION ALL SELECT 'lm_model', * FROM mlm
       |  UNION ALL SELECT 'canonical_map', * FROM mmapa
       |  UNION ALL SELECT 'ann_index', * FROM midxa),
       |mb AS (
       |  SELECT 'survivor_set' AS artifact, * FROM msurv
       |  UNION ALL SELECT 'train_run', * FROM mrun
       |  UNION ALL SELECT 'lm_model', * FROM mlm
       |  UNION ALL SELECT 'canonical_map', * FROM mmapb
       |  UNION ALL SELECT 'ann_index', * FROM midxb
       |  UNION ALL SELECT 'ingest_batch', * FROM mbatch)
       |SELECT COALESCE(ma.artifact, mb.artifact) AS artifact,
       |  CASE WHEN ma.artifact IS NULL THEN 'new'
       |       WHEN mb.artifact IS NULL THEN 'removed'
       |       WHEN ma.n_rows = mb.n_rows AND ma.checksum = mb.checksum
       |         THEN 'unchanged'
       |       ELSE 'changed' END AS status,
       |  CAST(COALESCE(ma.n_rows, 0) AS BIGINT) AS n_rows_a,
       |  CAST(COALESCE(mb.n_rows, 0) AS BIGINT) AS n_rows_b,
       |  CAST(COALESCE(ma.total, 0) AS BIGINT) AS total_a,
       |  CAST(COALESCE(mb.total, 0) AS BIGINT) AS total_b,
       |  CAST(COALESCE(ma.checksum, 0) AS BIGINT) AS checksum_a,
       |  CAST(COALESCE(mb.checksum, 0) AS BIGINT) AS checksum_b
       |FROM ma FULL OUTER JOIN mb ON ma.artifact = mb.artifact
       |ORDER BY artifact""".stripMargin)

  private val x57Cache = new java.util.concurrent.ConcurrentHashMap[
    String, (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]()

  /** x57: MANIFEST DIFF ACROSS A PURGE BOUNDARY — the cross-EPOCH form
    * x43 deliberately does not cover (its two manifests live in one
    * lineage; see x42 for the coordinate itself). After a
    * [[graft.sources.Store.purgeRestartLineage]] the version axis
    * RESTARTS: "v3 yesterday, v2 today" does not mean the corpus shrank
    * a version — it means yesterday's coordinates belong to a destroyed
    * lineage. A diff that compared raw version numbers (or worse, their
    * contents' checksums alone) would report a plain `changed` and an
    * auditor would miss that HISTORY itself was rewritten. So the diff's
    * status verdict checks the EPOCH first: artifacts whose epochs
    * differ report `lineage_restarted(E_a->E_b)` — the governance event,
    * named — and only same-epoch artifacts fall through to x43's
    * unchanged/changed/new/removed ladder.
    *
    * The DAG is the real sequence: a versioned corpus store takes three
    * ingest days (manifest A is PUBLISHED — landed in a manifest store,
    * the durable-barrier rule: its aggregates read files the purge is
    * about to destroy); a takedown purges the lineage (epoch 1→2); the
    * next ingest day lands in the new epoch; manifest B is computed
    * live from the stores, its `ingest_batch` row read via
    * `readChanges` (the log IS the diff). A never-purged reference-dims
    * store rides along to prove same-epoch artifacts still diff as
    * `unchanged`. The oracle recomputes both manifests from membership
    * predicates and replays the full-outer diff with the same status
    * CASE — so hash equality proves the epoch-aware verdicts, the
    * coordinates, and the content checksums all land exactly where a
    * from-scratch derivation puts them. Scale: manifests are
    * O(artifacts) rows; every aggregate is one map-side-combinable pass
    * over its artifact; the purge is s28's retained rewrite at
    * governance cadence. */
  private val x57EpochManifestDiff = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val M = lit(2147483647L)
      val docs = Tables.documents(s, d)
      val region = Tables.region(s, d)
      def mrow(name: String, df: org.apache.spark.sql.DataFrame, idCol: String,
               ep: Long, v: Long) =
        df.agg(count(lit(1)).as("n_rows"),
            coalesce(pmod(sum((col(idCol) % M) * ((col(idCol) + 7) % M) % M), M),
              lit(0L)).cast(LongType).as("checksum"))
          .select(lit(name).as("artifact"), lit(ep).as("epoch"),
            lit(v).as("version"), col("n_rows"), col("checksum"))
      val (manifestA, manifestB) =
        if (planOnly) {
          val pre = docs.filter(col("doc_id") % 4 >= 1)
          val post = docs.filter(
            (col("doc_id") % 4 >= 1 && col("doc_id") % 6 =!= 0)
              || col("doc_id") % 4 === 0)
          val bat = docs.filter(col("doc_id") % 4 === 0)
          (mrow("corpus", pre, "doc_id", 1L, 3L)
             .unionByName(mrow("reference_dims", region, "r_regionkey", 1L, 1L)),
           mrow("corpus", post, "doc_id", 2L, 2L)
             .unionByName(mrow("reference_dims", region, "r_regionkey", 1L, 1L))
             .unionByName(mrow("ingest_batch", bat, "doc_id", 2L, 2L)))
        } else x57Cache.computeIfAbsent(
          s"${s.sparkContext.applicationId}:$d", _ => {
          val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
            s"epoch_diff_${s.sparkContext.applicationId}_${math.abs(d.hashCode)}"
          val src = graft.sources.Store(s, s"$base/corpus", "source")
          val dims = graft.sources.Store(s, s"$base/dims", "r_regionkey")
          val mst = graft.sources.Store(s, s"$base/manifest", "artifact")
          Seq(src, dims, mst).foreach(_.destroy())
          (1 to 3).foreach(r =>
            src.appendVersioned(docs.filter(col("doc_id") % 4 === r)))
          dims.appendVersioned(region)
          def coord(st: graft.sources.Store) =
            (st.epoch, st.versions.lastOption.getOrElse(0L))
          // PUBLISH manifest A before the purge: its aggregates read the
          // files the purge destroys, so the store append is the barrier
          val (e1, v1) = coord(src); val (de, dv) = coord(dims)
          mst.append(
            mrow("corpus", src.read, "doc_id", e1, v1)
              .unionByName(mrow("reference_dims", dims.read, "r_regionkey", de, dv)))
          // the governance request, then the next ingest day in epoch 2
          src.purgeRestartLineage(col("doc_id") % 6 === 0)
          src.appendVersioned(docs.filter(col("doc_id") % 4 === 0))
          val (e2, v2) = coord(src)
          val manB = mrow("corpus", src.read, "doc_id", e2, v2)
            .unionByName(mrow("reference_dims", dims.read, "r_regionkey", de, dv))
            // the batch artifact reads ONLY the changed files off the log
            .unionByName(mrow("ingest_batch", src.readChanges(v2 - 1, v2),
              "doc_id", e2, v2))
          (mst.read.select("artifact", "epoch", "version", "n_rows", "checksum"),
            manB)
        })
      val a = manifestA.select(col("artifact"), col("epoch").as("ea"),
        col("version").as("va"), col("n_rows").as("na"), col("checksum").as("ca"))
      val b = manifestB.select(col("artifact"), col("epoch").as("eb"),
        col("version").as("vb"), col("n_rows").as("nb"), col("checksum").as("cb"))
      a.join(b, Seq("artifact"), "full_outer")
        .select(col("artifact"),
          when(col("na").isNull, lit("new"))
            .when(col("nb").isNull, lit("removed"))
            .when(col("ea") =!= col("eb"),
              concat(lit("lineage_restarted("), col("ea").cast("string"),
                lit("->"), col("eb").cast("string"), lit(")")))
            .when(col("na") === col("nb") && col("ca") === col("cb"), lit("unchanged"))
            .otherwise(lit("changed")).as("status"),
          coalesce(col("ea"), lit(0L)).cast(LongType).as("epoch_a"),
          coalesce(col("eb"), lit(0L)).cast(LongType).as("epoch_b"),
          coalesce(col("va"), lit(0L)).cast(LongType).as("version_a"),
          coalesce(col("vb"), lit(0L)).cast(LongType).as("version_b"),
          coalesce(col("na"), lit(0L)).cast(LongType).as("n_rows_a"),
          coalesce(col("nb"), lit(0L)).cast(LongType).as("n_rows_b"),
          coalesce(col("ca"), lit(0L)).cast(LongType).as("checksum_a"),
          coalesce(col("cb"), lit(0L)).cast(LongType).as("checksum_b"))
        .orderBy("artifact")
    },
    """WITH pre AS (SELECT doc_id FROM documents WHERE doc_id % 4 IN (1, 2, 3)),
      |post AS (SELECT doc_id FROM documents
      |  WHERE (doc_id % 4 IN (1, 2, 3) AND doc_id % 6 <> 0) OR doc_id % 4 = 0),
      |bat AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 0),
      |ma AS (
      |  SELECT 'corpus' AS artifact, CAST(1 AS BIGINT) AS epoch,
      |    CAST(3 AS BIGINT) AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(COALESCE(SUM((doc_id % 2147483647) * ((doc_id + 7) % 2147483647)
      |      % 2147483647), 0) % 2147483647 AS BIGINT) AS checksum
      |  FROM pre
      |  UNION ALL
      |  SELECT 'reference_dims', CAST(1 AS BIGINT), CAST(1 AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT),
      |    CAST(COALESCE(SUM((r_regionkey % 2147483647)
      |      * ((r_regionkey + 7) % 2147483647) % 2147483647), 0)
      |      % 2147483647 AS BIGINT)
      |  FROM region),
      |mb AS (
      |  SELECT 'corpus' AS artifact, CAST(2 AS BIGINT) AS epoch,
      |    CAST(2 AS BIGINT) AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(COALESCE(SUM((doc_id % 2147483647) * ((doc_id + 7) % 2147483647)
      |      % 2147483647), 0) % 2147483647 AS BIGINT) AS checksum
      |  FROM post
      |  UNION ALL
      |  SELECT 'reference_dims', CAST(1 AS BIGINT), CAST(1 AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT),
      |    CAST(COALESCE(SUM((r_regionkey % 2147483647)
      |      * ((r_regionkey + 7) % 2147483647) % 2147483647), 0)
      |      % 2147483647 AS BIGINT)
      |  FROM region
      |  UNION ALL
      |  SELECT 'ingest_batch', CAST(2 AS BIGINT), CAST(2 AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT),
      |    CAST(COALESCE(SUM((doc_id % 2147483647) * ((doc_id + 7) % 2147483647)
      |      % 2147483647), 0) % 2147483647 AS BIGINT)
      |  FROM bat)
      |SELECT COALESCE(a.artifact, b.artifact) AS artifact,
      |  CASE WHEN a.artifact IS NULL THEN 'new'
      |       WHEN b.artifact IS NULL THEN 'removed'
      |       WHEN a.epoch <> b.epoch THEN 'lineage_restarted('
      |         || CAST(a.epoch AS VARCHAR) || '->' || CAST(b.epoch AS VARCHAR) || ')'
      |       WHEN a.n_rows = b.n_rows AND a.checksum = b.checksum
      |         THEN 'unchanged'
      |       ELSE 'changed' END AS status,
      |  CAST(COALESCE(a.epoch, 0) AS BIGINT) AS epoch_a,
      |  CAST(COALESCE(b.epoch, 0) AS BIGINT) AS epoch_b,
      |  CAST(COALESCE(a.version, 0) AS BIGINT) AS version_a,
      |  CAST(COALESCE(b.version, 0) AS BIGINT) AS version_b,
      |  CAST(COALESCE(a.n_rows, 0) AS BIGINT) AS n_rows_a,
      |  CAST(COALESCE(b.n_rows, 0) AS BIGINT) AS n_rows_b,
      |  CAST(COALESCE(a.checksum, 0) AS BIGINT) AS checksum_a,
      |  CAST(COALESCE(b.checksum, 0) AS BIGINT) AS checksum_b
      |FROM ma a FULL OUTER JOIN mb b ON a.artifact = b.artifact
      |ORDER BY artifact""".stripMargin)

  private val x60Cache = new java.util.concurrent.ConcurrentHashMap[
    String, (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]()

  /** x60: REPAIR-AWARE MANIFEST DIFF — closing the r12 verdict's "an
    * adoptOrphans() repair version is indistinguishable from a normal
    * append in x42/x43": the log entry knows (the store TAGS repair
    * versions — [[graft.sources.Store.adoptOrphans]] drops a
    * `.v<N>_repair` marker, read back via `isRepairVersion`), so a
    * manifest diff can report `repaired` instead of a spurious `changed`
    * that sends an auditor hunting for an ingest batch that never ran.
    * The DAG is the real incident: two versioned ingest days land; a
    * writer CRASHES between its data append and its log write (files on
    * disk, version never recorded — the orphan shape the next versioned
    * writer refuses over); the operator runs the named repair; meanwhile
    * a control store takes a NORMAL append in the same window and a
    * second control store takes none. Manifest A is re-derived from the
    * version log at the pre-incident coordinate (`readVersion` — the log
    * IS the reproducibility contract, no pre-published copy needed when
    * nothing is destroyed; contrast x57, where the purge forces the
    * durable barrier); manifest B reads the current coordinates plus
    * each artifact's `via_repair` flag — true iff every version since A
    * is a tagged repair (metadata-only: one marker existence check per
    * new version). The diff ladder extends x57's: new / removed /
    * lineage_restarted / unchanged / REPAIRED / changed — so the three
    * artifacts land on three distinct verdicts (repaired, unchanged,
    * changed) and the oracle, recomputing every aggregate from
    * membership predicates and replaying the CASE, pins each one.
    * Scale: manifests are O(artifacts) metadata rows; the repair itself
    * is O(orphaned files) log writing, never a data rewrite. */
  private val x60RepairManifest = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val M = lit(2147483647L)
      val docs = Tables.documents(s, d)
      val nation = Tables.nation(s, d)
      val region = Tables.region(s, d)
      def mrow(name: String, df: org.apache.spark.sql.DataFrame, idCol: String,
               ep: Long, v: Long, viaRepair: Boolean) =
        df.agg(count(lit(1)).as("n_rows"),
            coalesce(pmod(sum((col(idCol) % M) * ((col(idCol) + 7) % M) % M), M),
              lit(0L)).cast(LongType).as("checksum"))
          .select(lit(name).as("artifact"), lit(ep).as("epoch"),
            lit(v).as("version"), col("n_rows"), col("checksum"),
            lit(viaRepair).as("via_repair"))
      val (manifestA, manifestB) =
        if (planOnly) {
          val pre = docs.filter(col("doc_id") % 3 >= 1)
          val auxPre = nation.filter(col("n_nationkey") < 13)
          (mrow("corpus", pre, "doc_id", 1L, 2L, viaRepair = false)
             .unionByName(mrow("reference_dims", region, "r_regionkey",
               1L, 1L, viaRepair = false))
             .unionByName(mrow("aux_dims", auxPre, "n_nationkey",
               1L, 1L, viaRepair = false)),
           mrow("corpus", docs, "doc_id", 1L, 3L, viaRepair = true)
             .unionByName(mrow("reference_dims", region, "r_regionkey",
               1L, 1L, viaRepair = false))
             .unionByName(mrow("aux_dims", nation, "n_nationkey",
               1L, 2L, viaRepair = false)))
        } else x60Cache.computeIfAbsent(
          s"${s.sparkContext.applicationId}:$d", _ => {
          val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
            s"repair_man_${s.sparkContext.applicationId}_${math.abs(d.hashCode)}"
          val src = graft.sources.Store(s, s"$base/corpus", "source")
          val dims = graft.sources.Store(s, s"$base/dims", "r_regionkey")
          val aux = graft.sources.Store(s, s"$base/aux", "n_nationkey")
          Seq(src, dims, aux).foreach(_.destroy())
          (1 to 2).foreach(r =>
            src.appendVersioned(docs.filter(col("doc_id") % 3 === r)))
          dims.appendVersioned(region)
          aux.appendVersioned(nation.filter(col("n_nationkey") < 13))
          // manifest-A coordinates, recorded as metadata before the incident
          val (va, dv, xv) =
            (src.versions.last, dims.versions.last, aux.versions.last)
          // ---- the crash: a writer's data files land, its log write
          // never runs (the orphan shape appendVersioned refuses over)
          src.append(docs.filter(col("doc_id") % 3 === 0))
          intercept(src) // the refusal is part of the contract — assert it
          val rv = src.adoptOrphans()
          require(rv.contains(va + 1), s"repair version unexpected: $rv")
          // normal growth on the aux store in the same window
          aux.appendVersioned(nation.filter(col("n_nationkey") >= 13))
          def viaRepair(st: graft.sources.Store, fromV: Long): Boolean = {
            val nv = st.versions.filter(_ > fromV)
            nv.nonEmpty && nv.forall(st.isRepairVersion)
          }
          val manA =
            mrow("corpus", src.readVersion(va), "doc_id", src.epoch, va,
              viaRepair = false)
            .unionByName(mrow("reference_dims", dims.readVersion(dv),
              "r_regionkey", dims.epoch, dv, viaRepair = false))
            .unionByName(mrow("aux_dims", aux.readVersion(xv), "n_nationkey",
              aux.epoch, xv, viaRepair = false))
          val manB =
            mrow("corpus", src.read, "doc_id", src.epoch, src.versions.last,
              viaRepair(src, va))
            .unionByName(mrow("reference_dims", dims.read, "r_regionkey",
              dims.epoch, dims.versions.last, viaRepair(dims, dv)))
            .unionByName(mrow("aux_dims", aux.read, "n_nationkey",
              aux.epoch, aux.versions.last, viaRepair(aux, xv)))
          (manA, manB)
        })
      val a = manifestA.select(col("artifact"), col("epoch").as("ea"),
        col("version").as("va"), col("n_rows").as("na"), col("checksum").as("ca"))
      val b = manifestB.select(col("artifact"), col("epoch").as("eb"),
        col("version").as("vb"), col("n_rows").as("nb"), col("checksum").as("cb"),
        col("via_repair"))
      a.join(b, Seq("artifact"), "full_outer")
        .select(col("artifact"),
          when(col("na").isNull, lit("new"))
            .when(col("nb").isNull, lit("removed"))
            .when(col("ea") =!= col("eb"),
              concat(lit("lineage_restarted("), col("ea").cast("string"),
                lit("->"), col("eb").cast("string"), lit(")")))
            .when(col("na") === col("nb") && col("ca") === col("cb"),
              lit("unchanged"))
            .when(col("via_repair"), lit("repaired"))
            .otherwise(lit("changed")).as("status"),
          coalesce(col("va"), lit(0L)).cast(LongType).as("version_a"),
          coalesce(col("vb"), lit(0L)).cast(LongType).as("version_b"),
          coalesce(col("na"), lit(0L)).cast(LongType).as("n_rows_a"),
          coalesce(col("nb"), lit(0L)).cast(LongType).as("n_rows_b"),
          coalesce(col("ca"), lit(0L)).cast(LongType).as("checksum_a"),
          coalesce(col("cb"), lit(0L)).cast(LongType).as("checksum_b"))
        .orderBy("artifact")
    },
    """WITH pre AS (SELECT doc_id FROM documents WHERE doc_id % 3 IN (1, 2)),
      |axp AS (SELECT n_nationkey FROM nation WHERE n_nationkey < 13),
      |ma AS (
      |  SELECT 'corpus' AS artifact, CAST(1 AS BIGINT) AS epoch,
      |    CAST(2 AS BIGINT) AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(COALESCE(SUM((doc_id % 2147483647) * ((doc_id + 7) % 2147483647)
      |      % 2147483647), 0) % 2147483647 AS BIGINT) AS checksum
      |  FROM pre
      |  UNION ALL
      |  SELECT 'reference_dims', CAST(1 AS BIGINT), CAST(1 AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT),
      |    CAST(COALESCE(SUM((r_regionkey % 2147483647)
      |      * ((r_regionkey + 7) % 2147483647) % 2147483647), 0)
      |      % 2147483647 AS BIGINT)
      |  FROM region
      |  UNION ALL
      |  SELECT 'aux_dims', CAST(1 AS BIGINT), CAST(1 AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT),
      |    CAST(COALESCE(SUM((n_nationkey % 2147483647)
      |      * ((n_nationkey + 7) % 2147483647) % 2147483647), 0)
      |      % 2147483647 AS BIGINT)
      |  FROM axp),
      |mb AS (
      |  SELECT 'corpus' AS artifact, CAST(1 AS BIGINT) AS epoch,
      |    CAST(3 AS BIGINT) AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(COALESCE(SUM((doc_id % 2147483647) * ((doc_id + 7) % 2147483647)
      |      % 2147483647), 0) % 2147483647 AS BIGINT) AS checksum,
      |    TRUE AS via_repair
      |  FROM documents
      |  UNION ALL
      |  SELECT 'reference_dims', CAST(1 AS BIGINT), CAST(1 AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT),
      |    CAST(COALESCE(SUM((r_regionkey % 2147483647)
      |      * ((r_regionkey + 7) % 2147483647) % 2147483647), 0)
      |      % 2147483647 AS BIGINT), FALSE
      |  FROM region
      |  UNION ALL
      |  SELECT 'aux_dims', CAST(1 AS BIGINT), CAST(2 AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT),
      |    CAST(COALESCE(SUM((n_nationkey % 2147483647)
      |      * ((n_nationkey + 7) % 2147483647) % 2147483647), 0)
      |      % 2147483647 AS BIGINT), FALSE
      |  FROM nation)
      |SELECT COALESCE(a.artifact, b.artifact) AS artifact,
      |  CASE WHEN a.artifact IS NULL THEN 'new'
      |       WHEN b.artifact IS NULL THEN 'removed'
      |       WHEN a.epoch <> b.epoch THEN 'lineage_restarted('
      |         || CAST(a.epoch AS VARCHAR) || '->' || CAST(b.epoch AS VARCHAR) || ')'
      |       WHEN a.n_rows = b.n_rows AND a.checksum = b.checksum
      |         THEN 'unchanged'
      |       WHEN b.via_repair THEN 'repaired'
      |       ELSE 'changed' END AS status,
      |  CAST(COALESCE(a.version, 0) AS BIGINT) AS version_a,
      |  CAST(COALESCE(b.version, 0) AS BIGINT) AS version_b,
      |  CAST(COALESCE(a.n_rows, 0) AS BIGINT) AS n_rows_a,
      |  CAST(COALESCE(b.n_rows, 0) AS BIGINT) AS n_rows_b,
      |  CAST(COALESCE(a.checksum, 0) AS BIGINT) AS checksum_a,
      |  CAST(COALESCE(b.checksum, 0) AS BIGINT) AS checksum_b
      |FROM ma a FULL OUTER JOIN mb b ON a.artifact = b.artifact
      |ORDER BY artifact""".stripMargin)

  /** The orphan refusal x60's incident step contracts on: the next
    * versioned write after the crash must fail loudly naming the repair —
    * asserted inline so the lifecycle cannot silently degrade into a
    * plain append if the guard ever regressed. */
  private def intercept(st: graft.sources.Store): Unit = {
    val refused =
      try { st.appendVersioned(st.read.limit(0)); false }
      catch { case e: IllegalArgumentException =>
        e.getMessage.contains("adoptOrphans") }
    require(refused, "orphaned files did not trip the versioned-write guard")
  }

  /** x44: TAKEDOWN PROPAGATION — the deletion E2 the manifest's artifact
    * set needs: a removal list (a takedown / right-to-be-forgotten batch,
    * here the deterministic `doc_id % 17 = 3` slice, vectors by the same
    * rule on vec_id) propagated through EVERY stored artifact the run
    * manifest (x42) covers, each by its own production-correct
    * incremental rule, never a from-scratch rebuild:
    *
    *  - survivor_set / train_run: TOMBSTONE delete — gate decisions and
    *    shard assignments are frozen at build time; a takedown removes
    *    documents, it does not re-adjudicate the others or re-balance the
    *    run (re-curation is the next release's job, and the manifest diff
    *    shows exactly what the tombstones did to the totals).
    *  - lm_model: SUBTRACT-merge — bigram counts are additive, so the
    *    removed docs' counts merge in NEGATED ([[Lm.mergeCounts]]) and
    *    rows that reach zero leave the relation. The oracle refits on the
    *    retained corpus, so hash equality proves subtract ≡ refit — the
    *    count-unlearning rule that makes model takedown O(removed), not
    *    O(corpus).
    *  - canonical_map: TOUCHED-CLUSTER relabel — the delete-side dual of
    *    x39's arrival resolution. Removing a doc can SPLIT its cluster
    *    (the removed doc may be the only LSH bridge between two
    *    sub-families) and can take the cluster's min-id LABEL with it, so
    *    tombstoning the map would leave wrong downstream dedup decisions.
    *    LSH band collisions are pairwise, so edges partition by original
    *    cluster: it suffices to re-run CC over the retained members of
    *    TOUCHED clusters only (O(touched), never O(corpus)); untouched
    *    clusters keep their labels (their min member is still present).
    *    The oracle recomputes the full CC over the retained corpus —
    *    equality proves touched-only ≡ full recompute, ids included.
    *  - ann_index: TOMBSTONE delete of member rows; the centroids stay.
    *    Centroids are aggregate model parameters, not copies of any
    *    member (y17's refit is where they get re-derived), and retained
    *    assignments are per-vector argmins — unaffected by other rows
    *    leaving. The oracle re-assigns the retained vectors from scratch
    *    against the same anchors.
    *
    * Output: one row per artifact — rows before/removed/after, the
    * domain total after (tokens / clean tokens / bigram mass / distinct
    * clusters / cells in use), and the artifact's content checksum after
    * (x42's lattice formulas), all computed from the incrementally-EDITED
    * stored artifacts while the oracle recomputes every artifact from the
    * retained corpus. Scale: every update is O(removed + touched) against
    * partitioned stores; aggregates are map-side combinable. */
  private val x44Takedown = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val M = lit(2147483647L)
      val docs = Tables.documents(s, d)
      val rmDoc = col("doc_id") % 17 === 3
      val surv =
        if (planOnly) v5Survivors(docs)
        else v5SurvivorsStored(s, d)
      val run =
        if (planOnly) Sampling.shardAssign(scrubbedSurvivors(s, d),
          Seq("doc_id"), "clean_toks", nShards = 16)
        else x41StoredRun(s, d)
      val lm =
        if (planOnly) graft.operators.Lm.bigramCounts(
          docs.filter(col("doc_id") % 10 =!= 0))
        else x40LmStored(s, d)
      val bm =
        if (planOnly) baseMapFit(s, d).select("doc_id", "cluster_id")
        else baseMapStored(s, d)
      val e = Tables.embeddings(s, d)
      val idx =
        if (planOnly)
          Similarity.ivfAssign(e, y18Anchors(e), "vec_id", "embedding")
            .select(col("vec_id"), col("cell"), col("cell_d2"))
        else y18StoredIndex(s, d)

      // tombstone artifacts: one conditional-aggregation pass each
      val survRow = surv.agg(
          count(lit(1)).as("n_before"),
          sum(when(rmDoc, 1L).otherwise(0L)).cast(LongType).as("n_removed"),
          sum(when(!rmDoc, 1L).otherwise(0L)).cast(LongType).as("n_after"),
          sum(when(!rmDoc, size(split(col("text"), " ")).cast(LongType))
            .otherwise(0L)).cast(LongType).as("total_after"),
          pmod(sum(when(!rmDoc, (col("doc_id") % M) * (col("doc_id") % M) % M)
            .otherwise(0L)), M).cast(LongType).as("checksum_after"))
        .select(lit("survivor_set").as("artifact"), col("n_before"),
          col("n_removed"), col("n_after"), col("total_after"), col("checksum_after"))
      val runRow = run.agg(
          count(lit(1)).as("n_before"),
          sum(when(rmDoc, 1L).otherwise(0L)).cast(LongType).as("n_removed"),
          sum(when(!rmDoc, 1L).otherwise(0L)).cast(LongType).as("n_after"),
          sum(when(!rmDoc, col("clean_toks")).otherwise(0L))
            .cast(LongType).as("total_after"),
          pmod(sum(when(!rmDoc,
            (col("doc_id") % M) * ((col("shard") + 1) % M) % M).otherwise(0L)), M)
            .cast(LongType).as("checksum_after"))
        .select(lit("train_run").as("artifact"), col("n_before"),
          col("n_removed"), col("n_after"), col("total_after"), col("checksum_after"))
      val rmVec = col("vec_id") % 17 === 3
      val idxRow = idx.agg(
          count(lit(1)).as("n_before"),
          sum(when(rmVec, 1L).otherwise(0L)).cast(LongType).as("n_removed"),
          sum(when(!rmVec, 1L).otherwise(0L)).cast(LongType).as("n_after"),
          countDistinct(when(!rmVec, col("cell"))).cast(LongType).as("total_after"),
          pmod(sum(when(!rmVec,
            (col("vec_id") % M) * ((col("cell") + 1) % M) % M).otherwise(0L)), M)
            .cast(LongType).as("checksum_after"))
        .select(lit("ann_index").as("artifact"), col("n_before"),
          col("n_removed"), col("n_after"), col("total_after"), col("checksum_after"))

      // lm_model: subtract-merge, zeroed rows leave
      val rmCounts = graft.operators.Lm.bigramCounts(
        docs.filter(col("doc_id") % 10 =!= 0 && rmDoc))
      val lmAfter = graft.operators.Lm.mergeCounts(
          lm, rmCounts.withColumn("n_bg", -col("n_bg")))
        .filter(col("n_bg") =!= 0)
      val lmRow = lm.agg(count(lit(1)).as("n_before"))
        .crossJoin(lmAfter.agg(
          count(lit(1)).as("n_after"),
          sum(col("n_bg")).cast(LongType).as("total_after"),
          pmod(sum(
            (TextAnalysis.hash32(col("prev")) * 31 + TextAnalysis.hash32(col("cur"))) % M
              * (col("n_bg") % M) % M), M).cast(LongType).as("checksum_after")))
        .select(lit("lm_model").as("artifact"), col("n_before"),
          (col("n_before") - col("n_after")).cast(LongType).as("n_removed"),
          col("n_after"), col("total_after"), col("checksum_after"))

      // canonical_map: touched-cluster relabel
      val touched = bm.filter(rmDoc).select("cluster_id").distinct()
      val untouched = bm.join(touched, Seq("cluster_id"), "left_anti")
        .select("doc_id", "cluster_id")
      val tRetained = bm.join(touched, Seq("cluster_id"), "left_semi")
        .filter(!rmDoc).select("doc_id")
      val tSig = minhashSig(s, d).join(tRetained, Seq("doc_id"), "left_semi")
      val relab = Dedup.connectedComponents(
        Dedup.lshCandidates(tSig, "doc_id", 8), tRetained, "doc_id")
      val bmAfter = untouched.unionByName(relab.select("doc_id", "cluster_id"))
      val bmRow = bm.agg(
          count(lit(1)).as("n_before"),
          sum(when(rmDoc, 1L).otherwise(0L)).cast(LongType).as("n_removed"))
        .crossJoin(bmAfter.agg(
          count(lit(1)).as("n_after"),
          countDistinct(col("cluster_id")).cast(LongType).as("total_after"),
          pmod(sum((col("doc_id") % M) * (col("cluster_id") % M) % M), M)
            .cast(LongType).as("checksum_after")))
        .select(lit("canonical_map").as("artifact"), col("n_before"),
          col("n_removed"), col("n_after"), col("total_after"), col("checksum_after"))

      survRow.unionByName(runRow).unionByName(lmRow).unionByName(bmRow)
        .unionByName(idxRow)
        .orderBy("artifact")
    },
    s"""WITH RECURSIVE $x37ScrubCtes,
       |tshr AS (SELECT doc_id, clean_toks,
       |    ROW_NUMBER() OVER (ORDER BY clean_toks DESC, doc_id) AS rnk FROM cl),
       |tsh AS (SELECT doc_id, clean_toks, CAST((rnk - 1) % 16 AS INT) AS shard FROM tshr),
       |qbt AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |  WHERE doc_id % 10 <> 0),
       |qbp AS (SELECT l[i] AS prev, l[i+1] AS cur
       |  FROM (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
       |        FROM qbt WHERE len(l) >= 2)),
       |qbc AS (SELECT prev, cur, COUNT(*) AS n_bg FROM qbp GROUP BY 1, 2),
       |qrt AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |  WHERE doc_id % 10 <> 0 AND doc_id % 17 <> 3),
       |qrp AS (SELECT l[i] AS prev, l[i+1] AS cur
       |  FROM (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
       |        FROM qrt WHERE len(l) >= 2)),
       |qrc AS (SELECT prev, cur, COUNT(*) AS n_bg FROM qrp GROUP BY 1, 2),
       |${minhashCtesFor(
           "(SELECT * FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 17 <> 3)", "r")},
       |rbands AS (${bandsSqlFor("r")}),
       |rpairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM rbands a JOIN rbands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |redges AS (SELECT doc_a AS src, doc_b AS dst FROM rpairs
       |           UNION ALL SELECT doc_b, doc_a FROM rpairs),
       |rreach(node, r) AS (
       |  SELECT src, src FROM redges
       |  UNION
       |  SELECT e.dst, rreach.r FROM redges e JOIN rreach ON e.src = rreach.node),
       |rcomp AS (SELECT node, min(r) AS cid FROM rreach GROUP BY 1),
       |rlbl AS (SELECT d.doc_id, COALESCE(rcomp.cid, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN rcomp ON d.doc_id = rcomp.node
       |  WHERE d.doc_id % 10 <> 0 AND d.doc_id % 17 <> 3),
       |tev AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |teanch AS (SELECT vec_id AS anchor_id, vd AS avd FROM tev
       |           WHERE vec_id BETWEEN 1 AND $IvfCells),
       |tedist AS (SELECT v.vec_id, a.anchor_id,
       |    ROUND(${dotSql("v.vd", "v.vd")} - 2.0 * ${dotSql("v.vd", "a.avd")}
       |      + ${dotSql("a.avd", "a.avd")}, 6) AS d2
       |  FROM tev v CROSS JOIN teanch a WHERE v.vec_id % 17 <> 3),
       |teasg AS (SELECT vec_id, anchor_id AS cell
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY d2, anchor_id) AS rn FROM tedist) z WHERE rn = 1),
       |trows AS (
       |  SELECT 'survivor_set' AS artifact,
       |    CAST(COUNT(*) AS BIGINT) AS n_before,
       |    CAST(SUM(CASE WHEN doc_id % 17 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |    CAST(SUM(CASE WHEN doc_id % 17 <> 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
       |    CAST(SUM(CASE WHEN doc_id % 17 <> 3
       |      THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT) AS total_after,
       |    CAST(SUM(CASE WHEN doc_id % 17 <> 3
       |      THEN (doc_id % 2147483647) * (doc_id % 2147483647) % 2147483647
       |      ELSE 0 END) % 2147483647 AS BIGINT) AS checksum_after
       |  FROM surv
       |  UNION ALL
       |  SELECT 'train_run', CAST(COUNT(*) AS BIGINT),
       |    CAST(SUM(CASE WHEN doc_id % 17 = 3 THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN doc_id % 17 <> 3 THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN doc_id % 17 <> 3 THEN clean_toks ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN doc_id % 17 <> 3
       |      THEN (doc_id % 2147483647) * ((shard + 1) % 2147483647) % 2147483647
       |      ELSE 0 END) % 2147483647 AS BIGINT)
       |  FROM tsh
       |  UNION ALL
       |  SELECT 'lm_model', (SELECT CAST(COUNT(*) AS BIGINT) FROM qbc),
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM qbc)
       |      - (SELECT CAST(COUNT(*) AS BIGINT) FROM qrc),
       |    CAST(COUNT(*) AS BIGINT),
       |    CAST(SUM(n_bg) AS BIGINT),
       |    CAST(SUM(((${h32Sql("prev")} * 31 + ${h32Sql("cur")}) % 2147483647)
       |      * (n_bg % 2147483647) % 2147483647) % 2147483647 AS BIGINT)
       |  FROM qrc
       |  UNION ALL
       |  SELECT 'canonical_map',
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE doc_id % 10 <> 0),
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
       |       WHERE doc_id % 10 <> 0 AND doc_id % 17 = 3),
       |    CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(DISTINCT cluster_id) AS BIGINT),
       |    CAST(SUM((doc_id % 2147483647) * (cluster_id % 2147483647) % 2147483647)
       |      % 2147483647 AS BIGINT)
       |  FROM rlbl
       |  UNION ALL
       |  SELECT 'ann_index',
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings),
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings WHERE vec_id % 17 = 3),
       |    CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(DISTINCT cell) AS BIGINT),
       |    CAST(SUM((vec_id % 2147483647) * ((cell + 1) % 2147483647) % 2147483647)
       |      % 2147483647 AS BIGINT)
       |  FROM teasg)
       |SELECT artifact, n_before, n_removed, n_after, total_after, checksum_after
       |FROM trows ORDER BY artifact""".stripMargin)

  /** x45: the SIDECAR MANIFEST — x42's run manifest served from METADATA
    * ONLY. All four artifact stores are now TRACKED (their builders fold
    * per-partition row counts and lattice checksums into `_stats`
    * sidecars at write time — [[graft.sources.Store.trackFrom]]), so this
    * query derives each artifact's manifest row by summing its sidecar:
    * O(partitions) rows read, ZERO data files scanned at query time. The
    * oracle still recomputes every artifact from scratch (the x42 chain),
    * so hash equality proves the write-time metadata equals the
    * from-scratch truth — which is exactly the production division of
    * labor at 100 TB: THIS query is the daily manifest (metadata read),
    * x42 is the periodic deep audit (full scan), and they are gated to
    * agree. Checksum terms are per-partition sums below 2³¹ re-reduced on
    * the lattice, so summing sidecar rows equals the full-relation
    * checksum exactly. */
  private val x45SidecarManifest = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val M = lit(2147483647L)
      if (planOnly) {
        // in-memory equivalents of the sidecar sums: identical terms over
        // the builder frames (no store IO during plan sweeps)
        def row(name: String, df: org.apache.spark.sql.DataFrame,
                term: org.apache.spark.sql.Column) =
          df.agg(count(lit(1)).cast(LongType).as("n_rows"),
              coalesce(pmod(sum(pmod(term, M)), M), lit(0L))
                .cast(LongType).as("checksum"))
            .select(lit(name).as("artifact"), col("n_rows"), col("checksum"))
        val docs = Tables.documents(s, d)
        val run = Sampling.shardAssign(scrubbedSurvivors(s, d),
          Seq("doc_id"), "clean_toks", nShards = 16)
        val lm = graft.operators.Lm.bigramCounts(
          docs.filter(col("doc_id") % 10 =!= 0))
        row("survivor_set", v5Survivors(docs),
            (col("doc_id") % M) * (col("doc_id") % M) % M)
          .unionByName(row("train_run", run,
            (col("doc_id") % M) * ((col("shard") + 1) % M) % M))
          .unionByName(row("lm_model", lm,
            (TextAnalysis.hash32(col("prev")) * 31 + TextAnalysis.hash32(col("cur"))) % M
              * (col("n_bg") % M) % M))
          .unionByName(row("canonical_map", baseMapFit(s, d),
            (col("doc_id") % M) * (col("cluster_id") % M) % M))
          .orderBy("artifact")
      } else {
        // force the builds (and with them the write-time tracking) …
        v5SurvivorsStored(s, d); x41StoredRun(s, d)
        x40LmStored(s, d); baseMapStored(s, d)
        // … then read ONLY the sidecars
        def row(name: String, path: String, partCol: String) =
          graft.sources.Store(s, path, partCol).readStats
            .agg(coalesce(sum(col("n_rows")), lit(0L)).cast(LongType).as("n_rows"),
              coalesce(pmod(sum(col("checksum")), M), lit(0L))
                .cast(LongType).as("checksum"))
            .select(lit(name).as("artifact"), col("n_rows"), col("checksum"))
        row("survivor_set", v5SurvPath(s, d), "source")
          .unionByName(row("train_run", x41RunPath(s, d), "shard"))
          .unionByName(row("lm_model", x40LmPath(s, d), "part"))
          .unionByName(row("canonical_map", baseMapPath(s, d), "part"))
          .orderBy("artifact")
      }
    },
    s"""WITH RECURSIVE $x37ScrubCtes,
       |wwshr AS (SELECT doc_id, clean_toks,
       |    ROW_NUMBER() OVER (ORDER BY clean_toks DESC, doc_id) AS rnk FROM cl),
       |wwsh AS (SELECT doc_id, CAST((rnk - 1) % 16 AS INT) AS shard FROM wwshr),
       |yqt AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |  WHERE doc_id % 10 <> 0),
       |yqp AS (SELECT l[i] AS prev, l[i+1] AS cur
       |  FROM (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
       |        FROM yqt WHERE len(l) >= 2)),
       |yqc AS (SELECT prev, cur, COUNT(*) AS n_bg FROM yqp GROUP BY 1, 2),
       |${minhashCtesFor("(SELECT * FROM documents WHERE doc_id % 10 <> 0)", "y")},
       |ybands AS (${bandsSqlFor("y")}),
       |ypairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ybands a JOIN ybands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |yedges AS (SELECT doc_a AS src, doc_b AS dst FROM ypairs
       |           UNION ALL SELECT doc_b, doc_a FROM ypairs),
       |yreach(node, r) AS (
       |  SELECT src, src FROM yedges
       |  UNION
       |  SELECT e.dst, yreach.r FROM yedges e JOIN yreach ON e.src = yreach.node),
       |ycomp AS (SELECT node, min(r) AS cid FROM yreach GROUP BY 1),
       |ylbl AS (SELECT d.doc_id, COALESCE(ycomp.cid, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN ycomp ON d.doc_id = ycomp.node
       |  WHERE d.doc_id % 10 <> 0),
       |yrows AS (
       |  SELECT 'survivor_set' AS artifact, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(COALESCE(SUM((doc_id % 2147483647) * (doc_id % 2147483647)
       |      % 2147483647), 0) % 2147483647 AS BIGINT) AS checksum
       |  FROM surv
       |  UNION ALL
       |  SELECT 'train_run', CAST(COUNT(*) AS BIGINT),
       |    CAST(COALESCE(SUM((doc_id % 2147483647) * ((shard + 1) % 2147483647)
       |      % 2147483647), 0) % 2147483647 AS BIGINT)
       |  FROM wwsh
       |  UNION ALL
       |  SELECT 'lm_model', CAST(COUNT(*) AS BIGINT),
       |    CAST(COALESCE(SUM(((${h32Sql("prev")} * 31 + ${h32Sql("cur")}) % 2147483647)
       |      * (n_bg % 2147483647) % 2147483647), 0) % 2147483647 AS BIGINT)
       |  FROM yqc
       |  UNION ALL
       |  SELECT 'canonical_map', CAST(COUNT(*) AS BIGINT),
       |    CAST(COALESCE(SUM((doc_id % 2147483647) * (cluster_id % 2147483647)
       |      % 2147483647), 0) % 2147483647 AS BIGINT)
       |  FROM ylbl)
       |SELECT artifact, n_rows, checksum FROM yrows ORDER BY artifact""".stripMargin)

  /** z39: character-entropy quality signal — the compression-ratio proxy
    * low-quality detectors use beside z2's ratio panel: gibberish,
    * base64 blobs and keyboard-mash score HIGH (flat char distribution),
    * template/repeated boilerplate scores LOW. H = −Σ (c/n)·ln(c/n) in
    * nats, assembled as Σ c·snapshot(ln(c/n)) in EXACT decimal (ln at
    * DECIMAL(12,6), integer c scales exactly, shuffle-order-independent)
    * with one double division at the output boundary. One in-scan char
    * explode + a combinable (doc, char) count; the char alphabet bounds
    * the aggregate at ≤ |alphabet| rows per doc. The char stream rides
    * the native `graft_rolling_windows` at k=1 — window fingerprints of
    * width 1 ARE the byte codes (every byte < the modulus), one codegen'd
    * pass emitting a primitive long array; the substring-per-character
    * HOF form measured 12.8 s vs 3.9 s at the 5k-doc soak (one
    * UTF8String allocation per character was the whole difference).
    * ASCII corpus ⇒ byte code ↔ character bijection, so entropy over
    * codes equals entropy over characters. */
  private val z39CharEntropy = Q(
    (s, d) => {
      val chars = Tables.documents(s, d)
        .select(col("doc_id"), length(col("text")).as("n_chars"),
          explode(TextAnalysis.rollingWindows(col("text"), 1)).as("ch"))
      chars.groupBy("doc_id", "n_chars", "ch")
        .agg(count(lit(1)).as("c"))
        .withColumn("term",
          (col("c").cast("decimal(20,0)") *
            log(col("c").cast("double") / col("n_chars")).cast("decimal(12,6)"))
            .cast("decimal(26,6)"))
        .groupBy("doc_id", "n_chars")
        .agg(countDistinct(col("ch")).cast("int").as("n_alphabet"),
          sum(col("term")).as("hsum"))
        .select(col("doc_id"), col("n_chars"), col("n_alphabet"),
          (-col("hsum").cast("double") / col("n_chars")).as("entropy_nats"))
        .orderBy("doc_id")
    },
    """WITH ch AS (SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
      |    unnest(list_transform(regexp_extract_all(text, '.'),
      |      c -> CAST(ascii(c) AS BIGINT))) AS ch
      |  FROM documents),
      |cnt AS (SELECT doc_id, n_chars, ch, COUNT(*) AS c
      |  FROM ch GROUP BY 1, 2, 3),
      |t AS (SELECT doc_id, n_chars, ch,
      |    CAST(c AS DECIMAL(20,0)) *
      |      CAST(ln(CAST(c AS DOUBLE) / n_chars) AS DECIMAL(12,6)) AS term
      |  FROM cnt)
      |SELECT doc_id, n_chars,
      |  CAST(COUNT(DISTINCT ch) AS INT) AS n_alphabet,
      |  -CAST(SUM(term) AS DOUBLE) / n_chars AS entropy_nats
      |FROM t GROUP BY doc_id, n_chars ORDER BY doc_id""".stripMargin)

  /** x12: Bloom pre-filter for incremental exact dedup — the arriving
    * batch (doc_id % 10 = 0) probes a corpus content-hash Bloom so the
    * exact semi-join only runs on probable dups. Like x6, the oracle is a
    * CONTRACT, not a value replay (the filter's bits aren't
    * SQL-expressible): every true dup must be flagged (Bloom false
    * negatives are impossible — `no_false_neg`), and false positives stay
    * under 20% of the batch (`fp_bounded`, sized for ~2% expected); the
    * exact-dup count itself is value-checked. */
  private val x12BloomPrefilter = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val batch = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), md5(col("text")).as("h"))
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      // size the filter from one metadata-cheap row count instead of
      // letting contentBloom re-scan + re-hash the corpus just to count it
      val nCorpus = corpus.count()
      val flagged = Dedup.contentBloom(corpus, "text",
          expectedItems = Some(nCorpus)) match {
        case Some(b) => batch.withColumn("probable",
          call_function("graft_might_contain", lit(b), xxhash64(col("h"))))
        case None => batch.withColumn("probable", lit(false))
      }
      val exact = corpus.select(md5(col("text")).as("h")).distinct()
        .withColumn("is_dup", lit(true))
      flagged.join(exact, Seq("h"), "left")
        .agg(
          count(lit(1)).cast("int").as("n_batch"),
          sum(when(col("is_dup"), 1).otherwise(0)).cast("int").as("n_exact_dup"),
          (sum(when(col("is_dup") && !col("probable"), 1).otherwise(0)) === 0)
            .as("no_false_neg"),
          (sum(when(col("probable") && col("is_dup").isNull, 1).otherwise(0))
            <= count(lit(1)) * lit(0.2)).as("fp_bounded"))
    },
    """WITH b AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 = 0),
      |c AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 10 <> 0)
      |SELECT CAST((SELECT COUNT(*) FROM b) AS INT) AS n_batch,
      |  CAST((SELECT COUNT(*) FROM b JOIN c USING (h)) AS INT) AS n_exact_dup,
      |  TRUE AS no_false_neg,
      |  TRUE AS fp_bounded""".stripMargin)

  /** x13: curation v2 — this round's operators composed as one declared
    * corpus build: (1) chunk-dedup gate (drop docs that keep < 50% of
    * their tokens after corpus-wide keep-first chunk dedup — boilerplate-
    * heavy docs), (2) classifier gate (hashed linear scorer > 0), (3)
    * benchmark decontamination (zero shingle overlap with the held-out
    * eval docs), then deterministic split → per-(split, lang) stats. The
    * 50% gate compares INTEGERS (2·kept ≥ total) — no float ratio to
    * drift. Every stage is the bounded form: min-struct chunk winners,
    * zero-shuffle scoring, broadcast benchmark set; the oracle replays
    * the entire DAG. */
  private val x13CurationV2 = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") % 97 =!= 0)
      val cdKeep = Dedup.chunkDedup(corpus, "doc_id", "text", 20)
        .groupBy("doc_id")
        .agg(sum(col("n_tokens")).as("tok"),
          sum(when(col("kept"), col("n_tokens")).otherwise(0)).as("kept_tok"))
        .filter(col("kept_tok") * 2 >= col("tok"))
        .select("doc_id")
      val qcKeep = corpus
        .withColumn("ws", split(col("text"), " "))
        .filter(TextAnalysis.classifierScore("ws") > 0)
        .select("doc_id")
      val sh = shingles(docs)
      val clean = Dedup.benchmarkOverlap(
          corpus, sh.filter(col("doc_id") % 97 =!= 0),
          sh.filter(col("doc_id") % 97 === 0), "doc_id")
        .filter(!col("contaminated"))
        .select("doc_id")
      corpus
        .join(cdKeep, Seq("doc_id"), "left_semi")
        .join(qcKeep, Seq("doc_id"), "left_semi")
        .join(clean, Seq("doc_id"), "left_semi")
        .withColumn("split", Sampling.splitAssign(col("doc_id"), 80, 10))
        .withColumn("ws_tokens", size(split(col("text"), " ")))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("ws_tokens")).as("total_tokens"))
        .orderBy("split", "lang")
    },
    s"""WITH $shingleCte,
       |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
       |cont AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (s)
       |         WHERE sh.doc_id % 97 <> 0),
       |wl AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |       WHERE doc_id % 97 <> 0),
       |ch AS (SELECT doc_id, l,
       |         unnest(generate_series(0, (len(l) - 1) // 20)) AS chunk_id FROM wl),
       |c AS (SELECT doc_id, chunk_id,
       |        len(list_slice(l, chunk_id * 20 + 1, chunk_id * 20 + 20)) AS n_tokens,
       |        md5(array_to_string(list_slice(l, chunk_id * 20 + 1, chunk_id * 20 + 20), ' ')) AS chash
       |      FROM ch),
       |r AS (SELECT *, ROW_NUMBER() OVER (
       |        PARTITION BY chash ORDER BY doc_id, chunk_id) AS rn FROM c),
       |cd AS (SELECT doc_id FROM r GROUP BY doc_id
       |       HAVING 2 * SUM(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END) >= SUM(n_tokens)),
       |qc AS (SELECT doc_id FROM (
       |         SELECT doc_id, ${classifierScoreSql("string_split(text, ' ')")} AS score
       |         FROM documents WHERE doc_id % 97 <> 0) x
       |       WHERE score > CAST(0 AS DOUBLE)),
       |surv AS (SELECT d.* FROM documents d
       |         JOIN cd USING (doc_id) JOIN qc USING (doc_id)
       |         WHERE d.doc_id % 97 <> 0
       |           AND d.doc_id NOT IN (SELECT doc_id FROM cont)),
       |t AS (SELECT lang, CAST(len(string_split(text, ' ')) AS INT) AS ws,
       |        ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
       |      FROM surv)
       |SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
       |            ELSE 'test' END AS split,
       |  lang, COUNT(*) AS n_docs, CAST(SUM(ws) AS BIGINT) AS total_tokens
       |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** x18: exact substring-span duplication — the corpus-level signal
    * behind suffix-array-style exact-substring dedup (Lee et al.'s
    * "Deduplicating Training Data Makes Language Models Better" shape):
    * every overlapping 8-word span is fingerprinted; a span occurring
    * MORE THAN ONCE anywhere in the corpus (cross-doc or within-doc) is
    * duplicated material, and each document is scored by the fraction of
    * its spans that are. Complements x1 (whole-doc) and x11 (chunk): this
    * catches boilerplate INSIDE otherwise-unique documents. All stages
    * are combinable aggregates keyed on (doc, fp) / fp — linear in corpus
    * tokens, no window, no self-join (see Dedup.spanDupStats). */
  private val x18SpanDedup = Q(
    (s, d) => Dedup.spanDupStats(Tables.documents(s, d), "doc_id", "text", k = 8)
      .orderBy("doc_id"),
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |win AS (
      |  SELECT doc_id, md5(array_to_string(w[i:i+7], ' ')) AS fp
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
      |        FROM ws WHERE len(w) >= 8)),
      |pd AS (SELECT doc_id, fp, COUNT(*) AS c FROM win GROUP BY 1, 2),
      |tot AS (SELECT fp, SUM(c) AS t FROM pd GROUP BY 1),
      |agg AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_windows,
      |    CAST(SUM(CASE WHEN t >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_dup
      |  FROM pd JOIN tot USING (fp) GROUP BY 1)
      |SELECT doc_id, n_windows, n_dup, n_dup / n_windows AS dup_frac
      |FROM agg ORDER BY doc_id""".stripMargin)

  /** x18b: x18's span-duplication panel on the ROLLING word-window
    * fingerprint — one md5 per WORD plus an O(1) Rabin–Karp slide per
    * span instead of an md5 over every k-word concatenation (O(n) vs
    * O(n·k·word-bytes) — the production rung for wide spans, where the
    * per-window md5 constant dominates exactly as m5's soak measured on
    * byte windows). Same dup semantics, same aggregate-only scale shape;
    * the oracle replays the word-hash stream and folds each window's
    * Horner polynomial independently on BOTH lattices (congruent to the
    * rolling form, so residues match bit-for-bit), packing hi·2³¹ + lo
    * into the 62-bit span identity that keeps corpus-wide fingerprint
    * comparison collision-safe at the 10⁹-doc scale. x18 stays declared
    * as the md5-anchored variant. */
  private val x18bSpanRolling = Q(
    (s, d) => Dedup.spanDupStats(Tables.documents(s, d), "doc_id", "text",
        k = 8, rolling = true)
      .orderBy("doc_id"),
    {
      val (ba, ma) = TextAnalysis.RollingA
      val (bb, mb) = TextAnalysis.RollingB
      s"""WITH ws AS (SELECT doc_id,
         |    list_transform(string_split(text, ' '), x -> ${h32Sql("x")}) AS hs
         |  FROM documents),
         |win AS (
         |  SELECT doc_id,
         |    list_reduce(hs[i:i+7], (acc, h) -> (acc * $ba + h) % $ma) * 2147483648
         |      + list_reduce(hs[i:i+7], (acc, h) -> (acc * $bb + h) % $mb) AS fp
         |  FROM (SELECT doc_id, hs, unnest(generate_series(1, len(hs) - 7)) AS i
         |        FROM ws WHERE len(hs) >= 8)),
         |pd AS (SELECT doc_id, fp, COUNT(*) AS c FROM win GROUP BY 1, 2),
         |tot AS (SELECT fp, SUM(c) AS t FROM pd GROUP BY 1),
         |agg AS (
         |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_windows,
         |    CAST(SUM(CASE WHEN t >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_dup
         |  FROM pd JOIN tot USING (fp) GROUP BY 1)
         |SELECT doc_id, n_windows, n_dup, n_dup / n_windows AS dup_frac
         |FROM agg ORDER BY doc_id""".stripMargin
    })

  /** x35: duplicate-span REMOVAL — x18 detects and scores, this one edits:
    * every 8-word window occurring ≥ 2 times corpus-wide is stripped from
    * its document and the remainder survives (Lee et al.'s ExactSubstr
    * production shape — remove the duplicated bytes, don't drop the doc).
    * Overlapping/touching dup windows merge into maximal spans (equal
    * window widths make the island rule adjacent-start gap arithmetic);
    * untouched docs pass through as the ORIGINAL string. The oracle
    * replays positions, the dup-fp set, the island merge, and the token
    * rebuild — `clean_text` is exact-string-compared, so the
    * reconstruction itself is hash-gated. Scale shape: in-scan posexplode,
    * one combinable fp count, an unhinted fp-keyed verdict join, and
    * row-local HOF island/rebuild — no window function, no corpus sort
    * (see Dedup.spanScrub's scaladoc). */
  private val x35SpanScrub = Q(
    (s, d) => Dedup.spanScrub(Tables.documents(s, d), "doc_id", "text", k = 8)
      .orderBy("doc_id"),
    """WITH ws AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      |pos AS (
      |  SELECT doc_id, i AS pos, md5(array_to_string(w[i:i+7], ' ')) AS fp
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
      |        FROM ws WHERE len(w) >= 8)),
      |dupfp AS (SELECT fp FROM pos GROUP BY fp HAVING COUNT(*) >= 2),
      |dpt AS (
      |  SELECT doc_id, list_sort(list(pos)) AS dp, CAST(COUNT(*) AS INT) AS n_dup
      |  FROM pos JOIN dupfp USING (fp) GROUP BY 1),
      |j AS (
      |  SELECT ws.doc_id, ws.text, ws.w,
      |    coalesce(dpt.dp, CAST([] AS BIGINT[])) AS dp,
      |    coalesce(dpt.n_dup, 0) AS n_dup
      |  FROM ws LEFT JOIN dpt USING (doc_id)),
      |kpt AS (
      |  SELECT *, list_filter(generate_series(1, len(w)),
      |    jj -> len(list_filter(dp, p -> jj >= p AND jj <= p + 7)) = 0) AS kept
      |  FROM j)
      |SELECT doc_id, CAST(len(w) AS INT) AS n_tokens, n_dup AS n_dup_windows,
      |  CASE WHEN len(dp) = 0 THEN 0
      |       ELSE CAST(len(list_filter(generate_series(1, len(dp)),
      |              i -> i = 1 OR dp[i] - dp[i-1] > 8)) AS INT)
      |  END AS n_spans_removed,
      |  CAST(len(w) - len(kept) AS INT) AS n_removed_tokens,
      |  len(kept) / len(w) AS clean_frac,
      |  CASE WHEN n_dup = 0 THEN text
      |       ELSE coalesce(array_to_string(list_transform(kept, jj -> w[jj]), ' '), '')
      |  END AS clean_text
      |FROM kpt ORDER BY doc_id""".stripMargin)

  /** x35b: x35's span scrub on the ROLLING dual-lattice fingerprint —
    * one md5 per WORD plus an O(1) Rabin–Karp slide per window instead
    * of an md5 over every 8-word concatenation (x18b's production rung,
    * applied to the EDIT: soak measured the md5 form 3.5→24.4 s at
    * 1×→10× where the span-stats rolling rung runs ~2.4×). Same island
    * semantics, same reconstruction, 62-bit fingerprint identity for the
    * corpus-wide dup verdict; the oracle folds each window's Horner
    * polynomial independently on both lattices (congruent to the rolling
    * update — residues match bit-for-bit). x35 stays declared as the
    * md5-anchored variant. */
  private val x35bSpanScrubRolling = Q(
    (s, d) => Dedup.spanScrub(Tables.documents(s, d), "doc_id", "text",
        k = 8, rolling = true)
      .orderBy("doc_id"),
    {
      val (ba, ma) = TextAnalysis.RollingA
      val (bb, mb) = TextAnalysis.RollingB
      s"""WITH ws AS (SELECT doc_id, text,
         |    list_transform(string_split(text, ' '), x -> ${h32Sql("x")}) AS hs,
         |    string_split(text, ' ') AS w
         |  FROM documents),
         |pos AS (
         |  SELECT doc_id, i AS pos,
         |    list_reduce(hs[i:i+7], (acc, h) -> (acc * $ba + h) % $ma) * 2147483648
         |      + list_reduce(hs[i:i+7], (acc, h) -> (acc * $bb + h) % $mb) AS fp
         |  FROM (SELECT doc_id, hs, unnest(generate_series(1, len(hs) - 7)) AS i
         |        FROM ws WHERE len(hs) >= 8)),
         |dupfp AS (SELECT fp FROM pos GROUP BY fp HAVING COUNT(*) >= 2),
         |dpt AS (
         |  SELECT doc_id, list_sort(list(pos)) AS dp, CAST(COUNT(*) AS INT) AS n_dup
         |  FROM pos JOIN dupfp USING (fp) GROUP BY 1),
         |j AS (
         |  SELECT ws.doc_id, ws.text, ws.w,
         |    coalesce(dpt.dp, CAST([] AS BIGINT[])) AS dp,
         |    coalesce(dpt.n_dup, 0) AS n_dup
         |  FROM ws LEFT JOIN dpt USING (doc_id)),
         |kpt AS (
         |  SELECT *, list_filter(generate_series(1, len(w)),
         |    jj -> len(list_filter(dp, p -> jj >= p AND jj <= p + 7)) = 0) AS kept
         |  FROM j)
         |SELECT doc_id, CAST(len(w) AS INT) AS n_tokens, n_dup AS n_dup_windows,
         |  CASE WHEN len(dp) = 0 THEN 0
         |       ELSE CAST(len(list_filter(generate_series(1, len(dp)),
         |              i -> i = 1 OR dp[i] - dp[i-1] > 8)) AS INT)
         |  END AS n_spans_removed,
         |  CAST(len(w) - len(kept) AS INT) AS n_removed_tokens,
         |  len(kept) / len(w) AS clean_frac,
         |  CASE WHEN n_dup = 0 THEN text
         |       ELSE coalesce(array_to_string(list_transform(kept, jj -> w[jj]), ' '), '')
         |  END AS clean_text
         |FROM kpt ORDER BY doc_id""".stripMargin
    })

  /** x22: most-duplicated spans corpus-wide — the memorization-risk
    * report behind span dedup: which exact 8-word sequences recur most,
    * in how many documents, how many times in total. x18 scores each
    * DOCUMENT by its duplicated fraction; this ranks the SPANS themselves
    * (the boilerplate a cleaning pass would strip, the sequences a model
    * is most likely to memorize verbatim). Scale shape: spans are
    * generated in-scan, the (doc, span) and span aggregates are both
    * map-side combinable so the shuffle carries per-doc-distinct then
    * corpus-distinct spans, and the global top-20 plans as
    * TakeOrderedAndProject — per-partition top-k, one k·P-row merge,
    * never a corpus sort. */
  private val x22TopSpans = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(w) - 7), i -> concat_ws(' ', slice(w, i, 8)))"))
          .as("span"))
        .groupBy("doc_id", "span").agg(count(lit(1)).as("c"))
        .groupBy("span")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum(col("c")).cast(LongType).as("n_occ"))
        .orderBy(col("n_occ").desc, col("span"))
        .limit(20)
    },
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |win AS (
      |  SELECT doc_id, array_to_string(w[i:i+7], ' ') AS span
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
      |        FROM ws WHERE len(w) >= 8)),
      |pd AS (SELECT doc_id, span, COUNT(*) AS c FROM win GROUP BY 1, 2)
      |SELECT span, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(c) AS BIGINT) AS n_occ
      |FROM pd GROUP BY span ORDER BY n_occ DESC, span LIMIT 20""".stripMargin)

  /** z20: BM25 scoring — the retrieval-quality ranking a curation
    * pipeline uses to mine documents relevant to a seed query (data
    * selection à la DSIR/retrieval-based filtering). Okapi BM25 with
    * k1=1.2, b=0.75 over a fixed 4-term query. Engine-stable by
    * construction: idf snapshots at DECIMAL(12,6) (the z15 ln
    * discipline), avgdl is one exact-int division, each term's
    * contribution is a fixed left-to-right double expression, and the
    * per-doc score adds the (at most four) term contributions in a FIXED
    * order via conditional aggregates — never a float sum in shuffle
    * order. Scale: tf explodes only matching terms (the query-term
    * filter reaches the scan), df/avgdl are broadcast-sized aggregates,
    * and the global top-20 is TakeOrdered, not a single-partition
    * window. */
  private val z20Bm25 = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}
      val terms = Seq("spark", "join", "hash", "scan")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .withColumn("dl", size(col("w")).cast(LongType))
      val stats = docs.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).cast(LongType).as("tot_dl"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
        .filter(col("term").isin(terms: _*))
        .groupBy("doc_id", "dl", "term")
        .agg(count(lit(1)).cast(LongType).as("tf"))
      val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(stats))
        .withColumn("idf6",
          log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
            .cast(DecimalType(12, 6)))
        .select("term", "idf6")
      val contrib = tf
        .join(broadcast(idf), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("avgdl", col("tot_dl").cast(DoubleType) / col("n_docs"))
        .withColumn("c",
          col("idf6").cast(DoubleType) * (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      def term(t: String) = coalesce(max(when(col("term") === lit(t), col("c"))), lit(0.0))
      contrib.groupBy("doc_id")
        .agg(count(lit(1)).cast(IntegerType).as("n_hit"),
          (term("spark") + term("join") + term("hash") + term("scan")).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(20)
    },
    """WITH d AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS dl
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      |stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS tot_dl FROM d),
      |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, dl, unnest(w) AS term FROM d)
      |  WHERE term IN ('spark', 'join', 'hash', 'scan') GROUP BY 1, 2, 3),
      |idf AS (SELECT term,
      |    CAST(ln((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))
      |      + CAST(1.0 AS DOUBLE)) AS DECIMAL(12,6)) AS idf6
      |  FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1) CROSS JOIN stats),
      |-- every constant is CAST to DOUBLE: DuckDB parses bare 2.2/1.2 as
      |-- DECIMAL literals and does EXACT decimal arithmetic (tf * 2.2 =
      |-- 6.6 exactly), while Spark multiplies doubles — a 1-ulp drift
      |c AS (SELECT doc_id, term,
      |    CAST(idf6 AS DOUBLE) * (tf * CAST(2.2 AS DOUBLE)) /
      |      (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
      |        + CAST(0.75 AS DOUBLE) * dl / avgdl)) AS c
      |  FROM (SELECT tf.*, idf6, CAST(tot_dl AS DOUBLE) / n_docs AS avgdl
      |        FROM tf JOIN idf USING (term) CROSS JOIN stats) x)
      |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_hit,
      |    COALESCE(MAX(CASE WHEN term = 'spark' THEN c END), 0.0)
      |  + COALESCE(MAX(CASE WHEN term = 'join' THEN c END), 0.0)
      |  + COALESCE(MAX(CASE WHEN term = 'hash' THEN c END), 0.0)
      |  + COALESCE(MAX(CASE WHEN term = 'scan' THEN c END), 0.0) AS score
      |FROM c GROUP BY doc_id
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)

  /** y5: product-quantization ANN — the memory-compression half of the
    * FAISS-style index family (IVF = partition pruning, PQ = candidate
    * compression): each 64-dim float vector becomes 8 subspace codes
    * against a 16-anchor codebook, and serving ranks candidates by the
    * ASYMMETRIC distance (exact query-to-centroid distances summed over
    * the candidate's codes) without ever touching candidate vectors. The
    * encode argmin is a map-side-combinable min(struct) — no per-vector
    * window over the corpus; the serve join is (sub, code)-keyed against
    * a queries × 8 × 16 distance table; per-(query, candidate) sums ride
    * exact DECIMAL so the approximate distance is reproducible across
    * engines and partitionings. The declared query is the LSH-PQ
    * composition: both sides carry the hyperplane bucket (y2's coarse
    * quantizer) and the ADC join blocks on it, so serving scans the
    * query's bucket — never the corpus (unblocked ADC measured 18× wall
    * at 10× corpus in the soak; blocked is the scale path, exactly the
    * m4 lesson). The codes relation is the PQ trade: 8 small codes per
    * candidate instead of 64 floats. */
  private val y5PqAnn = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("bucket", Similarity.hyperplaneBucket("embedding"))
      val codebook = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      val codes = Similarity.pqEncode(e, codebook, "vec_id", "embedding",
        m = 8, subDim = 8, carryCols = Seq("bucket"))
      Similarity.pqTopK(codes, codebook, e.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", m = 8, subDim = 8, k = 5,
          blockCol = Some("bucket"))
        .orderBy("q_id", "rank")
    },
    s"""WITH v AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd FROM embeddings),
      |b AS (SELECT vec_id, vd, CAST($bucketSql AS BIGINT) AS bucket FROM v),
      |cb AS (SELECT vec_id AS anchor_id, vd AS avd FROM v WHERE vec_id < 16),
      |subs AS (SELECT vec_id, vd, bucket, unnest(generate_series(0, 7)) AS sub FROM b),
      |sd AS (SELECT s.vec_id, s.bucket, s.sub, c.anchor_id,
      |    ROUND(list_reduce(list_transform(generate_series(s.sub * 8 + 1, s.sub * 8 + 8),
      |      i -> (s.vd[i] - c.avd[i]) * (s.vd[i] - c.avd[i])), (acc, x) -> acc + x), 6) AS d6
      |  FROM subs s CROSS JOIN cb c),
      |codes AS (SELECT vec_id, bucket, sub, anchor_id AS code FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d6, anchor_id) AS rn
      |    FROM sd) x WHERE rn = 1),
      |qd AS (SELECT vec_id AS q_id, bucket, sub, anchor_id AS code,
      |    CAST(d6 AS DECIMAL(18,6)) AS dd
      |  FROM sd WHERE vec_id % 50 = 0),
      |adc AS (SELECT q.q_id, c.vec_id AS c_id, SUM(q.dd) AS s
      |  FROM qd q JOIN codes c USING (bucket, sub, code)
      |  WHERE q.q_id <> c.vec_id GROUP BY 1, 2)
      |SELECT q_id, rank, c_id, approx_d2 FROM (
      |  SELECT q_id, c_id, CAST(s AS DOUBLE) AS approx_d2,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      |      ORDER BY CAST(s AS DOUBLE), c_id) AS INT) AS rank
      |  FROM adc) r
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)

  /** y9: IVF-PQ — the two FAISS halves composed the way a production
    * vector index actually runs them: the IVF coarse quantizer PRUNES
    * (every vector lands in its nearest-anchor cell, serving joins on the
    * cell key — y3's shape, so y3c's nprobe knob transfers unchanged) and
    * PQ COMPRESSES what survives pruning (candidates inside the probed
    * cell are ranked by y5's asymmetric distance over their 8 subspace
    * codes — candidate vectors are never read at serve time).
    *
    * Scale shape: each half fixes the other's weak end. PQ alone (y5)
    * still touches every corpus code per query unless something blocks
    * the (sub, code) join — here the cell key does, so the ADC scan is
    * per-cell, not per-corpus. IVF alone (y3) ranks by full-width float
    * cosine inside the cell — here the cell's candidates cost 8 bytes
    * each, so a 1000-executor serve holds the probed cells' code tables
    * in a fraction of the float corpus's footprint (64 floats → 8 codes
    * per candidate). Everything shuffles at most once, keyed by cell;
    * the codebook and anchor relations are constant-sized broadcasts.
    * Codes are PQ over RAW vectors within cells (IVFFlat-PQ); residual
    * encoding (subtract the cell centroid before coding) drops into the
    * same DAG at the pqEncode input seam. ADC sums ride exact DECIMAL
    * (y5's discipline), so the approximate distance is reproducible
    * across engines and partitionings. */
  private val y9IvfPq = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val anchors = e.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      val codebook = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      val assigned = Similarity.ivfAssign(e, anchors, "vec_id", "embedding")
        .select("vec_id", "embedding", "cell")
      val codes = Similarity.pqEncode(assigned, codebook, "vec_id", "embedding",
        m = 8, subDim = 8, carryCols = Seq("cell"))
      Similarity.pqTopK(codes, codebook, assigned.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", m = 8, subDim = 8, k = 5,
          blockCol = Some("cell"))
        .orderBy("q_id", "rank")
    },
    s"""WITH v AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd FROM embeddings),
      |anchors AS (SELECT vec_id AS anchor_id, vd AS avd FROM v WHERE vec_id < $IvfCells),
      |adists AS (
      |  SELECT v.vec_id, v.vd, a.anchor_id,
      |    ROUND(${dotSql("v.vd", "v.vd")} - 2.0 * ${dotSql("v.vd", "a.avd")}
      |      + ${dotSql("a.avd", "a.avd")}, 6) AS d2
      |  FROM v CROSS JOIN anchors a),
      |assigned AS (SELECT vec_id, vd, anchor_id AS cell FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, anchor_id) AS rn
      |    FROM adists) x WHERE rn = 1),
      |cb AS (SELECT vec_id AS anchor_id, vd AS cvd FROM v WHERE vec_id < 16),
      |subs AS (SELECT vec_id, vd, cell, unnest(generate_series(0, 7)) AS sub FROM assigned),
      |sd AS (SELECT s.vec_id, s.cell, s.sub, c.anchor_id,
      |    ROUND(list_reduce(list_transform(generate_series(s.sub * 8 + 1, s.sub * 8 + 8),
      |      i -> (s.vd[i] - c.cvd[i]) * (s.vd[i] - c.cvd[i])), (acc, x) -> acc + x), 6) AS d6
      |  FROM subs s CROSS JOIN cb c),
      |codes AS (SELECT vec_id, cell, sub, anchor_id AS code FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d6, anchor_id) AS rn
      |    FROM sd) x WHERE rn = 1),
      |qd AS (SELECT vec_id AS q_id, cell, sub, anchor_id AS code,
      |    CAST(d6 AS DECIMAL(18,6)) AS dd
      |  FROM sd WHERE vec_id % 50 = 0),
      |adc AS (SELECT q.q_id, c.vec_id AS c_id, SUM(q.dd) AS s
      |  FROM qd q JOIN codes c USING (cell, sub, code)
      |  WHERE q.q_id <> c.vec_id GROUP BY 1, 2)
      |SELECT q_id, rank, c_id, approx_d2 FROM (
      |  SELECT q_id, c_id, CAST(s AS DOUBLE) AS approx_d2,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      |      ORDER BY CAST(s AS DOUBLE), c_id) AS INT) AS rank
      |  FROM adc) r
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)

  /** y20: PQ shortlist + EXACT RERANK — the two-stage serving architecture
    * every production vector store runs (FAISS's search-then-refine): the
    * compressed index answers cheaply but approximately (y9's IVF-blocked
    * ADC scan, widened to a k′=20 shortlist), then ONLY the shortlist
    * pays a full-precision distance and the final top-5 is re-ranked
    * exactly. The cost split is the whole point at scale: the corpus-side
    * work stays on 8-byte PQ codes (cell-blocked, sublinear), while the
    * exact stage touches queries×20 raw vectors — a constant per query
    * regardless of corpus size (the shortlist join is unhinted; AQE
    * broadcasts the batch-sized side). `promoted` marks rows where the
    * rerank moved a candidate UP versus its ADC rank — the measured
    * rank-inversion repair that justifies the second stage. */
  private val y20PqRerank = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val anchors = e.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      val codebook = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
      val assigned = Similarity.ivfAssign(e, anchors, "vec_id", "embedding")
        .select("vec_id", "embedding", "cell")
      val codes = Similarity.pqEncode(assigned, codebook, "vec_id", "embedding",
        m = 8, subDim = 8, carryCols = Seq("cell"))
      val shortlist = Similarity.pqTopK(codes, codebook,
          assigned.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          m = 8, subDim = 8, k = 20, blockCol = Some("cell"))
        .withColumnRenamed("rank", "approx_rank")
      val qv = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val cv = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      val exact = shortlist
        .join(qv, Seq("q_id"))
        .join(cv, Seq("c_id"))
        .withColumn("exact_d2", round(
          Similarity.dot("q_vec", "q_vec")
            - lit(2.0) * Similarity.dot("q_vec", "c_vec")
            + Similarity.dot("c_vec", "c_vec"), 6))
      val w = Window.partitionBy("q_id").orderBy(col("exact_d2").asc, col("c_id").asc)
      exact.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("c_id"), col("exact_d2"),
          col("approx_d2"), col("approx_rank"),
          (col("approx_rank") > col("rank")).as("promoted"))
        .orderBy("q_id", "rank")
    },
    s"""WITH v AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd FROM embeddings),
      |anchors AS (SELECT vec_id AS anchor_id, vd AS avd FROM v WHERE vec_id < $IvfCells),
      |adists AS (
      |  SELECT v.vec_id, v.vd, a.anchor_id,
      |    ROUND(${dotSql("v.vd", "v.vd")} - 2.0 * ${dotSql("v.vd", "a.avd")}
      |      + ${dotSql("a.avd", "a.avd")}, 6) AS d2
      |  FROM v CROSS JOIN anchors a),
      |assigned AS (SELECT vec_id, vd, anchor_id AS cell FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, anchor_id) AS rn
      |    FROM adists) x WHERE rn = 1),
      |cb AS (SELECT vec_id AS anchor_id, vd AS cvd FROM v WHERE vec_id < 16),
      |subs AS (SELECT vec_id, vd, cell, unnest(generate_series(0, 7)) AS sub FROM assigned),
      |sd AS (SELECT s.vec_id, s.cell, s.sub, c.anchor_id,
      |    ROUND(list_reduce(list_transform(generate_series(s.sub * 8 + 1, s.sub * 8 + 8),
      |      i -> (s.vd[i] - c.cvd[i]) * (s.vd[i] - c.cvd[i])), (acc, x) -> acc + x), 6) AS d6
      |  FROM subs s CROSS JOIN cb c),
      |codes AS (SELECT vec_id, cell, sub, anchor_id AS code FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d6, anchor_id) AS rn
      |    FROM sd) x WHERE rn = 1),
      |qd AS (SELECT vec_id AS q_id, cell, sub, anchor_id AS code,
      |    CAST(d6 AS DECIMAL(18,6)) AS dd
      |  FROM sd WHERE vec_id % 50 = 0),
      |adc AS (SELECT q.q_id, c.vec_id AS c_id, SUM(q.dd) AS s
      |  FROM qd q JOIN codes c USING (cell, sub, code)
      |  WHERE q.q_id <> c.vec_id GROUP BY 1, 2),
      |sl AS (SELECT q_id, c_id, CAST(s AS DOUBLE) AS approx_d2,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      |      ORDER BY CAST(s AS DOUBLE), c_id) AS INT) AS approx_rank
      |  FROM adc),
      |sl20 AS (SELECT * FROM sl WHERE approx_rank <= 20),
      |ex AS (SELECT s.q_id, s.c_id, s.approx_d2, s.approx_rank,
      |    ROUND(${dotSql("q.vd", "q.vd")} - 2.0 * ${dotSql("q.vd", "c.vd")}
      |      + ${dotSql("c.vd", "c.vd")}, 6) AS exact_d2
      |  FROM sl20 s JOIN v q ON q.vec_id = s.q_id JOIN v c ON c.vec_id = s.c_id)
      |SELECT q_id, rank, c_id, exact_d2, approx_d2, approx_rank,
      |  approx_rank > rank AS promoted
      |FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      |    ORDER BY exact_d2, c_id) AS INT) AS rank FROM ex) r
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)

  /** y21: MIPS — max INNER-PRODUCT search (the recommendation/reranker
    * scoring objective, where a long vector should win even at equal
    * angle) and its norm-augmentation reduction to cosine (Shrivastava &
    * Li): append s = √(M² − |x|²) to every corpus vector (M = max corpus
    * norm) and 0 to every query, and the augmented cosine becomes
    * dot(q,x)/(|q|·M) — a per-query MONOTONE transform of the raw dot,
    * so cosine machinery ranks MIPS correctly. This panel PROVES the
    * reduction in data: per query, the top-3 by raw dot with both ranks
    * side by side (`reduction_ok` — rank under dot ≡ rank under the
    * augmented cosine, up to 6-dp rounding ties), which is the license
    * to serve MIPS on the EXISTING cosine infrastructure (y2's buckets,
    * annServe) by augmenting corpus vectors once at index-build time —
    * no new index type — y22 EXERCISES that license
    * ([[Similarity.mipsTopK]]) and gates its recall against this panel's
    * exact arm. The exact arm is the y1/y7-bounded-batch shape: queries
    * are the tiny side, the corpus is scanned once, linearly; both ranks
    * ride the salted two-stage top-k (groupedTopK's shape), never a
    * per-query corpus-sized window. */
  private val y21MipsAugment = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val m = e.agg(max(Similarity.norm("embedding")).as("mnorm"))
      // bounded query batch (y7's lesson: a %-sampled batch GROWS with the
      // corpus and the exact arm goes quadratic) — a no-op at the
      // correctness SFs, a hard cap at scale
      val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 1000)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        .withColumn("q_nrm", Similarity.norm("q_vec"))
      val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      val scored = q.join(c, col("q_id") =!= col("c_id"))
        .crossJoin(broadcast(m))
        .withColumn("dot", round(Similarity.dot("q_vec", "c_vec"), 6))
        .withColumn("aug_cos", round(
          Similarity.dot("q_vec", "c_vec") / (col("q_nrm") * col("mnorm")), 6))
      // salted two-stage top-k (groupedTopK's shape, ONE pass serving BOTH
      // orderings): stage 1 sorts 1/32 of each query's candidates per task
      // and keeps a bucket's top-3 under EITHER ordering — every global
      // top-3 row under either ordering survives its bucket cut — then
      // stage 2 ranks the ≤ 6·32 survivors per query. No per-query
      // corpus-sized window anywhere. rank_aug is EXACT for values ≤ 3
      // and NULL beyond the serving depth (such a row already failed the
      // reduction; its precise rank would need the corpus-sized sort this
      // shape exists to avoid).
      val salted = scored.withColumn("__salt", pmod(xxhash64(col("c_id")), lit(32L)))
      val w1d = Window.partitionBy("q_id", "__salt")
        .orderBy(col("dot").desc, col("c_id").asc)
      val w1a = Window.partitionBy("q_id", "__salt")
        .orderBy(col("aug_cos").desc, col("c_id").asc)
      val survivors = salted
        .withColumn("__sd", row_number().over(w1d))
        .withColumn("__sa", row_number().over(w1a))
        .filter(col("__sd") <= 3 || col("__sa") <= 3)
        .drop("__salt", "__sd", "__sa")
      val wd = Window.partitionBy("q_id").orderBy(col("dot").desc, col("c_id").asc)
      val wa = Window.partitionBy("q_id").orderBy(col("aug_cos").desc, col("c_id").asc)
      survivors
        .withColumn("rank", row_number().over(wd))
        .withColumn("rank_aug0", row_number().over(wa))
        .filter(col("rank") <= 3)
        .withColumn("rank_aug", when(col("rank_aug0") <= 3, col("rank_aug0")))
        .withColumn("reduction_ok",
          coalesce(col("rank") === col("rank_aug"), lit(false)))
        .select("q_id", "rank", "c_id", "dot", "aug_cos", "rank_aug", "reduction_ok")
        .orderBy("q_id", "rank")
    },
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |n AS (SELECT vec_id, vd, ${nrmSql("vd")} AS nrm FROM v),
       |m AS (SELECT MAX(nrm) AS mnorm FROM n),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    ROUND(${dotSql("q.vd", "c.vd")}, 6) AS dot,
       |    ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * m.mnorm), 6) AS aug_cos
       |  FROM n q JOIN n c ON q.vec_id <> c.vec_id CROSS JOIN m
       |  WHERE q.vec_id % 50 = 0 AND q.vec_id < 1000),
       |rk AS (SELECT *,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot DESC, c_id) AS INT) AS rank,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY aug_cos DESC, c_id) AS INT) AS rank_aug
       |  FROM scored)
       |SELECT q_id, rank, c_id, dot, aug_cos,
       |  CASE WHEN rank_aug <= 3 THEN rank_aug END AS rank_aug,
       |  (rank = rank_aug AND rank_aug <= 3) AS reduction_ok
       |FROM rk WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin)

  /** y22: MIPS SERVED on the bucket index — y21's license exercised.
    * Corpus vectors are augmented ONCE at index-build time with
    * s = √(M² − ‖x‖²) snapped to FLOAT (the index's storage type; one
    * IEEE correctly-rounded cast, engine-stable), queries with 0 — the
    * asymmetric Shrivastava–Li form, because a symmetric augment would
    * add s_q·s_x to the score and stop ranking MIPS — and the EXISTING
    * hyperplane machinery runs unchanged at dims+1 = 65 (signs,
    * Hamming-1 multi-probe, unhinted bucket equi-join:
    * [[Similarity.mipsTopK]]). The panel gates serving against truth:
    * the exact raw-dot top-3 (y21's bounded-batch arm, salted two-stage
    * rank via [[Relational.groupedTopK]]) is the spine, the served list
    * aligns by rank, and `hit` marks exact neighbors the index
    * surfaced anywhere in its top-3 — recall@3 read off one boolean
    * column (the integer is pinned in ExtensionsSpec, y9b's precedent).
    * Scale: the n² pair space never materializes on the serving arm
    * (bucket equi-join, plan-audited); the exact arm stays the
    * deliberately capped truth batch. */
  private val y22MipsServe = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val qPred: Column => Column = id => id % 50 === 0 && id < 1000
      // planes=4 (not the 8-plane default): the plane count is the
      // occupancy knob (corpus/2^planes per bucket), and the augmented
      // geometry of a near-orthogonal corpus widens query–neighbor
      // angles, so serving recall wants WIDER buckets at this corpus
      // size — a 10⁹-vector corpus turns the same knob the other way.
      val served = Similarity.mipsTopK(e, qPred, "vec_id", "embedding",
          k = 3, planes = 4)
        .select(col("q_id"), col("rank"), col("c_id").as("served_id"),
          col("dot").as("served_dot"))
      val q = e.filter(qPred(col("vec_id")))
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      val scored = q.join(c, col("q_id") =!= col("c_id"))
        .withColumn("dot", round(Similarity.dot("q_vec", "c_vec"), 6))
      val exact = Relational.groupedTopK(scored, Seq("q_id"), col("c_id"),
          Seq(col("dot").desc, col("c_id").asc), k = 3, out = "rank")
        .select(col("q_id"), col("rank"), col("c_id").as("exact_id"),
          col("dot").as("exact_dot"))
      val hitMarks = served
        .select(col("q_id"), col("served_id").as("exact_id"), lit(true).as("hit0"))
      exact
        .join(served, Seq("q_id", "rank"), "left")
        .join(hitMarks, Seq("q_id", "exact_id"), "left")
        .withColumn("hit", coalesce(col("hit0"), lit(false)))
        .select("q_id", "rank", "exact_id", "exact_dot",
          "served_id", "served_dot", "hit")
        .orderBy("q_id", "rank")
    },
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |n AS (SELECT vec_id, vd, ${nrmSql("vd")} AS nrm FROM v),
       |m AS (SELECT MAX(nrm) AS mnorm FROM n),
       |ca AS (SELECT vec_id, list_append(vd,
       |    CAST(CAST(sqrt(GREATEST(mnorm * mnorm - nrm * nrm, 0)) AS FLOAT)
       |      AS DOUBLE)) AS vd
       |  FROM n CROSS JOIN m),
       |cbk AS (SELECT vec_id, CAST(${bucketSqlFor(65, 4)} AS BIGINT) AS bucket FROM ca),
       |qa AS (SELECT vec_id, list_append(vd, CAST(0 AS DOUBLE)) AS vd
       |  FROM v WHERE vec_id % 50 = 0 AND vec_id < 1000),
       |qbk AS (SELECT vec_id, CAST(${bucketSqlFor(65, 4)} AS BIGINT) AS bucket FROM qa),
       |sc AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    ROUND(${dotSql("q.vd", "c.vd")}, 6) AS dot
       |  FROM v q JOIN qbk qb ON qb.vec_id = q.vec_id
       |  JOIN cbk ck ON bit_count(xor(qb.bucket, ck.bucket)) <= 1
       |  JOIN v c ON c.vec_id = ck.vec_id AND c.vec_id <> q.vec_id),
       |srv AS (SELECT q_id, rank, c_id AS served_id, dot AS served_dot FROM (
       |    SELECT q_id, c_id, dot, CAST(ROW_NUMBER() OVER (
       |      PARTITION BY q_id ORDER BY dot DESC, c_id) AS INT) AS rank FROM sc) r
       |  WHERE rank <= 3),
       |ex0 AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    ROUND(${dotSql("q.vd", "c.vd")}, 6) AS dot
       |  FROM v q JOIN v c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id % 50 = 0 AND q.vec_id < 1000),
       |ex AS (SELECT q_id, rank, c_id AS exact_id, dot AS exact_dot FROM (
       |    SELECT q_id, c_id, dot, CAST(ROW_NUMBER() OVER (
       |      PARTITION BY q_id ORDER BY dot DESC, c_id) AS INT) AS rank FROM ex0) r
       |  WHERE rank <= 3)
       |SELECT ex.q_id, ex.rank, ex.exact_id, ex.exact_dot,
       |  s.served_id, s.served_dot, COALESCE(h.hit, FALSE) AS hit
       |FROM ex
       |LEFT JOIN srv s ON s.q_id = ex.q_id AND s.rank = ex.rank
       |LEFT JOIN (SELECT q_id, served_id AS exact_id, TRUE AS hit FROM srv) h
       |  ON h.q_id = ex.q_id AND h.exact_id = ex.exact_id
       |ORDER BY ex.q_id, ex.rank""".stripMargin)

  /** y23: the MIPS serving OPERATING CURVE — y11's knob-sweep discipline
    * applied to y22's index: the same bounded query batch graded at
    * every (planes, probe) setting an operator would actually choose
    * between — planes ∈ {4, 6} (bucket width: each plane halves
    * occupancy) × probe ∈ {0 own-bucket, 1 Hamming-1 multi-probe} —
    * against the exact raw-dot top-3 truth. Recall is monotone in probe
    * BY CONSTRUCTION for fixed planes (probe sets nest), so the curve
    * doubles as a sanity gate on the augmented bucketing; across planes
    * it prices recall-vs-candidate-population, the trade a 10⁹-vector
    * deployment resolves the other way (more planes + more probes).
    * Scale: truth is computed ONCE (pinned; salted two-stage rank) and
    * each arm is the multi-probe bucket equi-join — the corpus side
    * never duplicates, only the tiny query side explodes. */
  private val y23MipsCurve = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val qPred: Column => Column = id => id % 50 === 0 && id < 1000
      val q = e.filter(qPred(col("vec_id")))
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      val scored = q.join(c, col("q_id") =!= col("c_id"))
        .withColumn("dot", round(Similarity.dot("q_vec", "c_vec"), 6))
      val truth0 = Relational.groupedTopK(scored, Seq("q_id"), col("c_id"),
          Seq(col("dot").desc, col("c_id").asc), k = 3, out = "rank")
        .select("q_id", "c_id")
      // four arms read ONE truth relation (plan-only stays action-free)
      val truth = if (planOnly) truth0 else graft.Housekeeping.pin(s)(truth0).df
      val nTruth = truth.agg(count(lit(1)).as("n_truth"))
      val served = (for { p <- Seq(4, 6); r <- Seq(0, 1) } yield
        Similarity.mipsTopK(e, qPred, "vec_id", "embedding", k = 3,
            probeRadius = r, planes = p)
          .select(lit(p).as("planes"), lit(r).as("probe"),
            col("q_id"), col("c_id")))
        .reduce(_ unionByName _)
      served
        .join(truth.withColumn("hit", lit(true)), Seq("q_id", "c_id"), "left")
        .groupBy("planes", "probe").agg(
          count(lit(1)).as("n_served"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_hits"))
        .crossJoin(broadcast(nTruth))
        .withColumn("recall_at_3", col("n_hits") / col("n_truth"))
        .orderBy("planes", "probe")
    },
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |n AS (SELECT vec_id, vd, ${nrmSql("vd")} AS nrm FROM v),
       |m AS (SELECT MAX(nrm) AS mnorm FROM n),
       |ca AS (SELECT vec_id, list_append(vd,
       |    CAST(CAST(sqrt(GREATEST(mnorm * mnorm - nrm * nrm, 0)) AS FLOAT)
       |      AS DOUBLE)) AS vd
       |  FROM n CROSS JOIN m),
       |cb4 AS (SELECT vec_id, CAST(${bucketSqlFor(65, 4)} AS BIGINT) AS bucket FROM ca),
       |cb6 AS (SELECT vec_id, CAST(${bucketSqlFor(65, 6)} AS BIGINT) AS bucket FROM ca),
       |qa AS (SELECT vec_id, list_append(vd, CAST(0 AS DOUBLE)) AS vd
       |  FROM v WHERE vec_id % 50 = 0 AND vec_id < 1000),
       |qb4 AS (SELECT vec_id, CAST(${bucketSqlFor(65, 4)} AS BIGINT) AS bucket FROM qa),
       |qb6 AS (SELECT vec_id, CAST(${bucketSqlFor(65, 6)} AS BIGINT) AS bucket FROM qa),
       |cand AS (
       |  SELECT 4 AS planes, 0 AS probe, q.vec_id AS q_id, c.vec_id AS c_id
       |    FROM qb4 q JOIN cb4 c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
       |  UNION ALL
       |  SELECT 4, 1, q.vec_id, c.vec_id
       |    FROM qb4 q JOIN cb4 c
       |      ON bit_count(xor(q.bucket, c.bucket)) <= 1 AND q.vec_id <> c.vec_id
       |  UNION ALL
       |  SELECT 6, 0, q.vec_id, c.vec_id
       |    FROM qb6 q JOIN cb6 c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
       |  UNION ALL
       |  SELECT 6, 1, q.vec_id, c.vec_id
       |    FROM qb6 q JOIN cb6 c
       |      ON bit_count(xor(q.bucket, c.bucket)) <= 1 AND q.vec_id <> c.vec_id),
       |sc AS (SELECT cand.planes, cand.probe, cand.q_id, cand.c_id,
       |    ROUND(${dotSql("q.vd", "c.vd")}, 6) AS dot
       |  FROM cand JOIN v q ON q.vec_id = cand.q_id
       |  JOIN v c ON c.vec_id = cand.c_id),
       |srv AS (SELECT planes, probe, q_id, c_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY planes, probe, q_id
       |      ORDER BY dot DESC, c_id) AS rk FROM sc) r
       |  WHERE rk <= 3),
       |ex0 AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    ROUND(${dotSql("q.vd", "c.vd")}, 6) AS dot
       |  FROM v q JOIN v c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id % 50 = 0 AND q.vec_id < 1000),
       |ex AS (SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id, ROW_NUMBER() OVER (
       |      PARTITION BY q_id ORDER BY dot DESC, c_id) AS rk FROM ex0) r
       |  WHERE rk <= 3),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM ex)
       |SELECT planes, probe, CAST(COUNT(*) AS BIGINT) AS n_served,
       |  CAST(SUM(CASE WHEN ex.q_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_hits,
       |  nt.n_truth,
       |  CAST(SUM(CASE WHEN ex.q_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    / nt.n_truth AS recall_at_3
       |FROM srv LEFT JOIN ex ON ex.q_id = srv.q_id AND ex.c_id = srv.c_id
       |CROSS JOIN nt
       |GROUP BY planes, probe, nt.n_truth
       |ORDER BY planes, probe""".stripMargin)

  /** y24: TOMBSTONE-AWARE ANN SERVING — the takedown lifecycle meets the
    * vector index (x44 deletes rows; this is what deletion means for a
    * SERVING structure, where "deleted" must stop being retrievable NOW
    * but a full index rebuild is a scheduled job, not a request
    * handler): the two production arms priced against filtered truth.
    * REBUILD re-buckets the retained corpus (deleted vectors gone from
    * the index — the eventual state); POST-FILTER serves the STALE
    * index at k′ = 2k, drops tombstoned candidates after the fact, and
    * re-ranks — the zero-downtime stopgap, whose failure mode is
    * STARVATION (a query whose bucket was rich in deleted vectors comes
    * back with fewer than k results — `n_starved` reads it off the gate
    * data as the per-arm shortfall among queries that returned anything;
    * a fully-empty bucket is y2's documented fallback seam — the signal
    * that schedules the rebuild). Tombstoned QUERIES
    * are dropped outright (a deleted requester gets nothing). Both arms
    * stay the y2b Hamming-1 multi-probe bucket equi-join; truth is the
    * bounded-batch brute force over the retained corpus. */
  private val y24TombstoneAnn = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val tomb = col("vec_id") % 7 === 0
      val qPred: Column => Column = id => id % 50 === 0 && id < 1000 && !(id % 7 === 0)
      val retained = e.filter(!tomb)
      val truth = Similarity.bruteForceTopK(
          retained.filter(qPred(col("vec_id"))), retained,
          "vec_id", "embedding", k = 3)
        .select("q_id", "c_id")
      val rebuild = Similarity.bucketedTopK(retained, qPred, "vec_id", "embedding",
          k = 3, probeRadius = 1)
        .select(lit("rebuild").as("arm"), col("q_id"), col("c_id"))
      val stale = Similarity.bucketedTopK(e, qPred, "vec_id", "embedding",
          k = 6, probeRadius = 1)
        .filter(!(col("c_id") % 7 === 0))
        .withColumn("r2", row_number().over(
          Window.partitionBy("q_id").orderBy(col("rank").asc)))
        .filter(col("r2") <= 3)
        .select(lit("post_filter").as("arm"), col("q_id"), col("c_id"))
      val nTruth = truth.agg(count(lit(1)).as("n_truth"))
      rebuild.unionByName(stale)
        .join(truth.withColumn("hit", lit(true)), Seq("q_id", "c_id"), "left")
        .groupBy("arm").agg(
          countDistinct(col("q_id")).as("n_queries"),
          count(lit(1)).as("n_served"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_hits"))
        .crossJoin(broadcast(nTruth))
        .withColumn("n_starved", col("n_queries") * 3 - col("n_served"))
        .select("arm", "n_queries", "n_served", "n_starved", "n_hits", "n_truth")
        .orderBy("arm")
    },
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |n AS (SELECT vec_id, vd, ${nrmSql("vd")} AS nrm,
       |    CAST($bucketSql AS BIGINT) AS bucket FROM v),
       |ret AS (SELECT * FROM n WHERE vec_id % 7 <> 0),
       |q AS (SELECT * FROM ret
       |  WHERE vec_id % 50 = 0 AND vec_id < 1000),
       |truth AS (SELECT q_id, c_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id, ROW_NUMBER() OVER (
       |      PARTITION BY q.vec_id ORDER BY
       |        ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) DESC,
       |        c.vec_id) AS rk
       |    FROM q JOIN ret c ON c.vec_id <> q.vec_id) t WHERE rk <= 3),
       |reb AS (SELECT 'rebuild' AS arm, q_id, c_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id, ROW_NUMBER() OVER (
       |      PARTITION BY q.vec_id ORDER BY
       |        ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) DESC,
       |        c.vec_id) AS rk
       |    FROM q JOIN ret c ON bit_count(xor(c.bucket, q.bucket)) <= 1
       |      AND c.vec_id <> q.vec_id) t
       |  WHERE rk <= 3),
       |st6 AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id, ROW_NUMBER() OVER (
       |      PARTITION BY q.vec_id ORDER BY
       |        ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) DESC,
       |        c.vec_id) AS rk
       |    FROM q JOIN n c ON bit_count(xor(c.bucket, q.bucket)) <= 1
       |      AND c.vec_id <> q.vec_id),
       |pf AS (SELECT 'post_filter' AS arm, q_id, c_id FROM (
       |    SELECT q_id, c_id, ROW_NUMBER() OVER (
       |      PARTITION BY q_id ORDER BY rk) AS r2
       |    FROM st6 WHERE rk <= 6 AND c_id % 7 <> 0) t WHERE r2 <= 3),
       |u AS (SELECT * FROM reb UNION ALL SELECT * FROM pf),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth)
       |SELECT arm, CAST(COUNT(DISTINCT u.q_id) AS BIGINT) AS n_queries,
       |  CAST(COUNT(*) AS BIGINT) AS n_served,
       |  CAST(COUNT(DISTINCT u.q_id) * 3 - COUNT(*) AS BIGINT) AS n_starved,
       |  CAST(SUM(CASE WHEN truth.q_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_hits,
       |  nt.n_truth
       |FROM u LEFT JOIN truth ON truth.q_id = u.q_id AND truth.c_id = u.c_id
       |CROSS JOIN nt
       |GROUP BY arm, nt.n_truth ORDER BY arm""".stripMargin)

  /** y25: DELETION → REBUILD DECISION — y24 priced the two serving arms;
    * this WIRES THE DECISION, y16's refresh-payoff discipline applied to
    * deletions: sweep the deletion fraction (~6%, ~14%, ~33% via mod
    * 17/7/3 tombstones), read the post-filter stopgap's starvation and
    * its recall against the rebuilt index's per fraction, and emit the
    * trigger verdict an operator would act on. The rule, stated as data
    * the oracle replays: REBUILD NOW when (a) any query starves (the
    * k-shortfall SLA breach y24 identified as the rebuild signal), OR
    * (b) the rebuilt index recalls strictly more than the stopgap
    * (y16's payoff > 0 — the stopgap is costing answers), OR (c) the
    * deletion fraction reaches [[RebuildDeletionModMax]]'s 25%. All
    * three clauses are integer comparisons — no
    * float threshold to drift between engines; the recall/payoff columns
    * are raw IEEE divisions of gated integers. Scale: each fraction's
    * arms are the y2b multi-probe bucket equi-join; truth is the
    * bounded-batch brute force; the sweep's output is 3 rows. */
  /** The deletion-fraction rebuild trigger, derived from the stopgap's own
    * candidate arithmetic rather than taste: the post-filter arm serves
    * k′ = 2k candidates and needs k SURVIVORS, so it tolerates up to half
    * its candidates tombstoned. At deletion fraction f the EXPECTED
    * tombstoned share of a candidate list is f — the mean exhausts the
    * 2× inflation exactly at f = 1/2, but tombstones are not uniform
    * across buckets (they arrive correlated by user/content, and a
    * 2k-candidate list is a small sample), so the trigger takes a 2×
    * headroom on the mean: rebuild once f ≥ 1/4, the point where a
    * candidate list only one-sigma-ish worse than average already starves.
    * Expressed on the sweep's modulus axis (fraction = 1/del_mod):
    * del_mod ≤ 4. y25's measured columns let an operator re-derive the
    * crossover empirically per corpus — at this corpus the f ≈ 1/3 arm
    * is exactly where measured starvation turns positive, one notch past
    * this a-priori trigger (the two clauses deliberately overlap: (a)
    * fires on MEASURED breach, (c) fires BEFORE the breach is measured,
    * which is what a trigger is for). */
  private val RebuildDeletionModMax = 4L

  private val y25DeletionDecision = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val e = Tables.embeddings(s, d)
      val arms = Seq(17, 7, 3).map { m =>
        val tomb = col("vec_id") % m === 0
        val qPred: Column => Column = id =>
          id % 50 === 0 && id < 1000 && !(id % m === 0)
        val retained = e.filter(!tomb)
        val truth0 = Similarity.bruteForceTopK(
            retained.filter(qPred(col("vec_id"))), retained,
            "vec_id", "embedding", k = 3)
          .select("q_id", "c_id")
        // three consumers per fraction (count, both arm joins) — pin
        val truth = if (planOnly) truth0 else graft.Housekeeping.pin(s)(truth0).df
        val rebuild = Similarity.bucketedTopK(retained, qPred, "vec_id",
            "embedding", k = 3, probeRadius = 1)
          .select("q_id", "c_id")
        val stale = Similarity.bucketedTopK(e, qPred, "vec_id", "embedding",
            k = 6, probeRadius = 1)
          .filter(!(col("c_id") % m === 0))
          .withColumn("r2", row_number().over(
            Window.partitionBy("q_id").orderBy(col("rank").asc)))
          .filter(col("r2") <= 3)
          .select("q_id", "c_id")
        val pf = stale
          .join(truth.withColumn("hit", lit(true)), Seq("q_id", "c_id"), "left")
          .agg(countDistinct(col("q_id")).as("pf_queries"),
            count(lit(1)).as("pf_served"),
            sum(when(col("hit"), 1L).otherwise(0L)).as("pf_hits"))
        val rb = rebuild
          .join(truth.withColumn("hit", lit(true)), Seq("q_id", "c_id"), "left")
          .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("rb_hits"))
        pf.crossJoin(broadcast(rb))
          .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth"))))
          .select(lit(m.toLong).as("del_mod"), col("pf_queries"),
            col("pf_served"), col("pf_hits"), col("rb_hits"), col("n_truth"))
      }
      arms.reduce(_ unionByName _)
        .withColumn("pf_starved",
          (col("pf_queries") * 3 - col("pf_served")).cast(LongType))
        .withColumn("pf_recall", col("pf_hits") / col("n_truth"))
        .withColumn("rb_recall", col("rb_hits") / col("n_truth"))
        .withColumn("recall_payoff",
          (col("rb_hits") - col("pf_hits")) / col("n_truth"))
        .withColumn("rebuild_now",
          col("pf_starved") > 0 || col("rb_hits") > col("pf_hits")
            || col("del_mod") <= RebuildDeletionModMax)
        .select("del_mod", "pf_queries", "pf_served", "pf_starved", "pf_hits",
          "rb_hits", "n_truth", "pf_recall", "rb_recall", "recall_payoff",
          "rebuild_now")
        .orderBy("del_mod")
    },
    {
      def armSql(m: Int) =
        s"""ret$m AS (SELECT * FROM n WHERE vec_id % $m <> 0),
           |q$m AS (SELECT * FROM ret$m WHERE vec_id % 50 = 0 AND vec_id < 1000),
           |tr$m AS (SELECT q_id, c_id FROM (
           |    SELECT q.vec_id AS q_id, c.vec_id AS c_id, ROW_NUMBER() OVER (
           |      PARTITION BY q.vec_id ORDER BY
           |        ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) DESC,
           |        c.vec_id) AS rk
           |    FROM q$m q JOIN ret$m c ON c.vec_id <> q.vec_id) t WHERE rk <= 3),
           |reb$m AS (SELECT q_id, c_id FROM (
           |    SELECT q.vec_id AS q_id, c.vec_id AS c_id, ROW_NUMBER() OVER (
           |      PARTITION BY q.vec_id ORDER BY
           |        ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) DESC,
           |        c.vec_id) AS rk
           |    FROM q$m q JOIN ret$m c ON bit_count(xor(c.bucket, q.bucket)) <= 1
           |      AND c.vec_id <> q.vec_id) t WHERE rk <= 3),
           |st$m AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id, ROW_NUMBER() OVER (
           |      PARTITION BY q.vec_id ORDER BY
           |        ROUND(${dotSql("q.vd", "c.vd")} / (q.nrm * c.nrm), 6) DESC,
           |        c.vec_id) AS rk
           |    FROM q$m q JOIN n c ON bit_count(xor(c.bucket, q.bucket)) <= 1
           |      AND c.vec_id <> q.vec_id),
           |pf$m AS (SELECT q_id, c_id FROM (
           |    SELECT q_id, c_id, ROW_NUMBER() OVER (
           |      PARTITION BY q_id ORDER BY rk) AS r2
           |    FROM st$m WHERE rk <= 6 AND c_id % $m <> 0) t WHERE r2 <= 3),
           |row$m AS (SELECT CAST($m AS BIGINT) AS del_mod,
           |    (SELECT CAST(COUNT(DISTINCT q_id) AS BIGINT) FROM pf$m) AS pf_queries,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM pf$m) AS pf_served,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM pf$m p JOIN tr$m t
           |       ON t.q_id = p.q_id AND t.c_id = p.c_id) AS pf_hits,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM reb$m r JOIN tr$m t
           |       ON t.q_id = r.q_id AND t.c_id = r.c_id) AS rb_hits,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM tr$m) AS n_truth)""".stripMargin
      s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
         |n AS (SELECT vec_id, vd, ${nrmSql("vd")} AS nrm,
         |    CAST($bucketSql AS BIGINT) AS bucket FROM v),
         |${armSql(17)},
         |${armSql(7)},
         |${armSql(3)}
         |SELECT del_mod, pf_queries, pf_served,
         |  CAST(pf_queries * 3 - pf_served AS BIGINT) AS pf_starved,
         |  pf_hits, rb_hits, n_truth,
         |  pf_hits / n_truth AS pf_recall,
         |  rb_hits / n_truth AS rb_recall,
         |  (rb_hits - pf_hits) / n_truth AS recall_payoff,
         |  (pf_queries * 3 - pf_served > 0 OR rb_hits > pf_hits
         |    OR del_mod <= $RebuildDeletionModMax) AS rebuild_now
         |FROM (SELECT * FROM row17 UNION ALL SELECT * FROM row7
         |      UNION ALL SELECT * FROM row3)
         |ORDER BY del_mod""".stripMargin
    })

  /** y26: MIPS SERVING × TOMBSTONES — y24's post-filter-vs-rebuild pair
    * on the norm-augmented MIPS index (y22's serving arm gets the
    * deletion lifecycle it lacked): REBUILD re-augments and re-buckets
    * the retained corpus — note the subtlety the arm exists to surface:
    * the augmentation scalar M = max ‖x‖ is an INDEX-BUILD artifact, so
    * a rebuild recomputes it over the retained vectors (deleting the
    * longest vector changes every augmented coordinate — the stale
    * index cannot know); POST-FILTER serves the stale index (stale M,
    * stale buckets) at k′ = 2k, drops tombstoned candidates, re-ranks.
    * Tombstoned queries are dropped outright. Truth is the exact
    * raw-dot MIPS top-3 over the retained corpus (bounded batch, salted
    * two-stage rank); the y24 panel shape prices both arms — starvation
    * is the rebuild trigger signal, fed to y25's decision rule. Both
    * arms stay multi-probe bucket equi-joins at planes = 4 (y22's
    * documented occupancy knob for this corpus). */
  private val y26MipsTombstone = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val tomb = col("vec_id") % 7 === 0
      val qPred: Column => Column = id =>
        id % 50 === 0 && id < 1000 && !(id % 7 === 0)
      val retained = e.filter(!tomb)
      val q = retained.filter(qPred(col("vec_id")))
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val c = retained.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      val scored = q.join(c, col("q_id") =!= col("c_id"))
        .withColumn("dot", round(Similarity.dot("q_vec", "c_vec"), 6))
      val truth0 = Relational.groupedTopK(scored, Seq("q_id"), col("c_id"),
          Seq(col("dot").desc, col("c_id").asc), k = 3, out = "rank")
        .select("q_id", "c_id")
      val truth = if (planOnly) truth0 else graft.Housekeeping.pin(s)(truth0).df
      val rebuild = Similarity.mipsTopK(retained, qPred, "vec_id", "embedding",
          k = 3, planes = 4)
        .select(lit("rebuild").as("arm"), col("q_id"), col("c_id"))
      val stale = Similarity.mipsTopK(e, qPred, "vec_id", "embedding",
          k = 6, planes = 4)
        .filter(!(col("c_id") % 7 === 0))
        .withColumn("r2", row_number().over(
          Window.partitionBy("q_id").orderBy(col("rank").asc)))
        .filter(col("r2") <= 3)
        .select(lit("post_filter").as("arm"), col("q_id"), col("c_id"))
      val nTruth = truth.agg(count(lit(1)).as("n_truth"))
      rebuild.unionByName(stale)
        .join(truth.withColumn("hit", lit(true)), Seq("q_id", "c_id"), "left")
        .groupBy("arm").agg(
          countDistinct(col("q_id")).as("n_queries"),
          count(lit(1)).as("n_served"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_hits"))
        .crossJoin(broadcast(nTruth))
        .withColumn("n_starved", col("n_queries") * 3 - col("n_served"))
        .select("arm", "n_queries", "n_served", "n_starved", "n_hits", "n_truth")
        .orderBy("arm")
    },
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |n AS (SELECT vec_id, vd, ${nrmSql("vd")} AS nrm FROM v),
       |ret AS (SELECT * FROM n WHERE vec_id % 7 <> 0),
       |m AS (SELECT MAX(nrm) AS mnorm FROM n),
       |mr AS (SELECT MAX(nrm) AS mnorm FROM ret),
       |ca AS (SELECT vec_id, list_append(vd,
       |    CAST(CAST(sqrt(GREATEST(mnorm * mnorm - nrm * nrm, 0)) AS FLOAT)
       |      AS DOUBLE)) AS vd
       |  FROM n CROSS JOIN m),
       |car AS (SELECT vec_id, list_append(vd,
       |    CAST(CAST(sqrt(GREATEST(mnorm * mnorm - nrm * nrm, 0)) AS FLOAT)
       |      AS DOUBLE)) AS vd
       |  FROM ret CROSS JOIN mr),
       |cbk AS (SELECT vec_id, CAST(${bucketSqlFor(65, 4)} AS BIGINT) AS bucket FROM ca),
       |crbk AS (SELECT vec_id, CAST(${bucketSqlFor(65, 4)} AS BIGINT) AS bucket FROM car),
       |qa AS (SELECT vec_id, list_append(vd, CAST(0 AS DOUBLE)) AS vd
       |  FROM v WHERE vec_id % 50 = 0 AND vec_id < 1000 AND vec_id % 7 <> 0),
       |qbk AS (SELECT vec_id, CAST(${bucketSqlFor(65, 4)} AS BIGINT) AS bucket FROM qa),
       |truth AS (SELECT q_id, c_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id, ROW_NUMBER() OVER (
       |      PARTITION BY q.vec_id ORDER BY
       |        ROUND(${dotSql("q.vd", "c.vd")}, 6) DESC, c.vec_id) AS rk
       |    FROM v q JOIN ret cn ON cn.vec_id <> q.vec_id
       |    JOIN v c ON c.vec_id = cn.vec_id
       |    WHERE q.vec_id % 50 = 0 AND q.vec_id < 1000 AND q.vec_id % 7 <> 0) t
       |  WHERE rk <= 3),
       |reb AS (SELECT 'rebuild' AS arm, q_id, c_id FROM (
       |    SELECT qb.vec_id AS q_id, ck.vec_id AS c_id, ROW_NUMBER() OVER (
       |      PARTITION BY qb.vec_id ORDER BY
       |        ROUND(${dotSql("q.vd", "c.vd")}, 6) DESC, ck.vec_id) AS rk
       |    FROM qbk qb JOIN v q ON q.vec_id = qb.vec_id
       |    JOIN crbk ck ON bit_count(xor(qb.bucket, ck.bucket)) <= 1
       |      AND ck.vec_id <> qb.vec_id
       |    JOIN v c ON c.vec_id = ck.vec_id) t
       |  WHERE rk <= 3),
       |st6 AS (SELECT qb.vec_id AS q_id, ck.vec_id AS c_id, ROW_NUMBER() OVER (
       |      PARTITION BY qb.vec_id ORDER BY
       |        ROUND(${dotSql("q.vd", "c.vd")}, 6) DESC, ck.vec_id) AS rk
       |    FROM qbk qb JOIN v q ON q.vec_id = qb.vec_id
       |    JOIN cbk ck ON bit_count(xor(qb.bucket, ck.bucket)) <= 1
       |      AND ck.vec_id <> qb.vec_id
       |    JOIN v c ON c.vec_id = ck.vec_id),
       |pf AS (SELECT 'post_filter' AS arm, q_id, c_id FROM (
       |    SELECT q_id, c_id, ROW_NUMBER() OVER (
       |      PARTITION BY q_id ORDER BY rk) AS r2
       |    FROM st6 WHERE rk <= 6 AND c_id % 7 <> 0) t WHERE r2 <= 3),
       |u AS (SELECT * FROM reb UNION ALL SELECT * FROM pf),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth)
       |SELECT arm, CAST(COUNT(DISTINCT u.q_id) AS BIGINT) AS n_queries,
       |  CAST(COUNT(*) AS BIGINT) AS n_served,
       |  CAST(COUNT(DISTINCT u.q_id) * 3 - COUNT(*) AS BIGINT) AS n_starved,
       |  CAST(SUM(CASE WHEN truth.q_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_hits,
       |  nt.n_truth
       |FROM u LEFT JOIN truth ON truth.q_id = u.q_id AND truth.c_id = u.c_id
       |CROSS JOIN nt
       |GROUP BY arm, nt.n_truth ORDER BY arm""".stripMargin)

  private final case class Y27State(
      pf: org.apache.spark.sql.DataFrame, rb: org.apache.spark.sql.DataFrame,
      truth: org.apache.spark.sql.DataFrame, rebuildNow: Boolean, servingGen: Long)
  private val y27Cache =
    new java.util.concurrent.ConcurrentHashMap[String, Y27State]()

  /** y27: GOVERNANCE REQUEST PROPAGATED TO THE ANN STORE — the vector
    * side of the s32/s33 chain, as ONE declared DAG over STORED index
    * generations (y24/y26 priced the arms in memory; this lands them):
    *  1. the index is a DURABLE artifact — generation 1 is the norm-
    *     augmented hyperplane assignment of the FULL corpus (y21's
    *     asymmetric MIPS reduction; M = max corpus norm is baked into
    *     the stored buckets — the index-build artifact y26 named),
    *     landed versioned and partitioned BY BUCKET (serving prunes to
    *     probed cells, y18's layout);
    *  2. the request arrives: tombstone ids land in a request-sized
    *     store; the STALE gen-1 index keeps serving post-filtered
    *     (k′ = 2k off the stored buckets, tombstoned candidates and
    *     requesters anti-joined out — the zero-downtime stopgap);
    *  3. the y25 decision is RECORDED from measured data: the candidate
    *     gen-2 index (retained corpus, RE-AUGMENTED — M₂ recomputes, so
    *     every stored bucket differs, which is exactly why the rebuild
    *     is a new artifact rather than an edit) is built and landed as
    *     its own store generation, both arms serve against their stored
    *     forms, and rebuild_now = starvation > 0 ∨ recall payoff > 0
    *     ∨ deletion fraction ≥ [[RebuildDeletionModMax]]'s 25% (here
    *     1/7 — statically false, the measured clauses decide);
    *  4. the serving POINTER (a one-row manifest store) advances to
    *     generation 2 iff the decision fired — promotion is a metadata
    *     append, the gen-2 build having already landed.
    * Panel: both arms' y24-shaped rows read back FROM THE STORES
    * (index_gen names each arm's generation) plus the decision columns
    * (rebuild_now, serving_gen re-read from the pointer store); the
    * oracle recomputes both index generations, both arms, the exact
    * retained-MIPS truth, AND the decision rule from scratch — so hash
    * equality proves the stored-index round trips, the serve paths, and
    * the recorded decision all match a from-scratch derivation over the
    * retained embeddings. Scale: both arms are bucket equi-joins off
    * bucket-partitioned stores; the gen-2 build is one corpus pass at
    * governance cadence; truth is the bounded-batch brute force. */
  private val y27GovernedAnn = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val e = Tables.embeddings(s, d)
      val planes = 4
      val tombPred = col("vec_id") % 7 === 0
      val qPred: Column => Column = id =>
        id % 50 === 0 && id < 1000 && !(id % 7 === 0)
      val retained = e.filter(!tombPred)
      // the index-build half of mipsTopK: augment with √(M²−‖x‖²), bucket
      def augIndex(corpus: org.apache.spark.sql.DataFrame) = {
        val base = corpus.select(col("vec_id"), col("embedding"))
          .withColumn("__nrm", Similarity.norm("embedding"))
        val m = base.agg(max(col("__nrm")).as("__mnorm"))
        base.crossJoin(broadcast(m))
          .withColumn("__s", sqrt(greatest(col("__mnorm") * col("__mnorm")
            - col("__nrm") * col("__nrm"), lit(0.0))).cast("float"))
          .withColumn("caug", concat(col("embedding"), array(col("__s"))))
          .withColumn("bucket", Similarity.hyperplaneBucket("caug", 65, planes))
          .select(col("vec_id"), col("bucket"))
      }
      // serve a query batch against a STORED (vec_id, bucket) index:
      // query buckets need no M (queries augment with 0), candidates
      // join back to the vector table for raw-dot ranking
      def serveFrom(idx: org.apache.spark.sql.DataFrame, k: Int,
                    tomb: Option[org.apache.spark.sql.DataFrame]) = {
        val q0 = e.filter(qPred(col("vec_id")))
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
          .withColumn("qaug", concat(col("q_vec"), array(lit(0.0f))))
          .withColumn("bucket", Similarity.hyperplaneBucket("qaug", 65, planes))
          .withColumn("__probe", explode(array(
            col("bucket") +:
              (0 until planes).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*)))
        val q = tomb.fold(q0)(t => q0.join(
          broadcast(t.select(col("vec_id").as("q_id"))), Seq("q_id"), "left_anti"))
        val cand = idx.select(col("vec_id").as("c_id"), col("bucket").as("__probe"))
          .join(e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec")),
            Seq("c_id"))
        // RANK THEN FILTER (y24's order, and the oracle's st6→pf shape):
        // the top-k is taken over the RAW candidate set — tombstones
        // included — and the takedown drops AFTER, so the stopgap arm can
        // actually STARVE (serve < k) when tombstoned candidates crowd the
        // raw top-k. That starvation is exactly what the y25 decision
        // measures; anti-joining before the rank would backfill survivors
        // into the top-k and mask it at any SF (r12 ADVICE).
        val ranked = q.join(cand, Seq("__probe"))
          .filter(col("q_id") =!= col("c_id"))
          .withColumn("dot", round(Similarity.dot("q_vec", "c_vec"), 6))
          .withColumn("rank", row_number().over(
            Window.partitionBy("q_id").orderBy(col("dot").desc, col("c_id").asc)))
          .filter(col("rank") <= k)
        tomb.fold(ranked)(t => ranked.join(
            broadcast(t.select(col("vec_id").as("c_id"))), Seq("c_id"), "left_anti"))
          .select("q_id", "c_id", "rank")
      }
      val st =
        if (planOnly) {
          val q = e.filter(qPred(col("vec_id")))
            .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
          val c = retained.select(col("vec_id").as("c_id"),
            col("embedding").as("c_vec"))
          val truth = Relational.groupedTopK(
              q.join(c, col("q_id") =!= col("c_id"))
                .withColumn("dot", round(Similarity.dot("q_vec", "c_vec"), 6)),
              Seq("q_id"), col("c_id"),
              Seq(col("dot").desc, col("c_id").asc), k = 3, out = "rank")
            .select("q_id", "c_id")
          val pf = serveFrom(augIndex(e), 6, Some(e.filter(tombPred)))
          val rb = serveFrom(augIndex(retained), 3, None)
          Y27State(pf, rb, truth, rebuildNow = true, servingGen = 2L)
        } else y27Cache.computeIfAbsent(
          s"${s.sparkContext.applicationId}:$d", _ => {
          val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl/" +
            s"gov_ann_${s.sparkContext.applicationId}_${math.abs(d.hashCode)}"
          val g1 = graft.sources.Store(s, s"$base/gen1", "bucket")
          val g2 = graft.sources.Store(s, s"$base/gen2", "bucket")
          val tmb = graft.sources.Store(s, s"$base/tomb", "part")
          val ptr = graft.sources.Store(s, s"$base/ptr", "part")
          Seq(g1, g2, tmb, ptr).foreach(_.destroy())
          g1.appendVersioned(augIndex(e))
          // ---- the request arrives ----
          tmb.append(e.filter(tombPred).select("vec_id")
            .withColumn("part", pmod(col("vec_id"), lit(4))))
          val tombIds = tmb.read.select("vec_id")
          // exact retained-MIPS truth (bounded query batch); cached across
          // constructions, so retainCheckpoint, not pin
          val q = e.filter(qPred(col("vec_id")))
            .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
          val c = retained.select(col("vec_id").as("c_id"),
            col("embedding").as("c_vec"))
          val truth = graft.Housekeeping.retainCheckpoint(s)(
            Relational.groupedTopK(
                q.join(c, col("q_id") =!= col("c_id"))
                  .withColumn("dot", round(Similarity.dot("q_vec", "c_vec"), 6)),
                Seq("q_id"), col("c_id"),
                Seq(col("dot").desc, col("c_id").asc), k = 3, out = "rank")
              .select("q_id", "c_id"))
          // stopgap arm off the STALE stored index
          val pf0 = serveFrom(g1.read, 6, Some(tombIds))
            .withColumn("r2", row_number().over(
              Window.partitionBy("q_id").orderBy(col("rank").asc)))
            .filter(col("r2") <= 3).select("q_id", "c_id")
          val pf = graft.Housekeeping.retainCheckpoint(s)(pf0)
          // candidate generation 2: retained corpus, RE-AUGMENTED
          g2.appendVersioned(augIndex(retained))
          val rb = graft.Housekeeping.retainCheckpoint(s)(
            serveFrom(g2.read, 3, None).select("q_id", "c_id"))
          // the measured y25 decision
          def hits(a: org.apache.spark.sql.DataFrame) =
            a.join(truth, Seq("q_id", "c_id"), "left_semi").count()
          val pfQ = pf.select("q_id").distinct().count()
          val pfServed = pf.count()
          val (pfHits, rbHits) = (hits(pf), hits(rb))
          val rebuildNow = (pfQ * 3 - pfServed) > 0 || rbHits > pfHits ||
            7L <= RebuildDeletionModMax
          // promotion is a metadata append to the pointer store
          ptr.append(s.range(1).select(
            lit(if (rebuildNow) 2L else 1L).as("serving_gen"),
            lit(0).as("part")))
          val servingGen = ptr.read.select("serving_gen")
            .head().getLong(0)
          Y27State(pf, rb, truth, rebuildNow, servingGen)
        })
      val nTruth = st.truth.agg(count(lit(1)).as("n_truth"))
      st.rb.select(lit("rebuild").as("arm"), lit(2L).as("index_gen"),
          col("q_id"), col("c_id"))
        .unionByName(st.pf.select(lit("post_filter").as("arm"),
          lit(1L).as("index_gen"), col("q_id"), col("c_id")))
        .join(st.truth.withColumn("hit", lit(true)), Seq("q_id", "c_id"), "left")
        .groupBy("arm", "index_gen").agg(
          countDistinct(col("q_id")).as("n_queries"),
          count(lit(1)).as("n_served"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_hits"))
        .crossJoin(broadcast(nTruth))
        .withColumn("n_starved", col("n_queries") * 3 - col("n_served"))
        .withColumn("rebuild_now", lit(st.rebuildNow))
        .withColumn("serving_gen", lit(st.servingGen).cast(LongType))
        .select("arm", "index_gen", "n_queries", "n_served", "n_starved",
          "n_hits", "n_truth", "rebuild_now", "serving_gen")
        .orderBy("arm")
    },
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |n AS (SELECT vec_id, vd, ${nrmSql("vd")} AS nrm FROM v),
       |ret AS (SELECT * FROM n WHERE vec_id % 7 <> 0),
       |m AS (SELECT MAX(nrm) AS mnorm FROM n),
       |mr AS (SELECT MAX(nrm) AS mnorm FROM ret),
       |ca AS (SELECT vec_id, list_append(vd,
       |    CAST(CAST(sqrt(GREATEST(mnorm * mnorm - nrm * nrm, 0)) AS FLOAT)
       |      AS DOUBLE)) AS vd
       |  FROM n CROSS JOIN m),
       |car AS (SELECT vec_id, list_append(vd,
       |    CAST(CAST(sqrt(GREATEST(mnorm * mnorm - nrm * nrm, 0)) AS FLOAT)
       |      AS DOUBLE)) AS vd
       |  FROM ret CROSS JOIN mr),
       |cbk AS (SELECT vec_id, CAST(${bucketSqlFor(65, 4)} AS BIGINT) AS bucket FROM ca),
       |crbk AS (SELECT vec_id, CAST(${bucketSqlFor(65, 4)} AS BIGINT) AS bucket FROM car),
       |qa AS (SELECT vec_id, list_append(vd, CAST(0 AS DOUBLE)) AS vd
       |  FROM v WHERE vec_id % 50 = 0 AND vec_id < 1000 AND vec_id % 7 <> 0),
       |qbk AS (SELECT vec_id, CAST(${bucketSqlFor(65, 4)} AS BIGINT) AS bucket FROM qa),
       |truth AS (SELECT q_id, c_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id, ROW_NUMBER() OVER (
       |      PARTITION BY q.vec_id ORDER BY
       |        ROUND(${dotSql("q.vd", "c.vd")}, 6) DESC, c.vec_id) AS rk
       |    FROM v q JOIN ret cn ON cn.vec_id <> q.vec_id
       |    JOIN v c ON c.vec_id = cn.vec_id
       |    WHERE q.vec_id % 50 = 0 AND q.vec_id < 1000 AND q.vec_id % 7 <> 0) t
       |  WHERE rk <= 3),
       |reb AS (SELECT 'rebuild' AS arm, q_id, c_id FROM (
       |    SELECT qb.vec_id AS q_id, ck.vec_id AS c_id, ROW_NUMBER() OVER (
       |      PARTITION BY qb.vec_id ORDER BY
       |        ROUND(${dotSql("q.vd", "c.vd")}, 6) DESC, ck.vec_id) AS rk
       |    FROM qbk qb JOIN v q ON q.vec_id = qb.vec_id
       |    JOIN crbk ck ON bit_count(xor(qb.bucket, ck.bucket)) <= 1
       |      AND ck.vec_id <> qb.vec_id
       |    JOIN v c ON c.vec_id = ck.vec_id) t
       |  WHERE rk <= 3),
       |st6 AS (SELECT qb.vec_id AS q_id, ck.vec_id AS c_id, ROW_NUMBER() OVER (
       |      PARTITION BY qb.vec_id ORDER BY
       |        ROUND(${dotSql("q.vd", "c.vd")}, 6) DESC, ck.vec_id) AS rk
       |    FROM qbk qb JOIN v q ON q.vec_id = qb.vec_id
       |    JOIN cbk ck ON bit_count(xor(qb.bucket, ck.bucket)) <= 1
       |      AND ck.vec_id <> qb.vec_id
       |    JOIN v c ON c.vec_id = ck.vec_id),
       |pf AS (SELECT 'post_filter' AS arm, q_id, c_id FROM (
       |    SELECT q_id, c_id, ROW_NUMBER() OVER (
       |      PARTITION BY q_id ORDER BY rk) AS r2
       |    FROM st6 WHERE rk <= 6 AND c_id % 7 <> 0) t WHERE r2 <= 3),
       |u AS (SELECT * FROM reb UNION ALL SELECT * FROM pf),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
       |agg AS (SELECT arm, CAST(COUNT(DISTINCT u.q_id) AS BIGINT) AS n_queries,
       |    CAST(COUNT(*) AS BIGINT) AS n_served,
       |    CAST(SUM(CASE WHEN truth.q_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_hits
       |  FROM u LEFT JOIN truth ON truth.q_id = u.q_id AND truth.c_id = u.c_id
       |  GROUP BY arm),
       |dec AS (SELECT
       |    (SELECT n_queries * 3 - n_served FROM agg WHERE arm = 'post_filter')
       |      AS pf_starved,
       |    (SELECT n_hits FROM agg WHERE arm = 'post_filter') AS pf_hits,
       |    (SELECT n_hits FROM agg WHERE arm = 'rebuild') AS rb_hits)
       |SELECT agg.arm,
       |  CAST(CASE WHEN agg.arm = 'rebuild' THEN 2 ELSE 1 END AS BIGINT)
       |    AS index_gen,
       |  agg.n_queries, agg.n_served,
       |  CAST(agg.n_queries * 3 - agg.n_served AS BIGINT) AS n_starved,
       |  agg.n_hits, nt.n_truth,
       |  (dec.pf_starved > 0 OR dec.rb_hits > dec.pf_hits OR 7 <= 4)
       |    AS rebuild_now,
       |  CAST(CASE WHEN dec.pf_starved > 0 OR dec.rb_hits > dec.pf_hits
       |    OR 7 <= 4 THEN 2 ELSE 1 END AS BIGINT) AS serving_gen
       |FROM agg CROSS JOIN nt CROSS JOIN dec ORDER BY agg.arm""".stripMargin)

  /** y10: Johnson–Lindenstrauss random projection + preservation report —
    * the dimensionality-reduction rung of the embedding ladder (y6
    * quantizes components, y5 codes subspaces, y10 drops dimensions):
    * every vector projects 64 → 16 dims with deterministic integer
    * weights ([[Similarity.projWeight]]), IN-SCAN and shuffle-free, so
    * every downstream shuffle/join/ANN index moves 4× fewer vector
    * bytes. JL says pairwise geometry survives; this query MEASURES it —
    * original vs projected cosine per pair on a BOUNDED query batch
    * (% 25 ∧ < 1000, the y7/y8 sampling discipline: the report is a
    * fixed-size diagnostic while the projection itself scales linearly
    * with the corpus). Both cosines round to 6 dp before the comparison;
    * each projected component is a pinned left-to-right 64-term sum, so
    * both engines compute bit-identical doubles (bucketSql discipline).
    * Reading max/mean |Δcos| here is how you pick the output dimension
    * before committing a corpus-scale re-embed. */
  private val y10JlProject = Q(
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .filter(col("vec_id") % 25 === 0 && col("vec_id") < 1000)
        .withColumn("p", Similarity.randomProjection("embedding", 16))
        .withColumn("nrm64", Similarity.norm("embedding"))
        .withColumn("nrm16", Similarity.norm("p"))
      val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_v"),
        col("p").as("a_p"), col("nrm64").as("a_n64"), col("nrm16").as("a_n16"))
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_v"),
        col("p").as("b_p"), col("nrm64").as("b_n64"), col("nrm16").as("b_n16"))
      a.join(b, col("a_id") < col("b_id"))
        .withColumn("cos64",
          round(Similarity.dot("a_v", "b_v") / (col("a_n64") * col("b_n64")), 6))
        .withColumn("cos16",
          round(Similarity.dot("a_p", "b_p") / (col("a_n16") * col("b_n16")), 6))
        .select(col("a_id"), col("b_id"), col("cos64"), col("cos16"),
          round(abs(col("cos64") - col("cos16")), 6).as("abs_err"))
        .orderBy("a_id", "b_id")
    },
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings
      |  WHERE vec_id % 25 = 0 AND vec_id < 1000),
      |p AS (SELECT vec_id, vd,
      |    list_transform(generate_series(0, 15), j ->
      |      list_reduce(list_transform(generate_series(0, 63),
      |        i -> vd[i + 1] * CAST((i * 37 + j * 23) % 17 - 8 AS DOUBLE)),
      |      (acc, x) -> acc + x)) AS pv
      |  FROM v),
      |n AS (SELECT vec_id, vd, pv, ${nrmSql("vd")} AS n64,
      |    sqrt(list_reduce(list_transform(pv, x -> x * x), (acc, x) -> acc + x)) AS n16
      |  FROM p),
      |pairs AS (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |    ROUND(${dotSql("a.vd", "b.vd")} / (a.n64 * b.n64), 6) AS cos64,
      |    ROUND(list_reduce(list_transform(generate_series(1, 16),
      |        i -> a.pv[i] * b.pv[i]), (acc, x) -> acc + x) / (a.n16 * b.n16), 6) AS cos16
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
      |SELECT a_id, b_id, cos64, cos16, ROUND(abs(cos64 - cos16), 6) AS abs_err
      |FROM pairs ORDER BY a_id, b_id""".stripMargin)

  /** y6: int8 scalar-quantized ANN — the entry rung of the embedding
    * compression ladder (y5's PQ is the next): one corpus pass finds the
    * global max |component|, every vector quantizes to ints in [-127, 127],
    * and serving ranks by quantized cosine. Integer dots and norms make the
    * ranking exact integer arithmetic plus one engine-stable division, so
    * unlike float cosine no rounding pre-pass is load-bearing (the 6-dp
    * round only stabilizes the printed score). Serving rides the
    * hyperplane-bucket equi-join (the y2 coarse quantizer): the %50 query
    * slice grows WITH the corpus, so the brute-force form is quadratic —
    * the soak measured 1.2 s → 65 s at 10× before this query was put on
    * the bucketed path (brute force remains in the operator as the
    * bounded-batch rerank rung, spec-gated). */
  private val y6SqAnn = Q(
    (s, d) => Similarity.quantizedTopK(
        Tables.embeddings(s, d)
          .withColumn("bucket", Similarity.hyperplaneBucket("embedding")),
        id => id % 50 === 0, "vec_id", "embedding", k = 5,
        blockCol = Some("bucket"))
      .orderBy("q_id", "rank"),
    s"""WITH v AS (SELECT vec_id, ${vdSql("embedding")} AS vd FROM embeddings),
       |bk AS (SELECT vec_id, vd, CAST($bucketSql AS BIGINT) AS bucket FROM v),
       |am AS (SELECT MAX(list_max(list_transform(vd, x -> abs(x)))) AS amax FROM v),
       |sc AS (SELECT 127.0 / amax AS scale FROM am),
       |qv AS (SELECT vec_id, bucket, list_transform(vd,
       |    x -> CAST(round(x * scale) AS INT)) AS q
       |  FROM bk CROSS JOIN sc),
       |n AS (SELECT vec_id, bucket, q,
       |    sqrt(CAST(list_reduce(list_transform(q, x -> CAST(x AS BIGINT) * x),
       |      (acc, x) -> acc + x) AS DOUBLE)) AS nrm FROM qv),
       |scored AS (
       |  SELECT a.vec_id AS q_id, a.bucket, b.vec_id AS c_id,
       |    ROUND(list_reduce(list_transform(generate_series(1, 64),
       |        i -> CAST(a.q[i] AS BIGINT) * b.q[i]), (acc, x) -> acc + x)
       |      / (a.nrm * b.nrm), 6) AS qcos
       |  FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
       |  WHERE a.vec_id % 50 = 0)
       |SELECT q_id, bucket, rank, c_id, qcos FROM (
       |  SELECT q_id, bucket, c_id, qcos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY qcos DESC, c_id) AS INT) AS rank
       |  FROM scored) r
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)

  /** x23: chunk-level retrieval index — the RAG-shaped composition (and
    * the retrieval FORM of contamination checking): chunk every document
    * (z8's op), featurize each chunk with a hashed bag-of-words count
    * vector (TextAnalysis.hashedBowVectors — a codegen'd explode +
    * map-side-combinable count aggregate; see its scaladoc for why the
    * shuffle-free HOF form loses by minutes), assign the
    * hyperplane bucket on the MEAN-CENTERED counts, and retrieve: for
    * each BENCHMARK chunk (doc_id % 97 = 0, the z11/x19 convention) the
    * top-3 corpus chunks by integer-exact hashed-BoW cosine (cosine stays
    * on the RAW counts — centering is a bucketing device only).
    *
    * Why center: count vectors are all-positive, so every plane dot
    * carries the same strong positive bias and the raw-count buckets
    * degenerate to a handful of values — the first soak measured 31 s at
    * 1× with one mega-bucket carrying the whole join. Subtracting the
    * chunk's mean count makes the plane signs informative (buckets
    * spread, join cost ∝ per-bucket products). The centering stays exact
    * in BOTH engines: mean = sum/64 is a dyadic division of an exact int,
    * x − mean keeps ≤ 6 fraction bits, and the float cast is lossless at
    * these magnitudes — so the native bucket expression and the double
    * oracle agree bitwise.
    *
    * Scale shape: the query side is 1/97 of the corpus — it GROWS with
    * the corpus, so serving rides the bucket equi-join (the y6 lesson;
    * brute force here would be quadratic), unhinted so AQE chooses
    * broadcast vs shuffle. Production swaps the featurizer for a learned
    * encoder at the same vector-column seam; everything from the bucket
    * join on is unchanged. */
  private val x23ChunkRetrieval = Q(
    (s, d) => {
      // scoped AQE floor (r14, guide §2.5): the bucket-join + 64-float-dot
      // per-pair stage is byte-tiny but CPU-dense — the 1m default merges
      // it to ONE task (7.2 s vs 2.0 s, in-JVM A/B; see the NOTE below for
      // why an in-plan repartition cannot fix it). 64k applies to THIS
      // query only; the harness sweep restores the session default.
      graft.Housekeeping.scopedConf(s,
        "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      val chunks = TextAnalysis.hashedBowVectors(
          TextAnalysis.chunkWords(
            graft.Tables.fanOut(Tables.documents(s, d)), // r13: 1-task scan
            "doc_id", "text", 32)
            .select(col("doc_id"), col("chunk_id"),
              split(col("chunk_text"), " ").as("ws")),
          Seq("doc_id", "chunk_id"), "ws", 64)
        .withColumn("__mean",
          expr("aggregate(v, 0, (a, x) -> a + x)").cast("double") / lit(64.0))
        .withColumn("fv",
          expr("transform(v, x -> CAST(CAST(x AS DOUBLE) - __mean AS FLOAT))"))
        .withColumn("bucket", Similarity.hyperplaneBucket("fv"))
        // serve on RAW counts as floats: every value is a small exact int,
        // so the double-accumulated native vector_dot (RewriteDotProduct
        // turns the HOF into the codegen'd expression) yields the SAME
        // exact integers as an integer fold — but runs compiled, which is
        // what the per-pair hot loop needs (the interpreted HOF dot
        // measured 47 s at 10×; native ~7 s)
        .withColumn("fvr", expr("transform(v, x -> CAST(x AS FLOAT))"))
        .withColumn("nrm", sqrt(Similarity.dot("fvr", "fvr")))
        .select("doc_id", "chunk_id", "fvr", "bucket", "nrm")
      // NOTE (r13→r14, guide §2.5/§2.6): the stage that probes the bucket
      // join and computes a 64-float dot per pair is byte-tiny but
      // CPU-dense; AQE's 1 MB byte-based coalescing floor merged it into
      // ONE task — 5.1 s of the query's 7 s serialized on one core of 32.
      // Fixed by the SCOPED 64k floor at the top of this lambda (r13 set
      // it session-wide; r14 narrowed it after the CC/minhash band
      // measured 1–1.9 s slower under it). An in-plan repartition was
      // tried first and rejected — placed on the pair relation it
      // re-shuffles the vectors (guide §2.3); placed on the query side
      // AQE just flips the tiny side to the broadcast build and streams
      // the candidates through the coalesced exchange anyway.
      // measured 8.1 s → 1.8 s (in-JVM A/B, r13).
      val q = chunks.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("q_doc"), col("chunk_id").as("q_chunk"),
          col("fvr").as("q_v"), col("bucket"), col("nrm").as("q_nrm"))
      val c = chunks.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id").as("c_doc"), col("chunk_id").as("c_chunk"),
          col("fvr").as("c_v"), col("bucket"), col("nrm").as("c_nrm"))
      val scored = q.join(c, Seq("bucket"))
        .withColumn("qcos",
          round(Similarity.dot("q_v", "c_v") / (col("q_nrm") * col("c_nrm")), 6))
      val w = Window.partitionBy("q_doc", "q_chunk")
        .orderBy(col("qcos").desc, col("c_doc").asc, col("c_chunk").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("q_doc", "q_chunk", "rank", "c_doc", "c_chunk", "qcos")
        .orderBy("q_doc", "q_chunk", "rank")
    },
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |ch AS (SELECT doc_id, l,
       |    unnest(generate_series(0, (len(l) - 1) // 32)) AS chunk_id FROM ws),
       |ck AS (SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       |    list_slice(l, chunk_id * 32 + 1, chunk_id * 32 + 32) AS t FROM ch),
       |hs AS (SELECT doc_id, chunk_id,
       |    list_transform(t, w -> ${h32Sql("w")} % 64) AS h FROM ck),
       |vec AS (SELECT doc_id, chunk_id, list_transform(generate_series(0, 63),
       |    i -> CAST(len(list_filter(h, x -> x = i)) AS INT)) AS v FROM hs),
       |vv AS (SELECT doc_id, chunk_id, v,
       |    list_transform(v, e -> CAST(e AS DOUBLE)
       |      - CAST(list_reduce(v, (a, b) -> a + b) AS DOUBLE) / 64.0) AS vd
       |  FROM vec),
       |bk AS (SELECT doc_id, chunk_id, v,
       |    CAST(${bucketSqlFor(64)} AS BIGINT) AS bucket,
       |    sqrt(CAST(list_reduce(list_transform(v, x -> CAST(x AS BIGINT) * x),
       |      (acc, x) -> acc + x) AS DOUBLE)) AS nrm FROM vv),
       |scored AS (
       |  SELECT q.doc_id AS q_doc, q.chunk_id AS q_chunk,
       |    c.doc_id AS c_doc, c.chunk_id AS c_chunk,
       |    ROUND(list_reduce(list_transform(generate_series(1, 64),
       |        i -> CAST(q.v[i] AS BIGINT) * c.v[i]), (acc, x) -> acc + x)
       |      / (q.nrm * c.nrm), 6) AS qcos
       |  FROM bk q JOIN bk c ON q.bucket = c.bucket
       |  WHERE q.doc_id % 97 = 0 AND c.doc_id % 97 <> 0)
       |SELECT q_doc, q_chunk, rank, c_doc, c_chunk, qcos FROM (
       |  SELECT q_doc, q_chunk, c_doc, c_chunk, qcos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_doc, q_chunk
       |      ORDER BY qcos DESC, c_doc, c_chunk) AS INT) AS rank
       |  FROM scored) r
       |WHERE rank <= 3 ORDER BY q_doc, q_chunk, rank""".stripMargin)

  /** x19: span-level benchmark decontamination — z11 flags a document if
    * ANY 3-gram shingle overlaps the benchmark; this measures HOW MUCH of
    * it is verbatim benchmark material at 8-word-span granularity (the
    * exact-substring hygiene check run before training on a corpus that
    * may embed eval sets). Benchmark = the z11 convention (doc_id % 97 ==
    * 0). Both sides reduce to fingerprint aggregates before the fp-keyed
    * verdict join; the benchmark span set is eval-suite-sized, so AQE
    * broadcasts it — no forced hint. */
  private val x19SpanDecontaminate = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.spanDecontaminate(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", k = 8)
        .orderBy("doc_id")
    },
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |win AS (
      |  SELECT doc_id, md5(array_to_string(w[i:i+7], ' ')) AS fp
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
      |        FROM ws WHERE len(w) >= 8)),
      |pd AS (SELECT doc_id, fp, COUNT(*) AS c FROM win
      |       WHERE doc_id % 97 <> 0 GROUP BY 1, 2),
      |bench AS (SELECT DISTINCT fp FROM win WHERE doc_id % 97 = 0),
      |agg AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_windows,
      |    CAST(SUM(CASE WHEN b.fp IS NOT NULL THEN c ELSE 0 END) AS BIGINT) AS n_contam
      |  FROM pd LEFT JOIN bench b ON pd.fp = b.fp GROUP BY 1)
      |SELECT doc_id, n_windows, n_contam, n_contam / n_windows AS contam_frac
      |FROM agg ORDER BY doc_id""".stripMargin)

  /** x19b: span decontamination on the ROLLING fingerprint — completes
    * the rolling family (x18b spans, m5b payloads, z37b grams): one md5
    * per word + O(1) slides on BOTH the corpus and benchmark sides, so
    * the fp-keyed verdict join carries longs, not md5 strings. Same
    * contamination semantics; the fingerprint is the dual-lattice 62-bit
    * pack (hi·2³¹ + lo — see spanFingerprints), and the oracle replays
    * both Horner folds identically. */
  private val x19bSpanDeconRolling = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.spanDecontaminate(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", k = 8, rolling = true)
        .orderBy("doc_id")
    },
    s"""WITH hs AS (SELECT doc_id,
       |    list_transform(string_split(text, ' '), x -> ${h32Sql("x")}) AS hs
       |  FROM documents),
       |win AS (
       |  SELECT doc_id,
       |    list_reduce(hs[i:i+7], (acc, h) -> (acc * 257 + h) % 2147483647) * 2147483648
       |      + list_reduce(hs[i:i+7], (acc, h) -> (acc * 263 + h) % 2147483629) AS fp
       |  FROM (SELECT doc_id, hs, unnest(generate_series(1, len(hs) - 7)) AS i
       |        FROM hs WHERE len(hs) >= 8)),
       |pd AS (SELECT doc_id, fp, COUNT(*) AS c FROM win
       |       WHERE doc_id % 97 <> 0 GROUP BY 1, 2),
       |bench AS (SELECT DISTINCT fp FROM win WHERE doc_id % 97 = 0),
       |agg AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_windows,
       |    CAST(SUM(CASE WHEN b.fp IS NOT NULL THEN c ELSE 0 END) AS BIGINT) AS n_contam
       |  FROM pd LEFT JOIN bench b ON pd.fp = b.fp GROUP BY 1)
       |SELECT doc_id, n_windows, n_contam, n_contam / n_windows AS contam_frac
       |FROM agg ORDER BY doc_id""".stripMargin)

  /** Shared z21/x21 stage: DSIR-shaped per-document importance frame
    * (doc_id, source, llr_dec, kept) — data selection by unigram
    * log-likelihood ratio between a target domain (source src0 as the
    * in-domain proxy) and the whole corpus, the hashed-n-gram importance
    * weighting behind "Data Selection for Language Models via Importance
    * Resampling". Per-term ln probabilities (Laplace-smoothed) snapshot
    * at DECIMAL(12,6) (the z15 discipline), so per-doc llr sums are
    * exact-decimal and shuffle-order-independent; the deterministic
    * md5-bucket resample keeps in-domain-looking docs at 80% and the rest
    * at 20%. The weight table is vocab-bounded (broadcast by AQE, no
    * hint); the corpus pays one term explode and one doc-keyed sum. ONE
    * implementation so the declared z21 query and the curation-v4
    * composition can never drift on the weight or resample definitions. */
  private def dsirPerDoc(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.types.{DecimalType, LongType}
      val tcx = docs
        .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("term"))
      // ONE corpus explode: tf is the only aggregate built directly on the
      // exploded relation; the term-level count tables derive from tf's
      // already-reduced output, and every consumer shares the identical tf
      // subtree, so the scan + explode + (doc, term) shuffle execute once
      // (exchange reuse) instead of once per count table
      val tf = tcx.groupBy("doc_id", "source", "term")
        .agg(count(lit(1)).cast(LongType).as("tf"))
      val cc = tf.groupBy("term").agg(sum(col("tf")).cast(LongType).as("cc"))
      val tcnt = tf.filter(col("source") === "src0")
        .groupBy("term").agg(sum(col("tf")).cast(LongType).as("tc"))
      val tots = cc.agg(sum(col("cc")).cast(LongType).as("ctot"), count(lit(1)).as("v"))
      val ttots = tcnt.agg(coalesce(sum(col("tc")), lit(0L)).cast(LongType).as("ttot"))
      val w = cc.join(tcnt, Seq("term"), "left")
        .crossJoin(broadcast(tots)).crossJoin(broadcast(ttots))
        .withColumn("llr6",
          log((coalesce(col("tc"), lit(0L)) + lit(1L)) / (col("ttot") + col("v")))
            .cast(DecimalType(12, 6))
          - log((col("cc") + lit(1L)) / (col("ctot") + col("v")))
            .cast(DecimalType(12, 6)))
        .select("term", "llr6")
      tf.join(w, Seq("term"))
        .groupBy("doc_id", "source")
        .agg(sum(col("tf") * col("llr6")).as("llr_dec"))
        .withColumn("kept",
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast(LongType) % 1000 <
            when(col("llr_dec") > 0, 800).otherwise(200))
  }

  /** DuckDB CTE chain replaying [[dsirPerDoc]] over `src` — ends in
    * `perdoc(doc_id, source, llr_dec, kept)`. ONE definition shared by
    * the z21 oracle and the v6 capstone so the weight table and resample
    * rule can never drift. */
  private def dsirCtesFor(src: String): String =
    s"""tcx AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
       |            FROM $src),
       |cc AS (SELECT term, COUNT(*) AS cc FROM tcx GROUP BY 1),
       |tcnt AS (SELECT term, COUNT(*) AS tc FROM tcx WHERE source = 'src0' GROUP BY 1),
       |tots AS (SELECT CAST(SUM(cc) AS BIGINT) AS ctot, COUNT(*) AS v FROM cc),
       |ttots AS (SELECT CAST(COALESCE(SUM(tc), 0) AS BIGINT) AS ttot FROM tcnt),
       |w AS (SELECT cc.term,
       |    CAST(ln((COALESCE(tc, 0) + 1) / (ttot + v)) AS DECIMAL(12,6))
       |  - CAST(ln((cc + 1) / (ctot + v)) AS DECIMAL(12,6)) AS llr6
       |  FROM cc LEFT JOIN tcnt ON cc.term = tcnt.term
       |  CROSS JOIN tots CROSS JOIN ttots),
       |tf AS (SELECT doc_id, source, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM tcx GROUP BY 1, 2, 3),
       |perdoc AS (
       |  SELECT doc_id, source, SUM(tf * llr6) AS llr_dec,
       |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 <
       |      CASE WHEN SUM(tf * llr6) > 0 THEN 800 ELSE 200 END AS kept
       |  FROM tf JOIN w USING (term) GROUP BY 1, 2)""".stripMargin

  private val z21DsirSample = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DoubleType, LongType}
      dsirPerDoc(Tables.documents(s, d)).groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1).otherwise(0)).cast(LongType).as("n_kept"),
          (sum(col("llr_dec")).cast(DoubleType) / count(lit(1))).as("mean_llr"))
        .orderBy("source")
    },
    s"""WITH ${dsirCtesFor("documents")}
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(llr_dec) AS DOUBLE) / COUNT(*) AS mean_llr
       |FROM perdoc GROUP BY source ORDER BY source""".stripMargin)

  /** z22: temperature-scaled mixture weights — the Pile/ROOTS-style
    * source reweighting that decides how often each domain repeats in the
    * training stream: weight ∝ n_tokens^0.5 (temperature flattening —
    * sqrt, a single correctly-rounded op in both engines), normalized
    * into shares via exact-decimal snapshots (never a float sum in
    * aggregation order), then a repeat factor against a 1M-token budget.
    * Source-level aggregates only — broadcast-sized everywhere after the
    * one corpus scan. */
  private val z22TemperatureMix = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
      val stats = Tables.documents(s, d)
        .select(col("source"), size(split(col("text"), " ")).cast(LongType).as("toks"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).cast(LongType).as("n_tokens"))
      val w = stats.withColumn("w_dec",
        sqrt(col("n_tokens").cast(DoubleType)).cast(DecimalType(18, 8)))
      val tot = w.agg(sum(col("w_dec")).as("w_tot"))
      w.crossJoin(broadcast(tot))
        .withColumn("share", col("w_dec").cast(DoubleType) / col("w_tot").cast(DoubleType))
        .withColumn("repeat_factor",
          col("share") * lit(1000000.0) / col("n_tokens"))
        .select("source", "n_docs", "n_tokens", "share", "repeat_factor")
        .orderBy("source")
    },
    """WITH s AS (SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |w AS (SELECT *, CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(18,8)) AS w_dec
      |      FROM s),
      |t AS (SELECT SUM(w_dec) AS w_tot FROM w)
      |SELECT source, n_docs, n_tokens,
      |  CAST(w_dec AS DOUBLE) / CAST(w_tot AS DOUBLE) AS share,
      |  CAST(w_dec AS DOUBLE) / CAST(w_tot AS DOUBLE)
      |    * CAST(1000000.0 AS DOUBLE) / n_tokens AS repeat_factor
      |FROM w CROSS JOIN t ORDER BY source""".stripMargin)

  /** z43: token-budget mixture allocation — z22 computes temperature
    * SHARES; this rung turns them into the executable recipe: a 4×-corpus
    * token budget (the repeat-heavy small-corpus regime) split by
    * sqrt-flattened share, with each source's repeat rate capped at 4
    * epochs (the Llama/Pile discipline). Emits per source the allocated
    * tokens, the effective epoch rate, and whether the cap bound — the
    * unabsorbed budget is visible as target − alloc, never silently
    * redistributed. Integer-exact after two deterministic double ops
    * (share, target) land in a floor; see Sampling.tokenBudget. */
  private val z43TokenBudget = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val stats = Tables.documents(s, d)
        .select(col("source"), size(split(col("text"), " ")).cast(LongType).as("toks"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).cast(LongType).as("n_tokens"))
      val budget = stats.agg((sum(col("n_tokens")) * 4).cast(LongType).as("budget_tokens"))
      Sampling.tokenBudget(stats, "source", "n_tokens", budget, maxEpochs = 4)
        .select("source", "n_docs", "n_tokens", "share", "target_tokens",
          "alloc_tokens", "epochs", "capped")
        .orderBy("source")
    },
    """WITH s AS (SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |w AS (SELECT *, CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(18,8)) AS w_dec
      |      FROM s),
      |t AS (SELECT SUM(w_dec) AS w_tot,
      |             CAST(SUM(n_tokens) * 4 AS BIGINT) AS budget_tokens FROM w),
      |a AS (SELECT source, n_docs, n_tokens,
      |  CAST(w_dec AS DOUBLE) / CAST(w_tot AS DOUBLE) AS share,
      |  CAST(FLOOR(CAST(w_dec AS DOUBLE) / CAST(w_tot AS DOUBLE)
      |    * CAST(budget_tokens AS DOUBLE)) AS BIGINT) AS target_tokens
      |  FROM w CROSS JOIN t)
      |SELECT source, n_docs, n_tokens, share, target_tokens,
      |  LEAST(target_tokens, n_tokens * 4) AS alloc_tokens,
      |  LEAST(target_tokens, n_tokens * 4) / n_tokens AS epochs,
      |  target_tokens > n_tokens * 4 AS capped
      |FROM a ORDER BY source""".stripMargin)

  /** z53: curriculum mixture schedule — the annealed data schedule the
    * decay-phase recipes use (train on the natural distribution early,
    * shift toward high-quality sources late): per-epoch source weights
    * interpolate linearly from the natural token share p_s (epoch 0) to
    * a quality-skewed share q_s (final epoch), λ_e = e·0.25 over 5
    * epochs (dyadic steps — exact in both engines). Quality here is the
    * per-source mean unique-token fraction (repetitive boilerplate
    * sources score low), each per-doc ratio snapshotted at DECIMAL(12,6)
    * before the order-sensitive mean (the composite-score discipline),
    * and the source mean re-snapshotted before the share division so
    * both normalizations are exact-decimal sums with ONE IEEE division
    * at each boundary. Per (epoch, source): the blended weight, the
    * token allocation against a one-pass-per-epoch budget, the
    * target→alloc cap at 2 repetitions per epoch (z43's visible-cap
    * rule), and the effective epoch rate. Because the blend is linear, a
    * source's weight is MONOTONE across epochs toward its quality share
    * — the spec pins that and the epoch-0/final-epoch endpoints.
    * Source-level aggregates only: one corpus scan, then an
    * epochs×sources (≤ 50-row) broadcast-sized frame. */
  private val z53CurriculumMix = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
      val docs = Tables.documents(s, d)
      val stats = docs
        .select(col("source"),
          size(split(col("text"), " ")).cast(LongType).as("toks"),
          (size(array_distinct(split(col("text"), " "))) / size(split(col("text"), " ")))
            .cast(DecimalType(12, 6)).as("uq_dec"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).cast(LongType).as("n_tokens"),
          sum(col("uq_dec")).as("uq_sum"))
        .withColumn("qm_dec",
          (col("uq_sum").cast(DoubleType) / col("n_docs")).cast(DecimalType(12, 6)))
      val tots = stats.agg(
        sum(col("n_tokens")).cast(LongType).as("total_tokens"),
        sum(col("qm_dec")).as("q_tot"))
      val ep = stats.crossJoin(broadcast(tots))
        .withColumn("p", col("n_tokens") / col("total_tokens"))
        .withColumn("q", col("qm_dec").cast(DoubleType) / col("q_tot").cast(DoubleType))
        .select(col("source"), col("n_tokens"), col("total_tokens"),
          col("p"), col("q"), explode(sequence(lit(0), lit(4))).as("epoch"))
        .withColumn("lam", col("epoch") * lit(0.25))
        .withColumn("weight", (lit(1.0) - col("lam")) * col("p") + col("lam") * col("q"))
        .withColumn("target_tokens",
          floor(col("weight") * col("total_tokens").cast(DoubleType)).cast(LongType))
        .withColumn("alloc_tokens",
          least(col("target_tokens"), col("n_tokens") * 2).cast(LongType))
      ep.select(col("epoch").cast("int").as("epoch"), col("source"), col("lam"),
          col("weight"), col("target_tokens"), col("alloc_tokens"),
          (col("alloc_tokens") / col("n_tokens")).as("eff_epochs"),
          (col("target_tokens") > col("n_tokens") * 2).as("capped"))
        .orderBy("epoch", "source")
    },
    """WITH pd AS (SELECT source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
      |    CAST(len(list_distinct(string_split(text, ' ')))
      |      / len(string_split(text, ' ')) AS DECIMAL(12,6)) AS uq_dec
      |  FROM documents),
      |s AS (SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(toks) AS BIGINT) AS n_tokens, SUM(uq_dec) AS uq_sum
      |  FROM pd GROUP BY 1),
      |s2 AS (SELECT *,
      |    CAST(CAST(uq_sum AS DOUBLE) / n_docs AS DECIMAL(12,6)) AS qm_dec
      |  FROM s),
      |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |             SUM(qm_dec) AS q_tot FROM s2),
      |ep AS (SELECT source, n_tokens, total_tokens,
      |    n_tokens / total_tokens AS p,
      |    CAST(qm_dec AS DOUBLE) / CAST(q_tot AS DOUBLE) AS q,
      |    CAST(unnest(generate_series(0, 4)) AS INT) AS epoch
      |  FROM s2 CROSS JOIN t),
      |w AS (SELECT *, epoch * CAST(0.25 AS DOUBLE) AS lam FROM ep),
      |a AS (SELECT *,
      |    (CAST(1.0 AS DOUBLE) - lam) * p + lam * q AS weight FROM w),
      |b AS (SELECT *,
      |    CAST(FLOOR(weight * CAST(total_tokens AS DOUBLE)) AS BIGINT)
      |      AS target_tokens FROM a)
      |SELECT epoch, source, lam, weight, target_tokens,
      |  LEAST(target_tokens, n_tokens * 2) AS alloc_tokens,
      |  LEAST(target_tokens, n_tokens * 2) / n_tokens AS eff_epochs,
      |  target_tokens > n_tokens * 2 AS capped
      |FROM b ORDER BY epoch, source""".stripMargin)

  /** z44: balanced shard assignment — the writer-side step after z19's
    * packing: round-robin over the global token-size-descending order
    * lands every one of 16 shards within one max-document of the mean
    * load, where `doc_id % 16` keeps whatever skew the id order carries.
    * The global rank rides runningTotal's two-pass range-partition
    * offsets (z19's machinery) — bounded per-partition sorts, never a
    * corpus window; the oracle replays the rank as a window function.
    * Per-shard doc/token totals are integer-exact. */
  private val z44ShardAssign = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).cast(LongType).as("toks"))
      Sampling.shardAssign(docs, Seq("doc_id"), "toks", nShards = 16)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).cast(LongType).as("shard_tokens"),
          max(col("toks")).cast(LongType).as("max_doc_tokens"))
        .orderBy("shard")
    },
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks FROM documents),
      |r AS (SELECT doc_id, toks,
      |    ROW_NUMBER() OVER (ORDER BY toks DESC, doc_id) AS rnk FROM t)
      |SELECT CAST((rnk - 1) % 16 AS INT) AS shard, COUNT(*) AS n_docs,
      |  CAST(SUM(toks) AS BIGINT) AS shard_tokens,
      |  CAST(MAX(toks) AS BIGINT) AS max_doc_tokens
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)

  /** z46: per-epoch data-loader order — the LAST artifact of the training
    * lifecycle (mixture → budget → shards → the order each epoch reads):
    * every epoch gets a different but fully reproducible permutation of
    * each z44 shard, keyed by md5(doc_id ":" epoch) — no RNG state, any
    * worker can recompute its slice from the key alone (the production
    * property: resume-from-step needs order to be a pure function of
    * (doc, epoch)). Emitting the permutation itself would be corpus×epoch
    * rows, so the query pins it with per-(epoch, shard) integer
    * invariants instead: the first doc in order and the position-weighted
    * checksum Σ pos·doc_id on the 2³¹−1 lattice (overflow-safe at 64-bit
    * id widths). The checksum is a strong pin, not a perfect
    * one: any adjacent transposition changes it (by the doc_id
    * difference, nonzero since ids are distinct), but a crafted k-cycle
    * can preserve the sum — combined with first_doc, n_docs, and the
    * deterministic md5 key it is collision-hard in practice, and the
    * point is drift DETECTION, not cryptographic commitment. Scale: the
    * rank window partitions by
    * (epoch, shard) — shard-sized frames, never a corpus sort; the
    * epoch explode multiplies rows by a constant 4 (a production writer
    * materializes one epoch at a time; the checksum audit is what you
    * run over ALL of them). All cells are exact integers. */
  private val z46EpochShuffle = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).cast(LongType).as("toks"))
      val sharded = Sampling.shardAssign(docs, Seq("doc_id"), "toks", nShards = 16)
      val ep = sharded.select(col("doc_id"), col("shard"),
        explode(sequence(lit(0), lit(3))).as("epoch"))
      val ordered = ep.withColumn("pos", row_number().over(
        Window.partitionBy("epoch", "shard").orderBy(
          md5(concat(col("doc_id").cast("string"), lit(":"),
            col("epoch").cast("string"))), col("doc_id"))))
      // checksum terms ride the 2^31-1 lattice (RollingWindows' modulus):
      // raw pos·doc_id would overflow BIGINT at production id widths
      // (64-bit hash ids × 10^8-row shards raise under ANSI), while
      // ((pos%M)·(id%M))%M keeps every product under 2^62 and the sum
      // under 2^63 to ~4e9 rows per (epoch, shard), folded once more at
      // the end. Same arithmetic in the oracle.
      val M = lit(2147483647L)
      ordered.groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n_docs"),
          max(when(col("pos") === 1, col("doc_id"))).as("first_doc"),
          pmod(sum((col("pos").cast(LongType) % M) * (col("doc_id") % M) % M), M)
            .cast(LongType).as("order_checksum"))
        .orderBy("epoch", "shard")
    },
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks FROM documents),
      |r AS (SELECT doc_id, toks,
      |    ROW_NUMBER() OVER (ORDER BY toks DESC, doc_id) AS rnk FROM t),
      |sh AS (SELECT doc_id, CAST((rnk - 1) % 16 AS INT) AS shard FROM r),
      |ep AS (SELECT doc_id, shard,
      |    CAST(unnest(generate_series(0, 3)) AS INT) AS epoch FROM sh),
      |o AS (SELECT epoch, shard, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY epoch, shard
      |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)),
      |        doc_id) AS pos
      |  FROM ep)
      |SELECT epoch, shard, COUNT(*) AS n_docs,
      |  MAX(CASE WHEN pos = 1 THEN doc_id END) AS first_doc,
      |  CAST(SUM((pos % 2147483647) * (doc_id % 2147483647) % 2147483647)
      |    % 2147483647 AS BIGINT) AS order_checksum
      |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** z23: trigram Stupid Backoff scoring (Brants et al., "Large Language
    * Models in Machine Translation") — the web-scale LM smoothing that
    * never normalizes: S(w|u,v) = trigram MLE when the train slice saw
    * the trigram, else 0.4·S(w|v), recursing to a Laplace unigram floor.
    * Unlike z15/z17's in-corpus scoring, the LM here is fit on a TRAIN
    * slice (doc_id % 5 != 0) and scores EVERY doc, so held-out docs
    * genuinely hit the backoff path (~half the trigram space is unseen
    * at the gate SFs). All ln snapshots ride DECIMAL(12,6) and backoff
    * terms add in exact decimal, so per-doc sums are shuffle-order-
    * independent. Scale: the trigram/bigram tables are corpus-derived —
    * joined UNHINTED (the z17 lesson: AQE broadcasts while they fit,
    * shuffle-joins when they don't); the unigram floor is vocab-bounded;
    * one pinned null-padded explode feeds all three n-gram streams (one
    * corpus tokenize, not four). */
  private val z23BackoffLm = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}
      val dec = DecimalType(12, 6)
      val docs = Tables.documents(s, d)
      // ONE corpus scan + explode feeds every n-gram table AND the scoring
      // stream: position i emits (p1 = ws[i-2] | null, p2 = ws[i-1] | null,
      // cur = ws[i]), so the unigram stream is every row, the bigram
      // stream filters p2 non-null and the trigram stream p1 non-null —
      // identical multisets to three separate explodes. The frame is
      // pinned (materialized once) because Spark has no cross-branch
      // common-subexpression elimination: six unpinned consumers would
      // re-run the scan + tokenize six times. Blocks are the harness's to
      // release after the action, like x21's pair frame.
      val ng = graft.Housekeeping.pin(s)(
        docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
          .select(col("doc_id"), explode(expr(
            """transform(sequence(0, size(ws) - 1),
              |  i -> struct(
              |    IF(i >= 2, ws[i-2], CAST(NULL AS STRING)) AS p1,
              |    IF(i >= 1, ws[i-1], CAST(NULL AS STRING)) AS p2,
              |    ws[i] AS cur))""".stripMargin)).as("t"))
          .select(col("doc_id"), col("t.p1"), col("t.p2"), col("t.cur"))).df
      val tri = ng.filter(col("p1").isNotNull)
      val triTr = tri.filter(col("doc_id") % 5 =!= 0)
      val tcnt = triTr.groupBy("p1", "p2", "cur").agg(count(lit(1)).as("n_tri"))
      val ccnt = triTr.groupBy("p1", "p2").agg(count(lit(1)).as("n_ctx"))
      val trilp = tcnt.join(ccnt, Seq("p1", "p2"))
        .withColumn("tri_lp", log(col("n_tri").cast(DoubleType) / col("n_ctx")).cast(dec))
        .select("p1", "p2", "cur", "tri_lp")
      val bgTr = ng.filter(col("p2").isNotNull && col("doc_id") % 5 =!= 0)
        .select(col("p2"), col("cur"))
      val bcnt = bgTr.groupBy("p2", "cur").agg(count(lit(1)).as("n_bg"))
      val pcnt = bgTr.groupBy("p2").agg(count(lit(1)).as("n_prev"))
      val bglp = bcnt.join(pcnt, Seq("p2"))
        .withColumn("bg_lp", log(col("n_bg").cast(DoubleType) / col("n_prev")).cast(dec))
        .select("p2", "cur", "bg_lp")
      val toks = ng.filter(col("doc_id") % 5 =!= 0).select(col("cur"))
      val ucnt = toks.groupBy("cur").agg(count(lit(1)).as("n_u"))
      val tots = ucnt.agg(sum(col("n_u")).cast(LongType).as("n_tok"), count(lit(1)).as("v"))
      val ulp = ucnt.crossJoin(broadcast(tots))
        .withColumn("u_lp", log((col("n_u") + lit(1L)) / (col("n_tok") + col("v"))).cast(dec))
        .select("cur", "u_lp")
      val ln04 = log(lit(0.4)).cast(dec)
      val scored = tri
        .join(trilp, Seq("p1", "p2", "cur"), "left")
        .join(bglp, Seq("p2", "cur"), "left")
        .join(ulp, Seq("cur"), "left")
        .crossJoin(broadcast(tots))
        .withColumn("lp", coalesce(col("tri_lp"),
          ln04 + coalesce(col("bg_lp"),
            ln04 + coalesce(col("u_lp"),
              log(lit(1.0) / (col("n_tok") + col("v"))).cast(dec)))))
        .withColumn("backoff", col("tri_lp").isNull)
      scored.groupBy("doc_id")
        .agg(count(lit(1)).cast(IntegerType).as("n_trigrams"),
          sum(when(col("backoff"), 1).otherwise(0)).cast(LongType).as("n_backoff"),
          (sum(col("lp")).cast(DoubleType) / count(lit(1))).as("avg_logprob"))
        .withColumn("held_out", col("doc_id") % 5 === 0)
        .orderBy("doc_id")
    },
    """WITH wl AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |tpos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
      |         FROM wl WHERE len(l) >= 3),
      |tri AS (SELECT doc_id, l[i] AS p1, l[i+1] AS p2, l[i+2] AS cur FROM tpos),
      |tritr AS (SELECT * FROM tri WHERE doc_id % 5 <> 0),
      |tcnt AS (SELECT p1, p2, cur, COUNT(*) AS n_tri FROM tritr GROUP BY 1, 2, 3),
      |ccnt AS (SELECT p1, p2, COUNT(*) AS n_ctx FROM tritr GROUP BY 1, 2),
      |trilp AS (SELECT p1, p2, cur,
      |    CAST(ln(CAST(n_tri AS DOUBLE) / n_ctx) AS DECIMAL(12,6)) AS tri_lp
      |  FROM tcnt JOIN ccnt USING (p1, p2)),
      |bpos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
      |         FROM wl WHERE len(l) >= 2),
      |bgtr AS (SELECT l[i] AS p2, l[i+1] AS cur FROM bpos WHERE doc_id % 5 <> 0),
      |bcnt AS (SELECT p2, cur, COUNT(*) AS n_bg FROM bgtr GROUP BY 1, 2),
      |pcnt AS (SELECT p2, COUNT(*) AS n_prev FROM bgtr GROUP BY 1),
      |bglp AS (SELECT p2, cur,
      |    CAST(ln(CAST(n_bg AS DOUBLE) / n_prev) AS DECIMAL(12,6)) AS bg_lp
      |  FROM bcnt JOIN pcnt USING (p2)),
      |toks AS (SELECT unnest(l) AS cur FROM wl WHERE doc_id % 5 <> 0),
      |ucnt AS (SELECT cur, COUNT(*) AS n_u FROM toks GROUP BY 1),
      |tots AS (SELECT CAST(SUM(n_u) AS BIGINT) AS n_tok, COUNT(*) AS v FROM ucnt),
      |ulp AS (SELECT cur, CAST(ln((n_u + 1) / (n_tok + v)) AS DECIMAL(12,6)) AS u_lp
      |        FROM ucnt CROSS JOIN tots),
      |sc AS (SELECT tri.doc_id,
      |    COALESCE(t.tri_lp,
      |      CAST(ln(CAST(0.4 AS DOUBLE)) AS DECIMAL(12,6))
      |      + COALESCE(b.bg_lp,
      |        CAST(ln(CAST(0.4 AS DOUBLE)) AS DECIMAL(12,6))
      |        + COALESCE(u.u_lp,
      |          CAST(ln(CAST(1.0 AS DOUBLE) / (n_tok + v)) AS DECIMAL(12,6))))) AS lp,
      |    t.tri_lp IS NULL AS backoff
      |  FROM tri
      |  LEFT JOIN trilp t ON tri.p1 = t.p1 AND tri.p2 = t.p2 AND tri.cur = t.cur
      |  LEFT JOIN bglp b ON tri.p2 = b.p2 AND tri.cur = b.cur
      |  LEFT JOIN ulp u ON tri.cur = u.cur
      |  CROSS JOIN tots)
      |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_trigrams,
      |  CAST(SUM(CASE WHEN backoff THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff,
      |  CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_logprob,
      |  doc_id % 5 = 0 AS held_out
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin)

  /** z24: source-overlap matrix — the corpus-composition report (Dolma/
    * RedPajama-style): for every pair of sources, the Jaccard overlap of
    * their distinct 3-gram shingle sets. Surfaces which domains are
    * near-copies of each other (mirror sites, crawl overlap) before
    * mixture weights are chosen. The (shingle, source) relation is
    * distinct-reduced BEFORE the self-join, and per-shingle fan-out is
    * bounded by |sources|² (a constant ~20², not corpus-sized) — the
    * shuffle is linear in distinct shingles. Pair intersections are
    * map-side-combinable counts; the final matrix is |sources|²-sized. */
  private val z24SourceOverlap = Q(
    (s, d) => {
      val sh = Tables.documents(s, d)
        .select(col("source"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("source"), explode(TextAnalysis.shinglesExpr("ws", 3)).as("sh"))
        .distinct()
      val sizes = sh.groupBy("source").agg(count(lit(1)).as("n_sh"))
      val inter = sh.as("a").join(sh.as("b"), Seq("sh"))
        .filter(col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_common"))
      inter
        .join(sizes.withColumnRenamed("source", "src_a")
          .withColumnRenamed("n_sh", "n_a"), Seq("src_a"))
        .join(sizes.withColumnRenamed("source", "src_b")
          .withColumnRenamed("n_sh", "n_b"), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("n_common"), col("n_a"), col("n_b"),
          (col("n_common") / (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
        .orderBy("src_a", "src_b")
    },
    """WITH ws AS (SELECT source, string_split(text, ' ') AS w FROM documents),
      |pos AS (SELECT source, w, unnest(generate_series(1, len(w) - 2)) AS i
      |        FROM ws WHERE len(w) >= 3),
      |sh AS (SELECT DISTINCT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM pos),
      |sizes AS (SELECT source, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
      |  n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.source = src_a
      |JOIN sizes sb ON sb.source = src_b
      |ORDER BY src_a, src_b""".stripMargin)

  /** z25: Count-Min-sketch frequency estimates, contract-checked — the
    * sublinear-memory term-frequency monitor (z13's exact heavy hitters
    * need the full (term, count) relation; the sketch is a few KB
    * regardless of vocabulary). Spark's own `count_min_sketch` aggregate
    * builds the sketch (partial-merge, one corpus scan, map-side
    * combinable); the native `graft_cms_estimate` probe (GraftExtensions)
    * reads it back, which Spark itself never exposed to SQL. Contract
    * oracle in the x6 style: the estimate can only OVER-count (structural
    * CMS guarantee) and by more than eps·N only with probability
    * 1 − confidence; with the fixed seed the outcome is deterministic,
    * gated at both SFs. The probe side is the top-50 exact terms — a
    * bounded list cross-joined to the one-row sketch. */
  private val z25CmsHitters = Q(
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val w = Tables.documents(s, d).select(explode(split(col("text"), " ")).as("term"))
      val cnt = w.groupBy("term").agg(count(lit(1)).as("n_exact"))
      val sk = w.agg(
        expr("count_min_sketch(term, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)").as("sk"),
        count(lit(1)).as("n_tot"))
      cnt.orderBy(col("n_exact").desc, col("term")).limit(50)
        .crossJoin(broadcast(sk))
        .withColumn("est", call_function("graft_cms_estimate", col("sk"), col("term")))
        .select(col("term"), col("n_exact"),
          (col("est") >= col("n_exact") &&
            col("est") <= col("n_exact") +
              ceil(col("n_tot") * lit(0.001)).cast(LongType)).as("cms_ok"))
        .orderBy(col("n_exact").desc, col("term"))
    },
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      |cnt AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n_exact FROM w GROUP BY 1)
      |SELECT term, n_exact, TRUE AS cms_ok
      |FROM cnt ORDER BY n_exact DESC, term LIMIT 50""".stripMargin)

  /** z26: per-source unigram-distribution drift, KL(source ‖ corpus) —
    * the companion report to z24's overlap matrix: z24 asks "how much do
    * sources share verbatim", this asks "how differently do they use the
    * shared vocabulary" (the quantity mixture-weight tuning and
    * crawl-drift monitors actually read). See TextAnalysis.klDrift for
    * the scale/stability argument. */
  private val z26KlDrift = Q(
    (s, d) => TextAnalysis.klDrift(Tables.documents(s, d), "source", "text")
      .orderBy("source"),
    """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
      |gt AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n_gt FROM w GROUP BY 1, 2),
      |g AS (SELECT source, CAST(SUM(n_gt) AS BIGINT) AS n_g FROM gt GROUP BY 1),
      |t AS (SELECT term, CAST(SUM(n_gt) AS BIGINT) AS n_t FROM gt GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_gt) AS BIGINT) AS n_tot FROM gt)
      |SELECT source, CAST(COUNT(*) AS INT) AS n_terms,
      |  CAST(MAX(n_g) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CAST((n_gt / n_g) *
      |    CAST(CAST(ln((n_gt / n_g) / (n_t / n_tot)) AS DECIMAL(12,6)) AS DOUBLE)
      |    AS DECIMAL(18,12))) AS DOUBLE) AS kl
      |FROM gt JOIN t USING (term) JOIN g USING (source) CROSS JOIN tot
      |GROUP BY source ORDER BY source""".stripMargin)

  /** z27: weighted sampling without replacement (Efraimidis–Spirakis) —
    * "sample 25 documents, longer ones proportionally more often,
    * deterministically". See Sampling.weightedReservoir: the plan is
    * TakeOrderedAndProject (per-partition top-k + one k·P-row merge), the
    * distributed-sampling shape that needs no corpus shuffle at any
    * scale. Weight = n_chars; the oracle replays the md5-uniform and the
    * DECIMAL(18,12) score snapshot exactly (scale ≤ 12 is the
    * engine-stability bound — see Sampling.weightedReservoir). */
  private val z27WeightedSample = Q(
    (s, d) => Sampling.weightedReservoir(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        col("doc_id"), col("n_chars"), 25)
      .select(col("doc_id"), col("n_chars"), col("es_key").cast("double").as("es_key"))
      .orderBy(col("es_key").desc, col("doc_id")),
    """WITH k AS (SELECT doc_id, n_chars,
      |  CAST(ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
      |         / CAST(4294967296 AS DOUBLE)) / n_chars AS DECIMAL(18,12)) AS es_key
      |  FROM documents)
      |SELECT doc_id, n_chars, CAST(es_key AS DOUBLE) AS es_key
      |FROM k ORDER BY es_key DESC, doc_id LIMIT 25""".stripMargin)

  /** z28: per-language weighted sample — "5 docs per language, longer
    * ones proportionally more often, deterministically": z27's
    * Efraimidis–Spirakis key ranked per group by the scale-safe
    * `Relational.groupedTopK` (salted two-stage window — no task ever
    * sorts a whole language; the naive `PARTITION BY lang` window is
    * exactly the funnel z16's deciles already eliminated). The oracle is
    * the naive window form — same rows, same ranks, by construction. */
  private val z28GroupWeightedSample = Q(
    (s, d) => {
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("es_key", Sampling.esKey(col("doc_id"), col("n_chars")))
      Relational.groupedTopK(scored, Seq("lang"), col("doc_id"),
          Seq(col("es_key").desc, col("doc_id")), k = 5, out = "rank")
        .select(col("lang"), col("rank"), col("doc_id"), col("n_chars"),
          col("es_key").cast("double").as("es_key"))
        .orderBy("lang", "rank")
    },
    """WITH k AS (SELECT doc_id, lang, n_chars,
      |  CAST(ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
      |         / CAST(4294967296 AS DOUBLE)) / n_chars AS DECIMAL(18,12)) AS es_key
      |  FROM documents),
      |r AS (SELECT lang, doc_id, n_chars, es_key,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY es_key DESC, doc_id) AS INT) AS rank
      |  FROM k)
      |SELECT lang, rank, doc_id, n_chars, CAST(es_key AS DOUBLE) AS es_key
      |FROM r WHERE rank <= 5 ORDER BY lang, rank""".stripMargin)

  /** x21: curation v4 — the round's operators composed as one declared
    * corpus build, the "train-ready shard selection" a production
    * pipeline runs end-to-end: (1) span-decontamination gate (x19: zero
    * 8-word-window overlap with the benchmark slice; docs too short to
    * have any window pass vacuously), (2) DSIR importance
    * gate (z21's shared per-doc frame: kept by the deterministic
    * llr-weighted resample), (3) near-dup collapse where the CANONICAL
    * representative of each LSH cluster is chosen by PageRank centrality
    * (x20) rather than min-id — the doc most linked within its duplicate
    * family is the best template to keep — and (4) a per-language
    * weighted sample of the survivors (z28's scale-safe grouped top-k
    * over the Efraimidis–Spirakis key). The candidate-pair frame is
    * pinned once and feeds BOTH the components loop and the PageRank
    * loop (one LSH pass, not two); the oracle replays the entire DAG —
    * recursive reachability fixpoint, five unrolled PageRank iterations,
    * span windows, DSIR weights, and the sample window — in one
    * WITH RECURSIVE chain built from the same shared CTE fragments as
    * the standalone queries. */
  private val x21CurationV4 = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") % 97 =!= 0)
      // (doc_id, n_contam) for every doc with >= 8 words; docs too short
      // to have any window are ABSENT and vacuously clean — the gate
      // below is a left join + coalesce, not a semi-join, so they pass
      // (a semi-join would silently drop every short document)
      val spanContam = Dedup.spanDecontaminate(
          corpus, docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", k = 8)
        .select(col("doc_id"), col("n_contam"))
      val dsirKeep = dsirPerDoc(Tables.documents(s, d)).filter(col("kept")).select("doc_id")
      // one LSH pass: the pair frame is pinned and shared by the
      // components fixpoint AND the PageRank loop (each would otherwise
      // re-execute the whole candidate pipeline); blocks are the
      // harness's to release after the action (releaseAllBlocks)
      val pairs = graft.Housekeeping.pin(s)(
        Dedup.lshCandidates(minhashSig(s, d), "doc_id", 8,
            maxBucket = Some(X2MaxBucket))
          .filter(col("doc_a") % 97 =!= 0 && col("doc_b") % 97 =!= 0)).df
      val comps = Dedup.connectedComponents(pairs, corpus.select("doc_id"), "doc_id")
      val ranks = Dedup.pageRank(pairs, iters = X20Iters)
      val surv = comps
        .join(ranks.select(col("node").as("doc_id"), col("rank")), Seq("doc_id"), "left")
        .withColumn("__srn", row_number().over(
          Window.partitionBy("cluster_id")
            .orderBy(col("rank").desc_nulls_last, col("doc_id"))))
        .filter(col("__srn") === 1)
        .select("doc_id")
      val kept = corpus
        .join(dsirKeep, Seq("doc_id"), "left_semi")
        .join(surv, Seq("doc_id"), "left_semi")
        .join(spanContam, Seq("doc_id"), "left")
        .filter(coalesce(col("n_contam"), lit(0L)) === 0)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .withColumn("es_key", Sampling.esKey(col("doc_id"), col("n_chars")))
      Relational.groupedTopK(kept, Seq("lang"), col("doc_id"),
          Seq(col("es_key").desc, col("doc_id")), k = 10, out = "rank")
        .select(col("lang"), col("rank"), col("doc_id"), col("source"), col("n_chars"))
        .orderBy("lang", "rank")
    },
    s"""WITH RECURSIVE $minhashCtes,
       |${cappedBandsCte(bandsSql)},
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |  WHERE a.doc_id % 97 <> 0 AND b.doc_id % 97 <> 0),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(node, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.node),
       |comp AS (SELECT node, min(r) AS cid FROM reach GROUP BY 1),
       |${pagerankCtes(X20Iters)},
       |surv AS (SELECT doc_id FROM (
       |    SELECT d.doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY COALESCE(c.cid, d.doc_id)
       |        ORDER BY r.rank DESC NULLS LAST, d.doc_id) AS rn
       |    FROM documents d
       |    LEFT JOIN comp c ON d.doc_id = c.node
       |    LEFT JOIN r$X20Iters r ON d.doc_id = r.node
       |    WHERE d.doc_id % 97 <> 0)
       |  WHERE rn = 1),
       |sws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |swin AS (SELECT doc_id, md5(array_to_string(w[i:i+7], ' ')) AS fp
       |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
       |        FROM sws WHERE len(w) >= 8)),
       |spd AS (SELECT doc_id, fp, COUNT(*) AS c FROM swin
       |        WHERE doc_id % 97 <> 0 GROUP BY 1, 2),
       |sbench AS (SELECT DISTINCT fp FROM swin WHERE doc_id % 97 = 0),
       |spc AS (SELECT pd.doc_id,
       |    SUM(CASE WHEN b.fp IS NOT NULL THEN pd.c ELSE 0 END) AS n_contam
       |  FROM spd pd LEFT JOIN sbench b ON pd.fp = b.fp GROUP BY 1),
       |tcx AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
       |        FROM documents),
       |dcc AS (SELECT term, COUNT(*) AS cc FROM tcx GROUP BY 1),
       |dtc AS (SELECT term, COUNT(*) AS tc FROM tcx WHERE source = 'src0' GROUP BY 1),
       |dtots AS (SELECT CAST(SUM(cc) AS BIGINT) AS ctot, COUNT(*) AS v FROM dcc),
       |dttots AS (SELECT CAST(COALESCE(SUM(tc), 0) AS BIGINT) AS ttot FROM dtc),
       |dw AS (SELECT dcc.term,
       |    CAST(ln((COALESCE(tc, 0) + 1) / (ttot + v)) AS DECIMAL(12,6))
       |  - CAST(ln((cc + 1) / (ctot + v)) AS DECIMAL(12,6)) AS llr6
       |  FROM dcc LEFT JOIN dtc ON dcc.term = dtc.term
       |  CROSS JOIN dtots CROSS JOIN dttots),
       |dtf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |        FROM tcx GROUP BY 1, 2),
       |dkeep AS (SELECT doc_id FROM (
       |    SELECT doc_id, SUM(tf * llr6) AS llr_dec,
       |      ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 <
       |        CASE WHEN SUM(tf * llr6) > 0 THEN 800 ELSE 200 END AS keepflag
       |    FROM dtf JOIN dw USING (term) GROUP BY 1)
       |  WHERE keepflag),
       |keptd AS (SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d
       |  JOIN surv USING (doc_id) JOIN dkeep USING (doc_id)
       |  LEFT JOIN spc ON d.doc_id = spc.doc_id
       |  WHERE COALESCE(spc.n_contam, 0) = 0),
       |es AS (SELECT *,
       |  CAST(ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
       |         / CAST(4294967296 AS DOUBLE)) / n_chars AS DECIMAL(18,12)) AS es_key
       |  FROM keptd),
       |sel AS (SELECT lang, doc_id, source, n_chars,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY es_key DESC, doc_id) AS INT) AS rank
       |  FROM es)
       |SELECT lang, rank, doc_id, source, n_chars
       |FROM sel WHERE rank <= 10 ORDER BY lang, rank""".stripMargin)

  /** z29: mergeable distinct sketches — the warehouse form of COUNT
    * DISTINCT at scale: build one HLL sketch per (event_type, week) — the
    * per-shard object a metrics table would STORE — then answer "distinct
    * users per event type" by UNIONING the stored sketches
    * (`hll_union_agg`), never rescanning raw events. Exact distinct
    * re-shuffles every value on every question; sketch algebra ships
    * fixed-KB buffers and answers any window composition of the stored
    * shards. Spark 4 exposes the Apache DataSketches HLL family natively
    * (`hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate`), all
    * partial-merge aggregates. DuckDB has no sketch algebra, so the
    * oracle is x6's deterministic contract: exact counts plus "the
    * unioned estimate landed within 5%" (HLL is RNG-free — the outcome
    * is stable, gated at both SFs). */
  private val z29SketchUnion = Q(
    (s, d) => {
      import org.apache.spark.sql.types.{IntegerType, LongType}
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("user_id"),
          date_trunc("week", col("ts")).as("wk"))
      val weekly = ev.groupBy("event_type", "wk")
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      val unioned = weekly.groupBy("event_type")
        .agg(count(lit(1)).cast(IntegerType).as("n_weeks"),
          expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).cast(LongType).as("n_exact"))
      exact.join(unioned, Seq("event_type"))
        .select(col("event_type"), col("n_weeks"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.05).as("union_ok"))
        .orderBy("event_type")
    },
    """SELECT event_type,
      |  CAST(COUNT(DISTINCT date_trunc('week', ts)) AS INT) AS n_weeks,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
      |  TRUE AS union_ok
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)

  val all: Map[String, Q] = Map(
    "x20_dup_pagerank" -> x20DupPagerank,
    "z29_sketch_union" -> z29SketchUnion,
    "x21_curation_v4" -> x21CurationV4,
    "z28_group_weighted_sample" -> z28GroupWeightedSample,
    "z25_cms_hitters" -> z25CmsHitters,
    "z26_kl_drift" -> z26KlDrift,
    "z27_weighted_sample" -> z27WeightedSample,
    "x18_span_dedup" -> x18SpanDedup,
    "x18b_span_rolling" -> x18bSpanRolling,
    "x22_top_spans" -> x22TopSpans,
    "x35_span_scrub" -> x35SpanScrub,
    "x35b_span_scrub_rolling" -> x35bSpanScrubRolling,
    "x19_span_decontaminate" -> x19SpanDecontaminate,
    "x19b_span_decon_rolling" -> x19bSpanDeconRolling,
    "z23_backoff_lm" -> z23BackoffLm,
    "z24_source_overlap" -> z24SourceOverlap,
    "z21_dsir_sample" -> z21DsirSample,
    "z22_temperature_mix" -> z22TemperatureMix,
    "z43_token_budget" -> z43TokenBudget,
    "z53_curriculum_mix" -> z53CurriculumMix,
    "z54_overlap_curve" -> z54OverlapCurve,
    "z55_leakage_by_source" -> z55LeakageBySource,
    "z44_shard_assign" -> z44ShardAssign,
    "z45_threshold_sweep" -> z45ThresholdSweep,
    "z46_epoch_shuffle" -> z46EpochShuffle,
    "z47_leakage_split" -> z47LeakageSplit,
    "z20_bm25" -> z20Bm25,
    "y5_pq_ann" -> y5PqAnn,
    "y9_ivfpq" -> y9IvfPq,
    "y9b_ivfpq_rotated" -> y9bIvfPqRotated,
    "y3f_knn_opq_fitted" -> y3fKnnOpqFitted,
    "y10_jl_project" -> y10JlProject,
    "y7_bitext_margin" -> y7BitextMargin,
    "y8_ann_eval" -> y8AnnEval,
    "y6_sq_ann" -> y6SqAnn,
    "x23_chunk_retrieval" -> x23ChunkRetrieval,
    "x24_lsh_eval" -> x24LshEval,
    "x25_cluster_best" -> x25ClusterBest,
    "x26_lsh_planner" -> x26LshPlanner,
    "x33_planner_applied" -> x33PlannerApplied,
    "x29_cluster_stats" -> x29ClusterStats,
    "x30_incremental_cc" -> x30IncrementalCc,
    "x11_chunk_dedup" -> x11ChunkDedup,
    "x12_bloom_prefilter" -> x12BloomPrefilter,
    "x13_curation_v2" -> x13CurationV2,
    "x14_jaccard_estimate" -> x14JaccardEstimate,
    "x36_dedup_threshold_sweep" -> x36DedupThresholdSweep,
    "x46_boilerplate_scrub" -> x46BoilerplateScrub,
    "x47_ingest_replay" -> x47IngestReplay,
    "x48_inventory_maintenance" -> x48InventoryMaintenance,
    "x49_preprocess_pipeline" -> x49PreprocessPipeline,
    "x50_inventory_takedown" -> x50InventoryTakedown,
    "x51_inventory_tail" -> x51InventoryTailPolicy,
    "x52_takedown_rematerialize" -> x52TakedownRematerialize,
    "x53_soft_dedup" -> x53SoftDedup,
    "x54_tail_maintenance" -> x54TailMaintenance,
    "x55_tail_composition" -> x55TailComposition,
    "x56_tail_takedown" -> x56TailTakedown,
    "z56_domain_reweight" -> z56DomainReweight,
    "z57_rendezvous_reshard" -> z57RendezvousReshard,
    "z58_dedup_scope" -> z58DedupScope,
    "z59_normalize_roundtrip" -> z59NormalizeRoundtrip,
    "z60_packing_sweep" -> z60PackingSweep,
    "z61_classifier_auc" -> z61ClassifierAuc,
    "z62_reweighted_budget" -> z62ReweightedBudget,
    "z63_doremi_refit" -> z63DoremiRefit,
    "z64_packed_segments" -> z64PackedSegments,
    "z65_boundary_packing" -> z65BoundaryPacking,
    "x15_semantic_dedup" -> x15SemanticDedup,
    "x16_fuzzy_verify" -> x16FuzzyVerify,
    "x17_curation_v3" -> x17CurationV3,
    "z15_unigram_logprob" -> z15UnigramLogprob,
    "z16_quality_deciles" -> z16QualityDeciles,
    "z36_perplexity_buckets" -> z36PerplexityBuckets,
    "z37_gopher_repetition" -> z37GopherRepetition,
    "z37b_gopher_rolling" -> z37bGopherRolling,
    "z38_kneser_ney" -> z38KneserNey,
    "z41_heldout_perplexity" -> z41HeldoutPerplexity,
    "z42_classifier_fitted" -> z42ClassifierFitted,
    "x38_gate_agreement" -> x38GateAgreement,
    "x39_arrival_resolution" -> x39ArrivalResolution,
    "x40_daily_ingest" -> x40DailyIngest,
    "z39_char_entropy" -> z39CharEntropy,
    "z40_zipf_fit" -> z40ZipfFit,
    "x32_curation_v5" -> x32CurationV5,
    "x32b_curation_heldout" -> x32bCurationHeldout,
    "x34_curation_v6" -> x34CurationV6,
    "x37_curation_v7" -> x37CurationV7,
    "x41_run_materialize" -> x41RunMaterialize,
    "x42_run_manifest" -> x42RunManifest,
    "x43_manifest_diff" -> x43ManifestDiff,
    "x57_epoch_manifest_diff" -> x57EpochManifestDiff,
    "x58_interleaved_takedown" -> x58InterleavedTakedown,
    "x59_governed_platform" -> x59GovernedPlatform,
    "x60_repair_manifest" -> x60RepairManifest,
    "x44_takedown" -> x44Takedown,
    "x45_sidecar_manifest" -> x45SidecarManifest,
    "z17_bigram_logprob" -> z17BigramLogprob,
    "z18_lexical_stats" -> z18LexicalStats,
    "z19_sequence_pack" -> z19SequencePack,
    "z13_heavy_hitters" -> z13HeavyHitters,
    "z14_quality_classifier" -> z14QualityClassifier,
    "x1_exact_dedup" -> x1ExactDedup,
    "x9_curation_pipeline" -> x9CurationPipeline,
    "x9b_neardup_curation" -> x9bNeardupCuration,
    "z5_hash_split" -> z5HashSplit,
    "z6_stratified_cap" -> z6StratifiedCap,
    "x2_minhash_lsh" -> x2MinhashLsh,
    "x3_simhash" -> x3Simhash,
    "x3b_simhash_pairs" -> x3bSimhashPairs,
    "z7_tfidf" -> z7Tfidf,
    "z8_chunking" -> z8Chunking,
    "z9_mixture_sample" -> z9MixtureSample,
    "z10_repetition" -> z10Repetition,
    "z12_pii_redact" -> z12PiiRedact,
    "x4_ngram_jaccard" -> x4NgramJaccard,
    "z35_containment" -> z35Containment,
    "x5_embed_neardup" -> x5EmbedNeardup,
    "x6_approx_distinct" -> x6ApproxDistinct,
    "x7_lsh_banded" -> x7LshBanded,
    "x8_dup_clusters" -> x8DupClusters,
    "x8b_dup_clusters_star" -> x8bDupClustersStar,
    "x10_incremental_lsh" -> x10IncrementalLsh,
    "z11_decontaminate" -> z11Decontaminate,
    "y1_knn_brute" -> y1KnnBrute,
    "y2_knn_bucketed" -> y2KnnBucketed,
    "y2b_knn_multiprobe" -> y2bKnnMultiprobe,
    "y2c_knn_bucketed16" -> y2cKnnBucketed16,
    "y3_knn_ivf" -> y3KnnIvf,
    "y3c_knn_nprobe" -> y3cKnnNprobe,
    "y3e_knn_ivf64" -> y3eKnnIvf64,
    "y11_nprobe_curve" -> y11NprobeCurve,
    "y12_gram_matrix" -> y12GramMatrix,
    "y13_opq_rotation" -> y13OpqRotation,
    "y14_filtered_ann" -> y14FilteredAnn,
    "y15_ivf_arrival" -> y15IvfArrival,
    "y16_index_refresh" -> y16IndexRefresh,
    "y17_refit_payoff" -> y17RefitPayoff,
    "y18_index_append" -> y18IndexAppend,
    "y19_triplet_mine" -> y19TripletMine,
    "y20_pq_rerank" -> y20PqRerank,
    "y21_mips_augment" -> y21MipsAugment,
    "y22_mips_serve" -> y22MipsServe,
    "y23_mips_curve" -> y23MipsCurve,
    "y24_tombstone_ann" -> y24TombstoneAnn,
    "y25_deletion_decision" -> y25DeletionDecision,
    "y26_mips_tombstone" -> y26MipsTombstone,
    "y27_governed_ann" -> y27GovernedAnn,
    "z48_phrase_postings" -> z48PhrasePostings,
    "y3d_knn_ivf_fitted" -> y3dKnnIvfFitted,
    "y3b_kmeans_iterate" -> y3bKmeansIterate,
    "y4_centroid_stats" -> y4CentroidStats,
    "z1_lang_id" -> z1LangId,
    "z33_filter_audit" -> z33FilterAudit,
    "z34_code_switch" -> z34CodeSwitch,
    "z2_quality_score" -> z2QualityScore,
    "z3_token_counts" -> z3TokenCounts,
    "z4_fingerprint" -> z4Fingerprint,
    "m1_media_features" -> m1MediaFeatures,
    "m5_phash_dedup" -> m5PhashDedup,
    "m5b_phash_rolling" -> m5bPhashRolling,
    "m7_crossmodal_dedup" -> m7CrossmodalDedup,
    "m8_payload_integrity" -> m8PayloadIntegrity,
    "m9_modality_packing" -> m9ModalityPacking,
    "m4_media_embed_ann" -> m4MediaEmbedAnn,
    "m2_frame_sample" -> m2FrameSample,
    "m3_resize_plan" -> m3ResizePlan)
}
