package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * Everything is pure column expressions (codegen'd, no UDFs) so the
  * operators run inside whole-stage codegen and scale linearly with
  * partition count — a 100 TB corpus is just more partitions.
  *
  * The word hash is the first 8 hex digits of md5 — engine-portable (any
  * SQL engine can reproduce it for differential testing) and uniform enough
  * for minhash/simhash/fingerprint use.
  */
object TextAnalysis {

  /** 32-bit word hash as a BIGINT column (md5-derived, engine-portable). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** SQL fragment of hash32 for use inside higher-order-function lambdas. */
  def hash32Sql(v: String): String =
    s"CAST(conv(substring(md5($v),1,8),16,10) AS BIGINT)"

  /** The SECOND 8 md5 hex digits as a BIGINT — together with [[hash32]]
    * this forms a 64-bit element hash carried as two 32-bit halves.
    * The halves stay in [0, 2³²), so neither engine ever constructs a
    * >Long.Max unsigned value (a single 16-hex-digit conv would overflow
    * a signed BIGINT cast); consumers that need true 64-bit keys
    * assemble them bitwise (see Dedup.simhash64's packing). */
  def hash32b(c: Column): Column =
    conv(substring(md5(c), 9, 8), 16, 10).cast(LongType)

  /** Whitespace tokenization (single-space corpus convention). */
  def words(text: Column): Column = split(text, " ")

  /** Word n-gram shingles from a words-array column (by column NAME, for use
    * in expr lambdas). Caller must filter `size(ws) >= n`. */
  def shinglesExpr(wsCol: String, n: Int = 3): Column = {
    val parts = (0 until n).map(k => s"$wsCol[i+$k]").mkString(", ")
    expr(s"transform(sequence(0, size($wsCol)-$n), i -> concat_ws(' ', $parts))")
  }

  /** Occurrences of a marker substring (non-overlapping, left-to-right). */
  def markerCount(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker), lit("")))) / lit(marker.length))
      .cast(IntegerType)

  /** Language-ID marker sets: per-language stopwords, counted with
    * word-boundary padding. Argmax with deterministic preference order. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "y"))

  def langScore(padded: Column, markers: Seq[String]): Column =
    markers.map(m => markerCount(padded, s" $m ")).reduce(_ + _)

  /** Predicted language: argmax of scores, ties resolved by declaration
    * order (en > de > fr > es) — deterministic. */
  def langPredict(scores: Seq[(String, Column)]): Column = {
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && s > 0, lang).otherwise(acc)
    }
  }

  /** English-ish stopword list used by the quality score. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to")

  /** BPE-ish tokenizer regex: letter runs, single digits, single symbols. */
  val bpeIshPattern = "[a-z]+|[0-9]|[^a-z0-9\\s]"

  /** PII patterns, kept to syntax both Java regex and RE2 (DuckDB)
    * interpret identically — no backrefs, no lookaround. */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII scrubbing — the redaction pass a training corpus runs before
    * anything else sees the text: masks emails and phone-shaped digit
    * runs with fixed tokens. Pure chained `regexp_replace` (Spark
    * replaces all occurrences by default; the DuckDB oracle needs the
    * explicit 'g' flag), linear in bytes, zero shuffle. Pattern-based
    * redaction under-matches obfuscated PII by design — it is the cheap
    * first pass, not a guarantee. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")

  /** Default Rabin–Karp lattices for [[rollingWindows]]: two coprime
    * (base, mod) pairs — both mods the largest primes under 2³¹, so every
    * intermediate stays inside the 64-bit lane in both engines (see
    * graft.plans.RollingWindows) — giving two independent 31-bit window
    * fingerprints where a 64-bit identity is assembled from halves
    * (simhash64's hv_hi/hv_lo convention). */
  val RollingA: (Long, Long) = (257L, 2147483647L)
  val RollingB: (Long, Long) = (263L, 2147483629L)

  /** All overlapping k-window Rabin–Karp fingerprints of a string (byte
    * windows) or array<bigint> (element windows) column — the O(n)
    * production form of a per-window hash: delegates to the native
    * codegen'd `graft_rolling_windows` expression (one md5 per ELEMENT at
    * most, one O(1) slide per window, vs O(n·k) for an md5 per window).
    * Requires a session with the graft extensions installed — every
    * production entry point (GraftSession/Verify/Bench) installs them. */
  def rollingWindows(c: Column, k: Int,
                     lattice: (Long, Long) = RollingA): Column =
    call_function("graft_rolling_windows", c, lit(k),
      lit(lattice._1), lit(lattice._2))

  /** Rolling polynomial (Horner) fingerprint over the word sequence —
    * order-sensitive, unlike the minhash/simhash set signatures. */
  def fingerprint(wsCol: String, mod: Long = 1000000007L): Column =
    expr(
      s"""aggregate(
         |  transform($wsCol, w -> ${hash32Sql("w")}),
         |  CAST(0 AS BIGINT),
         |  (acc, h) -> (acc * 31 + h) % $mod)""".stripMargin)

  /** Fixed-size word chunking — the sequence-preparation op: each doc
    * splits into ⌈n/k⌉ chunks of k words (last one ragged). One explode
    * over a computed `sequence`, no shuffle at all: chunking is a pure
    * map-side row expansion, so it composes with any downstream
    * partitioning. Chunk ids are 0-based and deterministic. */
  def chunkWords(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"chunk size must be positive, got $k")
    val ws = docs.select(col(idCol), words(col(textCol)).as("ws"))
    ws.select(col(idCol), col("ws"),
        explode(sequence(lit(0), expr(s"(size(ws) - 1) div $k"))).as("chunk_id"))
      .withColumn("chunk_ws", slice(col("ws"), col("chunk_id") * k + 1, lit(k)))
      .select(col(idCol), col("chunk_id").cast(org.apache.spark.sql.types.IntegerType).as("chunk_id"),
        size(col("chunk_ws")).as("n_tokens"),
        array_join(col("chunk_ws"), " ").as("chunk_text"))
  }

  /** Hashed bag-of-words count vectors (the feature-hashing trick): each
    * token hashes into one of `dim` buckets; the vector is the per-key
    * bucket-count array. Integer counts make everything downstream exact:
    * dots, norms, and cosines via integer arithmetic (Similarity.intDot)
    * carry zero float-fold ambiguity. The embedding-free featurizer for
    * chunk-level retrieval — production swaps in a learned encoder at the
    * same seam (a vector column is a vector column).
    *
    * Shape: explode → one map-side-combinable (keys, bucket) count
    * aggregate → per-key array assembly from the ≤ dim observed buckets.
    * The obvious shuffle-free alternative — a `transform(sequence(0,dim),
    * i -> size(filter(...)))` HOF per row — is NOT codegen'd (Spark
    * evaluates higher-order functions interpreted), and its dim passes ×
    * tokens interpreted lambda evals measured minutes where this form
    * takes seconds: the relational plan keeps the hot loop (explode +
    * hash + count) inside whole-stage codegen and pays only dim map
    * probes per KEY at assembly. */
  def hashedBowVectors(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
                       wsCol: String, dim: Int = 64): org.apache.spark.sql.DataFrame = {
    require(dim > 0, s"feature dimension must be positive, got $dim")
    val k = keys.map(col)
    df.select(k :+ explode(col(wsCol)).as("__w"): _*)
      .select(k :+ (hash32(col("__w")) % dim).cast(IntegerType).as("__b"): _*)
      .groupBy(k :+ col("__b"): _*).agg(count(lit(1)).cast(IntegerType).as("__n"))
      .groupBy(k: _*)
      .agg(map_from_entries(array_sort(collect_list(struct(col("__b"), col("__n")))))
        .as("__m"))
      .withColumn("v", expr(
        s"transform(sequence(0, ${dim - 1}), i -> CAST(coalesce(__m[i], 0) AS INT))"))
      .drop("__m")
  }

  /** Gopher-style repetition signal: the fraction of a doc's 3-grams that
    * are repeats (1 − distinct/total). Pure expressions over the word
    * array; the ratio is a raw IEEE division of exact ints — engine-stable
    * with no rounding. Docs under 3 words have no 3-grams and are
    * excluded. */
  def repetitionRatio(docs: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol), words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 3)
      .withColumn("sh", shinglesExpr("ws", 3))
      .select(col(idCol),
        size(col("sh")).as("n_3grams"),
        size(array_distinct(col("sh"))).as("n_distinct"),
        ((size(col("sh")) - size(array_distinct(col("sh")))) / size(col("sh")))
          .as("dup_ratio"))

  /** Gopher repetition panel (Rae et al. 2021, "Scaling Language Models",
    * Table A1's repetition-rule family) — the standard production
    * keep/drop gate z10's single ratio summarizes: per document,
    *  - top-n-gram character fraction for n ∈ {2,3,4}: characters covered
    *    by ALL occurrences of the single most frequent n-gram / doc chars.
    *    Ranking is BY OCCURRENCE COUNT first (Rae et al. Table A1 ranks
    *    by frequency), equal counts break toward the larger character
    *    coverage then the larger gram string — pinned in both engines;
    *  - duplicate-n-gram character fraction for n ∈ {5,10}: characters
    *    that would disappear if every repeat beyond the first occurrence
    *    of each duplicated n-gram were deleted, i.e. Σ (c−1)·len(gram) /
    *    doc chars (reproductions differ on overlap handling; this form is
    *    deterministic, documented, and replayed exactly by the oracle);
    *  - `keep`: the Gopher thresholds (0.20/0.18/0.16 top, 0.15/0.10 dup)
    *    applied as EXACT integer cross-multiplications (cl·5 ≤ chars etc.)
    *    so the verdict never rides a float boundary.
    *
    * Scale shape: ONE explode producing (n, gram) rows (≈5 rows per word),
    * one map-side-combinable (doc, n, gram) count, one per-(doc, n)
    * aggregate (top via max(struct), dup via conditional sum), one
    * 5-value pivot — every stage linear in corpus tokens, no windows over
    * raw data, no joins. Fractions are raw IEEE divisions of exact ints.
    * Docs under 2 words have no rows and are absent. */
  def gopherRepetition(docs: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String): org.apache.spark.sql.DataFrame = {
    val ns = Seq(2, 3, 4, 5, 10)
    val gramArrays = ns.map { n =>
      val parts = (0 until n).map(j => s"ws[i+$j]").mkString(", ")
      s"""CASE WHEN size(ws) >= $n THEN
         |  transform(sequence(0, size(ws) - $n),
         |    i -> struct($n AS n, concat_ws(' ', $parts) AS gram))
         |ELSE array() END""".stripMargin
    }
    val grams = docs
      .select(col(idCol), length(col(textCol)).as("n_chars"), words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col(idCol), col("n_chars"),
        explode(expr(gramArrays.mkString("flatten(array(", ", ", "))"))).as("g"))
      .select(col(idCol), col("n_chars"), col("g.n").as("n"), col("g.gram").as("gram"))
    val counts = grams
      .groupBy(col(idCol), col("n_chars"), col("n"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .withColumn("gl", length(col("gram")).cast(LongType))
    gopherPanel(counts, idCol, col("gram"))
  }

  /** [[gopherRepetition]]'s production rung: gram identity is the rolling
    * Rabin–Karp fingerprint of the word-hash window and gram LENGTH is a
    * rolling window SUM (base=1 lattice) of word lengths plus separators —
    * two native `graft_rolling_windows` passes per n, so the
    * (doc, n, key) shuffle carries two LONGs where the exact form carries
    * the gram string (measured at the 10×-corpus soak: 41.9 s → the
    * string shuffle was the dominant constant). Same fractions and
    * verdict modulo fingerprint collisions (astronomically rare; the
    * oracle replays the identical fingerprints, so the gate is exact) and
    * top-gram TIE-BREAK (by fp instead of gram — after (count, coverage)
    * ties, the emitted fraction is identical either way; spec-gated). */
  def gopherRepetitionRolling(docs: org.apache.spark.sql.DataFrame, idCol: String,
                              textCol: String): org.apache.spark.sql.DataFrame = {
    val ns = Seq(2, 3, 4, 5, 10)
    val base = docs
      .select(col(idCol), length(col(textCol)).as("n_chars"), words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 2)
      .withColumn("hs", expr(s"transform(ws, x -> ${hash32Sql("x")})"))
      .withColumn("ls", expr("transform(ws, x -> CAST(length(x) AS BIGINT))"))
    val perN = ns.map { n =>
      base.select(col(idCol), col("n_chars"),
        explode(zip_with(
          rollingWindows(col("hs"), n),
          rollingWindows(col("ls"), n, (1L, 2147483647L)),
          (fp, s) => struct(fp.as("fp"), (s + lit(n - 1).cast(LongType)).as("gl"))))
          .as("w"))
        .select(col(idCol), col("n_chars"), lit(n).as("n"),
          col("w.fp").as("fp"), col("w.gl").as("gl"))
    }.reduce(_ union _)
    val counts = perN
      .groupBy(col(idCol), col("n_chars"), col("n"), col("fp"), col("gl"))
      .agg(count(lit(1)).as("c"))
    gopherPanel(counts, idCol, col("fp"))
  }

  /** Shared Gopher-panel tail: per-(doc, n) top/duplicate character
    * totals → 5-value pivot → fractions + integer-exact verdict. `counts`
    * = (idCol, n_chars, n, <key cols>, c, gl). The top gram ranks by
    * OCCURRENCE COUNT first (the published rule's "most frequent
    * n-gram"), then by character coverage c·gl, then `tie` — the tie
    * column only decides between grams with identical (c, cl), whose
    * emitted fraction is identical, so it never changes output values. */
  private def gopherPanel(counts: org.apache.spark.sql.DataFrame, idCol: String,
                          tie: Column): org.apache.spark.sql.DataFrame = {
    val ns = Seq(2, 3, 4, 5, 10)
    val perN = counts
      .groupBy(col(idCol), col("n_chars"), col("n"))
      .agg(max(struct(col("c").as("c"),
          (col("c") * col("gl")).as("cl"), tie.as("t"))).as("top"),
        sum(when(col("c") >= 2, (col("c") - 1) * col("gl")).otherwise(lit(0L))).as("dupch"))
      .select(col(idCol), col("n_chars"), col("n"),
        col("top.cl").as("cl"), col("dupch"))
    val piv = perN.groupBy(col(idCol), col("n_chars"))
      .pivot("n", ns.map(_.asInstanceOf[Any]))
      .agg(first(col("cl")).as("cl"), first(col("dupch")).as("dup"))
    def cl(n: Int) = coalesce(col(s"${n}_cl"), lit(0L))
    def dup(n: Int) = coalesce(col(s"${n}_dup"), lit(0L))
    // LONG arithmetic for the verdict cross-multiplications: an int nc·9
    // would wrap on a ~240 MB document in non-ANSI Spark
    val nc = col("n_chars").cast(LongType)
    piv.select(col(idCol),
      (cl(2) / nc).as("top2_frac"),
      (cl(3) / nc).as("top3_frac"),
      (cl(4) / nc).as("top4_frac"),
      (dup(5) / nc).as("dup5_frac"),
      (dup(10) / nc).as("dup10_frac"),
      (cl(2) * 5 <= nc && cl(3) * 50 <= nc * 9 && cl(4) * 25 <= nc * 4 &&
        dup(5) * 20 <= nc * 3 && dup(10) * 10 <= nc).as("keep"))
  }

  /** The Gopher keep/drop VERDICT as one pure row-local expression — the
    * streaming form of [[gopherRepetitionRolling]]'s `keep` column for
    * gates that must run with ZERO state (a router filtering arrivals):
    * same rolling (fp, gl) gram identities, same count-first top ranking,
    * same duplicate-character sums, same integer cross-multiplied
    * thresholds, so the verdict is row-for-row identical to the batch
    * panel's (spec-gated). Docs under 2 words are keep=false — exactly
    * the docs the batch panel has no row for and a curation semi-join
    * (x32's shape) therefore drops.
    *
    * Cost shape: the within-doc gram counting is nested HOFs —
    * O(words²) per document per n, vs the batch panel's O(words) explode
    * + aggregate. That is the price of statelessness; it is bounded by
    * the ARRIVAL's length, not the corpus (chunk pathological payloads
    * upstream, z8's rule), and buys a gate with no shuffle, no state
    * store, and no watermark coupling. */
  def gopherKeepExpr(text: Column): Column = {
    val ws = split(text, " ")
    val hs = transform(ws, w => hash32(w))
    val ls = transform(ws, w => length(w).cast(LongType))
    val nc = length(text).cast(LongType)
    def zn(n: Int): Column = zip_with(
      rollingWindows(hs, n),
      rollingWindows(ls, n, (1L, 2147483647L)),
      (f, s) => struct(f.as("fp"), (s + lit((n - 1).toLong)).as("gl")))
    def sameGram(x: Column, e: Column): Column =
      x.getField("fp") === e.getField("fp") && x.getField("gl") === e.getField("gl")
    def cOf(za: Column, e: Column): Column =
      size(filter(za, x => sameGram(x, e))).cast(LongType)
    // top gram by (count, coverage) — max(struct) ≡ the batch ranking
    def topCl(n: Int): Column = {
      val za = zn(n)
      coalesce(
        array_max(transform(za, e =>
          struct(cOf(za, e).as("c"), (cOf(za, e) * e.getField("gl")).as("cl"))))
          .getField("cl"),
        lit(0L))
    }
    // Σ (c−1)·gl over DISTINCT duplicated grams: each gram contributes at
    // its FIRST occurrence only (no earlier equal element in the array)
    def dupCh(n: Int): Column = {
      val za = zn(n)
      when(size(za) >= 1, aggregate(
        transform(sequence(lit(0), size(za) - 1), i => {
          val e = element_at(za, i + 1)
          val c = cOf(za, e)
          when(size(filter(slice(za, lit(1), i), x => sameGram(x, e))) === 0 && c >= 2,
            (c - 1) * e.getField("gl")).otherwise(lit(0L))
        }),
        lit(0L), (acc, x) => acc + x))
        .otherwise(lit(0L))
    }
    coalesce(
      size(ws) >= 2 &&
        topCl(2) * 5 <= nc && topCl(3) * 50 <= nc * 9 && topCl(4) * 25 <= nc * 4 &&
        dupCh(5) * 20 <= nc * 3 && dupCh(10) * 10 <= nc,
      lit(false))
  }

  /** Corpus heavy hitters: top-k terms per group by frequency — the vocab /
    * boilerplate-token report a corpus build runs before choosing stopword
    * and cap lists. The count aggregate is map-side combinable (a hot term
    * collapses to one row per input partition before the shuffle) and the
    * rank window runs over the vocab-sized aggregate, never the corpus, so
    * the window state is O(vocab/group), independent of corpus size. Ties
    * break by term — deterministic across engines and cluster sizes. */
  def heavyHitters(docs: org.apache.spark.sql.DataFrame, grpCol: String,
                   textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"top-k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(grpCol)).orderBy(col("n").desc, col("term").asc)
    docs.select(col(grpCol), explode(words(col(textCol))).as("term"))
      .groupBy(col(grpCol), col("term"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(w).cast(IntegerType))
      .filter(col("rnk") <= k)
  }

  /** Hashed-feature dimension of the linear quality classifier. */
  val ClassifierDim: Int = 64

  /** Hashing-trick linear quality classifier (the fastText-shaped scoring
    * seam): each token hashes into one of `dim` buckets, each bucket
    * carries a fixed md5-derived weight in [-1, 1], and the doc score is
    * the sequential left fold of its token weights. Zero shuffle — the
    * whole model evaluates as pure codegen'd expressions inside the scan.
    *
    * The weight table is a deterministic placeholder with the exact shape
    * a trained model would have (bucket → weight); productionizing swaps
    * the weight expression for a broadcast array lookup, leaving the
    * feature hashing, fold order, and threshold gate unchanged. Weights
    * are exact rationals (n/1000) and the fold order is fixed, so scores
    * are bit-identical across engines. */
  def classifierScore(wsCol: String, dim: Int = ClassifierDim): Column = {
    require(dim > 0, s"feature dimension must be positive, got $dim")
    // The dim-entry weight table is tiny, so bake it into the plan as a
    // constant array literal instead of re-hashing 'w'||bucket per token —
    // one md5 per token instead of two. The JVM md5 here produces the
    // same bits as Spark's md5 (spec-asserted), and each weight's
    // shortest-repr decimal literal CASTs back to the identical double,
    // so scores are unchanged vs. the all-expression form (and vs. the
    // DuckDB oracle, which still derives weights from md5 inline).
    val weights = (0 until dim).map { b =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(("w" + b).getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString, 16)
      (h % 2001 - 1000) / 1000.0
    }
    val arr = weights.map(w => s"CAST($w AS DOUBLE)")
      .mkString("array(", ", ", ")")
    expr(
      s"""aggregate(
         |  transform($wsCol, t -> $arr[CAST(${hash32Sql("t")} % $dim AS INT)]),
         |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin)
  }

  /** Doc-term TF-IDF weights: tf = term count in doc, idf = ln(N/df) over
    * the corpus. ONE pass over the exploded corpus (the tf aggregate);
    * df falls out of tf for free — tf has exactly one row per (doc, term),
    * so counting tf rows per term IS the distinct-doc frequency, a
    * vocab-sized aggregate instead of a second corpus-wide dedup shuffle.
    * df (vocab-sized) and the one-row N broadcast into the join. Emits
    * VALUES, not a per-doc ranking: the ln makes cross-term ordering
    * transcendental, and with a small vocab rank ties would be engine- and
    * run-unstable, while the weights themselves are stable at the output
    * rounding. */
  def tfIdf(docs: org.apache.spark.sql.DataFrame, idCol: String,
            textCol: String): org.apache.spark.sql.DataFrame = {
    val w = docs.select(col(idCol), explode(words(col(textCol))).as("term"))
    val tf = w.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    // the df table is vocabulary-sized (grows with the corpus — Heaps'
    // law), so it joins UNHINTED per the klDrift rule below; only the
    // one-row doc count is hinted
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        col("tf").cast(org.apache.spark.sql.types.IntegerType).as("tf"),
        col("df").cast(org.apache.spark.sql.types.IntegerType).as("df"),
        (col("tf") * log(col("n").cast("double") / col("df"))).as("tfidf"))
  }

  /** Per-group unigram-distribution drift: KL(P_g ‖ P_corpus) for each
    * group (source, language, snapshot date, …) against the pooled corpus
    * distribution — the report run before choosing mixture weights, and
    * the monitor that catches a source whose crawl changed character.
    * KL = Σ_t p_t · ln(p_t / q_t) over the group's observed terms; q_t > 0
    * always because the corpus pool contains every group (so no smoothing
    * is needed, unlike a group-vs-group comparison).
    *
    * Scale: one corpus scan explodes terms, then everything is aggregate
    * algebra on the (group, term) counts relation. The per-term table
    * joins UNHINTED — unigram vocabulary grows with the corpus (Heaps'
    * law: typos, URLs, numbers), so AQE broadcasts it while it fits and
    * degrades to a shuffle join when it doesn't (a forced hint would
    * bypass the size check — the same rule as the bigram tables). The
    * per-group and one-row totals ARE broadcast: bounded by group count,
    * not corpus size. Engine stability: the probability ratio is
    * evaluated as (n_gt/n_g)/(n_t/N) — three IEEE divisions of exact
    * integers, never an integer product that could overflow at corpus
    * scale — ln is snapshot at DECIMAL(12,6), each term's contribution at
    * DECIMAL(18,12), and the per-group sum runs in exact decimal so it is
    * shuffle-order-independent. */
  def klDrift(docs: org.apache.spark.sql.DataFrame, grpCol: String,
              textCol: String): org.apache.spark.sql.DataFrame = {
    val w = docs.select(col(grpCol), explode(words(col(textCol))).as("term"))
    val gt = w.groupBy(col(grpCol), col("term")).agg(count(lit(1)).as("n_gt"))
    val g = gt.groupBy(col(grpCol)).agg(sum("n_gt").as("n_g"))
    val t = gt.groupBy(col("term")).agg(sum("n_gt").as("n_t"))
    val tot = gt.agg(sum("n_gt").as("n_tot"))
    val p = col("n_gt").cast("double") / col("n_g")
    val q = col("n_t").cast("double") / col("n_tot")
    gt.join(t, Seq("term"))
      .join(broadcast(g), Seq(grpCol))
      .crossJoin(broadcast(tot))
      .withColumn("lnr", log(p / q).cast("decimal(12,6)"))
      .withColumn("contrib", (p * col("lnr").cast("double")).cast("decimal(18,12)"))
      .groupBy(col(grpCol))
      .agg(count(lit(1)).cast(IntegerType).as("n_terms"),
        max(col("n_g")).as("n_tokens"),
        sum(col("contrib")).cast("double").as("kl"))
  }
}
