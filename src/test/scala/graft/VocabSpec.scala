package graft

import graft.operators.{Similarity, Vocab}
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("charTokens separates every character with single spaces") {
    val out = Seq("hash", "a", "x9").toDF("w")
      .select(Vocab.charTokens(col("w"))).as[String].collect()
    assert(out.toSeq === Seq("h a s h", "a", "x 9"))
  }

  test("mergePair merges chains via two sweeps and respects token boundaries") {
    val rows = Seq(
      "a b a b a b", // chain of adjacent occurrences — needs both sweeps
      "x a b y",     // interior occurrence
      "xa b",        // 'a' is a token SUFFIX — must NOT merge
      "a ba",        // 'b' prefix — must NOT merge
      "a b").toDF("ts")
    val out = rows.select(Vocab.mergePair(col("ts"), "a", "b")).as[String].collect()
    assert(out.toSeq === Seq("ab ab ab", "x ab y", "xa b", "a ba", "ab"))
  }

  test("mergePair on a self-adjacent pair is deterministic (documented two-sweep form)") {
    val out = Seq("a a a", "a a a a").toDF("ts")
      .select(Vocab.mergePair(col("ts"), "a", "a")).as[String].collect()
    assert(out.toSeq === Seq("aa a", "aa aa"))
  }

  test("two-sweep merge: chars preserved, no pair occurrence survives (scalacheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // pure-Scala replica of mergePair (java String.replace = the same
    // non-overlapping left-to-right semantics Spark's and DuckDB's replace
    // use). The second sweep's sufficiency is the operator's core claim:
    // after sweep one, no two remaining occurrences can be adjacent.
    val token = Gen.oneOf("a", "b", "ab", "c")
    val tsGen = Gen.nonEmptyListOf(token).map(_.mkString(" "))
    val pairGen = Gen.oneOf(("a", "b"), ("a", "a"), ("b", "a"), ("a", "ab"), ("ab", "a"))
    val prop = Prop.forAll(tsGen, pairGen) { case (ts, (x, y)) =>
      def sweep(s: String) = s.replace(s" $x $y ", s" $x$y ")
      val merged = sweep(sweep(" " + ts + " ")).trim
      val charsPreserved = merged.replace(" ", "") == ts.replace(" ", "")
      val noneLeft = !(" " + merged + " ").contains(s" $x $y ")
      val neverGrows = merged.split(" ").length <= ts.split(" ").length
      charsPreserved && noneLeft && neverGrows
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("oracle DP unroll bound: no corpus word exceeds UgMaxWord at the correctness SFs") {
    // The unigram oracle's relational Viterbi is unrolled to UgMaxWord
    // positions, so a word longer than that would be SILENTLY dropped from
    // the oracle's f{r}/usage/encode chains while the Spark side segments
    // any length. This pins the data assumption so a generator change
    // fails here with a readable message, not as a confusing hash diff.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val maxLen = spark.read.parquet(s"$d/documents.parquet")
        .select(explode(split(col("text"), " ")).as("w"))
        .agg(max(length(col("w")))).as[Int].head()
      assert(maxLen <= graft.queries.VocabQueries.UgMaxWord,
        s"$d: longest corpus word is $maxLen chars > UgMaxWord=" +
          s"${graft.queries.VocabQueries.UgMaxWord} — the unigram oracle's " +
          "unrolled DP would silently drop it; raise UgMaxWord")
    }
  }

  test("bpeLearn reproduces the hand-computed merge sequence") {
    // corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3  (the classic
    // Sennrich example shape). Pair counts round 1:
    //   "e s" = 6 (newest) + 3 (widest) = 9  <- winner
    //   "l o" = 5 + 2 = 7, "s t" = 9 ... tie ("s t" also 9)!
    //   tie-break pair asc: "e s" < "s t" -> "e s" wins round 1.
    // round 2: "es t" = 9 wins (no other pair reaches 9; "l o"=7).
    // round 3: "l o" = 7, then "lo w" = 7 ... tie-break "l o" < "lo w"
    //   only after "l o" merges does "lo w" exist; round 3 counts:
    //   "lo w" absent (no merge yet), "l o"=7 wins; round 4 "lo w"=7.
    val docs = Seq(
      Seq.fill(5)("low"), Seq.fill(2)("lower"),
      Seq.fill(6)("newest"), Seq.fill(3)("widest")
    ).flatten.mkString(" ")
    val df = Seq(docs).toDF("text")
    val ms = Vocab.bpeLearn(df, "text", 4)
    assert(ms.map(m => (m.step, m.tokA, m.tokB, m.merged, m.n)) === Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L)))
  }

  test("bpeLearn stops early when every word is fully merged") {
    val df = Seq("ab ab ab").toDF("text")
    // "ab" has one pair ("a b"); after merging it no pairs remain
    val ms = Vocab.bpeLearn(df, "text", 10)
    assert(ms.map(_.merged) === Seq("ab"))
  }

  test("bpeTokenCounts: more merges never increase a document's token count") {
    val df = Seq((1L, "low lower newest"), (2L, "widest low")).toDF("doc_id", "text")
    val ms = Vocab.bpeLearn(df, "text", 4)
    val none = Vocab.bpeTokenCounts(df, "doc_id", "text", Nil)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r._2).toMap
    val four = Vocab.bpeTokenCounts(df, "doc_id", "text", ms)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r._2).toMap
    assert(none.keySet === four.keySet)
    four.foreach { case (id, n) => assert(n <= none(id)) }
    // with zero merges the token count is the character count of the words
    assert(none(1L) === "lowlowernewest".length.toLong)
  }

  test("bpeLearn leaves no NEW persistent blocks behind") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = Seq("low low lower").toDF("text")
    Vocab.bpeLearn(df, "text", 2)
    assert(spark.sparkContext.getPersistentRDDs.keySet === before)
  }

  test("bpeLearn re-pins every K rounds: 64-merge run, flat plan depth, K-invariant merges") {
    // enough raw material for 64+ productive merges (each word can merge
    // len-1 times; pairs are shared across repeated words)
    val df = Seq("alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliett kilo lima mike november oscar papa quebec romeo " +
      "sierra tango uniform victor whiskey xray yankee zulu")
      .toDF("text")
    def planNodes(h: org.apache.spark.sql.DataFrame): Int =
      h.queryExecution.analyzed.collect { case p => p }.length
    var maxRepin = 0
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val withRepin = Vocab.bpeLearn(df, "text", merges = 64, repinEvery = 4,
      onRound = (_, h) => maxRepin = math.max(maxRepin, planNodes(h)))
    var maxFlat = 0
    val without = Vocab.bpeLearn(df, "text", merges = 64, repinEvery = 1000,
      onRound = (_, h) => maxFlat = math.max(maxFlat, planNodes(h)))
    // learned merges are invariant to the re-pin cadence
    assert(withRepin === without)
    assert(withRepin.length === 64, s"expected 64 merges, got ${withRepin.length}")
    // re-pinned plan depth is BOUNDED (≤ checkpoint scan + K projects);
    // the unpinned form grows one node per round
    assert(maxRepin <= 8, s"re-pinned plan grew to $maxRepin nodes")
    assert(maxFlat > 32, s"control plan unexpectedly flat: $maxFlat nodes")
    // and the swap discipline leaks no blocks
    assert(spark.sparkContext.getPersistentRDDs.keySet === before)
  }

  test("unigramViterbi picks the cheapest segmentation under exact decimal costs") {
    import org.apache.spark.sql.types.DecimalType
    def m(entries: (String, String)*) = map(entries.flatMap { case (t, c) =>
      Seq(lit(t), lit(c).cast(DecimalType(12, 6))) }: _*)
    // ab+ab (3.9+3.9=7.8) beats abab (9.0) and a+b+a+b (8.0)
    val vm = m("a" -> "2.0", "b" -> "2.0", "ab" -> "3.9", "abab" -> "9.0")
    val out = Seq("abab").toDF("w")
      .select(Vocab.unigramViterbi(col("w"), vm, 4)).as[Seq[String]].head()
    assert(out === Seq("ab", "ab"))
  }

  test("unigramViterbi ties break by fewer tokens, then lexicographic path") {
    import org.apache.spark.sql.types.DecimalType
    def m(entries: (String, String)*) = map(entries.flatMap { case (t, c) =>
      Seq(lit(t), lit(c).cast(DecimalType(12, 6))) }: _*)
    // cost("ab") == cost("a")+cost("b") — fewer tokens wins
    val vm1 = m("a" -> "1.0", "b" -> "1.0", "ab" -> "2.0")
    val t1 = Seq("ab").toDF("w")
      .select(Vocab.unigramViterbi(col("w"), vm1, 4)).as[Seq[String]].head()
    assert(t1 === Seq("ab"))
    // equal cost AND token count: "ab c" vs "a bc" — lexicographic path
    val vm2 = m("a" -> "1.0", "b" -> "1.0", "c" -> "1.0",
      "ab" -> "2.0", "bc" -> "2.0")
    val t2 = Seq("abc").toDF("w")
      .select(Vocab.unigramViterbi(col("w"), vm2, 4)).as[Seq[String]].head()
    assert(t2 === Seq("a", "bc"), "' a bc' < ' ab c' lexicographically")
  }

  test("unigramFit: chars never pruned, usage conserves corpus characters") {
    val docs = Seq("abab abab ab", "abab ab ab", "cd cd abab").toDF("text")
    val fit = Vocab.unigramFit(docs, "text", maxTok = 4, initMulti = 8,
      pruneTo = 4, rounds = 2).collect()
    val chars = fit.filter(_.getBoolean(3)).map(_.getString(0)).sorted
    assert(chars.toSeq === Seq("a", "b", "c", "d"), "corpus chars must survive")
    // every word occurrence segments exactly: Σ len(tok)·uses = Σ len(word)
    val charMass = fit.map(r => r.getString(0).length * r.getLong(1)).sum
    val corpusChars = Seq("abab abab ab", "abab ab ab", "cd cd abab")
      .flatMap(_.split(" ")).map(_.length).sum
    assert(charMass === corpusChars)
    // the dominant repeated structure is learned as a multi-char token
    val multi = fit.filter(!_.getBoolean(3)).map(_.getString(0))
    assert(multi.nonEmpty && multi.exists(t => t == "abab" || t == "ab"))
    // costs are positive and finite (add-1 smoothing: no -ln(0))
    fit.foreach(r => assert(!r.isNullAt(2) &&
      r.getDecimal(2).doubleValue() > 0.0))
    // round-boundary pinning is a plan-shape optimization, not semantics
    val unpinned = Vocab.unigramFit(docs, "text", maxTok = 4, initMulti = 8,
      pruneTo = 4, rounds = 2, pinRounds = false).collect()
    assert(fit.map(_.toString).sorted.toSeq ===
      unpinned.map(_.toString).sorted.toSeq)
  }

  test("unigram fit at production knobs (maxTok=8, wide prune): pin-invariant, chars conserved") {
    // the large-knob path the 10x soak times (SCALE.md): 8-char candidate
    // tokens and a prune wide enough to keep every observed candidate —
    // the pinning invariance and the segmentation-totality conservation
    // must hold on this path exactly as on the 16-token oracle rung
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def fitAt(pin: Boolean) = Vocab.unigramFit(docs, "text", maxTok = 8,
      initMulti = 64, pruneTo = 512, rounds = 2, pinRounds = pin).collect()
    val fit = fitAt(pin = true)
    assert(fit.map(_.toString).sorted.toSeq === fitAt(pin = false).map(_.toString).sorted.toSeq,
      "round pinning changed the fitted vocabulary at production knobs")
    val charMass = fit.map(r => r.getString(0).length * r.getLong(1)).sum
    val corpusChars = docs
      .select(sum(length(translate(col("text"), " ", "")))).as[Long].head()
    assert(charMass === corpusChars, "production-knob fit lost corpus characters")
    assert(fit.count(!_.getBoolean(3)) > 16, "wide prune should retain more multis than the oracle rung")
  }

  test("hashedBowVectors: counts scatter by token hash and sum to the token count") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, 0, Seq("the", "fast", "the")),
      (2L, 0, Seq("scan"))).toDF("doc_id", "chunk_id", "ws")
    val out = TextAnalysis.hashedBowVectors(df, Seq("doc_id", "chunk_id"), "ws", 16)
      .as[(Long, Int, Seq[Int])].collect().map(r => (r._1, r._3)).toMap
    // expected buckets from the same md5-derived hash the engine uses
    def bucket(w: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
      (h % 16).toInt
    }
    assert(out(1L).sum === 3)
    assert(out(1L)(bucket("the")) >= 2) // "the" twice (fast may collide)
    assert(out(2L).sum === 1)
    assert(out(2L)(bucket("scan")) === 1)
    assert(out(1L).length === 16 && out(2L).length === 16)
  }

  test("scalarQuantize maps the max-|x| component to ±127 and zero to 0") {
    val vecs = Seq(
      (1L, Array(2.0f, -4.0f, 0.0f)),
      (2L, Array(1.0f, 1.0f, -2.0f))).toDF("vec_id", "embedding")
    val q = Similarity.scalarQuantize(vecs, "vec_id", "embedding")
      .as[(Long, Seq[Int])].collect().toMap
    assert(q(1L) === Seq(64, -127, 0)) // 2/4*127 = 63.5 -> HALF_UP 64
    assert(q(2L) === Seq(32, 32, -64))
  }

  test("quantizedTopK ranks by exact integer-derived cosine with id tiebreak") {
    // query 0 and three candidates: 1 parallel (qcos 1), 2 orthogonal,
    // 3 anti-parallel
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.5f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizedTopK(vecs, id => id === 0L, "vec_id", "embedding", 3)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(out.map(_._3).toSeq === Seq(1L, 2L, 3L))
    assert(out(0)._4 === 1.0)
    assert(out(1)._4 === 0.0)
    assert(out(2)._4 === -1.0)
  }
}
