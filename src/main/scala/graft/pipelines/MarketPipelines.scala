package graft.pipelines

import graft.operators.Relational._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Per-script pipeline objects, wave 3: betting markets, cross-source
  * validation, and roster projections. */
object MarketPipelines {

  /** American odds → implied probability, both signs
    * (`/root/reference/R/nfl_draft_espn_dk.R:21-26`). */
  def impliedProb(odds: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(odds < 0, -odds / (-odds + lit(100.0)))
      .otherwise(lit(100.0) / (odds + lit(100.0)))

  /** `/root/reference/R/nfl_draft_espn_dk.R:6-48`: draft-position markets —
    * implied probabilities, the 10-iteration per-player de-vig fixed point
    * (:30-40, operator C2), then pivot over/under into one row per player
    * line (:43). */
  def draftOdds(dk: DataFrame): DataFrame = {
    val seeded = dk.withColumn("pct", impliedProb(col("odds").cast(DoubleType)))
    val devigged = devig(seeded, Seq(col("player")), "pct", iters = 10, target = 2.0)
    devigged
      .groupBy("player", "pick")
      .pivot("under", Seq(0, 1))
      .agg(first(col("odds")).as("odds"), first(col("pct")).as("pct"))
      .withColumnRenamed("0_odds", "over_odds")
      .withColumnRenamed("0_pct", "over_pct")
      .withColumnRenamed("1_odds", "under_odds")
      .withColumnRenamed("1_pct", "under_pct")
      .orderBy("pick", "player")
  }

  /** `/root/reference/R/nfl_draft_espn_dk.R:52-119`: the DK-vs-ESPN draft
    * comparison. The de-vigged DK under-probability at each player's line
    * meets ESPN's cumulative pick distribution at the same cut
    * (`tot_espn = cumsum(espn_prob)` then `espn_pick == pick_dk - 0.5`),
    * both scaled to percent, diffed, and ranked. Each side rounds at 4 dp
    * BEFORE the diff; the diff itself stays a raw IEEE subtraction —
    * re-rounding a difference of already-rounded values is the classic
    * half-way-boundary engine split, while one subtraction of identical
    * doubles is bit-stable everywhere. */
  def draftCompare(dk: DataFrame, espn: DataFrame): DataFrame = {
    val dkWide = draftOdds(dk).select(
      col("player"), col("pick").as("pick_dk"), col("under_pct"))
    val w = Window.partitionBy("player").orderBy("espn_pick")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cumsum BEFORE the join: the reference runs it after, but its dk side
    // is already one row per player so the join can't fan out — here a
    // multi-line player would double-count every espn_prob if the running
    // sum saw the joined (duplicated) rows
    espn
      .withColumn("tot_espn", sum(col("espn_prob")).over(w))
      .join(dkWide, Seq("player"), "left")
      .filter(col("espn_pick") === col("pick_dk") - 0.5)
      .select(
        col("player"), col("pos"), col("pick_dk").as("line"),
        round(col("under_pct") * 100, 4).as("before_dk"),
        round(col("tot_espn") * 100, 4).as("before_espn"))
      .withColumn("diff", col("before_espn") - col("before_dk"))
  }

  /** `/root/reference/R/nfl_draft_espn_dk.R:105-118`: the padded two-column
    * page layout — rows split into halves by rank (left half gets the extra
    * row when odd, exactly the reference's `t[1:24,]` / padded `t[25:47,]`),
    * then zipped positionally with null-fill via the outer-join bindCols.
    * `order` is (column, descending?) over the pre-split names; `keep` are
    * the columns surfaced per side (suffixed `_a`/`_b`). */
  def draftBoard(t: DataFrame, order: Seq[(String, Boolean)],
                 keep: Seq[String]): DataFrame = {
    def sortCols(suffix: String) = order.map { case (c, desc) =>
      if (desc) col(s"$c$suffix").desc else col(s"$c$suffix").asc
    }
    // sort columns ride along even when not in `keep` (each side must stay
    // orderable after projection), and are dropped from the final board
    val carried = (keep ++ order.map(_._1)).distinct
    val halved = t.withColumn("__half", ntile(2).over(Window.orderBy(sortCols(""): _*)))
    def side(half: Int, suffix: String) =
      halved.filter(col("__half") === half)
        .select(carried.map(c => col(c).as(s"$c$suffix")): _*)
    val extras = carried.diff(keep).flatMap(c => Seq(s"${c}_a", s"${c}_b"))
    bindCols(side(1, "_a"), sortCols("_a"), side(2, "_b"), sortCols("_b"))
      .withColumnRenamed("__idx", "rank")
      .drop(extras: _*)
  }

  /** `/root/reference/pff/99_passblock_piece.R:44-108,206-216`: cross-source
    * validation — full outer join of two metric sources on (season, team),
    * per-season min-max rescale of each onto [0,100], year-over-year lag
    * panel per team, and the agreement/stability correlations in one pass. */
  def passBlockValidation(espn: DataFrame, pff: DataFrame): DataFrame = {
    val joined = espn.select(col("season"), col("posteam").as("team"),
        col("pbwr").cast(DoubleType))
      .join(pff.select(col("season"), col("team_abbr").as("team"),
        col("grades_pass_block").cast(DoubleType)), Seq("season", "team"), "full_outer")
    val rs = joined
      .withColumn("pbwr_scaled",
        minMaxRescale(joined, Seq(col("season")), col("pbwr")))
      .withColumn("grade_scaled",
        minMaxRescale(joined, Seq(col("season")), col("grades_pass_block")))
    val w = Window.partitionBy("team").orderBy("season")
    rs.withColumn("lag_pbwr", lag(col("pbwr_scaled"), 1).over(w))
      .withColumn("lag_grade", lag(col("grade_scaled"), 1).over(w))
      .agg(
        graft.functions.RSemantics.safeCorr(col("pbwr_scaled"), col("grade_scaled")).as("c_cross_source"),
        graft.functions.RSemantics.safeCorr(col("pbwr_scaled"), col("lag_pbwr")).as("c_pbwr_yoy"),
        graft.functions.RSemantics.safeCorr(col("grade_scaled"), col("lag_grade")).as("c_grade_yoy"),
        count(lit(1)).as("n"))
  }

  /** `/root/reference/darko/2_ourlads_projections.R:30-113,458-524`: depth
    * chart × grades × draft imputation — scraped-name cleanup (:30-37), the
    * FULL outer ids join (:62 `full_join`: grade-only players survive with
    * a null depth-chart side), `value = coalesce(grade, draft_pct)` for
    * rookies who haven't played (:83), tackle/guard position grouping
    * (:68-73), percentile-rank normalization within position
    * (`100*(1+max(rank)-rank)/max(rank)`, :106-113) computed BEFORE the
    * team filter like the reference, contract enrichment (:458-467), and
    * the per-position quantile summary (:508-524).
    *
    * Returns the ranked per-player frame; summarize with
    * [[ourladsPositionSummary]] / [[ourladsTeamProjection]]. */
  def ourladsRanked(ourlads: DataFrame, grades: DataFrame, draft: DataFrame,
                    contracts: DataFrame): DataFrame = {
    def cleanName(c: org.apache.spark.sql.Column) =
      initcap(trim(regexp_replace(c, "\\s+", " ")))
    val clean = ourlads
      .withColumn("player", cleanName(col("player")))
      .withColumn("team", TeamNames.normalize(col("current_team")))
      .select("player", "team", "position_ourlads")
    // one grade row per player before the join (the reference slice_tail()s
    // to the most recent season, :102-105); without it a 5-season veteran
    // fans out 5x and skews the quantiles
    val gradeRows = grades.select(cleanName(col("player")).as("player"),
      col("grades_pass_block").cast(DoubleType).as("grade"))
    val latestGrade =
      if (grades.columns.contains("season"))
        top1PerGroup(grades.select(cleanName(col("player")).as("player"),
            col("grades_pass_block").cast(DoubleType).as("grade"), col("season")),
          Seq(col("player")), Seq(col("season").desc)).drop("season")
      else top1PerGroup(gradeRows, Seq(col("player")), Seq(col("grade").desc))
    val graded = clean.join(latestGrade, Seq("player"), "full_outer") // :62
    val valued = graded
      .join(broadcast(draft.select(cleanName(col("player")).as("player"),
        col("draft_pct").cast(DoubleType).as("draft_pct"))), Seq("player"), "left")
      .withColumn("value", coalesce(col("grade"), col("draft_pct"))) // :83
      .withColumn("position",
        when(col("position_ourlads").isin("LT", "RT"), "T")
          .when(col("position_ourlads").isin("LG", "RG"), "G")
          .otherwise(coalesce(col("position_ourlads"), lit("UNK")))) // :67-73
    val wPos = Window.partitionBy("position")
      .orderBy(col("value").desc_nulls_last, col("player").asc)
    val ranked = valued
      .withColumn("rank", row_number().over(wPos))
      .withColumn("max_rank", max(col("rank")).over(Window.partitionBy("position")))
      // raw IEEE division of exact ints — engine-stable, no rounding
      .withColumn("pct_normed",
        lit(100.0) * (lit(1) + col("max_rank") - col("rank")) / col("max_rank"))
      .filter(col("team").isNotNull) // :110, AFTER ranks like the reference
    // max apy per player: the reference's distinct() still fans out when a
    // player holds two contracts with different values
    ranked.join(
      broadcast(contracts.select(cleanName(col("player")).as("player"),
          col("apy").cast(DoubleType))
        .groupBy("player").agg(max("apy").as("apy"))),
      Seq("player"), "left")
  }

  /** Per-position quantile summary (:508-524) over the coalesced value. */
  def ourladsPositionSummary(ranked: DataFrame): DataFrame =
    ranked.groupBy("position")
      .agg(
        quantileAgg(col("value"), Seq(0.2, 0.5, 0.8)).as("value_quantiles"),
        avg("apy").as("avg_apy"),
        count(lit(1)).as("n_starters"))
      .orderBy("position")

  /** The model stage (:123-139): per-(team, T-vs-interior) mean normalized
    * rank, pivoted wide, scored by the projection seam — the reference's
    * two `predict.gam` calls stubbed with the A12-style deterministic
    * logistic surrogate (monotone in the group mean, bounded like the
    * weekly GAMs' response). Means round at 4 dp before scoring so the
    * surrogate sees shuffle-order-independent inputs. */
  def ourladsTeamProjection(ranked: DataFrame): DataFrame = {
    def surrogate(pct: org.apache.spark.sql.Column) =
      round(lit(20.0) + lit(60.0) / (lit(1.0) + exp(-(pct - 50.0) / 10.0)), 4)
    ranked
      .withColumn("pos_group",
        when(col("position_ourlads").isin("LT", "RT"), "T").otherwise("GC")) // :126-130
      .groupBy("team")
      .pivot("pos_group", Seq("T", "GC"))
      .agg(round(avg(col("pct_normed")), 4))
      .withColumnRenamed("T", "pct_t")
      .withColumnRenamed("GC", "pct_gc")
      .withColumn("value_t", surrogate(col("pct_t")))
      .withColumn("value_gc", surrogate(col("pct_gc")))
      .orderBy("team")
  }

  /** Back-compat entry: the per-position summary over the full pipeline. */
  def ourladsProjections(ourlads: DataFrame, grades: DataFrame, draft: DataFrame,
                         contracts: DataFrame): DataFrame =
    ourladsPositionSummary(ourladsRanked(ourlads, grades, draft, contracts))
}
