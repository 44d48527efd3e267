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

  /** `/root/reference/darko/2_ourlads_projections.R:80-113,458-524`: depth
    * chart × grades — scraped-name cleanup (:30-37), percentile-rank
    * normalization within position (`100*(1+max(rank)-rank)/max(rank)`,
    * :106-113), contract enrichment via distinct (:458-467), and the
    * per-position quantile summary (:508-524). */
  def ourladsProjections(ourlads: DataFrame, grades: DataFrame,
                         contracts: DataFrame): DataFrame = {
    val clean = ourlads
      .withColumn("player", initcap(trim(regexp_replace(col("player"), "\\s+", " "))))
      .withColumn("team", TeamNames.normalize(col("current_team")))
    // one grade row per player before the join (the reference slice_tail()s
    // to the most recent season, `darko/2_ourlads_projections.R:102-105`);
    // without it a 5-season veteran fans out 5x and skews the quantiles
    val gradeRows = grades.select(initcap(col("player")).as("player"),
      col("grades_pass_block").cast(DoubleType).as("grade"))
    val latestGrade =
      if (grades.columns.contains("season"))
        top1PerGroup(grades.select(initcap(col("player")).as("player"),
            col("grades_pass_block").cast(DoubleType).as("grade"), col("season")),
          Seq(col("player")), Seq(col("season").desc)).drop("season")
      else top1PerGroup(gradeRows, Seq(col("player")), Seq(col("grade").desc))
    val graded = clean.join(broadcast(latestGrade), Seq("player"), "left")
    val wPos = Window.partitionBy("position_ourlads")
      .orderBy(col("grade").desc_nulls_last, col("player").asc)
    val ranked = graded
      .withColumn("rank", row_number().over(wPos))
      .withColumn("max_rank", max(col("rank")).over(Window.partitionBy("position_ourlads")))
      .withColumn("pct_normed",
        lit(100.0) * (lit(1) + col("max_rank") - col("rank")) / col("max_rank"))
    // max apy per player: the reference's distinct() still fans out when a
    // player holds two contracts with different values
    val paid = ranked.join(
      broadcast(contracts.select(initcap(col("player")).as("player"),
          col("apy").cast(DoubleType))
        .groupBy("player").agg(max("apy").as("apy"))),
      Seq("player"), "left")
    paid.groupBy("position_ourlads")
      .agg(
        expr("percentile(grade, array(0.2, 0.5, 0.8))").as("grade_quantiles"),
        avg("apy").as("avg_apy"),
        count(lit(1)).as("n_starters"))
      .orderBy("position_ourlads")
  }
}
