package graft.pipelines

import graft.functions.RSemantics._
import graft.operators.Relational._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-script pipeline objects, wave 1: the pbp-centric analyses. Each
  * object reproduces one reference script's *data* logic end-to-end (the
  * gt/ggplot presentation layers are out of engine scope, SURVEY.md §2.1
  * S10) as a single lazy DataFrame DAG — where the reference materializes
  * eagerly after every verb, Catalyst sees the whole pipeline at once.
  */
object CorePipelines {

  /** `/root/reference/R/let_russ_cook.R:39-44,104-116`: competitive-snap
    * filter pushed to the scan, per-team pass rate, min-max gauge rescale.
    */
  def letRussCook(pbp: DataFrame, season: Int): DataFrame = {
    val filtered = pbp.filter(
      (col("down") === 1 || col("down") === 2) &&
        col("wp").between(0.2, 0.8) &&
        col("half_seconds_remaining") > 120 &&
        col("posteam").isNotNull && col("epa").isNotNull &&
        col("season") === season)
      .select("posteam", "pass", "epa")
    val agg = filtered.groupBy("posteam")
      .agg(count(lit(1)).as("n_plays"), avg("pass").as("pass_rate"),
        avg("epa").as("epa_per_play"))
    agg.withColumn("pct",
        minMaxRescale(agg, Seq(lit(1)), col("pass_rate")))
      .orderBy(col("pass_rate").desc, col("posteam"))
  }

  /** `/root/reference/R/pass_rate_over_expected.R:16-30`: model-scored
    * expectation column (`xpass` fixture-provided or surrogate-scored,
    * SURVEY.md §7) → `pass_oe` → per-(team, season) aggregation. */
  def passRateOverExpected(pbp: DataFrame): DataFrame =
    pbp.filter(col("xpass").isNotNull && col("posteam").isNotNull)
      .withColumn("pass_oe", lit(100.0) * (col("pass") - col("xpass")))
      .groupBy("posteam", "season")
      .agg(
        avg("pass").as("pass_rate"),
        avg("xpass").as("exp_pass_rate"),
        avg("pass_oe").as("proe"),
        count(lit(1)).as("n"))
      .orderBy("season", "posteam")

  /** `/root/reference/R/wilson_game_pass_freq.R:15-46`: the TEAM's normal
    * plays (`!is.na(down), rush==1|pass==1`, :19-21), cut each game at the
    * first play where WP leaves [0.1, 0.9] (running-flag cumsum over the
    * full team sequence, :24-29), then per-game early-down pass frequency
    * over the competitive prefix, with the named QB's EPA as an na.rm mean
    * (:38-43). */
  def wilsonGamePassFreq(pbp: DataFrame, team: String, qb: String): DataFrame = {
    val w = Window.partitionBy("game_id").orderBy("play_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pbp.filter(col("posteam") === team && col("down").isNotNull
        && (col("rush") === 1 || col("pass") === 1))
      .withColumn("blown",
        when(col("wp") < 0.1 || col("wp") > 0.9, 1).otherwise(0))
      .withColumn("over", sum(col("blown")).over(w))
      .filter(col("over") === 0 && col("down") <= 2)
      .withColumn("qb_play_epa", when(col("name") === qb, col("qb_epa")))
      .groupBy("game_id")
      .agg(
        first(col("week")).as("week"),
        first(col("defteam")).as("defteam"),
        count(lit(1)).as("n_plays"),
        avg("pass").as("pass_rate"),
        naRmMean(col("qb_play_epa")).as("qb_epa_play"))
      .orderBy("week", "game_id")
  }

  /** `/root/reference/R/nfc_west_starting_qbs.R:22-32`: each game's
    * STARTER is the first passer of that (game, posteam) (`slice(1)`,
    * :24-26 — the reference leans on insertion order, so the engine pins
    * play_id order, SURVEY.md §7 "what's hard"); then per (team, passer):
    * first start date + games started, enriched from rosters via a
    * differing-key broadcast join. */
  def firstStarts(pbp: DataFrame, rosters: DataFrame, teams: Seq[String]): DataFrame = {
    val starters = top1PerGroup(
      pbp.filter(col("posteam").isin(teams: _*) && col("passer_player_name").isNotNull),
      Seq(col("game_id"), col("posteam")),
      Seq(col("play_id").asc))
    val firsts = starters
      .groupBy("posteam", "passer_player_name", "passer_player_id")
      .agg(min("game_date").as("first_start"), count(lit(1)).as("games"))
    val r = top1PerGroup(rosters,
      Seq(col("gsis_id")), Seq(col("season").desc, col("full_name").asc))
    firsts.join(broadcast(r), firsts("passer_player_id") === r("gsis_id"), "left")
      .select(firsts("posteam"), firsts("passer_player_name"),
        r("full_name"), firsts("first_start"), firsts("games"))
      .orderBy("posteam", "first_start", "passer_player_name")
  }

  /** `/root/reference/R/on_off_nflreadr.R:19-89`: on/off splits by player
    * participation. The ";"-joined id string becomes an array +
    * `array_contains` (P7→array form), and the reference's 8 separate
    * re-scanning aggregates collapse into ONE grouped pass pivoted on the
    * on/off flag. */
  def onOffSplits(participation: DataFrame, playerId: String): DataFrame =
    participation
      .withColumn("on_field",
        when(array_contains(split(col("offense_players"), ";"), playerId), "on")
          .otherwise("off"))
      .filter(col("posteam").isNotNull)
      .groupBy("posteam")
      .pivot("on_field", Seq("on", "off"))
      .agg(
        count(lit(1)).as("n"),
        avg("epa").as("epa_play"),
        avg("success").as("success_rate"),
        naRmMean(col("first_down")).as("first_down_rate"))
      .orderBy("posteam")
}
