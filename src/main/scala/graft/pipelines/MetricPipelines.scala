package graft.pipelines

import graft.operators.Relational._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Per-script pipeline objects, wave 2: calibration, regression, and the
  * flagship multi-source stability analysis. */
object MetricPipelines {

  /** `/root/reference/R/espn_wp.R:36-131`: ESPN per-play WP joined to the
    * schedule (differing key names), lagged one play within each game (the
    * pre-play probability), labeled with the home result, then binned into
    * a calibration curve. One shuffle per window/agg; the join broadcasts. */
  def espnWpCalibration(espnWp: DataFrame, games: DataFrame, binWidth: Double = 0.05): DataFrame = {
    val w = Window.partitionBy("espn_game_id").orderBy(col("play_id").cast(DoubleType))
    val lagged = espnWp
      .withColumn("pre_wp", lag(col("home_wp"), 1).over(w))
      .filter(col("pre_wp").isNotNull) // reference drops each game's first row
    val labeled = lagged.join(
      broadcast(games.filter(col("result").isNotNull)
        .withColumn("label", (col("result") > 0).cast(DoubleType))
        .select(col("espn"), col("label"))),
      lagged("espn_game_id") === col("espn"), "inner")
    labeled
      // outer round(6) strips float noise (12 * 0.05 = 0.6000000000000001)
      .withColumn("bin", round(round(col("pre_wp") / binWidth) * binWidth, 6))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_plays"),
        avg("label").as("obs_win_rate"),
        avg("pre_wp").as("mean_pred"))
      .orderBy("bin")
  }

  /** `/root/reference/R/espn_wp.R:236-274`: the 20 slice-by-slice LogLoss
    * passes as ONE grouping-sets job (SURVEY.md §4: multi-pass elimination
    * by query authoring, no custom rule needed). */
  def espnWpLogLoss(plays: DataFrame): DataFrame =
    plays
      .withColumn("late", (col("qtr") >= 3).cast(IntegerType))
      .cube(col("late"), col("qtr"))
      .agg(grouping_id().cast(IntegerType).as("gid"),
        logLoss(col("pred"), col("label")).as("log_loss"),
        count(lit(1)).as("n"))
      .orderBy(col("gid"), col("late").asc_nulls_first, col("qtr").asc_nulls_first)

  /** `/root/reference/R/preseason_predictiveness.R`: wide decade columns
    * unpivoted to (team, season, line) (:15-44), "9.5 Ov" cells split
    * (:15-17), franchise abbrs normalized (:63), actual point differential
    * joined, and BOTH predictiveness fits (:150-151) computed closed-form
    * in one aggregate pass: the simple OLS `lm(diff ~ over)` and, when
    * `psDiffCol` names a preseason-point-differential column in `results`,
    * the two-regressor `lm(diff ~ over + ps_point_diff)` via ols2Aggs. */
  def preseasonPredictiveness(wideTotals: DataFrame, results: DataFrame, decadeBase: Int,
                              psDiffCol: Option[String] = None): DataFrame = {
    val seasonCols = wideTotals.columns.filter(_.matches("x\\d\\d"))
    val long = wideTotals.unpivot(
        Array(col("team")), seasonCols.map(col), "yr", "cell")
      .filter(col("cell").isNotNull && length(trim(col("cell"))) > 0)
      .withColumn("season", (lit(decadeBase) + substring(col("yr"), 2, 2).cast(IntegerType)))
      .withColumn("line", split(col("cell"), " ").getItem(0).cast(DoubleType))
      .withColumn("team_abbr", TeamNames.normalize(col("team")))
      .drop("yr", "cell", "team")
    val res = results
      .filter(!col("tm").rlike("AFC|NFC")) // scraped header junk rows
      .withColumn("pt_dif", col("pt_dif").cast(DoubleType))
      .withColumn("team_abbr", TeamNames.normalize(col("tm")))
      .select(Seq("team_abbr", "season", "pt_dif").map(col) ++
        psDiffCol.map(c => col(c).cast(DoubleType).as(c)): _*)
    val fit2 = psDiffCol.toSeq.flatMap { c =>
      // ols2Aggs emits (b1, b2, intercept, r2) positionally
      Seq("slope_line2", "slope_ps", "intercept2", "r2_2")
        .zip(ols2Aggs(col("line"), col(c), col("pt_dif")))
        .map { case (alias, agg) => agg.as(alias) }
    }
    val aggs = olsAggs(col("line"), col("pt_dif")) ++ fit2 :+ count(lit(1)).as("n")
    long.join(res, Seq("team_abbr", "season"), "inner")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Playcaller source (`/root/reference/R/epa_predict.R:26-34`): most
    * frequent offensive play caller per (posteam, season). The reference
    * relies on `arrange(posteam, season, -n) %>% slice(1)`; Spark needs the
    * explicit total order, so ties break on caller name. */
  def playcallerTop1(pc: DataFrame): DataFrame =
    top1PerGroup(
      pc.groupBy("posteam", "season", "off_play_caller").agg(count(lit(1)).as("n")),
      Seq(col("posteam"), col("season")),
      Seq(col("n").desc, col("off_play_caller").asc))
      .drop("n")

  /** New-playcaller flags (`/root/reference/R/epa_predict.R:42-59`): 1 where
    * a team's top caller differs from its previous season, 0 where it's the
    * same, null for the team's first observed season (the reference's
    * `ifelse(pc != lag(pc), 1, 0)` is NA on the NA lag). The reference's
    * 2021 hard-code patch (:37-55) is data repair, not pipeline semantics. */
  def newPlaycallerFlags(pcTop1: DataFrame): DataFrame = {
    val w = Window.partitionBy("posteam").orderBy("season")
    pcTop1
      .withColumn("new_pc",
        (col("off_play_caller") =!= lag(col("off_play_caller"), 1).over(w))
          .cast(IntegerType))
      .select("posteam", "season", "new_pc")
  }

  /** The 16 panel metrics the reference lags and correlates
    * (`/root/reference/R/epa_predict.R:241-261` + the tribble at :270-292):
    * pbp-derived rates, the AY/A family, and the four joined sources. */
  val EpaPredictMetrics: Seq[String] = Seq(
    "epa", "adj_epa", "total_epa", "cpoe", "success_rate",
    "aya", "ya", "tdint",
    "qbr_logit", "total_points", "tpp",
    "grade", "grade_passing", "war", "war_per_play", "dakota_index")

  /** The flagship panel: `/root/reference/R/epa_predict.R` (598 LoC) as one
    * DAG, all five sources joined.
    *
    *  - AY/A sub-aggregate over throw plays (:177-188): aya, ya, td/int
    *    (null when ints = 0, like the reference's ifelse — and avoiding the
    *    ANSI /0 raise)
    *  - per-(passer, season) aggregates with the -4.5 EPA cap and `na.rm`
    *    cpoe mean (:195-215); `min(posteam)`/`min(name)` stand in for the
    *    reference's insertion-order `dplyr::first` (deterministic under
    *    shuffle; a QB-season has one team in practice)
    *  - broadcast joins against PFF grades + WAR (:115-165), ESPN QBR
    *    (logit-transformed, :224-226 — nulled at the 0/100 edges where R
    *    silently yields ±Inf and ANSI raises), SIS total points (:64-86),
    *    and the playcaller-change flags (:219)
    *  - the dakota/index model seam (:221, `add_dakota()`) as the A12
    *    deterministic logistic surrogate over (epa, cpoe)
    *  - year-over-year lag panel partitioned by passer (:241-261), keeping
    *    rows with a prior season (`filter(!is.na(lepa))`, :263)
    *
    * Expected pbp columns: id, name, posteam, season, pass (0/1), is_throw
    * (0/1), qb_epa, cpoe, success, yards_gained, pass_touchdown,
    * interception. Source frames join on (id, season).
    */
  def epaPredictPanel(pbp: DataFrame, playcallers: DataFrame, qbr: DataFrame,
                      sis: DataFrame, pff: DataFrame, war: DataFrame,
                      minPlays: Int = 10, minDropbacks: Int = 0): DataFrame = {
    val ya = pbp
      .filter(col("is_throw") === 1)
      .groupBy("id", "season")
      .agg(
        sum("yards_gained").as("yards"), sum("interception").as("ints"),
        sum("pass_touchdown").as("tds"), count(lit(1)).as("n_throws"))
      .select(
        col("id"), col("season"),
        ((col("yards") + lit(20) * col("tds") - lit(45) * col("ints"))
          .cast(DoubleType) / col("n_throws")).as("aya"),
        (col("yards").cast(DoubleType) / col("n_throws")).as("ya"),
        when(col("ints") > 0, col("tds").cast(DoubleType) / col("ints")).as("tdint"))
    val qbs = pbp
      .filter(col("id").isNotNull && col("qb_epa").isNotNull)
      .groupBy("id", "season")
      .agg(
        min("name").as("name"),
        min("posteam").as("posteam"),
        sum("pass").as("n_dropbacks"),
        count(lit(1)).as("n_plays"),
        avg("qb_epa").as("epa"),
        avg(greatest(col("qb_epa"), lit(-4.5))).as("adj_epa"),
        sum("qb_epa").as("total_epa"),
        avg("success").as("success_rate"),
        avg("cpoe").as("cpoe")) // na.rm=TRUE form (:210)
      .filter(col("n_plays") >= minPlays && col("n_dropbacks") > minDropbacks)
    val pffWar = pff
      .select(col("id"), col("season"), col("grade"), col("grade_passing"))
      .join(war.select(col("id"), col("season"), col("war")), Seq("id", "season"), "left")
    val joined = qbs
      .join(broadcast(ya), Seq("id", "season"), "left")
      .join(broadcast(pffWar), Seq("id", "season"), "left")
      .join(broadcast(qbr.select(col("id"), col("season"), col("qbr_total"))),
        Seq("id", "season"), "left")
      .join(broadcast(sis.select(col("id"), col("season"), col("total_points"), col("tpp"))),
        Seq("id", "season"), "left")
      .join(broadcast(newPlaycallerFlags(playcallerTop1(playcallers))),
        Seq("posteam", "season"), "left")
      .withColumn("qbr_logit",
        when(col("qbr_total") > 0 && col("qbr_total") < 100,
          log(col("qbr_total") / (lit(100.0) - col("qbr_total")))))
      .withColumn("war_per_play", col("war") / col("n_plays"))
      // the add_dakota() model seam (:221): deterministic logistic
      // surrogate over (epa, cpoe) — pure column arithmetic, no UDF
      .withColumn("dakota_index",
        when(col("cpoe").isNotNull,
          lit(1.0) / (lit(1.0) + exp(-(lit(-1.0) + col("epa") * 2 + col("cpoe") * 0.05)))))
    val w = Window.partitionBy("id").orderBy("season")
    val lagged = (EpaPredictMetrics :+ "posteam").foldLeft(joined) { (df, m) =>
      df.withColumn(s"lag_$m", lag(col(m), 1).over(w))
    }
    lagged.filter(col("lag_epa").isNotNull) // reference :263
  }

  /** The 26 separate `cor()` calls (:270-292) as ONE unpivot + grouped corr
    * pass: per metric, its year-over-year stability AND its correlation
    * with the CURRENT season's EPA/play (the reference table's two columns),
    * both pairwise-complete. Rounded at the output boundary (corr partials
    * merge in shuffle order; 4 dp is the cross-engine-stable surface). */
  def stabilityMatrix(lqb: DataFrame,
                      metrics: Seq[String] = EpaPredictMetrics): DataFrame = {
    val stacked = lqb.select(
      explode(array(metrics.map(m =>
        struct(lit(m).as("metric"), col(m).cast(DoubleType).as("v"),
          col(s"lag_$m").cast(DoubleType).as("lv"),
          col("epa").cast(DoubleType).as("e"))): _*)).as("s"))
      .select(col("s.metric"), col("s.v"), col("s.lv"), col("s.e"))
    stacked.groupBy("metric")
      .agg(
        graft.functions.RSemantics.stat4(
          graft.functions.RSemantics.safeCorr(col("v"), col("lv"))).as("stability"),
        graft.functions.RSemantics.stat4(
          graft.functions.RSemantics.safeCorr(col("e"), col("lv"))).as("epa_corr"),
        count(when(col("v").isNotNull && col("lv").isNotNull, 1)).as("n_pairs"))
      .orderBy("metric")
  }

  /** Variant 1 (:432-455): QBs who changed teams — rows whose posteam
    * differs from the lagged posteam (null lag drops via three-valued
    * logic, exactly the reference's `!=`). */
  def switchedTeams(lqb: DataFrame): DataFrame =
    lqb.filter(col("posteam") =!= col("lag_posteam"))

  /** Variant 2 (:515-543): QBs with a new playcaller — same team with a
    * flagged caller change, or a team switch, from `seasonMin` on. The
    * reference applies this filter to the already-switcher-filtered frame
    * (reusing the mutated `lqb`) with a recomputed lag; the table subtitle
    * ("QBs who switched teams or had new play-caller on the same team")
    * states the intent, which is what this implements from the full panel. */
  def newPlaycallerSeasons(lqb: DataFrame, seasonMin: Int): DataFrame =
    lqb.filter(
      ((col("new_pc") === 1 && col("posteam") === col("lag_posteam")) ||
        col("posteam") =!= col("lag_posteam")) &&
        col("season") >= seasonMin)

  /** Flagship entry: full panel → stability matrix
    * (metric, stability, epa_corr, n_pairs). */
  def epaPredict(pbp: DataFrame, playcallers: DataFrame, qbr: DataFrame,
                 sis: DataFrame, pff: DataFrame, war: DataFrame,
                 minPlays: Int = 10, minDropbacks: Int = 0): DataFrame =
    stabilityMatrix(
      epaPredictPanel(pbp, playcallers, qbr, sis, pff, war, minPlays, minDropbacks))

  /** `/root/reference/R/epa_predict.R:229-238`: join-integrity anti-join
    * probe — rows that failed to enrich, for QA (empty = healthy). */
  def unmatchedAfterJoin(enriched: DataFrame, joinedCol: String): DataFrame =
    enriched.filter(col(joinedCol).isNull)
}
