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
      Seq("b1" -> "slope_line2", "b2" -> "slope_ps", "intercept" -> "intercept2",
        "r2" -> "r2_2").map(_._2).zip(ols2Aggs(col("line"), col(c), col("pt_dif")))
        .map { case (alias, agg) => agg.as(alias) }
    }
    val aggs = olsAggs(col("line"), col("pt_dif")) ++ fit2 :+ count(lit(1)).as("n")
    long.join(res, Seq("team_abbr", "season"), "inner")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The flagship: `/root/reference/R/epa_predict.R` (598 LoC) as one DAG.
    *
    *  - playcaller top-1 per (posteam, season) by snap count (:26-34)
    *  - per-(passer, season) passing + EPA aggregates with the -4.5 EPA cap
    *    and `na.rm` cpoe mean (:176-214)
    *  - broadcast joins against QBR (logit-transformed, :224-226), SIS, and
    *    grades/WAR sources (:215-220)
    *  - year-over-year lag panel partitioned by passer (:241-263)
    *  - the 26 separate `cor()` calls (:270-292) as ONE unpivot + grouped
    *    `corr` pass — each metric correlated with its own lag.
    *
    * Returns the long-form stability matrix (metric, yoy_corr, n_pairs).
    */
  def epaPredict(pbp: DataFrame, qbr: DataFrame, sis: DataFrame,
                 minPlays: Int = 10): DataFrame = {
    // contract: `id`/`name` are nflfastR's UNIFIED player columns — set on
    // dropbacks AND designed runs/scrambles (`/root/reference/R/epa_predict.R:
    // 172-178` keeps rush==1|pass==1 and groups by id) — not the
    // passer-only ids; a passer-only id would drop exactly the scramble
    // plays this stability analysis is about
    val perSeason = pbp
      .filter(col("id").isNotNull && col("qb_epa").isNotNull)
      .withColumn("qb_epa_cap", greatest(col("qb_epa"), lit(-4.5)))
      .groupBy(col("id"), col("season"))
      .agg(
        first(col("name"), ignoreNulls = true).as("name"),
        first(col("posteam"), ignoreNulls = true).as("posteam"),
        count(lit(1)).as("n_plays"),
        avg("qb_epa_cap").as("epa_play"),
        avg("cpoe").as("cpoe"), // na.rm=TRUE form (:210)
        avg("success").as("success_rate"))
      .filter(col("n_plays") >= minPlays)
    val withQbr = perSeason
      .join(broadcast(qbr.select(col("player_id").as("id"), col("season"),
        col("qbr_total"))), Seq("id", "season"), "left")
      // logit is undefined at the 0/100 edges (R silently yields ±Inf;
      // Spark's ANSI mode raises on the division) — null them out explicitly
      .withColumn("qbr_logit",
        when(col("qbr_total") > 0 && col("qbr_total") < 100,
          log(col("qbr_total") / (lit(100.0) - col("qbr_total")))))
    val withSis = withQbr
      .join(broadcast(sis.select(col("player_id").as("id"), col("season"),
        col("total_points_per_play"))), Seq("id", "season"), "left")

    val metrics = Seq("epa_play", "cpoe", "success_rate", "qbr_logit",
      "total_points_per_play")
    val w = Window.partitionBy("id").orderBy("season")
    val lagged = metrics.foldLeft(withSis) { (df, m) =>
      df.withColumn(s"lag_$m", lag(col(m), 1).over(w))
    }
    // one pass for the whole correlation matrix: unpivot (metric, v, lv)
    val stacked = lagged.select(
      col("id"), col("season"),
      explode(array(metrics.map(m =>
        struct(lit(m).as("metric"), col(m).cast(DoubleType).as("v"),
          col(s"lag_$m").cast(DoubleType).as("lv"))): _*)).as("s"))
      .select(col("s.metric"), col("s.v"), col("s.lv"))
    stacked.groupBy("metric")
      .agg(graft.functions.RSemantics.safeCorr(col("v"), col("lv")).as("yoy_corr"),
        count(when(col("v").isNotNull && col("lv").isNotNull, 1)).as("n_pairs"))
      .orderBy("metric")
  }

  /** `/root/reference/R/epa_predict.R:229-238`: join-integrity anti-join
    * probe — rows that failed to enrich, for QA (empty = healthy). */
  def unmatchedAfterJoin(enriched: DataFrame, joinedCol: String): DataFrame =
    enriched.filter(col(joinedCol).isNull)
}
