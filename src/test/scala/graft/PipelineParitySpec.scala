package graft

import graft.pipelines.{CorePipelines, MarketPipelines, MetricPipelines, TeamNames}
import org.apache.spark.sql.functions._
import java.sql.Date

/** pbp fixture row (FIXTURES.md §1 canonical subset). Top-level for
  * encoder derivation. */
case class PbpRow(
    game_id: String, play_id: Int, season: Int, week: Int, game_date_s: String,
    posteam: Option[String], defteam: Option[String], down: Option[Int],
    wp: Double, half_seconds_remaining: Double, epa: Option[Double],
    qb_epa: Option[Double], cpoe: Option[Double], pass: Int, rush: Int,
    name: Option[String], passer_player_id: Option[String],
    passer_player_name: Option[String], xpass: Option[Double],
    success: Option[Int])

/** Domain-parity tests: FIXTURES.md-shaped frames with hand-computed
  * expectations, one per reference script (SURVEY.md §5 strategy (b)). */
class PipelineParitySpec extends SparkSpec {
  import spark.implicits._

  private def row(g: String, p: Int, yr: Int, wk: Int, dt: String, pos: String,
                  deft: String, down: Int, wp: Double, hsr: Double, epa: Double,
                  cpoe: Option[Double], pass: Int, nm: String, pid: String,
                  xpass: Double, success: Int): PbpRow =
    PbpRow(g, p, yr, wk, dt, Some(pos), Some(deft), Some(down), wp, hsr,
      Some(epa), Some(epa), cpoe, pass, 1 - pass, Some(nm), Some(pid), Some(nm),
      Some(xpass), Some(success))

  // ---- pbp fixture (FIXTURES.md §1): 2 seasons, must-cover cases ----
  private lazy val pbp = Seq(
    // game A 2023: SEA competitive plays (down 1/2, wp in band), plus filtered rows
    row("g1", 1, 2023, 1, "2023-09-10", "SEA", "LA", 1, 0.55, 900.0, 0.2, Some(1.0), 1, "R.Wilson", "00-1", 0.6, 1),
    row("g1", 2, 2023, 1, "2023-09-10", "SEA", "LA", 2, 0.60, 880.0, -0.1, None, 0, "R.Wilson", "00-1", 0.5, 0),
    row("g1", 3, 2023, 1, "2023-09-10", "SEA", "LA", 3, 0.61, 860.0, 0.5, Some(2.0), 1, "R.Wilson", "00-1", 0.9, 1),  // down 3: filtered from letRussCook
    row("g1", 4, 2023, 1, "2023-09-10", "SEA", "LA", 1, 0.95, 840.0, 0.3, None, 1, "R.Wilson", "00-1", 0.7, 1),       // wp out of band: session cut fires here
    row("g1", 5, 2023, 1, "2023-09-10", "SEA", "LA", 1, 0.55, 60.0, 0.1, None, 0, "R.Wilson", "00-1", 0.4, 0),        // clock: filtered
    // game B 2023: LA plays
    row("g2", 1, 2023, 1, "2023-09-10", "LA", "SEA", 1, 0.50, 900.0, 0.0, Some(-1.0), 0, "M.Stafford", "00-2", 0.5, 0),
    row("g2", 2, 2023, 1, "2023-09-10", "LA", "SEA", 2, 0.45, 880.0, 0.2, Some(1.5), 1, "M.Stafford", "00-2", 0.6, 1),
    // 2022 seasons for lag pairs (R.Wilson switched SEA->DEN in fixture)
    row("g0", 1, 2022, 1, "2022-09-11", "DEN", "KC", 1, 0.5, 900.0, 0.1, Some(0.5), 1, "R.Wilson", "00-1", 0.55, 1),
    row("g0", 2, 2022, 1, "2022-09-11", "DEN", "KC", 2, 0.5, 880.0, 0.2, Some(1.0), 0, "R.Wilson", "00-1", 0.45, 0),
    row("g0", 3, 2022, 2, "2022-09-18", "LA", "SF", 1, 0.5, 900.0, -0.2, Some(0.0), 1, "M.Stafford", "00-2", 0.5, 1),
    row("g0", 4, 2022, 2, "2022-09-18", "LA", "SF", 2, 0.5, 880.0, -0.1, None, 1, "M.Stafford", "00-2", 0.5, 0),
    // backup QB who relieves the starter mid-game: must NOT count as a start
    PbpRow("g1", 6, 2023, 1, "2023-09-10", Some("SEA"), Some("LA"), None, 0.5,
      30.0, None, None, None, 1, 0, Some("J.Backup"), Some("00-9"),
      Some("J.Backup"), None, None),
    // null posteam / null epa row (base_code.R:8 filters)
    PbpRow("g1", 9, 2023, 1, "2023-09-10", None, None, None, 0.5, 900.0,
      None, None, None, 0, 0, None, None, None, None, None)
  ).toDF()
    .withColumn("game_date", to_date(col("game_date_s")))
    .drop("game_date_s")

  test("letRussCook: filters push correctly, per-team rate + gauge rescale") {
    val out = CorePipelines.letRussCook(pbp, 2023)
      .select("posteam", "n_plays", "pass_rate", "pct")
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    // SEA survivors: plays 1,2 → pass_rate 0.5 ; LA survivors: 1,2 → 0.5
    assert(out("SEA")._2 === 2 && out("LA")._2 === 2)
    assert(out("SEA")._3 === 0.5 && out("LA")._3 === 0.5)
    assert(out("SEA")._4 === 50.0) // equal rates → rescale midpoint
  }

  test("passRateOverExpected: pass_oe is 100*(pass - xpass), averaged per team-season") {
    val out = CorePipelines.passRateOverExpected(pbp)
      .filter(col("season") === 2023 && col("posteam") === "SEA")
      .select("proe", "n").as[(Double, Long)].head()
    // SEA 2023 xpass rows: plays 1-5 → pass=(1,0,1,1,0), xpass=(.6,.5,.9,.7,.4)
    val exp = 100.0 * Seq(1 - 0.6, 0 - 0.5, 1 - 0.9, 1 - 0.7, 0 - 0.4).sum / 5
    assert(math.abs(out._1 - exp) < 1e-9 && out._2 === 5)
  }

  test("wilsonGamePassFreq: session cut on the team sequence + early downs only") {
    val out = CorePipelines.wilsonGamePassFreq(pbp, "SEA", "R.Wilson")
      .filter(col("game_id") === "g1")
      .select("n_plays", "pass_rate", "qb_epa_play").as[(Long, Double, Double)].head()
    // g1 SEA normal plays 1-5; wp .95 at play 4 cuts -> competitive prefix
    // = plays 1-3; early downs only -> plays 1 (d1), 2 (d2); backup play 6
    // has null down and is never a normal play
    assert(out._1 === 2)
    assert(out._2 === 0.5)
    assert(math.abs(out._3 - 0.05) < 1e-12) // mean(0.2, -0.1)
  }

  test("firstStarts: per-game starters only, per-team first start, roster enrich") {
    val rosters = Seq(
      (2023, "Russell Wilson", "00-1"), (2022, "Russ Wilson", "00-1"), // dup gsis: latest wins
      (2023, "Matthew Stafford", "00-2")
    ).toDF("season", "full_name", "gsis_id")
    val out = CorePipelines.firstStarts(pbp, rosters, Seq("SEA", "LA", "DEN"))
      .select("posteam", "passer_player_name", "full_name", "first_start", "games")
      .as[(String, String, String, Date, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // the mid-game backup never appears: only each game's FIRST passer counts
    assert(!out.keySet.exists(_._2 == "J.Backup"))
    assert(out(("SEA", "R.Wilson"))._3 === "Russell Wilson")
    assert(out(("SEA", "R.Wilson"))._4.toString === "2023-09-10")
    assert(out(("DEN", "R.Wilson"))._4.toString === "2022-09-11") // per-team rows
    assert(out(("LA", "M.Stafford"))._4.toString === "2022-09-18")
    assert(out(("LA", "M.Stafford"))._5 === 2L) // started both LA games
  }

  test("onOffSplits: array membership splits in a single pivoted pass") {
    val part = Seq(
      ("p1", "SEA", "00-9;00-8;00-7", 0.5, 1.0, 1.0),
      ("p2", "SEA", "00-8;00-7", -0.5, 0.0, 0.0),
      ("p3", "SEA", "00-9", 1.5, 1.0, 1.0),
      ("p4", "LA", "00-9;00-5", 0.0, 0.0, 1.0)
    ).toDF("play", "posteam", "offense_players", "epa", "success", "first_down")
    val out = CorePipelines.onOffSplits(part, "00-9").collect()
      .map(r => r.getString(0) -> r).toMap
    val sea = out("SEA")
    assert(sea.getAs[Long]("on_n") === 2 && sea.getAs[Long]("off_n") === 1)
    assert(sea.getAs[Double]("on_epa_play") === 1.0)   // (0.5+1.5)/2
    assert(sea.getAs[Double]("off_epa_play") === -0.5)
  }

  test("espnWpCalibration: in-game lag drops first play; bins label correctly") {
    val espnWp = Seq(
      ("401", "1", 0.50), ("401", "2", 0.60), ("401", "3", 0.90))
      .toDF("espn_game_id", "play_id", "home_wp")
    val games = Seq(("401", "g1", 7), ("402", "g2", -3))
      .toDF("espn", "game_id", "result")
    val out = MetricPipelines.espnWpCalibration(espnWp, games, binWidth = 0.05)
      .as[(Double, Long, Double, Double)].collect()
    // pre_wp = [0.50, 0.60] (play 1 dropped), result>0 → label 1
    assert(out.map(_._1).toSeq === Seq(0.5, 0.6))
    assert(out.forall(_._3 === 1.0))
  }

  test("espnWpLogLoss: one cube pass reproduces the hand-computed slice") {
    val plays = Seq((0.9, 1.0, 1), (0.8, 1.0, 2), (0.3, 0.0, 4))
      .toDF("pred", "label", "qtr")
    val out = MetricPipelines.espnWpLogLoss(plays)
      .filter(col("gid") === 3) // grand total row
      .select("log_loss").as[Double].head()
    val want = -(math.log(0.9) + math.log(0.8) + math.log(0.7)) / 3
    assert(math.abs(out - want) < 1e-12)
  }

  test("preseasonPredictiveness: unpivot + split + normalize + closed-form OLS") {
    val wide = Seq(
      ("STL", "7.5 Ov", "8.5 Un"), ("OAK", "6.5 Ov", "9.5 Ov"), ("NE", "11.5 Ov", "10.5 Un"))
      .toDF("team", "x00", "x01")
    // pt_dif = 2*line - 10 exactly → slope 2, intercept -10, r2 1
    val results = Seq(
      ("LA", 2000, "5.0"), ("LA", 2001, "7.0"), ("LV", 2000, "3.0"),
      ("LV", 2001, "9.0"), ("NE", 2000, "13.0"), ("NE", 2001, "11.0"),
      ("AFC", 2000, "junk")
    ).toDF("tm", "season", "pt_dif")
    val out = MetricPipelines.preseasonPredictiveness(wide, results, 2000)
      .select("slope", "intercept", "r2", "n").as[(Double, Double, Double, Long)].head()
    assert(out._1 === 2.0 && out._2 === -10.0 && out._3 === 1.0 && out._4 === 6)
  }

  test("epaPredict: five-source flagship — 16-metric matrix + both variants") {
    // 2 plays per QB-season with epa = m ± 0.5 → season mean exactly m;
    // means advance +1 per season for both QBs → every pbp-rate metric's
    // (v, lag_v) pairs are exactly linear → corr 1.0
    def plays(id: String, season: Int, team: String, m: Double) = Seq(
      (id, s"Q$id", season, team, m - 0.5, Some(m), 1.0, 1, 1, 10.0, 0, 0),
      (id, s"Q$id", season, team, m + 0.5, Some(m + 1), 0.0, 1, 1, 12.0, 1, 0))
    val epbp = (
      plays("00-1", 2021, "TA", 0.0) ++ plays("00-1", 2022, "TA", 1.0) ++
        plays("00-1", 2023, "TB", 2.0) ++ // QB1 switches TA→TB in 2023
        plays("00-2", 2021, "TA", 0.5) ++ plays("00-2", 2022, "TA", 1.5) ++
        plays("00-2", 2023, "TA", 2.5)
      ).toDF("id", "name", "season", "posteam", "qb_epa", "cpoe", "success",
        "pass", "is_throw", "yards_gained", "pass_touchdown", "interception")
    // raw caller rows: TA's top caller changes in 2022 (C1→C2), stays in
    // 2023; the 2021 C1/C1/C9 rows exercise the count-then-top-1 stage
    val pc = Seq(
      ("TA", 2021, "C1"), ("TA", 2021, "C1"), ("TA", 2021, "C9"),
      ("TA", 2022, "C2"), ("TA", 2022, "C2"), ("TA", 2023, "C2"),
      ("TB", 2021, "C3"), ("TB", 2022, "C3"), ("TB", 2023, "C4")
    ).toDF("posteam", "season", "off_play_caller")
    val qbr = Seq( // 100 hits the logit edge → null, drops that pair
      ("00-1", 2021, 50.0), ("00-1", 2022, 60.0), ("00-1", 2023, 100.0),
      ("00-2", 2021, 40.0), ("00-2", 2022, 55.0), ("00-2", 2023, 70.0)
    ).toDF("id", "season", "qbr_total")
    val sis = Seq(
      ("00-1", 2021, 10.0, 0.10), ("00-1", 2022, 20.0, 0.20), ("00-1", 2023, 30.0, 0.30),
      ("00-2", 2021, 12.0, 0.12), ("00-2", 2022, 22.0, 0.22), ("00-2", 2023, 32.0, 0.32)
    ).toDF("id", "season", "total_points", "tpp")
    val pff = Seq(
      ("00-1", 2021, 70.0, 68.0), ("00-1", 2022, 75.0, 72.0), ("00-1", 2023, 80.0, 76.0),
      ("00-2", 2021, 60.0, 58.0), ("00-2", 2022, 65.0, 62.0), ("00-2", 2023, 70.0, 66.0)
    ).toDF("id", "season", "grade", "grade_passing")
    val war = Seq(
      ("00-1", 2021, 1.0), ("00-1", 2022, 2.0), ("00-1", 2023, 3.0),
      ("00-2", 2021, 0.5), ("00-2", 2022, 1.5), ("00-2", 2023, 2.5)
    ).toDF("id", "season", "war")

    def matrix(df: org.apache.spark.sql.DataFrame) =
      MetricPipelines.stabilityMatrix(df).collect().map(r => r.getString(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(3)))).toMap

    val panel = MetricPipelines.epaPredictPanel(epbp, pc, qbr, sis, pff, war, minPlays = 1)
    val full = matrix(panel)
    assert(full.keySet === MetricPipelines.EpaPredictMetrics.toSet)
    assert(full("epa") === ((Some(1.0), 4))) // 2 QBs × 2 lag seasons, exact linear
    assert(full("adj_epa") === ((Some(1.0), 4))) // cap never binds in fixture
    assert(full("qbr_logit")._2 === 3) // QB1 2023 logit nulled at the 100 edge
    assert(full("tdint")._2 === 0) // no interceptions → tdint null everywhere

    // variant 1: team switchers — only QB1's 2023 row; single point → null corr
    val sw = matrix(MetricPipelines.switchedTeams(panel))
    assert(sw("epa") === ((None, 1)))
    // variant 2: new playcaller (or switch) since 2022 — TA flagged new in
    // 2022 (both QBs kept), QB1's 2023 switch kept, QB2's 2023 same-caller
    // row dropped
    val np = matrix(MetricPipelines.newPlaycallerSeasons(panel, seasonMin = 2022))
    assert(np("epa")._2 === 3)
  }

  test("draftOdds: implied prob both signs, de-vig sums to 1, over/under pivot") {
    val dk = Seq(
      ("QB A", 4.5, 110, 0), ("QB A", 4.5, -130, 1),
      ("QB B", 2.5, -200, 0), ("QB B", 2.5, 170, 1)
    ).toDF("player", "pick", "odds", "under")
    val out = MarketPipelines.draftOdds(dk).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("QB A")
    assert(a.getAs[Int]("over_odds") === 110 && a.getAs[Int]("under_odds") === -130)
    val sumA = a.getAs[Double]("over_pct") + a.getAs[Double]("under_pct")
    assert(math.abs(sumA - 1.0) < 1e-6) // de-vig fixed point reached
    // raw implied: +110 → 100/210 ≈ .476; -130 → 130/230 ≈ .565 (sum 1.041 vig)
    assert(a.getAs[Double]("over_pct") < 0.5 && a.getAs[Double]("under_pct") > 0.5)
  }

  test("passBlockValidation: rescaled identical sources correlate at 1") {
    val espn = Seq((2022, "SEA", 30.0), (2022, "LA", 50.0), (2023, "SEA", 40.0), (2023, "LA", 60.0))
      .toDF("season", "posteam", "pbwr")
    val pff = Seq((2022, "SEA", 55.0), (2022, "LA", 75.0), (2023, "SEA", 60.0), (2023, "LA", 80.0))
      .toDF("season", "team_abbr", "grades_pass_block") // same ordering, shifted scale
    val out = MarketPipelines.passBlockValidation(espn, pff)
      .select("c_cross_source", "n").as[(Double, Long)].head()
    assert(math.abs(out._1 - 1.0) < 1e-9)
    assert(out._2 === 4)
  }

  test("ourladsProjections: dirty-name cleanup, draft coalesce, ranks, contract dedup") {
    val ourlads = Seq(
      ("  dj   humphries ", "ARZ", "LT"), ("orlando brown", "KC", "RT"),
      ("creed humphrey", "KC", "C"), ("rookie tackle", "SEA", "LT")
    ).toDF("player", "current_team", "position_ourlads")
    val grades = Seq( // no grade row for the rookie; one grade-only player
      ("DJ Humphries", 80.0), ("Orlando Brown", 60.0), ("Creed Humphrey", 90.0),
      ("Cut Veteran", 70.0)
    ).toDF("player", "grades_pass_block")
    val draft = Seq(("Rookie Tackle", 88.0)).toDF("player", "draft_pct")
    val contracts = Seq(
      ("Dj Humphries", 15.0), ("Dj Humphries", 15.0), // dup row → distinct
      ("Orlando Brown", 16.0), ("Creed Humphrey", 18.0)
    ).toDF("player", "apy")
    val ranked = MarketPipelines.ourladsRanked(ourlads, grades, draft, contracts)
    val byPlayer = ranked.collect().map(r => r.getString(0) -> r).toMap
    // full outer (:62): the grade-only player survives the join but is
    // dropped by the team filter (:110) — AFTER max_rank is computed over 3 Ts
    assert(!byPlayer.contains("Cut Veteran"))
    // coalesce(grade, draft_pct) (:83): the rookie ranks by draft_pct=88 →
    // rank 1 of the LT/RT "T" group, above Humphries' 80
    assert(byPlayer("Rookie Tackle").getAs[Double]("value") === 88.0)
    assert(byPlayer("Rookie Tackle").getAs[Int]("rank") === 1)
    assert(byPlayer("Dj Humphries").getAs[Int]("rank") === 2)
    assert(byPlayer("Orlando Brown").getAs[String]("position") === "T")
    val out = MarketPipelines.ourladsProjections(ourlads, grades, draft, contracts)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("T").getAs[Long]("n_starters") === 3)
    assert(out("T").getAs[Double]("avg_apy") === 15.5) // rookie has no contract
    assert(out("C").getAs[Long]("n_starters") === 1)
    // team projection: every team gets a scored row, surrogate bounded (20,80)
    val proj = MarketPipelines.ourladsTeamProjection(ranked)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(proj.keySet === Set("ARI", "KC", "SEA"))
    val vt = proj("KC").getAs[Double]("value_t")
    assert(vt > 20.0 && vt < 80.0)
  }

  test("draftCompare: DK line meets ESPN cumulative distribution, diff ranked") {
    val dk = Seq(
      ("QB A", 4.5, 110, 0), ("QB A", 4.5, -130, 1),
      ("QB B", 2.5, -200, 0), ("QB B", 2.5, 170, 1)
    ).toDF("player", "pick", "odds", "under")
    val espn = Seq( // cumulative under-prob at each integer pick slot
      ("QB A", "QB", 1.0, 0.05), ("QB A", "QB", 2.0, 0.15),
      ("QB A", "QB", 3.0, 0.20), ("QB A", "QB", 4.0, 0.25),
      ("QB B", "QB", 1.0, 0.30), ("QB B", "QB", 2.0, 0.35),
      ("QB B", "QB", 3.0, 0.10)
    ).toDF("player", "pos", "espn_pick", "espn_prob")
    val out = MarketPipelines.draftCompare(dk, espn)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("QB A", "QB B"))
    // QB A line 4.5 → espn_pick 4 → cumsum .05+.15+.20+.25 = .65 → 65%
    assert(out("QB A").getAs[Double]("before_espn") === 65.0)
    assert(out("QB A").getAs[Double]("line") === 4.5)
    // diff = espn - dk, both percent scale
    val a = out("QB A")
    assert(math.abs(a.getAs[Double]("diff") -
      (a.getAs[Double]("before_espn") - a.getAs[Double]("before_dk"))) < 1e-9)
  }

  test("draftBoard: two-column padded layout splits odd rows left-heavy") {
    val t = Seq.tabulate(7)(i => (s"P$i", 100.0 - i)).toDF("player", "score")
    val out = MarketPipelines.draftBoard(t, Seq(("score", true)), Seq("player", "score"))
      .orderBy("rank").collect()
    assert(out.length === 4) // ceil(7/2): left side 4 rows, right side 3 + pad
    assert(out(0).getAs[String]("player_a") === "P0")
    assert(out(0).getAs[String]("player_b") === "P4")
    // last row: left P3, right side exhausted → nulls (reference's blank pad)
    assert(out(3).getAs[String]("player_a") === "P3")
    assert(out(3).get(out(3).fieldIndex("player_b")) === null)
    // a sort column outside `keep` must still order the sides (and not leak)
    val slim = MarketPipelines.draftBoard(t, Seq(("score", true)), Seq("player"))
      .orderBy("rank").collect()
    assert(slim(0).getAs[String]("player_a") === "P0")
    assert(!slim.head.schema.fieldNames.contains("score_a"))
  }

  test("draftCompare: a multi-line player must not double-count the espn cumsum") {
    val dk = Seq( // TWO markets for QB A (4.5 and 5.5) — the join fans out
      ("QB A", 4.5, 110, 0), ("QB A", 4.5, -130, 1),
      ("QB A", 5.5, 120, 0), ("QB A", 5.5, -140, 1)
    ).toDF("player", "pick", "odds", "under")
    val espn = Seq(
      ("QB A", "QB", 1.0, 0.05), ("QB A", "QB", 2.0, 0.15),
      ("QB A", "QB", 3.0, 0.20), ("QB A", "QB", 4.0, 0.25),
      ("QB A", "QB", 5.0, 0.10)
    ).toDF("player", "pos", "espn_pick", "espn_prob")
    val rows = MarketPipelines.draftCompare(dk, espn)
      .orderBy("line").collect()
    assert(rows.length === 2) // one row per line
    // cumsum at pick 4 must be .65 (not doubled by the 2-line fan-out)
    assert(rows(0).getAs[Double]("before_espn") === 65.0)
    assert(rows(1).getAs[Double]("before_espn") === 75.0)
  }

  test("TeamNames.normalize maps every defunct franchise abbreviation") {
    val got = Seq("STL", "SD", "OAK", "ARZ", "SEA").toDF("t")
      .select(TeamNames.normalize(col("t"))).as[String].collect().toSeq
    assert(got === Seq("LA", "LAC", "LV", "ARI", "SEA"))
  }

  test("WeekRemap.normalize is season-dependent (17- vs 18-week regular seasons)") {
    import graft.pipelines.WeekRemap
    val got = Seq((2019, 17), (2019, 28), (2019, 32), (2022, 28), (2022, 30), (2022, 32))
      .toDF("season", "w")
      .select(WeekRemap.normalize(col("w"), col("season"))).as[Int].collect().toSeq
    assert(got === Seq(17, 18, 21, 19, 21, 22))
  }
}
