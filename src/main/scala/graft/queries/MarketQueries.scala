package graft.queries

import graft.Tables
import graft.functions.RSemantics._
import graft.pipelines.MarketPipelines
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Oracle-backed coverage for the betting-market / roster-projection
  * pipelines (`/root/reference/R/nfl_draft_espn_dk.R`,
  * `/root/reference/darko/2_ourlads_projections.R`) — the full DAGs driven
  * end-to-end against DuckDB, not just unit-tested.
  *
  * The reference's sources are scraped odds/depth-chart tables; the
  * driver's tables are TPC-H-ish, so each source is SYNTHESIZED
  * deterministically with exact integer arithmetic both engines reproduce
  * bit-for-bit. Doubles only enter through (a) single correctly-rounded
  * divisions of exact values, (b) running sums over an explicit ROWS frame
  * (identical accumulation order both engines), and (c) the de-vig
  * pow/ln fixed point, which both sides round at 4 dp at the output
  * boundary (the c2_devig_fixpoint precedent).
  */
object MarketQueries {

  // ---- synthetic sources (Spark side) ----

  /** DK-style draft odds: 2 outcomes (over/under) per player at a
    * half-point line. Odds are exact ints; lines are k + 0.5 (dyadic). */
  private def synthDk(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .filter(col("s_suppkey") <= 50)
      .select(
        concat(lit("D"), col("s_suppkey")).as("player"),
        ((col("s_suppkey") % 3).cast(DoubleType) + 1.5).as("pick"),
        explode(array(
          struct(lit(0).as("under"),
            (lit(100) + (col("s_suppkey") * 7) % 150).cast(IntegerType).as("odds")),
          struct(lit(1).as("under"),
            (-(lit(110) + (col("s_suppkey") * 11) % 120)).cast(IntegerType).as("odds"))))
          .as("ou"))
      .select(col("player"), col("pick"), col("ou.under").as("under"), col("ou.odds").as("odds"))

  /** ESPN-style pick distribution: one probability per (player, integer
    * pick slot), unique by construction (player = key mod 50, slot =
    * key div 50 + 1). Probabilities are exact-int / 1000.0 — one
    * correctly-rounded division, identical in both engines. */
  private def synthEspn(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        concat(lit("D"), col("p_partkey") % 50).as("player"),
        concat(lit("P"), col("p_partkey") % 4).as("pos"),
        (expr("p_partkey div 50") + 1).cast(DoubleType).as("espn_pick"),
        (((col("p_partkey") * 13) % 97) / lit(1000.0)).as("espn_prob"))

  private val dkBaseSql =
    """SELECT 'D' || CAST(s_suppkey AS VARCHAR) AS player,
      |  CAST(s_suppkey % 3 AS DOUBLE) + 1.5 AS pick, u.under,
      |  CASE WHEN u.under = 0 THEN 100 + (s_suppkey * 7) % 150
      |       ELSE -(110 + (s_suppkey * 11) % 120) END AS odds
      |FROM supplier CROSS JOIN (SELECT 0 AS under UNION ALL SELECT 1) u
      |WHERE s_suppkey <= 50""".stripMargin

  /** The 10-iteration per-player de-vig replay (operator C2's oracle shape:
    * seed with implied probability, then fold the power re-scale). */
  private val dkDevigSql: String = {
    val seed =
      s"""SELECT player, pick, under,
         |  CASE WHEN odds < 0 THEN -odds / (-odds + 100.0)
         |       ELSE 100.0 / (odds + 100.0) END AS pct
         |FROM ($dkBaseSql) dk_base""".stripMargin
    (1 to 10).foldLeft(seed) { (sql, i) =>
      s"""SELECT player, pick, under, POW(pct, LN(2.0) / LN(2.0 / tot)) AS pct
         |FROM (SELECT player, pick, under, pct,
         |        SUM(pct) OVER (PARTITION BY player) AS tot
         |      FROM ($sql) it$i) s$i""".stripMargin
    }
  }

  /** c2b: the full DK-vs-ESPN comparison (`nfl_draft_espn_dk.R:52-119`) —
    * de-vigged under-probability at each player's line vs ESPN's cumulative
    * pick distribution at the same cut, percent-scaled and diffed. */
  private val c2bDraftCompare = Q(
    (s, d) => MarketPipelines.draftCompare(synthDk(s, d), synthEspn(s, d))
      .orderBy("player"),
    s"""WITH dkwide AS (
       |  SELECT player, pick AS pick_dk,
       |         MAX(CASE WHEN under = 1 THEN pct END) AS under_pct
       |  FROM ($dkDevigSql) devigged GROUP BY player, pick),
       |espn AS (
       |  SELECT 'D' || CAST(p_partkey % 50 AS VARCHAR) AS player,
       |         'P' || CAST(p_partkey % 4 AS VARCHAR) AS pos,
       |         CAST((p_partkey // 50) + 1 AS DOUBLE) AS espn_pick,
       |         ((p_partkey * 13) % 97) / 1000.0 AS espn_prob
       |  FROM part),
       |espn_cum AS (
       |  -- cumsum pre-join, mirroring the pipeline (a multi-line player
       |  -- would otherwise double-count through the join fan-out)
       |  SELECT player, pos, espn_pick,
       |         SUM(espn_prob) OVER (PARTITION BY player ORDER BY espn_pick
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tot_espn
       |  FROM espn),
       |cum AS (
       |  SELECT player, pos, espn_pick, pick_dk, under_pct, tot_espn
       |  FROM espn_cum LEFT JOIN dkwide USING (player))
       |SELECT player, pos, pick_dk AS line,
       |  ROUND(under_pct * 100, 4) AS before_dk,
       |  ROUND(tot_espn * 100, 4) AS before_espn,
       |  ROUND(tot_espn * 100, 4) - ROUND(under_pct * 100, 4) AS diff
       |FROM cum WHERE espn_pick = pick_dk - 0.5
       |ORDER BY player""".stripMargin)

  // ---- ourlads projection sources ----
  // Names are "P<k>" (initcap-invariant, so the Spark-side scraped-name
  // cleanup is the identity and DuckDB — which has no initcap — can replay
  // the pipeline 1:1). Grades only on odd keys, draft percentages on keys
  // <= 120: even-keyed depth players exercise the coalesce(grade,
  // draft_pct) rookie path; grade keys beyond the roster exercise the
  // full-outer join's grade-only side.

  private def synthOurlads(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).select(
      concat(lit("P"), col("s_suppkey")).as("player"),
      concat(lit("T"), col("s_suppkey") % 8).as("current_team"),
      element_at(
        array(lit("LT"), lit("RT"), lit("LG"), lit("RG"), lit("C"), lit("TE")),
        (col("s_suppkey") % 6).cast(IntegerType) + 1).as("position_ourlads"))

  private def synthGrades(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_custkey") <= 150 && col("c_custkey") % 2 === 1)
      .select(
        concat(lit("P"), col("c_custkey")).as("player"),
        ((col("c_custkey") * 17) % 89 + 10).cast(DoubleType).as("grades_pass_block"))

  private def synthDraft(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_partkey") <= 120)
      .select(
        concat(lit("P"), col("p_partkey")).as("player"),
        ((col("p_partkey") * 7) % 50 + 25).cast(DoubleType).as("draft_pct"))

  private def synthContracts(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_custkey") <= 80)
      .select(
        concat(lit("P"), col("c_custkey")).as("player"),
        (col("c_custkey") % 40 + 10).cast(DoubleType).as("apy"))

  /** Shared oracle CTE chain replaying ourladsRanked
    * (`2_ourlads_projections.R:30-113,458-467`): full-outer ids join,
    * draft coalesce, T/G position grouping, rank + group size per position
    * (max(rank) ≡ count(*) over the partition), percentile normalization as
    * a raw IEEE division, THEN the team filter, then contracts. */
  private val rankedSql =
    """ourlads AS (
      |  SELECT 'P' || CAST(s_suppkey AS VARCHAR) AS player,
      |         'T' || CAST(s_suppkey % 8 AS VARCHAR) AS team,
      |         (['LT','RT','LG','RG','C','TE'])[(s_suppkey % 6) + 1] AS position_ourlads
      |  FROM supplier),
      |grades AS (
      |  SELECT 'P' || CAST(c_custkey AS VARCHAR) AS player,
      |         CAST((c_custkey * 17) % 89 + 10 AS DOUBLE) AS grade
      |  FROM customer WHERE c_custkey <= 150 AND c_custkey % 2 = 1),
      |draft AS (
      |  SELECT 'P' || CAST(p_partkey AS VARCHAR) AS player,
      |         CAST((p_partkey * 7) % 50 + 25 AS DOUBLE) AS draft_pct
      |  FROM part WHERE p_partkey <= 120),
      |contracts AS (
      |  SELECT 'P' || CAST(c_custkey AS VARCHAR) AS player,
      |         CAST(c_custkey % 40 + 10 AS DOUBLE) AS apy
      |  FROM customer WHERE c_custkey <= 80),
      |valued AS (
      |  SELECT COALESCE(o.player, g.player) AS player, o.team,
      |         o.position_ourlads,
      |         COALESCE(g.grade, dr.draft_pct) AS value,
      |         CASE WHEN o.position_ourlads IN ('LT','RT') THEN 'T'
      |              WHEN o.position_ourlads IN ('LG','RG') THEN 'G'
      |              ELSE COALESCE(o.position_ourlads, 'UNK') END AS position
      |  FROM ourlads o
      |  FULL OUTER JOIN grades g ON o.player = g.player
      |  LEFT JOIN draft dr ON COALESCE(o.player, g.player) = dr.player),
      |ranked AS (
      |  SELECT player, team, position_ourlads, position, value,
      |         ROW_NUMBER() OVER (PARTITION BY position
      |           ORDER BY value DESC NULLS LAST, player ASC) AS rank,
      |         COUNT(*) OVER (PARTITION BY position) AS max_rank
      |  FROM valued),
      |kept AS (
      |  SELECT r.*, c.apy,
      |         100.0 * (1 + max_rank - rank) / max_rank AS pct_normed
      |  FROM ranked r LEFT JOIN contracts c ON r.player = c.player
      |  WHERE r.team IS NOT NULL)""".stripMargin

  /** c3: per-position quantile summary (`:508-524`) over the coalesced
    * player value — exact interpolating percentile (R type-7 ≡ DuckDB
    * quantile_cont), contract average, group size. */
  private val c3OurladsSummary = Q(
    (s, d) => {
      val ranked = MarketPipelines.ourladsRanked(
        synthOurlads(s, d), synthGrades(s, d), synthDraft(s, d), synthContracts(s, d))
      MarketPipelines.ourladsPositionSummary(ranked)
        .select(
          col("position"),
          stat4(col("value_quantiles").getItem(0)).as("q20"),
          stat4(col("value_quantiles").getItem(1)).as("q50"),
          stat4(col("value_quantiles").getItem(2)).as("q80"),
          // integer-valued apy: the sum is exact in double, so the single
          // closing division is bit-identical both engines — no rounding
          col("avg_apy"),
          col("n_starters"))
        .orderBy("position")
    },
    s"""WITH $rankedSql
       |SELECT position,
       |  ROUND(CAST(quantile_cont(value, 0.2) AS DOUBLE), 4) AS q20,
       |  ROUND(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS q50,
       |  ROUND(CAST(quantile_cont(value, 0.8) AS DOUBLE), 4) AS q80,
       |  AVG(apy) AS avg_apy,
       |  COUNT(*) AS n_starters
       |FROM kept GROUP BY position ORDER BY position""".stripMargin)

  /** c3b: the model stage (`:123-139`) — per-(team, tackle-vs-interior)
    * mean normalized rank pivoted wide, scored by the deterministic
    * logistic surrogate standing in for the two `predict.gam` calls. */
  private val c3bTeamProjection = Q(
    (s, d) => {
      val ranked = MarketPipelines.ourladsRanked(
        synthOurlads(s, d), synthGrades(s, d), synthDraft(s, d), synthContracts(s, d))
      MarketPipelines.ourladsTeamProjection(ranked)
    },
    s"""WITH $rankedSql,
       |proj AS (
       |  SELECT team,
       |    ROUND(AVG(CASE WHEN position_ourlads IN ('LT','RT')
       |                   THEN pct_normed END), 4) AS pct_t,
       |    -- IS NULL arm: the pipeline's otherwise("GC") buckets a null
       |    -- position into GC (as the reference's case_when TRUE ~ "GC"
       |    -- does); a bare NOT IN would silently drop those rows
       |    ROUND(AVG(CASE WHEN position_ourlads IS NULL
       |                     OR position_ourlads NOT IN ('LT','RT')
       |                   THEN pct_normed END), 4) AS pct_gc
       |  FROM kept GROUP BY team)
       |SELECT team, pct_t, pct_gc,
       |  ROUND(20.0 + 60.0 / (1.0 + EXP(-(pct_t - 50.0) / 10.0)), 4) AS value_t,
       |  ROUND(20.0 + 60.0 / (1.0 + EXP(-(pct_gc - 50.0) / 10.0)), 4) AS value_gc
       |FROM proj ORDER BY team""".stripMargin)

  val all: Map[String, Q] = Map(
    "c2b_draft_compare" -> c2bDraftCompare,
    "c3_ourlads_summary" -> c3OurladsSummary,
    "c3b_team_projection" -> c3bTeamProjection)
}
