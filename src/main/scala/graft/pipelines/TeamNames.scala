package graft.pipelines

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Franchise-abbreviation normalization — the engine form of nflfastR's
  * internal `team_name_fn` (applied at `/root/reference/pff/0_scrape.R:57`,
  * `/root/reference/R/preseason_predictiveness.R:63`,
  * `/root/reference/pff/99_passblock_piece.R:53`).
  *
  * A literal `when` ladder (not a UDF, not a join): Catalyst folds it into
  * codegen, and at 100 TB a 10-entry branch beats a broadcast-join against
  * a 10-row dim for a column this hot.
  */
object TeamNames {
  /** Relocated/renamed franchises → current abbreviation. */
  val remap: Seq[(String, String)] = Seq(
    "STL" -> "LA", "LAR" -> "LA", "SD" -> "LAC", "OAK" -> "LV",
    "ARZ" -> "ARI", "BLT" -> "BAL", "CLV" -> "CLE", "HST" -> "HOU",
    "SL" -> "LA", "JAC" -> "JAX")

  def normalize(team: Column): Column =
    remap.foldRight(team) { case ((from, to), acc) =>
      when(team === from, lit(to)).otherwise(acc)
    }
}

/** Playoff-week normalization — the reference's raw-feed week codes
  * (`/root/reference/pff/0_scrape.R:59-67`): playoff rounds arrive as
  * 28/29/30 (+32 = Super Bowl) and must land after the regular season,
  * whose length changed in 2021 (17 → 18 weeks): pre-2021 seasons map
  * 28..30 → 18..20 and 32 → 21; 2021+ map 28..30 → 19..21 and 32 → 22.
  * Same codegen'd when-ladder shape as [[TeamNames]]. */
object WeekRemap {
  def normalize(week: Column, season: Column): Column =
    when(season < 2021 && week.between(28, 30), week - 10)
      .when(season < 2021 && week === 32, lit(21))
      .when(season >= 2021 && week.between(28, 30), week - 9)
      .when(season >= 2021 && week === 32, lit(22))
      .otherwise(week)
}
