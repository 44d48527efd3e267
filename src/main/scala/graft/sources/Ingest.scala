package graft.sources

import graft.operators.Relational
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructType}

import scala.util.{Failure, Success, Try}

/** Non-Parquet sources and sinks (SURVEY.md §2.1) plus the fan-out ingest
  * control flow (§2.10 C1/C4).
  *
  * Fetch-the-bytes is driver-side in the reference (HTTP scrapes); the
  * engine's job starts at "rows exist somewhere" — these helpers make the
  * parse/flatten/clean stages Catalyst plans, never driver loops.
  */
object Ingest {

  /** S3: typed CSV source (`read_csv`,
    * `/root/reference/R/epa_predict.R:26`). Explicit schema — inference
    * costs an extra pass and drifts between runs. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S8: CSV sink (`write_csv`, `/root/reference/R/nfl_draft_espn_dk.R:48`).
    * Single file: these are small presentation exports; large extracts
    * should drop the coalesce and take the directory-of-parts form. */
  def csvSink(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** S4: JSON-lines source with explicit schema
    * (`jsonlite::fromJSON`, `/root/reference/R/espn_wp.R:41-53`). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S4/R3: parse a JSON string column and flatten one nested array-of-
    * structs field (`unnest_wider(outcomes)`,
    * `/root/reference/R/nfl_draft_espn_dk.R:7-11`): parse → explode →
    * struct-expand, all inside codegen. */
  def parseAndExplode(df: DataFrame, jsonCol: String, schema: StructType,
                      arrayField: String): DataFrame = {
    val parsed = df.withColumn("__parsed", from_json(col(jsonCol), schema))
    parsed
      .withColumn("__item", explode(col(s"__parsed.$arrayField")))
      .select(col("*"), col("__item.*"))
      .drop("__parsed", "__item", jsonCol)
  }

  // ---- S5: the generic scraped-table cleanup path ----
  // Every HTML-table ingest in the reference runs the same three steps the
  // moment rows exist: snake_case the headers (`janitor::clean_names()`,
  // `/root/reference/R/preseason_predictiveness.R:12,30`,
  // `/root/reference/pff/6a_ourlads_scrape.R:22`), drop the in-body repeats
  // of the header row (`filter(team != "Team")`,
  // `/root/reference/R/preseason_predictiveness.R:31`), and coerce messy
  // numeric strings ("$7,250", "93%") to numbers (readr parse_number /
  // str_split token grabs, `:15-17`). These make that path one reusable
  // operator instead of per-pipeline hand-rolls.

  /** janitor-style header cleanup: trim, lowercase, `%` → "percent",
    * non-alphanumeric runs → `_`, `x`-prefix names that start with a digit
    * (janitor's `x00`..`x19` columns), dedupe repeats with `_2`, `_3`…
    * Pure metadata — zero plan cost. */
  def cleanNames(df: DataFrame): DataFrame = {
    val base = df.columns.map { c =>
      val b = c.trim.toLowerCase
        .replace("%", " percent ")
        .replaceAll("[^a-z0-9]+", "_")
        .replaceAll("^_+|_+$", "")
      if (b.isEmpty) "x" else if (b.head.isDigit) "x" + b else b
    }
    // suffix repeats, then RE-CHECK: "Team, Team, Team 2" cleans to
    // [team, team, team_2] and a naive counter would mint a second team_2
    val taken = scala.collection.mutable.Set.empty[String]
    val unique = base.map { n =>
      val cand = Iterator.from(1)
        .map(k => if (k == 1) n else s"${n}_$k")
        .find(!taken.contains(_)).get
      taken += cand
      cand
    }
    df.toDF(unique.toIndexedSeq: _*)
  }

  /** readr::parse_number semantics: strip grouping/currency chars, take the
    * first signed decimal token (leading-dot decimals like ".5" and
    * exponent forms like "1e3" / "2.5E-2" included — the cast expands
    * them), null when nothing parses. The guard keeps Spark 4's ANSI mode
    * from raising on junk cells — scraped tables always have some. */
  def parseNumber(c: Column): Column = {
    val tok = regexp_extract(regexp_replace(c, "[,$]", ""),
      "-?(?:[0-9]+(?:\\.[0-9]+)?|\\.[0-9]+)(?:[eE][+-]?[0-9]+)?", 0)
    when(length(tok) > 0, tok.cast(DoubleType))
  }

  /** The `filter(team != "Team")` idiom generalized: scraped tables repeat
    * their header inside the body on page breaks; keep only rows whose key
    * column actually parses as a number. */
  def dropJunkRows(df: DataFrame, keyCol: Column): DataFrame =
    df.filter(parseNumber(keyCol).isNotNull)

  /** C1 + C4: error-tolerant fan-out ingest — map a parameter list through a
    * per-item loader, drop failures, union the successes by name
    * (`map_df` + `tryCatch` returning an empty frame,
    * `/root/reference/R/espn_wp.R:38-62`). Returns the union plus the
    * failed items for QA.
    *
    * By default the Try guards plan CONSTRUCTION only (missing path, bad
    * schema); a corrupt file that fails at execution time would still sink
    * the whole union. `validateEager = true` forces a one-row read per
    * item, trading one tiny job per item for true per-item isolation —
    * the reference's per-item tryCatch semantics. */
  def tolerantFanOut[T](items: Seq[T], validateEager: Boolean = false)(
      load: T => DataFrame): (Option[DataFrame], Seq[(T, Throwable)]) = {
    val attempts = items.map { i =>
      i -> Try {
        val df = load(i)
        if (validateEager) df.limit(1).collect()
        df
      }
    }
    val oks = attempts.collect { case (_, Success(df)) => df }
    val fails = attempts.collect { case (i, Failure(e)) => (i, e) }
    (if (oks.isEmpty) None else Some(Relational.unionPad(oks)), fails)
  }
}
