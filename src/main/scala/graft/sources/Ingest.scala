package graft.sources

import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
