package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A declared engine query: the Spark implementation plus (optionally) the
    * equivalent ANSI SQL the driver runs in DuckDB as the correctness oracle.
    * Queries without SQL-expressible semantics omit the oracle (rows-only
    * check). Column names and output ordering must match the oracle exactly.
    */
  final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

  object Q {
    def apply(fn: (SparkSession, String) => DataFrame, sql: String): Q = Q(fn, Some(sql))
  }
}
