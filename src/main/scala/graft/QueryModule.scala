package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A theme-grouped set of engine queries plus their DuckDB oracles.
  * `SparkEntry` unions all modules into the driver-facing registry. */
trait QueryModule {
  /** name -> (spark, sfDir) => result */
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** name -> DuckDB SQL over the same parquet tables (subset of `queries`
    * keys; missing keys get a weaker rows-only check from the driver). */
  def oracleSql: Map[String, String]
}
