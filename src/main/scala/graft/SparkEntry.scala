package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry is assembled from per-theme modules under `graft.queries`:
  * each module exposes `queries` (name -> (spark, sfDir) => DataFrame) and
  * `oracleSql` (name -> DuckDB SQL over the same parquet tables).
  */
object SparkEntry {
  import graft.{queries => q}

  private def modules: Seq[QueryModule] = Seq(
    q.Relational,
    q.TextOps,
    q.QaPipeline,
    q.DedupQueries,
    q.SimilarityQueries,
    q.AnalysisQueries,
    q.Advanced,
    q.GraphQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full MapReduce QA dataflow (chunk -> map -> filter -> reduce). */
  def entry(spark: SparkSession): DataFrame =
    q.QaPipeline.mapreduceAnswers(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
