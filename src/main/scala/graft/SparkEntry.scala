package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. As-of-joined, transformer-pipelined feature table over the
    * synthetic image+caption table (BASELINE.json north_star).
    */
  def entry(spark: SparkSession): DataFrame =
    Flagship.features(spark, nImages = 200, eventsPerImage = 5)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.allQueries ++ QueriesTemporal.queries ++
      QueriesData.queries ++ QueriesStreaming.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    QueriesCore.oracles ++ QueriesTemporal.oracles ++
      QueriesData.oracles ++ QueriesStreaming.oracles
}
