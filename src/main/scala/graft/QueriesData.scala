package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data pipeline ops (dedup, similarity, text analysis,
  * multimodal) over documents/embeddings — filled in milestone 5.
  */
object QueriesData {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map.empty
  val oracles: Map[String, String] = Map.empty
}
