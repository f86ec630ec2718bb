package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data-quality profile — the "is this table fit to
  * train on" report a pipeline runs before fitting anything: row
  * coverage, null rate, and exact distinct cardinality per column,
  * in ONE melted pass (the same melt shape as the imputers' fit).
  */
object Profile {

  /** One row per profiled column: `(column, n, n_null, n_distinct,
    * null_rate)`. Values are compared as strings (a profile cares
    * about presence/cardinality, not arithmetic), so any column type
    * melts into the same frame. `n_distinct` is EXACT (nulls not
    * counted as a distinct value — they are reported separately):
    * the melt exchanges (column, value) pairs, so cost scales with
    * Σ per-column distinct counts; for web-scale free-text columns
    * prefer the HLL sketch ([[graft.core.Hll]], q157) and treat this
    * as the exact gate for bounded-cardinality feature columns.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile: need >= 1 column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columnProfile: missing columns $missing")
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("__v")))
        : _*)).as("kv"))
      .select(col("kv.column").as("column"), col("kv.__v").as("__v"))
    melted.groupBy(col("column"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__v").isNull, lit(1L)).otherwise(lit(0L)))
          .as("n_null"),
        count_distinct(col("__v")).as("n_distinct"))
      .withColumn("null_rate",
        col("n_null").cast("double") / col("n"))
  }
}
