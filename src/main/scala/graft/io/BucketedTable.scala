package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style bucketed managed tables — the co-location primitive for
  * repeated big joins/aggregations on a stable key.
  *
  * A table written with `bucketBy(n, key)` carries its partitioning in
  * the catalog: joins and aggregations on `key` between tables bucketed
  * the same way plan with NO Exchange on either side (the scan itself
  * satisfies the required hash distribution), and `sortBy(key)` inside
  * buckets lets sort-merge join skip the sort too. At 100 TB this turns
  * every repeated entity-keyed join (events x features x metadata) from
  * a full shuffle of both sides into a local zip of co-located buckets
  * — the same contract Iceberg bucket-partition transforms provide.
  *
  * Complements [[SnapshotStore]] (path-based, snapshot/lineage-first):
  * use the store for checkpointed, resumable, time-traveling writes,
  * and bucketed tables for hot join keys queried many times.
  */
object BucketedTable {

  /** Write `df` as a bucketed+sorted managed parquet table.
    *
    * The explicit repartition on the bucket key matters twice over:
    * without it every input partition writes its own file into every
    * bucket (P x nBuckets small files at scale), and Spark only
    * reports per-bucket SORT order to the scan when a bucket holds AT
    * MOST one file. Note the sort-order report additionally sits
    * behind `spark.sql.legacy.bucketedTableScan.outputOrdering`
    * (default FALSE since Spark 3.0 — reporting it forces
    * single-threaded per-bucket reads, usually a bad trade): the
    * EXCHANGE elimination is unconditional, the SORT elimination is
    * opt-in via that conf, and this writer's one-file-per-bucket
    * layout is what makes the opt-in actually legal.
    */
  def write(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit =
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
