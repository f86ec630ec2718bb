package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Parquet/Iceberg scan pruning works off per-file (and row-group)
  * min/max column stats. A table sorted by ONE column prunes filters
  * on that column only; filters on any other dimension scan
  * everything. Interleaving the bits of several range-bucketized
  * columns into one int64 sort key and laying the table out in that
  * order gives every file a tight bounding box in EVERY interleaved
  * dimension — the standard Z-order layout lever (Iceberg
  * `rewrite_data_files(strategy => 'sort', sort_order => zorder(...))`,
  * Delta OPTIMIZE ZORDER BY) for 100 TB tables whose queries filter on
  * multiple dimensions.
  *
  * Everything here is deterministic integer bit math on top of a tiny
  * per-column (min, max) agg — codegen'd end to end, and recomputable
  * by any engine (the q118 oracle re-derives the z-values in SQL).
  */
object Layout {

  /** Bucket a value into [0, 2^bits) over [mn, mx]: floor of the
    * affine map, clamped; constant columns (mx == mn) bucket to 0.
    * Nulls bucket to 0 (they sort first, like NULLS FIRST).
    */
  def bucketize(v: Column, mn: Double, mx: Double, bits: Int): Column = {
    val levels = 1L << bits
    val width = (mx - mn) / levels
    val b =
      if (width == 0) lit(0L)
      else least(greatest(
        floor((v.cast("double") - lit(mn)) / lit(width)).cast("long"),
        lit(0L)), lit(levels - 1))
    coalesce(b, lit(0L))
  }

  /** Interleave `bits` bits of each bucket column: bit l of dimension d
    * lands at position l * k + d. A fold of shift/mask/or terms —
    * whole-stage codegen keeps it one straight-line integer kernel.
    */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val k = buckets.size
    require(k >= 1, "interleave needs at least one column")
    require(bits * k <= 63, s"bits=$bits x $k dims exceeds int64")
    val terms = for {
      l <- 0 until bits
      (b, d) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, l).bitwiseAND(lit(1L)), l * k + d)
    terms.reduce(_.bitwiseOR(_)).cast("long")
  }

  /** Z-value column for `cols` given fixed per-column (min, max)
    * ranges. Ranges are explicit so the mapping is stable across
    * batches/snapshots — re-layouts and incremental writes bucketize
    * identically (pass the table-level ranges, not the batch's).
    */
  def zValue(cols: Seq[Column], ranges: Seq[(Double, Double)],
      bits: Int): Column =
    interleave(cols.zip(ranges).map { case (c, (mn, mx)) =>
      bucketize(c, mn, mx, bits) }, bits)

  /** Per-column (min, max) ranges in one tiny agg — shared by
    * [[zorder]] and [[SnapshotStore.rewriteSnapshot]] so the range
    * rule cannot drift between the two layout paths. All-null /
    * empty columns range to (0, 0) (every row buckets to 0).
    */
  def rangesOf(df: DataFrame, cols: Seq[String])
      : Seq[(Double, Double)] = {
    // NaN must not reach min/max: Spark orders NaN greatest, so one
    // NaN row would make mx (hence width) NaN and silently bucket the
    // WHOLE dimension to 0 — the clustering the maintenance job was
    // run for would quietly not happen
    def noNan(c: String) = {
      val d = col(c).cast("double")
      when(isnan(d), lit(null).cast("double")).otherwise(d)
    }
    val aggs = cols.flatMap(c => Seq(
      min(noNan(c)).as(s"__mn_$c"),
      max(noNan(c)).as(s"__mx_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      (Option(r.getAs[java.lang.Double](2 * i)).map(_.toDouble)
         .getOrElse(0.0),
       Option(r.getAs[java.lang.Double](2 * i + 1)).map(_.toDouble)
         .getOrElse(0.0))
    }
  }

  /** Cluster `df` by the Z-order of `cols`: one tiny (min, max) agg
    * per column, then range-repartition + intra-partition sort on the
    * z-value, so each output file covers a compact hyper-rectangle.
    * Returns the frame WITH the `__z` column (drop it after writing if
    * unwanted — keeping it costs 8 bytes and documents the layout).
    */
  def zorder(df: DataFrame, cols: Seq[String], bits: Int = 12,
      numPartitions: Int = 0): DataFrame = {
    val ranges = rangesOf(df, cols)
    val z = zValue(cols.map(col), ranges, bits)
    val withZ = df.withColumn("__z", z)
    val parts =
      if (numPartitions > 0) numPartitions
      else math.max(1,
        df.sparkSession.sessionState.conf.numShufflePartitions)
    withZ.repartitionByRange(parts, col("__z"))
      .sortWithinPartitions(col("__z"))
  }
}
