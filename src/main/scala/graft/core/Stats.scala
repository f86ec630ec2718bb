package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Weighted statistics as Catalyst expressions
  * (reference tubular/_stats.py, tubular/capping.py:335-452).
  *
  * All fits run as ONE distributed aggregation job; only scalar results
  * cross to the driver.
  */
object Stats {

  /** Weighted mean ignoring null values:
    * sum(w*x | x not null) / sum(w | x not null)
    * (tubular/_stats.py:54-131).
    */
  def weightedMean(x: Column, w: Column): Column =
    sum(when(x.isNotNull, w.cast("double") * x.cast("double"))) /
      sum(when(x.isNotNull, w.cast("double")))

  /** Weighted mean with the weight-validity predicate folded into the
    * aggregate (instead of a pre-filter), so several fits can share one
    * unfiltered scan (AggFittable fusion).
    */
  def weightedMeanWhere(x: Column, w: Column, valid: Column): Column =
    sum(when(valid && x.isNotNull, w.cast("double") * x.cast("double"))) /
      sum(when(valid && x.isNotNull, w.cast("double")))

  /** Weighted median: minimum value whose cumulative weight fraction
    * (ordered by value) reaches 0.5 (tubular/_stats.py:5-51).
    * Distributed: groupBy(value) collapses duplicates first, so the
    * global cumulative window runs over distinct values only.
    */
  def weightedMedian(df: DataFrame, value: String, weight: Column): Column = {
    // returned as a literal column after a distributed job + tiny collect
    lit(weightedMedianValue(df, value, weight).orNull)
  }

  def weightedMedianValue(
      df: DataFrame, value: String, weight: Column): Option[Double] = {
    val (fv, cleanup) = cumFractions(df, value, weight, minWeightExcl = false)
    try {
      val hit = fv.filter(col("f") >= 0.5).agg(min(col("v"))).head()
      if (hit.isNullAt(0)) None else Some(hit.getDouble(0))
    } finally cleanup()
  }

  /** Weighted medians of SEVERAL columns in one distributed pass:
    * melt to (column, value, weight) rows, run the keyed cumulative
    * fraction, take min v with f >= 0.5 per column. One job for k
    * columns instead of k jobs.
    */
  def weightedMediansMelted(df: DataFrame, columns: Seq[String],
      weight: Column): Map[String, Option[Double]] = {
    val pair = explode(array(columns.map(c =>
      struct(lit(c).as("k"), col(c).cast("double").as("v"))): _*))
    val pairs = df.select(pair.as("p"), weight.cast("double").as("w"))
      .filter(col("p.v").isNotNull)
      .select(col("p.k").as("k"), col("p.v").as("v"), col("w"))
    val (fv, cleanup) = keyedCumFractions(pairs)
    try {
      val hits = fv.filter(col("f") >= 0.5)
        .groupBy(col("k")).agg(min(col("v")).as("med"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      columns.map(c => c -> hits.get(c)).toMap
    } finally cleanup()
  }

  /** Keyed variant of [[cumFractions]]: input (k, v, w) rows; output
    * (k, v, f) with f the cumulative weight fraction WITHIN key k,
    * ordered by v. Same range-partition + per-partition prefix + offset
    * shape, with (key, partition) offsets and per-key totals broadcast
    * as literal maps.
    */
  private[graft] def keyedCumFractions(pairs: DataFrame)
      : (DataFrame, () => Unit) = {
    val parts = math.max(1,
      pairs.sparkSession.sessionState.conf.numShufflePartitions)
    val ranged = pairs
      .groupBy(col("k"), col("v")).agg(sum(col("w")).as("w"))
      .repartitionByRange(parts, col("k"), col("v"))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partTotals = ranged.groupBy(col("k"), col("__pid"))
      .agg(sum(col("w")).as("pw"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val totals = partTotals.groupBy(_._1)
      .map { case (k, a) => k -> a.map(_._3).sum }
    val offsets = partTotals.groupBy(_._1).toSeq.flatMap { case (k, a) =>
      val sorted = a.sortBy(_._2)
      sorted.map(_._2).zip(
        sorted.map(_._3).scanLeft(0.0)(_ + _).init)
        .map { case (pid, off) => s"$k#$pid" -> off }.toSeq
    }.toMap
    if (partTotals.isEmpty)
      return (ranged.select(col("k"), col("v"), lit(0.0).as("f")),
        () => { ranged.unpersist(false); () })
    val offCol = coalesce(element_at(typedLit(offsets),
      concat_ws("#", col("k"), col("__pid"))), lit(0.0))
    val totCol = element_at(typedLit(totals), col("k"))
    val wPart = Window.partitionBy(col("k"), col("__pid"))
      .orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fv = ranged.select(col("k"), col("v"),
      ((sum(col("w")).over(wPart) + offCol) / totCol).as("f"))
    (fv, () => { ranged.unpersist(false); () })
  }

  /** Distributed cumulative weight fraction per distinct value:
    * `(v, f)` with `f = cumsum(w ordered by v) / sum(w)`.
    *
    * Scale shape (no global single-partition window):
    *   1. groupBy(v) collapses duplicates (map-side combine);
    *   2. repartitionByRange(v) — range partitions are ascending in v;
    *   3. per-partition totals (tiny collect) become broadcast prefix
    *      offsets;
    *   4. a Window.partitionBy(partition id).orderBy(v) running sum +
    *      the partition's offset = the global cumulative sum, with
    *      every stage distributed.
    */
  private[graft] def cumFractions(df: DataFrame, value: String,
      weight: Column, minWeightExcl: Boolean)
      : (DataFrame, () => Unit) = {
    val base = df.filter(col(value).isNotNull &&
      (if (minWeightExcl) weight =!= 0 else lit(true)))
      .groupBy(col(value).cast("double").as("v"))
      .agg(sum(weight.cast("double")).as("w"))
    val parts = math.max(1,
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val ranged = base
      .repartitionByRange(parts, col("v"))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition totals -> ascending-pid prefix offsets (range
    // partitioning is order-preserving across partition ids)
    val partTotals = ranged.groupBy(col("__pid"))
      .agg(sum(col("w")).as("pw"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
      .sortBy(_._1)
    val total = partTotals.map(_._2).sum
    val offsets = partTotals
      .scanLeft((0, 0.0)) { case ((_, acc), (pid, pw)) => (pid, acc + pw) }
      .sliding(2).collect { case Array((_, acc), (pid, _)) => pid -> acc }
      .toMap
    val offCol =
      if (offsets.isEmpty) lit(0.0)
      else coalesce(
        element_at(typedLit(offsets), col("__pid")), lit(0.0))
    val wPart = Window.partitionBy(col("__pid")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fv = ranged.select(col("v"),
      ((sum(col("w")).over(wPart) + offCol) / lit(total)).as("f"))
    (fv, () => { ranged.unpersist(false); () })
  }

  /** Exact weighted quantiles with np.interp semantics
    * (tubular/capping.py:335-452): cumulative weight fraction
    * f_i = cumsum(w)/sum(w) over values sorted ascending; quantile q is
    * linearly interpolated between bracketing (f_i, v_i) pairs, clamped
    * to the first/last value outside [f_1, 1].
    *
    * Scale note: duplicates collapse via groupBy(value), and the
    * cumulative sum runs as range-partitioned per-partition prefix sums
    * with broadcast offsets (see cumFractions) — no single-partition
    * stage anywhere, so the exact path holds at full cardinality.
    */
  def weightedQuantiles(
      df: DataFrame, value: String, weight: Column,
      quantiles: Seq[Double]): Seq[Option[Double]] = {
    require(quantiles.forall(q => q >= 0 && q <= 1),
      s"quantiles must be in [0,1], got $quantiles")
    val (fv, cleanup) = cumFractions(df, value, weight,
      minWeightExcl = true)
    // For each quantile, pull only the two bracketing rows (distributed
    // min/max aggregations) instead of collecting the whole CDF.
    val aggs = quantiles.zipWithIndex.flatMap { case (q, i) =>
      Seq(
        max(when(col("f") <= q, col("f"))).as(s"f_lo_$i"),
        max(when(col("f") <= q, col("v"))).as(s"v_lo_$i"),
        min(when(col("f") >= q, col("f"))).as(s"f_hi_$i"),
        min(when(col("f") >= q, col("v"))).as(s"v_hi_$i"))
    }
    val row =
      try fv.agg(aggs.head, aggs.tail: _*).head()
      finally cleanup()
    quantiles.indices.map { i =>
      val fLo = Option(row.getAs[java.lang.Double](s"f_lo_$i")).map(_.toDouble)
      val vLo = Option(row.getAs[java.lang.Double](s"v_lo_$i")).map(_.toDouble)
      val fHi = Option(row.getAs[java.lang.Double](s"f_hi_$i")).map(_.toDouble)
      val vHi = Option(row.getAs[java.lang.Double](s"v_hi_$i")).map(_.toDouble)
      (fLo, vLo, fHi, vHi) match {
        case (None, None, None, None) => None // no valid rows
        case (None, _, _, Some(v)) => Some(v) // q below first cum frac
        case (_, Some(v), None, _) => Some(v) // q above last (==1) frac
        case (Some(fl), Some(vl), Some(fh), Some(vh)) =>
          if (fh == fl) Some(vl)
          else Some(vl + (quantiles(i) - fl) / (fh - fl) * (vh - vl))
        case _ => None
      }
    }
  }
}
