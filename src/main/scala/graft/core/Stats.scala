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
    val grouped = df
      .filter(col(value).isNotNull)
      .groupBy(col(value).cast("double").as("v"))
      .agg(sum(weight.cast("double")).as("w"))
    val wTot = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val hit = grouped
      .select(col("v"),
        (sum(col("w")).over(wTot) / sum(col("w")).over(all)).as("frac"))
      .filter(col("frac") >= 0.5)
      .agg(min(col("v")))
      .head()
    if (hit.isNullAt(0)) None else Some(hit.getDouble(0))
  }

  /** Exact weighted quantiles with np.interp semantics
    * (tubular/capping.py:335-452): cumulative weight fraction
    * f_i = cumsum(w)/sum(w) over values sorted ascending; quantile q is
    * linearly interpolated between bracketing (f_i, v_i) pairs, clamped
    * to the first/last value outside [f_1, 1].
    *
    * Scale note: duplicates collapse via groupBy(value) before the
    * global cumulative window, so the windowed stage sees distinct
    * values only. For extreme-cardinality columns callers can pre-round
    * or switch to percentile_approx; correctness tests use this exact
    * path.
    */
  def weightedQuantiles(
      df: DataFrame, value: String, weight: Column,
      quantiles: Seq[Double]): Seq[Option[Double]] = {
    require(quantiles.forall(q => q >= 0 && q <= 1),
      s"quantiles must be in [0,1], got $quantiles")
    val grouped = df
      .filter(col(value).isNotNull && weight =!= 0)
      .groupBy(col(value).cast("double").as("v"))
      .agg(sum(weight.cast("double")).as("w"))
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val fv = grouped
      .select(col("v"),
        (sum(col("w")).over(cum) / sum(col("w")).over(all)).as("f"))
    // For each quantile, pull only the two bracketing rows (distributed
    // min/max aggregations) instead of collecting the whole CDF.
    val aggs = quantiles.zipWithIndex.flatMap { case (q, i) =>
      Seq(
        max(when(col("f") <= q, col("f"))).as(s"f_lo_$i"),
        max(when(col("f") <= q, col("v"))).as(s"v_lo_$i"),
        min(when(col("f") >= q, col("f"))).as(s"f_hi_$i"),
        min(when(col("f") >= q, col("v"))).as(s"v_hi_$i"))
    }
    val row = fv.agg(aggs.head, aggs.tail: _*).head()
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
