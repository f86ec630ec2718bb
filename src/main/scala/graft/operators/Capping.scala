package graft.operators

import graft.core.{Stats, Transformer, Weights}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Capping / out-of-range-null (reference tubular/capping.py).
  *
  * Bounds are either user-supplied (`cappingValues`) or fitted as exact
  * weighted quantiles with np.interp semantics
  * (tubular/capping.py:335-452 — see graft.core.Stats.weightedQuantiles).
  * Either bound may be None (one-sided).
  */
abstract class BaseCapping(
    val cappingValues: Map[String, (Option[Double], Option[Double])],
    val quantiles: Map[String, (Option[Double], Option[Double])],
    val weightsColumn: Option[String],
    /** When set, quantile fits use the fixed-bin histogram sketch
      * ([[graft.core.Sketch]]) with this bin count instead of the exact
      * np.interp machinery: the fit shuffle then carries <= |columns| x
      * bins x |partitions| partial rows regardless of input size (error
      * <= column range / bins) — the 10^12-row fit path. None = exact.
      */
    val histogramBins: Option[Int] = None
) extends Transformer {

  require(cappingValues.isEmpty ^ quantiles.isEmpty,
    s"$classname: exactly one of cappingValues / quantiles must be given")
  cappingValues.foreach { case (c, (lo, hi)) =>
    for (l <- lo; h <- hi)
      require(l <= h, s"$classname: $c lower cap $l > upper cap $h")
    require(lo.isDefined || hi.isDefined, s"$classname: $c has no caps")
  }
  quantiles.foreach { case (c, (lo, hi)) =>
    (lo.toSeq ++ hi.toSeq).foreach(q =>
      require(q >= 0 && q <= 1, s"$classname: $c quantile $q not in [0,1]"))
    require(lo.isDefined || hi.isDefined, s"$classname: $c has no quantiles")
  }

  val columns: Seq[String] =
    (if (cappingValues.nonEmpty) cappingValues else quantiles).keys.toSeq

  override def needsFit: Boolean = quantiles.nonEmpty

  override def fitInputCols: Seq[String] = columns ++ weightsColumn

  /** Learned (or given) per-column [lo, hi]. */
  var fittedCaps: Map[String, (Option[Double], Option[Double])] = cappingValues

  override def fit(df: DataFrame): this.type = {
    super.fit(df)
    requireNumeric(df, columns)
    if (quantiles.nonEmpty) {
      val rows = Weights.fitRows(df, weightsColumn)
      val w = Weights.weightCol(weightsColumn)
      // all columns' quantiles in ONE melted distributed pass
      val perCol = quantiles.map { case (c, (qLo, qHi)) =>
        c -> (qLo.toSeq ++ qHi.toSeq) }
      val fitted = histogramBins match {
        case Some(b) => graft.core.Sketch
          .histQuantilesMelted(rows, perCol, w, b)
        case None => Stats.weightedQuantilesMelted(rows, perCol, w)
      }
      fittedCaps = quantiles.map { case (c, (qLo, qHi)) =>
        val vals = fitted(c)
        val lo = qLo.map(_ => vals.head.getOrElse(
          throw new IllegalStateException(
            s"$classname: no valid rows fitting quantile caps for $c")))
        val hi = qHi.map(_ => vals.last.getOrElse(
          throw new IllegalStateException(
            s"$classname: no valid rows fitting quantile caps for $c")))
        c -> (lo, hi)
      }
    }
    this
  }

  override def fitParams: Map[String, Any] = Map(
    "capping_values" -> fittedCaps.map { case (c, (lo, hi)) =>
      c -> Seq(lo.map(Double.box).orNull, hi.map(Double.box).orNull) })
  override def restoreFit(fit: Map[String, Any]): this.type = {
    fittedCaps = fit("capping_values")
      .asInstanceOf[Map[String, Seq[Any]]]
      .map { case (c, s) =>
        c -> (Option(s(0)).map(_.asInstanceOf[Double]),
              Option(s(1)).map(_.asInstanceOf[Double]))
      }
    super.restoreFit(fit)
  }

  override def initParams: Map[String, Any] = Map(
    "capping_values" -> cappingValues.map { case (c, (lo, hi)) =>
      c -> Seq(lo.map(Double.box).orNull, hi.map(Double.box).orNull) },
    "quantiles" -> quantiles.map { case (c, (lo, hi)) =>
      c -> Seq(lo.map(Double.box).orNull, hi.map(Double.box).orNull) },
    "weights_column" -> weightsColumn.orNull,
    "histogram_bins" -> histogramBins.map(Int.box).orNull)
}

/** Clip to [lo, hi]; nulls pass through (polars clip semantics,
  * tubular/functions/capping.py:28-52).
  */
class CappingTransformer(
    cappingValues: Map[String, (Option[Double], Option[Double])] = Map.empty,
    quantiles: Map[String, (Option[Double], Option[Double])] = Map.empty,
    weightsColumn: Option[String] = None,
    histogramBins: Option[Int] = None
) extends BaseCapping(cappingValues, quantiles, weightsColumn,
    histogramBins) {

  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    columns.map { c =>
      val (lo, hi) = fittedCaps(c)
      val dt = df.schema(c).dataType
      var e = col(c).cast("double")
      // greatest/least skip nulls, so guard: clip(null) stays null
      lo.foreach(l => e = greatest(e, lit(l)))
      hi.foreach(h => e = least(e, lit(h)))
      val outType = dt match {
        case FloatType | DoubleType => dt
        case _ => DoubleType // integral columns widen to fit float caps
      }
      // NaN passes through un-clipped (polars clip semantics,
      // tubular/functions/capping.py:46-52): Spark's greatest/least
      // order NaN as the LARGEST value, so without the guard a NaN
      // input would cap to the upper bound instead of staying NaN
      c -> when(col(c).isNull, lit(null))
        .when(isnan(col(c).cast("double")), col(c).cast("double"))
        .otherwise(e).cast(outType)
    }
}

/** Values outside [lo, hi] -> null; survivors cast to float
  * (tubular/capping.py:717-978, tubular/functions/capping.py:56-106).
  */
class OutOfRangeNullTransformer(
    cappingValues: Map[String, (Option[Double], Option[Double])] = Map.empty,
    quantiles: Map[String, (Option[Double], Option[Double])] = Map.empty,
    weightsColumn: Option[String] = None,
    histogramBins: Option[Int] = None
) extends BaseCapping(cappingValues, quantiles, weightsColumn,
    histogramBins) {

  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    columns.map { c =>
      val (lo, hi) = fittedCaps(c)
      // NaN pinned to the reference's IEEE comparisons
      // (tubular/functions/capping.py:79-104): both-sided `>= lo AND
      // <= hi` nulls NaN; one-sided `< lo` / `> hi` KEEPS NaN (IEEE
      // comparisons with NaN are false). Spark instead totally orders
      // NaN as largest, so the one-sided cases need an explicit guard.
      val nan = isnan(col(c).cast("double"))
      val inRange = (lo, hi) match {
        case (Some(l), Some(h)) => !nan && col(c) >= l && col(c) <= h
        case (Some(l), None) => nan || col(c) >= l
        case (None, Some(h)) => nan || col(c) <= h
        case _ => lit(true)
      }
      c -> when(col(c).isNotNull && inRange, col(c)).cast(DoubleType)
    }
}
