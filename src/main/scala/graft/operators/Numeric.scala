package graft.operators

import graft.core.Transformer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Numeric transformers (reference tubular/numeric.py). */

/** `a - b` -> `{a}_minus_{b}` (tubular/numeric.py:535-673). */
class DifferenceTransformer(
    val columnA: String, val columnB: String,
    val newColumnName: Option[String] = None
) extends Transformer {
  val columns: Seq[String] = Seq(columnA, columnB)
  val outName: String = newColumnName.getOrElse(s"${columnA}_minus_$columnB")
  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireNumeric(df, columns)
    Seq(outName -> (col(columnA) - col(columnB)))
  }
  override def featureNamesOut: Seq[String] = Seq(outName)
  override def initParams: Map[String, Any] = Map(
    "column_a" -> columnA, "column_b" -> columnB,
    "new_column_name" -> outName)
}

/** `a / b`, 0 denominator -> null, output double
  * (tubular/numeric.py:677-846).
  */
class RatioTransformer(
    val columnA: String, val columnB: String,
    val newColumnName: Option[String] = None
) extends Transformer {
  val columns: Seq[String] = Seq(columnA, columnB)
  val outName: String =
    newColumnName.getOrElse(s"${columnA}_divided_by_$columnB")
  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireNumeric(df, columns)
    Seq(outName -> when(col(columnB) =!= 0,
      col(columnA).cast("double") / col(columnB).cast("double"))
      .cast(DoubleType))
  }
  override def featureNamesOut: Seq[String] = Seq(outName)
  override def initParams: Map[String, Any] = Map(
    "column_a" -> columnA, "column_b" -> columnB,
    "new_column_name" -> outName)
}

/** 1-D k-means binning (tubular/numeric.py:212-531).
  *
  * Fit: Lloyd's algorithm on ONE numeric column, run as distributed
  * aggregations — each iteration is a single groupBy over bucket
  * assignment (no data collected). Deterministic init: k equally-spaced
  * quantile seeds. Bins = per-cluster max, sorted
  * (tubular/numeric.py:455-465); transform = np.digitize(x, bins,
  * right=True): bucket index via a literal-array binary-searchable
  * `when` chain.
  */
class OneDKmeansTransformer(
    val column: String,
    val newColumnName: String,
    val k: Int = 5,
    val maxIter: Int = 20,
    val dropOriginal: Boolean = false
) extends Transformer {
  require(k > 0 && k <= 1000, s"k must be in 1..1000, got $k")
  val columns: Seq[String] = Seq(column)
  override def needsFit: Boolean = true

  var bins: Seq[Double] = Seq.empty

  override def fit(df: DataFrame): this.type = {
    super.fit(df)
    requireNumeric(df, columns)
    val nBad = df.filter(col(column).isNull || isnan(col(column)))
      .limit(1).count()
    if (nBad > 0)
      throw new IllegalArgumentException(
        s"$classname: X should not contain missing values. " +
          "(tubular/numeric.py:430-436)")
    val x = df.select(col(column).cast("double").as("x"))
    // deterministic seeds: k interior quantiles (exact percentile)
    val probs = (1 to k).map(i => (2.0 * i - 1) / (2 * k))
    var centers = x.agg(
      percentile_approx(col("x"), typedLit(probs), lit(10000)))
      .head().getAs[scala.collection.Seq[Double]](0).toSeq.distinct.sorted
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val assign = nearestCenterExpr(col("x"), centers)
      val newCenters = x.groupBy(assign.as("c"))
        .agg(avg(col("x")).as("m"))
        .collect().map(_.getDouble(1)).toSeq.sorted
      converged = newCenters == centers
      centers = newCenters
      iter += 1
    }
    val assign = nearestCenterExpr(col("x"), centers)
    bins = x.groupBy(assign.as("c")).agg(max(col("x")).as("mx"))
      .collect().map(_.getDouble(1)).toSeq.sorted
    this
  }

  /** index of nearest center (ties -> lower index, like sklearn). */
  private def nearestCenterExpr(x: Column, cs: Seq[Double]): Column = {
    // boundaries between consecutive centers; x <= b_i -> cluster i
    val bounds = cs.sliding(2).collect {
      case Seq(a, b) => (a + b) / 2 }.toSeq
    bounds.zipWithIndex.foldRight(lit(cs.size - 1): Column) {
      case ((b, i), acc) => when(x <= b, i).otherwise(acc)
    }
  }

  /** np.digitize(x, bins, right=True): count of bins < x, i.e. index of
    * first bin >= x; x > last bin -> k.
    */
  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    val x = col(column).cast("double")
    val e = bins.zipWithIndex.foldRight(lit(bins.size): Column) {
      case ((b, i), acc) => when(x <= b, i).otherwise(acc)
    }
    Seq(newColumnName -> e)
  }

  override def transform(df: DataFrame): DataFrame = {
    val out = super.transform(df)
    if (dropOriginal) out.drop(column) else out
  }

  override def featureNamesOut: Seq[String] = Seq(newColumnName)
  override def initParams: Map[String, Any] = Map(
    "column" -> column, "new_column_name" -> newColumnName,
    "n_clusters" -> k, "max_iter" -> maxIter,
    "drop_original" -> dropOriginal)
  override def fitParams: Map[String, Any] = Map("bins" -> bins)
  override def restoreFit(fit: Map[String, Any]): this.type = {
    bins = fit("bins").asInstanceOf[Seq[Double]]
    super.restoreFit(fit)
  }
}

/** Log transform -> new `{col}_{suffix}` columns
  * (tubular/numeric.py:856-1001; deprecated there, resurrected here —
  * log features are everyday feature engineering).
  *
  * `base=None` -> natural log (log1p when addOne); otherwise divided by
  * ln(base). Non-positive inputs (<= -1 with addOne) raise — enforced
  * IN the projection via `assert_true`, so the transform stays a
  * single codegen'd map stage with no validation pre-pass; the error
  * surfaces on the first offending row (reference raises eagerly,
  * tubular/numeric.py:973-993).
  */
class LogTransformer(
    val columns: Seq[String],
    val base: Option[Double] = None,
    val addOne: Boolean = false,
    val suffix: String = "log"
) extends Transformer {
  require(base.forall(_ > 0), s"base must be positive, got $base")

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireNumeric(df, columns)
    columns.map { c =>
      val x = col(c).cast("double")
      val lim = if (addOne) -1.0 else 0.0
      val raw = if (addOne) log1p(x) else log(x)
      val scaled = base.map(b => raw / math.log(b)).getOrElse(raw)
      val guarded = when(
        assert_true(x.isNull || x > lim,
          lit(s"$classname: values less than or equal to $lim in " +
            s"column $c, make greater than $lim before using transform"))
          .isNull,
        scaled)
      s"${c}_$suffix" -> guarded
    }
  }
  override def featureNamesOut: Seq[String] =
    columns.map(c => s"${c}_$suffix")
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "base" -> base.orNull, "add_1" -> addOne,
    "suffix" -> suffix)
}

/** Fixed-edge binning — pd.cut semantics with explicit bin edges
  * (tubular/numeric.py:1004-1261 delegates to pd.cut; deprecated
  * there). Value in `(bins(i), bins(i+1)]` when `right` (else
  * `[bins(i), bins(i+1))`); outside any bin -> null; `includeLowest`
  * closes the first interval's outer edge. Labels default to pandas
  * interval notation built from the given edges — driver-side
  * literals, so external engines reproduce them verbatim. The
  * transform is one codegen'd `when` chain (edges are small).
  */
class CutTransformer(
    val column: String,
    val newColumnName: String,
    val bins: Seq[Double],
    val right: Boolean = true,
    val includeLowest: Boolean = false,
    val labels: Option[Seq[String]] = None
) extends Transformer {
  require(bins.size >= 2, s"need >= 2 bin edges, got ${bins.size}")
  require(bins == bins.sorted && bins.distinct == bins,
    "bin edges must be strictly increasing")
  require(labels.forall(_.size == bins.size - 1),
    s"labels must have ${bins.size - 1} entries")
  val columns: Seq[String] = Seq(column)

  /** pandas-style interval labels for the given edges. */
  def intervalLabels: Seq[String] = labels.getOrElse(
    bins.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) =>
      val first = i == 0
      if (right) s"${if (first && includeLowest) "[" else "("}$lo, $hi]"
      else s"[$lo, $hi)"
    }.toSeq)

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireNumeric(df, columns)
    val x = col(column).cast("double")
    val ls = intervalLabels
    val e = bins.sliding(2).zipWithIndex.foldLeft(
      lit(null).cast("string")) { case (acc, (Seq(lo, hi), i)) =>
      val inLower =
        if (right)
          if (i == 0 && includeLowest) x >= lo else x > lo
        else x >= lo
      val inUpper = if (right) x <= hi else x < hi
      when(inLower && inUpper, lit(ls(i))).otherwise(acc)
    }
    Seq(newColumnName -> e)
  }
  override def featureNamesOut: Seq[String] = Seq(newColumnName)
  override def initParams: Map[String, Any] = Map(
    "column" -> column, "new_column_name" -> newColumnName,
    "bins" -> bins, "right" -> right,
    "include_lowest" -> includeLowest,
    "labels" -> labels.orNull)
}

/** Min-max / max-abs / standard scaling with sklearn parity
  * (tubular/numeric.py:1264-1426 wraps sklearn.preprocessing;
  * deprecated there, resurrected as a fused-fit operator).
  *
  * sklearn semantics preserved: StandardScaler uses the POPULATION
  * standard deviation (ddof=0) and any zero scale (constant column)
  * divides by 1 instead (_handle_zeros_in_scale). Columns are scaled
  * IN PLACE. Fit is AggFittable: all columns in one aggregation scan,
  * fusable with other fits in a Pipeline.
  */
class ScalingTransformer(
    val columns: Seq[String],
    val scalerType: String
) extends Transformer with graft.core.AggFittable {
  require(Seq("min_max", "max_abs", "standard").contains(scalerType),
    s"scaler_type should be one of min_max, max_abs, standard " +
      s"(tubular/numeric.py:1358-1362), got $scalerType")
  override def needsFit: Boolean = true

  // per column: (offset, scale); transform = (x - offset) / scale
  var fitted: Map[String, (Double, Double)] = Map.empty

  private def nonZero(s: Double): Double =
    if (s == 0.0 || s.isNaN) 1.0 else s

  override def fitAggExprs(df: DataFrame): Seq[Column] = {
    requireNumeric(df, columns)
    columns.flatMap { c =>
      val x = col(c).cast("double")
      scalerType match {
        case "min_max" => Seq(min(x), max(x))
        case "max_abs" => Seq(max(abs(x)))
        case "standard" => Seq(avg(x), avg(x * x))
      }
    }
  }

  override def absorbAggRow(row: org.apache.spark.sql.Row,
      offset: Int): Unit = {
    val width = if (scalerType == "max_abs") 1 else 2
    fitted = columns.zipWithIndex.map { case (c, i) =>
      val base = offset + i * width
      val os = scalerType match {
        case "min_max" =>
          val (mn, mx) = (row.getDouble(base), row.getDouble(base + 1))
          (mn, nonZero(mx - mn))
        case "max_abs" => (0.0, nonZero(row.getDouble(base)))
        case "standard" =>
          val (m, m2) = (row.getDouble(base), row.getDouble(base + 1))
          (m, nonZero(math.sqrt(m2 - m * m)))
      }
      c -> os
    }.toMap
    fittedFlag = true
  }

  override def fit(df: DataFrame): this.type = {
    baseFitChecks(df)
    val exprs = fitAggExprs(df).zipWithIndex.map { case (e, i) =>
      e.as(s"__agg$i")
    }
    absorbAggRow(df.agg(exprs.head, exprs.tail: _*).head(), 0)
    this
  }

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireNumeric(df, columns)
    columns.map { c =>
      val (o, s) = fitted(c)
      c -> ((col(c).cast("double") - lit(o)) / lit(s))
    }
  }
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "scaler_type" -> scalerType)
  override def fitParams: Map[String, Any] = Map(
    "offsets" -> columns.map(c => fitted(c)._1),
    "scales" -> columns.map(c => fitted(c)._2))
  override def restoreFit(fit: Map[String, Any]): this.type = {
    val os = fit("offsets").asInstanceOf[Seq[Double]]
    val ss = fit("scales").asInstanceOf[Seq[Double]]
    fitted = columns.lazyZip(os.lazyZip(ss).map((a, b) => (a, b))).toMap
    super.restoreFit(fit)
  }
}
