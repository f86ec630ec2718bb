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

/** Binary arithmetic between two columns -> new column
  * (tubular/numeric.py:1116-1261 wraps pandas add/sub/mul/div/mod/pow;
  * deprecated there). Pandas parity notes: double division by zero
  * yields +/-Infinity (Java double semantics, same as numpy), and
  * `mod` follows Python sign semantics (result takes the DIVISOR's
  * sign), which differs from Java `%` — implemented as
  * `((a % b) + b) % b`.
  */
class TwoColumnOperatorTransformer(
    val method: String,
    val columnA: String,
    val columnB: String,
    val newColumnName: String
) extends Transformer {
  private val Ops = Seq("add", "sub", "mul", "div", "mod", "pow")
  require(Ops.contains(method),
    s"method must be one of ${Ops.mkString(", ")}, got $method")
  val columns: Seq[String] = Seq(columnA, columnB)

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireNumeric(df, columns)
    val a = col(columnA).cast("double")
    val b = col(columnB).cast("double")
    // zero divisors handled explicitly with numpy/pandas results
    // (x/0 -> +/-Inf, 0/0 and mod-by-0 -> NaN) — ANSI mode would raise
    val e = method match {
      case "add" => a + b
      case "sub" => a - b
      case "mul" => a * b
      case "div" => when(b === 0.0,
          when(a > 0, lit(Double.PositiveInfinity))
            .when(a < 0, lit(Double.NegativeInfinity))
            .otherwise(lit(Double.NaN)))
        .otherwise(a / b)
      case "mod" => when(b === 0.0, lit(Double.NaN))
        .otherwise(((a % b) + b) % b)
      case "pow" => pow(a, b)
    }
    Seq(newColumnName -> e)
  }
  override def featureNamesOut: Seq[String] = Seq(newColumnName)
  override def initParams: Map[String, Any] = Map(
    "pd_method_name" -> method, "columns" -> columns,
    "new_column_name" -> newColumnName)
}

/** Interaction features: products of every column combination with
  * degree in [minDegree, maxDegree]
  * (tubular/numeric.py:1430-1624, sklearn PolynomialFeatures
  * interaction_only semantics; deprecated there). Output column names
  * are the combination joined with a space, exactly like the
  * reference. One codegen'd projection regardless of combination
  * count.
  */
class InteractionTransformer(
    val columns: Seq[String],
    val minDegree: Int = 2,
    val maxDegree: Int = 2
) extends Transformer {
  require(minDegree >= 2,
    s"min_degree must be equal or greater than 2, got $minDegree " +
      "(tubular/numeric.py:1541-1543)")
  require(maxDegree >= minDegree,
    "max_degree must be equal or greater than min_degree")
  require(maxDegree <= columns.size,
    "max_degree must be equal or lower than number of columns")

  private def combos: Seq[Seq[String]] =
    (minDegree to maxDegree).flatMap(columns.combinations(_))

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireNumeric(df, columns)
    combos.map(cs =>
      cs.mkString(" ") -> cs.map(col(_).cast("double")).reduce(_ * _))
  }
  override def featureNamesOut: Seq[String] = combos.map(_.mkString(" "))
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "min_degree" -> minDegree,
    "max_degree" -> maxDegree)
}

/** PCA (tubular/numeric.py:1628-1860 wraps sklearn.decomposition.PCA;
  * deprecated there, resurrected distributed).
  *
  * Fit runs TWO aggregation scans, no row ever leaves the cluster:
  * pass 1 collects per-column means; pass 2 the centered second
  * moments sum((x_i - m_i)(x_j - m_j)) for i <= j — d(d+1)/2 scalars
  * (exactly sklearn's centered-SVD arithmetic: sample covariance,
  * ddof=1, no E[xy]-E[x]E[y] cancellation). The d x d eigensolve runs
  * on the driver (breeze eigSym — d is a column count, tiny);
  * components are ordered by descending eigenvalue with sklearn's
  * svd_flip sign convention (largest-|coefficient| positive), pinned
  * against the reference's pytest golden. Transform is one codegen'd
  * projection: pca_k = sum_j (x_j - m_j) * component_k(j).
  */
class PCATransformer(
    val columns: Seq[String],
    val nComponents: Int = 2,
    val prefix: String = "pca_"
) extends Transformer {
  require(nComponents >= 1 && nComponents <= columns.size,
    s"n_components must be in 1..${columns.size}, got $nComponents")
  override def needsFit: Boolean = true

  var means: Seq[Double] = Seq.empty
  var components: Seq[Seq[Double]] = Seq.empty // nComponents rows of d

  override def fit(df: DataFrame): this.type = {
    baseFitChecks(df)
    requireNumeric(df, columns)
    val d = columns.size
    val xs = columns.map(c => col(c).cast("double"))
    val meanRow = df.agg(avg(xs.head).as("m0"),
      xs.tail.zipWithIndex.map { case (x, i) =>
        avg(x).as(s"m${i + 1}") } :+ count(lit(1)).as("n"): _*).head()
    means = (0 until d).map(meanRow.getDouble)
    val n = meanRow.getLong(d)
    require(n >= 2, s"$classname: need >= 2 rows to fit, got $n")
    val pairs = for { i <- 0 until d; j <- i until d } yield (i, j)
    val momExprs = pairs.map { case (i, j) =>
      sum((xs(i) - lit(means(i))) * (xs(j) - lit(means(j))))
        .as(s"s${i}_$j")
    }
    val momRow = df.agg(momExprs.head, momExprs.tail: _*).head()
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    pairs.zipWithIndex.foreach { case ((i, j), k) =>
      val v = momRow.getDouble(k) / (n - 1)
      cov(i, j) = v
      cov(j, i) = v
    }
    val eig = breeze.linalg.eigSym(cov)
    // breeze returns ascending eigenvalues; take the top nComponents
    val order = (0 until d).sortBy(i => -eig.eigenvalues(i))
      .take(nComponents)
    components = order.map { e =>
      val v = (0 until d).map(eig.eigenvectors(_, e))
      // sklearn svd_flip: the largest-|.| coefficient is positive
      val flip = if (v(v.indices.maxBy(i => math.abs(v(i)))) < 0) -1.0
        else 1.0
      v.map(_ * flip)
    }
    fittedFlag = true
    this
  }

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireNumeric(df, columns)
    components.zipWithIndex.map { case (comp, k) =>
      s"$prefix$k" -> columns.zipWithIndex.map { case (c, j) =>
        (col(c).cast("double") - lit(means(j))) * lit(comp(j))
      }.reduce(_ + _)
    }
  }
  override def featureNamesOut: Seq[String] =
    components.indices.map(k => s"$prefix$k")
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "n_components" -> nComponents,
    "pca_column_prefix" -> prefix)
  override def fitParams: Map[String, Any] = Map(
    "means" -> means, "components" -> components)
  override def restoreFit(fit: Map[String, Any]): this.type = {
    means = fit("means").asInstanceOf[Seq[Double]]
    components = fit("components").asInstanceOf[Seq[Seq[Double]]]
    super.restoreFit(fit)
  }
}

/** Quantile binning — pd.qcut / sklearn `KBinsDiscretizer
  * (strategy="quantile")` semantics over the engine's exact
  * distributed weighted quantiles: fit learns `nBins - 1` interior
  * np.interp quantile edges per column (one melted pass for ALL
  * columns, range-partitioned prefix sums — no single-partition
  * stage), transform is `np.digitize(x, edges, right=True)` as a
  * codegen'd `when` chain: bucket = index of first edge >= x, values
  * above the last edge -> nBins - 1. Null stays null. Not in the
  * reference (its Cut needs user edges, OneDKmeans learns k-means
  * bins); standard feature engineering at corpus scale.
  */
class QuantileBinnerTransformer(
    val columns: Seq[String],
    val nBins: Int,
    val weightsColumn: Option[String] = None,
    val suffix: String = "qbin"
) extends Transformer {
  require(nBins >= 2, s"nBins must be >= 2, got $nBins")

  override def needsFit: Boolean = true
  var edges: Map[String, Seq[Double]] = Map.empty

  override def fitInputCols: Seq[String] = columns ++ weightsColumn

  override def fit(df: DataFrame): this.type = {
    baseFitChecks(df)
    requireNumeric(df, columns)
    val qs = (1 until nBins).map(_.toDouble / nBins)
    // NaN is excluded from the fit (it sorts largest and would shift
    // every edge) and propagates as null in transform — pd.qcut parity
    val noNan = columns.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(isnan(col(c).cast("double")),
        lit(null).cast("double")).otherwise(col(c).cast("double")))
    }
    val rows = graft.core.Weights.fitRows(noNan, weightsColumn)
    val w = graft.core.Weights.weightCol(weightsColumn)
    val fitted = graft.core.Stats.weightedQuantilesMelted(
      rows, columns.map(_ -> qs.toSeq).toMap, w)
    edges = columns.map { c =>
      val es = fitted(c).map(_.getOrElse(throw new IllegalStateException(
        s"$classname: no quantiles learned for $c (all null?)")))
      c -> es
    }.toMap
    fittedFlag = true
    this
  }

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    require(isFitted, s"$classname: fit before transform")
    columns.map { c =>
      val x = col(c).cast("double")
      val chain = edges(c).zipWithIndex
        .foldRight(lit(nBins - 1): Column) {
          case ((e, i), acc) => when(x <= e, i).otherwise(acc)
        }
      s"${c}_$suffix" -> when(x.isNull || isnan(x),
        lit(null).cast("int")).otherwise(chain.cast("int"))
    }
  }

  override def featureNamesOut: Seq[String] =
    columns.map(c => s"${c}_$suffix")
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "n_bins" -> nBins,
    "weights_column" -> weightsColumn.orNull, "suffix" -> suffix)
  override def fitParams: Map[String, Any] = Map("edges" -> edges)
  override def restoreFit(fit: Map[String, Any]): this.type = {
    edges = fit("edges").asInstanceOf[Map[String, Seq[Any]]]
      .map { case (k, v) => k -> v.map {
        case d: Double => d
        case l: Long => l.toDouble
        case x => x.toString.toDouble
      } }
    super.restoreFit(fit)
  }
}

/** Unit-L2 vector normalization for embedding columns (no reference
  * counterpart — tubular has no vector dtype): the standard hygiene
  * step before any cosine-metric stage (ANN indexes, embedding dedup,
  * hard-negative mining), where unnormalized vectors silently turn
  * cosine into a magnitude ranking. STATELESS per-row projection —
  * no fit, no shuffle, scale-free.
  *
  * The squared-norm accumulates through an explicit LEFT-FOLD
  * `aggregate` (engine-portable: DuckDB's `list_reduce` is the same
  * left fold, so the oracle reproduces the result bit-for-bit rather
  * than modulo summation order — q153). Elements are widened to
  * double first (exact). A null vector, any null element, or a
  * zero/NaN norm yields null (a poisoned embedding must not survive
  * as a fake unit vector).
  */
class VectorL2NormalizeTransformer(
    val columns: Seq[String]
) extends Transformer {
  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    columns.map { c =>
      def af(a: Column, f: Column => Column): Column =
        org.apache.spark.sql.functions.transform(a, f)
      val v = af(col(c), x => x.cast("double"))
      val n = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
      c -> when(col(c).isNull || n.isNull || isnan(n) || n === 0.0,
        lit(null).cast("array<double>"))
        .otherwise(af(v, x => x / n))
    }
  override def initParams: Map[String, Any] = Map("columns" -> columns)
}

/** Yeo–Johnson power transformer (sklearn `PowerTransformer`
  * semantics over a FIXED candidate grid; no reference counterpart —
  * tubular stops at log): fits, per column, the lambda maximizing the
  * Gaussian log-likelihood of the transformed values, then applies
  *
  *   x >= 0:  ((x+1)^l - 1) / l          (l != 0;  ln(x+1) at l = 0)
  *   x <  0:  -(((-x+1)^(2-l) - 1)/(2-l)) (l != 2; -ln(-x+1) at l = 2)
  *
  * — the variance-stabilizing transform that handles NEGATIVE values
  * (Box-Cox cannot), the standard skew fix before linear/NN models.
  *
  * DESIGN: a fixed grid, not Brent optimization. sklearn optimizes l
  * continuously per column, which needs an iterative driver loop of
  * full-data passes; a 0.25-spaced grid needs ONE distributed
  * aggregation evaluating every candidate simultaneously (the fused
  * sums land in a single map-side-combined agg of 2·|grid|+2 columns)
  * and is deterministic and engine-replayable. LL(l) =
  * -n/2·ln(var(psi)) + (l-1)·sum(sign(x)·ln(|x|+1)); the second term
  * is l-independent and computed once. Ties break to the SMALLEST l.
  * Nulls are excluded from the fit and pass through transform; NaN is
  * excluded from the fit (it would poison every candidate's sums).
  */
class YeoJohnsonTransformer(
    val columns: Seq[String],
    val grid: Seq[Double] =
      (-8 to 8).map(_ * 0.25) // -2.0 .. 2.0
) extends Transformer {
  require(grid.nonEmpty, s"$classname: candidate grid must be non-empty")
  override def needsFit: Boolean = true

  var fittedLambdas: Map[String, Double] = Map.empty

  /** psi(x, l) as a Column expression — shared by fit and transform
    * so the applied transform is exactly what the fit scored.
    */
  private def psi(x: Column, l: Double): Column = {
    val pos =
      if (l == 0.0) log(x + 1.0)
      else (pow(x + 1.0, l) - 1.0) / l
    val neg =
      if (l == 2.0) -log(-x + 1.0)
      else -(pow(-x + 1.0, 2.0 - l) - 1.0) / (2.0 - l)
    when(x >= 0, pos).otherwise(neg)
  }

  override def fit(df: DataFrame): this.type = {
    super.fit(df)
    requireNumeric(df, columns)
    fittedLambdas = columns.map { c =>
      val x = col(c).cast("double")
      val clean = df.filter(x.isNotNull && !isnan(x)).select(x.as("__x"))
      val v = col("__x")
      val aggs =
        Seq(count(lit(1)).as("n"),
          sum(when(v >= 0, log(v + 1.0)).otherwise(-log(-v + 1.0)))
            .as("slog")) ++
        grid.zipWithIndex.flatMap { case (l, i) =>
          Seq(sum(psi(v, l)).as(s"s$i"),
            sum(psi(v, l) * psi(v, l)).as(s"q$i")) }
      val r = clean.agg(aggs.head, aggs.tail: _*).head()
      val n = r.getLong(0)
      if (n == 0)
        throw new IllegalArgumentException(
          s"$classname: column $c has no non-null finite values to fit")
      val slog = r.getDouble(1)
      val best = grid.zipWithIndex.map { case (l, i) =>
        val s = r.getDouble(2 + 2 * i); val q = r.getDouble(3 + 2 * i)
        val variance = math.max(q / n - (s / n) * (s / n), 1e-300)
        val ll = -n / 2.0 * math.log(variance) + (l - 1.0) * slog
        (l, ll)
      }.minBy { case (l, ll) => (-ll, l) } // max LL, ties -> smallest l
      c -> best._1
    }.toMap
    this
  }

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireNumeric(df, columns)
    columns.map { c =>
      c -> psi(col(c).cast("double"), fittedLambdas(c))
    }
  }

  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "grid" -> grid)
  override def fitParams: Map[String, Any] =
    Map("lambdas_" -> fittedLambdas)
  override def restoreFit(fit: Map[String, Any]): this.type = {
    fittedLambdas = fit("lambdas_").asInstanceOf[Map[String, Any]]
      .map { case (k, v) => k -> (v match {
        case d: Double => d
        case l: Long => l.toDouble
        case x => x.toString.toDouble
      }) }
    super.restoreFit(fit)
  }
}

/** Robust scaler (sklearn `RobustScaler` semantics; completes the
  * scaling family next to [[ScalingTransformer]]'s
  * min_max/max_abs/standard): `(x - median) / (q_hi - q_lo)` with the
  * quantiles from the exact distributed np.interp machinery
  * ([[graft.core.Stats.weightedQuantilesMelted]] — melted, two-phase
  * range-partitioned, no single-partition stage). The scaler of
  * choice when the column carries outliers that poison mean/std
  * (standard) and min/max (min_max) fits — i.e. most raw web-scale
  * features. Zero IQR (heavily-tied column) divides by 1 like
  * sklearn's `_handle_zeros_in_scale`; weighted rows supported; nulls
  * pass through transform and are excluded from the fit.
  */
class RobustScalingTransformer(
    val columns: Seq[String],
    val quantileRange: (Double, Double) = (0.25, 0.75),
    val weightsColumn: Option[String] = None
) extends Transformer {
  private val (qLo, qHi) = quantileRange
  require(qLo >= 0 && qHi <= 1 && qLo < qHi,
    s"quantile_range must satisfy 0 <= lo < hi <= 1, got $quantileRange")
  override def needsFit: Boolean = true
  override def fitInputCols: Seq[String] = columns ++ weightsColumn

  /** per column: (median, iqr-scale) */
  var fitted: Map[String, (Double, Double)] = Map.empty

  override def fit(df: DataFrame): this.type = {
    super.fit(df)
    requireNumeric(df, columns)
    val rows = graft.core.Weights.fitRows(df, weightsColumn)
    val w = graft.core.Weights.weightCol(weightsColumn).cast("double")
    val qs = graft.core.Stats.weightedQuantilesMelted(rows,
      columns.map(_ -> Seq(qLo, 0.5, qHi)).toMap, w)
    fitted = columns.map { c =>
      val Seq(lo, med, hi) = qs(c)
      if (med.isEmpty)
        throw new IllegalArgumentException(
          s"$classname: column $c has no non-null finite values to fit")
      val scale = hi.get - lo.get
      c -> (med.get, if (scale == 0.0 || scale.isNaN) 1.0 else scale)
    }.toMap
    this
  }

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireNumeric(df, columns)
    columns.map { c =>
      val (m, s) = fitted(c)
      c -> ((col(c).cast("double") - lit(m)) / lit(s))
    }
  }
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns,
    "quantile_range" -> Seq(qLo, qHi),
    "weights_column" -> weightsColumn.orNull)
  override def fitParams: Map[String, Any] = Map(
    "medians" -> columns.map(c => fitted(c)._1),
    "scales" -> columns.map(c => fitted(c)._2))
  override def restoreFit(fit: Map[String, Any]): this.type = {
    def dbls(k: String) = fit(k).asInstanceOf[Seq[Any]].map {
      case d: Double => d
      case l: Long => l.toDouble
      case x => x.toString.toDouble
    }
    val ms = dbls("medians"); val ss = dbls("scales")
    fitted = columns.lazyZip(ms.lazyZip(ss).map((a, b) => (a, b))).toMap
    super.restoreFit(fit)
  }
}
