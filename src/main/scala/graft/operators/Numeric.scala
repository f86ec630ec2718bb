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
