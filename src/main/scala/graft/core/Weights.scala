package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Sample-weight plumbing (reference tubular/mixins.py:89-216).
  *
  * Every stateful fit can be weighted; when no weight column is given a
  * unit weight is used, and rows whose weight is null/NaN/±inf/<=0 are
  * filtered out of the fit (never out of the transform).
  */
object Weights {

  /** Weight expression: the named column, or a unit literal. */
  def weightCol(weightsColumn: Option[String]): Column =
    weightsColumn.map(col).getOrElse(lit(1).cast("tinyint"))

  /** Strictly-positive, non-null, finite
    * (tubular/mixins.py:186-216).
    */
  def validFilter(w: Column): Column =
    w.isNotNull && !isnan(w) && (w > 0) &&
      (w < lit(Double.PositiveInfinity))

  /** Rows usable for a weighted fit. No-op predicate when unweighted. */
  def fitRows(df: DataFrame, weightsColumn: Option[String]): DataFrame =
    weightsColumn match {
      case Some(w) =>
        checkNumeric(df, w)
        df.filter(validFilter(col(w)))
      case None => df
    }

  def checkNumeric(df: DataFrame, w: String): Unit = {
    if (!df.columns.contains(w))
      throw new IllegalArgumentException(s"weight column $w not in DataFrame")
    df.schema(w).dataType match {
      case _: NumericType => ()
      case dt => throw new IllegalArgumentException(
        s"weight column $w must be numeric, got $dt")
    }
  }
}
