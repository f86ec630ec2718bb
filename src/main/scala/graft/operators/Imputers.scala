package graft.operators

import graft.core.{Stats, Transformer, Weights}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Imputers (reference tubular/imputers.py).
  *
  * Fit = one distributed aggregation job collecting per-column scalars;
  * transform = `coalesce(col, lit(v))` folded into a single projection,
  * so a whole imputer pipeline stays inside one codegen stage.
  */
abstract class BaseImputer extends Transformer {
  override def needsFit: Boolean = true

  /** column -> learned impute value (tubular/imputers.py fit state). */
  var imputeValues: Map[String, Any] = Map.empty

  /** Fit-failure guard (tubular/imputers.py:169-183). */
  protected def checkFitOk(): Unit = {
    val bad = imputeValues.collect { case (c, null) => c }
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"$classname: fit produced null impute value for " +
          bad.mkString(", ") + " (all rows null or invalid-weight?)")
  }

  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    columns.map { c =>
      c -> coalesce(col(c), lit(imputeValues(c))).cast(df.schema(c).dataType)
    }

  override def fitParams: Map[String, Any] =
    Map("impute_values_" -> imputeValues)
  override def restoreFit(fit: Map[String, Any]): this.type = {
    imputeValues = fit("impute_values_").asInstanceOf[Map[String, Any]]
    super.restoreFit(fit)
  }
}

/** Constant imputation, type-dispatched
  * (tubular/imputers.py:726-869).
  */
class ArbitraryImputer(
    val columns: Seq[String],
    val imputeValue: Any
) extends BaseImputer {
  override def needsFit: Boolean = false

  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    columns.map { c =>
      val dt = df.schema(c).dataType
      (imputeValue, dt) match {
        case (_: String, t) if !(t == StringType || t == NullType) =>
          throw new IllegalArgumentException(
            s"$classname: string impute value for non-string column $c ($t)")
        case (_: Boolean, t) if !(t == BooleanType || t == NullType) =>
          throw new IllegalArgumentException(
            s"$classname: boolean impute value for non-boolean column $c ($t)")
        case (v, t) if v.isInstanceOf[Number] &&
            !(t.isInstanceOf[NumericType] || t == NullType) =>
          throw new IllegalArgumentException(
            s"$classname: numeric impute value for non-numeric column $c ($t)")
        case _ => ()
      }
      val filled = coalesce(col(c), lit(imputeValue))
      c -> (if (dt == NullType) filled else filled.cast(dt))
    }

  override def initParams: Map[String, Any] =
    Map("columns" -> columns, "impute_value" -> imputeValue)
}

/** Weighted-mean imputation (tubular/imputers.py:1149-1228). */
class MeanImputer(
    val columns: Seq[String],
    val weightsColumn: Option[String] = None
) extends BaseImputer with graft.core.AggFittable {

  override def fitInputCols: Seq[String] = columns ++ weightsColumn

  override def fitAggExprs(df: DataFrame): Seq[Column] = {
    requireNumeric(df, columns)
    val valid = weightsColumn.map { wc =>
      Weights.checkNumeric(df, wc)
      Weights.validFilter(col(wc))
    }.getOrElse(lit(true))
    val w = Weights.weightCol(weightsColumn)
    columns.map(c => Stats.weightedMeanWhere(col(c), w, valid))
  }

  override def absorbAggRow(row: org.apache.spark.sql.Row,
      offset: Int): Unit = {
    imputeValues = columns.zipWithIndex.map { case (c, i) =>
      c -> row.getAs[Any](offset + i)
    }.toMap
    checkFitOk()
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

  override def initParams: Map[String, Any] =
    Map("columns" -> columns, "weights_column" -> weightsColumn.orNull)
}

/** Weighted-median imputation: min value whose cumulative weight
  * fraction >= 0.5 (tubular/imputers.py:962-1056, tubular/_stats.py:5-51).
  */
class MedianImputer(
    val columns: Seq[String],
    val weightsColumn: Option[String] = None
) extends BaseImputer {

  override def fitInputCols: Seq[String] = columns ++ weightsColumn

  override def fit(df: DataFrame): this.type = {
    super.fit(df)
    requireNumeric(df, columns)
    val rows = Weights.fitRows(df, weightsColumn)
    val w = Weights.weightCol(weightsColumn)
    // all columns in ONE melted distributed pass (reference collects
    // once per column, tubular/imputers.py:1019-1032)
    val medians = Stats.weightedMediansMelted(rows, columns, w)
    imputeValues = columns.map { c =>
      c -> medians(c).map(_.asInstanceOf[Any]).orNull
    }.toMap
    checkFitOk()
    this
  }

  override def initParams: Map[String, Any] =
    Map("columns" -> columns, "weights_column" -> weightsColumn.orNull)
}

/** Modal imputation; ties resolved to the LARGEST value
  * (tubular/imputers.py:1324-1422, tie-break at :1399-1417).
  */
class ModeImputer(
    val columns: Seq[String],
    val weightsColumn: Option[String] = None
) extends BaseImputer {

  override def fitInputCols: Seq[String] = columns ++ weightsColumn

  override def fit(df: DataFrame): this.type = {
    super.fit(df)
    val rows = Weights.fitRows(df, weightsColumn)
    val w = Weights.weightCol(weightsColumn)
    imputeValues = Map.empty
    // ONE melted groupBy job per distinct column dtype (not per column —
    // k same-typed columns share a single scan; the melt keeps the
    // original value type so the tie-break and learned value stay
    // typed). Tie -> largest value (tubular/imputers.py:1399-1417):
    // max(struct(weight, value)) orders by weight then value, both
    // ascending, which is exactly argmax-weight-then-max-value.
    columns.groupBy(c => df.schema(c).dataType).foreach { case (_, cs) =>
      val pair = explode(array(cs.map(c =>
        struct(lit(c).as("k"), col(c).as("v"))): _*))
      val top = rows
        .select(pair.as("p"), w.cast("double").as("__w"))
        .filter(col("p.v").isNotNull)
        .groupBy(col("p.k").as("k"), col("p.v").as("v"))
        .agg(sum(col("__w")).as("lw"))
        .groupBy(col("k"))
        .agg(max(struct(col("lw"), col("v"))).as("m"))
        .select(col("k"), col("m.v"))
        .collect()
        .map(r => r.getString(0) -> r.get(1)).toMap
      imputeValues ++= cs.map(c => c -> top.getOrElse(c, null))
    }
    checkFitOk()
    this
  }

  override def initParams: Map[String, Any] =
    Map("columns" -> columns, "weights_column" -> weightsColumn.orNull)
}

/** Adds `{col}_nulls: Boolean` flag columns
  * (tubular/imputers.py:1426-1556).
  */
class NullIndicator(val columns: Seq[String]) extends Transformer {
  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    columns.map(c => s"${c}_nulls" -> col(c).isNull)
  override def featureNamesOut: Seq[String] = columns.map(c => s"${c}_nulls")
  override def initParams: Map[String, Any] = Map("columns" -> columns)
}

/** Impute each column's nulls with the VALUE whose mean response is
  * nearest to the mean response of the null rows
  * (tubular/imputers.py:1568-1720; deprecated there, resurrected).
  *
  * Scale shape: everything is relational — per-column null-row
  * response means come from ONE melted aggregation, per-(column,
  * value) response means from a second, and the nearest value per
  * column from a `min_by` over that (the level set never reaches the
  * driver, so a 10^7-cardinality column cannot OOM anything; the
  * reference materialises the whole per-level table). Columns with no
  * nulls at fit get no impute value and pass through, like the
  * reference (warning -> no-op). DOCUMENTED DIVERGENCE: the reference
  * breaks mean-response ties by nondeterministic groupby order; ties
  * break by smallest value here.
  */
class NearestMeanResponseImputer(
    val columns: Seq[String],
    val responseColumn: String
) extends BaseImputer {
  override def fitInputCols: Seq[String] = columns :+ responseColumn

  override def fit(df: DataFrame): this.type = {
    baseFitChecks(df)
    requireNumeric(df, columns :+ responseColumn)
    if (df.filter(col(responseColumn).isNull).limit(1).count() > 0)
      throw new IllegalArgumentException(
        s"$classname: y has null values (tubular/imputers.py:1640-1643)")
    val pair = explode(array(columns.map(c =>
      struct(lit(c).as("c"), col(c).cast("double").as("v"))): _*))
    val melted = df.select(pair.as("p"),
      col(responseColumn).cast("double").as("__y"))
      .select(col("p.c").as("c"), col("p.v").as("v"), col("__y"))
    // mean response of the null rows, per column (tiny result)
    val nullMeans = melted.filter(col("v").isNull)
      .groupBy("c").agg(avg(col("__y")).as("nm"))
    // nearest value = min_by over per-(column, value) means; ties ->
    // smallest value via the (diff, value) struct ordering
    val nearest = melted.filter(col("v").isNotNull)
      .groupBy("c", "v").agg(avg(col("__y")).as("m"))
      .join(nullMeans, Seq("c"))
      .groupBy("c")
      .agg(min(struct(abs(col("m") - col("nm")).as("d"),
        col("v").as("v"))).as("best"))
      .select(col("c"), col("best.v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    imputeValues = columns.flatMap(c => nearest.get(c).map(c -> _)).toMap
    fittedFlag = true
    this
  }

  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    columns.filter(imputeValues.contains).map { c =>
      c -> coalesce(col(c), lit(imputeValues(c)))
        .cast(df.schema(c).dataType)
    }

  override def initParams: Map[String, Any] =
    Map("columns" -> columns, "response_column" -> responseColumn)
}
