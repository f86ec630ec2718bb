package graft.operators

import graft.core.Transformer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Aggregation transformers (reference tubular/aggregations.py). */
object Aggregations {
  val RowOverColumnAggs = Seq("min", "max", "mean", "sum", "median", "count")
  val ColumnsOverRowAggs = Seq("min", "max", "mean", "sum")
}

/** Attach per-group aggregates to every row:
  * `agg(col) OVER (PARTITION BY key)` -> `{col}_{agg}`
  * (tubular/aggregations.py:219-444).
  *
  * One hash Exchange on the key; all requested aggregates share that
  * single Window spec so Catalyst plans ONE shuffle + one Window node.
  * Exact median goes through a groupBy + broadcast join-back instead
  * (see [[transform]]): an in-window percentile would buffer whole
  * groups in single tasks.
  */
class AggregateRowsOverColumnTransformer(
    val columns: Seq[String],
    val aggregations: Seq[String],
    val key: String
) extends Transformer {
  aggregations.foreach(a =>
    require(Aggregations.RowOverColumnAggs.contains(a),
      s"unknown aggregation $a"))

  override def columnsCheck(df: DataFrame): Unit = {
    super.columnsCheck(df)
    if (!df.columns.contains(key))
      throw new IllegalArgumentException(
        s"$classname: key column $key not in DataFrame " +
          "(tubular/aggregations.py:436-438)")
  }

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireNumeric(df, columns)
    val w = Window.partitionBy(col(key))
    columns.flatMap { c =>
      aggregations.filterNot(_ == "median").map { a =>
        val e = a match {
          case "min" => min(col(c)).over(w)
          case "max" => max(col(c)).over(w)
          case "mean" => avg(col(c)).over(w)
          case "sum" => sum(col(c)).over(w)
          case "count" => count(col(c)).over(w)
        }
        s"${c}_$a" -> e
      }
    }
  }

  /** Median goes through groupBy + join-back, NOT `percentile OVER
    * (PARTITION BY key)`: an unbounded-window exact percentile buffers
    * every column of every row of a key inside one task, so one hot key
    * with 10^8 rows OOMs an executor at scale. The groupBy aggregate
    * buffers only the numeric values (partial-aggregated map-side) and
    * the join back runs on the same hash partitioning the window
    * aggregates already established, so no extra exchange of the big
    * side. Join is null-safe (`<=>`) to keep the window semantics of a
    * null key forming its own group.
    */
  override def transform(df: DataFrame): DataFrame = {
    if (!isFitted)
      throw new IllegalStateException(
        s"$classname: transform called before fit")
    columnsCheck(df)
    requireNumeric(df, columns)
    val base = project(df, transformExprs(df))
    if (!aggregations.contains("median")) return base
    val medAggs = columns.map(c =>
      expr(s"percentile(`$c`, 0.5)").as(s"__med_$c"))
    val meds = df.select(col(key).as("__medkey") +:
        columns.map(c => col(c)): _*)
      .groupBy(col("__medkey"))
      .agg(medAggs.head, medAggs.tail: _*)
    // the medians side is |groups| rows — broadcast it so the join
    // adds NO exchange/sort on the big side (the window aggregates'
    // hash partitioning is the only shuffle in the whole transform)
    val joined = base.join(broadcast(meds),
      col(key) <=> col("__medkey"), "left")
    // reproduce project()'s output order exactly: existing columns (in
    // place), then appended agg columns interleaved per (column, agg)
    val medFor = columns.map(c => s"${c}_median" -> s"__med_$c").toMap
    val allOut = featureNamesOut
    val finalOrder = df.columns.toSeq ++ allOut.filterNot(df.columns.contains)
    joined.select(finalOrder.map { n =>
      medFor.get(n).map(m => col(m).as(n)).getOrElse(col(n))
    }: _*)
  }

  override def featureNamesOut: Seq[String] =
    columns.flatMap(c => aggregations.map(a => s"${c}_$a"))
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "aggregations" -> aggregations, "key" -> key)
}

/** Horizontal (row-wise) aggregates across columns ->
  * `{c1}_{c2}_..._{agg}` (tubular/aggregations.py:448-614).
  * Polars horizontal semantics: nulls are IGNORED (not propagated).
  */
class AggregateColumnsOverRowTransformer(
    val columns: Seq[String],
    val aggregations: Seq[String]
) extends Transformer {
  aggregations.foreach(a =>
    require(Aggregations.ColumnsOverRowAggs.contains(a),
      s"unknown aggregation $a (median/count deliberately excluded, " +
        "tubular/functions/aggregations.py:10-19)"))

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireNumeric(df, columns)
    val prefix = columns.mkString("_")
    val arr = array(columns.map(c => col(c).cast("double")): _*)
    val nonNull = filter(arr, x => x.isNotNull)
    aggregations.map { a =>
      val e = a match {
        case "min" => array_min(nonNull)
        case "max" => array_max(nonNull)
        case "sum" =>
          when(size(nonNull) > 0,
            aggregate(nonNull, lit(0.0), (acc, x) => acc + x))
        case "mean" =>
          when(size(nonNull) > 0,
            aggregate(nonNull, lit(0.0), (acc, x) => acc + x) /
              size(nonNull))
      }
      s"${prefix}_$a" -> e
    }
  }
  override def featureNamesOut: Seq[String] =
    aggregations.map(a => s"${columns.mkString("_")}_$a")
  override def initParams: Map[String, Any] =
    Map("columns" -> columns, "aggregations" -> aggregations)
}
