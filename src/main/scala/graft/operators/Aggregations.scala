package graft.operators

import graft.core.Transformer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation transformers (reference tubular/aggregations.py). */
object Aggregations {
  val RowOverColumnAggs = Seq("min", "max", "mean", "sum", "median", "count")
  val ColumnsOverRowAggs = Seq("min", "max", "mean", "sum")
}

/** Attach per-group aggregates to every row:
  * `agg(col) OVER (PARTITION BY key)` semantics -> `{col}_{agg}`
  * (tubular/aggregations.py:219-444).
  *
  * NOT a window: every requested aggregate (median included) is a
  * per-key SCALAR, so the whole transform is ONE map-side-combined
  * `groupBy(key)` over the numeric columns plus an equi-join of the
  * |groups|-row stats side back onto the data. The big side never
  * shuffles for a window and never buffers a group in one task — the
  * unbounded-frame window formulation both exchanges AND sorts every
  * row of every key (an in-window exact percentile additionally
  * buffers whole groups: one 10^8-row hot key OOMs an executor).
  *
  * `broadcastStats` (default true) broadcast-hints the stats side:
  * one row per key, so for any realistic grouping key it is dimension-
  * sized and the join adds ZERO exchange on the data side. Set it
  * false for a pathological key whose cardinality approaches the row
  * count (per-key stats are near-meaningless there, but the option
  * exists) — the join then shuffles both sides instead of forcing an
  * OOM-sized broadcast. Join is null-safe (`<=>`) so a null key forms
  * its own group, like PARTITION BY did.
  */
class AggregateRowsOverColumnTransformer(
    val columns: Seq[String],
    val aggregations: Seq[String],
    val key: String,
    val broadcastStats: Boolean = true
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

  // transform is join-shaped, not a projection — exprs never used
  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    throw new UnsupportedOperationException(
      s"$classname transforms via aggregate + join, not a projection")

  override def transform(df: DataFrame): DataFrame = {
    if (!isFitted)
      throw new IllegalStateException(
        s"$classname: transform called before fit")
    columnsCheck(df)
    requireNumeric(df, columns)
    val aggExprs = columns.flatMap { c =>
      aggregations.map { a =>
        val e = a match {
          case "min" => min(col(c))
          case "max" => max(col(c))
          case "mean" => avg(col(c))
          case "sum" => sum(col(c))
          case "count" => count(col(c))
          case "median" => expr(s"percentile(`$c`, 0.5)")
        }
        e.as(s"__agg_${c}_$a")
      }
    }
    val stats = df.select(col(key).as("__aggkey") +:
        columns.map(c => col(c)): _*)
      .groupBy(col("__aggkey"))
      .agg(aggExprs.head, aggExprs.tail: _*)
    val statsSide = if (broadcastStats) broadcast(stats) else stats
    val joined = df.join(statsSide, col(key) <=> col("__aggkey"), "left")
    // reproduce project()'s output order exactly: existing columns (in
    // place, replaced if an output name collides), then appended agg
    // columns interleaved per (column, agg)
    val outFor = columns.flatMap(c => aggregations.map(a =>
      s"${c}_$a" -> s"__agg_${c}_$a")).toMap
    val finalOrder =
      df.columns.toSeq ++ featureNamesOut.filterNot(df.columns.contains)
    joined.select(finalOrder.map { n =>
      outFor.get(n).map(m => col(m).as(n)).getOrElse(col(n))
    }: _*)
  }

  override def featureNamesOut: Seq[String] =
    columns.flatMap(c => aggregations.map(a => s"${c}_$a"))
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "aggregations" -> aggregations, "key" -> key,
    "broadcast_stats" -> broadcastStats)
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
    // fully codegen'd null-ignoring horizontal folds: least/greatest
    // skip nulls natively, sum/mean fold coalesce(c, 0) with an
    // explicit non-null count — no interpreted `aggregate()` lambda in
    // what is a per-row hot path (HOF lambdas run outside whole-stage
    // codegen)
    val cs = columns.map(c => col(c).cast("double"))
    val nNonNull = cs.map(c =>
      when(c.isNotNull, lit(1)).otherwise(lit(0))).reduce(_ + _)
    val sumNN = cs.map(c => coalesce(c, lit(0.0))).reduce(_ + _)
    aggregations.map { a =>
      val e = a match {
        case "min" =>
          if (cs.size == 1) cs.head else least(cs: _*)
        case "max" =>
          if (cs.size == 1) cs.head else greatest(cs: _*)
        case "sum" => when(nNonNull > 0, sumNN)
        case "mean" => when(nNonNull > 0, sumNN / nNonNull)
      }
      s"${prefix}_$a" -> e
    }
  }
  override def featureNamesOut: Seq[String] =
    aggregations.map(a => s"${columns.mkString("_")}_$a")
  override def initParams: Map[String, Any] =
    Map("columns" -> columns, "aggregations" -> aggregations)
}
