package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** Windowed feature ops over (entity, ts)-ordered data — BASELINE.json
  * north_rule extensions (absent from the reference; SURVEY.md §2.11).
  *
  * Every op here shares `Window.partitionBy(entity).orderBy(ts)`;
  * stacking several of them produces ONE Exchange(hashpartition(entity))
  * + ONE Sort(entity, ts) + consecutive Window nodes — the
  * "secondary sort within entity partitions" execution shape. Verify
  * with `.explain("formatted")`: a chain of these ops must show exactly
  * one Exchange.
  */
object WindowOps {

  private def w(entity: String, ts: String): WindowSpec =
    Window.partitionBy(col(entity)).orderBy(col(ts))

  /** Forward-fill: null feature values take the nearest PREVIOUS
    * non-null within the entity, ordered by ts.
    */
  def forwardFill(df: DataFrame, entity: String, ts: String,
      cols: Seq[String]): DataFrame = {
    val spec = w(entity, ts).rowsBetween(Window.unboundedPreceding, 0)
    val exprs = cols.map(c =>
      coalesce(col(c), last(col(c), ignoreNulls = true).over(spec))
        .as(s"${c}_ffill"))
    df.select(df.columns.map(col).toIndexedSeq ++ exprs: _*)
  }

  /** Backfill: nearest NEXT non-null within entity. */
  def backFill(df: DataFrame, entity: String, ts: String,
      cols: Seq[String]): DataFrame = {
    val spec = w(entity, ts).rowsBetween(0, Window.unboundedFollowing)
    val exprs = cols.map(c =>
      coalesce(col(c), first(col(c), ignoreNulls = true).over(spec))
        .as(s"${c}_bfill"))
    df.select(df.columns.map(col).toIndexedSeq ++ exprs: _*)
  }

  /** lag/lead by k within entity-by-ts. */
  def lagLead(df: DataFrame, entity: String, ts: String,
      cols: Seq[String], k: Int = 1): DataFrame = {
    val spec = w(entity, ts)
    val exprs = cols.flatMap(c => Seq(
      lag(col(c), k).over(spec).as(s"${c}_lag$k"),
      lead(col(c), k).over(spec).as(s"${c}_lead$k")))
    df.select(df.columns.map(col).toIndexedSeq ++ exprs: _*)
  }

  /** Rolling aggregates over the last `k` ROWS (inclusive of current). */
  def rollingRows(df: DataFrame, entity: String, ts: String,
      cols: Seq[String], k: Int,
      aggs: Seq[String] = Seq("sum", "mean", "min", "max", "count"))
      : DataFrame = {
    val spec = w(entity, ts).rowsBetween(-(k - 1), 0)
    val exprs = cols.flatMap(c => aggs.map(a =>
      aggExpr(a, col(c)).over(spec).as(s"${c}_roll${k}_$a")))
    df.select(df.columns.map(col).toIndexedSeq ++ exprs: _*)
  }

  /** Rolling aggregates over a trailing TIME range of `seconds`
    * (inclusive of current row's instant).
    */
  def rollingRange(df: DataFrame, entity: String, ts: String,
      cols: Seq[String], seconds: Long,
      aggs: Seq[String] = Seq("sum", "mean", "min", "max", "count"))
      : DataFrame = {
    val spec = Window.partitionBy(col(entity))
      .orderBy(unix_micros(col(ts).cast("timestamp")))
      .rangeBetween(-seconds * 1000000L, 0)
    val exprs = cols.flatMap(c => aggs.map(a =>
      aggExpr(a, col(c)).over(spec).as(s"${c}_rng${seconds}s_$a")))
    df.select(df.columns.map(col).toIndexedSeq ++ exprs: _*)
  }

  private def aggExpr(a: String, c: Column): Column = a match {
    case "sum" => sum(c)
    case "mean" => avg(c)
    case "min" => min(c)
    case "max" => max(c)
    case "count" => count(c)
    case other => throw new IllegalArgumentException(s"unknown agg $other")
  }

  /** Gap-based sessionization: a new session starts when
    * ts - lag(ts) > gapSeconds (or at the entity's first row);
    * session_id = running count of session starts. Two stacked windows
    * with the SAME partitioning -> one shuffle + one sort.
    */
  def sessionize(df: DataFrame, entity: String, ts: String,
      gapSeconds: Long,
      sessionCol: String = "session_id"): DataFrame = {
    val spec = w(entity, ts)
    val prev = lag(unix_micros(col(ts).cast("timestamp")), 1).over(spec)
    val isNew = when(prev.isNull ||
      (unix_micros(col(ts).cast("timestamp")) - prev >
        gapSeconds * 1000000L), 1L).otherwise(0L)
    // window-in-window is illegal, so materialise is_new in a first
    // projection; both windows share (entity, ts) -> still one Exchange
    val runningSpec = w(entity, ts).rowsBetween(Window.unboundedPreceding, 0)
    df.select(df.columns.map(col).toIndexedSeq :+
      isNew.as("__is_new"): _*)
      .select(df.columns.map(col).toIndexedSeq :+
        sum(col("__is_new")).over(runningSpec).as(sessionCol): _*)
  }
}
