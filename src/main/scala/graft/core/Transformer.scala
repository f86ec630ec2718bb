package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Base of every column transformer.
  *
  * Re-expresses the reference's sklearn-style contract
  * (/root/reference/tubular/base.py:67-631) Spark-first:
  *   - `fit(df)` runs a distributed aggregation and collects only tiny
  *     per-column scalars/maps onto the driver (the fitted state);
  *   - `transformExprs` folds that state into Catalyst `Column`
  *     expressions (literals / `typedLit` maps — broadcast implicitly
  *     with the serialized plan);
  *   - `transform(df)` applies ALL expressions in ONE deterministic
  *     projection, so Catalyst collapses a whole pipeline of
  *     transformers into a single whole-stage-codegen'd Project over
  *     the scan — this is what makes a 100 TB transform a single
  *     map-only stage with no shuffle.
  */
abstract class Transformer extends Serializable {

  /** Input columns this transformer reads / rewrites. */
  def columns: Seq[String]

  def classname: String = getClass.getSimpleName

  protected var fittedFlag: Boolean = false

  /** True once fit() ran (stateless transformers are born fitted). */
  def needsFit: Boolean = false
  def isFitted: Boolean = !needsFit || fittedFlag

  /** Set when rebuilt from JSON: fit is then blocked (reference
    * block_from_json, tubular/_utils.py:251-272).
    */
  protected var transformOnly: Boolean = false
  def markTransformOnly(): this.type = { transformOnly = true; this }

  /** Reference BaseTransformer passthrough init args
    * (tubular/base.py:162-214): `copy` (deprecated there, X is never
    * mutated here), `verbose`, `return_native` — semantically inert on
    * Spark (immutable frames, engine-owned logging, one frame type)
    * but MODELED so a reference-emitted config round-trips
    * field-for-field instead of silently dropping keys.
    */
  protected var passthroughInit: Map[String, Any] = Map.empty
  private[core] def setPassthroughInit(m: Map[String, Any]): this.type = {
    passthroughInit = m; this
  }
  /** initParams plus the carried passthrough args — what the JSON
    * envelope actually serializes.
    */
  final def initParamsFull: Map[String, Any] = passthroughInit ++ initParams

  /** Columns read during fit (inputs plus any response/weight columns).
    * Pipeline fit-pass fusion uses this to decide whether a step may fit
    * against the same input frame as the steps before it.
    */
  def fitInputCols: Seq[String] = columns

  /** Columns this transformer writes/adds, if enumerable BEFORE fit;
    * None (e.g. one-hot without wanted_values — output names depend on
    * learned levels) makes the step a fusion barrier.
    */
  def writtenCols: Option[Seq[String]] = Some(featureNamesOut)

  /** Shared preconditions of every fit path (also invoked by
    * Pipeline's fused-fit path).
    */
  final def baseFitChecks(df: DataFrame): Unit = {
    if (transformOnly)
      throw new IllegalStateException(
        s"$classname: fit is blocked on a transformer loaded from JSON")
    columnsCheck(df)
  }

  /** Distributed fit pass. Default: column validation only.
    * Stateful transformers override and call super first.
    */
  def fit(df: DataFrame): this.type = {
    baseFitChecks(df)
    fittedFlag = true
    this
  }

  /** (outputName -> expression) pairs; names matching existing columns
    * replace them in place, new names append (reference
    * `get_transform_exprs` pattern, tubular/base.py:505-567).
    */
  def transformExprs(df: DataFrame): Seq[(String, Column)]

  /** Output feature names (get_feature_names_out,
    * tubular/base.py:220-244).
    */
  def featureNamesOut: Seq[String] = columns

  def transform(df: DataFrame): DataFrame = {
    if (!isFitted)
      throw new IllegalStateException(
        s"$classname: transform called before fit")
    columnsCheck(df)
    project(df, transformExprs(df))
  }

  /** One deterministic Project: keep existing columns in order
    * (replaced in place where renamed), then append new ones.
    */
  protected def project(
      df: DataFrame, exprs: Seq[(String, Column)]): DataFrame = {
    // duplicate output names would either be dropped silently
    // (toMap last-wins on a replacement) or appended as two
    // same-named columns that break every later reference with
    // AMBIGUOUS_REFERENCE — a transformer emitting one is a bug to
    // surface here, not downstream
    val dup = exprs.map(_._1).diff(exprs.map(_._1).distinct).distinct
    require(dup.isEmpty,
      s"$classname: duplicate output columns ${dup.mkString(", ")}")
    val existing = df.columns
    val replace = exprs.toMap
    val kept = existing.map(c =>
      replace.get(c).map(_.as(c)).getOrElse(col(c)))
    val added = exprs.collect {
      case (n, e) if !existing.contains(n) => e.as(n)
    }
    df.select(kept.toIndexedSeq ++ added: _*)
  }

  /** Columns-exist check (tubular/base.py:597-631). */
  def columnsCheck(df: DataFrame): Unit = {
    val missing = columns.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"$classname: columns ${missing.mkString(", ")} not in DataFrame " +
          s"(has ${df.columns.mkString(", ")})")
  }

  /** Numeric-dtype guard (tubular/mixins.py:18-72). */
  protected def requireNumeric(df: DataFrame, cols: Seq[String]): Unit =
    cols.foreach { c =>
      df.schema(c).dataType match {
        case _: NumericType | NullType => ()
        case dt => throw new IllegalArgumentException(
          s"$classname: column $c must be numeric, got $dt")
      }
    }

  /** String-like guard (tubular/nominal.py:239-295). */
  protected def requireStringLike(df: DataFrame, cols: Seq[String]): Unit =
    cols.foreach { c =>
      df.schema(c).dataType match {
        case StringType | NullType | BooleanType => ()
        case dt => throw new IllegalArgumentException(
          s"$classname: column $c must be string-like, got $dt")
      }
    }

  /** Datetime guard: all columns Date, or all Timestamp
    * (tubular/dates.py:202-292).
    */
  protected def requireConsistentDatetime(
      df: DataFrame, cols: Seq[String],
      timestampOnly: Boolean = false): Unit = {
    val dts = cols.map(c => c -> df.schema(c).dataType)
    dts.foreach {
      case (_, DateType) if !timestampOnly => ()
      case (_, _: TimestampType) => ()
      case (_, TimestampNTZType) => () // parquet µs-no-tz (session TZ=UTC)
      case (c, dt) => throw new IllegalArgumentException(
        s"$classname: column $c must be ${if (timestampOnly) "timestamp"
          else "date/timestamp"}, got $dt")
    }
    if (dts.map(_._2).distinct.size > 1)
      throw new IllegalArgumentException(
        s"$classname: mixed date/timestamp columns: $dts")
  }

  /** JSON round-trip hooks ({classname, init, fit} envelope,
    * tubular/base.py:246-337). Values limited to JSON scalars,
    * Seq and Map thereof.
    */
  def initParams: Map[String, Any]
  def fitParams: Map[String, Any] = Map.empty
  /** Restore fitted state from a parsed fit map; returns this. */
  def restoreFit(fit: Map[String, Any]): this.type = {
    fittedFlag = true
    this
  }
}

/** A fit that is ONE global aggregation: the transformer contributes
  * expressions to a fused `df.agg(...)` and absorbs its slice of the
  * single collected row. Pipeline uses this to fit several independent
  * transformers in ONE scan of the input — at 100 TB each avoided fit
  * pass is a full table scan saved.
  */
trait AggFittable { self: Transformer =>
  /** Aggregation expressions (validation included); may be empty when
    * this instance needs no data (e.g. user-supplied levels).
    */
  def fitAggExprs(df: DataFrame): Seq[Column]

  /** Consume `fitAggExprs.size` values starting at `offset` of the
    * fused row; must set all fitted state and the fitted flag.
    */
  def absorbAggRow(row: org.apache.spark.sql.Row, offset: Int): Unit
}
