package graft.operators

import graft.core.Transformer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Misc transformers (reference tubular/misc.py). */

/** Set columns to a constant (tubular/misc.py:29-182). */
class SetValueTransformer(
    val columns: Seq[String],
    val value: Any
) extends Transformer {
  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    columns.map(c => c -> lit(value))
  override def initParams: Map[String, Any] =
    Map("columns" -> columns, "value" -> value)
}

/** COPY a column under a new name (original kept); errors if the new
  * name already exists (tubular/misc.py:186-423, guard at :410-415).
  */
class RenameColumnsTransformer(
    val renames: Map[String, String] // old -> new
) extends Transformer {
  val columns: Seq[String] = renames.keys.toSeq
  override def columnsCheck(df: DataFrame): Unit = {
    super.columnsCheck(df)
    val clash = renames.values.filter(df.columns.contains)
    if (clash.nonEmpty)
      throw new IllegalArgumentException(
        s"$classname: new names ${clash.mkString(", ")} already exist " +
          "(tubular/misc.py:410-415)")
  }
  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    renames.toSeq.map { case (o, n) => n -> col(o) }
  override def featureNamesOut: Seq[String] = renames.values.toSeq
  override def initParams: Map[String, Any] = Map("mappings" -> renames)
}

/** Cast columns to a named dtype (tubular/misc.py:427-584). */
class ColumnDtypeSetter(
    val columns: Seq[String],
    val dtype: String
) extends Transformer {
  private val Allowed: Map[String, DataType] = Map(
    "Float64" -> DoubleType, "Float32" -> FloatType,
    "Int64" -> LongType, "Int32" -> IntegerType,
    "Int16" -> ShortType, "Int8" -> ByteType,
    // no unsigned ints in Spark: widen to the next signed size that
    // holds the full unsigned range; UInt64 needs 20 decimal digits
    // (functions/misc.py:62-65, SURVEY §1.3)
    "UInt8" -> ShortType, "UInt16" -> IntegerType,
    "UInt32" -> LongType, "UInt64" -> DecimalType(20, 0),
    "Boolean" -> BooleanType, "String" -> StringType,
    "Categorical" -> StringType) // no categorical dtype in Spark (§1.3)
  require(Allowed.contains(dtype), s"unknown dtype $dtype")
  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    columns.map(c => c -> col(c).cast(Allowed(dtype)))
  override def initParams: Map[String, Any] =
    Map("columns" -> columns, "dtype" -> dtype)
}

/** Typed JSON field extraction from a string column (no reference
  * counterpart — tubular never ingests; this is the raw-event-log
  * leg every web-scale pipeline starts with): each output column is
  * `get_json_object(column, path)` cast to a declared dtype. A pure
  * codegen'd projection — no UDF, no schema inference pass over the
  * data (the paths + dtypes ARE the declared schema, so a 100 TB scan
  * stays one map stage and bad records become nulls instead of
  * poisoning a sampled inference). Missing path, malformed JSON, or
  * an uncastable value -> null (SQL convention); use a downstream
  * NullIndicator/imputer for explicit handling.
  *
  * `fields`: (outputColumn, jsonPath, dtype) — dtype from the
  * ColumnDtypeSetter whitelist ("Int64", "Float64", "String",
  * "Boolean", ...). Paths are `$.a.b` get_json_object syntax.
  */
class JsonFieldExtractor(
    val column: String,
    val fields: Seq[(String, String, String)]
) extends Transformer {
  require(fields.nonEmpty, s"$classname: fields must be non-empty")
  private val Allowed: Map[String, DataType] = Map(
    "Float64" -> DoubleType, "Float32" -> FloatType,
    "Int64" -> LongType, "Int32" -> IntegerType,
    "Boolean" -> BooleanType, "String" -> StringType)
  fields.foreach { case (_, _, dt) =>
    require(Allowed.contains(dt),
      s"$classname: unknown dtype $dt (allowed: ${Allowed.keys.mkString(", ")})")
  }
  override def columns: Seq[String] = Seq(column)
  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    fields.map { case (out, path, dt) =>
      out -> get_json_object(col(column), path).cast(Allowed(dt))
    }
  override def featureNamesOut: Seq[String] = fields.map(_._1)
  override def initParams: Map[String, Any] = Map(
    "column" -> column,
    "fields" -> fields.map(f => Seq(f._1, f._2, f._3)))
}
