package graft.operators

import graft.core.Transformer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Comparison transformers (reference tubular/comparison.py). */

/** `a <op> b: Boolean` for op in {>, <, ==, !=}; either side null ->
  * null (explicit, tubular/functions/comparison.py:88-94);
  * numeric-only (tubular/comparison.py:437-443).
  */
class CompareTwoColumnsTransformer(
    val columnA: String, val columnB: String,
    val op: String,
    val newColumnName: Option[String] = None
) extends Transformer {
  require(Seq(">", "<", "==", "!=").contains(op), s"unknown op $op")
  val columns: Seq[String] = Seq(columnA, columnB)
  val outName: String = newColumnName.getOrElse(s"$columnA$op$columnB")
  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireNumeric(df, columns)
    val a = col(columnA); val b = col(columnB)
    val cmp = op match {
      case ">" => a > b
      case "<" => a < b
      case "==" => a === b
      case "!=" => a =!= b
    }
    Seq(outName -> when(a.isNotNull && b.isNotNull, cmp))
  }
  override def featureNamesOut: Seq[String] = Seq(outName)
  override def initParams: Map[String, Any] = Map(
    "column_a" -> columnA, "column_b" -> columnB, "op" -> op,
    "new_column_name" -> outName)
}

/** For each target column: when(boolCol) then thenCol else target
  * (tubular/comparison.py:34-257). The when-column must be Boolean and
  * targets must share the then-column's dtype
  * (tubular/comparison.py:240-251).
  */
class WhenThenOtherwiseTransformer(
    val columns: Seq[String], // target columns
    val whenColumn: String,
    val thenColumn: String
) extends Transformer {
  override def columnsCheck(df: DataFrame): Unit = {
    super.columnsCheck(df)
    Seq(whenColumn, thenColumn).foreach { c =>
      if (!df.columns.contains(c))
        throw new IllegalArgumentException(
          s"$classname: column $c not in DataFrame")
    }
    if (df.schema(whenColumn).dataType !=
        org.apache.spark.sql.types.BooleanType)
      throw new IllegalArgumentException(
        s"$classname: when column $whenColumn must be Boolean")
    val thenType = df.schema(thenColumn).dataType
    columns.foreach { c =>
      if (df.schema(c).dataType != thenType)
        throw new IllegalArgumentException(
          s"$classname: target $c dtype ${df.schema(c).dataType} != " +
            s"then column dtype $thenType (tubular/comparison.py:240-251)")
    }
  }
  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    columns.map(c =>
      c -> when(col(whenColumn), col(thenColumn)).otherwise(col(c)))
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "when_column" -> whenColumn,
    "then_column" -> thenColumn)
}
