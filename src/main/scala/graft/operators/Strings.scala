package graft.operators

import graft.core.Transformer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** String transformers (reference tubular/strings.py). Pure
  * projections.
  */

/** Lowercase in place (tubular/strings.py:34-162). */
class LowerCaseTransformer(val columns: Seq[String]) extends Transformer {
  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireStringLike(df, columns)
    columns.map(c => c -> lower(col(c)))
  }
  override def initParams: Map[String, Any] = Map("columns" -> columns)
}

/** Remove a set of characters (regex char class -> "")
  * (tubular/strings.py:388-565).
  */
class RemoveCharactersTransformer(
    val columns: Seq[String],
    val charsToRemove: Seq[String]
) extends Transformer {
  require(charsToRemove.nonEmpty, "charsToRemove must be non-empty")
  private val charClass: String =
    "[" + charsToRemove.map(java.util.regex.Pattern.quote).mkString + "]"
  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireStringLike(df, columns)
    columns.map(c => c -> regexp_replace(col(c), charClass, ""))
  }
  override def initParams: Map[String, Any] =
    Map("columns" -> columns, "characters_to_remove" -> charsToRemove)
}

/** `{col}_contains_{ref}: Boolean`; ref is a literal or another column
  * (literal, non-regex match) (tubular/strings.py:569-802).
  */
class StringContainsTransformer(
    val columns: Seq[String],
    val reference: Either[String, String], // Left=literal, Right=column
    val newColumnSuffix: Option[String] = None
) extends Transformer {
  private val refName = reference.fold(identity, identity)
  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireStringLike(df, columns)
    val refCol: Column = reference match {
      case Left(litStr) => lit(litStr)
      case Right(c) =>
        if (!df.columns.contains(c))
          throw new IllegalArgumentException(
            s"$classname: reference column $c not in DataFrame")
        col(c)
    }
    columns.map { c =>
      s"${c}_contains_${newColumnSuffix.getOrElse(refName)}" ->
        col(c).contains(refCol)
    }
  }
  override def featureNamesOut: Seq[String] =
    columns.map(c => s"${c}_contains_${newColumnSuffix.getOrElse(refName)}")
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns,
    "reference" -> refName,
    "reference_is_column" -> reference.isRight,
    "new_column_suffix" -> newColumnSuffix.orNull)
}

/** Split by a separator, emit first n parts as
  * `{col}_split_by_{by}_entry_{i}`; fewer parts -> null
  * (tubular/strings.py:166-384).
  */
class ExtractStringComponentsTransformer(
    val columns: Seq[String],
    val by: String,
    val nEntries: Int = 1
) extends Transformer {
  require(nEntries > 0, "nEntries must be positive")
  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireStringLike(df, columns)
    columns.flatMap { c =>
      val parts = split(col(c), java.util.regex.Pattern.quote(by))
      (0 until nEntries).map { i =>
        s"${c}_split_by_${by}_entry_$i" ->
          when(size(parts) > i, element_at(parts, i + 1))
      }
    }
  }
  override def featureNamesOut: Seq[String] =
    columns.flatMap(c =>
      (0 until nEntries).map(i => s"${c}_split_by_${by}_entry_$i"))
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "by" -> by, "n_entries" -> nEntries)
}
