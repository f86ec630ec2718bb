package graft.core

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField}

/** Category-universe metadata on encoder outputs (SURVEY §1.3: the
  * reference's Enum/Categorical dtype carries its category set on the
  * column, `tubular/nominal.py:487-507`; Spark's analogue is
  * `StructField.metadata`). Every fitted categorical encoder stamps
  * its output columns with the learned level universe and the source
  * column, so a downstream consumer can recover the categories from
  * the OUTPUT SCHEMA alone — no transformer state needed (schema
  * travels with parquet/Iceberg tables; fitted JSON does not).
  *
  * Alias propagation: Spark's `Alias.metadata` inherits from a named
  * child when no explicit metadata is given, so the stamp survives the
  * final `project(...)` re-alias and lands on the written StructField.
  */
object CategoryMetadata {
  val CategoriesKey = "graft.categories"
  val SourceKey = "graft.source_column"

  def of(sourceColumn: String, categories: Seq[String]): Metadata =
    new MetadataBuilder()
      .putStringArray(CategoriesKey, categories.toArray)
      .putString(SourceKey, sourceColumn)
      .build()

  /** Read the category universe back from an output schema field. */
  def categories(field: StructField): Option[Seq[String]] =
    if (field.metadata.contains(CategoriesKey))
      Some(field.metadata.getStringArray(CategoriesKey).toSeq)
    else None

  def sourceColumn(field: StructField): Option[String] =
    if (field.metadata.contains(SourceKey))
      Some(field.metadata.getString(SourceKey))
    else None
}
