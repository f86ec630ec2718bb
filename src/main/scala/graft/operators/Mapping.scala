package graft.operators

import graft.core.Transformer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stateless value mapping (reference tubular/mapping.py:27-565).
  *
  * Semantics (BaseMappingTransformMixin.transform,
  * tubular/mapping.py:277-416):
  *   - keys present in the map are replaced by their mapped value;
  *   - values NOT in the map pass through unchanged;
  *   - an (at most one) null key maps nulls to `nullMappings(col)`;
  *   - result cast to `returnDtypes(col)` (inferred from mapping values
  *     when unspecified).
  *
  * The level->value map becomes a Catalyst literal map
  * (`typedLit` + `element_at`) — constant-folded, codegen'd, shipped
  * with the plan; no join, no shuffle. For maps beyond ~1e5 entries use
  * a broadcast join instead (not needed for tubular-scale category maps).
  */
class MappingTransformer(
    val mappings: Map[String, Map[Option[String], Any]],
    val returnDtypes: Map[String, DataType] = Map.empty
) extends Transformer {
  val columns: Seq[String] = mappings.keys.toSeq

  mappings.foreach { case (c, m) =>
    require(m.nonEmpty, s"$classname: empty mapping for $c")
  }

  private def inferDtype(m: Map[Option[String], Any]): DataType = {
    val vs = m.values
    if (vs.forall(_.isInstanceOf[Boolean])) BooleanType
    else if (vs.forall(v => v.isInstanceOf[Int] || v.isInstanceOf[Long]))
      LongType
    else if (vs.forall(_.isInstanceOf[Number])) DoubleType
    else StringType
  }

  def dtypeFor(c: String): DataType =
    returnDtypes.getOrElse(c, inferDtype(mappings(c)))

  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    columns.map { c =>
      val dt = dtypeFor(c)
      val nonNull: Map[String, String] = mappings(c).collect {
        case (Some(k), v) => k -> String.valueOf(v)
      }
      val nullMapping: Option[Any] = mappings(c).collectFirst {
        case (None, v) => v
      }
      val asStr = col(c).cast("string")
      val mapped =
        if (nonNull.isEmpty) col(c).cast(dt)
        else when(asStr.isin(nonNull.keys.toSeq: _*),
            element_at(typedLit(nonNull), asStr).cast(dt))
          .otherwise(col(c).cast(dt))
      val withNull = nullMapping match {
        case Some(v) => when(col(c).isNull, lit(v).cast(dt)).otherwise(mapped)
        case None => mapped
      }
      c -> withNull
    }

  override def initParams: Map[String, Any] = Map(
    "mappings" -> mappings.map { case (c, m) =>
      c -> m.map { case (k, v) => k.getOrElse("null") -> v } },
    "return_dtypes" -> returnDtypes.map { case (c, dt) =>
      c -> dt.simpleString })
}
