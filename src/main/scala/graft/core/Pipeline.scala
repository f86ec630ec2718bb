package graft.core

import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Ordered transformer composition (reference sklearn Pipeline +
  * tubular/pipeline.py:10-113).
  *
  * `fit` threads one lazy DataFrame through the steps: each stateful
  * step triggers exactly one distributed aggregation (its fit-collect)
  * over the plan built so far; the final `transform` of the whole
  * pipeline is ONE composed logical plan that Catalyst collapses into a
  * single projection over the scan.
  */
class Pipeline(val steps: Seq[(String, Transformer)]) extends Serializable {
  require(steps.nonEmpty, "Pipeline needs at least one step")
  require(steps.map(_._1).distinct.size == steps.size,
    "duplicate step names")

  def fit(df: DataFrame): this.type = {
    steps.foldLeft(df) { case (cur, (_, t)) =>
      t.fit(cur)
      t.transform(cur)
    }
    this
  }

  def transform(df: DataFrame): DataFrame =
    steps.foldLeft(df) { case (cur, (_, t)) => t.transform(cur) }

  def fitTransform(df: DataFrame): DataFrame = { fit(df); transform(df) }

  def featureNamesOut: Seq[String] = steps.flatMap(_._2.featureNamesOut)

  /** JSON dump of the whole (fitted) pipeline
    * (dump_pipeline_to_json, tubular/pipeline.py:10-113).
    */
  def toJson: String = {
    val arr = JArray(steps.toList.map { case (name, t) =>
      JObject(List(
        JField("name", JString(name)),
        JField("transformer",
          JsonMethods.parse(Json.transformerToJson(t)))))
    })
    JsonMethods.compact(JsonMethods.render(
      JObject(List(
        JField("graftspark_version", JString(Json.Version)),
        JField("steps", arr)))))
  }
}

object Pipeline {
  def apply(steps: (String, Transformer)*): Pipeline = new Pipeline(steps)

  /** Rebuild a transform-only pipeline from JSON
    * (load_pipeline_from_json, tubular/pipeline.py:108-113).
    */
  def fromJson(json: String): Pipeline = {
    val parsed = JsonMethods.parse(json)
    val steps = (parsed \ "steps") match {
      case JArray(items) => items.map { item =>
        val name = (item \ "name") match {
          case JString(s) => s
          case _ => throw new IllegalArgumentException("step missing name")
        }
        val t = Json.transformerFromJson(
          JsonMethods.compact(JsonMethods.render(item \ "transformer")))
        name -> t
      }
      case _ => throw new IllegalArgumentException("missing steps")
    }
    new Pipeline(steps)
  }
}
