package graft.core

import org.apache.spark.sql.SparkSession

/** Guard rails for fits that collect learned level sets to the driver.
  *
  * Level-map transformers (GroupRareLevels, MeanResponse, OneHot) are
  * inherently bounded by the number of DISTINCT levels, not rows — but a
  * mistakenly-keyed column (an ID passed as a category) would otherwise
  * OOM the driver silently at 100 TB. These caps turn that into a clean,
  * actionable error. The reference has the same flaw and no guard
  * (tubular/nominal.py collects full level sets unconditionally).
  */
object Limits {

  /** Max total learned levels a single fit may collect to the driver
    * (across all of the transformer's columns). Runtime-tunable:
    * `spark.conf.set("graft.maxFitLevels", n)`.
    */
  def maxFitLevels(spark: SparkSession): Int =
    spark.conf.getOption("graft.maxFitLevels")
      .map(_.toInt).getOrElse(1000000)

  /** Above this many learned levels, encoders switch the transform from
    * a literal-map lookup to a broadcast join: Spark's map literals
    * (`ArrayBasedMapData`) are searched LINEARLY per row, so a 100k-level
    * `element_at` costs O(levels) per input row, while a broadcast hash
    * join is O(1) per row and still shuffle-free. Runtime-tunable:
    * `spark.conf.set("graft.maxLiteralMapSize", n)`.
    */
  def maxLiteralMapSize(spark: SparkSession): Int =
    spark.conf.getOption("graft.maxLiteralMapSize")
      .map(_.toInt).getOrElse(10000)

  /** Clean error for a blown cap. */
  def levelCapError(classname: String, cap: Int, what: String): Nothing =
    throw new IllegalArgumentException(
      s"$classname: fit would collect more than $cap learned levels " +
        s"($what). A column this high-cardinality is almost certainly " +
        "an identifier, not a category; drop it from `columns` or raise " +
        "spark.conf graft.maxFitLevels explicitly.")
}
