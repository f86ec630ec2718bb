package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy audits for training-data release: the structural
  * complement of the regex PII scrub ([[graft.text.TextOps]]) —
  * scrubbing hides direct identifiers, but a row can still be
  * re-identified when its QUASI-identifier combination (nation x
  * account band x ...) is near-unique. k-anonymity / l-diversity are
  * the standard gates before publishing such a table.
  *
  * Shape: ONE map-side-combined groupBy over the quasi columns
  * (\|equivalence classes\| rows on the wire) plus a broadcastable
  * join-back — never a `PARTITION BY quasi` window, which would sort
  * whole classes inside single tasks at 100 TB.
  */
object Privacy {

  /** Per-row k-anonymity / l-diversity audit: appends
    * `eq_class_size` (rows sharing this row's quasi-identifier
    * combination), `sensitive_diversity` (distinct non-null sensitive
    * values within the class), and the release-gate flags
    * `k_anonymous` (size >= k) and `l_diverse` (diversity >= l).
    * Null quasi values are their own level (a null ZIP code is still
    * a bucket an attacker can condition on).
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need >= 1 quasi-identifier column")
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    val stats = df
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("eq_class_size"),
        count_distinct(col(sensitiveCol)).as("sensitive_diversity"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) ++ Seq(
        col("eq_class_size"), col("sensitive_diversity")): _*)
    val cond = quasiCols.map(c => df(c) <=> stats(s"__q_$c"))
      .reduce(_ && _)
    df.join(stats, cond, "left")
      .drop(quasiCols.map(c => s"__q_$c"): _*)
      .withColumn("k_anonymous", col("eq_class_size") >= k)
      .withColumn("l_diverse", col("sensitive_diversity") >= l)
  }

  /** Release summary: one row — class count, rows in classes below
    * `k`, the minimum class size, and the worst (lowest) sensitive
    * diversity. The number a data-release checklist records.
    */
  def kAnonymitySummary(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        count_distinct(col(sensitiveCol)).as("__d"))
      .agg(count(lit(1)).as("eq_classes"),
        sum(when(col("__n") < k, col("__n")).otherwise(lit(0L)))
          .as("rows_below_k"),
        min(col("__n")).as("min_class_size"),
        min(col("__d")).as("min_diversity"))
}
