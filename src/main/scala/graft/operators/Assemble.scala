package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The last step before training: turn named feature columns into
  * the model-facing vector. Spark MLlib's `VectorAssembler` shape
  * without the MLlib dependency (tubular stops at the frame; a
  * training pipeline needs the row vector).
  */
object Assemble {

  /** Assemble `cols` (numeric, in order) into one `array<double>`
    * column plus an EXACT null bitmask (`bit i` set when `cols(i)`
    * was null or NaN before the policy applied — the mask is how a
    * consumer distinguishes a true 0.0 from an imputed one).
    *
    * `nullPolicy`:
    *   - `"zero"` — missing slots become 0.0 (the convention when
    *     imputers ran upstream and stragglers mean "absent");
    *   - `"keep"` — missing slots stay null inside the array (the
    *     consumer handles them).
    *
    * Pure codegen'd projection: no shuffle, no UDF, no fit. At most
    * 63 columns (the mask is one long); wider vectors should be
    * assembled in named groups anyway.
    */
  def features(df: DataFrame, cols: Seq[String],
      out: String = "features",
      nullPolicy: String = "zero"): DataFrame = {
    require(cols.nonEmpty && cols.size <= 63,
      s"Assemble.features: 1..63 columns, got ${cols.size}")
    require(Seq("zero", "keep").contains(nullPolicy),
      s"Assemble.features: nullPolicy zero|keep, got $nullPolicy")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"Assemble.features: missing $missing")
    val clash = Seq(out, s"${out}_null_mask").filter(df.columns.contains)
    require(clash.isEmpty,
      s"Assemble.features: output name(s) $clash already exist — an " +
        "ambiguous duplicate column would surface far from here")
    val vs = cols.map { c =>
      val v = col(c).cast("double")
      when(isnan(v), lit(null).cast("double")).otherwise(v)
    }
    val mask = vs.zipWithIndex.map { case (v, i) =>
      when(v.isNull, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val slots =
      if (nullPolicy == "zero") vs.map(v => coalesce(v, lit(0.0)))
      else vs
    df.select(df.columns.map(col).toIndexedSeq ++ Seq(
      array(slots: _*).as(out),
      mask.as(s"${out}_null_mask")): _*)
  }
}
