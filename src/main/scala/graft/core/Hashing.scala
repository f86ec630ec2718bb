package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing, defined ONCE: every operator that needs a
  * hash an external engine must reproduce exactly (dedup signatures,
  * CMS buckets, dataset splits, sampling keys) routes through here, so
  * the fold rule and its DuckDB mirror
  * (`CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)`) can never
  * drift apart between call sites.
  */
object Hashing {

  /** md5 folded to the first 15 hex digits = a uniform non-negative
    * 60-bit long. 60 bits keeps the value exactly representable (and
    * arithmetic-safe) in every engine's signed int64.
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
}
