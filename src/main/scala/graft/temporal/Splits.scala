package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe temporal cross-validation splits — the time-series
  * counterpart of the hash/cluster splits in
  * [[graft.text.Sharding]]: purged K-fold with embargo (Lopez de
  * Prado's protocol). Plain K-fold leaks on time-series features:
  * a rolling/as-of feature computed at `t` summarizes rows around
  * `t`, so train rows adjacent to the test interval carry test-set
  * information. The guard is to PURGE train rows whose feature
  * window overlaps the test interval's start and EMBARGO rows just
  * after its end (serial correlation flows forward).
  */
object Splits {

  /** Purged K-fold assignment with embargo, fully relational: the
    * time axis `[min_ts, max_ts]` (exact MICROSECOND integers, one
    * scalar agg) is cut into `k` equal contiguous fold intervals
    * `fold = (t - min) div span` with
    * `span = (max - min) div k + 1` (integer `div` throughout — a
    * 100 TB log spans > 2^53 micros of id-space arithmetic where
    * double division misplaces boundaries). For the chosen
    * `testFold`, each row gets a `role`:
    *
    *   - `test`     fold == testFold
    *   - `purged`   t in [test_start - purgeSeconds, test_start):
    *                its lookback feature window overlaps the test
    *                interval
    *   - `embargo`  t in (test_end, test_end + embargoSeconds]:
    *                too soon after the test interval (serial
    *                correlation)
    *   - `train`    everything else
    *
    * Null timestamps fail loudly (a null event time in a temporal
    * split is upstream corruption, not a category). Output adds
    * `fold` and `role`; the assignment is a pure codegen'd projection
    * after the one min/max agg — no shuffle, no per-row state.
    */
  def purgedKFold(df: DataFrame, tsCol: String, k: Int, testFold: Int,
      purgeSeconds: Long, embargoSeconds: Long): DataFrame = {
    require(k >= 2, s"need k >= 2 folds, got $k")
    require(testFold >= 0 && testFold < k,
      s"testFold must be in [0, $k), got $testFold")
    require(purgeSeconds >= 0 && embargoSeconds >= 0,
      "purge/embargo must be >= 0")
    val tUs = unix_micros(col(tsCol).cast("timestamp"))
    val b = df.agg(min(tUs).as("lo"), max(tUs).as("hi")).head()
    require(!b.isNullAt(0),
      s"purgedKFold: no non-null $tsCol values to split")
    val lo = b.getLong(0)
    val span = (b.getLong(1) - lo) / k + 1
    val testStart = lo + testFold.toLong * span
    val testEnd = testStart + span // exclusive
    val t = when(tUs.isNotNull, tUs).otherwise(raise_error(
      lit(s"purgedKFold: null $tsCol — temporal split needs a " +
        "timestamp on every row")))
    val withT = df.withColumn("__t_us", t)
    // integer `div`, not `/`: Spark's long/long is DOUBLE division,
    // which rounds past 2^53 (see packContextBlocks)
    val fold = expr(s"(__t_us - ${lo}L) div ${span}L")
    val tc = col("__t_us")
    val role = when(fold === testFold, lit("test"))
      .when(tc >= lit(testStart - purgeSeconds * 1000000L) &&
        tc < lit(testStart), lit("purged"))
      .when(tc >= lit(testEnd) &&
        tc < lit(testEnd + embargoSeconds * 1000000L), lit("embargo"))
      .otherwise(lit("train"))
    withT.withColumn("fold", fold).withColumn("role", role)
      .drop("__t_us")
  }

  /** Walk-forward (expanding-window) split — the production
    * counterpart of [[purgedKFold]] for models that only ever train
    * on the PAST: the time axis `[min_ts, max_ts]` is cut into
    * `k + 1` equal contiguous blocks (`block = (t − min) div span`,
    * exact integer `div` — same > 2^53 rationale as above). Block 0
    * is the seed-train block; block `f` (1..k) is fold f's TEST
    * window. Output adds `block` plus one `role_f<f>` column per
    * fold:
    *
    *   - `train`   block < f (strictly earlier history)
    *   - `purged`  within `gapSeconds` BEFORE the test window (its
    *               lookback feature window would straddle the cut)
    *   - `test`    block == f
    *   - `future`  block > f (never visible to fold f)
    *
    * Null timestamps fail loudly, like [[purgedKFold]]. The whole
    * assignment is a codegen'd projection after ONE min/max agg —
    * no shuffle, no per-row state, k roles = k CASE registers.
    */
  def walkForward(df: DataFrame, tsCol: String, k: Int,
      gapSeconds: Long = 0L): DataFrame = {
    require(k >= 1, s"walkForward: need k >= 1 folds, got $k")
    require(gapSeconds >= 0, "walkForward: gap must be >= 0")
    (1 to k).foreach(f => require(!df.columns.contains(s"role_f$f"),
      s"walkForward: input already has a 'role_f$f' column"))
    require(!df.columns.contains("block"),
      "walkForward: input already has a 'block' column")
    val tUs = unix_micros(col(tsCol).cast("timestamp"))
    val b = df.agg(min(tUs).as("lo"), max(tUs).as("hi")).head()
    require(!b.isNullAt(0),
      s"walkForward: no non-null $tsCol values to split")
    val lo = b.getLong(0)
    val span = (b.getLong(1) - lo) / (k + 1) + 1
    val t = when(tUs.isNotNull, tUs).otherwise(raise_error(
      lit(s"walkForward: null $tsCol — temporal split needs a " +
        "timestamp on every row")))
    val withT = df.withColumn("__t_us", t)
    val block = expr(s"(__t_us - ${lo}L) div ${span}L")
    val tc = col("__t_us")
    val roles = (1 to k).map { f =>
      val testStart = lo + f.toLong * span
      when(block === f, lit("test"))
        .when(block > f, lit("future"))
        .when(tc >= lit(testStart - gapSeconds * 1000000L),
          lit("purged"))
        .otherwise(lit("train"))
        .as(s"role_f$f")
    }
    withT.withColumn("block", block)
      .select(withT.columns.filterNot(_ == "__t_us").map(col)
        .toIndexedSeq ++ (col("block") +: roles): _*)
  }
}
