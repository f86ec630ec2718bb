package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe point-in-interval range join.
  *
  * Spark plans an inequality-only join (`l.ts BETWEEN r.start AND
  * r.end`) as BroadcastNestedLoopJoin — O(|events| x |intervals|) work
  * and a broadcast of one whole side; at 100 TB that is the single
  * most common accidental quadratic in analytics code. This operator
  * turns it into an EQUI-join: time is tiled into fixed buckets,
  * events carry their bucket, each interval explodes to the buckets it
  * covers, and the exact predicate filters inside the matched bucket.
  * The plan is a plain hash exchange on (keys, bucket) — shuffle
  * volume O(|events| + |intervals| x avg_buckets_per_interval), no
  * nested loop anywhere (spec-asserted).
  *
  * Every (event, interval) pair meets in EXACTLY one bucket — the
  * event's own — so no post-join dedup is needed.
  *
  * `bucketSeconds` tunes the tradeoff: ~the typical interval length is
  * right (each interval then explodes to ~2 buckets). Degenerate skew
  * (an interval spanning the whole timeline) explodes to
  * timeline/bucketSeconds rows — cap with `maxBucketsPerInterval`,
  * which fails fast instead of silently producing a hot partition.
  */
object RangeJoin {

  def pointInInterval(
      events: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      ts: String,
      start: String,
      end: String,
      bucketSeconds: Long,
      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val w = lit(bucketSeconds)
    def bucketOf(c: Column): Column =
      floor(unix_timestamp(c) / w).cast("long")

    val lB = events.withColumn("__bkt", bucketOf(col(ts)))
    val span = (bucketOf(col(end)) - bucketOf(col(start)) + 1).cast("int")
    // the guard wraps the LIVE sequence expression (a separate guard
    // column would be pruned away unevaluated)
    val rB = intervals
      .withColumn("__bkt", explode(
        when(assert_true(span <= maxBucketsPerInterval,
          lit(s"range join interval exceeds $maxBucketsPerInterval " +
            "buckets — raise bucketSeconds or cap interval lengths"))
          .isNull,
          sequence(bucketOf(col(start)), bucketOf(col(end))))))

    lB.join(rB, keyCols :+ "__bkt")
      .filter(col(ts) >= col(start) && col(ts) <= col(end))
      .drop("__bkt")
  }

  /** Interval-overlap join: pairs of intervals (same keys) with
    * `[s1,e1] ∩ [s2,e2] ≠ ∅`. Same tiling as [[pointInInterval]], but
    * two overlapping intervals share EVERY bucket of their overlap —
    * the pair is emitted only from the FIRST shared bucket
    * (`max(bucket(s1), bucket(s2))`), so the join is exactly-once with
    * no distinct/shuffle-dedup stage (the same trick the streaming
    * phash dedup uses across bands).
    *
    * `left`/`right` must expose the same key columns; start/end column
    * names may differ per side. Self-joins: alias the frame and pass
    * an id filter downstream.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucketSeconds: Long,
      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val w = lit(bucketSeconds)
    def bucketOf(c: Column): Column =
      floor(unix_timestamp(c) / w).cast("long")
    def tiled(df: DataFrame, s: String, e: String): DataFrame = {
      val span = (bucketOf(col(e)) - bucketOf(col(s)) + 1).cast("int")
      df.withColumn("__bkt", explode(
        when(assert_true(span <= maxBucketsPerInterval,
          lit(s"interval exceeds $maxBucketsPerInterval buckets — " +
            "raise bucketSeconds or cap interval lengths")).isNull,
          sequence(bucketOf(col(s)), bucketOf(col(e))))))
    }
    tiled(left, leftStart, leftEnd)
      .join(tiled(right, rightStart, rightEnd), keyCols :+ "__bkt")
      .filter(col(leftStart) <= col(rightEnd) &&
        col(rightStart) <= col(leftEnd))
      // exactly-once: only the first bucket both intervals cover emits
      .filter(col("__bkt") ===
        greatest(bucketOf(col(leftStart)), bucketOf(col(rightStart))))
      .drop("__bkt")
  }
}
