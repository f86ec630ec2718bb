package graft

import graft.temporal.RangeJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval range join: exact results vs a
  * brute-force inequality join, equi-join physical plan (the naive
  * formulation is a BroadcastNestedLoopJoin), and the
  * runaway-interval guard.
  */
class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def fixtures() = {
    val events = df("k BIGINT, eid BIGINT, ts TIMESTAMP", Seq(
      Row(1L, 1L, ts("2024-01-01 10:00:00")),
      Row(1L, 2L, ts("2024-01-01 11:30:00")),
      Row(1L, 3L, ts("2024-01-01 13:00:00")),
      Row(2L, 4L, ts("2024-01-01 10:30:00")),
      Row(2L, 5L, ts("2024-01-02 09:00:00"))))
    val intervals = df("k BIGINT, iid BIGINT, s TIMESTAMP, e TIMESTAMP",
      Seq(
        Row(1L, 10L, ts("2024-01-01 09:30:00"), ts("2024-01-01 11:30:00")),
        Row(1L, 11L, ts("2024-01-01 11:00:00"), ts("2024-01-01 14:00:00")),
        Row(2L, 12L, ts("2024-01-01 00:00:00"), ts("2024-01-01 23:59:59")),
        Row(3L, 13L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))))
    (events, intervals)
  }

  test("matches the brute-force inequality join exactly") {
    val (events, intervals) = fixtures()
    val got = RangeJoin.pointInInterval(events, intervals, Seq("k"),
      "ts", "s", "e", bucketSeconds = 3600)
      .select("eid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = events.as("l").join(intervals.as("r"),
      col("l.k") === col("r.k") &&
        col("l.ts") >= col("r.s") && col("l.ts") <= col("r.e"))
      .select("eid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // boundary inclusion: event 2 at 11:30 is the END of interval 10
    // and inside 11 — both must appear
    assert(got.contains((2L, 10L)) && got.contains((2L, 11L)))
    assert(got == brute)
    // no duplicates despite intervals spanning many buckets
    val n = RangeJoin.pointInInterval(events, intervals, Seq("k"),
      "ts", "s", "e", bucketSeconds = 3600).count()
    assert(n == got.size)
  }

  test("plans as an equi-join, never a nested loop") {
    val (events, intervals) = fixtures()
    val q = RangeJoin.pointInInterval(events, intervals, Seq("k"),
      "ts", "s", "e", bucketSeconds = 3600)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
    val brute = events.as("l").join(intervals.as("r"),
      col("l.k") === col("r.k") &&
        col("l.ts") >= col("r.s") && col("l.ts") <= col("r.e"))
    // the naive formulation really is the quadratic plan we avoid
    // (equi-key + range predicates -> at best broadcast + filter; with
    // no equi key it is BroadcastNestedLoopJoin)
    val naive = events.as("l").join(intervals.as("r"),
      col("l.ts") >= col("r.s") && col("l.ts") <= col("r.e"))
    assert(naive.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(brute.count() >= 0) // both formulations still executable
  }

  test("runaway interval fails fast instead of exploding") {
    val (events, _) = fixtures()
    val wide = df("k BIGINT, iid BIGINT, s TIMESTAMP, e TIMESTAMP", Seq(
      Row(1L, 99L, ts("2024-01-01 00:00:00"), ts("2030-01-01 00:00:00"))))
    intercept[Exception] {
      RangeJoin.pointInInterval(events, wide, Seq("k"), "ts", "s", "e",
        bucketSeconds = 60, maxBucketsPerInterval = 1000).count()
    }
  }

  test("interval overlap: brute-force parity, exactly-once, no nested loop") {
    val a = df("k BIGINT, aid BIGINT, s TIMESTAMP, e TIMESTAMP", Seq(
      Row(1L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      Row(1L, 2L, ts("2024-01-01 11:59:59"), ts("2024-01-01 20:00:00")),
      Row(1L, 3L, ts("2024-01-02 00:00:00"), ts("2024-01-02 01:00:00")),
      Row(2L, 4L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"))))
    val b = df("k BIGINT, bid BIGINT, s2 TIMESTAMP, e2 TIMESTAMP", Seq(
      // long interval overlapping aid 1 and 2 across MANY buckets —
      // must still emit each pair once
      Row(1L, 10L, ts("2024-01-01 09:00:00"), ts("2024-01-01 23:00:00")),
      Row(1L, 11L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:30:00")),
      Row(1L, 12L, ts("2024-01-03 00:00:00"), ts("2024-01-03 01:00:00")),
      Row(2L, 13L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:30:00"))))
    val got = RangeJoin.intervalOverlap(a, b, Seq("k"),
      "s", "e", "s2", "e2", bucketSeconds = 900)
    val pairs = got.select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = a.join(b, a("k") === b("k") &&
        col("s") <= col("e2") && col("s2") <= col("e"))
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.length == pairs.toSet.size,
      s"duplicate pairs emitted: ${pairs.toSeq.sorted}")
    assert(pairs.toSet == brute)
    // boundary touch counts as overlap (aid 1 x bid 11 at 12:00:00)
    assert(pairs.toSet.contains((1L, 11L)))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
