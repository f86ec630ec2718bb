package graft

import graft.temporal.Sequential
import org.apache.spark.sql.Row
import java.sql.Timestamp

class SequentialSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cusum: golden recurrence, zero resets, null carry, entity reset") {
    val d = df("e BIGINT, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row(1L, ts("2024-01-01 10:00:00"), 1L, 12.0),
      Row(1L, ts("2024-01-01 10:10:00"), 2L, 5.0),
      Row(1L, ts("2024-01-01 10:20:00"), 3L, 20.0),
      Row(1L, ts("2024-01-01 10:30:00"), 4L, null),
      Row(1L, ts("2024-01-01 10:40:00"), 5L, 1.0),
      Row(2L, ts("2024-01-01 10:00:00"), 6L, 100.0)))
    val out = Sequential.cusum(d, "e", "ts", "id", "v",
      target = 10.0, slack = 0.0, threshold = 8.0).orderBy("id")
    assert(column(out, "cusum_pos") == Seq(2.0, 0.0, 10.0, 10.0, 1.0, 90.0))
    assert(column(out, "cusum_neg") == Seq(0.0, 5.0, 0.0, 0.0, 9.0, 0.0))
    // alarms: sp=10 > 8 at rows 3-4, sn=9 > 8 at row 5; entity 2's
    // fresh state proves the boundary reset (90 > 8 on its own)
    assert(column(out, "alarm") ==
      Seq(false, false, true, true, true, true))
    intercept[IllegalArgumentException] {
      Sequential.cusum(d, "e", "ts", "id", "v", 10.0, -1.0, 8.0)
    }
    intercept[IllegalArgumentException] {
      Sequential.cusum(d, "e", "ts", "id", "v", 10.0, 0.0, 0.0)
    }
  }

  test("cusum: ts ties break by id deterministically") {
    val t0 = ts("2024-01-01 10:00:00")
    val d = df("e BIGINT, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row(1L, t0, 2L, 0.0), Row(1L, t0, 1L, 30.0)))
    // id=1 (v=30, +20) runs first, then id=2 (v=0, -10)
    val out = Sequential.cusum(d, "e", "ts", "id", "v",
      target = 10.0, slack = 0.0, threshold = 1000.0).orderBy("id")
    assert(column(out, "cusum_pos") == Seq(20.0, 10.0))
  }

  test("decayedSum: exact recurrence equals the bounded fan when k " +
      "covers history; null value decays without contributing") {
    val d = df("e BIGINT, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row(1L, ts("2024-01-01 00:00:00"), 1L, 4.0),
      Row(1L, ts("2024-01-01 01:00:00"), 2L, 1.0),
      Row(1L, ts("2024-01-01 03:00:00"), 3L, 0.5),
      Row(2L, ts("2024-01-01 00:00:00"), 4L, 8.0)))
    val got = Sequential.decayedSum(d, "e", "ts", "id", "v",
      halfLifeSeconds = 3600.0).orderBy("id")
      .collect().map(_.getDouble(1)).toSeq
    val s2 = 1.0 + 4.0 * math.pow(0.5, 1.0)
    val s3 = 0.5 + s2 * math.pow(0.5, 2.0)
    assert(got == Seq(4.0, s2, s3, 8.0))
    // with k >= history length the bounded window fan must agree
    val fan = graft.temporal.WindowOps.decayedRollingSum(
      d, "e", "ts", "v", k = 4, halfLifeSeconds = 3600.0)
      .orderBy("id").collect()
      .map(_.getAs[Double]("decayed_sum")).toSeq
    got.zip(fan).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12, s"$a vs $b") }
    // null x: decay applies, contribution 0
    val n = df("e BIGINT, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row(1L, ts("2024-01-01 00:00:00"), 1L, 4.0),
      Row(1L, ts("2024-01-01 01:00:00"), 2L, null)))
    val gn = Sequential.decayedSum(n, "e", "ts", "id", "v", 3600.0)
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(gn == Seq(4.0, 2.0))
  }

  test("ewmMean: level converges under constant signal, null rows " +
      "emit null and freeze both state and clock") {
    val d = df("e BIGINT, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row(1L, ts("2024-01-01 00:00:00"), 1L, 4.0),
      Row(1L, ts("2024-01-01 01:00:00"), 2L, 8.0),
      Row(1L, ts("2024-01-01 01:30:00"), 3L, null),
      Row(1L, ts("2024-01-01 02:00:00"), 4L, 8.0),
      Row(2L, ts("2024-01-01 00:00:00"), 5L, 6.0)))
    val got = Sequential.ewmMean(d, "e", "ts", "id", "v",
      halfLifeSeconds = 3600.0).orderBy("id").collect()
      .map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq
    val s2 = 4.0 + (1.0 - math.pow(0.5, 1.0)) * (8.0 - 4.0) // 6.0
    // the null at 01:30 froze the clock: dt for id=4 is a FULL hour
    // from 01:00, not 30 min
    val s4 = s2 + (1.0 - math.pow(0.5, 1.0)) * (8.0 - s2)   // 7.0
    assert(got == Seq(4.0, s2, null, s4, 6.0))
    // constant signal: the level equals the signal at every step
    val c = df("e BIGINT, ts TIMESTAMP, id BIGINT, v DOUBLE",
      (1 to 5).map(i => Row(1L,
        ts(f"2024-01-01 0$i:00:00"), i.toLong, 3.5)))
    assert(Sequential.ewmMean(c, "e", "ts", "id", "v", 3600.0)
      .collect().forall(_.getDouble(1) == 3.5))
  }

  test("micro-unit rounding: Spark round() semantics shared by batch " +
      "and stream; NaN is a missing reading everywhere") {
    // the contract: halfUp6 IS Spark round(v*1e6, 0) — assert parity
    // on adversarial values (exact halves both signs, the
    // 0.49999999999999994 shortest-repr trap where floor(y+0.5)
    // diverges from decimal HALF_UP, and large magnitudes)
    val tricky = Seq(4.9999999999999994e-7, 0.49999999999999994,
      1.5e-6, -1.5e-6, 2.5e-6, -2.5e-6, 0.5, -0.5, 1.0,
      1234.5678915, -1234.5678915, 9.007199254740993e8)
    val viaSpark = df("v DOUBLE", tricky.map(Row(_)))
      .select(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.col("v") *
          org.apache.spark.sql.functions.lit(1e6), 0).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    val viaScan = tricky.map(graft.temporal.StreamingRound.halfUp6)
    assert(viaScan == viaSpark,
      s"halfUp6 drifted from Spark round: $viaScan vs $viaSpark")
    assert(graft.temporal.StreamingRound.halfUp6(-1.5e-6) == -2L)
    // NaN: state unchanged in cusum (like null), not coerced to 0
    // (a zero reading would drive sn toward a spurious alarm)
    val d = df("e BIGINT, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row(1L, ts("2024-01-01 10:00:00"), 1L, 12.0),
      Row(1L, ts("2024-01-01 10:10:00"), 2L, Double.NaN),
      Row(1L, ts("2024-01-01 10:20:00"), 3L, 11.0)))
    val out = Sequential.cusum(d, "e", "ts", "id", "v",
      target = 10.0, slack = 0.0, threshold = 100.0).orderBy("id")
    assert(column(out, "cusum_pos") == Seq(2.0, 2.0, 3.0))
    assert(column(out, "cusum_neg") == Seq(0.0, 0.0, 0.0))
    // and in ewmMean / decayedSum: no poison, no zero contribution
    val em = Sequential.ewmMean(d, "e", "ts", "id", "v", 600.0)
      .orderBy("id").collect()
    assert(em(0).getDouble(1) == 12.0 && em(1).isNullAt(1))
    assert(em(2).getDouble(1) ==
      12.0 + (1.0 - math.pow(0.5, 2.0)) * (11.0 - 12.0))
    val dsum = Sequential.decayedSum(d, "e", "ts", "id", "v", 600.0)
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(dsum == Seq(12.0, 12.0 * 0.5, 11.0 + 12.0 * 0.25))
  }

  test("holtSmooth: golden two-state recurrence, null carry, " +
      "entity reset, param guards") {
    val d = df("e BIGINT, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row(1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      Row(1L, ts("2024-01-01 10:10:00"), 2L, 14.0),
      Row(1L, ts("2024-01-01 10:20:00"), 3L, null),
      Row(1L, ts("2024-01-01 10:30:00"), 4L, 18.0),
      Row(2L, ts("2024-01-01 10:00:00"), 5L, 7.0)))
    val out = Sequential.holtSmooth(d, "e", "ts", "id", "v",
      alpha = 0.5, beta = 0.2).orderBy("id").collect()
    // row1: l=10, b=0; row2: l=.5*14+.5*10=12, b=.2*2=0.4
    assert(out(0).getDouble(1) == 10.0 && out(0).getDouble(2) == 0.0)
    assert(out(1).getDouble(1) == 12.0 && out(1).getDouble(2) == 0.4
      && out(1).getDouble(3) == 12.4)
    // null reading: all three outputs null, state untouched
    assert(out(2).isNullAt(1) && out(2).isNullAt(2) && out(2).isNullAt(3))
    // row4 folds from (l=12, b=0.4), not from the null row:
    // l=.5*18+.5*12.4=15.2, b=.2*3.2+.8*.4=0.96
    assert(out(3).getDouble(1) == 15.2)
    assert(math.abs(out(3).getDouble(2) - 0.96) < 1e-12)
    // entity 2 restarts fresh
    assert(out(4).getDouble(1) == 7.0 && out(4).getDouble(2) == 0.0)
    intercept[IllegalArgumentException] {
      Sequential.holtSmooth(d, "e", "ts", "id", "v", 0.0, 0.2)
    }
    intercept[IllegalArgumentException] {
      Sequential.holtSmooth(d, "e", "ts", "id", "v", 0.5, 1.5)
    }
  }

  test("holtSmooth tracks a linear ramp: forecast converges to the " +
      "next ramp value, ewmMean lags it") {
    val rows2 = (1 to 40).map { i =>
      Row(1L, new Timestamp(ts("2024-01-01 00:00:00").getTime
        + i * 60000L), i.toLong, 2.0 * i) }
    val d = df("e BIGINT, ts TIMESTAMP, id BIGINT, v DOUBLE", rows2)
    val h = Sequential.holtSmooth(d, "e", "ts", "id", "v", 0.5, 0.3)
      .orderBy("id").collect()
    // after 40 steps of a perfect +2 ramp the trend estimate is ~2
    // and the one-step forecast is within 0.1 of the next value 82
    assert(math.abs(h.last.getDouble(2) - 2.0) < 0.05)
    assert(math.abs(h.last.getDouble(3) - 82.0) < 0.1)
  }

  test("cusum plans ONE exchange and no per-group materialization") {
    val d = df("e BIGINT, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row(1L, ts("2024-01-01 10:00:00"), 1L, 1.0)))
    val plan = Sequential.cusum(d, "e", "ts", "id", "v",
      target = 0.0, slack = 0.0, threshold = 1.0)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("AppendColumns"), plan) // no groupByKey path
  }
}
