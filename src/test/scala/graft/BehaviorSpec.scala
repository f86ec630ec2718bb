package graft

import graft.operators.Behavior
import org.apache.spark.sql.Row
import java.sql.Timestamp

class BehaviorSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cohortRetention: first-period cohorts, distinct activity " +
      "per offset, exact counts") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-01 08:00:00")),
      Row("u1", ts("2024-01-01 09:00:00")), // same day: one active
      Row("u1", ts("2024-01-02 08:00:00")),
      Row("u1", ts("2024-01-03 08:00:00")),
      Row("u2", ts("2024-01-01 23:00:00")),
      Row("u2", ts("2024-01-03 01:00:00")),
      Row("u3", ts("2024-01-02 12:00:00")),
      Row(null, ts("2024-01-01 00:00:00")))) // null entity excluded
    val out = Behavior.cohortRetention(d, "u", "ts", 86400L)
      .orderBy("cohort_start_s", "period_offset").collect()
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).toSeq
    val d0 = 1704067200L // 2024-01-01 epoch seconds
    assert(got == Seq(
      (d0, 0L, 2L, 2L, 1.0),         // u1, u2 on their first day
      (d0, 1L, 2L, 1L, 0.5),         // only u1 back next day
      (d0, 2L, 2L, 2L, 1.0),         // both back on day 2
      (d0 + 86400L, 0L, 1L, 1L, 1.0))) // u3's own cohort
  }

  test("funnelSteps: strictly-after ordering, horizon anchored at " +
      "step 1, depth = furthest reached") {
    val d = df("u STRING, ts TIMESTAMP, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), "A"),
      Row("u1", ts("2024-01-01 10:00:05"), "B"),
      Row("u1", ts("2024-01-01 10:00:08"), "C"),
      Row("u2", ts("2024-01-01 10:00:00"), "A"),
      Row("u2", ts("2024-01-01 10:00:00"), "B"), // same instant: no
      Row("u2", ts("2024-01-01 10:00:20"), "B"), // past horizon: no
      Row("u3", ts("2024-01-01 10:00:00"), "B"), // B before A: no
      Row("u3", ts("2024-01-01 10:00:05"), "A"),
      Row("u3", ts("2024-01-01 10:00:06"), "C"), // C without B: no
      Row("u4", ts("2024-01-01 10:00:00"), "A"),
      Row("u4", ts("2024-01-01 10:00:03"), "C"), // C before B ignored
      Row("u4", ts("2024-01-01 10:00:05"), "B"),
      Row("u4", ts("2024-01-01 10:00:07"), "C"),
      Row("u5", ts("2024-01-01 10:00:00"), "B"))) // never reaches A
    val base = 1704103200000000L // 2024-01-01 10:00:00 in micros
    val out = Behavior.funnelSteps(d, "u", "ts", "t",
      Seq("A", "B", "C"), horizonSeconds = 10L)
      .orderBy("u").collect()
    def us(r: Row, i: Int) = if (r.isNullAt(i)) null else r.getLong(i)
    assert(out.map(_.getString(0)).toSeq == Seq("u1", "u2", "u3", "u4"))
    assert((us(out(0), 1), us(out(0), 2), us(out(0), 3),
      out(0).getInt(4)) ==
      ((base, base + 5000000L, base + 8000000L, 3)))
    assert((us(out(1), 2), out(1).getInt(4)) == ((null, 1)))
    assert((us(out(2), 1), us(out(2), 2), out(2).getInt(4)) ==
      ((base + 5000000L, null, 1)))
    assert((us(out(3), 2), us(out(3), 3), out(3).getInt(4)) ==
      ((base + 5000000L, base + 7000000L, 3)))
    intercept[IllegalArgumentException] {
      Behavior.funnelSteps(d, "u", "ts", "t", Seq("A"), 10L)
    }
    intercept[IllegalArgumentException] {
      Behavior.funnelSteps(d, "u", "ts", "t", Seq("A", "A"), 10L)
    }
  }

  test("islands: consecutive equal runs per entity, null runs, exact " +
      "bounds, ONE exchange") {
    val d = df("u STRING, ts TIMESTAMP, v STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), "x"),
      Row("u1", ts("2024-01-01 10:00:01"), "x"),
      Row("u1", ts("2024-01-01 10:00:02"), "y"),
      Row("u1", ts("2024-01-01 10:00:03"), "y"),
      Row("u1", ts("2024-01-01 10:00:04"), "y"),
      Row("u1", ts("2024-01-01 10:00:05"), "x"),
      Row("u1", ts("2024-01-01 10:00:06"), null),
      Row("u1", ts("2024-01-01 10:00:07"), null),
      Row("u2", ts("2024-01-01 10:00:00"), null))) // leading null run
    val out = Behavior.islands(d, "u", "ts", "v")
      .orderBy("u", "run_seq").collect()
    val got = out.map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) null else r.getString(2), r.getLong(5))).toSeq
    assert(got == Seq(
      ("u1", 1L, "x", 2L), ("u1", 2L, "y", 3L), ("u1", 3L, "x", 1L),
      ("u1", 4L, null, 2L), ("u2", 1L, null, 1L)))
    val base = 1704103200000000L
    assert(out(1).getLong(3) == base + 2000000L) // y run start
    assert(out(1).getLong(4) == base + 4000000L) // y run end
    // the window pair and the run rollup ride ONE hash exchange
    val plan = Behavior.islands(d, "u", "ts", "v")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange:\n$plan")
    assert(!plan.contains("SinglePartition"), plan.take(600))
  }

  test("cooccurrence: session-confined baskets, exact counts, " +
      "lift/support/confidence golden values") {
    // u1 session1: {A,B,C}; u1 session2 (gap > 600s): {A}; u2: {A,B}
    // => N=3 sessions; n_A=3, n_B=2, n_C=1
    // pairs: (A,B) n_ab=2, (A,C) 1, (B,C) 1
    val d = df("u STRING, ts TIMESTAMP, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), "A"),
      Row("u1", ts("2024-01-01 10:01:00"), "B"),
      Row("u1", ts("2024-01-01 10:02:00"), "C"),
      Row("u1", ts("2024-01-01 10:02:30"), "A"), // dup in-session
      Row("u1", ts("2024-01-01 12:00:00"), "A"), // new session
      Row("u2", ts("2024-01-01 10:00:00"), "A"),
      Row("u2", ts("2024-01-01 10:05:00"), "B")))
    val out = Behavior.cooccurrence(d, "u", "ts", "t", 600L)
      .orderBy("item_a", "item_b").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("A", "B"), ("A", "C"), ("B", "C")))
    val ab = out(0)
    assert(ab.getLong(2) == 3L && ab.getLong(3) == 2L &&
      ab.getLong(4) == 2L && ab.getLong(5) == 3L)
    assert(ab.getDouble(6) == 2.0 / 3.0)      // support
    assert(ab.getDouble(7) == 2.0 / 3.0)      // conf A->B
    assert(ab.getDouble(8) == 1.0)            // conf B->A
    assert(ab.getDouble(9) == 2.0 * 3.0 / (3.0 * 2.0)) // lift = 1
    val bc = out(2)
    assert(bc.getLong(4) == 1L &&
      bc.getDouble(9) == 1.0 * 3.0 / (2.0 * 1.0)) // lift 1.5
    intercept[IllegalArgumentException] {
      Behavior.cooccurrence(d, "u", "ts", "t", 0L)
    }
  }

  test("cooccurrence: totals and N attach by broadcast, no " +
      "cartesian beyond the 1-row N attach") {
    val d = df("u STRING, ts TIMESTAMP, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), "A"),
      Row("u1", ts("2024-01-01 10:01:00"), "B")))
    val plan = Behavior.cooccurrence(d, "u", "ts", "t", 600L)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      plan.take(1000))
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1,
      plan.take(1000))
  }

  test("attribution: in-session strictly-prior touches only, organic " +
      "conversions read nulls, one exchange for session + window") {
    val d = df("u STRING, ts TIMESTAMP, id BIGINT, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), 1L, "view"),
      Row("u1", ts("2024-01-01 10:02:00"), 2L, "click"),
      Row("u1", ts("2024-01-01 10:04:00"), 3L, "purchase"),
      Row("u1", ts("2024-01-01 10:05:00"), 4L, "purchase"),
      // new session (gap > 10 min): its purchase is organic
      Row("u1", ts("2024-01-01 11:00:00"), 5L, "purchase"),
      Row("u2", ts("2024-01-01 10:00:00"), 6L, "click"),
      Row("u2", ts("2024-01-01 10:01:00"), 7L, "purchase")))
    val out = Behavior.attribution(d, "u", "ts", "t", "purchase",
      Seq("view", "click"), gapSeconds = 600L,
      tieBreak = Seq("id")).orderBy("id").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 4L, 5L, 7L))
    def s(r: Int, c: String) = {
      val i = out(r).fieldIndex(c)
      if (out(r).isNullAt(i)) null else out(r).getString(i)
    }
    // id3: first=view, last=click, 2 touches
    assert(s(0, "first_touch_type") == "view" &&
      s(0, "last_touch_type") == "click" &&
      out(0).getLong(out(0).fieldIndex("n_touches")) == 2L)
    // id4: same touches (the earlier purchase is not a touch)
    assert(s(1, "first_touch_type") == "view" &&
      out(1).getLong(out(1).fieldIndex("n_touches")) == 2L)
    // id5: organic — new session, no prior touch
    assert(s(2, "first_touch_type") == null &&
      out(2).getLong(out(2).fieldIndex("n_touches")) == 0L)
    // u2: single click credited both first and last
    assert(s(3, "first_touch_type") == "click" &&
      s(3, "last_touch_type") == "click")
    // conversion cannot be its own touch type
    intercept[IllegalArgumentException] {
      Behavior.attribution(d, "u", "ts", "t", "purchase",
        Seq("purchase", "view"), 600L)
    }
    // the (entity, session) window reuses the sessionize exchange
    val plan = Behavior.attribution(d, "u", "ts", "t", "purchase",
      Seq("view"), 600L, Seq("id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan)
  }

  test("hazardFeatures: golden rate and survival, singleton refuses " +
      "with nulls, corpus anchor from the data") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      // u1: 3 events over 2 days -> rate 1/day; last 1 day before asof
      Row("u1", ts("2024-01-01 00:00:00")),
      Row("u1", ts("2024-01-02 00:00:00")),
      Row("u1", ts("2024-01-03 00:00:00")),
      // u2: the corpus anchor (asof); singleton
      Row("u2", ts("2024-01-04 00:00:00"))))
    val out = Behavior.hazardFeatures(d, "u", "ts").orderBy("u")
      .collect()
    val u1 = out(0)
    assert(u1.getLong(1) == 3L)
    assert(u1.getLong(2) == 2L * 86400000000L)
    assert(u1.getLong(3) == 86400000000L)
    assert(u1.getDouble(4) == 1.0) // 2 gaps over 2 days
    // p_active = exp(-(2/2days) * 1day) = e^-1
    assert(math.abs(u1.getDouble(5) - math.exp(-1.0)) < 1e-12)
    val u2 = out(1)
    assert(u2.getLong(1) == 1L && u2.getLong(2) == 0L &&
      u2.getLong(3) == 0L)
    assert(u2.isNullAt(4) && u2.isNullAt(5)) // no rate from one event
  }

  test("activityProfile: entropy extremes, deterministic peak-hour " +
      "tie to the smaller hour, exact counts") {
    val rows =
      // u1: 4 events all at hour 10 -> entropy 0, peak 10
      (1 to 4).map(i => Row("u1", ts(s"2024-01-0$i 10:00:00"))) ++
      // u2: hours 3 and 7, two each -> H = ln 2, tie -> peak 3
      Seq(Row("u2", ts("2024-01-01 03:00:00")),
        Row("u2", ts("2024-01-02 03:30:00")),
        Row("u2", ts("2024-01-01 07:00:00")),
        Row("u2", ts("2024-01-02 07:30:00")),
        // u3: hour 23 vs hour 0, 23 wins on count
        Row("u3", ts("2024-01-01 23:00:00")),
        Row("u3", ts("2024-01-02 23:00:00")),
        Row("u3", ts("2024-01-01 00:00:00")))
    val d = df("u STRING, ts TIMESTAMP", rows)
    val out = Behavior.activityProfile(d, "u", "ts").orderBy("u")
      .collect()
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 1L)
    assert(out(0).getDouble(3) == 0.0 && out(0).getLong(4) == 10L)
    assert(math.abs(out(1).getDouble(3) - math.log(2.0)) < 1e-12)
    assert(out(1).getLong(4) == 3L) // tie 2-2 -> smaller hour
    assert(out(2).getLong(4) == 23L) // count beats hour ordering
  }

  test("rfmScores: exact triples, NTILE replica handles uneven " +
      "buckets exactly like SQL NTILE") {
    // 7 users, nBins=5: NTILE sizes 2,2,1,1,1 (rem=2 get q+1=2)
    val rows = (1 to 7).flatMap { u =>
      (1 to u).map { i => // user u has u events (freq tie-free)
        Row(u.toLong, ts(f"2024-01-0$u 10:0${i % 10}:00"),
          u * 10.0) // spend scales with u
      }
    }
    val d = df("u BIGINT, ts TIMESTAMP, v DOUBLE", rows)
    val out = Behavior.rfmScores(d, "u", "ts", "v").orderBy("u")
      .collect()
    // u7 is most recent, most frequent, highest total spend
    val u7 = out(6)
    assert(u7.getLong(1) == 0L)            // zero recency
    assert(u7.getLong(2) == 7L)
    assert(u7.getLong(3) == 7L * 7L * 10L * 1000000L)
    assert(u7.getInt(4) == 5 && u7.getInt(5) == 5 && u7.getInt(6) == 5)
    assert(u7.getInt(7) == 555)
    // NTILE sizes over ranks 1..7 with n=5: buckets 1,1,2,2,3,4,5
    assert(out.map(_.getInt(5)).toSeq == Seq(1, 1, 2, 2, 3, 4, 5))
    // recency order is reversed: oldest user (u1) gets r=1
    assert(out(0).getInt(4) == 1)
    intercept[IllegalArgumentException] {
      Behavior.rfmScores(d, "u", "ts", "v", nBins = 1)
    }
  }

  test("rfmScores: no single-partition stage in the pre-checkpoint " +
      "rank plan (two-phase machinery, not a global window)") {
    // the ranked frames are checkpointed, so assert on the op's own
    // final plan: no SinglePartition exchange anywhere
    val d = df("u BIGINT, ts TIMESTAMP, v DOUBLE", Seq(
      Row(1L, ts("2024-01-01 10:00:00"), 1.0),
      Row(2L, ts("2024-01-02 10:00:00"), 2.0)))
    val plan = Behavior.rfmScores(d, "u", "ts", "v")
      .queryExecution.executedPlan.toString
    // the ONLY SinglePartition is the 1-row corpus-count attach,
    // and it is map-side combined (partial_count before the
    // exchange); no global Window rank anywhere
    assert("Exchange SinglePartition".r.findAllIn(plan).size == 1,
      plan.take(800))
    assert(plan.contains("partial_count"), plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))
  }

  test("transitionFeatures: golden matrix, first-event nulls, " +
      "exact counts, ln surprisal") {
    // u1: A->B, B->A, A->B ; u2: A->B  => n(A->B)=3, n(A->A)=0,
    // n(B->A)=1; prev_n(A)=3, prev_n(B)=1
    val d = df("u STRING, ts TIMESTAMP, id BIGINT, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), 1L, "A"),
      Row("u1", ts("2024-01-01 10:01:00"), 2L, "B"),
      Row("u1", ts("2024-01-01 10:02:00"), 3L, "A"),
      Row("u1", ts("2024-01-01 10:03:00"), 4L, "B"),
      Row("u2", ts("2024-01-01 10:00:00"), 5L, "A"),
      Row("u2", ts("2024-01-01 10:01:00"), 6L, "B")))
    val out = Behavior.transitionFeatures(d, "u", "ts", "t",
      tieBreak = Seq("id")).orderBy("id").collect()
    // first events per entity: all transition fields null
    for (i <- Seq(0, 4)) {
      assert(out(i).isNullAt(out(i).fieldIndex("prev_t")))
      assert(out(i).isNullAt(out(i).fieldIndex("trans_p")))
      assert(out(i).isNullAt(out(i).fieldIndex("trans_surprisal")))
    }
    def p(i: Int) = out(i).getDouble(out(i).fieldIndex("trans_p"))
    def n(i: Int) = out(i).getLong(out(i).fieldIndex("trans_n"))
    assert(n(1) == 3L && p(1) == 1.0)              // A->B: 3/3
    assert(n(2) == 1L && p(2) == 1.0)              // B->A: 1/1
    assert(n(5) == 3L && p(5) == 1.0)              // u2's A->B shares the matrix
    assert(out(1).getDouble(out(1).fieldIndex("trans_surprisal")) == 0.0)
  }

  test("transitionFeatures: scoring join is broadcast — no extra " +
      "exchange beyond the entity window and the tiny matrix") {
    val d = df("u STRING, ts TIMESTAMP, id BIGINT, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), 1L, "A"),
      Row("u1", ts("2024-01-01 10:01:00"), 2L, "B")))
    val plan = Behavior.transitionFeatures(d, "u", "ts", "t",
      tieBreak = Seq("id")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("transitionFeatures: surprisal for a non-uniform matrix " +
      "matches -ln(n/m) exactly") {
    // A->B twice, A->C once: P(B|A)=2/3, P(C|A)=1/3
    val d = df("u STRING, ts TIMESTAMP, id BIGINT, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), 1L, "A"),
      Row("u1", ts("2024-01-01 10:01:00"), 2L, "B"),
      Row("u2", ts("2024-01-01 10:00:00"), 3L, "A"),
      Row("u2", ts("2024-01-01 10:01:00"), 4L, "B"),
      Row("u3", ts("2024-01-01 10:00:00"), 5L, "A"),
      Row("u3", ts("2024-01-01 10:01:00"), 6L, "C")))
    val out = Behavior.transitionFeatures(d, "u", "ts", "t",
      tieBreak = Seq("id")).orderBy("id").collect()
    def s(i: Int) =
      out(i).getDouble(out(i).fieldIndex("trans_surprisal"))
    assert(s(1) == -math.log(2.0 / 3.0))
    assert(s(5) == -math.log(1.0 / 3.0))
  }

  test("interArrivalStats: golden periodic/bursty gap moments, " +
      "singletons refuse, all-simultaneous refuses the ratios") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      // u1: perfectly periodic 10s gaps -> cv 0, burstiness -1
      Row("u1", ts("2024-01-01 10:00:00")),
      Row("u1", ts("2024-01-01 10:00:10")),
      Row("u1", ts("2024-01-01 10:00:20")),
      Row("u1", ts("2024-01-01 10:00:30")),
      // u2: gaps 0s (tie) and 20s -> mu 10s, sigma 10s, B 0, cv 1
      Row("u2", ts("2024-01-01 10:00:00")),
      Row("u2", ts("2024-01-01 10:00:00")),
      Row("u2", ts("2024-01-01 10:00:20")),
      Row("u3", ts("2024-01-01 10:00:00")),      // singleton
      // u4: all simultaneous -> mu=sigma=0, cv/B refuse
      Row("u4", ts("2024-01-01 10:00:00")),
      Row("u4", ts("2024-01-01 10:00:00")),
      Row(null, ts("2024-01-01 10:00:00"))))
    val out = Behavior.interArrivalStats(d, "u", "ts")
      .orderBy("u").collect()
    def g(i: Int, c: String) = {
      val j = out(i).fieldIndex(c)
      if (out(i).isNullAt(j)) null else out(i).getDouble(j)
    }
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 2L, 0L, 1L))
    assert(g(0, "mean_gap_s") == 10.0)
    assert(g(0, "std_gap_s") == 0.0)
    assert(g(0, "cv_gap") == 0.0)
    assert(g(0, "burstiness") == -1.0)
    assert(g(1, "mean_gap_s") == 10.0)
    assert(g(1, "std_gap_s") == 10.0)
    assert(g(1, "cv_gap") == 1.0)
    assert(g(1, "burstiness") == 0.0)
    assert(g(2, "mean_gap_s") == null)           // n < 2
    assert(g(3, "mean_gap_s") == 0.0)            // one zero gap
    assert(g(3, "cv_gap") == null)               // 0/0 refused
    assert(g(3, "burstiness") == null)
  }

  test("interArrivalStats runs on ONE exchange: the gap window and " +
      "the moment rollup share the entity partitioning") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-01 10:00:00"))))
    val plan = Behavior.interArrivalStats(d, "u", "ts")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan)
    assert(!plan.contains("SinglePartition"), plan.take(600))
  }

  test("hourLift: exact cross-multiplied lift vs the corpus hour " +
      "histogram, shares sum to 1 per entity") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-01 10:00:00")),
      Row("u1", ts("2024-01-01 10:10:00")),
      Row("u1", ts("2024-01-02 10:20:00")),
      Row("u1", ts("2024-01-01 11:00:00")),
      Row("u2", ts("2024-01-01 10:00:00")),
      Row("u2", ts("2024-01-01 11:00:00")),
      Row("u2", ts("2024-01-02 11:00:00")),
      Row("u2", ts("2024-01-03 11:00:00"))))
    val out = Behavior.hourLift(d, "u", "ts").orderBy("u", "hh")
      .collect()
    val got = out.map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3),
      r.getDouble(r.fieldIndex("share")),
      r.getDouble(r.fieldIndex("lift")))).toSeq
    // global: hour10 -> 4, hour11 -> 4, n_g = 8
    assert(got == Seq(
      ("u1", 10L, 3L, 4L, 0.75, 1.5),  // (3/4)/(4/8)
      ("u1", 11L, 1L, 4L, 0.25, 0.5),
      ("u2", 10L, 1L, 4L, 0.25, 0.5),
      ("u2", 11L, 3L, 4L, 0.75, 1.5)))
  }

  test("dowSeasonalIndex: exact per-weekday means, delta vs overall," +
      " zero-sum baseline refuses the ratio but not the delta") {
    val d = df("u STRING, ts TIMESTAMP, v DOUBLE", Seq(
      Row("u1", ts("2024-01-06 10:00:00"), 2.0), // Saturday -> dow 7
      Row("u1", ts("2024-01-07 10:00:00"), 4.0), // Sunday   -> dow 1
      Row("u1", ts("2024-01-08 10:00:00"), 6.0), // Monday   -> dow 2
      Row("u1", ts("2024-01-08 11:00:00"), null),
      Row("u2", ts("2024-01-06 10:00:00"), 1.0),
      Row("u2", ts("2024-01-06 11:00:00"), -1.0)))
    val out = graft.operators.Behavior.dowSeasonalIndex(
      d, "u", "ts", "v").orderBy("u", "dow").collect()
    def g(i: Int, c: String) = {
      val j = out(i).fieldIndex(c)
      if (out(i).isNullAt(j)) null else out(i).getDouble(j)
    }
    // u1 rows in dow order: 1 (Sun), 2 (Mon), 7 (Sat); overall mean 4
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 7L, 7L))
    assert(g(0, "dow_mean") == 4.0 && g(0, "dow_delta") == 0.0 &&
      g(0, "dow_index") == 1.0)
    assert(g(1, "dow_mean") == 6.0 && g(1, "dow_delta") == 2.0 &&
      g(1, "dow_index") == 1.5)
    assert(g(2, "dow_mean") == 2.0 && g(2, "dow_delta") == -2.0 &&
      g(2, "dow_index") == 0.5)
    // u1 Monday n_d counts only the observed value
    assert(out(1).getLong(2) == 1L)
    // u2: overall sum 0 -> ratio refused, delta still reads
    assert(g(3, "dow_index") == null)
    assert(g(3, "dow_delta") == 0.0)
  }

  test("streakStats: run lengths off the day-grid islands, last " +
      "streak is the one holding the newest active day") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-01 10:00:00")),
      Row("u1", ts("2024-01-01 22:00:00")), // same day
      Row("u1", ts("2024-01-02 10:00:00")),
      Row("u1", ts("2024-01-03 10:00:00")),
      Row("u1", ts("2024-01-05 10:00:00")),
      Row("u1", ts("2024-01-06 10:00:00")),
      Row("u1", ts("2024-01-10 10:00:00")),
      Row("u2", ts("2024-01-01 10:00:00")),
      Row("u2", ts("2024-01-02 10:00:00"))))
    val out = Behavior.streakStats(d, "u", "ts").orderBy("u")
      .collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == Seq(
      ("u1", 6L, 3L, 3L, 1L),
      ("u2", 2L, 1L, 2L, 2L)))
  }

  test("typeMix: exact entropy rearrangement, tie on top type " +
      "breaks to the lexicographically smallest") {
    val d = df("u STRING, t STRING", Seq(
      Row("u1", "B"), Row("u1", "B"), Row("u1", "A"),
      Row("u1", "A"), Row("u1", "C"),
      Row("u2", "X"), Row("u2", null)))
    val out = Behavior.typeMix(d, "u", "t").orderBy("u").collect()
    val r = out(0)
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L)
    assert(math.abs(r.getDouble(3) -
      (math.log(5.0) - 4.0 * math.log(2.0) / 5.0)) < 1e-12)
    assert(r.getString(4) == "A")   // tie A/B at 2 -> smallest
    assert(r.getDouble(5) == 0.4)
    assert(out(1).getLong(1) == 1L) // null type never counts
    assert(out(1).getDouble(3) == 0.0)
    assert(out(1).getString(4) == "X" && out(1).getDouble(5) == 1.0)
  }

  test("volumeAnomaly: strictly-prior expanding moments over daily " +
      "counts, first/flat histories refuse, exact z") {
    def rows(day: String, n: Int) = (1 to n).map(i =>
      Row("A", ts(s"$day 0$i:00:00")))
    val d = df("k STRING, ts TIMESTAMP",
      rows("2024-01-01", 2) ++ rows("2024-01-02", 4) ++
        rows("2024-01-03", 3) ++ rows("2024-01-04", 5))
    val out = Behavior.volumeAnomaly(d, "k", "ts")
      .orderBy("day").collect()
    def g(i: Int, c: String) = {
      val j = out(i).fieldIndex(c)
      if (out(i).isNullAt(j)) null else out(i).getDouble(j)
    }
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 4L, 3L, 5L))
    assert(g(0, "expected") == null && g(0, "vol_z") == null)
    assert(g(1, "expected") == 2.0 && g(1, "vol_z") == null)
    assert(g(2, "expected") == 3.0)
    assert(g(2, "vol_z") == 0.0)        // history [2,4]: mu 3 sig 1
    assert(math.abs(g(3, "vol_z").asInstanceOf[Double] -
      2.0 / math.sqrt(2.0 / 3.0)) < 1e-9)
  }

  test("sessionProfile: bounce share, exact mean duration counting " +
      "zero-length bounce sessions") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-01 10:00:00")),
      Row("u1", ts("2024-01-01 10:00:30")),
      Row("u1", ts("2024-01-01 10:01:00")),
      Row("u1", ts("2024-01-01 12:00:00")), // new session, bounce
      Row("u2", ts("2024-01-01 10:00:00"))))
    val out = Behavior.sessionProfile(d, "u", "ts", 1800L)
      .orderBy("u").collect()
    val r = out(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == 2.0)
    assert(r.getDouble(5) == 30.0) // (60s + 0s) / 2
    assert(out(1).getDouble(3) == 1.0 && out(1).getDouble(5) == 0.0)
  }

  test("valueConcentration: exact HHI off cross-multiplied micro " +
      "sums, even split reads 1/k, refusals on zero totals") {
    val d = df("u STRING, t STRING, v DOUBLE", Seq(
      Row("u1", "A", 30.0), Row("u1", "B", 10.0),
      Row("u1", "A", 20.0), Row("u1", "C", 40.0),
      Row("u2", "X", 5.0), Row("u2", "Y", 5.0),
      Row("u3", "Z", null)))
    val out = Behavior.valueConcentration(d, "u", "t", "v")
      .orderBy("u").collect()
    val r = out(0) // sums A=50, B=10, C=40, S=100
    assert(r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - 0.42) < 1e-12) // .25+.01+.16
    assert(r.getDouble(3) == 0.5)
    assert(out(1).getDouble(2) == 0.5) // even 2-way split
    assert(out.length == 2)            // u3: no observed value rows
  }

  test("activationProfile: strict first-window comparison on exact " +
      "micros, lifetime in integer days") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-01 10:00:00")),
      Row("u1", ts("2024-01-05 09:00:00")),  // day 4: inside
      Row("u1", ts("2024-01-08 09:59:59")),  // < 7d by 1s: inside
      Row("u1", ts("2024-01-08 10:00:00")),  // exactly 7d: outside
      Row("u1", ts("2024-02-01 10:00:00")),
      Row("u2", ts("2024-01-01 10:00:00"))))
    val out = Behavior.activationProfile(d, "u", "ts", 7)
      .orderBy("u").collect()
    val r = out(0)
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.6)
    assert(r.getLong(4) == 31L)
    assert(out(1).getLong(2) == 1L && out(1).getLong(4) == 0L)
  }

  test("growthAccounting: new / returning / resurrected ledger on " +
      "the day grid, dau decomposes exactly") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-01 10:00:00")),
      Row("u1", ts("2024-01-01 12:00:00")), // same day collapses
      Row("u1", ts("2024-01-02 10:00:00")),
      Row("u1", ts("2024-02-10 10:00:00")), // 39-day gap
      Row("u2", ts("2024-01-02 10:00:00"))))
    val out = Behavior.growthAccounting(d, "u", "ts", 30)
      .orderBy("day").collect()
    val got = out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 1L, 0L, 0L),   // Jan 1: u1 new
      (2L, 1L, 1L, 0L),   // Jan 2: u2 new, u1 returning
      (1L, 0L, 0L, 1L)))  // Feb 10: u1 resurrected
    assert(got.forall(r => r._1 == r._2 + r._3 + r._4))
  }

  test("seasonalResidual: value minus the entity's weekday mean, " +
      "missing values read null residual") {
    val d = df("u STRING, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row("u1", ts("2024-01-06 10:00:00"), 1L, 2.0),  // Sat
      Row("u1", ts("2024-01-13 10:00:00"), 2L, 6.0),  // Sat
      Row("u1", ts("2024-01-08 10:00:00"), 3L, 10.0), // Mon
      Row("u1", ts("2024-01-15 10:00:00"), 4L, null))) // Mon
    val out = Behavior.seasonalResidual(d, "u", "ts", "v")
      .orderBy("id").collect()
    def g(i: Int) = {
      val j = out(i).fieldIndex("v_dow_resid")
      if (out(i).isNullAt(j)) null else out(i).getDouble(j)
    }
    assert(g(0) == -2.0) // Sat mean 4
    assert(g(1) == 2.0)
    assert(g(2) == 0.0)  // Mon mean 10 (null excluded)
    assert(g(3) == null)
  }

  test("looSeasonalResidual: the row never sees itself, lone " +
      "observations refuse, missing values blind nothing") {
    val d = df("u STRING, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row("u1", ts("2024-01-06 10:00:00"), 1L, 2.0),  // Sat
      Row("u1", ts("2024-01-13 10:00:00"), 2L, 6.0),  // Sat
      Row("u1", ts("2024-01-20 10:00:00"), 3L, 10.0), // Sat
      Row("u1", ts("2024-01-08 10:00:00"), 4L, 7.0),  // Mon: alone
      Row("u1", ts("2024-01-15 10:00:00"), 5L, null))) // Mon
    val out = Behavior.looSeasonalResidual(d, "u", "ts", "v")
      .orderBy("id").collect()
    def g(i: Int, c: String) = {
      val j = out(i).fieldIndex(c)
      if (out(i).isNullAt(j)) null else out(i).getDouble(j)
    }
    assert(g(0, "dow_mean_loo") == 8.0)  // (6+10)/2
    assert(g(0, "v_loo_resid") == -6.0)
    assert(g(1, "dow_mean_loo") == 6.0)  // (2+10)/2
    assert(g(2, "dow_mean_loo") == 4.0)  // (2+6)/2
    assert(g(3, "dow_mean_loo") == null) // no OTHER Monday value
    assert(g(4, "dow_mean_loo") == 7.0)  // unobserved row: full mean
    assert(g(4, "v_loo_resid") == null)  // but nothing to score
  }

  test("profileNeighbors: inverted-index cosine over hour " +
      "histograms, no-shared-hour pairs absent, ties by neighbor") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-01 10:00:00")),
      Row("u1", ts("2024-01-02 10:10:00")),
      Row("u1", ts("2024-01-03 10:20:00")),
      Row("u2", ts("2024-01-01 10:00:00")),
      Row("u3", ts("2024-01-01 05:00:00")),
      Row("u4", ts("2024-01-01 10:00:00")),
      Row("u4", ts("2024-01-01 05:30:00"))))
    val out = Behavior.profileNeighbors(d, "u", "ts", k = 2)
      .orderBy("u", "rank").collect()
    val got = out.map(r => (r.getString(0), r.getInt(1),
      r.getString(2))).toSeq
    assert(got == Seq(
      ("u1", 1, "u2"), ("u1", 2, "u4"),
      ("u2", 1, "u1"), ("u2", 2, "u4"),
      ("u3", 1, "u4"),
      ("u4", 1, "u1"), ("u4", 2, "u2"))) // all-tie -> id order
    assert(out(0).getDouble(3) == 1.0)
    assert(math.abs(out(1).getDouble(3) - 1.0 / math.sqrt(2.0))
      < 1e-12)
  }

  test("gapCadence: log2 gap mode with smallest-bucket ties, zero " +
      "gaps land in bucket -1, exact share") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      // u1: gaps 8s, 8s, 1000s -> bucket floor(log2(8e6)) = 22 x2
      Row("u1", ts("2024-01-01 10:00:00")),
      Row("u1", ts("2024-01-01 10:00:08")),
      Row("u1", ts("2024-01-01 10:00:16")),
      Row("u1", ts("2024-01-01 10:16:56")),
      // u2: one zero gap (tie pair) and one 8s gap: tie on counts
      // -> SMALLEST bucket wins (-1)
      Row("u2", ts("2024-01-01 10:00:00")),
      Row("u2", ts("2024-01-01 10:00:00")),
      Row("u2", ts("2024-01-01 10:00:08")),
      Row("u3", ts("2024-01-01 10:00:00")))) // no gaps
    val out = Behavior.gapCadence(d, "u", "ts").orderBy("u")
      .collect()
    val a = out(0)
    assert(a.getLong(1) == 3L)
    assert(a.getLong(2) ==
      math.floor(math.log(8e6) / math.log(2.0)).toLong)
    assert(math.abs(a.getDouble(3) - 2.0 / 3.0) < 1e-12)
    val b = out(1)
    assert(b.getLong(2) == -1L && b.getDouble(3) == 0.5)
    assert(out.length == 2) // u3 has no gap rows at all
  }

  test("sessionNextGap: exact end-to-next-start micros, the last " +
      "session reads null and flags itself") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-01 10:00:00")),
      Row("u1", ts("2024-01-01 10:01:00")),
      Row("u1", ts("2024-01-01 12:00:00")),
      Row("u2", ts("2024-01-01 09:00:00"))))
    val out = Behavior.sessionNextGap(d, "u", "ts", 1800L)
      .orderBy("u", "session_id").collect()
    val a = out(0)
    assert(a.getLong(2) == 2L)
    assert(a.getLong(a.fieldIndex("us_to_next_session")) ==
      7140000000L) // 12:00 - 10:01 = 119 min
    assert(!a.getBoolean(a.fieldIndex("is_last_session")))
    assert(out(1).isNullAt(out(1).fieldIndex("us_to_next_session")))
    assert(out(1).getBoolean(out(1).fieldIndex("is_last_session")))
    assert(out(2).getBoolean(out(2).fieldIndex("is_last_session")))
  }

  test("gapQuantiles: exact weighted-CDF interp on the gap frame, " +
      "seconds out, exact-hit takes the bracketing value") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-01 10:00:00")),
      Row("u1", ts("2024-01-01 10:00:10")), // gaps 10,20,30,40 s
      Row("u1", ts("2024-01-01 10:00:30")),
      Row("u1", ts("2024-01-01 10:01:00")),
      Row("u1", ts("2024-01-01 10:01:40")),
      Row("u2", ts("2024-01-01 10:00:00")))) // no gaps: absent
    val out = Behavior.gapQuantiles(d, "u", "ts").orderBy("u")
      .collect()
    assert(out.length == 1)
    val r = out(0)
    // cum-fracs .25/.5/.75/1: q=.5 hits exactly -> 20 s
    assert(r.getDouble(r.fieldIndex("gap_p50_s")) == 20.0)
    // p90 interpolates between .75 (30s) and 1.0 (40s) -> 36 s
    assert(math.abs(r.getDouble(r.fieldIndex("gap_p90_s")) - 36.0)
      < 1e-9)
  }

  test("seasonalZ: standardized weekday deviation off exact cell " +
      "moments, thin and flat cells refuse") {
    val d = df("u STRING, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row("u1", ts("2024-01-06 10:00:00"), 1L, 2.0), // Sat
      Row("u1", ts("2024-01-13 10:00:00"), 2L, 6.0), // Sat
      Row("u1", ts("2024-01-08 10:00:00"), 3L, 9.0), // Mon alone
      Row("u1", ts("2024-01-15 10:00:00"), 4L, null)))
    val out = Behavior.seasonalZ(d, "u", "ts", "v")
      .orderBy("id").collect()
    def g(i: Int) = {
      val j = out(i).fieldIndex("v_dow_z")
      if (out(i).isNullAt(j)) null else out(i).getDouble(j)
    }
    assert(g(0) == -1.0 && g(1) == 1.0)
    assert(g(2) == null) // single observation
    assert(g(3) == null) // missing value
  }

  test("transitionLatency: exact step timing per ordered type pair") {
    val d = df("u STRING, ts TIMESTAMP, id BIGINT, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), 1L, "A"),
      Row("u1", ts("2024-01-01 10:00:10"), 2L, "B"),
      Row("u1", ts("2024-01-01 10:00:15"), 3L, "B"),
      Row("u1", ts("2024-01-01 10:01:40"), 4L, "A")))
    val out = Behavior.transitionLatency(d, "u", "ts", "t",
      tieBreak = Seq("id")).orderBy("prev_type", "cur_type")
      .collect()
    val got = out.map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("A", "B", 1L, 10.0, 10000000L),
      ("B", "A", 1L, 85.0, 85000000L),
      ("B", "B", 1L, 5.0, 5000000L)))
  }

  test("bounceByHour: per-start-hour bounce decomposition") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-01 10:00:00")),
      Row("u1", ts("2024-01-01 10:05:00")),
      Row("u1", ts("2024-01-01 12:00:00")),
      Row("u2", ts("2024-01-01 10:30:00"))))
    val out = Behavior.bounceByHour(d, "u", "ts", 1800L)
      .orderBy("start_hour").collect()
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq
    assert(got == Seq((10L, 2L, 1L, 0.5), (12L, 1L, 1L, 1.0)))
  }

  test("gapEntropy: exact bucket counts, typeMix's entropy " +
      "rearrangement, single-bucket refuses norm_entropy") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-01 10:00:00")),
      Row("u1", ts("2024-01-01 10:00:01")), // 1s  -> bucket 19
      Row("u1", ts("2024-01-01 10:00:02")), // 1s  -> bucket 19
      Row("u1", ts("2024-01-01 10:00:10")), // 8s  -> bucket 22
      Row("u2", ts("2024-01-01 10:00:00")),
      Row("u2", ts("2024-01-01 10:00:01")), // 1s  -> bucket 19
      Row("u2", ts("2024-01-01 10:00:02")), // 1s  -> only bucket
      Row("u3", ts("2024-01-01 10:00:00")))) // no gaps: absent
    val out = Behavior.gapEntropy(d, "u", "ts")
      .orderBy("u").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("u1", "u2"))
    val r1 = out(0)
    assert(r1.getLong(1) == 3L && r1.getLong(2) == 2L)
    val h = math.log(3.0) - 2.0 * math.log(2.0) / 3.0
    assert(math.abs(r1.getDouble(3) - h) < 1e-12)
    assert(math.abs(r1.getDouble(4) - h / math.log(2.0)) < 1e-12)
    val r2 = out(1)
    assert(r2.getLong(1) == 2L && r2.getLong(2) == 1L)
    assert(r2.getDouble(3) == 0.0)
    assert(r2.isNullAt(4)) // one bucket: perfectly regular
  }

  test("transitionEntropy: H(cur|prev) from exact bigram counts, " +
      "deterministic chain refuses norm, mixed chain scores it") {
    val d = df("u STRING, ts TIMESTAMP, id BIGINT, t STRING", Seq(
      // u1: A->B, B->A, A->B — next type fully determined by prev
      Row("u1", ts("2024-01-01 10:00:00"), 1L, "A"),
      Row("u1", ts("2024-01-01 10:00:10"), 2L, "B"),
      Row("u1", ts("2024-01-01 10:00:20"), 3L, "A"),
      Row("u1", ts("2024-01-01 10:00:30"), 4L, "B"),
      // u2: A->B, A->C — coin flip after A
      Row("u2", ts("2024-01-01 10:00:00"), 5L, "A"),
      Row("u2", ts("2024-01-01 10:00:10"), 6L, "B"),
      Row("u2", ts("2024-01-01 10:00:20"), 7L, "A"),
      Row("u2", ts("2024-01-01 10:00:30"), 8L, "C")))
    val out = Behavior.transitionEntropy(d, "u", "ts", "t",
      tieBreak = Seq("id")).orderBy("u").collect()
    val r1 = out(0)
    assert(r1.getLong(1) == 3L && r1.getLong(2) == 2L &&
      r1.getLong(3) == 2L)
    // perfectly predictable: joint = prev-marginal entropy
    assert(math.abs(r1.getDouble(4)) < 1e-12)
    assert(math.abs(r1.getDouble(5)) < 1e-12)
    val r2 = out(1)
    assert(r2.getLong(1) == 3L && r2.getLong(2) == 3L &&
      r2.getLong(3) == 3L)
    // bigrams AB, BA, AC all unique: joint H = ln3; prev counts
    // A:2, B:1 -> H(prev) = ln3 - (2 ln2)/3; cond = (2 ln2)/3
    val cond = 2.0 * math.log(2.0) / 3.0
    assert(math.abs(r2.getDouble(4) - cond) < 1e-12)
    assert(math.abs(r2.getDouble(5) - cond / math.log(3.0)) < 1e-12)
  }

  test("hourVector: wrap-around circular mean, modal-hour ties to " +
      "smallest, R=1 for a single hour") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-01 23:10:00")),
      Row("u1", ts("2024-01-02 23:50:00")),
      Row("u1", ts("2024-01-03 01:00:00")), // 23,23,1: mean ~23.66
      Row("u2", ts("2024-01-01 05:00:00")),
      Row("u2", ts("2024-01-01 09:00:00")), // tie -> peak_hour 5
      Row("u3", ts("2024-01-01 00:30:00"))))
    val out = Behavior.hourVector(d, "u", "ts")
      .orderBy("u").collect()
    def th(h: Int) = 2 * math.Pi * h / 24
    val r1 = out(0)
    assert(r1.getLong(1) == 3L && r1.getLong(2) == 23L)
    assert(math.abs(r1.getDouble(3) - 2.0 / 3.0) < 1e-12)
    val x1 = 2 * math.cos(th(23)) + math.cos(th(1))
    val y1 = 2 * math.sin(th(23)) + math.sin(th(1))
    assert(math.abs(r1.getDouble(4) -
      math.sqrt(x1 * x1 + y1 * y1) / 3.0) < 1e-12)
    val m1 = (math.atan2(y1, x1) / (2 * math.Pi) * 24 + 24) % 24
    assert(math.abs(r1.getDouble(5) - m1) < 1e-12)
    assert(m1 > 23.0 && m1 < 24.0) // the wrap: NOT near noon
    val r2 = out(1)
    assert(r2.getLong(2) == 5L) // tie broken to the smaller hour
    val r3 = out(2)
    assert(r3.getLong(1) == 1L && r3.getLong(2) == 0L)
    assert(r3.getDouble(3) == 1.0 && r3.getDouble(4) == 1.0)
    assert(r3.getDouble(5) == 0.0)
  }

  test("peakSlot: modal weekday-hour cell, ties to smaller slot") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-07 20:00:00")),  // Sunday 20h: slot 20
      Row("u1", ts("2024-01-14 20:30:00")),  // Sunday 20h again
      Row("u1", ts("2024-01-10 09:00:00")),  // Wednesday 9h: 3*24+9
      Row("u2", ts("2024-01-08 05:00:00")),  // Monday 5h: 29
      Row("u2", ts("2024-01-10 07:00:00")))) // Wednesday 7h: 79 tie
    val out = Behavior.peakSlot(d, "u", "ts")
      .orderBy("u").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(out == Seq(
      ("u1", 3L, 20L, 2.0 / 3.0),
      ("u2", 2L, 29L, 0.5))) // tie broken to the smaller slot
  }

  test("denseDailyCounts: zero-filled span grid with exact counts") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-01 10:00:00")),
      Row("u1", ts("2024-01-01 23:00:00")),  // day 0: 2 events
      Row("u1", ts("2024-01-04 10:00:00")),  // days 1,2 silent
      Row("u2", ts("2024-01-02 10:00:00")))) // single-day span
    val day0 = 1704067200000000L / 86400000000L
    val got = Behavior.denseDailyCounts(d, "u", "ts")
      .orderBy("u", "day").collect()
      .map(r => (r.getString(0), r.getLong(1) - day0,
        r.getLong(2))).toSeq
    assert(got == Seq(
      ("u1", 0L, 2L), ("u1", 1L, 0L), ("u1", 2L, 0L),
      ("u1", 3L, 1L), ("u2", 1L, 1L)))
  }

  test("retentionCurve: day-N membership off each entity's own " +
      "first day, exact counts") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-01 10:00:00")),
      Row("u1", ts("2024-01-02 09:00:00")),  // day 1
      Row("u1", ts("2024-01-02 23:00:00")),  // still day 1
      Row("u1", ts("2024-01-04 10:00:00")),  // day 3
      Row("u2", ts("2024-01-03 10:00:00")),
      Row("u2", ts("2024-01-04 10:00:00")),  // day 1 for u2
      Row("u3", ts("2024-01-01 10:00:00")))) // never returns
    val got = Behavior.retentionCurve(d, "u", "ts", Seq(1, 3))
      .orderBy("offset_days").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      (1, 3L, 2L, 2.0 / 3.0),
      (3, 3L, 1L, 1.0 / 3.0)))
  }

  test("typePivot: exact conditional counts, other/total buckets, " +
      "null types count only nowhere") {
    val d = df("u STRING, t STRING", Seq(
      Row("u1", "view"), Row("u1", "view"), Row("u1", "click"),
      Row("u1", "scroll"), Row("u1", null), Row("u2", "purchase")))
    val got = Behavior.typePivot(d, "u", "t",
      Seq("view", "click", "purchase"))
      .orderBy("u").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("u1", 2L, 1L, 0L, 1L, 4L),
      ("u2", 0L, 0L, 1L, 0L, 1L)))
  }

  test("funnelReport: exact reach counts, conversion from step 1, " +
      "exact mean latencies") {
    val d = df("u STRING, ts TIMESTAMP, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), "A"),
      Row("u1", ts("2024-01-01 10:00:05"), "B"),
      Row("u1", ts("2024-01-01 10:00:08"), "C"),
      Row("u2", ts("2024-01-01 10:00:00"), "A"),
      Row("u3", ts("2024-01-01 10:00:00"), "A"),
      Row("u4", ts("2024-01-01 10:00:00"), "A"),
      Row("u4", ts("2024-01-01 10:00:05"), "B"),
      Row("u4", ts("2024-01-01 10:00:07"), "C"),
      Row("u5", ts("2024-01-01 10:00:00"), "B"))) // never reaches A
    val got = Behavior.funnelReport(d, "u", "ts", "t",
      Seq("A", "B", "C"), horizonSeconds = 10L)
      .orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3),
        if (r.isNullAt(4)) null else r.getDouble(4),
        r.getDouble(5))).toSeq
    assert(got == Seq(
      (1, "A", 4L, 1.0, null, 0.0),   // no previous step
      (2, "B", 2L, 0.5, 0.5, 5.0),
      (3, "C", 2L, 0.5, 1.0, 7.5)))   // everyone who clicked bought
  }

  test("sessionPaths: ordered type sequences per gap session, " +
      "exact counts, deterministic top-k ties") {
    val d = df("u STRING, ts TIMESTAMP, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), "view"),
      Row("u1", ts("2024-01-01 10:00:10"), "click"),   // s1 v>c
      Row("u1", ts("2024-01-01 12:00:00"), "view"),
      Row("u1", ts("2024-01-01 12:00:05"), "click"),   // s2 v>c
      Row("u2", ts("2024-01-01 10:00:00"), "view"),    // s3 v
      Row("u2", ts("2024-01-01 13:00:00"), "buy")))    // s4 buy
    val got = Behavior.sessionPaths(d, "u", "ts", "t", 1800L, 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // ties at count 1 break lexicographically; only k=3 survive
    assert(got == Seq(("view>click", 2L), ("buy", 1L), ("view", 1L)))
  }

  test("dowVector: Sunday = phase 0, modal weekday with exact " +
      "share, circular mean on the 7-cycle") {
    val d = df("u STRING, ts TIMESTAMP", Seq(
      Row("u1", ts("2024-01-07 10:00:00")),  // Sunday  -> 0
      Row("u1", ts("2024-01-14 09:00:00")),  // Sunday  -> 0
      Row("u1", ts("2024-01-10 12:00:00")))) // Wednesday -> 3
    val out = Behavior.dowVector(d, "u", "ts").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 3L && r.getLong(2) == 0L)
    assert(math.abs(r.getDouble(3) - 2.0 / 3.0) < 1e-12)
    def th(i: Int) = 2 * math.Pi * i / 7
    val x = 2 * math.cos(th(0)) + math.cos(th(3))
    val y = 2 * math.sin(th(0)) + math.sin(th(3))
    assert(math.abs(r.getDouble(4) -
      math.sqrt(x * x + y * y) / 3.0) < 1e-12)
    val m = (math.atan2(y, x) / (2 * math.Pi) * 7 + 7) % 7
    assert(math.abs(r.getDouble(5) - m) < 1e-12)
  }

  test("sessionTypeJaccard: distinct type sets per gap session, " +
      "predecessor overlap, first sessions absent") {
    val d = df("u STRING, ts TIMESTAMP, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), "A"),
      Row("u1", ts("2024-01-01 10:00:10"), "B"),   // s1 {A,B}
      Row("u1", ts("2024-01-01 11:00:00"), "B"),
      Row("u1", ts("2024-01-01 11:00:05"), "C"),
      Row("u1", ts("2024-01-01 11:00:06"), "B"),   // s2 {B,C}
      Row("u1", ts("2024-01-01 12:30:00"), "D"),   // s3 {D}
      Row("u2", ts("2024-01-01 10:00:00"), "A")))  // one session only
    val out = Behavior.sessionTypeJaccard(d, "u", "ts", "t", 1800L)
      .orderBy("u", "session_id").collect()
    val got = out.map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    assert(got == Seq(
      ("u1", 2L, 2L, 2L, 1L, 1.0 / 3.0),
      ("u1", 3L, 2L, 1L, 0L, 0.0)))
  }

  test("activeDayStreak: per-event running streak, gaps reset, " +
      "UTC-day grid, repeat events on a day share its streak") {
    val d = df("u STRING, ts TIMESTAMP, id BIGINT", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), 1L), // day 1 of 1
      Row("u1", ts("2024-01-02 09:00:00"), 2L), // day 2 of streak
      Row("u1", ts("2024-01-02 23:00:00"), 3L), // still day 2
      Row("u1", ts("2024-01-03 00:30:00"), 4L), // day 3
      Row("u1", ts("2024-01-05 10:00:00"), 5L), // gap: reset to 1
      Row("u1", ts("2024-01-06 10:00:00"), 6L), // 2 again
      Row("u2", ts("2024-01-04 10:00:00"), 7L)))
    val out = Behavior.activeDayStreak(d, "u", "ts")
      .orderBy("id").collect()
    val j = out(0).fieldIndex("streak_days")
    assert(out.map(_.getLong(j)).toSeq ==
      Seq(1L, 2L, 2L, 3L, 1L, 2L, 1L))
  }
}
