package graft

import graft.temporal.WindowOps
import org.apache.spark.sql.Row
import java.sql.Timestamp

class WindowOpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def frame() = df("e STRING, ts TIMESTAMP, v DOUBLE", Seq(
    Row("a", ts("2024-01-01 10:00:00"), 1.0),
    Row("a", ts("2024-01-01 10:10:00"), null),
    Row("a", ts("2024-01-01 10:20:00"), 3.0),
    Row("a", ts("2024-01-01 12:00:00"), null),
    Row("b", ts("2024-01-01 10:00:00"), null),
    Row("b", ts("2024-01-01 10:05:00"), 7.0)))

  test("forwardFill carries last non-null; leading null stays") {
    val out = WindowOps.forwardFill(frame(), "e", "ts", Seq("v"))
      .orderBy("e", "ts")
    assert(column(out, "v_ffill") == Seq(1.0, 1.0, 3.0, 3.0, null, 7.0))
  }

  test("backFill takes next non-null; trailing null stays") {
    val out = WindowOps.backFill(frame(), "e", "ts", Seq("v"))
      .orderBy("e", "ts")
    assert(column(out, "v_bfill") == Seq(1.0, 3.0, 3.0, null, 7.0, 7.0))
  }

  test("lagLead shift within entity") {
    val out = WindowOps.lagLead(frame(), "e", "ts", Seq("v"), k = 1)
      .orderBy("e", "ts")
    assert(column(out, "v_lag1") == Seq(null, 1.0, null, 3.0, null, null))
    assert(column(out, "v_lead1") == Seq(null, 3.0, null, null, 7.0, null))
  }

  test("rollingRows window of k rows") {
    val out = WindowOps.rollingRows(frame(), "e", "ts", Seq("v"), k = 2,
      aggs = Seq("sum", "count")).orderBy("e", "ts")
    assert(column(out, "v_roll2_sum") == Seq(1.0, 1.0, 3.0, 3.0, null, 7.0))
    assert(column(out, "v_roll2_count") == Seq(1L, 1L, 1L, 1L, 0L, 1L))
  }

  test("rollingRange trailing time window") {
    val out = WindowOps.rollingRange(frame(), "e", "ts", Seq("v"),
      seconds = 1200, aggs = Seq("sum")).orderBy("e", "ts")
    // third a-row sees rows at 10:00..10:20 -> 1+3; fourth sees only itself
    assert(column(out, "v_rng1200s_sum") ==
      Seq(1.0, 1.0, 4.0, null, null, 7.0))
  }

  test("sessionize splits on gap > threshold") {
    val out = WindowOps.sessionize(frame(), "e", "ts", gapSeconds = 1800)
      .orderBy("e", "ts")
    assert(column(out, "session_id") == Seq(1L, 1L, 1L, 2L, 1L, 1L))
  }

  test("sessionStats: per-session counts, exact durations, mean gap " +
      "null for singletons") {
    val out = WindowOps.sessionStats(frame(), "e", "ts",
      gapSeconds = 1800).orderBy("e", "session_id").collect()
    // frame(): entity a = 3 events then a gap -> sessions (a,1) of 3
    // and (a,2) of 1; entity b = one 2-event session
    val byKey = out.map(r => (r.getString(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(5),
        if (r.isNullAt(6)) null else r.getDouble(6))).toMap
    assert(byKey.keySet == Set(("a", 1L), ("a", 2L), ("b", 1L)))
    val (na, da, ga) = byKey(("a", 1L))
    assert(na == 3L && da > 0L && ga == da.toDouble / 2)
    val (n2, d2, g2) = byKey(("a", 2L))
    assert(n2 == 1L && d2 == 0L && g2 == null) // singleton: null gap
  }

  test("decayedRollingSum: golden values, null terms drop, k bounds history") {
    // events 6h apart with halfLife 6h -> weights 1, 0.5, 0.25
    val d = df("e STRING, ts TIMESTAMP, v DOUBLE", Seq(
      Row("a", ts("2024-01-01 00:00:00"), 1.0),
      Row("a", ts("2024-01-01 06:00:00"), 2.0),
      Row("a", ts("2024-01-01 12:00:00"), 4.0),
      Row("a", ts("2024-01-01 18:00:00"), null), // null value -> term 0
      Row("b", ts("2024-01-01 00:00:00"), 5.0)))
    val out = WindowOps.decayedRollingSum(d, "e", "ts", "v", k = 3,
      halfLifeSeconds = 21600.0).orderBy("e", "ts")
    val got = column(out, "decayed_sum").map(_.asInstanceOf[Double])
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1) - 2.5) < 1e-12)            // 2 + 1*0.5
    assert(math.abs(got(2) - 5.25) < 1e-12)           // 4 + 2*.5 + 1*.25
    assert(math.abs(got(3) - (4 * 0.5 + 2 * 0.25)) < 1e-12) // cur null
    assert(math.abs(got(4) - 5.0) < 1e-12)            // other entity
    // k truncation: with k=2 the 12h row forgets the first event
    val k2 = WindowOps.decayedRollingSum(d, "e", "ts", "v", k = 2,
      halfLifeSeconds = 21600.0).orderBy("e", "ts")
    assert(math.abs(column(k2, "decayed_sum")(2)
      .asInstanceOf[Double] - 5.0) < 1e-12)           // 4 + 2*0.5
  }

  test("rollingQuantile: interpolated median/p90, null skip, frame bound") {
    val d = df("e STRING, ts TIMESTAMP, v DOUBLE", Seq(
      Row("a", ts("2024-01-01 10:00:00"), 4.0),
      Row("a", ts("2024-01-01 10:10:00"), 1.0),
      Row("a", ts("2024-01-01 10:20:00"), null),
      Row("a", ts("2024-01-01 10:30:00"), 3.0),
      Row("a", ts("2024-01-01 10:40:00"), 2.0),
      Row("b", ts("2024-01-01 10:00:00"), null)))
    val out = WindowOps.rollingQuantile(d, "e", "ts", "v",
      k = 3, q = 0.5, out = "m").orderBy("e", "ts")
    val got = column(out, "m")
    assert(got(0) == 4.0)                 // singleton
    assert(got(1) == 2.5)                 // {4,1} even -> interp midpoint
    assert(got(2) == 2.5)                 // {4,1,null} -> nulls skipped
    assert(got(3) == 2.0)                 // {1,null,3} -> {1,3}
    assert(got(4) == 2.5)                 // {null,3,2}
    assert(got(5) == null)                // all-null frame
    // general q: p75 of {1,2,3,4} = 1 + 3*0.75 bracket = 3.25
    val d2 = df("e STRING, ts TIMESTAMP, v DOUBLE", Seq(
      Row("a", ts("2024-01-01 10:00:00"), 2.0),
      Row("a", ts("2024-01-01 10:10:00"), 4.0),
      Row("a", ts("2024-01-01 10:20:00"), 1.0),
      Row("a", ts("2024-01-01 10:30:00"), 3.0)))
    val p75 = WindowOps.rollingQuantile(d2, "e", "ts", "v",
      k = 4, q = 0.75, out = "p").orderBy("ts")
    assert(column(p75, "p").last == 3.25)
    intercept[IllegalArgumentException] {
      WindowOps.rollingQuantile(d2, "e", "ts", "v", k = 0, q = 0.5, "x")
    }
    intercept[IllegalArgumentException] {
      WindowOps.rollingQuantile(d2, "e", "ts", "v", k = 3, q = 1.5, "x")
    }
  }

  test("expandingMean: strictly-past frame, micro-unit exactness, nulls") {
    val d = df("k STRING, ts TIMESTAMP, v DOUBLE", Seq(
      Row("a", ts("2024-01-01 10:00:00"), 1.5),
      Row("a", ts("2024-01-01 10:10:00"), null),
      Row("a", ts("2024-01-01 10:20:00"), 2.5),
      Row("a", ts("2024-01-01 10:30:00"), 100.0),
      Row("b", ts("2024-01-01 10:00:00"), 9.0)))
    val out = WindowOps.expandingMean(d, "k", "ts", "v", out = "m")
      .orderBy("k", "ts")
    // row 0: no history -> null; row 1 sees {1.5}; row 2 sees {1.5}
    // (null not counted); row 3 sees {1.5, 2.5} -> 2.0 exactly
    assert(column(out, "m") == Seq(null, 1.5, 1.5, 2.0, null))
    assert(column(out, "m_n") == Seq(0L, 1L, 1L, 2L, 0L))
  }

  test("interpolateFill: time-weighted interior fill, edge fallbacks") {
    val d = df("e STRING, ts TIMESTAMP, v DOUBLE", Seq(
      Row("a", ts("2024-01-01 10:00:00"), null), // leading -> backfill
      Row("a", ts("2024-01-01 10:10:00"), 1.0),
      Row("a", ts("2024-01-01 10:15:00"), null), // 1/4 of 20min gap
      Row("a", ts("2024-01-01 10:30:00"), 5.0),
      Row("a", ts("2024-01-01 10:40:00"), null), // trailing -> ffill
      Row("c", ts("2024-01-01 10:00:00"), null))) // all-null entity
    val out = WindowOps.interpolateFill(d, "e", "ts", "v", out = "f")
      .orderBy("e", "ts")
    // interior: 1.0 + (5.0-1.0) * (5min/20min) = 2.0
    assert(column(out, "f") == Seq(1.0, 1.0, 2.0, 5.0, 5.0, null))
  }

  test("timeToNextEvent: forward-only, censored at horizon, exact us") {
    val d = df("e STRING, ts TIMESTAMP, t STRING", Seq(
      Row("a", ts("2024-01-01 10:00:00"), "view"),
      Row("a", ts("2024-01-01 10:30:00"), "buy"),
      Row("a", ts("2024-01-01 11:00:00"), "view"),
      Row("a", ts("2024-01-01 15:00:00"), "buy"),
      Row("a", ts("2024-01-01 16:00:00"), "view"), // no next -> censored
      Row("b", ts("2024-01-01 10:00:00"), "view"))) // never -> censored
    import org.apache.spark.sql.functions.col
    val out = WindowOps.timeToNextEvent(d, "e", "ts",
      col("t") === "buy", horizonSeconds = 3600 * 3)
      .orderBy("e", "ts")
    val h = 3L * 3600L * 1000000L
    // only the first row observes (30 min to the 10:30 buy); the
    // 10:30 buy's NEXT buy is 4.5h away and the 11:00 view's is 4h
    // away — both beyond the 3h horizon, so censored at h
    assert(column(out, "tte_us") ==
      Seq(1800000000L, h, h, h, h, h))
    assert(column(out, "tte_observed") ==
      Seq(true, false, false, false, false, false))
    intercept[IllegalArgumentException] {
      WindowOps.timeToNextEvent(d, "e", "ts", col("t") === "buy", 0)
    }
  }

  test("rollingZScore: prior-only baseline, exact moments, degenerate " +
      "baselines refuse to flag") {
    val d = df("e STRING, ts TIMESTAMP, v DOUBLE", Seq(
      Row("a", ts("2024-01-01 10:00:00"), 10.0),
      Row("a", ts("2024-01-01 10:10:00"), 12.0),
      Row("a", ts("2024-01-01 10:20:00"), 11.0),
      Row("a", ts("2024-01-01 10:30:00"), 100.0), // spike
      Row("b", ts("2024-01-01 10:00:00"), 5.0),
      Row("b", ts("2024-01-01 10:10:00"), 5.0),
      Row("b", ts("2024-01-01 10:20:00"), 9.0))) // constant baseline
    val out = WindowOps.rollingZScore(d, "e", "ts", "v", k = 5)
      .orderBy("e", "ts")
    val z = column(out, "v_rz")
    val fl = column(out, "v_anomaly")
    assert(z(0) == null && z(1) == null) // 0 and 1 prior readings
    // prior {10,12}: mean 11, population std 1 -> z = 0
    assert(z(2) == 0.0 && fl(2) == false)
    // prior {10,12,11}: mean 11, var 2/3; spike z = 89/sqrt(2/3)
    val expect = 89.0e6 / math.sqrt(
      (100.0 + 144.0 + 121.0) / 3.0 * 1e12 - 121.0 * 1e12)
    assert(math.abs(z(3).asInstanceOf[Double] - expect) < 1e-6)
    assert(fl(3) == true)
    // constant prior baseline: std 0 -> null z, never flags
    assert(z(6) == null && fl(6) == false)
    intercept[IllegalArgumentException] {
      WindowOps.rollingZScore(d, "e", "ts", "v", k = 1)
    }
  }

  test("labelWindow: strictly-future horizon mass, same-instant and " +
      "self excluded, NaN/null carry no mass") {
    val d = df("e STRING, ts TIMESTAMP, v DOUBLE", Seq(
      Row("a", ts("2024-01-01 10:00:00"), 100.0),
      Row("a", ts("2024-01-01 10:00:00"), 7.0),   // same instant
      Row("a", ts("2024-01-01 10:30:00"), 2.5),
      Row("a", ts("2024-01-01 11:30:00"), null),  // no mass, no count
      Row("a", ts("2024-01-01 13:30:00"), 4.0)))  // beyond 2h of row 1
    val out = WindowOps.labelWindow(d, "e", "ts", "v",
      horizonSeconds = 7200).orderBy("ts", "v")
    // row v=7.0 at 10:00 sees 2.5 only (100.0 shares its instant ->
    // excluded); row 100.0 likewise; 10:30 sees 4.0? no — 13:30 is
    // 3h away -> sees nothing with mass
    assert(column(out, "label_micros") ==
      Seq(2500000L, 2500000L, 0L, 4000000L, 0L))
    assert(column(out, "label_n") == Seq(1L, 1L, 0L, 1L, 0L))
    intercept[IllegalArgumentException] {
      WindowOps.labelWindow(d, "e", "ts", "v", 0)
    }
  }

  test("lifetimeFeatures: exact age/seq, retrospective denominators, " +
      "singleton null share") {
    val d = df("e STRING, ts TIMESTAMP", Seq(
      Row("a", ts("2024-01-01 10:00:00")),
      Row("a", ts("2024-01-01 10:30:00")),
      Row("a", ts("2024-01-01 12:00:00")),
      Row("b", ts("2024-01-01 10:00:00"))))
    val out = WindowOps.lifetimeFeatures(d, "e", "ts")
      .orderBy("e", "ts")
    assert(column(out, "age_us") ==
      Seq(0L, 1800000000L, 7200000000L, 0L))
    assert(column(out, "event_seq") == Seq(1, 2, 3, 1))
    assert(column(out, "n_total") == Seq(3L, 3L, 3L, 1L))
    assert(column(out, "life_frac") == Seq(0.0, 0.25, 1.0, null))
  }

  test("gapStats: exact moments over integer-us gaps, singleton null") {
    val d = df("e STRING, ts TIMESTAMP", Seq(
      Row("a", ts("2024-01-01 10:00:00")),
      Row("a", ts("2024-01-01 10:00:10")),
      Row("a", ts("2024-01-01 10:00:40")),
      Row("b", ts("2024-01-01 10:00:00"))))
    val out = WindowOps.gapStats(d, "e", "ts").orderBy("e").collect()
    val a = out(0)
    assert(a.getAs[Long]("n_events") == 3L && a.getAs[Long]("n_gaps") == 2L)
    assert(a.getAs[Long]("gap_min_us") == 10000000L)
    assert(a.getAs[Long]("gap_max_us") == 30000000L)
    assert(a.getAs[Double]("gap_mean_us") == 20000000.0)
    // population std of {10s, 30s} = 10s exactly
    assert(math.abs(a.getAs[Double]("gap_std_us") - 10000000.0) < 1e-6)
    val b = out(1)
    assert(b.getAs[Long]("n_events") == 1L && b.getAs[Long]("n_gaps") == 0L)
    assert(b.isNullAt(b.fieldIndex("gap_mean_us")) &&
      b.isNullAt(b.fieldIndex("gap_std_us")) &&
      b.isNullAt(b.fieldIndex("gap_min_us")))
  }

  test("new window ops stack with the old on ONE exchange") {
    val chained = WindowOps.interpolateFill(
      WindowOps.rollingQuantile(
        WindowOps.forwardFill(frame(), "e", "ts", Seq("v")),
        "e", "ts", "v", k = 3, q = 0.5, out = "m"),
      "e", "ts", "v", out = "f")
    val plan = chained.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("sessionFeatures: per-session rollup, exact micros, null spend = 0") {
    val d = df("e STRING, ts TIMESTAMP, v DOUBLE, t STRING", Seq(
      Row("a", ts("2024-01-01 10:00:00"), 1.5, "view"),
      Row("a", ts("2024-01-01 10:10:00"), null, "view"),
      Row("a", ts("2024-01-01 10:20:00"), 2.25, "purchase"),
      Row("a", ts("2024-01-01 12:00:00"), 4.0, "view"),
      Row("b", ts("2024-01-01 10:00:00"), 7.0, "view")))
    val out = WindowOps.sessionFeatures(d, "e", "ts", gapSeconds = 1800,
      valueCol = "v", typeCol = "t").orderBy("e", "session_id")
    assert(column(out, "duration_us") == Seq(1200000000L, 0L, 0L))
    assert(column(out, "n_events") == Seq(3L, 1L, 1L))
    assert(column(out, "n_event_types") == Seq(2L, 1L, 1L))
    // 1.5 + null + 2.25 -> 1_500_000 + 0 + 2_250_000 micro-units
    assert(column(out, "value_micros") == Seq(3750000L, 4000000L, 7000000L))
  }

  test("sessionFeatures: post-window exchange carries sessions via partial agg") {
    val plan = WindowOps.sessionFeatures(frame(), "e", "ts", 1800,
      valueCol = "v", typeCol = "e").queryExecution.executedPlan.toString
    // partial HashAggregate must sit below the final exchange so the
    // shuffle after the session window carries |sessions| rows
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("stacked window ops reuse ONE exchange") {
    val chained = WindowOps.sessionize(
      WindowOps.lagLead(
        WindowOps.forwardFill(frame(), "e", "ts", Seq("v")),
        "e", "ts", Seq("v"), 1),
      "e", "ts", 1800)
    val plan = chained.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("resampleBars: OHLC per bucket, synthesized empty bars carry " +
      "close, NaN/null readings never win open/close or count in n") {
    val d = df("e STRING, ts TIMESTAMP, v DOUBLE", Seq(
      Row("a", ts("2024-01-01 00:00:10"), 1.0),
      Row("a", ts("2024-01-01 00:00:20"), null), // missing reading
      Row("a", ts("2024-01-01 00:00:50"), 3.0),
      Row("a", ts("2024-01-01 00:02:05"), Double.NaN), // all-NaN bar
      Row("a", ts("2024-01-01 00:05:30"), 7.0),
      Row("b", ts("2024-01-01 00:03:00"), 2.0)))
    val out = WindowOps.resampleBars(d, "e", "ts", "v",
      widthSeconds = 60L).orderBy("e", "bar_start_s").collect()
    val a = out.filter(_.getString(0) == "a")
    assert(a.length == 6, "b0..b5 inclusive grid for entity a")
    def bar(r: org.apache.spark.sql.Row) =
      (r.getLong(2), Option(r.get(3)), Option(r.get(4)),
        Option(r.get(5)), Option(r.get(6)))
    assert(bar(a(0)) === ((2L, Some(1.0), Some(3.0), Some(1.0),
      Some(3.0)))) // open=first by ts, close=last by ts, null skipped
    assert(bar(a(1)) === ((0L, None, None, None, Some(3.0)))) // gap
    assert(bar(a(2)) === ((0L, None, None, None, Some(3.0)))) // NaN bar
    assert(bar(a(3)) === ((0L, None, None, None, Some(3.0))))
    assert(bar(a(4)) === ((0L, None, None, None, Some(3.0))))
    assert(bar(a(5)) === ((1L, Some(7.0), Some(7.0), Some(7.0),
      Some(7.0))))
    // epoch-second bucket starts, width apart
    assert(a.map(_.getLong(1)).toSeq ==
      (0 to 5).map(b => 1704067200L + b * 60L))
    assert(out.count(_.getString(0) == "b") == 1)
    // a pathological gap fails loudly, never silently truncates
    intercept[Exception] {
      WindowOps.resampleBars(d, "e", "ts", "v", widthSeconds = 60L,
        maxGapBars = 1).collect()
    }
  }

  private def corrFrame() =
    df("e STRING, ts TIMESTAMP, x DOUBLE, y DOUBLE", Seq(
      Row("a", ts("2024-01-01 10:00:00"), 1.0, 2.0),
      Row("a", ts("2024-01-01 10:10:00"), 2.0, 4.0),
      Row("a", ts("2024-01-01 10:20:00"), 5.0, null), // incomplete
      Row("a", ts("2024-01-01 10:30:00"), Double.NaN, 8.0), // missing
      Row("a", ts("2024-01-01 10:40:00"), 3.0, 5.0),
      Row("b", ts("2024-01-01 10:00:00"), 1.0, 5.0),
      Row("b", ts("2024-01-01 10:10:00"), 1.0, 7.0),
      Row("b", ts("2024-01-01 10:20:00"), 2.0, 9.0)))

  test("rollingCorr: prior-only pairwise-complete moments, exact " +
      "corr/beta, degenerate variance refuses") {
    val out = WindowOps.rollingCorr(corrFrame(), "e", "ts", "x", "y",
      k = 5).orderBy("e", "ts")
    val c = column(out, "x_y_corr")
    val b = column(out, "x_y_beta")
    assert(c(0) == null && c(1) == null) // 0 and 1 prior pairs
    // prior pairs {(1,2),(2,4)}: y = 2x exactly
    assert(c(2) == 1.0 && b(2) == 2.0)
    // null-y and NaN-x rows add NO pair: same two priors throughout
    assert(c(3) == 1.0 && b(3) == 2.0)
    assert(c(4) == 1.0 && b(4) == 2.0)
    // constant-x prior baseline: dx = 0 -> both refuse (null)
    assert(c(7) == null && b(7) == null)
    intercept[IllegalArgumentException] {
      WindowOps.rollingCorr(corrFrame(), "e", "ts", "x", "x", k = 5)
    }
    intercept[IllegalArgumentException] {
      WindowOps.rollingCorr(corrFrame(), "e", "ts", "x", "y", k = 1)
    }
  }

  test("drawdown: exact micro drawdown, peak age with re-touch reset, " +
      "null aging") {
    val d = df("e STRING, ts TIMESTAMP, v DOUBLE", Seq(
      Row("a", ts("2024-01-01 10:00:00"), 5.0),
      Row("a", ts("2024-01-01 10:01:00"), 3.0),
      Row("a", ts("2024-01-01 10:02:00"), null), // ages the peak
      Row("a", ts("2024-01-01 10:03:00"), 5.0),  // re-touch resets age
      Row("a", ts("2024-01-01 10:04:00"), 4.5),
      Row("b", ts("2024-01-01 10:00:00"), null), // no peak yet
      Row("b", ts("2024-01-01 10:01:00"), 2.0)))
    val out = WindowOps.drawdown(d, "e", "ts", "v").orderBy("e", "ts")
    assert(column(out, "v_runmax") ==
      Seq(5.0, 5.0, 5.0, 5.0, 5.0, null, 2.0))
    assert(column(out, "v_drawdown_micros") ==
      Seq(0L, 2000000L, null, 0L, 500000L, null, 0L))
    assert(column(out, "v_rows_since_peak") ==
      Seq(0, 1, 2, 0, 1, null, 0))
  }

  test("drawdown stacks with rollingZScore on ONE exchange") {
    val chained = WindowOps.drawdown(
      WindowOps.rollingZScore(corrFrame(), "e", "ts", "x", k = 5),
      "e", "ts", "x")
    val plan = chained.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("timeWeightedMean: hold-previous integral, null rows accrue " +
      "the prior value, leading nulls read null, exact segments") {
    val d = df("e BIGINT, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row(1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      Row(1L, ts("2024-01-01 10:00:10"), 2L, 20.0),
      Row(1L, ts("2024-01-01 10:00:40"), 3L, null), // 20 keeps holding
      Row(1L, ts("2024-01-01 10:01:00"), 4L, 2.0),
      Row(2L, ts("2024-01-01 10:00:00"), 5L, null), // no observation yet
      Row(2L, ts("2024-01-01 10:00:10"), 6L, 4.0),
      Row(2L, ts("2024-01-01 10:00:20"), 7L, 8.0)))
    val out = WindowOps.timeWeightedMean(d, "e", "ts", "v",
      tieBreak = Seq("id")).orderBy("id").collect()
    // id1: no prior time -> null; id2: 10 held for 10s -> 10
    assert(out(0).isNullAt(4))
    assert(out(1).getDouble(4) == 10.0)
    // id3: (10*10 + 20*30) / 40 = 17.5
    assert(out(2).getDouble(4) == 17.5)
    // id4: (10*10 + 20*30 + 20*20) / 60 = 18.333333...
    assert(math.abs(out(3).getDouble(4) - 1100.0 / 60.0) < 1e-9)
    // entity 2: leading-null segment excluded from BOTH sides
    assert(out(4).isNullAt(4)) // nothing observed, nothing covered
    assert(out(5).isNullAt(4)) // covered time still 0 at first obs
    assert(out(6).getDouble(4) == 4.0) // 4 held for 10 covered secs
  }

  test("rateOfChange: golden quotients, null rows carry nothing, " +
      "first observations and zero dt refuse, one exchange") {
    val d = df("e BIGINT, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row(1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      Row(1L, ts("2024-01-01 10:00:10"), 2L, 30.0), // +2/s
      Row(1L, ts("2024-01-01 10:00:20"), 3L, null), // gap: no carry
      Row(1L, ts("2024-01-01 10:00:30"), 4L, 70.0), // vs id2: 2/s over 20s
      Row(1L, ts("2024-01-01 10:00:40"), 5L, 90.0), // +2/s again
      Row(2L, ts("2024-01-01 10:00:00"), 6L, 5.0)))
    val out = WindowOps.rateOfChange(d, "e", "ts", "v",
      tieBreak = Seq("id")).orderBy("id").collect()
    def g(i: Int, c: String) = {
      val j = out(i).fieldIndex(c)
      if (out(i).isNullAt(j)) null else out(i).getDouble(j)
    }
    assert(g(0, "v_d1") == null)            // first observation
    assert(g(1, "v_d1") == 2.0)             // (30-10)/10
    assert(g(2, "v_d1") == null)            // missing reading
    assert(g(3, "v_d1") == 2.0)             // (70-30)/20, skips null
    assert(g(1, "v_d2") == null)            // first velocity
    assert(g(3, "v_d2") == 0.0)             // (2-2)/20
    assert(g(4, "v_d2") == 0.0)
    assert(g(5, "v_d1") == null)            // entity 2 singleton
    val plan = WindowOps.rateOfChange(d, "e", "ts", "v", Seq("id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan)
  }

  test("timeWeightedMean stacks on ONE exchange, no extra sort") {
    val d = df("e BIGINT, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row(1L, ts("2024-01-01 10:00:00"), 1L, 1.0)))
    val plan = WindowOps.timeWeightedMean(d, "e", "ts", "v",
      tieBreak = Seq("id")).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan)
    assert(!plan.contains("SinglePartition"), plan.take(600))
  }

  test("rollingCorr stacks with rollingZScore on ONE exchange") {
    val chained = WindowOps.rollingCorr(
      WindowOps.rollingZScore(corrFrame(), "e", "ts", "x", k = 5),
      "e", "ts", "x", "y", k = 5)
    val plan = chained.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
    assert(!plan.contains("SinglePartition"), plan.take(600))
  }

  test("trendFit: exact OLS per entity, centering off the entity's " +
      "first instant (null-value rows included), degenerates refuse") {
    val d = df("e BIGINT, ts TIMESTAMP, v DOUBLE", Seq(
      // perfect line: slope 0.1/s, intercept 1.0, r2 1.0
      Row(1L, ts("2024-01-01 10:00:00"), 1.0),
      Row(1L, ts("2024-01-01 10:00:10"), 2.0),
      Row(1L, ts("2024-01-01 10:00:20"), 3.0),
      // leading null row anchors centering but isn't an observation:
      // intercept extrapolates BACK to the null row's instant
      Row(2L, ts("2024-01-01 10:00:00"), null),
      Row(2L, ts("2024-01-01 10:00:10"), 4.0),
      Row(2L, ts("2024-01-01 10:00:30"), 8.0),
      Row(3L, ts("2024-01-01 10:00:00"), 5.0),   // singleton
      Row(4L, ts("2024-01-01 10:00:00"), 4.0),   // flat: r2 refuses
      Row(4L, ts("2024-01-01 10:00:10"), 4.0),
      Row(5L, ts("2024-01-01 10:00:00"), 1.0),   // zero time spread
      Row(5L, ts("2024-01-01 10:00:00"), 2.0),
      Row(6L, ts("2024-01-01 10:00:00"), null))) // nothing observed
    val out = WindowOps.trendFit(d, "e", "ts", "v").orderBy("e")
      .collect()
    def g(i: Int, c: String) = {
      val j = out(i).fieldIndex(c)
      if (out(i).isNullAt(j)) null else out(i).getDouble(j)
    }
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 2L, 1L, 2L, 2L, 0L))
    assert(math.abs(g(0, "trend_slope").asInstanceOf[Double] - 0.1)
      < 1e-12)
    assert(math.abs(g(0, "trend_intercept").asInstanceOf[Double] - 1.0)
      < 1e-9)
    assert(math.abs(g(0, "r2").asInstanceOf[Double] - 1.0) < 1e-12)
    // entity 2: (8-4)/(30-10)=0.2/s; back at t=0 (the null row): 2.0
    assert(math.abs(g(1, "trend_slope").asInstanceOf[Double] - 0.2)
      < 1e-12)
    assert(math.abs(g(1, "trend_intercept").asInstanceOf[Double] - 2.0)
      < 1e-9)
    assert(g(2, "trend_slope") == null)  // n < 2
    assert(g(3, "trend_slope") == 0.0)   // flat line fits exactly
    assert(g(3, "r2") == null)           // zero value variance
    assert(g(4, "trend_slope") == null)  // den = 0
    assert(g(5, "trend_slope") == null)  // no observations at all
  }

  test("rankNormalize: exact (rank-1)/(n-1) among non-null only, " +
      "ties share the low rank, NaN/null read null, singletons " +
      "refuse, one exchange") {
    val d = df("e STRING, id BIGINT, v DOUBLE", Seq(
      Row("a", 1L, 10.0),
      Row("a", 2L, 20.0),
      Row("a", 3L, 20.0),
      Row("a", 4L, 40.0),
      Row("a", 5L, null),
      Row("a", 6L, Double.NaN),
      Row("b", 7L, 5.0)))
    val out = WindowOps.rankNormalize(d, "e", "v").orderBy("id")
      .collect()
    def g(i: Int) = {
      val j = out(i).fieldIndex("v_pct")
      if (out(i).isNullAt(j)) null else out(i).getDouble(j)
    }
    assert(g(0) == 0.0)
    assert(g(1) == 1.0 / 3.0)
    assert(g(2) == 1.0 / 3.0)   // tie shares the smaller rank
    assert(g(3) == 1.0)
    assert(g(4) == null)        // missing reading
    assert(g(5) == null)        // NaN is missing, not greatest
    assert(g(6) == null)        // singleton entity refuses
    val plan = WindowOps.rankNormalize(d, "e", "v")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan)
    assert(!plan.contains("SinglePartition"), plan.take(600))
  }

  test("sessionPosition: 1-based in-session ordinal and exact " +
      "micros since session start, gap resets, one exchange") {
    val d = df("e STRING, ts TIMESTAMP, id BIGINT", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), 1L),
      Row("u1", ts("2024-01-01 10:00:05"), 2L),
      Row("u1", ts("2024-01-01 10:40:00"), 3L), // > 30min gap
      Row("u1", ts("2024-01-01 10:40:10"), 4L),
      Row("u2", ts("2024-01-01 10:00:00"), 5L)))
    val out = WindowOps.sessionPosition(d, "e", "ts", 1800L,
      tieBreak = Seq("id")).orderBy("id").collect()
    def seq(i: Int) =
      out(i).getLong(out(i).fieldIndex("session_event_seq"))
    def us(i: Int) =
      out(i).getLong(out(i).fieldIndex("us_into_session"))
    assert((0 to 4).map(seq) == Seq(1L, 2L, 1L, 2L, 1L))
    assert((0 to 4).map(us) ==
      Seq(0L, 5000000L, 0L, 10000000L, 0L))
    val plan = WindowOps.sessionPosition(d, "e", "ts", 1800L,
      Seq("id")).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan)
    assert(!plan.contains("SinglePartition"), plan.take(600))
  }

  test("rollingRobustZ: interp median/MAD over the trailing frame, " +
      "zero MAD refuses, NaN is missing, even frames interpolate") {
    val d = df("e STRING, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row("a", ts("2024-01-01 10:00:00"), 1L, 1.0),
      Row("a", ts("2024-01-01 10:00:01"), 2L, 2.0),
      Row("a", ts("2024-01-01 10:00:02"), 3L, 3.0),
      Row("a", ts("2024-01-01 10:00:03"), 4L, 4.0),
      Row("a", ts("2024-01-01 10:00:04"), 5L, 100.0),
      Row("b", ts("2024-01-01 10:00:00"), 6L, 10.0),
      Row("b", ts("2024-01-01 10:00:01"), 7L, 10.0),
      Row("b", ts("2024-01-01 10:00:02"), 8L, 10.0),
      Row("b", ts("2024-01-01 10:00:03"), 9L, 50.0),
      Row("c", ts("2024-01-01 10:00:00"), 10L, Double.NaN),
      Row("c", ts("2024-01-01 10:00:01"), 11L, 2.0)))
    val out = WindowOps.rollingRobustZ(d, "e", "ts", "v", k = 5,
      tieBreak = Seq("id")).orderBy("id").collect()
    def g(i: Int, c: String) = {
      val j = out(i).fieldIndex(c)
      if (out(i).isNullAt(j)) null else out(i).getDouble(j)
    }
    // a@id5: frame [1,2,3,4,100] med 3, MAD 1 -> z = 97/1.4826
    assert(g(4, "v_rmed") == 3.0)
    assert(math.abs(g(4, "v_robust_z").asInstanceOf[Double] -
      97.0 / 1.4826) < 1e-9)
    // a@id2: frame [1,2] med 1.5, MAD 0.5
    assert(g(1, "v_rmed") == 1.5)
    assert(math.abs(g(1, "v_robust_z").asInstanceOf[Double] -
      0.5 / (1.4826 * 0.5)) < 1e-12)
    // b@id9: frame [10,10,10,50] med 10, MAD 0 -> refuse
    assert(g(8, "v_rmed") == 10.0)
    assert(g(8, "v_robust_z") == null)
    // c: NaN never enters the frame; id11 frame is just [2]
    assert(g(9, "v_rmed") == null || g(9, "v_rmed") == 2.0)
    assert(g(10, "v_rmed") == 2.0)
    assert(g(10, "v_robust_z") == null) // MAD 0 on a 1-frame
  }

  test("recencyByType: strictly-prior per-type carries, an event " +
      "never reads itself, no prior reads null, one exchange") {
    val d = df("e STRING, ts TIMESTAMP, id BIGINT, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), 1L, "view"),
      Row("u1", ts("2024-01-01 10:00:10"), 2L, "purchase"),
      Row("u1", ts("2024-01-01 10:00:20"), 3L, "view"),
      Row("u1", ts("2024-01-01 10:00:30"), 4L, "purchase")))
    val out = WindowOps.recencyByType(d, "e", "ts", "t",
      Seq("view", "purchase"), tieBreak = Seq("id"))
      .orderBy("id").collect()
    def g(i: Int, c: String) = {
      val j = out(i).fieldIndex(c)
      if (out(i).isNullAt(j)) null else out(i).getLong(j)
    }
    assert(g(0, "us_since_view") == null)
    assert(g(0, "us_since_purchase") == null)
    assert(g(1, "us_since_view") == 10000000L)
    assert(g(1, "us_since_purchase") == null)
    assert(g(2, "us_since_view") == 20000000L)
    assert(g(2, "us_since_purchase") == 10000000L)
    assert(g(3, "us_since_view") == 10000000L)
    assert(g(3, "us_since_purchase") == 20000000L)
    val plan = WindowOps.recencyByType(d, "e", "ts", "t",
      Seq("view", "purchase"), Seq("id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan)
  }

  test("expandingDistinctTypes: strictly-prior repertoire size, " +
      "null types introduce nothing, one exchange") {
    val d = df("e STRING, ts TIMESTAMP, id BIGINT, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), 1L, "view"),
      Row("u1", ts("2024-01-01 10:00:10"), 2L, "purchase"),
      Row("u1", ts("2024-01-01 10:00:20"), 3L, "view"),
      Row("u1", ts("2024-01-01 10:00:30"), 4L, null),
      Row("u1", ts("2024-01-01 10:00:40"), 5L, "scroll")))
    val out = WindowOps.expandingDistinctTypes(d, "e", "ts", "t",
      Seq("id")).orderBy("id").collect()
      .map(r => r.getLong(r.fieldIndex("prior_n_types"))).toSeq
    assert(out == Seq(0L, 1L, 2L, 2L, 2L))
    val plan = WindowOps.expandingDistinctTypes(d, "e", "ts", "t",
      Seq("id")).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan)
  }

  test("dwellShares: lead-dwell attribution, exact decimal sums, " +
      "other bucket catches null and unlisted types") {
    val d = df("e STRING, ts TIMESTAMP, id BIGINT, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), 1L, "view"),   // 10s
      Row("u1", ts("2024-01-01 10:00:10"), 2L, "click"),  // 30s
      Row("u1", ts("2024-01-01 10:00:40"), 3L, null),     // 20s other
      Row("u1", ts("2024-01-01 10:01:00"), 4L, "view"),   // 40s
      Row("u1", ts("2024-01-01 10:01:40"), 5L, "click"),  // no dwell
      Row("u2", ts("2024-01-01 10:00:00"), 6L, "view")))  // absent
    val out = WindowOps.dwellShares(d, "e", "ts", "t",
      Seq("view", "click"), Seq("id")).collect()
    assert(out.length == 1 && out(0).getString(0) == "u1")
    val r = out(0)
    assert(r.getDouble(1) == 0.5)   // view (10+40)/100
    assert(r.getDouble(2) == 0.3)   // click 30/100
    assert(r.getDouble(3) == 0.2)   // null-type dwell
    assert(r.getDouble(4) == 100.0) // total seconds
  }

  test("expandingTypeCounts: strictly-prior conditional counters, " +
      "an event never counts itself, null types feed nothing, " +
      "one exchange") {
    val d = df("e STRING, ts TIMESTAMP, id BIGINT, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), 1L, "view"),
      Row("u1", ts("2024-01-01 10:00:10"), 2L, "purchase"),
      Row("u1", ts("2024-01-01 10:00:20"), 3L, null),
      Row("u1", ts("2024-01-01 10:00:30"), 4L, "scroll"),
      Row("u1", ts("2024-01-01 10:00:40"), 5L, "view")))
    val out = WindowOps.expandingTypeCounts(d, "e", "ts", "t",
      Seq("view", "purchase"), tieBreak = Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getLong(2), r.getLong(4), r.getLong(5),
        r.getLong(6))).toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 0L),
      (2L, 1L, 0L, 1L),
      (3L, 1L, 1L, 2L),
      (4L, 1L, 1L, 2L),  // null type added nothing
      (5L, 1L, 1L, 3L))) // scroll counted in total only
    val plan = WindowOps.expandingTypeCounts(d, "e", "ts", "t",
      Seq("view", "purchase"), Seq("id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan)
  }

  test("gapSurprise: expanding exact prior-gap mean, strictly " +
      "prior frame, zero-history refuses, one exchange") {
    val d = df("e STRING, ts TIMESTAMP, id BIGINT", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), 1L),
      Row("u1", ts("2024-01-01 10:00:10"), 2L), // gap 10s, no prior
      Row("u1", ts("2024-01-01 10:00:30"), 3L), // gap 20s, mean 10s
      Row("u1", ts("2024-01-01 10:01:30"), 4L))) // gap 60s, mean 15s
    val out = WindowOps.gapSurprise(d, "e", "ts", Seq("id"))
      .orderBy("id").collect()
    def g(r: Row, c: String): Any =
      if (r.isNullAt(r.fieldIndex(c))) null else r.get(r.fieldIndex(c))
    assert(g(out(0), "gap_us") == null)
    assert(out(0).getLong(out(0).fieldIndex("n_prior_gaps")) == 0L)
    assert(g(out(0), "gap_surprise") == null)
    assert(g(out(1), "gap_us") == 10000000L)
    assert(g(out(1), "gap_surprise") == null) // no prior gaps yet
    assert(g(out(2), "mean_prior_gap_us") == 1e7)
    assert(g(out(2), "gap_surprise") == 2.0)   // 20s vs mean 10s
    assert(g(out(3), "mean_prior_gap_us") == 1.5e7)
    assert(g(out(3), "gap_surprise") == 4.0)   // 60s vs mean 15s
    val plan = WindowOps.gapSurprise(d, "e", "ts", Seq("id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan)
  }

  test("timeToNextType: strictly-later per-type label, an event " +
      "never reads itself, no follower reads null, one exchange") {
    val d = df("e STRING, ts TIMESTAMP, id BIGINT, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), 1L, "view"),
      Row("u1", ts("2024-01-01 10:00:10"), 2L, "purchase"),
      Row("u1", ts("2024-01-01 10:00:20"), 3L, "view"),
      Row("u1", ts("2024-01-01 10:00:30"), 4L, "purchase")))
    val out = WindowOps.timeToNextType(d, "e", "ts", "t",
      Seq("view", "purchase"), tieBreak = Seq("id"))
      .orderBy("id").collect()
    def g(i: Int, c: String) = {
      val j = out(i).fieldIndex(c)
      if (out(i).isNullAt(j)) null else out(i).getLong(j)
    }
    assert(g(0, "us_until_view") == 20000000L)
    assert(g(0, "us_until_purchase") == 10000000L)
    assert(g(1, "us_until_view") == 10000000L)
    assert(g(1, "us_until_purchase") == 20000000L) // not itself
    assert(g(2, "us_until_view") == null)
    assert(g(2, "us_until_purchase") == 10000000L)
    assert(g(3, "us_until_view") == null)
    assert(g(3, "us_until_purchase") == null)
    val plan = WindowOps.timeToNextType(d, "e", "ts", "t",
      Seq("view", "purchase"), Seq("id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan)
  }

  test("weekpartProfile: exact conditional means on the dayofweek " +
      "grid, missing values count nowhere, one-sided refuses " +
      "contrast") {
    val d = df("e STRING, ts TIMESTAMP, v DOUBLE", Seq(
      Row("u1", ts("2024-01-06 10:00:00"), 1.0),  // Saturday
      Row("u1", ts("2024-01-07 10:00:00"), 3.0),  // Sunday
      Row("u1", ts("2024-01-08 10:00:00"), 10.0), // Monday
      Row("u1", ts("2024-01-08 11:00:00"), null),
      Row("u2", ts("2024-01-06 10:00:00"), 5.0)))
    val out = WindowOps.weekpartProfile(d, "e", "ts", "v")
      .orderBy("e").collect()
    def g(i: Int, c: String) = {
      val j = out(i).fieldIndex(c)
      if (out(i).isNullAt(j)) null else out(i).getDouble(j)
    }
    assert(out(0).getLong(1) == 1L && out(0).getLong(2) == 2L)
    assert(g(0, "mean_weekday") == 10.0)
    assert(g(0, "mean_weekend") == 2.0)
    assert(math.abs(g(0, "weekend_share").asInstanceOf[Double] -
      2.0 / 3.0) < 1e-12)
    assert(g(0, "weekend_contrast") == -8.0)
    assert(g(1, "mean_weekday") == null)
    assert(g(1, "weekend_contrast") == null)
  }

  test("lagAutocorr: exact pair moments per lag, perfect trends " +
      "read ±1, constants and thin entities refuse, one exchange") {
    val d = df("e STRING, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row("a", ts("2024-01-01 10:00:00"), 1L, 1.0),
      Row("a", ts("2024-01-01 10:00:01"), 2L, 2.0),
      Row("a", ts("2024-01-01 10:00:02"), 3L, 3.0),
      Row("a", ts("2024-01-01 10:00:03"), 4L, 4.0),
      Row("a", ts("2024-01-01 10:00:04"), 5L, 5.0),
      Row("b", ts("2024-01-01 10:00:00"), 6L, 1.0),
      Row("b", ts("2024-01-01 10:00:01"), 7L, -1.0),
      Row("b", ts("2024-01-01 10:00:02"), 8L, 1.0),
      Row("b", ts("2024-01-01 10:00:03"), 9L, -1.0),
      Row("c", ts("2024-01-01 10:00:00"), 10L, 7.0),
      Row("c", ts("2024-01-01 10:00:01"), 11L, 7.0),
      Row("c", ts("2024-01-01 10:00:02"), 12L, 7.0)))
    val out = WindowOps.lagAutocorr(d, "e", "ts", "v",
      lags = Seq(1, 2), tieBreak = Seq("id"))
      .orderBy("e", "lag").collect()
    def g(i: Int) = {
      val j = out(i).fieldIndex("acf")
      if (out(i).isNullAt(j)) null else out(i).getDouble(j)
    }
    assert(out.map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toSeq == Seq(("a", 1, 4L), ("a", 2, 3L), ("b", 1, 3L),
        ("b", 2, 2L), ("c", 1, 2L), ("c", 2, 1L)))
    assert(math.abs(g(0).asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(g(1).asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(g(2).asInstanceOf[Double] + 1.0) < 1e-12)
    assert(math.abs(g(3).asInstanceOf[Double] - 1.0) < 1e-12)
    assert(g(4) == null) // constant series: zero variance refuses
    assert(g(5) == null) // single pair refuses r
    val plan = WindowOps.lagAutocorr(d, "e", "ts", "v", Seq(1, 2),
      Seq("id")).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan)
    assert(!plan.contains("SinglePartition"), plan.take(600))
  }

  test("monotoneRun: sign vs prior observed reading, equal steps " +
      "form their own run, missing readings break nothing, one " +
      "exchange") {
    val d = df("e STRING, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row("a", ts("2024-01-01 10:00:00"), 1L, 1.0),
      Row("a", ts("2024-01-01 10:00:01"), 2L, 2.0),
      Row("a", ts("2024-01-01 10:00:02"), 3L, 3.0),
      Row("a", ts("2024-01-01 10:00:03"), 4L, null),
      Row("a", ts("2024-01-01 10:00:04"), 5L, 2.0),
      Row("a", ts("2024-01-01 10:00:05"), 6L, 2.0),
      Row("a", ts("2024-01-01 10:00:06"), 7L, 5.0)))
    val out = WindowOps.monotoneRun(d, "e", "ts", "v",
      tieBreak = Seq("id")).orderBy("id").collect()
    def g(i: Int, c: String): Any = {
      val j = out(i).fieldIndex(c)
      if (out(i).isNullAt(j)) null else out(i).get(j)
    }
    assert(g(0, "v_dir") == null && g(0, "v_dir_run") == null)
    assert(g(1, "v_dir") == 1 && g(1, "v_dir_run") == 1L)
    assert(g(2, "v_dir") == 1 && g(2, "v_dir_run") == 2L)
    assert(g(3, "v_dir") == null && g(3, "v_dir_run") == null)
    assert(g(4, "v_dir") == -1 && g(4, "v_dir_run") == 1L)
    assert(g(5, "v_dir") == 0 && g(5, "v_dir_run") == 1L)
    assert(g(6, "v_dir") == 1 && g(6, "v_dir_run") == 1L)
    val plan = WindowOps.monotoneRun(d, "e", "ts", "v", Seq("id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan)
    assert(!plan.contains("SinglePartition"), plan.take(600))
  }

  test("expandingTrend: running OLS slope from the second " +
      "observation on, missing readings read null and don't " +
      "count, one exchange") {
    val d = df("e STRING, ts TIMESTAMP, id BIGINT, v DOUBLE", Seq(
      Row("a", ts("2024-01-01 10:00:00"), 1L, 1.0),
      Row("a", ts("2024-01-01 10:00:10"), 2L, 2.0),
      Row("a", ts("2024-01-01 10:00:20"), 3L, null),
      Row("a", ts("2024-01-01 10:00:30"), 4L, 4.0),
      Row("b", ts("2024-01-01 10:00:00"), 5L, 9.0)))
    val out = WindowOps.expandingTrend(d, "e", "ts", "v",
      tieBreak = Seq("id")).orderBy("id").collect()
    def g(i: Int) = {
      val j = out(i).fieldIndex("v_trend")
      if (out(i).isNullAt(j)) null else out(i).getDouble(j)
    }
    assert(g(0) == null)                      // first observation
    assert(math.abs(g(1).asInstanceOf[Double] - 0.1) < 1e-12)
    assert(g(2) == null)                      // missing reading
    // obs (0,1),(10,2),(30,4): exact line of slope 0.1/s
    assert(math.abs(g(3).asInstanceOf[Double] - 0.1) < 1e-12)
    assert(g(4) == null)                      // singleton entity
    val plan = WindowOps.expandingTrend(d, "e", "ts", "v", Seq("id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan)
    assert(!plan.contains("SinglePartition"), plan.take(600))
  }

  test("featureMatrix: the four composed feature blocks run on ONE " +
      "exchange and agree with the ops applied individually") {
    val d = df("e STRING, ts TIMESTAMP, id BIGINT, t STRING, " +
      "v DOUBLE", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      Row("u1", ts("2024-01-01 10:00:10"), 2L, "purchase", 2.0),
      Row("u1", ts("2024-01-01 10:00:20"), 3L, "view", null),
      Row("u1", ts("2024-01-01 11:00:00"), 4L, "purchase", 5.0),
      Row("u2", ts("2024-01-01 10:00:00"), 5L, "view", 7.0)))
    val fm = WindowOps.featureMatrix(d, "e", "ts", "v", "t",
      Seq("purchase"), gapSeconds = 1800L, tieBreak = Seq("id"))
    val plan = fm.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"feature matrix must plan on ONE exchange:\n$plan")
    assert(!plan.contains("SinglePartition"), plan.take(600))
    val got = fm.orderBy("id").collect()
    def gl(r: org.apache.spark.sql.Row, c: String) = {
      val j = r.fieldIndex(c)
      if (r.isNullAt(j)) null else r.get(j)
    }
    val single = WindowOps.expandingTrend(
      WindowOps.monotoneRun(
        WindowOps.recencyByType(
          WindowOps.sessionPosition(d, "e", "ts", 1800L, Seq("id")),
          "e", "ts", "t", Seq("purchase"), Seq("id")),
        "e", "ts", "v", Seq("id")),
      "e", "ts", "v", Seq("id")).orderBy("id").collect()
    Seq("session_event_seq", "us_into_session",
      "us_since_purchase", "v_dir", "v_dir_run", "v_trend")
      .foreach { c =>
        assert(got.map(gl(_, c)).toSeq ==
          single.map(gl(_, c)).toSeq, c)
      }
  }

  test("attach-style ops reject a frame already using their output " +
      "names instead of silently duplicating columns") {
    val d = df("e STRING, ts TIMESTAMP, id BIGINT, v DOUBLE, " +
      "v_trend DOUBLE", Seq(
      Row("a", ts("2024-01-01 10:00:00"), 1L, 1.0, 0.0)))
    val ex = intercept[IllegalArgumentException] {
      WindowOps.expandingTrend(d, "e", "ts", "v", Seq("id"))
    }
    assert(ex.getMessage.contains("v_trend"))
    val d2 = d.withColumnRenamed("v_trend", "session_id")
    val ex2 = intercept[IllegalArgumentException] {
      WindowOps.sessionPosition(d2, "e", "ts", 1800L, Seq("id"))
    }
    assert(ex2.getMessage.contains("session_id"))
  }

  test("typeNovelty: 1-based per-type ordinal and exact micros " +
      "since the type's first occurrence") {
    val d = df("e STRING, ts TIMESTAMP, id BIGINT, t STRING", Seq(
      Row("u1", ts("2024-01-01 10:00:00"), 1L, "view"),
      Row("u1", ts("2024-01-01 10:00:10"), 2L, "purchase"),
      Row("u1", ts("2024-01-01 10:00:20"), 3L, "view"),
      Row("u1", ts("2024-01-01 10:00:30"), 4L, "view")))
    val out = WindowOps.typeNovelty(d, "e", "ts", "t",
      tieBreak = Seq("id")).orderBy("id").collect()
    assert(out.map(_.getLong(4)).toSeq == Seq(1L, 1L, 2L, 3L))
    assert(out.map(_.getLong(5)).toSeq ==
      Seq(0L, 0L, 20000000L, 30000000L))
  }

  test("pacf2: Durbin-Levinson step off the exact ACF moments, " +
      "golden period-3 series, degenerate r1 refuses") {
    val mk = (e: String, vs: Seq[Double]) => vs.zipWithIndex.map {
      case (v, i) => Row(e, ts(f"2024-01-01 10:00:0$i"), i.toLong, v)
    }
    val d = df("e STRING, ts TIMESTAMP, id BIGINT, v DOUBLE",
      mk("a", Seq(1.0, 2.0, 3.0, 1.0, 2.0, 3.0)) ++
        mk("b", Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)))
    val out = WindowOps.pacf2(d, "e", "ts", "v",
      tieBreak = Seq("id")).orderBy("e").collect()
    val a = out(0)
    val exp = -387.0 / 495.0
    assert(math.abs(a.getDouble(a.fieldIndex("pacf2")) - exp)
      < 1e-9)
    // a perfect line has r1 = 1: nothing left for lag 2 to explain
    assert(out(1).isNullAt(out(1).fieldIndex("pacf2")))
  }

  test("trendFit runs on ONE exchange: the centering window and the " +
      "moment rollup share the entity partitioning") {
    val d = df("e BIGINT, ts TIMESTAMP, v DOUBLE", Seq(
      Row(1L, ts("2024-01-01 10:00:00"), 1.0)))
    val plan = WindowOps.trendFit(d, "e", "ts", "v")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan)
    assert(!plan.contains("SinglePartition"), plan.take(600))
  }
}
