package graft

import graft.temporal.{AsOfJoin, WindowOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal / windowed feature ops over the events table
  * (BASELINE.json north_rule extensions, SURVEY.md §2.11).
  * Left side = all events; right side = purchase events (a
  * feature-history table).
  */
object QueriesTemporal {

  import QueriesCore.tbl

  private def purchases(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events").filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("purchase_value"))

  /** DuckDB-faithful 6dp round (round 6, driver-red q263/q277/q393):
    * Spark's `round` goes through BigDecimal, which has no signed
    * zero, so a tiny NEGATIVE value (or an exact -0.0) rounds to
    * +0.0 — while DuckDB's C-style round preserves the sign and
    * emits -0.0. The driver's hash gate distinguishes the two. This
    * helper restores the pre-round signbit on zero results; every
    * non-zero result, null and NaN pass through `round` untouched.
    * (The pre-round double chains in these queries are replayed
    * bit-exactly by the oracle, so signbit parity of the INPUT is
    * already certified by the value gate.)
    */
  private def roundSignedZero(c: Column, scale: Int): Column = {
    val r = round(c, scale)
    // signbit(c): strictly negative, or exactly -0.0 (cast to string
    // preserves the sign — "-0.0"; a 1/x probe would trip ANSI
    // DIVIDE_BY_ZERO)
    val negZero = c === lit(0.0) && c.cast("string") === lit("-0.0")
    when(r === lit(0.0) && (c < 0 || negZero), lit(-0.0)).otherwise(r)
  }

  /** Shared 6dp readout for q363/q364 (identical columns, one
    * composite oracle). */
  private def profileReadout(m: DataFrame): DataFrame =
    m.select(col("user_id"), col("n_gaps"),
      round(col("burstiness"), 6).as("burstiness"),
      col("n_types"),
      round(col("type_entropy"), 6).as("type_entropy"),
      round(col("cadence_norm_entropy"), 6)
        .as("cadence_norm_entropy"),
      round(col("predictability_norm"), 6)
        .as("predictability_norm"))
      .orderBy("user_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_asof_join" -> ((s, dir) => {
      AsOfJoin.join(tbl(s, dir, "events"), purchases(s, dir),
        entity = "user_id", leftTs = "ts", rightTs = "ts",
        rightValueCols = Seq("purchase_value"))
        .select(col("event_id"), col("purchase_value"), col("matched_ts"))
        .orderBy("event_id")
    }),

    "q246_asof_fallback" -> ((s, dir) => {
      // cold-start fallback: the user's own purchase history serves
      // an event only within a 1h tolerance; events it cannot serve
      // take the cohort-level (user_id % 100) feed as-of the same
      // instant, with provenance recorded — the oracle chains two
      // DuckDB ASOF joins and applies the same staleness arithmetic.
      // The cohort feed pre-aggregates per (cohort, ts) so as-of
      // ties are impossible by construction
      val ev = tbl(s, dir, "events")
        .withColumn("cohort", col("user_id") % 100)
      val g = tbl(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy((col("user_id") % 100).as("cohort"), col("ts"))
        .agg(max(col("value")).as("purchase_value"))
      AsOfJoin.joinWithFallback(ev, purchases(s, dir), g,
        entity = "user_id", group = "cohort",
        valueCols = Seq("purchase_value"),
        toleranceSeconds = Some(3600L))
        .select(col("event_id"), col("purchase_value"),
          col("matched_ts"), col("feature_source"))
        .orderBy("event_id")
    }),

    "q251_asof_nearest" -> ((s, dir) => {
      // nearest-match alignment (merge_asof direction='nearest'): the
      // temporally closest purchase within 2h, ties broken backward.
      // The feed pre-aggregates per (user_id, ts) so equidistant
      // same-side ties are impossible; the oracle re-derives every
      // pick with a correlated LATERAL argmin over |Δt|
      val p = tbl(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("purchase_value"))
      AsOfJoin.joinNearest(tbl(s, dir, "events"), p,
        entity = "user_id", leftTs = "ts", rightTs = "ts",
        rightValueCols = Seq("purchase_value"),
        toleranceSeconds = Some(7200L))
        .select(col("event_id"), col("purchase_value"), col("matched_ts"))
        .orderBy("event_id")
    }),

    "q254_resample_bars" -> ((s, dir) => {
      // 6-hour OHLC bars per user over the (already-unique) purchase
      // series, empty buckets synthesized with close carried forward
      // — pandas resample('21600s').ohlc().ffill(). Nulls planted at
      // %13 exercise the missing-reading contract (they never win
      // open/close and don't count toward n); the oracle rebuilds
      // the full grid with generate_series + IGNORE NULLS carry
      val p = tbl(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          when(col("event_id") % 13 === 0, lit(null).cast("double"))
            .otherwise(col("value")).as("v"))
      WindowOps.resampleBars(p, "user_id", "ts", "v",
        widthSeconds = 21600L)
        .orderBy("user_id", "bar_start_s")
    }),

    "q256_rolling_corr" -> ((s, dir) => {
      // trailing co-movement screen: each event's value vs its
      // payload size (length(props)) over the user's PRIOR 20
      // readings — prior-frame, pairwise-complete, exact integer
      // moments; nulls planted at %11 exercise the pairwise contract
      val e = tbl(s, dir, "events")
        .withColumn("v", when(col("event_id") % 11 === 0,
          lit(null).cast("double")).otherwise(col("value")))
        .withColumn("pl", length(col("props")).cast("double"))
      WindowOps.rollingCorr(e, "user_id", "ts", "v", "pl",
        k = 20, tieBreak = Seq("event_id"))
        .select(col("event_id"),
          round(col("v_pl_corr"), 6).as("corr"),
          round(col("v_pl_beta"), 6).as("beta"))
        .orderBy("event_id")
    }),

    "q265_drawdown" -> ((s, dir) => {
      // running-peak staleness per user: expanding micro-unit max,
      // exact BIGINT drawdown, and peak age with ties-to-newest
      // re-touch resets; %13 nulls exercise the missing contract
      // (null drawdown, but the peak still ages)
      val e = tbl(s, dir, "events")
        .withColumn("v", when(col("event_id") % 13 === 0,
          lit(null).cast("double")).otherwise(col("value")))
      WindowOps.drawdown(e, "user_id", "ts", "v",
        tieBreak = Seq("event_id"))
        .select(col("event_id"),
          round(col("v_runmax"), 6).as("runmax"),
          col("v_drawdown_micros").as("dd_micros"),
          col("v_rows_since_peak").as("peak_age"))
        .orderBy("event_id")
    }),

    "q263_rolling_trend" -> ((s, dir) => {
      // trailing trend extraction as a COMPOSITION of q256's exact
      // machinery: beta of value on elapsed-seconds over the user's
      // prior 20 readings = the local slope (units/second), corr =
      // the trend strength; elapsed time is anchored so micro-units
      // stay exact (epoch micros overflow the micro-unit domain)
      val e = tbl(s, dir, "events").withColumn("elapsed",
        (unix_micros(col("ts").cast("timestamp")) -
          lit(1704067200000000L)).cast("double") / lit(1e6))
      WindowOps.rollingCorr(e, "user_id", "ts", "elapsed", "value",
        k = 20, tieBreak = Seq("event_id"))
        .select(col("event_id"),
          roundSignedZero(col("elapsed_value_beta"), 6).as("trend"),
          round(col("elapsed_value_corr"), 6).as("strength"))
        .orderBy("event_id")
    }),

    "q260_cohort_retention" -> ((s, dir) => {
      // daily cohort retention matrix: users cohorted by first-event
      // day, each (cohort, offset) cell = distinct users active that
      // many days later; the one float (active/size) is at readout
      graft.operators.Behavior.cohortRetention(
        tbl(s, dir, "events"), "user_id", "ts",
        periodSeconds = 86400L)
        .select(col("cohort_start_s"), col("period_offset"),
          col("cohort_size"), col("active"),
          round(col("retention"), 6).as("retention"))
        .orderBy("cohort_start_s", "period_offset")
    }),

    "q261_funnel_steps" -> ((s, dir) => {
      // ordered view -> click -> purchase funnel within 3 days of the
      // first view, every step strictly after the previous; per-user
      // first-reach micro timestamps and the depth reached
      graft.operators.Behavior.funnelSteps(
        tbl(s, dir, "events"), "user_id", "ts", "event_type",
        steps = Seq("view", "click", "purchase"),
        horizonSeconds = 3L * 86400L)
        .orderBy("user_id")
    }),

    "q262_islands" -> ((s, dir) => {
      // consecutive equal-event-type runs per user (gaps-and-islands):
      // exact run bounds/lengths from one window pair; the oracle
      // recomputes every island with the same two-step SQL
      graft.operators.Behavior.islands(
        tbl(s, dir, "events"), "user_id", "ts", "event_type",
        tieBreak = Seq("event_id"))
        .orderBy("user_id", "run_seq")
    }),

    "q267_markov_transitions" -> ((s, dir) => {
      // first-order Markov scoring: corpus transition matrix fitted
      // over (ts, event_id)-ordered bigrams, broadcast back onto
      // every event; first event per user stays null (no pseudo-
      // start token); the one division and its -ln happen in the
      // same double expression on both engines
      graft.operators.Behavior.transitionFeatures(
        tbl(s, dir, "events"), "user_id", "ts", "event_type",
        tieBreak = Seq("event_id"))
        .select(col("event_id"), col("prev_event_type"),
          col("event_type"), col("trans_n"), col("prev_n"),
          round(col("trans_p"), 6).as("trans_p"),
          round(col("trans_surprisal"), 6).as("trans_surprisal"))
        .orderBy("event_id")
    }),

    "q366_profile_orders" -> ((s, dir) => {
      // the profile matrix's generality on the second (entity, ts,
      // type) shape: customer ordering temperament over TPC-H
      // orders — the composed join must agree with the four
      // orders-generality oracles (q319/q321/q331/q337)
      graft.operators.Behavior.profileMatrix(
        tbl(s, dir, "orders"), "o_custkey", "o_orderdate",
        "o_orderpriority", tieBreak = Seq("o_orderkey"))
        .select(col("o_custkey"), col("n_gaps"),
          round(col("burstiness"), 6).as("burstiness"),
          col("n_types"),
          round(col("type_entropy"), 6).as("type_entropy"),
          round(col("cadence_norm_entropy"), 6)
            .as("cadence_norm_entropy"),
          round(col("predictability_norm"), 6)
            .as("predictability_norm"))
        .orderBy("o_custkey")
    }),

    "q364_bucketed_profile" -> ((s, dir) => {
      // the SAME profile matrix over a user_id-bucketed copy of
      // the log: four rollups + three joins, ZERO exchanges
      // (spec-pinned) — values bit-identical: literally q363's
      // composite oracle
      graft.io.BucketedTable.write(tbl(s, dir, "events"),
        "q364_events_bucketed", "user_id", 16)
      profileReadout(graft.operators.Behavior.profileMatrix(
        graft.io.BucketedTable.read(s, "q364_events_bucketed"),
        "user_id", "ts", "event_type", tieBreak = Seq("event_id")))
    }),

    "q363_behavior_profile" -> ((s, dir) => {
      // the entity-grain profile matrix: burstiness + action
      // diversity + cadence regularity + predictability, each
      // already proven alone (q279/q290/q328/q333) — the composed
      // join must agree with every oracle column for column
      profileReadout(graft.operators.Behavior.profileMatrix(
        tbl(s, dir, "events"), "user_id", "ts", "event_type",
        tieBreak = Seq("event_id")))
    }),

    "q394_urgent_shrunken" -> ((s, dir) => {
      // q348's empirical-Bayes shrinkage on the same orders rate:
      // the beta-binomial prior fitted over customers
      graft.operators.Eval.shrunkenRate(
        tbl(s, dir, "orders"), "o_custkey",
        col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"), col("n_obs"), col("n_success"),
          round(col("rate"), 6).as("rate"),
          round(col("shrunk_rate"), 6).as("shrunk_rate"))
        .orderBy("o_custkey")
    }),

    "q393_urgent_wilson" -> ((s, dir) => {
      // q347's Wilson smoothing on the orders shape: per-customer
      // urgent-order propensity that a 1/1 fluke cannot dominate
      graft.operators.Eval.wilsonRate(
        tbl(s, dir, "orders"), "o_custkey",
        col("o_orderpriority") === "1-URGENT", z = 1.96)
        .select(col("o_custkey"), col("n_obs"), col("n_success"),
          round(col("rate"), 6).as("rate"),
          roundSignedZero(col("wilson_lb"), 6).as("wilson_lb"))
        .orderBy("o_custkey")
    }),

    "q389_walk_forward_orders" -> ((s, dir) => {
      // q338's expanding-window CV on the orders timeline, one-day
      // gap purge
      graft.temporal.Splits.walkForward(
        tbl(s, dir, "orders"), "o_orderdate", k = 3,
        gapSeconds = 86400L)
        .select(col("o_orderkey"), col("block"),
          col("role_f1"), col("role_f2"), col("role_f3"))
        .orderBy("o_orderkey")
    }),

    "q379_peak_slot" -> ((s, dir) => {
      // the modal weekday×hour cell per user: 168-slot integer
      // grid, the q320 max-encode, ties to the smaller slot
      graft.operators.Behavior.peakSlot(
        tbl(s, dir, "events"), "user_id", "ts")
        .select(col("user_id"), col("n_events"), col("peak_slot"),
          round(col("peak_share"), 6).as("peak_share"))
        .orderBy("user_id")
    }),

    "q378_naive_skill" -> ((s, dir) => {
      // does weekly seasonality beat persistence: exact SAE of the
      // lag-7 vs lag-1 naive on the dense grid over the SAME
      // comparable days, skill = 1 − sae7/sae1
      val dense = graft.operators.Behavior.denseDailyCounts(
        tbl(s, dir, "events"), "user_id", "ts")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day").asc)
      dense
        .withColumn("__p7", lag(col("n_events"), 7).over(w))
        .withColumn("__p1", lag(col("n_events"), 1).over(w))
        .filter(col("__p7").isNotNull && col("__p1").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("n_events") - col("__p7"))).as("sae7"),
          sum(abs(col("n_events") - col("__p1"))).as("sae1"))
        .select(col("user_id"), col("n_days"), col("sae7"),
          col("sae1"),
          round(when(col("sae1") > 0,
            lit(1.0) - col("sae7").cast("double") /
              col("sae1").cast("double")), 6).as("skill"))
        .orderBy("user_id")
    }),

    "q377_account_health" -> ((s, dir) => {
      // the account-health table a churn model trains on: q363's
      // temperament profile + q376's engagement slope + q375's
      // alarm recency, one entity join spine — the composed plan
      // must agree with all three proven oracles
      val profile = profileReadout(
        graft.operators.Behavior.profileMatrix(
          tbl(s, dir, "events"), "user_id", "ts", "event_type",
          tieBreak = Seq("event_id")))
      val trend = queries("q376_engagement_trend")(s, dir)
        .select(col("user_id"),
          col("slope_per_week"), col("r2"))
      val alarms = queries("q375_alarm_recency")(s, dir)
      profile.join(trend, Seq("user_id"))
        .join(alarms, Seq("user_id"))
        .orderBy("user_id")
    }),

    "q376_engagement_trend" -> ((s, dir) => {
      // is this user's engagement growing: q278's exact OLS
      // machinery over WEEKLY session counts (q39's gap sessions →
      // integer week grid → counts), slope read out per week
      val sess = WindowOps.sessionStats(
        tbl(s, dir, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull),
        "user_id", "ts", gapSeconds = 1800L)
      val weekly = sess
        .groupBy(col("user_id"),
          expr("unix_micros(cast(started_at as timestamp)) div " +
            "604800000000").as("__week"))
        .agg(count(lit(1)).as("__n"))
        .select(col("user_id"),
          timestamp_micros(col("__week") * 604800000000L)
            .as("__ts"),
          col("__n").cast("double").as("__v"))
      WindowOps.trendFit(weekly, "user_id", "__ts", "__v")
        .select(col("user_id"), col("n_obs"),
          round(col("trend_slope") * 604800d, 6)
            .as("slope_per_week"),
          round(col("r2"), 6).as("r2"))
        .orderBy("user_id")
    }),

    "q375_alarm_recency" -> ((s, dir) => {
      // regime-change monitoring rollup COMPOSED on q185's proven
      // CUSUM scan: per user, how many alarms ever fired and how
      // stale the last one is at the user's final event — exact
      // integer micros
      val c = graft.temporal.Sequential.cusum(
        tbl(s, dir, "events"), "user_id", "ts", "event_id",
        "value", target = 35.0, slack = 10.0, threshold = 1000.0)
        .select(col("event_id"), col("alarm"))
      tbl(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("__us"))
        .join(c, Seq("event_id"))
        .groupBy(col("user_id"))
        .agg(count(when(col("alarm"), lit(1))).as("n_alarms"),
          max(when(col("alarm"), col("__us"))).as("__last_alarm"),
          max(col("__us")).as("__last_event"))
        .select(col("user_id"), col("n_alarms"),
          (col("__last_event") - col("__last_alarm"))
            .as("us_since_last_alarm"))
        .orderBy("user_id")
    }),

    "q374_daily_dispersion" -> ((s, dir) => {
      // the intermittency profile on q369's dense grid: silent-day
      // share and the Fano factor (var/mean of daily counts —
      // ~1 Poisson, >1 bursty, <1 clockwork); exact integer
      // Σn/Σn², one double chain
      graft.operators.Behavior.denseDailyCounts(
        tbl(s, dir, "events"), "user_id", "ts")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_days"),
          count(when(col("n_events") > 0, lit(1))).as("n_active"),
          sum(col("n_events")).as("__s1"),
          sum((col("n_events").cast("decimal(19,0)") *
            col("n_events").cast("decimal(19,0)"))
            .cast("decimal(38,0)")).as("__s2"))
        .select(col("user_id"), col("n_days"), col("n_active"),
          round((col("n_days") - col("n_active")).cast("double") /
            col("n_days").cast("double"), 6).as("silent_share"),
          round(col("__s1").cast("double") /
            col("n_days").cast("double"), 6).as("mean_daily"),
          round(when(col("__s1") > 0,
            (col("__s2").cast("double") /
              col("n_days").cast("double") -
              (col("__s1").cast("double") /
                col("n_days").cast("double")) *
              (col("__s1").cast("double") /
                col("n_days").cast("double"))) /
              (col("__s1").cast("double") /
                col("n_days").cast("double"))), 6).as("fano"))
        .orderBy("user_id")
    }),

    "q373_weekly_rhythm" -> ((s, dir) => {
      // how weekly IS this user: lag-7 autocorrelation of the
      // DENSE daily counts (q369's grid — on the sparse frame
      // "lag 7" would mean 7 active days, not 7 calendar days),
      // through q288's exact moment machinery
      val dense = graft.operators.Behavior.denseDailyCounts(
        tbl(s, dir, "events"), "user_id", "ts")
        .withColumn("__ts",
          timestamp_micros(col("day") * 86400000000L))
        .withColumn("__v", col("n_events").cast("double"))
      WindowOps.lagAutocorr(dense, "user_id", "__ts", "__v",
        lags = Seq(7), tieBreak = Seq("day"))
        .select(col("user_id"), col("lag"), col("n_pairs"),
          round(col("acf"), 6).as("acf"))
        .orderBy("user_id")
    }),

    "q372_expanding_orders" -> ((s, dir) => {
      // q355's PIT count features on the orders shape: how many
      // urgent / high-priority orders had this customer placed
      // strictly before this one
      WindowOps.expandingTypeCounts(tbl(s, dir, "orders"),
        "o_custkey", "o_orderdate", "o_orderpriority",
        Seq("1-URGENT", "2-HIGH"), tieBreak = Seq("o_orderkey"))
        .select(col("o_orderkey"), col("prior_n_1_urgent"),
          col("prior_n_2_high"), col("prior_n_total"))
        .orderBy("o_orderkey")
    }),

    "q371_weekday_activity" -> ((s, dir) => {
      // which weekdays is this user alive: active-day RATE per
      // weekday over the dense span (silent days in the
      // denominator — the sparse groupBy can't see them). Weekday
      // = pure integer (day + 4) % 7 on both engines, no calendar
      // functions
      graft.operators.Behavior.denseDailyCounts(
        tbl(s, dir, "events"), "user_id", "ts")
        .groupBy(col("user_id"),
          ((col("day") + 4) % 7).as("dow"))
        .agg(count(lit(1)).as("n_days"),
          count(when(col("n_events") > 0, lit(1))).as("n_active"))
        .select(col("user_id"), col("dow"), col("n_days"),
          col("n_active"),
          round(col("n_active").cast("double") /
            col("n_days").cast("double"), 6).as("active_rate"))
        .orderBy("user_id", "dow")
    }),

    "q370_seasonal_naive" -> ((s, dir) => {
      // the forecasting baseline every model must beat, COMPOSED on
      // q369's dense grid (lag-7 is only week-over-week because the
      // silent days are materialized): per-user exact sum of
      // |count − count 7 days earlier| and its MAE
      val dense = graft.operators.Behavior.denseDailyCounts(
        tbl(s, dir, "events"), "user_id", "ts")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day").asc)
      dense
        .withColumn("__pred", lag(col("n_events"), 7).over(w))
        .filter(col("__pred").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("n_events") - col("__pred"))).as("sae"))
        .select(col("user_id"), col("n_days"), col("sae"),
          round(col("sae").cast("double") /
            col("n_days").cast("double"), 6).as("mae"))
        .orderBy("user_id")
    }),

    "q369_dense_daily" -> ((s, dir) => {
      // the zero-filled forecasting calendar: every day in each
      // user's span, exact counts, silent days included
      graft.operators.Behavior.denseDailyCounts(
        tbl(s, dir, "events"), "user_id", "ts")
        .orderBy("user_id", "day")
    }),

    "q362_assisted_conversion" -> ((s, dir) => {
      // marketing attribution readout COMPOSED from the proven
      // q285 recency op: a purchase is "assisted" when a click
      // happened within the prior 30 minutes — exact counts, one
      // division
      WindowOps.recencyByType(tbl(s, dir, "events"), "user_id",
        "ts", "event_type", Seq("click"), tieBreak = Seq("event_id"))
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          count(when(col("us_since_click") <= 1800000000L, lit(1)))
            .as("n_assisted"))
        .select(col("user_id"), col("n_purchases"),
          col("n_assisted"),
          round(col("n_assisted").cast("double") /
            col("n_purchases").cast("double"), 6)
            .as("assisted_rate"))
        .orderBy("user_id")
    }),

    "q361_retention_curve" -> ((s, dir) => {
      // the launch-review numbers: day-1/2/3/7 retention off the
      // exact integer day grid, one membership rollup
      graft.operators.Behavior.retentionCurve(
        tbl(s, dir, "events"), "user_id", "ts", Seq(1, 2, 3, 7))
        .select(col("offset_days"), col("n_cohort"),
          col("n_retained"),
          round(col("retention_rate"), 6).as("retention_rate"))
        .orderBy("offset_days")
    }),

    "q358_dwell_shares" -> ((s, dir) => {
      // where the TIME went: duration-weighted type mix off exact
      // decimal dwell sums; raw /1e6 total (pure-division chain)
      WindowOps.dwellShares(tbl(s, dir, "events"), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"),
        tieBreak = Seq("event_id"))
        .select(col("user_id"),
          round(col("dwell_share_view"), 6).as("dwell_share_view"),
          round(col("dwell_share_click"), 6)
            .as("dwell_share_click"),
          round(col("dwell_share_purchase"), 6)
            .as("dwell_share_purchase"),
          round(col("dwell_share_other"), 6)
            .as("dwell_share_other"),
          col("total_dwell_s"))
        .orderBy("user_id")
    }),

    "q357_expanding_distinct" -> ((s, dir) => {
      // PIT-safe repertoire breadth: distinct types seen strictly
      // before, first-of-type flags + one running sum on ONE
      // entity exchange
      WindowOps.expandingDistinctTypes(tbl(s, dir, "events"),
        "user_id", "ts", "event_type", tieBreak = Seq("event_id"))
        .select(col("event_id"), col("prior_n_types"))
        .orderBy("event_id")
    }),

    "q355_expanding_counts" -> ((s, dir) => {
      // PIT-safe count features: strictly-prior per-type counters
      // on one shared (ts, event_id) sort — an event never counts
      // itself
      WindowOps.expandingTypeCounts(tbl(s, dir, "events"),
        "user_id", "ts", "event_type",
        Seq("view", "click", "purchase", "error"),
        tieBreak = Seq("event_id"))
        .select(col("event_id"), col("prior_n_view"),
          col("prior_n_click"), col("prior_n_purchase"),
          col("prior_n_error"), col("prior_n_total"))
        .orderBy("event_id")
    }),

    "q354_type_pivot" -> ((s, dir) => {
      // fixed-width behavioral count vector: exact conditional
      // counts, one rollup
      graft.operators.Behavior.typePivot(
        tbl(s, dir, "events"), "user_id", "event_type",
        Seq("view", "click", "purchase", "error"))
        .orderBy("user_id")
    }),

    "q351_funnel_report" -> ((s, dir) => {
      // q261's funnel rolled to the dashboard grain: exact reach
      // counts, conversion from step 1, exact-decimal mean latency
      graft.operators.Behavior.funnelReport(
        tbl(s, dir, "events"), "user_id", "ts", "event_type",
        steps = Seq("view", "click", "purchase"),
        horizonSeconds = 3L * 86400L)
        .select(col("step_idx"), col("step_name"), col("n_reached"),
          round(col("conv_from_first"), 6).as("conv_from_first"),
          round(col("conv_from_prev"), 6).as("conv_from_prev"),
          round(col("mean_latency_s"), 6).as("mean_latency_s"))
        .orderBy("step_idx")
    }),

    "q350_null_patterns" -> ((s, dir) => {
      // which columns go missing TOGETHER: exact per-mask counts,
      // <= 2^3 rows out of any input size. Deterministic null
      // planting (every 7th value, every 11th type — co-missing at
      // multiples of 77) exercises the mask combinations the clean
      // synthetic table lacks
      val planted = tbl(s, dir, "events")
        .withColumn("value",
          when(col("event_id") % 7 === 0, lit(null))
            .otherwise(col("value")))
        .withColumn("event_type",
          when(col("event_id") % 11 === 0, lit(null))
            .otherwise(col("event_type")))
      graft.operators.Profile.nullPatterns(planted,
        Seq("user_id", "event_type", "value"))
        .orderBy("mask")
    }),

    "q349_session_paths" -> ((s, dir) => {
      // empirical user journeys: ordered type sequence per gap
      // session, exact counts, top-20 with deterministic ties
      graft.operators.Behavior.sessionPaths(
        tbl(s, dir, "events"), "user_id", "ts", "event_type",
        gapSeconds = 1800L, k = 20)
    }),

    "q348_shrunken_rate" -> ((s, dir) => {
      // empirical-Bayes purchase rate: micro-exact beta-binomial
      // moment fit (bounded 3-register collect), one shrink chain
      graft.operators.Eval.shrunkenRate(
        tbl(s, dir, "events"), "user_id",
        col("event_type") === "purchase")
        .select(col("user_id"), col("n_obs"), col("n_success"),
          round(col("rate"), 6).as("rate"),
          round(col("shrunk_rate"), 6).as("shrunk_rate"))
        .orderBy("user_id")
    }),

    "q347_wilson_ctr" -> ((s, dir) => {
      // smoothed per-user purchase rate: exact (n, k) rollup, one
      // fixed-operand Wilson chain with the z literal shared
      // between engines
      graft.operators.Eval.wilsonRate(
        tbl(s, dir, "events"), "user_id",
        col("event_type") === "purchase", z = 1.96)
        .select(col("user_id"), col("n_obs"), col("n_success"),
          round(col("rate"), 6).as("rate"),
          round(col("wilson_lb"), 6).as("wilson_lb"))
        .orderBy("user_id")
    }),

    "q343_corr_matrix" -> ((s, dir) => {
      // the whole feature-screening matrix in ONE scan: C(3,2)
      // exact-moment Pearson pairs as registers of a single global
      // rollup, restacked to rows
      graft.operators.GroupOps.correlationMatrix(
        tbl(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
        .select(col("col_a"), col("col_b"), col("n_pairs"),
          round(col("corr"), 6).as("corr"))
        .orderBy("col_a", "col_b")
    }),

    "q341_dow_vector" -> ((s, dir) => {
      // weekly circular profile: 7 count registers, shared-literal
      // trig weights, one rollup — the weekly-ritual detector
      graft.operators.Behavior.dowVector(
        tbl(s, dir, "events"), "user_id", "ts")
        .select(col("user_id"), col("n_events"), col("peak_dow"),
          round(col("peak_share"), 6).as("peak_share"),
          round(col("dow_r"), 6).as("dow_r"),
          round(col("mean_dow"), 6).as("mean_dow"))
        .orderBy("user_id")
    }),

    "q340_gap_surprise_orders" -> ((s, dir) => {
      // q332's PIT gap anomaly over the orders table: how unusual
      // is this customer's ordering silence — date-grain gaps,
      // the same expanding exact mean
      WindowOps.gapSurprise(tbl(s, dir, "orders"), "o_custkey",
        "o_orderdate", tieBreak = Seq("o_orderkey"))
        .select(col("o_orderkey"), col("gap_us"),
          col("n_prior_gaps"),
          (col("mean_prior_gap_us") / 1e6).as("mean_prior_gap_s"),
          col("gap_surprise"))
        .orderBy("o_orderkey")
    }),

    "q338_walk_forward" -> ((s, dir) => {
      // expanding-window temporal CV: 4 equal micro-exact time
      // blocks, per-fold train/purged/test/future roles as one
      // codegen'd projection after a single min/max agg
      graft.temporal.Splits.walkForward(
        tbl(s, dir, "events"), "ts", k = 3, gapSeconds = 3600L)
        .select(col("event_id"), col("block"),
          col("role_f1"), col("role_f2"), col("role_f3"))
        .orderBy("event_id")
    }),

    "q337_priority_entropy" -> ((s, dir) => {
      // q333's predictability operator over the orders table:
      // conditional entropy of the customer's priority sequence
      graft.operators.Behavior.transitionEntropy(
        tbl(s, dir, "orders"), "o_custkey", "o_orderdate",
        "o_orderpriority", tieBreak = Seq("o_orderkey"))
        .select(col("o_custkey"), col("n_bigrams"), col("n_pairs"),
          col("n_cur_types"),
          round(col("cond_entropy"), 6).as("cond_entropy"),
          round(col("norm_cond"), 6).as("norm_cond"))
        .orderBy("o_custkey")
    }),

    "q335_training_v2" -> ((s, dir) => {
      // training-table assembly from THREE already-proven ops
      // stacked on one shared (user) exchange: PIT-safe session
      // position + gap surprise features, plus the forward
      // time-to-next-purchase label — the composed plan must agree
      // with each op's own oracle column for column
      val base = tbl(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
      val f = WindowOps.timeToNextType(
        WindowOps.gapSurprise(
          WindowOps.sessionPosition(base, "user_id", "ts",
            gapSeconds = 1800L, tieBreak = Seq("event_id")),
          "user_id", "ts", tieBreak = Seq("event_id")),
        "user_id", "ts", "event_type", Seq("purchase"),
        tieBreak = Seq("event_id"))
      f.select(col("event_id"), col("session_event_seq"),
          col("us_into_session"), col("gap_us"),
          col("n_prior_gaps"),
          (col("mean_prior_gap_us") / 1e6).as("mean_prior_gap_s"),
          col("gap_surprise"), col("us_until_purchase"))
        .orderBy("event_id")
    }),

    "q333_transition_entropy" -> ((s, dir) => {
      // behavioral predictability: exact conditional entropy of the
      // (prev -> cur) bigram grid per user — two typeMix-style
      // rearranged entropies, one difference
      graft.operators.Behavior.transitionEntropy(
        tbl(s, dir, "events"), "user_id", "ts", "event_type",
        tieBreak = Seq("event_id"))
        .select(col("user_id"), col("n_bigrams"), col("n_pairs"),
          col("n_cur_types"),
          round(col("cond_entropy"), 6).as("cond_entropy"),
          round(col("norm_cond"), 6).as("norm_cond"))
        .orderBy("user_id")
    }),

    "q332_gap_surprise" -> ((s, dir) => {
      // PIT-safe per-event gap anomaly: the gap over the expanding
      // exact mean of strictly prior gaps — one window pair on the
      // shared (ts, event_id) sort
      WindowOps.gapSurprise(tbl(s, dir, "events"), "user_id", "ts",
        tieBreak = Seq("event_id"))
        .select(col("event_id"), col("gap_us"), col("n_prior_gaps"),
          // RAW doubles: the whole chain is +-*/ on exact integers,
          // bit-identical cross-engine — ROUND here would be the
          // only divergence (half-way boundaries render differently)
          (col("mean_prior_gap_us") / 1e6).as("mean_prior_gap_s"),
          col("gap_surprise"))
        .orderBy("event_id")
    }),

    "q331_gap_entropy_orders" -> ((s, dir) => {
      // q328's regularity operator over the TPC-H orders table —
      // generality on a second (entity, ts) shape, date-grain gaps
      graft.operators.Behavior.gapEntropy(
        tbl(s, dir, "orders"), "o_custkey", "o_orderdate")
        .select(col("o_custkey"), col("n_gaps"), col("n_buckets"),
          round(col("bucket_entropy"), 6).as("bucket_entropy"),
          round(col("norm_entropy"), 6).as("norm_entropy"))
        .orderBy("o_custkey")
    }),

    "q330_hour_vector" -> ((s, dir) => {
      // circular hour-of-day profile: exact 24-register counts,
      // shared-literal trig weights, one rollup
      graft.operators.Behavior.hourVector(
        tbl(s, dir, "events"), "user_id", "ts")
        .select(col("user_id"), col("n_events"), col("peak_hour"),
          round(col("peak_share"), 6).as("peak_share"),
          round(col("hour_r"), 6).as("hour_r"),
          round(col("mean_hour"), 6).as("mean_hour"))
        .orderBy("user_id")
    }),

    "q329_session_jaccard" -> ((s, dir) => {
      // behavioral drift at session grain: Jaccard of consecutive
      // sessions' distinct type sets — integer set sizes, one
      // division; first sessions absent
      graft.operators.Behavior.sessionTypeJaccard(
        tbl(s, dir, "events"), "user_id", "ts", "event_type",
        gapSeconds = 1800L)
        .select(col("user_id"), col("session_id"),
          col("n_prev_types"), col("n_cur_types"), col("n_common"),
          round(col("type_jaccard"), 6).as("type_jaccard"))
        .orderBy("user_id", "session_id")
    }),

    "q328_gap_entropy" -> ((s, dir) => {
      // cadence regularity: Shannon entropy over q320's log2 gap
      // buckets — the same exact one-pass rearrangement as q290's
      // type entropy, plus the [0,1] normalized readout
      graft.operators.Behavior.gapEntropy(
        tbl(s, dir, "events"), "user_id", "ts")
        .select(col("user_id"), col("n_gaps"), col("n_buckets"),
          round(col("bucket_entropy"), 6).as("bucket_entropy"),
          round(col("norm_entropy"), 6).as("norm_entropy"))
        .orderBy("user_id")
    }),

    "q327_time_to_next_type" -> ((s, dir) => {
      // q285's forward mirror as a LABEL op: exact integer micros
      // until the user's next purchase / click / error, strictly
      // later so an event never reads itself
      WindowOps.timeToNextType(tbl(s, dir, "events"), "user_id",
        "ts", "event_type", Seq("purchase", "click", "error"),
        tieBreak = Seq("event_id"))
        .select(col("event_id"), col("us_until_purchase"),
          col("us_until_click"), col("us_until_error"))
        .orderBy("event_id")
    }),

    "q326_bounce_by_hour" -> ((s, dir) => {
      // when do visits fail: per-start-hour bounce decomposition
      // over the q39 gap sessions — exact counts, one division
      graft.operators.Behavior.bounceByHour(
        tbl(s, dir, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull),
        "user_id", "ts", gapSeconds = 1800L)
        .select(col("start_hour"), col("n_sessions"),
          col("n_bounces"),
          round(col("bounce_rate"), 6).as("bounce_rate"))
        .orderBy("start_hour")
    }),

    "q325_transition_latency" -> ((s, dir) => {
      // step-timing matrix per ordered type pair: exact decimal
      // Σdt, integer min/max, one division at readout
      graft.operators.Behavior.transitionLatency(
        tbl(s, dir, "events"), "user_id", "ts", "event_type",
        tieBreak = Seq("event_id"))
        .select(col("prev_type"), col("cur_type"), col("n_steps"),
          round(col("mean_gap_s"), 6).as("mean_gap_s"),
          col("min_gap_us"), col("max_gap_us"))
        .orderBy("prev_type", "cur_type")
    }),

    "q324_seasonal_z" -> ((s, dir) => {
      // standardized weekday deviation per event: exact (user, dow)
      // cell moments, the same (m - mu)/sigma chain on both engines
      graft.operators.Behavior.seasonalZ(
        tbl(s, dir, "events"), "user_id", "ts", "value")
        .select(col("event_id"),
          round(col("value_dow_z"), 6).as("value_dow_z"))
        .orderBy("event_id")
    }),

    "q323_gap_quantiles" -> ((s, dir) => {
      // robust cadence: exact np.interp median/p90 of per-user gaps
      // via the distributed weighted-CDF (q87's machinery on a
      // derived temporal frame), read out in seconds
      graft.operators.Behavior.gapQuantiles(
        tbl(s, dir, "events"), "user_id", "ts", Seq(0.5, 0.9))
        .select(col("user_id"),
          round(col("gap_p50_s"), 6).as("gap_p50_s"),
          round(col("gap_p90_s"), 6).as("gap_p90_s"))
        .orderBy("user_id")
    }),

    "q322_session_gap_label" -> ((s, dir) => {
      // session-grain churn target: exact micros from session end
      // to the next session's start over the q39 gap rule
      graft.operators.Behavior.sessionNextGap(
        tbl(s, dir, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull),
        "user_id", "ts", gapSeconds = 1800L)
        .orderBy("user_id", "session_id")
    }),

    "q321_priority_mix" -> ((s, dir) => {
      // q290's typeMix operator over the orders table: action
      // diversity of o_orderpriority per customer
      graft.operators.Behavior.typeMix(
        tbl(s, dir, "orders"), "o_custkey", "o_orderpriority")
        .select(col("o_custkey"), col("n_events"), col("n_types"),
          round(col("type_entropy"), 6).as("type_entropy"),
          col("top_type"),
          round(col("top_share"), 6).as("top_share"))
        .orderBy("o_custkey")
    }),

    "q320_gap_cadence" -> ((s, dir) => {
      // preferred cadence per user: log2 gap-mode bucket via the
      // monotone integer encoding — smallest bucket on ties, zero
      // gaps in bucket -1, pure integer decode on both engines
      graft.operators.Behavior.gapCadence(
        tbl(s, dir, "events"), "user_id", "ts")
        .select(col("user_id"), col("n_gaps"), col("gap_bucket"),
          round(col("mode_share"), 6).as("mode_share"))
        .orderBy("user_id")
    }),

    "q319_gap_orders" -> ((s, dir) => {
      // q279's burstiness operator over the TPC-H orders table —
      // operator generality on a second (entity, ts) shape
      graft.operators.Behavior.interArrivalStats(
        tbl(s, dir, "orders"), "o_custkey", "o_orderdate")
        .select(col("o_custkey"), col("n_gaps"),
          round(col("mean_gap_s"), 6).as("mean_gap_s"),
          round(col("std_gap_s"), 6).as("std_gap_s"),
          round(col("cv_gap"), 6).as("cv_gap"),
          round(col("burstiness"), 6).as("burstiness"))
        .orderBy("o_custkey")
    }),

    "q316_pacf2" -> ((s, dir) => {
      // partial autocorrelation at lag 2 per user: the
      // Durbin-Levinson combination of q288's exact unrounded ACF
      // chains, one more double expression both engines replay
      WindowOps.pacf2(tbl(s, dir, "events"), "user_id", "ts",
        "value", tieBreak = Seq("event_id"))
        .select(col("user_id"), col("n_pairs2"),
          round(col("acf1"), 6).as("acf1"),
          round(col("acf2"), 6).as("acf2"),
          round(col("pacf2"), 6).as("pacf2"))
        .orderBy("user_id")
    }),

    "q315_type_novelty" -> ((s, dir) => {
      // per-event action novelty: n-th occurrence of this type for
      // this user + exact micros since the habit began — PIT-safe
      // running windows, pure integer math
      WindowOps.typeNovelty(tbl(s, dir, "events"), "user_id", "ts",
        "event_type", tieBreak = Seq("event_id"))
        .select(col("event_id"), col("type_ordinal"),
          col("us_since_first_of_type"))
        .orderBy("event_id")
    }),

    "q314_profile_neighbors" -> ((s, dir) => {
      // schedule look-alikes: top-3 cosine neighbors over hour
      // histograms via the inverted-index pair join — exact integer
      // dot/norms, the same sqrt chain and (cos DESC, id ASC) rank
      graft.operators.Behavior.profileNeighbors(
        tbl(s, dir, "events"), "user_id", "ts", k = 3)
        .select(col("user_id"), col("rank"), col("neighbor"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("user_id", "rank")
    }),

    "q312_loo_seasonal" -> ((s, dir) => {
      // encoding-safe seasonal residual: the weekday mean excludes
      // the row's own value — exact (s_d - v)/(n_d - 1) integers,
      // the same double chain on both engines
      graft.operators.Behavior.looSeasonalResidual(
        tbl(s, dir, "events"), "user_id", "ts", "value")
        .select(col("event_id"),
          round(col("dow_mean_loo"), 6).as("dow_mean_loo"),
          round(col("value_loo_resid"), 6).as("value_loo_resid"))
        .orderBy("event_id")
    }),

    "q311_seasonal_residual" -> ((s, dir) => {
      // de-seasonalized per-event anomaly: value minus the user's
      // exact weekday mean, one double subtraction replayed by the
      // oracle over the same (user, dow) micro-sum chain
      graft.operators.Behavior.seasonalResidual(
        tbl(s, dir, "events"), "user_id", "ts", "value")
        .select(col("event_id"),
          round(col("dow_mean"), 6).as("dow_mean"),
          round(col("value_dow_resid"), 6).as("value_dow_resid"))
        .orderBy("event_id")
    }),

    "q309_growth_accounting" -> ((s, dir) => {
      // daily new/returning/resurrected ledger over the distinct
      // (user, day) frame — dau decomposes exactly by construction
      graft.operators.Behavior.growthAccounting(
        tbl(s, dir, "events"), "user_id", "ts",
        resurrectGapDays = 30)
        .orderBy("day")
    }),

    "q308_corr_by_group" -> ((s, dir) => {
      // per-type exact Pearson + OLS beta of value vs hour-of-day:
      // six exact micro moments, the same sqrt chain as q288
      graft.operators.GroupOps.corrByGroup(
        tbl(s, dir, "events")
          .withColumn("hh",
            hour(col("ts").cast("timestamp")).cast("double")),
        "event_type", "value", "hh")
        .select(col("event_type"), col("n_pairs"),
          round(col("corr"), 6).as("corr"),
          round(col("beta_yx"), 6).as("beta_yx"))
        .orderBy("event_type")
    }),

    "q307_brier" -> ((s, dir) => {
      // per-type Brier + climatology skill for a value-derived
      // probability: exact integer micro deviations, chains
      // replayed verbatim (value/500 as the toy calibration)
      graft.operators.Eval.brierByGroup(
        tbl(s, dir, "events")
          .withColumn("p", col("value") / lit(500.0))
          .withColumn("y", (col("event_id") % 3 === 0).cast("int")),
        "event_type", "p", "y")
        .select(col("event_type"), col("n"),
          round(col("base_rate"), 6).as("base_rate"),
          round(col("brier"), 6).as("brier"),
          round(col("brier_ref"), 6).as("brier_ref"),
          round(col("brier_skill"), 6).as("brier_skill"))
        .orderBy("event_type")
    }),

    "q306_gains_table" -> ((s, dir) => {
      // decile gains/lift scorecard for "value ranks purchases":
      // two-phase global rank (no single-partition window), exact
      // NTILE replica vs DuckDB's literal NTILE, bounded 10-row
      // driver fold for the running totals
      graft.operators.Eval.gainsTable(
        tbl(s, dir, "events").withColumn("is_purchase",
          (col("event_type") === "purchase").cast("int")),
        "value", "is_purchase", "event_id", nBins = 10)
        .select(col("bin"), col("n"), col("n_pos"),
          round(col("pos_rate"), 6).as("pos_rate"),
          col("cum_n"), col("cum_pos"),
          round(col("capture_rate"), 6).as("capture_rate"),
          round(col("cum_lift"), 6).as("cum_lift"))
        .orderBy("bin")
    }),

    "q305_inequality" -> ((s, dir) => {
      // value-mass inequality per user: exact rank-form Gini and
      // top-decile whale share, tie-order-invariant by construction
      graft.operators.GroupOps.inequalityStats(
        tbl(s, dir, "events"), "user_id", "value")
        .select(col("user_id"), col("n_obs"),
          round(col("gini"), 6).as("gini"),
          round(col("top_decile_share"), 6).as("top_decile_share"))
        .orderBy("user_id")
    }),

    "q304_bucketed_matrix" -> ((s, dir) => {
      // the SAME feature matrix over a user_id-bucketed copy of the
      // event log: the bucketed scan's reported hashpartitioning
      // satisfies every window, so the plan has ZERO exchanges
      // (spec-pinned) — at 100 TB the difference between one
      // full-log shuffle per backfill and none. Values must be
      // bit-identical: literally q303's composite oracle.
      graft.io.BucketedTable.write(tbl(s, dir, "events"),
        "q304_events_bucketed", "user_id", 16)
      WindowOps.featureMatrix(
        graft.io.BucketedTable.read(s, "q304_events_bucketed"),
        "user_id", "ts", "value", "event_type",
        types = Seq("purchase", "click", "error"),
        gapSeconds = 1800L, tieBreak = Seq("event_id"))
        .select(col("event_id"), col("session_event_seq"),
          col("us_into_session"), col("us_since_purchase"),
          col("us_since_click"), col("us_since_error"),
          col("value_dir"), col("value_dir_run"),
          round(col("value_trend") * 86400d, 6)
            .as("trend_per_day"))
        .orderBy("event_id")
    }),

    "q303_feature_matrix" -> ((s, dir) => {
      // the composed serve-time block: session position + per-type
      // recency + momentum + expanding trend in ONE plan on ONE
      // exchange; the oracle is literally the four per-op oracles
      // joined on event_id
      WindowOps.featureMatrix(tbl(s, dir, "events"), "user_id",
        "ts", "value", "event_type",
        types = Seq("purchase", "click", "error"),
        gapSeconds = 1800L, tieBreak = Seq("event_id"))
        .select(col("event_id"), col("session_event_seq"),
          col("us_into_session"), col("us_since_purchase"),
          col("us_since_click"), col("us_since_error"),
          col("value_dir"), col("value_dir_run"),
          round(col("value_trend") * 86400d, 6)
            .as("trend_per_day"))
        .orderBy("event_id")
    }),

    "q302_activation_profile" -> ((s, dir) => {
      // onboarding-vs-retention split per user: strict integer
      // first-window comparison, exact share, integer lifetime days
      graft.operators.Behavior.activationProfile(
        tbl(s, dir, "events"), "user_id", "ts", windowDays = 7)
        .select(col("user_id"), col("n_total"),
          col("n_first_window"),
          round(col("first_window_share"), 6)
            .as("first_window_share"),
          col("lifetime_days"))
        .orderBy("user_id")
    }),

    "q301_value_hhi" -> ((s, dir) => {
      // wallet-share concentration per user: exact cross-multiplied
      // HHI and top share over (user, type) micro sums
      graft.operators.Behavior.valueConcentration(
        tbl(s, dir, "events"), "user_id", "event_type", "value")
        .select(col("user_id"), col("n_types"),
          round(col("hhi"), 6).as("hhi"),
          round(col("top_share"), 6).as("top_share"))
        .orderBy("user_id")
    }),

    "q299_expanding_trend" -> ((s, dir) => {
      // PIT-safe running OLS slope per event: entity-first-instant
      // centering keeps the five expanding decimal moments exact,
      // one double division per row (surfaced per-day for round-6)
      WindowOps.expandingTrend(tbl(s, dir, "events"), "user_id",
        "ts", "value", tieBreak = Seq("event_id"))
        .select(col("event_id"),
          round(col("value_trend") * 86400d, 6)
            .as("trend_per_day"))
        .orderBy("event_id")
    }),

    "q294_session_profile" -> ((s, dir) => {
      // engagement shape per user over the q39 gap sessions:
      // bounce share, mean events, exact mean dwell (zero-length
      // bounces count) — integers until three double readouts
      graft.operators.Behavior.sessionProfile(
        tbl(s, dir, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull),
        "user_id", "ts", gapSeconds = 1800L)
        .select(col("user_id"), col("n_sessions"), col("n_events"),
          round(col("bounce_share"), 6).as("bounce_share"),
          round(col("mean_events"), 6).as("mean_events"),
          round(col("mean_duration_s"), 6).as("mean_duration_s"))
        .orderBy("user_id")
    }),

    "q293_volume_anomaly" -> ((s, dir) => {
      // PIT-safe daily volume z per event type: strictly-prior
      // expanding exact moments over the (type, day) counts, the
      // same sqrt/divide chain on both engines
      graft.operators.Behavior.volumeAnomaly(
        tbl(s, dir, "events"), "event_type", "ts")
        .select(col("event_type"), col("day"), col("n_events"),
          round(col("expected"), 6).as("expected"),
          round(col("vol_z"), 6).as("vol_z"))
        .orderBy("event_type", "day")
    }),

    "q292_monotone_run" -> ((s, dir) => {
      // per-event momentum: sign vs the prior observed reading and
      // the consecutive same-direction step count — integer signs
      // and window counts, identical carries on both engines
      WindowOps.monotoneRun(
        tbl(s, dir, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull),
        "user_id", "ts", "value", tieBreak = Seq("event_id"))
        .select(col("event_id"), col("value_dir"),
          col("value_dir_run"))
        .orderBy("event_id")
    }),

    "q291_sigma_outliers" -> ((s, dir) => {
      // per-user 3-sigma exceedance scorecard: exact decimal
      // moments, IEEE sqrt, and a deterministic micro-space
      // comparison — the same two-pass join shape as the oracle
      graft.operators.GroupOps.sigmaOutlierShare(
        tbl(s, dir, "events"), "user_id", "value")
        .select(col("user_id"), col("n_obs"),
          round(col("mean"), 6).as("mean"),
          round(col("std"), 6).as("std"),
          col("n_outliers"),
          round(col("outlier_share"), 6).as("outlier_share"))
        .orderBy("user_id")
    }),

    "q290_type_mix" -> ((s, dir) => {
      // action-diversity per user: exact entropy rearrangement over
      // the (user, type) counts + two-phase deterministic top type
      graft.operators.Behavior.typeMix(
        tbl(s, dir, "events"), "user_id", "event_type")
        .select(col("user_id"), col("n_events"), col("n_types"),
          round(col("type_entropy"), 6).as("type_entropy"),
          col("top_type"),
          round(col("top_share"), 6).as("top_share"))
        .orderBy("user_id")
    }),

    "q289_streak_stats" -> ((s, dir) => {
      // habit-strength summary per user: integer day-grid islands,
      // arg-max on the unique end day picks the current streak
      graft.operators.Behavior.streakStats(
        tbl(s, dir, "events"), "user_id", "ts")
        .orderBy("user_id")
    }),

    "q288_lag_autocorr" -> ((s, dir) => {
      // per-user lag-1/lag-7 row ACF: six exact decimal pair
      // moments per lag on one exchange, the num/(sqrt*sqrt)
      // chain replayed verbatim by the oracle
      WindowOps.lagAutocorr(tbl(s, dir, "events"), "user_id", "ts",
        "value", lags = Seq(1, 7), tieBreak = Seq("event_id"))
        .select(col("user_id"), col("lag"), col("n_pairs"),
          round(col("acf"), 6).as("acf"))
        .orderBy("user_id", "lag")
    }),

    "q287_dow_seasonal" -> ((s, dir) => {
      // weekly seasonal value index per user: exact (user, dow)
      // micro sums, entity rollup reduced from them, delta and
      // cross-multiplied ratio off one double chain each
      graft.operators.Behavior.dowSeasonalIndex(
        tbl(s, dir, "events"), "user_id", "ts", "value")
        .select(col("user_id"), col("dow"), col("n_d"),
          round(col("dow_mean"), 6).as("dow_mean"),
          round(col("dow_delta"), 6).as("dow_delta"),
          round(col("dow_index"), 6).as("dow_index"))
        .orderBy("user_id", "dow")
    }),

    "q286_weekpart_profile" -> ((s, dir) => {
      // weekday/weekend contrast per user: exact decimal micro sums
      // on the shared dayofweek grid, double divisions at readout
      WindowOps.weekpartProfile(tbl(s, dir, "events"), "user_id",
        "ts", "value")
        .select(col("user_id"), col("n_weekday"), col("n_weekend"),
          round(col("mean_weekday"), 6).as("mean_weekday"),
          round(col("mean_weekend"), 6).as("mean_weekend"),
          round(col("weekend_share"), 6).as("weekend_share"),
          round(col("weekend_contrast"), 6).as("weekend_contrast"))
        .orderBy("user_id")
    }),

    "q285_recency_by_type" -> ((s, dir) => {
      // strictly-prior per-type recency carries: integer micros
      // since the user's last purchase / click / error — the same
      // IGNORE NULLS window carries on both engines
      WindowOps.recencyByType(tbl(s, dir, "events"), "user_id",
        "ts", "event_type", Seq("purchase", "click", "error"),
        tieBreak = Seq("event_id"))
        .select(col("event_id"), col("us_since_purchase"),
          col("us_since_click"), col("us_since_error"))
        .orderBy("event_id")
    }),

    "q284_rolling_robust_z" -> ((s, dir) => {
      // trailing-5 robust z: exact interp median + MAD over the
      // sorted frame, zero-MAD refuses; the oracle replays the
      // identical list/sort/interp double chain via list lambdas
      WindowOps.rollingRobustZ(tbl(s, dir, "events"), "user_id",
        "ts", "value", k = 5, tieBreak = Seq("event_id"))
        .select(col("event_id"),
          round(col("value_rmed"), 6).as("value_rmed"),
          round(col("value_robust_z"), 6).as("value_robust_z"))
        .orderBy("event_id")
    }),

    "q283_session_position" -> ((s, dir) => {
      // PIT-safe in-session position: 1-based ordinal + exact
      // integer micros since session start over the q39 gap rule —
      // never the session's future (length/duration stay offline)
      WindowOps.sessionPosition(
        tbl(s, dir, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull),
        "user_id", "ts", gapSeconds = 1800L,
        tieBreak = Seq("event_id"))
        .select(col("event_id"), col("session_event_seq"),
          col("us_into_session"))
        .orderBy("event_id")
    }),

    "q282_hour_lift" -> ((s, dir) => {
      // per-(user, hour) personalization lift vs the corpus hour
      // histogram: exact cross-multiplied integer products, two
      // double divisions at readout replayed by the oracle
      graft.operators.Behavior.hourLift(
        tbl(s, dir, "events"), "user_id", "ts")
        .select(col("user_id"), col("hh"), col("n_eh"), col("n_e"),
          round(col("share"), 6).as("share"),
          round(col("lift"), 6).as("lift"))
        .orderBy("user_id", "hh")
    }),

    "q281_rank_normalize" -> ((s, dir) => {
      // within-user exact percentile rank of value: RANK among
      // non-null observations only, (rank-1)/(n-1) — integers to
      // one double division, ties split identically on both engines
      WindowOps.rankNormalize(tbl(s, dir, "events"), "user_id",
        "value")
        .select(col("event_id"),
          round(col("value_pct"), 6).as("value_pct"))
        .orderBy("event_id")
    }),

    "q280_day_streak" -> ((s, dir) => {
      // per-event running consecutive-active-day streak: exact
      // integer day grid (epoch_us div 86400e6), islands over the
      // small distinct-day frame, joined back — pure integer math
      graft.operators.Behavior.activeDayStreak(
        tbl(s, dir, "events"), "user_id", "ts")
        .select(col("event_id"), col("streak_days"))
        .orderBy("event_id")
    }),

    "q279_burstiness" -> ((s, dir) => {
      // inter-arrival gap moments per user: telescoped Σdt + exact
      // decimal Σdt², then the μ/σ/cv/Goh-Barabási-B double chain
      // replayed verbatim by the oracle (IEEE sqrt both sides)
      graft.operators.Behavior.interArrivalStats(
        tbl(s, dir, "events"), "user_id", "ts")
        .select(col("user_id"), col("n_gaps"),
          round(col("mean_gap_s"), 6).as("mean_gap_s"),
          round(col("std_gap_s"), 6).as("std_gap_s"),
          round(col("cv_gap"), 6).as("cv_gap"),
          round(col("burstiness"), 6).as("burstiness"))
        .orderBy("user_id")
    }),

    "q278_trend_fit" -> ((s, dir) => {
      // whole-history OLS trend per user: exact centered decimal
      // moments (Σt, Σt², Σtv, Σv², HUGEINT-replicable), one double
      // division chain at readout replayed verbatim by the oracle;
      // slope surfaced per-day so round-6 keeps real precision
      WindowOps.trendFit(tbl(s, dir, "events"), "user_id", "ts",
        "value")
        .select(col("user_id"), col("n_obs"),
          round(col("trend_slope") * 86400d, 6).as("slope_per_day"),
          round(col("trend_intercept"), 6).as("trend_intercept"),
          round(col("r2"), 6).as("r2"))
        .orderBy("user_id")
    }),

    "q277_rate_of_change" -> ((s, dir) => {
      // irregular-dt velocity/acceleration per user: difference
      // quotients against the nearest prior OBSERVED reading, null
      // rows carry nothing, zero dt refuses; fixed double chain
      // replayed by the oracle, round-6 readout
      WindowOps.rateOfChange(tbl(s, dir, "events"), "user_id", "ts",
        "value", tieBreak = Seq("event_id"))
        .select(col("event_id"),
          roundSignedZero(col("value_d1"), 6).as("value_d1"),
          roundSignedZero(col("value_d2"), 6).as("value_d2"))
        .orderBy("event_id")
    }),

    "q276_hazard_features" -> ((s, dir) => {
      // Poisson churn score per user: observed rate + memoryless
      // survival at the corpus anchor; singletons refuse (null),
      // never a 0/0 NaN; round-6 absorbs the exp() libm ulp
      graft.operators.Behavior.hazardFeatures(
        tbl(s, dir, "events"), "user_id", "ts")
        .select(col("user_id"), col("n_events"), col("span_us"),
          col("recency_us"),
          round(col("events_per_day"), 6).as("events_per_day"),
          round(col("p_active"), 6).as("p_active"))
        .orderBy("user_id")
    }),

    "q275_activity_profile" -> ((s, dir) => {
      // regularity features per user: hour histogram entropy (exact
      // one-pass rearrangement, round-6) + integer-encoded peak hour
      // whose tie rule is pure integer math on both engines
      graft.operators.Behavior.activityProfile(
        tbl(s, dir, "events"), "user_id", "ts")
        .select(col("user_id"), col("n_events"),
          col("n_active_hours"),
          round(col("hour_entropy"), 6).as("hour_entropy"),
          col("peak_hour"))
        .orderBy("user_id")
    }),

    "q273_attribution" -> ((s, dir) => {
      // first/last-touch attribution: each purchase reads the view/
      // click touches strictly before it in its own 30-min session;
      // organic purchases read nulls, never a cross-session credit
      graft.operators.Behavior.attribution(
        tbl(s, dir, "events"), "user_id", "ts", "event_type",
        conversionType = "purchase",
        touchTypes = Seq("view", "click"),
        gapSeconds = 1800L, tieBreak = Seq("event_id"))
        .select(col("event_id"), col("session_id"),
          col("first_touch_type"), col("first_touch_us"),
          col("last_touch_type"), col("last_touch_us"),
          col("n_touches"))
        .orderBy("event_id")
    }),

    "q272_rfm_scores" -> ((s, dir) => {
      // RFM customer-value scores: exact integer triple + NTILE(5)
      // replicated by pure integer math over two-phase ranks — the
      // oracle's literal NTILE must agree bucket-for-bucket
      graft.operators.Behavior.rfmScores(
        tbl(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")
    }),

    "q271_twap" -> ((s, dir) => {
      // hold-previous time-weighted running mean per user: null
      // values accrue the prior observation, integrand exact
      // decimal(38,0) micro-units × micro-seconds, one double
      // division at readout replayed verbatim by the oracle
      WindowOps.timeWeightedMean(tbl(s, dir, "events"), "user_id",
        "ts", "value", tieBreak = Seq("event_id"))
        .select(col("event_id"),
          round(col("value_twm"), 6).as("value_twm"))
        .orderBy("event_id")
    }),

    "q268_cooccurrence" -> ((s, dir) => {
      // market-basket association over 30-min gap sessions: support/
      // confidence/lift per unordered event-type pair; pair join
      // session-confined, totals broadcast, N a 1-row broadcast
      graft.operators.Behavior.cooccurrence(
        tbl(s, dir, "events"), "user_id", "ts", "event_type",
        gapSeconds = 1800L)
        .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
          col("n_ab"), col("n_sessions"),
          round(col("support"), 6).as("support"),
          round(col("conf_a_b"), 6).as("conf_a_b"),
          round(col("conf_b_a"), 6).as("conf_b_a"),
          round(col("lift"), 6).as("lift"))
        .orderBy("item_a", "item_b")
    }),

    "q229_interval_features" -> ((s, dir) => {
      // "purchases in the last hour / day" per event: one cumulative
      // pass + as-of differences, exact decimal sums; the oracle
      // recomputes every window with direct correlated aggregates
      AsOfJoin.intervalFeatures(tbl(s, dir, "events"),
        purchases(s, dir), entity = "user_id", leftTs = "ts",
        windowsSeconds = Seq(3600L, 86400L),
        valueCol = Some("purchase_value"))
        .select(col("event_id"), col("w3600_count"), col("w3600_sum"),
          col("w86400_count"), col("w86400_sum"))
        .orderBy("event_id")
    }),

    "q228_multi_horizon" -> ((s, dir) => {
      // the lag-family feature-store shape: the q30 purchase feed
      // as-of joined at t, t-1h and t-1d per event, zero leakage at
      // every horizon — the oracle chains three DuckDB ASOF joins on
      // pre-shifted instants
      AsOfJoin.multiHorizon(tbl(s, dir, "events"), purchases(s, dir),
        entity = "user_id", leftTs = "ts",
        horizonsSeconds = Seq(0L, 3600L, 86400L),
        rightValueCols = Seq("purchase_value"))
        .select(col("event_id"),
          col("h0_purchase_value"), col("h0_matched_ts"),
          col("h3600_purchase_value"), col("h3600_matched_ts"),
          col("h86400_purchase_value"), col("h86400_matched_ts"))
        .orderBy("event_id")
    }),

    "q141_asof_auto_salted" -> ((s, dir) => {
      // the SAME as-of join as q30 but with runtime hot-key detection
      // driving the salting (no explicit hot list): a 2%-row-share
      // sampled key-frequency pass promotes whatever keys it finds,
      // and the salted plan must still be value-exact against the
      // ASOF-join oracle — the driver-level proof that auto-salting
      // never changes results, only the partitioning
      AsOfJoin.join(tbl(s, dir, "events"), purchases(s, dir),
        entity = "user_id", leftTs = "ts", rightTs = "ts",
        rightValueCols = Seq("purchase_value"),
        autoSaltShare = Some(0.02), autoSaltSample = 0.5)
        .select(col("event_id"), col("purchase_value"), col("matched_ts"))
        .orderBy("event_id")
    }),

    "q31_asof_join_strict" -> ((s, dir) => {
      AsOfJoin.join(tbl(s, dir, "events"), purchases(s, dir),
        entity = "user_id", leftTs = "ts", rightTs = "ts",
        rightValueCols = Seq("purchase_value"), strict = true)
        .select(col("event_id"), col("purchase_value"), col("matched_ts"))
        .orderBy("event_id")
    }),

    "q85_asof_forward" -> ((s, dir) => {
      // earliest FUTURE purchase per event (time-to-next-event label
      // generation) — same one-exchange union+window plan as the
      // backward join, frame flipped to (currentRow, following)
      AsOfJoin.joinForward(tbl(s, dir, "events"), purchases(s, dir),
        entity = "user_id", leftTs = "ts", rightTs = "ts",
        rightValueCols = Seq("purchase_value"))
        .select(col("event_id"), col("purchase_value"), col("matched_ts"))
        .orderBy("event_id")
    }),

    "q32_asof_join_tolerance" -> ((s, dir) => {
      AsOfJoin.join(tbl(s, dir, "events"), purchases(s, dir),
        entity = "user_id", leftTs = "ts", rightTs = "ts",
        rightValueCols = Seq("purchase_value"),
        toleranceSeconds = Some(86400))
        .select(col("event_id"), col("purchase_value"), col("matched_ts"))
        .orderBy("event_id")
    }),

    "q33_asof_join_broadcast" -> ((s, dir) => {
      AsOfJoin.join(tbl(s, dir, "events"), purchases(s, dir),
        entity = "user_id", leftTs = "ts", rightTs = "ts",
        rightValueCols = Seq("purchase_value"), broadcastRight = true)
        .select(col("event_id"), col("purchase_value"), col("matched_ts"))
        .orderBy("event_id")
    }),

    "q34_forward_fill" -> ((s, dir) => {
      val df = tbl(s, dir, "events").withColumn("v",
        when(col("event_id") % 3 === 0, lit(null)).otherwise(col("value")))
      WindowOps.forwardFill(df, "user_id", "ts", Seq("v"))
        .select(col("event_id"), col("v_ffill")).orderBy("event_id")
    }),

    "q35_backfill" -> ((s, dir) => {
      val df = tbl(s, dir, "events").withColumn("v",
        when(col("event_id") % 3 === 0, lit(null)).otherwise(col("value")))
      WindowOps.backFill(df, "user_id", "ts", Seq("v"))
        .select(col("event_id"), col("v_bfill")).orderBy("event_id")
    }),

    "q36_lag_lead" -> ((s, dir) => {
      WindowOps.lagLead(tbl(s, dir, "events"), "user_id", "ts",
        Seq("value"), k = 2)
        .select(col("event_id"), col("value_lag2"), col("value_lead2"))
        .orderBy("event_id")
    }),

    "q37_rolling_rows" -> ((s, dir) => {
      WindowOps.rollingRows(tbl(s, dir, "events"), "user_id", "ts",
        Seq("value"), k = 5, aggs = Seq("min", "max", "count"))
        .select(col("event_id"), col("value_roll5_min"),
          col("value_roll5_max"), col("value_roll5_count"))
        .orderBy("event_id")
    }),

    "q146_decayed_rolling" -> ((s, dir) => {
      // recency-weighted activity feature: half-life-decayed sum of
      // the last 4 event values per user (6h half-life). The oracle
      // spells out the identical fixed left-assoc term fold, so the
      // per-term lag/pow math is certified value-exactly
      WindowOps.decayedRollingSum(tbl(s, dir, "events"), "user_id",
        "ts", "value", k = 4, halfLifeSeconds = 21600.0)
        .select(col("event_id"), col("user_id"),
          round(col("decayed_sum"), 6).as("decayed_sum"))
        .orderBy("event_id")
    }),

    "q181_rolling_quantile" -> ((s, dir) => {
      // robust rolling features: exact median and p90 of the last 7
      // event values per user (QUANTILE_CONT interpolation) — the
      // oracle is DuckDB's own windowed QUANTILE_CONT, so the whole
      // sort+bracket+interp path is certified value-exactly
      val ev = tbl(s, dir, "events")
      val med = WindowOps.rollingQuantile(ev, "user_id", "ts", "value",
        k = 7, q = 0.5, out = "med7", tieBreak = Seq("event_id"))
      WindowOps.rollingQuantile(med, "user_id", "ts", "value",
        k = 7, q = 0.9, out = "p90_7", tieBreak = Seq("event_id"))
        .select(col("event_id"), round(col("med7"), 6).as("med7"),
          round(col("p90_7"), 6).as("p90_7"))
        .orderBy("event_id")
    }),

    "q182_expanding_target_mean" -> ((s, dir) => {
      // leakage-free target encoding through time: each event sees
      // the mean value of its event_type over STRICTLY EARLIER events
      // only (never itself, never the future) + the history count
      WindowOps.expandingMean(tbl(s, dir, "events"), "event_type",
        "ts", "value", out = "et_mean", tieBreak = Seq("event_id"))
        .select(col("event_id"), round(col("et_mean"), 6).as("et_mean"),
          col("et_mean_n"))
        .orderBy("event_id")
    }),

    "q183_interp_fill" -> ((s, dir) => {
      // time-weighted linear interpolation over a deterministically
      // nulled-out value column (event_id % 7 < 2 -> null, ~29%):
      // interior gaps interpolate by time, edges fall back to
      // nearest-available, all-null entities stay null
      val ev = tbl(s, dir, "events").withColumn("v",
        when(col("event_id") % 7 < 2, lit(null).cast("double"))
          .otherwise(col("value")))
      WindowOps.interpolateFill(ev, "user_id", "ts", "v",
        out = "v_interp", tieBreak = Seq("event_id"))
        .select(col("event_id"), round(col("v_interp"), 6).as("v_interp"))
        .orderBy("event_id")
    }),

    "q202_lifetime_features" -> ((s, dir) => {
      // account age / sequence (leakage-clean) + retrospective
      // cohort denominators (documented as such) — all exact
      // integer-us arithmetic on one entity exchange
      WindowOps.lifetimeFeatures(tbl(s, dir, "events"), "user_id",
        "ts", tieBreak = Seq("event_id"))
        .select(col("event_id"), col("age_us"), col("event_seq"),
          col("n_total"), round(col("life_frac"), 6).as("life_frac"))
        .orderBy("event_id")
    }),

    "q200_training_table" -> ((s, dir) => {
      // the north-star composition, driver-gated end to end: every
      // event becomes a leakage-clean training row — an as-of
      // point-in-time feature (last purchase, strictly past), a
      // leakage-free expanding encoder, a robust rolling median, a
      // right-censored FUTURE label, and the assembled model-facing
      // vector with its null bitmask
      val ev = tbl(s, dir, "events")
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("pv"))
      // STRICT as-of: a purchase event must not read its own (or a
      // same-instant) purchase as its feature — strictly past only,
      // consistent with every other stage of this table
      val pit = AsOfJoin.join(ev, purch, entity = "user_id",
        leftTs = "ts", rightTs = "ts", rightValueCols = Seq("pv"),
        strict = true)
      val withEnc = WindowOps.expandingMean(pit, "event_type", "ts",
        "value", out = "et_mean", tieBreak = Seq("event_id"))
      val withMed = WindowOps.rollingQuantile(withEnc, "user_id",
        "ts", "value", k = 7, q = 0.5, out = "med7",
        tieBreak = Seq("event_id"))
      val withLab = WindowOps.timeToNextEvent(withMed, "user_id",
        "ts", col("event_type") === "purchase",
        horizonSeconds = 7L * 86400L, tieBreak = Seq("event_id"))
      graft.operators.Assemble.features(withLab,
        Seq("pv", "et_mean", "med7"))
        .select(col("event_id"),
          col("features_null_mask").as("mask"),
          round(element_at(col("features"), 1), 6).as("f_pv"),
          round(element_at(col("features"), 2), 6).as("f_enc"),
          round(element_at(col("features"), 3), 6).as("f_med"),
          col("tte_us"), col("tte_observed"))
        .orderBy("event_id")
    }),

    "q197_rolling_zscore" -> ((s, dir) => {
      // trailing-baseline anomaly screen: each event scored against
      // its user's PRIOR 20 readings (never its own); exact integer
      // frame moments, z is scale-free
      WindowOps.rollingZScore(tbl(s, dir, "events"), "user_id", "ts",
        "value", k = 20, cutoff = 3.0, tieBreak = Seq("event_id"))
        .select(col("event_id"), round(col("value_rz"), 6).as("rz"),
          col("value_anomaly").as("anomaly"))
        .orderBy("event_id")
    }),

    "q196_label_window" -> ((s, dir) => {
      // regression-label mass: per event, each user's purchase value
      // over the STRICTLY future 72h (frame starts 1us after the
      // row's instant — the row never reads itself), integer micro
      // sums; the leakage mirror of the as-of join
      val ev = tbl(s, dir, "events")
      WindowOps.labelWindow(
        ev.withColumn("pv", when(col("event_type") === "purchase",
          col("value"))),
        "user_id", "ts", "pv", horizonSeconds = 72L * 3600L)
        .select(col("event_id"), col("label_micros"), col("label_n"))
        .orderBy("event_id")
    }),

    "q266_holt_smooth" -> ((s, dir) => {
      // Holt linear-trend smoothing: TWO coupled states (level +
      // slope) per user — doubly non-Window-expressible; the same
      // secondary-sort scan as q189/q193, fold replayed verbatim by
      // the recursive-CTE oracle so level/trend/forecast agree to
      // the last ulp before round-6
      graft.temporal.Sequential.holtSmooth(
        tbl(s, dir, "events").filter(col("value").isNotNull),
        "user_id", "ts", "event_id", "value",
        alpha = 0.3, beta = 0.1)
        .select(col("event_id"),
          round(col("holt_level"), 6).as("holt_level"),
          round(col("holt_trend"), 6).as("holt_trend"),
          round(col("holt_forecast"), 6).as("holt_forecast"))
        .orderBy("event_id")
    }),

    "q193_ewm_mean" -> ((s, dir) => {
      // irregular-interval EWM LEVEL (pandas ewm(times=...).mean()):
      // the normalized companion of q189's decayed mass — same
      // secondary-sort scan, s + (1-2^(-dt/hl))*(x-s) fold replayed
      // bit-exactly by the recursive-CTE oracle
      graft.temporal.Sequential.ewmMean(
        tbl(s, dir, "events").filter(col("value").isNotNull),
        "user_id", "ts", "event_id", "value",
        halfLifeSeconds = 21600.0)
        .select(col("event_id"),
          round(col("ewm_mean"), 6).as("ewm_mean"))
        .orderBy("event_id")
    }),

    "q192_gap_stats" -> ((s, dir) => {
      // per-user cadence features: exact integer-us inter-event gaps
      // reduced to count/min/max/mean/std; squared moments widened to
      // decimal(38,0) so every accumulator is exact
      // mean/std read out in SECONDS: at the microsecond magnitude
      // (~3e10) a double's ulp exceeds the 6dp rounding grain, so the
      // two engines' round() implementations can disagree by one ulp;
      // at ~3e4 seconds round-6 is decisive
      WindowOps.gapStats(tbl(s, dir, "events"), "user_id", "ts",
        tieBreak = Seq("event_id"))
        .select(col("user_id"), col("n_events"), col("n_gaps"),
          col("gap_min_us"), col("gap_max_us"),
          round(col("gap_mean_us") / lit(1e6), 6).as("gap_mean_s"),
          round(col("gap_std_us") / lit(1e6), 6).as("gap_std_s"))
        .orderBy("user_id")
    }),

    "q190_survival_labels" -> ((s, dir) => {
      // churn/conversion label generation: exact integer-us time to
      // each user's NEXT purchase, right-censored at 7 days, plus
      // the observed flag — strictly-forward frame, no self-read
      WindowOps.timeToNextEvent(tbl(s, dir, "events"), "user_id",
        "ts", col("event_type") === "purchase",
        horizonSeconds = 7L * 86400L, tieBreak = Seq("event_id"))
        .select(col("event_id"), col("tte_us"), col("tte_observed"))
        .orderBy("event_id")
    }),

    "q189_decayed_exact" -> ((s, dir) => {
      // the UNTRUNCATED decay recurrence (q146's bounded-k fan is the
      // approximation; q147 is the online form): exact batch backfill
      // via the same secondary-sort scan as q185, identical
      // x + s*pow(0.5, dt/hl) expression tree as stream and oracle
      graft.temporal.Sequential.decayedSum(
        tbl(s, dir, "events").filter(col("value").isNotNull),
        "user_id", "ts", "event_id", "value",
        halfLifeSeconds = 21600.0)
        .select(col("event_id"), round(col("decayed"), 6).as("decayed"))
        .orderBy("event_id")
    }),

    "q185_cusum_changepoint" -> ((s, dir) => {
      // per-user sequential drift detector: two-sided CUSUM in
      // integer micro-units via ONE repartition + secondary sort +
      // mapPartitions scan; the oracle replays the identical
      // recurrence with a recursive CTE — value-exact because
      // integer adds have no summation-order to drift
      graft.temporal.Sequential.cusum(tbl(s, dir, "events"),
        "user_id", "ts", "event_id", "value",
        target = 35.0, slack = 10.0, threshold = 1000.0)
        .select(col("event_id"), col("cusum_pos"), col("cusum_neg"),
          col("alarm"))
        .orderBy("event_id")
    }),

    "q38_rolling_range" -> ((s, dir) => {
      WindowOps.rollingRange(tbl(s, dir, "events"), "user_id", "ts",
        Seq("value"), seconds = 3600, aggs = Seq("min", "max", "count"))
        .select(col("event_id"), col("value_rng3600s_min"),
          col("value_rng3600s_max"), col("value_rng3600s_count"))
        .orderBy("event_id")
    }),

    "q74_range_join" -> ((s, dir) => {
      // point-in-interval range join: ~1% of events open a 2h campaign
      // window keyed by user cohort; every event inside a window
      // attaches to it. Bucketized equi-join — the naive BETWEEN
      // formulation is a nested loop (plan-asserted in RangeJoinSpec)
      import graft.temporal.RangeJoin
      val ev = tbl(s, dir, "events")
        .withColumn("k", pmod(col("user_id"), lit(20)))
      val iv = ev.filter(col("event_id") % 97 === 0)
        .select(col("k"), col("event_id").as("iid"),
          col("ts").as("s0"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("e0"))
      RangeJoin.pointInInterval(
        ev.select(col("k"), col("event_id"), col("ts"), col("value")),
        iv, Seq("k"), "ts", "s0", "e0", bucketSeconds = 7200)
        .select(col("event_id"), col("iid"),
          round(col("value"), 6).as("value"))
        .orderBy("event_id", "iid")
    }),

    "q75_interval_overlap" -> ((s, dir) => {
      // interval-overlap join between two derived campaign tables:
      // bucket-tiled equi-join, pair emitted from the first shared
      // bucket only (exactly-once without a distinct)
      import graft.temporal.RangeJoin
      val ev = tbl(s, dir, "events")
        .withColumn("k", pmod(col("user_id"), lit(20)))
      val a = ev.filter(col("event_id") % 97 === 0)
        .select(col("k"), col("event_id").as("aid"),
          col("ts").as("s1"),
          (col("ts") + expr("INTERVAL 3 HOURS")).as("e1"))
      val b = ev.filter(col("event_id") % 89 === 0)
        .select(col("k"), col("event_id").as("bid"),
          col("ts").as("s2"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("e2"))
      RangeJoin.intervalOverlap(a, b, Seq("k"), "s1", "e1", "s2", "e2",
        bucketSeconds = 7200)
        .select(col("aid"), col("bid"))
        .orderBy("aid", "bid")
    }),

    "q231_session_stats" -> ((s, dir) => {
      // per-session features over the q39 gap rule: event count,
      // start/end, exact integer duration, mean inter-event gap
      // (null for singletons) — one window exchange + one bounded agg
      WindowOps.sessionStats(tbl(s, dir, "events"), "user_id", "ts",
        gapSeconds = 1800)
        .select(col("user_id"), col("session_id"), col("n_events"),
          col("started_at"), col("ended_at"), col("duration_us"),
          col("mean_gap_us"))
        .orderBy("user_id", "session_id")
    }),

    "q39_sessionize" -> ((s, dir) => {
      WindowOps.sessionize(tbl(s, dir, "events"), "user_id", "ts",
        gapSeconds = 1800)
        .select(col("event_id"), col("session_id")).orderBy("event_id")
    }),

    "q177_asof_multi_feed" -> ((s, dir) => {
      // feature-store assembly: ONE event spine enriched point-in-time
      // from TWO feature feeds (last purchase, last view) in a single
      // joinMulti call — per-feed prefixed outputs, k feeds = k
      // sort-merge passes, no cross-feed blowup; the oracle chains
      // two ASOF joins
      val ev = tbl(s, dir, "events")
      def feed(t: String, vcol: String) = AsOfJoin.Feed(t,
        ev.filter(col("event_type") === t)
          .select(col("user_id"), col("ts"), col("value").as(vcol)),
        valueCols = Seq(vcol))
      AsOfJoin.joinMulti(ev, "user_id", "ts",
        Seq(feed("purchase", "pv"), feed("view", "vv")))
        .select(col("event_id"), col("purchase_pv"),
          col("purchase_matched_ts"), col("view_vv"),
          col("view_matched_ts"))
        .orderBy("event_id")
    }),

    "q169_purged_kfold" -> ((s, dir) => {
      // purged K-fold with embargo over the event log: fold 2 of 5 is
      // the test interval, train rows within 12h before it are purged
      // (their rolling/as-of feature windows overlap the test set)
      // and rows within 6h after are embargoed — every boundary is
      // exact integer-microsecond arithmetic the oracle recomputes
      graft.temporal.Splits.purgedKFold(tbl(s, dir, "events"), "ts",
        k = 5, testFold = 2, purgeSeconds = 12 * 3600,
        embargoSeconds = 6 * 3600)
        .select(col("event_id"), col("fold"), col("role"))
        .orderBy("event_id")
    }),

    "q168_session_features" -> ((s, dir) => {
      // per-session rollup: duration (exact microseconds), event
      // count, type diversity, spend in integer micro-units — the
      // behavioral feature table a CTR model trains on
      WindowOps.sessionFeatures(tbl(s, dir, "events"), "user_id", "ts",
        gapSeconds = 1800, valueCol = "value", typeCol = "event_type")
        .select(col("user_id"), col("session_id"),
          col("session_start"), col("session_end"), col("duration_us"),
          col("n_events"), col("n_event_types"), col("value_micros"))
        .orderBy("user_id", "session_id")
    }),

    "q218_replay_parity" -> ((s, dir) => {
      // train/serve feature-replay parity (online/offline skew): the
      // purchase feature as-of the event instant (training) vs as-of
      // event+2h (serving); _stale flags rows where a purchase landed
      // inside the window between the two instants. Oracle = two
      // chained DuckDB ASOF joins + IS DISTINCT FROM.
      val evs = tbl(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("serve_ts"))
      AsOfJoin.replayParity(evs, purchases(s, dir), "user_id",
        "ts", "serve_ts", "ts", Seq("purchase_value"))
        .select(col("event_id"), col("purchase_value_train"),
          col("purchase_value_serve"), col("purchase_value_stale"),
          col("matched_ts_train"), col("matched_ts_serve"))
        .orderBy("event_id")
    })
  )

  private val purchasesSql =
    """SELECT user_id, ts, value AS purchase_value
      |FROM events WHERE event_type = 'purchase'""".stripMargin

  private val baseOracles: Map[String, String] = Map(
    "q30_asof_join" ->
      s"""SELECT l.event_id, r.purchase_value,
         |       r.ts AS matched_ts
         |FROM events l ASOF LEFT JOIN ($purchasesSql) r
         |ON l.user_id = r.user_id AND l.ts >= r.ts
         |ORDER BY 1""".stripMargin,

    // two chained ASOF joins + the tolerance CASE: entity match
    // within the hour wins (even a NULL value — a matched row's null
    // is a reading, not a miss); otherwise the cohort feed answers
    "q246_asof_fallback" ->
      s"""WITH p AS ($purchasesSql),
         |g AS (SELECT user_id % 100 AS cohort, ts,
         |    max(value) AS gv
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         |e AS (SELECT event_id, user_id, user_id % 100 AS cohort, ts
         |  FROM events),
         |t0 AS (SELECT e.*, r.purchase_value AS ev_val, r.ts AS e_mts
         |  FROM e ASOF LEFT JOIN p r
         |  ON e.user_id = r.user_id AND e.ts >= r.ts),
         |t1 AS (SELECT t0.*, gr.gv, gr.ts AS g_mts
         |  FROM t0 ASOF LEFT JOIN g gr
         |  ON t0.cohort = gr.cohort AND t0.ts >= gr.ts),
         |f AS (SELECT event_id, ev_val, e_mts, gv, g_mts,
         |    (e_mts IS NOT NULL
         |      AND ts - e_mts <= INTERVAL 3600 SECOND) AS ok_e
         |  FROM t1)
         |SELECT event_id,
         |  CASE WHEN ok_e THEN ev_val ELSE gv END AS purchase_value,
         |  CASE WHEN ok_e THEN e_mts ELSE g_mts END AS matched_ts,
         |  CASE WHEN ok_e THEN 'entity'
         |    WHEN g_mts IS NOT NULL THEN 'group'
         |  END AS feature_source
         |FROM f ORDER BY 1""".stripMargin,

    // full-grid OHLC rebuild: per-bucket aggregates over the non-null
    // readings, generate_series grid per user span, IGNORE NULLS
    // running carry for close
    "q254_resample_bars" ->
      """WITH p AS (SELECT user_id, ts,
        |    CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS v
        |  FROM events WHERE event_type = 'purchase'),
        |allb AS (SELECT user_id,
        |    CAST(floor(epoch_us(ts) / 21600000000.0) AS BIGINT) AS b
        |  FROM p GROUP BY 1, 2),
        |bars AS (SELECT user_id,
        |    CAST(floor(epoch_us(ts) / 21600000000.0) AS BIGINT) AS b,
        |    count(*) AS n, arg_min(v, ts) AS open, max(v) AS high,
        |    min(v) AS low, arg_max(v, ts) AS close_raw
        |  FROM p WHERE v IS NOT NULL GROUP BY 1, 2),
        |span AS (SELECT user_id, min(b) AS lo, max(b) AS hi
        |  FROM allb GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(lo, hi)) AS b
        |  FROM span),
        |j AS (SELECT g.user_id, g.b,
        |    CAST(coalesce(o.n, 0) AS BIGINT) AS n,
        |    o.open, o.high, o.low, o.close_raw
        |  FROM grid g LEFT JOIN bars o
        |    ON g.user_id = o.user_id AND g.b = o.b),
        |f AS (SELECT user_id, b, n, open, high, low,
        |    last_value(close_raw IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close
        |  FROM j)
        |SELECT user_id, CAST(b * 21600 AS BIGINT) AS bar_start_s,
        |  n, open, high, low, close
        |FROM f ORDER BY user_id, bar_start_s""".stripMargin,

    // per-event argmin over |Δt| with the backward tie-break spelled
    // out — the LATERAL re-derives exactly the pick joinNearest makes
    "q251_asof_nearest" ->
      """WITH p AS (SELECT user_id, ts, max(value) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT e.event_id, r.purchase_value, r.ts AS matched_ts
        |FROM events e LEFT JOIN LATERAL (
        |  SELECT p.purchase_value, p.ts FROM p
        |  WHERE p.user_id = e.user_id
        |    AND abs(epoch_us(e.ts) - epoch_us(p.ts)) <= 7200000000
        |  ORDER BY abs(epoch_us(e.ts) - epoch_us(p.ts)) ASC,
        |           CASE WHEN p.ts <= e.ts THEN 0 ELSE 1 END ASC
        |  LIMIT 1) r ON true
        |ORDER BY 1""".stripMargin,

    // same running micro max; the peak row is arg_max over the
    // (m, rn) order encoded as m*2^20 + rn (rn bounded far below
    // 2^20 per user) — ties to the newest, exactly Spark's
    // max_by(rn, struct(m, rn))
    "q265_drawdown" ->
      """WITH e AS (SELECT event_id, user_id, ts,
        |  CASE WHEN event_id % 13 <> 0 AND value IS NOT NULL
        |      AND NOT isnan(value)
        |    THEN CAST(round(value * 1e6) AS BIGINT) END AS m
        |FROM events),
        |x1 AS (SELECT event_id, user_id, m,
        |  ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS rn
        |FROM e),
        |x AS (SELECT event_id, m, rn,
        |  MAX(m) OVER w AS runmax,
        |  arg_max(rn, CASE WHEN m IS NOT NULL
        |    THEN CAST(m AS HUGEINT) * 1048576 + rn END)
        |    OVER w AS peak_rn
        |FROM x1 WINDOW w AS (PARTITION BY user_id ORDER BY rn
        |  ROWS UNBOUNDED PRECEDING))
        |SELECT event_id,
        |  ROUND(CAST(runmax AS DOUBLE) / 1e6, 6) AS runmax,
        |  CASE WHEN m IS NOT NULL THEN runmax - m END AS dd_micros,
        |  CAST(CASE WHEN runmax IS NOT NULL THEN rn - peak_rn END
        |    AS INTEGER) AS peak_age
        |FROM x ORDER BY 1""".stripMargin,

    // q256's moment machinery with x = anchored elapsed seconds: the
    // same double elapsed computation re-quantized to micro-units
    "q263_rolling_trend" ->
      """WITH e AS (SELECT event_id, user_id, ts,
        |  CASE WHEN value IS NOT NULL AND NOT isnan(value)
        |    THEN CAST(round(((epoch_us(ts) - 1704067200000000)
        |      / 1e6) * 1e6) AS BIGINT) END AS mx,
        |  CASE WHEN value IS NOT NULL AND NOT isnan(value)
        |    THEN CAST(round(value * 1e6) AS BIGINT) END AS my
        |FROM events),
        |x AS (SELECT event_id,
        |  COUNT(mx) OVER w AS n,
        |  CAST(SUM(mx) OVER w AS HUGEINT) AS sx,
        |  CAST(SUM(my) OVER w AS HUGEINT) AS sy,
        |  SUM(CAST(mx AS HUGEINT) * mx) OVER w AS sxx,
        |  SUM(CAST(my AS HUGEINT) * my) OVER w AS syy,
        |  SUM(CAST(mx AS HUGEINT) * my) OVER w AS sxy
        |FROM e WINDOW w AS (PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_id, n,
        |  n * sxy - sx * sy AS num,
        |  n * sxx - sx * sx AS dx,
        |  n * syy - sy * sy AS dy
        |FROM x)
        |SELECT event_id,
        |  ROUND(CASE WHEN n >= 2 AND dx > 0
        |    THEN CAST(num AS DOUBLE) / CAST(dx AS DOUBLE) END,
        |    6) AS trend,
        |  ROUND(CASE WHEN n >= 2 AND dx > 0 AND dy > 0
        |    THEN CAST(num AS DOUBLE)
        |      / sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)) END,
        |    6) AS strength
        |FROM z ORDER BY 1""".stripMargin,

    // same first-day cohorting, distinct-activity days, readout ratio
    "q260_cohort_retention" ->
      """WITH ev AS (SELECT user_id AS e,
        |    CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS p
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |f AS (SELECT e, MIN(p) AS cohort FROM ev GROUP BY e),
        |a AS (SELECT DISTINCT ev.e, f.cohort, ev.p - f.cohort AS off
        |  FROM ev JOIN f USING (e)),
        |s AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
        |  FROM f GROUP BY cohort),
        |c AS (SELECT cohort, off, CAST(COUNT(*) AS BIGINT) AS active
        |  FROM a GROUP BY 1, 2)
        |SELECT CAST(c.cohort * 86400 AS BIGINT) AS cohort_start_s,
        |  c.off AS period_offset, s.cohort_size, c.active,
        |  ROUND(CAST(c.active AS DOUBLE)
        |    / CAST(s.cohort_size AS DOUBLE), 6) AS retention
        |FROM c JOIN s USING (cohort)
        |ORDER BY cohort_start_s, period_offset""".stripMargin,

    // chain of conditional first-reach minima, strictly-after steps,
    // horizon anchored at the first step
    "q261_funnel_steps" ->
      """WITH ev AS (SELECT user_id AS e, event_type AS t,
        |    epoch_us(ts) AS us
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s1 AS (SELECT e, MIN(us) AS t1_us FROM ev
        |  WHERE t = 'view' GROUP BY e),
        |s2 AS (SELECT s1.e, MIN(ev.us) AS t2_us
        |  FROM s1 JOIN ev ON ev.e = s1.e
        |  WHERE ev.t = 'click' AND ev.us > s1.t1_us
        |    AND ev.us <= s1.t1_us + 259200000000
        |  GROUP BY s1.e),
        |s3 AS (SELECT s1.e, MIN(ev.us) AS t3_us
        |  FROM s1 JOIN s2 ON s2.e = s1.e JOIN ev ON ev.e = s1.e
        |  WHERE ev.t = 'purchase' AND ev.us > s2.t2_us
        |    AND ev.us <= s1.t1_us + 259200000000
        |  GROUP BY s1.e)
        |SELECT s1.e AS user_id, s1.t1_us, s2.t2_us, s3.t3_us,
        |  CAST(CASE WHEN s3.t3_us IS NOT NULL THEN 3
        |    WHEN s2.t2_us IS NOT NULL THEN 2 ELSE 1 END
        |    AS INTEGER) AS funnel_depth
        |FROM s1 LEFT JOIN s2 ON s1.e = s2.e
        |  LEFT JOIN s3 ON s1.e = s3.e
        |ORDER BY 1""".stripMargin,

    // identical bit weights, planting predicates and concat_ws
    // null-skipping
    "q350_null_patterns" ->
      """WITH p AS (SELECT user_id,
        |    CASE WHEN event_id % 11 = 0 THEN NULL
        |      ELSE event_type END AS event_type,
        |    CASE WHEN event_id % 7 = 0 THEN NULL
        |      ELSE value END AS value
        |  FROM events),
        |m AS (SELECT
        |    (CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |  + (CASE WHEN event_type IS NULL THEN 2 ELSE 0 END)
        |  + (CASE WHEN value IS NULL THEN 4 ELSE 0 END) AS mask,
        |  concat_ws(',',
        |    CASE WHEN user_id IS NULL THEN 'user_id' END,
        |    CASE WHEN event_type IS NULL THEN 'event_type' END,
        |    CASE WHEN value IS NULL THEN 'value' END) AS null_cols
        |  FROM p)
        |SELECT CAST(mask AS BIGINT) AS mask, null_cols,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM m GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // q39's session grid on typed rows, the same (ts, type) total
    // order inside string_agg, exact counts, tie-broken LIMIT
    "q349_session_paths" ->
      """WITH t AS (SELECT user_id, ts, event_type,
        |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         IS NULL
        |    OR date_diff('microsecond',
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
        |       > 1800000000
        |  THEN 1 ELSE 0 END AS is_new
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |s AS (SELECT user_id, ts, event_type,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM t),
        |p AS (SELECT user_id, sid,
        |    string_agg(event_type, '>'
        |      ORDER BY ts, event_type) AS path
        |  FROM s GROUP BY 1, 2),
        |c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        |  FROM p GROUP BY 1)
        |SELECT path, n_sessions FROM c
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,

    // the same micro-quantized moment fit (exact HUGEINT Σm, Σm²)
    // and the identical alpha/beta/shrink double chains
    "q348_shrunken_rate" ->
      """WITH a AS (SELECT user_id,
        |    CAST(COUNT(CASE WHEN event_type IS NOT NULL THEN 1
        |      END) AS BIGINT) AS n_obs,
        |    CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1
        |      END) AS BIGINT) AS n_success
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |a2 AS (SELECT * FROM a WHERE n_obs > 0),
        |q AS (SELECT *, CAST(round(CAST(n_success AS DOUBLE)
        |    / CAST(n_obs AS DOUBLE) * 1e6) AS BIGINT) AS m
        |  FROM a2),
        |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS e,
        |    SUM(CAST(m AS HUGEINT)) AS s1,
        |    SUM(CAST(m AS HUGEINT) * m) AS s2 FROM q),
        |g AS (SELECT e, CAST(s1 AS DOUBLE) / e AS aa,
        |    CAST(s2 AS DOUBLE) / e AS bb FROM f),
        |h AS (SELECT aa / 1e6 AS mean,
        |    bb / 1e12 - (aa / 1e6) * (aa / 1e6) AS v FROM g),
        |i AS (SELECT mean, v, CASE WHEN v > 0 THEN
        |    mean * (1 - mean) / v - 1 ELSE -1 END AS ab FROM h),
        |j AS (SELECT
        |    CASE WHEN ab > 0 AND mean > 0 AND mean < 1
        |      THEN mean * ab ELSE 0 END AS alpha,
        |    CASE WHEN ab > 0 AND mean > 0 AND mean < 1
        |      THEN ab - mean * ab ELSE 0 END AS beta FROM i)
        |SELECT user_id, n_obs, n_success,
        |  ROUND(CAST(n_success AS DOUBLE) / CAST(n_obs AS DOUBLE),
        |    6) AS rate,
        |  ROUND(CASE WHEN alpha > 0 AND beta > 0 THEN
        |      (CAST(n_success AS DOUBLE) + alpha)
        |        / (CAST(n_obs AS DOUBLE) + (alpha + beta))
        |    ELSE CAST(n_success AS DOUBLE) / CAST(n_obs AS DOUBLE)
        |    END, 6) AS shrunk_rate
        |FROM a2, j ORDER BY 1""".stripMargin,

    // exact (n, k), the identical Wilson chain with the same JVM
    // z/z^2 literals, divisions inside ROUND
    "q347_wilson_ctr" -> {
      val z = 1.96; val z2 = z * z
      s"""WITH a AS (SELECT user_id,
         |    CAST(COUNT(CASE WHEN event_type IS NOT NULL THEN 1
         |      END) AS BIGINT) AS n_obs,
         |    CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1
         |      END) AS BIGINT) AS n_success
         |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         |b AS (SELECT user_id, n_obs, n_success,
         |    CAST(n_success AS DOUBLE) / CAST(n_obs AS DOUBLE)
         |      AS p,
         |    CAST(n_obs AS DOUBLE) AS n
         |  FROM a WHERE n_obs > 0)
         |SELECT user_id, n_obs, n_success, ROUND(p, 6) AS rate,
         |  ROUND((p + $z2 / (n * 2) - $z *
         |    sqrt(p * (1 - p) / n + $z2 / (n * n * 4))) /
         |    (1 + $z2 / n), 6) AS wilson_lb
         |FROM b ORDER BY 1""".stripMargin
    },

    // q308's six-moment chains, one aggregated CTE feeding three
    // per-pair readouts (UNION ALL keeps each chain verbatim)
    "q343_corr_matrix" -> {
      def chain(p: String, a: String, b: String) =
        s"""SELECT '$a' AS col_a, '$b' AS col_b,
           |  n$p AS n_pairs,
           |  CASE WHEN n$p >= 2
           |      AND CAST(n$p AS HUGEINT) * sxx$p - sx$p * sx$p > 0
           |      AND CAST(n$p AS HUGEINT) * syy$p - sy$p * sy$p > 0
           |    THEN ROUND(CAST(CAST(n$p AS HUGEINT) * sxy$p
           |        - sx$p * sy$p AS DOUBLE)
           |      / (sqrt(CAST(CAST(n$p AS HUGEINT) * sxx$p
           |          - sx$p * sx$p AS DOUBLE))
           |        * sqrt(CAST(CAST(n$p AS HUGEINT) * syy$p
           |          - sy$p * sy$p AS DOUBLE))), 6) END AS corr
           |FROM m""".stripMargin
      def regs(p: String, x: String, y: String) =
        s"""CAST(COUNT(*) FILTER ($x IS NOT NULL AND $y IS NOT NULL)
           |      AS BIGINT) AS n$p,
           |    SUM(CAST($x AS HUGEINT)) FILTER ($y IS NOT NULL)
           |      AS sx$p,
           |    SUM(CAST($y AS HUGEINT)) FILTER ($x IS NOT NULL)
           |      AS sy$p,
           |    SUM(CAST($x AS HUGEINT) * $y) AS sxy$p,
           |    SUM(CAST($x AS HUGEINT) * $x) FILTER ($y IS NOT NULL)
           |      AS sxx$p,
           |    SUM(CAST($y AS HUGEINT) * $y) FILTER ($x IS NOT NULL)
           |      AS syy$p""".stripMargin
      s"""WITH e AS (SELECT
         |    CASE WHEN l_quantity IS NOT NULL THEN
         |      CAST(round(CAST(l_quantity AS DOUBLE) * 1e6)
         |        AS BIGINT) END AS q,
         |    CASE WHEN l_extendedprice IS NOT NULL THEN
         |      CAST(round(CAST(l_extendedprice AS DOUBLE) * 1e6)
         |        AS BIGINT) END AS ep,
         |    CASE WHEN l_discount IS NOT NULL THEN
         |      CAST(round(CAST(l_discount AS DOUBLE) * 1e6)
         |        AS BIGINT) END AS dc
         |  FROM lineitem),
         |m AS (SELECT
         |    ${regs("0", "q", "ep")},
         |    ${regs("1", "q", "dc")},
         |    ${regs("2", "ep", "dc")}
         |  FROM e)
         |${chain("0", "l_quantity", "l_extendedprice")}
         |UNION ALL
         |${chain("1", "l_quantity", "l_discount")}
         |UNION ALL
         |${chain("2", "l_extendedprice", "l_discount")}
         |ORDER BY 1, 2""".stripMargin
    },

    // 7 count registers, the q330 shared-literal trig/encode SQL on
    // the weekly cycle (DuckDB dayofweek = Spark dayofweek - 1)
    "q341_dow_vector" -> {
      val cs = (0 until 7).map(i =>
        s"CAST(COUNT(CASE WHEN h = $i THEN 1 END) AS BIGINT) AS c$i")
        .mkString(",\n    ")
      val nSum = (0 until 7).map(i => s"c$i").mkString(" + ")
      val xSum = (0 until 7).map(i =>
        s"c$i * (${math.cos(2 * math.Pi * i / 7)})")
        .mkString(" + ")
      val ySum = (0 until 7).map(i =>
        s"c$i * (${math.sin(2 * math.Pi * i / 7)})")
        .mkString(" + ")
      val enc = (0 until 7).map(i => s"c$i * 32 - $i")
        .mkString(", ")
      s"""WITH e AS (SELECT user_id,
         |    CAST(dayofweek(ts) AS BIGINT) AS h
         |  FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |p AS (SELECT user_id,
         |    $cs
         |  FROM e GROUP BY 1),
         |r AS (SELECT user_id,
         |    $nSum AS n,
         |    $xSum AS x,
         |    $ySum AS y,
         |    GREATEST($enc) AS enc
         |  FROM p)
         |SELECT user_id, n AS n_events,
         |  CAST(((enc + 6) // 32) * 32 - enc AS BIGINT)
         |    AS peak_dow,
         |  ROUND(CAST((enc + 6) // 32 AS DOUBLE)
         |    / CAST(n AS DOUBLE), 6) AS peak_share,
         |  ROUND(sqrt(x * x + y * y) / CAST(n AS DOUBLE), 6)
         |    AS dow_r,
         |  CASE WHEN sqrt(x * x + y * y) > 0 THEN
         |    ROUND(fmod(atan2(y, x) / (${2 * math.Pi}) * 7 + 7,
         |      7), 6) END AS mean_dow
         |FROM r ORDER BY 1""".stripMargin
    },

    // q332's lag + strictly-prior window SQL re-keyed onto orders
    "q340_gap_surprise_orders" ->
      """WITH e AS (SELECT o_orderkey, o_custkey,
        |    epoch_us(o_orderdate) AS t FROM orders),
        |g AS (SELECT o_orderkey, o_custkey, t,
        |    t - LAG(t) OVER (PARTITION BY o_custkey
        |      ORDER BY t, o_orderkey) AS gap_us
        |  FROM e),
        |x AS (SELECT o_orderkey, gap_us,
        |    COUNT(gap_us) OVER w2 AS np,
        |    SUM(CAST(gap_us AS HUGEINT)) OVER w2 AS s
        |  FROM g WINDOW w2 AS (PARTITION BY o_custkey
        |    ORDER BY t, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT o_orderkey, gap_us, CAST(np AS BIGINT)
        |    AS n_prior_gaps,
        |  CASE WHEN np > 0 THEN
        |    CAST(s AS DOUBLE) / CAST(np AS DOUBLE) END / 1e6
        |    AS mean_prior_gap_s,
        |  CASE WHEN np > 0
        |      AND CAST(s AS DOUBLE) / CAST(np AS DOUBLE) > 0 THEN
        |    CAST(gap_us AS DOUBLE)
        |      / (CAST(s AS DOUBLE) / CAST(np AS DOUBLE)) END
        |    AS gap_surprise
        |FROM x ORDER BY 1""".stripMargin,

    // the same one-agg interval cuts: span = (hi-lo)//4 + 1, pure
    // integer block math, CASE roles per fold
    "q338_walk_forward" ->
      """WITH b AS (SELECT min(epoch_us(ts)) AS lo,
        |    max(epoch_us(ts)) AS hi FROM events),
        |s AS (SELECT lo, (hi - lo) // 4 + 1 AS span FROM b),
        |e AS (SELECT event_id, epoch_us(ts) AS t FROM events)
        |SELECT event_id,
        |  CAST((t - lo) // span AS BIGINT) AS block,
        |  CASE WHEN (t - lo) // span = 1 THEN 'test'
        |    WHEN (t - lo) // span > 1 THEN 'future'
        |    WHEN t >= lo + 1 * span - 3600000000 THEN 'purged'
        |    ELSE 'train' END AS role_f1,
        |  CASE WHEN (t - lo) // span = 2 THEN 'test'
        |    WHEN (t - lo) // span > 2 THEN 'future'
        |    WHEN t >= lo + 2 * span - 3600000000 THEN 'purged'
        |    ELSE 'train' END AS role_f2,
        |  CASE WHEN (t - lo) // span = 3 THEN 'test'
        |    WHEN (t - lo) // span > 3 THEN 'future'
        |    WHEN t >= lo + 3 * span - 3600000000 THEN 'purged'
        |    ELSE 'train' END AS role_f3
        |FROM e, s ORDER BY 1""".stripMargin,

    // q333's bigram/entropy SQL re-keyed onto the orders table
    "q337_priority_entropy" ->
      """WITH e AS (SELECT o_custkey, o_orderkey,
        |    o_orderpriority, o_orderdate FROM orders
        |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        |    AND o_orderpriority IS NOT NULL),
        |b AS (SELECT o_custkey, o_orderpriority AS cur,
        |    LAG(o_orderpriority) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM e),
        |f AS (SELECT o_custkey, prev, cur FROM b
        |  WHERE prev IS NOT NULL),
        |pp AS (SELECT o_custkey, prev, cur,
        |    CAST(COUNT(*) AS BIGINT) AS npq
        |  FROM f GROUP BY 1, 2, 3),
        |pr AS (SELECT o_custkey,
        |    CAST(SUM(npq) AS BIGINT) AS n_bigrams,
        |    CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(COUNT(DISTINCT cur) AS BIGINT) AS n_cur_types,
        |    SUM(CAST(npq AS DOUBLE) * ln(CAST(npq AS DOUBLE)))
        |      AS nlpq
        |  FROM pp GROUP BY 1),
        |pv AS (SELECT o_custkey,
        |    SUM(CAST(np AS DOUBLE) * ln(CAST(np AS DOUBLE))) AS nlp
        |  FROM (SELECT o_custkey, prev,
        |      CAST(SUM(npq) AS BIGINT) AS np
        |    FROM pp GROUP BY 1, 2) GROUP BY 1)
        |SELECT r.o_custkey, n_bigrams, n_pairs, n_cur_types,
        |  ROUND((nlp - nlpq) / CAST(n_bigrams AS DOUBLE), 6)
        |    AS cond_entropy,
        |  CASE WHEN n_cur_types > 1 THEN
        |    ROUND((nlp - nlpq) / CAST(n_bigrams AS DOUBLE)
        |      / ln(CAST(n_cur_types AS DOUBLE)), 6) END
        |    AS norm_cond
        |FROM pr r JOIN pv USING (o_custkey) ORDER BY 1""".stripMargin,

    // identical bigram grid on one sort, the same two rearranged
    // entropy sums and their difference inside ROUND
    "q333_transition_entropy" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |b AS (SELECT user_id, event_type AS cur,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM e),
        |f AS (SELECT user_id, prev, cur FROM b
        |  WHERE prev IS NOT NULL),
        |pp AS (SELECT user_id, prev, cur,
        |    CAST(COUNT(*) AS BIGINT) AS npq
        |  FROM f GROUP BY 1, 2, 3),
        |pr AS (SELECT user_id, CAST(SUM(npq) AS BIGINT) AS n_bigrams,
        |    CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(COUNT(DISTINCT cur) AS BIGINT) AS n_cur_types,
        |    SUM(CAST(npq AS DOUBLE) * ln(CAST(npq AS DOUBLE)))
        |      AS nlpq
        |  FROM pp GROUP BY 1),
        |pv AS (SELECT user_id,
        |    SUM(CAST(np AS DOUBLE) * ln(CAST(np AS DOUBLE))) AS nlp
        |  FROM (SELECT user_id, prev,
        |      CAST(SUM(npq) AS BIGINT) AS np
        |    FROM pp GROUP BY 1, 2) GROUP BY 1)
        |SELECT r.user_id, n_bigrams, n_pairs, n_cur_types,
        |  ROUND((nlp - nlpq) / CAST(n_bigrams AS DOUBLE), 6)
        |    AS cond_entropy,
        |  CASE WHEN n_cur_types > 1 THEN
        |    ROUND((nlp - nlpq) / CAST(n_bigrams AS DOUBLE)
        |      / ln(CAST(n_cur_types AS DOUBLE)), 6) END
        |    AS norm_cond
        |FROM pr r JOIN pv USING (user_id) ORDER BY 1""".stripMargin,

    // the same lag + strictly-prior HUGEINT/count window pair on
    // one (ts, event_id) sort; divisions inside ROUND
    "q332_gap_surprise" ->
      """WITH e AS (SELECT event_id, user_id, ts, epoch_us(ts) AS t
        |  FROM events),
        |g AS (SELECT event_id, user_id, ts,
        |    t - LAG(t) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS gap_us
        |  FROM e),
        |x AS (SELECT event_id, gap_us,
        |    COUNT(gap_us) OVER w2 AS np,
        |    SUM(CAST(gap_us AS HUGEINT)) OVER w2 AS s
        |  FROM g WINDOW w2 AS (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, gap_us, CAST(np AS BIGINT) AS n_prior_gaps,
        |  CASE WHEN np > 0 THEN
        |    CAST(s AS DOUBLE) / CAST(np AS DOUBLE) END / 1e6
        |    AS mean_prior_gap_s,
        |  CASE WHEN np > 0
        |      AND CAST(s AS DOUBLE) / CAST(np AS DOUBLE) > 0 THEN
        |    CAST(gap_us AS DOUBLE)
        |      / (CAST(s AS DOUBLE) / CAST(np AS DOUBLE)) END
        |    AS gap_surprise
        |FROM x ORDER BY 1""".stripMargin,

    // q328's bucket/entropy SQL re-keyed onto the orders table
    "q331_gap_entropy_orders" ->
      """WITH e AS (SELECT o_custkey, epoch_us(o_orderdate) AS t
        |  FROM orders
        |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
        |g AS (SELECT o_custkey,
        |    t - LAG(t) OVER (PARTITION BY o_custkey ORDER BY t)
        |      AS dt
        |  FROM e),
        |f AS (SELECT o_custkey, CASE WHEN dt <= 0 THEN -1
        |    ELSE CAST(floor(log2(CAST(dt AS DOUBLE))) AS BIGINT)
        |    END AS b
        |  FROM g WHERE dt IS NOT NULL),
        |pb AS (SELECT o_custkey, b, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM f GROUP BY 1, 2),
        |r AS (SELECT o_custkey, CAST(SUM(n) AS BIGINT) AS n_gaps,
        |    CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |    SUM(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS nl
        |  FROM pb GROUP BY 1)
        |SELECT o_custkey, n_gaps, n_buckets,
        |  ROUND(ln(CAST(n_gaps AS DOUBLE))
        |    - nl / CAST(n_gaps AS DOUBLE), 6) AS bucket_entropy,
        |  CASE WHEN n_buckets > 1 THEN
        |    ROUND((ln(CAST(n_gaps AS DOUBLE))
        |      - nl / CAST(n_gaps AS DOUBLE))
        |      / ln(CAST(n_buckets AS DOUBLE)), 6) END
        |    AS norm_entropy
        |FROM r ORDER BY 1""".stripMargin,

    // 24 conditional-count registers, the SAME JVM cos/sin double
    // literals as the Spark plan (never DuckDB's own trig of the
    // angle), the q320 integer max-encode for the modal hour, and
    // the one atan2 inside ROUND
    "q330_hour_vector" -> {
      val cs = (0 until 24).map(i =>
        s"CAST(COUNT(CASE WHEN h = $i THEN 1 END) AS BIGINT) AS c$i")
        .mkString(",\n    ")
      val nSum = (0 until 24).map(i => s"c$i").mkString(" + ")
      val xSum = (0 until 24).map(i =>
        s"c$i * (${math.cos(2 * math.Pi * i / 24)})")
        .mkString(" + ")
      val ySum = (0 until 24).map(i =>
        s"c$i * (${math.sin(2 * math.Pi * i / 24)})")
        .mkString(" + ")
      val enc = (0 until 24).map(i => s"c$i * 32 - $i")
        .mkString(", ")
      s"""WITH e AS (SELECT user_id, CAST(hour(ts) AS BIGINT) AS h
         |  FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |p AS (SELECT user_id,
         |    $cs
         |  FROM e GROUP BY 1),
         |r AS (SELECT user_id,
         |    $nSum AS n,
         |    $xSum AS x,
         |    $ySum AS y,
         |    GREATEST($enc) AS enc
         |  FROM p)
         |SELECT user_id, n AS n_events,
         |  CAST(((enc + 23) // 32) * 32 - enc AS BIGINT)
         |    AS peak_hour,
         |  ROUND(CAST((enc + 23) // 32 AS DOUBLE)
         |    / CAST(n AS DOUBLE), 6) AS peak_share,
         |  ROUND(sqrt(x * x + y * y) / CAST(n AS DOUBLE), 6)
         |    AS hour_r,
         |  CASE WHEN sqrt(x * x + y * y) > 0 THEN
         |    ROUND(fmod(atan2(y, x) / (${2 * math.Pi}) * 24 + 24,
         |      24), 6) END AS mean_hour
         |FROM r ORDER BY 1""".stripMargin
    },

    // q39's session grid restricted to typed rows, per-session
    // DISTINCT type sets, and the predecessor overlap via a self
    // join on session_id - 1 — all-integer set sizes, one division
    "q329_session_jaccard" ->
      """WITH t AS (SELECT user_id, ts, event_type,
        |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         IS NULL
        |    OR date_diff('microsecond',
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
        |       > 1800000000
        |  THEN 1 ELSE 0 END AS is_new
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |s AS (SELECT user_id, event_type,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM t),
        |pt AS (SELECT DISTINCT user_id, session_id, event_type
        |  FROM s),
        |pc AS (SELECT user_id, session_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_types
        |  FROM pt GROUP BY 1, 2),
        |cm AS (SELECT a.user_id, a.session_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM pt a JOIN pt b ON a.user_id = b.user_id
        |    AND b.session_id = a.session_id - 1
        |    AND a.event_type = b.event_type
        |  GROUP BY 1, 2)
        |SELECT c.user_id, c.session_id,
        |  p.n_types AS n_prev_types, c.n_types AS n_cur_types,
        |  COALESCE(m.n_common, 0) AS n_common,
        |  ROUND(CAST(COALESCE(m.n_common, 0) AS DOUBLE)
        |    / CAST(p.n_types + c.n_types - COALESCE(m.n_common, 0)
        |        AS DOUBLE), 6) AS type_jaccard
        |FROM pc c
        |JOIN pc p ON p.user_id = c.user_id
        |  AND p.session_id = c.session_id - 1
        |LEFT JOIN cm m ON m.user_id = c.user_id
        |  AND m.session_id = c.session_id
        |ORDER BY 1, 2""".stripMargin,

    // q320's bucket frame, q290's exact entropy rearrangement
    "q328_gap_entropy" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |g AS (SELECT user_id,
        |    t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) AS dt
        |  FROM e),
        |f AS (SELECT user_id, CASE WHEN dt <= 0 THEN -1
        |    ELSE CAST(floor(log2(CAST(dt AS DOUBLE))) AS BIGINT)
        |    END AS b
        |  FROM g WHERE dt IS NOT NULL),
        |pb AS (SELECT user_id, b, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM f GROUP BY 1, 2),
        |r AS (SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_gaps,
        |    CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |    SUM(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS nl
        |  FROM pb GROUP BY 1)
        |SELECT user_id, n_gaps, n_buckets,
        |  ROUND(ln(CAST(n_gaps AS DOUBLE))
        |    - nl / CAST(n_gaps AS DOUBLE), 6) AS bucket_entropy,
        |  CASE WHEN n_buckets > 1 THEN
        |    ROUND((ln(CAST(n_gaps AS DOUBLE))
        |      - nl / CAST(n_gaps AS DOUBLE))
        |      / ln(CAST(n_buckets AS DOUBLE)), 6) END
        |    AS norm_entropy
        |FROM r ORDER BY 1""".stripMargin,

    // q285's window mirrored forward: FIRST_VALUE IGNORE NULLS over
    // the strictly-following frame on the same (ts, event_id) sort
    "q327_time_to_next_type" ->
      """WITH e AS (SELECT event_id, user_id, ts, epoch_us(ts) AS t,
        |    event_type FROM events)
        |SELECT event_id,
        |  FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN t
        |    END IGNORE NULLS) OVER w - t AS us_until_purchase,
        |  FIRST_VALUE(CASE WHEN event_type = 'click' THEN t
        |    END IGNORE NULLS) OVER w - t AS us_until_click,
        |  FIRST_VALUE(CASE WHEN event_type = 'error' THEN t
        |    END IGNORE NULLS) OVER w - t AS us_until_error
        |FROM e WINDOW w AS (PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |ORDER BY 1""".stripMargin,

    // q39's sessions -> per-session counts keyed by start hour —
    // exact counts, the same division inside ROUND
    "q326_bounce_by_hour" ->
      """WITH t AS (SELECT user_id, ts, epoch_us(ts) AS us,
        |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         IS NULL
        |    OR date_diff('microsecond',
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
        |       > 1800000000
        |  THEN 1 ELSE 0 END AS is_new
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s AS (SELECT user_id, ts, us,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM t),
        |g AS (SELECT user_id, sid,
        |    CAST(COUNT(*) AS BIGINT) AS ne,
        |    MIN(ts) AS started_at FROM s GROUP BY 1, 2)
        |SELECT CAST(hour(started_at) AS BIGINT) AS start_hour,
        |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(COUNT(CASE WHEN ne = 1 THEN 1 END) AS BIGINT)
        |    AS n_bounces,
        |  ROUND(CAST(COUNT(CASE WHEN ne = 1 THEN 1 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // the dense CTE, exact HUGEINT S1/S2, the identical
    // mean/var/fano double chain inside ROUND
    "q374_daily_dispersion" ->
      """WITH d AS (SELECT user_id,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |s AS (SELECT user_id, MIN(day) AS f, MAX(day) AS l
        |  FROM d GROUP BY 1),
        |g AS (SELECT user_id, unnest(range(f, l + 1)) AS day
        |  FROM s),
        |dense AS (SELECT g.user_id,
        |    CAST(COALESCE(d.n, 0) AS BIGINT) AS n
        |  FROM g LEFT JOIN d ON g.user_id = d.user_id
        |    AND g.day = d.day),
        |a AS (SELECT user_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(COUNT(CASE WHEN n > 0 THEN 1 END) AS BIGINT)
        |      AS n_active,
        |    SUM(CAST(n AS HUGEINT)) AS s1,
        |    SUM(CAST(n AS HUGEINT) * n) AS s2
        |  FROM dense GROUP BY 1)
        |SELECT user_id, n_days, n_active,
        |  ROUND(CAST(n_days - n_active AS DOUBLE)
        |    / CAST(n_days AS DOUBLE), 6) AS silent_share,
        |  ROUND(CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
        |    AS mean_daily,
        |  ROUND(CASE WHEN s1 > 0 THEN
        |    (CAST(s2 AS DOUBLE) / CAST(n_days AS DOUBLE)
        |      - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
        |        * (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)))
        |      / (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
        |    END, 6) AS fano
        |FROM a ORDER BY 1""".stripMargin,

    // the dense CTE, the same micro quantization of counts, and
    // q288's six-moment num/(sqrt*sqrt) chain at lag 7
    "q373_weekly_rhythm" ->
      """WITH d AS (SELECT user_id,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |s AS (SELECT user_id, MIN(day) AS f, MAX(day) AS l
        |  FROM d GROUP BY 1),
        |g AS (SELECT user_id, unnest(range(f, l + 1)) AS day
        |  FROM s),
        |dense AS (SELECT g.user_id, g.day,
        |    CAST(round(CAST(COALESCE(d.n, 0) AS DOUBLE) * 1e6)
        |      AS BIGINT) AS m
        |  FROM g LEFT JOIN d ON g.user_id = d.user_id
        |    AND g.day = d.day),
        |l AS (SELECT user_id, m AS y,
        |    LAG(m, 7) OVER (PARTITION BY user_id ORDER BY day)
        |      AS x
        |  FROM dense),
        |a AS (SELECT user_id,
        |    CAST(COUNT(*) FILTER (x IS NOT NULL AND y IS NOT NULL)
        |      AS BIGINT) AS n,
        |    SUM(CAST(x AS HUGEINT)) FILTER (y IS NOT NULL) AS sx,
        |    SUM(CAST(y AS HUGEINT)) FILTER (x IS NOT NULL) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) FILTER (y IS NOT NULL)
        |      AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) FILTER (x IS NOT NULL)
        |      AS syy
        |  FROM l GROUP BY 1),
        |dd AS (SELECT user_id, n,
        |    CAST(n AS HUGEINT) * sxy - sx * sy AS num,
        |    CAST(n AS HUGEINT) * sxx - sx * sx AS dx,
        |    CAST(n AS HUGEINT) * syy - sy * sy AS dy
        |  FROM a)
        |SELECT user_id, CAST(7 AS INTEGER) AS lag, n AS n_pairs,
        |  CASE WHEN n >= 2 AND dx > 0 AND dy > 0 THEN
        |    ROUND(CAST(num AS DOUBLE) / (sqrt(CAST(dx AS DOUBLE))
        |      * sqrt(CAST(dy AS DOUBLE))), 6) END AS acf
        |FROM dd ORDER BY 1""".stripMargin,

    // the identical strictly-prior conditional-count frame on the
    // orders sort
    "q372_expanding_orders" ->
      """SELECT o_orderkey,
        |  CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN 1 END) OVER w AS BIGINT) AS prior_n_1_urgent,
        |  CAST(COUNT(CASE WHEN o_orderpriority = '2-HIGH'
        |    THEN 1 END) OVER w AS BIGINT) AS prior_n_2_high,
        |  CAST(COUNT(o_orderpriority) OVER w AS BIGINT)
        |    AS prior_n_total
        |FROM orders WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |ORDER BY 1""".stripMargin,

    // the dense CTE grouped by the same integer weekday
    "q371_weekday_activity" ->
      """WITH d AS (SELECT user_id,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |s AS (SELECT user_id, MIN(day) AS f, MAX(day) AS l
        |  FROM d GROUP BY 1),
        |g AS (SELECT user_id, unnest(range(f, l + 1)) AS day
        |  FROM s),
        |dense AS (SELECT g.user_id, g.day,
        |    CAST(COALESCE(d.n, 0) AS BIGINT) AS n
        |  FROM g LEFT JOIN d ON g.user_id = d.user_id
        |    AND g.day = d.day)
        |SELECT user_id, CAST((day + 4) % 7 AS BIGINT) AS dow,
        |  CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(COUNT(CASE WHEN n > 0 THEN 1 END) AS BIGINT)
        |    AS n_active,
        |  ROUND(CAST(COUNT(CASE WHEN n > 0 THEN 1 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS active_rate
        |FROM dense GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the dense CTE + LAG(7), exact integer absolute errors,
    // division inside ROUND
    "q370_seasonal_naive" ->
      """WITH d AS (SELECT user_id,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |s AS (SELECT user_id, MIN(day) AS f, MAX(day) AS l
        |  FROM d GROUP BY 1),
        |g AS (SELECT user_id, unnest(range(f, l + 1)) AS day
        |  FROM s),
        |dense AS (SELECT g.user_id, g.day,
        |    CAST(COALESCE(d.n, 0) AS BIGINT) AS n
        |  FROM g LEFT JOIN d ON g.user_id = d.user_id
        |    AND g.day = d.day),
        |p AS (SELECT user_id, n,
        |    LAG(n, 7) OVER (PARTITION BY user_id ORDER BY day)
        |      AS pred
        |  FROM dense)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(abs(n - pred)) AS BIGINT) AS sae,
        |  ROUND(CAST(SUM(abs(n - pred)) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS mae
        |FROM p WHERE pred IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical day grid, range() dense expansion, zero COALESCE
    "q369_dense_daily" ->
      """WITH d AS (SELECT user_id,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |s AS (SELECT user_id, MIN(day) AS f, MAX(day) AS l
        |  FROM d GROUP BY 1),
        |g AS (SELECT user_id, unnest(range(f, l + 1)) AS day
        |  FROM s)
        |SELECT g.user_id, CAST(g.day AS BIGINT) AS day,
        |  CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
        |FROM g LEFT JOIN d ON g.user_id = d.user_id
        |  AND g.day = d.day
        |ORDER BY 1, 2""".stripMargin,

    // q285's IGNORE NULLS carry restricted to purchases, exact
    // conditional counts, division inside ROUND
    "q362_assisted_conversion" ->
      """WITH e AS (SELECT event_id, user_id, ts, epoch_us(ts) AS t,
        |    event_type FROM events),
        |w AS (SELECT user_id, event_type,
        |    t - LAST_VALUE(CASE WHEN event_type = 'click' THEN t
        |      END IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS us_since_click
        |  FROM e)
        |SELECT user_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(COUNT(CASE WHEN us_since_click <= 1800000000
        |    THEN 1 END) AS BIGINT) AS n_assisted,
        |  ROUND(CAST(COUNT(CASE WHEN us_since_click <= 1800000000
        |      THEN 1 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS assisted_rate
        |FROM w WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical day grid, distinct (entity, day) membership, exact
    // counts, division inside ROUND
    "q361_retention_curve" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |f AS (SELECT user_id, MIN(day) AS fd FROM d GROUP BY 1),
        |o AS (SELECT d.user_id, d.day - f.fd AS off
        |  FROM d JOIN f ON d.user_id = f.user_id),
        |a AS (SELECT
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS cohort,
        |    CAST(COUNT(CASE WHEN off = 1 THEN 1 END) AS BIGINT)
        |      AS r1,
        |    CAST(COUNT(CASE WHEN off = 2 THEN 1 END) AS BIGINT)
        |      AS r2,
        |    CAST(COUNT(CASE WHEN off = 3 THEN 1 END) AS BIGINT)
        |      AS r3,
        |    CAST(COUNT(CASE WHEN off = 7 THEN 1 END) AS BIGINT)
        |      AS r7
        |  FROM o)
        |SELECT CAST(t.o AS INTEGER) AS offset_days,
        |  cohort AS n_cohort,
        |  CASE t.o WHEN 1 THEN r1 WHEN 2 THEN r2 WHEN 3 THEN r3
        |    ELSE r7 END AS n_retained,
        |  ROUND(CASE WHEN cohort > 0 THEN
        |    CAST(CASE t.o WHEN 1 THEN r1 WHEN 2 THEN r2
        |      WHEN 3 THEN r3 ELSE r7 END AS DOUBLE)
        |      / CAST(cohort AS DOUBLE) END, 6) AS retention_rate
        |FROM a, UNNEST([1, 2, 3, 7]) AS t(o)
        |ORDER BY 1""".stripMargin,

    // identical lead-dwell frame, exact HUGEINT bucket sums, share
    // divisions inside ROUND, raw /1e6 total
    "q358_dwell_shares" ->
      """WITH e AS (SELECT user_id, event_type AS t,
        |    epoch_us(ts) AS us, event_id FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |d AS (SELECT user_id, t,
        |    LEAD(us) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) - us AS dw
        |  FROM e),
        |f AS (SELECT user_id, t, dw FROM d WHERE dw IS NOT NULL),
        |r AS (SELECT user_id,
        |    SUM(CASE WHEN t = 'view' THEN CAST(dw AS HUGEINT) END)
        |      AS dv,
        |    SUM(CASE WHEN t = 'click' THEN CAST(dw AS HUGEINT) END)
        |      AS dc,
        |    SUM(CASE WHEN t = 'purchase'
        |      THEN CAST(dw AS HUGEINT) END) AS dp,
        |    SUM(CASE WHEN t IS NULL
        |      OR t NOT IN ('view', 'click', 'purchase')
        |      THEN CAST(dw AS HUGEINT) END) AS dother,
        |    SUM(CAST(dw AS HUGEINT)) AS dtotal
        |  FROM f GROUP BY 1)
        |SELECT user_id,
        |  ROUND(CASE WHEN dtotal > 0 THEN
        |    CAST(COALESCE(dv, 0) AS DOUBLE)
        |      / CAST(dtotal AS DOUBLE) END, 6) AS dwell_share_view,
        |  ROUND(CASE WHEN dtotal > 0 THEN
        |    CAST(COALESCE(dc, 0) AS DOUBLE)
        |      / CAST(dtotal AS DOUBLE) END, 6)
        |    AS dwell_share_click,
        |  ROUND(CASE WHEN dtotal > 0 THEN
        |    CAST(COALESCE(dp, 0) AS DOUBLE)
        |      / CAST(dtotal AS DOUBLE) END, 6)
        |    AS dwell_share_purchase,
        |  ROUND(CASE WHEN dtotal > 0 THEN
        |    CAST(COALESCE(dother, 0) AS DOUBLE)
        |      / CAST(dtotal AS DOUBLE) END, 6)
        |    AS dwell_share_other,
        |  CAST(dtotal AS DOUBLE) / 1e6 AS total_dwell_s
        |FROM r ORDER BY 1""".stripMargin,

    // first-of-type ordinal flags + the strictly-prior running sum
    // on the same (ts, event_id) order
    "q357_expanding_distinct" ->
      """WITH f AS (SELECT event_id, user_id, ts,
        |    CASE WHEN event_type IS NOT NULL AND ROW_NUMBER()
        |      OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts, event_id) = 1
        |    THEN 1 ELSE 0 END AS isf
        |  FROM events)
        |SELECT event_id,
        |  CAST(COALESCE(SUM(isf) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS prior_n_types
        |FROM f ORDER BY 1""".stripMargin,

    // the identical strictly-prior conditional-count window frame
    "q355_expanding_counts" ->
      """SELECT event_id,
        |  CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END)
        |    OVER w AS BIGINT) AS prior_n_view,
        |  CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END)
        |    OVER w AS BIGINT) AS prior_n_click,
        |  CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
        |    OVER w AS BIGINT) AS prior_n_purchase,
        |  CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END)
        |    OVER w AS BIGINT) AS prior_n_error,
        |  CAST(COUNT(event_type) OVER w AS BIGINT) AS prior_n_total
        |FROM events WINDOW w AS (PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |ORDER BY 1""".stripMargin,

    // identical bigram frame (lag of type and instant on one sort),
    // exact HUGEINT gap sums, integer min/max, division in ROUND
    "q325_transition_latency" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS t FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |b AS (SELECT event_type AS cur_type, t,
        |    LAG(event_type) OVER w AS prev_type,
        |    LAG(t) OVER w AS pt
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY t, event_id)),
        |f AS (SELECT prev_type, cur_type, t - pt AS dt FROM b
        |  WHERE prev_type IS NOT NULL)
        |SELECT prev_type, cur_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_steps,
        |  ROUND(CAST(SUM(CAST(dt AS HUGEINT)) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) / 1e6, 6) AS mean_gap_s,
        |  MIN(dt) AS min_gap_us, MAX(dt) AS max_gap_us
        |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // identical (user, dow) exact cell moments and the same
    // (m - mu)/sigma chain inside ROUND
    "q324_seasonal_z" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
        |    CASE WHEN value IS NOT NULL
        |      THEN CAST(round(value * 1e6) AS BIGINT) END AS m
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |pd AS (SELECT user_id, dow,
        |    CAST(COUNT(m) AS BIGINT) AS n_d,
        |    SUM(CAST(m AS HUGEINT)) AS s_d,
        |    SUM(CAST(m AS HUGEINT) * m) AS ss_d
        |  FROM e GROUP BY 1, 2),
        |mm AS (SELECT user_id, dow, n_d,
        |    CAST(s_d AS DOUBLE) / CAST(n_d AS DOUBLE) AS mu,
        |    sqrt(CAST(CAST(n_d AS HUGEINT) * ss_d - s_d * s_d
        |      AS DOUBLE)) / CAST(n_d AS DOUBLE) AS sig
        |  FROM pd)
        |SELECT e.event_id,
        |  ROUND(CASE WHEN e.m IS NOT NULL AND mm.n_d >= 2
        |      AND mm.sig > 0
        |    THEN (CAST(e.m AS DOUBLE) - mm.mu) / mm.sig END, 6)
        |    AS value_dow_z
        |FROM e JOIN mm ON e.user_id = mm.user_id
        |  AND e.dow = mm.dow
        |ORDER BY 1""".stripMargin,

    // q87's weighted-CDF interp CTEs over the gap frame — the same
    // exact-hit/bracket rules, then /1e6 inside ROUND
    "q323_gap_quantiles" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |gp AS (SELECT user_id,
        |    t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) AS v
        |  FROM e),
        |g AS (SELECT user_id AS k, CAST(v AS DOUBLE) AS v,
        |    COUNT(*) AS w
        |  FROM gp WHERE v IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT k, v,
        |    SUM(w) OVER (PARTITION BY k ORDER BY v) * 1.0 /
        |      SUM(w) OVER (PARTITION BY k) AS f
        |  FROM g),
        |b AS (SELECT k,
        |  MAX(CASE WHEN f <= 0.5 THEN f END) AS flo_m,
        |  MAX(CASE WHEN f <= 0.5 THEN v END) AS vlo_m,
        |  MIN(CASE WHEN f >= 0.5 THEN f END) AS fhi_m,
        |  MIN(CASE WHEN f >= 0.5 THEN v END) AS vhi_m,
        |  MAX(CASE WHEN f <= 0.9 THEN f END) AS flo_9,
        |  MAX(CASE WHEN f <= 0.9 THEN v END) AS vlo_9,
        |  MIN(CASE WHEN f >= 0.9 THEN f END) AS fhi_9,
        |  MIN(CASE WHEN f >= 0.9 THEN v END) AS vhi_9
        |  FROM c GROUP BY k)
        |SELECT k AS user_id,
        |  ROUND((CASE WHEN flo_m IS NULL THEN vhi_m
        |    WHEN fhi_m IS NULL OR fhi_m = flo_m THEN vlo_m
        |    ELSE vlo_m + (0.5 - flo_m) / (fhi_m - flo_m)
        |      * (vhi_m - vlo_m) END) / 1e6, 6) AS gap_p50_s,
        |  ROUND((CASE WHEN flo_9 IS NULL THEN vhi_9
        |    WHEN fhi_9 IS NULL OR fhi_9 = flo_9 THEN vlo_9
        |    ELSE vlo_9 + (0.9 - flo_9) / (fhi_9 - flo_9)
        |      * (vhi_9 - vlo_9) END) / 1e6, 6) AS gap_p90_s
        |FROM b ORDER BY 1""".stripMargin,

    // q294's session rollup + one LEAD over the session frame —
    // BIGINT end to end
    "q322_session_gap_label" ->
      """WITH t AS (SELECT user_id, ts, epoch_us(ts) AS us,
        |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         IS NULL
        |    OR date_diff('microsecond',
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
        |       > 1800000000
        |  THEN 1 ELSE 0 END AS is_new
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s AS (SELECT user_id, us,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM t),
        |g AS (SELECT user_id, CAST(sid AS BIGINT) AS session_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    MIN(us) AS st, MAX(us) AS en FROM s GROUP BY 1, 2)
        |SELECT user_id, session_id, n_events,
        |  en - st AS duration_us,
        |  LEAD(st) OVER w - en AS us_to_next_session,
        |  LEAD(st) OVER w IS NULL AS is_last_session
        |FROM g WINDOW w AS (PARTITION BY user_id ORDER BY session_id)
        |ORDER BY 1, 2""".stripMargin,

    // q290's mix SQL re-keyed onto orders/o_orderpriority
    "q321_priority_mix" ->
      """WITH t AS (SELECT o_custkey, o_orderpriority AS ty
        |  FROM orders
        |  WHERE o_custkey IS NOT NULL
        |    AND o_orderpriority IS NOT NULL),
        |pt AS (SELECT o_custkey, ty, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM t GROUP BY 1, 2),
        |ro AS (SELECT o_custkey,
        |    CAST(SUM(n) AS BIGINT) AS n_events,
        |    CAST(COUNT(*) AS BIGINT) AS n_types,
        |    SUM(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS nl
        |  FROM pt GROUP BY 1),
        |tp AS (SELECT o_custkey, ty, n FROM (SELECT o_custkey, ty,
        |    n, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY n DESC, ty ASC) AS rk FROM pt) WHERE rk = 1)
        |SELECT ro.o_custkey, n_events, n_types,
        |  ROUND(ln(CAST(n_events AS DOUBLE))
        |    - nl / CAST(n_events AS DOUBLE), 6) AS type_entropy,
        |  tp.ty AS top_type,
        |  ROUND(CAST(tp.n AS DOUBLE) / CAST(n_events AS DOUBLE), 6)
        |    AS top_share
        |FROM ro JOIN tp USING (o_custkey) ORDER BY 1""".stripMargin,

    // identical log2 bucketing (boundary-exact at powers of two),
    // the same n*256 - b encoding and +63 integer decode
    "q320_gap_cadence" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |g AS (SELECT user_id,
        |    t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) AS dt
        |  FROM e),
        |f AS (SELECT user_id, CASE WHEN dt <= 0 THEN -1
        |    ELSE CAST(floor(log2(CAST(dt AS DOUBLE))) AS BIGINT)
        |    END AS b
        |  FROM g WHERE dt IS NOT NULL),
        |pb AS (SELECT user_id, b, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM f GROUP BY 1, 2),
        |r AS (SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_gaps,
        |    CAST(MAX(n * 256 - b) AS BIGINT) AS e
        |  FROM pb GROUP BY 1)
        |SELECT user_id, n_gaps,
        |  CAST(((e + 63) // 256) * 256 - e AS BIGINT) AS gap_bucket,
        |  ROUND(CAST((e + 63) // 256 AS DOUBLE)
        |    / CAST(n_gaps AS DOUBLE), 6) AS mode_share
        |FROM r ORDER BY 1""".stripMargin,

    // q279's gap-moment SQL re-keyed onto the orders table
    "q319_gap_orders" ->
      """WITH e AS (SELECT o_custkey, epoch_us(o_orderdate) AS t
        |  FROM orders
        |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
        |g AS (SELECT o_custkey,
        |    t - LAG(t) OVER (PARTITION BY o_custkey ORDER BY t)
        |      AS dt
        |  FROM e),
        |a AS (SELECT o_custkey,
        |    CAST(COUNT(dt) AS BIGINT) AS n_gaps,
        |    SUM(CAST(dt AS HUGEINT)) AS sdt,
        |    SUM(CAST(dt AS HUGEINT) * dt) AS sdd
        |  FROM g GROUP BY 1),
        |d AS (SELECT o_custkey, n_gaps,
        |    CAST(sdt AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mu,
        |    sqrt(CAST(CAST(n_gaps AS HUGEINT) * sdd - sdt * sdt
        |        AS DOUBLE)) / CAST(n_gaps AS DOUBLE) AS sig
        |  FROM a)
        |SELECT o_custkey, n_gaps,
        |  CASE WHEN n_gaps >= 1
        |    THEN ROUND(mu / 1e6, 6) END AS mean_gap_s,
        |  CASE WHEN n_gaps >= 1
        |    THEN ROUND(sig / 1e6, 6) END AS std_gap_s,
        |  CASE WHEN n_gaps >= 1 AND mu > 0
        |    THEN ROUND(sig / mu, 6) END AS cv_gap,
        |  CASE WHEN n_gaps >= 1 AND sig + mu > 0
        |    THEN ROUND((sig - mu) / (sig + mu), 6) END AS burstiness
        |FROM d ORDER BY 1""".stripMargin,

    // q288's exact UNROUNDED chains for lags 1 and 2, pivoted, then
    // the same (r2 - r1^2)/(1 - r1^2) expression inside ROUND
    "q316_pacf2" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
        |    CASE WHEN value IS NOT NULL
        |      THEN CAST(round(value * 1e6) AS BIGINT) END AS m
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |l AS (SELECT user_id, m AS y,
        |    LAG(m, 1) OVER w AS x1, LAG(m, 2) OVER w AS x2
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY t, event_id)),
        |a AS (
        |  SELECT user_id, 1 AS lag,
        |    CAST(COUNT(*) FILTER (x1 IS NOT NULL AND y IS NOT NULL)
        |      AS BIGINT) AS n,
        |    SUM(CAST(x1 AS HUGEINT)) FILTER (y IS NOT NULL) AS sx,
        |    SUM(CAST(y AS HUGEINT)) FILTER (x1 IS NOT NULL) AS sy,
        |    SUM(CAST(x1 AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x1 AS HUGEINT) * x1)
        |      FILTER (y IS NOT NULL) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y)
        |      FILTER (x1 IS NOT NULL) AS syy
        |  FROM l GROUP BY 1
        |  UNION ALL
        |  SELECT user_id, 2 AS lag,
        |    CAST(COUNT(*) FILTER (x2 IS NOT NULL AND y IS NOT NULL)
        |      AS BIGINT) AS n,
        |    SUM(CAST(x2 AS HUGEINT)) FILTER (y IS NOT NULL) AS sx,
        |    SUM(CAST(y AS HUGEINT)) FILTER (x2 IS NOT NULL) AS sy,
        |    SUM(CAST(x2 AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x2 AS HUGEINT) * x2)
        |      FILTER (y IS NOT NULL) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y)
        |      FILTER (x2 IS NOT NULL) AS syy
        |  FROM l GROUP BY 1),
        |d AS (SELECT user_id, lag, n,
        |    CAST(n AS HUGEINT) * sxy - sx * sy AS num,
        |    CAST(n AS HUGEINT) * sxx - sx * sx AS dx,
        |    CAST(n AS HUGEINT) * syy - sy * sy AS dy
        |  FROM a),
        |rr AS (SELECT user_id, lag, n,
        |    CASE WHEN n >= 2 AND dx > 0 AND dy > 0 THEN
        |      CAST(num AS DOUBLE) / (sqrt(CAST(dx AS DOUBLE))
        |        * sqrt(CAST(dy AS DOUBLE))) END AS r
        |  FROM d),
        |p AS (SELECT user_id,
        |    MAX(CASE WHEN lag = 1 THEN r END) AS r1,
        |    MAX(CASE WHEN lag = 2 THEN r END) AS r2,
        |    MAX(CASE WHEN lag = 2 THEN n END) AS n2
        |  FROM rr GROUP BY 1)
        |SELECT user_id, CAST(n2 AS BIGINT) AS n_pairs2,
        |  ROUND(r1, 6) AS acf1, ROUND(r2, 6) AS acf2,
        |  CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL
        |      AND 1.0 - r1 * r1 > 0 THEN
        |    ROUND((r2 - r1 * r1) / (1.0 - r1 * r1), 6) END AS pacf2
        |FROM p ORDER BY 1""".stripMargin,

    // identical per-(user, type) running ordinal and first-instant
    // difference — BIGINT end to end
    "q315_type_novelty" ->
      """SELECT event_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id) AS BIGINT) AS type_ordinal,
        |  epoch_us(ts) - MIN(epoch_us(ts)) OVER (
        |    PARTITION BY user_id, event_type ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS us_since_first_of_type
        |FROM events ORDER BY 1""".stripMargin,

    // identical hour-bucket pair join, exact HUGEINT dot/norms, the
    // same cosine chain, and the same (cos DESC, id ASC) row_number
    "q314_profile_neighbors" ->
      """WITH ph AS (SELECT user_id AS e,
        |    CAST(hour(ts) AS BIGINT) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |nm AS (SELECT e, SUM(CAST(n AS HUGEINT) * n) AS nn
        |  FROM ph GROUP BY 1),
        |dt AS (SELECT a.e AS ea, b.e AS eb,
        |    SUM(CAST(a.n AS HUGEINT) * b.n) AS num
        |  FROM ph a JOIN ph b ON a.h = b.h AND a.e != b.e
        |  GROUP BY 1, 2),
        |sc AS (SELECT ea, eb,
        |    CAST(num AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE))
        |      * sqrt(CAST(nb.nn AS DOUBLE))) AS cosine
        |  FROM dt JOIN nm na ON dt.ea = na.e
        |    JOIN nm nb ON dt.eb = nb.e),
        |r AS (SELECT ea, eb, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY ea
        |      ORDER BY cosine DESC, eb ASC) AS rk FROM sc)
        |SELECT ea AS user_id, CAST(rk AS INTEGER) AS rank,
        |  eb AS neighbor, ROUND(cosine, 6) AS cosine
        |FROM r WHERE rk <= 3 ORDER BY 1, 2""".stripMargin,

    // identical self-exclusion arithmetic: (s_d - m)/(n_d - 1) on
    // exact integers, then the same subtraction inside ROUND
    "q312_loo_seasonal" ->
      """WITH e AS (SELECT event_id, user_id, value,
        |    CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
        |    CASE WHEN value IS NOT NULL
        |      THEN CAST(round(value * 1e6) AS BIGINT) END AS m
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |pd AS (SELECT user_id, dow,
        |    CAST(COUNT(m) AS BIGINT) AS n_d,
        |    SUM(CAST(m AS HUGEINT)) AS s_d
        |  FROM e GROUP BY 1, 2),
        |j AS (SELECT e.event_id, e.value, e.m, pd.n_d, pd.s_d
        |  FROM e JOIN pd ON e.user_id = pd.user_id
        |    AND e.dow = pd.dow),
        |r AS (SELECT event_id, value, m,
        |    n_d - (CASE WHEN m IS NOT NULL THEN 1 ELSE 0 END) AS den,
        |    s_d - COALESCE(m, 0) AS rest FROM j)
        |SELECT event_id,
        |  ROUND(CASE WHEN den > 0 THEN CAST(rest AS DOUBLE)
        |    / CAST(den AS DOUBLE) / 1e6 END, 6) AS dow_mean_loo,
        |  ROUND(value - CASE WHEN den > 0 THEN CAST(rest AS DOUBLE)
        |    / CAST(den AS DOUBLE) / 1e6 END, 6) AS value_loo_resid
        |FROM r ORDER BY 1""".stripMargin,

    // q287's exact (user, dow) micro-sum chain, unrounded, joined
    // back to events; the same value - mean double subtraction
    "q311_seasonal_residual" ->
      """WITH e AS (SELECT event_id, user_id, value,
        |    CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
        |    CASE WHEN value IS NOT NULL
        |      THEN CAST(round(value * 1e6) AS BIGINT) END AS m
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |pd AS (SELECT user_id, dow,
        |    CAST(COUNT(m) AS BIGINT) AS n_d,
        |    SUM(CAST(m AS HUGEINT)) AS s_d
        |  FROM e GROUP BY 1, 2),
        |mm AS (SELECT user_id, dow,
        |    CASE WHEN n_d > 0 THEN CAST(s_d AS DOUBLE)
        |      / CAST(n_d AS DOUBLE) / 1e6 END AS dmean
        |  FROM pd)
        |SELECT e.event_id, ROUND(mm.dmean, 6) AS dow_mean,
        |  ROUND(e.value - mm.dmean, 6) AS value_dow_resid
        |FROM e JOIN mm ON e.user_id = mm.user_id
        |  AND e.dow = mm.dow
        |ORDER BY 1""".stripMargin,

    // identical distinct-day frame, the same lag/gap classification
    // and per-day exact counts
    "q309_growth_accounting" ->
      """WITH e AS (SELECT user_id,
        |    epoch_us(ts) // 86400000000 AS d
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |days AS (SELECT DISTINCT user_id, d FROM e),
        |s AS (SELECT d,
        |    CASE WHEN LAG(d) OVER w IS NULL THEN 'new'
        |      WHEN d - LAG(d) OVER w > 30 THEN 'resurrected'
        |      ELSE 'returning' END AS st
        |  FROM days WINDOW w AS (PARTITION BY user_id ORDER BY d))
        |SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS dau,
        |  CAST(COUNT(CASE WHEN st = 'new' THEN 1 END) AS BIGINT)
        |    AS n_new,
        |  CAST(COUNT(CASE WHEN st = 'returning' THEN 1 END)
        |    AS BIGINT) AS n_returning,
        |  CAST(COUNT(CASE WHEN st = 'resurrected' THEN 1 END)
        |    AS BIGINT) AS n_resurrected
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical pairwise-complete exact moments (q288's FILTER
    // pattern) and the same corr/beta double chains inside ROUND
    "q308_corr_by_group" ->
      """WITH e AS (SELECT event_type AS k,
        |    CASE WHEN value IS NOT NULL
        |      THEN CAST(round(value * 1e6) AS BIGINT) END AS x,
        |    CASE WHEN ts IS NOT NULL
        |      THEN CAST(round(CAST(hour(ts) AS DOUBLE) * 1e6)
        |        AS BIGINT) END AS y
        |  FROM events WHERE event_type IS NOT NULL),
        |a AS (SELECT k,
        |    CAST(COUNT(*) FILTER (x IS NOT NULL AND y IS NOT NULL)
        |      AS BIGINT) AS n,
        |    SUM(CAST(x AS HUGEINT)) FILTER (y IS NOT NULL) AS sx,
        |    SUM(CAST(y AS HUGEINT)) FILTER (x IS NOT NULL) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x)
        |      FILTER (y IS NOT NULL) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y)
        |      FILTER (x IS NOT NULL) AS syy
        |  FROM e GROUP BY 1),
        |d AS (SELECT k, n,
        |    CAST(n AS HUGEINT) * sxy - sx * sy AS num,
        |    CAST(n AS HUGEINT) * sxx - sx * sx AS dx,
        |    CAST(n AS HUGEINT) * syy - sy * sy AS dy
        |  FROM a)
        |SELECT k AS event_type, n AS n_pairs,
        |  CASE WHEN n >= 2 AND dx > 0 AND dy > 0 THEN
        |    ROUND(CAST(num AS DOUBLE) / (sqrt(CAST(dx AS DOUBLE))
        |      * sqrt(CAST(dy AS DOUBLE))), 6) END AS corr,
        |  CASE WHEN n >= 2 AND dx > 0 THEN
        |    ROUND(CAST(num AS DOUBLE) / CAST(dx AS DOUBLE), 6) END
        |    AS beta_yx
        |FROM d ORDER BY 1""".stripMargin,

    // identical micro rounding of value/500, exact HUGEINT squared
    // deviations, and the same base-rate/brier/skill double chains
    "q307_brier" ->
      """WITH e AS (SELECT event_type AS k,
        |    CAST(round(value / 500.0 * 1e6) AS BIGINT) AS mp,
        |    CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS y
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |a AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS sy,
        |    SUM(CAST(mp - y * 1000000 AS HUGEINT)
        |      * (mp - y * 1000000)) AS sd2
        |  FROM e GROUP BY 1),
        |m AS (SELECT k, n,
        |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS br,
        |    CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE) / 1e12 AS brier
        |  FROM a)
        |SELECT k AS event_type, n,
        |  ROUND(br, 6) AS base_rate,
        |  ROUND(brier, 6) AS brier,
        |  ROUND(br * (1.0 - br), 6) AS brier_ref,
        |  CASE WHEN br * (1.0 - br) > 0 THEN
        |    ROUND(1.0 - brier / (br * (1.0 - br)), 6) END
        |    AS brier_skill
        |FROM m ORDER BY 1""".stripMargin,

    // DuckDB's literal NTILE must agree with the integer replica
    // bucket-for-bucket; identical cumulative sums and the same
    // cross-multiplied lift divisions inside ROUND
    "q306_gains_table" ->
      """WITH e AS (SELECT event_id, value AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
        |b AS (SELECT NTILE(10) OVER (ORDER BY s DESC, event_id)
        |    AS bin, y FROM e),
        |g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS n_pos FROM b GROUP BY 1),
        |c AS (SELECT bin, n, n_pos,
        |    SUM(n) OVER w AS cum_n, SUM(n_pos) OVER w AS cum_pos,
        |    SUM(n) OVER () AS tot_n, SUM(n_pos) OVER () AS tot_p
        |  FROM g WINDOW w AS (ORDER BY bin
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT CAST(bin AS INTEGER) AS bin, n, n_pos,
        |  ROUND(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS pos_rate,
        |  CAST(cum_n AS BIGINT) AS cum_n,
        |  CAST(cum_pos AS BIGINT) AS cum_pos,
        |  CASE WHEN tot_p > 0 THEN ROUND(CAST(cum_pos AS DOUBLE)
        |    / CAST(tot_p AS DOUBLE), 6) END AS capture_rate,
        |  CASE WHEN tot_p > 0 AND cum_n > 0 THEN
        |    ROUND(CAST(cum_pos * tot_n AS DOUBLE)
        |      / CAST(cum_n * tot_p AS DOUBLE), 6) END AS cum_lift
        |FROM c ORDER BY 1""".stripMargin,

    // identical ascending rank (tie-order-invariant sums), the same
    // exact HUGEINT rank moments and ceil(n/10) integer whale cut
    "q305_inequality" ->
      """WITH e AS (SELECT user_id,
        |    CASE WHEN value IS NOT NULL
        |      THEN CAST(round(value * 1e6) AS BIGINT) END AS m
        |  FROM events WHERE user_id IS NOT NULL),
        |o AS (SELECT user_id, m FROM e WHERE m IS NOT NULL),
        |r AS (SELECT user_id, m,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY m ASC) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM o),
        |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    SUM(CAST(m AS HUGEINT)) AS s,
        |    SUM(CAST(rn AS HUGEINT) * m) AS si,
        |    SUM(CASE WHEN rn > n - (n + 9) // 10
        |      THEN CAST(m AS HUGEINT) END) AS stop,
        |    MIN(m) AS mn
        |  FROM r GROUP BY 1)
        |SELECT user_id, n_obs,
        |  CASE WHEN s > 0 AND mn >= 0 THEN
        |    ROUND(CAST(2 * si - (CAST(n_obs AS HUGEINT) + 1) * s
        |        AS DOUBLE)
        |      / CAST(CAST(n_obs AS HUGEINT) * s AS DOUBLE), 6) END
        |    AS gini,
        |  CASE WHEN s > 0 AND mn >= 0 THEN
        |    ROUND(CAST(stop AS DOUBLE) / CAST(s AS DOUBLE), 6) END
        |    AS top_decile_share
        |FROM a ORDER BY 1""".stripMargin,

    // identical strict t - t0 < 7d integer comparison, exact share
    // division, and the same span/86400e6 truncation
    "q302_activation_profile" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |a AS (SELECT user_id, t,
        |    MIN(t) OVER (PARTITION BY user_id) AS t0 FROM e),
        |g AS (SELECT user_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_total,
        |    CAST(COUNT(CASE WHEN t - t0 < 604800000000 THEN 1 END)
        |      AS BIGINT) AS n_first_window,
        |    MAX(t) - MIN(t) AS span FROM a GROUP BY 1)
        |SELECT user_id, n_total, n_first_window,
        |  ROUND(CAST(n_first_window AS DOUBLE)
        |    / CAST(n_total AS DOUBLE), 6) AS first_window_share,
        |  CAST(trunc(CAST(span AS DOUBLE) / 86400000000.0)
        |    AS BIGINT) AS lifetime_days
        |FROM g ORDER BY 1""".stripMargin,

    // identical (user, type) HUGEINT micro sums and the same
    // cross-multiplied HHI / top-share double divisions
    "q301_value_hhi" ->
      """WITH e AS (SELECT user_id, event_type AS ty,
        |    CASE WHEN value IS NOT NULL
        |      THEN CAST(round(value * 1e6) AS BIGINT) END AS m
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |pt AS (SELECT user_id, ty, SUM(CAST(m AS HUGEINT)) AS s
        |  FROM e GROUP BY 1, 2),
        |pf AS (SELECT * FROM pt WHERE s IS NOT NULL),
        |r AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_types,
        |    SUM(s) AS tot, SUM(s * s) AS ss,
        |    MAX(s) AS top, MIN(s) AS mn
        |  FROM pf GROUP BY 1)
        |SELECT user_id, n_types,
        |  CASE WHEN tot > 0 AND mn >= 0 THEN
        |    ROUND(CAST(ss AS DOUBLE) / CAST(tot * tot AS DOUBLE), 6)
        |    END AS hhi,
        |  CASE WHEN tot > 0 AND mn >= 0 THEN
        |    ROUND(CAST(top AS DOUBLE) / CAST(tot AS DOUBLE), 6)
        |    END AS top_share
        |FROM r ORDER BY 1""".stripMargin,

    // identical first-instant centering, the same five expanding
    // HUGEINT moments, and the same num/den*86400 chain inside ROUND
    "q299_expanding_trend" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t,
        |    CASE WHEN value IS NOT NULL
        |      THEN CAST(round(value * 1e6) AS BIGINT) END AS m
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |a AS (SELECT event_id, user_id, t, m,
        |    t - FIRST_VALUE(t) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS ct
        |  FROM e),
        |b AS (SELECT event_id, m,
        |    COUNT(CASE WHEN m IS NOT NULL THEN 1 END) OVER wr AS n,
        |    SUM(CASE WHEN m IS NOT NULL
        |      THEN CAST(ct AS HUGEINT) END) OVER wr AS st,
        |    SUM(CAST(m AS HUGEINT)) OVER wr AS sv,
        |    SUM(CASE WHEN m IS NOT NULL
        |      THEN CAST(ct AS HUGEINT) * ct END) OVER wr AS stt,
        |    SUM(CAST(ct AS HUGEINT) * m) OVER wr AS stv
        |  FROM a WINDOW wr AS (PARTITION BY user_id
        |    ORDER BY t, event_id ROWS UNBOUNDED PRECEDING))
        |SELECT event_id,
        |  CASE WHEN m IS NOT NULL AND n >= 2
        |      AND CAST(n AS HUGEINT) * stt - st * st > 0 THEN
        |    ROUND(CAST(CAST(n AS HUGEINT) * stv - st * sv AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * stt - st * st AS DOUBLE)
        |      * 86400.0, 6) END AS trend_per_day
        |FROM b ORDER BY 1""".stripMargin,

    // q39's session SQL -> per-session counts/durations -> the
    // same exact per-user rollup and division chains inside ROUND
    "q294_session_profile" ->
      """WITH t AS (SELECT user_id, ts, epoch_us(ts) AS us,
        |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         IS NULL
        |    OR date_diff('microsecond',
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
        |       > 1800000000
        |  THEN 1 ELSE 0 END AS is_new
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s AS (SELECT user_id, us,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM t),
        |g AS (SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS ne,
        |    MAX(us) - MIN(us) AS dur FROM s GROUP BY 1, 2),
        |a AS (SELECT user_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |    CAST(SUM(ne) AS BIGINT) AS n_events,
        |    CAST(COUNT(CASE WHEN ne = 1 THEN 1 END) AS BIGINT) AS b,
        |    SUM(CAST(dur AS HUGEINT)) AS dur
        |  FROM g GROUP BY 1)
        |SELECT user_id, n_sessions, n_events,
        |  ROUND(CAST(b AS DOUBLE) / CAST(n_sessions AS DOUBLE), 6)
        |    AS bounce_share,
        |  ROUND(CAST(n_events AS DOUBLE)
        |    / CAST(n_sessions AS DOUBLE), 6) AS mean_events,
        |  ROUND(CAST(dur AS DOUBLE) / CAST(n_sessions AS DOUBLE)
        |    / 1e6, 6) AS mean_duration_s
        |FROM a ORDER BY 1""".stripMargin,

    // identical (type, day) counts on the integer day grid, the
    // same strictly-prior expanding exact moments and z chain
    "q293_volume_anomaly" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_us(ts) // 86400000000 AS day
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |d AS (SELECT k, day, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM e GROUP BY 1, 2),
        |w AS (SELECT k, day, n_events,
        |    COUNT(n_events) OVER wp AS kk,
        |    SUM(CAST(n_events AS HUGEINT)) OVER wp AS s,
        |    SUM(CAST(n_events AS HUGEINT) * n_events) OVER wp AS ss
        |  FROM d WINDOW wp AS (PARTITION BY k ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT k, day, n_events, kk,
        |    CAST(s AS DOUBLE) / CAST(kk AS DOUBLE) AS mu,
        |    sqrt(CAST(CAST(kk AS HUGEINT) * ss - s * s AS DOUBLE))
        |      / CAST(kk AS DOUBLE) AS sig
        |  FROM w)
        |SELECT k AS event_type, day, n_events,
        |  CASE WHEN kk >= 1 THEN ROUND(mu, 6) END AS expected,
        |  CASE WHEN kk >= 2 AND sig > 0 THEN
        |    ROUND((CAST(n_events AS DOUBLE) - mu) / sig, 6) END
        |    AS vol_z
        |FROM z ORDER BY 1, 2""".stripMargin,

    // identical observed-prior sign carries, the same run-boundary
    // running sum, and the same (user, run) window count
    "q292_monotone_run" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t,
        |    CASE WHEN value IS NOT NULL
        |      THEN CAST(round(value * 1e6) AS BIGINT) END AS m
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s1 AS (SELECT event_id, user_id, t, m,
        |    LAST_VALUE(m IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS pv
        |  FROM e),
        |s2 AS (SELECT event_id, user_id, t,
        |    CASE WHEN m IS NOT NULL AND pv IS NOT NULL
        |      THEN CAST(sign(m - pv) AS INTEGER) END AS dir
        |  FROM s1),
        |s3 AS (SELECT event_id, user_id, t, dir,
        |    LAST_VALUE(dir IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS pd
        |  FROM s2),
        |s4 AS (SELECT event_id, user_id, t, dir,
        |    SUM(CASE WHEN dir IS NOT NULL
        |        AND (pd IS NULL OR dir != pd) THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY t, event_id
        |        ROWS UNBOUNDED PRECEDING) AS run
        |  FROM s3),
        |s5 AS (SELECT event_id, dir,
        |    CAST(COUNT(dir) OVER (PARTITION BY user_id, run
        |      ORDER BY t, event_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS rl
        |  FROM s4)
        |SELECT event_id, dir AS value_dir,
        |  CASE WHEN dir IS NOT NULL THEN rl END AS value_dir_run
        |FROM s5 ORDER BY 1""".stripMargin,

    // identical exact micro moments, the same mu/sigma chains, and
    // the same |m - mu| > 3 sigma double comparison on both engines
    "q291_sigma_outliers" ->
      """WITH e AS (SELECT user_id,
        |    CASE WHEN value IS NOT NULL
        |      THEN CAST(round(value * 1e6) AS BIGINT) END AS m
        |  FROM events WHERE user_id IS NOT NULL),
        |st AS (SELECT user_id, CAST(COUNT(m) AS BIGINT) AS n_obs,
        |    SUM(CAST(m AS HUGEINT)) AS s,
        |    SUM(CAST(m AS HUGEINT) * m) AS ss
        |  FROM e GROUP BY 1),
        |ms AS (SELECT user_id, n_obs,
        |    CAST(s AS DOUBLE) / CAST(n_obs AS DOUBLE) AS mu,
        |    sqrt(CAST(CAST(n_obs AS HUGEINT) * ss - s * s
        |      AS DOUBLE)) / CAST(n_obs AS DOUBLE) AS sig
        |  FROM st),
        |o AS (SELECT e.user_id,
        |    CAST(COUNT(CASE WHEN m IS NOT NULL
        |      AND abs(CAST(m AS DOUBLE) - mu) > 3.0 * sig
        |      THEN 1 END) AS BIGINT) AS n_outliers
        |  FROM e JOIN ms USING (user_id) GROUP BY 1)
        |SELECT ms.user_id, n_obs,
        |  CASE WHEN n_obs > 0
        |    THEN ROUND(mu / 1e6, 6) END AS mean,
        |  CASE WHEN n_obs > 0
        |    THEN ROUND(sig / 1e6, 6) END AS std,
        |  n_outliers,
        |  CASE WHEN n_obs > 0 THEN ROUND(CAST(n_outliers AS DOUBLE)
        |    / CAST(n_obs AS DOUBLE), 6) END AS outlier_share
        |FROM ms JOIN o USING (user_id) ORDER BY 1""".stripMargin,

    // identical (user, type) counts, the same entropy rearrangement
    // ln(N) - sum(n ln n)/N, and the same two-phase (n DESC, type
    // ASC) rank for the top type
    "q290_type_mix" ->
      """WITH t AS (SELECT user_id, event_type AS ty FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |pt AS (SELECT user_id, ty, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM t GROUP BY 1, 2),
        |ro AS (SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
        |    CAST(COUNT(*) AS BIGINT) AS n_types,
        |    SUM(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS nl
        |  FROM pt GROUP BY 1),
        |tp AS (SELECT user_id, ty, n FROM (SELECT user_id, ty, n,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY n DESC, ty ASC) AS rk FROM pt) WHERE rk = 1)
        |SELECT ro.user_id, n_events, n_types,
        |  ROUND(ln(CAST(n_events AS DOUBLE))
        |    - nl / CAST(n_events AS DOUBLE), 6) AS type_entropy,
        |  tp.ty AS top_type,
        |  ROUND(CAST(tp.n AS DOUBLE) / CAST(n_events AS DOUBLE), 6)
        |    AS top_share
        |FROM ro JOIN tp USING (user_id) ORDER BY 1""".stripMargin,

    // identical day-grid islands (d - ROW_NUMBER constant) and the
    // same arg-max on the per-entity-unique run end day
    "q289_streak_stats" ->
      """WITH e AS (SELECT user_id,
        |    epoch_us(ts) // 86400000000 AS d
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |days AS (SELECT DISTINCT user_id, d FROM e),
        |i AS (SELECT user_id, d,
        |    d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
        |      AS isl
        |  FROM days),
        |r AS (SELECT user_id, isl, CAST(COUNT(*) AS BIGINT) AS len,
        |    MAX(d) AS ed FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
        |  CAST(COUNT(*) AS BIGINT) AS n_streaks,
        |  CAST(MAX(len) AS BIGINT) AS max_streak_days,
        |  CAST(arg_max(len, ed) AS BIGINT) AS last_streak_days
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical row-lag pairing (LAG counts rows, null values make
    // a pair invalid), identical exact HUGEINT pair moments, and
    // the same num/(sqrt*sqrt) double chain inside ROUND
    "q288_lag_autocorr" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
        |    CASE WHEN value IS NOT NULL
        |      THEN CAST(round(value * 1e6) AS BIGINT) END AS m
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |l AS (SELECT user_id, m AS y,
        |    LAG(m, 1) OVER w AS x1, LAG(m, 7) OVER w AS x7
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY t, event_id)),
        |a AS (
        |  SELECT user_id, 1 AS lag,
        |    CAST(COUNT(*) FILTER (x1 IS NOT NULL AND y IS NOT NULL)
        |      AS BIGINT) AS n,
        |    SUM(CAST(x1 AS HUGEINT))
        |      FILTER (y IS NOT NULL) AS sx,
        |    SUM(CAST(y AS HUGEINT))
        |      FILTER (x1 IS NOT NULL) AS sy,
        |    SUM(CAST(x1 AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x1 AS HUGEINT) * x1)
        |      FILTER (y IS NOT NULL) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y)
        |      FILTER (x1 IS NOT NULL) AS syy
        |  FROM l GROUP BY 1
        |  UNION ALL
        |  SELECT user_id, 7 AS lag,
        |    CAST(COUNT(*) FILTER (x7 IS NOT NULL AND y IS NOT NULL)
        |      AS BIGINT) AS n,
        |    SUM(CAST(x7 AS HUGEINT))
        |      FILTER (y IS NOT NULL) AS sx,
        |    SUM(CAST(y AS HUGEINT))
        |      FILTER (x7 IS NOT NULL) AS sy,
        |    SUM(CAST(x7 AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x7 AS HUGEINT) * x7)
        |      FILTER (y IS NOT NULL) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y)
        |      FILTER (x7 IS NOT NULL) AS syy
        |  FROM l GROUP BY 1),
        |d AS (SELECT user_id, lag, n,
        |    CAST(n AS HUGEINT) * sxy - sx * sy AS num,
        |    CAST(n AS HUGEINT) * sxx - sx * sx AS dx,
        |    CAST(n AS HUGEINT) * syy - sy * sy AS dy
        |  FROM a)
        |SELECT user_id, CAST(lag AS INTEGER) AS lag,
        |  n AS n_pairs,
        |  CASE WHEN n >= 2 AND dx > 0 AND dy > 0 THEN
        |    ROUND(CAST(num AS DOUBLE) / (sqrt(CAST(dx AS DOUBLE))
        |      * sqrt(CAST(dy AS DOUBLE))), 6) END AS acf
        |FROM d ORDER BY 1, 2""".stripMargin,

    // identical dow grid (+1 to Spark's Sunday=1), exact HUGEINT
    // micro sums, and the same mean/delta/cross-multiplied chains
    "q287_dow_seasonal" ->
      """WITH e AS (SELECT user_id,
        |    CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
        |    CASE WHEN value IS NOT NULL
        |      THEN CAST(round(value * 1e6) AS BIGINT) END AS m
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |pd AS (SELECT user_id, dow,
        |    CAST(COUNT(m) AS BIGINT) AS n_d,
        |    SUM(CAST(m AS HUGEINT)) AS s_d
        |  FROM e GROUP BY 1, 2),
        |pe AS (SELECT user_id, CAST(SUM(n_d) AS BIGINT) AS n,
        |    SUM(s_d) AS s FROM pd GROUP BY 1)
        |SELECT pd.user_id, pd.dow, pd.n_d,
        |  CASE WHEN n_d > 0 THEN ROUND(CAST(s_d AS DOUBLE)
        |    / CAST(n_d AS DOUBLE) / 1e6, 6) END AS dow_mean,
        |  ROUND((CASE WHEN n_d > 0 THEN CAST(s_d AS DOUBLE)
        |      / CAST(n_d AS DOUBLE) / 1e6 END)
        |    - (CASE WHEN n > 0 THEN CAST(s AS DOUBLE)
        |      / CAST(n AS DOUBLE) / 1e6 END), 6) AS dow_delta,
        |  CASE WHEN n_d > 0 AND s IS NOT NULL AND s != 0 THEN
        |    ROUND(CAST(s_d * n AS DOUBLE)
        |      / CAST(CAST(n_d AS HUGEINT) * s AS DOUBLE), 6) END
        |    AS dow_index
        |FROM pd JOIN pe USING (user_id) ORDER BY 1, 2""".stripMargin,

    // identical weekend grid (Sun/Sat), exact conditional HUGEINT
    // micro sums, and the same per-side division chains inside ROUND
    "q286_weekpart_profile" ->
      """WITH e AS (SELECT user_id,
        |    CASE WHEN value IS NOT NULL
        |      THEN CAST(round(value * 1e6) AS BIGINT) END AS m,
        |    dayofweek(ts) IN (0, 6) AS we
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |a AS (SELECT user_id,
        |    CAST(COUNT(CASE WHEN NOT we THEN m END) AS BIGINT)
        |      AS n_weekday,
        |    CAST(COUNT(CASE WHEN we THEN m END) AS BIGINT)
        |      AS n_weekend,
        |    SUM(CASE WHEN NOT we THEN CAST(m AS HUGEINT) END) AS swd,
        |    SUM(CASE WHEN we THEN CAST(m AS HUGEINT) END) AS swe
        |  FROM e GROUP BY 1)
        |SELECT user_id, n_weekday, n_weekend,
        |  CASE WHEN n_weekday > 0 THEN ROUND(CAST(swd AS DOUBLE)
        |    / CAST(n_weekday AS DOUBLE) / 1e6, 6) END AS mean_weekday,
        |  CASE WHEN n_weekend > 0 THEN ROUND(CAST(swe AS DOUBLE)
        |    / CAST(n_weekend AS DOUBLE) / 1e6, 6) END AS mean_weekend,
        |  CASE WHEN n_weekday + n_weekend > 0 THEN
        |    ROUND(CAST(n_weekend AS DOUBLE)
        |      / CAST(n_weekday + n_weekend AS DOUBLE), 6) END
        |    AS weekend_share,
        |  CASE WHEN n_weekend > 0 AND n_weekday > 0 THEN
        |    ROUND(CAST(swe AS DOUBLE) / CAST(n_weekend AS DOUBLE)
        |        / 1e6
        |      - CAST(swd AS DOUBLE) / CAST(n_weekday AS DOUBLE)
        |        / 1e6, 6) END AS weekend_contrast
        |FROM a ORDER BY 1""".stripMargin,

    // identical strictly-prior IGNORE NULLS carries per type; null
    // timestamps contribute nothing on either engine
    "q285_recency_by_type" ->
      """WITH e AS (SELECT event_id, user_id, ts, epoch_us(ts) AS t,
        |    event_type FROM events)
        |SELECT event_id,
        |  t - LAST_VALUE(CASE WHEN event_type = 'purchase' THEN t
        |    END IGNORE NULLS) OVER w AS us_since_purchase,
        |  t - LAST_VALUE(CASE WHEN event_type = 'click' THEN t
        |    END IGNORE NULLS) OVER w AS us_since_click,
        |  t - LAST_VALUE(CASE WHEN event_type = 'error' THEN t
        |    END IGNORE NULLS) OVER w AS us_since_error
        |FROM e WINDOW w AS (PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |ORDER BY 1""".stripMargin,

    // identical sorted trailing frame (NaN/null filtered), the same
    // interp median on it and on the |x-med| transform, the same
    // (v-med)/(1.4826*mad) chain — list lambdas replay Spark's
    // array ops exactly
    "q284_rolling_robust_z" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t,
        |    CASE WHEN isnan(value) THEN NULL ELSE value END AS v
        |  FROM events),
        |f AS (SELECT event_id, v,
        |    list_sort(list(v) FILTER (v IS NOT NULL) OVER (
        |      PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS arr
        |  FROM e),
        |m AS (SELECT event_id, v, arr, len(arr) AS n,
        |    CAST((len(arr) - 1) AS DOUBLE) * 0.5 AS pos
        |  FROM f),
        |md AS (SELECT event_id, v, arr, n,
        |    CASE WHEN n = 0 THEN NULL
        |      WHEN pos = floor(pos) THEN
        |        arr[CAST(floor(pos) AS INTEGER) + 1]
        |      ELSE arr[CAST(floor(pos) AS INTEGER) + 1]
        |        + (arr[least(CAST(floor(pos) AS INTEGER) + 2, n)]
        |           - arr[CAST(floor(pos) AS INTEGER) + 1])
        |          * (pos - floor(pos)) END AS med
        |  FROM m),
        |ab AS (SELECT event_id, v, med,
        |    list_sort(list_transform(arr, x -> abs(x - med))) AS aa,
        |    n, CAST((n - 1) AS DOUBLE) * 0.5 AS pos
        |  FROM md),
        |mm AS (SELECT event_id, v, med,
        |    CASE WHEN n = 0 THEN NULL
        |      WHEN pos = floor(pos) THEN
        |        aa[CAST(floor(pos) AS INTEGER) + 1]
        |      ELSE aa[CAST(floor(pos) AS INTEGER) + 1]
        |        + (aa[least(CAST(floor(pos) AS INTEGER) + 2, n)]
        |           - aa[CAST(floor(pos) AS INTEGER) + 1])
        |          * (pos - floor(pos)) END AS mad
        |  FROM ab)
        |SELECT event_id, ROUND(med, 6) AS value_rmed,
        |  ROUND(CASE WHEN v IS NOT NULL AND med IS NOT NULL
        |    AND mad > 0 THEN (v - med) / (1.4826 * mad) END, 6)
        |    AS value_robust_z
        |FROM mm ORDER BY 1""".stripMargin,

    // q39's session SQL + the same (user, session) ordinal window
    // and running session-start min — BIGINT end to end
    "q283_session_position" ->
      """WITH t AS (SELECT event_id, user_id, ts, epoch_us(ts) AS us,
        |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         IS NULL
        |    OR date_diff('microsecond',
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
        |       > 1800000000
        |  THEN 1 ELSE 0 END AS is_new
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s AS (SELECT event_id, user_id, us,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM t)
        |SELECT event_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id, sid
        |    ORDER BY us, event_id) AS BIGINT) AS session_event_seq,
        |  us - MIN(us) OVER (PARTITION BY user_id, sid
        |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
        |    AS us_into_session
        |FROM s ORDER BY 1""".stripMargin,

    // identical (entity,hour)/entity/hour/global exact counts and
    // the same cross-multiplied double divisions inside ROUND
    "q282_hour_lift" ->
      """WITH e AS (SELECT user_id,
        |    CAST(hour(ts) AS BIGINT) AS hh FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |eh AS (SELECT user_id, hh, CAST(COUNT(*) AS BIGINT) AS n_eh
        |  FROM e GROUP BY 1, 2),
        |pe AS (SELECT user_id, CAST(SUM(n_eh) AS BIGINT) AS n_e
        |  FROM eh GROUP BY 1),
        |ph AS (SELECT hh, CAST(SUM(n_eh) AS BIGINT) AS n_gh
        |  FROM eh GROUP BY 1),
        |g AS (SELECT CAST(SUM(n_gh) AS BIGINT) AS n_g FROM ph)
        |SELECT eh.user_id, eh.hh, eh.n_eh, pe.n_e,
        |  ROUND(CAST(eh.n_eh AS DOUBLE) / CAST(pe.n_e AS DOUBLE), 6)
        |    AS share,
        |  ROUND(CAST(CAST(eh.n_eh AS HUGEINT) * g.n_g AS DOUBLE)
        |    / CAST(CAST(pe.n_e AS HUGEINT) * ph.n_gh AS DOUBLE), 6)
        |    AS lift
        |FROM eh JOIN pe USING (user_id) JOIN ph USING (hh), g
        |ORDER BY 1, 2""".stripMargin,

    // identical rank-among-non-null arithmetic: RANK minus the
    // partition null count, one (rk-1)/(n-1) double division
    "q281_rank_normalize" ->
      """WITH r AS (SELECT event_id, value,
        |    RANK() OVER (PARTITION BY user_id
        |      ORDER BY value ASC NULLS FIRST) AS rk,
        |    SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id) AS nn,
        |    COUNT(value) OVER (PARTITION BY user_id) AS n
        |  FROM events)
        |SELECT event_id,
        |  CASE WHEN value IS NOT NULL AND n >= 2 THEN
        |    ROUND(CAST(rk - nn - 1 AS DOUBLE)
        |      / CAST(n - 1 AS DOUBLE), 6) END AS value_pct
        |FROM r ORDER BY 1""".stripMargin,

    // identical distinct-day islands over the same integer day grid
    // and the same (entity, day) attach join — BIGINT end to end
    "q280_day_streak" ->
      """WITH e AS (SELECT event_id, user_id,
        |    epoch_us(ts) // 86400000000 AS d
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |days AS (SELECT DISTINCT user_id, d FROM e),
        |s AS (SELECT user_id, d,
        |    CASE WHEN LAG(d) OVER w IS NULL
        |        OR d != LAG(d) OVER w + 1 THEN d END AS st
        |  FROM days WINDOW w AS (PARTITION BY user_id ORDER BY d)),
        |r AS (SELECT user_id, d,
        |    d - LAST_VALUE(st IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY d
        |      ROWS UNBOUNDED PRECEDING) + 1 AS streak_days
        |  FROM s)
        |SELECT e.event_id,
        |  CAST(r.streak_days AS BIGINT) AS streak_days
        |FROM e JOIN r ON e.user_id = r.user_id AND e.d = r.d
        |ORDER BY 1""".stripMargin,

    // identical telescoped/exact integer gap moments (HUGEINT vs
    // decimal(38,0)) and the same mu/sigma/cv/B double chains —
    // sqrt is correctly rounded on both engines
    "q279_burstiness" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |g AS (SELECT user_id,
        |    t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) AS dt
        |  FROM e),
        |a AS (SELECT user_id,
        |    CAST(COUNT(dt) AS BIGINT) AS n_gaps,
        |    SUM(CAST(dt AS HUGEINT)) AS sdt,
        |    SUM(CAST(dt AS HUGEINT) * dt) AS sdd
        |  FROM g GROUP BY 1),
        |d AS (SELECT user_id, n_gaps,
        |    CAST(sdt AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mu,
        |    sqrt(CAST(CAST(n_gaps AS HUGEINT) * sdd - sdt * sdt
        |        AS DOUBLE)) / CAST(n_gaps AS DOUBLE) AS sig
        |  FROM a)
        |SELECT user_id, n_gaps,
        |  CASE WHEN n_gaps >= 1
        |    THEN ROUND(mu / 1e6, 6) END AS mean_gap_s,
        |  CASE WHEN n_gaps >= 1
        |    THEN ROUND(sig / 1e6, 6) END AS std_gap_s,
        |  CASE WHEN n_gaps >= 1 AND mu > 0
        |    THEN ROUND(sig / mu, 6) END AS cv_gap,
        |  CASE WHEN n_gaps >= 1 AND sig + mu > 0
        |    THEN ROUND((sig - mu) / (sig + mu), 6) END AS burstiness
        |FROM d ORDER BY 1""".stripMargin,

    // identical exact integer moments (HUGEINT vs decimal(38,0)),
    // identical centering off the entity's min instant, and the
    // same double chains num/den*86400, (sv-num/den*st)/n/1e6,
    // num^2/(den*dvv) inside ROUND on both engines
    "q278_trend_fit" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t,
        |    CASE WHEN value IS NOT NULL
        |      THEN CAST(round(value * 1e6) AS BIGINT) END AS m
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |c AS (SELECT user_id, m,
        |    t - MIN(t) OVER (PARTITION BY user_id) AS ct
        |  FROM e),
        |a AS (SELECT user_id,
        |    CAST(COUNT(m) AS BIGINT) AS n_obs,
        |    SUM(CASE WHEN m IS NOT NULL
        |      THEN CAST(ct AS HUGEINT) END) AS st,
        |    SUM(CAST(m AS HUGEINT)) AS sv,
        |    SUM(CASE WHEN m IS NOT NULL
        |      THEN CAST(ct AS HUGEINT) * ct END) AS stt,
        |    SUM(CAST(ct AS HUGEINT) * m) AS stv,
        |    SUM(CAST(m AS HUGEINT) * m) AS svv
        |  FROM c GROUP BY 1),
        |d AS (SELECT user_id, n_obs, st, sv,
        |    CAST(n_obs AS HUGEINT) * stv - st * sv AS num,
        |    CAST(n_obs AS HUGEINT) * stt - st * st AS den,
        |    CAST(n_obs AS HUGEINT) * svv - sv * sv AS dvv
        |  FROM a)
        |SELECT user_id, n_obs,
        |  CASE WHEN n_obs >= 2 AND den > 0 THEN
        |    ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
        |      * 86400.0, 6) END AS slope_per_day,
        |  CASE WHEN n_obs >= 2 AND den > 0 THEN
        |    ROUND((CAST(sv AS DOUBLE) - CAST(num AS DOUBLE)
        |        / CAST(den AS DOUBLE) * CAST(st AS DOUBLE))
        |      / CAST(n_obs AS DOUBLE) / 1e6, 6) END
        |    AS trend_intercept,
        |  CASE WHEN n_obs >= 2 AND den > 0 AND dvv > 0 THEN
        |    ROUND(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
        |      / (CAST(den AS DOUBLE) * CAST(dvv AS DOUBLE)), 6) END
        |    AS r2
        |FROM d ORDER BY 1""".stripMargin,

    // identical observed-prior carries and the same two difference
    // quotients; (v-pv)/((t-pt)/1e6) chain inside ROUND on both
    "q277_rate_of_change" ->
      """WITH e AS (SELECT event_id, user_id, value,
        |    epoch_us(ts) AS t
        |  FROM events),
        |s1 AS (SELECT event_id, user_id, value, t,
        |    LAST_VALUE(CASE WHEN value IS NOT NULL THEN value END
        |      IGNORE NULLS) OVER w AS pv,
        |    LAST_VALUE(CASE WHEN value IS NOT NULL THEN t END
        |      IGNORE NULLS) OVER w AS pt
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY t, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |d1 AS (SELECT event_id, user_id, t,
        |    CASE WHEN value IS NOT NULL AND pv IS NOT NULL
        |      AND t > pt THEN (value - pv)
        |        / (CAST(t - pt AS DOUBLE) / 1e6) END AS v_d1
        |  FROM s1),
        |s2 AS (SELECT event_id, v_d1,
        |    LAST_VALUE(CASE WHEN v_d1 IS NOT NULL THEN v_d1 END
        |      IGNORE NULLS) OVER w AS pd1,
        |    LAST_VALUE(CASE WHEN v_d1 IS NOT NULL THEN t END
        |      IGNORE NULLS) OVER w AS pdt, t
        |  FROM d1 WINDOW w AS (PARTITION BY user_id
        |    ORDER BY t, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, ROUND(v_d1, 6) AS value_d1,
        |  ROUND(CASE WHEN v_d1 IS NOT NULL AND pd1 IS NOT NULL
        |    AND t > pdt THEN (v_d1 - pd1)
        |      / (CAST(t - pdt AS DOUBLE) / 1e6) END, 6) AS value_d2
        |FROM s2 ORDER BY 1""".stripMargin,

    // identical one-agg rate fit and the same double chain inside
    // ROUND: (n-1)/span scaled to days, exp(-(n-1)/span * recency)
    "q276_hazard_features" ->
      """WITH b AS (SELECT user_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    MIN(epoch_us(ts)) AS first_us,
        |    MAX(epoch_us(ts)) AS last_us
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |g AS (SELECT MAX(last_us) AS asof FROM b)
        |SELECT user_id, n_events,
        |  last_us - first_us AS span_us,
        |  g.asof - last_us AS recency_us,
        |  CASE WHEN last_us - first_us > 0 THEN
        |    ROUND(CAST(n_events - 1 AS DOUBLE) * 86400000000.0
        |      / CAST(last_us - first_us AS DOUBLE), 6) END
        |    AS events_per_day,
        |  CASE WHEN last_us - first_us > 0 THEN
        |    ROUND(EXP(-(CAST(n_events - 1 AS DOUBLE)
        |      / CAST(last_us - first_us AS DOUBLE))
        |      * CAST(g.asof - last_us AS DOUBLE)), 6) END
        |    AS p_active
        |FROM b, g ORDER BY 1""".stripMargin,

    // identical hour histogram, entropy rearrangement
    // ln(N) - sum(n ln n)/N, and the n*128 - hour peak encoding
    "q275_activity_profile" ->
      """WITH h AS (SELECT user_id,
        |    CAST(hour(ts) AS BIGINT) AS hh,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |r AS (SELECT user_id,
        |    CAST(SUM(n) AS BIGINT) AS n_events,
        |    CAST(COUNT(*) AS BIGINT) AS n_active_hours,
        |    SUM(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS nl,
        |    CAST(MAX(n * 128 - hh) AS BIGINT) AS e
        |  FROM h GROUP BY 1)
        |SELECT user_id, n_events, n_active_hours,
        |  ROUND(ln(CAST(n_events AS DOUBLE))
        |    - nl / CAST(n_events AS DOUBLE), 6) AS hour_entropy,
        |  CAST(((e + 23) // 128) * 128 - e AS BIGINT) AS peak_hour
        |FROM r ORDER BY 1""".stripMargin,

    // q39's session SQL + strictly-prior in-session touch window,
    // identical IGNORE NULLS carries and touch count
    "q273_attribution" ->
      """WITH t AS (SELECT event_id, user_id, ts, event_type,
        |    epoch_us(ts) AS us,
        |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         IS NULL
        |    OR date_diff('microsecond',
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
        |       > 1800000000
        |  THEN 1 ELSE 0 END AS is_new
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |s AS (SELECT event_id, user_id, event_type, us,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM t),
        |a AS (SELECT event_id, event_type, session_id,
        |    FIRST_VALUE(CASE WHEN event_type IN ('view', 'click')
        |      THEN event_type END IGNORE NULLS) OVER w
        |      AS first_touch_type,
        |    FIRST_VALUE(CASE WHEN event_type IN ('view', 'click')
        |      THEN us END IGNORE NULLS) OVER w AS first_touch_us,
        |    LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
        |      THEN event_type END IGNORE NULLS) OVER w
        |      AS last_touch_type,
        |    LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
        |      THEN us END IGNORE NULLS) OVER w AS last_touch_us,
        |    COUNT(CASE WHEN event_type IN ('view', 'click')
        |      THEN 1 END) OVER w AS n_touches
        |  FROM s WINDOW w AS (PARTITION BY user_id, session_id
        |    ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, session_id, first_touch_type,
        |  first_touch_us, last_touch_type, last_touch_us,
        |  CAST(n_touches AS BIGINT) AS n_touches
        |FROM a WHERE event_type = 'purchase' ORDER BY 1""".stripMargin,

    // literal NTILE(5) on the same deterministic (key, entity-tie)
    // orders; micro sums exact BIGINTs on both engines
    "q272_rfm_scores" ->
      """WITH base AS (SELECT user_id,
        |    MAX(epoch_us(ts)) AS last_us,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    CAST(COALESCE(SUM(CAST(round(value * 1e6) AS BIGINT)), 0)
        |      AS BIGINT) AS monetary_micros
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |g AS (SELECT MAX(last_us) AS asof FROM base),
        |b AS (SELECT user_id, g.asof - last_us AS recency_us,
        |    frequency, monetary_micros FROM base, g),
        |sc AS (SELECT user_id, recency_us, frequency, monetary_micros,
        |  CAST(NTILE(5) OVER (ORDER BY recency_us DESC, user_id)
        |    AS INTEGER) AS r_score,
        |  CAST(NTILE(5) OVER (ORDER BY frequency ASC, user_id)
        |    AS INTEGER) AS f_score,
        |  CAST(NTILE(5) OVER (ORDER BY monetary_micros ASC, user_id)
        |    AS INTEGER) AS m_score FROM b)
        |SELECT user_id, recency_us, frequency, monetary_micros,
        |  r_score, f_score, m_score,
        |  CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER)
        |    AS rfm_score
        |FROM sc ORDER BY 1""".stripMargin,

    // identical hold-previous carry, HUGEINT mirrors decimal(38,0)
    // for the exact integrand, same double readout expression
    "q271_twap" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t,
        |    CASE WHEN value IS NOT NULL
        |      THEN CAST(round(value * 1e6) AS BIGINT) END AS m
        |  FROM events),
        |h AS (SELECT event_id, user_id, t,
        |    LAST_VALUE(m IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS held,
        |    LEAD(t) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id) - t AS dt
        |  FROM e),
        |c AS (SELECT event_id,
        |    SUM(CASE WHEN held IS NOT NULL
        |      THEN CAST(held AS HUGEINT) * dt END) OVER w AS cum,
        |    SUM(CASE WHEN held IS NOT NULL THEN dt END) OVER w AS cov
        |  FROM h WINDOW w AS (PARTITION BY user_id ORDER BY t,
        |    event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND 1 PRECEDING))
        |SELECT event_id,
        |  CASE WHEN cov > 0 THEN ROUND(CAST(cum AS DOUBLE)
        |    / CAST(cov AS DOUBLE) / 1e6, 6) END AS value_twm
        |FROM c ORDER BY 1""".stripMargin,

    // q39's session SQL feeding the textbook basket self-join; every
    // ratio divides the same exact BIGINTs in the same double
    // expression on both engines
    "q268_cooccurrence" ->
      """WITH t AS (SELECT user_id, ts, event_type,
        |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         IS NULL
        |    OR date_diff('microsecond',
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
        |       > 1800000000
        |  THEN 1 ELSE 0 END AS is_new
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |s AS (SELECT user_id, event_type,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid FROM t),
        |st AS (SELECT DISTINCT user_id, sid, event_type FROM s),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns
        |  FROM (SELECT DISTINCT user_id, sid FROM st)),
        |tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
        |  FROM st GROUP BY 1),
        |p AS (SELECT a.event_type AS item_a, b.event_type AS item_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM st a JOIN st b ON a.user_id = b.user_id
        |    AND a.sid = b.sid AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT p.item_a, p.item_b, ta.n_t AS n_a, tb.n_t AS n_b,
        |  p.n_ab, n.ns AS n_sessions,
        |  ROUND(CAST(p.n_ab AS DOUBLE) / CAST(n.ns AS DOUBLE), 6)
        |    AS support,
        |  ROUND(CAST(p.n_ab AS DOUBLE) / CAST(ta.n_t AS DOUBLE), 6)
        |    AS conf_a_b,
        |  ROUND(CAST(p.n_ab AS DOUBLE) / CAST(tb.n_t AS DOUBLE), 6)
        |    AS conf_b_a,
        |  ROUND(CAST(p.n_ab AS DOUBLE) * CAST(n.ns AS DOUBLE)
        |    / (CAST(ta.n_t AS DOUBLE) * CAST(tb.n_t AS DOUBLE)), 6)
        |    AS lift
        |FROM p JOIN tot ta ON ta.event_type = p.item_a
        |  JOIN tot tb ON tb.event_type = p.item_b
        |  CROSS JOIN n
        |ORDER BY 1, 2""".stripMargin,

    // identical bigram lag, tiny matrix, same double division inside
    // ROUND and -ln on both engines
    "q267_markov_transitions" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |    epoch_us(ts) AS us
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |b AS (SELECT event_id, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS prev
        |  FROM ev),
        |m AS (SELECT prev, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS trans_n
        |  FROM b WHERE prev IS NOT NULL GROUP BY 1, 2),
        |mm AS (SELECT prev, event_type, trans_n,
        |    CAST(SUM(trans_n) OVER (PARTITION BY prev) AS BIGINT)
        |      AS prev_n FROM m)
        |SELECT b.event_id, b.prev AS prev_event_type, b.event_type,
        |  mm.trans_n, mm.prev_n,
        |  ROUND(CAST(mm.trans_n AS DOUBLE)
        |    / CAST(mm.prev_n AS DOUBLE), 6) AS trans_p,
        |  ROUND(-ln(CAST(mm.trans_n AS DOUBLE)
        |    / CAST(mm.prev_n AS DOUBLE)), 6) AS trans_surprisal
        |FROM b LEFT JOIN mm ON b.prev = mm.prev
        |  AND b.event_type = mm.event_type
        |ORDER BY 1""".stripMargin,

    // the textbook two-row-number islands, null-safe value compare
    "q262_islands" ->
      """WITH ev AS (SELECT user_id AS e, event_type AS v,
        |    epoch_us(ts) AS us, event_id
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |m AS (SELECT e, v, us, event_id,
        |    CASE WHEN ROW_NUMBER() OVER w = 1 THEN 1
        |      WHEN v IS NOT DISTINCT FROM LAG(v) OVER w THEN 0
        |      ELSE 1 END AS chg
        |  FROM ev WINDOW w AS (PARTITION BY e ORDER BY us, event_id)),
        |i AS (SELECT e, v, us,
        |    SUM(chg) OVER (PARTITION BY e ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM m)
        |SELECT e AS user_id, CAST(island AS BIGINT) AS run_seq,
        |  v AS value, MIN(us) AS run_start_us, MAX(us) AS run_end_us,
        |  CAST(COUNT(*) AS BIGINT) AS run_len
        |FROM i GROUP BY e, island, v
        |ORDER BY user_id, run_seq""".stripMargin,

    // identical prior-20 pairwise-complete integer micro-unit moments
    // (HUGEINT mirrors decimal(38,0)); corr and beta divide the same
    // exact integers in the same double expression on both engines
    "q256_rolling_corr" ->
      """WITH e AS (SELECT event_id, user_id, ts,
        |  CASE WHEN event_id % 11 <> 0 AND value IS NOT NULL
        |         AND NOT isnan(value) AND props IS NOT NULL
        |    THEN CAST(round(value * 1e6) AS BIGINT) END AS mx,
        |  CASE WHEN event_id % 11 <> 0 AND value IS NOT NULL
        |         AND NOT isnan(value) AND props IS NOT NULL
        |    THEN CAST(length(props) AS BIGINT) * 1000000 END AS my
        |FROM events),
        |x AS (SELECT event_id,
        |  COUNT(mx) OVER w AS n,
        |  CAST(SUM(mx) OVER w AS HUGEINT) AS sx,
        |  CAST(SUM(my) OVER w AS HUGEINT) AS sy,
        |  SUM(CAST(mx AS HUGEINT) * mx) OVER w AS sxx,
        |  SUM(CAST(my AS HUGEINT) * my) OVER w AS syy,
        |  SUM(CAST(mx AS HUGEINT) * my) OVER w AS sxy
        |FROM e WINDOW w AS (PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_id, n,
        |  n * sxy - sx * sy AS num,
        |  n * sxx - sx * sx AS dx,
        |  n * syy - sy * sy AS dy
        |FROM x)
        |SELECT event_id,
        |  ROUND(CASE WHEN n >= 2 AND dx > 0 AND dy > 0
        |    THEN CAST(num AS DOUBLE)
        |      / sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)) END,
        |    6) AS corr,
        |  ROUND(CASE WHEN n >= 2 AND dx > 0
        |    THEN CAST(num AS DOUBLE) / CAST(dx AS DOUBLE) END,
        |    6) AS beta
        |FROM z ORDER BY 1""".stripMargin,

    "q229_interval_features" ->
      s"""WITH p AS ($purchasesSql)
         |SELECT e.event_id,
         |  (SELECT count(*) FROM p WHERE p.user_id = e.user_id
         |    AND p.ts <= e.ts
         |    AND p.ts > e.ts - INTERVAL 3600 SECOND) AS w3600_count,
         |  (SELECT CAST(sum(CAST(purchase_value AS DECIMAL(38,6)))
         |      AS DOUBLE) FROM p WHERE p.user_id = e.user_id
         |    AND p.ts <= e.ts
         |    AND p.ts > e.ts - INTERVAL 3600 SECOND) AS w3600_sum,
         |  (SELECT count(*) FROM p WHERE p.user_id = e.user_id
         |    AND p.ts <= e.ts
         |    AND p.ts > e.ts - INTERVAL 86400 SECOND) AS w86400_count,
         |  (SELECT CAST(sum(CAST(purchase_value AS DECIMAL(38,6)))
         |      AS DOUBLE) FROM p WHERE p.user_id = e.user_id
         |    AND p.ts <= e.ts
         |    AND p.ts > e.ts - INTERVAL 86400 SECOND) AS w86400_sum
         |FROM events e ORDER BY 1""".stripMargin,

    "q228_multi_horizon" ->
      s"""WITH p AS ($purchasesSql),
         |e AS (SELECT event_id, user_id, ts,
         |    ts - INTERVAL 3600 SECOND AS ts_h1,
         |    ts - INTERVAL 86400 SECOND AS ts_h2
         |  FROM events),
         |t0 AS (SELECT e.*, r.purchase_value AS h0_purchase_value,
         |    r.ts AS h0_matched_ts
         |  FROM e ASOF LEFT JOIN p r
         |  ON e.user_id = r.user_id AND e.ts >= r.ts),
         |t1 AS (SELECT t0.*, r.purchase_value AS h3600_purchase_value,
         |    r.ts AS h3600_matched_ts
         |  FROM t0 ASOF LEFT JOIN p r
         |  ON t0.user_id = r.user_id AND t0.ts_h1 >= r.ts),
         |t2 AS (SELECT t1.*, r.purchase_value AS h86400_purchase_value,
         |    r.ts AS h86400_matched_ts
         |  FROM t1 ASOF LEFT JOIN p r
         |  ON t1.user_id = r.user_id AND t1.ts_h2 >= r.ts)
         |SELECT event_id, h0_purchase_value, h0_matched_ts,
         |  h3600_purchase_value, h3600_matched_ts,
         |  h86400_purchase_value, h86400_matched_ts
         |FROM t2 ORDER BY 1""".stripMargin,

    "q218_replay_parity" ->
      s"""WITH t AS (SELECT l.event_id, l.user_id, l.ts,
         |    r.purchase_value AS purchase_value_train,
         |    r.ts AS matched_ts_train
         |  FROM events l ASOF LEFT JOIN ($purchasesSql) r
         |  ON l.user_id = r.user_id AND l.ts >= r.ts),
         |sv AS (SELECT t.*,
         |    r.purchase_value AS purchase_value_serve,
         |    r.ts AS matched_ts_serve
         |  FROM t ASOF LEFT JOIN ($purchasesSql) r
         |  ON t.user_id = r.user_id
         |    AND t.ts + INTERVAL 2 HOUR >= r.ts)
         |SELECT event_id, purchase_value_train, purchase_value_serve,
         |  (purchase_value_train IS DISTINCT FROM purchase_value_serve)
         |    AS purchase_value_stale,
         |  matched_ts_train, matched_ts_serve
         |FROM sv ORDER BY 1""".stripMargin,

    // identical truth to q30: salting is partitioning, not semantics
    "q141_asof_auto_salted" ->
      s"""SELECT l.event_id, r.purchase_value,
         |       r.ts AS matched_ts
         |FROM events l ASOF LEFT JOIN ($purchasesSql) r
         |ON l.user_id = r.user_id AND l.ts >= r.ts
         |ORDER BY 1""".stripMargin,

    "q31_asof_join_strict" ->
      s"""SELECT l.event_id, r.purchase_value,
         |       r.ts AS matched_ts
         |FROM events l ASOF LEFT JOIN ($purchasesSql) r
         |ON l.user_id = r.user_id AND l.ts > r.ts
         |ORDER BY 1""".stripMargin,

    "q85_asof_forward" ->
      s"""SELECT l.event_id, r.purchase_value,
         |       r.ts AS matched_ts
         |FROM events l ASOF LEFT JOIN ($purchasesSql) r
         |ON l.user_id = r.user_id AND l.ts <= r.ts
         |ORDER BY 1""".stripMargin,

    "q32_asof_join_tolerance" ->
      s"""WITH j AS (
         |  SELECT l.event_id, l.ts AS lts, r.purchase_value,
         |         r.ts AS matched_ts
         |  FROM events l ASOF LEFT JOIN ($purchasesSql) r
         |  ON l.user_id = r.user_id AND l.ts >= r.ts)
         |SELECT event_id,
         |  CASE WHEN matched_ts IS NOT NULL AND
         |            date_diff('microsecond', matched_ts, lts)
         |              <= 86400000000 THEN purchase_value END
         |    AS purchase_value,
         |  CASE WHEN matched_ts IS NOT NULL AND
         |            date_diff('microsecond', matched_ts, lts)
         |              <= 86400000000 THEN matched_ts END AS matched_ts
         |FROM j ORDER BY 1""".stripMargin,

    "q33_asof_join_broadcast" ->
      s"""SELECT l.event_id, r.purchase_value,
         |       r.ts AS matched_ts
         |FROM events l ASOF LEFT JOIN ($purchasesSql) r
         |ON l.user_id = r.user_id AND l.ts >= r.ts
         |ORDER BY 1""".stripMargin,

    "q34_forward_fill" ->
      """WITH t AS (SELECT event_id, user_id, ts,
        |  CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id,
        |  COALESCE(v, LAST_VALUE(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS v_ffill
        |FROM t ORDER BY 1""".stripMargin,

    "q35_backfill" ->
      """WITH t AS (SELECT event_id, user_id, ts,
        |  CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id,
        |  COALESCE(v, FIRST_VALUE(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS v_bfill
        |FROM t ORDER BY 1""".stripMargin,

    "q36_lag_lead" ->
      """SELECT event_id,
        |  LAG(value, 2) OVER w AS value_lag2,
        |  LEAD(value, 2) OVER w AS value_lead2
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |ORDER BY 1""".stripMargin,

    "q37_rolling_rows" ->
      """SELECT event_id,
        |  MIN(value) OVER w AS value_roll5_min,
        |  MAX(value) OVER w AS value_roll5_max,
        |  COUNT(value) OVER w AS value_roll5_count
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY 1""".stripMargin,

    // the same fixed left-assoc 4-term fold as decayedRollingSum:
    // term_i = COALESCE(lag(value,i) * 0.5^((epoch_us(ts) -
    // lag(epoch_us,i)) / halfLife_us), 0); 6h half-life = 2.16e10 us
    "q146_decayed_rolling" ->
      """SELECT event_id, user_id, ROUND(
        |  COALESCE(value * pow(0.5,
        |    CAST(epoch_us(ts) - epoch_us(ts) AS DOUBLE)
        |      / 21600000000.0), 0)
        |  + COALESCE(LAG(value, 1) OVER w * pow(0.5,
        |    CAST(epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS DOUBLE)
        |      / 21600000000.0), 0)
        |  + COALESCE(LAG(value, 2) OVER w * pow(0.5,
        |    CAST(epoch_us(ts) - LAG(epoch_us(ts), 2) OVER w AS DOUBLE)
        |      / 21600000000.0), 0)
        |  + COALESCE(LAG(value, 3) OVER w * pow(0.5,
        |    CAST(epoch_us(ts) - LAG(epoch_us(ts), 3) OVER w AS DOUBLE)
        |      / 21600000000.0), 0), 6) AS decayed_sum
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |ORDER BY 1""".stripMargin,

    // DuckDB's windowed QUANTILE_CONT is the same (n-1)*q linear
    // interpolation over the sorted frame as rollingQuantile
    "q181_rolling_quantile" ->
      """SELECT event_id,
        |  ROUND(QUANTILE_CONT(value, 0.5) OVER w, 6) AS med7,
        |  ROUND(QUANTILE_CONT(value, 0.9) OVER w, 6) AS p90_7
        |FROM events WINDOW w AS (PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY 1""".stripMargin,

    // identical integer micro-unit expanding sum: the frame ends at
    // 1 PRECEDING, so no row ever reads itself or the future
    "q182_expanding_target_mean" ->
      """WITH x AS (SELECT event_id,
        |  SUM(CAST(round(value * 1e6) AS BIGINT)) OVER w AS s,
        |  COUNT(value) OVER w AS n
        |FROM events WINDOW w AS (PARTITION BY event_type
        |  ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id,
        |  ROUND(CASE WHEN n = 0 THEN NULL
        |    ELSE CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 END, 6)
        |    AS et_mean,
        |  n AS et_mean_n
        |FROM x ORDER BY 1""".stripMargin,

    // same prev/next carry (IGNORE NULLS over strict before/after
    // frames) and the same vp + (vn-vp)*(dt/DT) fma, integer-us dts
    "q183_interp_fill" ->
      """WITH e AS (SELECT event_id, user_id, ts, epoch_us(ts) AS t,
        |  CASE WHEN event_id % 7 < 2 THEN NULL ELSE value END AS v
        |  FROM events),
        |x AS (SELECT event_id, t, v,
        |  LAST_VALUE(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
        |    OVER wp AS vp,
        |  LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
        |    OVER wp AS tp,
        |  FIRST_VALUE(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
        |    OVER wn AS vn,
        |  FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
        |    OVER wn AS tn
        |FROM e WINDOW
        |  wp AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |  wn AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT event_id, ROUND(CASE
        |  WHEN v IS NOT NULL THEN v
        |  WHEN vp IS NOT NULL AND vn IS NOT NULL THEN
        |    CASE WHEN tn = tp THEN vp
        |    ELSE vp + (vn - vp) *
        |      (CAST(t - tp AS DOUBLE) / CAST(tn - tp AS DOUBLE)) END
        |  WHEN vp IS NOT NULL THEN vp
        |  ELSE vn END, 6) AS v_interp
        |FROM x ORDER BY 1""".stripMargin,

    // same two window shapes over epoch micros; ROW_NUMBER ties
    // break on event_id in both engines
    "q202_lifetime_features" ->
      """WITH e AS (SELECT event_id, user_id, ts,
        |  epoch_us(ts) AS t FROM events)
        |SELECT event_id,
        |  t - MIN(t) OVER wa AS age_us,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS INTEGER) AS event_seq,
        |  COUNT(*) OVER wa AS n_total,
        |  ROUND(CASE WHEN MAX(t) OVER wa - MIN(t) OVER wa > 0
        |    THEN CAST(t - MIN(t) OVER wa AS DOUBLE)
        |      / CAST(MAX(t) OVER wa - MIN(t) OVER wa AS DOUBLE)
        |    END, 6) AS life_frac
        |FROM e WINDOW wa AS (PARTITION BY user_id)
        |ORDER BY 1""".stripMargin,

    // every stage's proven oracle chained: DuckDB ASOF join + the
    // q182/q181/q190 window bodies + the q198 mask/zero assembly
    "q200_training_table" ->
      """WITH p AS (SELECT user_id, ts, value AS pv FROM events
        |  WHERE event_type = 'purchase'),
        |a AS (SELECT l.event_id, l.user_id, p.pv
        |  FROM events l ASOF LEFT JOIN p
        |    ON l.user_id = p.user_id AND l.ts > p.ts),
        |enc AS (SELECT event_id,
        |    SUM(CAST(round(value * 1e6) AS BIGINT)) OVER w AS s,
        |    COUNT(value) OVER w AS n
        |  FROM events WINDOW w AS (PARTITION BY event_type
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |med AS (SELECT event_id,
        |    QUANTILE_CONT(value, 0.5) OVER w AS med7
        |  FROM events WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |lab AS (SELECT event_id,
        |  CASE WHEN tn IS NOT NULL AND tn - t <= 604800000000
        |    THEN tn - t ELSE 604800000000 END AS tte_us,
        |  COALESCE(tn - t <= 604800000000, FALSE) AS tte_observed
        |  FROM (SELECT event_id, epoch_us(ts) AS t,
        |    FIRST_VALUE(CASE WHEN event_type = 'purchase'
        |      THEN epoch_us(ts) END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS tn FROM events)),
        |f AS (SELECT a.event_id, a.pv,
        |    CASE WHEN n = 0 THEN NULL
        |      ELSE CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6
        |      END AS et_mean,
        |    med.med7
        |  FROM a JOIN enc USING (event_id) JOIN med USING (event_id))
        |SELECT f.event_id,
        |  CAST(CASE WHEN pv IS NULL THEN 1 ELSE 0 END
        |    + CASE WHEN et_mean IS NULL THEN 2 ELSE 0 END
        |    + CASE WHEN med7 IS NULL THEN 4 ELSE 0 END AS BIGINT)
        |    AS mask,
        |  ROUND(COALESCE(pv, 0.0), 6) AS f_pv,
        |  ROUND(COALESCE(et_mean, 0.0), 6) AS f_enc,
        |  ROUND(COALESCE(med7, 0.0), 6) AS f_med,
        |  lab.tte_us, lab.tte_observed
        |FROM f JOIN lab USING (event_id) ORDER BY 1""".stripMargin,

    // identical prior-k integer-micro frame moments (HUGEINT mirrors
    // decimal(38,0) squares) and division order; unrounded z drives
    // the flag in both engines
    "q197_rolling_zscore" ->
      """WITH e AS (SELECT event_id, user_id, ts,
        |  CAST(round(value * 1e6) AS BIGINT) AS m FROM events),
        |x AS (SELECT event_id, m,
        |  COUNT(m) OVER w AS n,
        |  SUM(m) OVER w AS s,
        |  SUM(CAST(m AS HUGEINT) * m) OVER w AS sq
        |FROM e WINDOW w AS (PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_id,
        |  CASE WHEN m IS NULL OR n < 2 THEN NULL
        |    WHEN sqrt(GREATEST(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)) = 0
        |      THEN NULL
        |    ELSE (CAST(m AS DOUBLE)
        |      - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |      / sqrt(GREATEST(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0))
        |    END AS rz_raw
        |  FROM x)
        |SELECT event_id, ROUND(rz_raw, 6) AS rz,
        |  COALESCE(ABS(rz_raw) > 3.0, FALSE) AS anomaly
        |FROM z ORDER BY 1""".stripMargin,

    // same strictly-future integer-us range frame (1 us .. 72h);
    // only purchase values carry mass, other rows count nothing
    "q196_label_window" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t,
        |  CASE WHEN event_type = 'purchase' THEN value END AS pv
        |  FROM events)
        |SELECT event_id,
        |  CAST(COALESCE(SUM(CAST(round(pv * 1e6) AS BIGINT)) OVER w,
        |    0) AS BIGINT) AS label_micros,
        |  COUNT(pv) OVER w AS label_n
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t
        |  RANGE BETWEEN 1 FOLLOWING AND 259200000000 FOLLOWING)
        |ORDER BY 1""".stripMargin,

    // two-state recursive replay: l' = a*x + (1-a)*(l+b) first, then
    // b' = B*(l'-l) + (1-B)*b reads the OLD l — the CTE carries both
    // states and the pre-update level in one row, operand order
    // identical to Sequential.holtSmooth
    "q266_holt_smooth" ->
      """WITH RECURSIVE seq AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events WHERE value IS NOT NULL
        |),
        |r AS (
        |  SELECT user_id, event_id, rn, value AS l,
        |    CAST(0.0 AS DOUBLE) AS b
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT seq.user_id, seq.event_id, seq.rn,
        |    0.3 * seq.value + (1 - 0.3) * (r.l + r.b),
        |    0.1 * ((0.3 * seq.value + (1 - 0.3) * (r.l + r.b)) - r.l)
        |      + (1 - 0.1) * r.b
        |  FROM r JOIN seq
        |    ON seq.user_id = r.user_id AND seq.rn = r.rn + 1
        |)
        |SELECT event_id, ROUND(l, 6) AS holt_level,
        |  ROUND(b, 6) AS holt_trend,
        |  ROUND(l + b, 6) AS holt_forecast
        |FROM r ORDER BY 1""".stripMargin,

    // the same recursive replay as q189 with the normalized fold:
    // s + (1 - 0.5^(dt/hl)) * (x - s), identical operand order
    "q193_ewm_mean" ->
      """WITH RECURSIVE seq AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events WHERE value IS NOT NULL
        |),
        |r AS (
        |  SELECT user_id, event_id, rn, tus, value AS s
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT seq.user_id, seq.event_id, seq.rn, seq.tus,
        |    r.s + (1 - pow(0.5,
        |      CAST(seq.tus - r.tus AS DOUBLE) / 21600000000.0))
        |      * (seq.value - r.s)
        |  FROM r JOIN seq
        |    ON seq.user_id = r.user_id AND seq.rn = r.rn + 1
        |)
        |SELECT event_id, ROUND(s, 6) AS ewm_mean
        |FROM r ORDER BY 1""".stripMargin,

    // identical lag/groupBy moments; HUGEINT mirrors decimal(38,0)
    // for the exact squared sums
    "q192_gap_stats" ->
      """WITH g AS (SELECT user_id,
        |  epoch_us(ts) - LAG(epoch_us(ts)) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(gap) AS BIGINT) AS n_gaps,
        |  MIN(gap) AS gap_min_us, MAX(gap) AS gap_max_us,
        |  ROUND(CASE WHEN COUNT(gap) > 0
        |    THEN CAST(SUM(gap) AS DOUBLE) / COUNT(gap) END / 1e6, 6)
        |    AS gap_mean_s,
        |  ROUND(CASE WHEN COUNT(gap) > 0 THEN sqrt(GREATEST(
        |    CAST(SUM(CAST(gap AS HUGEINT) * gap) AS DOUBLE)
        |      / COUNT(gap)
        |    - (CAST(SUM(gap) AS DOUBLE) / COUNT(gap))
        |      * (CAST(SUM(gap) AS DOUBLE) / COUNT(gap)), 0.0)) END
        |    / 1e6, 6) AS gap_std_s
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical strictly-forward carry and integer-us censoring
    // (horizon = 7 * 86400 * 1e6 us)
    "q190_survival_labels" ->
      """WITH e AS (SELECT event_id, user_id, ts, epoch_us(ts) AS t,
        |  (event_type = 'purchase') AS is_t FROM events),
        |x AS (SELECT event_id, t,
        |  FIRST_VALUE(CASE WHEN is_t THEN t END IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS tn
        |  FROM e)
        |SELECT event_id,
        |  CASE WHEN tn IS NOT NULL AND tn - t <= 604800000000
        |    THEN tn - t ELSE 604800000000 END AS tte_us,
        |  COALESCE(tn - t <= 604800000000, FALSE) AS tte_observed
        |FROM x ORDER BY 1""".stripMargin,

    // the q147 recursive-CTE fold (identical IEEE operand order) —
    // the batch scan must match it bit-exactly, like the stream does
    "q189_decayed_exact" ->
      """WITH RECURSIVE seq AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events WHERE value IS NOT NULL
        |),
        |r AS (
        |  SELECT user_id, event_id, rn, tus, value AS s
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT seq.user_id, seq.event_id, seq.rn, seq.tus,
        |    seq.value + r.s * pow(0.5,
        |      CAST(seq.tus - r.tus AS DOUBLE) / 21600000000.0)
        |  FROM r JOIN seq
        |    ON seq.user_id = r.user_id AND seq.rn = r.rn + 1
        |)
        |SELECT event_id, ROUND(s, 6) AS decayed
        |FROM r ORDER BY 1""".stripMargin,

    // the same micro-unit recurrence, replayed sequentially per user
    // by a recursive CTE: km = (35+10)*1e6, kn = (35-10)*1e6,
    // threshold = 1000*1e6; null x -> increment 0 (state unchanged)
    "q185_cusum_changepoint" ->
      """WITH RECURSIVE x AS (
        |  SELECT user_id AS e, event_id AS id,
        |    CAST(round(value * 1e6) AS BIGINT) AS xm,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT e, id, rn,
        |    GREATEST(0, COALESCE(xm - 45000000, 0)) AS sp,
        |    GREATEST(0, COALESCE(25000000 - xm, 0)) AS sn
        |  FROM x WHERE rn = 1
        |  UNION ALL
        |  SELECT x.e, x.id, x.rn,
        |    GREATEST(0, r.sp + COALESCE(x.xm - 45000000, 0)),
        |    GREATEST(0, r.sn + COALESCE(25000000 - x.xm, 0))
        |  FROM r JOIN x ON x.e = r.e AND x.rn = r.rn + 1)
        |SELECT id AS event_id,
        |  CAST(sp AS DOUBLE) / 1e6 AS cusum_pos,
        |  CAST(sn AS DOUBLE) / 1e6 AS cusum_neg,
        |  (sp > 1000000000 OR sn > 1000000000) AS alarm
        |FROM r ORDER BY 1""".stripMargin,

    "q38_rolling_range" ->
      """SELECT event_id,
        |  MIN(value) OVER w AS value_rng3600s_min,
        |  MAX(value) OVER w AS value_rng3600s_max,
        |  COUNT(value) OVER w AS value_rng3600s_count
        |FROM events WINDOW w AS (PARTITION BY user_id
        |  ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY 1""".stripMargin,

    "q74_range_join" ->
      """WITH ev AS (SELECT user_id % 20 AS k, event_id, ts, value
        |            FROM events),
        |iv AS (SELECT k, event_id AS iid, ts AS s0,
        |              ts + INTERVAL 2 HOUR AS e0
        |       FROM ev WHERE event_id % 97 = 0)
        |SELECT ev.event_id, iv.iid, ROUND(ev.value, 6) AS value
        |FROM ev JOIN iv ON ev.k = iv.k
        |  AND ev.ts >= iv.s0 AND ev.ts <= iv.e0
        |ORDER BY 1, 2""".stripMargin,

    "q75_interval_overlap" ->
      """WITH ev AS (SELECT user_id % 20 AS k, event_id, ts FROM events),
        |a AS (SELECT k, event_id AS aid, ts AS s1,
        |             ts + INTERVAL 3 HOUR AS e1
        |      FROM ev WHERE event_id % 97 = 0),
        |b AS (SELECT k, event_id AS bid, ts AS s2,
        |             ts + INTERVAL 2 HOUR AS e2
        |      FROM ev WHERE event_id % 89 = 0)
        |SELECT a.aid, b.bid
        |FROM a JOIN b ON a.k = b.k AND a.s1 <= b.e2 AND b.s2 <= a.e1
        |ORDER BY 1, 2""".stripMargin,

    // two chained ASOF joins = the two feeds, matched independently
    "q177_asof_multi_feed" ->
      """WITH p AS (SELECT user_id, ts, value AS pv FROM events
        |  WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts, value AS vv FROM events
        |  WHERE event_type = 'view')
        |SELECT l.event_id, p.pv AS purchase_pv,
        |  p.ts AS purchase_matched_ts, v.vv AS view_vv,
        |  v.ts AS view_matched_ts
        |FROM events l
        |ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.ts >= p.ts
        |ASOF LEFT JOIN v ON l.user_id = v.user_id AND l.ts >= v.ts
        |ORDER BY 1""".stripMargin,

    // fold/purge/embargo boundaries recomputed in exact integer
    // microseconds: span = (max-min) // k + 1, integer // throughout
    "q169_purged_kfold" ->
      """WITH b AS (SELECT MIN(epoch_us(ts)) AS lo,
        |    MAX(epoch_us(ts)) AS hi FROM events),
        |p AS (SELECT lo, (hi - lo) // 5 + 1 AS span FROM b),
        |d AS (SELECT event_id, epoch_us(ts) AS t FROM events)
        |SELECT event_id,
        |  CAST((t - (SELECT lo FROM p)) // (SELECT span FROM p)
        |    AS BIGINT) AS fold,
        |  CASE
        |    WHEN (t - (SELECT lo FROM p)) // (SELECT span FROM p) = 2
        |      THEN 'test'
        |    WHEN t >= (SELECT lo + 2 * span FROM p) - 43200000000
        |      AND t < (SELECT lo + 2 * span FROM p) THEN 'purged'
        |    WHEN t >= (SELECT lo + 3 * span FROM p)
        |      AND t < (SELECT lo + 3 * span FROM p) + 21600000000
        |      THEN 'embargo'
        |    ELSE 'train' END AS role
        |FROM d ORDER BY 1""".stripMargin,

    // same sessionize CTE as q39, then one GROUP BY (user, session);
    // duration in exact integer microseconds, spend in integer
    // micro-units (round-then-sum as BIGINT — immune to float
    // summation order; DuckDB SUM(BIGINT) is HUGEINT, cast back)
    "q168_session_features" ->
      """WITH t AS (SELECT user_id, ts, event_type, value,
        |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         IS NULL
        |    OR date_diff('microsecond',
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
        |       > 1800000000
        |  THEN 1 ELSE 0 END AS is_new FROM events),
        |s AS (SELECT user_id, ts, event_type, value,
        |  CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM t)
        |SELECT user_id, session_id,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT event_type) AS n_event_types,
        |  CAST(SUM(COALESCE(CAST(ROUND(value * 1e6, 0) AS BIGINT), 0))
        |       AS BIGINT) AS value_micros
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the q39 session rule, then one group: exact micro durations,
    // mean gap = BIGINT/count division (bit-identical doubles)
    "q231_session_stats" ->
      """WITH t AS (SELECT event_id, user_id, ts,
        |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         IS NULL
        |    OR date_diff('microsecond',
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
        |       > 1800000000
        |  THEN 1 ELSE 0 END AS is_new FROM events),
        |s AS (SELECT user_id, ts,
        |  CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM t)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS started_at, max(ts) AS ended_at,
        |  date_diff('microsecond', min(ts), max(ts)) AS duration_us,
        |  CASE WHEN count(*) > 1 THEN
        |    CAST(date_diff('microsecond', min(ts), max(ts)) AS DOUBLE)
        |      / (count(*) - 1) END AS mean_gap_us
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q39_sessionize" ->
      """WITH t AS (SELECT event_id, user_id, ts,
        |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         IS NULL
        |    OR date_diff('microsecond',
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
        |       > 1800000000
        |  THEN 1 ELSE 0 END AS is_new FROM events)
        |SELECT event_id,
        |  CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |FROM t ORDER BY 1""".stripMargin
  )

  /** The feature-matrix oracle is LITERALLY the four per-op oracles
    * (q283 / q285 / q292 / q299) joined on event_id — the composed
    * plan must agree with each feature's already-proven definition,
    * column for column.
    */
  val oracles: Map[String, String] = {
    val matrix =
      s"""SELECT a.event_id, a.session_event_seq, a.us_into_session,
         |  b.us_since_purchase, b.us_since_click, b.us_since_error,
         |  c.value_dir, c.value_dir_run, d.trend_per_day
         |FROM (${baseOracles("q283_session_position")}) a
         |JOIN (${baseOracles("q285_recency_by_type")}) b
         |  USING (event_id)
         |JOIN (${baseOracles("q292_monotone_run")}) c
         |  USING (event_id)
         |JOIN (${baseOracles("q299_expanding_trend")}) d
         |  USING (event_id)
         |ORDER BY 1""".stripMargin
    val trainingV2 =
      s"""SELECT a.event_id, a.session_event_seq, a.us_into_session,
         |  b.gap_us, b.n_prior_gaps, b.mean_prior_gap_s,
         |  b.gap_surprise, c.us_until_purchase
         |FROM (${baseOracles("q283_session_position")}) a
         |JOIN (${baseOracles("q332_gap_surprise")}) b
         |  USING (event_id)
         |JOIN (SELECT event_id, us_until_purchase
         |  FROM (${baseOracles("q327_time_to_next_type")})) c
         |  USING (event_id)
         |ORDER BY 1""".stripMargin
    // identical conditional counts
    val typePivotSql =
      """SELECT user_id,
        |  CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END)
        |    AS BIGINT) AS n_view,
        |  CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END)
        |    AS BIGINT) AS n_click,
        |  CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
        |    AS BIGINT) AS n_purchase,
        |  CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END)
        |    AS BIGINT) AS n_error,
        |  CAST(COUNT(CASE WHEN event_type IS NOT NULL
        |    AND event_type NOT IN ('view', 'click', 'purchase',
        |      'error') THEN 1 END) AS BIGINT) AS n_other,
        |  CAST(COUNT(event_type) AS BIGINT) AS n_total
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin

    // literally q261's funnel CTEs, melted to steps and rolled up
    // with exact HUGEINT latency sums
    val funnelReport = {
      val funnel = baseOracles("q261_funnel_steps")
      s"""WITH f AS ($funnel),
         |m AS (
         |  SELECT 1 AS step_idx, 'view' AS step_name,
         |    t1_us AS t_us, t1_us AS t1 FROM f
         |  UNION ALL SELECT 2, 'click', t2_us, t1_us FROM f
         |  UNION ALL SELECT 3, 'purchase', t3_us, t1_us FROM f),
         |a AS (SELECT step_idx, step_name,
         |    CAST(COUNT(t_us) AS BIGINT) AS n_reached,
         |    SUM(CAST(t_us - t1 AS HUGEINT)) AS slat
         |  FROM m GROUP BY 1, 2),
         |n1 AS (SELECT n_reached AS n1 FROM a WHERE step_idx = 1)
         |SELECT x.step_idx, x.step_name, x.n_reached,
         |  ROUND(CASE WHEN n1 > 0 THEN CAST(x.n_reached AS DOUBLE)
         |    / CAST(n1 AS DOUBLE) END, 6) AS conv_from_first,
         |  ROUND(CASE WHEN p.n_reached > 0 THEN
         |    CAST(x.n_reached AS DOUBLE)
         |      / CAST(p.n_reached AS DOUBLE) END, 6)
         |    AS conv_from_prev,
         |  ROUND(CASE WHEN x.n_reached > 0 THEN
         |    CAST(x.slat AS DOUBLE) / CAST(x.n_reached AS DOUBLE)
         |      / 1e6 END, 6) AS mean_latency_s
         |FROM a x LEFT JOIN a p ON x.step_idx = p.step_idx + 1,
         |  n1 ORDER BY 1""".stripMargin
    }
    // the entity-profile matrix is LITERALLY the four per-op
    // oracles joined on user_id
    val behaviorProfile =
      s"""SELECT a.user_id, a.n_gaps, a.burstiness,
         |  b.n_types, b.type_entropy,
         |  c.norm_entropy AS cadence_norm_entropy,
         |  d.norm_cond AS predictability_norm
         |FROM (${baseOracles("q279_burstiness")}) a
         |JOIN (${baseOracles("q290_type_mix")}) b
         |  USING (user_id)
         |JOIN (${baseOracles("q328_gap_entropy")}) c
         |  USING (user_id)
         |JOIN (${baseOracles("q333_transition_entropy")}) d
         |  USING (user_id)
         |ORDER BY 1""".stripMargin
    // the orders twin: the same composition over the four
    // orders-generality oracles
    val ordersProfile =
      s"""SELECT a.o_custkey, a.n_gaps, a.burstiness,
         |  b.n_types, b.type_entropy,
         |  c.norm_entropy AS cadence_norm_entropy,
         |  d.norm_cond AS predictability_norm
         |FROM (${baseOracles("q319_gap_orders")}) a
         |JOIN (${baseOracles("q321_priority_mix")}) b
         |  USING (o_custkey)
         |JOIN (${baseOracles("q331_gap_entropy_orders")}) c
         |  USING (o_custkey)
         |JOIN (${baseOracles("q337_priority_entropy")}) d
         |  USING (o_custkey)
         |ORDER BY 1""".stripMargin
    // q39's session grid → weekly counts → q278's exact centered
    // OLS chain, slope read out per week
    val engagementTrend =
      """WITH t AS (SELECT user_id, ts,
        |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         IS NULL
        |    OR date_diff('microsecond',
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
        |       > 1800000000
        |  THEN 1 ELSE 0 END AS is_new
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s AS (SELECT user_id, ts,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM t),
        |sess AS (SELECT user_id, sid, MIN(ts) AS started_at
        |  FROM s GROUP BY 1, 2),
        |wk AS (SELECT user_id,
        |    epoch_us(started_at) // 604800000000 AS week,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM sess GROUP BY 1, 2),
        |e AS (SELECT user_id, week * 604800000000 AS t,
        |    CAST(round(CAST(n AS DOUBLE) * 1e6) AS BIGINT) AS m
        |  FROM wk),
        |c AS (SELECT user_id, m,
        |    t - MIN(t) OVER (PARTITION BY user_id) AS ct
        |  FROM e),
        |a AS (SELECT user_id,
        |    CAST(COUNT(m) AS BIGINT) AS n_obs,
        |    SUM(CASE WHEN m IS NOT NULL
        |      THEN CAST(ct AS HUGEINT) END) AS st,
        |    SUM(CAST(m AS HUGEINT)) AS sv,
        |    SUM(CASE WHEN m IS NOT NULL
        |      THEN CAST(ct AS HUGEINT) * ct END) AS stt,
        |    SUM(CAST(ct AS HUGEINT) * m) AS stv,
        |    SUM(CAST(m AS HUGEINT) * m) AS svv
        |  FROM c GROUP BY 1),
        |d AS (SELECT user_id, n_obs, st, sv,
        |    CAST(n_obs AS HUGEINT) * stv - st * sv AS num,
        |    CAST(n_obs AS HUGEINT) * stt - st * st AS den,
        |    CAST(n_obs AS HUGEINT) * svv - sv * sv AS dvv
        |  FROM a)
        |SELECT user_id, n_obs,
        |  CASE WHEN n_obs >= 2 AND den > 0 THEN
        |    ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
        |      * 604800.0, 6) END AS slope_per_week,
        |  CASE WHEN n_obs >= 2 AND den > 0 AND dvv > 0 THEN
        |    ROUND(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
        |      / (CAST(den AS DOUBLE) * CAST(dvv AS DOUBLE)), 6) END
        |    AS r2
        |FROM d ORDER BY 1""".stripMargin

    // q185's recursive-CTE alarms joined back to events for the
    // per-user recency rollup
    val alarmRecency =
      s"""WITH c AS (${baseOracles("q185_cusum_changepoint")}),
         |e AS (SELECT event_id, user_id, epoch_us(ts) AS us
         |  FROM events)
         |SELECT e.user_id,
         |  CAST(COUNT(CASE WHEN c.alarm THEN 1 END) AS BIGINT)
         |    AS n_alarms,
         |  MAX(e.us) - MAX(CASE WHEN c.alarm THEN e.us END)
         |    AS us_since_last_alarm
         |FROM c JOIN e ON c.event_id = e.event_id
         |GROUP BY 1 ORDER BY 1""".stripMargin
    // q348's moment-fit/shrink chains re-keyed onto orders
    val urgentShrunken =
      """WITH a AS (SELECT o_custkey,
        |    CAST(COUNT(CASE WHEN o_orderpriority IS NOT NULL
        |      THEN 1 END) AS BIGINT) AS n_obs,
        |    CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT'
        |      THEN 1 END) AS BIGINT) AS n_success
        |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
        |a2 AS (SELECT * FROM a WHERE n_obs > 0),
        |q AS (SELECT *, CAST(round(CAST(n_success AS DOUBLE)
        |    / CAST(n_obs AS DOUBLE) * 1e6) AS BIGINT) AS m
        |  FROM a2),
        |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS e,
        |    SUM(CAST(m AS HUGEINT)) AS s1,
        |    SUM(CAST(m AS HUGEINT) * m) AS s2 FROM q),
        |g AS (SELECT e, CAST(s1 AS DOUBLE) / e AS aa,
        |    CAST(s2 AS DOUBLE) / e AS bb FROM f),
        |h AS (SELECT aa / 1e6 AS mean,
        |    bb / 1e12 - (aa / 1e6) * (aa / 1e6) AS v FROM g),
        |i AS (SELECT mean, v, CASE WHEN v > 0 THEN
        |    mean * (1 - mean) / v - 1 ELSE -1 END AS ab FROM h),
        |j AS (SELECT
        |    CASE WHEN ab > 0 AND mean > 0 AND mean < 1
        |      THEN mean * ab ELSE 0 END AS alpha,
        |    CASE WHEN ab > 0 AND mean > 0 AND mean < 1
        |      THEN ab - mean * ab ELSE 0 END AS beta FROM i)
        |SELECT o_custkey, n_obs, n_success,
        |  ROUND(CAST(n_success AS DOUBLE) / CAST(n_obs AS DOUBLE),
        |    6) AS rate,
        |  ROUND(CASE WHEN alpha > 0 AND beta > 0 THEN
        |      (CAST(n_success AS DOUBLE) + alpha)
        |        / (CAST(n_obs AS DOUBLE) + (alpha + beta))
        |    ELSE CAST(n_success AS DOUBLE) / CAST(n_obs AS DOUBLE)
        |    END, 6) AS shrunk_rate
        |FROM a2, j ORDER BY 1""".stripMargin

    // q347's Wilson chain re-keyed onto orders (same JVM z/z^2
    // literals)
    val urgentWilson = {
      val z = 1.96; val z2 = z * z
      s"""WITH a AS (SELECT o_custkey,
         |    CAST(COUNT(CASE WHEN o_orderpriority IS NOT NULL
         |      THEN 1 END) AS BIGINT) AS n_obs,
         |    CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT'
         |      THEN 1 END) AS BIGINT) AS n_success
         |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
         |b AS (SELECT o_custkey, n_obs, n_success,
         |    CAST(n_success AS DOUBLE) / CAST(n_obs AS DOUBLE)
         |      AS p,
         |    CAST(n_obs AS DOUBLE) AS n
         |  FROM a WHERE n_obs > 0)
         |SELECT o_custkey, n_obs, n_success, ROUND(p, 6) AS rate,
         |  ROUND((p + $z2 / (n * 2) - $z *
         |    sqrt(p * (1 - p) / n + $z2 / (n * n * 4))) /
         |    (1 + $z2 / n), 6) AS wilson_lb
         |FROM b ORDER BY 1""".stripMargin
    }

    // q338's interval-cut SQL re-keyed onto the orders timeline
    val walkForwardOrders =
      """WITH b AS (SELECT min(epoch_us(o_orderdate)) AS lo,
        |    max(epoch_us(o_orderdate)) AS hi FROM orders),
        |s AS (SELECT lo, (hi - lo) // 4 + 1 AS span FROM b),
        |e AS (SELECT o_orderkey, epoch_us(o_orderdate) AS t
        |  FROM orders)
        |SELECT o_orderkey,
        |  CAST((t - lo) // span AS BIGINT) AS block,
        |  CASE WHEN (t - lo) // span = 1 THEN 'test'
        |    WHEN (t - lo) // span > 1 THEN 'future'
        |    WHEN t >= lo + 1 * span - 86400000000 THEN 'purged'
        |    ELSE 'train' END AS role_f1,
        |  CASE WHEN (t - lo) // span = 2 THEN 'test'
        |    WHEN (t - lo) // span > 2 THEN 'future'
        |    WHEN t >= lo + 2 * span - 86400000000 THEN 'purged'
        |    ELSE 'train' END AS role_f2,
        |  CASE WHEN (t - lo) // span = 3 THEN 'test'
        |    WHEN (t - lo) // span > 3 THEN 'future'
        |    WHEN t >= lo + 3 * span - 86400000000 THEN 'purged'
        |    ELSE 'train' END AS role_f3
        |FROM e, s ORDER BY 1""".stripMargin

    // identical 168-slot grid (DuckDB dayofweek = Spark − 1) and
    // the same integer max-encode/decode
    val peakSlotSql =
      """WITH e AS (SELECT user_id,
        |    CAST(dayofweek(ts) * 24 + hour(ts) AS BIGINT) AS s
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |p AS (SELECT user_id, s, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM e GROUP BY 1, 2),
        |r AS (SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
        |    CAST(MAX(n * 256 - s) AS BIGINT) AS e
        |  FROM p GROUP BY 1)
        |SELECT user_id, n_events,
        |  CAST(((e + 167) // 256) * 256 - e AS BIGINT)
        |    AS peak_slot,
        |  ROUND(CAST((e + 167) // 256 AS DOUBLE)
        |    / CAST(n_events AS DOUBLE), 6) AS peak_share
        |FROM r ORDER BY 1""".stripMargin

    // the dense CTE + both naive lags on comparable days
    val naiveSkill =
      """WITH d AS (SELECT user_id,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |s AS (SELECT user_id, MIN(day) AS f, MAX(day) AS l
        |  FROM d GROUP BY 1),
        |g AS (SELECT user_id, unnest(range(f, l + 1)) AS day
        |  FROM s),
        |dense AS (SELECT g.user_id, g.day,
        |    CAST(COALESCE(d.n, 0) AS BIGINT) AS n
        |  FROM g LEFT JOIN d ON g.user_id = d.user_id
        |    AND g.day = d.day),
        |p AS (SELECT user_id, n,
        |    LAG(n, 7) OVER w AS p7, LAG(n, 1) OVER w AS p1
        |  FROM dense WINDOW w AS (PARTITION BY user_id
        |    ORDER BY day))
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(abs(n - p7)) AS BIGINT) AS sae7,
        |  CAST(SUM(abs(n - p1)) AS BIGINT) AS sae1,
        |  ROUND(CASE WHEN SUM(abs(n - p1)) > 0 THEN
        |    1.0 - CAST(SUM(abs(n - p7)) AS DOUBLE)
        |      / CAST(SUM(abs(n - p1)) AS DOUBLE) END, 6) AS skill
        |FROM p WHERE p7 IS NOT NULL AND p1 IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin

    // the account-health spine: three composite oracles joined
    val accountHealth =
      s"""SELECT p.user_id, p.n_gaps, p.burstiness, p.n_types,
         |  p.type_entropy, p.cadence_norm_entropy,
         |  p.predictability_norm, t.slope_per_week, t.r2,
         |  a.n_alarms, a.us_since_last_alarm
         |FROM ($behaviorProfile) p
         |JOIN ($engagementTrend) t USING (user_id)
         |JOIN ($alarmRecency) a USING (user_id)
         |ORDER BY 1""".stripMargin
    baseOracles +
      ("q394_urgent_shrunken" -> urgentShrunken) +
      ("q393_urgent_wilson" -> urgentWilson) +
      ("q389_walk_forward_orders" -> walkForwardOrders) +
      ("q379_peak_slot" -> peakSlotSql) +
      ("q378_naive_skill" -> naiveSkill) +
      ("q377_account_health" -> accountHealth) +
      ("q376_engagement_trend" -> engagementTrend) +
      ("q375_alarm_recency" -> alarmRecency) +
      ("q363_behavior_profile" -> behaviorProfile) +
      ("q366_profile_orders" -> ordersProfile) +
      // bucketing is a layout change, never a value change
      ("q364_bucketed_profile" -> behaviorProfile) +
      ("q303_feature_matrix" -> matrix) +
      // bucketing is a layout change, never a value change
      ("q304_bucketed_matrix" -> matrix) +
      ("q335_training_v2" -> trainingV2) +
      ("q351_funnel_report" -> funnelReport) +
      ("q354_type_pivot" -> typePivotSql)
  }
}
