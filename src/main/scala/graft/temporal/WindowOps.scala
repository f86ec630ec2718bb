package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** Windowed feature ops over (entity, ts)-ordered data — BASELINE.json
  * north_rule extensions (absent from the reference; SURVEY.md §2.11).
  *
  * Every op here shares `Window.partitionBy(entity).orderBy(ts)`;
  * stacking several of them produces ONE Exchange(hashpartition(entity))
  * + ONE Sort(entity, ts) + consecutive Window nodes — the
  * "secondary sort within entity partitions" execution shape. Verify
  * with `.explain("formatted")`: a chain of these ops must show exactly
  * one Exchange.
  */
object WindowOps {

  private def w(entity: String, ts: String): WindowSpec =
    Window.partitionBy(col(entity)).orderBy(col(ts))

  /** Output/intermediate column-collision guard (the same loud
    * contract as Assemble.features): an op that ATTACHES fixed-name
    * columns to the caller's frame must reject a frame already
    * using those names — a silent duplicate column poisons every
    * downstream by-name select.
    */
  private[graft] def requireFresh(df: DataFrame, op: String,
      names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"$op: input already has column(s) ${clash.mkString(", ")} — " +
        "rename them before applying the op")
  }

  /** NaN-as-missing normalization: the one definition the micro-unit
    * window ops below share (NaN is a missing reading, never a zero
    * and never heap poison).
    */
  private def cleanDouble(c: String): Column = {
    val v = col(c).cast("double")
    when(isnan(v), lit(null)).otherwise(v)
  }

  /** value -> exact integer micro-units (Spark round(), HALF_UP on
    * the decimal repr — the same contract as
    * [[graft.temporal.StreamingRound.halfUp6]] on the Scala side).
    */
  private def microUnits(clean: Column): Column =
    round(clean * lit(1e6), 0).cast("long")

  /** Forward-fill: null feature values take the nearest PREVIOUS
    * non-null within the entity, ordered by ts.
    */
  def forwardFill(df: DataFrame, entity: String, ts: String,
      cols: Seq[String]): DataFrame = {
    val spec = w(entity, ts).rowsBetween(Window.unboundedPreceding, 0)
    val exprs = cols.map(c =>
      coalesce(col(c), last(col(c), ignoreNulls = true).over(spec))
        .as(s"${c}_ffill"))
    df.select(df.columns.map(col).toIndexedSeq ++ exprs: _*)
  }

  /** Backfill: nearest NEXT non-null within entity. */
  def backFill(df: DataFrame, entity: String, ts: String,
      cols: Seq[String]): DataFrame = {
    val spec = w(entity, ts).rowsBetween(0, Window.unboundedFollowing)
    val exprs = cols.map(c =>
      coalesce(col(c), first(col(c), ignoreNulls = true).over(spec))
        .as(s"${c}_bfill"))
    df.select(df.columns.map(col).toIndexedSeq ++ exprs: _*)
  }

  /** lag/lead by k within entity-by-ts. */
  def lagLead(df: DataFrame, entity: String, ts: String,
      cols: Seq[String], k: Int = 1): DataFrame = {
    val spec = w(entity, ts)
    val exprs = cols.flatMap(c => Seq(
      lag(col(c), k).over(spec).as(s"${c}_lag$k"),
      lead(col(c), k).over(spec).as(s"${c}_lead$k")))
    df.select(df.columns.map(col).toIndexedSeq ++ exprs: _*)
  }

  /** Rolling aggregates over the last `k` ROWS (inclusive of current). */
  def rollingRows(df: DataFrame, entity: String, ts: String,
      cols: Seq[String], k: Int,
      aggs: Seq[String] = Seq("sum", "mean", "min", "max", "count"))
      : DataFrame = {
    val spec = w(entity, ts).rowsBetween(-(k - 1), 0)
    val exprs = cols.flatMap(c => aggs.map(a =>
      aggExpr(a, col(c)).over(spec).as(s"${c}_roll${k}_$a")))
    df.select(df.columns.map(col).toIndexedSeq ++ exprs: _*)
  }

  /** Rolling aggregates over a trailing TIME range of `seconds`
    * (inclusive of current row's instant).
    */
  def rollingRange(df: DataFrame, entity: String, ts: String,
      cols: Seq[String], seconds: Long,
      aggs: Seq[String] = Seq("sum", "mean", "min", "max", "count"))
      : DataFrame = {
    val spec = Window.partitionBy(col(entity))
      .orderBy(unix_micros(col(ts).cast("timestamp")))
      .rangeBetween(-seconds * 1000000L, 0)
    val exprs = cols.flatMap(c => aggs.map(a =>
      aggExpr(a, col(c)).over(spec).as(s"${c}_rng${seconds}s_$a")))
    df.select(df.columns.map(col).toIndexedSeq ++ exprs: _*)
  }

  private def aggExpr(a: String, c: Column): Column = a match {
    case "sum" => sum(c)
    case "mean" => avg(c)
    case "min" => min(c)
    case "max" => max(c)
    case "count" => count(c)
    case other => throw new IllegalArgumentException(s"unknown agg $other")
  }

  /** Time-decayed rolling sum over the last `k` events (inclusive of
    * the current one):
    * `y_t = sum_{i=0..k-1} x_{t-i} * 2^(-(ts_t - ts_{t-i}) / halfLife)`
    * — the recency-weighted feature (decayed activity/spend counters
    * for CTR-style models) that plain rolling sums flatten.
    *
    * Deliberately the BOUNDED-K form, not the exact-EWMA recurrence
    * `s_t = a*x_t + (1-a)*s_{t-1}`: the recurrence is a sequential
    * per-entity scan (unbounded state, hostile to both engines and to
    * cross-engine float determinism), while this is a fixed fan of k
    * `lag()`s over the SAME (entity, ts) window every op here shares —
    * one exchange, one sort, a single codegen'd projection. Terms
    * older than k events carry weight < 2^(-k*gap/halfLife) and are
    * dropped; rows with fewer than k predecessors treat missing terms
    * as 0 (coalesce), and a null x or ts contributes 0 rather than
    * poisoning the sum. Summation is a fixed left-assoc fold —
    * engine-portable to the last ulp of pow().
    */
  def decayedRollingSum(df: DataFrame, entity: String, ts: String,
      valueCol: String, k: Int, halfLifeSeconds: Double,
      out: String = "decayed_sum"): DataFrame = {
    require(k >= 1, s"decayedRollingSum: k >= 1, got $k")
    require(halfLifeSeconds > 0,
      s"decayedRollingSum: halfLife > 0, got $halfLifeSeconds")
    val spec = w(entity, ts)
    val tNow = unix_micros(col(ts).cast("timestamp"))
    def term(i: Int): Column = {
      val x =
        if (i == 0) col(valueCol).cast("double")
        else lag(col(valueCol).cast("double"), i).over(spec)
      val tj = if (i == 0) tNow else lag(tNow, i).over(spec)
      val weight = pow(lit(0.5),
        (tNow - tj).cast("double") / lit(halfLifeSeconds * 1e6))
      coalesce(x * weight, lit(0.0))
    }
    val expr = (0 until k).map(term).reduce(_ + _)
    df.select(df.columns.map(col).toIndexedSeq :+ expr.as(out): _*)
  }

  /** Gap-based sessionization: a new session starts when
    * ts - lag(ts) > gapSeconds (or at the entity's first row);
    * session_id = running count of session starts. Two stacked windows
    * with the SAME partitioning -> one shuffle + one sort.
    */
  def sessionize(df: DataFrame, entity: String, ts: String,
      gapSeconds: Long,
      sessionCol: String = "session_id"): DataFrame = {
    val spec = w(entity, ts)
    val prev = lag(unix_micros(col(ts).cast("timestamp")), 1).over(spec)
    val isNew = when(prev.isNull ||
      (unix_micros(col(ts).cast("timestamp")) - prev >
        gapSeconds * 1000000L), 1L).otherwise(0L)
    // window-in-window is illegal, so materialise is_new in a first
    // projection; both windows share (entity, ts) -> still one Exchange
    val runningSpec = w(entity, ts).rowsBetween(Window.unboundedPreceding, 0)
    df.select(df.columns.map(col).toIndexedSeq :+
      isNew.as("__is_new"): _*)
      .select(df.columns.map(col).toIndexedSeq :+
        sum(col("__is_new")).over(runningSpec).as(sessionCol): _*)
  }

  /** Per-SESSION aggregate features over [[sessionize]]'s gap rule:
    * one row per (entity, session) with event count, start/end
    * instants, exact integer duration in micros, and the mean
    * inter-event gap (`duration / (n−1)`, null for singleton
    * sessions — division operands are an exact BIGINT and a count,
    * so any engine reproduces the double bit-for-bit). Cost: the
    * sessionize window's one exchange + one map-side-combined
    * aggregation; output bounded by |sessions|.
    */
  def sessionStats(df: DataFrame, entity: String, ts: String,
      gapSeconds: Long): DataFrame = {
    val sess = sessionize(df, entity, ts, gapSeconds)
    val tus = unix_micros(col(ts).cast("timestamp"))
    sess.groupBy(col(entity), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(ts)).as("started_at"), max(col(ts)).as("ended_at"),
        (max(tus) - min(tus)).as("duration_us"))
      .withColumn("mean_gap_us",
        when(col("n_events") > 1,
          col("duration_us").cast("double") /
            (col("n_events") - 1).cast("double")))
  }

  /** Exact rolling quantile (np.interp / QUANTILE_CONT definition,
    * linear interpolation at `(n-1)*q`) over the last `k` ROWS per
    * entity — the robust rolling feature (rolling median / p90 burst
    * level) that rolling means flatten and rolling min/max overreact
    * to. Nulls are skipped (a frame of all-null values yields null),
    * matching `QUANTILE_CONT`'s null semantics.
    *
    * Scale shape: the same shared `(entity, ts)` window as every op
    * here (one Exchange + one Sort when stacked), one
    * `collect_list` window buffer of at most k doubles per row — the
    * frame is BOUNDED by construction (`require` below), so state is
    * O(k), never O(history). The quantile itself is a codegen'd
    * projection over the sorted k-array: lo/hi bracket + one fused
    * multiply-add, the identical operand order DuckDB's
    * QUANTILE_CONT uses, so results are value-exact cross-engine
    * (outputs rounded to 6dp absorb the final-ulp of the fma).
    */
  def rollingQuantile(df: DataFrame, entity: String, ts: String,
      valueCol: String, k: Int, q: Double, out: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(k >= 1, s"rollingQuantile: k >= 1, got $k")
    require(k <= 10000,
      s"rollingQuantile: per-row frame buffer is O(k); k=$k > 10000 " +
        "would balloon window state — use rollingRange aggs instead")
    require(q >= 0.0 && q <= 1.0, s"rollingQuantile: q in [0,1], got $q")
    val spec = Window.partitionBy(col(entity))
      .orderBy((col(ts) +: tieBreak.map(col)): _*)
      .rowsBetween(-(k - 1), 0)
    // NaN is a missing reading (module contract): clean BEFORE the
    // collect, else NaN sorts greatest and poisons the quantile frame
    val arr = array_sort(collect_list(cleanDouble(valueCol)).over(spec))
    val base = df.select(
      df.columns.map(col).toIndexedSeq :+ arr.as("__rq_arr"): _*)
    val a = col("__rq_arr")
    val n = size(a)
    val pos = (n - 1).cast("double") * lit(q)
    val lo = floor(pos).cast("int")
    val frac = pos - lo.cast("double")
    val loV = element_at(a, lo + 1)
    val hiV = element_at(a, least(lo + lit(2), n))
    val v = when(n === 0, lit(null).cast("double"))
      .when(frac === 0.0, loV)
      .otherwise(loV + (hiV - loV) * frac)
    base.select(df.columns.map(col).toIndexedSeq :+ v.as(out): _*)
  }

  /** Per-event IN-SESSION position features — the point-in-time
    * trio a ranking model can read at serve time without leakage:
    * `session_event_seq` (1-based ordinal of the event inside its
    * gap session) and `us_into_session` (exact integer microseconds
    * since the session's first event). Deliberately NO session
    * length/duration here — those read the session's FUTURE; use
    * [[sessionStats]] for offline session-grain features.
    *
    * Scale shape: [[sessionize]]'s one entity exchange; the
    * (entity, session) ordinal window and the running session-start
    * min hash-satisfy on the same exchange (entity ⊆ keys), so the
    * whole op is one shuffle + one sort. Integer math end to end.
    */
  def sessionPosition(df: DataFrame, entity: String, ts: String,
      gapSeconds: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    requireFresh(df, "sessionPosition", "__is_new", "session_id",
      "session_event_seq", "us_into_session")
    val sess = sessionize(df, entity, ts, gapSeconds)
    val ord = (col(ts) +: tieBreak.map(col)).map(_.asc)
    val sw = Window.partitionBy(col(entity), col("session_id"))
      .orderBy(ord: _*)
    val tus = unix_micros(col(ts).cast("timestamp"))
    sess.select(sess.columns.map(col).toIndexedSeq ++ Seq(
      row_number().over(sw).cast("long").as("session_event_seq"),
      (tus - min(tus).over(
        sw.rowsBetween(Window.unboundedPreceding, 0)))
        .as("us_into_session")): _*)
  }

  /** Trailing-k ROBUST z-score — `(x − med) / (1.4826 · MAD)` over
    * the last k observations, where `med` is the exact
    * linear-interpolation median of the frame and `MAD` the same
    * median of `|x_i − med|`: the outlier score that, unlike
    * [[rollingZScore]], a single spike cannot drag its own baseline
    * with (breakdown point 50% vs 0%). NaN/null are missing
    * readings ([[cleanDouble]]) and never enter the frame; a
    * zero-MAD frame (≥ half the readings identical) refuses with
    * null rather than emit ±∞.
    *
    * Exactness: the frame array, both sorts, and the interp chain
    * `lo + (hi − lo) · frac` are plain double ops an oracle replays
    * verbatim (list aggregates + lambdas); no engine-ordered float
    * summation anywhere. Cost: O(k log k) per row on the ONE entity
    * exchange — same contract and k-cap as [[rollingQuantile]].
    */
  def rollingRobustZ(df: DataFrame, entity: String, ts: String,
      valueCol: String, k: Int, tieBreak: Seq[String] = Nil)
      : DataFrame = {
    require(k >= 1, s"rollingRobustZ: k >= 1, got $k")
    require(k <= 10000,
      s"rollingRobustZ: per-row frame buffer is O(k); k=$k > 10000 " +
        "would balloon window state — use rollingRange aggs instead")
    requireFresh(df, "rollingRobustZ", "__rz_arr", "__rz_med",
      s"${valueCol}_rmed", s"${valueCol}_robust_z")
    val spec = Window.partitionBy(col(entity))
      .orderBy((col(ts) +: tieBreak.map(col)): _*)
      .rowsBetween(-(k - 1), 0)
    val arr = array_sort(collect_list(cleanDouble(valueCol)).over(spec))
    val base = df.select(
      df.columns.map(col).toIndexedSeq :+ arr.as("__rz_arr"): _*)
    def interpMedian(a: Column): Column = {
      val n = size(a)
      val pos = (n - 1).cast("double") * lit(0.5)
      val lo = floor(pos).cast("int")
      val frac = pos - lo.cast("double")
      val loV = element_at(a, lo + 1)
      val hiV = element_at(a, least(lo + lit(2), n))
      when(n === 0, lit(null).cast("double"))
        .when(frac === 0.0, loV)
        .otherwise(loV + (hiV - loV) * frac)
    }
    val med = interpMedian(col("__rz_arr"))
    val withMed = base.select(
      df.columns.map(col).toIndexedSeq ++ Seq(
        col("__rz_arr"), med.as("__rz_med")): _*)
    val absArr = array_sort(transform(col("__rz_arr"),
      e => abs(e - col("__rz_med"))))
    val mad = interpMedian(absArr)
    val v = cleanDouble(valueCol)
    val z = when(v.isNotNull && col("__rz_med").isNotNull &&
      mad > 0, (v - col("__rz_med")) / (lit(1.4826) * mad))
    withMed.select(df.columns.map(col).toIndexedSeq ++ Seq(
      col("__rz_med").as(s"${valueCol}_rmed"),
      z.as(s"${valueCol}_robust_z")): _*)
  }

  /** Per-event RECENCY-BY-TYPE features — for each requested event
    * type, the exact integer microseconds since the entity's most
    * recent STRICTLY EARLIER event of that type
    * (`us_since_<type>`, null when no such prior event): the
    * "seconds since last purchase / last error" block of every
    * behavioral feature vector, leakage-free by the strictly-prior
    * frame (an event never reads itself even when it IS the type).
    *
    * Scale shape: ONE entity exchange and one sort; all N type
    * carries are `last(..ignoreNulls)` expressions over the same
    * window spec, so N types cost N running registers, not N
    * passes. Integer math end to end.
    */
  def recencyByType(df: DataFrame, entity: String, ts: String,
      typeCol: String, types: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(types.nonEmpty, "recencyByType: types must be non-empty")
    val slugs = types.map(t => t.toLowerCase.replaceAll("[^a-z0-9]+", "_"))
    require(slugs.distinct.size == types.size,
      s"recencyByType: types collide after slugging: $types")
    requireFresh(df, "recencyByType",
      slugs.map(sl => s"us_since_$sl"): _*)
    val spec = Window.partitionBy(col(entity))
      .orderBy((col(ts) +: tieBreak.map(col)).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val tus = unix_micros(col(ts).cast("timestamp"))
    val outs = types.zip(slugs).map { case (t, slug) =>
      (tus - last(when(col(typeCol) === lit(t), tus),
        ignoreNulls = true).over(spec)).as(s"us_since_$slug")
    }
    df.select(df.columns.map(col).toIndexedSeq ++ outs: _*)
  }

  /** Per-event EXPANDING TYPE COUNTS — the "how many purchases /
    * clicks / errors had this user made BEFORE this event" block,
    * strictly prior so an event never counts itself:
    * `prior_n_<type>` per requested type plus `prior_n_total`
    * (all non-null types). With [[recencyByType]] (when) and these
    * (how many), the classic count-feature vector is complete and
    * PIT-safe by construction.
    *
    * Scale shape: ONE entity exchange + one sort; N+1 conditional
    * count registers over the same strictly-prior frame. Exact
    * integers end to end.
    */
  def expandingTypeCounts(df: DataFrame, entity: String, ts: String,
      typeCol: String, types: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(types.nonEmpty, "expandingTypeCounts: types non-empty")
    val slugs = types.map(t => t.toLowerCase.replaceAll("[^a-z0-9]+", "_"))
    require(slugs.distinct.size == types.size,
      s"expandingTypeCounts: types collide after slugging: $types")
    requireFresh(df, "expandingTypeCounts",
      slugs.map(sl => s"prior_n_$sl") :+ "prior_n_total": _*)
    val spec = Window.partitionBy(col(entity))
      .orderBy((col(ts) +: tieBreak.map(col)).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val outs = types.zip(slugs).map { case (t, slug) =>
      count(when(col(typeCol) === lit(t), lit(1))).over(spec)
        .as(s"prior_n_$slug")
    } :+ count(when(col(typeCol).isNotNull, lit(1))).over(spec)
      .as("prior_n_total")
    df.select(df.columns.map(col).toIndexedSeq ++ outs: _*)
  }

  /** Per-event EXPANDING DISTINCT-TYPE count — how many DISTINCT
    * action types the entity had exhibited strictly BEFORE this
    * event (`prior_n_types`): the repertoire-breadth companion of
    * [[typeNovelty]] (which says whether THIS event is novel) and
    * [[expandingTypeCounts]] (which counts per requested type —
    * this one needs no type list). PIT-safe: first-of-type flags
    * come from a (entity, type) ordinal and the running sum ends at
    * −1, so an event introducing a new type reads the count WITHOUT
    * itself.
    *
    * Scale shape: hash(entity) satisfies BOTH window clusterings,
    * so the (entity, type) ordinal and the (entity) running sum
    * ride ONE exchange (two sorts). Pure integer math.
    */
  def expandingDistinctTypes(df: DataFrame, entity: String,
      ts: String, typeCol: String, tieBreak: Seq[String] = Nil)
      : DataFrame = {
    requireFresh(df, "expandingDistinctTypes", "__first_of_type",
      "prior_n_types")
    val ord = (col(ts) +: tieBreak.map(col)).map(_.asc)
    val wt = Window.partitionBy(col(entity), col(typeCol))
      .orderBy(ord: _*)
    val isFirst = when(col(typeCol).isNotNull &&
      row_number().over(wt) === 1, lit(1L)).otherwise(lit(0L))
    val spec = Window.partitionBy(col(entity)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // pre-partition on the entity alone: hash(entity) satisfies the
    // (entity, type) ordinal's clustering AND the running sum's, so
    // both windows ride THIS one exchange (bottom-up planning would
    // otherwise exchange on (entity, type) first, then again)
    df.repartition(col(entity))
      .select(df.columns.map(col).toIndexedSeq :+
        isFirst.as("__first_of_type"): _*)
      .select(df.columns.map(col).toIndexedSeq :+
        coalesce(sum(col("__first_of_type")).over(spec), lit(0L))
          .as("prior_n_types"): _*)
  }

  /** Per-entity DWELL-TIME shares — the TIME-weighted type mix:
    * each event's state lasts until the entity's next event (exact
    * integer micros; the final event has no dwell), and the share
    * of total dwell spent in each REQUESTED type is reported
    * (`dwell_share_<type>`, plus `dwell_share_other` for null or
    * unlisted types and `total_dwell_s`). Count mixes
    * ([[graft.operators.Behavior.typeMix]]) overweight rapid-fire
    * clicks; dwell shares say where the TIME went. Entities with a
    * single event contribute no dwell rows and are absent; an
    * all-simultaneous entity (total dwell 0) refuses the shares
    * with null.
    *
    * Exactness: exact decimal Σ of integer micros per bucket, one
    * double division per share; `total_dwell_s` is a pure /1e6
    * readout (bit-identical cross-engine, deliberately un-rounded).
    * Scale shape: one entity exchange for the lead, one map-side-
    * combined rollup with |types|+2 registers.
    */
  def dwellShares(df: DataFrame, entity: String, ts: String,
      typeCol: String, types: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(types.nonEmpty, "dwellShares: types non-empty")
    val slugs = types.map(t => t.toLowerCase.replaceAll("[^a-z0-9]+", "_"))
    require(slugs.distinct.size == types.size,
      s"dwellShares: types collide after slugging: $types")
    val ord = (col(ts) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(col(entity)).orderBy(ord: _*)
    val tus = unix_micros(col(ts).cast("timestamp"))
    val base = df
      .filter(col(entity).isNotNull && col(ts).isNotNull)
      .select(col(entity), col(typeCol).as("__t"),
        (lead(tus, 1).over(w) - tus).as("__dwell"))
      .filter(col("__dwell").isNotNull)
    def dsum(cond: Column) =
      sum(when(cond, col("__dwell")).cast("decimal(38,0)"))
    val aggs = types.zip(slugs).map { case (t, slug) =>
      dsum(col("__t") === lit(t)).as(s"__d_$slug")
    } ++ Seq(
      dsum(col("__t").isNull || !col("__t").isin(types: _*))
        .as("__d_other"),
      sum(col("__dwell").cast("decimal(38,0)")).as("__d_total"))
    val rolled = base.groupBy(col(entity))
      .agg(aggs.head, aggs.tail: _*)
    val total = col("__d_total")
    val shares = (slugs.map(sl => s"__d_$sl" -> s"dwell_share_$sl")
      :+ ("__d_other" -> "dwell_share_other")).map { case (in, out) =>
      when(total > 0, coalesce(col(in), lit(0).cast("decimal(38,0)"))
        .cast("double") / total.cast("double")).as(out)
    }
    rolled.select(col(entity) +: shares :+
      (total.cast("double") / 1e6).as("total_dwell_s"): _*)
  }

  /** Per-event TIME-TO-NEXT-TYPE — [[recencyByType]]'s forward
    * mirror: for each requested event type, the exact integer
    * microseconds until the entity's next STRICTLY LATER event of
    * that type (`us_until_<type>`, null when none follows). This is
    * a LABEL generator, not a serve-time feature — it reads the
    * entity's future by definition ("time until next purchase" is
    * the classic survival/propensity target); training joins it onto
    * PIT-safe features, serving never computes it.
    *
    * Scale shape: the same ONE entity exchange + one sort as the
    * backward op; all N type carries are `first(..ignoreNulls)`
    * registers over one strictly-following frame, so N types cost N
    * registers, not N passes. Integer micros end to end.
    */
  def timeToNextType(df: DataFrame, entity: String, ts: String,
      typeCol: String, types: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(types.nonEmpty, "timeToNextType: types must be non-empty")
    val slugs = types.map(t => t.toLowerCase.replaceAll("[^a-z0-9]+", "_"))
    require(slugs.distinct.size == types.size,
      s"timeToNextType: types collide after slugging: $types")
    requireFresh(df, "timeToNextType",
      slugs.map(sl => s"us_until_$sl"): _*)
    val spec = Window.partitionBy(col(entity))
      .orderBy((col(ts) +: tieBreak.map(col)).map(_.asc): _*)
      .rowsBetween(1, Window.unboundedFollowing)
    val tus = unix_micros(col(ts).cast("timestamp"))
    val outs = types.zip(slugs).map { case (t, slug) =>
      (first(when(col(typeCol) === lit(t), tus),
        ignoreNulls = true).over(spec) - tus).as(s"us_until_$slug")
    }
    df.select(df.columns.map(col).toIndexedSeq ++ outs: _*)
  }

  /** Per-event GAP SURPRISE — "this silence is 5× their usual": the
    * event's inter-arrival gap scored against the expanding mean of
    * the entity's STRICTLY PRIOR gaps. Emits `gap_us` (exact integer
    * micros since the previous event, null at the first), `n_prior_gaps`,
    * `mean_prior_gap_us` (exact decimal Σ over count, one double
    * division) and `gap_surprise = gap / mean_prior` (null when no
    * prior gap or the prior mean is 0). PIT-safe by construction —
    * the frame ends at −1, so live scoring reproduces every
    * backfilled value.
    *
    * Scale shape: ONE entity exchange + one sort shared by the lag
    * and both expanding registers (decimal Σ + count); O(1) state
    * per row, never a buffer.
    */
  def gapSurprise(df: DataFrame, entity: String, ts: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    requireFresh(df, "gapSurprise", "gap_us", "n_prior_gaps",
      "mean_prior_gap_us", "gap_surprise")
    val order = (col(ts) +: tieBreak.map(col)).map(_.asc)
    val spec = Window.partitionBy(col(entity)).orderBy(order: _*)
    val prior = spec.rowsBetween(Window.unboundedPreceding, -1)
    val tus = unix_micros(col(ts).cast("timestamp"))
    val gap = tus - lag(tus, 1).over(spec)
    val base = df.select(
      df.columns.map(col).toIndexedSeq :+ gap.as("gap_us"): _*)
    val nPrior = count(col("gap_us")).over(prior)
    val sPrior = sum(col("gap_us").cast("decimal(38,0)")).over(prior)
    val meanPrior = when(nPrior > 0,
      sPrior.cast("double") / nPrior.cast("double"))
    base.select(base.columns.map(col).toIndexedSeq ++ Seq(
      nPrior.as("n_prior_gaps"),
      meanPrior.as("mean_prior_gap_us"),
      when(meanPrior > 0,
        col("gap_us").cast("double") / meanPrior)
        .as("gap_surprise")): _*)
  }

  /** Per-entity WEEKDAY/WEEKEND contrast profile — event counts,
    * exact-mean values and the weekend lift every engagement model
    * wants: `n_weekday`, `n_weekend`, `mean_weekday`,
    * `mean_weekend` (micro-exact sums, one double division each),
    * `weekend_share` (of counted observations) and
    * `weekend_contrast = mean_weekend − mean_weekday` (null if
    * either side has no observations). Weekend = Saturday/Sunday on
    * the session-TZ calendar (UTC here) — the same `dayofweek`
    * grid both engines expose.
    *
    * Scale shape: one map-side-combined entity rollup; the
    * conditional sums are exact decimal(38,0) micro-units so the
    * means are engine-exact, and rows with missing values count in
    * neither n nor sum.
    */
  def weekpartProfile(df: DataFrame, entity: String, ts: String,
      valueCol: String): DataFrame = {
    val m = microUnits(cleanDouble(valueCol))
    val isWeekend = dayofweek(col(ts).cast("timestamp")).isin(1, 7)
    def side(cond: Column) = (
      count(when(cond, m)),
      sum(when(cond, m).cast("decimal(38,0)")))
    val (nwe, swe) = side(isWeekend)
    val (nwd, swd) = side(!isWeekend)
    val agg = df
      .filter(col(entity).isNotNull && col(ts).isNotNull)
      .groupBy(col(entity))
      .agg(nwd.as("n_weekday"), nwe.as("n_weekend"),
        swd.as("__swd"), swe.as("__swe"))
    def mean(s: Column, n: Column) = when(n > 0,
      s.cast("double") / n.cast("double") / lit(1e6))
    val mwd = mean(col("__swd"), col("n_weekday"))
    val mwe = mean(col("__swe"), col("n_weekend"))
    val total = col("n_weekday") + col("n_weekend")
    agg.select(col(entity), col("n_weekday"), col("n_weekend"),
      mwd.as("mean_weekday"), mwe.as("mean_weekend"),
      when(total > 0, col("n_weekend").cast("double") /
        total.cast("double")).as("weekend_share"),
      (mwe - mwd).as("weekend_contrast"))
  }

  /** Per-entity lag-k AUTOCORRELATION — Pearson r between the
    * value sequence and itself k ROWS earlier (row-lag ACF, the
    * memory/momentum feature of classical ts analysis), one output
    * row per (entity, lag). Pairs where either side is a missing
    * reading (null/NaN) are excluded; entities with < 2 valid
    * pairs, or a constant side (zero variance), refuse with null.
    *
    * Exactness: both sides are integer micro-units, all six pair
    * moments (n, Σx, Σy, Σxy, Σx², Σy²) are exact decimal(38,0),
    * and r is ONE double chain
    * `(nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²) · √(nΣy²−(Σy)²))` with
    * correctly-rounded IEEE sqrt — an oracle replaying it agrees to
    * the ulp. Scale shape: one entity exchange; every lag is one
    * more `lag()` register on the SAME window sort, and all lag
    * rollups ride one map-side-combined aggregation (grouping key ⊇
    * partition key), never a pass per lag.
    */
  def lagAutocorr(df: DataFrame, entity: String, ts: String,
      valueCol: String, lags: Seq[Int],
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1),
      s"lagAutocorr: lags must be >= 1, got $lags")
    require(lags.distinct.size == lags.size,
      s"lagAutocorr: duplicate lags: $lags")
    val spec = Window.partitionBy(col(entity))
      .orderBy((col(ts) +: tieBreak.map(col)).map(_.asc): _*)
    val m = microUnits(cleanDouble(valueCol))
    val base = df
      .filter(col(entity).isNotNull && col(ts).isNotNull)
      .select(col(entity) +: m.as("__y") +:
        lags.map(k => lag(m, k).over(spec).as(s"__x$k")): _*)
    def d19(c: Column) = c.cast("decimal(19,0)")
    def d38(c: Column) = c.cast("decimal(38,0)")
    val aggs = lags.flatMap { k =>
      val x = col(s"__x$k"); val y = col("__y")
      val ok = x.isNotNull && y.isNotNull
      def s(c: Column, nm: String) =
        sum(when(ok, c)).as(s"__${nm}_$k")
      Seq(count(when(ok, lit(1))).as(s"__n_$k"),
        s(d38(x), "sx"), s(d38(y), "sy"),
        s((d19(x) * d19(y)).cast("decimal(38,0)"), "sxy"),
        s((d19(x) * d19(x)).cast("decimal(38,0)"), "sxx"),
        s((d19(y) * d19(y)).cast("decimal(38,0)"), "syy"))
    }
    val rolled = base.groupBy(col(entity))
      .agg(aggs.head, aggs.tail: _*)
    val perLag = lags.map { k =>
      val n = col(s"__n_$k").cast("decimal(38,0)")
      val num = n * col(s"__sxy_$k") -
        col(s"__sx_$k") * col(s"__sy_$k")
      val dx = n * col(s"__sxx_$k") -
        col(s"__sx_$k") * col(s"__sx_$k")
      val dy = n * col(s"__syy_$k") -
        col(s"__sy_$k") * col(s"__sy_$k")
      val r = when(col(s"__n_$k") >= 2 && dx > 0 && dy > 0,
        num.cast("double") /
          (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))))
      struct(lit(k).cast("int").as("lag"),
        col(s"__n_$k").as("n_pairs"), r.as("acf"))
    }
    rolled.select(col(entity),
      explode(array(perLag: _*)).as("__l"))
      .select(col(entity), col("__l.lag").as("lag"),
        col("__l.n_pairs").as("n_pairs"), col("__l.acf").as("acf"))
  }

  /** Per-event MONOTONE-RUN momentum — `<value>_dir` (−1/0/+1 sign
    * of the step from the nearest PRIOR OBSERVED reading, the same
    * observed-prior carry as [[rateOfChange]]) and
    * `<value>_dir_run` (how many consecutive observed steps have
    * had this same direction): "price has risen 5 readings in a
    * row" as a point-in-time feature. The first observed reading
    * of an entity has no step (null dir, null run); missing
    * readings (null/NaN) carry nothing, break nothing, and read
    * nulls.
    *
    * Exactness: direction is a sign on exact integer micro-units
    * (never a float subtraction), runs are pure integer window
    * counts. Scale shape: ONE entity exchange; the carry, the
    * run-boundary running sum, and the (entity, run) ordinal all
    * hash-satisfy on it.
    */
  def monotoneRun(df: DataFrame, entity: String, ts: String,
      valueCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    requireFresh(df, "monotoneRun", "__dir", "__run",
      s"${valueCol}_dir", s"${valueCol}_dir_run")
    val ord = (col(ts) +: tieBreak.map(col)).map(_.asc)
    val prior = Window.partitionBy(col(entity)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val running = Window.partitionBy(col(entity)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val m = microUnits(cleanDouble(valueCol))
    val pv = last(m, ignoreNulls = true).over(prior)
    val dir = when(m.isNotNull && pv.isNotNull,
      signum(m - pv).cast("int"))
    val base = df.select(df.columns.map(col).toIndexedSeq :+
      dir.as("__dir"): _*)
    val pd = last(col("__dir"), ignoreNulls = true).over(prior)
    val isNew = when(col("__dir").isNotNull &&
      (pd.isNull || col("__dir") =!= pd), 1L).otherwise(0L)
    val marked = base.select(base.columns.map(col).toIndexedSeq :+
      sum(isNew).over(running).as("__run"): _*)
    val runOrd = Window
      .partitionBy(col(entity), col("__run")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val runLen = when(col("__dir").isNotNull,
      count(col("__dir")).over(runOrd))
    marked.select(df.columns.map(col).toIndexedSeq ++ Seq(
      col("__dir").as(s"${valueCol}_dir"),
      runLen.as(s"${valueCol}_dir_run")): _*)
  }

  /** Per-event EXPANDING OLS trend — the running regression slope
    * (`<value>_trend`, value units per SECOND) over ALL of the
    * entity's observations up to and including this row: the
    * PIT-safe "how fast is this account growing as of now" feature
    * that [[trendFit]] reports once per entity at corpus close.
    * Rows before the second observation, zero time spread, and
    * missing readings read null.
    *
    * Exactness: time is centered on the entity's FIRST row's
    * instant (a per-entity constant — slope-invariant, and it keeps
    * Σt² inside decimal(38,0) where raw epoch micros would
    * overflow); values are exact micro-units; the five expanding
    * moments are exact decimal window sums and the slope is ONE
    * double division. Scale shape: one entity exchange, all six
    * running registers on the same sort.
    */
  def expandingTrend(df: DataFrame, entity: String, ts: String,
      valueCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    requireFresh(df, "expandingTrend", s"${valueCol}_trend")
    val ord = (col(ts) +: tieBreak.map(col)).map(_.asc)
    val running = Window.partitionBy(col(entity)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tus = unix_micros(col(ts).cast("timestamp"))
    val m = microUnits(cleanDouble(valueCol))
    val t0 = first(tus).over(running)
    val ct = tus - t0
    def d19(c: Column) = c.cast("decimal(19,0)")
    def d38(c: Column) = c.cast("decimal(38,0)")
    val ok = m.isNotNull
    val n = count(when(ok, lit(1))).over(running)
    val st = sum(when(ok, d38(ct))).over(running)
    val sv = sum(when(ok, d38(m))).over(running)
    val stt = sum(when(ok,
      (d19(ct) * d19(ct)).cast("decimal(38,0)"))).over(running)
    val stv = sum(when(ok,
      (d19(ct) * d19(m)).cast("decimal(38,0)"))).over(running)
    val n38 = n.cast("decimal(38,0)")
    val num = n38 * stv - st * sv
    val den = n38 * stt - st * st
    val slope = when(ok && n >= 2 && den > 0,
      num.cast("double") / den.cast("double"))
    df.select(df.columns.map(col).toIndexedSeq :+
      slope.as(s"${valueCol}_trend"): _*)
  }

  /** ONE-PASS per-event FEATURE MATRIX — the composed serve-time
    * block: in-session position ([[sessionPosition]]),
    * recency-by-type ([[recencyByType]]), monotone-run momentum
    * ([[monotoneRun]]) and the expanding OLS trend
    * ([[expandingTrend]]) attached to every event in a SINGLE plan.
    * Every constituent window partitions by the entity (or an
    * entity-prefixed key), so Catalyst plans the whole matrix on
    * ONE exchange — stacked sorts, zero extra shuffles — which is
    * the difference between one pass and four over 100 TB of
    * events. Rows with a null entity or timestamp are dropped up
    * front (each constituent would exclude them anyway; dropping
    * once keeps the contract uniform).
    */
  def featureMatrix(df: DataFrame, entity: String, ts: String,
      valueCol: String, typeCol: String, types: Seq[String],
      gapSeconds: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    val base = df.filter(col(entity).isNotNull && col(ts).isNotNull)
    expandingTrend(
      monotoneRun(
        recencyByType(
          sessionPosition(base, entity, ts, gapSeconds, tieBreak),
          entity, ts, typeCol, types, tieBreak),
        entity, ts, valueCol, tieBreak),
      entity, ts, valueCol, tieBreak)
  }

  /** Per-event TYPE NOVELTY — `type_ordinal` (1-based: this is the
    * entity's n-th event of THIS type, counting itself) and
    * `us_since_first_of_type` (exact integer micros since the
    * entity's first event of this type; 0 on the first): the
    * "is this action new for this user" bit plus how long the
    * habit has existed — PIT-safe by construction (both read only
    * the running past). One exchange; the (entity, type) windows
    * hash-satisfy on the entity partitioning.
    */
  def typeNovelty(df: DataFrame, entity: String, ts: String,
      typeCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    requireFresh(df, "typeNovelty", "type_ordinal",
      "us_since_first_of_type")
    val ord = (col(ts) +: tieBreak.map(col)).map(_.asc)
    val wt = Window.partitionBy(col(entity), col(typeCol))
      .orderBy(ord: _*)
    val running = wt.rowsBetween(Window.unboundedPreceding, 0)
    val tus = unix_micros(col(ts).cast("timestamp"))
    df.select(df.columns.map(col).toIndexedSeq ++ Seq(
      row_number().over(wt).cast("long").as("type_ordinal"),
      (tus - min(tus).over(running))
        .as("us_since_first_of_type")): _*)
  }

  /** Per-entity PARTIAL autocorrelation at lag 2 — the
    * Durbin–Levinson step over [[lagAutocorr]]'s exact moments:
    * `pacf2 = (r₂ − r₁²) / (1 − r₁²)`, the "is there genuine
    * two-step memory once one-step momentum is removed" feature
    * that separates AR(1) processes (pacf2 ≈ 0) from AR(2).
    * Refuses (null) when either ACF refused or r₁² = 1 (a
    * perfectly one-step-correlated series has no residual to
    * explain). Both r's ride the exact decimal moment chains, so
    * the combined double expression is engine-exact.
    */
  def pacf2(df: DataFrame, entity: String, ts: String,
      valueCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val acf = lagAutocorr(df, entity, ts, valueCol, Seq(1, 2),
      tieBreak)
    val rolled = acf.groupBy(col(entity)).agg(
      max(when(col("lag") === 1, col("acf"))).as("acf1"),
      max(when(col("lag") === 2, col("acf"))).as("acf2"),
      max(when(col("lag") === 2, col("n_pairs"))).as("n_pairs2"))
    val r1 = col("acf1"); val r2 = col("acf2")
    val den = lit(1.0) - r1 * r1
    rolled.select(col(entity), col("n_pairs2"),
      r1, r2,
      when(r1.isNotNull && r2.isNotNull && den > 0,
        (r2 - r1 * r1) / den).as("pacf2"))
  }

  /** LEAKAGE-FREE expanding target mean: for each row, the mean of
    * `valueCol` over all STRICTLY EARLIER rows of the same `keyCol`
    * (frame ends at 1 PRECEDING — the row never sees its own label,
    * and no row ever sees the future). This is the temporal form of
    * target encoding: where [[graft.operators.GroupOps.oofMeanResponse]]
    * blinds each row via folds, this blinds it via time — the
    * encoding a deployed model would actually have had at that
    * instant. Rows with no history get null (plus a `_n` history
    * count so the consumer can gate on support).
    *
    * Engine-portable by construction: the expanding sum runs in
    * integer micro-units (`round(value*1e6)` as BIGINT) so no float
    * summation-order drift exists to worry about; the single divide
    * happens per row at readout. One shared (key, ts) window — one
    * exchange, one sort, running-frame aggregation (O(1) state per
    * row, not O(history)).
    */
  def expandingMean(df: DataFrame, keyCol: String, ts: String,
      valueCol: String, out: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val spec = Window.partitionBy(col(keyCol))
      .orderBy((col(ts) +: tieBreak.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // NaN is a MISSING label, not a zero: clean first so the count
    // and the sum agree on which rows are history
    val clean = cleanDouble(valueCol)
    val micros = microUnits(clean)
    val s = sum(micros).over(spec)
    val n = count(clean).over(spec)
    val enc = when(n === 0, lit(null).cast("double"))
      .otherwise(s.cast("double") / n.cast("double") / lit(1e6))
    df.select(df.columns.map(col).toIndexedSeq ++
      Seq(enc.as(out), n.as(s"${out}_n")): _*)
  }

  /** Time-weighted linear interpolation fill: a null value takes
    * `vp + (vn - vp) * (t - tp) / (tn - tp)` between the nearest
    * previous and next non-null observations of the same entity
    * (pandas `interpolate(method="time")`): the gap-filling imputer
    * for irregular sensor/feature series where [[forwardFill]]'s
    * step function distorts trends. Edges degrade gracefully: a
    * leading null backfills, a trailing null forward-fills, an
    * all-null entity stays null. Should two observations share one
    * timestamp (tn == tp), the previous value wins rather than
    * dividing by zero.
    *
    * All four carried scalars (prev/next value and micro-timestamp)
    * come from TWO frames over the SAME (entity, ts) window — one
    * exchange, one sort, O(1) running state; the interpolation is a
    * codegen'd projection with integer-microsecond time deltas, so
    * both engines compute the identical double expression.
    */
  def interpolateFill(df: DataFrame, entity: String, ts: String,
      valueCol: String, out: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = col(ts) +: tieBreak.map(col)
    val prevSpec = Window.partitionBy(col(entity)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val nextSpec = Window.partitionBy(col(entity)).orderBy(order: _*)
      .rowsBetween(1, Window.unboundedFollowing)
    // NaN is a missing reading (module contract): a NaN row must be
    // interpolated over, never carried as a neighbor value
    val v = cleanDouble(valueCol)
    val tUs = unix_micros(col(ts).cast("timestamp"))
    val vp = last(when(v.isNotNull, v), ignoreNulls = true).over(prevSpec)
    val tp = last(when(v.isNotNull, tUs), ignoreNulls = true).over(prevSpec)
    val vn = first(when(v.isNotNull, v), ignoreNulls = true).over(nextSpec)
    val tn = first(when(v.isNotNull, tUs), ignoreNulls = true).over(nextSpec)
    val interp = when(tn === tp, vp).otherwise(
      vp + (vn - vp) *
        ((tUs - tp).cast("double") / (tn - tp).cast("double")))
    val filled = when(v.isNotNull, v)
      .when(vp.isNotNull && vn.isNotNull, interp)
      .when(vp.isNotNull, vp)
      .otherwise(vn)
    df.select(df.columns.map(col).toIndexedSeq :+ filled.as(out): _*)
  }

  /** Survival-label generation: for every row, the time (exact
    * integer MICROSECONDS) until the entity's next row satisfying
    * `targetFlag`, RIGHT-CENSORED at `horizonSeconds`:
    *
    *   tte_us    = min(t_nextTarget - t, horizon)   (horizon if none)
    *   observed  = a target event actually occurred within horizon
    *
    * — the (duration, event) label pair survival/churn models train
    * on (Kaplan-Meier, Cox, gradient-boosted survival), generated
    * leakage-consciously: the label looks STRICTLY forward (frame
    * starts at 1 FOLLOWING), and the censoring horizon is what makes
    * rows near the data's edge usable at all (an uncensored "no
    * event yet" would silently become "never").
    *
    * One carried scalar over the shared (entity, ts) window; all
    * arithmetic is integer microseconds — nothing to drift.
    */
  def timeToNextEvent(df: DataFrame, entity: String, ts: String,
      targetFlag: Column, horizonSeconds: Long,
      outPrefix: String = "tte", tieBreak: Seq[String] = Nil)
      : DataFrame = {
    require(horizonSeconds > 0,
      s"timeToNextEvent: horizon > 0, got $horizonSeconds")
    val spec = Window.partitionBy(col(entity))
      .orderBy((col(ts) +: tieBreak.map(col)): _*)
      .rowsBetween(1, Window.unboundedFollowing)
    val tUs = unix_micros(col(ts).cast("timestamp"))
    val hUs = horizonSeconds * 1000000L
    val tn = first(when(targetFlag, tUs), ignoreNulls = true).over(spec)
    val gap = tn - tUs
    df.select(df.columns.map(col).toIndexedSeq ++ Seq(
      when(gap.isNotNull && gap <= hUs, gap).otherwise(lit(hUs))
        .as(s"${outPrefix}_us"),
      coalesce(gap <= hUs, lit(false)).as(s"${outPrefix}_observed"))
      : _*)
  }

  /** Rolling z-score anomaly flag: each reading scored against the
    * mean/std of its entity's PRIOR `k` readings (frame ends at 1
    * PRECEDING — the spike never inflates its own yardstick, the
    * standard trailing-baseline anomaly screen for per-entity
    * telemetry). Needs at least `minObs` prior readings and a
    * non-zero baseline std, else null z and no flag.
    *
    * Exactness discipline: frame sums run in integer micro-units
    * with the squared sums widened to decimal(38,0) (same rationale
    * as [[gapStats]]); only the final mean/var/z divisions are
    * floats, in an operand order the oracle mirrors. z is
    * scale-free, so the micro-unit factor cancels.
    */
  def rollingZScore(df: DataFrame, entity: String, ts: String,
      valueCol: String, k: Int, cutoff: Double = 3.0,
      minObs: Int = 2, tieBreak: Seq[String] = Nil): DataFrame = {
    require(k >= minObs && minObs >= 2,
      s"rollingZScore: need k >= minObs >= 2, got k=$k minObs=$minObs")
    require(cutoff > 0, s"rollingZScore: cutoff > 0, got $cutoff")
    val spec = Window.partitionBy(col(entity))
      .orderBy((col(ts) +: tieBreak.map(col)): _*)
      .rowsBetween(-k, -1)
    val clean = cleanDouble(valueCol)
    val m = microUnits(clean)
    val n = count(clean).over(spec)
    val s = sum(m).over(spec)
    val sq = sum((m.cast("decimal(19,0)") * m.cast("decimal(19,0)"))
      .cast("decimal(38,0)")).over(spec)
    val meanM = s.cast("double") / n.cast("double")
    val varM = sq.cast("double") / n.cast("double") - meanM * meanM
    val stdM = sqrt(greatest(varM, lit(0.0)))
    val z = when(clean.isNull || n < minObs, lit(null).cast("double"))
      .otherwise(when(stdM === 0.0, lit(null).cast("double"))
        .otherwise((m.cast("double") - meanM) / stdM))
    df.select(df.columns.map(col).toIndexedSeq ++ Seq(
      z.as(s"${valueCol}_rz"),
      coalesce(abs(z) > lit(cutoff), lit(false))
        .as(s"${valueCol}_anomaly")): _*)
  }

  /** Trailing co-movement features between two numeric series per
    * entity: Pearson correlation and OLS slope (beta of y on x) over
    * the entity's PRIOR `k` readings — the frame ends 1 row before
    * the current one, so like [[rollingZScore]] the feature never
    * reads its own row and is leakage-clean by construction.
    *
    * Pairwise-complete: a frame row contributes only when BOTH
    * readings are present (null/NaN = missing, per [[cleanDouble]]).
    * Exact by construction: all six frame moments
    * (n, Σx, Σy, Σx², Σy², Σxy) are integer micro-unit sums
    * (decimal(38,0) — order-independent, so the result is invariant
    * to partitioning), and corr/beta divide those exact integers in
    * one fixed double expression:
    * corr = (nΣxy−ΣxΣy) / sqrt((nΣx²−(Σx)²)(nΣy²−(Σy)²)),
    * beta = (nΣxy−ΣxΣy) / (nΣx²−(Σx)²).
    * n < minObs or zero variance → null (for integers
    * nΣx²−(Σx)² = Σᵢ<ⱼ(xᵢ−xⱼ)² ≥ 0 exactly, so the ≤ 0 guard IS the
    * zero-variance test — no float fuzz). One shared
    * (entity, ts, tieBreak) window: stacking with the other ops here
    * keeps the single-Exchange shape.
    */
  /** Exact trailing TIME-weighted mean (TWAP) of a hold-previous
    * step signal: each observation holds until the next row's
    * instant, and every row reads the time-weighted average of the
    * held signal from its entity's first OBSERVED instant up to now —
    * the irregular-sampling average that a row-weighted mean gets
    * wrong whenever sampling is bursty (a sensor that reports 100×/s
    * while alarming must not dominate its own hourly average).
    *
    *   twm_t = Σ_{i<t} held_i·(t_{i+1}−t_i) / Σ_{i<t} (t_{i+1}−t_i)
    *           (segments with no observation yet are excluded
    *            from numerator AND denominator)
    *
    * A missing (null/NaN) reading is hold-previous: the prior
    * observation keeps accruing through it. Rows before the first
    * observation read null (no covered time). Exact by construction:
    * the integrand is integer micro-units × integer micro-seconds
    * widened to decimal(38,0) — order-independent, one double
    * division at readout. One (entity, ts, tieBreak) window for the
    * carry, the lead, and both running sums → one exchange.
    */
  def timeWeightedMean(df: DataFrame, entity: String, ts: String,
      valueCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val ord = (col(ts) +: tieBreak.map(col)).map(_.asc)
    val spec = Window.partitionBy(col(entity)).orderBy(ord: _*)
    val run = spec.rowsBetween(Window.unboundedPreceding, 0)
    val prior = spec.rowsBetween(Window.unboundedPreceding, -1)
    val tus = unix_micros(col(ts).cast("timestamp"))
    val m = microUnits(cleanDouble(valueCol))
    val held = last(m, ignoreNulls = true).over(run)
    val dt = lead(tus, 1).over(spec) - tus
    def d19(c: Column) = c.cast("decimal(19,0)")
    val contrib = when(held.isNotNull,
      (d19(held) * d19(dt)).cast("decimal(38,0)"))
    val covered = when(held.isNotNull, dt)
    val cum = sum(contrib).over(prior)
    val cov = sum(covered).over(prior)
    val twm = when(cov.isNotNull && cov > 0,
      cum.cast("double") / cov.cast("double") / lit(1e6))
    df.select(df.columns.map(col).toIndexedSeq :+
      twm.as(s"${valueCol}_twm"): _*)
  }

  /** Within-entity exact percentile rank of a value column —
    * `<value>_pct = (rank − 1) / (n_obs − 1)` ∈ [0, 1], where
    * `rank` is the SQL RANK (ties share the smallest rank) among
    * the entity's NON-NULL observations only: missing readings
    * (null/NaN) read null and never count in `n_obs`, unlike the
    * built-in `percent_rank` whose denominator counts every
    * partition row. This is the rank-normalization step feature
    * stores apply before monotone models; integers end to end with
    * ONE double division at readout, so an oracle replaying
    * `(rank − 1) / (n − 1)` agrees exactly. Entities with a single
    * observation refuse (null), never 0/0.
    *
    * Scale shape: one entity exchange; the rank window (orderBy
    * value NULLS FIRST) and the two unordered-frame counts all ride
    * it. Rank is ORDER-only — no arithmetic on the value — so
    * double vs decimal representation cannot split ties
    * differently across engines.
    */
  def rankNormalize(df: DataFrame, entity: String,
      valueCol: String): DataFrame = {
    requireFresh(df, "rankNormalize", s"${valueCol}_pct")
    val v = cleanDouble(valueCol)
    val part = Window.partitionBy(col(entity))
    val ranked = rank().over(part.orderBy(v.asc_nulls_first))
    val nNull = count(when(v.isNull, lit(1))).over(part)
    val nObs = count(v).over(part)
    val r = ranked - nNull // rank among non-null observations
    val pct = when(v.isNotNull && nObs >= 2,
      (r - 1).cast("double") / (nObs - 1).cast("double"))
    df.select(df.columns.map(col).toIndexedSeq :+
      pct.as(s"${valueCol}_pct"): _*)
  }

  /** Whole-history per-entity OLS trend fit — ONE row per entity
    * with `n_obs`, `trend_slope` (value units per second),
    * `trend_intercept` (fitted value at the entity's first instant)
    * and `r2` — the global-trend companion of [[rollingCorr]]'s
    * per-event local beta (q263): feature stores keep both (is the
    * account growing at all vs is it accelerating right now).
    *
    * Exactness: time is CENTERED per entity (t − min(t), a window
    * min that rides the same entity exchange as the rollup) so the
    * integer moments Σt, Σt², Σtv stay inside decimal(38,0) even
    * with epoch-microsecond inputs — uncentered Σt² at 10^4 events
    * would need ~10^35·n and overflow. Values are exact micro-units.
    * slope = (nΣtv−ΣtΣv)/(nΣt²−(Σt)²) lands in value-per-second
    * DIRECTLY (micro-value per micro-second), one double division;
    * degenerate entities (n < 2 or zero time spread) refuse with
    * nulls. Missing (null/NaN) values are excluded observations.
    */
  def trendFit(df: DataFrame, entity: String, ts: String,
      valueCol: String): DataFrame = {
    val spec = Window.partitionBy(col(entity))
    val tus = unix_micros(col(ts).cast("timestamp"))
    val v = cleanDouble(valueCol)
    val m = microUnits(v)
    val dt = when(m.isNotNull, tus - min(tus).over(spec))
    def d19(c: Column) = c.cast("decimal(19,0)")
    def d38(c: Column) = c.cast("decimal(38,0)")
    val withM = df
      .filter(col(entity).isNotNull && col(ts).isNotNull)
      .select(col(entity), dt.as("__t"), m.as("__m"))
    val agg = withM.groupBy(col(entity)).agg(
      count(col("__m")).as("n_obs"),
      d38(sum(col("__t"))).as("__st"),
      d38(sum(col("__m"))).as("__sv"),
      sum((d19(col("__t")) * d19(col("__t"))).cast("decimal(38,0)"))
        .as("__stt"),
      sum((d19(col("__t")) * d19(col("__m"))).cast("decimal(38,0)"))
        .as("__stv"),
      sum((d19(col("__m")) * d19(col("__m"))).cast("decimal(38,0)"))
        .as("__svv"))
    val n38 = col("n_obs").cast("decimal(38,0)")
    val num = n38 * col("__stv") - col("__st") * col("__sv")
    val den = n38 * col("__stt") - col("__st") * col("__st")
    val dvv = n38 * col("__svv") - col("__sv") * col("__sv")
    val nullD = lit(null).cast("double")
    val slope = when(col("n_obs") < 2 || den <= 0, nullD)
      .otherwise(num.cast("double") / den.cast("double"))
    val intercept = when(col("n_obs") < 2 || den <= 0, nullD)
      .otherwise((col("__sv").cast("double") -
        num.cast("double") / den.cast("double") *
          col("__st").cast("double")) /
        col("n_obs").cast("double") / lit(1e6))
    val r2 = when(col("n_obs") < 2 || den <= 0 || dvv <= 0, nullD)
      .otherwise(num.cast("double") * num.cast("double") /
        (den.cast("double") * dvv.cast("double")))
    agg.select(col(entity), col("n_obs"), slope.as("trend_slope"),
      intercept.as("trend_intercept"), r2.as("r2"))
  }

  /** Irregular-interval discrete derivatives — per-row VELOCITY
    * `(v_t − v_prev) / Δt_s` against the nearest PRIOR OBSERVED
    * reading, and ACCELERATION as the same difference quotient over
    * the velocity series. The spike/trend-change primitive for
    * sensor and spend series where fixed-lag differences are
    * meaningless under bursty sampling (a 1-second and a 1-week gap
    * must not produce comparable "deltas").
    *
    * Missing (null/NaN) readings carry nothing: they emit null
    * derivatives and the next observation differentiates against the
    * last OBSERVED row (not the null). A zero time step (same-instant
    * tie) refuses with null rather than ±Inf. Two stacked
    * projections on the SAME (entity, ts, tie) window (window-in-
    * window is illegal; both ride one exchange + one sort); the
    * double chain `(v−pv) / ((t−pt)/1e6)` is fixed for the oracle.
    */
  def rateOfChange(df: DataFrame, entity: String, ts: String,
      valueCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val ord = (col(ts) +: tieBreak.map(col)).map(_.asc)
    val spec = Window.partitionBy(col(entity)).orderBy(ord: _*)
    val prior = spec.rowsBetween(Window.unboundedPreceding, -1)
    val tus = unix_micros(col(ts).cast("timestamp"))
    val v = cleanDouble(valueCol)
    def diffQuotient(cur: Column, curOk: Column, prevV: Column,
        prevT: Column): Column =
      when(curOk && prevV.isNotNull && tus > prevT,
        (cur - prevV) / ((tus - prevT).cast("double") / lit(1e6)))
    val pv = last(when(v.isNotNull, v), ignoreNulls = true).over(prior)
    val pt = last(when(v.isNotNull, tus), ignoreNulls = true)
      .over(prior)
    val step1 = df.select(df.columns.map(col).toIndexedSeq :+
      diffQuotient(v, v.isNotNull, pv, pt)
        .as(s"${valueCol}_d1"): _*)
    val d1 = col(s"${valueCol}_d1")
    val pd1 = last(when(d1.isNotNull, d1), ignoreNulls = true)
      .over(prior)
    val pdt = last(when(d1.isNotNull, tus), ignoreNulls = true)
      .over(prior)
    step1.select(step1.columns.map(col).toIndexedSeq :+
      diffQuotient(d1, d1.isNotNull, pd1, pdt)
        .as(s"${valueCol}_d2"): _*)
  }

  def rollingCorr(df: DataFrame, entity: String, ts: String,
      xCol: String, yCol: String, k: Int, minObs: Int = 2,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(k >= minObs && minObs >= 2,
      s"rollingCorr: need k >= minObs >= 2, got k=$k minObs=$minObs")
    require(xCol != yCol, s"rollingCorr: xCol == yCol ($xCol)")
    val spec = Window.partitionBy(col(entity))
      .orderBy((col(ts) +: tieBreak.map(col)): _*)
      .rowsBetween(-k, -1)
    val both = cleanDouble(xCol).isNotNull && cleanDouble(yCol).isNotNull
    val mx = when(both, microUnits(cleanDouble(xCol)))
    val my = when(both, microUnits(cleanDouble(yCol)))
    def d19(c: Column) = c.cast("decimal(19,0)")
    def d38(c: Column) = c.cast("decimal(38,0)")
    val n = count(mx).over(spec)
    val sx = d38(sum(mx).over(spec))
    val sy = d38(sum(my).over(spec))
    val sxx = sum((d19(mx) * d19(mx)).cast("decimal(38,0)")).over(spec)
    val syy = sum((d19(my) * d19(my)).cast("decimal(38,0)")).over(spec)
    val sxy = sum((d19(mx) * d19(my)).cast("decimal(38,0)")).over(spec)
    val n38 = d38(n)
    val num = n38 * sxy - sx * sy
    val dx = n38 * sxx - sx * sx
    val dy = n38 * syy - sy * sy
    val nullD = lit(null).cast("double")
    val corr = when(n < minObs || dx <= 0 || dy <= 0, nullD)
      .otherwise(num.cast("double") /
        sqrt(dx.cast("double") * dy.cast("double")))
    val beta = when(n < minObs || dx <= 0, nullD)
      .otherwise(num.cast("double") / dx.cast("double"))
    df.select(df.columns.map(col).toIndexedSeq ++ Seq(
      corr.as(s"${xCol}_${yCol}_corr"),
      beta.as(s"${xCol}_${yCol}_beta")): _*)
  }

  /** Running-peak features per entity: the expanding maximum of the
    * series, the drawdown from it, and the age of the peak — "how
    * far and how long below the best seen so far", the classic
    * decay/staleness trio for monitoring a KPI, a model metric, or
    * an account balance.
    *
    * Exact: the running max runs over integer micro-units,
    * `<value>_drawdown_micros = runmax − v` is an exact BIGINT, and
    * `<value>_rows_since_peak` counts rows after the LATEST
    * occurrence of the running max (a re-touch resets the age —
    * max_by on the (value, row_number) pair, ties to the newest).
    * Missing (null/NaN) readings emit a null drawdown but still
    * occupy rows and still age the peak (before any peak exists,
    * everything is null). One
    * (entity, ts, tieBreak) window — stacks with the other ops here
    * on a single exchange.
    */
  def drawdown(df: DataFrame, entity: String, ts: String,
      valueCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val spec = Window.partitionBy(col(entity))
      .orderBy((col(ts) +: tieBreak.map(col)): _*)
    val frame = spec.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val clean = cleanDouble(valueCol)
    val m = microUnits(clean)
    val rn = row_number().over(spec)
    val runMax = max(m).over(frame)
    val peakRn = max_by(when(m.isNotNull, rn),
      when(m.isNotNull, struct(m.as("m"), rn.as("rn")))).over(frame)
    df.select(df.columns.map(col).toIndexedSeq ++ Seq(
      (runMax.cast("double") / lit(1e6))
        .as(s"${valueCol}_runmax"),
      when(m.isNull, lit(null).cast("long"))
        .otherwise(runMax - m).as(s"${valueCol}_drawdown_micros"),
      when(runMax.isNull, lit(null).cast("int"))
        .otherwise(rn - peakRn).as(s"${valueCol}_rows_since_peak"))
      : _*)
  }

  /** Forward label window: per row, aggregate of a value over the
    * entity's STRICTLY FUTURE rows within `horizonSeconds` — the
    * regression-label companion of [[timeToNextEvent]] ("spend in
    * the next 7 days", "events in the next hour"): the as-of join
    * guarantees features read only the past; this is its mirror,
    * labels reading only the future, the two sides of a
    * leakage-clean training row. Strictness: the frame starts 1
    * MICROSECOND after the row's own instant, so same-instant rows
    * (and the row itself) never leak into their own label.
    *
    * Exact by construction: `<label>_micros` sums
    * `round(value*1e6)` as BIGINT over the range frame,
    * `<label>_n` counts contributing rows; one shared
    * (entity, micros) window.
    */
  def labelWindow(df: DataFrame, entity: String, ts: String,
      valueCol: String, horizonSeconds: Long,
      outPrefix: String = "label"): DataFrame = {
    require(horizonSeconds > 0,
      s"labelWindow: horizon > 0, got $horizonSeconds")
    val tUs = unix_micros(col(ts).cast("timestamp"))
    val spec = Window.partitionBy(col(entity)).orderBy(tUs)
      .rangeBetween(1L, horizonSeconds * 1000000L)
    val clean = cleanDouble(valueCol)
    val micros = microUnits(clean)
    df.select(df.columns.map(col).toIndexedSeq ++ Seq(
      coalesce(sum(micros).over(spec), lit(0L))
        .as(s"${outPrefix}_micros"),
      count(clean).over(spec).as(s"${outPrefix}_n")): _*)
  }

  /** Per-entity lifetime features: exact integer-us account age
    * (`t - first_seen`), 1-based event sequence number, total event
    * count, and lifetime share (`age / full_span`).
    *
    * LEAKAGE NOTE, explicit: `age_us` and `event_seq` read only the
    * past — safe as training features at time t. `n_total` and
    * `life_frac` read the entity's FULL history (the denominator
    * includes the future) — they are RETROSPECTIVE cohort/analysis
    * features; training on them at time t leaks end-of-history
    * information. Named outputs keep the two classes apart.
    *
    * One (entity) exchange serves both the ordered and unordered
    * window shapes; singleton entities report life_frac null (no
    * span to share).
    */
  def lifetimeFeatures(df: DataFrame, entity: String, ts: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val ord = col(ts) +: tieBreak.map(col)
    val wOrd = Window.partitionBy(col(entity)).orderBy(ord: _*)
    val wAll = Window.partitionBy(col(entity))
    val tUs = unix_micros(col(ts).cast("timestamp"))
    val first = min(tUs).over(wAll)
    val span = max(tUs).over(wAll) - first
    val age = tUs - first
    df.select(df.columns.map(col).toIndexedSeq ++ Seq(
      age.as("age_us"),
      row_number().over(wOrd).as("event_seq"),
      count(lit(1)).over(wAll).as("n_total"),
      when(span > 0, age.cast("double") / span.cast("double"))
        .as("life_frac")): _*)
  }

  /** Per-entity inter-event gap statistics — the cadence features
    * (how often does this user act, how bursty) behavioral models
    * consume: consecutive (ts, id)-ordered gaps in exact integer
    * MICROSECONDS, reduced per entity to count/min/max/mean/std.
    *
    * Exactness: gaps are integer subtractions; the sum is a long
    * (bounded by the entity's total time span); the sum of SQUARES is
    * widened to decimal(38,0) BEFORE summing (a week-long gap squared
    * is ~3.6e23 — past long range), so every accumulated moment is
    * exact and only the final mean/std divisions are floats.
    * Population std via E[X^2]-E[X]^2 on exact totals (same
    * rationale as [[graft.multimodal.Multimodal.channelNormalization]]).
    * Entities with a single event report zero gaps and null stats.
    *
    * Shape: ONE (entity, ts) window (shared exchange with every op
    * here) for the lag, then one map-side-combined groupBy(entity) —
    * the exchange after the window carries |entities| rows.
    */
  def gapStats(df: DataFrame, entity: String, ts: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val spec = Window.partitionBy(col(entity))
      .orderBy((col(ts) +: tieBreak.map(col)): _*)
    val tUs = unix_micros(col(ts).cast("timestamp"))
    val gap = (tUs - lag(tUs, 1).over(spec)).as("__gap")
    val n = count(col("__gap")).as("n_gaps")
    val mean = when(count(col("__gap")) > 0,
      sum(col("__gap")).cast("double") /
        count(col("__gap")).cast("double"))
    val sq = sum((col("__gap").cast("decimal(19,0)") *
      col("__gap").cast("decimal(19,0)")).cast("decimal(38,0)"))
    df.select(col(entity), gap)
      .groupBy(col(entity))
      .agg(count(lit(1)).as("n_events"), n,
        min(col("__gap")).as("gap_min_us"),
        max(col("__gap")).as("gap_max_us"),
        mean.as("gap_mean_us"),
        when(count(col("__gap")) > 0,
          sqrt(greatest(
            sq.cast("double") / count(col("__gap")).cast("double") -
              (sum(col("__gap")).cast("double") /
                count(col("__gap")).cast("double")) *
              (sum(col("__gap")).cast("double") /
                count(col("__gap")).cast("double")),
            lit(0.0)))).as("gap_std_us"))
  }

  /** Session-level feature rollup: [[sessionize]] then ONE map-side-
    * combined groupBy(entity, session) — the per-session training
    * features (duration, event count, type diversity, spend) a
    * behavioral model consumes instead of raw events. Output is
    * \|sessions\| rows; the groupBy's partial aggregation means the
    * post-window exchange carries sessions, not events.
    *
    * Engine-portable by construction: duration is an exact
    * MICROSECOND integer and `value_micros` sums `round(value * 1e6)`
    * as BIGINT (integer micro-units — immune to float summation
    * order; null values contribute 0).
    */
  def sessionFeatures(df: DataFrame, entity: String, ts: String,
      gapSeconds: Long, valueCol: String,
      typeCol: String): DataFrame = {
    val tUs = unix_micros(col(ts).cast("timestamp"))
    sessionize(df, entity, ts, gapSeconds)
      .groupBy(col(entity), col("session_id"))
      .agg(min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        (max(tUs) - min(tUs)).as("duration_us"),
        count(lit(1)).as("n_events"),
        count_distinct(col(typeCol)).as("n_event_types"),
        sum(coalesce(round(col(valueCol) * lit(1e6), 0).cast("long"),
          lit(0L))).as("value_micros"))
  }

  /** Fixed-grid resampling of an irregular per-entity series — the
    * pandas `resample('<w>s').ohlc()` + `ffill` shape: one bar per
    * `widthSeconds` bucket from each entity's first to last
    * observation, OHLC computed over the bucket's non-null (and
    * non-NaN, per the module's missing-reading contract) values,
    * EMPTY buckets synthesized with `close` carried from the last
    * non-empty bar. Columns: `bar_start_s` (bucket start, epoch
    * seconds — integer math end-to-end), `n` (non-null readings;
    * 0 for synthesized or all-null bars, whose open/high/low are
    * null), `open/high/low/close`.
    *
    * Same-instant determinism is the CALLER's contract: open/close
    * pick by min/max ts within the bucket, so (entity, ts) should be
    * unique (pre-aggregate duplicates first, as a feature pipeline
    * would anyway).
    *
    * Scale shape: ONE map-side-combined groupBy(entity, bucket) —
    * the exchange carries bars, not readings — then one
    * entity-partitioned window pass that (a) carries the last known
    * close and (b) SYNTHESIZES each gap's missing bars by exploding
    * a bounded `sequence` per gap: no grid table, no join, no
    * driver-side ranges. `maxGapBars` bounds the per-row array a
    * pathological gap could materialize (a year of 1-second bars in
    * one array is an OOM, not a feature) — crossing it fails loudly
    * inside the plan via `raise_error`, never silently truncates.
    */
  def resampleBars(df: DataFrame, entity: String, ts: String,
      valueCol: String, widthSeconds: Long,
      maxGapBars: Long = 1000000L): DataFrame = {
    require(widthSeconds > 0,
      s"resampleBars: widthSeconds > 0, got $widthSeconds")
    require(maxGapBars > 0,
      s"resampleBars: maxGapBars > 0, got $maxGapBars")
    val wUs = widthSeconds * 1000000L
    val clean = cleanDouble(valueCol)
    // min_by/max_by skip null ordering keys, so null/NaN readings
    // never win open/close; min/max skip nulls for high/low
    val ord = when(clean.isNotNull,
      struct(col(ts).cast("timestamp").as("t")))
    val bars = df
      .filter(col(entity).isNotNull && col(ts).isNotNull)
      .groupBy(col(entity),
        floor(unix_micros(col(ts).cast("timestamp")) / wUs)
          .cast("long").as("__b"))
      .agg(count(clean).as("n"),
        min_by(clean, ord).as("open"),
        max(clean).as("high"),
        min(clean).as("low"),
        max_by(clean, ord).as("__close_raw"))
    val spec = Window.partitionBy(col(entity)).orderBy(col("__b"))
    val carry = last(col("__close_raw"), ignoreNulls = true)
      .over(spec.rowsBetween(Window.unboundedPreceding, 0))
    val gap = lead(col("__b"), 1).over(spec) - col("__b") - 1
    val withCarry = bars
      .withColumn("close", carry)
      .withColumn("__gap", coalesce(gap, lit(0L)))
    val checked = withCarry.withColumn("__gap",
      when(col("__gap") > maxGapBars, raise_error(concat(
        lit(s"resampleBars: a gap of "), col("__gap"),
        lit(s" empty bars exceeds maxGapBars=$maxGapBars for " +
          s"entity "), col(entity).cast("string"))))
        .otherwise(col("__gap")))
    // each real bar emits itself (empty=false) plus one synthetic
    // bar per missing bucket until the entity's next real bar
    val emitted = checked.select(
      col(entity), col("n"), col("open"), col("high"), col("low"),
      col("close"),
      explode(concat(
        array(struct(col("__b").as("b"), lit(false).as("empty"))),
        when(col("__gap") > 0,
          transform(sequence(col("__b") + 1, col("__b") + col("__gap")),
            x => struct(x.as("b"), lit(true).as("empty"))))
          .otherwise(expr("array()")
            .cast("array<struct<b:bigint,empty:boolean>>"))))
        .as("__g"))
    emitted.select(
      col(entity),
      (col("__g.b") * widthSeconds).as("bar_start_s"),
      when(col("__g.empty"), lit(0L)).otherwise(col("n")).as("n"),
      when(col("__g.empty"), lit(null).cast("double"))
        .otherwise(col("open")).as("open"),
      when(col("__g.empty"), lit(null).cast("double"))
        .otherwise(col("high")).as("high"),
      when(col("__g.empty"), lit(null).cast("double"))
        .otherwise(col("low")).as("low"),
      col("close"))
  }
}
