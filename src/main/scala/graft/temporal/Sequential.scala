package graft.temporal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Per-entity SEQUENTIAL recurrences — the one windowed-feature shape
  * `Window` cannot express: state that both accumulates and RESETS
  * depending on its own previous value (`max(0, s + inc)` is not
  * prefix-sum decomposable), so no frame/cumulative trick applies.
  *
  * Execution is the classic secondary sort the BASELINE.json
  * north_rule calls for: ONE `repartition(entity)` exchange, an
  * in-partition `sortWithinPartitions(entity, ts, id)`, then a single
  * `mapPartitions` scan holding O(1) state per entity and resetting
  * at entity boundaries — no per-entity `groupByKey` materialization,
  * no driver involvement, entities stream through executors in sorted
  * runs. The inherent caveat of any sequential recurrence: one
  * entity's history is one task's work, so per-entity history length
  * (not total rows) bounds the critical path; entities themselves
  * scale out freely.
  *
  * Shared value hygiene: a null OR NaN reading is a MISSING reading
  * (never a zero, never poison) — each operator below documents what
  * "missing" does to its state. Rows must be unique per
  * (entity, ts, id); id breaks ts ties deterministically.
  */
object Sequential {

  /** The shared secondary-sort scan input: one exchange on the
    * (string-cast) entity, in-partition (entity, ts, id) sort,
    * value cast to double with NaN normalized to null (missing).
    */
  private def scanInput(df: DataFrame, entity: String, ts: String,
      idCol: String, value: Column)
      : Dataset[(String, Long, Long, Option[Double])] = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = value.cast("double")
    // ts/id/entity land in non-nullable encoder fields: guard with a
    // NAMED precondition rather than the encoder's opaque "Null value
    // appeared in non-nullable field" failure. The raise_error lives
    // INSIDE the kept `t` column so column pruning cannot drop it.
    val tGuarded = when(
      col(entity).isNull || col(ts).isNull || col(idCol).isNull,
      raise_error(lit(s"Sequential scan: null $entity/$ts/$idCol " +
        "row — entity, timestamp and id must be non-null for a " +
        "secondary-sort recurrence")).cast("long"))
      .otherwise(unix_micros(col(ts).cast("timestamp")))
    df.select(col(entity).cast("string").as("e"),
      tGuarded.as("t"),
      col(idCol).cast("long").as("id"),
      when(isnan(v), lit(null)).otherwise(v).as("x"))
      .as[(String, Long, Long, Option[Double])]
      .repartition(col("e"))
      .sortWithinPartitions(col("e"), col("t"), col("id"))
  }

  /** Irregular-interval exponentially-weighted MEAN (pandas
    * `ewm(halflife=..., times=...).mean()` semantics, the LEVEL
    * estimate where [[decayedSum]] is the unnormalized mass):
    *
    *   s_1 = x_1
    *   s_t = s_(t-1) + (1 - 2^(-dt/halfLife)) * (x_t - s_(t-1))
    *
    * — the recency-weighted average that converges to x under a
    * constant signal (a decayed SUM grows with rate), the standard
    * smoothed-level feature for irregular event streams. Same
    * secondary-sort scan as the other recurrences here; the fixed
    * `s + a*(x - s)` operand order is replayed verbatim by the
    * recursive-CTE oracle, so the float fold mirrors bit-exactly.
    *
    * Missing (null/NaN) readings emit a null mean and do NOT touch
    * the state — the clock between OBSERVATIONS drives the decay, so
    * `lastTs` also stays put.
    */
  def ewmMean(df: DataFrame, entity: String, ts: String,
      idCol: String, valueCol: String,
      halfLifeSeconds: Double): DataFrame = {
    require(halfLifeSeconds > 0,
      s"ewmMean: halfLife > 0, got $halfLifeSeconds")
    val spark = df.sparkSession
    import spark.implicits._
    val hlUs = halfLifeSeconds * 1e6
    scanInput(df, entity, ts, idCol, col(valueCol))
      .mapPartitions { it =>
        var cur: String = null
        var lastT = 0L
        var s = 0.0
        var fresh = true
        it.map { case (e, t, id, x) =>
          if (e != cur) { cur = e; fresh = true }
          val out: Option[Double] = x match {
            case None => None
            case Some(xv) =>
              s = if (fresh) xv
                else s + (1.0 - math.pow(0.5,
                  (t - lastT).toDouble / hlUs)) * (xv - s)
              fresh = false
              lastT = t
              Some(s)
          }
          (id, out)
        }
      }
      .toDF(idCol, "ewm_mean")
  }

  /** EXACT time-decayed feature recurrence, batch form:
    *
    *   s_t = x_t + s_(t-1) * 2^(-(ts_t - ts_(t-1)) / halfLife)
    *
    * — the UNTRUNCATED counterpart of
    * [[WindowOps.decayedRollingSum]]'s bounded-k fan, and the exact
    * batch BACKFILL path of the online
    * [[graft.streaming.StreamingOps.decayedFeatureStream]] (whose
    * monotonicity failure message points late data here): one
    * secondary-sorted scan replays per-entity history in (ts, id)
    * order with the IDENTICAL expression tree `x + s * pow(0.5,
    * dt_us / hl_us)`, so batch, stream, and the recursive-CTE oracle
    * agree to the last ulp before display rounding. A missing
    * (null/NaN) reading contributes x = 0 — the decay still applies,
    * time passed.
    */
  def decayedSum(df: DataFrame, entity: String, ts: String,
      idCol: String, valueCol: String,
      halfLifeSeconds: Double): DataFrame = {
    require(halfLifeSeconds > 0,
      s"decayedSum: halfLife > 0, got $halfLifeSeconds")
    val spark = df.sparkSession
    import spark.implicits._
    val hlUs = halfLifeSeconds * 1e6
    scanInput(df, entity, ts, idCol, col(valueCol))
      .mapPartitions { it =>
        var cur: String = null
        var lastT = 0L
        var s = 0.0
        var fresh = true
        it.map { case (e, t, id, x) =>
          if (e != cur) { cur = e; fresh = true }
          val xv = x.getOrElse(0.0)
          s = if (fresh) xv
            else xv + s * math.pow(0.5, (t - lastT).toDouble / hlUs)
          fresh = false
          lastT = t
          (id, s)
        }
      }
      .toDF(idCol, "decayed")
  }

  /** Holt double-exponential (linear-trend) smoothing — the TWO-state
    * coupled recurrence (Holt 1957):
    *
    *   l_1 = x_1,  b_1 = 0
    *   l_t = alpha * x_t + (1 - alpha) * (l_(t-1) + b_(t-1))
    *   b_t = beta * (l_t - l_(t-1)) + (1 - beta) * b_(t-1)
    *   forecast_t = l_t + b_t            (one-step-ahead)
    *
    * Where [[ewmMean]] tracks a LEVEL that lags any drifting signal
    * by a constant offset, Holt also tracks the SLOPE, so the
    * forecast is unbiased under linear drift — the standard smoothed
    * trend/velocity feature pair for per-entity activity series.
    * Two mutually-referencing states make this doubly outside
    * `Window`'s reach (even single-state `s+a*(x-s)` already is);
    * the secondary-sort scan holds both in O(1).
    *
    * The fold keeps the EXACT operand order above so the DuckDB
    * recursive-CTE oracle replays it bit-identically before display
    * rounding. A missing (null/NaN) reading emits null level/trend/
    * forecast and leaves both states untouched — observation count,
    * not wall clock, drives this recurrence (row-sequenced Holt; for
    * clock-driven decay use [[ewmMean]]/[[decayedSum]]).
    */
  def holtSmooth(df: DataFrame, entity: String, ts: String,
      idCol: String, valueCol: String,
      alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1,
      s"holtSmooth: alpha in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1,
      s"holtSmooth: beta in [0,1], got $beta")
    val spark = df.sparkSession
    import spark.implicits._
    scanInput(df, entity, ts, idCol, col(valueCol))
      .mapPartitions { it =>
        var cur: String = null
        var l = 0.0
        var b = 0.0
        var fresh = true
        it.map { case (e, _, id, x) =>
          if (e != cur) { cur = e; fresh = true }
          val out: Option[(Double, Double)] = x match {
            case None => None
            case Some(xv) =>
              if (fresh) { l = xv; b = 0.0; fresh = false }
              else {
                val lPrev = l
                l = alpha * xv + (1.0 - alpha) * (lPrev + b)
                b = beta * (l - lPrev) + (1.0 - beta) * b
              }
              Some((l, b))
          }
          (id, out.map(_._1), out.map(_._2),
            out.map { case (lv, bv) => lv + bv })
        }
      }
      .toDF(idCol, "holt_level", "holt_trend", "holt_forecast")
  }

  /** Two-sided CUSUM change-point scores (Page 1954):
    *
    *   sPos_t = max(0, sPos_(t-1) + (x_t - (target + slack)))
    *   sNeg_t = max(0, sNeg_(t-1) + ((target - slack) - x_t))
    *   alarm_t = sPos_t > threshold  OR  sNeg_t > threshold
    *
    * — the sequential drift detector for per-entity feature streams
    * (sensor drift, spend-pattern shift, data-quality regressions)
    * that rolling means smear and PSI-style batch drift tests only
    * see in aggregate.
    *
    * The entire recurrence runs in integer MICRO-UNITS
    * (`round(x*1e6)` as long — Spark round(), i.e. decimal
    * HALF-AWAY-FROM-ZERO, the semantics the streaming companion and
    * the DuckDB oracle replicate): integer adds and a max have no
    * floating summation-order to drift, so the scan is bit-exact in
    * any engine that replays the same (ts, id)-ordered history — the
    * DuckDB oracle does so via a recursive CTE. A missing (null/NaN)
    * value leaves the state unchanged (increment 0) rather than
    * poisoning, zeroing, or resetting it; readout divides back to
    * doubles (exact below 2^53 micro-units, i.e. |s| < ~9e9).
    */
  def cusum(df: DataFrame, entity: String, ts: String, idCol: String,
      valueCol: String, target: Double, slack: Double,
      threshold: Double): DataFrame = {
    require(slack >= 0, s"cusum: slack >= 0, got $slack")
    require(threshold > 0, s"cusum: threshold > 0, got $threshold")
    val spark = df.sparkSession
    import spark.implicits._
    val km = math.round((target + slack) * 1e6)
    val kn = math.round((target - slack) * 1e6)
    val thrM = math.round(threshold * 1e6)
    scanInput(df, entity, ts, idCol, col(valueCol))
      .mapPartitions { it =>
        var cur: String = null
        var sp = 0L
        var sn = 0L
        it.map { case (e, _, id, x) =>
          if (e != cur) { cur = e; sp = 0L; sn = 0L }
          val xm = x.map(StreamingRound.halfUp6)
          sp = math.max(0L, sp + xm.map(_ - km).getOrElse(0L))
          sn = math.max(0L, sn + xm.map(kn - _).getOrElse(0L))
          (id, sp / 1e6, sn / 1e6, sp > thrM || sn > thrM)
        }
      }
      .toDF(idCol, "cusum_pos", "cusum_neg", "alarm")
  }
}

/** The ONE definition of "value -> integer micro-units" every
  * sequential/streaming micro-unit recurrence shares: Spark
  * `round(x*1e6, 0)`'s exact semantics — java BigDecimal HALF_UP on
  * the double's shortest decimal representation, which is
  * half-AWAY-FROM-ZERO on exact halves and, unlike
  * `math.floor(y+0.5)`, does NOT round 0.49999999999999994 up (the
  * binary +0.5 of that value lands exactly on 0.5). Keeping batch,
  * stream, and oracle on this single function is what makes the
  * shared-oracle certification (q185/q188) honest.
  */
private[graft] object StreamingRound {
  def halfUp6(v: Double): Long = {
    val bd = BigDecimal(v * 1e6)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP)
    // BigDecimal.toLong silently WRAPS past +/-2^63: outside the
    // documented micro-unit domain (~9.22e12) fail loudly rather
    // than corrupt every downstream recurrence
    require(bd.isValidLong,
      s"halfUp6: $v is outside the exact integer micro-unit domain " +
        "(|value| must be < ~9.22e12 so value*1e6 fits in a Long)")
    bd.toLong
  }
}
