package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data-quality profile — the "is this table fit to
  * train on" report a pipeline runs before fitting anything: row
  * coverage, null rate, and exact distinct cardinality per column,
  * in ONE melted pass (the same melt shape as the imputers' fit).
  */
object Profile {

  /** One row per profiled column: `(column, n, n_null, n_distinct,
    * null_rate)`. Values are compared as strings (a profile cares
    * about presence/cardinality, not arithmetic), so any column type
    * melts into the same frame. `n_distinct` is EXACT (nulls not
    * counted as a distinct value — they are reported separately):
    * the melt exchanges (column, value) pairs, so cost scales with
    * Σ per-column distinct counts; for web-scale free-text columns
    * prefer the HLL sketch ([[graft.core.Hll]], q157) and treat this
    * as the exact gate for bounded-cardinality feature columns.
    */
  /** Train/serve (or snapshot/snapshot) profile drift: run
    * [[columnProfile]] on a reference and a current table, join per
    * column, and flag structural drift — the schema-level companion
    * of the distributional PSI monitor ([[Drift]], q166): PSI sees a
    * value distribution shift, this sees coverage/cardinality/null
    * regressions (a feed that went silent, an id column that started
    * nulling, an enum that exploded).
    *
    * `drifted` is conservative: a null-rate move beyond
    * `nullRateTol`, a distinct-cardinality ratio outside
    * `[distinctBand, 1/distinctBand]`, or any incomparable profile
    * (an all-null side making the ratio undefined) flags. Cost: two
    * melted profile passes + one |cols|-row join.
    */
  def profileDrift(ref: DataFrame, cur: DataFrame, cols: Seq[String],
      nullRateTol: Double = 0.05,
      distinctBand: Double = 0.5): DataFrame = {
    require(nullRateTol >= 0, s"nullRateTol >= 0, got $nullRateTol")
    require(distinctBand > 0 && distinctBand <= 1,
      s"distinctBand in (0,1], got $distinctBand")
    def side(df: DataFrame, s: String) =
      columnProfile(df, cols).select(col("column"),
        col("n").as(s"n_$s"), col("n_null").as(s"n_null_$s"),
        col("n_distinct").as(s"n_distinct_$s"),
        col("null_rate").as(s"null_rate_$s"))
    val joined = side(ref, "ref")
      .join(side(cur, "cur"), Seq("column"), "full_outer")
    val delta = col("null_rate_cur") - col("null_rate_ref")
    val ratio = when(col("n_distinct_ref") > 0,
      col("n_distinct_cur").cast("double") /
        col("n_distinct_ref").cast("double"))
    joined
      .withColumn("null_rate_delta", delta)
      .withColumn("distinct_ratio", ratio)
      .withColumn("drifted",
        coalesce(abs(col("null_rate_delta")) > lit(nullRateTol),
          lit(true)) ||
        coalesce(col("distinct_ratio") < lit(distinctBand) ||
          col("distinct_ratio") > lit(1.0 / distinctBand), lit(true)))
  }

  /** Shuffle-skew diagnostic: for each candidate key column, every
    * key value whose row share exceeds `shareThreshold`, with the
    * salt factor `ceil(share * partitions)` that would level it —
    * the planning report behind
    * [[graft.temporal.AsOfJoin.detectHotEntities]]'s runtime
    * auto-salting: run this BEFORE choosing join/agg keys at 100 TB
    * and the hot keys (and how many ways to split each) fall out.
    *
    * Threshold-based rather than top-k ON PURPOSE: output is bounded
    * by 1/threshold rows per column with a plain map-side-combined
    * count — no heaps, no per-column ordering, nothing that cares
    * how many distinct keys exist. Null keys are real skew (they
    * all land in one partition) and report as a null `key` with
    * `key_is_null = true` — NOT as a sentinel string, which would
    * silently merge them with a genuine "<NULL>"-valued key. The
    * salt factor is exact integer arithmetic:
    * `(cnt * partitions + total - 1) DIV total`.
    */
  def skewReport(df: DataFrame, cols: Seq[String],
      shareThreshold: Double = 0.01,
      partitions: Int = 200): DataFrame = {
    require(cols.nonEmpty, "skewReport: need >= 1 column")
    require(shareThreshold > 0 && shareThreshold < 1,
      s"skewReport: shareThreshold in (0,1), got $shareThreshold")
    require(partitions >= 1, s"skewReport: partitions >= 1")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"skewReport: missing columns $missing")
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column"),
          col(c).cast("string").as("key"))): _*)).as("kv"))
      .select(col("kv.column").as("column"), col("kv.key").as("key"))
    val counts = melted.groupBy(col("column"), col("key"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy(col("column"))
      .agg(sum(col("cnt")).as("total"))
    counts.join(totals, "column")
      .withColumn("share",
        col("cnt").cast("double") / col("total").cast("double"))
      .filter(col("share") > lit(shareThreshold))
      .withColumn("salt_factor",
        expr(s"(cnt * $partitions + total - 1) DIV total"))
      .select(col("column"), col("key"), col("key").isNull
          .as("key_is_null"), col("cnt"), col("share"),
        col("salt_factor"))
  }

  /** First-significant-digit shares of log10(1 + 1/d), d = 1..9. */
  private[graft] val BenfordShares: IndexedSeq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Benford first-digit audit over INTEGRAL columns: per column,
    * the count of each leading digit of |x| (nulls and zeros
    * excluded) plus the chi-squared statistic against Benford's
    * log10(1 + 1/d) law — the forensic data-quality test for
    * naturally-grown magnitudes (prices, durations, counts): heavy
    * chi2 on a column that SHOULD be Benford flags fabricated,
    * truncated, or unit-mangled feeds. Uniform ids legitimately
    * score huge — the audit reports, the reader interprets.
    *
    * ONE melted map-side-combined groupBy (9 counters + n per
    * column); chi2 is a FIXED left-assoc 9-term fold over the exact
    * counts (never a float aggregation), with the expected shares
    * embedded as compile-time constants ([[BenfordShares]]) so no
    * engine libm enters the comparison. Digit extraction is string
    * based with the sign stripped TEXTUALLY (never abs(), which
    * overflows on Long.MinValue) — exact for integers in any engine.
    */
  def benfordAudit(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "benfordAudit: need >= 1 column")
    cols.foreach(c =>
      graft.core.Ids.requireIntegral(df, c, "benfordAudit"))
    // leading digit via string, sign stripped textually rather than
    // through abs(): abs(Long.MinValue) overflows (silently negative
    // non-ANSI, an error under ANSI/DuckDB) — the one value a
    // forensic audit of sentinel-ridden feeds is most likely to meet
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column"),
          when(col(c).isNull || col(c) === 0, lit(null))
            .otherwise(substring(regexp_replace(
              col(c).cast("string"), "^-", ""), 1, 1)
              .cast("int")).as("d"))): _*)).as("kv"))
      .select(col("kv.column").as("column"), col("kv.d").as("d"))
    val aggs = count(col("d")).as("n") +:
      (1 to 9).map(k => sum(when(col("d") === k, lit(1L))
        .otherwise(lit(0L))).as(s"c$k"))
    val counted = melted.groupBy(col("column"))
      .agg(aggs.head, aggs.tail: _*)
    val n = col("n").cast("double")
    val chi2 = (1 to 9).map { k =>
      val e = n * lit(BenfordShares(k - 1))
      (col(s"c$k").cast("double") - e) *
        (col(s"c$k").cast("double") - e) / e
    }.reduce(_ + _)
    counted.withColumn("chi2",
      when(col("n") === 0, lit(null).cast("double")).otherwise(chi2))
  }

  /** Feed-freshness report: per key (source, feed, event type), row
    * count, last event time, staleness behind the corpus-wide
    * newest event (exact integer microseconds), and a stale flag —
    * the "did a feed go quiet" health check a pipeline runs before
    * trusting an as-of join's right side (a silently stale feature
    * feed poisons every downstream point-in-time read with old
    * values that LOOK valid). One map-side-combined groupBy + a
    * 1-row broadcast of the global max.
    */
  def freshnessReport(df: DataFrame, keyCol: String, tsCol: String,
      staleAfterSeconds: Long): DataFrame =
    freshnessReport(df, Seq(keyCol), tsCol, staleAfterSeconds)

  /** Multi-key form: the report key is the full (source, feed,
    * event-type, ...) tuple, one row per distinct combination.
    */
  def freshnessReport(df: DataFrame, keyCols: Seq[String], tsCol: String,
      staleAfterSeconds: Long): DataFrame = {
    require(keyCols.nonEmpty, "freshnessReport: need >= 1 key column")
    require(staleAfterSeconds > 0,
      s"freshnessReport: staleAfterSeconds > 0, got $staleAfterSeconds")
    val tUs = unix_micros(col(tsCol).cast("timestamp"))
    val perKey = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), max(tUs).as("__last_us"),
        max(col(tsCol)).as("last_ts"))
    val global = df.agg(max(tUs).as("__global_us"))
    perKey.crossJoin(broadcast(global))
      .withColumn("staleness_us", col("__global_us") - col("__last_us"))
      .withColumn("stale",
        col("staleness_us") > staleAfterSeconds * 1000000L)
      .drop("__last_us", "__global_us")
  }

  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile: need >= 1 column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columnProfile: missing columns $missing")
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("__v")))
        : _*)).as("kv"))
      .select(col("kv.column").as("column"), col("kv.__v").as("__v"))
    melted.groupBy(col("column"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__v").isNull, lit(1L)).otherwise(lit(0L)))
          .as("n_null"),
        count_distinct(col("__v")).as("n_distinct"))
      .withColumn("null_rate",
        col("n_null").cast("double") / col("n"))
  }

  /** Join-key health audit between a fact (`left`) and a dimension
    * (`right`) on an equi-key — the pre-flight every pipeline join
    * deserves: orphan rates, duplicate dimension keys, and the exact
    * row count the join WOULD produce (fan-out), without ever
    * materializing it.
    *
    * One summary row, all exact BIGINTs:
    * `n_left/n_right` (rows), `null_key_left/right` (rows whose key
    * is null — they can never match and are counted apart, NOT as
    * orphans), `distinct_left/right` (non-null key cardinalities),
    * `matched_left/right` (rows whose key appears on the other
    * side), `orphan_left/right` (non-null-key rows with no partner),
    * `dup_keys_right` (distinct right keys holding >1 row — the
    * fan-out culprits), `joined_rows` (Σ_k lc·rc — the inner-join
    * cardinality, summed as decimal so it cannot silently wrap) and
    * `max_fanout` (largest per-key right multiplicity that a left
    * row actually hits).
    *
    * Shape: one map-side-combined per-key count per side, a
    * \|keys\|-row full-outer join, one final scalar agg — nothing
    * scales with raw row counts past the first partial aggregation,
    * so auditing a 10^12-row join costs two scans.
    */
  /** Two-name form for sides that spell the key differently
    * (fact `user_id` vs dim `c_custkey`).
    */
  /** NULL-PATTERN profile — which COMBINATIONS of columns go
    * missing together: one row per observed null-mask with its
    * exact row count and the readable list of null columns. The
    * data-quality primitive that distinguishes "5% of values are
    * null" (fine) from "value and event_type are always null
    * TOGETHER" (a broken producer). `mask` bit i = `cols(i)` is
    * null — pure integer math; `null_cols` joins the names in
    * `cols` order. One map-side-combined aggregation; at most
    * 2^|cols| rows out regardless of input size.
    */
  def nullPatterns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.size <= 62,
      s"nullPatterns: 1..62 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size,
      s"duplicate columns in $cols")
    val mask = cols.zipWithIndex.map { case (c, i) =>
      when(col(c).isNull, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val nullList = concat_ws(",", cols.zipWithIndex.map {
      case (c, i) => when(col(c).isNull, lit(c))
    }: _*)
    df.groupBy(mask.as("mask"), nullList.as("null_cols"))
      .agg(count(lit(1)).as("n_rows"))
  }

  def joinAudit(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String): DataFrame =
    joinAudit(left.select(col(leftKey)),
      right.select(col(rightKey).as(leftKey)), leftKey)

  def joinAudit(left: DataFrame, right: DataFrame,
      key: String): DataFrame = {
    def counts(df: DataFrame, side: String) = df
      .groupBy(col(key).cast("string").as("__k"))
      .agg(count(lit(1)).as(s"__c_$side"))
    val l = counts(left, "l")
    val r = counts(right, "r")
    val keyed = l.join(r, Seq("__k"), "full_outer")
    val lc = coalesce(col("__c_l"), lit(0L))
    val rc = coalesce(col("__c_r"), lit(0L))
    val nullKey = col("__k").isNull
    keyed.agg(
      sum(lc).as("n_left"), sum(rc).as("n_right"),
      sum(when(nullKey, lc).otherwise(lit(0L))).as("null_key_left"),
      sum(when(nullKey, rc).otherwise(lit(0L))).as("null_key_right"),
      count(when(!nullKey && lc > 0, lit(1))).as("distinct_left"),
      count(when(!nullKey && rc > 0, lit(1))).as("distinct_right"),
      sum(when(!nullKey && rc > 0, lc).otherwise(lit(0L)))
        .as("matched_left"),
      sum(when(!nullKey && lc > 0, rc).otherwise(lit(0L)))
        .as("matched_right"),
      sum(when(!nullKey && rc === 0, lc).otherwise(lit(0L)))
        .as("orphan_left"),
      sum(when(!nullKey && lc === 0, rc).otherwise(lit(0L)))
        .as("orphan_right"),
      count(when(!nullKey && rc > 1, lit(1))).as("dup_keys_right"),
      sum(when(nullKey, lit(0L).cast("decimal(38,0)"))
        .otherwise(lc.cast("decimal(19,0)") * rc.cast("decimal(19,0)")))
        .cast("long").as("joined_rows"),
      coalesce(max(when(!nullKey && lc > 0, rc)), lit(0L))
        .as("max_fanout"))
  }
}
