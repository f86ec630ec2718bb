package graft.operators

import graft.functions.TopKBy
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group operators that deliberately avoid the window formulation:
  * `PARTITION BY group` windows shuffle AND buffer/sort entire groups,
  * so a hot group (one domain with 10^8 pages) lands in one task. Both
  * ops here stay in ordinary aggregate shapes with map-side partial
  * aggregation.
  */
object GroupOps {

  /** Top-k rows per group by `scoreCol` (desc; ties -> smaller
    * `idCol`). Output: group columns + (`rank` 1..k, `score`, `id`).
    *
    * Runs as ONE hash aggregation with the bounded-heap
    * [[graft.functions.TopKBy]] aggregate: the shuffle carries at most
    * k entries per (group, map partition) — never the full group — and
    * no per-group sort happens (contrast `row_number() OVER` which
    * sorts every row of every group). Join `id` back to the source for
    * full rows when needed.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      scoreCol: String, idCol: String, k: Int): DataFrame = {
    graft.core.Ids.requireIntegral(df, idCol, "topKPerGroup")
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(TopKBy.topKBy(col(scoreCol).cast("double"),
        col(idCol).cast("long"), k).as("__topk"))
    // posexplode_OUTER: a group whose scores are all null/NaN has an
    // empty top-k array but must still appear in the output (with null
    // rank/score/id) — plain posexplode would silently drop the group
    agg.select(groupCols.map(col) :+
        posexplode_outer(col("__topk")).as(Seq("__pos", "__e")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("__pos") + 1).cast("int").as("rank"),
        col("__e.score").as("score"),
        col("__e.id").as("id")): _*)
  }

  /** Per-group z-score standardization: `(x - mean_g) / std_g` with
    * POPULATION std (sklearn `StandardScaler` parity, like
    * [[Numeric.ScalingTransformer]] but per group); a zero-variance
    * group divides by 1, so constant groups map to 0 rather than
    * null/Inf.
    *
    * Shape: one groupBy agg over (mean, std) + an equi-join back on
    * the group key — the stats side is |groups| rows, so AQE
    * broadcasts it in practice; either way no per-group window
    * buffering ever happens.
    */
  def standardizeByGroup(df: DataFrame, keyCol: String,
      columns: Seq[String], suffix: String = "_z"): DataFrame = {
    require(columns.nonEmpty, "standardizeByGroup: no columns given")
    val aggs = columns.flatMap(c => Seq(
      avg(col(c)).as(s"__mu_$c"),
      stddev_pop(col(c)).as(s"__sd_$c")))
    val stats = df.groupBy(col(keyCol).as("__zk"))
      .agg(aggs.head, aggs.tail: _*)
    // null-safe key match: a null-key group has stats too, and an
    // inner EqualTo join would silently DROP its rows
    val joined = df.join(stats, df(keyCol) <=> col("__zk"), "left")
    val out = columns.foldLeft(joined) { (d, c) =>
      val sd = col(s"__sd_$c")
      val safeSd = when(sd.isNull || sd === 0.0, lit(1.0)).otherwise(sd)
      d.withColumn(s"$c$suffix",
        (col(c) - col(s"__mu_$c")) / safeSd)
    }
    out.drop("__zk")
      .drop(columns.flatMap(c => Seq(s"__mu_$c", s"__sd_$c")): _*)
  }

  /** Per-group quantile capping: clip `valueCol` to the group's exact
    * weighted [loQ, hiQ] quantiles (np.interp semantics, same as the
    * global `CappingTransformer` fit) — per-domain p1/p99 winsorizing
    * where one global cap would be wrong. NaN passes through unclipped
    * and null stays null (polars clip parity, like `Capping.scala`);
    * rows whose group has no non-null values keep their value.
    *
    * Shape: [[graft.core.Stats.groupedWeightedQuantiles]] (exchanges
    * on the group key only) + an equi-join of the |groups|-row caps
    * side back on the key — AQE broadcasts it in practice.
    */
  def capByGroupQuantiles(df: DataFrame, keyCol: String,
      valueCol: String, loQ: Double, hiQ: Double,
      weight: Column = lit(1)): DataFrame = {
    require(loQ <= hiQ, s"loQ $loQ must be <= hiQ $hiQ")
    val caps = graft.core.Stats.groupedWeightedQuantiles(
      df, keyCol, valueCol, weight, Seq(loQ, hiQ))
      .groupBy(col(keyCol).as("__ck"))
      .agg(max(when(col("q") === loQ, col("quantile"))).as("__lo"),
        max(when(col("q") === hiQ, col("quantile"))).as("__hi"))
    val v = col(valueCol).cast("double")
    df.join(caps, df(keyCol) <=> col("__ck"), "left")
      .withColumn(valueCol,
        when(v.isNull, lit(null).cast("double"))
          .when(isnan(v), v) // NaN orders largest in Spark; guard it
          .otherwise(
            least(greatest(v, coalesce(col("__lo"), v)),
              coalesce(col("__hi"), v))))
      .drop("__ck", "__lo", "__hi")
  }

  /** Per-group TRIMMED and WINSORIZED means off the same exact
    * np.interp quantile caps as [[capByGroupQuantiles]]: one row per
    * group with the observed count, the count inside [lo, hi], the
    * mean of only the inside values (trimmed — outliers deleted) and
    * the mean of the clamped values (winsorized — outliers pulled to
    * the fence). The robust-location pair for fitting imputers and
    * baselines on contaminated web-scale feeds, where a single 1e12
    * sentinel poisons a plain mean.
    *
    * Shape: one grouped-quantile fit (melted range-partitioned CDF,
    * no per-group buffering), a stats-sized join back (AQE
    * broadcasts), one map-side-combined aggregation. NaN/null values
    * are missing (excluded from n and both means). Degenerate groups
    * (every value at one point) keep lo = hi and trim nothing.
    */
  def trimmedStats(df: DataFrame, keyCol: String, valueCol: String,
      loQ: Double, hiQ: Double,
      weight: Column = lit(1)): DataFrame = {
    require(loQ < hiQ && loQ >= 0 && hiQ <= 1,
      s"trimmedStats: need 0 <= loQ < hiQ <= 1, got $loQ / $hiQ")
    val caps = graft.core.Stats.groupedWeightedQuantiles(
      df, keyCol, valueCol, weight, Seq(loQ, hiQ))
      .groupBy(col(keyCol).as("__ck"))
      .agg(max(when(col("q") === loQ, col("quantile"))).as("__lo"),
        max(when(col("q") === hiQ, col("quantile"))).as("__hi"))
    val v = col(valueCol).cast("double")
    df.filter(v.isNotNull && !isnan(v))
      .join(caps, df(keyCol) <=> col("__ck"), "left")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        count(when(v >= col("__lo") && v <= col("__hi"), lit(1)))
          .as("n_kept"),
        avg(when(v >= col("__lo") && v <= col("__hi"), v))
          .as("trimmed_mean"),
        avg(least(greatest(v, col("__lo")), col("__hi")))
          .as("winsorized_mean"))
  }

  /** Per-group robust scaling: `(x - median_g) / IQR_g` with exact
    * np.interp quantiles (sklearn `RobustScaler` parity, grouped) —
    * the outlier-insensitive alternative to [[standardizeByGroup]].
    * Zero IQR divides by 1; NaN/null pass through.
    */
  def robustScaleByGroup(df: DataFrame, keyCol: String,
      valueCol: String, suffix: String = "_rs",
      weight: Column = lit(1)): DataFrame = {
    val qs = graft.core.Stats.groupedWeightedQuantiles(
      df, keyCol, valueCol, weight, Seq(0.25, 0.5, 0.75))
      .groupBy(col(keyCol).as("__ck"))
      .agg(max(when(col("q") === 0.5, col("quantile"))).as("__med"),
        (max(when(col("q") === 0.75, col("quantile"))) -
          max(when(col("q") === 0.25, col("quantile")))).as("__iqr"))
    val v = col(valueCol).cast("double")
    val safeIqr = when(col("__iqr").isNull || col("__iqr") === 0.0,
      lit(1.0)).otherwise(col("__iqr"))
    df.join(qs, df(keyCol) <=> col("__ck"), "left")
      .withColumn(s"$valueCol$suffix",
        when(v.isNull || isnan(v), v)
          .otherwise((v - coalesce(col("__med"), lit(0.0))) / safeIqr))
      .drop("__ck", "__med", "__iqr")
  }

  /** Per-group MAD outlier flags (Iglewicz-Hoaglin modified z-score):
    *
    *   mz = 0.6745 * (x - median_g) / MAD_g,   outlier = |mz| > cutoff
    *
    * with MAD_g = median_g(|x - median_g|) — the robust outlier test
    * whose breakdown point (50%) survives exactly the contaminated
    * data it is hunting, unlike mean/std z-scores where the outliers
    * inflate their own yardstick. Default cutoff 3.5 per
    * Iglewicz & Hoaglin (1993).
    *
    * Two grouped exact-median fits ([[graft.core.Stats
    * .groupedWeightedQuantiles]] — melted, range-partitioned CDF, no
    * per-group row buffering) and two stats-sized joins back (AQE
    * broadcasts both). A zero or null MAD (>=50% of the group at the
    * median, or an empty group) yields a null `mz` and `outlier =
    * false` — degenerate groups refuse to flag rather than divide by
    * zero; NaN/null x likewise never flag.
    */
  def madOutlierFlags(df: DataFrame, keyCol: String, valueCol: String,
      cutoff: Double = 3.5): DataFrame = {
    require(cutoff > 0, s"madOutlierFlags: cutoff > 0, got $cutoff")
    val v = col(valueCol).cast("double")
    val med = graft.core.Stats.groupedWeightedQuantiles(
      df, keyCol, valueCol, lit(1), Seq(0.5))
      .select(col(keyCol).as("__mk"), col("quantile").as("__med"))
    val withMed = df.join(med, df(keyCol) <=> col("__mk"), "left")
      .drop("__mk")
      .withColumn("__dev", abs(v - col("__med")))
    val mad = graft.core.Stats.groupedWeightedQuantiles(
      withMed, keyCol, "__dev", lit(1), Seq(0.5))
      .select(col(keyCol).as("__gk"), col("quantile").as("__mad"))
    val mz = when(v.isNull || isnan(v) || col("__med").isNull ||
        col("__mad").isNull || col("__mad") === 0.0,
      lit(null).cast("double"))
      .otherwise(lit(0.6744897501960817) * (v - col("__med")) /
        col("__mad"))
    withMed.join(mad, withMed(keyCol) <=> col("__gk"), "left")
      .withColumn(s"${valueCol}_mz", mz)
      .withColumn(s"${valueCol}_outlier",
        coalesce(abs(col(s"${valueCol}_mz")) > lit(cutoff), lit(false)))
      .drop("__gk", "__med", "__mad", "__dev")
  }

  /** LEAKAGE-FREE target encoding: out-of-fold mean response. Plain
    * target encoding lets every row see its own label through the
    * level statistic — the tabular cousin of the temporal leakage the
    * as-of join guards against. Here each row is encoded from the
    * OTHER K-1 folds only:
    *
    *   enc(row) = (sum_y(level) - sum_y(level, fold(row))
    *               + prior * global_mean)
    *            / (cnt(level) - cnt(level, fold(row)) + prior)
    *
    * with fold(row) = mixHash(id) % folds (seedless, deterministic,
    * engine-reproducible — the same sampling hash as
    * [[graft.text.Sharding]]). An empty out-of-fold slice (level lives
    * in one fold only) falls back to the smoothed prior.
    *
    * Shape: one map-side-combined groupBy(level, fold) aggregation
    * (|levels| x folds rows), a second tiny aggregation collapsing it
    * to level totals, and two left joins back onto the data — totals
    * on the key alone, the fold slice on (key, fold) — both joined
    * sides are stats-sized, so AQE broadcasts them. The prior's
    * global mean costs one scan, computed only when `prior > 0`.
    *
    * The id column must be integral (type-checked below) AND
    * non-null. The non-null half is the CALLER's contract — a value
    * scan to enforce it would cost a pass: null-id rows all hash to
    * a null fold, which the null-safe joins route into one shared
    * pseudo-fold, skewing the out-of-fold statistics without error.
    * Feed synthetic ids (monotonically_increasing_id) if the data has
    * none.
    */
  def oofMeanResponse(df: DataFrame, keyCol: String,
      responseCol: String, idCol: String, folds: Int,
      prior: Double = 0.0, outCol: String = "oof_enc"): DataFrame = {
    require(folds >= 2, s"need >= 2 folds, got $folds")
    require(prior >= 0, s"prior must be >= 0, got $prior")
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
          org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.IntegerType |
          org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"oofMeanResponse needs an integral id column, got $idCol: " +
          s"$dt (hash non-numeric ids to int64 first)")
    }
    val fold = pmod(graft.text.Sharding.mixHash(col(idCol)),
      lit(folds.toLong)).cast("int")
    val y = col(responseCol).cast("double")
    val globalMean =
      if (prior == 0) 0.0 // multiplied by 0 — skip the scan
      else {
        val r = df.agg((sum(when(y.isNotNull, y)) /
          count(when(y.isNotNull, lit(1)))).as("m")).head()
        if (r.isNullAt(0)) 0.0 else r.getDouble(0)
      }
    val stats = df
      .select(col(keyCol).as("__k"), fold.as("__f"), y.as("__y"))
      .filter(col("__y").isNotNull)
      .groupBy(col("__k"), col("__f"))
      .agg(sum(col("__y")).as("__fs"), count(lit(1)).as("__fc"))
    // totals joined on the KEY alone (a row whose own fold holds no
    // stats must still see its level's totals), fold slice on
    // (key, fold); both sides are |levels|-ish rows -> broadcast
    val totals = stats.groupBy(col("__k"))
      .agg(sum(col("__fs")).as("__ts"), sum(col("__fc")).as("__tc"))
    val foldStats = stats.select(col("__k").as("__k2"),
      col("__f"), col("__fs"), col("__fc"))
    val joined = df
      .join(totals, df(keyCol) <=> col("__k"), "left")
      .join(foldStats,
        df(keyCol) <=> col("__k2") && fold <=> col("__f"), "left")
    val oofSum = coalesce(col("__ts"), lit(0.0)) -
      coalesce(col("__fs"), lit(0.0))
    val oofCnt = coalesce(col("__tc"), lit(0L)) -
      coalesce(col("__fc"), lit(0L))
    joined
      .withColumn(outCol,
        when(oofCnt + lit(prior) === 0, lit(null).cast("double"))
          .otherwise((oofSum + lit(prior) * lit(globalMean)) /
            (oofCnt + lit(prior))))
      .drop("__k", "__k2", "__f", "__fs", "__fc", "__ts", "__tc")
  }

  /** Per-group percentile rank (ECDF value in (0, 1]): the rank-
    * normalization feature transform — `cume_dist` semantics
    * (#{rows with value <= x} / #{rows in group}) WITHOUT the
    * `cume_dist() OVER (PARTITION BY key ORDER BY value)` window,
    * which sorts every row of a group inside one task — a hot group
    * (one domain with 10^8 rows) funnels through a single sort.
    *
    * Shape (the [[graft.core.Stats.groupedWeightedQuantiles]] collapse
    * trick): one map-side-combined groupBy(key, value) count collapses
    * each group to its DISTINCT values; a running sum + total over that
    * collapsed frame yields the ECDF per (key, value); an equi-join on
    * (key, value) attaches it back. The windows buffer |distinct
    * values| rows per key — bounded by value cardinality, not group
    * size — and the join-back hash-partitions raw rows on BOTH key and
    * value, so a hot key spreads across its value range instead of
    * landing in one task.
    */
  def percentileRankByGroup(df: DataFrame, keyCol: String,
      valueCol: String, suffix: String = "_pct"): DataFrame = {
    val out = s"$valueCol$suffix"
    val wordr = org.apache.spark.sql.expressions.Window
    // null rows are EXCLUDED from the ECDF (they'd shift both rank
    // and denominator, and engines disagree on null sort order) and
    // re-attached with a null rank
    val nonNull = df.filter(col(valueCol).isNotNull)
    val counts = nonNull
      .groupBy(col(keyCol).as("__pk"), col(valueCol).as("__pv"))
      .agg(count(lit(1)).as("__pn"))
    val wCum = wordr.partitionBy(col("__pk")).orderBy(col("__pv"))
      .rowsBetween(wordr.unboundedPreceding, wordr.currentRow)
    val wTot = wordr.partitionBy(col("__pk"))
    val ecdf = counts
      .withColumn(out,
        sum(col("__pn")).over(wCum).cast("double") /
          sum(col("__pn")).over(wTot))
      .select(col("__pk"), col("__pv"), col(out))
    nonNull
      // <=> on the key: a null key forms its own group, like the
      // window's PARTITION BY did; plain === on the value (non-null)
      .join(ecdf, nonNull(keyCol) <=> col("__pk") &&
        nonNull(valueCol) === col("__pv"))
      .drop("__pk", "__pv")
      .unionByName(df.filter(col(valueCol).isNull)
        .withColumn(out, lit(null).cast("double")))
  }

  /** Per-group quantile GATE: keep rows whose value clears their own
    * group's q-quantile — the "top X% quality per language / per
    * source" curation rule, where one global threshold would let a
    * high-resource group's distribution set the bar for everyone.
    * Thresholds come from the exact distributed np.interp machinery
    * ([[graft.core.Stats.groupedWeightedQuantiles]] — no
    * single-partition stage); the filter is one broadcast-joinable
    * \|groups\|-row table against the corpus. `keepUpper = false`
    * keeps the lower tail instead. Null and NaN values never pass
    * (a gate must not admit unscorable rows); a group whose values
    * are all null/NaN has no threshold and is dropped entirely.
    */
  def filterByGroupQuantile(df: DataFrame, keyCol: String,
      valueCol: String, prob: Double, keepUpper: Boolean = true,
      weight: Column = lit(1)): DataFrame = {
    require(prob >= 0 && prob <= 1,
      s"filterByGroupQuantile: prob in [0,1], got $prob")
    val thr = graft.core.Stats.groupedWeightedQuantiles(
      df, keyCol, valueCol, weight, Seq(prob))
      .select(col(keyCol).as("__gk"), col("quantile").as("__thr"))
    val v = col(valueCol).cast("double")
    val cmp = if (keepUpper) v >= col("__thr") else v <= col("__thr")
    df.join(thr, df(keyCol) <=> col("__gk"), "left")
      .filter(v.isNotNull && !isnan(v) && col("__thr").isNotNull && cmp)
      .drop("__gk", "__thr")
  }

  /** Leave-one-out target encoding (category_encoders
    * `LeaveOneOutEncoder` semantics, smoothed): each labeled row is
    * encoded from its level's statistics MINUS ITSELF —
    * `(sum_level - y + prior * global_mean) / (count_level - 1 + prior)`
    * — the row-granular counterpart of [[oofMeanResponse]]'s fold-
    * granular leakage guard. Rows with a null response (the apply-time
    * rows in a train/apply mix) get the FULL level statistics; an
    * unseen level falls back to the smoothed prior (null when
    * `prior == 0`, as does a singleton level's labeled row, whose
    * out-of-self slice is empty).
    *
    * Shape: one map-side-combined groupBy(level) over (sum, count) —
    * \|levels\| rows — and one broadcastable left join back; the
    * subtraction happens rowside in a codegen'd projection, so no
    * per-row shuffle beyond the join. The response should be integral-
    * valued (cast to double) for bit-exact cross-engine sums.
    */
  def looMeanResponse(df: DataFrame, keyCol: String,
      responseCol: String, prior: Double = 0.0,
      outCol: String = "loo_enc"): DataFrame = {
    require(prior >= 0, s"prior must be >= 0, got $prior")
    val y = col(responseCol).cast("double")
    val globalMean =
      if (prior == 0) 0.0 // multiplied by 0 — skip the scan
      else {
        val r = df.agg((sum(when(y.isNotNull, y)) /
          count(when(y.isNotNull, lit(1)))).as("m")).head()
        if (r.isNullAt(0)) 0.0 else r.getDouble(0)
      }
    val stats = df
      .select(col(keyCol).as("__k"), y.as("__y"))
      .filter(col("__y").isNotNull)
      .groupBy(col("__k"))
      .agg(sum(col("__y")).as("__s"), count(lit(1)).as("__c"))
    val joined = df.join(stats, df(keyCol) <=> col("__k"), "left")
    val s = coalesce(col("__s"), lit(0.0))
    val c = coalesce(col("__c"), lit(0L))
    // labeled row: drop itself; unlabeled row: full level stats —
    // both as ((sum - self) + prior*gm) / ((count - self) + prior),
    // the exact operand order the DuckDB oracle mirrors
    val selfY = when(y.isNotNull, y).otherwise(lit(0.0))
    val selfC = when(y.isNotNull, lit(1L)).otherwise(lit(0L))
    val den = (c - selfC) + lit(prior)
    joined
      .withColumn(outCol,
        when(den === 0, lit(null).cast("double"))
          .otherwise(((s - selfY) + lit(prior) * lit(globalMean)) / den))
      .drop("__k", "__s", "__c")
  }

  /** Per-group exact PEARSON correlation (and the y-on-x OLS beta)
    * between two columns — the whole-group companion of
    * [[graft.temporal.WindowOps.rollingCorr]]'s trailing window:
    * pairwise-complete (a row counts only when BOTH sides are
    * observed), exact integer micro-unit moments, and ONE
    * `num / (√dx·√dy)` double chain per group, so an oracle
    * replaying the chain agrees to the ulp. Groups with < 2
    * complete pairs or a constant side refuse with null (beta
    * refuses only on constant x).
    *
    * Scale shape: one map-side-combined rollup; |groups| rows out.
    */
  def corrByGroup(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    def micro(c: String) = {
      val v = col(c).cast("double")
      round(when(isnan(v), lit(null)).otherwise(v) * lit(1e6), 0)
        .cast("long")
    }
    def d19(c: Column) = c.cast("decimal(19,0)")
    def d38(c: Column) = c.cast("decimal(38,0)")
    val x = micro(xCol); val y = micro(yCol)
    val ok = x.isNotNull && y.isNotNull
    val agg = df.filter(col(keyCol).isNotNull).groupBy(col(keyCol))
      .agg(count(when(ok, lit(1))).as("n_pairs"),
        sum(when(ok, d38(x))).as("__sx"),
        sum(when(ok, d38(y))).as("__sy"),
        sum(when(ok, (d19(x) * d19(y)).cast("decimal(38,0)")))
          .as("__sxy"),
        sum(when(ok, (d19(x) * d19(x)).cast("decimal(38,0)")))
          .as("__sxx"),
        sum(when(ok, (d19(y) * d19(y)).cast("decimal(38,0)")))
          .as("__syy"))
    val n38 = col("n_pairs").cast("decimal(38,0)")
    val num = n38 * col("__sxy") - col("__sx") * col("__sy")
    val dx = n38 * col("__sxx") - col("__sx") * col("__sx")
    val dy = n38 * col("__syy") - col("__sy") * col("__sy")
    agg.select(col(keyCol), col("n_pairs"),
      when(col("n_pairs") >= 2 && dx > 0 && dy > 0,
        num.cast("double") /
          (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))))
        .as("corr"),
      when(col("n_pairs") >= 2 && dx > 0,
        num.cast("double") / dx.cast("double")).as("beta_yx"))
  }

  /** Full PAIRWISE CORRELATION MATRIX in ONE pass — every C(k,2)
    * Pearson correlation among `cols`, computed as k(k−1)/2 × 6
    * exact micro-moment registers inside a single map-side-combined
    * global aggregation: at 100 TB this is the difference between
    * one scan for the whole feature-screening matrix and k² scans.
    * Same pairwise-complete / exact-moment / one-double-chain
    * semantics as [[corrByGroup]] (each pair counts a row only when
    * BOTH sides are observed; < 2 pairs or a constant side refuses
    * with null). Output: one row per unordered pair
    * `(col_a, col_b, n_pairs, corr)` in `cols` order.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String])
      : DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got $cols")
    require(cols.distinct.size == cols.size,
      s"duplicate columns in $cols")
    def micro(c: String) = {
      val v = col(c).cast("double")
      round(when(isnan(v), lit(null)).otherwise(v) * lit(1e6), 0)
        .cast("long")
    }
    def d19(c: Column) = c.cast("decimal(19,0)")
    def d38(c: Column) = c.cast("decimal(38,0)")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val regs = pairs.zipWithIndex.flatMap { case ((a, b), p) =>
      val x = micro(a); val y = micro(b)
      val ok = x.isNotNull && y.isNotNull
      Seq(count(when(ok, lit(1))).as(s"__n$p"),
        sum(when(ok, d38(x))).as(s"__sx$p"),
        sum(when(ok, d38(y))).as(s"__sy$p"),
        sum(when(ok, (d19(x) * d19(y)).cast("decimal(38,0)")))
          .as(s"__sxy$p"),
        sum(when(ok, (d19(x) * d19(x)).cast("decimal(38,0)")))
          .as(s"__sxx$p"),
        sum(when(ok, (d19(y) * d19(y)).cast("decimal(38,0)")))
          .as(s"__syy$p"))
    }
    val agg = df.agg(regs.head, regs.tail: _*)
    val rows = pairs.zipWithIndex.map { case ((a, b), p) =>
      val n38 = col(s"__n$p").cast("decimal(38,0)")
      val num = n38 * col(s"__sxy$p") -
        col(s"__sx$p") * col(s"__sy$p")
      val dx = n38 * col(s"__sxx$p") -
        col(s"__sx$p") * col(s"__sx$p")
      val dy = n38 * col(s"__syy$p") -
        col(s"__sy$p") * col(s"__sy$p")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__n$p").as("n_pairs"),
        when(col(s"__n$p") >= 2 && dx > 0 && dy > 0,
          num.cast("double") /
            (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))))
          .as("corr"))
    }
    agg.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Per-group INEQUALITY stats — how concentrated a group's value
    * mass is across its OBSERVATIONS (the per-event complement of
    * [[graft.operators.Behavior.valueConcentration]]'s per-category
    * HHI): `gini` (0 = perfectly equal, →1 = one event carries
    * everything; the exact rank form
    * `(2·Σ(i·vᵢ) − (n+1)·Σv) / (n·Σv)` over ascending ranks) and
    * `top_decile_share` (value share of the top ⌈n/10⌉ events —
    * the whale metric). Both are tie-order-invariant (tied values
    * contribute identically wherever they rank), so no tie-break
    * column is needed; groups with negative values or a zero total
    * refuse with null (shares lose meaning).
    *
    * Exactness: one ascending rank window (the descending top-k is
    * its exact complement `rank > n − k`, ONE sort), exact
    * decimal(38,0) Σ(i·v) / conditional sums, integer
    * `k = (n+9) div 10`, one double division each. One entity
    * exchange; the rollup rides it.
    */
  def inequalityStats(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val clean = when(isnan(v), lit(null)).otherwise(v)
    val m = round(clean * lit(1e6), 0).cast("long")
    def d19(c: Column) = c.cast("decimal(19,0)")
    val obs = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol), m.as("__m"))
      .filter(col("__m").isNotNull)
    val win = org.apache.spark.sql.expressions.Window
    val w = win.partitionBy(col(keyCol)).orderBy(col("__m").asc)
    val wp = win.partitionBy(col(keyCol))
    val ranked = obs.select(col(keyCol), col("__m"),
      row_number().over(w).cast("long").as("__rn"),
      count(lit(1)).over(wp).as("__n"))
    val k = expr("(__n + 9) div 10")
    val agg = ranked.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_obs"),
      sum(col("__m")).cast("decimal(38,0)").as("__s"),
      sum((d19(col("__rn")) * d19(col("__m")))
        .cast("decimal(38,0)")).as("__si"),
      sum(when(col("__rn") > col("__n") - k,
        col("__m"))).cast("decimal(38,0)").as("__stop"),
      min(col("__m")).as("__mn"))
    def d38(c: Column) = c.cast("decimal(38,0)")
    val n38 = d38(col("n_obs"))
    val ok = col("__s") > 0 && col("__mn") >= 0
    val gini = (lit(2).cast("decimal(38,0)") * col("__si") -
      (n38 + 1) * col("__s")).cast("double") /
      (n38 * col("__s")).cast("double")
    agg.select(col(keyCol), col("n_obs"),
      when(ok, gini).as("gini"),
      when(ok, col("__stop").cast("double") /
        col("__s").cast("double")).as("top_decile_share"))
  }

  /** Per-group σ-EXCEEDANCE summary — one row per group with
    * `n_obs`, exact `mean`/`std` (population, from integer
    * micro-unit moments), `n_outliers` (observations with
    * `|v − μ| > nSigma·σ`) and `outlier_share`: the data-quality
    * scorecard row that decides whether a feed's tail is sane
    * before the feed reaches a model. Groups with zero variance
    * report 0 outliers (everything equals μ); null/NaN readings
    * count nowhere.
    *
    * Exactness: μ and σ come from exact decimal(38,0) moments via
    * the same chains as [[graft.temporal.WindowOps]]'s micro-unit
    * ops (σ via correctly-rounded IEEE sqrt), and the exceedance
    * test compares micro-space doubles both engines derive
    * identically — no engine-ordered float summation anywhere.
    * Scale shape: one map-side-combined moment pass, the bounded
    * |groups|-row stats joined back (hash join on the key), one
    * conditional re-count riding the SAME key partitioning.
    */
  def sigmaOutlierShare(df: DataFrame, keyCol: String,
      valueCol: String, nSigma: Double = 3.0): DataFrame = {
    require(nSigma > 0, s"sigmaOutlierShare: nSigma > 0, got $nSigma")
    val v = col(valueCol).cast("double")
    val clean = when(isnan(v), lit(null)).otherwise(v)
    val m = round(clean * lit(1e6), 0).cast("long")
    def d19(c: Column) = c.cast("decimal(19,0)")
    val obs = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol), m.as("__m"))
    val stats = obs.groupBy(col(keyCol)).agg(
      count(col("__m")).as("n_obs"),
      sum(col("__m")).cast("decimal(38,0)").as("__s"),
      sum((d19(col("__m")) * d19(col("__m"))).cast("decimal(38,0)"))
        .as("__ss"))
    val n38 = col("n_obs").cast("decimal(38,0)")
    val mu = col("__s").cast("double") / col("n_obs").cast("double")
    val sig = sqrt((n38 * col("__ss") - col("__s") * col("__s"))
      .cast("double")) / col("n_obs").cast("double")
    val withStats = obs.join(
      stats.select(col(keyCol), col("n_obs"),
        mu.as("__mu"), sig.as("__sig")), Seq(keyCol))
    val isOut = col("__m").isNotNull &&
      abs(col("__m").cast("double") - col("__mu")) >
        lit(nSigma) * col("__sig")
    withStats.groupBy(col(keyCol)).agg(
      first(col("n_obs")).as("n_obs"),
      first(col("__mu")).as("__mu"),
      first(col("__sig")).as("__sig"),
      count(when(isOut, lit(1))).as("n_outliers"))
      .select(col(keyCol), col("n_obs"),
        when(col("n_obs") > 0, col("__mu") / lit(1e6)).as("mean"),
        when(col("n_obs") > 0, col("__sig") / lit(1e6)).as("std"),
        col("n_outliers"),
        when(col("n_obs") > 0, col("n_outliers").cast("double") /
          col("n_obs").cast("double")).as("outlier_share"))
  }
}
