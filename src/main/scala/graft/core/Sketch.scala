package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-bin histogram quantile sketch — the bounded-shuffle scale
  * path for distributed quantile FITS.
  *
  * The exact melted machinery ([[Stats.weightedQuantilesMelted]],
  * np.interp parity, tubular/capping.py:335-452) range-partitions every
  * (column, value) row: correct at any scale, but the shuffle carries
  * the full data volume. At 10^12 rows a capper/binner fit does not
  * need np.interp exactness — it needs a deterministic approximation
  * with a PROVEN error bound and a map-side-combinable aggregation
  * state. A fixed-bin histogram is exactly that (and is mergeable: bin
  * counts add, so partial histograms combine associatively — the same
  * property KLL/t-digest sketches buy, here with a deterministic,
  * SQL-reproducible rule instead of sketch-internal randomness):
  *
  *   pass 1: per-column (min, max, total) — one map-side-combined agg,
  *           |columns| output rows;
  *   pass 2: bin = min(floor((v - min) / width), bins-1) with
  *           width = (max - min) / bins; groupBy (column, bin) sums
  *           weights — the shuffle carries at most
  *           |columns| x bins x |partitions| PARTIAL rows regardless of
  *           input size, collapsing to <= |columns| x bins.
  *
  * The quantile readout interpolates linearly WITHIN the target bin of
  * the cumulative histogram: target = q * W; in the first bin whose
  * cumulative weight reaches it, value = min + (bin + frac) * width
  * with frac = (target - cumBefore) / binWeight. The result is within
  * ONE BIN WIDTH of the exact weighted quantile (error <= (max - min) /
  * bins — SketchSpec asserts the bound against the exact machinery),
  * deterministic, and engine-reproducible: the DuckDB oracle recomputes
  * it from the same definition (q116).
  *
  * Nulls and NaN are excluded like the exact path; zero weights are
  * dropped; a constant column (width 0) returns that constant; an empty
  * fit returns None per quantile.
  */
object Sketch {

  def histQuantilesMelted(df: DataFrame,
      perCol: Map[String, Seq[Double]], weight: Column,
      bins: Int = 1024): Map[String, Seq[Option[Double]]] = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(perCol.values.flatten.forall(q => q >= 0 && q <= 1),
      s"quantiles must be in [0,1], got $perCol")
    val cols = perCol.keys.toSeq.sorted
    val pair = explode(array(cols.map(c =>
      struct(lit(c).as("k"), col(c).cast("double").as("v"))): _*))
    // NOT persisted (round 6): the two passes are plain map-side-
    // combined aggregations over a column-pruned projection — at
    // 100 TB caching the full (k, v, w) pair stream would materialize
    // the input a second time just to save one pruned re-scan, and at
    // bench scale the cache build dominated the whole fit. Two scans
    // of the pruned columns is the honest cost of a two-pass sketch.
    val pairs = df.filter(weight.cast("double") =!= 0)
      .select(pair.as("p"), weight.cast("double").as("__w"))
      .filter(col("p.v").isNotNull && !isnan(col("p.v")))
      .select(col("p.k").as("k"), col("p.v").as("v"),
        col("__w").as("w"))
    locally {
      // pass 1 — bounded collect: one row per fitted column
      val mm = pairs.groupBy(col("k"))
        .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
        .collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
      if (mm.isEmpty)
        return perCol.map { case (c, qs) => c -> qs.map(_ => None) }
      val mnCol = element_at(
        typedLit(mm.map { case (k, (mn, _)) => k -> mn }), col("k"))
      val widthOf = mm.map { case (k, (mn, mx)) => k -> ((mx - mn) / bins) }
      val wCol = element_at(typedLit(widthOf), col("k"))
      // pass 2 — bounded collect: <= |columns| x bins rows of fit state
      val hist = pairs
        .withColumn("b",
          when(wCol === 0d, lit(0))
            .otherwise(least(
              floor((col("v") - mnCol) / wCol), lit(bins - 1L)))
            .cast("int"))
        .groupBy(col("k"), col("b")).agg(sum(col("w")).as("cw"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1)
      perCol.map { case (c, qs) =>
        c -> (mm.get(c) match {
          case None => qs.map(_ => None) // no valid rows for this column
          case Some((mn, _)) =>
            val byBin = hist.getOrElse(c, Array.empty)
              .map(t => (t._2, t._3)).sortBy(_._1)
            val total = byBin.map(_._2).sum
            val width = widthOf(c)
            qs.map { q =>
              val target = q * total
              var cum = 0.0
              val hit = byBin.find { case (_, cnt) =>
                cum += cnt; cum >= target
              }
              hit.map { case (b, cnt) =>
                val frac = if (cnt == 0) 0.0
                  else ((target - (cum - cnt)) / cnt).max(0.0).min(1.0)
                mn + (b + frac) * width
              }
            }
        })
      }
    }
  }

  /** Per-GROUP histogram quantiles, fully distributed end to end — the
    * scale companion to [[Stats.groupedWeightedQuantiles]] (which
    * bounds window buffering by |distinct values| per key; this bounds
    * it by `bins` per key, immune even to all-distinct hot keys), and
    * unlike [[histQuantilesMelted]] NOTHING is collected: the result
    * stays a DataFrame of (key, prob, value) rows.
    *
    *   1. one map-side-combined groupBy(key) for (min, max, total);
    *   2. join-back (|keys| rows — AQE broadcasts), bin assignment;
    *   3. one map-side-combined groupBy(key, bin) weight sum;
    *   4. running-sum window over <= bins rows per key;
    *   5. per (key, prob): the first bin whose cumulative weight
    *      reaches prob x total wins (min_by over the bin index), value
    *      interpolated within it — same rule as the melted sketch, so
    *      the q121 oracle recomputes it in SQL.
    *
    * Null/NaN values and zero weights are excluded; a key with no
    * valid rows is absent from the output.
    */
  def groupedHistQuantiles(df: DataFrame, keyCol: String,
      valueCol: String, probs: Seq[Double], bins: Int = 1024,
      weight: Column = lit(1.0)): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(probs.nonEmpty && probs.forall(q => q >= 0 && q <= 1),
      s"quantiles must be in [0,1], got $probs")
    val valid = df
      .select(col(keyCol).as("__k"),
        col(valueCol).cast("double").as("__v"),
        weight.cast("double").as("__w"))
      .filter(col("__v").isNotNull && !isnan(col("__v")) &&
        col("__w") =!= 0)
    // mm keyed as __k2 so the join-back can be NULL-SAFE (<=>): a null
    // key is a legitimate group, exactly as a window's PARTITION BY
    // treats it
    val mm = valid.groupBy(col("__k").as("__k2"))
      .agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
        sum(col("__w")).as("__tot"))
      .withColumn("__width", (col("__mx") - col("__mn")) / bins)
    val hist = valid
      .join(mm, col("__k") <=> col("__k2")).drop("__k2")
      .withColumn("__b",
        when(col("__width") === 0d, lit(0))
          .otherwise(least(
            floor((col("__v") - col("__mn")) / col("__width")),
            lit(bins - 1L)))
          .cast("int"))
      .groupBy(col("__k"), col("__b")).agg(sum(col("__w")).as("__cw"))
    val w = org.apache.spark.sql.expressions.Window
    val wCum = w.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    val cum = hist
      .withColumn("__cum", sum(col("__cw")).over(wCum))
      // last-bin marker: __tot sums raw rows while __cum sums per-bin
      // partials in bin order — with fractional weights the two
      // association orders can differ by an ulp, leaving the final
      // __cum a hair below prob * __tot at prob = 1.0 and silently
      // dropping that (key, prob) row. The last bin always qualifies:
      // by construction it holds the key's maximum cumulative weight.
      .withColumn("__blast",
        col("__b") === max(col("__b")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("__k"))))
    cum.join(mm, col("__k") <=> col("__k2")).drop("__k2")
      .withColumn("prob", explode(typedLit(probs)))
      .withColumn("__target", col("prob") * col("__tot"))
      .filter(col("__cum") >= col("__target") || col("__blast"))
      .groupBy(col("__k"), col("prob"))
      .agg(min_by(
        struct(col("__b"), col("__cw"), col("__cum"), col("__mn"),
          col("__width"), col("__target")), col("__b")).as("__hit"))
      .select(col("__k").as(keyCol), col("prob"),
        (col("__hit.__mn") + (col("__hit.__b") +
          greatest(least((col("__hit.__target") -
            (col("__hit.__cum") - col("__hit.__cw"))) /
            col("__hit.__cw"), lit(1.0)), lit(0.0))) *
          col("__hit.__width")).as("value"))
  }

  // ---------------------------------------------------------------
  // Count-Min sketch (Cormode & Muthukrishnan 2005): depth x width
  // counter matrix; estimate(x) = min over rows d of
  // counter[d][h_d(x)]. Always OVER-estimates (collisions only add),
  // error <= 2N/width with prob 1 - 2^-depth. The counter build is ONE
  // map-side-combined groupBy whose exchange carries at most
  // depth x width x |partitions| partial rows REGARDLESS of input
  // size — the heavy-hitter scale path when exact per-item counts
  // (|distinct| exchange rows) are too many.
  // ---------------------------------------------------------------

  /** Row-d bucket of `item`: depth-salted portable hash
    * ([[Hashing.md5Hash60]]) mod width.
    */
  def cmsBucket(item: Column, d: Int, width: Int): Column =
    pmod(Hashing.md5Hash60(concat(lit(d), lit(":"), item)), lit(width))
      .cast("int")

  /** Build the CMS counter table `(d, b, cnt)` over (weighted) items.
    * Output is <= depth x width rows — bounded fit state. Null items
    * are skipped (SQL aggregate convention). Counters sum the weight
    * as DOUBLE (`cnt: double`) so fractional weights count exactly —
    * a silent cast-to-long would truncate 0.5-weight rows to zero and
    * invert the sketch's over-count-only guarantee.
    */
  def cmsCounters(df: DataFrame, itemCol: String, depth: Int,
      width: Int, weight: Column = lit(1L)): DataFrame = {
    require(depth >= 1 && width >= 1,
      s"cms needs depth >= 1, width >= 1, got depth=$depth width=$width")
    df.filter(col(itemCol).isNotNull)
      .select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"),
          cmsBucket(col(itemCol), d, width).as("b"),
          weight.cast("double").as("__w"))): _*)).as("e"))
      .groupBy(col("e.d").as("d"), col("e.b").as("b"))
      .agg(sum(col("e.__w")).as("cnt"))
  }

  /** Point-query the sketch for each DISTINCT candidate item:
    * `(item, est)` with `est = min_d cnt[d][h_d(item)]` (0.0 when a
    * row's bucket was never touched). `counters` is tiny (<= depth x
    * width rows) so its side of the join broadcasts.
    */
  def cmsEstimate(counters: DataFrame, candidates: DataFrame,
      itemCol: String, depth: Int, width: Int): DataFrame = {
    val probes = candidates.filter(col(itemCol).isNotNull)
      .select(col(itemCol).as("item")).distinct()
      .select(col("item"), explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"),
          cmsBucket(col("item"), d, width).as("b"))): _*)).as("e"))
      .select(col("item"), col("e.d").as("d"), col("e.b").as("b"))
    probes
      .join(broadcast(counters), Seq("d", "b"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt").cast("double"), lit(0.0))).as("est"))
  }
}

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
  * cardinality member of the sketch family (CMS = frequencies,
  * histogram = quantiles, bloom = membership, HLL = distinct count):
  * "how many distinct urls/tokens/ids" over 10^12 rows where an exact
  * `count(distinct)` shuffles |distinct| rows and a sketch shuffles
  * at most m registers per partition.
  *
  * Engine-portable by construction: the item hash is
  * [[Hashing.md5Hash60]] (DuckDB-reproducible), the register index is
  * `h mod m`, and the rank is the leading-zero count of the remaining
  * 60-p bits derived from `length(bin(w))` — string-of-binary length,
  * identical integer arithmetic in any engine, no float anywhere in
  * the sketch state. The readout's 2^-rho sum is carried in EXACT
  * integer micro-units (2^(RhoCap-rho), rho capped at RhoCap=40 —
  * bias from the cap is < 2^-40 per register, unmeasurable), so the
  * only floats are the final 3-operation estimate — bit-identical
  * given bit-identical integer inputs.
  *
  * State is m longs, mergeable by per-register MAX — associative and
  * idempotent, so the same `hllRegisters` aggregation runs unchanged
  * as a STREAMING groupBy aggregation (update mode, bounded state
  * forever) and must converge to the batch registers exactly.
  */
object Hll {

  /** Cap on the rank so 2^(RhoCap-rho) stays an exact BIGINT. */
  val RhoCap = 40

  /** `(reg, rho)` register table: reg = h mod 2^p, rho = leading-zero
    * rank of the top 60-p bits (capped), MAX-merged per register.
    * Output <= 2^p rows — bounded state at any input size. Null items
    * are skipped (SQL aggregate convention).
    */
  def hllRegisters(df: DataFrame, itemCol: String, p: Int): DataFrame = {
    val (reg, rho) = regRho(col(itemCol), p)
    df.filter(col(itemCol).isNotNull)
      .select(reg.as("reg"), rho.as("rho"))
      .groupBy(col("reg"))
      .agg(max(col("rho")).as("rho"))
  }

  /** (register, rank) expressions for one item — shared by the batch
    * and streaming builds so the two can never drift.
    */
  private[graft] def regRho(item: Column, p: Int): (Column, Column) = {
    require(p >= 4 && p <= 16, s"hll: p in [4,16], got $p")
    val m = 1L << p
    val h = Hashing.md5Hash60(item.cast("string"))
    // integer shift, NOT floor(h / m): Spark's `/` on longs is DOUBLE
    // division, and a 60-bit h exceeds the 53-bit mantissa — the
    // rounded quotient's floor can land one off the true top bits
    val w = shiftright(h, p) // top 60-p bits
    val rho = when(w === 0, lit(60 - p + 1))
      .otherwise(lit(60 - p) - length(bin(w)) + lit(1))
    (pmod(h, lit(m)).cast("int"), least(rho, lit(RhoCap)).cast("int"))
  }

  /** One-row readout `(m, n_present, s_micro, estimate)` from a
    * register table: `s_micro = sum 2^(RhoCap-rho)` over present
    * registers (exact BIGINT), empty registers contribute 2^RhoCap
    * each; `estimate = alpha_m * m^2 / (S / 2^RhoCap)`, with the
    * standard small-range linear-counting correction when
    * `E <= 2.5m` and empty registers exist. The register table is
    * <= m rows, so this is a driver-scale aggregation.
    */
  def hllReadout(regs: DataFrame, p: Int): DataFrame = {
    val m = 1L << p
    val alpha = alphaM(m)
    val agg = regs.agg(
      count(lit(1)).as("n_present"),
      // empty register table: SUM over zero rows is null, which would
      // poison s_micro — an empty sketch is zeros=m, linear counting
      // ln(m/m) = 0 distinct, and must read out that way
      coalesce(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoCap - rho)")),
        lit(0L)).as("s_present"))
    agg.select(
      lit(m).as("m"),
      col("n_present"),
      (col("s_present") +
        (lit(m) - col("n_present")) * lit(1L << RhoCap)).as("s_micro"))
      .withColumn("e_raw",
        lit(alpha) * lit(m.toDouble) * lit(m.toDouble) /
          (col("s_micro").cast("double") / lit(math.pow(2.0, RhoCap))))
      .withColumn("zeros", lit(m) - col("n_present"))
      .withColumn("estimate",
        when(col("e_raw") <= lit(2.5 * m) && col("zeros") > 0,
          lit(m.toDouble) *
            log(lit(m.toDouble) / col("zeros").cast("double")))
          .otherwise(col("e_raw")))
      .select(col("m"), col("n_present"), col("s_micro"),
        col("estimate"))
  }

  /** alpha_m for the standard bias correction (m >= 128 branch). */
  def alphaM(m: Long): Double = 0.7213 / (1.0 + 1.079 / m.toDouble)

  /** Per-KEY register tables `(key, reg, rho)` — one bounded sketch
    * per group (the "distinct tokens per source/language" dashboard
    * at 10^12 rows): state <= |keys| x 2^p ints, one
    * map-side-combined exchange. Null keys form their own group
    * (SQL GROUP BY convention); null items are skipped.
    */
  def hllRegistersByKey(df: DataFrame, keyCol: String, itemCol: String,
      p: Int): DataFrame = {
    val (reg, rho) = regRho(col(itemCol), p)
    df.filter(col(itemCol).isNotNull)
      .select(col(keyCol).as("key"), reg.as("reg"), rho.as("rho"))
      .groupBy(col("key"), col("reg"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Per-key readout `(key, n_present, s_micro, estimate)` — the same
    * exact-integer micro-unit rule as [[hllReadout]], one row per key.
    */
  def hllReadoutByKey(regs: DataFrame, p: Int): DataFrame = {
    val m = 1L << p
    val alpha = alphaM(m)
    regs.groupBy(col("key"))
      .agg(count(lit(1)).as("n_present"),
        coalesce(
          sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoCap - rho)")),
          lit(0L)).as("s_present"))
      .select(col("key"), col("n_present"),
        (col("s_present") +
          (lit(m) - col("n_present")) * lit(1L << RhoCap)).as("s_micro"))
      .withColumn("e_raw",
        lit(alpha) * lit(m.toDouble) * lit(m.toDouble) /
          (col("s_micro").cast("double") / lit(math.pow(2.0, RhoCap))))
      .withColumn("zeros", lit(m) - col("n_present"))
      .withColumn("estimate",
        when(col("e_raw") <= lit(2.5 * m) && col("zeros") > 0,
          lit(m.toDouble) *
            log(lit(m.toDouble) / col("zeros").cast("double")))
          .otherwise(col("e_raw")))
      .select(col("key"), col("n_present"), col("s_micro"),
        col("estimate"))
  }
}
