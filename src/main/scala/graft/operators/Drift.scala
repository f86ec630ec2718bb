package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between a reference slice (the
  * training snapshot) and a current slice (fresh production data) —
  * the check every long-lived feature pipeline runs before it trusts
  * a fitted transformer's statistics on this week's data.
  *
  * Everything is expressed as two \|levels\|-row aggregations plus a
  * level-keyed full-outer join: the exchanges carry one row per
  * distinct level regardless of input size, so the op costs two scans
  * and O(\|levels\|) shuffle at any scale. No driver-side state.
  */
object Drift {

  /** Per-level Population Stability Index detail between `ref` and
    * `cur` on a categorical column:
    * `term(l) = (q_l - p_l) * ln(max(q_l, eps) / max(p_l, eps))`
    * where `p`/`q` are the level's share of the reference/current
    * slice and `eps` guards levels absent from one side (the classic
    * PSI smoothing). Null is its own level (a null-rate shift IS
    * drift).
    *
    * Output: one row per level — `level, p_ref, p_cur, psi_term`,
    * plus `psi_total_nano`: the column's total PSI in integer
    * NANO-units, summed as BIGINT so the total is exact and
    * independent of float summation order (engine-portable — q166's
    * DuckDB oracle reproduces every digit). `psi_total_nano >= 2e8`
    * (PSI 0.2) is the conventional "investigate" threshold.
    */
  def psiByLevel(ref: DataFrame, cur: DataFrame, colName: String,
      eps: Double = 1e-6): DataFrame = {
    def counts(df: DataFrame) = df
      .groupBy(col(colName).cast("string").as("level"))
      .agg(count(lit(1)).as("c"))
    psiFromCounts(counts(ref), counts(cur), eps)
  }

  /** [[psiByLevel]] from pre-aggregated per-level counts
    * `(level: string, c: long)` — the entry point a STREAMING monitor
    * uses: a running groupBy-count (bounded \|levels\| state) feeds
    * the same share/term arithmetic, so the stream's readout is
    * bit-identical to the one-shot batch PSI over the same rows.
    */
  def psiFromCounts(refCounts: DataFrame, curCounts: DataFrame,
      eps: Double = 1e-6): DataFrame = {
    require(eps > 0, s"eps must be > 0, got $eps")
    def shares(df: DataFrame, share: String) = df
      .select(col("level"), col("c").as("__c"))
      .crossJoin(df.agg(sum(col("c")).as("__t")))
      .select(col("level"),
        (col("__c").cast("double") / col("__t").cast("double"))
          .as(share))
    val p = shares(refCounts, "p_ref")
    val q = shares(curCounts, "p_cur")
    val joined = p.join(q, p("level") <=> q("level"), "full_outer")
      .select(coalesce(p("level"), q("level")).as("level"),
        coalesce(col("p_ref"), lit(0.0)).as("p_ref"),
        coalesce(col("p_cur"), lit(0.0)).as("p_cur"))
    // exact operand order, mirrored verbatim by the oracle:
    // (q - p) * ln(greatest(q, eps) / greatest(p, eps))
    val term = (col("p_cur") - col("p_ref")) *
      log(greatest(col("p_cur"), lit(eps)) /
        greatest(col("p_ref"), lit(eps)))
    val detail = joined.withColumn("psi_term", term)
      .withColumn("__nano", round(col("psi_term") * lit(1e9), 0)
        .cast("long"))
    detail
      .crossJoin(detail.agg(sum(col("__nano")).as("psi_total_nano")))
      .drop("__nano")
  }

  /** PSI for a NUMERIC column: bin edges are fitted as exact
    * quantiles of the REFERENCE slice (the distributed np.interp
    * machinery — no single-partition stage), then both slices are
    * bucketed against those fixed edges and routed through
    * [[psiByLevel]]'s share/term computation on the bucket index.
    * Rows with null/NaN values form their own bucket (-1).
    */
  def psiNumeric(ref: DataFrame, cur: DataFrame, colName: String,
      bins: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val probs = (1 until bins).map(_.toDouble / bins)
    val edges = graft.core.Stats
      .weightedQuantiles(ref.select(col(colName)), colName, lit(1.0),
        probs)
      .flatten
    def bucketed(df: DataFrame) = {
      val v = col(colName).cast("double")
      // build the nested when from the LARGEST edge inward so the
      // outermost test is v <= edges(0) -> bucket 0 (a foldLeft in
      // ascending order would leave the largest edge outermost and
      // collapse every value below it into one bucket)
      val idx = edges.zipWithIndex.reverse
        .foldLeft(lit(edges.size): Column) {
          case (acc, (e, i)) => when(v <= e, lit(i)).otherwise(acc)
        }
      df.withColumn("__bucket",
        when(v.isNull || isnan(v), lit(-1)).otherwise(idx))
    }
    psiByLevel(bucketed(ref), bucketed(cur), "__bucket", eps)
  }

  /** Per-key EXACT two-sample Kolmogorov–Smirnov statistic between
    * `ref` and `cur` on a numeric column — the shape-sensitive
    * companion of [[psiNumeric]] (PSI sees share shifts inside fixed
    * bins; KS sees the largest CDF gap anywhere, binning-free).
    *
    * D = max over observed values of \|F_ref(v) − F_cur(v)\|, where
    * both empirical CDFs step AFTER all ties of a value (the default
    * RANGE frame — `cum(v) = rows <= v` — on both engines). No
    * floats until readout: the max runs over the cross-multiplied
    * integer \|cumRef·nCur − cumCur·nRef\| (BIGINT — exact and
    * order-independent), and `ks = ks_num / (n_ref·n_cur)` is one
    * fixed double division per key. Null/NaN readings and null keys
    * are excluded (a null-RATE shift is [[psiByLevel]]'s job).
    *
    * Scale shape: one hash exchange on the key for the CDF window;
    * the final per-key max rides the SAME partitioning (no second
    * exchange). Per-key data must fit a partition — the same
    * contract as every per-entity window op here. A key with rows on
    * only one side yields ks null (nothing to compare).
    */
  /** EMBEDDING-space drift between a reference and a current slice
    * of one vector column — the semantic companion of the scalar
    * PSI/KS checks: when the encoder, the content mix, or an
    * upstream preprocessing step moves, the centroid moves first.
    * Emits ONE row: `n_ref`, `n_cur`, `cos_centroid` (cosine
    * between the two slice centroids — 1 = same direction) and
    * `shift_l2` (Euclidean distance between centroids, in the
    * vector's own units).
    *
    * Exactness: vectors go through the shared round(x·1000)
    * quantization ([[graft.dedup.Dedup.quantize]]); per-dimension
    * sums are exact integers, the centroid cosine equals the
    * SUM-vector cosine (the 1/n factors cancel), and the shift is
    * computed as `√Σ(sa·n_cur − sb·n_ref)² / (n_ref·n_cur·1000)` —
    * every Σ exact decimal, one sqrt/divide double tail. Scale
    * shape: one |dims|-row map-side-combined aggregation over the
    * exploded vectors plus a 2-register count agg; no window, no
    * join, no all-pairs anything.
    */
  def embeddingDrift(df: DataFrame, vecCol: String, isRef: Column)
      : DataFrame = {
    def d19(c: Column) = c.cast("decimal(19,0)")
    def d38(c: Column) = c.cast("decimal(38,0)")
    val base = df.filter(col(vecCol).isNotNull &&
      size(col(vecCol)) > 0 && isRef.isNotNull)
    val ns = base.agg(
      count(when(isRef, lit(1))).as("na"),
      count(when(!isRef, lit(1))).as("nb")).head()
    val (na, nb) = (ns.getLong(0), ns.getLong(1))
    val perDim = base
      .select(isRef.as("__r"),
        posexplode(graft.dedup.Dedup.quantize(col(vecCol)))
          .as(Seq("__d", "__q")))
      .groupBy(col("__d"))
      .agg(sum(when(col("__r"), d38(col("__q")))).as("__sa"),
        sum(when(!col("__r"), d38(col("__q")))).as("__sb"))
    val sa = coalesce(col("__sa"), lit(0).cast("decimal(38,0)"))
    val sb = coalesce(col("__sb"), lit(0).cast("decimal(38,0)"))
    val agg = perDim.agg(
      sum((d19(sa) * d19(sb)).cast("decimal(38,0)")).as("__dot"),
      sum((d19(sa) * d19(sa)).cast("decimal(38,0)")).as("__naa"),
      sum((d19(sb) * d19(sb)).cast("decimal(38,0)")).as("__nbb"),
      sum(((d19(sa) * lit(nb) - d19(sb) * lit(na)) *
        (d19(sa) * lit(nb) - d19(sb) * lit(na)))
        .cast("decimal(38,0)")).as("__shift2"))
    agg.select(lit(na).as("n_ref"), lit(nb).as("n_cur"),
      when(lit(na) > 0 && lit(nb) > 0 &&
          col("__naa") > 0 && col("__nbb") > 0,
        col("__dot").cast("double") /
          (sqrt(col("__naa").cast("double")) *
            sqrt(col("__nbb").cast("double"))))
        .as("cos_centroid"),
      when(lit(na) > 0 && lit(nb) > 0,
        sqrt(col("__shift2").cast("double")) /
          (lit(na.toDouble) * lit(nb.toDouble) * lit(1000.0)))
        .as("shift_l2"))
  }

  /** Per-KEY [[embeddingDrift]] — one centroid-drift row per group
    * (per encoder version, per source, per label): the slice counts
    * ride a |keys|-row agg joined back onto the |keys|·|dims| sum
    * frame, so the exact integer chains are identical to the global
    * op with the count literals replaced by per-key columns. Keys
    * with an empty side refuse the readouts with null (nothing to
    * compare) but still report their counts.
    */
  def embeddingDriftByKey(df: DataFrame, keyCol: String,
      vecCol: String, isRef: Column): DataFrame = {
    def d19(c: Column) = c.cast("decimal(19,0)")
    def d38(c: Column) = c.cast("decimal(38,0)")
    val base = df.filter(col(keyCol).isNotNull &&
      col(vecCol).isNotNull && size(col(vecCol)) > 0 &&
      isRef.isNotNull)
    val counts = base.groupBy(col(keyCol))
      .agg(count(when(isRef, lit(1))).as("n_ref"),
        count(when(!isRef, lit(1))).as("n_cur"))
    val perDim = base
      .select(col(keyCol), isRef.as("__r"),
        posexplode(graft.dedup.Dedup.quantize(col(vecCol)))
          .as(Seq("__d", "__q")))
      .groupBy(col(keyCol), col("__d"))
      .agg(sum(when(col("__r"), d38(col("__q")))).as("__sa"),
        sum(when(!col("__r"), d38(col("__q")))).as("__sb"))
    val sa = coalesce(col("__sa"), lit(0).cast("decimal(38,0)"))
    val sb = coalesce(col("__sb"), lit(0).cast("decimal(38,0)"))
    val na = d19(col("n_ref")); val nb = d19(col("n_cur"))
    val sd = d19(sa) * nb - d19(sb) * na
    val agg = perDim.join(counts, Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(max(col("n_ref")).as("n_ref"),
        max(col("n_cur")).as("n_cur"),
        sum((d19(sa) * d19(sb)).cast("decimal(38,0)")).as("__dot"),
        sum((d19(sa) * d19(sa)).cast("decimal(38,0)")).as("__naa"),
        sum((d19(sb) * d19(sb)).cast("decimal(38,0)")).as("__nbb"),
        sum((sd * sd).cast("decimal(38,0)")).as("__shift2"))
    agg.select(col(keyCol), col("n_ref"), col("n_cur"),
      when(col("n_ref") > 0 && col("n_cur") > 0 &&
          col("__naa") > 0 && col("__nbb") > 0,
        col("__dot").cast("double") /
          (sqrt(col("__naa").cast("double")) *
            sqrt(col("__nbb").cast("double"))))
        .as("cos_centroid"),
      when(col("n_ref") > 0 && col("n_cur") > 0,
        sqrt(col("__shift2").cast("double")) /
          (col("n_ref").cast("double") * col("n_cur").cast("double")
            * lit(1000.0)))
        .as("shift_l2"))
  }

  def ksDrift(ref: DataFrame, cur: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def side(df: DataFrame, r: Int) = {
      val v = col(valueCol).cast("double")
      df.filter(col(keyCol).isNotNull && v.isNotNull && !isnan(v))
        .select(col(keyCol).cast("string").as("key"), v.as("v"),
          lit(r.toLong).as("r"))
    }
    val u = side(ref, 1).unionByName(side(cur, 0))
    val wKey = Window.partitionBy(col("key"))
    // default-equivalent RANGE frame: cum counts include ties of v
    val wCdf = wKey.orderBy(col("v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val stepped = u.select(col("key"),
      sum(col("r")).over(wCdf).as("cum_ref"),
      sum(lit(1L) - col("r")).over(wCdf).as("cum_cur"),
      sum(col("r")).over(wKey).as("n_ref"),
      sum(lit(1L) - col("r")).over(wKey).as("n_cur"))
    stepped
      .groupBy(col("key"))
      .agg(max(abs(col("cum_ref").cast("decimal(19,0)") *
            col("n_cur").cast("decimal(19,0)") -
            col("cum_cur").cast("decimal(19,0)") *
            col("n_ref").cast("decimal(19,0)")))
          .cast("long").as("ks_num"),
        max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"))
      .select(col("key"), col("n_ref"), col("n_cur"), col("ks_num"),
        when(col("n_ref") > 0 && col("n_cur") > 0,
          col("ks_num").cast("double") /
            (col("n_ref").cast("double") * col("n_cur").cast("double")))
          .as("ks"))
  }
}
