package graft

import graft.core.Pipeline
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core-transformer queries over the driver's TPC-H-ish parquet, with
  * bit-exactness discipline vs the DuckDB oracles:
  *   - means/medians/modes computed over integer-valued doubles (sums
  *     are exact in any order -> bit-identical across engines);
  *   - decimal-cast sums where inputs have 2 decimals;
  *   - quantile interpolation arithmetic replicated with the same
  *     IEEE op order in SQL;
  *   - round(6) only where a transcendental makes ulp drift possible.
  */
object QueriesCore {

  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** lineitem with deterministically manufactured nulls in l_quantity. */
  private def liWithNulls(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem").withColumn("q",
      when(col("l_linenumber") % 7 === 0, lit(null))
        .otherwise(col("l_quantity")))
  private val liWithNullsSql =
    """SELECT *, CASE WHEN l_linenumber % 7 = 0 THEN NULL
      |            ELSE l_quantity END AS q FROM lineitem""".stripMargin

  /** liWithNulls plus a weight column with deliberate INVALID (negative)
    * weights — the weighted-fit oracles must show those rows filtered.
    */
  private def liWeighted(s: SparkSession, dir: String): DataFrame =
    liWithNulls(s, dir).withColumn("wt",
      when(col("l_linenumber") % 4 === 0, -1.0)
        .when(col("l_linenumber") % 3 === 0, 2.0).otherwise(1.0))
  private val liWeightedSql =
    s"""SELECT *, CASE WHEN l_linenumber % 4 = 0 THEN -1.0
       |            WHEN l_linenumber % 3 = 0 THEN 2.0
       |            ELSE 1.0 END AS wt FROM ($liWithNullsSql) b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q116_hist_quantile_sketch" -> ((s, dir) => {
      // the bounded-shuffle quantile FIT path (graft.core.Sketch):
      // fixed-bin histogram quantiles, value-exact vs a DuckDB oracle
      // that recomputes the identical deterministic rule — bin =
      // min(floor((v-min)/width), bins-1), linear interpolation within
      // the hit bin of the cumulative histogram
      val li = tbl(s, dir, "lineitem")
      val probs = Seq(0.1, 0.5, 0.9, 0.99)
      val r = graft.core.Sketch.histQuantilesMelted(li,
        Map("l_quantity" -> probs, "l_extendedprice" -> probs),
        lit(1.0), bins = 256)
      val rows = for {
        c <- Seq("l_extendedprice", "l_quantity"); i <- probs.indices
      } yield (c, probs(i), r(c)(i).get)
      import s.implicits._
      rows.toDF("col_name", "prob", "q_approx")
        .withColumn("q_approx", round(col("q_approx"), 6))
        .orderBy("col_name", "prob")
    }),

    "q01_mean_impute" -> ((s, dir) => {
      val df = liWithNulls(s, dir)
      val t = new MeanImputer(Seq("q")).fit(df)
      t.transform(df)
        .select(col("l_orderkey"), col("l_linenumber"), col("q"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q02_median_impute" -> ((s, dir) => {
      val df = liWithNulls(s, dir)
      val t = new MedianImputer(Seq("q")).fit(df)
      t.transform(df)
        .select(col("l_orderkey"), col("l_linenumber"), col("q"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q03_mode_impute" -> ((s, dir) => {
      val df = tbl(s, dir, "orders").withColumn("prio",
        when(col("o_orderkey") % 13 === 0, lit(null))
          .otherwise(col("o_orderpriority")))
      val t = new ModeImputer(Seq("prio")).fit(df)
      t.transform(df).select(col("o_orderkey"), col("prio"))
        .orderBy("o_orderkey")
    }),

    "q04_null_indicator" -> ((s, dir) => {
      val df = liWithNulls(s, dir)
      new NullIndicator(Seq("q")).transform(df)
        .select(col("l_orderkey"), col("l_linenumber"), col("q_nulls"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q05_arbitrary_impute" -> ((s, dir) => {
      val df = tbl(s, dir, "events").withColumn("v",
        when(col("event_id") % 11 === 0, lit(null))
          .otherwise(col("value")))
      new ArbitraryImputer(Seq("v"), -1.0d).transform(df)
        .select(col("event_id"), col("v")).orderBy("event_id")
    }),

    "q06_capping_quantile" -> ((s, dir) => {
      val df = tbl(s, dir, "lineitem")
      val t = new CappingTransformer(quantiles =
        Map("l_quantity" -> (Some(0.05), Some(0.95)))).fit(df)
      t.transform(df)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q07_out_of_range_null" -> ((s, dir) => {
      val df = tbl(s, dir, "lineitem")
      val t = new OutOfRangeNullTransformer(cappingValues =
        Map("l_quantity" -> (Some(5.0), Some(45.0))))
      t.transform(df)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q08_group_rare_levels" -> ((s, dir) => {
      val df = tbl(s, dir, "part")
      val t = new GroupRareLevelsTransformer(Seq("p_brand"),
        cutOffPercent = 0.04).fit(df)
      t.transform(df).select(col("p_partkey"), col("p_brand"))
        .orderBy("p_partkey")
    }),

    "q230_oof_mean_response" -> ((s, dir) => {
      // leakage-safe target encoding: each row encoded with its
      // level's statistics over every fold EXCEPT its own (salted
      // md5-60 fold assignment, 5 folds, prior 5.0) — the q09 shape
      // made trainable without the label leaking into the feature.
      // Integral response => exact sums => bit-identical encodings
      val df = tbl(s, dir, "customer")
        .withColumn("resp", floor(col("c_acctbal")).cast("double"))
      OofMeanResponse.encode(df, "c_custkey", "c_mktsegment", "resp",
        nFolds = 5, salt = "oof", prior = 5.0)
        .select(col("c_custkey"), col("c_mktsegment_oof"))
        .orderBy("c_custkey")
    }),

    "q09_mean_response" -> ((s, dir) => {
      // integral response => exact sums => bit-identical encodings
      val df = tbl(s, dir, "customer")
        .withColumn("resp", floor(col("c_acctbal")).cast("double"))
      val t = new MeanResponseTransformer(Seq("c_mktsegment"), "resp",
        prior = 5.0).fit(df)
      t.transform(df).select(col("c_custkey"), col("c_mktsegment"))
        .orderBy("c_custkey")
    }),

    "q199_quantile_map" -> ((s, dir) => {
      // distribution alignment: odd-id events (the "serving
      // snapshot") get their values re-expressed as the even-id
      // snapshot's quantiles at the same cumulative fraction —
      // mapped(x) = Q_ref(F_cur(x)), both CDFs exact np.interp
      val ev = tbl(s, dir, "events")
      graft.core.Stats.quantileMap(
        ev.filter(col("event_id") % 2 === 1), "value",
        ev.filter(col("event_id") % 2 === 0), "value")
        .select(col("event_id"), round(col("mapped"), 6).as("mapped"))
        .orderBy("event_id")
    }),

    "q159_robust_scale" -> ((s, dir) => {
      // outlier-immune scaling: (x - median) / IQR from the exact
      // np.interp quantile machinery; heavily-tied integer quantities
      // exercise the interp's tie brackets
      val df = tbl(s, dir, "lineitem")
      val t = new RobustScalingTransformer(Seq("l_quantity")).fit(df)
      t.transform(df)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 6).as("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q158_yeo_johnson" -> ((s, dir) => {
      // power transform over a signed column (acctbal has negatives —
      // the case Box-Cox can't touch): lambda fitted from the 0.25
      // grid by Gaussian LL in ONE fused aggregation; the oracle
      // replays the entire fit (all 17 candidates' sums, the LL
      // argmax, and the chosen transform) in generated SQL
      val df = tbl(s, dir, "customer")
      val t = new YeoJohnsonTransformer(Seq("c_acctbal")).fit(df)
      t.transform(df)
        .select(col("c_custkey"),
          round(col("c_acctbal"), 6).as("c_acctbal"))
        .orderBy("c_custkey")
    }),

    "q345_drift_by_label" -> ((s, dir) => {
      // q344's exact centroid-drift chains per label — the sliced
      // audit that localizes WHICH class moved
      graft.operators.Drift.embeddingDriftByKey(
        tbl(s, dir, "embeddings"), "label", "embedding",
        col("vec_id") % 2 === 0)
        .select(col("label"), col("n_ref"), col("n_cur"),
          round(col("cos_centroid"), 6).as("cos_centroid"),
          round(col("shift_l2"), 6).as("shift_l2"))
        .orderBy("label")
    }),

    "q344_embedding_drift" -> ((s, dir) => {
      // centroid drift between the even- and odd-id embedding
      // slices: exact per-dim integer sums, the sum-vector cosine
      // (1/n cancels) and the integer-exact shift numerator — one
      // sqrt/divide tail on each readout
      graft.operators.Drift.embeddingDrift(
        tbl(s, dir, "embeddings"), "embedding",
        col("vec_id") % 2 === 0)
        .select(col("n_ref"), col("n_cur"),
          round(col("cos_centroid"), 6).as("cos_centroid"),
          round(col("shift_l2"), 6).as("shift_l2"))
    }),

    "q153_l2_normalize" -> ((s, dir) => {
      // unit-L2 embedding normalization: the squared norm accumulates
      // through an explicit left fold, which DuckDB's list_reduce
      // replays in the identical order — bit-exact before the
      // 6-decimal rounding, certified per element
      val t = new VectorL2NormalizeTransformer(Seq("embedding"))
      t.transform(tbl(s, dir, "embeddings"))
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("i", "v")))
        .select(col("vec_id"), col("i"), round(col("v"), 6).as("v"))
        .orderBy("vec_id", "i")
    }),

    "q155_json_extract" -> ((s, dir) => {
      // typed JSON field extraction from the raw event props — the
      // declared-schema ingest leg (no inference scan): present path
      // -> typed value, missing path -> null, certified against
      // DuckDB's json_extract_string
      val t = new JsonFieldExtractor("props", Seq(
        ("props_k", "$.k", "Int64"),
        ("props_k_str", "$.k", "String"),
        ("props_missing", "$.nope", "Float64")))
      t.transform(tbl(s, dir, "events"))
        .select(col("event_id"), col("props_k"), col("props_k_str"),
          col("props_missing"))
        .orderBy("event_id")
    }),

    "q148_count_encoder" -> ((s, dir) => {
      // frequency encoding with a train/apply split: fit on the
      // non-'5-LOW' subset, transform the FULL table — '5-LOW' rows are
      // genuinely unseen and must encode to 0.0. normalize=true makes
      // the encoding the level's weight share (cnt/total: exact
      // integer-count division, identical in both engines)
      val full = tbl(s, dir, "orders")
      val train = full.filter(col("o_orderpriority") =!= "5-LOW")
      val t = new CountEncoderTransformer(Seq("o_orderpriority"),
        normalize = true).fit(train)
      t.transform(full).select(col("o_orderkey"), col("o_orderpriority"))
        .orderBy("o_orderkey")
    }),

    "q149_woe_encoder" -> ((s, dir) => {
      // weight-of-evidence vs the binary "order is finalized" response,
      // Laplace-regularized (a=1). Counts are exact integer doubles;
      // the ln() argument is bit-identical in both engines, so
      // round(6) certifies the encoding value-exactly
      val df = tbl(s, dir, "orders")
        .withColumn("resp",
          when(col("o_orderstatus") === "F", 1.0).otherwise(0.0))
      val t = new WoeEncoderTransformer(Seq("o_orderpriority"), "resp")
        .fit(df)
      t.transform(df)
        .select(col("o_orderkey"),
          round(col("o_orderpriority"), 6).as("o_orderpriority"))
        .orderBy("o_orderkey")
    }),

    "q165_hashed_cross" -> ((s, dir) => {
      // hashing-trick cross feature (c_mktsegment x c_nationkey) into
      // 64 buckets — nulls injected via NULLIF to prove the U+0001
      // null sentinel and U+001F separator are engine-portable: the
      // oracle recomputes every bucket from md5 digits
      val df = tbl(s, dir, "customer")
        .withColumn("seg", nullif(col("c_mktsegment"), lit("BUILDING")))
      val t = new HashedCrossEncoder(Seq("seg", "c_nationkey"), 64,
        "cross_bucket")
      t.transform(df)
        .select(col("c_custkey"), col("cross_bucket"))
        .orderBy("c_custkey")
    }),

    "q10_one_hot" -> ((s, dir) => {
      val df = tbl(s, dir, "orders")
      val t = new OneHotEncodingTransformer(Seq("o_orderstatus")).fit(df)
      t.transform(df).select(col("o_orderkey"),
          col("o_orderstatus_F"), col("o_orderstatus_O"),
          col("o_orderstatus_P"))
        .orderBy("o_orderkey")
    }),

    "q11_mapping" -> ((s, dir) => {
      val df = tbl(s, dir, "lineitem")
      val t = new MappingTransformer(Map("l_returnflag" -> Map(
        Option("A") -> "accepted", Option("N") -> "none",
        Option("R") -> "returned")))
      t.transform(df)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q12_datetime_info" -> ((s, dir) => {
      val df = tbl(s, dir, "events")
      new DatetimeInfoExtractor(Seq("ts")).transform(df)
        .select(col("event_id"), col("ts_timeofday"), col("ts_timeofmonth"),
          col("ts_timeofyear"), col("ts_dayofweek"))
        .orderBy("event_id")
    }),

    "q13_date_difference" -> ((s, dir) => {
      val df = tbl(s, dir, "lineitem").join(
        tbl(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      new DateDifferenceTransformer("o_orderdate", "l_shipdate",
        Some("ship_delay_days"), "D").transform(df)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("ship_delay_days"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q14_between_dates" -> ((s, dir) => {
      val df = tbl(s, dir, "lineitem")
        .join(tbl(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("upper_ts",
          col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      new BetweenDatesTransformer("o_orderdate", "l_shipdate", "upper_ts",
        "shipped_within_30d").transform(df)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("shipped_within_30d"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q15_datetime_components" -> ((s, dir) => {
      val df = tbl(s, dir, "events")
      new DatetimeComponentExtractor(Seq("ts"),
        Seq("hour", "day", "month", "year")).transform(df)
        .select(col("event_id"), col("ts_hour"), col("ts_day"),
          col("ts_month"), col("ts_year"))
        .orderBy("event_id")
    }),

    "q16_sinusoid" -> ((s, dir) => {
      val df = tbl(s, dir, "events")
      new DatetimeSinusoidCalculator(Seq("ts"), Seq("sin", "cos"),
        Map("ts" -> "month"), Map("ts" -> 12.0)).transform(df)
        .select(col("event_id"),
          round(col("sin_12_month_ts"), 6).as("sin_month"),
          round(col("cos_12_month_ts"), 6).as("cos_month"))
        .orderBy("event_id")
    }),

    "q29_to_datetime" -> ((s, dir) => {
      // round-trip: date -> dd/MM/yyyy string -> ToDatetime parse;
      // output re-formatted to string so the oracle compare is
      // timestamp-dialect-proof
      val df = tbl(s, dir, "orders")
        .withColumn("ds", date_format(col("o_orderdate"), "dd/MM/yyyy"))
      new ToDatetimeTransformer(Seq("ds"), Some("dd/MM/yyyy"))
        .transform(df)
        .select(col("o_orderkey"),
          date_format(col("ds"), "yyyy-MM-dd HH:mm:ss").as("parsed"))
        .orderBy("o_orderkey")
    }),

    "q17_difference" -> ((s, dir) => {
      val df = tbl(s, dir, "lineitem")
      new DifferenceTransformer("l_extendedprice", "l_tax",
        Some("price_minus_tax")).transform(df)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("price_minus_tax"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q18_ratio" -> ((s, dir) => {
      val df = tbl(s, dir, "lineitem")
        .withColumn("d", when(col("l_linenumber") % 5 === 0, 0.0)
          .otherwise(col("l_tax")))
      new RatioTransformer("l_discount", "d", Some("disc_tax_ratio"))
        .transform(df)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("disc_tax_ratio"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q19_agg_rows_over_column" -> ((s, dir) => {
      val df = tbl(s, dir, "lineitem")
      new AggregateRowsOverColumnTransformer(Seq("l_quantity"),
        Seq("min", "max", "mean", "sum", "median", "count"),
        key = "l_orderkey").transform(df)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity_min"), col("l_quantity_max"),
          col("l_quantity_mean"), col("l_quantity_sum"),
          col("l_quantity_median"), col("l_quantity_count"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q20_agg_columns_over_row" -> ((s, dir) => {
      val df = tbl(s, dir, "lineitem")
      new AggregateColumnsOverRowTransformer(
        Seq("l_quantity", "l_discount", "l_tax"),
        Seq("min", "max", "sum", "mean")).transform(df)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity_l_discount_l_tax_min"),
          col("l_quantity_l_discount_l_tax_max"),
          col("l_quantity_l_discount_l_tax_sum"),
          col("l_quantity_l_discount_l_tax_mean"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q21_lowercase" -> ((s, dir) => {
      val df = tbl(s, dir, "customer")
      new LowerCaseTransformer(Seq("c_mktsegment")).transform(df)
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy("c_custkey")
    }),

    "q22_remove_chars" -> ((s, dir) => {
      val df = tbl(s, dir, "customer")
      new RemoveCharactersTransformer(Seq("c_name"),
        Seq("0", "#")).transform(df)
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    "q23_string_contains" -> ((s, dir) => {
      val df = tbl(s, dir, "orders")
      new StringContainsTransformer(Seq("o_orderpriority"),
        Left("HIGH")).transform(df)
        .select(col("o_orderkey"), col("o_orderpriority_contains_HIGH"))
        .orderBy("o_orderkey")
    }),

    "q24_extract_components" -> ((s, dir) => {
      val df = tbl(s, dir, "customer")
      new ExtractStringComponentsTransformer(Seq("c_name"), "#", 2)
        .transform(df)
        .select(col("c_custkey"),
          col("c_name_split_by_#_entry_0").as("name_part0"),
          col("c_name_split_by_#_entry_1").as("name_part1"))
        .orderBy("c_custkey")
    }),

    "q25_compare_columns" -> ((s, dir) => {
      val df = tbl(s, dir, "lineitem").withColumn("d",
        when(col("l_linenumber") % 6 === 0, lit(null))
          .otherwise(col("l_discount")))
      new CompareTwoColumnsTransformer("d", "l_tax", ">",
        Some("disc_gt_tax")).transform(df)
        .select(col("l_orderkey"), col("l_linenumber"), col("disc_gt_tax"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q26_when_then_otherwise" -> ((s, dir) => {
      val df = tbl(s, dir, "orders")
        .withColumn("is_f", col("o_orderstatus") === "F")
        .withColumn("zeroed", lit(-1.0))
      new WhenThenOtherwiseTransformer(Seq("o_totalprice"),
        "is_f", "zeroed").transform(df)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    "q27_misc" -> ((s, dir) => {
      val df = tbl(s, dir, "orders")
      val p = Pipeline(
        "rename" -> new RenameColumnsTransformer(
          Map("o_totalprice" -> "price_copy")),
        "set" -> new SetValueTransformer(Seq("o_orderpriority"), "fixed"),
        "cast" -> new ColumnDtypeSetter(Seq("o_custkey"), "Int32"),
        // UInt widening (functions/misc.py:62-65): UInt16 -> INT,
        // UInt64 -> DECIMAL(20,0) — no unsigned types in Spark
        "cast_u16" -> new ColumnDtypeSetter(Seq("okey_u16"), "UInt16"),
        "cast_u64" -> new ColumnDtypeSetter(Seq("okey_u64"), "UInt64"))
      val in = df
        .withColumn("okey_u16", pmod(col("o_orderkey"), lit(50000L))
          .cast("int"))
        .withColumn("okey_u64", col("o_orderkey"))
      p.fit(in)
      p.transform(in)
        .select(col("o_orderkey"), col("price_copy"),
          col("o_orderpriority"), col("o_custkey"),
          col("okey_u16"), col("okey_u64"))
        .orderBy("o_orderkey")
    }),

    "q28_onedkmeans" -> ((s, dir) => {
      // PINNED bins (k=4): the Lloyd fit's floating-point averages are
      // not SQL-reproducible, so the driver query restores a
      // deterministic fitted state and exercises the digitize
      // transform value-exactly; the FIT path itself is covered by
      // NumericSpec's reference pytest goldens (incl. null/NaN
      // rejection). Distinct bins from q54 (different k and edges).
      val df = tbl(s, dir, "customer")
      val t = new OneDKmeansTransformer("c_acctbal", "bal_bin", k = 4)
      t.restoreFit(Map("bins" -> Seq(-1000.0, 3000.0, 7000.0)))
      t.transform(df).select(col("c_custkey"), col("bal_bin"))
        .orderBy("c_custkey")
    }),

    "q54_kmeans_digitize" -> ((s, dir) => {
      // the transform half of OneDKmeans (np.digitize right=True) with
      // PINNED bins — fully oracle-expressible, complementing q28 whose
      // k-means fit is not SQL-reproducible
      val df = tbl(s, dir, "customer")
      val t = new OneDKmeansTransformer("c_acctbal", "bal_bin", k = 5)
      t.restoreFit(Map("bins" -> Seq(0.0, 2500.0, 5000.0, 7500.0)))
      t.transform(df).select(col("c_custkey"), col("bal_bin"))
        .orderBy("c_custkey")
    }),

    "q55_weighted_mean_impute" -> ((s, dir) => {
      // weighted fit path end-to-end: invalid (negative) weights must
      // be filtered from the fit (Weights.validFilter), valid weights
      // scale the mean
      val df = liWeighted(s, dir)
      val t = new MeanImputer(Seq("q"), weightsColumn = Some("wt")).fit(df)
      t.transform(df)
        .select(col("l_orderkey"), col("l_linenumber"), col("q"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q56_weighted_median_impute" -> ((s, dir) => {
      val df = liWeighted(s, dir)
      val t = new MedianImputer(Seq("q"), weightsColumn = Some("wt")).fit(df)
      t.transform(df)
        .select(col("l_orderkey"), col("l_linenumber"), col("q"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q57_weighted_mode_impute" -> ((s, dir) => {
      val df = tbl(s, dir, "orders")
        .withColumn("prio",
          when(col("o_orderkey") % 13 === 0, lit(null))
            .otherwise(col("o_orderpriority")))
        .withColumn("wt",
          when(col("o_orderkey") % 5 === 0, -3.0)
            .when(col("o_orderkey") % 2 === 0, 2.0).otherwise(1.0))
      val t = new ModeImputer(Seq("prio"), weightsColumn = Some("wt")).fit(df)
      t.transform(df).select(col("o_orderkey"), col("prio"))
        .orderBy("o_orderkey")
    }),

    "q58_mean_response_multilevel" -> ((s, dir) => {
      // multi-level response: one encoded column per response level,
      // y binarised per level (tubular/nominal.py:896-941)
      val df = tbl(s, dir, "customer")
        .withColumn("resp",
          when(pmod(col("c_nationkey"), lit(3)) === 0, "low")
            .when(pmod(col("c_nationkey"), lit(3)) === 1, "mid")
            .otherwise("high"))
      val t = new MeanResponseTransformer(Seq("c_mktsegment"), "resp",
        level = Seq("low", "mid")).fit(df)
      t.transform(df)
        .select(col("c_custkey"), col("c_mktsegment_low"),
          col("c_mktsegment_mid"))
        .orderBy("c_custkey")
    }),

    "q59_mean_response_unseen" -> ((s, dir) => {
      // unseen-level median fallback (tubular/nominal.py:1240-1311):
      // fit on a subset of levels, transform the full table — unseen
      // levels take the weighted median of the encoded training column
      val base = tbl(s, dir, "customer")
        .withColumn("f", concat_ws("#", col("c_mktsegment"),
          pmod(col("c_nationkey"), lit(7)).cast("int").cast("string")))
        .withColumn("resp", floor(col("c_acctbal")).cast("double"))
      val fitDf = base.filter(pmod(col("c_nationkey"), lit(7)) < 5)
      val t = new MeanResponseTransformer(Seq("f"), "resp",
        unseenLevelHandling = Some(Right("median"))).fit(fitDf)
      t.transform(base).select(col("c_custkey"), col("f"))
        .orderBy("c_custkey")
    }),

    "q63_scaling" -> ((s, dir) => {
      // all three sklearn scaler modes in one pass (fit fused per
      // transformer: one agg scan each; transform is in-place)
      val df = tbl(s, dir, "lineitem")
      val std = new ScalingTransformer(Seq("l_quantity"), "standard")
        .fit(df)
      val mm = new ScalingTransformer(Seq("l_extendedprice"), "min_max")
        .fit(df)
      val ma = new ScalingTransformer(Seq("l_discount"), "max_abs")
        .fit(df)
      ma.transform(mm.transform(std.transform(df)))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 6).as("q_std"),
          round(col("l_extendedprice"), 6).as("price_mm"),
          round(col("l_discount"), 6).as("disc_ma"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q64_log" -> ((s, dir) => {
      val df = tbl(s, dir, "lineitem")
      val t = new LogTransformer(Seq("l_quantity"), base = None) // ln
      val t10 = new LogTransformer(Seq("l_extendedprice"),
        base = Some(10.0), suffix = "log10")
      t10.transform(t.transform(df))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity_log"), 6).as("q_ln"),
          round(col("l_extendedprice_log10"), 6).as("price_log10"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q65_cut" -> ((s, dir) => {
      val df = tbl(s, dir, "lineitem")
      cutQ65.transform(df)
        .select(col("l_orderkey"), col("l_linenumber"), col("disc_bin"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q66_pca_transform" -> ((s, dir) => {
      // PCA transform with PINNED components (the q54 pattern): the
      // eigensolve isn't SQL-reproducible, but the fitted projection
      // is an exact linear map both engines compute identically; the
      // FIT is pinned to the reference sklearn golden in
      // TwoColInteractionPcaSpec
      val df = tbl(s, dir, "lineitem")
      val t = new PCATransformer(
        Seq("l_quantity", "l_extendedprice", "l_discount"), 2)
      t.restoreFit(Map("means" -> pcaQ66Means,
        "components" -> pcaQ66Comps))
      t.transform(df)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("pca_0"), 6).as("pca_0"),
          round(col("pca_1"), 6).as("pca_1"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q67_two_column_ops" -> ((s, dir) => {
      val df = tbl(s, dir, "lineitem")
        .withColumn("a", col("l_extendedprice") - lit(2000.0))
      val m = new TwoColumnOperatorTransformer("mod", "a",
        "l_quantity", "a_mod_q")
      val p = new TwoColumnOperatorTransformer("pow", "l_discount",
        "l_tax", "disc_pow_tax")
      p.transform(m.transform(df))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("a_mod_q"), 6).as("a_mod_q"),
          round(col("disc_pow_tax"), 6).as("disc_pow_tax"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q68_interaction" -> ((s, dir) => {
      val df = tbl(s, dir, "lineitem")
      // reference naming uses spaces ("a b"); alias for the parquet dump
      new InteractionTransformer(
        Seq("l_quantity", "l_discount", "l_tax"), 2, 3)
        .transform(df)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity l_discount"), 6).as("q_disc"),
          round(col("l_quantity l_tax"), 6).as("q_tax"),
          round(col("l_discount l_tax"), 6).as("disc_tax"),
          round(col("l_quantity l_discount l_tax"), 6).as("q_disc_tax"))
        .orderBy("l_orderkey", "l_linenumber")
    })
  )

  /** resurrected-deprecated operator queries (merged into [[queries]]
    * via [[allQueries]]). */
  private val deprecatedSetQueries
      : Map[String, (SparkSession, String) => DataFrame] = Map(
    "q69_ordinal_nominal_codes" -> ((s, dir) => {
      val d = tbl(s, dir, "customer")
        .withColumn("seg2", col("c_mktsegment"))
      val o = new OrdinalEncoderTransformer(
        Seq("c_mktsegment"), "c_acctbal").fit(d)
      val n = new NominalToIntegerTransformer(Seq("seg2")).fit(d)
      n.transform(o.transform(d))
        .select(col("c_custkey"), col("c_mktsegment"), col("seg2"))
        .orderBy("c_custkey")
    }),

    "q70_cross_column_adjust" -> ((s, dir) => {
      val d = tbl(s, dir, "lineitem")
      val m = new CrossColumnMultiplyTransformer("l_extendedprice", Seq(
        "l_returnflag" -> Seq("A" -> 1.1, "R" -> 0.9)))
      val a = new CrossColumnAddTransformer("l_extendedprice", Seq(
        "l_linestatus" -> Seq("O" -> 5.0)))
      a.transform(m.transform(d))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 6).as("adj_price"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q71_leapyear_eq_concat" -> ((s, dir) => {
      val d = tbl(s, dir, "lineitem")
        .withColumn("lo", to_date(col("l_shipdate")))
        .withColumn("hi",
          date_add(to_date(col("l_shipdate")),
            pmod(col("l_partkey"), lit(1500)).cast("int")))
      val age = new DateDiffLeapYearTransformer("lo", "hi", "age")
      val eq = new EqualityChecker("l_returnflag", "l_linestatus", "same")
      val cat = new StringConcatenator(
        Seq("l_returnflag", "l_linestatus"), "rf_ls", separator = "|")
      cat.transform(eq.transform(age.transform(d)))
        .select(col("l_orderkey"), col("l_linenumber"), col("age"),
          col("same"), col("rf_ls"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q122_series_str_method" -> ((s, dir) => {
      // whitelisted SeriesStrMethodTransformer chain: upper, len,
      // regex contains (the pandas default), python slice
      val d = tbl(s, dir, "documents")
      val chain = Seq(
        new SeriesStrMethodTransformer("src_upper", "upper",
          Seq("source")),
        new SeriesStrMethodTransformer("src_len", "len", Seq("source")),
        new SeriesStrMethodTransformer("has_pat", "contains",
          Seq("text"), Map("pat" -> "the .{3}")),
        new SeriesStrMethodTransformer("sliced", "slice", Seq("text"),
          Map("start" -> 3, "stop" -> 17)))
      chain.foldLeft(d)((acc, t) => t.transform(acc))
        .select(col("doc_id"), col("src_upper"), col("src_len"),
          col("has_pat"), col("sliced"))
        .orderBy("doc_id")
    }),

    "q123_series_dt_method" -> ((s, dir) => {
      // whitelisted SeriesDtMethodTransformer chain incl. the pinned
      // pandas divergences: Monday=0 weekday, proleptic leap rule
      val d = tbl(s, dir, "lineitem")
        .withColumn("sd", to_date(col("l_shipdate")))
      val chain = Seq(
        new SeriesDtMethodTransformer("ship_year", "year", Seq("sd")),
        new SeriesDtMethodTransformer("ship_wd", "dayofweek",
          Seq("sd")),
        new SeriesDtMethodTransformer("ship_q", "quarter", Seq("sd")),
        new SeriesDtMethodTransformer("ship_dim", "days_in_month",
          Seq("sd")),
        new SeriesDtMethodTransformer("ship_leap", "is_leap_year",
          Seq("sd")))
      chain.foldLeft(d)((acc, t) => t.transform(acc))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("ship_year"), col("ship_wd"), col("ship_q"),
          col("ship_dim"), col("ship_leap"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q140_df_method" -> ((s, dir) => {
      // whitelisted DataFrameMethodTransformer chain covering both
      // method families: row-wise skipna reductions (axis=1) over a
      // nullable column, element-wise scalar arithmetic incl. the
      // Python mod sign rule on negatives, and chaining (qm30 feeds
      // qmod/qabs)
      val d = liWithNulls(s, dir)
      val chain = Seq(
        new DataFrameMethodTransformer(Seq("s_qt"), "sum",
          Seq("q", "l_tax"), Map("axis" -> 1)),
        new DataFrameMethodTransformer(Seq("m_qq"), "mean",
          Seq("q", "l_quantity"), Map("axis" -> 1)),
        new DataFrameMethodTransformer(Seq("mn_qd"), "min",
          Seq("q", "l_discount"), Map("axis" -> 1)),
        new DataFrameMethodTransformer(Seq("half_price"), "div",
          Seq("l_extendedprice"), Map("other" -> 2)),
        new DataFrameMethodTransformer(Seq("qm30"), "sub",
          Seq("l_quantity"), Map("other" -> 30)),
        new DataFrameMethodTransformer(Seq("qmod"), "mod",
          Seq("qm30"), Map("other" -> 7)),
        new DataFrameMethodTransformer(Seq("qabs"), "abs",
          Seq("qm30")))
      chain.foldLeft(d)((acc, t) => t.transform(acc))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("s_qt"), 6).as("s_qt"),
          round(col("m_qq"), 6).as("m_qq"),
          round(col("mn_qd"), 6).as("mn_qd"),
          round(col("half_price"), 6).as("half_price"),
          col("qmod"), col("qabs"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q72_nearest_mean_response" -> ((s, dir) => {
      val d = liWithNulls(s, dir)
      val t = new NearestMeanResponseImputer(Seq("q"),
        "l_extendedprice").fit(d)
      t.transform(d)
        .select(col("l_orderkey"), col("l_linenumber"), col("q"))
        .orderBy("l_orderkey", "l_linenumber")
    }))

  /** Every QueriesCore query, including the resurrected set. */
  val allQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries ++ deprecatedSetQueries

  /** q66's pinned PCA state, shared with the oracle so literals match. */
  private val pcaQ66Means = Seq(25.5, 38000.0, 0.05)
  private val pcaQ66Comps = Seq(
    Seq(0.8, 0.6, 0.0),
    Seq(-0.6, 0.8, 0.1))

  /** Shared by the q65 query and its oracle so the interval-label
    * literals are identical by construction.
    */
  private lazy val cutQ65 = new CutTransformer("l_discount", "disc_bin",
    bins = Seq(0.0, 0.02, 0.05, 0.08, 0.1), includeLowest = true)

  /** psi(x, l) in SQL, mirroring YeoJohnsonTransformer.psi's exact
    * expression tree (same +1.0 / pow / negate / divide order).
    */
  private def yjPsiSql(x: String, l: Double): String = {
    val ls = f"$l%.2f"
    val tl = f"${2.0 - l}%.2f"
    val pos =
      if (l == 0.0) s"ln($x + 1.0)"
      else s"(pow($x + 1.0, CAST($ls AS DOUBLE)) - 1.0) " +
        s"/ CAST($ls AS DOUBLE)"
    val neg =
      if (l == 2.0) s"-ln(-($x) + 1.0)"
      else s"(-(pow(-($x) + 1.0, CAST($tl AS DOUBLE)) - 1.0)) " +
        s"/ CAST($tl AS DOUBLE)"
    s"CASE WHEN $x >= 0 THEN $pos ELSE $neg END"
  }

  /** Generated full-fit replay of q158: per-candidate fused sums,
    * the LL argmax, and the chosen transform — built from the SAME
    * grid the operator defaults to, so they cannot drift.
    */
  private lazy val yeoJohnsonSql: String = {
    val grid = (-8 to 8).map(_ * 0.25)
    val sums = grid.zipWithIndex.map { case (l, i) =>
      val p = yjPsiSql("x", l)
      s"SUM($p) AS s$i, SUM(($p) * ($p)) AS q$i"
    }.mkString(",\n    ")
    val cand = grid.zipWithIndex.map { case (l, i) =>
      f"SELECT CAST($l%.2f AS DOUBLE) AS l, s$i AS s, q$i AS q FROM f"
    }.mkString("\n  UNION ALL ")
    val pick = grid.map { l =>
      f"WHEN best.l = CAST($l%.2f AS DOUBLE) THEN ${yjPsiSql("x.x", l)}"
    }.mkString("\n    ")
    s"""WITH x AS (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS x
      |  FROM customer),
      |xc AS (SELECT x FROM x WHERE x IS NOT NULL AND NOT isnan(x)),
      |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CASE WHEN x >= 0 THEN ln(x + 1.0)
      |        ELSE -ln(-(x) + 1.0) END) AS slog,
      |    $sums
      |  FROM xc),
      |cand AS ($cand),
      |ll AS (SELECT cand.l,
      |    ((-f.n) / 2.0) * ln(GREATEST(cand.q / f.n
      |      - (cand.s / f.n) * (cand.s / f.n), 1e-300))
      |    + (cand.l - 1.0) * f.slog AS ll
      |  FROM cand, f),
      |best AS (SELECT l FROM ll ORDER BY ll DESC, l LIMIT 1)
      |SELECT x.c_custkey, ROUND(CASE
      |    $pick
      |  END, 6) AS c_acctbal
      |FROM x, best ORDER BY 1""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // only q is nullable in liWithNulls, so pandas skipna reductions
    // reduce to COALESCE forms; ((x % 7) + 7) % 7 mirrors the Python
    // mod sign rule for the positive divisor
    "q140_df_method" ->
      s"""WITH t AS ($liWithNullsSql)
         |SELECT l_orderkey, l_linenumber,
         |  ROUND(COALESCE(q, 0) + l_tax, 6) AS s_qt,
         |  ROUND((COALESCE(q, 0) + l_quantity) /
         |    (CASE WHEN q IS NULL THEN 1 ELSE 2 END), 6) AS m_qq,
         |  ROUND(CASE WHEN q IS NULL THEN l_discount
         |    ELSE least(q, l_discount) END, 6) AS mn_qd,
         |  ROUND(l_extendedprice / 2, 6) AS half_price,
         |  (((l_quantity - 30) % 7) + 7) % 7 AS qmod,
         |  abs(l_quantity - 30) AS qabs
         |FROM t ORDER BY 1, 2""".stripMargin,

    "q122_series_str_method" ->
      """SELECT doc_id, upper(source) AS src_upper,
        |  CAST(length(source) AS INT) AS src_len,
        |  regexp_matches(text, 'the .{3}') AS has_pat,
        |  substring(text, 4, 14) AS sliced
        |FROM documents ORDER BY doc_id""".stripMargin,

    // isodow: Monday=1 -> pandas weekday = isodow - 1
    "q123_series_dt_method" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS ship_year,
        |  CAST(isodow(CAST(l_shipdate AS DATE)) - 1 AS INT) AS ship_wd,
        |  CAST(quarter(CAST(l_shipdate AS DATE)) AS INT) AS ship_q,
        |  CAST(day(last_day(CAST(l_shipdate AS DATE))) AS INT)
        |    AS ship_dim,
        |  (year(CAST(l_shipdate AS DATE)) % 4 = 0
        |    AND year(CAST(l_shipdate AS DATE)) % 100 != 0)
        |    OR year(CAST(l_shipdate AS DATE)) % 400 = 0 AS ship_leap
        |FROM lineitem ORDER BY 1, 2""".stripMargin,

    // the sketch rule recomputed verbatim: same bin assignment, same
    // cumulative order (by bin), same clamped interpolation. cum sums
    // run in bin order on both sides so the doubles match; round(6)
    // absorbs aggregate-order ulp drift in the totals
    "q116_hist_quantile_sketch" ->
      """WITH v AS (
        |  SELECT 'l_extendedprice' AS k, l_extendedprice AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |  UNION ALL
        |  SELECT 'l_quantity', l_quantity
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |mm AS (SELECT k, min(v) AS mn, max(v) AS mx,
        |         (max(v) - min(v)) / 256 AS width FROM v GROUP BY k),
        |hist AS (
        |  SELECT v.k,
        |    CAST(CASE WHEN width = 0 THEN 0
        |      ELSE least(floor((v - mn) / width), 255) END AS INT) AS b,
        |    CAST(count(*) AS DOUBLE) AS cw
        |  FROM v JOIN mm ON v.k = mm.k GROUP BY 1, 2),
        |cum AS (SELECT k, b, cw,
        |    sum(cw) OVER (PARTITION BY k ORDER BY b) AS cum
        |  FROM hist),
        |tot AS (SELECT k, sum(cw) AS w FROM hist GROUP BY k),
        |p AS (SELECT CAST(prob AS DOUBLE) AS prob
        |  FROM (VALUES (0.1), (0.5), (0.9), (0.99)) t(prob)),
        |tgt AS (SELECT mm.k, p.prob, p.prob * tot.w AS target,
        |    mm.mn, mm.width
        |  FROM mm JOIN tot ON mm.k = tot.k CROSS JOIN p),
        |hit AS (SELECT t.k, t.prob, t.mn, t.width, t.target,
        |    min(c.b) AS b
        |  FROM tgt t JOIN cum c ON c.k = t.k AND c.cum >= t.target
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT h.k AS col_name, h.prob,
        |  ROUND(h.mn + (h.b + greatest(least(
        |    (h.target - (c.cum - c.cw)) / c.cw, 1.0), 0.0)) * h.width,
        |    6) AS q_approx
        |FROM hit h JOIN cum c ON c.k = h.k AND c.b = h.b
        |ORDER BY 1, 2""".stripMargin,

    "q01_mean_impute" ->
      s"""WITH t AS ($liWithNullsSql)
         |SELECT l_orderkey, l_linenumber,
         |       COALESCE(q, (SELECT AVG(q) FROM t)) AS q
         |FROM t ORDER BY 1, 2""".stripMargin,

    "q02_median_impute" ->
      s"""WITH t AS ($liWithNullsSql),
         |g AS (SELECT q AS v, COUNT(*) AS w FROM t
         |      WHERE q IS NOT NULL GROUP BY 1),
         |c AS (SELECT v,
         |        SUM(w) OVER (ORDER BY v) * 1.0 / (SELECT SUM(w) FROM g)
         |          AS frac FROM g),
         |med AS (SELECT MIN(v) AS m FROM c WHERE frac >= 0.5)
         |SELECT l_orderkey, l_linenumber,
         |       COALESCE(q, (SELECT m FROM med)) AS q
         |FROM t ORDER BY 1, 2""".stripMargin,

    "q03_mode_impute" ->
      """WITH t AS (SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 13 = 0 THEN NULL
        |       ELSE o_orderpriority END AS prio FROM orders),
        |m AS (SELECT prio AS v FROM t WHERE prio IS NOT NULL
        |      GROUP BY 1 ORDER BY COUNT(*) DESC, v DESC LIMIT 1)
        |SELECT o_orderkey, COALESCE(prio, (SELECT v FROM m)) AS prio
        |FROM t ORDER BY 1""".stripMargin,

    "q04_null_indicator" ->
      s"""WITH t AS ($liWithNullsSql)
         |SELECT l_orderkey, l_linenumber, q IS NULL AS q_nulls
         |FROM t ORDER BY 1, 2""".stripMargin,

    "q05_arbitrary_impute" ->
      """SELECT event_id,
        |  COALESCE(CASE WHEN event_id % 11 = 0 THEN NULL
        |                ELSE value END, -1.0) AS v
        |FROM events ORDER BY 1""".stripMargin,

    // Interpolated weighted quantile with the SAME IEEE op order as
    // graft.core.Stats.weightedQuantiles: v_lo + (q-f_lo)/(f_hi-f_lo)*(v_hi-v_lo)
    "q06_capping_quantile" ->
      """WITH g AS (SELECT l_quantity AS v, COUNT(*) AS w
        |           FROM lineitem GROUP BY 1),
        |c AS (SELECT v,
        |        SUM(w) OVER (ORDER BY v) * 1.0 / (SELECT SUM(w) FROM g)
        |          AS f FROM g),
        |qlo AS (SELECT
        |   MAX(CASE WHEN f <= 0.05 THEN f END) AS f_lo,
        |   MAX(CASE WHEN f <= 0.05 THEN v END) AS v_lo,
        |   MIN(CASE WHEN f >= 0.05 THEN f END) AS f_hi,
        |   MIN(CASE WHEN f >= 0.05 THEN v END) AS v_hi FROM c),
        |qhi AS (SELECT
        |   MAX(CASE WHEN f <= 0.95 THEN f END) AS f_lo,
        |   MAX(CASE WHEN f <= 0.95 THEN v END) AS v_lo,
        |   MIN(CASE WHEN f >= 0.95 THEN f END) AS f_hi,
        |   MIN(CASE WHEN f >= 0.95 THEN v END) AS v_hi FROM c),
        |lo AS (SELECT CASE
        |   WHEN f_lo IS NULL THEN v_hi
        |   WHEN f_hi IS NULL OR f_hi = f_lo THEN v_lo
        |   ELSE v_lo + (0.05 - f_lo)/(f_hi - f_lo)*(v_hi - v_lo)
        |   END AS cap FROM qlo),
        |hi AS (SELECT CASE
        |   WHEN f_lo IS NULL THEN v_hi
        |   WHEN f_hi IS NULL OR f_hi = f_lo THEN v_lo
        |   ELSE v_lo + (0.95 - f_lo)/(f_hi - f_lo)*(v_hi - v_lo)
        |   END AS cap FROM qhi)
        |SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity IS NULL THEN NULL
        |       ELSE LEAST(GREATEST(l_quantity, (SELECT cap FROM lo)),
        |                  (SELECT cap FROM hi)) END AS l_quantity
        |FROM lineitem ORDER BY 1, 2""".stripMargin,

    "q07_out_of_range_null" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity >= 5.0 AND l_quantity <= 45.0
        |       THEN l_quantity END AS l_quantity
        |FROM lineitem ORDER BY 1, 2""".stripMargin,

    "q08_group_rare_levels" ->
      """WITH shares AS (
        |  SELECT p_brand AS lvl,
        |         COUNT(*) * 1.0 / (SELECT COUNT(*) FROM part) AS s
        |  FROM part WHERE p_brand IS NOT NULL GROUP BY 1)
        |SELECT p_partkey,
        |  CASE WHEN p_brand IS NULL THEN NULL
        |       WHEN p_brand IN (SELECT lvl FROM shares WHERE s >= 0.04)
        |       THEN p_brand ELSE 'rare' END AS p_brand
        |FROM part ORDER BY 1""".stripMargin,

    // same fold hash, level/fold partial sums, full-table prior mean;
    // integral response keeps every sum exact so the division operands
    // are bit-identical across engines
    "q230_oof_mean_response" ->
      """WITH t AS (SELECT c_custkey, c_mktsegment,
        |    CAST(FLOOR(c_acctbal) AS DOUBLE) AS resp,
        |    CAST('0x' || substring(md5(c_custkey || '#oof'), 1, 15)
        |      AS BIGINT) % 5 AS fold
        |  FROM customer),
        |gm AS (SELECT SUM(resp)/COUNT(*) AS g FROM t),
        |lf AS (SELECT c_mktsegment AS lvl, fold,
        |    SUM(resp) AS s, COUNT(*) AS c FROM t GROUP BY 1, 2),
        |l AS (SELECT lvl, SUM(s) AS s, SUM(c) AS c FROM lf GROUP BY 1)
        |SELECT t.c_custkey,
        |  CASE WHEN l.c - COALESCE(lf.c, 0) + 5.0 > 0 THEN
        |    (l.s - COALESCE(lf.s, 0.0) + 5.0 * (SELECT g FROM gm))
        |      / (l.c - COALESCE(lf.c, 0) + 5.0) END
        |    AS c_mktsegment_oof
        |FROM t JOIN l ON l.lvl = t.c_mktsegment
        |LEFT JOIN lf ON lf.lvl = t.c_mktsegment AND lf.fold = t.fold
        |ORDER BY 1""".stripMargin,

    "q09_mean_response" ->
      """WITH t AS (SELECT c_custkey, c_mktsegment,
        |  CAST(FLOOR(c_acctbal) AS DOUBLE) AS resp FROM customer),
        |gm AS (SELECT SUM(resp)/COUNT(*) AS g FROM t),
        |enc AS (SELECT c_mktsegment AS lvl,
        |          (SUM(resp) + 5.0 * (SELECT g FROM gm))
        |            / (COUNT(*) + 5.0) AS e
        |        FROM t GROUP BY 1)
        |SELECT c_custkey,
        |  (SELECT e FROM enc WHERE lvl = t.c_mktsegment) AS c_mktsegment
        |FROM t ORDER BY 1""".stripMargin,

    // full fit replay: all 17 candidates' (sum psi, sum psi^2) in one
    // pass, LL argmax (ties -> smallest lambda), then the chosen
    // transform — generated so the grid can't drift from the operator
    "q158_yeo_johnson" -> yeoJohnsonSql,

    // both CDFs as exact cumulative fractions (unit weights ->
    // integer-valued doubles, bit-identical to the range-partitioned
    // prefix sums), the f-space bracket via the same union + fill
    // (tie rule: refs sort before probes for flo, after for fhi),
    // then the shared interp expression with data-driven q
    "q199_quantile_map" ->
      """WITH curs AS (SELECT value AS v FROM events
        |  WHERE event_id % 2 = 1 AND value IS NOT NULL),
        |refs AS (SELECT value AS v FROM events
        |  WHERE event_id % 2 = 0 AND value IS NOT NULL),
        |cg AS (SELECT v, COUNT(*) AS w FROM curs GROUP BY 1),
        |cf AS (SELECT v, SUM(w) OVER (ORDER BY v) * 1.0 /
        |  (SELECT SUM(w) FROM cg) AS f FROM cg),
        |rg AS (SELECT v, COUNT(*) AS w FROM refs GROUP BY 1),
        |rf AS (SELECT v, SUM(w) OVER (ORDER BY v) * 1.0 /
        |  (SELECT SUM(w) FROM rg) AS f FROM rg),
        |u AS (SELECT f AS s, 1 AS isref, f AS fr, v AS vr,
        |    CAST(NULL AS DOUBLE) AS x FROM rf
        |  UNION ALL
        |  SELECT f, 0, NULL, NULL, v FROM cf),
        |lo AS (SELECT x, s AS q,
        |    LAST_VALUE(fr IGNORE NULLS) OVER
        |      (ORDER BY s, isref DESC ROWS UNBOUNDED PRECEDING)
        |      AS flo,
        |    LAST_VALUE(vr IGNORE NULLS) OVER
        |      (ORDER BY s, isref DESC ROWS UNBOUNDED PRECEDING)
        |      AS vlo
        |  FROM u),
        |hi AS (SELECT x,
        |    FIRST_VALUE(fr IGNORE NULLS) OVER (ORDER BY s, isref ASC
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |      AS fhi,
        |    FIRST_VALUE(vr IGNORE NULLS) OVER (ORDER BY s, isref ASC
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |      AS vhi
        |  FROM u),
        |m AS (SELECT lo.x, CASE
        |    WHEN flo IS NULL AND vlo IS NULL AND fhi IS NULL
        |      AND vhi IS NULL THEN NULL
        |    WHEN flo IS NULL THEN vhi
        |    WHEN fhi IS NULL THEN vlo
        |    WHEN fhi = flo THEN vlo
        |    ELSE vlo + (lo.q - flo) / (fhi - flo) * (vhi - vlo)
        |    END AS mapped
        |  FROM lo JOIN hi ON lo.x = hi.x)
        |SELECT e.event_id, ROUND(m.mapped, 6) AS mapped
        |FROM events e LEFT JOIN m ON e.value = m.x
        |WHERE e.event_id % 2 = 1
        |ORDER BY 1""".stripMargin,

    // the q06 np.interp bracket mirror at 0.25/0.5/0.75, then
    // (x - med) / (q3 - q1) — identical expression tree
    "q159_robust_scale" ->
      """WITH g AS (SELECT l_quantity AS v, COUNT(*) AS w
        |           FROM lineitem WHERE l_quantity IS NOT NULL
        |           GROUP BY 1),
        |c AS (SELECT v,
        |        SUM(w) OVER (ORDER BY v) * 1.0 / (SELECT SUM(w) FROM g)
        |          AS f FROM g),
        |b1 AS (SELECT
        |   MAX(CASE WHEN f <= 0.25 THEN f END) AS f_lo,
        |   MAX(CASE WHEN f <= 0.25 THEN v END) AS v_lo,
        |   MIN(CASE WHEN f >= 0.25 THEN f END) AS f_hi,
        |   MIN(CASE WHEN f >= 0.25 THEN v END) AS v_hi FROM c),
        |b2 AS (SELECT
        |   MAX(CASE WHEN f <= 0.5 THEN f END) AS f_lo,
        |   MAX(CASE WHEN f <= 0.5 THEN v END) AS v_lo,
        |   MIN(CASE WHEN f >= 0.5 THEN f END) AS f_hi,
        |   MIN(CASE WHEN f >= 0.5 THEN v END) AS v_hi FROM c),
        |b3 AS (SELECT
        |   MAX(CASE WHEN f <= 0.75 THEN f END) AS f_lo,
        |   MAX(CASE WHEN f <= 0.75 THEN v END) AS v_lo,
        |   MIN(CASE WHEN f >= 0.75 THEN f END) AS f_hi,
        |   MIN(CASE WHEN f >= 0.75 THEN v END) AS v_hi FROM c),
        |q1 AS (SELECT CASE
        |   WHEN f_lo IS NULL THEN v_hi
        |   WHEN f_hi IS NULL OR f_hi = f_lo THEN v_lo
        |   ELSE v_lo + (0.25 - f_lo)/(f_hi - f_lo)*(v_hi - v_lo)
        |   END AS q FROM b1),
        |md AS (SELECT CASE
        |   WHEN f_lo IS NULL THEN v_hi
        |   WHEN f_hi IS NULL OR f_hi = f_lo THEN v_lo
        |   ELSE v_lo + (0.5 - f_lo)/(f_hi - f_lo)*(v_hi - v_lo)
        |   END AS q FROM b2),
        |q3 AS (SELECT CASE
        |   WHEN f_lo IS NULL THEN v_hi
        |   WHEN f_hi IS NULL OR f_hi = f_lo THEN v_lo
        |   ELSE v_lo + (0.75 - f_lo)/(f_hi - f_lo)*(v_hi - v_lo)
        |   END AS q FROM b3),
        |sc AS (SELECT CASE WHEN s = 0 OR isnan(s) THEN 1.0 ELSE s END
        |   AS s FROM (SELECT (SELECT q FROM q3) - (SELECT q FROM q1)
        |   AS s))
        |SELECT l_orderkey, l_linenumber,
        |  ROUND((CAST(l_quantity AS DOUBLE) - (SELECT q FROM md))
        |    / (SELECT s FROM sc), 6) AS l_quantity
        |FROM lineitem ORDER BY 1, 2""".stripMargin,

    // the identical left fold via list_reduce (DuckDB evaluates it
    // left-to-right, proven in the round-4 build notes), so norm and
    // quotient are bit-identical; zero/null-poisoned vectors drop
    // q344's SQL with label joined through every grouping
    "q345_drift_by_label" ->
      """WITH v AS (SELECT label, vec_id, embedding FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) > 0
        |    AND vec_id IS NOT NULL AND label IS NOT NULL),
        |n AS (SELECT label,
        |    CAST(COUNT(*) FILTER (vec_id % 2 = 0) AS BIGINT) AS na,
        |    CAST(COUNT(*) FILTER (vec_id % 2 <> 0) AS BIGINT) AS nb
        |  FROM v GROUP BY label),
        |ex AS (SELECT label, vec_id,
        |    CAST(t.i AS BIGINT) AS d,
        |    CAST(round(CAST(embedding[t.i + 1] AS DOUBLE) * 1000)
        |      AS BIGINT) AS q
        |  FROM v, UNNEST(range(len(embedding))) AS t(i)),
        |pd AS (SELECT label, d,
        |    COALESCE(SUM(CAST(q AS HUGEINT))
        |      FILTER (vec_id % 2 = 0), 0) AS sa,
        |    COALESCE(SUM(CAST(q AS HUGEINT))
        |      FILTER (vec_id % 2 <> 0), 0) AS sb
        |  FROM ex GROUP BY label, d),
        |m AS (SELECT pd.label, na, nb, SUM(sa * sb) AS dot,
        |    SUM(sa * sa) AS naa, SUM(sb * sb) AS nbb,
        |    SUM((sa * nb - sb * na) * (sa * nb - sb * na)) AS sh
        |  FROM pd JOIN n ON pd.label = n.label
        |  GROUP BY pd.label, na, nb)
        |SELECT label, na AS n_ref, nb AS n_cur,
        |  CASE WHEN na > 0 AND nb > 0 AND naa > 0 AND nbb > 0 THEN
        |    ROUND(CAST(dot AS DOUBLE) / (sqrt(CAST(naa AS DOUBLE))
        |      * sqrt(CAST(nbb AS DOUBLE))), 6) END AS cos_centroid,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    ROUND(sqrt(CAST(sh AS DOUBLE)) / (CAST(na AS DOUBLE)
        |      * CAST(nb AS DOUBLE) * 1000), 6) END AS shift_l2
        |FROM m ORDER BY 1""".stripMargin,

    // same round(x*1000) quantization, exact HUGEINT per-dim sums,
    // the same sum-vector cosine and integer shift chains
    "q344_embedding_drift" ->
      """WITH v AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) > 0
        |    AND vec_id IS NOT NULL),
        |n AS (SELECT
        |    CAST(COUNT(*) FILTER (vec_id % 2 = 0) AS BIGINT) AS na,
        |    CAST(COUNT(*) FILTER (vec_id % 2 <> 0) AS BIGINT) AS nb
        |  FROM v),
        |ex AS (SELECT vec_id,
        |    CAST(t.i AS BIGINT) AS d,
        |    CAST(round(CAST(embedding[t.i + 1] AS DOUBLE) * 1000)
        |      AS BIGINT) AS q
        |  FROM v, UNNEST(range(len(embedding))) AS t(i)),
        |pd AS (SELECT d,
        |    COALESCE(SUM(CAST(q AS HUGEINT))
        |      FILTER (vec_id % 2 = 0), 0) AS sa,
        |    COALESCE(SUM(CAST(q AS HUGEINT))
        |      FILTER (vec_id % 2 <> 0), 0) AS sb
        |  FROM ex GROUP BY d),
        |m AS (SELECT na, nb, SUM(sa * sb) AS dot,
        |    SUM(sa * sa) AS naa, SUM(sb * sb) AS nbb,
        |    SUM((sa * nb - sb * na) * (sa * nb - sb * na)) AS sh
        |  FROM pd, n GROUP BY na, nb)
        |SELECT na AS n_ref, nb AS n_cur,
        |  CASE WHEN na > 0 AND nb > 0 AND naa > 0 AND nbb > 0 THEN
        |    ROUND(CAST(dot AS DOUBLE) / (sqrt(CAST(naa AS DOUBLE))
        |      * sqrt(CAST(nbb AS DOUBLE))), 6) END AS cos_centroid,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    ROUND(sqrt(CAST(sh AS DOUBLE)) / (CAST(na AS DOUBLE)
        |      * CAST(nb AS DOUBLE) * 1000), 6) END AS shift_l2
        |FROM m""".stripMargin,

    "q153_l2_normalize" ->
      """WITH n AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    sqrt(list_reduce(
        |      list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(embedding, x -> CAST(x AS DOUBLE))),
        |      (acc, x) -> acc + x * x)) AS nrm
        |  FROM embeddings WHERE embedding IS NOT NULL)
        |SELECT vec_id, CAST(t.i AS INTEGER) AS i,
        |  ROUND(v[t.i + 1] / nrm, 6) AS v
        |FROM n, UNNEST(range(len(v))) AS t(i)
        |WHERE nrm IS NOT NULL AND NOT isnan(nrm) AND nrm <> 0
        |ORDER BY 1, 2""".stripMargin,

    "q155_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k,
        |  json_extract_string(props, '$.k') AS props_k_str,
        |  CAST(json_extract_string(props, '$.nope') AS DOUBLE)
        |    AS props_missing
        |FROM events ORDER BY 1""".stripMargin,

    // fit on the non-'5-LOW' subset; '5-LOW' is unseen -> 0.0
    "q148_count_encoder" ->
      """WITH train AS (SELECT o_orderpriority FROM orders
        |    WHERE o_orderpriority <> '5-LOW'),
        |tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM train),
        |cnt AS (SELECT o_orderpriority AS lvl,
        |    CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot) AS share
        |  FROM train GROUP BY 1)
        |SELECT o_orderkey,
        |  CASE WHEN o_orderpriority IS NULL THEN NULL
        |       ELSE COALESCE((SELECT share FROM cnt
        |         WHERE lvl = orders.o_orderpriority),
        |         CAST(0 AS DOUBLE)) END AS o_orderpriority
        |FROM orders ORDER BY 1""".stripMargin,

    // woe = ln(((pos+1)/(posTot+2)) / ((neg+1)/(negTot+2))) — the
    // identical regularized fold over exact integer counts
    "q149_woe_encoder" ->
      """WITH t AS (SELECT o_orderkey, o_orderpriority,
        |    CASE WHEN o_orderstatus = 'F' THEN CAST(1 AS DOUBLE)
        |         ELSE CAST(0 AS DOUBLE) END AS y FROM orders),
        |g AS (SELECT SUM(y) AS pt, CAST(COUNT(*) AS DOUBLE) - SUM(y)
        |    AS nt FROM t),
        |enc AS (SELECT o_orderpriority AS lvl,
        |    ln(((SUM(y) + 1.0) / ((SELECT pt FROM g) + 2.0))
        |      / (((CAST(COUNT(*) AS DOUBLE) - SUM(y)) + 1.0)
        |        / ((SELECT nt FROM g) + 2.0))) AS woe
        |  FROM t GROUP BY 1)
        |SELECT o_orderkey,
        |  ROUND((SELECT woe FROM enc
        |    WHERE lvl = t.o_orderpriority), 6) AS o_orderpriority
        |FROM t ORDER BY 1""".stripMargin,

    "q165_hashed_cross" ->
      """SELECT c_custkey,
        |  CAST(CAST('0x' || substring(md5(
        |      concat_ws(chr(31),
        |        coalesce(NULLIF(c_mktsegment, 'BUILDING'), chr(1)),
        |        coalesce(CAST(c_nationkey AS VARCHAR), chr(1)))),
        |    1, 15) AS BIGINT) % 64 AS INTEGER) AS cross_bucket
        |FROM customer ORDER BY 1""".stripMargin,

    "q10_one_hot" ->
      """SELECT o_orderkey,
        |  o_orderstatus = 'F' AS "o_orderstatus_F",
        |  o_orderstatus = 'O' AS "o_orderstatus_O",
        |  o_orderstatus = 'P' AS "o_orderstatus_P"
        |FROM orders ORDER BY 1""".stripMargin,

    "q11_mapping" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE l_returnflag WHEN 'A' THEN 'accepted'
        |       WHEN 'N' THEN 'none' WHEN 'R' THEN 'returned'
        |       ELSE l_returnflag END AS l_returnflag
        |FROM lineitem ORDER BY 1, 2""".stripMargin,

    "q12_datetime_info" ->
      """SELECT event_id,
        |  CASE WHEN hour(ts) < 6 THEN 'night'
        |       WHEN hour(ts) < 12 THEN 'morning'
        |       WHEN hour(ts) < 18 THEN 'afternoon'
        |       ELSE 'evening' END AS ts_timeofday,
        |  CASE WHEN day(ts) <= 10 THEN 'start'
        |       WHEN day(ts) <= 20 THEN 'middle'
        |       ELSE 'end' END AS ts_timeofmonth,
        |  CASE WHEN month(ts) IN (3,4,5) THEN 'spring'
        |       WHEN month(ts) IN (6,7,8) THEN 'summer'
        |       WHEN month(ts) IN (9,10,11) THEN 'autumn'
        |       ELSE 'winter' END AS ts_timeofyear,
        |  CASE isodow(ts) WHEN 1 THEN 'monday' WHEN 2 THEN 'tuesday'
        |       WHEN 3 THEN 'wednesday' WHEN 4 THEN 'thursday'
        |       WHEN 5 THEN 'friday' WHEN 6 THEN 'saturday'
        |       ELSE 'sunday' END AS ts_dayofweek
        |FROM events ORDER BY 1""".stripMargin,

    "q13_date_difference" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(date_diff('day', date_trunc('day', o_orderdate),
        |                 date_trunc('day', l_shipdate)) AS DOUBLE)
        |    AS ship_delay_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY 1, 2""".stripMargin,

    "q14_between_dates" ->
      """SELECT l_orderkey, l_linenumber,
        |  (o_orderdate <= l_shipdate AND
        |   l_shipdate <= o_orderdate + INTERVAL 30 DAY)
        |    AS shipped_within_30d
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY 1, 2""".stripMargin,

    "q15_datetime_components" ->
      """SELECT event_id,
        |  CAST(hour(ts) AS FLOAT) AS ts_hour,
        |  CAST(day(ts) AS FLOAT) AS ts_day,
        |  CAST(month(ts) AS FLOAT) AS ts_month,
        |  CAST(year(ts) AS FLOAT) AS ts_year
        |FROM events ORDER BY 1""".stripMargin,

    "q16_sinusoid" ->
      """SELECT event_id,
        |  ROUND(SIN(month(ts) * (2 * PI() / 12.0)), 6) AS sin_month,
        |  ROUND(COS(month(ts) * (2 * PI() / 12.0)), 6) AS cos_month
        |FROM events ORDER BY 1""".stripMargin,

    "q29_to_datetime" ->
      """SELECT o_orderkey,
        |  strftime(strptime(strftime(o_orderdate, '%d/%m/%Y'),
        |                    '%d/%m/%Y'), '%Y-%m-%d %H:%M:%S') AS parsed
        |FROM orders ORDER BY 1""".stripMargin,

    "q17_difference" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice - l_tax AS price_minus_tax
        |FROM lineitem ORDER BY 1, 2""".stripMargin,

    "q18_ratio" ->
      """WITH t AS (SELECT *, CASE WHEN l_linenumber % 5 = 0 THEN 0.0
        |                          ELSE l_tax END AS d FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  CASE WHEN d != 0 THEN l_discount / d END AS disc_tax_ratio
        |FROM t ORDER BY 1, 2""".stripMargin,

    "q19_agg_rows_over_column" ->
      """SELECT l_orderkey, l_linenumber,
        |  MIN(l_quantity) OVER w AS l_quantity_min,
        |  MAX(l_quantity) OVER w AS l_quantity_max,
        |  AVG(l_quantity) OVER w AS l_quantity_mean,
        |  SUM(l_quantity) OVER w AS l_quantity_sum,
        |  MEDIAN(l_quantity) OVER w AS l_quantity_median,
        |  COUNT(l_quantity) OVER w AS l_quantity_count
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey)
        |ORDER BY 1, 2""".stripMargin,

    "q20_agg_columns_over_row" ->
      """SELECT l_orderkey, l_linenumber,
        |  LEAST(l_quantity, l_discount, l_tax)
        |    AS l_quantity_l_discount_l_tax_min,
        |  GREATEST(l_quantity, l_discount, l_tax)
        |    AS l_quantity_l_discount_l_tax_max,
        |  0.0 + l_quantity + l_discount + l_tax
        |    AS l_quantity_l_discount_l_tax_sum,
        |  (0.0 + l_quantity + l_discount + l_tax) / 3
        |    AS l_quantity_l_discount_l_tax_mean
        |FROM lineitem ORDER BY 1, 2""".stripMargin,

    "q21_lowercase" ->
      """SELECT c_custkey, LOWER(c_mktsegment) AS c_mktsegment
        |FROM customer ORDER BY 1""".stripMargin,

    "q22_remove_chars" ->
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0#]', '', 'g') AS c_name
        |FROM customer ORDER BY 1""".stripMargin,

    "q23_string_contains" ->
      """SELECT o_orderkey,
        |  contains(o_orderpriority, 'HIGH')
        |    AS "o_orderpriority_contains_HIGH"
        |FROM orders ORDER BY 1""".stripMargin,

    "q24_extract_components" ->
      """SELECT c_custkey,
        |  CASE WHEN len(string_split(c_name, '#')) > 0
        |       THEN string_split(c_name, '#')[1] END AS name_part0,
        |  CASE WHEN len(string_split(c_name, '#')) > 1
        |       THEN string_split(c_name, '#')[2] END AS name_part1
        |FROM customer ORDER BY 1""".stripMargin,

    "q25_compare_columns" ->
      """WITH t AS (SELECT *, CASE WHEN l_linenumber % 6 = 0 THEN NULL
        |                          ELSE l_discount END AS d FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  CASE WHEN d IS NOT NULL AND l_tax IS NOT NULL
        |       THEN d > l_tax END AS disc_gt_tax
        |FROM t ORDER BY 1, 2""".stripMargin,

    "q26_when_then_otherwise" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN -1.0
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders ORDER BY 1""".stripMargin,

    "q27_misc" ->
      """SELECT o_orderkey, o_totalprice AS price_copy,
        |  'fixed' AS o_orderpriority,
        |  CAST(o_custkey AS INTEGER) AS o_custkey,
        |  CAST(o_orderkey % 50000 AS INTEGER) AS okey_u16,
        |  CAST(o_orderkey AS DECIMAL(20,0)) AS okey_u64
        |FROM orders ORDER BY 1""".stripMargin,

    // np.digitize(x, bins, right=True) with pinned bins [-1000,3000,7000]
    "q28_onedkmeans" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal <= -1000.0 THEN 0
        |       WHEN c_acctbal <= 3000.0 THEN 1
        |       WHEN c_acctbal <= 7000.0 THEN 2
        |       ELSE 3 END AS bal_bin
        |FROM customer ORDER BY 1""".stripMargin,

    // np.digitize(x, bins, right=True) with pinned bins [0,2500,5000,7500]
    "q54_kmeans_digitize" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal <= 0.0 THEN 0
        |       WHEN c_acctbal <= 2500.0 THEN 1
        |       WHEN c_acctbal <= 5000.0 THEN 2
        |       WHEN c_acctbal <= 7500.0 THEN 3
        |       ELSE 4 END AS bal_bin
        |FROM customer ORDER BY 1""".stripMargin,

    "q55_weighted_mean_impute" ->
      s"""WITH t AS ($liWeightedSql),
         |m AS (SELECT SUM(wt * q) / SUM(wt) AS v FROM t
         |      WHERE q IS NOT NULL AND wt > 0)
         |SELECT l_orderkey, l_linenumber,
         |       COALESCE(q, (SELECT v FROM m)) AS q
         |FROM t ORDER BY 1, 2""".stripMargin,

    "q56_weighted_median_impute" ->
      s"""WITH t AS ($liWeightedSql),
         |g AS (SELECT q AS v, SUM(wt) AS w FROM t
         |      WHERE q IS NOT NULL AND wt > 0 GROUP BY 1),
         |c AS (SELECT v,
         |        SUM(w) OVER (ORDER BY v) * 1.0 / (SELECT SUM(w) FROM g)
         |          AS frac FROM g),
         |med AS (SELECT MIN(v) AS m FROM c WHERE frac >= 0.5)
         |SELECT l_orderkey, l_linenumber,
         |       COALESCE(q, (SELECT m FROM med)) AS q
         |FROM t ORDER BY 1, 2""".stripMargin,

    "q57_weighted_mode_impute" ->
      """WITH t AS (SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 13 = 0 THEN NULL
        |       ELSE o_orderpriority END AS prio,
        |  CASE WHEN o_orderkey % 5 = 0 THEN -3.0
        |       WHEN o_orderkey % 2 = 0 THEN 2.0
        |       ELSE 1.0 END AS wt FROM orders),
        |m AS (SELECT prio AS v FROM t
        |      WHERE prio IS NOT NULL AND wt > 0
        |      GROUP BY 1 ORDER BY SUM(wt) DESC, v DESC LIMIT 1)
        |SELECT o_orderkey, COALESCE(prio, (SELECT v FROM m)) AS prio
        |FROM t ORDER BY 1""".stripMargin,

    "q58_mean_response_multilevel" ->
      """WITH t AS (SELECT c_custkey, c_mktsegment,
        |  CASE WHEN CAST(c_nationkey % 3 AS INTEGER) = 0 THEN 'low'
        |       WHEN CAST(c_nationkey % 3 AS INTEGER) = 1 THEN 'mid'
        |       ELSE 'high' END AS resp FROM customer),
        |encl AS (SELECT c_mktsegment AS lvl,
        |  SUM(CASE WHEN resp = 'low' THEN 1.0 ELSE 0.0 END) / SUM(1.0)
        |    AS e FROM t GROUP BY 1),
        |encm AS (SELECT c_mktsegment AS lvl,
        |  SUM(CASE WHEN resp = 'mid' THEN 1.0 ELSE 0.0 END) / SUM(1.0)
        |    AS e FROM t GROUP BY 1)
        |SELECT c_custkey,
        |  (SELECT e FROM encl WHERE lvl = t.c_mktsegment)
        |    AS c_mktsegment_low,
        |  (SELECT e FROM encm WHERE lvl = t.c_mktsegment)
        |    AS c_mktsegment_mid
        |FROM t ORDER BY 1""".stripMargin,

    "q59_mean_response_unseen" ->
      """WITH base AS (SELECT c_custkey, c_nationkey,
        |  c_mktsegment || '#' ||
        |    CAST(CAST(c_nationkey % 7 AS INTEGER) AS VARCHAR) AS f,
        |  CAST(FLOOR(c_acctbal) AS DOUBLE) AS resp FROM customer),
        |fit AS (SELECT * FROM base WHERE c_nationkey % 7 < 5),
        |enc AS (SELECT f AS lvl, SUM(resp) / SUM(1.0) AS e
        |        FROM fit GROUP BY 1),
        |rowenc AS (SELECT enc.e FROM fit JOIN enc ON fit.f = enc.lvl),
        |g AS (SELECT e AS v, COUNT(*) AS w FROM rowenc GROUP BY 1),
        |c AS (SELECT v,
        |        SUM(w) OVER (ORDER BY v) * 1.0 / (SELECT SUM(w) FROM g)
        |          AS frac FROM g),
        |med AS (SELECT MIN(v) AS m FROM c WHERE frac >= 0.5)
        |SELECT c_custkey,
        |  COALESCE((SELECT e FROM enc WHERE lvl = base.f),
        |           (SELECT m FROM med)) AS f
        |FROM base ORDER BY 1""".stripMargin,

    // sklearn parity mirrored exactly: standard uses POPULATION std
    // computed as sqrt(avg(x^2) - avg(x)^2) — the same scalar formula
    // the driver-side fit derives from its fused aggregates
    "q63_scaling" ->
      """WITH s AS (SELECT avg(l_quantity) AS m,
        |                  avg(l_quantity * l_quantity) AS m2,
        |                  min(l_extendedprice) AS mn,
        |                  max(l_extendedprice) AS mx,
        |                  max(abs(l_discount)) AS ma
        |           FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  ROUND((l_quantity - m) / sqrt(m2 - m * m), 6) AS q_std,
        |  ROUND((l_extendedprice - mn) / (mx - mn), 6) AS price_mm,
        |  ROUND(l_discount / ma, 6) AS disc_ma
        |FROM lineitem CROSS JOIN s
        |ORDER BY 1, 2""".stripMargin,

    "q64_log" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(ln(l_quantity), 6) AS q_ln,
        |  ROUND(ln(l_extendedprice) / ln(10.0), 6) AS price_log10
        |FROM lineitem ORDER BY 1, 2""".stripMargin,

    "q65_cut" -> {
      val cases = cutQ65.bins.sliding(2).zipWithIndex.map {
        case (Seq(lo, hi), i) =>
          val lower =
            if (i == 0) s"l_discount >= $lo" else s"l_discount > $lo"
          s"WHEN $lower AND l_discount <= $hi THEN '${cutQ65.intervalLabels(i)}'"
      }.mkString(" ")
      s"""SELECT l_orderkey, l_linenumber,
         |  CASE $cases ELSE NULL END AS disc_bin
         |FROM lineitem ORDER BY 1, 2""".stripMargin
    },

    "q66_pca_transform" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      def comp(k: Int): String = cols.zipWithIndex.map { case (c, j) =>
        s"($c - ${pcaQ66Means(j)}) * ${pcaQ66Comps(k)(j)}"
      }.mkString(" + ")
      s"""SELECT l_orderkey, l_linenumber,
         |  ROUND(${comp(0)}, 6) AS pca_0,
         |  ROUND(${comp(1)}, 6) AS pca_1
         |FROM lineitem ORDER BY 1, 2""".stripMargin
    },

    // Python-sign mod spelled out the same way the operator computes it
    "q67_two_column_ops" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(
        |    fmod(fmod(l_extendedprice - 2000.0, l_quantity) + l_quantity,
        |         l_quantity), 6) AS a_mod_q,
        |  ROUND(pow(l_discount, l_tax), 6) AS disc_pow_tax
        |FROM lineitem ORDER BY 1, 2""".stripMargin,

    "q68_interaction" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(l_quantity * l_discount, 6) AS q_disc,
        |  ROUND(l_quantity * l_tax, 6) AS q_tax,
        |  ROUND(l_discount * l_tax, 6) AS disc_tax,
        |  ROUND(l_quantity * l_discount * l_tax, 6) AS q_disc_tax
        |FROM lineitem ORDER BY 1, 2""".stripMargin,

    // ordinal rank = row_number over ascending mean response (segment
    // means are continuous — no ties to break); nominal codes = sorted
    // level order from 0
    "q69_ordinal_nominal_codes" ->
      """WITH m AS (SELECT c_mktsegment AS lvl, avg(c_acctbal) AS mean
        |           FROM customer GROUP BY 1),
        |r AS (SELECT lvl,
        |        CAST(ROW_NUMBER() OVER (ORDER BY mean) AS INTEGER)
        |          AS ord,
        |        CAST(ROW_NUMBER() OVER (ORDER BY lvl) - 1 AS INTEGER)
        |          AS code
        |      FROM m)
        |SELECT c_custkey, r.ord AS c_mktsegment, r.code AS seg2
        |FROM customer JOIN r ON customer.c_mktsegment = r.lvl
        |ORDER BY 1""".stripMargin,

    // sequential np.where chain: multiply by return-flag rule(s), then
    // add the line-status rule on the ALREADY-adjusted value
    "q70_cross_column_adjust" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(
        |    (CASE WHEN l_returnflag = 'A' THEN l_extendedprice * 1.1
        |          WHEN l_returnflag = 'R' THEN l_extendedprice * 0.9
        |          ELSE l_extendedprice END)
        |    + (CASE WHEN l_linestatus = 'O' THEN 5.0 ELSE 0.0 END),
        |    6) AS adj_price
        |FROM lineitem ORDER BY 1, 2""".stripMargin,

    "q71_leapyear_eq_concat" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber, l_returnflag,
        |    l_linestatus,
        |    CAST(l_shipdate AS DATE) AS lo,
        |    CAST(l_shipdate AS DATE)
        |      + CAST(l_partkey % 1500 AS INTEGER) AS hi
        |  FROM lineitem),
        |e AS (SELECT *,
        |    year(lo) * 10000 + month(lo) * 100 + day(lo) AS e0,
        |    year(hi) * 10000 + month(hi) * 100 + day(hi) AS e1
        |  FROM t)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(CASE WHEN e1 < e0 THEN -FLOOR((e0 - e1) / 10000.0)
        |            ELSE FLOOR((e1 - e0) / 10000.0) END AS INTEGER)
        |    AS age,
        |  l_returnflag = l_linestatus AS same,
        |  l_returnflag || '|' || l_linestatus AS rf_ls
        |FROM e ORDER BY 1, 2""".stripMargin,

    // nearest-mean-response: value whose mean response is closest to
    // the null rows' mean response (ties -> smallest value)
    "q72_nearest_mean_response" ->
      s"""WITH t AS ($liWithNullsSql),
         |nm AS (SELECT avg(l_extendedprice) AS nm FROM t
         |       WHERE q IS NULL),
         |best AS (SELECT v FROM (
         |    SELECT q AS v, avg(l_extendedprice) AS m FROM t
         |    WHERE q IS NOT NULL GROUP BY 1)
         |  CROSS JOIN nm
         |  ORDER BY abs(m - nm), v LIMIT 1)
         |SELECT l_orderkey, l_linenumber,
         |  COALESCE(q, (SELECT v FROM best)) AS q
         |FROM t ORDER BY 1, 2""".stripMargin
  )
}
