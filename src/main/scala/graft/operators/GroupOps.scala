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
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(TopKBy.topKBy(col(scoreCol).cast("double"),
        col(idCol).cast("long"), k).as("__topk"))
    agg.select(groupCols.map(col) :+
        posexplode(col("__topk")).as(Seq("__pos", "__e")): _*)
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
    val stats = df.groupBy(col(keyCol)).agg(
      columns.flatMap(c => Seq(
        avg(col(c)).as(s"__mu_$c"),
        stddev_pop(col(c)).as(s"__sd_$c"))).head,
      columns.flatMap(c => Seq(
        avg(col(c)).as(s"__mu_$c"),
        stddev_pop(col(c)).as(s"__sd_$c"))).tail: _*)
    val joined = df.join(stats, Seq(keyCol))
    val out = columns.foldLeft(joined) { (d, c) =>
      val sd = col(s"__sd_$c")
      val safeSd = when(sd.isNull || sd === 0.0, lit(1.0)).otherwise(sd)
      d.withColumn(s"$c$suffix",
        (col(c) - col(s"__mu_$c")) / safeSd)
    }
    out.drop(columns.flatMap(c => Seq(s"__mu_$c", s"__sd_$c")): _*)
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
    df.join(caps, df(keyCol) === col("__ck"), "left")
      .withColumn(valueCol,
        when(v.isNull, lit(null).cast("double"))
          .when(isnan(v), v) // NaN orders largest in Spark; guard it
          .otherwise(
            least(greatest(v, coalesce(col("__lo"), v)),
              coalesce(col("__hi"), v))))
      .drop("__ck", "__lo", "__hi")
  }
}
