package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Hashing

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * pick raw-corpus documents whose hashed-n-gram distribution looks
  * like a TARGET corpus — the standard "give me more data shaped like
  * this high-quality set" selection step of LM data pipelines.
  *
  *   1. hash every token into `width` buckets (the hashed-unigram LM
  *      both papers' implementations reduce to at scale);
  *   2. per-bucket importance log-ratio
  *      `ln p_target(b) - ln p_source(b)` with add-1 smoothing — a
  *      BOUNDED `width`-row table, computed in-plan (two
  *      map-side-combined counts + one-row totals, no driver fit);
  *   3. per-document importance = sum of its tokens' log-ratios (one
  *      explode + broadcast join against the tiny ratio table + one
  *      map-side-combined groupBy);
  *   4. Gumbel-top-k resampling: key = logweight + Gumbel(u) with
  *      `u = (md5(id # salt) + 1) / 2^60` — sampling without
  *      replacement with probability proportional to the importance
  *      WEIGHT (exp of the log-weight), the Gumbel-max equivalent of
  *      A-ES — through the bounded-heap top-k aggregate.
  *
  * Engine-portability: log-ratios and the Gumbel term are snapped to
  * integer MICRO-UNITS (`round(x * 1e6)` as int64) before any
  * summation, so per-document scores are exact integer sums — immune
  * to both float summation order (Spark and an external engine will
  * not add a document's tokens in the same order) and to all but a
  * measure-zero set of 1-ulp `ln` disagreements at rounding
  * boundaries. The quantization error (<= 1e-6 per token) is far
  * below any meaningful importance difference.
  */
object Dsir {

  private def bucket(tok: Column, width: Int): Column =
    pmod(Hashing.md5Hash60(tok), lit(width.toLong)).cast("int")

  /** `(b, logr_micro)` — the complete `width`-row importance table:
    * add-1-smoothed hashed-unigram log-ratio in integer micro-units.
    * Buckets absent from one side get only their smoothing mass, so
    * the table is total (every possible bucket has a row).
    */
  def importanceTable(target: DataFrame, source: DataFrame,
      textCol: String, width: Int): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    def bucketCounts(df: DataFrame) = df
      .select(explode(split(col(textCol), " ")).as("__t"))
      .groupBy(bucket(col("__t"), width).as("b"))
      .agg(count(lit(1)).as("__n"))
    val spark = target.sparkSession
    val all = spark.range(width).select(col("id").cast("int").as("b"))
    val t = bucketCounts(target).withColumnRenamed("__n", "__tn")
    val s0 = bucketCounts(source).withColumnRenamed("__n", "__sn")
    // totals come from the bucket-count tables themselves (every token
    // lands in exactly one bucket, so sum(counts) == token total) —
    // re-exploding the full corpora for a count would double the
    // table-build cost for nothing
    val withTotals = all
      .join(broadcast(t), Seq("b"), "left")
      .join(broadcast(s0), Seq("b"), "left")
      .na.fill(0L, Seq("__tn", "__sn"))
      .crossJoin(broadcast(
        t.agg(coalesce(sum(col("__tn")), lit(0L)).as("__T"))))
      .crossJoin(broadcast(
        s0.agg(coalesce(sum(col("__sn")), lit(0L)).as("__S"))))
    val logr =
      log((col("__tn") + 1).cast("double") /
        (col("__T") + width).cast("double")) -
      log((col("__sn") + 1).cast("double") /
        (col("__S") + width).cast("double"))
    withTotals
      .select(col("b"),
        round(logr * 1e6, 0).cast("long").as("logr_micro"))
  }

  /** Top-`k` source documents by Gumbel-perturbed importance:
    * `(rank, doc_id, score_micro)` with `score_micro` the exact
    * integer importance sum (Gumbel term excluded — it is sampling
    * noise, not a quality signal).
    */
  def dsirSample(source: DataFrame, target: DataFrame, idCol: String,
      textCol: String, width: Int, k: Int,
      salt: String = "dsir"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    graft.core.Ids.requireIntegral(source, idCol, "dsirSample")
    val ratios = importanceTable(target, source, textCol, width)
    val docScores = source
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("__t"))
      .select(col("doc_id"), bucket(col("__t"), width).as("b"))
      .join(broadcast(ratios), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("logr_micro")).as("score_micro"))
    val u = (Hashing.md5Hash60(concat(col("doc_id").cast("string"),
      lit("#"), lit(salt))) + 1L).cast("double") /
      lit(1152921504606846976.0)
    val gumbelMicro = round(-log(-log(u)) * 1e6, 0).cast("long")
    docScores
      .withColumn("__key",
        (col("score_micro") + gumbelMicro).cast("double"))
      .groupBy()
      .agg(graft.functions.TopKBy.topKBy(col("__key"),
        col("doc_id").cast("long"), k).as("__s"))
      .select(posexplode(col("__s")).as(Seq("__p", "__e")))
      .select((col("__p") + 1).cast("int").as("rank"),
        col("__e.id").as("doc_id"))
      .join(docScores.withColumnRenamed("doc_id", "__d"),
        col("doc_id") === col("__d"))
      .select(col("rank"), col("doc_id"), col("score_micro"))
  }
}
