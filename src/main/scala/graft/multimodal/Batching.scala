package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataloader-facing batch-construction indexes beyond aspect
  * bucketing ([[AspectBatch]]): contrastive batch assignment that
  * keeps near-duplicates out of the same batch, caption padding
  * buckets, and EXIF orientation normalization plans. All three are
  * index layouts over narrow columns — payload bytes never ride any
  * of these shuffles (join bytes back by id at materialization, the
  * same discipline as every layout op in this engine).
  */
object Batching {

  /** Contrastive-training batch assignment with a NO-COLLISION
    * guarantee: no two rows of the same `clusterCol` group (e.g. a
    * near-duplicate cluster from
    * [[graft.dedup.Components.connectedComponents]] or a phash band)
    * land in the same batch. In-batch negatives are the training
    * signal for CLIP-style contrastive losses; a near-duplicate pair
    * inside one batch is a FALSE negative that actively corrupts the
    * loss, so the batch layout — not the loss code — must keep
    * duplicates apart.
    *
    * Construction (a Latin-square shift, fully deterministic):
    *
    *   - `slot`  = the row's 0-based rank within its cluster in
    *     `idCol` order (window PARTITIONED by cluster — no global
    *     sort),
    *   - `num_batches = max(ceil(N / batchSize), max cluster size)`
    *     (one tiny aggregate over per-cluster counts),
    *   - `batch = (slot + cluster mod num_batches) mod num_batches`.
    *
    * Same cluster => same shift, distinct slots < cluster size <=
    * `num_batches` => distinct batches. Expected batch fill is
    * `N / num_batches <= batchSize`; a corpus whose largest cluster
    * exceeds `N / batchSize` trades emptier batches for the
    * guarantee, which is the right trade (the alternative is a false
    * negative). One exchange on the cluster key; the scalar pair
    * `(N, max cluster)` is a 1-row aggregate.
    *
    * `clusterCol` must be integral and non-negative (hash string
    * cluster labels to int64 first); `idCol` orders rows within a
    * cluster deterministically.
    */
  def contrastiveBatches(df: DataFrame, idCol: String,
      clusterCol: String, batchSize: Int): DataFrame = {
    require(batchSize > 0,
      s"contrastiveBatches: batchSize must be positive, got $batchSize")
    Seq("slot", "batch").foreach(c =>
      require(!df.columns.contains(c),
        s"contrastiveBatches: input already has a '$c' column"))
    graft.core.Ids.requireIntegral(df, clusterCol, "contrastiveBatches")
    val sizes = df.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("__csz"))
    val row = sizes.agg(sum(col("__csz")).as("n"),
      max(col("__csz")).as("maxc")).collect()(0)
    if (row.isNullAt(0)) return df // empty input: nothing to assign
    val n = row.getLong(0)
    val maxc = row.getLong(1)
    val numBatches =
      math.max((n + batchSize - 1) / batchSize, maxc)
    val w = Window.partitionBy(col(clusterCol)).orderBy(col(idCol))
    df.withColumn("slot", row_number().over(w).cast("long") - lit(1L))
      .withColumn("batch",
        pmod(col("slot") + pmod(col(clusterCol).cast("long"),
          lit(numBatches)), lit(numBatches)))
  }

  /** Caption padding-bucket batch layout: rows are grouped by their
    * caption's PADDED length (`tokens` rounded up to a multiple of
    * `multiple` — the pad-to-multiple-of-8 tensor-core convention),
    * ranked within each bucket in `idCol` order, and cut into
    * `batchSize`-row batches. Every batch therefore pads to ONE
    * shared length, and `pad_tokens = bucket_len - tokens` is the
    * exact per-row waste the layout buys down (vs padding everything
    * to the corpus max). Token count is the engine-portable
    * whitespace count ([[graft.text.TextOps.tokenCount]], the q49
    * definition).
    *
    * Adds `tokens`, `bucket_len`, `rank_in_bucket`, `batch_idx`,
    * `pad_tokens`. One exchange on the bucket key (a window
    * PARTITIONED by `bucket_len` — bounded groups need no two-phase
    * rank; a bucket is at most the corpus, and the rank inside it is
    * the same per-bucket window every bucketing layout here uses).
    */
  def captionPadBatches(df: DataFrame, idCol: String,
      captionCol: String, multiple: Int, batchSize: Int): DataFrame = {
    require(multiple > 0,
      s"captionPadBatches: multiple must be positive, got $multiple")
    require(batchSize > 0,
      s"captionPadBatches: batchSize must be positive, got $batchSize")
    Seq("tokens", "bucket_len", "rank_in_bucket", "batch_idx",
      "pad_tokens").foreach(c =>
      require(!df.columns.contains(c),
        s"captionPadBatches: input already has a '$c' column"))
    val toks = graft.text.TextOps.tokenCount(col(captionCol))
      .cast("long")
    val w = Window.partitionBy(col("bucket_len")).orderBy(col(idCol))
    df.withColumn("tokens", toks)
      .withColumn("bucket_len",
        expr(s"((tokens + ${multiple - 1}) div $multiple) * $multiple"))
      .withColumn("rank_in_bucket",
        row_number().over(w).cast("long") - lit(1L))
      .withColumn("batch_idx", expr(s"rank_in_bucket div $batchSize"))
      .withColumn("pad_tokens", col("bucket_len") - col("tokens"))
  }

  /** EXIF orientation normalization plan: for each row's orientation
    * tag (1..8, the TIFF/EXIF `Orientation` values) emit the
    * operations that map STORED pixels to upright DISPLAY pixels,
    * decomposed as "horizontal flip first, then clockwise rotation"
    * (the standard decomposition; e.g. tag 5 = transpose = flip-H
    * then 90 CW):
    *
    *   tag: 1        2      3       4        5       6      7        8
    *   flip_h: false true   false   true     true    false  true     false
    *   rot_cw: 0     0      180     180      90      90     270      270
    *
    * `out_w`/`out_h` swap for tags 5..8 (the 90/270 rotations).
    * Orientation outside 1..8 (or null) yields a null plan row
    * content — the quarantine discipline: the caller routes those to
    * the corrupt-metadata side output rather than guessing. Pure
    * projection (codegen'd CASE); compose with
    * [[Multimodal.resizeEncode]]-style materialization for the pixel
    * work.
    */
  def exifNormalizePlan(df: DataFrame, orientCol: String,
      wCol: String, hCol: String): DataFrame = {
    Seq("flip_h", "rot_cw", "out_w", "out_h").foreach(c =>
      require(!df.columns.contains(c),
        s"exifNormalizePlan: input already has a '$c' column"))
    val o = col(orientCol).cast("int")
    val valid = o.isNotNull && o >= 1 && o <= 8
    val swapped = o >= 5 // 90/270-degree family transposes dims
    df.withColumn("flip_h",
        when(valid, o.isin(2, 4, 5, 7)).otherwise(lit(null)))
      .withColumn("rot_cw",
        when(valid,
          when(o.isin(1, 2), 0)
            .when(o.isin(3, 4), 180)
            .when(o.isin(5, 6), 90)
            .otherwise(270)).otherwise(lit(null)))
      .withColumn("out_w",
        when(valid, when(swapped, col(hCol)).otherwise(col(wCol)))
          .otherwise(lit(null)))
      .withColumn("out_h",
        when(valid, when(swapped, col(wCol)).otherwise(col(hCol)))
          .otherwise(lit(null)))
  }
}
