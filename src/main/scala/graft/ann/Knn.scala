package graft.ann

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - `bruteForceTopK`: exact cosine top-k; the (small) query set is
  *   broadcast against the corpus, so the corpus never shuffles — one
  *   scan + a per-query top-k window. The correctness baseline.
  * - `lshTopK`: random-hyperplane LSH — per-row signatures
  *   (projection), candidates restricted to same-bucket rows, then
  *   exact re-rank inside buckets. The scale path: the bucket join
  *   shuffles signature keys, not vectors x queries.
  *
  * Cosine uses int-quantized dot products (Dedup.quantize/cosineQ):
  * exact integer arithmetic, engine-reproducible, and the standard
  * int8-quantization trick for 100 TB-scale vector scans.
  */
object Knn {

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String, k: Int)
      : DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"),
      Dedup.quantize(col(vecCol)).as("__cq"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      Dedup.quantize(col(vecCol)).as("__qq"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("item_id"),
        Dedup.cosineQ(col("__cq"), col("__qq")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane signature: bit b = sign(v . h_b) where
    * h_b[i] = (xxhash64(b, i) mod 2001 - 1000) — deterministic
    * pseudo-hyperplanes, no stored model.
    */
  def hyperplaneSig(vec: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { b =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") *
            (pmod(xxhash64(lit(b), i), lit(2001)) - lit(1000))
              .cast("double")),
        lit(0.0d), (acc, v) => acc + v)
      when(dot > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** LSH top-k: candidates share any of `tables` signature buckets
    * (each table uses a disjoint bit range), exact cosine re-rank per
    * query, top-k. Recall < 1 by construction; verified against
    * bruteForceTopK in tests.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int,
      bitsPerTable: Int = 8, tables: Int = 4): DataFrame = {
    def buckets(d: DataFrame, id: String): DataFrame = {
      val sig = hyperplaneSig(col(vecCol), bitsPerTable * tables)
      d.select(col(id), col(vecCol), sig.as("__sig"))
        .select(col(id), col(vecCol), explode(array((0 until tables).map {
          t =>
            struct(lit(t).as("tbl"),
              shiftright(col("__sig"), t * bitsPerTable)
                .bitwiseAND((1L << bitsPerTable) - 1).as("bkt"))
        }: _*)).as("b"))
        .select(col(id), col(vecCol), col("b.tbl"), col("b.bkt"))
    }
    val c = buckets(corpus, idCol)
      .select(col(idCol).as("item_id"), col("tbl"), col("bkt"),
        Dedup.quantize(col(vecCol)).as("__cq"))
    val q = buckets(queries, queryIdCol)
      .select(col(queryIdCol).as("query_id"), col("tbl"), col("bkt"),
        Dedup.quantize(col(vecCol)).as("__qq"))
    val cands = c.join(broadcast(q), Seq("tbl", "bkt"))
      .select(col("query_id"), col("item_id"), col("__cq"), col("__qq"))
      .dropDuplicates("query_id", "item_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id"))
    cands
      .select(col("query_id"), col("item_id"),
        Dedup.cosineQ(col("__cq"), col("__qq")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
