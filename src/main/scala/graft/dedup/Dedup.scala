package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication for web-scale corpora: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: everything is one-shuffle shapes —
  *   - exact: hash-partition on the content key, keep rank-1;
  *   - MinHash: signatures are per-row projections (no shuffle), the
  *     LSH band join shuffles only (band, bandHash) pairs — tiny vs the
  *     corpus — and candidate verification joins back by id;
  *   - SimHash: per-row 64-bit signature, near-dup candidates via
  *     banded equality on signature quarters (Hamming<=3 within bands).
  */
object Dedup {

  /** Exact dedup by content columns, keeping the smallest `idCol` per
    * duplicate group (one hash exchange).
    */
  def exact(df: DataFrame, contentCols: Seq[String], idCol: String)
      : DataFrame = {
    val w = Window.partitionBy(contentCols.map(col): _*)
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Word shingles (n-grams of whitespace tokens) as an array column.
    * Texts shorter than n tokens get an empty shingle set (sequence()
    * would otherwise run DOWNWARD for start > stop).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: for each of `numHashes` seeds, the min
    * xxhash64(shingle, seed). Pure projection — computed where the data
    * lives, nothing shuffles.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map(seed =>
      array_min(transform(shingleArr, s => xxhash64(s, lit(seed))))): _*)

  /** LSH candidate pairs: split the signature into `bands`, bucket on
    * (band index, hash of the band slice), self-join buckets. Returns
    * (id_a, id_b) with id_a < id_b, distinct.
    */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8)
      : DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = minhashSignature(shingles(col(textCol), shingleSize),
      numHashes)
    val withSig = df.select(col(idCol).as("__id"), sig.as("__sig"))
      .filter(size(col("__sig")) > 0 && !array_contains(
        transform(col("__sig"), x => x.isNull), true))
    val banded = withSig.select(col("__id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("__sig"), b * rows + 1, rows).cast("string"))
            .as("bh"))): _*)).as("bucket"))
      .select(col("__id"), col("bucket.band"), col("bucket.bh"))
    val a = banded.withColumnRenamed("__id", "id_a")
    val b = banded.withColumnRenamed("__id", "id_b")
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Verified near-dups: LSH candidates with true shingle-set Jaccard
    * >= threshold.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleSize: Int = 3, numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    val cands = lshCandidates(df, idCol, textCol, shingleSize,
      numHashes, bands)
    val sh = df.select(col(idCol).as("__jid"),
      shingles(col(textCol), shingleSize).as("__sh"))
    cands
      .join(sh.withColumnRenamed("__jid", "id_a")
        .withColumnRenamed("__sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("__jid", "id_b")
        .withColumnRenamed("__sh", "sh_b"), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Pairwise token-set Jaccard within candidate blocks (same
    * `blockCol` value) — the simple, oracle-checkable n-gram Jaccard
    * dedup. Blocks bound the quadratic term; at scale the block column
    * is an LSH bucket or length band.
    */
  def blockedJaccard(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 3): DataFrame = {
    val sh = df.select(col(blockCol).as("__blk"), col(idCol).as("__id"),
      shingles(col(textCol), n).as("__sh"))
    val a = sh.select(col("__blk"), col("__id").as("id_a"),
      col("__sh").as("sh_a"))
    val b = sh.select(col("__blk"), col("__id").as("id_b"),
      col("__sh").as("sh_b"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
          .as("jaccard"))
  }

  /** 64-bit SimHash of whitespace tokens: bit k of the signature is the
    * sign of sum(+/-1 over tokens by their xxhash64 bit k). Projection
    * only (the 64 bit-sums ride one `aggregate` over the token array).
    */
  def simhash64(text: Column): Column = {
    val toks = split(text, " ")
    val bits = (0 until 64).map { k =>
      val votes = aggregate(toks, lit(0),
        (acc, t) => acc +
          when(shiftright(xxhash64(t), k).bitwiseAND(1) === 1, 1)
            .otherwise(-1))
      when(votes > 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Embedding near-dup pairs via quantized cosine within blocks.
    * Embeddings are quantized to int (round(x*1000)) so dot products
    * are exact integer sums — deterministic across engines and the
    * standard int8-style quantization trick at scale.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val q = df.select(col(blockCol).as("__blk"), col(idCol).as("__id"),
      quantize(col(vecCol)).as("__q"))
    val a = q.select(col("__blk"), col("__id").as("id_a"),
      col("__q").as("q_a"))
    val b = q.select(col("__blk"), col("__id").as("id_b"),
      col("__q").as("q_b"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineQ(col("q_a"), col("q_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** round(x*1000) int64 quantization of a float vector. */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 1000).cast("long"))

  /** Cosine over quantized vectors: integer dot / (sqrt * sqrt) —
    * exact integer sums, deterministic IEEE tail.
    */
  def cosineQ(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0L), (acc, v) => acc + v).cast("double")
    val na = aggregate(transform(a, x => x * x), lit(0L),
      (acc, v) => acc + v).cast("double")
    val nb = aggregate(transform(b, x => x * x), lit(0L),
      (acc, v) => acc + v).cast("double")
    dot / (sqrt(na) * sqrt(nb))
  }
}
