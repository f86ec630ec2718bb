package graft

import graft.ann.Knn
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.text.TextOps
import graft.io.ImageTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline ops over documents/embeddings (+ the
  * generated image table for multimodal plumbing).
  */
object QueriesData {

  import QueriesCore.tbl

  /** documents with a deterministic block of near-duplicates appended:
    * every 10th doc re-appears (id + 1e6) with its first token dropped.
    */
  private def docsWithDups(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
    val dups = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        // drop the first token -> high-Jaccard near-duplicate
        expr("substring(text, instr(text, ' ') + 1)").as("text"),
        col("lang"), col("source"), col("n_chars"))
    d.unionByName(dups)
  }
  private val docsWithDupsSql =
    """SELECT * FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000, text[strpos(text, ' ') + 1:],
      |       lang, source, n_chars
      |FROM documents WHERE doc_id % 10 = 0""".stripMargin

  /** exact-dup corpus: every 7th doc duplicated verbatim. */
  private def docsWithExact(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
    d.unionByName(d.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  /** Deterministic image table with REAL magic bytes prepended for
    * png/jpeg rows (so sniffing is meaningful), materialised to a fixed
    * parquet path and read back — BOTH engines then see identical
    * bytes, flipping the multimodal queries from rows-only to
    * value-exact oracles.
    */
  private def oracleImages(s: SparkSession, n: Long,
      path: String): DataFrame = {
    val pngMagic = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47,
      0x0D, 0x0A, 0x1A, 0x0A)
    val jpegMagic = Array[Byte](0xFF.toByte, 0xD8.toByte)
    ImageTable.images(s, n)
      .withColumn("bytes",
        when(col("fmt") === "png", concat(lit(pngMagic), col("bytes")))
          .when(col("fmt") === "jpeg", concat(lit(jpegMagic), col("bytes")))
          .otherwise(col("bytes")))
      .write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_dedup_exact" -> ((s, dir) => {
      Dedup.exact(docsWithExact(s, dir), Seq("text"), "doc_id")
        .select("doc_id", "text").orderBy("doc_id")
    }),

    "q41_dedup_minhash_lsh" -> ((s, dir) => {
      // rows-only: hash functions aren't reproducible in the oracle
      Dedup.minhashNearDups(docsWithDups(s, dir), "doc_id", "text",
        threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6)
          .as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    "q42_dedup_ngram_jaccard" -> ((s, dir) => {
      // blocked pairwise 3-gram Jaccard, oracle-checkable
      val d = docsWithDups(s, dir).withColumn("blk", col("doc_id") % 50)
      Dedup.blockedJaccard(d, "doc_id", "text", "blk")
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6)
          .as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    "q43_dedup_simhash" -> ((s, dir) => {
      // rows-only (xxhash64 not available to the oracle)
      Dedup.simhashes(docsWithDups(s, dir), "doc_id", "text")
        .groupBy("simhash").agg(count(lit(1)).as("n"),
          min("__id").as("keep_id"))
        .filter(col("n") > 1)
        .orderBy("keep_id")
    }),

    "q44_dedup_embedding" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
        .withColumn("blk", col("label"))
      Dedup.embeddingNearDups(e, "vec_id", "embedding", "blk",
        threshold = 0.25)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6)
          .as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    "q45_knn_bruteforce" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Knn.bruteForceTopK(e, e.filter(col("vec_id") < 5), "vec_id",
        "embedding", "vec_id", k = 10)
        .select(col("query_id"), col("rank"), col("item_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    "q46_knn_lsh" -> ((s, dir) => {
      // rows-only: recall measured against brute force in the tests
      val e = tbl(s, dir, "embeddings")
      Knn.lshTopK(e, e.filter(col("vec_id") < 5), "vec_id",
        "embedding", "vec_id", k = 10)
        .select(col("query_id"), col("rank"), col("item_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    "q60_knn_ivf" -> ((s, dir) => {
      // rows-only: Lloyd-refined centroids aren't SQL-reproducible;
      // recall is measured against brute force in DedupKnnSpec
      val e = tbl(s, dir, "embeddings")
      Knn.ivfTopK(e, e.filter(col("vec_id") < 5), "vec_id",
        "embedding", "vec_id", k = 10)
        .select(col("query_id"), col("rank"), col("item_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    "q47_lang_id" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),

    "q48_quality_score" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val exprs = TextOps.qualityExprs(col("text"))
      d.select(col("doc_id") +: exprs.map { case (n, e) => e.as(n) }: _*)
        .orderBy("doc_id")
    }),

    "q49_token_count" -> ((s, dir) => {
      tbl(s, dir, "documents").select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("ws_tokens"),
        TextOps.bpeishCount(col("text")).as("bpeish_tokens"))
        .orderBy("doc_id")
    }),

    "q50_fingerprint" -> ((s, dir) => {
      tbl(s, dir, "documents").select(col("doc_id"),
        TextOps.fingerprintMd5(col("text")).as("fp_md5"))
        .orderBy("doc_id")
    }),

    "q51_multimodal_meta" -> ((s, dir) => {
      // payload metadata without decode — pure projection over binary.
      // The generated table is WRITTEN to a fixed parquet path first so
      // the DuckDB oracle reads the exact same input (it can't see
      // in-session generators).
      val imgs = oracleImages(s, 500, "/tmp/graft_oracle_images_q51")
      Multimodal.payloadMeta(imgs)
        .select(col("image_id"), col("payload_bytes").cast("long")
            .as("payload_bytes"),
          col("sniffed_fmt"), col("bytes_per_pixel"))
        .orderBy("image_id")
    }),

    "q52_multimodal_decode" -> ((s, dir) => {
      // mapPartitions decode plumbing with the stub decoder (whose spec
      // is deliberately SQL-reproducible — see Multimodal.StubDecoder);
      // same parquet round-trip as q51 so the oracle sees the input
      val imgs = oracleImages(s, 200, "/tmp/graft_oracle_images_q52")
      Multimodal.withDecodeFeatures(imgs, Multimodal.StubDecoder)
        .select(col("image_id"), col("decoded_w"), col("decoded_h"),
          col("mean_luma"), col("decode_ok"))
        .orderBy("image_id")
    }),

    "q53_snapshot_lineage" -> ((s, dir) => {
      // checkpointed snapshot write + snapshot-scoped read-back:
      // per-bucket row counts come from the STORED data, so the oracle
      // also certifies the store round-trip
      val root = java.nio.file.Files
        .createTempDirectory("graft_snap_q53").toString
      val d = tbl(s, dir, "documents")
      val bucket = pmod(col("doc_id"), lit(16)).cast("int")
      graft.io.SnapshotStore.write(d, root, bucket, maxBucketsPerRun = 9)
      graft.io.SnapshotStore.write(d, root, bucket) // resume run
      require(graft.io.SnapshotStore.verify(s, root).isEmpty,
        "lineage verify failed")
      graft.io.SnapshotStore.read(s, root)
        .groupBy(pmod(col("doc_id"), lit(16)).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("bucket")
    })
  )

  private def langHitsSql(l: String): String = {
    val words = TextOps.Stopwords(l).map(w => s"'$w'").mkString(",")
    s"len(list_filter(string_split(text,' '), x -> x IN ($words)))"
  }

  val oracles: Map[String, String] = Map(
    "q40_dedup_exact" ->
      """WITH t AS (SELECT * FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 7 = 0)
        |SELECT doc_id, text FROM t
        |QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
        |ORDER BY doc_id""".stripMargin,

    "q42_dedup_ngram_jaccard" ->
      s"""WITH t AS ($docsWithDupsSql),
         |sh AS (SELECT doc_id % 50 AS blk, doc_id,
         |  list_distinct(CASE WHEN len(string_split(text,' ')) >= 3
         |    THEN list_transform(
         |      range(0, len(string_split(text,' ')) - 2),
         |      i -> array_to_string(
         |        string_split(text,' ')[i+1:i+3], ' '))
         |    ELSE [] END) AS s
         |  FROM t)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |        CAST(len(list_distinct(list_concat(a.s, b.s)))
         |             AS DOUBLE), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |      CAST(len(list_distinct(list_concat(a.s, b.s)))
         |           AS DOUBLE) >= 0.5
         |ORDER BY 1, 2""".stripMargin,

    "q44_dedup_embedding" ->
      """WITH q AS (SELECT label AS blk, vec_id,
        |  list_transform(embedding,
        |    x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(list_sum(list_transform(list_zip(a.v, b.v),
        |    x -> x[1]*x[2])) AS DOUBLE) /
        |  (SQRT(CAST(list_sum(list_transform(a.v, x -> x*x))
        |        AS DOUBLE)) *
        |   SQRT(CAST(list_sum(list_transform(b.v, x -> x*x))
        |        AS DOUBLE))) AS cosine
        |  FROM q a JOIN q b ON a.blk = b.blk AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b, ROUND(cosine, 6) AS cosine
        |FROM p WHERE cosine >= 0.25 ORDER BY 1, 2""".stripMargin,

    "q45_knn_bruteforce" ->
      """WITH q AS (SELECT vec_id,
        |  list_transform(embedding,
        |    x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        |  FROM embeddings),
        |s AS (SELECT qq.vec_id AS query_id, c.vec_id AS item_id,
        |  CAST(list_sum(list_transform(list_zip(c.v, qq.v),
        |    x -> x[1]*x[2])) AS DOUBLE) /
        |  (SQRT(CAST(list_sum(list_transform(c.v, x -> x*x))
        |        AS DOUBLE)) *
        |   SQRT(CAST(list_sum(list_transform(qq.v, x -> x*x))
        |        AS DOUBLE))) AS cosine
        |  FROM q c, (SELECT * FROM q WHERE vec_id < 5) qq),
        |r AS (SELECT query_id, item_id, cosine,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, item_id) AS INTEGER) AS rank FROM s)
        |SELECT query_id, rank, item_id, ROUND(cosine, 6) AS cosine
        |FROM r WHERE rank <= 10 ORDER BY 1, 2""".stripMargin,

    "q47_lang_id" -> {
      val maxExpr = TextOps.Langs.map(langHitsSql).mkString("GREATEST(", ", ", ")")
      val chain = TextOps.Langs.reverse.foldLeft("'unknown'") { (acc, l) =>
        s"CASE WHEN ${langHitsSql(l)} = m AND m > 0 THEN '$l' ELSE $acc END"
      }
      s"""WITH t AS (SELECT doc_id, text, $maxExpr AS m FROM documents)
         |SELECT doc_id, $chain AS lang_pred
         |FROM t ORDER BY 1""".stripMargin
    },

    "q48_quality_score" -> {
      val stopsAll = TextOps.Langs.map(langHitsSql)
        .mkString(" + ")
      s"""WITH t AS (SELECT doc_id,
         |  CAST(len(text) AS DOUBLE) AS n_chars_q,
         |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))
         |       AS DOUBLE) AS punct,
         |  CAST($stopsAll AS DOUBLE) AS stops
         |  FROM documents)
         |SELECT doc_id, n_chars_q, n_tokens,
         |  punct / n_chars_q AS punct_ratio,
         |  stops / n_tokens AS stopword_ratio,
         |  (n_chars_q - (n_tokens - 1.0)) / n_tokens AS mean_token_len,
         |  0.4 * LEAST(n_chars_q / 500.0, 1.0) +
         |  0.3 * LEAST((stops / n_tokens) * 5.0, 1.0) +
         |  0.2 * LEAST(((n_chars_q - (n_tokens - 1.0)) / n_tokens)
         |              / 8.0, 1.0) +
         |  0.1 * (1.0 - LEAST((punct / n_chars_q) * 10.0, 1.0))
         |    AS quality
         |FROM t ORDER BY 1""".stripMargin
    },

    "q49_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]')) AS INTEGER)
        |      AS bpeish_tokens
        |FROM documents ORDER BY 1""".stripMargin,

    "q50_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(text), ' +', ' ', 'g')) AS fp_md5
        |FROM documents ORDER BY 1""".stripMargin,

    "q53_snapshot_lineage" ->
      """SELECT CAST(doc_id % 16 AS INTEGER) AS bucket,
        |       COUNT(*) AS n_rows
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // the parquet under /tmp is written by the q51 query itself before
    // this SQL runs (Verify dumps first, the oracle compares after)
    "q51_multimodal_meta" ->
      """SELECT image_id,
        |  octet_length(bytes) AS payload_bytes,
        |  CASE WHEN substring(hex(bytes), 1, 16) = '89504E470D0A1A0A'
        |         THEN 'png'
        |       WHEN substring(hex(bytes), 1, 4) = 'FFD8' THEN 'jpeg'
        |       ELSE 'unknown' END AS sniffed_fmt,
        |  CAST(octet_length(bytes) AS DOUBLE) / (w * h)
        |    AS bytes_per_pixel
        |FROM read_parquet('/tmp/graft_oracle_images_q51/*.parquet')
        |ORDER BY 1""".stripMargin,

    // StubDecoder spec: md5 over the UPPERCASE hex of the first 256
    // payload bytes, first 4 digest bytes as big-endian int, % 256000
    // / 1000.0 (see Multimodal.StubDecoder scaladoc)
    "q52_multimodal_decode" ->
      """SELECT image_id,
        |  w AS decoded_w, h AS decoded_h,
        |  CAST('0x' || substring(
        |      md5(substring(hex(bytes), 1, 512)), 1, 8) AS BIGINT)
        |    % 256000 / 1000.0 AS mean_luma,
        |  octet_length(bytes) > 0 AS decode_ok
        |FROM read_parquet('/tmp/graft_oracle_images_q52/*.parquet')
        |ORDER BY 1""".stripMargin
  )
}
