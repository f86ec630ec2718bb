package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Driver-side correctness queries for the STREAMING surfaces: each
  * runs a real Structured Streaming query (MemoryStream source, multiple
  * micro-batches, foreachBatch/memory sink) to completion over the same
  * parquet the batch operators read, and returns a frame a DuckDB
  * oracle reproduces from the batch semantics. This is the hard signal
  * that the incremental paths — dedupStream's watermark state,
  * decontaminateStream's cached eval fingerprints, dedupIngestSink's
  * index absorption across micro-batches — converge to the batch
  * answer, not just that their specs pass.
  *
  * Driver-side collects here are test-harness plumbing (feeding a
  * MemoryStream requires local rows) at sf0.01 scale; production
  * streams read Kafka/files and never collect.
  */
object QueriesStreaming {

  import QueriesCore.tbl

  /** Feed `rows` through `input` in `nChunks` micro-batches, letting
    * the query drain between chunks (so cross-batch state is really
    * exercised), then stop.
    */
  private def drive[A](input: MemoryStream[A],
      q: org.apache.spark.sql.streaming.StreamingQuery,
      rows: Seq[A], nChunks: Int): Unit =
    try {
      val sz = math.max(1, (rows.length + nChunks - 1) / nChunks)
      rows.grouped(sz).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q103_stream_dedup_exact" -> ((s, dir) => {
      // exact-dup corpus (every 7th doc duplicated, the q40 corpus)
      // streamed through dedupStream in 3 micro-batches: the content
      // hash of a batch-2 duplicate must hit batch-1's state. Output
      // = one row per distinct text with its surviving multiplicity —
      // n must be 1 everywhere, which the oracle asserts value-exactly
      // (an over-emission shows up as n=2, an over-drop as a missing
      // row). Which doc_id survives is arrival-order-dependent, so the
      // check is content-keyed, not id-keyed.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val d = tbl(s, dir, "documents")
      val rows = d.unionByName(d.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
        .select(col("doc_id").cast("long"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq
      val input = MemoryStream[(Long, String)]
      val stream = input.toDF().toDF("doc_id", "text")
        .withColumn("ts",
          lit(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      val sink = s"q103_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.dedupStream(stream, "ts", Seq("text"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .groupBy(md5(col("text")).as("fp"))
        .agg(count(lit(1)).as("n"))
        .orderBy("fp")
    }),

    "q104_stream_decontaminate" -> ((s, dir) => {
      // the q94 contamination setup run through the STREAMING gate:
      // eval set = substrings of every 25th doc, corpus streamed in
      // 3 micro-batches; emitted clean ids must equal "documents
      // minus the batch contamination truth" (winnowing is
      // content-based, so the clean set is arrival-order-independent)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val docs = tbl(s, dir, "documents")
        .select(col("doc_id").cast("long"), col("text"))
      val test = docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("substring(text, 21)").as("text"))
      val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq
      val input = MemoryStream[(Long, String)]
      val stream = input.toDF().toDF("doc_id", "text")
      val clean = scala.collection.mutable.ArrayBuffer[Long]()
      // minShared = 20 splits this synthetic corpus ~50/50 (its docs
      // share vocabulary, so the q94 threshold of 3 flags nearly
      // everything — a 1-row output would certify little)
      val q = StreamingOps.decontaminateStream(stream, test,
        "doc_id", "text", minShared = 20,
        emit = b => {
          clean ++= b.select(col("doc_id").cast("long"))
            .collect().map(_.getLong(0)); ()
        }).start()
      drive(input, q, rows, nChunks = 3)
      clean.toSeq.sorted.toDF("doc_id")
    }),

    "q105_stream_dedup_ingest" -> ((s, dir) => {
      // the full ingestion story: corpus indexed once, then the q93
      // near-dup batch (every 10th doc, first word dropped, id + 1e6)
      // streamed through dedupIngestSink in TWO monotone-id
      // micro-batches — batch 2 is deduped against corpus + batch 1's
      // ABSORBED SURVIVORS, so the oracle replays exactly that
      // two-round elimination over the all-pairs Jaccard truth
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val corpus = tbl(s, dir, "documents")
        .select(col("doc_id").cast("long"), col("text"))
      // near-dups of every 10th doc (doomed against the corpus) PLUS
      // genuinely fresh docs (uppercased -> disjoint shingles, they
      // survive and get ABSORBED — batch 2 then dedups against them)
      val batch = corpus.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text"))
        .unionByName(corpus.filter(col("doc_id") % 10 === 5)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            upper(col("text")).as("text")))
      val rows = batch.collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq
      val root = java.nio.file.Files
        .createTempDirectory("graft_q105_idx").toString
      graft.dedup.MinhashIndex.build(corpus, "doc_id", "text", root)
      val input = MemoryStream[(Long, String)]
      val stream = input.toDF().toDF("doc_id", "text")
      val survivors = scala.collection.mutable.ArrayBuffer[Long]()
      val q = StreamingOps.dedupIngestSink(stream, corpus,
        "doc_id", "text", root, threshold = 0.5,
        emit = b => {
          survivors ++= b.select(col("doc_id").cast("long"))
            .collect().map(_.getLong(0)); ()
        }).start()
      // split at the dataset-derived midpoint (the oracle recomputes
      // the same boundary from MAX(doc_id)); ids stay monotone
      val maxSrc = corpus.agg(max(col("doc_id"))).head().getLong(0)
      val mid = 1000000L + maxSrc / 2
      val (b1, b2) = rows.partition(_._1 < mid)
      try {
        input.addData(b1: _*); q.processAllAvailable()
        input.addData(b2: _*); q.processAllAvailable()
      } finally q.stop()
      survivors.toSeq.sorted.toDF("doc_id")
    })
  )

  private val docsUnionBatchSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000, text[strpos(text, ' ') + 1:]
      |FROM documents WHERE doc_id % 10 = 0
      |UNION ALL
      |SELECT doc_id + 1000000, upper(text)
      |FROM documents WHERE doc_id % 10 = 5""".stripMargin

  val oracles: Map[String, String] = Map(
    "q103_stream_dedup_exact" ->
      """WITH t AS (SELECT * FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 7 = 0)
        |SELECT DISTINCT md5(text) AS fp, CAST(1 AS BIGINT) AS n
        |FROM t ORDER BY 1""".stripMargin,

    "q104_stream_decontaminate" ->
      s"""WITH dirty AS (
         |  SELECT c.doc_id AS cid
         |  FROM ${QueriesData.winnowSql(
              "SELECT doc_id, text FROM documents")} c
         |  JOIN ${QueriesData.winnowSql(
              "SELECT doc_id + 2000000 AS doc_id, text[21:] AS text " +
                "FROM documents WHERE doc_id % 25 = 0")} t
         |  ON c.fp = t.fp
         |  GROUP BY c.doc_id, t.doc_id HAVING count(*) >= 20)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT cid FROM dirty)
         |ORDER BY 1""".stripMargin,

    // two-round greedy elimination, exactly the sink's semantics:
    // round 1 kills batch-1 docs pairing (J >= 0.5) with corpus or a
    // smaller batch-1 sibling; round 2 kills batch-2 docs pairing
    // with corpus, a batch-1 SURVIVOR (casualties were never
    // absorbed), or a smaller batch-2 sibling
    "q105_stream_dedup_ingest" ->
      s"""WITH t AS ($docsUnionBatchSql),
         |mid AS (SELECT 1000000 + MAX(doc_id) // 2 AS m
         |  FROM documents),
         |sh AS (SELECT doc_id,
         |  list_distinct(CASE WHEN len(string_split(text,' ')) >= 3
         |    THEN list_transform(
         |      range(0, len(string_split(text,' ')) - 2),
         |      i -> array_to_string(
         |        string_split(text,' ')[i+1:i+3], ' '))
         |    ELSE [] END) AS s
         |  FROM t),
         |e AS (SELECT a.doc_id AS ia, b.doc_id AS ib
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE b.doc_id >= 1000000
         |    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |        CAST(len(list_distinct(list_concat(a.s, b.s)))
         |             AS DOUBLE) >= 0.5),
         |d1 AS (SELECT DISTINCT ib FROM e
         |  WHERE ib < (SELECT m FROM mid)),
         |s1 AS (SELECT doc_id FROM t
         |  WHERE doc_id >= 1000000 AND doc_id < (SELECT m FROM mid)
         |    AND doc_id NOT IN (SELECT ib FROM d1)),
         |d2 AS (SELECT DISTINCT ib FROM e
         |  WHERE ib >= (SELECT m FROM mid)
         |    AND (ia < 1000000
         |         OR ia IN (SELECT doc_id FROM s1)
         |         OR ia >= (SELECT m FROM mid)))
         |SELECT doc_id FROM t
         |WHERE doc_id >= 1000000
         |  AND doc_id NOT IN (SELECT ib FROM d1)
         |  AND doc_id NOT IN (SELECT ib FROM d2)
         |ORDER BY 1""".stripMargin
  )
}
