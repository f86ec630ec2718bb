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
    "q313_stream_feature_matrix" -> ((s, dir) => {
      // the ONE-STATE-ROW online feature matrix: session position +
      // recency + momentum + expanding trend from a single
      // flatMapGroupsWithState pass; the oracle is LITERALLY q303's
      // composite (fifteenth shared pair)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "events")
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"), col("ts").cast("timestamp"),
          col("event_type"), col("value"))
        .collect()
        .map(r => StreamingOps.FmEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2), r.getString(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.FmEvent]
      val sink = s"q313_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.featureMatrixStream(input.toDS(),
        types = Seq("purchase", "click", "error"),
        gapSeconds = 1800L)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          col("seq").as("session_event_seq"),
          col("usInto").as("us_into_session"),
          element_at(col("since"), 1).as("us_since_purchase"),
          element_at(col("since"), 2).as("us_since_click"),
          element_at(col("since"), 3).as("us_since_error"),
          col("dir").as("value_dir"),
          col("run").as("value_dir_run"),
          round(col("trend") * 86400d, 6).as("trend_per_day"))
        .orderBy("event_id")
    }),

    "q300_stream_trend" -> ((s, dir) => {
      // the ONLINE companion of q299: exact BigInt expanding OLS
      // registers per user, batch-identical double conversion; the
      // oracle is LITERALLY q299's SQL (fourteenth shared pair)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "events")
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"),
          col("ts").cast("timestamp"), col("value"))
        .collect()
        .map(r => StreamingOps.TrendEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.TrendEvent]
      val sink = s"q300_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.expandingTrendStream(input.toDS())
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          round(col("trend") * 86400d, 6).as("trend_per_day"))
        .orderBy("event_id")
    }),

    "q298_stream_day_streak" -> ((s, dir) => {
      // the ONLINE companion of q280: two longs of state per user
      // (last day, streak) on the same integer day grid; the oracle
      // is LITERALLY q280's SQL (thirteenth shared pair)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "events")
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"), col("ts").cast("timestamp"))
        .collect()
        .map(r => StreamingOps.DayEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2)))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.DayEvent]
      val sink = s"q298_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.activeDayStreakStream(input.toDS())
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          col("streakDays").as("streak_days"))
        .orderBy("event_id")
    }),

    "q295_stream_monotone" -> ((s, dir) => {
      // the ONLINE companion of q292: sign vs prior observed reading
      // + same-direction streak as O(1) integer state per user,
      // across 3 REAL micro-batches; the oracle is LITERALLY q292's
      // SQL (tenth shared batch/stream pair)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "events")
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"),
          col("ts").cast("timestamp"), col("value"))
        .collect()
        .map(r => StreamingOps.MonoEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.MonoEvent]
      val sink = s"q295_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.monotoneRunStream(input.toDS())
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          col("dir").as("value_dir"),
          col("run").as("value_dir_run"))
        .orderBy("event_id")
    }),

    "q296_stream_session_position" -> ((s, dir) => {
      // the ONLINE companion of q283: in-session ordinal + micros
      // since session start as O(1) integer state per user, same
      // strict-gap rule; the oracle is LITERALLY q283's SQL
      // (eleventh shared pair)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "events")
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"), col("ts").cast("timestamp"))
        .collect()
        .map(r => StreamingOps.PosEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2)))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.PosEvent]
      val sink = s"q296_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.sessionPositionStream(input.toDS(),
        gapSeconds = 1800L)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          col("seq").as("session_event_seq"),
          col("usInto").as("us_into_session"))
        .orderBy("event_id")
    }),

    "q297_stream_recency" -> ((s, dir) => {
      // the ONLINE companion of q285: strictly-prior last-seen
      // registers per requested type (emit BEFORE update, so an
      // event never reads itself); the oracle is LITERALLY q285's
      // SQL (twelfth shared pair)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val types = Seq("purchase", "click", "error")
      val rows = tbl(s, dir, "events")
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"), col("ts").cast("timestamp"),
          col("event_type"))
        .collect()
        .map(r => StreamingOps.TypeEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2), r.getString(3)))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.TypeEvent]
      val sink = s"q297_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.recencyByTypeStream(input.toDS(), types)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          element_at(col("since"), 1).as("us_since_purchase"),
          element_at(col("since"), 2).as("us_since_click"),
          element_at(col("since"), 3).as("us_since_error"))
        .orderBy("event_id")
    }),

    "q255_stream_ohlc" -> ((s, dir) => {
      // real-time OHLC bars on the purchase stream — the streaming
      // twin of q254's epoch-aligned 6h grid (non-empty buckets only:
      // a stream cannot emit a bar no event opened; empty-bucket
      // synthesis and close-carry stay batch concerns). Same planted
      // nulls; state per open bar is one (n,o,h,l,c) tuple, and bars
      // finalize in append mode when the watermark passes
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ev = tbl(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id").cast("long"),
          col("ts").cast("timestamp"),
          when(col("event_id") % 13 === 0, lit(null).cast("double"))
            .otherwise(col("value")).as("v"))
      val rows = ev.collect().map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) Option.empty[Double] else Some(r.getDouble(2))))
        .sortBy(_._2.getTime).toSeq
      val maxTs = rows.map(_._2.getTime).max
      val input = MemoryStream[(Long, java.sql.Timestamp, Option[Double])]
      val stream = input.toDF().toDF("user_id", "ts", "v")
      val sink = s"q255_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.ohlcBarsStream(stream, "user_id", "ts", "v",
        widthSeconds = 21600L, watermark = "1 second")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        val sz = math.max(1, (rows.length + 2) / 3)
        rows.grouped(sz).foreach { chunk =>
          input.addData(chunk: _*); q.processAllAvailable()
        }
        input.addData((-1L,
          new java.sql.Timestamp(maxTs + 30L * 86400 * 1000), None))
        q.processAllAvailable()
      } finally q.stop()
      s.table(sink).filter(col("user_id") >= 0)
        .select(col("user_id"), col("bar_start_s"), col("n"),
          round(col("open"), 6).as("open"),
          round(col("high"), 6).as("high"),
          round(col("low"), 6).as("low"),
          round(col("close"), 6).as("close"))
        .orderBy("user_id", "bar_start_s")
    }),

    "q125_stream_quantile_sketch" -> ((s, dir) => {
      // running per-user quantiles over a REAL 3-micro-batch stream:
      // bounded per-key bin state merges associatively across batches,
      // so the final update per key equals the one-shot sketch — the
      // oracle recomputes the fixed-range rule (mn=0, mx=500, 128
      // bins) over the whole events table in SQL
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val probs = Seq(0.5, 0.9)
      val rows = tbl(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("user_id").cast("string"),
          col("value").cast("double"))
        .collect()
        .map(r => StreamingOps.QRow(r.getString(0), r.getDouble(1)))
        .sortBy(r => (r.key, r.value)).toSeq
      val input = MemoryStream[StreamingOps.QRow]
      val latest = scala.collection.mutable
        .Map[(String, Double), Double]()
      val q = StreamingOps.groupedQuantileSketchStream(
        input.toDS(), probs, mn = 0.0, mx = 500.0, bins = 128)
        .writeStream.outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[
            StreamingOps.QuantEstimate], _: Long) =>
          b.collect().foreach(e => latest((e.key, e.prob)) = e.value)
          ()
        }.queryName("q125").start()
      drive(input, q, rows, nChunks = 3)
      latest.toSeq
        .map { case ((k, p), v) => (k, p, v) }
        .toDF("key", "prob", "value")
        .withColumn("value", round(col("value"), 6))
        .orderBy("key", "prob")
    }),

    "q133_stream_cms" -> ((s, dir) => {
      // Count-Min counters built BY THE STREAM: the 4x512 matrix is an
      // associatively-merged streaming aggregation (update mode,
      // bounded state regardless of stream length — the whole point of
      // a sketch on a stream), fed the documents corpus in 3 real
      // micro-batches. The final counters point-query every distinct
      // token and must reproduce q128's one-shot batch readout
      // value-exactly (same oracle SQL).
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "documents")
        .select(col("doc_id").cast("long"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq
      val input = MemoryStream[(Long, String)]
      val toks = input.toDF().toDF("doc_id", "text")
        .select(explode(split(col("text"), " ")).as("token"))
      val latest = scala.collection.mutable.Map[(Int, Int), Double]()
      val q = graft.core.Sketch.cmsCounters(toks, "token",
        depth = 4, width = 512)
        .writeStream.outputMode("update")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach(r =>
            latest((r.getInt(0), r.getInt(1))) = r.getDouble(2))
          ()
        }.queryName("q133").start()
      drive(input, q, rows, nChunks = 3)
      val counters = latest.toSeq
        .map { case ((d, b), cnt) => (d, b, cnt) }
        .toDF("d", "b", "cnt")
      // the one shared readout (QueriesData.cmsTop25): q133 must
      // reproduce q128 exactly, so the readout is literally q128's
      QueriesData.cmsTop25(s, dir, counters)
    }),

    "q137_stream_weighted_sample" -> ((s, dir) => {
      // a RUNNING weighted sample without replacement: the bounded-
      // heap top_k_by is an associative mergeable aggregate, so as a
      // streaming groupBy aggregation (update mode, <= k entries of
      // state per language forever) its post-stream state must equal
      // the one-shot batch sample — q130's oracle, verbatim. Keys are
      // the SAME deterministic A-ES keys (Sharding.esKey).
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "documents")
        .select(col("lang"), col("doc_id").cast("long"),
          col("n_chars").cast("int"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .sortBy(_._2).toSeq
      val input = MemoryStream[(String, Long, Int)]
      val stream = input.toDF().toDF("lang", "doc_id", "n_chars")
        .filter(col("doc_id").isNotNull &&
          col("n_chars").cast("double") > 0)
      val agg = stream.groupBy(col("lang"))
        .agg(graft.functions.TopKBy.topKBy(
          graft.text.Sharding.esKey(col("doc_id"), col("n_chars"),
            salt = "ws"),
          col("doc_id"), 20).as("__s"))
      val latest = scala.collection.mutable
        .Map[String, Seq[(Int, Long)]]()
      val q = agg.writeStream.outputMode("update")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach { r =>
            val entries = r.getSeq[org.apache.spark.sql.Row](1)
              .zipWithIndex
              .map { case (e, i) => (i + 1, e.getLong(1)) }
            latest(r.getString(0)) = entries
          }
          ()
        }.queryName("q137").start()
      drive(input, q, rows, nChunks = 3)
      latest.toSeq
        .flatMap { case (lang, es) =>
          es.map { case (rank, id) => (lang, rank, id) } }
        .toDF("lang", "rank", "doc_id")
        .orderBy("lang", "rank")
    }),

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

    "q106_stream_sessionize" -> ((s, dir) => {
      // native session_window sessionization run as a REAL stream:
      // events fed in 3 time-ordered micro-batches, a far-future dummy
      // row pushes the watermark so every real session finalizes in
      // append mode. Oracle = the batch gap-sessionization semantics
      // (new session at gap >= 30min — session windows [t, t+gap)
      // merge only when they OVERLAP, so an exactly-gap step splits).
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ev = tbl(s, dir, "events")
        .select(col("user_id").cast("long"),
          col("ts").cast("timestamp"), col("value"))
      val rows = ev.collect().map(r => (r.getLong(0),
        r.getTimestamp(1), r.getDouble(2))).sortBy(_._2.getTime).toSeq
      val maxTs = rows.map(_._2.getTime).max
      val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
      val stream = input.toDF().toDF("user_id", "ts", "value")
      val sink = s"q106_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.sessionizeStream(stream, "user_id", "ts",
        gap = "30 minutes", watermark = "1 second",
        valueCol = Some("value"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        val sz = math.max(1, (rows.length + 2) / 3)
        rows.grouped(sz).foreach { chunk =>
          input.addData(chunk: _*); q.processAllAvailable()
        }
        input.addData((-1L,
          new java.sql.Timestamp(maxTs + 30L * 86400 * 1000), 0.0))
        q.processAllAvailable()
      } finally q.stop()
      s.table(sink).filter(col("user_id") >= 0)
        .select(col("user_id"),
          col("session_start").cast("timestamp_ntz").as("session_start"),
          col("session_end").cast("timestamp_ntz").as("session_end"),
          col("n_events"), round(col("value_sum"), 6).as("value_sum"))
        .orderBy("user_id", "session_start")
    }),

    "q107_stream_rolling" -> ((s, dir) => {
      // sliding event-time windows (1h length, 30min slide) on a stream;
      // every event lands in exactly 2 windows. Oracle rebuilds the
      // same epoch-aligned window grid in SQL.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ev = tbl(s, dir, "events")
        .select(col("user_id").cast("long"),
          col("ts").cast("timestamp"), col("value"))
      val rows = ev.collect().map(r => (r.getLong(0),
        r.getTimestamp(1), r.getDouble(2))).sortBy(_._2.getTime).toSeq
      val maxTs = rows.map(_._2.getTime).max
      val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
      val stream = input.toDF().toDF("user_id", "ts", "value")
      val sink = s"q107_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.rollingWindowStream(stream, "user_id", "ts",
        windowLen = "1 hour", slide = "30 minutes", valueCol = "value",
        watermark = "1 second")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        val sz = math.max(1, (rows.length + 2) / 3)
        rows.grouped(sz).foreach { chunk =>
          input.addData(chunk: _*); q.processAllAvailable()
        }
        input.addData((-1L,
          new java.sql.Timestamp(maxTs + 30L * 86400 * 1000), 0.0))
        q.processAllAvailable()
      } finally q.stop()
      s.table(sink).filter(col("user_id") >= 0)
        .select(col("user_id"),
          col("window_start").cast("timestamp_ntz").as("window_start"),
          col("window_end").cast("timestamp_ntz").as("window_end"),
          col("n_events"), round(col("value_sum"), 6).as("value_sum"),
          round(col("value_avg"), 6).as("value_avg"))
        .orderBy("user_id", "window_start")
    }),

    "q108_stream_windowed_topk" -> ((s, dir) => {
      // "trending items": tumbling 1h windows x event_type, top-3 by
      // value through the bounded-heap top_k_by aggregate — the
      // serialize/merge cycle the incremental state store exercises.
      // Oracle = the row_number window formulation per (type, window).
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ev = tbl(s, dir, "events")
        .select(col("event_type"), col("ts").cast("timestamp"),
          col("value"), col("event_id").cast("long"))
      val rows = ev.collect().map(r => (r.getString(0),
        r.getTimestamp(1), r.getDouble(2), r.getLong(3)))
        .sortBy(_._2.getTime).toSeq
      val maxTs = rows.map(_._2.getTime).max
      val input =
        MemoryStream[(String, java.sql.Timestamp, Double, Long)]
      val stream = input.toDF()
        .toDF("event_type", "ts", "value", "event_id")
      val sink = s"q108_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.windowedTopKStream(stream, "event_type",
        "ts", "value", "event_id", k = 3, windowLen = "1 hour",
        watermark = "1 second")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        val sz = math.max(1, (rows.length + 2) / 3)
        rows.grouped(sz).foreach { chunk =>
          input.addData(chunk: _*); q.processAllAvailable()
        }
        input.addData(("__wm_dummy",
          new java.sql.Timestamp(maxTs + 30L * 86400 * 1000), 0.0, -1L))
        q.processAllAvailable()
      } finally q.stop()
      s.table(sink).filter(col("event_type") =!= "__wm_dummy")
        .select(col("event_type"),
          col("window_start").cast("timestamp_ntz").as("window_start"),
          col("window_end").cast("timestamp_ntz").as("window_end"),
          col("rank"), round(col("score"), 6).as("score"), col("id"))
        .orderBy("event_type", "window_start", "rank")
    }),

    "q109_stream_asof_enrich" -> ((s, dir) => {
      // the streaming point-in-time enrich (flatMapGroupsWithState
      // carry of the latest feature) fed feature+event streams in two
      // TIME-SPLIT micro-batches — batch-2 events must see batch-1
      // features through group state. Oracle = the batch ASOF join
      // (features win ties), leakage-free by construction.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import graft.streaming.StreamingOps.Tagged
      val ev = tbl(s, dir, "events")
        .select(col("user_id").cast("string").as("entity"),
          col("ts").cast("timestamp"), col("value"), col("event_type"))
        .collect()
      val tagged = ev.flatMap { r =>
        val base = Seq(Tagged(r.getString(0), r.getTimestamp(1), 1,
          None, Some(r.getDouble(2))))
        if (r.getString(3) == "purchase")
          Tagged(r.getString(0), r.getTimestamp(1), 0,
            Some(r.getDouble(2)), None) +: base
        else base
      }.sortBy(t => (t.ts.getTime, t.side)).toSeq
      // strict time split: same-ts rows stay in one batch
      val midTs = tagged(tagged.length / 2).ts.getTime
      val (b1, b2) = tagged.partition(_.ts.getTime < midTs)
      val input = MemoryStream[Tagged]
      val sink = s"q109_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.asOfEnrichStream(input.toDS())
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        input.addData(b1: _*); q.processAllAvailable()
        input.addData(b2: _*); q.processAllAvailable()
      } finally q.stop()
      s.table(sink)
        .select(col("entity"), col("ts").cast("timestamp_ntz").as("ts"),
          round(col("payload"), 6).as("payload"),
          round(col("featureAtOrBefore"), 6).as("feature_value"),
          col("featureTs").cast("timestamp_ntz").as("feature_ts"))
        .orderBy("entity", "ts")
    }),

    "q110_stream_phash" -> ((s, dir) => {
      // streaming banded phash near-dup over the q62 image corpus
      // (every 10th phash re-appears with 2 bits flipped): the pair
      // SET is deterministic — each qualifying pair emits exactly once
      // from the first shared band when its second member arrives.
      // maxDist(3) < bands(4) pigeonholes every true pair into a
      // shared bucket, so the oracle is the exhaustive Hamming truth.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import graft.streaming.StreamingOps.PhashImage
      val path = "/tmp/graft_phash_q110"
      val base = graft.io.ImageTable.images(s, 500)
        .select(col("image_id"), col("phash"))
      base.unionByName(base
          .filter(expr("CAST(substring(image_id, 5) AS BIGINT) % 10 = 0"))
          .select(concat(col("image_id"), lit("_d")).as("image_id"),
            col("phash").bitwiseXOR(lit(257L)).as("phash")))
        .write.mode("overwrite").parquet(path)
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      val rows = s.read.parquet(path).collect()
        .map(r => PhashImage(r.getString(0), t0, r.getLong(1)))
        .sortBy(_.imageId).toSeq
      val input = MemoryStream[PhashImage]
      val sink = s"q110_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.phashNearDupStream(input.toDS(), maxDist = 3)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("idA").as("id_a"), col("idB").as("id_b"),
          col("hamming"))
        .orderBy("id_a", "id_b")
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
    }),

    "q113_stream_ann_enrich" -> ((s, dir) => {
      // stateless streaming similarity enrichment: query vectors
      // arrive in 2 micro-batches and probe a STATIC pinned-model IVF
      // index. No cross-batch state exists, so chunking cannot change
      // the answer — the streamed union must equal the batch IVF
      // search value-exactly (q97's oracle)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val e = tbl(s, dir, "embeddings")
      val model = graft.ann.Knn.IvfModel(QueriesData.PinnedIvf.cents)
      val lists = graft.ann.Knn.ivfLists(model, e, "vec_id",
        "embedding")
      val rows = e.filter(col("vec_id") < 5)
        .select(col("vec_id").cast("long"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
        .sortBy(_._1).toSeq
      val input = MemoryStream[(Long, Seq[Float])]
      val stream = input.toDF().toDF("vec_id", "embedding")
      val out = scala.collection.mutable
        .ArrayBuffer[(Long, Int, Long, Double)]()
      val q = StreamingOps.annEnrichStream(stream, model, lists,
        "vec_id", "embedding", k = 5, nprobe = 2,
        emit = b => {
          out ++= b.select(col("query_id").cast("long"), col("rank"),
              col("item_id").cast("long"), col("cosine"))
            .collect().map(r => (r.getLong(0), r.getInt(1),
              r.getLong(2), r.getDouble(3)))
          ()
        }).start()
      drive(input, q, rows, nChunks = 2)
      out.toSeq.sortBy(t => (t._1, t._2))
        .toDF("query_id", "rank", "item_id", "cosine")
        .select(col("query_id"), col("rank"), col("item_id"),
          round(col("cosine"), 6).as("cosine"))
    }),

    "q151_stream_hll" -> ((s, dir) => {
      // HLL registers built BY THE STREAM: per-register MAX is
      // associative and idempotent, so the streaming groupBy
      // aggregation (update mode, <= 512 ints of state forever) must
      // converge to the batch register table exactly — the final
      // readout is literally q150's (same helper, same oracle)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "documents")
        .select(col("doc_id").cast("long"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq
      val input = MemoryStream[(Long, String)]
      val toks = input.toDF().toDF("doc_id", "text")
        .select(explode(split(col("text"), " ")).as("token"))
      val latest = scala.collection.mutable.Map[Int, Int]()
      val q = graft.core.Hll.hllRegisters(toks, "token", p = 9)
        .writeStream.outputMode("update")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach(r => latest(r.getInt(0)) = r.getInt(1))
          ()
        }.queryName("q151").start()
      drive(input, q, rows, nChunks = 3)
      val regs = latest.toSeq.map { case (reg, rho) => (reg, rho) }
        .toDF("reg", "rho")
      QueriesData.hllReadout512(s, dir, regs)
    }),

    "q175_stream_psi" -> ((s, dir) => {
      // streaming drift monitor: the reference shares are FIXED (the
      // training snapshot = doc_id % 3 == 0); production docs (the
      // rest) arrive as a real 3-micro-batch stream feeding a running
      // per-level groupBy-count (update mode, <= |levels| rows of
      // state forever). The post-stream readout through the SAME
      // psiFromCounts arithmetic must equal the one-shot batch PSI
      // over the identical ref/cur rows — q166's oracle pattern on
      // documents
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val docs = tbl(s, dir, "documents")
      val curRows = docs.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id"), col("lang")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      val input = MemoryStream[(Long, String)]
      val latest = scala.collection.mutable.Map[String, Long]()
      val counts = input.toDF().toDF("doc_id", "lang")
        .groupBy(col("lang").cast("string").as("level"))
        .agg(count(lit(1)).as("c"))
      val q = counts.writeStream.outputMode("update")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach(r =>
            latest(r.getString(0)) = r.getLong(1))
          ()
        }.queryName("q175").start()
      drive(input, q, curRows, nChunks = 3)
      val curCounts = latest.toSeq.toDF("level", "c")
      val refCounts = docs.filter(col("doc_id") % 3 === 0)
        .groupBy(col("lang").cast("string").as("level"))
        .agg(count(lit(1)).as("c"))
      graft.operators.Drift.psiFromCounts(refCounts, curCounts)
        .select(col("level"), round(col("p_ref"), 6).as("p_ref"),
          round(col("p_cur"), 6).as("p_cur"),
          round(col("psi_term"), 6).as("psi_term"),
          col("psi_total_nano"))
        .orderBy("level")
    }),

    "q163_stream_hll_by_key" -> ((s, dir) => {
      // per-key HLL registers built BY THE STREAM (update mode,
      // <= |keys| x 512 ints of state forever): per-(key, register)
      // MAX merges associatively and idempotently across the 3
      // micro-batches, so the final state must reproduce q157's
      // one-shot batch readout exactly (same oracle)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "documents")
        .select(col("doc_id").cast("long"), col("source"), col("text"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq
      val input = MemoryStream[(Long, String, String)]
      val toks = input.toDF().toDF("doc_id", "source", "text")
        .select(col("source"),
          explode(split(col("text"), " ")).as("token"))
      val latest = scala.collection.mutable.Map[(String, Int), Int]()
      val q = graft.core.Hll.hllRegistersByKey(toks, "source",
        "token", p = 9)
        .writeStream.outputMode("update")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach(r =>
            latest((r.getString(0), r.getInt(1))) = r.getInt(2))
          ()
        }.queryName("q163").start()
      drive(input, q, rows, nChunks = 3)
      val regs = latest.toSeq
        .map { case ((k, reg), rho) => (k, reg, rho) }
        .toDF("key", "reg", "rho")
      val est = graft.core.Hll.hllReadoutByKey(regs, p = 9)
        .withColumn("estimate", round(col("estimate"), 4))
      val truth = tbl(s, dir, "documents")
        .select(col("source"),
          explode(split(col("text"), " ")).as("token"))
        .groupBy(col("source").as("__src"))
        .agg(count_distinct(col("token")).as("n_true"))
      est.join(truth, col("key") === col("__src"))
        .select(col("key").as("source"), col("n_present"),
          col("s_micro"), col("estimate"), col("n_true"))
        .orderBy("source")
    }),

    "q188_stream_cusum" -> ((s, dir) => {
      // the ONLINE companion of q185: the same integer micro-unit
      // CUSUM recurrence carried as one (ts, sPos, sNeg) triple per
      // user across 3 REAL micro-batches — the oracle is LITERALLY
      // q185's recursive CTE (shared string), so batch scan, stream,
      // and oracle are certified against one definition
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "events")
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"),
          col("ts").cast("timestamp"), col("value").cast("double"))
        .collect()
        .map(r => StreamingOps.CusumEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.CusumEvent]
      val sink = s"q188_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.cusumStream(input.toDS(),
        target = 35.0, slack = 10.0, threshold = 1000.0)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"), col("cusumPos")
            .as("cusum_pos"), col("cusumNeg").as("cusum_neg"),
          col("alarm"))
        .orderBy("event_id")
    }),

    "q360_stream_markov" -> ((s, dir) => {
      // the SERVING side of q267: the batch-fitted transition
      // matrix ships broadcast, one prev-type register per user
      // carries across 3 REAL micro-batches; the oracle is
      // LITERALLY q267's SQL
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val typed = tbl(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isNotNull)
      val m = graft.operators.Behavior.transitionFeatures(typed,
          "user_id", "ts", "event_type", tieBreak = Seq("event_id"))
        .filter(col("trans_n").isNotNull)
        .select(col("prev_event_type"), col("event_type"),
          col("trans_n"), col("prev_n"))
        .distinct().collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val rows = typed
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"), col("ts").cast("timestamp"),
          col("event_type"))
        .collect()
        .map(r => StreamingOps.TrEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2), r.getString(3)))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.TrEvent]
      val sink = s"q360_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.transitionScoreStream(input.toDS(), m)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          col("prevType").as("prev_event_type"),
          col("eventType").as("event_type"),
          col("transN").as("trans_n"), col("prevN").as("prev_n"),
          round(col("transP"), 6).as("trans_p"),
          round(col("transSurprisal"), 6).as("trans_surprisal"))
        .orderBy("event_id")
    }),

    "q359_stream_distinct_types" -> ((s, dir) => {
      // the ONLINE companion of q357: the entity's seen-type set
      // carried across 3 REAL micro-batches, size emitted before
      // the update; the oracle is LITERALLY q357's windowed SQL
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "events")
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"), col("ts").cast("timestamp"),
          col("event_type"))
        .collect()
        .map(r => StreamingOps.DtEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2),
          if (r.isNullAt(3)) None else Some(r.getString(3))))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.DtEvent]
      val sink = s"q359_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.distinctTypesStream(input.toDS())
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          col("priorNTypes").as("prior_n_types"))
        .orderBy("event_id")
    }),

    "q356_stream_type_counts" -> ((s, dir) => {
      // the ONLINE companion of q355: strictly-prior per-type
      // counters carried as ONE register row per user across 3
      // REAL micro-batches; the oracle is LITERALLY q355's
      // windowed SQL
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "events")
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"), col("ts").cast("timestamp"),
          col("event_type"))
        .collect()
        .map(r => StreamingOps.TcEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2),
          if (r.isNullAt(3)) None else Some(r.getString(3))))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.TcEvent]
      val sink = s"q356_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.typeCountsStream(input.toDS(),
        Seq("view", "click", "purchase", "error"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          element_at(col("priorCounts"), 1).as("prior_n_view"),
          element_at(col("priorCounts"), 2).as("prior_n_click"),
          element_at(col("priorCounts"), 3).as("prior_n_purchase"),
          element_at(col("priorCounts"), 4).as("prior_n_error"),
          col("priorTotal").as("prior_n_total"))
        .orderBy("event_id")
    }),

    "q334_stream_gap_surprise" -> ((s, dir) => {
      // the ONLINE companion of q332: expanding prior-gap mean and
      // surprise ratio carried as ONE (lastTs, n, Σ) triple per user
      // across 3 REAL micro-batches; the oracle is LITERALLY q332's
      // windowed SQL
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "events")
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"), col("ts").cast("timestamp"))
        .collect()
        .map(r => StreamingOps.GapEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2)))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.GapEvent]
      val sink = s"q334_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.gapSurpriseStream(input.toDS())
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          col("gapUs").as("gap_us"),
          col("nPriorGaps").as("n_prior_gaps"),
          (col("meanPriorGapUs") / 1e6).as("mean_prior_gap_s"),
          col("gapSurprise").as("gap_surprise"))
        .orderBy("event_id")
    }),

    "q201_stream_zscore" -> ((s, dir) => {
      // the ONLINE companion of q197: prior-20-rows z-score carried
      // as one bounded ring (<= 20 longs) per user across 3 REAL
      // micro-batches; the oracle is LITERALLY q197's windowed SQL
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "events")
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"),
          col("ts").cast("timestamp"), col("value").cast("double"))
        .collect()
        .map(r => StreamingOps.ZEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.ZEvent]
      val sink = s"q201_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.zScoreStream(input.toDS(), k = 20,
        cutoff = 3.0)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          round(col("rz"), 6).as("rz"), col("anomaly"))
        .orderBy("event_id")
    }),

    "q270_stream_holt" -> ((s, dir) => {
      // the ONLINE companion of q266: Holt level+trend per user, one
      // (ts, l, b) triple carried across 3 REAL micro-batches with
      // the batch scan's exact operand order; the oracle is LITERALLY
      // q266's recursive-CTE SQL (ninth shared batch/stream pair)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"),
          col("ts").cast("timestamp"), col("value"))
        .collect()
        .map(r => StreamingOps.HoltEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2), Some(r.getDouble(3))))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.HoltEvent]
      val sink = s"q270_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.holtSmoothStream(input.toDS(),
        alpha = 0.3, beta = 0.1)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          round(col("level"), 6).as("holt_level"),
          round(col("trend"), 6).as("holt_trend"),
          round(col("forecast"), 6).as("holt_forecast"))
        .orderBy("event_id")
    }),

    "q269_stream_minmax" -> ((s, dir) => {
      // the ONLINE companion of q37: trailing 5-row min/max/count per
      // user via monotonic deques (amortized O(1) per row — the scale
      // path for large k), one bounded state per user across 3 REAL
      // micro-batches; the oracle is LITERALLY q37's windowed SQL
      // (eighth shared batch/stream pair). min/max are selections, so
      // no rounding discipline is needed anywhere.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "events")
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"),
          col("ts").cast("timestamp"), col("value"))
        .collect()
        .map(r => StreamingOps.MinMaxEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.MinMaxEvent]
      val sink = s"q269_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.rollingMinMaxStream(input.toDS(), k = 5)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          col("min").as("value_roll5_min"),
          col("max").as("value_roll5_max"),
          col("count").as("value_roll5_count"))
        .orderBy("event_id")
    }),

    "q257_stream_corr" -> ((s, dir) => {
      // the ONLINE companion of q256: prior-20-rows pairwise-complete
      // corr/beta of value vs payload size, one bounded ring
      // (<= 20 pairs) per user across 3 REAL micro-batches; the
      // oracle is LITERALLY q256's windowed SQL (seventh shared pair)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "events")
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"),
          col("ts").cast("timestamp"),
          when(col("event_id") % 11 === 0, lit(null).cast("double"))
            .otherwise(col("value")).as("v"),
          length(col("props")).cast("double").as("pl"))
        .collect()
        .map(r => StreamingOps.CorrEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.CorrEvent]
      val sink = s"q257_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.rollingCorrStream(input.toDS(), k = 20)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          round(col("corr"), 6).as("corr"),
          round(col("beta"), 6).as("beta"))
        .orderBy("event_id")
    }),

    "q206_stream_ewm" -> ((s, dir) => {
      // the ONLINE companion of q193: the normalized EWM LEVEL
      // s + (1-2^(-dt/hl))*(x-s), one (ts, level) pair per user
      // carried across 3 REAL micro-batches; the oracle is LITERALLY
      // q193's recursive-CTE SQL (fourth shared batch/stream pair)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"),
          col("ts").cast("timestamp"), col("value").cast("double"))
        .collect()
        .map(r => StreamingOps.EwmEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2), Some(r.getDouble(3))))
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.EwmEvent]
      val sink = s"q206_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.ewmMeanStream(input.toDS(),
        halfLifeSeconds = 21600.0)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          round(col("ewmMean"), 6).as("ewm_mean"))
        .orderBy("event_id")
    }),

    "q147_stream_decayed_feature" -> ((s, dir) => {
      // the ONLINE companion of q146: the exact (untruncated)
      // time-decay recurrence s_t = x_t + s_prev * 2^(-dt/hl), carried
      // as one (ts, double) state pair per user across 3 REAL
      // micro-batches. The oracle replays the identical left fold —
      // same operand order, same pow — via a recursive CTE, so the
      // cross-batch state carry is certified value-exactly.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = tbl(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("user_id").cast("long"),
          col("event_id").cast("long"),
          col("ts").cast("timestamp"), col("value").cast("double"))
        .collect()
        .map(r => StreamingOps.DecayEvent(r.getLong(0), r.getLong(1),
          r.getTimestamp(2), r.getDouble(3)))
        // global (ts, id) order keeps every per-user subsequence
        // ts-nondecreasing across the chunk boundaries — the
        // append-only feature-counter contract the operator requires.
        // MICROSECONDS, not getTime millis: 99.9% of events carry
        // sub-ms precision, and a same-millisecond pair straddling a
        // chunk boundary in ms-order would trip the operator's loud
        // monotonicity require
        .sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId)).toSeq
      val input = MemoryStream[StreamingOps.DecayEvent]
      val sink = s"q147_out_${java.util.UUID.randomUUID().toString
        .replace("-", "")}"
      val q = StreamingOps.decayedFeatureStream(input.toDS(),
        halfLifeSeconds = 21600.0)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      drive(input, q, rows, nChunks = 3)
      s.table(sink)
        .select(col("eventId").as("event_id"),
          col("entity").as("user_id"),
          round(col("decayed"), 6).as("decayed"))
        .orderBy("event_id")
    }),

    "q225_stream_ingest_verify" -> ((s, dir) => {
      // streaming twin of the q220 capstone: the SAME incoming batch
      // (QueriesData.ingestFixture — same corpus parquet, same fates)
      // arrives in two micro-batches — the exact relabels first, the
      // 2x rematerializations + fresh renders after — with the index
      // absorbed between. Per micro-batch: stored index proposes,
      // normalized pair verify decodes ONLY candidates, verdicts
      // stream out. The union of corpus-side dup verdicts must equal
      // the one-shot answer: the oracle is LITERALLY q220's SQL
      // (sixth shared batch/stream pair). Cross-chunk candidate pairs
      // (both sides in the stream) audit decode_ok=false and are
      // excluded the same way q220's final filter excludes them.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val (corpus, batch) = QueriesData.ingestFixture(s)
      val idxRoot = java.nio.file.Files
        .createTempDirectory("graft_q225_idx").toString
      graft.multimodal.PhashIndex.build(
        corpus.select("id", "phash"), "id", "phash", idxRoot)
      val rows = batch.select("id", "bytes", "fmt", "phash").collect()
        .map(r => (r.getLong(0), r.getAs[Array[Byte]](1),
          r.getString(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      val (c1, c2) = rows.partition(_._1 < 2000000L)
      val input = MemoryStream[(Long, Array[Byte], String, Long)]
      val stream = input.toDF().toDF("id", "bytes", "fmt", "phash")
      val dups = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      val q = StreamingOps.imageIngestVerifySink(stream, "id",
        "phash", idxRoot, maxDist = 3,
        payloads = corpus.select("id", "bytes", "fmt"),
        emit = b => {
          dups ++= b
            .filter(col("is_dup") && col("id_a") < 1000000L)
            .select("id_a", "id_b").collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          ()
        }).start()
      try {
        input.addData(c1: _*); q.processAllAvailable()
        input.addData(c2: _*); q.processAllAvailable()
      } finally q.stop()
      val v = dups.distinct.toSeq.toDF("matched_src", "batch_id")
      batch.select(col("id").as("batch_id"))
        .join(v.groupBy("batch_id")
          .agg(min(col("matched_src")).as("matched_id")),
          Seq("batch_id"), "left")
        .orderBy("batch_id")
    }),

    "q210_stream_phash_ingest" -> ((s, dir) => {
      // streaming ingest twin of q208: the SAME planted batch
      // (QueriesData.phashBatchOf over the SAME parquet input) arrives
      // in two monotone micro-batches — the xor-257/xor-(-1) rows
      // first, the xor-259 second twins after — with the index
      // absorbed between, so the cross-chunk d=1 twin pairs surface as
      // vs-index pairs of chunk 2. The union of emissions must equal
      // the one-shot batch answer: the oracle is LITERALLY q208's SQL
      // (fifth shared batch/stream pair).
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val imgs = QueriesData.oracleImages(s, 400,
        "/tmp/graft_oracle_images_q208")
      val base = imgs.select(
        expr("CAST(substring(image_id, 5) AS BIGINT)").as("id"),
        col("phash"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q210_idx").toString
      graft.multimodal.PhashIndex.build(base, "id", "phash", root)
      val rows = QueriesData.phashBatchOf(base)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1).toSeq
      val (b1, b2) = rows.partition(_._1 < 2000000L)
      val input = MemoryStream[(Long, Long)]
      val stream = input.toDF().toDF("id", "phash")
      val pairs = scala.collection.mutable
        .ArrayBuffer[(Long, Long, Int)]()
      val q = StreamingOps.phashIngestSink(stream, "id", "phash",
        root, maxDist = 3,
        emit = b => {
          pairs ++= b.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getInt(2)))
          ()
        }).start()
      try {
        input.addData(b1: _*); q.processAllAvailable()
        input.addData(b2: _*); q.processAllAvailable()
      } finally q.stop()
      pairs.distinct.sorted.toSeq.toDF("id_a", "id_b", "hamming")
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
    // per-bucket OHLC over the non-null readings; an all-null bucket
    // still emits (n=0, null OHLC) because its events opened the bar
    "q255_stream_ohlc" ->
      """WITH p AS (SELECT user_id, ts,
        |    CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS v
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id,
        |  CAST(CAST(floor(epoch_us(ts) / 21600000000.0) AS BIGINT)
        |    * 21600 AS BIGINT) AS bar_start_s,
        |  count(v) AS n,
        |  round(arg_min(v, CASE WHEN v IS NOT NULL THEN ts END), 6)
        |    AS open,
        |  round(max(v), 6) AS high, round(min(v), 6) AS low,
        |  round(arg_max(v, CASE WHEN v IS NOT NULL THEN ts END), 6)
        |    AS close
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the stream-built CMS counters must reproduce the one-shot batch
    // readout exactly — literally q128's oracle
    "q133_stream_cms" -> QueriesData.cmsTop25Sql,

    // the stream-built HLL registers must reproduce the one-shot
    // batch readout exactly — literally q150's oracle
    "q151_stream_hll" -> QueriesData.hllDistinctSql,

    // the stream-built PER-KEY registers must reproduce q157's
    // one-shot batch readout exactly — literally its oracle
    "q163_stream_hll_by_key" -> QueriesData.oracles("q157_hll_by_source"),

    // the stream-accumulated level counts must reproduce the one-shot
    // batch PSI over the same ref/cur rows (q166's arithmetic on the
    // documents table)
    "q175_stream_psi" ->
      """WITH r AS (SELECT lang AS level, COUNT(*) AS c
        |  FROM documents WHERE doc_id % 3 = 0 GROUP BY 1),
        |rt AS (SELECT CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) AS t
        |  FROM r),
        |c AS (SELECT lang AS level, COUNT(*) AS c
        |  FROM documents WHERE doc_id % 3 <> 0 GROUP BY 1),
        |ct AS (SELECT CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) AS t
        |  FROM c),
        |j AS (SELECT COALESCE(r.level, c.level) AS level,
        |    COALESCE(CAST(r.c AS DOUBLE) / (SELECT t FROM rt), 0)
        |      AS p_ref,
        |    COALESCE(CAST(c.c AS DOUBLE) / (SELECT t FROM ct), 0)
        |      AS p_cur
        |  FROM r FULL OUTER JOIN c ON r.level = c.level),
        |d AS (SELECT level, p_ref, p_cur,
        |    (p_cur - p_ref) *
        |      ln(GREATEST(p_cur, 1e-6) / GREATEST(p_ref, 1e-6)) AS term
        |  FROM j),
        |tot AS (SELECT CAST(SUM(CAST(ROUND(term * 1e9, 0) AS BIGINT))
        |    AS BIGINT) AS nano FROM d)
        |SELECT level, ROUND(p_ref, 6) AS p_ref,
        |  ROUND(p_cur, 6) AS p_cur, ROUND(term, 6) AS psi_term,
        |  (SELECT nano FROM tot) AS psi_total_nano
        |FROM d ORDER BY 1""".stripMargin,

    // the stream's merged top-k state must equal the one-shot batch
    // weighted sample — literally q130's oracle
    "q137_stream_weighted_sample" -> QueriesData.weightedSampleSql,

    // the batch operator's oracle, shared verbatim: one recursive-CTE
    // definition certifies q185 (batch) and q188 (stream) alike
    "q188_stream_cusum" ->
      QueriesTemporal.oracles("q185_cusum_changepoint"),

    // likewise: q197's windowed SQL certifies the streaming ring
    "q201_stream_zscore" ->
      QueriesTemporal.oracles("q197_rolling_zscore"),

    // likewise: q193's recursive-CTE SQL certifies the streaming EWM
    // level carry (fourth shared batch/stream oracle pair)
    "q206_stream_ewm" ->
      QueriesTemporal.oracles("q193_ewm_mean"),

    // likewise: q332's strictly-prior windowed SQL certifies the
    // streaming (lastTs, n, Σ) gap-surprise carry
    "q334_stream_gap_surprise" ->
      QueriesTemporal.oracles("q332_gap_surprise"),

    // likewise: q355's strictly-prior conditional-count SQL
    // certifies the streaming counter registers
    "q356_stream_type_counts" ->
      QueriesTemporal.oracles("q355_expanding_counts"),

    // likewise: q357's first-of-type running-sum SQL certifies the
    // streaming seen-set carry
    "q359_stream_distinct_types" ->
      QueriesTemporal.oracles("q357_expanding_distinct"),

    // likewise: q267's broadcast-matrix SQL certifies the streaming
    // prev-type register + fitted-matrix scoring
    "q360_stream_markov" ->
      QueriesTemporal.oracles("q267_markov_transitions"),

    // likewise: q256's windowed-moment SQL certifies the streaming
    // pairwise-complete corr/beta ring (seventh shared pair)
    "q257_stream_corr" ->
      QueriesTemporal.oracles("q256_rolling_corr"),

    // the one-state-row matrix must land exactly the composed batch
    // plan: literally the q303 composite oracle (fifteenth pair)
    "q313_stream_feature_matrix" ->
      QueriesTemporal.oracles("q303_feature_matrix"),

    // the BigInt OLS registers must land exactly the batch decimal
    // window moments: literally the q299 oracle (fourteenth pair)
    "q300_stream_trend" ->
      QueriesTemporal.oracles("q299_expanding_trend"),

    // the two-long day-streak register must land exactly the batch
    // islands: literally the q280 oracle (thirteenth shared pair)
    "q298_stream_day_streak" ->
      QueriesTemporal.oracles("q280_day_streak"),

    // the O(1) sign/streak recurrence must land exactly the batch
    // carries: literally the q292 oracle (tenth shared pair)
    "q295_stream_monotone" ->
      QueriesTemporal.oracles("q292_monotone_run"),

    // the O(1) session counter must land exactly the batch gap
    // rule: literally the q283 oracle (eleventh shared pair)
    "q296_stream_session_position" ->
      QueriesTemporal.oracles("q283_session_position"),

    // the strictly-prior type registers must land exactly the batch
    // window carries: literally the q285 oracle (twelfth shared pair)
    "q297_stream_recency" ->
      QueriesTemporal.oracles("q285_recency_by_type"),

    // the deque stream must land exactly the batch frame's
    // selections: literally the q37 oracle (eighth shared pair)
    "q269_stream_minmax" ->
      QueriesTemporal.oracles("q37_rolling_rows"),

    // the online Holt fold must land exactly the batch recurrence:
    // literally the q266 oracle (ninth shared pair)
    "q270_stream_holt" ->
      QueriesTemporal.oracles("q266_holt_smooth"),

    // q208's all-pairs Hamming truth certifies the chunked streaming
    // ingest over the persisted phash index (fifth shared pair; same
    // parquet input path, same planted batch)
    "q210_stream_phash_ingest" ->
      QueriesData.oracles("q208_phash_index"),

    // the streaming ingest-verify must land exactly the one-shot
    // verdicts: literally the q220 oracle (same fixture parquet)
    "q225_stream_ingest_verify" ->
      QueriesData.oracles("q220_ingest_verify_e2e"),

    // replay of the stream's EXACT per-user fold (value + s * 0.5^
    // (dt_us/hl_us), in arrival order) as a recursive CTE: identical
    // IEEE operand order, so the match is bit-level before the
    // 6-decimal rounding
    "q147_stream_decayed_feature" ->
      """WITH RECURSIVE seq AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events WHERE value IS NOT NULL
        |),
        |r AS (
        |  SELECT user_id, event_id, rn, tus, value AS s
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT seq.user_id, seq.event_id, seq.rn, seq.tus,
        |    seq.value + r.s * pow(0.5,
        |      CAST(seq.tus - r.tus AS DOUBLE) / 21600000000.0)
        |  FROM r JOIN seq
        |    ON seq.user_id = r.user_id AND seq.rn = r.rn + 1
        |)
        |SELECT event_id, user_id, ROUND(s, 6) AS decayed
        |FROM r ORDER BY 1""".stripMargin,

    // one-shot recomputation of the fixed-range sketch rule the stream
    // folded incrementally: identical binning, bin-ordered cumulative
    // sums, clamped interpolation
    "q125_stream_quantile_sketch" ->
      """WITH v AS (SELECT CAST(user_id AS VARCHAR) AS k, value AS v
        |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
        |hist AS (SELECT k,
        |    CAST(least(greatest(floor((v - 0) / (500.0 / 128)), 0),
        |      127) AS INT) AS b,
        |    CAST(count(*) AS DOUBLE) AS cw
        |  FROM v GROUP BY 1, 2),
        |cum AS (SELECT k, b, cw,
        |    sum(cw) OVER (PARTITION BY k ORDER BY b) AS cum FROM hist),
        |tot AS (SELECT k, sum(cw) AS w FROM hist GROUP BY k),
        |p AS (SELECT CAST(prob AS DOUBLE) AS prob
        |  FROM (VALUES (0.5), (0.9)) t(prob)),
        |tgt AS (SELECT tot.k, p.prob, p.prob * tot.w AS target
        |  FROM tot CROSS JOIN p),
        |hit AS (SELECT t.k, t.prob, t.target, min(c.b) AS b
        |  FROM tgt t JOIN cum c ON c.k = t.k AND c.cum >= t.target
        |  GROUP BY 1, 2, 3)
        |SELECT h.k AS key, h.prob,
        |  ROUND((h.b + greatest(least(
        |    (h.target - (c.cum - c.cw)) / c.cw, 1.0), 0.0)) *
        |    (500.0 / 128), 6) AS value
        |FROM hit h JOIN cum c ON c.k = h.k AND c.b = h.b
        |ORDER BY 1, 2""".stripMargin,

    "q113_stream_ann_enrich" ->
      QueriesData.ivfOracleSql(QueriesData.PinnedIvf.cents,
        nprobe = 2, k = 5),

    "q106_stream_sessionize" ->
      """WITH o AS (SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         IS NULL
        |    OR date_diff('microsecond',
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
        |       >= 1800000000
        |  THEN 1 ELSE 0 END AS brk FROM events),
        |g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  ROUND(SUM(value), 6) AS value_sum
        |FROM g GROUP BY user_id, sid
        |ORDER BY 1, 2""".stripMargin,

    "q107_stream_rolling" ->
      """WITH w AS (SELECT user_id, value,
        |    (epoch_us(ts) // 1800000000 - k.k) * 1800000000 AS ws
        |  FROM events, (VALUES (0), (1)) k(k))
        |SELECT user_id,
        |  make_timestamp(ws) AS window_start,
        |  make_timestamp(ws + 3600000000) AS window_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  ROUND(SUM(value), 6) AS value_sum,
        |  ROUND(AVG(value), 6) AS value_avg
        |FROM w GROUP BY user_id, ws
        |ORDER BY 1, 2""".stripMargin,

    "q108_stream_windowed_topk" ->
      """WITH w AS (SELECT event_type,
        |    epoch_us(ts) // 3600000000 AS wi, value, event_id
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT event_type, wi, value, event_id,
        |  row_number() OVER (PARTITION BY event_type, wi
        |    ORDER BY value DESC, event_id) AS rank FROM w)
        |SELECT event_type,
        |  make_timestamp(wi * 3600000000) AS window_start,
        |  make_timestamp((wi + 1) * 3600000000) AS window_end,
        |  CAST(rank AS INTEGER) AS rank,
        |  ROUND(value, 6) AS score, event_id AS id
        |FROM r WHERE rank <= 3
        |ORDER BY 1, 2, 4""".stripMargin,

    "q109_stream_asof_enrich" ->
      """SELECT CAST(l.user_id AS VARCHAR) AS entity, l.ts,
        |  ROUND(l.value, 6) AS payload,
        |  ROUND(r.purchase_value, 6) AS feature_value,
        |  r.ts AS feature_ts
        |FROM events l ASOF LEFT JOIN
        |  (SELECT user_id, ts, value AS purchase_value
        |   FROM events WHERE event_type = 'purchase') r
        |ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY 1, 2""".stripMargin,

    "q110_stream_phash" ->
      """WITH t AS (SELECT image_id, phash
        |  FROM read_parquet('/tmp/graft_phash_q110/*.parquet'))
        |SELECT a.image_id AS id_a, b.image_id AS id_b,
        |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
        |FROM t a JOIN t b ON a.image_id < b.image_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 3
        |ORDER BY 1, 2""".stripMargin,

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
