package graft

import graft.multimodal.{Multimodal, PhashIndex}
import graft.streaming.StreamingOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Persisted phash near-dup index: indexed incremental queries must
  * equal a from-scratch one-shot run, appends must be replay-safe,
  * and the streaming ingest must be chunking-invariant.
  */
class PhashIndexSpec extends SparkSpec {

  private def tmpRoot(): String = java.nio.file.Files
    .createTempDirectory("graft_phashidx_spec").toString

  // corpus: three far-apart hashes; batch: a d=2 twin of id 1, a far
  // row, and a batch-internal d=1 twin of the first twin (d=3 to id 1)
  private val corpusRows = Seq(
    Row(1L, 0x0123456789abcdefL),
    Row(2L, 0x7edcba9876543210L),
    Row(3L, 0x5555555555555555L))
  // NOT ^(-1) of corpus hash 1: its complement is Hamming-1 from
  // corpus hash 2 (near-complements) — a planted "far" row must be
  // far from EVERY fixture hash (min distance 24 here)
  private val batchRows = Seq(
    Row(11L, 0x0123456789abcdefL ^ 257L),
    Row(12L, 0x0F0F0F0F0F0F0F0FL),
    Row(13L, 0x0123456789abcdefL ^ 259L))

  private def corpus = df("id BIGINT, phash BIGINT", corpusRows)
  private def batch = df("id BIGINT, phash BIGINT", batchRows)

  test("batchNearDups equals the one-shot run restricted to pairs " +
      "touching the batch, and never re-bands the corpus") {
    val root = tmpRoot()
    PhashIndex.build(corpus, "id", "phash", root)
    val got = PhashIndex.batchNearDups(batch, "id", "phash", root,
      maxDist = 3)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq
    val oneShot = Multimodal.phashNearDups(
      corpus.unionByName(batch), "id", "phash", maxDist = 3)
      .filter(col("id_b") >= 11L) // pairs touching the batch
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq
    assert(got == oneShot)
    // the planted relations, explicitly
    assert(got == Seq((1L, 11L, 2), (1L, 13L, 3), (11L, 13L, 1)))
  }

  test("appendBatch replay converges (distinct-merge idempotence)") {
    val root = tmpRoot()
    PhashIndex.build(corpus, "id", "phash", root)
    PhashIndex.appendBatch(batch, "id", "phash", root)
    val once = PhashIndex.bands(spark, root).count()
    PhashIndex.appendBatch(batch, "id", "phash", root) // crash redo
    val twice = PhashIndex.bands(spark, root).count()
    assert(once == twice && once == (3 + 3) * 4L)
    // and the absorbed batch now pairs against later arrivals
    val late = df("id BIGINT, phash BIGINT",
      Seq(Row(21L, 0x0123456789abcdefL ^ 256L))) // d=1 to 11, d=2 to 13
    val pairs = PhashIndex.batchNearDups(late, "id", "phash", root,
      maxDist = 3)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq
    assert(pairs == Seq((1L, 21L, 1), (11L, 21L, 1), (13L, 21L, 2)))
  }

  test("guards: non-integral ids and maxDist >= bands fail loudly") {
    val root = tmpRoot()
    val bad = df("id STRING, phash BIGINT", Seq(Row("a", 1L)))
    val e1 = intercept[IllegalArgumentException] {
      PhashIndex.build(bad, "id", "phash", root)
    }
    assert(e1.getMessage.contains("integral id"))
    PhashIndex.build(corpus, "id", "phash", root)
    val e2 = intercept[IllegalArgumentException] {
      PhashIndex.batchNearDups(batch, "id", "phash", root, maxDist = 4)
    }
    assert(e2.getMessage.contains("pigeonhole"))
  }

  test("streaming ingest is chunking-invariant: the union of " +
      "emissions over two micro-batches equals the one-shot answer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpRoot()
    PhashIndex.build(corpus, "id", "phash", root)
    val oneShot = PhashIndex.batchNearDups(batch, "id", "phash",
      tmpRoot2(root), maxDist = 3) // fresh copy of the same index
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    val input = MemoryStream[(Long, Long)]
    val stream = input.toDF().toDF("id", "phash")
    val got = scala.collection.mutable.Set[(Long, Long, Int)]()
    val q = StreamingOps.phashIngestSink(stream, "id", "phash", root,
      maxDist = 3,
      emit = b => {
        got ++= b.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2)))
        ()
      }).start()
    try {
      // the cross-chunk pair (11, 13) must surface as a vs-index pair
      // of chunk 2, after chunk 1's absorption
      input.addData((11L, 0x0123456789abcdefL ^ 257L),
        (12L, 0x0F0F0F0F0F0F0F0FL))
      q.processAllAvailable()
      input.addData((13L, 0x0123456789abcdefL ^ 259L))
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == oneShot)
  }

  test("imageIngestVerifySink: per-micro-batch pixel verdicts — " +
      "stored dup confirms, a cross-chunk pair with no stored payload " +
      "audits decode_ok=false, a new image incurs no candidates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpRoot()
    val imgs = graft.io.ImageTable.imagesReal(spark, 10)
      .withColumn("id", expr("CAST(substring(image_id, 5) AS BIGINT)"))
      .select("id", "bytes", "fmt", "phash")
    PhashIndex.build(imgs.select("id", "phash"), "id", "phash", root)
    val r0 = imgs.orderBy("id").collect().head
    val (b0, f0, p0) =
      (r0.getAs[Array[Byte]](1), r0.getString(2), r0.getLong(3))
    val input = MemoryStream[(Long, Array[Byte], String, Long)]
    val stream = input.toDF().toDF("id", "bytes", "fmt", "phash")
    val got = scala.collection.mutable
      .ArrayBuffer[(Long, Long, Boolean, Boolean)]()
    val q = StreamingOps.imageIngestVerifySink(stream, "id", "phash",
      root, maxDist = 3, payloads = imgs.select("id", "bytes", "fmt"),
      emit = b => {
        got ++= b.select("id_a", "id_b", "decode_ok", "is_dup")
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getBoolean(2), r.getBoolean(3)))
        ()
      }).start()
    try {
      input.addData((100L, b0, f0, p0)) // exact copy of image 0
      q.processAllAvailable()
      // a second copy (finds corpus AND the chunk-1 copy) + a
      // genuinely new phash (complement: far from everything)
      input.addData((201L, b0, f0, p0), (300L, b0, f0, ~p0))
      q.processAllAvailable()
    } finally q.stop()
    val id0 = r0.getLong(0)
    assert(got.exists(v => v == ((id0, 100L, true, true))),
      s"chunk-1 copy must pixel-confirm against the corpus: $got")
    assert(got.exists(v => v == ((id0, 201L, true, true))),
      "chunk-2 copy must pixel-confirm against the corpus")
    assert(got.exists(v => v == ((100L, 201L, false, false))),
      "the cross-chunk pair has no stored payload for id 100 — it " +
        "must audit decode_ok=false, not vanish")
    assert(got.forall(v => v._1 != 300L && v._2 != 300L),
      "a new image must propose no candidates (zero codec work)")
  }

  /** A second root holding the same corpus index, so the one-shot
    * reference query cannot be polluted by the stream's appends.
    */
  private def tmpRoot2(builtRoot: String): String = {
    val r = tmpRoot()
    PhashIndex.build(PhashIndex.bands(spark, builtRoot)
      .select(col("id"), col("phash")).distinct(), "id", "phash", r)
    r
  }
}
