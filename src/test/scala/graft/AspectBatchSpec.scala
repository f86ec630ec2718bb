package graft

import graft.multimodal.AspectBatch
import org.apache.spark.sql.Row

class AspectBatchSpec extends SparkSpec {

  test("aspectRatioBatches: integer aspect buckets, per-bucket " +
      "deterministic packing, trailing partial batch kept") {
    // buckets at 250 milli/band: 16:9 (1777 -> 7), 1:1 (1000 -> 4),
    // 9:16 (562 -> 2)
    val rows = Seq(
      Row("i1", 1600, 900), Row("i2", 1920, 1080), Row("i3", 800, 450),
      Row("i4", 512, 512), Row("i5", 256, 256),
      Row("i6", 900, 1600))
    val out = AspectBatch.aspectRatioBatches(
      df("image_id STRING, w INT, h INT", rows),
      "image_id", "w", "h", batchSize = 2)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // (bucket, seq, batch_id, slot); seq follows image_id order
    assert(out("i1") == (7L, 0L, 0L, 0L))
    assert(out("i2") == (7L, 1L, 0L, 1L))
    assert(out("i3") == (7L, 2L, 1L, 0L)) // trailing partial batch
    assert(out("i4") == (4L, 0L, 0L, 0L))
    assert(out("i5") == (4L, 1L, 0L, 1L))
    assert(out("i6") == (2L, 0L, 0L, 0L))
  }

  test("aspectRatioBatches: every batch holds <= batchSize rows and " +
      "slots are dense within a batch") {
    val rows = (0 until 97).map(i =>
      Row(f"img_$i%04d", 100 + (i % 7) * 50, 100))
    val out = AspectBatch.aspectRatioBatches(
      df("image_id STRING, w INT, h INT", rows),
      "image_id", "w", "h", batchSize = 4)
      .collect()
    val byBatch = out.groupBy(r => (r.getLong(3), r.getLong(5)))
    assert(byBatch.values.forall(_.length <= 4))
    byBatch.values.foreach { b =>
      assert(b.map(_.getLong(6)).sorted.toSeq ==
        (0L until b.length).toSeq)
    }
    // bucket-internal seq is contiguous from 0
    out.groupBy(_.getLong(3)).values.foreach { b =>
      assert(b.map(_.getLong(4)).sorted.toSeq ==
        (0L until b.length).toSeq)
    }
  }

  test("bucketResolutions: targets honor the pixel budget, the " +
      "stride multiple, and the bucket's aspect ordering") {
    val rows = Seq(Row("a", 1600, 900), Row("b", 512, 512),
      Row("c", 900, 1600), Row("d", 1920, 1080))
    val out = AspectBatch.bucketResolutions(
      df("image_id STRING, w INT, h INT", rows),
      "w", "h", pixelBudget = 1024L * 1024L, multiple = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(3)))
      .toMap
    // buckets: 7 (16:9 x2), 4 (1:1), 2 (9:16)
    assert(out.keySet == Set(7L, 4L, 2L))
    assert(out(7L)._1 == 2) // n_images
    out.foreach { case (b, (_, aspectMilli, tw, th)) =>
      assert(aspectMilli == b * 250 + 125)
      assert(tw % 64 == 0 && th % 64 == 0 && tw >= 64 && th >= 64)
      assert(tw * th <= 1024L * 1024L, s"bucket $b over budget")
    }
    // wider bucket -> wider target
    assert(out(7L)._3 > out(4L)._3 && out(4L)._3 > out(2L)._3)
    assert(out(2L)._4 > out(4L)._4 && out(4L)._4 > out(7L)._4)
    // hand value: bucket 4 -> aspect 1.125, h = sqrt(2^20*1000/1125)
    val hRaw = math.sqrt(1024.0 * 1024.0 * 1000.0 / 1125.0)
    assert(out(4L)._4 == math.max(64L,
      math.floor(hRaw / 64).toLong * 64))
  }

  test("resizePlan: aspect-preserving scale into the bucket target, " +
      "symmetric letterbox pads, never upscales past the box") {
    val rows = Seq(Row("a", 1600, 900), Row("b", 200, 200),
      Row("c", 900, 1600))
    val out = AspectBatch.resizePlan(
      df("image_id STRING, w INT, h INT", rows),
      "w", "h", pixelBudget = 1024L * 1024L, multiple = 64)
      .collect().map(r => r.getString(0) -> r).toMap
    rows.foreach { row =>
      val r = out(row.getString(0))
      val (w, h) = (row.getInt(1), row.getInt(2))
      val (tw, th) = (r.getLong(4), r.getLong(5))
      val (nw, nh) = (r.getLong(6), r.getLong(7))
      val (px, py) = (r.getLong(8), r.getLong(9))
      assert(nw <= tw && nh <= th, s"${row.getString(0)} over box")
      assert(px == (tw - nw) / 2 && py == (th - nh) / 2)
      // aspect preserved to within a pixel of the exact scale
      val sc = math.min(tw.toDouble / w, th.toDouble / h)
      assert(nw == math.max(1L, math.floor(w * sc).toLong))
      assert(nh == math.max(1L, math.floor(h * sc).toLong))
      // one axis fills (within one floor step of) the target box
      assert(tw - nw <= math.ceil(sc).toLong ||
        th - nh <= math.ceil(sc).toLong)
    }
  }

  test("aspectRatioBatches: null or non-positive dims fail loudly") {
    val bad = df("image_id STRING, w INT, h INT",
      Seq(Row("a", 100, 100), Row("b", 0, 100)))
    val ex = intercept[Exception] {
      AspectBatch.aspectRatioBatches(bad, "image_id", "w", "h", 2)
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("snapToLadder: null or non-positive dims fail loudly instead " +
      "of silently snapping to rung 0") {
    val bad = df("image_id STRING, w INT, h INT",
      Seq(Row("a", 1024, 1024), Row("b", null, 768)))
    val ex = intercept[Exception] {
      AspectBatch.snapToLadder(bad, "image_id", "w", "h",
        Seq((512, 512), (640, 384)), batchSize = 2).collect()
    }
    assert(ex.getMessage != null)
  }

  test("snapToLadder: nearest-ratio snap by exact cross products, " +
      "tie to earliest entry, crop fraction, per-bucket batches") {
    val ladder = Seq((512, 512), (640, 384), (384, 640))
    val rows = Seq(
      Row("i1", 100, 100),  // 1:1 exact -> bucket 0, crop 0
      Row("i2", 160, 96),   // 5:3 = 640:384 exact -> bucket 1, crop 0
      Row("i3", 96, 160),   // 3:5 -> bucket 2, crop 0
      Row("i4", 120, 100),  // 1.2: d0=|120*512-100*512|/512=20,
                            // d1=|120*384-100*640|/384=46.67 -> b0
      Row("i5", 200, 100))  // 2.0: d0=100, d1=|200*384-100*640|/384
                            // = 33.33 -> b1; crop=1-min/max
                            // = 1 - 64000/76800 = 1/6
    val out = AspectBatch.snapToLadder(
      df("image_id STRING, w INT, h INT", rows),
      "image_id", "w", "h", ladder, batchSize = 2)
      .orderBy("image_id")
      .select("image_id", "bucket_idx", "crop_frac", "rank_in_bucket",
        "batch_idx")
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))))
      .toMap
    assert(out("i1")._1 == 0 && out("i1")._2 == 0.0)
    assert(out("i2")._1 == 1 && out("i2")._2 == 0.0)
    assert(out("i3")._1 == 2 && out("i3")._2 == 0.0)
    assert(out("i4")._1 == 0)
    assert(out("i5")._1 == 1)
    assert(out("i5")._2 == 0.166667) // 1 - 64000/76800, 6dp
    // bucket 0 holds i1, i4 in id order -> ranks 0, 1, one batch
    assert(out("i1")._3 == 0L && out("i4")._3 == 1L)
    assert(out("i1")._4 == 0L && out("i4")._4 == 0L)
    // square image, square ladder entries would tie -> earliest wins
    val tie = AspectBatch.snapToLadder(
      df("image_id STRING, w INT, h INT", Seq(Row("t", 50, 50))),
      "image_id", "w", "h", Seq((256, 256), (512, 512)), 4)
      .head()
    assert(tie.getInt(3) == 0)
  }

  test("snapToLadder epochOrder: per-rung ranks are a permutation " +
      "that changes across epochs; non-integral ids rejected") {
    val d = df("id BIGINT, w INT, h INT",
      (1L to 12L).map(i => Row(i, 100, 100)))
    val ladder = Seq((256, 256))
    def ranks(e: Int): Seq[(Long, Long)] =
      AspectBatch.snapToLadder(d, "id", "w", "h", ladder, 4,
        epochOrder = Some(e)).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getAs[Long]("rank_in_bucket"))).toSeq
    val e1 = ranks(1); val e2 = ranks(2)
    // dense 0..11 permutation in one rung, stable on re-run
    assert(e1.map(_._2).sorted == (0L to 11L))
    assert(e1 == ranks(1))
    assert(e1 != e2)
    // static order (no epoch) is plain id order
    val static = AspectBatch.snapToLadder(d, "id", "w", "h", ladder, 4)
      .orderBy("id").collect()
      .map(_.getAs[Long]("rank_in_bucket")).toSeq
    assert(static == (0L to 11L))
    intercept[IllegalArgumentException] {
      AspectBatch.snapToLadder(
        d.selectExpr("CAST(id AS STRING) AS id", "w", "h"),
        "id", "w", "h", ladder, 4, epochOrder = Some(1))
    }
  }

  test("snapToLadder: reserved output column collision fails loudly") {
    val clash = df("image_id STRING, w INT, h INT, crop_frac DOUBLE",
      Seq(Row("a", 10, 10, 0.0)))
    val ex = intercept[IllegalArgumentException] {
      AspectBatch.snapToLadder(clash, "image_id", "w", "h",
        Seq((512, 512)), 2)
    }
    assert(ex.getMessage.contains("crop_frac"))
  }
}
