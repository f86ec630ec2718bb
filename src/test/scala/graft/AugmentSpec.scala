package graft

import graft.io.ImageTable
import graft.multimodal.Multimodal
import graft.validate.PixelCheck
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Deterministic augmentation plan + crop materialization.
  *
  * augmentPlan: RNG-free per-(id, epoch) draws — bounds, determinism
  * across partitioning, epoch variation, null-dim quarantine, pure
  * projection (no exchange). cropEncode: golden pixel-exact window
  * copy, pass-through for null plans / out-of-bounds windows /
  * undecodable payloads.
  */
class AugmentSpec extends SparkSpec {

  private def dims(n: Int) = df("id BIGINT, w INT, h INT",
    (0 until n).map(i => Row(i.toLong, 8 + i % 25, 8 + (i * 7) % 25)))

  test("augmentPlan: every window lands inside the image, flip and " +
      "jitter stay in range, clamp engages when the image is smaller " +
      "than the crop") {
    val out = Multimodal.augmentPlan(dims(200), "id", "w", "h",
      epoch = 0, cropW = 24, cropH = 20, flipPct = 35,
      jitterLevels = 5).collect()
    assert(out.length == 200)
    out.foreach { r =>
      val (w, h) = (r.getInt(1), r.getInt(2))
      val (cw, ch) = (r.getInt(3), r.getInt(4))
      val (cx, cy) = (r.getInt(5), r.getInt(6))
      assert(cw == math.min(24, w) && ch == math.min(20, h))
      assert(cx >= 0 && cx + cw <= w, s"x window out of bounds: $r")
      assert(cy >= 0 && cy + ch <= h, s"y window out of bounds: $r")
      assert(r.getInt(8) >= 0 && r.getInt(8) < 5)
    }
    // both flip outcomes and multiple jitter levels occur
    assert(out.map(_.getBoolean(7)).distinct.length == 2)
    assert(out.map(_.getInt(8)).distinct.length >= 3)
    // a clamped row (w < 24) pins crop_x to 0
    assert(out.filter(_.getInt(1) < 24).forall(_.getInt(5) == 0))
  }

  test("augmentPlan: identical plan at any partitioning, different " +
      "plan per epoch") {
    val base = dims(150)
    def plan(d: org.apache.spark.sql.DataFrame, e: Int) =
      Multimodal.augmentPlan(d, "id", "w", "h", epoch = e,
        cropW = 12, cropH = 12).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(3)).toMap
    val a = plan(base, 4)
    assert(plan(base.repartition(13), 4) == a,
      "plan must not depend on partitioning")
    val b = plan(base, 5)
    assert(a.keySet == b.keySet &&
      a.count { case (k, v) => b(k) != v } > 100,
      "epochs must draw different augmentations")
  }

  test("augmentPlan: null or non-positive dims get a null plan row, " +
      "never an exception") {
    val rows = Seq(Row(1L, null, 20), Row(2L, 16, null),
      Row(3L, 0, 20), Row(4L, 16, 16))
    val out = Multimodal.augmentPlan(
      df("id BIGINT, w INT, h INT", rows), "id", "w", "h",
      epoch = 0, cropW = 8, cropH = 8)
      .orderBy("id").collect()
    (0 to 2).foreach { i =>
      (3 to 8).foreach(c => assert(out(i).isNullAt(c),
        s"row ${i + 1} col $c should be a null plan"))
    }
    (3 to 8).foreach(c => assert(!out(3).isNullAt(c)))
  }

  test("augmentPlan: pure projection — no exchange in the plan, and " +
      "guards reject bad args / column collisions") {
    val plan = Multimodal.augmentPlan(dims(10), "id", "w", "h",
      epoch = 1, cropW = 8, cropH = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"augmentPlan shuffled:\n$plan")
    intercept[IllegalArgumentException] {
      Multimodal.augmentPlan(dims(1), "id", "w", "h", 0, 0, 8)
    }
    intercept[IllegalArgumentException] {
      Multimodal.augmentPlan(dims(1), "id", "w", "h", 0, 8, 8,
        flipPct = 101)
    }
    intercept[IllegalArgumentException] {
      Multimodal.augmentPlan(dims(1).withColumn("flip", lit(true)),
        "id", "w", "h", 0, 8, 8)
    }
    intercept[IllegalArgumentException] { // string id
      Multimodal.augmentPlan(
        df("id STRING, w INT, h INT", Seq(Row("a", 8, 8))),
        "id", "w", "h", 0, 8, 8)
    }
  }

  test("cropEncode: golden — the png payload holds EXACTLY the " +
      "plan window's pixels") {
    val imgs = ImageTable.imagesReal(spark, 12, seed = 9)
      .withColumn("id",
        expr("CAST(substring(image_id, 5) AS BIGINT)"))
    val planned = Multimodal.augmentPlan(imgs, "id", "w", "h",
      epoch = 3, cropW = 10, cropH = 7)
    val srcBytes = imgs.select("id", "bytes", "fmt").collect()
      .map(r => r.getLong(0) -> (r.getAs[Array[Byte]](1), r.getString(2)))
      .toMap
    val out = Multimodal.cropEncode(planned,
      "crop_x", "crop_y", "crop_w", "crop_h")
      .select("id", "bytes", "fmt", "w", "h", "crop_x", "crop_y",
        "crop_w", "crop_h").collect()
    assert(out.length == 12)
    out.foreach { r =>
      val (src, srcFmt) = srcBytes(r.getLong(0))
      val orig = PixelCheck.decode(src)
      assert(orig != null && r.getString(2) == "png")
      val crop = PixelCheck.decode(r.getAs[Array[Byte]](1))
      val (cx, cy) = (r.getInt(5), r.getInt(6))
      val (cw, ch) = (r.getInt(7), r.getInt(8))
      assert(crop.getWidth == cw && crop.getHeight == ch)
      assert(r.getInt(3) == cw && r.getInt(4) == ch)
      for (y <- 0 until ch; x <- 0 until cw)
        assert((crop.getRGB(x, y) & 0xffffff) ==
          (orig.getRGB(cx + x, cy + y) & 0xffffff),
          s"pixel ($x,$y) of id ${r.getLong(0)} ($srcFmt) differs")
    }
  }

  test("augmentEncode: golden — flip mirrors the window exactly, " +
      "jitter adds the level's delta with [0,255] clamping") {
    val codec = new PixelCheck.Codec
    val img = new java.awt.image.BufferedImage(8, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 5; x <- 0 until 8) // distinct, clamp-probing
      img.setRGB(x, y, ((x * 37) << 16) | ((y * 50 + 10) << 8) |
        (230 + x * 3))
    val bytes = codec.encode(img, "png")
    val rows = Seq(
      Row(1L, bytes, "png", 8, 5, 2, 1, 4, 3, true, 0),  // flip, -60
      Row(2L, bytes, "png", 8, 5, 2, 1, 4, 3, false, 2)) // +60, clamps
    val out = Multimodal.augmentEncode(
      df("id BIGINT, bytes BINARY, fmt STRING, w INT, h INT, " +
        "crop_x INT, crop_y INT, crop_w INT, crop_h INT, " +
        "flip BOOLEAN, jitter INT", rows),
      "crop_x", "crop_y", "crop_w", "crop_h",
      flipCol = Some("flip"), jitterCol = Some("jitter"),
      jitterDeltas = IndexedSeq(-60, 0, 60))
      .orderBy("id").collect()
    def ch8(v: Int, d: Int) = math.min(255, math.max(0, v + d))
    def expected(x: Int, y: Int, flip: Boolean, d: Int): Int = {
      val sx = if (flip) 2 + (4 - 1 - x) else 2 + x
      val p = img.getRGB(sx, 1 + y)
      (ch8((p >> 16) & 0xff, d) << 16) |
        (ch8((p >> 8) & 0xff, d) << 8) | ch8(p & 0xff, d)
    }
    val flipped = PixelCheck.decode(out(0).getAs[Array[Byte]](1))
    val jittered = PixelCheck.decode(out(1).getAs[Array[Byte]](1))
    assert(flipped.getWidth == 4 && flipped.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 4) {
      assert((flipped.getRGB(x, y) & 0xffffff) ==
        expected(x, y, flip = true, -60), s"flip pixel ($x,$y)")
      assert((jittered.getRGB(x, y) & 0xffffff) ==
        expected(x, y, flip = false, 60), s"jitter pixel ($x,$y)")
    }
  }

  test("augmentEncode: jitter level outside the delta table " +
      "quarantines the row; jitterCol without deltas is rejected") {
    val codec = new PixelCheck.Codec
    val bytes = codec.encode(new java.awt.image.BufferedImage(6, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB), "png")
    val rows = Seq(Row(1L, bytes, "png", 6, 6, 0, 0, 4, 4, 7))
    val out = Multimodal.augmentEncode(
      df("id BIGINT, bytes BINARY, fmt STRING, w INT, h INT, " +
        "crop_x INT, crop_y INT, crop_w INT, crop_h INT, jitter INT",
        rows),
      "crop_x", "crop_y", "crop_w", "crop_h",
      jitterCol = Some("jitter"), jitterDeltas = IndexedSeq(-20, 0))
      .collect()
    assert(out(0).getInt(3) == 6 && out(0).getInt(4) == 6,
      "out-of-table level must pass the row through unchanged")
    intercept[IllegalArgumentException] {
      Multimodal.augmentEncode(
        df("id BIGINT, bytes BINARY, fmt STRING, w INT, h INT, " +
          "crop_x INT, crop_y INT, crop_w INT, crop_h INT, jitter INT",
          rows),
        "crop_x", "crop_y", "crop_w", "crop_h",
        jitterCol = Some("jitter"))
    }
  }

  test("cropEncode: pass-through for null plans, out-of-bounds " +
      "windows and undecodable payloads — rows quarantine, jobs " +
      "never die") {
    val codec = new PixelCheck.Codec
    val img = new java.awt.image.BufferedImage(6, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val good = codec.encode(img, "png")
    val rows = Seq(
      Row(1L, good, "png", 6, 6, null, 0, 4, 4), // null plan
      Row(2L, good, "png", 6, 6, 4, 0, 4, 4), // x+cw > decoded w
      Row(3L, Array[Byte](1, 2, 3), "png", 6, 6, 0, 0, 4, 4), // bad bytes
      Row(4L, good, "png", 6, 6, 1, 1, 4, 4)) // the one real crop
    val out = Multimodal.cropEncode(
      df("id BIGINT, bytes BINARY, fmt STRING, w INT, h INT, " +
        "crop_x INT, crop_y INT, crop_w INT, crop_h INT", rows),
      "crop_x", "crop_y", "crop_w", "crop_h")
      .orderBy("id").collect()
    // quarantined rows come back byte-identical
    Seq(0, 1, 2).foreach { i =>
      assert(out(i).getInt(3) == 6 && out(i).getInt(4) == 6)
      assert(java.util.Arrays.equals(out(i).getAs[Array[Byte]](1),
        rows(i).getAs[Array[Byte]](1)))
    }
    assert(out(3).getInt(3) == 4 && out(3).getInt(4) == 4)
    val cropped = PixelCheck.decode(out(3).getAs[Array[Byte]](1))
    assert(cropped.getWidth == 4 && cropped.getHeight == 4)
  }

  test("orientEncode: golden pixel mapping for all 8 EXIF tags") {
    val codec = new PixelCheck.Codec
    val img = new java.awt.image.BufferedImage(4, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 4) // fully asymmetric pattern
      img.setRGB(x, y, (x << 16) | (y << 8) | (x * 3 + y))
    val bytes = codec.encode(img, "png")
    val plans = Seq( // tag -> (flip_h, rot_cw) per the EXIF table
      (1, false, 0), (2, true, 0), (3, false, 180), (4, true, 180),
      (5, true, 90), (6, false, 90), (7, true, 270), (8, false, 270))
    val rows = plans.map { case (t, f, r) =>
      Row(t.toLong, bytes, "png", 4, 3, f, r) }
    val out = Multimodal.orientEncode(
      df("id BIGINT, bytes BINARY, fmt STRING, w INT, h INT, " +
        "flip_h BOOLEAN, rot_cw INT", rows),
      "flip_h", "rot_cw").orderBy("id").collect()
    // reference model: display(x,y) = stored(T_tag^{-1}(x,y))
    def src(tag: Int, x: Int, y: Int): (Int, Int) = {
      val (fx, fy) = tag match {
        case 1 | 2 => (x, y)
        case 3 | 4 => (3 - x, 2 - y)
        case 5 | 6 => (y, 2 - x)
        case _ => (3 - y, x)
      }
      (if (Set(2, 4, 5, 7)(tag)) 3 - fx else fx, fy)
    }
    out.foreach { r =>
      val tag = r.getLong(0).toInt
      val swapped = tag >= 5
      val (ow, oh) = if (swapped) (3, 4) else (4, 3)
      assert(r.getInt(3) == ow && r.getInt(4) == oh, s"tag $tag dims")
      val dec = PixelCheck.decode(r.getAs[Array[Byte]](1))
      for (y <- 0 until oh; x <- 0 until ow) {
        val (sx, sy) = src(tag, x, y)
        assert((dec.getRGB(x, y) & 0xffffff) ==
          (img.getRGB(sx, sy) & 0xffffff),
          s"tag $tag pixel ($x,$y) from ($sx,$sy)")
      }
    }
  }

  test("orientEncode: flip variants are involutions, rotations undo " +
      "with the complement; invalid rotation quarantines") {
    val codec = new PixelCheck.Codec
    val img = new java.awt.image.BufferedImage(5, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 5)
      img.setRGB(x, y, (x * 40 << 16) | (y * 60 << 8) | (x + y))
    val bytes = codec.encode(img, "png")
    val rows = Seq(Row(5L, bytes, "png", 5, 4, true, 90),
      Row(6L, bytes, "png", 5, 4, false, 90),
      Row(99L, bytes, "png", 5, 4, false, 45)) // invalid rotation
    val d = df("id BIGINT, bytes BINARY, fmt STRING, w INT, h INT, " +
      "flip_h BOOLEAN, rot_cw INT", rows)
    val once = Multimodal.orientEncode(d, "flip_h", "rot_cw")
    val back = Multimodal.orientEncode(
      once.withColumn("rot_inv",
        when(col("flip_h"), col("rot_cw"))
          .otherwise(pmod(lit(360) - col("rot_cw"), lit(360)))
          .cast("int")),
      "flip_h", "rot_inv").orderBy("id").collect()
    back.take(2).foreach { r =>
      assert(r.getInt(3) == 5 && r.getInt(4) == 4)
      val dec = PixelCheck.decode(r.getAs[Array[Byte]](1))
      for (y <- 0 until 4; x <- 0 until 5)
        assert((dec.getRGB(x, y) & 0xffffff) ==
          (img.getRGB(x, y) & 0xffffff),
          s"id ${r.getLong(0)} round-trip pixel ($x,$y)")
    }
    // rot 45 quarantined byte-identically through BOTH passes
    assert(java.util.Arrays.equals(back(2).getAs[Array[Byte]](1), bytes))
  }
}
