package graft

import graft.multimodal.{Batching, Multimodal}
import graft.text.Sharding
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class BatchingSpec extends SparkSpec {

  // ---------------------------------------------------------------
  // waterFill (driver-side exact allocation)
  // ---------------------------------------------------------------

  test("waterFill: level, saturation, leftover bump, determinism") {
    // counts 25,25,167,250 budget 200: loop -> c=50 after the 25s,
    // cand = (200-50)/2 = 75 < 167 -> L=75, f=200, leftover 0
    val q1 = Sharding.waterFill(
      Seq("a" -> 25L, "b" -> 25L, "big" -> 167L, "huge" -> 250L), 200L)
    assert(q1 == Map("a" -> 25L, "b" -> 25L, "big" -> 75L,
      "huge" -> 75L))
    // budget 201 -> leftover 1 goes to the LARGEST unsaturated (huge)
    val q2 = Sharding.waterFill(
      Seq("a" -> 25L, "b" -> 25L, "big" -> 167L, "huge" -> 250L), 201L)
    assert(q2 == Map("a" -> 25L, "b" -> 25L, "big" -> 75L,
      "huge" -> 76L))
    // tie on count -> source name asc gets the bump
    val q3 = Sharding.waterFill(Seq("z" -> 10L, "y" -> 10L), 7L)
    assert(q3 == Map("y" -> 4L, "z" -> 3L))
    // budget >= corpus keeps everything
    assert(Sharding.waterFill(Seq("a" -> 3L, "b" -> 5L), 100L) ==
      Map("a" -> 3L, "b" -> 5L))
    // budget below m: level 0, bumps hand out single docs
    assert(Sharding.waterFill(
      Seq("a" -> 9L, "b" -> 7L, "c" -> 5L), 2L) ==
      Map("a" -> 1L, "b" -> 1L, "c" -> 0L))
    intercept[IllegalArgumentException] {
      Sharding.waterFill(Seq("a" -> 1L), 0L)
    }
  }

  test("waterFill: allocation always sums to min(budget, total) and " +
    "never exceeds any source") {
    val counts = Seq("a" -> 1L, "b" -> 2L, "c" -> 40L, "d" -> 7L,
      "e" -> 7L, "f" -> 0L, "g" -> 13L)
    val total = counts.map(_._2).sum
    for (b <- 1L to total + 5L) {
      val q = Sharding.waterFill(counts, b)
      assert(q.values.sum == math.min(b, total), s"budget $b")
      counts.foreach { case (s, n) =>
        assert(q(s) <= n, s"budget $b source $s")
      }
      // max-min fairness: a source got less than its count only if
      // its quota is >= every smaller source's quota
      val qs = counts.map { case (s, n) => (n, q(s)) }
      qs.filter { case (n, qq) => qq < n }.foreach { case (_, qq) =>
        assert(qs.forall { case (_, other) => other <= qq + 1 },
          s"budget $b: unsaturated quota $qq not maximal")
      }
    }
  }

  test("sourceQuota: keeps the per-source doc_id-ascending prefix") {
    val d = df("doc_id BIGINT, source STRING",
      (1L to 9L).map(i => Row(i, "big")) ++
        Seq(Row(20L, "small"), Row(21L, "small")))
    // budget 5: level (5-0)/2=2 < 9? sorted: small 2, big 9.
    // j=0: cand=2 >= 2 -> c=2; j=1: cand=3 < 9 -> L=3, leftover 0
    val kept = Sharding.sourceQuota(d, "source", "doc_id", 5L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(kept == Seq((1L, "big", 0L), (2L, "big", 1L),
      (3L, "big", 2L), (20L, "small", 0L), (21L, "small", 1L)))
    // plan surface agrees
    val plan = Sharding.sourceQuotaPlan(d, "source", 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(plan.toSeq == Seq(("big", 9L, 3L), ("small", 2L, 2L)))
  }

  // ---------------------------------------------------------------
  // contrastiveBatches
  // ---------------------------------------------------------------

  test("contrastiveBatches: no two same-cluster rows share a batch") {
    // clusters of sizes 5,3,1 over 9 rows, batchSize 3 ->
    // num_batches = max(ceil(9/3), 5) = 5
    val rows = Seq(
      Row(1L, 10L), Row(2L, 10L), Row(3L, 10L), Row(4L, 10L),
      Row(5L, 10L), Row(6L, 11L), Row(7L, 11L), Row(8L, 11L),
      Row(9L, 12L))
    val d = df("id BIGINT, cluster BIGINT", rows)
    val out = Batching.contrastiveBatches(d, "id", "cluster", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // guarantee: within a cluster all batches distinct
    out.groupBy(_._2).foreach { case (c, g) =>
      assert(g.map(_._4).distinct.size == g.size, s"cluster $c collided")
    }
    // batches stay in range
    assert(out.forall(r => r._4 >= 0 && r._4 < 5))
    // the Latin-square values themselves: batch = (slot + c mod 5) mod 5
    out.foreach { case (_, c, slot, b) =>
      assert(b == (slot + c % 5) % 5)
    }
  }

  test("contrastiveBatches: guards and empty input") {
    val d = df("id BIGINT, cluster BIGINT", Seq(Row(1L, 1L)))
    intercept[IllegalArgumentException] {
      Batching.contrastiveBatches(d, "id", "cluster", 0)
    }
    intercept[IllegalArgumentException] {
      Batching.contrastiveBatches(
        d.withColumn("slot", lit(1L)), "id", "cluster", 2)
    }
    intercept[IllegalArgumentException] { // string cluster rejected
      Batching.contrastiveBatches(
        df("id BIGINT, cluster STRING", Seq(Row(1L, "x"))),
        "id", "cluster", 2)
    }
    val empty = df("id BIGINT, cluster BIGINT", Seq.empty)
    assert(Batching.contrastiveBatches(empty, "id", "cluster", 4)
      .count() == 0)
  }

  // ---------------------------------------------------------------
  // captionPadBatches
  // ---------------------------------------------------------------

  test("captionPadBatches: buckets, ranks, batch cut, pad accounting") {
    val d = df("id BIGINT, cap STRING", Seq(
      Row(1L, "a b c"),            // 3 tokens -> bucket 8
      Row(2L, "one two"),          // 2 -> bucket 8
      Row(3L, "w x y z q r s t u"),// 9 -> bucket 16
      Row(4L, "k"),                // 1 -> bucket 8
      Row(5L, "exactly eight words in this caption right here"))) // 8 -> 8
    val out = Batching.captionPadBatches(d, "id", "cap",
      multiple = 8, batchSize = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // (id, tokens, bucket_len, rank, batch, pad)
    assert(out == Seq(
      (1L, 3L, 8L, 0L, 0L, 5L),
      (2L, 2L, 8L, 1L, 0L, 6L),
      (3L, 9L, 16L, 0L, 0L, 7L),
      (4L, 1L, 8L, 2L, 1L, 7L),
      (5L, 8L, 8L, 3L, 1L, 0L)))
  }

  test("captionPadBatches: exact multiple stays unpadded; guards") {
    val d = df("id BIGINT, cap STRING", Seq(Row(1L, "a b c d")))
    val r = Batching.captionPadBatches(d, "id", "cap", 4, 8).collect()(0)
    assert(r.getLong(2) == 4L && r.getLong(6) == 0L)
    intercept[IllegalArgumentException] {
      Batching.captionPadBatches(d, "id", "cap", 0, 8)
    }
    intercept[IllegalArgumentException] {
      Batching.captionPadBatches(
        d.withColumn("tokens", lit(1L)), "id", "cap", 8, 8)
    }
  }

  // ---------------------------------------------------------------
  // exifNormalizePlan
  // ---------------------------------------------------------------

  test("exifNormalizePlan: the published EXIF table, dim swap, " +
    "invalid tags -> null plan") {
    val d = df("id BIGINT, o INT, w INT, h INT",
      (1 to 8).map(o => Row(o.toLong, o, 640, 480)) ++
        Seq(Row(90L, 0, 640, 480), Row(91L, 9, 640, 480),
          Row(92L, null, 640, 480)))
    val out = Batching.exifNormalizePlan(d, "o", "w", "h")
      .orderBy("id").collect()
    val plans = out.take(8).map(r =>
      (r.getBoolean(4), r.getInt(5), r.getInt(6), r.getInt(7)))
    assert(plans.toSeq == Seq(
      (false, 0, 640, 480),   // 1 upright
      (true, 0, 640, 480),    // 2 mirror
      (false, 180, 640, 480), // 3 upside down
      (true, 180, 640, 480),  // 4 vertical flip
      (true, 90, 480, 640),   // 5 transpose
      (false, 90, 480, 640),  // 6 rotate 90 CW
      (true, 270, 480, 640),  // 7 transverse
      (false, 270, 480, 640)))// 8 rotate 270 CW
    out.drop(8).foreach { r =>
      assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6) &&
        r.isNullAt(7), s"tag ${r.get(1)} must yield a null plan")
    }
  }

  // ---------------------------------------------------------------
  // decontaminateImages / captionBoilerplate
  // ---------------------------------------------------------------

  test("decontaminateImages: banded cross-set flags agree with " +
    "exhaustive Hamming; counts are distinct-eval") {
    val corpus = df("id BIGINT, ph BIGINT", Seq(
      Row(1L, 1024L),   // dist 1 from eval 1025L only
      Row(2L, 255L),    // dist >= 4 from every eval -> clean
      Row(3L, 12L)))    // exact eval dup AND dist-2 eval -> 2 matches
    val evalSet = df("id BIGINT, ph BIGINT", Seq(
      Row(10L, 1025L), Row(11L, 12L), Row(12L, 15L)))
    val out = Multimodal.decontaminateImages(corpus, evalSet,
      "id", "ph", maxDist = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3), r.getLong(2))).toSeq
    // id3: eval 12L at dist 0 and eval 15L at dist 2 -> 2 matches
    assert(out == Seq((1L, true, 1L), (2L, false, 0L),
      (3L, true, 2L)))
    intercept[IllegalArgumentException] { // pigeonhole violated
      Multimodal.decontaminateImages(corpus, evalSet, "id", "ph",
        maxDist = 4, bands = 4)
    }
    intercept[IllegalArgumentException] { // output collision
      Multimodal.decontaminateImages(
        corpus.withColumn("contaminated", lit(true)),
        evalSet, "id", "ph", 2)
    }
  }

  test("captionBoilerplate: normalization pools variants, boundary " +
    "at maxRepeats, null/empty flagged with count 0") {
    val d = df("id BIGINT, cap STRING", Seq(
      Row(1L, "Click HERE"), Row(2L, "  click   here "),
      Row(3L, "click here"),           // 3 pooled -> == max, clean
      Row(4L, "BUY now"), Row(5L, "buy  NOW"),
      Row(6L, "Buy Now"), Row(7L, "buy now"), // 4 pooled -> flagged
      Row(8L, "a real caption"),       // unique -> clean
      Row(9L, null), Row(10L, "   "))) // no supervision -> flagged
    val out = Multimodal.captionBoilerplate(d, "id", "cap",
      maxRepeats = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSeq
    assert(out == Seq(
      (1L, 3L, false), (2L, 3L, false), (3L, 3L, false),
      (4L, 4L, true), (5L, 4L, true), (6L, 4L, true), (7L, 4L, true),
      (8L, 1L, false), (9L, 0L, true), (10L, 0L, true)))
    intercept[IllegalArgumentException] {
      Multimodal.captionBoilerplate(d, "id", "cap", 0)
    }
  }

  test("alignmentGate: quantized cosine; null/zero-norm/dim-mismatch " +
    "gate false (never null); threshold boundary is inclusive") {
    val d = df("id BIGINT, a ARRAY<FLOAT>, b ARRAY<FLOAT>", Seq(
      Row(1L, Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),        // cos 1
      Row(2L, Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),        // cos 0
      Row(3L, Seq(1.0f, 0.0f), Seq(1.0f, 1.0f)),        // 1/sqrt(2)
      Row(4L, Seq(1.0f, 0.0f), null),                   // null side
      Row(5L, Seq(1.0f, 0.0f), Seq(0.0f, 0.0f)),        // zero norm
      Row(6L, Seq(1.0f, 0.0f), Seq(1.0f, 0.0f, 0.0f)))) // dim clash
    val out = Multimodal.alignmentGate(d, "a", "b", minCos = 0.5)
      .orderBy("id").collect()
      .map(r => (if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getBoolean(4))).toSeq
    assert(out.map(_._2) === Seq(true, false, true, false, false,
      false))
    assert(out(0)._1.contains(1.0) && out(1)._1.contains(0.0))
    assert(math.abs(out(2)._1.get - 1.0 / math.sqrt(2.0)) < 1e-12)
    assert(out(3)._1.isEmpty && out(4)._1.isEmpty &&
      out(5)._1.isEmpty)
    // >= threshold, not >: a pair at exactly minCos passes
    val boundary = Multimodal.alignmentGate(d, "a", "b", minCos = 1.0)
      .orderBy("id").collect().map(_.getBoolean(4)).toSeq
    assert(boundary === Seq(true, false, false, false, false, false))
    intercept[IllegalArgumentException] {
      Multimodal.alignmentGate(d.withColumn("aligned", lit(true)),
        "a", "b", 0.5)
    }
  }

  test("alignmentGateAdaptive: per-source np.interp quantile is the " +
    "gate; null alignments don't poison calibration; a source with " +
    "no scorable rows gates everything false") {
    // source s1: alignments 0.0, ~0.7071, 1.0 (plus one null pair
    // that must not affect the quantile); q=0.5 -> np.interp median
    // over {0, 0.7071, 1} with equal weights: f = 1/3, 2/3, 1 ->
    // interp at 0.5 between (1/3, 0) and (2/3, 0.70710678) = 0.3536
    val d = df("id BIGINT, s STRING, a ARRAY<FLOAT>, b ARRAY<FLOAT>",
      Seq(
        Row(1L, "s1", Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
        Row(2L, "s1", Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
        Row(3L, "s1", Seq(1.0f, 0.0f), Seq(1.0f, 1.0f)),
        Row(4L, "s1", Seq(1.0f, 0.0f), null),
        Row(5L, "s2", Seq(1.0f, 0.0f), null))) // s2: nothing scorable
    val out = Multimodal.alignmentGateAdaptive(d, "s", "a", "b", 0.5)
      .orderBy("id").collect()
      .map(r => (if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getBoolean(6))).toSeq
    val expThr = 0.0 + (0.5 - 1.0 / 3) / (1.0 / 3) *
      (1.0 / math.sqrt(2.0))
    assert(out.take(4).flatMap(_._1).forall(t =>
      math.abs(t - expThr) < 1e-9))
    assert(out.map(_._2) === Seq(true, false, true, false, false))
    assert(out(4)._1.isEmpty) // s2 has no threshold
    intercept[IllegalArgumentException] {
      Multimodal.alignmentGateAdaptive(d, "s", "a", "b", 1.5)
    }
  }

  test("exifNormalizePlan: involution sanity — applying the plan to " +
    "the output dims restores originals for the rotation family") {
    // 90/270 rotations swap dims; applying the same swap twice is the
    // identity (the dims-level involution the materializer relies on)
    val d = df("id BIGINT, o INT, w INT, h INT",
      Seq(Row(1L, 6, 300, 200)))
    val once = Batching.exifNormalizePlan(d, "o", "w", "h")
      .select(col("id"), col("o"), col("out_w").as("w"),
        col("out_h").as("h"))
    val twice = Batching.exifNormalizePlan(once, "o", "w", "h")
      .collect()(0)
    assert(twice.getInt(6) == 300 && twice.getInt(7) == 200)
  }
}
