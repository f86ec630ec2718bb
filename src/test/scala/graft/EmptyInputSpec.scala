package graft

import graft.dedup.{Components, Dedup}
import graft.operators.GroupOps
import graft.text.{Sharding, TextOps}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Empty-in behavior of the round-2 operators — the reference's
  * empty-frame contract (tests/base_tests.py) extended to the engine
  * ops: no crashes, schema preserved, empty (or a well-defined
  * degenerate row) out.
  */
class EmptyInputSpec extends SparkSpec {

  private def emptyDocs() =
    df("doc_id BIGINT, text STRING, lang STRING", Seq.empty)

  test("connected components of an empty edge list") {
    val e = df("a BIGINT, b BIGINT", Seq.empty)
    assert(Components.connectedComponents(e, "a", "b").count() == 0)
    val data = df("id BIGINT, v STRING", Seq(Row(1L, "x")))
    // no edges -> everything survives
    assert(Components.dedupByComponents(data, "id", e, "a", "b")
      .count() == 1)
  }

  test("topK / standardize / robust-scale / pct-rank on empty input") {
    val d = df("g STRING, id BIGINT, s DOUBLE", Seq.empty)
    assert(GroupOps.topKPerGroup(d, Seq("g"), "s", "id", 3)
      .count() == 0)
    val e = df("k STRING, x DOUBLE", Seq.empty)
    assert(GroupOps.standardizeByGroup(e, "k", Seq("x")).count() == 0)
    assert(GroupOps.robustScaleByGroup(e, "k", "x").count() == 0)
    assert(GroupOps.percentileRankByGroup(e, "k", "x").count() == 0)
    assert(GroupOps.capByGroupQuantiles(e, "k", "x", 0.1, 0.9)
      .count() == 0)
  }

  test("oofMeanResponse on empty input (prior 0 and > 0)") {
    val d = df("id BIGINT, k STRING, y DOUBLE", Seq.empty)
    assert(GroupOps.oofMeanResponse(d, "k", "y", "id", 4).count() == 0)
    assert(GroupOps.oofMeanResponse(d, "k", "y", "id", 4, prior = 2.0)
      .count() == 0)
  }

  test("sharding ops on empty input") {
    val d = df("id BIGINT, tok BIGINT", Seq.empty)
    assert(Sharding.packShards(d, "id", "tok", 100L).count() == 0)
    val s = df("id BIGINT, lang STRING", Seq.empty)
    assert(Sharding.stratifiedSample(s, "lang", "id",
      Map("en" -> 0.5)).count() == 0)
    assert(Sharding.sampleExactPerStratum(s, "lang", "id", 3)
      .count() == 0)
  }

  test("text ops on empty input") {
    assert(TextOps.tfidf(emptyDocs(), "doc_id", "text").count() == 0)
    assert(TextOps.vocabulary(emptyDocs(), "text").count() == 0)
    assert(TextOps.repetitionScores(emptyDocs(), "doc_id", "text")
      .count() == 0)
    assert(TextOps.contamination(emptyDocs(), emptyDocs(),
      "doc_id", "text").count() == 0)
    // report on an empty corpus: one row, zero counts, null-ish stats
    val r = TextOps.corpusReport(emptyDocs(), "text", "lang").head()
    assert(r.getAs[Long]("n_docs") == 0L)
    assert(r.getAs[Long]("n_langs") == 0L)
  }

  test("minhash near-dups / bandRows on empty input") {
    assert(Dedup.minhashNearDups(emptyDocs(), "doc_id", "text", 0.5)
      .count() == 0)
    assert(Dedup.bandRows(emptyDocs(), "doc_id", "text").count() == 0)
  }

  test("bloom decontamination on empty corpus / empty eval set") {
    val fps = df("test_id BIGINT, fp BIGINT", Seq.empty)
    // empty eval set: a degenerate bloom rejects everything — nothing
    // is contaminated, nothing crashes
    val docs = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "some ordinary document text that is long enough here")))
    assert(TextOps.contaminationBloom(docs, fps, "doc_id", "text")
      .count() == 0)
    // empty corpus against a real eval set
    val test = df("doc_id BIGINT, text STRING", Seq(
      Row(9L, "some ordinary document text that is long enough here")))
    val realFps = TextOps.winnowFingerprints(test, "doc_id", "text")
      .withColumnRenamed("doc_id", "test_id")
    assert(TextOps.contaminationBloom(
      df("doc_id BIGINT, text STRING", Seq.empty), realFps,
      "doc_id", "text").count() == 0)
  }

  test("IVF-PQ search with empty query set and pinned models") {
    import graft.ann.Knn
    val cents = Array(Array.fill(4)(0.5), Array.fill(4)(-0.5))
    val ivf = Knn.IvfModel(cents)
    val pq = Knn.PqModel(2, 2,
      Array(Array(Array(0.5, 0.5), Array(-0.5, -0.5)),
        Array(Array(0.5, 0.5), Array(-0.5, -0.5))))
    val corpus = df("id BIGINT, embedding ARRAY<FLOAT>", Seq(
      Row(1L, Seq(0.5f, 0.5f, 0.5f, 0.5f))))
    val noQueries = df("id BIGINT, embedding ARRAY<FLOAT>", Seq.empty)
    assert(Knn.ivfPqTopK(ivf, pq, corpus, noQueries, "id",
      "embedding", "id", k = 1, nprobe = 1, shortlist = 1)
      .count() == 0)
    // and an empty corpus still answers (zero hits) for a real query
    assert(Knn.ivfPqTopK(ivf, pq, noQueries, corpus, "id",
      "embedding", "id", k = 1, nprobe = 1, shortlist = 1)
      .count() == 0)
  }

  test("hashed TF / payload audit / histogram sketch on empty input") {
    assert(TextOps.hashedTfVector(emptyDocs(), "doc_id", "text", 16)
      .count() == 0)
    val imgs = df("image_id STRING, bytes BINARY, w INT, h INT, " +
      "fmt STRING, caption STRING, phash BIGINT", Seq.empty)
    assert(graft.multimodal.Multimodal.auditPayloads(imgs, seed = 42)
      .count() == 0)
    val r = graft.core.Sketch.histQuantilesMelted(
      df("x DOUBLE", Seq.empty), Map("x" -> Seq(0.5)), lit(1.0), 64)
    assert(r("x") == Seq(None))
    assert(graft.core.Sketch.groupedHistQuantiles(
      df("k STRING, x DOUBLE", Seq.empty), "k", "x", Seq(0.5))
      .count() == 0)
  }

  test("transcode / averageHash on empty input") {
    val imgs = df("image_id STRING, bytes BINARY, w INT, h INT, " +
      "fmt STRING, caption STRING, phash BIGINT", Seq.empty)
    assert(graft.multimodal.Multimodal.transcode(imgs, "png")
      .count() == 0)
    assert(graft.multimodal.Multimodal.averageHash(imgs).count() == 0)
    assert(graft.multimodal.Multimodal.differenceHash(imgs)
      .count() == 0)
    assert(graft.multimodal.Multimodal.lumaStats(imgs).count() == 0)
    val tiles = graft.multimodal.Multimodal.tileAverageHash(imgs)
    val fps = graft.multimodal.Multimodal.tileFingerprint(imgs)
    assert(tiles.count() == 0 && fps.count() == 0)
    assert(graft.multimodal.Multimodal.cropNearDups(tiles, "image_id",
      df("crop_id STRING, ahash BIGINT", Seq.empty), "crop_id",
      "ahash", maxDist = 0).count() == 0)
    assert(graft.multimodal.Multimodal.cropExactDups(fps, "image_id",
      df("crop_id STRING, crop_fp BIGINT", Seq.empty), "crop_id",
      "crop_fp").count() == 0)
  }

  test("lshTopK with default planes: empty / all-null-vector corpus " +
      "answers empty instead of crashing") {
    import graft.ann.Knn
    val queries = df("id BIGINT, embedding ARRAY<FLOAT>", Seq(
      Row(1L, Seq(0.5f, 0.5f))))
    val empty = df("id BIGINT, embedding ARRAY<FLOAT>", Seq.empty)
    assert(Knn.lshTopK(empty, queries, "id", "embedding", "id", k = 3)
      .count() == 0)
    val allNull = df("id BIGINT, embedding ARRAY<FLOAT>",
      Seq(Row(2L, null)))
    assert(Knn.lshTopK(allNull, queries, "id", "embedding", "id",
      k = 3).count() == 0)
  }

  test("ivfTopK: empty corpus answers empty (same contract as " +
      "lshTopK); builds accept array<double> vectors") {
    import graft.ann.Knn
    val queries = df("id BIGINT, embedding ARRAY<FLOAT>", Seq(
      Row(1L, Seq(0.5f, 0.5f))))
    val empty = df("id BIGINT, embedding ARRAY<FLOAT>", Seq.empty)
    assert(Knn.ivfTopK(empty, queries, "id", "embedding", "id",
      k = 3, nlist = 2, nprobe = 1).count() == 0)
    // array<double> corpus: the seed collect used to ClassCastException
    val dbl = df("id BIGINT, embedding ARRAY<DOUBLE>",
      (1L to 8L).map(i => Row(i, Seq(i.toDouble, (9 - i).toDouble))))
    val qd = df("id BIGINT, embedding ARRAY<DOUBLE>",
      Seq(Row(100L, Seq(8.0, 1.0))))
    val top = Knn.ivfTopK(dbl, qd, "id", "embedding", "id",
      k = 1, nlist = 2, nprobe = 2)
      .collect().map(r => r.getAs[Long]("item_id"))
    assert(top.length == 1 && top.head == 8L)
  }

  test("span dedup / cms / split / weighted sample on empty input") {
    val d = emptyDocs()
    assert(graft.text.SpanDedup.duplicatedSpans(d, "doc_id", "text", 8)
      .count() == 0)
    assert(graft.text.SpanDedup
      .removeDuplicatedSpans(d, "doc_id", "text", 8).count() == 0)
    val noItems = df("item STRING", Seq.empty)
    val counters = graft.core.Sketch.cmsCounters(noItems, "item", 4, 64)
    assert(counters.count() == 0)
    assert(graft.core.Sketch.cmsEstimate(counters, noItems, "item",
      4, 64).count() == 0)
    assert(graft.text.Sharding.hashSplit(d, "doc_id", "s",
      Seq("train" -> 100)).count() == 0)
    assert(graft.text.Sharding.weightedSamplePerGroup(
      df("g STRING, id BIGINT, w DOUBLE", Seq.empty),
      "g", "id", "w", 5).count() == 0)
    // DSIR: empty source yields an empty sample; the ratio table stays
    // total (width rows of pure smoothing mass) on empty corpora
    assert(graft.text.Dsir.importanceTable(d, d, "text", 16)
      .count() == 16)
    assert(graft.text.Dsir.dsirSample(d, d, "doc_id", "text", 16, 5)
      .count() == 0)
    val noSrc = df("source STRING, lang STRING, text STRING", Seq.empty)
    assert(graft.text.TextOps.sourceReportCard(noSrc,
      "source", "text", "lang").count() == 0)
  }

  test("grouped sketch emits the prob=1.0 row even when fractional " +
      "weights leave the cumulative sum an ulp short") {
    // w = 0.1 sums associate differently raw-side vs bin-side; the
    // last-bin fallback must keep (key, 1.0) in the output
    val rows = (0 until 1000).map(i => Row("k", i / 999.0, 0.1))
    val out = graft.core.Sketch.groupedHistQuantiles(
      df("k STRING, v DOUBLE, w DOUBLE", rows), "k", "v",
      Seq(0.5, 1.0), bins = 64,
      weight = org.apache.spark.sql.functions.col("w"))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(out.keySet == Set(0.5, 1.0))
    assert(math.abs(out(1.0) - 1.0) <= 1.0 / 64 + 1e-9)
  }

  test("round-5 gating/fallback ops on empty input: schema kept, " +
      "zero rows, no crash") {
    import graft.multimodal.Multimodal
    import graft.temporal.AsOfJoin
    val emb = df("id BIGINT, a ARRAY<FLOAT>, b ARRAY<FLOAT>",
      Seq.empty)
    val gated = Multimodal.alignmentGate(emb, "a", "b", 0.5)
    assert(gated.count() == 0 && gated.columns.toSeq ===
      Seq("id", "a", "b", "alignment", "aligned"))

    val spine = df("e STRING, g STRING, ts TIMESTAMP", Seq.empty)
    val feed = df("e STRING, ts TIMESTAMP, f DOUBLE", Seq.empty)
    val gfeed = df("g STRING, ts TIMESTAMP, f DOUBLE", Seq.empty)
    val fb = AsOfJoin.joinWithFallback(spine, feed, gfeed, "e", "g",
      Seq("f"))
    assert(fb.count() == 0 && fb.columns.toSeq ===
      Seq("e", "g", "ts", "f", "matched_ts", "feature_source"))

    val corpus = df("id BIGINT, ph BIGINT", Seq.empty)
    val evalSet = df("id BIGINT, ph BIGINT",
      Seq(Row(1L, 5L)))
    val dec = Multimodal.decontaminateImages(corpus, evalSet,
      "id", "ph", maxDist = 2)
    assert(dec.count() == 0 && dec.columns.contains("contaminated"))
    // empty EVAL side: nothing can be contaminated, counts all 0
    val dec2 = Multimodal.decontaminateImages(evalSet, corpus,
      "id", "ph", maxDist = 2).collect()
    assert(dec2.length == 1 && dec2(0).getBoolean(3) == false)

    val caps = df("id BIGINT, cap STRING", Seq.empty)
    assert(Multimodal.captionBoilerplate(caps, "id", "cap", 2)
      .count() == 0)
  }

  test("round-5 window/behavior feature ops on empty input") {
    import graft.operators.Behavior
    import graft.temporal.WindowOps
    val ev = df("e BIGINT, ts TIMESTAMP, id BIGINT, t STRING, " +
      "v DOUBLE", Seq.empty)
    assert(WindowOps.trendFit(ev, "e", "ts", "v").count() == 0)
    assert(WindowOps.rankNormalize(ev, "e", "v").count() == 0)
    assert(WindowOps.sessionPosition(ev, "e", "ts", 1800L, Seq("id"))
      .count() == 0)
    assert(WindowOps.rollingRobustZ(ev, "e", "ts", "v", 5, Seq("id"))
      .count() == 0)
    assert(WindowOps.recencyByType(ev, "e", "ts", "t", Seq("x"),
      Seq("id")).count() == 0)
    assert(WindowOps.weekpartProfile(ev, "e", "ts", "v").count() == 0)
    assert(WindowOps.timeToNextType(ev, "e", "ts", "t", Seq("x"),
      Seq("id")).count() == 0)
    assert(WindowOps.expandingTypeCounts(ev, "e", "ts", "t",
      Seq("x"), Seq("id")).count() == 0)
    assert(Behavior.typePivot(ev, "e", "t", Seq("x")).count() == 0)
    assert(Behavior.funnelReport(ev, "e", "ts", "t", Seq("x", "y"),
      60L).count() == 0)
    assert(Behavior.denseDailyCounts(ev, "e", "ts").count() == 0)
    assert(Behavior.peakSlot(ev, "e", "ts").count() == 0)
    assert(Behavior.retentionCurve(ev, "e", "ts", Seq(1))
      .collect().forall(_.getLong(1) == 0L))
    assert(Behavior.profileMatrix(ev, "e", "ts", "t", Seq("id"))
      .count() == 0)
    assert(Behavior.gapEntropy(ev, "e", "ts").count() == 0)
    assert(Behavior.hourVector(ev, "e", "ts").count() == 0)
    assert(Behavior.dowVector(ev, "e", "ts").count() == 0)
    assert(graft.dedup.Dedup.editDistancePairs(
      df("id BIGINT, s STRING", Seq.empty), "id", "s").count() == 0)
    assert(Behavior.sessionPaths(ev, "e", "ts", "t", 1800L, 5)
      .count() == 0)
    import graft.operators.Eval
    assert(Eval.wilsonRate(ev, "e", col("t") === "x").count() == 0)
    assert(Eval.shrunkenRate(ev, "e", col("t") === "x").count() == 0)
    assert(graft.text.TextOps.vocabularyGrowth(
      df("doc_id BIGINT, text STRING", Seq.empty), "doc_id",
      "text", 100L).count() == 0)
    assert(graft.operators.GroupOps.correlationMatrix(
      df("x DOUBLE, y DOUBLE", Seq.empty), Seq("x", "y"))
      .collect().forall(_.isNullAt(3)))
    assert(graft.operators.Drift.embeddingDriftByKey(
      df("id BIGINT, k STRING, v ARRAY<FLOAT>", Seq.empty),
      "k", "v", col("id") % 2 === 0).count() == 0)
    assert(Behavior.transitionEntropy(ev, "e", "ts", "t", Seq("id"))
      .count() == 0)
    assert(WindowOps.gapSurprise(ev, "e", "ts", Seq("id"))
      .count() == 0)
    assert(Behavior.sessionTypeJaccard(ev, "e", "ts", "t", 1800L)
      .count() == 0)
    assert(WindowOps.lagAutocorr(ev, "e", "ts", "v", Seq(1),
      Seq("id")).count() == 0)
    assert(WindowOps.monotoneRun(ev, "e", "ts", "v", Seq("id"))
      .count() == 0)
    assert(WindowOps.expandingTrend(ev, "e", "ts", "v", Seq("id"))
      .count() == 0)
    assert(WindowOps.featureMatrix(ev, "e", "ts", "v", "t", Seq("x"),
      1800L, Seq("id")).count() == 0)
    assert(Behavior.interArrivalStats(ev, "e", "ts").count() == 0)
    assert(Behavior.activeDayStreak(ev, "e", "ts").count() == 0)
    assert(Behavior.hourLift(ev, "e", "ts").count() == 0)
    assert(Behavior.dowSeasonalIndex(ev, "e", "ts", "v").count() == 0)
    assert(Behavior.streakStats(ev, "e", "ts").count() == 0)
    assert(Behavior.typeMix(ev, "e", "t").count() == 0)
    assert(Behavior.volumeAnomaly(ev, "t", "ts").count() == 0)
    assert(Behavior.sessionProfile(ev, "e", "ts", 1800L).count() == 0)
    assert(Behavior.valueConcentration(ev, "e", "t", "v").count() == 0)
    assert(Behavior.activationProfile(ev, "e", "ts").count() == 0)
    assert(GroupOps.sigmaOutlierShare(ev, "e", "v").count() == 0)
    assert(GroupOps.inequalityStats(ev, "e", "v").count() == 0)
    import graft.operators.Eval
    assert(Eval.gainsTable(ev, "v", "id", "e").count() == 0)
    assert(Eval.brierByGroup(ev, "e", "v", "id").count() == 0)
  }
}
