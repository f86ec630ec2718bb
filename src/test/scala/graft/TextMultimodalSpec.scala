package graft

import graft.multimodal.Multimodal
import graft.text.TextOps
import graft.validate.PixelCheck
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TextMultimodalSpec extends SparkSpec {

  test("langId scores stopword hits; deterministic tie-break; unknown") {
    val d = df("text STRING", Seq(
      Row("the cat and the dog is in a house"), // en
      Row("el perro y la casa es un lugar"), // es
      Row("zzz qqq xxx"), // no hits
      Row("the el") // 1-1 tie -> first in Langs order among winners
    ))
    val out = d.select(TextOps.langId(col("text")).as("l")).collect()
      .map(_.getString(0)).toSeq
    assert(out(0) == "en")
    assert(out(1) == "es")
    assert(out(2) == "unknown")
    assert(out(3) == "en") // en before es in priority order
  }

  test("token counts: whitespace and bpe-ish") {
    val d = df("text STRING", Seq(Row("hello world 42 foo-bar!")))
    val out = d.select(TextOps.tokenCount(col("text")).as("ws"),
      TextOps.bpeishCount(col("text")).as("bp")).head()
    assert(out.getInt(0) == 4)
    // hello|world|4|2|foo|-|bar|! = 8
    assert(out.getInt(1) == 8)
  }

  test("quality composite stays in [0,1] and penalises junk") {
    val d = df("text STRING", Seq(
      Row("the quick brown fox is a good and long document of the it"),
      Row("!!! ??? ### $$$")))
    val out = d.select(TextOps.qualityExprs(col("text"))
      .find(_._1 == "quality").get._2.as("q")).collect()
      .map(_.getDouble(0))
    assert(out.forall(q => q >= 0 && q <= 1))
    assert(out(0) > out(1))
  }

  test("fingerprint is whitespace/case normalised") {
    val d = df("a STRING, b STRING", Seq(
      Row("Hello   World", "hello world")))
    val r = d.select(TextOps.fingerprintMd5(col("a")).as("fa"),
      TextOps.fingerprintMd5(col("b")).as("fb")).head()
    assert(r.getString(0) == r.getString(1))
  }

  test("payloadMeta sniffs real PNG/JPEG magic bytes, no decode") {
    val img = PixelCheck.toImage(PixelCheck.syntheticPixels(1L, 8, 8), 8, 8)
    val png = PixelCheck.encode(img, "png")
    val jpg = PixelCheck.encode(img, "jpeg")
    val d = df("image_id STRING, bytes BINARY, w INT, h INT", Seq(
      Row("a", png, 8, 8), Row("b", jpg, 8, 8),
      Row("c", Array[Byte](1, 2, 3), 8, 8)))
    val out = Multimodal.payloadMeta(d).orderBy("image_id")
    assert(column(out, "sniffed_fmt") == Seq("png", "jpeg", "unknown"))
  }

  test("mapPartitions decode: real ImageIO features on encoded PNG") {
    val img = PixelCheck.toImage(PixelCheck.syntheticPixels(2L, 12, 7),
      12, 7)
    val png = PixelCheck.encode(img, "png")
    val d = df("image_id STRING, bytes BINARY, w INT, h INT, fmt STRING",
      Seq(Row("a", png, 12, 7, "png")))
    val out = Multimodal.withDecodeFeatures(d, Multimodal.ImageIoDecoder)
      .head()
    assert(out.getAs[Int]("decoded_w") == 12)
    assert(out.getAs[Int]("decoded_h") == 7)
    assert(out.getAs[Boolean]("decode_ok"))
    assert(out.getAs[Double]("mean_luma") > 0)
  }

  test("stub decoder is deterministic and schema-stable") {
    val d = df("image_id STRING, bytes BINARY, w INT, h INT, fmt STRING",
      Seq(Row("a", Array[Byte](9, 9, 9), 4, 4, "webp")))
    val a = Multimodal.withDecodeFeatures(d, Multimodal.StubDecoder)
      .collect().toSeq
    val b = Multimodal.withDecodeFeatures(d, Multimodal.StubDecoder)
      .collect().toSeq
    assert(a == b)
    assert(a.head.getAs[Int]("decoded_w") == 4)
  }

  test("contamination: substring of a corpus doc is flagged; " +
      "unrelated text is not") {
    val corpus = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "the quick brown fox jumps over the lazy dog repeatedly"),
      Row(2L, "unrelated corpus entry with other words entirely here")))
    val test = df("doc_id BIGINT, text STRING", Seq(
      Row(10L, "brown fox jumps over the lazy"), // substring of doc 1
      Row(11L, "zzz qqq completely disjoint vvv")))
    val pairs = TextOps.contamination(corpus, test, "doc_id", "text")
      .select("corpus_id", "test_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 10L)), s"missed contamination: $pairs")
    assert(!pairs.exists(_._2 == 11L), "false positive on disjoint doc")
  }

  test("contaminationBloom: identical output to the exact path") {
    // vocab-sampled corpus with planted substrings so true pairs,
    // bloom-filtered fingerprints and clean docs all occur
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 50).map(i => s"tok$i")
    val corpusRows = (0 until 80).map { i =>
      Row(i.toLong, (0 until 25).map(_ =>
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val corpus = df("doc_id BIGINT, text STRING", corpusRows)
    val test = corpus.filter(col("doc_id") % 8 === 0)
      .select((col("doc_id") + 1000L).as("doc_id"),
        expr("substring(text, 12)").as("text"))
    val testFps = TextOps
      .winnowFingerprints(test, "doc_id", "text", 8, 4)
      .withColumnRenamed("doc_id", "test_id")
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select("corpus_id", "test_id", "shared_fps").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = key(TextOps.contaminationWithFps(
      corpus, testFps, "doc_id", "text"))
    val bloom = key(TextOps.contaminationBloom(
      corpus, testFps, "doc_id", "text"))
    assert(exact.nonEmpty, "degenerate fixture: no contamination")
    assert(bloom == exact,
      s"bloom path diverged: ${bloom.diff(exact)} vs ${exact.diff(bloom)}")
  }

  test("repetitionScores: duplicated tokens and top-bigram share") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "spam spam spam spam"), // all same token
      Row(2L, "all words here are different ones"),
      Row(3L, "x"))) // single token: no bigrams
    val got = TextOps.repetitionScores(d, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got(0)._2 == 0.75 && got(0)._3 == 1.0) // 1-1/4; one bigram
    assert(got(1)._2 == 0.0)
    assert(got(2)._3 == 0.0) // no bigrams -> 0, not null
  }

  test("templateGroups: permutations group, multisets distinguish, " +
      "singletons drop") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "buy now cheap"), Row(2L, "cheap buy now"),
      Row(3L, "now cheap buy"),            // 3 permutations
      Row(4L, "a a b"), Row(5L, "b a a"),  // multiset {a,a,b}
      Row(6L, "a b b"),                    // different multiset
      Row(7L, "unique text here")))        // singleton drops
    val got = TextOps.templateGroups(d, "doc_id", "text", 10)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((3L, 1L), (2L, 4L)))
  }

  test("tokenPmi: DF-pruned distinct pairs, exact counts, ln chain, " +
      "deterministic tie order") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "a b c"), Row(2L, "a b"), Row(3L, "a c"),
      Row(4L, "b c x"))) // x has df 1: pruned
    val got = TextOps.tokenPmi(d, "doc_id", "text", 2L, 3L, 10)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSeq
    val pmi = math.log(2.0 * 4.0 / (3.0 * 3.0))
    assert(got.map(t => (t._1, t._2, t._3)) == Seq(
      ("a", "b", 2L), ("a", "c", 2L), ("b", "c", 2L)))
    got.foreach(t => assert(math.abs(t._4 - pmi) < 1e-12))
  }

  test("vocabularyGrowth: exact first sightings per doc bucket") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(0L, "a b"), Row(1L, "b c"),       // bucket 0: a, b, c new
      Row(150L, "c d e"),                   // bucket 1: d, e new
      Row(205L, "a e"),                     // nothing new
      Row(null, "zz"), Row(7L, null)))      // null id/text excluded
    val got = TextOps.vocabularyGrowth(d, "doc_id", "text", 100L)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 3L), (1L, 2L)))
  }

  test("vocabulary: dense freq-ranked ids, no single-partition stage") {
    val rnd = new scala.util.Random(13)
    val words = (0 until 40).map(i => s"w$i")
    val d = df("doc_id BIGINT, text STRING", (1L to 200L).map(i =>
      Row(i, Seq.fill(8)(words(rnd.nextInt(
        1 + rnd.nextInt(40)))).mkString(" "))))
    val got = TextOps.vocabulary(d, "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // reference: global sort
    val exp = got.map(t => (t._1, t._2)).sortBy { case (t, c) => (-c, t) }
      .zipWithIndex.map { case ((t, c), i) => (t, c, i.toLong) }
    assert(got.sortBy(_._3).toSeq == exp.toSeq)
    assert(got.map(_._3).sorted.toSeq ==
      (0L until got.length.toLong).toSeq, "ids must be dense")
    // (the no-single-partition property of the underlying rank is
    // asserted pre-checkpoint in ShardingSpec, where the plan is
    // visible — a checkpointed frame's plan is just the RDD scan)
  }

  test("corpusReport: hand-computed golden") {
    val d = df("doc_id BIGINT, text STRING, lang STRING", Seq(
      Row(1L, "a b c", "en"), Row(2L, "a b c", "en"), // exact dup
      Row(3L, "d e", "de"), Row(4L, "f", "en")))
    val r = TextOps.corpusReport(d, "text", "lang").head()
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("total_tokens") == 9L) // 3+3+2+1
    assert(r.getAs[Long]("n_langs") == 2L)
    assert(math.abs(r.getAs[Double]("dup_rate") - 0.25) < 1e-12)
    // H = -(3/4 ln 3/4 + 1/4 ln 1/4)
    val h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(r.getAs[Double]("lang_entropy") - h) < 1e-12)
  }

  test("tfidf: hand-computed golden, minTf prunes before the join") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "a a b"), Row(2L, "a c"), Row(3L, "c c c")))
    val out = TextOps.tfidf(d, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // N=3; df: a->2, b->1, c->2 (values within an ulp: Spark's
    // intrinsified log can differ from StrictMath in the last bit)
    def e(tf: Long, df: Long) = tf * math.log(3.0 / df)
    val exp = Map(
      (1L, "a") -> ((2L, e(2, 2))), (1L, "b") -> ((1L, e(1, 1))),
      (2L, "a") -> ((1L, e(1, 2))), (2L, "c") -> ((1L, e(1, 2))),
      (3L, "c") -> ((3L, e(3, 2))))
    assert(out.keySet == exp.keySet)
    exp.foreach { case (k, (tf, v)) =>
      assert(out(k)._1 == tf && math.abs(out(k)._2 - v) < 1e-12, s"$k")
    }
    val pruned = TextOps.tfidf(d, "doc_id", "text", minTf = 2)
    assert(pruned.count() == 2) // only (1,a) and (3,c)
  }

  test("unigramSurprisal: hand-computed self-LM, external LM with " +
      "unseen smoothing") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "a a b"), Row(2L, "a c")))
    // counts: a=3, b=1, c=1; total=5
    val out = TextOps.unigramSurprisal(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def nl(c: Double) = -math.log(c / 5.0)
    assert(math.abs(out(1L) - (2 * nl(3) + nl(1)) / 3) < 1e-12)
    assert(math.abs(out(2L) - (nl(3) + nl(1)) / 2) < 1e-12)
    // external LM missing 'c': unseen costs -ln(0.5/total)
    val lm = df("term STRING, cnt BIGINT", Seq(Row("a", 8L), Row("b", 2L)))
    val ext = TextOps.unigramSurprisal(d, "doc_id", "text", Some(lm))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def nlE(c: Double) = -math.log(c / 10.0)
    assert(math.abs(ext(2L) - (nlE(8) + nlE(0.5)) / 2) < 1e-12)
  }

  test("hashedTfVector: brute-force parity (xxhash64 default), " +
      "signed cancellation, no vocabulary state") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "a a b"), Row(2L, "a c c"), Row(3L, "d")))
    val n = 16
    val out = TextOps.hashedTfVector(d, "doc_id", "text", n)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    // brute force with the same engine hash
    val hashOf = d.sparkSession
      .sql(("SELECT t, CAST(pmod(xxhash64(t), %d) AS INT) FROM " +
        "(VALUES ('a'), ('b'), ('c'), ('d')) v(t)").format(n))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val exp = Seq(1L -> "a", 1L -> "a", 1L -> "b", 2L -> "a",
      2L -> "c", 2L -> "c", 3L -> "d")
      .groupBy { case (id, t) => (id, hashOf(t)) }
      .map { case (k, v) => k -> v.size.toLong }
    assert(out == exp)
    // signed: two colliding terms with opposite signs cancel to 0 but
    // the bucket row is still emitted
    val signed = TextOps.hashedTfVector(d, "doc_id", "text",
      numFeatures = 1, signed = true, hashName = "md5")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // bucket 0 holds everything; |tf| <= token count per doc
    assert(signed.keySet == Set(1L, 2L, 3L))
    assert(math.abs(signed(1L)) <= 3 && math.abs(signed(2L)) <= 3 &&
      math.abs(signed(3L)) <= 1)
  }

  test("ImageIoResizer: NN resize of a lossless PNG matches an " +
      "independent per-pixel computation") {
    val (w, h) = (12, 8)
    val px = PixelCheck.syntheticPixels(5L, w, h)
    val img = PixelCheck.toImage(px, w, h)
    val png = PixelCheck.encode(img, "png")
    val (tw, th) = (5, 3)
    // independent NN reference over the ORIGINAL pixel array
    var expSum = 0L
    for (y <- 0 until th; x <- 0 until tw) {
      val p = px(y * h / th * w + x * w / tw)
      expSum += math.round(0.299 * ((p >> 16) & 0xff) +
        0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff))
    }
    val d = df("image_id STRING, bytes BINARY, w INT, h INT, fmt STRING",
      Seq(Row("a", png, w, h, "png")))
    val out = Multimodal.withResizeFeatures(d,
      Multimodal.ImageIoResizer, tw, th).head()
    assert(out.getAs[Int]("resized_w") == tw)
    assert(out.getAs[Int]("resized_h") == th)
    assert(out.getAs[Long]("resized_checksum") == expSum)
    assert(out.getAs[Boolean]("resize_ok"))
    // payload must not pass through
    assert(!Multimodal.withResizeFeatures(d,
      Multimodal.ImageIoResizer, tw, th).columns.contains("bytes"))
  }

  test("stub resizer: NN source-index spec, empty payload fails clean") {
    val bytes = Array.tabulate[Byte](24)(i => i.toByte)
    val d = df("image_id STRING, bytes BINARY, w INT, h INT, fmt STRING",
      Seq(Row("a", bytes, 6, 4, "webp"),
        Row("b", Array.empty[Byte], 6, 4, "webp")))
    val out = Multimodal.withResizeFeatures(d, Multimodal.StubResizer,
      2, 2).orderBy("image_id").collect()
    // out pixel (x,y) -> src (x*6/2, y*4/2) -> idx y*2*6 + x*3
    val exp = Seq((0, 0), (1, 0), (0, 1), (1, 1)).map { case (x, y) =>
      bytes((y * 4 / 2 * 6 + x * 6 / 2) % 24) & 0xff
    }.sum
    assert(out(0).getAs[Long]("resized_checksum") == exp.toLong)
    assert(!out(1).getAs[Boolean]("resize_ok"))
  }

  test("sampleFrames: relational slicing, every k-th frame, codegen") {
    val payload = Array.tabulate[Byte](20)(i => i.toByte) // 4 frames x 5
    val d = df("image_id STRING, bytes BINARY, w INT, h INT, " +
      "fmt STRING, n_frames INT",
      Seq(Row("v", payload, 5, 1, "rawgray", 4)))
    val frames = Multimodal.sampleFrames(d,
      frameLenCol = length(col("bytes")) / 4,
      nFramesCol = col("n_frames"), everyK = 2)
    val got = frames.orderBy("frame_idx").collect()
      .map(r => (r.getAs[Int]("frame_idx"),
        r.getAs[Array[Byte]]("bytes").toSeq))
    assert(got.toSeq == Seq(
      (0, (0 until 5).map(_.toByte)),
      (2, (10 until 15).map(_.toByte))))
    // the sampling never leaves whole-stage codegen (no mapPartitions
    // until the codec): the plan up to the explode is codegen'd and
    // contains no SerializeFromObject/MapPartitions node
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions"), plan.take(500))
    // zero frames -> zero rows, no error
    val none = Multimodal.sampleFrames(
      d.withColumn("n_frames", lit(0)),
      frameLenCol = length(col("bytes")) / 4,
      nFramesCol = col("n_frames"), everyK = 2)
    assert(none.count() == 0)
  }

  /** Brute-force winnowing reference: k-gram base-131 polynomial
    * hashes, min per window of w, distinct.
    */
  private def winnowRef(s: String, k: Int, w: Int): Set[Long] = {
    val hs = s.sliding(k).filter(_.length == k)
      .map(_.foldLeft(0L)((acc, c) => acc * 131L + (c.toInt % 512)))
      .toVector
    if (hs.length < w) Set.empty
    else hs.sliding(w).map(_.min).toSet
  }

  test("winnowing fingerprints match brute-force reference") {
    val texts = Seq(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "pack my box with five dozen liquor jugs",
      2L -> "short", // < k: no grams at all
      3L -> "aaaaaaaaaaaa") // repeated chars -> heavy fp collisions
    val d = df("doc_id BIGINT, text STRING",
      texts.map { case (i, t) => Row(i, t) })
    val out = TextOps.winnowFingerprints(d, "doc_id", "text", k = 8, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    texts.foreach { case (i, t) =>
      assert(out.getOrElse(i, Set.empty[Long]) == winnowRef(t, 8, 4),
        s"doc $i fingerprints diverge from reference")
    }
  }

  test("phash near-dups: banded hamming join finds all pairs <= maxDist") {
    // A=all zero; B at distance 3 (flips confined to band 0);
    // C at distance 4 spread across all four bands (no shared band —
    // correctly not even a candidate, and beyond maxDist anyway);
    // D at distance 1 (top bit, band 3)
    val hashes = df("image_id STRING, phash BIGINT", Seq(
      Row("a", 0L),
      Row("b", 7L),
      Row("c", 1L | (1L << 16) | (1L << 32) | (1L << 48)),
      Row("d", Long.MinValue)))
    val out = Multimodal.phashNearDups(hashes, "image_id", "phash",
      maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(out == Set(("a", "b", 3), ("a", "d", 1)))
  }

  test("captionConsistency: exact vs normalized verdicts, null-safe " +
      "captions, distant pairs never compared") {
    // groups mutually >= 32 bits apart so ONLY within-group pairs
    // clear maxDist; within each group the twin is at distance 1
    val d = df("image_id STRING, phash BIGINT, caption STRING", Seq(
      Row("a1", 0L, "A cat"),
      Row("a2", 1L, "a cat "),   // case+space drift
      Row("b1", 0x0F0F0F0F0F0F0F0FL, null),
      Row("b2", 0x0F0F0F0F0F0F0F0DL, null), // both missing
      Row("c1", 0xF0F0F0F0F0F0F0F0L, "x"),
      Row("c2", 0xF0F0F0F0F0F0F0F4L, "completely different"),
      Row("far", -1L, "far"))) // 64 bits from a, 32 from b/c
    val out = Multimodal.captionConsistency(d, "image_id", "phash",
      "caption", maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Boolean]("caption_equal"),
          r.getAs[Boolean]("caption_equal_norm")))).toMap
    assert(out(("a1", "a2")) == ((false, true)))
    assert(out(("b1", "b2")) == ((true, true))) // null <=> null
    assert(out(("c1", "c2")) == ((false, false)))
    assert(out.size == 3)
  }

  test("captionTokenJaccard: set semantics, case/space-insensitive, " +
      "null and empty-set pairs score null") {
    val d = df("image_id STRING, phash BIGINT, caption STRING", Seq(
      Row("a1", 0L, "A cat sat down"),
      Row("a2", 1L, "a cat  stood up"), // {a,cat} shared of 6 distinct
      Row("b1", 0x0F0F0F0F0F0F0F0FL, null),
      Row("b2", 0x0F0F0F0F0F0F0F0DL, "text"),
      Row("c1", 0xF0F0F0F0F0F0F0F0L, "  "),
      Row("c2", 0xF0F0F0F0F0F0F0F4L, " ")))
    val out = Multimodal.captionTokenJaccard(d, "image_id", "phash",
      "caption", maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(r.fieldIndex("caption_jaccard"))) null
         else r.getDouble(r.fieldIndex("caption_jaccard")))).toMap
    // {a, cat, sat, down} vs {a, cat, stood, up}: 2 / 6
    assert(math.abs(out(("a1", "a2")).asInstanceOf[Double] - 2.0 / 6)
      < 1e-12)
    assert(out(("b1", "b2")) == null) // null caption side
    assert(out(("c1", "c2")) == null) // both token sets empty
  }

  test("winnowing guarantee: shared substring >= k+w-1 shares a fingerprint") {
    // both docs contain the same 16-char run (>= k + w - 1 = 11)
    val marker = "zqxjkvbwpfmgu#7!"
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, s"left padding text $marker and a tail here"),
      Row(2L, s"completely different prefix $marker other suffix")))
    val fp = TextOps.winnowFingerprints(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val f1 = fp.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fp.filter(_._1 == 2L).map(_._2).toSet
    assert((f1 & f2).nonEmpty,
      "documents sharing a >= k+w-1 substring must share a fingerprint")
  }

  test("packPatchBlocks: ViT patch + caption token costs, " +
      "block/offset math, null and empty captions cost zero text") {
    val d = df("image_id STRING, w INT, h INT, caption STRING", Seq(
      Row("a", 28, 14, "two words"),   // 2*1 patches + 2 + 2 = 6
      Row("b", 29, 15, null),          // 3*2 patches + 0 + 2 = 8
      Row("c", 1, 1, "   "),           // 1*1 + 0 + 2 = 3
      Row("d", 14, 14, " x  y  z ")))  // 1 + 3 + 2 = 6
    val out = Multimodal.packPatchBlocks(d, "image_id", "w", "h",
      "caption", patch = 14, blockSize = 10)
      .select("image_id", "img_tokens", "txt_tokens", "tokens",
        "cum_before", "start_block", "start_offset", "end_block")
      .orderBy("image_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
      .toSeq
    assert(out == Seq(
      // id, img, txt, tokens, cum_before, start_blk, offset, end_blk
      ("a", 2L, 2L, 6L, 0L, 0L, 0L, 0L),
      ("b", 6L, 0L, 8L, 6L, 0L, 6L, 1L),   // spans the 10-boundary
      ("c", 1L, 0L, 3L, 14L, 1L, 4L, 1L),
      ("d", 1L, 3L, 6L, 17L, 1L, 7L, 2L))) // spans into block 2
  }

  test("pairPsnrVerify: exact copy +inf, jpeg re-encode >=40dB lossy, " +
      "different render not dup, dims mismatch, corrupt payload") {
    val imgA = PixelCheck.toImage(PixelCheck.syntheticPixels(7L, 16, 16),
      16, 16)
    // genuinely different same-dims content: the inverted raster (the
    // synthetic renders only vary their blue channel across seeds, so
    // two seeds can LEGITIMATELY sit above 40 dB — that's a dup by
    // the metric, not a counterexample)
    val imgB = PixelCheck.toImage(
      PixelCheck.syntheticPixels(7L, 16, 16).map(p => ~p & 0xffffff),
      16, 16)
    val imgC = PixelCheck.toImage(PixelCheck.syntheticPixels(9L, 16, 8),
      16, 8)
    val pngA = PixelCheck.encode(imgA, "png")
    val jpgA = PixelCheck.encode(imgA, "jpeg")
    val pngB = PixelCheck.encode(imgB, "png")
    val pngC = PixelCheck.encode(imgC, "png")
    val imgs = df("id BIGINT, bytes BINARY, fmt STRING", Seq(
      Row(1L, pngA, "png"), Row(2L, pngA, "png"),   // exact copies
      Row(3L, jpgA, "jpeg"),                        // lossy twin of 1
      Row(4L, pngB, "png"),                         // different render
      Row(5L, pngC, "png"),                         // different dims
      Row(6L, Array[Byte](1, 2, 3), "png")))        // corrupt
    val pairs = df("id_a BIGINT, id_b BIGINT", Seq(
      Row(1L, 2L), Row(1L, 3L), Row(1L, 4L), Row(1L, 5L), Row(1L, 6L)))
    val out = Multimodal.pairPsnrVerify(imgs, "id", pairs)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        if (r.isNullAt(4)) null else r.getDouble(4),
        r.getBoolean(5), r.getBoolean(6))).toSeq
    val exact = out(0); val lossy = out(1); val diff = out(2)
    val dims = out(3); val corrupt = out(4)
    assert(exact == ((2L, true, true, Double.PositiveInfinity,
      true, true)))
    assert(lossy._2 && lossy._3 && !lossy._5 && lossy._6) // dup, not exact
    assert(lossy._4.asInstanceOf[Double] >= 40.0 &&
      !lossy._4.asInstanceOf[Double].isPosInfinity)
    assert(diff._2 && diff._3 && !diff._6)  // decodes, same dims, not dup
    assert(diff._4.asInstanceOf[Double] < 40.0)
    assert(dims == ((5L, true, false, null, false, false)))
    assert(corrupt == ((6L, false, false, null, false, false)))
  }

  test("resizeEncode: NN-materialized 2x twin normalizes back to " +
      "+Infinity; inverted content stays non-dup; corrupt passthrough; " +
      "bad target loud") {
    val img = PixelCheck.toImage(PixelCheck.syntheticPixels(3L, 10, 6),
      10, 6)
    val png = PixelCheck.encode(img, "png")
    val inv = PixelCheck.toImage(
      PixelCheck.syntheticPixels(3L, 10, 6).map(p => ~p & 0xffffff),
      10, 6)
    val pngInv = PixelCheck.encode(inv, "png")
    val d = df("id BIGINT, bytes BINARY, fmt STRING, w INT, h INT," +
      " tw INT, th INT", Seq(
      Row(1L, png, "png", 10, 6, 20, 12),
      Row(2L, pngInv, "png", 10, 6, 20, 12),
      Row(3L, Array[Byte](9, 9), "png", 10, 6, 20, 12)))
    val up = Multimodal.resizeEncode(d, "tw", "th")
      .orderBy("id").collect()
    assert(up(0).getAs[Int]("w") == 20 && up(0).getAs[Int]("h") == 12)
    assert(up(0).getAs[String]("fmt") == "png")
    // corrupt payload passes through UNCHANGED
    assert(up(2).getAs[Array[Byte]]("bytes").toSeq == Seq[Byte](9, 9))
    assert(up(2).getAs[Int]("w") == 10)
    // normalized verify: original vs its 2x materialization -> exact
    // dup across differing dims; original vs INVERTED 2x -> not dup
    val imgs = df("id BIGINT, bytes BINARY, fmt STRING", Seq(
      Row(1L, png, "png"),
      Row(10L, up(0).getAs[Array[Byte]]("bytes"), "png"),
      Row(11L, up(1).getAs[Array[Byte]]("bytes"), "png")))
    val pairs = df("id_a BIGINT, id_b BIGINT", Seq(
      Row(1L, 10L), Row(1L, 11L)))
    val out = Multimodal.pairPsnrVerify(imgs, "id", pairs,
      normalizeDims = true).orderBy("id_b").collect()
      .map(r => (r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(5), r.getBoolean(6))).toSeq
    assert(out == Seq(
      (10L, true, false, true, true),    // exact dup, dims differ
      (11L, true, false, false, false))) // inverted: never a dup
    // without normalizeDims the same pairs refuse to score
    val strict = Multimodal.pairPsnrVerify(imgs, "id", pairs)
      .orderBy("id_b").collect()
      .map(r => (r.getBoolean(3), r.isNullAt(4))).toSeq
    assert(strict == Seq((false, true), (false, true)))
    // absurd target dims fail loudly
    val bad = d.withColumn("tw", lit(0))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.resizeEncode(bad, "tw", "th").collect()
    }
    assert(e.getMessage.contains("resizeEncode") ||
      Option(e.getCause).exists(_.getMessage.contains("resizeEncode")))
  }

  test("electCanonicalCaption: majority, tie->longest, tie->lexicographic," +
      " null captions never vote, singleton elects own") {
    val imgs = df("id BIGINT, caption STRING", Seq(
      // cluster {1,2,3}: majority "cat" (2 votes) beats "a long dog"
      Row(1L, "cat"), Row(2L, "cat"), Row(3L, "a long dog"),
      // cluster {4,5}: 1-1 tie -> longest wins
      Row(4L, "tiny"), Row(5L, "much longer caption"),
      // cluster {6,7}: 1-1 tie, equal length -> lexicographic smallest
      Row(6L, "bbbb"), Row(7L, "aaaa"),
      // cluster {8,9}: null never votes
      Row(8L, null), Row(9L, "real"),
      // singleton
      Row(10L, "solo"),
      // cluster {11,12}: all null -> null canonical
      Row(11L, null), Row(12L, null)))
    val pairs = df("id_a BIGINT, id_b BIGINT", Seq(
      Row(1L, 2L), Row(2L, 3L), Row(4L, 5L), Row(6L, 7L),
      Row(8L, 9L), Row(11L, 12L)))
    val out = Multimodal.electCanonicalCaption(imgs, "id", "caption",
      pairs).orderBy("id")
      .select("id", "canonical_caption").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(out == Seq(
      (1L, "cat"), (2L, "cat"), (3L, "cat"),
      (4L, "much longer caption"), (5L, "much longer caption"),
      (6L, "aaaa"), (7L, "aaaa"),
      (8L, "real"), (9L, "real"),
      (10L, "solo"),
      (11L, null), (12L, null)))
  }

  test("electCanonicalCaption: string ids and reserved output " +
      "columns are rejected loudly (a silent long-cast would " +
      "collapse the corpus into one null cluster)") {
    val pairs = df("id_a BIGINT, id_b BIGINT", Seq(Row(1L, 2L)))
    intercept[IllegalArgumentException] {
      Multimodal.electCanonicalCaption(
        df("id STRING, caption STRING", Seq(Row("img_1", "c"))),
        "id", "caption", pairs)
    }
    intercept[IllegalArgumentException] {
      Multimodal.electCanonicalCaption(
        df("id BIGINT, caption STRING, cluster BIGINT",
          Seq(Row(1L, "c", 9L))),
        "id", "caption", pairs)
    }
  }

  test("pairPsnrVerify: a candidate id with no payload row yields a " +
      "decode_ok=false verdict — one verdict per pair, never a " +
      "silently dropped pair") {
    val img = PixelCheck.toImage(
      PixelCheck.syntheticPixels(3L, 8, 8), 8, 8)
    val png = PixelCheck.encode(img, "png")
    val imgs = df("id BIGINT, bytes BINARY, fmt STRING",
      Seq(Row(1L, png, "png")))
    val pairs = df("id_a BIGINT, id_b BIGINT",
      Seq(Row(1L, 99L), Row(1L, 1L)))
    val out = Multimodal.pairPsnrVerify(imgs, "id", pairs)
      .orderBy("id_b").collect()
    assert(out.length == 2, "the missing-payload pair must survive")
    val selfPair = out(0); val missing = out(1)
    assert(selfPair.getBoolean(2) && selfPair.getBoolean(5))
    assert(missing.getLong(1) == 99L && !missing.getBoolean(2) &&
      missing.isNullAt(4) && !missing.getBoolean(5) &&
      !missing.getBoolean(6))
  }

  test("sourceOverlap: exact vocabulary Jaccard/containment, " +
      "disjoint sources produce no pair row") {
    val d = df("source STRING, text STRING", Seq(
      Row("s1", "a b"), Row("s1", "b c"),
      Row("s2", "b c d"),
      Row("s3", "z")))
    val out = graft.text.TextOps.sourceOverlap(d, "source", "text")
      .orderBy("key_a", "key_b").collect()
    assert(out.length == 1) // only s1-s2 share vocabulary
    val r = out(0)
    assert(r.getString(0) == "s1" && r.getString(1) == "s2")
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L &&
      r.getLong(4) == 2L)
    assert(r.getDouble(5) == 0.5)
    assert(math.abs(r.getDouble(6) - 2.0 / 3.0) < 1e-12)
  }
}
