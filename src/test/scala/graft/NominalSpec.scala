package graft

import graft.operators._
import org.apache.spark.sql.Row

/** Golden values from the reference's own pytest fixtures
  * (/root/reference/tests/nominal/test_MeanResponseTransformer.py:35-172).
  */
class NominalSpec extends SparkSpec {

  // a = response 1..6, b = levels a..f, multi_level_response 3 levels
  private def mrFrame() = df(
    "a DOUBLE, b STRING, mlr STRING", Seq(
      Row(1.0, "a", "blue"), Row(2.0, "b", "blue"),
      Row(3.0, "c", "yellow"), Row(4.0, "d", "yellow"),
      Row(5.0, "e", "green"), Row(6.0, "f", "green")))

  test("MeanResponse prior=0 learns per-level means (reference golden)") {
    val t = new MeanResponseTransformer(Seq("b"), "a").fit(mrFrame())
    assert(t.mappings("b") == Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0,
      "d" -> 4.0, "e" -> 5.0, "f" -> 6.0))
    val out = t.transform(mrFrame())
    assert(column(out, "b") == Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
  }

  test("MeanResponse multi-level binarises y per level (golden)") {
    val t = new MeanResponseTransformer(Seq("b"), "mlr",
      level = Seq("blue", "yellow", "green")).fit(mrFrame())
    assert(t.mappings("b_blue") == Map("a" -> 1.0, "b" -> 1.0, "c" -> 0.0,
      "d" -> 0.0, "e" -> 0.0, "f" -> 0.0))
    assert(t.mappings("b_yellow") == Map("a" -> 0.0, "b" -> 0.0,
      "c" -> 1.0, "d" -> 1.0, "e" -> 0.0, "f" -> 0.0))
    assert(t.mappings("b_green") == Map("a" -> 0.0, "b" -> 0.0, "c" -> 0.0,
      "d" -> 0.0, "e" -> 1.0, "f" -> 1.0))
    assert(t.featureNamesOut ==
      Seq("b_blue", "b_yellow", "b_green"))
  }

  test("MeanResponse prior smoothing formula") {
    // prior=6: enc(a) = (1 + 6*3.5)/(1+6) = 22/7
    val t = new MeanResponseTransformer(Seq("b"), "a", prior = 6.0)
      .fit(mrFrame())
    assert(math.abs(t.mappings("b")("a") - 22.0 / 7) < 1e-12)
  }

  test("MeanResponse unseen-level handling (reference goldens)") {
    def fit(u: Either[Double, String]) =
      new MeanResponseTransformer(Seq("b"), "a",
        unseenLevelHandling = Some(u)).fit(mrFrame())
    assert(fit(Right("mean")).unseenEncoding("b") == 3.5)
    assert(fit(Right("median")).unseenEncoding("b") == 3.0)
    assert(fit(Right("max")).unseenEncoding("b") == 6.0)
    assert(fit(Right("min")).unseenEncoding("b") == 1.0)
    assert(fit(Left(22.0)).unseenEncoding("b") == 22.0)
    // transform applies the fallback to unseen levels only
    val t = fit(Right("mean"))
    val unseen = df("a DOUBLE, b STRING, mlr STRING",
      Seq(Row(0.0, "ZZZ", "blue"), Row(0.0, "a", "blue"),
        Row(0.0, null, "blue")))
    assert(column(t.transform(unseen), "b") == Seq(3.5, 1.0, null))
  }

  test("MeanResponse rejects null response") {
    val d = df("a DOUBLE, b STRING, mlr STRING",
      Seq(Row(null, "a", "x")))
    assertThrows[IllegalArgumentException] {
      new MeanResponseTransformer(Seq("b"), "a").fit(d)
    }
  }

  test("GroupRareLevels groups below cutoff, nulls pass") {
    val d = df("c STRING", Seq(
      Row("x"), Row("x"), Row("x"), Row("x"), Row("x"),
      Row("y"), Row("y"), Row("y"),
      Row("z"), Row(null)))
    // shares over ALL weight incl null row: x=.5 y=.3 z=.1
    val t = new GroupRareLevelsTransformer(Seq("c"),
      cutOffPercent = 0.25).fit(d)
    assert(t.nonRareLevels("c") == Seq("x", "y"))
    val out = t.transform(d)
    assert(column(out, "c") == Seq("x", "x", "x", "x", "x",
      "y", "y", "y", "rare", null))
  }

  test("GroupRareLevels unseenLevelsToRare=false passes unseen through") {
    val d = df("c STRING", Seq(Row("x"), Row("x"), Row("x"), Row("z")))
    val t = new GroupRareLevelsTransformer(Seq("c"),
      cutOffPercent = 0.5, unseenLevelsToRare = false).fit(d)
    val out = t.transform(df("c STRING", Seq(Row("x"), Row("z"),
      Row("NEW"))))
    assert(column(out, "c") == Seq("x", "rare", "NEW"))
  }

  test("OneHot learns sorted levels; null row -> null dummies") {
    val d = df("c STRING", Seq(Row("b"), Row("a"), Row(null)))
    val t = new OneHotEncodingTransformer(Seq("c")).fit(d)
    assert(t.categories("c") == Seq("a", "b"))
    val out = t.transform(d)
    assert(column(out, "c_a") == Seq(false, true, null))
    assert(column(out, "c_b") == Seq(true, false, null))
  }

  test("OneHot >100 levels rejected") {
    val d = df("c STRING", (1 to 101).map(i => Row(s"v$i")))
    assertThrows[IllegalArgumentException] {
      new OneHotEncodingTransformer(Seq("c")).fit(d)
    }
  }

  test("OneHot huge cardinality fails cleanly from the approx sentinel") {
    // a mistaken ID column: the approx_count_distinct guard (same fused
    // agg) errors before the driver materialises anything unbounded —
    // the transferred set is sliced to 102 entries regardless
    val d = df("c STRING", (1 to 5000).map(i => Row(s"id_$i")))
    val e = intercept[IllegalArgumentException] {
      new OneHotEncodingTransformer(Seq("c")).fit(d)
    }
    assert(e.getMessage.contains(">100 cap"), e.getMessage)
  }

  test("level-map fits enforce the driver-side cardinality cap cleanly") {
    spark.conf.set("graft.maxFitLevels", "10")
    try {
      val d = df("c STRING, y DOUBLE",
        (1 to 50).map(i => Row(s"lvl_$i", i.toDouble)))
      val e1 = intercept[IllegalArgumentException] {
        new GroupRareLevelsTransformer(Seq("c")).fit(d)
      }
      assert(e1.getMessage.contains("learned levels"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        new MeanResponseTransformer(Seq("c"), "y").fit(d)
      }
      assert(e2.getMessage.contains("learned levels"), e2.getMessage)
    } finally spark.conf.unset("graft.maxFitLevels")
  }

  test("MeanResponse unseen fallback binds prefix-colliding columns") {
    // columns "b" and "b_x": recovering the source column from the
    // encoded name by string prefix would mis-bind; the fit carries
    // (source, encoded) pairs explicitly
    val d = df("b STRING, b_x STRING, y DOUBLE", Seq(
      Row("a", "p", 1.0), Row("a", "q", 3.0), Row("c", "q", 5.0)))
    val t = new MeanResponseTransformer(Seq("b", "b_x"), "y",
      unseenLevelHandling = Some(Right("max"))).fit(d)
    // b: a->2.0, c->5.0 (max fallback 5.0); b_x: p->1.0, q->4.0 (max 4.0)
    assert(t.unseenEncoding("b") == 5.0)
    assert(t.unseenEncoding("b_x") == 4.0)
    val out = t.transform(df("b STRING, b_x STRING, y DOUBLE",
      Seq(Row("NEW", "NEW", 0.0))))
    assert(column(out, "b") == Seq(5.0))
    assert(column(out, "b_x") == Seq(4.0))
  }

  test("MeanResponse big level maps transform via broadcast join") {
    spark.conf.set("graft.maxLiteralMapSize", "2")
    try {
      val t = new MeanResponseTransformer(Seq("b"), "a",
        unseenLevelHandling = Some(Right("max"))).fit(mrFrame())
      val input = df("a DOUBLE, b STRING, mlr STRING", Seq(
        Row(0.0, "c", "x"), Row(0.0, "NEW", "x"), Row(0.0, null, "x")))
      val out = t.transform(input)
      // same values as the literal-map path: c -> 3.0, unseen -> max
      // 6.0, null passes through
      assert(column(out, "b") == Seq(3.0, 6.0, null))
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"big-map transform must not shuffle the input:\n$plan")
    } finally spark.conf.unset("graft.maxLiteralMapSize")
  }

  test("OneHot with wanted_values enumerates writtenCols before fit") {
    // regression: writtenCols pre-fit used to hit the empty categories
    // map and crash Pipeline.fit's fusion planning
    val t = new OneHotEncodingTransformer(Seq("c"),
      wantedValues = Map("c" -> Seq("a", "b")))
    assert(t.writtenCols == Some(Seq("c_a", "c_b")))
  }

  test("encoders stamp the category universe into StructField " +
      "metadata; it survives a parquet round-trip") {
    import graft.core.CategoryMetadata
    // SURVEY §1.3: the reference's Categorical dtype carries its
    // category set (tubular/nominal.py:487-507) — a consumer must be
    // able to recover the level universe from the OUTPUT SCHEMA alone
    val d = mrFrame()
    val oh = new OneHotEncodingTransformer(Seq("b")).fit(d)
    val ohOut = oh.transform(d)
    val f = ohOut.schema("b_c")
    assert(CategoryMetadata.categories(f) ==
      Some(Seq("a", "b", "c", "d", "e", "f")))
    assert(CategoryMetadata.sourceColumn(f) == Some("b"))

    val mr = new MeanResponseTransformer(Seq("b"), "a").fit(d)
    val mrOut = mr.transform(d)
    assert(CategoryMetadata.categories(mrOut.schema("b")) ==
      Some(Seq("a", "b", "c", "d", "e", "f")))

    val ord = new OrdinalEncoderTransformer(Seq("b"), "a").fit(d)
    // ordinal: categories listed in CODE order (rank by mean response)
    assert(CategoryMetadata.categories(ord.transform(d).schema("b")) ==
      Some(Seq("a", "b", "c", "d", "e", "f")))

    // the stamp must land on the WRITTEN schema, not just the plan
    val p = java.nio.file.Files
      .createTempDirectory("graft_catmeta").toString + "/t"
    ohOut.write.mode("overwrite").parquet(p)
    val back = spark.read.parquet(p)
    assert(CategoryMetadata.categories(back.schema("b_a")) ==
      Some(Seq("a", "b", "c", "d", "e", "f")))
  }

  test("CountEncoder: counts/shares, unseen -> unseenValue, null -> null") {
    val train = df("k STRING", Seq(Row("a"), Row("a"), Row("a"),
      Row("b"), Row(null)))
    val apply = df("k STRING",
      Seq(Row("a"), Row("b"), Row("z"), Row(null)))
    val raw = new CountEncoderTransformer(Seq("k")).fit(train)
    assert(raw.transform(apply).collect().map(r =>
      Option(r.get(0))).toSeq ==
      Seq(Some(3.0), Some(1.0), Some(0.0), None))
    val shares = new CountEncoderTransformer(Seq("k"), normalize = true,
      unseenValue = -1.0).fit(train)
    // total weight includes the null row (5 rows), matching the
    // weight-share denominator convention of GroupRareLevels
    assert(shares.transform(apply).collect().map(r =>
      Option(r.get(0))).toSeq ==
      Seq(Some(0.6), Some(0.2), Some(-1.0), None))
    // JSON round-trip preserves the learned maps
    val back = graft.core.Json.transformerFromJson(
      graft.core.Json.transformerToJson(shares))
    assert(back.transform(apply).collect().toSeq ==
      shares.transform(apply).collect().toSeq)
  }

  test("WoeEncoder: regularized woe, binary response enforced, " +
    "unseen -> 0, JSON round-trip") {
    val d = df("k STRING, y DOUBLE", Seq(
      Row("a", 1.0), Row("a", 1.0), Row("a", 0.0),
      Row("b", 0.0), Row("b", 0.0), Row(null, 1.0)))
    val t = new WoeEncoderTransformer(Seq("k"), "y").fit(d)
    // posTot=3, negTot=3; a: pos=2 neg=1; b: pos=0 neg=2
    val wA = math.log(((2.0 + 1) / (3 + 2)) / ((1.0 + 1) / (3 + 2)))
    val wB = math.log(((0.0 + 1) / (3 + 2)) / ((2.0 + 1) / (3 + 2)))
    val apply = df("k STRING, y DOUBLE",
      Seq(Row("a", 0.0), Row("b", 0.0), Row("z", 0.0), Row(null, 0.0)))
    assert(t.transform(apply).collect().map(r =>
      Option(r.get(0))).toSeq ==
      Seq(Some(wA), Some(wB), Some(0.0), None))
    val back = graft.core.Json.transformerFromJson(
      graft.core.Json.transformerToJson(t))
    assert(back.transform(apply).collect().toSeq ==
      t.transform(apply).collect().toSeq)
    // non-binary / null responses are loud failures
    assertThrows[IllegalArgumentException] {
      new WoeEncoderTransformer(Seq("k"), "y").fit(
        df("k STRING, y DOUBLE", Seq(Row("a", 2.0))))
    }
    assertThrows[IllegalArgumentException] {
      new WoeEncoderTransformer(Seq("k"), "y").fit(
        df("k STRING, y DOUBLE", Seq(Row("a", null))))
    }
  }

  test("HashedCrossEncoder: stable buckets, null/empty/separator " +
      "disambiguation, JSON round-trip") {
    val d = df("k STRING, n INT", Seq(
      Row("x", 1), Row("x", 1),      // identical cross -> same bucket
      Row(null, 1), Row("", 1),      // null vs empty must differ
      Row("a\u001fb", 2), Row("a", null)))
    val t = new HashedCrossEncoder(Seq("k", "n"), 64, "b")
    val out = t.transform(d).collect().map(_.getAs[Int]("b"))
    assert(out.forall(b => b >= 0 && b < 64))
    assert(out(0) == out(1))
    // ("a\u001fb", 2) joins to "a\u001fb\u001f2"; a naive encoder
    // would collide it with ("a", "b\u001f2") etc — here we only
    // assert null != empty (the sentinel) and determinism
    // null joins as the U+0001 sentinel, empty string as "" -- at a
    // collision-free modulus their (fixed, deterministic) md5 buckets
    // must differ
    val wide = new HashedCrossEncoder(Seq("k", "n"), 1 << 30, "b")
    val wideOut = wide.transform(d).collect().map(_.getAs[Int]("b"))
    assert(wideOut(2) != wideOut(3))
    val again = t.transform(d).collect().map(_.getAs[Int]("b"))
    assert(out.toSeq == again.toSeq)
    // stateless: born fitted, JSON round-trips without fit state
    val back = graft.core.Json.transformerFromJson(
      graft.core.Json.transformerToJson(t))
    assert(back.transform(d).collect().map(_.getAs[Int]("b")).toSeq ==
      out.toSeq)
    assertThrows[IllegalArgumentException] {
      new HashedCrossEncoder(Seq("k"), 64, "b")
    }
    assertThrows[IllegalArgumentException] {
      new HashedCrossEncoder(Seq("k", "n"), 0, "b")
    }
  }
  test("OofMeanResponse: each row's encoding excludes its own fold, " +
      "exclusive levels fall back to the prior (null at prior=0), " +
      "deterministic at any partitioning") {
    import org.apache.spark.sql.functions._
    // force known folds by probing the same hash the op uses: build
    // rows until both folds of a 2-fold split are populated
    val rows = (1L to 40L).map(i =>
      Row(i, if (i <= 36) "a" else "b", (i % 7).toDouble))
    val d = df("id BIGINT, k STRING, y DOUBLE", rows)
    val out = OofMeanResponse.encode(d, "id", "k", "y",
      nFolds = 2, salt = "s", prior = 0.0)
    val got = out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSeq
    // recompute the rule directly per row
    val folds = d.withColumn("f", pmod(graft.core.Hashing.md5Hash60(
        concat(col("id").cast("string"), lit("#s"))), lit(2L)))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val all = rows.map(r => (r.getLong(0), r.getString(1),
      r.getDouble(2), folds(r.getLong(0))))
    got.foreach { case (id, k, _, enc) =>
      val f = folds(id)
      val others = all.filter(t => t._2 == k && t._4 != f)
      val expect =
        if (others.isEmpty) null
        else others.map(_._3).sum / others.size
      assert(enc == expect, s"id=$id k=$k fold=$f")
    }
    // both folds are populated for level a (otherwise the test is
    // vacuous) and level b is small enough to go fold-exclusive in
    // at least one fold at SOME seed -- assert non-vacuity for a
    val aFolds = all.filter(_._2 == "a").map(_._4).distinct
    assert(aFolds.size == 2, "fixture must populate both folds")
    // prior > 0: an exclusive level encodes the pure global prior
    val withPrior = OofMeanResponse.encode(d, "id", "k", "y",
      nFolds = 2, salt = "s", prior = 3.0)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    val g = all.map(_._3).sum / all.size
    all.filter(_._2 == "b").foreach { case (id, _, _, f) =>
      val others = all.filter(t => t._2 == "b" && t._4 != f)
      val expect = (others.map(_._3).sum + 3.0 * g) /
        (others.size + 3.0)
      assert(withPrior(id) == expect)
    }
    // partitioning invariance
    val rep = OofMeanResponse.encode(d.repartition(7), "id", "k", "y",
      nFolds = 2, salt = "s", prior = 0.0)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.get(3))).toMap
    assert(got.map(t => t._1 -> t._4).toMap == rep)
    intercept[IllegalArgumentException] {
      OofMeanResponse.encode(d, "id", "k", "y", nFolds = 1, salt = "s")
    }
  }
}
