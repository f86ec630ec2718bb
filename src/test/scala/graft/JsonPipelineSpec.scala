package graft

import graft.core.{Json, Pipeline}
import graft.operators._
import org.apache.spark.sql.Row

/** JSON round-trip: {classname, init, fit} envelope, registry rebuild,
  * transform-only blocking (reference tubular/base.py:246-337,
  * tubular/_utils.py:251-272, tubular/pipeline.py:10-113).
  */
class JsonPipelineSpec extends SparkSpec {

  private def frame() = df("a DOUBLE, b STRING, y DOUBLE", Seq(
    Row(1.0, "x", 10.0), Row(null, "y", 20.0), Row(3.0, "x", 30.0),
    Row(9.0, null, 40.0)))

  test("fitted transformer JSON round-trip preserves transform output") {
    val t = new MeanImputer(Seq("a")).fit(frame())
    val json = Json.transformerToJson(t)
    assert(json.contains("\"classname\":\"MeanImputer\""))
    val t2 = Json.transformerFromJson(json)
    assert(t2.transform(frame()).collect().toSeq ==
      t.transform(frame()).collect().toSeq)
  }

  test("reloaded transformer blocks fit") {
    val t = new MeanImputer(Seq("a")).fit(frame())
    val t2 = Json.transformerFromJson(Json.transformerToJson(t))
    assertThrows[IllegalStateException] { t2.fit(frame()) }
  }

  test("every registered classname survives a default round-trip") {
    // spot-check a diverse subset with fitted state
    val transformers: Seq[graft.core.Transformer] = Seq(
      new ArbitraryImputer(Seq("a"), 0.5),
      new MedianImputer(Seq("a")).fit(frame()),
      new ModeImputer(Seq("b")).fit(frame()),
      new CappingTransformer(
        quantiles = Map("a" -> (Some(0.1), Some(0.9)))).fit(frame()),
      new GroupRareLevelsTransformer(Seq("b"), cutOffPercent = 0.4)
        .fit(frame()),
      new MeanResponseTransformer(Seq("b"), "y",
        unseenLevelHandling = Some(Left(-1.0))).fit(frame()),
      new OneHotEncodingTransformer(Seq("b")).fit(frame()),
      new MappingTransformer(Map("b" -> Map(Option("x") -> "X",
        (None: Option[String]) -> "was_null"))),
      new RatioTransformer("a", "y"),
      new LowerCaseTransformer(Seq("b")),
      new SetValueTransformer(Seq("b"), "k"),
      new QuantileBinnerTransformer(Seq("y"), nBins = 2).fit(frame()),
      new HashingEncoderTransformer(Seq("b"), nFeatures = 16,
        signed = true))
    transformers.foreach { t =>
      val json = Json.transformerToJson(t)
      val t2 = Json.transformerFromJson(json)
      assert(t2.transform(frame()).collect().toSeq ==
        t.transform(frame()).collect().toSeq,
        s"round-trip mismatch for ${t.classname}")
    }
  }

  test("pipeline fit -> json -> reload -> identical transform") {
    val p = Pipeline(
      "impute" -> new MeanImputer(Seq("a")),
      "onehot" -> new OneHotEncodingTransformer(Seq("b")),
      "enc" -> new MeanResponseTransformer(Seq("b"), "y",
        unseenLevelHandling = Some(Right("mean"))))
    p.fit(frame())
    val expected = p.transform(frame()).collect().toSeq
    val p2 = Pipeline.fromJson(p.toJson)
    assert(p2.transform(frame()).collect().toSeq == expected)
    assertThrows[IllegalStateException] { p2.steps.head._2.fit(frame()) }
  }

  test("mapping with null key maps nulls") {
    val t = new MappingTransformer(Map("b" -> Map(
      Option("x") -> "X", (None: Option[String]) -> "was_null")))
    val out = t.transform(frame()).orderBy("y")
    assert(column(out, "b") == Seq("X", "y", "X", "was_null"))
  }

  test("reference verbose/copy/return_native init args are carried " +
    "through a round-trip, not silently dropped") {
    // tubular's to_json emits these on EVERY transformer
    // (base.py:286-288); a config ported verbatim must re-emit them
    val json = """{"classname":"ArbitraryImputer",
      |"init":{"columns":["a"],"impute_value":0.5,
      |"copy":false,"verbose":true,"return_native":true},
      |"fit":{}}""".stripMargin.replace("\n", "")
    val t = graft.core.Json.transformerFromJson(json)
    val out = t.transform(frame()).orderBy("y").collect()
    assert(out(1).getDouble(0) == 0.5) // the null row imputed
    val reEmit = graft.core.Json.transformerToJson(t)
    assert(reEmit.contains("\"verbose\":true") &&
      reEmit.contains("\"copy\":false") &&
      reEmit.contains("\"return_native\":true"), reEmit)
    // absent on configs that never carried them
    val plain = graft.core.Json.transformerToJson(
      new ArbitraryImputer(Seq("a"), 0.5))
    assert(!plain.contains("verbose"))
  }

  test("ColumnDtypeSetter accepts reference-emitted UInt configs and " +
    "widens to the next signed / DECIMAL(20,0)") {
    import org.apache.spark.sql.types._
    val d = df("u8 INT, u16 INT, u32 BIGINT, u64 BIGINT", Seq(
      Row(255, 65535, 4294967295L, Long.MaxValue),
      Row(0, 0, 0L, 0L)))
    // reference tubular emits {classname, init:{columns,dtype}, fit}
    // with dtype in SimpleCastDtypes (functions/misc.py:53-65)
    val cases = Seq(
      ("u8", "UInt8", ShortType), ("u16", "UInt16", IntegerType),
      ("u32", "UInt32", LongType), ("u64", "UInt64", DecimalType(20, 0)))
    cases.foreach { case (c, dt, want) =>
      val json = s"""{"classname":"ColumnDtypeSetter",
        |"init":{"columns":["$c"],"dtype":"$dt"},"fit":{}}"""
        .stripMargin.replace("\n", "")
      val t = graft.core.Json.transformerFromJson(json)
      val out = t.transform(d)
      assert(out.schema(c).dataType == want, s"$dt -> $want")
      // full unsigned range survives the widening (no wrap)
      val top = out.orderBy(org.apache.spark.sql.functions.desc(c))
        .collect()(0)
      val asLong: Long = want match {
        case _: DecimalType => top.getDecimal(out.columns.indexOf(c))
          .longValueExact()
        case ShortType => top.getShort(out.columns.indexOf(c)).toLong
        case IntegerType => top.getInt(out.columns.indexOf(c)).toLong
        case _ => top.getLong(out.columns.indexOf(c))
      }
      assert(asLong == d.agg(org.apache.spark.sql.functions.max(c))
        .collect()(0).getAs[Number](0).longValue())
    }
    assertThrows[IllegalArgumentException] {
      new ColumnDtypeSetter(Seq("u8"), "UInt128")
    }
  }

  test("JsonFieldExtractor: typed paths, missing -> null, bad dtype " +
    "fails at init, JSON round-trip") {
    val d = df("id BIGINT, props STRING", Seq(
      Row(1L, """{"k": 7, "s": "hi", "f": 2.5}"""),
      Row(2L, """{"s": "x"}"""),
      Row(3L, "not json"),
      Row(4L, null)))
    val t = new JsonFieldExtractor("props", Seq(
      ("k", "$.k", "Int64"), ("s", "$.s", "String"),
      ("f", "$.f", "Float64")))
    val out = t.transform(d).orderBy("id").collect()
    assert((out(0).getLong(2), out(0).getString(3),
      out(0).getDouble(4)) == ((7L, "hi", 2.5)))
    assert(out(1).isNullAt(2) && out(1).getString(3) == "x")
    assert(out(2).isNullAt(2) && out(2).isNullAt(3) && out(2).isNullAt(4))
    assert(out(3).isNullAt(2))
    assertThrows[IllegalArgumentException] {
      new JsonFieldExtractor("props", Seq(("k", "$.k", "Decimal")))
    }
    val back = graft.core.Json.transformerFromJson(
      graft.core.Json.transformerToJson(t))
    assert(back.transform(d).orderBy("id").collect().toSeq == out.toSeq)
  }
}
