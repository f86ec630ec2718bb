package graft

import graft.operators._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The non-numeric resurrected deprecated transformers: ordinal
  * encoding, nominal-to-integer, cross-column adjusters, leap-year
  * date diff, equality, string concatenation.
  */
class DeprecatedOpsSpec extends SparkSpec {

  test("ordinal encodes levels by ascending mean response; nulls stay null") {
    val d = df("c STRING, y DOUBLE", Seq(
      Row("hi", 10.0), Row("hi", 12.0),   // mean 11 -> rank 3
      Row("lo", 1.0), Row("lo", 3.0),     // mean 2  -> rank 1
      Row("mid", 5.0), Row("mid", 7.0),   // mean 6  -> rank 2
      Row(null, 100.0)))
    val t = new OrdinalEncoderTransformer(Seq("c"), "y").fit(d)
    assert(t.mappings("c") == Map("lo" -> 1, "mid" -> 2, "hi" -> 3))
    val got = t.transform(d).groupBy("c").agg(first("c")).collect()
    val enc = t.transform(d).select("c").distinct().collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSet
    assert(enc == Set(1, 2, 3, null))
  }

  test("ordinal: weighted means flip the order; null response rejected") {
    val d = df("c STRING, y DOUBLE, w DOUBLE", Seq(
      Row("a", 10.0, 1.0), Row("a", 0.0, 9.0),   // weighted mean 1
      Row("b", 2.0, 1.0)))                       // mean 2
    val t = new OrdinalEncoderTransformer(Seq("c"), "y", Some("w")).fit(d)
    assert(t.mappings("c") == Map("a" -> 1, "b" -> 2))
    val bad = df("c STRING, y DOUBLE", Seq(Row("a", null)))
    intercept[IllegalArgumentException] {
      new OrdinalEncoderTransformer(Seq("c"), "y").fit(bad)
    }
  }

  test("nominal-to-integer: sorted levels from start_encoding") {
    val d = df("c STRING", Seq(Row("z"), Row("a"), Row("m"), Row("a")))
    val t = new NominalToIntegerTransformer(Seq("c"), startEncoding = 5)
      .fit(d)
    assert(t.mappings("c") == Map("a" -> 5, "m" -> 6, "z" -> 7))
  }

  test("cross-column adjusters: sequential rules override and compound") {
    val d = df("seg STRING, flag STRING, v DOUBLE", Seq(
      Row("gold", "y", 10.0), Row("gold", "n", 10.0),
      Row("base", "y", 10.0), Row("base", "n", 10.0)))
    val mul = new CrossColumnMultiplyTransformer("v", Seq(
      "seg" -> Seq("gold" -> 2.0),
      "flag" -> Seq("y" -> 10.0)))
    val gotM = mul.transform(d).orderBy("seg", "flag").collect()
      .map(_.getDouble(2)).toSeq
    // base/n: 10; base/y: 100 (compound flag); gold/n: 20; gold/y: 200
    assert(gotM == Seq(10.0, 100.0, 20.0, 200.0))

    val add = new CrossColumnAddTransformer("v", Seq(
      "seg" -> Seq("gold" -> 5.0), "flag" -> Seq("y" -> 0.5)))
    assert(add.transform(d).orderBy("seg", "flag").collect()
      .map(_.getDouble(2)).toSeq == Seq(10.0, 10.5, 15.0, 15.5))

    val map = new CrossColumnMappingTransformer("v", Seq(
      "seg" -> Seq("gold" -> 1.0), "flag" -> Seq("y" -> 2.0)))
    // later rule overrides: gold/y -> 2 (flag rule is last)
    assert(map.transform(d).orderBy("seg", "flag").collect()
      .map(_.getDouble(2)).toSeq == Seq(10.0, 2.0, 1.0, 2.0))
  }

  test("leap-year date diff: whole years, leap-day exact, negatives") {
    val d = df("lo DATE, hi DATE", Seq(
      Row(java.sql.Date.valueOf("2000-02-29"),
        java.sql.Date.valueOf("2001-02-28")),  // 0 full years
      Row(java.sql.Date.valueOf("2000-02-29"),
        java.sql.Date.valueOf("2001-03-01")),  // 1
      Row(java.sql.Date.valueOf("1990-06-15"),
        java.sql.Date.valueOf("2020-06-14")),  // 29
      Row(java.sql.Date.valueOf("2020-01-01"),
        java.sql.Date.valueOf("2010-06-30")))) // -9 (reversed)
    val t = new DateDiffLeapYearTransformer("lo", "hi", "age")
    assert(t.transform(d).collect().map(_.getAs[Int]("age")).toSeq ==
      Seq(0, 1, 29, -9))
  }

  test("equality checker and string concatenator") {
    val d = df("a STRING, b STRING", Seq(
      Row("x", "x"), Row("x", "y"), Row(null, "x"), Row(null, null)))
    val eq = new EqualityChecker("a", "b", "same")
    assert(eq.transform(d).collect().map(_.getAs[Boolean]("same")).toSeq
      == Seq(true, false, false, false))
    val cat = new StringConcatenator(Seq("a", "b"), "ab", separator = "-")
    assert(cat.transform(d).collect().map(_.getAs[String]("ab")).toSeq
      == Seq("x-x", "x-y", "x", ""))
  }

  test("nearest-mean-response imputer: distributed argmin, no-null no-op") {
    val d = df("a DOUBLE, b DOUBLE, y DOUBLE", Seq(
      Row(1.0, 7.0, 10.0),   // a=1: mean y 10
      Row(2.0, 7.0, 50.0),   // a=2: mean y 50
      Row(3.0, 7.0, 100.0),  // a=3: mean y 100
      Row(null, 7.0, 55.0),  // null mean 55 -> nearest a level: 2
      Row(null, 7.0, 55.0)))
    val t = new NearestMeanResponseImputer(Seq("a", "b"), "y").fit(d)
    assert(t.imputeValues == Map("a" -> 2.0)) // b has no nulls -> absent
    val out = t.transform(d)
    assert(out.filter(col("a").isNull).count() == 0)
    assert(out.filter(col("a") === 2.0).count() == 3)
    // null response rejected
    intercept[IllegalArgumentException] {
      new NearestMeanResponseImputer(Seq("a"), "y")
        .fit(df("a DOUBLE, y DOUBLE", Seq(Row(null, null))))
    }
  }

  test("SeriesStrMethodTransformer: whitelisted pandas str methods, " +
      "unsupported fails at init, JSON round-trip") {
    val d = df("s STRING", Seq(Row("  Hello World  "), Row(null),
      Row("a-b-c")))
    def out(m: String, kw: Map[String, Any] = Map.empty): Seq[Any] =
      column(new SeriesStrMethodTransformer("o", m, Seq("s"), kw)
        .transform(d), "o")
    assert(out("lower") == Seq("  hello world  ", null, "a-b-c"))
    assert(out("strip") == Seq("Hello World", null, "a-b-c"))
    assert(out("len") == Seq(15, null, 5))
    // documented divergence: pandas title() gives 'A-B-C' (any
    // non-letter is a word boundary); initcap breaks on whitespace
    assert(out("title") == Seq("  Hello World  ", null, "A-b-c"))
    // pandas strip() removes ALL whitespace, not just spaces
    val tabs = df("s STRING", Seq(Row("\thello\n"), Row(" x\t")))
    def outT(m: String): Seq[Any] =
      column(new SeriesStrMethodTransformer("o", m, Seq("s"))
        .transform(tabs), "o")
    assert(outT("strip") == Seq("hello", "x"))
    assert(outT("lstrip") == Seq("hello\n", "x\t"))
    assert(outT("rstrip") == Seq("\thello", " x"))
    // pandas contains defaults to REGEX
    assert(out("contains", Map("pat" -> "H.llo")) ==
      Seq(true, null, false))
    assert(out("contains", Map("pat" -> "H.llo", "regex" -> false)) ==
      Seq(false, null, false))
    // pandas replace defaults to LITERAL
    assert(out("replace", Map("pat" -> "-", "repl" -> "_")) ==
      Seq("  Hello World  ", null, "a_b_c"))
    assert(out("slice", Map("start" -> 2, "stop" -> 7)) ==
      Seq("Hello", null, "b-c"))
    intercept[IllegalArgumentException] {
      new SeriesStrMethodTransformer("o", "get_dummies", Seq("s"))
    }
    val back = graft.core.Json.transformerFromJson(
      graft.core.Json.transformerToJson(
      new SeriesStrMethodTransformer("o", "contains", Seq("s"),
        Map("pat" -> "a", "regex" -> false))))
    assert(column(back.transform(d), "o") == Seq(false, null, true))
  }

  test("DataFrameMethodTransformer: row-wise skipna reductions, " +
      "element-wise scalar arithmetic, Python mod signs, init " +
      "failures, JSON round-trip") {
    import graft.operators.DataFrameMethodTransformer
    val d = df("a DOUBLE, b DOUBLE", Seq(
      Row(1.0, 2.0), Row(null, 5.0), Row(null, null), Row(-3.0, 0.5)))
    def red(m: String): Seq[Any] =
      column(new DataFrameMethodTransformer(Seq("o"), m,
        Seq("a", "b"), Map("axis" -> 1)).transform(d), "o")
    // pandas skipna=True: nulls drop out; all-null row -> sum 0.0,
    // min/max/mean null
    assert(red("sum") == Seq(3.0, 5.0, 0.0, -2.5))
    assert(red("min") == Seq(1.0, 5.0, null, -3.0))
    assert(red("max") == Seq(2.0, 5.0, null, 0.5))
    assert(red("mean") == Seq(1.5, 5.0, null, -1.25))
    def ew(m: String, other: Double, in: Seq[String] = Seq("a"))
        : Seq[Any] =
      column(new DataFrameMethodTransformer(in.map(_ + "_o"), m, in,
        Map("other" -> other)).transform(d), in.head + "_o")
    assert(ew("add", 10) == Seq(11.0, null, null, 7.0))
    assert(ew("sub", 1) == Seq(0.0, null, null, -4.0))
    assert(ew("mul", 2) == Seq(2.0, null, null, -6.0))
    assert(ew("div", 2) == Seq(0.5, null, null, -1.5))
    assert(ew("pow", 2) == Seq(1.0, null, null, 9.0))
    // Python sign rule: -3 % 2 == 1, 1 % -2 == -1, -3 % -2 == -1
    assert(ew("mod", 2) == Seq(1.0, null, null, 1.0))
    assert(ew("mod", -2) == Seq(-1.0, null, null, -1.0))
    assert(column(new DataFrameMethodTransformer(Seq("ao", "bo"),
      "abs", Seq("a", "b")).transform(d), "ao") ==
      Seq(1.0, null, null, 3.0))
    // element-wise writes one output per input column
    val two = new DataFrameMethodTransformer(Seq("ao", "bo"), "div",
      Seq("a", "b"), Map("other" -> 2.0)).transform(d)
    assert(column(two, "bo") == Seq(1.0, 2.5, null, 0.25))
    // init failures: unsupported method, wrong arity, missing kwargs
    intercept[IllegalArgumentException] {
      new DataFrameMethodTransformer(Seq("o"), "pivot", Seq("a"))
    }
    intercept[IllegalArgumentException] { // reduction needs axis=1
      new DataFrameMethodTransformer(Seq("o"), "sum", Seq("a", "b"))
    }
    intercept[IllegalArgumentException] { // reduction -> ONE output
      new DataFrameMethodTransformer(Seq("o", "p"), "sum",
        Seq("a", "b"), Map("axis" -> 1))
    }
    intercept[IllegalArgumentException] { // element-wise arity
      new DataFrameMethodTransformer(Seq("o"), "div", Seq("a", "b"),
        Map("other" -> 2))
    }
    intercept[IllegalArgumentException] { // missing `other`
      new DataFrameMethodTransformer(Seq("o"), "div", Seq("a"))
    }
    val back = graft.core.Json.transformerFromJson(
      graft.core.Json.transformerToJson(
        new DataFrameMethodTransformer(Seq("o"), "sum", Seq("a", "b"),
          Map("axis" -> 1))))
    assert(column(back.transform(d), "o") == Seq(3.0, 5.0, 0.0, -2.5))
  }

  test("SeriesDtMethodTransformer: pandas dt accessor parity " +
      "(Monday=0 weekday, leap years, days_in_month)") {
    val d = df("ts TIMESTAMP", Seq(
      Row(java.sql.Timestamp.valueOf("2024-01-01 10:30:45")), // Monday
      Row(java.sql.Timestamp.valueOf("2023-02-05 00:00:00")), // Sunday
      Row(null)))
    def out(m: String): Seq[Any] =
      column(new SeriesDtMethodTransformer("o", m, Seq("ts"))
        .transform(d), "o")
    assert(out("year") == Seq(2024, 2023, null))
    assert(out("dayofweek") == Seq(0, 6, null)) // pandas Monday=0
    assert(out("quarter") == Seq(1, 1, null))
    assert(out("days_in_month") == Seq(31, 28, null))
    assert(out("is_leap_year") == Seq(true, false, null))
    assert(out("date") == Seq(java.sql.Date.valueOf("2024-01-01"),
      java.sql.Date.valueOf("2023-02-05"), null))
    // century rule: 1900 not a leap year, 2000 is
    val c = df("ts TIMESTAMP", Seq(
      Row(java.sql.Timestamp.valueOf("1900-06-01 00:00:00")),
      Row(java.sql.Timestamp.valueOf("2000-06-01 00:00:00"))))
    assert(column(new SeriesDtMethodTransformer("o", "is_leap_year",
      Seq("ts")).transform(c), "o") == Seq(false, true))
    intercept[IllegalArgumentException] {
      new SeriesDtMethodTransformer("o", "tz_convert", Seq("ts"))
    }
  }
}
