package graft

import graft.operators._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ImputersSpec extends SparkSpec {

  private def frame() = df("a DOUBLE, b DOUBLE, w DOUBLE", Seq(
    Row(1.0, 10.0, 1.0),
    Row(2.0, null, 2.0),
    Row(3.0, 30.0, 1.0),
    Row(null, 40.0, 1.0)))

  test("MeanImputer learns unweighted means ignoring nulls") {
    val t = new MeanImputer(Seq("a", "b")).fit(frame())
    assert(t.imputeValues("a") == 2.0)
    assert(t.imputeValues("b") == (10.0 + 30.0 + 40.0) / 3)
    val out = t.transform(frame())
    assert(column(out, "a") == Seq(1.0, 2.0, 3.0, 2.0))
  }

  test("MeanImputer weighted: sum(w*x)/sum(w) over non-null x") {
    val t = new MeanImputer(Seq("a"), Some("w")).fit(frame())
    assert(t.imputeValues("a") == (1.0 + 4.0 + 3.0) / 4.0)
  }

  test("invalid weights (null/0/neg/NaN/inf) are filtered from fit") {
    val d = df("a DOUBLE, w DOUBLE", Seq(
      Row(1.0, 1.0), Row(100.0, 0.0), Row(100.0, -2.0), Row(100.0, null),
      Row(100.0, Double.NaN), Row(100.0, Double.PositiveInfinity),
      Row(3.0, 1.0)))
    val t = new MeanImputer(Seq("a"), Some("w")).fit(d)
    assert(t.imputeValues("a") == 2.0)
  }

  test("MedianImputer picks min value with cum frac >= 0.5") {
    val d = df("a DOUBLE", Seq(Row(1.0), Row(2.0), Row(3.0), Row(4.0)))
    val t = new MedianImputer(Seq("a")).fit(d)
    assert(t.imputeValues("a") == 2.0)
  }

  test("ModeImputer tie-break takes the LARGEST value") {
    val d = df("a STRING", Seq(Row("x"), Row("x"), Row("z"), Row("z"),
      Row("m")))
    val t = new ModeImputer(Seq("a")).fit(d)
    assert(t.imputeValues("a") == "z") // x and z tie at 2 -> largest
  }

  test("ModeImputer all-null column errors") {
    val d = df("a STRING", Seq(Row(null), Row(null)))
    assertThrows[IllegalStateException] {
      new ModeImputer(Seq("a")).fit(d)
    }
  }

  test("ArbitraryImputer type dispatch rejects mismatches") {
    val d = df("a DOUBLE, s STRING", Seq(Row(1.0, "x")))
    assertThrows[IllegalArgumentException] {
      new ArbitraryImputer(Seq("a"), "oops").transform(d)
    }
    assertThrows[IllegalArgumentException] {
      new ArbitraryImputer(Seq("s"), 1.5).transform(d)
    }
    val out = new ArbitraryImputer(Seq("s"), "filled")
      .transform(df("a DOUBLE, s STRING", Seq(Row(1.0, null))))
    assert(column(out, "s") == Seq("filled"))
  }

  test("NullIndicator adds boolean flags, keeps originals") {
    val out = new NullIndicator(Seq("a", "b")).transform(frame())
    assert(out.columns.toSeq ==
      Seq("a", "b", "w", "a_nulls", "b_nulls"))
    assert(column(out, "a_nulls") == Seq(false, false, false, true))
  }

  test("empty in -> empty out, schema preserved") {
    val e = df("a DOUBLE", Seq.empty)
    val t = new MeanImputer(Seq("a"))
    t.imputeValues = Map("a" -> 1.0); // fitted elsewhere
    val out = new ArbitraryImputer(Seq("a"), 0.0).transform(e)
    assert(out.count() == 0 &&
      out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        e.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("transform before fit errors") {
    assertThrows[IllegalStateException] {
      new MeanImputer(Seq("a")).transform(frame())
    }
  }

  test("missing column errors on fit and transform") {
    assertThrows[IllegalArgumentException] {
      new MeanImputer(Seq("nope")).fit(frame())
    }
  }
}
