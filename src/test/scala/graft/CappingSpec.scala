package graft

import graft.operators._
import org.apache.spark.sql.Row

class CappingSpec extends SparkSpec {

  test("direct caps clip, nulls pass through") {
    val d = df("a DOUBLE", Seq(Row(1.0), Row(5.0), Row(9.0), Row(null)))
    val t = new CappingTransformer(
      cappingValues = Map("a" -> (Some(2.0), Some(8.0))))
    assert(column(t.transform(d), "a") == Seq(2.0, 5.0, 8.0, null))
  }

  test("one-sided caps") {
    val d = df("a DOUBLE", Seq(Row(1.0), Row(9.0)))
    val lo = new CappingTransformer(
      cappingValues = Map("a" -> (Some(2.0), None)))
    assert(column(lo.transform(d), "a") == Seq(2.0, 9.0))
    val hi = new CappingTransformer(
      cappingValues = Map("a" -> (None, Some(8.0))))
    assert(column(hi.transform(d), "a") == Seq(1.0, 8.0))
  }

  test("quantile-fitted caps match np.interp semantics") {
    val d = df("a DOUBLE",
      (1 to 5).map(i => Row(i.toDouble)))
    val t = new CappingTransformer(
      quantiles = Map("a" -> (Some(0.1), Some(0.9)))).fit(d)
    // fracs .2 .4 .6 .8 1.0; q=.1 -> clamp to first value 1.0;
    // q=.9 -> between (.8,4) and (1,5): 4 + (0.9-0.8)/0.2*1 = 4.5
    val (lo, hi) = t.fittedCaps("a")
    assert(lo.get == 1.0)
    assert(math.abs(hi.get - 4.5) < 1e-12)
  }

  test("invalid quantiles rejected") {
    assertThrows[IllegalArgumentException] {
      new CappingTransformer(quantiles = Map("a" -> (Some(-0.1), None)))
    }
  }

  test("both or neither of caps/quantiles rejected") {
    assertThrows[IllegalArgumentException] { new CappingTransformer() }
    assertThrows[IllegalArgumentException] {
      new CappingTransformer(
        cappingValues = Map("a" -> (Some(1.0), None)),
        quantiles = Map("a" -> (Some(0.1), None)))
    }
  }

  test("OutOfRangeNull nulls outliers, keeps in-range as double") {
    val d = df("a BIGINT", Seq(Row(1L), Row(5L), Row(9L), Row(null)))
    val t = new OutOfRangeNullTransformer(
      cappingValues = Map("a" -> (Some(2.0), Some(8.0))))
    assert(column(t.transform(d), "a") == Seq(null, 5.0, null, null))
  }

  test("capping: NaN passes through un-clipped (polars clip golden)") {
    // polars clip leaves NaN alone; Spark's least/greatest order NaN as
    // LARGEST, so an unguarded plan caps NaN to the upper bound
    val d = df("a DOUBLE",
      Seq(Row(1.0), Row(Double.NaN), Row(9.0), Row(null)))
    val t = new CappingTransformer(
      cappingValues = Map("a" -> (Some(2.0), Some(8.0))))
    val got = column(t.transform(d), "a")
    assert(got(0) == 2.0)
    assert(got(1).asInstanceOf[Double].isNaN, s"NaN was clipped: $got")
    assert(got(2) == 8.0)
    assert(got(3) == null)
  }

  test("OutOfRangeNull NaN: both-sided nulls, one-sided keeps (IEEE)") {
    // reference tubular/functions/capping.py:79-104: both-sided uses
    // `>= lo AND <= hi` (NaN fails -> null); one-sided uses `< lo` /
    // `> hi` (IEEE NaN comparisons are false -> NaN KEPT)
    val d = df("a DOUBLE", Seq(Row(Double.NaN)))
    val both = new OutOfRangeNullTransformer(
      cappingValues = Map("a" -> (Some(2.0), Some(8.0))))
    assert(column(both.transform(d), "a") == Seq(null))
    val loOnly = new OutOfRangeNullTransformer(
      cappingValues = Map("a" -> (Some(2.0), None)))
    assert(column(loOnly.transform(d), "a")
      .head.asInstanceOf[Double].isNaN)
    val hiOnly = new OutOfRangeNullTransformer(
      cappingValues = Map("a" -> (None, Some(8.0))))
    assert(column(hiOnly.transform(d), "a")
      .head.asInstanceOf[Double].isNaN)
  }
}
