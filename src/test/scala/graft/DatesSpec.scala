package graft

import graft.operators._
import org.apache.spark.sql.Row
import java.sql.Timestamp

class DatesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("DateDifference D truncates time-of-day (reference semantics)") {
    val d = df("lo TIMESTAMP, hi TIMESTAMP", Seq(
      Row(ts("2020-01-01 23:59:00"), ts("2020-01-02 00:01:00"))))
    val out = new DateDifferenceTransformer("lo", "hi", Some("dd"), "D")
      .transform(d)
    assert(column(out, "dd") == Seq(1.0)) // 2 min apart but 1 full day
  }

  test("DateDifference h/m/s keep fractions") {
    val d = df("lo TIMESTAMP, hi TIMESTAMP", Seq(
      Row(ts("2020-01-01 00:00:00"), ts("2020-01-01 01:30:00"))))
    assert(column(new DateDifferenceTransformer("lo", "hi", Some("x"), "h")
      .transform(d), "x") == Seq(1.5))
    assert(column(new DateDifferenceTransformer("lo", "hi", Some("x"), "m")
      .transform(d), "x") == Seq(90.0))
  }

  test("DateDifference lunar_month = 29.5 truncated days") {
    val d = df("lo TIMESTAMP, hi TIMESTAMP", Seq(
      Row(ts("2020-01-01 12:00:00"), ts("2020-01-31 00:00:00"))))
    val out = new DateDifferenceTransformer("lo", "hi", Some("x"),
      "lunar_month").transform(d)
    assert(column(out, "x") == Seq(30.0 / 29.5))
  }

  test("BetweenDates: lower > upper -> null") {
    val d = df("lo TIMESTAMP, mid TIMESTAMP, hi TIMESTAMP", Seq(
      Row(ts("2020-01-01 00:00:00"), ts("2020-01-02 00:00:00"),
        ts("2020-01-03 00:00:00")),
      Row(ts("2020-01-05 00:00:00"), ts("2020-01-02 00:00:00"),
        ts("2020-01-03 00:00:00"))))
    val out = new BetweenDatesTransformer("lo", "mid", "hi", "b")
      .transform(d)
    assert(column(out, "b") == Seq(true, null))
  }

  test("BetweenDates inclusivity flags") {
    val d = df("lo TIMESTAMP, mid TIMESTAMP, hi TIMESTAMP", Seq(
      Row(ts("2020-01-02 00:00:00"), ts("2020-01-02 00:00:00"),
        ts("2020-01-03 00:00:00"))))
    assert(column(new BetweenDatesTransformer("lo", "mid", "hi", "b",
      lowerInclusive = false).transform(d), "b") == Seq(false))
    assert(column(new BetweenDatesTransformer("lo", "mid", "hi", "b")
      .transform(d), "b") == Seq(true))
  }

  test("DatetimeInfoExtractor default buckets incl ISO weekday") {
    // 2024-01-01 is a Monday
    val d = df("t TIMESTAMP", Seq(Row(ts("2024-01-01 05:30:00")),
      Row(ts("2024-06-15 13:00:00")), Row(ts("2024-10-27 19:00:00"))))
    val out = new DatetimeInfoExtractor(Seq("t")).transform(d)
    assert(column(out, "t_timeofday") ==
      Seq("night", "afternoon", "evening"))
    assert(column(out, "t_timeofmonth") == Seq("start", "middle", "end"))
    assert(column(out, "t_timeofyear") == Seq("winter", "summer", "autumn"))
    assert(column(out, "t_dayofweek") == Seq("monday", "saturday", "sunday"))
  }

  test("DatetimeInfoExtractor custom mapping must cover full range") {
    assertThrows[IllegalArgumentException] {
      new DatetimeInfoExtractor(Seq("t"), Seq("timeofday"),
        Map("timeofday" -> Map(0 -> "x"))) // misses 1..23
    }
  }

  test("mixed date/timestamp columns rejected") {
    val d = df("a DATE, b TIMESTAMP", Seq(
      Row(java.sql.Date.valueOf("2020-01-01"), ts("2020-01-01 00:00:00"))))
    assertThrows[IllegalArgumentException] {
      new DateDifferenceTransformer("a", "b", Some("x"), "D").transform(d)
    }
  }

  test("ToDatetime parses with format") {
    val d = df("s STRING", Seq(Row("2020|01|02")))
    val out = new ToDatetimeTransformer(Seq("s"), Some("yyyy|MM|dd"))
      .transform(d)
    assert(column(out, "s") == Seq(ts("2020-01-02 00:00:00")))
  }

  test("ToDatetime formatless: ISO parses, ambiguous day-first raises") {
    // pinned divergence from the reference (tubular/dates.py:781-787):
    // polars INFERS formats after a warning; here formatless = Spark's
    // ANSI to_timestamp (ISO only), anything else needs an explicit
    // format and fails LOUDLY — see ToDatetimeTransformer scaladoc
    val ok = df("s STRING", Seq(
      Row("2020-01-02 03:04:05"), Row("2020-01-02")))
    val out = new ToDatetimeTransformer(Seq("s")).transform(ok)
    assert(column(out, "s") == Seq(
      ts("2020-01-02 03:04:05"), ts("2020-01-02 00:00:00")))
    val bad = df("s STRING", Seq(Row("02/01/2020")))
    val e = intercept[Exception] {
      new ToDatetimeTransformer(Seq("s")).transform(bad).collect()
    }
    assert(e.getMessage.contains("CAST_INVALID_INPUT"), e.getMessage)
  }

  test("Sinusoid output naming + value") {
    val d = df("t TIMESTAMP", Seq(Row(ts("2024-03-01 00:00:00"))))
    val out = new DatetimeSinusoidCalculator(Seq("t"), Seq("sin"),
      Map("t" -> "month"), Map("t" -> 12.0)).transform(d)
    assert(out.columns.contains("sin_12_month_t"))
    val got = column(out, "sin_12_month_t").head.asInstanceOf[Double]
    assert(math.abs(got - math.sin(3 * 2 * math.Pi / 12)) < 1e-12)
  }
}
