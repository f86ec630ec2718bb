package graft.operators

import graft.core.Transformer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Date/datetime transformers (reference tubular/dates.py,
  * tubular/functions/dates.py). All pure projections — zero shuffle.
  */
object Dates {
  /** unit -> microseconds (UNITS_TO_TIMEDELTA_PARAMS,
    * tubular/functions/dates.py:15-27). lunar_month = 29.5 days.
    */
  val UnitMicros: Map[String, Long] = Map(
    "week" -> 7L * 86400000000L,
    "fortnight" -> 14L * 86400000000L,
    "lunar_month" -> 708L * 3600000000L,
    "common_year" -> 365L * 86400000000L,
    "D" -> 86400000000L,
    "h" -> 3600000000L,
    "m" -> 60000000L,
    "s" -> 1000000L)

  /** Units where time-of-day is truncated before differencing
    * (tubular/functions/dates.py:30-37).
    */
  val TruncatedUnits: Set[String] =
    Set("week", "fortnight", "lunar_month", "common_year", "custom_days", "D")

  /** Default categorical bucket mappings
    * (DEFAULT_MAPPINGS, tubular/functions/dates.py:201-228).
    */
  val TimeOfDay: Map[Int, String] =
    (0 to 5).map(_ -> "night").toMap ++
      (6 to 11).map(_ -> "morning").toMap ++
      (12 to 17).map(_ -> "afternoon").toMap ++
      (18 to 23).map(_ -> "evening").toMap
  val TimeOfMonth: Map[Int, String] =
    (1 to 10).map(_ -> "start").toMap ++
      (11 to 20).map(_ -> "middle").toMap ++
      (21 to 31).map(_ -> "end").toMap
  val TimeOfYear: Map[Int, String] =
    (3 to 5).map(_ -> "spring").toMap ++
      (6 to 8).map(_ -> "summer").toMap ++
      (9 to 11).map(_ -> "autumn").toMap ++
      Seq(12, 1, 2).map(_ -> "winter").toMap
  /** ISO weekday 1=Mon..7=Sun (polars convention; Spark `weekday` is
    * 0=Mon, so +1).
    */
  val DayOfWeek: Map[Int, String] = Map(
    1 -> "monday", 2 -> "tuesday", 3 -> "wednesday", 4 -> "thursday",
    5 -> "friday", 6 -> "saturday", 7 -> "sunday")

  val DefaultMappings: Map[String, Map[Int, String]] = Map(
    "timeofday" -> TimeOfDay, "timeofmonth" -> TimeOfMonth,
    "timeofyear" -> TimeOfYear, "dayofweek" -> DayOfWeek)

  def component(include: String, c: Column): Column = include match {
    case "timeofday" => hour(c)
    case "timeofmonth" => dayofmonth(c)
    case "timeofyear" => month(c)
    case "dayofweek" => weekday(c) + 1
  }
}

/** Parse strings to timestamps (tubular/dates.py:710-885).
  *
  * Formatless parity note (pinned in DatesSpec): the reference warns
  * and lets polars/pandas INFER the format (tubular/dates.py:781-787);
  * here the formatless path is Spark's ANSI `to_timestamp`, which
  * accepts ISO-style `yyyy-MM-dd[ HH:mm:ss]` and RAISES on anything
  * else. Day-first or exotic strings the reference might happen to
  * infer must be given an explicit `format` — silent inference of
  * ambiguous formats is a correctness hazard at 100 TB, so requiring
  * the format (and failing loudly otherwise) is deliberate, not a gap.
  */
class ToDatetimeTransformer(
    val columns: Seq[String],
    val format: Option[String] = None
) extends Transformer {
  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    columns.map { c =>
      c -> format.map(f => to_timestamp(col(c), f))
        .getOrElse(to_timestamp(col(c)))
    }
  override def initParams: Map[String, Any] =
    Map("columns" -> columns, "time_format" -> format.orNull)
}

/** Fractional difference `col1 - col0` in a unit
  * (tubular/dates.py:500-706). Time-of-day truncated for day-or-coarser
  * units (tubular/functions/dates.py:30-37,91-93).
  */
class DateDifferenceTransformer(
    val columnLower: String,
    val columnUpper: String,
    val newColumnName: Option[String] = None,
    val units: String = "D",
    val customDays: Option[Int] = None
) extends Transformer {
  require(Dates.UnitMicros.contains(units) || units == "custom_days",
    s"unknown units $units")
  if (units == "custom_days") require(customDays.isDefined,
    "custom_days units require customDays")
  val columns: Seq[String] = Seq(columnLower, columnUpper)
  val outName: String = newColumnName.getOrElse(
    s"${columnUpper}_${columnLower}_datediff_$units")

  private def unitMicros: Long =
    if (units == "custom_days") customDays.get * 86400000000L
    else Dates.UnitMicros(units)

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireConsistentDatetime(df, columns)
    def prep(c: String): Column = {
      val e = col(c).cast(TimestampType)
      if (Dates.TruncatedUnits.contains(units)) date_trunc("DAY", e) else e
    }
    val diff = (unix_micros(prep(columnUpper)) -
      unix_micros(prep(columnLower))).cast("double") / lit(unitMicros.toDouble)
    Seq(outName -> diff)
  }
  override def featureNamesOut: Seq[String] = Seq(outName)
  override def initParams: Map[String, Any] = Map(
    "column_lower" -> columnLower, "column_upper" -> columnUpper,
    "new_column_name" -> outName, "units" -> units,
    "custom_days" -> customDays.map(Int.box).orNull)
}

/** Boolean lower </<= mid </<= upper; rows with lower > upper -> null
  * (tubular/dates.py:889-1132).
  */
class BetweenDatesTransformer(
    val columnLower: String,
    val columnBetween: String,
    val columnUpper: String,
    val newColumnName: String,
    val lowerInclusive: Boolean = true,
    val upperInclusive: Boolean = true
) extends Transformer {
  val columns: Seq[String] = Seq(columnLower, columnBetween, columnUpper)

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireConsistentDatetime(df, columns)
    val l = col(columnLower); val m = col(columnBetween)
    val u = col(columnUpper)
    val cmpL = if (lowerInclusive) l <= m else l < m
    val cmpU = if (upperInclusive) m <= u else m < u
    Seq(newColumnName -> when(l <= u, cmpL && cmpU))
  }
  override def featureNamesOut: Seq[String] = Seq(newColumnName)
  override def initParams: Map[String, Any] = Map(
    "column_lower" -> columnLower, "column_between" -> columnBetween,
    "column_upper" -> columnUpper, "new_column_name" -> newColumnName,
    "lower_inclusive" -> lowerInclusive, "upper_inclusive" -> upperInclusive)
}

/** Categorical buckets from datetime components
  * (tubular/dates.py:1136-1441): include in
  * {timeofday, timeofmonth, timeofyear, dayofweek}; optional custom
  * total mappings per include; output `{col}_{include}: String`.
  */
class DatetimeInfoExtractor(
    val columns: Seq[String],
    val include: Seq[String] =
      Seq("timeofday", "timeofmonth", "timeofyear", "dayofweek"),
    val datetimeMappings: Map[String, Map[Int, String]] = Map.empty
) extends Transformer {
  include.foreach(i => require(Dates.DefaultMappings.contains(i),
    s"unknown include option $i"))
  // custom mappings must cover the component's full range
  // (tubular/dates.py:1326-1367)
  datetimeMappings.foreach { case (inc, m) =>
    val range = inc match {
      case "timeofday" => 0 to 23
      case "timeofmonth" => 1 to 31
      case "timeofyear" => 1 to 12
      case "dayofweek" => 1 to 7
    }
    val missing = range.filterNot(m.contains)
    require(missing.isEmpty,
      s"$classname: mapping for $inc misses values $missing")
  }

  private def mappingFor(inc: String): Map[Int, String] =
    datetimeMappings.getOrElse(inc, Dates.DefaultMappings(inc))

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireConsistentDatetime(df, columns, timestampOnly = false)
    columns.flatMap { c =>
      include.map { inc =>
        val m = mappingFor(inc).map { case (k, v) => k.toString -> v }
        s"${c}_$inc" ->
          element_at(typedLit(m),
            Dates.component(inc, col(c)).cast("string"))
      }
    }
  }
  override def featureNamesOut: Seq[String] =
    columns.flatMap(c => include.map(inc => s"${c}_$inc"))
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "include" -> include,
    "datetime_mappings" -> datetimeMappings.map { case (k, m) =>
      k -> m.map { case (i, s) => i.toString -> s } })
}

/** Numeric hour/day/month/year components as Float32
  * (tubular/dates.py:1445-1673).
  */
class DatetimeComponentExtractor(
    val columns: Seq[String],
    val include: Seq[String]
) extends Transformer {
  private val Allowed = Seq("hour", "day", "month", "year")
  include.foreach(i =>
    require(Allowed.contains(i), s"unknown component $i"))

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireConsistentDatetime(df, columns)
    columns.flatMap { c =>
      include.map { inc =>
        val e = inc match {
          case "hour" => hour(col(c))
          case "day" => dayofmonth(col(c))
          case "month" => month(col(c))
          case "year" => year(col(c))
        }
        s"${c}_$inc" -> e.cast(FloatType)
      }
    }
  }
  override def featureNamesOut: Seq[String] =
    columns.flatMap(c => include.map(inc => s"${c}_$inc"))
  override def initParams: Map[String, Any] =
    Map("columns" -> columns, "include" -> include)
}

/** sin/cos of a datetime component scaled by 2 pi / period
  * (tubular/dates.py:1677-1962). Output name
  * `{method}_{period}_{unit}_{col}`.
  */
class DatetimeSinusoidCalculator(
    val columns: Seq[String],
    val method: Seq[String], // subset of {sin, cos}
    val units: Map[String, String], // col -> unit (or "*" -> unit)
    val period: Map[String, Double] // col -> period (or "*" -> period)
) extends Transformer {
  method.foreach(m => require(Seq("sin", "cos").contains(m),
    s"method must be sin/cos, got $m"))

  private def unitFor(c: String): String =
    units.getOrElse(c, units.getOrElse("*",
      throw new IllegalArgumentException(s"no unit for $c")))
  private def periodFor(c: String): Double =
    period.getOrElse(c, period.getOrElse("*",
      throw new IllegalArgumentException(s"no period for $c")))

  private def componentExpr(unit: String, c: Column): Column = unit match {
    case "year" => year(c)
    case "month" => month(c)
    case "day" => dayofmonth(c)
    case "hour" => hour(c)
    case "minute" => minute(c)
    case "second" => second(c)
    case "microsecond" => (unix_micros(c.cast(TimestampType)) % 1000000L)
    case u => throw new IllegalArgumentException(s"unknown unit $u")
  }

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireConsistentDatetime(df, columns)
    columns.flatMap { c =>
      val unit = unitFor(c); val p = periodFor(c)
      val base = componentExpr(unit, col(c)).cast("double") *
        lit(2 * math.Pi / p)
      method.map { m =>
        val e = if (m == "sin") sin(base) else cos(base)
        s"${m}_${fmtPeriod(p)}_${unit}_$c" -> e
      }
    }
  }
  private def fmtPeriod(p: Double): String =
    if (p == p.floor && !p.isInfinite) p.toLong.toString else p.toString

  override def featureNamesOut: Seq[String] =
    columns.flatMap(c => method.map(m =>
      s"${m}_${fmtPeriod(periodFor(c))}_${unitFor(c)}_$c"))
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "method" -> method, "units" -> units,
    "period" -> period)
}
