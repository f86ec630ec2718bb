package graft.operators

import graft.core.{Transformer, Weights}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The remaining deprecated reference transformers, resurrected
  * Spark-first (the numeric set lives in Numeric.scala). The three
  * reflective pandas-method passthroughs (`DataFrameMethodTransformer`,
  * `SeriesStrMethodTransformer`, `SeriesDtMethodTransformer`,
  * tubular/base.py / strings.py / dates.py) are re-expressed as TYPED
  * WHITELISTS: "call an arbitrary pandas method" has no
  * engine-independent meaning, so each supported method name maps to
  * the Catalyst expression with pandas semantics and unsupported names
  * fail at construction (the reference defers failure to transform
  * time — ours is earlier and typed). This closes the reference
  * registry 141/141.
  */

/** Ordinal encoding by ascending mean response: the level with the
  * lowest weighted mean response encodes to 1, the next to 2, ...
  * (tubular/nominal.py:1855-2088; deprecated there). Nulls are left
  * untransformed, level count is capped at 127 (reference int8 cap,
  * nominal.py:2024-2028). Fit is ONE melted groupBy for all columns
  * (the reference loops one groupBy per column).
  */
class OrdinalEncoderTransformer(
    val columns: Seq[String],
    val responseColumn: String,
    val weightsColumn: Option[String] = None
) extends Transformer {
  override def needsFit: Boolean = true
  override def fitInputCols: Seq[String] =
    columns ++ Seq(responseColumn) ++ weightsColumn

  var mappings: Map[String, Map[String, Int]] = Map.empty

  override def fit(df: DataFrame): this.type = {
    super.fit(df)
    requireStringLike(df, columns)
    if (df.filter(col(responseColumn).isNull).limit(1).count() > 0)
      throw new IllegalArgumentException(
        s"$classname: y has null values (tubular/nominal.py:2002-2004)")
    val rows = Weights.fitRows(df, weightsColumn)
    val w = Weights.weightCol(weightsColumn).cast("double")
    val pair = explode(array(columns.map(c =>
      struct(lit(c).as("c"), col(c).cast("string").as("lvl"))): _*))
    val perLevel = rows
      .select(pair.as("p"), w.as("__w"),
        col(responseColumn).cast("double").as("__y"))
      .filter(col("p.lvl").isNotNull)
      .groupBy(col("p.c").as("c"), col("p.lvl").as("lvl"))
      .agg((sum(col("__w") * col("__y")) / sum(col("__w"))).as("m"))
      .collect()
    mappings = columns.map { c =>
      val levels = perLevel.filter(_.getString(0) == c)
        .map(r => r.getString(1) -> r.getDouble(2))
        .sortBy(_._2)
      if (levels.length > 127)
        throw new IllegalArgumentException(
          s"$classname: column $c has too many levels to encode " +
            "(tubular/nominal.py:2024-2028)")
      c -> levels.zipWithIndex.map { case ((l, _), i) => l -> (i + 1) }
        .toMap
    }.toMap
    this
  }

  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    columns.map { c =>
      val m = typedLit(mappings(c))
      // category universe in CODE order (rank 1..n) on the schema
      val ordered = mappings(c).toSeq.sortBy(_._2).map(_._1)
      c -> when(col(c).isNotNull,
        element_at(m, col(c).cast("string"))).cast("int")
        .as(c, graft.core.CategoryMetadata.of(c, ordered))
    }
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "response_column" -> responseColumn,
    "weights_column" -> weightsColumn.orNull)
  override def fitParams: Map[String, Any] = Map("mappings" -> mappings)
  override def restoreFit(fit: Map[String, Any]): this.type = {
    mappings = fit("mappings").asInstanceOf[Map[String, Map[String, Int]]]
    super.restoreFit(fit)
  }
}

/** Level -> integer codes starting at `startEncoding`
  * (tubular/nominal.py:2091-2243; deprecated there). DOCUMENTED
  * DIVERGENCE: the reference numbers levels in pandas first-appearance
  * order, which has no stable meaning for a distributed table; levels
  * are numbered in SORTED order here (deterministic under any
  * partitioning). 127-level cap as in the reference.
  */
class NominalToIntegerTransformer(
    val columns: Seq[String],
    val startEncoding: Int = 0
) extends Transformer {
  override def needsFit: Boolean = true

  var mappings: Map[String, Map[String, Int]] = Map.empty

  override def fit(df: DataFrame): this.type = {
    super.fit(df)
    val pair = explode(array(columns.map(c =>
      struct(lit(c).as("c"), col(c).cast("string").as("lvl"))): _*))
    val levels = df.select(pair.as("p"))
      .filter(col("p.lvl").isNotNull)
      .groupBy(col("p.c").as("c"), col("p.lvl").as("lvl")).agg(count(lit(1)))
      .collect().map(r => (r.getString(0), r.getString(1)))
    mappings = columns.map { c =>
      val ls = levels.filter(_._1 == c).map(_._2).sorted
      if (ls.length > 127)
        throw new IllegalArgumentException(
          s"$classname: column $c has too many levels to encode")
      c -> ls.zipWithIndex.map { case (l, i) =>
        l -> (i + startEncoding) }.toMap
    }.toMap
    this
  }

  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    columns.map { c =>
      val m = typedLit(mappings(c))
      val ordered = mappings(c).toSeq.sortBy(_._2).map(_._1)
      c -> when(col(c).isNotNull,
        element_at(m, col(c).cast("string"))).cast("int")
        .as(c, graft.core.CategoryMetadata.of(c, ordered))
    }
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "start_encoding" -> startEncoding)
  override def fitParams: Map[String, Any] = Map("mappings" -> mappings)
  override def restoreFit(fit: Map[String, Any]): this.type = {
    mappings = fit("mappings").asInstanceOf[Map[String, Map[String, Int]]]
    super.restoreFit(fit)
  }
}

/** Shared shape of the cross-column adjusters
  * (tubular/mapping.py:558-1107; deprecated there): rewrite
  * `adjustColumn` based on the values of OTHER columns. `rules` is an
  * ordered list of (conditionColumn, level -> value); rules apply
  * sequentially like the reference's chained `np.where`, so later
  * rules see (and can override or compound) earlier results.
  */
sealed abstract class BaseCrossColumnTransformer(
    val adjustColumn: String,
    val rules: Seq[(String, Seq[(String, Double)])]
) extends Transformer {
  val columns: Seq[String] = rules.map(_._1).distinct

  protected def combine(acc: Column, value: Double): Column

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireNumeric(df, Seq(adjustColumn))
    val adjusted = rules.foldLeft(col(adjustColumn).cast("double")) {
      case (acc, (c, levelValues)) =>
        levelValues.foldLeft(acc) { case (a, (level, v)) =>
          when(col(c).cast("string") === level, combine(a, v))
            .otherwise(a)
        }
    }
    Seq(adjustColumn -> adjusted)
  }
  override def columnsCheck(df: DataFrame): Unit = {
    super.columnsCheck(df)
    if (!df.columns.contains(adjustColumn))
      throw new IllegalArgumentException(
        s"$classname: variable $adjustColumn is not in X")
  }
  override def initParams: Map[String, Any] = Map(
    "adjust_column" -> adjustColumn, "mappings" -> rules)
}

/** Replace `adjustColumn` with a mapped constant where a condition
  * column hits a level (tubular/mapping.py:685-830).
  */
class CrossColumnMappingTransformer(adjustColumn: String,
    rules: Seq[(String, Seq[(String, Double)])])
  extends BaseCrossColumnTransformer(adjustColumn, rules) {
  override protected def combine(acc: Column, v: Double): Column = lit(v)
}

/** Multiply `adjustColumn` where a condition column hits a level;
  * multiple matching rules compound (tubular/mapping.py:908-1008).
  */
class CrossColumnMultiplyTransformer(adjustColumn: String,
    rules: Seq[(String, Seq[(String, Double)])])
  extends BaseCrossColumnTransformer(adjustColumn, rules) {
  override protected def combine(acc: Column, v: Double): Column =
    acc * lit(v)
}

/** Add to `adjustColumn` where a condition column hits a level;
  * multiple matching rules compound (tubular/mapping.py:1012-1107).
  */
class CrossColumnAddTransformer(adjustColumn: String,
    rules: Seq[(String, Seq[(String, Double)])])
  extends BaseCrossColumnTransformer(adjustColumn, rules) {
  override protected def combine(acc: Column, v: Double): Column =
    acc + lit(v)
}

/** Whole-year difference with correct leap-day handling
  * (tubular/dates.py:1973-2120): dates encode as yyyymmdd integers and
  * the difference floor-divides by 10000 — "age of columns(0) at
  * columns(1)", negative when the upper date precedes the lower.
  * `missingReplacement` fills null results.
  */
class DateDiffLeapYearTransformer(
    val columnLower: String,
    val columnUpper: String,
    val newColumnName: String,
    val missingReplacement: Option[Int] = None
) extends Transformer {
  val columns: Seq[String] = Seq(columnLower, columnUpper)

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    requireConsistentDatetime(df, columns)
    def enc(c: String): Column =
      year(col(c)).cast("long") * 10000 +
        month(col(c)).cast("long") * 100 + dayofmonth(col(c)).cast("long")
    val (c0, c1) = (enc(columnLower), enc(columnUpper))
    val diff = when(c1 < c0, -floorDiv(c0 - c1))
      .otherwise(floorDiv(c1 - c0)).cast("int")
    val filled = missingReplacement
      .map(r => coalesce(diff, lit(r))).getOrElse(diff)
    Seq(newColumnName -> filled)
  }
  // ANSI-safe integer floor-division of a non-negative yyyymmdd delta
  private def floorDiv(x: Column): Column = floor(x / lit(10000.0))

  override def featureNamesOut: Seq[String] = Seq(newColumnName)
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "new_column_name" -> newColumnName,
    "missing_replacement" -> missingReplacement.map(Int.box).orNull)
}

/** Boolean equality of two columns -> new column
  * (tubular/comparison.py:458-560; deprecated there). Nulls compare
  * unequal (pandas `==` semantics); note Spark treats NaN == NaN as
  * true where pandas does not — numeric-NaN inputs are the one
  * documented divergence.
  */
class EqualityChecker(
    val columnA: String,
    val columnB: String,
    val newColumnName: String,
    val dropOriginal: Boolean = false
) extends Transformer {
  val columns: Seq[String] = Seq(columnA, columnB)
  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    Seq(newColumnName -> coalesce(col(columnA) === col(columnB),
      lit(false)))
  override def transform(df: DataFrame): DataFrame = {
    val out = super.transform(df)
    if (dropOriginal) out.drop(columnA, columnB) else out
  }
  override def featureNamesOut: Seq[String] = Seq(newColumnName)
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "new_col_name" -> newColumnName,
    "drop_original" -> dropOriginal)
}

/** Concatenate columns as strings with a separator -> new column
  * (tubular/strings.py:953-1050; deprecated there). DOCUMENTED
  * DIVERGENCE: pandas renders missing values as the literal "nan";
  * here nulls are skipped by `concat_ws` (the SQL convention).
  */
class StringConcatenator(
    val columns: Seq[String],
    val newColumnName: String,
    val separator: String = " "
) extends Transformer {
  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    Seq(newColumnName ->
      concat_ws(separator, columns.map(col(_).cast("string")): _*))
  override def featureNamesOut: Seq[String] = Seq(newColumnName)
  override def initParams: Map[String, Any] = Map(
    "columns" -> columns, "new_column" -> newColumnName,
    "separator" -> separator)
}

/** Whitelisted re-expression of the reference's reflective
  * `SeriesStrMethodTransformer` (tubular/strings.py:812 — calls an
  * arbitrary `pd.Series.str` method by name). Reflection has no
  * engine-independent meaning, so instead each SUPPORTED method name
  * maps to the Catalyst expression with pandas semantics; an
  * unsupported name fails at construction (the reference defers the
  * failure to transform time — ours is earlier and typed). The
  * reference marks this class `jsonable = False`; ours registers
  * anyway (the whitelist makes init serialisable).
  *
  * Methods: lower, upper, title, strip, lstrip, rstrip, len,
  * contains(pat, regex=true), startswith(pat), endswith(pat),
  * replace(pat, repl, regex=false), slice(start, stop).
  */
class SeriesStrMethodTransformer(
    val newColumnName: String,
    val pdMethodName: String,
    val columns: Seq[String],
    val pdMethodKwargs: Map[String, Any] = Map.empty
) extends Transformer {
  require(columns.size == 1,
    s"$classname: exactly one column expected, got $columns")
  private def kwStr(k: String): String =
    pdMethodKwargs.getOrElse(k, throw new IllegalArgumentException(
      s"$classname: $pdMethodName requires kwarg '$k'")).toString
  private def kwBool(k: String, dflt: Boolean): Boolean =
    pdMethodKwargs.get(k).map(_.toString.toBoolean).getOrElse(dflt)
  private def kwInt(k: String): Int = kwStr(k).toDouble.toInt

  /** Build eagerly: unsupported methods / missing kwargs fail at init. */
  private val exprOf: Column => Column = pdMethodName match {
    case "lower" => lower(_)
    case "upper" => upper(_)
    // DOCUMENTED DIVERGENCE: pandas str.title() capitalises after ANY
    // non-letter ('a-b-c' -> 'A-B-C'); initcap breaks on whitespace
    // only ('A-b-c'). Pinned in DeprecatedOpsSpec.
    case "title" => initcap(_)
    // pandas strip() removes ALL whitespace (\t, \n, ...); Spark's
    // trim family removes spaces only — use regexp for parity
    case "strip" =>
      (c: Column) => regexp_replace(c, "^\\s+|\\s+$", "")
    case "lstrip" => (c: Column) => regexp_replace(c, "^\\s+", "")
    case "rstrip" => (c: Column) => regexp_replace(c, "\\s+$", "")
    case "len" => length(_)
    case "contains" =>
      val pat = kwStr("pat")
      if (kwBool("regex", dflt = true)) (c: Column) => c.rlike(pat)
      else (c: Column) => c.contains(pat)
    case "startswith" =>
      val pat = kwStr("pat"); (c: Column) => c.startsWith(pat)
    case "endswith" =>
      val pat = kwStr("pat"); (c: Column) => c.endsWith(pat)
    case "replace" =>
      val pat = kwStr("pat"); val repl = kwStr("repl")
      if (kwBool("regex", dflt = false))
        (c: Column) => regexp_replace(c, pat, repl)
      else (c: Column) => { // literal: pandas replace(regex=False)
        org.apache.spark.sql.functions.replace(c, lit(pat), lit(repl))
      }
    case "slice" =>
      // python s[start:stop], non-negative indices (pandas str.slice)
      val start = kwInt("start"); val stop = kwInt("stop")
      require(start >= 0 && stop >= start,
        s"$classname: slice supports 0 <= start <= stop")
      (c: Column) => substring(c, start + 1, stop - start)
    case other => throw new IllegalArgumentException(
      s"$classname: unsupported pd.Series.str method '$other' " +
        "(whitelist: lower upper title strip lstrip rstrip len " +
        "contains startswith endswith replace slice)")
  }

  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    Seq(newColumnName -> exprOf(col(columns.head).cast("string")))
  override def featureNamesOut: Seq[String] = Seq(newColumnName)
  override def initParams: Map[String, Any] = Map(
    "new_column_name" -> newColumnName,
    "pd_method_name" -> pdMethodName,
    "columns" -> columns,
    "pd_method_kwargs" -> pdMethodKwargs)
}

/** Whitelisted re-expression of the reference's reflective
  * `SeriesDtMethodTransformer` (tubular/dates.py:2131) — same design
  * as [[SeriesStrMethodTransformer]], with pandas `.dt` accessor
  * parity pinned where Spark's calendar functions differ:
  * `dayofweek` is Monday=0 (Spark's is Sunday=1), `dayofyear`,
  * `quarter`, `days_in_month`, `is_leap_year` (proleptic Gregorian
  * rule), `date` truncation.
  */
class SeriesDtMethodTransformer(
    val newColumnName: String,
    val pdMethodName: String,
    val columns: Seq[String]
) extends Transformer {
  require(columns.size == 1,
    s"$classname: exactly one column expected, got $columns")

  private val exprOf: Column => Column = pdMethodName match {
    case "year" => year(_)
    case "month" => month(_)
    case "day" => dayofmonth(_)
    case "hour" => hour(_)
    case "minute" => minute(_)
    case "second" => second(_)
    case "dayofweek" | "weekday" =>
      // pandas: Monday=0..Sunday=6; Spark dayofweek: Sunday=1..Sat=7
      (c: Column) => pmod(dayofweek(c) + lit(5), lit(7))
    case "dayofyear" => dayofyear(_)
    case "quarter" => quarter(_)
    case "days_in_month" | "daysinmonth" =>
      (c: Column) => dayofmonth(last_day(c))
    case "is_leap_year" =>
      (c: Column) => {
        val y = year(c)
        (y % 4 === 0 && y % 100 =!= 0) || y % 400 === 0
      }
    case "date" => to_date(_)
    case other => throw new IllegalArgumentException(
      s"$classname: unsupported pd.Series.dt method '$other' " +
        "(whitelist: year month day hour minute second dayofweek " +
        "dayofyear quarter days_in_month is_leap_year date)")
  }

  override def transformExprs(df: DataFrame): Seq[(String, Column)] =
    Seq(newColumnName -> exprOf(col(columns.head)))
  override def featureNamesOut: Seq[String] = Seq(newColumnName)
  override def initParams: Map[String, Any] = Map(
    "new_column_name" -> newColumnName,
    "pd_method_name" -> pdMethodName,
    "columns" -> columns)
}

/** Whitelisted re-expression of the reference's reflective
  * `DataFrameMethodTransformer` (tubular/base.py:643-800 — applies an
  * arbitrary `pd.DataFrame` method to the selected sub-frame:
  * `X[new_column_names] = X[columns].method(**kwargs)`). Two bounded
  * method families cover every concrete use in the reference's own
  * tests (tests/base/test_DataFrameMethodTransformer.py: `sum` with
  * `axis=1`, `div` with `other=2`):
  *
  *   - row-wise reductions with kwarg `axis=1` — `sum`, `min`, `max`,
  *     `mean` — ONE new column; pandas `skipna=True` semantics: nulls
  *     are ignored; an all-null row sums to 0.0 and min/max/mean to
  *     null (Spark's `least`/`greatest` and null-safe arithmetic give
  *     exactly this);
  *   - element-wise arithmetic with a scalar kwarg `other` — `add`,
  *     `sub`, `mul`, `div`, `pow`, `mod` — plus unary `abs`: one new
  *     column PER input column (`newColumnNames.size == columns.size`),
  *     null in -> null out. `mod` follows the Python/pandas sign rule
  *     (result takes the DIVISOR's sign: `-3 % 2 == 1`), not Java's.
  *
  * Everything is a plain codegen'd projection — a pipeline of these
  * fuses into the same single map-only stage as every other
  * transformer. Outputs are DoubleType (pandas float64 promotion).
  */
class DataFrameMethodTransformer(
    val newColumnNames: Seq[String],
    val pdMethodName: String,
    val columns: Seq[String],
    val pdMethodKwargs: Map[String, Any] = Map.empty
) extends Transformer {
  require(columns.nonEmpty, s"$classname: columns must be non-empty")

  private def kwNum(k: String): Double =
    pdMethodKwargs.getOrElse(k, throw new IllegalArgumentException(
      s"$classname: $pdMethodName requires kwarg '$k'"))
      .toString.toDouble
  private def kwIntOpt(k: String): Option[Int] =
    pdMethodKwargs.get(k).map(_.toString.toDouble.toInt)

  private val reductions = Set("sum", "min", "max", "mean")
  private val elementwiseBinary =
    Set("add", "sub", "mul", "div", "pow", "mod")

  private def d(c: String): Column = col(c).cast("double")

  /** Built eagerly: unsupported methods / wrong arity / missing
    * kwargs fail at init, like the reference's getattr probe (but
    * typed instead of reflective).
    */
  private val outputExprs: Seq[Column] = pdMethodName match {
    case m if reductions(m) =>
      require(kwIntOpt("axis").contains(1),
        s"$classname: $m requires kwarg axis=1 (row-wise over the " +
          "selected columns; axis=0 would be a fit-time aggregate, " +
          "not a row transform)")
      require(newColumnNames.size == 1,
        s"$classname: $m(axis=1) produces exactly one column, got " +
          s"new_column_names=$newColumnNames")
      val cols = columns.map(d)
      val expr = m match {
        // pandas skipna: nulls drop out; all-null row -> sum 0.0,
        // min/max/mean null
        case "sum" =>
          cols.map(coalesce(_, lit(0.0))).reduce(_ + _)
        case "min" => least(cols: _*)
        case "max" => greatest(cols: _*)
        case "mean" =>
          val n = cols.map(c =>
            when(c.isNotNull, lit(1.0)).otherwise(lit(0.0)))
            .reduce(_ + _)
          when(n > 0,
            cols.map(coalesce(_, lit(0.0))).reduce(_ + _) / n)
      }
      Seq(expr)
    case m if elementwiseBinary(m) =>
      val other = kwNum("other")
      require(newColumnNames.size == columns.size,
        s"$classname: element-wise $m writes one column per input " +
          s"column (${columns.size}), got " +
          s"new_column_names=$newColumnNames")
      val op: Column => Column = m match {
        case "add" => _ + other
        case "sub" => _ - other
        case "mul" => _ * other
        case "div" => _ / other
        case "pow" => pow(_, other)
        // Python sign rule (result follows the divisor): r = a % n,
        // then r + n when r's nonzero sign differs from n's
        // (-3 % 2 == 1, 3 % -2 == -1). Spark's pmod is NOT this — it
        // only lifts negative remainders, so pmod(3, -2) stays 1.
        // The final + 0.0 canonicalizes IEEE negative zero (Java's %
        // yields -0.0 for e.g. -21.0 % 7.0; Python's float % yields
        // +0.0 there, and the q140 oracle's ((x%n)+n)%n chain always
        // lands on +0.0) — it changes no other value: x + 0.0 == x
        // for every non-zero x, NaN and null propagate.
        case "mod" => c => {
          val r = c % other
          val needsShift = if (other < 0) r > 0 else r < 0
          when(needsShift, r + other).otherwise(r) + lit(0.0)
        }
      }
      columns.map(c => op(d(c)))
    case "abs" =>
      require(newColumnNames.size == columns.size,
        s"$classname: abs writes one column per input column " +
          s"(${columns.size}), got new_column_names=$newColumnNames")
      columns.map(c => abs(d(c)))
    case other => throw new IllegalArgumentException(
      s"$classname: unsupported pd.DataFrame method '$other' " +
        "(whitelist: sum min max mean [axis=1]; " +
        "add sub mul div pow mod [other=scalar]; abs)")
  }

  override def transformExprs(df: DataFrame): Seq[(String, Column)] = {
    // typed guard: the whitelist is arithmetic-only, so a string
    // column is a caller bug, not a silent null cascade
    requireNumeric(df, columns)
    newColumnNames.zip(outputExprs)
  }
  override def featureNamesOut: Seq[String] = newColumnNames
  override def initParams: Map[String, Any] = Map(
    "new_column_names" -> newColumnNames,
    "pd_method_name" -> pdMethodName,
    "columns" -> columns,
    "pd_method_kwargs" -> pdMethodKwargs)
}
