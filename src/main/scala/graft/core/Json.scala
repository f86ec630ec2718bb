package graft.core

import graft.operators._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.apache.spark.sql.types.DataType

/** JSON round-trip of (fitted) transformers and pipelines.
  *
  * Envelope matches the reference's
  * `{tubular_version, classname, init: {...}, fit: {...}}`
  * (tubular/base.py:246-337); keys are emitted sorted for determinism
  * (tubular/_utils.py:288-322). A transformer rebuilt from JSON is
  * transform-only (tubular/_utils.py:251-272).
  */
object Json {

  val Version = "0.1.0"

  // ---- encode ----------------------------------------------------------

  def toJValue(v: Any): JValue = v match {
    case null => JNull
    case None => JNull
    case Some(x) => toJValue(x)
    case b: Boolean => JBool(b)
    case i: Int => JLong(i.toLong)
    case l: Long => JLong(l)
    case d: Double => JDouble(d)
    case f: Float => JDouble(f.toDouble)
    case s: String => JString(s)
    case m: Map[_, _] =>
      JObject(m.toSeq.map { case (k, x) =>
        JField(String.valueOf(k), toJValue(x)) }.sortBy(_._1).toList)
    case s: Seq[_] => JArray(s.map(toJValue).toList)
    case (a, b) => JArray(List(toJValue(a), toJValue(b)))
    case other => JString(other.toString)
  }

  def transformerToJson(t: Transformer): String = {
    val env = JObject(List(
      JField("graftspark_version", JString(Version)),
      JField("classname", JString(t.classname)),
      JField("init", toJValue(t.initParamsFull)),
      JField("fit", toJValue(t.fitParams))))
    JsonMethods.compact(JsonMethods.render(env))
  }

  // ---- decode helpers --------------------------------------------------

  def fromJValue(v: JValue): Any = v match {
    case JNull | JNothing => null
    case JBool(b) => b
    case JLong(l) => l
    case JInt(i) => i.toLong
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JString(s) => s
    case JObject(fields) =>
      fields.map { case JField(k, x) => k -> fromJValue(x) }.toMap
    case JArray(items) => items.map(fromJValue)
    case JSet(items) => items.map(fromJValue)
  }

  private class P(init: Map[String, Any]) {
    def str(k: String): String = init(k).asInstanceOf[String]
    def strOpt(k: String): Option[String] =
      init.get(k).flatMap(Option(_)).map(_.asInstanceOf[String])
    def dbl(k: String): Double = init(k) match {
      case d: Double => d; case l: Long => l.toDouble
      case i: Int => i.toDouble
      case x => x.toString.toDouble
    }
    def dblOpt(k: String): Option[Double] =
      init.get(k).flatMap(Option(_)).map(_ =>dbl(k))
    def int(k: String): Int = init(k) match {
      case l: Long => l.toInt; case i: Int => i
      case x => x.toString.toInt
    }
    def intOpt(k: String): Option[Int] =
      init.get(k).flatMap(Option(_)).map(_ => int(k))
    def bool(k: String): Boolean = init(k).asInstanceOf[Boolean]
    def strs(k: String): Seq[String] =
      init(k).asInstanceOf[Seq[Any]].map(String.valueOf)
    def dbls(k: String): Seq[Double] =
      init(k).asInstanceOf[Seq[Any]].map {
        case d: Double => d; case l: Long => l.toDouble
        case x => x.toString.toDouble
      }
    def map(k: String): Map[String, Any] =
      init(k).asInstanceOf[Map[String, Any]]
    def raw(k: String): Any = init(k)
  }

  private def capsOf(m: Map[String, Any])
      : Map[String, (Option[Double], Option[Double])] =
    m.map { case (c, v) =>
      val s = v.asInstanceOf[Seq[Any]]
      def d(x: Any): Option[Double] = Option(x).map {
        case dd: Double => dd; case l: Long => l.toDouble
        case o => o.toString.toDouble
      }
      c -> (d(s(0)), d(s(1)))
    }

  /** classname -> builder from parsed init map. */
  val registry: Map[String, Map[String, Any] => Transformer] = Map(
    "DataFrameMethodTransformer" -> (i => {
      val p = new P(i)
      new DataFrameMethodTransformer(p.strs("new_column_names"),
        p.str("pd_method_name"), p.strs("columns"),
        i.get("pd_method_kwargs").map(_.asInstanceOf[Map[String, Any]])
          .getOrElse(Map.empty)) }),
    "SeriesStrMethodTransformer" -> (i => {
      val p = new P(i)
      new SeriesStrMethodTransformer(p.str("new_column_name"),
        p.str("pd_method_name"), p.strs("columns"),
        i.get("pd_method_kwargs").map(_.asInstanceOf[Map[String, Any]])
          .getOrElse(Map.empty)) }),
    "SeriesDtMethodTransformer" -> (i => {
      val p = new P(i)
      new SeriesDtMethodTransformer(p.str("new_column_name"),
        p.str("pd_method_name"), p.strs("columns")) }),
    "QuantileBinnerTransformer" -> (i => {
      val p = new P(i)
      new QuantileBinnerTransformer(p.strs("columns"),
        p.int("n_bins"), p.strOpt("weights_column"),
        p.str("suffix")) }),
    "HashingEncoderTransformer" -> (i => {
      val p = new P(i)
      new HashingEncoderTransformer(p.strs("columns"),
        p.int("n_features"), p.str("hash"), p.bool("signed")) }),
    "JsonFieldExtractor" -> (i => {
      val p = new P(i)
      val fields = i("fields").asInstanceOf[Seq[Any]].map { f =>
        val s = f.asInstanceOf[Seq[Any]].map(String.valueOf)
        (s(0), s(1), s(2))
      }
      new JsonFieldExtractor(p.str("column"), fields) }),
    "VectorL2NormalizeTransformer" -> (i =>
      new VectorL2NormalizeTransformer(new P(i).strs("columns"))),
    "RobustScalingTransformer" -> (i => {
      val p = new P(i)
      val qr = i("quantile_range").asInstanceOf[Seq[Any]].map {
        case d: Double => d
        case x => x.toString.toDouble
      }
      new RobustScalingTransformer(p.strs("columns"), (qr(0), qr(1)),
        p.strOpt("weights_column")) }),
    "YeoJohnsonTransformer" -> (i => {
      val p = new P(i)
      val grid = i("grid").asInstanceOf[Seq[Any]].map {
        case d: Double => d
        case l: Long => l.toDouble
        case x => x.toString.toDouble
      }
      new YeoJohnsonTransformer(p.strs("columns"), grid) }),
    "CountEncoderTransformer" -> (i => {
      val p = new P(i)
      new CountEncoderTransformer(p.strs("columns"), p.bool("normalize"),
        p.strOpt("weights_column"), p.dbl("unseen_value")) }),
    "WoeEncoderTransformer" -> (i => {
      val p = new P(i)
      new WoeEncoderTransformer(p.strs("columns"),
        p.str("response_column"), p.dbl("regularization"),
        p.strOpt("weights_column")) }),
    "HashedCrossEncoder" -> (i => {
      val p = new P(i)
      new HashedCrossEncoder(p.strs("columns"), p.int("num_buckets"),
        p.str("output_col")) }),
    "ArbitraryImputer" -> (i => {
      val p = new P(i); new ArbitraryImputer(p.strs("columns"),
        p.raw("impute_value")) }),
    "MeanImputer" -> (i => {
      val p = new P(i)
      new MeanImputer(p.strs("columns"), p.strOpt("weights_column")) }),
    "MedianImputer" -> (i => {
      val p = new P(i)
      new MedianImputer(p.strs("columns"), p.strOpt("weights_column")) }),
    "ModeImputer" -> (i => {
      val p = new P(i)
      new ModeImputer(p.strs("columns"), p.strOpt("weights_column")) }),
    "NullIndicator" -> (i => new NullIndicator(new P(i).strs("columns"))),
    "CappingTransformer" -> (i => {
      val p = new P(i)
      new CappingTransformer(capsOf(p.map("capping_values")),
        capsOf(p.map("quantiles")), p.strOpt("weights_column"),
        p.intOpt("histogram_bins")) }),
    "OutOfRangeNullTransformer" -> (i => {
      val p = new P(i)
      new OutOfRangeNullTransformer(capsOf(p.map("capping_values")),
        capsOf(p.map("quantiles")), p.strOpt("weights_column"),
        p.intOpt("histogram_bins")) }),
    "GroupRareLevelsTransformer" -> (i => {
      val p = new P(i)
      new GroupRareLevelsTransformer(p.strs("columns"),
        p.dbl("cut_off_percent"), p.str("rare_level_name"),
        p.strOpt("weights_column"), p.bool("unseen_levels_to_rare"),
        p.bool("record_rare_levels")) }),
    "MeanResponseTransformer" -> (i => {
      val p = new P(i)
      val unseen: Option[Either[Double, String]] =
        i.get("unseen_level_handling").flatMap(Option(_)).map {
          case s: String => Right(s)
          case d: Double => Left(d)
          case l: Long => Left(l.toDouble)
          case x => Left(x.toString.toDouble)
        }
      new MeanResponseTransformer(p.strs("columns"),
        p.str("response_column"), p.dbl("prior"),
        p.strOpt("weights_column"), unseen, p.strs("level"),
        p.str("return_type")) }),
    "OneHotEncodingTransformer" -> (i => {
      val p = new P(i)
      new OneHotEncodingTransformer(p.strs("columns"), p.str("separator"),
        p.map("wanted_values").map { case (k, v) =>
          k -> v.asInstanceOf[Seq[Any]].map(String.valueOf) },
        p.bool("drop_original")) }),
    "MappingTransformer" -> (i => {
      val p = new P(i)
      new MappingTransformer(
        p.map("mappings").map { case (c, m) =>
          c -> m.asInstanceOf[Map[String, Any]].map { case (k, v) =>
            (if (k == "null") None else Some(k)) -> v } },
        p.map("return_dtypes").map { case (c, d) =>
          c -> DataType.fromDDL(String.valueOf(d)) }) }),
    "ToDatetimeTransformer" -> (i => {
      val p = new P(i)
      new ToDatetimeTransformer(p.strs("columns"),
        p.strOpt("time_format")) }),
    "DateDifferenceTransformer" -> (i => {
      val p = new P(i)
      new DateDifferenceTransformer(p.str("column_lower"),
        p.str("column_upper"), p.strOpt("new_column_name"),
        p.str("units"), p.intOpt("custom_days")) }),
    "BetweenDatesTransformer" -> (i => {
      val p = new P(i)
      new BetweenDatesTransformer(p.str("column_lower"),
        p.str("column_between"), p.str("column_upper"),
        p.str("new_column_name"), p.bool("lower_inclusive"),
        p.bool("upper_inclusive")) }),
    "DatetimeInfoExtractor" -> (i => {
      val p = new P(i)
      new DatetimeInfoExtractor(p.strs("columns"), p.strs("include"),
        p.map("datetime_mappings").map { case (k, m) =>
          k -> m.asInstanceOf[Map[String, Any]].map { case (n, s) =>
            n.toInt -> String.valueOf(s) } }) }),
    "DatetimeComponentExtractor" -> (i => {
      val p = new P(i)
      new DatetimeComponentExtractor(p.strs("columns"),
        p.strs("include")) }),
    "DatetimeSinusoidCalculator" -> (i => {
      val p = new P(i)
      new DatetimeSinusoidCalculator(p.strs("columns"), p.strs("method"),
        p.map("units").map { case (k, v) => k -> String.valueOf(v) },
        p.map("period").map { case (k, v) => k -> (v match {
          case d: Double => d; case l: Long => l.toDouble
          case x => x.toString.toDouble }) }) }),
    "DifferenceTransformer" -> (i => {
      val p = new P(i)
      new DifferenceTransformer(p.str("column_a"), p.str("column_b"),
        p.strOpt("new_column_name")) }),
    "RatioTransformer" -> (i => {
      val p = new P(i)
      new RatioTransformer(p.str("column_a"), p.str("column_b"),
        p.strOpt("new_column_name")) }),
    "OneDKmeansTransformer" -> (i => {
      val p = new P(i)
      new OneDKmeansTransformer(p.str("column"), p.str("new_column_name"),
        p.int("n_clusters"), p.int("max_iter"), p.bool("drop_original")) }),
    "AggregateRowsOverColumnTransformer" -> (i => {
      val p = new P(i)
      new AggregateRowsOverColumnTransformer(p.strs("columns"),
        p.strs("aggregations"), p.str("key"),
        // absent in pre-round-3 dumps -> the default (true)
        if (i.contains("broadcast_stats")) p.bool("broadcast_stats")
        else true) }),
    "AggregateColumnsOverRowTransformer" -> (i => {
      val p = new P(i)
      new AggregateColumnsOverRowTransformer(p.strs("columns"),
        p.strs("aggregations")) }),
    "LowerCaseTransformer" ->
      (i => new LowerCaseTransformer(new P(i).strs("columns"))),
    "RemoveCharactersTransformer" -> (i => {
      val p = new P(i)
      new RemoveCharactersTransformer(p.strs("columns"),
        p.strs("characters_to_remove")) }),
    "StringContainsTransformer" -> (i => {
      val p = new P(i)
      new StringContainsTransformer(p.strs("columns"),
        if (p.bool("reference_is_column")) Right(p.str("reference"))
        else Left(p.str("reference")),
        p.strOpt("new_column_suffix")) }),
    "ExtractStringComponentsTransformer" -> (i => {
      val p = new P(i)
      new ExtractStringComponentsTransformer(p.strs("columns"),
        p.str("by"), p.int("n_entries")) }),
    "CompareTwoColumnsTransformer" -> (i => {
      val p = new P(i)
      new CompareTwoColumnsTransformer(p.str("column_a"),
        p.str("column_b"), p.str("op"), p.strOpt("new_column_name")) }),
    "WhenThenOtherwiseTransformer" -> (i => {
      val p = new P(i)
      new WhenThenOtherwiseTransformer(p.strs("columns"),
        p.str("when_column"), p.str("then_column")) }),
    "SetValueTransformer" -> (i => {
      val p = new P(i)
      new SetValueTransformer(p.strs("columns"), p.raw("value")) }),
    "RenameColumnsTransformer" -> (i => {
      val p = new P(i)
      new RenameColumnsTransformer(p.map("mappings").map {
        case (k, v) => k -> String.valueOf(v) }) }),
    "ColumnDtypeSetter" -> (i => {
      val p = new P(i)
      new ColumnDtypeSetter(p.strs("columns"), p.str("dtype")) })
  )

  def transformerFromJson(json: String): Transformer = {
    val parsed = JsonMethods.parse(json)
    val classname = (parsed \ "classname") match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException("missing classname")
    }
    val init = fromJValue(parsed \ "init") match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => throw new IllegalArgumentException(
        s"missing or non-object 'init' for $classname " +
          "(a builder fed null would NPE opaquely)")
    }
    val fit = fromJValue(parsed \ "fit") match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty[String, Any]
    }
    val builder = registry.getOrElse(classname,
      throw new IllegalArgumentException(
        s"unknown transformer classname $classname"))
    val t = builder(init)
    // reference BaseTransformer args every tubular config may carry
    // (base.py:166-214): carried through so a re-emit round-trips
    // field-for-field (builders themselves ignore them)
    val passthrough = init.view
      .filterKeys(PassthroughInitKeys.contains).toMap
    if (passthrough.nonEmpty) t.setPassthroughInit(passthrough)
    if (fit.nonEmpty) restoreFitTyped(t, fit)
    t.markTransformOnly()
    t
  }

  /** tubular/base.py:166-214 — accepted by every reference
    * transformer's __init__, inert on Spark (see
    * Transformer.passthroughInit).
    */
  private val PassthroughInitKeys =
    Set("verbose", "copy", "return_native")

  /** Re-coerce parsed JSON structures to the shapes restoreFit expects. */
  private def restoreFitTyped(t: Transformer, fit: Map[String, Any]): Unit =
    t match {
      case b: BaseImputer =>
        b.restoreFit(fit); ()
      case c: BaseCapping =>
        c.fittedCaps = capsOf(
          fit("capping_values").asInstanceOf[Map[String, Any]])
        c.restoreFit(Map("capping_values" -> fit("capping_values")
          .asInstanceOf[Map[String, Any]].map { case (k, v) =>
            k -> v.asInstanceOf[Seq[Any]].map {
              case null => null
              case d: Double => Double.box(d)
              case l: Long => Double.box(l.toDouble)
              case x => Double.box(x.toString.toDouble)
            } })); ()
      case g: GroupRareLevelsTransformer =>
        g.nonRareLevels = strSeqMap(fit("non_rare_levels"))
        g.rareLevelsRecord = strSeqMap(fit("rare_levels_record_"))
        g.trainingLevels = strSeqMap(fit("training_data_levels"))
        g.restoreFit(Map("non_rare_levels" -> g.nonRareLevels,
          "rare_levels_record_" -> g.rareLevelsRecord,
          "training_data_levels" -> g.trainingLevels)); ()
      case m: MeanResponseTransformer =>
        val maps = fit("mappings").asInstanceOf[Map[String, Any]]
          .map { case (k, v) =>
            k -> v.asInstanceOf[Map[String, Any]].map { case (l, d) =>
              l -> anyToDouble(d) } }
        val unseen = fit("unseen_levels_encoding_dict")
          .asInstanceOf[Map[String, Any]].map { case (k, v) =>
            k -> anyToDouble(v) }
        val encCols = fit("encoded_columns").asInstanceOf[Seq[Any]]
          .map(String.valueOf)
        m.restoreFit(Map("mappings" -> maps,
          "unseen_levels_encoding_dict" -> unseen,
          "encoded_columns" -> encCols)); ()
      case o: OneHotEncodingTransformer =>
        o.restoreFit(Map("categories_" -> strSeqMap(fit("categories_"))))
        ()
      case k: OneDKmeansTransformer =>
        k.restoreFit(Map("bins" -> fit("bins").asInstanceOf[Seq[Any]]
          .map(anyToDouble))); ()
      case c: CountEncoderTransformer =>
        c.restoreFit(Map("counts_" -> nestedDblMap(fit("counts_")))); ()
      case w: WoeEncoderTransformer =>
        w.restoreFit(Map("mappings" -> nestedDblMap(fit("mappings")))); ()
      case other =>
        other.restoreFit(fit); ()
    }

  private def nestedDblMap(v: Any): Map[String, Map[String, Double]] =
    v.asInstanceOf[Map[String, Any]].map { case (k, m) =>
      k -> m.asInstanceOf[Map[String, Any]].map { case (l, d) =>
        l -> anyToDouble(d) } }

  private def strSeqMap(v: Any): Map[String, Seq[String]] =
    v.asInstanceOf[Map[String, Any]].map { case (k, s) =>
      k -> s.asInstanceOf[Seq[Any]].map(String.valueOf) }

  private def anyToDouble(v: Any): Double = v match {
    case d: Double => d
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case x => x.toString.toDouble
  }
}
