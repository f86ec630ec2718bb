package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.ImageTable
import graft.temporal.AsOfJoin

/** Stage-level scaling probe (dev tool). args: cpus n stage */
object FlagProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val stage = if (args.length > 2) args(2) else "flagship"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/tmp/sparklogs"))
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", "/tmp/sparklogs")
      .config("spark.eventLog.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val rows = stage match {
        case "gen" =>
          ImageTable.events(spark, n, 5).agg(sum(length(col("image_id"))))
            .head(); n * 5
        case "asof" =>
          val evs = ImageTable.events(spark, n, 5)
          val snaps = ImageTable.snapshots(spark, n)
          AsOfJoin.join(evs, snaps, "image_id", "event_ts", "feature_ts",
            Seq("caption_at", "phash_at", "feat"))
            .agg(sum(col("phash_at")), sum(col("feat"))).head(); n * 5
        case "decode3" =>
          val imgs = ImageTable.images(spark, n)
            .withColumn("w", lit(192)).withColumn("h", lit(192))
          graft.multimodal.Multimodal.withDecodeFeatures(imgs,
            graft.multimodal.Multimodal.SyntheticPixelDecoder)
            .agg(avg(col("mean_luma"))).head(); n
        case "decode" =>
          val imgs = ImageTable.images(spark, n, minDim = 48, maxDim = 96)
          graft.multimodal.Multimodal.withDecodeFeatures(imgs,
            graft.multimodal.Multimodal.SyntheticPixelDecoder)
            .agg(avg(col("mean_luma"))).head(); n
        case "joined" =>
          val r = graft.Flagship.joinedInput(spark, n, 5).count(); r
        case "fit" =>
          graft.Flagship.fitPipeline(spark, n, 5); n
        case "xform" =>
          // pre-fit ONCE outside the timed region on a small slice,
          // then time the transform-only pass over the full input
          val pipe = graft.Flagship.fitPipeline(spark,
            math.max(1000L, n / 100), 5)
          val t1 = System.nanoTime()
          val r = pipe.transform(
            graft.Flagship.joinedInput(spark, n, 5)).count()
          println(f"[probe] xform-only sec=${(System.nanoTime() - t1) / 1e9}%.2f")
          r
        case "fits" =>
          // per-transformer fit attribution over the persisted input
          val joined = graft.Flagship.joinedInput(spark, n, 5)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val fitIn = joined.filter(col("matched_ts").isNotNull)
          fitIn.count() // materialize the cache untimed
          graft.Flagship.pipelineDef().steps.foreach { case (nm, t) =>
            val f0 = System.nanoTime()
            if (t.needsFit) t.fit(fitIn)
            println(f"[probe] fit $nm sec=${(System.nanoTime() - f0) / 1e9}%.2f")
          }
          joined.unpersist(); n
        case "fitsketch" =>
          val joined = graft.Flagship.joinedInput(spark, n, 5)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val fitIn = joined.filter(col("matched_ts").isNotNull)
          fitIn.count()
          val f0 = System.nanoTime()
          new graft.operators.CappingTransformer(
            quantiles = Map("feat" -> (Some(0.01), Some(0.99))),
            histogramBins = Some(512)).fit(fitIn)
          println(f"[probe] fit cap_feat(sketch512) sec=${(System.nanoTime() - f0) / 1e9}%.2f")
          joined.unpersist(); n
        case "flagnc" =>
          val r = graft.Flagship.features(spark, n, 5,
            cacheFitInput = false).count(); r
        case "flagdecode" =>
          val r = graft.Flagship.featuresWithDecode(spark, n, 5)
            .agg(sum(col("mean_luma"))).head(); spark.catalog.clearCache(); n
        case _ =>
          val r = graft.Flagship.features(spark, n, 5).count()
          spark.catalog.clearCache(); r
      }
      println(f"[probe] stage=$stage cpus=$cpus rep$i rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
