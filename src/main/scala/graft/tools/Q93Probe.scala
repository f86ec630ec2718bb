package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 stage-level probe for q93 (incremental dedup against the
  * stored MinHash index): times each sub-stage with the noop sink so
  * optimization targets the stage that actually costs (guide §1).
  */
object Q93Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.MinhashIndex

    def corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def batch = corpus.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))

    def fingerprint(): Long = corpus
      .agg(expr("bit_xor(xxhash64(doc_id, text))").as("fp"))
      .head().getLong(0)
    val fp = fingerprint()
    val root = s"/tmp/graft_mhidx_q93_${java.lang.Long.toHexString(fp)}"
    if (graft.io.SnapshotStore.latestSnapshot(s"$root/bands").isEmpty)
      MinhashIndex.build(corpus, "doc_id", "text", root)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.dedup.Dedup
    // inline re-expression of batchNearDups with the candidate-pair
    // relation truncated by a LAZY localCheckpoint so its band
    // subtree executes once for all three consumers
    def batchNearDupsCkpt(): org.apache.spark.sql.DataFrame = {
      val p = MinhashIndex.params(root)
      val newBands = Dedup.bandRows(batch, "doc_id", "text",
        p.shingleSize, p.numHashes, p.bands)
        .select(col("__id").cast("long").as("id"), col("band"),
          col("bh"))
        .repartition(col("band"), col("bh"))
      val stored = MinhashIndex.bands(spark, root)
      val vsCorpus = newBands.join(
        stored.select(col("id").as("old_id"), col("band"), col("bh")),
        Seq("band", "bh"))
        .filter(col("id") =!= col("old_id"))
        .select(least(col("id"), col("old_id")).as("id_a"),
          greatest(col("id"), col("old_id")).as("id_b"))
      val a = newBands.select(col("id").as("id_a"), col("band"),
        col("bh"))
      val b = newBands.select(col("id").as("id_b"), col("band"),
        col("bh"))
      val within = a.join(b, Seq("band", "bh"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      val cands = vsCorpus.unionByName(within).distinct()
        .localCheckpoint(false)
      val candIds = cands.select(col("id_a").as("cid"))
        .unionByName(cands.select(col("id_b").as("cid"))).distinct()
      val texts = corpus
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .unionByName(batch
          .select(col("doc_id").cast("long").as("doc_id"), col("text")))
        .join(candIds, col("doc_id") === col("cid"), "left_semi")
      Dedup.verifyJaccard(cands, texts, "doc_id", "text", 0.5,
        p.shingleSize)
    }

    val stages: Seq[(String, () => Unit)] = Seq(
      ("fingerprint agg", () => { fingerprint(); () }),
      ("stored bands read", () =>
        noop(MinhashIndex.bands(spark, root))),
      ("batchNearDups", () =>
        noop(MinhashIndex.batchNearDups(batch, corpus, "doc_id",
          "text", root, 0.5))),
      ("batchNearDups ckpt", () => noop(batchNearDupsCkpt())),
      ("cands only", () => {
        val p = MinhashIndex.params(root)
        val newBands = Dedup.bandRows(batch, "doc_id", "text",
          p.shingleSize, p.numHashes, p.bands)
          .select(col("__id").cast("long").as("id"), col("band"),
            col("bh"))
          .repartition(col("band"), col("bh"))
        val stored = MinhashIndex.bands(spark, root)
        val vsCorpus = newBands.join(
          stored.select(col("id").as("old_id"), col("band"),
            col("bh")),
          Seq("band", "bh"))
          .filter(col("id") =!= col("old_id"))
          .select(least(col("id"), col("old_id")).as("id_a"),
            greatest(col("id"), col("old_id")).as("id_b"))
        val a = newBands.select(col("id").as("id_a"), col("band"),
          col("bh"))
        val b = newBands.select(col("id").as("id_b"), col("band"),
          col("bh"))
        val within = a.join(b, Seq("band", "bh"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b")
        noop(vsCorpus.unionByName(within).distinct())
      }),
      ("batch shingle sets", () =>
        noop(Dedup.shingleSetsOf(
          corpus.select(col("doc_id").cast("long").as("doc_id"),
            col("text"))
            .unionByName(batch), "doc_id", "text", 3))),
      ("full q93 body", () => {
        val f = fingerprint()
        val r = s"/tmp/graft_mhidx_q93_${java.lang.Long.toHexString(f)}"
        noop(MinhashIndex.batchNearDups(batch, corpus, "doc_id",
          "text", r, 0.5)
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id_a", "id_b"))
      }))
    // interleave stage reps round-robin: the box's external CPU steal
    // drifts on minute scale, so consecutive per-stage reps would
    // compare different machines
    stages.foreach { case (_, f) => f(); spark.catalog.clearCache() }
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to 3).foreach { _ =>
      stages.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f()
        spark.catalog.clearCache()
        times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    stages.foreach { case (name, _) =>
      val ts = times(name)
      println(f"[q93probe] $name%-20s min=${ts.min}%6.3f s raw=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
