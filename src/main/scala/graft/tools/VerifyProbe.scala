package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-6 interleaved A/B probe for the MinHash pair-verify shapes
  * (dev tool): the sandbox shows minute-scale external CPU-steal
  * drift, so back-to-back runs of two binaries cannot be compared —
  * this interleaves the variants rep by rep inside ONE JVM (the same
  * methodology the frozen bench uses for the skew variants) and
  * reports per-variant minima.
  *
  * Variants of q41 (`minhashNearDups`):
  *   A  unrestricted verify (round-5 shape: shingle kernel over the
  *      whole corpus, candidate pairs used once)
  *   B  candidate-id semi-restricted texts, pairs NOT persisted
  *      (three re-plans of the band-join subtree)
  *   C  candidate-id semi-restricted texts, pairs persisted (shipped)
  */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "5").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.Dedup

    def docs = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      d.unionByName(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text")))
    }

    def pairJoin(cands: DataFrame, sh: DataFrame): DataFrame =
      Dedup.jaccardOfPairs(cands
        .join(sh.withColumnRenamed("__id", "id_a")
          .withColumnRenamed("__sh", "sh_a"), Seq("id_a"))
        .join(sh.withColumnRenamed("__id", "id_b")
          .withColumnRenamed("__sh", "sh_b"), Seq("id_b"))
        .repartition(cpus))
        .filter(col("jaccard") >= 0.5)

    def variantA(): Long = {
      val d = docs
      val cands = Dedup.lshCandidates(d, "doc_id", "text")
      val sh = Dedup.shingleSetsOf(d, "doc_id", "text", 3)
      val n = pairJoin(cands, sh).count()
      spark.catalog.clearCache(); n
    }
    def restricted(persist: Boolean): Long = {
      val d = docs
      val cands0 = Dedup.lshCandidates(d, "doc_id", "text")
      val cands =
        if (persist) cands0.persist(StorageLevel.MEMORY_AND_DISK)
        else cands0
      val candIds = cands.select(col("id_a").as("__cid"))
        .unionByName(cands.select(col("id_b").as("__cid"))).distinct()
      val sh = Dedup.shingleSetsOf(
        d.join(candIds, col("doc_id") === col("__cid"), "left_semi"),
        "doc_id", "text", 3)
      val n = pairJoin(cands, sh).count()
      spark.catalog.clearCache(); n
    }

    val variants: Seq[(String, () => Long)] = Seq(
      ("A unrestricted", () => variantA()),
      ("B restrict", () => restricted(false)),
      ("C restrict+persist", () => restricted(true)))
    // warmup each once
    variants.foreach { case (n, f) =>
      val c = f(); System.err.println(s"[vprobe] warmup $n count=$c") }
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      variants.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f()
        times(n) = times(n) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (n, _) =>
      val ts = times(n)
      println(f"[vprobe] $n%-20s min=${ts.min}%6.3f s raw=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
