package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 stage-level probe for the MinHash dedup path (dev tool):
  * times each sub-stage of q41/q83 with the noop sink so the
  * optimization targets the stage that actually costs (guide §1).
  */
object DedupProbe {
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
    import graft.dedup.{Components, Dedup}

    def docs = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
      d.unionByName(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text"),
          col("lang"), col("source"), col("n_chars")))
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val stages: Seq[(String, () => Unit)] = Seq(
      ("shingleRows", () =>
        noop(Dedup.shingleRowsOf(docs, "doc_id", "text", 3))),
      ("signatures", () =>
        noop(Dedup.minhashSignatures(docs, "doc_id", "text"))),
      ("bandRows", () =>
        noop(Dedup.bandRows(docs, "doc_id", "text"))),
      ("lshCandidates", () =>
        noop(Dedup.lshCandidates(docs, "doc_id", "text"))),
      ("shingleSets", () =>
        noop(Dedup.shingleSetsOf(docs, "doc_id", "text", 3))),
      ("nearDups(full q41)", () =>
        noop(Dedup.minhashNearDups(docs, "doc_id", "text", 0.5))),
      ("cc(pairs)", () => {
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", 0.5)
        noop(Components.connectedComponents(pairs, "id_a", "id_b"))
      }),
      ("dedupByComponents(full q83)", () => {
        val d = docs
        val pairs = Dedup.minhashNearDups(d, "doc_id", "text", 0.5)
        noop(Components.dedupByComponents(d, "doc_id", pairs,
          "id_a", "id_b"))
      }))
    stages.foreach { case (name, f) =>
      f() // warmup
      spark.catalog.clearCache()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s min=${ts.min}%6.3f s raw=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
