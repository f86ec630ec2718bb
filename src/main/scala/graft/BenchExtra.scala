package graft

import org.apache.spark.sql.SparkSession

/** Round-6 optimization harness (guide §1): NOT part of the frozen
  * driver bench. Times individual declared queries with the noop sink
  * (computes every column, discards the write — §1.4), labels each job
  * (§1.5), and dumps `.explain("formatted")` to plans/r06/ so plan
  * claims in OPTIMIZATION_r06.md are checkable offline.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra q73_curation_funnel,q83_dedup_end_to_end"
  *   SPARK_GRAFT_EXPLAIN_TAG=before sbt "runMain graft.BenchExtra <names>"
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_EXTRA_REPS (default 3),
  *      SPARK_GRAFT_EXPLAIN_TAG (write plans/r06/<q>_<tag>.txt when set).
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "3").toInt
    val tag = sys.env.get("SPARK_GRAFT_EXPLAIN_TAG")
    val names: Seq[String] =
      if (args.isEmpty || args(0) == "headline") Bench.Headline
      else if (args(0) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").toSeq

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[extra] $name: unknown query")
        case Some(q) =>
          try {
            tag.foreach { t =>
              val dir = java.nio.file.Paths.get("plans/r06")
              java.nio.file.Files.createDirectories(dir)
              val plan = q(spark, sfDir)
                .queryExecution.explainString(
                  org.apache.spark.sql.execution.FormattedMode)
              java.nio.file.Files.write(
                dir.resolve(s"${name}_$t.txt"),
                plan.getBytes("UTF-8"))
              spark.catalog.clearCache()
            }
            // warmup (absorbs codegen/JIT, same as the frozen bench)
            spark.sparkContext.setJobDescription(s"$name warmup")
            q(spark, sfDir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            var times = Vector.empty[Double]
            (1 to reps).foreach { i =>
              spark.sparkContext.setJobDescription(s"$name rep$i")
              val t0 = System.nanoTime()
              q(spark, sfDir).write.format("noop").mode("overwrite").save()
              times :+= (System.nanoTime() - t0) / 1e9
              spark.catalog.clearCache()
            }
            val raw = times.map(t => f"$t%.3f").mkString("[", ",", "]")
            println(f"[extra] $name%-28s min=${times.min}%8.3f s raw=$raw")
          } catch {
            case e: Throwable =>
              println(s"[extra] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
