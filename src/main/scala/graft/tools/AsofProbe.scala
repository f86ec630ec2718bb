package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level diagnostic for the asof-transform scaling block: runs
  * the exact `Bench` asof job (Flagship.features + count) at the
  * parallelism level given by SPARK_GRAFT_CPUS and prints per-stage
  * executor CPU / runtime / GC / shuffle / spill, so a 4-core vs
  * 16-core comparison shows WHERE per-rep CPU inflates (work
  * inflation would localize to specific exchanges; memory-bandwidth
  * stalls inflate every scan/sort stage uniformly).
  *
  * Usage: SPARK_GRAFT_CPUS=4 sbt "runMain graft.tools.AsofProbe"
  */
object AsofProbe {
  private case class StageRow(id: Int, name: String, tasks: Int,
      runMs: Long, cpuMs: Long, gcMs: Long, shufReadMb: Double,
      shufWriteMb: Double, spillMb: Double, peakExecMemMb: Double)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val images = sys.env.getOrElse("SPARK_GRAFT_SCALE_IMAGES",
      "250000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"asof-probe-$cpus")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS", cpus.toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same session shape as Bench.session: the HOF dot-product
      // rewrite is load-bearing for the fit passes
      .config("spark.sql.extensions",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_EXT", "graft.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stored-input mode: inputs come from parquet (the production
    // shape) instead of in-flight synthetic generation
    val stored = sys.env.getOrElse("SPARK_GRAFT_PROBE_STORED", "0") == "1"
    val root = "/tmp/graft_asof_probe_in"
    if (stored) {
      graft.io.ImageTable.events(spark, images, 5)
        .write.mode("overwrite").parquet(s"$root/events")
      graft.io.ImageTable.snapshots(spark, images)
        .write.mode("overwrite").parquet(s"$root/snapshots")
      graft.io.ImageTable.images(spark, images)
        .select("image_id", "w", "h", "fmt", "caption")
        .write.mode("overwrite").parquet(s"$root/meta")
    }
    // join = single-pass as-of join + count only (no fit/transform):
    // bounds what the box gives a pure shuffle-sort stage chain
    val mode = sys.env.getOrElse("SPARK_GRAFT_PROBE_MODE", "full")
    def job(): Long = {
      val joined =
        if (stored) graft.Flagship.joinedInputFrom(
          spark.read.parquet(s"$root/events"),
          spark.read.parquet(s"$root/snapshots"),
          spark.read.parquet(s"$root/meta"))
        else graft.Flagship.joinedInput(spark, images, 5)
      val r =
        if (mode == "join") joined.count()
        else graft.Flagship.featuresOver(joined).count()
      spark.catalog.clearCache(); r
    }
    val warmups = sys.env.getOrElse("SPARK_GRAFT_PROBE_WARMUPS", "3").toInt
    (1 to warmups).foreach { i =>
      val t = System.nanoTime(); job()
      System.err.println(f"[probe] warmup $i: ${(System.nanoTime() - t) / 1e9}%.2f s")
    }

    val rows = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        if (m != null) rows.add(StageRow(si.stageId,
          si.name.take(60), si.numTasks,
          m.executorRunTime, m.executorCpuTime / 1000000,
          m.jvmGCTime,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6,
          m.peakExecutionMemory / 1e6))
      }
    }
    import scala.jdk.CollectionConverters._
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    // min-of-N: this box shows 2-4x co-tenant stall episodes; per-rep
    // stage tables let the clean rep be read directly
    var best: (Double, Seq[StageRow]) = (Double.MaxValue, Nil)
    (1 to reps).foreach { i =>
      rows.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = job()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      val all = rows.asScala.toSeq.sortBy(-_.cpuMs)
      println(f"[probe] rep $i: cpus=$cpus rows=$n wall=$wall%.2f s " +
        f"totalCpu=${all.map(_.cpuMs).sum / 1000.0}%.1f s " +
        f"totalGc=${all.map(_.gcMs).sum / 1000.0}%.1f s")
      if (wall < best._1) best = (wall, all)
    }
    println(f"[probe] BEST wall=${best._1}%.2f s " +
      f"totalCpu=${best._2.map(_.cpuMs).sum / 1000.0}%.1f s")
    best._2.take(12).foreach { s =>
      println(f"[probe] stage=${s.id}%4d tasks=${s.tasks}%3d " +
        f"cpu=${s.cpuMs / 1000.0}%7.2f s run=${s.runMs / 1000.0}%7.2f s " +
        f"gc=${s.gcMs / 1000.0}%5.2f s read=${s.shufReadMb}%8.1f MB " +
        f"write=${s.shufWriteMb}%8.1f MB spill=${s.spillMb}%6.1f MB " +
        f"peak=${s.peakExecMemMb}%7.1f MB  ${s.name}")
    }
    spark.stop()
  }
}
