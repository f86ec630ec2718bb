package graft.tools

import org.apache.spark.sql.SparkSession

object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("stream-probe").getOrCreate()
    try {
      for (name <- args) {
        val df = graft.QueriesStreaming.queries(name)(
          spark, "/root/testdata/sf0.01")
        println(s"[probe] $name rows=${df.count()}")
        df.show(10, false)
      }
    } catch {
      case e: Throwable =>
        println(s"[probe] FAILED: ${e.getMessage}")
        e.printStackTrace()
    } finally spark.stop()
  }
}
