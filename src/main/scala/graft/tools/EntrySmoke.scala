package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke-runs the driver contract surface: SparkEntry.entry rows>0,
  * prints the physical plan (shuffle / pruning inspection).
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    println(s"[entry] rows=${df.count()}")
    println(s"[entry] cols=${df.columns.mkString(",")}")
    df.show(5, truncate = false)
    df.explain("formatted")
    spark.stop()
  }
}
