package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val li = s.read.parquet(s"$dir/lineitem.parquet")
    val z = graft.operators.GroupOps.standardizeByGroup(
      li.select(col("l_returnflag"), col("l_orderkey"),
        col("l_quantity")), "l_returnflag", Seq("l_quantity"))
    z.collect()
    println("=== q80 standardize ===")
    println(z.queryExecution.executedPlan.toString.take(2600))
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.text.TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
    val p = graft.text.Sharding.packShards(docs, "doc_id", "n_tok", 2000L)
    println("=== q78 pack ===")
    println(p.queryExecution.executedPlan.toString.take(1200))
    s.stop()
  }
}
