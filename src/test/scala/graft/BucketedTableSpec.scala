package graft

import graft.io.BucketedTable
import org.apache.spark.sql.functions._

/** Co-location contract: two tables bucketed the same way join and
  * aggregate on the bucket key with NO Exchange — the scan satisfies
  * the hash distribution (what Iceberg bucket transforms give a real
  * cluster).
  */
class BucketedTableSpec extends SparkSpec {

  test("bucketed-bucketed join and groupBy plan with zero exchanges") {
    import spark.implicits._
    val events = (0L until 1000L)
      .map(i => (s"img_${i % 100}", i, i * 2.0)).toDF("image_id", "n", "v")
    val meta = (0L until 100L)
      .map(i => (s"img_$i", s"fmt_${i % 3}")).toDF("image_id", "fmt")
    BucketedTable.write(events, "bt_events", "image_id", 8)
    BucketedTable.write(meta, "bt_meta", "image_id", 8)

    val e = BucketedTable.read(spark, "bt_events")
    val m = BucketedTable.read(spark, "bt_meta")

    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = e.join(m, Seq("image_id"))
      val jPlan = joined.queryExecution.executedPlan.toString
      assert(!jPlan.contains("Exchange hashpartitioning"),
        s"co-located join still shuffles:\n$jPlan")
      assert(joined.count() == 1000)
      // SORT elimination is opt-in (the scan reports bucket sort order
      // only under the legacy conf, and only legally because the
      // writer lays out ONE file per bucket) — with it on, the SMJ
      // must skip its sorts too
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      try {
        val j2 = e.join(m, Seq("image_id"))
        val p2 = j2.queryExecution.executedPlan.toString
        assert(p2.contains("SortMergeJoin"), p2)
        assert(!p2.contains("Sort "),
          s"one-file-per-bucket sort order ignored, SMJ re-sorts:\n$p2")
        assert(j2.count() == 1000)
      } finally spark.conf.unset(
        "spark.sql.legacy.bucketedTableScan.outputOrdering")

      val agg = e.groupBy("image_id").agg(sum("v").as("sv"))
      val aPlan = agg.queryExecution.executedPlan.toString
      assert(!aPlan.contains("Exchange hashpartitioning"),
        s"bucketed aggregation still shuffles:\n$aPlan")
      assert(agg.count() == 100)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bt_events")
      spark.sql("DROP TABLE IF EXISTS bt_meta")
    }
  }

  test("feature matrix over a bucketed event log plans with ZERO " +
      "exchanges and agrees with the shuffled plan bit-for-bit") {
    import spark.implicits._
    val ev = (0L until 600L).map { i =>
      (i % 37, i, new java.sql.Timestamp(
        1704100000000L + (i / 37) * 701000L + (i % 7) * 13000L),
        if (i % 11 == 0) "purchase" else "view",
        if (i % 13 == 0) null else java.lang.Double.valueOf(
          ((i * 37) % 500).toDouble / 7.0))
    }.toDF("e", "id", "ts", "t", "v")
    BucketedTable.write(ev, "bt_fm_events", "e", 8)
    try {
      val fm = graft.temporal.WindowOps.featureMatrix(
        BucketedTable.read(spark, "bt_fm_events"),
        "e", "ts", "v", "t", Seq("purchase"), 1800L, Seq("id"))
      val plan = fm.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed feature matrix must not shuffle:\n$plan")
      val shuffled = graft.temporal.WindowOps.featureMatrix(
        ev, "e", "ts", "v", "t", Seq("purchase"), 1800L, Seq("id"))
      assert(fm.orderBy("id").collect().toSeq ==
        shuffled.orderBy("id").collect().toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bt_fm_events"); ()
    }
  }
}
