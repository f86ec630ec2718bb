package graft

import graft.dedup.Components
import graft.text.{Sharding, TextOps}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class CurationPlanSpec extends SparkSpec {

  test("curriculumSchedule: exact rank and integer phase boundaries") {
    val d = df("id BIGINT, score BIGINT", Seq(
      Row(1L, 50L), Row(2L, 10L), Row(3L, 30L), Row(4L, 10L),
      Row(5L, 90L), Row(6L, 70L), Row(7L, 20L), Row(8L, 40L)))
    val out = Sharding.curriculumSchedule(d, "score", "id", phases = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    // order: (10,2),(10,4),(20,7),(30,3),(40,8),(50,1),(70,6),(90,5)
    assert(out == Seq(
      (2L, 0L, 0L), (4L, 1L, 0L), (7L, 2L, 1L), (3L, 3L, 1L),
      (8L, 4L, 2L), (1L, 5L, 2L), (6L, 6L, 3L), (5L, 7L, 3L)))
  }

  test("curriculumSchedule: guards — null order keys, bad phases, " +
    "column collisions") {
    val d = df("id BIGINT, score BIGINT", Seq(Row(1L, 5L)))
    intercept[IllegalArgumentException] {
      Sharding.curriculumSchedule(d, "score", "id", 0)
    }
    intercept[IllegalArgumentException] {
      Sharding.curriculumSchedule(
        df("id BIGINT, score BIGINT", Seq(Row(1L, null))),
        "score", "id", 4)
    }
    intercept[IllegalArgumentException] {
      Sharding.curriculumSchedule(
        d.withColumn("phase", lit(1L)), "score", "id", 4)
    }
  }

  test("repetitionPlan: exact targets, ceil epochs, rep factor") {
    val d = df("st STRING, tok BIGINT", Seq(
      Row("a", 60L), Row("a", 40L),      // a: 100 tokens
      Row("b", 300L),                    // b: 300 tokens
      Row("c", 10L)))                    // c: unlisted -> weight 0
    val out = TextOps.repetitionPlan(d, "st", "tok",
      Map("a" -> 600, "b" -> 400), tokenBudget = 1000L)
      .orderBy("st").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(out == Seq(
      ("a", 100L, 600L, 6L, 6.0),
      ("b", 300L, 400L, 2L, 400.0 / 300.0),
      ("c", 10L, 0L, 0L, 0.0)))
  }

  test("repetitionPlan: weight and budget validation") {
    val d = df("st STRING, tok BIGINT", Seq(Row("a", 1L)))
    intercept[IllegalArgumentException] { // sloppy 999 rejected
      TextOps.repetitionPlan(d, "st", "tok", Map("a" -> 999), 100L)
    }
    intercept[IllegalArgumentException] {
      TextOps.repetitionPlan(d, "st", "tok",
        Map("a" -> 1100, "b" -> -100), 100L)
    }
    intercept[IllegalArgumentException] {
      TextOps.repetitionPlan(d, "st", "tok", Map("a" -> 1000), 0L)
    }
  }

  test("splitLeakageMatrix: canonical cells, cross flag, loud on " +
    "unassigned endpoints") {
    val pairs = df("id_a STRING, id_b STRING", Seq(
      Row("x1", "x2"), // train-train
      Row("x1", "x3"), // train-test -> canonical (test, train)
      Row("x3", "x4"), // test-val   -> canonical (test, val)
      Row("x2", "x3")))// train-test
    val assign = df("id STRING, split STRING", Seq(
      Row("x1", "train"), Row("x2", "train"), Row("x3", "test"),
      Row("x4", "val")))
    val out = Components.splitLeakageMatrix(pairs, assign,
      "id_a", "id_b", "id", "split")
      .orderBy("split_a", "split_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(out == Seq(
      ("test", "train", 2L, true),
      ("test", "val", 1L, true),
      ("train", "train", 1L, false)))
    intercept[IllegalArgumentException] {
      Components.splitLeakageMatrix(
        pairs, assign.filter(col("id") =!= "x4"),
        "id_a", "id_b", "id", "split")
    }
  }

  test("epochBatchStats: conservation, batch sizes, clump detection") {
    val d = df("id BIGINT, src STRING",
      (0L until 40L).map(i => Row(i, s"s${i % 4}")))
    val out = Sharding.epochBatchStats(d, "id", "src",
      epoch = 1, batchSize = 8)
      .orderBy("batch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.map(_._2).sum == 40L)         // every row in a batch
    assert(out.forall(_._2 == 8L))           // 40 divides into 8s
    out.foreach { case (_, members, nStrata, maxRows) =>
      assert(nStrata >= 1L && nStrata <= 4L)
      assert(maxRows <= members && maxRows * nStrata >= members)
    }
    // a constant-stratum corpus: every batch must report the clump
    val clumped = df("id BIGINT, src STRING",
      (0L until 16L).map(i => Row(i, "only")))
    Sharding.epochBatchStats(clumped, "id", "src", 1, 4)
      .collect().foreach { r =>
        assert(r.getLong(2) == 1L && r.getLong(3) == 4L)
      }
  }
}
