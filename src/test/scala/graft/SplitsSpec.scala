package graft

import graft.temporal.Splits
import org.apache.spark.sql.Row
import java.sql.Timestamp

class SplitsSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("walkForward: expanding-window roles per fold, gap purge " +
      "before each test window, future blocks never train") {
    // 100 events at seconds 0..99: span = 99e6 div 4 + 1
    val d = df("id BIGINT, t TIMESTAMP",
      (0L to 99L).map(i => Row(i, ts(i))))
    val out = Splits.walkForward(d, "t", k = 3, gapSeconds = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(2),
        r.getString(3), r.getString(4), r.getString(5))).toMap
    val span = 99000000L / 4 + 1
    def role(f: Int, i: Long): String = {
      val t = i * 1000000L
      val block = t / span
      if (block == f) "test"
      else if (block > f) "future"
      else if (t >= f * span - 5000000L) "purged"
      else "train"
    }
    (0L to 99L).foreach { i =>
      val t = i * 1000000L
      assert(out(i) == ((t / span, role(1, i), role(2, i),
        role(3, i))), s"row $i: ${out(i)}")
    }
    // every role actually occurs for fold 1
    val f1 = (0L to 99L).map(role(1, _)).toSet
    assert(f1 == Set("train", "purged", "test", "future"))
  }

  test("purgedKFold: exact fold boundaries, purge before and " +
      "embargo after the test interval") {
    // 100 events at seconds 0..99: lo=0, hi=99e6us,
    // span = 99e6 div 4 + 1 = 24_750_001 us
    val d = df("id BIGINT, t TIMESTAMP",
      (0L to 99L).map(i => Row(i, ts(i))))
    val out = Splits.purgedKFold(d, "t", k = 4, testFold = 1,
      purgeSeconds = 5, embargoSeconds = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2),
        r.getString(3))).toMap
    val span = 99000000L / 4 + 1
    def expected(i: Long): (Long, String) = {
      val t = i * 1000000L
      val fold = t / span
      val (s1, e1) = (span, 2 * span)
      val role =
        if (fold == 1) "test"
        else if (t >= s1 - 5000000L && t < s1) "purged"
        else if (t >= e1 && t < e1 + 3000000L) "embargo"
        else "train"
      (fold, role)
    }
    (0L to 99L).foreach(i => assert(out(i) == expected(i), s"id=$i"))
    val roles = out.values.map(_._2).toSeq
    assert(Set("test", "train", "purged", "embargo")
      .subsetOf(roles.toSet))
    // leakage guard: no train row inside the purge/embargo margins
    assert(out.forall { case (i, (_, role)) =>
      val t = i * 1000000L
      role != "train" ||
        t < span - 5000000L || t >= 2 * span + 3000000L
    })
  }

  test("purgedKFold: first and last folds have one-sided margins") {
    val d = df("id BIGINT, t TIMESTAMP",
      (0L to 39L).map(i => Row(i, ts(i))))
    val first = Splits.purgedKFold(d, "t", 4, 0, 5, 3).collect()
    assert(!first.exists(_.getString(3) == "purged")) // nothing before
    val last = Splits.purgedKFold(d, "t", 4, 3, 5, 3).collect()
    assert(!last.exists(_.getString(3) == "embargo")) // nothing after
    // max timestamp lands in the last fold, never an out-of-range one
    assert(last.filter(_.getLong(0) == 39L).head.getLong(2) == 3L)
  }

  test("purgedKFold: null timestamp fails loudly; bad params rejected") {
    val d = df("id BIGINT, t TIMESTAMP",
      Seq(Row(1L, ts(1)), Row(2L, null)))
    val ex = intercept[Exception] {
      Splits.purgedKFold(d, "t", 2, 0, 0, 0).collect()
    }
    assert(ex.getMessage != null)
    intercept[IllegalArgumentException] {
      Splits.purgedKFold(d, "t", 1, 0, 0, 0)
    }
    intercept[IllegalArgumentException] {
      Splits.purgedKFold(d, "t", 4, 4, 0, 0)
    }
  }
}
