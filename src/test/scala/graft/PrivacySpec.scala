package graft

import graft.operators.Privacy
import org.apache.spark.sql.Row

class DriftPrivacySpec extends SparkSpec {

  test("kAnonymityAudit: class sizes, diversity, null quasi is its " +
      "own level, flags") {
    val d = df("id INT, zip STRING, age INT, dx STRING", Seq(
      Row(1, "111", 30, "a"), Row(2, "111", 30, "b"),
      Row(3, "111", 30, "a"),                    // class (111,30): n=3
      Row(4, "222", 40, "a"),                    // singleton
      Row(5, null, 40, "a"), Row(6, null, 40, null))) // null zip class
    val out = Privacy.kAnonymityAudit(d, Seq("zip", "age"), "dx",
      k = 2, l = 2).collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getAs[Long]("eq_class_size") == 3)
    assert(out(1).getAs[Long]("sensitive_diversity") == 2)
    assert(out(1).getAs[Boolean]("k_anonymous"))
    assert(out(1).getAs[Boolean]("l_diverse"))
    assert(out(4).getAs[Long]("eq_class_size") == 1)
    assert(!out(4).getAs[Boolean]("k_anonymous"))
    // null quasi: rows 5+6 share one class; null sensitive not counted
    assert(out(5).getAs[Long]("eq_class_size") == 2)
    assert(out(5).getAs[Long]("sensitive_diversity") == 1)
    assert(!out(5).getAs[Boolean]("l_diverse"))
    // row count preserved (left join, no duplication)
    assert(Privacy.kAnonymityAudit(d, Seq("zip", "age"), "dx", 2, 2)
      .count() == 6)
    assertThrows[IllegalArgumentException] {
      Privacy.kAnonymityAudit(d, Seq("zip", "dx"), "dx", 2, 2)
    }
  }

  test("kAnonymitySummary: one-row release checklist") {
    val d = df("zip STRING, dx STRING", Seq(
      Row("1", "a"), Row("1", "b"), Row("1", "c"),
      Row("2", "a"), Row("3", "a"), Row("3", "a")))
    val r = Privacy.kAnonymitySummary(d, Seq("zip"), "dx", k = 2).head()
    assert(r.getAs[Long]("eq_classes") == 3)
    assert(r.getAs[Long]("rows_below_k") == 1)   // the zip=2 singleton
    assert(r.getAs[Long]("min_class_size") == 1)
    assert(r.getAs[Long]("min_diversity") == 1)  // zip=3: only "a"
  }
}
