package graft

import graft.operators.Profile
import org.apache.spark.sql.Row

class ProfileSpec extends SparkSpec {

  test("columnProfile: per-column coverage, null rate and exact " +
      "distinct cardinality in one melted pass") {
    val d = df("a STRING, b INT", Seq(
      Row("x", 1), Row("x", 2), Row(null, 2), Row("y", null)))
    val out = Profile.columnProfile(d, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 4 && out("a").getLong(2) == 1)
    assert(out("a").getLong(3) == 2) // x, y — null not a distinct value
    assert(out("a").getDouble(4) == 0.25)
    assert(out("b").getLong(2) == 1 && out("b").getLong(3) == 2)
  }

  test("columnProfile: missing column rejected up front") {
    val d = df("a STRING", Seq(Row("x")))
    intercept[IllegalArgumentException] {
      Profile.columnProfile(d, Seq("a", "nope"))
    }
  }
}
