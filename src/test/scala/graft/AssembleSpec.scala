package graft

import graft.operators.Assemble
import org.apache.spark.sql.Row

class AssembleSpec extends SparkSpec {

  private def frame() = df("id BIGINT, a DOUBLE, b DOUBLE, c DOUBLE",
    Seq(
      Row(1L, 1.5, 2.0, 3.0),
      Row(2L, null, 2.0, Double.NaN), // null and NaN both mask
      Row(3L, 0.0, null, null)))

  test("features: order preserved, zero policy, exact null bitmask " +
      "distinguishes imputed zeros from real ones") {
    val out = Assemble.features(frame(), Seq("a", "b", "c"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Double](out(0).fieldIndex("features")) == Seq(1.5, 2.0, 3.0))
    assert(out(0).getAs[Long]("features_null_mask") == 0L)
    // row 2: a null (bit 0), c NaN (bit 2) -> mask 5, slots zeroed
    assert(out(1).getSeq[Double](out(1).fieldIndex("features")) == Seq(0.0, 2.0, 0.0))
    assert(out(1).getAs[Long]("features_null_mask") == 5L)
    // row 3: the REAL 0.0 in slot a is distinguishable by mask bit 0
    assert(out(2).getSeq[Double](out(2).fieldIndex("features")) == Seq(0.0, 0.0, 0.0))
    assert(out(2).getAs[Long]("features_null_mask") == 6L)
  }

  test("features: keep policy leaves missing slots null; guards") {
    val out = Assemble.features(frame(), Seq("a", "c"),
      nullPolicy = "keep").orderBy("id").collect()
    val r2 = out(1).getSeq[Any](out(1).fieldIndex("features")).toSeq
    assert(r2 == Seq(null, null)) // null AND NaN both normalized
    assert(out(1).getAs[Long]("features_null_mask") == 3L)
    intercept[IllegalArgumentException] {
      Assemble.features(frame(), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Assemble.features(frame(), Seq("a"), nullPolicy = "mean")
    }
    intercept[IllegalArgumentException] {
      Assemble.features(frame(), Seq("nope"))
    }
    // re-assembly under the same output name must fail loudly, not
    // produce an ambiguous duplicate column
    intercept[IllegalArgumentException] {
      Assemble.features(Assemble.features(frame(), Seq("a")), Seq("b"))
    }
  }

  test("features plans a pure projection: no exchange, no UDF") {
    val plan = Assemble.features(frame(), Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython"),
      plan.take(800))
  }
}
