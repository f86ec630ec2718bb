package graft

import graft.functions.DotProductQ
import graft.functions.DotProductQ.dotQ
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** The custom codegen'd Catalyst expression DotProductQ: value parity
  * between the generated-code path (default execution) and the
  * interpreted `nullSafeEval` path (direct Literal eval), nulls, length
  * mismatch, and whole-stage-codegen participation.
  */
class FunctionsSpec extends SparkSpec {

  private def lits(xs: Seq[Long]) =
    Literal.create(xs, ArrayType(LongType))

  test("interpreted eval: dot product, ragged -> null (HOF parity)") {
    assert(DotProductQ(lits(Seq(1L, 2L, 3L)), lits(Seq(4L, 5L, 6L)))
      .eval(null) == 32L)
    // ragged lengths poison the HOF formulation (zip_with pads with
    // null) — dot_q matches so RewriteHofDotProduct is a drop-in
    assert(DotProductQ(lits(Seq(1L, 2L, 3L)), lits(Seq(10L)))
      .eval(null) == null)
    assert(DotProductQ(lits(Seq.empty[Long]), lits(Seq.empty[Long]))
      .eval(null) == 0L)
  }

  test("codegen path agrees with interpreted eval; nulls -> null") {
    val d = df("a ARRAY<BIGINT>, b ARRAY<BIGINT>", Seq(
      Row(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      Row(Seq(-7L, 8L), Seq(9L, -1L)),
      Row(null, Seq(1L)),
      Row(Seq(1L), null)))
    val got = column(d.select(dotQ(col("a"), col("b")).as("d")), "d")
    assert(got == Seq(32L, -71L, null, null))
  }

  test("dotQ stays inside WholeStageCodegen (no interpreted HOFs)") {
    // non-literal input so the projection can't constant-fold away
    val d = spark.range(1, 4).selectExpr("array(id, id * 2) AS a")
    val q = d.select(dotQ(col("a"), col("a")).as("n2"))
    val plan = q.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks an operator inside WholeStageCodegen
    assert(plan.linesIterator.exists(l =>
      l.contains("dot_q") && l.trim.startsWith("*")), plan)
    assert(column(q.orderBy("n2"), "n2") == Seq(5L, 20L, 45L))
  }

  test("bloom might-contain: no false negatives, nulls propagate, " +
      "probe stays codegen'd") {
    import graft.functions.BloomMightContainQ
    val members = (1L to 500L).map(_ * 7919L)
    val fps = df("fp BIGINT", members.map(Row(_)))
    val bloom = fps.stat.bloomFilter("fp", 500L, 0.01)
    // every true member passes — the property decontamination leans on
    val m = df("k BIGINT", members.map(Row(_)))
      .select(BloomMightContainQ.mightContainLong(bloom, col("k"))
        .as("hit"))
    assert(column(m, "hit").forall(_ == true))
    // null key -> null, not a crash or a false claim
    val n = df("k BIGINT", Seq(Row(null)))
      .select(BloomMightContainQ.mightContainLong(bloom, col("k"))
        .as("hit"))
    assert(column(n, "hit") == Seq(null))
    // non-members: ~fpp survive; the overwhelming majority must not
    // (deterministic for a fixed filter + probe set)
    val probe = df("k BIGINT", (1L to 1000L).map(i => Row(i * 7919L + 3)))
      .select(BloomMightContainQ.mightContainLong(bloom, col("k"))
        .as("hit"))
    val hits = column(probe, "hit").count(_ == true)
    assert(hits < 50, s"bloom false-positive rate implausible: $hits/1000")
    // and the probe compiles into WholeStageCodegen like dot_q
    val d = spark.range(1, 100)
      .select(BloomMightContainQ
        .mightContainLong(bloom, col("id")).as("hit"))
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("bloom_might_contain_q") && l.trim.startsWith("*")),
      plan)
  }

  test("cosineQ built on dotQ matches hand-computed cosine") {
    import graft.dedup.Dedup
    val d = df("x ARRAY<FLOAT>, y ARRAY<FLOAT>", Seq(
      Row(Seq(1.0f, 0.0f), Seq(1.0f, 1.0f))))
    val c = d.select(Dedup.cosineQ(Dedup.quantize(col("x")),
      Dedup.quantize(col("y"))).as("c"))
    val got = column(c, "c").head.asInstanceOf[Double]
    assert(math.abs(got - 1.0 / math.sqrt(2)) < 1e-9)
  }
}
