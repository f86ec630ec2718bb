package graft

import graft.operators.Drift
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {

  test("psiByLevel: hand-computed terms, eps smoothing for one-sided " +
      "levels, exact nano total") {
    // ref: a x3, b x1   cur: a x1, b x2, c x1
    val ref = df("k STRING", Seq(Row("a"), Row("a"), Row("a"), Row("b")))
    val cur = df("k STRING", Seq(Row("a"), Row("b"), Row("b"), Row("c")))
    val out = Drift.psiByLevel(ref, cur, "k").collect()
      .map(r => r.getString(0) -> r).toMap
    def term(p: Double, q: Double) =
      (q - p) * math.log(math.max(q, 1e-6) / math.max(p, 1e-6))
    assert(math.abs(out("a").getDouble(3) - term(0.75, 0.25)) < 1e-12)
    assert(math.abs(out("b").getDouble(3) - term(0.25, 0.5)) < 1e-12)
    // c absent from ref: p smoothed to eps -> large positive term
    assert(math.abs(out("c").getDouble(3) - term(0.0, 0.25)) < 1e-12)
    assert(out("c").getDouble(1) == 0.0)
    val expNano = Seq(term(0.75, 0.25), term(0.25, 0.5), term(0.0, 0.25))
      .map(t => math.round(t * 1e9)).sum
    assert(out.values.forall(_.getLong(4) == expNano))
  }

  test("psiByLevel: identical distributions -> all-zero terms; " +
      "null is its own level") {
    val a = df("k STRING", Seq(Row("x"), Row("y"), Row(null)))
    val out = Drift.psiByLevel(a, a, "k").collect()
    assert(out.length == 3)
    assert(out.forall(_.getDouble(3) == 0.0))
    assert(out.forall(_.getLong(4) == 0L))
    assert(out.count(_.isNullAt(0)) == 1)
  }

  test("psiFromCounts: pre-aggregated counts reproduce the row-level " +
      "PSI exactly (the streaming readout contract)") {
    val ref = df("k STRING", Seq(Row("a"), Row("a"), Row("a"), Row("b")))
    val cur = df("k STRING", Seq(Row("a"), Row("b"), Row("b"), Row("c")))
    def counts(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(col("k").cast("string").as("level"))
        .agg(count(lit(1)).as("c"))
    val fromRows = Drift.psiByLevel(ref, cur, "k")
      .collect().map(r => (r.getString(0), r.getDouble(3),
        r.getLong(4))).sortBy(_._1)
    val fromCounts = Drift.psiFromCounts(counts(ref), counts(cur))
      .collect().map(r => (r.getString(0), r.getDouble(3),
        r.getLong(4))).sortBy(_._1)
    assert(fromRows.toSeq == fromCounts.toSeq)
  }

  test("psiNumeric: reference-quantile bins, shifted current slice " +
      "registers drift, null bucket -1") {
    val ref = df("x DOUBLE", (1 to 100).map(i => Row(i.toDouble)))
    val same = Drift.psiNumeric(ref, ref, "x", bins = 4).collect()
    assert(same.forall(_.getLong(4) == 0L))
    // all 4 quantile buckets must actually be populated (a mis-nested
    // edge fold collapses everything below the top edge into one)
    assert(same.map(_.getString(0)).sorted.toSeq ==
      Seq("0", "1", "2", "3"))
    assert(same.forall(r => math.abs(r.getDouble(1) - 0.25) < 0.02))
    val shifted = df("x DOUBLE",
      (61 to 160).map(i => Row(i.toDouble)) :+ Row(null))
    val out = Drift.psiNumeric(ref, shifted, "x", bins = 4).collect()
    val total = out.head.getLong(4)
    assert(total > 200000000L, s"PSI must exceed 0.2, got nano=$total")
    assert(out.exists(r => r.getString(0) == "-1" &&
      r.getDouble(2) > 0))
  }

  test("embeddingDrift: orthogonal centroids score cos 0 and " +
      "shift sqrt(2); identical slices score cos 1, shift 0") {
    val d = df("id BIGINT, v ARRAY<FLOAT>", Seq(
      Row(0L, Seq(1.0f, 0.0f)), Row(2L, Seq(1.0f, 0.0f)),
      Row(1L, Seq(0.0f, 1.0f)),
      Row(null, Seq(9.0f, 9.0f)),      // null side flag excluded
      Row(4L, null)))                   // null vector excluded
    val out = Drift.embeddingDrift(d, "v", col("id") % 2 === 0)
      .collect()(0)
    assert(out.getLong(0) == 2L && out.getLong(1) == 1L)
    assert(out.getDouble(2) == 0.0)
    assert(math.abs(out.getDouble(3) - math.sqrt(2.0)) < 1e-9)
    val same = Drift.embeddingDrift(d.filter(col("id").isin(0L, 1L)),
      "v", col("id") === 0).collect()(0)
    // centroids (1,0) vs (0,1): per-construction check of both ends
    assert(same.getLong(0) == 1L && same.getLong(1) == 1L)
    val ident = Drift.embeddingDrift(
      df("id BIGINT, v ARRAY<FLOAT>", Seq(
        Row(0L, Seq(3.0f, 4.0f)), Row(1L, Seq(3.0f, 4.0f)))),
      "v", col("id") === 0).collect()(0)
    assert(math.abs(ident.getDouble(2) - 1.0) < 1e-12)
    assert(ident.getDouble(3) == 0.0)
  }

  test("embeddingDriftByKey: per-key chains equal the global op on " +
      "a single-key frame; empty side refuses readouts") {
    val d = df("id BIGINT, k STRING, v ARRAY<FLOAT>", Seq(
      Row(0L, "a", Seq(1.0f, 0.0f)), Row(2L, "a", Seq(1.0f, 0.0f)),
      Row(1L, "a", Seq(0.0f, 1.0f)),
      Row(0L, "b", Seq(2.0f, 2.0f)))) // only a ref side
    val out = Drift.embeddingDriftByKey(d, "k", "v",
      col("id") % 2 === 0).orderBy("k").collect()
    assert(out(0).getString(0) == "a")
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 1L)
    assert(out(0).getDouble(3) == 0.0)
    assert(math.abs(out(0).getDouble(4) - math.sqrt(2.0)) < 1e-9)
    assert(out(1).getString(0) == "b")
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 0L)
    assert(out(1).isNullAt(3) && out(1).isNullAt(4))
  }

  test("ksDrift: exact cross-multiplied CDF max, ties step together, " +
      "one-sided key refuses, null/NaN excluded") {
    val ref = df("k STRING, x DOUBLE", Seq(
      Row("a", 1.0), Row("a", 2.0), Row("a", 3.0),
      Row("a", Double.NaN), // excluded, not a zero
      Row("b", 5.0)))
    val cur = df("k STRING, x DOUBLE", Seq(
      Row("a", 2.0), Row("a", 3.0), Row("a", 4.0),
      Row("a", null), Row(null, 9.0)))
    val out = Drift.ksDrift(ref, cur, "k", "x")
      .orderBy("key").collect()
    assert(out.length == 2)
    val a = out(0)
    // shift-by-one over {1,2,3} vs {2,3,4}: D = 1/3 exactly, carried
    // as the integer gap 3 over nRef*nCur = 9
    assert((a.getString(0), a.getLong(1), a.getLong(2),
      a.getLong(3)) == (("a", 3L, 3L, 3L)))
    assert(a.getDouble(4) == 3.0 / 9.0)
    // key "b" has no current rows: nothing to compare -> null ks
    val b = out(1)
    assert(b.getString(0) == "b" && b.getLong(2) == 0L && b.isNullAt(4))
    // identical slices -> D = 0
    val same = Drift.ksDrift(ref, ref, "k", "x").collect()
    assert(same.forall(r => r.getLong(3) == 0L))
    // one hash exchange on the key; the per-key max rides the window
    // partitioning (no second exchange, no single-partition stage)
    val plan = Drift.ksDrift(ref, cur, "k", "x")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange:\n$plan")
    assert(!plan.contains("SinglePartition"), plan.take(600))
  }
}
