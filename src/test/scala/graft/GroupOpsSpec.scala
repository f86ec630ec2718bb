package graft

import graft.operators.GroupOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class GroupOpsSpec extends SparkSpec {

  private def scored() = df("g STRING, id BIGINT, s DOUBLE", Seq(
    Row("a", 1L, 10.0), Row("a", 2L, 30.0), Row("a", 3L, 20.0),
    Row("a", 4L, 30.0), // tie with id=2 -> smaller id ranks first
    Row("b", 5L, 1.0),
    Row("c", 6L, 5.0), Row("c", 7L, null)))

  test("topKPerGroup: desc score, ties -> smaller id, short groups") {
    val out = GroupOps.topKPerGroup(scored(), Seq("g"), "s", "id", 2)
      .orderBy("g", "rank")
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getDouble(2), r.getLong(3))).toSeq
    assert(out == Seq(
      ("a", 1, 30.0, 2L), ("a", 2, 30.0, 4L),
      ("b", 1, 1.0, 5L),
      ("c", 1, 5.0, 6L))) // null score skipped
  }

  test("madOutlierFlags: golden mz, zero-MAD group refuses, nulls safe") {
    val d = df("g STRING, id BIGINT, v DOUBLE", Seq(
      Row("a", 1L, 1.0), Row("a", 2L, 2.0), Row("a", 3L, 3.0),
      Row("a", 4L, 4.0), Row("a", 5L, 100.0),
      Row("b", 6L, 5.0), Row("b", 7L, 5.0), Row("b", 8L, 5.0),
      Row("c", 9L, null)))
    val out = GroupOps.madOutlierFlags(d, "g", "v")
      .orderBy("id")
    val mz = column(out, "v_mz")
    val fl = column(out, "v_outlier")
    // group a: np.interp median (f=i/n) = 2.5, MAD = 0.75
    // mz(100) = 0.6745 * 97.5 / 0.75
    val expect = 0.6744897501960817 * 97.5 / 0.75
    assert(math.abs(mz(4).asInstanceOf[Double] - expect) < 1e-9)
    assert(fl(4) == true)
    assert(math.abs(mz(0).asInstanceOf[Double] -
      0.6744897501960817 * -1.5 / 0.75) < 1e-9)
    assert(fl(0) == false)
    // constant group: MAD=0 -> null mz, never flags
    assert(mz(5) == null && fl(5) == false)
    // null value: null mz, no flag
    assert(mz(8) == null && fl(8) == false)
    intercept[IllegalArgumentException] {
      GroupOps.madOutlierFlags(d, "g", "v", cutoff = 0.0)
    }
  }

  test("topKPerGroup: NaN scores skipped, heap not poisoned; " +
      "all-null group still emitted") {
    // NaN arrives FIRST: under a total-order comparison it would fill
    // a heap slot and (NaN > x, NaN == x both false) permanently
    // reject every later better element — the fixed heap skips it
    val d = df("g STRING, id BIGINT, s DOUBLE", Seq(
      Row("a", 1L, Double.NaN), Row("a", 2L, Double.NaN),
      Row("a", 3L, 5.0), Row("a", 4L, 7.0), Row("a", 5L, 6.0),
      Row("n", 8L, Double.NaN), Row("n", 9L, null)))
    val out = GroupOps.topKPerGroup(d, Seq("g"), "s", "id", 2)
      .orderBy("g", "rank").collect()
    val a = out.filter(_.getString(0) == "a")
      .map(r => (r.getInt(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(a == Seq((1, 7.0, 4L), (2, 6.0, 5L)))
    // group with only null/NaN scores: one row, null rank/score/id
    val n = out.filter(_.getString(0) == "n")
    assert(n.length == 1 && n(0).isNullAt(1) && n(0).isNullAt(2))
  }

  test("topKPerGroup matches the window formulation on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i => Row(s"g${rnd.nextInt(8)}", i.toLong,
      rnd.nextInt(40).toDouble))
    val d = df("g STRING, id BIGINT, s DOUBLE", rows)
    val got = GroupOps.topKPerGroup(d, Seq("g"), "s", "id", 5)
      .select("g", "rank", "score", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getLong(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("s").desc, col("id"))
    val exp = d.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("g"), col("rank"), col("s"), col("id")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(got == exp)
  }

  test("topKPerGroup plans as partial hash agg, no Window/Sort of rows") {
    val plan = GroupOps.topKPerGroup(scored(), Seq("g"), "s", "id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "must not use a window")
    // ObjectHashAggregate partial + final = map-side combine: the
    // shuffle carries bounded per-group heaps, not rows
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
  }

  test("null group keys: rows kept and standardized/capped like any " +
      "other group") {
    val d = df("k STRING, x DOUBLE", Seq(
      Row(null, 1.0), Row(null, 2.0), Row(null, 3.0), Row("a", 7.0)))
    val z = GroupOps.standardizeByGroup(d, "k", Seq("x"))
    assert(z.count() == 4) // null-key rows NOT dropped
    val zs = z.filter(col("k").isNull).orderBy("x")
      .collect().map(_.getAs[Double]("x_z"))
    assert(math.abs(zs(1)) < 1e-12 && zs(0) < 0 && zs(2) > 0)
    val capped = GroupOps.capByGroupQuantiles(d, "k", "x", 0.0, 0.5)
    assert(capped.count() == 4)
    // null group's p50 (np.interp over {1,2,3}) caps the 3.0 down
    assert(capped.filter(col("k").isNull).agg(max("x")).head()
      .getDouble(0) < 3.0)
  }

  test("oofMeanResponse: leakage oracle — a row's own response " +
      "never reaches its encoding") {
    val rows = (1L to 60L).map(i =>
      Row(i, if (i % 2 == 0) "a" else "b", (i % 7).toDouble))
    val d = df("id BIGINT, k STRING, y DOUBLE", rows)
    def encOf(frame: org.apache.spark.sql.DataFrame) =
      GroupOps.oofMeanResponse(frame, "k", "y", "id", folds = 4,
        prior = 0.0)
        .select("id", "oof_enc").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    val base = encOf(d)
    // perturb row 10's response massively; with prior=0 its OWN
    // encoding must not move (out-of-fold only), while same-level
    // rows in OTHER folds must see the change
    val perturbed = encOf(d.withColumn("y",
      when(col("id") === 10L, lit(1e6)).otherwise(col("y"))))
    assert(perturbed(10L) == base(10L),
      "row 10's own encoding leaked its response")
    val fold10 = (10L * 2654435761L % 4294967296L % 4).toInt
    val otherFoldSameLevel = (1L to 60L).find(i => i % 2 == 0 &&
      i != 10L && (i * 2654435761L % 4294967296L % 4).toInt != fold10)
      .get
    assert(perturbed(otherFoldSameLevel) != base(otherFoldSameLevel),
      "other folds must observe the perturbation")
    // hand-check one value: enc = (level_sum - own_fold_sum) /
    // (level_cnt - own_fold_cnt)
    val aRows = rows.filter(_.getString(1) == "a")
      .map(r => (r.getLong(0), r.getDouble(2)))
    val f10 = aRows.filter { case (i, _) =>
      (i * 2654435761L % 4294967296L % 4).toInt == fold10 }
    val exp = (aRows.map(_._2).sum - f10.map(_._2).sum) /
      (aRows.size - f10.size)
    assert(math.abs(base(10L) - exp) < 1e-12)
  }

  test("looMeanResponse: self-exclusion, null-response full stats, " +
      "unseen level, singleton level") {
    val d = df("id BIGINT, k STRING, y DOUBLE", Seq(
      Row(1L, "a", 1.0), Row(2L, "a", 2.0), Row(3L, "a", 6.0),
      Row(4L, "a", null),            // apply-time row: full stats
      Row(5L, "b", 4.0),             // singleton level
      Row(6L, "c", null)))           // level with no labels at all
    val out = GroupOps.looMeanResponse(d, "k", "y", prior = 0.0)
      .select("id", "loo_enc").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1L) == (2.0 + 6.0) / 2)   // leaves its own 1.0 out
    assert(out(2L) == (1.0 + 6.0) / 2)
    assert(out(3L) == (1.0 + 2.0) / 2)
    assert(out(4L) == (1.0 + 2.0 + 6.0) / 3) // null y -> full stats
    assert(out(5L) == null)  // singleton labeled row, prior 0 -> null
    assert(out(6L) == null)  // unlabeled level, prior 0 -> null
    // smoothed: prior=2, global mean = (1+2+6+4)/4 = 3.25
    val sm = GroupOps.looMeanResponse(d, "k", "y", prior = 2.0)
      .select("id", "loo_enc").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(sm(1L) - (8.0 + 2 * 3.25) / 4) < 1e-12)
    assert(math.abs(sm(5L) - (0.0 + 2 * 3.25) / 2) < 1e-12)
    assert(math.abs(sm(6L) - 3.25) < 1e-12) // pure prior
  }

  test("robustScaleByGroup: (x-median)/IQR, zero-IQR -> x-median") {
    val d = df("k STRING, x DOUBLE",
      ((1 to 100).map(i => Row("a", i.toDouble)) ++
        Seq(Row("b", 3.0), Row("b", 3.0))))
    val out = GroupOps.robustScaleByGroup(d, "k", "x")
    // 1..100 unit weights: q25=25.something? brackets i/100: f=0.25 at
    // i=25 exactly -> q1=25, med=50, q3=75, IQR=50
    val a = out.filter(col("k") === "a" && col("x") === 50.0)
      .head().getAs[Double]("x_rs")
    assert(a == 0.0)
    val a100 = out.filter(col("k") === "a" && col("x") === 100.0)
      .head().getAs[Double]("x_rs")
    assert(a100 == 1.0) // (100-50)/50
    // constant group: IQR 0 -> divide by 1 -> 0
    assert(out.filter(col("k") === "b").collect()
      .forall(_.getAs[Double]("x_rs") == 0.0))
  }

  test("percentileRankByGroup: ECDF over non-nulls, nulls get null") {
    val d = df("k STRING, x DOUBLE", Seq(
      Row("a", 10.0), Row("a", 20.0), Row("a", 30.0), Row("a", 40.0),
      Row("a", null)))
    val out = GroupOps.percentileRankByGroup(d, "k", "x")
    val ranks = out.filter(col("x").isNotNull).orderBy("x")
      .collect().map(_.getAs[Double]("x_pct")).toSeq
    assert(ranks == Seq(0.25, 0.5, 0.75, 1.0)) // nulls excluded
    assert(out.filter(col("x").isNull).head().isNullAt(
      out.columns.indexOf("x_pct")))
  }

  test("percentileRankByGroup: ties share the cume_dist value and " +
      "it matches the window formulation") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map(i =>
      Row(s"g${rnd.nextInt(4)}", rnd.nextInt(12).toDouble))
    val d = df("k STRING, x DOUBLE", rows)
    val got = GroupOps.percentileRankByGroup(d, "k", "x")
      .groupBy("k", "x").agg(first("x_pct").as("p"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getLong(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("x")
    val exp = d.withColumn("p", cume_dist().over(w))
      .groupBy("k", "x").agg(first("p").as("p"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getLong(3))).toSet
    assert(got == exp)
  }

  test("percentileRankByGroup plans no rank window over raw rows") {
    // the scale contract: every Window must sit ABOVE the
    // groupBy(key, value) collapse — its partition buffers distinct
    // values, never the group's rows — and no cume_dist remains
    val d = df("k STRING, x DOUBLE", Seq(
      Row("a", 1.0), Row("a", 1.0), Row("a", 2.0), Row("b", 5.0)))
    val plan = GroupOps.percentileRankByGroup(d, "k", "x")
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "expected the collapsed-frame windows")
    windows.foreach { w =>
      val s = w.windowExpressions.map(_.toString).mkString(";")
      assert(!s.toLowerCase.contains("cume_dist"),
        s"cume_dist still runs over raw rows:\n$s")
      val aggsBelow = w.child.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggsBelow.nonEmpty,
        s"window must consume the (key, value) aggregate:\n$w")
    }
  }

  test("standardizeByGroup: z-scores, zero-variance group -> 0") {
    val d = df("k STRING, x DOUBLE", Seq(
      Row("a", 1.0), Row("a", 2.0), Row("a", 3.0),
      Row("b", 7.0), Row("b", 7.0)))
    val out = GroupOps.standardizeByGroup(d, "k", Seq("x"))
      .orderBy("k", "x")
    val z = column(out, "x_z").map(_.asInstanceOf[Double])
    val sd = math.sqrt(2.0 / 3.0) // population std of {1,2,3}
    assert(math.abs(z(0) - (-1.0 / sd)) < 1e-12)
    assert(math.abs(z(1)) < 1e-12)
    assert(math.abs(z(2) - (1.0 / sd)) < 1e-12)
    assert(z(3) == 0.0 && z(4) == 0.0) // zero variance -> 0, not NaN
  }

  test("filterByGroupQuantile: per-group gate, lower-tail mode, " +
    "null/NaN never pass, all-null group dropped") {
    val d = df("k STRING, v DOUBLE", Seq(
      Row("a", 1.0), Row("a", 2.0), Row("a", 3.0), Row("a", 4.0),
      Row("b", 100.0), Row("b", 200.0),
      Row("b", null), Row("b", Double.NaN),
      Row("c", null)))
    val up = graft.operators.GroupOps
      .filterByGroupQuantile(d, "k", "v", prob = 0.5)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      .sortBy(identity)
    // per-group np.interp medians: a -> 2.0 (f(2)=0.5 exactly),
    // b -> 100.0 (f(100)=0.5). "a" drops its 1.0; "b" keeps both —
    // each group is gated against ITS OWN distribution
    assert(up == Seq(("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 100.0), ("b", 200.0)))
    assert(!up.exists(_._1 == "c")) // all-null group dropped
    assert(up.nonEmpty && up.forall(t => !t._2.isNaN))
    val down = graft.operators.GroupOps
      .filterByGroupQuantile(d, "k", "v", prob = 0.5, keepUpper = false)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(down.exists(_ == ("a", 1.0)) && !down.contains(("a", 4.0)))
  }

  test("trimmedStats: outliers deleted from the trimmed mean, pulled " +
      "to the fence in the winsorized; counts exact; NaN missing") {
    import org.apache.spark.sql.Row
    // group a: 1..9 plus a 1e6 sentinel; p10/p90 interp fences over
    // 10 values at q=.1/.9 -> lo=1.(interp), hi well under 1e6
    val rows = ((1 to 9).map(i => Row("a", i.toDouble)) :+
      Row("a", 1e6) :+ Row("a", Double.NaN) :+ Row("a", null)) ++
      Seq(Row("b", 5.0))
    val d = df("k STRING, v DOUBLE", rows)
    val out = graft.operators.GroupOps
      .trimmedStats(d, "k", "v", loQ = 0.1, hiQ = 0.9)
      .orderBy("k").collect()
    val a = out(0)
    assert(a.getLong(1) == 10L)      // NaN + null excluded from n
    assert(a.getLong(2) < 10L)       // the sentinel is outside
    // trimmed mean unpoisoned: within [1, 9]-ish, nowhere near 1e5
    assert(a.getDouble(3) > 1.0 && a.getDouble(3) < 10.0)
    // winsorized mean: sentinel pulled to the hi fence, so larger
    // than the trimmed mean but far below the sentinel/10
    assert(a.getDouble(4) > a.getDouble(3) && a.getDouble(4) < 1e5)
    // singleton group: lo = hi = the value, nothing trimmed
    val b = out(1)
    assert(b.getLong(1) == 1L && b.getLong(2) == 1L &&
      b.getDouble(3) == 5.0 && b.getDouble(4) == 5.0)
    intercept[IllegalArgumentException] {
      graft.operators.GroupOps.trimmedStats(d, "k", "v", 0.9, 0.1)
    }
  }

  test("inequalityStats: exact rank-form Gini and whale share, " +
      "equal groups read 0, negatives refuse") {
    val d = df("k STRING, v DOUBLE", Seq(
      Row("a", 10.0), Row("a", 10.0), Row("a", 10.0), Row("a", 70.0),
      Row("b", 5.0), Row("b", 5.0),
      Row("c", -1.0), Row("c", 2.0),
      Row("d", null)))
    val out = GroupOps.inequalityStats(d, "k", "v")
      .orderBy("k").collect()
    val a = out(0)
    assert(a.getLong(1) == 4L)
    assert(math.abs(a.getDouble(2) - 0.45) < 1e-12)
    assert(a.getDouble(3) == 0.7)      // top 1 of 4 = the whale
    assert(out(1).getDouble(2) == 0.0) // perfect equality
    assert(out(1).getDouble(3) == 0.5)
    assert(out(2).isNullAt(2) && out(2).isNullAt(3))
    assert(out.length == 3)            // all-null group vanishes
  }

  test("correlationMatrix: all pairs in one pass, pairwise-complete " +
      "counts, constant column refuses") {
    val d = df("x DOUBLE, y DOUBLE, z DOUBLE, w DOUBLE", Seq(
      Row(1.0, 2.0, 3.0, 5.0),
      Row(2.0, 4.0, 1.0, 5.0),
      Row(3.0, 6.0, null, 5.0)))
    val out = GroupOps.correlationMatrix(d, Seq("x", "y", "z", "w"))
      .orderBy("col_a", "col_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSeq
    assert(out == Seq(
      ("x", "w", 3L, null),          // constant side refuses
      ("x", "y", 3L, 1.0),           // exact +1
      ("x", "z", 2L, -1.0),          // pairwise-complete n=2
      ("y", "w", 3L, null),
      ("y", "z", 2L, -1.0),
      ("z", "w", 2L, null)))
  }

  test("corrByGroup: exact pairwise-complete moments, perfect " +
      "lines read ±1 with the right beta, degenerates refuse") {
    val d = df("k STRING, x DOUBLE, y DOUBLE", Seq(
      Row("a", 1.0, 2.0), Row("a", 2.0, 4.0), Row("a", 3.0, 6.0),
      Row("b", 1.0, 5.0), Row("b", 2.0, 3.0),
      Row("c", 7.0, 1.0), Row("c", 7.0, 9.0),
      Row("d", 1.0, 1.0),
      Row("e", 1.0, null), Row("e", null, 4.0), Row("e", 2.0, 8.0)))
    val out = GroupOps.corrByGroup(d, "k", "x", "y")
      .orderBy("k").collect()
    def g(i: Int, c: String) = {
      val j = out(i).fieldIndex(c)
      if (out(i).isNullAt(j)) null else out(i).getDouble(j)
    }
    assert(math.abs(g(0, "corr").asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(g(0, "beta_yx").asInstanceOf[Double] - 2.0)
      < 1e-12)
    assert(math.abs(g(1, "corr").asInstanceOf[Double] + 1.0) < 1e-12)
    assert(g(2, "corr") == null)    // constant x refuses both
    assert(g(2, "beta_yx") == null)
    assert(g(3, "corr") == null)    // single pair
    assert(out(4).getLong(1) == 1L) // only the complete pair counts
  }

  test("sigmaOutlierShare: exact micro moments, deterministic " +
      "exceedance, zero-variance groups report zero outliers") {
    // one spike among k flats sits at sqrt(k)*sigma, so k = 12
    // puts it at 3.46 sigma — a clear exceedance, not a boundary
    val d = df("k STRING, v DOUBLE",
      (1 to 12).map(_ => Row("a", 10.0)) ++ Seq(Row("a", 1000.0),
        Row("b", 7.0), Row("b", 7.0),       // zero variance
        Row("c", null), Row("c", Double.NaN)))
    val out = GroupOps.sigmaOutlierShare(d, "k", "v")
      .orderBy("k").collect()
    val a = out(0)
    assert(a.getLong(1) == 13L)
    assert(math.abs(a.getDouble(2) - 1120.0 / 13.0) < 1e-9)
    assert(a.getLong(4) == 1L)                 // the spike
    assert(a.getDouble(5) == 1.0 / 13.0)
    val b = out(1)
    assert(b.getLong(1) == 2L && b.getDouble(3) == 0.0 &&
      b.getLong(4) == 0L)
    val c = out(2)
    assert(c.getLong(1) == 0L && c.isNullAt(2) && c.getLong(4) == 0L)
  }
}
