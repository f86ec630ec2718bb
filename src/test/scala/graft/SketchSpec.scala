package graft

import graft.core.{Sketch, Stats}
import graft.operators.CappingTransformer
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Histogram quantile sketch: error bound vs the exact machinery,
  * determinism / partition invariance (mergeability), edge cases, and
  * the capper's sketch-fit path with JSON round-trip.
  */
class SketchSpec extends SparkSpec {

  private def rng(seed: Long, n: Int): Seq[Double] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(r.nextDouble() * 200 - 100)
  }

  test("sketch quantiles are within one bin width of exact, " +
      "weighted and unweighted") {
    val n = 2000
    val xs = rng(1, n); val ys = rng(2, n)
    val ws = rng(3, n).map(w => math.abs(w) % 5 + 0.5)
    val d = df("x double, y double, w double",
      (0 until n).map(i => Row(xs(i), ys(i), ws(i))))
    val probs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val perCol = Map("x" -> probs, "y" -> probs)
    for (wc <- Seq(lit(1.0), col("w")); bins <- Seq(64, 1024)) {
      val exact = Stats.weightedQuantilesMelted(d, perCol, wc)
      val approx = Sketch.histQuantilesMelted(d, perCol, wc, bins)
      for (c <- Seq("x", "y")) {
        val bound = 200.0 / bins // data range is [-100, 100]
        probs.indices.foreach { i =>
          val e = exact(c)(i).get; val a = approx(c)(i).get
          assert(math.abs(a - e) <= bound + 1e-9,
            s"col=$c p=${probs(i)} bins=$bins exact=$e approx=$a")
        }
      }
    }
  }

  test("sketch is deterministic and partition-invariant (mergeable " +
      "bin counts)") {
    val n = 1500
    val xs = rng(7, n)
    val d = df("x double", xs.map(Row(_)))
    val perCol = Map("x" -> Seq(0.1, 0.5, 0.9))
    val parts = Seq(1, 3, 16).map(p =>
      Sketch.histQuantilesMelted(d.repartition(p), perCol, lit(1.0), 256))
    assert(parts.distinct.size == 1,
      s"results differ across partition counts: $parts")
  }

  test("constant column, nulls, NaN, zero weights, empty input") {
    val d = df("x double, w double", Seq(
      Row(5.0, 1.0), Row(5.0, 2.0), Row(null, 1.0),
      Row(Double.NaN, 1.0), Row(7.0, 0.0)))
    val r = Sketch.histQuantilesMelted(
      d, Map("x" -> Seq(0.0, 0.5, 1.0)), col("w"), 128)
    // only the two weight>0, non-null, non-NaN rows (both 5.0) count
    assert(r("x") == Seq(Some(5.0), Some(5.0), Some(5.0)))
    val empty = Sketch.histQuantilesMelted(
      d.filter(col("x") > 100), Map("x" -> Seq(0.5)), lit(1.0), 128)
    assert(empty("x") == Seq(None))
  }

  test("groupedHistQuantiles: per-key parity with the melted sketch, " +
      "error bound vs exact, null-key group kept, weighted") {
    val n = 900
    val r = new scala.util.Random(13)
    val rows = (0 until n).map { i =>
      Row(if (i % 10 == 0) null else s"k${i % 3}",
        r.nextDouble() * 50, r.nextDouble() * 3 + 0.5)
    }
    val d = df("k STRING, v DOUBLE, w DOUBLE", rows)
    val probs = Seq(0.1, 0.5, 0.9)
    val out = Sketch.groupedHistQuantiles(d, "k", "v", probs,
      bins = 128, weight = col("w"))
      .collect()
      .map(x => (Option(x.getString(0)), x.getDouble(1)) -> x.getDouble(2))
      .toMap
    // every key (including the null key) x prob present
    assert(out.keySet ==
      (Seq(None, Some("k0"), Some("k1"), Some("k2"))
        .flatMap(k => probs.map(p => (k, p)))).toSet)
    // per-key parity with the melted sketch on that key's slice
    for (k <- Seq(Some("k0"), Some("k1"), None)) {
      val slice = k match {
        case Some(s) => d.filter(col("k") === s)
        case None => d.filter(col("k").isNull)
      }
      val melted = Sketch.histQuantilesMelted(slice,
        Map("v" -> probs), col("w"), 128)("v")
      probs.indices.foreach { i =>
        assert(math.abs(out((k, probs(i))) - melted(i).get) < 1e-12,
          s"key=$k p=${probs(i)}")
      }
      // and within one bin width of the exact weighted quantile
      val exact = Stats.weightedQuantilesMelted(slice,
        Map("v" -> probs), col("w"))("v")
      probs.indices.foreach { i =>
        assert(math.abs(out((k, probs(i))) - exact(i).get) <=
          50.0 / 128 + 1e-9, s"key=$k p=${probs(i)} vs exact")
      }
    }
  }

  test("capper sketch fit: caps within bound of exact fit; JSON " +
      "round-trip preserves histogram_bins") {
    val n = 3000
    val xs = rng(11, n)
    val d = df("v double", xs.map(Row(_)))
    val q = Map("v" -> (Some(0.05): Option[Double],
      Some(0.95): Option[Double]))
    val exact = new CappingTransformer(quantiles = q).fit(d)
    val sk = new CappingTransformer(quantiles = q,
      histogramBins = Some(512)).fit(d)
    val bound = (xs.max - xs.min) / 512
    val (el, eh) = exact.fittedCaps("v"); val (sl, sh) = sk.fittedCaps("v")
    assert(math.abs(sl.get - el.get) <= bound + 1e-9)
    assert(math.abs(sh.get - eh.get) <= bound + 1e-9)
    // JSON round-trip: histogram_bins survives init serialization and
    // the restored transformer re-fits through the sketch path
    val json = graft.core.Json.transformerToJson(sk)
    val back = graft.core.Json.transformerFromJson(json)
      .asInstanceOf[CappingTransformer]
    assert(back.histogramBins == Some(512))
    assert(back.fittedCaps == sk.fittedCaps) // fitted state carried
  }

  test("hll: estimate within the 3-sigma bound across cardinalities, " +
    "duplicates invisible, registers partition-invariant") {
    import spark.implicits._
    val p = 9; val m = 1 << p
    val sigma3 = 3 * 1.04 / math.sqrt(m) // ~13.8% at m=512
    Seq(100, 2000, 50000).foreach { n =>
      val items = (0 until n).map(i => s"item_$i")
      val d = items.toDF("t")
      val est = graft.core.Hll
        .hllReadout(graft.core.Hll.hllRegisters(d, "t", p), p)
        .head().getDouble(3)
      assert(math.abs(est - n) <= sigma3 * n + 2,
        s"n=$n est=$est off by ${math.abs(est - n) / n}")
      // duplicates cannot move a register (MAX is idempotent)
      val dup = (items ++ items ++ items.take(n / 2)).toDF("t")
      val est2 = graft.core.Hll
        .hllReadout(graft.core.Hll.hllRegisters(dup, "t", p), p)
        .head().getDouble(3)
      assert(est2 == est)
    }
    // partition invariance = mergeability of the MAX state
    val d1 = (0 until 5000).map(i => s"x$i").toDF("t").repartition(1)
    val d32 = (0 until 5000).map(i => s"x$i").toDF("t").repartition(32)
    val r1 = graft.core.Hll.hllRegisters(d1, "t", p)
      .orderBy("reg").collect().toSeq
    val r32 = graft.core.Hll.hllRegisters(d32, "t", p)
      .orderBy("reg").collect().toSeq
    assert(r1 == r32)
  }

  test("hll: rank derives from integer shift, small-range linear " +
    "counting, bounded state") {
    import spark.implicits._
    val p = 9; val m = 1 << p
    // tiny cardinality triggers the linear-counting branch:
    // E_raw <= 2.5m and zeros > 0 -> m * ln(m / zeros)
    val small = (0 until 30).map(i => s"s$i").toDF("t")
    val regs = graft.core.Hll.hllRegisters(small, "t", p)
    val nPresent = regs.count()
    val est = graft.core.Hll.hllReadout(regs, p).head().getDouble(3)
    val expected = m * math.log(m.toDouble / (m - nPresent))
    assert(math.abs(est - expected) < 1e-6)
    // register table is bounded by m however large the input
    val big = (0 until 200000).map(i => s"b$i").toDF("t")
    assert(graft.core.Hll.hllRegisters(big, "t", p).count() <= m)
    // the (reg, rho) rule matches a driver-side integer replay on the
    // same md5 fold — guards the shiftright-not-double-division rule
    val probe = Seq("alpha", "beta", "gamma", "", "0").toDF("t")
    val got = probe
      .select(graft.core.Hashing.md5Hash60(col("t")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val sparkRR = graft.core.Hll.hllRegisters(probe, "t", p)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    got.foreach { h =>
      val reg = (h % m).toInt
      val w = h >>> p
      val rho = math.min(
        if (w == 0) 60 - p + 1
        else 60 - p - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1,
        graft.core.Hll.RhoCap)
      assert(sparkRR(reg) >= rho) // MAX-merged, so at least this rank
    }
  }

  test("hll by key: per-key parity with the global sketch, bounded " +
    "per-key state, null key is its own group") {
    import spark.implicits._
    val p = 9
    val d = (0 until 3000).map(i =>
      (if (i % 10 == 0) null else s"k${i % 3}", s"item_${i % 700}"))
      .toDF("k", "t")
    val byKey = graft.core.Hll.hllReadoutByKey(
      graft.core.Hll.hllRegistersByKey(d, "k", "t", p), p)
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(byKey.keySet ==
      Set(None, Some("k0"), Some("k1"), Some("k2")))
    // each key's readout equals the GLOBAL sketch over that key's slice
    for (k <- Seq(Some("k1"), None)) {
      val slice = k match {
        case Some(s) => d.filter(col("k") === s)
        case None => d.filter(col("k").isNull)
      }
      val g = graft.core.Hll.hllReadout(
        graft.core.Hll.hllRegisters(slice, "t", p), p).head()
      assert(byKey(k) == ((g.getLong(1), g.getLong(2), g.getDouble(3))),
        s"key=$k")
    }
    // state bound: <= |keys| x 2^p register rows
    assert(graft.core.Hll.hllRegistersByKey(d, "k", "t", p).count()
      <= 4L * (1 << p))
  }

  test("hll: empty input reads out estimate 0 (not null)") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("t")
    val r = graft.core.Hll.hllReadout(
      graft.core.Hll.hllRegisters(empty, "t", 9), 9).head()
    assert(r.getLong(1) == 0L)             // n_present
    assert(r.getLong(2) == 512L * (1L << 40)) // all-empty micro sum
    assert(r.getDouble(3) == 0.0)          // ln(m/m) = 0 distinct
  }
}
