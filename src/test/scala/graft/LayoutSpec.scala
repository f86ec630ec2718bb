package graft

import graft.io.Layout
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Z-order layout: interleave golden, clustering quality (per-file
  * bounding boxes tighten vs natural order), null/constant handling,
  * range-stability across batches.
  */
class LayoutSpec extends SparkSpec {

  test("interleave golden: bit l of dim d lands at l*k + d") {
    val d = df("a BIGINT, b BIGINT", Seq(Row(1L, 2L)))
    // a=0b01, b=0b10, bits=2: a bit0=1 -> pos 0; a bit1=0 -> pos 2;
    // b bit0=0 -> pos 1; b bit1=1 -> pos 3 => z = 1 + 8 = 9
    val z = d.select(Layout.interleave(Seq(col("a"), col("b")), 2))
      .head().getLong(0)
    assert(z == 9L)
    // identity for one dimension
    val one = d.select(Layout.interleave(Seq(col("a")), 4))
      .head().getLong(0)
    assert(one == 1L)
  }

  test("bucketize: clamped affine map, nulls and constants to 0") {
    val d = df("v DOUBLE", Seq(Row(0.0), Row(5.0), Row(10.0),
      Row(null), Row(-3.0), Row(99.0)))
    val b = d.select(Layout.bucketize(col("v"), 0.0, 10.0, 2))
      .collect().map(_.getLong(0)).toSeq
    // width 2.5: 0->0, 5->2, 10->3 (clamped from 4), null->0,
    // -3 -> clamped 0, 99 -> clamped 3
    assert(b == Seq(0L, 2L, 3L, 0L, 0L, 3L))
    val const = d.select(Layout.bucketize(col("v"), 7.0, 7.0, 4))
      .collect().map(_.getLong(0)).toSeq
    assert(const.forall(_ == 0L))
  }

  test("rangesOf ignores NaN: one NaN row must not collapse the " +
      "dimension (NaN max -> NaN width -> every bucket 0)") {
    val d = df("a DOUBLE, b DOUBLE", Seq(
      Row(1.0, 10.0), Row(5.0, 20.0), Row(Double.NaN, 30.0)))
    val r = Layout.rangesOf(d, Seq("a", "b"))
    assert(r == Seq((1.0, 5.0), (10.0, 30.0)))
  }

  test("z-order clustering tightens per-chunk bounding boxes vs " +
      "natural order") {
    val rnd = new scala.util.Random(5)
    val n = 4096
    val rows = Seq.fill(n)(Row(rnd.nextDouble() * 100,
      rnd.nextDouble() * 100))
    val d = df("x DOUBLE, y DOUBLE", rows)
    val z = Layout.zorder(d, Seq("x", "y"), bits = 10,
      numPartitions = 4)
    // simulate files: contiguous chunks of 64 rows in layout order
    def avgBoxArea(pts: Seq[(Double, Double)]): Double =
      pts.grouped(64).map { g =>
        val xs = g.map(_._1); val ys = g.map(_._2)
        (xs.max - xs.min) * (ys.max - ys.min)
      }.toSeq.sum / (pts.size / 64)
    val zOrdered = z.orderBy("__z").select("x", "y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    val natural = rows.map(r => (r.getDouble(0), r.getDouble(1)))
    val aZ = avgBoxArea(zOrdered); val aN = avgBoxArea(natural)
    // random chunks cover ~the whole [0,100]^2 box; z-order chunks
    // must cover well under a tenth of it
    assert(aZ < aN / 10, s"z-order avg box $aZ vs natural $aN")
  }

  test("explicit ranges make the mapping batch-stable") {
    val ranges = Seq((0.0, 100.0), (0.0, 100.0))
    val batch1 = df("x DOUBLE, y DOUBLE", Seq(Row(10.0, 20.0)))
    val batch2 = df("x DOUBLE, y DOUBLE",
      Seq(Row(10.0, 20.0), Row(99.0, 1.0)))
    def zOf(d: org.apache.spark.sql.DataFrame) =
      d.filter(col("x") === 10.0)
        .select(Layout.zValue(Seq(col("x"), col("y")), ranges, 8))
        .head().getLong(0)
    assert(zOf(batch1) == zOf(batch2))
  }
}
