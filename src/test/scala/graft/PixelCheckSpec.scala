package graft

import graft.validate.PixelCheck
import graft.io.ImageTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Image payload integrity (BASELINE.json: decoded-pixel allclose,
  * PSNR >= 40 dB for lossy formats; caption equality at every
  * entity x timestamp).
  */
class PixelCheckSpec extends SparkSpec {

  test("PNG round-trip is lossless (PSNR = inf)") {
    Seq((42L, 16, 16), (7L, 33, 9)).foreach { case (seed, w, h) =>
      assert(PixelCheck.roundTripPsnr(seed, w, h, "png").isPosInfinity)
    }
  }

  test("JPEG round-trip reaches PSNR >= 40 dB") {
    Seq((42L, 32, 32), (7L, 48, 24)).foreach { case (seed, w, h) =>
      val p = PixelCheck.roundTripPsnr(seed, w, h, "jpeg")
      assert(p >= 40.0, s"PSNR $p < 40 for seed=$seed ${w}x$h")
    }
  }

  test("image table generation is deterministic and schema-correct") {
    val a = ImageTable.images(spark, 50).collect()
    val b = ImageTable.images(spark, 50).collect()
    assert(a.toSeq == b.toSeq)
    val schema = ImageTable.images(spark, 1).schema
    assert(schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      "image_id" -> "string", "bytes" -> "binary", "w" -> "int",
      "h" -> "int", "fmt" -> "string", "caption" -> "string",
      "phash" -> "bigint"))
  }

  test("payload bytes cover w*h and are non-trivial") {
    val rows = ImageTable.images(spark, 20)
      .select(col("w"), col("h"), length(col("bytes")).as("n")).collect()
    rows.foreach { r =>
      assert(r.getInt(2) >= r.getInt(0) * r.getInt(1) / 2)
    }
  }

  test("caption equality at every entity x snapshot (deterministic)") {
    val s1 = ImageTable.snapshots(spark, 30).collect().toSeq
    val s2 = ImageTable.snapshots(spark, 30).collect().toSeq
    assert(s1 == s2)
  }
}
