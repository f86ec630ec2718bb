package graft

import graft.io.{IncrementalView, SnapshotStore}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental latest-per-entity maintenance: correctness of the
  * derived table, WORK proportional to the change (untouched buckets
  * carried by reference, bit-identical paths), the delete path, and
  * the overwrite commit's guards.
  */
class IncrementalViewSpec extends SparkSpec {

  private def tmp(pfx: String): String =
    Files.createTempDirectory(pfx).toString

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // ids 0..7 over 4 hash buckets; two readings each
  private def v1rows = (0L until 8L).flatMap(i => Seq(
    Row(i, ts(s"2024-01-01 0${i % 6}:00:00"), i.toDouble),
    Row(i, ts(s"2024-01-01 0${i % 6}:30:00"), i.toDouble + 0.5)))

  test("maintainLatest: bootstrap equals direct latest; a one-entity " +
      "update rewrites ONLY that entity's bucket — every other " +
      "derived bucket carries by reference; delete empties; no-op " +
      "writes nothing") {
    val src = tmp("iv_src"); val dst = tmp("iv_dst")
    val bucket = SnapshotStore.byKey("id", 4)
    def frame(rows: Seq[Row]) =
      df("id BIGINT, ts TIMESTAMP, v DOUBLE", rows)

    SnapshotStore.write(frame(v1rows), src, bucket)
    val r1 = IncrementalView.maintainLatest(spark, src, dst, bucket,
      "id", "ts", "v")
    assert(r1.write.isDefined && IncrementalView.watermark(dst)
      .contains(r1.sourceSnapshot))
    val d1 = SnapshotStore.read(spark, dst).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(d1 == (0L until 8L).map(i => i -> (i + 0.5)).toMap)

    // v2: ONE entity gets a newer reading -> exactly one source
    // bucket changes -> exactly one derived bucket rewrites
    val v2 = v1rows :+ Row(3L, ts("2024-01-01 09:00:00"), 99.0)
    SnapshotStore.write(frame(v2), src, bucket)
    val man1 = SnapshotStore.manifest(dst, 1).map(e => e.bucket -> e.path).toMap
    val r2 = IncrementalView.maintainLatest(spark, src, dst, bucket,
      "id", "ts", "v")
    assert(r2.changedBuckets.size == 1, s"changed: ${r2.changedBuckets}")
    assert(r2.write.get.written == r2.changedBuckets)
    val man2 = SnapshotStore.manifest(dst, 2).map(e => e.bucket -> e.path).toMap
    man1.keys.filterNot(r2.changedBuckets.contains).foreach { b =>
      assert(man2(b) == man1(b),
        s"untouched derived bucket $b must carry by reference")
    }
    val d2 = SnapshotStore.read(spark, dst).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(d2(3L) == 99.0 && d2.size == 8)
    assert((d2 - 3L) == (d1 - 3L))

    // v3: every row of one entity vanishes; if that empties a source
    // bucket the derived twin must empty too (no stale latest row)
    val gone = 3L
    val v3 = v2.filterNot(_.getLong(0) == gone)
    SnapshotStore.write(frame(v3), src, bucket)
    val r3 = IncrementalView.maintainLatest(spark, src, dst, bucket,
      "id", "ts", "v")
    assert(r3.write.isDefined)
    val d3 = SnapshotStore.read(spark, dst).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!d3.contains(gone) && d3.size >= 6,
      s"stale latest row for deleted entity: $d3")

    // no-op: watermark already at head
    val r4 = IncrementalView.maintainLatest(spark, src, dst, bucket,
      "id", "ts", "v")
    assert(r4.write.isEmpty && r4.changedBuckets.isEmpty)
  }

  test("overwriteBuckets: incoming rows outside the declared set are " +
      "loud; unchanged listed buckets carry, not rewrite") {
    val root = tmp("iv_ow")
    val bucket = SnapshotStore.byKey("id", 4)
    val d = df("id BIGINT, v DOUBLE",
      (0L until 8L).map(i => Row(i, i.toDouble)))
    SnapshotStore.write(d, root, bucket)
    val all = SnapshotStore.manifest(root, 1).map(_.bucket)
    intercept[IllegalArgumentException] {
      // rows span every bucket but only one is declared
      SnapshotStore.overwriteBuckets(d, root, bucket, Seq(all.head))
    }
    // identical content for ALL buckets: everything carries
    val r = SnapshotStore.overwriteBuckets(d, root, bucket, all)
    assert(r.written.isEmpty && r.carried.sorted == all.sorted)
    assert(SnapshotStore.verify(spark, root).isEmpty)
  }
}
