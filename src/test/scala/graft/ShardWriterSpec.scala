package graft

import graft.io.ShardWriter
import graft.text.Sharding
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Binary shard writer round trip: framing golden, audit vs the
  * layout manifest, loud failure on tampered bytes.
  */
class ShardWriterSpec extends SparkSpec {

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_shardwriter_spec").toString

  private val keys = Seq("byte_shard", "shard_in_span")

  // cum_bytes_before by id: 0, 4, 4 — byteBudget 4 cuts after id 1:
  // shard (0,0) = id 1 alone, shard (1,0) = ids 2 (empty member), 3
  private def fixture() = {
    val d = df("id BIGINT, sz BIGINT, bytes BINARY", Seq(
      Row(1L, 4L, Array[Byte](10, 11, 12, 13)),
      Row(2L, 0L, Array.emptyByteArray), // empty member
      Row(3L, 6L, Array[Byte](1, 2, 3, 4, 5, 6))))
    Sharding.packShardsDual(d.drop("bytes"), "id", "sz",
      byteBudget = 4L, maxRows = 5L)
      .join(d.select("id", "bytes"), Seq("id"))
  }

  test("writeShards: framing golden — 8-byte id, 8-byte length, " +
      "payload, members in layout order; empty payloads frame fine") {
    val dir = tmp()
    val stats = ShardWriter.writeShards(fixture(), "id", "bytes",
      "seq", keys, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(stats == Map((0L, 0L) -> ((1L, 4L)), (1L, 0L) -> ((2L, 6L))))
    val f0 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/shard-0-0.bin"))
    assert(f0.length == 16 + 4)
    val b0 = java.nio.ByteBuffer.wrap(f0)
    assert(b0.getLong == 1L && b0.getLong == 4L)
    assert(Seq(b0.get(), b0.get(), b0.get(), b0.get()) ==
      Seq(10: Byte, 11: Byte, 12: Byte, 13: Byte) && !b0.hasRemaining)
    val f1 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/shard-1-0.bin"))
    assert(f1.length == 16 + 0 + 16 + 6)
    val b1 = java.nio.ByteBuffer.wrap(f1)
    assert(b1.getLong == 2L && b1.getLong == 0L) // empty member frame
    assert(b1.getLong == 3L && b1.getLong == 6L)
  }

  test("auditShards: re-parsed bytes match the manifest exactly; a " +
      "missing shard audits all-false; truncation fails loudly") {
    val dir = tmp()
    val fx = fixture()
    ShardWriter.writeShards(fx, "id", "bytes", "seq", keys, dir)
      .count()
    val manifest = Sharding.shardManifest(fx.drop("bytes"), "id", "sz",
      keys)
    val audit = ShardWriter.auditShards(spark, dir, manifest, keys)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Boolean]("members_match"),
          r.getAs[Boolean]("bytes_match"),
          r.getAs[Boolean]("fp_match"))).toMap
    assert(audit == Map((0L, 0L) -> ((true, true, true)),
      (1L, 0L) -> ((true, true, true))), s"audit: $audit")
    // delete one shard: its manifest row must audit all-false
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/shard-1-0.bin"))
    val after = ShardWriter.auditShards(spark, dir, manifest, keys)
      .filter(col("byte_shard") === 1L).collect().head
    assert(!after.getAs[Boolean]("members_match") &&
      !after.getAs[Boolean]("bytes_match") &&
      !after.getAs[Boolean]("fp_match"))
    // truncate the surviving shard mid-frame: loud failure, not a
    // silently short audit
    val p = java.nio.file.Paths.get(s"$dir/shard-0-0.bin")
    val all = java.nio.file.Files.readAllBytes(p)
    java.nio.file.Files.write(p, all.take(all.length - 10))
    val ex = intercept[Exception] {
      ShardWriter.readShardMembers(spark, dir).collect()
    }
    assert(ex.getMessage != null)
  }
}
