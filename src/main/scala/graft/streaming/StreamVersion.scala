package graft.streaming

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Restarting a stateful stream over a checkpoint whose state was
  * written by an INCOMPATIBLE build fails deep inside the state-store
  * deserializer with an opaque Encoder error (flatMapGroupsWithState
  * state encoders are schema-sensitive). This raises the failure to a
  * named, actionable one: the checkpoint directory carries a
  * `_graft_state_version` marker (operator name + state-schema
  * version); on restart the marker must match the running build's
  * version for that operator or the start fails loudly BEFORE any
  * state is touched.
  */
class StateVersionMismatchException(val op: String,
    val checkpointDir: String, val found: String, val expected: String)
  extends IllegalStateException(
    s"streaming checkpoint at $checkpointDir holds $op state '$found' " +
      s"but this build runs '$expected' — state schemas are " +
      "incompatible across versions; restart the stream with a FRESH " +
      "checkpoint directory (late data can be backfilled with the " +
      "operator's batch companion)")

object StreamVersion {

  /** State-schema version per stateful operator in this build. Bump
    * whenever a GroupState case class changes shape (field add/remove/
    * type change) — the encoder cannot read the old bytes.
    */
  val Current: Map[String, Int] = Map(
    "cusumStream" -> 1,
    "zScoreStream" -> 2, // v1 rings used a Long.MinValue missing sentinel
    "rollingCorrStream" -> 1,
    "decayedFeatureStream" -> 1,
    "ewmMeanStream" -> 1,
    "phashNearDupStream" -> 2, // v1 BucketState had no maxTs
    "rollingWindowStream" -> 1,
    "windowedTopKStream" -> 1,
    "asOfEnrichStream" -> 1,
    "annEnrichStream" -> 1,
    "sessionizeStream" -> 1,
    "groupedQuantileSketchStream" -> 1)

  private val Marker = "_graft_state_version"

  /** Version-guarded checkpoint location: pass the result as the
    * stream's `checkpointLocation`. First use stamps the directory
    * with (op, version); a restart verifies the stamp and throws the
    * typed [[StateVersionMismatchException]] on any mismatch —
    * including a pre-existing checkpoint that carries NO stamp (its
    * state version is unknowable, which is the same operational
    * situation). Idempotent on the happy path.
    */
  def guardedCheckpoint(dir: String, op: String): String = {
    val version = Current.getOrElse(op,
      throw new IllegalArgumentException(
        s"unknown stateful operator '$op' — known: " +
          Current.keys.toSeq.sorted.mkString(", ")))
    val expected = s"$op/v$version"
    val root = Paths.get(dir)
    val marker = root.resolve(Marker)
    if (Files.exists(marker)) {
      val found = Files.readString(marker).trim
      if (found != expected)
        throw new StateVersionMismatchException(op, dir, found, expected)
    } else {
      val nonEmpty = Files.isDirectory(root) && {
        val s = Files.list(root)
        try s.iterator().asScala.hasNext finally s.close()
      }
      if (nonEmpty)
        throw new StateVersionMismatchException(op, dir,
          "<unstamped pre-existing checkpoint>", expected)
      Files.createDirectories(root)
      Files.writeString(marker, expected + "\n")
    }
    dir
  }
}
