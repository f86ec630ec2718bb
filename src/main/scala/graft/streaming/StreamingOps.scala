package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming counterparts of the temporal feature ops
  * (graft.temporal.*): the same semantics expressed with readStream /
  * watermark / stateful operators, so a pipeline built on the batch
  * engine can run incrementally over an event stream.
  *
  * The reference has no streaming surface (tubular is batch-only); these
  * re-express §2.11 of SURVEY.md for unbounded inputs.
  */
object StreamingOps {

  /** Gap sessionization on a stream: Spark's native session_window
    * (merging windows that close after `gap` of event-time silence) +
    * watermark for state eviction. Codegen'd, no custom state — the
    * Spark-first answer to "sessionize a click stream".
    *
    * Output: entity, session start/end, event count, value sum.
    */
  def sessionizeStream(events: DataFrame, entity: String, ts: String,
      gap: String, watermark: String = "10 minutes",
      valueCol: Option[String] = None): DataFrame = {
    val aggCols = count(lit(1)).as("n_events") +:
      valueCol.map(v => sum(col(v)).as(s"${v}_sum")).toSeq
    val agg = events
      .withWatermark(ts, watermark)
      .groupBy(session_window(col(ts), gap).as("session"),
        col(entity))
      .agg(aggCols.head, aggCols.tail: _*)
    val outCols = Seq(col(entity),
      col("session.start").as("session_start"),
      col("session.end").as("session_end"),
      col("n_events")) ++ valueCol.map(v => col(s"${v}_sum"))
    agg.select(outCols: _*)
  }

  /** Sliding/tumbling rolling aggregate on a stream: watermark +
    * window() groupBy — the streaming analogue of
    * WindowOps.rollingRange.
    */
  def rollingWindowStream(events: DataFrame, entity: String, ts: String,
      windowLen: String, slide: String, valueCol: String,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(ts, watermark)
      .groupBy(window(col(ts), windowLen, slide).as("w"), col(entity))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)).as(s"${valueCol}_sum"),
        avg(col(valueCol)).as(s"${valueCol}_avg"))
      .select(col(entity), col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("n_events"),
        col(s"${valueCol}_sum"), col(s"${valueCol}_avg"))

  /** Streaming exact dedup — the incremental counterpart of
    * `Dedup.exact`: key = xxhash64 of the content columns, state scoped
    * by the watermark (`dropDuplicatesWithinWatermark`), so the state
    * store holds ONE 8-byte hash per document inside the lateness
    * horizon instead of growing unboundedly. At ingest scale the
    * horizon is the dedup contract: duplicates farther apart than the
    * watermark are the batch `Dedup.exact` backfill's job (same
    * lambda-architecture split as the as-of enrich below).
    */
  def dedupStream(docs: DataFrame, ts: String, contentCols: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__content_key", xxhash64(contentCols.map(col): _*))
      .withWatermark(ts, watermark)
      .dropDuplicatesWithinWatermark("__content_key")
      .drop("__content_key")

  // ---- streaming as-of enrich ------------------------------------------

  /** A tagged record on the unioned feature/event stream:
    * side 0 = feature snapshot (carries `value`), side 1 = event.
    */
  case class Tagged(entity: String, ts: Timestamp, side: Int,
      value: Option[Double], payload: Option[Double])

  case class Enriched(entity: String, ts: Timestamp, payload: Double,
      featureAtOrBefore: Option[Double], featureTs: Option[Timestamp])

  /** Per-entity carry state (public: the state encoder's generated code
    * must reach the constructor).
    */
  case class CarryState(featureTs: Long, value: Double)

  /** Streaming point-in-time enrich — the incremental counterpart of
    * AsOfJoin: per entity, keep the LATEST feature snapshot seen so far
    * (by event time) in group state; each event is emitted with the
    * newest feature whose ts <= event ts.
    *
    * Within a micro-batch, records are processed in event-time order
    * with features winning ties (same <=-semantics as the batch join).
    * Cross-batch ordering relies on the source watermark: a feature
    * arriving later than an already-emitted event cannot retro-enrich
    * it (streams are append-only) — the batch AsOfJoin is the backfill
    * path for late data, exactly the lambda shape production feature
    * stores use.
    */
  def asOfEnrichStream(tagged: Dataset[Tagged]): Dataset[Enriched] = {
    import tagged.sparkSession.implicits._
    tagged
      .groupByKey(_.entity)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(enrichGroup)
  }

  private def enrichGroup(entity: String, rows: Iterator[Tagged],
      state: GroupState[CarryState]): Iterator[Enriched] = {
    val sorted = rows.toSeq.sortBy(t => (t.ts.getTime, t.side))
    var carry = state.getOption
    val out = Seq.newBuilder[Enriched]
    sorted.foreach { t =>
      if (t.side == 0) {
        if (carry.forall(_.featureTs <= t.ts.getTime))
          carry = Some(CarryState(t.ts.getTime, t.value.get))
      } else {
        out += Enriched(entity, t.ts, t.payload.getOrElse(Double.NaN),
          carry.map(_.value), carry.map(c => new Timestamp(c.featureTs)))
      }
    }
    carry.foreach(state.update)
    out.result().iterator
  }
}
