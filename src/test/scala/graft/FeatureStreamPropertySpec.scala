package graft

import graft.streaming.StreamingOps
import graft.temporal.WindowOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Randomized equivalence for the ONE-STATE-ROW streaming feature
  * matrix: on seeded random event logs (timestamp ties, missing and
  * NaN values, unknown types, lone entities, random micro-batch
  * splits) the stream must land EVERY register — session ordinal,
  * micros into session, per-type recency, monotone direction/run,
  * expanding trend — bit-for-bit on the composed batch plan. This
  * transitively exercises the four standalone companions' update
  * rules across shapes a hand-written vector suite never covers.
  */
class FeatureStreamPropertySpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(1704100000000L + sec * 1000L)

  private def runCase(seed: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(seed)
    val nEnt = 1 + rnd.nextInt(4)
    val types = Seq("purchase", "view")
    val allTypes = Seq("purchase", "view", "other")
    val n = 5 + rnd.nextInt(35)
    val ev = (0 until n).map { i =>
      StreamingOps.FmEvent(
        rnd.nextInt(nEnt).toLong, i.toLong,
        ts(rnd.nextInt(40).toLong * 700L), // coarse grid: real ties
        allTypes(rnd.nextInt(allTypes.size)),
        rnd.nextInt(10) match {
          case 0 => None
          case 1 => Some(Double.NaN)
          case _ => Some((rnd.nextInt(2000) - 500) / 7.0)
        })
    }.sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId))
    val gap = 600L + rnd.nextInt(1200)

    val input = MemoryStream[StreamingOps.FmEvent]
    val sink = s"fm_prop_$seed"
    val q = StreamingOps.featureMatrixStream(input.toDS(), types, gap)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    val got = try {
      // random chunking into 1..4 micro-batches
      val cuts = (Seq(0, ev.length) ++
        Seq.fill(rnd.nextInt(3))(rnd.nextInt(ev.length + 1)))
        .distinct.sorted
      cuts.zip(cuts.tail).foreach { case (a, b) =>
        if (b > a) { input.addData(ev.slice(a, b): _*) }
        q.processAllAvailable()
      }
      spark.table(sink).orderBy("eventId").collect().map { r =>
        val s = r.getSeq[Any](5)
        (r.getLong(0), r.getLong(3), r.getLong(4),
          s.map(Option(_).map(_.asInstanceOf[Long])).toList,
          if (r.isNullAt(6)) null else r.getInt(6),
          if (r.isNullAt(7)) null else r.getLong(7),
          if (r.isNullAt(8)) null else r.getDouble(8))
      }.toSeq
    } finally q.stop()

    val d = df("e BIGINT, ts TIMESTAMP, id BIGINT, t STRING, " +
      "v DOUBLE", ev.map(e => Row(e.entity, e.ts, e.eventId,
        e.eventType, e.value.map(Double.box).orNull)))
    val batch = WindowOps.featureMatrix(d, "e", "ts", "v", "t",
      types, gap, Seq("id")).orderBy("id").collect().map { r =>
        def j(c: String) = r.fieldIndex(c)
        def nl[T](c: String, f: Int => T): Any =
          if (r.isNullAt(j(c))) null else f(j(c))
        (r.getLong(2), r.getLong(j("session_event_seq")),
          r.getLong(j("us_into_session")),
          List("us_since_purchase", "us_since_view").map(c =>
            if (r.isNullAt(j(c))) None else Some(r.getLong(j(c)))),
          nl("v_dir", r.getInt), nl("v_dir_run", r.getLong),
          nl("v_trend", r.getDouble))
      }.toSeq
    assert(got == batch,
      s"seed $seed: stream\n$got\nvs batch\n$batch")
  }

  test("streaming feature matrix equals the composed batch matrix " +
      "on 20 seeded random logs with ties, gaps, NaN and nulls") {
    (1 to 20).foreach(runCase)
  }

  private def runGapCase(seed: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(seed)
    val nEnt = 1 + rnd.nextInt(4)
    val n = 5 + rnd.nextInt(35)
    val ev = (0 until n).map { i =>
      StreamingOps.GapEvent(rnd.nextInt(nEnt).toLong, i.toLong,
        ts(rnd.nextInt(40).toLong * 700L)) // coarse grid: real ties
    }.sortBy(e => (StreamingOps.toMicros(e.ts), e.eventId))

    val input = MemoryStream[StreamingOps.GapEvent]
    val sink = s"gap_prop_$seed"
    val q = StreamingOps.gapSurpriseStream(input.toDS())
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    val got = try {
      val cuts = (Seq(0, ev.length) ++
        Seq.fill(rnd.nextInt(3))(rnd.nextInt(ev.length + 1)))
        .distinct.sorted
      cuts.zip(cuts.tail).foreach { case (a, b) =>
        if (b > a) { input.addData(ev.slice(a, b): _*) }
        q.processAllAvailable()
      }
      spark.table(sink).orderBy("eventId").collect().map { r =>
        def nl[T](i: Int, f: Int => T): Any =
          if (r.isNullAt(i)) null else f(i)
        (r.getLong(0), nl(3, r.getLong), r.getLong(4),
          nl(5, r.getDouble), nl(6, r.getDouble))
      }.toSeq
    } finally q.stop()

    val d = df("e BIGINT, ts TIMESTAMP, id BIGINT",
      ev.map(e => Row(e.entity, e.ts, e.eventId)))
    val batch = WindowOps.gapSurprise(d, "e", "ts", Seq("id"))
      .orderBy("id").collect().map { r =>
        def nl[T](i: Int, f: Int => T): Any =
          if (r.isNullAt(i)) null else f(i)
        (r.getLong(2), nl(3, r.getLong), r.getLong(4),
          nl(5, r.getDouble), nl(6, r.getDouble))
      }.toSeq
    assert(got == batch,
      s"seed $seed: stream\n$got\nvs batch\n$batch")
  }

  test("streaming gap surprise equals the batch window op on 12 " +
      "seeded random logs with ties and random micro-batch splits") {
    (1 to 12).foreach(runGapCase)
  }
}
