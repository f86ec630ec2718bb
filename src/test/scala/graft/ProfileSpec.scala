package graft

import graft.operators.Profile
import org.apache.spark.sql.Row

class ProfileSpec extends SparkSpec {

  test("nullPatterns: exact per-mask counts, readable null lists") {
    import graft.operators.Profile
    import org.apache.spark.sql.Row
    val d = df("a STRING, b DOUBLE", Seq(
      Row("x", 1.0), Row("x", 1.0),
      Row(null, 2.0), Row("y", null), Row(null, null)))
    val got = Profile.nullPatterns(d, Seq("a", "b"))
      .orderBy("mask").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (0L, "", 2L), (1L, "a", 1L), (2L, "b", 1L), (3L, "a,b", 1L)))
  }

  test("columnProfile: per-column coverage, null rate and exact " +
      "distinct cardinality in one melted pass") {
    val d = df("a STRING, b INT", Seq(
      Row("x", 1), Row("x", 2), Row(null, 2), Row("y", null)))
    val out = Profile.columnProfile(d, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 4 && out("a").getLong(2) == 1)
    assert(out("a").getLong(3) == 2) // x, y — null not a distinct value
    assert(out("a").getDouble(4) == 0.25)
    assert(out("b").getLong(2) == 1 && out("b").getLong(3) == 2)
  }

  test("profileDrift: null-rate move, cardinality swing, undefined " +
      "ratio all flag; stable column does not") {
    val ref = df("ok STRING, nully STRING, expl INT, dead STRING", Seq(
      Row("a", "a", 1, null), Row("b", "b", 1, null),
      Row("a", "c", 1, null), Row("b", "d", 1, null)))
    val cur = df("ok STRING, nully STRING, expl INT, dead STRING", Seq(
      Row("a", null, 1, "x"), Row("b", null, 2, "y"),
      Row("a", "e", 3, "z"), Row("b", "f", 4, "w")))
    val out = Profile.profileDrift(ref, cur,
      Seq("ok", "nully", "expl", "dead"))
      .collect().map(r => r.getString(0) -> r).toMap
    // ok: same null rate (0), same 2 distincts -> no drift
    assert(!out("ok").getBoolean(out("ok").fieldIndex("drifted")))
    // nully: null rate 0 -> 0.5 -> drift
    assert(out("nully").getBoolean(out("nully").fieldIndex("drifted")))
    // expl: 1 distinct -> 4 distincts (ratio 4 > 2) -> drift
    assert(out("expl").getBoolean(out("expl").fieldIndex("drifted")))
    assert(out("expl").getDouble(out("expl").fieldIndex("distinct_ratio"))
      == 4.0)
    // dead: ref all-null (0 distincts) -> ratio undefined -> drift
    assert(out("dead").getBoolean(out("dead").fieldIndex("drifted")))
    assert(out("dead").isNullAt(out("dead").fieldIndex("distinct_ratio")))
    intercept[IllegalArgumentException] {
      Profile.profileDrift(ref, cur, Seq("ok"), distinctBand = 0.0)
    }
  }

  test("skewReport: hot keys pass the share gate with exact salt " +
      "factors, null keys stay null (no sentinel merge), cold drop") {
    // a REAL '<NULL>' string key must never merge with actual nulls
    val rows = Seq.fill(60)(Row("hot", "x")) ++
      Seq.fill(20)(Row(null, "x")) ++
      Seq.fill(10)(Row("<NULL>", "x")) ++
      (1 to 10).map(i => Row(s"cold$i", "x"))
    val d = df("k STRING, o STRING", rows)
    val out = Profile.skewReport(d, Seq("k"),
      shareThreshold = 0.05, partitions = 10)
      .collect().map(r => (Option(r.getString(1)), r.getBoolean(2)) ->
        ((r.getLong(3), r.getLong(5)))).toMap
    // hot: 60/100 -> ceil(0.6*10) = 6; real nulls and the '<NULL>'
    // string stay two separate rows; cold keys gone
    assert(out == Map(
      (Some("hot"), false) -> ((60L, 6L)),
      (None, true) -> ((20L, 2L)),
      (Some("<NULL>"), false) -> ((10L, 1L))))
    intercept[IllegalArgumentException] {
      Profile.skewReport(d, Seq("k"), shareThreshold = 1.5)
    }
    intercept[IllegalArgumentException] {
      Profile.skewReport(d, Seq("nope"))
    }
  }

  test("benfordAudit: digit counts exact, zero/null excluded, chi2 " +
      "golden, non-integral rejected") {
    val d = df("x BIGINT, y DOUBLE", Seq(
      Row(123L, 1.0), Row(19L, 1.0), Row(-234L, 1.0), Row(9000L, 1.0),
      Row(0L, 1.0), Row(null, 1.0)))
    val out = Profile.benfordAudit(d, Seq("x")).collect()(0)
    assert(out.getAs[Long]("n") == 4L)
    assert(out.getAs[Long]("c1") == 2L) // 123, 19
    assert(out.getAs[Long]("c2") == 1L) // |-234|
    assert(out.getAs[Long]("c9") == 1L) // 9000
    val es = Profile.BenfordShares
    val expChi2 = (1 to 9).map { k =>
      val c = k match { case 1 => 2.0; case 2 => 1.0; case 9 => 1.0
        case _ => 0.0 }
      val e = 4.0 * es(k - 1)
      (c - e) * (c - e) / e
    }.reduce(_ + _)
    assert(math.abs(out.getAs[Double]("chi2") - expChi2) < 1e-9)
    intercept[IllegalArgumentException] {
      Profile.benfordAudit(d, Seq("y")) // double column refused
    }
    // Long.MinValue must COUNT (digit 9 via textual sign strip), not
    // silently vanish through an abs() overflow
    val mv = df("x BIGINT", Seq(Row(Long.MinValue), Row(10L)))
    val r = Profile.benfordAudit(mv, Seq("x")).collect()(0)
    assert(r.getAs[Long]("n") == 2L && r.getAs[Long]("c9") == 1L &&
      r.getAs[Long]("c1") == 1L)
  }

  test("freshnessReport: exact staleness behind global max, flag at " +
      "threshold, guard") {
    import java.sql.Timestamp
    val d = df("k STRING, ts TIMESTAMP", Seq(
      Row("live", Timestamp.valueOf("2024-01-02 00:00:00")),
      Row("live", Timestamp.valueOf("2024-01-01 00:00:00")),
      Row("dead", Timestamp.valueOf("2024-01-01 00:00:00"))))
    val out = Profile.freshnessReport(d, "k", "ts", 3600)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(r.fieldIndex("n")),
          r.getLong(r.fieldIndex("staleness_us")),
          r.getBoolean(r.fieldIndex("stale"))))).toMap
    assert(out("live") == ((2L, 0L, false)))
    assert(out("dead") == ((1L, 86400000000L, true)))
    intercept[IllegalArgumentException] {
      Profile.freshnessReport(d, "k", "ts", 0)
    }
  }

  test("columnProfile: missing column rejected up front") {
    val d = df("a STRING", Seq(Row("x")))
    intercept[IllegalArgumentException] {
      Profile.columnProfile(d, Seq("a", "nope"))
    }
  }

  test("joinAudit: exact orphan/match/fan-out accounting, null keys " +
      "counted apart, join cardinality without the join") {
    val left = df("k STRING", Seq(
      Row("a"), Row("a"), Row("b"), Row("c"), Row(null)))
    val right = df("k2 STRING", Seq(
      Row("a"), Row("a"), Row("d"), Row(null), Row(null)))
    val out = Profile.joinAudit(left, right, "k", "k2").collect()
    assert(out.length == 1)
    val r = out.head
    def g(name: String) = r.getLong(r.fieldIndex(name))
    assert(g("n_left") == 5L && g("n_right") == 5L)
    assert(g("null_key_left") == 1L && g("null_key_right") == 2L)
    assert(g("distinct_left") == 3L && g("distinct_right") == 2L)
    assert(g("matched_left") == 2L && g("matched_right") == 2L)
    assert(g("orphan_left") == 2L && g("orphan_right") == 1L)
    assert(g("dup_keys_right") == 1L)
    assert(g("joined_rows") == 4L) // a: 2 x 2 — the only matching key
    assert(g("max_fanout") == 2L)
    // no raw-row join anywhere: the only join is the |keys|-row
    // count-table full-outer
    val plan = Profile.joinAudit(left, right, "k", "k2")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan.take(600))
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      "per-side counts must partial-aggregate before the key join:\n" +
        plan.take(800))
  }
}
