package graft

import graft.temporal.AsOfJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Randomized equivalence: every AsOfJoin variant (union+window,
  * broadcast, strict, tolerance, salted) must agree with a brute-force
  * in-memory model on seeded random inputs — shapes a hand-written
  * example suite never covers (empty right sides, lone entities,
  * all-future snapshots, tolerance expiring exactly on the boundary).
  */
class AsOfJoinPropertySpec extends SparkSpec {

  private case class L(e: String, ts: Long)
  private case class R(e: String, ts: Long, v: Double)

  /** brute force: latest right.ts <= (or <) left.ts within tolerance */
  private def model(ls: Seq[L], rs: Seq[R], strict: Boolean,
      tol: Option[Long]): Map[(String, Long), Option[(Long, Double)]] =
    ls.map { l =>
      val cands = rs.filter(r => r.e == l.e &&
        (if (strict) r.ts < l.ts else r.ts <= l.ts) &&
        tol.forall(t => l.ts - r.ts <= t))
      (l.e, l.ts) ->
        cands.sortBy(_.ts).lastOption.map(r => (r.ts, r.v))
    }.toMap

  /** forward dual: earliest right.ts >= (or >) left.ts within tol */
  private def modelFwd(ls: Seq[L], rs: Seq[R], strict: Boolean,
      tol: Option[Long]): Map[(String, Long), Option[(Long, Double)]] =
    ls.map { l =>
      val cands = rs.filter(r => r.e == l.e &&
        (if (strict) r.ts > l.ts else r.ts >= l.ts) &&
        tol.forall(t => r.ts - l.ts <= t))
      (l.e, l.ts) ->
        cands.sortBy(_.ts).headOption.map(r => (r.ts, r.v))
    }.toMap

  private def runCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val nEnt = 1 + rnd.nextInt(5)
    val ents = (0 until nEnt).map(i => s"e$i")
    // distinct right timestamps per entity (duplicate (e, ts) on the
    // right would make the matched value ambiguous by construction)
    val rs = ents.flatMap { e =>
      rnd.shuffle((0 until 50).toList).take(rnd.nextInt(8))
        .map(t => R(e, 1000L + t * 10, rnd.nextDouble()))
    }
    val ls = (0 until 1 + rnd.nextInt(30)).map { _ =>
      L(ents(rnd.nextInt(nEnt)), 1000L + rnd.nextInt(520))
    }
    val strict = rnd.nextBoolean()
    val tol = if (rnd.nextBoolean()) Some(40L + rnd.nextInt(100)) else None

    val lDf = df("e STRING, lts BIGINT",
      ls.map(l => Row(l.e, l.ts)))
      .withColumn("lts", timestamp_seconds(col("lts")))
    val rDf = df("e STRING, rts BIGINT, v DOUBLE",
      rs.map(r => Row(r.e, r.ts, r.v)))
      .withColumn("rts", timestamp_seconds(col("rts")))

    val expected = model(ls, rs, strict, tol)
    val expectedFwd = modelFwd(ls, rs, strict, tol)
    def checkAgainst(
        exp: Map[(String, Long), Option[(Long, Double)]])(
        out: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val got = out.collect().map { row =>
        val e = row.getAs[String]("e")
        val lt = row.getAs[java.sql.Timestamp]("lts").getTime / 1000
        val v = if (row.isNullAt(row.fieldIndex("v"))) None
          else Some(row.getAs[Double]("v"))
        (e, lt) -> v
      }
      assert(got.length == ls.length, s"$label seed=$seed row count")
      got.foreach { case (k, v) =>
        assert(v == exp(k).map(_._2),
          s"$label seed=$seed at $k: got $v expected ${exp(k)}")
      }
    }
    val check = checkAgainst(expected) _
    val checkFwd = checkAgainst(expectedFwd) _

    check(AsOfJoin.join(lDf, rDf, "e", "lts", "rts", Seq("v"),
      strict = strict, toleranceSeconds = tol), "union")
    check(AsOfJoin.join(lDf, rDf, "e", "lts", "rts", Seq("v"),
      strict = strict, toleranceSeconds = tol,
      broadcastRight = true), "broadcast")
    check(AsOfJoin.join(lDf, rDf, "e", "lts", "rts", Seq("v"),
      strict = strict, toleranceSeconds = tol,
      hotEntities = Seq("e0"), saltBuckets = 3), "salted")
    checkFwd(AsOfJoin.joinForward(lDf, rDf, "e", "lts", "rts", Seq("v"),
      strict = strict, toleranceSeconds = tol), "fwd-union")
    checkFwd(AsOfJoin.joinForward(lDf, rDf, "e", "lts", "rts", Seq("v"),
      strict = strict, toleranceSeconds = tol,
      broadcastRight = true), "fwd-broadcast")
    checkFwd(AsOfJoin.joinForward(lDf, rDf, "e", "lts", "rts", Seq("v"),
      strict = strict, toleranceSeconds = tol,
      hotEntities = Seq("e0"), saltBuckets = 3), "fwd-salted")
  }

  test("random as-of joins: all variants match the brute-force model") {
    (1 to 25).foreach(runCase)
  }

  test("degenerate shapes: empty right, all-future right") {
    val lDf = df("e STRING, lts BIGINT", Seq(Row("a", 100L)))
      .withColumn("lts", timestamp_seconds(col("lts")))
    val emptyR = df("e STRING, rts BIGINT, v DOUBLE", Seq.empty)
      .withColumn("rts", timestamp_seconds(col("rts")))
    val out = AsOfJoin.join(lDf, emptyR, "e", "lts", "rts", Seq("v"))
    assert(out.count() == 1 && out.head().isNullAt(out.head().fieldIndex("v")))

    val futureR = df("e STRING, rts BIGINT, v DOUBLE",
      Seq(Row("a", 200L, 1.0)))
      .withColumn("rts", timestamp_seconds(col("rts")))
    val out2 = AsOfJoin.join(lDf, futureR, "e", "lts", "rts", Seq("v"))
    assert(out2.head().isNullAt(out2.head().fieldIndex("v")))
  }
}
