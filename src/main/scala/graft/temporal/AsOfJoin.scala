package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Point-in-time (as-of) join: for each left row (entity, ts), attach
  * the latest right row with right.entity == left.entity and
  * right.ts <= left.ts (strict < available for leakage-free label
  * generation). Not present in the reference (tubular has no joins —
  * only the internal row-index zip at tubular/base.py:450-462); mandated
  * by BASELINE.json north_rule.
  *
  * == Strategies ==
  *
  * `union` (default, scales to arbitrary right-side size):
  * tag both sides, union, then one
  * `Window.partitionBy(entity).orderBy(ts, side)` with a
  * last(_, ignoreNulls) running carry-forward. Exactly ONE hash
  * exchange on entity + one sort (ts, side) — Spark's own
  * sort-merge-join machinery couldn't do an inequality-latest join in
  * fewer shuffles. All right-hand value columns ride the same window
  * spec, so Catalyst plans a single Window node.
  *
  * `broadcast` (small right side): right side is grouped per entity
  * into a ts-sorted array of structs, broadcast-hash-joined, and probed
  * with `filter(arr, r -> r.ts <= l.ts)[-1]` — zero shuffle on the
  * (huge) left side. Use when the right side fits the broadcast
  * threshold (dimension-style feature tables).
  *
  * == Skew ==
  *
  * Hot entities (celebrity keys) overload one reducer in the union
  * strategy. `saltBuckets = n` splits each LEFT row of a hot entity
  * into one of n sub-partitions by hashing its ts, and REPLICATES the
  * hot entities' right rows into every sub-partition, preserving
  * correctness (each sub-partition sees the full right history).
  * Cold entities keep salt 0 — no blow-up. AQE skew-join handling
  * remains on as a backstop.
  */
object AsOfJoin {

  /** @param leftTs / rightTs   timestamp column names
    * @param rightValueCols     right columns to carry (defaults: all but
    *                           entity/ts)
    * @param strict             true => right.ts <  left.ts (no same-instant
    *                           reads); false => <=
    * @param toleranceSeconds   optional max staleness; older matches -> null
    * @param hotEntities        explicit skew keys to salt (empty => no salting)
    * @param saltBuckets        sub-partitions per hot entity
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      entity: String,
      leftTs: String = "ts",
      rightTs: String = "ts",
      rightValueCols: Seq[String] = Seq.empty,
      strict: Boolean = false,
      toleranceSeconds: Option[Long] = None,
      broadcastRight: Boolean = false,
      hotEntities: Seq[String] = Seq.empty,
      saltBuckets: Int = 8): DataFrame = {

    val valueCols =
      if (rightValueCols.nonEmpty) rightValueCols
      else right.columns.filterNot(c => c == entity || c == rightTs).toSeq

    if (broadcastRight)
      joinBroadcast(left, right, entity, leftTs, rightTs, valueCols,
        strict, toleranceSeconds, forward = false)
    else
      joinUnion(left, right, entity, leftTs, rightTs, valueCols,
        strict, toleranceSeconds, hotEntities, saltBuckets,
        forward = false)
  }

  /** FORWARD as-of join: for each left row, the EARLIEST right row
    * with right.ts >= left.ts (strict: >) within the entity — the
    * time-mirrored dual of [[join]], for "time-to-next-event" /
    * future-label generation. Identical strategies and skew handling;
    * the union plan is still ONE exchange + one sort, with the window
    * frame flipped to (currentRow, unboundedFollowing) and a
    * first(ignoreNulls) carry-BACKWARD. `toleranceSeconds` bounds how
    * far in the FUTURE the match may be.
    *
    * Leakage note: this operator reads future rows BY DESIGN (labels),
    * the exact thing [[join]] must never do for features — keep their
    * outputs in separate columns/pipelines.
    */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      entity: String,
      leftTs: String = "ts",
      rightTs: String = "ts",
      rightValueCols: Seq[String] = Seq.empty,
      strict: Boolean = false,
      toleranceSeconds: Option[Long] = None,
      broadcastRight: Boolean = false,
      hotEntities: Seq[String] = Seq.empty,
      saltBuckets: Int = 8): DataFrame = {
    val valueCols =
      if (rightValueCols.nonEmpty) rightValueCols
      else right.columns.filterNot(c => c == entity || c == rightTs).toSeq
    if (broadcastRight)
      joinBroadcast(left, right, entity, leftTs, rightTs, valueCols,
        strict, toleranceSeconds, forward = true)
    else
      joinUnion(left, right, entity, leftTs, rightTs, valueCols,
        strict, toleranceSeconds, hotEntities, saltBuckets,
        forward = true)
  }

  private val MatchedTs = "__asof_matched_ts"

  private def joinUnion(
      left: DataFrame, right: DataFrame, entity: String,
      leftTs: String, rightTs: String, valueCols: Seq[String],
      strict: Boolean, toleranceSeconds: Option[Long],
      hotEntities: Seq[String], saltBuckets: Int,
      forward: Boolean): DataFrame = {

    val leftCols = left.columns.toSeq
    // side ordering at equal ts decides whether same-instant right rows
    // fall INSIDE the window frame:
    //   backward <= : right (0) BEFORE left (1) -> visible
    //   backward <  : right (2) AFTER  left (1) -> invisible
    //   forward  >= : right (2) AFTER  left (1) -> visible (frame looks
    //                 forward from the current row)
    //   forward  >  : right (0) BEFORE left (1) -> invisible
    val rightSide =
      if (forward) { if (strict) 0 else 2 }
      else { if (strict) 2 else 0 }

    val salted = hotEntities.nonEmpty && saltBuckets > 1

    val leftSalt: Column =
      if (!salted) lit(0)
      else when(col(entity).isin(hotEntities: _*),
        pmod(xxhash64(col(leftTs)), lit(saltBuckets)).cast("int"))
        .otherwise(lit(0))

    val rightStruct = struct(
      (valueCols.map(col) :+ col(rightTs).as(MatchedTs)): _*)
    val rightStructType =
      right.select(rightStruct.as("__r")).schema("__r").dataType
    val leftStruct = struct(leftCols.map(col): _*)
    val leftStructType =
      left.select(leftStruct.as("__l")).schema("__l").dataType

    val taggedLeft = left.select(
      col(entity).as("__e"),
      col(leftTs).as("__t"),
      lit(1).as("__side"),
      leftSalt.as("__salt"),
      leftStruct.as("__l"),
      lit(null).cast(rightStructType).as("__r"))

    // SQL equi-join semantics, matching the broadcast strategy (whose
    // join condition nulls out on either): a NULL-entity right row
    // never matches anything, and a NULL-timestamp right row is
    // unordered dirty data. Without this filter the NULL-ts row sorts
    // FIRST in the window (a minus-infinity pseudo-match carried into
    // every otherwise-unmatched left row with matched_ts NULL —
    // breaking the "matched_ts IS NULL iff no match" invariant), and
    // NULL entities would match each other through the partition.
    val rightBase = right
      .filter(col(entity).isNotNull && col(rightTs).isNotNull)
      .select(
        col(entity).as("__e"),
        col(rightTs).as("__t"),
        lit(rightSide).as("__side"),
        rightStruct.as("__r"))
    // replicate hot-entity right rows into every salt bucket
    val taggedRight = (if (salted)
      rightBase.withColumn("__salt",
        explode(when(col("__e").isin(hotEntities: _*),
          typedLit((0 until saltBuckets).toList))
          .otherwise(typedLit(List(0)))))
    else rightBase.withColumn("__salt", lit(0)))
      .withColumn("__l", lit(null).cast(leftStructType))
      .select("__e", "__t", "__side", "__salt", "__l", "__r")

    val unioned = taggedLeft
      .select("__e", "__t", "__side", "__salt", "__l", "__r")
      .unionByName(taggedRight)

    val base = Window.partitionBy(col("__e"), col("__salt"))
      .orderBy(col("__t"), col("__side"))
    val (w, carry) =
      if (forward)
        (base.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__r"), ignoreNulls = true))
      else
        (base.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__r"), ignoreNulls = true))
    val carried = unioned
      .withColumn("__rv", carry.over(w))
      .filter(col("__side") === 1)

    finish(carried, leftCols, valueCols, leftTs, toleranceSeconds,
      forward)
  }

  private def joinBroadcast(
      left: DataFrame, right: DataFrame, entity: String,
      leftTs: String, rightTs: String, valueCols: Seq[String],
      strict: Boolean, toleranceSeconds: Option[Long],
      forward: Boolean): DataFrame = {

    val leftCols = left.columns.toSeq
    val rightArr = right
      .groupBy(col(entity).as("__e"))
      .agg(sort_array(collect_list(struct(
        (col(rightTs).as(MatchedTs) +: valueCols.map(col)): _*)))
        .as("__hist"))

    val joined = left
      .select(struct(leftCols.map(col): _*).as("__l"),
        col(entity).as("__le"), col(leftTs).as("__lt"))
      .join(broadcast(rightArr), col("__le") === col("__e"), "left")

    val cmp: (Column, Column) => Column = (forward, strict) match {
      case (false, false) => (a, b) => a <= b
      case (false, true)  => (a, b) => a < b
      case (true, false)  => (a, b) => a >= b
      case (true, true)   => (a, b) => a > b
    }
    val eligible = filter(col("__hist"),
      r => cmp(r.getField(MatchedTs), col("__lt")))
    // history is ts-ascending: backward takes the LAST eligible
    // (latest past), forward the FIRST (earliest future)
    val carried = joined.withColumn("__rv",
      when(size(eligible) > 0,
        element_at(eligible, if (forward) 1 else -1)))

    finish(carried, leftCols, valueCols, leftTs, toleranceSeconds,
      forward)
  }

  private def finish(
      carried: DataFrame, leftCols: Seq[String], valueCols: Seq[String],
      leftTs: String, toleranceSeconds: Option[Long],
      forward: Boolean = false): DataFrame = {
    val withinTol: Column = toleranceSeconds match {
      case Some(tol) =>
        val staleness =
          if (forward)
            unix_micros(col("__rv").getField(MatchedTs).cast("timestamp")) -
              unix_micros(col("__l").getField(leftTs).cast("timestamp"))
          else
            unix_micros(col("__l").getField(leftTs).cast("timestamp")) -
              unix_micros(col("__rv").getField(MatchedTs).cast("timestamp"))
        col("__rv").isNotNull && (staleness <= tol * 1000000L)
      case None => col("__rv").isNotNull
    }
    val out = leftCols.map(c => col("__l").getField(c).as(c)) ++
      valueCols.map(c =>
        when(withinTol, col("__rv").getField(c)).as(c)) :+
      when(withinTol, col("__rv").getField(MatchedTs))
        .as("matched_ts")
    carried.select(out: _*)
  }
}
