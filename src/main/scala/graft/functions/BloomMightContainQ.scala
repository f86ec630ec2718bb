package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd bloom-filter membership probe over int64 keys — the
  * pre-filter that lets a 100 TB corpus scan discard rows that
  * CANNOT match a (fingerprint / key) set before any shuffle or join
  * runs.
  *
  * The filter is a driver-built `org.apache.spark.util.sketch
  * .BloomFilter` (itself produced by one distributed aggregation,
  * `df.stat.bloomFilter`) attached to the expression as model state —
  * `ctx.addReferenceObj` ships it with the serialized plan exactly
  * like Spark's own runtime-filter `might_contain`, and the probe
  * compiles to a single virtual call inside WholeStageCodegen, so the
  * hot scan stays codegen'd end to end.
  *
  * Semantics: never a false negative (a true member always passes);
  * false positives at the filter's configured fpp — callers MUST
  * treat a `true` as "candidate", i.e. follow with the exact join.
  * Null keys yield null (standard null propagation).
  */
case class BloomMightContainQ(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_q expects a bigint key, got $t")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_q"

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainQ =
    copy(child = newChild)
}

object BloomMightContainQ {
  /** Column-API entry point: does `key` possibly belong to `filter`? */
  def mightContainLong(filter: BloomFilter, key: Column): Column =
    ColumnBridge.column(BloomMightContainQ(
      ColumnBridge.expression(key), filter))
}
