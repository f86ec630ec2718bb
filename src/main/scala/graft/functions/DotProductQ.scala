package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd integer dot product over quantized vectors
  * (`array<bigint>`), the inner loop of every cosine/ANN kernel here.
  *
  * Why a custom Catalyst `Expression`: the composable formulation —
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` — is a higher-order
  * function, which Spark evaluates INTERPRETED (no whole-stage codegen,
  * a closure call per element, boxed lambda variables). Inside a
  * candidate-pair re-rank that loop runs |pairs| x dims times and
  * dominates the stage. This expression compiles to a tight primitive
  * `long` loop via `doGenCode` and keeps the whole projection inside
  * WholeStageCodegen; the interpreted `nullSafeEval` path matches it
  * exactly.
  *
  * Semantics: null if either array is null; summation over the shorter
  * length (inputs are produced by `Dedup.quantize`, which never emits
  * null elements); 64-bit wrap-around like Java `long` arithmetic —
  * quantized embedding products are ~1e12 x dims, far from overflow.
  */
case class DotProductQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_q expects two array<bigint> inputs, got $l and $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductQ =
    copy(left = newLeft, right = newRight)
}

object DotProductQ {
  /** Column-API entry point. */
  def dotQ(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductQ(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
