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
  * Semantics are an exact drop-in for the HOF formulation (so the
  * [[graft.plans.RewriteHofDotProduct]] optimizer rule can substitute
  * it): null if either array is null, if the lengths differ (zip_with
  * pads the shorter side with null, poisoning the sum), or if any
  * element is null; 64-bit wrap-around like Java `long` arithmetic —
  * quantized embedding products are ~1e12 x dims, far from overflow.
  * Element null checks compile away when both array types declare
  * `containsNull = false` (the `Dedup.quantize` output shape).
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
  override def nullable: Boolean = true
  override def prettyName: String = "dot_q"

  private def elementsNullable: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val elemNullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemNullCheck
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
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
