package graft

import graft.functions.{DotProductQ, TopKBy}
import graft.plans.RewriteHofDotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression,
  ExpressionInfo, Literal}

/** Spark-native registration point for graft's Catalyst extensions.
  *
  * Activate per cluster with
  * `spark-submit --conf spark.sql.extensions=graft.GraftExtensions`
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`):
  *
  *  - SQL function `dot_q(array<bigint>, array<bigint>) -> bigint`:
  *    the codegen'd quantized dot product ([[graft.functions.DotProductQ]])
  *    becomes callable from plain SQL, not just the Column API.
  *  - Optimizer rule [[graft.plans.RewriteHofDotProduct]]: user queries
  *    written with the idiomatic `aggregate(zip_with(...))` higher-order
  *    pattern are silently upgraded to the codegen'd kernel.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[DotProductQ].getName, "dot_q"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"dot_q expects 2 arguments, got ${args.length}")
        DotProductQ(args(0), args(1))
      }))
    // top_k_by(score double, id bigint, k const int) -> bounded-heap
    // top-k aggregate (array<struct<score,id>>), usable from plain SQL
    ext.injectFunction((
      new FunctionIdentifier("top_k_by"),
      new ExpressionInfo(classOf[TopKBy].getName, "top_k_by"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"top_k_by expects 3 arguments, got ${args.length}")
        val k = args(2) match {
          case Literal(v: Int, _) if v >= 1 => v
          case Literal(v: Long, _)
              if v >= 1 && v <= Int.MaxValue => v.toInt
          case other => throw new IllegalArgumentException(
            "top_k_by: k must be an integer literal in " +
              s"[1, ${Int.MaxValue}], got $other")
        }
        TopKBy(args(0), args(1), k)
      }))
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}
