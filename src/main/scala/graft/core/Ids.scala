package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Shared id-column contract checks. Operators that carry ids through
  * the bounded-heap [[graft.functions.TopKBy]] (or any int64 fold)
  * cast the id to long; a silent cast of a string/decimal id nulls it
  * out and the aggregate then SKIPS every row — the output quietly
  * empties instead of erroring. Reject the type up front.
  */
object Ids {

  def requireIntegral(df: DataFrame, idCol: String, op: String): Unit = {
    val t = df.schema(idCol).dataType
    val ok = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(ok,
      s"$op requires an integral id column, got $idCol: $t " +
        "(hash non-numeric ids to int64 first, e.g. xxhash64)")
  }

  /** Guard for operators that range-shuffle WHOLE ROWS (two-phase
    * rank/cumsum layouts): a binary payload column riding that shuffle
    * moves the corpus' heaviest bytes for an index-only answer — at
    * image-table scale, terabytes of needless exchange. Callers must
    * project payloads away and join the (narrow) result back by id.
    */
  def requireNoBinary(df: DataFrame, op: String): Unit = {
    val bin = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.BinaryType)
      .map(_.name)
    require(bin.isEmpty,
      s"$op shuffles whole rows; project binary payload column(s) " +
        s"${bin.mkString(", ")} away first and join the result back " +
        "by id")
  }
}
