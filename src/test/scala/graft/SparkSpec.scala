package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session + collection helpers for all suites. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  import scala.jdk.CollectionConverters._

  def df(schemaDdl: String, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))

  /** Collect a single column as a seq (null-safe). */
  def column[T](d: DataFrame, c: String): Seq[Any] =
    d.select(c).collect().toSeq.map(r => if (r.isNullAt(0)) null else r.get(0))
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // managed tables (BucketedTableSpec) land in a temp warehouse,
      // never in the repo working directory
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse")
          .toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
