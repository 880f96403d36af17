package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs. One session per JVM (tests
  * fork one JVM); small shuffle-partition count keeps tiny-data tests
  * fast. */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark
  import org.apache.spark.sql.{DataFrame, Row}

  def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  /** One-column string DataFrame helper. */
  def strDf(name: String, values: Seq[String]): DataFrame = {
    import spark.implicits._
    values.toDF(name)
  }
}
