package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A3 — collection statistics (ref: mongodb_loader.py:271-299
  * `collStats` + dict-ified group counts): row count, physical file
  * count/bytes from the filesystem, and group-count breakdowns.
  *
  * Scale: the row count is one distributed count job; file stats come
  * from FileStatus metadata (no data read). The group counts (A1/A2)
  * are single hash aggregates.
  */
object Stats {

  case class TableStats(path: String, rowCount: Long, fileCount: Long,
                        totalBytes: Long)

  /** Physical + logical stats for a parquet table path. */
  def tableStats(spark: SparkSession, path: String): TableStats = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }
    val rows = spark.read.parquet(path).count()
    TableStats(path, rows, files.size.toLong, files.map(_.getLen).sum)
  }

  /** A1/A2-style group-count breakdown as one row per group. */
  def groupCounts(df: DataFrame, groupCol: String): DataFrame =
    df.groupBy(col(groupCol)).agg(count(lit(1)).as("n")).orderBy(col(groupCol))
}
