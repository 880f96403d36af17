package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing probe (local iteration only):
  * `runMain graft.QProbe <queryPrefix> [runs]` — min/median over N runs
  * of each matching registered query at SPARK_GRAFT_SF_DIR. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val prefix = args.headOption.getOrElse("q80")
    val runs = args.lift(1).map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix)).foreach { case (name, fn) =>
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE $name min=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
      }
    spark.stop()
  }
}
