package graft
import org.apache.spark.sql.SparkSession
import scala.collection.immutable.ListMap

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Failures are surfaced per-query (and counted) instead of silently
  * recorded as negative time.
  *
  * Each query runs SPARK_GRAFT_BENCH_RUNS times (default 2) and
  * reports the MIN. A single shared local JVM re-JITs whole-stage
  * codegen units as the cache churns, which historically swung
  * untouched queries 3-4x run-to-run (q82/q84 in round 6) — noise that
  * makes a "within 2x" gate untestable per-query. The minimum of two
  * runs is the steady-state cost of the PLAN (what a warmed executor
  * fleet would pay), which is the quantity a scale gate should
  * measure; cold-start JIT belongs to the JVM, not to any query. */
object Bench {
  def main(args: Array[String]): Unit = {
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
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // Warmup: touch every table once (parquet footers, FS metadata, JIT
    // of the scan path) so the first timed query isn't charged session
    // cold-start costs that belong to no query.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
    var errors = ListMap.empty[String, String]
    val results = ListMap(SparkEntry.queries.toSeq.sortBy(_._1): _*).map {
      case (name, fn) =>
        // Min over `runs` SUCCESSFUL attempts — a failing attempt's
        // elapsed time must never become the reported min (a fast
        // failure would understate the plan cost the 2x gate
        // measures). A failure stops retrying (a deterministic error
        // would just fail again); if no attempt succeeded, the failing
        // attempt's elapsed is reported alongside the error entry.
        var best = Double.MaxValue
        var failedElapsed = 0.0
        var run = 0
        while (run < runs && !errors.contains(name)) {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            best = math.min(best, (System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            failedElapsed = (System.nanoTime() - t0) / 1e9
          }
          run += 1
        }
        name -> (if (best != Double.MaxValue) best else failedElapsed)
    }
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"error_count":${errors.size},"sf":${jstr(sfDir)}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
