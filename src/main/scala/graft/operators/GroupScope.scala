package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared rebuild-scoping for incremental maintainers ([[Sketches]],
  * [[Rollup]]): restrict a source frame to the rows whose group
  * columns appear in a touched-group set. */
private[operators] object GroupScope {

  /** A small touched set (≤ `limit`, one bounded collect — the same
    * shape as the keyed commit paths' probe-key limit) becomes a
    * literal OR-of-AND predicate, so partition pruning and stats
    * skipping bound the rebuild SCAN itself; larger sets fall back to
    * an UNHINTED semi-join, which is row-correct but reads every
    * candidate file. The fallback deliberately carries no
    * `broadcast()` hint: above the limit the touched set is unbounded
    * (a corpus-wide regroup or bulk delete makes it millions of
    * distinct groups), and a forced broadcast bypasses AQE's size
    * check and OOMs the driver instead of degrading to a shuffled
    * semi-join — AQE still broadcasts on its own whenever the set is
    * genuinely small at runtime. */
  def scope(src: DataFrame, touched: DataFrame, groupCols: Seq[String],
            limit: Int = 1000): DataFrame = {
    val few = touched.limit(limit + 1).collect()
    if (few.length <= limit && few.nonEmpty)
      src.filter(few.map(r => groupCols.zipWithIndex.map {
        case (g, i) => col(g) === lit(r.get(i))
      }.reduce(_ && _)).reduce(_ || _))
    else src.join(touched, groupCols, "left_semi")
  }
}
