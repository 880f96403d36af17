package graft

import org.apache.spark.sql.functions._

/** Sparse-capture resilience for the suppliers whose "first element"
  * accesses sit on optional feed arrays (ANSI `element_at` on an empty
  * array throws — the pipelines must use `try_element_at`). Each test
  * takes the REAL sample capture and blanks one array the reference
  * tolerates being empty, then asserts the unified pipeline still
  * produces rows instead of failing the whole supplier sync.
  */
class SparseCaptureSpec extends SparkSpec {

  /** Replace the body of the first `"key": [ ... ]` with an empty
    * array, bracket-balanced and string-aware (sample data contains
    * `]` inside strings and `//` comments — the scan must not trip on
    * either; comments are left to FeedReader.stripJsonc). */
  private def blankFirstArray(text: String, key: String): String = {
    val m = ("\"" + java.util.regex.Pattern.quote(key) + "\"\\s*:\\s*\\[").r
      .findFirstMatchIn(text)
      .getOrElse(fail(s"sample has no array under key '$key'"))
    val open = m.end - 1
    var i = open
    var depth = 0
    var inStr = false
    var esc = false
    var close = -1
    while (close < 0 && i < text.length) {
      val c = text.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '[' => depth += 1
        case ']' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    assert(close > open, s"unbalanced array under '$key'")
    text.substring(0, open + 1) + text.substring(close)
  }

  private def mutated(samplePath: String, key: String): String = {
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(samplePath))
    val dir = java.nio.file.Files.createTempDirectory("graft_sparse")
    val out = dir.resolve("capture.jsonc")
    java.nio.file.Files.writeString(out, blankFirstArray(text, key))
    out.toString
  }

  private def ifSample(path: String)(body: => Unit): Unit =
    if (new java.io.File(path).exists()) body else cancel(s"sample not present: $path")

  test("Sanmar: empty description[] yields null short_description, not a crash") {
    val sample = "/root/reference/sample data/Sanmar Sample Data.jsonc"
    ifSample(sample) {
      val u = graft.suppliers.Sanmar.unified(spark, mutated(sample, "description"))
      val r = u.select(col("short_description"), col("long_description")).collect()
      assert(r.nonEmpty)
      assert(r.forall(_.isNullAt(0)))
      assert(r.forall(_.getString(1) == ""))
    }
  }

  test("MidOcean: a product with variants: [] still syncs") {
    val sample = "/root/reference/sample data/MidOcean Sample Data.jsonc"
    ifSample(sample) {
      val u = graft.suppliers.MidOcean.unified(spark, mutated(sample, "variants"))
      assert(u.count() > 0)
    }
  }

  test("PFConcept: an item with colors.color: [] still syncs") {
    val sample = "/root/reference/sample data/PFConcept Sample Data.jsonc"
    ifSample(sample) {
      val u = graft.suppliers.PfConcept.unified(spark, mutated(sample, "color"))
      assert(u.count() > 0)
    }
  }

  test("MidOcean: a directory of capture files unions per-file product sets") {
    val sample = "/root/reference/sample data/MidOcean Sample Data.jsonc"
    ifSample(sample) {
      // The at-scale mode: one task per file (wholeTextFiles), rows
      // union, schemas merged. Two captures with distinct master codes
      // must yield the union of both product sets.
      val text = java.nio.file.Files.readString(java.nio.file.Paths.get(sample))
      val dir = java.nio.file.Files.createTempDirectory("graft_feed_dir")
      java.nio.file.Files.writeString(dir.resolve("a.jsonc"), text)
      java.nio.file.Files.writeString(dir.resolve("b.jsonc"),
        text.replace("\"AR1", "\"BX1"))
      val u = graft.suppliers.MidOcean.unified(spark, dir.toString)
      val ids = u.select(col("supplier_product_code")).collect()
        .map(_.getString(0)).toSet
      assert(ids.size == 10, s"expected 10 products, got ${ids.size}: $ids")
      assert(ids.count(_.startsWith("AR1")) == 5)
      assert(ids.count(_.startsWith("BX1")) == 5)
    }
  }
}
