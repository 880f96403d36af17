package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Paginated-API scan as a DataSource V2 `TableProvider` — the scale
  * path past [[HttpSource]]'s driver-side whole-response fetch (whose
  * scaladoc points here): one `InputPartition` PER PAGE, so a
  * 10k-page bulk endpoint fans out across the cluster instead of
  * funneling through the driver.
  *
  * {{{
  *   spark.read.format("graft-paged")
  *     .option("urlTemplate", "https://api.example.com/products?page={page}")
  *     .option("pages", "500")
  *     .option("transport", "http")          // default: offline (refuses)
  *     .load()                                // → (page INT, body STRING)
  * }}}
  *
  * Each row is one page's raw body; parsing is downstream and
  * declarative (`from_json` + `inline`/`explode` — the same
  * JSONC-tolerant path the feed reader uses, via `jsonc=true`).
  * Keeping the source's schema fixed keeps the connector tiny and
  * pushes all real work into Catalyst-optimized operators.
  *
  * Transports (executor-side, built from serializable options only):
  *   - `offline` (default): refuses loudly — nothing in this build
  *     performs network I/O unless a deployment opts in (same stance
  *     as [[HttpSource.forName]]).
  *   - `file`: `urlTemplate` is a local path template — the
  *     `use_sample_data` analog (ref midocean_extractor.py:37-38) and
  *     the offline test harness.
  *   - `http`: `java.net.http` GET with optional `bearerToken`
  *     (ref Authorization header, midocean_extractor.py:140-173).
  *
  * Page numbering: `pages` partitions starting at `startPage`
  * (default 1). A missing trailing page in `file` mode yields an
  * empty page body rather than failing the whole scan — bulk APIs
  * under-fill the last page; `body IS NULL` filters it downstream.
  */
class PagedJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-paged"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedTable(new CaseInsensitiveStringMap(properties))
}

object PagedJsonSource {
  val schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("body", StringType, nullable = true)))

  private[sources] case class PageConf(urlTemplate: String, pages: Int,
                                       startPage: Int, transport: String,
                                       bearerToken: Option[String], jsonc: Boolean)

  private[sources] def conf(options: CaseInsensitiveStringMap): PageConf = {
    val url = Option(options.get("urlTemplate")).getOrElse(
      throw new IllegalArgumentException("graft-paged requires option 'urlTemplate'"))
    val pages = Option(options.get("pages")).map(_.toInt).getOrElse(
      throw new IllegalArgumentException("graft-paged requires option 'pages'"))
    require(pages >= 0, s"pages must be >= 0, got $pages")
    val transport = Option(options.get("transport")).getOrElse("offline")
    if (!Set("offline", "file", "http")(transport))
      throw new IllegalArgumentException(s"unknown transport '$transport' (offline|file|http)")
    PageConf(url, pages,
      Option(options.get("startPage")).map(_.toInt).getOrElse(1),
      transport,
      Option(options.get("bearerToken")),
      Option(options.get("jsonc")).exists(_.toBoolean))
  }
}

private class PagedTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  // Validate eagerly so a misconfigured read fails at load(), not at
  // first action on some executor.
  private val c = PagedJsonSource.conf(options)
  override def name(): String = s"graft-paged(${c.urlTemplate})"
  override def schema(): StructType = PagedJsonSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new PagedScan(c)
    }
}

private class PagedScan(c: PagedJsonSource.PageConf) extends Scan with Batch {
  override def readSchema(): StructType = PagedJsonSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(c.pages)(i => PagePartition(c.startPage + i))
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(c)
}

private case class PagePartition(page: Int) extends InputPartition

private class PagedReaderFactory(c: PagedJsonSource.PageConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[PagePartition].page
    new PartitionReader[InternalRow] {
      private var emitted = false
      private var row: InternalRow = _
      override def next(): Boolean =
        if (emitted) false
        else {
          val url = c.urlTemplate.replace("{page}", page.toString)
          val body: String = c.transport match {
            case "file" =>
              val p = java.nio.file.Paths.get(url)
              if (java.nio.file.Files.exists(p))
                new String(java.nio.file.Files.readAllBytes(p),
                  java.nio.charset.StandardCharsets.UTF_8)
              else null // under-filled last page
            case "http" =>
              HttpSource.httpTransport(c.bearerToken)(HttpSource.HttpRequest(url))
            case _ =>
              throw new UnsupportedOperationException(
                s"no network transport configured (offline build); requested $url")
          }
          val cleaned =
            if (body == null) null
            else if (c.jsonc) FeedReader.stripJsonc(body) else body
          row = InternalRow(page,
            if (cleaned == null) null else UTF8String.fromString(cleaned))
          emitted = true
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
