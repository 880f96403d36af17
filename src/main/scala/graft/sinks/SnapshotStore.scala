package graft.sinks

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Upsert

/** Atomic, versioned parquet sink — the crash-safe replacement for
  * dynamic partition overwrite (the reference's per-document-atomic
  * `bulk_write`, mongodb_loader.py:93-197, re-expressed as
  * snapshot-level atomicity for a columnar store).
  *
  * Layout under `root/`:
  * {{{
  *   data/v_<N>/__part=<value>/part-*.parquet   // append-only, never mutated
  *   manifests/v_<N>.manifest                   // one line per data file
  * }}}
  *
  * A snapshot IS its manifest: readers resolve the highest committed
  * manifest version and read exactly the files it lists. Commits write
  * data files first (invisible — no manifest references them), then
  * publish by renaming a temp manifest to `v_<N>.manifest`. Rename to a
  * fresh name is atomic on HDFS-like filesystems and fails if the name
  * exists, so a crash at ANY point leaves the previous snapshot intact
  * (orphaned data files are garbage-collected by [[vacuum]]) and two
  * racing committers cannot both win a version — the loser retries on
  * the next number.
  *
  * Scale notes (100 TB): a merge rewrites only the partitions present
  * in the incoming batch; untouched partitions' files are carried into
  * the new manifest BY REFERENCE — no copy, no rewrite, no
  * delete-then-write window. Manifest-level partition pruning means a
  * partition-filtered read never even lists unrelated directories. Old
  * manifests stay readable ([[readVersion]] time travel) until
  * vacuumed.
  */
object SnapshotStore {

  /** One data file: (partition value, path relative to root), plus an
    * optional deletion-vector attachment — `dv` names the DV directory
    * (relative to root, or absolute for clones) holding this file's
    * COMPLETE set of deleted row positions as of this version, and
    * `dvRows` its cardinality (recorded in the manifest so history /
    * detail views can report live row counts without opening the DV
    * parquet). Empty `dv` = no rows deleted from this file. */
  case class ManifestEntry(partition: String, path: String,
                           dv: String = "", dvRows: Long = 0L)

  private val PartDir = "__part"

  /** Reader features THIS build understands — the check side of the
    * `#require` manifest protocol gate (Delta's
    * minReaderVersion/table-features design). A manifest naming a
    * feature outside this set refuses to load in [[manifest]] instead
    * of being silently misread; a second reader implementation
    * (docs/MIGRATION.md's Iceberg/Delta bridge) must publish its own
    * set and fail the same way. */
  val SupportedReaderFeatures: Set[String] = Set("colmap", "dv", "multipart")

  /** Directory-key column names for a k-column partition spec: the
    * first level keeps the historical `__part` (single-column tables'
    * on-disk layout and manifests stay byte-identical), deeper levels
    * are `__part1`, `__part2`, …. */
  private def partDirNames(k: Int): Seq[String] =
    (0 until k).map(i => if (i == 0) PartDir else s"$PartDir$i")

  private val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** A manifest partition VALUE for a k-column spec. One column: the
    * raw value string, exactly as every earlier version of this store
    * wrote it. Multiple columns: each component with '%' and '/'
    * percent-escaped, joined by '/' — reversible ([[decodePartValue]])
    * because the join character cannot survive unescaped in a
    * component. */
  def encodePartValue(values: Seq[String]): String =
    if (values.sizeIs == 1) values.head
    else values.map(v => v.replace("%", "%25").replace("/", "%2F"))
      .mkString("/")

  /** Inverse of [[encodePartValue]] given the spec width. */
  def decodePartValue(s: String, k: Int): Seq[String] =
    if (k <= 1) Seq(s)
    else s.split("/", -1).toSeq.map(unescapePathName)

  private def normPartComponent(c: Column): Column =
    when(c.isNull || c.cast("string") === "", lit(HiveDefaultPartition))
      .otherwise(c.cast("string"))

  /** [[encodePartValue]] as a Column over the spec's columns — the
    * expression every touched-partition probe evaluates. Components
    * normalize null/empty to Hive's default-partition sentinel first
    * (matching what `partitionBy` writes to disk), so probe values and
    * manifest values can never disagree on those rows. */
  def partValueColumn(cols: Seq[String]): Column =
    if (cols.sizeIs == 1) normPartComponent(col(cols.head))
    else concat_ws("/", cols.map(c => regexp_replace(regexp_replace(
      normPartComponent(col(c)), "%", "%25"), "/", "%2F")): _*)

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Long) =
    new Path(root, f"manifests/v_$v%06d.manifest")

  private def statsPath(root: String, v: Long) =
    new Path(root, f"manifests/v_$v%06d.stats")

  private def bloomPath(root: String, v: Long) =
    new Path(root, f"manifests/v_$v%06d.bloom")

  /** Committed versions, ascending (empty = no table yet). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new Path(root, "manifests")
    val f = fs(spark, root)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v_") && n.endsWith(".manifest") =>
        n.stripPrefix("v_").stripSuffix(".manifest").toLong }
      .sorted
  }

  /** Does version `v`'s manifest exist? O(1) existence probe — the
    * streaming sources' admission control uses it to tell "versions
    * dense from here" apart from "this range was vacuumed" without a
    * directory listing. */
  def manifestExists(spark: SparkSession, root: String, v: Long): Boolean =
    fs(spark, root).exists(manifestPath(root, v))

  private def lastCheckpointPath(root: String) =
    new Path(root, "manifests/_last_checkpoint")

  /** The version hint in `_last_checkpoint` (Delta's pointer concept).
    * Purely an optimization hint: absent, stale, or corrupt all
    * degrade to the full listing, never to a wrong answer. */
  def lastCheckpointVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val p = lastCheckpointPath(root)
    try {
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
        text.linesIterator.collectFirst {
          case l if l.startsWith("version\t") => l.stripPrefix("version\t").toLong
        }
      }
    } catch { case _: java.io.IOException | _: NumberFormatException => None }
  }

  /** Refresh `_last_checkpoint` to point at `version` (write-tmp +
    * rename-overwrite so readers never see a torn file). Best-effort:
    * a failure leaves an older hint, which is merely slower. */
  private def writeLastCheckpoint(spark: SparkSession, root: String,
                                  version: Long): Unit = try {
    val f = fs(spark, root)
    val tmp = new Path(root,
      s"manifests/._last_checkpoint.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(s"version\t$version".getBytes(UTF_8)) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      f.getUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(f.makeQualified(tmp), f.makeQualified(lastCheckpointPath(root)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  } catch { case _: java.io.IOException => () }

  /** Commits between checkpoint refreshes
    * (`spark.graft.checkpointInterval`, default 10). */
  private def checkpointInterval(spark: SparkSession): Long =
    try spark.conf.get("spark.graft.checkpointInterval", "10").toLong
    catch { case _: NumberFormatException => 10L }

  /** Current version, in O(commits since the last checkpoint) instead
    * of O(all versions): versions are DENSE (every committer takes the
    * next number) and vacuum only ever removes an old contiguous
    * prefix, so if the checkpointed version's manifest still exists,
    * probing forward until the first missing number IS the tip — no
    * directory listing. The listing fallback covers young tables (no
    * checkpoint yet) and a checkpoint that vacuum has overtaken. This
    * is what keeps metadata cost flat on a long-lived table: a
    * streaming source calls this every trigger, and a 10,000-commit
    * table would otherwise pay a 10,000-entry listing each time
    * (Delta's `_last_checkpoint` exists for the same reason). */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    lastCheckpointVersion(spark, root) match {
      case Some(v) if f.exists(manifestPath(root, v)) =>
        var cur = v
        while (f.exists(manifestPath(root, cur + 1))) cur += 1
        Some(cur)
      case _ => versions(spark, root).lastOption
    }
  }

  /** Parse a manifest. Partition values are URL-encoded on write so
    * arbitrary strings survive the line format. Lines starting with
    * `#` are metadata headers (committer token), not entries. */
  def manifest(spark: SparkSession, root: String, version: Long): Seq[ManifestEntry] = {
    val f = fs(spark, root)
    val in = f.open(manifestPath(root, version))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // Protocol gate (Delta's minReaderVersion/table-features design):
    // `#require` names a feature this manifest's files CANNOT be read
    // correctly without. Every other header is advisory — a reader
    // that doesn't know it skips it — but skipping an unknown
    // REQUIRED feature means silently-wrong results (physical names
    // after a rename, resurrected DV-deleted rows, mis-decoded
    // composite partition values), so it must be a loud refusal here,
    // the single parse point every read path funnels through.
    val unknown = text.linesIterator.takeWhile(_.startsWith("#"))
      .filter(_.startsWith("#require\t"))
      .map(_.stripPrefix("#require\t").trim)
      .filterNot(SupportedReaderFeatures).toSeq
    if (unknown.nonEmpty) throw new IllegalStateException(
      s"manifest v$version under $root requires reader feature(s) " +
        s"${unknown.mkString(", ")} that this reader does not support " +
        s"(supported: ${SupportedReaderFeatures.toSeq.sorted.mkString(", ")}); " +
        "refusing to read rather than silently misread")
    text.linesIterator.filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
      line.split("\t", 4) match {
        case Array(p, path) => ManifestEntry(URLDecoder.decode(p, UTF_8), path)
        case Array(p, path, dv, dvRows) =>
          ManifestEntry(URLDecoder.decode(p, UTF_8), path, dv, dvRows.toLong)
        case other => throw new IllegalStateException(
          s"malformed manifest line under $root v$version: ${other.mkString("\\t")}")
      }
    }.toSeq
  }

  /** One header value from a version's manifest. Headers are written
    * first, so the scan stops at the first match without holding more
    * than a line at a time. */
  private def manifestHeader(spark: SparkSession, root: String, version: Long,
                             name: String): Option[String] = {
    val f = fs(spark, root)
    val in = f.open(manifestPath(root, version))
    val prefix = s"#$name\t"
    // Headers are written before any entry line, so both lookups stop
    // at the first entry — a header read never scans a large manifest.
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .takeWhile(_.startsWith("#"))
      .collectFirst { case l if l.startsWith(prefix) => l.stripPrefix(prefix) }
    finally in.close()
  }

  private def manifestCommitter(spark: SparkSession, root: String, version: Long): Option[String] =
    manifestHeader(spark, root, version, "committer")

  /** Every value of a repeatable header (`#copied`) in a version's
    * manifest — unlike [[manifestHeader]], which stops at the first. */
  private def manifestHeaderAll(spark: SparkSession, root: String, version: Long,
                                name: String): Seq[String] = {
    val f = fs(spark, root)
    val in = f.open(manifestPath(root, version))
    val prefix = s"#$name\t"
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .takeWhile(_.startsWith("#"))
      .collect { case l if l.startsWith(prefix) => l.stripPrefix(prefix) }.toList
    finally in.close()
  }

  /** The operation tag a version's committer recorded (`commit`,
    * `merge`, `delete`, `compact`, `zorder`, `restore`). None for
    * manifests written before operation tagging existed — [[history]]
    * surfaces those as null rather than guessing. */
  def manifestOperation(spark: SparkSession, root: String, version: Long): Option[String] =
    manifestHeader(spark, root, version, "op")

  /** The table's partition column as recorded in version `version`'s
    * manifest header (`#partcol`) — table metadata in the log, so SQL
    * maintenance (`OPTIMIZE`) needs no out-of-band knowledge. None
    * for manifests written before the header existed; callers should
    * fall back to an explicit argument and error otherwise. */
  def partitionColumn(spark: SparkSession, root: String, version: Long): Option[String] =
    manifestHeader(spark, root, version, "partcol")

  /** [[partitionColumn]] parsed as a column LIST (the `#partcol`
    * header stores a comma-joined spec for multi-column partitioning).
    * Empty for manifests predating the header. */
  def partitionColumns(spark: SparkSession, root: String,
                       version: Long): Seq[String] =
    partitionColumn(spark, root, version)
      .map(ColSpec.parse(_).cols).getOrElse(Nil)

  /** The partition spec maintenance paths resolve from the manifest,
    * failing with re-commit advice when the table predates the
    * header. */
  private def requirePartitionCols(spark: SparkSession, root: String,
                                   cur: Long): Seq[String] = {
    val cols = partitionColumns(spark, root, cur)
    if (cols.isEmpty) throw new IllegalStateException(
      s"manifest v$cur under $root predates partition-column metadata; " +
        "re-commit once through any SnapshotStore write path first")
    cols
  }

  /** Commit wall-clock (epoch millis) recorded in the `#ts` manifest
    * header. None for manifests written before timestamps existed.
    * Timestamps are clamped monotonic at write ([[writeManifest]]), so
    * version order and timestamp order never disagree — the property
    * `TIMESTAMP AS OF` resolution relies on (Delta's in-commit
    * timestamp behavior). */
  def commitTimestamp(spark: SparkSession, root: String, version: Long): Option[Long] =
    manifestHeader(spark, root, version, "ts").map(_.toLong)

  /** `TIMESTAMP AS OF` resolution: the latest version committed at or
    * before `tsMillis` (Delta semantics — "the table as it was at that
    * moment"). A timestamp before the first commit is an error (there
    * was no table then); one after the last commit resolves to the
    * tip. Pre-`#ts` manifests (no recorded wall-clock) are treated as
    * older than any queryable timestamp: they cannot win over a
    * version with a recorded ts <= target, but a target older than
    * every RECORDED ts resolves to the newest unrecorded version
    * rather than erroring — the table demonstrably existed then. */
  def versionAtTimestamp(spark: SparkSession, root: String, tsMillis: Long): Long = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed snapshot under $root")
    val stamped = vs.map(v => v -> commitTimestamp(spark, root, v))
    val hit = stamped.filter(_._2.exists(_ <= tsMillis)).map(_._1)
    if (hit.nonEmpty) hit.max
    else {
      val unrecorded = stamped.filter(_._2.isEmpty).map(_._1)
      if (unrecorded.nonEmpty) unrecorded.max
      else throw new IllegalArgumentException(
        s"timestamp $tsMillis (${java.time.Instant.ofEpochMilli(tsMillis)}) " +
          s"is before the first commit under $root " +
          s"(${java.time.Instant.ofEpochMilli(stamped.head._2.get)}); " +
          "there is no snapshot to read at that time")
    }
  }

  /** Column mapping recorded in a version's manifest — Delta's
    * column-mapping NAME MODE: parquet files keep their original
    * ("physical") column names forever; renames and drops are pure
    * metadata. Two header shapes:
    *  - `#colmap\t<logical-enc>\t<physical-enc>` — one per RENAMED
    *    column (identity mappings are never stored);
    *  - `#coldrop\t<physical-enc>` — one per dropped physical column
    *    (a tombstone: readers project it away; the data stays in the
    *    files until they are naturally rewritten).
    * Returns (renames logical→physical, dropped physical names). Both
    * empty for an unmapped table — every mapping-aware code path must
    * be ZERO extra cost then. */
  def columnMapping(spark: SparkSession, root: String,
                    version: Long): (Seq[(String, String)], Seq[String]) = {
    val renames = manifestHeaderAll(spark, root, version, "colmap").map { l =>
      val Array(lg, ph) = l.split("\t", 2)
      (URLDecoder.decode(lg, UTF_8), URLDecoder.decode(ph, UTF_8))
    }
    val dropped = manifestHeaderAll(spark, root, version, "coldrop")
      .map(URLDecoder.decode(_, UTF_8))
    (renames, dropped)
  }

  /** [[columnMapping]] under a name visible where a `columnMapping`
    * PARAMETER shadows the method ([[writeManifest]]). */
  private def columnMapping0(spark: SparkSession, root: String,
                             version: Long): (Seq[(String, String)], Seq[String]) =
    columnMapping(spark, root, version)

  /** [[columnMapping]] as lookup structures, degraded to empty on a
    * missing/unreadable manifest (derived metadata never blocks). */
  private def mappingAt(spark: SparkSession, root: String,
                        version: Long): (Map[String, String], Set[String]) =
    if (version < 1) (Map.empty, Set.empty)
    else try {
      val (r, d) = columnMapping(spark, root, version)
      (r.toMap, d.toSet)
    } catch { case _: java.io.IOException => (Map.empty, Set.empty) }

  /** [[columnMapping]] as lookup structures (renames logical→physical,
    * dropped physical names) — empty when the manifest is missing or
    * predates mapping. Public for the streaming sources and SQL
    * commands, which live outside this package. */
  def columnMappingAt(spark: SparkSession, root: String,
                      version: Long): (Map[String, String], Set[String]) =
    mappingAt(spark, root, version)

  /** Present a PHYSICAL frame (a raw file read) through a column
    * mapping — the read half of the mapping boundary, public for the
    * streaming sources which read added files directly. Identity when
    * the mapping is empty. */
  def presentLogical(df: DataFrame,
      mapping: (Map[String, String], Set[String])): DataFrame =
    applyColumnMapping(df, mapping)

  /** A version's LOGICAL schema: the recorded physical schema through
    * that version's column mapping, when recorded. */
  def logicalSchemaAt(spark: SparkSession, root: String,
      version: Long): Option[org.apache.spark.sql.types.StructType] =
    schemaFor(spark, root, version)
      .map(logicalSchema(_, mappingAt(spark, root, version)))

  /** Physical column name of logical `name` under `renames` (identity
    * when unmapped). */
  private def physicalNameOf(renames: Map[String, String], name: String): String =
    renames.getOrElse(name, name)

  /** Physical→logical boundary: project `df` (physical file columns)
    * to the table's LOGICAL columns — drop tombstoned physicals, alias
    * renamed ones. Identity (and zero plan nodes) when the mapping is
    * empty. A plain alias projection, so Catalyst pushes filters and
    * pruning straight through it to the physical scan. */
  private[sinks] def applyColumnMapping(df: DataFrame,
      mapping: (Map[String, String], Set[String])): DataFrame = {
    val (renames, dropped) = mapping
    if (renames.isEmpty && dropped.isEmpty) df
    else {
      val byPhysical = renames.map(_.swap)
      df.select(df.columns.toSeq.collect {
        case c if !dropped(c) => byPhysical.get(c) match {
          case Some(logical) => col(c).as(logical)
          case None => col(c)
        }
      }: _*)
    }
  }

  /** [[applyColumnMapping]] at the StructType level (for recorded
    * schemas and pinned stream schemas). */
  private[sinks] def logicalSchema(schema: org.apache.spark.sql.types.StructType,
      mapping: (Map[String, String], Set[String])): org.apache.spark.sql.types.StructType = {
    val (renames, dropped) = mapping
    if (renames.isEmpty && dropped.isEmpty) schema
    else {
      val byPhysical = renames.map(_.swap)
      org.apache.spark.sql.types.StructType(schema.fields.toSeq.collect {
        case f if !dropped(f.name) =>
          byPhysical.get(f.name).map(l => f.copy(name = l)).getOrElse(f)
      })
    }
  }

  /** Logical→physical boundary for frames about to be WRITTEN: rename
    * mapped logical columns back to their stable physical names, and
    * refuse collisions a table-wide name mode cannot represent — a new
    * column whose name is a dropped column's physical name (old files
    * still hold that physical column; mixing would resurrect dropped
    * data under the new column) or another column's physical name.
    * Failing loudly here is Delta's own posture: physical names are
    * reserved for the table's lifetime; pick another name. */
  private def toPhysical(df: DataFrame,
      mapping: (Map[String, String], Set[String])): DataFrame = {
    val (renames, dropped) = mapping
    if (renames.isEmpty && dropped.isEmpty) df
    else {
      val owned = renames.map(_.swap) // physical -> logical
      df.columns.foreach { c =>
        if (!c.startsWith(PartDir) && !renames.contains(c)) {
          require(!dropped(c),
            s"column name '$c' is reserved: it is the physical name of a " +
              "DROPPED column and old data files still carry it. Pick " +
              "another name (or rewrite the table to purge the old column)")
          require(!owned.contains(c),
            s"column name '$c' is reserved: it is the physical name of " +
              s"column '${owned(c)}'. Pick another name")
        }
      }
      renames.foldLeft(df) { case (d, (logical, physical)) =>
        if (d.columns.contains(logical)) d.withColumnRenamed(logical, physical)
        else d
      }
    }
  }

  /** CHECK constraints recorded in a version's manifest
    * (`#constraint\tname\turl-encoded-expr` headers) — table metadata
    * in the log, the Delta constraint convention. */
  def tableConstraints(spark: SparkSession, root: String,
                       version: Long): Seq[(String, String)] =
    manifestHeaderAll(spark, root, version, "constraint").map { l =>
      val Array(n, e) = l.split("\t", 2)
      (n, URLDecoder.decode(e, UTF_8))
    }

  /** Table properties recorded in a version's manifest
    * (`#prop\tkey\tvalue` headers, URL-encoded) — free-form table
    * metadata in the log, Delta's TBLPROPERTIES. Properties this store
    * itself consults: `graft.enableDeletionVectors` (= "true" routes
    * SQL DELETE through [[deleteWhereDv]] instead of the rewriting
    * [[deleteWhere]] — exactly Delta's opt-in). */
  def tableProperties(spark: SparkSession, root: String,
                      version: Long): Seq[(String, String)] =
    manifestHeaderAll(spark, root, version, "prop").map { l =>
      val Array(k, v) = l.split("\t", 2)
      (URLDecoder.decode(k, UTF_8), URLDecoder.decode(v, UTF_8))
    }

  /** Current-version table properties as a Map (empty for an empty or
    * pre-properties table). */
  def tablePropertiesMap(spark: SparkSession, root: String): Map[String, String] =
    currentVersion(spark, root)
      .map(v => tableProperties(spark, root, v).toMap).getOrElse(Map.empty)

  /** `ALTER TABLE … SET TBLPROPERTIES` — metadata-only commit: every
    * data file carries by reference; only the property set changes
    * (set/overwrite the given keys, keep the rest). Returns the new
    * version. */
  def setProperties(spark: SparkSession, root: String,
                    props: Seq[(String, String)], maxAttempts: Int = 5): Long = {
    require(props.nonEmpty, "SET TBLPROPERTIES needs at least one key")
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val existing = tableProperties(spark, root, cur)
      val keys = props.map(_._1).toSet
      val merged = existing.filterNot(p => keys(p._1)) ++ props
      val entries = manifest(spark, root, cur)
      val v = cur + 1
      if (writeManifest(spark, root, v, entries, "set-properties",
          partitionColumn(spark, root, cur).getOrElse(""),
          properties = Some(merged))) {
        writeStats(spark, root, v, entries, Nil, None)
        return v
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the set-properties race $maxAttempts times under $root")
  }

  /** `ALTER TABLE … UNSET TBLPROPERTIES` — metadata-only removal.
    * Unknown keys fail loudly (matching UNSET without IF EXISTS).
    * Returns the new version. */
  def unsetProperties(spark: SparkSession, root: String,
                      keys: Seq[String], maxAttempts: Int = 5): Long = {
    require(keys.nonEmpty, "UNSET TBLPROPERTIES needs at least one key")
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val existing = tableProperties(spark, root, cur)
      val have = existing.map(_._1).toSet
      val missing = keys.filterNot(have)
      require(missing.isEmpty,
        s"table $root has no propert${if (missing.size == 1) "y" else "ies"} " +
          s"${missing.mkString(", ")} (have: ${have.mkString(", ")})")
      val doomed = keys.toSet
      val entries = manifest(spark, root, cur)
      val v = cur + 1
      if (writeManifest(spark, root, v, entries, "unset-properties",
          partitionColumn(spark, root, cur).getOrElse(""),
          properties = Some(existing.filterNot(p => doomed(p._1))))) {
        writeStats(spark, root, v, entries, Nil, None)
        return v
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the unset-properties race $maxAttempts times under $root")
  }

  /** Enforce the table's CHECK constraints against a batch about to be
    * written: a row violates when the expression is FALSE — NULL
    * passes (SQL CHECK semantics). One pushdown-friendly limit-1 probe
    * per constraint, free when the table has none. Layout-only
    * rewrites (compact/zorder) skip this — content is unchanged by
    * invariant, and re-proving it would double their read. */
  private def enforceConstraints(spark: SparkSession, root: String,
                                 df: DataFrame): Unit = {
    val cs = currentVersion(spark, root)
      .map(v => tableConstraints(spark, root, v)).getOrElse(Nil)
    cs.foreach { case (name, e) =>
      val bad = df.filter(!coalesce(expr(e), lit(true))).limit(1).collect()
      if (bad.nonEmpty) throw new IllegalStateException(
        s"CHECK constraint $name ($e) violated by row: ${bad.head}")
    }
  }

  private def writeManifest(spark: SparkSession, root: String, version: Long,
                            entries: Seq[ManifestEntry],
                            operation: String = "",
                            partitionCol: String = "",
                            extraHeaders: Seq[String] = Nil,
                            constraints: Option[Seq[(String, String)]] = None,
                            properties: Option[Seq[(String, String)]] = None,
                            columnMapping: Option[(Seq[(String, String)], Seq[String])] = None): Boolean = {
    val f = fs(spark, root)
    val token = java.util.UUID.randomUUID().toString
    val tmp = new Path(root, s"manifests/.v_$version.tmp-$token")
    val out = f.create(tmp, false)
    // Commit wall-clock, clamped monotonic against the predecessor so
    // `TIMESTAMP AS OF` resolution can trust that version order and
    // timestamp order agree even across clock skew between writers
    // (Delta's in-commit-timestamp clamp). Predecessor missing
    // (first commit, vacuumed, or pre-#ts) → the clock as-is.
    val ts = {
      val now = System.currentTimeMillis()
      val prev = if (version > 1)
        try commitTimestamp(spark, root, version - 1) catch {
          case _: java.io.IOException => None
        }
      else None
      prev.map(p => math.max(now, p + 1)).getOrElse(now)
    }
    // Constraints carry forward automatically (they are table
    // metadata, like #partcol) unless the caller REPLACES the set
    // (ALTER ADD/DROP CONSTRAINT). A missing predecessor (first
    // commit, vacuumed) carries nothing.
    val effectiveConstraints = constraints.getOrElse(
      if (version > 1)
        try tableConstraints(spark, root, version - 1)
        catch { case _: java.io.IOException => Nil }
      else Nil)
    // Table properties carry forward exactly like constraints unless
    // the caller REPLACES the set (ALTER TABLE SET/UNSET TBLPROPERTIES).
    val effectiveProperties = properties.getOrElse(
      if (version > 1)
        try tableProperties(spark, root, version - 1)
        catch { case _: java.io.IOException => Nil }
      else Nil)
    // Column mapping carries forward exactly like constraints unless
    // the caller REPLACES it (ALTER TABLE RENAME/DROP COLUMN, restore,
    // clone).
    val effectiveMapping = columnMapping.getOrElse(
      if (version > 1)
        try columnMapping0(spark, root, version - 1)
        catch { case _: java.io.IOException => (Nil, Nil) }
      else (Nil, Nil))
    // The COPY INTO loaded-file ledger carries forward like every
    // other piece of table metadata: if it lived only in the manifest
    // of the version that loaded the files, a routine VACUUM would
    // drop it and a re-fired COPY INTO would silently double-load.
    // Cost: ledger size × ~1 line per manifest — proportional to the
    // table's copied-file count, the price of the idempotence
    // contract surviving maintenance.
    val carriedCopied = (
      if (version > 1)
        try manifestHeaderAll(spark, root, version - 1, "copied")
        catch { case _: java.io.IOException => Nil }
      else Nil).map(c => s"#copied\t$c").filterNot(extraHeaders.contains)
    // Reader-mandatory features of THIS manifest (see the gate in
    // [[manifest]]): derived per version rather than carried — a
    // version that stopped using a feature (REORG PURGE dropped every
    // DV, a restore snapped the column mapping away) is readable
    // again by readers without it. `#require` lines ride the same
    // atomic publish as everything else.
    val required =
      (if (effectiveMapping._1.nonEmpty || effectiveMapping._2.nonEmpty)
         Seq("colmap") else Nil) ++
      (if (entries.exists(_.dv.nonEmpty)) Seq("dv") else Nil) ++
      (if (partitionCol.contains(",")) Seq("multipart") else Nil)
    val headers = s"#committer\t$token" +:
      (Seq(s"#ts\t$ts") ++
        required.map(f => s"#require\t$f") ++
        (if (operation.nonEmpty) Seq(s"#op\t$operation") else Nil) ++
        // Table metadata in the log (the Delta convention): the
        // partition column name, so table-level maintenance (SQL
        // OPTIMIZE) needs no out-of-band knowledge.
        (if (partitionCol.nonEmpty) Seq(s"#partcol\t$partitionCol") else Nil) ++
        effectiveConstraints.map { case (n, e) =>
          s"#constraint\t$n\t${URLEncoder.encode(e, UTF_8)}" } ++
        effectiveProperties.map { case (k, v) =>
          s"#prop\t${URLEncoder.encode(k, UTF_8)}\t${URLEncoder.encode(v, UTF_8)}" } ++
        effectiveMapping._1.map { case (lg, ph) =>
          s"#colmap\t${URLEncoder.encode(lg, UTF_8)}\t${URLEncoder.encode(ph, UTF_8)}" } ++
        effectiveMapping._2.map(ph => s"#coldrop\t${URLEncoder.encode(ph, UTF_8)}") ++
        carriedCopied ++
        extraHeaders)
    try out.write((headers ++ entries.map { e =>
      val base = s"${URLEncoder.encode(e.partition, UTF_8)}\t${e.path}"
      // A DV attachment appends exactly two more fields; DV-free
      // entries keep the two-field line, byte-identical to what every
      // earlier version of this store wrote.
      if (e.dv.isEmpty) base else s"$base\t${e.dv}\t${e.dvRows}"
    }).mkString("\n").getBytes(UTF_8))
    finally out.close()
    val dst = manifestPath(root, version)
    // Atomic publish. `FileSystem.rename` on the local filesystem (and
    // many object-store connectors) silently OVERWRITES an existing
    // destination, so exists()-then-rename lets two racing committers
    // both "win" a version — the loser's commit would be silently
    // replaced. `FileContext.rename(..., Rename.NONE)` instead fails
    // when the destination exists on every Hadoop filesystem,
    // including RawLocalFs, closing that window.
    val renamed = try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        f.getUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(f.makeQualified(tmp), f.makeQualified(dst),
        org.apache.hadoop.fs.Options.Rename.NONE)
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case e: java.io.IOException if f.exists(dst) &&
          !manifestCommitter(spark, root, version).contains(token) => false
    }
    // Belt-and-suspenders: even if a filesystem's rename raced through,
    // the published content carries the committer token — only the
    // committer whose token survived owns the version; anyone else
    // retries on the next number.
    val won = renamed && manifestCommitter(spark, root, version).contains(token)
    if (!won && f.exists(tmp)) f.delete(tmp, false)
    // Every Nth commit refreshes the `_last_checkpoint` hint so
    // current-version resolution stays O(N) forever. Our manifests are
    // SELF-CONTAINED snapshots (unlike Delta's delta-logs), so the
    // checkpoint needs no state rollup — a version pointer alone
    // bounds the walk.
    if (won && version % checkpointInterval(spark) == 0)
      writeLastCheckpoint(spark, root, version)
    won
  }

  /** Observability hook for specs: number of raw stats-sidecar reads
    * since JVM start. A planning pass through [[tableWithIndex]] must
    * bump this exactly once — the sidecar is parsed one time and both
    * the file index and the recorded schema derive from that parse. */
  private[graft] val sidecarReads = new java.util.concurrent.atomic.AtomicLong

  /** One raw read+parse of version `v`'s stats sidecar: (per-file
    * stats, recorded schema). Degrades to (empty, None) on a missing
    * or torn sidecar — DERIVED metadata must never block a read (the
    * manifest alone is authoritative). */
  private def statsSidecar(spark: SparkSession, root: String, version: Long):
      (Map[String, FileStats.FileStatsEntry], Option[org.apache.spark.sql.types.StructType]) = {
    val f = fs(spark, root)
    val p = statsPath(root, version)
    if (!f.exists(p)) (Map.empty, None)
    else try {
      sidecarReads.incrementAndGet()
      val in = f.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val schema = try text.linesIterator.collectFirst {
        case l if l.startsWith("#schema\t") =>
          org.apache.spark.sql.types.DataType.fromJson(
            URLDecoder.decode(l.stripPrefix("#schema\t"), UTF_8))
            .asInstanceOf[org.apache.spark.sql.types.StructType]
      } catch { case scala.util.control.NonFatal(_) => None }
      (FileStats.decode(text), schema)
    } catch {
      case scala.util.control.NonFatal(_) => (Map.empty, None)
    }
  }

  /** Per-file column stats of a committed version (file-skipping
    * metadata, see [[FileStats]]), keyed by manifest-relative path.
    * Empty when the version predates stats or its sidecar write was
    * interrupted — readers then simply don't prune. */
  def statsFor(spark: SparkSession, root: String, version: Long): Map[String, FileStats.FileStatsEntry] =
    statsSidecar(spark, root, version)._1

  /** The snapshot schema recorded at commit time (evolution-merged
    * across versions), if the stats sidecar carries one. */
  def schemaFor(spark: SparkSession, root: String, version: Long): Option[org.apache.spark.sql.types.StructType] =
    statsSidecar(spark, root, version)._2

  /** Metadata-priced row count of a version (default current): Σ
    * per-file row counts from the stats sidecar − Σ deletion-vector
    * cardinalities from the manifest. Zero data files are opened —
    * the reference's own stats call is metadata-priced
    * (mongodb_loader.py:271-299 `collStats`/`count_documents`), and
    * Delta answers COUNT(*) from the log the same way. None when any
    * manifest file lacks a stats row (legacy/torn sidecar) — callers
    * fall back to the scan rather than undercount. */
  def rowCount(spark: SparkSession, root: String,
               version: Option[Long] = None): Option[Long] =
    partitionRowCounts(spark, root, version).map(_.values.sum)

  /** Per-partition DV-adjusted row counts keyed by ENCODED partition
    * value ([[decodePartValue]] splits composites) — [[rowCount]]'s
    * contract, partition-grained. Powers `SHOW PARTITIONS`' row_count
    * column. */
  def partitionRowCounts(spark: SparkSession, root: String,
                         version: Option[Long] = None): Option[Map[String, Long]] = {
    val v = version.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    val entries = manifest(spark, root, v)
    val stats = statsFor(spark, root, v)
    if (!entries.forall(e => stats.contains(e.path))) None
    else Some(entries.groupBy(_.partition).view.mapValues(
      _.map(e => stats(e.path).rows - e.dvRows).sum).toMap)
  }

  /** The SAFE widening of two primitive types, if any: the ladder a
    * parquet scan can replay against carried files (Spark 4's parquet
    * readers widen INT32→INT64 and FLOAT→DOUBLE in place, SPARK-40876)
    * — so recording the wider type keeps every already-written file
    * readable. None = not a widening pair (caller refuses or keeps the
    * old behavior). Mirrors the reference's Pydantic numeric coercion
    * (unified_product_schema.py:145-207), minus the lossy directions. */
  private[sinks] def widen(a: org.apache.spark.sql.types.DataType,
                           b: org.apache.spark.sql.types.DataType)
      : Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    val integral: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType)
    val fractional: Seq[DataType] = Seq(FloatType, DoubleType)
    // catalogString = the type modulo nullability flags (an
    // array<float> whose containsNull differs is the same stored
    // type; DataType.sameType is private[spark]).
    if (a.catalogString == b.catalogString) Some(a)
    else if (integral.contains(a) && integral.contains(b))
      Some(integral(math.max(integral.indexOf(a), integral.indexOf(b))))
    else if (fractional.contains(a) && fractional.contains(b))
      Some(DoubleType)
    else (a, b) match {
      // Same-scale precision growth — decimal arithmetic's natural
      // drift (sum/avg bump precision), readable over carried files
      // via the parquet decimal widening conversion.
      case (da: DecimalType, db: DecimalType) if da.scale == db.scale =>
        Some(DecimalType(math.max(da.precision, db.precision), da.scale))
      case _ => None
    }
  }

  /** Union-by-name schema evolution: `a`'s fields (typed as `b`'s when
    * both carry the name — the newest write wins, EXCEPT that numeric
    * pairs record their safe WIDENING so carried files written under
    * the narrower type keep reading), then `b`'s new fields,
    * everything nullable (pre-evolution files read the new columns as
    * typed nulls). */
  private def schemaUnion(a: org.apache.spark.sql.types.StructType,
                          b: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType = {
    val bByName = b.fields.map(f => f.name -> f).toMap
    val aNames = a.fieldNames.toSet
    org.apache.spark.sql.types.StructType(
      a.fields.map { f =>
        bByName.get(f.name) match {
          case Some(bf) => bf.copy(nullable = true,
            dataType = widen(f.dataType, bf.dataType).getOrElse(bf.dataType))
          case None => f.copy(nullable = true)
        }
      } ++
        b.fields.filterNot(f => aNames(f.name)).map(_.copy(nullable = true)))
  }

  /** Write version `v`'s stats sidecar: footer stats for the NEW data
    * files (one metadata read each — cost ∝ incoming batch), stats of
    * carried files copied from the previous sidecar (immutable files,
    * stats never go stale). Called AFTER the manifest wins — the
    * sidecar is derived metadata, so this method must never fail the
    * commit: any error degrades to "no sidecar" (readers fall back to
    * footer merging and simply don't skip), matching [[statsFor]]'s
    * read-side degradation; throwing here would make a retry of an
    * already-published version publish a duplicate. Sizing note: at a
    * large file count, swap the driver-side loop for a parallelized
    * footer read over the new paths — the format doesn't change. */
  private def writeStats(spark: SparkSession, root: String, v: Long,
                         carried: Seq[ManifestEntry], fresh: Seq[ManifestEntry],
                         newSchemaLogical: Option[org.apache.spark.sql.types.StructType],
                         basis: Option[Long] = None): Unit = try {
    val f = fs(spark, root)
    val conf = spark.sparkContext.hadoopConfiguration
    // The recorded schema is PHYSICAL (it describes what the parquet
    // files hold; the logical view is derived by applying the
    // version's column mapping on read). Callers pass their batch's
    // LOGICAL schema — translate renamed fields back. Identity for
    // unmapped tables.
    val newSchema = newSchemaLogical.map { s =>
      val (renames, _) = mappingAt(spark, root, v)
      if (renames.isEmpty) s
      else org.apache.spark.sql.types.StructType(s.fields.toSeq.map(fld =>
        renames.get(fld.name).map(ph => fld.copy(name = ph)).getOrElse(fld)))
    }
    // `basis` points the prior-metadata lookup at a version other than
    // v-1 (RESTORE seeds from the restore target, so the recorded
    // schema snaps back EXACTLY — no union with the abandoned tip).
    val pv = basis.getOrElse(v - 1)
    val prior = if (pv >= 1) statsFor(spark, root, pv) else Map.empty[String, FileStats.FileStatsEntry]
    // The recorded schema must cover every column readable from the
    // manifest's files. Normally that is priorSchema ∪ newSchema, but
    // when the previous version has no recorded schema (pre-stats
    // table being upgraded, torn sidecar) the carried files' columns
    // are NOT covered by the batch schema alone — recording just the
    // batch would make table() silently drop carried-only columns.
    // Derive the prior side from the carried files' own footers then
    // (a metadata read over the carried list, once, at commit time).
    val priorSchema = (if (pv >= 1) schemaFor(spark, root, pv) else None)
      .orElse(if (carried.isEmpty) None
              else Some(readEntries(spark, root, carried).schema))
    val all = (carried ++ fresh).map { e =>
      e.path -> prior.getOrElse(e.path, {
        val p = new Path(root, e.path)
        FileStats.fromFooter(conf, p, f.getFileStatus(p).getLen)
      })
    }
    // Carried files keep reading through the evolved schema, so the
    // recorded schema is the running union across versions — except
    // under an explicit basis (RESTORE), where the basis version's
    // schema is recorded verbatim: restoring v1 after a widening merge
    // must NOT resurface the later columns as all-null.
    val schema =
      if (basis.isDefined) newSchema.orElse(priorSchema)
      else (priorSchema, newSchema) match {
        case (Some(p), Some(n)) => Some(schemaUnion(p, n))
        case (p, n) => n.orElse(p)
      }
    val tmp = new Path(root, s"manifests/.v_$v.stats.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, false)
    try {
      val header = schema.map(s => s"#schema\t${URLEncoder.encode(s.json, UTF_8)}\n").getOrElse("")
      out.write((header + FileStats.encode(all)).getBytes(UTF_8))
    } finally out.close()
    // Only the manifest winner reaches here, so a plain rename is fine.
    f.delete(statsPath(root, v), false)
    f.rename(tmp, statsPath(root, v))
  } catch {
    case scala.util.control.NonFatal(e) =>
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"stats sidecar for v_$v under $root not written (${e.getClass.getSimpleName}: " +
          s"${e.getMessage}); readers fall back to footer merging without skipping")
  }

  /** Per-file Bloom filters of a committed version (see
    * [[addBloomFilters]]), keyed by manifest-relative path then
    * column. Empty when none were built. */
  def bloomFor(spark: SparkSession, root: String, version: Long): Map[String, Map[String, FileStats.BloomStats]] = {
    val f = fs(spark, root)
    val p = bloomPath(root, version)
    if (version < 1 || !f.exists(p)) Map.empty
    else try {
      val in = f.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      FileStats.decodeBlooms(text)
    } catch {
      // Same degradation contract as statsFor: derived metadata only.
      case scala.util.control.NonFatal(_) => Map.empty
    }
  }

  /** Opt-in point-lookup skipping: build per-file Bloom filters over
    * `cols` for version `version` (default current) and publish them
    * as a bloom sidecar. Min/max stats can't prune equality probes
    * into high-cardinality columns in ARRIVAL order (every file's
    * range spans the domain); a Bloom filter skips by content instead
    * — the Delta "bloom filter index" use case.
    *
    * Each file's filter is sized from ITS distinct-value count
    * (`bitsPerValue` bits each, Delta's default sizing) — a fixed
    * width would saturate on large files and silently stop pruning.
    * The build is fully distributed: positions fold into 64-bit words
    * via a `bit_or` hash aggregate, so the driver collects only
    * bitmap words (m/64 rows per file), never value sets.
    *
    * Cost: one `approx_count_distinct` pass + one build pass over the
    * files that don't already carry a bloom for every requested
    * column — carried files' filters copy forward (immutable files),
    * so re-running after each commit costs ∝ the new batch. False
    * positives only ever KEEP a file (~1% at 10 bits/value, k=3);
    * false negatives are impossible, so results never change. */
  def addBloomFilters(spark: SparkSession, root: String, cols: Seq[String],
                      bitsPerValue: Int = 10, k: Int = 3,
                      version: Option[Long] = None): Unit = {
    require(bitsPerValue > 0 && k > 0, s"need positive sizing, got $bitsPerValue/$k")
    val v = version.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    val entries = manifest(spark, root, v)
    val prior = bloomFor(spark, root, v - 1) ++ bloomFor(spark, root, v)
    val need = entries.filter(e =>
      !cols.forall(c => prior.get(e.path).exists(_.contains(c))))
    val f = fs(spark, root)
    val built: Map[String, Map[String, FileStats.BloomStats]] =
      if (need.isEmpty) Map.empty
      else {
        val paths = need.map(e => f.makeQualified(new Path(root, e.path)).toString)
        // Qualified URI → manifest-relative path (suffix match is safe:
        // data-file paths are UUID-unique within the table).
        def relOf(uri: String): String =
          need.map(_.path).find(uri.endsWith).getOrElse(
            throw new IllegalStateException(s"scanned file not in manifest: $uri"))
        val df = spark.read.option("mergeSchema", "true").parquet(paths: _*)
        cols.flatMap { c =>
          val tpe = df.schema(c).dataType.simpleString
          require(Set("int", "bigint", "double", "string")(tpe),
            s"bloom filters support int/bigint/double/string, '$c' is $tpe")
          val src = df.select(input_file_name().as("__f"), col(c))
            .where(col(c).isNotNull)
          val mByFile: Map[String, Long] = src
            .groupBy(col("__f")).agg(approx_count_distinct(col(c)).as("__ndv"))
            .collect()
            .map { r =>
              val m = math.max(512L, ((r.getLong(1) * bitsPerValue + 63) / 64) * 64)
              // BloomStats.m is an Int bit count: past ~2^31 bits the
              // narrowing below would go negative and the bitmap
              // allocation would throw far from the cause. A single
              // file with >200M distinct values is mis-sized anyway —
              // fail with the fix spelled out.
              require(m <= Int.MaxValue - 63,
                s"bloom for '$c' in ${r.getString(0)} needs $m bits " +
                  s"(ndv=${r.getLong(1)} × $bitsPerValue); split the file or lower bitsPerValue")
              r.getString(0) -> m
            }.toMap
          if (mByFile.isEmpty) Nil
          else {
            val mDf = broadcast(spark.createDataFrame(
              spark.sparkContext.parallelize(mByFile.toSeq.map(x =>
                org.apache.spark.sql.Row(x._1, x._2)), 1),
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("__f", org.apache.spark.sql.types.StringType),
                org.apache.spark.sql.types.StructField("__m", org.apache.spark.sql.types.LongType)))))
            val words = src.join(mDf, "__f")
              .select(col("__f"), explode(array((0 until k).map(s =>
                pmod(xxhash64(lit(s), col(c)), col("__m"))): _*)).as("__pos"))
              .select(col("__f"),
                shiftrightunsigned(col("__pos"), 6).cast("int").as("__w"),
                expr("shiftleft(1L, CAST(__pos % 64 AS INT))").as("__b"))
              .groupBy(col("__f"), col("__w")).agg(bit_or(col("__b")).as("__bits"))
              .collect()
            words.groupBy(_.getString(0)).toSeq.map { case (uri, rs) =>
              val m = mByFile(uri).toInt
              val arr = new Array[Long](m / 64)
              rs.foreach(r => arr(r.getInt(1)) = r.getLong(2))
              (relOf(uri), c, FileStats.BloomStats(tpe, m, k, arr.toIndexedSeq))
            }
          }
        }.groupBy(_._1).map { case (p, xs) => p -> xs.map(x => x._2 -> x._3).toMap }
      }
    val merged = entries.map { e =>
      e.path -> (prior.getOrElse(e.path, Map.empty) ++ built.getOrElse(e.path, Map.empty))
    }.filter(_._2.nonEmpty)
    val tmp = new Path(root, s"manifests/.v_$v.bloom.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, false)
    try out.write(FileStats.encodeBlooms(merged).getBytes(UTF_8)) finally out.close()
    f.delete(bloomPath(root, v), false)
    f.rename(tmp, bloomPath(root, v))
  }

  /** Manifest-backed [[GraftFileIndex]] for a version: the file
    * listing is the manifest, file sizes come from the stats sidecar
    * (zero per-file filesystem calls when stats exist), and data
    * filters prune via per-file min/max. */
  def fileIndex(spark: SparkSession, root: String, version: Option[Long] = None,
                partitions: Option[Seq[String]] = None): GraftFileIndex = {
    val v = version.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    fileIndexFrom(spark, root, v, partitions, statsFor(spark, root, v))
  }

  /** [[fileIndex]] with the stats already parsed — lets a planning
    * pass that also needs the recorded schema read the sidecar ONCE
    * (see [[tableWithIndex]] and the sidecarReads spec). */
  private def fileIndexFrom(spark: SparkSession, root: String, v: Long,
                            partitions: Option[Seq[String]],
                            stats: Map[String, FileStats.FileStatsEntry]): GraftFileIndex = {
    val all = manifest(spark, root, v)
    val wanted = partitions match {
      case Some(ps) => val keep = ps.toSet; all.filter(e => keep(e.partition))
      case None => all
    }
    val blooms = bloomFor(spark, root, v)
    val f = fs(spark, root)
    val files = wanted.map { e =>
      val p = f.makeQualified(new Path(root, e.path))
      val st = stats.get(e.path) match {
        case Some(se) =>
          (new org.apache.hadoop.fs.FileStatus(se.len, false, 1, 128L * 1024 * 1024, 0L, p), Some(se))
        case None => (f.getFileStatus(p), None)
      }
      (st._1, st._2, blooms.getOrElse(e.path, Map.empty[String, FileStats.BloomStats]))
    }
    new GraftFileIndex(new Path(root), files)
  }

  /** Read a snapshot THROUGH the planning-time file-skipping index:
    * `table(...).filter(...)` opens only the files whose stats ranges
    * can satisfy the filters (plus Catalyst's usual parquet pushdown
    * inside each file). [[read]]/[[readVersion]] stay as the plain
    * all-files path; this is the scale path for selective queries
    * over large snapshots. */
  def table(spark: SparkSession, root: String, version: Option[Long] = None,
            partitions: Option[Seq[String]] = None): DataFrame =
    tableWithIndex(spark, root, version, partitions)._1

  /** [[table]] plus its index, whose `lastCandidateFiles` records how
    * many files the most recent planning pass kept (specs + SCALE). */
  def tableWithIndex(spark: SparkSession, root: String, version: Option[Long] = None,
                     partitions: Option[Seq[String]] = None): (DataFrame, GraftFileIndex) = {
    val (rel, idx, entries) = relationWithIndex(spark, root, version, partitions)
    val v = version.orElse(currentVersion(spark, root)).get
    (applyColumnMapping(applyDvs(spark, root,
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .baseRelationToDataFrame(rel), entries), mappingAt(spark, root, v)), idx)
  }

  /** The skipping-indexed relation behind [[table]] — also what the
    * `graft-snapshot` format ([[SnapshotSource]]) hands Spark, so SQL
    * reads plan through the same [[GraftFileIndex]]. */
  private[graft] def relationWithIndex(spark: SparkSession, root: String,
                                       version: Option[Long], partitions: Option[Seq[String]]):
      (org.apache.spark.sql.execution.datasources.HadoopFsRelation, GraftFileIndex,
        Seq[ManifestEntry]) = {
    val v = version.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    // ONE sidecar parse feeds both the skipping index and the recorded
    // schema (it used to be parsed twice per planning pass).
    val (stats, recorded) = statsSidecar(spark, root, v)
    val all = manifest(spark, root, v)
    val wanted = partitions match {
      case Some(ps) => val keep = ps.toSet; all.filter(e => keep(e.partition))
      case None => all
    }
    val idx = fileIndexFrom(spark, root, v, partitions, stats)
    val schema = recorded.getOrElse(readEntries(spark, root, all).schema)
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      idx, new org.apache.spark.sql.types.StructType(), schema, None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
      Map.empty[String, String])(spark)
    // The relation alone does NOT apply deletion vectors — callers
    // that hand it to Spark directly must wrap when `wanted` carries
    // DVs (tableWithIndex / SnapshotSource / ResolveGraftSnapshot all
    // do). Returned entries are the pruned selection for exactly that.
    (rel, idx, wanted)
  }

  /** Undo Spark/Hive partition-directory escaping (`%XX` sequences
    * only — unlike URL decoding, a literal `+` is a plus). */
  private[graft] def unescapePathName(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 2 < s.length) {
        try { sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(s.charAt(i)); i += 1 }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Write `df`'s rows as new data files and return their manifest
    * entries. The directory name embeds the target version for
    * debuggability plus a UUID so a crashed attempt's orphan can never
    * collide with a retry. The partition column is DUPLICATED into a
    * `__part` directory key so files group by partition on disk while
    * the real column stays inside the parquet (readers never depend on
    * directory layout). */
  private def writeDataFiles(spark: SparkSession, df: DataFrame, root: String,
                             v: Long, partitionCols: Seq[String],
                             translate: Boolean = true): Seq[ManifestEntry] = {
    require(partitionCols.nonEmpty, "snapshot writes need a partition spec")
    val dataDir = s"data/v_$v-${java.util.UUID.randomUUID().toString.take(8)}"
    val dirs = partDirNames(partitionCols.size)
    // Column mapping's logical→physical boundary: content paths hand
    // LOGICAL frames here (translate = true, the default); layout
    // paths (compact / zorder / purge) read files RAW and re-write
    // them physical-as-is (translate = false) — translating an
    // already-physical frame would trip the collision guard. The
    // `__part*` directory keys are derived from the caller's columns
    // BEFORE translation, so both call shapes pass the names that
    // exist in their frame.
    val withDirs = partitionCols.zip(dirs).foldLeft(df) {
      case (d, (c, dir)) => d.withColumn(dir, col(c))
    }
    val physical =
      if (!translate) withDirs
      else toPhysical(withDirs, mappingAt(spark, root, v - 1))
    physical
      .write.mode("error").partitionBy(dirs: _*)
      .parquet(new Path(root, dataDir).toString)
    val f = fs(spark, root)
    // Walk exactly k directory levels, accumulating the partition
    // components (Hive-unescaped) and the on-disk subpath.
    def walk(p: Path, depth: Int, comps: Vector[String],
             sub: Vector[String]): Seq[ManifestEntry] =
      f.listStatus(p).toSeq.flatMap { s =>
        if (depth < dirs.size) {
          val prefix = s"${dirs(depth)}="
          if (s.isDirectory && s.getPath.getName.startsWith(prefix))
            walk(s.getPath, depth + 1,
              comps :+ unescapePathName(s.getPath.getName.stripPrefix(prefix)),
              sub :+ s.getPath.getName)
          else Nil
        } else if (s.getPath.getName.endsWith(".parquet"))
          Seq(ManifestEntry(encodePartValue(comps),
            (s"$dataDir" +: sub :+ s.getPath.getName).mkString("/")))
        else Nil
      }
    walk(new Path(root, dataDir), 0, Vector.empty, Vector.empty)
  }

  /** Row-identity key of a data file: its last TWO path components
    * (`__part=<value>/part-….parquet`). A bare file name is NOT unique
    * — one write job stamps the same task/job UUID name into every
    * partition directory it writes — but (partition dir, name) is
    * unique within a job, and the job UUID makes it unique across
    * jobs/versions. Hive-escaping keeps '/' out of partition dirs, so
    * the two-component split is stable.
    *
    * The key is produced in the SCAN'S encoding: `_metadata.file_path`
    * is a URI, so a Hive-escaped on-disk directory like `__part=a b`
    * (or `__part=c%3Ad`) surfaces as `__part=a%20b` / `__part=c%253Ad`
    * there, while manifest paths hold the raw on-disk bytes. Both
    * sides of every DV comparison must use ONE form — comparing raw
    * manifest components against URI components silently attached NO
    * deletion vector for any partition value needing escaping (a
    * predicate delete then "succeeded" while removing nothing). Each
    * component is URI-percent-encoded exactly as `java.net.URI`
    * renders a path segment ('+' and ':' stay literal, space → %20,
    * '%' → %25). */
  private[sinks] def dvKeyOf(path: String): String = {
    val parts = path.split("/")
    // From the FIRST `__part=` component onwards: under multi-column
    // partitioning a file's identity needs every partition level (one
    // write job stamps the same task/job file name into every leaf
    // directory, so `__part1=x/part-….parquet` alone is ambiguous
    // across `__part=a` vs `__part=b`). For single-column tables this
    // IS the historical last-two-components key, so DVs persisted by
    // earlier versions keep matching byte-for-byte.
    val i = parts.indexWhere(_.startsWith(s"$PartDir="))
    val tail = if (i >= 0) parts.drop(i)
               else parts.takeRight(math.min(2, parts.length))
    tail.map(c => new java.net.URI(null, null, "/" + c, null)
        .getRawPath.stripPrefix("/"))
      .mkString("/")
  }

  /** [[dvKeyOf]] as a Column over a scan's `_metadata.file_path` —
    * both sides of every DV comparison must use this one rule. */
  private[sinks] def dvKeyExpr(pathCol: Column): Column =
    regexp_extract(pathCol, s"($PartDir=.*)$$", 1)

  /** Write a deletion-vector position list sized by its cardinality:
    * one file for the sparse deletes DVs exist for, more when a huge
    * matched set would otherwise serialize through a single task
    * (~10M positions per output file; the position list is two narrow
    * columns, so each file stays small). `rows` comes from the
    * per-file counts the caller already collected — no extra pass. */
  private def writeDvDir(spark: SparkSession, root: String, dvDir: String,
                         newDv: DataFrame, rows: Long): Unit = {
    val perFile = 10L * 1000 * 1000
    val parts = math.max(1L, (rows + perFile - 1) / perFile).toInt
    (if (parts == 1) newDv.coalesce(1) else newDv.repartition(parts))
      .write.parquet(new Path(root, dvDir).toString)
  }

  /** The deletion-vector rows attached to `entries`, as one
    * DataFrame(file_key, pos) — or None when no entry carries a DV
    * (the overwhelmingly common case; callers must pay ZERO cost
    * then). A DV directory may hold rows for files whose entries have
    * since been rewritten or re-vectored under a newer directory, so
    * rows are filtered to the (directory, file) pairs THIS manifest
    * actually attaches. */
  private[sinks] def dvRowsFor(spark: SparkSession, root: String,
                        entries: Seq[ManifestEntry]): Option[DataFrame] = {
    val withDv = entries.filter(_.dv.nonEmpty)
    if (withDv.isEmpty) None
    else Some(withDv.groupBy(_.dv).map { case (dir, es) =>
      val files = es.map(e => dvKeyOf(e.path))
      spark.read.parquet(new Path(root, dir).toString)
        .filter(col("file_key").isin(files: _*))
        .select(col("file_key"), col("pos"))
    }.reduce(_ unionByName _))
  }

  /** Merge-on-read: drop the rows `entries`' deletion vectors mark
    * deleted. Data file names are globally unique (Spark writes
    * part-<task>-<UUID> names per job, disambiguated by partition
    * directory within a job — see [[dvKeyOf]]), so (file key, row
    * position) is a stable row identity, matched against the scan's
    * `_metadata.file_path` / `_metadata.row_index` columns — position
    * generation accounts for row-group skipping, so pushdown stays
    * on. The DV side is BROADCAST: its size is the table's deleted-row
    * count since the last rewrite of those files, bounded by running
    * [[purgeDeletionVectors]] (REORG … APPLY (PURGE)) — the same
    * contract as Delta's DV bitmaps, expressed as Spark's cheapest
    * join instead of a custom scan. No-DV tables skip all of this. */
  private[sinks] def applyDvs(spark: SparkSession, root: String,
                       df: DataFrame, entries: Seq[ManifestEntry]): DataFrame =
    dvRowsFor(spark, root, entries) match {
      case None => df
      case Some(dv) =>
        val cols = df.columns.toSeq
        df.withColumn("__graft_dv_fn", dvKeyExpr(col("_metadata.file_path")))
          .withColumn("__graft_dv_pos", col("_metadata.row_index"))
          .join(broadcast(dv.select(col("file_key").as("__graft_dv_fn"),
            col("pos").as("__graft_dv_pos"))),
            Seq("__graft_dv_fn", "__graft_dv_pos"), "left_anti")
          .select(cols.map(col): _*)
    }

  private def readEntries(spark: SparkSession, root: String,
                          entries: Seq[ManifestEntry],
                          recorded: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val paths = entries.map(e => new Path(root, e.path).toString)
    // Schema evolution: after a mergeCommit whose batch added columns,
    // one manifest references old-schema files (carried by reference)
    // AND new-schema files. With the version's RECORDED schema in hand
    // the scan reads through it directly — pre-evolution files read
    // added columns as typed nulls and WIDENED columns through the
    // parquet widening conversions (footer merging would refuse an
    // INT32/INT64 mix outright). Without it (legacy/torn sidecar) the
    // footers are merged — a driver-side metadata operation over the
    // listed files only (the reference evolves via Pydantic
    // defaulting, unified_product_schema.py:145-207).
    val reader = recorded match {
      case Some(sc) => spark.read.schema(sc)
      case None => spark.read.option("mergeSchema", "true")
    }
    applyDvs(spark, root, reader.parquet(paths: _*), entries)
  }

  /** [[readEntries]] through `version`'s recorded schema when the
    * sidecar carries one. */
  private def readEntriesAt(spark: SparkSession, root: String,
                            entries: Seq[ManifestEntry],
                            version: Long): DataFrame =
    readEntries(spark, root, entries, schemaFor(spark, root, version))

  /** Read a SUBSET of a version's files through the full read boundary
    * (deletion vectors + column mapping) — the candidate-read
    * primitive for index-driven retrieval (TextIndex / IVF probes),
    * which must never resurrect DV-deleted rows or expose physical
    * column names by reading data files raw. `candidates` are path
    * strings that END WITH the manifest-relative path (the form
    * index sidecars record); paths not in the version's manifest are
    * ignored. An empty selection returns an empty frame in the
    * version's logical schema. */
  def readFiles(spark: SparkSession, root: String, version: Long,
                candidates: Seq[String]): DataFrame = {
    val entries = manifest(spark, root, version)
      .filter(e => candidates.exists(_.endsWith(e.path)))
    if (entries.isEmpty) readVersion(spark, root, version).limit(0)
    else applyColumnMapping(readEntriesAt(spark, root, entries, version),
      mappingAt(spark, root, version))
  }

  /** Read the current snapshot; `partitions` prunes at the MANIFEST
    * level (no directory listing of unrelated partitions at all). */
  def read(spark: SparkSession, root: String,
           partitions: Option[Seq[String]] = None): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    readVersion(spark, root, v, partitions)
  }

  /** Time travel: read a specific committed version, presented through
    * that version's column mapping (`mappingVersion` overrides which
    * version's mapping applies — the CDC feed reads BOTH sides of a
    * diff under the newer version's names, Delta CDF's latest-schema
    * convention). */
  def readVersion(spark: SparkSession, root: String, version: Long,
                  partitions: Option[Seq[String]] = None,
                  mappingVersion: Option[Long] = None): DataFrame = {
    val all = manifest(spark, root, version)
    val wanted = partitions match {
      case Some(ps) => val keep = ps.toSet; all.filter(e => keep(e.partition))
      case None => all
    }
    val mapping = mappingAt(spark, root, mappingVersion.getOrElse(version))
    // A fully-pruned selection keeps the snapshot's schema (limit 0
    // over the full file set) rather than failing on an empty path
    // list. A version with NO files at all (a deleteCommit emptied
    // the table) is still a valid, readable snapshot: its schema
    // lives in the stats sidecar.
    if (all.isEmpty)
      schemaFor(spark, root, version) match {
        case Some(sc) => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          logicalSchema(sc, mapping))
        case None => throw new IllegalStateException(
          s"version $version of $root has no files and no schema sidecar")
      }
    else if (wanted.isEmpty)
      applyColumnMapping(readEntriesAt(spark, root, all, version).limit(0), mapping)
    else applyColumnMapping(readEntriesAt(spark, root, wanted, version), mapping)
  }

  /** Commit `df` as a full new snapshot (CTAS / backup path).
    * `properties` (when given) REPLACES the table property set
    * atomically with this commit — the mirror's initial-copy leg
    * rides here so "rows landed" and "sync recorded" cannot tear.
    * Returns the committed version. */
  def commit(spark: SparkSession, df: DataFrame, root: String,
             partitionCols: ColSpec, maxAttempts: Int = 5,
             properties: Option[Seq[(String, String)]] = None): Long = {
    enforceConstraints(spark, root, df)
    var attempt = 0
    while (attempt < maxAttempts) {
      // Always target EXACTLY current+1 (re-read per attempt). Skipping
      // ahead after a lost race would let another writer later publish
      // the skipped number and have its newer commit shadowed, since
      // "current" is the max committed version.
      val v = currentVersion(spark, root).getOrElse(0L) + 1
      val entries = writeDataFiles(spark, df, root, v, partitionCols.cols)
      if (writeManifest(spark, root, v, entries, "commit", partitionCols.header,
          properties = properties)) {
        writeStats(spark, root, v, Nil, entries, Some(df.schema))
        return v
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the commit race $maxAttempts times under $root")
  }

  /** CREATE-ONLY commit: publish `df` as version 1, or report that the
    * table already exists — decided INSIDE the commit protocol, not by
    * a check-then-act snapshot, so two concurrent creators cannot both
    * "win" (the manifest rename for v1 is the arbiter; the loser's
    * data files become vacuum-collected orphans). Returns None when a
    * snapshot existed (or came to exist concurrently). This is the
    * primitive behind the DataFrame writer's ErrorIfExists/Ignore
    * modes. */
  def commitIfAbsent(spark: SparkSession, df: DataFrame, root: String,
                     partitionCols: ColSpec): Option[Long] = {
    if (currentVersion(spark, root).isDefined) return None
    val entries = writeDataFiles(spark, df, root, 1L, partitionCols.cols)
    if (writeManifest(spark, root, 1L, entries, "commit", partitionCols.header)) {
      writeStats(spark, root, 1L, Nil, entries, Some(df.schema))
      Some(1L)
    } else None
  }

  /** Append `df`'s rows as a new snapshot version WITHOUT keyed
    * semantics: every existing file is carried by reference, the new
    * rows land as new files in their partitions. The unkeyed
    * counterpart of [[mergeCommit]] — fact/event tables where rows are
    * immutable observations, and the commit primitive behind
    * [[copyInto]]. Cost ∝ the appended batch at any table size (zero
    * existing data is read or rewritten). `extraHeaders` lines are
    * published atomically with the manifest (COPY INTO's loaded-file
    * ledger rides here — a sidecar written after the rename could tear
    * away from its commit and break idempotence). */
  def appendCommit(spark: SparkSession, df: DataFrame, root: String,
                   partitionCols: ColSpec, maxAttempts: Int = 10,
                   operation: String = "append",
                   extraHeaders: Seq[String] = Nil): Long = {
    enforceConstraints(spark, root, df)
    enforceSchemaCompatible(spark, root, df)
    var attempt = 0
    while (attempt < maxAttempts) {
      val (kept, v) = currentVersion(spark, root) match {
        case None => (Seq.empty[ManifestEntry], 1L)
        case Some(cur) => (manifest(spark, root, cur), cur + 1)
      }
      val newEntries = writeDataFiles(spark, df, root, v, partitionCols.cols)
      if (writeManifest(spark, root, v, kept ++ newEntries, operation,
          partitionCols.header, extraHeaders)) {
        writeStats(spark, root, v, kept, newEntries, Some(df.schema))
        return v
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the append-commit race $maxAttempts times under $root")
  }

  /** Source files already loaded into the table by [[copyInto]]: the
    * union of every version's `#copied` manifest headers. Header lines
    * are URL-encoded paths, atomic with their commit — so a file
    * appears here if and only if its rows are in the table, which is
    * the idempotence invariant (a crash between data write and
    * manifest publish leaves the file unlisted AND its rows
    * unpublished; the retry re-copies and the orphan files are
    * vacuum-collected). */
  def copiedFiles(spark: SparkSession, root: String): Set[String] =
    versions(spark, root).flatMap(v =>
      manifestHeaderAll(spark, root, v, "copied")
        .map(URLDecoder.decode(_, UTF_8))).toSet

  /** `COPY INTO` — idempotent bulk file ingest (the Delta/Databricks
    * statement): list the data files under `source`, skip every file a
    * previous COPY already loaded (the `#copied` ledger), read only
    * the new ones, and append their rows as one atomic commit that
    * also records those file names. Re-running after new files arrive
    * loads exactly the delta; re-running with nothing new is a no-op
    * — the retryable-ingest contract pipelines want when a scheduler
    * may fire twice.
    *
    * Files are identified by qualified path; an upstream that
    * REWRITES a file in place under the same name is out of contract
    * (same as Delta's COPY INTO without FORCE). Listing is a driver
    * metadata walk bounded by the source directory; the read/append
    * is fully distributed. Returns (version, filesLoaded) — version
    * is the unchanged current version when no new files exist. */
  def copyInto(spark: SparkSession, root: String, source: String,
               format: String = "parquet",
               partitionCol: Option[String] = None): (Long, Int) = {
    val src = new Path(source)
    // The SOURCE's own FileSystem, not the table root's: COPY INTO
    // across schemes (staging on file:/, table on s3a://) must list
    // with the right connector or Hadoop rejects the path outright.
    val f = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.exists(src), s"COPY INTO source $source does not exist")
    def walk(p: Path): Seq[Path] =
      f.listStatus(p).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (s.isDirectory) walk(s.getPath)
        else Seq(s.getPath)
      }
    val listed = walk(src).map(f.makeQualified(_).toString).sorted
    // Retry loop with the ledger RE-READ per attempt: a concurrent
    // COPY of the same source must not double-load — the loser of the
    // manifest race re-lists and skips whatever the winner recorded.
    // (A blind appendCommit retry would replay the stale file list.)
    var attempt = 0
    while (attempt < 10) {
      val cur = currentVersion(spark, root)
      val already = if (cur.isDefined) copiedFiles(spark, root)
        else Set.empty[String]
      val fresh = listed.filterNot(already)
      if (fresh.isEmpty) return (cur.getOrElse(
        throw new IllegalStateException(
          s"COPY INTO found no data files under $source and no existing " +
            s"table under $root")), 0)
      val partCols = ColSpec.parse(
        cur.flatMap(v => partitionColumn(spark, root, v))
          .orElse(partitionCol).getOrElse(throw new IllegalStateException(
            s"COPY INTO a new table needs an explicit partition column " +
              s"(no existing manifest under $root records one)")))
      val df = spark.read.format(format).load(fresh: _*)
      partCols.cols.foreach(c => require(df.columns.contains(c),
        s"COPY INTO source files lack the table's partition column '$c'"))
      val headers = fresh.map(p => s"#copied\t${URLEncoder.encode(p, UTF_8)}")
      try return (appendCommit(spark, df, root, partCols, maxAttempts = 1,
        operation = "copy", extraHeaders = headers), fresh.size)
      catch { case _: java.util.ConcurrentModificationException => attempt += 1 }
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the copy-into race 10 times under $root")
  }

  /** K1 keyed merge as an atomic snapshot commit: last writer wins per
    * `keyCol` ordered by `versionCol` (Upsert.merge semantics), but
    * only partitions present in `incoming` are rewritten — every other
    * partition's files are carried into the new manifest by reference.
    * A crash anywhere leaves the previous snapshot fully readable.
    *
    * Optimistic concurrency with a DISJOINT-WRITER fast path: losing
    * the manifest rename means another writer committed first. When
    * every version committed since our base changed only partitions
    * DISJOINT from this merge's, the loser REBASES — it adopts the
    * winner's manifest for everything it didn't touch and republishes
    * its already-written data files at the next number, paying one
    * manifest write instead of a full merge recompute. Writers to
    * disjoint partitions therefore contend only on the version number
    * (Delta's partition-level conflict resolution). Only a TRUE
    * conflict — an intervening commit into one of our touched
    * partitions — recomputes the entire merge against the winner's
    * snapshot (a same-partition loser must merge on top of the
    * winner's rows). Lost attempts' data files become orphans that
    * [[vacuum]] collects. Returns the committed version. */
  def mergeCommit(spark: SparkSession, incoming: DataFrame, root: String,
                  keys: ColSpec, versionCol: String, partitionCols: ColSpec,
                  maxAttempts: Int = 10): Long =
    mergeCommitOrdered(spark, incoming, root, keys,
      Seq(col(versionCol).desc_nulls_last), partitionCols, maxAttempts)

  /** [[mergeCommit]] with an explicit win order instead of a version
    * column. `orderBy` ranks rows per key (highest priority first);
    * after it, incoming beats existing (`Upsert.merge`'s source
    * tie-break). An EMPTY `orderBy` therefore means "incoming rows
    * always replace existing rows for their key" — exactly SQL
    * `MERGE INTO … WHEN MATCHED THEN UPDATE SET *` semantics, where
    * the source is authoritative and no version comparison exists.
    * Callers passing empty `orderBy` must ensure the incoming batch
    * has unique keys (SQL MERGE's own precondition): with no ordering,
    * two incoming rows for one key would race nondeterministically. */
  def mergeCommitOrdered(spark: SparkSession, incoming: DataFrame, root: String,
                         keys: ColSpec, orderBy: Seq[Column], partitionCols: ColSpec,
                         maxAttempts: Int = 10): Long = {
    require(keys.nonEmpty, "mergeCommit needs at least one key column")
    require(partitionCols.nonEmpty, "mergeCommit needs a partition spec")
    // Touched partitions: one small distinct-collect (bounded by the
    // partition cardinality of the incoming batch, e.g. suppliers),
    // computed ONCE — it depends only on `incoming`. NULL partition
    // values land on disk (and in the manifest) under Hive's
    // default-partition sentinel — and so do EMPTY STRINGS — so both
    // must normalize to it here too; otherwise rows with those keys
    // are both carried as "kept" AND re-merged, duplicating them on
    // every commit.
    val touched = incoming
      .select(partValueColumn(partitionCols.cols))
      .distinct().collect().map(_.getString(0)).toSet
    enforceConstraints(spark, root, incoming)
    enforceSchemaCompatible(spark, root, incoming)
    var attempt = 0
    while (attempt < maxAttempts) {
      val (kept, merged, v) = currentVersion(spark, root) match {
        case None => (Seq.empty[ManifestEntry], incoming, 1L)
        case Some(cur) =>
          val entries = manifest(spark, root, cur)
          val (replaced, keptEntries) = entries.partition(e => touched(e.partition))
          // No checkpoint needed: data files are append-only, so reading
          // the replaced files while writing the new version's files
          // cannot race (unlike overwrite-in-place sinks).
          // Existing rows surface LOGICALLY (column mapping applied)
          // so the key/order comparison and the union see one naming;
          // writeDataFiles translates back to physical names at write.
          val m = if (replaced.isEmpty) incoming
            else Upsert.merge(
              applyColumnMapping(readEntriesAt(spark, root, replaced, cur),
                mappingAt(spark, root, cur)),
              incoming, keys.cols, orderBy)
          (keptEntries, m, cur + 1)
      }
      val newEntries = writeDataFiles(spark, merged, root, v, partitionCols.cols)
      // Publish loop: on a lost race, rebase while the interlopers are
      // partition-disjoint (data files are version-stamped by path, so
      // files written for attempt version v publish unchanged under any
      // later manifest number). Bounded by maxAttempts like the outer
      // recompute loop.
      var carried = kept
      var publishV = v
      var rebasing = true
      var rebases = 0
      while (rebasing) {
        if (writeManifest(spark, root, publishV, carried ++ newEntries, "merge",
            partitionCols.header)) {
          writeStats(spark, root, publishV, carried, newEntries, Some(merged.schema))
          return publishV
        }
        val head = currentVersion(spark, root).getOrElse(0L)
        // Which partitions did the interloping commits change since the
        // snapshot this merge was computed against? (base = v-1; a
        // first-commit loser has no base — every head partition counts.)
        // A concurrent vacuum may have dropped the base manifest (v-1)
        // or an intervening one out from under the diff; a missing
        // manifest is then indistinguishable from a true conflict, so
        // degrade to the outer full-recompute path instead of failing
        // the writer with a raw FileNotFoundException.
        val interloperParts: Option[Set[String]] =
          try Some {
            if (v - 1 >= 1 && head >= v)
              changedPartitions(spark, root, v - 1, head).toSet
            else if (head >= 1) manifest(spark, root, head).map(_.partition).toSet
            else Set.empty[String]
          } catch { case _: java.io.FileNotFoundException => None }
        rebases += 1
        if (head >= publishV && rebases <= maxAttempts &&
            interloperParts.exists(parts => !parts.exists(touched))) {
          // Disjoint: our touched partitions are byte-identical between
          // base and head, so head-minus-touched plus our files IS the
          // sequential result. One manifest write, zero data movement.
          carried = manifest(spark, root, head).filterNot(e => touched(e.partition))
          publishV = head + 1
        } else rebasing = false // true conflict → full recompute
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the merge-commit race $maxAttempts times under $root")
  }

  /** One ATOMIC commit applying keyed upserts AND keyed deletes — the
    * execution primitive behind a SQL `MERGE INTO` whose WHEN MATCHED
    * clauses mix UPDATE and DELETE (Delta's canonical CDC-apply
    * statement): a reader sees either the pre-merge snapshot or the
    * fully-applied one, never the upserted-but-not-yet-deleted middle
    * that chaining [[mergeCommitOrdered]] + [[deleteCommit]] would
    * expose. Partitions touched by neither the upserts' values nor a
    * doomed key (probed with a column-pruned semi-join) carry by
    * reference. `upserts` follows [[mergeCommitOrdered]]'s empty-order
    * contract (source-authoritative, unique keys); a key in both
    * `upserts` and `deleteKeys` upserts (existing rows drop first,
    * then the merge applies — MERGE's per-row single-action contract
    * means callers never produce that shape). Returns the committed
    * version — unchanged when both legs are empty no-ops. */
  def upsertDeleteCommit(spark: SparkSession, root: String,
                         upserts: DataFrame, deleteKeys: Option[DataFrame],
                         keys: ColSpec, partitionCols: ColSpec,
                         maxAttempts: Int = 10,
                         properties: Option[Seq[(String, String)]] = None): Long = {
    require(keys.nonEmpty, "upsertDeleteCommit needs at least one key column")
    require(partitionCols.nonEmpty, "upsertDeleteCommit needs a partition spec")
    enforceConstraints(spark, root, upserts)
    enforceSchemaCompatible(spark, root, upserts)
    val upTouched = upserts.select(partValueColumn(partitionCols.cols))
      .distinct().collect().map(_.getString(0)).toSet
    val doomed = deleteKeys.map(_.select(keys.cols.map(col): _*).distinct())
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val entries = manifest(spark, root, cur)
      // Small delete-key sets prune the probe scan file-by-file via
      // the stats/bloom sidecars (see [[probeCandidateEntries]]).
      val delTouched: Set[String] = doomed.map { d =>
        val candidates = probeCandidateEntries(spark, root, cur, entries,
          d, keys.cols)
        if (candidates.isEmpty) Set.empty[String]
        else applyColumnMapping(readEntriesAt(spark, root, candidates, cur),
            mappingAt(spark, root, cur))
          .select((keys.cols ++
            partitionCols.cols.filterNot(keys.contains)).map(col): _*)
          .join(d, keys.cols, "left_semi")
          .select(partValueColumn(partitionCols.cols)).distinct()
          .collect().map(_.getString(0)).toSet
      }.getOrElse(Set.empty)
      val touched = upTouched ++ delTouched
      val (replaced, kept) = entries.partition(e => touched(e.partition))
      if (replaced.isEmpty && upTouched.isEmpty) return cur
      // `replaced` may be EMPTY with upserts into brand-new partitions
      // — reading a zero-entry file set is an error, not an empty
      // frame, so the existing side only materializes when needed.
      val merged =
        if (replaced.isEmpty) upserts
        else {
          val existing = applyColumnMapping(readEntriesAt(spark, root, replaced, cur),
            mappingAt(spark, root, cur))
          val survivors = doomed match {
            case Some(d) => existing.join(d, keys.cols, "left_anti")
            case None => existing
          }
          Upsert.merge(survivors, upserts, keys.cols, Nil)
        }
      val v = cur + 1
      val newEntries = writeDataFiles(spark, merged, root, v, partitionCols.cols)
      if (writeManifest(spark, root, v, kept ++ newEntries, "merge",
          partitionCols.header, properties = properties)) {
        writeStats(spark, root, v, kept, newEntries, Some(merged.schema))
        return v
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the merge race $maxAttempts times under $root")
  }

  /** Loud type-compatibility gate for batches entering a table whose
    * recorded schema already carries their columns: a common column
    * must arrive with the SAME type or a safe [[widen]] partner —
    * narrower batches are widened by the union on write, wider
    * batches widen the RECORDED type (carried files keep reading via
    * the parquet widening conversions). Anything else (string↔int, a
    * restructured struct, array element flips) previously recorded
    * the new type and broke the CARRIED files' reads at some later
    * scan — failing the commit here names the column instead.
    * Reference anchor: the Pydantic coercion boundary,
    * unified_product_schema.py:145-207. */
  private def enforceSchemaCompatible(spark: SparkSession, root: String,
                                      df: DataFrame): Unit =
    currentVersion(spark, root).foreach { cur =>
      schemaFor(spark, root, cur).foreach { prior =>
        val renames = mappingAt(spark, root, cur)._1
        val priorTypes = prior.fields.map(f => f.name -> f.dataType).toMap
        df.schema.fields.foreach { f =>
          priorTypes.get(renames.getOrElse(f.name, f.name)).foreach { pt =>
            require(widen(pt, f.dataType).isDefined,
              s"column '${f.name}' arrives as ${f.dataType.simpleString} " +
                s"but the table records ${pt.simpleString}; only safe " +
                "widenings (byte→short→int→long, float→double) evolve " +
                "implicitly — cast the batch explicitly")
          }
        }
      }
    }

  /** Keys below this count are collected to the driver and used to
    * prune the partition-probe scan file-by-file
    * ([[probeCandidateEntries]]); above it the probe scans the
    * column-pruned table as before. 0 disables pruning. */
  private def probeKeyLimit(spark: SparkSession): Int =
    try spark.conf.get("spark.graft.probeKeyLimit", "1000").toInt
    catch { case _: NumberFormatException => 1000 }

  /** Observability for specs/SCALE: file count the most recent keyed
    * probe actually scanned, or -1 when pruning didn't engage (large
    * key set, undecidable types, disabled). Last-writer-wins; never an
    * input to planning. */
  private[graft] val lastProbeCandidates =
    new java.util.concurrent.atomic.AtomicInteger(-1)

  /** Files of `entries` that MAY hold one of `doomed`'s keys, decided
    * from the stats/bloom sidecars when the key set is SMALL — Delta's
    * MERGE file-pruning shape, and the snapshot analog of the
    * reference's indexed `delete_many({_id: {$in: […]}})`
    * (mongodb_loader.py:226-245), which is a point operation, not a
    * collection scan. A 3-key GDPR delete on a 100 TB table probes the
    * few bloom-candidate files instead of every file's key column.
    *
    * One `limit(K+1)` collect decides applicability: a larger set, a
    * key type the stats can't order exactly, or a missing sidecar
    * falls back to the full `entries` (mayMatch=false PROVES absence,
    * so pruning is conservative-correct; anything undecidable keeps
    * the file). Composite keys prune on the FIRST key column alone —
    * also conservative. Null keys match nothing by the keyed-delete
    * contract and are dropped before pruning. */
  private def probeCandidateEntries(spark: SparkSession, root: String,
                                    cur: Long, entries: Seq[ManifestEntry],
                                    doomed: DataFrame,
                                    keyCols: Seq[String]): Seq[ManifestEntry] = {
    val limit = probeKeyLimit(spark)
    if (limit <= 0) { lastProbeCandidates.set(-1); return entries }
    val head = try doomed.select(col(keyCols.head)).limit(limit + 1).collect()
               catch { case scala.util.control.NonFatal(_) =>
                 lastProbeCandidates.set(-1); return entries }
    if (head.length > limit) { lastProbeCandidates.set(-1); return entries }
    val nonNull = head.iterator.map(_.get(0)).filter(_ != null).toArray
    val values: Array[Any] = nonNull.collect {
      case v @ (_: String | _: Byte | _: Short | _: Int | _: Long |
                _: Float | _: Double) => v
      case d: java.math.BigDecimal => d
    }
    // Any key value outside the stats-decidable types means absence
    // can't be certified for it anywhere — scan the full set.
    if (values.length != nonNull.length) {
      lastProbeCandidates.set(-1); return entries
    }
    if (values.isEmpty) { lastProbeCandidates.set(0); return Nil }
    // Stats/blooms are keyed by PHYSICAL column names.
    val statsName = mappingAt(spark, root, cur)._1
      .getOrElse(keyCols.head, keyCols.head)
    val filter = org.apache.spark.sql.sources.In(statsName, values)
    val stats = statsFor(spark, root, cur)
    val blooms = bloomFor(spark, root, cur)
    val kept = entries.filter { e =>
      stats.get(e.path).forall(FileStats.mayMatch(_, filter)) &&
        blooms.get(e.path).forall(FileStats.mayMatchBloom(_, filter))
    }
    lastProbeCandidates.set(kept.size)
    kept
  }

  /** K3's keyed delete (`mongodb_loader.py:218-231`'s `delete_many`
    * by key list) as an atomic snapshot commit: every row of the
    * current snapshot whose `keyCol` appears in `keys` is removed in
    * one new version. Only partitions that ACTUALLY hold a doomed key
    * are rewritten — found by a column-pruned (key, partition)
    * semi-join probe of the current snapshot — and every other
    * partition's files are carried by reference, exactly like
    * [[mergeCommit]]. A partition whose rows are all deleted
    * disappears from the manifest; deleting the LAST row leaves a
    * valid empty snapshot (schema carried by the stats sidecar).
    *
    * When `keys` carries the partition column, the probe scan is
    * PRUNED to those partitions (manifest-level — unrelated
    * partitions are never listed), making delete cost ∝ the hinted
    * partitions instead of one table-wide two-column scan. The hint
    * is a scope, not a trust: within it the probe still decides
    * which partitions rewrite, so a hinted partition with no doomed
    * rows is NOT pointlessly rewritten — but a doomed key living
    * OUTSIDE the hinted partitions is out of scope and survives, by
    * contract (same co-location contract as mergeCommit's partition
    * routing; omit the column to delete table-wide).
    *
    * Null keys in `keys` match nothing (anti-join semantics), so a
    * sloppy key list cannot mass-delete null-keyed rows. Returns the
    * committed version — or the CURRENT version unchanged when no
    * partition holds any doomed key (an empty delete is a no-op, not
    * an empty commit). */
  def deleteCommit(spark: SparkSession, keys: DataFrame, root: String,
                   keyCols: ColSpec, partitionCols: ColSpec,
                   maxAttempts: Int = 10): Long = {
    require(keyCols.nonEmpty, "deleteCommit needs at least one key column")
    require(partitionCols.nonEmpty, "deleteCommit needs a partition spec")
    val doomed = keys.select(keyCols.cols.map(col): _*).distinct()
    // The scope hint needs the WHOLE partition tuple — a partial tuple
    // cannot name a manifest partition, so it scopes nothing.
    val scope: Option[Set[String]] =
      if (!partitionCols.cols.forall(keys.columns.contains)) None
      else Some(keys.select(partValueColumn(partitionCols.cols)).distinct()
        .collect().map(_.getString(0)).toSet)
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val entries = manifest(spark, root, cur)
      // Probe (always): which in-scope partitions actually contain a
      // doomed key. The hint only prunes the probe's scan; a SMALL
      // key set additionally prunes it file-by-file through the
      // stats/bloom sidecars ([[probeCandidateEntries]]), so a
      // point delete probes candidate files, not the table.
      val inScope = scope match {
        case Some(ps) => entries.filter(e => ps(e.partition))
        case None => entries
      }
      val candidates = probeCandidateEntries(spark, root, cur, inScope,
        doomed, keyCols.cols)
      val touched: Set[String] =
        if (candidates.isEmpty) Set.empty
        else applyColumnMapping(readEntriesAt(spark, root, candidates, cur),
            mappingAt(spark, root, cur))
          .select((keyCols.cols ++
            partitionCols.cols.filterNot(keyCols.contains)).map(col): _*)
          .join(doomed, keyCols.cols, "left_semi")
          .select(partValueColumn(partitionCols.cols)).distinct()
          .collect().map(_.getString(0)).toSet
      val (replaced, kept) = entries.partition(e => touched(e.partition))
      if (replaced.isEmpty) return cur
      val remaining = applyColumnMapping(readEntriesAt(spark, root, replaced, cur),
          mappingAt(spark, root, cur))
        .join(doomed, keyCols.cols, "left_anti")
      val v = cur + 1
      val newEntries = writeDataFiles(spark, remaining, root, v, partitionCols.cols)
      if (writeManifest(spark, root, v, kept ++ newEntries, "delete",
          partitionCols.header)) {
        writeStats(spark, root, v, kept, newEntries, Some(remaining.schema))
        return v
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the delete-commit race $maxAttempts times under $root")
  }

  /** `DELETE FROM t WHERE p` as an atomic snapshot commit (Delta's
    * predicate DELETE, the SQL spelling of K4's retention delete):
    * rows where `predicate` is TRUE are removed; FALSE and NULL rows
    * survive (SQL three-valued semantics). Only partitions that
    * actually contain a matching row are rewritten — found by a probe
    * through the file-skipping index ([[table]]), so a predicate over
    * an indexed column opens only candidate files, and the rewrite is
    * bounded by the matching partitions, not the table. A predicate
    * referencing ONLY partition columns short-circuits to a pure
    * METADATA commit ([[partitionOnlyDoomed]]): the doomed partitions'
    * entries leave the manifest, no data file is read or written —
    * `DELETE FROM t WHERE supplier = 'x'` on a 100 TB table is one
    * manifest write. A predicate
    * matching nothing returns the current version unchanged (no empty
    * commit). The table's partition column resolves from the
    * `#partcol` manifest header. */
  /** Column names a predicate references (top-level unresolved
    * attributes; qualified names take their LAST part). None when the
    * expression does not parse — callers then skip any
    * reference-based fast path and let the row-level path surface the
    * real error. */
  private def predicateReferences(spark: SparkSession,
                                  predicate: String): Option[Set[String]] =
    try {
      val e = spark.sessionState.sqlParser.parseExpression(predicate)
      Some(e.collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.last
      }.toSet)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** True when `predicate` parses to a deterministic, subquery-free
    * expression. Determinism is decided on an ANALYZED condition over
    * a dummy frame of the predicate's own references (string-typed;
    * determinism doesn't depend on the types) — unresolved function
    * nodes report `deterministic` vacuously true, so rand() only
    * reveals itself after resolution. Anything that fails to parse or
    * analyze is NOT certified (callers fall back to the row path,
    * whose analysis errors stay loud). */
  private[sinks] def deterministicNoSubquery(spark: SparkSession,
                                             predicate: String): Boolean =
    try {
      val parsed = spark.sessionState.sqlParser.parseExpression(predicate)
      val hasSubquery = parsed.exists {
        case _: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] => true
        case _ => false
      }
      if (hasSubquery) false
      else {
        val refs = parsed.collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.nameParts.last
        }.distinct
        val dummy = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(refs.map(c =>
            org.apache.spark.sql.types.StructField(c,
              org.apache.spark.sql.types.StringType))))
        dummy.filter(expr(predicate)).queryExecution.analyzed.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.deterministic
        }.getOrElse(false)
      }
    } catch { case scala.util.control.NonFatal(_) => false }

  /** When `predicate` references ONLY partition columns, the rows it
    * deletes are exactly the full content of the partitions whose
    * VALUES satisfy it — so the delete is pure metadata: evaluate the
    * predicate against the decoded manifest partition values (typed
    * through the recorded schema; the Hive null-sentinel decodes to
    * real null) and drop those partitions' entries. Returns the
    * doomed partition VALUES, or None when the fast path does not
    * apply (non-partition references, unparseable, or a sentinel
    * partition matched — the sentinel conflates null and empty
    * string, which row-level three-valued logic distinguishes, so
    * those fall back to the rewrite). */
  private[sinks] def partitionOnlyDoomed(spark: SparkSession, root: String,
                                  cur: Long, partCols: Seq[String],
                                  entries: Seq[ManifestEntry],
                                  predicate: String): Option[Set[String]] = {
    val refs = predicateReferences(spark, predicate).getOrElse(return None)
    if (refs.isEmpty ||
        !refs.forall(r => partCols.exists(_.equalsIgnoreCase(r)))) return None
    // Referenced-columns alone don't make the fast path sound: it
    // evaluates the predicate ONCE PER PARTITION VALUE, which only
    // equals row-level filtering when the predicate is deterministic
    // and subquery-free (Delta's precondition for metadata-only
    // DELETE). `supplier = 'a' OR rand() < 0.5` references only
    // partition columns but would drop or keep WHOLE partitions on one
    // coin flip; a subquery's inner references also hide from the
    // expression-level collect above. Determinism is checked on the
    // ANALYZED condition — unresolved function nodes default to
    // deterministic, so the parse tree can't answer it.
    if (!deterministicNoSubquery(spark, predicate)) return None
    val types: Map[String, org.apache.spark.sql.types.DataType] =
      schemaFor(spark, root, cur)
        .map(ph => logicalSchema(ph, mappingAt(spark, root, cur)))
        .map(_.fields.map(f => f.name -> f.dataType).toMap)
        .getOrElse(Map.empty)
    val parts = entries.map(_.partition).distinct
    val rows = parts.map(pv => org.apache.spark.sql.Row.fromSeq(
      pv +: decodePartValue(pv, partCols.size)
        .map(v => if (v == HiveDefaultPartition) null else v)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__graft_part_value",
          org.apache.spark.sql.types.StringType) +:
        partCols.map(c => org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType))))
    val typed = df.select(col("__graft_part_value") +:
      partCols.map(c => types.get(c)
        .map(t => col(c).cast(t).as(c)).getOrElse(col(c))): _*)
    val doomed = typed.filter(coalesce(expr(predicate), lit(false)))
      .select("__graft_part_value").collect().map(_.getString(0)).toSet
    if (doomed.exists(decodePartValue(_, partCols.size)
        .contains(HiveDefaultPartition))) None
    else Some(doomed)
  }

  def deleteWhere(spark: SparkSession, root: String, predicate: String,
                  maxAttempts: Int = 10): Long = {
    val hit = coalesce(expr(predicate), lit(false))
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val partCols = requirePartitionCols(spark, root, cur)
      val entries = manifest(spark, root, cur)
      // Partition-predicate fast path: `DELETE FROM t WHERE
      // supplier = 'x'` drops whole partitions with ONE manifest
      // write — zero data files read or written, at any table size. A
      // lost manifest race falls through to the next loop iteration
      // (which re-reads the manifest and re-decides).
      partitionOnlyDoomed(spark, root, cur, partCols, entries,
          predicate) match {
        case Some(doomed) =>
          if (doomed.isEmpty) return cur
          val kept = entries.filterNot(e => doomed(e.partition))
          if (writeManifest(spark, root, cur + 1, kept, "delete",
              partCols.mkString(","))) {
            writeStats(spark, root, cur + 1, kept, Nil, None)
            return cur + 1
          }
          attempt += 1
        case None =>
          val touched: Set[String] = table(spark, root, Some(cur))
            .filter(hit).select(partValueColumn(partCols)).distinct()
            .collect().map(_.getString(0)).toSet
          val (replaced, kept) = entries.partition(e => touched(e.partition))
          if (replaced.isEmpty) return cur
          val remaining = applyColumnMapping(readEntriesAt(spark, root, replaced, cur),
            mappingAt(spark, root, cur)).filter(!hit)
          val v = cur + 1
          val newEntries = writeDataFiles(spark, remaining, root, v, partCols)
          if (writeManifest(spark, root, v, kept ++ newEntries, "delete",
              partCols.mkString(","))) {
            writeStats(spark, root, v, kept, newEntries, Some(remaining.schema))
            return v
          }
          attempt += 1
      }
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the delete-where race $maxAttempts times under $root")
  }

  /** `TRUNCATE TABLE t` — remove every row as ONE metadata commit:
    * the new manifest lists no files (they stay on disk for time
    * travel until vacuumed), the recorded schema carries via the
    * stats sidecar, so the empty table stays readable and writable.
    * The partition-only delete's cost model applied to the whole
    * table. Returns the new version (the current one when already
    * empty). */
  def truncate(spark: SparkSession, root: String, maxAttempts: Int = 5): Long = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val partCols = requirePartitionCols(spark, root, cur)
      if (manifest(spark, root, cur).isEmpty) return cur
      if (writeManifest(spark, root, cur + 1, Nil, "delete",
          partCols.mkString(","))) {
        writeStats(spark, root, cur + 1, Nil, Nil, None)
        return cur + 1
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the truncate race $maxAttempts times under $root")
  }

  /** [[deleteWhere]] in MERGE-ON-READ form — Delta's deletion vectors:
    * instead of rewriting every partition holding a match, the commit
    * writes a small parquet of (file key, row position) pairs and
    * attaches it to the affected files' manifest entries; readers drop
    * those positions via a broadcast anti-join ([[applyDvs]]). Delete
    * cost becomes ∝ MATCHED ROWS, not matched partitions — the
    * production delete path for sparse deletes (GDPR erasure, spot
    * corrections) on a 100 TB table, where rewriting a partition to
    * remove three rows is absurd. The probe runs through the
    * file-skipping index, so a selective predicate opens only
    * candidate files.
    *
    * Positions are ORIGINAL file positions, so a second delete on an
    * already-vectored file unions with its existing DV (computed
    * against the raw scan — re-marking an already-deleted row is
    * idempotent by set union). A predicate matching no LIVE row is a
    * no-op returning the current version. Read amplification is
    * bounded by [[purgeDeletionVectors]], which rewrites vectored
    * files and drops their DVs (Delta's `REORG … APPLY (PURGE)`). */
  def deleteWhereDv(spark: SparkSession, root: String, predicate: String,
                    maxAttempts: Int = 10): Long = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val partCols = requirePartitionCols(spark, root, cur)
      val entries = manifest(spark, root, cur)
      if (entries.isEmpty) return cur
      // A partition-only predicate drops whole partitions as METADATA
      // even in DV mode (Delta's behavior: deletion vectors are for
      // sparse deletes; a full-partition match removes the files) —
      // writing position lists covering every row of a partition
      // would maximize read amplification for no write saving.
      partitionOnlyDoomed(spark, root, cur, partCols, entries,
          predicate) match {
        case Some(doomed) =>
          if (doomed.isEmpty) return cur
          val kept = entries.filterNot(e => doomed(e.partition))
          if (writeManifest(spark, root, cur + 1, kept, "delete",
              partCols.mkString(","))) {
            writeStats(spark, root, cur + 1, kept, Nil, None)
            return cur + 1
          }
          attempt += 1
        case None =>
          return deleteWhereDvRows(spark, root, predicate,
            maxAttempts - attempt)
      }
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the delete-dv race $maxAttempts times under $root")
  }

  /** [[deleteWhereDv]]'s row-level leg (position-list commit). */
  private def deleteWhereDvRows(spark: SparkSession, root: String,
                                predicate: String,
                                maxAttempts: Int): Long = {
    val hit = coalesce(expr(predicate), lit(false))
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val partCols = requirePartitionCols(spark, root, cur)
      val entries = manifest(spark, root, cur)
      if (entries.isEmpty) return cur
      // Doomed positions over the RAW skipping-indexed scan (not
      // DV-applied): union semantics below make re-marking an
      // already-deleted position harmless, and the raw scan keeps the
      // probe one pass with no join under it.
      val (raw, _) = {
        val (rel, idx, _) = relationWithIndex(spark, root, Some(cur), None)
        (spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          .baseRelationToDataFrame(rel), idx)
      }
      // Row identity (_metadata) materializes FIRST — hidden columns
      // only resolve against the scan frame — then the column mapping
      // presents logical names so the user's predicate resolves.
      val doomed = applyColumnMapping(raw
          .withColumn("__graft_fk", dvKeyExpr(col("_metadata.file_path")))
          .withColumn("__graft_pos", col("_metadata.row_index")),
          mappingAt(spark, root, cur))
        .select(col("__graft_fk").as("file_key"),
          col("__graft_pos").as("pos"), hit.as("__hit"))
        .filter(col("__hit")).drop("__hit")
      val existing = dvRowsFor(spark, root, entries)
      // Fresh = positions not already deleted; an all-stale match set
      // (or no match at all) is a no-op, not an empty commit.
      val fresh = existing.map(e =>
        doomed.join(e, Seq("file_key", "pos"), "left_anti")).getOrElse(doomed)
      val newDv = existing.map(e => {
        val affected = fresh.select("file_key").distinct()
        // The new DV dir must hold each affected file's COMPLETE set:
        // carried prior positions ∪ fresh ones.
        fresh.unionByName(e.join(affected, Seq("file_key"), "left_semi"))
      }).getOrElse(fresh).persist()
      try {
        val counts: Map[String, Long] = newDv.groupBy("file_key").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        if (counts.isEmpty) return cur
        val dvDir = s"dv/v_${cur + 1}-${java.util.UUID.randomUUID().toString.take(8)}"
        writeDvDir(spark, root, dvDir, newDv, counts.values.sum)
        val newEntries = entries.map { e =>
          val fn = dvKeyOf(e.path)
          if (counts.contains(fn)) e.copy(dv = dvDir, dvRows = counts(fn)) else e
        }
        val v = cur + 1
        if (writeManifest(spark, root, v, newEntries, "delete-dv",
            partCols.mkString(","))) {
          writeStats(spark, root, v, newEntries, Nil, None)
          return v
        }
      } finally newDv.unpersist()
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the delete-dv race $maxAttempts times under $root")
  }

  /** [[updateWhere]] in MERGE-ON-READ form (Delta's DV-backed UPDATE):
    * matched LIVE rows are deletion-vectored in their original files
    * and their updated copies land as NEW files — one atomic commit,
    * cost ∝ MATCHED ROWS (probe + small position list + a write of
    * just the updated rows), never the matched partitions. Assignments
    * evaluate against the OLD row and cast back to existing types,
    * exactly like [[updateWhere]]; updating the partition column moves
    * the new copies to their new partitions. Unlike delete's
    * idempotent re-marking, an already-deleted row must NOT spawn an
    * updated copy, so the matched set is anti-joined against the
    * existing DV positions first. A predicate matching no live row is
    * a no-op. */
  def updateWhereDv(spark: SparkSession, root: String,
                    assignments: Seq[(String, String)],
                    predicate: Option[String],
                    maxAttempts: Int = 10): Long = {
    require(assignments.nonEmpty, "UPDATE needs at least one SET assignment")
    require(assignments.map(_._1).distinct.size == assignments.size,
      s"UPDATE assigns a column twice: ${assignments.map(_._1).mkString(", ")}")
    val hit = coalesce(predicate.map(expr).getOrElse(lit(true)), lit(false))
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val partCols = requirePartitionCols(spark, root, cur)
      val entries = manifest(spark, root, cur)
      if (entries.isEmpty) return cur
      val rawRel = {
        val (rel, _, _) = relationWithIndex(spark, root, Some(cur), None)
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          .baseRelationToDataFrame(rel)
      }
      // _metadata first, then the mapping — same order as deleteWhereDv
      // — so assignments and predicate see LOGICAL columns.
      val raw = applyColumnMapping(rawRel
          .withColumn("__fk", dvKeyExpr(col("_metadata.file_path")))
          .withColumn("__pos", col("_metadata.row_index")),
        mappingAt(spark, root, cur))
      val dataCols = raw.columns.toSeq.filterNot(Set("__fk", "__pos"))
      val types = raw.schema.map(f => f.name -> f.dataType).toMap
      assignments.foreach { case (c, _) => require(types.contains(c) &&
        c != "__fk" && c != "__pos",
        s"UPDATE SET targets unknown column '$c' " +
          s"(columns: ${dataCols.mkString(", ")})") }
      val matched = raw.filter(hit)
      val existing = dvRowsFor(spark, root, entries)
      val live = existing.map(e => matched.join(
          e.select(col("file_key").as("__fk"), col("pos").as("__pos")),
          Seq("__fk", "__pos"), "left_anti")).getOrElse(matched)
        .persist()
      try {
        val fresh = live.select(col("__fk").as("file_key"),
          col("__pos").as("pos"))
        val newDv = existing.map(e => {
          val affected = fresh.select("file_key").distinct()
          fresh.unionByName(e.join(affected, Seq("file_key"), "left_semi"))
        }).getOrElse(fresh)
        val counts: Map[String, Long] = newDv.groupBy("file_key").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        if (counts.isEmpty) return cur
        // Updated copies: assignments against the OLD row (all rows
        // here match by construction), cast back to existing types.
        val assign = assignments.toMap
        val updated = live.select(dataCols.map { c =>
          assign.get(c) match {
            case Some(e) => expr(e).cast(types(c)).as(c)
            case None => col(c)
          }
        }: _*)
        enforceConstraints(spark, root, updated)
        val v = cur + 1
        val dvDir = s"dv/v_$v-${java.util.UUID.randomUUID().toString.take(8)}"
        writeDvDir(spark, root, dvDir, newDv, counts.values.sum)
        val carried = entries.map { e =>
          val fn = dvKeyOf(e.path)
          if (counts.contains(fn)) e.copy(dv = dvDir, dvRows = counts(fn)) else e
        }
        val newEntries = writeDataFiles(spark, updated, root, v, partCols)
        if (writeManifest(spark, root, v, carried ++ newEntries, "update-dv",
            partCols.mkString(","))) {
          writeStats(spark, root, v, carried, newEntries, Some(updated.schema))
          return v
        }
      } finally live.unpersist()
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the update-dv race $maxAttempts times under $root")
  }

  /** Rewrite every file carrying a deletion vector (materializing its
    * deletes) and drop the DVs — Delta's `REORG TABLE … APPLY (PURGE)`.
    * Bounds DV read amplification after a burst of merge-on-read
    * deletes; cost ∝ the VECTORED files only, never the table. Content
    * is unchanged by construction (the rewrite reads through the DVs),
    * so like compaction this skips constraint re-proof. Returns the
    * new version, or the current one when no file carries a DV. */
  def purgeDeletionVectors(spark: SparkSession, root: String,
                           maxAttempts: Int = 5): Long = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val partCols = requirePartitionCols(spark, root, cur)
      val entries = manifest(spark, root, cur)
      val (replaced, kept) = entries.partition(_.dv.nonEmpty)
      if (replaced.isEmpty) return cur
      val materialized = readEntriesAt(spark, root, replaced, cur) // DV-aware
      val v = cur + 1
      // Physical rewrite (see compact): no translation, physical names.
      val newEntries = writeDataFiles(spark, materialized, root, v,
        partCols.map(physicalNameOf(mappingAt(spark, root, cur)._1, _)),
        translate = false)
      if (writeManifest(spark, root, v, kept ++ newEntries, "purge",
          partCols.mkString(","))) {
        writeStats(spark, root, v, kept, newEntries, None)
        return v
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the purge race $maxAttempts times under $root")
  }

  /** `UPDATE t SET c = e, … [WHERE p]` as an atomic snapshot commit
    * (Delta's UPDATE): in every row where `predicate` is TRUE (all
    * rows when None), each assigned column is replaced by its
    * expression evaluated against the OLD row — all assignments see
    * pre-update values, standard SQL UPDATE semantics — and cast back
    * to the column's existing type, so the schema never drifts.
    * Assignments must target existing columns (UPDATE cannot add
    * columns; that is merge-side schema evolution's job).
    *
    * Same partition-bounded rewrite shape as [[deleteWhere]]: the
    * probe finds partitions holding a matching row, only those
    * rewrite, the rest carry by reference. Updating the PARTITION
    * column is allowed — rewritten rows land in their new partitions
    * (files group by value at write) — and updating a key column is
    * the caller's contract to keep unique, exactly as in Delta. */
  def updateWhere(spark: SparkSession, root: String,
                  assignments: Seq[(String, String)],
                  predicate: Option[String],
                  maxAttempts: Int = 10): Long = {
    require(assignments.nonEmpty, "UPDATE needs at least one SET assignment")
    require(assignments.map(_._1).distinct.size == assignments.size,
      s"UPDATE assigns a column twice: ${assignments.map(_._1).mkString(", ")}")
    val hit = coalesce(predicate.map(expr).getOrElse(lit(true)), lit(false))
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val partCols = requirePartitionCols(spark, root, cur)
      val entries = manifest(spark, root, cur)
      val touched: Set[String] = table(spark, root, Some(cur))
        .filter(hit).select(partValueColumn(partCols)).distinct()
        .collect().map(_.getString(0)).toSet
      val (replaced, kept) = entries.partition(e => touched(e.partition))
      if (replaced.isEmpty) return cur
      // Align the replaced files to the RECORDED table schema: after a
      // schema evolution, a matched partition's files may predate an
      // evolved column — UPDATE must still be able to SET it (it reads
      // as typed nulls, exactly like any scan). Both the frame and the
      // recorded schema pass through the column mapping first, so the
      // alignment (and the user's assignments) see LOGICAL names.
      val mapping = mappingAt(spark, root, cur)
      val raw = applyColumnMapping(readEntriesAt(spark, root, replaced, cur), mapping)
      val current = schemaFor(spark, root, cur).map(logicalSchema(_, mapping)) match {
        case Some(sc) =>
          val have = raw.columns.toSet
          val widened = sc.fields.filterNot(f => have(f.name))
            .foldLeft(raw)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
          widened.select(widened.columns.toSeq.map(col): _*)
        case None => raw
      }
      val types = current.schema.map(f => f.name -> f.dataType).toMap
      assignments.foreach { case (c, _) => require(types.contains(c),
        s"UPDATE SET targets unknown column '$c' " +
          s"(columns: ${current.columns.mkString(", ")})") }
      val assign = assignments.toMap
      val updated = current.select(current.columns.toSeq.map { c =>
        assign.get(c) match {
          case Some(e) =>
            when(hit, expr(e).cast(types(c))).otherwise(col(c)).as(c)
          case None => col(c)
        }
      }: _*)
      enforceConstraints(spark, root, updated)
      val v = cur + 1
      val newEntries = writeDataFiles(spark, updated, root, v, partCols)
      if (writeManifest(spark, root, v, kept ++ newEntries, "update",
          partCols.mkString(","))) {
        writeStats(spark, root, v, kept, newEntries, Some(updated.schema))
        return v
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the update-where race $maxAttempts times under $root")
  }

  /** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` (Delta's CHECK
    * constraint): validate the CURRENT data satisfies the expression
    * (one pushdown/skipping-friendly limit-1 probe — rows where it is
    * FALSE violate; NULL passes, SQL CHECK semantics), then publish a
    * metadata-only commit whose manifest records the constraint. From
    * then on EVERY write path (commit / merge / append / update /
    * writer / COPY INTO) probes its batch and fails loudly before
    * writing a violating row; layout-only rewrites skip the re-proof.
    * Returns the committed version. */
  def addConstraint(spark: SparkSession, root: String, name: String,
                    checkExpr: String, maxAttempts: Int = 5): Long = {
    require(name.matches("[A-Za-z_][\\w$]*"),
      s"constraint name must be an identifier, got '$name'")
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val existing = tableConstraints(spark, root, cur)
      require(!existing.exists(_._1 == name),
        s"constraint '$name' already exists on $root")
      val bad = table(spark, root, Some(cur))
        .filter(!coalesce(expr(checkExpr), lit(true))).limit(1).collect()
      if (bad.nonEmpty) throw new IllegalStateException(
        s"cannot add CHECK constraint $name ($checkExpr): existing row " +
          s"violates it: ${bad.head}")
      val entries = manifest(spark, root, cur)
      if (writeManifest(spark, root, cur + 1, entries, "constraint",
          partitionColumn(spark, root, cur).getOrElse(""),
          constraints = Some(existing :+ (name -> checkExpr)))) {
        writeStats(spark, root, cur + 1, entries, Nil, schemaFor(spark, root, cur))
        return cur + 1
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the add-constraint race $maxAttempts times under $root")
  }

  /** `ALTER TABLE t DROP CONSTRAINT name`: metadata-only commit
    * removing the named CHECK constraint. Unknown names fail loudly
    * (silently "dropping" nothing would mask a typo forever). */
  def dropConstraint(spark: SparkSession, root: String, name: String,
                     maxAttempts: Int = 5): Long = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val existing = tableConstraints(spark, root, cur)
      require(existing.exists(_._1 == name),
        s"no constraint named '$name' on $root " +
          s"(existing: ${existing.map(_._1).mkString(", ")})")
      val entries = manifest(spark, root, cur)
      if (writeManifest(spark, root, cur + 1, entries, "constraint",
          partitionColumn(spark, root, cur).getOrElse(""),
          constraints = Some(existing.filterNot(_._1 == name)))) {
        writeStats(spark, root, cur + 1, entries, Nil, schemaFor(spark, root, cur))
        return cur + 1
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the drop-constraint race $maxAttempts times under $root")
  }

  /** The table's current LOGICAL column names: recorded physical
    * schema (or a footer read as fallback) through the version's
    * column mapping. */
  private def logicalColumns(spark: SparkSession, root: String,
                             cur: Long): Seq[String] = {
    val physical = schemaFor(spark, root, cur).getOrElse(
      readEntries(spark, root, manifest(spark, root, cur)).schema)
    logicalSchema(physical, mappingAt(spark, root, cur)).fieldNames.toSeq
  }

  /** Conservative guard: does any CHECK constraint's expression
    * mention `name` as a word? (May over-match inside string literals
    * — acceptable: the failure mode is a loud refusal, never a broken
    * constraint.) */
  private def constraintMentions(spark: SparkSession, root: String,
                                 cur: Long, name: String): Option[String] =
    tableConstraints(spark, root, cur).collectFirst {
      case (n, e) if ("""(?i)(?<![\w$])""" + java.util.regex.Pattern.quote(name) +
        """(?![\w$])""").r.findFirstIn(e).isDefined => n
    }

  /** `ALTER TABLE t RENAME COLUMN from TO to` — Delta's column-mapping
    * rename: a METADATA-ONLY commit (zero files rewritten; parquet
    * files keep the original "physical" name forever, reads alias it).
    * Renaming the partition column is allowed — the manifest's
    * `#partcol` follows, while directory layout (physical) stays.
    * Refused when a CHECK constraint references the column (Delta's
    * own restriction — the stored expression would silently break) or
    * when the new name collides with a reserved physical name.
    * Returns the new version. */
  def renameColumn(spark: SparkSession, root: String, from: String,
                   to: String, maxAttempts: Int = 5): Long = {
    require(from != to, s"RENAME COLUMN $from TO $from is a no-op")
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val cols = logicalColumns(spark, root, cur)
      require(cols.contains(from),
        s"cannot rename missing column '$from' (columns: ${cols.mkString(", ")})")
      require(!cols.contains(to),
        s"cannot rename '$from' to '$to': column '$to' already exists")
      constraintMentions(spark, root, cur, from).foreach(n =>
        throw new IllegalStateException(
          s"cannot rename column '$from': CHECK constraint $n references " +
            s"it; DROP the constraint first and re-ADD it against the new name"))
      val (renames, dropped) = mappingAt(spark, root, cur)
      val physical = physicalNameOf(renames, from)
      require(!dropped(to),
        s"cannot rename to '$to': that name is reserved by a dropped " +
          "column whose data files still carry it")
      require(!renames.exists { case (lg, ph) => ph == to && lg != from },
        s"cannot rename to '$to': that is another column's physical name")
      // Renaming BACK to the physical name dissolves the mapping entry.
      val newRenames = (renames - from) ++
        (if (to == physical) Map.empty[String, String] else Map(to -> physical))
      val newPartCol = partitionColumn(spark, root, cur) match {
        case Some(p) if p == from => to
        case other => other.getOrElse("")
      }
      val entries = manifest(spark, root, cur)
      if (writeManifest(spark, root, cur + 1, entries, "rename-column",
          newPartCol,
          columnMapping = Some((newRenames.toSeq, dropped.toSeq)))) {
        writeStats(spark, root, cur + 1, entries, Nil, None)
        return cur + 1
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the rename-column race $maxAttempts times under $root")
  }

  /** `ALTER TABLE t DROP COLUMN c` — Delta's column-mapping drop: a
    * METADATA-ONLY commit; the physical column stays in existing files
    * (readers project it away) and naturally disappears as files
    * rewrite. Time travel before the drop still shows the column.
    * Refused for the partition column (the layout keys on it), for
    * constraint-referenced columns, and for the last data column. */
  def dropColumn(spark: SparkSession, root: String, name: String,
                 maxAttempts: Int = 5): Long = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val cols = logicalColumns(spark, root, cur)
      require(cols.contains(name),
        s"cannot drop missing column '$name' (columns: ${cols.mkString(", ")})")
      require(cols.size > 1, s"cannot drop '$name': it is the only column")
      require(!partitionColumn(spark, root, cur).contains(name),
        s"cannot drop partition column '$name'")
      constraintMentions(spark, root, cur, name).foreach(n =>
        throw new IllegalStateException(
          s"cannot drop column '$name': CHECK constraint $n references it; " +
            "DROP the constraint first"))
      val (renames, dropped) = mappingAt(spark, root, cur)
      val physical = physicalNameOf(renames, name)
      val entries = manifest(spark, root, cur)
      if (writeManifest(spark, root, cur + 1, entries, "drop-column",
          partitionColumn(spark, root, cur).getOrElse(""),
          columnMapping = Some(((renames - name).toSeq, (dropped + physical).toSeq)))) {
        writeStats(spark, root, cur + 1, entries, Nil, None)
        return cur + 1
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the drop-column race $maxAttempts times under $root")
  }

  /** `ALTER TABLE t ADD COLUMN c TYPE` — metadata-only schema widening:
    * the recorded schema gains the (nullable) column, existing files
    * read it as typed nulls through the evolution-merged scan, and the
    * next write that carries values materializes them. The same
    * reserved-name collisions as [[toPhysical]] are refused. */
  def addColumn(spark: SparkSession, root: String, name: String,
                dataTypeDdl: String, maxAttempts: Int = 5): Long =
    addColumns(spark, root, Seq(name -> dataTypeDdl), maxAttempts)

  /** [[addColumn]] for a column LIST — `ALTER TABLE … ADD COLUMNS
    * (a INT, b STRING)` — as ONE metadata commit: all columns join the
    * recorded schema atomically (per-column commits would let a reader
    * observe half the widening). */
  def addColumns(spark: SparkSession, root: String,
                 columns: Seq[(String, String)], maxAttempts: Int = 5): Long = {
    require(columns.nonEmpty, "ADD COLUMNS needs at least one column")
    require(columns.map(_._1).distinct.size == columns.size,
      s"ADD COLUMNS lists a column twice: ${columns.map(_._1).mkString(", ")}")
    val typed = columns.map { case (n, ddl) =>
      n -> org.apache.spark.sql.types.DataType.fromDDL(ddl) }
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val cols = logicalColumns(spark, root, cur)
      val (renames, dropped) = mappingAt(spark, root, cur)
      typed.foreach { case (name, _) =>
        require(!cols.contains(name),
          s"cannot add column '$name': it already exists")
        require(!dropped(physicalNameOf(renames, name)) && !dropped(name),
          s"cannot add column '$name': that name is reserved by a dropped " +
            "column whose data files still carry it")
        require(!renames.exists { case (lg, ph) => ph == name && lg != name },
          s"cannot add column '$name': that is another column's physical name")
      }
      val entries = manifest(spark, root, cur)
      if (writeManifest(spark, root, cur + 1, entries, "add-column",
          partitionColumn(spark, root, cur).getOrElse(""))) {
        writeStats(spark, root, cur + 1, entries, Nil,
          Some(org.apache.spark.sql.types.StructType(typed.map { case (n, dt) =>
            org.apache.spark.sql.types.StructField(n, dt, nullable = true) })))
        return cur + 1
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the add-column race $maxAttempts times under $root")
  }

  /** Partitions whose manifest file sets differ between two versions.
    * Files are immutable once written, so a partition carried with an
    * identical file set at both versions is bit-identical and provably
    * free of changes — [[changes]] never reads it. */
  private[graft] def changedPartitions(spark: SparkSession, root: String,
                                       fromVersion: Long, toVersion: Long): Seq[String] = {
    def byPart(v: Long): Map[String, Set[String]] =
      manifest(spark, root, v).groupBy(_.partition)
        // File identity includes the DV attachment: a deletion-vector
        // delete changes a partition's CONTENT without changing its
        // file paths, and the change feed / merge rebase must see that
        // as a change.
        .map { case (p, es) => p -> es.map(e => s"${e.path}\t${e.dv}").toSet }
    val a = byPart(fromVersion)
    val b = byPart(toVersion)
    (a.keySet ++ b.keySet).filter(p => a.get(p) != b.get(p)).toSeq.sorted
  }

  /** True when `dt` transitively contains a map — map-typed values
    * have no ordering, so equality on them (or on structs/arrays
    * holding them) is not analyzable and must compare canonicalized. */
  private def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case s: org.apache.spark.sql.types.StructType => s.exists(f => hasMap(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
    case _ => false
  }

  /** Row-level change feed (CDC) between two committed versions — the
    * snapshot-store analog of a document store's change stream: every
    * row inserted, updated, or deleted going `fromVersion` →
    * `toVersion`, classified in a trailing `_change_type` column
    * (`insert` / `update` / `delete`). Insert and update rows carry
    * the to-version values; delete rows carry the from-version values.
    * Assumes the keyed-table contract the commit paths maintain:
    * `keyCol` unique within a version.
    *
    * Scale shape: the scan is bounded by the CHANGED partitions
    * ([[changedPartitions]]) — a commit that touched one partition of
    * a 100 TB table diffs one partition, not the table. What remains
    * is one full-outer equi-join on the key (AQE broadcasts the small
    * side when a commit was narrow) plus a null-safe struct equality
    * that drops rows a rewrite carried over byte-unchanged, so
    * [[compact]] / [[compactZOrder]] between the versions add zero
    * change rows. Columns added by schema evolution read as typed
    * nulls on the older side, so an evolution alone marks rows
    * changed only where the new column is non-null.
    *
    * Map-typed columns (and structs/arrays containing them) compare
    * via their JSON rendering — Spark defines no ordering on maps.
    * Entry order must therefore be construction-stable across
    * versions, which holds for rows produced by this store's own
    * commit paths; canonicalize upstream (sorted `map_entries`) if
    * feeding maps built in varying orders. */
  def changes(spark: SparkSession, root: String, fromVersion: Long,
              toVersion: Long, keyCols: ColSpec): DataFrame = {
    require(keyCols.nonEmpty, "change feed needs at least one key column")
    require(fromVersion != toVersion,
      s"change feed needs two distinct versions, got $fromVersion twice")
    val parts = changedPartitions(spark, root, fromVersion, toVersion)
    // Both sides read under the NEWER version's column mapping (Delta
    // CDF's latest-schema convention): physical names are stable, so a
    // rename between the versions diffs the same columns under their
    // new names instead of fabricating a drop+add.
    val mv = Some(math.max(fromVersion, toVersion))
    val from = readVersion(spark, root, fromVersion, Some(parts), mappingVersion = mv)
    val to = readVersion(spark, root, toVersion, Some(parts), mappingVersion = mv)
    val toCols = to.columns.toSeq
    val cols = toCols ++ from.columns.toSeq.filterNot(toCols.contains)
    val dataCols = cols.filterNot(keyCols.contains)
    keyCols.cols.foreach(k => require(cols.contains(k),
      s"key column $k missing from snapshot"))
    require(dataCols.nonEmpty, "change feed needs at least one non-key column")
    def aligned(df: DataFrame, other: DataFrame): (DataFrame, Map[String, org.apache.spark.sql.types.DataType]) = {
      val have = df.columns.toSet
      val otherTypes = other.schema.map(f => f.name -> f.dataType).toMap
      val d = cols.filterNot(have).foldLeft(df)((d, c) =>
        d.withColumn(c, lit(null).cast(otherTypes(c))))
      val sel = d.select(cols.map(col): _*)
      (sel, sel.schema.map(f => f.name -> f.dataType).toMap)
    }
    val (fA, fTypes) = aligned(from, to)
    val (tA, _) = aligned(to, from)
    def comparable(c: String): Column =
      if (hasMap(fTypes(c))) to_json(col(c)).as(c) else col(c).as(c)
    def sided(df: DataFrame, side: String): DataFrame = df.select(
      keyCols.cols.map(col) :+
      struct(dataCols.map(col): _*).as(s"_${side}_row") :+
      struct(dataCols.map(comparable): _*).as(s"_${side}_cmp"): _*)
    val j = sided(fA, "from").join(sided(tA, "to"), keyCols.cols, "full_outer")
      .filter(!(col("_from_cmp") <=> col("_to_cmp")))
    val payload = when(col("_to_row").isNull, col("_from_row"))
      .otherwise(col("_to_row"))
    val changeType = when(col("_from_row").isNull, lit("insert"))
      .when(col("_to_row").isNull, lit("delete"))
      .otherwise(lit("update"))
    j.select(keyCols.cols.map(col) ++
      dataCols.map(c => payload.getField(c).as(c))
      :+ changeType.as("_change_type"): _*)
  }

  /** Compact small files: rewrite the selected partitions (default:
    * every partition with more files than `maxFilesPerPartition`) so
    * each lands in one file per partition, published as a new snapshot
    * version. Content is unchanged — only layout. The small-file
    * problem is the chronic failure mode of long-lived incremental
    * tables (every merge adds files; scans degrade to file-open
    * overhead); compaction through the same manifest commit keeps it
    * crash-safe and non-blocking for readers. Untouched partitions are
    * carried by reference. Returns the new version, or the current one
    * if nothing needed compacting. */
  def compact(spark: SparkSession, root: String, partitionCols: ColSpec,
              maxFilesPerPartition: Int = 1, maxAttempts: Int = 5,
              partitions: Option[Seq[String]] = None): Long = {
    require(partitionCols.nonEmpty, "compact needs a partition spec")
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val entries = manifest(spark, root, cur)
      val inScope: String => Boolean =
        partitions.map(_.toSet).map(s => s.contains _).getOrElse(_ => true)
      val oversized = entries.groupBy(_.partition)
        .filter { case (p, es) => inScope(p) && es.size > maxFilesPerPartition }
        .keySet
      if (oversized.isEmpty) return cur
      val (replaced, kept) = entries.partition(e => oversized(e.partition))
      // One shuffle keyed by the partition column: every partition
      // value lands in exactly one task, so partitionBy emits one file
      // per compacted partition. Layout paths read and re-write files
      // RAW (physical column names — column mapping never applies), so
      // the partition column resolves by its PHYSICAL name.
      val physParts = partitionCols.cols
        .map(physicalNameOf(mappingAt(spark, root, cur)._1, _))
      val compacted = readEntriesAt(spark, root, replaced, cur)
        .repartition(physParts.map(col): _*)
      val v = cur + 1
      val newEntries = writeDataFiles(spark, compacted, root, v, physParts,
        translate = false)
      if (writeManifest(spark, root, v, kept ++ newEntries, "compact",
          partitionCols.header)) {
        // Content unchanged — the recorded schema carries forward.
        writeStats(spark, root, v, kept, newEntries, None)
        return v
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the compaction race $maxAttempts times under $root")
  }

  /** PARTITION-SPEC EVOLUTION (Iceberg's headline day-two operation,
    * expressed in this store's per-version metadata): re-lay a live
    * table out under `newSpec` as ONE layout rewrite commit. The new
    * manifest records the new `#partcol`, so every downstream
    * consumer — DML partition routing, OPTIMIZE scopes, SHOW
    * PARTITIONS, the metadata-delete fast path, CDC partition
    * bounding — honors the new spec from the next version on, while
    * TIME TRAVEL reads older versions under the spec THEY recorded
    * (the header is per-version already) and RESTORE snaps the spec
    * back with the rest of the target's metadata.
    *
    * Semantics-preserving: rows are read through the current
    * snapshot's deletion vectors (a rewrite materializes deletes,
    * like OPTIMIZE) and re-written RAW under their physical names —
    * the column mapping, properties, and constraints carry forward
    * untouched. `newSpec` names LOGICAL columns.
    *
    * Cost: one shuffle of the table keyed by the new spec (each new
    * cell lands contiguously, one file per cell per shuffle
    * partition), the inherent price of re-speccing — Iceberg avoids
    * it by splitting the table into per-spec file groups, at the cost
    * of every reader handling mixed layouts; this store keeps
    * manifests single-spec and pays the rewrite once, explicitly. A
    * no-op spec change returns the current version. */
  def repartitionTable(spark: SparkSession, root: String, newSpec: ColSpec,
                       maxAttempts: Int = 5): Long = {
    require(newSpec.nonEmpty, "repartitionTable needs a partition spec")
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      if (requirePartitionCols(spark, root, cur) == newSpec.cols) return cur
      val entries = manifest(spark, root, cur)
      val mapping = mappingAt(spark, root, cur)
      val physParts = newSpec.cols.map(physicalNameOf(mapping._1, _))
      val v = cur + 1
      // An EMPTY table re-specs as pure metadata: same (zero) entries,
      // new header.
      val newEntries =
        if (entries.isEmpty) Nil
        else writeDataFiles(spark,
          readEntriesAt(spark, root, entries, cur).repartition(physParts.map(col): _*),
          root, v, physParts, translate = false)
      if (writeManifest(spark, root, v, newEntries, "repartition",
          newSpec.header)) {
        writeStats(spark, root, v, Nil, newEntries, None)
        return v
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the repartition race $maxAttempts times under $root")
  }

  /** Layout maintenance: rewrite partitions (default: all) Z-ORDERED
    * on `zKeys`, published as a new snapshot version. Incremental
    * merges append files in arrival order, so a long-lived table's
    * per-file ranges widen until [[FileStats]] skipping stops biting;
    * this restores it — each rewritten file covers a narrow
    * hyper-rectangle of the key space ([[graft.operators.Layout]]),
    * and the commit's stats sidecar captures the new ranges, so
    * multi-dimensional predicates through [[table]] go back to
    * opening a handful of files. Cost: one range shuffle of the
    * selected partitions (same as a global sort) + a min/max rank
    * pass; untouched partitions are carried by reference, and the
    * usual optimistic-commit loop makes it crash-safe/non-blocking. */
  def compactZOrder(spark: SparkSession, root: String, partitionCols: ColSpec,
                    zKeys: Seq[String], filesPerPartition: Int = 4,
                    bits: Int = 8, partitions: Option[Seq[String]] = None,
                    maxAttempts: Int = 5): Long = {
    require(partitionCols.nonEmpty, "compactZOrder needs a partition spec")
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val entries = manifest(spark, root, cur)
      val sel = partitions.map(_.toSet).getOrElse(entries.map(_.partition).toSet)
      val (replaced, kept) = entries.partition(e => sel(e.partition))
      if (replaced.isEmpty) return cur
      val nParts = replaced.map(_.partition).distinct.size
      // Physical names throughout: layout rewrites never translate
      // (see compact); the caller's LOGICAL z-keys and partition
      // column resolve through the mapping.
      val renames = mappingAt(spark, root, cur)._1
      val laid = graft.operators.Layout.zorderBy(
        readEntriesAt(spark, root, replaced, cur),
        zKeys.map(k => col(physicalNameOf(renames, k))),
        numFiles = filesPerPartition * nParts, bits = bits)
      val v = cur + 1
      val newEntries = writeDataFiles(spark, laid, root, v,
        partitionCols.cols.map(physicalNameOf(renames, _)), translate = false)
      if (writeManifest(spark, root, v, kept ++ newEntries, "zorder",
          partitionCols.header)) {
        writeStats(spark, root, v, kept, newEntries, None)
        return v
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the z-order compaction race $maxAttempts times under $root")
  }

  /** Delta `RESTORE TABLE … TO VERSION AS OF` analog: roll the table
    * back to `toVersion`'s content by publishing a NEW version whose
    * manifest carries the target's files BY REFERENCE — a pure
    * metadata commit (zero data read or written, cost ∝ manifest
    * size), not a copy. History stays intact: every version between
    * the target and the restore remains time-travelable, and the
    * restore itself is one more auditable entry ([[history]] tags it
    * `restore`) — unlike overwriting sinks, where a rollback destroys
    * the states it rolls back over. The recorded schema snaps back to
    * the target's exactly, so a restore across a widening merge does
    * not resurface the later columns as all-null.
    *
    * Restoring to content the tip already has (the target itself, or
    * a prior restore of it) is a version no-op — the current version
    * is returned unchanged. Files only referenced by rolled-over
    * versions stay on disk until [[vacuum]]; vacuuming history then
    * limits how far back a future restore can reach, exactly like
    * Delta. */
  def restore(spark: SparkSession, root: String, toVersion: Long,
              maxAttempts: Int = 5): Long = {
    // Note: restoring a DELETION-VECTORED version re-publishes its DV
    // attachments; vacuum keeps any DV dir referenced by a KEPT
    // manifest, so a restore within the retention window is always
    // readable — restoring past vacuumed history fails on the missing
    // manifest itself, same as Delta.
    val target = manifest(spark, root, toVersion)
    // Partition-column metadata, hoisted (the header is immutable —
    // re-reading it per CAS retry would be wasted manifest GETs).
    // Restoring to a version that predates the header must not strip
    // it from the table tip: fall back to the current version's.
    val partCol = partitionColumn(spark, root, toVersion)
      .orElse(currentVersion(spark, root)
        .flatMap(partitionColumn(spark, root, _)))
      .getOrElse("")
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      // No-op only when FILES **and** METADATA already match: a
      // metadata-only commit (rename/drop column) carries the same
      // file set as its parent, so the file comparison alone would
      // wrongly skip restoring across it.
      if (manifest(spark, root, cur).toSet == target.toSet &&
          mappingAt(spark, root, cur) == mappingAt(spark, root, toVersion) &&
          tableProperties(spark, root, cur).toSet ==
            tableProperties(spark, root, toVersion).toSet)
        return cur
      val v = cur + 1
      // The column mapping snaps back to the TARGET's, exactly like the
      // recorded schema (basis): restoring across a rename must show
      // the names the table had then, or the restored files' logical
      // view would not match the restored content. Table PROPERTIES
      // snap back the same way (Delta's RESTORE restores the target
      // metadata including configuration) — the default carry would
      // otherwise keep the abandoned tip's property set across a
      // restore over a SET TBLPROPERTIES.
      if (writeManifest(spark, root, v, target, "restore", partCol,
          columnMapping = Some(
            try columnMapping(spark, root, toVersion)
            catch { case _: java.io.IOException => (Nil, Nil) }),
          properties = Some(
            try tableProperties(spark, root, toVersion)
            catch { case _: java.io.IOException => Nil }))) {
        writeStats(spark, root, v, target, Nil, None, basis = Some(toVersion))
        return v
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"lost the restore race $maxAttempts times under $root")
  }

  /** Delta SHALLOW CLONE analog: publish version 1 of a NEW table at
    * `dstRoot` whose manifest references `srcRoot`'s files at
    * `version` (default: current) by ABSOLUTE path — zero data
    * copied, cost ∝ manifest size. Every entry resolution in this
    * store goes through `new Path(root, entry.path)`, and Hadoop
    * resolution lets an absolute child override the parent, so mixed
    * manifests (absolute cloned files + relative locally-committed
    * files) read transparently: the clone evolves independently —
    * its merges/deletes rewrite into its OWN data directory while
    * untouched source files stay carried by reference.
    *
    * Caveats (same as Delta's): vacuuming the SOURCE table can delete
    * files a clone still references (the source does not know about
    * clone back-references); vacuuming the CLONE never touches source
    * files (its sweep only examines its own data directory). The
    * clone's stats sidecar re-reads the cloned files' footers once at
    * clone time — metadata-priced. */
  def cloneTo(spark: SparkSession, srcRoot: String, dstRoot: String,
              version: Option[Long] = None): Long = {
    require(currentVersion(spark, dstRoot).isEmpty,
      s"clone destination $dstRoot already holds a snapshot")
    val v = version.getOrElse(currentVersion(spark, srcRoot).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $srcRoot")))
    val f = fs(spark, srcRoot)
    val abs = manifest(spark, srcRoot, v).map(e =>
      e.copy(path = f.makeQualified(new Path(srcRoot, e.path)).toString,
        dv = if (e.dv.isEmpty) ""
             else f.makeQualified(new Path(srcRoot, e.dv)).toString))
    // Cloning a version that predates partition-column metadata still
    // inherits the source TIP's header when one exists.
    if (!writeManifest(spark, dstRoot, 1L, abs, "clone",
        partitionColumn(spark, srcRoot, v)
          .orElse(currentVersion(spark, srcRoot)
            .flatMap(partitionColumn(spark, srcRoot, _)))
          .getOrElse(""),
        constraints = Some(
          try tableConstraints(spark, srcRoot, v)
          catch { case _: java.io.IOException => Nil }),
        properties = Some(
          try tableProperties(spark, srcRoot, v)
          catch { case _: java.io.IOException => Nil }),
        columnMapping = Some(
          try columnMapping(spark, srcRoot, v)
          catch { case _: java.io.IOException => (Nil, Nil) })))
      throw new java.util.ConcurrentModificationException(
        s"lost the clone race publishing v1 under $dstRoot")
    writeStats(spark, dstRoot, 1L, abs, Nil, schemaFor(spark, srcRoot, v))
    1L
  }

  /** Delta `DESCRIBE HISTORY` analog: one row per committed version —
    * (version, operation, n_files, n_partitions, files_added,
    * files_removed, total_rows), ascending. Operation is the
    * committer's tag (null for pre-tagging manifests); files_added /
    * files_removed diff each manifest against its predecessor (files
    * are immutable, so path-set diff IS the change set); total_rows
    * sums the stats sidecar and is null when any listed file lacks
    * stats (derived metadata never blocks the audit view). Driver-side
    * over manifests only — metadata-priced at any table size. */
  /** [[history]]'s row shape — shared with the `DESCRIBE HISTORY`
    * SQL command so the two surfaces cannot drift. */
  val historySchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("version", LongType, nullable = false),
      // Commit wall-clock from the #ts header (null for manifests
      // written before timestamps existed) — the column Delta users
      // read first in DESCRIBE HISTORY, and the one TIMESTAMP AS OF
      // resolves against.
      StructField("timestamp", TimestampType, nullable = true),
      StructField("operation", StringType, nullable = true),
      StructField("n_files", IntegerType, nullable = false),
      StructField("n_partitions", IntegerType, nullable = false),
      StructField("files_added", IntegerType, nullable = false),
      StructField("files_removed", IntegerType, nullable = false),
      StructField("total_rows", LongType, nullable = true),
      // Operation metrics (Delta's numOutputRows/numRemovedRows
      // analog): physical rows of the files each version added /
      // removed vs its predecessor, from the stats sidecars — null
      // when any involved file lacks stats (derived metadata never
      // blocks the audit view). A metadata-only commit shows 0/0; a
      // DV delete shows 0/0 too (its rows change via dvRows, visible
      // in total_rows).
      StructField("rows_added", LongType, nullable = true),
      StructField("rows_removed", LongType, nullable = true)))
  }

  def history(spark: SparkSession, root: String): DataFrame = {
    val vs = versions(spark, root)
    var prevPaths = Set.empty[String]
    var prevStats = Map.empty[String, FileStats.FileStatsEntry]
    val rows = vs.map { v =>
      val m = manifest(spark, root, v)
      val paths = m.map(_.path).toSet
      val st = statsFor(spark, root, v)
      val totalRows: java.lang.Long =
        if (m.forall(e => st.contains(e.path)))
          // Live rows: physical rows minus deletion-vectored positions
          // (cardinality recorded per entry at delete time, so this
          // stays a metadata walk — no DV parquet is opened).
          java.lang.Long.valueOf(m.map(e => st(e.path).rows - e.dvRows).sum)
        else null
      val added = paths -- prevPaths
      val removed = prevPaths -- paths
      def rowSum(ps: Set[String], from: Map[String, FileStats.FileStatsEntry]):
          java.lang.Long =
        if (ps.forall(from.contains))
          java.lang.Long.valueOf(ps.toSeq.map(from(_).rows).sum)
        else null
      val row = org.apache.spark.sql.Row(
        v,
        commitTimestamp(spark, root, v)
          .map(new java.sql.Timestamp(_)).orNull,
        manifestOperation(spark, root, v).orNull, m.size,
        m.map(_.partition).distinct.size,
        added.size, removed.size, totalRows,
        rowSum(added, st), rowSum(removed, prevStats))
      prevPaths = paths
      prevStats = st
      row
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), historySchema)
  }

  /** External-engine interop: export a snapshot version as a
    * symlink-format manifest — the Hive/Presto/Trino/Athena
    * `SymlinkTextInputFormat` convention (one text file per partition
    * under `_symlink_format_manifest/`, each line the absolute URI of
    * a data file; the same layout Delta Lake's `GENERATE
    * symlink_format_manifest` emits). Any engine that can mount an
    * external partitioned parquet table can then read the snapshot
    * without this codebase:
    * {{{
    *   CREATE EXTERNAL TABLE t (…) PARTITIONED BY (__part string)
    *   ROW FORMAT SERDE '…ParquetHiveSerDe'
    *   STORED AS INPUTFORMAT '…SymlinkTextInputFormat'
    *   OUTPUTFORMAT '…HiveIgnoreKeyTextOutputFormat'
    *   LOCATION '<root>/_symlink_format_manifest'
    * }}}
    *
    * The export reflects ONE committed version (default: current) —
    * re-run it after commits that should be visible externally; stale
    * export = stale-but-consistent external reads, never torn ones
    * (data files are immutable). Longer-lived interop should migrate
    * the manifest state machine to an open table format (Delta/
    * Iceberg) whose commit protocol this store deliberately mirrors
    * (append-only data files + atomic metadata publish). */
  def writeSymlinkManifest(spark: SparkSession, root: String,
                           version: Option[Long] = None): Path = {
    val v = version.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    // A symlink manifest is a bare file list — external engines would
    // read deletion-vectored files RAW, resurrecting deleted rows.
    // Same restriction as Delta's generate; purge first.
    require(manifest(spark, root, v).forall(_.dv.isEmpty),
      s"version $v under $root carries deletion vectors, which the " +
        "symlink manifest format cannot express — run " +
        "purgeDeletionVectors (REORG … APPLY (PURGE)) first")
    // Same restriction for column mapping: external engines read the
    // files' PHYSICAL names with no way to apply renames/drops (Delta
    // blocks generate under column mapping for the same reason).
    require({ val (r, d) = mappingAt(spark, root, v); r.isEmpty && d.isEmpty },
      s"version $v under $root uses column mapping (renamed or dropped " +
        "columns), which a bare symlink manifest cannot express — " +
        "external engines would see the physical column names")
    val f = fs(spark, root)
    val outRoot = new Path(root, "_symlink_format_manifest")
    // Sweep leftovers of previously crashed swaps (a stranded old tree
    // set aside mid-swap, or a half-built tmp tree) so they don't
    // accumulate forever — this export is about to supersede them.
    f.listStatus(new Path(root)).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith("._symlink_old-") || n.startsWith("._symlink_tmp-"))
        f.delete(s.getPath, true)
    }
    val tmpRoot = new Path(root,
      s"._symlink_tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    manifest(spark, root, v).groupBy(_.partition).foreach { case (part, es) =>
      // Reuse the data files' own Hive-escaped partition directory
      // components (all levels, for a multi-column spec), so external
      // engines see the familiar layout.
      val comps = es.head.path.split("/")
        .dropWhile(c => !c.startsWith(s"$PartDir=")).dropRight(1)
      val dir = new Path(tmpRoot,
        if (comps.nonEmpty) comps.mkString("/")
        else s"$PartDir=" + URLEncoder.encode(part, UTF_8))
      f.mkdirs(dir)
      val out = f.create(new Path(dir, "manifest"), true)
      try out.write(es.map(e => f.makeQualified(new Path(root, e.path)).toString)
        .sorted.mkString("\n").getBytes(UTF_8))
      finally out.close()
    }
    // Swap via rename-aside, not delete-then-rename: the old export
    // stays readable until the swap starts, and the data is never
    // destroyed mid-export. A crash BETWEEN the two renames does
    // leave the location briefly absent (the old tree parked under
    // ._symlink_old-*, swept by the next export) — strictly narrower
    // than delete-then-rebuild, whose window spans the whole rebuild
    // and loses the old tree outright.
    val old = new Path(root,
      s"._symlink_old-${java.util.UUID.randomUUID().toString.take(8)}")
    val hadOld = f.exists(outRoot)
    if (hadOld) f.rename(outRoot, old)
    f.rename(tmpRoot, outRoot)
    if (hadOld) f.delete(old, true)
    outRoot
  }

  /** Drop all but the newest `keep` manifests and delete data files no
    * kept manifest references. Files shared with kept versions survive
    * (reuse-by-reference makes per-version directory deletes WRONG —
    * the referenced set is computed across all kept manifests).
    *
    * `retainMillis` is the safety window against concurrent writers
    * (same role as Delta's VACUUM retention): a commit in flight has
    * written data files that no PUBLISHED manifest references yet, so
    * an unguarded vacuum would delete them and corrupt the commit when
    * its manifest then wins. Unreferenced files newer than the window
    * are left alone; only set it to 0 when no writer can be active. */
  /** What a [[vacuum]] with these settings would remove: (data file
    * paths, deletion-vector directory paths — both root-relative — and
    * manifest versions to drop). Shared by vacuum itself and the
    * `VACUUM … DRY RUN` SQL surface, so the preview and the deletion
    * can never disagree. */
  private def vacuumPlan(spark: SparkSession, root: String, keep: Int,
                         retainMillis: Long): (Seq[String], Seq[String], Seq[Long]) = {
    val vs = versions(spark, root)
    val (drop, keepVs) = vs.splitAt(math.max(0, vs.size - keep))
    val keptEntries = keepVs.flatMap(v => manifest(spark, root, v))
    val referenced = keptEntries.map(_.path).toSet
    val referencedDv = keptEntries.filter(_.dv.nonEmpty).map(_.dv).toSet
    val f = fs(spark, root)
    val cutoff = System.currentTimeMillis() - retainMillis
    val files = Seq.newBuilder[String]
    val dataRoot = new Path(root, "data")
    if (f.exists(dataRoot)) {
      f.listStatus(dataRoot).foreach { vdir =>
        f.listStatus(vdir.getPath).foreach { pdir =>
          if (pdir.isDirectory) {
            f.listStatus(pdir.getPath).foreach { file =>
              val rel = s"data/${vdir.getPath.getName}/${pdir.getPath.getName}/${file.getPath.getName}"
              if (file.getPath.getName.endsWith(".parquet") && !referenced(rel) &&
                  file.getModificationTime < cutoff)
                files += rel
            }
          }
        }
      }
    }
    // Deletion-vector directories are swept like data files: one kept
    // manifest referencing a DV dir keeps it; orphans (vacuumed
    // versions' superseded DVs, crashed delete-dv attempts) older than
    // the safety window go. Clone-held ABSOLUTE dv references live
    // under the source root and are never matched here — same
    // source-vacuum caveat as cloned data files.
    val dvDirs = Seq.newBuilder[String]
    val dvRoot = new Path(root, "dv")
    if (f.exists(dvRoot)) {
      f.listStatus(dvRoot).foreach { d =>
        if (d.isDirectory && !referencedDv(s"dv/${d.getPath.getName}") &&
            d.getModificationTime < cutoff)
          dvDirs += s"dv/${d.getPath.getName}"
      }
    }
    (files.result(), dvDirs.result(), drop)
  }

  /** `VACUUM … DRY RUN`: the root-relative paths vacuum WOULD delete
    * (data files + DV directories), without deleting anything. */
  def vacuumDryRun(spark: SparkSession, root: String, keep: Int = 2,
                   retainMillis: Long = 24L * 3600 * 1000): Seq[String] = {
    val (files, dvDirs, _) = vacuumPlan(spark, root, keep, retainMillis)
    (files ++ dvDirs).sorted
  }

  def vacuum(spark: SparkSession, root: String, keep: Int = 2,
             retainMillis: Long = 24L * 3600 * 1000): Unit = {
    // Even with nothing to drop, the orphan sweep still collects data
    // files of crashed/lost commits (written, never published).
    val (files, dvDirs, drop) = vacuumPlan(spark, root, keep, retainMillis)
    val f = fs(spark, root)
    files.foreach(rel => f.delete(new Path(root, rel), false))
    dvDirs.foreach(rel => f.delete(new Path(root, rel), true))
    drop.foreach { v =>
      f.delete(manifestPath(root, v), false)
      f.delete(statsPath(root, v), false)
      f.delete(bloomPath(root, v), false)
    }
  }
}
