package graft.sinks

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Planning-time file skipping for a [[SnapshotStore]] snapshot: a
  * Catalyst [[FileIndex]] whose file listing is the manifest (never a
  * directory walk) filtered by per-file [[FileStats]] ranges against
  * the query's own pushed-down data filters.
  *
  * This is the piece that turns "WHERE k BETWEEN a AND b" into "open
  * 3 of 400 files" on a Z-ordered table ([[graft.operators.Layout]])
  * without the caller passing any hints — Catalyst hands `listFiles`
  * the predicates it already pushed toward the scan, and files whose
  * stats can't satisfy them are dropped before any split planning.
  * Spark re-applies the predicates row-level afterwards, so pruning
  * can only reduce I/O, never change results (conservative stats =
  * correct-by-construction).
  *
  * File sizes come from the stats sidecar, so planning performs ZERO
  * filesystem calls per data file — manifest + sidecar reads only
  * (the Delta/Iceberg metadata-scaling property; a 100 TB table plans
  * from a few small metadata files).
  */
class GraftFileIndex(root: Path,
                     files: Seq[(FileStatus, Option[FileStats.FileStatsEntry],
                       Map[String, FileStats.BloomStats])],
                     override val partitionSchema: StructType = new StructType(),
                     /** Identity of the scan, for plan-rewrite rules
                       * ([[MetadataCountRule]], [[RollupRewriteRule]]):
                       * the snapshot root, the PINNED version this
                       * listing reflects, and — when the listing was
                       * partition-pruned at construction — the encoded
                       * partition values kept. A pruned scan is a
                       * SUBSET: a rewrite that answers for the whole
                       * table must either rebase the same subset
                       * predicate (the values here make that possible)
                       * or not fire. */
                     val tableRoot: Option[String] = None,
                     val version: Option[Long] = None,
                     val prunedPartitions: Option[Seq[String]] = None,
                     /** Monotone generated-column rewrites
                       * ([[FileStats.generatedDerivers]]): predicates
                       * on a generation INPUT derive predicates on
                       * the generated PARTITION column, which has
                       * exact per-file stats even when the input's
                       * physical type is stats-opaque (INT96). */
                     val derivers: Seq[FileStats.GeneratedDeriver] = Nil)
    extends FileIndex {

  /** Whether the listing is a partition subset of the table. */
  def partitionPruned: Boolean = prunedPartitions.isDefined

  /** Pruning observability (specs + SCALE measurements): the candidate
    * count of the MOST RECENT `listFiles` call. Atomic last-writer-wins
    * under concurrent plans over a shared index — strictly a probe for
    * tests and measurements, never an input to planning. */
  val totalFiles: Int = files.size
  private[sinks] val lastCandidate = new java.util.concurrent.atomic.AtomicInteger(files.size)
  def lastCandidateFiles: Int = lastCandidate.get

  /** Names of join keys a RUNTIME probe rider already covers on this
    * index ([[withRuntimeProbe]] chains accumulate) — the idempotence
    * input for [[DynamicPruningRule]]'s execution-time path. */
  def probeKeyNames: Set[String] = Set.empty

  /** EXECUTION-TIME dynamic file pruning rider (E139 — the DPP-style
    * half of [[DynamicPruningRule]]): returns an index that, at
    * `listFiles` time (Spark forces a scan's `selectedPartitions`
    * lazily, when the physical plan first materializes its input —
    * i.e. at execution, after every optimizer pass is done), runs
    * `probe` ONCE and — when it yields a bounded key set — appends a
    * synthesized `key IN (…)` to the pushed data filters, so the
    * same stats/Bloom translation path that serves pushed predicates
    * prunes the listing by the DIM'S ACTUAL KEYS. `None` from the
    * probe (over-limit, or any probe failure) delegates untouched —
    * the rider can only reduce I/O, never change results (the join
    * above re-filters rows, exactly the planning-time path's
    * contract).
    *
    * Why a rider instead of a frozen In-list: a MUTABLE dim (a plain
    * parquet directory, a refreshed view) may change between
    * optimization and a cached plan's re-execution, so keys frozen at
    * planning could disagree with what the join's own dim side reads.
    * The probe here executes the join's OWN captured dim subtree — the
    * same relation objects, hence the same (listing-cached) file
    * sources the join will read — in the same execution window, so
    * probe and join can only disagree if the underlying FILES mutate
    * in place mid-query, which breaks any Spark plan. Chaining
    * composes: a second rider (another join key) wraps the first. */
  def withRuntimeProbe(keyName: String,
                       keyType: org.apache.spark.sql.types.DataType,
                       probe: () => Option[Array[Any]]): GraftFileIndex = {
    val self = this
    new GraftFileIndex(root, files, partitionSchema, tableRoot, version,
        prunedPartitions, derivers) {
      private lazy val probed: Option[Array[Any]] = probe()
      override def probeKeyNames: Set[String] = self.probeKeyNames + keyName
      override def listFiles(partitionFilters: Seq[Expression],
                             dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
        val augmented = probed match {
          case None => dataFilters
          case Some(keys) =>
            import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In, Literal}
            dataFilters :+ In(AttributeReference(keyName, keyType)(),
              keys.toIndexedSeq.map(Literal.create(_, keyType)))
        }
        val r = self.listFiles(partitionFilters, augmented)
        lastCandidate.set(r.map(_.files.length).sum)
        r
      }
    }
  }

  override def rootPaths: Seq[Path] = Seq(root)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val filters = dataFilters.flatMap(FileStats.translate) ++
      FileStats.deriveGenerated(dataFilters, derivers)
    val kept =
      if (filters.isEmpty) files.map(_._1)
      else files.collect {
        case (st, stats, blooms)
          if stats.forall(e => filters.forall(FileStats.mayMatch(e, _))) &&
            (blooms.isEmpty || filters.forall(FileStats.mayMatchBloom(blooms, _))) => st
      }
    lastCandidate.set(kept.size)
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }

  override def inputFiles: Array[String] = files.map(_._1.getPath.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = files.map(_._1.getLen).sum

  /** Σ per-file row counts when EVERY listed file carries sidecar
    * stats — the input to the metadata-only COUNT(*) rewrite
    * ([[MetadataCountRule]]). This is the PHYSICAL row count of the
    * listed files (deletion vectors are applied above the relation,
    * so a bare scan of a DV-carrying selection really does produce
    * this many rows). None when any file lacks stats. */
  val totalRows: Option[Long] =
    if (files.forall(_._2.isDefined)) Some(files.map(_._2.get.rows).sum)
    else None

  /** Every listed file's sidecar stats — the input to the
    * metadata-only MIN/MAX/COUNT(col) rewrite ([[MetadataCountRule]]).
    * None when any file lacks stats (the rewrite then never fires). */
  val statsEntries: Option[Seq[FileStats.FileStatsEntry]] =
    if (files.forall(_._2.isDefined)) Some(files.map(_._2.get)) else None
}
