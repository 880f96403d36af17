package org.apache.spark.sql.graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StructType}

import graft.sinks.{GraftCatalog, SnapshotStore}

/** Maintenance-SQL surface for snapshot tables — the statements Delta
  * users type, routed to [[graft.sinks.SnapshotStore]]:
  *
  * {{{
  *   RESTORE TABLE graft.products TO VERSION AS OF 2
  *   DESCRIBE HISTORY graft.`/abs/path/t`
  *   VACUUM graft.products RETAIN 0 HOURS
  *   OPTIMIZE graft.products ZORDER BY (a, b)
  *   GENERATE symlink_format_manifest FOR TABLE graft.products
  *   MERGE INTO graft.products t USING updates s ON t.sku = s.sku
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Spark's grammar lacks these statements (or, for MERGE, cannot
  * execute them against a snapshot table), so — exactly like Delta's
  * `DeltaSqlParser` — a delegating `ParserInterface` is injected via
  * `SparkSessionExtensions.injectParser`: the fixed statement shapes
  * are recognized here (backtick-aware), everything else falls
  * through to the session parser untouched. Table names resolve
  * through the SAME [[GraftCatalog]] rules as reads (warehouse name or
  * backticked absolute path), so the read and maintenance surfaces
  * cannot drift.
  *
  * Both commands are metadata-priced at any table size: RESTORE is a
  * pure manifest commit ([[SnapshotStore.restore]] — zero data read),
  * DESCRIBE HISTORY walks manifests + stats sidecars
  * ([[SnapshotStore.history]]). V1 `RunnableCommand`s, matching how
  * Spark itself (and Delta) plan maintenance DDL — there is nothing to
  * distribute. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case RestorePattern(table, version) =>
      RestoreSnapshotCommand(delegate.parseMultipartIdentifier(table), version.toLong)
    case RestoreTsPattern(table, ts) =>
      RestoreSnapshotToTimestampCommand(
        delegate.parseMultipartIdentifier(table), ts)
    case HistoryPattern(table) =>
      DescribeHistoryCommand(delegate.parseMultipartIdentifier(table))
    case DetailPattern(table) =>
      DescribeDetailCommand(delegate.parseMultipartIdentifier(table))
    case VacuumPattern(table, retain, dryRun) =>
      VacuumSnapshotCommand(delegate.parseMultipartIdentifier(table),
        Option(retain).map(_.toLong), dryRun != null)
    case ClonePattern(target, source, version, ts) if isGraftCatalogName(
        delegate.parseMultipartIdentifier(target).head) &&
        isGraftCatalogName(delegate.parseMultipartIdentifier(source).head) =>
      CloneSnapshotCommand(delegate.parseMultipartIdentifier(target),
        delegate.parseMultipartIdentifier(source),
        Option(version).map(_.toLong), Option(ts))
    case OptimizePattern(table, where, zcols) =>
      OptimizeSnapshotCommand(delegate.parseMultipartIdentifier(table),
        GraftSqlParser.identifierList(zcols), Option(where))
    case GeneratePattern(table) =>
      GenerateSymlinkCommand(delegate.parseMultipartIdentifier(table))
    case MergePattern(table, tAlias, srcIdent, srcQuery, sAlias, cond)
        if isGraftCatalogName(delegate.parseMultipartIdentifier(table).head) =>
      // Gated like every other DML case: a canonical upsert-shaped
      // MERGE aimed at another catalog (Delta, spark_catalog) must
      // flow to the session parser untouched, not be hijacked into a
      // graft command that fails on resolveRoot.
      MergeIntoSnapshotCommand(
        delegate.parseMultipartIdentifier(table),
        Option(srcIdent), Option(srcQuery),
        mergeKey(cond, table, Option(tAlias), Option(srcIdent), Option(sAlias)))
    case DeletePattern(table, where) if isGraftCatalogName(
        delegate.parseMultipartIdentifier(table).head) =>
      DeleteFromSnapshotCommand(
        delegate.parseMultipartIdentifier(table), Option(where))
    case UpdatePattern(table, setList, where) if isGraftCatalogName(
        delegate.parseMultipartIdentifier(table).head) =>
      UpdateSnapshotCommand(delegate.parseMultipartIdentifier(table),
        GraftSqlParser.assignments(setList), Option(where))
    case InsertPattern(table, query) if isGraftCatalogName(
        delegate.parseMultipartIdentifier(table).head) =>
      InsertIntoSnapshotCommand(delegate.parseMultipartIdentifier(table), query)
    case CopyIntoPattern(table, source, format) if isGraftCatalogName(
        delegate.parseMultipartIdentifier(table).head) =>
      CopyIntoSnapshotCommand(delegate.parseMultipartIdentifier(table),
        source, format.toLowerCase)
    case AddConstraintPattern(table, name, check) if isGraftCatalogName(
        delegate.parseMultipartIdentifier(table).head) =>
      AddConstraintCommand(delegate.parseMultipartIdentifier(table),
        name, check.trim)
    case DropConstraintPattern(table, name) if isGraftCatalogName(
        delegate.parseMultipartIdentifier(table).head) =>
      DropConstraintCommand(delegate.parseMultipartIdentifier(table), name)
    case SetPropsPattern(table, propList) if isGraftCatalogName(
        delegate.parseMultipartIdentifier(table).head) =>
      SetPropertiesCommand(delegate.parseMultipartIdentifier(table),
        GraftSqlParser.propertyAssignments(propList))
    case UnsetPropsPattern(table, keyList) if isGraftCatalogName(
        delegate.parseMultipartIdentifier(table).head) =>
      UnsetPropertiesCommand(delegate.parseMultipartIdentifier(table),
        GraftSqlParser.propertyKeys(keyList))
    case ShowPropsPattern(table) if isGraftCatalogName(
        delegate.parseMultipartIdentifier(table).head) =>
      ShowPropertiesCommand(delegate.parseMultipartIdentifier(table))
    case ReorgPattern(table) if isGraftCatalogName(
        delegate.parseMultipartIdentifier(table).head) =>
      ReorgPurgeCommand(delegate.parseMultipartIdentifier(table))
    case GraftSqlParser.CtasPattern(table, pq, pb, query) if isGraftCatalogName(
        delegate.parseMultipartIdentifier(table).head) =>
      CtasSnapshotCommand(delegate.parseMultipartIdentifier(table),
        GraftSqlParser.colOf(pq, pb), query.trim)
    case GraftSqlParser.RenameColumnPattern(table, fq, fb, tq, tb)
        if isGraftCatalogName(delegate.parseMultipartIdentifier(table).head) =>
      RenameColumnCommand(delegate.parseMultipartIdentifier(table),
        GraftSqlParser.colOf(fq, fb), GraftSqlParser.colOf(tq, tb))
    case GraftSqlParser.DropColumnPattern(table, cq, cb)
        if isGraftCatalogName(delegate.parseMultipartIdentifier(table).head) =>
      DropColumnCommand(delegate.parseMultipartIdentifier(table),
        GraftSqlParser.colOf(cq, cb))
    case GraftSqlParser.AddColumnPattern(table, cq, cb, ddl)
        if isGraftCatalogName(delegate.parseMultipartIdentifier(table).head) =>
      AddColumnCommand(delegate.parseMultipartIdentifier(table),
        GraftSqlParser.colOf(cq, cb), ddl.trim)
    case MergeLoosePattern(table) if isGraftCatalogName(
        delegate.parseMultipartIdentifier(table).head) =>
      // A MERGE aimed at a graft catalog but not in the supported
      // shape: reject HERE with the supported grammar, instead of
      // letting the session parser hand analysis a MergeIntoTable no
      // graft table can execute (the error would blame the catalog,
      // not the statement).
      throw new IllegalArgumentException(
        "graft MERGE supports exactly the upsert shape: MERGE INTO <t> " +
          "USING <source> ON t.<key> = s.<key> WHEN MATCHED THEN UPDATE " +
          "SET * WHEN NOT MATCHED THEN INSERT * — conditional clauses, " +
          "column lists, and DELETE actions are not supported; got: " +
          sqlText.trim.take(200))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  // One multipart identifier: backtick-quoted parts may hold anything
  // (paths with slashes/dots); bare parts are word-shaped.
  private val part = "(?:`[^`]+`|[A-Za-z_][\\w$]*)"
  private val ident = s"($part(?:\\.$part)*)"

  private val RestorePattern =
    s"(?is)\\A\\s*RESTORE\\s+(?:TABLE\\s+)?$ident\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*\\z".r
  private val RestoreTsPattern =
    s"(?is)\\A\\s*RESTORE\\s+(?:TABLE\\s+)?$ident\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*\\z".r
  private val HistoryPattern =
    s"(?is)\\A\\s*(?:DESCRIBE|DESC)\\s+HISTORY\\s+$ident\\s*;?\\s*\\z".r
  private val DetailPattern =
    s"(?is)\\A\\s*(?:DESCRIBE|DESC)\\s+DETAIL\\s+$ident\\s*;?\\s*\\z".r
  private val VacuumPattern =
    (s"(?is)\\A\\s*VACUUM\\s+$ident(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS)?" +
      "(?:\\s+(DRY\\s+RUN))?\\s*;?\\s*\\z").r
  // Delta's SHALLOW CLONE DDL: zero-copy table fork, optionally
  // pinned to a version or timestamp.
  private val ClonePattern =
    (s"(?is)\\A\\s*CREATE\\s+TABLE\\s+$ident\\s+SHALLOW\\s+CLONE\\s+$ident" +
      "(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)|\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)')?" +
      "\\s*;?\\s*\\z").r
  private val OptimizePattern =
    (s"(?is)\\A\\s*OPTIMIZE\\s+$ident(?:\\s+WHERE\\s+(.+?))?" +
      "(?:\\s+ZORDER\\s+BY\\s+\\(([^)]+)\\))?\\s*;?\\s*\\z").r
  private val GeneratePattern =
    s"(?is)\\A\\s*GENERATE\\s+symlink_format_manifest\\s+FOR\\s+TABLE\\s+$ident\\s*;?\\s*\\z".r
  // The one MERGE shape the snapshot store executes (the K1 bulk
  // upsert in its standard SQL spelling): whole-row UPDATE SET * /
  // INSERT * on a single same-named equality key. Aliases are
  // optional; the negative lookahead keeps the keywords USING/ON/WHEN
  // from being eaten as an alias. The source is a table/view name or
  // a parenthesized subquery.
  private val aliasOpt =
    "(?:\\s+(?:AS\\s+)?(?!USING\\b|ON\\b|WHEN\\b)([A-Za-z_][\\w$]*))?"
  private val MergePattern =
    (s"(?is)\\A\\s*MERGE\\s+INTO\\s+$ident$aliasOpt" +
      s"\\s+USING\\s+(?:$ident|\\((.+)\\))$aliasOpt" +
      "\\s+ON\\s+(.+?)" +
      "\\s+WHEN\\s+MATCHED\\s+THEN\\s+UPDATE\\s+SET\\s+\\*" +
      "\\s+WHEN\\s+NOT\\s+MATCHED\\s+THEN\\s+INSERT\\s+\\*\\s*;?\\s*\\z").r
  private val MergeLoosePattern =
    s"(?is)\\A\\s*MERGE\\s+INTO\\s+$ident\\b.*".r
  // DML on snapshot tables (Delta's DELETE/UPDATE/COPY INTO). Gated on
  // the graft catalog name at the call site — DELETE/UPDATE against
  // any other table must flow to the session parser untouched. The
  // UPDATE's lazy SET group splits at the first top-level WHERE; a
  // quoted string containing " where " inside a SET expression is out
  // of the supported shape (same regex-surface contract as MERGE).
  private val DeletePattern =
    s"(?is)\\A\\s*DELETE\\s+FROM\\s+$ident(?:\\s+WHERE\\s+(.+?))?\\s*;?\\s*\\z".r
  private val UpdatePattern =
    s"(?is)\\A\\s*UPDATE\\s+$ident\\s+SET\\s+(.+?)(?:\\s+WHERE\\s+(.+?))?\\s*;?\\s*\\z".r
  // INSERT INTO <graft table> <query> — the rest of the statement is a
  // query (SELECT … / VALUES …) parsed by the session parser inside
  // the command, so the full query grammar is available.
  private val InsertPattern =
    s"(?is)\\A\\s*INSERT\\s+INTO\\s+$ident\\s+((?:SELECT|VALUES|WITH|TABLE|\\().+?)\\s*;?\\s*\\z".r
  private val CopyIntoPattern =
    (s"(?is)\\A\\s*COPY\\s+INTO\\s+$ident\\s+FROM\\s+'([^']+)'" +
      "\\s+FILEFORMAT\\s*=\\s*([A-Za-z]+)\\s*;?\\s*\\z").r
  // CHECK constraints (Delta's ALTER TABLE … ADD/DROP CONSTRAINT).
  private val AddConstraintPattern =
    (s"(?is)\\A\\s*ALTER\\s+TABLE\\s+$ident\\s+ADD\\s+CONSTRAINT\\s+" +
      "([A-Za-z_][\\w$]*)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*\\z").r
  private val DropConstraintPattern =
    (s"(?is)\\A\\s*ALTER\\s+TABLE\\s+$ident\\s+DROP\\s+CONSTRAINT\\s+" +
      "([A-Za-z_][\\w$]*)\\s*;?\\s*\\z").r
  // Table properties (Delta's TBLPROPERTIES) + merge-on-read
  // maintenance (REORG … APPLY (PURGE)). Gated on the graft catalog
  // name — these are valid Spark statements for other tables and must
  // flow to the session parser untouched.
  private val SetPropsPattern =
    (s"(?is)\\A\\s*ALTER\\s+TABLE\\s+$ident\\s+SET\\s+TBLPROPERTIES\\s*" +
      "\\((.+)\\)\\s*;?\\s*\\z").r
  private val UnsetPropsPattern =
    (s"(?is)\\A\\s*ALTER\\s+TABLE\\s+$ident\\s+UNSET\\s+TBLPROPERTIES\\s*" +
      "\\((.+)\\)\\s*;?\\s*\\z").r
  private val ShowPropsPattern =
    s"(?is)\\A\\s*SHOW\\s+TBLPROPERTIES\\s+$ident\\s*;?\\s*\\z".r
  private val ReorgPattern =
    s"(?is)\\A\\s*REORG\\s+TABLE\\s+$ident\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*;?\\s*\\z".r
  // CTAS — `CREATE TABLE g.`root` PARTITIONED BY (c) AS SELECT …`:
  // the query text is re-parsed by the session parser inside the
  // command (InsertPattern's convention), so the full SELECT grammar
  // is available. Distinct suffix keeps it disjoint from SHALLOW
  // CLONE.
  private val CtasPattern =
    (s"(?is)\\A\\s*CREATE\\s+TABLE\\s+$ident\\s+PARTITIONED\\s+BY\\s*" +
      "\\(\\s*(?:`([^`]+)`|([A-Za-z_][\\w$]*))\\s*\\)\\s+AS\\s+(.+?)\\s*;?\\s*\\z").r
  // Column mapping DDL (Delta's ALTER TABLE … RENAME/DROP COLUMN under
  // column-mapping name mode) + metadata-only ADD COLUMN. Gated on the
  // graft catalog name — valid Spark DDL for other tables.
  private val colIdent = "(?:`([^`]+)`|([A-Za-z_][\\w$]*))"
  private val RenameColumnPattern =
    (s"(?is)\\A\\s*ALTER\\s+TABLE\\s+$ident\\s+RENAME\\s+COLUMN\\s+" +
      s"$colIdent\\s+TO\\s+$colIdent\\s*;?\\s*\\z").r
  private val DropColumnPattern =
    (s"(?is)\\A\\s*ALTER\\s+TABLE\\s+$ident\\s+DROP\\s+COLUMN\\s+" +
      s"$colIdent\\s*;?\\s*\\z").r
  private val AddColumnPattern =
    (s"(?is)\\A\\s*ALTER\\s+TABLE\\s+$ident\\s+ADD\\s+COLUMNS?\\s*" +
      s"\\(?\\s*$colIdent\\s+([A-Za-z_][\\w<>,() ]*?)\\s*\\)?\\s*;?\\s*\\z").r

  /** First non-null of a `colIdent` match's two groups (backtick-quoted
    * vs bare). */
  private def colOf(quoted: String, bare: String): String =
    Option(quoted).getOrElse(bare)

  /** Parse `'k' = 'v', 'k2' = 'v2'` (standard TBLPROPERTIES shape;
    * doubled '' escapes a quote inside either side). */
  def propertyAssignments(raw: String): Seq[(String, String)] = {
    val Pair = "\\A\\s*'((?:[^']|'')*)'\\s*=\\s*'((?:[^']|'')*)'\\s*\\z".r
    val parts = splitTopLevel(raw)
    require(parts.nonEmpty, "SET TBLPROPERTIES needs at least one 'key' = 'value'")
    val pairs = parts.map {
      case Pair(k, v) => (k.replace("''", "'"), v.replace("''", "'"))
      case other => throw new IllegalArgumentException(
        s"malformed TBLPROPERTIES entry (expected 'key' = 'value'): ${other.trim}")
    }
    require(pairs.map(_._1).distinct.size == pairs.size,
      s"TBLPROPERTIES sets a key twice: ${pairs.map(_._1).mkString(", ")}")
    pairs
  }

  /** Parse `'k', 'k2'` (UNSET TBLPROPERTIES shape). */
  def propertyKeys(raw: String): Seq[String] = {
    val Key = "\\A\\s*'((?:[^']|'')*)'\\s*\\z".r
    val parts = splitTopLevel(raw)
    require(parts.nonEmpty, "UNSET TBLPROPERTIES needs at least one 'key'")
    parts.map {
      case Key(k) => k.replace("''", "'")
      case other => throw new IllegalArgumentException(
        s"malformed UNSET TBLPROPERTIES entry (expected 'key'): ${other.trim}")
    }
  }

  /** Split on top-level commas, respecting single-quoted strings
    * (with '' escapes). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inStr = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { cur += c; if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true; cur += c
        case ',' => out += cur.toString; cur.clear()
        case x => cur += x
      }
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Is `name` configured as a graft snapshot catalog in the ACTIVE
    * session? Parse-time gate for the loose MERGE rejection: other
    * catalogs' MERGE statements must keep flowing to the session
    * parser untouched. */
  private def isGraftCatalogName(name: String): Boolean =
    SparkSession.getActiveSession.exists(
      _.conf.getOption(s"spark.sql.catalog.$name")
        .exists(_.contains(classOf[GraftCatalog].getSimpleName)))

  /** Extract the single merge key from the ON condition: a same-named
    * equality, optionally qualified by the target/source aliases or
    * names (`t.k = s.k`, `k = k`). Anything else — expressions,
    * AND-ed keys, differently-named columns — is rejected loudly. */
  private def mergeKey(cond: String, table: String, tAlias: Option[String],
                       srcIdent: Option[String], sAlias: Option[String]): String = {
    def strip(p: String): String =
      if (p.startsWith("`")) p.stripPrefix("`").stripSuffix("`") else p
    val qcol = s"(?:($part)\\.)?($part)"
    val Eq = s"(?is)\\A\\s*$qcol\\s*=\\s*$qcol\\s*\\z".r
    cond match {
      case Eq(q1, c1, q2, c2) if strip(c1) == strip(c2) =>
        // Qualifiers, when present, must be known names and must not
        // both point at the same side.
        val known: Set[String] =
          (tAlias.toSeq ++ sAlias.toSeq ++
            Seq(strip(table.split("\\.").last)) ++
            srcIdent.toSeq.map(s => strip(s.split("\\.").last))).map(_.toLowerCase).toSet
        val quals = Seq(q1, q2).flatMap(Option(_)).map(q => strip(q).toLowerCase)
        require(quals.distinct.size == quals.size,
          s"graft MERGE ON clause qualifies both sides with '${quals.head}' — " +
            "one side must be the target, the other the source")
        quals.foreach(q => require(known.contains(q),
          s"graft MERGE ON clause references unknown qualifier '$q' " +
            s"(known: ${known.mkString(", ")})"))
        strip(c1)
      case _ => throw new IllegalArgumentException(
        "graft MERGE supports a single same-named equality key: " +
          s"ON t.<key> = s.<key> — got: ${cond.trim}")
    }
  }

  /** Parse an UPDATE's SET list into (column, expression) pairs:
    * top-level commas separate assignments (commas inside parens,
    * single-quoted strings, or backticks don't — `SET a = f(x, y)` is
    * one assignment), and each splits at its first top-level `=`. */
  def assignments(raw: String): Seq[(String, String)] = {
    def splitTop(s: String, sep: Char): Seq[String] = {
      val out = Seq.newBuilder[String]
      val cur = new StringBuilder
      var depth = 0; var inStr = false; var inTick = false; var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (inStr) { cur += c; if (c == '\'') inStr = false }
        else if (inTick) { cur += c; if (c == '`') inTick = false }
        else c match {
          case '\'' => inStr = true; cur += c
          case '`' => inTick = true; cur += c
          case '(' => depth += 1; cur += c
          case ')' => depth -= 1; cur += c
          case x if x == sep && depth == 0 =>
            out += cur.toString; cur.clear()
          case x => cur += x
        }
        i += 1
      }
      out += cur.toString
      out.result()
    }
    splitTop(raw, ',').map { a =>
      val eq = {
        // First top-level '=' not part of <=, >=, !=, <>, ==.
        var depth = 0; var inStr = false; var inTick = false
        var found = -1; var i = 0
        while (i < a.length && found < 0) {
          val c = a.charAt(i)
          if (inStr) { if (c == '\'') inStr = false }
          else if (inTick) { if (c == '`') inTick = false }
          else c match {
            case '\'' => inStr = true
            case '`' => inTick = true
            case '(' => depth += 1
            case ')' => depth -= 1
            case '=' if depth == 0 &&
                (i == 0 || !"<>!=".contains(a.charAt(i - 1))) &&
                (i + 1 >= a.length || a.charAt(i + 1) != '=') => found = i
            case _ =>
          }
          i += 1
        }
        found
      }
      require(eq > 0, s"malformed UPDATE assignment (no '='): ${a.trim}")
      val colName = a.substring(0, eq).trim
      val exprText = a.substring(eq + 1).trim
      require(colName.matches(s"\\A$part\\z"),
        s"UPDATE SET target must be a single column name, got: $colName")
      require(exprText.nonEmpty, s"empty expression in assignment: ${a.trim}")
      val stripped = if (colName.startsWith("`"))
        colName.stripPrefix("`").stripSuffix("`") else colName
      (stripped, exprText)
    }
  }

  /** Tokenize a ZORDER-style column list with the same quoting rules
    * as table parts — a naive split(",") would mangle a backticked
    * name containing a comma. */
  private[graft] def identifierList(raw: String): Seq[String] =
    if (raw == null) Nil
    else part.r.findAllIn(raw).toSeq
      .map(p => if (p.startsWith("`")) p.stripPrefix("`").stripSuffix("`") else p)
      .filter(_.nonEmpty)

  /** Multipart name → snapshot root, through the named catalog's
    * warehouse/path rules. The catalog MUST be a [[GraftCatalog]] —
    * restoring an arbitrary catalog's table through snapshot-store
    * machinery would corrupt nothing (it only writes manifests) but
    * must still fail loudly as a user error. */
  private[graft] def resolveRoot(spark: SparkSession, table: Seq[String]): String = {
    require(table.size >= 2,
      s"qualify the table with its graft catalog: <catalog>.${table.mkString(".")}")
    val cm = spark.sessionState.catalogManager
    cm.catalog(table.head) match {
      case g: GraftCatalog =>
        g.tableRoot(Identifier.of(table.tail.init.toArray, table.last))
      case other => throw new IllegalArgumentException(
        s"'${table.head}' is not a graft snapshot catalog " +
          s"(got ${other.getClass.getName}); RESTORE/DESCRIBE HISTORY " +
          "apply only to graft snapshot tables")
    }
  }
}

/** `RESTORE TABLE t TO VERSION AS OF n`: publish a new version whose
  * manifest is byte-identical to version n's. Returns one row
  * (restored_to_version, committed_version) — like Delta, the restore
  * is itself a commit, so history is never rewritten. */
case class RestoreSnapshotCommand(table: Seq[String], version: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_to_version", LongType, nullable = false)(),
    AttributeReference("committed_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    val committed = SnapshotStore.restore(spark, root, version)
    Seq(Row(version, committed))
  }
}

/** `RESTORE TABLE t TO TIMESTAMP AS OF '<ts>'`: resolve the timestamp
  * to the latest version committed at or before it (`#ts` manifest
  * headers, [[SnapshotStore.versionAtTimestamp]]) and restore there —
  * the reference's timestamp-named backup recovery
  * (mongodb_loader.py:301-318) as one SQL statement. Same output shape
  * as the VERSION AS OF form. */
case class RestoreSnapshotToTimestampCommand(table: Seq[String], timestamp: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_to_version", LongType, nullable = false)(),
    AttributeReference("committed_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    val version = SnapshotStore.versionAtTimestamp(spark, root,
      graft.sinks.SnapshotSource.parseTimestampMillis(timestamp))
    val committed = SnapshotStore.restore(spark, root, version)
    Seq(Row(version, committed))
  }
}

/** `VACUUM t [RETAIN n HOURS]`: drop rolled-over manifests beyond the
  * keep window and sweep unreferenced data files older than the
  * retention (default 24h — the crash-orphan grace window; RETAIN 0
  * HOURS sweeps immediately, exactly like Delta's footgun). Returns
  * one row (path) for parity with Delta's VACUUM output. */
case class VacuumSnapshotCommand(table: Seq[String], retainHours: Option[Long],
                                 dryRun: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    val retainMillis = retainHours.map(_ * 3600L * 1000L)
      .getOrElse(24L * 3600 * 1000)
    if (dryRun)
      // Delta's VACUUM … DRY RUN: list what would go, delete nothing.
      SnapshotStore.vacuumDryRun(spark, root, retainMillis = retainMillis)
        .map(Row(_))
    else {
      SnapshotStore.vacuum(spark, root, retainMillis = retainMillis)
      Seq(Row(root))
    }
  }
}

/** `CREATE TABLE t2 SHALLOW CLONE t1 [VERSION AS OF n | TIMESTAMP AS
  * OF 'ts']` — Delta's zero-copy table fork, routed to
  * [[SnapshotStore.cloneTo]]: the new table's v1 references the
  * source's files absolutely, constraints and properties carry, and
  * the clone evolves independently. Returns one row
  * (path, source_version). */
case class CloneSnapshotCommand(target: Seq[String], source: Seq[String],
                                version: Option[Long], timestamp: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("source_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val srcRoot = GraftSqlParser.resolveRoot(spark, source)
    val dstRoot = GraftSqlParser.resolveRoot(spark, target)
    val v = (version, timestamp) match {
      case (Some(n), _) => Some(n)
      case (None, Some(ts)) => Some(SnapshotStore.versionAtTimestamp(
        spark, srcRoot, graft.sinks.SnapshotSource.parseTimestampMillis(ts)))
      case (None, None) => None
    }
    SnapshotStore.cloneTo(spark, srcRoot, dstRoot, v)
    Seq(Row(dstRoot, v.getOrElse(
      SnapshotStore.currentVersion(spark, srcRoot).getOrElse(0L))))
  }
}

/** `OPTIMIZE t [WHERE p] [ZORDER BY (a, b)]`: compact small files
  * (one file per partition), optionally interleave-sorting rows by
  * the Z-order keys for multi-column skipping. The table's partition
  * column resolves from the manifest's `#partcol` header (recorded by
  * every commit path — table metadata lives in the log, the Delta
  * convention), so the statement needs nothing but the table name.
  * `WHERE` scopes the rewrite to matching PARTITIONS (Delta's
  * partition-predicate OPTIMIZE): the predicate is evaluated
  * driver-side against the manifest's distinct partition values —
  * tiny by construction — so a 100 TB table compacts only its hot
  * partitions. Returns one row (path, version) — the committed
  * version, unchanged when nothing needed compacting. */
case class OptimizeSnapshotCommand(table: Seq[String], zorderBy: Seq[String],
                                   where: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    val cur = SnapshotStore.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    val partCol = SnapshotStore.partitionColumn(spark, root, cur).getOrElse(
      throw new IllegalStateException(
        s"manifest v$cur under $root predates partition-column metadata; " +
          "re-commit once through any SnapshotStore write path (or use the " +
          "Scala compact/compactZOrder API, which takes the column explicitly)"))
    val wanted: Option[Seq[String]] = where.map { w =>
      val parts = SnapshotStore.manifest(spark, root, cur)
        .map(_.partition).distinct
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(parts.map(Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(partCol,
            org.apache.spark.sql.types.StringType))))
      df.filter(org.apache.spark.sql.functions.expr(w))
        .collect().map(_.getString(0)).toSeq
    }
    val v =
      if (zorderBy.nonEmpty)
        SnapshotStore.compactZOrder(spark, root, partCol, zorderBy,
          partitions = wanted)
      else SnapshotStore.compact(spark, root, partCol, partitions = wanted)
    Seq(Row(root, v))
  }
}

/** `GENERATE symlink_format_manifest FOR TABLE t`: export the current
  * snapshot as a Hive/Presto/Trino/Athena symlink manifest (Delta's
  * GENERATE statement). Returns the export root. */
case class GenerateSymlinkCommand(table: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    Seq(Row(SnapshotStore.writeSymlinkManifest(spark, root).toString))
  }
}

/** `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED THEN INSERT *` — the reference's PRIMARY operator
  * (K1 bulk `ReplaceOne(upsert=true)`, mongodb_loader.py:93-197) in
  * its standard SQL spelling, routed to
  * [[SnapshotStore.mergeCommitOrdered]] with an EMPTY win order: SQL
  * MERGE has no version column — the source is authoritative, so a
  * matched row is replaced wholesale and an unmatched row inserts.
  * The table's partition column resolves from the `#partcol` manifest
  * header like OPTIMIZE's. Standard MERGE precondition enforced: a
  * source with duplicate keys fails loudly (two updates to one target
  * row are nondeterministic — Delta raises the same error). Returns
  * one row (path, version). */
case class MergeIntoSnapshotCommand(table: Seq[String],
                                    sourceIdent: Option[String],
                                    sourceQuery: Option[String],
                                    keyCol: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    val src = sourceQuery.map(spark.sql)
      .getOrElse(spark.table(sourceIdent.get))
    require(src.columns.contains(keyCol),
      s"merge key '$keyCol' is not a column of the source")
    val cur = SnapshotStore.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no committed snapshot under $root — MERGE needs an existing " +
          "table (create one with df.write.format(\"graft-snapshot\"))"))
    val partCol = SnapshotStore.partitionColumn(spark, root, cur).getOrElse(
      throw new IllegalStateException(
        s"manifest v$cur under $root predates partition-column metadata; " +
          "re-commit once through any SnapshotStore write path first"))
    require(src.columns.contains(partCol),
      s"the source must carry the table's partition column '$partCol'")
    // One cheap aggregate over the source: found duplicates would make
    // "UPDATE SET *" nondeterministic per key, so fail before writing.
    val dup = src.groupBy(org.apache.spark.sql.functions.col(keyCol))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .filter(org.apache.spark.sql.functions.col("n") > 1).limit(1).collect()
    if (dup.nonEmpty) throw new IllegalStateException(
      s"MERGE source has multiple rows for key ${dup.head.get(0)} — " +
        "a target row cannot be updated twice in one MERGE; " +
        "de-duplicate the source first")
    val v = SnapshotStore.mergeCommitOrdered(
      spark, src, root, keyCol, Seq.empty, partCol)
    Seq(Row(root, v))
  }
}

/** `DELETE FROM t [WHERE p]` on a snapshot table — the SQL spelling
  * of the predicate delete (K4 retention delete,
  * mongodb_loader.py:218-231's `delete_many`), routed to
  * [[SnapshotStore.deleteWhere]]: partition-bounded rewrite through
  * the file-skipping probe, TRUE rows removed, FALSE/NULL rows kept.
  * No WHERE deletes every row (the table stays readable as a valid
  * empty snapshot). Returns one row (path, version). */
case class DeleteFromSnapshotCommand(table: Seq[String], where: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    // Delta's opt-in: with graft.enableDeletionVectors = true the
    // delete is merge-on-read (a position-list commit, zero data
    // rewritten); otherwise the partition-bounded rewrite.
    val dv = SnapshotStore.tablePropertiesMap(spark, root)
      .get("graft.enableDeletionVectors").exists(_.equalsIgnoreCase("true"))
    val v = if (dv) SnapshotStore.deleteWhereDv(spark, root, where.getOrElse("true"))
            else SnapshotStore.deleteWhere(spark, root, where.getOrElse("true"))
    Seq(Row(root, v))
  }
}

/** `ALTER TABLE t SET TBLPROPERTIES ('k' = 'v', …)` — metadata-only
  * commit recording free-form table properties in the manifest log
  * (carried forward by every subsequent commit, like constraints).
  * Returns one row (path, version). */
case class SetPropertiesCommand(table: Seq[String],
                                props: Seq[(String, String)])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    Seq(Row(root, SnapshotStore.setProperties(spark, root, props)))
  }
}

/** `ALTER TABLE t UNSET TBLPROPERTIES ('k', …)` — metadata-only
  * removal; unknown keys fail loudly. Returns one row (path, version). */
case class UnsetPropertiesCommand(table: Seq[String], keys: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    Seq(Row(root, SnapshotStore.unsetProperties(spark, root, keys)))
  }
}

/** `SHOW TBLPROPERTIES t` — one (key, value) row per property of the
  * current version, key-ordered. */
case class ShowPropertiesCommand(table: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("value", org.apache.spark.sql.types.StringType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    SnapshotStore.tablePropertiesMap(spark, root).toSeq.sortBy(_._1)
      .map { case (k, v) => Row(k, v) }
  }
}

/** `REORG TABLE t APPLY (PURGE)` — rewrite deletion-vectored files
  * (materializing their deletes) and drop the DVs, bounding
  * merge-on-read amplification ([[SnapshotStore.purgeDeletionVectors]]).
  * Returns one row (path, version — unchanged when nothing carried a
  * DV). */
case class ReorgPurgeCommand(table: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    Seq(Row(root, SnapshotStore.purgeDeletionVectors(spark, root)))
  }
}

/** `UPDATE t SET c = e, … [WHERE p]` on a snapshot table, routed to
  * [[SnapshotStore.updateWhere]]: assignments evaluate against the
  * old row (standard UPDATE), cast back to each column's existing
  * type, partition-bounded rewrite. Returns one row (path, version). */
case class UpdateSnapshotCommand(table: Seq[String],
                                 assignments: Seq[(String, String)],
                                 where: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    // Same opt-in as DELETE: with graft.enableDeletionVectors the
    // update is merge-on-read (old copies DV'd, new copies appended).
    val dv = SnapshotStore.tablePropertiesMap(spark, root)
      .get("graft.enableDeletionVectors").exists(_.equalsIgnoreCase("true"))
    val v = if (dv) SnapshotStore.updateWhereDv(spark, root, assignments, where)
            else SnapshotStore.updateWhere(spark, root, assignments, where)
    Seq(Row(root, v))
  }
}

/** `INSERT INTO t <query>` on a snapshot table — the unkeyed append
  * in its standard SQL spelling, routed to
  * [[SnapshotStore.appendCommit]]: every existing file carries by
  * reference, the query's rows land as new files. Columns map
  * POSITIONALLY to the table schema (SQL INSERT semantics) and cast
  * to its types; a column-count mismatch fails loudly. Explicit
  * column lists are not supported (the positional contract is the
  * whole statement shape). Returns one row (path, version). */
case class InsertIntoSnapshotCommand(table: Seq[String], query: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    require(!query.trim.startsWith("("),
      "graft INSERT INTO does not support explicit column lists — " +
        "columns map positionally to the table schema")
    val cur = SnapshotStore.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    val partCol = SnapshotStore.partitionColumn(spark, root, cur).getOrElse(
      throw new IllegalStateException(
        s"manifest v$cur under $root predates partition-column metadata; " +
          "re-commit once through any SnapshotStore write path first"))
    // LOGICAL schema: positional alignment and the appended frame must
    // use the names users see (column mapping applied) — the write
    // path translates back to physical names itself; aligning to the
    // physical schema here would both count dropped columns in the
    // arity check and trip the reserved-physical-name guard.
    val target = SnapshotStore.logicalSchemaAt(spark, root, cur).getOrElse(
      SnapshotStore.readVersion(spark, root, cur).schema)
    val df = spark.sql(query)
    require(df.columns.length == target.fields.length,
      s"INSERT INTO provides ${df.columns.length} columns but the table " +
        s"has ${target.fields.length} (${target.fieldNames.mkString(", ")})")
    val aligned = df.select(df.columns.toSeq.zip(target.fields).map {
      case (c, f) =>
        org.apache.spark.sql.functions.col(c).cast(f.dataType).as(f.name)
    }: _*)
    Seq(Row(root, SnapshotStore.appendCommit(spark, aligned, root, partCol)))
  }
}

/** `COPY INTO t FROM '<dir>' FILEFORMAT = PARQUET` — idempotent bulk
  * file ingest ([[SnapshotStore.copyInto]]): only files never loaded
  * before are read and appended, atomically with the ledger recording
  * them, so a re-fired scheduler job is a no-op. Returns one row
  * (path, version, files_loaded). */
case class CopyIntoSnapshotCommand(table: Seq[String], source: String,
                                   format: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_loaded", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    val (v, n) = SnapshotStore.copyInto(spark, root, source, format)
    Seq(Row(root, v, n.toLong))
  }
}

/** `DESCRIBE DETAIL t` — Delta's one-row table summary: format,
  * location, partition column, current version and its commit
  * wall-clock, file/partition counts, total bytes (null when any
  * file lacks stats — derived metadata never blocks the view), and
  * the CHECK constraints in force. Metadata-priced at any size. */
case class DescribeDetailCommand(table: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = {
    import org.apache.spark.sql.types._
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        StructField("format", StringType, nullable = false),
        StructField("location", StringType, nullable = false),
        StructField("partition_column", StringType, nullable = true),
        StructField("version", LongType, nullable = false),
        StructField("committed_at", TimestampType, nullable = true),
        StructField("num_files", IntegerType, nullable = false),
        StructField("num_partitions", IntegerType, nullable = false),
        StructField("size_bytes", LongType, nullable = true),
        StructField("constraints", ArrayType(StringType), nullable = false))))
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    val cur = SnapshotStore.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    val m = SnapshotStore.manifest(spark, root, cur)
    val stats = SnapshotStore.statsFor(spark, root, cur)
    val size: java.lang.Long =
      if (m.forall(e => stats.contains(e.path)))
        java.lang.Long.valueOf(m.map(e => stats(e.path).len).sum)
      else null
    Seq(Row(
      "graft-snapshot", root,
      SnapshotStore.partitionColumn(spark, root, cur).orNull,
      cur,
      SnapshotStore.commitTimestamp(spark, root, cur)
        .map(new java.sql.Timestamp(_)).orNull,
      m.size, m.map(_.partition).distinct.size, size,
      SnapshotStore.tableConstraints(spark, root, cur)
        .map { case (n, e) => s"$n CHECK ($e)" }))
  }
}

/** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` — Delta's CHECK
  * constraint: existing data is validated first (a violating row
  * fails the statement), then a metadata-only commit records the
  * constraint; every subsequent write probes its batch against it.
  * Returns one row (path, version). */
case class AddConstraintCommand(table: Seq[String], name: String,
                                check: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    Seq(Row(root, SnapshotStore.addConstraint(spark, root, name, check)))
  }
}

/** `ALTER TABLE t DROP CONSTRAINT name` — metadata-only removal; an
  * unknown name fails loudly. Returns one row (path, version). */
case class DropConstraintCommand(table: Seq[String], name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    Seq(Row(root, SnapshotStore.dropConstraint(spark, root, name)))
  }
}

/** `CREATE TABLE t PARTITIONED BY (c) AS SELECT …` — CTAS onto a
  * snapshot table: the query (full session grammar) commits as
  * version 1 through the CREATE-ONLY primitive, so two racing
  * creators cannot both win and an existing table fails loudly
  * (CTAS is create-only; INSERT INTO / MERGE INTO modify). Returns
  * (path, version). */
case class CtasSnapshotCommand(table: Seq[String], partitionCol: String,
                               query: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    val df = spark.sql(query)
    require(df.columns.contains(partitionCol),
      s"CTAS query lacks the declared partition column '$partitionCol' " +
        s"(columns: ${df.columns.mkString(", ")})")
    SnapshotStore.commitIfAbsent(spark, df, root, partitionCol) match {
      case Some(v) => Seq(Row(root, v))
      case None => throw new IllegalStateException(
        s"CREATE TABLE AS failed: $root already holds a snapshot — " +
          "CTAS is create-only; use INSERT INTO / MERGE INTO to modify")
    }
  }
}

/** `ALTER TABLE t RENAME COLUMN a TO b` — Delta's column-mapping
  * rename: metadata-only, zero files rewritten (parquet keeps the
  * original physical name; reads alias it). Returns (path, version). */
case class RenameColumnCommand(table: Seq[String], from: String, to: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    Seq(Row(root, SnapshotStore.renameColumn(spark, root, from, to)))
  }
}

/** `ALTER TABLE t DROP COLUMN c` — metadata-only tombstone; data
  * files are untouched and time travel before the drop still shows
  * the column. Returns (path, version). */
case class DropColumnCommand(table: Seq[String], name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    Seq(Row(root, SnapshotStore.dropColumn(spark, root, name)))
  }
}

/** `ALTER TABLE t ADD COLUMN c TYPE` — metadata-only schema widening
  * (existing files read the column as typed nulls). Returns
  * (path, version). */
case class AddColumnCommand(table: Seq[String], name: String, ddl: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    Seq(Row(root, SnapshotStore.addColumn(spark, root, name, ddl)))
  }
}

/** `DESCRIBE HISTORY t`: the per-version audit view
  * ([[SnapshotStore.history]] — version, operation, file/partition
  * counts, files added/removed, total rows), newest first like
  * Delta's. */
case class DescribeHistoryCommand(table: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      SnapshotStore.historySchema)

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, table)
    SnapshotStore.history(spark, root)
      .orderBy(org.apache.spark.sql.functions.col("version").desc)
      .collect().toSeq
  }
}
