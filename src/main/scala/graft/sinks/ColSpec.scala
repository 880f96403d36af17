package graft.sinks

/** A column LIST where the snapshot store used to take exactly one
  * column name — the spelling surface for multi-column partitioning
  * (`PARTITIONED BY (supplier_id, status)` — the compound-index access
  * patterns the reference declares, schemas/unified_product_schema.py:
  * 244-248) and composite merge/delete keys (a natural key like
  * (supplier_id, sku)).
  *
  * Call sites may spell it three ways, all equivalent:
  *  - `"supplier"` — one column (every pre-existing call site);
  *  - `"supplier,status"` — comma-separated list (the manifest-header
  *    and DataSource-option form);
  *  - `Seq("supplier", "status")` — programmatic.
  * The implicit conversions live on the companion, so the expected
  * type alone brings them into scope — no import needed. */
final case class ColSpec(cols: Seq[String]) {
  require(cols.forall(c => c != null && c.nonEmpty),
    s"empty column name in spec $cols")
  require(cols.distinct.size == cols.size,
    s"duplicate column in spec ${cols.mkString(", ")}")
  def isEmpty: Boolean = cols.isEmpty
  def nonEmpty: Boolean = cols.nonEmpty
  def size: Int = cols.size
  def contains(c: String): Boolean = cols.contains(c)
  /** Manifest-header / option form (comma-joined). */
  def header: String = cols.mkString(",")
  override def toString: String = header
}

object ColSpec {
  val none: ColSpec = ColSpec(Nil)

  /** Parse the comma-separated spelling (empty/blank → no columns). */
  def parse(s: String): ColSpec =
    ColSpec(if (s == null || s.trim.isEmpty) Nil
            else s.split(",").toSeq.map(_.trim).filter(c => !c.isEmpty))

  import scala.language.implicitConversions
  implicit def fromString(s: String): ColSpec = parse(s)
  implicit def fromSeq(s: Seq[String]): ColSpec = ColSpec(s.toList)
}
