package graft

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.FileStats
import graft.sinks.FileStats.{ColStats, FileStatsEntry}

/** Randomized soundness property for file skipping: whenever
  * `mayMatch` says a file CANNOT satisfy a filter, brute-force
  * evaluation over the file's actual rows must find no match — a
  * wrong skip silently drops rows, so this is the invariant that
  * matters. (Precision — skipping as much as possible — is exercised
  * by DataSkippingSpec's counted cases; this spec guards soundness
  * only.) Fixed seed: failures reproduce. */
class FileStatsPropertiesSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def numEntry(rows: Seq[Option[Long]]): FileStatsEntry = {
    val vs = rows.flatten
    val stats = ColStats("num", rows.count(_.isEmpty).toLong,
      if (vs.isEmpty) None else Some(vs.min.toString),
      if (vs.isEmpty) None else Some(vs.max.toString))
    FileStatsEntry(rows.size.toLong, 0L, Map("c" -> stats))
  }

  private def strEntry(rows: Seq[Option[String]]): FileStatsEntry = {
    val vs = rows.flatten
    val stats = ColStats("str", rows.count(_.isEmpty).toLong,
      if (vs.isEmpty) None else Some(vs.min),
      if (vs.isEmpty) None else Some(vs.max))
    FileStatsEntry(rows.size.toLong, 0L, Map("c" -> stats))
  }

  /** Row-level truth of a filter for Option-valued rows (SQL
    * semantics: any comparison with NULL is false). */
  private def eval[A](f: Filter, row: Option[A])(implicit ord: Ordering[A]): Boolean = f match {
    case And(l, r) => eval(l, row) && eval(r, row)
    case Or(l, r) => eval(l, row) || eval(r, row)
    case EqualTo(_, v) => row.contains(v)
    case GreaterThan(_, v) => row.exists(x => ord.gt(x, v.asInstanceOf[A]))
    case GreaterThanOrEqual(_, v) => row.exists(x => ord.gteq(x, v.asInstanceOf[A]))
    case LessThan(_, v) => row.exists(x => ord.lt(x, v.asInstanceOf[A]))
    case LessThanOrEqual(_, v) => row.exists(x => ord.lteq(x, v.asInstanceOf[A]))
    case In(_, vs) => row.exists(x => vs.contains(x))
    case IsNull(_) => row.isEmpty
    case IsNotNull(_) => row.isDefined
    case StringStartsWith(_, p) => row.exists(_.asInstanceOf[String].startsWith(p))
    case _ => false
  }

  private def numFilter(): Filter = {
    def lit(): Long = rnd.nextInt(60) - 30L
    rnd.nextInt(9) match {
      case 0 => EqualTo("c", lit())
      case 1 => GreaterThan("c", lit())
      case 2 => GreaterThanOrEqual("c", lit())
      case 3 => LessThan("c", lit())
      case 4 => LessThanOrEqual("c", lit())
      case 5 => In("c", Array.fill(3)(lit().asInstanceOf[Any]))
      case 6 => IsNull("c")
      case 7 => IsNotNull("c")
      case _ => if (rnd.nextBoolean()) And(numFilter(), numFilter())
                else Or(numFilter(), numFilter())
    }
  }

  private def strFilter(): Filter = {
    // Mixed ASCII and non-ASCII literals to hit the undecided path.
    def lit(): String = {
      val pool = "abâc"
      Seq.fill(1 + rnd.nextInt(3))(pool(rnd.nextInt(pool.length))).mkString
    }
    rnd.nextInt(8) match {
      case 0 => EqualTo("c", lit())
      case 1 => GreaterThan("c", lit())
      case 2 => LessThan("c", lit())
      case 3 => In("c", Array.fill(3)(lit().asInstanceOf[Any]))
      case 4 => StringStartsWith("c", lit())
      case 5 => IsNull("c")
      case 6 => IsNotNull("c")
      case _ => And(strFilter(), strFilter())
    }
  }

  test("numeric pruning is sound on 2000 random (file, filter) pairs") {
    (1 to 2000).foreach { i =>
      val rows = Seq.fill(1 + rnd.nextInt(20))(
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(60) - 30L))
      val e = numEntry(rows)
      val f = numFilter()
      if (!FileStats.mayMatch(e, f))
        assert(!rows.exists(r => eval(f, r)),
          s"case $i WRONG SKIP: filter=$f rows=$rows stats=$e")
    }
  }

  test("string pruning is sound on 2000 random (file, filter) pairs") {
    // Note: entry min/max use Java string order here while parquet
    // uses unsigned UTF-8 byte order; for this pool they agree on
    // ASCII and mayMatch must refuse to decide once any side is
    // non-ASCII — which is exactly what the property exercises.
    val pool = "abâc"
    (1 to 2000).foreach { i =>
      val rows = Seq.fill(1 + rnd.nextInt(20))(
        if (rnd.nextInt(5) == 0) None
        else Some(Seq.fill(1 + rnd.nextInt(3))(pool(rnd.nextInt(pool.length))).mkString))
      val e = strEntry(rows)
      val f = strFilter()
      if (!FileStats.mayMatch(e, f))
        assert(!rows.exists(r => eval(f, r)),
          s"case $i WRONG SKIP: filter=$f rows=$rows stats=$e")
    }
  }
}
