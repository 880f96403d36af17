package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: `deflate(text).length /
  * text.length` — templated/boilerplate/repetitive text compresses
  * far below natural prose, so corpus filters gate on this ratio
  * (low = machine-generated or duplicated structure, near/above 1 =
  * high-entropy noise like base64 blobs). The CCNet/RedPajama-style
  * heuristic, as a native expression because no built-in can express
  * it and a per-row Scala UDF would break whole-stage codegen.
  *
  * Scale notes: one Deflater per EXECUTOR THREAD (thread-local,
  * `reset()` between rows) — allocating the native zlib stream per
  * row would dominate the cost at corpus scale. The generated code is
  * a single static call, so the expression pipelines inside
  * whole-stage codegen like any built-in. Empty/whitespace-only text
  * returns 1.0 (defined, not null) so downstream gates need no
  * special case; the exact ratio depends on the JVM's zlib build, so
  * treat it as a FEATURE (compare within a corpus run), not a
  * portable constant — which is also why this signal is spec-tested
  * against ordering properties rather than oracle-replayed. */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def prettyName: String = "deflate_ratio"
  override def checkInputDataTypes(): TypeCheckResult =
    // NullType: a bare NULL argument — evaluates to null, accept it.
    if (child.dataType == StringType ||
        child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any =
    DeflateRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.DeflateRatio.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
  }

  /** Deflated-size / raw-size over the UTF-8 bytes; 1.0 for empty. */
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  /** Column wrapper (see also `graft_deflate_ratio` in SQL). */
  def apply(c: Column): Column = DeflateRatio.column(c)
  def column(c: Column): Column = Shim.column(DeflateRatio(Shim.expression(c)))
}

/** Luhn checksum validity over the digits of a string — the gate that
  * separates real payment-card numbers from arbitrary 13–19-digit
  * runs (order ids, tracking numbers) in PII scrubbing: redacting on
  * the bare digit-run regex mangles half a commerce corpus, so the
  * standard practice is regex candidates filtered by this checksum.
  * Non-digit characters (spaces, dashes) are skipped in place, so
  * the common "4111 1111 1111 1111" groupings validate directly.
  * Strings with fewer than 2 digits are false (never null): an
  * absent candidate is not a card. Native with codegen because it
  * runs inside HOF lambdas over every candidate of every document —
  * a Scala UDF there would leave whole-stage codegen.
  *
  * The checksum is pure integer arithmetic, so an external engine
  * replays it exactly — the oracle does, digit by digit. */
case class LuhnValid(child: Expression) extends UnaryExpression {
  override def prettyName: String = "luhn_valid"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType ||
        child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override protected def nullSafeEval(input: Any): Any =
    LuhnValid.valid(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.LuhnValid.valid($c)")

  override protected def withNewChildInternal(newChild: Expression): LuhnValid =
    copy(child = newChild)
}

object LuhnValid {
  /** Right-to-left Luhn fold over the ASCII digits of `s`, skipping
    * every non-digit byte: double each second digit from the right,
    * fold digit sums, valid iff total % 10 == 0 over ≥ 2 digits. */
  def valid(s: UTF8String): Boolean = {
    val bytes = s.getBytes
    var sum = 0
    var alt = false
    var nDigits = 0
    var i = bytes.length - 1
    while (i >= 0) {
      val b = bytes(i)
      if (b >= '0' && b <= '9') {
        var d = b - '0'
        if (alt) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        alt = !alt
        nDigits += 1
      }
      i -= 1
    }
    nDigits >= 2 && sum % 10 == 0
  }

  /** Column wrapper (see also `graft_luhn_valid` in SQL). */
  def apply(c: Column): Column = column(c)
  def column(c: Column): Column = Shim.column(LuhnValid(Shim.expression(c)))
}

/** Luhn-gated credit-card redaction as ONE positional pass: the same
  * leftmost-longest matcher that extracts each 13–19-character digit
  * run (spaces/dashes allowed) also rewrites it in place — `<CC>`
  * when its digits pass [[LuhnValid]], untouched otherwise. Doing
  * extraction and replacement in one positional walk is the
  * correctness point, not a micro-optimization: a replace-by-value
  * fold redacts every occurrence of a valid candidate STRING,
  * including where those same characters sit inside a longer,
  * checksum-invalid run (an order id containing a card-like
  * substring would be mangled). Here an embedded occurrence is never
  * touched because the matcher consumed the longer run it belongs to.
  * Native because no builtin can express "replace this match only if
  * a checksum of its digits passes". */
case class RedactCards(child: Expression) extends UnaryExpression {
  override def prettyName: String = "redact_cards"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType ||
        child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    RedactCards.redact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.RedactCards.redact($c)")

  override protected def withNewChildInternal(newChild: Expression): RedactCards =
    copy(child = newChild)
}

object RedactCards {
  /** Candidate shape: digit-bounded run of digits/spaces/dashes,
    * 13–19 chars — RE2-compatible, matched leftmost-longest (greedy),
    * so a run longer than one card is consumed as ONE candidate and
    * judged (and usually rejected) as a whole. */
  private val Candidate =
    java.util.regex.Pattern.compile("[0-9][0-9 -]{11,17}[0-9]")

  def redact(s: UTF8String): UTF8String = {
    val str = s.toString
    val m = Candidate.matcher(str)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder(str.length)
    var last = 0
    do {
      sb.append(str, last, m.start())
      val g = m.group()
      if (LuhnValid.valid(UTF8String.fromString(g))) sb.append("<CC>")
      else sb.append(g)
      last = m.end()
    } while (m.find())
    sb.append(str, last, str.length)
    UTF8String.fromString(sb.toString)
  }

  /** Column wrapper (see also `graft_redact_cards` in SQL). */
  def apply(c: Column): Column = column(c)
  def column(c: Column): Column = Shim.column(RedactCards(Shim.expression(c)))
}
