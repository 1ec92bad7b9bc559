package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Parse a Go-style DURATION STRING to MICROSECONDS (long) — the
  * reference schema's `requestTime` / `timeToFirstByte` columns
  * (reference README.md:183-184) are exactly this shape: a signed
  * sequence of `<number><unit>` segments, e.g. `"5.862332ms"`,
  * `"1m30.5s"`, `"12.3µs"`. Units: ns, us/µs/μs, ms, s, m, h.
  *
  * Malformed input (empty, unknown unit, no digits) yields NULL —
  * dirty production logs must not kill a 100 TB scan; filter
  * `IS NULL` to audit. Sub-microsecond remainders truncate toward
  * zero. Codegen'd: the parse is a single static call inside
  * whole-stage codegen, no UDF boxing. */
case class ParseDuration(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"parse_duration requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_duration"

  override def nullSafeEval(v: Any): Any =
    ParseDuration.parse(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("dur")
      s"""
         |java.lang.Long $r = graft.functions.ParseDuration.parse($c.toString());
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ParseDuration =
    copy(child = newChild)
}

object ParseDuration {

  /** Nanoseconds per unit; unknown unit → reject. */
  private def unitNs(u: String): Double = u match {
    case "ns" => 1.0
    case "us" | "µs" | "μs" => 1000.0
    case "ms" => 1e6
    case "s" => 1e9
    case "m" => 6e10
    case "h" => 3.6e12
    case _ => -1.0
  }

  /** Total microseconds, truncated toward zero; null = malformed.
    * Accumulates in double nanoseconds (exact to 2^53 ns ≈ 104 days —
    * far past any request duration). */
  private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'

  def parse(s0: String): java.lang.Long = {
    if (s0 == null) return null
    val s = s0.trim
    if (s.isEmpty) return null
    var i = 0
    var neg = false
    s.charAt(0) match {
      case '-' => neg = true; i = 1
      case '+' => i = 1
      case _ => ()
    }
    if (i >= s.length) return null
    if (s.substring(i) == "0") return java.lang.Long.valueOf(0L) // Go's zero
    var totalNs = 0.0
    var segments = 0
    while (i < s.length) {
      var digits = 0
      var intPart = 0.0
      // ASCII digits only: Character.isDigit admits Unicode digits,
      // whose c - '0' value is garbage — those must fall to NULL, not
      // a silently wrong duration
      while (i < s.length && isAsciiDigit(s.charAt(i))) {
        intPart = intPart * 10 + (s.charAt(i) - '0'); i += 1; digits += 1
      }
      var frac = 0.0
      var scale = 1.0
      if (i < s.length && s.charAt(i) == '.') {
        i += 1
        while (i < s.length && isAsciiDigit(s.charAt(i))) {
          frac = frac * 10 + (s.charAt(i) - '0'); scale *= 10; i += 1
          digits += 1
        }
      }
      if (digits == 0) return null
      val uStart = i
      while (i < s.length && !isAsciiDigit(s.charAt(i)) && s.charAt(i) != '.') i += 1
      val ns = unitNs(s.substring(uStart, i))
      if (ns < 0) return null
      totalNs += (intPart + frac / scale) * ns
      segments += 1
    }
    if (segments == 0) return null
    val us = (totalNs / 1000.0).toLong
    java.lang.Long.valueOf(if (neg) -us else us)
  }

  /** Column API: duration string → microseconds (null if malformed). */
  def parseDuration(c: Column): Column =
    GraftBridge.column(ParseDuration(GraftBridge.expression(c)))
}
