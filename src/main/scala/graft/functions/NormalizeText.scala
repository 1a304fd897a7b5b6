package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for dedup/tokenization pipelines:
  * Unicode NFC (composed form — "é" as one code point, not e + combining
  * accent, so visually identical strings hash identically), locale-free
  * lowercasing (Locale.ROOT — no Turkish-İ surprises from the JVM
  * default locale), and whitespace canonicalization (trim + collapse
  * runs to a single space). Spark has no NFC built-in, so this is a
  * compiled kernel per the engine's preference order (native Expression
  * over UDF); the DuckDB oracle mirror uses the same explicit
  * whitespace class: `regexp_replace(regexp_replace(lower(
  * nfc_normalize(s)), '^[ \t\n\r\f\x0B]+|[ \t\n\r\f\x0B]+$', '', 'g'),
  * '[ \t\n\r\f\x0B]+', ' ', 'g')`.
  * A pure narrow projection wherever it appears.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeText$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NormalizeText {

  // The whitespace class is spelled out EXPLICITLY — not \s, not
  // String.trim — because the engines disagree at the edges of both:
  // Java's trim strips every char <= U+0020 (controls included), RE2's
  // \s lacks \x0B. The explicit class is identical in Java regex and
  // RE2, so the kernel and the DuckDB oracle mirror agree byte-for-byte
  // on any input. Patterns compile once, not per row.
  private val WsEdge =
    java.util.regex.Pattern.compile("^[ \\t\\n\\r\\f\\x0B]+|[ \\t\\n\\r\\f\\x0B]+$")
  private val WsRun =
    java.util.regex.Pattern.compile("[ \\t\\n\\r\\f\\x0B]+")

  /** The normalization kernel (also invoked from generated code). */
  def compute(input: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer
      .normalize(input.toString, java.text.Normalizer.Form.NFC)
    val lowered = nfc.toLowerCase(java.util.Locale.ROOT)
    val trimmed = WsEdge.matcher(lowered).replaceAll("")
    UTF8String.fromString(WsRun.matcher(trimmed).replaceAll(" "))
  }

  def apply(text: Column): Column =
    GraftBridge.column(NormalizeText(GraftBridge.expression(text)))
}
