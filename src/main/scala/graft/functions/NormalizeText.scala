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
  * over UDF); the DuckDB oracle mirror is
  * `regexp_replace(trim(lower(nfc_normalize(s))), '\s+', ' ', 'g')`.
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

  /** The normalization kernel (also invoked from generated code). */
  def compute(input: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer
      .normalize(input.toString, java.text.Normalizer.Form.NFC)
    val lowered = nfc.toLowerCase(java.util.Locale.ROOT)
    UTF8String.fromString(lowered.trim.replaceAll("\\s+", " "))
  }

  def apply(text: Column): Column =
    GraftBridge.column(NormalizeText(GraftBridge.expression(text)))
}
