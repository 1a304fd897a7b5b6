package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass fixed-width line slicer: emits every column's trimmed cell in
  * a single forward walk over the line's code points.
  *
  * Semantically identical to the per-column composition
  * `trim(substring(line, offset+1, length), pad-by-alignment)` (rune
  * offsets = code points, exactly Spark's character-based substring;
  * clamping at end-of-line yields the same short/empty cells) — but the
  * composed form re-walks the line from position 0 once per column,
  * O(columns × line length) per row; wide fixed-width schemas (50+
  * columns are normal in mainframe extracts) pay that quadratically.
  * The kernel's cursor only moves forward, so the whole row costs one
  * O(line length) walk regardless of column count.
  *
  * Reference: the byte-cursor walk in
  * crates/evolution-builder/src/builder.rs:54-64 and the rune counting in
  * crates/evolution-parser/src/trimmer.rs:55-85 — re-expressed as a
  * Catalyst expression so the cast/null policy stays in built-in,
  * oracle-matchable Spark operators (FlfParse.castStrict).
  *
  * alignCodes: 0 = Left (rtrim), 1 = Right (ltrim), 2 = Center (both).
  */
case class SliceFixedLine(child: Expression, offsets: Seq[Int], lengths: Seq[Int],
                          alignCodes: Seq[Int], pads: Seq[Char])
    extends UnaryExpression {

  require(offsets.length == lengths.length && lengths.length == alignCodes.length &&
    alignCodes.length == pads.length, "column spec arrays must align")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val spec: SliceFixedLine.Spec =
    SliceFixedLine.Spec(offsets.toArray, lengths.toArray, alignCodes.toArray, pads.toArray)

  override def nullSafeEval(input: Any): Any =
    SliceFixedLine.compute(input.asInstanceOf[UTF8String], spec)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val specRef = ctx.addReferenceObj("sliceSpec", spec,
      "graft.functions.SliceFixedLine.Spec")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SliceFixedLine$$.MODULE$$.compute($c, $specRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SliceFixedLine {

  final case class Spec(offsets: Array[Int], lengths: Array[Int],
                        alignCodes: Array[Int], pads: Array[Char])

  /** The slicing kernel (also invoked from generated code). */
  def compute(input: UTF8String, spec: Spec): ArrayData = {
    val s = input.toString
    val n = spec.offsets.length
    val out = new Array[Any](n)
    // forward-only cursor over (code point position, char index)
    var curCp = 0
    var curIdx = 0
    def seek(cp: Int): Int = {
      if (cp < curCp) { curCp = 0; curIdx = 0 } // non-monotone schema: restart
      while (curCp < cp && curIdx < s.length) {
        curIdx += Character.charCount(s.codePointAt(curIdx))
        curCp += 1
      }
      curIdx
    }
    var i = 0
    while (i < n) {
      val startIdx = seek(spec.offsets(i))
      val endIdx = seek(spec.offsets(i) + spec.lengths(i))
      var lo = startIdx
      var hi = endIdx
      val pad = spec.pads(i)
      val align = spec.alignCodes(i)
      if (align != 0) while (lo < hi && s.charAt(lo) == pad) lo += 1      // ltrim
      if (align != 1) while (hi > lo && s.charAt(hi - 1) == pad) hi -= 1  // rtrim
      out(i) = UTF8String.fromString(s.substring(lo, hi))
      // cursor may now be mid-line at endIdx; seek handles both directions
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(line: Column, offsets: Seq[Int], lengths: Seq[Int],
            alignCodes: Seq[Int], pads: Seq[Char]): Column =
    GraftBridge.column(SliceFixedLine(GraftBridge.expression(line),
      offsets, lengths, alignCodes, pads))
}
