package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles in one pass — semantically identical to
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * element_at(split(trim(text), "\\s+"), i..i+n-1))))` but evaluated as a
  * single Java kernel instead of four nested interpreted higher-order
  * functions (the dominant cost of every dedup operator at scale).
  *
  * Exact oracle contract: tokens are maximal runs split on the Java regex
  * `\s+` after trimming ASCII spaces; shingles join n consecutive tokens
  * with a single space; order of first occurrence, duplicates dropped.
  * (Set-consumers — minhash, Jaccard, array_min — are order-insensitive.)
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  // Codegen via a static kernel call: the generated code stays inside the
  // whole-stage span (no interpreter round-trip per row) and the kernel
  // itself is plain JIT-compiled Java.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // companion has no static forwarder (same-named case class) — go
      // through MODULE$ explicitly
      s"${ev.value} = graft.functions.WordShingles$$.MODULE$$.compute($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Word n-grams with duplicates kept (corpus frequency counting), same
  * tokenization contract as WordShingles; one pass, codegen'd.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WordShingles.computeNGrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles$$.MODULE$$.computeNGrams($c, $n);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordNGrams {
  def apply(text: Column, n: Int): Column =
    GraftBridge.column(WordNGrams(GraftBridge.expression(text), n))
}

object WordShingles {
  /** Shared tokenizer: trim ASCII space only (SQL trim semantics, not
    * String.trim's <=0x20), then split "\\s+" with limit -1 — keeping
    * trailing empty tokens exactly like Spark's split(trim(text),"\\s+")
    * and DuckDB's regexp_split_to_array, so text ending in \t or \n
    * (which the space-only trim preserves) tokenizes identically in the
    * kernels, the composed forms, and the oracle (ADVICE r1).
    */
  private[functions] def tokenize(input: UTF8String): Array[String] = {
    var s = input.toString
    var lo = 0; var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s = s.substring(lo, hi)
    if (s.isEmpty) Array.empty[String] else s.split("\\s+", -1)
  }

  /** N-grams with duplicates (also invoked from generated code). */
  def computeNGrams(input: UTF8String, n: Int): ArrayData = {
    val words = tokenize(input)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The shingling kernel (also invoked from generated code). */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val words = tokenize(input)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](words.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), n))
}
