package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token statistics in one pass — the integer ingredients
  * every downstream ratio (type-token ratio, mean token length, quality
  * score) derives from with plain IEEE divisions:
  *
  *   n_tokens     == size(split(trim(text), "\\s+"))       (limit -1:
  *                   empty text tokenizes to [""], count 1 — exactly the
  *                   composed form and the DuckDB oracle)
  *   n_distinct   == size(array_distinct(tokens))
  *   sum_len      == aggregate(tokens, 0L, acc + length(t))  (length =
  *                   code points, matching Spark length() and DuckDB)
  *   est_subword  == aggregate(tokens, 0L, acc + ceil(length(t)/4.0))
  *   n_stop       == size(filter(tokens, t IN stopwords))
  *
  * Replaces two interpreted aggregate() lambdas plus repeated token
  * splits (projection collapse re-inlines the split per consumer) with a
  * single compiled pass.
  */
case class TextStats(child: Expression, stopwords: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("est_subword", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopRef = ctx.addReferenceObj("stopwords", stopSet, "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextStats$$.MODULE$$.compute($c, $stopRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextStats {

  /** The stats kernel (also invoked from generated code). */
  def compute(input: UTF8String, stopwords: java.util.HashSet[String]): InternalRow = {
    var s = input.toString
    var lo = 0; var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s = s.substring(lo, hi)
    // limit -1 and NO empty guard: "" splits to [""] like Spark/DuckDB
    val words = s.split("\\s+", -1)
    val distinct = new java.util.HashSet[String](words.length * 2)
    var sumLen = 0L
    var subword = 0L
    var nStop = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      val len = w.codePointCount(0, w.length) // length() = code points
      sumLen += len
      subword += (len + 3) / 4 // == ceil(len/4.0) for len >= 0
      if (stopwords.contains(w)) nStop += 1
      distinct.add(w)
      i += 1
    }
    new GenericInternalRow(Array[Any](
      words.length, distinct.size, sumLen, subword, nStop))
  }

  def apply(text: Column, stopwords: Seq[String]): Column =
    GraftBridge.column(TextStats(GraftBridge.expression(text), stopwords))
}
