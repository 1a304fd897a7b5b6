package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Custom codegen'd Catalyst expressions for the set-similarity and
  * vector-similarity hot paths (SURVEY.md preference order (b): a native
  * `Expression` with `doGenCode` beats composed higher-order functions,
  * which Spark evaluates interpreted per row).
  */

/** Count of common elements between two SORTED long arrays (ascending, no
  * duplicates) via a linear merge — O(n+m) with zero allocation, versus
  * `array_intersect`'s per-row hash-set build. Drives the pairwise
  * n-gram-Jaccard kernel where it runs once per candidate pair.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $i = 0, $j = 0;
         |final int $na = $a.numElements(), $nb = $b.numElements();
         |int ${ev.value}Acc = 0;
         |while ($i < $na && $j < $nb) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { ${ev.value}Acc++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Double-precision dot product of two float arrays: a tight fused loop in
  * generated code, replacing interpreted `aggregate(zip_with(...))` in the
  * cosine-kNN kernels. Accumulation order is index order — bit-identical
  * to the sequential-fold definition the oracle mirrors.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 distance between a float-array slice
  * `vec[offset .. offset+len-1]` (0-based) and a constant centroid — the
  * product-quantization encode/table kernel. One tiny expression node per
  * (subspace, centroid) instead of an unrolled ~100-node literal chain,
  * which kept the PQ plan's analysis/codegen cost proportional to
  * dim × k × m. Accumulation is index order from +0.0, bit-identical to
  * the left-associated chain `((d1*d1 + d2*d2) + ...)` the DuckDB oracle
  * computes via `list_sum(list_transform(...))`.
  */
case class FloatL2SubDist(child: Expression, offset: Int, centroid: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    FloatL2SubDist.compute(input.asInstanceOf[ArrayData], offset, centroid)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCentroid", centroid, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FloatL2SubDist$$.MODULE$$.compute($c, $offset, $cRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object FloatL2SubDist {
  /** Also invoked from generated code. */
  def compute(a: ArrayData, offset: Int, c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < c.length) {
      val d = a.getFloat(offset + i).toDouble - c(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

object ArrayKernels {
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedIntersectCount(GraftBridge.expression(a), GraftBridge.expression(b)))

  def floatDot(a: Column, b: Column): Column =
    GraftBridge.column(
      FloatDotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  def floatL2SubDist(vec: Column, offset: Int, centroid: Array[Double]): Column =
    GraftBridge.column(FloatL2SubDist(GraftBridge.expression(vec), offset, centroid))
}
