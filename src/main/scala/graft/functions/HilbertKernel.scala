package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Hilbert-curve distance kernel: the canonical per-level
  * quadrant+rotation recurrence (reflection at the FULL grid size, so
  * coordinates stay in [0, 2^bits)) as one compiled loop. Replaces the
  * interpreted higher-order `aggregate` fold, whose per-element lambda
  * dispatch dominated the layout write at millions of rows — same
  * integers, bit-for-bit (property-tested against the reference
  * recurrence and the recursive-CTE oracle).
  */
object HilbertKernel {

  /** (x, y) → distance along the order-`bits` Hilbert curve. Also
    * invoked from generated code.
    */
  def xy2d(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    val nm1 = (1L << bits) - 1L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = nm1 - x; y = nm1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"hilbert_key supports 1..31 bits, got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_key expects (BIGINT, BIGINT), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any =
    HilbertKernel.xy2d(l.asInstanceOf[Long], r.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertKernel$$.MODULE$$.xy2d($a, $b, $bits);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HilbertKey {
  def apply(x: Column, y: Column, bits: Int): Column =
    GraftBridge.column(HilbertKey(
      GraftBridge.expression(x.cast("long")),
      GraftBridge.expression(y.cast("long")), bits))
}
