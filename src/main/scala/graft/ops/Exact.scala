package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The cross-engine float discipline shared by the statistics operators:
  * exact DECIMAL(38,0) integer sums, and logs of EXACT rationals
  * quantized ONCE to 1e12 fixed point so downstream reductions are
  * order-free integers. One definition — the quantization grain is an
  * engine-parity contract (every DuckDB oracle replays it), so it must
  * never drift between operators.
  */
private[ops] object Exact {

  /** Exact integer arithmetic domain: DECIMAL(38,0). */
  def d38(c: Column): Column =
    c.cast(org.apache.spark.sql.types.DecimalType(38, 0))

  /** ln(num/den) of an exact rational, quantized once to ×10¹² (LONG):
    * the single IEEE division + log any engine reproduces, floor(x+0.5)
    * rounding.
    */
  def qln12(num: Column, den: Column): Column =
    floor(log(num.cast("double") / den.cast("double")) * 1e12 + 0.5)
}
