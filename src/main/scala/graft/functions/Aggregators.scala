package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed Aggregator UDAFs (SURVEY.md §2.7's UDAF extension point — the
  * Spark analogue of "bring your own column builder").
  *
  * State is exact decimal, not double: partial aggregation merges in
  * arbitrary partition order, so a floating-point accumulator would make
  * results run-order-dependent. Exact sums + one IEEE division at finish
  * reproduce bit-identically on any engine (the project-wide oracle
  * float discipline).
  */
object Aggregators {

  type BD = java.math.BigDecimal

  final case class WavgBuf(num: BD, den: BD)

  /** Weighted average: finish = toDouble(Σ num) / toDouble(Σ den) —
    * BigDecimal.doubleValue and SQL CAST(decimal AS DOUBLE) are both
    * correctly rounded, so the oracle form
    * `CAST(SUM(num) AS DOUBLE) / CAST(SUM(den) AS DOUBLE)` matches.
    */
  val weightedAvg: Aggregator[(BD, BD), WavgBuf, Double] =
    new Aggregator[(BD, BD), WavgBuf, Double] {
      private val Z = java.math.BigDecimal.ZERO
      override def zero: WavgBuf = WavgBuf(Z, Z)
      override def reduce(b: WavgBuf, a: (BD, BD)): WavgBuf = {
        val (num, den) = a
        WavgBuf(
          if (num == null) b.num else b.num.add(num),
          if (den == null) b.den else b.den.add(den))
      }
      override def merge(x: WavgBuf, y: WavgBuf): WavgBuf =
        WavgBuf(x.num.add(y.num), x.den.add(y.den))
      override def finish(b: WavgBuf): Double =
        b.num.doubleValue() / b.den.doubleValue()
      override def bufferEncoder: Encoder[WavgBuf] = Encoders.product[WavgBuf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
