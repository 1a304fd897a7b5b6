package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Second-moment statistics (variance / stddev / covariance / correlation /
  * regression slope) computed from EXACT decimal power sums, combined into
  * doubles with one fixed sequence of IEEE operations at the end.
  *
  * Spark's built-in `stddev`/`corr` accumulate doubles in partition order,
  * so their low bits vary with partitioning and engine — unusable for a
  * hash-checked oracle and, at 100 TB, unstable across re-runs. Here every
  * aggregation is a decimal sum (associative, exact, still map-side
  * partial-aggregated — one shuffle of six numbers per group), and the
  * float combination happens once per GROUP, not per row, so determinism
  * costs nothing at scale.
  */
object Stats {

  /** Per-group n, mean/var/stddev of x, covar/corr/OLS-slope of (x, y).
    * All outputs derive from {n, Σx, Σx², Σy, Σy², Σxy} — the same six
    * sums a distributed sketch would ship — via the textbook
    * `n·Σx² - (Σx)²` forms evaluated in doubles.
    */
  def moments(df: DataFrame, groupCol: String, xCol: String, yCol: String,
              p: Int = 12, s: Int = 2): DataFrame = {
    val x = col(xCol).cast(s"decimal($p,$s)")
    val y = col(yCol).cast(s"decimal($p,$s)")
    val sums = df.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(x).cast("double").as("sx"), sum(x * x).cast("double").as("sxx"),
      sum(y).cast("double").as("sy"), sum(y * y).cast("double").as("syy"),
      sum(x * y).cast("double").as("sxy"))
    val n = col("n").cast("double")
    val varxNum = n * col("sxx") - col("sx") * col("sx")
    val varyNum = n * col("syy") - col("sy") * col("sy")
    val covNum = n * col("sxy") - col("sx") * col("sy")
    sums.select(col(groupCol), col("n"),
      round(col("sx") / n, 6).as("mean_x"),
      round(varxNum / (n * (n - 1)), 6).as("var_x"),
      round(sqrt(varxNum / (n * (n - 1))), 6).as("std_x"),
      round(covNum / (n * (n - 1)), 6).as("covar_xy"),
      round(covNum / (sqrt(varxNum) * sqrt(varyNum)), 6).as("corr_xy"),
      round(covNum / varxNum, 6).as("slope_xy"))
  }

  /** Anomaly z-score of an integer metric against its trailing window
    * (`lookback` prior rows, current row excluded). The window sums are
    * integer — exact under any evaluation order, so segment-tree vs
    * streaming window implementations agree bit-for-bit — and the z-score
    * is one fixed double combination per row. Rows without a full trailing
    * window emit null (warm-up).
    *
    * Scale shape: one hash partitioning on the partition column; the
    * window never holds more than `lookback` longs per partition.
    */
  def trailingZScore(df: DataFrame, partCol: String, ordCol: String,
                     metricCol: String, lookback: Int = 24): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCol).orderBy(ordCol)
      .rowsBetween(-lookback, -1)
    val m = col(metricCol).cast("long")
    val base = df.withColumn("w_n", count(lit(1)).over(w))
      .withColumn("w_s1", sum(m).over(w))
      .withColumn("w_s2", sum(m * m).over(w))
    val n = col("w_n").cast("double")
    val s1 = col("w_s1").cast("double")
    val s2 = col("w_s2").cast("double")
    val varNum = n * s2 - s1 * s1
    val z = (m.cast("double") - s1 / n) / sqrt(varNum / (n * (n - 1)))
    base.withColumn("zscore",
        when(col("w_n") === lookback && varNum =!= 0.0, round(z, 6)))
      .drop("w_n", "w_s1", "w_s2")
  }
}
