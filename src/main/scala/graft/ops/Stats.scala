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
}
