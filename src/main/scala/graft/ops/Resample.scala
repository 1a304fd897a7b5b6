package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: bucket an event stream onto a fixed-step grid,
  * materialize the missing buckets (the "spine"), and forward-fill gaps —
  * the alignment step before any windowed feature or rate computation.
  *
  * Scale shape: ONE shuffle on the key. The per-key min/max aggregation,
  * the spine explode, the left join back to the observed buckets, and the
  * forward-fill window all hash-partition on the same key column, so
  * Catalyst reuses a single exchange. The spine is generated per key with
  * `sequence()` — row fan-out is (key's time span / step), never a global
  * cross join against a calendar table.
  */
object Resample {

  /** Per-key counts on an hourly grid over each key's observed [min, max]
    * hour span, with nulls (empty buckets) and a forward-filled copy.
    * Output: key, h, n (null on gaps), n_fill (last seen count).
    */
  def hourlyCountsFilled(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val h = date_trunc("hour", col(tsCol))
    val observed = df.groupBy(col(keyCol), h.as("h")).agg(count(lit(1)).as("n"))
    val spine = observed.groupBy(keyCol)
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col(keyCol),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
    val w = Window.partitionBy(keyCol).orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(observed, Seq(keyCol, "h"), "left")
      .select(col(keyCol), col("h"), col("n"),
        last("n", ignoreNulls = true).over(w).as("n_fill"))
  }
}
