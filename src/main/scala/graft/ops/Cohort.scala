package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream: group users by the week of their
  * first event (the cohort), then for each week offset report how many of
  * them were still active — the standard growth-analytics matrix.
  *
  * Scale shape: two aggregations, both keyed on the user column (first-seen
  * week, then distinct active weeks), reusing one hash partitioning; the
  * final (cohort, offset) roll-up shuffles only cohort-cardinality rows.
  * Week offsets divide exact day differences of week-truncated timestamps,
  * and the retention ratio is one IEEE division — reproducible anywhere.
  */
object Cohort {

  /** Output: cohort_week, week_offset, n_active, n_cohort, retention. */
  def weeklyRetention(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts", maxOffset: Int = 8): DataFrame = {
    val w = date_trunc("week", col(tsCol))
    val firstWeek = events.groupBy(col(userCol).as("u"))
      .agg(min(w).as("cohort_week"))
    val activeWeeks = events
      .select(col(userCol).as("u"), w.as("week")).distinct()
    val joined = activeWeeks.join(firstWeek, "u")
      .withColumn("week_offset",
        (datediff(col("week").cast("date"), col("cohort_week").cast("date"))
          .cast("long") / 7).cast("int"))
      .filter(col("week_offset") <= maxOffset)
    val cohortSize = firstWeek.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_cohort"))
    joined.groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(cohortSize, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 6).as("retention"))
  }
}
