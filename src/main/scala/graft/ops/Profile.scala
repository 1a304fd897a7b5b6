package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality pre-flight a pipeline
  * runs before trusting a new 100 TB drop: per-column non-null count,
  * exact distinct count, and min/max (stringified for a uniform schema).
  *
  * All columns profile in a SINGLE scan: one aggregate computes every
  * per-column statistic (Spark plans the multi-distinct via Expand — one
  * pass over the data with a row-fanout of n_cols, aggregated map-side),
  * then `stack` unpivots the one-row result into long format. Never one
  * job per column.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    } :+ count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nn`, `${c}__nd`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    wide.selectExpr("__total as n_rows",
        s"stack(${cols.size}, $stackArgs) as " +
          "(col_name, n_nonnull, n_distinct, min_s, max_s)")
      .select("col_name", "n_rows", "n_nonnull", "n_distinct", "min_s", "max_s")
  }

  /** Gini impurity (1 − Σ pᵢ²) per categorical column — the concentration
    * diagnostic: 0 = one value dominates entirely, → 1 = evenly spread
    * over many values. Counts are exact (value-count aggregation per
    * column, decimal squares so 100 TB-scale counts cannot overflow); the
    * impurity is one fixed double combination `(t² − Σc²) / t²`.
    */
  def giniImpurity(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "giniImpurity requires at least one column")
    val perCol = cols.map { c =>
      val counts = df.groupBy(col(c)).agg(count(lit(1)).as("c"))
      val sums = counts.agg(
        count(lit(1)).as("n_distinct"),
        sum(col("c")).cast("double").as("t"),
        sum(col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
          .cast("double").as("sq"))
      sums.select(lit(c).as("col_name"), col("n_distinct"),
        round((col("t") * col("t") - col("sq")) / (col("t") * col("t")), 6)
          .as("gini"))
    }
    perCol.reduce(_ union _)
  }
}
