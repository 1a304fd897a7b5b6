package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the validation gate a pipeline runs
  * before publishing a table. Each rule reduces to ONE aggregation
  * returning (rule, n_violations); `run` unions the one-row results, so a
  * full rule suite costs one pass per rule with nothing collected to the
  * driver beyond the counts.
  *
  * At 100 TB: notNull/inRange are map-side partial counts (no shuffle of
  * data rows); unique ships one count-distinct sketch-shuffle; foreignKey
  * is a broadcast/shuffled anti join counting orphans.
  */
object Quality {

  def notNull(df: DataFrame, colName: String): DataFrame =
    df.agg(count(when(col(colName).isNull, 1)).as("n_violations"))
      .select(lit(s"not_null:$colName").as("rule"), col("n_violations"))

  def inRange(df: DataFrame, colName: String, loIncl: Any, hiExcl: Any): DataFrame =
    df.agg(count(when(col(colName) < lit(loIncl) || col(colName) >= lit(hiExcl)
        || col(colName).isNull, 1)).as("n_violations"))
      .select(lit(s"in_range:$colName").as("rule"), col("n_violations"))

  def unique(df: DataFrame, colName: String): DataFrame =
    df.agg((count(col(colName)) - countDistinct(col(colName))).as("n_violations"))
      .select(lit(s"unique:$colName").as("rule"), col("n_violations"))

  /** Orphan rows: values of `fkCol` absent from `dim`'s `pkCol`. */
  def foreignKey(df: DataFrame, fkCol: String, dim: DataFrame,
                 pkCol: String): DataFrame =
    df.join(dim.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(s"foreign_key:$fkCol").as("rule"), col("n_violations"))

  /** Union the one-row rule results into the validation report. */
  def run(rules: Seq[DataFrame]): DataFrame =
    rules.reduce(_ union _)

  /** Privacy audit before publishing a derived table: per
    * quasi-identifier equivalence class, the class size (k-anonymity —
    * classes smaller than `k` re-identify their members) and the number
    * of DISTINCT sensitive values (l-diversity — classes with fewer than
    * `l` reveal the sensitive attribute even when k holds). One
    * aggregation over the QI key: class sizes partial-count map-side;
    * the distinct-sensitive count shuffles (qi, sensitive) pairs once.
    * Classes are bounded by the QI domain, not the row count, so the
    * report stays small at any scale.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 k: Long, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_risk", col("class_size") < k)
      .withColumn("l_risk", col("n_sensitive") < l)
  }

  /** Distribution-drift monitor between two dataset versions: per
    * category bin, both counts and the bin's two-sample chi-square
    * contribution N·(o1·n2 − o2·n1)² / (n1·n2·(o1+o2)) — algebraically
    * identical to Σ(o−e)²/e with pooled expectations, but the numerator
    * and denominator stay INTEGERS until one final division+multiply, so
    * the statistic hash-matches across engines (PSI/KL need per-bin
    * logs; at a fixed bin count chi-square ranks drift the same way).
    * Compare Σ contrib against χ²(bins−1) offline for a trigger.
    *
    * Scale shape: each side reduces map-side to its histogram (bins ≪
    * rows), then a bins-sized full-outer join + a broadcast of the
    * 1-row totals. Nothing row-sized ever shuffles.
    */
  def histDrift(oldDf: DataFrame, newDf: DataFrame, binCol: String): DataFrame =
    histDriftCounts(
      oldDf.groupBy(col(binCol).as("bin")).agg(count(lit(1)).as("o1")),
      newDf.groupBy(col(binCol).as("bin")).agg(count(lit(1)).as("o2")))

  /** [[histDrift]] over PRE-AGGREGATED histograms `(bin, o1)` / `(bin,
    * o2)` — for counts that already exist (a streaming aggregation's
    * state, a stored profile) so the raw rows are never re-scanned.
    */
  def histDriftCounts(h1: DataFrame, h2: DataFrame): DataFrame = {
    val j = h1.join(h2, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("o1"), lit(0L)).as("o1"),
        coalesce(col("o2"), lit(0L)).as("o2"))
    val tot = j.agg(sum("o1").as("n1"), sum("o2").as("n2"))
    val dlt = col("o1") * col("n2") - col("o2") * col("n1")
    j.crossJoin(broadcast(tot))
      .select(col("bin"), col("o1").cast("int").as("o1"),
        col("o2").cast("int").as("o2"),
        round((col("n1") + col("n2")).cast("double") *
          ((dlt * dlt).cast("double") /
            (col("n1") * col("n2") * (col("o1") + col("o2"))).cast("double")),
          6).as("contrib"))
  }
}
