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
}
