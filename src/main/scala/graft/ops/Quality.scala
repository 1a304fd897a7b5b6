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
}
