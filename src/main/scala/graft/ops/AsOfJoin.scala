package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}

/** As-of join: for each left row, the single right row with the greatest
  * `rightTime <= leftTime` within the same key.
  *
  * Composed from built-ins (preference order (a), SURVEY.md guidance): an
  * equi-join on the key plus a per-left-row argmax window. The equi-join
  * shuffles both sides on the key — the right partition is then scanned
  * per left row, so this is appropriate when per-key right cardinality is
  * bounded (dimension-history tables). For unbounded right sides a custom
  * sort-merge SparkPlan is the upgrade path.
  *
  * Ties on `rightTime` break deterministically by the highest `tieCol`.
  */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   tieCol: String, leftId: String): DataFrame = {
    val joined = left.join(right,
      left(leftKey) === right(rightKey) && right(rightTime) <= left(leftTime),
      "inner")
    val w = Window.partitionBy(left(leftId))
      .orderBy(right(rightTime).desc, right(tieCol).desc)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
