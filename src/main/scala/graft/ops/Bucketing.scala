package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed, sorted table writes — the storage-layout lever for repeated
  * joins/aggregations on the same key at 100 TB.
  *
  * `bucketBy(n, key) + sortBy(key)` persists the shuffle: every
  * subsequent equi-join or aggregation on `key` between tables bucketed
  * with the same bucket count reads co-partitioned (and pre-sorted)
  * buckets, so the planner inserts NO Exchange — the cost that dominates
  * a fact-to-fact join at cluster scale is paid once at write time
  * instead of per query. (The reference has no table layout concept at
  * all; this is Spark-native surface per SURVEY.md §7.5's scale goals.)
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed + sorted on `key`.
    * Joins between two tables written with the same `buckets` on their
    * join keys plan shuffle-free (see PlanSpec "bucketed tables join
    * without an exchange").
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Write `df` hive-style partitioned by `partCol`: a filter on that
    * column prunes whole directories at plan time (PartitionFilters in
    * the scan) — at 100 TB the difference between listing one partition
    * and scanning the table. Keep partition cardinality modest (a
    * date/category column, never a key).
    */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)
}
