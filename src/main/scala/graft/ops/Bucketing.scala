package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

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

  /** Z-order (Morton) key: interleave the low `bits` bits of two
    * non-negative integer columns. Sorting/range-partitioning a write by
    * this key clusters rows that are close in BOTH dimensions into the
    * same files, so parquet min/max footer stats prune scans filtered on
    * either column (or a box on both) — the multi-dimensional analogue of
    * partitioning by one column, and the standard layout trick for a
    * 100 TB table queried along two independent axes.
    *
    * Pure integer bit arithmetic (shift/mask/or), codegen'd end to end
    * and reproducible in any engine.
    */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      (shiftleft(shiftright(x.cast("long"), i).bitwiseAND(1L), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), i).bitwiseAND(1L), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Compact a fragmented parquet directory (the small-files problem: a
    * streaming sink or over-parallel writer leaving thousands of KB-scale
    * files whose open/footer overhead dominates scans at 100 TB). Reads
    * the directory, coalesces to `ceil(rows / rowsPerFile)` partitions —
    * `coalesce`, not `repartition`: narrow, no shuffle — and rewrites to
    * a temp sibling before atomically swapping into place.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              rowsPerFile: Long = 1000000L): Long = {
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile).toInt
    val tmp = path.stripSuffix("/") + ".__compact_tmp"
    spark.read.parquet(path).coalesce(files)
      .write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    n
  }

  /** Backfill via DYNAMIC partition overwrite: rewrite only the hive
    * partitions present in `updates`, leaving every other directory
    * untouched — the reprocess-one-day primitive. At 100 TB the
    * difference between this and static overwrite mode is rewriting one
    * partition vs truncating the whole table; the write itself stays a
    * narrow per-partition job.
    */
  def backfillPartitions(updates: DataFrame, path: String,
                         partCol: String): Unit = {
    val spark = updates.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "dynamic")
    try updates.write.mode("overwrite").partitionBy(partCol).parquet(path)
    finally spark.conf.set(key, prior)
  }

  /** Sort-by-zorder write: range-partition + sort by the interleaved key,
    * then write parquet — each output file covers a compact Morton range,
    * i.e. a small rectangle in (x, y) space.
    */
  def writeZordered(df: DataFrame, path: String, x: String, y: String,
                    bits: Int = 16, files: Int = 32): Unit =
    df.withColumn("__z", zorderKey(col(x), col(y), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Hilbert-curve distance of (x, y) on a 2^bits grid — the
    * locality-preserving alternative to [[zorderKey]]: consecutive keys
    * are always grid-adjacent (Morton jumps at quadrant seams), so
    * range-partitioned files cover tighter rectangles and footer min/max
    * prune better on range predicates. The classic per-level
    * quadrant+rotation recurrence runs as a compiled codegen kernel
    * ([[graft.functions.HilbertKey]]): a column-fold formulation would
    * re-substitute x/y per level and grow the expression tree
    * exponentially, and the interpreted HOF `aggregate` fold it replaced
    * paid per-element lambda dispatch 16× per row (9.7 s → sub-second at
    * 1.5M rows). Integer-only: bit-exact in any engine (q_hilbert_layout
    * replays it as a recursive CTE).
    */
  def hilbertKey(x: Column, y: Column, bits: Int = 16): Column =
    graft.functions.HilbertKey(x, y, bits)

  /** [[writeZordered]]'s Hilbert sibling: range-partition + sort by the
    * curve distance, write parquet.
    */
  def writeHilbert(df: DataFrame, path: String, x: String, y: String,
                   bits: Int = 16, files: Int = 32): Unit =
    df.withColumn("__h", hilbertKey(col(x), col(y), bits))
      .repartitionByRange(files, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)

  /** Data-skipping effectiveness eval: simulate writing `files`
    * equal-count files under two layouts — `natural` (the incoming
    * `naturalOrd` order) and `clustered` (sorted by the predicate
    * column) — build each file's min/max zone map, and report how many
    * files a range predicate `[lo, hi)` must scan under each. This is
    * the quantitative case for [[writeZordered]]-style layout work: the
    * same query, the same data, orders of magnitude fewer files touched.
    * Rank passes are range-bucketed ([[Ranks.globalRank]] + exact NTILE
    * tiles, no single-task sort); everything after is files-sized.
    * `tieCol` must be unique (it completes both total orders).
    */
  def skippingEval(df: DataFrame, naturalOrd: Column, predCol: Column,
                   tieCol: Column, lo: Long, hi: Long,
                   files: Int): DataFrame = {
    val base = df.select(naturalOrd.as("ord"), predCol.as("p"),
        tieCol.as("id"))
      .localCheckpoint() // consumers: count + two rank passes
    val n = base.count()
    def layout(name: String, sortC: Column): DataFrame =
      Ranks.globalRank(base, sortC, col("id"), "rk")
        .withColumn("f", Ranks.ntileOfRank(col("rk"), lit(n), files))
        .groupBy("f")
        .agg(min("p").as("mn"), max("p").as("mx"), count(lit(1)).as("c"))
        .agg(count(lit(1)).cast("int").as("n_files"),
          coalesce(sum(when(col("mn") < hi && col("mx") >= lo, 1)), lit(0))
            .cast("int").as("n_hit"),
          coalesce(sum(when(col("mn") < hi && col("mx") >= lo, col("c"))),
            lit(0)).cast("long").as("rows_scanned"),
          sum(col("c")).cast("long").as("n_rows"))
        .select(lit(name).as("layout"), col("n_files"), col("n_hit"),
          col("rows_scanned"), col("n_rows"),
          round(lit(1d) - col("n_hit").cast("double")
            / col("n_files").cast("double"), 6).as("prune_rate"))
    layout("natural", col("ord")).union(layout("clustered", col("p")))
  }

  /** Compaction PLANNER (the analysis half of [[compact]]): given a file
    * inventory `(ordCol unique ascending id, sizeCol bytes)`, assign each
    * file to an output bin by its START OFFSET in the id-ordered byte
    * stream — `bin = (cumulative_bytes_before_file) / target` — and
    * report per bin the file count, exact byte total, id span, and fill
    * ratio. This is the deterministic sorted-order coalesce a lakehouse
    * maintenance job runs (ordering preserved for data-skipping; no
    * driver-side greedy loop): the cumulative sum comes from
    * [[Ranks.prefixCounts]] — bucket-partitioned prefix sums, no
    * single-task window — so the plan itself scales to inventories of
    * millions of files. Bins overshoot `target` by at most one file,
    * the classic next-fit guarantee.
    */
  def compactionPlan(files: DataFrame, ordCol: String, sizeCol: String,
                     targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val c = Ranks.prefixCounts(
      files.select(col(ordCol), col(sizeCol)), ordCol, Seq(sizeCol))
    c.select(col(ordCol), col(sizeCol),
        // integral div (Column./ is IEEE): positive domain, so Spark's
        // truncating `div` == DuckDB's flooring `//`
        expr(s"(${sizeCol}_cum - $sizeCol) div $targetBytes").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).cast("int").as("n_files"),
        sum(sizeCol).cast("long").as("bytes"),
        min(ordCol).as("first_id"), max(ordCol).as("last_id"))
      .withColumn("fill",
        round(col("bytes").cast("double") / targetBytes.toDouble, 6))
  }
}
