package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Range-bucketed global order statistics — cumulative counts and global
  * ranks WITHOUT an unpartitioned `Window.orderBy` (which plans a
  * single-task sort of its whole input: fine on a 125-value domain,
  * fatal on a continuous score column where distinct values ≈ rows).
  *
  * The shape is the classic two-pass distributed prefix sum:
  *  1. sample `O(buckets)` boundary values by DETERMINISTIC md5 order
  *     (the hash-reservoir discipline of [[Sketch.quantileSketch]] — no
  *     RNG, so re-runs bucket identically), broadcast them as literals,
  *     and tag every row with its range-bucket id;
  *  2. within each bucket, an ordinary PARTITIONED window computes local
  *     running sums / row numbers (one hash exchange on the bucket id,
  *     each task sorts |values|/buckets rows);
  *  3. per-bucket totals (≤ `buckets` rows by construction — the
  *     codebook rule) collect to the driver, prefix-sum in Scala, and
  *     return as a LITERAL lookup array, so the cross-bucket offset is
  *     a narrow `element_at` projection — no join, no second window,
  *     and the WHOLE plan carries no unpartitioned Window node
  *     (PlanSpec holds that as a regression guard);
  *  4. global cum/rank = bucket offset + local value.
  *
  * The result is bit-identical to the single-task `Window.orderBy` form
  * for ANY boundary choice — bucket edges only move work, never results —
  * so the DuckDB oracles of the rank-statistic family replay unchanged.
  *
  * At 100 TB: the sample pass is a TakeOrderedAndProject (parallel
  * partial top-k, k = `8·buckets` values to the driver — the codebook
  * rule), and the heavy frame shuffles ONCE on the bucket id with
  * `buckets` ≈ 4× the shuffle parallelism, so no task ever holds more
  * than ~1/buckets of the value domain.
  */
object Ranks {

  private def defaultBuckets(df: DataFrame): Int =
    math.max(4, df.sparkSession.sessionState.conf.numShufflePartitions) * 4

  /** Boundary literals: a deterministic md5-ordered sample of the order
    * tuple, re-sorted by the tuple itself, read at the `buckets`-iles.
    * Returns one (per-column literal) row per boundary, possibly fewer
    * than `buckets − 1` (duplicates collapse; small inputs undersample —
    * both only merge buckets, never change results).
    */
  private def boundaries(df: DataFrame, ordCols: Seq[String],
                         buckets: Int): Seq[Seq[Any]] = {
    val k = math.max(buckets * 8, 256)
    val h = md5(concat_ws("|", ordCols.map(c => col(c).cast("string")): _*))
    val smp = df.select(ordCols.map(col): _*)
      .orderBy(h +: ordCols.map(col): _*).limit(k)
      .orderBy(ordCols.map(col): _*)
      .collect()
    val n = smp.length
    (1 until buckets).map(i => i * n / buckets).filter(_ > 0).distinct
      .map(i => ordCols.indices.map(j => smp(i - 1).get(j)))
  }

  /** `Σ_b 1[(row tuple) > boundary_b]` — the range-bucket id as one
    * codegen'd literal expression (lexicographic tuple compare).
    */
  private def bucketExpr(ordCols: Seq[String], bnds: Seq[Seq[Any]]): Column =
    bnds.map { b =>
      // row > boundary lexicographically: some strict prefix ties, next
      // column exceeds. Nulls order FIRST (matching Window asc order):
      // null > x is null -> when() falls to otherwise(0) = never above.
      val gt = ordCols.indices.map { j =>
        val tie = (0 until j).map(i => col(ordCols(i)) <=> lit(b(i)))
          .foldLeft(lit(true))(_ && _)
        tie && col(ordCols(j)) > lit(b(j))
      }.reduce(_ || _)
      when(gt, 1).otherwise(0)
    }.reduceOption(_ + _).getOrElse(lit(0))

  /** Per-bucket totals → cross-bucket prefix offsets as literal lookup
    * arrays, one per summed column: ONE aggregate job collects ≤
    * `nBuckets` rows (bounded by construction — the codebook rule), the
    * prefix sums run in Scala, and each array ships back inside the
    * plan, so applying an offset is a narrow `element_at(arr, __b + 1)`
    * projection — no join, no window, no extra exchange.
    */
  private def offsetArrays(parted: DataFrame, sums: Seq[(String, Column)],
                           nBuckets: Int): Map[String, Column] = {
    val tot = parted.groupBy("__b")
      .agg(sums.head._2.cast("long").as(sums.head._1),
        sums.tail.map { case (nm, c) => c.cast("long").as(nm) }: _*)
      .collect()
    val byBucket = tot.map(r => r.getInt(0) -> r).toMap
    sums.zipWithIndex.map { case ((nm, _), j) =>
      val offs = new Array[Long](nBuckets)
      var acc = 0L
      (0 until nBuckets).foreach { b =>
        offs(b) = acc
        acc += byBucket.get(b).map(_.getLong(j + 1)).getOrElse(0L)
      }
      nm -> element_at(array(offs.map(lit): _*), col("__b") + 1)
    }.toMap
  }

  /** Adds an INCLUSIVE global running sum `<c>_cum` for each count column
    * to a per-VALUE aggregate frame (one row per distinct `valCol`).
    * Exclusive forms derive as `cum − c`; all sums are exact integers, so
    * the output is bit-identical to the unpartitioned-window form.
    */
  def prefixCounts(g: DataFrame, valCol: String, cntCols: Seq[String],
                   buckets: Int = 0): DataFrame = {
    val b = if (buckets > 0) buckets else defaultBuckets(g)
    val bnds = boundaries(g, Seq(valCol), b)
    val parted = g.withColumn("__b", bucketExpr(Seq(valCol), bnds))
    val w = Window.partitionBy("__b").orderBy(valCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cntCols.foldLeft(parted) { (df, c) =>
      df.withColumn(s"__c_$c", sum(col(c)).over(w))
    }
    val offs = offsetArrays(parted, cntCols.map(c => c -> sum(col(c))),
      bnds.length + 1)
    cum.select(g.columns.map(col) ++
      cntCols.map(c => (col(s"__c_$c") + offs(c)).as(s"${c}_cum")): _*)
  }

  /** Adds the global 1-based rank by `(sortCol asc, tieCol asc)` as
    * `rankName` — `row_number() over (ORDER BY sort, tie)` without the
    * single-task sort. Descending orders: negate/invert `sortCol` at the
    * call site. `tieCol` must be unique (it completes the total order).
    */
  def globalRank(df: DataFrame, sortCol: Column, tieCol: Column,
                 rankName: String, buckets: Int = 0): DataFrame = {
    val b = if (buckets > 0) buckets else defaultBuckets(df)
    val tagged = df.withColumn("__sv", sortCol).withColumn("__tv", tieCol)
    val bnds = boundaries(tagged, Seq("__sv", "__tv"), b)
    val parted = tagged.withColumn("__b", bucketExpr(Seq("__sv", "__tv"), bnds))
    val w = Window.partitionBy("__b").orderBy(col("__sv"), col("__tv"))
    val rn = parted.withColumn("__rn", row_number().over(w).cast("long"))
    val offs = offsetArrays(parted, Seq("n" -> count(lit(1))), bnds.length + 1)
    rn.withColumn(rankName, offs("n") + col("__rn"))
      .drop("__b", "__sv", "__tv", "__rn")
  }

  /** NTILE(k) of a precomputed global rank — Spark/DuckDB NTILE
    * semantics exactly: the first `n mod k` tiles hold `n div k + 1`
    * rows, the rest `n div k`. Lazy CaseWhen keeps the second branch's
    * division un-evaluated when `n < k` (q = 0 rows only ever take the
    * first branch).
    */
  def ntileOfRank(rank: Column, n: Column, k: Int): Column = {
    val q = floor(n / k).cast("long")
    val rem = pmod(n, lit(k)).cast("long")
    val r = rank.cast("long")
    when(r <= rem * (q + 1),
        floor((r - 1) / (q + 1)).cast("int") + 1)
      .otherwise((rem + floor((r - rem * (q + 1) - 1) / q).cast("long"))
        .cast("int") + 1)
  }
}
