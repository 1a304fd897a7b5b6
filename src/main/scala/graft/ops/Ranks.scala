package graft.ops

import graft.functions.{BucketOffset, RangeBucketId}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.{Column, DataFrame}

/** Range-bucketed global order statistics — cumulative counts and global
  * ranks WITHOUT an unpartitioned `Window.orderBy` (which plans a
  * single-task sort of its whole input: fine on a 125-value domain,
  * fatal on a continuous score column where distinct values ≈ rows).
  *
  * The shape is the classic two-pass distributed prefix sum:
  *  1. sample `O(buckets)` boundary values by DETERMINISTIC md5 order
  *     (the hash-reservoir discipline of [[Sketch.quantileSketch]] — no
  *     RNG, so re-runs bucket identically), ship them inside ONE plan
  *     reference object, and tag every row with its range-bucket id by
  *     BINARY SEARCH ([[graft.functions.RangeBucketId]] — O(log buckets)
  *     per row, generated code size independent of the bucket count, so
  *     the cost stays flat as buckets scale with cluster parallelism);
  *  2. within each bucket, an ordinary PARTITIONED window computes local
  *     running sums / row numbers (one hash exchange on the bucket id,
  *     each task sorts |values|/buckets rows);
  *  3. per-bucket totals (≤ `buckets` rows by construction — the
  *     codebook rule) collect to the driver, prefix-sum in Scala, and
  *     apply as an O(1) [[graft.functions.BucketOffset]] array lookup —
  *     no join, no second window, and the WHOLE plan carries no
  *     unpartitioned Window node (PlanSpec holds that as a regression
  *     guard);
  *  4. global cum/rank = bucket offset + local value.
  *
  * The result is bit-identical to the single-task `Window.orderBy` form
  * for ANY boundary choice — bucket edges only move work, never results —
  * so the DuckDB oracles of the rank-statistic family replay unchanged.
  *
  * DETERMINISTIC-INPUT CONTRACT: these operators run the input frame in
  * FOUR separate Spark actions (size count, boundary sample, per-bucket
  * totals, final pass). The input must produce the same rows on each
  * execution —
  * parquet scans, checkpointed frames, and deterministic transforms
  * qualify; a frame built on `sample()`, round-robin `repartition()`, or
  * other nondeterministic expressions must be `localCheckpoint()`ed
  * first (every in-repo caller does), or the collected offsets can
  * disagree with the final pass.
  *
  * At 100 TB: the sample pass is a deterministic hash-threshold FILTER
  * (narrow scan, expected `max(8·buckets, 256)` rows to the driver —
  * the codebook rule; no Spark sort, no partitions×k driver merge), and
  * the heavy frame shuffles ONCE on the bucket id with `buckets` ≈ 4×
  * the shuffle parallelism, so no task ever holds more than ~1/buckets
  * of the value domain — and thanks to the binary-search kernel the
  * tagging cost no longer grows with that bucket count.
  */
object Ranks {

  private def defaultBuckets(df: DataFrame): Int =
    math.max(4, df.sparkSession.sessionState.conf.numShufflePartitions) * 4

  /** Boundary tuples in Catalyst internal form, sorted ascending.
    *
    * Sampling is a deterministic md5-THRESHOLD FILTER, never a Spark
    * sort: one partial-agg `count()` sizes the input, then rows whose
    * 60-bit tuple hash falls below `k/n · 2⁶⁰` collect to the driver
    * (expected `k = max(8·buckets, 256)` rows — the codebook rule; small
    * inputs collect whole). The earlier `orderBy(md5).limit(k)` form
    * planned a driver merge of `partitions × k` rows — and with a
    * re-sort on top, a full single-partition sort — so its cost grew
    * with BOTH buckets and parallelism; the filter is a narrow scan
    * whose cost is flat in the bucket count. The sample then sorts
    * DRIVER-SIDE with the kernel's own comparator (bit-equal to Spark's
    * asc NULLS FIRST order over internal values) and is read at the
    * `buckets`-iles. Undersampling (hash tail, duplicates) only merges
    * buckets, never changes results.
    */
  private def boundaries(df: DataFrame, ordCols: Seq[String],
                         buckets: Int): (Array[DataType], Array[Array[Any]]) = {
    val (t, b, _) = boundariesCounted(df, ordCols, buckets)
    (t, b)
  }

  /** [[boundaries]] plus the input row count the sampling pass already
    * paid for (r16): callers that need n anyway (ntile targets, lttb's
    * interior size) were re-counting the frame in a separate job.
    */
  private def boundariesCounted(df: DataFrame, ordCols: Seq[String],
                                buckets: Int,
                                knownRows: Long = -1L): (Array[DataType], Array[Array[Any]], Long) = {
    val types = ordCols.map(c => df.schema(c).dataType).toArray
    val (n, smpRows) = sampleRowsCounted(df, ordCols, math.max(buckets * 8, 256),
      knownRows)
    val rows = RangeBucketId.toInternal(types, smpRows)
    val spec = new RangeBucketId.Spec(types, Array.empty)
    java.util.Arrays.sort(rows, new java.util.Comparator[Array[Any]] {
      override def compare(a: Array[Any], b: Array[Any]): Int = spec.compare(a, b)
    })
    val m = rows.length
    val bnds = (1 until buckets).map(i => i * m / buckets).filter(_ > 0).distinct
      .map(i => rows(i - 1)).toArray
    (types, bnds, n)
  }

  /** The boundary sample itself: small inputs collect whole, larger ones
    * pass the md5-threshold filter. HARD CAP on driver traffic: the
    * filter admits an EXPECTED `k` rows only under the
    * one-row-per-distinct-tuple contract (callers pre-aggregate). If a
    * caller violates it, one hot tuple whose hash lands under the cut
    * would otherwise dump every one of its duplicate rows to the driver;
    * `limit(16k)` turns that failure mode into degraded (possibly
    * skewed) bucketing — safe, because bucket edges move work, never
    * results — instead of a driver OOM. The 16× headroom over the
    * expectation is Chernoff-far from binding on contract-respecting
    * input. `private[graft]` so RanksSpec can assert the bound on an
    * adversarial duplicate-heavy frame directly.
    */
  private[graft] def sampleRows(df: DataFrame, ordCols: Seq[String],
                                k: Int): Array[org.apache.spark.sql.Row] =
    sampleRowsCounted(df, ordCols, k)._2

  /** [[sampleRows]] plus the sizing count it already runs. `knownRows`
    * (r16): callers that already know the input's row count (a prior
    * bounded collect, a fused aggregate) pass it to skip the sizing
    * count job — one fewer driver round-trip per prefix pass.
    */
  private[graft] def sampleRowsCounted(df: DataFrame, ordCols: Seq[String],
                                       k: Int,
                                       knownRows: Long = -1L): (Long, Array[org.apache.spark.sql.Row]) = {
    val cap = 16 * k
    val base = df.select(ordCols.map(col): _*)
    val n = if (knownRows >= 0) knownRows else base.count()
    (n, if (n <= k) base.collect()
    else {
      val h = Pipeline.md5Hash60(
        concat_ws("|", ordCols.map(c => col(c).cast("string")): _*))
      val cut = math.ceil(k.toDouble / n * (1L << 60).toDouble).toLong
      val got = base.filter(h < lit(cut)).limit(cap + 1).collect()
      if (got.length > cap) {
        org.slf4j.LoggerFactory.getLogger(Ranks.getClass).warn(
          s"Ranks.boundaries: sample for ${ordCols.mkString(",")} hit the " +
            s"$cap-row cap (expected ~$k of $n) — input likely violates " +
            "the one-row-per-distinct-tuple contract; bucketing degrades " +
            "but results are unaffected")
        got.take(cap)
      } else got
    })
  }

  /** The range-bucket id column: binary search of the row tuple against
    * the sorted boundary list (asc NULLS FIRST, matching the window
    * order) — see [[graft.functions.RangeBucketId]].
    */
  private def bucketExpr(ordCols: Seq[String], types: Array[DataType],
                         bnds: Array[Array[Any]]): Column =
    RangeBucketId.fromInternal(ordCols.map(col), types, bnds)

  /** Per-bucket totals → cross-bucket prefix offsets: ONE aggregate job
    * collects ≤ `nBuckets` rows (bounded by construction — the codebook
    * rule), the prefix sums run in Scala, and each offset array ships
    * back as a single plan reference object, so applying an offset is an
    * O(1) [[graft.functions.BucketOffset]] lookup — no join, no window,
    * no extra exchange, no generated code growing with the bucket count.
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
      nm -> BucketOffset(col("__b"), offs)
    }.toMap
  }

  /** Driver-side small-input regime (r17, VERDICT r16 #4): when the
    * input has no more rows than the boundary SAMPLE would collect
    * anyway (n ≤ 8·buckets — the `sampleRowsCounted` small-input branch
    * already ships the whole ordCols projection to the driver), the
    * whole frame fits the driver BY THE SAME BOUND. So instead of
    * sampling boundaries, tagging buckets, running the partitioned
    * window and collecting per-bucket offsets — two extra driver
    * round-trips plus an exchange + a window in the consumer's plan,
    * each a multi-10-ms job-floor hit that dominates sub-second rank
    * passes — collect the frame ONCE, prefix-sum in Scala under the
    * SAME internal-value comparator the boundary sort uses
    * ([[graft.functions.RangeBucketId.Spec]] — bit-equal to Spark's asc
    * NULLS FIRST order), and return a LocalRelation. Bit-identical:
    * exact integer sums in the same total order, cum typed LongType as
    * in the distributed form (window sum of int/long is LongType).
    * Falls back (None) when a count column is non-integral or carries a
    * null — the window's null-skipping semantics are not worth
    * replicating for inputs no in-repo caller produces.
    */
  private def driverPrefixCounts(g: DataFrame, ordCols: Seq[String],
                                 cntCols: Seq[String], n: Long,
                                 k: Int): Option[DataFrame] = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    if (n > k || n > 65536) return None
    val intish = cntCols.forall { c =>
      val t = g.schema(c).dataType
      t == LongType || t == IntegerType
    }
    if (!intish) return None
    val rows = g.collect()
    val cntIdx = cntCols.map(g.schema.fieldIndex).toArray
    if (rows.exists(r => cntIdx.exists(r.isNullAt))) return None
    val ordTypes = ordCols.map(c => g.schema(c).dataType).toArray
    val ordIdx = ordCols.map(g.schema.fieldIndex)
    val spec = new RangeBucketId.Spec(ordTypes, Array.empty)
    val keys = RangeBucketId.toInternal(ordTypes,
      rows.map(r => Row.fromSeq(ordIdx.map(r.get))))
    val order = rows.indices.sortWith((a, b) => spec.compare(keys(a), keys(b)) < 0)
    val acc = new Array[Long](cntCols.length)
    val out = order.map { ri =>
      val r = rows(ri)
      val cums = cntIdx.indices.map { j =>
        acc(j) += r.get(cntIdx(j)).asInstanceOf[Number].longValue
        java.lang.Long.valueOf(acc(j))
      }
      Row.fromSeq(r.toSeq ++ cums)
    }
    val outSchema = StructType(g.schema.fields ++
      cntCols.map(c => StructField(s"${c}_cum", LongType, nullable = true)))
    Some(g.sparkSession.createDataFrame(
      java.util.Arrays.asList(out: _*), outSchema))
  }

  /** Adds an INCLUSIVE global running sum `<c>_cum` for each count column
    * to a per-VALUE aggregate frame (one row per distinct `valCol`).
    * Exclusive forms derive as `cum − c`; all sums are exact integers, so
    * the output is bit-identical to the unpartitioned-window form.
    */
  def prefixCounts(g: DataFrame, valCol: String, cntCols: Seq[String],
                   buckets: Int = 0, knownRows: Long = -1L): DataFrame =
    prefixCountsBy(g, Seq(valCol), cntCols, buckets, knownRows)

  /** Multi-column order variant: global running sums in `(ordCols…)`
    * lexicographic ascending order over a frame with one row per
    * distinct order TUPLE (descending components: negate at the call
    * site). This is the windowless replacement for
    * `SUM(c) OVER (ORDER BY o1, o2, …)`.
    */
  def prefixCountsBy(g: DataFrame, ordCols: Seq[String], cntCols: Seq[String],
                     buckets: Int = 0, knownRows: Long = -1L): DataFrame = {
    val b = if (buckets > 0) buckets else defaultBuckets(g)
    // small-input driver regime (r17): same sizing count as the sample
    // pass would run, then ONE collect replaces the whole bucket
    // machinery — see [[driverPrefixCounts]]
    val k = math.max(b * 8, 256)
    val n = if (knownRows >= 0) knownRows
            else g.select(ordCols.map(col): _*).count()
    driverPrefixCounts(g, ordCols, cntCols, n, k) match {
      case Some(local) => return local
      case None => ()
    }
    val (types, bnds, _) = boundariesCounted(g, ordCols, b, knownRows = n)
    val parted = g.withColumn("__b", bucketExpr(ordCols, types, bnds))
    val w = Window.partitionBy("__b").orderBy(ordCols.map(col): _*)
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
                 rankName: String, buckets: Int = 0): DataFrame =
    globalRankCounted(df, sortCol, tieCol, rankName, buckets)._1

  /** [[globalRank]] plus the input row count (r16): the boundary-sample
    * pass counts the frame anyway, so callers needing n for rank targets
    * (NTILE sizing, interior size in lttb) no longer pay a separate
    * count job over the same frame.
    */
  def globalRankCounted(df: DataFrame, sortCol: Column, tieCol: Column,
                        rankName: String,
                        buckets: Int = 0): (DataFrame, Long) = {
    val b = if (buckets > 0) buckets else defaultBuckets(df)
    val tagged = df.withColumn("__sv", sortCol).withColumn("__tv", tieCol)
    // small-input driver regime (r17, VERDICT r16 #4): n ≤ the sample
    // size means the boundary pass would collect every (sv, tv) anyway —
    // collect the tagged frame once, rank driver-side under the same
    // internal-value comparator, return a LocalRelation (no bucket
    // exchange, no window, no offset job). Rank is exact position in
    // the (sv asc, tv asc) total order — tieCol unique — so the result
    // is bit-identical to the distributed form.
    val k = math.max(b * 8, 256)
    val n = tagged.count()
    if (n <= k && n <= 65536) {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val rows = tagged.collect()
      val svIdx = tagged.schema.fieldIndex("__sv")
      val tvIdx = tagged.schema.fieldIndex("__tv")
      val ordTypes = Array(tagged.schema.fields(svIdx).dataType,
        tagged.schema.fields(tvIdx).dataType)
      val spec = new RangeBucketId.Spec(ordTypes, Array.empty)
      val keys = RangeBucketId.toInternal(ordTypes,
        rows.map(r => Row(r.get(svIdx), r.get(tvIdx))))
      val order = rows.indices.sortWith((a, c) => spec.compare(keys(a), keys(c)) < 0)
      val keep = tagged.schema.fields.indices
        .filterNot(i => i == svIdx || i == tvIdx)
      var rk = 0L
      val out = order.map { ri =>
        rk += 1
        Row.fromSeq(keep.map(rows(ri).get) :+ java.lang.Long.valueOf(rk))
      }
      val outSchema = StructType(keep.map(i => tagged.schema.fields(i)) :+
        StructField(rankName, LongType, nullable = false))
      return (df.sparkSession.createDataFrame(
        java.util.Arrays.asList(out: _*), outSchema), n)
    }
    val (types, bnds, _) = boundariesCounted(tagged, Seq("__sv", "__tv"), b,
      knownRows = n)
    val parted = tagged.withColumn("__b",
      bucketExpr(Seq("__sv", "__tv"), types, bnds))
    val w = Window.partitionBy("__b").orderBy(col("__sv"), col("__tv"))
    val rn = parted.withColumn("__rn", row_number().over(w).cast("long"))
    val offs = offsetArrays(parted, Seq("n" -> count(lit(1))), bnds.length + 1)
    (rn.withColumn(rankName, offs("n") + col("__rn"))
      .drop("__b", "__sv", "__tv", "__rn"), n)
  }

  /** 1-based rank of a SMALL frame (bounded by construction: the ≤ k
    * survivors of an `orderBy().limit(k)` top-k, a ≤ |groups| summary)
    * WITHOUT a Window node: one single-row aggregate packs
    * `(order tuple, payload)` structs, `sort_array` orders them, and
    * `posexplode` restores the rows with rank = position + 1.
    * `ordCols` must total-order the rows (include a unique tiebreak;
    * descending components: negate at the call site) and the whole
    * frame must fit one aggregate row — use [[globalRank]] for anything
    * that scales with the data.
    */
  def smallRank(df: DataFrame, ordCols: Seq[Column], rankName: String): DataFrame = {
    val cols = df.columns
    val ord = ordCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }
    df.select(struct(ord ++ cols.map(col): _*).as("__s"))
      .agg(sort_array(collect_list(col("__s"))).as("__a"))
      .select(posexplode(col("__a")).as(Seq("__i", "__e")))
      .select(cols.map(c => col("__e").getField(c).as(c)) :+
        (col("__i") + 1).cast("int").as(rankName): _*)
  }

  /** STRICT-prefix running minimum of a long column in `(ordCols…)`
    * ascending order — `MIN(v) OVER (ORDER BY … ROWS BETWEEN UNBOUNDED
    * PRECEDING AND 1 PRECEDING)` without the single-task sort, using the
    * same bucket machinery as [[prefixCountsBy]] (per-bucket exclusive
    * window min + driver-side exclusive prefix min of the ≤ `buckets`
    * per-bucket minima). Emits `<valCol>_premin`, with `Long.MaxValue`
    * as the empty-prefix sentinel (the first row globally) — callers
    * comparing `v < premin` get the usual "first row survives" semantics
    * for free. One row per distinct order tuple, deterministic-input
    * contract as above.
    */
  def prefixMinExclusive(g: DataFrame, ordCols: Seq[String], valCol: String,
                         buckets: Int = 0): DataFrame = {
    val b = if (buckets > 0) buckets else defaultBuckets(g)
    val (types, bnds) = boundaries(g, ordCols, b)
    val parted = g.withColumn("__b", bucketExpr(ordCols, types, bnds))
    val w = Window.partitionBy("__b").orderBy(ordCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("__lm", min(col(valCol)).over(w))
    val nBuckets = bnds.length + 1
    // an all-null bucket's min is null — treat it as "no contribution"
    // (MaxValue), matching the window form's null-skipping min; a bare
    // getLong would silently unbox null to 0 and poison every later
    // bucket's offset
    val tot = parted.groupBy("__b").agg(min(col(valCol)).cast("long").as("m"))
      .collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) Long.MaxValue else r.getLong(1)))
      .toMap
    val offs = new Array[Long](nBuckets)
    var acc = Long.MaxValue
    (0 until nBuckets).foreach { i =>
      offs(i) = acc
      acc = math.min(acc, tot.getOrElse(i, Long.MaxValue))
    }
    local.select(g.columns.map(col) :+
      least(coalesce(col("__lm").cast("long"), lit(Long.MaxValue)),
        BucketOffset(col("__b"), offs)).as(s"${valCol}_premin"): _*)
  }

  /** Exact interpolated percentiles WITHOUT the single-buffer collect:
    * Spark's `percentile()` (and any sort-based exact quantile) packs
    * every value of the group into ONE aggregation buffer — a superlinear
    * wall the moment the group scales with the data (measured 7.8× on a
    * 10× input). This form distinct-compresses the values (one
    * aggregate), takes bucket-partitioned prefix counts, and resolves
    * each target fraction's two order statistics by a broadcast join —
    * everything row-scaled stays narrow and partitioned. The
    * interpolation is h = p·(n−1), v = v_lo + (v_hi − v_lo)·(h − ⌊h⌋) —
    * the exact IEEE shape DuckDB `quantile_cont()` evaluates (bit-
    * identical); Spark's `percentile()` uses the algebraically-equal
    * two-sided lerp v_lo·(1−f) + v_hi·f, which can differ in the last
    * ulp — at the 6-dp publication grain the three always agree.
    * Returns one row per fraction: (i, p, value).
    */
  def percentilesExact(df: DataFrame, valCol: Column,
                       fractions: Seq[Double]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(p => p >= 0 && p <= 1),
      "fractions must lie in [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    // LAZY checkpoint + ONE fused sizing aggregate (r16): the stats job
    // below both materializes g (truncating its lineage for the three
    // later passes) and returns n = Σc AND |g| in one driver round-trip;
    // |g| feeds the prefix pass so its own sizing count job disappears.
    // The eager-checkpoint + count + prefix-count shape paid three jobs
    // for the same information.
    val g = df.select(valCol.as("v")).filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // consumers: sizing agg + the prefix pass
    val st = g.agg(sum("c"), count(lit(1))).collect()(0)
    val n = if (st.isNullAt(0)) 0L else st.getLong(0)
    require(n > 0, "percentilesExact: no non-null values")
    val cum = prefixCounts(g, "v", Seq("c"), knownRows = st.getLong(1))
      .localCheckpoint() // consumers: BOTH rank joins — without this the
      // whole prefix pipeline re-executes per order statistic
    val ranks = fractions.zipWithIndex.map { case (p, ix) =>
      val h = p * (n - 1) // 0-based interpolation position
      val lo = math.floor(h).toLong + 1
      (ix + 1, p, h - math.floor(h), lo, math.min(lo + 1, n))
    }.toDF("i", "p", "frac", "r_lo", "r_hi")
    def at(rCol: String, name: String): DataFrame =
      cum.crossJoin(broadcast(ranks))
        .filter(col(rCol) > col("c_cum") - col("c") &&
          col(rCol) <= col("c_cum"))
        .select(col("i"), col("v").cast("double").as(name))
    at("r_lo", "v_lo").join(at("r_hi", "v_hi"), "i")
      .join(broadcast(ranks.select("i", "p", "frac")), "i")
      .select(col("i"), col("p"),
        (col("v_lo") + (col("v_hi") - col("v_lo")) * col("frac"))
          .as("value"))
  }

  /** Per-GROUP exact interpolated percentiles — [[percentilesExact]]
    * without one call per group and without the per-group single-task
    * window a `partitionBy(group)` row_number would plan: ONE
    * lexicographic (group, value) prefix pass; each group's internal
    * offset is recovered distributedly as min(c_cum − c) over the group
    * (no driver ordering assumption); the per-group rank targets come
    * from the groups-BOUNDED count collect. Interpolation is the
    * [[percentilesExact]] shape — bit-identical to DuckDB
    * `quantile_cont GROUP BY`; Spark's `percentile()` lerp can differ in
    * the final ulp (see there). String group keys (the collected count
    * table types the rank frame). Returns (group, i, p, value).
    */
  def groupedPercentilesExact(df: DataFrame, grpCol: Column, valCol: Column,
                              fractions: Seq[Double]): DataFrame =
    groupedPercentilesExactCells(
      df.select(grpCol.as("g"), valCol.as("v"))
        .filter(col("v").isNotNull)
        .groupBy("g", "v").agg(count(lit(1)).as("c"))
        // lazy (r16): the groups-bounded stats collect is the
        // materializing action — eager paid one extra job
        .localCheckpoint(false), // consumers: group counts + prefix pass
      fractions)

  /** The exact regime over a PRE-COMPRESSED, checkpointed (g, v, c)
    * cell frame (one row per distinct group×value, c = multiplicity) —
    * split out (r16) so the dispatcher's probe and both regimes share
    * ONE compression scan of the input instead of re-aggregating the
    * raw frame per stage.
    */
  private def groupedPercentilesExactCells(g: DataFrame,
                                           fractions: Seq[Double]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(p => p >= 0 && p <= 1),
      "fractions must lie in [0, 1]")
    val spark = g.sparkSession
    import spark.implicits._
    // BOUNDED collect: one row per group. The same aggregate also
    // carries each group's CELL count, so Σ over the collected rows
    // sizes the prefix pass without its own count job (r16).
    val gstats = g.groupBy("g")
      .agg(sum("c").as("n"), count(lit(1)).as("cells")).collect()
    val counts = gstats.map(r => r.get(0) -> r.getLong(1))
    val totalCells = gstats.map(_.getLong(2)).sum
    // build the rank-target frame with the GROUP KEY'S OWN TYPE — an
    // asInstanceOf[String] here worked on string keys and became a
    // scale-dependent ClassCastException the moment the dispatcher
    // routed an int-keyed frame to this path (r10 review finding)
    val rankRows = counts.toSeq.flatMap { case (gk, n) =>
      fractions.zipWithIndex.map { case (p, ix) =>
        val h = p * (n - 1)
        val lo = math.floor(h).toLong + 1
        org.apache.spark.sql.Row(gk, ix + 1, p, h - math.floor(h), lo,
          math.min(lo + 1, n))
      }
    }
    val rankSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g", g.schema("g").dataType),
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("frac",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("r_lo",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("r_hi",
        org.apache.spark.sql.types.LongType)))
    import scala.jdk.CollectionConverters._
    val ranks = spark.createDataFrame(rankRows.asJava, rankSchema)
    val cum = prefixCountsBy(g, Seq("g", "v"), Seq("c"), knownRows = totalCells)
      .localCheckpoint() // consumers: offsets + both rank joins
    // null-safe keys (<=>): the NULL group must survive these joins —
    // standard GROUP BY semantics, and the buffered regime keeps it
    val off = cum.groupBy(col("g").as("g2"))
      .agg(min(col("c_cum") - col("c")).as("off"))
    val wg = cum.join(broadcast(off), col("g") <=> col("g2"))
      .select(col("g"), col("v"), col("c"), (col("c_cum") - col("off"))
        .as("gc"))
      .localCheckpoint() // consumers: the two rank joins
    def at(rCol: String, name: String): DataFrame =
      wg.join(broadcast(ranks.withColumnRenamed("g", "gr")),
          col("g") <=> col("gr") && col(rCol) > col("gc") - col("c") &&
            col(rCol) <= col("gc"))
        .select(col("g"), col("i"), col("v").cast("double").as(name))
    val hi = at("r_hi", "v_hi")
      .withColumnRenamed("g", "g2").withColumnRenamed("i", "i2")
    val pr = ranks.select(col("g").as("g3"), col("i").as("i3"), col("p"),
      col("frac"))
    at("r_lo", "v_lo")
      .join(hi, col("g") <=> col("g2") && col("i") === col("i2"))
      .join(broadcast(pr), col("g") <=> col("g3") && col("i") === col("i3"))
      .select(col("g"), col("i"), col("p"),
        (col("v_lo") + (col("v_hi") - col("v_lo")) * col("frac"))
          .as("value"))
  }

  /** Size-aware per-group percentile dispatcher. Spark's built-in exact
    * `percentile()` buffers one (value → count) map per group inside the
    * aggregation — unbeatable when the per-group distinct-value count is
    * bounded (0.36 s vs 15.5 s at sf1, PLANS.md), but a per-task memory
    * cliff on continuous domains at 100 TB. This chooser runs ONE cheap
    * probe (per-group `approx_count_distinct`, a fixed-size HLL buffer,
    * then a groups-bounded max) and routes: max estimated distinct ≤
    * `maxBufferedDistinct` → built-in aggregation; above → the bufferless
    * [[groupedPercentilesExact]] prefix-pass machinery. The HLL estimate
    * carries ~5% rsd (Spark's default), so the default threshold (2^16)
    * keeps orders of magnitude of headroom against the real per-task
    * buffer wall (millions of entries). Both paths emit
    * (g, i, p, value); the two lerp shapes can differ in the last ulp
    * (see [[percentilesExact]]) — equal at any publication grain.
    * NULL group keys are KEPT in both regimes — standard SQL GROUP BY
    * semantics (NULL forms its own group; DuckDB oracles replay it
    * unchanged). The exact path's offset and rank joins key on
    * null-safe equality (`<=>`) for exactly this reason: with plain
    * `===` the buffered groupBy kept a g=NULL group while the exact
    * path's null-rejecting joins silently lost it, so the dispatcher's
    * output for null-keyed rows would have flipped with data size
    * (regime-pinned in RanksSpec).
    */
  def groupedPercentiles(df: DataFrame, grpCol: Column, valCol: Column,
                         fractions: Seq[Double],
                         maxBufferedDistinct: Long = 1L << 16): DataFrame = {
    // ONE compression scan feeds probe AND both regimes (r16, guide
    // §2.3/§2.4): the old shape scanned the raw frame once for the HLL
    // probe and AGAIN inside whichever regime won. The (g, v, c) cell
    // frame is everything either regime needs — the probe becomes an
    // EXACT per-group distinct count (a cells-bounded re-aggregation,
    // replacing the ~5%-rsd HLL estimate with the number it estimated;
    // same threshold, strictly more faithful routing), the buffered
    // regime runs percentile() with c as its FREQUENCY argument
    // (identical value-count map, bit-identical result), and the exact
    // regime consumes the cells directly.
    val cells = df.select(grpCol.as("g"), valCol.as("v"))
      .filter(col("v").isNotNull)
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
      // lazy (r16): the probe is the materializing action
      .localCheckpoint(false) // consumers: probe + the winning regime
    val probe = cells.groupBy("g").agg(count(lit(1)).as("nd"))
      .agg(max("nd")).collect()(0)
    val maxDistinct = if (probe.isNullAt(0)) 0L else probe.getLong(0)
    if (maxDistinct <= maxBufferedDistinct) {
      require(fractions.nonEmpty && fractions.forall(p => p >= 0 && p <= 1),
        "fractions must lie in [0, 1]")
      val frArr = array(fractions.map(lit): _*)
      cells.select(col("g"), col("v").cast("double").as("v"), col("c"))
        .groupBy("g")
        .agg(expr(s"percentile(v, array(${fractions.mkString(", ")}), c)")
          .as("vs"))
        .select(col("g"), posexplode(col("vs")).as(Seq("pos", "value")))
        .select(col("g"), (col("pos") + 1).cast("int").as("i"),
          element_at(frArr, col("pos").cast("int") + 1).as("p"),
          col("value"))
    } else groupedPercentilesExactCells(cells, fractions)
  }

  /** The buffered regime of [[groupedPercentiles]]: Spark's exact
    * `percentile()` aggregate (per-group value-map buffer, one shuffle).
    * Correct whenever the group's distinct values fit an aggregation
    * buffer; never call it on continuous domains at scale.
    */
  def groupedPercentilesBuffered(df: DataFrame, grpCol: Column,
                                 valCol: Column,
                                 fractions: Seq[Double]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(p => p >= 0 && p <= 1),
      "fractions must lie in [0, 1]")
    val frArr = array(fractions.map(lit): _*)
    df.select(grpCol.as("g"), valCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("g")
      .agg(expr(s"percentile(v, array(${fractions.mkString(", ")}))")
        .as("vs"))
      .select(col("g"), posexplode(col("vs")).as(Seq("pos", "value")))
      .select(col("g"), (col("pos") + 1).cast("int").as("i"),
        element_at(frArr, col("pos").cast("int") + 1).as("p"),
        col("value"))
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
